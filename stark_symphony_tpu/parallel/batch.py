"""Device-mesh sharding of proof batches (the DP/TP layer).

The reference has zero parallelism (one proof per SimplicityHL program run);
this module is the TPU-native scale-out mandated by SURVEY.md §2.4:

* DP: the proof batch is sharded over the 'dp' mesh axis; the accept/reject
  bitmap is reduced with a collective (`psum` of accept counts) that rides
  ICI.
* TP (intra-proof): per-query tensors (Merkle siblings, evaluations) carry a
  sharding constraint over the 'tp' axis, letting XLA partition per-query
  hashing across chips for large-query configs.

Multi-host: build the mesh over `jax.devices()` after
`jax.distributed.initialize()` — the same code paths shard over DCN+ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """A (dp, tp) mesh over the first n_devices devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    assert n % tp == 0
    dev_array = np.array(devices[:n]).reshape(n // tp, tp)
    return Mesh(dev_array, ("dp", "tp"))


def shard_batch(batch, mesh: Mesh):
    """Place a stacked proof batch with the leading axis sharded over 'dp'."""
    def put(x):
        spec = P("dp") if np.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def verify_batch_sharded(verify_one, batch, mesh: Mesh):
    """jit-compiled sharded batch verification.

    Args:
      verify_one: proof -> bool (single-proof verifier, e.g.
        `lambda p: stwo_verifier.verify(p, cfg)[0]`).
      batch: stacked proof pytree, leading axis = proofs.
      mesh: from make_mesh.

    Returns:
      (bitmap (B,) bool sharded over dp, n_accepted scalar) — the count is a
      cross-device `psum`-style reduction inserted by XLA.
    """
    batch = shard_batch(batch, mesh)

    @jax.jit
    def run(b):
        bitmap = jax.vmap(verify_one)(b)
        return bitmap, jnp.sum(bitmap.astype(jnp.int32))

    return run(batch)


def constrain_queries(x, mesh: Mesh | None):
    """Annotate a per-query tensor (Q leading axis inside one proof) for
    sharding over 'tp'.  No-op without a mesh context."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("tp"))
    )
