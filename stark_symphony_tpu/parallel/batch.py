"""Device-mesh sharding of proof batches (the DP/TP layer).

The reference has zero parallelism (one proof per SimplicityHL program run);
this module is the TPU-native scale-out mandated by SURVEY.md §2.4:

* DP (`verify_batch_dp`): shard_map over the 'dp' mesh axis — every device
  runs the natively-batched verifier on its local proof shard (so the
  Pallas SHA-256/Merkle kernels keep working: manual sharding never asks
  the SPMD partitioner to split a pallas_call), and the accept count is a
  `psum` riding ICI.
* TP (`verify_batch_gspmd`): GSPMD auto-partitioning — the verifier
  carries `with_sharding_constraint`s on its per-query tensors (queries,
  Merkle leaves/siblings, FRI evaluations), so XLA splits per-query
  hashing over the 'tp' axis (the reference's 16-query x 20-column grid,
  fri/answers.simf:97-130).  This path traces the lax hash
  implementation (ops.sha256.pallas_disabled): the partitioner cannot
  split opaque kernels.

Multi-host: build the mesh over `jax.devices()` after
`jax.distributed.initialize()` — the same code paths shard over DCN+ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.sha256 import pallas_disabled


def make_mesh(n_devices: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """A (dp, tp) mesh over the first n_devices devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    assert n % tp == 0
    dev_array = np.array(devices[:n]).reshape(n // tp, tp)
    return Mesh(dev_array, ("dp", "tp"))


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Place a stacked proof batch with the leading axis sharded over `axis`."""
    def put(x):
        spec = P(axis) if np.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def verify_batch_sharded(verify_one, batch, mesh: Mesh):
    """jit-compiled sharded batch verification (vmap-lifted form).

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


def verify_batch_dp(batch, cfg, mesh: Mesh, air: str = "wide_fibonacci",
                    linkage: str = "reference", axis_name: str = "dp"):
    """DP scale-out: shard_map over `axis_name`, natively-batched verifier
    per device, psum'd accept count.

    This is the production multi-chip path: inside shard_map each device
    sees its local (B/D, ...) shard, so the ops-level Pallas dispatch
    (B/D * Q lanes) works unchanged and the only collective is the final
    scalar psum.

    Returns (bitmap (B,) sharded over dp, n_accepted replicated scalar).
    """
    from ..models.stwo import verifier

    batch = shard_batch(batch, mesh, axis_name)

    def local(b):
        bitmap = verifier.verify(b, cfg, air, linkage)[0]
        n_ok = jax.lax.psum(jnp.sum(bitmap.astype(jnp.int32)), axis_name)
        return bitmap, n_ok

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=P(axis_name),
        out_specs=(P(axis_name), P()),
    )
    return jax.jit(fn)(batch)


def verify_batch_gspmd(batch, cfg, mesh: Mesh, air: str = "wide_fibonacci",
                       linkage: str = "reference", batch_axis: str = "dp",
                       query_axis: str = "tp"):
    """DP+TP via GSPMD: the proof batch is sharded over `batch_axis` and
    per-query hashing is constrained to partition over `query_axis`.

    Returns (bitmap (B,), n_accepted).
    """
    from ..models.stwo import verifier

    batch = shard_batch(batch, mesh, batch_axis)

    with pallas_disabled():
        fn = jax.jit(
            lambda b: verifier.verify(
                b, cfg, air, linkage,
                query_sharding=(mesh, batch_axis, query_axis),
            )[0]
        )
        bitmap = fn(batch)
    return bitmap, jnp.sum(bitmap.astype(jnp.int32))
