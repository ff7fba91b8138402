"""Pipeline parallelism over proof micro-batches (SURVEY.md §2.4 PP row).

The reference runs its 7 verifier stages serially for one proof
(/root/reference/stwo-verifier/src/verifier.simf:32-58).  At production
scale the batch is the pipeline axis:

* `scan_microbatches` — split a huge proof batch into fixed-size
  micro-batches and `lax.scan` the verifier over them.  Peak live memory
  becomes O(micro) instead of O(batch) (one micro-batch of Merkle
  digests / DEEP quotients in flight at a time) while XLA still overlaps
  the gather/hash stage of micro-batch i+1 with the FRI arithmetic of
  micro-batch i inside the fused loop body.
* `StreamVerifier` — a double-buffered host->device feeder: keeps K
  batches in flight, riding JAX's async dispatch so H2D transfer of
  batch i+1 overlaps verification of batch i (the channel/commit ->
  decommit -> quotients -> FRI overlap described in SURVEY.md §2.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scan_microbatches(verify_one, batch, micro: int):
    """Accept bitmap for `batch` computed micro-batch by micro-batch.

    Args:
      verify_one: single-proof verifier, proof -> bool.
      batch: stacked proof pytree, leading axis B (divisible by micro).
      micro: micro-batch size (static).

    Returns:
      (B,) bool bitmap, identical to `jax.vmap(verify_one)(batch)`.
    """
    sizes = {x.shape[0] for x in jax.tree_util.tree_leaves(batch)}
    assert len(sizes) == 1, "ragged proof batch"
    b = sizes.pop()
    assert b % micro == 0, f"batch {b} not divisible by micro {micro}"

    folded = jax.tree_util.tree_map(
        lambda x: x.reshape((b // micro, micro) + x.shape[1:]), batch
    )

    def step(_, mb):
        return None, jax.vmap(verify_one)(mb)

    _, bits = jax.lax.scan(step, None, folded)
    return bits.reshape(b)


class StreamVerifier:
    """Double-buffered streaming verification of host-resident proof batches.

    feed() enqueues (device_put + async dispatch); results are collected
    lazily so up to `depth` batches are in flight — transfer of the next
    batch overlaps compute of the current one.
    """

    def __init__(self, verify_batch_fn, depth: int = 2):
        self._fn = jax.jit(verify_batch_fn)
        self._depth = depth
        self._inflight: list = []
        self._done: list = []

    def feed(self, batch) -> None:
        batch = jax.device_put(batch)  # async H2D
        self._inflight.append(self._fn(batch))  # async dispatch
        while len(self._inflight) > self._depth:
            self._drain_one()

    def _drain_one(self) -> None:
        out = self._inflight.pop(0)
        jax.block_until_ready(out)
        self._done.append(out)

    def finish(self):
        """Block on everything in flight; return the list of bitmaps."""
        while self._inflight:
            self._drain_one()
        out, self._done = self._done, []
        return out
