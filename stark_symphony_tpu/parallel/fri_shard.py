"""Fold-stage parallelism: FRI layers sharded across devices by position.

The reference folds FRI layers serially inside one program
(/root/reference/stark101/src/fri.simf:74-91 pairs position i with
i + N/2; /root/reference/stwo-verifier/src/fri/folding.simf:15-41 pairs
p with -p).  This module is the SP/CP analogue mandated by SURVEY.md
§2.4: one FRI layer's full evaluation array is sharded over a mesh axis,
and every fold stage performs the sibling exchange over ICI with
`lax.ppermute` inside `shard_map` — the "FRI fold stages exchanged
all-to-all" design of BASELINE.md.

Layout and exchange pattern (D devices, chunk C = N/D, natural order):

* fold pairs (i, i + N/2): the sibling of every element in device d's
  chunk lives in device (d + D/2)'s chunk -> ONE ppermute (rotation by
  D/2) delivers all siblings; devices d < D/2 hold the folded output.
* rebalance: the folded array (N/2 values on D/2 devices) is split back
  over all D devices — device d < D/2 sends its lower/upper half-chunk
  to devices 2d / 2d+1 (two ppermutes).  Chunk size halves with the
  domain, so every stage is load-balanced and the exchange volume drops
  2x per stage (total traffic <= 3/2 N elements regardless of depth).

This is the building block for proving/verifying AIRs whose LDE domain
exceeds one chip's HBM; the batched per-proof verifiers (models/*) keep
using the in-lane fold because their layers are tiny.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pspec

from ..ops import field101 as F101


def _rebalance(chunks, axis_name: str, n_dev: int):
    """Redistribute the folded halves (valid on devices d < n_dev/2) so
    every device holds an equally sized contiguous chunk again."""
    half = chunks.shape[0] // 2
    lo, hi = chunks[:half], chunks[half:]
    perm_lo = [(d, 2 * d) for d in range(n_dev // 2)]
    perm_hi = [(d, 2 * d + 1) for d in range(n_dev // 2)]
    recv_lo = jax.lax.ppermute(lo, axis_name, perm_lo)
    recv_hi = jax.lax.ppermute(hi, axis_name, perm_hi)
    is_even = (jax.lax.axis_index(axis_name) % 2) == 0
    return jnp.where(is_even, recv_lo, recv_hi)


def sharded_fold(values, coords, betas, mesh: Mesh, *, fold_fn, coord_step,
                 n_stages: int, axis_name: str = "sp"):
    """Run `n_stages` FRI fold stages with the evaluation domain sharded
    over `mesh` axis `axis_name`.

    Args:
      values: (N, ...) layer evaluations in natural position order.
      coords: (N,) per-position fold coordinate (e.g. 1/x for stark101
        line folds); folds alongside values via `coord_step`.
      betas: sequence of n_stages fold randomness values (replicated).
      fold_fn: (a, b, coord, beta) -> folded value, where a = v[i],
        b = v[i + N/2], coord = coords[i].
      coord_step: coords -> next-layer coords at the SAME positions
        (e.g. squaring: x_{l+1}(i) = x_l(i)^2).
      n_stages: static number of folds; requires
        N / n_devices / 2**n_stages >= 1.

    Returns:
      (values', coords') of size N / 2**n_stages, sharded the same way.
    """
    n_dev = mesh.shape[axis_name]
    n = values.shape[0]
    assert n % n_dev == 0 and n_dev % 2 == 0
    assert (n // n_dev) % (1 << n_stages) == 0, (
        f"chunk {n // n_dev} not divisible by 2**{n_stages}; "
        f"fewer stages or fewer devices"
    )

    sibling_perm = [((d + n_dev // 2) % n_dev, d) for d in range(n_dev)]

    def body(v, x):
        for s in range(n_stages):
            v_sib = jax.lax.ppermute(v, axis_name, sibling_perm)
            folded = fold_fn(v, v_sib, x, betas[s])
            x_next = coord_step(x)
            v = _rebalance(folded, axis_name, n_dev)
            x = _rebalance(x_next, axis_name, n_dev)
        return v, x

    spec_v = Pspec(axis_name, *([None] * (values.ndim - 1)))
    spec_x = Pspec(axis_name)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_v, spec_x),
        out_specs=(spec_v, spec_x),
    )
    values = jax.device_put(values, NamedSharding(mesh, spec_v))
    coords = jax.device_put(coords, NamedSharding(mesh, spec_x))
    return jax.jit(fn)(values, coords)


# ---------------------------------------------------------------------- #
# stark101 instantiation: out[i] = (a+b)/2 + beta*(a-b)/(2*x_i), x <- x^2 #
# (/root/reference/stark101/src/fri.simf:58-62)                           #
# ---------------------------------------------------------------------- #

_INV2 = pow(2, F101.Q - 2, F101.Q)


def _stark101_fold(a, b, x_inv, beta):
    inv2 = jnp.uint32(_INV2)
    op0 = F101.f_mul(F101.f_add(a, b), inv2)
    op1 = F101.f_mul(F101.f_mul(F101.f_sub(a, b), inv2), x_inv)
    return F101.f_add(op0, F101.f_mul(op1, beta))


def stark101_fold_reference(values, x_invs, betas, n_stages: int):
    """Single-device oracle for the sharded fold (used by tests)."""
    v, x = values, x_invs
    for s in range(n_stages):
        half = v.shape[0] // 2
        v = _stark101_fold(v[:half], v[half:], x[:half], betas[s])
        x = F101.f_mul(x, x)[:half]
    return v, x


def stark101_fold_sharded(values, x_invs, betas, mesh: Mesh,
                          n_stages: int, axis_name: str = "sp"):
    """stark101 FRI fold with the LDE domain sharded over `axis_name`."""
    return sharded_fold(
        values, x_invs, betas, mesh,
        fold_fn=_stark101_fold,
        coord_step=lambda x: F101.f_mul(x, x),
        n_stages=n_stages, axis_name=axis_name,
    )
