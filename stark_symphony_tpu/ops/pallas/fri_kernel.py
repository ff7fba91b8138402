"""Fused Pallas TPU kernels for the stwo verifier's per-query stages.

Round-3 profiling showed the SHA-256 compression kernels themselves run at
memory speed while ~90% of stage V/VII wall-clock was spent *between*
kernels: XLA relayouts (the (..., 8)-trailing <-> (8, M, 128) tiled
transposes done per dispatch by ops/pallas/sha256_kernel.py's wrappers),
concatenates, and dozens of small dispatches.  These kernels fuse whole
verifier stages so data enters the tiled layout once and every
intermediate (leaf digests, walk state, fold values) lives in vregs:

* ``leafwalk_tiled`` — stage V (evals/verify.simf:47-64): hash the queried
  column evals into the leaf digest, walk the authentication path, compare
  against the commitment root; one kernel, output = 1 ok word per lane.
* ``fri_all_layers_tiled`` — stage VII (fri/layers.simf:29-69 +
  fri/folding.simf:15-41 for every layer): for each FRI layer, hash the
  (eval, sibling-witness) pair into adjacent leaves, walk the layer's
  Merkle path at its TRUE depth (no padding waste), QM31-fold with the
  layer alpha, and halve the query — all layers in one kernel, carrying
  (query, eval) in registers.

M31/QM31 arithmetic inside kernels uses the same 16-bit-limb wide-multiply
strategy as ops/u32.mul32_wide (TPU lanes are 32-bit; Mosaic has no u64).

Layout contract (shared with sha256_kernel): one logical u32 word per
(8, 128) vreg tile; lane axis is the flattened (batch, query) index.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sha256 import _padding_words
from .sha256_kernel import (
    LANES,
    SUBLANES,
    _compress_tiles2,
    _interpret,
    _iv_tiles,
    _node_tiles,
    _sha_words_tiles,
    _walk_tiles,
)

# Sublanes per grid step for the fused kernels.  Fatter steps amortize the
# ~10 us fixed per-grid-step cost (measured, MICRO_r04) at the price of
# more VMEM per step (the FRI kernel's sibs block is the limit:
# sum(depths)*8*BLOCK*128*4 bytes ~ 4.7 MB at BLOCK=16 for production).
BLOCK = int(os.environ.get("STPU_FRI_BLOCK", "16"))

# Interleave the two independent leaf-hash streams of each FRI layer at
# the round level (sha256_kernel._compress_tiles2).  A/B'd on the real
# chip (r05): 9.84M lanes/s interleaved vs 9.93M sequential at BLOCK=16 —
# a wash; the VPU is issue-rate bound, not dependency-latency bound
# (Mosaic's scheduler already fills the slots), consistent with r04's
# merged stage-V kernel measuring 2% slower.  Default OFF.
INTERLEAVE = os.environ.get("STPU_FRI_INTERLEAVE", "0") == "1"


def _sha_words_tiles2(ws0, ws1):
    """SHA-256 of two independent equal-length tiled messages with their
    compression rounds interleaved (ILP; see _compress_tiles2)."""
    n = len(ws0)
    assert len(ws1) == n
    pad, n_blocks = _padding_words(n)
    vs0, vs1 = _iv_tiles(ws0[0]), _iv_tiles(ws1[0])
    for blk in range(n_blocks):
        w0, w1 = [], []
        for i in range(16):
            j = 16 * blk + i
            w0.append(ws0[j] if j < n else np.uint32(pad[j - n]))
            w1.append(ws1[j] if j < n else np.uint32(pad[j - n]))
        vs0, vs1 = _compress_tiles2(vs0, w0, vs1, w1)
    return vs0, vs1

_P = np.uint32(0x7FFFFFFF)
_LOW16 = np.uint32(0xFFFF)
_ONE = np.uint32(1)


# ---------------------------------------------------------------------------
# Field arithmetic on (S, 128) u32 tiles (mirrors ops/field.py bit-exactly)
# ---------------------------------------------------------------------------

def _m31_red(x):
    x = (x & _P) + (x >> np.uint32(31))
    return jnp.where(x >= _P, x - _P, x)


def _m31_add(a, b):
    return _m31_red(a + b)


def _m31_neg(a):
    return jnp.where(a == 0, a, _P - a)


def _m31_sub(a, b):
    return _m31_add(a, _m31_neg(b))


def _m31_mul(a, b):
    a0 = a & _LOW16
    a1 = a >> np.uint32(16)
    b0 = b & _LOW16
    b1 = b >> np.uint32(16)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = p01 + p10
    carry_mid = (mid < p01).astype(jnp.uint32)
    lo = p00 + (mid << np.uint32(16))
    carry_lo = (lo < p00).astype(jnp.uint32)
    hi = p11 + (mid >> np.uint32(16)) + (carry_mid << np.uint32(16)) + carry_lo
    low31 = lo & _P
    high = (hi << _ONE) | (lo >> np.uint32(31))
    return _m31_red(low31 + high)


def _qm31_add(a, b):
    return tuple(_m31_add(x, y) for x, y in zip(a, b))


def _qm31_sub(a, b):
    return tuple(_m31_sub(x, y) for x, y in zip(a, b))


def _qm31_mul_m31(a, s):
    return tuple(_m31_mul(x, s) for x in a)


def _cm31_mul(ar, ai, br, bi):
    return (
        _m31_sub(_m31_mul(ar, br), _m31_mul(ai, bi)),
        _m31_add(_m31_mul(ar, bi), _m31_mul(ai, br)),
    )


def _qm31_mul(a, b):
    """(ar + ai j)(br + bi j); j^2 = 2 + i (qm31.simf:73-79)."""
    ar_r, ar_i, ai_r, ai_i = a
    br_r, br_i, bi_r, bi_i = b
    rr, ri = _cm31_mul(ar_r, ar_i, br_r, br_i)
    pr, pi = _cm31_mul(ai_r, ai_i, bi_r, bi_i)
    # (2 + i) * (pr + pi i) = (2 pr - pi) + (pr + 2 pi) i
    tr = _m31_sub(_m31_add(pr, pr), pi)
    ti = _m31_add(pr, _m31_add(pi, pi))
    re_r = _m31_add(rr, tr)
    re_i = _m31_add(ri, ti)
    ir, ii = _cm31_mul(ar_r, ar_i, bi_r, bi_i)
    jr, ji = _cm31_mul(ai_r, ai_i, br_r, br_i)
    return (re_r, re_i, _m31_add(ir, jr), _m31_add(ii, ji))


# ---------------------------------------------------------------------------
# Stage V: fused leaf-hash + path walk + root compare
# ---------------------------------------------------------------------------

def _leafwalk_kernel(n_words, depth, ev_ref, idx_ref, sib_ref, root_ref,
                     ok_ref):
    leaf = _sha_words_tiles([ev_ref[i] for i in range(n_words)])
    dep = jnp.full_like(idx_ref[0], np.uint32(depth))
    cur = _walk_tiles(
        leaf, idx_ref[0], dep,
        [tuple(sib_ref[lvl, i] for i in range(8)) for lvl in range(depth)],
    )
    ok = None
    for i in range(8):
        eq = cur[i] == root_ref[i]
        ok = eq if ok is None else (ok & eq)
    ok_ref[0] = ok.astype(jnp.uint32)


def _leafwalk_jnp(evals, idx, sibs, root, n_words: int, depth: int):
    """Off-TPU reference of the leafwalk kernel, built on the compact
    (fori_loop/scan) lax-path primitives: the Pallas interpreter is far too
    slow for the fused bodies, and the unrolled tile helpers explode the
    XLA CPU graph.  Pallas-vs-lax equivalence of the primitives is pinned
    by tests/test_pallas.py; tiled-vs-standard by tests/test_tiled.py."""
    from .. import merkle as _merkle
    from ..sha256 import pallas_disabled, sha256_words as _sw

    with pallas_disabled():
        msg = jnp.stack([evals[i] for i in range(n_words)], axis=-1)
        leaf = _sw(msg)  # (M, 128, 8)
        sibs_wt = jnp.moveaxis(sibs, (0, 1), (-2, -1))  # (M, 128, depth, 8)
        root_wt = jnp.stack([root[i] for i in range(8)], axis=-1)
        ok = _merkle.verify_path(leaf, idx[0], sibs_wt, root_wt)
    return ok.astype(jnp.uint32)[None]


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def leafwalk_tiled(evals, idx, sibs, root, n_words: int, depth: int,
                   block: int = 0):
    """evals (n_words, M, 128), idx (1, M, 128), sibs (depth, 8, M, 128),
    root (8, M, 128) -> ok (1, M, 128) u32 in {0, 1}.

    block: sublanes per grid step (0 = auto: BLOCK when it divides M,
    else SUBLANES) — explicit values let bench_micro measure the fixed
    per-grid-step cost by timing the same work at two step sizes."""
    M = evals.shape[1]
    if _interpret():
        return _leafwalk_jnp(evals, idx.astype(jnp.uint32), sibs, root,
                             n_words, depth)
    blk = block or (BLOCK if M % BLOCK == 0 else SUBLANES)
    assert M % blk == 0
    dspec = pl.BlockSpec((8, blk, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    ispec = pl.BlockSpec((1, blk, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_leafwalk_kernel, n_words, depth),
        out_shape=jax.ShapeDtypeStruct((1, M, LANES), jnp.uint32),
        grid=(M // blk,),
        in_specs=[
            pl.BlockSpec((n_words, blk, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            ispec,
            pl.BlockSpec((depth, 8, blk, LANES), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            dspec,
        ],
        out_specs=ispec,
        interpret=_interpret(),
    )(evals, idx.astype(jnp.uint32), sibs, root)


# ---------------------------------------------------------------------------
# Stage VII: all FRI layers fused (hash pair, walk, fold, halve)
# ---------------------------------------------------------------------------

def _fri_kernel(depths, q_ref, ev_ref, wit_ref, cinv_ref, alpha_ref,
                sib_ref, root_ref, ok_ref, out_ref, qout_ref):
    n_layers = len(depths)
    q = q_ref[0]
    e = tuple(ev_ref[i] for i in range(4))
    off = 0
    for l in range(n_layers):
        odd = (q & _ONE) != 0
        w = tuple(wit_ref[l, i] for i in range(4))
        e0 = tuple(jnp.where(odd, wi, ei) for wi, ei in zip(w, e))
        e1 = tuple(jnp.where(odd, ei, wi) for wi, ei in zip(w, e))
        if INTERLEAVE:
            leaf0, leaf1 = _sha_words_tiles2(e0, e1)
        else:
            leaf0 = _sha_words_tiles(e0)
            leaf1 = _sha_words_tiles(e1)
        cur = _node_tiles(leaf0, leaf1)
        idx = q >> _ONE
        for lvl in range(depths[l]):
            sib = tuple(sib_ref[off + lvl, i] for i in range(8))
            bit = (idx & _ONE) != 0
            left = tuple(jnp.where(bit, s, c) for s, c in zip(sib, cur))
            right = tuple(jnp.where(bit, c, s) for s, c in zip(sib, cur))
            cur = _node_tiles(left, right)
            idx = idx >> _ONE
        ok = None
        for i in range(8):
            eq = cur[i] == root_ref[l, i]
            ok = eq if ok is None else (ok & eq)
        ok_ref[l] = ok.astype(jnp.uint32)
        # fold (fri/folding.simf:15-41): f0 + alpha * (e0 - e1) / coord
        f0 = _qm31_add(e0, e1)
        f1 = _qm31_mul_m31(_qm31_sub(e0, e1), cinv_ref[l])
        alpha = tuple(alpha_ref[l, i] for i in range(4))
        e = _qm31_add(f0, _qm31_mul(alpha, f1))
        q = q >> _ONE
        off += depths[l]
    for i in range(4):
        out_ref[i] = e[i]
    qout_ref[0] = q


def _fri_jnp(queries, evals, wits, cinvs, alphas, sibs, roots, depths):
    """Off-TPU reference of the fused FRI kernel (compact lax primitives;
    see _leafwalk_jnp)."""
    from .. import merkle as _merkle
    from ..sha256 import pallas_disabled, sha256_pair as _sp, \
        sha256_words as _sw

    with pallas_disabled():
        q = queries[0]
        e = tuple(evals[i] for i in range(4))
        oks, off = [], 0
        for l, d in enumerate(depths):
            odd = (q & _ONE) != 0
            w = tuple(wits[l, i] for i in range(4))
            e0 = tuple(jnp.where(odd, wi, ei) for wi, ei in zip(w, e))
            e1 = tuple(jnp.where(odd, ei, wi) for wi, ei in zip(w, e))
            leaf0 = _sw(jnp.stack(e0, axis=-1))
            leaf1 = _sw(jnp.stack(e1, axis=-1))
            node = _sp(leaf0, leaf1)
            sibs_wt = jnp.moveaxis(sibs[off:off + d], (0, 1), (-2, -1))
            root_wt = jnp.stack([roots[l, i] for i in range(8)], axis=-1)
            ok = _merkle.verify_path(node, q >> _ONE, sibs_wt, root_wt)
            oks.append(ok.astype(jnp.uint32))
            f0 = _qm31_add(e0, e1)
            f1 = _qm31_mul_m31(_qm31_sub(e0, e1), cinvs[l])
            alpha = tuple(alphas[l, i] for i in range(4))
            e = _qm31_add(f0, _qm31_mul(alpha, f1))
            q = q >> _ONE
            off += d
    return jnp.stack(oks), jnp.stack(e), q[None]


@functools.partial(jax.jit, static_argnums=(7, 8))
def fri_all_layers_tiled(queries, evals, wits, cinvs, alphas, sibs, roots,
                         depths, block: int = 0):
    """All FRI layers in one kernel.

    queries (1, M, 128); evals (4, M, 128) — the stage-VI answers;
    wits (L, 4, M, 128); cinvs (L, M, 128) — precomputed 1/fold-coordinate;
    alphas (L, 4, M, 128); sibs (sum(depths), 8, M, 128) — all layers'
    sibling digests concatenated, leaf level first within each layer;
    roots (L, 8, M, 128); depths: static tuple of per-layer path depths.

    Returns (ok (L, M, 128) u32, folded (4, M, 128), q_out (1, M, 128)).
    """
    L = len(depths)
    total_d = sum(depths)
    M = queries.shape[1]
    if _interpret():
        return _fri_jnp(queries.astype(jnp.uint32), evals, wits, cinvs,
                        alphas, sibs, roots, depths)
    blk = block or (BLOCK if M % BLOCK == 0 else SUBLANES)
    assert M % blk == 0
    ispec = pl.BlockSpec((1, blk, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((4, blk, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fri_kernel, tuple(int(d) for d in depths)),
        out_shape=(
            jax.ShapeDtypeStruct((L, M, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((4, M, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((1, M, LANES), jnp.uint32),
        ),
        grid=(M // blk,),
        in_specs=[
            ispec,
            qspec,
            pl.BlockSpec((L, 4, blk, LANES), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, blk, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 4, blk, LANES), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((total_d, 8, blk, LANES),
                         lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 8, blk, LANES), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((L, blk, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            qspec,
            ispec,
        ),
        interpret=_interpret(),
    )(queries.astype(jnp.uint32), evals, wits, cinvs, alphas, sibs, roots)
