"""Pallas TPU kernels for SHA-256 compression and fused Merkle path walks.

This is the speed-of-light path for the framework's dominant op: the
reference verifiers (/root/reference/stwo-verifier/src/{channel,hasher,
merkle}.simf) spend essentially all their work in SHA-256 compressions.

Design (word-major, lane-parallel):
* Digests/blocks are held word-major — state ``(8, B)``, block ``(16, B)``
  with the batch on the TPU lane axis — so every one of the 64 rounds is a
  handful of full-width VPU uint32 ops (add/xor/shift) on ``(1, T)`` rows.
* The 64 rounds and the 16-word rolling message-schedule window are fully
  unrolled in Python: all indexing is static, nothing touches the lane
  dimension, and Mosaic sees a straight-line vector program.
* ``merkle_walk`` fuses an entire depth-D authentication-path walk
  (2 compressions per level: data block + constant padding block) into one
  kernel, eliminating per-level kernel launches and XLA scan overhead.

The public wrappers accept the framework's standard ``(..., 8)``-trailing
layout and handle transpose + lane padding; use them through
``ops.sha256``/``ops.merkle`` which dispatch here on TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sha256 import IV, K, schedule_host

# Lane tile: each grid program processes this many independent messages.
TILE = 512


def _rotr(x, n: int):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _ssig0(x):
    return _rotr(x, 7) ^ _rotr(x, 18) ^ (x >> np.uint32(3))


def _ssig1(x):
    return _rotr(x, 17) ^ _rotr(x, 19) ^ (x >> np.uint32(10))


def _bsig0(x):
    return _rotr(x, 2) ^ _rotr(x, 13) ^ _rotr(x, 22)


def _bsig1(x):
    return _rotr(x, 6) ^ _rotr(x, 11) ^ _rotr(x, 25)


def _rounds(vs, get_w):
    """64 unrolled SHA-256 rounds; get_w(t) returns the schedule word."""
    a, b, c, d, e, f, g, h = vs
    for t in range(64):
        wt = get_w(t)
        ch = (e & f) ^ (~e & g)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t1 = h + _bsig1(e) + ch + np.uint32(K[t]) + wt
        t2 = _bsig0(a) + maj
        a, b, c, d, e, f, g, h = t1 + t2, a, b, c, d + t1, e, f, g
    return (a, b, c, d, e, f, g, h)


def _compress_rows(vs, w):
    """One compression over row-vector words.

    vs: 8-tuple of (1, T) uint32 rows; w: list of 16 (1, T) rows (consumed
    as a rolling window).  Returns the 8 updated rows.
    """
    w = list(w)

    def get_w(t):
        if t < 16:
            return w[t]
        wt = _ssig1(w[(t - 2) % 16]) + w[(t - 7) % 16] + _ssig0(
            w[(t - 15) % 16]) + w[t % 16]
        w[t % 16] = wt
        return wt

    out = _rounds(vs, get_w)
    return tuple(v + o for v, o in zip(vs, out))


def _compress_rows_const(vs, w_const: np.ndarray):
    """Compression against a host-precomputed constant 64-word schedule."""
    out = _rounds(vs, lambda t: np.uint32(w_const[t]))
    return tuple(v + o for v, o in zip(vs, out))


# ---------------------------------------------------------------------------
# compress: state (8, B), blocks (n_blocks, 16, B)
# ---------------------------------------------------------------------------

def _compress_kernel(n_blocks, state_ref, block_ref, out_ref):
    vs = tuple(state_ref[i : i + 1, :] for i in range(8))
    for blk in range(n_blocks):
        w = [block_ref[blk, i : i + 1, :] for i in range(16)]
        vs = _compress_rows(vs, w)
    for i in range(8):
        out_ref[i : i + 1, :] = vs[i]


@functools.partial(jax.jit, static_argnums=(2,))
def compress_wm(state, blocks, n_blocks: int):
    """Word-major multi-block compression.

    state: (8, B) uint32; blocks: (n_blocks, 16, B) uint32 with B a multiple
    of TILE.  Returns (8, B).
    """
    B = state.shape[1]
    assert B % TILE == 0
    grid = (B // TILE,)
    return pl.pallas_call(
        functools.partial(_compress_kernel, n_blocks),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_blocks, 16, TILE), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, TILE), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
    )(state, blocks)


# ---------------------------------------------------------------------------
# sha256 of an n-word message (word-major)
# ---------------------------------------------------------------------------

def _sha_words_kernel(n: int, msg_ref, out_ref):
    from ..sha256 import _padding_words

    pad, n_blocks = _padding_words(n)
    full_words = n + pad.shape[0]
    assert full_words == 16 * n_blocks
    vs = tuple(
        jnp.full((1, msg_ref.shape[-1]), np.uint32(IV[i])) for i in range(8)
    )
    for blk in range(n_blocks):
        w = []
        for i in range(16):
            j = 16 * blk + i
            if j < n:
                w.append(msg_ref[j : j + 1, :])
            else:
                w.append(
                    jnp.full((1, msg_ref.shape[-1]), np.uint32(pad[j - n]))
                )
        vs = _compress_rows(vs, w)
    for i in range(8):
        out_ref[i : i + 1, :] = vs[i]


@functools.partial(jax.jit, static_argnums=(1,))
def sha256_words_wm(msg, n: int):
    """SHA-256 of word-major messages: msg (n, B) -> digest (8, B)."""
    B = msg.shape[1]
    assert B % TILE == 0
    return pl.pallas_call(
        functools.partial(_sha_words_kernel, n),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.uint32),
        grid=(B // TILE,),
        in_specs=[
            pl.BlockSpec((n, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (8, TILE), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
    )(msg)


# Constant schedule for the padding block of a 64-byte (two-digest) message.
_PAD64_SCHED = schedule_host(
    np.array(
        [0x80000000] + [0] * 13 + [0, 512], dtype=np.uint32
    )
)


def _node_rows(left, right):
    """sha256(left || right) for 8-row tuples -> 8-row tuple (Merkle node)."""
    vs = tuple(
        jnp.full_like(left[0], np.uint32(IV[i])) for i in range(8)
    )
    vs = _compress_rows(vs, list(left) + list(right))
    return _compress_rows_const(vs, _PAD64_SCHED)


def _pair_kernel(left_ref, right_ref, out_ref):
    left = tuple(left_ref[i : i + 1, :] for i in range(8))
    right = tuple(right_ref[i : i + 1, :] for i in range(8))
    vs = _node_rows(left, right)
    for i in range(8):
        out_ref[i : i + 1, :] = vs[i]


@jax.jit
def sha256_pair_wm(left, right):
    """Merkle node hash, word-major: (8, B), (8, B) -> (8, B)."""
    B = left.shape[1]
    assert B % TILE == 0
    spec = pl.BlockSpec((8, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _pair_kernel,
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.uint32),
        grid=(B // TILE,),
        in_specs=[spec, spec],
        out_specs=spec,
    )(left, right)


# ---------------------------------------------------------------------------
# Fused Merkle path walk
# ---------------------------------------------------------------------------

def _merkle_kernel(depth, leaf_ref, idx_ref, sib_ref, dep_ref, out_ref):
    cur = tuple(leaf_ref[i : i + 1, :] for i in range(8))
    idx = idx_ref[0:1, :]
    dep = dep_ref[0:1, :]
    for lvl in range(depth):
        sib = tuple(sib_ref[lvl, i : i + 1, :] for i in range(8))
        bit = (idx & np.uint32(1)) != np.uint32(0)
        left = tuple(jnp.where(bit, s, c) for s, c in zip(sib, cur))
        right = tuple(jnp.where(bit, c, s) for s, c in zip(sib, cur))
        nxt = _node_rows(left, right)
        active = np.uint32(lvl) < dep
        cur = tuple(jnp.where(active, n, c) for n, c in zip(nxt, cur))
        idx = jnp.where(active, idx >> np.uint32(1), idx)
    for i in range(8):
        out_ref[i : i + 1, :] = cur[i]


@functools.partial(jax.jit, static_argnums=(3,))
def merkle_walk_wm(leaf, idx, sibs, depth: int, depths=None):
    """Fused authentication-path walk, word-major.

    leaf: (8, B); idx: (B,); sibs: (depth, 8, B); depths: (B,) true path
    depths (defaults to `depth` everywhere).  Returns the recomputed roots
    (8, B).
    """
    B = leaf.shape[1]
    assert B % TILE == 0
    if depths is None:
        depths = jnp.full((B,), np.uint32(depth))
    dspec = pl.BlockSpec((8, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_merkle_kernel, depth),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.uint32),
        grid=(B // TILE,),
        in_specs=[
            dspec,
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (depth, 8, TILE), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=dspec,
    )(
        leaf,
        idx.astype(jnp.uint32).reshape(1, B),
        sibs,
        depths.astype(jnp.uint32).reshape(1, B),
    )


# ---------------------------------------------------------------------------
# Layout wrappers: (..., 8)-trailing <-> word-major (8, B) with lane padding
# ---------------------------------------------------------------------------

def _flatten_pad(x, word_axis_size):
    """(..., W) -> (W, Bpad), plus the original batch shape and true B."""
    batch_shape = x.shape[:-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    Bpad = max(TILE, ((B + TILE - 1) // TILE) * TILE)
    flat = x.reshape(B, word_axis_size).T
    if Bpad != B:
        flat = jnp.pad(flat, ((0, 0), (0, Bpad - B)))
    return flat, batch_shape, B


def _unflatten(flat, batch_shape, B):
    return flat[:, :B].T.reshape(batch_shape + (flat.shape[0],))


def compress(state, block):
    """Drop-in for ops.sha256.compress: state (..., 8), block (..., 16)."""
    state, block = jnp.broadcast_arrays(
        state, jnp.broadcast_to(block[..., :1], block.shape[:-1] + (1,)) * 0
        + state[..., :1] * 0 + state
    ) if False else (state, block)
    st, bshape, B = _flatten_pad(state, 8)
    blk, _, _ = _flatten_pad(block, 16)
    out = compress_wm(st, blk[None], 1)
    return _unflatten(out, bshape, B)


def sha256_words(words):
    """Drop-in for ops.sha256.sha256_words on static-length messages."""
    n = words.shape[-1]
    msg, bshape, B = _flatten_pad(words, n)
    out = sha256_words_wm(msg, n)
    return _unflatten(out, bshape, B)


def sha256_pair(left, right):
    left, right = jnp.broadcast_arrays(left, right)
    l, bshape, B = _flatten_pad(left, 8)
    r, _, _ = _flatten_pad(right, 8)
    out = sha256_pair_wm(l, r)
    return _unflatten(out, bshape, B)


def merkle_compute_root(leaf_digest, index, siblings, depths=None):
    """Drop-in for ops.merkle.compute_root (+ padded-depth variant).

    leaf_digest: (..., 8); index: (...,); siblings: (..., D, 8).
    """
    D = siblings.shape[-2]
    leaf_digest, idxb = jnp.broadcast_arrays(
        leaf_digest, jnp.asarray(index, jnp.uint32)[..., None]
    )
    bshape = leaf_digest.shape[:-1]
    B = int(np.prod(bshape)) if bshape else 1
    Bpad = max(TILE, ((B + TILE - 1) // TILE) * TILE)

    leaf, _, _ = _flatten_pad(leaf_digest, 8)
    idx = idxb[..., 0].reshape(B)
    if Bpad != B:
        idx = jnp.pad(idx, (0, Bpad - B))
    sibs = jnp.broadcast_to(siblings, bshape + (D, 8))
    sibs = jnp.moveaxis(sibs.reshape(B, D, 8), 0, -1)  # (D, 8, B)
    if Bpad != B:
        sibs = jnp.pad(sibs, ((0, 0), (0, 0), (0, Bpad - B)))
    dep = None
    if depths is not None:
        dep = jnp.broadcast_to(jnp.asarray(depths, jnp.uint32), bshape)
        dep = dep.reshape(B)
        if Bpad != B:
            dep = jnp.pad(dep, (0, Bpad - B))
    out = merkle_walk_wm(leaf, idx, sibs, D, dep)
    return _unflatten(out, bshape, B)
