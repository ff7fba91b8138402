"""Pallas TPU kernels for SHA-256 compression and fused Merkle path walks.

This is the speed-of-light path for the framework's dominant op: the
reference verifiers (/root/reference/stwo-verifier/src/{channel,hasher,
merkle}.simf) spend essentially all their work in SHA-256 compressions
(the `sha_256_ctx_8_*` jets), and the production stwo proof costs ~3.8k
compressions per verification.

Design (vreg-major, fully unrolled):

* Each logical u32 word (a state word, a schedule word) is held as one
  full (8, 128) vector register: the message batch is laid out as
  ``(n_words, M, 128)`` with M = batch/128 on the sublane axis, and each
  grid step processes an (8, 128) = 1024-message tile.  Every one of the
  64 SHA rounds is then ~27 full-width VPU uint32 ops with zero lane
  movement (the old row layout ``(1, T)`` used 1/8 of the sublanes).
* The 64 rounds and the 16-word rolling message-schedule window are fully
  unrolled in Python: all indexing is static and Mosaic sees a
  straight-line vector program.
* ``merkle_walk`` fuses an entire depth-D authentication-path walk
  (2 compressions per level: data block + constant padding block) into one
  kernel, eliminating per-level kernel launches and XLA scan overhead.
  Paths of different true depths share one kernel via an `active` mask
  (the analogue of ops.merkle.verify_path_padded).

The public wrappers at the bottom accept the framework's standard
``(..., 8)``-trailing layout and handle the transpose + lane padding;
``ops.sha256`` / ``ops.merkle`` dispatch here when the backend is a TPU
and the flattened batch is large enough to fill the lanes (see
ops.sha256.use_pallas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sha256 import IV, K, _padding_words, schedule_host

# Each grid step processes SUBLANES x 128 independent messages; every
# logical word is one full (SUBLANES, 128) uint32 tile (min int32 tile is
# (8, 128)).
SUBLANES = 8
LANES = 128
TILE = SUBLANES * LANES  # messages per grid step


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests)."""
    return not _is_tpu_like()


def _is_tpu_like() -> bool:
    try:
        d = jax.devices()[0]
    except Exception:  # pragma: no cover - no backend at all
        return False
    return "TPU" in getattr(d, "device_kind", "") or d.platform in (
        "tpu",
        "axon",
    )


_M32 = (1 << 32) - 1


def _is_const(x) -> bool:
    return isinstance(x, (int, np.integer))


def _rotr(x, n: int):
    if _is_const(x):  # exact host path (no numpy scalar wrap warnings)
        x = int(x)
        return np.uint32(((x >> n) | (x << (32 - n))) & _M32)
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _ssig0(x):
    if _is_const(x):
        x = int(x)
        return np.uint32(int(_rotr(x, 7)) ^ int(_rotr(x, 18)) ^ (x >> 3))
    return _rotr(x, 7) ^ _rotr(x, 18) ^ (x >> np.uint32(3))


def _ssig1(x):
    if _is_const(x):
        x = int(x)
        return np.uint32(int(_rotr(x, 17)) ^ int(_rotr(x, 19)) ^ (x >> 10))
    return _rotr(x, 17) ^ _rotr(x, 19) ^ (x >> np.uint32(10))


def _bsig0(x):
    return _rotr(x, 2) ^ _rotr(x, 13) ^ _rotr(x, 22)


def _bsig1(x):
    return _rotr(x, 6) ^ _rotr(x, 11) ^ _rotr(x, 25)


def _rounds(vs, get_w):
    """64 unrolled SHA-256 rounds; get_w(t) returns the schedule word.

    ch/maj use the 3-op/4-op forms (g ^ (e & (f ^ g)) and
    (a & (b | c)) | (b & c)) — bitwise-identical to the spec formulas,
    two fewer VPU ops per round."""
    a, b, c, d, e, f, g, h = vs
    for t in range(64):
        wt = get_w(t)
        ch = g ^ (e & (f ^ g))
        maj = (a & (b | c)) | (b & c)
        t1 = h + _bsig1(e) + ch + np.uint32(K[t]) + wt
        t2 = _bsig0(a) + maj
        a, b, c, d, e, f, g, h = t1 + t2, a, b, c, d + t1, e, f, g
    return (a, b, c, d, e, f, g, h)


def _sched_window(w):
    """Rolling 16-word message-schedule window over `w` (mutated in
    place); returns get_w(t).  Entries may be np scalars for constant
    padding words (schedule stays constant-folded on the host)."""

    def get_w(t):
        if t < 16:
            return w[t]
        parts = (w[(t - 2) % 16], w[(t - 7) % 16], w[(t - 15) % 16],
                 w[t % 16])
        if all(_is_const(p) for p in parts):
            wt = np.uint32(
                (int(_ssig1(int(parts[0]))) + int(parts[1])
                 + int(_ssig0(int(parts[2]))) + int(parts[3])) & _M32)
        else:
            wt = _ssig1(parts[0]) + parts[1] + _ssig0(parts[2]) + parts[3]
        w[t % 16] = wt
        return wt

    return get_w


def _compress_tiles(vs, w):
    """One compression over (S, 128) word tiles.

    vs: 8-tuple of tiles; w: list of 16 tiles (consumed as a rolling
    window; entries may be np scalars for constant padding words).
    Returns the 8 updated tiles.
    """
    out = _rounds(vs, _sched_window(list(w)))
    return tuple(v + o for v, o in zip(vs, out))


def _compress_tiles2(vs0, w0, vs1, w1):
    """TWO independent compressions with their 64 rounds interleaved at
    the jaxpr level: each stream's (a, e) dependency chain is the VPU
    critical path, and emitting round t of stream 1 between rounds t and
    t+1 of stream 0 hands Mosaic/LLVM two independent chains to hide
    instruction latency with (the ILP a sequential emission order buries;
    VERDICT r04 task 6)."""
    g0, g1 = _sched_window(list(w0)), _sched_window(list(w1))
    a0, b0, c0, d0, e0, f0, g0_, h0 = vs0
    a1, b1, c1, d1, e1, f1, g1_, h1 = vs1
    for t in range(64):
        wt0, wt1 = g0(t), g1(t)
        ch0 = g0_ ^ (e0 & (f0 ^ g0_))
        ch1 = g1_ ^ (e1 & (f1 ^ g1_))
        maj0 = (a0 & (b0 | c0)) | (b0 & c0)
        maj1 = (a1 & (b1 | c1)) | (b1 & c1)
        t1_0 = h0 + _bsig1(e0) + ch0 + np.uint32(K[t]) + wt0
        t1_1 = h1 + _bsig1(e1) + ch1 + np.uint32(K[t]) + wt1
        t2_0 = _bsig0(a0) + maj0
        t2_1 = _bsig0(a1) + maj1
        a0, b0, c0, d0, e0, f0, g0_, h0 = \
            t1_0 + t2_0, a0, b0, c0, d0 + t1_0, e0, f0, g0_
        a1, b1, c1, d1, e1, f1, g1_, h1 = \
            t1_1 + t2_1, a1, b1, c1, d1 + t1_1, e1, f1, g1_
    out0 = (a0, b0, c0, d0, e0, f0, g0_, h0)
    out1 = (a1, b1, c1, d1, e1, f1, g1_, h1)
    return (tuple(v + o for v, o in zip(vs0, out0)),
            tuple(v + o for v, o in zip(vs1, out1)))


def _compress_tiles_const(vs, w_const: np.ndarray):
    """Compression against a host-precomputed constant 64-word schedule."""
    out = _rounds(vs, lambda t: np.uint32(w_const[t]))
    return tuple(v + o for v, o in zip(vs, out))


def _iv_tiles(like):
    return tuple(jnp.full_like(like, np.uint32(IV[i])) for i in range(8))


# ---------------------------------------------------------------------------
# sha256 of an n-word message
# ---------------------------------------------------------------------------

def _sha_words_tiles(ws):
    """Full SHA-256 over a list of n word tiles (pure jnp; unit-testable
    off-TPU without the pallas plumbing)."""
    n = len(ws)
    pad, n_blocks = _padding_words(n)
    vs = _iv_tiles(ws[0])
    for blk in range(n_blocks):
        w = []
        for i in range(16):
            j = 16 * blk + i
            w.append(ws[j] if j < n else np.uint32(pad[j - n]))
        vs = _compress_tiles(vs, w)
    return vs


def _sha_words_kernel(n: int, msg_ref, out_ref):
    vs = _sha_words_tiles([msg_ref[i] for i in range(n)])
    for i in range(8):
        out_ref[i] = vs[i]


@functools.partial(jax.jit, static_argnums=(1,))
def sha256_words_tiled(msg, n: int):
    """SHA-256 of tiled messages: msg (n, M, 128) -> digest (8, M, 128).

    M must be a multiple of SUBLANES.
    """
    M = msg.shape[1]
    assert M % SUBLANES == 0
    return pl.pallas_call(
        functools.partial(_sha_words_kernel, n),
        out_shape=jax.ShapeDtypeStruct((8, M, LANES), jnp.uint32),
        grid=(M // SUBLANES,),
        in_specs=[
            pl.BlockSpec((n, SUBLANES, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((8, SUBLANES, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(msg)


# Constant schedule for the padding block of a 64-byte (two-digest) message.
_PAD64_SCHED = schedule_host(
    np.array([0x80000000] + [0] * 13 + [0, 512], dtype=np.uint32)
)


def _node_tiles(left, right):
    """sha256(left || right) for 8-tile tuples -> 8-tile tuple (Merkle node
    hash; matches hasher.simf sha256_pair on 64 bytes)."""
    vs = _iv_tiles(left[0])
    vs = _compress_tiles(vs, list(left) + list(right))
    return _compress_tiles_const(vs, _PAD64_SCHED)


def _pair_kernel(left_ref, right_ref, out_ref):
    left = tuple(left_ref[i] for i in range(8))
    right = tuple(right_ref[i] for i in range(8))
    vs = _node_tiles(left, right)
    for i in range(8):
        out_ref[i] = vs[i]


@jax.jit
def sha256_pair_tiled(left, right):
    """Merkle node hash, tiled: (8, M, 128) x2 -> (8, M, 128)."""
    M = left.shape[1]
    assert M % SUBLANES == 0
    spec = pl.BlockSpec((8, SUBLANES, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _pair_kernel,
        out_shape=jax.ShapeDtypeStruct((8, M, LANES), jnp.uint32),
        grid=(M // SUBLANES,),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=_interpret(),
    )(left, right)


# ---------------------------------------------------------------------------
# Fused Merkle path walk
# ---------------------------------------------------------------------------

def _walk_tiles(cur, idx, dep, sibs):
    """Depth-masked Merkle path walk over tiles (pure jnp; unit-testable
    off-TPU).  cur: 8-tuple; idx/dep: index and true-depth tiles; sibs:
    list of 8-tuples, leaf level first."""
    for lvl, sib in enumerate(sibs):
        bit = (idx & np.uint32(1)) != np.uint32(0)
        left = tuple(jnp.where(bit, s, c) for s, c in zip(sib, cur))
        right = tuple(jnp.where(bit, c, s) for s, c in zip(sib, cur))
        nxt = _node_tiles(left, right)
        active = np.uint32(lvl) < dep
        cur = tuple(jnp.where(active, n, c) for n, c in zip(nxt, cur))
        idx = jnp.where(active, idx >> np.uint32(1), idx)
    return cur


def _merkle_kernel(depth, leaf_ref, idx_ref, dep_ref, sib_ref, out_ref):
    cur = _walk_tiles(
        tuple(leaf_ref[i] for i in range(8)),
        idx_ref[0],
        dep_ref[0],
        [tuple(sib_ref[lvl, i] for i in range(8)) for lvl in range(depth)],
    )
    for i in range(8):
        out_ref[i] = cur[i]


@functools.partial(jax.jit, static_argnums=(3,))
def merkle_walk_tiled(leaf, idx, sibs, depth: int, depths=None):
    """Fused authentication-path walk, tiled layout.

    leaf: (8, M, 128); idx: (1, M, 128); sibs: (depth, 8, M, 128);
    depths: (1, M, 128) true path depths (defaults to `depth` everywhere).
    Returns the recomputed roots (8, M, 128).
    """
    M = leaf.shape[1]
    assert M % SUBLANES == 0
    if depths is None:
        depths = jnp.full((1, M, LANES), np.uint32(depth))
    dspec = pl.BlockSpec((8, SUBLANES, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    ispec = pl.BlockSpec((1, SUBLANES, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_merkle_kernel, depth),
        out_shape=jax.ShapeDtypeStruct((8, M, LANES), jnp.uint32),
        grid=(M // SUBLANES,),
        in_specs=[
            dspec,
            ispec,
            ispec,
            pl.BlockSpec((depth, 8, SUBLANES, LANES),
                         lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=dspec,
        interpret=_interpret(),
    )(leaf, idx.astype(jnp.uint32), depths.astype(jnp.uint32), sibs)


# ---------------------------------------------------------------------------
# Layout wrappers: (..., W)-trailing <-> tiled (W, M, 128) with lane padding
# ---------------------------------------------------------------------------

def _pad_to_tile(B: int) -> int:
    return max(TILE, ((B + TILE - 1) // TILE) * TILE)


def _flatten_pad(x, n_words: int):
    """(..., W) -> (W, M, 128), plus the original batch shape and true B."""
    batch_shape = x.shape[:-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    Bp = _pad_to_tile(B)
    flat = x.reshape(B, n_words).T
    if Bp != B:
        flat = jnp.pad(flat, ((0, 0), (0, Bp - B)))
    return flat.reshape(n_words, Bp // LANES, LANES), batch_shape, B


def _unflatten(tiled, batch_shape, B):
    w = tiled.shape[0]
    return tiled.reshape(w, -1)[:, :B].T.reshape(batch_shape + (w,))


def sha256_words(words):
    """Drop-in for ops.sha256.sha256_words on static-length messages."""
    n = words.shape[-1]
    msg, bshape, B = _flatten_pad(words, n)
    return _unflatten(sha256_words_tiled(msg, n), bshape, B)


def sha256_pair(left, right):
    """Drop-in for ops.sha256.sha256_pair."""
    left, right = jnp.broadcast_arrays(left, right)
    l, bshape, B = _flatten_pad(left, 8)
    r, _, _ = _flatten_pad(right, 8)
    return _unflatten(sha256_pair_tiled(l, r), bshape, B)


def merkle_compute_root(leaf_digest, index, siblings, depths=None):
    """Drop-in for ops.merkle.compute_root (+ padded-depth variant).

    leaf_digest: (..., 8); index: (...,); siblings: (..., D, 8);
    depths: None (all paths full depth D) or an int array broadcastable to
    the batch shape giving each path's true depth.
    """
    D = siblings.shape[-2]
    leaf_digest, idxb = jnp.broadcast_arrays(
        leaf_digest, jnp.asarray(index, jnp.uint32)[..., None]
    )
    bshape = leaf_digest.shape[:-1]
    B = int(np.prod(bshape)) if bshape else 1
    Bp = _pad_to_tile(B)

    leaf, _, _ = _flatten_pad(leaf_digest, 8)
    idx = idxb[..., 0].reshape(1, B)
    if Bp != B:
        idx = jnp.pad(idx, ((0, 0), (0, Bp - B)))
    idx = idx.reshape(1, Bp // LANES, LANES)

    sibs = jnp.broadcast_to(siblings, bshape + (D, 8))
    sibs = jnp.moveaxis(sibs.reshape(B, D, 8), 0, -1)  # (D, 8, B)
    if Bp != B:
        sibs = jnp.pad(sibs, ((0, 0), (0, 0), (0, Bp - B)))
    sibs = sibs.reshape(D, 8, Bp // LANES, LANES)

    dep = None
    if depths is not None:
        dep = jnp.broadcast_to(jnp.asarray(depths, jnp.uint32), bshape)
        dep = dep.reshape(1, B)
        if Bp != B:
            dep = jnp.pad(dep, ((0, 0), (0, Bp - B)))
        dep = dep.reshape(1, Bp // LANES, LANES)

    out = merkle_walk_tiled(leaf, idx, sibs, D, dep)
    return _unflatten(out, bshape, B)
