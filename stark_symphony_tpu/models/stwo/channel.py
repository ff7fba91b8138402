"""stwo Fiat-Shamir channel: SHA-256 "so-far digest" + draw counter.

Bit-exact re-design of /root/reference/stwo-verifier/src/channel.simf for
batched uint32 lanes:

* state = (digest: (..., 8) u32, counter: (...,) u32)
* draw  = SHA-256(digest || counter_be32), counter += 1
* mix   = SHA-256(digest || payload), counter = 0
* M31 draws use rejection sampling (all words < 2P = 2^32 - 2).  The
  reference retries in an unbounded `for_while`; under jit we unroll a
  fixed K=2 attempts and select — P(single rejection) = 4*2^-31 per draw,
  P(two consecutive) ~ 3.5e-18, surfaced through the returned `ok` mask
  rather than silently wrong transcripts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ...ops import field as F
from ...ops.sha256 import sha256_words
from ...utils import trace as _trace

DBL_P = jnp.uint32(0xFFFFFFFE)  # 2 * (2^31 - 1) = 2^32 - 2


class ChannelState(NamedTuple):
    digest: jnp.ndarray  # (..., 8) uint32
    counter: jnp.ndarray  # (...,) uint32


def init(shape=()) -> ChannelState:
    import numpy as np

    return ChannelState(
        np.zeros(tuple(shape) + (8,), np.uint32),
        np.zeros(tuple(shape), np.uint32),
    )


def draw_words(state: ChannelState):
    """One draw: H(digest || counter) -> 8 u32 words; counter += 1."""
    msg = jnp.concatenate([state.digest, state.counter[..., None]], axis=-1)
    words = sha256_words(msg)
    _trace.emit("draw", words)
    return ChannelState(state.digest, state.counter + 1), words


def mix_words(state: ChannelState, words) -> ChannelState:
    """Mix payload words: digest = H(digest || words); counter = 0."""
    msg = jnp.concatenate([state.digest, words], axis=-1)
    digest = sha256_words(msg)
    _trace.emit("mix", digest)
    return ChannelState(digest, jnp.zeros_like(state.counter))


def mix_root(state: ChannelState, root) -> ChannelState:
    """Mix a 32-byte commitment (channel.simf:153-161)."""
    return mix_words(state, root)


def mix_u64(state: ChannelState, hi, lo) -> ChannelState:
    """Mix an 8-byte big-endian value (channel.simf:164-172)."""
    words = jnp.stack([jnp.asarray(hi, jnp.uint32), jnp.asarray(lo, jnp.uint32)], axis=-1)
    return mix_words(state, words)


def _attempt_m31(state: ChannelState, n: int):
    state, words = draw_words(state)
    ok = jnp.all(words[..., :n] < DBL_P, axis=-1)
    vals = F.m31_reduce(words[..., :n])
    return state, vals, ok


def draw_m31(state: ChannelState, n: int, attempts: int = 2):
    """Draw n (4 or 8) uniform M31 values with a K-attempt rejection unroll.

    Returns (state, vals (..., n), ok).  `ok` is False on the (astronomically
    unlikely) event that all K attempts were rejected, in which case the
    transcript would diverge from the reference — callers fold `ok` into the
    proof-validity mask.
    """
    assert n in (4, 8)
    st1, vals, ok1 = _attempt_m31(state, n)
    accept = ok1
    out_state, out_vals = st1, vals
    ok_any = ok1
    for _ in range(attempts - 1):
        st2, vals2, ok2 = _attempt_m31(out_state, n)
        # lanes that already accepted keep their value and DON'T advance state
        new_digest = out_state.digest  # digest never changes on draw
        new_counter = jnp.where(accept, out_state.counter, st2.counter)
        out_vals = jnp.where(accept[..., None], out_vals, vals2)
        out_state = ChannelState(new_digest, new_counter)
        ok_any = ok_any | ok2
        accept = accept | ok2
    return out_state, out_vals, ok_any


def draw_qm31(state: ChannelState):
    state, vals, ok = draw_m31(state, 4)
    return state, vals, ok


def draw_qm31_point(state: ChannelState):
    """t -> ((1 - t^2)/(1 + t^2), 2t/(1 + t^2)) (channel.simf:143-150)."""
    state, t, ok = draw_qm31(state)
    one = F.qm31_one(t.shape[:-1])
    t_sq = F.qm31_sqr(t)
    inv = F.qm31_inv(F.qm31_add(one, t_sq))
    x = F.qm31_mul(F.qm31_sub(one, t_sq), inv)
    y = F.qm31_mul(F.qm31_add(t, t), inv)
    point = jnp.stack([x, y], axis=-2)  # (..., 2, 4)
    return state, point, ok


def draw_queries(state: ChannelState, n_queries: int, log_size: int):
    """Draw query positions: each SHA digest yields 8 masked words
    (fri/queries.simf:14-43).  No sort/dedup (documented reference
    simplification)."""
    mask = jnp.uint32((1 << log_size) - 1)
    chunks = []
    for _ in range((n_queries + 7) // 8):
        state, words = draw_words(state)
        chunks.append(words & mask)
    queries = jnp.concatenate(chunks, axis=-1)[..., :n_queries]
    return state, queries
