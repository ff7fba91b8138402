"""stark101 Fiat-Shamir channel (SHA-256 state, modular-reduction draws).

Bit-exact with /root/reference/stark101/src/channel.simf and the Python
prover channel (stark101/scripts/fibsquare/channel.py):

* state  = 32-byte digest, (..., 8) u32
* mix    : state = H(state || payload)
* draw   : value = int_be(state) mod max ; state = H(state)
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.field101 import mod_words_be
from ...ops.sha256 import sha256_words
from ...utils import trace as _trace


def mix_words(state, words):
    digest = sha256_words(jnp.concatenate([state, words], axis=-1))
    _trace.emit("mix", digest)
    return digest


def mix_u32(state, value):
    return mix_words(state, jnp.asarray(value, jnp.uint32)[..., None])


def draw(state, max_value: int):
    """Draw an integer in [0, max_value) and advance the state."""
    value = mod_words_be(state, max_value)
    _trace.emit("draw", value)
    return sha256_words(state), value
