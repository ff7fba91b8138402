"""Tests for the Pallas SHA-256/Merkle kernels (ops/pallas/sha256_kernel.py).

The kernels are the TPU hot path for the verifier's dominant op (SHA-256
compressions — the `sha_256_ctx_8_*` jets of
/root/reference/stwo-verifier/src/{channel,hasher,merkle}.simf).

Strategy: the kernel bodies are pure jnp functions over word tiles
(`_sha_words_tiles`, `_node_tiles`, `_walk_tiles`), unit-tested here on CPU
against hashlib and the lax implementations — byte-for-byte the same math
the Mosaic kernel executes.  The pallas plumbing (BlockSpecs, grid, layout
wrappers) additionally runs under the real TPU backend via the `tpu`-marked
tests (exercised on hardware; `bench.py`'s all-accept gate over
prover-generated proofs covers it end-to-end), and off-TPU in interpreter
mode when STPU_PALLAS=1 (too slow for CI — the interpreter costs ~3ms/op).
"""

import hashlib

import jax
import numpy as np
import pytest

from stark_symphony_tpu.ops import merkle, sha256
from stark_symphony_tpu.ops.pallas import sha256_kernel as pk

ON_TPU = pk._is_tpu_like()

tpu_only = pytest.mark.skipif(not ON_TPU, reason="needs TPU backend")


def _rand(shape, seed=0):
    return np.random.default_rng(seed).integers(
        0, 1 << 32, size=shape, dtype=np.uint32
    )


def _hashlib_words(msg_words_row) -> np.ndarray:
    raw = msg_words_row.astype(">u4").tobytes()
    return np.frombuffer(hashlib.sha256(raw).digest(), dtype=">u4").astype(
        np.uint32
    )


@pytest.mark.parametrize("n_words", [4, 9, 16, 24])
def test_kernel_math_sha_words(n_words):
    """The exact tile math the kernel runs == hashlib, any message length."""
    msgs = _rand((33, n_words), seed=n_words)
    tiles = [msgs[:, i] for i in range(n_words)]  # word tiles of shape (B,)
    out = np.stack([np.asarray(t) for t in pk._sha_words_tiles(tiles)], axis=1)
    want = np.stack([_hashlib_words(msgs[i]) for i in range(len(msgs))])
    np.testing.assert_array_equal(out, want)


@pytest.mark.parametrize("n_words", [4, 16])
def test_kernel_math_interleaved_pair_stream(n_words):
    """The round-interleaved two-stream compression (_compress_tiles2 via
    fri_kernel._sha_words_tiles2) is bit-identical to two independent
    single-stream hashes — the ILP transform must not change a bit."""
    from stark_symphony_tpu.ops.pallas import fri_kernel as fk

    m0 = _rand((29, n_words), seed=50 + n_words)
    m1 = _rand((29, n_words), seed=51 + n_words)
    t0 = [m0[:, i] for i in range(n_words)]
    t1 = [m1[:, i] for i in range(n_words)]
    got0, got1 = fk._sha_words_tiles2(t0, t1)
    want0 = pk._sha_words_tiles(t0)
    want1 = pk._sha_words_tiles(t1)
    np.testing.assert_array_equal(
        np.stack([np.asarray(x) for x in got0]),
        np.stack([np.asarray(x) for x in want0]))
    np.testing.assert_array_equal(
        np.stack([np.asarray(x) for x in got1]),
        np.stack([np.asarray(x) for x in want1]))


def test_kernel_math_node_pair():
    left = _rand((17, 8), seed=2)
    right = _rand((17, 8), seed=3)
    out = np.stack(
        [
            np.asarray(t)
            for t in pk._node_tiles(
                tuple(left[:, i] for i in range(8)),
                tuple(right[:, i] for i in range(8)),
            )
        ],
        axis=1,
    )
    for i in (0, 9, 16):
        raw = left[i].astype(">u4").tobytes() + right[i].astype(">u4").tobytes()
        want = np.frombuffer(hashlib.sha256(raw).digest(), dtype=">u4")
        np.testing.assert_array_equal(out[i], want.astype(np.uint32))


def test_kernel_math_walk_matches_scan():
    """Depth-masked walk == ops.merkle lax scan, incl. per-path depths."""
    max_depth, n = 6, 64
    rng = np.random.default_rng(7)
    depths = rng.integers(1, max_depth + 1, size=n).astype(np.uint32)
    leaves = _rand((n, 8), seed=8)
    sibs = _rand((n, max_depth, 8), seed=9)
    idx = (_rand((n,), seed=10) % (1 << depths)).astype(np.uint32)
    got = np.stack(
        [
            np.asarray(t)
            for t in pk._walk_tiles(
                tuple(leaves[:, i] for i in range(8)),
                idx,
                depths,
                [
                    tuple(sibs[:, lvl, i] for i in range(8))
                    for lvl in range(max_depth)
                ],
            )
        ],
        axis=1,
    )
    want = np.stack(
        [
            np.asarray(
                merkle.compute_root(
                    leaves[i], idx[i], sibs[i, : int(depths[i])]
                )
            )
            for i in range(n)
        ]
    )
    np.testing.assert_array_equal(got, want)


# --------------------------------------------------------------------------
# Pallas plumbing on real hardware (layout wrappers, BlockSpecs, grid)
# --------------------------------------------------------------------------

@tpu_only
@pytest.mark.parametrize("n_words", [4, 9, 16])
def test_tpu_sha256_words_wrapper(n_words):
    msgs = _rand((300, n_words), seed=n_words)  # pads 300 -> one lane tile
    got = np.asarray(pk.sha256_words(msgs))
    want = np.stack([_hashlib_words(msgs[i]) for i in range(len(msgs))])
    np.testing.assert_array_equal(got, want)


@tpu_only
def test_tpu_merkle_wrapper():
    depth, n = 13, 1500
    leaves = _rand((n, 8), seed=4)
    sibs = _rand((n, depth, 8), seed=5)
    idx = _rand((n,), seed=6) % (1 << depth)
    want = np.asarray(merkle.compute_root(leaves, idx, sibs))
    got = np.asarray(pk.merkle_compute_root(leaves, idx, sibs))
    np.testing.assert_array_equal(got, want)


# --------------------------------------------------------------------------
# Natively-batched verify (the Pallas-friendly entry) — backend-agnostic
# --------------------------------------------------------------------------

def test_batched_verify_equals_vmapped(fixtures_dir, monkeypatch):
    """Natively-batched verify == vmapped verify, and tampering flips only
    the tampered lane."""
    monkeypatch.setenv("STPU_PALLAS", "0")
    from stark_symphony_tpu.models.stwo import proof as P
    from stark_symphony_tpu.models.stwo import verifier

    proof, cfg = P.load_json(str(fixtures_dir / "stwo/proof_test.json"))
    batch = P.replicate(proof, 3)
    batch.trace_evals[1, 0, 0] ^= 1
    results = {}
    for linkage in ("unfold", "reference"):
        native = np.asarray(verifier.verify_batch(batch, cfg, linkage=linkage))
        vmapped = np.asarray(
            verifier.verify_batch(batch, cfg, linkage=linkage, use_vmap=True)
        )
        np.testing.assert_array_equal(native, vmapped)
        results[linkage] = native
    # external fixtures verify under 'unfold' only (see verifier.py);
    # the tampered lane must be rejected, the untouched lanes accepted
    assert list(results["unfold"]) == [True, False, True]
