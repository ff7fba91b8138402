"""Tiled (fused-kernel) verify path: bit-equivalence with the standard path.

The tiled path (models/stwo/tiled.py + verifier.verify_batch_tiled) is the
TPU throughput path; its semantics must match verify_batch exactly.  Off-TPU
the Pallas kernels run in interpreter mode (ops/pallas/sha256_kernel._interpret).
"""

import numpy as np
import pytest

from stark_symphony_tpu.models.stwo import proof as P
from stark_symphony_tpu.models.stwo import tiled, verifier
from stark_symphony_tpu.models.stwo.config import TESTING
from stark_symphony_tpu.utils.proofcache import cached_stwo_proof


@pytest.fixture(scope="module")
def batch():
    pf = cached_stwo_proof(TESTING)
    return P.replicate(pf, 6)


def test_tiled_accepts_valid_batch(batch):
    tb = tiled.tile_batch(batch, TESTING)
    bm = np.asarray(verifier.verify_batch_tiled(tb, TESTING))
    assert bm.shape == (6,) and bm.all()


def test_tiled_matches_standard_on_tampered_lanes(batch):
    # corrupt lane 2's cp evals and lane 4's FRI witness; every mask bit
    # must agree with the standard path, and only those lanes may fail
    bad = batch._replace(
        cp_evals=batch.cp_evals.copy(),
        fri_witnesses=tuple(w.copy() for w in batch.fri_witnesses),
    )
    bad.cp_evals[2, 0, 3] ^= 1
    bad.fri_witnesses[1][4, 0, 1] ^= 1

    bm_std = np.asarray(
        verifier.verify_batch(bad, TESTING, linkage="reference")
    )
    tb = tiled.tile_batch(bad, TESTING)
    bm_tld, masks = verifier.verify_batch_tiled(tb, TESTING, with_masks=True)
    bm_tld = np.asarray(bm_tld)
    assert (bm_tld == bm_std).all()
    assert not bm_tld[2] and not bm_tld[4]
    assert bm_tld[[0, 1, 3, 5]].all()
    # the tampered cp evals must flip the cp Merkle mask specifically
    assert not np.asarray(masks["cp_merkle"])[2]


def test_native_relayout_matches_numpy(monkeypatch):
    """The C++ ingestion transpose (native/tile.cpp via ctypes) is
    bit-identical to the numpy relayout for every array shape tile_batch
    produces, including lane padding.  Skipped when the .so isn't built."""
    if tiled._stile() is None:
        pytest.skip("native/libstile.so not built")
    rng = np.random.default_rng(3)
    for shape, m in [((7, 3, 5, 8), 8), ((31, 16, 4), 8),
                     ((6, 1, 8), 8), ((130, 16, 13, 8), 24)]:
        x = rng.integers(0, 1 << 32, shape, dtype=np.uint32)
        got = tiled._tile_words(x, m)
        monkeypatch.setattr(tiled, "_STILE", False)  # force numpy path
        want = tiled._tile_words(x, m)
        monkeypatch.setattr(tiled, "_STILE", None)
        np.testing.assert_array_equal(got, want, err_msg=str(shape))


def test_tiled_padding_lanes_are_dropped():
    # B * Q = 5 lanes -> padded to 1024; pad lanes must not affect results
    pf = cached_stwo_proof(TESTING)
    b5 = P.replicate(pf, 5)
    tb = tiled.tile_batch(b5, TESTING)
    assert tb.trace_evals_t.shape[-2] * 128 >= 5
    bm = np.asarray(verifier.verify_batch_tiled(tb, TESTING))
    assert bm.shape == (5,) and bm.all()
