"""End-to-end stwo verifier tests against the reference prover fixtures
(tests/fixtures/stwo/proof_test.json and proof.json — real stwo outputs,
copied from /root/reference/stwo-verifier/tests/data/)."""

import jax
import numpy as np
import pytest

from stark_symphony_tpu.models.stwo import proof as P
from stark_symphony_tpu.models.stwo import verifier
from stark_symphony_tpu.models.stwo.config import PRODUCTION, TESTING


@pytest.fixture(scope="module")
def test_proof(fixtures_dir):
    return P.load_json(str(fixtures_dir / "stwo" / "proof_test.json"))


@pytest.fixture(scope="module")
def prod_proof(fixtures_dir):
    return P.load_json(str(fixtures_dir / "stwo" / "proof.json"))


def test_config_detection(test_proof, prod_proof):
    assert test_proof[1] == TESTING
    assert prod_proof[1] == PRODUCTION


def test_verify_test_proof(test_proof):
    proof, cfg = test_proof
    ok, masks = jax.jit(lambda p: verifier.verify(p, cfg))(proof)
    failed = [k for k, v in masks.items() if not bool(np.asarray(v).all())]
    assert bool(ok), f"failed masks: {failed}"


def test_verify_prod_proof(prod_proof):
    proof, cfg = prod_proof
    ok, masks = jax.jit(lambda p: verifier.verify(p, cfg))(proof)
    failed = [k for k, v in masks.items() if not bool(np.asarray(v).all())]
    assert bool(ok), f"failed masks: {failed}"


def _tamper(proof, field, mutate):
    d = proof._asdict()
    d[field] = mutate(np.array(d[field]))
    return P.StwoProof(**d)


@pytest.mark.parametrize(
    "field,mutate",
    [
        ("trace_evals", lambda a: a + np.uint32(1)),
        ("cp_evals", lambda a: a ^ np.uint32(1)),
        ("oods_cp", lambda a: a ^ np.uint32(2)),
        ("fri_last", lambda a: a ^ np.uint32(1)),
        ("pow_nonce", lambda a: a + np.uint32(1)),
        ("commitments", lambda a: a ^ np.uint32(1)),
    ],
)
def test_tampered_proof_rejected(test_proof, field, mutate):
    proof, cfg = test_proof
    bad = _tamper(proof, field, mutate)
    ok, _ = jax.jit(lambda p: verifier.verify(p, cfg))(bad)
    assert not bool(ok)


def test_batch_verify(test_proof):
    proof, cfg = test_proof
    batch = P.replicate(proof, 4)
    # tamper proof #2 in the batch
    te = np.array(batch.trace_evals)
    te[2] += 1
    batch = batch._replace(trace_evals=te)
    bitmap = verifier.verify_batch(batch, cfg)
    np.testing.assert_array_equal(np.asarray(bitmap), [True, True, False, True])
