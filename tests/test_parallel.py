"""Parallel-layer tests on the simulated 8-device CPU mesh (SURVEY.md §2.4):
fold-stage sharding (SP), microbatch pipelining (PP), multi-AIR routing (EP).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stark_symphony_tpu.models.stwo import config as stwo_config
from stark_symphony_tpu.models.stwo import proof as stwo_proof
from stark_symphony_tpu.models.stwo import prover as stwo_prover
from stark_symphony_tpu.models.stwo import verifier as stwo_verifier
from stark_symphony_tpu.ops import field101 as F101
from stark_symphony_tpu.parallel.batch import make_mesh
from stark_symphony_tpu.parallel.expert import (
    verify_batch_routed,
    verify_batch_routed_sharded,
)
from stark_symphony_tpu.parallel.fri_shard import (
    stark101_fold_reference,
    stark101_fold_sharded,
)
from stark_symphony_tpu.parallel.pipeline import StreamVerifier, scan_microbatches

CFG = stwo_config.TESTING


def test_sharded_fold_matches_reference():
    rng = np.random.default_rng(7)
    n, stages = 256, 3
    values = jnp.asarray(rng.integers(0, F101.Q, n, dtype=np.uint64), jnp.uint32)
    # fold coordinates: 1/x over a multiplicative coset (like stark101's LDE)
    x0 = pow(F101.GEN, 3, F101.Q)
    xs = np.empty(n, np.uint32)
    cur = 1
    for i in range(n):
        xs[i] = cur
        cur = (cur * x0) % F101.Q
    x_invs = jnp.asarray([pow(int(v), F101.Q - 2, F101.Q) for v in xs], jnp.uint32)
    betas = [jnp.uint32(rng.integers(1, F101.Q)) for _ in range(stages)]

    want_v, want_x = stark101_fold_reference(values, x_invs, betas, stages)
    mesh1 = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("sp",))
    got_v, got_x = stark101_fold_sharded(values, x_invs, betas, mesh1, stages)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_x), np.asarray(want_x))


@pytest.fixture(scope="module")
def fib_proof():
    proof, _ = stwo_prover.prove(CFG)
    return proof


@pytest.fixture(scope="module")
def product_proof():
    proof, _ = stwo_prover.prove(CFG, air="wide_product")
    return proof


def test_scan_microbatches_matches_vmap(fib_proof):
    batch = stwo_proof.replicate(fib_proof, 8)
    verify_one = lambda p: stwo_verifier.verify(p, CFG)[0]
    want = jax.vmap(verify_one)(batch)
    got = scan_microbatches(verify_one, batch, micro=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert np.asarray(got).all()


def test_stream_verifier(fib_proof):
    sv = StreamVerifier(
        lambda b: stwo_verifier.verify_batch(b, CFG), depth=2
    )
    for _ in range(5):
        sv.feed(stwo_proof.replicate(fib_proof, 4))
    outs = sv.finish()
    assert len(outs) == 5
    assert all(np.asarray(o).all() for o in outs)


def test_wide_product_air_roundtrip(product_proof):
    ok, _ = stwo_verifier.verify_jit(product_proof, CFG, "wide_product")
    assert bool(ok)
    # the wrong AIR must reject (OODS composition check fails)
    bad, masks = stwo_verifier.verify_jit(product_proof, CFG, "wide_fibonacci")
    assert not bool(bad)
    assert not bool(masks["oods_cp_match"])


def test_routed_batch(fib_proof, product_proof):
    batch = stwo_proof.stack([fib_proof, product_proof, product_proof, fib_proof])
    air_ids = np.array([0, 1, 1, 0], np.int32)
    bits = verify_batch_routed(batch, air_ids, CFG)
    assert np.asarray(bits).all()
    # swapped routing rejects every proof
    bits_bad = verify_batch_routed(batch, 1 - air_ids, CFG)
    assert not np.asarray(bits_bad).any()


def test_routed_batch_sharded(fib_proof, product_proof):
    mesh = make_mesh(8)
    batch = stwo_proof.stack([fib_proof, product_proof] * 4)
    air_ids = np.array([0, 1] * 4, np.int32)
    bitmap, n_ok = verify_batch_routed_sharded(batch, air_ids, CFG, mesh)
    assert np.asarray(bitmap).all()
    assert int(n_ok) == 8
