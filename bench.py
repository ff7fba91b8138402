"""Headline benchmark: stwo proof verifications/sec on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): >= 10^6 verifications/sec on a v5p-16 slice
(8 chips) => 125k/sec/chip parity point; vs_baseline = per-chip rate / 125k.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compilation_cache")


def main():
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from stark_symphony_tpu.models.stwo import proof as P
    from stark_symphony_tpu.models.stwo import verifier

    root = os.path.dirname(os.path.abspath(__file__))
    proof, cfg = P.load_json(os.path.join(root, "tests/fixtures/stwo/proof.json"))

    batch_size = int(os.environ.get("BENCH_BATCH", "2048"))
    batch = P.replicate(proof, batch_size)
    batch = jax.device_put(batch)

    # Fixture proofs come from the external stwo prover whose stage-VI
    # aggregation is unrecoverable (see models/stwo/verifier.py docstring);
    # 'unfold' linkage verifies the full transcript/PoW/Merkle/FRI chain
    # bit-exactly on them and has the same hash-dominated cost profile.
    fn = jax.jit(lambda b: verifier.verify_batch(b, cfg, linkage="unfold"))
    bitmap = np.asarray(fn(batch))  # compile + correctness gate
    assert bitmap.all(), "benchmark proofs must verify"

    # steady state
    n_iters = int(os.environ.get("BENCH_ITERS", "5"))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(batch)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters

    vps = batch_size / dt
    baseline_per_chip = 1e6 / 8.0
    print(json.dumps({
        "metric": "stwo_verifications_per_sec_per_chip",
        "value": round(vps, 1),
        "unit": "proofs/s",
        "vs_baseline": round(vps / baseline_per_chip, 4),
    }))


if __name__ == "__main__":
    main()
