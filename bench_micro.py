"""Microbenchmarks: per-primitive throughput to localize the e2e gap.

Covers SURVEY.md §7 step 9: SHA-256 compressions/s, Merkle path walks/s,
M31/QM31 field mul/s, and circle-FFT evaluation at log sizes 10-20 (the
BASELINE "Circle FFT at log-sizes 10-20" config).

Prints one JSON object per line; writes them all to MICRO.json.

Env: MICRO_N (lane count for hash/field benches, default 1<<17),
MICRO_ITERS (default 10), MICRO_OUT (default MICRO.json).
"""

import json
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)


def _time(step, state, iters):
    """Time `state = step(state)` chains: each iteration consumes the
    previous output, so no runtime layer can elide or cache repeated
    identical executions (naive same-input loops measured impossibly
    fast — above hardware peak — through the remote-TPU path)."""
    import jax

    state = step(state)  # compile
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from stark_symphony_tpu.ops import field as F
    from stark_symphony_tpu.ops import merkle, sha256
    from stark_symphony_tpu.ops.circle_fft import cfft_eval

    n = int(os.environ.get("MICRO_N", str(1 << 17)))
    iters = int(os.environ.get("MICRO_ITERS", "10"))
    backend = jax.default_backend()
    rng = np.random.default_rng(0)
    rows = []

    def emit(metric, value, unit, **kw):
        row = {"metric": metric, "value": round(value, 1), "unit": unit,
               "backend": backend, **kw}
        rows.append(row)
        print(json.dumps(row))

    # SHA-256 Merkle node hash: 2 compressions per call
    left = jnp.asarray(rng.integers(0, 1 << 32, (n, 8), dtype=np.uint32))
    right = jnp.asarray(rng.integers(0, 1 << 32, (n, 8), dtype=np.uint32))
    pair = jax.jit(lambda l: sha256.sha256_pair(l, right))
    dt = _time(pair, left, iters=iters)
    emit("sha256_compressions_per_sec", 2 * n / dt, "compr/s", lanes=n)

    # Fused Merkle path walk, depth 13 (the stage-V production depth)
    depth = 13
    sibs = jnp.asarray(rng.integers(0, 1 << 32, (n, depth, 8), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, 1 << depth, (n,), dtype=np.uint32))
    walk = jax.jit(lambda leaf: merkle.compute_root(leaf, idx, sibs))
    dt = _time(walk, left, iters=iters)
    emit("merkle_paths_per_sec", n / dt, "paths/s", depth=depth, lanes=n)
    emit("merkle_compressions_per_sec", 2 * depth * n / dt, "compr/s",
         depth=depth, lanes=n)

    # Field multiply throughput
    b = jnp.asarray(rng.integers(0, F.P, (n * 8,), dtype=np.uint32))
    a = jnp.asarray(rng.integers(0, F.P, (n * 8,), dtype=np.uint32))
    m31mul = jax.jit(lambda x: F.m31_mul(x, b))
    dt = _time(m31mul, a, iters=iters)
    emit("m31_mul_per_sec", b.size / dt, "mul/s", lanes=b.size)

    qa = jnp.asarray(rng.integers(0, F.P, (n, 4), dtype=np.uint32))
    qb = jnp.asarray(rng.integers(0, F.P, (n, 4), dtype=np.uint32))
    qmul = jax.jit(lambda x: F.qm31_mul(x, qb))
    dt = _time(qmul, qa, iters=iters)
    emit("qm31_mul_per_sec", n / dt, "mul/s", lanes=n)

    # Circle FFT evaluation, log sizes 10-20 (BASELINE config)
    for log in range(10, 21):
        coeffs = jnp.asarray(
            rng.integers(0, F.P, (1 << log,), dtype=np.uint32)
        )
        f = jax.jit(lambda c, log=log: cfft_eval(c, log))
        dt = _time(f, coeffs, iters=max(3, iters // 2))
        emit("circle_fft_eval_per_sec", 1.0 / dt, "ffts/s", log_size=log,
             points=1 << log)

    with open(os.environ.get("MICRO_OUT", "MICRO.json"), "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
