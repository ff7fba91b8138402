"""Microbenchmarks: per-primitive throughput to localize the e2e gap.

Covers SURVEY.md §7 step 9: SHA-256 compressions/s, Merkle path walks/s,
M31/QM31 field mul/s, and circle-FFT evaluation at log sizes 10-20 (the
BASELINE "Circle FFT at log-sizes 10-20" config).

Methodology (fixed in r04 after r03's numbers proved internally
inconsistent):

* Each measured op runs `inner` times inside ONE jitted `lax.fori_loop`
  with a chained carry — every iteration consumes the previous result, so
  neither async dispatch, nor a deduplicating runtime, nor per-call launch
  overhead can fake the number, and kernel time >> dispatch time.
* Hash kernels are timed on their native tiled layout (the layout the
  fused verifier path uses) so wrapper relayout cost is not attributed to
  the kernel.
* The final carry is fetched to host inside the timed region.
* Self-consistency gates are computed and emitted with the numbers:
  - merkle-walk compr/s within 4x of pair compr/s (same compression fn);
  - circle-FFT time must GROW with N (dispatch-bound plateaus are flagged).

Prints one JSON object per line; writes them all to MICRO_OUT
(default MICRO.json).

Env: MICRO_N (lane count for hash/field benches, default 1<<17),
MICRO_ITERS (outer timing reps, default 3), MICRO_INNER (chained steps per
jit, default 50), MICRO_OUT.
"""

import json
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from stark_symphony_tpu.ops import field as F
    from stark_symphony_tpu.ops.circle_fft import cfft_eval
    from stark_symphony_tpu.ops.pallas import sha256_kernel as pk

    n = int(os.environ.get("MICRO_N", str(1 << 17)))
    iters = int(os.environ.get("MICRO_ITERS", "3"))
    inner = int(os.environ.get("MICRO_INNER", "50"))
    backend = jax.default_backend()
    rng = np.random.default_rng(0)
    rows = []

    def emit(metric, value, unit, **kw):
        row = {"metric": metric, "value": round(value, 1), "unit": unit,
               "backend": backend, **kw}
        rows.append(row)
        print(json.dumps(row), flush=True)

    def timed(fn, arg):
        """fn: jitted chained-loop; returns secs per OUTER call (which runs
        `inner` chained steps); final value fetched to host."""
        out = fn(arg)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # warm + fetch
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(out) if _chainable(out, arg) else fn(arg)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / iters

    def _chainable(out, arg):
        return jax.tree_util.tree_structure(out) == \
            jax.tree_util.tree_structure(arg) and all(
                a.shape == b.shape for a, b in zip(
                    jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(arg))
            )

    M = n // 128
    assert M % 8 == 0, "MICRO_N must be a multiple of 1024"

    # --- SHA-256 pair (Merkle node hash): 2 compressions per step -------
    right = jnp.asarray(rng.integers(0, 1 << 32, (8, M, 128), dtype=np.uint32))
    left0 = jnp.asarray(rng.integers(0, 1 << 32, (8, M, 128), dtype=np.uint32))

    @jax.jit
    def pair_chain(l):
        return jax.lax.fori_loop(
            0, inner, lambda i, c: pk.sha256_pair_tiled(c, right), l
        )

    dt = timed(pair_chain, left0)
    pair_rate = 2 * n * inner / dt
    emit("sha256_compressions_per_sec", pair_rate, "compr/s", lanes=n,
         chained_steps=inner)

    # --- fused Merkle walk, depth 13 (stage-V production depth) ---------
    depth = 13
    sibs = jnp.asarray(
        rng.integers(0, 1 << 32, (depth, 8, M, 128), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, 1 << depth, (1, M, 128), dtype=np.uint32))

    @jax.jit
    def walk_chain(l):
        return jax.lax.fori_loop(
            0, inner,
            lambda i, c: pk.merkle_walk_tiled(c, idx, sibs, depth), l,
        )

    dt = timed(walk_chain, left0)
    walk_rate = 2 * depth * n * inner / dt
    emit("merkle_paths_per_sec", n * inner / dt, "paths/s", depth=depth,
         lanes=n, chained_steps=inner)
    emit("merkle_compressions_per_sec", walk_rate, "compr/s", depth=depth,
         lanes=n, chained_steps=inner)

    # consistency gate: same compression function.  The walk runs 26
    # compressions per grid step vs the pair's 2, so the pair rate is
    # partially fixed-per-step-overhead-bound (~10 us/step measured on
    # v5e) and the walk rate is the kernel-efficiency number — a ratio in
    # (1, 8] is the expected signature; <1 (dispatch artifact) or >8
    # (elision) flags a broken measurement.
    ratio = walk_rate / pair_rate
    emit("gate_walk_vs_pair_ratio", ratio, "x",
         consistent=bool(1.0 <= ratio <= 8.0))

    # --- field multiplies (chained: x <- x * b) -------------------------
    b = jnp.asarray(rng.integers(1, F.P, (n * 8,), dtype=np.uint32))
    a0 = jnp.asarray(rng.integers(0, F.P, (n * 8,), dtype=np.uint32))

    @jax.jit
    def m31_chain(x):
        return jax.lax.fori_loop(0, inner, lambda i, c: F.m31_mul(c, b), x)

    dt = timed(m31_chain, a0)
    emit("m31_mul_per_sec", b.size * inner / dt, "mul/s", lanes=b.size,
         chained_steps=inner)

    qb = jnp.asarray(rng.integers(1, F.P, (n, 4), dtype=np.uint32))
    qa0 = jnp.asarray(rng.integers(0, F.P, (n, 4), dtype=np.uint32))

    @jax.jit
    def qm31_chain(x):
        return jax.lax.fori_loop(0, inner, lambda i, c: F.qm31_mul(c, qb), x)

    dt = timed(qm31_chain, qa0)
    emit("qm31_mul_per_sec", n * inner / dt, "mul/s", lanes=n,
         chained_steps=inner)

    # --- circle FFT eval, log 10-20 (chained: evals feed back as coeffs)
    fft_inner = max(2, inner // 10)
    fft_times = {}
    for log in range(10, 21):
        c0 = jnp.asarray(rng.integers(0, F.P, (1 << log,), dtype=np.uint32))

        @jax.jit
        def fft_chain(c, log=log):
            return jax.lax.fori_loop(
                0, fft_inner, lambda i, x: cfft_eval(x, log), c
            )

        dt = timed(fft_chain, c0) / fft_inner
        fft_times[log] = dt
        emit("circle_fft_eval_per_sec", 1.0 / dt, "ffts/s", log_size=log,
             points=1 << log, chained_steps=fft_inner)

    # consistency gate: a 1024x work range must not time flat
    growth = fft_times[20] / fft_times[10]
    emit("gate_fft_time_growth_20_vs_10", growth, "x",
         consistent=bool(growth > 4.0))

    with open(os.environ.get("MICRO_OUT", "MICRO.json"), "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
