"""Microbenchmarks: per-primitive throughput to localize the e2e gap.

Covers SURVEY.md §7 step 9: SHA-256 compressions/s, Merkle path walks/s,
the FUSED verifier kernels the headline actually runs (leafwalk_tiled,
fri_all_layers_tiled at the production BLOCK), M31/QM31 field mul/s, and
circle-FFT evaluation at log sizes 10-20 (the BASELINE "Circle FFT at
log-sizes 10-20" config).

Methodology (r04: chained carries; r05: fixed-overhead model + fused
kernels, VERDICT r04 task 3):

* Each measured op runs `inner` times inside ONE jitted `lax.fori_loop`
  with a chained carry — every iteration consumes the previous result, so
  neither async dispatch, nor a deduplicating runtime, nor per-call launch
  overhead can fake the number, and kernel time >> dispatch time.
* Hash kernels are timed on their native tiled layout (the layout the
  fused verifier path uses) so wrapper relayout cost is not attributed to
  the kernel.
* The final carry is fetched to host inside the timed region.
* The fixed per-grid-step cost is MEASURED, not assumed: the same
  leafwalk kernel runs at block=8 and block=16 (same total lanes, half
  the steps), and `fixed_us = (t8 - t16) / (steps8 - steps16)`.  With
  that and the walk kernel's per-compression cost, every other hash rate
  is PREDICTED by `t_step = fixed + n_compr * c * (block/8)` and gated
  against its measurement — r04's walk-vs-pair ratio gate kept failing
  precisely because the 2-compr pair kernel is fixed-cost-bound while
  the 26-compr walk is not; the model gate separates the two regimes
  instead of hiding them in a widened ratio window.
* Self-consistency gates are emitted with the numbers and must all be
  true for the artifact to be publishable (never widen a gate in the
  same commit as a failing artifact).

Prints one JSON object per line; writes them all to MICRO_OUT
(default MICRO.json).

Env: MICRO_N (lane count for hash/field benches, default 1<<17),
MICRO_ITERS (outer timing reps, default 3), MICRO_INNER (chained steps per
jit, default 50), MICRO_OUT, MICRO_SECTIONS (comma list out of
hash,fused,field,fft; default all — off-TPU smoke runs use `fused,field`
because the raw pair/walk kernels only run under the glacial Pallas
interpreter there, while the fused kernels have fast lax fallbacks).
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
    sections = set(os.environ.get(
        "MICRO_SECTIONS", "hash,fused,field,fft").split(","))

    depth = 13
    left0 = jnp.asarray(rng.integers(0, 1 << 32, (8, M, 128), dtype=np.uint32))
    sibs = jnp.asarray(
        rng.integers(0, 1 << 32, (depth, 8, M, 128), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, 1 << depth, (1, M, 128), dtype=np.uint32))

    pair_rate = t_walk_step = None
    if "hash" in sections:
        # --- SHA-256 pair (Merkle node hash): 2 compressions per step ---
        right = jnp.asarray(
            rng.integers(0, 1 << 32, (8, M, 128), dtype=np.uint32))

        @jax.jit
        def pair_chain(l):
            return jax.lax.fori_loop(
                0, inner, lambda i, c: pk.sha256_pair_tiled(c, right), l
            )

        dt = timed(pair_chain, left0)
        pair_rate = 2 * n * inner / dt
        emit("sha256_compressions_per_sec", pair_rate, "compr/s", lanes=n,
             chained_steps=inner)

        # --- fused Merkle walk, depth 13 (stage-V production depth) -----
        @jax.jit
        def walk_chain(l):
            return jax.lax.fori_loop(
                0, inner,
                lambda i, c: pk.merkle_walk_tiled(c, idx, sibs, depth), l,
            )

        dt = timed(walk_chain, left0)
        walk_rate = 2 * depth * n * inner / dt
        t_walk_step = dt / (inner * (M // 8))  # walk kernel runs at blk=8
        emit("merkle_paths_per_sec", n * inner / dt, "paths/s", depth=depth,
             lanes=n, chained_steps=inner)
        emit("merkle_compressions_per_sec", walk_rate, "compr/s",
             depth=depth, lanes=n, chained_steps=inner)

    if "fused" in sections:
        # --- fused stage-V kernel (leafwalk) at block=8 and block=16 ----
        # Same data, same total lanes, half the grid steps: the time delta
        # IS the fixed per-grid-step cost (launch + prologue), measured
        # rather than assumed.  n_words=4 = the trace-tree leaf shape.
        from stark_symphony_tpu.ops.pallas import fri_kernel as fk

        n_words = 4
        evs0 = jnp.asarray(
            rng.integers(0, 1 << 32, (n_words, M, 128), dtype=np.uint32))
        root8 = jnp.asarray(
            rng.integers(0, 1 << 32, (8, M, 128), dtype=np.uint32))

        def lw_chain(block):
            @jax.jit
            def chain(e):
                def body(i, c):
                    ok = fk.leafwalk_tiled(c, idx, sibs, root8, n_words,
                                           depth, block)
                    return c ^ ok  # (1,M,128) broadcasts: chained
                return jax.lax.fori_loop(0, inner, body, e)
            return chain

        dt8 = timed(lw_chain(8), evs0)
        dt16 = timed(lw_chain(16), evs0)
        lw_compr = n_words // 14 + 1 + 2 * depth  # leaf blocks + walk
        lw16_rate = lw_compr * n * inner / dt16
        t_lw8_step = dt8 / (inner * (M // 8))
        t_lw16_step = dt16 / (inner * (M // 16))
        fixed_s = (dt8 - dt16) / (inner * (M // 8 - M // 16))
        emit("leafwalk_tiled_compressions_per_sec", lw16_rate, "compr/s",
             block=16, depth=depth, n_words=n_words, lanes=n,
             chained_steps=inner)
        emit("leafwalk_tiled_lanes_per_sec", n * inner / dt16, "lanes/s",
             block=16)
        emit("fixed_us_per_grid_step", fixed_s * 1e6, "us",
             method="lw8_vs_lw16")

        # per-compression cost c (per 1024-lane step at blk=8), net of the
        # measured fixed cost; the asymptotic rate is the number
        # PROFILE-style models should quote (r04 quoted an unsubstantiated
        # ~3.2G; this is its measured replacement).  Derived from the walk
        # kernel when the hash section ran, else from leafwalk b8.
        if t_walk_step is not None:
            c_s = (t_walk_step - fixed_s) / (2 * depth)
        else:
            c_s = (t_lw8_step - fixed_s) / lw_compr
        asym_rate = 1024 / c_s if c_s > 0 else float("inf")
        emit("sha256_asymptotic_compr_per_sec", asym_rate, "compr/s",
             note="1024-lane grid step, fixed cost removed")

        # --- fused stage-VII kernel (all FRI layers), production shape --
        from stark_symphony_tpu.models.stwo.config import PRODUCTION

        n_layers = 1 + PRODUCTION.n_inner_layers
        depths = tuple(
            PRODUCTION.fri_layer_depth(l) for l in range(n_layers))
        n_fri = min(n, 1 << 15)  # sibs array is sum(depths)*8 words/lane
        Mf = n_fri // 128
        fri_compr = sum(4 + 2 * d for d in depths)
        q0 = jnp.asarray(
            rng.integers(0, 1 << 13, (1, Mf, 128), dtype=np.uint32))
        fe0 = jnp.asarray(
            rng.integers(0, F.P, (4, Mf, 128), dtype=np.uint32))
        wits = jnp.asarray(rng.integers(
            0, F.P, (n_layers, 4, Mf, 128), dtype=np.uint32))
        cinvs = jnp.asarray(rng.integers(
            1, F.P, (n_layers, Mf, 128), dtype=np.uint32))
        alphas = jnp.asarray(rng.integers(
            0, F.P, (n_layers, 4, Mf, 128), dtype=np.uint32))
        fsibs = jnp.asarray(rng.integers(
            0, 1 << 32, (sum(depths), 8, Mf, 128), dtype=np.uint32))
        froots = jnp.asarray(rng.integers(
            0, 1 << 32, (n_layers, 8, Mf, 128), dtype=np.uint32))

        fri_blk = int(os.environ.get("MICRO_FRI_BLOCK", "16"))

        @jax.jit
        def fri_chain(carry):
            def body(i, c):
                q, e = c
                ok, folded, q_out = fk.fri_all_layers_tiled(
                    q, e, wits, cinvs, alphas, fsibs, froots, depths,
                    fri_blk)
                return q_out ^ (ok[:1]), folded
            return jax.lax.fori_loop(0, inner, body, carry)

        dt = timed(fri_chain, (q0, fe0))
        fri_rate = fri_compr * n_fri * inner / dt
        t_fri_step = dt / (inner * max(1, Mf // fri_blk))
        emit("fri_all_layers_tiled_compressions_per_sec", fri_rate,
             "compr/s", block=fri_blk, layers=n_layers,
             compr_per_lane=fri_compr, lanes=n_fri, chained_steps=inner,
             interleave=bool(fk.INTERLEAVE))
        emit("fri_all_layers_tiled_lanes_per_sec", n_fri * inner / dt,
             "lanes/s", block=fri_blk)

        # --- consistency gates: every hash timing must fit the
        # two-parameter model t_step = fixed + n_compr*c*(block/8) -------
        def model_gate(name, measured_step_s, n_compr, blk):
            pred = fixed_s + n_compr * c_s * (blk / 8)
            r = measured_step_s / pred
            emit(f"gate_model_{name}", r, "x(measured/predicted)",
                 consistent=bool(0.4 <= r <= 2.5),
                 predicted_us=round(pred * 1e6, 2),
                 measured_us=round(measured_step_s * 1e6, 2))

        emit("gate_fixed_overhead", fixed_s * 1e6, "us",
             consistent=bool(0.0 < fixed_s < 100e-6))
        if pair_rate is not None:
            t_pair_step = (2 * n * inner / pair_rate) / (inner * (M // 8))
            model_gate("pair", t_pair_step, 2, 8)
        model_gate("leafwalk_b8", t_lw8_step, lw_compr, 8)
        model_gate("leafwalk_b16", t_lw16_step, lw_compr, 16)
        model_gate(f"fri_fused_b{fri_blk}", t_fri_step, fri_compr, fri_blk)

    if "field" in sections:
        # --- field multiplies (chained: x <- x * b) ---------------------
        b = jnp.asarray(rng.integers(1, F.P, (n * 8,), dtype=np.uint32))
        a0 = jnp.asarray(rng.integers(0, F.P, (n * 8,), dtype=np.uint32))

        @jax.jit
        def m31_chain(x):
            return jax.lax.fori_loop(
                0, inner, lambda i, c: F.m31_mul(c, b), x)

        dt = timed(m31_chain, a0)
        emit("m31_mul_per_sec", b.size * inner / dt, "mul/s", lanes=b.size,
             chained_steps=inner)

        qb = jnp.asarray(rng.integers(1, F.P, (n, 4), dtype=np.uint32))
        qa0 = jnp.asarray(rng.integers(0, F.P, (n, 4), dtype=np.uint32))

        @jax.jit
        def qm31_chain(x):
            return jax.lax.fori_loop(
                0, inner, lambda i, c: F.qm31_mul(c, qb), x)

        dt = timed(qm31_chain, qa0)
        emit("qm31_mul_per_sec", n * inner / dt, "mul/s", lanes=n,
             chained_steps=inner)

    if "fft" in sections:
        # --- circle FFT eval, log 10-20 (evals feed back as coeffs) -----
        fft_inner = max(2, inner // 10)
        fft_times = {}
        for log in range(10, 21):
            c0 = jnp.asarray(
                rng.integers(0, F.P, (1 << log,), dtype=np.uint32))

            @jax.jit
            def fft_chain(c, log=log):
                return jax.lax.fori_loop(
                    0, fft_inner, lambda i, x: cfft_eval(x, log), c
                )

            dt = timed(fft_chain, c0) / fft_inner
            fft_times[log] = dt
            emit("circle_fft_eval_per_sec", 1.0 / dt, "ffts/s",
                 log_size=log, points=1 << log, chained_steps=fft_inner)

        # consistency gate: a 1024x work range must not time flat
        growth = fft_times[20] / fft_times[10]
        emit("gate_fft_time_growth_20_vs_10", growth, "x",
             consistent=bool(growth > 4.0))

    with open(os.environ.get("MICRO_OUT", "MICRO.json"), "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
