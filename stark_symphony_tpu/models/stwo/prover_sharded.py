"""Domain-sharded stwo prover: the SP/CP building blocks composed into a
real proof (SURVEY.md §2.4 "fold-stage parallelism"; VERDICT r03 task 7).

The single-device prover (prover._prove_jit) holds every FRI layer in one
chip's memory.  Here the FRI phase — the part whose footprint scales with
the LDE domain — runs with each layer's evaluation array sharded over a
mesh axis:

* layer commitment via parallel.fri_shard.stwo_commit_sharded (bottom-up
  natural-order tree: one ppermute + rebalance per level, top levels
  replicated after an all_gather);
* the fold via parallel.fri_shard.sharded_fold, one stage per FRI layer
  with the Fiat-Shamir alpha drawn (replicated, host-side channel step)
  from the freshly mixed root — the transcript interleaving the layer
  loop requires, which the block-level tests of tests/test_parallel.py
  could not exercise;
* decommitment gathering on host (numpy) from the sharded level arrays —
  proof assembly is ingestion-side work, like the reference's witness
  generation.

Layers too small to shard (size < 2 * n_devices) fold replicated — by
then the domain has shrunk by 2^k and memory is no longer the concern.

The emitted StwoProof is verified by the STANDARD verifier
(tests/test_sharded_prover.py does so at lde_log 18 on the 8-device CPU
mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import field as F
from ...ops import merkle
from ...ops.sha256 import sha256_words
from ...ops.u32 import bit_reverse
from ...parallel.fri_shard import (
    _stwo_circle_fold,
    _stwo_line_fold,
    _stwo_pi_step,
    natural_levels_to_tree,
    sharded_fold,
    stwo_commit_sharded,
    stwo_domain_points,
)
from . import channel as ch
from .config import StwoConfig
from .proof import StwoProof
from .prover import EMPTY_ROOT_WORDS, _pre_fri, generate_trace, pow_grind


def _br_perm(log: int) -> np.ndarray:
    idx = np.arange(1 << log, dtype=np.uint32)
    return np.asarray(bit_reverse(jnp.asarray(idx), log)).astype(np.int64)


def _commit_replicated(vals, log: int):
    """Small-layer fallback: single-device commit, tree-order levels."""
    leaves_br = vals[_br_perm(log)]
    levels = merkle.build_tree(sha256_words(leaves_br))
    return levels[-1][0], [np.asarray(l) for l in levels]


def prove_sharded(cfg: StwoConfig, mesh, axis_name: str = "sp",
                  trace: np.ndarray | None = None,
                  air: str = "wide_fibonacci"):
    """Generate one stwo proof with the FRI phase domain-sharded over
    `mesh` axis `axis_name`.  Returns (StwoProof numpy pytree, info)."""
    if trace is None:
        trace = generate_trace(cfg, air=air)
    lde_log = cfg.lde_log_size
    n_dev = mesh.shape[axis_name]

    pre = jax.jit(_pre_fri, static_argnums=(0, 2))(
        cfg, jnp.asarray(trace, jnp.uint32), air
    )
    state = ch.ChannelState(pre.state_digest, pre.state_counter)

    # FRI phase: sharded commit + fold per layer, transcript interleaved
    points = jnp.asarray(np.array(stwo_domain_points(lde_log)))
    cur = pre.first_layer  # (L, 4) natural order
    pts = points           # (L, 2) fold coordinates (x, y)
    log = lde_log
    fri_roots, fri_alphas = [], []
    fri_layer_vals, fri_layer_levels = [], []
    n_sharded = 0
    for layer in range(1 + cfg.n_inner_layers):
        n = 1 << log
        sharded = n >= 2 * n_dev and (n // n_dev) % 2 == 0
        if sharded:
            n_sharded += 1
            root, levels_nat = stwo_commit_sharded(
                cur, mesh, axis_name, return_levels=True
            )
            levels = natural_levels_to_tree(levels_nat, log)
        else:
            root, levels = _commit_replicated(np.asarray(cur), log)
        fri_roots.append(np.asarray(root))
        fri_layer_vals.append(np.asarray(cur))
        fri_layer_levels.append(levels)
        state = ch.mix_root(state, jnp.asarray(root))
        state, alpha, _ = ch.draw_qm31(state)
        fri_alphas.append(alpha)
        fold_fn = _stwo_circle_fold if layer == 0 else _stwo_line_fold
        step_fn = (lambda p: p) if layer == 0 else _stwo_pi_step
        if sharded:
            cur, pts = sharded_fold(
                cur, pts, [alpha], mesh, fold_fn=fold_fn,
                coord_step=step_fn, n_stages=1, axis_name=axis_name,
            )
        else:
            half = n // 2
            a, b = cur[:half], cur[half:]
            coord = pts[:half, 1] if layer == 0 else pts[:half, 0]
            f0 = F.qm31_add(a, b)
            f1 = F.qm31_mul_m31(F.qm31_sub(a, b), F.m31_inv(coord))
            cur = F.qm31_add(
                f0, F.qm31_mul(jnp.broadcast_to(alpha, f1.shape), f1)
            )
            pts = step_fn(pts)[:half]
        log -= 1
    fri_last = np.asarray(cur)[0]
    state = ch.mix_words(state, jnp.asarray(fri_last))

    # PoW + queries (replicated — per-proof transcript work)
    nonce = jax.jit(pow_grind, static_argnums=(0,))(cfg, state)
    state = ch.mix_u64(state, nonce[0], nonce[1])
    state, queries = ch.draw_queries(state, cfg.n_queries, lde_log)
    queries = np.asarray(queries)

    # decommitment assembly on host (numpy gathers from the level arrays)
    def gather(levels, idx):
        return np.stack([
            np.asarray(merkle.gather_path(
                [jnp.asarray(l) for l in levels], jnp.uint32(i)))
            for i in idx
        ])

    nat_pos = np.asarray(bit_reverse(jnp.asarray(queries), lde_log))
    trace_lde = np.asarray(pre.trace_lde)
    cp_col_vals = np.asarray(pre.cp_col_vals)
    trace_evals = trace_lde[:, nat_pos].T.astype(np.uint32)
    cp_evals = cp_col_vals[:, nat_pos].T.astype(np.uint32)
    trace_sibs = gather([np.asarray(l) for l in pre.trace_levels], queries)
    cp_sibs = gather([np.asarray(l) for l in pre.cp_levels], queries)

    fri_wits, fri_sibs = [], []
    cur_q = queries
    log = lde_log
    for layer in range(1 + cfg.n_inner_layers):
        sib_leaf = cur_q ^ 1
        nat_sib = np.asarray(bit_reverse(jnp.asarray(sib_leaf), log))
        fri_wits.append(fri_layer_vals[layer][nat_sib].astype(np.uint32))
        node_idx = (cur_q & np.uint32(0xFFFFFFFE)) >> 1
        fri_sibs.append(gather(fri_layer_levels[layer][1:], node_idx))
        cur_q = node_idx
        log -= 1

    proof = StwoProof(
        commitments=np.stack([
            EMPTY_ROOT_WORDS, np.asarray(pre.trace_root),
            np.asarray(pre.cp_root),
        ]).astype(np.uint32),
        trace_evals=trace_evals,
        trace_sibs=trace_sibs.astype(np.uint32),
        cp_evals=cp_evals,
        cp_sibs=cp_sibs.astype(np.uint32),
        oods_trace=np.asarray(pre.oods_trace),
        oods_cp=np.asarray(pre.oods_cp),
        fri_first_commit=fri_roots[0].astype(np.uint32),
        fri_inner_commits=(
            np.stack(fri_roots[1:]).astype(np.uint32)
            if len(fri_roots) > 1 else np.zeros((0, 8), np.uint32)
        ),
        fri_last=fri_last.astype(np.uint32),
        fri_witnesses=tuple(fri_wits),
        fri_sibs=tuple(s.astype(np.uint32) for s in fri_sibs),
        pow_nonce=np.asarray(nonce, np.uint32),
    )
    return proof, {"n_sharded_layers": n_sharded}
