"""stark101 (FibonacciSq) prover — NTT-based, transcript-compatible.

Produces proofs the batched verifier (and the reference SimplicityHL
verifier) accepts, replaying the exact Fiat-Shamir transcript of the
reference Python prover (/root/reference/stark101/scripts/fibsquare/
prover.py:94-171):

  mix(trace root) -> draw a0,a1,a2 -> [draw beta_i; fold; mix root_{i+1}]*
  -> mix(last free term) -> draw query idx -> decommitments.

Algorithmic re-design (not a port):
* interpolation over the 1023-point subset of the 1024 subgroup is done with
  two INTTs via the "free value" trick (the unknown value at g^1023 is fixed
  by requiring coefficient 1023 to vanish) instead of O(n^2) Lagrange;
* constraint/composition evaluation happens pointwise on the 8192 coset
  (the quotients divide exactly, so value-space division is the same
  polynomial);
* FRI folding is value-space: u_i = (v_i + v_{i+n/2})/2 + beta (v_i -
  v_{i+n/2})/(2 x_i), identical to coefficient odd/even splitting;
* Merkle trees are built level-parallel with the vectorized SHA-256.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...ops import field101 as F
from ...ops import merkle
from ...ops.ntt import ntt, eval_on_coset
from ...ops.sha256 import sha256_words
from . import channel as ch
from .config import Stark101Config
from .proof import Stark101Proof


def generate_trace(cfg: Stark101Config) -> np.ndarray:
    t = [1, cfg.x1]
    while len(t) < cfg.trace_len:
        t.append((t[-2] * t[-2] + t[-1] * t[-1]) % F.Q)
    return np.array(t, dtype=np.uint32)


def interpolate_trace(cfg: Stark101Config, trace: np.ndarray):
    """Coefficients of the unique deg<=1022 polynomial with p(g^i)=trace[i]
    for i < 1023.

    INTT with the value at g^1023 set to 0 gives coefficient c_1023 = a;
    the true value u there must satisfy a + u * g^{-1023*1023}/n = 0.
    """
    n = cfg.domain_size
    g = cfg.subgroup_gen
    vals = jnp.concatenate(
        [jnp.asarray(trace, jnp.uint32), jnp.zeros((1,), jnp.uint32)], axis=-1
    )
    coeffs0 = ntt(vals, g, inverse=True)
    a = coeffs0[-1]
    # contribution factor of v_{n-1} to c_{n-1}: g^{-(n-1)^2} / n
    factor = (pow(pow(g, (n - 1) * (n - 1), F.Q), F.Q - 2, F.Q) *
              pow(n, F.Q - 2, F.Q)) % F.Q
    u = F.f_mul(F.f_neg(a), jnp.uint32(pow(factor, F.Q - 2, F.Q)))
    vals = vals.at[-1].set(u)
    coeffs = ntt(vals, g, inverse=True)
    return coeffs  # (..., 1024), coefficient 1023 is zero


def _tree(values):
    """Merkle tree over u32 leaf values; returns (levels, root_words)."""
    leaves = sha256_words(jnp.asarray(values, jnp.uint32)[..., None])
    levels = merkle.build_tree(leaves)
    return levels, levels[-1][..., 0, :]


def prove(cfg: Stark101Config = Stark101Config(), trace: np.ndarray | None = None):
    """Generate a proof.  Returns (Stark101Proof of numpy arrays, info dict).

    The compute pipeline is jit-compiled once per config; the trace is a
    runtime argument so batches of proofs reuse the executable.
    """
    if trace is None:
        trace = generate_trace(cfg)
    out, idx = _prove_jit(cfg, jnp.asarray(trace, jnp.uint32))
    proof = Stark101Proof(
        p_mt_root=np.asarray(out.p_mt_root),
        evals=np.asarray(out.evals),
        eval_sibs=np.asarray(out.eval_sibs),
        fri_roots=np.asarray(out.fri_roots),
        fri_betas=np.asarray(out.fri_betas),
        cpa_evals=np.asarray(out.cpa_evals),
        cpa_sibs=tuple(np.asarray(s) for s in out.cpa_sibs),
        cpb_evals=np.asarray(out.cpb_evals),
        cpb_sibs=tuple(np.asarray(s) for s in out.cpb_sibs),
        last=np.asarray(out.last),
    )
    return proof, {"idx": int(np.asarray(idx))}


import functools
import jax


@functools.partial(jax.jit, static_argnums=0)
def _prove_jit(cfg: Stark101Config, trace):
    n = cfg.domain_size
    n_ex = cfg.domain_ex_size
    h = cfg.coset_gen

    coeffs = interpolate_trace(cfg, trace)
    p_ev = eval_on_coset(coeffs, F.GEN, h, n_out=n_ex)  # values on 5 * <h>
    p_levels, p_root = _tree(p_ev)

    # Channel genesis: state = H(root).  The reference channel starts from
    # b'' so its first mix hashes just the root (channel.py:49, mix :55-57)
    # — NOT H(0^32 || root).
    state = sha256_words(p_root)

    state, a0 = ch.draw(state, F.Q)
    state, a1 = ch.draw(state, F.Q)
    state, a2 = ch.draw(state, F.Q)

    # Composition polynomial values on the coset (pointwise quotients).
    # The coset points and all constraint denominators are protocol
    # constants: precompute them (and their inverses) on host.
    xs_host = np.empty(n_ex, dtype=np.object_)
    cur = F.GEN % F.Q
    for i in range(n_ex):
        xs_host[i] = cur
        cur = (cur * h) % F.Q
    g1021, g1022, g1023 = cfg.g_pow(1021), cfg.g_pow(1022), cfg.g_pow(1023)
    inv0_host = np.array([pow(int(x - 1) % F.Q, F.Q - 2, F.Q) for x in xs_host], np.uint32)
    inv1_host = np.array([pow(int(x - g1022) % F.Q, F.Q - 2, F.Q) for x in xs_host], np.uint32)
    inv2_host = np.array(
        [pow((pow(int(x), n, F.Q) - 1) % F.Q, F.Q - 2, F.Q) for x in xs_host], np.uint32
    )
    xs = jnp.asarray(xs_host.astype(np.uint32))
    one = jnp.uint32(1)
    f_x = p_ev
    f_gx = jnp.roll(p_ev, -cfg.idx_offset, axis=-1)
    f_ggx = jnp.roll(p_ev, -2 * cfg.idx_offset, axis=-1)
    p0 = F.f_mul(F.f_sub(f_x, one), jnp.asarray(inv0_host))
    p1 = F.f_mul(F.f_sub(f_x, jnp.uint32(cfg.boundary1)), jnp.asarray(inv1_host))
    num0 = F.f_sub(f_ggx, F.f_add(F.f_mul(f_x, f_x), F.f_mul(f_gx, f_gx)))
    num1 = F.f_mul(
        F.f_mul(F.f_sub(xs, jnp.uint32(g1021)), F.f_sub(xs, jnp.uint32(g1022))),
        F.f_sub(xs, jnp.uint32(g1023)),
    )
    p2 = F.f_mul(F.f_mul(num0, num1), jnp.asarray(inv2_host))
    cp_ev = F.f_add(F.f_add(F.f_mul(p0, a0), F.f_mul(p1, a1)), F.f_mul(p2, a2))

    # FRI: fold down to a constant, committing each layer.
    fri_values = [cp_ev]
    fri_levels = []
    fri_roots = []
    fri_betas = []
    cur_vals = cp_ev
    lv, root = _tree(cur_vals)
    fri_levels.append(lv)
    fri_roots.append(root)
    state = ch.mix_words(state, root)

    inv2 = jnp.uint32(pow(2, F.Q - 2, F.Q))
    # Host-precomputed per-layer domain inverses: layer i domain is
    # {x^(2^i)} for the first half of the previous domain.
    xinv_layers = []
    cur_inv = [pow(int(x), F.Q - 2, F.Q) for x in xs_host]
    for layer in range(cfg.n_fri_layers):
        cur_inv = cur_inv[: len(cur_inv) // 2]
        xinv_layers.append(np.array(cur_inv, np.uint32))
        cur_inv = [(v * v) % F.Q for v in cur_inv]
    for layer in range(cfg.n_fri_layers):
        state, beta = ch.draw(state, F.Q)
        fri_betas.append(beta)
        half = cur_vals.shape[-1] // 2
        va = cur_vals[..., :half]
        vb = cur_vals[..., half:]
        even = F.f_mul(F.f_add(va, vb), inv2)
        odd = F.f_mul(
            F.f_mul(F.f_sub(va, vb), inv2), jnp.asarray(xinv_layers[layer])
        )
        cur_vals = F.f_add(even, F.f_mul(odd, beta))
        fri_values.append(cur_vals)
        if layer < cfg.n_fri_layers - 1:
            lv, root = _tree(cur_vals)
            fri_levels.append(lv)
            fri_roots.append(root)
            state = ch.mix_words(state, root)

    last = cur_vals[..., 0]
    state = ch.mix_u32(state, last)

    # Query + decommitments
    state, idx = ch.draw(state, n_ex)
    idx = jnp.asarray(idx, jnp.uint32)

    evals = []
    eval_sibs = []
    for k in range(3):
        pos = (idx + jnp.uint32(k * cfg.idx_offset)) & jnp.uint32(n_ex - 1)
        evals.append(jnp.take(p_ev, pos.astype(jnp.int32), axis=-1))
        eval_sibs.append(merkle.gather_path(p_levels, pos))

    cpa_evals, cpa_sibs, cpb_evals, cpb_sibs = [], [], [], []
    for i in range(cfg.n_fri_layers):
        length = n_ex >> i
        fri_idx = idx & jnp.uint32(length - 1)
        sib_idx = (idx + jnp.uint32(length // 2)) & jnp.uint32(length - 1)
        vals_i = fri_values[i]
        cpa_evals.append(jnp.take(vals_i, fri_idx.astype(jnp.int32), axis=-1))
        cpb_evals.append(jnp.take(vals_i, sib_idx.astype(jnp.int32), axis=-1))
        cpa_sibs.append(merkle.gather_path(fri_levels[i], fri_idx))
        cpb_sibs.append(merkle.gather_path(fri_levels[i], sib_idx))

    proof = Stark101Proof(
        p_mt_root=p_root,
        evals=jnp.stack(evals, axis=-1),
        eval_sibs=jnp.stack(eval_sibs, axis=-3),
        fri_roots=jnp.stack(fri_roots, axis=-2),
        fri_betas=jnp.stack(fri_betas, axis=-1),
        cpa_evals=jnp.stack(cpa_evals, axis=-1),
        cpa_sibs=tuple(cpa_sibs),
        cpb_evals=jnp.stack(cpb_evals, axis=-1),
        cpb_sibs=tuple(cpb_sibs),
        last=last,
    )
    return proof, idx


def to_json_dict(proof: Stark101Proof) -> dict:
    """Export in the reference proof.json schema (prover.py res dict)."""
    from ...utils.packing import words_to_u256

    return {
        "p_mt_root": words_to_u256(proof.p_mt_root),
        "evals": [
            [
                int(proof.evals[k]),
                [words_to_u256(s) for s in proof.eval_sibs[k]],
            ]
            for k in range(3)
        ],
        "fri_layers": [
            [
                words_to_u256(proof.fri_roots[i]),
                int(proof.fri_betas[i]),
                int(proof.cpa_evals[i]),
                [words_to_u256(s) for s in proof.cpa_sibs[i]],
                int(proof.cpb_evals[i]),
                [words_to_u256(s) for s in proof.cpb_sibs[i]],
            ]
            for i in range(len(proof.fri_betas))
        ],
        "fri_last_layer": int(proof.last),
    }
