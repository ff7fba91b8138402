"""stark101 proof container + ingestion from the reference formats.

Accepts either the reference prover's proof.json
(/root/reference/stark101/scripts/fibsquare/prover.py:94-171 `res` dict) or
the inline SimplicityHL literal of stark101/src/verifier.simf (extracted by
tests), and lays it out as dense uint32 arrays:

  p_mt_root:   (8,)
  evals:       (3,)        f(x), f(gx), f(ggx)
  eval_sibs:   (3, 13, 8)  Merkle siblings (leaf level first)
  fri_roots:   (L, 8)
  fri_betas:   (L,)
  cpa_evals:   (L,)
  cpa_sibs:    tuple of L arrays (13-i, 8)
  cpb_evals:   (L,)
  cpb_sibs:    tuple of L arrays (13-i, 8)
  last:        ()          the degree-0 free term
"""

from __future__ import annotations

import json
from typing import NamedTuple, Tuple

import numpy as np

from ...utils.packing import u256_to_words


class Stark101Proof(NamedTuple):
    p_mt_root: np.ndarray
    evals: np.ndarray
    eval_sibs: np.ndarray
    fri_roots: np.ndarray
    fri_betas: np.ndarray
    cpa_evals: np.ndarray
    cpa_sibs: Tuple[np.ndarray, ...]
    cpb_evals: np.ndarray
    cpb_sibs: Tuple[np.ndarray, ...]
    last: np.ndarray


def from_dict(res: dict) -> Stark101Proof:
    """Build from the prover `res` dict (proof.json schema)."""
    evals = res["evals"]
    fri_layers = res["fri_layers"]
    return Stark101Proof(
        p_mt_root=u256_to_words(int(res["p_mt_root"])),
        evals=np.array([int(e[0]) for e in evals], dtype=np.uint32),
        eval_sibs=np.stack(
            [np.stack([u256_to_words(int(s)) for s in e[1]]) for e in evals]
        ),
        fri_roots=np.stack([u256_to_words(int(l[0])) for l in fri_layers]),
        fri_betas=np.array([int(l[1]) for l in fri_layers], dtype=np.uint32),
        cpa_evals=np.array([int(l[2]) for l in fri_layers], dtype=np.uint32),
        cpa_sibs=tuple(
            np.stack([u256_to_words(int(s)) for s in l[3]]) for l in fri_layers
        ),
        cpb_evals=np.array([int(l[4]) for l in fri_layers], dtype=np.uint32),
        cpb_sibs=tuple(
            np.stack([u256_to_words(int(s)) for s in l[5]]) for l in fri_layers
        ),
        last=np.uint32(int(res["fri_last_layer"])),
    )


def load_json(path: str) -> Stark101Proof:
    with open(path) as f:
        return from_dict(json.load(f))


def replicate(proof: Stark101Proof, n: int) -> Stark101Proof:
    import jax

    return jax.tree_util.tree_map(
        lambda x: np.broadcast_to(x, (n,) + np.shape(x)).copy(), proof
    )
