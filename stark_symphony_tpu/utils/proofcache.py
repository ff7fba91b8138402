"""Disk cache for own-prover proofs, keyed by the prover sources' hash.

Proving is jit-compiled; its XLA compile costs minutes of (slow) CPU the
first time.  Benchmarks and driver entry points measure *verification*,
so the proof itself is cached under tests/.proof_cache and regenerated
automatically whenever any source the proof depends on changes.
"""

from __future__ import annotations

import hashlib
import pathlib

_PKG = pathlib.Path(__file__).parent.parent
_ROOT = _PKG.parent
_CACHE = _ROOT / "tests" / ".proof_cache"

_STWO_SOURCES = tuple(
    sorted(str(p) for p in (_PKG / "ops").glob("*.py"))
) + tuple(
    str(_PKG / "models" / "stwo" / f)
    for f in ("prover.py", "proof.py", "channel.py", "config.py",
              "constraints.py")
)


def stwo_source_hash() -> str:
    h = hashlib.sha256()
    for p in _STWO_SOURCES:
        h.update(pathlib.Path(p).read_bytes())
    return h.hexdigest()[:16]


def cached_stwo_proof(cfg, tag: str = "", air: str = "wide_fibonacci"):
    """One stwo proof from the in-tree prover for `cfg`, disk-cached."""
    import jax
    import numpy as np

    from ..models.stwo import proof as P
    from ..models.stwo import prover

    _CACHE.mkdir(parents=True, exist_ok=True)
    name = f"stwo_{tag or 'cfg'}_{air}_{cfg.lde_log_size}_" \
           f"{cfg.n_queries}_{stwo_source_hash()}.npz"
    path = _CACHE / name
    if path.exists():
        return P.load_npz(str(path))
    proof, _ = prover.prove(cfg, air=air)
    proof = jax.tree_util.tree_map(lambda x: np.asarray(x), proof)
    P.save_npz(str(path), proof)
    return proof
