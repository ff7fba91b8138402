"""Transcript tracing — the execution-tracker analogue (SURVEY.md §5).

The reference's `simfony debug` prints every jet call with decoded values
(/root/reference/simfony-cli/src/tracker.rs:43-63).  The TPU-framework
equivalent is a transcript dump: record every Fiat-Shamir channel
operation (mix/draw) with its resulting digest while running the verifier
eagerly, for bit-exactness triage against the native oracle
(`native/symphony verify-stwo -v` prints the same digests).

Usage:
    with record_transcript() as events:
        verifier.verify(proof, cfg)      # run OUTSIDE jit
    print(format_transcript(events))
"""

from __future__ import annotations

import contextlib
from typing import Any, List, Tuple

import jax
import numpy as np

_TRACE: List[Tuple[str, Any]] | None = None


def emit(op: str, value) -> None:
    """Record one channel event if tracing is active.  `value` must be a
    concrete (non-traced) array — callers run under `jax.disable_jit()`."""
    if _TRACE is not None:
        _TRACE.append((op, np.asarray(value)))


@contextlib.contextmanager
def record_transcript():
    """Context manager: collects (op, value) channel events; disables jit
    so values are concrete (tracing a jitted verify would record tracers)."""
    global _TRACE
    prev = _TRACE
    _TRACE = []
    try:
        with jax.disable_jit():
            yield _TRACE
    finally:
        _TRACE = prev


def _hex_words(words: np.ndarray) -> str:
    flat = np.atleast_1d(words).reshape(-1)
    return "".join(f"{int(w):08x}" for w in flat)


def format_transcript(events) -> str:
    lines = []
    for i, (op, value) in enumerate(events):
        lines.append(f"[{i:3d}] {op:<14s} {_hex_words(value)}")
    return "\n".join(lines)
