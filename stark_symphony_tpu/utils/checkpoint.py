"""Checkpoint / resume (SURVEY.md §5).

The reference has no in-program checkpointing; its channel state
(digest, counter) is "an explicit, serializable transcript cursor — the
natural checkpoint token" (/root/reference/stwo-verifier/src/channel.simf:18).
Two mechanisms here:

* channel-cursor (de)serialization — `channel_state_to_dict` /
  `channel_state_from_dict` snapshot the Fiat-Shamir transcript position
  of a staged verification.
* `BatchCheckpointer` — durable accept-bitmap progress for huge proof
  streams: each verified batch's bitmap appends to a JSONL journal, and a
  restarted run skips completed batches (the "failed proof must not kill
  the batch; standard restart" discipline of SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
import pathlib

import numpy as np

from ..models.stwo.channel import ChannelState


def channel_state_to_dict(state: ChannelState) -> dict:
    return {
        "digest": [int(w) for w in np.asarray(state.digest).reshape(-1)],
        "counter": int(np.asarray(state.counter).reshape(())),
        "shape": list(np.asarray(state.digest).shape[:-1]),
    }


def channel_state_from_dict(d: dict) -> ChannelState:
    shape = tuple(d.get("shape", ()))
    digest = np.asarray(d["digest"], np.uint32).reshape(shape + (8,))
    counter = np.full(shape, d["counter"], np.uint32)
    return ChannelState(digest, counter)


class BatchCheckpointer:
    """Append-only verification journal with resume.

    Usage:
        ckpt = BatchCheckpointer(path)
        for i, batch in enumerate(stream):
            if ckpt.done(i):
                continue
            bitmap = verify_batch(batch)
            ckpt.record(i, bitmap)
        total_ok = ckpt.accepted()
    """

    def __init__(self, path: str | os.PathLike):
        self._path = pathlib.Path(path)
        self._done: dict[int, int] = {}
        if self._path.exists():
            with open(self._path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    rec = json.loads(line)
                    self._done[rec["batch"]] = rec["n_ok"]

    def done(self, batch_index: int) -> bool:
        return batch_index in self._done

    def record(self, batch_index: int, bitmap) -> None:
        bits = np.asarray(bitmap).astype(bool)
        rec = {
            "batch": batch_index,
            "n_ok": int(bits.sum()),
            "n": int(bits.size),
            "bitmap_hex": np.packbits(bits).tobytes().hex(),
        }
        with open(self._path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        self._done[batch_index] = rec["n_ok"]

    def accepted(self) -> int:
        return sum(self._done.values())

    def batches(self) -> int:
        return len(self._done)
