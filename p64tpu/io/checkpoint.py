"""Per-stream checkpoint / resume.

Reference reality: none -- a crashed encode restarts from frame 0 (SURVEY
section 5).  The codec-domain analogue the TPU build implements: encoder
state is tiny (reconstructed reference planes + refresh counters + buffer +
frame index), so any frame boundary is a resume point.  A checkpoint is a
host-side .npz of the per-stream state plus the bytes of each per-stream
bitstream emitted so far; `resume` reloads the state and the encoder simply
continues -- the concatenated bitstream is identical to an uninterrupted
run (tested in tests/test_checkpoint.py)."""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp


def save(path: str, state, streams: Optional[List[bytes]] = None,
         meta: Optional[Dict] = None) -> None:
    """Persist encoder state (single- or multi-stream pytree dict).

    Crash-safe: every file is written to a temp name and os.replace()d
    into place LAST (round-4 review finding: a preemption mid-save used
    to destroy the only checkpoint -- the exact event this module exists
    to survive), and a state-only save removes any stale .bits so load()
    can never pair new state with old stream bytes."""
    arrays = {k: np.asarray(v) for k, v in state.items()}
    np.savez_compressed(path + ".npz.tmp.npz", **arrays)
    blob = {
        "meta": meta or {},
        "n_streams": (int(arrays["frame_idx"].shape[0])
                      if arrays["frame_idx"].ndim else 0),
    }
    with open(path + ".json.tmp", "w") as f:
        json.dump(blob, f)
    if streams is not None:
        with open(path + ".bits.tmp", "wb") as f:
            lengths = np.asarray([len(s) for s in streams], np.int64)
            f.write(np.int64(len(streams)).tobytes())
            f.write(lengths.tobytes())
            for s in streams:
                f.write(s)
    # publish atomically, .npz last (load() keys off it)
    if streams is not None:
        os.replace(path + ".bits.tmp", path + ".bits")
    elif os.path.exists(path + ".bits"):
        os.remove(path + ".bits")
    os.replace(path + ".json.tmp", path + ".json")
    os.replace(path + ".npz.tmp.npz", path + ".npz")


def load(path: str) -> Tuple[Dict[str, jnp.ndarray], List[bytes], Dict]:
    """Returns (state, per-stream bytes so far, meta)."""
    with np.load(path + ".npz") as z:
        state = {k: jnp.asarray(z[k]) for k in z.files}
    with open(path + ".json") as f:
        blob = json.load(f)
    streams: List[bytes] = []
    if os.path.exists(path + ".bits"):
        with open(path + ".bits", "rb") as f:
            n = int(np.frombuffer(f.read(8), np.int64)[0])
            lengths = np.frombuffer(f.read(8 * n), np.int64)
            streams = [f.read(int(l)) for l in lengths]
    return state, streams, blob.get("meta", {})
