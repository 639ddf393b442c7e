"""Small shared host-side helpers."""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Sequence, TypeVar

_T = TypeVar("_T")
_R = TypeVar("_R")


def fan_map(fn: Callable[[_T], _R], items: Sequence[_T]) -> List[_R]:
    """Map fn over items across a thread pool, order preserved.

    For per-stream host work whose heavy lifting happens in the ctypes C++
    engine (GIL released for the duration of the call): encode finalize
    (distrib.mesh.serialize_streams) and decode parse (core.decoder
    .parse_many).  Tiny batches stay serial -- pool setup would dominate.
    """
    if len(items) <= 2:
        return [fn(x) for x in items]
    workers = min(len(items), (os.cpu_count() or 2))
    with ThreadPoolExecutor(max_workers=workers) as pool:
        return list(pool.map(fn, items))


def expand_inputs(patterns):
    """Glob-expand CLI input patterns (shared by batch_encode /
    batch_decode -- round-4 dedup); non-matching patterns pass through
    as literal paths so downstream loaders report them."""
    import glob as _glob
    paths = []
    for pat in patterns:
        hits = sorted(_glob.glob(pat))
        paths.extend(hits if hits else [pat])
    return paths
