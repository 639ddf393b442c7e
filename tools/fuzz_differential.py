"""Differential fuzz: the Python oracle and the C++ engine must agree on
ARBITRARY corrupted input -- exactly (fields + damage flags) in resync
mode, and on accept/reject in strict mode.

This is the long-running campaign behind tests/test_resync.py's quicker
seeded checks; round 5 it found a real engine divergence within 39
iterations (stale DC sidecar on resync re-parses of the same block --
see native/bitio.cpp parse_block) and then ran 11,055 corrupted streams
clean after the fix.

    python tools/fuzz_differential.py [seconds]     # default 300

Corruption modes per iteration (seeded, deterministic for a given run
length): random bit flips, truncation+flip, random splices of two
streams at byte offsets (duplicate-GN re-parses come from here), and
random byte-run overwrites; base content covers QCIF/CIF, MQUANT
segments, and sparse CIF frames.  Exits nonzero on the first
disagreement, leaving the failing stream in /tmp/fuzz_fail.bin.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

import numpy as np  # noqa: E402


def main() -> int:
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 300.0
    import jax
    jax.config.update("jax_platforms", "cpu")
    from helpers import random_frame_symbols
    from p64tpu.entropy import encode, parse
    from p64tpu.native import load
    from p64tpu.spec.constants import CIF, QCIF

    native = load()
    if native is None:
        print("native engine unavailable; nothing to differentiate",
              file=sys.stderr)
        return 2
    fields = ("gquant", "coded", "intra", "mc", "fil", "quant", "mv",
              "cbp", "levels", "gob_damaged")

    def diff_resync(d):
        fp = parse.parse_stream(d, strict=False)
        fn = native.parse(d, resync=True)
        if len(fp) != len(fn):
            return ("frame count", len(fp), len(fn))
        for i, (a, b) in enumerate(zip(fp, fn)):
            if a.fmt is not b.fmt or a.tr != b.tr:
                return ("header", i)
            if bool(a.damaged) != bool(b.damaged):
                return ("damaged flag", i)
            for f in fields:
                if not np.array_equal(getattr(a, f), getattr(b, f)):
                    return ("field", i, f)
        return None

    def outcome(fn, d):
        try:
            return ("ok", len(fn(d)))
        except parse.StreamError:
            return ("err",)

    streams = []
    for fmt, seed in ((QCIF, 1), (QCIF, 2), (CIF, 3)):
        rng = np.random.default_rng(seed)
        fr = [random_frame_symbols(
            fmt, rng, tr=t, p_mquant=0.25 if seed == 2 else 0.0,
            p_coded=0.25 if fmt is CIF else 0.7) for t in range(3)]
        streams.append(encode.serialize_sequence(fmt, fr)[0])

    rng = np.random.default_rng(int(os.environ.get("FUZZ_SEED", "999")))
    t0 = time.time()
    n = 0
    while time.time() - t0 < budget:
        base = streams[int(rng.integers(len(streams)))]
        d = bytearray(base)
        mode = int(rng.integers(4))
        if mode == 0:
            for _ in range(1 + int(rng.integers(6))):
                p = int(rng.integers(len(d)))
                d[p] ^= 1 << int(rng.integers(8))
        elif mode == 1:
            d = bytearray(d[:int(rng.integers(1, len(d)))])
            if len(d) > 2:
                p = int(rng.integers(len(d)))
                d[p] ^= 1 << int(rng.integers(8))
        elif mode == 2:
            other = streams[int(rng.integers(len(streams)))]
            d = bytearray(bytes(d[:int(rng.integers(len(d)))])
                          + other[int(rng.integers(len(other))):])
        else:
            p = int(rng.integers(len(d)))
            ln = int(rng.integers(1, 64))
            d[p:p + ln] = bytes(rng.integers(0, 256, min(ln, len(d) - p),
                                             dtype=np.uint8))
        d = bytes(d)
        r = diff_resync(d)
        if r is None:
            a = outcome(lambda x: parse.parse_stream(x), d)
            b = outcome(native.parse, d)
            if a != b:
                r = ("strict accept/reject", a, b)
        if r is not None:
            with open("/tmp/fuzz_fail.bin", "wb") as f:
                f.write(d)
            print(f"DISAGREEMENT after {n} streams: {r} "
                  f"(input saved to /tmp/fuzz_fail.bin, mode {mode})")
            return 1
        n += 1
    print(f"differential fuzz: {n} corrupted streams, 0 disagreements, "
          f"{time.time() - t0:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
