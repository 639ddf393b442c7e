"""Multi-stream batch decoder: the decode-side mirror of batch_encode.

  python -m p64tpu.tools.batch_decode -o outdir a.p64 b.p64 ...

Host VLC parse fans across threads straight into stacked symbol tensors
(core.decoder.parse_to_tensors); reconstruction batches every group of
equal-shaped streams into ONE vmapped jitted device scan (sequential
per-stream scans underfill the chip -- same batching as the encode side).
One .y4m per input is written to outdir.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import List

from ..core.decoder import decode_seq, decode_seq_batch, parse_to_tensors
from ..entropy.parse import StreamError
from ..io import yuv
from ..utils import fan_map


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="p64tpu.tools.batch_decode")
    ap.add_argument("inputs", nargs="+", help="input .p64 files or globs")
    ap.add_argument("-o", "--outdir", required=True)
    ap.add_argument("-f", "--frame-rate", type=int, default=30,
                    help="frame rate stamped into the .y4m headers")
    ap.add_argument("-e", "--resync", action="store_true",
                    help="start-code error recovery: conceal damaged "
                         "GOBs/pictures and continue (default: strict)")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)

    from ..utils import expand_inputs
    paths: List[str] = expand_inputs(args.inputs)
    if not paths:
        print("no inputs", file=sys.stderr)
        return 1

    datas = [open(p, "rb").read() for p in paths]
    t0 = time.time()
    try:
        parsed = fan_map(
            lambda d: parse_to_tensors(d, resync=args.resync), datas)
    except (StreamError, ValueError) as e:
        print(f"batch_decode: invalid H.261 stream: {e}", file=sys.stderr)
        return 1
    t_parse = time.time() - t0

    os.makedirs(args.outdir, exist_ok=True)
    t0 = time.time()
    n_frames = 0
    # group equal-shaped streams into ONE vmapped device dispatch each
    # (sequential per-stream scans underfill the chip; same batching as
    # the encode side)
    groups = {}
    for i, (fmt, tr, seq) in enumerate(parsed):
        groups.setdefault((fmt, seq["levels8"].shape[0]), []).append(i)
    planes = [None] * len(parsed)
    for (fmt, t), idxs in groups.items():
        if len(idxs) == 1:
            i = idxs[0]
            planes[i] = decode_seq(fmt, parsed[i][2])
        else:
            for i, p in zip(idxs, decode_seq_batch(
                    fmt, [parsed[i][2] for i in idxs])):
                planes[i] = p
    for path, (fmt, tr, seq), (y, cb, cr) in zip(paths, parsed, planes):
        n_frames += y.shape[0]
        out = os.path.join(
            args.outdir,
            os.path.splitext(os.path.basename(path))[0] + ".y4m")
        yuv.write_y4m(out, dict(y=y, cb=cb, cr=cr), (args.frame_rate, 1))
        if args.verbose:
            print(f"{out}: {y.shape[0]} frames {fmt.name}", file=sys.stderr)
    t_dev = time.time() - t0
    if args.verbose:
        print(f"{len(paths)} streams, {n_frames} frames: parse "
              f"{t_parse * 1e3:.0f} ms, decode+write {t_dev * 1e3:.0f} ms",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
