"""Multi-stream data-parallel batch encoder (BASELINE.json configs 4/5).

Encodes N independent input files as one sharded device batch:

  python -m p64tpu.tools.batch_encode -o outdir -q 10 'seq/*.y4m'
  python -m p64tpu.tools.batch_encode -o outdir -r 256000 a.y4m b.y4m ...

All streams must share one format and frame count (shorter inputs are
truncated to the common minimum).  Streams are sharded over every visible
device (p64tpu.distrib.mesh); per-stream .p64 files are written to outdir.
Under `jax.distributed` each host runs this on its local shard
(p64tpu.distrib.multihost).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time
from typing import List

import numpy as np

from ..control.ratecontrol import RateConfig
from ..core import encoder as enc
from ..distrib import mesh as dm
from ..io import yuv


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="p64tpu.tools.batch_encode")
    ap.add_argument("inputs", nargs="+", help="input files or globs (.y4m)")
    ap.add_argument("-o", "--outdir", required=True)
    ap.add_argument("-q", "--quant", type=int, default=8)
    ap.add_argument("-r", "--rate", type=int, default=0)
    ap.add_argument("-f", "--frame-rate", type=int, default=30)
    ap.add_argument("-i", "--search", type=int, default=15)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)

    paths: List[str] = []
    for pat in args.inputs:
        hits = sorted(glob.glob(pat))
        paths.extend(hits if hits else [pat])
    if not paths:
        print("no inputs", file=sys.stderr)
        return 1

    loaded = [yuv.load_input(p) for p in paths]
    fmt = loaded[0][1]
    if any(f is not fmt for _, f in loaded):
        print("all inputs must share one picture format", file=sys.stderr)
        return 1
    tmin = min(fr["y"].shape[0] for fr, _ in loaded)
    batch = {
        k: np.stack([fr[k][:tmin] for fr, _ in loaded])
        for k in ("y", "cb", "cr")
    }

    import jax
    import jax.numpy as jnp

    cfg = enc.EncoderConfig(
        fmt=fmt, search=max(args.search, 0), intra_only=args.search <= 0,
        rate=RateConfig(bit_rate=args.rate, frame_rate=args.frame_rate,
                        fixed_quant=args.quant))
    n = len(paths)
    n_dev = min(jax.device_count(), n)
    # mesh size must divide the batch; pad the batch up if needed
    pad = (-n) % n_dev
    if pad:
        batch = {k: np.concatenate([v, np.repeat(v[-1:], pad, 0)])
                 for k, v in batch.items()}
    mesh = dm.make_mesh(n_dev)
    run = dm.make_sharded_encoder(cfg, mesh)
    frames = dm.shard_batch(mesh, {k: jnp.asarray(v)
                                   for k, v in batch.items()})
    states = dm.shard_batch(mesh, dm.init_states(cfg, n + pad))
    t0 = time.time()
    _, outputs, agg = run(states, frames)
    total_bits = int(agg["total_bits"])
    dt = time.time() - t0
    os.makedirs(args.outdir, exist_ok=True)
    streams = dm.serialize_streams(cfg, outputs)
    for path, (data, nbits) in zip(paths, streams):
        out = os.path.join(
            args.outdir,
            os.path.splitext(os.path.basename(path))[0] + ".p64")
        with open(out, "wb") as f:
            f.write(data)
        if args.verbose:
            print(f"{out}: {nbits} bits")
    mbs = n * tmin * fmt.num_mbs
    print(f"{n} streams x {tmin} frames ({fmt.name}), {total_bits} total "
          f"bits, device time {dt:.2f}s ({mbs / dt:.0f} MB/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
