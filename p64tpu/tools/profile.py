"""Profiling harness (SURVEY section 5 "tracing/profiling").

Wraps `jax.profiler.trace` around a representative encode workload and
reports per-stage wall times plus macroblocks/sec; the XLA trace (viewable
in XProf/TensorBoard) lands in --trace-dir.

  python -m p64tpu.tools.profile --streams 8 --frames 4 --trace-dir /tmp/tr
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="p64tpu.tools.profile")
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--format", default="CIF")
    ap.add_argument("--quant", type=int, default=10)
    ap.add_argument("--trace-dir", default="")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..control.ratecontrol import RateConfig
    from ..core import encoder as enc
    from ..io.yuv import parse_format

    fmt = parse_format(args.format)
    S, T = args.streams, args.frames
    rng = np.random.default_rng(0)
    ys = rng.integers(0, 256, (S, T, fmt.height, fmt.width), dtype=np.uint8)
    frames = dict(
        y=jnp.asarray(ys),
        cb=jnp.asarray(ys[:, :, ::2, ::2] // 2 + np.uint8(1)),
        cr=jnp.asarray(ys[:, :, 1::2, ::2] // 2 + np.uint8(1)))
    cfg = enc.EncoderConfig(fmt=fmt, rate=RateConfig(fixed_quant=args.quant))
    states = jax.tree.map(lambda x: jnp.broadcast_to(x, (S,) + x.shape),
                          enc.init_state(cfg))

    @jax.jit
    def run(states, fr):
        st, out = jax.vmap(lambda a, b: enc.encode_sequence(cfg, b, a))(
            states, fr)
        return out["total_bits"].sum()

    t0 = time.time()
    bits = int(run(states, frames))
    print(f"compile+first: {time.time() - t0:.1f}s ({bits} bits)")

    def timed():
        t0 = time.time()
        v = int(run(states, frames))
        del v
        return time.time() - t0

    best = min(timed() for _ in range(3))
    n_mb = S * T * fmt.num_mbs
    print(f"steady state: {best * 1e3:.1f} ms for {n_mb} MBs "
          f"({n_mb / best:.0f} MB/s)")

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            int(run(states, frames))
        print(f"trace written to {args.trace_dir} (view with XProf)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
