"""Where does the headline config's cold compile go? (round-3 verdict
item 8: 370 s cold for cif/64-stream/32-frame/search-15 was tracked but
never explained.)

Times trace+lower (host-side JAX) and backend compile (XLA; on the axon
tunnel this includes the remote server round trip) SEPARATELY for a set of
program variants that each remove one suspected cost driver:

  base16    16 streams, 32 frames, search 15   (round-2-comparable shape)
  s1        1 stream                (vmap width)
  f2        2 frames                (frame-scan length)
  search7   search 7                (15 vs 31 dx slices in the ME stack)
  xla_me    search 15, XLA sad_map_shifted instead of the Pallas kernel
  intra     no ME/MC at all
  base64    64 streams              (headline; run LAST, it is the slow one)

The persistent compile cache is intentionally NOT enabled -- every variant
is a genuine cold compile within this process.  Run in the TPU session:

    python tools/compile_probe.py            # all variants
    python tools/compile_probe.py base16 s1  # a subset
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


VARIANTS = ("base16", "s1", "f2", "search7", "xla_me", "intra", "base64")


def probe(name: str) -> dict:
    import jax
    import jax.numpy as jnp

    from p64tpu.control.ratecontrol import RateConfig
    from p64tpu.core import encoder as enc
    from p64tpu.kernels import me
    from p64tpu.spec.constants import CIF

    streams, frames_t, search = 16, 32, 15
    intra_only = False
    patch_xla_me = False
    if name == "s1":
        streams = 1
    elif name == "f2":
        frames_t = 2
    elif name == "search7":
        search = 7
    elif name == "xla_me":
        patch_xla_me = True
    elif name == "intra":
        intra_only = True
    elif name == "base64":
        streams = 64

    cfg = enc.EncoderConfig(fmt=CIF, search=search, intra_only=intra_only,
                            rate=RateConfig(fixed_quant=10))
    h, w = CIF.height, CIF.width
    frames = dict(
        y=jnp.zeros((streams, frames_t, h, w), jnp.uint8),
        cb=jnp.zeros((streams, frames_t, h // 2, w // 2), jnp.uint8),
        cr=jnp.zeros((streams, frames_t, h // 2, w // 2), jnp.uint8),
    )
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (streams,) + x.shape),
        enc.init_state(cfg))

    saved = enc.full_search
    if patch_xla_me:
        # force the XLA formulation on TPU (same output contract)
        enc.full_search = lambda c, r, s: _xla_full_search(me, c, r, s)
    try:
        def run(states, frames):
            _, out = jax.vmap(
                lambda s, f: enc.encode_sequence(cfg, f, s))(states, frames)
            return out["total_bits"].sum()

        t0 = time.time()
        lowered = jax.jit(run).lower(states, frames)
        t_lower = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
    finally:
        enc.full_search = saved
    # cost stats where available (backend-dependent)
    flops = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = ca.get("flops") if ca else None
    except Exception:
        pass
    return dict(name=name, lower_s=t_lower, compile_s=t_compile,
                flops=flops)


def _xla_full_search(me, cur, ref, search):
    import jax.numpy as jnp
    sads = me.sad_map_shifted(cur, ref, search)
    offs = jnp.asarray(me.offset_table(search))
    best = jnp.argmin(sads, axis=0)
    best_sad = jnp.take_along_axis(sads, best[None, :], axis=0)[0]
    sad0 = sads[me.zero_offset_index(search)]
    dydx = offs[best]
    return jnp.stack([dydx[:, 1], dydx[:, 0]], -1), best_sad, sad0


def main() -> int:
    import jax
    names = sys.argv[1:] or list(VARIANTS)
    log(f"compile probe: backend={jax.default_backend()}, no persistent "
        f"cache, variants={names}")
    rows = []
    for n in names:
        log(f"--- {n} ---")
        r = probe(n)
        rows.append(r)
        log(f"{n}: lower {r['lower_s']:.1f}s, compile {r['compile_s']:.1f}s"
            + (f", flops {r['flops']:.3g}" if r["flops"] else ""))
    print("| variant | trace+lower s | backend compile s |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['name']} | {r['lower_s']:.1f} | {r['compile_s']:.1f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
