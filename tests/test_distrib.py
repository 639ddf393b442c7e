"""Multi-stream data-parallel tests on the 8-virtual-device CPU mesh
(SURVEY section 4 (e)): sharded multi-stream encode must equal per-stream
sequential encode exactly, and aggregate psum stats must match."""

import numpy as np

import jax
import jax.numpy as jnp

from helpers import random_frame_symbols  # noqa: F401  (env side effects)
from p64tpu.control.ratecontrol import RateConfig
from p64tpu.core import encoder as enc
from p64tpu.distrib import mesh as dm
from p64tpu.spec.constants import QCIF

RNG = np.random.default_rng(9)


def _frames(n_streams, t, fmt=QCIF):
    h, w = fmt.height, fmt.width
    y = RNG.integers(0, 256, (n_streams, t, h, w), dtype=np.uint8)
    # smooth it a bit so inter coding has something to find
    y = (y // 4 + 96).astype(np.uint8)
    cb = RNG.integers(60, 200, (n_streams, t, h // 2, w // 2), dtype=np.uint8)
    cr = RNG.integers(60, 200, (n_streams, t, h // 2, w // 2), dtype=np.uint8)
    return dict(y=jnp.asarray(y), cb=jnp.asarray(cb), cr=jnp.asarray(cr))


def test_sharded_encode_matches_sequential():
    assert jax.device_count() == 8
    cfg = enc.EncoderConfig(fmt=QCIF, search=3,
                            rate=RateConfig(fixed_quant=10))
    n_streams, t = 8, 2
    frames = _frames(n_streams, t)

    m = dm.make_mesh()
    states = dm.init_states(cfg, n_streams)
    run = dm.make_sharded_encoder(cfg, m)
    sh_frames = dm.shard_batch(m, frames)
    sh_states = dm.shard_batch(m, states)
    _, out_sh, agg = run(sh_states, sh_frames)

    # sequential per-stream reference
    for s in range(n_streams):
        fr = {k: v[s] for k, v in frames.items()}
        _, out_one = enc.encode_sequence_jit(cfg, fr, enc.init_state(cfg))
        for key in ("coded", "mtype", "mv", "cbp", "levels", "gquant",
                    "total_bits", "frame_coded"):
            np.testing.assert_array_equal(
                np.asarray(out_sh[key])[s], np.asarray(out_one[key]),
                err_msg=f"stream {s} key {key}")

    assert int(agg["total_bits"]) == int(
        np.asarray(out_sh["total_bits"]).sum())
    assert int(agg["frames_coded"]) == n_streams * t


def test_sharded_bitstreams_decode():
    cfg = enc.EncoderConfig(fmt=QCIF, search=2,
                            rate=RateConfig(fixed_quant=14))
    n_streams, t = 4, 2
    frames = _frames(n_streams, t)
    m = dm.make_mesh(4)
    run = dm.make_sharded_encoder(cfg, m)
    _, out, _ = run(dm.shard_batch(m, dm.init_states(cfg, n_streams)),
                    dm.shard_batch(m, frames))
    streams = dm.serialize_streams(cfg, out)
    assert len(streams) == n_streams
    from p64tpu.core.decoder import decode_stream
    for s, (data, nbits) in enumerate(streams):
        assert nbits == int(np.asarray(out["total_bits"])[s].sum())
        y, cb, cr, parsed = decode_stream(data)
        np.testing.assert_array_equal(y, np.asarray(out["recon_y"])[s])
