"""Multi-stream data-parallel tests on the 8-virtual-device CPU mesh
(SURVEY section 4 (e)): sharded multi-stream encode must equal per-stream
sequential encode exactly, and aggregate psum stats must match."""

import numpy as np
import pytest

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
        for key in ("coded", "mtype", "mv", "cbp", "levels8", "dc_intra", "gquant",
                    "total_bits", "frame_coded"):
            np.testing.assert_array_equal(
                np.asarray(out_sh[key])[s], np.asarray(out_one[key]),
                err_msg=f"stream {s} key {key}")

    assert dm.agg_total_bits(agg) == int(
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


def test_shard_retry_recovers_identical_output():
    """SURVEY section 5 failure recovery: a failed shard dispatch is retried
    (then bisected) and the recovered outputs are byte-identical to a fault-
    free run -- streams are independent, so re-dispatch is exact."""
    from p64tpu.tools.batch_encode import encode_resilient, encode_shard

    cfg = enc.EncoderConfig(fmt=QCIF, search=2,
                            rate=RateConfig(fixed_quant=12))
    n, t = 5, 2
    frames = _frames(n, t)
    batch = {k: np.asarray(v) for k, v in frames.items()}
    want = encode_shard(cfg, batch)

    # transient fault: the first attempt of every range fails
    calls = []

    def flaky(s, e, att):
        calls.append((s, e, att))
        if att == 0:
            raise RuntimeError("injected transient device fault")

    got = encode_resilient(cfg, batch, retries=2, fail_hook=flaky)
    assert got == want
    assert (0, n, 0) in calls and (0, n, 1) in calls

    # persistent fault on wide ranges: forces bisection down to width <= 2
    def wide_fails(s, e, att):
        if e - s > 2:
            raise RuntimeError("injected wide-dispatch fault")

    got = encode_resilient(cfg, batch, retries=1, fail_hook=wide_fails)
    assert got == want


def test_shard_retry_isolates_poison_stream():
    from p64tpu.tools.batch_encode import encode_resilient, encode_shard

    cfg = enc.EncoderConfig(fmt=QCIF, search=2,
                            rate=RateConfig(fixed_quant=12))
    n, t = 4, 1
    frames = _frames(n, t)
    batch = {k: np.asarray(v) for k, v in frames.items()}
    want = encode_shard(cfg, batch)

    poison = 2

    def poisoned(s, e, att):
        if s <= poison < e:
            raise RuntimeError("injected poison stream")

    got = encode_resilient(cfg, batch, retries=1, fail_hook=poisoned)
    assert got[poison] is None
    for i in range(n):
        if i != poison:
            assert got[i] == want[i], i


def test_pipelined_chunks_identical_and_resilient():
    """chunk > 0 pipelines device dispatch with host serialize; output must
    be byte-identical to the single-dispatch path, including under fault
    injection + bisection within a chunk."""
    from p64tpu.tools.batch_encode import encode_resilient, encode_shard

    cfg = enc.EncoderConfig(fmt=QCIF, search=2,
                            rate=RateConfig(fixed_quant=12))
    n, t = 7, 2
    frames = _frames(n, t)
    batch = {k: np.asarray(v) for k, v in frames.items()}
    want = encode_shard(cfg, batch)

    got = encode_resilient(cfg, batch, chunk=3)
    assert got == want

    # transient fault on one mid chunk; recovery must be exact
    def flaky(s, e, att):
        if s == 3 and att == 0:
            raise RuntimeError("injected chunk fault")

    got = encode_resilient(cfg, batch, chunk=3, retries=2, fail_hook=flaky)
    assert got == want

    # poison stream inside a chunk: only that slot is lost
    def poisoned(s, e, att):
        if s <= 4 < e:
            raise RuntimeError("injected poison stream")

    got = encode_resilient(cfg, batch, chunk=3, retries=0,
                           fail_hook=poisoned)
    assert got[4] is None
    assert [g for i, g in enumerate(got) if i != 4] == \
        [w for i, w in enumerate(want) if i != 4]


@pytest.mark.slow
def test_sharded_production_shape():
    """Production-shape mesh smoke (VERDICT round-1 item 9): full +/-15
    search AND buffer-feedback rate control, sharded over the 8-device mesh,
    must equal the sequential per-stream encode exactly."""
    cfg = enc.EncoderConfig(
        fmt=QCIF, search=15,
        rate=RateConfig(bit_rate=192_000, frame_rate=30))
    n_streams, t = 8, 2
    frames = _frames(n_streams, t)
    m = dm.make_mesh()
    run = dm.make_sharded_encoder(cfg, m)
    _, out_sh, agg = run(dm.shard_batch(m, dm.init_states(cfg, n_streams)),
                         dm.shard_batch(m, frames))
    for s in range(n_streams):
        fr = {k: v[s] for k, v in frames.items()}
        _, out_one = enc.encode_sequence_jit(cfg, fr, enc.init_state(cfg))
        for key in ("coded", "mtype", "mv", "levels8", "dc_intra", "gquant",
                    "total_bits"):
            np.testing.assert_array_equal(
                np.asarray(out_sh[key])[s], np.asarray(out_one[key]),
                err_msg=f"stream {s} key {key}")
    streams = dm.serialize_streams(cfg, out_sh)
    from p64tpu.core.decoder import decode_stream
    y, cb, cr, parsed = decode_stream(streams[0][0])
    # rate control may legitimately skip frames; only coded ones are in the
    # stream, in order
    coded = np.asarray(out_sh["frame_coded"])[0].astype(bool)
    np.testing.assert_array_equal(
        y, np.asarray(out_sh["recon_y"])[0][coded])
