"""Unit tests: mode decisions, rate control laws, intra refresh, frame skip."""

import numpy as np

import jax.numpy as jnp

from p64tpu.control import decisions, ratecontrol
from p64tpu.control.ratecontrol import RateConfig
from p64tpu.core import encoder as enc
from p64tpu.spec.constants import INTRA_REFRESH_PERIOD, QCIF

RNG = np.random.default_rng(33)


def test_activity_integer_definition():
    x = RNG.integers(0, 256, (5, 16, 16))
    got = np.asarray(decisions.activity(jnp.asarray(x, jnp.int32)))
    s1 = x.reshape(5, -1).sum(1)
    s2 = (x.astype(np.int64) ** 2).reshape(5, -1).sum(1)
    want = (s2 - (s1 * s1) // 256) // 256
    np.testing.assert_array_equal(got, want)


def test_decide_modes_basic():
    n = 4
    cur = jnp.asarray(RNG.integers(0, 256, (n, 16, 16)), jnp.int32)
    pred_same = cur  # perfect zero-MV prediction
    sad0 = jnp.zeros(n, jnp.int32)
    best = jnp.zeros(n, jnp.int32)
    mv = jnp.zeros((n, 2), jnp.int32)
    d = decisions.decide_modes(cur, pred_same, pred_same, sad0, best, mv,
                               jnp.zeros(n, jnp.int32), jnp.asarray(False))
    # perfect prediction: inter, no MC
    assert not np.asarray(d["intra"]).any()
    assert not np.asarray(d["use_mc"]).any()

    # forced intra via refresh counter
    d2 = decisions.decide_modes(
        cur, pred_same, pred_same, sad0, best, mv,
        jnp.full(n, INTRA_REFRESH_PERIOD - 1, jnp.int32),
        jnp.asarray(False))
    assert np.asarray(d2["intra"]).all()

    # totally different prediction -> intra wins
    d3 = decisions.decide_modes(
        cur, 255 - cur, 255 - cur,
        jnp.full(n, 100000, jnp.int32), jnp.full(n, 99999, jnp.int32),
        jnp.asarray(np.tile([[3, 2]], (n, 1)), jnp.int32),
        jnp.zeros(n, jnp.int32), jnp.asarray(False))
    assert np.asarray(d3["intra"]).all()
    # intra suppresses MC and the MV output
    assert not np.asarray(d3["use_mc"]).any()
    assert not np.asarray(d3["mv_out"]).any()


def test_mc_threshold():
    n = 1
    cur = jnp.asarray(RNG.integers(0, 256, (n, 16, 16)), jnp.int32)
    ref = jnp.asarray(RNG.integers(0, 256, (n, 16, 16)), jnp.int32)
    mv = jnp.asarray([[2, 1]], jnp.int32)
    # best_sad just below threshold: 107*best < 100*sad0
    sad0 = jnp.asarray([1070], jnp.int32)
    best_yes = jnp.asarray([999], jnp.int32)
    best_no = jnp.asarray([1000], jnp.int32)
    d_yes = decisions.decide_modes(cur, ref, ref, sad0, best_yes, mv,
                                   jnp.zeros(n, jnp.int32),
                                   jnp.asarray(False))
    d_no = decisions.decide_modes(cur, ref, ref, sad0, best_no, mv,
                                  jnp.zeros(n, jnp.int32),
                                  jnp.asarray(False))
    assert bool(np.asarray(d_yes["use_mc"])[0]) or bool(
        np.asarray(d_yes["intra"])[0])
    # at/over threshold never uses MC
    assert not bool(np.asarray(d_no["use_mc"])[0])


def test_rate_quant_law():
    cfg = RateConfig(bit_rate=320_000, frame_rate=30)
    tgt = cfg.target_bits_per_frame
    assert tgt == 320_000 // 30
    assert int(ratecontrol.gob_quant(cfg, jnp.int32(0))) == cfg.qoffs
    q_full = int(ratecontrol.gob_quant(cfg, jnp.int32(tgt)))
    assert 1 <= q_full <= 31
    assert int(ratecontrol.gob_quant(cfg, jnp.int32(10**9))) == 31
    # disabled -> fixed quant
    off = RateConfig(fixed_quant=13)
    assert int(ratecontrol.gob_quant(off, jnp.int32(12345))) == 13


def test_frame_skip_and_drain():
    cfg = RateConfig(bit_rate=30_000, frame_rate=30)  # 1000 bits/frame
    assert not bool(ratecontrol.should_skip(cfg, jnp.int32(3999)))
    assert bool(ratecontrol.should_skip(cfg, jnp.int32(4001)))
    assert int(ratecontrol.drain_skipped(cfg, jnp.int32(1500))) == 500
    assert int(ratecontrol.drain_skipped(cfg, jnp.int32(200))) == 0


def test_encoder_emits_skipped_frames_under_pressure():
    cfg = enc.EncoderConfig(fmt=QCIF, search=2,
                            rate=RateConfig(bit_rate=8_000, frame_rate=30))
    t = 6
    y = RNG.integers(0, 256, (t, QCIF.height, QCIF.width), dtype=np.uint8)
    frames = dict(y=jnp.asarray(y), cb=jnp.asarray(y[:, ::2, ::2]),
                  cr=jnp.asarray(y[:, 1::2, ::2]))
    _, out = enc.encode_sequence_jit(cfg, frames, enc.init_state(cfg))
    coded = np.asarray(out["frame_coded"])
    assert coded[0]
    assert not coded.all()  # noise at 8 kbit/s must force skips
    # skipped frames carry zero bits
    bits = np.asarray(out["total_bits"])
    np.testing.assert_array_equal(bits[~coded], 0)


def test_forced_intra_refresh_counter():
    import jax.numpy as jnp
    cfg = enc.EncoderConfig(fmt=QCIF, search=2,
                            rate=RateConfig(fixed_quant=20))
    y0 = RNG.integers(0, 200, (QCIF.height, QCIF.width)).astype(np.int32)
    y1 = np.clip(y0 + RNG.integers(-3, 4, y0.shape), 0, 255)
    y = np.stack([y0, y1]).astype(np.uint8)
    frames = dict(y=jnp.asarray(y), cb=jnp.asarray(y[:, ::2, ::2]),
                  cr=jnp.asarray(y[:, 1::2, ::2]))
    state = enc.init_state(cfg)
    # push every counter to the threshold: next coded frame must be intra
    state["refresh"] = jnp.full(QCIF.num_mbs, INTRA_REFRESH_PERIOD - 1,
                                jnp.int32)
    state["frame_idx"] = jnp.int32(5)  # not the forced-intra first frame
    _, out = enc.encode_sequence_jit(cfg, frames, state)
    mtype = np.asarray(out["mtype"])[0]
    coded = np.asarray(out["coded"])[0]
    from p64tpu.spec import luts
    assert luts.MTYPE_INTRA[mtype[coded]].all()
    # counters reset after the intra coding
    # (second frame should NOT be forced intra everywhere)
    mtype1 = np.asarray(out["mtype"])[1]
    coded1 = np.asarray(out["coded"])[1]
    assert not luts.MTYPE_INTRA[mtype1[coded1]].all()


def test_tr_wraps_mod_32():
    import jax.numpy as jnp
    cfg = enc.EncoderConfig(fmt=QCIF, search=0, intra_only=True,
                            rate=RateConfig(fixed_quant=25))
    y = np.broadcast_to(
        RNG.integers(0, 256, (1, QCIF.height, QCIF.width), np.uint8),
        (3, QCIF.height, QCIF.width))
    frames = dict(y=jnp.asarray(y), cb=jnp.asarray(y[:, ::2, ::2]),
                  cr=jnp.asarray(y[:, 1::2, ::2]))
    state = enc.init_state(cfg)
    state["frame_idx"] = jnp.int32(31)
    _, out = enc.encode_sequence_jit(cfg, frames, state)
    assert np.asarray(out["tr"]).tolist() == [31, 0, 1]


def test_min_rate_fill_emits_stuffing():
    """Low-bitrate floor: static content far cheaper than the budget must be
    padded with MBA stuffing (11-bit codes, H.261 Table 1) so the virtual
    buffer never goes negative; the stream must stay fully decodable and the
    device length model must match the serializer exactly (asserted inside
    encode_to_bytes)."""
    from p64tpu.core.decoder import decode_stream

    t = 4
    y = np.full((t, 144, 176), 128, np.uint8)   # static: near-zero bits
    frames = dict(y=jnp.asarray(y),
                  cb=jnp.asarray(np.full((t, 72, 88), 90, np.uint8)),
                  cr=jnp.asarray(np.full((t, 72, 88), 170, np.uint8)))
    # 512 kbit/s for a static QCIF scene: huge per-frame deficit
    cfg = enc.EncoderConfig(fmt=QCIF,
                            rate=RateConfig(bit_rate=512_000, frame_rate=30))
    data, outputs, state = enc.encode_to_bytes(cfg, frames)
    n_stuff = np.asarray(outputs["n_stuff"])
    assert (n_stuff > 0).any(), "expected stuffing on static content"
    # every coded frame ends with a non-negative buffer and the total size
    # meets the per-frame floor
    # buffer invariant: init_buffer + total_bits - t*target >= 0, i.e. the
    # stream meets the minimum rate net of the warm-start credit
    target = cfg.rate.target_bits_per_frame
    total_bits = int(np.asarray(outputs["total_bits"]).sum())
    assert total_bits >= target * t - cfg.rate.initial_buffer()
    # round-trip: decoder reproduces the encoder's reconstruction
    dy, _, _, parsed = decode_stream(data)
    assert len(parsed) == t
    np.testing.assert_array_equal(dy[-1], np.asarray(state["ref_y"]))


def test_min_rate_fill_off_by_config():
    t = 2
    y = np.full((t, 144, 176), 128, np.uint8)
    frames = dict(y=jnp.asarray(y),
                  cb=jnp.asarray(np.full((t, 72, 88), 90, np.uint8)),
                  cr=jnp.asarray(np.full((t, 72, 88), 170, np.uint8)))
    cfg = enc.EncoderConfig(
        fmt=QCIF, rate=RateConfig(bit_rate=512_000, frame_rate=30,
                                  min_rate_fill=False))
    _, outputs, _ = enc.encode_to_bytes(cfg, frames)
    assert (np.asarray(outputs["n_stuff"]) == 0).all()


def _graded_gob_content():
    """Shared fixture (p64tpu.tools.golden_content.graded_energy_qcif):
    also pinned as the `mquant2pass_graded_qcif` golden."""
    from p64tpu.tools.golden_content import graded_energy_qcif
    f = graded_energy_qcif()
    return f["y"][0], f["cb"][0]


def _host_mquant_models(coefs_g, rate, buf, nseg, priced=True):
    """Host replica of both MQUANT cost models (all-intra GOB): returns
    (q_seg one-pass, q_seg two-pass).  priced=True mirrors the production
    model (MQUANT signaling bits charged to switching segments, round-5);
    priced=False is the pre-round-5 unpriced model, kept so tests can show
    where the two disagree."""
    from p64tpu.core.encoder import _MQ_UPGRADE
    from p64tpu.entropy import lengths
    from p64tpu.kernels.quant import quantize_zz
    from p64tpu.spec.constants import MBS_PER_GOB
    from p64tpu.spec.tables import MTYPE_BY_NAME

    weights = np.array([32, 16, 8, 4, 2, 1], np.int32)
    seg_id = (np.arange(MBS_PER_GOB) * nseg) // MBS_PER_GOB
    seg_oh = seg_id[None, :] == np.arange(nseg)[:, None]

    def q_of(b):
        return int(np.clip(b // rate.qdfact + rate.qoffs, 1, 31))

    def model_bits(q_mb):
        lv = np.asarray(quantize_zz(
            jnp.asarray(coefs_g), jnp.asarray(q_mb)[:, None, None],
            jnp.ones((MBS_PER_GOB, 1, 1), bool)))
        cbp = np.where((lv != 0).any(-1), weights, 0).sum(-1)
        mt = np.full(MBS_PER_GOB, MTYPE_BY_NAME["intra"], np.int32)
        coded = np.ones(MBS_PER_GOB, bool)
        bits = np.asarray(lengths.gob_payload_bits_per_mb(
            jnp.asarray(coded), jnp.asarray(mt),
            jnp.zeros((MBS_PER_GOB, 2), jnp.int32), jnp.asarray(cbp),
            jnp.asarray(lv)))
        return bits, cbp > 0, mt

    q0 = q_of(buf)

    def seg_quants(model):
        mb, hc, mt = model
        sb = np.where(seg_oh, mb[None, :], 0).sum(-1)
        segcoef = seg_oh & hc[None, :]
        any_coef = segcoef.any(-1)
        first = segcoef.argmax(-1)
        mtl = lengths.MTYPE_LEN
        sig = np.where(any_coef,
                       lengths.MQUANT_BITS
                       + mtl[_MQ_UPGRADE[mt[first]]] - mtl[mt[first]], 0)
        qs, eff, acc = [], q0, 0
        for s in range(nseg):
            q_s = q_of(buf + acc)
            qs.append(q_s)
            if s > 0 and any_coef[s] and q_s != eff:
                eff = q_s
                if priced:
                    acc += int(sig[s])
            acc += int(sb[s])
        return np.array(qs)

    qs1 = seg_quants(model_bits(np.full(MBS_PER_GOB, q0, np.int32)))
    qs2 = seg_quants(model_bits(
        np.where(seg_oh, qs1[:, None], 0).sum(0).astype(np.int32)))
    return qs1, qs2, seg_id


def test_mquant_second_pass_cost_model():
    """Segment quantizers must follow the SECOND-pass cost model: on
    content where the q0-only model and the refined model disagree, the
    encoder's emitted quant_mb matches the refined prediction (and the
    serializer still emits exactly the device-modeled bit count --
    encode_to_bytes asserts that internally)."""
    from p64tpu.core.blocks import (assemble_mb_blocks, luma_to_mbs,
                                    to_gob_order)
    from p64tpu.kernels.dct import fdct8x8_zz

    y, cb = _graded_gob_content()
    rate = RateConfig(bit_rate=700_000, frame_rate=30, mquant_segments=3)
    cfg = enc.EncoderConfig(fmt=QCIF, rate=rate)

    # host prediction for GOB 0 of the (all-intra) first frame
    blocks = assemble_mb_blocks(
        luma_to_mbs(jnp.asarray(y, jnp.int32)),
        jnp.asarray(cb, jnp.int32), jnp.asarray(cb, jnp.int32))
    coefs_t = np.asarray(to_gob_order(QCIF, fdct8x8_zz(blocks)))
    qs1, qs2, seg_id = _host_mquant_models(
        coefs_t[0], rate, rate.initial_buffer(), rate.mquant_segments)
    assert not np.array_equal(qs1, qs2), (
        "content no longer separates the models; re-tune the fixture")

    frames = dict(y=jnp.asarray(y[None]), cb=jnp.asarray(cb[None]),
                  cr=jnp.asarray(cb[None]))
    data, outputs, _ = enc.encode_to_bytes(cfg, frames)
    quant_t = np.asarray(to_gob_order(
        QCIF, jnp.asarray(outputs["quant_mb"][0])))
    # all-intra graded content: every segment has coefficients, so the
    # effective-quant chain equals the segment quantizers directly
    np.testing.assert_array_equal(quant_t[0], qs2[seg_id])
    assert not np.array_equal(quant_t[0], qs1[seg_id])


def test_mquant_signaling_priced_in_cost_model():
    """The segment cost model must charge MQUANT signaling (5-bit field +
    MTYPE upgrade delta) to switching segments: on rate points where the
    unpriced model's buffer projection lands within the signaling cost of
    a quantizer-law step, the priced model projects a coarser quant for a
    later segment -- the signaling bits get paid for by quantization
    instead of silently overshooting the budget.  (Buffer bits only
    accumulate within a GOB, so segment quants are non-decreasing and
    pricing can never *remove* a switch -- priced >= unpriced elementwise
    is the structural direction of the correction.)  The encoder's
    emitted quant_mb must follow the PRICED model."""
    from p64tpu.core.blocks import (assemble_mb_blocks, luma_to_mbs,
                                    to_gob_order)
    from p64tpu.kernels.dct import fdct8x8_zz

    y, cb = _graded_gob_content()
    blocks = assemble_mb_blocks(
        luma_to_mbs(jnp.asarray(y, jnp.int32)),
        jnp.asarray(cb, jnp.int32), jnp.asarray(cb, jnp.int32))
    coefs0 = np.asarray(to_gob_order(QCIF, fdct8x8_zz(blocks)))[0]

    found = None
    for br in range(360_000, 1_100_000, 2_000):
        rate = RateConfig(bit_rate=br, frame_rate=30, mquant_segments=3)
        _, qp, seg_id = _host_mquant_models(
            coefs0, rate, rate.initial_buffer(), 3, priced=True)
        _, qu, _ = _host_mquant_models(
            coefs0, rate, rate.initial_buffer(), 3, priced=False)
        if not np.array_equal(qp, qu):
            found = (rate, qp, qu, seg_id)
            break
    assert found is not None, (
        "no rate point separates the priced/unpriced models on the graded "
        "fixture; re-tune the search range")
    rate, qp, qu, seg_id = found
    assert (qp >= qu).all() and (qp > qu).any()

    cfg = enc.EncoderConfig(fmt=QCIF, rate=rate)
    frames = dict(y=jnp.asarray(y[None]), cb=jnp.asarray(cb[None]),
                  cr=jnp.asarray(cb[None]))
    _, outputs, _ = enc.encode_to_bytes(cfg, frames)
    quant_t = np.asarray(to_gob_order(
        QCIF, jnp.asarray(outputs["quant_mb"][0])))
    # all-intra graded content: every segment has coefficients, so the
    # effective-quant chain equals the segment quantizers directly
    np.testing.assert_array_equal(quant_t[0], qp[seg_id])
    assert not np.array_equal(quant_t[0], qu[seg_id])


def test_activity_no_int32_overflow_on_bright_content():
    """sum(x)^2 reaches 4.26e9 > 2^31 for mean luma > 181; the naive
    int32 square wrapped and reported variance 65536 for a FLAT bright MB
    (round-4 review finding).  activity must match the int64 oracle over
    the full luma range, including the flat-255 extreme."""
    for val in (182, 200, 255):
        flat = jnp.full((1, 16, 16), val, jnp.int32)
        assert int(decisions.activity(flat)[0]) == 0
    x = RNG.integers(150, 256, (32, 16, 16))           # bright textured MBs
    got = np.asarray(decisions.activity(jnp.asarray(x, jnp.int32)))
    s1 = x.reshape(32, -1).sum(1).astype(np.int64)
    s2 = (x.astype(np.int64) ** 2).reshape(32, -1).sum(1)
    want = (s2 - (s1 * s1) // 256) // 256
    np.testing.assert_array_equal(got, want)
