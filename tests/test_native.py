"""Native C++ bit-I/O vs the pure-Python oracle: byte-exact equality on
packing, frame serialization, and stream parsing."""

import numpy as np
import pytest

from helpers import random_frame_symbols
from p64tpu.entropy import encode, parse
from p64tpu.entropy.bitio import pack_symbols
from p64tpu.native import load
from p64tpu.spec.constants import CIF, QCIF

native = load()
pytestmark = pytest.mark.skipif(native is None,
                                reason="native lib unavailable")


def test_pack_symbols_matches():
    rng = np.random.default_rng(3)
    lens = rng.integers(1, 21, 2000)
    codes = np.array([rng.integers(0, 1 << l) for l in lens], np.uint64)
    want, wbits = pack_symbols(codes, lens)
    got, gbits = native.pack_symbols(codes, lens)
    assert gbits == wbits
    assert got == want


@pytest.mark.parametrize("fmt,seed,p_mquant",
                         [(QCIF, 0, 0.0), (QCIF, 5, 0.0), (CIF, 6, 0.0),
                          (QCIF, 8, 0.3), (CIF, 9, 0.2)])
def test_serialize_matches_python(fmt, seed, p_mquant):
    rng = np.random.default_rng(seed)
    frames = [random_frame_symbols(fmt, rng, tr=t, p_mquant=p_mquant)
              for t in range(3)]
    want, wbits = encode.serialize_sequence(fmt, frames)
    got, gbits = native.serialize(fmt, frames)
    assert gbits == wbits
    assert got == want


@pytest.mark.parametrize("fmt,seed,p_mquant",
                         [(QCIF, 1, 0.0), (CIF, 2, 0.0), (QCIF, 10, 0.3)])
def test_parse_matches_python(fmt, seed, p_mquant):
    rng = np.random.default_rng(seed)
    frames = [random_frame_symbols(fmt, rng, tr=t, p_mquant=p_mquant)
              for t in range(2)]
    data, _ = encode.serialize_sequence(fmt, frames)
    want = parse.parse_stream(data)
    got = native.parse(data)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert a.fmt is b.fmt and a.tr == b.tr
        for field in ("gquant", "coded", "intra", "mc", "fil", "quant",
                      "mv", "cbp", "levels"):
            np.testing.assert_array_equal(getattr(a, field),
                                          getattr(b, field), err_msg=field)


def test_serialize_stuffing_matches_python():
    """n_stuff > 0 (minimum-rate fill) must serialize identically in C++
    and Python, and both parsers must discard the stuffing."""
    rng = np.random.default_rng(21)
    frames = [random_frame_symbols(QCIF, rng, tr=t) for t in range(3)]
    for i, f in enumerate(frames):
        f.n_stuff = [0, 5, 117][i]
    want, wbits = encode.serialize_sequence_py(QCIF, frames)
    got, gbits = native.serialize(QCIF, frames)
    assert gbits == wbits == sum(
        11 * f.n_stuff for f in frames) + encode.serialize_sequence_py(
            QCIF, [encode.FrameSymbols(**{**f.__dict__, "n_stuff": 0})
                   for f in frames])[1]
    assert got == want
    a = parse.parse_stream(want)
    b = native.parse(got)
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.coded, y.coded)
        np.testing.assert_array_equal(x.levels, y.levels)


def test_parse_copy_gives_independent_frames():
    """copy=True returns arrays that own their data (no view into the
    call's 4x-overshoot buffers), equal to the view-path output."""
    rng = np.random.default_rng(21)
    frames = [random_frame_symbols(QCIF, rng, tr=t) for t in range(3)]
    data, _ = encode.serialize_sequence(QCIF, frames)
    views = native.parse(data)
    owned = native.parse(data, copy=True)
    for a, b in zip(views, owned):
        for field in ("gquant", "quant", "mv", "cbp", "levels"):
            va, vb = getattr(a, field), getattr(b, field)
            np.testing.assert_array_equal(va, vb)
            assert va.base is not None      # view path: borrows buffers
            assert vb.base is None          # copy path: owns its data


def test_parse_rejects_garbage():
    with pytest.raises(parse.StreamError):
        native.parse(b"\xff\xff\xff\xff")


def test_native_roundtrip_speed_sanity():
    # not a benchmark -- just ensures the native path handles a larger CIF
    # batch quickly and identically
    rng = np.random.default_rng(11)
    frames = [random_frame_symbols(CIF, rng, tr=t % 32) for t in range(8)]
    data_n, bits_n = native.serialize(CIF, frames)
    data_p, bits_p = encode.serialize_sequence(CIF, frames)
    assert (bits_n, data_n) == (bits_p, data_p)
    parsed = native.parse(data_n)
    assert len(parsed) == 8


def test_parse_many_matches_serial():
    """Thread-fanned multi-stream parse must equal per-stream parse."""
    from p64tpu.core.decoder import parse_many

    rng = np.random.default_rng(31)
    datas = []
    for t in range(5):
        frames = [random_frame_symbols(QCIF, rng, tr=k) for k in range(2)]
        datas.append(encode.serialize_sequence(QCIF, frames)[0])
    got = parse_many(datas)
    for d, g in zip(datas, got):
        want = parse.parse_stream(d)
        assert len(g) == len(want)
        for a, b in zip(g, want):
            np.testing.assert_array_equal(a.levels, b.levels)
            np.testing.assert_array_equal(a.coded, b.coded)
            np.testing.assert_array_equal(a.mv, b.mv)


def test_parse_tensors_matches_framewise():
    """Direct-to-tensor parse must equal the ParsedFrame path exactly."""
    from p64tpu.core.decoder import frames_to_tensors, parse_to_tensors

    rng = np.random.default_rng(41)
    for fmt in (QCIF, CIF):
        frames = [random_frame_symbols(fmt, rng, tr=t) for t in range(3)]
        data, _ = encode.serialize_sequence(fmt, frames)
        got_fmt, got_tr, got = parse_to_tensors(data)
        want_frames = parse.parse_stream(data)
        want = {k: np.asarray(v)
                for k, v in frames_to_tensors(want_frames).items()}
        assert got_fmt is fmt
        np.testing.assert_array_equal(got_tr,
                                      [f.tr for f in want_frames])
        for k in want:
            np.testing.assert_array_equal(np.asarray(got[k]), want[k],
                                          err_msg=k)


def test_parse_adaptive_buffer_growth():
    """Streams longer than the initial 64-frame buffer must trigger the
    4x adaptive regrowth (P64_ERR_MAXFRAMES retry) in both parse paths."""
    from p64tpu.core.decoder import parse_to_tensors

    rng = np.random.default_rng(51)
    frames = [random_frame_symbols(QCIF, rng, tr=t % 32, p_coded=0.1)
              for t in range(70)]
    data, _ = encode.serialize_sequence(QCIF, frames)
    got = native.parse(data)
    assert len(got) == 70
    want = parse.parse_stream(data)
    np.testing.assert_array_equal(got[69].levels, want[69].levels)
    fmt, tr, seq = parse_to_tensors(data)
    assert fmt is QCIF and seq["levels8"].shape[0] == 70
    lv = seq["levels8"][69].astype(np.int16)
    lv[..., 0] = np.where(seq["dc"][69] > 0, seq["dc"][69], lv[..., 0])
    np.testing.assert_array_equal(lv, want[69].levels)
    # explicit small cap is honored
    from p64tpu.entropy.parse import StreamError
    with pytest.raises(StreamError):
        native.parse_tensors(data, max_frames=8)


def test_parse_long_stuffing_runs_fast_path():
    """The C++ MBA-stuffing fast path (4 codes per 44-bit peek + singles)
    must agree with the Python parser on long runs of every length mod 4,
    including a run that ends flush with the end of data."""
    from p64tpu.entropy.encode import FrameSymbols
    rng = np.random.default_rng(77)
    for n_stuff in (1, 2, 3, 4, 5, 47, 1001):
        frames = [random_frame_symbols(QCIF, rng, tr=t, p_coded=0.1)
                  for t in range(2)]
        frames = [FrameSymbols(**{**f.__dict__, "n_stuff": n_stuff})
                  for f in frames]
        data, _ = encode.serialize_sequence(QCIF, frames)
        want = parse.parse_stream(data)
        got = native.parse(data)
        assert len(got) == len(want) == 2, n_stuff
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a.coded, b.coded)
            np.testing.assert_array_equal(a.levels, b.levels)
