"""Parser robustness: corrupted streams must fail with StreamError (never
crash, hang, or mis-index), in both the Python and native parsers."""

import numpy as np
import pytest

from helpers import random_frame_symbols
from p64tpu.entropy import encode, parse
from p64tpu.native import load
from p64tpu.spec.constants import QCIF

native = load()


def _valid_stream():
    rng = np.random.default_rng(77)
    frames = [random_frame_symbols(QCIF, rng, tr=t) for t in range(2)]
    data, _ = encode.serialize_sequence(QCIF, frames)
    return bytearray(data)


@pytest.mark.parametrize("seed", range(8))
def test_bitflip_fuzz(seed):
    rng = np.random.default_rng(seed)
    data = _valid_stream()
    for _ in range(4):
        pos = int(rng.integers(4, len(data)))  # keep the PSC intact
        data[pos] ^= 1 << int(rng.integers(0, 8))
    for parser in (parse.parse_stream,
                   (native.parse if native else None)):
        if parser is None:
            continue
        try:
            frames = parser(bytes(data))
            # surviving a flip is fine -- outputs must still be in-range
            for f in frames:
                assert f.levels.shape[-1] == 64
                assert np.abs(f.mv).max() <= 15
                assert (f.quant[f.coded] >= 1).all()
        except parse.StreamError:
            pass  # the acceptable failure mode


@pytest.mark.parametrize("n", [0, 1, 2, 3, 5, 8])
def test_truncated_streams(n):
    data = bytes(_valid_stream())
    for parser in (parse.parse_stream, (native.parse if native else None)):
        if parser is None:
            continue
        try:
            parser(data[:n])
        except parse.StreamError:
            pass  # StreamError is the ONLY acceptable failure mode


def test_truncated_mid_stream():
    data = bytes(_valid_stream())
    for cut in (len(data) // 3, len(data) // 2, len(data) - 2):
        for parser in (parse.parse_stream,
                       (native.parse if native else None)):
            if parser is None:
                continue
            try:
                parser(data[:cut])
            except parse.StreamError:
                pass  # StreamError is the ONLY acceptable failure mode


def _outcome(parser, data: bytes):
    try:
        return ("ok", len(parser(data)))
    except parse.StreamError:
        return ("err",)


@pytest.mark.skipif(native is None, reason="native library unavailable")
def test_every_cut_point_parsers_agree():
    """For EVERY byte-truncation of a valid stream, the Python oracle and
    the native engine must agree on accept vs reject (and on the frame
    count when accepting).  Round-4 advisor finding: br_read zero-pads
    past EOF, so a stream cut inside the GEI/GSPARE loop (or mid-GQUANT /
    mid-MQUANT / mid-escape) parsed 'successfully' in C++ while the
    oracle raised StreamError at the same bit."""
    rng = np.random.default_rng(123)
    frames = [random_frame_symbols(QCIF, rng, tr=t, p_coded=0.15,
                                   p_mquant=0.3) for t in range(2)]
    data, _ = encode.serialize_sequence(QCIF, frames)
    for cut in range(len(data) + 1):
        d = bytes(data[:cut])
        py = _outcome(parse.parse_stream, d)
        nat = _outcome(native.parse, d)
        assert py == nat, (
            f"parser disagreement at cut {cut}/{len(data)}: "
            f"python={py} native={nat}")


@pytest.mark.skipif(native is None, reason="native library unavailable")
def test_truncated_gob_header_rejected_by_both():
    """Hand-crafted streams ending inside the GOB header (mid-GQUANT and
    with a taken GEI flag but missing GSPARE) must raise in BOTH parsers."""
    from p64tpu.entropy.bitio import BitWriter

    def header_bits(extra: str) -> bytes:
        w = BitWriter()
        w.put_str("0000000000000001" + "0000")   # PSC
        w.put_str("00000")                       # TR
        w.put_str("001000")                      # PTYPE (QCIF)
        w.put_str("0")                           # PEI = 0
        w.put_str("0000000000000001" + "0001")   # GBSC + GN=1
        w.put_str(extra)
        # pad to a byte boundary with zeros (start-code-free filler)
        return w.getvalue()

    for extra in ("010",           # 3 of 5 GQUANT bits
                  "01000" + "1",   # GQUANT=8, GEI=1, GSPARE missing
                  "01000" + "1" + "10101010" + "1"):  # 2nd GSPARE missing
        d = header_bits(extra)
        with pytest.raises(parse.StreamError):
            parse.parse_stream(d)
        with pytest.raises(parse.StreamError):
            native.parse(d)


def test_truncated_picture_header_raises_both_parsers():
    """A stream cut inside a picture header must RAISE StreamError in both
    parsers -- the native engine used to zero-pad past EOF and fabricate a
    bogus empty frame (round-4 review finding)."""
    for bad in (b"\x00\x01\x00",       # bare PSC + 4 zero bits
                b"\x00\x01\x0a"):      # PSC + 4 bits of TR
        with pytest.raises(parse.StreamError):
            parse.parse_stream(bad)
        if native is not None:
            with pytest.raises(parse.StreamError):
                native.parse(bad)
