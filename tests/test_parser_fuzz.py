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
