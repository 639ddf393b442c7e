"""Device decode of 'foreign' H.261 feature streams our encoder never
emits: MQUANT mid-GOB (per-MB quantizer changes) and MBA stuffing must flow
through parse -> device reconstruction correctly."""

import numpy as np

import jax.numpy as jnp

from p64tpu.core.decoder import decode_frames
from p64tpu.entropy.bitio import BitWriter
from p64tpu.entropy.parse import parse_stream
from p64tpu.kernels.dct import idct8x8
from p64tpu.kernels.quant import dequantize
from p64tpu.spec.constants import QCIF


def build_stream():
    w = BitWriter()
    w.put(0x00010, 20)   # PSC
    w.put(3, 5)          # TR
    w.put(0b000011, 6)   # PTYPE QCIF
    w.put(0, 1)
    for gn in (1, 3, 5):
        w.put(1, 16)
        w.put(gn, 4)
        w.put(20, 5)     # GQUANT 20
        w.put(0, 1)
        if gn == 1:
            # MB1: intra + MQUANT 6; DC 100, one AC at zigzag pos 1 level +2
            w.put_str("00000001111")   # stuffing before MBA
            w.put_str("1")             # MBA 1
            w.put_str("0000001")       # MTYPE intra_mquant
            w.put(6, 5)                # MQUANT 6
            for b in range(6):
                w.put(100, 8)          # DC
                if b == 0:
                    w.put_str("11" + "0")  # (0,+1) '11s'
                w.put_str("10")        # EOB
            # MB2: plain intra at the inherited quant (6)
            w.put_str("1")             # MBA 1 (consecutive)
            w.put_str("0001")          # MTYPE intra
            for b in range(6):
                w.put(50, 8)
                w.put_str("10")
    return w.getvalue()


def test_mquant_midgob_device_decode():
    data = build_stream()
    frames = parse_stream(data)
    f = frames[0]
    assert f.fmt is QCIF
    assert f.coded[:2].all() and not f.coded[2:].any()
    assert f.quant[0] == 6 and f.quant[1] == 6
    assert f.levels[0, 0, 0] == 100 and f.levels[0, 0, 1] == 1
    y, cb, cr = decode_frames(frames)
    y = np.asarray(y)[0]

    # manual expectation for MB0 block Y1 via the shared kernels
    lv = np.zeros((1, 64), np.int32)
    lv[0, 0] = 100
    lv[0, 1] = 1
    coefs = dequantize(jnp.asarray(lv), jnp.int32(6), jnp.asarray(True))
    expect = np.clip(np.asarray(idct8x8(coefs))[0], 0, 255)
    np.testing.assert_array_equal(y[:8, :8], expect)

    # MB2 (raster index 1): DC-only blocks at level 50 -> flat 8x8 patches
    lv2 = np.zeros((1, 64), np.int32)
    lv2[0, 0] = 50
    coefs2 = dequantize(jnp.asarray(lv2), jnp.int32(6), jnp.asarray(True))
    expect2 = np.clip(np.asarray(idct8x8(coefs2))[0], 0, 255)
    np.testing.assert_array_equal(y[:8, 16:24], expect2)

    # uncoded MBs reconstruct as copies of the (zero) initial reference
    assert (y[:16, 32:] == 0).all()


def _tail_mb_stream():
    """Stream whose very last macroblock is MC-no-coeff and short (6 bits):
    MBA 1 + MTYPE inter_mc '001' + MVD(0,0) '1','1'.  Regression for the
    parser bail that dropped trailing MBs with fewer than 16 bits left."""
    w = BitWriter()
    w.put(0x00010, 20)   # PSC
    w.put(0, 5)          # TR
    w.put(0b000011, 6)   # PTYPE QCIF
    w.put(0, 1)          # PEI
    for gn in (1, 3, 5):
        w.put(1, 16)
        w.put(gn, 4)
        w.put(10, 5)     # GQUANT
        w.put(0, 1)      # GEI
        if gn == 5:
            # one intra MB so the GOB is not empty, then the tail MC MB
            w.put_str("1")        # MBA 1
            w.put_str("0001")     # MTYPE intra
            for _ in range(6):
                w.put(50, 8)
                w.put_str("10")   # EOB
            w.put_str("1")        # MBA 1 -> in-GOB idx 1 (raster 67)
            w.put_str("001")      # MTYPE inter+MC (no coef)
            w.put_str("1")        # MVD x = 0
            w.put_str("1")        # MVD y = 0
    return w.getvalue()


def test_trailing_short_mc_mb_parsed():
    data = _tail_mb_stream()
    for parse in _parsers():
        frames = parse(data)
        f = frames[0]
        assert f.coded[66] and f.intra[66]
        assert f.coded[67], "trailing 6-bit MC macroblock must be parsed"
        assert f.mc[67] and not f.intra[67]
        assert tuple(f.mv[67]) == (0, 0)
        assert f.cbp[67] == 0


def _parsers():
    from p64tpu.native import load
    ps = [parse_stream]
    native = load()
    if native is not None:
        ps.append(native.parse)
    return ps


def test_mv_outside_picture_rejected_both_parsers():
    """H.261 3.2.1: MVs must not reference outside the picture.  A stream
    giving the top-left MB mv=(-15,-15) must raise StreamError in both
    parsers (the device MC path would otherwise silently predict from
    zero padding -- round-4 review finding)."""
    import numpy as np
    import pytest

    from helpers import random_frame_symbols
    from p64tpu.entropy import encode, parse
    from p64tpu.native import load
    from p64tpu.spec.constants import QCIF
    from p64tpu.spec.tables import MTYPE_BY_NAME

    rng = np.random.default_rng(88)
    f = random_frame_symbols(QCIF, rng, tr=0, p_intra=0.0)
    f.coded[0] = True
    f.mtype[0] = MTYPE_BY_NAME["inter_mc"]
    f.mv[0] = (-15, -15)                    # top-left MB: out of picture
    f.cbp[0] = 0
    f.levels[0] = 0
    data, _ = encode.serialize_sequence(QCIF, [f])
    with pytest.raises(parse.StreamError, match="outside"):
        parse.parse_stream(data)
    native = load()
    if native is not None:
        with pytest.raises(parse.StreamError, match="outside"):
            native.parse(data)
