"""Entropy layer round trip: symbols -> bits -> symbols, and the device bit-
length model vs actually-packed bit counts (the rate-control contract)."""

import numpy as np
import pytest

import jax.numpy as jnp

from helpers import random_frame_symbols
from p64tpu.core.blocks import gob_of_mb, transmission_order
from p64tpu.entropy import encode, lengths, parse
from p64tpu.entropy.bitio import BitReader, BitWriter, pack_symbols
from p64tpu.spec import luts
from p64tpu.spec.constants import CIF, QCIF


def test_bitio_roundtrip():
    rng = np.random.default_rng(1)
    lens = rng.integers(1, 21, 500)
    codes = np.array([rng.integers(0, 1 << l) for l in lens], dtype=np.uint64)
    data, nbits = pack_symbols(codes, lens)
    assert nbits == lens.sum()
    r = BitReader(data)
    for c, l in zip(codes, lens):
        assert r.read(int(l)) == int(c)


def test_bitwriter_matches_pack():
    w = BitWriter()
    w.put_str("0000000000010000")  # arbitrary
    w.put(5, 3)
    w.put(1, 1)
    data = w.getvalue()
    r = BitReader(data)
    assert r.read(16) == 16
    assert r.read(3) == 5
    assert r.read(1) == 1


@pytest.mark.parametrize("fmt,seed,p_mquant",
                         [(QCIF, 0, 0.0), (QCIF, 1, 0.0), (CIF, 2, 0.0),
                          (QCIF, 5, 0.3), (CIF, 6, 0.2)])
def test_serialize_parse_roundtrip(fmt, seed, p_mquant):
    rng = np.random.default_rng(seed)
    frames = [random_frame_symbols(fmt, rng, tr=t, p_mquant=p_mquant)
              for t in range(3)]
    data, nbits = encode.serialize_sequence(fmt, frames)
    assert len(data) == (nbits + 7) // 8

    parsed = parse.parse_stream(data)
    assert len(parsed) == len(frames)
    perm = transmission_order(fmt)
    gmap = gob_of_mb(fmt)
    del perm
    for orig, got in zip(frames, parsed):
        assert got.fmt is fmt
        assert got.tr == orig.tr
        np.testing.assert_array_equal(got.gquant, orig.gquant)
        np.testing.assert_array_equal(got.coded, orig.coded)
        c = orig.coded
        np.testing.assert_array_equal(got.intra[c],
                                      luts.MTYPE_INTRA[orig.mtype[c]])
        np.testing.assert_array_equal(got.mc[c],
                                      luts.MTYPE_MC[orig.mtype[c]])
        np.testing.assert_array_equal(got.fil[c],
                                      luts.MTYPE_FIL[orig.mtype[c]])
        mcm = c & luts.MTYPE_MC[orig.mtype]
        np.testing.assert_array_equal(got.mv[mcm], orig.mv[mcm])
        np.testing.assert_array_equal(got.cbp[c], orig.cbp[c])
        np.testing.assert_array_equal(got.levels[c], orig.levels[c])
        # effective quant: the GQUANT/MQUANT chain (helpers precompute it
        # when MQUANT MBs were generated; otherwise it is the GOB's GQUANT)
        if orig.quant_mb is not None:
            np.testing.assert_array_equal(got.quant[c], orig.quant_mb[c])
        else:
            np.testing.assert_array_equal(got.quant[c], orig.gquant[gmap[c]])


@pytest.mark.parametrize("fmt,seed,p_mquant",
                         [(QCIF, 3, 0.0), (CIF, 4, 0.0), (QCIF, 7, 0.3)])
def test_length_model_matches_packed_bits(fmt, seed, p_mquant):
    rng = np.random.default_rng(seed)
    sym = random_frame_symbols(fmt, rng, p_mquant=p_mquant)
    sink = encode._SymSink()
    encode.serialize_frame(fmt, sym, sink)
    _, nbits = sink.pack()

    total, gob_bits = lengths.frame_bits(
        fmt,
        jnp.asarray(sym.coded), jnp.asarray(sym.mtype),
        jnp.asarray(sym.mv), jnp.asarray(sym.cbp),
        jnp.asarray(sym.levels.astype(np.int32)))
    assert int(total) == nbits
    assert int(jnp.sum(gob_bits)) + lengths.PICTURE_HEADER_BITS == nbits


def test_parser_accepts_stuffing_and_mquant():
    # hand-build a tiny QCIF picture: PSC, 3 empty GOBs except GOB 1 carries
    # one intra MB with MQUANT and MBA stuffing before it.
    w = BitWriter()
    w.put(0x00010, 20)       # PSC
    w.put(7, 5)              # TR
    w.put(0b000011, 6)       # PTYPE: QCIF
    w.put(0, 1)              # PEI
    for gn in (1, 3, 5):
        w.put(1, 16)
        w.put(gn, 4)
        w.put(10, 5)         # GQUANT
        w.put(0, 1)          # GEI
        if gn == 1:
            w.put_str("00000001111")      # MBA stuffing
            w.put_str("1")                # MBA 1
            w.put_str("0000001")          # MTYPE intra+MQUANT
            w.put(13, 5)                  # MQUANT 13
            for _ in range(6):
                w.put(200, 8)             # DC
                w.put_str("10")           # EOB
    data = w.getvalue()
    frames = parse.parse_stream(data)
    assert len(frames) == 1
    f = frames[0]
    assert f.fmt is QCIF and f.tr == 7
    assert f.coded.sum() == 1 and f.coded[0]
    assert f.intra[0] and f.quant[0] == 13
    assert (f.levels[0, :, 0] == 200).all()


def test_parser_rejects_garbage():
    with pytest.raises(parse.StreamError):
        parse.parse_stream(b"\xff\xff\xff\xff")
