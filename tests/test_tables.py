"""Structural validation of the H.261 VLC tables: prefix-freeness, Kraft
completeness, spec-pinned spot checks, and LUT/encoder-array consistency."""

import numpy as np
import pytest

from p64tpu.spec import luts, tables
from p64tpu.spec.zigzag import INV_ZIGZAG, ZIGZAG


def assert_prefix_free(codes):
    codes = sorted(codes, key=len)
    for i, a in enumerate(codes):
        for b in codes[i + 1:]:
            assert not b.startswith(a), (a, b)


def test_mba_prefix_free_and_complete():
    codes = list(tables.MBA_CODES.values()) + [tables.MBA_STUFFING]
    assert_prefix_free(codes)
    # MBA + stuffing + the start-code prefix '00000000' region: the 33+1
    # codes leave exactly the space of strings starting with >=8 zeros...
    # structural check: Kraft sum < 1 and adding '00000000' keeps it <= 1.
    assert tables.kraft_sum(codes) < 1.0


def test_mba_spot_values():
    assert tables.MBA_CODES[1] == "1"
    assert tables.MBA_CODES[2] == "011"
    assert tables.MBA_CODES[8] == "0000111"
    assert tables.MBA_CODES[33] == "00000011000"
    assert len(tables.MBA_STUFFING) == 11


def test_mtype_table():
    codes = [r[-1] for r in tables.MTYPE_ROWS]
    assert_prefix_free(codes)
    # complete except one spare 10-bit word (which would clash with start
    # codes): Kraft sum == 1 - 2^-10
    assert tables.kraft_sum(codes) == pytest.approx(1.0 - 2.0 ** -10)
    # spec spot checks
    assert dict(zip([r[0] for r in tables.MTYPE_ROWS], codes)) == {
        "intra": "0001", "intra_mquant": "0000001", "inter": "1",
        "inter_mquant": "00001", "inter_mc": "000000001",
        "inter_mc_coef": "00000001", "inter_mc_mquant": "0000000001",
        "inter_fil": "001", "inter_fil_coef": "01",
        "inter_fil_mquant": "000001",
    }


def test_mvd_table():
    assert len(tables.MVD_CODES) == 32
    assert set(tables.MVD_CODES) == set(range(-16, 16))
    assert_prefix_free(list(tables.MVD_CODES.values()))
    assert tables.MVD_CODES[0] == "1"
    assert tables.MVD_CODES[-1] == "011"
    assert tables.MVD_CODES[1] == "010"
    assert tables.MVD_CODES[15] == "00000011010"
    assert tables.MVD_CODES[-16] == "00000011001"


def test_cbp_table():
    assert set(tables.CBP_CODES) == set(range(1, 64))
    assert_prefix_free(list(tables.CBP_CODES.values()))
    # complete except the two 9-bit words 000000001 / 000000000
    # (start-code-emulation guard): free space exactly 2^-8.
    assert tables.kraft_sum(tables.CBP_CODES.values()) == pytest.approx(
        1.0 - 2.0 ** -8
    )
    assert tables.CBP_CODES[60] == "111"
    assert tables.CBP_CODES[1] == "01011"


def test_tcoeff_table_prefix_free():
    # Decoder alphabet at "subsequent coefficient" positions:
    # all table codes + sign, EOB, ESC.
    codes = [c + s for c in tables.TCOEFF_CODES.values() for s in "01"]
    codes += [tables.TCOEFF_EOB, tables.TCOEFF_ESCAPE]
    assert_prefix_free(codes)
    # At "first inter coefficient" positions EOB is replaced by '1s'.
    codes_first = [
        c + s for (r, l), c in tables.TCOEFF_CODES.items()
        if (r, l) != (0, 1) for s in "01"
    ]
    codes_first += [tables.TCOEFF_FIRST_01 + s for s in "01"]
    codes_first += [tables.TCOEFF_ESCAPE]
    assert_prefix_free(codes_first)


def test_tcoeff_spot_values():
    assert tables.TCOEFF_CODES[(0, 1)] == "11"
    assert tables.TCOEFF_CODES[(1, 1)] == "011"
    assert tables.TCOEFF_CODES[(0, 2)] == "0100"
    assert tables.TCOEFF_CODES[(26, 1)] == "0000000011011"
    assert tables.TCOEFF_EOB == "10"
    assert tables.TCOEFF_ESCAPE == "000001"
    assert max(len(c) for c in tables.TCOEFF_CODES.values()) == 13


def test_zigzag_is_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert (ZIGZAG[INV_ZIGZAG] == np.arange(64)).all()
    # spec spot checks (H.261 Fig. 10): first entries 0,1,8,16,9,2,3,10
    assert ZIGZAG[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]
    assert ZIGZAG[-1] == 63


def test_enc_luts_match_tables():
    for mba, bits in tables.MBA_CODES.items():
        v, n = tables.code_to_int(bits)
        assert luts.MBA_CODE[mba] == v and luts.MBA_LEN[mba] == n
    for cbp, bits in tables.CBP_CODES.items():
        v, n = tables.code_to_int(bits)
        assert luts.CBP_CODE[cbp] == v and luts.CBP_LEN[cbp] == n
    for (r, l), bits in tables.TCOEFF_CODES.items():
        assert luts.TC_IN_TABLE[r, l]
        assert luts.TC_LEN[r, l] == len(bits) + 1
    # out-of-table pair falls back to 20-bit escape
    assert luts.TC_LEN[27, 1] == 20
    assert luts.TC_LEN[0, 16] == 20
    assert not luts.TC_IN_TABLE[27, 1]
    assert luts.FIRST01_SAVING == 1


def test_dec_luts_roundtrip():
    # every encoder code decodes back through the peek LUT
    for mba, bits in tables.MBA_CODES.items():
        v, n = tables.code_to_int(bits)
        peek = v << (luts.MBA_LUT.k - n)
        assert luts.MBA_LUT.symbol[peek] == mba
        assert luts.MBA_LUT.nbits[peek] == n
    for mvd, bits in tables.MVD_CODES.items():
        v, n = tables.code_to_int(bits)
        peek = v << (luts.MVD_LUT.k - n)
        assert luts.MVD_LUT.symbol[peek] == mvd + 16
        assert luts.MVD_LUT.nbits[peek] == n
    kind, run, level, nbits = luts.TC_LUT_NEXT
    for (r, l), bits in tables.TCOEFF_CODES.items():
        for s in (0, 1):
            v, n = tables.code_to_int(bits + str(s))
            peek = v << (luts.TC_PEEK - n)
            assert kind[peek] == luts.TC_KIND_COEF
            assert run[peek] == r
            assert level[peek] == (-l if s else l)
            assert nbits[peek] == n
    # EOB and ESC
    v, n = tables.code_to_int(tables.TCOEFF_EOB)
    assert kind[v << (luts.TC_PEEK - n)] == luts.TC_KIND_EOB
    v, n = tables.code_to_int(tables.TCOEFF_ESCAPE)
    assert kind[v << (luts.TC_PEEK - n)] == luts.TC_KIND_ESC
    # first-coef LUT: '1s' decodes as (0, +/-1), EOB prefix invalid there
    kindf, runf, levelf, nbitsf = luts.TC_LUT_FIRST
    v, n = tables.code_to_int("10")  # would-be EOB == '1' + sign 0
    assert kindf[v << (luts.TC_PEEK - n)] == luts.TC_KIND_COEF
    assert levelf[v << (luts.TC_PEEK - n)] == 1
