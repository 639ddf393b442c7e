"""H.261 bitstream parser: bytes -> dense per-picture symbol tensors.

The decode parse is inherently bit-serial (SURVEY section 3b), so the
TPU-native split is: host parses VLCs into dense per-MB tensors, device does
all reconstruction math batched.  This module is the portable/oracle parser;
p64tpu/native provides a C++ parser with the identical output contract for
the high-throughput path.

Accepts any compliant H.261 stream within CIF/QCIF, including mid-GOB
MQUANT and MBA stuffing (our encoder emits stuffing too, for minimum-rate
fill -- RateConfig.min_rate_fill), per SURVEY section 7 step 3:
decoding *foreign* streams is the ground-truth path once the reference
mount appears.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from ..core.blocks import transmission_order
from ..spec import luts
from ..spec.constants import (
    CIF,
    MBS_PER_GOB,
    QCIF,
    Format,
)
from .bitio import BitReader


@dataclasses.dataclass
class ParsedFrame:
    """Dense symbol view of one coded picture, raster MB order.

    levels holds zigzag levels with intra DC *levels* (1..254, code 255
    already mapped to 128) in slot 0; all-zero rows for untransmitted
    blocks/MBs.
    """

    tr: int
    fmt: Format
    gquant: np.ndarray   # (nGOB,)
    coded: np.ndarray    # (nMB,) bool
    intra: np.ndarray    # (nMB,) bool
    mc: np.ndarray       # (nMB,) bool
    fil: np.ndarray      # (nMB,) bool
    quant: np.ndarray    # (nMB,) effective quant at each MB
    mv: np.ndarray       # (nMB, 2) (mvx, mvy)
    cbp: np.ndarray      # (nMB,)
    levels: np.ndarray   # (nMB, 6, 64) int16


class StreamError(ValueError):
    pass


def _decode_vlc(r: BitReader, lut: luts.VlcLut, what: str) -> int:
    peek = r.peek(lut.k)
    n = int(lut.nbits[peek])
    if n == 0:
        raise StreamError(f"invalid {what} code at bit {r.pos}")
    r.skip(n)
    return int(lut.symbol[peek])


def _decode_block(r: BitReader, intra: bool) -> np.ndarray:
    """Decode one block's TCOEFF sequence (incl. intra DC) up to EOB."""
    zz = np.zeros(64, dtype=np.int16)
    pos = 0
    if intra:
        code = r.read(8)
        if code in (0, 128):
            raise StreamError(f"forbidden intra DC code {code} at bit {r.pos}")
        zz[0] = 128 if code == 255 else code
        pos = 1
        first = False
    else:
        first = True
    while True:
        lutk, lutr, lutl, lutn = (luts.TC_LUT_FIRST if first
                                  else luts.TC_LUT_NEXT)
        peek = r.peek(luts.TC_PEEK)
        kind = int(lutk[peek])
        if kind == luts.TC_KIND_INVALID:
            raise StreamError(f"invalid TCOEFF code at bit {r.pos}")
        if kind == luts.TC_KIND_EOB:
            r.skip(2)
            return zz
        if kind == luts.TC_KIND_ESC:
            r.skip(6)
            run = r.read(6)
            lv = r.read(8)
            if lv in (0, 0x80):
                raise StreamError(f"forbidden escape level at bit {r.pos}")
            level = lv - 256 if lv >= 128 else lv
        else:
            r.skip(int(lutn[peek]))
            run, level = int(lutr[peek]), int(lutl[peek])
        pos += run
        if pos > 63:
            raise StreamError(f"coefficient position overflow at bit {r.pos}")
        zz[pos] = level
        pos += 1
        first = False
        if pos > 64:
            return zz


def _mv_from_mvd(pred: int, mvd: int) -> int:
    v = pred + mvd
    if v < -15:
        v += 32
    elif v > 15:
        v -= 32
    if not -15 <= v <= 15:
        raise StreamError(f"undecodable MV {v}")
    return v


def parse_stream(data: bytes) -> List[ParsedFrame]:
    r = BitReader(data)
    frames: List[ParsedFrame] = []
    # stream must start with a PSC
    if r.remaining < 20 or r.read(16) != 1 or r.read(4) != 0:
        raise StreamError("stream does not start with PSC")
    more = True
    while more:
        try:
            frame, more = _parse_picture(r)
        except EOFError as e:
            # fixed-width reads (TR/PTYPE/PEI, GQUANT, MQUANT, escapes) hit
            # BitReader's EOFError on truncated streams; the module's
            # declared error type is StreamError -- keep the contract (and
            # match the native parser's P64_ERR_TRUNCATED)
            raise StreamError(
                f"truncated stream at bit {r.pos}: {e}") from e
        frames.append(frame)
    return frames


def _parse_picture(r: BitReader):
    """Parse one picture; the PSC (incl. GN=0) has already been consumed."""
    tr = r.read(5)
    ptype = r.read(6)
    fmt = CIF if (ptype >> 2) & 1 else QCIF
    while r.read(1):         # PEI/PSPARE loop
        r.read(8)

    n = fmt.num_mbs
    out = ParsedFrame(
        tr=tr, fmt=fmt,
        gquant=np.zeros(fmt.num_gobs, np.int32),
        coded=np.zeros(n, bool), intra=np.zeros(n, bool),
        mc=np.zeros(n, bool), fil=np.zeros(n, bool),
        quant=np.ones(n, np.int32), mv=np.zeros((n, 2), np.int32),
        cbp=np.zeros(n, np.int32), levels=np.zeros((n, 6, 64), np.int16),
    )
    perm = transmission_order(fmt)
    gn_to_gi = {gn: gi for gi, gn in enumerate(fmt.gob_numbers)}

    while True:
        if r.remaining < 20:
            return out, False
        if r.peek(16) != 1:
            if r.remaining < 24 and r.peek(min(r.remaining, 24)) == 0:
                return out, False  # trailing byte-pad
            raise StreamError(f"expected start code at bit {r.pos}")
        mark = r.pos
        r.skip(16)
        gn = r.read(4)
        if gn == 0:          # next picture's PSC
            return out, True
        if gn not in gn_to_gi:
            raise StreamError(f"GN {gn} invalid for {fmt.name} at bit {mark}")
        _parse_gob(r, out, gn_to_gi[gn], perm)


def _parse_gob(r: BitReader, out: ParsedFrame, gi: int,
               perm: np.ndarray) -> None:
    gquant = r.read(5)
    if gquant == 0:
        raise StreamError("GQUANT 0 is forbidden")
    out.gquant[gi] = gquant
    while r.read(1):         # GEI/GSPARE loop
        r.read(8)
    quant = gquant
    addr = -1                # in-GOB MB index of last coded MB
    prev_mv = (0, 0)
    prev_was_mc = False
    while True:
        rem = r.remaining
        if rem < 0:
            # a VLC peek zero-padded past EOF matched a code longer than
            # the remaining real bits (possible for any code with trailing
            # zero bits) and skip() overran -- a truncated stream, not a
            # successful end-of-data (and without this check the
            # peek(min(rem, 24)) below would raise a negative-shift
            # ValueError instead of the module's declared StreamError)
            raise StreamError(f"truncated stream (VLC ran past EOF at "
                              f"bit {r.nbits})")
        if rem == 0:
            return
        if rem >= 16 and r.peek(16) == 1:
            return           # next start code
        if rem < 24 and r.peek(min(rem, 24)) == 0:
            return           # zero padding tail
        # NOTE: a final MB can be as short as 6 bits and end flush with the
        # byte boundary, so `rem < 16` alone is NOT end-of-data -- only a
        # start code or an all-zero tail is (a `rem < 16` bail here used to
        # drop a trailing MC-no-coeff macroblock; caught by
        # tests/test_roundtrip.py once decisions shifted).
        sym = _decode_vlc(r, luts.MBA_LUT, "MBA")
        if sym == luts.MBA_STUFFING_SYMBOL:
            continue
        gap = sym
        new_addr = addr + gap
        if new_addr >= MBS_PER_GOB:
            raise StreamError(f"MBA overflow in GOB at bit {r.pos}")
        # skipped MBs between addr and new_addr stay uncoded
        addr = new_addr
        raster = int(perm[gi * MBS_PER_GOB + addr])

        mt = _decode_vlc(r, luts.MTYPE_LUT, "MTYPE")
        intra = bool(luts.MTYPE_INTRA[mt])
        if luts.MTYPE_MQUANT[mt]:
            quant = r.read(5)
            if quant == 0:
                raise StreamError("MQUANT 0 is forbidden")
        if luts.MTYPE_MC[mt]:
            if gap != 1 or addr % 11 == 0 or not prev_was_mc:
                pred = (0, 0)
            else:
                pred = prev_mv
            mvx = _mv_from_mvd(pred[0],
                               _decode_vlc(r, luts.MVD_LUT, "MVD") - 16)
            mvy = _mv_from_mvd(pred[1],
                               _decode_vlc(r, luts.MVD_LUT, "MVD") - 16)
            # H.261 3.2.1: MVs must not reference pixels outside the
            # picture; the device MC path assumes this (core/predict.py)
            # and would otherwise silently predict from zero padding
            mb_cols = out.fmt.width // 16
            y0 = (raster // mb_cols) * 16
            x0 = (raster % mb_cols) * 16
            if not (0 <= y0 + mvy and y0 + mvy + 16 <= out.fmt.height
                    and 0 <= x0 + mvx and x0 + mvx + 16 <= out.fmt.width):
                raise StreamError(
                    f"MV ({mvx},{mvy}) at MB {raster} references outside "
                    f"the picture (bit {r.pos})")
            out.mv[raster] = (mvx, mvy)
            prev_mv = (mvx, mvy)
            prev_was_mc = True
            out.mc[raster] = True
            out.fil[raster] = bool(luts.MTYPE_FIL[mt])
        else:
            prev_was_mc = False
        if luts.MTYPE_CBP[mt]:
            cbp = _decode_vlc(r, luts.CBP_LUT, "CBP")
            blockmask = [(cbp >> (5 - b)) & 1 for b in range(6)]
        elif luts.MTYPE_TCOEFF[mt]:
            cbp = 63
            blockmask = [1] * 6
        else:
            cbp = 0
            blockmask = [0] * 6
        out.cbp[raster] = cbp
        for b in range(6):
            if blockmask[b]:
                out.levels[raster, b] = _decode_block(r, intra)
        out.coded[raster] = True
        out.intra[raster] = intra
        out.quant[raster] = quant
