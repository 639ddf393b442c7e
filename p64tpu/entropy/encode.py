"""Host-side bitstream serializer: dense per-frame symbol tensors -> H.261 bits.

This is the encoder's "finalize" pass (SURVEY section 7: the device emits
symbol tensors; the host walks them in GOB/MBA transmission order and packs
VLCs).  The reference interleaves this work into its per-MB encode loop
(p64EncodeMDU + huffman.c Encode + stream.c mputv; mount empty this round,
unverified); here it is a pure function of device outputs, so it can run
after the fact, be overlapped with device work, or be replaced by the C++
packer in p64tpu/native with the identical contract.

The serializer MUST emit exactly the number of bits the device-side length
model (:mod:`p64tpu.entropy.lengths`) predicts -- rate control trusts those
counts.  Tests assert this equality on every stream.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core.blocks import transmission_order
from ..spec import luts
from ..spec.constants import (
    GBSC_BITS,
    GBSC_VALUE,
    GN_BITS,
    GQUANT_BITS,
    MBS_PER_GOB,
    PEI_BITS,
    PSC_BITS,
    PSC_VALUE,
    PTYPE_BITS,
    TR_BITS,
    Format,
    ptype_value,
)
from .bitio import BitWriter


@dataclasses.dataclass
class FrameSymbols:
    """Everything the host needs to serialize one coded picture.

    All per-MB arrays are in *raster* MB order (device-native); the
    serializer applies the GOB-major transmission permutation itself.

      tr:      temporal reference (0..31)
      gquant:  (nGOB,) GQUANT per GOB, transmission order
      coded:   (nMB,) bool, MB is transmitted
      mtype:   (nMB,) int, MTYPE row index (0..9); valid where coded
      mv:      (nMB, 2) int, (mvx, mvy); valid where MTYPE has MC
      cbp:     (nMB,) int, coded block pattern; valid where MTYPE has CBP
      levels:  (nMB, 6, 64) int, zigzag-ordered quantized levels.  For intra
               MBs, levels[:, :, 0] holds the DC *level* (1..254).
      quant_mb: (nMB,) int, effective quantizer per MB -- its value is
               written as the 5-bit MQUANT field wherever mtype is an
               MQUANT variant.  May be None when no MB uses MQUANT.
      n_stuff: number of MBA stuffing codes (11 bits each) appended after
               the last GOB's macroblocks (minimum-rate fill; H.261
               Table 1 allows stuffing before any MBA, any number of
               times).
    """

    tr: int
    gquant: np.ndarray
    coded: np.ndarray
    mtype: np.ndarray
    mv: np.ndarray
    cbp: np.ndarray
    levels: np.ndarray
    quant_mb: Optional[np.ndarray] = None
    n_stuff: int = 0


def wrap_mvd(mv: int, pred: int) -> int:
    """MVD = MV - pred, folded into the codeable range -16..15 by +/-32
    (H.261 section 4.2.3.3; MV range +/-15 makes the fold unambiguous)."""
    d = mv - pred
    if d < -16:
        d += 32
    elif d > 15:
        d -= 32
    return d


class _SymSink(BitWriter):
    """BitWriter with the oracle serializer's (bytes, nbits) pack()
    interface -- one accumulate-and-pack implementation (with BitWriter's
    value-range asserts), not two (round-4 review finding)."""

    def pack(self) -> Tuple[bytes, int]:
        return self.getvalue(), self.nbits


def _put_block(sink: _SymSink, zz: np.ndarray, intra: bool) -> None:
    """Serialize one 8x8 block's zigzag levels (+EOB)."""
    if intra:
        dc = int(zz[0])
        sink.put(255 if dc == 128 else dc, 8)
        start = 1
        first_inter = False
    else:
        start = 0
        first_inter = True
    ac = np.asarray(zz[start:], dtype=np.int64)
    nz = np.nonzero(ac)[0]
    prev = -1
    for j in nz:
        run = int(j) - prev - 1
        prev = int(j)
        level = int(ac[j])
        alevel = abs(level)
        sign = 1 if level < 0 else 0
        if first_inter and run == 0 and alevel == 1:
            sink.put((luts.FIRST01_CODE << 1) | sign, luts.FIRST01_LEN + 1)
        elif run < 64 and alevel <= 127 and luts.TC_IN_TABLE[run, alevel]:
            sink.put((int(luts.TC_CODE[run, alevel]) << 1) | sign,
                     int(luts.TC_LEN[run, alevel]))
        else:
            assert -127 <= level <= 127 and level != 0, level
            body = (luts.ESC_CODE << 14) | (run << 8) | (level & 0xFF)
            sink.put(body, 20)
        first_inter = False
    sink.put(luts.EOB_CODE, luts.EOB_LEN)


def serialize_frame(fmt: Format, sym: FrameSymbols, sink: _SymSink) -> None:
    perm = transmission_order(fmt)

    # Picture header: PSC TR PTYPE PEI=0
    sink.put(PSC_VALUE, PSC_BITS)
    sink.put(sym.tr & 31, TR_BITS)
    sink.put(ptype_value(fmt.is_cif), PTYPE_BITS)
    sink.put(0, PEI_BITS)

    for gi, gn in enumerate(fmt.gob_numbers):
        sink.put(GBSC_VALUE, GBSC_BITS)
        sink.put(gn, GN_BITS)
        sink.put(int(sym.gquant[gi]), GQUANT_BITS)
        sink.put(0, PEI_BITS)  # GEI

        prev_idx = -1     # last coded MB's in-GOB index
        prev_mv = (0, 0)  # last MB's MV if it was MC-coded, else reset
        prev_was_mc = False
        for idx in range(MBS_PER_GOB):
            raster = perm[gi * MBS_PER_GOB + idx]
            if not sym.coded[raster]:
                continue
            mt = int(sym.mtype[raster])
            sink.put(int(luts.MBA_CODE[idx - prev_idx]),
                     int(luts.MBA_LEN[idx - prev_idx]))
            sink.put(int(luts.MTYPE_CODE[mt]), int(luts.MTYPE_LEN[mt]))
            if luts.MTYPE_MQUANT[mt]:
                assert sym.quant_mb is not None, (
                    "MQUANT MTYPE requires per-MB quant values")
                q = int(sym.quant_mb[raster])
                assert 1 <= q <= 31, q
                sink.put(q, 5)
            if luts.MTYPE_MC[mt]:
                # predictor resets at MB 1/12/23 of the GOB, on address
                # gaps, and when the previous MB was not MC-coded.
                if idx % 11 == 0 or idx - prev_idx != 1 or not prev_was_mc:
                    pred = (0, 0)
                else:
                    pred = prev_mv
                mvx, mvy = int(sym.mv[raster, 0]), int(sym.mv[raster, 1])
                for comp, p in zip((mvx, mvy), pred):
                    d = wrap_mvd(comp, p)
                    sink.put(int(luts.MVD_CODE[d + 16]),
                             int(luts.MVD_LEN[d + 16]))
                prev_mv = (mvx, mvy)
                prev_was_mc = True
            else:
                prev_was_mc = False
            intra = bool(luts.MTYPE_INTRA[mt])
            if luts.MTYPE_CBP[mt]:
                cbp = int(sym.cbp[raster])
                assert 1 <= cbp <= 63, cbp
                sink.put(int(luts.CBP_CODE[cbp]), int(luts.CBP_LEN[cbp]))
                blockmask = [(cbp >> (5 - b)) & 1 for b in range(6)]
            elif luts.MTYPE_TCOEFF[mt]:  # intra: all six blocks
                blockmask = [1] * 6
            else:  # MC / FIL without coefficients
                blockmask = [0] * 6
            for b in range(6):
                if blockmask[b]:
                    _put_block(sink, sym.levels[raster, b], intra)
            prev_idx = idx

    # minimum-rate fill: stuffing codes trail the last GOB's macroblocks
    # (legal before any MBA; decoders discard them while scanning for the
    # next start code)
    for _ in range(int(sym.n_stuff)):
        sink.put(luts.MBA_STUFFING_CODE, luts.MBA_STUFFING_LEN)


def serialize_sequence_py(fmt: Format,
                          frames: Sequence[FrameSymbols]
                          ) -> Tuple[bytes, int]:
    """Pure-Python serializer (the oracle; native path below must match)."""
    sink = _SymSink()
    for sym in frames:
        serialize_frame(fmt, sym, sink)
    return sink.pack()


def serialize_sequence(fmt: Format,
                       frames: Sequence[FrameSymbols]) -> Tuple[bytes, int]:
    """Pack a whole sequence; returns (bytes, total_bits) where the byte
    string is zero-padded to a byte boundary at the very end only.

    Uses the C++ engine (p64tpu.native) when available -- byte-identical to
    the Python path by test contract (tests/test_native.py)."""
    from ..native import load
    native = load()
    if native is not None and frames:
        return native.serialize(fmt, list(frames))
    return serialize_sequence_py(fmt, frames)
