"""ctypes binding for the C++ bit-I/O engine (pybind11 not available in this
image -- SURVEY environment notes).  Contracts mirror the pure-Python
implementations exactly; tests assert byte-for-byte equality."""

from __future__ import annotations

import ctypes as C
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

from ..spec import luts
from ..spec.constants import CIF, QCIF, Format, ptype_value
from ..core.blocks import transmission_order

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libp64bitio.so")


class _EncTables(C.Structure):
    _fields_ = [(n, C.c_void_p) for n in (
        "mba_code", "mba_len", "mtype_code", "mtype_len", "mtype_flags",
        "mvd_code", "mvd_len", "cbp_code", "cbp_len",
        "tc_code", "tc_len", "tc_in")]


class _DecTables(C.Structure):
    _fields_ = [(n, C.c_void_p) for n in (
        "mba_sym", "mba_nbits", "mtype_sym", "mtype_nbits", "mtype_flags",
        "mvd_sym", "mvd_nbits", "cbp_sym", "cbp_nbits",
        "tc_kind_first", "tc_run_first", "tc_level_first", "tc_nbits_first",
        "tc_kind_next", "tc_run_next", "tc_level_next", "tc_nbits_next")]


def _ptr(a: np.ndarray) -> C.c_void_p:
    return C.c_void_p(a.ctypes.data)


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True)
        return os.path.exists(_SO)
    except Exception:
        return False


class NativeBitIO:
    """Wraps libp64bitio.so; hold one instance (tables are retained)."""

    def __init__(self, lib: C.CDLL) -> None:
        self._lib = lib
        lib.p64_pack_symbols.restype = C.c_int64
        lib.p64_serialize.restype = C.c_int64
        lib.p64_parse.restype = C.c_int64

        # encoder tables (keep references alive)
        self._enc_arrays = dict(
            mba_code=luts.MBA_CODE.astype(np.uint32),
            mba_len=luts.MBA_LEN.astype(np.int32),
            mtype_code=luts.MTYPE_CODE.astype(np.uint32),
            mtype_len=luts.MTYPE_LEN.astype(np.int32),
            mtype_flags=np.stack(
                [luts.MTYPE_INTRA, luts.MTYPE_MQUANT, luts.MTYPE_MC,
                 luts.MTYPE_FIL, luts.MTYPE_CBP, luts.MTYPE_TCOEFF],
                axis=1).astype(np.uint8).copy(),
            mvd_code=luts.MVD_CODE.astype(np.uint32),
            mvd_len=luts.MVD_LEN.astype(np.int32),
            cbp_code=luts.CBP_CODE.astype(np.uint32),
            cbp_len=luts.CBP_LEN.astype(np.int32),
            tc_code=luts.TC_CODE.astype(np.uint32).copy(),
            tc_len=luts.TC_LEN.astype(np.int32).copy(),
            tc_in=luts.TC_IN_TABLE.astype(np.uint8).copy(),
        )
        self._enc_t = _EncTables(**{k: _ptr(v) for k, v in
                                    self._enc_arrays.items()})

        kf, rf, lf, nf = luts.TC_LUT_FIRST
        kn, rn, ln, nn = luts.TC_LUT_NEXT
        self._dec_arrays = dict(
            mba_sym=luts.MBA_LUT.symbol.astype(np.int32),
            mba_nbits=luts.MBA_LUT.nbits.astype(np.int32),
            mtype_sym=luts.MTYPE_LUT.symbol.astype(np.int32),
            mtype_nbits=luts.MTYPE_LUT.nbits.astype(np.int32),
            mtype_flags=self._enc_arrays["mtype_flags"],
            mvd_sym=luts.MVD_LUT.symbol.astype(np.int32),
            mvd_nbits=luts.MVD_LUT.nbits.astype(np.int32),
            cbp_sym=luts.CBP_LUT.symbol.astype(np.int32),
            cbp_nbits=luts.CBP_LUT.nbits.astype(np.int32),
            tc_kind_first=kf.astype(np.int8), tc_run_first=rf.astype(np.int8),
            tc_level_first=lf.astype(np.int16),
            tc_nbits_first=nf.astype(np.int8),
            tc_kind_next=kn.astype(np.int8), tc_run_next=rn.astype(np.int8),
            tc_level_next=ln.astype(np.int16),
            tc_nbits_next=nn.astype(np.int8),
        )
        self._dec_t = _DecTables(**{k: _ptr(v) for k, v in
                                    self._dec_arrays.items()})
        self._perm_cif = transmission_order(CIF).astype(np.int32)
        self._perm_qcif = transmission_order(QCIF).astype(np.int32)
        # the C++ engine hardcodes the MBA stuffing pattern in its
        # emitter and greedy-parse fast path ('00000001111' = 0xF/11
        # bits, symbol 34); pin the single source of truth (spec tables)
        # to it so a table change cannot silently diverge the engines
        if ((luts.MBA_STUFFING_CODE, luts.MBA_STUFFING_LEN) != (0xF, 11)
                or luts.MBA_STUFFING_SYMBOL != 34):
            raise RuntimeError(
                "spec MBA stuffing tables diverged from the C++ engine's "
                "hardcoded pattern -- update bitio.cpp (kStuff4, emitter)")

    # -- pack --------------------------------------------------------------

    def pack_symbols(self, codes: np.ndarray,
                     lens: np.ndarray) -> Tuple[bytes, int]:
        codes = np.ascontiguousarray(codes, dtype=np.uint64)
        lens = np.ascontiguousarray(lens, dtype=np.int64)
        if len(lens) and (lens.max() > 64 or lens.min() < 0):
            # C++ bw_put shifts a uint64 by the length -- >64 would be UB
            # (the Python oracle asserts the same contract)
            raise ValueError("symbol lengths must be 0..64")
        cap = int(lens.sum()) // 8 + 16
        out = np.zeros(cap, np.uint8)
        n = self._lib.p64_pack_symbols(
            _ptr(codes), _ptr(lens), C.c_int64(len(codes)), _ptr(out),
            C.c_int64(cap))
        if n < 0:
            raise RuntimeError("pack overflow")
        return out[: (n + 7) // 8].tobytes(), int(n)

    # -- serialize ---------------------------------------------------------

    def serialize(self, fmt: Format, frames: List) -> Tuple[bytes, int]:
        """frames: list of entropy.encode.FrameSymbols (coded frames)."""
        if not frames:
            return b"", 0
        n = len(frames)
        n_mb, n_gob = fmt.num_mbs, fmt.num_gobs
        tr = np.ascontiguousarray([f.tr for f in frames], np.int32)
        gq = np.ascontiguousarray(np.stack([f.gquant for f in frames]),
                                  np.int32)
        coded = np.ascontiguousarray(np.stack([f.coded for f in frames]),
                                     np.uint8)
        mtype = np.ascontiguousarray(np.stack([f.mtype for f in frames]),
                                     np.int32)
        mv = np.ascontiguousarray(np.stack([f.mv for f in frames]), np.int32)
        cbp = np.ascontiguousarray(np.stack([f.cbp for f in frames]),
                                   np.int32)
        levels = np.ascontiguousarray(np.stack([f.levels for f in frames]),
                                      np.int16)
        quant_mb = np.ascontiguousarray(np.stack(
            [f.quant_mb if f.quant_mb is not None
             else np.zeros(n_mb, np.int32) for f in frames]), np.int32)
        n_stuff = np.ascontiguousarray([f.n_stuff for f in frames], np.int32)
        # validity guards mirroring the Python oracle (the C++ engine
        # trusts its inputs; a CBP of 0 or a missing MQUANT value would
        # otherwise serialize an UNDECODABLE stream that even the
        # length-model == serializer assert cannot catch, since both
        # count 0 bits for CBP 0)
        cmask = coded != 0
        bad_cbp = (luts.MTYPE_CBP[mtype] & cmask
                   & ((cbp < 1) | (cbp > 63)))
        if bad_cbp.any():
            raise ValueError(
                f"CBP out of range 1..63 on {int(bad_cbp.sum())} coded "
                f"CBP-bearing MBs")
        bad_mq = (luts.MTYPE_MQUANT[mtype] & cmask
                  & ((quant_mb < 1) | (quant_mb > 31)))
        if bad_mq.any():
            raise ValueError(
                f"MQUANT MTYPE without a valid 1..31 quant_mb on "
                f"{int(bad_mq.sum())} MBs")
        if ((gq < 1) | (gq > 31)).any():
            raise ValueError("GQUANT out of range 1..31")
        perm = transmission_order(fmt).astype(np.int32)
        gn = np.ascontiguousarray(fmt.gob_numbers, np.int32)
        # capacity: worst case ~ every coefficient escapes; generous bound
        cap = (int(n) * (64 + n_gob * 40 +
                         n_mb * (40 + 6 * (64 * 20 + 10))) // 8
               + int(n_stuff.sum()) * 11 // 8 + 1024)
        # p64_serialize memsets the whole buffer itself -- empty, not zeros
        out = np.empty(cap, np.uint8)
        bits = self._lib.p64_serialize(
            C.byref(self._enc_t), C.c_int64(n), C.c_int32(n_mb),
            C.c_int32(n_gob), _ptr(gn), _ptr(perm),
            C.c_int32(ptype_value(fmt.is_cif)), _ptr(tr), _ptr(gq),
            _ptr(coded), _ptr(mtype), _ptr(mv), _ptr(cbp), _ptr(levels),
            _ptr(quant_mb), _ptr(n_stuff), _ptr(out), C.c_int64(cap))
        if bits < 0:
            raise RuntimeError("serialize overflow")
        return out[: (bits + 7) // 8].tobytes(), int(bits)

    # -- parse -------------------------------------------------------------

    _RAW_FIELDS = (("fmt", (), np.int32), ("tr", (), np.int32),
                   ("gq", (12,), np.int32), ("coded", (396,), np.uint8),
                   ("intra", (396,), np.uint8), ("mc", (396,), np.uint8),
                   ("fil", (396,), np.uint8), ("quant", (396,), np.int32),
                   ("mv", (396, 2), np.int32), ("cbp", (396,), np.int32),
                   ("levels8", (396, 6, 64), np.int8),
                   ("dc", (396, 6), np.uint8),
                   ("damage", (), np.int32))

    def _raw_parse(self, data: bytes, max_frames: int,
                   resync: bool = False):
        """Invoke p64_parse with adaptively-grown output buffers.

        Starts at min(64, max_frames) frames and grows 4x on overflow --
        eagerly allocating 4096-frame buffers measured ~4 ms per call,
        several times the parse itself for short streams.  Returns
        (n, buffers dict); raises StreamError on parse errors.  Single
        owner of the p64_parse argument-order contract.
        """
        from ..entropy.parse import StreamError
        buf = np.frombuffer(data, np.uint8)
        mf = min(64, max_frames)
        while True:
            out = {name: np.zeros((mf,) + shape, dt)
                   for name, shape, dt in self._RAW_FIELDS}
            errpos = C.c_int64(0)
            n = self._lib.p64_parse(
                C.byref(self._dec_t), _ptr(buf), C.c_int64(len(data)),
                C.c_int64(mf), C.c_int32(1 if resync else 0),
                _ptr(self._perm_cif), _ptr(self._perm_qcif),
                *[_ptr(out[name]) for name, _, _ in self._RAW_FIELDS],
                C.byref(errpos))
            if n == -5 and mf < max_frames:     # P64_ERR_MAXFRAMES
                mf = min(mf * 4, max_frames)
                continue
            break
        if n < 0:
            names = {-1: "no PSC", -2: "bad VLC code", -3: "bad GN",
                     -4: "output overflow", -5: "frame-cap overflow",
                     -6: "forbidden value", -7: "truncated stream",
                     -8: "MV outside picture"}
            raise StreamError(
                f"{names.get(n, 'parse error')} at bit {errpos.value} "
                f"(native code {n})")
        return n, out

    def parse_tensors(self, data: bytes, max_frames: int = 65536,
                      resync: bool = False):
        """Parse a single-format stream straight into stacked arrays.

        Returns (fmt, tr (n,), seq) where seq has the (n, ...) tensors the
        batched device reconstruction consumes (levels/quant/intra/mv/fil,
        with intra/fil already masked by coded).  Skips the per-frame
        ParsedFrame construction, which dominated host parse time for long
        sequences (round-3 decode bench).  Raises StreamError on mixed
        CIF/QCIF.  resync=True enables start-code error recovery (damage
        flags are not surfaced on this path -- uncoded MBs of damaged GOBs
        reconstruct as copy-from-reference, the concealment default).
        """
        from ..entropy.parse import StreamError
        n, out = self._raw_parse(data, max_frames, resync=resync)
        if n == 0:
            raise StreamError("empty stream")
        if not (out["fmt"][:n] == out["fmt"][0]).all():
            raise StreamError("mixed picture formats in one sequence")
        fmt = CIF if out["fmt"][0] else QCIF
        m = fmt.num_mbs
        coded = out["coded"][:n, :m] != 0
        seq = dict(
            # levels stay int8 VIEWS straight out of the C++ engine (plus
            # the uint8 intra-DC sidecar) -- half the width of the old
            # int16 tensor, halving the dominant decode H2D transfer; the
            # device reassembles with one fused add (core/decoder.py
            # _decode_scan).  No eager astype here: densifying a 32-frame
            # CIF stream of mostly-zero data measured a 4x parse slowdown.
            levels8=out["levels8"][:n, :m],
            dc=out["dc"][:n, :m],
            quant=out["quant"][:n, :m],
            intra=(out["intra"][:n, :m] != 0) & coded,
            mv=out["mv"][:n, :m],
            fil=(out["fil"][:n, :m] != 0) & coded,
        )
        return fmt, out["tr"][:n].copy(), seq

    def parse(self, data: bytes, max_frames: int = 65536,
              copy: bool = False, resync: bool = False):
        """Returns list of entropy.parse.ParsedFrame (same contract as the
        Python parser).  resync=True enables start-code error recovery
        (same contract as parse_stream(strict=False): damaged GOBs keep
        their already-decoded MBs and are flagged in damaged/gob_damaged;
        corrupt input never raises).

        Memory note: by default mv/cbp/quant/gquant arrays are VIEWS into
        per-call output buffers (adaptively sized to <= 4x the parsed
        frame count), so retaining any single frame keeps the whole
        call's buffers alive; pass copy=True for independent per-frame
        arrays.  `levels` is the exception since the engine went int8 +
        DC-sidecar (round 5): the ParsedFrame int16 contract requires one
        widening reassembly pass here (~2 bytes/coeff written; the hot
        batched-decode path -- parse_tensors -- keeps zero-copy int8
        views and reassembles on device instead)."""
        from ..entropy.parse import ParsedFrame
        n, out = self._raw_parse(data, max_frames, resync=resync)
        # copy=True compacts each frame's row-slices (NOT the whole 4x
        # overshoot buffers) so retained frames are independent.
        c = (lambda a: a.copy()) if copy else (lambda a: a)
        (out_fmt, out_tr, out_gq, out_coded, out_intra, out_mc, out_fil,
         out_quant, out_mv, out_cbp, out_levels8, out_dc, out_damage) = (
            out[name] for name, _, _ in self._RAW_FIELDS)
        # reassemble the ParsedFrame int16 levels contract (DC in slot 0):
        # one widening astype, then scatter only the DC slots (dc > 0
        # exactly marks parsed intra blocks, range 1..254) -- no dense
        # np.where temporary (round-5 review finding)
        out_levels = out_levels8[:n].astype(np.int16)
        dcn = out_dc[:n]
        dmask = dcn > 0
        out_levels[..., 0][dmask] = dcn[dmask]
        frames = []
        for f in range(n):
            fmt = CIF if out_fmt[f] else QCIF
            m = fmt.num_mbs
            # levels/mv/etc are VIEWS into the per-call output buffers, not
            # copies: sparse streams made the per-frame 304 KB levels copy
            # the decode path's single largest host cost (round-3 decode
            # bench: ~60 of 112 ms for 512 CIF frames).  The buffers are
            # calloc-backed, so untouched frames cost no resident memory,
            # and each call allocates fresh buffers (no cross-call
            # aliasing); rows are disjoint across frames.
            dmg = int(out_damage[f])
            frames.append(ParsedFrame(
                tr=int(out_tr[f]), fmt=fmt,
                gquant=c(out_gq[f, :fmt.num_gobs]),
                coded=out_coded[f, :m].astype(bool),
                intra=out_intra[f, :m].astype(bool),
                mc=out_mc[f, :m].astype(bool),
                fil=out_fil[f, :m].astype(bool),
                quant=c(out_quant[f, :m]),
                mv=c(out_mv[f, :m]),
                cbp=c(out_cbp[f, :m]),
                levels=c(out_levels[f, :m]),
                damaged=bool(dmg >> 15 & 1),
                gob_damaged=(
                    (dmg >> np.arange(fmt.num_gobs)) & 1).astype(bool)))
        return frames


_cached: Optional[NativeBitIO] = None
_tried = False
_load_lock = threading.Lock()


def load() -> Optional[NativeBitIO]:
    """Load (building if needed) the native engine; None if unavailable.

    Thread-safe: parse_many / serialize_streams fan first-use calls across
    a thread pool, and concurrent unsynchronized `make` runs could link a
    corrupted .so (round-3 review finding)."""
    global _cached, _tried
    if _cached is not None or _tried:
        return _cached
    with _load_lock:
        if _cached is not None or _tried:
            return _cached
        # invoke make when possible: timestamp-based and near-free when
        # current, and it prevents running a stale .so after an ABI change
        # to bitio.cpp.  If the build fails (no toolchain, read-only dir)
        # but a prebuilt .so exists, still try to load it.
        # NOTE: _tried is set only AFTER the attempt completes -- setting
        # it first would let a concurrent caller's unlocked fast path see
        # _tried=True with _cached still None mid-build and silently fall
        # back to the ~100x slower Python engine (round-4 review finding).
        try:
            if not _build() and not os.path.exists(_SO):
                return None
            try:
                _cached = NativeBitIO(C.CDLL(_SO))
            except OSError:
                return None
            return _cached
        finally:
            _tried = True
