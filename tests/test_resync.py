"""Decoder start-code resync (round-4 verdict item 2): corrupted or
mid-stream-joined input must decode everything undamaged, with the Python
oracle and the C++ engine agreeing bit-for-bit on arbitrary corrupt input
(parse_stream(strict=False) == native.parse(resync=True)).

The reference decoder scans forward for the next PSC/GBSC on damage
(SURVEY section 3b "loop: mropen stream; scan for PSC"); strict mode --
the default everywhere in tests -- still rejects at the first error.
"""

import numpy as np
import pytest

from helpers import random_frame_symbols
from p64tpu.entropy import encode, parse
from p64tpu.entropy.bitio import BitReader
from p64tpu.native import load
from p64tpu.spec.constants import QCIF

native = load()

FIELDS = ("gquant", "coded", "intra", "mc", "fil", "quant", "mv", "cbp",
          "levels", "gob_damaged")


def _stream(seed=5, t=4, **kw):
    rng = np.random.default_rng(seed)
    frames = [random_frame_symbols(QCIF, rng, tr=k, **kw) for k in range(t)]
    data, _ = encode.serialize_sequence(QCIF, frames)
    return data


def _assert_equal_frames(a, b, msg=""):
    assert a.fmt is b.fmt and a.tr == b.tr, msg
    assert bool(a.damaged) == bool(b.damaged), msg
    for f in FIELDS:
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f),
                                      err_msg=f"{msg}:{f}")


def _both(data: bytes):
    """Resync-parse with both engines, assert they agree, return frames."""
    fp = parse.parse_stream(data, strict=False)
    if native is not None:
        fn = native.parse(data, resync=True)
        assert len(fp) == len(fn)
        for i, (a, b) in enumerate(zip(fp, fn)):
            _assert_equal_frames(a, b, f"engine disagreement frame {i}")
    return fp


def _start_codes(data: bytes):
    """(bit_pos, gn) of every start code in a clean stream."""
    r = BitReader(data)
    out = []
    while parse._scan_start_code(r):
        pos = r.pos
        r.skip(16)
        out.append((pos, r.read(4)))
    return out


def test_resync_equals_strict_on_clean_stream():
    data = _stream()
    clean = parse.parse_stream(data)
    got = _both(data)
    assert len(got) == len(clean)
    for a, b in zip(clean, got):
        assert not b.damaged and not b.gob_damaged.any()
        for f in ("gquant", "coded", "intra", "mc", "fil", "quant", "mv",
                  "cbp", "levels"):
            np.testing.assert_array_equal(getattr(a, f), getattr(b, f))


def test_resync_single_damaged_gob_keeps_everything_else():
    """Zero out one GOB's GQUANT (forbidden value -> guaranteed damage) in
    frame 1: exactly that GOB is flagged, its already-decoded MBs stay
    uncoded-or-kept, and every other frame parses IDENTICAL to the clean
    parse.  One flipped region no longer destroys the remaining frames."""
    data = _stream()
    clean = parse.parse_stream(data)
    codes = _start_codes(data)
    # GOB start codes of frame 1: after the second PSC (gn == 0)
    psc_idx = [i for i, (_, gn) in enumerate(codes) if gn == 0]
    target_idx = psc_idx[1] + 1          # first GOB of frame 1
    pos, gn = codes[target_idx]
    assert gn != 0
    gi = {1: 0, 3: 1, 5: 2}[int(gn)]
    bad = bytearray(data)
    for bit in range(pos + 20, pos + 25):   # the 5 GQUANT bits -> 0
        bad[bit // 8] &= ~(0x80 >> (bit % 8))
    frames = _both(bytes(bad))
    assert len(frames) == len(clean)
    for k, (a, b) in enumerate(zip(clean, frames)):
        if k != 1:
            assert not b.damaged and not b.gob_damaged.any()
            _assert_equal_frames(
                b, a.__class__(**{**a.__dict__,
                                  "gob_damaged": np.zeros(a.fmt.num_gobs,
                                                          bool)}),
                f"frame {k}")
    dmg = frames[1]
    assert dmg.damaged and dmg.gob_damaged[gi]
    assert not dmg.gob_damaged[[i for i in range(3) if i != gi]].any()
    # the other two GOBs of frame 1 must carry exactly the clean symbols
    from p64tpu.core.blocks import transmission_order
    perm = transmission_order(QCIF).reshape(3, 33)
    for other in range(3):
        if other == gi:
            continue
        mbs = perm[other]
        np.testing.assert_array_equal(dmg.levels[mbs], clean[1].levels[mbs])
        np.testing.assert_array_equal(dmg.coded[mbs], clean[1].coded[mbs])
    # strict mode still rejects the same stream
    with pytest.raises(parse.StreamError):
        parse.parse_stream(bytes(bad))


def test_resync_mid_stream_join():
    """Garbage + a byte-aligned valid stream (a join mid-transmission):
    resync finds the PSC and decodes stream B completely and cleanly."""
    b_data = _stream(seed=9, t=3)
    clean_b = parse.parse_stream(b_data)
    joined = b"\xaa\x55\xfe" * 40 + b_data
    frames = _both(joined)
    # everything from B parses; the garbage may or may not synthesize a
    # leading damaged picture, but B's pictures must all be at the tail
    assert len(frames) >= len(clean_b)
    tail = frames[len(frames) - len(clean_b):]
    for a, b in zip(clean_b, tail):
        assert not b.damaged
        for f in ("gquant", "coded", "intra", "mc", "fil", "quant", "mv",
                  "cbp", "levels"):
            np.testing.assert_array_equal(getattr(a, f), getattr(b, f))
    # strict mode rejects (no PSC at bit 0)
    with pytest.raises(parse.StreamError):
        parse.parse_stream(joined)


@pytest.mark.parametrize("seed", range(6))
def test_resync_bitflip_engines_agree(seed):
    """Random bit flips at every layer: resync never raises, outputs stay
    in-range, and both engines agree exactly (incl. damage flags)."""
    rng = np.random.default_rng(seed)
    data = _stream(seed=11, t=3, p_mquant=0.2)
    for trial in range(12):
        bad = bytearray(data)
        for _ in range(1 + trial % 5):
            p = int(rng.integers(0, len(bad)))
            bad[p] ^= 1 << int(rng.integers(0, 8))
        frames = _both(bytes(bad))
        for f in frames:
            assert np.abs(f.mv).max(initial=0) <= 15
            assert (f.quant[f.coded] >= 1).all()


@pytest.mark.parametrize("kind", ["truncated", "garbage", "empty", "zeros"])
def test_resync_never_raises(kind):
    data = _stream(seed=3, t=2)
    cases = dict(truncated=data[: len(data) // 2],
                 garbage=b"\xff\x55" * 200,
                 empty=b"",
                 zeros=b"\x00" * 64)
    frames = _both(cases[kind])
    assert isinstance(frames, list)


def test_resync_decode_conceals(tmp_path):
    """End-to-end: a corrupted stream decodes under resync with all frames
    present; the frame BEFORE the damage is bit-identical to the clean
    decode (damage cannot propagate backwards), and the CLI's --resync
    flag drives the same path (strict decode of the same file fails)."""
    import jax

    from p64tpu.cli import main
    from p64tpu.core import encoder as enc
    from p64tpu.core.decoder import decode_stream

    rng = np.random.default_rng(17)
    y = rng.integers(0, 256, (4, 144, 176), np.uint8)
    frames_in = dict(y=y, cb=y[:, ::2, ::2], cr=y[:, 1::2, ::2])
    cfg = enc.EncoderConfig(fmt=QCIF, search=2)
    import jax.numpy as jnp
    data, _, _ = enc.encode_to_bytes(
        cfg, {k: jnp.asarray(v) for k, v in frames_in.items()})

    codes = _start_codes(data)
    psc_idx = [i for i, (_, gn) in enumerate(codes) if gn == 0]
    pos, gn = codes[psc_idx[2] + 1]      # first GOB of frame 2
    bad = bytearray(data)
    for bit in range(pos + 20, pos + 25):
        bad[bit // 8] &= ~(0x80 >> (bit % 8))

    y_c, cb_c, cr_c, parsed_c = decode_stream(data)
    y_d, cb_d, cr_d, parsed_d = decode_stream(bytes(bad), resync=True)
    assert y_d.shape == y_c.shape
    assert [p.damaged for p in parsed_d] == [False, False, True, False]
    np.testing.assert_array_equal(y_d[:2], y_c[:2])
    np.testing.assert_array_equal(cb_d[:2], cb_c[:2])

    # CLI round trip
    sp = tmp_path / "bad.p64"
    sp.write_bytes(bytes(bad))
    out = tmp_path / "dec.y4m"
    assert main(["-d", "-s", str(sp), "-o", str(out)]) == 1        # strict
    assert main(["-d", "-e", "-s", str(sp), "-o", str(out)]) == 0  # resync
    assert out.exists()


def test_resync_partial_intra_dc_survives_both_decode_paths():
    """Round-5 review finding: a damaged partial intra MB can keep a DC
    of 128..254 in levels slot 0 with coded=False; the ParsedFrame ->
    split_levels path used to wrap it in the int8 cast (up to 59 gray
    levels of divergence from the native sidecar path on the SAME
    stream).  Both decode paths must produce identical planes, and the
    fixture must actually contain such a DC."""
    import jax.numpy as jnp

    from p64tpu.core import encoder as enc
    from p64tpu.core.decoder import decode_seq, decode_stream, parse_to_tensors

    rng = np.random.default_rng(2)
    found = None
    for trial in range(400):
        y = rng.integers(150, 256, (2, 144, 176), np.uint8)  # bright -> DC>127
        frames_in = dict(y=y, cb=y[:, ::2, ::2], cr=y[:, 1::2, ::2])
        cfg = enc.EncoderConfig(fmt=QCIF, search=0, intra_only=True)
        data, _, _ = enc.encode_to_bytes(
            cfg, {k: jnp.asarray(v) for k, v in frames_in.items()})
        bad = bytearray(data)
        p = int(rng.integers(40, len(bad)))
        bad[p] ^= 1 << int(rng.integers(0, 8))
        parsed = _both(bytes(bad))
        for f in parsed:
            partial = ~(f.intra & f.coded)
            if (partial[:, None] & (f.levels[..., 0] > 127)).any():
                found = bytes(bad)
                break
        if found:
            break
    assert found is not None, "no trial produced a partial DC > 127; retune"

    y1, cb1, cr1, _ = decode_stream(found, resync=True)   # ParsedFrame path
    fmt, _, seq = parse_to_tensors(found, resync=True)    # sidecar path
    y2, cb2, cr2 = decode_seq(fmt, seq)
    np.testing.assert_array_equal(y1, y2)
    np.testing.assert_array_equal(cb1, cb2)
    np.testing.assert_array_equal(cr1, cr2)


def test_resync_mixed_format_stream_and_ptype_flip():
    """A QCIF sequence concatenated with a CIF sequence (legal: each
    picture header carries its own PTYPE) must parse identically in both
    engines under resync, with the per-picture format/GOB-mapping rebound
    at each header.  Also: flipping the PTYPE format bit of a QCIF frame
    (making the parser read its GOBs as CIF) must keep both engines in
    exact agreement -- format confusion is a realistic corruption mode."""
    from p64tpu.spec.constants import CIF

    qcif = _stream(seed=5, t=2)
    rng = np.random.default_rng(31)
    cif_frames = [random_frame_symbols(CIF, rng, tr=t, p_coded=0.1)
                  for t in range(2)]
    cif, _ = encode.serialize_sequence(CIF, cif_frames)

    joined = qcif + cif
    frames = _both(joined)
    clean = parse.parse_stream(qcif) + parse.parse_stream(cif)
    assert [f.fmt.name for f in frames] == [f.fmt.name for f in clean] \
        == ["QCIF", "QCIF", "CIF", "CIF"]
    for k, (a, b) in enumerate(zip(clean, frames)):
        # the QCIF tail's byte-pad zeros sit in front of the CIF PSC, so
        # the last QCIF frame legitimately takes a damage flag when the
        # pad is non-empty (undecodable MBA data) -- its SYMBOLS must
        # still equal the clean parse exactly (the error strikes after
        # every real MB parsed); all other frames must be undamaged
        if k != 1:
            assert not b.damaged
        np.testing.assert_array_equal(a.levels, b.levels)
        np.testing.assert_array_equal(a.coded, b.coded)
        np.testing.assert_array_equal(a.mv, b.mv)

    # PTYPE format-bit flips at each picture header (bit 4 of PTYPE =
    # stream bit 25+ after each PSC start): engines must agree exactly
    codes = _start_codes(qcif)
    for pos, gn in codes:
        if gn != 0:
            continue
        bad = bytearray(qcif)
        bit = pos + 20 + 5 + 3          # PSC(20) + TR(5) + 4th PTYPE bit
        bad[bit // 8] ^= (0x80 >> (bit % 8))
        _both(bytes(bad))               # asserts engine agreement inside


def _bit_splice(parts):
    """Concatenate (data, start_bit, end_bit) ranges at the BIT level."""
    from p64tpu.entropy.bitio import BitWriter

    w = BitWriter()
    for data, start, end in parts:
        bits = np.unpackbits(np.frombuffer(data, np.uint8))[start:end]
        s = "".join("1" if b else "0" for b in bits)
        for i in range(0, len(s), 32):       # put() caps at 64 bits
            w.put_str(s[i:i + 32])
    return w.getvalue()


def test_resync_reparsed_block_last_writer_wins():
    """Deep-fuzz finding (round 5): resync can parse the same (MB, block)
    TWICE (a spliced stream carrying a duplicate GN), and the native
    engine's split slot-0 representation (levels8[0] + DC sidecar) kept a
    STALE intra DC that overrode a later inter coefficient at reassembly
    -- the Python oracle's single int16 cell takes the last writer.  Both
    orders (intra-then-inter, inter-then-intra) must agree across engines
    now, with slot 0 equal to the last writer's value."""
    from p64tpu.entropy.encode import FrameSymbols

    def one_mb_stream(intra: bool, level: int):
        n = QCIF.num_mbs
        levels = np.zeros((n, 6, 64), np.int16)
        if intra:
            levels[0, :, 0] = level            # DC > 127 exercises the wrap
            mtype, cbp = 0, 63
            f = FrameSymbols(
                tr=0, gquant=np.full(3, 8, np.int32),
                coded=np.eye(1, n, 0, dtype=bool)[0],
                mtype=np.full(n, mtype, np.int32),
                mv=np.zeros((n, 2), np.int32),
                cbp=np.full(n, cbp, np.int32), levels=levels)
        else:
            levels[0, 0, 0] = level            # run-0 first coefficient
            from p64tpu.spec.tables import MTYPE_BY_NAME
            f = FrameSymbols(
                tr=0, gquant=np.full(3, 8, np.int32),
                coded=np.eye(1, n, 0, dtype=bool)[0],
                mtype=np.full(n, MTYPE_BY_NAME["inter"], np.int32),
                mv=np.zeros((n, 2), np.int32),
                cbp=np.full(n, 32, np.int32), levels=levels)
        data, nbits = encode.serialize_sequence(QCIF, [f])
        return data, nbits

    from p64tpu.spec.tables import MTYPE_BY_NAME
    a, a_bits = one_mb_stream(True, 200)       # intra, DC 200
    b, b_bits = one_mb_stream(False, 52)       # inter, slot0 level 52
    for first, second, want in ((a, b, 52), (b, a, 200)):
        f_bits = int(np.unpackbits(np.frombuffer(first, np.uint8)).size)
        codes_2 = _start_codes(second)
        gob_start = next(p for p, gn in codes_2 if gn != 0)
        s_bits = int(np.unpackbits(np.frombuffer(second, np.uint8)).size)
        # first stream in full (its own pad) + second stream's GOB section
        spliced = _bit_splice([
            (first, 0, (len(first) * 8)),
            (second, gob_start, len(second) * 8),
        ])
        frames = _both(spliced)
        assert len(frames) == 1
        assert int(frames[0].levels[0, 0, 0]) == want, (
            f"slot0 last-writer: want {want}, got "
            f"{int(frames[0].levels[0, 0, 0])}")


def test_resync_gquant_recorded_before_truncated_gei():
    """Fresh-seed fuzz finding (round 5): with the stream ending exactly
    after GQUANT, the oracle records GQUANT and then fails reading the
    GEI flag -- the native engine's combined GQUANT+flag truncation
    guard left out_gquant unwritten, diverging the resync outputs.  The
    GOB-header guards are now per-read; both engines must keep
    gquant[0] on this crafted stream (PSC + 7 PEI spares + GBSC + GN=1 +
    GQUANT=12 = exactly 15 bytes)."""
    from p64tpu.entropy.bitio import BitWriter

    w = BitWriter()
    w.put_str("0000000000000001" + "0000")    # PSC
    w.put_str("00000")                        # TR
    w.put_str("001000")                       # PTYPE (QCIF)
    for _ in range(7):                        # 7 PEI spares -> byte-flush
        w.put_str("1" + "10100101")
    w.put_str("0")                            # PEI = 0
    w.put_str("0000000000000001" + "0001")    # GBSC + GN=1
    w.put_str("01100")                        # GQUANT = 12
    data = w.getvalue()
    assert len(data) * 8 == w.nbits == 120    # flush: GEI flag is past EOF

    frames = _both(data)                      # engines must agree exactly
    assert len(frames) == 1
    assert frames[0].damaged and frames[0].gob_damaged[0]
    assert int(frames[0].gquant[0]) == 12
    with pytest.raises(parse.StreamError):
        parse.parse_stream(data)              # strict still rejects
