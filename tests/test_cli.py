"""CLI end-to-end: encode/decode through the argparse surface (CPU)."""

import numpy as np

from p64tpu.cli import main
from p64tpu.io import yuv
from p64tpu.spec.constants import QCIF
from p64tpu.stats import psnr

RNG = np.random.default_rng(4)


def _write_y4m(path, t=3):
    h, w = QCIF.height, QCIF.width
    y = (RNG.integers(0, 64, (t, h, w)) + 96).astype(np.uint8)
    frames = dict(y=y, cb=y[:, ::2, ::2], cr=y[:, 1::2, ::2])
    yuv.write_y4m(str(path), frames)
    return frames


def test_cli_encode_decode_roundtrip(tmp_path, capsys):
    inp = tmp_path / "in.y4m"
    stream = tmp_path / "out.p64"
    dec = tmp_path / "dec.y4m"
    src = _write_y4m(inp)
    assert main(["-s", str(stream), "-q", "8", str(inp)]) == 0
    assert stream.stat().st_size > 0
    assert main(["-d", "-s", str(stream), "-o", str(dec)]) == 0
    out, _ = yuv.read_y4m(str(dec))
    assert out["y"].shape == src["y"].shape
    assert psnr(out["y"], src["y"]) > 30


def test_cli_rate_mode_and_pvrg_output(tmp_path):
    inp = tmp_path / "in.y4m"
    stream = tmp_path / "o.p64"
    _write_y4m(inp, t=2)
    assert main(["-s", str(stream), "-r", "800000", str(inp)]) == 0
    prefix = str(tmp_path / "fr_")
    assert main(["-d", "-s", str(stream), "-o", prefix]) == 0
    got = yuv.read_pvrg(prefix, QCIF, 0, 0)
    assert got["y"].shape == (1, QCIF.height, QCIF.width)


def test_cli_bad_stream(tmp_path):
    bad = tmp_path / "bad.p64"
    bad.write_bytes(b"\xff" * 32)
    assert main(["-d", "-s", str(bad), "-o", str(tmp_path / "x.y4m")]) == 1


def test_cli_rejects_bad_flags(tmp_path, capsys):
    inp = tmp_path / "in.y4m"
    _write_y4m(inp, t=1)
    stream = str(tmp_path / "o.p64")
    # -q outside 1..31 (0 would emit the forbidden GQUANT=0)
    assert main(["-s", stream, "-q", "0", str(inp)]) == 2
    assert main(["-s", stream, "-q", "32", str(inp)]) == 2
    # -i outside 0..15 (H.261 MV range; select sweep is hardwired to +/-15)
    assert main(["-s", stream, "-i", "16", str(inp)]) == 2
    assert main(["-s", stream, "-i", "-1", str(inp)]) == 2
    # negative rate / nonpositive frame rate / bad range
    assert main(["-s", stream, "-r", "-5", str(inp)]) == 2
    assert main(["-s", stream, "-f", "0", str(inp)]) == 2
    assert main(["-s", stream, "-a", "3", "-b", "1", str(inp)]) == 2
    err = capsys.readouterr().err
    assert "1..31" in err and "0..15" in err


def test_cli_y4m_format_mismatch(tmp_path, capsys):
    inp = tmp_path / "in.y4m"
    _write_y4m(inp, t=1)   # QCIF content
    stream = str(tmp_path / "o.p64")
    assert main(["-s", stream, "-x", "CIF", str(inp)]) == 2
    assert "QCIF" in capsys.readouterr().err


def test_cli_missing_input_file(tmp_path, capsys):
    assert main(["-s", str(tmp_path / "o.p64"),
                 str(tmp_path / "nope.y4m")]) == 2


def test_cli_decode_psnr_vs_source(tmp_path, capsys):
    inp = tmp_path / "in.y4m"
    stream = tmp_path / "out.p64"
    dec = tmp_path / "dec.y4m"
    _write_y4m(inp, t=2)
    assert main(["-s", str(stream), "-q", "8", str(inp)]) == 0
    capsys.readouterr()
    assert main(["-d", "-s", str(stream), "-o", str(dec), str(inp)]) == 0
    out = capsys.readouterr().out
    assert "sequence Y PSNR" in out and "dB" in out


def test_batch_decode_roundtrip(tmp_path):
    """batch_decode mirrors batch_encode: encode N streams, batch-decode
    them, outputs must equal the encoder's reconstruction."""
    import numpy as np

    from p64tpu.control.ratecontrol import RateConfig
    from p64tpu.core import encoder as enc
    from p64tpu.io.yuv import read_y4m
    from p64tpu.spec.constants import QCIF
    from p64tpu.tools.batch_decode import main as bd_main

    rng = np.random.default_rng(61)
    import jax.numpy as jnp
    outs = []
    for s in range(3):
        y = (rng.integers(0, 256, (2, 144, 176)) // 2 + 32).astype(np.uint8)
        frames = dict(
            y=jnp.asarray(y),
            cb=jnp.asarray((y[:, ::2, ::2] // 2 + 64).astype(np.uint8)),
            cr=jnp.asarray((255 - y[:, 1::2, ::2] // 2).astype(np.uint8)))
        cfg = enc.EncoderConfig(fmt=QCIF,
                                rate=RateConfig(fixed_quant=10))
        data, _, state = enc.encode_to_bytes(cfg, frames)
        p = tmp_path / f"s{s}.p64"
        p.write_bytes(data)
        outs.append((p, np.asarray(state["ref_y"])))

    rc = bd_main([str(p) for p, _ in outs]
                 + ["-o", str(tmp_path / "dec")])
    assert rc == 0
    for p, want_last_y in outs:
        d, _ = read_y4m(str(tmp_path / "dec" / (p.stem + ".y4m")))
        np.testing.assert_array_equal(d["y"][-1], want_last_y)

    # error path: garbage input
    bad = tmp_path / "bad.p64"
    bad.write_bytes(b"\xff" * 64)
    assert bd_main([str(bad), "-o", str(tmp_path / "dec2")]) == 1


def test_batch_decode_mixed_lengths(tmp_path):
    """Streams of different frame counts decode in per-shape groups (one
    vmapped dispatch per group, singletons via the scalar path) with
    outputs identical to per-stream decode."""
    import numpy as np

    import jax.numpy as jnp
    from p64tpu.control.ratecontrol import RateConfig
    from p64tpu.core import encoder as enc
    from p64tpu.core.decoder import decode_stream
    from p64tpu.io.yuv import read_y4m
    from p64tpu.spec.constants import QCIF
    from p64tpu.tools.batch_decode import main as bd_main

    rng = np.random.default_rng(71)
    paths = []
    for s, t in enumerate((2, 2, 3)):     # one pair + one singleton group
        y = (rng.integers(0, 256, (t, 144, 176)) // 2 + 32).astype(np.uint8)
        frames = dict(
            y=jnp.asarray(y),
            cb=jnp.asarray((y[:, ::2, ::2] // 2 + 64).astype(np.uint8)),
            cr=jnp.asarray((255 - y[:, 1::2, ::2] // 2).astype(np.uint8)))
        cfg = enc.EncoderConfig(fmt=QCIF, rate=RateConfig(fixed_quant=9))
        data, _, _ = enc.encode_to_bytes(cfg, frames)
        p = tmp_path / f"m{s}.p64"
        p.write_bytes(data)
        paths.append(p)

    assert bd_main([str(p) for p in paths]
                   + ["-o", str(tmp_path / "dec")]) == 0
    for p in paths:
        want_y, _, _, _ = decode_stream(p.read_bytes())
        got, _ = read_y4m(str(tmp_path / "dec" / (p.stem + ".y4m")))
        np.testing.assert_array_equal(got["y"], np.asarray(want_y))


def test_frame_range_selects_inclusive_slice(tmp_path):
    """-a/-b encode exactly frames [a, b] of the input: the bitstream must
    equal encoding a file containing only that slice."""
    full = tmp_path / "full.y4m"
    frames = _write_y4m(full, t=6)
    part = tmp_path / "part.y4m"
    yuv.write_y4m(str(part), {k: v[2:5] for k, v in frames.items()})
    s_rng = tmp_path / "rng.p64"
    s_pre = tmp_path / "pre.p64"
    assert main(["-s", str(s_rng), "-q", "9", "-a", "2", "-b", "4",
                 str(full)]) == 0
    assert main(["-s", str(s_pre), "-q", "9", str(part)]) == 0
    assert s_rng.read_bytes() == s_pre.read_bytes()


def test_no_filter_flag_disables_fil_mtypes(tmp_path):
    """-l/--no-filter must produce a stream containing no FIL MTYPEs
    (and a different bitstream when the filtered encode used them)."""
    from p64tpu.entropy.parse import parse_stream
    from p64tpu.spec import luts

    inp = tmp_path / "in.y4m"
    h, w = QCIF.height, QCIF.width
    # smooth moving content: MC with filter is normally chosen
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 2 + yy) % 160 + 40).astype(np.int32)
    ys = []
    for t in range(3):
        f = base.copy()
        f[40:80, 30 + 6 * t:70 + 6 * t] += 60
        ys.append(np.clip(f + RNG.integers(0, 6, (h, w)), 0, 255))
    y = np.stack(ys).astype(np.uint8)
    yuv.write_y4m(str(inp), dict(y=y, cb=y[:, ::2, ::2],
                                 cr=y[:, 1::2, ::2]))
    s_fil = tmp_path / "fil.p64"
    s_nof = tmp_path / "nof.p64"
    assert main(["-s", str(s_fil), "-q", "10", str(inp)]) == 0
    assert main(["-s", str(s_nof), "-q", "10", "-l", str(inp)]) == 0

    def fil_count(p):
        frames = parse_stream(p.read_bytes())
        return sum(int(f.fil.sum()) for f in frames)

    assert fil_count(s_fil) > 0, "fixture no longer triggers the filter"
    assert fil_count(s_nof) == 0
    assert s_fil.read_bytes() != s_nof.read_bytes()
