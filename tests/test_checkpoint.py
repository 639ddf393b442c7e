"""Checkpoint/resume: an interrupted encode resumed from a checkpoint must
produce a bitstream byte-identical to the uninterrupted run."""

import numpy as np

import jax.numpy as jnp

from p64tpu.control.ratecontrol import RateConfig
from p64tpu.core import encoder as enc
from p64tpu.entropy.encode import serialize_sequence
from p64tpu.io import checkpoint
from p64tpu.spec.constants import QCIF

RNG = np.random.default_rng(21)


def _frames(t, fmt=QCIF):
    h, w = fmt.height, fmt.width
    y = (RNG.integers(0, 256, (t, h, w), dtype=np.uint8) // 3 + 80).astype(
        np.uint8)
    return dict(y=jnp.asarray(y),
                cb=jnp.asarray(y[:, ::2, ::2]),
                cr=jnp.asarray(y[:, 1::2, ::2]))


def test_resume_bitstream_identical(tmp_path):
    cfg = enc.EncoderConfig(fmt=QCIF, search=3,
                            rate=RateConfig(bit_rate=200_000))
    frames = _frames(6)

    # uninterrupted run
    data_full, out_full, _ = enc.encode_to_bytes(cfg, frames)

    # run 1: first 3 frames
    half1 = {k: v[:3] for k, v in frames.items()}
    st1, out1 = enc.encode_sequence_jit(cfg, half1, enc.init_state(cfg))
    syms1 = enc.outputs_to_symbols(cfg, out1)
    bytes1, bits1 = serialize_sequence(cfg.fmt, syms1)
    ck = str(tmp_path / "ck")
    checkpoint.save(ck, st1, streams=[bytes1], meta={"frames_done": 3})

    # "new process": resume
    st_loaded, streams, meta = checkpoint.load(ck)
    assert meta["frames_done"] == 3
    half2 = {k: v[3:] for k, v in frames.items()}
    st2, out2 = enc.encode_sequence_jit(cfg, half2, st_loaded)
    syms2 = enc.outputs_to_symbols(cfg, out2)
    bytes2, bits2 = serialize_sequence(cfg.fmt, syms2)

    # bit-level concatenation: both halves were byte-aligned only at their
    # end; full-run equality needs bit-level concat.  Our serializer pads
    # only at the very end, so compare via symbols instead when bits1 is
    # not byte-aligned; here we check the strong property on the symbol
    # stream and the weak (prefix) property on bytes.
    total_bits_full = int(np.asarray(out_full["total_bits"]).sum())
    assert bits1 + bits2 == total_bits_full
    if bits1 % 8 == 0:
        assert streams[0] + bytes2 == data_full
    else:
        assert data_full[: bits1 // 8] == streams[0][: bits1 // 8]

    # device state equality => all later frames encode identically
    # (n_stuff included: minimum-rate fill depends on the carried buffer)
    for k in ("coded", "mtype", "mv", "cbp", "levels8", "dc_intra", "gquant",
              "n_stuff"):
        np.testing.assert_array_equal(
            np.asarray(out2[k]), np.asarray(out_full[k])[3:], err_msg=k)


def test_state_only_save_removes_stale_bits(tmp_path):
    """A state-only save must not leave previous stream bytes visible:
    load() would pair new state with old stream bytes and the resumed
    bitstream would silently duplicate frames (round-4 review finding;
    structurally impossible since the round-5 single-file layout, but the
    behavior stays pinned).  Also checks no .tmp litter survives and that
    stale pre-round-5 companion files (.bits/.json) are cleaned up."""
    import os

    import jax.numpy as jnp

    from p64tpu.io import checkpoint

    ck = str(tmp_path / "ck")
    state = dict(frame_idx=jnp.asarray([3, 3]),
                 buffer=jnp.asarray([7, 9]))
    # simulate leftovers from the old three-file layout
    open(ck + ".bits", "wb").close()
    open(ck + ".json", "w").close()
    checkpoint.save(ck, state, streams=[b"abc", b"defg"])
    st, streams, _ = checkpoint.load(ck)
    assert streams == [b"abc", b"defg"]
    assert not os.path.exists(ck + ".bits")
    assert not os.path.exists(ck + ".json")

    checkpoint.save(ck, state)            # state-only
    st, streams, _ = checkpoint.load(ck)
    assert streams == []                  # stale stream bytes must be gone
    assert not any(f.endswith(".tmp") or ".tmp." in f
                   for f in os.listdir(tmp_path))


def test_interrupted_save_leaves_old_checkpoint_loadable(tmp_path):
    """A crash mid-save (temp file written but never published) must leave
    the previous checkpoint fully intact -- the single-file design's whole
    point.  A lingering temp must also not confuse a later save/load."""
    import jax.numpy as jnp

    from p64tpu.io import checkpoint

    ck = str(tmp_path / "ck")
    state1 = dict(frame_idx=jnp.asarray([1]))
    checkpoint.save(ck, state1, streams=[b"v1"], meta={"v": 1})
    # simulate a crash: a half-written temp from a newer save attempt
    with open(ck + ".npz.tmp.npz", "wb") as f:
        f.write(b"garbage not an npz")
    st, streams, meta = checkpoint.load(ck)
    assert streams == [b"v1"] and meta == {"v": 1}
    assert int(st["frame_idx"][0]) == 1
    # and a subsequent good save simply wins
    checkpoint.save(ck, dict(frame_idx=jnp.asarray([2])), streams=[b"v2"])
    st, streams, _ = checkpoint.load(ck)
    assert streams == [b"v2"] and int(st["frame_idx"][0]) == 2


def test_load_rejects_pre_round5_layout(tmp_path):
    """A checkpoint whose .npz has bare state keys (the old three-file
    layout) must raise loudly instead of silently loading empty state
    (round-5 review finding: a resume would have re-encoded from frame 0
    and discarded the streams-so-far)."""
    import pytest

    ck = str(tmp_path / "old")
    np.savez_compressed(ck + ".npz", frame_idx=np.asarray([3]),
                        buffer=np.asarray([7]))
    with pytest.raises(ValueError, match="pre-round-5"):
        checkpoint.load(ck)
