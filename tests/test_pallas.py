"""Pallas kernel parity vs the XLA reference implementations (interpret mode
on CPU; the same kernels compile for real TPU -- exercised by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from p64tpu.kernels import me, me_pallas

RNG = np.random.default_rng(5)


@pytest.mark.parametrize("h,w,s", [(48, 64, 4), (144, 176, 7)])
def test_sad_map_parity(h, w, s):
    cur = jnp.asarray(RNG.integers(0, 256, (h, w)), jnp.int32)
    ref = jnp.asarray(RNG.integers(0, 256, (h, w)), jnp.int32)
    want = np.asarray(me.sad_map(cur, ref, s))
    got = np.asarray(me_pallas.sad_map_pallas(cur, ref, s, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("h,w,s", [(48, 64, 4), (144, 176, 7)])
def test_sad_map_bf16_parity(h, w, s):
    cur = jnp.asarray(RNG.integers(0, 256, (h, w)), jnp.int32)
    ref = jnp.asarray(RNG.integers(0, 256, (h, w)), jnp.int32)
    want = np.asarray(me.sad_map(cur, ref, s))
    got = np.asarray(me_pallas.sad_map_pallas_bf16(cur, ref, s,
                                                   interpret=True))
    np.testing.assert_array_equal(got, want)


def test_sad_map_bf16_near_identical_planes():
    # small residuals + flat regions: exactness of the bf16 path where the
    # integers are small and ties abound
    h, w, s = 144, 176, 7
    base = RNG.integers(0, 256, (h, w))
    base[32:96, 32:128] = 77
    cur = jnp.asarray(base, jnp.int32)
    ref = jnp.asarray(np.clip(base + RNG.integers(-2, 3, (h, w)), 0, 255),
                      jnp.int32)
    want = np.asarray(me.sad_map(cur, ref, s))
    got = np.asarray(me_pallas.sad_map_pallas_bf16(cur, ref, s,
                                                   interpret=True))
    np.testing.assert_array_equal(got, want)


def test_full_search_parity_including_tiebreaks():
    # identical frames: every SAD within range ties at many offsets in flat
    # regions -- argmin scan order must match exactly
    h, w, s = 48, 64, 4
    base = RNG.integers(0, 256, (h, w))
    base[16:32, 16:48] = 128  # flat patch -> guaranteed ties
    cur = jnp.asarray(base, jnp.int32)
    ref = jnp.asarray(np.roll(base, 2, axis=1), jnp.int32)
    mv1, b1, s01 = me.full_search(cur, ref, s)
    mv2, b2, s02 = me_pallas.full_search_pallas(cur, ref, s, interpret=True)
    np.testing.assert_array_equal(np.asarray(mv1), np.asarray(mv2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(s01), np.asarray(s02))


def test_sad_map_vmap():
    h, w, s = 48, 64, 3
    cur = jnp.asarray(RNG.integers(0, 256, (2, h, w)), jnp.int32)
    ref = jnp.asarray(RNG.integers(0, 256, (2, h, w)), jnp.int32)
    got = jax.vmap(lambda c, r: me_pallas.sad_map_pallas(
        c, r, s, interpret=True))(cur, ref)
    want = jax.vmap(lambda c, r: me.sad_map(c, r, s))(cur, ref)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("h,w,s", [(48, 64, 4), (144, 176, 7)])
def test_sad_map_i8_parity(h, w, s):
    """int8-MXU column-pool variant (hardware-verified exact on v5e; kept
    as an A/B alternative -- measured slower than the bf16 kernel there:
    7.0 vs 4.5 ms per 16-stream CIF sweep, so not dispatched)."""
    cur = jnp.asarray(RNG.integers(0, 256, (h, w)), jnp.int32)
    ref = jnp.asarray(RNG.integers(0, 256, (h, w)), jnp.int32)
    want = np.asarray(me.sad_map(cur, ref, s))
    got = np.asarray(me_pallas.sad_map_pallas_i8(cur, ref, s,
                                                 interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("h,w,s", [(48, 64, 4), (144, 176, 7)])
def test_sad_map_swar_parity(h, w, s):
    """Packed-int32 SWAR variant (round-5 A/B: hardware-exact on v5e but
    1.53x slower than the bf16 kernel -- 6.60 vs 4.30 ms per 16-stream
    CIF sweep; ALU-issue-bound at ~7 int ops/px.  Kept as the measured
    record that closes the sub-bf16-width avenue; see me_pallas.py)."""
    cur = jnp.asarray(RNG.integers(0, 256, (h, w)), jnp.int32)
    ref = jnp.asarray(RNG.integers(0, 256, (h, w)), jnp.int32)
    want = np.asarray(me.sad_map(cur, ref, s))
    got = np.asarray(me_pallas.sad_map_pallas_swar(cur, ref, s,
                                                   interpret=True))
    np.testing.assert_array_equal(got, want)
