"""Batched 8x8 integer DCT / IDCT.

The reference's production transform is an integer Chen DCT whose exact
fixed-point rounding defines the bitstream (SURVEY section 2: chendct.c
ChenDct/ChenIDct; the mount was empty this round, so the reference's exact
constants/shifts could NOT be transplanted -- see SURVEY section 0).  This
module therefore defines its *own* fully-specified integer transform with the
same role: deterministic int32 arithmetic, identical on CPU and TPU, shared
by encoder and decoder so encoder-local reconstruction and decoder output are
bit-identical by construction.  When the reference mount appears, only the
constants/shifts in this file need recalibrating for cross-implementation
bit-exactness.

Definition (documented contract):

  basis   M[u, x] = c(u)/2 * cos((2x+1) u pi / 16),  c(0)=1/sqrt(2), else 1
  rshift_round(v, s) = (v + 2^(s-1)) >> s            (arithmetic shift)

  forward (single-stage, round 3):
            MI2 = round(kron(M, M) * 2^15)           (16-bit signed constants)
            vec(F) = rshift_round(MI2 @ vec(f), 15)  # ONE rounding, scale 1

  inverse (two-stage separable):
            MI = round(M * 2^13)                     (14-bit signed constants)
            t = rshift_round(MI^T @ F, 9)            # keeps 4 fraction bits
            f = rshift_round(t @ MI,   17)

The forward was two-stage through round 2; round-3 profiling showed the
separable formulation's minor-dim-8 matmuls/relayouts cost 2.6 of the 9.3 ms
frame step on v5e, while the flattened (..., 64) @ (64, 64) single-stage
form is one perfectly-shaped MXU dot (K=64, lane-concat hi/lo -> N=128)
with zero relayouts.  Single rounding is also strictly more accurate vs the
float oracle.  The inverse stays separable: its K=64 form would 4x the VPU
multiply count on the CPU decode path for no TPU win (reconstruct measured
0.9 ms), and its 4-fraction-bit intermediate is what meets IEEE 1180.

The inverse keeps 4 fraction bits in the intermediate so that the IDCT meets
the IEEE Std 1180-1990 statistical accuracy bounds required of H.261
decoders (H.261 section 3.2.3 / section 4.2.4.4): ppe <= 1, pmse <= 0.06,
omse <= 0.02, pme <= 0.015, ome <= 0.0015 -- enforced by
tests/test_kernels.py::test_idct_ieee1180_conformance.

Worst-case int32 bounds, valid for ARBITRARY (foreign-stream) inputs:
forward: max_row sum |MI2| = 221,262 < 2^17.8, so |sums| <= 255 * 2^17.8
< 2^25.8.  inverse: max_x sum_u |MI[u,x]| = 21641, so t <= 2^16.4 and
stage-2 products <= 2^30.8 -- no int32 overflow even for adversarial
coefficient blocks.  Output range: |F| <= 2047 after the caller's clamp;
inverse output is clamped by the caller during reconstruction.

A float64 separable DCT is provided as the test oracle (the reference's
"ReferenceDct" analogue, dct.c, unverified).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

SCALE_BITS = 13
FWD_SCALE_BITS = 15
INV_SHIFT1, INV_SHIFT2 = 9, 17


def _float_basis() -> np.ndarray:
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] *= 1.0 / np.sqrt(2.0)
    return m


#: float64 basis (oracle) and its fixed-point images (production constants):
#: MI (8x8) for the separable inverse, MI2 (64x64) for the single-stage
#: forward -- MI2[8u+v, 8x+y] = round(M[u,x] * M[v,y] * 2^15).
M_FLOAT: np.ndarray = _float_basis()
MI: np.ndarray = np.round(M_FLOAT * (1 << SCALE_BITS)).astype(np.int32)
MI2: np.ndarray = np.round(np.kron(M_FLOAT, M_FLOAT)
                           * (1 << FWD_SCALE_BITS)).astype(np.int32)
assert int(np.abs(MI2).sum(axis=1).max()) * 255 < 2 ** 31  # int32-safe


def rshift_round(v: jnp.ndarray, s: int) -> jnp.ndarray:
    """(v + 2^(s-1)) >> s with arithmetic shift: round-half-up in value."""
    return (v + (1 << (s - 1))) >> s


#: zigzag-ordered forward basis: row k of MI2_ZZ produces the k-th
#: zigzag-scan coefficient, so the encoder gets transmission-ordered
#: levels straight out of the DCT dot with ZERO permutation cost (the
#: zigzag gather in quantize measured as real VPU time in round 3).
#: Same numbers, different row order: fdct8x8_zz(x) == zigzag(fdct8x8(x)).
from ..spec.zigzag import ZIGZAG as _ZZ  # noqa: E402  (after MI2)

MI2_ZZ: np.ndarray = MI2[np.asarray(_ZZ)]

#: bf16 hi/lo split of MI2 for the MXU path: MI2 = 256*hi + lo with
#: hi in [-128, 128] and lo in [-128, 127] -- both bf16-exact integers.
_MI2_HI: np.ndarray = (MI2 + 128) >> 8
_MI2_LO: np.ndarray = MI2 - 256 * _MI2_HI
assert (np.abs(_MI2_HI) <= 128).all() and (np.abs(_MI2_LO) <= 128).all()
_MI2Z_HI: np.ndarray = (MI2_ZZ + 128) >> 8
_MI2Z_LO: np.ndarray = MI2_ZZ - 256 * _MI2Z_HI


def _fdct8x8_mxu(blocks: jnp.ndarray) -> jnp.ndarray:
    """MXU formulation of fdct8x8, bit-identical to the int32 einsum path.

    ONE bf16 dot: inputs f in [-255, 255] are bf16-exact; MI2 is split
    256*hi + lo (constants above, both bf16-exact) and the two halves are
    lane-concatenated into a single (64, 128) rhs -- a perfect MXU tile.
    Each f32 accumulator holds |sums| <= 64*255*128 < 2^21 (exact); the
    256*hi + lo recombination happens in int32 (full sums reach 2^25.8,
    beyond f32's exact-integer range).  No minor-dim-8 relayouts: the
    (..., 8, 8) -> (..., 64) flatten is layout-free.

    Exactness enforced by tests/test_kernels.py::
    test_fdct_mxu_formulation_matches_int32 and the hardware parity gate.
    """
    shp = blocks.shape
    a = blocks.reshape(-1, 64).astype(jnp.bfloat16)
    cat = jnp.concatenate([jnp.asarray(_MI2_HI.T, jnp.bfloat16),
                           jnp.asarray(_MI2_LO.T, jnp.bfloat16)],
                          axis=1)                              # (64, 128)
    s = jax.lax.dot(a, cat, preferred_element_type=jnp.float32)
    s2 = 256 * s[:, :64].astype(jnp.int32) + s[:, 64:].astype(jnp.int32)
    return rshift_round(s2, FWD_SCALE_BITS).reshape(shp)


def fdct8x8(blocks: jnp.ndarray) -> jnp.ndarray:
    """Forward integer DCT over (..., 8, 8) int32 -> (..., 8, 8) int32.

    TPU dispatches to the exact MXU formulation (see _fdct8x8_mxu); CPU
    keeps the int32 matmul.  Bit-identical outputs (tested)."""
    if jax.default_backend() == "tpu":
        return _fdct8x8_mxu(blocks)
    shp = blocks.shape
    v = blocks.reshape(-1, 64).astype(jnp.int32)
    s = jnp.einsum("nx,ux->nu", v, jnp.asarray(MI2, jnp.int32))
    return rshift_round(s, FWD_SCALE_BITS).reshape(shp)


def fdct8x8_zz(blocks: jnp.ndarray) -> jnp.ndarray:
    """Forward integer DCT emitting ZIGZAG-ordered coefficients directly:
    (..., 8, 8) int32 -> (..., 64) int32 with
    fdct8x8_zz(x)[..., k] == zigzag(fdct8x8(x))[..., k].

    Same arithmetic as fdct8x8 (MI2 rows permuted -- see MI2_ZZ), so the
    transmission-order permutation costs literally nothing.  This is the
    encoder's production entry; fdct8x8 remains for (8, 8)-layout callers
    and tests."""
    shp = blocks.shape[:-2]
    if jax.default_backend() == "tpu":
        a = blocks.reshape(-1, 64).astype(jnp.bfloat16)
        cat = jnp.concatenate([jnp.asarray(_MI2Z_HI.T, jnp.bfloat16),
                               jnp.asarray(_MI2Z_LO.T, jnp.bfloat16)],
                              axis=1)                          # (64, 128)
        s = jax.lax.dot(a, cat, preferred_element_type=jnp.float32)
        s2 = (256 * s[:, :64].astype(jnp.int32)
              + s[:, 64:].astype(jnp.int32))
        return rshift_round(s2, FWD_SCALE_BITS).reshape(*shp, 64)
    v = blocks.reshape(-1, 64).astype(jnp.int32)
    s = jnp.einsum("nx,ux->nu", v, jnp.asarray(MI2_ZZ, jnp.int32))
    return rshift_round(s, FWD_SCALE_BITS).reshape(*shp, 64)


def idct8x8(coefs: jnp.ndarray) -> jnp.ndarray:
    """Inverse integer DCT over (..., 8, 8) int32 -> (..., 8, 8) int32."""
    mi = jnp.asarray(MI, dtype=jnp.int32)
    t = rshift_round(jnp.einsum("ux,...uv->...xv", mi, coefs.astype(jnp.int32)),
                     INV_SHIFT1)
    return rshift_round(jnp.einsum("...xv,vy->...xy", t, mi), INV_SHIFT2)


# ---------------------------------------------------------------------------
# float64 oracle (test-only; the dct.c "ReferenceDct" analogue)
# ---------------------------------------------------------------------------


def reference_fdct(blocks: np.ndarray) -> np.ndarray:
    m = M_FLOAT
    return np.einsum("ux,...xy,vy->...uv", m, blocks.astype(np.float64), m)


def reference_idct(coefs: np.ndarray) -> np.ndarray:
    m = M_FLOAT
    return np.einsum("ux,...uv,vy->...xy", m, coefs.astype(np.float64), m)
