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
  MI      = round(M * 2^13)                          (14-bit signed constants)
  rshift_round(v, s) = (v + 2^(s-1)) >> s            (arithmetic shift)

  forward:  t = rshift_round(MI @ f,  10)            # keeps 3 fraction bits
            F = rshift_round(t @ MI^T, 16)           # net scale 1
  inverse:  t = rshift_round(MI^T @ F, 9)            # keeps 4 fraction bits
            f = rshift_round(t @ MI,   17)

The inverse keeps 4 fraction bits in the intermediate so that the IDCT meets
the IEEE Std 1180-1990 statistical accuracy bounds required of H.261
decoders (H.261 section 3.2.3 / section 4.2.4.4): ppe <= 1, pmse <= 0.06,
omse <= 0.02, pme <= 0.015, ome <= 0.0015 -- enforced by
tests/test_kernels.py::test_idct_ieee1180_conformance (measured omse
~0.015, vs 0.022 at the previous 2-fraction-bit shifts).

Worst-case int32 bounds, valid for ARBITRARY (foreign-stream) inputs:
max_x sum_u |MI[u,x]| = 21641, so forward (|f| <= 255) peaks at 2^26.8 and
inverse (|F| <= 2048) at t <= 2^16.4 and stage-2 products <= 2^30.8 -- no
int32 overflow even for adversarial coefficient blocks.  Output range:
|F| <= 2047 after the caller's clamp; inverse output is clamped by the
caller during reconstruction.

Implemented as two batched 8x8 integer matmuls over a (N, 8, 8) block tensor:
on TPU this is VPU work fused by XLA (the per-block FLOP count is tiny; the
batch dimension provides the parallelism -- SURVEY section 7 "batch all MBs").
A float64 separable DCT is provided as the test oracle (the reference's
"ReferenceDct" analogue, dct.c, unverified).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

SCALE_BITS = 13
FWD_SHIFT1, FWD_SHIFT2 = 10, 16
INV_SHIFT1, INV_SHIFT2 = 9, 17


def _float_basis() -> np.ndarray:
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] *= 1.0 / np.sqrt(2.0)
    return m


#: float64 basis (oracle) and its fixed-point image (production constants).
M_FLOAT: np.ndarray = _float_basis()
MI: np.ndarray = np.round(M_FLOAT * (1 << SCALE_BITS)).astype(np.int32)


def rshift_round(v: jnp.ndarray, s: int) -> jnp.ndarray:
    """(v + 2^(s-1)) >> s with arithmetic shift: round-half-up in value."""
    return (v + (1 << (s - 1))) >> s


#: bf16 hi/lo split of the basis for the MXU path: MI = 128*MI_HI + MI_LO
#: with MI_HI in [-64, 64] and MI_LO in [-64, 63] -- both bf16-exact.
_MI_HI: np.ndarray = (MI + 64) >> 7
_MI_LO: np.ndarray = MI - 128 * _MI_HI
assert (np.abs(_MI_HI) <= 64).all() and (np.abs(_MI_LO) <= 64).all()


def _fdct8x8_mxu(blocks: jnp.ndarray) -> jnp.ndarray:
    """MXU formulation of fdct8x8, bit-identical to the int32 einsum path.

    STANDALONE this is ~3x slower than the int32 einsum (minor-dim-8
    relayouts), but inside the fused encoder frame step it is a net WIN on
    v5e (9.3 vs 9.9 ms per 16-stream CIF step): the VPU is the frame
    step's saturated unit, and this moves the DCT multiplies onto the
    otherwise-idle MXU.  Exact integer arithmetic throughout:

      stage 1: inputs f in [-255, 255] (residual/pixel bound) are
        bf16-exact; MI is split 128*hi + lo (constants above).  Each dot's
        f32 accumulation holds |sums| <= 8*64*255 < 2^18 (exact); the
        128*hi + lo recombination happens in int32 (stage-1 sums reach
        2^24.4, beyond f32's exact-integer range).
      stage 2: t1 (|t1| <= 5390 by the |MI| row-sum bound, see module
        docstring) is split 64*thi + tlo (thi in [-85, 85], tlo in
        [-32, 31], bf16-exact); against the split basis that is four dots,
        each f32-exact (|sums| <= 8*85*64 < 2^17), recombined in int32.

    Exactness enforced by tests/test_kernels.py::
    test_fdct_mxu_formulation_matches_int32 and the hardware parity gate.
    """
    x = blocks.astype(jnp.float32)
    shp = x.shape
    mhi = jnp.asarray(_MI_HI, jnp.bfloat16)
    mlo = jnp.asarray(_MI_LO, jnp.bfloat16)
    # stage 1: S[(b,y), u] = sum_x f[b, x, y] * MI[u, x]
    a = x.swapaxes(-1, -2).reshape(-1, 8).astype(jnp.bfloat16)  # rows (b,y)
    cat1 = jnp.concatenate([mhi.T, mlo.T], axis=1)              # (8, 16)
    s = jax.lax.dot(a, cat1, preferred_element_type=jnp.float32)
    s1 = 128 * s[:, :8].astype(jnp.int32) + s[:, 8:].astype(jnp.int32)
    t = rshift_round(s1, FWD_SHIFT1)          # rows (b,y), cols u
    # stage 2: F[(b,u), v] = sum_y t[b, u, y] * MI[v, y]
    t = t.reshape(*shp[:-2], 8, 8).swapaxes(-1, -2).reshape(-1, 8)
    thi = ((t + 32) >> 6).astype(jnp.bfloat16)     # [-85, 85]
    tlo = (t - 64 * ((t + 32) >> 6)).astype(jnp.bfloat16)
    a2 = jnp.concatenate([thi, tlo], axis=0)       # (2*b*8, 8)
    p = jax.lax.dot(a2, cat1, preferred_element_type=jnp.float32)
    n = t.shape[0]
    phh = p[:n, :8].astype(jnp.int32)
    phl = p[:n, 8:].astype(jnp.int32)
    plh = p[n:, :8].astype(jnp.int32)
    pll = p[n:, 8:].astype(jnp.int32)
    s2 = 64 * (128 * phh + phl) + 128 * plh + pll
    return rshift_round(s2, FWD_SHIFT2).reshape(shp)


def fdct8x8(blocks: jnp.ndarray) -> jnp.ndarray:
    """Forward integer DCT over (..., 8, 8) int32 -> (..., 8, 8) int32.

    TPU dispatches to the exact MXU formulation (see _fdct8x8_mxu for the
    VPU/MXU-overlap rationale); CPU keeps the int32 einsum.  Bit-identical
    outputs (tested)."""
    if jax.default_backend() == "tpu":
        return _fdct8x8_mxu(blocks)
    mi = jnp.asarray(MI, dtype=jnp.int32)
    t = rshift_round(jnp.einsum("ux,...xy->...uy", mi, blocks.astype(jnp.int32)),
                     FWD_SHIFT1)
    return rshift_round(jnp.einsum("...uy,vy->...uv", t, mi), FWD_SHIFT2)


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
