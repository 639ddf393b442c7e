"""Pallas TPU kernel for full-search SAD motion estimation.

This is the SURVEY section 2 "flagship Pallas kernel": the reference's
quadruple scalar loop (me.c BruteMotionEstimation, unverified -- mount
empty) becomes one VMEM-resident sweep:

  * the current luma plane and the (+/-search)-padded reference plane are
    DMA'd to VMEM once and reused across the whole grid (constant
    index_map);
  * grid dimension = dx (2*search+1 programs); each program performs ONE
    dynamic lane-shift of the padded reference, then sweeps dy with cheap
    sublane slices;
  * per (dy, dx): |cur - ref_shifted| on the VPU, then the 16x16 per-MB
    box sum as two small matmuls against constant 0/1 pooling matrices --
    this routes the reduction through the MXU, where it is exact in float32
    (all values < 2^24) and far faster than strided vector reductions;
  * output is the dense (n_offsets, nMB) SAD map, bit-identical to the XLA
    reference implementation in kernels/me.py (tested); argmin tie-break
    order is applied outside, identically to me.full_search.

Scan-order/tie-break contract is inherited from kernels/me.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec.constants import DEFAULT_SEARCH_RANGE, MB_SIZE
from .me import _validity_mask, offset_table, zero_offset_index


def _pool_matrices(h: int, w: int):
    """0/1 pooling matrices: P_r (h/16, h) and P_c (w, w/16) in float32."""
    pr = np.zeros((h // MB_SIZE, h), np.float32)
    for i in range(h // MB_SIZE):
        pr[i, i * MB_SIZE:(i + 1) * MB_SIZE] = 1.0
    pc = np.zeros((w, w // MB_SIZE), np.float32)
    for j in range(w // MB_SIZE):
        pc[j * MB_SIZE:(j + 1) * MB_SIZE, j] = 1.0
    return pr, pc


def _sad_kernel(cur_ref, shifted_ref, pr_ref, pc_ref, out_ref, *,
                h, w, search):
    # grid axis = dx; shifted_ref block is this program's dx-shifted,
    # vertically padded reference (1, h + 2*search, w), DMA'd by Pallas.
    # Dynamic offsets appear only on the SUBLANE axis (dy), which Mosaic
    # supports cheaply; the lane-axis (dx) shifts were materialized outside
    # the kernel as static slices.
    side = 2 * search + 1
    cur = cur_ref[...].astype(jnp.float32)          # (h, w)
    pr = pr_ref[...]
    pc = pc_ref[...]

    # dy loop unrolled: static (compile-time) sublane offsets, since v5e
    # Mosaic requires *dynamic* sublane starts to be 8-aligned.
    for dy in range(side):
        win = shifted_ref[0, dy:dy + h, :].astype(jnp.float32)
        ad = jnp.abs(cur - win)                     # exact: integers < 2^9
        part = jax.lax.dot(ad, pc,
                           preferred_element_type=jnp.float32)  # (h, w/16)
        # HIGHEST: part holds integers up to 4080 (not bf16-exact); see
        # _sad_kernel_bf16 for the hardware-verified rationale.
        sums = jax.lax.dot(pr, part,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)  # (h/16,w/16)
        out_ref[0, dy] = sums


@functools.partial(jax.jit, static_argnames=("search", "interpret"))
def sad_map_pallas(cur_y: jnp.ndarray, ref_y: jnp.ndarray,
                   search: int = DEFAULT_SEARCH_RANGE,
                   interpret: bool = False) -> jnp.ndarray:
    """Dense SAD map via the Pallas kernel.

    Args / returns match kernels.me.sad_map: (num_offsets, nMB) int32 with
    out-of-picture offsets masked to a large value.
    """
    h, w = cur_y.shape
    mb_rows, mb_cols = h // MB_SIZE, w // MB_SIZE
    n_mb = mb_rows * mb_cols
    side = 2 * search + 1

    cur = cur_y.astype(jnp.int32)
    ref_pad = jnp.pad(ref_y.astype(jnp.int32), search)
    # 31 dx-shifted copies as STATIC slices (XLA fuses these into cheap
    # copies); each Pallas program DMAs exactly one copy to VMEM.
    shifted = jnp.stack([ref_pad[:, dx:dx + w] for dx in range(side)])
    pr, pc = _pool_matrices(h, w)

    grid = (side,)
    out = pl.pallas_call(
        functools.partial(_sad_kernel, h=h, w=w, search=search),
        grid=grid,
        in_specs=[
            pl.BlockSpec((h, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2 * search, w),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mb_rows, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, mb_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, side, mb_rows, mb_cols),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((side, side, mb_rows, mb_cols),
                                       jnp.float32),
        interpret=interpret,
    )(cur, shifted, jnp.asarray(pr), jnp.asarray(pc))

    # out[dx, dy, mbr, mbc] -> scan order is dy-major: (dy, dx, mb)
    sads = jnp.swapaxes(out, 0, 1).reshape(side * side, n_mb)
    sads = sads.astype(jnp.int32)

    valid = _me_validity(h, w, n_mb, mb_cols, search)
    big = jnp.int32(1 << 30)
    return jnp.where(valid, sads, big)


def _sad_kernel_bf16(cur_ref, shifted_ref, pr_ref, pc_ref, out_ref, *,
                     h, w, search):
    """bf16 variant of _sad_kernel: the MXU runs bf16 x bf16 -> f32 at full
    rate (f32 dots decompose into multiple passes).  Exact: pixels and
    |differences| are integers <= 255 (bf16-exact), pooling matrices are
    0/1, accumulation is f32 (sums < 2^17).  The dy sweep is a straight
    per-dy pipeline (abs-diff -> column pool -> hi/lo split -> row pool)
    with no large VMEM intermediates."""
    side = 2 * search + 1
    mbc = w // MB_SIZE
    cur = cur_ref[...]                              # (h, w) bf16
    pr = pr_ref[...]                                # (mb_rows, h) bf16
    pc = pc_ref[...]                                # (w, mb_cols) bf16
    sh = shifted_ref[0]                             # (h + 2s, w) bf16

    # Tall formulation: the whole (side*h, w) abs-diff slab feeds ONE
    # column-pool matmul (A/B-measured faster than a per-dy pipeline:
    # 5.3 ms vs 8.5 ms per 16-stream CIF step on v5e -- the MXU prefers
    # the single tall dispatch over 31 medium ones).
    #
    # Round-3 A/B record (16-stream CIF, 30-iter fori harness, kernel-only
    # timings on v5e): THIS kernel 4.02 ms/iter; row-pool-first f32
    # reshape-sum (sad_map_pallas_rp) 4.16; int8 column pool + single
    # lane-batched row dot 7.02 (int8 casts + the (h, side*2mbc)
    # lane-concat relayout dominated; deleted); phase-grouped dy slices
    # staged through 16 tile-aligned VMEM scratch copies 4.53 (the scratch
    # writes cost more than the unaligned-slice shifts they avoided;
    # deleted).  Conclusion: the kernel is VPU-bound on the 961 intrinsic
    # full-plane abs-diff passes, not MXU-bound -- further gains need
    # fewer elementwise passes, not cheaper matmuls.
    #
    # Round-4 attempt (roofline follow-up, BASELINE.md "ME roofline"): a
    # uint8 kernel computing |a-b| entirely in packed int8 (4 lanes/word,
    # up to 4x the elementwise rate and 1/2 the loads) fails to compile on
    # this Mosaic toolchain -- arith.maxui AND arith.cmpi on
    # vector<8x128x4xi8> are both rejected (so neither max/min-sub nor
    # cmp+select abs formulations lower; same class as the round-3
    # math.absi/arith.maxsi-on-i16 finding).  bf16 is the narrowest dtype
    # with working elementwise coverage that holds 0..255 exactly, so this
    # kernel is the toolchain-level local optimum for the intrinsic
    # abs-diff work, not just a formulation-level one.
    ad_rows = []
    for dy in range(side):
        ad_rows.append(jnp.abs(cur - sh[dy:dy + h, :]))
    ad_all = jnp.concatenate(ad_rows, axis=0)       # (side*h, w) bf16
    part = jax.lax.dot(ad_all, pc,
                       preferred_element_type=jnp.float32)  # (side*h, mbc)
    # Row pool exactness: column sums reach 16*255 = 4080, which is NOT
    # bf16-representable -- at default TPU matmul precision the MXU rounds
    # f32 inputs to bf16 (one pass), which round 1 shipped and the round-1
    # verdict falsified on hardware (errors up to +/-45 in the SAD map).
    # Exact fix at single-pass bf16 rate: split part = 64*hi + lo with
    # hi = floor(part/64) and lo = part - 64*hi, both integers <= 63 and
    # hence bf16-exact (1/64 is a power of two, so the f32 multiply and
    # floor are exact too).  One bf16 matmul on the lane-concatenated
    # [hi | lo] block replaces the 6-pass HIGHEST f32 dot; recombination in
    # f32 is exact (sums < 2^17).  Verified exact vs the int64 oracle on
    # the real v5e by tools/tpu_parity.py.
    hi = jnp.floor(part * (1.0 / 64.0))
    lo = part - 64.0 * hi
    hl = jnp.concatenate([hi.astype(jnp.bfloat16),
                          lo.astype(jnp.bfloat16)], axis=1)  # (side*h, 2mbc)
    for dy in range(side):
        s2 = jax.lax.dot(pr, hl[dy * h:(dy + 1) * h, :],
                         preferred_element_type=jnp.float32)  # (R, 2mbc)
        out_ref[0, dy] = 64.0 * s2[:, :mbc] + s2[:, mbc:]


@functools.partial(jax.jit, static_argnames=("search", "interpret"))
def sad_map_pallas_bf16(cur_y: jnp.ndarray, ref_y: jnp.ndarray,
                        search: int = DEFAULT_SEARCH_RANGE,
                        interpret: bool = False) -> jnp.ndarray:
    """Same contract as sad_map_pallas; bf16 data path (exact, see kernel),
    half the HBM traffic for the shifted stack and full-rate MXU pooling."""
    h, w = cur_y.shape
    mb_rows, mb_cols = h // MB_SIZE, w // MB_SIZE
    n_mb = mb_rows * mb_cols
    side = 2 * search + 1

    cur = cur_y.astype(jnp.bfloat16)
    ref_pad = jnp.pad(ref_y.astype(jnp.bfloat16), search)
    shifted = jnp.stack([ref_pad[:, dx:dx + w] for dx in range(side)])
    pr, pc = _pool_matrices(h, w)

    out = pl.pallas_call(
        functools.partial(_sad_kernel_bf16, h=h, w=w, search=search),
        grid=(side,),
        in_specs=[
            pl.BlockSpec((h, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2 * search, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mb_rows, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, mb_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, side, mb_rows, mb_cols),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((side, side, mb_rows, mb_cols),
                                       jnp.float32),
        interpret=interpret,
    )(cur, shifted, jnp.asarray(pr, jnp.bfloat16),
      jnp.asarray(pc, jnp.bfloat16))

    sads = jnp.swapaxes(out, 0, 1).reshape(side * side, n_mb)
    sads = sads.astype(jnp.int32)
    valid = _me_validity(h, w, n_mb, mb_cols, search)
    return jnp.where(valid, sads, jnp.int32(1 << 30))


def _sad_kernel_rp(cur_ref, shifted_ref, pc_ref, out_ref, *, h, w, search):
    """Row-pool-FIRST variant of _sad_kernel_bf16 (round-3 stage_bench
    work: ME was 5.25 of the 9.3 ms frame step, and most of it was MXU
    padding waste -- the column-pool dot ran at M=side*h with N=mbc padded
    22->128, and the row pool was 31 tiny (R,h)x(h,2mbc) dots).

    Here the 16-row box sum runs on the VPU as an exact f32 reshape-sum
    BEFORE any matmul, shrinking the MXU problem by 16x and eliminating
    the per-dy dot loop entirely:

      * abs-diff per dy in bf16 (integers <= 255, exact), cast f32;
      * row pool: reshape (side*R, 16, w) -> sum axis 1.  Exact: sums
        <= 16*255 = 4080 < 2^24 in f32 vector adds;
      * column pool: ONE bf16 dot.  4080 is not bf16-exact, so rows are
        split 64*hi + lo (hi, lo <= 63, bf16-exact -- same argument as
        _sad_kernel_bf16), stacked along M, and recombined in f32 after
        the dot (sums <= 16*63 = 1008, f32-exact).

    A/B result (v5e, 16-stream CIF, 30-iter fori harness): 4.16 ms/iter vs
    4.02 for _sad_kernel_bf16 -- NOT faster, despite 16x less padded MXU
    work.  Conclusion: the SAD kernels are VPU-bound on the 961 full-plane
    abs-diff passes (the algorithm's intrinsic byte-ops) plus bf16->f32
    casts, not MXU-bound; kept as the measured record and exercised by the
    hardware gate (repo policy: no device path without a parity assertion).

    Verified exact vs the int64 oracle by tools/tpu_parity.py."""
    side = 2 * search + 1
    rr = h // MB_SIZE
    mbc = w // MB_SIZE
    cur = cur_ref[...]                              # (h, w) bf16
    pc = pc_ref[...]                                # (w, mbc) bf16
    sh = shifted_ref[0]                             # (h + 2s, w) bf16

    # pool each dy's rows immediately: the full (side*h, w) f32 abs-diff
    # slab would blow the 16 MB scoped-VMEM budget (measured 20.9 MB); the
    # running result is only (side*R, w) f32 = 0.8 MB.
    rows_list = []
    for dy in range(side):
        ad = jnp.abs(cur - sh[dy:dy + h, :]).astype(jnp.float32)
        rows_list.append(ad.reshape(rr, MB_SIZE, w).sum(axis=1))   # (R, w)
    rows = jnp.concatenate(rows_list, axis=0)                 # (side*R, w)
    hi = jnp.floor(rows * (1.0 / 64.0))
    lo = rows - 64.0 * hi
    stacked = jnp.concatenate([hi.astype(jnp.bfloat16),
                               lo.astype(jnp.bfloat16)], axis=0)
    part = jax.lax.dot(stacked, pc,
                       preferred_element_type=jnp.float32)  # (2*side*R, mbc)
    n = side * rr
    out = 64.0 * part[:n] + part[n:]
    out_ref[0] = out.reshape(side, rr, mbc)


@functools.partial(jax.jit, static_argnames=("search", "interpret"))
def sad_map_pallas_rp(cur_y: jnp.ndarray, ref_y: jnp.ndarray,
                      search: int = DEFAULT_SEARCH_RANGE,
                      interpret: bool = False) -> jnp.ndarray:
    """Same contract as sad_map_pallas; row-pool-first data path (exact,
    see kernel)."""
    h, w = cur_y.shape
    mb_rows, mb_cols = h // MB_SIZE, w // MB_SIZE
    n_mb = mb_rows * mb_cols
    side = 2 * search + 1

    cur = cur_y.astype(jnp.bfloat16)
    ref_pad = jnp.pad(ref_y.astype(jnp.bfloat16), search)
    shifted = jnp.stack([ref_pad[:, dx:dx + w] for dx in range(side)])
    _, pc = _pool_matrices(h, w)

    out = pl.pallas_call(
        functools.partial(_sad_kernel_rp, h=h, w=w, search=search),
        grid=(side,),
        in_specs=[
            pl.BlockSpec((h, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2 * search, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, mb_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, side, mb_rows, mb_cols),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((side, side, mb_rows, mb_cols),
                                       jnp.float32),
        interpret=interpret,
    )(cur, shifted, jnp.asarray(pc, jnp.bfloat16))

    sads = jnp.swapaxes(out, 0, 1).reshape(side * side, n_mb)
    sads = sads.astype(jnp.int32)
    valid = _me_validity(h, w, n_mb, mb_cols, search)
    return jnp.where(valid, sads, jnp.int32(1 << 30))


def _sad_kernel_i8(cur_ref, shifted_ref, pr_ref, pc_ref, out_ref, *,
                   h, w, search):
    """int8-MXU variant of _sad_kernel_bf16 (the production kernel).

    Column pool on the int8 MXU path (2x the bf16 rate on v5e) with a bias
    trick instead of a hi/lo split: |cur - sh| <= 255 does not fit int8,
    but ad - 128 in [-128, 127] does, and the pooling correction is a
    constant (+128 * 16 = +2048 per 16-wide box).  All arithmetic is
    integer -> int32 accumulation: exact by construction, no rounding
    analysis needed.  The row pool keeps the bf16 hi/lo-split dot of
    _sad_kernel_bf16 (its input reaches 4080; see there)."""
    side = 2 * search + 1
    mbc = w // MB_SIZE
    cur = cur_ref[...]                              # (h, w) bf16
    pr = pr_ref[...]                                # (mb_rows, h) bf16
    pc = pc_ref[...]                                # (w, mbc) int8
    sh = shifted_ref[0]                             # (h + 2s, w) bf16

    ad_rows = []
    for dy in range(side):
        # abs-diff in bf16 (exact: integers <= 255), biased into int8 range;
        # Mosaic lacks narrow-int ALU lowerings (math.absi/arith.maxsi on
        # i16), so the elementwise part stays in bf16 and only the matmul
        # operand is int8.
        ad = jnp.abs(cur - sh[dy:dy + h, :])
        ad_rows.append((ad - 128.0).astype(jnp.int8))
    ad_all = jnp.concatenate(ad_rows, axis=0)       # (side*h, w) int8
    part = jax.lax.dot(ad_all, pc,
                       preferred_element_type=jnp.int32)    # (side*h, mbc)
    part = part + 128 * MB_SIZE                     # undo the bias, exact
    hi = (part >> 6).astype(jnp.bfloat16)           # 0..63, bf16-exact
    lo = (part & 63).astype(jnp.bfloat16)
    hl = jnp.concatenate([hi, lo], axis=1)          # (side*h, 2mbc)
    for dy in range(side):
        s2 = jax.lax.dot(pr, hl[dy * h:(dy + 1) * h, :],
                         preferred_element_type=jnp.float32)
        out_ref[0, dy] = 64.0 * s2[:, :mbc] + s2[:, mbc:]


@functools.partial(jax.jit, static_argnames=("search", "interpret"))
def sad_map_pallas_i8(cur_y: jnp.ndarray, ref_y: jnp.ndarray,
                      search: int = DEFAULT_SEARCH_RANGE,
                      interpret: bool = False) -> jnp.ndarray:
    """Same contract as sad_map_pallas; int8-MXU column pool (exact, see
    kernel)."""
    h, w = cur_y.shape
    mb_rows, mb_cols = h // MB_SIZE, w // MB_SIZE
    n_mb = mb_rows * mb_cols
    side = 2 * search + 1

    cur = cur_y.astype(jnp.bfloat16)
    ref_pad = jnp.pad(ref_y.astype(jnp.bfloat16), search)
    shifted = jnp.stack([ref_pad[:, dx:dx + w] for dx in range(side)])
    pr, pc = _pool_matrices(h, w)

    out = pl.pallas_call(
        functools.partial(_sad_kernel_i8, h=h, w=w, search=search),
        grid=(side,),
        in_specs=[
            pl.BlockSpec((h, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2 * search, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mb_rows, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, mb_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, side, mb_rows, mb_cols),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((side, side, mb_rows, mb_cols),
                                       jnp.float32),
        interpret=interpret,
    )(cur, shifted, jnp.asarray(pr, jnp.bfloat16),
      jnp.asarray(pc, jnp.int8))

    sads = jnp.swapaxes(out, 0, 1).reshape(side * side, n_mb)
    sads = sads.astype(jnp.int32)
    valid = _me_validity(h, w, n_mb, mb_cols, search)
    return jnp.where(valid, sads, jnp.int32(1 << 30))


def _sad_kernel_swar(cur_ref, shifted_ref, pw_ref, out_ref, *, h, w, search):
    """SWAR variant (round-4 verdict item 7, the time-boxed last attack on
    the 4.0 ms floor): 4 pixels packed per int32 word -- 1 B/px of VMEM
    traffic, half the bf16 kernel's bytes -- with the bytewise |a-b|
    computed in int32 bitwise/arith ops (which Mosaic DOES lower, unlike
    the i8/i16 elementwise ops rejected in rounds 3-4).

    Per packed word pair (a, b), bytes are processed as two interleaved
    16-bit-field pairs (bytes 0,2 and bytes 1,3 -> fields at bits 0 and
    16).  For fields u, v in [0, 255]:

        d1 = (u | 256) - v   in [1, 511]   (bit 8 set  iff u >= v)
        d2 = (v | 256) - u   in [1, 511]   (bit 8 set  iff v >= u)
        |u - v| = max(d1, d2) & 255        (the max is 256 + |u-v|)

    max is selected with a per-field mask built from d1's bit 8 (one int32
    multiply by 0xFFFF spreads the bit to a field mask).  No borrows cross
    fields: all intermediates stay within their 16-bit field.  The two
    pair-extracts are summed (fields <= 510), row-pooled by an exact f32
    reshape-sum (<= 8160 < 2^24), unpacked, and column-pooled by one
    hi/lo-split bf16 matmul over the packed-word axis (same exactness
    argument as _sad_kernel_bf16).

    Cost model vs the bf16 kernel: ~7 int ops/px (vs 2) but 1 B/px moved
    (vs 2 B/px + the slab store + MXU re-read) -- a test of whether the
    kernel is truly memory-issue-bound (roofline, BASELINE.md): if it is,
    halving bytes should beat the extra ALU work.

    MEASURED on v5e (round 5; 30-iter fori harness, 16 vmapped CIF
    streams, search 15, same-session back-to-back): **swar 6.60 ms/iter
    vs bf16 4.30 ms/iter -- 1.53x SLOWER** (hardware-EXACT vs the int64
    oracle, so the formulation is correct; it is just not faster).  The
    ~10 full-plane int-vector passes per dy (extract/bias/sub/mask/select
    x 2 pair-lanes) out-cost the 2 bf16 passes they replace: the VPU
    issues each SWAR op over the whole plane, so the kernel becomes
    ALU-issue-bound at ~7 ops/px and the 2x byte saving never matters.
    Together with round 4's Mosaic-rejected packed-i8 elementwise, this
    closes the sub-bf16-width avenue from both directions (native i8 ops:
    unlowereable; i32-SWAR emulation: ALU-bound).  The bf16 kernel's
    ~4 ms stands as the defended toolchain floor.  Kept in-tree, gated by
    the hardware parity suite, as the measured record."""
    side = 2 * search + 1
    wp = w // 4                     # packed words per row
    mbc = w // MB_SIZE
    rr = h // MB_SIZE
    cur = cur_ref[...]                              # (h, wp) int32 packed
    pw = pw_ref[...]                                # (wp, mbc) bf16
    sh = shifted_ref[0]                             # (h + 2s, wp) int32

    m00ff = jnp.int32(0x00FF00FF)
    bias = jnp.int32(0x01000100)
    bit8 = jnp.int32(0x00010001)

    def pair_absdiff(a, b):
        d1 = (a | bias) - b
        d2 = (b | bias) - a
        mask = ((jax.lax.shift_right_logical(d1, 8) & bit8)
                * jnp.int32(0xFFFF))
        return ((d1 & mask) | (d2 & ~mask)) & m00ff

    rows_list = []
    for dy in range(side):
        win = sh[dy:dy + h, :]
        a0 = cur & m00ff
        b0 = win & m00ff
        a1 = jax.lax.shift_right_logical(cur, 8) & m00ff
        b1 = jax.lax.shift_right_logical(win, 8) & m00ff
        ad = pair_absdiff(a0, b0) + pair_absdiff(a1, b1)   # fields <= 510
        rows_list.append(ad.reshape(rr, MB_SIZE, wp).sum(axis=1))  # (R, wp)
    rows = jnp.concatenate(rows_list, axis=0)       # (side*R, wp) int32
    # unpack the two 16-bit field sums (each <= 8160) and fold
    lo = rows & jnp.int32(0xFFFF)
    hi = jax.lax.shift_right_logical(rows, 16)
    v = (lo + hi).astype(jnp.float32)               # (side*R, wp) <= 16320
    h6 = jnp.floor(v * (1.0 / 64.0))                # <= 255, bf16-exact
    l6 = v - 64.0 * h6                              # <= 63, bf16-exact
    stacked = jnp.concatenate([h6.astype(jnp.bfloat16),
                               l6.astype(jnp.bfloat16)], axis=0)
    part = jax.lax.dot(stacked, pw,
                       preferred_element_type=jnp.float32)  # (2*side*R, mbc)
    n = side * rr
    out = 64.0 * part[:n] + part[n:]
    out_ref[0] = out.reshape(side, rr, mbc)


def _pack4(plane: jnp.ndarray) -> jnp.ndarray:
    """(h, w) integer plane -> (h, w/4) int32, 4 bytes per word (byte k of
    each word = pixel 4j+k), via uint32 arithmetic (byte 3 << 24 would
    overflow int32)."""
    p = plane.astype(jnp.uint32)
    v = (p[:, 0::4] | (p[:, 1::4] << 8) | (p[:, 2::4] << 16)
         | (p[:, 3::4] << 24))
    return jax.lax.bitcast_convert_type(v, jnp.int32)


@functools.partial(jax.jit, static_argnames=("search", "interpret"))
def sad_map_pallas_swar(cur_y: jnp.ndarray, ref_y: jnp.ndarray,
                        search: int = DEFAULT_SEARCH_RANGE,
                        interpret: bool = False) -> jnp.ndarray:
    """Same contract as sad_map_pallas; packed-int32 SWAR data path (see
    kernel docstring for the A/B record)."""
    h, w = cur_y.shape
    mb_rows, mb_cols = h // MB_SIZE, w // MB_SIZE
    n_mb = mb_rows * mb_cols
    side = 2 * search + 1

    cur = _pack4(cur_y)
    ref_pad = jnp.pad(ref_y.astype(jnp.int32), search)
    shifted = jnp.stack([_pack4(ref_pad[:, dx:dx + w]) for dx in range(side)])
    # packed-word -> MB column pooling matrix (w/4 words, 4 per MB)
    pw = np.zeros((w // 4, mb_cols), np.float32)
    for j in range(mb_cols):
        pw[j * 4:(j + 1) * 4, j] = 1.0

    out = pl.pallas_call(
        functools.partial(_sad_kernel_swar, h=h, w=w, search=search),
        grid=(side,),
        in_specs=[
            pl.BlockSpec((h, w // 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2 * search, w // 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w // 4, mb_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, side, mb_rows, mb_cols),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((side, side, mb_rows, mb_cols),
                                       jnp.float32),
        interpret=interpret,
    )(cur, shifted, jnp.asarray(pw, jnp.bfloat16))

    sads = jnp.swapaxes(out, 0, 1).reshape(side * side, n_mb)
    sads = sads.astype(jnp.int32)
    valid = _me_validity(h, w, n_mb, mb_cols, search)
    return jnp.where(valid, sads, jnp.int32(1 << 30))


#: single home for the out-of-picture offset mask (round-4 dedup: four
#: identical copies existed across me.py / me_pallas.py)
_me_validity = _validity_mask


def full_search_pallas(cur_y: jnp.ndarray, ref_y: jnp.ndarray,
                       search: int = DEFAULT_SEARCH_RANGE,
                       interpret: bool = False):
    """Drop-in replacement for kernels.me.full_search (same outputs,
    same scan-order tie-breaks)."""
    sads = sad_map_pallas_bf16(cur_y, ref_y, search, interpret)
    offs = jnp.asarray(offset_table(search))
    best_idx = jnp.argmin(sads, axis=0)
    best_sad = jnp.take_along_axis(sads, best_idx[None, :], axis=0)[0]
    sad0 = sads[zero_offset_index(search)]
    dydx = offs[best_idx]
    mv = jnp.stack([dydx[:, 1], dydx[:, 0]], axis=-1)
    return mv, best_sad, sad0
