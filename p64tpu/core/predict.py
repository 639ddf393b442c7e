"""Motion-compensated prediction, batched over macroblocks.

Reference behavior: per-MB prediction fetch from the old frame store with
optional loop filtering (SURVEY section 3a; p64.c/io.c, unverified -- mount
empty).  TPU-native: one gather per plane builds all MB predictions at once
from index grids; the loop filter runs as a batched 8x8 kernel on the
selected MBs.

Conventions:
  * mv = (mvx, mvy); positive x is right, positive y is down ([SPEC]).
  * chroma vectors are the luma vector halved with truncation toward zero
    ([SPEC] H.261 section 3.2.2).
  * MVs never point outside the picture (guaranteed by the ME window clip),
    so the gathers need no edge clamping; indices are asserted in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..spec.constants import BLOCK_SIZE, MB_SIZE, Format
from .blocks import mb_to_yblocks, yblocks_to_mb
from ..kernels.filter import loop_filter8x8


def _gather_tiles(plane: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray,
                  tile: int) -> jnp.ndarray:
    """plane (H, W), per-tile top-left (n,), -> (n, tile, tile)."""
    ar = jnp.arange(tile, dtype=jnp.int32)
    rows = y0[:, None] + ar[None, :]          # (n, tile)
    cols = x0[:, None] + ar[None, :]
    return plane[rows[:, :, None], cols[:, None, :]]


def _halve_mv(v: jnp.ndarray) -> jnp.ndarray:
    """Truncate-toward-zero halving for chroma vectors."""
    return jnp.sign(v) * (jnp.abs(v) // 2)


def _predict_plane_select(plane: jnp.ndarray, mvx_mb: jnp.ndarray,
                          mvy_mb: jnp.ndarray, mb_rows: int, mb_cols: int,
                          tile: int, search: int) -> jnp.ndarray:
    """Shift-and-select MC prediction of a whole plane (gather-free).

    TPU rationale: per-MB window gathers are ~40x slower than elementwise
    work on v5e.  Since each component of an MB's displacement is one of
    only (2*search+1) values, prediction is a pure SELECT over statically
    shifted copies, separable in x and y, done per MB-row strip:

      strip r (tile rows) selects, per MB column, first among the dx-shifted
      columns, then among the dy-shifted rows.

    mvx_mb / mvy_mb: (nMB,) per-MB displacement components.
    Returns the predicted plane (H, W) int32.
    """
    h, w = plane.shape
    side = 2 * search + 1
    pad = jnp.pad(plane.astype(jnp.int32), search)
    # (R, tile + 2*search, w + 2*search) overlapping row strips
    strips = jnp.stack([
        jax.lax.slice_in_dim(pad, r * tile, r * tile + tile + 2 * search,
                             axis=0)
        for r in range(mb_rows)])

    mvx = mvx_mb.reshape(mb_rows, mb_cols)
    mvy = mvy_mb.reshape(mb_rows, mb_cols)
    # per-output-column maps (R, w)
    dx_cols = jnp.repeat(mvx, tile, axis=1)
    dy_cols = jnp.repeat(mvy, tile, axis=1)

    acc1 = jnp.zeros((mb_rows, tile + 2 * search, w), jnp.int32)
    for dx in range(-search, search + 1):
        cand = jax.lax.slice_in_dim(strips, dx + search,
                                    dx + search + w, axis=2)
        acc1 = jnp.where((dx_cols == dx)[:, None, :], cand, acc1)

    acc2 = jnp.zeros((mb_rows, tile, w), jnp.int32)
    for dy in range(-search, search + 1):
        cand = jax.lax.slice_in_dim(acc1, dy + search,
                                    dy + search + tile, axis=1)
        acc2 = jnp.where((dy_cols == dy)[:, None, :], cand, acc2)
    del side
    return acc2.reshape(h, w)


def mc_predict(ref_y: jnp.ndarray, ref_cb: jnp.ndarray, ref_cr: jnp.ndarray,
               mv: jnp.ndarray, fil: jnp.ndarray, fmt: Format):
    """Build per-MB predictions from the reference frame (gather-free;
    see _predict_plane_select for the TPU rationale).

    Args:
      ref_y / ref_cb / ref_cr: reference planes (H,W), (H/2,W/2), (H/2,W/2).
      mv:  (nMB, 2) int32 (mvx, mvy), raster MB order; pass zeros for
           non-MC macroblocks.
      fil: (nMB,) bool -- apply the loop filter to this MB's prediction.

    Returns:
      (pred_y_mbs (nMB,16,16), pred_cb (nMB,8,8), pred_cr (nMB,8,8)) int32.
    """
    from .blocks import chroma_to_blocks, luma_to_mbs

    plane_y = _predict_plane_select(
        ref_y, mv[:, 0], mv[:, 1], fmt.mb_rows, fmt.mb_cols, MB_SIZE, 15)
    pred_y = luma_to_mbs(plane_y)

    cmv = _halve_mv(mv)
    plane_cb = _predict_plane_select(
        ref_cb, cmv[:, 0], cmv[:, 1], fmt.mb_rows, fmt.mb_cols, BLOCK_SIZE,
        7)
    plane_cr = _predict_plane_select(
        ref_cr, cmv[:, 0], cmv[:, 1], fmt.mb_rows, fmt.mb_cols, BLOCK_SIZE,
        7)
    pred_cb = chroma_to_blocks(plane_cb)
    pred_cr = chroma_to_blocks(plane_cr)

    return _apply_filter(pred_y, pred_cb, pred_cr, fil)


def _apply_filter(pred_y, pred_cb, pred_cr, fil):
    # Loop filter: luma as four 8x8 quadrant blocks, chroma per block.
    f = fil[:, None, None]
    yb = mb_to_yblocks(pred_y)
    yb = jnp.where(f[:, None], loop_filter8x8(yb), yb)
    pred_y = yblocks_to_mb(yb)
    pred_cb = jnp.where(f, loop_filter8x8(pred_cb), pred_cb)
    pred_cr = jnp.where(f, loop_filter8x8(pred_cr), pred_cr)
    return pred_y, pred_cb, pred_cr


def mc_predict_gather(ref_y: jnp.ndarray, ref_cb: jnp.ndarray,
                      ref_cr: jnp.ndarray, mv: jnp.ndarray,
                      fil: jnp.ndarray, fmt: Format):
    """Reference implementation of mc_predict via per-MB window gathers
    (kept as the oracle for the select-based production path)."""
    n_mb = fmt.num_mbs
    mbc = fmt.mb_cols
    idx = jnp.arange(n_mb, dtype=jnp.int32)
    y0 = (idx // mbc) * MB_SIZE + mv[:, 1]
    x0 = (idx % mbc) * MB_SIZE + mv[:, 0]
    pred_y = _gather_tiles(ref_y.astype(jnp.int32), y0, x0, MB_SIZE)

    cmv = _halve_mv(mv)
    cy0 = (idx // mbc) * BLOCK_SIZE + cmv[:, 1]
    cx0 = (idx % mbc) * BLOCK_SIZE + cmv[:, 0]
    pred_cb = _gather_tiles(ref_cb.astype(jnp.int32), cy0, cx0, BLOCK_SIZE)
    pred_cr = _gather_tiles(ref_cr.astype(jnp.int32), cy0, cx0, BLOCK_SIZE)
    return _apply_filter(pred_y, pred_cb, pred_cr, fil)
