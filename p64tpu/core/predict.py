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


def mc_predict(ref_y: jnp.ndarray, ref_cb: jnp.ndarray, ref_cr: jnp.ndarray,
               mv: jnp.ndarray, fil: jnp.ndarray, fmt: Format):
    """Build per-MB predictions from the reference frame.

    Args:
      ref_y / ref_cb / ref_cr: reference planes (H,W), (H/2,W/2), (H/2,W/2).
      mv:  (nMB, 2) int32 (mvx, mvy), raster MB order; pass zeros for
           non-MC macroblocks.
      fil: (nMB,) bool -- apply the loop filter to this MB's prediction.

    Returns:
      (pred_y_mbs (nMB,16,16), pred_cb (nMB,8,8), pred_cr (nMB,8,8)) int32.
    """
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

    # Loop filter: luma as four 8x8 quadrant blocks, chroma per block.
    f = fil[:, None, None]
    yb = mb_to_yblocks(pred_y)
    yb = jnp.where(f[:, None], loop_filter8x8(yb), yb)
    pred_y = yblocks_to_mb(yb)
    pred_cb = jnp.where(f, loop_filter8x8(pred_cb), pred_cb)
    pred_cr = jnp.where(f, loop_filter8x8(pred_cr), pred_cr)
    return pred_y, pred_cb, pred_cr
