"""Macroblock mode decisions (intra/inter, MC/no-MC, filter, forced update).

Reference behavior: per-MB threshold logic in the encoder control layer
driven by ME activity measures (SURVEY sections 2/3a: p64.c p64EncodeMDU
MTYPE decision, RM8-style curves; me.c variance outputs).  The mount was
EMPTY this round (SURVEY section 0), so the exact reference thresholds could
not be transplanted; this module centralizes OUR documented, RM8-inspired
integer rules behind `DecisionConfig` so that a later calibration against
the real reference only touches this file.

Rules (vectorized over all MBs on device):

  activity   var_or   = (sum(c^2)  - sum(c)^2  // 256) // 256   (original MB)
             var_diff = (sum(d^2)  - sum(d)^2  // 256) // 256   (d = MB - pred)
  MC         use_mc   iff  best_sad * mc_num < sad0 * mc_den  and mv != 0
  intra      var_diff > inter_var_floor  and  var_or < var_diff
  filter     on whenever MC is used (cfg.filter_with_mc)
  forced     refresh counter >= INTRA_REFRESH_PERIOD - 1 forces intra
             ([SPEC] H.261 section 4.2.3.4: at least once per 132 codings)
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..spec.constants import INTRA_REFRESH_PERIOD


@dataclasses.dataclass(frozen=True)
class DecisionConfig:
    """RM8-inspired decision constants (calibration-pending vs reference)."""

    mc_num: int = 107          # use MC iff best_sad * mc_num < sad0 * mc_den
    mc_den: int = 100
    inter_var_floor: int = 64  # var_diff <= floor => always inter
    filter_with_mc: bool = True


def _sq_div256(s1: jnp.ndarray) -> jnp.ndarray:
    """Exact s1*s1 // 256 without int32 overflow.

    |s1| reaches 65280 for a 16x16 sum, so the naive square reaches
    4.26e9 > 2^31 and WRAPS for any MB with mean luma > 181 (round-4
    review finding: a flat bright MB got variance 65536 instead of 0,
    silently flipping intra/inter decisions on bright content; jax
    int64 is unavailable without x64 mode).  With a = |s1| = 256*q + r:
    a^2 // 256 == 256*q*q + 2*q*r + (r*r) // 256 exactly -- the first
    two terms are integers, so the floor applies only to r*r; all terms
    stay < 2^25."""
    a = jnp.abs(s1)
    q = a >> 8
    r = a & 255
    return 256 * q * q + 2 * q * r + (r * r) // 256


def activity(pixels: jnp.ndarray) -> jnp.ndarray:
    """Integer per-MB activity: (sum(x^2) - sum(x)^2 // 256) // 256 over the
    last two (16, 16) axes."""
    x = pixels.astype(jnp.int32)
    s1 = x.sum(axis=(-2, -1))
    s2 = (x * x).sum(axis=(-2, -1))
    return (s2 - _sq_div256(s1)) // 256


def decide_modes(cur_mbs: jnp.ndarray,
                 pred0_mbs: jnp.ndarray,
                 predmv_mbs: jnp.ndarray,
                 sad0: jnp.ndarray,
                 best_sad: jnp.ndarray,
                 mv: jnp.ndarray,
                 refresh_count: jnp.ndarray,
                 force_intra_frame: jnp.ndarray,
                 cfg: DecisionConfig = DecisionConfig()):
    """Choose per-MB coding modes.

    Args:
      cur_mbs:     (nMB, 16, 16) current luma MBs.
      pred0_mbs:   (nMB, 16, 16) zero-MV prediction (previous recon).
      predmv_mbs:  (nMB, 16, 16) best-MV prediction (unfiltered).
      sad0/best_sad/mv: full-search outputs.
      refresh_count: (nMB,) int32 forced-update counters.
      force_intra_frame: scalar bool (first frame / -I flag).

    Returns dict with intra, use_mc, fil (all (nMB,) bool), mv_out
    ((nMB, 2), zeroed where MC unused), var_or, var_diff.
    """
    nonzero_mv = (mv != 0).any(axis=-1)
    use_mc = (best_sad * cfg.mc_num < sad0 * cfg.mc_den) & nonzero_mv

    pred = jnp.where(use_mc[:, None, None], predmv_mbs, pred0_mbs)
    var_or = activity(cur_mbs)
    diff = cur_mbs.astype(jnp.int32) - pred.astype(jnp.int32)
    s1 = diff.sum(axis=(-2, -1))
    s2 = (diff * diff).sum(axis=(-2, -1))
    var_diff = (s2 - _sq_div256(s1)) // 256   # overflow-safe, see helper

    forced = refresh_count >= (INTRA_REFRESH_PERIOD - 1)
    intra = (force_intra_frame
             | forced
             | ((var_diff > cfg.inter_var_floor) & (var_or < var_diff)))
    use_mc = use_mc & ~intra
    fil = use_mc & cfg.filter_with_mc
    mv_out = jnp.where(use_mc[:, None], mv, 0)
    return dict(intra=intra, use_mc=use_mc, fil=fil, mv_out=mv_out,
                var_or=var_or, var_diff=var_diff)
