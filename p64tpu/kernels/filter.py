"""H.261 loop filter: separable 1/4*[1 2 1] applied to 8x8 prediction blocks.

Normative ([SPEC] H.261 section 3.2.3): a 2-D separable filter within each
8x8 block; at block edges the tap set degenerates to [0 1 0] (edge pixels
pass through in that dimension).  Arithmetic contract (ours, documented --
the reference's exact intermediate rounding is unverified, mount empty):
the two 1-D passes are combined WITHOUT intermediate rounding, then rounded
once:

    h[i][j] = p[i][j-1] + 2 p[i][j] + p[i][j+1]   (interior j)   else 4 p[i][j]
    out[i][j] = (h[i-1][j] + 2 h[i][j] + h[i+1][j] + 8) >> 4  (interior i)
                (4 h[i][j] + 8) >> 4                           (edge i)

Corners reduce to the identity; single-dimension edges reduce to the 1-D
filter with round-half-up.  Vectorized over a batch of 8x8 blocks.
"""

from __future__ import annotations

import jax.numpy as jnp


def _pass(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """One unnormalized [1 2 1] pass along `axis`; edges scaled by 4."""
    x = jnp.moveaxis(x, axis, -1)
    interior = x[..., :-2] + 2 * x[..., 1:-1] + x[..., 2:]
    out = jnp.concatenate(
        [4 * x[..., :1], interior, 4 * x[..., -1:]], axis=-1)
    return jnp.moveaxis(out, -1, axis)


def loop_filter8x8(blocks: jnp.ndarray) -> jnp.ndarray:
    """(..., 8, 8) int32 -> filtered (..., 8, 8) int32."""
    b = blocks.astype(jnp.int32)
    h = _pass(b, -1)
    v = _pass(h, -2)
    return (v + 8) >> 4
