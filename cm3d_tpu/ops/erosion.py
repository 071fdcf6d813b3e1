"""Binary mask erosion as an XLA reduce_window min-pool.

Replaces the reference's per-mask `cv2.erode(mask, np.ones((3,3)))` host round
trip (src/nuscenes/2d_to_3d.py:526-528). cv2's default border mode for erode
treats out-of-image neighbors as +inf (they never shrink the min), which is
exactly reduce_window's padding-with-init-value semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def erode3x3(masks: jax.Array) -> jax.Array:
    """3x3 binary erosion over the last two dims.

    Args:
      masks: [..., H, W] bool or uint8.

    Returns same shape/dtype: pixel survives iff its full in-image 3x3
    neighborhood is nonzero (out-of-image neighbors count as nonzero,
    matching cv2.erode's default BORDER_CONSTANT(+inf)).
    """
    orig_dtype = masks.dtype
    x = masks.astype(jnp.bool_)
    nd = x.ndim
    window = (1,) * (nd - 2) + (3, 3)
    strides = (1,) * nd
    padding = [(0, 0)] * (nd - 2) + [(1, 1), (1, 1)]
    out = jax.lax.reduce_window(
        x,
        jnp.array(True),
        jax.lax.bitwise_and,
        window_dimensions=window,
        window_strides=strides,
        padding=padding,
    )
    return out.astype(orig_dtype)
