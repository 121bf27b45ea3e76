"""Dynamic-window patch sampling with replicate borders.

TPU-native replacement for the reference tracker's host-side crop+resize
(``RectTools::subwindow`` with BORDER_REPLICATE followed by ``cv::resize``
bilinear, kcf_tracker/recttools.hpp:115-131, kcftracker.cpp:416-419): one
bilinear gather over the full image with coordinates clamped to the image
bounds.  The window origin/size may be traced values, so a single jitted
program serves every frame and every scale — no host round-trip per frame.

Coordinate convention matches cv::resize INTER_LINEAR exactly when the
window lies inside the image: output pixel j samples source coordinate
``x0 + (j + 0.5) * (src_w / out_w) - 0.5``.  When the window extends past
the image, clamping the absolute coordinate reproduces replicate padding
(up to the half-pixel edge of the resize grid — a documented divergence
from crop-then-resize, which replicates first and resamples second).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_patch_bilinear(image: jax.Array, x0, y0, src_w, src_h,
                          out_h: int, out_w: int) -> jax.Array:
    """Resample the ``src_h x src_w`` window at ``(x0, y0)`` to a static
    ``(out_h, out_w, C)`` float32 patch.

    Args:
      image: ``(H, W, C)`` or ``(H, W)``; any dtype (converted to f32).
      x0, y0: window origin in pixels (traced scalars OK, may be negative).
      src_w, src_h: window size in pixels (traced scalars OK).
      out_h, out_w: static output size.
    """
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    img = image.astype(jnp.float32)
    h, w = img.shape[:2]

    sx = src_w.astype(jnp.float32) / out_w if hasattr(src_w, "astype") \
        else jnp.float32(src_w) / out_w
    sy = src_h.astype(jnp.float32) / out_h if hasattr(src_h, "astype") \
        else jnp.float32(src_h) / out_h
    u = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * sx - 0.5 + x0
    v = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * sy - 0.5 + y0
    u = jnp.clip(u, 0.0, w - 1.0)
    v = jnp.clip(v, 0.0, h - 1.0)

    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    wu = (u - u0)[None, :, None]
    wv = (v - v0)[:, None, None]
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, w - 1)
    v1 = jnp.minimum(v0 + 1, h - 1)

    r0 = img[v0]                       # (out_h, W, C)
    r1 = img[v1]
    p00 = r0[:, u0]                    # (out_h, out_w, C)
    p01 = r0[:, u1]
    p10 = r1[:, u0]
    p11 = r1[:, u1]
    top = p00 * (1.0 - wu) + p01 * wu
    bot = p10 * (1.0 - wu) + p11 * wu
    out = top * (1.0 - wv) + bot * wv
    return out[..., 0] if squeeze else out
