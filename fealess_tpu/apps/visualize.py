"""Match visualization: feature circles and template blit overlays.

Reimplements the two ``drawResponse`` overloads (linemod/linemod_if.cpp:
65-139): draw each template feature as a circle of radius T/2 at the match
offset, color per modality; and blit the (grayscale) template image into
the match rect with per-pixel max.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from fealess_tpu.bank import TemplateBank

# modality colors (BGR) — linemod_if.cpp:68-72 (orange, green, ...)
COLORS = [(0, 140, 255), (0, 255, 0), (0, 255, 255), (0, 140, 255),
          (0, 0, 255)]


def draw_response(image: np.ndarray, bank: TemplateBank, slot: int,
                  offset_xy: Tuple[int, int], level: int = 0,
                  t: Optional[int] = None) -> np.ndarray:
    """Draw the matched template's features at ``offset_xy`` (in place).

    Circle radius T/2, color per modality (drawResponse #1,
    linemod_if.cpp:65-92)."""
    import cv2
    t = t or 5
    fx = np.asarray(bank.feat_x)[slot, level]
    fy = np.asarray(bank.feat_y)[slot, level]
    fv = np.asarray(bank.feat_valid)[slot, level]
    ox, oy = offset_xy
    for m in range(fx.shape[0]):
        color = COLORS[m % len(COLORS)]
        for x, y, ok in zip(fx[m], fy[m], fv[m]):
            if ok:
                cv2.circle(image, (int(x) + ox, int(y) + oy), t // 2,
                           color, 2)
    return image


def blit_template(image: np.ndarray, template_gray: np.ndarray,
                  offset_xy: Tuple[int, int]) -> np.ndarray:
    """Blit a template's grayscale pixels into the match rect with
    per-pixel max (drawResponse #2's overlay, linemod_if.cpp:96-139)."""
    ox, oy = offset_xy
    h, w = template_gray.shape[:2]
    ih, iw = image.shape[:2]
    x1 = min(ox + w, iw)
    y1 = min(oy + h, ih)
    if ox >= iw or oy >= ih or x1 <= max(ox, 0) or y1 <= max(oy, 0):
        return image
    sub = image[max(oy, 0):y1, max(ox, 0):x1]
    tpl = template_gray[max(oy, 0) - oy:y1 - oy, max(ox, 0) - ox:x1 - ox]
    if sub.ndim == 3 and tpl.ndim == 2:
        tpl = tpl[..., None]
    np.maximum(sub, tpl, out=sub)
    return image
