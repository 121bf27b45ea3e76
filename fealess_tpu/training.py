"""Template extraction (the offline training path).

Reimplements ``Detector::addTemplate`` (linemod/linemod.cpp:1579-1615):
quantize each modality, extract candidate features per pyramid level, pick
scattered features greedily, crop all templates of the view to a common
bounding box.  Quantization runs through the jitted TPU front-end
(fealess_tpu.ops.quantize); candidate scoring/greedy selection are
inherently sequential (selectScatteredFeatures, linemod.cpp:135-164) and
run host-side in NumPy — this is the offline path, executed once per
training view.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np

from fealess_tpu import config as cfg
from fealess_tpu.bank import TemplateView
from fealess_tpu.io import native as native_host
from fealess_tpu.ops import image as fi
from fealess_tpu.ops import quantize as q


def _get_label(bitmask: int) -> int:
    """1 << k -> k (linemod.cpp:15-30)."""
    lut = {1: 0, 2: 1, 4: 2, 8: 3, 16: 4, 32: 5, 64: 6, 128: 7}
    return lut[int(bitmask)]


# vectorized _get_label: candidate pixels hold one-hot bitmasks
_LABEL_LUT = np.full(256, -1, np.int32)
for _k in range(8):
    _LABEL_LUT[1 << _k] = _k


def _erode3_np(mask: np.ndarray, iterations: int = 1) -> np.ndarray:
    """3x3 binary erosion, BORDER_REPLICATE — numpy twin of
    ops.image.erode3_bool (element-equal, tested).  Host-side so the
    training extraction never pays a device round trip per view."""
    m = mask.astype(bool)
    for _ in range(iterations):
        p = np.pad(m, 1, mode="edge")
        h, w = m.shape
        acc = np.ones_like(m)
        for dy in range(3):
            for dx in range(3):
                acc &= p[dy:dy + h, dx:dx + w]
        m = acc
    return m


def select_scattered_features(candidates: np.ndarray, scores: np.ndarray,
                              num_features: int, distance: float) -> np.ndarray:
    """Greedy scattered-feature selection (linemod.cpp:135-164).

    ``candidates`` is (K, 3) int (x, y, label) already stable-sorted by
    descending score; returns (num_features, 3).
    """
    feats: List[np.ndarray] = []
    distance_sq = distance * distance
    i = 0
    k = len(candidates)
    while len(feats) < num_features:
        c = candidates[i]
        keep = True
        for f in feats:
            dx = int(c[0]) - int(f[0])
            dy = int(c[1]) - int(f[1])
            if dx * dx + dy * dy < distance_sq:
                keep = False
                break
        if keep:
            feats.append(c)
        i += 1
        if i == k:
            i = 0
            distance -= 1.0
            distance_sq = distance * distance
    return np.stack(feats).astype(np.int32)


def _stable_sort_desc(scores: np.ndarray) -> np.ndarray:
    """Indices of a stable descending sort (std::stable_sort with
    score > rhs.score, linemod.hpp:98-101)."""
    return np.argsort(-scores, kind="stable")


def extract_gradient_template(angle_bits: np.ndarray, magnitude: np.ndarray,
                              mask: Optional[np.ndarray],
                              num_features: int,
                              strong_threshold: float) -> Optional[np.ndarray]:
    """ColorGradientPyramid::extractTemplate (linemod.cpp:461-513).

    Candidate = border pixel (mask minus its erosion) with a quantized
    orientation and squared magnitude above strong_threshold^2; greedy
    scattered selection with initial distance |candidates|/nf + 1.
    Returns (nf, 3) int32 or None if too few candidates.

    Runs as one GIL-free native call when libfealess_host is available
    (bit-identical, tested in tests/test_native.py); the numpy path
    below is the fallback and the semantics reference.
    """
    native = native_host.extract_gradient_template(
        np.asarray(angle_bits), np.asarray(magnitude), mask,
        num_features, strong_threshold)
    if native is not NotImplemented:
        return native
    if mask is not None:
        eroded = _erode3_np(mask)
        local_mask = mask.astype(bool) & ~eroded
    else:
        local_mask = np.ones_like(angle_bits, bool)

    thr_sq = strong_threshold * strong_threshold
    sel = local_mask & (angle_bits > 0) & (magnitude > thr_sq)
    ys, xs = np.nonzero(sel)
    if len(ys) < num_features:
        return None
    labels = _LABEL_LUT[angle_bits[ys, xs]]
    scores = magnitude[ys, xs]
    order = _stable_sort_desc(scores)
    cand = np.stack([xs[order], ys[order], labels[order]], axis=-1)
    distance = float(len(cand) // num_features + 1)
    return native_host.select_scattered_features(cand, num_features,
                                                 distance)


def extract_normal_template(normal_bits: np.ndarray,
                            mask: Optional[np.ndarray],
                            num_features: int,
                            extract_threshold: int) -> Optional[np.ndarray]:
    """DepthNormalPyramid::extractTemplate (linemod.cpp:747-825).

    Per-label chessboard distance transforms + per-label count balancing,
    then greedy scattered selection with distance sqrt(area)/sqrt(nf)+1.5.

    Native fast path as in :func:`extract_gradient_template`.
    """
    native = native_host.extract_normal_template(
        np.asarray(normal_bits), mask, num_features, extract_threshold)
    if native is not NotImplemented:
        return native
    if mask is not None:
        local_mask = _erode3_np(mask, iterations=2)
    else:
        local_mask = None

    no_mask = local_mask is None
    h, w = normal_bits.shape
    distances = np.zeros((8, h, w), np.float32)
    for i in range(8):
        if no_mask:
            has_label = (normal_bits & (1 << i)) != 0
        else:
            has_label = local_mask & ((normal_bits & (1 << i)) != 0)
        distances[i] = native_host.chamfer_chessboard(has_label)

    sel_mask = np.ones((h, w), bool) if no_mask else local_mask
    ok = sel_mask & (normal_bits != 0) & (normal_bits != 255)
    ys, xs = np.nonzero(ok)
    labels = _LABEL_LUT[normal_bits[ys, xs]]
    scores = distances[labels, ys, xs]
    keep = scores >= extract_threshold
    ys, xs, labels, scores = ys[keep], xs[keep], labels[keep], scores[keep]
    if len(ys) < num_features:
        return None
    label_counts = np.bincount(labels, minlength=8).astype(np.float32)
    scores = scores / label_counts[labels]
    order = _stable_sort_desc(scores)
    cand = np.stack([xs[order], ys[order], labels[order]], axis=-1)
    area = float(h * w) if no_mask else float(local_mask.sum())
    distance = float(np.sqrt(area) / np.sqrt(float(num_features)) + 1.5)
    return native_host.select_scattered_features(cand, num_features,
                                                 distance)


def crop_template_view(features: List[List[np.ndarray]]):
    """cropTemplates (linemod.cpp:52-96): common bbox over all levels and
    modalities (coords scaled by 2^level), even-aligned origin; shifts
    features in place.  Returns (width, height, offset_x, offset_y) lists
    per level plus the level-0 bounding box rect."""
    min_x = min_y = np.iinfo(np.int32).max
    max_x = max_y = np.iinfo(np.int32).min
    for l, mods in enumerate(features):
        for feats in mods:
            if len(feats) == 0:
                continue
            xs = feats[:, 0].astype(np.int64) << l
            ys = feats[:, 1].astype(np.int64) << l
            min_x = min(min_x, int(xs.min()))
            min_y = min(min_y, int(ys.min()))
            max_x = max(max_x, int(xs.max()))
            max_y = max(max_y, int(ys.max()))
    if min_x % 2 == 1:
        min_x -= 1
    if min_y % 2 == 1:
        min_y -= 1

    levels = len(features)
    width = [(max_x - min_x) >> l for l in range(levels)]
    height = [(max_y - min_y) >> l for l in range(levels)]
    off_x = [min_x >> l for l in range(levels)]
    off_y = [min_y >> l for l in range(levels)]
    for l, mods in enumerate(features):
        for feats in mods:
            feats[:, 0] -= off_x[l]
            feats[:, 1] -= off_y[l]
    return width, height, off_x, off_y, (min_x, min_y, max_x - min_x,
                                         max_y - min_y)


def _batch_crop_rects(masks, shape_hw, levels: int, margin: int = 16):
    """Per-view crop rects (y0, x0) plus ONE static (ch, cw) covering
    every mask bbox + margin: the quantization kernels' reach (7x7 blur,
    hysteresis vote, 5x5 median, ring-5 plane fit) never exceeds
    ``margin``, so quantizing the crop equals quantizing the full frame
    at every candidate pixel.  Origins align to ``2**(levels-1)`` so
    pyrDown block parity matches the full-frame pyramid."""
    h, w = shape_hw
    al = 1 << (levels - 1)
    rects = []
    ch = cw = 0
    for m in masks:
        ys, xs = np.nonzero(m)
        y0 = max(int(ys.min()) - margin, 0)
        x0 = max(int(xs.min()) - margin, 0)
        y1 = min(int(ys.max()) + 1 + margin, h)
        x1 = min(int(xs.max()) + 1 + margin, w)
        y0 -= y0 % al
        x0 -= x0 % al
        rects.append((y0, x0, y1, x1))
        ch = max(ch, y1 - y0)
        cw = max(cw, x1 - x0)
    # static crop size: 16-aligned (even dims at every pyramid level)
    ch = min(-(-ch // 16) * 16, h // al * al)
    cw = min(-(-cw // 16) * 16, w // al * al)
    out = []
    for (y0, x0, y1, x1) in rects:
        y0 = min(y0, h - ch)
        x0 = min(x0, w - cw)
        out.append((y0 - y0 % al, x0 - x0 % al))
    return out, (ch, cw)


def add_templates_batched(bgrs, depths, masks, poses,
                          det: cfg.DetectorConfig,
                          workers: Optional[int] = None
                          ) -> List[Optional[TemplateView]]:
    """Batched ``add_template`` over N views — the TPU-native training
    path (VERDICT r4 weak#8): all views' quantization runs as ONE jitted
    vmapped device call over mask-bbox crops (one upload, one fetch —
    per-view dispatch would pay the host<->device round trip N times),
    and the inherently-sequential greedy extraction
    (selectScatteredFeatures, linemod.cpp:135-164) fans out across host
    threads (the native helpers release the GIL).  Produces views
    identical to sequential :func:`add_template` (tested): cropping is
    exactness-preserving (see :func:`_batch_crop_rects`) and feature
    coordinates are shifted back to frame coordinates.
    """
    import concurrent.futures as cf
    import functools

    import jax
    import jax.numpy as jnp

    cg, dn = det.color_gradient, det.depth_normal
    levels = det.pyramid_levels
    use_cg = "color_gradient" in det.modalities
    use_dn = "depth_normal" in det.modalities
    n = len(bgrs)
    masks_np = [np.asarray(m).astype(bool) for m in masks]
    rects, (ch, cw) = _batch_crop_rects(masks_np, bgrs[0].shape[:2], levels)

    bgr_c = np.stack([np.asarray(bgrs[i])[y0:y0 + ch, x0:x0 + cw]
                      for i, (y0, x0) in enumerate(rects)])
    dep_c = np.stack([np.asarray(depths[i])[y0:y0 + ch, x0:x0 + cw]
                      for i, (y0, x0) in enumerate(rects)])

    @functools.partial(jax.jit, static_argnums=(2,))
    def quantize_batch(bgr_b, dep_b, det):
        def one(bgr, depth):
            out = []
            src = bgr
            qdn = (q.quantize_normals(depth, dn.distance_threshold,
                                      dn.difference_threshold)
                   if use_dn else jnp.zeros_like(depth, jnp.uint8))
            for l in range(levels):
                if l > 0:
                    src = fi.pyr_down_u8(src)
                    qdn = qdn[::2, ::2]
                if use_cg:
                    ab, mag = q.quantize_gradients(src, cg.weak_threshold)
                else:
                    ab = jnp.zeros(src.shape[:2], jnp.uint8)
                    mag = jnp.zeros(src.shape[:2], jnp.float32)
                out.append((ab, mag, qdn))
            return tuple(out)
        return jax.vmap(one)(bgr_b, dep_b)

    qlevels = jax.device_get(quantize_batch(
        jnp.asarray(bgr_c), jnp.asarray(dep_c), det))

    def extract_one(i: int) -> Optional[TemplateView]:
        y0, x0 = rects[i]
        msk = masks_np[i][y0:y0 + ch, x0:x0 + cw]
        cg_nf, dn_nf = cg.num_features, dn.num_features
        dn_extract = dn.extract_threshold
        features: List[List[np.ndarray]] = []
        for l in range(levels):
            if l > 0:
                msk = msk[::2, ::2]
                cg_nf //= 2
                dn_nf //= 2
                dn_extract //= 2
            ab, mag, qdn = (a[i] for a in qlevels[l])
            mods: List[np.ndarray] = []
            if use_cg:
                feats = extract_gradient_template(ab, mag, msk, cg_nf,
                                                  cg.strong_threshold)
                if feats is None:
                    return None
                feats[:, 0] += x0 >> l
                feats[:, 1] += y0 >> l
                mods.append(feats)
            if use_dn:
                feats = extract_normal_template(qdn, msk, dn_nf, dn_extract)
                if feats is None:
                    return None
                feats[:, 0] += x0 >> l
                feats[:, 1] += y0 >> l
                mods.append(feats)
            features.append(mods)
        width, height, off_x, off_y, _ = crop_template_view(features)
        return TemplateView(features=features, width=width, height=height,
                            offset_x=off_x, offset_y=off_y,
                            pose=np.asarray(poses[i], np.float32))

    workers = workers or min(os.cpu_count() or 4, 16)
    with cf.ThreadPoolExecutor(max_workers=workers) as pool:
        return list(pool.map(extract_one, range(n)))


def add_template(bgr: np.ndarray, depth_mm: np.ndarray,
                 mask: Optional[np.ndarray], pose_13: np.ndarray,
                 det: cfg.DetectorConfig) -> Optional[TemplateView]:
    """Full addTemplate for one view: returns a TemplateView or None if any
    level/modality fails to yield enough features (linemod.cpp:1599-1605).

    Per-level parameter halving: num_features and extract_threshold are
    integer-halved each pyrDown (linemod.cpp:434-452, 721-739).  The
    ColorGradient modality re-quantizes a pyrDown'd image; DepthNormal
    NN-downsamples its level-0 quantized image.
    """
    cg, dn = det.color_gradient, det.depth_normal
    levels = det.pyramid_levels
    use_cg = "color_gradient" in det.modalities
    use_dn = "depth_normal" in det.modalities

    features: List[List[np.ndarray]] = []
    src = np.asarray(bgr)
    msk = None if mask is None else np.asarray(mask).astype(bool)
    normal = (np.asarray(q.quantize_normals(
        depth_mm.astype(np.uint16), dn.distance_threshold,
        dn.difference_threshold)) if use_dn else None)

    cg_nf, dn_nf = cg.num_features, dn.num_features
    dn_extract = dn.extract_threshold
    for l in range(levels):
        if l > 0:
            src = np.asarray(fi.pyr_down_u8(src))
            normal = None if normal is None else normal[::2, ::2]
            if msk is not None:
                msk = msk[::2, ::2]
            cg_nf //= 2
            dn_nf //= 2
            dn_extract //= 2

        mods: List[np.ndarray] = []
        if use_cg:
            angle_bits, magnitude = q.quantize_gradients(src,
                                                         cg.weak_threshold)
            cg_feats = extract_gradient_template(
                np.asarray(angle_bits), np.asarray(magnitude), msk, cg_nf,
                cg.strong_threshold)
            if cg_feats is None:
                return None
            mods.append(cg_feats)
        if use_dn:
            dn_feats = extract_normal_template(normal, msk, dn_nf,
                                               dn_extract)
            if dn_feats is None:
                return None
            mods.append(dn_feats)
        features.append(mods)

    width, height, off_x, off_y, _ = crop_template_view(features)
    return TemplateView(features=features, width=width, height=height,
                        offset_x=off_x, offset_y=off_y,
                        pose=np.asarray(pose_13, np.float32))
