"""The LINE-MOD detector match path, as one jittable function.

Reproduces ``Detector::match``/``matchClass`` (linemod/linemod.cpp:
1356-1577) with static shapes:

- quantized pyramid -> spread -> response maps -> decimated planes per
  (level, modality) (the dense reformulation of "linear memories"),
- coarse whole-image scores for EVERY template at the lowest pyramid level
  (the reference loops templates serially; here it is one batched gather),
- static top-K candidate selection (the reference keeps all
  above-threshold candidates; we keep the K best by score, K =
  ``DetectorConfig.max_candidates`` — a documented divergence that is
  lossless whenever the scene has fewer than K candidate detections),
- per-level 16x16 local refinement with the exact clamp/offset/score
  arithmetic of matchClass (linemod.cpp:1509-1573),
- final (similarity desc, template_id asc) ordering with duplicate
  suppression (linemod.cpp:1437-1439).

Scores match the reference bit-for-bit: raw threshold
``int(2nf + thr/100*2nf + 0.5)``, coarse score ``raw*100/(4nf)+0.5``,
refined score ``best*100/(4nf)`` (linemod.cpp:1487, 1502, 1566).
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from fealess_tpu import config as cfg
from fealess_tpu.bank import TemplateBank
from fealess_tpu.ops import image as fi
from fealess_tpu.ops import quantize as q
from fealess_tpu.ops import response, similarity


@struct.dataclass
class Matches:
    """Static-K match results (cf. cup_linemod::Match, linemod.hpp:253-286).

    ``template_slot`` indexes the packed bank; ``class_idx``/``template_idx``
    recover the reference's (class_id, template_id) pair.  Sorted by
    (similarity desc, template_idx asc); ``valid`` gates live entries.
    """
    x: Any
    y: Any
    similarity: Any
    template_slot: Any
    class_idx: Any
    template_idx: Any
    valid: Any


def quantized_pyramid(bgr: jax.Array, depth_mm: jax.Array,
                      det: cfg.DetectorConfig,
                      masks: Optional[List] = None):
    """Per-level (quantized_cg, quantized_dn) images (Detector::match
    pyramid construction, linemod.cpp:1388-1416).

    ColorGradient re-quantizes a pyrDown'd source; DepthNormal
    NN-downsamples its level-0 quantized image (linemod.cpp:434-452,
    721-739).  ``masks``, when given, is [cg_mask, dn_mask] at level 0.
    """
    cg, dn = det.color_gradient, det.depth_normal
    levels = []
    src = bgr
    qdn = q.quantize_normals(depth_mm, dn.distance_threshold,
                             dn.difference_threshold)
    cg_mask = dn_mask = None
    if masks is not None:
        cg_mask, dn_mask = masks
    for l in range(det.pyramid_levels):
        if l > 0:
            src = fi.pyr_down_u8(src)
            qdn = qdn[::2, ::2]
            cg_mask = None if cg_mask is None else cg_mask[::2, ::2]
            dn_mask = None if dn_mask is None else dn_mask[::2, ::2]
        qcg = q.quantize_gradients(src, cg.weak_threshold)[0]
        levels.append((q.apply_mask(qcg, cg_mask),
                       q.apply_mask(qdn, dn_mask)))
    return levels


def _offset(t: int) -> int:
    """Pixel offset of a decimated cell's reported position
    (linemod.cpp:1495, 1517)."""
    return t // 2 + (t % 2 - 1)


def linear_memories(levels, det: cfg.DetectorConfig):
    """Decimated response planes per level: list of
    (dpad (M, C, 2P), d_flat (M, C*stride), sizes, stride)."""
    out = []
    for l, mods in enumerate(levels):
        t = det.t_at_level[l]
        h, w = mods[0].shape
        hd, wd = h // t, w // t
        p = hd * wd
        stride = p + 16 * wd + 16
        dpad_m, dflat_m = [], []
        for quant in mods:
            d = response.build_level(quant, t)          # (C, P)
            c = d.shape[0]
            dpad = jnp.zeros((c, 2 * p), jnp.uint8).at[:, :p].set(d)
            dflat = jnp.zeros((c, stride), jnp.uint8).at[:, :p].set(d)
            dpad_m.append(dpad)
            dflat_m.append(dflat.reshape(-1))
        out.append((jnp.stack(dpad_m), jnp.stack(dflat_m), (h, w), stride))
    return out


def match_bank(bank: TemplateBank, bgr: jax.Array, depth_mm: jax.Array,
               threshold: float, det: cfg.DetectorConfig,
               masks: Optional[List] = None) -> Matches:
    """Full match over the template bank. All shapes static; jit-safe."""
    levels = quantized_pyramid(bgr, depth_mm, det, masks)
    lms = linear_memories(levels, det)
    return match_from_memories(bank, lms, threshold, det)


def match_from_memories(bank: TemplateBank, lms, threshold: float,
                        det: cfg.DetectorConfig) -> Matches:
    n_mod = bank.modalities
    l_coarse = det.pyramid_levels - 1
    t_c = det.t_at_level[l_coarse]
    dpad, _, (h_c, w_c), _ = lms[l_coarse]
    hd, wd = h_c // t_c, w_c // t_c
    p = hd * wd
    n = bank.capacity
    k = det.max_candidates

    # --- Coarse whole-image scores at the lowest level (linemod.cpp:1462-1506)
    raw = jnp.zeros((n, p), jnp.int32)
    for m in range(n_mod):
        c, off = similarity.pack_features(
            bank.feat_x[:, l_coarse, m], bank.feat_y[:, l_coarse, m],
            bank.feat_label[:, l_coarse, m], t_c, wd)
        raw = raw + similarity.whole_image_similarity(
            dpad[m], c, off, bank.feat_valid[:, l_coarse, m], p)

    nf = bank.num_features()                  # (N, L)
    nf_c = nf[:, l_coarse]
    raw_thr = (2 * nf_c
               + (jnp.float32(threshold) / 100.0) * (2 * nf_c)
               + 0.5).astype(jnp.int32)
    wf = (bank.width[:, l_coarse] - 1) // t_c + 1
    hf = (bank.height[:, l_coarse] - 1) // t_c + 1
    template_positions = (hd - hf) * wd + (wd - wf) + 1
    pos = jnp.arange(p)[None, :]
    cand_ok = ((raw > raw_thr[:, None])
               & (pos < template_positions[:, None])
               & bank.valid[:, None])
    score = raw.astype(jnp.float32) * 100.0 / (4 * jnp.maximum(nf_c, 1)
                                               )[:, None].astype(jnp.float32)
    score = score + 0.5
    flat = jnp.where(cand_ok, score, -jnp.inf).reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, k)
    tslot = top_idx // p
    pidx = top_idx % p
    off_c = _offset(t_c)
    x = (pidx % wd) * t_c + off_c
    y = (pidx // wd) * t_c + off_c
    sim = top_scores
    valid = jnp.isfinite(top_scores)

    # --- Local refinement up the pyramid (linemod.cpp:1509-1573)
    for l in range(det.pyramid_levels - 2, -1, -1):
        t = det.t_at_level[l]
        _, dflat, (h, w), stride = lms[l]
        wd_l = w // t
        border = 8 * t
        offs = _offset(t)
        width_l = bank.width[tslot, l]
        height_l = bank.height[tslot, l]
        nf_l = jnp.maximum(nf[tslot, l], 1)

        x = jnp.minimum(jnp.maximum(x * 2 + 1, border), w - width_l - border)
        y = jnp.minimum(jnp.maximum(y * 2 + 1, border), h - height_l - border)

        total = jnp.zeros((k, 256), jnp.int32)
        for m in range(n_mod):
            fx = bank.feat_x[tslot, l, m]          # (K, F)
            fy = bank.feat_y[tslot, l, m]
            fl = bank.feat_label[tslot, l, m]
            fv = bank.feat_valid[tslot, l, m]
            off_x = (x // t - 8) * t               # (K,)
            off_y = (y // t - 8) * t
            px = fx + off_x[:, None]
            py = fy + off_y[:, None]
            in_bounds = (px >= 0) & (px < w) & (py >= 0) & (py < h)
            c = fl * (t * t) + (fy % t) * t + (fx % t)
            base = (py // t) * wd_l + (px // t)
            total = total + similarity.local_similarity(
                dflat[m], c, base, fv & in_bounds, stride, wd_l)

        best = jnp.max(total, axis=1)
        best_idx = jnp.argmax(total, axis=1)       # first max, row-major
        best_r, best_c = best_idx // 16, best_idx % 16
        x = (x // t - 8 + best_c) * t + offs
        y = (y // t - 8 + best_r) * t + offs
        sim = best.astype(jnp.float32) * 100.0 / (4 * nf_l).astype(jnp.float32)
        valid = valid & (sim >= jnp.float32(threshold))

    # --- Final ordering + duplicate suppression (linemod.cpp:1437-1439)
    sim = jnp.where(valid, sim, -jnp.inf)
    tpl_idx = bank.template_idx[tslot]
    order = jnp.lexsort((tpl_idx, -sim))
    x, y, sim, tslot, valid = (x[order], y[order], sim[order], tslot[order],
                               valid[order])
    cls = bank.class_idx[tslot]
    tpl = bank.template_idx[tslot]
    same_as_prev = jnp.concatenate([
        jnp.array([False]),
        (x[1:] == x[:-1]) & (y[1:] == y[:-1]) & (sim[1:] == sim[:-1])
        & (cls[1:] == cls[:-1])])
    valid = valid & ~same_as_prev
    return Matches(x=x, y=y, similarity=sim, template_slot=tslot,
                   class_idx=cls, template_idx=tpl, valid=valid)


@functools.partial(jax.jit, static_argnames=("threshold", "det"))
def match_bank_jit(bank: TemplateBank, bgr: jax.Array, depth_mm: jax.Array,
                   threshold: float, det: cfg.DetectorConfig) -> Matches:
    return match_bank(bank, bgr, depth_mm, threshold, det)


@functools.partial(jax.jit, static_argnames=("threshold", "det"))
def match_bank_masked_jit(bank: TemplateBank, bgr: jax.Array,
                          depth_mm: jax.Array, roi_mask: jax.Array,
                          threshold: float,
                          det: cfg.DetectorConfig) -> Matches:
    """Match gated by a level-0 ROI mask applied to both modalities (the
    KCF-gated re-detection path of the reference demo,
    test/linemod_acq.cpp:136-191)."""
    return match_bank(bank, bgr, depth_mm, threshold, det,
                      masks=[roi_mask, roi_mask])
