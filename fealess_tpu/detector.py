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
    use_cg = "color_gradient" in det.modalities
    use_dn = "depth_normal" in det.modalities
    levels = []
    src = bgr
    qdn = (q.quantize_normals(depth_mm, dn.distance_threshold,
                              dn.difference_threshold) if use_dn else None)
    cg_mask = dn_mask = None
    if masks is not None:
        cg_mask, dn_mask = (masks * 2)[:2] if len(masks) == 1 else masks
    for l in range(det.pyramid_levels):
        if l > 0:
            src = fi.pyr_down_u8(src)
            qdn = None if qdn is None else qdn[::2, ::2]
            cg_mask = None if cg_mask is None else cg_mask[::2, ::2]
            dn_mask = None if dn_mask is None else dn_mask[::2, ::2]
        mods = []
        if use_cg:
            qcg = q.quantize_gradients(src, cg.weak_threshold)[0]
            mods.append(q.apply_mask(qcg, cg_mask))
        if use_dn:
            mods.append(q.apply_mask(qdn, dn_mask))
        levels.append(tuple(mods))
    return levels


def _offset(t: int) -> int:
    """Pixel offset of a decimated cell's reported position
    (linemod.cpp:1495, 1517)."""
    return t // 2 + (t % 2 - 1)


def response_planes(levels, det: cfg.DetectorConfig):
    """Decimated 2D response stacks per level: list of
    ((C_all, Hd, Wd) u8, (h, w)).  Channels concatenate the modalities
    (the "linear memories" of linemod.cpp:1060-1088, kept on a 2D grid
    so scoring is a dense conv)."""
    out = []
    for l, mods in enumerate(levels):
        t = det.t_at_level[l]
        h, w = mods[0].shape
        planes = jnp.concatenate(
            [response.build_level_2d(quant, t) for quant in mods], axis=0)
        out.append((planes, (h, w)))
    return out


def _kernel_hw(bank: TemplateBank, det: cfg.DetectorConfig, l: int,
               hd: int, wd: int) -> int:
    """One-hot conv kernel side at level ``l``: the template span in
    decimated cells (bank.max_span is the level-0 bbox side in px)."""
    if bank.max_span <= 0:
        return max(hd, wd)
    return min((bank.max_span >> l) // det.t_at_level[l] + 1, max(hd, wd))


def build_match_kernels(bank: TemplateBank, det: cfg.DetectorConfig,
                        grid_hw=None, levels=None):
    """Per-level one-hot conv kernels (N, C_all, kh, kh) bf16.

    Kernel ``w[n, c, dy, dx] = 1`` iff template ``n`` has a valid feature
    with channel ``c = m*8*T^2 + label*T^2 + (y%T)*T + (x%T)`` at
    decimated offset ``(y//T, x//T)``.  Template scoring is then one
    2D correlation per level on the MXU — the TPU reformulation of the
    reference's linear-memory SSE adds (linemod.cpp:1130-1214).  Frame
    independent: precompute per bank (engine caches them); also traceable
    under jit (scatter-add) for ad-hoc paths.

    ``levels`` selects which pyramid levels get a kernel (None = only the
    coarsest): since refinement levels score candidate 16x16 windows by
    feature gather (matchClass semantics, linemod.cpp:1509-1573), only the
    coarse whole-image pass needs the dense conv.  Unbuilt levels hold
    ``None``.
    """
    n = bank.capacity
    if levels is None:
        levels = (bank.levels - 1,)
    kernels = []
    for l in range(bank.levels):
        if l not in levels:
            kernels.append(None)
            continue
        t = det.t_at_level[l]
        if grid_hw is None:
            hd = det.image_height >> l
            wd = det.image_width >> l
            hd, wd = hd // t, wd // t
        else:
            hd, wd = grid_hw[l]
        k = _kernel_hw(bank, det, l, hd, wd)
        c_all = bank.modalities * 8 * t * t
        w = jnp.zeros((n, c_all, k, k), jnp.float32)
        nidx = jnp.broadcast_to(jnp.arange(n)[:, None],
                                bank.feat_x.shape[0:1]
                                + bank.feat_x.shape[3:4])
        for m in range(bank.modalities):
            fx = bank.feat_x[:, l, m]
            fy = bank.feat_y[:, l, m]
            fl = bank.feat_label[:, l, m]
            fv = bank.feat_valid[:, l, m]
            c = m * 8 * t * t + fl * (t * t) + (fy % t) * t + (fx % t)
            w = w.at[nidx, c, fy // t, fx // t].add(
                fv.astype(jnp.float32), mode="drop")
        kernels.append(w.astype(jnp.bfloat16))
    return tuple(kernels)


def _conv_scores(planes: jax.Array, w: jax.Array) -> jax.Array:
    """(C, Hd, Wd) u8 responses x (N, C, kh, kw) one-hot kernels ->
    (N, Hd, Wd) f32 raw scores (exact: responses 0..4 and 0/1 weights are
    exact in bf16; the MXU accumulates in f32)."""
    kh, kw = w.shape[2], w.shape[3]
    out = jax.lax.conv_general_dilated(
        planes[None].astype(jnp.bfloat16), w,
        window_strides=(1, 1),
        padding=((0, kh - 1), (0, kw - 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    return out[0]


def match_bank(bank: TemplateBank, bgr: jax.Array, depth_mm: jax.Array,
               threshold: float, det: cfg.DetectorConfig,
               masks: Optional[List] = None,
               kernels=None) -> Matches:
    """Full match over the template bank. All shapes static; jit-safe.

    ``kernels`` are the per-level one-hot conv kernels from
    :func:`build_match_kernels`; pass precomputed ones to skip the
    scatter-build (they depend only on the bank)."""
    levels = quantized_pyramid(bgr, depth_mm, det, masks)
    planes = response_planes(levels, det)
    return match_from_planes(bank, planes, threshold, det, kernels)


def match_from_planes(bank: TemplateBank, planes, threshold: float,
                      det: cfg.DetectorConfig, kernels=None) -> Matches:
    """Score the bank against decimated response planes.

    The coarse level computes DENSE all-template, all-position scores with
    one one-hot conv on the MXU (:func:`_conv_scores`) and feeds static
    top-K selection; finer levels score ONLY each surviving candidate's
    16x16 window by gathering that template's features from the decimated
    planes (O(K·F·256) — the cost shape of the reference's coarse-to-fine,
    linemod.cpp:1509-1573, instead of O(N·H·W·C·k²) dense convs that
    made 1k-template banks 2.4x slower).  Semantics of matchClass
    (linemod.cpp:1451-1577) except that candidates whose template would
    wrap across the row end score their true (zero-padded) value instead
    of the reference's flat-buffer wraparound mixture, and candidate
    positions are restricted to non-wrapping ones (a strict improvement:
    wrapped scores are noise the reference filters only implicitly);
    clamped refinement windows never wrap, so the gather and dense-conv
    formulations agree exactly there (tested)."""
    l_coarse = det.pyramid_levels - 1
    t_c = det.t_at_level[l_coarse]
    d_c, (h_c, w_c) = planes[l_coarse]
    hd, wd = h_c // t_c, w_c // t_c
    p = hd * wd
    n = bank.capacity
    k = det.max_candidates
    if kernels is None or kernels[l_coarse] is None:
        kernels = build_match_kernels(
            bank, det, grid_hw=[(pl_[0].shape[1], pl_[0].shape[2])
                                for pl_ in planes])

    # --- Coarse dense scores at the lowest level (linemod.cpp:1462-1506)
    raw = _conv_scores(d_c, kernels[l_coarse])          # (N, Hd, Wd) f32

    nf = bank.num_features()                  # (N, L)
    nf_c = nf[:, l_coarse]
    raw_thr = (2 * nf_c
               + (jnp.float32(threshold) / 100.0) * (2 * nf_c)
               + 0.5).astype(jnp.int32)
    wf = (bank.width[:, l_coarse] - 1) // t_c + 1
    hf = (bank.height[:, l_coarse] - 1) // t_c + 1
    px_idx = jnp.arange(wd)[None, None, :]
    py_idx = jnp.arange(hd)[None, :, None]
    cand_ok = ((raw.astype(jnp.int32) > raw_thr[:, None, None])
               & (px_idx <= (wd - wf)[:, None, None])
               & (py_idx <= (hd - hf)[:, None, None])
               & bank.valid[:, None, None])
    score = (raw * 100.0
             / (4 * jnp.maximum(nf_c, 1))[:, None, None].astype(jnp.float32))
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

    # --- Local refinement up the pyramid (linemod.cpp:1509-1573):
    # candidate-windowed feature gather — only the K survivors' templates
    # are scored, over their 16x16 windows (similarityLocal semantics).
    for l in range(det.pyramid_levels - 2, -1, -1):
        t = det.t_at_level[l]
        d_l, (h, w) = planes[l]
        hd_l, wd_l = h // t, w // t
        border = 8 * t
        offs = _offset(t)
        width_l = bank.width[tslot, l]
        height_l = bank.height[tslot, l]
        nf_l = jnp.maximum(nf[tslot, l], 1)

        x = jnp.minimum(jnp.maximum(x * 2 + 1, border), w - width_l - border)
        y = jnp.minimum(jnp.maximum(y * 2 + 1, border), h - height_l - border)

        win = similarity.LOCAL_WINDOW
        px0 = x // t - 8
        py0 = y // t - 8
        fx = bank.feat_x[tslot, l]                      # (K, M, F)
        fy = bank.feat_y[tslot, l]
        fl = bank.feat_label[tslot, l]
        fv = bank.feat_valid[tslot, l]
        m_idx = jnp.arange(bank.modalities, dtype=jnp.int32)[None, :, None]
        feat_c = (m_idx * 8 + fl) * (t * t) + (fy % t) * t + (fx % t)
        feat_base = ((py0[:, None, None] + fy // t) * wd_l
                     + (px0[:, None, None] + fx // t))
        p_l = hd_l * wd_l
        stride = p_l + (win - 1) * wd_l + win
        d_flat = jnp.pad(d_l.reshape(d_l.shape[0], p_l),
                         ((0, 0), (0, stride - p_l))).reshape(-1)
        total = similarity.local_similarity(
            d_flat, feat_c.reshape(k, -1), feat_base.reshape(k, -1),
            fv.reshape(k, -1), stride, wd_l).astype(jnp.float32)

        best = jnp.max(total, axis=1)
        best_idx = jnp.argmax(total, axis=1)       # first max, row-major
        best_r, best_c = best_idx // win, best_idx % win
        x = (x // t - 8 + best_c) * t + offs
        y = (y // t - 8 + best_r) * t + offs
        sim = best * 100.0 / (4 * nf_l).astype(jnp.float32)
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
                   threshold: float, det: cfg.DetectorConfig,
                   kernels=None) -> Matches:
    return match_bank(bank, bgr, depth_mm, threshold, det, kernels=kernels)


@functools.partial(jax.jit, static_argnames=("threshold", "det"))
def match_bank_masked_jit(bank: TemplateBank, bgr: jax.Array,
                          depth_mm: jax.Array, roi_mask: jax.Array,
                          threshold: float,
                          det: cfg.DetectorConfig, kernels=None) -> Matches:
    """Match gated by a level-0 ROI mask applied to both modalities (the
    KCF-gated re-detection path of the reference demo,
    test/linemod_acq.cpp:136-191)."""
    return match_bank(bank, bgr, depth_mm, threshold, det,
                      masks=[roi_mask, roi_mask], kernels=kernels)
