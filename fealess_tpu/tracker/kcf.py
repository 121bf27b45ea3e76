"""Kernelized Correlation Filter tracker, fully on-device.

TPU-native re-design of ``KCFTracker`` (kcf_tracker/kcftracker.cpp:92-536):
the per-frame update — subwindow resample, FHOG (+Lab) features, Hann
window, Gaussian-kernel correlation in the Fourier domain, sub-pixel peak,
±1-step scale tests, and the α̂/template linear-interpolation train step —
is ONE jitted function over static feature shapes.  The reference runs this
on the host with cv::dft per channel; here the channel FFTs batch into a
single ``jnp.fft.fft2`` and the tracker state is an immutable pytree, so
frames (and independent trackers) can be vmapped/sharded.

Numeric conventions preserved from the reference:

- template-size fit and cell rounding (kcftracker.cpp:351-394): padded
  window scaled so its larger side equals ``template_size``, rounded to
  ``2*cell_size`` multiples plus ``2*cell_size``;
- feature layout: FHOG-31 of the resampled patch, border cells cropped
  (size_patch = tmpl/cell - 2), optional 15 Lab-centroid channels
  (kcftracker.cpp:434-478, labdata.hpp);
- Gaussian correlation with quadrant rearrange (fftshift) and the
  ``max(0, (|x|²+|z|²-2c)/N)`` distance (kcftracker.cpp:294-327);
- training ``α̂ = ŷ/(k̂xx+λ)`` with linear interpolation of both the
  template and α̂ (kcftracker.cpp:269-290);
- detection = argmax of ``real(ifft(α̂⊙k̂xz))`` + 1D quadratic sub-pixel
  peaks, offset by integer half-dims (kcftracker.cpp:233-266, 527-536);
- multi-scale: test 1/step and step, accept when ``scale_weight *
  new_peak > peak``, smaller scale first (kcftracker.cpp:188-211);
- ROI clamping before and after the position update (kcftracker.cpp:
  175-180, 213-218).

Divergences (documented): the crop+resize is one clamped bilinear gather
(fealess_tpu.ops.sampling); BGR→Lab uses the float CIE formula rather than
OpenCV's fixed-point 8-bit LUT; both only perturb features at patch edges
or by <1 Lab unit and do not change the tracker's fixed-point behaviour.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from fealess_tpu.config import KcfConfig
from fealess_tpu.ops.sampling import sample_patch_bilinear
from fealess_tpu.tracker import fhog

# The 15 fixed Lab cluster centroids (kcf_tracker/labdata.hpp:1-17).
LAB_CENTROIDS = np.array([
    [161.317504, 127.223401, 128.609333],
    [142.922425, 128.666965, 127.532319],
    [67.879757, 127.721830, 135.903311],
    [92.705062, 129.965717, 137.399500],
    [120.172257, 128.279647, 127.036493],
    [195.470568, 127.857070, 129.345415],
    [41.257102, 130.059468, 132.675336],
    [12.014861, 129.480555, 127.064714],
    [226.567086, 127.567831, 136.345727],
    [154.664210, 131.676606, 156.481669],
    [121.180447, 137.020793, 153.433743],
    [87.042204, 137.211742, 98.614874],
    [113.809537, 106.577104, 157.818094],
    [81.083293, 170.051905, 148.904079],
    [45.015485, 138.543124, 102.402528]], np.float32)


def kcf_reference_config(hog: bool = True, fixed_window: bool = True,
                         multiscale: bool = True,
                         lab: bool = True) -> KcfConfig:
    """The reference constructor's parameter resolution
    (kcftracker.cpp:92-160)."""
    lam, padding, out_sigma = 1e-4, 2.5, 0.125
    if hog:
        interp, sigma, cell = 0.012, 0.6, 4
        if lab:
            interp, sigma, out_sigma = 0.005, 0.4, 0.1
    else:
        interp, sigma, cell = 0.075, 0.2, 1
        lab = False   # "Lab features are only used with HOG features."
    if multiscale:
        template, step, fixed_window = 96, 1.05, True
    elif fixed_window:
        template, step = 96, 1.0
    else:
        template, step = 1, 1.0
    return KcfConfig(use_hog=hog, use_lab=lab,
                     use_fixed_window=fixed_window,
                     use_multiscale=multiscale, lambda_reg=lam,
                     padding=padding, output_sigma_factor=out_sigma,
                     interp_factor=interp, kernel_sigma=sigma,
                     cell_size=cell, template_size=template,
                     scale_step=step, scale_weight=0.95)


@struct.dataclass
class KcfState:
    """Immutable tracker state (the reference's mutable members _tmpl,
    _alphaf, _roi, _scale)."""
    tmpl: Any          # (C, Hc, Wc) f32
    alphaf: Any        # (Hc, Wc) complex64
    roi: Any           # (4,) f32: x, y, w, h
    scale: Any         # f32


def _bgr_to_lab_u8scale(bgr: jax.Array) -> jax.Array:
    """BGR (0..255 float) -> Lab in OpenCV 8U scaling: L*255/100, a+128,
    b+128 (float CIE D65 formula; see module docstring divergence note)."""
    rgb = bgr[..., ::-1] / 255.0
    lin = jnp.where(rgb > 0.04045,
                    ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    m = jnp.asarray([[0.412453, 0.357580, 0.180423],
                     [0.212671, 0.715160, 0.072169],
                     [0.019334, 0.119193, 0.950227]], jnp.float32)
    xyz = lin @ m.T
    xyz = xyz / jnp.asarray([0.950456, 1.0, 1.088754], jnp.float32)
    f = jnp.where(xyz > 0.008856, jnp.cbrt(xyz), 7.787 * xyz + 16.0 / 116.0)
    lum = jnp.where(xyz[..., 1] > 0.008856,
                    116.0 * f[..., 1] - 16.0, 903.3 * xyz[..., 1])
    a = 500.0 * (f[..., 0] - f[..., 1]) + 128.0
    b = 200.0 * (f[..., 1] - f[..., 2]) + 128.0
    return jnp.stack([lum * 255.0 / 100.0, a, b], axis=-1)


def _subpixel_peak(left, center, right):
    """1D quadratic peak interpolation (kcftracker.cpp:527-536)."""
    divisor = 2.0 * center - right - left
    return jnp.where(divisor == 0.0, 0.0, 0.5 * (right - left) / divisor)


class KcfTracker:
    """Host facade holding the static patch geometry and jitted steps.

    Usage::

        tracker = KcfTracker(kcf_reference_config())
        state = tracker.init((x, y, w, h), image_bgr_u8)
        state, roi = tracker.update(state, next_image)

    Re-init contract: ``init`` bakes the patch geometry, Hann window and
    Gaussian peak for the GIVEN ROI size (the reference bakes the same
    members once in KCFTracker::init, kcftracker.cpp:92-170, and is
    likewise one-object-per-instance).  ``update`` then tracks through
    the KCF scale pyramid.  To track a *different* object, or after an
    externally-imposed ROI whose aspect/size differs materially from the
    init ROI, call ``init`` again (fresh geometry + state) — reusing
    ``update`` across objects silently correlates against the old
    template geometry.  ``fealess_tpu.apps.track.TrackedRecognizer``
    follows this contract.
    """

    def __init__(self, cfg: KcfConfig | None = None):
        self.cfg = cfg or kcf_reference_config()
        self._geom = None   # (tmpl_w, tmpl_h, Hc, Wc, C, scale0)

    # -- geometry (getFeatures inithann branch, kcftracker.cpp:355-394)
    def _fit_template(self, roi_w: float, roi_h: float):
        c = self.cfg
        padded_w = int(roi_w * c.padding)
        padded_h = int(roi_h * c.padding)
        if c.template_size > 1:
            if padded_w >= padded_h:
                scale0 = padded_w / float(c.template_size)
            else:
                scale0 = padded_h / float(c.template_size)
            tw = int(padded_w / scale0)
            th = int(padded_h / scale0)
        else:
            tw, th, scale0 = padded_w, padded_h, 1.0
        k = c.cell_size
        if c.use_hog:
            tw = (tw // (2 * k)) * 2 * k + 2 * k
            th = (th // (2 * k)) * 2 * k + 2 * k
            hc, wc = th // k - 2, tw // k - 2
            nch = 31 + (LAB_CENTROIDS.shape[0] if c.use_lab else 0)
        else:
            tw, th = (tw // 2) * 2, (th // 2) * 2
            hc, wc, nch = th, tw, 1
        return tw, th, hc, wc, nch, scale0

    def init(self, roi: Tuple[float, float, float, float],
             image: np.ndarray) -> KcfState:
        """First-frame initialisation (KCFTracker::init)."""
        x, y, w, h = (float(v) for v in roi)
        geom = self._fit_template(w, h)
        if geom == self._geom and hasattr(self, "_update_jit"):
            # same patch geometry (multi-object bucket re-init): the
            # Hann window / Gaussian peak / jit caches stay valid
            return self._init_jit(jnp.asarray(image),
                                  jnp.asarray([x, y, w, h], jnp.float32),
                                  jnp.float32(geom[5]))
        self._geom = geom
        tw, th, hc, wc, nch, scale0 = self._geom
        c = self.cfg

        # Hann window (createHanningMats, kcftracker.cpp:497-523).
        def hann1(n):
            return 0.5 * (1.0 - np.cos(
                2.0 * np.pi * np.arange(n) / (n - 1)))
        # Host-side numpy constants: closed-over DEVICE arrays would be
        # fetched back to host during tracing (mlir constant embedding),
        # and complex transfers are unimplemented over the axon tunnel.
        self._hann = np.outer(hann1(hc), hann1(wc)).astype(np.float32)

        # Gaussian peak ŷ (createGaussianPeak, kcftracker.cpp:329-348).
        out_sigma = np.sqrt(float(wc * hc)) / c.padding \
            * c.output_sigma_factor
        mult = -0.5 / (out_sigma * out_sigma)
        iy = np.arange(hc)[:, None] - hc // 2
        ix = np.arange(wc)[None, :] - wc // 2
        peak = np.exp(mult * (iy * iy + ix * ix)).astype(np.float32)
        self._prob = np.fft.fft2(peak).astype(np.complex64)

        self._update_jit = jax.jit(self._update)
        self._init_jit = jax.jit(self._init_state)
        roi0 = jnp.asarray([x, y, w, h], jnp.float32)
        return self._init_jit(jnp.asarray(image), roi0,
                              jnp.float32(scale0))

    # -- feature extraction (getFeatures, kcftracker.cpp:351-494)
    def _features_at(self, image, cx, cy, eff_scale):
        """Feature map for a patch centred at (cx, cy) extracted at
        ``eff_scale`` (== scale_adjust * scale of getFeatures)."""
        c = self.cfg
        tw, th, hc, wc, nch, _ = self._geom
        ew = jnp.trunc(eff_scale * tw)
        eh = jnp.trunc(eff_scale * th)
        ex = jnp.trunc(cx - ew / 2.0)
        ey = jnp.trunc(cy - eh / 2.0)
        patch = sample_patch_bilinear(image, ex, ey, ew, eh, th, tw)
        if c.use_hog:
            f = fhog.fhog31(patch, c.cell_size)        # (Hc, Wc, 31)
            f = jnp.moveaxis(f, -1, 0)
            if c.use_lab:
                f = jnp.concatenate([f, self._lab(patch)], axis=0)
        else:
            gray = (patch[..., 0] * 0.114 + patch[..., 1] * 0.587
                    + patch[..., 2] * 0.299)
            f = (gray / 255.0 - 0.5)[None]
        return f * self._hann[None]

    def _features(self, image, roi, scale, scale_adjust):
        cx = roi[0] + roi[2] / 2.0
        cy = roi[1] + roi[3] / 2.0
        return self._features_at(image, cx, cy, scale_adjust * scale)

    def _lab(self, patch):
        """Cell-pooled Lab-centroid assignment histogram
        (kcftracker.cpp:434-478): each interior-cell pixel votes 1/k² for
        its nearest of the 15 centroids."""
        k = self.cfg.cell_size
        _, _, hc, wc, _, _ = self._geom
        lab = _bgr_to_lab_u8scale(patch)
        core = lab[k:k + hc * k, k:k + wc * k]
        cent = jnp.asarray(LAB_CENTROIDS)
        d = jnp.sum((core[..., None, :] - cent) ** 2, axis=-1)
        nearest = jnp.argmin(d, axis=-1)
        onehot = jax.nn.one_hot(nearest, cent.shape[0], dtype=jnp.float32)
        cells = onehot.reshape(hc, k, wc, k, -1).sum(axis=(1, 3)) / (k * k)
        return jnp.moveaxis(cells, -1, 0)              # (15, Hc, Wc)

    # -- Fourier-domain kernel machinery
    def _gaussian_correlation(self, x1, x2):
        """gaussianCorrelation (kcftracker.cpp:294-327); channel loop
        batched into one 2-D FFT over the channel axis."""
        sigma = self.cfg.kernel_sigma
        f1 = jnp.fft.fft2(x1)
        f2 = jnp.fft.fft2(x2)
        conv = jnp.fft.ifft2(f1 * jnp.conj(f2)).real
        c = jnp.fft.fftshift(jnp.sum(conv, axis=0))    # rearrange()
        d = (jnp.sum(x1 * x1) + jnp.sum(x2 * x2) - 2.0 * c) / x1.size
        return jnp.exp(-jnp.maximum(d, 0.0) / (sigma * sigma))

    def _correlation_pre(self, x, tmpl_fc, tmpl_energy, size):
        """gaussianCorrelation against a PRE-TRANSFORMED template:
        ``tmpl_fc = conj(fft2(tmpl))`` and its energy are constant across
        the per-frame scale detects, so hoisting them saves one
        31-channel FFT set per detect (3 per frame; measured win)."""
        sigma = self.cfg.kernel_sigma
        f1 = jnp.fft.fft2(x)
        conv = jnp.fft.ifft2(f1 * tmpl_fc).real
        c = jnp.fft.fftshift(jnp.sum(conv, axis=0))
        d = (jnp.sum(x * x) + tmpl_energy - 2.0 * c) / size
        return jnp.exp(-jnp.maximum(d, 0.0) / (sigma * sigma))

    def _detect(self, tmpl, x, alphaf, tmpl_fc=None, tmpl_energy=None):
        """detect (kcftracker.cpp:233-266): returns (dx, dy, peak).
        Pass ``tmpl_fc``/``tmpl_energy`` (conj template FFT + energy) to
        reuse them across the per-frame scale detects."""
        _, _, hc, wc, _, _ = self._geom
        if tmpl_fc is None:
            kxz = self._gaussian_correlation(x, tmpl)
        else:
            kxz = self._correlation_pre(x, tmpl_fc, tmpl_energy,
                                        tmpl.size)
        res = jnp.fft.ifft2(alphaf * jnp.fft.fft2(kxz)).real
        flat = jnp.argmax(res)
        py, px = flat // wc, flat % wc
        pv = res[py, px]
        left = res[py, jnp.maximum(px - 1, 0)]
        right = res[py, jnp.minimum(px + 1, wc - 1)]
        up = res[jnp.maximum(py - 1, 0), px]
        down = res[jnp.minimum(py + 1, hc - 1), px]
        fx = px.astype(jnp.float32) + jnp.where(
            (px > 0) & (px < wc - 1), _subpixel_peak(left, pv, right), 0.0)
        fy = py.astype(jnp.float32) + jnp.where(
            (py > 0) & (py < hc - 1), _subpixel_peak(up, pv, down), 0.0)
        return fx - wc // 2, fy - hc // 2, pv

    def _detect_batch(self, tmpl, xs, alphaf):
        """Batched detect over a leading variant axis: ONE FFT set for
        every scale candidate instead of sequential per-scale rounds
        (the scale tests of kcftracker.cpp:188-211 batched; VERDICT r4
        weak#7).  Identical math to :meth:`_detect` per row."""
        sigma = self.cfg.kernel_sigma
        f2c = jnp.conj(jnp.fft.fft2(tmpl))            # template FFT once
        f1 = jnp.fft.fft2(xs)                         # (B, C, Hc, Wc)
        conv = jnp.fft.ifft2(f1 * f2c[None]).real
        c = jnp.fft.fftshift(jnp.sum(conv, axis=1), axes=(-2, -1))
        d = (jnp.sum(xs * xs, axis=(1, 2, 3))[:, None, None]
             + jnp.sum(tmpl * tmpl) - 2.0 * c) / xs[0].size
        kxz = jnp.exp(-jnp.maximum(d, 0.0) / (sigma * sigma))
        res = jnp.fft.ifft2(alphaf[None] * jnp.fft.fft2(kxz)).real

        _, _, hc, wc, _, _ = self._geom

        def peak(r):
            flat = jnp.argmax(r)
            py, px = flat // wc, flat % wc
            pv = r[py, px]
            left = r[py, jnp.maximum(px - 1, 0)]
            right = r[py, jnp.minimum(px + 1, wc - 1)]
            up = r[jnp.maximum(py - 1, 0), px]
            down = r[jnp.minimum(py + 1, hc - 1), px]
            fx = px.astype(jnp.float32) + jnp.where(
                (px > 0) & (px < wc - 1),
                _subpixel_peak(left, pv, right), 0.0)
            fy = py.astype(jnp.float32) + jnp.where(
                (py > 0) & (py < hc - 1),
                _subpixel_peak(up, pv, down), 0.0)
            return fx - wc // 2, fy - hc // 2, pv

        return jax.vmap(peak)(res)

    def _train(self, state: KcfState, x, factor):
        """train (kcftracker.cpp:269-290).  The self-correlation's two
        FFT sets are the same transform — computed once."""
        sigma = self.cfg.kernel_sigma
        f = jnp.fft.fft2(x)
        conv = jnp.fft.ifft2(f * jnp.conj(f)).real
        c = jnp.fft.fftshift(jnp.sum(conv, axis=0))
        d = (2.0 * jnp.sum(x * x) - 2.0 * c) / x.size
        kxx = jnp.exp(-jnp.maximum(d, 0.0) / (sigma * sigma))
        alphaf_new = self._prob / (jnp.fft.fft2(kxx) + self.cfg.lambda_reg)
        return state.replace(
            tmpl=(1.0 - factor) * state.tmpl + factor * x,
            alphaf=(1.0 - factor) * state.alphaf + factor * alphaf_new)

    def _init_state(self, image, roi, scale0):
        tmpl = self._features(image, roi, scale0, jnp.float32(1.0))
        state = KcfState(tmpl=tmpl,
                         alphaf=jnp.zeros_like(self._prob),
                         roi=roi, scale=scale0)
        return self._train(state, tmpl, jnp.float32(1.0))

    # -- per-frame update (KCFTracker::update, kcftracker.cpp:173-230)
    def _update(self, state: KcfState, image):
        c = self.cfg
        h, w = image.shape[:2]
        rx, ry, rw, rh = state.roi
        rx = jnp.where(rx + rw <= 0, -rw + 1, rx)
        ry = jnp.where(ry + rh <= 0, -rh + 1, ry)
        rx = jnp.where(rx >= w - 1, jnp.float32(w - 2), rx)
        ry = jnp.where(ry >= h - 1, jnp.float32(h - 2), ry)
        roi = jnp.stack([rx, ry, rw, rh])
        cx = rx + rw / 2.0
        cy = ry + rh / 2.0
        scale = state.scale

        # The template's FFT set and energy are shared by every scale
        # detect of this frame — hoisted once (the reference recomputes
        # them inside each gaussianCorrelation, kcftracker.cpp:294-327;
        # sequential scale rounds measured FASTER on chip than a batched
        # 4-variant FFT set, which pays an always-on 4th extraction).
        tmpl_fc = jnp.conj(jnp.fft.fft2(state.tmpl))
        tmpl_energy = jnp.sum(state.tmpl * state.tmpl)

        x1 = self._features(image, roi, scale, jnp.float32(1.0))
        dx, dy, pv = self._detect(state.tmpl, x1, state.alphaf,
                                  tmpl_fc, tmpl_energy)

        if c.use_multiscale and c.scale_step != 1.0:
            step = jnp.float32(c.scale_step)
            xs = self._features(image, roi, scale, 1.0 / step)
            dxs, dys, pvs = self._detect(state.tmpl, xs, state.alphaf,
                                         tmpl_fc, tmpl_energy)
            take = c.scale_weight * pvs > pv
            dx, dy, pv = (jnp.where(take, dxs, dx),
                          jnp.where(take, dys, dy),
                          jnp.where(take, pvs, pv))
            scale = jnp.where(take, scale / step, scale)
            rw = jnp.where(take, rw / step, rw)
            rh = jnp.where(take, rh / step, rh)

            # The reference runs the bigger-scale test AFTER _scale/_roi
            # were possibly shrunk by the smaller-scale test
            # (kcftracker.cpp:188-211) — reproduce that exactly.
            roi_b = jnp.stack([rx, ry, rw, rh])
            xb = self._features(image, roi_b, scale, step)
            dxb, dyb, pvb = self._detect(state.tmpl, xb, state.alphaf,
                                         tmpl_fc, tmpl_energy)
            take = c.scale_weight * pvb > pv
            dx, dy, pv = (jnp.where(take, dxb, dx),
                          jnp.where(take, dyb, dy),
                          jnp.where(take, pvb, pv))
            scale = jnp.where(take, scale * step, scale)
            rw = jnp.where(take, rw * step, rw)
            rh = jnp.where(take, rh * step, rh)

        rx = cx - rw / 2.0 + dx * c.cell_size * scale
        ry = cy - rh / 2.0 + dy * c.cell_size * scale
        rx = jnp.where(rx >= w - 1, jnp.float32(w - 1), rx)
        ry = jnp.where(ry >= h - 1, jnp.float32(h - 1), ry)
        rx = jnp.where(rx + rw <= 0, -rw + 2, rx)
        ry = jnp.where(ry + rh <= 0, -rh + 2, ry)
        roi = jnp.stack([rx, ry, rw, rh])

        x2 = self._features(image, roi, scale, jnp.float32(1.0))
        state = self._train(
            state.replace(roi=roi, scale=scale), x2,
            jnp.float32(c.interp_factor))
        return state, pv

    def update(self, state: KcfState,
               image: np.ndarray) -> Tuple[KcfState, np.ndarray]:
        """Track one frame; returns (new_state, roi[x, y, w, h])."""
        state, _ = self._update_jit(state, jnp.asarray(image))
        return state, np.asarray(state.roi)

    # -- batched multi-object tracking (shared geometry)
    def update_batch(self, states: KcfState, image):
        """vmapped per-frame update over a STACKED state batch (leading
        axis = tracker instance).  All trackers must share this
        instance's patch geometry (same init ROI size bucket) — the
        per-size-bucket design of multi-object tracking; see
        apps.track.MultiTrackedRecognizer.  Returns the updated state
        batch (peak values dropped)."""
        return jax.vmap(lambda s: self._update(s, image)[0])(states)

    def update_batch_jit(self, states: KcfState, image) -> KcfState:
        """Jitted :meth:`update_batch` (compiled once per batch size)."""
        if not hasattr(self, "_ubatch_jit"):
            self._ubatch_jit = jax.jit(self.update_batch)
        return self._ubatch_jit(states, jnp.asarray(image))

    @staticmethod
    def stack_states(states) -> KcfState:
        import jax as _jax
        return _jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    @staticmethod
    def unstack_states(batch: KcfState):
        import jax as _jax
        n = batch.roi.shape[0]
        return [_jax.tree.map(lambda x: x[i], batch) for i in range(n)]
