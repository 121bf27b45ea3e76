"""Arbitrary serving geometry (VERDICT r4 weak#2): non-4:3 cameras pad
to the pyramid alignment instead of tripping the T-divisibility assert,
and processing widths beyond one 128-lane tile stay correct (CPU runs
the width-agnostic XLA scorers; the multi-tile Pallas kernels are
verified on chip by benchmarks/tpu_parity.py's wide check).
"""

import dataclasses

import cv2
import numpy as np
import pytest

from fealess_tpu import config as cfg
from fealess_tpu.engine import CamIntrinsics, ObjReco
from tests.test_engine import FX, FY, CX, CY, feature_dir  # noqa: F401
from tests.test_match_e2e import H, W


def _engine_with(feature_dir, width):
    path, _, _ = feature_dir
    ecfg = cfg.EngineConfig(
        detector=cfg.DetectorConfig(image_width=width, max_candidates=16),
        template_fx=FX, template_fy=FY, template_cx=CX, template_cy=CY,
        refine_crop=128)
    eng = ObjReco.create("LmICP", ecfg)
    eng.add_obj(path)
    return eng


def test_non_aligned_camera_pads(feature_dir):  # noqa: F811
    """A camera whose frame is not alignment-divisible serves via
    bottom/right padding: same scene content embedded in a 260x180
    canvas (not divisible by 80) must still detect at the right place."""
    _, (bgr, depth, mask), _ = feature_dir
    ch, cw = 180, 260
    big_bgr = np.zeros((ch, cw, 3), np.uint8)
    big_bgr[:H, :W] = bgr
    big_depth = np.zeros((ch, cw), np.uint16)
    big_depth[:H, :W] = depth
    eng = _engine_with(feature_dir, cw)
    cam = CamIntrinsics(fx=FX, fy=FY, cx=cw / 2.0, cy=ch / 2.0,
                        width=cw, height=ch)
    results = eng.recognition(big_bgr, big_depth, cam)
    assert results and results[0].similarity >= 90.0
    # processing dims were pinned to the padded alignment
    d = eng.cfg.detector
    align = d.pyramid_alignment
    assert d.image_width % align == 0 and d.image_height % align == 0
    assert d.image_width >= cw and d.image_height >= ch
    # principal-point shift (130, 90) vs the trained (120, 80) moves the
    # back-projected scene, so t ~ (-10*z/fx, -10*z/fy, 0)
    z = float(depth[mask].mean())
    t = results[0].world2cam[:3, 3]
    expect = np.array([-10.0 * z / FX, -10.0 * z / FY, 0.0])
    assert np.linalg.norm(t - expect) < 15.0, (t, expect)


def test_wide_processing_width(feature_dir, tmp_path):  # noqa: F811
    """Processing width 960 (level-0 grid 192 cells > one 128-lane tile):
    a bank trained at the wide scale, served on the high-resolution
    camera of the same physical scene, must agree with the native-width
    result (same physical geometry, 4x intrinsics)."""
    import os

    from fealess_tpu import training
    from fealess_tpu.io import linemod_yaml

    _, (bgr, depth, mask), _ = feature_dir
    native = _engine_with(feature_dir, W)
    cam_n = CamIntrinsics(fx=FX, fy=FY, cx=CX, cy=CY, width=W, height=H)
    base = native.recognition(bgr, depth, cam_n)
    assert base

    # 4x-resolution sensor view of the same scene
    s = 4
    big_bgr = cv2.resize(bgr, (s * W, s * H))
    big_depth = cv2.resize(depth, (s * W, s * H),
                           interpolation=cv2.INTER_NEAREST)
    big_mask = cv2.resize(mask.astype(np.uint8), (s * W, s * H),
                          interpolation=cv2.INTER_NEAREST).astype(bool)
    det_w = cfg.DetectorConfig(image_width=s * W, image_height=s * H,
                               max_candidates=16)
    pose = np.zeros(13, np.float32)
    pose[0] = pose[5] = pose[10] = 1.0
    pose[12] = 650.0
    view = training.add_template(big_bgr, big_depth, big_mask, pose, det_w)
    assert view is not None
    d = tmp_path / "wide_features"
    d.mkdir()
    linemod_yaml.save_linemod(str(d / "linemod_templates.yml"), det_w,
                              {"obj": [view]})
    os.makedirs(d / "depth", exist_ok=True)
    cv2.imwrite(str(d / "depth" / "0.png"),
                (big_depth.astype(np.uint32) * 10).astype(np.uint16))

    ecfg = cfg.EngineConfig(
        detector=det_w,
        template_fx=s * FX, template_fy=s * FY,
        template_cx=s * CX, template_cy=s * CY, refine_crop=256)
    eng = ObjReco.create("LmICP", ecfg)
    eng.add_obj(str(d))
    cam = CamIntrinsics(fx=s * FX, fy=s * FY, cx=s * CX, cy=s * CY,
                        width=s * W, height=s * H)
    wide = eng.recognition(big_bgr, big_depth, cam)
    assert wide and wide[0].similarity >= 90.0
    r_rel = wide[0].world2cam[:3, :3] @ base[0].world2cam[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(r_rel) - 1) / 2, -1, 1)))
    assert ang < 5.0, ang
    assert np.linalg.norm(wide[0].world2cam[:3, 3]
                          - base[0].world2cam[:3, 3]) < 25.0


def test_prepare_frame_arbitrary_aspect(feature_dir):  # noqa: F811
    """16:9-style input resizes by width then pads height to alignment."""
    eng = _engine_with(feature_dir, W)   # W=240 -> zoom on a 480-wide cam
    cam = CamIntrinsics(fx=2 * FX, fy=2 * FY, cx=240, cy=135,
                        width=480, height=270)
    rgb = np.zeros((270, 480, 3), np.uint8)
    dep = np.full((270, 480), 700, np.uint16)
    out_rgb, out_dep, k = eng._prepare_frame(rgb, dep, cam)
    align = eng.cfg.detector.pyramid_alignment
    assert out_rgb.shape[0] % align == 0
    assert out_rgb.shape[1] % align == 0
    assert out_rgb.shape[:2] == out_dep.shape
    # resized content height 135 -> padded rows are invalid depth
    assert (np.asarray(out_dep)[140:] == 0).all()
    # intrinsics zoomed by 0.5, untouched by padding
    assert float(k[0, 0]) == pytest.approx(FX)
    assert float(k[0, 2]) == pytest.approx(120.0)


def test_aspect_change_reconfigures_engine(feature_dir):  # noqa: F811
    """One engine serving two different camera aspects sequentially:
    processing dims re-pin and score tables rebuild on the aspect
    change, and detection still works on both."""
    _, (bgr, depth, mask), _ = feature_dir
    eng = _engine_with(feature_dir, W)
    cam_a = CamIntrinsics(fx=FX, fy=FY, cx=CX, cy=CY, width=W, height=H)
    assert eng.recognition(bgr, depth, cam_a)
    dims_a = (eng.cfg.detector.image_height, eng.cfg.detector.image_width)

    ch, cw = 200, 260                     # different aspect, not aligned
    big_bgr = np.zeros((ch, cw, 3), np.uint8)
    big_bgr[:H, :W] = bgr
    big_depth = np.zeros((ch, cw), np.uint16)
    big_depth[:H, :W] = depth
    cam_b = CamIntrinsics(fx=FX, fy=FY, cx=cw / 2.0, cy=ch / 2.0,
                          width=cw, height=ch)
    assert eng.recognition(big_bgr, big_depth, cam_b)
    dims_b = (eng.cfg.detector.image_height, eng.cfg.detector.image_width)
    assert dims_b != dims_a

    # and back again
    assert eng.recognition(bgr, depth, cam_a)
