"""KCF-gated recognition: track the object ROI between frames, gate
LINE-MOD re-detection to the tracked region.

Realizes the reference's commented-out tracking demo
(test/linemod_acq.cpp:103-196): a KCF tracker propagates the object ROI
frame-to-frame; each frame, a mask built from the (expanded) ROI gates
``Detector::match``, and the match re-centres the tracker.  Full-frame
re-detection runs on the first frame and whenever the gated match loses
the object for ``max_lost`` consecutive frames.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from fealess_tpu import config as cfg
from fealess_tpu.engine import CamIntrinsics, ObjReco, RecoResult
from fealess_tpu.tracker.kcf import KcfTracker


@dataclasses.dataclass
class TrackStep:
    """Per-frame outcome of the gated pipeline."""
    results: List[RecoResult]
    roi: Optional[Tuple[float, float, float, float]]   # (x, y, w, h) or None
    redetected: bool          # this frame ran a full-frame match
    tracking: bool            # a KCF state is live after this frame


class TrackedRecognizer:
    """KCF-gated recognition over a frame stream.

    The engine's processing resolution must equal the camera resolution
    (zoom == 1) so tracker ROIs and match coordinates share one frame.
    """

    def __init__(self, engine: ObjReco,
                 kcf: Optional[cfg.KcfConfig] = None,
                 roi_expand: float = 1.4, max_lost: int = 2):
        self.engine = engine
        self.kcf_cfg = kcf
        self.roi_expand = roi_expand
        self.max_lost = max_lost
        self._tracker: Optional[KcfTracker] = None
        self._state = None
        self._lost = 0

    def reset(self) -> None:
        self._tracker = None
        self._state = None
        self._lost = 0

    def _roi_mask(self, shape_hw, roi) -> np.ndarray:
        x, y, w, h = roi
        cx, cy = x + w / 2.0, y + h / 2.0
        we, he = w * self.roi_expand, h * self.roi_expand
        x0 = max(int(cx - we / 2), 0)
        y0 = max(int(cy - he / 2), 0)
        x1 = min(int(cx + we / 2), shape_hw[1])
        y1 = min(int(cy + he / 2), shape_hw[0])
        mask = np.zeros(shape_hw, bool)
        mask[y0:y1, x0:x1] = True
        return mask

    def step(self, bgr: np.ndarray, depth_u16: np.ndarray,
             cam: CamIntrinsics) -> TrackStep:
        """Process one frame: track -> gated match -> (re)init."""
        d = self.engine.cfg.detector
        if cam.width != d.image_width:
            raise ValueError("gated tracking requires zoom == 1 "
                             f"(camera {cam.width} vs processing "
                             f"{d.image_width})")
        h, w = bgr.shape[:2]
        redetect = self._state is None
        roi = None
        if not redetect:
            self._state, roi_arr = self._tracker.update(self._state, bgr)
            roi = tuple(float(v) for v in roi_arr)
            mask = self._roi_mask((h, w), roi)
            results = self.engine.recognition(bgr, depth_u16, cam,
                                              roi_mask=mask)
            if not results:
                self._lost += 1
                if self._lost >= self.max_lost:
                    self.reset()
                    redetect = True
            else:
                self._lost = 0
        if redetect:
            results = self.engine.recognition(bgr, depth_u16, cam)
            if results:
                roi = results[0].match_rect
                self._tracker = KcfTracker(self.kcf_cfg)
                self._state = self._tracker.init(roi, bgr)
                self._lost = 0
            else:
                roi = None
                self.reset()
        return TrackStep(results=results, roi=roi,
                         redetected=redetect, tracking=self._state is not None)
