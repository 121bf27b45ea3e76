"""Explicit configuration for every runtime parameter of the engine.

The reference scatters its operating point across compile-time defines and
hard-coded literals (CadReco/obj_reco_lmicp.cpp:6-9,52-55;
linemod/linemod.cpp:515-519,827-832,1820; ICP/common.cpp:264,336-372).  Here
every knob is an explicit dataclass field with the reference default.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ColorGradientConfig:
    """Quantized colour-gradient modality (reference linemod.cpp:515-519)."""

    weak_threshold: float = 10.0      # gradient magnitude gate at quantization
    strong_threshold: float = 55.0    # gate for template feature candidates
    num_features: int = 63            # features per template at level 0


@dataclasses.dataclass(frozen=True)
class DepthNormalConfig:
    """Quantized depth-normal modality (reference linemod.cpp:827-832)."""

    distance_threshold: int = 2000    # mm; ignore depth beyond this
    difference_threshold: int = 50    # mm; bilateral plane-fit gate
    num_features: int = 63
    extract_threshold: int = 2        # min per-label chessboard distance


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """LINE-MOD detector operating point (reference linemod.cpp:1820-1835)."""

    t_at_level: Tuple[int, ...] = (5, 8)   # spread/sampling step per level
    image_width: int = 640                 # PROC_IMG_WIDTH, obj_reco_lmicp.cpp:6
    image_height: int = 480
    color_gradient: ColorGradientConfig = ColorGradientConfig()
    depth_normal: DepthNormalConfig = DepthNormalConfig()
    # Modality set: ("color_gradient", "depth_normal") = LINE-MOD;
    # ("color_gradient",) = LINE (getDefaultLINE, linemod.cpp:1822-1827).
    modalities: Tuple[str, ...] = ("color_gradient", "depth_normal")
    max_features: int = 63                 # u8 accumulator invariant (linemod.cpp:1137)
    max_templates: int = 1024              # static template-bank capacity
    max_candidates: int = 64               # static top-K carried through refinement

    @property
    def pyramid_levels(self) -> int:
        return len(self.t_at_level)

    @property
    def pyramid_alignment(self) -> int:
        """Smallest dimension multiple for which every pyramid level is
        T-divisible: lcm over levels of ``t_l << l`` (80 for the default
        T={5,8}).  The engine pads frames to this (the reference instead
        hard-requires 640x480, obj_reco_lmicp.cpp:216-259)."""
        import math
        return math.lcm(*[t << l for l, t in enumerate(self.t_at_level)])


def default_line() -> DetectorConfig:
    """Gradient-only detector (getDefaultLINE, linemod.cpp:1822-1827)."""
    return DetectorConfig(modalities=("color_gradient",))


def default_linemod() -> DetectorConfig:
    """Gradient + normal detector (getDefaultLINEMOD, linemod.cpp:1829-1835)."""
    return DetectorConfig()


@dataclasses.dataclass(frozen=True)
class IcpConfig:
    """ICP refinement (reference obj_reco_lmicp.cpp:52-55, ICP/ICP.cpp:617-809)."""

    max_iterations: int = 10          # icp_it_thr
    dist_mean_threshold: float = 0.5  # mm
    dist_diff_threshold: float = 0.01 # mm
    min_points: int = 3               # ptNum_thr, ICP.cpp:633
    max_points: int = 16384           # static padded point-set size
    # The reference gates NN pairs by comparing FLANN's *squared* distance
    # against the unsquared 3*dist_mean (ICP.cpp:268 with L2_Simple metric).
    # True reproduces that behaviour bit-for-bit; False applies the gate to
    # the unsquared distance (the presumably intended semantics).
    squared_distance_gate: bool = True
    # "point_to_point" = Kabsch/SVD exactly as the reference (ICP.cpp:730-744,
    #   the parity mode — benchmarks/reference/run_parity.py pins it against
    #   the compiled C++ engine);
    # "point_to_plane" = 6x6 Gauss-Newton normal equations — the TPU
    #   performance path and the PRODUCTION DEFAULT: on the rendered
    #   32-frame parity sequence it reaches 0.28 mm mean ADD vs 3.40 mm
    #   for point mode (both 32/32 pass, PARITY_r05.json).
    mode: str = "point_to_plane"
    # Relative Tikhonov damping on the 6x6 GN system (point_to_plane only).
    plane_damping: float = 1e-6
    # Weight of the point-to-point anchor blended into the point-to-plane
    # normal equations (H = H_plane + blend*H_point) — a mild regularizer
    # for noisy normals (0 disables).  Swept on the parity sequence:
    # 0.00 -> 0.20 mm, 0.01 -> 0.23 mm, 0.05 -> 0.31 mm mean ADD.
    plane_point_blend: float = 0.01
    # Plane-degeneracy gate: point-to-plane on a (near-)planar object has
    # a rotate-and-slide null space and converges to wrong minima that no
    # anchor weight fixes (measured: 2.5 deg / 30 mm on a flat textured
    # box vs 0.8 deg for Kabsch).  The loop therefore measures the
    # normal-scatter anisotropy lambda1/lambda2 of eigvals(sum n n^T)
    # once per refine: below this threshold every iteration uses the
    # Kabsch (point) update instead of the plane GN step.  Measured
    # statistic: 0.87 on the rendered mesh sequence (plane GN: 0.28 mm
    # mean ADD), ~0.03 on the flat box (Kabsch selected).
    plane_min_normal_anisotropy: float = 0.15
    # The reference accumulates the covariance WITHOUT subtracting centroids
    # (ICP.cpp:730-735), which biases the rotation when clouds sit far from
    # the origin.  False reproduces that; True is proper Kabsch (faster
    # convergence, better accuracy — the recommended non-parity mode).
    centered_covariance: bool = False
    # Point-validity depth cap in mm (is_vec3f_valid, ICP/common.cpp:261-266).
    # The single source of truth for the z<=900 gate: pair statistics
    # (icp._masked_pair_stats), refine-crop pairing (pipeline.refine_match)
    # and the sharded ICP reductions all read this field.
    valid_depth_max_mm: float = 900.0


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Full recognition pipeline (reference CObjRecoLmICP, obj_reco_lmicp.cpp:47-60)."""

    detector: DetectorConfig = DetectorConfig()
    icp: IcpConfig = IcpConfig()
    matching_threshold: float = 75.0        # percent, obj_reco_lmicp.cpp:53
    # Hard-coded template-rendering intrinsics (ICP/common.cpp:326-372).
    template_fx: float = 608.0
    template_fy: float = 608.0
    template_cx: float = 320.0
    template_cy: float = 240.0
    # Model depth png is stored in 0.1 mm units (obj_reco_lmicp.cpp:188).
    model_depth_scale: float = 0.1
    nms_object_distance: float = 50.0       # mm; th_obj_dist for 3D NMS
    # Candidates refined in parallel by the multi-object path (the
    # reference refines top-1 only, obj_reco_lmicp.cpp:111).
    max_objects: int = 8
    # Static refine-window side (must cover the largest template bbox and
    # fit inside the processed image).
    refine_crop: int = 256

    @property
    def valid_depth_max_mm(self) -> float:
        """Alias of ``icp.valid_depth_max_mm`` (the single source of
        truth); configure the cap there."""
        return self.icp.valid_depth_max_mm


@dataclasses.dataclass(frozen=True)
class KcfConfig:
    """KCF tracker (reference kcf_tracker/kcftracker.cpp:92-170)."""

    use_hog: bool = True
    use_lab: bool = False
    use_fixed_window: bool = False
    use_multiscale: bool = True
    lambda_reg: float = 1e-4
    padding: float = 2.5
    output_sigma_factor: float = 0.125      # HOG mode (kcftracker.cpp:106)
    interp_factor: float = 0.012            # HOG mode
    kernel_sigma: float = 0.6               # HOG mode
    cell_size: int = 4
    template_size: int = 96
    scale_step: float = 1.05
    scale_weight: float = 0.95
