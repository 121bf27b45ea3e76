"""On-chip verification of the Pallas TPU kernels and the full serve path.

Every bit-exactness claim about the score kernels (ops/score_pallas) and
the NN kernel (ops/nn_pallas) is proven on CPU against numpy oracles and
the compiled reference — but the Pallas code paths themselves only run on
the real TPU.  This harness closes that gap (VERDICT r3 #1): it asserts,
ON THE CHIP, that

1. the coarse whole-image scorer's TPU kernel output equals the CPU
   golden EXACTLY (integer scores) on the real fixture frame + fixture
   bank (the SSE loop it replaces: linemod/linemod.cpp:1130-1214);
2. the local 16x16 refinement kernel equals the CPU golden EXACTLY for
   match-derived AND adversarially-placed window origins (right-edge
   lanes included; linemod.cpp:1226-1300);
3. the decimated response planes computed on chip equal the CPU planes
   EXACTLY (the integer front-end: linemod.cpp:882-1117);
4. the brute-force NN Pallas kernel agrees with the XLA blocked twin on
   a refine-sized cloud pair (indices equal up to exact-distance ties;
   replaces FLANN, ICP/ICP.cpp:649-659);
5. end-to-end `ObjReco.recognition` poses on chip match the CPU-path
   poses over the rendered test sequence (match fields exactly; pose
   within tight float tolerances — ICP runs SVD/matmuls in f32).

Usage:
  python benchmarks/tpu_parity.py            # golden (CPU subprocess) + chip
  python benchmarks/tpu_parity.py golden     # write tpu_parity_golden.npz
  python benchmarks/tpu_parity.py chip [out.json]

The two phases run in separate processes (the axon sitecustomize pins the
default backend at interpreter start; also two live JAX processes would
serialize on the TPU tunnel).
"""

import json
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)
FIXTURE = os.path.join(HERE, "reference", "out")
SEQ = os.path.join(HERE, "reference", "seq")
GOLDEN = os.path.join(HERE, "tpu_parity_golden.npz")
N_FRAMES = 8
N_LOCAL = 128          # local-scorer candidates checked


def _ensure_seq():
    if not os.path.exists(os.path.join(SEQ, "frames", "gt_poses.npy")):
        subprocess.run([sys.executable,
                        os.path.join(HERE, "reference", "make_sequence.py")],
                       check=True, capture_output=True, text=True)


def _fixture_engine():
    from fealess_tpu.engine import ObjReco

    eng = ObjReco.create("LmICP")
    eng.add_obj(os.path.join(FIXTURE, "features"))
    return eng


def _fixture_frame():
    import cv2

    bgr = cv2.imread(os.path.join(FIXTURE, "scene_bgr.png"))
    depth = cv2.imread(os.path.join(FIXTURE, "scene_depth.png"),
                       cv2.IMREAD_UNCHANGED)
    return bgr, depth


def _planes_for(eng, bgr, depth):
    """Per-level decimated response planes for the fixture frame."""
    import jax.numpy as jnp
    from fealess_tpu import detector as det_mod

    det = eng.cfg.detector
    levels = det_mod.quantized_pyramid(jnp.asarray(bgr), jnp.asarray(depth),
                                       det)
    return det_mod.response_planes(levels, det)


def _local_candidates(rng, coarse_scores, bank_valid, hd0, wd0, t_c, t0,
                      n_slots):
    """(slot, px0, py0) level-0 window origins: half from the top coarse
    responses (mapped with the detector's clamp arithmetic), half random
    including deliberate right-edge lanes."""
    n, hd, wd = coarse_scores.shape
    flat = np.where(bank_valid[:, None, None],
                    coarse_scores, -1).reshape(-1)
    top = np.argsort(flat)[::-1][:N_LOCAL // 2]
    slots = (top // (hd * wd)).astype(np.int32)
    py = ((top % (hd * wd)) // wd).astype(np.int32)
    px = (top % wd).astype(np.int32)
    # coarse cell -> level-0 pixel -> window origin (linemod.cpp:1515-1534
    # arithmetic as in detector.match_from_planes)
    off_c = t_c // 2 + (t_c % 2 - 1)
    x0 = (px * t_c + off_c) * 2 + 1
    y0 = (py * t_c + off_c) * 2 + 1
    px0 = np.clip(x0 // t0 - 8, 0, wd0 - 16)
    py0 = np.clip(y0 // t0 - 8, 0, hd0 - 16)

    m = N_LOCAL - len(slots)
    r_slots = rng.integers(0, n_slots, m).astype(np.int32)
    # bias half of the random origins to the right edge (the regression
    # region of the r3 per-bucket clamp bug)
    r_px0 = np.concatenate([
        rng.integers(0, wd0 - 16 + 1, m // 2),
        rng.integers(max(wd0 - 24, 0), wd0 - 16 + 1, m - m // 2),
    ]).astype(np.int32)
    r_py0 = rng.integers(0, hd0 - 16 + 1, m).astype(np.int32)
    return (np.concatenate([slots, r_slots]),
            np.concatenate([px0, r_px0]),
            np.concatenate([py0, r_py0]))


def _refine_clouds(eng, depth):
    """A realistic refine-sized (query, ref) cloud pair: the top match's
    model-depth crop vs the scene crop, back-projected like refine_match."""
    import jax.numpy as jnp
    from fealess_tpu import pipeline

    crop = eng.cfg.refine_crop
    k = jnp.asarray([[608.0, 0, 320], [0, 608.0, 240], [0, 0, 1]],
                    jnp.float32)
    model = np.asarray(pipeline._crop_points_mm(
        jnp.asarray(eng._model_depth[0]), k, 0, 0, crop, crop)).reshape(-1, 3)
    scene = np.asarray(pipeline._crop_points_mm(
        jnp.asarray(depth), k, 100, 60, crop, crop)).reshape(-1, 3)
    pad = 1.0e6
    model = np.where(np.isfinite(model), model, pad).astype(np.float32)
    scene = np.where(np.isfinite(scene), scene, pad).astype(np.float32)
    return model[:4096], scene[:4096]


def _seq_results():
    """Per-frame engine results over the rendered sequence."""
    import cv2
    from fealess_tpu.engine import CamIntrinsics, ObjReco

    eng = ObjReco.create("LmICP")
    eng.add_obj(os.path.join(SEQ, "features"))
    fx, fy, cx, cy = np.loadtxt(os.path.join(SEQ, "cam.txt"))
    cam = CamIntrinsics(fx=fx, fy=fy, cx=cx, cy=cy, width=640, height=480)
    out = {"x": [], "y": [], "sim": [], "pose": []}
    for i in range(N_FRAMES):
        bgr = cv2.imread(os.path.join(SEQ, "frames", f"color_{i:03d}.png"))
        dep = cv2.imread(os.path.join(SEQ, "frames", f"depth_{i:03d}.png"),
                         cv2.IMREAD_UNCHANGED)
        res = eng.recognition(bgr, dep, cam)
        assert res, f"no detection on frame {i}"
        r = res[0]
        out["x"].append(r.match_rect[0])
        out["y"].append(r.match_rect[1])
        out["sim"].append(r.similarity)
        out["pose"].append(r.world2cam)
    return {k: np.asarray(v) for k, v in out.items()}


def _kcf_trace(bgr):
    """ROI trace of the KCF tracker over a deterministic panning scene
    (same frame construction as bench.py's gated config)."""
    import jax
    import jax.numpy as jnp
    from fealess_tpu.tracker.kcf import KcfTracker, kcf_reference_config

    frames = [np.roll(np.roll(bgr, 3 * i, axis=1), i, axis=0)
              for i in range(12)]
    tracker = KcfTracker(kcf_reference_config(hog=True, fixed_window=True,
                                              multiscale=True, lab=False))
    state = tracker.init((240.0, 160.0, 192.0, 160.0), frames[0])
    update = jax.jit(tracker._update)
    rois = []
    for f in frames[1:]:
        state, roi = update(state, jnp.asarray(f))
        rois.append(np.asarray(roi))
    return np.stack(rois)


def _oracle_check(eng, d_c, d_0, coarse, local, slots, px0, py0):
    """Cross-check the production scorers against the INDEPENDENT gather
    oracle ``fealess_tpu.ops.similarity`` (reference flat-buffer
    semantics) — the goldens shipped to the chip phase are only trusted
    once both formulations agree.

    The oracle reproduces the reference's row wraparound while the
    production scorers zero-pad, so the comparison is restricted to where
    no feature read wraps: candidate-eligible coarse positions
    (px <= wd - wf, the only positions the detector may seed from) and
    interior local windows.
    """
    import jax.numpy as jnp
    from fealess_tpu.ops import similarity as sim_mod

    bank = eng.bank
    det = eng.cfg.detector
    l_c = det.pyramid_levels - 1
    t_c, t0 = det.t_at_level[l_c], det.t_at_level[0]
    n = bank.capacity
    mods = bank.feat_x.shape[2]
    mod_off = 8 * jnp.arange(mods, dtype=jnp.int32)[None, :, None]

    # -- coarse: whole-image oracle over the flat decimated tensor
    c_ch, hd, wd = d_c.shape
    p = hd * wd
    lbl = (bank.feat_label[:, l_c] + mod_off).reshape(n, -1)
    c_f, off = sim_mod.pack_features(
        bank.feat_x[:, l_c].reshape(n, -1),
        bank.feat_y[:, l_c].reshape(n, -1), lbl, t_c, wd)
    d_flat = jnp.pad(jnp.asarray(d_c).reshape(c_ch, p), ((0, 0), (0, p + 1)))
    oracle = np.asarray(sim_mod.whole_image_similarity(
        d_flat, c_f, off, bank.feat_valid[:, l_c].reshape(n, -1),
        p)).reshape(n, hd, wd)
    wf = (np.asarray(bank.width[:, l_c]) - 1) // t_c + 1
    hf = (np.asarray(bank.height[:, l_c]) - 1) // t_c + 1
    ok_pos = ((np.arange(wd)[None, None, :] <= (wd - wf)[:, None, None])
              & (np.arange(hd)[None, :, None] <= (hd - hf)[:, None, None]))
    assert np.array_equal(np.where(ok_pos, oracle, 0),
                          np.where(ok_pos, coarse, 0)), \
        "similarity-oracle vs production coarse scorer mismatch"

    # -- local: 16x16 window oracle for non-wrapping candidates
    c0_ch, hd0, wd0 = d_0.shape
    p0 = hd0 * wd0
    stride = p0 + 16 * wd0 + 16
    d0_flat = jnp.pad(jnp.asarray(d_0).reshape(c0_ch, p0),
                      ((0, 0), (0, stride - p0))).reshape(-1)
    fx0 = np.asarray(bank.feat_x[:, 0]).reshape(n, -1)[slots]
    fy0 = np.asarray(bank.feat_y[:, 0]).reshape(n, -1)[slots]
    lbl0 = np.asarray((bank.feat_label[:, 0] + mod_off)).reshape(n, -1)[slots]
    fv0 = np.asarray(bank.feat_valid[:, 0]).reshape(n, -1)[slots]
    c0, _ = sim_mod.pack_features(jnp.asarray(fx0), jnp.asarray(fy0),
                                  jnp.asarray(lbl0), t0, wd0)
    ry, rx = fy0 // t0, fx0 // t0
    base = (py0[:, None] + ry) * wd0 + (px0[:, None] + rx)
    interior = (np.max(np.where(fv0, rx, 0), axis=1) + px0 + 16 <= wd0) \
        & (np.max(np.where(fv0, ry, 0), axis=1) + py0 + 16 <= hd0)
    assert interior.sum() >= 16, "too few interior local candidates"
    oracle_l = np.asarray(sim_mod.local_similarity(
        d0_flat, c0, jnp.asarray(base), jnp.asarray(fv0), stride,
        wd0)).reshape(-1, 16, 16)
    assert np.array_equal(oracle_l[interior], local[interior]), \
        "similarity-oracle vs production local scorer mismatch"
    print(f"similarity oracle OK: coarse eligible positions + "
          f"{int(interior.sum())} interior local windows")


def _wide_fixture():
    """A 1280x960 serving fixture: the 640x480 fixture scene upscaled 2x
    (same physical geometry, 2x intrinsics) with one template trained at
    the wide processing scale.  Created once under reference/out/wide."""
    import cv2

    wdir = os.path.join(FIXTURE, "wide")
    frame_bgr = os.path.join(wdir, "scene_bgr.png")
    if not os.path.exists(os.path.join(wdir, "features",
                                       "linemod_templates.yml")):
        from fealess_tpu import config as cfg
        from fealess_tpu import training
        from fealess_tpu.io import linemod_yaml

        bgr, depth = _fixture_frame()
        mask_src = cv2.imread(os.path.join(FIXTURE, "scene_mask.png"),
                              cv2.IMREAD_UNCHANGED)
        if mask_src is None:
            # fixture object = valid-depth region nearer than background
            mask_src = ((depth > 0) & (depth < 900)).astype(np.uint8)
        big_bgr = cv2.resize(bgr, (1280, 960))
        big_depth = cv2.resize(depth, (1280, 960),
                               interpolation=cv2.INTER_NEAREST)
        big_mask = cv2.resize(mask_src, (1280, 960),
                              interpolation=cv2.INTER_NEAREST).astype(bool)
        det_w = cfg.DetectorConfig(image_width=1280, image_height=960,
                                   max_candidates=16)
        pose = np.zeros(13, np.float32)
        pose[0] = pose[5] = pose[10] = 1.0
        pose[12] = 650.0
        view = training.add_template(big_bgr, big_depth, big_mask, pose,
                                     det_w)
        assert view is not None, "wide template extraction failed"
        os.makedirs(os.path.join(wdir, "features", "depth"), exist_ok=True)
        linemod_yaml.save_linemod(
            os.path.join(wdir, "features", "linemod_templates.yml"),
            det_w, {"obj": [view]})
        cv2.imwrite(os.path.join(wdir, "features", "depth", "0.png"),
                    (big_depth.astype(np.uint32) * 10).astype(np.uint16))
        cv2.imwrite(frame_bgr, big_bgr)
        cv2.imwrite(os.path.join(wdir, "scene_depth.png"), big_depth)
    bgr = cv2.imread(frame_bgr)
    depth = cv2.imread(os.path.join(wdir, "scene_depth.png"),
                       cv2.IMREAD_UNCHANGED)
    return wdir, bgr, depth


def _wide_engine_and_result():
    """CPU/chip-shared: wide engine + top-1 recognition on the wide
    frame + the wide response planes (multi-128-lane geometry)."""
    from fealess_tpu import config as cfg
    from fealess_tpu.engine import CamIntrinsics, ObjReco

    wdir, bgr, depth = _wide_fixture()
    fx, fy, cx, cy = np.loadtxt(os.path.join(FIXTURE, "cam.txt"))
    cam = CamIntrinsics(fx=2 * fx, fy=2 * fy, cx=2 * cx, cy=2 * cy,
                        width=1280, height=960)
    eng = ObjReco.create("LmICP", cfg.EngineConfig(
        detector=cfg.DetectorConfig(image_width=1280, image_height=960,
                                    max_candidates=16),
        template_fx=2 * fx, template_fy=2 * fy,
        template_cx=2 * cx, template_cy=2 * cy))
    eng.add_obj(os.path.join(wdir, "features"))
    res = eng.recognition(bgr, depth, cam)
    planes = _planes_for(eng, bgr, depth)
    return eng, res, planes


def run_golden():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from fealess_tpu import detector as det_mod
    from fealess_tpu.ops import nn_pallas, score_pallas

    _ensure_seq()
    rng = np.random.default_rng(42)
    eng = _fixture_engine()
    bgr, depth = _fixture_frame()
    det = eng.cfg.detector
    planes = _planes_for(eng, bgr, depth)
    l_c = det.pyramid_levels - 1
    t_c, t0 = det.t_at_level[l_c], det.t_at_level[0]
    d_c = planes[l_c][0]
    d_0 = planes[0][0]
    tables = eng._kernels

    coarse = np.asarray(score_pallas.coarse_scores(d_c, tables[l_c]))
    hd0, wd0 = d_0.shape[1], d_0.shape[2]
    slots, px0, py0 = _local_candidates(
        rng, coarse, np.asarray(eng.bank.valid), hd0, wd0, t_c, t0,
        eng.bank.capacity)
    table_k = {key: np.asarray(tables[0][key])[slots] for key in tables[0]}
    local = np.asarray(score_pallas.local_scores(
        d_0, {k: jnp.asarray(v) for k, v in table_k.items()},
        jnp.asarray(px0), jnp.asarray(py0)))

    _oracle_check(eng, d_c, d_0, coarse, local, slots, px0, py0)

    q, r = _refine_clouds(eng, depth)
    nn_idx, nn_d2 = (np.asarray(v) for v in nn_pallas._nn_xla_blocked(
        jnp.asarray(q), jnp.asarray(r)))

    kcf_rois = _kcf_trace(bgr)
    seq = _seq_results()

    # --- wide-geometry goldens (multi-128-lane kernels + wide e2e)
    weng, wres, wplanes = _wide_engine_and_result()
    assert wres, "no wide detection on CPU"
    d0w = np.asarray(wplanes[0][0])            # (400, 192, 256)
    wtab = weng._kernels[0]
    hdw, wdw = d0w.shape[1], d0w.shape[2]
    w_slots = rng.integers(0, weng.bank.capacity, 64).astype(np.int32)
    w_px0 = np.concatenate([
        rng.integers(0, wdw - 16 + 1, 32),
        rng.integers(wdw - 40, wdw - 16 + 1, 32)]).astype(np.int32)
    w_py0 = rng.integers(0, hdw - 16 + 1, 64).astype(np.int32)
    wtab_k = {key: np.asarray(wtab[key])[w_slots] for key in wtab}
    w_local = np.asarray(score_pallas.local_scores(
        jnp.asarray(d0w), {k2: jnp.asarray(v) for k2, v in wtab_k.items()},
        jnp.asarray(w_px0), jnp.asarray(w_py0)))
    # multi-tile COARSE: a 1920-class level-1 grid (wd + nb > 128) with
    # adversarial random planes against the fixture level-1 table
    c_wide_planes = rng.integers(
        0, 5, size=(np.asarray(d_c).shape[0], 65, 120)).astype(np.uint8)
    c_wide = np.asarray(score_pallas._coarse_scores_xla(
        jnp.asarray(c_wide_planes), tables[l_c]))

    np.savez_compressed(
        GOLDEN,
        wide_d0=d0w, wide_local=w_local,
        wide_local_c=wtab_k["c"], wide_local_ry=wtab_k["ry"],
        wide_local_rx=wtab_k["rx"], wide_local_bstart=wtab_k["bstart"],
        wide_px0=w_px0, wide_py0=w_py0,
        wide_coarse_planes=c_wide_planes, wide_coarse=c_wide,
        wide_x=np.float32(wres[0].match_rect[0]),
        wide_y=np.float32(wres[0].match_rect[1]),
        wide_sim=np.float32(wres[0].similarity),
        wide_pose=wres[0].world2cam,
        d_coarse=np.asarray(d_c), d_level0=np.asarray(d_0),
        coarse_golden=coarse,
        coarse_c=np.asarray(tables[l_c]["c"]),
        coarse_ry=np.asarray(tables[l_c]["ry"]),
        coarse_rx=np.asarray(tables[l_c]["rx"]),
        coarse_bstart=np.asarray(tables[l_c]["bstart"]),
        local_c=table_k["c"], local_ry=table_k["ry"],
        local_rx=table_k["rx"], local_bstart=table_k["bstart"],
        local_px0=px0, local_py0=py0, local_golden=local,
        nn_q=q, nn_r=r, nn_idx=nn_idx, nn_d2=nn_d2,
        kcf_rois=kcf_rois,
        seq_x=seq["x"], seq_y=seq["y"], seq_sim=seq["sim"],
        seq_pose=seq["pose"])
    print(f"golden written: {GOLDEN}")


def run_chip(out_path):
    import jax
    import jax.numpy as jnp

    from fealess_tpu.ops import nn_pallas, score_pallas

    assert jax.default_backend() != "cpu", (
        "chip phase must run on the TPU backend")
    g = np.load(GOLDEN)
    report = {"backend": jax.default_backend(), "checks": {}}
    ok_all = True

    def check(name, ok, detail):
        nonlocal ok_all
        ok_all &= bool(ok)
        report["checks"][name] = {"ok": bool(ok), **detail}
        print(f"  {name}: {'OK' if ok else 'FAIL'} {detail}", flush=True)

    # 1+3. front-end planes parity (integer front-end must be bit-equal)
    eng = _fixture_engine()
    bgr, depth = _fixture_frame()
    planes = _planes_for(eng, bgr, depth)
    det = eng.cfg.detector
    l_c = det.pyramid_levels - 1
    d_c_tpu = np.asarray(planes[l_c][0])
    d_0_tpu = np.asarray(planes[0][0])
    check("frontend_planes_exact",
          np.array_equal(d_c_tpu, g["d_coarse"])
          and np.array_equal(d_0_tpu, g["d_level0"]),
          {"coarse_diff": int(np.sum(d_c_tpu != g["d_coarse"])),
           "level0_diff": int(np.sum(d_0_tpu != g["d_level0"]))})

    # 1. coarse Pallas kernel vs CPU golden — exact integer equality
    tab_c = {"c": jnp.asarray(g["coarse_c"]),
             "ry": jnp.asarray(g["coarse_ry"]),
             "rx": jnp.asarray(g["coarse_rx"]),
             "bstart": jnp.asarray(g["coarse_bstart"])}
    coarse_tpu = np.asarray(score_pallas._coarse_scores_tpu(
        jnp.asarray(g["d_coarse"]), tab_c))
    check("coarse_kernel_exact",
          np.array_equal(coarse_tpu, g["coarse_golden"]),
          {"mismatches": int(np.sum(coarse_tpu != g["coarse_golden"])),
           "shape": list(coarse_tpu.shape)})

    # 2. local Pallas kernel vs CPU golden — exact integer equality
    tab_l = {"c": jnp.asarray(g["local_c"]),
             "ry": jnp.asarray(g["local_ry"]),
             "rx": jnp.asarray(g["local_rx"]),
             "bstart": jnp.asarray(g["local_bstart"])}
    local_tpu = np.asarray(score_pallas._local_scores_tpu(
        jnp.asarray(g["d_level0"]), tab_l,
        jnp.asarray(g["local_px0"]), jnp.asarray(g["local_py0"])))
    check("local_kernel_exact",
          np.array_equal(local_tpu, g["local_golden"]),
          {"mismatches": int(np.sum(local_tpu != g["local_golden"])),
           "candidates": int(local_tpu.shape[0]),
           "right_edge_candidates":
               int(np.sum(g["local_px0"] >= g["d_level0"].shape[2] - 24))})

    # 3b. WIDE geometry: the multi-128-lane kernel variants and the wide
    # serving path (VERDICT r4 weak#2).  Local kernel on real 1280x960
    # planes (2 lane-tiles incl. right-edge windows), coarse kernel on a
    # 1920-class grid, and end-to-end recognition at 1280x960.
    if "wide_d0" in g:
        tab_w = {"c": jnp.asarray(g["wide_local_c"]),
                 "ry": jnp.asarray(g["wide_local_ry"]),
                 "rx": jnp.asarray(g["wide_local_rx"]),
                 "bstart": jnp.asarray(g["wide_local_bstart"])}
        wl_tpu = np.asarray(score_pallas._local_scores_tpu(
            jnp.asarray(g["wide_d0"]), tab_w,
            jnp.asarray(g["wide_px0"]), jnp.asarray(g["wide_py0"])))
        check("wide_local_kernel_exact",
              np.array_equal(wl_tpu, g["wide_local"]),
              {"mismatches": int(np.sum(wl_tpu != g["wide_local"])),
               "lanes": int(np.ceil(g["wide_d0"].shape[2] / 128) * 128)})
        tab_c2 = {"c": jnp.asarray(g["coarse_c"]),
                  "ry": jnp.asarray(g["coarse_ry"]),
                  "rx": jnp.asarray(g["coarse_rx"]),
                  "bstart": jnp.asarray(g["coarse_bstart"])}
        wc_tpu = np.asarray(score_pallas._coarse_scores_tpu(
            jnp.asarray(g["wide_coarse_planes"]), tab_c2))
        check("wide_coarse_kernel_exact",
              np.array_equal(wc_tpu, g["wide_coarse"]),
              {"mismatches": int(np.sum(wc_tpu != g["wide_coarse"])),
               "grid": list(g["wide_coarse_planes"].shape[1:])})
        _, wres, wplanes = _wide_engine_and_result()
        w_match = (wres and wres[0].match_rect[0] == float(g["wide_x"])
                   and wres[0].match_rect[1] == float(g["wide_y"])
                   and abs(wres[0].similarity - float(g["wide_sim"]))
                   <= 1e-3)
        d0w_tpu = np.asarray(wplanes[0][0])
        r_rel = wres[0].world2cam[:3, :3] @ g["wide_pose"][:3, :3].T
        w_rot = float(np.degrees(np.arccos(np.clip(
            (np.trace(r_rel) - 1) / 2, -1, 1))))
        w_trans = float(np.linalg.norm(wres[0].world2cam[:3, 3]
                                       - g["wide_pose"][:3, 3]))
        check("wide_e2e_1280x960",
              bool(w_match) and np.array_equal(d0w_tpu, g["wide_d0"])
              and w_rot <= 2.0 and w_trans <= 10.0,
              {"match_exact": bool(w_match),
               "planes_diff": int(np.sum(d0w_tpu != g["wide_d0"])),
               "rot_deg_vs_cpu": round(w_rot, 4),
               "trans_mm_vs_cpu": round(w_trans, 4)})

    # 4. NN kernel vs XLA twin golden (ties resolved by equal distance)
    idx_tpu, d2_tpu = (np.asarray(v) for v in
                       nn_pallas.nearest_neighbor_tiled(
                           jnp.asarray(g["nn_q"]), jnp.asarray(g["nn_r"])))
    idx_same = idx_tpu == g["nn_idx"]
    # a differing index is acceptable only if its distance ties exactly
    tie_ok = np.abs(d2_tpu - g["nn_d2"]) <= 1e-3 * np.maximum(g["nn_d2"], 1)
    check("nn_kernel",
          np.all(idx_same | tie_ok),
          {"idx_equal": int(idx_same.sum()), "n": int(idx_same.size),
           "max_d2_rel_err": float(np.max(
               np.abs(d2_tpu - g["nn_d2"]) / np.maximum(g["nn_d2"], 1)))})

    # 4b. KCF tracker on chip vs CPU ROI trace: the tracker's FFT
    # correlation/complex math runs in f32 on the chip (the tracked
    # serving path); its ROI trajectory must follow the CPU path within
    # sub-pixel slack on a deterministic panning scene (the CPU path is
    # itself pinned to the compiled reference within 2 px,
    # tests/test_kcf_parity.py).
    if "kcf_rois" in g:
        rois_tpu = _kcf_trace(bgr)
        kcf_dev = float(np.max(np.abs(rois_tpu - g["kcf_rois"])))
        check("kcf_tracker", kcf_dev <= 1.0,
              {"frames": int(len(rois_tpu)),
               "max_roi_dev_px": kcf_dev})

    # 5. end-to-end poses over the sequence.  The match must agree
    # EXACTLY (integer scores -> same candidate, same pixel); the refined
    # pose runs 10 data-dependent ICP iterations in f32 whose
    # correspondence sets can flip on last-ulp distance ties, so the
    # pose criterion is ACCURACY parity: per-frame ADD against ground
    # truth (the metric of BASELINE.json) must match the CPU path's ADD
    # closely and pass the same tau.
    _ensure_seq()
    seq = _seq_results()
    match_exact = (np.array_equal(seq["x"], g["seq_x"])
                   and np.array_equal(seq["y"], g["seq_y"]))
    sim_err = float(np.max(np.abs(seq["sim"] - g["seq_sim"])))
    gts = np.load(os.path.join(SEQ, "frames", "gt_poses.npy"))
    pts = np.load(os.path.join(SEQ, "model_points.npy"))
    tau = 0.1 * float(np.linalg.norm(pts.max(0) - pts.min(0)))

    def add_err(pose, gt):
        a = pts @ pose[:3, :3].T + pose[:3, 3]
        b = pts @ gt[:3, :3].T + gt[:3, 3]
        return float(np.linalg.norm(a - b, axis=1).mean())

    rot_deg, trans_mm, add_tpu, add_cpu = [], [], [], []
    for i, (p_t, p_c) in enumerate(zip(seq["pose"], g["seq_pose"])):
        r_rel = p_t[:3, :3] @ p_c[:3, :3].T
        cosang = np.clip((np.trace(r_rel) - 1) / 2, -1, 1)
        rot_deg.append(float(np.degrees(np.arccos(cosang))))
        trans_mm.append(float(np.linalg.norm(p_t[:3, 3] - p_c[:3, 3])))
        add_tpu.append(add_err(p_t, gts[i]))
        add_cpu.append(add_err(p_c, gts[i]))
    add_delta = float(np.max(np.abs(np.asarray(add_tpu)
                                    - np.asarray(add_cpu))))
    check("e2e_sequence",
          match_exact and sim_err <= 1e-3
          and max(add_tpu) < tau and max(add_cpu) < tau
          and add_delta <= 0.1 * tau,
          {"frames": N_FRAMES, "match_xy_exact": bool(match_exact),
           "max_sim_err": sim_err, "tau_mm": tau,
           "add_mm_tpu": [round(v, 3) for v in add_tpu],
           "add_mm_cpu": [round(v, 3) for v in add_cpu],
           "max_add_delta_mm": add_delta,
           "rot_deg_vs_cpu": [round(v, 4) for v in rot_deg],
           "trans_mm_vs_cpu": [round(v, 4) for v in trans_mm]})

    # 6. frame-batched serving on chip: vmap over the fused Recognition
    # step must lower (sequential_vmap on the Pallas scorers) and detect
    # in every frame — the parallel.batch_recon per-device path.
    import cv2
    from fealess_tpu import pipeline

    bgrs = jnp.asarray(np.stack([bgr, np.roll(bgr, 8, axis=1)]))
    deps = jnp.asarray(np.stack([depth, np.roll(depth, 8, axis=1)]))
    fx, fy, cx, cy = np.loadtxt(os.path.join(FIXTURE, "cam.txt"))
    cam_k = jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)
    vstep = jax.device_get(jax.jit(jax.vmap(
        lambda b_, d_: pipeline.recognize_top1(
            eng.bank, eng._model_depth_dev, eng._origins_dev, b_, d_,
            cam_k, eng.cfg, kernels=eng._kernels)))(bgrs, deps))
    check("vmap_batch_recognition",
          bool(np.all(vstep.valid)),
          {"frames": 2, "match_x": np.asarray(vstep.match_x).tolist()})

    # 7. shard_map over the Pallas kernels on the TPU backend (1-device
    # mesh — the per-chip program a real pod runs): top match must equal
    # the local path.
    from fealess_tpu import detector as det_mod
    from fealess_tpu.parallel import mesh as mesh_mod, sharded_match

    det = eng.cfg.detector
    m1 = mesh_mod.make_mesh([("t", 1)], jax.devices()[:1])
    sharded = jax.jit(lambda b_, i_, d_: sharded_match.match_bank_sharded(
        b_, i_, d_, 75.0, det, m1))(eng.bank, jnp.asarray(bgr),
                                    jnp.asarray(depth))
    local_m = det_mod.match_bank_jit(eng.bank, jnp.asarray(bgr),
                                     jnp.asarray(depth), 75.0, det,
                                     kernels=eng._kernels)
    st = int(np.argmax(np.asarray(sharded.valid)))
    lt = int(np.argmax(np.asarray(local_m.valid)))
    check("shard_map_match_tpu",
          bool(np.asarray(sharded.valid).any())
          and np.asarray(sharded.x)[st] == np.asarray(local_m.x)[lt]
          and np.asarray(sharded.similarity)[st]
          == np.asarray(local_m.similarity)[lt],
          {"top_x": int(np.asarray(sharded.x)[st]),
           "top_sim": float(np.asarray(sharded.similarity)[st])})

    # 8. serving artifact on the chip: export the fixture engine's fused
    # step (jax.export serializes the Mosaic custom calls), deserialize
    # the BYTES back and serve — results must match the live engine.
    # (Cross-process deserialize+execute on the TPU backend is verified
    # separately: tests/test_export.py documents the XLA:CPU-only AOT
    # replay bug this image has.)
    import tempfile

    from fealess_tpu.io import export as export_mod

    art_dir = tempfile.mkdtemp(prefix="fealess_artifact_")
    export_mod.export_artifact(eng, art_dir)
    art = export_mod.ServingArtifact(art_dir)
    fxc, fyc, cxc, cyc = np.loadtxt(os.path.join(FIXTURE, "cam.txt"))
    from fealess_tpu.engine import CamIntrinsics
    cam_fix = CamIntrinsics(fx=fxc, fy=fyc, cx=cxc, cy=cyc,
                            width=640, height=480)
    live = eng.recognition(bgr, depth, cam_fix)
    served = art.recognition(bgr, depth, cam_fix)
    art_ok = (bool(live) and bool(served)
              and served[0].match_rect == live[0].match_rect
              and abs(served[0].similarity - live[0].similarity) <= 1e-3
              and float(np.max(np.abs(served[0].world2cam
                                      - live[0].world2cam))) <= 1e-2)
    check("serving_artifact",
          art_ok,
          {"sim": None if not served else round(served[0].similarity, 2),
           "max_pose_dev": None if not (live and served) else float(
               np.max(np.abs(served[0].world2cam - live[0].world2cam)))})

    report["ok"] = bool(ok_all)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"tpu_parity_ok": report["ok"],
                      "out": out_path}), flush=True)
    return 0 if ok_all else 1


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode == "golden":
        run_golden()
        return 0
    if mode == "chip":
        out = sys.argv[2] if len(sys.argv) > 2 else \
            os.path.join(ROOT, "TPUPARITY_r05.json")
        return run_chip(out)
    # all: golden in a CPU subprocess, then chip in-process
    subprocess.run([sys.executable, __file__, "golden"], check=True)
    return run_chip(sys.argv[2] if len(sys.argv) > 2 else
                    os.path.join(ROOT, "TPUPARITY_r05.json"))


if __name__ == "__main__":
    sys.exit(main())
