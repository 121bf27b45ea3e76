"""Benchmark: end-to-end recognition throughput on one chip.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"} per
configuration; the HEADLINE line (1024-template bank — BASELINE.json
config 4's operating point) is printed LAST so the driver's parser
records it.

Measures the fused device-side Recognition step (full-bank LINE-MOD match
at 640x480, top-1 selection, ICP refinement — fealess_tpu.pipeline.
recognize_top1) on the REAL fixture bank under benchmarks/reference/out/
— the identical YAML bank + scene pngs the measured C++ baseline ran on
(192x160-px template span, not a synthetic tiny bank), at the reference
operating point: 2 pyramid levels T={5,8}, <=63 features/modality,
threshold 75, ICP <=10 iters (SURVEY.md §6).

Timing protocol: the step runs as an ON-DEVICE dependency chain (each
frame's input is perturbed by the previous result inside one fori_loop)
and only the final result is materialized; per-frame time is the slope
between a short and a long chain.  This measures true device throughput:
``jax.block_until_ready`` does not fence on the axon TPU tunnel, and
per-call host materialization would measure the ~30ms tunnel round-trip
instead of the device step (the production serving loop keeps frames
streaming on device).

Baseline: the reference publishes no numbers (BASELINE.md), so it was
MEASURED here: the unmodified reference sources compiled -O3 -msse3
-mssse3 (all SSE fast paths live) and driven through
CObjRecoCAD::Recognition single-core on this same fixture reach
15.7-16.6 fps at 128 templates and 13.3 fps at 1024
(benchmarks/reference/run_baseline.py, table in BASELINE.md).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE = os.path.join(HERE, "benchmarks", "reference", "out")
SEQ = os.path.join(HERE, "benchmarks", "reference", "seq")
# Measured single-core C++ reference on the identical fixture (BASELINE.md).
BASELINE_FPS = {128: 16.6, 1024: 13.3}
# Config 2: the unmodified reference over the 30-view sequence bank
# (benchmarks/reference/run_parity.py, PARITY_r03.json: 56.74 ms/frame).
SEQ_BASELINE_FPS = 17.6
# Config 3: reference KCF update on 640x480 w/ the fixture-sized ROI
# (kcf_bench track: 6.38 ms) + reference recognition on the fixture
# (60.1 ms) — the two stages the gated demo loop runs per frame
# (test/linemod_acq.cpp:136-191).
TRACK_BASELINE_FPS = 1000.0 / (60.1 + 6.38)
# Training: unmodified reference addTemplate loop over the 30 rendered
# training views, -O3 -msse3 -mssse3 single-core (ref_train.cpp; inputs
# dumped by dump_train_views.py — identical to the fealess side).
TRAIN_TEMPLATES_BASELINE = 27.8
WARMUP = 3
ITERS = 40


def _slice_bank(bank, model_depth, origins, n):
    """First-n-slots view of a packed bank (fixture templates are
    identical, so the n-slot prefix IS the n-template fixture)."""
    import jax

    sliced = jax.tree.map(lambda a: a[:n], bank)
    return sliced, model_depth[:n], origins[:n]


def _chain_fps(chain, bgr):
    """Per-frame device time via the short/long on-device chain slope."""
    np.asarray(chain(bgr, WARMUP))                       # compile + warm
    n_lo, n_hi = 3, 3 + ITERS
    times = []
    for n in (n_lo, n_hi, n_lo, n_hi):
        t0 = time.perf_counter()
        np.asarray(chain(bgr, n))
        times.append(time.perf_counter() - t0)
    dt = (min(times[1], times[3]) - min(times[0], times[2])) / ITERS
    return 1.0 / dt


def _bench_series_recon(lines):
    """Config 2: full-series recognition on the 30-view sequence bank
    (the linemod_recon loop, test/linemod_recon.cpp:44-111): frames cycle
    through the rendered test sequence ON DEVICE, each step consuming the
    previous result."""
    import cv2
    import jax
    import jax.numpy as jnp

    from fealess_tpu import pipeline
    from fealess_tpu.engine import ObjReco

    if not os.path.exists(os.path.join(SEQ, "frames", "gt_poses.npy")):
        subprocess.run(
            [sys.executable,
             os.path.join(HERE, "benchmarks", "reference",
                          "make_sequence.py")],
            check=True, capture_output=True, text=True)

    eng = ObjReco.create("LmICP")
    eng.add_obj(os.path.join(SEQ, "features"))
    fx, fy, cx, cy = np.loadtxt(os.path.join(SEQ, "cam.txt"))
    scene_k = jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]],
                          jnp.float32)
    n_frames = 8
    bgrs = jnp.asarray(np.stack([
        cv2.imread(os.path.join(SEQ, "frames", f"color_{i:03d}.png"))
        for i in range(n_frames)]))
    depths = jnp.asarray(np.stack([
        cv2.imread(os.path.join(SEQ, "frames", f"depth_{i:03d}.png"),
                   cv2.IMREAD_UNCHANGED) for i in range(n_frames)]))
    ecfg = eng.cfg

    @jax.jit
    def chain(c0, steps, bgrs, depths, bank, md, org, kern, k):
        def body(i, c):
            idx = (i + c) % n_frames          # data-dep frame selection
            bgr = jax.lax.dynamic_index_in_dim(bgrs, idx, keepdims=False)
            dep = jax.lax.dynamic_index_in_dim(depths, idx, keepdims=False)
            step = pipeline.recognize_top1(bank, md, org, bgr, dep, k,
                                           ecfg, kernels=kern)
            return c + ((step.pose.sum() + step.similarity)
                        < -1e30).astype(jnp.int32)
        return jax.lax.fori_loop(0, steps, body, c0)

    args = (bgrs, depths, eng.bank, eng._model_depth_dev,
            eng._origins_dev, eng._kernels, scene_k)

    def run(n):
        t0 = time.perf_counter()
        np.asarray(chain(jnp.int32(0), n, *args))
        return time.perf_counter() - t0

    run(WARMUP)
    ts = [run(n) for _ in range(2) for n in (3, 3 + ITERS)]
    dt = (min(ts[1::2]) - min(ts[0::2])) / ITERS
    fps = 1.0 / dt
    lines.append({
        "metric": "series_recon_fps_640x480_30view_bank",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / SEQ_BASELINE_FPS, 2),
    })


def _bench_tracked(lines, eng, bgr_np, depth, scene_k):
    """Config 3: KCF-gated pipeline (the commented-out reference demo,
    test/linemod_acq.cpp:103-196): per frame, one KCF update + ROI-masked
    match + top-1 ICP refine, all chained on device."""
    import cv2
    import jax
    import jax.numpy as jnp

    from fealess_tpu import detector as det_mod
    from fealess_tpu import pipeline
    from fealess_tpu.tracker.kcf import KcfTracker, kcf_reference_config

    ecfg = eng.cfg
    det = ecfg.detector
    n = 128
    bank, md, org = _slice_bank(eng.bank, jnp.asarray(eng._model_depth),
                                jnp.asarray(eng._origins_array()), n)
    kern = det_mod.build_match_tables(bank, det)
    h, w = bgr_np.shape[:2]
    n_frames = 8
    frames = jnp.asarray(np.stack([
        np.roll(np.roll(bgr_np, i, axis=1), i // 2, axis=0)
        for i in range(n_frames)]))

    tracker = KcfTracker(kcf_reference_config(hog=True, fixed_window=True,
                                              multiscale=True, lab=False))
    state0 = tracker.init((240.0, 160.0, 192.0, 160.0), bgr_np)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]

    @jax.jit
    def chain(state, steps, frames, bank, md, org, kern, depth, k):
        def body(i, carry):
            st, c = carry
            idx = (i + c) % n_frames
            bgr = jax.lax.dynamic_index_in_dim(frames, idx, keepdims=False)
            st, _ = tracker._update(st, bgr)
            x, y, rw, rh = st.roi[0], st.roi[1], st.roi[2], st.roi[3]
            ex, ey = 0.2 * rw, 0.2 * rh          # roi_expand 1.4
            box = jnp.stack([x - ex, y - ey, x + rw + ex, y + rh + ey])
            m = det_mod.match_bank(bank, bgr, depth,
                                   ecfg.matching_threshold, det,
                                   kernels=kern, roi_box=box)
            pose, _ = pipeline._refine_candidate(
                bank, md, org, depth, k, m.template_slot[0], m.x[0],
                m.y[0], ecfg, md.shape[-1])
            return st, c + ((pose.sum() + m.similarity[0])
                            < -1e30).astype(jnp.int32)
        st, c = jax.lax.fori_loop(0, steps, body, (state, jnp.int32(0)))
        return st.roi + c.astype(jnp.float32)

    args = (frames, bank, md, org, kern, depth, scene_k)

    def run(nn):
        t0 = time.perf_counter()
        np.asarray(chain(state0, nn, *args))
        return time.perf_counter() - t0

    run(WARMUP)
    ts = [run(nn) for _ in range(2) for nn in (3, 3 + ITERS)]
    dt = (min(ts[1::2]) - min(ts[0::2])) / ITERS
    fps = 1.0 / dt
    lines.append({
        "metric": "kcf_gated_tracking_fps_640x480_128t",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / TRACK_BASELINE_FPS, 2),
    })


def _bench_multi(lines, eng, bgr, depth, scene_k):
    """Multi-object config: full-bank match at 1024t, top-4 candidate
    ICP refine (vmap) + 3D NMS per frame, chained on device
    (pipeline.recognize_multi — the detection()+NMS design of
    ICP/NMS.cpp:6-40).  Baseline composition: the reference would run
    its single-candidate Recognition once per candidate (it has no
    multi-object path), so 4 candidates cost 4x the 1024t frame time."""
    import jax
    import jax.numpy as jnp

    from fealess_tpu import pipeline

    ecfg = eng.cfg
    m_obj = 4

    @jax.jit
    def chain(b, steps, bank, md, org, kern, d, k):
        def body(i, bb):
            step = pipeline.recognize_multi(
                bank, md, org, bb, d, k, ecfg, m_obj, kernels=kern)
            return bb + ((step.poses.sum() + step.similarity.sum()
                          + step.icp_dist.sum())
                         < -1e30).astype(jnp.uint8)
        return jax.lax.fori_loop(0, steps, body, b)

    args = (eng.bank, eng._model_depth_dev, eng._origins_dev,
            eng._kernels, depth, scene_k)
    fps = _chain_fps(lambda b, n: chain(b, n, *args), bgr)
    base = BASELINE_FPS[1024] / m_obj
    lines.append({
        "metric": f"multi_object_recognition_fps_640x480_1024t_top{m_obj}_nms",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / base, 2),
    })


def _bench_train(lines):
    """Training throughput: templates/s over the 30 rendered training
    views the seq bank is built from (identical inputs to the measured
    C++ addTemplate loop — benchmarks/reference/ref_train.cpp, 27.8
    templates/s single-core).

    The batched trainer (training.add_templates_batched) is a two-stage
    pipeline: vmapped quantization of all views in one device program,
    then thread-pooled host extraction (greedy selection is inherently
    sequential per view).  Steady state the stages overlap, so the
    metric is 30 / max(stage times): the device stage measured by the
    on-device chain-slope protocol (inputs resident — same convention as
    every serving config; block_until_ready does not fence on the axon
    tunnel and the tunnel's ~10-20 MB/s is the dev harness, not the
    production host link), the host stage by wall clock."""
    import sys as _sys
    import jax
    import jax.numpy as jnp

    _sys.path.insert(0, os.path.join(HERE, "benchmarks", "reference"))
    from make_sequence import model_cloud, render, training_poses

    from fealess_tpu import config as fcfg
    from fealess_tpu import training
    from fealess_tpu.ops import image as fi
    from fealess_tpu.ops import quantize as q

    det = fcfg.DetectorConfig()
    cg, dn = det.color_gradient, det.depth_normal
    rng = np.random.default_rng(5)
    pts, colors = model_cloud()
    raw = [render(pts, colors, r, t, rng) for (r, t) in training_poses()]
    masks = [v[2] for v in raw]
    rects, (ch, cw) = training._batch_crop_rects(masks, raw[0][0].shape[:2],
                                                 det.pyramid_levels)
    bgr_c = jnp.asarray(np.stack(
        [raw[i][0][y0:y0 + ch, x0:x0 + cw]
         for i, (y0, x0) in enumerate(rects)]))
    dep_c = jnp.asarray(np.stack(
        [raw[i][1][y0:y0 + ch, x0:x0 + cw]
         for i, (y0, x0) in enumerate(rects)]))
    n_views = len(raw)

    def quantize_all(bgr_b, dep_b):
        def one(bgr, depth):
            out = []
            src = bgr
            qdn = q.quantize_normals(depth, dn.distance_threshold,
                                     dn.difference_threshold)
            for l in range(det.pyramid_levels):
                if l > 0:
                    src = fi.pyr_down_u8(src)
                    qdn = qdn[::2, ::2]
                ab, mag = q.quantize_gradients(src, cg.weak_threshold)
                out.append((ab, mag, qdn))
            return tuple(out)
        return jax.vmap(one)(bgr_b, dep_b)

    @jax.jit
    def chain(b, steps, dep):
        def body(i, bb):
            out = quantize_all(bb, dep)
            s = sum(a.astype(jnp.float32).sum()
                    for lv in out for a in lv)
            return bb + (s < -1e30).astype(jnp.uint8)
        return jax.lax.fori_loop(0, steps, body, b)

    def run(nn):
        t0 = time.perf_counter()
        np.asarray(chain(bgr_c, nn, dep_c))
        return time.perf_counter() - t0

    run(WARMUP)
    ts = [run(nn) for _ in range(2) for nn in (3, 3 + ITERS)]
    t_quant = (min(ts[1::2]) - min(ts[0::2])) / ITERS

    # host extraction stage (threaded), on prefetched quantized maps
    qlevels = jax.device_get(quantize_all(bgr_c, dep_c))

    def extract_all():
        import concurrent.futures as cf

        def one(i):
            y0, x0 = rects[i]
            msk = masks[i][y0:y0 + ch, x0:x0 + cw]
            cg_nf, dn_nf = cg.num_features, dn.num_features
            dn_ex = dn.extract_threshold
            for l in range(det.pyramid_levels):
                if l > 0:
                    msk = msk[::2, ::2]
                    cg_nf //= 2
                    dn_nf //= 2
                    dn_ex //= 2
                ab, mag, qdn = (a[i] for a in qlevels[l])
                f1 = training.extract_gradient_template(
                    ab, mag, msk, cg_nf, cg.strong_threshold)
                f2 = training.extract_normal_template(qdn, msk, dn_nf,
                                                      dn_ex)
                assert f1 is not None and f2 is not None
            return 0

        with cf.ThreadPoolExecutor(max_workers=16) as pool:
            list(pool.map(one, range(n_views)))

    extract_all()
    te = []
    for _ in range(5):
        t0 = time.perf_counter()
        extract_all()
        te.append(time.perf_counter() - t0)
    t_extract = min(te)

    tps = n_views / max(t_quant, t_extract)
    lines.append({
        "metric": "training_templates_per_s_640x480_linemod",
        "value": round(tps, 2),
        "unit": "templates/s/chip",
        "vs_baseline": round(tps / TRAIN_TEMPLATES_BASELINE, 2),
    })


def _bench_wide(lines):
    """Wide-geometry config: full Recognition at 1280x960 (the wide
    fixture of benchmarks/tpu_parity.py — 2x the 640x480 scene, same
    physical geometry) on a 128-slot bank.  The reference CANNOT serve
    this: PrepareInputData hard-downsizes every input to 640 wide
    (obj_reco_lmicp.cpp:216-259), so vs_baseline compares against its
    640-wide 128t figure while this config processes 4x the pixels."""
    import cv2
    import jax
    import jax.numpy as jnp

    from benchmarks.tpu_parity import _wide_fixture
    from fealess_tpu import config as fcfg
    from fealess_tpu import detector as det_mod
    from fealess_tpu import pipeline
    from fealess_tpu.engine import ObjReco

    wdir, bgr_np, depth_np = _wide_fixture()
    fx, fy, cx, cy = np.loadtxt(os.path.join(FIXTURE, "cam.txt"))
    scene_k = jnp.asarray([[2 * fx, 0, 2 * cx], [0, 2 * fy, 2 * cy],
                           [0, 0, 1]], jnp.float32)
    eng = ObjReco.create("LmICP", fcfg.EngineConfig(
        detector=fcfg.DetectorConfig(image_width=1280, image_height=960,
                                     max_candidates=64),
        template_fx=2 * fx, template_fy=2 * fy,
        template_cx=2 * cx, template_cy=2 * cy))
    eng.add_obj(os.path.join(wdir, "features"))
    n = 128
    bank = jax.tree.map(
        lambda a: (jnp.broadcast_to(a[:1], (n,) + a.shape[1:])
                   if hasattr(a, "shape") and a.shape[:1] == (1,) else a),
        eng.bank)
    bank = bank.replace(template_idx=jnp.arange(n, dtype=jnp.int32))
    md = jnp.broadcast_to(eng._model_depth_dev[:1],
                          (n,) + eng._model_depth_dev.shape[1:])
    org = jnp.broadcast_to(eng._origins_dev[:1], (n, 2))
    kern = det_mod.build_match_tables(bank, eng.cfg.detector)
    ecfg = eng.cfg
    depth = jnp.asarray(depth_np)

    @jax.jit
    def chain(b, steps, bank, md, org, kern, d, k):
        def body(i, bb):
            step = pipeline.recognize_top1(bank, md, org, bb, d, k, ecfg,
                                           kernels=kern)
            return bb + ((step.pose.sum() + step.similarity)
                         < -1e30).astype(jnp.uint8)
        return jax.lax.fori_loop(0, steps, body, b)

    fps = _chain_fps(lambda b, nn: chain(b, nn, bank, md, org, kern,
                                         depth, scene_k),
                     jnp.asarray(bgr_np))
    lines.append({
        "metric": "e2e_recognition_fps_1280x960_128t_wide",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FPS[128], 2),
    })


def main():
    import cv2
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache (best-effort: cache errors are warnings,
    # jax_raise_persistent_cache_errors defaults False) — the bench is
    # compile-bound over the tunnel on cold runs.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from fealess_tpu import detector as det_mod
    from fealess_tpu import pipeline
    from fealess_tpu.engine import ObjReco

    eng = ObjReco.create("LmICP")
    eng.add_obj(os.path.join(FIXTURE, "features"))
    bgr_np = cv2.imread(os.path.join(FIXTURE, "scene_bgr.png"))
    depth_np = cv2.imread(os.path.join(FIXTURE, "scene_depth.png"),
                          cv2.IMREAD_UNCHANGED)
    fx, fy, cx, cy = np.loadtxt(os.path.join(FIXTURE, "cam.txt"))
    scene_k = jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)
    bgr = jnp.asarray(bgr_np)
    depth = jnp.asarray(depth_np)
    engine_cfg = eng.cfg
    full_model_depth = jnp.asarray(eng._model_depth)
    full_origins = jnp.asarray(eng._origins_array())

    # The 128t line reuses the first-n slot prefix of the 1024-slot
    # fixture bank; that is only the same workload the C++ baseline ran
    # iff the fixture's views are identical — assert it (ADVICE r2).
    feat_x = np.asarray(eng.bank.feat_x)
    assert (np.array_equal(feat_x[0], feat_x[500])
            and np.array_equal(feat_x[0], feat_x[1023])), \
        "fixture bank slots differ; 128t prefix slice is not the baseline workload"

    class _EmitList(list):
        """Print each result line the moment it is measured: a timeout in
        the driver then still records every completed config (it parses
        the LAST printed JSON line; the 1024t headline prints last)."""
        def append(self, item):
            print(json.dumps(item), flush=True)
            super().append(item)

    lines = _EmitList()
    _bench_series_recon(lines)                       # config 2
    _bench_tracked(lines, eng, bgr_np, depth, scene_k)   # config 3
    _bench_multi(lines, eng, bgr, depth, scene_k)    # multi-object serve
    _bench_wide(lines)                               # 1280x960 serving
    _bench_train(lines)                              # training throughput
    # config 1 (+4's operating point): ICP modes x bank sizes.  The
    # legacy-named lines run point_to_point ICP — the reference's own
    # algorithm and the workload every earlier round measured under
    # these names (apples-to-apples continuity); the production default
    # (point_to_plane, 10x tighter ADD — PARITY_r05) gets its own
    # explicitly-tagged line.  Headline (last) = 1024t point.
    import dataclasses as _dc
    point_cfg = _dc.replace(engine_cfg, icp=_dc.replace(
        engine_cfg.icp, mode="point_to_point"))
    runs = [(128, point_cfg, ""), (1024, engine_cfg, "_plane_icp"),
            (1024, point_cfg, "")]
    for n, run_cfg, tag in runs:
        bank, model_depth, origins = _slice_bank(
            eng.bank, full_model_depth, full_origins, n)
        kernels = jax.block_until_ready(
            det_mod.build_match_tables(bank, run_cfg.detector))

        @jax.jit
        def chain(b, steps, bank, model_depth, origins, kernels, d, k,
                  run_cfg=run_cfg):
            # big arrays ride in as arguments, NOT as closure constants:
            # baked-in constants ship inside the compile request and
            # overflow the TPU tunnel's body limit.
            def body(i, bb):
                step = pipeline.recognize_top1(
                    bank, model_depth, origins, bb, d, k,
                    run_cfg, kernels=kernels)
                # data dependency on the FULL result including the refined
                # pose; depending on similarity alone lets XLA dead-code
                # the ICP refine stage out of the chain.  Never fires.
                return bb + ((step.pose.sum() + step.similarity)
                             < -1e30).astype(jnp.uint8)
            return jax.lax.fori_loop(0, steps, body, b)

        fps = _chain_fps(
            lambda b, n: chain(b, n, bank, model_depth, origins,
                               kernels, depth, scene_k), bgr)
        lines.append({
            "metric": f"e2e_recognition_fps_640x480_{n}t_fixture{tag}",
            "value": round(fps, 2),
            "unit": "frames/s/chip",
            "vs_baseline": round(fps / BASELINE_FPS[n], 2),
        })


if __name__ == "__main__":
    main()
