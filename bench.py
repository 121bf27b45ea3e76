"""Benchmark: end-to-end recognition throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the fused device-side Recognition step (full-bank LINE-MOD match
at 640x480, top-1 selection, ICP refinement — fealess_tpu.pipeline.
recognize_top1) at the reference operating point: 2 pyramid levels
T={5,8}, <=63 features/modality/template, threshold 75, ICP <=10 iters
(SURVEY.md §6).

Timing protocol: the step runs as an ON-DEVICE dependency chain (each
frame's input is perturbed by the previous result inside one fori_loop)
and only the final result is materialized; per-frame time is the slope
between a short and a long chain.  This measures true device throughput:
``jax.block_until_ready`` does not fence on the axon TPU tunnel, and
per-call host materialization would measure the ~30ms tunnel round-trip
instead of the ~5ms device step (the production serving loop keeps frames
streaming on device).

Baseline: the reference publishes no numbers (BASELINE.md), so it was
MEASURED here: the unmodified reference sources compiled -O3 -msse3
-mssse3 (all SSE fast paths live) and driven through
CObjRecoCAD::Recognition single-core on the same operating point and
template count reach 15.7-16.6 fps (benchmarks/reference/run_baseline.py,
table in BASELINE.md).  BASELINE_FPS pins the best measured run.
"""

import json
import time

import numpy as np

BASELINE_FPS = 16.6        # measured single-core C++ reference, BASELINE.md
N_TEMPLATES = 128
WARMUP = 3
ITERS = 50


def main():
    import jax
    import jax.numpy as jnp
    from fealess_tpu import config as cfg
    from fealess_tpu import detector as det_mod
    from fealess_tpu import pipeline
    from __graft_entry__ import _tiny_bank

    engine = cfg.EngineConfig()
    det_cfg = engine.detector
    rng = np.random.default_rng(0)
    bank = _tiny_bank(det_cfg, capacity=N_TEMPLATES, rng=rng)
    kernels = jax.block_until_ready(
        det_mod.build_match_kernels(bank, det_cfg))
    bgr = jnp.asarray(rng.integers(0, 255, size=(480, 640, 3),
                                   dtype=np.uint8))
    depth = jnp.asarray(rng.integers(400, 900, size=(480, 640),
                                     dtype=np.uint16))
    model_depth = jnp.asarray(rng.integers(400, 880,
                                           size=(N_TEMPLATES, 256, 256),
                                           dtype=np.uint16))
    origins = jnp.zeros((N_TEMPLATES, 2), jnp.int32)
    scene_k = jnp.asarray([[608.0, 0, 320], [0, 608.0, 240], [0, 0, 1]],
                          jnp.float32)

    @jax.jit
    def chain(b, n):
        def body(i, bb):
            step = pipeline.recognize_top1(bank, model_depth, origins, bb,
                                           depth, scene_k, engine,
                                           kernels=kernels)
            # data dependency on the result; never actually fires
            return bb + (step.similarity < -1e30).astype(jnp.uint8)
        return jax.lax.fori_loop(0, n, body, b)

    np.asarray(chain(bgr, WARMUP))                       # compile + warm
    n_lo, n_hi = 3, 3 + ITERS
    times = []
    for n in (n_lo, n_hi, n_lo, n_hi):
        t0 = time.perf_counter()
        np.asarray(chain(bgr, n))
        times.append(time.perf_counter() - t0)
    dt = (min(times[1], times[3]) - min(times[0], times[2])) / ITERS
    fps = 1.0 / dt
    print(json.dumps({
        "metric": f"e2e_recognition_fps_640x480_{N_TEMPLATES}t",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
