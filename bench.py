"""Benchmark: end-to-end recognition throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the fused device-side Recognition step (full-bank LINE-MOD match
at 640x480, top-1 selection, ICP refinement — fealess_tpu.pipeline.
recognize_top1) at the reference operating point: 2 pyramid levels
T={5,8}, <=63 features/modality/template, threshold 75, ICP <=10 iters
(SURVEY.md §6).

Timing is pipelined (enqueue all iterations, block once): the TPU here
sits behind a tunnel whose per-call round-trip latency fluctuates by
>100x, so per-call blocking measures the network, not the device.

Baseline: the reference publishes no numbers (BASELINE.md); ``15 fps`` is
a single-core C++ LINE-MOD+ICP ballpark at this operating point, to be
replaced by a measured number once the C++ reference build is benchmarked
(BASELINE.json targets >=10x).
"""

import json
import time

import numpy as np

BASELINE_FPS = 15.0        # single-core CPU estimate, see module docstring
N_TEMPLATES = 128
WARMUP = 3
ITERS = 50


def main():
    import jax
    import jax.numpy as jnp
    from fealess_tpu import config as cfg
    from fealess_tpu import pipeline
    from __graft_entry__ import _tiny_bank

    engine = cfg.EngineConfig()
    det_cfg = engine.detector
    rng = np.random.default_rng(0)
    bank = _tiny_bank(det_cfg, capacity=N_TEMPLATES, rng=rng)
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

    fn = jax.jit(lambda b, md, o, i, d, k: pipeline.recognize_top1(
        b, md, o, i, d, k, engine))
    args = (bank, model_depth, origins, bgr, depth, scene_k)
    for _ in range(WARMUP):
        out = fn(*args)
        jax.block_until_ready(out.pose)

    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    jax.block_until_ready([o.pose for o in outs])
    dt = (time.perf_counter() - t0) / ITERS
    fps = 1.0 / dt
    print(json.dumps({
        "metric": f"e2e_recognition_fps_640x480_{N_TEMPLATES}t",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
