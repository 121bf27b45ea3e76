"""Benchmark: full-frame LINE-MOD match throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md); its intended
operating point is 640x480 RGB-D, 2 pyramid levels, T={5,8}, <=63 features
per modality per template (SURVEY.md §6).  ``vs_baseline`` compares
against a single-core C++ LINE-MOD ballpark of ~15 fps at 100 templates
(to be replaced by a measured reference number once the C++ build is
benchmarked; BASELINE.json targets >=10x).
"""

import json
import time

import numpy as np

BASELINE_FPS = 15.0        # single-core CPU estimate, see module docstring
N_TEMPLATES = 128
WARMUP = 2
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp
    from fealess_tpu import config as cfg
    from fealess_tpu import detector
    from __graft_entry__ import _tiny_bank

    det_cfg = cfg.DetectorConfig()
    rng = np.random.default_rng(0)
    bank = _tiny_bank(det_cfg, capacity=N_TEMPLATES, rng=rng)
    bgr = jnp.asarray(rng.integers(0, 255, size=(480, 640, 3),
                                   dtype=np.uint8))
    depth = jnp.asarray(rng.integers(400, 900, size=(480, 640),
                                     dtype=np.uint16))

    fn = jax.jit(lambda b, i, d: detector.match_bank(b, i, d, 75.0, det_cfg))
    for _ in range(WARMUP):
        out = fn(bank, bgr, depth)
        jax.block_until_ready(out.similarity)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(bank, bgr, depth)
        jax.block_until_ready(out.similarity)
    dt = (time.perf_counter() - t0) / ITERS
    fps = 1.0 / dt
    print(json.dumps({
        "metric": f"linemod_match_fps_640x480_{N_TEMPLATES}t",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
