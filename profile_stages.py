"""Per-stage device timing of recognize_top1 on the real TPU (slope method)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from fealess_tpu import config as cfg
from fealess_tpu import detector as det_mod
from fealess_tpu import pipeline
from __graft_entry__ import _tiny_bank

N_TEMPLATES = 128
engine = cfg.EngineConfig()
det_cfg = engine.detector
rng = np.random.default_rng(0)
bank = _tiny_bank(det_cfg, capacity=N_TEMPLATES, rng=rng)
kernels = det_mod.build_match_kernels(bank, det_cfg)
bgr = jnp.asarray(rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8))
depth = jnp.asarray(rng.integers(400, 900, size=(480, 640), dtype=np.uint16))
model_depth = jnp.asarray(rng.integers(400, 880, size=(N_TEMPLATES, 256, 256),
                                       dtype=np.uint16))
origins = jnp.zeros((N_TEMPLATES, 2), jnp.int32)
scene_k = jnp.asarray([[608.0, 0, 320], [0, 608.0, 240], [0, 0, 1]], jnp.float32)


def slope(make_chain, iters=30, reps=2):
    f = jax.jit(make_chain, static_argnums=1)
    np.asarray(f(bgr, 2))
    lo, hi = 2, 2 + iters
    ts = []
    for _ in range(reps):
        for n in (lo, hi):
            t0 = time.perf_counter()
            np.asarray(f(bgr, n))
            ts.append(time.perf_counter() - t0)
    lo_t = min(ts[0::2]); hi_t = min(ts[1::2])
    return (hi_t - lo_t) / iters * 1000.0


def full_chain(b, n):
    def body(i, bb):
        s = pipeline.recognize_top1(bank, model_depth, origins, bb, depth,
                                    scene_k, engine, kernels=kernels)
        return bb + (s.similarity < -1e30).astype(jnp.uint8)
    return jax.lax.fori_loop(0, n, body, b)


def match_chain(b, n):
    def body(i, bb):
        m = det_mod.match_bank(bank, bb, depth, 75.0, det_cfg, kernels=kernels)
        return bb + (m.similarity[0] < -1e30).astype(jnp.uint8)
    return jax.lax.fori_loop(0, n, body, b)


def frontend_chain(b, n):
    def body(i, bb):
        levels = det_mod.quantized_pyramid(bb, depth, det_cfg)
        planes = det_mod.response_planes(levels, det_cfg)
        return bb + (planes[0][0].sum() > jnp.uint32(1 << 31)).astype(jnp.uint8)
    return jax.lax.fori_loop(0, n, body, b)


def quant_chain(b, n):
    from fealess_tpu.ops import quantize as q
    def body(i, bb):
        levels = det_mod.quantized_pyramid(bb, depth, det_cfg)
        s = sum(m.astype(jnp.uint32).sum() for mods in levels for m in mods)
        return bb + (s > jnp.uint32(1 << 31)).astype(jnp.uint8)
    return jax.lax.fori_loop(0, n, body, b)


for name, fn in [("full", full_chain), ("match", match_chain),
                 ("frontend(quant+planes)", frontend_chain),
                 ("quant_pyramid+planes-sum", quant_chain)]:
    print(f"{name:28s} {slope(fn):7.3f} ms/frame", flush=True)
