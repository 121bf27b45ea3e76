"""Data-parallel batch reconstruction over a device mesh.

BASELINE.json config 5 ("pod-scale batch reconstruction"): a batch of
RGB-D frames shards across the mesh's ``d`` axis; every device runs the
full fused Recognition step (match + top-1 + ICP refine,
fealess_tpu.pipeline.recognize_top1) on its frame shard with the template
bank, model depths and conv kernels replicated.  Composes with template
sharding (fealess_tpu.parallel.sharded_match) as a 2-D mesh: shard the
bank on one axis and frames on the other.

On a multi-host pod this is the whole-program layout: frames arrive
per-host (jax.distributed + host-local data feeding), the bank replicates
over ICI, and the only cross-device traffic is the initial bank broadcast.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fealess_tpu import config as cfg
from fealess_tpu import pipeline
from fealess_tpu.bank import TemplateBank


def recognize_batch(bank: TemplateBank, model_depth_stack: jax.Array,
                    depth_origins: jax.Array, bgr_batch: jax.Array,
                    depth_batch: jax.Array, scene_k: jax.Array,
                    engine: cfg.EngineConfig,
                    kernels=None) -> pipeline.RecoStep:
    """vmapped Recognition over a leading frame axis (single device)."""
    return jax.vmap(
        lambda i, d: pipeline.recognize_top1(
            bank, model_depth_stack, depth_origins, i, d, scene_k, engine,
            kernels=kernels))(bgr_batch, depth_batch)


def recognize_batch_sharded(bank: TemplateBank,
                            model_depth_stack: jax.Array,
                            depth_origins: jax.Array,
                            bgr_batch: jax.Array, depth_batch: jax.Array,
                            scene_k: jax.Array, engine: cfg.EngineConfig,
                            mesh: Mesh, axis: str = "d",
                            kernels=None) -> pipeline.RecoStep:
    """Frame-sharded batch Recognition via sharding annotations.

    The batch axis must divide by the mesh ``axis`` size.  Expressed with
    ``jax.device_put`` + sharded-in/sharded-out jit so XLA partitions the
    vmapped step automatically (pure data parallelism: no collectives in
    the steady state)."""
    n_dev = mesh.shape[axis]
    b = bgr_batch.shape[0]
    assert b % n_dev == 0, (b, n_dev)
    frame_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    bgr_batch = jax.device_put(bgr_batch, frame_sharding)
    depth_batch = jax.device_put(depth_batch, frame_sharding)
    bank = jax.device_put(bank, repl)
    model_depth_stack = jax.device_put(model_depth_stack, repl)
    depth_origins = jax.device_put(depth_origins, repl)
    if kernels is not None:
        kernels = jax.device_put(kernels, repl)
    return recognize_batch(bank, model_depth_stack, depth_origins,
                           bgr_batch, depth_batch, scene_k, engine,
                           kernels=kernels)
