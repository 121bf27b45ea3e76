"""Fused brute-force nearest-neighbour Pallas kernel.

The ICP inner loop needs, per query point, the index and squared distance
of the nearest reference point (replacing the reference's FLANN kd-tree,
ICP/ICP.cpp:649-659).  A plain XLA formulation materializes the (Nq, Nr)
distance matrix in HBM (~17 GB at 64k x 64k), making ICP memory-bound.

This kernel tiles the pairwise computation: each program holds a
``(TQ, 1)`` query block and streams ``(1, TR)`` reference blocks, computes
the ``(TQ, TR)`` squared-distance tile on the VPU via broadcast arithmetic
(K=3 is hostile to the 128x128 MXU — padding the contraction wastes >97%
of its throughput, so elementwise is faster AND exact f32), reduces it to
a running (min, argmin) carried in the output block across the reference
grid dimension, and never writes the distance tile to HBM.  Traffic drops
from O(Nq*Nr) to O(Nq + Nr).

Tie-breaking matches ``jnp.argmin`` (first minimum wins): within a tile
``argmin`` picks the first, and across tiles only a strictly smaller
minimum replaces the carry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 256        # query tile (sublanes)
TR = 2048       # reference tile (lanes)


def _nn_kernel(qx, qy, qz, rx, ry, rz, out_d2, out_idx):
    j = pl.program_id(1)
    dx = qx[:] - rx[:]                       # (TQ, TR) broadcast
    dy = qy[:] - ry[:]
    dz = qz[:] - rz[:]
    d2 = dx * dx + dy * dy + dz * dz
    local_min = jnp.min(d2, axis=1, keepdims=True)            # (TQ, 1)
    local_arg = (jnp.argmin(d2, axis=1).astype(jnp.int32)[:, None]
                 + j * TR)

    @pl.when(j == 0)
    def _():
        out_d2[:] = local_min
        out_idx[:] = local_arg

    @pl.when(j > 0)
    def _():
        better = local_min < out_d2[:]
        out_d2[:] = jnp.where(better, local_min, out_d2[:])
        out_idx[:] = jnp.where(better, local_arg, out_idx[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_neighbor_tiled(query: jax.Array, ref: jax.Array,
                           interpret: bool = False):
    """Per-query nearest reference row: (idx (Nq,) i32, d2 (Nq,) f32).

    Nq and Nr are padded up to the tile sizes internally; callers pad
    invalid rows far away (icp.PAD_COORD) so padding never wins.
    """
    nq, nr = query.shape[0], ref.shape[0]
    nq_pad = -(-nq // TQ) * TQ
    nr_pad = -(-nr // TR) * TR
    big = jnp.float32(3.0e9)      # further than any real point, < sqrt(fmax)
    q = jnp.pad(query.astype(jnp.float32), ((0, nq_pad - nq), (0, 0)),
                constant_values=-big)
    r = jnp.pad(ref.astype(jnp.float32), ((0, nr_pad - nr), (0, 0)),
                constant_values=big)

    qcols = [q[:, i:i + 1] for i in range(3)]            # (Nq, 1) each
    rrows = [r[:, i].reshape(1, -1) for i in range(3)]   # (1, Nr) each

    grid = (nq_pad // TQ, nr_pad // TR)
    out_shape = (jax.ShapeDtypeStruct((nq_pad, 1), jnp.float32),
                 jax.ShapeDtypeStruct((nq_pad, 1), jnp.int32))
    qspec = pl.BlockSpec((TQ, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, TR), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((TQ, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
    d2, idx = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[qspec] * 3 + [rspec] * 3,
        out_specs=(ospec, ospec),
        out_shape=out_shape,
        interpret=interpret,
    )(*qcols, *rrows)
    return idx[:nq, 0], d2[:nq, 0]


def nearest_neighbor_auto(query: jax.Array, ref: jax.Array):
    """Pallas on TPU; interpret-mode semantics via pure XLA elsewhere."""
    platform = query.devices().pop().platform if hasattr(query, "devices") \
        else jax.default_backend()
    if platform == "tpu":
        return nearest_neighbor_tiled(query, ref)
    # CPU/GPU fallback: identical math/tie-breaking, fused by XLA per block.
    return _nn_xla_blocked(query, ref)


def _nn_xla_blocked(query: jax.Array, ref: jax.Array, block: int = 1024):
    p = query.shape[0]
    nblocks = -(-p // block)
    pad = nblocks * block - p
    qpad = jnp.pad(query.astype(jnp.float32), ((0, pad), (0, 0)),
                   constant_values=3.0e9)

    def one_block(qb):
        d2 = jnp.sum((qb[:, None, :] - ref[None, :, :]) ** 2, axis=-1)
        idx = jnp.argmin(d2, axis=1)
        return idx.astype(jnp.int32), jnp.take_along_axis(
            d2, idx[:, None], axis=1)[:, 0]

    idx, d2 = jax.lax.map(one_block, qpad.reshape(nblocks, block, 3))
    return idx.reshape(-1)[:p], d2.reshape(-1)[:p]
