"""Fused Pallas template-score kernels (coarse whole-image + local refine).

The LINE-MOD score is a sparse sum over template features of decimated
response planes (the reference's SSE linear-memory adds,
linemod/linemod.cpp:1130-1300).  Dense reformulations waste the MXU —
the one-hot conv kernel is >99.9% zeros at 1024 templates (~425 GFLOP
for 155M useful adds, 12.6ms measured) — and XLA gathers on TPU lower to
scalar loops (330ms measured for a scan formulation).  These kernels do
the sparse accumulation directly on the VPU.

Design notes (all measured on the target chip):

- Mosaic's dynamic lane roll costs ~60 cycles per (11, 128) operand —
  6x the slice+add itself — so the kernels never roll per feature.
  Instead features are BUCKETED by their decimated column offset
  ``rx = x//T``: within a bucket the lane shift is common, so the
  per-feature work is an aligned dynamic-sublane slice + add (~13
  cycles), and ONE static lane shift per bucket is hoisted out of the
  feature loop (sum-then-shift == shift-then-sum).  Buckets run at
  STRIDE 2 against a VMEM stack holding the packed planes plus a
  one-lane-preshifted copy — ``rx % 2`` is absorbed into the row index,
  halving the ~85-cycle per-bucket epilogue count (37% kernel win,
  measured) — and empty buckets skip via ``lax.cond``.
- Only 32-bit dtypes support dynamic sublane slices on this toolchain,
  which would blow VMEM for the level-0 plane stack; instead EIGHT u8
  response channels (values 0..4, 3 bits) are nibble-packed per i32
  lane and the kernel extracts one with a shift+mask.  The packed
  level-0 640x480 stack is ~2.9 MB and stays resident in VMEM; wide
  images ride multiple 128-lane tiles (1280-wide = 2), gated by a VMEM
  budget with a width-agnostic XLA fallback beyond it.
- Features are sorted valid-first at table-build time, and the bucket
  boundaries double as loop trip counts, so invalid padding features
  cost nothing (at the coarse pyramid level half the feature slots are
  padding: 63>>1 features per modality).

Score tables (built once per bank by fealess_tpu.detector.
build_match_tables) hold, per pyramid level, the bucket-sorted feature
components ``c`` (channel), ``ry``/``rx`` (decimated offsets) and the
``bstart`` bucket boundaries; the wrappers here derive the kernel's
packed-row indices from them, and the XLA fallbacks (CPU tests,
multichip dryrun) consume the same tables with identical arithmetic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOCAL_WINDOW = 16   # 16x16 decimated refinement patch (linemod.cpp:1243)
_BN = 8             # templates per coarse-kernel program


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pack_planes(planes: jax.Array, hpad: int, lanes: int) -> jax.Array:
    """(C, Hd, Wd) u8 response planes -> (CQ, hpad, lanes) i32 with EIGHT
    consecutive channels nibble-packed per lane (responses are 0..4, 3
    bits) and one all-zero group appended (the redirect target for
    discarded features).  ``lanes`` is a 128-multiple >= Wd — wide
    images ride multiple 128-lane tiles."""
    c, hd, wd = planes.shape
    c8 = _round_up(c, 8)
    x = jnp.pad(planes.astype(jnp.int32),
                ((0, c8 - c), (0, hpad - hd), (0, lanes - wd)))
    x = x.reshape(c8 // 8, 8, hpad, lanes)
    packed = x[:, 0]
    for b in range(1, 8):
        packed = packed + (x[:, b] << (4 * b))
    return jnp.pad(packed, ((0, 1), (0, 0), (0, 0)))


def _shift_lanes(x: jax.Array, b: int) -> jax.Array:
    """out[..., j] = x[..., j + b] (static circular lane shift)."""
    if b == 0:
        return x
    return jnp.concatenate([x[:, b:], x[:, :b]], axis=1)


def _shift_lanes_zero(x: jax.Array, b: int) -> jax.Array:
    """out[..., j] = x[..., j + b] for j + b < 128, else 0 (static
    zero-filling lane shift).  Used by the local kernel: a read past the
    128-lane tile is a read past the image (planes are zero-padded from
    Wd to 128), so zero IS the exact per-feature out-of-bounds discard of
    similarityLocal (linemod.cpp:1257-1258) — gating per window column,
    not per bucket."""
    if b == 0:
        return x
    return jnp.concatenate([x[:, b:], jnp.zeros_like(x[:, :b])], axis=1)


# ---------------------------------------------------------------------------
# Coarse whole-image scorer
# ---------------------------------------------------------------------------

# Budget for the VMEM-resident packed plane stack; above it the kernels
# drop from stride-2 (two lane-preshifted copies) to a single copy.
_VMEM_STACK_BUDGET = 11 * 2 ** 20


def _stacked_planes(planes: jax.Array, hpad: int, lanes: int):
    """Packed plane stack + bucket stride for the score kernels.

    Stride 2 keeps TWO copies in VMEM — the packed planes and a
    one-lane-preshifted copy — so a feature's odd column offset is
    absorbed into its ROW index ((rx % 2) selects the copy) and the
    kernels need only every second lane-shift epilogue: per-bucket
    fixed cost (zeros + static shift + add, ~85 cyc on (30, 128))
    halves, a measured 37% kernel win at the fixture operating point
    (benchmarks/kernel_lab).  Falls back to one copy when two would
    blow the VMEM budget."""
    packed = _pack_planes(planes, hpad, lanes)   # (CQ, hpad, lanes) i32
    cq = packed.shape[0]
    if 2 * packed.size * 4 > _VMEM_STACK_BUDGET:
        stride = 1
        d2 = packed.reshape(cq * hpad, lanes)
    else:
        stride = 2
        shifted = jnp.concatenate(
            [packed[:, :, 1:], jnp.zeros_like(packed[:, :, :1])], axis=2)
        d2 = jnp.concatenate([packed, shifted]).reshape(
            stride * cq * hpad, lanes)
    # Multi-tile widths: Mosaic only proves alignment for dynamic sublane
    # loads on single-lane-tile (128-wide) memrefs, so a (R, n*128) stack
    # is re-laid as (n*R, 128) — lane tile t occupies rows [t*R, (t+1)*R)
    # and the kernels load each tile's slab and concatenate.
    if lanes > 128:
        n_t = lanes // 128
        r = d2.shape[0]
        d2 = (d2.reshape(r, n_t, 128).transpose(1, 0, 2)
              .reshape(n_t * r, 128))
    return d2, cq, stride


def _bucket_starts(bstart: jax.Array, stride: int) -> jax.Array:
    """Stride-1 cumulative bucket boundaries -> stride-s boundaries
    (bucket j spans rx in [s*j, s*(j+1)): rows bstart[s*j]..bstart[min(
    s*(j+1), nb)])."""
    if stride == 1:
        return bstart
    nb = bstart.shape[1] - 1
    out = bstart[:, ::stride]
    if nb % stride:
        out = jnp.concatenate([out, bstart[:, -1:]], axis=1)
    return out


def _coarse_kernel(hd: int, nb2: int, f: int, stride: int, lanes: int,
                   rblock: int):
    n_tiles = lanes // 128

    def kernel(rows_ref, sh_ref, bstart_ref, d_ref, out_ref):
        for t in range(_BN):
            acc = jnp.zeros((hd, lanes), jnp.int32)
            for b in range(nb2):
                lo = bstart_ref[t, b]
                hi = bstart_ref[t, b + 1]

                def inner(i, bacc, t=t):
                    row = rows_ref[t, i]
                    slab = jnp.concatenate(
                        [d_ref[pl.ds(row + j * rblock, hd), :]
                         for j in range(n_tiles)], axis=1) \
                        if n_tiles > 1 else d_ref[pl.ds(row, hd), :]
                    return bacc + ((slab >> sh_ref[t, i]) & 15)

                def work(a, lo=lo, hi=hi, b=b):
                    bacc = jax.lax.fori_loop(
                        lo, hi, inner, jnp.zeros((hd, lanes), jnp.int32))
                    return a + _shift_lanes(bacc, stride * b)

                acc = jax.lax.cond(lo < hi, work, lambda a: a, acc)
            out_ref[t] = acc
    return kernel


@jax.custom_batching.sequential_vmap
def _coarse_scores_tpu(planes: jax.Array, table) -> jax.Array:
    # sequential_vmap: Pallas auto-batching rejects the SMEM table
    # operands' tiling; a vmapped call (frame-batched serving,
    # parallel.batch_recon on chip) lowers to lax.map over frames —
    # each frame's kernel already fills the chip.
    c, hd, wd = planes.shape
    nb = table["bstart"].shape[1] - 1
    # lanes cover the image AND the widest bucket shift (features at
    # column offset rx read plane column p + rx; beyond-lanes reads are
    # zero-filled by the static shift, matching the zero padding)
    lanes = _round_up(wd + nb, 128)
    hpad = hd + nb
    if (_pack_planes_size(c, hpad, lanes) > _VMEM_STACK_BUDGET
            or _BN * hd * lanes * 4 > 2 ** 21):   # out block VMEM bound
        return _coarse_scores_xla(planes, table)
    d2, cq, stride = _stacked_planes(planes, hpad, lanes)

    cc, ry, rx = table["c"], table["ry"], table["rx"]
    rows = ((cc // 8) * hpad + ry
            + (rx % stride) * (cq * hpad)).astype(jnp.int32)
    sh = (4 * (cc % 8)).astype(jnp.int32)
    bstart = _bucket_starts(table["bstart"], stride)
    nb2 = bstart.shape[1] - 1
    n, f = rows.shape
    npad = _round_up(n, _BN)
    rows = jnp.pad(rows, ((0, npad - n), (0, 0)))
    sh = jnp.pad(sh, ((0, npad - n), (0, 0)))
    bstart = jnp.pad(bstart, ((0, npad - n), (0, 0)))  # all-zero -> no work

    rblock = d2.shape[0] // (lanes // 128)
    out = pl.pallas_call(
        _coarse_kernel(hd, nb2, f, stride, lanes, rblock),
        grid=(npad // _BN,),
        in_specs=[
            pl.BlockSpec((_BN, f), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_BN, f), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_BN, nb2 + 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BN, hd, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, hd, lanes), jnp.int32),
    )(rows, sh, bstart, d2)
    return out[:n, :, :wd]


def _pack_planes_size(c: int, hpad: int, lanes: int) -> int:
    """Bytes of ONE nibble-packed plane-stack copy (stride-1 floor)."""
    return (_round_up(c, 8) // 8 + 1) * hpad * lanes * 4


def _coarse_scores_xla(planes: jax.Array, table) -> jax.Array:
    """Identical arithmetic via per-feature dynamic slices (CPU path)."""
    c, hd, wd = planes.shape
    nb = table["bstart"].shape[1] - 1
    padded = jnp.pad(planes.astype(jnp.int32),
                     ((0, 0), (0, nb), (0, nb)))
    n, f = table["c"].shape
    nvalid = table["bstart"][:, -1]

    def step(acc, packed):
        ccol, rycol, rxcol, fidx = packed
        sl = jax.vmap(lambda c_, ry_, rx_: jax.lax.dynamic_slice(
            padded, (c_, ry_, rx_), (1, hd, wd))[0])(ccol, rycol, rxcol)
        live = (fidx < nvalid)[:, None, None]
        return acc + jnp.where(live, sl, 0), None

    fids = jnp.broadcast_to(jnp.arange(f)[None, :], (n, f))
    acc, _ = jax.lax.scan(
        step, jnp.zeros((n, hd, wd), jnp.int32),
        (table["c"].T, table["ry"].T, table["rx"].T, fids.T))
    return acc


def coarse_scores(planes: jax.Array, table) -> jax.Array:
    """(N, Hd, Wd) i32 whole-image raw scores at the coarse level
    (``similarity``, linemod.cpp:1130-1214 — zero-padded beyond the
    image instead of the reference's flat-buffer wrap; wrapped candidate
    positions are filtered by the caller either way).

    ``table`` is the coarse entry of detector.build_match_tables.
    """
    if jax.default_backend() == "tpu":
        return _coarse_scores_tpu(planes, table)
    return _coarse_scores_xla(planes, table)


# ---------------------------------------------------------------------------
# Local 16x16 refinement scorer
# ---------------------------------------------------------------------------

def _local_kernel(nb2: int, f: int, stride: int, lanes: int, rblock: int):
    w16 = LOCAL_WINDOW
    n_tiles = lanes // 128

    def kernel(rows_ref, sh_ref, bstart_ref, px0_ref, d_ref, out_ref):
        kk = pl.program_id(0)
        acc = jnp.zeros((w16, lanes), jnp.int32)
        for b in range(nb2):
            lo = bstart_ref[kk, b]
            hi = bstart_ref[kk, b + 1]

            def inner(i, bacc):
                row = rows_ref[kk, i]
                slab = jnp.concatenate(
                    [d_ref[pl.ds(row + j * rblock, w16), :]
                     for j in range(n_tiles)], axis=1) \
                    if n_tiles > 1 else d_ref[pl.ds(row, w16), :]
                return bacc + ((slab >> sh_ref[kk, i]) & 15)

            def work(a, lo=lo, hi=hi, b=b):
                bacc = jax.lax.fori_loop(
                    lo, hi, inner, jnp.zeros((w16, lanes), jnp.int32))
                return a + _shift_lanes_zero(bacc, stride * b)

            acc = jax.lax.cond(lo < hi, work, lambda a: a, acc)
        # window lanes [px0, px0+16) -> lanes [0, 16)
        out_ref[0] = pltpu.roll(acc, -px0_ref[kk], axis=1)
    return kernel


def _local_prepare(table_k, px0, py0, hd):
    """Common gating: clamp window origins non-negative and bound rows to
    the plane (redirecting out-of-row features to the zero group).  Lane
    bounds need no table gating: the zero-filling bucket shift plus the
    zero padding from Wd to lane 128 give every window column its exact
    value — in-image reads score, out-of-image reads contribute 0, the
    reference's per-feature bounds discard (linemod.cpp:1257-1258)."""
    px0c = jnp.maximum(px0, 0)
    py0c = jnp.maximum(py0, 0)
    a = py0c[:, None] + table_k["ry"]             # (K, F) window start row
    ok = (a >= 0) & (a <= hd)
    return px0c, a, ok


@jax.custom_batching.sequential_vmap
def _local_scores_tpu(planes: jax.Array, table_k, px0, py0) -> jax.Array:
    # sequential_vmap: see _coarse_scores_tpu.
    c, hd, wd = planes.shape
    nb = table_k["bstart"].shape[1] - 1
    w16 = LOCAL_WINDOW
    lanes = _round_up(wd, 128)
    hpad = hd + w16
    d2, cq, stride = _stacked_planes(planes, hpad, lanes)

    px0c, a, ok = _local_prepare(table_k, px0, py0, hd)
    cc = table_k["c"]
    rx = table_k["rx"]
    rows = jnp.where(ok, (cc // 8) * hpad + a
                     + (rx % stride) * (cq * hpad), (cq - 1) * hpad)
    sh = jnp.where(ok, 4 * (cc % 8), 0).astype(jnp.int32)
    bstart = _bucket_starts(table_k["bstart"], stride)
    nb2 = bstart.shape[1] - 1
    k, f = rows.shape

    rblock = d2.shape[0] // (lanes // 128)
    out = pl.pallas_call(
        _local_kernel(nb2, f, stride, lanes, rblock),
        grid=(k,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w16, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, w16, lanes), jnp.int32),
    )(rows.astype(jnp.int32), sh, bstart.astype(jnp.int32),
      px0c.astype(jnp.int32), d2)
    return out[:, :, :w16]


def _local_scores_xla(planes: jax.Array, table_k, px0, py0) -> jax.Array:
    """Identical arithmetic via per-feature window slices.  Width-agnostic
    (any Wd): serves both as the CPU twin of the TPU kernel and as the
    TPU fallback for processing widths beyond the kernel's 128-lane
    contract."""
    c, hd, wd = planes.shape
    w16 = LOCAL_WINDOW
    nb = table_k["bstart"].shape[1] - 1
    # Zero-pad one redirect channel, w16 rows, and the widest window read
    # (bc <= px0c + nb - 1 with px0c <= wd): reads past the image score 0,
    # the per-feature bounds discard of similarityLocal.
    padded = jnp.pad(planes.astype(jnp.int32),
                     ((0, 1), (0, w16), (0, nb + w16)))
    px0c, a, ok = _local_prepare(table_k, px0, py0, hd)
    k, f = a.shape
    nvalid = table_k["bstart"][:, -1]
    live = jnp.arange(f)[None, :] < nvalid[:, None]
    cc = jnp.where(ok & live, table_k["c"], c)      # zero channel
    ac = jnp.where(ok & live, a, 0)
    bc = jnp.minimum(px0c[:, None] + table_k["rx"], wd)

    def step(acc, packed):
        ccol, acol, bcol = packed
        sl = jax.vmap(lambda c_, a_, b_: jax.lax.dynamic_slice(
            padded, (c_, a_, b_), (1, w16, w16))[0])(ccol, acol, bcol)
        return acc + sl, None

    acc, _ = jax.lax.scan(step, jnp.zeros((k, w16, w16), jnp.int32),
                          (cc.T, ac.T, bc.T))
    return acc


def local_scores(planes: jax.Array, table_k, px0, py0) -> jax.Array:
    """(K, 16, 16) i32 window scores around refinement candidates
    (``similarityLocal``, linemod.cpp:1226-1300).

    Args:
      planes: (C, Hd, Wd) u8 decimated response planes (all modalities).
        The Pallas kernel covers any width whose nibble-packed stack
        fits the VMEM budget (multi-128-lane tiles: level-0 640/T=5 is
        one tile, 1280/T=5 two); larger geometries fall back to the
        width-agnostic XLA scorer, mirroring the coarse scorer.
      table_k: per-candidate slot-gathered table arrays — ``c``/``ry``/
        ``rx`` (K, F) bucket-sorted features, ``bstart`` (K, NB+1).
      px0 / py0: (K,) i32 decimated window origins (may be negative only
        for degenerate clamps; clamped to 0 with the out-of-window
        features discarded).  The TPU kernel additionally requires
        px0 <= Wd - 16, which the detector's candidate clamp guarantees
        (linemod.cpp:1515-1534 semantics).
    """
    c, hd, wd = planes.shape
    nb = table_k["bstart"].shape[1] - 1
    fits = (_pack_planes_size(c, hd + LOCAL_WINDOW, _round_up(wd, 128))
            <= _VMEM_STACK_BUDGET)
    if jax.default_backend() == "tpu" and fits and nb < 128:
        return _local_scores_tpu(planes, table_k, px0, py0)
    return _local_scores_xla(planes, table_k, px0, py0)
