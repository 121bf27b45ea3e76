"""Micro-lab for hot-kernel variants on the real chip.

Times isolated kernels with the chain-slope protocol (bench.py) so
design decisions are driven by measured cycles, not guesses:

  python benchmarks/kernel_lab.py coarse     # coarse-scorer variants
  python benchmarks/kernel_lab.py nn         # NN kernel variants

The "diagnostic" coarse variants (noshift / halftrip) intentionally
compute WRONG scores — they exist to attribute the per-feature cost
between the slice+add, the byte extract, and the loop overhead.
"""

import functools
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from fealess_tpu.ops import score_pallas  # noqa: E402

ITERS = 60


def slope(fn, *args):
    """ms per call via short/long on-device chains.

    The eval'd op must CONSUME the carry or XLA hoists it out of the
    loop (a constant-input top_k measured -0.01 ms): the first argument
    is perturbed by the carry each iteration (integer-valued perturb so
    integer-typed kernels stay exact)."""
    @jax.jit
    def chain(steps, args):
        def body(i, c):
            a0 = args[0] + jnp.asarray(c, args[0].dtype)
            out = fn(a0, *args[1:])
            leaf = jax.tree.leaves(out)[0]
            return c + (leaf.reshape(-1)[0] < -1).astype(jnp.int32)
        return jax.lax.fori_loop(0, steps, body, jnp.int32(0))

    def run(n):
        t0 = time.perf_counter()
        np.asarray(chain(n, args))
        return time.perf_counter() - t0

    run(2)
    ts = [run(n) for _ in range(2) for n in (2, 2 + ITERS)]
    return (min(ts[1::2]) - min(ts[0::2])) / ITERS * 1000.0


def _fixture_like(seed=0, n=1024, f=126, nb=13, hd=30, wd=40, c=1024,
                  even=False, valid_frac=1.0):
    rng = np.random.default_rng(seed)
    planes = rng.integers(0, 5, (c, hd, wd), np.uint8)
    # bucket-sorted tables: valid features first, grouped by rx
    nf = int(f * valid_frac)
    if even:
        counts = 2 * rng.integers(0, max(nf // (2 * nb), 1) + 1, (n, nb))
    else:
        counts = rng.integers(0, max(nf // nb, 1) + 1, (n, nb))
    counts = np.minimum(counts, f // nb)
    rx = np.zeros((n, f), np.int64)
    for i in range(n):
        vals = np.repeat(np.arange(nb), counts[i])[:f]
        rx[i, :len(vals)] = vals
    ry = rng.integers(0, nb, (n, f))
    cc = rng.integers(0, c, (n, f))
    bstart = np.concatenate([np.zeros((n, 1), np.int64),
                             np.cumsum(counts, axis=1)], axis=1)
    bstart = np.minimum(bstart, f)
    table = {"c": jnp.asarray(cc, jnp.int32),
             "ry": jnp.asarray(ry, jnp.int32),
             "rx": jnp.asarray(rx, jnp.int32),
             "bstart": jnp.asarray(bstart, jnp.int32)}
    return jnp.asarray(planes), table


# --- coarse variants -------------------------------------------------------

def _coarse_variant(hd, nb, f, mode):
    """mode: 'base' (current), 'noshift' (diagnostic: drop byte extract),
    'halftrip' (diagnostic: half the features), 'skipempty' (pl.when
    around empty buckets), 'unroll2' (two features per loop iteration —
    requires even bucket counts, see lab_coarse pad)."""
    bn = score_pallas._BN

    def kernel(rows_ref, sh_ref, bstart_ref, d_ref, out_ref):
        for t in range(bn):
            acc = jnp.zeros((hd, 128), jnp.int32)
            for b in range(nb):
                def inner(i, bacc):
                    slab = d_ref[pl.ds(rows_ref[t, i], hd), :]
                    if mode == "noshift":
                        return bacc + slab
                    return bacc + ((slab >> sh_ref[t, i]) & 255)

                def inner2(j, bacc):
                    i = 2 * j
                    s1 = d_ref[pl.ds(rows_ref[t, i], hd), :]
                    s2 = d_ref[pl.ds(rows_ref[t, i + 1], hd), :]
                    return (bacc + ((s1 >> sh_ref[t, i]) & 255)
                            + ((s2 >> sh_ref[t, i + 1]) & 255))

                lo = bstart_ref[t, b]
                hi = bstart_ref[t, b + 1]
                if mode == "halftrip":
                    hi = lo + (hi - lo) // 2
                if mode == "unroll2":
                    bacc = jax.lax.fori_loop(
                        lo // 2, hi // 2, inner2,
                        jnp.zeros((hd, 128), jnp.int32))
                    acc = acc + score_pallas._shift_lanes(bacc, b)
                elif mode == "skipempty":
                    acc = jax.lax.cond(
                        lo < hi,
                        lambda a: a + score_pallas._shift_lanes(
                            jax.lax.fori_loop(
                                lo, hi, inner,
                                jnp.zeros((hd, 128), jnp.int32)), b),
                        lambda a: a, acc)
                else:
                    bacc = jax.lax.fori_loop(
                        lo, hi, inner, jnp.zeros((hd, 128), jnp.int32))
                    acc = acc + score_pallas._shift_lanes(bacc, b)
            out_ref[t] = acc
    return kernel


def coarse_run(planes, table, mode):
    c, hd, wd = planes.shape
    nb = table["bstart"].shape[1] - 1
    hpad = hd + nb
    packed = score_pallas._pack_planes(planes, hpad)
    cq = packed.shape[0]
    d2 = packed.reshape(cq * hpad, 128)
    cc, ry = table["c"], table["ry"]
    rows = ((cc // 4) * hpad + ry).astype(jnp.int32)
    sh = (8 * (cc % 4)).astype(jnp.int32)
    bstart = table["bstart"]
    n, f = rows.shape
    bn = score_pallas._BN
    out = pl.pallas_call(
        _coarse_variant(hd, nb, f, mode),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, f), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bn, f), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bn, nb + 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, hd, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hd, 128), jnp.int32),
    )(rows, sh, bstart, d2)
    return out[:, :, :wd]


def _coarse_stride2_kernel(hd, nb2, skipempty):
    bn = score_pallas._BN

    def kernel(rows_ref, sh_ref, bstart_ref, d_ref, out_ref):
        for t in range(bn):
            acc = jnp.zeros((hd, 128), jnp.int32)
            for b in range(nb2):
                def inner(i, bacc):
                    slab = d_ref[pl.ds(rows_ref[t, i], hd), :]
                    return bacc + ((slab >> sh_ref[t, i]) & 255)

                lo = bstart_ref[t, b]
                hi = bstart_ref[t, b + 1]

                def work(a):
                    bacc = jax.lax.fori_loop(
                        lo, hi, inner, jnp.zeros((hd, 128), jnp.int32))
                    return a + score_pallas._shift_lanes(bacc, 2 * b)

                if skipempty:
                    acc = jax.lax.cond(lo < hi, work, lambda a: a, acc)
                else:
                    acc = work(acc)
            out_ref[t] = acc
    return kernel


def coarse_run_stride2(planes, table, skipempty=True):
    """Stride-2 buckets: d holds the packed planes AND a one-lane
    pre-shifted copy; odd-rx features read the shifted copy, so buckets
    cover two rx cells and the per-bucket epilogue count halves."""
    c, hd, wd = planes.shape
    nb = table["bstart"].shape[1] - 1
    hpad = hd + nb
    packed = score_pallas._pack_planes(planes, hpad)
    cq = packed.shape[0]
    shifted = jnp.concatenate(
        [packed[:, :, 1:], jnp.zeros_like(packed[:, :, :1])], axis=2)
    d2 = jnp.concatenate([packed, shifted]).reshape(2 * cq * hpad, 128)

    cc, ry, rx = table["c"], table["ry"], table["rx"]
    rows = ((cc // 4) * hpad + ry
            + (rx % 2) * (cq * hpad)).astype(jnp.int32)
    sh = (8 * (cc % 4)).astype(jnp.int32)
    # re-bucket by rx//2: recompute bstart for stride-2 keys.  The lab
    # tables are rx-sorted, so rx//2 is also sorted: counts via searchsorted.
    n, f = rows.shape
    nb2 = -(-nb // 2)
    fid = jnp.arange(f)[None, :]
    nvalid = table["bstart"][:, -1][:, None]
    key = jnp.where(fid < nvalid, rx // 2, nb2)
    counts = jnp.sum(key[:, None, :] == jnp.arange(nb2)[None, :, None],
                     axis=2)
    bstart = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32),
         jnp.cumsum(counts, axis=1, dtype=jnp.int32)], axis=1)

    bn = score_pallas._BN
    out = pl.pallas_call(
        _coarse_stride2_kernel(hd, nb2, skipempty),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, f), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bn, f), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bn, nb2 + 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, hd, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hd, 128), jnp.int32),
    )(rows, sh, bstart, d2)
    return out[:, :, :wd]


def lab_coarse():
    # even bucket counts + ~50% validity: the fixture operating point
    # (and the layout the unroll2 variant needs); identical tables for
    # every mode so times are comparable.
    planes, table = _fixture_like(even=True, valid_frac=0.5)
    n, f = table["c"].shape
    nf_total = int(np.asarray(table["bstart"])[:, -1].sum())
    ref = None
    for mode in ("base", "noshift", "halftrip", "skipempty", "unroll2"):
        ms = slope(functools.partial(coarse_run, mode=mode), planes, table)
        cyc = ms * 1e-3 * 940e6 / max(nf_total, 1)
        print(f"coarse/{mode:10s} {ms:7.3f} ms  "
              f"(~{cyc:5.1f} cyc/feature over {nf_total} features)",
              flush=True)
        if mode in ("base", "skipempty", "unroll2"):
            out = np.asarray(coarse_run(planes, table, mode))
            if ref is None:
                ref = out
            else:
                assert np.array_equal(out, ref), mode

    for skipempty in (False, True):
        ms = slope(functools.partial(coarse_run_stride2,
                                     skipempty=skipempty), planes, table)
        print(f"coarse/stride2-se{int(skipempty)} {ms:7.3f} ms", flush=True)
        assert np.array_equal(
            np.asarray(coarse_run_stride2(planes, table, skipempty)), ref)


# --- top-k variants --------------------------------------------------------

def _topk_flat(flat, k):
    return jax.lax.top_k(flat, k)


def _topk_two_level(flat, k, rows):
    """Exact global top-k via per-row top-k + merge.  flat must reshape
    to (rows, cols) in index order; global tie-break (score desc, index
    asc) is preserved: within a row per-row top_k ties by column, the
    merged array is (row, rank) ordered which is index order for ties."""
    cols = flat.shape[0] // rows
    kk = min(k, cols)
    s2, i2 = jax.lax.top_k(flat.reshape(rows, cols), kk)
    gidx = (jnp.arange(rows, dtype=jnp.int32)[:, None] * cols
            + i2.astype(jnp.int32))
    s, im = jax.lax.top_k(s2.reshape(-1), k)
    return s, gidx.reshape(-1)[im]


def lab_topk():
    rng = np.random.default_rng(0)
    n, hd, wd, k = 1024, 30, 40, 64
    flat = jnp.asarray(
        rng.normal(size=(n * hd * wd,)).astype(np.float32))
    # make it realistic: most entries -inf (below threshold)
    mask = rng.random(n * hd * wd) < 0.02
    flat = jnp.where(jnp.asarray(mask), flat + 100.0, -jnp.inf)

    ms = slope(functools.partial(_topk_flat, k=k), flat)
    print(f"topk/flat-1.2M    {ms:7.3f} ms", flush=True)
    for rows in (n, n * hd):
        fn = functools.partial(_topk_two_level, k=k, rows=rows)
        ms = slope(fn, flat)
        print(f"topk/2level-r{rows:<5d} {ms:7.3f} ms", flush=True)
        s0, i0 = _topk_flat(flat, k)
        s1, i1 = fn(flat)
        assert np.array_equal(np.asarray(s0), np.asarray(s1))
        assert np.array_equal(np.asarray(i0), np.asarray(i1)), rows


# --- front-end (planes) variants ------------------------------------------

def _build_level_2d_dtype(quantized, t, work_dtype):
    """ops.response.build_level_2d with an explicit working dtype, to
    attribute the XLA front-end cost between the math and u8 relayouts."""
    from fealess_tpu.ops import response as R

    h, w = quantized.shape
    hd, wd = h // t, w // t
    q = quantized.astype(work_dtype)
    q_dec = R.decimate_quant(q, t).reshape(t, t, hd, wd)
    sd = R.spread_decimated(q_dec, t).reshape(t * t, hd, wd)
    b = sd.astype(jnp.int32)

    def rot(x, k):
        return ((x << k) | (x >> (8 - k))) & 0xFF

    m1 = rot(b, 1) | rot(b, 7)
    m2 = m1 | rot(b, 2) | rot(b, 6)
    from fealess_tpu.ops.luts import ORIENTATION_SCORES
    s4, s2, s1 = (ORIENTATION_SCORES[0], ORIENTATION_SCORES[1],
                  ORIENTATION_SCORES[2])
    maps = []
    for ori in range(8):
        resp = jnp.where(
            ((b >> ori) & 1) == 1, s4,
            jnp.where(((m1 >> ori) & 1) == 1, s2,
                      jnp.where(((m2 >> ori) & 1) == 1, s1, 0)))
        maps.append(resp)
    r = jnp.stack(maps).astype(work_dtype)
    return r.reshape(8 * t * t, hd, wd)


def lab_frontend():
    from fealess_tpu.ops import response as R

    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.integers(0, 256, (480, 640), np.uint8))
    q1 = jnp.asarray(rng.integers(0, 256, (240, 320), np.uint8))

    def current(a, b):
        return (R.build_level_2d(a, 5).astype(jnp.int32).sum()
                + R.build_level_2d(b, 8).astype(jnp.int32).sum())

    ms = slope(current, q0, q1)
    print(f"front/current-u8   {ms:7.3f} ms (both levels, one modality)",
          flush=True)

    for dt, name in ((jnp.int32, "i32"), (jnp.uint8, "u8copy")):
        def variant(a, b, dt=dt):
            return (_build_level_2d_dtype(a, 5, dt).astype(jnp.int32).sum()
                    + _build_level_2d_dtype(b, 8, dt).astype(jnp.int32).sum())
        ms = slope(variant, q0, q1)
        print(f"front/{name:10s}  {ms:7.3f} ms", flush=True)


# --- local-refine tail: per-candidate table gather + local kernel ----------

def _gather_fancy(tables, tslot):
    return {k: tables[k][tslot] for k in tables}


def _gather_onehot(tables, tslot):
    """One-hot matmul gather on the MXU: exact for i32 values < 2^24
    under HIGHEST precision (max table value here is a packed row index
    ~1e4)."""
    n = tables["c"].shape[0]
    oh = jax.nn.one_hot(tslot, n, dtype=jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    return {k: jnp.round(jnp.matmul(
        oh, tables[k].astype(jnp.float32), precision=hi)).astype(jnp.int32)
        for k in tables}


def lab_local():
    rng = np.random.default_rng(1)
    hd, wd = 96, 128
    c = 400
    planes, table = _fixture_like(seed=1, n=1024, f=126, nb=7,
                                  hd=hd, wd=wd, c=c)
    k = 64
    tslot = jnp.asarray(rng.integers(0, 1024, (k,)), jnp.int32)
    px0 = jnp.asarray(rng.integers(0, wd - 16, (k,)), jnp.int32)
    py0 = jnp.asarray(rng.integers(0, hd - 16, (k,)), jnp.int32)

    def tail(planes_in, gather):
        tk = gather(table, tslot)
        return score_pallas.local_scores(planes_in, tk, px0, py0)

    for name, g in (("fancy", _gather_fancy), ("onehot", _gather_onehot)):
        ms = slope(functools.partial(tail, gather=g), planes)
        print(f"local/gather-{name:7s} {ms:7.3f} ms "
              f"(64 cand, 126 feat)", flush=True)
    a = jax.tree.map(np.asarray, _gather_fancy(table, tslot))
    b = jax.tree.map(np.asarray, _gather_onehot(table, tslot))
    for key in a:
        assert np.array_equal(a[key], b[key]), key

    # kernel alone, tables pregathered
    tk = _gather_fancy(table, tslot)
    ms = slope(lambda p: score_pallas.local_scores(p, tk, px0, py0), planes)
    print(f"local/kernel-only   {ms:7.3f} ms", flush=True)


# --- local kernel variants at the production operating point ---------------

def _local_variant_run(planes, table_k, px0, py0, stride, use_cond):
    """Replica of _local_scores_tpu with (stride, cond) knobs."""
    c, hd, wd = planes.shape
    nb = table_k["bstart"].shape[1] - 1
    w16 = score_pallas.LOCAL_WINDOW
    hpad = hd + w16
    packed = score_pallas._pack_planes(planes, hpad)
    cq = packed.shape[0]
    if stride == 2:
        shifted = jnp.concatenate(
            [packed[:, :, 1:], jnp.zeros_like(packed[:, :, :1])], axis=2)
        d2 = jnp.concatenate([packed, shifted]).reshape(2 * cq * hpad, 128)
    else:
        d2 = packed.reshape(cq * hpad, 128)

    px0c, a, ok = score_pallas._local_prepare(table_k, px0, py0, hd)
    cc = table_k["c"]
    rx = table_k["rx"]
    rows = jnp.where(ok, (cc // 4) * hpad + a
                     + (rx % stride) * (cq * hpad), (cq - 1) * hpad)
    sh = jnp.where(ok, 8 * (cc % 4), 0).astype(jnp.int32)
    bstart = score_pallas._bucket_starts(table_k["bstart"], stride)
    nb2 = bstart.shape[1] - 1
    k, f = rows.shape

    def kernel(rows_ref, sh_ref, bstart_ref, px0_ref, d_ref, out_ref):
        kk = pl.program_id(0)
        acc = jnp.zeros((w16, 128), jnp.int32)
        for b in range(nb2):
            lo = bstart_ref[kk, b]
            hi = bstart_ref[kk, b + 1]

            def inner(i, bacc):
                slab = d_ref[pl.ds(rows_ref[kk, i], w16), :]
                return bacc + ((slab >> sh_ref[kk, i]) & 255)

            def work(acc_, lo=lo, hi=hi, b=b):
                bacc = jax.lax.fori_loop(
                    lo, hi, inner, jnp.zeros((w16, 128), jnp.int32))
                return acc_ + score_pallas._shift_lanes_zero(
                    bacc, stride * b)

            if use_cond:
                acc = jax.lax.cond(lo < hi, work, lambda z: z, acc)
            else:
                acc = work(acc)
        out_ref[0] = pltpu.roll(acc, -px0_ref[kk], axis=1)

    out = pl.pallas_call(
        kernel,
        grid=(k,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, w16, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, w16, 128), jnp.int32),
    )(rows.astype(jnp.int32), sh, bstart.astype(jnp.int32),
      px0c.astype(jnp.int32), d2)
    return out[:, :, :w16]


def lab_local2():
    """Local kernel at the PRODUCTION fixture operating point: nb=39
    buckets (192-px template span at level 0), k=64 candidates."""
    rng = np.random.default_rng(1)
    hd, wd = 96, 128
    planes, table = _fixture_like(seed=1, n=1024, f=126, nb=39,
                                  hd=hd, wd=wd, c=400, valid_frac=0.5)
    k = 64
    tslot = jnp.asarray(rng.integers(0, 1024, (k,)), jnp.int32)
    table_k = {key: table[key][tslot] for key in table}
    px0 = jnp.asarray(rng.integers(0, wd - 16, (k,)), jnp.int32)
    py0 = jnp.asarray(rng.integers(0, hd - 16, (k,)), jnp.int32)

    ref = None
    for stride, use_cond in ((1, False), (1, True), (2, False), (2, True)):
        fn = functools.partial(_local_variant_run, table_k=table_k,
                               px0=px0, py0=py0, stride=stride,
                               use_cond=use_cond)
        ms = slope(fn, planes)
        print(f"local2/s{stride}-cond{int(use_cond)}   {ms:7.3f} ms "
              f"(nb=39, k=64)", flush=True)
        out = np.asarray(fn(planes))
        if ref is None:
            ref = out
        else:
            assert np.array_equal(out, ref), (stride, use_cond)


def lab_local3():
    """Same kernel, but planes produced by the REAL front-end inside the
    same jit (layout interaction test): build_level_2d x2 modalities."""
    from fealess_tpu.ops import response as R

    rng = np.random.default_rng(1)
    hd, wd = 96, 128
    img0 = jnp.asarray(rng.integers(0, 256, (480, 640), np.uint8))
    img1 = jnp.asarray(rng.integers(0, 256, (480, 640), np.uint8))
    _, table = _fixture_like(seed=1, n=1024, f=126, nb=39,
                             hd=hd, wd=wd, c=400, valid_frac=0.5)
    k = 64
    tslot = jnp.asarray(rng.integers(0, 1024, (k,)), jnp.int32)
    table_k = {key: table[key][tslot] for key in table}
    px0 = jnp.asarray(rng.integers(0, wd - 16, (k,)), jnp.int32)
    py0 = jnp.asarray(rng.integers(0, hd - 16, (k,)), jnp.int32)

    def with_front(i0, i1):
        planes = jnp.concatenate([R.build_level_2d(i0, 5),
                                  R.build_level_2d(i1, 5)], axis=0)
        return score_pallas.local_scores(planes, table_k, px0, py0)

    ms = slope(with_front, img0, img1)
    print(f"local3/front+kernel {ms:7.3f} ms (nb=39, k=64)", flush=True)

    def with_front_barrier(i0, i1):
        planes = jnp.concatenate([R.build_level_2d(i0, 5),
                                  R.build_level_2d(i1, 5)], axis=0)
        planes = jax.lax.optimization_barrier(planes)
        return score_pallas.local_scores(planes, table_k, px0, py0)

    ms = slope(with_front_barrier, img0, img1)
    print(f"local3/front+BARRIER+kernel {ms:7.3f} ms", flush=True)

    def with_front_copy(i0, i1):
        planes = jnp.concatenate([R.build_level_2d(i0, 5),
                                  R.build_level_2d(i1, 5)], axis=0)
        planes = planes + jnp.int32(0)
        planes = jax.lax.optimization_barrier(planes)
        return score_pallas.local_scores(planes, table_k, px0, py0)

    ms = slope(with_front_copy, img0, img1)
    print(f"local3/front+COPY+kernel    {ms:7.3f} ms", flush=True)

    def build_level_2d_slices(quantized, t):
        """build_level_2d with the decimation as strided slices (no 4D
        transpose)."""
        from fealess_tpu.ops.luts import ORIENTATION_SCORES
        h, w = quantized.shape
        q = quantized.astype(jnp.int32)
        sub = jnp.stack([q[a::t, b::t] for a in range(t)
                         for b in range(t)])
        b_ = R.spread_decimated(
            sub.reshape(t, t, h // t, w // t), t).reshape(
                t * t, h // t, w // t)

        def rot(x, k_):
            return ((x << k_) | (x >> (8 - k_))) & 0xFF

        m1 = rot(b_, 1) | rot(b_, 7)
        m2 = m1 | rot(b_, 2) | rot(b_, 6)
        s4, s2, s1 = (ORIENTATION_SCORES[0], ORIENTATION_SCORES[1],
                      ORIENTATION_SCORES[2])
        maps = [jnp.where(((b_ >> o) & 1) == 1, s4,
                          jnp.where(((m1 >> o) & 1) == 1, s2,
                                    jnp.where(((m2 >> o) & 1) == 1, s1,
                                              0)))
                for o in range(8)]
        return jnp.stack(maps).reshape(8 * t * t, h // t, w // t)

    def with_front_slices(i0, i1):
        planes = jnp.concatenate([build_level_2d_slices(i0, 5),
                                  build_level_2d_slices(i1, 5)], axis=0)
        return score_pallas.local_scores(planes, table_k, px0, py0)

    ms = slope(with_front_slices, img0, img1)
    print(f"local3/front-slices+kernel  {ms:7.3f} ms", flush=True)
    a = np.asarray(with_front(img0, img1))
    b2 = np.asarray(with_front_slices(img0, img1))
    assert np.array_equal(a, b2)

    def build_level_2d_mxu(quantized, t):
        """Full-res spread+response (elementwise), then decimation as
        0/1-selection matmuls on the MXU (bf16-exact: each output is one
        resp value 0..4), assembled from tile-aligned slices."""
        from fealess_tpu.ops.luts import ORIENTATION_SCORES
        h, w = quantized.shape
        hd, wd = h // t, w // t
        q = quantized.astype(jnp.int32)
        sp = R.spread(q, t)
        b_ = sp.astype(jnp.int32)

        def rot(x, k_):
            return ((x << k_) | (x >> (8 - k_))) & 0xFF

        m1 = rot(b_, 1) | rot(b_, 7)
        m2 = m1 | rot(b_, 2) | rot(b_, 6)
        s4, s2, s1 = (ORIENTATION_SCORES[0], ORIENTATION_SCORES[1],
                      ORIENTATION_SCORES[2])
        resp = jnp.stack(
            [jnp.where(((b_ >> o) & 1) == 1, s4,
                       jnp.where(((m1 >> o) & 1) == 1, s2,
                                 jnp.where(((m2 >> o) & 1) == 1, s1, 0)))
             for o in range(8)])                        # (8, h, w)

        L = 128 * (-(-wd // 128))
        M = 8 * (-(-hd // 8))
        xs = np.arange(w)
        pm = np.zeros((w, t * L), np.float32)
        pm[xs, (xs % t) * L + xs // t] = 1.0
        ys = np.arange(h)
        qm = np.zeros((h, t * M), np.float32)
        qm[ys, (ys % t) * M + ys // t] = 1.0
        rb = resp.astype(jnp.bfloat16)
        dl = jnp.matmul(rb.reshape(8 * h, w), jnp.asarray(pm, jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        dl = dl.reshape(8, h, t * L)
        e = jnp.einsum("ym,lyx->lmx", jnp.asarray(qm, jnp.bfloat16),
                       dl.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        e = e.astype(jnp.int32)                         # (8, t*M, t*L)
        blocks = [e[:, a * M:a * M + hd, bb * L:bb * L + wd]
                  for a in range(t) for bb in range(t)]
        return jnp.stack(blocks, axis=1).reshape(8 * t * t, hd, wd)

    def with_front_mxu(i0, i1):
        planes = jnp.concatenate([build_level_2d_mxu(i0, 5),
                                  build_level_2d_mxu(i1, 5)], axis=0)
        return score_pallas.local_scores(planes, table_k, px0, py0)

    ms = slope(with_front_mxu, img0, img1)
    print(f"local3/front-MXU+kernel     {ms:7.3f} ms", flush=True)
    b3 = np.asarray(with_front_mxu(img0, img1))
    assert np.array_equal(a, b3), "mxu decimation mismatch"

    def front_only(i0, i1):
        planes = jnp.concatenate([R.build_level_2d(i0, 5),
                                  R.build_level_2d(i1, 5)], axis=0)
        return planes.sum()[None]

    ms = slope(front_only, img0, img1)
    print(f"local3/front-only   {ms:7.3f} ms", flush=True)

    def front_coarse(i0, i1):
        planes = jnp.concatenate([R.build_level_2d(i0, 5),
                                  R.build_level_2d(i1, 5)], axis=0)
        hpad = planes.shape[1] + 16
        d2, cq, stride = score_pallas._stacked_planes(planes, hpad)
        return d2.sum()[None]

    ms = slope(front_coarse, img0, img1)
    print(f"local3/front+pack   {ms:7.3f} ms", flush=True)


# --- NN variants -----------------------------------------------------------

def _nn_mxu_kernel(q_ref, r_ref, rn_ref, out_d2, out_idx):
    j = pl.program_id(1)
    tq = q_ref.shape[0]
    tr = r_ref.shape[1]
    dot = jax.lax.dot_general(
        q_ref[:], r_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # (TQ, TR) on MXU
    qn = jnp.sum(q_ref[:] * q_ref[:], axis=1, keepdims=True)
    d2 = qn + rn_ref[:] - 2.0 * dot
    local_min = jnp.min(d2, axis=1, keepdims=True)
    local_arg = (jnp.argmin(d2, axis=1).astype(jnp.int32)[:, None]
                 + j * tr)

    @pl.when(j == 0)
    def _():
        out_d2[:] = local_min
        out_idx[:] = local_arg

    @pl.when(j > 0)
    def _():
        better = local_min < out_d2[:]
        out_d2[:] = jnp.where(better, local_min, out_d2[:])
        out_idx[:] = jnp.where(better, local_arg, out_idx[:])


def nn_mxu(query, ref, tq=256, tr=2048):
    nq, nr = query.shape[0], ref.shape[0]
    nq_pad = -(-nq // tq) * tq
    nr_pad = -(-nr // tr) * tr
    big = jnp.float32(3.0e9)
    qp = jnp.pad(query.astype(jnp.float32), ((0, nq_pad - nq), (0, 0)),
                 constant_values=-big)
    rp = jnp.pad(ref.astype(jnp.float32), ((0, nr_pad - nr), (0, 0)),
                 constant_values=big)
    rt = rp.T                                  # (3, Nr)
    rn = jnp.sum(rp * rp, axis=1).reshape(1, -1)
    grid = (nq_pad // tq, nr_pad // tr)
    d2, idx = pl.pallas_call(
        _nn_mxu_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tr), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((tq, 1), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tq, 1), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((nq_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((nq_pad, 1), jnp.int32)),
    )(qp, rt, rn)
    return idx[:nq, 0], d2[:nq, 0]


def lab_nn():
    from fealess_tpu.ops import nn_pallas

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(16384, 3)).astype(np.float32) * 100)
    r = jnp.asarray(rng.normal(size=(16384, 3)).astype(np.float32) * 100)
    ms = slope(nn_pallas.nearest_neighbor_tiled, q, r)
    print(f"nn/tiled-vpu      {ms:7.3f} ms  (16384x16384)", flush=True)
    try:
        ms = slope(nn_mxu, q, r)
        print(f"nn/mxu-dot        {ms:7.3f} ms", flush=True)
        i0, d0 = (np.asarray(v) for v in
                  nn_pallas.nearest_neighbor_tiled(q, r))
        i1, d1 = (np.asarray(v) for v in nn_mxu(q, r))
        same = i0 == i1
        tie = np.abs(d1 - d0) <= 1e-3 * np.maximum(d0, 1)
        print(f"nn/mxu idx_equal={same.sum()}/{same.size} "
              f"all_ok={bool(np.all(same | tie))} "
              f"max_rel={float(np.max(np.abs(d1-d0)/np.maximum(d0,1))):.2e}",
              flush=True)
    except Exception as e:
        print("nn/mxu FAILED:", type(e).__name__, str(e)[:300], flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "coarse"
    if which == "coarse":
        lab_coarse()
    elif which == "nn":
        lab_nn()
    elif which == "topk":
        lab_topk()
    elif which == "frontend":
        lab_frontend()
    elif which == "local":
        lab_local()
    elif which == "local2":
        lab_local2()
    elif which == "local3":
        lab_local3()
