"""Sub-phase timings of the gather-free table build (pallas_merge
_dense_rows_group) on the real bench stream.

Phases are cumulative prefixes of the build: each adds one stage, so
stage cost = difference of consecutive rows.  Also times the candidate
row-summary (tfirst/tlast) replacement for the MXU histogram.
"""
import sys, pathlib, time, functools, os
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.native_resource import NativeLasData
from pcrhpg24_tpu.render.methods.huffman_tpu import (
    HuffmanTpu, render_chunk_native, SORT_ROWS,
)
from pcrhpg24_tpu.render.raster import swizzle_dims
import pcrhpg24_tpu.render.pallas_merge as pm
from pcrhpg24_tpu.render.camera import batch_translations

W, H = 1920, 1080
Debug.lod = 1.0
las = NativeLasData.create(os.environ.get("SCENE", "out/bench_64.tpc"))
r = Renderer(W, H)
r.apply_setting(Setting(yaw=0.5, pitch=-0.9, radius=2500.0,
                        target=(1000.0, 1000.0, 100.0)))
m = HuffmanTpu(r, las)
m.update(r)
las.wait_loaded(r)
r.controls_update()
wvp, lod_full = m.frame_setup(r)
scale = jnp.asarray(las.scale, jnp.float32)
offset_rel = jnp.asarray(las.offset - las.las_min, jnp.float32)
cam = r.camera
tb = jnp.asarray(batch_translations(
    (cam.proj() @ cam.view()), las.anchor_i[: las.dev["anchor"].shape[0]],
    las.scale, las.offset, las.las_min))
SWZ = swizzle_dims(W, H)[2]
pid, dep, pay = render_chunk_native(
    las.dev, 0, jnp.asarray(wvp), jnp.asarray(lod_full), scale, offset_rel,
    W, H, "color", fmt="fixed", tb=tb)
n = pid.shape[0] // SORT_ROWS
sp, sd, sy = [jax.block_until_ready(x) for x in jax.lax.sort(
    [pid.reshape(SORT_ROWS, n).astype(jnp.uint32), dep.reshape(SORT_ROWS, n),
     pay.reshape(SORT_ROWS, n)], num_keys=1, is_stable=False, dimension=1)]
print(f"rows={SORT_ROWS} n={n}", flush=True)

TILE, LANES, TPS, SUBS = pm.TILE, pm.LANES, pm.TPS, pm.SUBS
S = SORT_ROWS
ntiles = -(-SWZ // TILE)
nprog = -(-ntiles // TPS)
ntiles_pad = nprog * TPS
rowstride = n // LANES
wide = 2
F = int(np.ceil(np.sqrt(ntiles_pad + 1)))


def counts_mxu(a):
    tile = jnp.minimum(a >> 10, jnp.uint32(ntiles_pad)).astype(jnp.int32)
    hi = tile // F
    lo = tile - hi * F
    A = (hi[:, :, None] == jnp.arange(F, dtype=jnp.int32)).astype(
        jnp.bfloat16)
    Bm = (lo[:, :, None] == jnp.arange(F, dtype=jnp.int32)).astype(
        jnp.bfloat16)
    counts = jax.lax.dot_general(
        A, Bm, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32).reshape(S, F * F)[:, :ntiles_pad]
    return jnp.where(jnp.arange(ntiles_pad)[None, :] < ntiles, counts, 0)


def nwin_mxu(a):
    counts = counts_mxu(a)
    s1 = jnp.cumsum(counts, axis=1, dtype=jnp.int32)
    s0 = s1 - counts
    frl = s0 // LANES
    span = s1 - frl * LANES
    nwin = jnp.where(s1 > s0, (span + TILE - 1) // TILE, 0)
    fr = frl + (jnp.arange(S, dtype=jnp.int32) * rowstride)[:, None]
    return nwin, fr


def nwin_rowsum(a):
    """Row-summary build: per-128-entry-row first/last tile, tiny per-
    stream histograms over the R row summaries, suffix/prefix cumsum."""
    rows = a.reshape(S, rowstride, LANES)
    tf = jnp.minimum(rows[:, :, 0] >> 10, jnp.uint32(ntiles_pad)
                     ).astype(jnp.int32)   # (S, R) nondecreasing
    tl = jnp.minimum(rows[:, :, LANES - 1] >> 10, jnp.uint32(ntiles_pad)
                     ).astype(jnp.int32)
    Fb = F
    onehot = lambda v: (
        ((v // Fb)[:, :, None] == jnp.arange(Fb, dtype=jnp.int32)
         ).astype(jnp.bfloat16),
        ((v % Fb)[:, :, None] == jnp.arange(Fb, dtype=jnp.int32)
         ).astype(jnp.bfloat16),
    )
    def hist(v):
        A, Bm = onehot(v)
        h = jax.lax.dot_general(
            A, Bm, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32).reshape(S, Fb * Fb)
        return h[:, :ntiles_pad + 1]
    h_tl = hist(tl)   # (S, T+1) counts of rows with tlast == t
    h_tf = hist(tf)
    # rows with tlast >= t  ->  firstrow = R - that
    ge = jnp.cumsum(h_tl[:, ::-1], axis=1, dtype=jnp.int32)[:, ::-1]
    firstrow = rowstride - ge[:, :ntiles_pad]
    # rows with tfirst <= t  ->  lastrow = that - 1
    le = jnp.cumsum(h_tf, axis=1, dtype=jnp.int32)
    lastrow = le[:, :ntiles_pad] - 1
    present = lastrow >= firstrow
    nwin = jnp.where(present, (lastrow - firstrow + rowstride * 0 + SUBS)
                     // SUBS, 0)
    nwin = jnp.where(jnp.arange(ntiles_pad)[None, :] < ntiles, nwin, 0)
    fr = firstrow + (jnp.arange(S, dtype=jnp.int32) * rowstride)[:, None]
    return nwin, fr


def expand(nwin_fr):
    nwin, first_row = nwin_fr
    wmax = S * ntiles_pad + S * (n // TILE) + nprog * (wide - 1)
    M = ntiles_pad * S
    cnt = jnp.transpose(nwin).reshape(M)
    fr = jnp.transpose(first_row).reshape(M)
    psum = cnt.reshape(nprog, TPS * S).sum(axis=1)
    pad = (-psum) % wide
    cnt = cnt.reshape(nprog, TPS * S).at[:, -1].add(pad).reshape(M)
    cumc = jnp.cumsum(cnt, dtype=jnp.int32)
    ex = cumc - cnt
    gidx = jnp.arange(wmax, dtype=jnp.int32)
    m_iota = jnp.arange(M, dtype=jnp.int32)
    keys = jnp.concatenate([ex * 2, gidx * 2 + 1])
    mval = jnp.concatenate([m_iota, jnp.full(wmax, -1, jnp.int32)])
    fval = jnp.concatenate([
        (fr << 2) | (m_iota // S & (TPS - 1)), jnp.zeros(wmax, jnp.int32)])
    eval_ = jnp.concatenate([ex, jnp.zeros(wmax, jnp.int32)])
    kind = jnp.concatenate([jnp.full(M, wmax, jnp.int32), gidx])
    return keys, mval, fval, eval_, kind, gidx


def phase_counts(a):
    return counts_mxu(a)


def phase_nwin(a):
    return nwin_mxu(a)[0]


def phase_rowsum(a):
    return nwin_rowsum(a)[0]


def phase_expand_pre(a):
    return expand(nwin_mxu(a))[0]


def phase_sort1(a):
    keys, mval, fval, eval_, kind, gidx = expand(nwin_mxu(a))
    sk, sm, sf, se, skind = jax.lax.sort(
        [keys, mval, fval, eval_, kind], num_keys=1, is_stable=False)
    return sm


def phase_scan(a):
    keys, mval, fval, eval_, kind, gidx = expand(nwin_mxu(a))
    sk, sm, sf, se, skind = jax.lax.sort(
        [keys, mval, fval, eval_, kind], num_keys=1, is_stable=False)

    def fill(a2, b2):
        am, af, ae = a2
        bm, bf, be = b2
        take = bm >= am
        return (jnp.where(take, bm, am), jnp.where(take, bf, af),
                jnp.where(take, be, ae))

    fm, ff, fe = jax.lax.associative_scan(fill, (sm, sf, se))
    return fm


def phase_full(a):
    keys, mval, fval, eval_, kind, gidx = expand(nwin_mxu(a))
    sk, sm, sf, se, skind = jax.lax.sort(
        [keys, mval, fval, eval_, kind], num_keys=1, is_stable=False)

    def fill(a2, b2):
        am, af, ae = a2
        bm, bf, be = b2
        take = bm >= am
        return (jnp.where(take, bm, am), jnp.where(take, bf, af),
                jnp.where(take, be, ae))

    fm, ff, fe = jax.lax.associative_scan(fill, (sm, sf, se))
    _k2, wm, wf, we = jax.lax.sort(
        [skind, fm, ff, fe], num_keys=1, is_stable=False)
    wmax = S * ntiles_pad + S * (n // TILE) + nprog * (wide - 1)
    wm, wf, we = wm[:wmax], wf[:wmax], we[:wmax]
    k = gidx - we
    row = (wf >> 2) + k * SUBS
    send = (jax.lax.rem(wm, S) + 1) * rowstride
    row = jnp.minimum(jnp.maximum(row, 0), send - SUBS)
    return (row << 2) | (wf & 3)


def slope(make, label, k2=6):
    @functools.partial(jax.jit, static_argnames=("k",))
    def f(k):
        acc = jnp.uint32(0)
        a = sp
        for _ in range(k):
            out = make(a)
            probe = out.reshape(-1)[0].astype(jnp.uint32)
            acc += probe
            a = sp + jnp.where(probe == jnp.uint32(123456789), 1, 0).astype(
                jnp.uint32)
        return acc

    ts = {}
    for k in (1, k2):
        float(f(k))
        t0 = time.perf_counter()
        float(f(k))
        ts[k] = time.perf_counter() - t0
    ms = (ts[k2] - ts[1]) / (k2 - 1) * 1e3
    print(f"{label:24s} {ms:8.2f} ms", flush=True)


slope(phase_counts, "counts (MXU hist)")
slope(phase_nwin, "+ cumsum/nwin")
slope(phase_rowsum, "rowsum nwin (ALT)")
slope(phase_expand_pre, "+ expand pre")
slope(phase_sort1, "+ sort1")
slope(phase_scan, "+ scan")
slope(phase_full, "FULL build")
