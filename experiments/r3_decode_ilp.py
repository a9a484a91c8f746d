"""Decode-kernel ILP: strength-reduced step state + unroll.

The fbatch decode kernel measures 1.02 ms at 4.2M (4.1 Gpts/s) but its
~90 vreg-ops/step x 64 steps would take ~0.4 ms at VPU throughput —
it is latency-bound on the loop-carried chain (bits -> cnt -> rank ->
gather -> window regs).  With FIXED widths, bits/ve/bp/cnt/rank are
all closed-form in the step index i: bits = i*Wb, F(i) = (i*Wb+31)>>5,
ve = F(i) - (i*Wb>>5), cnt = F(i+1)-F(i), and all 64 ranks come from
ONE batched MXU prefix matmul before the loop.  The only true carries
left are the 4 window registers and the coordinate prefix sums.
Variants (all verified bit-exact vs the production kernel):

  v1        production kernel (baseline)
  v1uN      production kernel, fori_loop unroll=N
  v2uN      strength-reduced + precomputed ranks, unroll=N
"""
import sys, pathlib, functools, os
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pcrhpg24_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcrhpg24_tpu.engine.debug import Debug
from pcrhpg24_tpu.engine.renderer import Renderer, Setting
from pcrhpg24_tpu.engine.native_resource import NativeLasData
from pcrhpg24_tpu.render.pallas_decode_fixed import (
    _mk_lt, decode_fixed_batches, G, LANES, P,
)
from pcrhpg24_tpu.utils.devtime import device_ms

_U, _I = jnp.uint32, jnp.int32
K = 10
Debug.lod = 1.0
las = NativeLasData.create(os.environ.get("SCENE", "out/bench_64.tpc"))
r = Renderer(64, 64)
las.process(r)
las.wait_loaded(r)
dev = las.dev
widths, streams, ptrs, starts = (dev["widths"], dev["streams"],
                                 dev["ptrs"], dev["starts"])
B = streams.shape[0]
maxt = streams.shape[1]
print("batches", B, "maxt", maxt, flush=True)

ref = jax.block_until_ready(decode_fixed_batches(widths, streams, ptrs, starts))
ref_np = np.asarray(ref[:4])  # spot-compare 4 batches (full-equal on dev)


def _kernel_v2(ptr_ref, width_ref, stream_ref, start_ref, out_ref,
               rank_ref, *, points: int, unroll: int):
    lt = _mk_lt()
    wx = width_ref[0, 0]
    wy = width_ref[0, 1]
    wz = width_ref[0, 2]
    Wb = wx + wy + wz

    # all ranks in one batched MXU prefix matmul (cnt_i closed-form)
    iP = jax.lax.broadcasted_iota(_I, (points, G, LANES), 0)
    Wb3 = Wb[None]
    F0 = (iP * Wb3 + 31) >> 5
    F1 = ((iP + 1) * Wb3 + 31) >> 5
    cnts = F1 - F0
    ranks = jax.lax.dot_general(
        cnts.astype(jnp.bfloat16), lt, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(_I)
    rank_ref[...] = ranks

    def sel4(k, a, b, c, d):
        lo = jnp.where(k == 0, a, b)
        hi = jnp.where(k == 2, c, d)
        return jnp.where(k < 2, lo, hi)

    def extract(win, off, w):
        w0, w1, w2, w3 = win
        word = off >> 5
        sh = (off & 31).astype(_U)
        lo = sel4(word, w0, w1, w2, w2)
        hi = sel4(word, w1, w2, w3, w3)
        top = (lo << sh) | ((hi >> _U(1)) >> (_U(31) - sh))
        v = top >> ((_I(32) - w) & 31).astype(_U)
        return jnp.where(w > 0, v, _U(0))

    def point_step(i, carry):
        w0, w1, w2, w3, px, py, pz = carry
        bits = i * Wb
        bp = bits & 31
        Fi = (bits + 31) >> 5
        ve = Fi - (bits >> 5)
        cnt = ((bits + Wb + 31) >> 5) - Fi
        rank = rank_ref[i]
        ptr = ptr_ref[0, 0, i]
        tbase = ptr >> 7
        off = ptr - tbase * LANES
        tiles = [stream_ref[0, tbase + k] for k in range(4)]
        idx0 = off + rank
        for j in range(3):
            idx = idx0 + j
            tile = idx >> 7
            pos = idx & (LANES - 1)
            cands = [jnp.take_along_axis(t, pos, axis=1) for t in tiles]
            vj = sel4(tile, *cands)
            take = cnt > j
            slot = ve + j
            w0 = jnp.where(take & (slot == 0), vj, w0)
            w1 = jnp.where(take & (slot == 1), vj, w1)
            w2 = jnp.where(take & (slot == 2), vj, w2)
            w3 = jnp.where(take & (slot == 3), vj, w3)
        win = (w0, w1, w2, w3)
        zx = extract(win, bp, wx)
        zy = extract(win, bp + wx, wy)
        zz = extract(win, bp + wx + wy, wz)
        dx = (zx >> _U(1)).astype(_I) ^ -(zx & _U(1)).astype(_I)
        dy = (zy >> _U(1)).astype(_I) ^ -(zy & _U(1)).astype(_I)
        dz = (zz >> _U(1)).astype(_I) ^ -(zz & _U(1)).astype(_I)
        px = px + dx
        py = py + dy
        pz = pz + dz
        out_ref[0, i, 0] = px
        out_ref[0, i, 1] = py
        out_ref[0, i, 2] = pz
        k = ((bp + Wb) >> 5)
        w0n = sel4(k, w0, w1, w2, w3)
        w1n = sel4(k, w1, w2, w3, w3)
        w2n = jnp.where(k == 0, w2, w3)
        return w0n, w1n, w2n, w3, px, py, pz

    zero = jnp.zeros((G, LANES), _I)
    zu = jnp.zeros((G, LANES), _U)
    init = (zu, zu, zu, zu,
            start_ref[0, 0], start_ref[0, 1], start_ref[0, 2])
    jax.lax.fori_loop(0, points, point_step, init, unroll=unroll)


@functools.partial(jax.jit, static_argnames=("unroll",))
def decode_v2(widths, streams, ptrs, starts, unroll: int = 1):
    B = streams.shape[0]
    maxt = streams.shape[1]
    return pl.pallas_call(
        functools.partial(_kernel_v2, points=P, unroll=unroll),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, P), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, G, LANES), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, maxt, G, LANES), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, 3, G, LANES), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, P, 3, G, LANES), lambda b: (b, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, P, 3, G, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((P, G, LANES), jnp.int32)],
    )(ptrs, widths, streams, starts)


def sample(x):
    f = x.reshape(-1)
    return jnp.bitwise_xor.reduce(
        f[:: max(1, f.shape[0] // 4096)].astype(jnp.uint32))


def bench(fn, label, check=True):
    @jax.jit
    def chain():
        acc = jnp.uint32(0)
        for _ in range(K):
            p2 = ptrs + (acc & jnp.uint32(1)).astype(jnp.int32)
            acc = acc ^ sample(fn(widths, streams, p2, starts))
        return acc

    jax.block_until_ready(chain())
    ms = device_ms(chain, key="jit_chain") / K
    tag = ""
    if check:
        got = np.asarray(fn(widths, streams, ptrs, starts)[:4])
        tag = f"  exact={np.array_equal(got, ref_np)}"
    print(f"{label:12s} {ms:7.2f} ms{tag}", flush=True)


bench(lambda *a: decode_fixed_batches(*a), "v1", check=False)
bench(lambda *a: decode_v2(*a, unroll=1), "v2u1")
# pallas fori_loop only supports unroll=1 or full unroll
bench(lambda *a: decode_v2(*a, unroll=P), "v2full")
