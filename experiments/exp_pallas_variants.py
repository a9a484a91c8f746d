"""Bisect the tbatch decode kernel cost: which stage dominates?"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, LANES, MAXL, PPT = 8, 128, 12, 64
_U, _I = jnp.uint32, jnp.int32


def mk_kernel(variant):
    def kern(lj_ref, stream_ref, ptr_ref, dD_ref, lut_ref, start_ref, out_ref):
        r_ = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        c_ = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        lt = (r_ < c_).astype(jnp.bfloat16)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (G, LANES), 1)
        dD_row = jnp.broadcast_to(dD_ref[0, 0].reshape(1, LANES), (G, LANES))
        lut_row = jnp.broadcast_to(lut_ref[0, 0].reshape(1, LANES), (G, LANES))
        cur0 = stream_ref[0, :, 0:LANES]
        nxt0 = stream_ref[0, :, LANES:2 * LANES]

        def window_hi(cur, nxt, bitpos):
            hi = cur << bitpos.astype(_U)
            lo = nxt >> jnp.minimum(32 - bitpos, 31).astype(_U)
            return hi | jnp.where(bitpos > 0, lo, _U(0))

        def rank_of(need):
            if variant.get("rank") == "roll":
                x = need.astype(_I)
                acc = jnp.zeros_like(x)
                y = x
                for k in (1, 2, 4, 8, 16, 32, 64):
                    y2 = pltpu.roll(y, k, 1)
                    y2 = jnp.where(lane_iota >= k, y2, 0)
                    y = y + y2
                # inclusive prefix; exclusive = inclusive - need
                return y - x
            return jax.lax.dot_general(
                need.astype(jnp.bfloat16), lt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(_I)

        def refill(t, cur, nxt, bitpos):
            need = bitpos >= 32
            bitpos = jnp.where(need, bitpos - 32, bitpos)
            if variant.get("no_refill"):
                return cur, nxt, bitpos
            rank = rank_of(need)
            if variant.get("no_window"):
                refill_val = rank.astype(_U)
            else:
                w0_rows, w1_rows, off_rows = [], [], []
                for r in range(G):
                    ptr = ptr_ref[0, t, r]
                    base = pl.multiple_of((ptr // LANES) * LANES, LANES)
                    base2 = pl.multiple_of(base + LANES, LANES)
                    w0_rows.append(stream_ref[0, r, pl.ds(base, LANES)].reshape(1, LANES))
                    w1_rows.append(stream_ref[0, r, pl.ds(base2, LANES)].reshape(1, LANES))
                    off_rows.append(jnp.full((1, LANES), ptr - base, _I))
                w0 = jnp.concatenate(w0_rows, axis=0)
                w1 = jnp.concatenate(w1_rows, axis=0)
                idx = jnp.concatenate(off_rows, axis=0) + rank
                in_lo = idx < LANES
                v0 = jnp.take_along_axis(w0, jnp.where(in_lo, idx, 0), axis=1)
                v1 = jnp.take_along_axis(w1, jnp.where(in_lo, 0, idx - LANES), axis=1)
                refill_val = jnp.where(in_lo, v0, v1)
            cur = jnp.where(need, nxt, cur)
            nxt = jnp.where(need, refill_val, nxt)
            return cur, nxt, bitpos

        def decode_symbol(t, cur, nxt, bitpos):
            win = window_hi(cur, nxt, bitpos)
            win12 = (win >> _U(32 - MAXL)).astype(_I)
            L = jnp.ones_like(win12)
            for j in range(1, MAXL):
                L = L + (win12 >= lj_ref[0, 0, j - 1]).astype(_I)
            if variant.get("no_lut"):
                bucket = L
            else:
                code_L = (win12 >> jnp.minimum(MAXL - L, MAXL)).astype(_I)
                sym_idx = jnp.clip(code_L + jnp.take_along_axis(dD_row, jnp.clip(L, 0, 127), axis=1), 0, 127)
                bucket = jnp.take_along_axis(lut_row, sym_idx, axis=1)
            bitpos = bitpos + L
            cur, nxt, bitpos = refill(t, cur, nxt, bitpos)
            e = jnp.maximum(bucket - 1, 0)
            win2 = window_hi(cur, nxt, bitpos)
            extra = (win2 >> (_U(31) - e.astype(_U))) >> _U(1)
            extra = extra & ((_U(1) << e.astype(_U)) - _U(1))
            bitpos = bitpos + e
            cur, nxt, bitpos = refill(t + 1, cur, nxt, bitpos)
            z = jnp.where(bucket == 0, _U(0), (_U(1) << e.astype(_U)) | extra)
            delta = (z >> _U(1)).astype(_I) ^ -((z & _U(1)).astype(_I))
            return delta, cur, nxt, bitpos

        def point_step(i, carry):
            cur, nxt, bitpos, px, py, pz = carry
            t0 = i * 6
            dx, cur, nxt, bitpos = decode_symbol(t0, cur, nxt, bitpos)
            dy, cur, nxt, bitpos = decode_symbol(t0 + 2, cur, nxt, bitpos)
            dz, cur, nxt, bitpos = decode_symbol(t0 + 4, cur, nxt, bitpos)
            px, py, pz = px + dx, py + dy, pz + dz
            out_ref[0, i, 0] = px
            out_ref[0, i, 1] = py
            out_ref[0, i, 2] = pz
            return cur, nxt, bitpos, px, py, pz

        init = (cur0, nxt0, jnp.zeros((G, LANES), _I),
                start_ref[0, 0], start_ref[0, 1], start_ref[0, 2])
        jax.lax.fori_loop(0, PPT, point_step, init)
    return kern


def run(variant, args, B, maxw):
    f = pl.pallas_call(
        mk_kernel(variant),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 16), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G, maxw), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 384, G), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 3, G, LANES), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, PPT, 3, G, LANES), lambda b: (b, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, PPT, 3, G, LANES), jnp.int32),
    )
    jf = jax.jit(f)
    o = jf(*args); o.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        o = jf(*args); o.block_until_ready()
    dt = (time.perf_counter() - t0) / 3
    n = B * 65536
    print(f"{str(variant):55s} {dt*1e3:8.2f} ms  {n/dt/1e9:6.3f} Gpts/s")


def main():
    from pcrhpg24_tpu.codec.native import encode_native_batch
    from pcrhpg24_tpu.codec.morton import morton_order
    from pcrhpg24_tpu.render.pallas_decode import pack_native_batches

    rng = np.random.default_rng(0)
    n = 65536
    steps = rng.integers(-80, 80, size=(n, 3))
    pts = np.cumsum(steps, axis=0, dtype=np.int64).astype(np.int32)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    o = morton_order(x, y, z)
    nb = encode_native_batch(x[o], y[o], z[o])
    packed = pack_native_batches([nb])
    B = 64
    big = {k: np.repeat(packed[k], B, axis=0) for k in packed}
    maxw = big["streams"].shape[2]
    args = [jnp.asarray(big[k]) for k in ("lj", "streams", "ptrs", "dD", "lut", "starts")]

    for v in (
        {},
        {"rank": "roll"},
        {"no_refill": True},
        {"no_window": True},
        {"no_window": True, "rank": "roll"},
        {"no_lut": True},
        {"no_refill": True, "no_lut": True},
    ):
        try:
            run(v, args, B, maxw)
        except Exception as e:
            print(v, "FAILED:", repr(e)[:160])


if __name__ == "__main__":
    main()
