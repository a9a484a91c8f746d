"""Headline benchmark: fused decode + rasterize, points/sec @1080p.

Builds (once, cached under ./out/) a synthetic Morton-sorted scene in
the TPU-native `.tpc` format, loads it fully to the device, then times
full frames of the flagship `huffman_tpu` method — frustum cull + LOD +
Pallas decode of every visible batch + exact depth-test rasterize +
resolve — the same per-frame work as the reference's flagship
(modules/huffman_mem_iter_cuda/huffman_mem_iter_cuda.h:192-195).  Set
BENCH_METHOD=reference to bench the reference-format XLA path instead.

Prints ONE JSON line.  Baseline: 2e9 points/sec (driver north star).

Cold-start contract (round-4): the whole run — scene synthesis, XLA
compiles, timing, exactness gates — must fit the driver's budget from
an empty .jax_cache.  Three mechanisms enforce it:
  * the timed frame chain is a `lax.fori_loop` with a RUNTIME trip
    count, so one compile serves every chain length (the round-3 bench
    unrolled k=11 full frame graphs and blew the budget, rc=124);
  * stages are ordered headline-first and optional stages (extra
    views, full-frame fallback gates, wall-clock, trace) are skipped
    once the BENCH_BUDGET_S deadline (default 900 s) approaches;
  * a watchdog thread prints the best-known result JSON and exits 0
    at the deadline even if a compile stalls.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

BENCH_BATCHES = int(os.environ.get("BENCH_BATCHES", "64"))  # x65 536 pts
BENCH_METHOD = os.environ.get("BENCH_METHOD", "native")
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "900"))
T_START = time.time()
WARMUP = 2
FRAMES = 10
W, H = 1920, 1080

_PRINTED = threading.Event()
_RESULT: dict = {}  # mutated in place as numbers land; watchdog prints it


def _remaining() -> float:
    return BUDGET_S - (time.time() - T_START)


def _emit(partial: bool = False) -> None:
    """Print the ONE result JSON line exactly once."""
    if _PRINTED.is_set():
        return
    _PRINTED.set()
    out = dict(_RESULT)
    if partial:
        out.setdefault("detail", {})["partial"] = True
    try:  # docs regeneration input (tools/gen_readme_perf.py)
        os.makedirs("out", exist_ok=True)
        with open("out/last_bench.json", "w") as f:
            json.dump(out, f, indent=1)
    except Exception:
        pass
    print(json.dumps(out), flush=True)


def _watchdog() -> None:
    # fire 45 s before the budget so the print itself always lands
    if not _PRINTED.wait(timeout=max(5.0, BUDGET_S - 45 - (time.time() - T_START))):
        headline_landed = bool(_RESULT.get("value"))
        if not _RESULT:
            _RESULT.update({
                "metric": "fused huffman decode+rasterize @1920x1080",
                "value": 0.0, "unit": "Gpoints/s", "vs_baseline": 0.0,
                "detail": {"error": "watchdog: no headline before budget"},
            })
        _emit(partial=True)
        # a stalled run with NO headline is a failure (rc!=0) so the
        # driver/ledger can't record a zero as a successful bench;
        # partial-but-headline results still exit 0
        os._exit(0 if headline_landed else 1)


def build_scene(path: str, num_batches: int) -> str:
    from pcrhpg24_tpu.formats.las import write_las
    from pcrhpg24_tpu.preprocess import preprocess_las, preprocess_las_tpc
    from pcrhpg24_tpu.utils.synthetic import cloud_to_grid, terrain_cloud

    las = path + ".las"
    if not os.path.exists(path):
        n = num_batches * 65536
        xyz, rgb = terrain_cloud(n, seed=1, extent=2000.0)
        grid = cloud_to_grid(xyz, scale=(0.001, 0.001, 0.001))
        write_las(las, grid[:, 0], grid[:, 1], grid[:, 2], rgb)
        if path.endswith(".tpc"):
            preprocess_las_tpc(las, path, sort=True, verbose=False)
        else:
            preprocess_las(las, path, sort=True, verbose=False)
        os.remove(las)
    return path


def main() -> int:
    threading.Thread(target=_watchdog, daemon=True).start()
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pcrhpg24_tpu.engine.debug import Debug
    from pcrhpg24_tpu.engine.renderer import Renderer, Setting

    os.makedirs("out", exist_ok=True)
    if BENCH_METHOD == "native":
        from pcrhpg24_tpu.engine.native_resource import NativeLasData as Data
        from pcrhpg24_tpu.render.methods.huffman_tpu import HuffmanTpu as MethodCls

        scene = build_scene(f"out/bench_{BENCH_BATCHES}.tpc", BENCH_BATCHES)
    else:
        from pcrhpg24_tpu.engine.resource import HuffmanLasData as Data
        from pcrhpg24_tpu.render.methods.huffman_mem_iter import (
            HuffmanMemIter as MethodCls,
        )

        scene = build_scene(f"out/bench_{BENCH_BATCHES}.huffman", BENCH_BATCHES)

    Debug.lod = 1.0  # decode + rasterize every point of every visible batch
    las = Data.create(scene)

    # --- real-TPU bit-exactness gate (cheap: first batch only) ---
    # Decode batch 0 on the device through the same kernel path the bench
    # times, and compare against the NumPy mirror decoder.  A kernel
    # regression aborts the bench loudly instead of timing a wrong image.
    if BENCH_METHOD == "native" and jax.default_backend() == "tpu":
        from pcrhpg24_tpu.formats.native_file import (
            decode_tpc_batch_coords, read_tpc_batch,
        )

        import jax.numpy as jnp

        nb0, _c0 = read_tpc_batch(scene, las.header, 0)
        ref0 = decode_tpc_batch_coords(nb0).reshape(8, 128, 64, 3)
        if las.header.version == 2:
            from pcrhpg24_tpu.render.pallas_decode_fixed import (
                decode_fixed_batches, pack_fixed_batches,
            )

            pk = pack_fixed_batches([nb0])
            got0 = decode_fixed_batches(
                jnp.asarray(pk["widths"]), jnp.asarray(pk["streams"]),
                jnp.asarray(pk["ptrs"]), jnp.asarray(pk["starts"]),
            )
        else:
            from pcrhpg24_tpu.render.pallas_decode import (
                decode_native_batches, pack_native_batches,
            )

            pk = pack_native_batches([nb0])
            got0 = decode_native_batches(
                jnp.asarray(pk["lj"]), jnp.asarray(pk["streams"]),
                jnp.asarray(pk["ptrs"]), jnp.asarray(pk["dD"]),
                jnp.asarray(pk["lut"]), jnp.asarray(pk["starts"]),
            )
        got0 = np.transpose(np.asarray(got0)[0], (2, 3, 0, 1))
        if not np.array_equal(got0, ref0):
            print(json.dumps({"error": "TPU decode bit-exactness gate FAILED"}))
            return 1
    r = Renderer(W, H)
    # camera presets (reference analogue: the settings table,
    # src/main.cpp:66-213): the headline rides the default orbit; the
    # close-up (few run collapses, many windows/tile) and the oblique
    # overdraw view guard against the headline silently depending on
    # one friendly viewpoint's Morton coherence.
    VIEWS = {
        "orbit": Setting(yaw=0.5, pitch=-0.9, radius=2500.0,
                         target=(1000.0, 1000.0, 100.0)),
        "closeup": Setting(yaw=2.4, pitch=-0.25, radius=180.0,
                           target=(1000.0, 1000.0, 60.0)),
        "oblique": Setting(yaw=-1.1, pitch=-0.08, radius=1400.0,
                           target=(1000.0, 1000.0, 40.0)),
    }
    r.apply_setting(VIEWS["orbit"])
    m = MethodCls(r, las)
    m.update(r)
    las.wait_loaded(r)
    r.controls_update()
    _, lod_full = m.frame_setup(r)
    pts_per_frame = int(lod_full.astype(np.int64).sum() * 1024)

    views_out = {}
    gates = {"decode": "pass" if BENCH_METHOD == "native" else "n/a"}
    detail = {
        "device_frame_ms": None,
        "points_per_frame": pts_per_frame,
        "batches": BENCH_BATCHES,
        "method": BENCH_METHOD,
        "device": str(jax.devices()[0]),
        "views": views_out,
        "gates": gates,
    }
    _RESULT.update({
        "metric": "fused huffman decode+rasterize @1920x1080",
        "value": 0.0, "unit": "Gpoints/s", "vs_baseline": 0.0,
        "detail": detail,
    })

    def set_headline(dt):
        pps = pts_per_frame / dt
        _RESULT["value"] = round(pps / 1e9, 4)
        _RESULT["vs_baseline"] = round(pps / 2e9, 4)
        detail["device_frame_ms"] = round(dt * 1e3, 2)

    if BENCH_METHOD != "native":
        # reference-format path: wall-clock frames only (the XLA method
        # isn't the perf deliverable; keep this branch simple)
        r.loop(m.update, m.render, frames=WARMUP)
        t0 = time.perf_counter()
        imgs = []
        for _ in range(FRAMES):
            r.controls.yaw += 0.003
            imgs.append(r.loop(m.update, m.render, frames=1, block=False))
        jax.block_until_ready(imgs)
        _ = float(np.asarray(imgs[-1][0, 0]))
        dt = (time.perf_counter() - t0) / FRAMES
        set_headline(dt)
        detail["wall_frame_ms"] = round(dt * 1e3, 2)
        _emit()
        return 0

    import functools
    import jax.numpy as jnp
    from pcrhpg24_tpu.render.methods.huffman_tpu import render_frame_native

    scale = jnp.asarray(las.scale, jnp.float32)
    offset_rel = jnp.asarray(las.offset - las.las_min, jnp.float32)
    las._dev_consts = (scale, offset_rel)
    from pcrhpg24_tpu.render.camera import batch_translations

    def frame_inputs():
        cam = r.camera
        fp = np.zeros(40, np.float32)
        fp[0:16] = cam.view().astype(np.float32).reshape(-1)
        fp[16:22] = cam.proj_params().astype(np.float32)
        fp[22] = 1.0
        fp[23] = float(las.num_batches_loaded)
        fp[24:40] = (cam.proj() @ cam.view()).astype(np.float32).reshape(-1)
        tb = batch_translations(
            (cam.proj() @ cam.view()),
            las.anchor_i[: las.dev["anchor"].shape[0]],
            las.scale, las.offset, las.las_min,
        )
        return jnp.asarray(fp), jnp.asarray(tb)

    kw = dict(width=W, height=H, mode="color",
              nchunks=(las.num_batches_loaded + 63) // 64, use_pallas=True,
              cull=True, need_depth=False,
              fmt="fixed" if getattr(las, "version", 1) == 2 else "tbatch")

    @jax.jit
    def chain(dev, fp, tb, scale, offset_rel, k):
        # ONE compile for every chain length: k is a runtime trip count
        # of a fori_loop whose body is the full frame graph.  The probe
        # token feeds BOTH the camera params and the decoder's stream
        # pointers so every chained frame re-decodes (otherwise XLA
        # hoists the camera-independent decode out of the loop and the
        # slope under-counts ~1 ms of real frame).
        ptrs0 = dev["ptrs"]

        def body(_i, carry):
            acc, fp0, tok = carry
            devi = dict(dev, ptrs=ptrs0 + tok)
            _fd, _fp2, img = render_frame_native(
                devi, fp0, scale, offset_rel, tb=tb, **kw)
            probe = img[0, 0]
            t1 = jnp.where(probe == jnp.uint32(123456789), 1, 0)
            return (acc + probe,
                    fp + t1.astype(jnp.float32),
                    t1.astype(jnp.int32))

        acc, _fp0, _tok = jax.lax.fori_loop(
            0, k, body,
            (jnp.uint32(0), fp, jnp.int32(0)))
        return acc

    def time_chain(fpd, tbd):
        # slope from MIN-of-3 timings per endpoint: the tunnel's
        # per-dispatch jitter only ever ADDS wall time, and a single
        # sample per endpoint leaves +-0.5 ms/frame of noise (round-3
        # oblique read 9.7 ms on one sample vs ~8.3 device-traced)
        ts = {}
        for k in (1, 1 + FRAMES):
            kd = jnp.int32(k)
            o = chain(las.dev, fpd, tbd, scale, offset_rel, kd)
            float(o)
            best = float("inf")
            for _rep in range(3):
                t0 = time.perf_counter()
                o = chain(las.dev, fpd, tbd, scale, offset_rel, kd)
                float(o)
                best = min(best, time.perf_counter() - t0)
            ts[k] = best
        return (ts[1 + FRAMES] - ts[1]) / FRAMES

    # ---- headline first: orbit device frame via the chained loop ----
    for name, setting in VIEWS.items():
        if name != "orbit" and _remaining() < 150:
            views_out[name] = "skipped (budget)"
            continue
        r.apply_setting(setting)
        r.controls_update()
        fpd, tbd = frame_inputs()
        _, lodv = m.frame_setup(r)
        view_pts = int(lodv.astype(np.int64).sum() * 1024)
        dt_view = time_chain(fpd, tbd)
        views_out[name] = {
            "device_frame_ms": round(dt_view * 1e3, 2),
            "visible_points": view_pts,
            "gpts_per_s": round(view_pts / dt_view / 1e9, 4),
        }
        if name == "orbit":
            set_headline(dt_view)

        # resolve gate: the Pallas merge image must equal the XLA
        # scatter path's bit-for-bit, PER VIEW (the decode gate above
        # covers the decode kernel; this covers collapse + per-chunk
        # sorts + window tables + the merge kernel).  Small scenes
        # compare the FULL frame; at scale, spot-check the most
        # populated chunk (adversarial: max visible points, not the
        # Morton-friendliest chunk 0) through the merge kernel vs the
        # scatter path.
        gate_key = f"resolve:{name}"
        if las.num_batches_loaded <= 256 and _remaining() > 240:
            _d1, _p1, img1 = render_frame_native(
                las.dev, fpd, scale, offset_rel, tb=tbd, **kw)
            _d2, _p2, img2 = render_frame_native(
                las.dev, fpd, scale, offset_rel, tb=tbd,
                **dict(kw, use_pallas=False))
            if not np.array_equal(np.asarray(img1), np.asarray(img2)):
                gates[gate_key] = "FAIL"
                _RESULT["error"] = f"TPU resolve bit-exactness gate FAILED ({name})"
                _emit()
                return 1
            gates[gate_key] = "pass (full frame)"
        elif _remaining() > 150:
            from pcrhpg24_tpu.render.methods.huffman_tpu import (
                CHUNK, SORT_ROWS, render_chunk_native,
            )
            from pcrhpg24_tpu.render.pallas_merge import (
                SORT_KEYS, dense_from_sorted_rows,
            )
            from pcrhpg24_tpu.render.raster import (
                sorted_resolve_u64_min, swizzle_dims,
            )
            from pcrhpg24_tpu.render.camera import frame_setup_device

            lod_n = frame_setup_device(
                fpd[0:16].reshape(4, 4), fpd[16:22],
                las.dev["bbox_min"], las.dev["bbox_max"],
                fpd[23].astype(jnp.int32), W, H, fpd[22], True,
            )
            # adversarial chunk: the most populated one EXCLUDING
            # chunk 0 (the most Morton-coherent chunk — the friendliest
            # possible spot-check, per the round-3 review)
            per_chunk = np.asarray(lodv.astype(np.int64))
            nfull = (per_chunk.shape[0] // CHUNK) * CHUNK
            csums = per_chunk[:nfull].reshape(-1, CHUNK).sum(axis=1)
            cidx = (int(csums[1:].argmax()) + 1) if len(csums) > 1 else 0
            pid, dep, pay = render_chunk_native(
                las.dev, cidx * CHUNK, fpd[24:40].reshape(4, 4), lod_n,
                scale, offset_rel, W, H, "color", True, 64, kw["fmt"], tbd,
            )
            n1 = pid.shape[0] // SORT_ROWS
            sp_, sd_, sy_ = jax.lax.sort(
                [pid.reshape(SORT_ROWS, n1).astype(jnp.uint32),
                 dep.reshape(SORT_ROWS, n1), pay.reshape(SORT_ROWS, n1)],
                num_keys=SORT_KEYS, is_stable=False, dimension=1,
            )
            wt0, _ht0, size = swizzle_dims(W, H)
            _gd, gp = dense_from_sorted_rows(sp_, sd_, sy_, size, False,
                                             tile_cols=wt0,
                                             fully_sorted=SORT_KEYS == 3)
            _rd, rp = sorted_resolve_u64_min(
                pid.astype(jnp.uint32), dep, pay, size, False,
                use_pallas=False,
            )
            if not np.array_equal(np.asarray(gp), np.asarray(rp)):
                gates[gate_key] = "FAIL"
                _RESULT["error"] = (
                    f"TPU resolve bit-exactness gate FAILED "
                    f"(view {name}, chunk {cidx})")
                _emit()
                return 1
            gates[gate_key] = f"pass (chunk {cidx})"
        else:
            gates[gate_key] = "skipped (budget)"

        # BENCH_TRACE=dir: capture a device trace of the timed chain
        # (per-kernel attribution for the frame's phases)
        if name == "orbit" and os.environ.get("BENCH_TRACE"):
            with jax.profiler.trace(os.environ["BENCH_TRACE"]):
                float(chain(las.dev, fpd, tbd, scale, offset_rel,
                            jnp.int32(1 + FRAMES)))

    # ---- non-flagship method stages (regression tracking) ----
    # Cheap wall frames for the reference-format XLA method, loop_las,
    # and the 2021 HQS baseline, plus a DEVICE-timed flagship frame on a
    # reference .huffman scene through the load-time converter (its
    # geometry is bit-identical, so the same chain harness applies).
    if _remaining() > 420 and BENCH_METHOD == "native":
        try:
            methods_out = {}
            detail["methods"] = methods_out
            r.apply_setting(VIEWS["orbit"])
            r.controls_update()

            # load-time .huffman fast path on the SAME 64-batch scene
            from pcrhpg24_tpu.engine.native_resource import HuffmanNativeData

            huf = build_scene("out/bench_64.huffman", BENCH_BATCHES) \
                if BENCH_BATCHES == 64 else None
            if huf:
                t0 = time.perf_counter()
                h = HuffmanNativeData.create(huf)
                h.wait_loaded(r)
                t_conv = time.perf_counter() - t0
                h._dev_consts = (scale, offset_rel)
                fpd, tbd = frame_inputs()
                # chain harness over the converted dev dict (same scene,
                # same anchors); also a cross-format equality gate
                _d1, _p1, img_h = render_frame_native(
                    h.dev, fpd, scale, offset_rel, tb=tbd, **kw)
                _d2, _p2, img_t = render_frame_native(
                    las.dev, fpd, scale, offset_rel, tb=tbd, **kw)
                gates["huffman_native"] = (
                    "pass" if np.array_equal(np.asarray(img_h),
                                             np.asarray(img_t)) else "FAIL")
                las_dev = las.dev
                las.dev = h.dev
                try:
                    dt_h = time_chain(fpd, tbd)
                finally:
                    las.dev = las_dev
                methods_out["huffman_native"] = {
                    "device_frame_ms": round(dt_h * 1e3, 2),
                    "gpts_per_s": round(pts_per_frame / dt_h / 1e9, 4),
                    "convert_s": round(t_conv, 2),
                    "convert_mpts_per_s": round(
                        h.num_points / t_conv / 1e6, 1),
                }
                h.unload(r)

            # wall-frame stages for the remaining families (1M scene)
            from pcrhpg24_tpu.engine.method import Runtime as _RT
            from pcrhpg24_tpu.engine.resource import HuffmanLasData
            from pcrhpg24_tpu.engine.las_resources import (
                ComputeLasData, LasStandardData,
            )
            from pcrhpg24_tpu.render.methods.huffman_mem_iter import (
                HuffmanMemIter,
            )
            from pcrhpg24_tpu.render.methods.loop_las import ComputeLoopLas
            from pcrhpg24_tpu.render.methods.compute_2021 import Compute2021Hqs

            huf16 = build_scene("out/bench_16.huffman", 16)
            las16 = "out/bench_16s.las"
            if not os.path.exists(las16):
                from pcrhpg24_tpu.formats.las import write_las
                from pcrhpg24_tpu.utils.synthetic import (
                    cloud_to_grid, terrain_cloud,
                )

                xyz, rgb = terrain_cloud(16 * 65536, seed=1, extent=2000.0)
                grid = cloud_to_grid(xyz)
                write_las(las16, grid[:, 0], grid[:, 1], grid[:, 2], rgb)

            def stage(name, MethodC, Res, path):
                if _remaining() < 150:
                    methods_out[name] = "skipped (budget)"
                    return
                _RT.resource = None
                data = Res.create(path)
                mm = MethodC(r, data)
                mm.update(r)
                deadline = time.time() + 120
                while (data.state.name != "LOADED"
                       and time.time() < deadline):
                    r.loop(mm.update, mm.render, frames=1)
                r.loop(mm.update, mm.render, frames=1)  # warm
                best = 1e9
                for _i in range(3):
                    r.controls.yaw += 0.001
                    t0 = time.perf_counter()
                    jax.block_until_ready(
                        r.loop(mm.update, mm.render, frames=1))
                    best = min(best, time.perf_counter() - t0)
                methods_out[name] = {"wall_frame_ms": round(best * 1e3, 2)}
                data.unload(r)
                _RT.resource = None

            stage("huffman_mem_iter", HuffmanMemIter, HuffmanLasData, huf16)
            stage("loop_las", ComputeLoopLas, ComputeLasData, las16)
            stage("2021_hqs", Compute2021Hqs, LasStandardData, las16)
        except Exception as e:
            detail["methods_error"] = str(e)
        r.apply_setting(VIEWS["orbit"])
        r.controls_update()

    # ---- optional: interactive wall-clock (tunnel RTT included) ----
    if _remaining() > 180:
        r.apply_setting(VIEWS["orbit"])
        r.loop(m.update, m.render, frames=WARMUP)
        t0 = time.perf_counter()
        imgs = []
        for _ in range(FRAMES):
            r.controls.yaw += 0.003
            imgs.append(r.loop(m.update, m.render, frames=1, block=False))
        jax.block_until_ready(imgs)
        _ = float(np.asarray(imgs[-1][0, 0]))
        detail["wall_frame_ms"] = round(
            (time.perf_counter() - t0) / FRAMES * 1e3, 2)

    # scale-run ledger: non-default sizes (e.g. BENCH_BATCHES=1536 ==
    # 100M points) record their result into docs/scale_runs.json, and
    # every run attaches the ledger so the headline JSON carries the
    # large-scene numbers too
    ledger = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "docs", "scale_runs.json")
    try:
        runs = {}
        if os.path.exists(ledger):
            with open(ledger) as f:
                runs = json.load(f)
        if BENCH_BATCHES != 64 and BENCH_METHOD == "native":
            runs[str(BENCH_BATCHES)] = {
                "points": pts_per_frame,
                "gpts_per_s": _RESULT["value"],
                "device_frame_ms": detail["device_frame_ms"],
            }
            with open(ledger, "w") as f:
                json.dump(runs, f, indent=1, sort_keys=True)
        if runs:
            # keep the single output line compact: drop bulky per-run
            # sample arrays (full detail stays in docs/scale_runs.json)
            detail["scale_runs"] = {
                k: {kk: vv for kk, vv in v.items() if kk != "load_samples"}
                if isinstance(v, dict) else v
                for k, v in runs.items()
            }
    except Exception:
        pass
    _emit()
    return 0


if __name__ == "__main__":
    sys.exit(main())
