"""Regenerate the README performance table from measured artifacts.

Reads docs/scale_runs.json (the scale-run ledger bench.py maintains)
and out/last_bench.json (the last bench result) and rewrites the
README block between the PERF-TABLE markers — the table is generated,
never hand-kept (a round-3 review caught it 2.6x stale).

    python -m pcrhpg24_tpu.tools.gen_readme_perf
"""

from __future__ import annotations

import json
import os
import sys

START = "<!-- PERF-TABLE-START (generated: python -m pcrhpg24_tpu.tools.gen_readme_perf) -->"
END = "<!-- PERF-TABLE-END -->"


def build_rows(root: str) -> list[str]:
    rows = []
    bench_p = os.path.join(root, "out", "last_bench.json")
    ledger_p = os.path.join(root, "docs", "scale_runs.json")
    bench = json.load(open(bench_p)) if os.path.exists(bench_p) else None
    runs = json.load(open(ledger_p)) if os.path.exists(ledger_p) else {}

    if bench:
        d = bench.get("detail", {})
        rows.append(
            f"| full frame (decode + exact raster + resolve, 1080p, "
            f"{d.get('points_per_frame', 0) / 1e6:.1f}M pts, orbit) | "
            f"**{bench['value']} Gpts/s** ({d.get('device_frame_ms')} ms "
            f"device frame) |")
        for name, v in (d.get("views") or {}).items():
            if name == "orbit" or not isinstance(v, dict):
                continue
            rows.append(
                f"| full frame, {name} view "
                f"({v['visible_points'] / 1e6:.1f}M visible) | "
                f"{v['gpts_per_s']} Gpts/s ({v['device_frame_ms']} ms) |")
    for key in sorted((k for k in runs if k.isdigit()), key=int):
        r = runs[key]
        if int(key) == 64:
            continue
        rows.append(
            f"| full frame at {r['points'] / 1e6:.1f}M pts | "
            f"{r['gpts_per_s']} Gpts/s ({r['device_frame_ms']} ms) |")
    fe = runs.get("flagship_2e9")
    if fe:
        rows.append(
            f"| flagship 2B-point dataset (streamed residency, "
            f"{fe['resident_points'] / 1e6:.0f}M resident, all visible) | "
            f"{fe['gpts_per_s']} Gpts/s ({fe['steady_frame_ms']} ms "
            f"steady frame, {fe['peak_hbm_gib']} GiB peak HBM) |")
    pe = runs.get("potree_1e9")
    if pe:
        bud = pe.get("budgeted_points")
        budtxt = (f", {bud / 1e6:.0f}M budgeted (density "
                  f"{pe.get('budget_density')})" if bud else "")
        rows.append(
            f"| Potree 1B-point scene (loop_nodes, "
            f"{pe['resident_points'] / 1e6:.0f}M resident / "
            f"{pe['visible_points'] / 1e6:.0f}M visible{budtxt}, streamed "
            f">HBM) | {pe['steady_frame_ms']} ms steady frame, "
            f"{pe['peak_hbm_gib']} GiB peak HBM |")
        if pe.get("hqs_steady_frame_ms"):
            rows.append(
                f"| Potree 1B HQS accumulate at the same budget | "
                f"{pe['hqs_steady_frame_ms']} ms |")
    hqs = runs.get("hqs")
    if hqs:
        for k, v in sorted(hqs.items()):
            rows.append(
                f"| HQS frame at {float(k) / 1e6:.1f}M pts (prepass + "
                f"tolerance blend + resolve) | {v['frame_ms']} ms — "
                f"{v['x_color']}x the color frame |")
    return rows


def main(argv=None) -> int:
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    readme = os.path.join(root, "README.md")
    src = open(readme).read()
    if START not in src or END not in src:
        print("README markers not found", file=sys.stderr)
        return 1
    head, rest = src.split(START, 1)
    _old, tail = rest.split(END, 1)
    body = "\n".join(build_rows(root))
    open(readme, "w").write(f"{head}{START}\n{body}\n{END}{tail}")
    print(f"README perf table regenerated ({len(build_rows(root))} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
