"""Rebuild BENCH.md from recorded scaling-arm JSON lines without
re-running the matrix. Feed it one or more files whose lines include the
stage_run JSON records (e.g. a captured --scaling log plus later
re-measured arms); later files' arms supersede earlier ones by min-sec
merge, and a `skip:<stage>` arg drops a stage from a file (used when a
later file re-measures it under a revised config).

Usage: python jobs/rebuild_bench_md.py [skip:clustering] log1 log2 ...
(`skip:<stage>` applies only to the file that immediately follows it.)
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main() -> None:
    results: dict = {}

    def add(r: dict) -> None:
        key = (r["stage"], r["cores"])
        prev = results.get(key)
        if prev is None:
            results[key] = r
            return
        prev["all_secs"] = sorted(prev["all_secs"] + r["all_secs"])
        for k in ("loadavg_at_start", "steal_cores", "busy_cores",
                  "sys_cores"):
            prev[k] = prev.get(k, []) + r.get(k, [])
        if r["sec"] < prev["sec"]:
            # the CPU columns must come from the SAME sample as the best
            # sec: when the new minimum is an old-format record without
            # best_* keys, drop the stale pairing instead of publishing
            # busy*sec computed from mismatched samples
            for k in ("best_busy_cores", "best_sys_cores"):
                if k not in r:
                    prev.pop(k, None)
            prev.update({k: r[k] for k in
                         ("sec", "items_per_sec", "best_busy_cores",
                          "best_sys_cores") if k in r})

    skip: set[str] = set()
    for arg in sys.argv[1:]:
        if arg.startswith("skip:"):
            skip.add(arg[5:])
            continue
        with open(arg) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "stage" in r and "cores" in r and r["stage"] not in skip:
                    add(r)
        skip.clear()  # one-shot: applies only to the file just processed

    GATE_PAIR, WIDE_PAIR = (4, 16), (8, 32)

    def eff(stage, pair):
        lo, hi = pair
        return (results[(stage, hi)]["items_per_sec"]
                / results[(stage, lo)]["items_per_sec"]) / 4.0

    def cpu_cols(r):
        if "best_busy_cores" not in r:
            return " | "
        return (f"{r['best_busy_cores'] * r['sec']:,.0f} | "
                f"{r['best_sys_cores'] * r['sec']:,.0f}")

    def row(stage, unit, pair):
        lo, hi = pair
        rl, rh = results.get((stage, lo)), results.get((stage, hi))
        if rl is None or rh is None:
            return (f"| {stage} | (pair incomplete) | {lo} | | | | | "
                    f"{hi} | | | | | {unit} | |")
        return (
            f"| {stage} | {rl['n_items']:,} | {lo} | {rl['sec']:.2f} | "
            f"{rl['items_per_sec']:,.0f} | {cpu_cols(rl)} | "
            f"{hi} | {rh['sec']:.2f} | "
            f"{rh['items_per_sec']:,.0f} | {cpu_cols(rh)} | "
            f"{unit} | **{eff(stage, pair):.3f}** |")

    def eff_str(stage, pair):
        if (stage, pair[0]) in results and (stage, pair[1]) in results:
            return f"{eff(stage, pair):.3f}"
        return "(incomplete)"

    bench._write_bench_md(results, eff, row, eff_str, GATE_PAIR, WIDE_PAIR)
    print("BENCH.md rebuilt; arms:", sorted(results))


if __name__ == "__main__":
    main()
