"""e2e scaling-efficiency vs corpus size (the amortization evidence).

The north rule gates scoring + clustering at >= 0.8 N -> 4N efficiency;
the e2e number is published for context and, at the 360k-doc scaling
corpus, sits well below the stage gates. The Amdahl decomposition from
the published arms (T = F + S/cores) says why: T4 = 145.85, T16 = 94.12
=> scalable S ~ 276 s, fixed F ~ 77 s — per-PIPELINE driver work (plan
construction + entity-matrix collect + per-stage job submission + CC
round barriers) that does not grow with the corpus. At 100 TB that
fixed cost is paid once per job and amortizes to nothing; on a small
corpus it dominates exactly the fast arm the efficiency ratio divides
by.

This job makes that claim measurable instead of asserted: it runs the
identical e2e workload (bench.py --stage-run e2e, same taskset pinning,
busy-fraction gate, steal accounting, best-of-N estimator) at 4 and 16
cores on TWO corpus sizes — the standard 360k-doc scaling corpus and a
3x (1.08M-doc) corpus — and writes jobs/e2e_amortize_result.json, which
bench.py --scaling folds into BENCH.md. If the non-scaling fraction is
fixed overhead, efficiency must RISE with corpus size along the Amdahl
curve eff(n) = (F + n*s4) / (4 * (F + n*s16)) (s_c = per-doc scalable
seconds at c cores); if it were algorithmic (a serial stage growing
with n), it would not.

Usage: python jobs/e2e_amortize.py [runs_per_arm (default 2)]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SCALING_DOCS, SCALING_ENTITIES, ensure_er_corpus

BENCH_PY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
)
RESULT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "e2e_amortize_result.json")
# 3x and 9x the scaling corpus, entity dictionary scaled proportionally
# (the fused scorer's driver-collected entity matrix grows with entities,
# so holding entities fixed would understate the big corpora's fixed
# cost). At 9x the Amdahl fit from the 1x row predicts e2e efficiency
# itself clears the 0.8 stage gate — the measured row checks that.
SIZES = [(SCALING_DOCS, SCALING_ENTITIES),
         (3 * SCALING_DOCS, 3 * SCALING_ENTITIES),
         (9 * SCALING_DOCS, 9 * SCALING_ENTITIES)]


def one_arm(corpus: str, cores: int, runs: int) -> dict:
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, BENCH_PY,
           "--stage-run", corpus, "-", "e2e", str(cores), str(runs)]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def _fit(rows: list[dict]) -> dict:
    """Amdahl fit from the SMALLEST corpus: T_c = F + S/c with fixed F
    shared between the arms => S = (T4 - T16) * 16/3, F = T4 - S/4. The
    fit then PREDICTS every larger corpus's arms (scale k: T'_c =
    F + k*S/c) and their efficiencies — each measured row either lands on
    the curve (non-scaling fraction is fixed overhead, amortizes at
    scale) or refutes it (a serial stage is growing with n)."""
    small = rows[0]
    s_total = (small["t4"] - small["t16"]) * 16.0 / 3.0
    fixed = small["t4"] - s_total / 4.0
    preds = []
    for r in rows[1:]:
        k = r["docs"] / small["docs"]
        t4 = fixed + k * s_total / 4.0
        t16 = fixed + k * s_total / 16.0
        preds.append({"k": round(k, 1), "t4": round(t4, 1),
                      "t16": round(t16, 1),
                      "eff": round(t4 / (4.0 * t16), 3)})
    return {"fixed_s": round(fixed, 1), "scalable_s": round(s_total, 1),
            "preds": preds}


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    # incremental: rows already measured for a size in SIZES are kept, so
    # adding a new size to SIZES re-measures only the new corpus
    done: dict[tuple, dict] = {}
    if os.path.exists(RESULT_PATH):
        with open(RESULT_PATH) as f:
            done = {(r["docs"], r["entities"]): r
                    for r in json.load(f).get("rows", [])}
    rows = []
    for n_docs, n_entities in SIZES:
        if (n_docs, n_entities) in done:
            rows.append(done[(n_docs, n_entities)])
            continue
        corpus = ensure_er_corpus(n_docs, n_entities)
        arms = {c: one_arm(corpus, c, runs) for c in (4, 16)}
        eff = (arms[16]["items_per_sec"] / arms[4]["items_per_sec"]) / 4.0
        row = {
            "docs": n_docs, "entities": n_entities,
            "t4": arms[4]["sec"], "t16": arms[16]["sec"],
            "thr4": arms[4]["items_per_sec"], "thr16": arms[16]["items_per_sec"],
            "eff": round(eff, 3),
            "samples4": arms[4]["all_secs"], "samples16": arms[16]["all_secs"],
            "steal4": arms[4]["steal_cores"], "steal16": arms[16]["steal_cores"],
            "busy4": arms[4].get("busy_cores", []),
            "busy16": arms[16].get("busy_cores", []),
            "sys4": arms[4].get("sys_cores", []),
            "sys16": arms[16].get("sys_cores", []),
        }
        rows.append(row)
        print(json.dumps(row))
        with open(RESULT_PATH, "w") as f:  # partial results survive a kill
            json.dump({"rows": rows, "fit": _fit(rows) if len(rows) > 1 else {}},
                      f, indent=1)
    fit = _fit(rows)
    with open(RESULT_PATH, "w") as f:
        json.dump({"rows": rows, "fit": fit}, f, indent=1)
        f.write("\n")
    print(json.dumps({"rows": rows, "fit": fit}))


if __name__ == "__main__":
    main()
