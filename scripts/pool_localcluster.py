"""Pool executor-per-JVM scaling samples across independent sessions.

Same no-run-selection protocol as scripts/pool_scaling.py, generalized to
the local-cluster JSON shape (master keys like "local-cluster[4,8,16384]").
Merges any number of scaling_localcluster.json files from independent
script invocations: per (scenario, master) all post-warmup runs pool into
one series, the tiny medians pool for the overhead solve, and raw +
overhead-corrected efficiencies are recomputed over the pooled medians.

Usage: python scripts/pool_localcluster.py out.json in1.json [in2.json ...]
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    out_path, paths = sys.argv[1], sys.argv[2:]
    sessions = [json.load(open(p)) for p in paths]
    base = sessions[0]
    n_rows, n_tiny = base["n_rows"], base["n_tiny"]
    frac = n_tiny / n_rows
    pooled = {k: v for k, v in base.items() if k != "scenarios"}
    pooled.update(n_sessions=len(paths), sources=paths, scenarios={})
    for scen, sblock in base["scenarios"].items():
        masters = list(sblock["results"])
        res = {}
        for master in masters:
            runs, tiny = [], []
            for s in sessions:
                block = (s["scenarios"].get(scen, {})
                         .get("results", {}).get(master))
                if not block:
                    continue
                runs += [r["sec"] for r in block["runs"]]
                tiny.append(block["tiny_median_sec"])
            med = statistics.median(runs)
            med_t = statistics.median(tiny)
            work = max((med - med_t) / (1.0 - frac), 1e-9)
            res[master] = {
                "pooled_median_sec": round(med, 3),
                "n_runs_pooled": len(runs),
                "runs_sec": sorted(round(r, 3) for r in runs),
                "tiny_median_sec": round(med_t, 3),
                "fixed_overhead_sec": round(max(med - work, 0.0), 3),
                "work_sec": round(work, 3),
                "rows_per_sec": round(n_rows / med, 1),
            }
        m8, m32 = masters[0], masters[1]
        eff = res[m32]["rows_per_sec"] / res[m8]["rows_per_sec"] / 4.0
        eff_c = res[m8]["work_sec"] / res[m32]["work_sec"] / 4.0
        pooled["scenarios"][scen] = {
            "pipeline": sblock.get("pipeline"),
            "results": res,
            "scaling_efficiency_8_to_32": round(eff, 3),
            "scaling_efficiency_overhead_corrected": round(eff_c, 3),
        }
    with open(out_path, "w") as f:
        json.dump(pooled, f, indent=2)
    print(json.dumps({s: {"eff_raw": v["scaling_efficiency_8_to_32"],
                          "eff_corrected":
                              v["scaling_efficiency_overhead_corrected"],
                          "n_runs": {m: r["n_runs_pooled"]
                                     for m, r in v["results"].items()}}
                      for s, v in pooled["scenarios"].items()}, indent=1))


if __name__ == "__main__":
    main()
