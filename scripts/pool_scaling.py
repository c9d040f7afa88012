"""Pool N-vs-4N scaling samples across independent JVM sessions.

Round-2 lesson: single-session medians on this box swing with GC/JIT draws
(local[32] full-scenario runs span ~10-19 s), so the honest protocol pools
ALL post-warmup runs from every session of the same (scenario, master)
configuration and reports the pooled median — no run selection. This script
merges any number of scaling.json files (the current BENCH/scaling.json plus
saved copies of earlier sessions) and prints per-scenario pooled medians,
raw efficiency, and overhead-corrected efficiency (tiny-twin method:
t = o + W with the 1% tiny run pinning o).

Usage: python scripts/pool_scaling.py BENCH/scaling.json [more.json ...]
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    paths = sys.argv[1:] or ["BENCH/scaling.json"]
    sessions = [json.load(open(p)) for p in paths]
    n_rows = sessions[0]["n_rows"]
    out = {"n_rows": n_rows, "n_sessions": len(paths), "sources": paths, "scenarios": {}}
    scen_names = [s for s in sessions[0]["scenarios"]]
    for scen in scen_names:
        res = {}
        for master in ("local[8]", "local[32]"):
            runs, tiny = [], []
            for s in sessions:
                block = s["scenarios"].get(scen, {}).get("results", {}).get(master)
                if not block:
                    continue
                runs += [r["sec"] for r in block["runs"]]
                tiny.append(block.get("tiny_median_sec"))
            tiny = [t for t in tiny if t is not None]
            med = statistics.median(runs)
            med_t = statistics.median(tiny) if tiny else 0.0
            frac = sessions[0].get("n_tiny", 0) / n_rows
            work = max((med - med_t) / (1.0 - frac), 1e-9)
            res[master] = {
                "pooled_median_sec": round(med, 3),
                "n_runs_pooled": len(runs),
                "min_sec": round(min(runs), 3),
                "max_sec": round(max(runs), 3),
                "tiny_median_sec": round(med_t, 3),
                "work_sec": round(work, 3),
                "rows_per_sec": round(n_rows / med, 1),
            }
        eff = (res["local[8]"]["pooled_median_sec"]
               / res["local[32]"]["pooled_median_sec"]) / 4.0
        eff_c = res["local[8]"]["work_sec"] / res["local[32]"]["work_sec"] / 4.0
        out["scenarios"][scen] = {
            "results": res,
            "scaling_efficiency_8_to_32": round(eff, 3),
            "scaling_efficiency_overhead_corrected": round(eff_c, 3),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
