"""Three-point overhead fit for the scaling efficiency (VERDICT r5 #8).

Model: t(f) = o + f * W per (scenario, master), fitted by least squares
over the POOLED medians at input fractions f = 0.01 (tiny twin),
0.10 (mid twin), 1.00 (full). Reports o, W, the fit residual at each
point, and the overhead-corrected efficiency (W_8 / W_32) / 4 alongside
the raw one. Replaces the tiny-twin-only model (o := t(0.01)), whose
single noisy point produced the round-5 compute failure (o overestimated
by a 30 s session outlier) and round-6a's corrected eff > 1.

Monotonicity guard: under the model with W > 0, t(f) must increase with
f. A tiny-twin median READING ABOVE the 10x-larger mid twin (observed at
[4,8]: tiny 16.2 s vs mid 6.8 s) is physically impossible under the
model — the tiny point is contaminated (4 executor JVMs' spin-up and
scheduling noise is the same magnitude as its total work). Such points
are DROPPED, the fit falls back to the exact 2-point solve through
(mid, full), and the rejection is recorded in the artifact.

Usage:
  python scripts/fit_overhead.py pooled.json midtwin.json [out.json]
where pooled.json is pool_localcluster.py output (full + tiny medians)
and midtwin.json is scripts/scaling_midtwin.py output.
"""

from __future__ import annotations

import json
import sys


def lsq(points):  # [(f, t)] -> (o, W, residuals)
    n = len(points)
    sf = sum(f for f, _ in points)
    st = sum(t for _, t in points)
    sff = sum(f * f for f, _ in points)
    sft = sum(f * t for f, t in points)
    den = n * sff - sf * sf
    w = (n * sft - sf * st) / den
    o = (st - w * sf) / n
    resid = {f: round(o + w * f - t, 3) for f, t in points}
    return o, w, resid


def main() -> None:
    pooled = json.load(open(sys.argv[1]))
    mid = json.load(open(sys.argv[2]))
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH/scaling_fit.json"
    frac_tiny = pooled["n_tiny"] / pooled["n_rows"]
    frac_mid = mid["fraction"]
    out = {"model": "t(f) = o + f*W, least squares over f in "
                    f"[{frac_tiny}, {frac_mid}, 1.0] pooled medians",
           "scenarios": {}}
    for scen, sblock in pooled["scenarios"].items():
        masters = list(sblock["results"])
        fit = {}
        for master in masters:
            r = sblock["results"][master]
            t_mid = mid["scenarios"][scen]["results"][master]["median_sec"]
            pts = [(frac_tiny, r["tiny_median_sec"]),
                   (frac_mid, t_mid),
                   (1.0, r["pooled_median_sec"])]
            # monotonicity guard: drop any point whose median reads above
            # a larger-fraction point's (keep the largest fractions —
            # they carry the most work and the least relative noise)
            kept, dropped = [], []
            for i, (f, t) in enumerate(pts):
                if any(t > t2 for f2, t2 in pts[i + 1:]):
                    dropped.append([f, t])
                else:
                    kept.append((f, t))
            if len(kept) >= 2:
                o, w, resid = lsq(kept)
            else:  # degenerate: only the full point survived — no model
                o, w, resid = 0.0, kept[0][1], {}
            o = max(o, 0.0)
            fit[master] = {"o_sec": round(o, 3), "W_sec": round(w, 3),
                           "points_f_t": pts, "residual_sec": resid,
                           "dropped_nonmonotone_f_t": dropped}
        m8, m32 = masters[0], masters[1]
        eff_raw = sblock["scaling_efficiency_8_to_32"]
        eff_fit = (fit[m8]["W_sec"] / fit[m32]["W_sec"]) / 4.0
        out["scenarios"][scen] = {
            "fit": fit,
            "scaling_efficiency_raw": eff_raw,
            "scaling_efficiency_fit_corrected": round(eff_fit, 3),
            "tinytwin_corrected_for_comparison":
                sblock["scaling_efficiency_overhead_corrected"],
        }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({s: {"raw": v["scaling_efficiency_raw"],
                          "fit_corrected":
                              v["scaling_efficiency_fit_corrected"],
                          "o_sec": {m: v["fit"][m]["o_sec"]
                                    for m in v["fit"]}}
                      for s, v in out["scenarios"].items()}, indent=1))


if __name__ == "__main__":
    main()
