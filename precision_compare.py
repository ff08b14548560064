"""f32-vs-f64 energy-trajectory comparison on the production engine.

Reads two collapse_run.py logs (an f32 lane and an f64 lane started from
the SAME checkpoint) and reports the relative energy disagreement
attributable to precision: both lanes integrate the same physics with the
same adaptive-dt scheme, so E(t) differences beyond the shared scheme
drift measure f32 roundoff (VERDICT r2 next-4; BASELINE.json's 1e-6
north star is scored on this comparison plus the committed full-collapse
gather-engine lane, BASELINE.md).

dt sequences differ microscopically between lanes, so E is compared on
the overlapping t-grid by linear interpolation of the f64 lane.

Usage: python precision_compare.py <f32_log.jsonl> <f64_log.jsonl>
"""

import json
import sys

import numpy as np


def load(path):
    """Parse a campaign log, keeping rows in step-resume order.

    collapse_run.py appends across crash-retries, so a log may contain
    several lanes (each restarting from an earlier checkpoint). Later
    rows supersede earlier ones at the same step: keep, per step number,
    the LAST row — that is the lane that actually continued — then sort
    by step. The result is strictly monotonic in t (np.interp needs it).
    """
    by_step = {}
    for line in open(path):
        r = json.loads(line)
        by_step[r["steps"]] = r
    rows = [by_step[s] for s in sorted(by_step)]
    t = np.asarray([r["t"] for r in rows])
    E = np.asarray([r["E"] for r in rows])
    contrast = np.asarray([r.get("contrast", 0.0) for r in rows])
    keep = np.ones(len(t), bool)
    keep[1:] = np.diff(t) > 0
    return t[keep], E[keep], contrast[keep]


def main():
    t32, E32, c32 = load(sys.argv[1])
    t64, E64, _ = load(sys.argv[2])
    t_lo = max(t32[0], t64[0])
    t_hi = min(t32[-1], t64[-1])
    sel = (t32 >= t_lo) & (t32 <= t_hi)
    if not sel.any():
        sys.exit("no overlapping t range")
    E64i = np.interp(t32[sel], t64, E64)
    rel = np.abs(E32[sel] - E64i) / np.abs(E64i)
    print(
        json.dumps(
            {
                "t_window": [float(t_lo), float(t_hi)],
                "n_points": int(sel.sum()),
                "contrast_range": [
                    float(c32[sel].min()),
                    float(c32[sel].max()),
                ],
                "max_rel_dE_f32_vs_f64": float(rel.max()),
                "median_rel_dE": float(np.median(rel)),
                "final_rel_dE": float(rel[-1]),
                "f64_scheme_drift_over_window": float(
                    abs((E64[-1] - E64[0]) / E64[0])
                ),
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
