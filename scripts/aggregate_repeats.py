"""Aggregate per-rep bench_scale JSONs (one JVM per query per rep) into
min/median/max distributions per query — the repeat-protocol readout
for SCALING.md / OPTIMIZATION_r11.md.

Usage: python scripts/aggregate_repeats.py <glob> [out.json]
       e.g. python scripts/aggregate_repeats.py '/root/repo/sf100_r11_rep*.json' BENCH_scale_sf100_r11.json
"""

from __future__ import annotations

import glob
import json
import statistics
import sys


def main() -> None:
    pattern = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else None
    per_query: dict[str, list[dict]] = {}
    files = sorted(glob.glob(pattern))
    for f in files:
        with open(f) as fh:
            d = json.load(fh)
        for q, m in d.get("queries", {}).items():
            per_query.setdefault(q, []).append(
                {
                    "file": f,
                    "sec": m["sec"],
                    "rows": m.get("rows"),
                    "shuffle_read_mb": m.get("shuffle_read_mb"),
                    "spill_disk_mb": m.get("spill_disk_mb"),
                }
            )
    summary = {}
    for q, reps in sorted(per_query.items()):
        secs = [r["sec"] for r in reps]
        rows = {r["rows"] for r in reps}
        summary[q] = {
            "n": len(secs),
            "min": min(secs),
            "median": statistics.median(secs),
            "max": max(secs),
            "rows_consistent": len(rows) == 1,
            "rows": sorted(rows),
            "max_spill_disk_mb": max(r["spill_disk_mb"] or 0 for r in reps),
            "max_shuffle_read_mb": max(r["shuffle_read_mb"] or 0 for r in reps),
            "reps": reps,
        }
        print(
            f"{q}: n={len(secs)} min={min(secs):.1f} med={statistics.median(secs):.1f} "
            f"max={max(secs):.1f} rows_consistent={len(rows)==1} "
            f"max_spill_disk={summary[q]['max_spill_disk_mb']:.0f}MB"
        )
    if out:
        with open(out, "w") as fh:
            json.dump({"pattern": pattern, "files": files, "queries": summary}, fh, indent=1)
        print(f"written {out}")


if __name__ == "__main__":
    main()
