"""Build the external-validity resource-accounting table for a
two-leg cluster-mode scaling run (r4 verdict ask 2: when single-box
RAM is the efficiency ceiling, publish the per-leg resource profile
that lets a reader project real-cluster efficiency from single-box
data).

Inputs:
  driver_log  lines "LO_START <epoch>" / "LO_END <epoch> ..." etc.
  sys_log     10 s samples: epoch MemAvailable(kB) Cached(kB) Dirty(kB)
              pgpgin(cum pages) pgpgout(cum pages)
  lo/hi JSON  the per-leg scaling_bench output (superstep secs, edges)

Output: one JSON blob with, per leg: steady sec/superstep, min
MemAvailable, mean page-cache size, paged-in/out GB during the leg's
STEADY window (second half, to skip datagen), and GB paged per
superstep — the number that transfers: a real 4-node cluster has 4×
this RAM and 4× the NVMe lanes, so the hi leg's per-node paging load
is lo-leg-like, not 4×.

Usage: python tools/scaling_accounting.py driver.log sys.log lo.json hi.json
"""

from __future__ import annotations

import json
import statistics
import sys


def parse_windows(driver_log: str) -> dict[str, tuple[int, int]]:
    marks: dict[str, int] = {}
    for line in open(driver_log):
        parts = line.split()
        if parts and parts[0] in ("LO_START", "LO_END", "HI_START", "HI_END"):
            marks[parts[0]] = int(parts[1])
    return {
        "lo": (marks["LO_START"], marks["LO_END"]),
        "hi": (marks["HI_START"], marks["HI_END"]),
    }


def leg_stats(sys_log: str, t0: int, t1: int, leg_json: dict) -> dict:
    rows = []
    for line in open(sys_log):
        p = line.split()
        if len(p) != 6:
            continue
        ts = int(p[0])
        if t0 <= ts <= t1:
            rows.append([ts] + [int(x) for x in p[1:]])
    if not rows:
        return {}
    # steady window = second half of the leg (skips datagen + warm-up)
    half = rows[len(rows) // 2:]
    pg_in_gb = (half[-1][4] - half[0][4]) * 4096 / 1e9
    pg_out_gb = (half[-1][5] - half[0][5]) * 4096 / 1e9
    steady_sec = half[-1][0] - half[0][0]
    secs = leg_json.get("superstep_secs", [])
    steady_superstep = statistics.median(secs[len(secs) // 2:]) if secs else None
    return {
        "steady_sec_per_superstep": steady_superstep,
        "edges_per_sec_per_superstep": leg_json.get("edges_per_sec_per_superstep"),
        "min_mem_available_gb": round(min(r[1] for r in rows) / 1e6, 1),
        "mean_page_cache_gb": round(statistics.mean(r[2] for r in half) / 1e6, 1),
        "paged_in_gb_steady": round(pg_in_gb, 1),
        "paged_out_gb_steady": round(pg_out_gb, 1),
        "paged_gb_per_superstep": round(
            (pg_in_gb + pg_out_gb) / max(1e-9, steady_sec / steady_superstep), 1
        ) if steady_superstep else None,
    }


def main() -> None:
    driver_log, sys_log, lo_path, hi_path = sys.argv[1:5]
    win = parse_windows(driver_log)
    lo = json.loads(open(lo_path).read().strip().splitlines()[-1])
    hi = json.loads(open(hi_path).read().strip().splitlines()[-1])
    eff = (hi["edges_per_sec_per_superstep"] / lo["edges_per_sec_per_superstep"]) / (
        hi["cpus"] / lo["cpus"]
    )
    eff_min = (lo["min_sec_per_superstep"] / hi["min_sec_per_superstep"]) / (
        hi["cpus"] / lo["cpus"]
    )
    out = {
        "job": hi.get("mode"),
        "n_edges": hi.get("n_edges"),
        "lo": {**leg_stats(sys_log, *win["lo"], lo), "master": lo.get("master")},
        "hi": {**leg_stats(sys_log, *win["hi"], hi), "master": hi.get("master")},
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_min": round(eff_min, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
