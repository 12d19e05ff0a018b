"""Mechanical bar check: every bench entry with a standing bar in
BASELINE.md must land under it in bench_out.json.

Bars are any markdown table row whose first cell names a bench entry
and whose cells include "≤ N s" (or "<= N s"). When an entry is
re-banded in a later section, the LAST occurrence wins (the re-band
sections explicitly supersede — r11 hcs_stream_write precedent).

Usage: python tools/check_bars.py [bench_out.json] [BASELINE.md]
Exit 0 = all entries under their bars; 1 = violations (listed).

Green entries consuming ≥ MARGIN_WATCH of their bar are listed as
"margin watch" (VERDICT r17 ask #6: pixel_jobs sat at 21.9/24 — green,
but one more round of box drift trips it; surfacing the shrinking
margin each round is cheaper than re-running the attribution protocol
after the trip).
"""

from __future__ import annotations

import json
import os
import re
import sys


def parse_bars(baseline_path: str) -> dict[str, float]:
    bars: dict[str, float] = {}
    for line in open(baseline_path):
        if not line.lstrip().startswith("|"):
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) < 2:
            continue
        name = cells[0].strip("`* ")
        # dots allow namespaced sub-phase bars (hcs_stream_write.pixel_jobs)
        if not re.fullmatch(r"[a-z0-9_.]+", name):
            continue
        for c in cells[1:]:
            m = re.search(r"(?:≤|<=)\s*([0-9.]+)\s*s", c)
            if m:
                bars[name] = float(m.group(1))  # last occurrence wins
                break
    return bars


MARGIN_WATCH = 0.85  # green entries at >= this fraction of their bar


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(here, "bench_out.json")
    baseline_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(here, "BASELINE.md")
    bench = json.load(open(bench_path))
    queries = bench.get("queries", {})
    bars = parse_bars(baseline_path)
    checked, violations, unbarred, watch = 0, [], [], []
    for name, sec in queries.items():
        if name in bars:
            checked += 1
            if sec > bars[name]:
                violations.append((name, sec, bars[name]))
            elif sec >= MARGIN_WATCH * bars[name]:
                watch.append((name, sec, bars[name]))
        else:
            unbarred.append(name)
    missing = sorted(set(bars) - set(queries))
    print(
        f"bars checked: {checked}; under-bar: {checked - len(violations)}; "
        f"violations: {len(violations)}; entries without a bar: {len(unbarred)}; "
        f"barred-but-not-benched: {len(missing)}"
    )
    if bench.get("contended"):
        print(f"WARNING: capture was contended (load {bench.get('load_avg_start')})")
    stamps = bench.get("entry_stamps", {})
    if violations:
        # capture-level stamps up front so a violation is judged in
        # context (r17 ask #2: the r17 sweep passed the guard by 2%)
        print(
            "  capture: load_avg_start={} load_avg_end={} foreign_cpu_avg={}".format(
                bench.get("load_avg_start"),
                bench.get("load_avg_end"),
                bench.get("foreign_cpu_avg"),
            )
        )
    for name, sec, bar in sorted(violations, key=lambda v: v[1] / v[2], reverse=True):
        st = stamps.get(name) or stamps.get(name.split(".", 1)[0])
        ctx = (
            "  [t_start={t_start}s wall={wall}s foreign_cpu={foreign_cpu}]".format(**st)
            if st
            else ""
        )
        print(f"  VIOLATION {name}: {sec:.3f}s > {bar}s bar{ctx}")
    for name, sec, bar in sorted(watch, key=lambda v: v[1] / v[2], reverse=True):
        print(
            f"  margin watch {name}: {sec:.3f}s is {sec / bar:.0%} of its "
            f"{bar}s bar"
        )
    if missing:
        print(f"  (barred entries missing from this capture: {missing})")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
