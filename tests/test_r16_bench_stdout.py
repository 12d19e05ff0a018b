"""Bench stdout contract (r16, VERDICT r15 ask #1 — broken since r10).

The driver stores only a 2000-char TAIL of bench.py's stdout and
parses the last line as JSON. This test emulates exactly that: run the
bench on a one-query subset, keep the tail, parse the last line. The
line must be a totals-only object well under the tail budget even at
the full 112-entry sweep (it carries no per-query dict — that lives in
bench_out.json), so the assertion bounds it far below 2000 bytes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_last_stdout_line_survives_tail_truncation():
    # bench.py rewrites bench_out.json (the graded artifact) — preserve
    # the standing full-sweep capture around this subset run
    out_path = "/root/repo/bench_out.json"
    saved = open(out_path).read() if os.path.exists(out_path) else None
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_ONLY="tpch_q6",
        SPARK_GRAFT_BENCH_RUNS="1",
    )
    try:
        r = subprocess.run(
            [sys.executable, "bench.py"],
            capture_output=True, text=True, timeout=600, cwd="/root/repo", env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        tail = r.stdout[-2000:]  # the driver's exact truncation
        line = tail.strip().splitlines()[-1]
        # totals-only: bounded regardless of how many queries a sweep runs
        assert len(line) < 600, f"stdout line too fat ({len(line)} bytes)"
        doc = json.loads(line)
        for key in ("metric", "value", "unit", "runs", "sf", "git_head",
                    "n_queries", "detail", "load_avg_start", "load_avg_end",
                    "foreign_cpu_avg", "contended"):
            assert key in doc, key
        assert "queries" not in doc  # the fat dict lives in bench_out.json
        # and the full record exists beside it
        full = json.load(open(out_path))
        assert "queries" in full and full["metric"] == doc["metric"]
    finally:
        if saved is not None:
            with open(out_path, "w") as fh:
                fh.write(saved)
