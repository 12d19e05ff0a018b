"""r17 (VERDICT r16 ask #2): the tightened bench idle guard.

The r16 sweep drifted ~25% on 68 code-untouched entries while the
start-only loadavg stamp (bar 4.0) read `contended=false`. The guard is
now two-sided: the start bar drops to 2.0 (solo captures on this box
start near ≤1.6), and a mid-run FOREIGN-CPU measure — system busy
cpu-seconds minus this process tree's own — catches contention that
begins after the start stamp. The bench saturating local[32] is its own
tree, so a solo full-box run reads ~0 foreign CPUs.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import bench


def test_bars_tightened():
    assert bench.LOAD_BAR == 2.0
    # above the ~1.7-CPU orphaned-worker-teardown floor a verified-solo
    # full sweep reads (two observations: 1.65/1.70), low enough to
    # catch a 3-CPU sub-battery contender
    assert bench.FOREIGN_CPU_BAR == 3.0


def test_system_busy_excludes_guest(monkeypatch):
    """guest/guest_nice are already folded into user/nice by the
    kernel — counting them again would inflate foreign on VM hosts."""
    import builtins
    import io

    # user nice system idle iowait irq softirq steal guest guest_nice
    line = "cpu  100 10 50 1000 20 5 5 10 77 33\n"
    real_open = builtins.open

    def fake_open(path, *a, **k):
        if path == "/proc/stat":
            return io.StringIO(line)
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", fake_open)
    # busy = 100+10+50+5+5+10 = 180 ticks (idle+iowait excluded,
    # guest 77/33 NOT double-counted)
    assert bench._system_busy_s() == 180 / bench._CLK_TCK


def test_proc_tree_cpu_counts_children():
    """A child process's burn shows up in the tree measure (the Spark
    JVM and Arrow workers are children of the bench driver)."""
    t0 = bench._proc_tree_cpu_s()
    assert t0 is not None and t0 >= 0
    child = subprocess.Popen(
        [sys.executable, "-c", "sum(i*i for i in range(30_000_000))"]
    )
    try:
        child.wait(timeout=120)
    finally:
        if child.poll() is None:
            child.kill()
    t1 = bench._proc_tree_cpu_s()
    assert t1 - t0 > 0.3, (t0, t1)


def test_foreign_excludes_own_tree():
    """CPU burned inside this process tree must NOT count as foreign:
    the foreign average over a window where the tree burns ~1 cpu-s is
    bounded by whatever the rest of the box is doing, not inflated by
    the burn itself."""
    s0, t0, w0 = bench._system_busy_s(), bench._proc_tree_cpu_s(), time.time()
    assert s0 is not None and t0 is not None
    sum(i * i for i in range(20_000_000))  # ~1 cpu-s in this process
    time.sleep(0.2)
    sys_d = bench._system_busy_s() - s0
    tree_d = bench._proc_tree_cpu_s() - t0
    foreign = bench._foreign_cpu_avg(s0, t0, w0)
    assert tree_d > 0.3  # the burn is attributed to the tree...
    assert foreign is not None and foreign >= 0
    # ...and subtracted from the system total (foreign ≈ sys − tree,
    # never sys alone)
    wall = time.time() - w0
    assert foreign <= (sys_d - tree_d) / wall + 0.01


def test_foreign_none_off_proc(monkeypatch):
    """Off-Linux (or /proc unreadable) the measure degrades to None and
    the contended verdict falls back to the start-load stamp."""
    monkeypatch.setattr(bench, "_system_busy_s", lambda: None)
    assert bench._foreign_cpu_avg(None, 1.0, time.time() - 1) is None
