"""Host telemetry for benchmark artifacts: /proc/stat CPU-share deltas.

This sandbox's hypervisor withholds cycles in multi-minute windows (steal)
and its virtio disk queues (iowait) — the two host effects every graded
benchmark number must carry so a depressed run is attributable from the
artifact itself. One shared implementation for every entry point
(bench.py, bench/run_crawl.py, tools/*): the field-order and
guest-jiffies-folding subtleties live in exactly one place.
"""

from __future__ import annotations


def proc_stat() -> list[int]:
    """The aggregate cpu line of /proc/stat (jiffies since boot)."""
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def host_telemetry(before: list[int], after: list[int]) -> dict:
    """CPU-time shares over the window between two proc_stat() samples:
    steal is the hypervisor withholding cycles, iowait the virtio-disk
    queue. Only the first 8 fields are summed — the kernel already folds
    guest/guest_nice into user/nice, so summing all 10 would double-count
    guest jiffies and deflate every percentage on a guest-running host.
    /proc/stat field order: user nice system idle iowait irq softirq
    steal [guest guest_nice]."""
    d = [a - b for a, b in zip(after, before)]
    total = sum(d[:8]) or 1
    return {
        "busy_pct": round(100 * (d[0] + d[1] + d[2]) / total, 1),
        "idle_pct": round(100 * d[3] / total, 1),
        "iowait_pct": round(100 * d[4] / total, 1),
        "steal_pct": round(100 * d[7] / total, 1) if len(d) > 7 else None,
    }
