"""Pure-CPU scaling ceiling of THIS machine (no Spark): N independent
python processes each run an identical fixed CPU-bound workload; aggregate
throughput at two process counts bounds what ANY job can achieve when
"cluster size" is simulated with local[N] on shared silicon (SMT, shared
memory bus, host capping, CPU steal).

Used by BENCH/BASELINE.md to normalize the crawl job's N->4N efficiency:
  machine_relative = job_speedup / ceiling_speedup.

Usage: python tools/cpu_ceiling.py [--n1 8] [--n2 32] [--secs 6]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing as mp
import time


def _cpu_worker(barrier, secs: float, out):
    h = b"x" * 4096
    barrier.wait()  # setup (fork, import) outside the measured window
    t0 = time.monotonic()
    stop_at = t0 + secs
    n = 0
    while time.monotonic() < stop_at:
        h = hashlib.sha256(h).digest() * 128  # CPU-bound, cache-resident
        n += 1
    out.put(n / (time.monotonic() - t0))


def _bw_worker(barrier, secs: float, out):
    import numpy as np

    buf = np.frombuffer(np.random.bytes(64 * 1024 * 1024), dtype=np.uint8)
    barrier.wait()  # the 64 MB buffer build must NOT be in the window
    t0 = time.monotonic()
    stop_at = t0 + secs
    n = 0
    while time.monotonic() < stop_at:
        buf.copy()  # 64 MB read + 64 MB write — memory-bus bound
        n += 1
    out.put(n / (time.monotonic() - t0))


def _disk_worker(barrier, secs: float, out):
    """fsync'd write throughput — the resource snapshot/spill writes ride.
    Each worker overwrites ONE 8 MB region of its own /tmp file with fsync
    per iteration (bounded space: n_procs x 8 MB total), so the number is
    the virtio device grant, not the page cache. Always puts a result —
    a worker that dies otherwise deadlocks the parent's queue.get."""
    import os
    import tempfile

    chunk = b"\xa5" * (8 * 1024 * 1024)
    n = 0
    t0 = None
    try:
        # barrier FIRST: a worker whose mkstemp fails must not strand the
        # others at the rendezvous for the full timeout
        barrier.wait(timeout=60)
        t0 = time.monotonic()
        # dir pinned to /tmp — the device checkpoint.py's spill/snapshot
        # writes actually ride; honoring $TMPDIR could measure a different
        # mount (e.g. tmpfs) and corrupt the ceiling
        fd, path = tempfile.mkstemp(prefix="diskprobe_", dir="/tmp")
        try:
            stop_at = t0 + secs
            while time.monotonic() < stop_at:
                os.lseek(fd, 0, os.SEEK_SET)
                os.write(fd, chunk)
                os.fsync(fd)
                n += 1
        finally:
            os.close(fd)
            os.unlink(path)
    finally:
        elapsed = (time.monotonic() - t0) if t0 else secs
        out.put(n / elapsed)  # 8 MB ops/sec; 0 marks a failed worker


def measure(procs: int, secs: float, worker=_cpu_worker) -> float:
    """Aggregate ops/sec of `procs` identical workers. Workers rendezvous
    on a barrier AFTER setup and each measures its own window — spawn
    serialization and buffer construction would otherwise eat a larger
    fraction of the window at the higher process count, biasing the
    ceiling (and every machine-relative number derived from it) downward."""
    out: mp.Queue = mp.Queue()
    barrier = mp.Barrier(procs)
    ps = [mp.Process(target=worker, args=(barrier, secs, out)) for _ in range(procs)]
    for p in ps:
        p.start()
    total = sum(out.get() for _ in ps)
    for p in ps:
        p.join()
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n1", type=int, default=8)
    ap.add_argument("--n2", type=int, default=32)
    ap.add_argument("--secs", type=float, default=6.0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--disk",
        action="store_true",
        help="also measure fsync'd disk-write throughput at both process "
        "counts (off by default: it stresses the shared device)",
    )
    args = ap.parse_args()

    def median(worker):
        r1 = sorted(measure(args.n1, args.secs, worker) for _ in range(args.reps))
        r2 = sorted(measure(args.n2, args.secs, worker) for _ in range(args.reps))
        return r1[len(r1) // 2], r2[len(r2) // 2]

    c1, c2 = median(_cpu_worker)
    b1, b2 = median(_bw_worker)
    ratio = args.n2 / args.n1
    result = {
        "n1": args.n1,
        "n2": args.n2,
        "cpu_speedup": round(c2 / c1, 3),
        "cpu_efficiency": round(c2 / c1 / ratio, 3),
        "bandwidth_mbps_n1": round(b1 * 128),
        "bandwidth_mbps_n2": round(b2 * 128),
        "bandwidth_speedup": round(b2 / b1, 3),
        "bandwidth_efficiency": round(b2 / b1 / ratio, 3),
    }
    if args.disk:
        d1, d2 = median(_disk_worker)
        result.update(
            {
                "disk_write_mbps_n1": round(d1 * 8),
                "disk_write_mbps_n2": round(d2 * 8),
                # d1 == 0 means every n1 worker failed (ENOSPC etc.) —
                # report null rather than crash away the cpu/bw results
                "disk_speedup": round(d2 / d1, 3) if d1 else None,
                "disk_efficiency": round(d2 / d1 / ratio, 3) if d1 else None,
            }
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
