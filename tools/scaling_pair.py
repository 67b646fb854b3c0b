"""Window-audited N->4N scaling pairs.

The sandbox's memory-bus grant swings 3-7x between minutes (see
BENCH/BASELINE.md "What bounds this"), so a single 8c/32c pair measures the
host's mood as much as the job. This harness makes pair selection
auditable instead of anecdotal: every crawl run is BRACKETED by a
bandwidth probe (the dominant noise source), pairs alternate run order to
cancel drift, and each pair is emitted with its probe readings and a
`window_consistent` verdict (all bracketing probes within --tolerance of
each other). Efficiency is then quoted from window-consistent pairs only —
degraded pairs are excluded on probe evidence, not on outcome.

Usage:
  python tools/scaling_pair.py --pairs 3 [-- <run_crawl args>]

Flags after `--` go verbatim to bench/run_crawl.py and REPLACE the default
config entirely (so a partial override never silently mixes configs):
  python tools/scaling_pair.py --pairs 2 -- --body-repeat 150 \
      --outdeg-max 25 --bucketed --buckets 128 --bloom --broadcast false \
      --rounds 4

Prints one JSON line per pair plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from cpu_ceiling import _bw_worker, measure  # noqa: E402

REPO = Path(__file__).resolve().parent.parent


def bw_probe(procs: int = 8, secs: float = 3.0) -> float:
    """Aggregate memory-bus GB/s at a fixed process count — the window
    indicator (absolute level, not a ratio)."""
    return measure(procs, secs, _bw_worker) * 128 / 1024


def run_crawl(cpus: int, extra: list[str]) -> dict:
    cmd = [
        sys.executable,
        str(REPO / "bench" / "run_crawl.py"),
        "--cpus",
        str(cpus),
        *extra,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--n1", type=int, default=8)
    ap.add_argument("--n2", type=int, default=32)
    ap.add_argument(
        "--tolerance",
        type=float,
        default=1.5,
        help="max/min ratio across a pair's three bracketing probes for "
        "the pair to count as window-consistent",
    )
    ap.add_argument("run_args", nargs="*", help="forwarded to run_crawl.py")
    args = ap.parse_args()
    extra = args.run_args or [
        "--body-repeat", "150", "--outdeg-max", "25",
        "--bucketed", "--buckets", "128", "--bloom", "--broadcast", "false",
    ]

    ratio = args.n2 / args.n1
    records = []
    for i in range(args.pairs):
        order = (
            [args.n1, args.n2] if i % 2 == 0 else [args.n2, args.n1]
        )  # alternate to cancel monotone drift
        probes = [bw_probe()]
        sizes = {}
        for cpus in order:
            sizes[cpus] = run_crawl(cpus, extra)
            probes.append(bw_probe())
        t1 = sizes[args.n1]["urls_per_sec_steady"]
        t2 = sizes[args.n2]["urls_per_sec_steady"]
        rec = {
            "pair": i + 1,
            "order": order,
            "bw_probes_gbps": [round(p, 1) for p in probes],
            "window_consistent": max(probes) / min(probes) <= args.tolerance,
            "host": {c: sizes[c].get("host") for c in order},
            f"steady_{args.n1}c": t1,
            f"steady_{args.n2}c": t2,
            "speedup": round(t2 / t1, 3),
            "efficiency": round(t2 / t1 / ratio, 3),
            "ts": round(time.time()),
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)

    ok = [r for r in records if r["window_consistent"]]
    effs = sorted(r["efficiency"] for r in ok)
    print(
        json.dumps(
            {
                "summary": True,
                "pairs": len(records),
                "window_consistent_pairs": len(ok),
                "efficiencies_consistent": effs,
                "median_efficiency_consistent": round(statistics.median(effs), 3)
                if effs
                else None,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
