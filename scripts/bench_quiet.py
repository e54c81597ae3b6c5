"""Load-gated bench runner: the shared host bursts for minutes at a
time every ~20-30 min (observed loadavg 0.2 -> 4.5 swings), and a
suite run that straddles a burst is noise no matter how careful the
protocol (bench.py's in-artifact controls PROVE the contamination but
cannot remove it).  This wrapper waits for a quiet 1-min loadavg,
runs bench.py, and accepts the artifact only if its own verdict is
clean (control_ratio <= the gate and no burst_suspect queries);
otherwise it waits and retries.

Usage: python scripts/bench_quiet.py [--attempts 6] [--load 0.7]
           [--ratio 1.3] [--out BENCH_quiet.json]
Exit 0 with the accepted JSON written to --out (and echoed); exit 1
if every attempt was dirty (the LAST artifact is still written, its
controls flagging why).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def loadavg1() -> float:
    return float(open("/proc/loadavg").read().split()[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--attempts", type=int, default=6)
    ap.add_argument("--load", type=float, default=0.7)
    ap.add_argument("--ratio", type=float, default=1.3)
    ap.add_argument("--control-abs", type=float, default=0.30,
                    help="reject if the FASTEST zero-Spark control "
                    "probe exceeds this many seconds — a sustained "
                    "co-tenant load inflates all probes uniformly, "
                    "which control_ratio alone cannot see (quiet-host "
                    "reference: ~0.12 s at 8 procs; review finding)")
    ap.add_argument("--wait-max", type=int, default=900,
                    help="max seconds to wait for a quiet load per attempt")
    ap.add_argument("--out", default="BENCH_quiet.json")
    args = ap.parse_args()

    last = None
    for attempt in range(1, args.attempts + 1):
        waited = 0
        while loadavg1() > args.load and waited < args.wait_max:
            time.sleep(30)
            waited += 30
        print(f"attempt {attempt}: loadavg {loadavg1():.2f} "
              f"after {waited}s wait", flush=True)
        p = subprocess.run([sys.executable, str(REPO / "bench.py")],
                           capture_output=True, text=True,
                           env=dict(os.environ), cwd=str(REPO))
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
        try:
            art = json.loads(line)
        except Exception:
            print(f"attempt {attempt}: bench failed rc={p.returncode}\n"
                  f"{p.stderr[-2000:]}", flush=True)
            continue
        last = art
        clean = (art["control_ratio"] <= args.ratio
                 and not art["burst_suspect"]
                 and min(art["control_sec"]) <= args.control_abs)
        print(f"attempt {attempt}: control_ratio="
              f"{art['control_ratio']}, controls={art['control_sec']}"
              f" (abs gate {args.control_abs}), "
              f"suspects={art['burst_suspect']}"
              f" -> {'ACCEPT' if clean else 'retry'}", flush=True)
        if clean:
            Path(args.out).write_text(json.dumps(art))
            print(json.dumps(art))
            return 0
    if last is not None:
        Path(args.out).write_text(json.dumps(last))
        print(json.dumps(last))
    print("no clean window found; last artifact retained "
          "(its controls say why)", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
