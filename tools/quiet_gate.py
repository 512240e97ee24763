"""Run a command only inside a quiet host window (r14 measurement aid).

Usage: python tools/quiet_gate.py [--thresh 0.11] [--max-wait 1800] -- cmd ...
Polls the BASELINE.md gemm calibration probe (min-of-5 2048^2 float64
matmul) until it lands under --thresh (default 0.11 s, the committed
quiet window's upper edge plus slack), then execs the command. Exits 3
if the host never goes quiet within --max-wait seconds, so a caller can
tell "no sample" from "bad sample". The same probe brackets bench.py
samples; this gate just saves burning a 6-minute bench run on a window
the probe would reject anyway.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time


def gemm_min() -> float:
    import numpy as np

    m = np.random.default_rng(0).random((2048, 2048))
    reps = []
    for _ in range(5):
        t0 = time.time()
        m @ m
        reps.append(time.time() - t0)
    return min(reps)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--thresh", type=float, default=0.11)
    ap.add_argument("--max-wait", type=float, default=1800)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    deadline = time.time() + args.max_wait
    while True:
        g = gemm_min()
        print(f"quiet_gate: gemm min {g:.3f}", file=sys.stderr, flush=True)
        if g < args.thresh:
            break
        if time.time() > deadline:
            print("quiet_gate: host never went quiet", file=sys.stderr)
            sys.exit(3)
        time.sleep(45)
    sys.exit(subprocess.call(cmd))


if __name__ == "__main__":
    main()
