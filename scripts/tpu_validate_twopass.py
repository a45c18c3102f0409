"""Queued TPU validation for the two-pass hat-matrix warp (run when the
axon relay is back: probe http://127.0.0.1:8103/health first).

Runs, one TPU job at a time (DEVNOTES: never two concurrently):
  1. bench.py --construction rectified --warp twopass   (new default path)
  2. bench.py --construction rectified --warp quad      (A/B baseline)
  3. bench_train.py                                     (training step rate)
Record results in BENCH_NOTES.md and update bench.py docstring numbers +
ROADMAP.md item 1b.
"""
import subprocess, sys, time

for cmd in (
    [sys.executable, "bench.py", "--construction", "rectified",
     "--warp", "twopass"],
    [sys.executable, "bench.py", "--construction", "rectified",
     "--warp", "quad"],
    [sys.executable, "bench_train.py"],
):
    print("=== RUN:", " ".join(cmd), flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, cwd="/root/repo")
    print(f"=== exit {r.returncode} in {time.time()-t0:.0f}s", flush=True)
    if r.returncode:
        sys.exit(r.returncode)
