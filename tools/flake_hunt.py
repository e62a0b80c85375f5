"""Root-cause harness for the one recorded flake (round-5 verdict
item 3): tests/test_dedup.py::test_ngram_jaccard_join failed ONCE with
an ArrowInvalid raised inside ray.data's HashShuffleAggregator while a
21-GB datagen ran concurrently (NOTES.md round-4 flake note); it
passes in isolation and in every full-suite run since.

This harness reproduces the original conditions deliberately: it runs
the ngram-jaccard join query N times back-to-back while a MEMORY HOG
subprocess cycles ~EAT_GB of touched RAM and streams throwaway disk
writes (the datagen's two pressure vectors). Every failure is recorded
with its full traceback. Exit is one JSON line:
``{"runs": N, "failures": [...], "consecutive_green": M}``.

Usage:
    python tools/flake_hunt.py [--runs 20] [--eat-gb 40] [--num-cpus 16]
"""

import argparse
import json
import os
import subprocess
import sys
import time
import traceback

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")).rstrip(os.pathsep)

_HOG = r"""
import numpy as np, os, sys, time
eat_gb = float(sys.argv[1])
chunk = np.empty(0)
scratch = "/tmp/gush_flake_scratch.bin"
while True:
    # touch the pages so the RSS is real, then release and re-allocate
    # (churn stresses the allocator + forces object-store spills)
    chunk = np.ones(int(eat_gb * (1 << 30) / 8), dtype=np.float64)
    chunk[:: 4096 // 8] = 2.0
    with open(scratch, "wb") as f:
        f.write(b"\x00" * (1 << 28))  # 256 MB write burst
    os.remove(scratch)
    del chunk
    time.sleep(0.2)
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=20)
    ap.add_argument("--eat-gb", type=float, default=40.0)
    ap.add_argument("--num-cpus", type=int, default=16)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entry

    q = entry.queries()["ngram_jaccard"]

    hog = subprocess.Popen([sys.executable, "-c", _HOG,
                            str(args.eat_gb)],
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
    failures = []
    greens = 0
    try:
        for i in range(args.runs):
            t0 = time.perf_counter()
            try:
                res = q(args.sf_dir)
                n = len(res) if hasattr(res, "__len__") else \
                    res.count()
                greens += 1
                print(f"# run {i}: green rows={n} "
                      f"{time.perf_counter() - t0:.1f}s",
                      file=sys.stderr)
            except Exception:
                tb = traceback.format_exc()
                failures.append({"run": i, "traceback": tb[-4000:]})
                greens = 0
                print(f"# run {i}: FAILED\n{tb}", file=sys.stderr)
    finally:
        hog.kill()
        try:
            os.remove("/tmp/gush_flake_scratch.bin")
        except FileNotFoundError:
            pass
    print(json.dumps({"metric": "ngram_jaccard_flake_hunt",
                      "runs": args.runs, "eat_gb": args.eat_gb,
                      "num_cpus": args.num_cpus,
                      "failures": failures,
                      "consecutive_green": greens}))
    ray.shutdown()
    return 0 if not failures else 1


if __name__ == "__main__":
    raise SystemExit(main())
