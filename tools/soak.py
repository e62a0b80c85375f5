"""Long-stream driver-memory soak: many TINY epochs to isolate the
driver's per-epoch memory cost from data volume.

The headroom runs (BENCH/BASELINE.md) showed driver RSS growing
~8-16 MB per epoch on 3M-row epochs. If that growth were proportional
to data, a long-running continuous job would be in trouble; if it is
per-epoch-constant Ray bookkeeping (submitted-task lineage, ref
accounting), it is bounded by Ray's own lineage cap
(RAY_max_lineage_bytes, 1 GiB default) and irrelevant at any realistic
epoch cadence. This soak distinguishes the two: N epochs of ~200 rows
each — any data-proportional term is ~zero, so the measured slope IS
the bookkeeping term, directly comparable to the headroom slope.

Prints one JSON line: RSS at quartile milestones, MB/epoch slope over
the first and second halves (a flattening second half = bounded), fsck.

Usage:
    python tools/soak.py [--epochs 200] [--urls 30000] [--num-cpus 8] \
        [--partitions 4]
"""

import argparse
import json
import os
import shutil
import sys
import threading
import time
import uuid

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")).rstrip(os.pathsep)


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--urls", type=int, default=30_000)
    ap.add_argument("--num-cpus", type=int, default=8)
    ap.add_argument("--partitions", type=int, default=4)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from gush_ray.datagen import gen_dim_sites, write_pages_dir
    from gush_ray.fsck import audit
    from gush_ray.pipelines.epoch_loop import StreamingJob

    pages_dir = (f"/tmp/gush_soak_pages/u{args.urls}_s99"
                 f"_e{args.epochs}_v1")
    if not os.path.exists(os.path.join(pages_dir, "_COMPLETE")):
        shutil.rmtree(pages_dir, ignore_errors=True)
        write_pages_dir(pages_dir, n_urls=args.urls, seed=99,
                        n_epochs=args.epochs)
        with open(os.path.join(pages_dir, "_COMPLETE"), "w") as f:
            f.write("ok")

    out_dir = f"/tmp/gush_soak/{uuid.uuid4().hex}"
    dim = gen_dim_sites(max(4, args.urls // 20)).to_pandas()
    job = StreamingJob(
        pages_dir, out_dir, run_id=uuid.uuid4().hex,
        num_partitions=args.partitions, dim_df=dim)

    # per-COMMITTED-epoch RSS: poll the manifest dir so each sample is
    # attributable to an epoch count, not wall time
    man_dir = os.path.join(out_dir, "_manifest")
    series: list[tuple[int, float]] = []  # (committed_epochs, rss_mb)
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            try:
                n = len([f for f in os.listdir(man_dir)
                         if f.startswith("epoch=")])
            except FileNotFoundError:
                n = 0
            series.append((n, rss_mb()))
            stop.wait(0.25)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    t0 = time.perf_counter()
    job.run()
    wall = time.perf_counter() - t0
    stop.set()
    th.join(2)

    # last sample seen at each epoch count = RSS after that commit
    at_epoch: dict[int, float] = {}
    for n, r in series:
        at_epoch[n] = r
    epochs = sorted(at_epoch)
    E = epochs[-1] if epochs else 0

    def slope(lo_frac, hi_frac):
        lo = [e for e in epochs if e >= E * lo_frac]
        hi = [e for e in epochs if e >= E * hi_frac]
        if not lo or not hi or lo[0] == hi[0]:
            return None
        return round((at_epoch[hi[0]] - at_epoch[lo[0]])
                     / max(1, hi[0] - lo[0]), 3)

    fsck = audit(out_dir)
    report = {
        "metric": "driver_rss_soak",
        "epochs": E,
        "urls": args.urls,
        "num_cpus": args.num_cpus,
        "partitions": args.partitions,
        "sec": round(wall, 1),
        "rss_mb_at": {str(int(E * f)): at_epoch.get(
            min(epochs, key=lambda e: abs(e - E * f)) if epochs else 0)
            for f in (0.05, 0.25, 0.5, 0.75, 1.0)},
        "mb_per_epoch_first_half": slope(0.05, 0.5),
        "mb_per_epoch_second_half": slope(0.5, 1.0),
        "fsck_ok": bool(fsck["ok"] and not fsck["problems"]),
    }
    print(json.dumps(report))
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
