"""Latency-injected object-store run (round-5 verdict item 6): measure
how much S3-like PER-OPERATION latency the exactly-once pipeline
absorbs through task parallelism + the background committer.

Runs the SAME mid-size streaming job three times against the
``objstore://`` store (gush_ray/fakestore.py): injected per-op latency
0 ms, 50 ms, and 50 ms with a deeper commit queue. Reports wall times,
the impact ratio, and per-run output row counts (which must be
identical — the latency must never change results). One JSON line on
stdout; the measured row in BENCH/BASELINE.md is pasted from it.

Usage:
    python tools/objstore_latency.py [--urls 200000] [--epochs 4] \
        [--num-cpus 16] [--partitions 8] [--latency-ms 50]
"""

import argparse
import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")).rstrip(os.pathsep)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--urls", type=int, default=200_000)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--num-cpus", type=int, default=16)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--latency-ms", type=float, default=50.0)
    ap.add_argument("--jitter-ms", type=float, default=20.0)
    ap.add_argument("--pages-dir", default=None,
                    help="reuse an existing epoch-dir corpus (e.g. the "
                         "cached scaling corpus) instead of generating "
                         "one — the real-size-epoch measurement, where "
                         "per-epoch compute must hide the store's "
                         "per-op constant")
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from gush_ray.datagen import write_pages_dir
    from gush_ray.fakestore import set_latency
    from gush_ray.fsck import audit
    from gush_ray.pipelines.epoch_loop import StreamingJob

    if args.pages_dir:
        pages = args.pages_dir
    else:
        pages = f"/tmp/gush_oslat/pages_u{args.urls}_e{args.epochs}"
        if not os.path.exists(os.path.join(pages, "epoch=0000")):
            write_pages_dir(pages, n_urls=args.urls, seed=17,
                            n_epochs=args.epochs)

    def run(tag: str, ms: float, depth: int) -> dict:
        out_root = f"/tmp/gush_oslat/{tag}"
        shutil.rmtree(out_root, ignore_errors=True)
        out = f"objstore://{out_root}/out"
        set_latency(ms if ms else None, jitter_ms=args.jitter_ms)
        try:
            job = StreamingJob(pages, out, run_id=f"oslat-{tag}",
                               num_partitions=args.partitions,
                               commit_queue_depth=depth)
            t0 = time.perf_counter()
            job.run()
            wall = time.perf_counter() - t0
        finally:
            set_latency(None)
        rep = audit(out)
        rows = len(job.read_output("changes"))
        return {"wall_s": round(wall, 2), "changes_rows": rows,
                "fsck_ok": bool(rep["ok"] and not rep["problems"]),
                "latency_ms": ms, "commit_queue_depth": depth}

    # warm (cache pages + ray workers), untimed
    run("warm", 0, 2)
    base = run("lat0", 0, 2)
    lat = run("lat", args.latency_ms, 2)
    deep = run("lat_deep", args.latency_ms, 6)
    report = {
        "metric": "objstore_latency_absorption",
        "urls": args.urls, "epochs": args.epochs,
        "num_cpus": args.num_cpus, "partitions": args.partitions,
        "jitter_ms": args.jitter_ms,
        "base": base, "latency": lat, "latency_deep_queue": deep,
        "impact_ratio": round(lat["wall_s"] / base["wall_s"], 3),
        "impact_ratio_deep_queue": round(deep["wall_s"] / base["wall_s"],
                                         3),
        "rows_identical": (base["changes_rows"] == lat["changes_rows"]
                           == deep["changes_rows"]),
    }
    print(json.dumps(report))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
