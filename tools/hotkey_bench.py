"""Hot-key mitigation at scale (round-5): the chaos pin in
tests/test_window_combine.py proves output identity at fixture size;
this tool measures the WALL and load effect at millions of rows —
default keyed-exchange topology vs map-side-combined topology on the
same 30%-hot-key stream. One JSON line on stdout.

Usage:
    python tools/hotkey_bench.py [--rows-per-epoch 1500000] \
        [--epochs 4] [--hot-frac 0.3] [--num-cpus 32] [--partitions 16]
"""

import argparse
import json
import os
import shutil
import sys
import time
import uuid

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")).rstrip(os.pathsep)


def _gen(root: str, rows: int, epochs: int, hot_frac: float,
         seed: int = 97) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    langs = np.array(["en", "de", "fr", "pt", "es", "it"])
    for e in range(epochs):
        hot = rng.random(rows) < hot_frac
        urls = np.array(
            [f"https://x{i % 97}.org/p{e}_{i}" for i in range(rows)],
            dtype=object)
        urls[hot] = "https://hot.example.com/"
        # strictly increasing ts (sorted randoms + arange tie-break):
        # a (url, ts) collision would be replay-DEDUPED by the default
        # topology but counted by the arrival-semantics combined one —
        # the documented semantic difference; keeping the stream
        # collision-free makes the two topologies' window totals
        # comparable row-for-row
        ts = (np.int64(1_700_000_000_000_000)
              + np.int64(e) * 2_000_000_000
              + np.sort(rng.integers(0, 1_799_000_000, rows))
              + np.arange(rows, dtype=np.int64))
        tab = pa.table({
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "lang": pa.array(rng.choice(langs, rows)),
            "size": pa.array(
                rng.integers(100, 5000, rows).astype("float64")),
        })
        d = os.path.join(root, f"epoch={e:04d}")
        os.makedirs(d, exist_ok=True)
        # several shards per epoch so the map side parallelizes
        per = rows // 8
        for k in range(8):
            sh = tab.slice(k * per,
                           per if k < 7 else rows - 7 * per)
            pq.write_table(sh, os.path.join(d, f"part-{k:04d}.parquet"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-epoch", type=int, default=1_500_000)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--hot-frac", type=float, default=0.3)
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--partitions", type=int, default=16)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from gush_ray.pipelines.epoch_loop import StreamingJob
    from gush_ray.sinks.exactly_once import ExactlyOnceSink

    pages = (f"/tmp/gush_hotkey/pages_r{args.rows_per_epoch}"
             f"_e{args.epochs}_h{args.hot_frac:g}")
    if not os.path.exists(os.path.join(pages, "_COMPLETE")):
        _gen(pages, args.rows_per_epoch, args.epochs, args.hot_frac)
        open(os.path.join(pages, "_COMPLETE"), "w").write("ok")

    def run(tag: str, combine: bool) -> dict:
        out = f"/tmp/gush_hotkey/{tag}-{uuid.uuid4().hex[:8]}"
        job = StreamingJob(
            pages, out, run_id=tag, num_partitions=args.partitions,
            pattern=None, window_group_cols=("lang",),
            value_col="size", window_hll_p=12, window_combine=combine)
        t0 = time.perf_counter()
        job.run()
        wall = time.perf_counter() - t0
        sink = ExactlyOnceSink(out)
        tot: dict = {}
        imb = []
        for e in sink.committed_epochs():
            man = sink.read_manifest(e)
            for p in man["partitions"]:
                tot[p["partition_id"]] = (tot.get(p["partition_id"], 0)
                                          + p.get("rows_in", 0))
            if "skew" in man:
                imb.append(man["skew"]["imbalance"])
        w = job.read_output("windows")
        gsum = w.groupby(["lang", "window_id"])["n"].sum().sort_index()
        res = {
            "wall_s": round(wall, 2),
            "rows_per_sec": round(
                args.rows_per_epoch * args.epochs / wall, 1),
            "owner_rows_in": max(tot.values()),
            "mean_rows_in": round(sum(tot.values()) / len(tot), 1),
            "imbalance_max": max(imb) if imb else None,
            "windows_checksum": int(gsum.sum()),
            "windows_rows": int(len(gsum)),
        }
        shutil.rmtree(out, ignore_errors=True)
        return res

    run("warm", False)  # untimed cache/worker warmup
    d = run("default", False)
    c = run("combine", True)
    report = {
        "metric": "hotkey_combine_at_scale",
        "rows": args.rows_per_epoch * args.epochs,
        "hot_frac": args.hot_frac, "num_cpus": args.num_cpus,
        "partitions": args.partitions,
        "default": d, "combine": c,
        "owner_load_drop_x": round(d["owner_rows_in"]
                                   / max(c["owner_rows_in"], 1), 1),
        "speedup_x": round(d["wall_s"] / c["wall_s"], 2),
        "windows_identical": (d["windows_checksum"]
                              == c["windows_checksum"]
                              and d["windows_rows"] == c["windows_rows"]),
    }
    print(json.dumps(report))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
