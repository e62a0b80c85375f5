"""Stage-2 tree fan-in bench (round-5 verdict item 5's bench row):
windowed top-k + sketch quantiles with a HIGH-CARDINALITY group column
(derived host) over the cached 2.4M-url corpus, P >= the tree
threshold — direct single-task stage-2 merges vs the tree
(GUSH_STAGE2_TREE_P). Outputs are checksummed equal; one JSON line.

Usage:
    python tools/stage2_bench.py [--num-cpus 32] [--partitions 16] \
        [--pages-dir /tmp/gush_scale_pages/u2400000_s77_e2_v3]
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--pages-dir",
                    default="/tmp/gush_scale_pages/u2400000_s77_e2_v3")
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from gush_ray.pipelines.epoch_loop import StreamingJob

    def run(tag: str, tree: bool) -> dict:
        # env is read driver-side at stage-2 submit time
        os.environ["GUSH_STAGE2_TREE_P"] = ("12" if tree else "9999")
        out = f"/tmp/gush_stage2/{tag}-{uuid.uuid4().hex[:8]}"
        job = StreamingJob(
            args.pages_dir, out, run_id=tag,
            num_partitions=args.partitions, pattern=None,
            derive_host=True, window_group_cols=("host",),
            window_topk=10, value_col="version",
            window_quantiles=(0.5, 0.95), quantile_sketch_k=128)
        t0 = time.perf_counter()
        job.run()
        wall = time.perf_counter() - t0
        topk = job.read_output("topk")
        qd = job.read_output("quantiles")
        res = {
            "wall_s": round(wall, 2),
            "topk_rows": int(len(topk)),
            "topk_checksum": int(topk["n"].sum()),
            "quantile_rows": int(len(qd)),
            "quantile_checksum": round(float(qd["value"].sum()), 6),
        }
        shutil.rmtree(out, ignore_errors=True)
        return res

    run("warm", True)  # untimed
    direct = run("direct", False)
    tree = run("tree", True)
    report = {
        "metric": "stage2_tree_fanin",
        "pages_dir": args.pages_dir,
        "partitions": args.partitions, "num_cpus": args.num_cpus,
        "group_col": "host (high cardinality)",
        "direct": direct, "tree": tree,
        "outputs_identical": (
            direct["topk_rows"] == tree["topk_rows"]
            and direct["topk_checksum"] == tree["topk_checksum"]
            and direct["quantile_rows"] == tree["quantile_rows"]
            and direct["quantile_checksum"] == tree["quantile_checksum"]),
        "speedup_x": round(direct["wall_s"] / tree["wall_s"], 3),
    }
    print(json.dumps(report))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
