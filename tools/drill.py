"""Headroom-scale ops drill: SIGKILL mid-stream → rescale 32→16 →
resume on "half the cluster" → parity vs the uninterrupted run.

The north rule's ops claims (resumable from checkpoint, N vs 4N cluster
sizes) are pytest-pinned at fixture scale; this drill executes them at
the 49M-row headroom scale against the same corpus as the TTL headroom
run in BENCH/BASELINE.md:

1. phase 1 (child process, P=32, 32 cpus): the composed flagship job —
   dim join + stream-stream click join + streaming near-dup + top-k +
   NFA, dedup/near-dup TTL 45 min — SIGKILLed by the parent the moment
   epoch ``--kill-after`` commits (mid-epoch, no cleanup; `ray stop
   --force` reaps the orphaned cluster);
2. rescale (child process): ``rescale_state(out_dir, 16, params)`` with
   the job's REAL StateParams — re-splits dedup/session/NFA/join/
   near-dup state by ``hash(key) % 16`` and rewrites the last manifest;
3. phase 2 (child process, P=16, 16 cpus): the same job resumes from
   the committed prefix and completes;
4. verify: fsck green over the stitched output, and per-epoch
   rows/near_dups/join_pairs for the POST-KILL epochs equal the
   uninterrupted 32-partition run's recorded values (pass the headroom
   JSON via ``--ref``) — the counters are event-time-determined, so
   kill+rescale must not change them.

Usage:
    python tools/drill.py [--ref /tmp/headroom_runB.json] \
        [--kill-after 8] [--urls 24000000] [--epochs 16]
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")).rstrip(os.pathsep)

TTL_US = 45 * 60 * 1_000_000


def build_job(args, num_partitions: int):
    from gush_ray.datagen import gen_dim_sites
    from gush_ray.pipelines.epoch_loop import StreamingJob
    from gush_ray.state.join_state import JoinSpec
    from gush_ray.state.neardup import NearDupSpec

    pages_dir = (f"/tmp/gush_scale_pages/u{args.urls}_s77"
                 f"_e{args.epochs}_p1")
    clicks_dir = (f"/tmp/gush_scale_clicks/u{args.urls}_s77"
                  f"_e{args.epochs}_p1")
    for d in (pages_dir, clicks_dir):
        if not os.path.exists(os.path.join(d, "_COMPLETE")):
            raise SystemExit(
                f"corpus missing: {d} — run tools/headroom.py with the "
                f"same --urls/--epochs first (it generates + caches it)")
    half_h = 30 * 60 * 1_000_000
    dim = gen_dim_sites(max(4, args.urls // 20)).to_pandas()
    return StreamingJob(
        pages_dir, args.out, run_id="drill",
        num_partitions=num_partitions, dim_df=dim,
        window_group_cols=("category", "change_kind"),
        window_topk=10,
        dedup_ttl_us=TTL_US,
        right_dir=clicks_dir,
        join_spec=JoinSpec(-half_h, half_h, left_cols=("version",),
                           right_cols=("click_id",)),
        neardup_spec=NearDupSpec(hash_fn="fast", ttl_us=TTL_US),
    )


def child_run(args, num_partitions: int, num_cpus: int) -> int:
    import ray

    ray.init(address="local", num_cpus=num_cpus,
             include_dashboard=False, logging_level="ERROR")
    job = build_job(args, num_partitions)
    t0 = time.perf_counter()
    res = job.run()
    print(json.dumps({"phase_result": res,
                      "sec": round(time.perf_counter() - t0, 2)}))
    job.kill_actors()
    ray.shutdown()
    return 0


def child_rescale(args, new_p: int) -> int:
    import ray

    from gush_ray.rescale import rescale_state

    # parallel chain restore (the serial tool measured 26 min at 49M
    # rows; the restore fan-out is the production path)
    ray.init(address="local", include_dashboard=False,
             logging_level="ERROR")
    job = build_job(args, new_p)  # only for .params (exact match)
    t0 = time.perf_counter()
    rep = rescale_state(args.out, new_p, params=job.params, parallel=True)
    rep["sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(rep))
    ray.shutdown()
    return 0


def _spawn(extra: list[str]) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)] + extra,
        cwd=_REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--urls", type=int, default=24_000_000)
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--kill-after", type=int, default=8,
                    help="SIGKILL phase 1 once this many epochs commit")
    ap.add_argument("--ref", default="/tmp/headroom_runB.json",
                    help="uninterrupted headroom run's JSON (parity ref)")
    ap.add_argument("--out", default="/tmp/gush_drill/out")
    ap.add_argument("--phase", choices=("run", "rescale"), default=None)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    if args.phase == "run":
        return child_run(args, args.partitions, args.num_cpus)
    if args.phase == "rescale":
        return child_rescale(args, args.partitions)

    # ---- parent: orchestrate ----
    import shutil
    shutil.rmtree(args.out, ignore_errors=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    base = ["--urls", str(args.urls), "--epochs", str(args.epochs),
            "--out", args.out]

    report: dict = {"metric": "ops_drill_kill_rescale_resume",
                    "urls": args.urls, "epochs": args.epochs,
                    "kill_after": args.kill_after}
    man_dir = os.path.join(args.out, "_manifest")
    print("# phase 1: P=32 @32cpus, SIGKILL at "
          f"{args.kill_after} commits", file=sys.stderr)
    p1 = _spawn(base + ["--phase", "run", "--partitions", "32",
                        "--num-cpus", "32"])
    t0 = time.perf_counter()
    target = os.path.join(man_dir, f"epoch={args.kill_after - 1:05d}.json")
    while True:
        if os.path.exists(target):
            os.kill(p1.pid, signal.SIGKILL)
            report["killed_at_s"] = round(time.perf_counter() - t0, 1)
            break
        if p1.poll() is not None:
            raise SystemExit("phase 1 exited before the kill point")
        time.sleep(0.5)
    p1.wait()
    subprocess.run(["ray", "stop", "--force"], check=False,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    time.sleep(3)

    print("# rescale 32 -> 16", file=sys.stderr)
    p2 = _spawn(base + ["--phase", "rescale", "--partitions", "16"])
    out2, _ = p2.communicate()
    if p2.returncode != 0:
        raise SystemExit("rescale failed")
    report["rescale"] = json.loads(out2.strip().splitlines()[-1])

    print("# phase 2: resume P=16 @16cpus", file=sys.stderr)
    p3 = _spawn(base + ["--phase", "run", "--partitions", "16",
                        "--num-cpus", "16"])
    out3, _ = p3.communicate()
    if p3.returncode != 0:
        raise SystemExit("resume failed")
    report["resume"] = json.loads(out3.strip().splitlines()[-1])

    from gush_ray.fsck import audit
    fsck = audit(args.out)
    report["fsck_ok"] = bool(fsck["ok"] and not fsck["problems"])

    # per-epoch counter parity vs the uninterrupted run (the counters
    # are event-time-determined: kill + rescale must not change them)
    from gush_ray.sinks.exactly_once import ExactlyOnceSink
    sink = ExactlyOnceSink(args.out)
    mismatches = []
    ref_pe = None
    if os.path.exists(args.ref):
        ref = json.load(open(args.ref))
        ref_pe = {e["epoch"]: e for e in ref["per_epoch"]}
    for e in sink.committed_epochs():
        man = sink.read_manifest(e)
        parts = man["partitions"]
        got = {
            "rows": sum(p.get("rows_in", 0) + p.get("right_rows_in", 0)
                        for p in parts),
            "near_dups": sum(p.get("near_dup_rows", 0) for p in parts),
            "join_pairs": sum(p.get("joined_rows", 0) for p in parts),
            "P": len(parts),
        }
        if ref_pe is not None and e in ref_pe:
            for k in ("rows", "near_dups", "join_pairs"):
                if got[k] != ref_pe[e][k]:
                    mismatches.append(
                        {"epoch": e, "counter": k,
                         "got": got[k], "ref": ref_pe[e][k]})
        if e in (0, args.kill_after - 1, args.kill_after, args.epochs - 1):
            report[f"epoch_{e}"] = got
    report["ref_compared"] = ref_pe is not None
    report["counter_mismatches"] = mismatches
    # rows_in is event-time-determined and must match EXACTLY under
    # kill+rescale. near_dups / join_pairs are watermark-PACING-
    # sensitive at the TTL horizon (an eviction lands between different
    # watermark paces at different P — the documented TTL trade, see
    # rescale module docstring), so they get a ±1-per-epoch allowance;
    # anything larger is a real divergence.
    rows_bad = [m for m in mismatches if m["counter"] == "rows"]
    ttl_big = [m for m in mismatches if m["counter"] != "rows"
               and abs(m["got"] - m["ref"]) > 1]
    report["rows_parity_exact"] = ref_pe is not None and not rows_bad
    report["ttl_counters_within_1"] = ref_pe is not None and not ttl_big
    report["parity_ok"] = bool(report["rows_parity_exact"]
                               and report["ttl_counters_within_1"])
    print(json.dumps(report))
    return 0 if report["fsck_ok"] and report["parity_ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
