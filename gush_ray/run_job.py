"""CLI entry point for the streaming job — the ``ray job submit`` target.

North-rule deployment shape: ``ray job submit -- python -m gush_ray.run_job
--pages-dir ... --out-dir ...`` on a cluster (the driver inherits the
cluster address from the job environment); standalone it starts a local
session. This module OWNS its Ray session (guarded init + shutdown);
nothing in the library does.

Usage::

    python -m gush_ray.run_job --pages-dir /data/pages --out-dir /data/out \
        --num-partitions 32 [--no-resume] [--window-sec 900] [--gap-sec 1800]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _neardup_spec(args):
    # `is not None`: --neardup-ttl-sec 0 means "evict the moment the
    # watermark passes", the OPPOSITE of unset — a falsy check would
    # silently disable the operator and unbound the state
    if not (args.neardup or args.neardup_ttl_sec is not None):
        return None
    from gush_ray.state.neardup import NearDupSpec

    return NearDupSpec(ttl_us=(args.neardup_ttl_sec * 1_000_000
                               if args.neardup_ttl_sec is not None
                               else None))


def _frontier_spec(args):
    # same `is not None` rule as _neardup_spec: --frontier-ttl-sec 0 is
    # "evict at the watermark", not "disabled"
    if not (args.frontier or args.frontier_ttl_sec is not None):
        return None
    from gush_ray.state.frontier import FrontierSpec

    return FrontierSpec(ttl_us=(args.frontier_ttl_sec * 1_000_000
                                if args.frontier_ttl_sec is not None
                                else None))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="gush-ray streaming CEP job")
    ap.add_argument("--pages-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--num-partitions", type=int, default=32)
    ap.add_argument("--run-id", default="job")
    ap.add_argument("--mode", choices=["tasks", "actors"], default="tasks")
    ap.add_argument("--window-sec", type=int, default=900)
    ap.add_argument("--window-distinct", action="store_true",
                    help="exact per-window DISTINCT-url counts "
                         "(n_distinct column on the windows stream; "
                         "partition-exact — sum partials across "
                         "partitions for the global count)")
    ap.add_argument("--window-topk", type=int, default=None,
                    help="global per-window top-K groups on the `topk` "
                         "stream (two-stage merge over the windows "
                         "partials, exactly-once)")
    ap.add_argument("--window-quantiles", default=None,
                    help="comma-separated q's in [0,1] (e.g. 0.5,0.95): "
                         "exact per-window order statistics of "
                         "--value-col on the `quantiles` stream "
                         "(per-partition value histograms, two-stage "
                         "merge, quantile_disc semantics)")
    ap.add_argument("--window-early-fire", action="store_true",
                    help="speculative per-epoch window updates on the "
                         "`window_early` retraction changelog (fold "
                         "sum(change*n) per window = current totals; "
                         "equals the windows stream after close)")
    ap.add_argument("--window-hll-p", type=int, default=None,
                    help="bounded-state windowed DISTINCT: per-window "
                         "2^p-register HLL over the key (estimates on "
                         "the `window_hll` stream; fixed state per open "
                         "window vs window_distinct's exact key sets)")
    ap.add_argument("--session-values", action="store_true",
                    help="per-session VALUE aggregates of --value-col "
                         "(sum_value/min_value/max_value on the session "
                         "streams; NULL values excluded, like SQL)")
    ap.add_argument("--quantile-sketch-k", type=int, default=None,
                    help="bounded-state sketch mode for "
                         "--window-quantiles: log-bucket values at k "
                         "sub-buckets per octave (relative error < 1/k; "
                         "state per open window O(octaves*k) instead of "
                         "O(distinct values))")
    ap.add_argument("--value-col", default=None,
                    help="numeric column summed per window (sum_value) "
                         "and, with --window-quantiles, the column the "
                         "order statistics are over")
    ap.add_argument("--derive-host", action="store_true",
                    help="derive a host column from the url at map time "
                         "(combine with --window-group-cols host)")
    ap.add_argument("--slide-sec", type=int, default=None)
    ap.add_argument("--gap-sec", type=int, default=1800)
    ap.add_argument("--lateness-sec", type=int, default=0)
    ap.add_argument("--idle-partition-epochs", type=int, default=None,
                    help="Flink-style source idleness: a partition whose "
                         "event-time max hasn't advanced for K epochs "
                         "stops holding the watermark back")
    ap.add_argument("--dedup-ttl-sec", type=int, default=None,
                    help="evict dedup state for keys idle this long in "
                         "event time (bounds state; version counters "
                         "restart for evicted keys)")
    ap.add_argument("--at-scale", action="store_true",
                    help="AT-SCALE profile: flip unbounded-state exact "
                         "modes to their bounded-state sketch siblings "
                         "(window_distinct -> HLL p=12, exact quantiles "
                         "-> sketch k=128, dedup TTL 1 week)")
    ap.add_argument("--dim-dir", default=None,
                    help="evolving dimension snapshots: epoch=NNNN/ "
                         "parquet dirs become effective at their epoch "
                         "(carry-forward when absent; epoch 0 required)")
    ap.add_argument("--window-group-cols", default=None,
                    help="comma-separated window group columns "
                         "(default lang,change_kind)")
    ap.add_argument("--neardup", action="store_true",
                    help="streaming MinHash/LSH near-dup detection over "
                         "arriving pages (near_dups output stream; "
                         "tasks mode only — state/neardup.py)")
    ap.add_argument("--neardup-ttl-sec", type=int, default=None,
                    help="evict near-dup bucket owners idle this long "
                         "in event time (bounds bucket state to the "
                         "active horizon; implies --neardup)")
    ap.add_argument("--frontier", action="store_true",
                    help="streaming url-frontier discovery over arriving "
                         "pages' anchors (frontier output stream; tasks "
                         "mode only — state/frontier.py)")
    ap.add_argument("--frontier-ttl-sec", type=int, default=None,
                    help="evict frontier seen-entries idle this long in "
                         "event time (bounds state; an evicted url "
                         "re-emits if rediscovered; implies --frontier)")
    ap.add_argument("--window-combine", action="store_true",
                    help="map-side window combiners (hot-key "
                         "mitigation): pre-aggregate per-(group, "
                         "window) cells in the map; pure windowed-"
                         "analytics profile — refuses the per-key "
                         "order-dependent modes (pass no pattern)")
    ap.add_argument("--state-keys-budget", type=int, default=12_000_000,
                    help="whole-job cap for each keys-ever state "
                         "family (dedup maps, near-dup buckets, "
                         "frontier seen); per-partition cap = budget/P;"
                         " crossing it engages bounded-state eviction "
                         "with a manifest record; 0 disables")
    ap.add_argument("--statsd", default=None,
                    help="push per-epoch metrics as statsd lines: "
                         "'host[:port]' (UDP), 'file:///path', or unset "
                         "to disable (gush_ray/statsd.py)")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="only for standalone local runs")
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        init_kw = dict(include_dashboard=False, ignore_reinit_error=True,
                       logging_level="ERROR")
        # under `ray job submit`, RAY_ADDRESS points at the cluster and
        # ray.init() must be left to honor it (passing address="local"
        # would force a NEW nested local instance and ignore the cluster);
        # only force local when no address is in the environment
        if not os.environ.get("RAY_ADDRESS"):
            init_kw["address"] = "local"
        if args.num_cpus:
            init_kw["num_cpus"] = args.num_cpus
        ray.init(**init_kw)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from gush_ray.config import EngineConfig
    from gush_ray.pipelines.epoch_loop import StreamingJob

    cfg = EngineConfig(allowed_lateness_us=args.lateness_sec * 1_000_000)
    job = StreamingJob(
        args.pages_dir,
        args.out_dir,
        cfg=cfg,
        run_id=args.run_id,
        num_partitions=args.num_partitions,
        window_size_us=args.window_sec * 1_000_000,
        session_gap_us=args.gap_sec * 1_000_000,
        mode=args.mode,
        window_slide_us=(args.slide_sec * 1_000_000
                         if args.slide_sec else None),
        window_distinct=args.window_distinct,
        window_topk=args.window_topk,
        value_col=args.value_col,
        window_quantiles=(tuple(float(q) for q in
                                args.window_quantiles.split(","))
                          if args.window_quantiles else None),
        quantile_sketch_k=args.quantile_sketch_k,
        session_values=args.session_values,
        window_hll_p=args.window_hll_p,
        window_early_fire=args.window_early_fire,
        derive_host=args.derive_host,
        dedup_ttl_us=(args.dedup_ttl_sec * 1_000_000
                      if args.dedup_ttl_sec else None),
        at_scale=args.at_scale,
        idle_partition_epochs=args.idle_partition_epochs,
        dim_dir=args.dim_dir,
        statsd=args.statsd,
        neardup_spec=_neardup_spec(args),
        frontier_spec=_frontier_spec(args),
        window_combine=args.window_combine,
        state_keys_budget=(args.state_keys_budget
                           if args.state_keys_budget > 0 else None),
        # the combined profile is pure windowed analytics: the default
        # NFA pattern is a per-key mode it refuses by design
        **({"pattern": None} if args.window_combine else {}),
        **({"window_group_cols":
            tuple(args.window_group_cols.split(","))}
           if args.window_group_cols else {}),
    )
    res = job.run(resume=not args.no_resume)
    summary = {
        "result": res,
        "committed_epochs": job.sink.committed_epochs(),
        "streams": {
            # metadata-only row counts — never load the output into
            # memory; opened through the sink's fs adapter so remote
            # schemes (objstore://, s3://) count the same as local
            s: sum(
                __import__("pyarrow.parquet", fromlist=["x"])
                .ParquetFile(job.sink.fs.open(f, "rb")).metadata.num_rows
                for f in job.sink.committed_files(s)
            )
            for s in (("changes", "windows", "sessions", "sessions_wm",
                       "matches", "late")
                      + (("near_dups",) if _neardup_spec(args) else ())
                      + (("frontier",) if _frontier_spec(args) else ())
                      + (("topk",) if args.window_topk else ())
                      + (("quantiles",)
                         if args.window_quantiles else ())
                      + (("window_hll",)
                         if job.params.window_hll_p is not None else ())
                      + (("window_early",)
                         if args.window_early_fire else ()))
        },
    }
    print(json.dumps(summary))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
