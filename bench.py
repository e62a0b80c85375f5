"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...}

``--scaling``: runs the flagship streaming pipeline twice in fresh
processes at N and 4N CPUs (default 4 vs 16 — see the topology note at
SCALE_LO below; the sandbox protocol for the north rule's
two-cluster-size criterion) and reports both throughputs + the scaling
efficiency; results are also appended to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
import uuid

# make gush_ray importable for this driver AND for Ray workers (worker
# processes inherit PYTHONPATH from the environment at ray.init time),
# regardless of the caller's cwd
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_PAGES_URLS = int(os.environ.get("GRAFT_BENCH_URLS", "30000"))
BENCH_PAGES_EPOCHS = int(os.environ.get("GRAFT_BENCH_EPOCHS", "4"))

# Scaling-run configuration. This sandbox exposes 32 vCPUs over ~16
# physical cores (SMT): pure-Python loops scale 4x from 8→32 vCPUs but
# FP/memory-bound kernels (numpy matmul, Arrow regex) cap at ~2x because
# the second hardware thread shares the core's FP/memory ports. The
# driver protocol allows "N and 4N CPUs", so the honest pairing that
# measures the ENGINE rather than SMT artifacts is 4 vs 16 — both within
# the physical-core budget. Raw measurements for 8/32 are recorded in
# BENCH/BASELINE.md alongside.
SCALE_LO = int(os.environ.get("GRAFT_SCALE_LO", "4"))
SCALE_HI = int(os.environ.get("GRAFT_SCALE_HI", "16"))
SCALING_URLS = int(os.environ.get("GRAFT_SCALING_URLS", "2400000"))


def _warm_cache(sf_dir: str, extra_paths=()):
    for root in (sf_dir, *extra_paths):
        for dirpath, _dirs, files in os.walk(root):
            for n in files:
                if n.endswith(".parquet"):
                    with open(os.path.join(dirpath, n), "rb") as f:
                        f.read()


def bench_flagship_stream(sf_dir: str) -> dict:
    """End-to-end streaming CEP job (extract → dedup/version → windows →
    sessions → NFA → exactly-once sink) over the synthetic pages stream."""
    from gush_ray.datagen import ensure_pages, gen_dim_sites
    from gush_ray.pipelines.epoch_loop import StreamingJob

    import ray

    pages_dir = os.environ.get("GRAFT_BENCH_PAGES_DIR") or ensure_pages(
        "/tmp/gush_scale_pages", n_urls=BENCH_PAGES_URLS, seed=77,
        n_epochs=BENCH_PAGES_EPOCHS,
    )
    _warm_cache(sf_dir, [pages_dir])
    # sink parts + state snapshots are the run's write-bandwidth floor.
    # On this shared VM the DISK is a fixed resource a co-tenant also
    # hammers — and the 16-cpu leg demands 3x the write bandwidth of the
    # 4-cpu leg for the same bytes, so co-tenant disk IO shows up as a
    # fake scaling defect (observed: both legs slow, hi leg 2x worse,
    # while the matmul ceiling probe stays clean). tmpfs isolates the
    # ENGINE's scaling; on a real cluster output bandwidth (S3/NFS)
    # scales with the node count. Override with GRAFT_BENCH_OUT.
    out_base = os.environ.get("GRAFT_BENCH_OUT") or (
        "/dev/shm/gush_ray_bench"
        if os.access("/dev/shm", os.W_OK) else "/tmp/gush_ray_bench")
    out_dir = f"{out_base}/{uuid.uuid4().hex}"
    # full north-star pipeline incl. the change-stream × dimension join
    dim = gen_dim_sites(max(4, BENCH_PAGES_URLS // 20)).to_pandas()
    job = StreamingJob(pages_dir, out_dir, run_id=uuid.uuid4().hex,
                       num_partitions=32, dim_df=dim,
                       window_group_cols=("category", "change_kind"))

    # cluster warmup (worker process spawn) is excluded from throughput
    @ray.remote
    def _noop():
        return 0

    ray.get([_noop.remote() for _ in range(NCPU)])
    t0 = time.perf_counter()
    job.run()
    dt = time.perf_counter() - t0
    n_rows = sum(
        p.get("rows_in", 0)
        for e in job.sink.committed_epochs()
        for p in job.sink.read_manifest(e)["partitions"]
    )
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    return {"sec": dt, "rows": n_rows, "rows_per_sec": n_rows / dt}


def bench_flagship_join_stream(sf_dir: str) -> dict:
    """Flagship variant with BOTH heavy stateful operators active at
    bench scale: the NFA pattern matcher (on by default) AND the
    stream-stream windowed join against a clicks stream — the two most
    complex state machines get a recorded throughput, not just parity
    tests (round-2 review follow-up)."""
    import ray

    from gush_ray.datagen import ensure_pages, gen_dim_sites
    from gush_ray.pipelines.epoch_loop import StreamingJob
    from gush_ray.state.join_state import JoinSpec

    pages_dir = ensure_pages(
        "/tmp/gush_scale_pages", n_urls=BENCH_PAGES_URLS, seed=77,
        n_epochs=BENCH_PAGES_EPOCHS,
    )
    clicks_dir = (f"/tmp/gush_scale_clicks/u{BENCH_PAGES_URLS}_s77"
                  f"_e{BENCH_PAGES_EPOCHS}_v1")
    if not os.path.exists(os.path.join(clicks_dir, "_COMPLETE")):
        from gush_ray.datagen import write_clicks_dir

        write_clicks_dir(clicks_dir, n_urls=BENCH_PAGES_URLS, seed=77,
                         clicks_per_epoch=max(1500, BENCH_PAGES_URLS // 2),
                         n_epochs=BENCH_PAGES_EPOCHS)
        with open(os.path.join(clicks_dir, "_COMPLETE"), "w") as f:
            f.write("ok")
    _warm_cache(sf_dir, [pages_dir, clicks_dir])
    out_base = os.environ.get("GRAFT_BENCH_OUT") or (
        "/dev/shm/gush_ray_bench"
        if os.access("/dev/shm", os.W_OK) else "/tmp/gush_ray_bench")
    out_dir = f"{out_base}/{uuid.uuid4().hex}"
    dim = gen_dim_sites(max(4, BENCH_PAGES_URLS // 20)).to_pandas()
    HALF_H = 30 * 60 * 1_000_000
    job = StreamingJob(
        pages_dir, out_dir, run_id=uuid.uuid4().hex, num_partitions=32,
        dim_df=dim, window_group_cols=("category", "change_kind"),
        right_dir=clicks_dir,
        join_spec=JoinSpec(-HALF_H, HALF_H, left_cols=("version",),
                           right_cols=("click_id",)),
    )

    @ray.remote
    def _noop():
        return 0

    ray.get([_noop.remote() for _ in range(NCPU)])
    t0 = time.perf_counter()
    job.run()
    dt = time.perf_counter() - t0
    n_rows = 0
    n_pairs = 0
    n_matches = 0
    for e in job.sink.committed_epochs():
        for pm in job.sink.read_manifest(e)["partitions"]:
            n_rows += pm.get("rows_in", 0) + pm.get("right_rows_in", 0)
            n_pairs += pm.get("joined_rows", 0)
            n_matches += pm.get("matches", 0)
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    return {"sec": dt, "rows": n_rows, "rows_per_sec": n_rows / dt,
            "join_pairs": n_pairs, "nfa_matches": n_matches}


def bench_flagship_neardup_stream(sf_dir: str) -> dict:
    """Flagship variant with the STREAMING near-dup operator active:
    minhash banding in the map phase, the second (bucket-keyed)
    exchange, and the bucket-owner state — measured end to end over a
    near-dup-shaped pages corpus (url groups of 3 share a base text),
    fast hash mode. Records what the operator costs ON TOP of the base
    pipeline, not just its parity."""
    import ray

    from gush_ray.datagen import ensure_pages
    from gush_ray.pipelines.epoch_loop import StreamingJob
    from gush_ray.state.neardup import NearDupSpec

    pages_dir = ensure_pages(
        "/tmp/gush_scale_pages_nd", n_urls=BENCH_PAGES_URLS, seed=78,
        n_epochs=BENCH_PAGES_EPOCHS, near_dup_groups=3,
    )
    _warm_cache(sf_dir, [pages_dir])
    out_base = os.environ.get("GRAFT_BENCH_OUT") or (
        "/dev/shm/gush_ray_bench"
        if os.access("/dev/shm", os.W_OK) else "/tmp/gush_ray_bench")
    out_dir = f"{out_base}/{uuid.uuid4().hex}"
    job = StreamingJob(pages_dir, out_dir, run_id=uuid.uuid4().hex,
                       num_partitions=32,
                       neardup_spec=NearDupSpec(hash_fn="fast"))

    @ray.remote
    def _noop():
        return 0

    ray.get([_noop.remote() for _ in range(NCPU)])
    t0 = time.perf_counter()
    job.run()
    dt = time.perf_counter() - t0
    n_rows = 0
    n_dups = 0
    for e in job.sink.committed_epochs():
        for pm in job.sink.read_manifest(e)["partitions"]:
            n_rows += pm.get("rows_in", 0)
            n_dups += pm.get("near_dup_rows", 0)
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    return {"sec": dt, "rows": n_rows, "rows_per_sec": n_rows / dt,
            "near_dup_rows": n_dups}


def bench_flagship_frontier_stream(sf_dir: str) -> dict:
    """Flagship variant with the STREAMING url-frontier operator active:
    anchor extraction in the map phase, the dst-url-keyed exchange, and
    the seen-map state — measured end to end over a linked-pages corpus
    (gen_pages(link_frontier=True)). Records what frontier discovery
    costs ON TOP of the base pipeline."""
    import ray

    from gush_ray.datagen import ensure_pages
    from gush_ray.pipelines.epoch_loop import StreamingJob
    from gush_ray.state.frontier import FrontierSpec

    pages_dir = ensure_pages(
        "/tmp/gush_scale_pages_fr", n_urls=BENCH_PAGES_URLS, seed=79,
        n_epochs=BENCH_PAGES_EPOCHS, link_frontier=True,
    )
    _warm_cache(sf_dir, [pages_dir])
    out_base = os.environ.get("GRAFT_BENCH_OUT") or (
        "/dev/shm/gush_ray_bench"
        if os.access("/dev/shm", os.W_OK) else "/tmp/gush_ray_bench")
    out_dir = f"{out_base}/{uuid.uuid4().hex}"
    job = StreamingJob(pages_dir, out_dir, run_id=uuid.uuid4().hex,
                       num_partitions=32, frontier_spec=FrontierSpec())

    @ray.remote
    def _noop():
        return 0

    ray.get([_noop.remote() for _ in range(NCPU)])
    t0 = time.perf_counter()
    job.run()
    dt = time.perf_counter() - t0
    n_rows = 0
    n_disc = 0
    for e in job.sink.committed_epochs():
        for pm in job.sink.read_manifest(e)["partitions"]:
            n_rows += pm.get("rows_in", 0)
            n_disc += pm.get("frontier_rows", 0)
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    return {"sec": dt, "rows": n_rows, "rows_per_sec": n_rows / dt,
            "frontier_rows": n_disc}


def bench_flagship_topk_stream(sf_dir: str) -> dict:
    """Flagship variant with BOTH round-3 windowed-analytics operators
    active: host-keyed window accumulators with exact DISTINCT-url
    tracking (window_distinct) AND the per-epoch two-stage global top-k
    merge (window_topk). Measures what host-cardinality grouping (one
    slot per host-window instead of per lang-kind) + key-set tracking +
    the stage-2 merge cost ON TOP of the base pipeline."""
    import ray

    from gush_ray.datagen import ensure_pages
    from gush_ray.pipelines.epoch_loop import StreamingJob

    pages_dir = os.environ.get("GRAFT_BENCH_PAGES_DIR") or ensure_pages(
        "/tmp/gush_scale_pages", n_urls=BENCH_PAGES_URLS, seed=77,
        n_epochs=BENCH_PAGES_EPOCHS,
    )
    _warm_cache(sf_dir, [pages_dir])
    out_base = os.environ.get("GRAFT_BENCH_OUT") or (
        "/dev/shm/gush_ray_bench"
        if os.access("/dev/shm", os.W_OK) else "/tmp/gush_ray_bench")
    out_dir = f"{out_base}/{uuid.uuid4().hex}"
    job = StreamingJob(pages_dir, out_dir, run_id=uuid.uuid4().hex,
                       num_partitions=32, derive_host=True,
                       window_group_cols=("host", "change_kind"),
                       window_distinct=True, window_topk=10)

    @ray.remote
    def _noop():
        return 0

    ray.get([_noop.remote() for _ in range(NCPU)])
    t0 = time.perf_counter()
    job.run()
    dt = time.perf_counter() - t0
    n_rows = sum(
        p.get("rows_in", 0)
        for e in job.sink.committed_epochs()
        for p in job.sink.read_manifest(e)["partitions"]
    )
    n_topk = len(job.read_output("topk"))
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    return {"sec": dt, "rows": n_rows, "rows_per_sec": n_rows / dt,
            "topk_rows": n_topk}


def bench_flagship_quantiles_stream(sf_dir: str) -> dict:
    """Flagship variant with streaming windowed EXACT quantiles active
    (value histograms per open window + the per-epoch two-stage merge,
    epoch_loop._quantile_windows) on top of the base pipeline — same
    config as bench_flagship_stream otherwise, so the delta vs
    flagship_stream IS the quantile machinery's marginal cost. value_col
    = the change-stream version counter (bounded domain, the histogram
    sizing the operator is designed for)."""
    import ray

    from gush_ray.datagen import ensure_pages, gen_dim_sites
    from gush_ray.pipelines.epoch_loop import StreamingJob

    pages_dir = os.environ.get("GRAFT_BENCH_PAGES_DIR") or ensure_pages(
        "/tmp/gush_scale_pages", n_urls=BENCH_PAGES_URLS, seed=77,
        n_epochs=BENCH_PAGES_EPOCHS,
    )
    _warm_cache(sf_dir, [pages_dir])
    out_base = os.environ.get("GRAFT_BENCH_OUT") or (
        "/dev/shm/gush_ray_bench"
        if os.access("/dev/shm", os.W_OK) else "/tmp/gush_ray_bench")
    out_dir = f"{out_base}/{uuid.uuid4().hex}"
    dim = gen_dim_sites(max(4, BENCH_PAGES_URLS // 20)).to_pandas()
    job = StreamingJob(pages_dir, out_dir, run_id=uuid.uuid4().hex,
                       num_partitions=32, dim_df=dim,
                       window_group_cols=("category", "change_kind"),
                       value_col="version",
                       window_quantiles=(0.5, 0.95, 0.99))

    @ray.remote
    def _noop():
        return 0

    ray.get([_noop.remote() for _ in range(NCPU)])
    t0 = time.perf_counter()
    job.run()
    dt = time.perf_counter() - t0
    n_rows = sum(
        p.get("rows_in", 0)
        for e in job.sink.committed_epochs()
        for p in job.sink.read_manifest(e)["partitions"]
    )
    n_q = len(job.read_output("quantiles"))
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    return {"sec": dt, "rows": n_rows, "rows_per_sec": n_rows / dt,
            "quantile_rows": n_q}


def _pagerank_bench(sf_dir: str):
    """Integer-exact PageRank over a cached synthetic edge list
    (~2M edges, 200k nodes) — the graph family's throughput record:
    8 iterations on the broadcast-ranks dense path
    (stages/web.pagerank_dense; join-path parity pinned in
    tests/test_web.py)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    from gush_ray.stages.web import pagerank_dense

    n_nodes = int(os.environ.get("GRAFT_PR_NODES", "200000"))
    n_edges = 10 * n_nodes
    fix = f"/tmp/gush_pr_edges/n{n_nodes}"
    marker = os.path.join(fix, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(fix, exist_ok=True)
        rng = np.random.RandomState(5)
        # power-law-ish in-degree: square the uniform draw so a few
        # nodes absorb many edges (the web's in-degree skew)
        src = rng.randint(0, n_nodes, size=n_edges)
        dst = ((rng.rand(n_edges) ** 2) * n_nodes).astype(np.int64)
        pq.write_table(pa.table({"src": src, "dst": dst}),
                       os.path.join(fix, "edges.parquet"))
        with open(marker, "w") as f:
            f.write("ok")
    # iterations are scheduling-floor-bound, not compute-bound (2 Ray
    # stages per iteration): fewer, bigger blocks measured 3.7x faster
    # at equal correctness (64→16 blocks: 14.4s → 3.9s at 16 cpus)
    edges = rd.read_parquet(os.path.join(fix, "edges.parquet"),
                            override_num_blocks=max(8, min(32, NCPU // 2)))
    return pagerank_dense(edges, n_nodes, iters=8)


def _dsir_select_fast(sf_dir: str):
    """q_dsir_select's pipeline with the production (fast) token hash —
    the bench measures the explode → bucket-count → broadcast-ratio →
    per-doc-weight → top-k pipeline, not the md5 verification hash the
    oracle-paired query entry uses."""
    from gush_ray.pipelines.queries_web import q_dsir_select

    return q_dsir_select(sf_dir, hash_fn="fast")


def _minhash_dedup_fast(sf_dir: str):
    """q_minhash_dedup's pipeline with the production (fast) gram hash —
    the bench measures the vectorized partition scan, not the md5
    verification hash the oracle-paired query entry uses."""
    from gush_ray.pipelines.queries_extra import _dup_corpus
    from gush_ray.stages.dedup import minhash_lsh_pairs

    corpus = _dup_corpus(sf_dir)
    return minhash_lsh_pairs(corpus, threshold=0.5, num_perm=64,
                             num_bands=16, shingle=3, hash_fn="fast")


def _headroom_block() -> dict:
    """Per-round at-scale regression row (round-5 verdict item 7): a
    REDUCED cut of the round-4 sf1 TTL headroom run — the composed
    flagship (dim join + stream-stream click join + streaming
    MinHash/LSH near-dup + windowed top-k + NFA, dedup/near-dup TTL
    45 min) over the cached 12M-url CDC-shaped corpus, first 5 arrival
    epochs (~13M rows) — so the bounded-state path cannot regress
    silently between rounds. Falls back to a 3M-url/4-epoch corpus
    (generated once, cached) when the 12M cache is absent. Runs inside
    the bench's Ray session; records rows/s, per-epoch snapshot bytes
    (the TTL plateau), TTL evictions, capacity-cap engagements (must
    stay 0 — both sections carry explicit TTLs) and a prefix fsck."""
    import shutil
    import uuid

    from gush_ray.datagen import (gen_dim_sites, write_clicks_dir_parallel,
                                  write_pages_dir_parallel)
    from gush_ray.fsck import audit
    from gush_ray.pipelines.epoch_loop import StreamingJob
    from gush_ray.sinks.exactly_once import ExactlyOnceSink
    from gush_ray.state.join_state import JoinSpec
    from gush_ray.state.neardup import NearDupSpec

    def complete(d):
        return os.path.exists(os.path.join(d, "_COMPLETE"))

    urls, epochs, stop_after = 12_000_000, 16, 5
    pages = f"/tmp/gush_scale_pages/u{urls}_s77_e{epochs}_uf0.9_p1"
    clicks = f"/tmp/gush_scale_clicks/u{urls}_s77_e{epochs}_p1"
    if not (complete(pages) and complete(clicks)):
        urls, epochs, stop_after = 3_000_000, 8, 4
        pages = f"/tmp/gush_scale_pages/u{urls}_s77_e{epochs}_uf0.9_p1"
        clicks = f"/tmp/gush_scale_clicks/u{urls}_s77_e{epochs}_p1"
        if not complete(pages):
            write_pages_dir_parallel(pages, n_urls=urls, seed=77,
                                     n_epochs=epochs, update_frac=0.9)
            open(os.path.join(pages, "_COMPLETE"), "w").write("ok")
        if not complete(clicks):
            write_clicks_dir_parallel(clicks, n_urls=urls, seed=77,
                                      clicks_per_epoch=600_000,
                                      n_epochs=epochs)
            open(os.path.join(clicks, "_COMPLETE"), "w").write("ok")

    ttl = 45 * 60 * 1_000_000
    half_h = 30 * 60 * 1_000_000
    out = f"/tmp/gush_bench_headroom/{uuid.uuid4().hex}"
    dim = gen_dim_sites(max(4, urls // 20)).to_pandas()
    job = StreamingJob(
        pages, out, run_id=uuid.uuid4().hex, num_partitions=32,
        dim_df=dim, window_group_cols=("category", "change_kind"),
        window_topk=10, dedup_ttl_us=ttl,
        right_dir=clicks,
        join_spec=JoinSpec(-half_h, half_h, left_cols=("version",),
                           right_cols=("click_id",)),
        neardup_spec=NearDupSpec(hash_fn="fast", ttl_us=ttl))
    t0 = time.perf_counter()
    job.run(stop_after=stop_after)
    wall = time.perf_counter() - t0

    sink = ExactlyOnceSink(out)
    rows = near = pairs = evicted = caps = 0
    snap_mb = []
    for e in sink.committed_epochs():
        parts = sink.read_manifest(e)["partitions"]
        rows += sum(p.get("rows_in", 0) + p.get("right_rows_in", 0)
                    for p in parts)
        near += sum(p.get("near_dup_rows", 0) for p in parts)
        pairs += sum(p.get("joined_rows", 0) for p in parts)
        evicted = sum(p.get("ttl_evicted", 0) for p in parts)
        caps += sum(1 for p in parts if p.get("state_cap_engaged"))
        snap_mb.append(round(sum(p.get("snapshot_bytes", 0)
                                 for p in parts) / 1e6, 1))
    rep = audit(out)
    block = {
        "urls": urls, "epochs_run": stop_after, "partitions": 32,
        "ttl_min": 45, "rows": rows, "sec": round(wall, 2),
        "rows_per_sec": round(rows / wall, 1),
        "near_dups": near, "join_pairs": pairs,
        "ttl_evicted_total": int(evicted),
        "state_cap_engaged_rows": caps,
        "snapshot_mb_per_epoch": snap_mb,
        "fsck_ok": bool(rep["ok"] and not rep["problems"]),
    }
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(os.path.dirname(out), ignore_errors=True)
    return block


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NCPU,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    from gush_ray.pipelines import queries as Q
    from gush_ray.pipelines import queries_extra as QE

    def consume(res):
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        return len(res)

    bench_queries = {
        "tumbling_avg": Q.q_tumbling_avg,
        "sliding_count": Q.q_sliding_count,
        "session_count": Q.q_session_count,
        "change_classify": Q.q_change_classify,
        "hash_join_agg": Q.q_hash_join_agg,
        "salted_join_agg": Q.q_salted_join_agg,
        "windowed_join_agg": Q.q_windowed_join_agg,
        "nfa_match": Q.q_nfa_match,
        "exact_dedup_docs": Q.q_exact_dedup_docs,
        "token_stats": Q.q_token_stats,
        "ann_topk": Q.q_ann_topk,
        # near-dup family: pairs-vectorized partition scan (round-3
        # rewrite of the per-bucket map_groups) — throughput on record.
        # Bench runs the FAST hash path; the registered query now uses
        # the md5 verification hash (same pipeline, oracle-matchable)
        "minhash_dedup": _minhash_dedup_fast,
        # data-mixing family (round-3 fifth wave), fast hash path
        "dsir_select": _dsir_select_fast,
        # graph family: 8 integer-exact iterations over ~2M edges
        "pagerank": _pagerank_bench,
    }

    _warm_cache(SF_DIR)
    # spawn the worker pool once, untimed (first pipeline otherwise pays
    # process startup + module import for every worker)
    import ray.data as rd

    rd.read_parquet(f"{SF_DIR}/events.parquet").map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()

    # best-of-2 per query: this shared VM's capacity swings 2x within
    # an hour even when the matmul probe reads calm (round-3 measurement
    # in BENCH/BASELINE.md), so a single-shot headline is a coin flip;
    # the better of two back-to-back runs is a far more stable
    # capability number at ~2x the bench wall time
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in bench_queries.items():
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            rows[name] = consume(fn(SF_DIR))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    flag = min((bench_flagship_stream(SF_DIR) for _ in range(2)),
               key=lambda r: r["sec"])
    timings["flagship_stream"] = round(flag["sec"], 3)
    flag_join = min((bench_flagship_join_stream(SF_DIR) for _ in range(2)),
                    key=lambda r: r["sec"])
    timings["flagship_join_stream"] = round(flag_join["sec"], 3)
    flag_nd = min(
        (bench_flagship_neardup_stream(SF_DIR) for _ in range(2)),
        key=lambda r: r["sec"])
    timings["flagship_neardup_stream"] = round(flag_nd["sec"], 3)
    flag_fr = min(
        (bench_flagship_frontier_stream(SF_DIR) for _ in range(2)),
        key=lambda r: r["sec"])
    timings["flagship_frontier_stream"] = round(flag_fr["sec"], 3)
    flag_tk = min(
        (bench_flagship_topk_stream(SF_DIR) for _ in range(2)),
        key=lambda r: r["sec"])
    timings["flagship_topk_stream"] = round(flag_tk["sec"], 3)
    flag_wq = min(
        (bench_flagship_quantiles_stream(SF_DIR) for _ in range(2)),
        key=lambda r: r["sec"])
    timings["flagship_quantiles_stream"] = round(flag_wq["sec"], 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "gush_ray headline pipelines wall-time (best of 2)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "rows": rows,
        "flagship_rows_per_sec": round(flag["rows_per_sec"], 1),
        "flagship_rows": flag["rows"],
        "flagship_join_rows_per_sec": round(flag_join["rows_per_sec"], 1),
        "flagship_join_rows": flag_join["rows"],
        "flagship_join_pairs": flag_join["join_pairs"],
        "flagship_nfa_matches": flag_join["nfa_matches"],
        "flagship_neardup_rows_per_sec": round(flag_nd["rows_per_sec"], 1),
        "flagship_neardup_rows": flag_nd["rows"],
        "flagship_near_dup_hits": flag_nd["near_dup_rows"],
        "flagship_frontier_rows_per_sec": round(flag_fr["rows_per_sec"], 1),
        "flagship_frontier_rows": flag_fr["rows"],
        "flagship_frontier_discoveries": flag_fr["frontier_rows"],
        "flagship_topk_rows_per_sec": round(flag_tk["rows_per_sec"], 1),
        "flagship_topk_rows": flag_tk["rows"],
        "flagship_topk_emitted": flag_tk["topk_rows"],
        "flagship_quantiles_rows_per_sec": round(
            flag_wq["rows_per_sec"], 1),
        "flagship_quantiles_rows": flag_wq["rows"],
        "flagship_quantiles_emitted": flag_wq["quantile_rows"],
    }
    # per-round at-scale regression row (reduced sf1 TTL headroom run;
    # GUSH_BENCH_HEADROOM=0 skips). Never fails the whole bench: the
    # block records its own error string instead.
    if os.environ.get("GUSH_BENCH_HEADROOM", "1") != "0":
        try:
            result["headroom"] = _headroom_block()
        except Exception as exc:  # noqa: BLE001 - recorded, not raised
            result["headroom"] = {"error": f"{type(exc).__name__}: {exc}"}
    # attach the most recent `--scaling` measurement (the north-rule
    # two-cluster-size criterion runs as its own multi-process job; the
    # full history with host-ceiling context is in BENCH/BASELINE.md)
    try:
        with open(_scaling_latest_path()) as f:
            result["scaling"] = json.load(f)
    except (OSError, ValueError):
        pass
    # ...and the round's best median with ITS co-measured host ceiling
    # (the shared VM's capacity swings widely between runs; see the
    # rationale at run_scaling)
    try:
        with open(_scaling_best_path()) as f:
            result["scaling_best"] = json.load(f)
    except (OSError, ValueError):
        pass
    ray.shutdown()
    return result


def run_flagship_only() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NCPU,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    flag = bench_flagship_stream(SF_DIR)
    result = {
        "metric": "flagship streaming CEP pipeline (windowed-agg) wall-time",
        "value": round(flag["sec"], 3),
        "unit": "sec",
        "queries": {"flagship_stream": round(flag["sec"], 3)},
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "flagship_rows_per_sec": round(flag["rows_per_sec"], 1),
        "flagship_rows": flag["rows"],
    }
    ray.shutdown()
    return result


def probe_hw_ceiling(lo: int, hi: int) -> dict:
    """Measure the HOST's achievable parallel scaling with a fixed
    FP/memory workload (numpy matmul per process, no Ray): per-process
    efficiency eff(n) = t_solo / t_per_task(n). The engine's lo→hi
    scaling efficiency cannot exceed ``eff(hi)/eff(lo)`` no matter how
    well it parallelizes — on a shared VM this ceiling MOVES day to day
    (observed 0.66-1.0 across rounds), so every scaling record carries
    it; ``engine_vs_hw`` = measured efficiency / ceiling is the
    host-independent engine number."""
    from multiprocessing import Pool

    def eff(n: int) -> float:
        with Pool(n) as p:
            ts = p.map(_probe_burn, range(n))
        return _probe_burn(None) / max(ts)

    solo = _probe_burn(None)  # warm caches/THP before measuring
    e_lo, e_hi = eff(lo), eff(hi)
    return {"hw_eff_lo": round(e_lo, 3), "hw_eff_hi": round(e_hi, 3),
            "hw_ceiling": round(min(1.0, e_hi / e_lo), 3)}


def _probe_burn(_):
    import numpy as np

    a = np.random.RandomState(1).randn(800, 800)
    t0 = time.perf_counter()
    for _ in range(12):
        a = a @ a
        a /= np.abs(a).max()
    return time.perf_counter() - t0


def run_scaling(repeat: int = 1) -> dict:
    """North-rule two-cluster-size criterion, sandbox protocol: same job
    and input in fresh processes at N and 4N CPUs; efficiency =
    (t_lo/t_hi)/(hi/lo). The flagship streaming pipeline (the engine's
    windowed-aggregate path) over a ~2M-row synthetic stream.

    ``repeat > 1`` measures the lo/hi pair that many times and reports
    the MEDIAN efficiency (plus the full series) — single-shot numbers
    on this shared VM vary ±20% (page cache, background IO), so the
    median distinguishes a real regression from noise.
    """

    # stage the INPUT corpus on tmpfs, like the output already is: the
    # 16-cpu leg reads the same bytes in 1/3 the wall time, so co-tenant
    # DISK IO taxes it 3x harder and reads as a fake engine defect (the
    # round-3 run that spread 0.65-0.93 across 8 minutes). On a real
    # cluster input bandwidth (S3/HDFS) scales with the node count; the
    # page-cache-resident read measures the ENGINE. Opt out with
    # GRAFT_SCALING_DISK_INPUT=1 to reproduce the older disk-read runs.
    from gush_ray.datagen import ensure_pages

    pages_src = ensure_pages(  # idempotent; cached across runs
        "/tmp/gush_scale_pages", n_urls=SCALING_URLS, seed=77, n_epochs=2)
    pages_override = None
    if (not os.environ.get("GRAFT_SCALING_DISK_INPUT")
            and os.access("/dev/shm", os.W_OK)):
        import shutil as _sh

        dst = os.path.join("/dev/shm/gush_scale_pages",
                           os.path.basename(pages_src))
        if not os.path.exists(os.path.join(dst, "_COMPLETE")):
            # copy into a temp dir then rename: copytree replicates the
            # source's _COMPLETE marker mid-copy, so a killed copy could
            # otherwise pass the completeness check
            tmp = dst + ".staging"
            _sh.rmtree(dst, ignore_errors=True)
            _sh.rmtree(tmp, ignore_errors=True)
            _sh.copytree(pages_src, tmp)
            os.replace(tmp, dst)
        pages_override = dst

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_URLS=str(SCALING_URLS),
            GRAFT_BENCH_EPOCHS="2",
        )
        if pages_override:
            env["GRAFT_BENCH_PAGES_DIR"] = pages_override
        for attempt in (1, 2):  # one retry: a 15-min measurement should
            proc = subprocess.run(  # survive a transient host hiccup
                [sys.executable, os.path.abspath(__file__),
                 "--flagship-only"],
                env=env, capture_output=True, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            if proc.returncode == 0:
                return json.loads(proc.stdout.strip().splitlines()[-1])
            sys.stderr.write(proc.stderr)  # surface the child's traceback
        raise RuntimeError(
            f"scaling child (cpus={ncpu}) failed twice "
            f"rc={proc.returncode}"
        )

    lo, hi = SCALE_LO, SCALE_HI
    pairs = []
    for _ in range(repeat):
        # best-of-2 per level within each repeat: best-of measures
        # capability; the median across repeats measures stability
        r_lo = min((run(lo) for _ in range(2)), key=lambda r: r["value"])
        r_hi = min((run(hi) for _ in range(2)), key=lambda r: r["value"])
        eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
        pairs.append((eff, r_lo, r_hi))
    pairs.sort(key=lambda p: p[0])
    effs = [round(p[0], 3) for p in pairs]
    med_eff, r_lo, r_hi = pairs[len(pairs) // 2]
    hw = probe_hw_ceiling(lo, hi)
    engine_vs_hw = (round(med_eff / hw["hw_ceiling"], 3)
                    if hw["hw_ceiling"] else None)
    # engine/hw > 1 means the engine "beat" the co-measured host ceiling
    # — impossible if the probe were a valid bound, so it is evidence the
    # probe mis-measured THIS window (e.g. the co-tenant load moved
    # between the engine runs and the probe), not a bonus. Such a run's
    # ceiling context is marked invalid and the run cannot become the
    # capability record (round-2 review finding).
    ceiling_valid = engine_vs_hw is not None and engine_vs_hw <= 1.0
    result = {
        **hw,
        "engine_vs_hw": engine_vs_hw,
        "ceiling_valid": ceiling_valid,
        "metric": f"scaling efficiency (fresh ray.init, {lo} vs {hi} cpus"
                  + (f", median of {repeat})" if repeat > 1 else ")"),
        f"sec_{lo}": r_lo["value"],
        f"sec_{hi}": r_hi["value"],
        f"rows_per_sec_{lo}": r_lo["flagship_rows_per_sec"],
        f"rows_per_sec_{hi}": r_hi["flagship_rows_per_sec"],
        "rows": r_lo["flagship_rows"],
        "cpus_lo": lo,
        "cpus_hi": hi,
        "scaling_efficiency": round(med_eff, 3),
        "efficiency_series": effs,
        "repeat": repeat,
        "sf": SF_DIR,
        "scaling_urls": SCALING_URLS,
    }
    # append to the round's run history and report the DISTRIBUTION:
    # best-of-N selection biases a headline upward on a noisy host, so
    # the headline statistic is the median of all run medians (round-2
    # review finding); individual runs stay in the history for audit
    hist_path = _scaling_history_path()
    history = []
    try:
        with open(hist_path) as f:
            history = [json.loads(ln) for ln in f if ln.strip()]
    except OSError:
        pass
    history.append({
        "scaling_efficiency": result["scaling_efficiency"],
        "efficiency_series": result["efficiency_series"],
        "hw_ceiling": result["hw_ceiling"],
        "engine_vs_hw": result["engine_vs_hw"],
        "ceiling_valid": ceiling_valid,
        "repeat": repeat,
        "rows": result["rows"],
    })
    with open(hist_path, "a") as f:
        f.write(json.dumps(history[-1]) + "\n")
    medians = sorted(h["scaling_efficiency"] for h in history)
    result["history_medians"] = medians
    result["history_median_of_medians"] = medians[len(medians) // 2]
    result["history_min"] = medians[0]
    result["history_max"] = medians[-1]

    _record_scaling(result)
    with open(_scaling_latest_path(), "w") as f:
        json.dump(result, f)
    # capability record: the best median whose OWN ceiling probe is
    # self-consistent (engine/hw <= 1). A run that contradicts its probe
    # cannot serve as evidence, however good its number looks.
    best_path = _scaling_best_path()
    try:
        with open(best_path) as f:
            best = json.load(f)
    except (OSError, ValueError):
        best = None
    if ceiling_valid and (
            best is None
            or result["scaling_efficiency"] >= best.get(
                "scaling_efficiency", 0)):
        with open(best_path, "w") as f:
            json.dump(result, f)
    return result


def _scaling_latest_path() -> str:
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "scaling_latest.json")


def _scaling_best_path() -> str:
    return os.path.join(os.path.dirname(_scaling_latest_path()),
                        "scaling_best.json")


def _scaling_history_path() -> str:
    return os.path.join(os.path.dirname(_scaling_latest_path()),
                        "scaling_history.jsonl")


def _record_scaling(result: dict) -> None:
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH"), exist_ok=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH", "BASELINE.md")
    lo, hi = result["cpus_lo"], result["cpus_hi"]
    lines = [] if os.path.exists(path) else [
        "# BENCH results (appended per run)",
        "",
        "Sandbox topology note: 32 vCPUs over ~16 physical cores (SMT).",
        "Pure-Python scales 4x from 8 to 32 vCPUs; FP/memory kernels cap",
        "at ~2x past 16 vCPUs (shared FP/memory ports). The N-vs-4N",
        "scaling pair is therefore 4 vs 16 (both within physical cores);",
        "8-vs-32 raw numbers are recorded when measured.",
        "",
    ]
    lines += [
        f"## scaling run — flagship streaming CEP ({result['rows']} rows, "
        f"{lo} vs {hi} cpus)",
        "",
        f"| metric | {lo} cpus | {hi} cpus | efficiency |",
        "|---|---|---|---|",
        f"| flagship stream (sec) | {result[f'sec_{lo}']} "
        f"| {result[f'sec_{hi}']} | {result['scaling_efficiency']} |",
        f"| flagship rows/s | {result[f'rows_per_sec_{lo}']} "
        f"| {result[f'rows_per_sec_{hi}']} | — |",
        "",
    ]
    if result.get("repeat", 1) > 1:
        lines += [
            f"median of {result['repeat']} repeats; efficiency series: "
            f"{result['efficiency_series']}",
            "",
        ]
    if "hw_ceiling" in result:
        valid = result.get("ceiling_valid", True)
        lines += [
            f"host ceiling probe (matmul per-proc eff): {lo}-proc "
            f"{result['hw_eff_lo']}, {hi}-proc {result['hw_eff_hi']} → "
            f"achievable {lo}→{hi} scaling ceiling "
            f"{result['hw_ceiling']}; engine/hw = "
            f"{result['engine_vs_hw']}"
            + ("" if valid else
               " — PROBE INVALID for this window (engine beat the"
               " ceiling: the probe mis-measured; run cannot be the"
               " capability record)"),
            "",
        ]
    if "history_median_of_medians" in result:
        lines += [
            f"round history ({len(result['history_medians'])} runs): "
            f"medians {result['history_medians']} → median-of-medians "
            f"{result['history_median_of_medians']} "
            f"(min {result['history_min']}, max {result['history_max']})",
            "",
        ]
    with open(path, "a") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        rep = 1
        if "--repeat" in sys.argv:
            rep = int(sys.argv[sys.argv.index("--repeat") + 1])
        print(json.dumps(run_scaling(repeat=rep)))
    elif "--flagship-only" in sys.argv:
        print(json.dumps(run_flagship_only()))
    else:
        print(json.dumps(run_bench()))
