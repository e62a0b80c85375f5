"""Flagship pipeline: the gush production path, Ray-Data-first.

Graft of GushApp's stream (reference: gush_example/gush.scala:33-36 →
SqlToBinlog.scala:10-16 → GushCEP.scala:15-46): raw payload stream →
type/deny filters → parse flat-map → broadcast fan-out into {log count,
windowed count, windowed avg, update count} sinks.

Batch form (this module): one pass over the pages stream computing
extraction, deny filters, change classification, dimension join and the
windowed aggregates. The streaming epoch-loop form with actor state,
watermarks, NFA and the exactly-once sink lives in
:mod:`gush_ray.pipelines.epoch_loop`.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from gush_ray.config import EngineConfig
from gush_ray.datagen import ensure_pages, gen_dim_sites
from gush_ray.extract import extract_text_batch, split_errors
from gush_ray.stages.agg import partial_aggregate
from gush_ray.stages.changes import classify_changes
from gush_ray.stages.filters import apply_deny_filters
from gush_ray.stages.joins import broadcast_join
from gush_ray.stages.windows import tumbling_aggregate


def _site_of_url(batch: pa.Table) -> pa.Table:
    # url = https://site{NNNN}.example.org/p/{i} → site domain
    site = pc.extract_regex(batch["url"], r"https://(?P<site>[^/]+)/")
    return batch.append_column("site", pc.struct_field(site, "site"))


def run_flagship(pages_dir: str, cfg: EngineConfig | None = None,
                 n_sites: int = 100):
    """read → extract (errors split) → deny filter → change classify →
    dim join → event-time tumbling windowed aggregates per (category, window).

    Returns the windowed aggregate Dataset (the W1/W2 sink union of
    GushCEP.allSinks, GushCEP.scala:15-22).
    """
    cfg = cfg or EngineConfig()
    ds = rd.read_parquet(pages_dir)

    ds = ds.map_batches(
        lambda b: extract_text_batch(b, out_col="text_extracted"),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    # Resume-on-parse-error: keep only parseable rows in the main stream
    # (reference supervision: gush.scala:13-18)
    ds = ds.map_batches(lambda b: split_errors(b)[0], batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = apply_deny_filters(ds, cfg)
    ds = classify_changes(ds, key="url", ts_col="warc_ts",
                          num_partitions=cfg.num_partitions)
    ds = ds.map_batches(_site_of_url, batch_format="pyarrow",
                        zero_copy_batch=True)

    dim = gen_dim_sites(n_sites).to_pandas()
    ds = broadcast_join(ds, dim, on="site")

    agg = tumbling_aggregate(
        ds, ["category", "change_kind"], "warc_ts",
        size_us=15 * 60 * 1_000_000,
        specs={"n": (None, "count"), "sum_weight": ("weight", "sum")},
    )
    return agg


def entry_pipeline():
    """Driver smoke entry: the full streaming CEP engine over a small
    deterministic pages stream — epoch loop, V1 dedup, event-time
    tumbling windows closed by watermarks, sessions, NFA matches,
    exactly-once sink — returning the closed windows table."""
    import shutil
    import uuid

    from gush_ray.pipelines.epoch_loop import StreamingJob

    pages_dir = ensure_pages("/tmp/gush_ray_pages", n_urls=2_000, seed=7)
    out_dir = f"/tmp/gush_ray_entry/{uuid.uuid4().hex}"
    job = StreamingJob(pages_dir, out_dir, run_id=uuid.uuid4().hex,
                       num_partitions=4)
    job.run()
    windows = job.read_output("windows")
    shutil.rmtree(out_dir, ignore_errors=True)
    return windows.sort_values(
        ["lang", "change_kind", "window_id"]
    ).reset_index(drop=True)
