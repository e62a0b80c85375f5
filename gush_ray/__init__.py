"""gush_ray — a Ray-Data-native structured-streaming / CEP engine.

A from-scratch reimplementation of the capabilities of simao/gush
(an Akka-Streams MySQL-binlog CDC→CEP pipeline, see SURVEY.md) transposed
onto a Common-Crawl-style web-page change stream:

* input: Parquet table ``(url:string, warc_ts:timestamp[us], html:binary,
  text:string, lang:string)`` treated as an ordered change stream keyed by
  ``url`` with ``warc_ts`` as event time;
* engine: ``ray.data.Dataset`` pipelines — ``map_batches`` over zero-copy
  Arrow batches, actor-pool state stores for per-key state, groupby-shuffle
  joins with salt-based skew splitting, event-time tumbling/sliding/session
  windows driven by per-partition monotone watermarks, an NFA pattern
  matcher, and an idempotent exactly-once Parquet sink with per-partition
  lineage manifests and checkpoint resume.

Everything here derives from public knowledge only: the Ray Data and
pyarrow public APIs and the reference repo's observable semantics.
"""

from gush_ray.config import EngineConfig

__version__ = "0.1.0"

__all__ = ["EngineConfig", "__version__"]
