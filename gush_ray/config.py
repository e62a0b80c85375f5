"""Engine configuration.

Graft of gush's YAML config (reference: util/GushConfig.scala:20-22 —
mysql host/port/user/password plus ``ignored_tables`` / ``ignored_prefixes``).
The binlog connection settings become Parquet-read settings; the ignore
lists become vectorized deny-list filters on ``lang`` / url prefixes
(reference: SqlToBinlog.scala:14,24-27).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    # --- deny-list filters (gush: ignored_tables / ignored_prefixes) ---
    ignored_langs: tuple[str, ...] = ()
    ignored_url_prefixes: tuple[str, ...] = ()

    # --- stream partitioning ---
    num_partitions: int = 32          # stable hash(url) % P for the whole run
    # --- event-time / windows ---
    allowed_lateness_us: int = 0      # watermark = max(warc_ts) - lateness
    window_size_us: int = 10_000_000  # gush example: groupedWithin(_, 10 s)
    session_gap_us: int = 1_800_000_000

    # --- execution sizing ---
    batch_size: int = 8192
    target_max_block_size: int = 128 * 1024 * 1024

    # --- checkpointing / sink ---
    checkpoint_dir: str = "/tmp/gush_ray_ckpt"

    # --- metrics push (gush.config.yml.sample:7 statsd_host) ---
    # "host[:port]" for UDP statsd, "file:///path" to append lines
    # locally, None = disabled (gush_ray/statsd.py)
    statsd_host: "str | None" = None

    extra: dict = field(default_factory=dict)
