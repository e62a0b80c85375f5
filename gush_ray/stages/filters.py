"""Config-driven vectorized stream filters.

Graft of gush's statement filters (reference: SqlToBinlog.scala:12-14 —
keep INSERT/UPDATE statements, drop ``ON DUPLICATE KEY UPDATE``, drop
ignored tables / prefixes from YAML config, util/GushConfig.scala:20-22):
here they are Arrow-vectorized predicates over the page stream — deny-list
``lang`` values (tableName analog) and url prefixes, plus content
validity gates.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from gush_ray.config import EngineConfig


def deny_filter_batch(batch: pa.Table, cfg: EngineConfig,
                      lang_col: str = "lang", url_col: str = "url") -> pa.Table:
    if batch.num_rows == 0:
        return batch  # pa.array([]) infers null type; filter() would throw
    mask = pa.array([True] * batch.num_rows, type=pa.bool_())
    if cfg.ignored_langs and lang_col in batch.column_names:
        mask = pc.and_(
            mask,
            pc.invert(pc.is_in(batch[lang_col],
                               value_set=pa.array(list(cfg.ignored_langs)))),
        )
    if cfg.ignored_url_prefixes and url_col in batch.column_names:
        for pref in cfg.ignored_url_prefixes:
            mask = pc.and_(
                mask, pc.invert(pc.starts_with(batch[url_col], pref))
            )
    return batch.filter(mask)


def apply_deny_filters(ds, cfg: EngineConfig, **cols):
    return ds.map_batches(
        lambda b: deny_filter_batch(b, cfg, **cols),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def min_length_filter(ds, col: str, min_len: int):
    """Content-quality gate (graft of the 'unsupported statement' drop,
    SqlToBinlog.scala:13): keep rows whose ``col`` has >= min_len chars."""
    return ds.map_batches(
        lambda b: b.filter(
            pc.greater_equal(pc.utf8_length(b[col]), min_len)
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
