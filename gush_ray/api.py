"""Fluent user API — the graft of gush's extension surface.

gush users compose Akka ``Flow``s/``Sink``s against the public
``BinlogEvent`` stream and plug them in via ``startSending(sink)``
(reference: README.md:15-29, SqlToBinlog.scala:18-22, GushCEP.scala as
the worked example). Here the same surface is a small builder over
``ray.data.Dataset``: each method appends Ray Data stages; arbitrary UDFs
enter as ``map_batches`` callables; ``Stream.from_dataset`` accepts any
Dataset the way ``SqlToBinlog`` accepts any ``Source[String]``.

Example::

    from gush_ray.api import Stream

    HOUR_US = 3600 * 1_000_000
    out = (
        Stream.from_parquet(f"{sf}/events.parquet",
                            columns=["ts", "user_id", "event_type"])
        .filter_equals("event_type", "purchase")
        .window_tumbling(["event_type"], "ts", HOUR_US,
                         {"n": (None, "count")})
        .to_pandas()
    )
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from gush_ray.config import EngineConfig
from gush_ray.stages.agg import Spec, partial_aggregate
from gush_ray.stages.changes import classify_changes, latest_snapshot
from gush_ray.stages.filters import apply_deny_filters
from gush_ray.stages.joins import broadcast_join, hash_join, salted_join
from gush_ray.stages.nfa import Pattern, match_pattern_batch
from gush_ray.stages.windows import (
    session_windows,
    sliding_aggregate,
    tumbling_aggregate,
)


class Stream:
    """A lazy pipeline builder over a ``ray.data.Dataset``."""

    def __init__(self, ds, cfg: EngineConfig | None = None):
        self.ds = ds
        self.cfg = cfg or EngineConfig()

    # ------------------------------------------------------------ sources

    @classmethod
    def from_parquet(cls, paths, columns=None, cfg: EngineConfig | None = None,
                     **kw) -> "Stream":
        return cls(rd.read_parquet(paths, columns=columns, **kw), cfg)

    @classmethod
    def from_dataset(cls, ds, cfg: EngineConfig | None = None) -> "Stream":
        return cls(ds, cfg)

    @classmethod
    def from_arrow(cls, table: pa.Table,
                   cfg: EngineConfig | None = None) -> "Stream":
        return cls(rd.from_arrow(table), cfg)

    @classmethod
    def from_jsonl(cls, path: str, columns=None,
                   cfg: EngineConfig | None = None, **kw) -> "Stream":
        from gush_ray.sources.formats import read_jsonl

        return cls(read_jsonl(path, columns=columns, **kw), cfg)

    @classmethod
    def from_csv(cls, path: str, columns=None,
                 cfg: EngineConfig | None = None, **kw) -> "Stream":
        from gush_ray.sources.formats import read_csv

        return cls(read_csv(path, columns=columns, **kw), cfg)

    # ------------------------------------------------------- transforms

    def _wrap(self, ds) -> "Stream":
        return Stream(ds, self.cfg)

    def map_batches(self, fn: Callable, **kw) -> "Stream":
        kw.setdefault("batch_format", "pyarrow")
        if kw["batch_format"] == "pyarrow":
            kw.setdefault("zero_copy_batch", True)
        return self._wrap(self.ds.map_batches(fn, **kw))

    def filter_expr(self, fn: Callable[[pa.Table], pa.Array]) -> "Stream":
        """Vectorized predicate: fn(batch) → boolean mask."""
        return self.map_batches(lambda b: b.filter(fn(b)))

    def filter_equals(self, col: str, value) -> "Stream":
        return self.filter_expr(lambda b: pc.equal(b[col], value))

    def deny_filter(self, **cols) -> "Stream":
        return self._wrap(apply_deny_filters(self.ds, self.cfg, **cols))

    def select(self, cols: list[str]) -> "Stream":
        return self._wrap(self.ds.select_columns(cols))

    def with_ts_us(self, ts_col: str, out: str = "ts_us") -> "Stream":
        from gush_ray.stages.windows import ts_to_us

        return self.map_batches(
            lambda b: b.append_column(out, ts_to_us(b[ts_col]))
        )

    def extract_text(self, html_col: str = "html", out_col: str = "text",
                     on_error: str = "drop") -> "Stream":
        """html→text extraction. ``on_error``: "drop" discards
        unparseable rows (gush's Resume, SqlToBinlog supervision);
        "keep" retains them with ``extract_ok=False`` so the caller can
        route the dead letters (``.filter_expr`` on extract_ok)."""
        from gush_ray.extract import extract_text_batch, split_errors

        s = self.map_batches(
            lambda b: extract_text_batch(b, html_col=html_col, out_col=out_col)
        )
        if on_error == "keep":
            return s
        return s.map_batches(lambda b: split_errors(b)[0])

    # --------------------------------------------------------- stateful

    def classify_changes(self, key: str = "url",
                         ts_col: str = "ts_us") -> "Stream":
        return self._wrap(
            classify_changes(self.ds, key=key, ts_col=ts_col,
                             num_partitions=self.cfg.num_partitions)
        )

    def latest_snapshot(self, key: str = "url",
                        ts_col: str = "ts_us") -> "Stream":
        return self._wrap(latest_snapshot(self.ds, key=key, ts_col=ts_col))

    # ---------------------------------------------------------- windows

    def window_tumbling(self, keys: list[str], ts_col: str, size_us: int,
                        specs: Spec) -> "Stream":
        return self._wrap(
            tumbling_aggregate(self.ds, keys, ts_col, size_us, specs,
                               num_partitions=self.cfg.num_partitions)
        )

    def window_sliding(self, keys: list[str], ts_col: str, size_us: int,
                       slide_us: int, specs: Spec) -> "Stream":
        return self._wrap(
            sliding_aggregate(self.ds, keys, ts_col, size_us, slide_us, specs,
                              num_partitions=self.cfg.num_partitions)
        )

    def window_session(self, key: str, ts_col: str, gap_us: int) -> "Stream":
        return self._wrap(
            session_windows(self.ds, key, ts_col, gap_us,
                            num_partitions=self.cfg.num_partitions)
        )

    def aggregate(self, keys: list[str], specs: Spec) -> "Stream":
        return self._wrap(
            partial_aggregate(self.ds, keys, specs,
                              num_partitions=self.cfg.num_partitions)
        )

    # -------------------------------------------------------------- CEP

    def match_pattern(self, pattern: Pattern) -> "Stream":
        return self._wrap(
            match_pattern_batch(self.ds, pattern,
                                num_partitions=self.cfg.num_partitions)
        )

    # ------------------------------------------------------------ joins

    def join(self, other: "Stream | object", on, right_on=None,
             num_partitions: int | None = None,
             join_type: str = "inner") -> "Stream":
        ods = other.ds if isinstance(other, Stream) else other
        # Dataset.join spawns one aggregator ACTOR per partition; unlike
        # queued tasks, an actor pool larger than the CPU count can
        # deadlock a small cluster — cap the config-derived default
        np_ = num_partitions or min(self.cfg.num_partitions, 8)
        return self._wrap(
            hash_join(self.ds, ods, on=on, num_partitions=np_,
                      right_on=right_on, join_type=join_type)
        )

    def join_broadcast(self, small_df, on, how: str = "inner") -> "Stream":
        return self._wrap(broadcast_join(self.ds, small_df, on=on, how=how))

    def join_salted(self, other: "Stream | object", on: str, hot_keys: list,
                    num_salts: int = 8) -> "Stream":
        ods = other.ds if isinstance(other, Stream) else other
        return self._wrap(
            salted_join(self.ds, ods, on=on, hot_keys=hot_keys,
                        num_salts=num_salts)
        )

    def join_asof(self, other: "Stream | object", key: str, ts_col: str,
                  right_ts_col: str, **kw) -> "Stream":
        from gush_ray.stages.joins import asof_join

        ods = other.ds if isinstance(other, Stream) else other
        return self._wrap(asof_join(self.ds, ods, key=key, ts_col=ts_col,
                                    right_ts_col=right_ts_col, **kw))

    def join_interval(self, other: "Stream | object", key: str, ts_col: str,
                      right_ts_col: str, low_us: int, high_us: int,
                      **kw) -> "Stream":
        from gush_ray.stages.joins import interval_join

        ods = other.ds if isinstance(other, Stream) else other
        return self._wrap(interval_join(self.ds, ods, key=key,
                                        ts_col=ts_col,
                                        right_ts_col=right_ts_col,
                                        low_us=low_us, high_us=high_us,
                                        **kw))

    def dedup_minhash(self, text_col: str = "text", id_col: str = "doc_id",
                      **kw) -> "Stream":
        from gush_ray.stages.dedup import minhash_lsh_pairs

        return self._wrap(minhash_lsh_pairs(self.ds, text_col=text_col,
                                            id_col=id_col, **kw))

    def dedup_lines(self, id_col: str = "doc_id", text_col: str = "text",
                    **kw) -> "Stream":
        """Cross-corpus line dedup (C4/CCNet): keep each line at its
        first occurrence, reassemble documents."""
        from gush_ray.stages.corpus import line_dedup

        return self._wrap(line_dedup(self.ds, id_col=id_col,
                                     text_col=text_col, **kw))

    def scrub_repeats(self, id_col: str = "doc_id", text_col: str = "text",
                      **kw) -> "Stream":
        """Within-document repeated-line removal (shuffle-free)."""
        from gush_ray.stages.corpus import scrub_repeated_lines_batch

        return self._wrap(self.ds.map_batches(
            lambda b: scrub_repeated_lines_batch(b, id_col, text_col, **kw),
            batch_format="pandas"))

    def decontaminate(self, bench: "Stream | object", n: int = 4,
                      id_col: str = "doc_id", text_col: str = "text",
                      use_bloom: bool = False, **kw) -> "Stream":
        """Drop documents sharing any word n-gram with the benchmark
        stream (GPT-3-style eval decontamination); ``use_bloom`` bounds
        broadcast memory at corpus-scale benchmark sets (one-sided
        error: may over-drop, never under-drops)."""
        from gush_ray.stages.decontam import (decontaminate,
                                              decontaminate_bloom)

        bench_ds = bench.ds if isinstance(bench, Stream) else bench
        fn = decontaminate_bloom if use_bloom else decontaminate
        return self._wrap(fn(self.ds, bench_ds, n=n, id_col=id_col,
                             text_col=text_col, **kw))

    def dup_spans(self, k: int = 30, id_col: str = "doc_id",
                  text_col: str = "text", **kw) -> "Stream":
        """Per-document exact duplicated-substring span stats
        (Lee et al. 2021); ``winnow_w`` trades shuffle volume for a
        minimum detectable span length of k + w - 1."""
        from gush_ray.stages.decontam import duplicated_spans

        return self._wrap(duplicated_spans(self.ds, k=k, id_col=id_col,
                                           text_col=text_col, **kw))

    def dedup_substrings(self, k: int = 30, id_col: str = "doc_id",
                         text_col: str = "text", **kw) -> "Stream":
        """Cut every duplicated ≥k-char span out of every document
        (remove-all-copies exact substring dedup)."""
        from gush_ray.stages.decontam import remove_duplicated_spans

        return self._wrap(remove_duplicated_spans(
            self.ds, k=k, id_col=id_col, text_col=text_col, **kw))

    def sample_stratified(self, group_col: str, k: int,
                          id_col: str = "doc_id", **kw) -> "Stream":
        """Deterministic per-group quota sample (smallest md5(id))."""
        from gush_ray.stages.corpus import stratified_sample

        return self._wrap(stratified_sample(self.ds, group_col, k,
                                            id_col=id_col, **kw))

    def pack(self, count_col: str, budget: int, **kw) -> "Stream":
        """Greedy context-window packing into <=budget-token bins."""
        from gush_ray.stages.corpus import pack_sequences

        return self._wrap(pack_sequences(self.ds, count_col, budget, **kw))

    def redact(self, col: str, out: str = None, **kw) -> "Stream":
        """PII scrub: emails/IPs/phones/digit runs → placeholders."""
        from gush_ray.stages.text import redact_batch

        out = out or col
        return self.map_batches(lambda b: redact_batch(b, col, out, **kw))

    def heavy_hitters(self, col: str, k: int = 10, capacity: int = 256):
        """Terminal: bounded-memory top-k (pandas result, k rows)."""
        from gush_ray.stages.sketches import heavy_hitters

        return heavy_hitters(self.ds, col, k=k, capacity=capacity)

    def approx_distinct(self, col: str, p: int = 12) -> float:
        """Terminal: HyperLogLog approximate COUNT(DISTINCT col)."""
        from gush_ray.stages.sketches import approx_distinct

        return approx_distinct(self.ds, col, p=p)

    def union(self, other: "Stream") -> "Stream":
        return self._wrap(self.ds.union(other.ds))

    # ----------------------------------------------- analytic (OVER) ops

    def running(self, key: str, order_cols, cum_specs,
                row_number_col: str | None = "rn", **kw) -> "Stream":
        """Per-key running SUM/MIN/MAX/COUNT in ``order_cols`` order."""
        from gush_ray.stages.analytic import running_aggregate

        return self._wrap(running_aggregate(self.ds, key, order_cols,
                                            cum_specs, row_number_col, **kw))

    def lag(self, key: str, order_cols, lag_specs=None, delta_specs=None,
            **kw) -> "Stream":
        """Per-key LAG columns / current-minus-previous deltas."""
        from gush_ray.stages.analytic import lag_columns

        return self._wrap(lag_columns(self.ds, key, order_cols,
                                      lag_specs or {}, delta_specs, **kw))

    def rank(self, key: str, order_col: str, ascending: bool = True,
             **kw) -> "Stream":
        """Per-key RANK (+ DENSE_RANK) over ``order_col``."""
        from gush_ray.stages.analytic import rank_per_key

        return self._wrap(rank_per_key(self.ds, key, order_col,
                                       ascending, **kw))

    def ntile(self, key: str, order_cols, n: int, **kw) -> "Stream":
        """Per-key NTILE(n) bucketing (ANSI remainder semantics)."""
        from gush_ray.stages.analytic import ntile_per_key

        return self._wrap(ntile_per_key(self.ds, key, order_cols, n, **kw))

    def moving_window(self, key: str, ts_col: str, range_span: int,
                      sum_specs: dict[str, str], **kw) -> "Stream":
        """Per-key time-RANGE moving SUM/COUNT (ANSI peer semantics)."""
        from gush_ray.stages.analytic import moving_aggregate

        return self._wrap(moving_aggregate(self.ds, key, ts_col, range_span,
                                           sum_specs, **kw))

    def share_of(self, keys: list[str], value_col: str, **kw) -> "Stream":
        """Integer ratio-to-report: each row's share of its group total."""
        from gush_ray.stages.analytic import group_share

        return self._wrap(group_share(self.ds, keys, value_col, **kw))

    def zscore(self, key: str, value_col: str, **kw) -> "Stream":
        """Per-group z-score from exact integer sums."""
        from gush_ray.stages.analytic import group_zscore

        return self._wrap(group_zscore(self.ds, key, value_col, **kw))

    def similar_pairs_editdist(self, id_col: str, text_col: str,
                               **kw) -> "Stream":
        """Blocked edit-distance similarity self-join (id_a, id_b, dist)."""
        from gush_ray.stages.strings import prefix_blocked_editdist_pairs

        return self._wrap(prefix_blocked_editdist_pairs(
            self.ds, id_col, text_col, **kw))

    def rollup(self, keys: list[str], specs: Spec, **kw) -> "Stream":
        """GROUP BY ROLLUP over ``keys`` (coarser levels from partials)."""
        from gush_ray.stages.analytic import rollup_aggregate

        return self._wrap(rollup_aggregate(self.ds, keys, specs, **kw))

    def pivot(self, key: str, pivot_col: str, pivot_values: list,
              **kw) -> "Stream":
        """Crosstab: one count column per closed pivot value."""
        from gush_ray.stages.analytic import pivot_counts

        return self._wrap(pivot_counts(self.ds, key, pivot_col,
                                       pivot_values, **kw))

    def gopher_filter(self, col: str = "text",
                      keep_only: bool = True) -> "Stream":
        """Gopher-rule quality gate: annotate (and by default keep only
        passing) documents."""
        from gush_ray.stages.text import gopher_rules_batch

        s = self.map_batches(lambda b: gopher_rules_batch(b, col),
                             batch_format="pandas")
        if keep_only:
            s = s.map_batches(lambda b: b[b["gopher_pass"]],
                              batch_format="pandas")
        return s

    def bloom_semi(self, bloom, col: str, keep: bool = True) -> "Stream":
        """Semi/anti filter against a broadcast BloomFilter (the scale
        path of an exact broadcast semi join; one-sided error)."""
        from gush_ray.stages.sketches import bloom_semi_filter

        return self._wrap(bloom_semi_filter(self.ds, bloom, col, keep))

    def approx_quantiles(self, col: str, qs: list[float],
                         **kw) -> dict[float, float]:
        """Terminal: mergeable approximate quantiles (bounded memory)."""
        from gush_ray.stages.sketches import approx_quantiles

        return approx_quantiles(self.ds, col, qs, **kw)

    def exact_quantiles(self, col: str, qs: list[float],
                        **kw) -> dict[float, float]:
        """Terminal: EXACT quantiles with no global sort (shared
        histogram-refinement passes; DuckDB quantile_disc semantics)."""
        from gush_ray.stages.sketches import exact_quantiles_nosort

        return exact_quantiles_nosort(self.ds, col, qs, **kw)

    def exact_quantiles_by(self, key: str, col: str, qs: list[float],
                           **kw):
        """Terminal: per-group exact quantiles, shared refinement rounds
        across all (group, q) tasks. Returns a long (key, q, value)
        pandas frame."""
        from gush_ray.stages.sketches import grouped_exact_quantiles

        return grouped_exact_quantiles(self.ds, key, col, qs, **kw)

    def cluster_kmeans(self, k: int, emb_col: str = "embedding",
                       out_col: str = "cluster", **kw) -> "Stream":
        """Distributed k-means fit (full-data Lloyd, corpus never
        shuffles) + assign; adds ``out_col``."""
        from gush_ray.stages.clustering import kmeans_assign, kmeans_fit

        fit = kmeans_fit(self.ds, emb_col=emb_col, k=k, **kw)
        return self._wrap(kmeans_assign(self.ds, fit["centroids"],
                                        emb_col=emb_col, out_col=out_col))

    def dedup_semantic(self, k: int = 8, eps: float = 0.95,
                       emb_col: str = "embedding", id_col: str = "vec_id",
                       **kw) -> "Stream":
        """SemDeDup (arXiv:2303.09540): k-means the embedding space,
        drop items whose cosine to a farther-from-centroid clustermate
        exceeds ``eps``. Returns per-row flags (filter ``keep``)."""
        from gush_ray.stages.clustering import semdedup

        return self._wrap(semdedup(self.ds, emb_col=emb_col,
                                   id_col=id_col, k=k, eps=eps, **kw))

    def ann_topk(self, query_vec, k: int = 10, emb_col: str = "embedding",
                 id_col: str = "vec_id"):
        """Terminal: exact cosine top-k against a broadcast query
        (per-batch matmul + k-row merge)."""
        from gush_ray.stages.similarity import brute_force_topk

        return brute_force_topk(self.ds, query_vec, k=k, id_col=id_col,
                                emb_col=emb_col)

    def train_lm(self, col: str = "text", min_count: int = 2,
                 max_table: int = 500_000) -> dict:
        """Terminal: train the CCNet-style bigram LM distributed
        (stages/lm.py); pass the returned dict (or ``ray.put`` of it)
        to :meth:`lm_oov` / :meth:`lm_perplexity`."""
        from gush_ray.stages.lm import train_bigram_lm

        return train_bigram_lm(self.ds, col, min_count=min_count,
                               max_table=max_table)

    def lm_oov(self, lm, col: str = "text",
               id_cols: tuple = ("doc_id",)) -> "Stream":
        """Per-doc bigram out-of-vocabulary counts vs a trained LM."""
        import ray as _ray

        from gush_ray.stages.lm import score_oov

        ref = lm if not isinstance(lm, dict) else _ray.put(lm)
        return self._wrap(score_oov(self.ds, ref, col, id_cols))

    def lm_perplexity(self, lm, col: str = "text",
                      id_cols: tuple = ("doc_id",),
                      add_k: float = 0.1) -> "Stream":
        """Per-doc smoothed bigram NLL (CCNet-style quality score)."""
        import ray as _ray

        from gush_ray.stages.lm import score_perplexity

        ref = lm if not isinstance(lm, dict) else _ray.put(lm)
        return self._wrap(score_perplexity(self.ds, ref, col, id_cols,
                                           add_k=add_k))

    def train_bpe(self, col: str = "text", n_merges: int = 200,
                  max_words: int = 100_000) -> dict:
        """Terminal: learn a BPE tokenizer from the corpus
        (stages/bpe.py, word-histogram training)."""
        from gush_ray.stages.bpe import train_bpe

        return train_bpe(self.ds, col, n_merges=n_merges,
                         max_words=max_words)

    def tokenize_bpe(self, bpe: dict, col: str = "text",
                     id_cols: tuple = ("doc_id",), **kw) -> "Stream":
        """Tokenize with a trained BPE (broadcast once, actor pool)."""
        from gush_ray.stages.bpe import apply_bpe

        return self._wrap(apply_bpe(self.ds, bpe, col, id_cols, **kw))

    def normalize_unicode(self, col: str = "text", form: str = "NFC",
                          **kw) -> "Stream":
        """Unicode-normalize a text column (stdlib; pre-dedup step)."""
        from gush_ray.stages.corpus import normalize_text

        return self._wrap(normalize_text(self.ds, col=col, form=form, **kw))

    def extract_links(self, html_col: str = "html",
                      url_col: str = "url") -> "Stream":
        """Explode pages into (src_url, dst_url) anchor edges
        (stages/web.extract_links_table — vectorized, closed-quote
        rule)."""
        from gush_ray.stages.web import extract_links_table

        def fn(b: pa.Table) -> pa.Table:
            return extract_links_table(b, html_col=html_col,
                                       url_col=url_col)

        return self._wrap(self.ds.map_batches(
            fn, batch_format="pyarrow", zero_copy_batch=True))

    def canonicalize_urls(self, col: str = "url",
                          out: str | None = None) -> "Stream":
        """Add the canonical form of a URL column (stages/web 5-rule
        set; ``out=None`` replaces the column in place)."""
        from gush_ray.stages.web import canonicalize_urls

        def fn(b: pa.Table) -> pa.Table:
            canon = canonicalize_urls(b[col])
            if out is None:
                return b.set_column(b.schema.get_field_index(col),
                                    col, canon)
            return b.append_column(out, canon)

        return self._wrap(self.ds.map_batches(
            fn, batch_format="pyarrow", zero_copy_batch=True))

    def pagerank(self, nodes: "Stream | object", src_col: str = "src",
                 dst_col: str = "dst", node_col: str = "node",
                 iters: int = 8) -> "Stream":
        """Integer-exact PageRank over this stream as an edge list
        (stages/web.pagerank — distributed join path; ranks stay
        distributed)."""
        from gush_ray.stages.web import pagerank

        nds = nodes.ds if isinstance(nodes, Stream) else nodes
        return self._wrap(pagerank(self.ds, nds, iters=iters,
                                   src_col=src_col, dst_col=dst_col,
                                   node_col=node_col))

    def resolve_redirects(self, src_col: str = "src",
                          dst_col: str = "dst", max_rounds: int = 6,
                          num_partitions: int = 16) -> "Stream":
        """Redirect-chain resolution by pointer doubling over this
        stream as a functional edge list (stages/web.resolve_redirects);
        cycles are flagged, never looped on."""
        from gush_ray.stages.web import resolve_redirects

        return self._wrap(resolve_redirects(
            self.ds, src_col=src_col, dst_col=dst_col,
            max_rounds=max_rounds, num_partitions=num_partitions))

    def linear_probe(self, feature_cols: list, target_col: str,
                     scale: int = 10**6):
        """Integer-exact distributed least squares (returns the one-row
        coefficient DataFrame, not a Stream — it is a scalar fit)."""
        from gush_ray.stages.linear import linear_probe

        return linear_probe(self.ds, feature_cols, target_col,
                            scale=scale)

    def triangle_counts(self, src_col: str = "src", dst_col: str = "dst",
                        num_partitions: int = 16) -> "Stream":
        """Per-node triangle participation over this stream as an edge
        list (stages/web.triangle_counts — orient/dedupe, wedge join,
        composite-key closing join)."""
        from gush_ray.stages.web import triangle_counts

        return self._wrap(triangle_counts(
            self.ds, src_col=src_col, dst_col=dst_col,
            num_partitions=num_partitions))

    def hosts(self, col: str = "url", out: str = "host") -> "Stream":
        """Append the url column's authority as ``out`` (one RE2 pass,
        stages/web.host_of_urls; non-url rows get null)."""
        from gush_ray.stages.web import host_of_urls

        def add(b: pa.Table) -> pa.Table:
            return b.append_column(out, host_of_urls(b[col]))

        return self.map_batches(add, batch_format="pyarrow")

    def remove_boilerplate(self, group_col: str = "host",
                           id_col: str = "doc_id", text_col: str = "text",
                           min_docs: int = 3,
                           num_partitions: int = 16) -> "Stream":
        """Per-group line-frequency boilerplate removal
        (stages/corpus.boilerplate_removal)."""
        from gush_ray.stages.corpus import boilerplate_removal

        return self._wrap(boilerplate_removal(
            self.ds, group_col=group_col, id_col=id_col,
            text_col=text_col, min_docs=min_docs,
            num_partitions=num_partitions))

    # ------------------------------------------------------------ sinks

    def sink_parquet(self, path: str, **kw) -> None:
        self.ds.write_parquet(path, **kw)

    def sink_jsonl(self, path: str) -> None:
        from gush_ray.sources.formats import write_jsonl

        write_jsonl(self.ds, path)

    def sink_csv(self, path: str) -> None:
        from gush_ray.sources.formats import write_csv

        write_csv(self.ds, path)

    def to_pandas(self):
        return self.ds.to_pandas()

    def to_arrow(self) -> pa.Table:
        import ray

        tabs = [t for t in ray.get(self.ds.to_arrow_refs()) if t.num_rows]
        if not tabs:
            schema = self.ds.schema()
            base = getattr(schema, "base_schema", None)
            if isinstance(base, pa.Schema):
                return base.empty_table()
            return pa.table({})
        return pa.concat_tables(tabs, promote_options="default")

    def count(self) -> int:
        return self.ds.count()

    def take(self, n: int = 20):
        return self.ds.take(n)
