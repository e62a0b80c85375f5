"""Corpus-cleaning operators for training-data pipelines: cross-corpus
line-level dedup (C4/CCNet-style "remove duplicated lines across
documents"), within-document repetition scrubbing, deterministic
stratified sampling, and greedy sequence packing.

"Line" = a fixed-width chunk of WORDS_PER_LINE whitespace words (the
fixture corpus has no newline characters; both the Ray pipelines and the
DuckDB oracles define lines identically, so the operators stay
SQL-checkable — with real web text pass ``split_re="\\n"``-style custom
splitting at the explode stage instead).

Scale shape: line dedup is inherently one shuffle of the exploded lines
by line content (that IS the operator — CCNet shards lines by hash the
same way) plus one shuffle of the kept lines back by doc_id for
reassembly. Only lines move, never whole documents, and the second
shuffle can ship (doc_id, line_no) pairs + a hash-join when line text
dominates (documented below).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

WORDS_PER_LINE = 10


def explode_lines_batch(df: pd.DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        words_per_line: int = WORDS_PER_LINE) -> pd.DataFrame:
    """doc rows → (doc_id, line_no, line) rows.

    Word splitting is vectorized (`.str.split`); line assembly joins
    word slices per line — Python work proportional to the OUTPUT size
    (line count), not an inner per-character loop.
    """
    words = df[text_col].fillna("").str.split(" ")
    ids = df[id_col].to_numpy()
    out_ids, out_no, out_line = [], [], []
    w = words_per_line
    for did, ws in zip(ids, words):
        n = (len(ws) + w - 1) // w
        for ln in range(n):
            out_ids.append(did)
            out_no.append(ln)
            out_line.append(" ".join(ws[ln * w:(ln + 1) * w]))
    return pd.DataFrame({
        id_col: np.asarray(out_ids, dtype=ids.dtype if len(out_ids) else "int64"),
        "line_no": np.asarray(out_no, dtype="int64"),
        "line": pd.Series(out_line, dtype="object"),
    })


def line_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
               words_per_line: int = WORDS_PER_LINE,
               num_partitions: int = 16):
    """Cross-corpus line dedup: every line that appears in multiple
    documents is kept ONLY at its first occurrence (min (doc_id,
    line_no) — deterministic), then documents are reassembled from their
    surviving lines. Documents whose every line was claimed elsewhere
    drop out (same as the SQL oracle's inner aggregation).

    Two line-sized shuffles: explode → hash-partition by line content →
    keep-first → hash-partition by doc → reassemble. At 100 TB, if line
    text dominates the exchange, shuffle (line_hash, doc_id, line_no)
    for the dedup leg and hash-join winners back to the exploded lines
    instead of shipping text twice.
    """
    from gush_ray.stages.shuffle import partition_map

    lines = ds.map_batches(
        lambda b: explode_lines_batch(b, id_col, text_col, words_per_line),
        batch_format="pandas",
    )

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["line", id_col, "line_no"], kind="mergesort")
        return df.groupby("line", sort=False).head(1)

    kept = partition_map(lines, "line", keep_first, num_partitions)

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "line_no"], kind="mergesort")
        g = df.groupby(id_col, sort=False)
        return pd.DataFrame({
            id_col: g[id_col].first().to_numpy(),
            "text": g["line"].agg(" ".join).to_numpy(),
            "n_lines": g.size().to_numpy().astype("int64"),
        })

    return partition_map(kept, id_col, reassemble, num_partitions)


def scrub_repeated_lines_batch(df: pd.DataFrame, id_col: str = "doc_id",
                               text_col: str = "text",
                               words_per_line: int = WORDS_PER_LINE
                               ) -> pd.DataFrame:
    """Within-document repetition removal: drop duplicate lines INSIDE
    each document (keep the first occurrence, preserve order). Pure
    per-batch transform — a document never spans batches, so this needs
    NO shuffle at any scale.
    """
    lines = explode_lines_batch(df, id_col, text_col, words_per_line)
    dup = lines.duplicated(subset=[id_col, "line"], keep="first")
    kept = lines[~dup]
    g = kept.groupby(id_col, sort=False)
    return pd.DataFrame({
        id_col: g[id_col].first().to_numpy(),
        "text": g["line"].agg(" ".join).to_numpy(),
        "n_lines": g.size().to_numpy().astype("int64"),
    })


def _md5_hex(values) -> list[str]:
    return [hashlib.md5(str(v).encode()).hexdigest() for v in values]


def stratified_sample(ds, group_col: str, k: int, id_col: str = "doc_id",
                      num_partitions: int = 8):
    """Deterministic per-group sample: the k documents with the smallest
    md5(id) per group — a reproducible 'random' quota sample (training
    mixture construction). Combiner shape: each batch reduces to ≤k rows
    per group BEFORE the shuffle, so the exchange moves O(groups × k)
    rows regardless of corpus size.
    """
    from gush_ray.stages.shuffle import partition_map

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(__h=_md5_hex(df[id_col]))
        df = df.sort_values([group_col, "__h", id_col], kind="mergesort")
        return df.groupby(group_col, sort=False).head(k)

    partials = ds.map_batches(topk, batch_format="pandas")
    merged = partition_map(partials, group_col, topk, num_partitions)
    return merged.drop_columns(["__h"])


def pack_sequences(ds, count_col: str, budget: int, id_col: str = "doc_id",
                   num_partitions: int = 16):
    """Greedy sequence packing: assign documents to bins of at most
    ``budget`` tokens (training context-window packing). Docs are
    processed in deterministic (hash-partition, doc_id) order; a doc
    larger than the budget gets its own bin. Bin ids are globally unique
    as (partition << 32) | local_bin. Packing is per-partition (no
    global coordination — the 100-TB shape), so bin fill is optimal only
    within a partition.
    """
    from gush_ray.stages.shuffle import PART_COL, add_partition_column

    with_part = add_partition_column(ds, id_col, num_partitions)

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort")
        part = int(df[PART_COL].iloc[0])
        counts = df[count_col].to_numpy()
        bins = np.empty(len(df), dtype="int64")
        bin_id, fill = 0, 0
        for i, c in enumerate(counts):
            c = int(c)
            if fill and fill + c > budget:
                bin_id += 1
                fill = 0
            bins[i] = (part << 32) | bin_id
            fill += c
        out = df.drop(columns=[PART_COL]).copy()
        out["bin_id"] = bins
        return out

    return with_part.groupby(PART_COL).map_groups(pack, batch_format="pandas")


def normalize_text_batch(df: pd.DataFrame, col: str = "text",
                         out: "str | None" = None,
                         form: str = "NFC") -> pd.DataFrame:
    """Unicode-normalize a text column (stdlib ``unicodedata``; NFC by
    default — the canonical first step of every web-text pipeline:
    byte-different but canonically-equal strings must hash equal before
    any dedup/fingerprint stage sees them)."""
    import unicodedata

    out = out or col
    df = df.copy()
    df[out] = [
        unicodedata.normalize(form, t) if t is not None else None
        for t in df[col].tolist()
    ]
    return df


def normalize_text(ds, col: str = "text", out: "str | None" = None,
                   form: str = "NFC"):
    return ds.map_batches(
        lambda b: normalize_text_batch(b, col=col, out=out, form=form),
        batch_format="pandas",
    )


def explode_newline_lines_batch(df: pd.DataFrame, id_col: str = "doc_id",
                                group_col: str = "host",
                                text_col: str = "text") -> pd.DataFrame:
    """doc rows → (id, group, line_no, line) rows split on REAL
    newlines (web-page shape), unlike the fixed-word-width chunks of
    :func:`explode_lines_batch` (documents-table shape). line_no is
    1-based to match the SQL twin's ``range(1, len+1)`` ordinality."""
    lines = df[text_col].fillna("").str.split("\n")
    ids = df[id_col].to_numpy()
    grps = df[group_col].to_numpy()
    n = lines.str.len().to_numpy()
    out_ids = np.repeat(ids, n)
    out_grp = np.repeat(grps, n)
    out_no = np.concatenate([np.arange(1, k + 1) for k in n]) \
        if len(n) else np.empty(0, dtype="int64")
    flat = [ln for ls in lines for ln in ls]
    return pd.DataFrame({
        id_col: out_ids,
        group_col: out_grp,
        "line_no": out_no.astype("int64"),
        "line": pd.Series(flat, dtype="object"),
    })


def boilerplate_removal(ds, group_col: str = "host",
                        id_col: str = "doc_id", text_col: str = "text",
                        min_docs: int = 3, num_partitions: int = 16):
    """Per-group (per-host) boilerplate removal, CCNet/C4-style: a line
    that appears in ``>= min_docs`` DISTINCT documents of the same group
    is boilerplate (nav bars, cookie banners, copyright footers) and is
    dropped from every document of that group; surviving lines are
    reassembled in order. Documents left with zero lines drop out
    (inner reassembly, same as the SQL oracle's inner aggregation).

    Scale shape (the CCNet sharding): explode → per-doc dedupe INSIDE
    the explode batch (a doc never spans batches, so count(*) over the
    deduped rows == count(DISTINCT doc) — no distinct-agg shuffle) →
    partial-agg counts per (group, line) → the boilerplate set flows
    back as the BUILD side of a hash join against the exploded lines
    (left_outer + null-filter ≡ anti join; Ray's Dataset.join has no
    anti type) → reassemble with one doc-keyed shuffle. Only lines move,
    never whole documents, and the boilerplate side of the join is tiny
    by definition (lines repeated across many docs compress to one row).
    """
    from gush_ray.stages.agg import partial_aggregate
    from gush_ray.stages.joins import hash_join
    from gush_ray.stages.shuffle import partition_map

    lines = ds.map_batches(
        lambda b: explode_newline_lines_batch(b, id_col, group_col,
                                              text_col),
        batch_format="pandas",
    )

    freq = partial_aggregate(
        lines.map_batches(
            lambda b: b.drop_duplicates([id_col, group_col, "line"])[
                [group_col, "line"]],
            batch_format="pandas"),
        [group_col, "line"], {"n_docs": (None, "count")},
        num_partitions=num_partitions,
    )
    boiler = freq.map_batches(
        lambda b: b[b["n_docs"] >= min_docs], batch_format="pandas",
    ).repartition(4).materialize()

    # corpus with NO boilerplate at all: the filtered build side comes
    # back schemaless (the map_groups empty-block gotcha) and the hash
    # join rejects it — pass every line through instead of joining
    sch = boiler.schema(fetch_if_missing=True)
    if sch is None or "n_docs" not in sch.names:
        kept = lines.map_batches(
            lambda b: b[[id_col, "line_no", "line"]],
            batch_format="pandas")
    else:
        kept = hash_join(lines, boiler, on=(group_col, "line"),
                         join_type="left_outer").map_batches(
            lambda b: b[b["n_docs"].isna()][[id_col, "line_no", "line"]],
            batch_format="pandas")

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "line_no"], kind="mergesort")
        g = df.groupby(id_col, sort=False)
        return pd.DataFrame({
            id_col: g[id_col].first().to_numpy(),
            "text": g["line"].agg("\n".join).to_numpy(),
            "n_kept": g.size().to_numpy().astype("int64"),
        })

    return partition_map(kept, id_col, reassemble, num_partitions)
