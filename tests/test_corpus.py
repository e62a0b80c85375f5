"""Corpus-cleaning operator tests (line dedup, scrub, sampling, packing,
redaction) — semantics pinned on synthetic fixtures before the oracle
comparison in test_oracle.py."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from gush_ray.stages.corpus import (
    explode_lines_batch,
    line_dedup,
    pack_sequences,
    scrub_repeated_lines_batch,
    stratified_sample,
)
from gush_ray.stages.text import redact_batch


def test_explode_lines_chunks_words():
    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["a b c d e", "x y"]})
    out = explode_lines_batch(df, words_per_line=3)
    assert list(out.itertuples(index=False, name=None)) == [
        (1, 0, "a b c"), (1, 1, "d e"), (2, 0, "x y"),
    ]


def test_explode_lines_empty_text():
    df = pd.DataFrame({"doc_id": [1], "text": [""]})
    out = explode_lines_batch(df, words_per_line=3)
    # "" splits to [""] -> one empty line (same as the SQL oracle)
    assert list(out.itertuples(index=False, name=None)) == [(1, 0, "")]


def test_line_dedup_keeps_first_occurrence():
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c x y z", "a b c q r s", "q r s only here kept"],
    })
    out = (
        line_dedup(rd.from_pandas(docs), words_per_line=3, num_partitions=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # "a b c" kept in doc 1 only; "q r s" kept in doc 2 only
    assert out.loc[out.doc_id == 1, "text"].iloc[0] == "a b c x y z"
    assert out.loc[out.doc_id == 2, "text"].iloc[0] == "a b c q r s".replace("a b c ", "")
    assert out.loc[out.doc_id == 3, "text"].iloc[0] == "only here kept"
    assert out.n_lines.tolist() == [2, 1, 1]


def test_line_dedup_drops_fully_claimed_doc():
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a b c", "a b c"],
    })
    out = line_dedup(rd.from_pandas(docs), words_per_line=3,
                     num_partitions=2).to_pandas()
    assert out.doc_id.tolist() == [1]


def test_scrub_repeated_lines_preserves_order():
    df = pd.DataFrame({
        "doc_id": [7],
        "text": ["a b c d e f a b c g h i"],
    })
    out = scrub_repeated_lines_batch(df, words_per_line=3)
    assert out.text.iloc[0] == "a b c d e f g h i"
    assert out.n_lines.iloc[0] == 3


def test_stratified_sample_matches_pandas_reference():
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "doc_id": np.arange(300),
        "lang": rng.choice(["en", "de", "fr"], 300),
    })
    out = (
        stratified_sample(rd.from_pandas(df), "lang", k=5)
        .to_pandas().sort_values(["lang", "doc_id"]).reset_index(drop=True)
    )
    ref = df.assign(
        h=[hashlib.md5(str(x).encode()).hexdigest() for x in df.doc_id]
    ).sort_values(["lang", "h", "doc_id"]).groupby("lang").head(5)
    ref = ref[["doc_id", "lang"]].sort_values(
        ["lang", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[["doc_id", "lang"]], ref)


def test_pack_sequences_invariants():
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "doc_id": np.arange(200),
        "n_tokens": rng.integers(10, 400, 200).astype("int64"),
    })
    out = pack_sequences(rd.from_pandas(df), "n_tokens", budget=512,
                         num_partitions=4).to_pandas()
    # every doc assigned exactly once
    assert sorted(out.doc_id) == list(range(200))
    # bin budget respected (no doc here exceeds the budget alone)
    sums = out.groupby("bin_id")["n_tokens"].sum()
    assert (sums <= 512).all()
    # deterministic
    out2 = pack_sequences(rd.from_pandas(df), "n_tokens", budget=512,
                          num_partitions=4).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True))


def test_pack_sequences_oversized_doc_gets_own_bin():
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "n_tokens": [600, 10, 10]})
    out = pack_sequences(rd.from_pandas(df), "n_tokens", budget=512,
                         num_partitions=1).to_pandas().sort_values("doc_id")
    assert out.bin_id.iloc[0] != out.bin_id.iloc[1]
    assert out.bin_id.iloc[1] == out.bin_id.iloc[2]


def test_redact_batch_patterns():
    t = pa.table({"s": [
        "mail me at bob.smith+x@example.co.uk now",
        "server 10.0.255.3 down",
        "call +1 (555) 123-4567 today",
        "order 12345 shipped",
        None,
    ]})
    out = redact_batch(t, "s", "clean")["clean"].to_pylist()
    assert out[0] == "mail me at <EMAIL> now"
    assert out[1] == "server <IP> down"
    assert out[2] == "call <PHONE> today"
    assert out[3] == "order <NUM> shipped"
    assert out[4] is None


def test_robots_filter_stage_semantics():
    """RFC 9309 decisions through the vectorized stage: prefix rules,
    wildcard+$ anchor, longest-match with Allow on ties, unknown sites
    pass, bare-host urls default to path '/', drop mode filters."""
    import pyarrow as pa

    from gush_ray.stages.robots import RobotsFilter

    rules = {"a.org": "User-agent: *\nDisallow: /x\nAllow: /x/ok\n",
             "b.org": "User-agent: *\nDisallow: /*private$\n"}
    t = pa.table({"url": [
        "https://a.org/x/1",        # disallowed (/x)
        "https://a.org/x/ok/2",     # allowed (longer Allow wins)
        "https://a.org/y",          # no matching rule
        "https://b.org/docs/private",   # anchored wildcard hits
        "https://b.org/private/page",   # $ anchor does NOT hit
        "https://b.org",            # bare host → path '/'
        "https://c.org/x/1",        # unknown site → allowed
    ]})
    out = RobotsFilter(rules)(t)
    assert out["allowed"].to_pylist() == [
        False, True, True, False, True, True, True]
    kept = RobotsFilter(rules, drop=True)(t)
    assert kept.num_rows == 5


# ---------------------------------------------------------------------------
# per-host boilerplate removal
# ---------------------------------------------------------------------------

def test_boilerplate_removal_semantics():
    """min_docs is a DISTINCT-document count per (host, line): a line
    repeated twice inside ONE doc is not boilerplate; a line in 3 docs
    of the same host is; the same line on a DIFFERENT host is not; an
    all-boilerplate doc drops out of the output."""
    import ray.data as rd

    from gush_ray.stages.corpus import boilerplate_removal

    rows = [
        # host A: "nav" in docs 0,1,2 (boilerplate at min_docs=3)
        (0, "A", "nav\nalpha\nalpha"),     # alpha ×2 inside one doc: kept
        (1, "A", "nav\nbeta"),
        (2, "A", "nav"),                   # all boilerplate → drops out
        # host B: "nav" appears in only 1 doc here → kept on B
        (3, "B", "nav\ngamma"),
    ]
    ds = rd.from_pandas(pd.DataFrame(rows,
                                     columns=["doc_id", "host", "text"]))
    got = boilerplate_removal(ds, min_docs=3, num_partitions=4).to_pandas()
    out = dict(zip(got["doc_id"], got["text"]))
    assert out == {0: "alpha\nalpha", 1: "beta", 3: "nav\ngamma"}
    n = dict(zip(got["doc_id"], got["n_kept"]))
    assert n == {0: 2, 1: 1, 3: 2}


def test_boilerplate_removal_none_found_passthrough():
    """Corpus with NO line reaching min_docs: the empty boilerplate
    build side must not crash the join (schemaless empty-block gotcha)
    — every document passes through unchanged."""
    import ray.data as rd

    from gush_ray.stages.corpus import boilerplate_removal

    rows = [(0, "A", "x\ny"), (1, "A", "z"), (2, "B", "w")]
    ds = rd.from_pandas(pd.DataFrame(rows,
                                     columns=["doc_id", "host", "text"]))
    got = boilerplate_removal(ds, min_docs=3, num_partitions=4).to_pandas()
    assert dict(zip(got["doc_id"], got["text"])) == {
        0: "x\ny", 1: "z", 2: "w"}
