"""Distributed BPE training + application: histogram-equals-corpus
training, merge quality, lossless round trip, determinism."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(9)
    base = ["streaming", "streams", "windowed", "windows", "window",
            "watermark", "watermarks", "partition", "partitions",
            "exactly", "once", "the", "and", "of"]
    docs = [" ".join(rng.choice(base, size=40)) for _ in range(50)]
    df = pd.DataFrame({"doc_id": range(50), "text": docs})
    return rd.from_pandas(df), df


def test_train_learns_frequent_pairs(corpus):
    from gush_ray.stages.bpe import train_bpe

    ds, _df = corpus
    bpe = train_bpe(ds, n_merges=60)
    merged_symbols = {a + b for a, b in bpe["merges"]}
    # shared stems of the vocabulary must emerge as single symbols
    assert any("wind" in s for s in merged_symbols)
    assert any("stream" in s for s in merged_symbols)


def test_histogram_training_equals_bruteforce(corpus):
    """Training on the word histogram == training on the raw corpus
    (BPE pair counts are a pure function of the histogram)."""
    from collections import Counter

    from gush_ray.stages.bpe import _END, train_bpe

    ds, df = corpus
    got = train_bpe(ds, n_merges=30)["merges"]

    # brute force on the concatenated corpus
    cnt = Counter(w for t in df["text"] for w in t.split())
    seqs = [tuple(w) + (_END,) for w in cnt]
    freqs = list(cnt.values())
    merges = []
    for _ in range(30):
        pc = Counter()
        for seq, f in zip(seqs, freqs):
            for p in zip(seq, seq[1:]):
                pc[p] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < 2:
            break
        merges.append(best)
        a, b = best
        out_seqs = []
        for seq in seqs:
            o, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    o.append(a + b); i += 2
                else:
                    o.append(seq[i]); i += 1
            out_seqs.append(tuple(o))
        seqs = out_seqs
    assert got == merges


def test_apply_roundtrip_and_compression(corpus):
    from gush_ray.stages.bpe import apply_bpe, detokenize, train_bpe

    ds, df = corpus
    bpe = train_bpe(ds, n_merges=80)
    out = apply_bpe(ds, bpe).to_pandas().sort_values("doc_id")
    merged = out.merge(df, on="doc_id")
    for _i, row in merged.iterrows():
        assert detokenize(list(row["tokens"])) == row["text"]
    # BPE must compress: far fewer tokens than characters, more than words
    n_chars = df["text"].str.replace(" ", "").str.len().sum()
    assert out["n_tokens"].sum() < 0.5 * n_chars
    assert (out["n_tokens"] >= out["n_words"]).all()


def test_train_deterministic(corpus):
    from gush_ray.stages.bpe import train_bpe

    ds, _df = corpus
    assert train_bpe(ds, n_merges=40)["merges"] == \
        train_bpe(ds, n_merges=40)["merges"]


def test_sql_oracle_handles_back_to_back_pair_occurrences(tmp_path):
    """Regression (round-3 review, twice): replace() over the old
    single-separator encoding consumed the trailing separator, skipping
    the immediately following occurrence of the merged pair ('abab'
    diverged) — and the replace-to-fixpoint nesting that patched a≠b
    pairs still MIS-PAIRED self-pair runs ('aaaaa' fixpointed to
    [aa,a,aa] where the trainer sweeps to [aa,aa,a]; 'aaaaaa' then
    diverges in n_tokens once (aa,aa) merges). The bracketed
    chr(30)/chr(31) encoding makes one replace() exactly the sweep.
    Pin the SQL against the engine on a corpus built to hit both."""
    import duckdb

    from gush_ray.pipelines.queries_extra import _build_sql_bpe_tokenize
    from gush_ray.stages.bpe import _encode_word, train_bpe

    df = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "lang": ["en"] * 10,
        # 'abab'/'ababab' have back-to-back (a,b) occurrences INSIDE a
        # word; repetition gives the pairs count >= 2 so they merge.
        # 'aaaaa'/'aaaaaa' are odd/even self-pair runs — the sweep
        # pairs them strictly left-to-right
        "text": ["abab ababab zq", "abab ababab", "abab zq",
                 "ababab", "aaaa", "aaaa aaa", "zq zq", "abab aaaa",
                 "aaaaa aaaaaa", "aaaaaa aaaaa aaaa"],
    })
    pq_path = tmp_path / "documents.parquet"
    df.to_parquet(pq_path)

    ds = rd.from_pandas(df)
    bpe = train_bpe(ds, n_merges=12, max_words=1000)
    rows = []
    for _, r in df.iterrows():
        words = r["text"].split()
        ntok = sum(len(_encode_word(w, bpe["ranks"])) for w in words)
        rows.append((r["lang"], 1, len(words), ntok))
    want = (pd.DataFrame(rows, columns=["lang", "n_docs", "n_words",
                                        "n_tokens"])
            .groupby("lang", as_index=False).sum())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pq_path}'")
    got = con.execute(_build_sql_bpe_tokenize(n_merges=12,
                                              max_words=1000)).fetchdf()
    pd.testing.assert_frame_equal(
        want.astype({c: "int64" for c in ["n_docs", "n_words",
                                          "n_tokens"]}),
        got.astype({c: "int64" for c in ["n_docs", "n_words",
                                         "n_tokens"]}))


OPEN, CLOSE = "\x1e", "\x1f"


def _render(syms):
    return "".join(OPEN + s + CLOSE for s in syms)


def _parse(s):
    return [x for x in s.replace(OPEN, "").split(CLOSE) if x]


def _sweep(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_bracketed_replace_equals_trainer_sweep_property():
    """Property pin for the SQL training step's core claim: with each
    symbol rendered chr(30)||sym||chr(31), ONE replace() equals the
    trainer's left-to-right non-overlapping sweep, for ANY symbol
    sequence and merge pair — including self-pairs (a,a), which the
    older single-separator fixpoint encoding mis-paired (hypothesis
    found ['ab']*5 with merge (ab,ab)). Python str.replace has exactly
    DuckDB replace()'s left-to-right non-overlap semantics, so this
    pins the SQL behavior without a database."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.lists(st.sampled_from(["a", "b", "ab", "ba"]),
                    min_size=1, max_size=40),
           st.sampled_from([("a", "b"), ("a", "a"), ("b", "a"),
                            ("ab", "a"), ("a", "ab"), ("ab", "ab"),
                            ("ba", "ba"), ("b", "b")]))
    @settings(max_examples=400, deadline=None)
    def check(syms, pair):
        a, b = pair
        got = _parse(_render(syms).replace(
            OPEN + a + CLOSE + OPEN + b + CLOSE, OPEN + a + b + CLOSE))
        assert got == _sweep(syms, a, b), (syms, pair)

    check()


def test_sql_encoder_equals_engine_encode_property():
    """Property pin for the SQL ENCODER's claim: replacing ALL
    occurrences of the min-rank pair present (one bracketed replace),
    then recursing, equals the engine's one-occurrence-at-a-time
    greedy loop (_encode_word) — merging a min-rank occurrence can
    neither create a pair of rank ≤ it nor destroy a non-overlapping
    occurrence, and overlapping self-pair runs resolve left-to-right
    in both."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gush_ray.stages.bpe import _END, _encode_word, train_bpe

    @given(st.lists(st.text(alphabet="ab", min_size=1, max_size=8),
                    min_size=2, max_size=12),
           st.integers(min_value=1, max_value=10))
    @settings(max_examples=100, deadline=None)
    def check(words, n_merges):
        df = pd.DataFrame({"doc_id": range(len(words)),
                           "text": words})
        bpe = train_bpe(rd.from_pandas(df), n_merges=n_merges,
                        max_words=1000)
        ranks = bpe["ranks"]
        for w in set(words):
            # SQL-mirror: replace-all of the min-rank pair, recurse
            syms = list(w) + [_END]
            s = _render(syms)
            while True:
                present = [(r, a, b) for (a, b), r in ranks.items()
                           if OPEN + a + CLOSE + OPEN + b + CLOSE in s]
                if not present:
                    break
                _, a, b = min(present)
                s = s.replace(OPEN + a + CLOSE + OPEN + b + CLOSE,
                              OPEN + a + b + CLOSE)
            assert _parse(s) == _encode_word(w, ranks), (w, ranks)

    check()
