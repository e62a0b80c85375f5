"""Content-defined chunking: boundary properties + the CDC
shift-invariance that makes it a sub-document dedup primitive."""

import numpy as np
import pandas as pd

import ray.data as rd

from gush_ray.stages.chunking import _rolling_boundaries, chunk_batch


def _text(seed, n_words=400):
    rng = np.random.RandomState(seed)
    words = [f"w{v}" for v in rng.randint(0, 5000, n_words)]
    return " ".join(words)


def test_boundaries_cover_and_respect_limits():
    data = _text(1).encode()
    ends = _rolling_boundaries(data, window=16, modulus=64,
                               min_len=24, max_len=256)
    assert ends[-1] == len(data)
    lens = np.diff([0] + ends)
    assert (lens <= 256).all()
    # every chunk except possibly the last respects min_len
    assert (lens[:-1] >= 24).all()
    assert len(ends) > 3  # actually chunks at expected ~64-byte scale


def test_chunks_deterministic_and_reassemble():
    df = pd.DataFrame({"doc_id": [1, 2], "text": [_text(2), _text(3)]})
    a = chunk_batch(df.copy())
    b = chunk_batch(df.copy())
    pd.testing.assert_frame_equal(a, b)
    for did, g in a.groupby("doc_id"):
        total = g["chunk_len"].sum()
        assert total == len(df.loc[df.doc_id == did, "text"].iloc[0].encode())
        assert (g["chunk_idx"].to_numpy() == np.arange(len(g))).all()


def test_cdc_shift_invariance():
    """THE content-defined property: a tail edit leaves earlier chunks
    untouched, and a prepended insertion re-aligns after the first
    boundary — fixed-size chunking would shift every chunk."""
    base = _text(4, 600)
    df0 = chunk_batch(pd.DataFrame({"doc_id": [0], "text": [base]}))

    # tail edit: all chunks before the edit unchanged
    edited = base[:-30] + " xxxx yyyy zzzz"
    df1 = chunk_batch(pd.DataFrame({"doc_id": [0], "text": [edited]}))
    h0, h1 = df0["chunk_hash"].tolist(), df1["chunk_hash"].tolist()
    assert len(h0) > 4
    assert h0[:-2] == h1[: len(h0) - 2]

    # prepend: chunk hashes re-align (suffix of hashes shared)
    shifted = "PREPENDED HEAD CONTENT " + base
    df2 = chunk_batch(pd.DataFrame({"doc_id": [0], "text": [shifted]}))
    h2 = df2["chunk_hash"].tolist()
    shared = set(h0) & set(h2)
    assert len(shared) >= len(h0) - 3  # nearly all chunks recovered


def test_chunk_dedup_finds_shared_paragraphs():
    """Two docs sharing a large middle section share chunk hashes."""
    mid = _text(7, 300)
    d1 = _text(5, 100) + " " + mid
    d2 = _text(6, 100) + " " + mid
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2],
                                      "text": [d1, d2]}))
    from gush_ray.stages.chunking import chunk_documents

    ch = chunk_documents(ds).to_pandas()
    dup = ch.groupby("chunk_hash")["doc_id"].nunique()
    assert (dup >= 2).sum() >= 2  # shared chunks detected across docs
