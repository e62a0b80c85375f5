"""Content-defined chunking (CDC) — the shift-invariant document
splitter used for sub-document dedup in training-data pipelines.

A boundary is declared where a rolling polynomial hash of the last
``window`` bytes hits ``H % modulus == 0`` (expected chunk length ≈
``modulus``), clamped to [min_len, max_len]. Because boundaries depend
only on LOCAL content, an edit changes just the chunks it touches —
insertions re-align at the next content boundary instead of shifting
every later chunk (the property fixed-size chunking lacks; pinned by
tests). Chunk hashes then feed the exact-dedup family.

Per-doc rolling hashes are vectorized (sliding_window_view @ powers);
only the min/max clamping walks the (sparse) candidate boundary list.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_P = np.uint64(1099511628211)


def _rolling_boundaries(data: bytes, window: int, modulus: int,
                        min_len: int, max_len: int) -> list[int]:
    """Candidate boundaries via vectorized rolling hash, then the greedy
    min/max clamp. Returns END offsets of each chunk (last == len)."""
    n = len(data)
    if n <= min_len:
        return [n] if n else []
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    if n < window:
        return [n]
    powers = _P ** np.arange(window, dtype=np.uint64)
    wins = np.lib.stride_tricks.sliding_window_view(b, window)
    h = wins @ powers  # uint64 wrap-around is the hash
    # candidate boundary AFTER byte i (i = window-1 .. n-1)
    cand = np.nonzero(h % np.uint64(modulus) == 0)[0] + window
    ends: list[int] = []
    start = 0
    for c in cand:
        c = int(c)
        # force max_len splits FIRST, then re-evaluate the candidate
        # against the new start — otherwise the remainder after a force
        # split could drop below min_len mid-document
        while c - start > max_len:
            start += max_len
            ends.append(start)
        if c - start < min_len:
            continue
        ends.append(c)
        start = c
    while n - start > max_len:
        start += max_len
        ends.append(start)
    if n > start:
        ends.append(n)
    return ends


def chunk_batch(batch: pd.DataFrame, text_col: str = "text",
                id_col: str = "doc_id", window: int = 16,
                modulus: int = 64, min_len: int = 24,
                max_len: int = 256, hash_fn: str = "fast") -> pd.DataFrame:
    """1→N explosion: one row per chunk with (id, chunk_idx,
    chunk_start, chunk_len, chunk_hash). The hash is a deterministic
    uint64 over the chunk bytes — the exact-dedup key."""
    ids, idxs, starts, lens, texts = [], [], [], [], []
    for did, text in zip(batch[id_col], batch[text_col].fillna("")):
        data = text.encode("utf-8")
        prev = 0
        for ci, end in enumerate(
            _rolling_boundaries(data, window, modulus, min_len, max_len)
        ):
            ids.append(did)
            idxs.append(ci)
            starts.append(prev)
            lens.append(end - prev)
            texts.append(data[prev:end])
            prev = end
    from gush_ray.stages.dedup import _hash_strings

    hashes = (
        _hash_strings(texts, hash_fn)
        if texts else np.array([], dtype=np.uint64)
    )
    return pd.DataFrame({
        id_col: np.asarray(ids),
        "chunk_idx": np.asarray(idxs, dtype=np.int64),
        "chunk_start": np.asarray(starts, dtype=np.int64),
        "chunk_len": np.asarray(lens, dtype=np.int64),
        "chunk_hash": hashes,
    })


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                    **kw):
    """Dataset form of :func:`chunk_batch`."""
    return ds.map_batches(
        lambda b: chunk_batch(b, text_col, id_col, **kw),
        batch_format="pandas",
    )
