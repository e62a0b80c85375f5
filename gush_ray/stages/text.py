"""Text analysis stages for the documents/pages stream.

Large-scale training-data-pipeline operators (driver brief): token
counting, quality scoring, language-ID heuristic, document fingerprinting.
Vectorized pyarrow where the kernel allows; the language-ID stage is an
actor-pool class (patterns compiled once per actor, reference pattern:
SURVEY.md §2.7 actor-pool stateful stages).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = r"\S+"
_PUNCT_RE = r"[.,!?;:]"


def token_count_batch(batch: pa.Table, col: str = "text",
                      out: str = "n_tokens") -> pa.Table:
    n = pc.count_substring_regex(batch[col], _TOKEN_RE)
    return batch.append_column(out, n.cast(pa.int64()))


def quality_score_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Length / punctuation ratios — cheap quality heuristics."""
    length = pc.utf8_length(batch[col]).cast(pa.float64())
    punct = pc.count_substring_regex(batch[col], _PUNCT_RE).cast(pa.float64())
    tokens = pc.count_substring_regex(batch[col], _TOKEN_RE).cast(pa.float64())
    safe_len = pc.max_element_wise(length, pa.scalar(1.0))
    batch = batch.append_column("punct_ratio", pc.divide(punct, safe_len))
    batch = batch.append_column(
        "mean_token_len",
        pc.divide(length, pc.max_element_wise(tokens, pa.scalar(1.0))),
    )
    return batch


# Tiny per-language stopword profiles for the heuristic language id.
_STOP = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr": ("le", "la", "et", "les", "des", "est", "une"),
    "es": ("el", "la", "los", "que", "es", "una", "por"),
    "pt": ("o", "a", "os", "que", "é", "uma", "não"),
}


class LangIdModel:
    """Actor-pool language-ID stage: stopword-hit scoring.

    Callable-class ``map_batches`` stage — regex/profile setup happens once
    per actor in ``__init__`` (never per batch).
    """

    def __init__(self):
        import re

        self.token_re = re.compile(r"[\wéíáóúüßñàè]+", re.U)
        self.profiles = {
            lang: frozenset(words) for lang, words in _STOP.items()
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        toks = texts.str.lower().str.findall(self.token_re)

        def best(ws: list[str]) -> str:
            if not ws:
                return "und"
            scores = {
                lang: sum(w in prof for w in ws)
                for lang, prof in self.profiles.items()
            }
            lang, score = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
            return lang if score > 0 else "und"

        batch = batch.copy()
        batch["lang_pred"] = toks.map(best)
        return batch


def fingerprint_batch(batch: pd.DataFrame, col: str = "text",
                      shingle: int = 5, out: str = "fingerprint") -> pd.DataFrame:
    """Winnowing-style document fingerprint: min hash over char shingles.

    Deterministic (pd.util.hash_array, fixed key); rows with text shorter
    than the shingle get the hash of the whole text; null rows get 0.
    Vectorized over the batch: ONE hash_array call for all docs' shingles
    + ``np.minimum.reduceat`` at doc boundaries (a per-row ``.map`` with a
    per-doc hash_array call was measurably hot — see BENCH/BASELINE.md).
    """
    batch = batch.copy()
    n = len(batch)
    if n == 0:
        batch[out] = pd.Series(dtype="uint64")
        return batch
    all_grams: list = []
    bounds = [0]
    null_mask = np.zeros(n, dtype=bool)
    for i, s in enumerate(batch[col]):
        if s is None or (isinstance(s, float) and s != s):
            null_mask[i] = True
            grams = [""]  # placeholder segment, overwritten with 0 below
        elif len(s) <= shingle:
            grams = [s]
        else:
            grams = [s[j : j + shingle] for j in range(len(s) - shingle + 1)]
        all_grams.extend(grams)
        bounds.append(bounds[-1] + len(grams))
    from gush_ray.stages.dedup import hash_object_chunks

    h = hash_object_chunks(np.asarray(all_grams, dtype=object))
    fps = np.minimum.reduceat(h, np.asarray(bounds[:-1], dtype=np.int64))
    fps[null_mask] = 0
    batch[out] = fps.astype("uint64")
    return batch
