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
    than the shingle get the hash of the whole text.
    """
    def fp(s: str) -> np.uint64:
        if s is None:
            return np.uint64(0)
        if len(s) <= shingle:
            return pd.util.hash_array(np.array([s], dtype=object))[0]
        grams = np.array(
            [s[i : i + shingle] for i in range(len(s) - shingle + 1)],
            dtype=object,
        )
        return pd.util.hash_array(grams, categorize=False).min()

    batch = batch.copy()
    batch[out] = batch[col].map(fp).astype("uint64")
    return batch
