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
# GPT-2-style pre-tokenizer (BPE-ish subword boundaries): contractions,
# letter runs, digit runs, punctuation runs, whitespace runs. Both
# pyarrow and DuckDB use RE2, so the SAME pattern is oracle-pairable.
_BPE_RE = (r"'s|'t|'re|'ve|'m|'ll|'d"
           r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+")
# tiny English stopword alternation (\b word-bounded, RE2-compatible)
_STOPWORD_RE = r"\b(the|and|of|to|a|in|is|that|it|for)\b"


def token_count_batch(batch: pa.Table, col: str = "text",
                      out: str = "n_tokens") -> pa.Table:
    n = pc.count_substring_regex(batch[col], _TOKEN_RE)
    return batch.append_column(out, n.cast(pa.int64()))


def bpe_token_count_batch(batch: pa.Table, col: str = "text",
                          out: str = "n_bpe_tokens") -> pa.Table:
    """Subword-ish token counting via the GPT-2 pre-tokenizer regex —
    the 'BPE-ish regex' counter from the driver brief (whitespace
    counting alone undercounts punctuation-heavy web text)."""
    n = pc.count_substring_regex(batch[col], _BPE_RE)
    return batch.append_column(out, n.cast(pa.int64()))


def stopword_ratio_batch(batch: pa.Table, col: str = "text",
                         out: str = "stopword_ratio") -> pa.Table:
    """Stopword-hit ratio (quality-scoring family): stopword matches per
    whitespace token, vectorized RE2 on lowercased text."""
    low = pc.utf8_lower(batch[col])
    hits = pc.count_substring_regex(low, _STOPWORD_RE).cast(pa.float64())
    toks = pc.count_substring_regex(batch[col], _TOKEN_RE).cast(pa.float64())
    ratio = pc.divide(hits, pc.max_element_wise(toks, pa.scalar(1.0)))
    return batch.append_column(out, ratio)


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
# The lang-ID token alphabet, CLOSED and shared verbatim with the SQL
# oracle (queries_extra.SQL_LANG_ID): an open-ended \w matches unicode
# letters RE2 does not (review finding: 'não' tokenized as one token in
# Python but split by the SQL, so the baked pt stopword could never
# join). Digits + lowercase ASCII + underscore + every accented letter
# appearing in the stop profiles or the synthetic generators.
LANGID_TOKEN_CHARS = "0-9a-z_éíáóúüßñàèãçêõïô"

_STOP = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr": ("le", "la", "et", "les", "des", "est", "une"),
    "es": ("el", "la", "los", "que", "es", "una", "por"),
    "pt": ("o", "a", "os", "que", "é", "uma", "não"),
}


# URL canonicalization rules, applied IN ORDER to the lowercased url.
# RE2 on both pyarrow and DuckDB sides → the oracle runs the same rules.
_URL_RULES: list[tuple[str, str]] = [
    (r"#.*$", ""),                     # drop fragment
    (r"[?&]utm_[^&#]*", ""),           # drop tracking params
    # dropping a leading ?utm_… leaves the next param as '&rest' fused
    # onto the path: promote the first '&' back to '?' when no '?'
    # survives, so '?utm_a=1&id=3' and '?id=3' normalize identically
    (r"^([^?]*)&", r"\1?"),
    (r"\?$", ""),                      # empty query leftover
    (r"^https?://www\.", "https://"),  # www + scheme canonicalization
    (r"^http://", "https://"),
    (r"/+$", ""),                      # trailing slashes
]


def normalize_urls_batch(batch: pa.Table, col: str = "url",
                         out: str = "url_norm") -> pa.Table:
    """URL canonicalization for dedup keys: lowercase, strip fragments /
    utm tracking params / trailing slashes, canonicalize scheme+www —
    fully vectorized RE2 replacement chain."""
    arr = pc.utf8_lower(batch[col])
    for pat, rep in _URL_RULES:
        arr = pc.replace_substring_regex(arr, pat, rep)
    return batch.append_column(out, arr)


class LangIdModel:
    """Actor-pool language-ID stage: stopword-hit scoring.

    Callable-class ``map_batches`` stage — regex/profile setup happens
    once per actor in ``__init__`` (never per batch). Scoring is
    vectorized over the WHOLE batch: all docs' tokens hashed in one
    chunked pass, per-language membership via ``np.isin`` against the
    hashed profile, per-doc sums via ``np.add.reduceat`` (the same
    pattern as minhash/simhash; the per-doc Python scoring loop this
    replaces was the stage's hot path — parity test pins behavior).
    """

    def __init__(self):
        import re

        self.token_re = re.compile(f"[{LANGID_TOKEN_CHARS}]+")
        # langs ascending; ties resolve to the LARGEST lang string
        # (the original max((score, lang)) tie-break)
        self.langs = sorted(_STOP)
        self.profiles = [
            np.sort(pd.util.hash_array(
                np.asarray(_STOP[lang], dtype=object), categorize=False
            ))
            for lang in self.langs
        ]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from gush_ray.stages.dedup import hash_object_chunks

        if len(batch) == 0:
            batch = batch.copy()
            batch["lang_pred"] = pd.Series(dtype="object")
            return batch
        texts = batch["text"].fillna("")
        all_tokens: list = []
        bounds = [0]
        for t in texts:
            toks = self.token_re.findall(t.lower())
            if not toks:
                toks = [""]  # sentinel keeps reduceat segments non-empty
            all_tokens.extend(toks)
            bounds.append(bounds[-1] + len(toks))
        h = hash_object_chunks(np.asarray(all_tokens, dtype=object))
        starts = np.asarray(bounds[:-1], dtype=np.int64)
        scores = np.empty((len(batch), len(self.langs)), dtype=np.int64)
        for j, prof in enumerate(self.profiles):
            hits = np.isin(h, prof).astype(np.int64)
            scores[:, j] = np.add.reduceat(hits, starts) if len(h) else 0
        # argmax with largest-lang tie-break = first max over reversed cols
        rev_idx = np.argmax(scores[:, ::-1], axis=1)
        idx = scores.shape[1] - 1 - rev_idx
        best_score = scores[np.arange(len(batch)), idx]
        langs = np.asarray(self.langs, dtype=object)
        pred = np.where(best_score > 0, langs[idx], "und")
        batch = batch.copy()
        batch["lang_pred"] = pred
        return batch


def fingerprint_batch(batch: pd.DataFrame, col: str = "text",
                      shingle: int = 5, out: str = "fingerprint",
                      hash_fn: str = "fast") -> pd.DataFrame:
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
    from gush_ray.stages.dedup import _hash_strings

    h = _hash_strings(all_grams, hash_fn)
    fps = np.minimum.reduceat(h, np.asarray(bounds[:-1], dtype=np.int64))
    fps[null_mask] = 0
    batch[out] = fps.astype("uint64")
    return batch


# Gopher-style quality rules (public heuristics from Rae et al. 2021,
# "Scaling Language Models: ... Gopher", Table A1, simplified to the
# rules expressible identically in pandas-re and DuckDB-RE2): word-count
# bounds, mean-word-length bounds, minimum stopword hits. Token = \S+
# run; ASCII whitespace assumed (python \s is unicode-aware, RE2's is
# ASCII — identical on the ASCII corpus, documented divergence outside).
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WL = 3.0
GOPHER_MAX_MEAN_WL = 10.0
GOPHER_MIN_STOP = 2


def gopher_rules_batch(batch: pd.DataFrame, col: str = "text"
                       ) -> pd.DataFrame:
    """Per-doc Gopher quality signals + pass flag, fully vectorized:

    - ``n_words``: whitespace tokens (\\S+ runs)
    - ``mean_word_len``: non-whitespace chars / words (0 for empty docs)
    - ``n_stop``: tokens exactly equal to a :data:`GOPHER_STOPWORDS`
      entry (case-folded) — one non-consuming-lookaround regex count per
      stopword, equivalent to token-equality filtering
    - ``gopher_pass``: all rule bounds hold
    """
    t = batch[col].fillna("")
    n_words = t.str.count(_TOKEN_RE).astype("int64")
    n_nonspace = (t.str.len() - t.str.count(r"\s")).astype("int64")
    mean_wl = np.where(n_words > 0, n_nonspace / n_words.clip(lower=1), 0.0)
    low = t.str.lower()
    n_stop = sum(
        low.str.count(rf"(?:^|(?<=\s)){w}(?=\s|$)") for w in GOPHER_STOPWORDS
    ).astype("int64")
    out = batch.copy()
    out["n_words"] = n_words
    out["mean_word_len"] = mean_wl
    out["n_stop"] = n_stop
    out["gopher_pass"] = (
        n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & (mean_wl >= GOPHER_MIN_MEAN_WL)
        & (mean_wl <= GOPHER_MAX_MEAN_WL)
        & (n_stop >= GOPHER_MIN_STOP)
    )
    return out


# ---------------------------------------------------------------- redaction

# (pattern, replacement) — applied in order. RE2 syntax (pyarrow uses
# RE2, same engine as the DuckDB oracle's regexp_replace, so the
# semantics match exactly; no lookarounds).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d() .-]{7,}\d", "<PHONE>"),
    (r"\d+", "<NUM>"),
)


def redact_batch(batch: pa.Table, col: str, out: str,
                 patterns: tuple[tuple[str, str], ...] = PII_PATTERNS
                 ) -> pa.Table:
    """PII scrub: replace emails / IPs / phone-ish runs / digit runs
    with typed placeholder tokens. Fully vectorized
    (pc.replace_substring_regex per pattern); order matters — specific
    patterns run before the generic digit-run fallback."""
    vals = batch[col].combine_chunks()
    for pat, repl in patterns:
        vals = pc.replace_substring_regex(vals, pattern=pat,
                                          replacement=repl)
    if out in batch.column_names:
        return batch.set_column(batch.column_names.index(out), out, vals)
    return batch.append_column(out, vals)
