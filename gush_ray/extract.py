"""Deterministic, invertible HTML <-> text extraction.

Graft of gush's statement→record parsing stage (reference:
parser/FoundationParser.scala:10-36 + InsertNodeVisitor.scala:5-28):
the raw payload (there: a SQL string, here: an ``html`` binary column) is
parsed into typed fields; unparseable payloads become error rows that the
pipeline *resumes* past instead of crashing (reference: gush.scala:13-18,
supervision Resume on BinlogEventParseError).

The HTML template is invertible by construction so that extraction parity
is checkable byte-for-byte per url (BASELINE.json input_hint): the page
body is the escaped ground-truth text inside a single ``<article>``
element, and :func:`extract_text_batch` recovers it exactly.

All per-batch work is vectorized pyarrow.compute — no Python loop over
rows in the hot path.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Escape order matters: '&' first on the way in, last on the way out.
_ESCAPES: list[tuple[str, str]] = [
    ("&", "&amp;"),
    ("<", "&lt;"),
    (">", "&gt;"),
    ('"', "&quot;"),
]

_ARTICLE_RE = r"(?s)<article>(?P<gush_text>.*?)</article>"


def escape_text(text: str) -> str:
    for raw, esc in _ESCAPES:
        text = text.replace(raw, esc)
    return text


def unescape_text(text: str) -> str:
    for raw, esc in reversed(_ESCAPES):
        text = text.replace(esc, raw)
    return text


def render_html(url: str, text: str, lang: str = "en") -> bytes:
    """Render the deterministic page template (used by the data generator)."""
    body = escape_text(text)
    return (
        f'<!DOCTYPE html><html lang="{lang}"><head><meta charset="utf-8">'
        f"<title>{escape_text(url)}</title></head>"
        f"<body><!-- warc:{url} --><article>{body}</article>"
        f"<footer>crawled</footer></body></html>"
    ).encode("utf-8")


def extract_text_array(html: pa.ChunkedArray | pa.Array) -> pa.Array:
    """binary html → extracted text (null where unparseable). Vectorized."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    # Valid pages are utf-8 by construction; guard invalid bytes row-wise
    # only if the vectorized cast fails (cold path).
    try:
        as_str = html.cast(pa.string())
    except pa.ArrowInvalid:
        py = [
            v.decode("utf-8", errors="replace") if v is not None else None
            for v in html.to_pylist()
        ]
        as_str = pa.array(py, type=pa.string())
    matched = pc.extract_regex(as_str, _ARTICLE_RE)
    text = pc.struct_field(matched, "gush_text")
    for raw, esc in reversed(_ESCAPES):
        text = pc.replace_substring(text, esc, raw)
    return text


def extract_text_batch(batch: pa.Table, html_col: str = "html",
                       out_col: str = "text", drop_html: bool = True) -> pa.Table:
    """map_batches stage: html → text + extract_ok columns.

    Rows where extraction fails keep ``out_col`` null and get
    ``extract_ok=False`` — route them to the error side-output with
    :func:`split_errors` (gush's Resume path drops them silently; we keep
    them, see SURVEY.md §1.2 dead-letter design).
    """
    text = extract_text_array(batch[html_col])
    ok = pc.is_valid(text)
    cols = dict(zip(batch.column_names, batch.columns))
    cols[out_col] = text
    cols["extract_ok"] = ok
    if drop_html and html_col in cols and html_col != out_col:
        # project the wide binary column away as early as possible
        # (SURVEY.md §7 hard part (c))
        del cols[html_col]
    return pa.table(cols)


def split_errors(batch: pa.Table, ok_col: str = "extract_ok") -> tuple[pa.Table, pa.Table]:
    """Split a batch into (good, error) tables on the ok column."""
    mask = batch[ok_col]
    good = batch.filter(mask)
    bad = batch.filter(pc.invert(mask))
    return good, bad
