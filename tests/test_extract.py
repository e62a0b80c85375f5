"""Extraction parity: html → text must be byte-identical to ground truth.

Graft of the reference parser conformance corpus
(FoundationParserTest.scala:14-110): multiline UTF-8, escaped characters,
empty values, and invalid payloads → failure rows that the pipeline
resumes past (gush.scala:13-18).
"""

import pyarrow as pa

from gush_ray.datagen import gen_pages
from gush_ray.extract import (
    extract_text_batch,
    render_html,
    extract_text_array,
    split_errors,
    escape_text,
    unescape_text,
)


def test_roundtrip_simple():
    text = 'hello & <world> "quoted" naïve\r\nsecond line\tüß'
    html = render_html("https://x.org/p/1", text)
    arr = extract_text_array(pa.array([html], type=pa.binary()))
    assert arr.to_pylist() == [text]


def test_escape_unescape_inverse():
    tricky = '&amp; already-escaped & < > " &lt; mix'
    assert unescape_text(escape_text(tricky)) == tricky


def test_empty_text():
    # FoundationParserTest.scala:34-39 — empty string value survives
    html = render_html("https://x.org/p/2", "")
    arr = extract_text_array(pa.array([html], type=pa.binary()))
    assert arr.to_pylist() == [""]


def test_malformed_is_error_row():
    # invalid statement → Failure (FoundationParserTest.scala:29-32)
    batch = pa.table(
        {
            "url": ["a", "b"],
            "html": pa.array(
                [b"<html>no article", render_html("b", "ok text")],
                type=pa.binary(),
            ),
        }
    )
    out = extract_text_batch(batch, out_col="text2")
    good, bad = split_errors(out)
    assert good.num_rows == 1 and bad.num_rows == 1
    assert good["text2"].to_pylist() == ["ok text"]
    assert "html" not in out.column_names  # wide binary projected away


def test_generated_pages_byte_identical():
    table, _ = gen_pages(n_urls=300, seed=11)
    out = extract_text_batch(table, out_col="text_extracted", drop_html=True)
    good, bad = split_errors(out)
    # every well-formed page must extract byte-identically
    assert good.num_rows > 0
    assert good["text_extracted"].to_pylist() == good["text"].to_pylist()
    # malformed rows exist and carry null ground truth
    assert bad.num_rows > 0
    assert all(v is None for v in bad["text"].to_pylist())


def test_gen_pages_deterministic():
    t1, e1 = gen_pages(n_urls=100, seed=5)
    t2, e2 = gen_pages(n_urls=100, seed=5)
    assert t1.equals(t2)
    assert (e1 == e2).all()


def test_gen_pages_has_stream_phenomena():
    import collections

    table, epoch = gen_pages(n_urls=500, seed=7)
    urls = table["url"].to_pylist()
    ts = table["warc_ts"].to_pylist()
    counts = collections.Counter(urls)
    assert max(counts.values()) >= 50  # hot urls
    assert sum(1 for c in counts.values() if 2 <= c <= 5) > 50  # updates
    pairs = collections.Counter(zip(urls, ts))
    assert any(c > 1 for c in pairs.values())  # exact replay dups
    # late rows: within-arrival-order ts regressions across epoch boundary
    assert (epoch[:-1] <= epoch[1:]).all()


def test_comment_nodes_ignored():
    # graft of 'trailing comments ignored' (FoundationParserTest.scala:21-27):
    # comment nodes outside <article> never leak into the extracted text
    html = render_html("https://x.org/p/9", "body text")
    assert b"<!-- warc:" in html  # template embeds a comment node
    arr = extract_text_array(pa.array([html], type=pa.binary()))
    assert arr.to_pylist() == ["body text"]


def test_multiline_utf8_conformance():
    # graft of the 22-column multiline UTF-8 INSERT
    # (FoundationParserTest.scala:14-19)
    text = "Zeile eins\r\nZeile zwei mit Ümläuten — ß\n\tthird line"
    html = render_html("https://x.org/p/10", text)
    arr = extract_text_array(pa.array([html], type=pa.binary()))
    assert arr.to_pylist() == [text]
