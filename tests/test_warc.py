"""WARC/WET source+sink: byte-exact round trips, framing robustness,
shard parallelism, and the fixture used by the warc_roundtrip oracle."""

import gzip
import hashlib
import os

import pyarrow as pa
import pytest

from gush_ray.sources import warc as W


def _pages(rows):
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "html": pa.array([r[2] for r in rows], pa.binary()),
        "lang": pa.array([r[3] for r in rows], pa.string()),
    })


ROWS = [
    ("https://a.org/1", 1_700_000_000_123_456, b"<html>x</html>", "en"),
    # payload that contains WARC framing bait: Content-Length must drive
    # the cursor, never a delimiter scan
    ("https://b.org/2", 1_700_000_001_000_000,
     b"\xff\xfe raw \r\n\r\nWARC/1.1\r\nContent-Length: 0\r\n\r\n", None),
    ("https://c.org/3", 1_700_000_002_999_999, b"", "pt"),
]


def test_warc_roundtrip_exact(tmp_path):
    t = _pages(ROWS)
    paths = W.write_warc_dir(t, str(tmp_path / "w"), shard_rows=2)
    assert len(paths) == 2  # 3 rows, 2 per shard
    got = pa.concat_tables([W._warc_file_to_table(p) for p in paths])
    assert got.equals(t)


def test_warc_shards_byte_deterministic(tmp_path):
    t = _pages(ROWS)
    p1 = W.write_warc_dir(t, str(tmp_path / "a"), shard_rows=10)[0]
    p2 = W.write_warc_dir(t, str(tmp_path / "b"), shard_rows=10)[0]
    h = lambda p: hashlib.md5(open(p, "rb").read()).hexdigest()  # noqa: E731
    assert h(p1) == h(p2)


def test_warc_members_individually_decompressible(tmp_path):
    """CC convention: each record is its own gzip member, so a reader
    can decompress one record without the rest of the shard."""
    t = _pages(ROWS)
    p = W.write_warc_dir(t, str(tmp_path / "w"), shard_rows=10)[0]
    raw = open(p, "rb").read()
    # first member alone must decode to exactly one well-formed record
    import zlib

    d = zlib.decompressobj(wbits=31)
    first = d.decompress(raw)
    recs = W.parse_warc_members(first)
    assert len(recs) == 1 and recs[0]["url"] == ROWS[0][0]
    assert d.unused_data  # the remaining members follow


def test_wet_roundtrip_null_vs_empty(tmp_path):
    wt = pa.table({
        "url": ["u1", "u2", "u3"],
        "warc_ts": pa.array([5, 6, 7], pa.int64()).cast(
            pa.timestamp("us")),
        "text": ["héllo wörld", None, ""],
    })
    p = W.write_wet_dir(wt, str(tmp_path / "wet"), shard_rows=10)[0]
    got = W._wet_file_to_table(p)
    assert got.equals(wt)  # null and empty string stay distinct


def test_parse_rejects_corrupt_shards():
    t = _pages(ROWS[:1])
    rec = W._warc_record("response", "u", 1,
                         "application/http; msgtype=response",
                         W._http_response(b"abc", "en"))
    with pytest.raises(ValueError, match="truncated WARC payload"):
        W.parse_warc_members(rec[:-6])
    with pytest.raises(ValueError, match="expected WARC version"):
        W.parse_warc_members(b"HTTP/1.1 200 OK\r\n\r\n")
    bad = rec.replace(b"Content-Length", b"X-Was-Length", 1)
    with pytest.raises(ValueError, match="missing Content-Length"):
        W.parse_warc_members(bad)
    del t


def test_non_response_records_skipped(tmp_path):
    info = W._warc_record("warcinfo", "", 0, "application/warc-fields",
                          b"software: gush_ray\r\n")
    resp = W._warc_record("response", "https://a.org/1", 42,
                          "application/http; msgtype=response",
                          W._http_response(b"<html>", "en"))
    p = str(tmp_path / "m.warc.gz")
    with open(p, "wb") as f:
        f.write(W._gzip_member(info) + W._gzip_member(resp))
    got = W._warc_file_to_table(p)
    assert got.num_rows == 1 and got["url"][0].as_py() == "https://a.org/1"


def test_warc_date_us_precision_roundtrip():
    for us in (0, 999_999, 1_700_000_000_123_456, 4_102_444_800_000_001):
        assert W._parse_iso_us(W._iso_us(us)) == us
    # second-precision dates (WARC/1.0 writers) parse too
    assert W._parse_iso_us("2023-11-14T22:13:20Z") == 1_700_000_000_000_000


def test_read_warc_dataset_parallel_shards(ray_session, tmp_path):
    """Ray path: one parse task per shard, order restored by sort."""
    from gush_ray.datagen import gen_pages

    pages, _ = gen_pages(n_urls=200, seed=3)
    t = pages.select(["url", "warc_ts", "html", "lang"])
    W.write_warc_dir(t, str(tmp_path / "w"), shard_rows=64)
    ds = W.read_warc(str(tmp_path / "w"))
    got = ds.to_pandas().sort_values(["url", "warc_ts"]).reset_index(
        drop=True)
    want = t.to_pandas().sort_values(["url", "warc_ts"]).reset_index(
        drop=True)
    assert got.equals(want)

    wt = pages.select(["url", "warc_ts", "text"])
    W.write_wet_dir(wt, str(tmp_path / "wet"), shard_rows=64)
    got_t = W.read_wet(str(tmp_path / "wet")).to_pandas().sort_values(
        ["url", "warc_ts"]).reset_index(drop=True)
    want_t = wt.to_pandas().sort_values(["url", "warc_ts"]).reset_index(
        drop=True)
    assert got_t.equals(want_t)


def test_extract_from_warc_html_matches_wet(ray_session, tmp_path):
    """End-to-end: WARC html → extract stage == the WET text the same
    generator emitted (byte-identical per url where extraction succeeds)."""
    import pandas as pd

    from gush_ray.datagen import gen_pages
    from gush_ray.extract import extract_text_batch

    pages, _ = gen_pages(n_urls=150, seed=11)
    W.write_warc_dir(pages.select(["url", "warc_ts", "html", "lang"]),
                     str(tmp_path / "w"), shard_rows=100)
    ds = W.read_warc(str(tmp_path / "w")).map_batches(
        extract_text_batch, batch_format="pyarrow", zero_copy_batch=True)
    got = ds.to_pandas()[["url", "warc_ts", "text"]]
    want = pages.select(["url", "warc_ts", "text"]).to_pandas()
    key = ["url", "warc_ts"]
    m = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(m, w)


def test_ensure_warc_fixture_idempotent():
    root = W.ensure_warc_fixture()
    assert os.path.exists(os.path.join(root, "truth.parquet"))
    mt = os.path.getmtime(os.path.join(root, "_COMPLETE"))
    assert W.ensure_warc_fixture() == root
    assert os.path.getmtime(os.path.join(root, "_COMPLETE")) == mt
