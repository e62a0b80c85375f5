"""WARC source/sink — the Common Crawl container format (ISO 28500).

The reference reads exactly one source (the MySQL binlog tail,
reference: binlog/BinlogServerReader.scala:10-19); this repo's stream is
its Common-Crawl-pages graft, and WARC is that domain's native on-disk
format. A user pointing this engine at real crawl data hands it
``*.warc.gz`` shards, so the engine owns both directions:

* :func:`write_warc_dir` — pages table → sharded ``*.warc.gz``, each
  record compressed as its OWN gzip member and members concatenated
  (the Common Crawl convention: a reader can seek to a record's byte
  offset and decompress a single member without touching the rest of
  the shard).
* :func:`read_warc` — ``*.warc.gz`` shards → ``ray.data``
  Dataset of ``(url, warc_ts, html, lang)``; one parse task per shard
  file (shards are the parallelism unit, exactly how CC pipelines
  process WET/WARC), record walk driven by ``Content-Length`` so
  payload bytes are never scanned for delimiters.
* :func:`write_wet_dir` / :func:`read_wet` — the same for WET-style
  ``conversion`` records (extracted plain text), the format CC
  publishes pre-extracted text in.

Format notes (all public spec / CC convention):

* WARC/1.1 headers, because 1.1 allows fractional-second ``WARC-Date``
  — ``warc_ts`` is µs precision and must round-trip exactly.
* ``WARC-Record-ID`` is a deterministic ``urn:uuid`` derived from
  (url, ts) — no wall clock, no randomness, so shards are byte-stable
  across runs (resumable writes can compare bytes).
* The response payload is a literal HTTP/1.1 message; ``lang`` rides
  the standard ``Content-Language`` header (it is also recoverable
  from the html's ``lang`` attribute via :mod:`gush_ray.extract`).

Scale contract: the unit a reader holds in memory is ONE shard
(compressed + decompressed). Size shards accordingly at write time
(``shard_rows``); Common Crawl itself caps WARC shards at ~1 GB for
the same reason.
"""

from __future__ import annotations

import glob
import gzip
import hashlib
import os
import uuid

import pyarrow as pa

import ray.data as rd

_CRLF = b"\r\n"

WARC_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("lang", pa.string()),
    ]
)

WET_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("text", pa.string()),
    ]
)


# ---------------------------------------------------------------- write


def _iso_us(ts_us: int) -> str:
    """µs-precision ISO-8601 Zulu (WARC/1.1 allows fractional seconds)."""
    import datetime as dt

    t = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
        microseconds=int(ts_us))
    return t.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"


def _parse_iso_us(s: str) -> int:
    import datetime as dt

    s = s.strip()
    if s.endswith("Z"):
        s = s[:-1]
    if "." in s:
        base, frac = s.split(".")
        frac_us = int((frac + "000000")[:6])
    else:
        base, frac_us = s, 0
    t = dt.datetime.strptime(base, "%Y-%m-%dT%H:%M:%S").replace(
        tzinfo=dt.timezone.utc
    )
    epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
    return int((t - epoch) / dt.timedelta(microseconds=1)) + frac_us


def _record_id(url: str, ts_us: int) -> str:
    h = hashlib.md5(f"{url}|{ts_us}".encode()).digest()
    return f"<urn:uuid:{uuid.UUID(bytes=h)}>"


def _warc_record(rec_type: str, url: str, ts_us: int,
                 content_type: str, payload: bytes) -> bytes:
    headers = (
        b"WARC/1.1" + _CRLF
        + f"WARC-Type: {rec_type}".encode() + _CRLF
        + f"WARC-Record-ID: {_record_id(url, ts_us)}".encode() + _CRLF
        + f"WARC-Date: {_iso_us(ts_us)}".encode() + _CRLF
        + f"WARC-Target-URI: {url}".encode() + _CRLF
        + f"Content-Type: {content_type}".encode() + _CRLF
        + f"Content-Length: {len(payload)}".encode() + _CRLF
    )
    # a record ends with two CRLFs after the payload block
    return headers + _CRLF + payload + _CRLF + _CRLF


def _http_response(html: bytes, lang: str | None) -> bytes:
    head = b"HTTP/1.1 200 OK" + _CRLF + \
        b"Content-Type: text/html; charset=utf-8" + _CRLF
    if lang is not None:
        head += f"Content-Language: {lang}".encode() + _CRLF
    head += f"Content-Length: {len(html)}".encode() + _CRLF
    return head + _CRLF + html


def _gzip_member(raw: bytes) -> bytes:
    """One record = one gzip member. mtime=0: byte-deterministic output
    (gzip stamps wall-clock otherwise, breaking shard byte-stability)."""
    return gzip.compress(raw, compresslevel=6, mtime=0)


def _write_shards(table: pa.Table, out_dir: str, shard_rows: int,
                  suffix: str, to_record) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    n = table.num_rows
    n_shards = max(1, -(-n // shard_rows))
    for s in range(n_shards):
        part = table.slice(s * shard_rows, shard_rows)
        path = os.path.join(out_dir, f"part-{s:05d}.{suffix}")
        tmp = path + ".inprogress"
        with open(tmp, "wb") as f:
            for row in part.to_pylist():
                f.write(_gzip_member(to_record(row)))
        os.replace(tmp, path)  # atomic: readers never see a partial shard
        paths.append(path)
    return paths


def write_warc_dir(table: pa.Table, out_dir: str,
                   shard_rows: int = 2_000) -> list[str]:
    """Pages table → sharded ``part-NNNNN.warc.gz`` (response records).

    Row order is preserved within and across shards (shard s holds rows
    [s*shard_rows, (s+1)*shard_rows)), so a round trip that reads shards
    in name order reproduces the input order exactly.
    """

    def to_record(row: dict) -> bytes:
        ts_us = _ts_us(row["warc_ts"])
        return _warc_record(
            "response", row["url"], ts_us,
            "application/http; msgtype=response",
            _http_response(row["html"] or b"", row.get("lang")),
        )

    return _write_shards(table, out_dir, shard_rows, "warc.gz", to_record)


def write_wet_dir(table: pa.Table, out_dir: str,
                  shard_rows: int = 2_000) -> list[str]:
    """Extracted-text table → sharded ``part-NNNNN.warc.wet.gz``
    (WET ``conversion`` records, the CC pre-extracted-text format).
    Null text rows are stored as empty payloads with an
    ``X-Gush-Null: 1`` marker header so the round trip distinguishes
    null from empty string."""

    def to_record(row: dict) -> bytes:
        ts_us = _ts_us(row["warc_ts"])
        text = row.get("text")
        payload = b"" if text is None else text.encode("utf-8")
        ctype = "text/plain"
        rec = _warc_record("conversion", row["url"], ts_us, ctype, payload)
        if text is None:
            # splice the marker header before the blank line
            head, _, rest = rec.partition(_CRLF + _CRLF)
            rec = head + _CRLF + b"X-Gush-Null: 1" + _CRLF + _CRLF + rest
        return rec

    return _write_shards(table, out_dir, shard_rows, "warc.wet.gz",
                         to_record)


def _ts_us(v) -> int:
    """timestamp cell → int µs (datetime from to_pylist, or raw int)."""
    if isinstance(v, int):
        return v
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
    if v.tzinfo is None:
        v = v.replace(tzinfo=dt.timezone.utc)
    return int((v - epoch) / dt.timedelta(microseconds=1))


# ----------------------------------------------------------------- read


def _split_headers(block: bytes) -> dict:
    headers = {}
    for line in block.split(_CRLF):
        if not line:
            continue
        k, _, v = line.partition(b":")
        headers[k.strip().lower()] = v.strip()
    return headers


def parse_warc_members(blob: bytes) -> list[dict]:
    """Walk WARC records in a decompressed shard.

    ``Content-Length`` drives the cursor — payload bytes are never
    scanned for delimiters (a payload may legally contain anything,
    including ``WARC/1.1`` lines). Raises ValueError on a malformed
    record (truncated payload, missing mandatory header): a corrupt
    shard must fail loudly, not yield silently fewer rows.
    """
    out = []
    i, n = 0, len(blob)
    while i < n:
        # tolerate stray blank lines between records
        while blob.startswith(_CRLF, i):
            i += 2
        if i >= n:
            break
        end = blob.find(_CRLF + _CRLF, i)
        if end < 0:
            raise ValueError("truncated WARC header block")
        head = blob[i:end]
        if not head.startswith(b"WARC/"):
            raise ValueError(
                f"expected WARC version line at offset {i}, got "
                f"{head[:20]!r}")
        headers = _split_headers(head.split(_CRLF, 1)[1])
        try:
            clen = int(headers[b"content-length"])
        except KeyError:
            raise ValueError("record missing Content-Length") from None
        payload_start = end + 4
        payload_end = payload_start + clen
        if payload_end + 4 > n:
            raise ValueError("truncated WARC payload")
        if blob[payload_end:payload_end + 4] != _CRLF + _CRLF:
            raise ValueError("record not terminated by CRLFCRLF")
        out.append({
            "type": headers.get(b"warc-type", b"").decode(),
            "url": headers.get(b"warc-target-uri", b"").decode(),
            "ts_us": _parse_iso_us(headers[b"warc-date"].decode()),
            "content_type": headers.get(b"content-type", b"").decode(),
            "headers": headers,
            "payload": blob[payload_start:payload_end],
        })
        i = payload_end + 4
    return out


def _parse_http_payload(payload: bytes) -> tuple[bytes, str | None]:
    """HTTP response message → (body, Content-Language)."""
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0 or not payload.startswith(b"HTTP/"):
        raise ValueError("response record payload is not an HTTP message")
    headers = _split_headers(payload[:sep].split(_CRLF, 1)[1])
    lang = headers.get(b"content-language")
    return payload[sep + 4:], lang.decode() if lang is not None else None


def _warc_file_to_table(path: str) -> pa.Table:
    with open(path, "rb") as f:
        raw = f.read()
    # gzip.decompress handles concatenated members transparently; record
    # boundaries are recovered from the WARC framing, not the members
    blob = gzip.decompress(raw) if path.endswith(".gz") else raw
    urls, tss, htmls, langs = [], [], [], []
    for rec in parse_warc_members(blob):
        if rec["type"] != "response":
            continue  # warcinfo / request / metadata records pass through
        body, lang = _parse_http_payload(rec["payload"])
        urls.append(rec["url"])
        tss.append(rec["ts_us"])
        htmls.append(body)
        langs.append(lang)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "lang": pa.array(langs, pa.string()),
    })


def _wet_file_to_table(path: str) -> pa.Table:
    with open(path, "rb") as f:
        raw = f.read()
    blob = gzip.decompress(raw) if path.endswith(".gz") else raw
    urls, tss, texts = [], [], []
    for rec in parse_warc_members(blob):
        if rec["type"] != "conversion":
            continue
        urls.append(rec["url"])
        tss.append(rec["ts_us"])
        if rec["headers"].get(b"x-gush-null") == b"1":
            texts.append(None)
        else:
            texts.append(rec["payload"].decode("utf-8"))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
        "text": pa.array(texts, pa.string()),
    })


def _list_shards(path: str, pattern: str) -> list[str]:
    if os.path.isdir(path):
        paths = sorted(glob.glob(os.path.join(path, pattern)))
    else:
        paths = [path]
    if not paths:
        raise FileNotFoundError(f"no {pattern} shards under {path}")
    return paths


def _read_via(paths: list[str], file_to_table,
              schema: pa.Schema) -> "rd.Dataset":
    """One parse task per shard file: the shard is WARC's parallelism
    unit (CC convention), and ``flat_map``-style per-record tasks would
    re-ship whole shards. ``from_items`` of paths + ``map_batches`` with
    batch_size=1 keeps each task to exactly one shard and streams blocks
    downstream with backpressure."""

    def parse(batch: pa.Table) -> pa.Table:
        tabs = [file_to_table(p) for p in batch["path"].to_pylist()]
        if not tabs:
            return schema.empty_table()
        return pa.concat_tables(tabs)

    return (
        rd.from_items([{"path": p} for p in paths],
                      override_num_blocks=len(paths))
        .map_batches(parse, batch_format="pyarrow", batch_size=1)
    )


def read_warc(path: str) -> "rd.Dataset":
    """``*.warc.gz`` shard dir (or single file) → Dataset of
    ``(url, warc_ts, html, lang)`` response rows. Non-response records
    (warcinfo/request/metadata) are skipped, matching how CC consumers
    treat mixed shards."""
    return _read_via(_list_shards(path, "*.warc.gz"), _warc_file_to_table,
                     WARC_SCHEMA)


def read_wet(path: str) -> "rd.Dataset":
    """``*.warc.wet.gz`` shard dir → Dataset of ``(url, warc_ts, text)``
    conversion rows."""
    return _read_via(
        _list_shards(path, "*.warc.wet.gz"), _wet_file_to_table,
        WET_SCHEMA)


# ------------------------------------------------------------- fixture

WARC_FIXTURE = "/tmp/gush_ray_warc/u2000_s7_v2"


def ensure_warc_fixture() -> str:
    """Materialize the deterministic WARC/WET fixture triple:

    * ``truth.parquet`` — gen_pages(n_urls=2000, seed=7), all five
      columns (the oracle side reads THIS),
    * ``warc/part-*.warc.gz`` — (url, warc_ts, html, lang) through
      write_warc_dir,
    * ``wet/part-*.warc.wet.gz`` — (url, warc_ts, text) through
      write_wet_dir (text NULL where the generator emitted malformed
      html, exercising the null marker).

    Idempotent via a _COMPLETE marker, like every other /tmp fixture
    (queries_extra.ensure_oracle_fixtures pattern).
    """
    import pyarrow.parquet as pq

    from gush_ray.datagen import gen_pages

    done = os.path.join(WARC_FIXTURE, "_COMPLETE")
    if os.path.exists(done):
        return WARC_FIXTURE
    os.makedirs(WARC_FIXTURE, exist_ok=True)
    pages, _epochs = gen_pages(n_urls=2_000, seed=7)
    pq.write_table(pages.select(["url", "warc_ts", "html", "text", "lang"]),
                   os.path.join(WARC_FIXTURE, "truth.parquet"))
    write_warc_dir(pages.select(["url", "warc_ts", "html", "lang"]),
                   os.path.join(WARC_FIXTURE, "warc"), shard_rows=600)
    write_wet_dir(pages.select(["url", "warc_ts", "text"]),
                  os.path.join(WARC_FIXTURE, "wet"), shard_rows=600)
    with open(done, "w") as f:
        f.write("ok")
    return WARC_FIXTURE
