"""Deterministic synthetic Common-Crawl-style pages table.

The graft's analog of the reference's in-memory SQL-statement test sources
(reference: akka_streams/BinlogToAkkaTest.scala:25-41 feeds
``Source(List(sql...))``): a seeded generator (no wall-clock, no external
data) producing the ``(url, warc_ts, html, text, lang)`` change stream of
BASELINE.json's input_hint, with the stream phenomena FIXTURES.md §1 asks
for:

* ~70% of urls appear once (``insert``),
* ~25% appear 2–5 times at increasing warc_ts with mutated text (``update``),
* a few hot urls repeat heavily (join/shuffle skew),
* a small fraction of exact duplicate (url, warc_ts) rows (replay dedup),
* a small fraction of rows land one epoch later than their warc_ts
  (late data for watermark routing),
* a small fraction of malformed html (parse-failure side output).

``html`` is rendered from ``text`` by the invertible template in
:mod:`gush_ray.extract`, so extraction parity is checkable byte-for-byte.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from gush_ray.extract import render_html

_WORDS = (
    "data stream window event page crawl url text html join key value batch "
    "shuffle state actor arrow parquet ray engine watermark epoch partition "
    "hash salt skew count sum avg match pattern insert update session tumble "
    "slide lang site article body title crawler index fetch parse emit sink "
    "source manifest lineage resume checkpoint exactly once order time stamp"
).split()

LANGS = ("en", "de", "pt", "fr", "es")

START_US = 1_700_000_000_000_000  # fixed epoch origin (us)

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _gen_text(rng: np.random.RandomState, n_words: int) -> str:
    idx = rng.randint(0, len(_WORDS), size=n_words)
    words = [_WORDS[i] for i in idx]
    # sprinkle characters that exercise the escaper + UTF-8 handling
    if n_words > 8:
        words[3] = 'a&b<c>"d"'
        words[7] = "naïve-émü"
    return " ".join(words)


def _url_universe(rng: np.random.RandomState, n_urls: int,
                  url_offset: int = 0,
                  n_sites_total: int | None = None) -> np.ndarray:
    """The shared url universe of the pages AND clicks streams.

    Takes the caller's rng and consumes EXACTLY ONE draw (the
    site-of-url vector) so that gen_pages' historical RNG sequence — and
    therefore every cached corpus — is unchanged; gen_clicks gets the
    identical universe by passing a fresh RandomState(seed). Any change
    to the url format or draw order here changes BOTH streams together
    (a divergence would silently empty the stream-join fixtures).

    ``url_offset`` / ``n_sites_total`` exist for the SHARDED generator
    (:func:`write_pages_dir_parallel`): shard k names urls
    ``p/{offset+i}`` (globally unique across shards) while drawing
    sites from the GLOBAL site universe, so the dim join of a sharded
    corpus hits exactly like the single-process one. Defaults reproduce
    the historical single-shard layout bit-for-bit."""
    n_sites = n_sites_total if n_sites_total is not None else max(
        4, n_urls // 20)
    site_of_url = rng.randint(0, n_sites, size=n_urls)
    return np.array(
        [
            f"https://site{site_of_url[i]:04d}.example.org/p/{url_offset + i}"
            for i in range(n_urls)
        ]
    )


def gen_pages(
    n_urls: int = 2_000,
    seed: int = 7,
    n_hot: int = 3,
    hot_repeats: int = 60,
    update_frac: float = 0.25,
    dup_frac: float = 0.02,
    late_frac: float = 0.02,
    malformed_frac: float = 0.01,
    n_epochs: int = 4,
    span_us: int = 4 * 3600 * 1_000_000,
    near_dup_groups: int | None = None,
    link_frontier: bool = False,
    url_offset: int = 0,
    n_sites_total: int | None = None,
) -> tuple[pa.Table, np.ndarray]:
    """Return (pages table sorted by assigned epoch then warc_ts, epoch ids).

    Deterministic in all arguments. ``epoch`` is the *arrival* epoch: for
    late rows it is greater than the epoch their warc_ts falls in.
    """
    rng = np.random.RandomState(seed)

    urls = _url_universe(rng, n_urls, url_offset=url_offset,
                         n_sites_total=n_sites_total)
    lang_of_url = np.array(LANGS)[rng.randint(0, len(LANGS), size=n_urls)]

    # version counts: 70% one, 25% 2-5, hot urls many
    n_versions = np.ones(n_urls, dtype=np.int64)
    upd = rng.rand(n_urls) < update_frac
    n_versions[upd] = rng.randint(2, 6, size=int(upd.sum()))
    hot_ids = rng.choice(n_urls, size=min(n_hot, n_urls), replace=False)
    n_versions[hot_ids] = hot_repeats

    rows_url: list[int] = []
    rows_ts: list[int] = []
    rows_ver: list[int] = []
    for u in range(n_urls):
        k = int(n_versions[u])
        ts = np.sort(rng.randint(0, span_us, size=k))
        # enforce strictly increasing so versions are unambiguous
        ts = ts + np.arange(k)
        rows_url.extend([u] * k)
        rows_ts.extend((START_US + ts).tolist())
        rows_ver.extend(range(k))

    url_idx = np.array(rows_url)
    ts_us = np.array(rows_ts, dtype=np.int64)
    ver = np.array(rows_ver, dtype=np.int64)
    n = len(url_idx)

    # exact duplicate (url, warc_ts) replay rows
    n_dup = int(n * dup_frac)
    if n_dup:
        dup_pick = rng.choice(n, size=n_dup, replace=False)
        url_idx = np.concatenate([url_idx, url_idx[dup_pick]])
        ts_us = np.concatenate([ts_us, ts_us[dup_pick]])
        ver = np.concatenate([ver, ver[dup_pick]])
    n = len(url_idx)

    # texts: base text per url, mutated per version
    if near_dup_groups:
        # near-dup corpus mode: urls come in groups of ``near_dup_groups``
        # sharing one base text, each member differing only in a 2-word
        # url-specific tail — cross-url shingle Jaccard ~0.9 inside a
        # group, ~0 across groups (the streaming/batch near-dup
        # operators' ground truth). RNG draws on this branch only, so
        # the default corpus (and every cached fixture) is unchanged.
        G = near_dup_groups
        n_groups = -(-n_urls // G)
        g_words = rng.randint(30, 90, size=n_groups)
        g_texts = [_gen_text(rng, int(w)) for w in g_words]
        base_texts = [f"{g_texts[u // G]} tail{u} mark{u % 7}"
                      for u in range(n_urls)]
    else:
        base_words = rng.randint(20, 120, size=n_urls)
        base_texts = [_gen_text(rng, int(w)) for w in base_words]
    texts = [
        base_texts[u] if v == 0 else f"{base_texts[u]} [rev {v}]"
        for u, v in zip(url_idx, ver)
    ]

    # epochs by event time, then push a fraction late by one epoch
    # (cap: the strictly-increasing ts shift can push a timestamp past
    # span_us, which must not create an unwritten epoch n_epochs)
    epoch_len = span_us // n_epochs + 1
    epoch = np.minimum(
        ((ts_us - START_US) // epoch_len).astype(np.int64), n_epochs - 1
    )
    n_late = int(n * late_frac)
    if n_late:
        late_pick = rng.choice(n, size=n_late, replace=False)
        epoch[late_pick] = np.minimum(epoch[late_pick] + 1, n_epochs - 1)

    # malformed html rows
    malformed = rng.rand(n) < malformed_frac

    langs = lang_of_url[url_idx]
    url_strs = urls[url_idx]
    htmls = [
        b"<html><body>malformed page, no article tag"
        if bad
        else render_html(u, t, lg)
        for u, t, lg, bad in zip(url_strs, texts, langs, malformed)
    ]
    if link_frontier:
        # frontier mode: splice <a href> anchors into every well-formed
        # page (before the footer — the <article> extraction regex is
        # untouched, so extract parity holds). Targets are a PURE
        # function of (url index, version, link slot) — no RNG draws, so
        # the default corpus and every cached fixture are unchanged.
        # k=0..3 links per row; self-targets skipped (a page never
        # discovers itself; state/frontier.py drops them anyway).
        # link_frontier="messy" additionally wraps each target in a
        # deterministic surface variant (host case / default port /
        # trailing slash) — the canonicalizing-frontier ground truth.
        def _messy(u: str, mode: int) -> str:
            if mode == 1:  # uppercase host
                scheme, rest = u.split("://", 1)
                host, path = rest.split("/", 1)
                return f"{scheme}://{host.upper()}/{path}"
            if mode == 2:  # explicit default port (urls are https)
                scheme, rest = u.split("://", 1)
                host, path = rest.split("/", 1)
                return f"{scheme}://{host}:443/{path}"
            if mode == 3:  # trailing slash
                return u + "/"
            return u

        def _anchors(i: int, v: int) -> bytes:
            k = (i * 7 + v) % 4
            parts = []
            for j in range(k):
                t = ((i + 1) * 2654435761 + v * 1_000_003
                     + j * 40503) % n_urls
                if t == i:
                    continue
                dst = urls[t]
                if link_frontier == "messy":
                    dst = _messy(dst, (i + v + j) % 4)
                parts.append(f'<a href="{dst}">l{j}</a>')
            return ("<nav>" + "".join(parts) + "</nav>").encode()

        htmls = [
            h if bad else h.replace(b"<footer>",
                                    _anchors(int(u), int(v)) + b"<footer>",
                                    1)
            for h, u, v, bad in zip(htmls, url_idx, ver, malformed)
        ]

    order = np.lexsort((ts_us, epoch))
    table = pa.table(
        {
            "url": pa.array(url_strs[order], type=pa.string()),
            "warc_ts": pa.array(ts_us[order]).cast(pa.timestamp("us")),
            "html": pa.array([htmls[i] for i in order], type=pa.binary()),
            "text": pa.array(
                [None if malformed[i] else texts[i] for i in order],
                type=pa.string(),
            ),
            "lang": pa.array(langs[order], type=pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    return table, epoch[order]


def write_pages_dir(
    out_dir: str,
    *,
    n_urls: int = 2_000,
    seed: int = 7,
    n_epochs: int = 4,
    rows_per_file: int = 8_000,
    **kw,
) -> list[str]:
    """Write one DIRECTORY of parquet shard files per arrival epoch;
    returns the epoch-directory list.

    Layout ``epoch=NNNN/part-KK.parquet`` is the 'ordered change stream'
    contract (graft of the binlog cursor, reference:
    binlog/BinlogServerReader.scala:23). Many files per epoch matters for
    throughput: Ray Data parallelizes reads per file, and every downstream
    stage inherits the read's block count — a single fat file serializes
    the whole epoch.
    """
    os.makedirs(out_dir, exist_ok=True)
    table, epoch = gen_pages(n_urls=n_urls, seed=seed, n_epochs=n_epochs, **kw)
    paths = []
    for e in range(n_epochs):
        mask = pa.array(epoch == e)
        sub = table.filter(mask)
        d = os.path.join(out_dir, f"epoch={e:04d}")
        os.makedirs(d, exist_ok=True)
        n_files = max(1, -(-sub.num_rows // rows_per_file))
        per = -(-sub.num_rows // n_files)
        for k in range(n_files):
            shard = sub.slice(k * per, per)
            # zstd-1: 26% fewer bytes than snappy at equal read speed
            # (measured on this corpus) — the stream read is the largest
            # single IO of the flagship job and disk bandwidth is the
            # shared non-scaling resource at high CPU counts
            pq.write_table(
                shard, os.path.join(d, f"part-{k:04d}.parquet"),
                row_group_size=4096, compression="zstd",
                compression_level=1,
            )
        paths.append(d)
    return paths


def gen_clicks(
    n_urls: int = 2_000,
    seed: int = 7,
    clicks_per_epoch: int = 1_500,
    n_epochs: int = 4,
    span_us: int = 4 * 3600 * 1_000_000,
    url_offset: int = 0,
    n_sites_total: int | None = None,
    click_id_offset: int = 0,
) -> tuple[pa.Table, np.ndarray]:
    """Second event stream over the SAME url universe as
    :func:`gen_pages` (same ``n_urls``/``seed`` → identical urls):
    (url, ts, click_id) rows for the stream-stream join fixtures.

    Epoch = the event-time slice the ts falls in (``span_us/n_epochs``
    each, same boundaries as gen_pages), with NO late rows — each
    epoch's ts range therefore sits entirely at-or-above the previous
    epochs' maxima, so a correctly-bounded watermark never classifies a
    click late (the join equivalence tests rely on this).
    """
    urls = _url_universe(np.random.RandomState(seed), n_urls,
                         url_offset=url_offset,
                         n_sites_total=n_sites_total)
    crng = np.random.RandomState(seed + 4099)
    n = clicks_per_epoch * n_epochs
    url_idx = crng.randint(0, n_urls, size=n)
    ts_us = START_US + np.sort(crng.randint(0, span_us, size=n))
    epoch_len = span_us // n_epochs + 1
    epoch = np.minimum(
        ((ts_us - START_US) // epoch_len).astype(np.int64), n_epochs - 1
    )
    table = pa.table(
        {
            "url": pa.array(urls[url_idx], type=pa.string()),
            "ts": pa.array(ts_us).cast(pa.timestamp("us")),
            "click_id": pa.array(
                click_id_offset + np.arange(n), type=pa.int64()),
        }
    )
    return table, epoch


def write_clicks_dir(out_dir: str, *, n_urls: int = 2_000, seed: int = 7,
                     clicks_per_epoch: int = 1_500, n_epochs: int = 4,
                     rows_per_file: int = 8_000, **kw) -> list[str]:
    """Epoch-dir layout for the clicks stream (same ``epoch=NNNN``
    contract as :func:`write_pages_dir`, so both streams align)."""
    os.makedirs(out_dir, exist_ok=True)
    table, epoch = gen_clicks(n_urls=n_urls, seed=seed,
                              clicks_per_epoch=clicks_per_epoch,
                              n_epochs=n_epochs, **kw)
    paths = []
    for e in range(n_epochs):
        sub = table.filter(pa.array(epoch == e))
        d = os.path.join(out_dir, f"epoch={e:04d}")
        os.makedirs(d, exist_ok=True)
        n_files = max(1, -(-sub.num_rows // rows_per_file))
        per = -(-sub.num_rows // n_files)
        for k in range(n_files):
            pq.write_table(
                sub.slice(k * per, per),
                os.path.join(d, f"part-{k:04d}.parquet"),
                row_group_size=4096, compression="zstd",
                compression_level=1,
            )
        paths.append(d)
    return paths


def gen_dim_sites(n_sites: int, seed: int = 7) -> pa.Table:
    """Dimension snapshot keyed by site domain (FIXTURES.md §2)."""
    rng = np.random.RandomState(seed + 1)
    cats = np.array(["news", "shop", "blog", "forum"])
    return pa.table(
        {
            "site": pa.array(
                [f"site{i:04d}.example.org" for i in range(n_sites)]
            ),
            "category": pa.array(cats[rng.randint(0, len(cats), size=n_sites)]),
            "weight": pa.array(rng.rand(n_sites).round(6)),
        }
    )


def ensure_pages(tmp_root: str = "/tmp/gush_ray_pages", *, n_urls: int = 2_000,
                 seed: int = 7, n_epochs: int = 4, **kw) -> str:
    """Idempotently materialize a pages dir for tests/queries; returns dir."""
    key = f"u{n_urls}_s{seed}_e{n_epochs}_v3"
    if kw:  # non-default generator params must not hit the default cache
        import hashlib

        sig = hashlib.sha1(
            repr(sorted(kw.items())).encode()
        ).hexdigest()[:8]
        key += f"_{sig}"
    out = os.path.join(tmp_root, key)
    marker = os.path.join(out, "_COMPLETE")
    if not os.path.exists(marker):
        write_pages_dir(out, n_urls=n_urls, seed=seed, n_epochs=n_epochs, **kw)
        with open(marker, "w") as f:
            f.write("ok")
    return out


def write_pages_dir_parallel(
    out_dir: str,
    *,
    n_urls: int,
    seed: int = 7,
    n_epochs: int = 16,
    n_shards: int = 32,
    rows_per_file: int = 32_768,
    **kw,
) -> int:
    """Sharded, Ray-parallel :func:`write_pages_dir` for headroom-scale
    corpora (tens of millions of rows): shard k generates urls
    ``[k*per, k*per+per)`` with its own RNG stream over the GLOBAL site
    universe, so urls are disjoint across shards and the dim join hits
    exactly as in the single-process layout. Content differs from the
    single-process corpus (different RNG partitioning) but has the same
    stream phenomena per shard; headroom/bench runs measure throughput,
    not oracle parity, so that is the right trade. Requires an
    initialized Ray session. Returns total rows written."""
    import ray

    n_sites_total = max(4, n_urls // 20)
    per = -(-n_urls // n_shards)
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote(num_cpus=1)
    def _shard(k: int) -> int:
        lo = k * per
        cnt = min(per, n_urls - lo)
        if cnt <= 0:
            return 0
        table, epoch = gen_pages(
            n_urls=cnt, seed=seed * 1_000_003 + k, n_epochs=n_epochs,
            url_offset=lo, n_sites_total=n_sites_total, **kw)
        for e in range(n_epochs):
            sub = table.filter(pa.array(epoch == e))
            d = os.path.join(out_dir, f"epoch={e:04d}")
            os.makedirs(d, exist_ok=True)
            n_files = max(1, -(-sub.num_rows // rows_per_file))
            per_f = -(-sub.num_rows // n_files)
            for j in range(n_files):
                pq.write_table(
                    sub.slice(j * per_f, per_f),
                    os.path.join(d, f"part-{k:04d}-{j:04d}.parquet"),
                    row_group_size=4096, compression="zstd",
                    compression_level=1,
                )
        return table.num_rows
    return int(sum(ray.get([_shard.remote(k) for k in range(n_shards)])))


def write_clicks_dir_parallel(
    out_dir: str,
    *,
    n_urls: int,
    seed: int = 7,
    clicks_per_epoch: int = 600_000,
    n_epochs: int = 16,
    n_shards: int = 32,
    rows_per_file: int = 65_536,
    **kw,
) -> int:
    """Sharded clicks twin of :func:`write_pages_dir_parallel`: shard k
    reproduces the SAME url slice as pages shard k (same shard seed /
    offset / global site count), so stream-stream joins hit across the
    two sharded corpora. click_id stays globally unique via per-shard
    offsets. Requires an initialized Ray session."""
    import ray

    n_sites_total = max(4, n_urls // 20)
    per = -(-n_urls // n_shards)
    cpe_shard = -(-clicks_per_epoch // n_shards)
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote(num_cpus=1)
    def _shard(k: int) -> int:
        lo = k * per
        cnt = min(per, n_urls - lo)
        if cnt <= 0:
            return 0
        table, epoch = gen_clicks(
            n_urls=cnt, seed=seed * 1_000_003 + k,
            clicks_per_epoch=cpe_shard, n_epochs=n_epochs,
            url_offset=lo, n_sites_total=n_sites_total,
            click_id_offset=k * cpe_shard * n_epochs, **kw)
        for e in range(n_epochs):
            sub = table.filter(pa.array(epoch == e))
            d = os.path.join(out_dir, f"epoch={e:04d}")
            os.makedirs(d, exist_ok=True)
            n_files = max(1, -(-sub.num_rows // rows_per_file))
            per_f = -(-sub.num_rows // n_files)
            for j in range(n_files):
                pq.write_table(
                    sub.slice(j * per_f, per_f),
                    os.path.join(d, f"part-{k:04d}-{j:04d}.parquet"),
                    row_group_size=4096, compression="zstd",
                    compression_level=1,
                )
        return table.num_rows
    return int(sum(ray.get([_shard.remote(k) for k in range(n_shards)])))


# fixed-path fixture for the streaming near-dup operator + its SQL
# oracle (both sides must read the same parquet bytes; the oracle SQL is
# a static string, so the path is a constant, not sf_dir-derived)
NEARDUP_PAGES_FIXTURE = "/tmp/gush_ray_neardup_pages/u600_s11_e4_g3_v1"


def ensure_neardup_pages() -> str:
    """Pages stream whose urls form groups of 3 sharing a base text
    (cross-url near-dups; gen_pages(near_dup_groups=3))."""
    out = NEARDUP_PAGES_FIXTURE
    marker = os.path.join(out, "_COMPLETE")
    if not os.path.exists(marker):
        write_pages_dir(out, n_urls=600, seed=11, n_epochs=4,
                        near_dup_groups=3)
        with open(marker, "w") as f:
            f.write("ok")
    return out


# fixed-path fixture for the streaming frontier operator + its SQL
# oracle (both sides read the same parquet bytes; the oracle SQL is a
# static string, so the path is a constant, not sf_dir-derived)
FRONTIER_PAGES_FIXTURE = "/tmp/gush_ray_frontier_pages/u600_s13_e4_v1"


def ensure_frontier_pages() -> str:
    """Pages stream whose well-formed html carries deterministic
    ``<a href>`` anchors (gen_pages(link_frontier=True))."""
    out = FRONTIER_PAGES_FIXTURE
    marker = os.path.join(out, "_COMPLETE")
    if not os.path.exists(marker):
        write_pages_dir(out, n_urls=600, seed=13, n_epochs=4,
                        link_frontier=True)
        with open(marker, "w") as f:
            f.write("ok")
    return out


FRONTIER_MESSY_FIXTURE = "/tmp/gush_ray_frontier_messy/u600_s13_e4_v1"


def ensure_frontier_messy_pages() -> str:
    """Like :func:`ensure_frontier_pages` but anchor targets carry
    deterministic surface variants (link_frontier='messy') — the
    canonicalizing-frontier operator's ground truth."""
    out = FRONTIER_MESSY_FIXTURE
    marker = os.path.join(out, "_COMPLETE")
    if not os.path.exists(marker):
        write_pages_dir(out, n_urls=600, seed=13, n_epochs=4,
                        link_frontier="messy")
        with open(marker, "w") as f:
            f.write("ok")
    return out


def gen_media_table(n: int = 60, seed: int = 11,
                    return_pixels: bool = False):
    """Deterministic multimodal fixture: real PNG / BMP / WAV blobs (plus
    a few deliberately-truncated ones) as an opaque binary column with an
    id and a ground-truth kind — input for the real-decode stage.
    ``return_pixels``: also return {media_id: raw uint8 pixel array} for
    the image rows (the generator-side ground truth the resize oracle
    hashes against) as a second value."""
    from gush_ray.stages.codecs import encode_bmp, encode_png, encode_wav

    rng = np.random.RandomState(seed)
    blobs, kinds = [], []
    pixels: dict[int, np.ndarray] = {}
    for i in range(n):
        k = i % 3
        if k == 0:
            w, h = int(rng.randint(4, 40)), int(rng.randint(4, 40))
            px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            pixels[len(blobs)] = px
            blobs.append(encode_png(px))
            kinds.append("png")
        elif k == 1:
            w, h = int(rng.randint(4, 40)), int(rng.randint(4, 40))
            px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            pixels[len(blobs)] = px
            blobs.append(encode_bmp(px))
            kinds.append("bmp")
        else:
            nsamp = int(rng.randint(200, 2000))
            s = (rng.randn(nsamp, 1) * 8000).astype(np.int16)
            blobs.append(encode_wav(s, rate=16_000))
            kinds.append("wav")
    # a few malformed blobs: valid magic, truncated body (dead-letter path)
    for j in range(max(2, n // 20)):
        blobs.append(blobs[j][: len(blobs[j]) // 2])
        kinds.append("truncated")
    # JPEG/GIF: real frame geometry via pure header walk (pixel decode
    # needs native codecs this environment lacks)
    from gush_ray.stages.codecs import encode_gif_header, encode_jpeg_header
    for j in range(max(2, n // 10)):
        w, h = int(rng.randint(16, 1920)), int(rng.randint(16, 1080))
        if j % 2 == 0:
            blobs.append(encode_jpeg_header(w, h, 3))
            kinds.append("jpeg")
        else:
            blobs.append(encode_gif_header(w, h, 1 + j % 8))
            kinds.append("gif")
    tbl = pa.table({
        "media_id": pa.array(range(len(blobs)), type=pa.int64()),
        "blob": pa.array(blobs, type=pa.binary()),
        "true_kind": pa.array(kinds, type=pa.string()),
    })
    if return_pixels:
        return tbl, pixels
    return tbl


def ensure_resize_fixture(tmp_root: str = "/tmp/gush_ray_media_rs/v1",
                          n: int = 60, seed: int = 11,
                          out_w: int = 32, out_h: int = 32) -> str:
    """Resize-oracle fixture (round-4: pairs ``multimodal_resize``
    exactly, the ``multimodal_decode`` technique): ``media.parquet`` is
    the gen_media_table blob stream; ``expected_resize.parquet`` holds
    the GENERATOR's ground truth per media_id — whether the resize
    stage must resize the blob (real PNG/BMP only; WAV / truncated /
    header-walk JPEG/GIF pass through) and, for resized rows, the md5
    of the canonical resized-pixel bytes ``"{h}:{w}:{c}:" + raw``.

    The expected pixels come from the generator's RAW arrays indexed
    with the floor mapping ``src = dst * in // out`` (written here
    independently of stages/codecs.resize_nearest), so the pair
    verifies the engine's decode → resize → PNG-re-encode → re-decode
    round trip byte-for-byte: one wrong pixel anywhere breaks the
    hash."""
    import hashlib

    import pyarrow.parquet as _pq

    marker = os.path.join(tmp_root, "_COMPLETE")
    if os.path.exists(marker):
        return tmp_root
    os.makedirs(tmp_root, exist_ok=True)
    tbl, pixels = gen_media_table(n=n, seed=seed, return_pixels=True)
    _pq.write_table(tbl, os.path.join(tmp_root, "media.parquet"))
    ids = tbl["media_id"].to_pylist()
    resized, hashes = [], []
    for mid in ids:
        px = pixels.get(mid)
        if px is None:
            resized.append(False)
            hashes.append(None)
            continue
        h, w = px.shape[:2]
        ys = np.minimum(np.arange(out_h) * h // out_h, h - 1)
        xs = np.minimum(np.arange(out_w) * w // out_w, w - 1)
        rp = px[ys][:, xs]
        c = rp.shape[2] if rp.ndim == 3 else 1
        hashes.append(hashlib.md5(
            f"{rp.shape[0]}:{rp.shape[1]}:{c}:".encode()
            + np.ascontiguousarray(rp).tobytes()).hexdigest())
        resized.append(True)
    _pq.write_table(
        pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "resized": pa.array(resized, type=pa.bool_()),
            "px_md5": pa.array(hashes, type=pa.string()),
        }),
        os.path.join(tmp_root, "expected_resize.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return tmp_root


def ensure_media_fixture(tmp_root: str = "/tmp/gush_ray_media/v3",
                         n: int = 60, seed: int = 11) -> str:
    """Materialize the multimodal fixture as parquet at a FIXED path:
    ``media.parquet`` (media_id, blob, true_kind) plus
    ``expected.parquet`` — the GENERATOR's per-blob ground truth
    (decode_kind, decode_ok, width, height) that a DuckDB oracle can
    read, so the real decode path is verifiable end-to-end: the engine
    decodes actual bytes, the oracle reads generation-time intent, and
    any codec drift breaks the pair.

    Expected values per kind: png/bmp → generated dims; wav →
    (n_samples, channels) in the (width, height) slots (the audio
    convention of DecodeFeatures); jpeg/gif → header-walk geometry =
    generated dims; truncated blobs → decode_kind='malformed',
    decode_ok=False with the deterministic fallback dims of
    ``multimodal._fake_decode`` (a fixture-generation detail: the
    interesting assertions for malformed blobs are kind/ok)."""
    import pyarrow.parquet as _pq

    marker = os.path.join(tmp_root, "_COMPLETE")
    if os.path.exists(marker):
        return tmp_root
    os.makedirs(tmp_root, exist_ok=True)
    from gush_ray.stages.codecs import (
        encode_bmp, encode_gif_header, encode_jpeg_header, encode_png,
        encode_wav,
    )
    from gush_ray.stages.multimodal import _fake_decode

    rng = np.random.RandomState(seed)
    blobs, kinds, exp_w, exp_h, exp_kind, exp_ok = [], [], [], [], [], []
    for i in range(n):
        k = i % 3
        if k == 0:
            w, h = int(rng.randint(4, 40)), int(rng.randint(4, 40))
            px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            blobs.append(encode_png(px)); kinds.append("png")
            exp_w.append(w); exp_h.append(h)
            exp_kind.append("png"); exp_ok.append(True)
        elif k == 1:
            w, h = int(rng.randint(4, 40)), int(rng.randint(4, 40))
            px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            blobs.append(encode_bmp(px)); kinds.append("bmp")
            exp_w.append(w); exp_h.append(h)
            exp_kind.append("bmp"); exp_ok.append(True)
        else:
            nsamp = int(rng.randint(200, 2000))
            s = (rng.randn(nsamp, 1) * 8000).astype(np.int16)
            blobs.append(encode_wav(s, rate=16_000)); kinds.append("wav")
            exp_w.append(nsamp); exp_h.append(1)
            exp_kind.append("wav"); exp_ok.append(True)
    for j in range(max(2, n // 20)):
        t = blobs[j][: len(blobs[j]) // 2]
        blobs.append(t); kinds.append("truncated")
        fw, fh, _f = _fake_decode(t)
        exp_w.append(fw); exp_h.append(fh)
        exp_kind.append("malformed"); exp_ok.append(False)
    for j in range(max(2, n // 10)):
        w, h = int(rng.randint(16, 1920)), int(rng.randint(16, 1080))
        if j % 2 == 0:
            blobs.append(encode_jpeg_header(w, h, 3)); kinds.append("jpeg")
            exp_kind.append("jpeg")
        else:
            blobs.append(encode_gif_header(w, h, 1 + j % 8))
            kinds.append("gif")
            exp_kind.append("gif")
        exp_w.append(w); exp_h.append(h); exp_ok.append(True)
    # real-BODY JPEG/GIF blobs (stages/jpeg.py, stages/gif.py): the
    # decode stage must recover true pixel dims from actual entropy-
    # coded data, not just header geometry
    from gush_ray.stages.gif import encode_gif
    from gush_ray.stages.jpeg import encode_jpeg, encode_jpeg_progressive

    for j in range(max(6, n // 10)):
        w, h = int(rng.randint(8, 64)), int(rng.randint(8, 64))
        if j % 3 == 0:
            px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            blobs.append(encode_jpeg(px, quality=85)); kinds.append("jpeg")
            exp_kind.append("jpeg")
        elif j % 3 == 1:
            px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            blobs.append(encode_jpeg_progressive(px, quality=85))
            kinds.append("jpeg")
            exp_kind.append("jpeg")
        else:
            pal = rng.randint(0, 256, size=(32, 3), dtype=np.uint8)
            px = pal[rng.randint(0, 32, size=(h, w))]
            blobs.append(encode_gif(px)); kinds.append("gif")
            exp_kind.append("gif")
        exp_w.append(w); exp_h.append(h); exp_ok.append(True)
    ids = pa.array(range(len(blobs)), type=pa.int64())
    _pq.write_table(
        pa.table({"media_id": ids,
                  "blob": pa.array(blobs, type=pa.binary()),
                  "true_kind": pa.array(kinds, type=pa.string())}),
        os.path.join(tmp_root, "media.parquet"),
    )
    _pq.write_table(
        pa.table({"media_id": ids,
                  "decode_kind": pa.array(exp_kind, type=pa.string()),
                  "decode_ok": pa.array(exp_ok, type=pa.bool_()),
                  "width": pa.array(exp_w, type=pa.int32()),
                  "height": pa.array(exp_h, type=pa.int32())}),
        os.path.join(tmp_root, "expected.parquet"),
    )
    with open(marker, "w") as f:
        f.write("ok")
    return tmp_root


def ensure_video_fixture(tmp_root: str = "/tmp/gush_ray_video/v2",
                         n: int = 12, n_avi: int = 6, seed: int = 19,
                         every_k: int = 5) -> str:
    """Materialize the video fixture as parquet at a FIXED path:
    ``video.parquet`` (media_id, blob) plus ``expected.parquet`` with the
    generator's per-clip ground truth (n_frames, width, height,
    n_sampled at ``every_k``). v2 adds ``n_avi`` MJPEG-in-AVI clips
    (half grayscale, half RGB — the COMPRESSED video path through the
    numpy JPEG codec, stages/avi.py). Truncated clips (one Y4M, one AVI)
    are EXCLUDED from expected: a clip cut mid-frame fails decode
    atomically and the sampling stage drops it whole (dead-letter
    analog, pinned by tests) — the oracle sees only decodable clips."""
    import pyarrow.parquet as _pq

    from gush_ray.stages.avi import encode_avi_mjpeg
    from gush_ray.stages.codecs import encode_y4m

    marker = os.path.join(tmp_root, "_COMPLETE")
    if os.path.exists(marker):
        return tmp_root
    os.makedirs(tmp_root, exist_ok=True)
    rng = np.random.RandomState(seed)
    blobs, exp = [], []
    for i in range(n):
        nf = int(rng.randint(6, 30))
        w, h = int(rng.randint(8, 24)), int(rng.randint(8, 24))
        frames = rng.randint(0, 256, size=(nf, h, w), dtype=np.uint8)
        blobs.append(encode_y4m(frames, (25, 1)))
        exp.append((i, nf, w, h, -(-nf // every_k)))
    for j in range(n_avi):
        nf = int(rng.randint(6, 30))
        w, h = int(rng.randint(8, 24)), int(rng.randint(8, 24))
        shape = (nf, h, w) if j % 2 == 0 else (nf, h, w, 3)
        frames = rng.randint(0, 256, size=shape, dtype=np.uint8)
        blobs.append(encode_avi_mjpeg(frames, (30, 1)))
        exp.append((n + j, nf, w, h, -(-nf // every_k)))
    blobs.append(blobs[0][: len(blobs[0]) // 2])  # truncated Y4M clip
    blobs.append(blobs[n][: len(blobs[n]) // 2])  # truncated AVI clip
    _pq.write_table(
        pa.table({"media_id": pa.array(range(len(blobs)), type=pa.int64()),
                  "blob": pa.array(blobs, type=pa.binary())}),
        os.path.join(tmp_root, "video.parquet"),
    )
    mid, nf_, w_, h_, ns_ = zip(*exp)
    _pq.write_table(
        pa.table({"media_id": pa.array(mid, type=pa.int64()),
                  "n_frames": pa.array(nf_, type=pa.int64()),
                  "width": pa.array(w_, type=pa.int32()),
                  "height": pa.array(h_, type=pa.int32()),
                  "n_sampled": pa.array(ns_, type=pa.int64())}),
        os.path.join(tmp_root, "expected.parquet"),
    )
    with open(marker, "w") as f:
        f.write("ok")
    return tmp_root


def gen_video_table(n: int = 12, seed: int = 19) -> pa.Table:
    """Deterministic video fixture: real Y4M grayscale clips of varying
    frame counts (plus one truncated clip) as opaque binary blobs.
    (MJPEG-AVI clips live in ensure_video_fixture's v2 parquet; this
    in-memory table keeps the original Y4M-only shape for unit tests.)"""
    from gush_ray.stages.codecs import encode_y4m

    rng = np.random.RandomState(seed)
    blobs = []
    for i in range(n):
        nf = int(rng.randint(6, 30))
        w, h = int(rng.randint(8, 24)), int(rng.randint(8, 24))
        frames = rng.randint(0, 256, size=(nf, h, w), dtype=np.uint8)
        blobs.append(encode_y4m(frames, (25, 1)))
    blobs.append(blobs[0][: len(blobs[0]) // 2])  # truncated clip
    return pa.table({
        "media_id": pa.array(range(len(blobs)), type=pa.int64()),
        "blob": pa.array(blobs, type=pa.binary()),
    })


# ---------------------------------------------------------------------------
# web-graph + URL fixtures (round 3, fifth wave)
# ---------------------------------------------------------------------------

# fixed paths: the SQL oracles are static strings reading the same bytes
# (v2: anchors carry deterministic word text for the anchor-text ops)
LINK_FIXTURE = "/tmp/gush_ray_links/v3"
URL_FIXTURE = "/tmp/gush_ray_urls/v1"


def gen_linked_pages(n_urls: int = 900, seed: int = 23,
                     max_links: int = 6) -> pa.Table:
    """Pages whose html carries ``<a href>`` anchors — the link-graph
    fixture (page_id, url, html).

    Deterministic in all arguments. Each page links to 0..max_links
    targets drawn from the url universe (self-links and duplicate links
    allowed — PageRank treats a duplicate as double weight, same as the
    SQL oracle); ~15% of anchors point at EXTERNAL urls outside the node
    set (they appear in link extraction but drop out of the graph via
    the node join). A ``<link href>`` stylesheet decoy per page pins
    that extraction matches only ``<a href="``.
    """
    rng = np.random.RandomState(seed)
    urls = _url_universe(rng, n_urls)
    n_links = rng.randint(0, max_links + 1, size=n_urls)
    htmls = []
    for i in range(n_urls):
        k = int(n_links[i])
        anchors = []
        for j in range(k):
            if rng.rand() < 0.15:
                ext = int(rng.randint(0, 50))
                dst = f"https://external{ext:02d}.example.net/e/{ext}"
            else:
                dst = urls[int(rng.randint(0, n_urls))]
            # two-word anchor text, a pure function of (page, slot) —
            # the anchor-text aggregation operators' ground signal
            w1 = _WORDS[(i * 13 + j * 7) % len(_WORDS)]
            w2 = _WORDS[(i * 31 + j * 17 + 5) % len(_WORDS)]
            # v3: ~20% of anchors carry rel="nofollow" (deterministic in
            # (page, slot)) — the nofollow-aware extraction's signal;
            # plain extraction still matches them (href regex unchanged)
            rel = ' rel="nofollow"' if (i * 7 + j * 3) % 5 == 0 else ""
            anchors.append(f'<a href="{dst}"{rel}>{w1} {w2}</a>')
        # v3: every 9th page is marked noindex (meta-robots filter signal)
        meta = ('<meta name="robots" content="noindex,follow">'
                if i % 9 == 0 else "")
        htmls.append(
            f'<!DOCTYPE html><html><head><title>{urls[i]}</title>{meta}'
            f'<link href="/static/site.css" rel="stylesheet"></head>'
            f"<body><article>page {i}</article>"
            f'<nav>{"".join(anchors)}</nav></body></html>'.encode()
        )
    return pa.table({
        "page_id": pa.array(range(n_urls), type=pa.int64()),
        "url": pa.array(urls.tolist(), type=pa.string()),
        "html": pa.array(htmls, type=pa.binary()),
    })


def ensure_link_fixture(tmp_root: str = LINK_FIXTURE) -> str:
    marker = os.path.join(tmp_root, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(tmp_root, exist_ok=True)
        pq.write_table(gen_linked_pages(), os.path.join(tmp_root,
                                                        "pages.parquet"))
        with open(marker, "w") as f:
            f.write("ok")
    return tmp_root


def gen_messy_urls(n_base: int = 800, seed: int = 29,
                   variants: int = 3) -> pa.Table:
    """Messy-URL fixture (uid, raw_url): each of ``n_base`` canonical
    urls appears as ``variants`` surface forms differing in host/scheme
    case, an explicit default port, a fragment, query-parameter order,
    and a trailing slash — all canonicalizing back to the same string
    under :func:`gush_ray.stages.web.canonicalize_urls`' rule set.
    """
    rng = np.random.RandomState(seed)
    uids, raws = [], []
    uid = 0
    for i in range(n_base):
        scheme = "https" if i % 3 else "http"
        host = f"site{i % 97:03d}.example.org"
        path = f"/d{i % 7}/page{i}" if i % 5 else f"/page{i}"
        params = [f"a={i % 5}", f"b={i % 3}"][: (i % 3)]
        for v in range(variants):
            s, h, p, q = scheme, host, path, list(params)
            if rng.rand() < 0.5:  # scheme/host case noise
                s = s.upper() if rng.rand() < 0.5 else s
                h = "".join(c.upper() if rng.rand() < 0.4 else c
                            for c in h)
            if rng.rand() < 0.4:  # explicit default port
                h += ":443" if scheme == "https" else ":80"
            if rng.rand() < 0.4 and q:
                q = q[::-1]  # unsorted params
            frag = f"#sec{int(rng.randint(0, 9))}" if rng.rand() < 0.3 else ""
            trail = "/" if rng.rand() < 0.3 else ""
            qs = "?" + "&".join(q) if q else ""
            uids.append(uid)
            raws.append(f"{s}://{h}{p}{trail}{qs}{frag}")
            uid += 1
    return pa.table({
        "uid": pa.array(uids, type=pa.int64()),
        "raw_url": pa.array(raws, type=pa.string()),
    })


def ensure_url_fixture(tmp_root: str = URL_FIXTURE) -> str:
    marker = os.path.join(tmp_root, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(tmp_root, exist_ok=True)
        pq.write_table(gen_messy_urls(), os.path.join(tmp_root,
                                                      "urls.parquet"))
        with open(marker, "w") as f:
            f.write("ok")
    return tmp_root


BOILER_FIXTURE = "/tmp/gush_ray_boiler/v2"


def gen_boiler_pages(n_hosts: int = 30, pages_per_host: int = 20,
                     seed: int = 31) -> pa.Table:
    """Per-host boilerplate fixture (doc_id, host, text) for the
    boilerplate-removal operator: real newline-separated lines, unlike
    the word-chunk "lines" of the documents table.

    Per host, every page carries the host's HEADER and FOOTER line
    (boilerplate by any threshold), even pages additionally carry a NAV
    line (boilerplate at ``min_docs<=pages_per_host/2``), and pages 1-2
    share a PROMO line that appears in exactly 2 docs (stays under the
    default ``min_docs=3`` — pins that the threshold is a count, not
    "appears twice"). Body lines are unique random-word sentences.
    Page 0 of every 5th host has NO body lines — after removal it is
    all-boilerplate and must drop out of the output entirely (inner
    reassembly, same as the SQL oracle's inner aggregation).
    """
    rng = np.random.RandomState(seed)
    ids, hosts, texts = [], [], []
    doc_id = 0
    for h in range(n_hosts):
        host = f"host{h:03d}.example.com"
        header = f"welcome to {host} home news about contact"
        footer = f"copyright {host} all rights reserved"
        nav = f"sitemap {host} categories archive search"
        promo = f"subscribe to the {host} newsletter today"
        for p in range(pages_per_host):
            lines = [header]
            if p % 2 == 0:
                lines.append(nav)
            if 1 <= p <= 2:
                lines.append(promo)
            if not (p == 0 and h % 5 == 0):
                for _ in range(int(rng.randint(3, 8))):
                    lines.append(_gen_text(rng, int(rng.randint(4, 9))))
            lines.append(footer)
            ids.append(doc_id)
            hosts.append(host)
            texts.append("\n".join(lines))
            doc_id += 1
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "host": pa.array(hosts, type=pa.string()),
        "text": pa.array(texts, type=pa.string()),
    })


def ensure_boiler_fixture(tmp_root: str = BOILER_FIXTURE) -> str:
    marker = os.path.join(tmp_root, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(tmp_root, exist_ok=True)
        pq.write_table(gen_boiler_pages(), os.path.join(tmp_root,
                                                        "pages.parquet"))
        with open(marker, "w") as f:
            f.write("ok")
    return tmp_root


REDIRECT_FIXTURE = "/tmp/gush_ray_redirects/v1"


def gen_redirects(n_chains: int = 120, seed: int = 37) -> pa.Table:
    """Redirect-edge fixture (src, dst): HTTP 3xx hops as a functional
    edge list (at most one dst per src). Deterministic mix per 6-chain
    block: linear chains of length 1..6 ending at a terminal url (the
    resolution targets), one 2-cycle, one 3-cycle, and one self-loop
    every 10 chains — the unresolvable rows the resolver must FLAG, not
    loop on. Terminal urls are never sources."""
    rng = np.random.RandomState(seed)
    srcs, dsts = [], []

    def u(tag: str, i: int) -> str:
        return f"https://r{tag}.example.org/{i}"

    for c in range(n_chains):
        kind = c % 10
        if kind < 7:
            # linear chain of length 1..6 → terminal
            length = (c % 6) + 1
            hops = [u(f"c{c}", j) for j in range(length)]
            hops.append(u("terminal", c))
            for a, b in zip(hops, hops[1:]):
                srcs.append(a)
                dsts.append(b)
        elif kind == 7:
            a, b = u(f"cy2a", c), u(f"cy2b", c)
            srcs += [a, b]
            dsts += [b, a]
        elif kind == 8:
            a, b, d = u("cy3a", c), u("cy3b", c), u("cy3c", c)
            srcs += [a, b, d]
            dsts += [b, d, a]
        else:
            a = u("selfloop", c)
            srcs.append(a)
            dsts.append(a)
    # shuffle row order so no algorithm can rely on chain locality
    order = rng.permutation(len(srcs))
    return pa.table({
        "src": pa.array([srcs[i] for i in order], type=pa.string()),
        "dst": pa.array([dsts[i] for i in order], type=pa.string()),
    })


def ensure_redirect_fixture(tmp_root: str = REDIRECT_FIXTURE) -> str:
    marker = os.path.join(tmp_root, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(tmp_root, exist_ok=True)
        pq.write_table(gen_redirects(), os.path.join(tmp_root,
                                                     "redirects.parquet"))
        with open(marker, "w") as f:
            f.write("ok")
    return tmp_root
