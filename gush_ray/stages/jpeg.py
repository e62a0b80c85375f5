"""Pure-numpy JPEG codec (no native libraries).

Closes the round-2 "honest boundary": JPEG frame GEOMETRY came from a
header walk while pixel decode raised NotImplementedError. This module
decodes real pixels for baseline (SOF0), extended-sequential (SOF1) AND
progressive (SOF2) Huffman JPEGs — grayscale or YCbCr with any sampling
factors ≤ 4 (4:4:4, 4:2:0, 4:2:2, ...), restart markers, and for
progressive files both techniques: spectral selection and successive
approximation (DC/AC first + refinement passes, EOB runs). Encoders for
both baseline and progressive 4:4:4/grayscale exist for round-trip
tests; the progressive encoder emits the SAME quantized coefficients as
the baseline one, so progressive-decode == baseline-decode is an
independence anchor the tests pin.

Design notes:

* The decoder is entirely TABLE-DRIVEN (DQT/DHT read from the stream),
  so it handles files from any encoder, including the standard Annex-K
  tables — none of which need to be embedded here.
* The encoder builds canonical Huffman tables from the image's own
  symbol frequencies (two-pass, JPEG Annex-K length-limit adjustment,
  all-ones code reserved via the standard dummy symbol), writes them as
  DHT segments, and the decoder reconstructs codes with the identical
  canonical rule — consistency by construction.
* DCT/IDCT are exact matrix forms (T @ B @ T.T with the orthonormal
  DCT-II basis), vectorized over ALL blocks of a component at once via
  einsum — the per-pixel work is numpy; only the entropy coding walks
  bits in Python (unavoidable without native code; the decode stage is
  an actor-pool `map_batches` stage, so throughput scales with the
  pool).
* Arithmetic-coded / lossless / differential JPEGs raise
  ``NotImplementedError`` — callers (stages/multimodal.DecodeFeatures)
  fall back to the header-walk geometry, which remains the honest
  boundary for those variants. Corrupt streams raise ``ValueError``.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- tables


def _zigzag() -> np.ndarray:
    """Zigzag scan order: position k in the scan -> linear index r*8+c."""
    out = []
    for s in range(15):
        rs = range(max(0, s - 7), min(8, s + 1))
        diag = [(r, s - r) for r in rs]
        if s % 2 == 0:
            diag.reverse()
        out.extend(diag)
    return np.array([r * 8 + c for r, c in out], dtype=np.int64)


ZZ = _zigzag()           # scan position -> linear block index
UNZZ = np.argsort(ZZ)    # linear block index -> scan position


def _dct_basis() -> np.ndarray:
    x = np.arange(8)
    u = np.arange(8)[:, None]
    t = np.cos((2 * x[None, :] + 1) * u * np.pi / 16) / 2.0
    t[0, :] *= 1 / np.sqrt(2)
    return t


T = _dct_basis()

# Annex-K example luminance/chrominance quant tables (the public spec
# tables every encoder scales) — used by OUR encoder only; the decoder
# reads whatever tables the file carries.
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)
QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base * scale + 50) / 100)
    return np.clip(q, 1, 255)


# ------------------------------------------------------- canonical codes


def _huffman_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Symbol -> code length via plain Huffman, JPEG-legal: a dummy
    symbol (256) with frequency 1 joins the merge so no real symbol gets
    the all-ones code, and lengths are squeezed to ≤ 16 with the
    standard Annex-K adjustment."""
    import heapq

    items = [(f, [s]) for s, f in freqs.items() if f > 0]
    items.append((1, [256]))  # reserves the all-ones code
    if len(items) == 1:
        return {items[0][1][0]: 1}
    heapq.heapify(items)
    depth: dict[int, int] = {s: 0 for _f, syms in items for s in syms}
    while len(items) > 1:
        fa, sa = heapq.heappop(items)
        fb, sb = heapq.heappop(items)
        for s in sa + sb:
            depth[s] += 1
        heapq.heappush(items, (fa + fb, sa + sb))
    # length-limit to 16 (Annex K.3: move leaves up the tree)
    counts = np.zeros(33, dtype=np.int64)
    for _s, d in depth.items():
        counts[min(d, 32)] += 1
    i = 32
    while i > 16:
        while counts[i] > 0:
            j = i - 2
            while counts[j] == 0:
                j -= 1
            counts[i] -= 2
            counts[i - 1] += 1
            counts[j + 1] += 2
            counts[j] -= 1
        i -= 1
    # reassign lengths canonically: longest-first list of symbols sorted
    # by (original depth, symbol) keeps frequent symbols short
    ordered = sorted(depth.items(), key=lambda kv: (kv[1], kv[0]))
    out: dict[int, int] = {}
    lens_needed = []
    for ln in range(1, 17):
        lens_needed.extend([ln] * int(counts[ln]))
    assert len(lens_needed) == len(ordered)
    for (sym, _d), ln in zip(ordered, lens_needed):
        out[sym] = ln
    out.pop(256, None)  # dummy never emitted
    return out


def _canonical_codes(lengths: dict[int, int]):
    """JPEG canonical assignment: symbols ordered by (length, listing
    order); we list by (length, symbol value), and BOTH the encoder and
    the DHT segment use that order, so decoders agree."""
    bits = [0] * 17
    for ln in lengths.values():
        bits[ln] += 1
    vals = [s for s, _ln in sorted(lengths.items(), key=lambda kv: (kv[1], kv[0]))]
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            codes[vals[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return bits[1:], vals, codes


def _codes_from_dht(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol, from a DHT segment's BITS/HUFFVAL."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for i, n in enumerate(bits):
        ln = i + 1
        for _ in range(n):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


# ------------------------------------------------------------ bit I/O


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, length: int, code: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write(pad, (1 << pad) - 1)  # pad with 1s per spec
        return bytes(self.buf)


class _BitReader:
    """Entropy-segment reader with 0xFF00 unstuffing; stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is None:
                raise ValueError("truncated JPEG entropy data")
            else:  # a real marker: expose it, feed no more bits
                self.marker = nxt
                raise ValueError("hit marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict) -> int:
        ln = 0
        code = 0
        while ln < 16:
            code = (code << 1) | self.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def align_and_expect_rst(self, n: int) -> None:
        """Skip to byte boundary and consume RSTn (n = 0..7)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                m = d[self.pos + 1]
                if 0xD0 <= m <= 0xD7:
                    if (m - 0xD0) != n:
                        raise ValueError("JPEG restart marker out of order")
                    self.pos += 2
                    self.marker = None
                    return
                raise ValueError(f"unexpected marker {m:#x} at restart")
            self.pos += 1
        raise ValueError("missing JPEG restart marker")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --------------------------------------------------------------- encode


def _ycbcr(px: np.ndarray) -> np.ndarray:
    px = px.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return np.stack([y, cb, cr], axis=-1)


def _blocks_of(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad a 2-D plane to 8x8 multiples (edge-replicate) and return
    (n_blocks, 8, 8) in raster MCU order plus blocks-per-row/col."""
    h, w = plane.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.empty((H, W), dtype=np.float64)
    p[:h, :w] = plane
    p[h:, :w] = plane[-1:, :]
    p[:h, w:] = p[:h, w - 1: w]
    p[h:, w:] = p[h - 1, w - 1]
    by, bx = H // 8, W // 8
    blk = p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blk, bx, by


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Baseline JPEG bytes from (h, w) grayscale or (h, w, 3) RGB uint8
    (4:4:4, canonical per-image Huffman tables)."""
    px = np.asarray(pixels)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
        qids = [0]
    else:
        ycc = _ycbcr(px)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qids = [0, 1, 1]
    qtabs = [_scaled_quant(QUANT_LUMA, quality),
             _scaled_quant(QUANT_CHROMA, quality)]

    comp_scan: list[np.ndarray] = []  # per component: (n_blocks, 64) ints
    for plane, qid in zip(planes, qids):
        blk, _bx, _by = _blocks_of(plane - 128.0)
        f = np.einsum("ux,nxy,vy->nuv", T, blk, T)
        q = np.round(f / qtabs[qid][None]).astype(np.int64)
        comp_scan.append(q.reshape(-1, 64)[:, ZZ])

    # pass 1: symbol frequencies (one DC + one AC table for all comps)
    dc_freq: dict[int, int] = {}
    ac_freq: dict[int, int] = {}

    def _symbols(scan: np.ndarray, emit) -> None:
        prev_dc = 0
        for blk_v in scan:
            diff = int(blk_v[0]) - prev_dc
            prev_dc = int(blk_v[0])
            emit("dc", _category(diff), diff)
            pos = 1
            for idx in np.flatnonzero(blk_v[1:]):
                k = int(idx) + 1
                run = k - pos
                while run >= 16:
                    emit("ac", 0xF0, None)
                    run -= 16
                v = int(blk_v[k])
                emit("ac", (run << 4) | _category(v), v)
                pos = k + 1
            if pos <= 63:
                emit("ac", 0x00, None)

    def count(kind, sym, _v):
        d = dc_freq if kind == "dc" else ac_freq
        d[sym] = d.get(sym, 0) + 1

    for scan in comp_scan:
        _symbols(scan, count)

    dc_bits, dc_vals, dc_codes = _canonical_codes(_huffman_lengths(dc_freq))
    ac_bits, ac_vals, ac_codes = _canonical_codes(_huffman_lengths(ac_freq))

    # pass 2: entropy-coded data
    bw = _BitWriter()

    def write_sym(kind, sym, v):
        ln, code = (dc_codes if kind == "dc" else ac_codes)[sym]
        bw.write(ln, code)
        if kind == "dc":
            size = sym
            if size:
                vv = v if v >= 0 else v + (1 << size) - 1
                bw.write(size, vv)
        else:
            size = sym & 0x0F
            if size:
                vv = v if v >= 0 else v + (1 << size) - 1
                bw.write(size, vv)

    # interleave components per MCU (4:4:4: one block each per MCU)
    n_mcu = comp_scan[0].shape[0]
    prev = [0] * len(comp_scan)
    for m in range(n_mcu):
        for ci, scan in enumerate(comp_scan):
            blk_v = scan[m]
            diff = int(blk_v[0]) - prev[ci]
            prev[ci] = int(blk_v[0])
            write_sym("dc", _category(diff), diff)
            pos = 1
            for idx in np.flatnonzero(blk_v[1:]):
                k = int(idx) + 1
                run = k - pos
                while run >= 16:
                    write_sym("ac", 0xF0, None)
                    run -= 16
                v = int(blk_v[k])
                write_sym("ac", (run << 4) | _category(v), v)
                pos = k + 1
            if pos <= 63:
                write_sym("ac", 0x00, None)
    entropy = bw.flush()

    # ---- assemble segments
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    for qid, qt in enumerate(qtabs[: 1 if gray else 2]):
        zz = qt.reshape(64)[ZZ].astype(np.uint8).tobytes()
        seg(0xDB, bytes([qid]) + zz)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, qids[ci]])
    seg(0xC0, sof)
    for tclass, (bits, vals) in ((0, (dc_bits, dc_vals)),
                                 (1, (ac_bits, ac_vals))):
        seg(0xC4, bytes([tclass << 4]) + bytes(bits)
            + bytes(v & 0xFF for v in vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)
    out.extend(entropy)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


def _ll_predict(plane: np.ndarray, y: int, x: int, default: int,
                predictor: int) -> int:
    """T.81 H.1 lossless prediction. The first sample predicts the
    midpoint default; the rest of the first line uses predictor 1
    (left); the first column uses predictor 2 (above); elsewhere the
    scan-selected predictor over Ra=left, Rb=above, Rc=above-left.
    Shared by encoder and decoder — one definition, exact round trip."""
    if y == 0:
        return default if x == 0 else int(plane[0, x - 1])
    if x == 0:
        return int(plane[y - 1, 0])
    a = int(plane[y, x - 1])
    b = int(plane[y - 1, x])
    c = int(plane[y - 1, x - 1])
    if predictor == 1:
        return a
    if predictor == 2:
        return b
    if predictor == 3:
        return c
    if predictor == 4:
        return a + b - c
    if predictor == 5:
        return a + ((b - c) >> 1)
    if predictor == 6:
        return b + ((a - c) >> 1)
    if predictor == 7:
        return (a + b) >> 1
    raise ValueError(f"invalid lossless predictor {predictor}")


def encode_jpeg_lossless(pixels: np.ndarray, predictor: int = 4,
                         point_transform: int = 0) -> bytes:
    """Lossless JPEG (T.81 process 14, SOF3): Huffman-coded prediction
    differences, NO DCT/quantization — ``decode_jpeg(encode_jpeg_lossless
    (px)) == px >> point_transform << point_transform`` exactly.
    Components are stored as-is (no color transform: lossless means
    lossless), precision 8 (uint8 input) or up to 16 (uint16 input).
    Canonical per-image Huffman table, same machinery as baseline."""
    px = np.asarray(pixels)
    if px.dtype == np.uint8:
        prec = 8
    elif px.dtype == np.uint16:
        prec = max(2, int(px.max()).bit_length()) if px.size else 16
    else:
        raise ValueError("lossless JPEG input must be uint8 or uint16")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    pt = point_transform
    if not 0 <= pt < prec:
        raise ValueError("point_transform must be in [0, precision)")
    gray = px.ndim == 2
    h, w = px.shape[:2]
    ncomp = 1 if gray else px.shape[2]
    planes = [
        (px if gray else px[:, :, ci]).astype(np.int64) >> pt
        for ci in range(ncomp)
    ]
    default = 1 << (prec - pt - 1)

    # pass 1: diffs (mod 2^16, T.81 H.1.2.1) + symbol frequencies
    diffs = np.empty((h, w, ncomp), dtype=np.int64)
    freq: dict[int, int] = {}
    for ci, plane in enumerate(planes):
        for y in range(h):
            for x in range(w):
                d = (int(plane[y, x])
                     - _ll_predict(plane, y, x, default, predictor))
                d &= 0xFFFF
                if d > 32768:
                    d -= 65536
                diffs[y, x, ci] = d
                s = 16 if d == 32768 else _category(d)
                freq[s] = freq.get(s, 0) + 1
    bits, vals, codes = _canonical_codes(_huffman_lengths(freq))

    bw = _BitWriter()
    for y in range(h):
        for x in range(w):
            for ci in range(ncomp):  # MCU order: one sample per comp
                d = int(diffs[y, x, ci])
                s = 16 if d == 32768 else _category(d)
                ln, code = codes[s]
                bw.write(ln, code)
                if s and s != 16:  # SSSS=16 carries no extra bits
                    vv = d if d >= 0 else d + (1 << s) - 1
                    bw.write(s, vv)
    entropy = bw.flush()

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    sof = struct.pack(">BHHB", prec, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])  # 1x1 sampling, no quant table
    seg(0xC3, sof)
    seg(0xC4, bytes([0x00]) + bytes(bits) + bytes(v & 0xFF for v in vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, pt])  # Ss=predictor, Se=0, Ah=0/Al=Pt
    seg(0xDA, sos)
    out.extend(entropy)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _decode_lossless_scan(data: bytes, pos: int, frame: dict, htabs: dict,
                          scan_tabs: dict, predictor: int,
                          pt: int) -> np.ndarray:
    """SOF3 scan: per-sample Huffman diff decode + prediction. Per-blob
    Python loop by nature (each sample's prediction depends on the
    previous decode) — fine for the actor-pool decode stage's small
    media blobs; this is a correctness codec, not a throughput kernel."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    prec = frame["prec"]
    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
        raise NotImplementedError(
            "lossless JPEG with subsampled components")
    ncomp = len(comps)
    if any(c["id"] not in scan_tabs for c in comps):
        raise NotImplementedError(
            "non-interleaved (multi-scan) lossless JPEG not supported")
    tabs = []
    for c in comps:
        dc_id, _ = scan_tabs[c["id"]]
        tab = htabs.get((0, dc_id))
        if tab is None:
            # mirror the baseline path's guard: a KeyError would escape
            # the decode stage's (ValueError, NotImplementedError) net
            raise ValueError("missing JPEG Huffman table")
        tabs.append(tab)
    default = 1 << (prec - pt - 1)
    planes = [np.zeros((h, w), dtype=np.int64) for _ in range(ncomp)]
    br = _BitReader(data, pos)
    for y in range(h):
        for x in range(w):
            for ci in range(ncomp):
                s = br.decode_symbol(tabs[ci])
                if s == 16:
                    d = 32768
                else:
                    d = _extend(br.receive(s), s) if s else 0
                pred = _ll_predict(planes[ci], y, x, default, predictor)
                planes[ci][y, x] = (pred + d) & 0xFFFF
    dtype = np.uint8 if prec <= 8 else np.uint16
    stack = (planes[0] if ncomp == 1
             else np.stack(planes, axis=-1)) << pt
    return stack.astype(dtype)


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 90,
                            dc_al: int = 1, ac_al: int = 1) -> bytes:
    """Progressive (SOF2) JPEG with BOTH progressive techniques —
    spectral selection and successive approximation — from (h, w)
    grayscale or (h, w, 3) RGB uint8.

    Scan script (the common coarse→fine shape):
      1. DC first, all components interleaved, Al=dc_al
      2. per component: AC 1..5 first, Al=ac_al   (coarse preview)
      3. per component: AC 6..63 first, Al=ac_al
      4. DC refinement (raw bits), Al=dc_al-1 .. 0
      5. per component: AC 1..63 refinement, Al=ac_al-1 .. 0

    Encodes the SAME quantized coefficients as :func:`encode_jpeg`, so
    ``decode_jpeg(encode_jpeg_progressive(px, q)) ==
    decode_jpeg(encode_jpeg(px, q))`` exactly — the independence anchor
    the tests pin (the baseline path is validated by pixel round-trips,
    so a symmetric encode/decode bug here cannot hide)."""
    px = np.asarray(pixels)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
        qids = [0]
    else:
        ycc = _ycbcr(px)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qids = [0, 1, 1]
    qtabs = [_scaled_quant(QUANT_LUMA, quality),
             _scaled_quant(QUANT_CHROMA, quality)]
    comp_scan: list[np.ndarray] = []
    for plane, qid in zip(planes, qids):
        blk, _bx, _by = _blocks_of(plane - 128.0)
        f = np.einsum("ux,nxy,vy->nuv", T, blk, T)
        q = np.round(f / qtabs[qid][None]).astype(np.int64)
        comp_scan.append(q.reshape(-1, 64)[:, ZZ])
    ncomp = len(comp_scan)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    for qid, qt in enumerate(qtabs[: 1 if gray else 2]):
        seg(0xDB, bytes([qid])
            + qt.reshape(64)[ZZ].astype(np.uint8).tobytes())
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, qids[ci]])
    seg(0xC2, sof)  # SOF2: progressive

    def emit_scan(scan_comps, ss, se, ah, al, encode_fn):
        """Two passes: count symbol freqs → build+emit DHT → emit data."""
        freqs: dict[int, int] = {}

        class Count:
            def sym(self, s):
                freqs[s] = freqs.get(s, 0) + 1

            def bits(self, n, v):
                pass

        encode_fn(Count())
        codes = None
        if freqs:
            bits16, vals, codes = _canonical_codes(_huffman_lengths(freqs))
            tclass = 0 if ss == 0 else 1
            seg(0xC4, bytes([(tclass << 4) | 0]) + bytes(bits16)
                + bytes(v & 0xFF for v in vals))

        bw = _BitWriter()

        class Emit:
            def sym(self, s):
                ln, code = codes[s]
                bw.write(ln, code)

            def bits(self, n, v):
                if n:
                    bw.write(n, v & ((1 << n) - 1))

        encode_fn(Emit())
        sos = bytes([len(scan_comps)])
        for ci in scan_comps:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, sos)
        out.extend(bw.flush())

    # ---- scan 1: DC first, interleaved (4:4:4 → one block/comp/MCU)
    def dc_first(sink, al=dc_al):
        pred = [0] * ncomp
        for m in range(comp_scan[0].shape[0]):
            for ci in range(ncomp):
                v = int(comp_scan[ci][m, 0]) >> al  # arithmetic shift (DC)
                diff = v - pred[ci]
                pred[ci] = v
                s = _category(diff)
                sink.sym(s)
                sink.bits(s, diff if diff >= 0 else diff + (1 << s) - 1)

    emit_scan(list(range(ncomp)), 0, 0, 0, dc_al, dc_first)

    # ---- AC first scans per component, two spectral bands
    def ac_first(ci, ss, se, al):
        def fn(sink):
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun:
                    nb = eobrun.bit_length() - 1
                    sink.sym(nb << 4)
                    sink.bits(nb, eobrun - (1 << nb))
                    eobrun = 0

            for blk_v in comp_scan[ci]:
                r = 0
                for k in range(ss, se + 1):
                    cv = int(blk_v[k])
                    t = (abs(cv) >> al)
                    if t == 0:
                        r += 1
                        continue
                    flush_eob()
                    while r >= 16:
                        sink.sym(0xF0)
                        r -= 16
                    tv = t if cv >= 0 else -t
                    s = _category(tv)
                    sink.sym((r << 4) | s)
                    sink.bits(s, tv if tv >= 0 else tv + (1 << s) - 1)
                    r = 0
                if r > 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
            flush_eob()
        return fn

    for ci in range(ncomp):
        emit_scan([ci], 1, 5, 0, ac_al, ac_first(ci, 1, 5, ac_al))
    for ci in range(ncomp):
        emit_scan([ci], 6, 63, 0, ac_al, ac_first(ci, 6, 63, ac_al))

    # ---- DC refinement scans (raw bits, no Huffman table)
    for al in range(dc_al - 1, -1, -1):
        def dc_refine(sink, al=al):
            for m in range(comp_scan[0].shape[0]):
                for ci in range(ncomp):
                    sink.bits(1, (int(comp_scan[ci][m, 0]) >> al) & 1)

        emit_scan(list(range(ncomp)), 0, 0, al + 1, al, dc_refine)

    # ---- AC refinement scans per component (T.81 G.1.2.3 shape)
    def ac_refine(ci, ss, se, al):
        def fn(sink):
            eobrun = 0
            pend: list[int] = []  # correction bits awaiting a symbol

            def flush_eob():
                nonlocal eobrun, pend
                if eobrun:
                    nb = eobrun.bit_length() - 1
                    sink.sym(nb << 4)
                    sink.bits(nb, eobrun - (1 << nb))
                    eobrun = 0
                for b in pend:
                    sink.bits(1, b)
                pend = []

            for blk_v in comp_scan[ci]:
                absv = np.abs(blk_v[ss: se + 1]) >> al
                eob = 0  # band-relative index past the last new nonzero
                nz = np.flatnonzero(absv == 1)
                if len(nz):
                    eob = int(nz[-1]) + 1
                r = 0
                br_bits: list[int] = []
                for j in range(se - ss + 1):
                    t = int(absv[j])
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and j < eob:
                        flush_eob()
                        sink.sym(0xF0)
                        r -= 16
                        for b in br_bits:
                            sink.bits(1, b)
                        br_bits = []
                    if t > 1:  # already significant: correction bit
                        br_bits.append(t & 1)
                        continue
                    flush_eob()
                    sink.sym((r << 4) | 1)
                    sink.bits(1, 0 if int(blk_v[ss + j]) < 0 else 1)
                    for b in br_bits:
                        sink.bits(1, b)
                    br_bits = []
                    r = 0
                if r > 0 or br_bits:
                    eobrun += 1
                    pend.extend(br_bits)
                    if eobrun == 0x7FFF or len(pend) > 900:
                        flush_eob()
            flush_eob()
        return fn

    for al in range(ac_al - 1, -1, -1):
        for ci in range(ncomp):
            emit_scan([ci], 1, 63, al + 1, al, ac_refine(ci, 1, 63, al))

    out.extend(b"\xff\xd9")
    return bytes(out)


# --------------------------------------------------------------- decode


def decode_jpeg(data: bytes) -> np.ndarray:
    """(h, w, 3) RGB uint8 (or (h, w) for grayscale files) from baseline
    / extended-sequential / progressive Huffman JPEG bytes; SOF3
    lossless decodes to the stored components exactly (uint16 for
    precision > 8). Arithmetic coding raises NotImplementedError
    (header-walk geometry remains the caller's fallback); corrupt data
    raises ValueError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", data[pos + 2: pos + 4])[0]
        body = data[pos + 4: pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 0x0F
                m = 128 if pq else 64
                raw = b[1: 1 + m]
                vals = (np.frombuffer(raw, dtype=">u2") if pq
                        else np.frombuffer(raw, dtype=np.uint8))
                t = np.zeros(64, dtype=np.float64)
                t[ZZ] = vals.astype(np.float64)
                qtabs[tq] = t.reshape(8, 8)
                b = b[1 + m:]
        elif marker == 0xC4:  # DHT
            b = body
            while b:
                tclass, tid = b[0] >> 4, b[0] & 0x0F
                bits = list(b[1:17])
                cnt = sum(bits)
                vals = list(b[17: 17 + cnt])
                htabs[(tclass, tid)] = _codes_from_dht(bits, vals)
                b = b[17 + cnt:]
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 seq, SOF2 progressive
            prec, fh, fw, ncomp = struct.unpack(">BHHB", body[:6])
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci: 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps, "prec": prec,
                     "progressive": marker == 0xC2}
        elif marker == 0xC3:  # SOF3 lossless (Huffman)
            prec, fh, fw, ncomp = struct.unpack(">BHHB", body[:6])
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci: 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps, "prec": prec,
                     "progressive": False, "lossless": True}
        elif marker in (0xC6, 0xCA, 0xCE):
            raise NotImplementedError(
                "differential JPEG not supported")
        elif marker in (0xC5, 0xC7, 0xC9, 0xCB, 0xCD, 0xCF):
            raise NotImplementedError("non-baseline JPEG coding")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan_comps = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si: 3 + 2 * si]
                scan_comps.append((cs, tt >> 4, tt & 0x0F))
            ss, se, ahal = body[1 + 2 * ns: 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if frame.get("lossless"):
                if restart_interval:
                    raise NotImplementedError(
                        "lossless JPEG with restart intervals")
                scan_tabs = {cs: (d, a) for cs, d, a in scan_comps}
                return _decode_lossless_scan(
                    data, pos + 2 + seg_len, frame, htabs, scan_tabs,
                    predictor=ss, pt=al)
            if not frame["progressive"]:
                # sequential: one full-band scan reconstructs directly
                scan_tabs = {cs: (d, a) for cs, d, a in scan_comps}
                return _decode_scan(data, pos + 2 + seg_len, frame, qtabs,
                                    htabs, scan_tabs, restart_interval)
            _ensure_coef_state(frame)
            pos = _progressive_scan(
                data, pos + 2 + seg_len, frame, htabs, scan_comps,
                ss, se, ah, al, restart_interval,
            )
            continue
        pos += 2 + seg_len
    if frame is not None and frame.get("progressive") and "coef_ready" in frame:
        return _reconstruct(frame, qtabs)
    raise ValueError("no JPEG scan data found")


def _ensure_coef_state(frame) -> None:
    """Allocate per-component coefficient planes (scan order) once."""
    if "coef_ready" in frame:
        return
    comps = frame["comps"]
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcux"] = -(-fw // (8 * hmax))
    frame["mcuy"] = -(-fh // (8 * vmax))
    for c in comps:
        c["bx"] = frame["mcux"] * c["h"]
        c["by"] = frame["mcuy"] * c["v"]
        # REDUCED grid for non-interleaved scans: the component's own
        # sample dims rounded to blocks (T.81 A.2.2), NOT the padded
        # interleaved MCU grid
        comp_w = -(-fw * c["h"] // hmax)   # ceil(fw * h / hmax)
        comp_h = -(-fh * c["v"] // vmax)
        c["cw"] = -(-comp_w // 8)
        c["ch"] = -(-comp_h // 8)
        # integer coefficients: progressive refinement is bit surgery
        c["coef"] = np.zeros((c["by"] * c["bx"], 64), dtype=np.int32)
    frame["coef_ready"] = True


def _progressive_scan(data, pos, frame, htabs, scan_comps, ss, se, ah, al,
                      restart_interval) -> int:
    """Apply one progressive scan to the coefficient state; returns the
    stream position after the scan's entropy data."""
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    scomps = []
    for cs, dc_id, ac_id in scan_comps:
        c = by_id.get(cs)
        if c is None:
            raise ValueError(f"scan references unknown component {cs}")
        c["dc_t"] = htabs.get((0, dc_id))
        c["ac_t"] = htabs.get((1, ac_id))
        scomps.append(c)
    interleaved = len(scomps) > 1
    if interleaved and ss != 0:
        raise ValueError("interleaved AC scan is illegal in progressive")
    br = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in scomps}
    eobrun = 0
    mcu_count = 0

    def maybe_restart():
        nonlocal pred, eobrun
        if restart_interval and mcu_count and \
                mcu_count % restart_interval == 0:
            br.align_and_expect_rst(
                (mcu_count // restart_interval - 1) % 8)
            pred = {c["id"]: 0 for c in scomps}
            eobrun = 0

    if ss == 0:  # DC scan (se must be 0)
        if se != 0:
            raise ValueError("DC progressive scan must have Se=0")
        if interleaved:
            units = []
            for my in range(frame["mcuy"]):
                for mx in range(frame["mcux"]):
                    mcu = []
                    for c in scomps:
                        for byy in range(c["v"]):
                            for bxx in range(c["h"]):
                                mcu.append(
                                    (c, (my * c["v"] + byy) * c["bx"]
                                     + mx * c["h"] + bxx))
                    units.append(mcu)
        else:
            c = scomps[0]
            units = [[(c, row * c["bx"] + col)]
                     for row in range(c["ch"]) for col in range(c["cw"])]
        for mcu in units:
            maybe_restart()
            for c, idx in mcu:
                coef = c["coef"]
                if ah == 0:  # first DC pass: diff-coded, point-transformed
                    if c["dc_t"] is None:
                        raise ValueError("missing DC Huffman table")
                    s = br.decode_symbol(c["dc_t"])
                    pred[c["id"]] += _extend(br.receive(s), s)
                    coef[idx, 0] = pred[c["id"]] << al
                else:        # refinement: one raw bit per block
                    if br.read_bit():
                        coef[idx, 0] |= 1 << al
            mcu_count += 1
        return br.pos

    # AC scan: always one component, reduced grid
    c = scomps[0]
    if c["ac_t"] is None:
        raise ValueError("missing AC Huffman table")
    coef = c["coef"]
    ac_t = c["ac_t"]
    p1, m1 = 1 << al, -1 << al
    for row in range(c["ch"]):
        for col in range(c["cw"]):
            maybe_restart()
            idx = row * c["bx"] + col
            if ah == 0:  # first AC pass for this band
                if eobrun > 0:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = br.decode_symbol(ac_t)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.receive(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("AC run overflow")
                        v = _extend(br.receive(s), s)
                        coef[idx, k] = v << al if v >= 0 else -((-v) << al)
                        k += 1
            else:        # AC refinement (T.81 G.2 / libjpeg shape)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = br.decode_symbol(ac_t)
                        r, s = rs >> 4, rs & 0x0F
                        newval = 0
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.receive(r)
                                break
                            # r == 15: skip 16 zero-history positions
                        else:
                            if s != 1:
                                raise ValueError(
                                    "bad size in AC refinement")
                            newval = p1 if br.read_bit() else m1
                        while k <= se:
                            cv = int(coef[idx, k])
                            if cv != 0:
                                if br.read_bit() and (cv & p1) == 0:
                                    coef[idx, k] = cv + (p1 if cv >= 0
                                                         else m1)
                            else:
                                if r == 0:
                                    if newval:
                                        coef[idx, k] = newval
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                if eobrun > 0:
                    while k <= se:
                        cv = int(coef[idx, k])
                        if cv != 0:
                            if br.read_bit() and (cv & p1) == 0:
                                coef[idx, k] = cv + (p1 if cv >= 0 else m1)
                        k += 1
                    eobrun -= 1
            mcu_count += 1
    return br.pos


def _reconstruct(frame, qtabs) -> np.ndarray:
    """Dequantize + IDCT + upsample + color-convert the accumulated
    coefficient state (progressive path; mirrors the sequential tail)."""
    comps = frame["comps"]
    fh, fw = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for c in comps:
        qt = qtabs.get(c["tq"])
        if qt is None:
            raise ValueError("missing JPEG quant table")
        coefs = np.zeros((c["by"] * c["bx"], 64), dtype=np.float64)
        coefs[:, ZZ] = c["coef"].astype(np.float64)  # dezigzag
        f = coefs.reshape(-1, 8, 8) * qt[None]
        blk = np.einsum("ux,nuv,vy->nxy", T, f, T)
        plane = (blk.reshape(c["by"], c["bx"], 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(c["by"] * 8, c["bx"] * 8)) + 128.0
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:fh, :fw])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_scan(data, pos, frame, qtabs, htabs, scan_tabs,
                 restart_interval) -> np.ndarray:
    comps = frame["comps"]
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    for c in comps:
        c["bx"] = mcux * c["h"]
        c["by"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["by"] * c["bx"], 64), dtype=np.float64)
        dc_id, ac_id = scan_tabs[c["id"]]
        dc_t = htabs.get((0, dc_id))
        ac_t = htabs.get((1, ac_id))
        if dc_t is None or ac_t is None:
            raise ValueError("missing JPEG Huffman table")
        c["dc_t"], c["ac_t"] = dc_t, ac_t

    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align_and_expect_rst(
                    (mcu_count // restart_interval - 1) % 8)
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.float64)
                        s = br.decode_symbol(c["dc_t"])
                        diff = _extend(br.receive(s), s)
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        k = 1
                        while k <= 63:
                            rs = br.decode_symbol(c["ac_t"])
                            r, ssize = rs >> 4, rs & 0x0F
                            if ssize == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            blk[k] = _extend(br.receive(ssize), ssize)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bx"] + col] = blk
            mcu_count += 1

    planes = []
    for c in comps:
        qt = qtabs.get(c["tq"])
        if qt is None:
            raise ValueError("missing JPEG quant table")
        coefs = np.zeros_like(c["coef"])
        coefs[:, ZZ] = c["coef"]          # dezigzag
        f = coefs.reshape(-1, 8, 8) * qt[None]
        # IDCT: B = T^T F T  (orthonormal basis)
        blk = np.einsum("ux,nuv,vy->nxy", T, f, T)
        # reassemble raster plane from MCU-ordered blocks
        plane = (blk.reshape(c["by"], c["bx"], 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(c["by"] * 8, c["bx"] * 8)) + 128.0
        # upsample to full MCU grid resolution
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
