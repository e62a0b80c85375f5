"""Pure-stdlib media codecs for the multimodal decode stage.

No image/audio libraries exist in this environment, but three formats
are decodable with stdlib alone and cover the plumbing end-to-end with
REAL pixel/sample data (driver brief: make the decode real where the
sandbox allows, stub only what genuinely needs native codecs):

* PNG  — 8-bit gray/RGB/RGBA, non-interlaced: zlib (stdlib) inflate +
  scanline unfilter (all five filter types), per the PNG spec.
* BMP  — BITMAPINFOHEADER, 24-bit uncompressed.
* WAV  — RIFF/fmt/data, 16-bit PCM.

Encoders exist so tests/fixtures can round-trip without external files.
All functions are deterministic; decoders validate magics/headers and
raise ``ValueError`` on malformed input (the caller routes those to the
dead-letter path, mirroring the parse-error side output).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def _valueerror_on_truncation(fn):
    """Truncated/garbled input surfaces as struct.error / zlib.error deep
    in the parse — normalize to the decoders' documented ValueError so
    callers have ONE malformed-input contract (dead-letter routing)."""
    import functools

    @functools.wraps(fn)
    def wrapped(data, *a, **kw):
        try:
            return fn(data, *a, **kw)
        except (struct.error, zlib.error, IndexError) as exc:
            name = fn.__name__.removeprefix("decode_")
            raise ValueError(f"malformed {name}: {exc}") from exc

    return wrapped


# ------------------------------------------------------------------- PNG

def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w) gray or (h, w, 3|4) uint8 → PNG bytes (filter 0 rows)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, channels = 0, 1
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        color_type = 2 if arr.shape[2] == 3 else 6
        h, w, channels = arr.shape
    else:
        raise ValueError(f"unsupported pixel shape {arr.shape}")
    raw = b"".join(
        b"\x00" + arr[y].tobytes() for y in range(h)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def _unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Reverse PNG scanline filtering (spec §9): types 0-4."""
    stride = w * ch
    out = np.empty((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=pos).copy()
        pos += stride
        if ftype == 0:          # None
            cur = line
        elif ftype == 1:        # Sub: sequential in x → per-pixel loop,
            cur = line          # but vectorized over channels
            for x in range(ch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - ch])) & 0xFF
        elif ftype == 2:        # Up (vectorized)
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:        # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:        # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa_ <= pb and pa_ <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur
        prev = out[y]
    return out


@_valueerror_on_truncation
def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w[, ch]) uint8. 8-bit, non-interlaced only."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = len(PNG_MAGIC)
    w = h = None
    ch = 0
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            ch = _PNG_CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(idat)
    if len(raw) != h * (w * ch + 1):
        raise ValueError("PNG pixel data size mismatch")
    out = _unfilter(raw, w, h, ch)
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


# ------------------------------------------------------------------- BMP

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BMP (bottom-up, BGR, row-padded)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("BMP encoder expects (h, w, 3)")
    h, w, _ = arr.shape
    row = w * 3
    pad = (-row) % 4
    body = b"".join(
        arr[y, :, ::-1].tobytes() + b"\x00" * pad
        for y in range(h - 1, -1, -1)
    )
    pix_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", pix_off + len(body), 0, 0, pix_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return header + info + body


@_valueerror_on_truncation
def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flip = h > 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        off = pix_off + i * stride
        line = np.frombuffer(data, dtype=np.uint8, count=row, offset=off)
        y = h - 1 - i if flip else i
        out[y] = line.reshape(w, 3)[:, ::-1]  # BGR → RGB
    return out


# ------------------------------------------------------------------- WAV

def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """(n,) or (n, ch) int16 → RIFF/WAVE PCM bytes."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    body = arr.tobytes()  # interleaved
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)


@_valueerror_on_truncation
def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n, ch) int16 samples, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    rate = ch = None
    samples = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body_off = pos + 8
        if tag == b"fmt ":
            fmt_code, ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", data, body_off
            )
            if fmt_code != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={fmt_code}, bits={bits})"
                )
        elif tag == b"data":
            samples = np.frombuffer(
                data, dtype=np.int16, count=length // 2, offset=body_off
            )
        pos = body_off + length + (length & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("truncated WAV")
    return samples.reshape(-1, ch), rate


# ------------------------------------------------------------------- Y4M

Y4M_MAGIC = b"YUV4MPEG2 "


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(n, h, w) uint8 grayscale frames → YUV4MPEG2 bytes (Cmono).

    Y4M is the one real VIDEO container parseable with stdlib alone
    (plain-text header + uncompressed planes), so frame-sampling can be
    exercised on actual frames instead of a stub."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 3:
        raise ValueError("encode_y4m expects (n_frames, h, w) grayscale")
    n, h, w = arr.shape
    header = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n"
    return header.encode("ascii") + b"".join(
        b"FRAME\n" + arr[i].tobytes() for i in range(n)
    )


@_valueerror_on_truncation
def decode_y4m(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """YUV4MPEG2 bytes → ((n, h, w) uint8 luma frames, (fps_num, fps_den)).

    Cmono returns the frames as-is; C420* variants return the luma plane
    (chroma skipped) — enough for frame features/sampling."""
    if not data.startswith(Y4M_MAGIC):
        raise ValueError("not a Y4M stream")
    nl = data.index(b"\n")
    w = h = None
    fps = (25, 1)
    colorspace = "C420"
    for tok in data[len(Y4M_MAGIC): nl].split(b" "):
        tok = tok.decode("ascii", "replace")
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("F"):
            num, den = tok[1:].split(":")
            fps = (int(num), int(den))
        elif tok.startswith("C"):
            colorspace = tok
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if colorspace.startswith("Cmono"):
        frame_bytes = w * h
    elif colorspace.startswith("C420"):
        frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    elif colorspace.startswith("C444"):
        frame_bytes = 3 * w * h
    else:
        raise ValueError(f"unsupported Y4M colorspace {colorspace}")
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError("bad Y4M frame marker")
        pos = fnl + 1
        if pos + frame_bytes > len(data):
            raise ValueError("truncated Y4M frame")
        luma = np.frombuffer(data, dtype=np.uint8, count=w * h, offset=pos)
        frames.append(luma.reshape(h, w))
        pos += frame_bytes
    if not frames:
        raise ValueError("Y4M stream with no frames")
    return np.stack(frames), fps


# ----------------------------------------------------------- transforms

def resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, (h, w[, ch]) uint8 → (out_h, out_w[, ch]).
    Pure-numpy index mapping — the real kernel behind the resize stage."""
    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return px[ys][:, xs]


# ------------------------------------------------- JPEG / GIF headers

# SOF markers that carry frame dimensions (every SOFn except the
# DHT/JPG/DAC markers C4/C8/CC), per ITU T.81 table B.1
_JPEG_SOF = frozenset(
    range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


@_valueerror_on_truncation
def jpeg_header(data: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) from a JPEG stream's SOF marker.

    Full JPEG decode needs a native codec; the frame geometry does not —
    it is a plain marker walk (ITU T.81 §B.2.2), which is what a
    filter-by-resolution data pipeline actually consumes. Raises
    ValueError on non-JPEG or truncated input.
    """
    if data[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            raise ValueError("marker desync in JPEG stream")
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers have no length field
            continue
        seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
        if marker in _JPEG_SOF:
            h, w = struct.unpack(">HH", data[i + 5:i + 9])
            ncomp = data[i + 9]
            if w == 0 or h == 0:
                raise ValueError("JPEG SOF with zero dimension")
            return w, h, ncomp
        if marker == 0xDA:  # SOS: entropy-coded data follows, no SOF seen
            break
        i += 2 + seg_len
    raise ValueError("no SOF marker before scan data")


@_valueerror_on_truncation
def gif_header(data: bytes) -> tuple[int, int, int]:
    """(width, height, global_palette_size) from a GIF logical screen
    descriptor (GIF87a/89a §18) — pure header math, no LZW decode."""
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", data[6:10])
    flags = data[10]
    palette = (2 << (flags & 0x07)) if (flags & 0x80) else 0
    if w == 0 or h == 0:
        raise ValueError("GIF with zero dimension")
    return w, h, palette


def encode_jpeg_header(w: int, h: int, ncomp: int = 3) -> bytes:
    """Minimal well-formed JPEG prefix (SOI + APP0 + SOF0 + EOI) — test
    fixture only; carries real geometry but no entropy-coded image."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00\x01\x00\x01\x00\x00"
    comp = b"".join(bytes([c + 1, 0x11, 0]) for c in range(ncomp))
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp) + comp
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def encode_gif_header(w: int, h: int, palette_bits: int = 2) -> bytes:
    """Minimal GIF87a logical screen descriptor + trailer — test fixture."""
    flags = 0x80 | ((palette_bits - 1) & 0x07)
    pal = bytes(3 * (2 << ((palette_bits - 1) & 0x07)))
    return (b"GIF87a" + struct.pack("<HH", w, h) + bytes([flags, 0, 0])
            + pal + b"\x3b")


# ------------------------------------------------------------- PPM / PGM
# Netpbm binary formats: pure-ASCII header + raw samples, the simplest
# REAL image codecs that exist (P5 = grayscale, P6 = RGB; maxval <= 255).

def _pnm_header(data: bytes, magic: bytes) -> tuple[int, int, int, int]:
    """Parse 'P5/P6 <w> <h> <maxval>' with '#' comments; returns
    (w, h, maxval, data_offset). The header ends after EXACTLY one
    whitespace byte following maxval (per spec)."""
    if not data.startswith(magic):
        raise ValueError(f"not a {magic.decode()} stream")
    pos = len(magic)
    vals = []
    while len(vals) < 3:
        if pos >= len(data):
            raise ValueError("malformed pnm: truncated header")
        c = data[pos:pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            nl = data.find(b"\n", pos)
            if nl < 0:
                raise ValueError("malformed pnm: unterminated comment")
            pos = nl + 1
        elif c.isdigit():
            end = pos
            while end < len(data) and data[end:end + 1].isdigit():
                end += 1
            vals.append(int(data[pos:end]))
            pos = end
        else:
            raise ValueError(f"malformed pnm: unexpected byte {c!r}")
    if pos >= len(data) or not data[pos:pos + 1].isspace():
        raise ValueError("malformed pnm: missing header terminator")
    w, h, maxval = vals
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported pnm maxval {maxval}")
    return w, h, maxval, pos + 1


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM (P6)."""
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        pixels, dtype=np.uint8).tobytes()


@_valueerror_on_truncation
def decode_ppm(data: bytes) -> np.ndarray:
    w, h, _maxval, off = _pnm_header(data, b"P6")
    need = w * h * 3
    body = data[off:off + need]
    if len(body) < need:
        raise ValueError("malformed ppm: truncated pixel data")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


def encode_pgm(pixels: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale → binary PGM (P5)."""
    h, w = pixels.shape[:2]
    return b"P5\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        pixels, dtype=np.uint8).tobytes()


@_valueerror_on_truncation
def decode_pgm(data: bytes) -> np.ndarray:
    w, h, _maxval, off = _pnm_header(data, b"P5")
    need = w * h
    body = data[off:off + need]
    if len(body) < need:
        raise ValueError("malformed pgm: truncated pixel data")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w)
