"""Pure-Python GIF codec (LZW, no native libraries).

Closes the round-2 "honest boundary" for GIF: frame geometry came from
a header walk while pixel decode raised. This module decodes real
pixels — GIF87a/GIF89a, global/local color tables, interlace, variable
LZW code width, multi-frame files — and encodes single-frame GIF87a
for round-trip tests (palette-exact, so encode→decode is lossless for
images with ≤ 256 distinct colors).

The LZW inner loops are Python dict/list work per code (not per pixel:
each code expands to a whole string of pixels via numpy-free list
concat, then one np.asarray at the end). Fine for the actor-pool decode
stage; a hot multimedia pipeline would swap in a native codec here.

Corrupt data raises ValueError (callers dead-letter it).
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset():
        nonlocal table, code_size, next_code
        table = [[i] for i in range(clear)] + [[], []]
        code_size = min_code_size + 1
        next_code = eoi + 1

    code_size = min_code_size + 1
    next_code = eoi + 1
    reset()
    acc = 0
    nbits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table) or not table[code]:
                    raise ValueError("bad first LZW code")
                entry = table[code]
            elif code < next_code:
                entry = table[code]
                if not entry:
                    raise ValueError("reference to empty LZW entry")
                table.append(prev + entry[:1])
                next_code += 1
            elif code == next_code:
                entry = prev + prev[:1]
                table.append(entry)
                next_code += 1
            else:
                raise ValueError("LZW code out of range")
            out.extend(entry)
            prev = entry
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            if len(out) >= n_pixels:
                return out
    return out


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out_codes: list[tuple[int, int]] = []  # (code, width at emit time)
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    out_codes.append((clear, code_size))
    cur = b""
    for px in indices:
        nxt = cur + bytes([px])
        if nxt in table:
            cur = nxt
            continue
        out_codes.append((table[cur], code_size))
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            out_codes.append((clear, code_size))
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        cur = bytes([px])
    if cur:
        out_codes.append((table[cur], code_size))
    out_codes.append((eoi, code_size))
    acc = 0
    nbits = 0
    buf = bytearray()
    for code, width in out_codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


def decode_gif(data: bytes) -> tuple[np.ndarray, int]:
    """(first frame as (h, w, 3) uint8 RGB over the logical screen,
    n_frames) from GIF87a/89a bytes. Later frames are LZW-decoded too
    (they count and must be valid) but only the first is composited —
    the decode-features stage consumes one representative frame plus
    the frame count."""
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos: pos + 3 * n], dtype=np.uint8)
        if len(gct) < 3 * n:
            raise ValueError("truncated global color table")
        gct = gct.reshape(-1, 3)
        pos += 3 * n
    first: np.ndarray | None = None
    n_frames = 0
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block {b:#x}")
        if pos + 10 > len(data):
            raise ValueError("truncated GIF image descriptor")
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB",
                                               data[pos + 1: pos + 10])
        pos += 10
        lct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            lct = np.frombuffer(data[pos: pos + 3 * n], dtype=np.uint8)
            if len(lct) < 3 * n:
                raise ValueError("truncated local color table")
            lct = lct.reshape(-1, 3)
            pos += 3 * n
        if lct is None:
            raise ValueError("GIF frame with no color table")
        if pos >= len(data):
            raise ValueError("truncated GIF image data")
        min_code = data[pos]
        pos += 1
        chunks = []
        while True:
            if pos >= len(data):
                raise ValueError("truncated GIF sub-blocks")
            ln = data[pos]
            pos += 1
            if ln == 0:
                break
            chunks.append(data[pos: pos + ln])
            if len(chunks[-1]) < ln:
                raise ValueError("truncated GIF sub-block")
            pos += ln
        idx = _lzw_decode(min_code, b"".join(chunks), iw * ih)
        if len(idx) < iw * ih:
            raise ValueError("GIF frame pixel data incomplete")
        arr = np.asarray(idx[: iw * ih], dtype=np.int64)
        if arr.max(initial=0) >= len(lct):
            raise ValueError("GIF pixel index out of palette range")
        frame_rows = arr.reshape(ih, iw)
        if iflags & 0x40:  # interlaced: reorder rows
            ordered = np.empty_like(frame_rows)
            src = 0
            for start, step in _INTERLACE_PASSES:
                for row in range(start, ih, step):
                    ordered[row] = frame_rows[src]
                    src += 1
            frame_rows = ordered
        if first is None:
            canvas = np.zeros((h, w, 3), dtype=np.uint8)
            sub = lct[frame_rows]
            canvas[iy: iy + ih, ix: ix + iw] = sub[: h - iy, : w - ix]
            first = canvas
        n_frames += 1
    if first is None:
        raise ValueError("GIF contains no image frames")
    return first, n_frames


def encode_gif(pixels: np.ndarray) -> bytes:
    """Single-frame GIF87a from (h, w, 3) uint8 RGB with ≤ 256 distinct
    colors (palette-exact: decode_gif(encode_gif(px))[0] == px)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors")
    bits = max(1, int(len(palette) - 1).bit_length())
    n_pal = 1 << bits
    pal_bytes = np.zeros((n_pal, 3), dtype=np.uint8)
    pal_bytes[: len(palette)] = palette
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal_bytes.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    min_code = max(2, bits)
    out.append(min_code)
    lzw = _lzw_encode(min_code, inverse.astype(np.int64).tolist())
    for i in range(0, len(lzw), 255):
        chunk = lzw[i: i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)     # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)
