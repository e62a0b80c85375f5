"""Motion-JPEG AVI container codec (pure stdlib + the repo's numpy JPEG).

Closes part of the multimodal "compressed video" honest boundary
(NOTES.md): MJPEG-in-AVI is the one widely-used compressed video format
whose frames are plain baseline JPEGs, so the repo's own JPEG codec
(stages/jpeg.py — full baseline + progressive, table-driven Huffman)
decodes it without native libraries. The container itself is a RIFF
walk, same family as the WAV codec (stages/codecs.py).

Format (public Microsoft RIFF/AVI spec, OpenDML backward-compatible
subset):

    RIFF <size> 'AVI '
      LIST 'hdrl'
        'avih' (56-byte MainAVIHeader)
        LIST 'strl'
          'strh' (56-byte AVIStreamHeader, fccType 'vids', handler 'MJPG')
          'strf' (40-byte BITMAPINFOHEADER, biCompression 'MJPG')
      LIST 'movi'
        '00dc' <jpeg bytes> ...       (frame chunks, even-padded)
      'idx1' (16 bytes per frame)

The decoder is tolerant: it requires only the RIFF/'AVI ' signature, a
LIST 'movi' with '..dc'/'..db' chunks whose payloads are JPEGs, and (if
present) reads fps from the first 'vids' 'strh'. Truncated or
non-JPEG-framed files raise ValueError — decode is atomic per clip, the
dead-letter contract every codec here follows.

Remaining honest video boundary: inter-frame-compressed codecs
(H.26x/VP9/AV1 in MP4/MKV/WebM) — those genuinely need native decoders.
"""

from __future__ import annotations

import struct

import numpy as np

from gush_ray.stages.jpeg import decode_jpeg, encode_jpeg


def encode_avi_mjpeg(frames: np.ndarray, fps: tuple[int, int] = (25, 1),
                     quality: int = 90) -> bytes:
    """(n, h, w) grayscale or (n, h, w, 3) RGB uint8 → MJPEG AVI bytes.
    Deterministic in all arguments (the JPEG encoder builds canonical
    per-image Huffman tables)."""
    frames = np.asarray(frames)
    if frames.ndim not in (3, 4):
        raise ValueError("frames must be (n, h, w) or (n, h, w, 3)")
    n, h, w = frames.shape[:3]
    rate, scale = fps
    jpegs = [encode_jpeg(frames[i], quality=quality) for i in range(n)]

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<14I",
        int(1_000_000 * scale / rate),  # dwMicroSecPerFrame
        0, 0,
        0x10,                           # AVIF_HASINDEX
        n, 0, 1,                        # totalframes, initial, streams
        max(len(j) for j in jpegs) if jpegs else 0,
        w, h, 0, 0, 0, 0,
    )
    strh = (b"vids" + b"MJPG"
            + struct.pack("<10I4H", 0, 0, 0, scale, rate, 0, n,
                          max(len(j) for j in jpegs) if jpegs else 0,
                          0, 0, 0, 0, w, h))
    strf = struct.pack("<I2i2H2I2i2I", 40, w, h, 1, 24, 0x47504A4D,
                       w * h * 3, 0, 0, 0, 0)  # 'MJPG' little-endian
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_parts, idx, off = [], [], 4  # offsets relative to 'movi' fourcc
    for j in jpegs:
        c = chunk(b"00dc", j)
        movi_parts.append(c)
        idx.append(b"00dc" + struct.pack("<3I", 0x10, off, len(j)))
        off += len(c)
    movi = lst(b"movi", b"".join(movi_parts))
    idx1 = chunk(b"idx1", b"".join(idx))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(data: bytes) -> tuple[list[np.ndarray],
                                           tuple[int, int]]:
    """MJPEG AVI bytes → (frames, (rate, scale)). Raises ValueError on
    truncation, a non-AVI RIFF, or non-JPEG frame payloads — atomic, no
    partial frame list escapes."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    declared = struct.unpack("<I", data[4:8])[0]
    if len(data) < 8 + declared:
        raise ValueError("truncated AVI (RIFF size exceeds data)")

    fps = (25, 1)
    frames: list[np.ndarray] = []

    def walk(buf: bytes, pos: int, end: int):
        nonlocal fps
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
            body_end = pos + 8 + size
            if body_end > end:
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                kind = buf[pos + 8:pos + 12]
                if kind in (b"hdrl", b"strl", b"movi", b"rec "):
                    walk(buf, pos + 12, body_end)
            elif fourcc == b"strh" and buf[pos + 8:pos + 12] == b"vids":
                scale, rate = struct.unpack("<2I", buf[pos + 28:pos + 36])
                if scale and rate:
                    fps = (rate, scale)
            elif fourcc[2:4] in (b"dc", b"db"):
                try:
                    frames.append(decode_jpeg(buf[pos + 8:body_end]))
                except NotImplementedError as exc:
                    # honor the ValueError-only contract: a frame coded
                    # beyond the JPEG codec's support (e.g. arithmetic)
                    # must dead-letter the CLIP, not crash the stage
                    raise ValueError(
                        f"unsupported MJPEG frame coding: {exc}"
                    ) from exc
            pos = body_end + (size & 1)

    walk(data, 12, 8 + declared)
    if not frames:
        raise ValueError("AVI contains no decodable video frames")
    return frames, fps
