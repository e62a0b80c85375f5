"""Pure-stdlib codec round-trips + the real multimodal decode stage."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gush_ray.stages.codecs import (
    decode_bmp, decode_png, decode_wav, encode_bmp, encode_png, encode_wav,
)


@pytest.mark.parametrize("shape", [(5, 9), (1, 1), (8, 6, 3), (4, 4, 4)])
def test_png_roundtrip(shape):
    px = np.random.RandomState(3).randint(0, 256, size=shape, dtype=np.uint8)
    back = decode_png(encode_png(px))
    assert back.shape == px.shape
    assert (back == px).all()


def test_png_all_filter_types_decode():
    """Decode a PNG whose rows use every filter type (our encoder only
    writes filter 0; foreign encoders use them all)."""
    import struct
    import zlib

    from gush_ray.stages.codecs import PNG_MAGIC

    rng = np.random.RandomState(5)
    w, h, ch = 6, 5, 3
    rows = rng.randint(0, 256, size=(h, w * ch), dtype=np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
        if pa_ <= pb and pa_ <= pc_:
            return a
        return b if pb <= pc_ else c

    raw = b""
    prev = np.zeros(w * ch, dtype=np.int16)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = rows[y].astype(np.int16)
        enc = cur.copy()
        for x in range(w * ch):
            left = int(cur[x - ch]) if x >= ch else 0
            up = int(prev[x])
            ul = int(prev[x - ch]) if x >= ch else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) >> 1,
                    4: paeth(left, up, ul)}[ftype]
            enc[x] = (int(cur[x]) - pred) % 256
        raw += bytes([ftype]) + enc.astype(np.uint8).tobytes()
        prev = cur

    def chunk(tag, data):
        body = tag + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    png = (PNG_MAGIC
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    dec = decode_png(png)
    assert (dec.reshape(h, w * ch) == rows).all()


def test_bmp_roundtrip():
    px = np.random.RandomState(4).randint(0, 256, size=(7, 5, 3),
                                          dtype=np.uint8)
    assert (decode_bmp(encode_bmp(px)) == px).all()


def test_wav_roundtrip():
    s = (np.random.RandomState(6).randn(1000, 2) * 9000).astype(np.int16)
    back, rate = decode_wav(encode_wav(s, 22_050))
    assert rate == 22_050
    assert (back == s).all()


def test_decoders_reject_garbage():
    for fn in (decode_png, decode_bmp, decode_wav):
        with pytest.raises(ValueError):
            fn(b"garbage bytes here")


def test_decode_features_real_codecs():
    """The actor-pool stage computes REAL widths/heights for encoded
    blobs; truncated blobs surface as decode_ok=False; unknown formats
    fall back to the deterministic fake."""
    from gush_ray.stages.multimodal import DecodeFeatures, sniff_blob_batch

    png = encode_png(np.full((12, 34, 3), 7, dtype=np.uint8))
    bmp = encode_bmp(np.full((9, 21, 3), 200, dtype=np.uint8))
    wav = encode_wav(np.zeros((500, 2), dtype=np.int16), rate=8000)
    t = pa.table({
        "id": [1, 2, 3, 4, 5],
        "blob": pa.array([png, bmp, wav, png[:40], b"<!DOCTYPE html>"],
                         type=pa.binary()),
    })
    sniffed = sniff_blob_batch(t, blob_col="blob")
    assert sniffed["blob_kind"].to_pylist() == \
        ["png", "bmp", "wav", "png", "html"]
    out = DecodeFeatures(blob_col="blob")(t)
    w = out["width"].to_pylist()
    h = out["height"].to_pylist()
    kinds = out["decode_kind"].to_pylist()
    oks = out["decode_ok"].to_pylist()
    assert (w[0], h[0]) == (34, 12)           # real PNG dims
    assert (w[1], h[1]) == (21, 9)            # real BMP dims
    assert (w[2], h[2]) == (500, 2)           # frames × channels
    assert kinds[:3] == ["png", "bmp", "wav"] and all(oks[:3])
    assert kinds[3] == "malformed" and not oks[3]
    assert kinds[4] == "fake" and oks[4]
    # uniform 7-gray PNG: mean channels = 7/255, std 0
    f0 = out["features"][0].as_py()
    assert abs(f0[0] - 7 / 255) < 1e-6 and abs(f0[3]) < 1e-6
    # on_unsupported="error" is the honest boundary for absent codecs
    # (WEBP: RIFF container but not WAVE — no stdlib decode possible)
    with pytest.raises(NotImplementedError):
        DecodeFeatures(blob_col="blob", on_unsupported="error")._decode_one(
            b"RIFF\x00\x01\x00\x00WEBPVP8 "
        )


def test_decode_features_jpeg_gif_header_geometry():
    """JPEG/GIF get REAL dimensions from a pure header walk (no native
    codec): geometry features real, pixel-statistic slots honestly 0;
    malformed headers dead-letter."""
    from gush_ray.stages.codecs import (encode_gif_header,
                                        encode_jpeg_header, gif_header,
                                        jpeg_header)
    from gush_ray.stages.multimodal import DecodeFeatures, sniff_blob_batch

    jpg = encode_jpeg_header(640, 480, 3)
    gif = encode_gif_header(320, 200, 4)
    assert jpeg_header(jpg) == (640, 480, 3)
    assert gif_header(gif) == (320, 200, 16)
    t = pa.table({
        "id": [1, 2, 3],
        "blob": pa.array([jpg, gif, b"\xff\xd8\xff no sof here"],
                         type=pa.binary()),
    })
    assert sniff_blob_batch(t, blob_col="blob")["blob_kind"].to_pylist() \
        == ["jpeg", "gif", "jpeg"]
    out = DecodeFeatures(blob_col="blob")(t)
    assert out["width"].to_pylist()[:2] == [640, 320]
    assert out["height"].to_pylist()[:2] == [480, 200]
    assert out["decode_kind"].to_pylist() == ["jpeg", "gif", "malformed"]
    assert out["decode_ok"].to_pylist() == [True, True, False]
    f_jpg = out["features"][0].as_py()
    assert f_jpg[0] == 0.0 and f_jpg[3] == 0.0   # pixel stats absent
    assert abs(f_jpg[6] - min(640 / 480, 4.0) / 4.0) < 1e-6
    assert f_jpg[7] == 1.0                        # image modality tag
    # error mode still raises for these headers? no — they decode now
    w, h, f, kind, ok = DecodeFeatures(
        blob_col="blob", on_unsupported="error")._decode_one(jpg)
    assert (w, h, kind, ok) == (640, 480, "jpeg", True)


def test_multimodal_decode_query_deterministic():
    from gush_ray.pipelines.queries_extra import q_multimodal_decode

    a = q_multimodal_decode("/root/testdata/sf0.001")
    b = q_multimodal_decode("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(a, b)
    real = a[a["decode_kind"].isin(["png", "bmp", "wav"])]
    assert real["n"].sum() == 60                   # every real blob decoded
    assert (a[a["decode_kind"] == "malformed"]["n"] > 0).all()


def test_y4m_roundtrip_and_reject():
    from gush_ray.stages.codecs import decode_y4m, encode_y4m

    fr = np.random.RandomState(2).randint(0, 256, size=(6, 8, 10),
                                          dtype=np.uint8)
    back, fps = decode_y4m(encode_y4m(fr, (30, 1)))
    assert fps == (30, 1)
    assert (back == fr).all()
    with pytest.raises(ValueError):
        decode_y4m(b"not a video")
    with pytest.raises(ValueError):  # truncated mid-frame
        decode_y4m(encode_y4m(fr)[:-5])


def test_resize_stage_real_pixels():
    """Resize stage re-encodes real pixels: decoding the output blob
    gives exactly the nearest-neighbor-resized image."""
    from gush_ray.stages.codecs import resize_nearest
    from gush_ray.stages.multimodal import ResizeImages

    rng = np.random.RandomState(8)
    px = rng.randint(0, 256, size=(20, 30, 3), dtype=np.uint8)
    wav_blob = encode_wav(np.zeros(100, dtype=np.int16))
    t = pa.table({
        "media_id": [1, 2],
        "blob": pa.array([encode_png(px), wav_blob], type=pa.binary()),
    })
    out = ResizeImages(blob_col="blob", out_w=7, out_h=5)(t)
    assert out["resized"].to_pylist() == [True, False]
    resized_px = decode_png(out["blob"][0].as_py())
    assert resized_px.shape == (5, 7, 3)
    assert (resized_px == resize_nearest(px, 7, 5)).all()
    assert out["blob"][1].as_py() == wav_blob  # non-image passthrough


def test_sample_frames_real_video():
    from gush_ray.stages.codecs import encode_y4m
    from gush_ray.stages.multimodal import FEATURE_DIM, SampleFrames

    rng = np.random.RandomState(9)
    clip = rng.randint(0, 256, size=(13, 6, 6), dtype=np.uint8)
    t = pa.table({
        "media_id": [7, 8],
        "blob": pa.array([encode_y4m(clip), encode_y4m(clip)[:30]],
                         type=pa.binary()),
    })
    out = SampleFrames(blob_col="blob", every_k=5)(t)
    # 13 frames sampled every 5 → frames 0,5,10; truncated clip dropped
    assert out["media_id"].to_pylist() == [7, 7, 7]
    assert out["frame_idx"].to_pylist() == [0, 5, 10]
    assert out["n_frames"].to_pylist() == [13, 13, 13]
    assert out["width"].to_pylist() == [6, 6, 6]
    assert out["features"].type.list_size == FEATURE_DIM
    # frame features are REAL luma stats of that exact frame
    f0 = out["features"][0].as_py()
    assert abs(f0[0] - clip[0].mean() / 255.0) < 1e-6


def test_multimodal_resize_and_frame_sample_queries():
    from gush_ray.pipelines.queries_extra import (
        q_frame_sample, q_multimodal_resize,
    )

    r = q_multimodal_resize("/root/testdata/sf0.001")
    imgs = r[r["blob_kind"].isin(["png", "bmp"]) & r["resized"]]
    assert imgs["n"].sum() == 40          # every intact image resized
    assert not r[r["blob_kind"] == "wav"]["resized"].any()

    fs = q_frame_sample("/root/testdata/sf0.001")
    assert len(fs) == 12                  # truncated clip produced no rows
    assert (fs["n_sampled"] == (fs["n_frames"] + 4) // 5).all()


def test_pnm_roundtrip_and_comments():
    from gush_ray.stages.codecs import (decode_pgm, decode_ppm, encode_pgm,
                                        encode_ppm)

    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, (7, 5, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(rgb)) == rgb).all()
    gray = rng.randint(0, 256, (4, 9), dtype=np.uint8)
    assert (decode_pgm(encode_pgm(gray)) == gray).all()
    # header comments and arbitrary whitespace are legal
    body = rgb.tobytes()
    quirky = b"P6 # comment\n# another\n 5\t7 # w h\n255\n" + body
    assert (decode_ppm(quirky) == rgb).all()
    for bad in (b"P6\n5 7\n255\n" + body[:-8],     # truncated pixels
                b"P6\n5 7\n70000\n" + body,        # 16-bit maxval
                b"P6\n5 7 255",                    # no terminator
                b"P5\n", b"Px"):
        with pytest.raises(ValueError):
            decode_ppm(bad)


def test_decode_features_pnm_real_pixels():
    from gush_ray.stages.codecs import encode_pgm, encode_ppm
    from gush_ray.stages.multimodal import DecodeFeatures, sniff_blob_batch

    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, (12, 8, 3), dtype=np.uint8)
    gray = rng.randint(0, 256, (6, 10), dtype=np.uint8)
    batch = pa.table({"html": pa.array(
        [encode_ppm(rgb), encode_pgm(gray)], type=pa.binary())})
    sniffed = sniff_blob_batch(batch)
    assert sniffed["blob_kind"].to_pylist() == ["ppm", "pgm"]
    out = DecodeFeatures()(batch)
    assert out["width"].to_pylist() == [8, 10]
    assert out["height"].to_pylist() == [12, 6]
    assert out["decode_kind"].to_pylist() == ["ppm", "pgm"]
    assert out["decode_ok"].to_pylist() == [True, True]
    # real pixel statistics (mean brightness feature) — not the fake
    f0 = np.asarray(out["features"][0].as_py())
    assert abs(f0[0] - rgb.mean() / 255.0) < 0.02
