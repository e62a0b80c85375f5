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
    assert len(real) == 60 and real["decode_ok"].all()  # every real blob
    bad = a[a["decode_kind"] == "malformed"]
    assert len(bad) > 0 and not bad["decode_ok"].any()


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
    # round 4: per-media exact form — every intact image resized with a
    # pixel hash, everything else passed through with a null hash
    assert int(r["resized"].sum()) == 40
    assert r.loc[r["resized"], "px_md5"].notna().all()
    assert r.loc[~r["resized"], "px_md5"].isna().all()

    fs = q_frame_sample("/root/testdata/sf0.001")
    # 12 Y4M + 6 MJPEG-AVI decodable clips; the two truncated clips
    # (one of each container) produced no rows
    assert len(fs) == 18
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


# ------------------------------------------------- real JPEG/GIF codecs

def test_jpeg_roundtrip_smooth_and_quality_scaling():
    """Baseline JPEG round trip: smooth images near-lossless at high
    quality, error monotone-ish in quality, q100 tiny block exact."""
    from gush_ray.stages.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:32, 0:48]
    gray = np.clip(xx * 3 + yy * 2, 0, 255).astype(np.uint8)
    errs = {}
    for q in (50, 90, 95):
        d = decode_jpeg(encode_jpeg(gray, quality=q))
        assert d.shape == gray.shape
        errs[q] = np.abs(d.astype(int) - gray.astype(int)).mean()
    assert errs[95] <= errs[50] + 1e-9
    assert errs[95] < 0.5  # near-lossless on a smooth ramp

    color = np.stack([np.clip(xx * 3 + yy, 0, 255),
                      np.clip(255 - xx * 2, 0, 255),
                      np.clip(yy * 4, 0, 255)], axis=-1).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(color, quality=92))
    assert d.shape == color.shape
    assert np.abs(d.astype(int) - color.astype(int)).max() <= 4

    # q100: quant table all ones — only float DCT rounding remains (±1)
    tiny = np.random.RandomState(3).randint(0, 256, (3, 5), dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(tiny, quality=100))
    assert np.abs(d.astype(int) - tiny.astype(int)).max() <= 1


def test_jpeg_rejects_garbage_and_header_only():
    from gush_ray.stages.codecs import encode_jpeg_header
    from gush_ray.stages.jpeg import decode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    # header-only blob (old fixture style): parseable SOF, no scan
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg_header(64, 48, 3))


def test_jpeg_decode_feeds_real_pixel_stats():
    """DecodeFeatures on a real-body JPEG reports true dims AND nonzero
    pixel statistics (the round-2 honest boundary, now closed)."""
    from gush_ray.stages.jpeg import encode_jpeg
    from gush_ray.stages.multimodal import DecodeFeatures

    px = np.full((20, 30, 3), 200, dtype=np.uint8)
    blob = encode_jpeg(px, quality=95)
    w, h, f, kind, ok = DecodeFeatures()._decode_one(blob)
    assert (w, h, kind, ok) == (30, 20, "jpeg", True)
    assert abs(f[0] - 200 / 255.0) < 0.02  # real channel mean, not 0


def test_gif_roundtrip_exact_and_frame_count():
    from gush_ray.stages.gif import decode_gif, encode_gif

    rng = np.random.RandomState(7)
    pal = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    img = pal[rng.randint(0, 16, size=(21, 33))]
    enc = encode_gif(img)
    dec, nf = decode_gif(enc)
    assert nf == 1 and (dec == img).all()

    # 256-color image forces LZW code-width growth and table clears
    pal2 = rng.randint(0, 256, size=(256, 3), dtype=np.uint8)
    img2 = pal2[rng.randint(0, 256, size=(64, 64))]
    dec2, _ = decode_gif(encode_gif(img2))
    assert (dec2 == img2).all()

    with pytest.raises(ValueError):
        decode_gif(enc[: len(enc) // 2])


def test_gif_multiframe_and_interlace():
    import struct

    from gush_ray.stages.gif import _lzw_encode, decode_gif, encode_gif

    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.randint(0, 4, size=(13, 9))
    img = pal[idx]

    # multi-frame: append a second image descriptor with the same data
    enc = bytearray(encode_gif(img))
    one_frame = bytes(enc)
    second = one_frame[one_frame.index(b"\x2c"):-1]  # descriptor..before trailer
    multi = one_frame[:-1] + second + b"\x3b"
    dec, nf = decode_gif(bytes(multi))
    assert nf == 2 and (dec == img).all()  # first frame composited

    # interlaced frame: store rows in pass order, set the interlace flag
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, 13, step))
    permuted = idx[order]  # what an interlaced encoder writes
    bits = 2
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", 9, 13, 0x80 | (bits - 1), 0, 0)
    palette = np.zeros((1 << bits, 3), dtype=np.uint8)
    palette[: len(pal)] = pal
    out += palette.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, 9, 13, 0x40)  # interlaced
    out.append(2)
    lzw = _lzw_encode(2, permuted.ravel().tolist())
    for i in range(0, len(lzw), 255):
        chunk = lzw[i: i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    dec_i, _ = decode_gif(bytes(out))
    assert (dec_i == img).all()  # rows de-interlaced back to raster


def test_gif_decode_features_real_pixels():
    from gush_ray.stages.gif import encode_gif
    from gush_ray.stages.multimodal import DecodeFeatures

    img = np.full((10, 14, 3), [10, 200, 60], dtype=np.uint8)
    w, h, f, kind, ok = DecodeFeatures()._decode_one(encode_gif(img))
    assert (w, h, kind, ok) == (14, 10, "gif", True)
    assert abs(f[1] - 200 / 255.0) < 0.02


def test_jpeg_progressive_equals_baseline_decode():
    """Progressive (SOF2: spectral selection + successive approximation,
    DC/AC first + refinement passes, EOB runs) must reconstruct the
    EXACT pixels of the baseline encoding of the same image — both
    encoders emit identical quantized coefficients, and the baseline
    path is independently pinned by pixel round-trips, so a symmetric
    progressive encode/decode bug cannot hide."""
    from gush_ray.stages.jpeg import (decode_jpeg, encode_jpeg,
                                      encode_jpeg_progressive)

    rng = np.random.RandomState(11)
    yy, xx = np.mgrid[0:40, 0:56]
    smooth = np.stack([np.clip(xx * 3 + yy, 0, 255),
                       np.clip(255 - xx * 2, 0, 255),
                       np.clip(yy * 4, 0, 255)], axis=-1).astype(np.uint8)
    noise = rng.randint(0, 256, size=(33, 31), dtype=np.uint8)
    for img in (smooth, noise):
        base = decode_jpeg(encode_jpeg(img, quality=75))
        for dc_al, ac_al in ((1, 1), (2, 2), (0, 0)):
            prog = decode_jpeg(encode_jpeg_progressive(
                img, quality=75, dc_al=dc_al, ac_al=ac_al))
            assert (base == prog).all(), (dc_al, ac_al)


def test_jpeg_progressive_through_decode_features():
    from gush_ray.stages.jpeg import encode_jpeg_progressive
    from gush_ray.stages.multimodal import DecodeFeatures

    px = np.full((20, 30, 3), 180, dtype=np.uint8)
    blob = encode_jpeg_progressive(px, quality=95)
    w, h, f, kind, ok = DecodeFeatures()._decode_one(blob)
    assert (w, h, kind, ok) == (30, 20, "jpeg", True)
    assert abs(f[0] - 180 / 255.0) < 0.02  # real pixel stats, not 0


def test_avi_mjpeg_roundtrip_matches_bare_jpeg():
    """MJPEG-AVI frames decode EXACTLY like the bare JPEG round trip —
    the container adds no pixel drift (stages/avi.py)."""
    from gush_ray.stages.avi import decode_avi_mjpeg, encode_avi_mjpeg
    from gush_ray.stages.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(5)
    for shape in ((6, 13, 17), (4, 9, 21, 3)):  # gray + RGB
        fr = rng.randint(0, 256, size=shape, dtype=np.uint8)
        frames, fps = decode_avi_mjpeg(encode_avi_mjpeg(fr, (30, 1)))
        assert fps == (30, 1) and len(frames) == shape[0]
        for i, f in enumerate(frames):
            assert (f == decode_jpeg(encode_jpeg(fr[i]))).all()


def test_avi_mjpeg_truncation_and_garbage_atomic():
    from gush_ray.stages.avi import decode_avi_mjpeg, encode_avi_mjpeg

    fr = np.zeros((3, 8, 8), dtype=np.uint8)
    data = encode_avi_mjpeg(fr)
    with pytest.raises(ValueError):
        decode_avi_mjpeg(data[: len(data) // 2])
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"garbage")


def test_avi_sniff_and_sample_frames():
    """The video sampling stage decodes MJPEG-AVI through the real JPEG
    codec; a truncated AVI is dropped whole (dead-letter analog)."""
    import pyarrow as pa

    from gush_ray.stages.avi import encode_avi_mjpeg
    from gush_ray.stages.multimodal import SampleFrames, sniff_blob_batch

    rng = np.random.RandomState(9)
    fr = rng.randint(0, 256, size=(11, 10, 12), dtype=np.uint8)
    good = encode_avi_mjpeg(fr, (25, 1))
    batch = pa.table({
        "media_id": pa.array([0, 1], type=pa.int64()),
        "blob": pa.array([good, good[: len(good) // 3]],
                         type=pa.binary()),
    })
    sn = sniff_blob_batch(batch, blob_col="blob")
    assert sn["blob_kind"].to_pylist()[0] == "avi"
    out = SampleFrames(blob_col="blob", every_k=4,
                       on_unsupported="error")(batch)
    df = out.to_pandas()
    assert df["media_id"].unique().tolist() == [0]
    assert len(df) == -(-11 // 4)
    assert (df["n_frames"] == 11).all()
    assert (df["width"] == 12).all() and (df["height"] == 10).all()


def test_jpeg_lossless_roundtrip_exact():
    """SOF3 lossless: decode(encode(px)) == px bit-exact for every
    predictor, gray + RGB, uint8 + uint16 (no color transform, no DCT)."""
    from gush_ray.stages.jpeg import decode_jpeg, encode_jpeg_lossless

    rng = np.random.RandomState(11)
    cases = [rng.randint(0, 256, size=(14, 19), dtype=np.uint8),
             rng.randint(0, 256, size=(7, 9, 3), dtype=np.uint8),
             rng.randint(0, 4096, size=(8, 8), dtype=np.uint16),
             np.full((5, 5), 200, dtype=np.uint8)]
    for px in cases:
        for pred in range(1, 8):
            out = decode_jpeg(encode_jpeg_lossless(px, predictor=pred))
            assert out.dtype == px.dtype and (out == px).all(), pred


def test_jpeg_lossless_point_transform_and_errors():
    from gush_ray.stages.jpeg import decode_jpeg, encode_jpeg_lossless

    rng = np.random.RandomState(12)
    px = rng.randint(0, 256, size=(10, 6), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_lossless(px, point_transform=3))
    assert (out == (px >> 3) << 3).all()
    with pytest.raises(ValueError):
        encode_jpeg_lossless(px, predictor=0)
    with pytest.raises(ValueError):
        encode_jpeg_lossless(px.astype(np.float64))
    blob = encode_jpeg_lossless(px)
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) - 10])  # truncated entropy data


def test_jpeg_lossless_through_decode_features():
    from gush_ray.stages.jpeg import encode_jpeg_lossless
    from gush_ray.stages.multimodal import DecodeFeatures

    px = np.full((12, 25, 3), 64, dtype=np.uint8)
    w, h, f, kind, ok = DecodeFeatures()._decode_one(
        encode_jpeg_lossless(px))
    assert (w, h, kind, ok) == (25, 12, "jpeg", True)
    assert abs(f[0] - 64 / 255.0) < 1e-6  # lossless: exact mean


def test_uint16_lossless_features_stay_in_unit_range():
    """>8-bit pixels normalize by their dtype full-scale (review fix:
    /255 put 16-bit stats up to 257x out of the documented [0,1])."""
    from gush_ray.stages.jpeg import encode_jpeg_lossless
    from gush_ray.stages.multimodal import DecodeFeatures

    px = np.full((8, 8), 40000, dtype=np.uint16)
    _w, _h, f, _k, ok = DecodeFeatures()._decode_one(
        encode_jpeg_lossless(px))
    assert ok and abs(f[0] - 40000 / 65535.0) < 1e-6
    assert (f[:6] <= 1.0).all()


def test_avi_unsupported_frame_coding_dead_letters():
    """A frame coded beyond the JPEG codec (progressive is fine,
    arithmetic is not) raises ValueError — the clip dead-letters instead
    of crashing the sampling stage (review fix)."""
    import struct

    from gush_ray.stages.avi import decode_avi_mjpeg, encode_avi_mjpeg

    good = encode_avi_mjpeg(np.zeros((2, 8, 8), dtype=np.uint8))
    # corrupt the first frame's SOF0 marker into SOF9 (arithmetic)
    sof = good.find(b"\xff\xc0")
    assert sof > 0
    bad = good[:sof] + b"\xff\xc9" + good[sof + 2:]
    with pytest.raises(ValueError, match="unsupported MJPEG"):
        decode_avi_mjpeg(bad)
