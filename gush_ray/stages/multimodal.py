"""Multimodal (image/audio/video) column plumbing.

Binary payloads are opaque ``binary`` columns + typed metadata; decode /
feature-extract / resize / frame-sample are actor-pool ``map_batches``
stages. The image/audio codec libraries are NOT in this container, so the
codec kernels are STUBBED (clearly marked) behind a deterministic fake —
the Ray-side plumbing (schema, batch sizing, actor signature, output
layout) is real and tested, and a real decoder drops into ``_decode_impl``
without touching the pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

FEATURE_DIM = 8

_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"GIF8": "gif",
    b"RIFF": "riff",
    b"<!DO": "html",
    b"<htm": "html",
}


def sniff_blob_batch(batch: pa.Table, blob_col: str = "html") -> pa.Table:
    """Typed metadata for an opaque binary column: size + magic sniff."""
    blobs = batch[blob_col].combine_chunks()
    sizes = pc.binary_length(blobs).cast(pa.int64())
    heads = [bytes(v.as_py()[:4]) if v.is_valid else b"" for v in blobs]
    kinds = [
        next((k for m, k in _MAGIC.items() if h.startswith(m[: len(h)]) and h),
             "unknown")
        for h in heads
    ]
    batch = batch.append_column("blob_size", sizes)
    batch = batch.append_column("blob_kind", pa.array(kinds, type=pa.string()))
    return batch


class DecodeFeaturesStub:
    """Actor-pool decode + feature-extraction stage.

    Real deployment: ``__init__`` loads the codec/model ONCE per actor;
    ``__call__`` decodes each blob and emits fixed-dim features. Here the
    decode is a STUB — ``use_real_codec=True`` raises NotImplementedError
    (no codec libs in this container); the default deterministic fake
    derives width/height/features from a hash of the bytes so the full
    pipeline (schema, batching, actor reuse) is exercised end-to-end.
    """

    def __init__(self, blob_col: str = "html", use_real_codec: bool = False):
        self.blob_col = blob_col
        self.use_real_codec = use_real_codec
        self.calls = 0  # proves actor reuse across batches in tests

    def _decode_impl(self, blob: bytes) -> tuple[int, int, np.ndarray]:
        if self.use_real_codec:
            raise NotImplementedError(
                "real image/audio decode requires codec libraries not "
                "present in this environment; plug a decoder in here"
            )
        h = np.frombuffer(
            np.array([hash_bytes(blob)], dtype=np.uint64).tobytes(),
            dtype=np.uint8,
        ).astype(np.float64)
        width = int(64 + (h[0] % 64))
        height = int(64 + (h[1] % 64))
        feats = (h[:FEATURE_DIM] / 255.0).astype(np.float32)
        return width, height, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.calls += 1
        blobs = batch[self.blob_col].combine_chunks()
        widths = np.empty(len(blobs), dtype=np.int32)
        heights = np.empty(len(blobs), dtype=np.int32)
        feats = np.zeros((len(blobs), FEATURE_DIM), dtype=np.float32)
        for i, v in enumerate(blobs):
            data = v.as_py() if v.is_valid else b""
            w, hgt, f = self._decode_impl(data or b"")
            widths[i], heights[i] = w, hgt
            feats[i] = f
        out = batch.drop_columns([self.blob_col])
        out = out.append_column("width", pa.array(widths))
        out = out.append_column("height", pa.array(heights))
        out = out.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), type=pa.float32()), FEATURE_DIM
            ),
        )
        return out


def hash_bytes(b: bytes) -> np.uint64:
    return pd.util.hash_array(np.array([b], dtype=object), categorize=False)[0]


def decode_features(ds, blob_col: str = "html", concurrency: int = 4,
                    batch_size: int = 512):
    """Attach the actor-pool decode stage (small batches: wide binary
    payloads × concurrency must fit the worker heap)."""
    return ds.map_batches(
        DecodeFeaturesStub,
        fn_constructor_kwargs={"blob_col": blob_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
