"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are
STUBS (clearly marked) behind a deterministic fake used by tests —
but the Spark-side plumbing is real: schemas, batch shapes, partition
sizing, and the UDF signatures are exactly what a production decoder
drops into.  Reference analog: the blocked raster read pipeline
(SURVEY.md §2.8 R1-R4, /root/reference/earth_data_kit/
xarray_boosted/entrypoint.py:95-133) — binary blocks in, numpy
batches out, nodata masking and scale/offset applied per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, feat array<float>, "
    "out_width int, out_height int"
)


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB: real implementation decodes JPEG/PNG → HxWx3 uint8.
    The deterministic fake derives pixels from the payload hash so
    downstream math is testable without codecs."""
    if payload is None:
        raise NotImplementedError("image decode requires a codec (not in container)")
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "big") & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize — the same index math as the
    reference's regrid (R7/R9, dataset.py:516-541, 947-961)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * (h / out_h)).astype(np.int64)
    xs = (np.arange(out_w) * (w / out_w)).astype(np.int64)
    return img[ys][:, xs]


def sample_frames(n_frames: int, every: int) -> np.ndarray:
    """Frame-sampling index math for video payloads."""
    return np.arange(0, n_frames, every, dtype=np.int64)


def extract_features(
    media: DataFrame, out_w: int = 8, out_h: int = 8
) -> DataFrame:
    """mapInPandas pipeline: decode → resize → mean-pool per channel →
    flat float feature vector.  Arrow batch in/out; one numpy pass per
    batch (no per-row Python beyond the decode call)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ow, oh = [], [], []
            for _, r in pdf.iterrows():
                if r["kind"] == "image":
                    img = decode_image(r["payload"], int(r["width"]), int(r["height"]))
                    small = resize_nearest(img, out_w, out_h)
                    feats.append(small.mean(axis=2).astype(np.float32).ravel().tolist())
                else:
                    # audio/video feature kernels: NotImplemented in
                    # this container; rows pass through with null feat
                    feats.append(None)
                ow.append(out_w)
                oh.append(out_h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat": feats,
                    "out_width": ow,
                    "out_height": oh,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synth_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = [
        (i, "image", bytes([i % 256] * 16), 32, 24, None, None) for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(4, "media_id")
