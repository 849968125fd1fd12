"""Multimodal columns for training-data pipelines (north-star,
BASELINE.json): image/audio/video as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` operators.

The Spark-side plumbing — schemas, partitioning, UDF signatures, batch
shapes — is real and tested; the actual codec step is pluggable:

* pass a ``decoder`` callable (e.g. PIL/torchaudio-backed) when the codec
  libraries exist in the runtime;
* the default ``decoder=None`` uses a clearly-marked DETERMINISTIC FAKE
  (content-hash-derived dimensions/features) so pipeline topology is
  testable in codec-free environments like this one;
* ``strict=True`` instead raises ``NotImplementedError`` at the decode
  boundary, making the stub explicit.

At 100 TB the media bytes dominate: every operator here projects metadata
early, keeps bytes in Arrow batches (never per-row Python serde), and
repartitions by content hash so hot keys (duplicated assets) spread.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("format", T.StringType(), True),  # png | wav | mp4 | ...
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Lift a text corpus into MEDIA_SCHEMA rows for tests: content =
    utf-8 bytes of the text (deterministic), metadata filled from lengths."""
    content = F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")
    # non-numeric ids (string doc_ids) hash to a stable long instead of
    # silently casting to NULL (media_id is non-nullable in MEDIA_SCHEMA).
    # A NULL id falls through to hashing the TEXT: xxhash64 of an all-NULL
    # input returns the bare seed (a constant), which would collapse every
    # NULL-id row onto one media_id
    media_id = F.coalesce(
        F.col(id_col).cast("long"),
        F.xxhash64(
            F.coalesce(
                F.col(id_col).cast("string"),
                F.concat(F.lit("\x00text:"), F.coalesce(F.col(text_col), F.lit(""))),
            )
        ),
    )
    return df.select(
        media_id.alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("fake").alias("format"),
        content.alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes) -> tuple[int, int, list[float]]:
    """DETERMINISTIC FAKE decode: dimensions and an 8-dim feature vector
    derived from the content digest. NOT a real codec — stands in for
    PIL/ffmpeg in codec-free runtimes."""
    digest = hashlib.sha256(content or b"").digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feats = [round(b / 255.0, 6) for b in digest[2:10]]
    return width, height, feats


def decode_media(
    media: DataFrame,
    decoder: Callable[[bytes], tuple[int, int, list[float]]] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Decode + feature-extract: mapInPandas over Arrow batches of media
    rows -> (media_id, width, height, features).

    Real pipelines pass a codec-backed ``decoder``; ``strict=True`` makes the
    missing-codec case an explicit NotImplementedError instead of the fake.
    """
    if strict and decoder is None:
        raise NotImplementedError(
            "no media codec available in this runtime: pass decoder= "
            "(PIL/ffmpeg-backed) or use the deterministic fake (strict=False)"
        )
    decode = decoder or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [decode(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": [o[0] for o in out],
                    "height": [o[1] for o in out],
                    "features": [o[2] for o in out],
                }
            )

    # load-balance decode work by the unique media_id (hashing *content*
    # would co-locate every copy of a duplicated asset on one task — the
    # opposite of spreading)
    parted = media.repartition(F.col("media_id"))
    return parted.mapInPandas(run, _DECODED_SCHEMA)


def sample_frames(
    media: DataFrame, frame_size: int = 1024, every_n: int = 2
) -> DataFrame:
    """Frame sampling plumbing: treat content as fixed-size frames, emit
    every ``every_n``-th frame as its own row (posexplode of byte slices —
    all JVM-side; a real video pipeline swaps the slicer for a demuxer)."""
    if every_n < 1:
        # i % 0 is NULL under the engine's ANSI-off confs, so the filter
        # would silently emit ZERO frames instead of erroring
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    if frame_size < 1:
        raise ValueError(f"frame_size must be >= 1, got {frame_size}")
    n_frames = F.ceil(F.length("content") / F.lit(frame_size)).cast("int")
    idx = F.filter(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: i % every_n == 0,
    )
    # empty/NULL content has zero frames — without this filter the
    # greatest(..,0) clamp would fabricate a phantom frame_idx=0 row
    exploded = media.filter(F.length("content") > 0).select(
        "media_id",
        F.explode(idx).alias("frame_idx"),
        F.col("content"),
    )
    return exploded.select(
        "media_id",
        "frame_idx",
        F.substring(
            F.col("content"), F.col("frame_idx") * frame_size + 1, frame_size
        ).alias("frame_bytes"),
    )


_RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def _fake_resize(content: bytes, width: int, height: int) -> bytes:
    """DETERMINISTIC FAKE resize: nearest-neighbor sample of the byte stream
    down/up to exactly width*height bytes. NOT a real scaler — stands in for
    PIL/ffmpeg so batch shape, output sizing, and schema are testable."""
    n = width * height
    if not content:
        return b"\x00" * n
    m = len(content)
    return bytes(content[(i * m) // n] for i in range(n))


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Resize plumbing: mapInPandas over Arrow batches of media rows ->
    (media_id, width, height, content) with content scaled to the target
    dimensions. Real pipelines pass a codec-backed ``resizer`` (e.g.
    PIL.Image.resize); ``strict=True`` raises instead of using the
    deterministic fake. Same scale posture as ``decode_media``: bytes stay
    in Arrow batches, work spreads by media_id."""
    if strict and resizer is None:
        raise NotImplementedError(
            "no image scaler available in this runtime: pass resizer= "
            "(PIL/ffmpeg-backed) or use the deterministic fake (strict=False)"
        )
    scale = resizer or _fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": width,
                    "height": height,
                    "content": [scale(c, width, height) for c in pdf["content"]],
                }
            )

    parted = media.repartition(F.col("media_id"))
    return parted.mapInPandas(run, _RESIZED_SCHEMA)


def ahash_from_pixels(px: "list[int]", grid: int = 64) -> int | None:
    """Pure aHash core (shared by the UDF and the property suite): resample
    ``px`` into ``grid`` cells, threshold each cell mean against the global
    mean, pack bits little-endian, return as a SIGNED 64-bit value (the
    column type). ``None`` when fewer than ``grid`` pixels exist."""
    n = len(px)
    if n < grid:
        return None
    total_mean = sum(px) / n
    h = 0
    for j in range(grid):
        cell = px[j * n // grid : (j + 1) * n // grid]
        if sum(cell) / len(cell) >= total_mean:
            h |= 1 << j
    # two's-complement into a signed 64-bit long for the column
    if h >= 1 << 63:
        h -= 1 << 64
    return h


def media_average_hash(
    media: DataFrame,
    pixel_fn: Callable[[bytes], "list[int]"] | None = None,
    grid: int = 64,
    strict: bool = False,
) -> DataFrame:
    """Perceptual average-hash (aHash) per media row -> (media_id, ahash).

    The REAL aHash algorithm — resample the pixel stream to ``grid`` cells,
    threshold each cell's mean against the global mean, pack the bits into
    one 64-bit integer — with the pixel source pluggable like every codec
    step in this module: pass ``pixel_fn`` (bytes -> grayscale pixel list,
    PIL-backed in a real runtime); the default uses the media row's raw
    content bytes as the "pixel" stream (deterministic, codec-free — the
    grid/threshold/pack stages are exactly what a real pipeline runs).
    ``strict=True`` raises instead of falling back.

    Rows with fewer than ``grid`` pixels yield a NULL hash (no stable
    signature exists; filter them before pairing — a shared sentinel would
    band every tiny asset together). Feed the result to
    ``dedup.hamming_near_dup_pairs`` for near-duplicate detection: byte-
    identical assets hash equal, small edits flip few bits."""
    if grid <= 0 or grid > 64:
        raise ValueError(f"grid must be in 1..64, got {grid}")
    if strict and pixel_fn is None:
        raise NotImplementedError(
            "no media codec available: pass pixel_fn= (PIL-backed) or use "
            "the raw-bytes stand-in (strict=False)"
        )
    pixels = pixel_fn or (lambda b: list(b or b""))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [ahash_from_pixels(pixels(c), grid) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    # nullable Int64, NOT a plain list: one None (short
                    # asset) would coerce the column to float64 and round
                    # every 64-bit hash to 53-bit float precision
                    "ahash": pd.array(hashes, dtype="Int64"),
                }
            )

    return media.mapInPandas(
        run, schema="media_id long, ahash long"
    )
