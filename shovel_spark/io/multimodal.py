"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition sizing, Arrow batch shape,
mapInPandas signature) is real and tested; the actual media decode is stubbed
behind import-gates because the codec libraries are not in this sandbox —
swap ``_decode_image_stub`` for PIL/ffmpeg in deployment, nothing else moves.

Scale notes:
  - media bytes dominate row size → keep them OUT of shuffles: extract
    features first (map-only mapInPandas), then drop the binary column
    before any join/groupBy;
  - ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds Arrow batch
    memory: with ~1 MB media blobs, batches of 10k rows would be 10 GB —
    mapInPandas consumes an *iterator* of batches so the decoder never holds
    more than one batch;
  - partition sizing: media tables want much smaller
    ``spark.sql.files.maxPartitionBytes`` than text tables.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("data", T.BinaryType(), True),  # opaque payload
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_entropy", T.DoubleType(), True),
        T.StructField("phash", T.LongType(), True),  # perceptual-hash slot
    ]
)


def _decode_image_stub(data: bytes) -> tuple[int, int]:
    """Deterministic fake decoder (no PIL in this sandbox): derives a stable
    (width, height) from the payload bytes. Replace with::

        from PIL import Image; im = Image.open(io.BytesIO(data)); return im.size
    """
    if not data:
        return (0, 0)
    w = 64 + (data[0] % 16) * 32
    h = 64 + (data[-1] % 16) * 32
    return (w, h)


def extract_image_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one feature frame
    out; the binary column never leaves the map stage."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "n_bytes": [], "byte_entropy": [], "phash": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(data) if data is not None else b""
                w, h = _decode_image_stub(raw)
                counts: dict[int, int] = {}
                for b in raw[:4096]:
                    counts[b] = counts.get(b, 0) + 1
                n = min(len(raw), 4096)
                ent = -sum((c / n) * math.log2(c / n) for c in counts.values()) if n else None
                ph = int.from_bytes(raw[:8].ljust(8, b"\0"), "big", signed=True) if raw else None
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(raw))
                out["byte_entropy"].append(ent)
                out["phash"].append(ph)
            yield pd.DataFrame(out)

    return df.select("media_id", "data").mapInPandas(feats, IMAGE_FEATURES_SCHEMA)


def _resize_stub(data: bytes, width: int, height: int) -> bytes:
    """Deterministic FAKE resize (no PIL in this sandbox): emits a payload of
    exactly width*height bytes by tiling the input — stable, size-correct
    output so downstream batch shape / partition sizing is testable. In
    deployment replace with::

        im = Image.open(io.BytesIO(data)).resize((width, height))
        buf = io.BytesIO(); im.save(buf, 'PNG'); return buf.getvalue()
    """
    n = width * height
    if not data:
        return b"\0" * n
    reps = n // len(data) + 1
    return (bytes(data) * reps)[:n]


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: real pipeline shape (iterator-of-batches mapInPandas,
    binary in/binary out, metadata updated), fake codec (_resize_stub —
    clearly marked; swapping in PIL is the only change)."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "data": [], "width": [], "height": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(data) if data is not None else b""
                out["media_id"].append(mid)
                out["data"].append(_resize_stub(raw, width, height))
                out["width"].append(width)
                out["height"].append(height)
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("data", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    return df.select("media_id", "data").mapInPandas(do_resize, schema)


def sample_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing: 1→N fan-out (explode) of frame indices per
    video row, decode stubbed. Partitioning: repartition by media_id so one
    huge video can't skew a task."""
    frames = df.withColumn(
        "frame_idx",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest((F.length("data") / every_n).cast("int") % 64, F.lit(0)),
            )
        ),
    )
    return frames.repartition("media_id").select("media_id", "frame_idx", "mime")


def read_media_dir(
    spark, path: str, kind: str = "image", glob: str | None = None, stream: bool = False
) -> DataFrame:
    """Raw files on disk → MEDIA_SCHEMA rows via Spark's ``binaryFile``
    source — the batch analog of the reference's raw-chunk stream input
    (reference: src/core/readers/raw.js emits whole-payload binary chunks).

    Each file becomes one row: payload in ``data``, provenance (path,
    mtime, length) in ``meta``. ``stream=True`` uses readStream (the same
    source supports file-arrival streaming) for directory-watching intake.
    media_id is the stable hash of the path — deterministic across runs,
    like every other id here."""
    reader = (spark.readStream if stream else spark.read).format("binaryFile")
    if stream:
        # streaming file sources require an explicit schema; binaryFile's is fixed
        reader = reader.schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit(f"application/x-{kind}").alias("mime"),
        F.col("content").alias("data"),
        F.create_map(
            F.lit("path"), F.col("path"),
            F.lit("modification_time"), F.col("modificationTime").cast("string"),
            F.lit("length"), F.col("length").cast("string"),
        ).alias("meta"),
    )


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload from hashed ids)."""
    df = spark.range(n)
    data = F.encode(
        F.concat(*[F.sha2(F.concat(F.lit(f"{seed}:{i}:"), F.col("id").cast("string")), 256) for i in range(4)]),
        "UTF-8",
    ).cast("binary")
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.pmod(F.col("id"), 3) + 1).cast("int"))
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-"), kind).alias("mime"),
        data.alias("data"),
        F.create_map(F.lit("seed"), F.lit(str(seed))).alias("meta"),
    )
