"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition sizing, Arrow batch shape,
mapInPandas signature) is real and tested. Decode depth by format:
PNG header + FULL pixel decode are real (pure stdlib — io/png.py: zlib
inflate + per-row unfilter), feeding a real 8x8 average-hash into the
``phash`` feature; JPEG/GIF header parsing is real (decode_image_header)
but their PIXEL decode needs a codec library not in this sandbox — those
payloads keep the deterministic ``_decode_image_stub`` fallback (swap in
PIL/ffmpeg in deployment, nothing else moves).

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
        T.StructField("fmt", T.StringType(), True),  # png|jpeg|gif|None
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_entropy", T.DoubleType(), True),
        T.StructField("phash", T.LongType(), True),  # perceptual-hash slot
    ]
)


def decode_image_header(data: bytes) -> tuple[str, int, int] | None:
    """REAL (format, width, height) from the container header — pure-Python
    byte parsing, no codec library needed, which covers the dominant
    dimension/aspect-ratio filters of an image-curation pipeline without
    decoding pixels (pixel decode stays behind the PIL gate below).

    Recognizes PNG (IHDR), JPEG (SOF0/1/2/... marker scan, DHT/DAC/JPG
    excluded), GIF87a/89a (logical screen descriptor). Returns None for
    anything else — truncated or alien payloads never raise.
    """
    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n":
        # first chunk must be IHDR: 4B length, 4B type, then width/height BE
        if data[12:16] == b"IHDR":
            w = int.from_bytes(data[16:20], "big")
            h = int.from_bytes(data[20:24], "big")
            return ("png", w, h)
        return None
    if len(data) >= 4 and data[:2] == b"\xff\xd8":
        i = 2
        n = len(data)
        while i + 3 < n:
            if data[i] != 0xFF:
                return None  # lost marker sync
            marker = data[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers, no length field
                continue
            if marker == 0xD9:  # EOI before any SOF
                return None
            seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
            if seg_len < 2:
                return None
            # SOFn carry dimensions; C4=DHT, C8=JPG, CC=DAC do not
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > n:
                    return None
                h = int.from_bytes(data[i + 5 : i + 7], "big")
                w = int.from_bytes(data[i + 7 : i + 9], "big")
                return ("jpeg", w, h)
            i += 2 + seg_len
        return None
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(data[6:8], "little")
        h = int.from_bytes(data[8:10], "little")
        return ("gif", w, h)
    return None


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
    out; the binary column never leaves the map stage.

    Dimensions come from the REAL container header when the payload is a
    recognizable PNG/JPEG/GIF (decode_image_header — fmt says which);
    unrecognized payloads fall back to the deterministic stub (fmt null),
    keeping the batch shape testable on arbitrary synthetic bytes."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        from shovel_spark.io.png import average_hash64, decode_png_pixels

        for pdf in batches:
            out = {"media_id": [], "fmt": [], "width": [], "height": [], "n_bytes": [], "byte_entropy": [], "phash": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(data) if data is not None else b""
                hdr = decode_image_header(raw)
                if hdr is not None:
                    fmt, w, h = hdr
                else:
                    fmt = None
                    w, h = _decode_image_stub(raw)
                counts: dict[int, int] = {}
                for b in raw[:4096]:
                    counts[b] = counts.get(b, 0) + 1
                n = min(len(raw), 4096)
                ent = -sum((c / n) * math.log2(c / n) for c in counts.values()) if n else None
                # REAL perceptual hash when the payload fully decodes
                # (PNG: stdlib zlib + unfilter, io/png.py); anything that
                # does NOT decode to pixels gets NULL. A byte-prefix
                # fallback here would be a near-constant (every PNG shares
                # the 8-byte signature, every JFIF JPEG the same prefix),
                # so phash-equality dedup would silently collapse unrelated
                # undecodable images into one cluster. NULL lets dedup skip
                # them explicitly instead.
                ph = None
                if fmt == "png":
                    px = decode_png_pixels(raw)
                    if px is not None:
                        ph = average_hash64(px[3], px[0], px[1], px[2])
                out["media_id"].append(mid)
                out["fmt"].append(fmt)
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


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("fmt", T.StringType(), True),  # 'wav' | None
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("bits", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("dur_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def _parse_wav(
    data: bytes,
) -> tuple[int, int, int, int, bytes] | None:
    """Shared RIFF/WAVE chunk walk: (channels, sample_rate, bits,
    block_align, data_chunk_bytes) for a complete PCM WAV, else None.
    A chunk declaring more bytes than the payload holds (truncated file)
    is rejected — trusting the declared size would fabricate durations and
    sample counts for half a file."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    n = len(data)
    channels = sample_rate = bits = block_align = None
    body = None
    while pos + 8 <= n:
        tag = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        if pos + 8 + size > n:
            return None  # truncated inside this chunk
        chunk = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            if size < 16:
                return None
            audio_format = int.from_bytes(chunk[0:2], "little")
            if audio_format != 1:  # PCM only; compressed needs a codec lib
                return None
            channels = int.from_bytes(chunk[2:4], "little")
            sample_rate = int.from_bytes(chunk[4:8], "little")
            block_align = int.from_bytes(chunk[12:14], "little")
            bits = int.from_bytes(chunk[14:16], "little")
        elif tag == b"data":
            body = chunk
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if None in (channels, sample_rate, bits, block_align) or body is None:
        return None
    if not channels or not sample_rate or not block_align:
        return None
    return (channels, sample_rate, bits, block_align, body)


def decode_wav_header(data: bytes) -> tuple[int, int, int, int, int] | None:
    """REAL (channels, sample_rate, bits, n_frames, dur_ms) from a RIFF/WAVE
    container — pure byte parsing (chunk walk with word-alignment padding,
    PCM 'fmt ' + 'data' chunks), the audio sibling of decode_image_header.
    Covers the duration/sample-rate/channel filters an audio-curation
    pipeline runs WITHOUT decoding samples. None for non-WAV, compressed
    (non-PCM), or truncated payloads — never raises."""
    parsed = _parse_wav(data)
    if parsed is None:
        return None
    channels, sample_rate, bits, block_align, body = parsed
    n_frames = len(body) // block_align
    dur_ms = n_frames * 1000 // sample_rate
    return (channels, sample_rate, bits, n_frames, dur_ms)


def decode_wav_samples(data: bytes) -> tuple[int, int, int] | None:
    """REAL PCM sample decode — (n_samples, sum_sq, peak) over every sample
    in the data chunk (channels interleaved, all counted). 8-bit PCM is
    unsigned centered at 128 (sample = byte - 128, per the WAV spec);
    16-bit is little-endian signed. EXACT integer statistics, so a SQL
    oracle that knows the payload bytes replays them bit-for-bit; RMS and
    silence/clipping gates derive as sqrt(sum_sq / n_samples) and
    peak-threshold filters. None for anything _parse_wav rejects, other
    bit depths, or a data chunk misaligned to the sample width."""
    parsed = _parse_wav(data)
    if parsed is None:
        return None
    _, _, bits, _, body = parsed
    import numpy as np

    if bits == 8:
        samples = np.frombuffer(body, dtype=np.uint8).astype(np.int64) - 128
    elif bits == 16:
        if len(body) % 2:
            return None
        samples = np.frombuffer(body, dtype="<i2").astype(np.int64)
    else:
        return None
    if samples.size == 0:
        return (0, 0, 0)
    return (
        int(samples.size),
        int(np.square(samples).sum()),
        int(np.abs(samples).max()),
    )


def build_wav_bytes(
    channels: int, sample_rate: int, bits: int, n_frames: int
) -> bytes:
    """A REAL, spec-correct PCM WAV: RIFF header, 16-byte fmt chunk, data
    chunk with a deterministic md5-derived payload of exactly
    ``n_frames * block_align`` bytes. Used by the synthetic generator so
    decode_wav_header (and any external tool) reads back the declared
    parameters from actual container bytes."""
    import hashlib

    block_align = channels * bits // 8
    data_size = n_frames * block_align
    seed = hashlib.md5(
        f"wav:{channels}:{sample_rate}:{bits}:{n_frames}".encode()
    ).digest()
    payload = (seed * (data_size // len(seed) + 1))[:data_size]
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block_align).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little") + fmt
        + b"data" + data_size.to_bytes(4, "little") + payload
        + (b"\0" if data_size & 1 else b"")
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def extract_audio_features(df: DataFrame) -> DataFrame:
    """mapInPandas audio metadata extraction — same plumbing contract as
    extract_image_features: iterator of Arrow batches, binary never
    leaves the map stage, unrecognized payloads yield NULL fields (rows
    are never dropped silently)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in AUDIO_FEATURES_SCHEMA.fields}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(data) if data is not None else b""
                hdr = decode_wav_header(raw)
                out["media_id"].append(mid)
                out["n_bytes"].append(len(raw))
                if hdr is None:
                    out["fmt"].append(None)
                    for k in ("channels", "sample_rate", "bits", "n_frames", "dur_ms"):
                        out[k].append(None)
                else:
                    ch, sr, bits, nf, dur = hdr
                    out["fmt"].append("wav")
                    out["channels"].append(ch)
                    out["sample_rate"].append(sr)
                    out["bits"].append(bits)
                    out["n_frames"].append(nf)
                    out["dur_ms"].append(dur)
            yield pd.DataFrame(out)

    return df.select("media_id", "data").mapInPandas(feats, AUDIO_FEATURES_SCHEMA)


AUDIO_PCM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sum_sq", T.LongType(), True),
        T.StructField("peak", T.LongType(), True),
    ]
)


def extract_audio_pcm_stats(df: DataFrame) -> DataFrame:
    """mapInPandas PCM sample statistics (decode_wav_samples): exact
    (n_samples, sum_sq, peak) per payload — the inputs to RMS loudness,
    silence, and clipping gates. Same plumbing contract as the other
    extractors: Arrow batches in, binary never leaves the map stage,
    undecodable payloads get NULL stats (rows never dropped silently)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "n_samples": [], "sum_sq": [], "peak": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(data) if data is not None else b""
                s = decode_wav_samples(raw)
                out["media_id"].append(mid)
                out["n_samples"].append(None if s is None else s[0])
                out["sum_sq"].append(None if s is None else s[1])
                out["peak"].append(None if s is None else s[2])
            yield pd.DataFrame(out)

    return df.select("media_id", "data").mapInPandas(stats, AUDIO_PCM_SCHEMA)


def synth_wav_media(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(media_id, data): real PCM WAV containers whose parameters are a
    pure function of the id — channels 1+(id%2), sample_rate
    8000+(id%5)*4000, bits 8 or 16 (id%3==0), n_frames 1000+(id%7)*500 —
    so a SQL oracle recomputes the expected metadata arithmetically while
    the Spark side must PARSE it back out of the RIFF bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "data": []}
            for mid in pdf[id_col]:
                mid = int(mid)
                out["media_id"].append(mid)
                out["data"].append(
                    build_wav_bytes(
                        channels=1 + mid % 2,
                        sample_rate=8000 + (mid % 5) * 4000,
                        bits=8 if mid % 3 == 0 else 16,
                        n_frames=1000 + (mid % 7) * 500,
                    )
                )
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("data", T.BinaryType()),
        ]
    )
    return df.select(F.col(id_col)).mapInPandas(gen, schema)


def build_image_bytes(fmt: str, width: int, height: int, pad: bytes = b"") -> bytes:
    """A minimal REAL container header for ``fmt`` declaring the given
    dimensions, plus ``pad`` payload bytes — spec-correct where it counts
    (PNG IHDR with CRC, JPEG JFIF APP0 + SOF0 + EOI, GIF89a logical screen
    descriptor), so decode_image_header and any external tool agree on the
    dimensions. Used by the synthetic generator; NOT a full encoder."""
    import struct
    import zlib

    if fmt == "png":
        ihdr = struct.pack(">II", width, height) + bytes([8, 2, 0, 0, 0])
        chunk = b"IHDR" + ihdr
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + chunk
            + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
            + pad
        )
    if fmt == "jpeg":
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        sof0 = (
            b"\xff\xc0"
            + struct.pack(">HBHHB", 17, 8, height, width, 3)
            + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
        )
        return b"\xff\xd8" + app0 + sof0 + pad + b"\xff\xd9"
    if fmt == "gif":
        return (
            b"GIF89a"
            + struct.pack("<HH", width, height)
            + bytes([0xF7, 0, 0])
            + pad
        )
    raise ValueError(f"unknown fmt: {fmt!r}")


def synth_image_media(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(id, fmt, data) with REAL PNG/JPEG/GIF headers whose dimensions are a
    pure function of the id — fmt cycles id%3 (png, jpeg, gif), width =
    16 + (id%50)*8, height = 16 + ((id*7)%40)*8 — so a SQL oracle can
    recompute the expected dimensions arithmetically while the Spark side
    must actually PARSE them back out of the bytes (full Arrow round-trip:
    header built in one pandas UDF, decoded in extract_image_features)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        fmts = ["png", "jpeg", "gif"]
        for pdf in batches:
            out = {"media_id": [], "fmt": [], "data": []}
            for mid in pdf[id_col]:
                mid = int(mid)
                fmt = fmts[mid % 3]
                w = 16 + (mid % 50) * 8
                h = 16 + ((mid * 7) % 40) * 8
                pad = hashlib.sha256(f"media:{mid}".encode()).digest()
                out["media_id"].append(mid)
                out["fmt"].append(fmt)
                out["data"].append(build_image_bytes(fmt, w, h, pad))
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("data", T.BinaryType()),
        ]
    )
    return df.select(F.col(id_col)).mapInPandas(gen, schema)


def synth_png_block_images(
    df: DataFrame, id_col: str = "media_id", groups: int = 30
) -> DataFrame:
    """(media_id, ck, data): full REAL PNGs (IHDR + filtered/deflated IDAT
    + IEND, io/png.encode_png) whose 64x64 grayscale pixels are an 8x8
    block pattern driven by the CONTENT KEY ``ck = id % groups``: bit k
    (MSB-first) of the first 8 bytes of md5('img:' || ck) sets block k to
    255, else 0. The ENCODING varies by variant ``id // groups`` — scanline
    filter (variant % 5: None/Sub/Up/Average/Paeth) and zlib level — so
    ids sharing a ck have IDENTICAL pixels but DIFFERENT bytes: exact
    (byte-hash) dedup cannot group them; only real pixel decode can.

    By construction ``average_hash64(pixels) == int64(md5('img:'||ck)[:8])``
    (each 8x8 block downsamples to exactly its 0/255 value; 255 > mean iff
    the md5 prefix isn't all-ones, 0 > mean never) — so a SQL oracle
    recomputes the expected phash arithmetically from md5 while the Spark
    side must actually inflate, unfilter, and hash the bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from shovel_spark.io.png import encode_png

        for pdf in batches:
            out = {"media_id": [], "ck": [], "data": []}
            for mid in pdf[id_col]:
                mid = int(mid)
                ck = mid % groups
                bits = hashlib.md5(f"img:{ck}".encode()).digest()[:8]
                px = bytearray(64 * 64)
                for k in range(64):
                    if bits[k // 8] & (1 << (7 - k % 8)):
                        bi, bj = divmod(k, 8)
                        for y in range(bi * 8, bi * 8 + 8):
                            px[y * 64 + bj * 8 : y * 64 + bj * 8 + 8] = b"\xff" * 8
                variant = mid // groups
                data = encode_png(
                    64, 64, bytes(px),
                    color_type=0,
                    filter_type=variant % 5,
                    level=1 + (variant % 3) * 4,
                )
                out["media_id"].append(mid)
                out["ck"].append(ck)
                out["data"].append(data)
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("ck", T.LongType()),
            T.StructField("data", T.BinaryType()),
        ]
    )
    return df.select(F.col(id_col)).mapInPandas(gen, schema)


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
