"""Multimodal plumbing: schema, mapInPandas batch shape, deterministic stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shovel_spark.io import multimodal as mm


def test_feature_extraction_shape_and_determinism(spark):
    media = mm.synth_media(spark, n=60, seed=9)
    f1 = mm.extract_image_features(media).sort("media_id").collect()
    f2 = mm.extract_image_features(media).sort("media_id").collect()
    assert f1 == f2  # deterministic stub decode
    assert len(f1) == 60
    r = f1[0]
    assert r.n_bytes == 256  # 4 × sha2-hex(64)
    assert r.width % 32 == 0 and r.height % 32 == 0
    assert 0 < r.byte_entropy <= 8.0
    # Undecodable payloads get NULL phash (a byte-prefix fallback would be
    # a near-constant — format signature bytes — and phash-equality dedup
    # would collapse unrelated images into one cluster).
    assert all(r.phash is None for r in f1)


def test_binary_column_not_in_feature_output(spark):
    media = mm.synth_media(spark, n=5)
    cols = mm.extract_image_features(media).columns
    assert "data" not in cols  # media bytes never enter a shuffle


def test_resize_plumbing_deterministic_fake(spark):
    """Resize: real mapInPandas plumbing, fake codec — output payloads are
    exactly width*height bytes, deterministic, metadata updated."""
    media = mm.synth_media(spark, n=3)
    out = mm.resize_images(media, 32, 16).collect()
    assert len(out) == 3
    assert all(len(bytes(r.data)) == 32 * 16 for r in out)
    assert all((r.width, r.height) == (32, 16) for r in out)
    again = mm.resize_images(mm.synth_media(spark, n=3), 32, 16).collect()
    assert sorted(bytes(r.data) for r in out) == sorted(bytes(r.data) for r in again)


def test_video_frame_sampling_fanout(spark):
    media = mm.synth_media(spark, n=30).filter(F.col("kind") == "video")
    n_videos = media.count()
    frames = mm.sample_video_frames(media)
    assert frames.count() > n_videos  # 1→N fan-out
    assert set(frames.columns) == {"media_id", "frame_idx", "mime"}


def test_read_media_dir_binary_file_source(spark, tmp_path):
    """binaryFile source → MEDIA_SCHEMA rows (the reference's raw binary
    chunk input, src/core/readers/raw.js): one row per file, payload bytes
    intact, provenance in meta; the same source opens as a stream."""
    (tmp_path / "a.bin").write_bytes(b"\x00\x01payload-a")
    (tmp_path / "b.bin").write_bytes(b"payload-b")
    (tmp_path / "skip.txt").write_text("not media")

    from shovel_spark.io.multimodal import extract_image_features, read_media_dir

    media = read_media_dir(spark, str(tmp_path), kind="image", glob="*.bin")
    rows = media.collect()
    assert len(rows) == 2
    by_name = {r.meta["path"].rsplit("/", 1)[-1]: r for r in rows}
    assert bytes(by_name["a.bin"].data) == b"\x00\x01payload-a"
    assert by_name["b.bin"].meta["length"] == "9"
    assert all(r.kind == "image" and r.mime == "application/x-image" for r in rows)

    feats = extract_image_features(media).collect()
    assert {f.n_bytes for f in feats} == {11, 9}

    streamed = read_media_dir(spark, str(tmp_path), glob="*.bin", stream=True)
    assert streamed.isStreaming


def test_decode_image_header_golden_pairs():
    """Pure-Python header parsers against spec-built bytes and hostile
    inputs — no Spark needed."""
    from shovel_spark.io.multimodal import build_image_bytes, decode_image_header

    assert decode_image_header(build_image_bytes("png", 640, 480)) == ("png", 640, 480)
    assert decode_image_header(build_image_bytes("jpeg", 1920, 1080)) == ("jpeg", 1920, 1080)
    assert decode_image_header(build_image_bytes("gif", 320, 200)) == ("gif", 320, 200)
    # payload bytes after the header don't confuse the parse
    assert decode_image_header(build_image_bytes("png", 8, 8, b"\xff" * 100)) == ("png", 8, 8)
    # JPEG: SOF dims found even with APP0 in front (marker scan, not offset)
    jp = build_image_bytes("jpeg", 33, 77, b"scan-data-here")
    assert decode_image_header(jp) == ("jpeg", 33, 77)
    # hand-built GIF87a little-endian screen descriptor
    gif87 = b"GIF87a" + (12345).to_bytes(2, "little") + (11).to_bytes(2, "little") + b"\0\0\0"
    assert decode_image_header(gif87) == ("gif", 12345, 11)
    # hostile / non-image inputs: None, never raise
    assert decode_image_header(b"") is None
    assert decode_image_header(b"plain old text payload") is None
    assert decode_image_header(b"\x89PNG\r\n\x1a\n1234IHDRtrunc"[:20]) is None
    assert decode_image_header(b"\xff\xd8\xff") is None          # truncated JPEG
    assert decode_image_header(b"\xff\xd8\x00\x00garbage") is None  # lost sync
    assert decode_image_header(b"GIF89a\x01") is None  # truncated GIF


def test_extract_image_features_real_headers(spark):
    """extract_image_features parses REAL dimensions from synthetic headers
    (fmt set), and still stubs unrecognized payloads (fmt null)."""
    from shovel_spark.io.multimodal import extract_image_features, synth_image_media

    media = synth_image_media(spark.range(30), id_col="id")
    feats = extract_image_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        mid = r.media_id
        assert r.fmt == ["png", "jpeg", "gif"][mid % 3]
        assert r.width == 16 + (mid % 50) * 8
        assert r.height == 16 + ((mid * 7) % 40) * 8
    # unrecognized payload → stub fallback, fmt null
    junk = spark.createDataFrame([(999, bytearray(b"not an image"))], "media_id long, data binary")
    (jr,) = extract_image_features(junk).collect()
    assert jr.fmt is None and jr.width == 64 + (ord("n") % 16) * 32


def test_png_roundtrip_all_filters():
    """encode_png -> decode_png_pixels is the identity for every scanline
    filter type, grayscale and RGB, across zlib levels — the unfilter path
    (sub/up/average/paeth) must reconstruct exact bytes."""
    import hashlib

    from shovel_spark.io.png import decode_png_pixels, encode_png

    w, h = 13, 9  # deliberately not multiples of anything
    gray = bytes(
        hashlib.sha256(b"px" + bytes([i])).digest()[0] for i in range(w * h)
    )
    rgb = bytes(
        hashlib.sha256(b"rgb" + bytes([i % 251, i // 251])).digest()[0]
        for i in range(w * h * 3)
    )
    for ftype in range(5):
        for level, (ctype, px) in [
            (1, (0, gray)), (6, (0, gray)), (9, (2, rgb)), (1, (2, rgb)),
        ]:
            data = encode_png(w, h, px, color_type=ctype, filter_type=ftype, level=level)
            got = decode_png_pixels(data)
            assert got is not None, (ftype, ctype)
            gw, gh, gc, gpx = got
            assert (gw, gh) == (w, h)
            assert gpx == px, f"filter {ftype} color {ctype}"


def test_png_golden_hand_computed():
    """A hand-checkable 8x8: left half 0, right half 255. The average-hash
    sets exactly the 4 right-column bits of every row: 0x0F0F0F0F0F0F0F0F."""
    from shovel_spark.io.png import average_hash64, decode_png_pixels, encode_png

    px = bytes(((255 if x >= 4 else 0) for y in range(8) for x in range(8)))
    data = encode_png(8, 8, px, filter_type=4)
    w, h, c, out = decode_png_pixels(data)
    assert out == px
    assert average_hash64(out, w, h, c) == 0x0F0F0F0F0F0F0F0F
    # all-equal pixels: no cell exceeds the mean -> hash 0
    flat = bytes(64)
    assert average_hash64(flat, 8, 8, 1) == 0
    # sub-8x8 images have no meaningful 8x8 downsample
    assert average_hash64(bytes(49), 7, 7, 1) is None


def test_png_decode_hostile_inputs():
    """Truncated/corrupt/unsupported payloads return None, never raise."""
    import struct
    import zlib as _z

    from shovel_spark.io.png import decode_png_pixels, encode_png

    good = encode_png(8, 8, bytes(64))
    assert decode_png_pixels(good) is not None
    assert decode_png_pixels(b"") is None
    assert decode_png_pixels(good[:30]) is None                  # truncated
    corrupt = bytearray(good)
    corrupt[-10] ^= 0xFF                                          # break IDAT body
    assert decode_png_pixels(bytes(corrupt)) is None              # CRC mismatch
    # palette color type (3) is out of scope -> None
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 3, 0, 0, 0)
    pal = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", _z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    assert decode_png_pixels(pal) is None
    # header-only PNG from build_image_bytes (no IDAT) -> None
    from shovel_spark.io.multimodal import build_image_bytes

    assert decode_png_pixels(build_image_bytes("png", 16, 16)) is None


def test_synth_png_variants_share_phash_across_encodings(spark):
    """Same content key => same phash even though the BYTES differ (filter
    strategy + zlib level vary by variant); different content keys =>
    distinct phashes; and the phash equals the md5-derived int64 the SQL
    oracle recomputes."""
    import hashlib

    from shovel_spark.io.multimodal import extract_image_features, synth_png_block_images
    from pyspark.sql import functions as F

    ids = spark.range(60).select(F.col("id").alias("media_id"))  # 30 cks x 2 variants
    media = synth_png_block_images(ids, groups=30)
    rows = media.select("media_id", "ck", F.md5("data").alias("bytes_md5")).collect()
    by_ck = {}
    for r in rows:
        by_ck.setdefault(r.ck, set()).add(r.bytes_md5)
    assert all(len(v) == 2 for v in by_ck.values()), "variants must differ in bytes"

    feats = {r.media_id: r.phash for r in extract_image_features(media).collect()}
    for mid, ph in feats.items():
        ck = mid % 30
        want = int.from_bytes(
            hashlib.md5(f"img:{ck}".encode()).digest()[:8], "big", signed=True
        )
        assert ph == want, (mid, ck)
    assert len({feats[m] for m in feats}) == 30  # 30 distinct contents


def test_wav_header_golden_and_hostile():
    """RIFF/WAVE parser: spec-built containers decode to their declared
    parameters (including odd-size word-alignment padding); truncated /
    compressed / alien payloads return None."""
    from shovel_spark.io.multimodal import build_wav_bytes, decode_wav_header

    assert decode_wav_header(build_wav_bytes(2, 44100, 16, 44100)) == (
        2, 44100, 16, 44100, 1000,
    )
    # odd data size (1ch x 8bit x odd frames) exercises the pad-byte path
    b = build_wav_bytes(1, 8000, 8, 1001)
    assert decode_wav_header(b) == (1, 8000, 8, 1001, 125)
    assert len(b) % 2 == 0  # word-aligned container
    assert decode_wav_header(b"") is None
    assert decode_wav_header(b"RIFF\x00\x00\x00\x00WAVE") is None  # no chunks
    assert decode_wav_header(b[:30]) is None                       # truncated
    # Truncated INSIDE the data chunk: the declared size exceeds the bytes
    # present, so trusting it would fabricate n_frames/dur_ms for half a file.
    assert decode_wav_header(b[:-500]) is None
    # non-PCM format code -> None (compressed audio needs a codec lib)
    nonpcm = bytearray(build_wav_bytes(1, 8000, 16, 100))
    nonpcm[20] = 3  # IEEE float format tag
    assert decode_wav_header(bytes(nonpcm)) is None
    # alien bytes
    assert decode_wav_header(b"GIF89a not audio at all padding") is None


def test_wav_samples_golden_and_hostile():
    """decode_wav_samples vs hand-computed stats from the known md5-seed
    payload, both bit depths; hostile/truncated inputs return None."""
    import hashlib
    import struct

    from shovel_spark.io.multimodal import build_wav_bytes, decode_wav_samples

    # 8-bit: payload bytes are the md5 seed tiled; samples = byte - 128
    b8 = build_wav_bytes(1, 8000, 8, 20)
    seed = hashlib.md5(b"wav:1:8000:8:20").digest()
    vals = [(seed * 2)[i % 16] - 128 for i in range(20)]
    assert decode_wav_samples(b8) == (
        20, sum(v * v for v in vals), max(abs(v) for v in vals)
    )

    # 16-bit LE signed, stereo (channels interleaved, all counted)
    b16 = build_wav_bytes(2, 16000, 16, 7)  # 7 frames x 2ch = 14 samples
    seed = hashlib.md5(b"wav:2:16000:16:7").digest()
    payload = (seed * 2)[:28]
    vals = list(struct.unpack("<14h", payload))
    assert decode_wav_samples(b16) == (
        14, sum(v * v for v in vals), max(abs(v) for v in vals)
    )

    assert decode_wav_samples(b"") is None
    assert decode_wav_samples(b16[:-5]) is None  # truncated data chunk
    assert decode_wav_samples(b"RIFF\x00\x00\x00\x00WAVE") is None
    nonpcm = bytearray(build_wav_bytes(1, 8000, 16, 10))
    nonpcm[20] = 3  # IEEE float tag — not PCM
    assert decode_wav_samples(bytes(nonpcm)) is None


def test_audio_pcm_stats_extractor(spark):
    """Arrow plumbing: undecodable payloads get NULL stats, decodable ones
    match the direct function, binary column stays in the map stage."""
    from shovel_spark.io import multimodal as mm

    rows = [(1, mm.build_wav_bytes(1, 8000, 8, 100)), (2, b"not audio")]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    out = {r.media_id: r for r in mm.extract_audio_pcm_stats(df).collect()}
    direct = mm.decode_wav_samples(rows[0][1])
    assert (out[1].n_samples, out[1].sum_sq, out[1].peak) == direct
    assert out[2].n_samples is None and out[2].sum_sq is None
    assert "data" not in mm.extract_audio_pcm_stats(df).columns
