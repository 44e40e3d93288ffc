"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus typed metadata structs. The Spark
side — schemas, partition-sized Arrow batches through ``mapInPandas``,
deterministic partitioning by content hash — is real and tested; the codec
step is stubbed (decode libraries are not in this container) behind
``decode_stub=True`` which produces a deterministic fake decode from the
content hash, or raises NotImplementedError when a real decode is demanded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms long, content_sha string"
)

FEATURE_SCHEMA = "media_id long, content_sha string, feat array<float>, n_bytes long"


def attach_media_metadata(
    df: DataFrame, binary_col: str, id_col: str, kind: str, mime: str
) -> DataFrame:
    """Standard media envelope: id, kind, mime, sizes unknown until decode,
    content hash for dedup/partitioning."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit(mime).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.sha2(F.col(binary_col), 256).alias("content_sha"),
        F.col(binary_col).alias("data"),
    )


def _be_int(col: Column, pos, nbytes: int) -> Column:
    """Big-endian unsigned int from ``nbytes`` bytes at 1-based ``pos``
    (literal or Column) of a binary column — pure JVM expressions."""
    pos = pos if isinstance(pos, Column) else F.lit(pos)
    return F.conv(F.hex(col.substr(pos, F.lit(nbytes))), 16, 10).cast("long")


_PNG_SIG = "89504E470D0A1A0A"
_JPEG_SOF_MARKERS = [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB]


def image_header_meta(
    df: DataFrame, binary_col: str, id_col: str, max_jpeg_segments: int = 24
) -> DataFrame:
    """Image format/width/height parsed from raw header bytes — no codec,
    no UDF, all JVM expressions (hex/conv/substr folds), so it runs at full
    scan speed over a 100 TB binary column.

    - PNG: signature at bytes 1-8, IHDR width/height as big-endian uint32
      at fixed offsets 17/21 (PNG spec: 8-byte signature + 8-byte chunk
      header + IHDR payload).
    - JPEG: SOI ``FFD8`` then a marker-segment walk (marker ``FF xx`` +
      big-endian length including itself) until a start-of-frame marker
      (SOF0-3/5-7/9-11), whose payload is [precision u8, height u16,
      width u16]. The walk is an ``F.aggregate`` fold over a bounded
      ``sequence`` (``max_jpeg_segments`` steps), carrying (pos, w, h)
      through a struct accumulator — a loop expressed as a Catalyst fold.
    - anything else: format 'unknown', null dims.

    Output: (id, format string, width int, height int).
    """
    b = F.col(binary_col)
    is_png = F.hex(b.substr(F.lit(1), F.lit(8))) == _PNG_SIG
    is_jpeg = F.hex(b.substr(F.lit(1), F.lit(2))) == "FFD8"

    png_w = _be_int(b, 17, 4)
    png_h = _be_int(b, 21, 4)

    zero = F.struct(
        F.lit(3).cast("long").alias("pos"),
        F.lit(None).cast("long").alias("w"),
        F.lit(None).cast("long").alias("h"),
    )

    def step(acc, _):
        pos = acc["pos"]
        valid = (acc["w"].isNull()) & (pos + 3 <= F.length(b)) & (
            _be_int(b, pos, 1) == 0xFF
        )
        marker = _be_int(b, pos + 1, 1)
        is_sof = valid & marker.isin([F.lit(m) for m in _JPEG_SOF_MARKERS])
        seg_len = _be_int(b, pos + 2, 2)
        return F.struct(
            F.when(valid & ~is_sof, pos + 2 + seg_len).otherwise(pos).alias("pos"),
            F.when(is_sof, _be_int(b, pos + 7, 2)).otherwise(acc["w"]).alias("w"),
            F.when(is_sof, _be_int(b, pos + 5, 2)).otherwise(acc["h"]).alias("h"),
        )

    jpeg_acc = F.aggregate(
        F.sequence(F.lit(1), F.lit(max_jpeg_segments)), zero, step
    )

    fmt = (
        F.when(is_png, F.lit("png"))
        .when(is_jpeg, F.lit("jpeg"))
        .otherwise(F.lit("unknown"))
    )
    # two-phase projection: the w/h references would otherwise each
    # clone the interpreted marker-walk fold (see audio_header_meta)
    base = df.select(F.col(id_col), b, jpeg_acc.alias("__acc"))
    accf = F.col("__acc")
    width = F.when(is_png, png_w).when(is_jpeg, accf["w"])
    height = F.when(is_png, png_h).when(is_jpeg, accf["h"])
    return base.select(
        F.col(id_col),
        fmt.alias("format"),
        width.cast("int").alias("width"),
        height.cast("int").alias("height"),
    )


def extract_features(
    media: DataFrame,
    feat_dim: int = 8,
    decode_stub: bool = True,
) -> DataFrame:
    """Arrow-batched feature extraction over media binaries.

    Real pipeline shape: ``mapInPandas`` so each task decodes a batch of
    binaries without a per-row Python round trip. The stub derives a
    deterministic pseudo-feature vector from the sha256 so tests can assert
    end-to-end plumbing (schema, batching, partitioning) without codecs.
    """
    if not decode_stub:
        raise NotImplementedError(
            "real media decode requires image/audio codecs not present in "
            "this environment; run with decode_stub=True"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for sha in pdf["content_sha"]:
                # deterministic fake: bytes of the sha -> floats in [0, 1)
                feats.append(
                    [int(sha[i * 2 : i * 2 + 2], 16) / 256.0 for i in range(feat_dim)]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content_sha": pdf["content_sha"],
                    "feat": feats,
                    "n_bytes": [len(d) for d in pdf["data"]],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_plan(
    media: DataFrame, width: int, height: int, decode_stub: bool = True
) -> DataFrame:
    """Resize step for image media: plumbing is real (Arrow batches through
    mapInPandas, output schema with target dims), the pixel work is the
    stubbed codec step — the stub echoes content identity so downstream
    dedup/feature tests can run without imaging libraries."""
    if not decode_stub:
        raise NotImplementedError(
            "real image resize requires imaging codecs not present in this "
            "environment; run with decode_stub=True"
        )

    schema = "media_id long, content_sha string, width int, height int, data binary"

    def run(batches):
        for pdf in batches:
            out = pdf[["media_id", "content_sha", "data"]].copy()
            out["width"] = width
            out["height"] = height
            yield out[["media_id", "content_sha", "width", "height", "data"]]

    return media.select("media_id", "content_sha", "data").mapInPandas(run, schema=schema)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """Frame-sampling plan rows for video media: (media_id, frame_idx, ts_ms).

    Pure JVM sequence expansion — the decode of each planned frame is the
    stubbed step. Bounded by ``max_frames`` per media row.
    """
    return media.select(
        "media_id",
        F.posexplode(
            F.sequence(F.lit(0), F.lit(max_frames - 1))
        ).alias("frame_idx", "_i"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).cast("long").alias("ts_ms"),
    )


def _le_int(col: Column, pos, nbytes: int) -> Column:
    """Little-endian unsigned int from ``nbytes`` bytes at 1-based ``pos``."""
    pos = pos if isinstance(pos, Column) else F.lit(pos)
    total = None
    for i in range(nbytes):
        term = _be_int(col, pos + i, 1) * (256 ** i)
        total = term if total is None else total + term
    return total


def audio_header_meta(
    df: DataFrame, binary_col: str, id_col: str, max_chunks: int = 8
) -> DataFrame:
    """Audio (WAV/RIFF) format metadata from raw header bytes — no codec,
    no UDF, all JVM expressions, full scan speed over a binary column.

    The audio twin of ``image_header_meta``: RIFF container check
    (``RIFF....WAVE``), then a chunk walk (id[4] + LE-u32 size, odd sizes
    padded) expressed as an ``F.aggregate`` fold over a bounded
    ``sequence`` carrying (pos, fmt_offset, data_bytes). The ``fmt ``
    chunk yields channels / sample_rate / byte_rate / bits_per_sample
    (LE at fixed payload offsets per the WAVE spec); the ``data`` chunk
    size plus byte_rate gives the duration without reading a single
    sample byte. Non-RIFF inputs come back format='unknown', null fields.

    Output: (id, format, channels, sample_rate, bits_per_sample,
    data_bytes, duration_ms).
    """
    b = F.col(binary_col)
    is_wav = (F.hex(b.substr(F.lit(1), F.lit(4))) == "52494646") & (
        F.hex(b.substr(F.lit(9), F.lit(4))) == "57415645"
    )

    zero = F.struct(
        F.lit(13).cast("long").alias("pos"),
        F.lit(None).cast("long").alias("fmt_off"),
        F.lit(None).cast("long").alias("data_bytes"),
    )

    def step(acc, _):
        pos = acc["pos"]
        readable = pos + 8 - 1 <= F.length(b)
        cid = F.hex(b.substr(pos, F.lit(4)))
        size = _le_int(b, pos + 4, 4)
        is_fmt = readable & (cid == "666D7420") & acc["fmt_off"].isNull()
        is_data = readable & (cid == "64617461") & acc["data_bytes"].isNull()
        # chunks pad to even lengths (RIFF rule)
        nxt = pos + 8 + size + (size % 2)
        return F.struct(
            F.when(readable, nxt).otherwise(pos).alias("pos"),
            F.when(is_fmt, pos + 8).otherwise(acc["fmt_off"]).alias("fmt_off"),
            F.when(is_data, size).otherwise(acc["data_bytes"]).alias("data_bytes"),
        )

    acc = F.aggregate(F.sequence(F.lit(1), F.lit(max_chunks)), zero, step)
    # evaluate the interpreted chunk-walk fold ONCE per row: the final
    # projection references the accumulator ~7x (fmt_off feeds four
    # field reads, data_bytes two), and each reference would clone the
    # whole fold tree — higher-order functions are CodegenFallback, so
    # nothing deduplicates them. A separate projection materializes the
    # struct; CollapseProject keeps multi-referenced non-cheap aliases
    # in their own Project. (multimodal_audio measured 1.73 s -> 0.64 s
    # in the r14 alternating A/B — this fix plus the SQL-text fixture
    # build in the entry query.)
    base = df.select(F.col(id_col), b, acc.alias("__acc"))
    accf = F.col("__acc")
    fmt_off = F.when(is_wav, accf["fmt_off"])
    channels = _le_int(b, fmt_off + 2, 2)
    sample_rate = _le_int(b, fmt_off + 4, 4)
    byte_rate = _le_int(b, fmt_off + 8, 4)
    bits = _le_int(b, fmt_off + 14, 2)
    data_bytes = F.when(is_wav, accf["data_bytes"])
    duration_ms = F.when(
        byte_rate > 0, F.floor(data_bytes * 1000 / byte_rate)
    )
    return base.select(
        F.col(id_col),
        F.when(is_wav, F.lit("wav")).otherwise(F.lit("unknown")).alias("format"),
        channels.cast("int").alias("channels"),
        sample_rate.cast("int").alias("sample_rate"),
        bits.cast("int").alias("bits_per_sample"),
        data_bytes.cast("long").alias("data_bytes"),
        duration_ms.cast("long").alias("duration_ms"),
    )


def video_container_meta(
    df: DataFrame, binary_col: str, id_col: str, max_boxes: int = 8
) -> DataFrame:
    """Video (ISO BMFF / MP4) container metadata from raw header bytes —
    the video leg of the image/audio/video metadata triad, same
    no-codec/no-UDF contract.

    Parses the ``ftyp`` box (major brand + minor version) and walks the
    top-level box sequence (BE-u32 size + 4-char type; ``size==1`` means
    a 64-bit extended size; ``size==0`` means the box extends to the end
    of the file — legal and common for a trailing ``mdat``, recorded and
    then the walk terminates) as a bounded ``F.aggregate`` fold to report
    whether a ``moov`` (metadata) and ``mdat`` (media data) box are
    present in the scanned prefix — the cheap structural-integrity signal
    a pipeline uses to drop truncated clips before decode. Duration needs
    the nested ``mvhd`` payload and a real demuxer; out of scope by
    design (the decode stub documents the boundary).

    Output: (id, format, major_brand, minor_version, has_moov, has_mdat).
    """
    b = F.col(binary_col)
    is_mp4 = F.hex(b.substr(F.lit(5), F.lit(4))) == "66747970"  # 'ftyp'
    brand = F.when(is_mp4, b.substr(F.lit(9), F.lit(4)).cast("string"))
    minor = F.when(is_mp4, _be_int(b, 13, 4))

    zero = F.struct(
        F.lit(1).cast("long").alias("pos"),
        F.lit(False).alias("moov"),
        F.lit(False).alias("mdat"),
    )

    def step(acc, _):
        pos = acc["pos"]
        readable = pos + 8 - 1 <= F.length(b)
        size = _be_int(b, pos, 4)
        btype = F.hex(b.substr(pos + 4, F.lit(4)))
        # size==1: 64-bit largesize follows the type (use its low half —
        # a >2^63-byte box is not a real file); size==0: box runs to end
        # of file (span = remaining bytes, >= 8 whenever the header was
        # readable, so the box is recorded and the walk ends past EOF)
        span = (
            F.when(size == 1, _be_int(b, pos + 12, 4))
            .when(size == 0, F.length(b) - pos + 1)
            .otherwise(size)
        )
        ok = readable & (span >= 8)
        return F.struct(
            F.when(ok, pos + span).otherwise(pos).alias("pos"),
            (acc["moov"] | (ok & (btype == "6D6F6F76"))).alias("moov"),
            (acc["mdat"] | (ok & (btype == "6D646174"))).alias("mdat"),
        )

    acc = F.aggregate(F.sequence(F.lit(1), F.lit(max_boxes)), zero, step)
    # two-phase projection: moov/mdat would each clone the interpreted
    # box-walk fold (see audio_header_meta)
    base = df.select(F.col(id_col), b, acc.alias("__acc"))
    accf = F.col("__acc")
    return base.select(
        F.col(id_col),
        F.when(is_mp4, F.lit("mp4")).otherwise(F.lit("unknown")).alias("format"),
        brand.alias("major_brand"),
        minor.cast("long").alias("minor_version"),
        F.when(is_mp4, accf["moov"]).alias("has_moov"),
        F.when(is_mp4, accf["mdat"]).alias("has_mdat"),
    )
