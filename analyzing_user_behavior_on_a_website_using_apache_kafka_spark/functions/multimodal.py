"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as `binary` columns with typed
metadata travelling alongside (SURVEY §2.2 north-star). The Spark-side
plumbing — schema, Arrow batch shape, `mapInPandas` signature,
partitioning — is real and tested; the actual media decode is STUBBED
(`NotImplementedError`) because no image/audio libs exist in this
container. A deterministic fake "decoder" exercises the identical code
path for tests and the rows-only driver check.

Scale notes: media blobs ride the same parquet row groups as their
metadata; `mapInPandas` streams Arrow batches so one task never holds
more than `spark.sql.execution.arrow.maxRecordsPerBatch` blobs. Filters
on metadata columns prune row groups *before* blob bytes are read
(parquet column chunks are independent).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from ..serialization import pickle_module_by_value

# fake_decode_features ships to executor workers via mapInPandas —
# by-value pickling keeps it importable-path-independent
pickle_module_by_value(__name__)

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, checksum bigint, feature_dim int"
)


def decode_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Codec-format decoder stub — the production `mapInPandas` entry
    point for compressed media (JPEG/MP3/H.264), which requires
    PIL/librosa/av; those libraries are not available in this
    environment by design. Container formats the standard library CAN
    parse (uncompressed BMP, PCM WAV) decode for REAL through
    `decode_media_stdlib` below — the env boundary is the codecs, not
    the decode path.
    """
    raise NotImplementedError(
        "compressed-media decode requires image/audio libraries not "
        "present in this container; decode_media_stdlib handles BMP/WAV "
        "for real, fake_decode_features drives the plumbing-path tests"
    )


MEDIA_FEATURE_SCHEMA = (
    "doc_id bigint, mime string, "
    # image features (audio rows carry NULLs here)
    "width int, height int, mean_lum double, "
    # audio features (image rows carry NULLs here)
    "n_samples bigint, sample_rate int, n_channels int, rms double"
)


def _decode_bmp(b: bytes) -> dict:
    """REAL image decode, stdlib-only: 24bpp uncompressed (BI_RGB)
    Windows BMP. Rows are stored bottom-up, padded to 4-byte
    boundaries; pixels are BGR. Features: dimensions + mean luminance
    (ITU-R BT.601: 0.299 R + 0.587 G + 0.114 B)."""
    import struct

    import numpy as np

    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", b, 10)[0]
    width, height = struct.unpack_from("<ii", b, 18)
    planes, bpp, compression = struct.unpack_from("<HHI", b, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24bpp uncompressed BMP decodes stdlib-side "
            f"(got bpp={bpp}, compression={compression})"
        )
    stride = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(
        b, dtype=np.uint8, count=abs(height) * stride, offset=data_off
    ).reshape(abs(height), stride)[:, : width * 3]
    px = rows.reshape(abs(height), width, 3).astype(np.float64)
    if height > 0:  # bottom-up storage (the common case)
        px = px[::-1]
    lum = 0.299 * px[..., 2] + 0.587 * px[..., 1] + 0.114 * px[..., 0]
    return {
        "width": width,
        "height": abs(height),
        "mean_lum": float(lum.mean()),
    }


def _decode_wav(b: bytes) -> dict:
    """REAL audio decode, stdlib-only: PCM WAV via the `wave` module.
    16-bit signed samples; RMS normalized to full scale (a sine of
    amplitude A decodes to rms ≈ A/√2)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(b)) as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"only 16-bit PCM WAV decodes stdlib-side "
                f"(got sampwidth={w.getsampwidth()})"
            )
        frames = w.readframes(w.getnframes())
        pcm = np.frombuffer(frames, dtype="<i2").astype(np.float64)
        scaled = pcm / 32768.0
        return {
            "n_samples": w.getnframes(),
            "sample_rate": w.getframerate(),
            "n_channels": w.getnchannels(),
            "rms": float(np.sqrt(np.mean(scaled**2))),
        }


def decode_media_stdlib(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """REAL media decode over the production mapInPandas shape for the
    formats the standard library covers: `image/bmp` (24bpp BI_RGB) and
    `audio/wav` (16-bit PCM). Any other mime raises — compressed
    codecs genuinely need the external libraries `decode_media`
    documents, and a silent fallback here would disguise that boundary
    as a decoded row."""
    cols = [
        "width", "height", "mean_lum",
        "n_samples", "sample_rate", "n_channels", "rms",
    ]
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "mime": []} | {
            c: [] for c in cols
        }
        for doc_id, mime, payload in zip(
            pdf["doc_id"], pdf["mime"], pdf["payload"]
        ):
            if mime == "image/bmp":
                feats = _decode_bmp(payload)
            elif mime == "audio/wav":
                feats = _decode_wav(payload)
            else:
                raise NotImplementedError(
                    f"no stdlib decoder for {mime!r}; compressed media "
                    "goes through decode_media (external codecs)"
                )
            out["doc_id"].append(doc_id)
            out["mime"].append(mime)
            for c in cols:
                out[c].append(feats.get(c))
        yield pd.DataFrame(out)


def fake_decode_features(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic fake decoder with the production signature/schema.

    Features: payload byte length and a rolling additive checksum —
    stable across engines and runs, so tests can assert exact values.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "checksum": payloads.map(
                    lambda b: sum(b) % 1_000_003
                ).astype("int64"),
                "feature_dim": 64,
            }
        )


def with_binary_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + synthesized binary payload column (utf-8 of text) —
    stands in for image/audio bytes; the engine treats it opaquely."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/plain").alias("mime"),
            F.col("n_chars").cast("bigint").alias("raw_size"),
        ).alias("media_meta"),
    )


@query(
    "q_multimodal_cols",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5,
           'fake/plain' AS mime
    FROM documents
    """,
)
def q_multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary + struct metadata columns carried through relational ops.

    Round-trips a BinaryType payload and a nested StructType metadata
    column through projection/filter, then projects portable scalars
    (byte length, md5) for the oracle.
    """
    df = with_binary_payload(spark, sf_dir)
    return df.filter(F.col("media_meta.raw_size") > 0).select(
        "doc_id",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("media_meta.mime").alias("mime"),
    )


@query(
    "q_multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           CAST(COALESCE(list_sum(list_transform(
                    range(1, length(text) + 1),
                    i -> ascii(substr(text, i, 1)))), 0) % 1000003
                AS BIGINT) AS checksum,
           CAST(64 AS INT) AS feature_dim
    FROM documents
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full mapInPandas decode pipeline over Arrow batches (fake
    decoder standing in for the stubbed media decode — same signature,
    schema, and batch shape as `decode_media`).

    Oracle-able because the fake decoder is pure arithmetic over the
    utf-8 payload bytes: n_bytes = octet_length, checksum = byte-sum mod
    1000003. The fixture text is ASCII (asserted implicitly: a non-ASCII
    doc would diverge octet_length from char length and hash-mismatch),
    so DuckDB's per-char ``ascii()`` equals the per-byte sum."""
    df = with_binary_payload(spark, sf_dir).select("doc_id", "payload")
    return df.mapInPandas(fake_decode_features, schema=FEATURE_SCHEMA)


_FRAME_BYTES = 64  # fake frame = 64-byte slice of the payload
_FRAME_STRIDE = 4  # keep every 4th frame

FRAME_SCHEMA = "doc_id bigint, frame_no int, frame_bytes bigint, frame_crc bigint"


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """1→N frame sampling with the production mapInPandas shape.

    A video decoder would emit one row per sampled frame; the fake
    treats each _FRAME_BYTES slice of the payload as a "frame" and keeps
    every _FRAME_STRIDE-th one. The row-expansion plumbing (one input
    row → variable output rows inside an Arrow batch) is exactly what a
    real av/ffmpeg-backed sampler needs.
    """
    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [],
            "frame_no": [],
            "frame_bytes": [],
            "frame_crc": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = max(1, len(payload) // _FRAME_BYTES)
            for frame_no in range(0, n_frames, _FRAME_STRIDE):
                chunk = payload[
                    frame_no * _FRAME_BYTES : (frame_no + 1) * _FRAME_BYTES
                ]
                out["doc_id"].append(doc_id)
                out["frame_no"].append(frame_no)
                out["frame_bytes"].append(len(chunk))
                out["frame_crc"].append(sum(chunk) % 1_000_003)
        yield pd.DataFrame(out)


@query(
    "q_multimodal_framesample",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             octet_length(CAST(text AS BLOB)) AS len_b,
             greatest(1, octet_length(CAST(text AS BLOB)) // 64) AS n_frames
      FROM documents
    ),
    s AS (
      SELECT doc_id, len_b, (n_frames + 3) // 4 AS n_sampled FROM m
    )
    SELECT doc_id,
           CAST(n_sampled AS BIGINT) AS n_sampled_frames,
           CAST(CASE WHEN len_b >= 64 THEN 64 * n_sampled ELSE len_b END
                AS BIGINT) AS sampled_bytes,
           CAST(4 * (n_sampled - 1) AS INT) AS last_frame_no
    FROM s
    """,
)
def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling pipeline: every row expands to its sampled frames
    (1→N inside mapInPandas) and a relational tail aggregates per doc —
    the decode→sample→aggregate shape of a video-corpus pipeline.

    Oracle-able because the fake sampler is frame-count arithmetic over
    the payload length L: n_frames = max(1, L // 64), frames 0,4,8,…
    < n_frames → n_sampled = ⌈n_frames/4⌉, last = 4·(n_sampled−1), and
    every sampled chunk is a full 64 bytes whenever L ≥ 64 (frame index
    never exceeds n_frames−1, and n_frames·64 ≤ L), else the single
    frame carries all L bytes."""
    df = with_binary_payload(spark, sf_dir).select("doc_id", "payload")
    frames = df.mapInPandas(sample_frames, schema=FRAME_SCHEMA)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sampled_frames"),
        F.sum("frame_bytes").alias("sampled_bytes"),
        F.max("frame_no").alias("last_frame_no"),
    )


_FRAMEDUP_MIN = 2  # pairs must share at least this many sampled frames


@query(
    "q_multimodal_framedup",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS len_b
      FROM documents
    ),
    f AS (
      SELECT doc_id, k.k AS frame_no,
             COALESCE(list_sum(list_transform(
                 range(k.k * {_FRAME_BYTES} + 1,
                       least(CAST(len_b AS BIGINT),
                             (k.k + 1) * {_FRAME_BYTES}) + 1),
                 i -> ascii(substr(text, CAST(i AS INT), 1)))), 0)
               % 1000003 AS crc
      FROM d, LATERAL (
        SELECT unnest(range(0, greatest(1, len_b // {_FRAME_BYTES}),
                            {_FRAME_STRIDE})) AS k
      ) k
    )
    SELECT a.doc_id AS media_a, b.doc_id AS media_b,
           CAST(COUNT(*) AS BIGINT) AS n_frame_matches
    FROM f a JOIN f b ON a.crc = b.crc AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= {_FRAMEDUP_MIN}
    """,
)
def q_multimodal_framedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media near-dup via frame fingerprints — the video/image dedup a
    multimodal training pipeline runs: decode → sample frames →
    fingerprint each frame (production: a perceptual hash; here the
    fake decoder's deterministic frame CRC, same plumbing) → find media
    pairs sharing ≥ {_FRAMEDUP_MIN} sampled-frame fingerprints. Catches
    re-encodes, trims and re-posts that byte-level (payload-hash) dedup
    misses, because matching happens at frame granularity.

    Plan shape: the pair search is a self equi-join on the FINGERPRINT
    — a postings join exactly like q_dedup_substring's shingle join;
    the corpus of media blobs is never cross-joined, and only (doc_id,
    crc) rows (16 B) shuffle, never frames or payloads. At 100 TB the
    degenerate hot key is the "common frame" (intros, black frames):
    production drops fingerprints whose media-frequency exceeds a cap
    before the join — a stoplist semi-join, same Zipf-head treatment as
    the substring dedup's bloom step — and the candidate volume knob is
    the sampling stride.

    Oracle-able end-to-end because the fake frame fingerprint is pure
    arithmetic over the utf-8 payload (per-{_FRAME_BYTES}-byte-slice
    byte sums mod 1000003; ASCII fixture, see q_multimodal_features).
    """
    df = with_binary_payload(spark, sf_dir).select("doc_id", "payload")
    frames = df.mapInPandas(sample_frames, schema=FRAME_SCHEMA).select(
        "doc_id", "frame_crc"
    )
    a = frames.select(
        F.col("doc_id").alias("media_a"), F.col("frame_crc").alias("crc")
    )
    b = frames.select(
        F.col("doc_id").alias("media_b"), F.col("frame_crc").alias("crc")
    )
    return (
        a.join(b, "crc")
        .filter(F.col("media_a") < F.col("media_b"))
        .groupBy("media_a", "media_b")
        .agg(F.count(F.lit(1)).alias("n_frame_matches"))
        .filter(F.col("n_frame_matches") >= _FRAMEDUP_MIN)
        .select(
            "media_a",
            "media_b",
            F.col("n_frame_matches").cast("bigint").alias("n_frame_matches"),
        )
    )
