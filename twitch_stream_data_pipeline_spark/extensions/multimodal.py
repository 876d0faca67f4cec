"""Multimodal column plumbing (SURVEY.md §2.9).

Images / audio / video are opaque ``binary`` payload columns with a
typed metadata struct alongside. The Spark-side machinery — schema,
partitioning, Arrow-batched UDF signatures, batch shapes — is real and
tested. Decoding has two tiers:

- **strict** (:func:`decode_f32le`): a REAL decode of the declared
  fixed-layout codec — the payload is a little-endian float32 vector
  (the raw-tensor interchange layout; what an embedding or a
  pre-decoded image patch looks like on the wire). Runs end to end
  through the Arrow batch path and is differentially verified against
  a byte-arithmetic SQL oracle (``multimodal_decode`` in the catalog).
- **lenient** (:func:`decode_stub`): compressed-media codecs
  (JPEG/PNG/Opus/H.264) need libraries not present in this
  environment, so payloads of unknown format get a deterministic
  md5-derived pseudo-feature vector — batch shapes, schemas and
  partitioning stay exercised while the codec boundary stays declared.

Reference precedent for media-as-columns: ``thumbnail_url`` /
``profile_image_url`` carried as string columns
(``scripts/process_raw_data/process_raw_streams_data.py:83``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried next to every binary payload column.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image/audio/video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 16

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Make a documents table multimodal: utf-8 payload bytes + metadata.

    Stand-in for real media ingestion: the payload is the encoded text
    (deterministic), the metadata struct is typed and NULL-defaulted
    the way a real image ingest would fill it.
    """
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_f32le(payload: bytes, max_dim: int = FEATURE_DIM) -> list[float]:
    """REAL decode of the declared fixed-layout codec: the payload is a
    vector of little-endian IEEE-754 float32 values (raw-tensor
    interchange — embeddings, pre-decoded image patches). Unpacks
    ``min(max_dim, len(payload) // 4)`` floats; trailing bytes that
    don't fill a float are ignored. float32 -> Python float (double)
    widening is exact, which is what makes the byte-arithmetic SQL
    oracle (``multimodal_decode``) able to reproduce the values
    bit-for-bit.
    """
    import struct

    n = min(max_dim, len(payload) // 4)
    return list(struct.unpack(f"<{n}f", payload[: 4 * n]))


def decode_stub(payload: bytes, strict: bool = False) -> list[float]:
    """Media decoder: strict mode runs the REAL fixed-layout decode
    (:func:`decode_f32le` — the payload is declared to be a little-
    endian float32 vector); lenient mode is the STUB for compressed
    media whose codecs (JPEG/Opus/...) are not in this environment —
    a deterministic md5-derived pseudo-feature vector that keeps batch
    shapes, schemas and partitioning testable end to end.
    """
    if strict:
        return decode_f32le(payload)
    import hashlib

    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(
    df: DataFrame, batch_hint: int = 1024, strict: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` so each task streams Arrow batches through the
    decoder — the exact shape a real GPU/CPU feature extractor needs:
    per-partition batching, no driver collect, output schema fixed up
    front. ``strict=True`` runs the real fixed-layout float32-LE
    decode (payloads are declared raw tensors); ``strict=False`` runs
    the md5 pseudo-feature stub for opaque compressed media.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # NULL payloads propagate as NULL outputs — the same semantics
        # the JVM-side binary_meta has for free (octet_length(NULL) =
        # md5(NULL) = NULL). A pandas batch hands the decoder None
        # where the JVM sees a typed null, and len(None)/md5(None)
        # RAISE (round-10 NULL poison sweep); Int32 is the NULLABLE
        # pandas integer dtype Arrow maps back to a null int32.
        def _null_safe(f):
            return lambda b: None if b is None else f(b)

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(_null_safe(len)).astype(
                        "Int32"
                    ),
                    "payload_md5": payloads.map(
                        _null_safe(
                            lambda b: __import__("hashlib")
                            .md5(b)
                            .hexdigest()
                        )
                    ),
                    "features": payloads.map(
                        _null_safe(lambda b: decode_stub(b, strict=strict))
                    ),
                }
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def binary_meta(df: DataFrame) -> DataFrame:
    """JVM-only binary metadata projection (no Python in the loop):
    byte length + md5 of the payload — the cheap pre-filter a real
    pipeline runs before shipping payloads to decoders.
    """
    return df.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


def frame_sample(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Evenly-spaced frame sampling over binary payloads: split each
    payload into ``n_frames`` contiguous byte ranges ("frames") and
    emit per-frame identity (``doc_id, frame_idx, byte_start,
    frame_md5``). Trailing frames past the payload end are dropped, so
    short payloads yield fewer frames.

    This is the video-pipeline *plumbing* — range arithmetic, binary
    slicing, per-frame fan-out — done entirely JVM-side as column
    expressions (whole-stage codegen); only the per-frame *decode*
    (stubbed here, see :func:`decode_stub`) would cross into Python,
    already batched one-frame-per-row. Chunk size is exact integer
    ceil division, no float path.

    ``frame_md5`` fingerprints the frame as ``md5(hex(frame_bytes))``
    — bijective with the raw bytes, and computable identically in
    engines whose md5 only accepts text (DuckDB's is VARCHAR-only, and
    a byte range that splits a multi-byte character is not valid UTF-8
    to cast; the round-9 unicode poison fixture caught the oracle's
    earlier character-based slicing diverging from these byte offsets).
    The hex is sliced at doubled offsets, so the frame grid itself
    stays byte-addressed.
    """
    frames = df.select(
        "doc_id",
        F.hex("payload").alias("payload_hex"),
        F.octet_length("payload").alias("n_bytes"),
        F.expr(f"(octet_length(payload) + {n_frames} - 1) div {n_frames}").alias(
            "chunk"
        ),
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx"),
    ).filter(F.col("frame_idx") * F.col("chunk") < F.col("n_bytes"))
    return frames.select(
        "doc_id",
        "frame_idx",
        (F.col("frame_idx") * F.col("chunk")).cast("bigint").alias("byte_start"),
        F.md5(
            F.expr(
                "substring(payload_hex, frame_idx * chunk * 2 + 1, chunk * 2)"
            )
        ).alias("frame_md5"),
    )


def pool_features(
    df: DataFrame,
    out_dim: int,
    features_col: str = "features",
) -> DataFrame:
    """Resize a decoded feature vector to ``out_dim`` by adaptive
    average pooling — the multimodal "resize" step (image thumbnail /
    waveform downsample analog, operating on the decoded tensor rather
    than the codec): dimension ``j`` of the output averages the input
    slice ``[floor(j*n/out), ceil((j+1)*n/out))`` — exactly
    AdaptiveAvgPool1d's window rule, so any non-empty input length
    maps deterministically onto a fixed output shape with every window
    non-empty (upsampling repeats values, the pool analog of
    nearest-neighbor resize). Empty inputs pool to all-NULL — honest
    missingness, no silent zero-fill.

    Pure JVM column expressions (sequence + slice + aggregate over a
    lambda-bound vector — the CollapseProject-safe let-binding, see
    winnow_fingerprints) — no Python in the loop, embarrassingly
    parallel, no shuffle. Emits the input columns with ``features``
    replaced by the pooled ``array<double>``.
    """
    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    if features_col not in df.columns:
        raise ValueError(f"pool_features: no column {features_col!r}")
    quoted = "`" + features_col.replace("`", "``") + "`"
    lo = f"(j * size(__v)) div {out_dim}"
    hi = f"((j + 1) * size(__v) + {out_dim - 1}) div {out_dim}"
    pooled = f"""
    element_at(transform(array({quoted}), __v ->
      transform(sequence(0, {out_dim - 1}), j ->
        CASE WHEN ({hi}) > ({lo}) THEN
          aggregate(
            slice(__v, ({lo}) + 1, ({hi}) - ({lo})),
            cast(0.0 as double), (acc, x) -> acc + x,
            acc -> acc / (({hi}) - ({lo})))
        END)
    ), 1)
    """
    # substitute in place: column ORDER is part of the contract
    # ("input columns with features replaced"), positional consumers
    # (union-by-position, golden CSV compares) must see it unchanged
    return df.select(
        *[
            F.expr(pooled).alias(features_col) if c == features_col else F.col(c)
            for c in df.columns
        ]
    )
