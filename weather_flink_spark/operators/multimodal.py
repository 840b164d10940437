"""Multimodal column operators: opaque binary payloads + typed metadata.

The engine's multimodal model (SURVEY.md §2-C): media lives in an
opaque ``binary`` column next to a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
transforms over ``mapInPandas``. The Spark-side plumbing — schemas,
batch iteration, row fan-out, partitioning — is real and tested; the
actual codecs (PIL/ffmpeg/librosa) are NOT in this environment, so the
decode kernels are either a clearly-marked ``NotImplementedError`` or a
deterministic fake, switchable per call.

At 100 TB the pattern is: binary stays columnar in parquet (never
exploded through a shuffle), feature extraction is a narrow map over
Arrow record batches (no JVM⇄Python per-row crossings), and frame
fan-out happens AFTER any filter that can prune payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# metadata struct carried next to every payload column
MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("encoding", T.StringType()),
    ]
)

BINARY_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.LongType()),
        T.StructField("last_byte", T.LongType()),
        T.StructField("byte_sum_16", T.LongType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("frame_bytes", T.LongType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Assemble the multimodal record: opaque payload + typed metadata.

    In production the payload column comes straight from parquet
    (images/audio stored as binary); here it is derived from text so the
    whole path is testable and oracle-checkable.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit("utf-8").alias("encoding"),
        ).alias("media_meta"),
    )


def extract_binary_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over opaque payloads.

    The kernel is deliberately codec-free (byte-level stats) so it runs
    anywhere and has an exact SQL oracle; a real image/audio featurizer
    replaces the body, not the plumbing.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = batch["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int64"),
                    "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1).astype("int64"),
                    "byte_sum_16": payloads.map(lambda b: int(sum(b[:16]))).astype("int64"),
                }
            )

    return df.mapInPandas(kernel, schema=BINARY_FEATURES_SCHEMA)


def decode_image(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payloads to (width, height, channels).

    ``fake=False`` raises: no image codec ships in this environment.
    ``fake=True`` derives deterministic pseudo-dimensions from the first
    payload bytes — same plumbing, stable tests.
    """
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("channels", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires a codec (PIL/libvips) not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            payloads = batch["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].astype("int64"),
                    "width": payloads.map(lambda b: 1 + (b[0] % 64) if len(b) else 0).astype("int64"),
                    "height": payloads.map(lambda b: 1 + (b[-1] % 64) if len(b) else 0).astype("int64"),
                    "channels": pd.Series([3] * len(batch), dtype="int64"),
                }
            )

    return df.mapInPandas(kernel, schema=schema)


def sample_frames(df: DataFrame, frame_size: int = 32, stride: int = 4) -> DataFrame:
    """Frame sampling: fan each payload out to every ``stride``-th chunk.

    The video analog — one input row becomes N frame rows (UDTF shape).
    Deterministic fake: frames are fixed-size byte slices; a real
    implementation swaps the slicing for ffmpeg keyframe extraction.
    Fan-out happens inside the Arrow batch (no shuffle).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out_ids, out_idx, out_frames = [], [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                n_frames = max(len(payload) // frame_size, 0)
                for k in range(0, n_frames, stride):
                    out_ids.append(int(doc_id))
                    out_idx.append(k)
                    out_frames.append(bytes(payload[k * frame_size : (k + 1) * frame_size]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int64"),
                    "frame": pd.Series(out_frames, dtype=object),
                    "frame_bytes": pd.Series([len(f) for f in out_frames], dtype="int64"),
                }
            )

    return df.mapInPandas(kernel, schema=FRAME_SCHEMA)
