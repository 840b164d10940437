"""Wave-73 operators (round 10): the first COMPRESSED image container
— PNG decode + perceptual dedup over the PNG corpus (r9 verdict task
#6).

Perceptual image dedup was proven on uncompressed containers only
(BMP/WAV); "a real decoder swaps the kernel" was untested prose. This
wave makes it tested code: a genuine non-interlaced RGB8 PNG
encoder/decoder (operators/multimodal.png_encode/png_parse) with a
hand-rolled DEFLATE writer covering ALL THREE RFC 1951 block shapes
the fixtures cycle through by doc_id%3 (stored; literal-only
fixed-Huffman; and, r11, dynamic-Huffman with a real data-built
two-level header — r10 verdict task #4), real zlib/CRC framing,
None/Sub scanline
filters on encode, and a full 5-filter unfilter pass + stdlib-zlib
inflate on decode.

- ``q_multimodal_decode_png`` — per document: dims, the DEFLATE block
  type read FROM THE ACTUAL IDAT BIT STREAM (not the doc_id rule — the
  oracle compare proves the writer emitted the block shape it claims),
  raster size, decoded pixel-byte sum. The oracle replays the expected
  values from the fixture rule (pixels cycle the UTF-8 text, no row
  padding in a PNG raster), so a hash match proves chunk walk, CRC,
  inflate, and unfilter end to end — the wave-15 BMP discipline on a
  compressed container.
- ``q_multimodal_image_dedup_png`` — the wave-52 banded ahash dedup
  pipeline run verbatim over DECODED PNG bytes (the hash cores are
  shared with the BMP tiers — the hash is a property of the pixels,
  not the container). Candidates from 4x10-bit LSH bands blocked on
  (width, height); per-image n_neardups + best match.

Cross-container proof in tests: for widths where the BMP stride adds
no padding (4 and 8), the BMP and PNG pixel rasters coincide, so all
three perceptual hashes must be EQUAL across containers — the decoder
swap leaves the dedup verdicts untouched, which is exactly the claim
the r9 verdict wanted tested.

Scale: decode is a narrow Arrow map over the binary column (payloads
never shuffle); the dedup join shuffles 8-byte hashes on (dims, band,
bits) — unchanged from wave-52.

Reference parity note: the reference processes no media (empty plan
body, ``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register


@register(
    "q_multimodal_decode_png",
    oracle="""
        WITH p AS (
            SELECT doc_id, text,
                   4 + doc_id % 5 AS width,
                   2 + doc_id % 4 AS height,
                   length(text) AS L,
                   (4 + doc_id % 5) * (2 + doc_id % 4) * 3 AS npix
            FROM documents
        )
        SELECT doc_id, width, height,
               CASE doc_id % 3 WHEN 0 THEN 'stored'
                    WHEN 1 THEN 'fixed' ELSE 'dynamic' END
                   AS deflate_mode,
               CAST(npix AS BIGINT) AS n_pixel_bytes,
               CAST(list_sum(list_transform(
                   range(0, npix),
                   i -> ascii(text[CAST(i % L AS INTEGER) + 1])
               )) AS BIGINT) AS pixel_sum
        FROM p
    """,
    doc=(
        "REAL compressed-image decode (r10, r9 verdict task #6): each "
        "document's payload is a genuine non-interlaced RGB8 PNG "
        "(hand-rolled DEFLATE cycling ALL THREE RFC 1951 block shapes "
        "by doc_id%3 — stored, literal-only fixed-Huffman, and r11's "
        "dynamic-Huffman with a real data-built two-level header — "
        "real zlib/CRC framing, "
        "None/Sub scanline filters), and the Arrow-batched decoder "
        "walks chunks, verifies CRCs, inflates via stdlib zlib, "
        "unfilters all rows, and reports dims + the DEFLATE block type "
        "read from the actual IDAT bit stream + the decoded pixel sum. "
        "Oracle replays dims/mode/sum from the fixture rule (pixels "
        "cycle the UTF-8 text), so the hash compare proves the whole "
        "codec path. Scale: narrow Arrow map, binary never shuffles; "
        "corrupt payloads tolerate-decode to nulls (A2 discipline)."
    ),
    tags=("multimodal", "binary", "pandas-udf", "llm-pipeline"),
)
def q_multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.operators.multimodal import (
        decode_png,
        encode_png_payload,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return decode_png(encode_png_payload(d))


def _png_ahash_cte() -> str:
    """DuckDB CTE chain ending in ``ah`` (doc_id, width, height,
    ahash): the average-hash replay over the PNG fixture's DECODED
    pixel rule — bytes cycle the text with NO row padding (a PNG
    raster has none; the only difference from the wave-52 BMP replay
    is the position expression j*3+k instead of the strided one)."""
    chan = " + ".join(
        f"ascii(text[CAST(((j * 3 + {k}) % L) AS INTEGER) + 1])"
        for k in range(3)
    )
    return f"""
        p AS (
            SELECT doc_id, text,
                   4 + doc_id % 5 AS width,
                   2 + doc_id % 4 AS height,
                   length(text) AS L
            FROM documents
        ),
        intens AS (
            SELECT doc_id, width, height,
                   list_transform(range(0, width * height),
                                  j -> {chan}) AS iv
            FROM p
        ),
        ah AS MATERIALIZED (
            SELECT doc_id, width, height,
                   CAST(COALESCE(list_sum(list_transform(
                       range(0, width * height),
                       j -> CASE WHEN iv[CAST(j AS INTEGER) + 1]
                                      * width * height
                                      > list_sum(iv)
                            THEN CAST(1 AS BIGINT) << CAST(j AS INTEGER)
                            ELSE 0 END)), 0) AS BIGINT) AS ahash
            FROM intens
        )"""


def _png_dedup_oracle() -> str:
    # reuse the wave-52 band/verify/rollup text with the PNG hash CTE
    # swapped in as the base
    from weather_flink_spark.plans.analytics_wave52 import _dedup_oracle

    return _dedup_oracle(base_cte=_png_ahash_cte())


@register(
    "q_multimodal_image_dedup_png",
    oracle=_png_dedup_oracle(),
    doc=(
        "Image near-dedup over a COMPRESSED container (r10, r9 verdict "
        "task #6): the wave-52 banded average-hash pipeline run "
        "verbatim over decoded PNG bytes — every payload a genuine "
        "RGB8 PNG (stored/fixed/dynamic-Huffman DEFLATE cycling by "
        "doc_id%3, r11) decoded through chunk walk, CRC, inflate, and "
        "unfilter before hashing with the SAME grid cores as the BMP "
        "tiers. 4x10-bit LSH bands blocked on (width, height), "
        "pigeonhole-complete at Hamming <= 3; per-image n_neardups + "
        "best match. Cross-container hash equality on padding-free "
        "widths is pinned in tests: swapping the decoder leaves the "
        "dedup verdicts untouched. Oracle replays hash, bands, join, "
        "rollup from the decoded-pixel rule (text cycled, no padding)."
    ),
    tags=("multimodal", "dedup", "lsh", "pandas-udf", "llm-pipeline"),
)
def q_multimodal_image_dedup_png(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from weather_flink_spark.operators.multimodal import (
        encode_png_payload,
        png_hash_frame,
    )
    from weather_flink_spark.plans.analytics_wave52 import _band_dedup

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    hashes = png_hash_frame(encode_png_payload(d)).select(
        "doc_id", "width", "height", "ahash"
    )
    return _band_dedup(spark, hashes, "ahash")


_THUMB_W, _THUMB_H = 3, 2


def _resize_oracle() -> str:
    """Replay: thumbnail cell (x, y) reads source pixel
    (x*w // tw, y*h // th); source intensities come straight from the
    cycled-text rule (no padding in a PNG raster)."""
    # lambda bodies cannot contain subqueries in DuckDB, so x = c % tw
    # and y = c // tw are inlined into the position arithmetic
    chan = " + ".join(
        f"ascii(text[CAST((((((c // {_THUMB_W}) * height // {_THUMB_H}) * width"
        f" + ((c % {_THUMB_W}) * width // {_THUMB_W})) * 3 + {k}) % L)"
        f" AS INTEGER) + 1])"
        for k in range(3)
    )
    n_cells = _THUMB_W * _THUMB_H
    return f"""
        WITH p AS (
            SELECT doc_id, text,
                   4 + doc_id % 5 AS width,
                   2 + doc_id % 4 AS height,
                   length(text) AS L
            FROM documents
        ),
        thumbs AS (
            SELECT doc_id, width, height,
                   list_transform(range(0, {n_cells}),
                       c -> {chan}) AS thumb
            FROM p
        )
        SELECT doc_id, width, height,
               {", ".join(f"CAST(thumb[{j + 1}] AS BIGINT) AS t{j}" for j in range(n_cells))},
               CAST(COALESCE(list_sum(list_transform(
                   range(0, {n_cells}),
                   j -> CASE WHEN thumb[CAST(j AS INTEGER) + 1] * {n_cells}
                                  > list_sum(thumb)
                        THEN CAST(1 AS BIGINT) << CAST(j AS INTEGER)
                        ELSE 0 END)), 0) AS BIGINT) AS thumb_ahash
        FROM thumbs
    """


@register(
    "q_multimodal_image_resize",
    oracle=_resize_oracle(),
    doc=(
        "Image RESIZE over decoded PNG bytes (r10 — completes the "
        "multimodal quartet: decode / feature-extract / RESIZE / "
        "frame-sample, which the module docstring promised and nothing "
        "implemented): nearest-neighbor downscale of every document's "
        "decoded raster to a fixed 3x2 intensity thumbnail — target "
        "cell (x,y) reads source pixel (x*w//tw, y*h//th), integer-"
        "exact — plus the thumbnail's mean-threshold ahash, the scale-"
        "normalized hash real pipelines compute AFTER resize so images "
        "of different dims become comparable. Oracle replays the "
        "resample arithmetic and the hash from the cycled-text pixel "
        "rule. Scale: decode+resize is one narrow Arrow map; the "
        "thumbnail (6 ints) is what shuffles, never the raster."
    ),
    tags=("multimodal", "binary", "pandas-udf", "llm-pipeline"),
)
def q_multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.operators.multimodal import (
        encode_png_payload,
        resize_frame,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    thumbs = resize_frame(encode_png_payload(d), _THUMB_W, _THUMB_H)
    # flatten the fixed 6-cell thumbnail to scalar columns (the
    # driver's hash compare is defined over scalar columns)
    return thumbs.select(
        "doc_id",
        "width",
        "height",
        *[
            F.element_at("thumb", j + 1).alias(f"t{j}")
            for j in range(_THUMB_W * _THUMB_H)
        ],
        "thumb_ahash",
    )
