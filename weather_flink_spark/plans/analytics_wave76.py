"""Wave-76 operator (round 11): the JPEG-shaped LOSSY DCT container —
proof the perceptual dedup tiers survive lossy compression (r10
verdict task #7).

The wave-52/57/59/73 perceptual tiers all hash LOSSLESSLY-decoded
pixels (BMP, PNG); real 100 TB image corpora are JPEG — the pixels a
decoder returns are NOT the pixels the encoder saw. This wave adds a
baseline-JPEG-shaped lossy path and measures tier survival on it:

- ``LJ01`` container (operators/multimodal.dct_encode/dct_parse):
  8x8 block DCT with the standard ITU T.81 Annex K luminance
  quantization table at a genuinely lossy operating point
  (STEP=1024 ~ the JPEG scale; measured max |pixel error| ~18 on the
  text-noise fixtures), coefficients stored as int16 inside a zlib
  frame whose DEFLATE body is the r11 dynamic-Huffman writer — the
  lossy path exercises the full compressed-container stack.
- **Integer transform** — the real-codec trick (JPEG/H.264 fixed-point
  DCTs): basis M[u][x] = round(cos((2x+1)u*pi/16)*32), inverse weights
  W = round(2^30/(D_u*D_v)), every forward/inverse step exact integer
  arithmetic — so the LOSSY roundtrip is bit-replayable by the DuckDB
  oracle (float DCT would drift in last ulps across engines and a
  round() knife-edge would flip a coefficient).

``q_multimodal_decode_dct`` reports, per document: dims, the DC
coefficient, surviving (nonzero) coefficient count, reconstructed
pixel sum, max absolute pixel error (the measured loss), and the
ahash Hamming distance between original and reconstructed rasters.
The oracle replays the ENTIRE lossy pipeline in SQL — pad rule,
forward transform, quantization, dequantization, inverse transform,
clamp, and both ahash codes — from the text rule and the three
embedded 64-literal integer tables.

The measured tier-survival profile (fixture, STEP=1024): ahash drifts
<= 2 bits on every document (the surviving tier — cross-lossy dedup
verdicts hold), dhash drifts > 3 bits on ~19% (neighbor deltas are
exactly what coefficient truncation perturbs — the known-brittle tier
under JPEG in practice), phash ~11%. The wave-57-style union verdict
therefore still pairs every lossy/lossless twin via the ahash tier;
tests pin all three profiles.

Scale: encode/decode are narrow Arrow maps (one 8x8 block per fixture
image; a real corpus tiles blocks — same per-block arithmetic, still
a map); binary payloads never shuffle; corrupt payloads decode to
nulls (A2 discipline).

Reference parity note: the reference processes no media (empty plan
body, ``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register


def _sql_list(flat: list[int]) -> str:
    return "[" + ", ".join(str(v) for v in flat) + "]"


def _dct_oracle() -> str:
    from weather_flink_spark.operators.multimodal import (
        _DCT_M,
        _DCT_Q,
        _DCT_S,
        _DCT_STEP,
        _DCT_W,
    )

    m = _sql_list([v for row in _DCT_M for v in row])
    q = _sql_list([v for row in _DCT_Q for v in row])
    wt = _sql_list([v for row in _DCT_W for v in row])
    half = 1 << (_DCT_S - 1)
    den = 1 << _DCT_S
    # NOTE floor-parity discipline: every division is FLOOR over DOUBLE.
    # Quantize: operands <= ~7e7 (exact in double), non-exact quotients
    # sit >= 1/(2*qs) > 4e-6 from integers — no boundary risk. Inverse:
    # the divisor is 2^30, and division by a power of two is EXACT in
    # binary floating point, so FLOOR == the Python >> arithmetic shift.
    return f"""
        WITH consts AS (
            SELECT {m} AS MB, {q} AS QT, {wt} AS WT
        ),
        p AS (
            SELECT doc_id, text,
                   4 + doc_id % 5 AS w,
                   2 + doc_id % 4 AS h,
                   length(text) AS L
            FROM documents
        ),
        g AS (
            SELECT doc_id, w, h, w * h AS n,
                   list_transform(range(0, w * h),
                       i -> CAST(ascii(text[CAST(i % L AS INTEGER) + 1])
                                 AS BIGINT)) AS gray
            FROM p
        ),
        blk AS (
            SELECT doc_id, w, h, n, gray,
                   list_transform(range(0, 64),
                       k -> gray[CAST(LEAST(k // 8, h - 1) * w
                                      + LEAST(k % 8, w - 1) AS INTEGER) + 1]
                   ) AS B
            FROM g
        ),
        qnt AS (
            SELECT doc_id, w, h, n, gray,
                   list_transform(range(0, 64), uv ->
                       CAST(FLOOR(CAST(
                           2 * list_sum(list_transform(range(0, 64), k ->
                               c.MB[CAST((uv // 8) * 8 + (k // 8) AS INTEGER) + 1]
                               * B[CAST(k AS INTEGER) + 1]
                               * c.MB[CAST((uv % 8) * 8 + (k % 8) AS INTEGER) + 1]))
                           + c.QT[CAST(uv AS INTEGER) + 1] * {_DCT_STEP}
                       AS DOUBLE) / CAST(
                           2 * c.QT[CAST(uv AS INTEGER) + 1] * {_DCT_STEP}
                       AS DOUBLE)) AS BIGINT)
                   ) AS quant
            FROM blk, consts c
        ),
        rec AS (
            SELECT doc_id, w, h, n, gray, quant,
                   list_transform(range(0, 64), rc ->
                       LEAST(255, GREATEST(0, CAST(FLOOR((CAST(
                           list_sum(list_transform(range(0, 64), uv ->
                               c.MB[CAST((uv // 8) * 8 + (rc // 8) AS INTEGER) + 1]
                               * c.MB[CAST((uv % 8) * 8 + (rc % 8) AS INTEGER) + 1]
                               * quant[CAST(uv AS INTEGER) + 1]
                               * c.QT[CAST(uv AS INTEGER) + 1] * {_DCT_STEP}
                               * c.WT[CAST(uv AS INTEGER) + 1]))
                           AS DOUBLE) + {half}) / {den}.0) AS BIGINT)))
                   ) AS block
            FROM qnt, consts c
        ),
        audit AS (
            SELECT doc_id, w, h, n, quant,
                   list_transform(range(0, n),
                       i -> block[CAST((i // w) * 8 + (i % w) AS INTEGER) + 1]
                   ) AS recon,
                   gray
            FROM rec
        )
        SELECT doc_id,
               CAST(w AS INTEGER) AS width,
               CAST(h AS INTEGER) AS height,
               quant[1] AS dc_quant,
               CAST(list_sum(list_transform(quant,
                   x -> CASE WHEN x <> 0 THEN 1 ELSE 0 END)) AS BIGINT)
                   AS n_nonzero,
               CAST(list_sum(recon) AS BIGINT) AS recon_sum,
               CAST(list_max(list_transform(range(0, n),
                   i -> abs(gray[CAST(i AS INTEGER) + 1]
                            - recon[CAST(i AS INTEGER) + 1]))) AS BIGINT)
                   AS max_abs_err,
               CAST(bit_count(xor(
                   list_sum(list_transform(range(0, n), j ->
                       CASE WHEN gray[CAST(j AS INTEGER) + 1] * n
                                 > list_sum(gray)
                            THEN 1::BIGINT << CAST(j AS INTEGER)
                            ELSE 0 END)),
                   list_sum(list_transform(range(0, n), j ->
                       CASE WHEN recon[CAST(j AS INTEGER) + 1] * n
                                 > list_sum(recon)
                            THEN 1::BIGINT << CAST(j AS INTEGER)
                            ELSE 0 END))
               )) AS BIGINT) AS ahash_hamming
        FROM audit
    """


@register(
    "q_multimodal_decode_dct",
    oracle=_dct_oracle(),
    doc=(
        "JPEG-shaped LOSSY image decode (r11, r10 verdict task #7): "
        "each document's payload is an LJ01 container — 8x8 integer "
        "DCT (basis round(cos*32), the real-codec fixed-point trick) "
        "quantized by the standard ITU T.81 luminance table at a "
        "genuinely lossy operating point (max pixel error ~18), int16 "
        "coefficients inside a zlib frame with an r11 dynamic-Huffman "
        "DEFLATE body. The decoder inflates, dequantizes, inverse-"
        "transforms, clamps, and audits the loss: per doc dims, DC "
        "coefficient, surviving-coefficient count, reconstructed pixel "
        "sum, max abs pixel error, and the ahash Hamming distance "
        "original-vs-reconstructed — the measured proof that the "
        "average-hash dedup tier SURVIVES lossy compression (<=2 bits "
        "drift on every fixture) while dhash/phash degrade (tests pin "
        "the profile). Oracle replays the entire integer pipeline — "
        "pad, transform, quantize, inverse, clamp, both ahash codes — "
        "from the text rule and three embedded 64-literal tables. "
        "Scale: narrow Arrow maps, one block per fixture image, "
        "payloads never shuffle, corrupt payloads -> nulls (A2)."
    ),
    tags=("multimodal", "binary", "pandas-udf", "llm-pipeline"),
)
def q_multimodal_decode_dct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.operators.multimodal import (
        decode_dct,
        encode_dct_payload,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return decode_dct(encode_dct_payload(d))

def _dct_tiled_oracle() -> str:
    from weather_flink_spark.operators.multimodal import (
        _DCT_M,
        _DCT_Q,
        _DCT_S,
        _DCT_STEP,
        _DCT_W,
    )

    m = _sql_list([v for row in _DCT_M for v in row])
    q = _sql_list([v for row in _DCT_Q for v in row])
    wt = _sql_list([v for row in _DCT_W for v in row])
    half = 1 << (_DCT_S - 1)
    den = 1 << _DCT_S
    # ahash Hamming is counted as per-position bit DISAGREEMENTS (the
    # tiled rasters run to 160 pixels — past BIGINT shift range, so the
    # single-block oracle's integer-code xor cannot be used here; the
    # count of differing bits is the same number).
    return f"""
        WITH consts AS (
            SELECT {m} AS MB, {q} AS QT, {wt} AS WT
        ),
        p AS (
            SELECT doc_id, text,
                   9 + doc_id % 8 AS w,
                   6 + doc_id % 5 AS h,
                   length(text) AS L
            FROM documents
        ),
        g AS (
            SELECT doc_id, w, h, w * h AS n,
                   (w + 7) // 8 AS n_bc,
                   (h + 7) // 8 AS n_br,
                   list_transform(range(0, w * h),
                       i -> CAST(ascii(text[CAST(i % L AS INTEGER) + 1])
                                 AS BIGINT)) AS gray
            FROM p
        ),
        tiles AS (
            SELECT doc_id, w, h, n, n_bc, gray,
                   CAST(ti AS INTEGER) AS ti,
                   CAST(ti // n_bc AS INTEGER) AS br,
                   CAST(ti % n_bc AS INTEGER) AS bc
            FROM g, UNNEST(range(0, n_br * n_bc)) AS t(ti)
        ),
        blk AS (
            SELECT doc_id, w, h, n, n_bc, gray, ti,
                   list_transform(range(0, 64),
                       k -> gray[CAST(LEAST(br * 8 + k // 8, h - 1) * w
                                      + LEAST(bc * 8 + k % 8, w - 1)
                                  AS INTEGER) + 1]
                   ) AS B
            FROM tiles
        ),
        qnt AS (
            SELECT doc_id, w, h, n, n_bc, gray, ti,
                   list_transform(range(0, 64), uv ->
                       CAST(FLOOR(CAST(
                           2 * list_sum(list_transform(range(0, 64), k ->
                               c.MB[CAST((uv // 8) * 8 + (k // 8) AS INTEGER) + 1]
                               * B[CAST(k AS INTEGER) + 1]
                               * c.MB[CAST((uv % 8) * 8 + (k % 8) AS INTEGER) + 1]))
                           + c.QT[CAST(uv AS INTEGER) + 1] * {_DCT_STEP}
                       AS DOUBLE) / CAST(
                           2 * c.QT[CAST(uv AS INTEGER) + 1] * {_DCT_STEP}
                       AS DOUBLE)) AS BIGINT)
                   ) AS quant
            FROM blk, consts c
        ),
        rec AS (
            SELECT doc_id, w, h, n, n_bc, gray, ti, quant,
                   list_transform(range(0, 64), rc ->
                       LEAST(255, GREATEST(0, CAST(FLOOR((CAST(
                           list_sum(list_transform(range(0, 64), uv ->
                               c.MB[CAST((uv // 8) * 8 + (rc // 8) AS INTEGER) + 1]
                               * c.MB[CAST((uv % 8) * 8 + (rc % 8) AS INTEGER) + 1]
                               * quant[CAST(uv AS INTEGER) + 1]
                               * c.QT[CAST(uv AS INTEGER) + 1] * {_DCT_STEP}
                               * c.WT[CAST(uv AS INTEGER) + 1]))
                           AS DOUBLE) + {half}) / {den}.0) AS BIGINT)))
                   ) AS block
            FROM qnt, consts c
        ),
        perdoc AS (
            SELECT doc_id, w, h, n, n_bc, gray,
                   LIST(block ORDER BY ti) AS blocks,
                   MIN(CASE WHEN ti = 0 THEN quant[1] END) AS dc_quant,
                   CAST(SUM(list_sum(list_transform(quant,
                       x -> CASE WHEN x <> 0 THEN 1 ELSE 0 END))) AS BIGINT)
                       AS n_nonzero
            FROM rec
            GROUP BY doc_id, w, h, n, n_bc, gray
        ),
        audit AS (
            SELECT doc_id, w, h, n, gray, dc_quant, n_nonzero,
                   list_transform(range(0, n), i ->
                       blocks[CAST((i // w) // 8 * n_bc
                                   + (i % w) // 8 AS INTEGER) + 1]
                             [CAST(((i // w) % 8) * 8
                                   + (i % w) % 8 AS INTEGER) + 1]
                   ) AS recon
            FROM perdoc
        )
        SELECT doc_id,
               CAST(w AS INTEGER) AS width,
               CAST(h AS INTEGER) AS height,
               dc_quant,
               n_nonzero,
               CAST(list_sum(recon) AS BIGINT) AS recon_sum,
               CAST(list_max(list_transform(range(0, n),
                   i -> abs(gray[CAST(i AS INTEGER) + 1]
                            - recon[CAST(i AS INTEGER) + 1]))) AS BIGINT)
                   AS max_abs_err,
               CAST(list_sum(list_transform(range(0, n), j ->
                   CASE WHEN (gray[CAST(j AS INTEGER) + 1] * n
                              > list_sum(gray))
                          <> (recon[CAST(j AS INTEGER) + 1] * n
                              > list_sum(recon))
                        THEN 1 ELSE 0 END)) AS BIGINT) AS ahash_hamming
        FROM audit
    """


@register(
    "q_multimodal_decode_dct_tiled",
    oracle=_dct_tiled_oracle(),
    doc=(
        "MULTI-BLOCK lossy DCT decode (r11): the LJ01 container at "
        "dims the <=8x8 fixture never exercises — width 9..16, height "
        "6..10, i.e. 2-4 real 8x8 tiles per image, each independently "
        "transformed/quantized (ITU T.81 table, integer basis) with "
        "edge-replication clamped to the IMAGE boundary, coefficients "
        "concatenated tile-row-major inside one dynamic-Huffman zlib "
        "frame, and the decoder re-assembling the full raster from "
        "per-tile reconstructions (pad regions dropped). Same audit "
        "columns as the single-block entry; ahash Hamming counted as "
        "per-position bit disagreements (rasters up to 160 px exceed "
        "BIGINT code range — the count is the same number). The oracle "
        "replays every tile (UNNEST over the tile grid), the assembly "
        "indexing, and both ahash bit rules from the text rule and the "
        "three embedded integer tables. This converts the single-block "
        "entry's 'a real corpus tiles blocks' scale claim from prose "
        "into tested arithmetic — and publishes the honest cost: on "
        "these larger TEXT-NOISE images the ahash drift grows (median "
        "~4.8% of bits, max 15% vs <=2 absolute bits single-block; "
        "distribution pinned in tests) — pixel-noise is the "
        "adversarial case for a transform codec, the budget a curation "
        "pipeline must carry for its worst images."
    ),
    tags=("multimodal", "binary", "pandas-udf", "llm-pipeline"),
)
def q_multimodal_decode_dct_tiled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.operators.multimodal import (
        decode_dct,
        encode_dct_tiled_payload,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return decode_dct(encode_dct_tiled_payload(d))

