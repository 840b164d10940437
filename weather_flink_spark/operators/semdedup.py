"""Bounded-cell refinement for SemDeDup-style within-cell dedup.

The coarse IVF assignment (plans/llm_extra.ivf_assigned_table) uses a
FIXED trained centroid count, so assignment is O(n·k) — but cell SIZE
then grows linearly with the corpus, and the within-cell pair phase of
q_dedup_semantic_ivf is quadratic in cell size. This module caps that:
any cell larger than ``bound`` is split into similarity-aware
sub-cells (fine centroids = the cell's first ``ceil(size/target)``
members by vec_id, members re-assigned to their nearest fine centroid
by cosine), with a residual hard chunk as the size GUARANTEE when fine
cells are still skewed (e.g. a cell full of exact duplicates).

Scale contract:
- cell sizes come from one partial-aggregated groupBy (8-ish rows);
- fine centroids are selected with a per-cell window (partitioned by
  the bounded coarse key, never global);
- the member→fine-centroid join is an equi-join on the coarse cell, so
  every comparison is partition-local and AQE may broadcast the fine
  table when it is small — it is never FORCED broadcast because its
  row count grows with n/target;
- the residual chunking is a per-fine-cell window (again partition-
  local). After it, no refined cell exceeds ``bound`` by construction.

Recall trade (documented, standard for production SemDeDup): pairs
crossing a sub-cell boundary are not compared. The fine split is
cosine-aware so near-duplicates cluster into the same sub-cell; the
residual hard chunk only engages under extreme skew, where the cell is
dominated by exact/near-exact copies that exact dedup upstream should
already have removed.

Refined ids stay BIGINT and EQUAL the input cell id whenever the cell
is within bound, so small-scale results (and the DuckDB oracle at the
sf0.01 gate) are bit-identical with the refinement in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Default knobs: bound must exceed the largest cell at the oracle gate
# (sf0.01: max 71; sf0.1: max 262 — the split IS exercised at bench
# scale) and keep the quadratic pair phase affordable (bound² per cell).
SEMDEDUP_CELL_BOUND = 256
SEMDEDUP_FINE_TARGET = 128

# Refined-id encoding (negative namespace so split ids can never
# collide with non-negative coarse ids): -(1 + (cell*F + fine)*C + chunk)
_FINE_LIMIT = 1 << 20
_CHUNK_LIMIT = 1 << 10


def bounded_cells(
    assigned: DataFrame,
    bound: int = SEMDEDUP_CELL_BOUND,
    target: int = SEMDEDUP_FINE_TARGET,
) -> DataFrame:
    """Refine ``cell`` so no refined cell holds more than ``bound`` rows.

    ``assigned`` must carry (vec_id, embedding, nrm, cell). Returns the
    same columns with ``cell`` replaced by the refined id (unchanged for
    cells already within bound).
    """
    from weather_flink_spark.plans.llm_pipeline import dot_col

    sizes = assigned.groupBy("cell").agg(F.count("*").alias("cell_n"))
    a = assigned.join(sizes, "cell")
    small = a.filter(F.col("cell_n") <= bound).select(
        "vec_id", "embedding", "nrm", "cell"
    )
    big = a.filter(F.col("cell_n") > bound)

    w_cell = Window.partitionBy("cell").orderBy(F.col("vec_id").asc())
    ranked = big.withColumn("pos", F.row_number().over(w_cell))
    n_fine = F.ceil(F.col("cell_n") / F.lit(target)).cast("long")
    fine = ranked.filter(F.col("pos") <= n_fine).select(
        F.col("cell").alias("f_cell"),
        F.col("pos").alias("fine_idx"),
        F.col("embedding").alias("f_emb"),
        F.col("nrm").alias("f_nrm"),
    )
    cos_vf = dot_col(F.col("embedding"), F.col("f_emb")) / (
        F.col("nrm") * F.col("f_nrm")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("f_cos").desc(), F.col("fine_idx").asc()
    )
    refined = (
        big.join(fine, F.col("cell") == F.col("f_cell"))
        .select("vec_id", "embedding", "nrm", "cell", "fine_idx", cos_vf.alias("f_cos"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .drop("rn", "f_cos")
    )
    # residual hard chunk: GUARANTEES <= bound even under duplicate skew
    w_fine = Window.partitionBy("cell", "fine_idx").orderBy(F.col("vec_id").asc())
    chunked = refined.withColumn(
        "chunk", ((F.row_number().over(w_fine) - 1) / F.lit(bound)).cast("long")
    )
    split_id = -(
        F.lit(1)
        + (F.col("cell") * F.lit(_FINE_LIMIT) + F.col("fine_idx")) * F.lit(_CHUNK_LIMIT)
        + F.col("chunk")
    )
    return small.unionByName(
        chunked.select("vec_id", "embedding", "nrm", split_id.alias("cell"))
    )
