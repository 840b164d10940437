"""bounded_cells: the SemDeDup pair phase must stay cell²-bounded.

Round-2 verdict item #5: with a FIXED trained centroid count, cell size
grows linearly with the corpus, so the within-cell pair phase needs a
size cap. These tests pin the two contract halves:
- identity at small scale (so the sf0.01 oracle gate is unaffected);
- a hard size GUARANTEE on the scaling probe's 10× duplicated dataset,
  where duplicate skew defeats a purely similarity-aware split.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_flink_spark.operators.semdedup import SEMDEDUP_CELL_BOUND, bounded_cells
from weather_flink_spark.plans.llm_extra import ivf_assigned_table

SF = "/root/testdata/sf0.001"


def _scaled(df, copies: int, stride: int = 10_000_000):
    parts = [df.withColumn("vec_id", F.col("vec_id") + F.lit(i * stride)) for i in range(copies)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def test_bounded_cells_identity_within_bound(spark):
    """Every cell at small scale is within bound → refinement must be a
    value-level no-op (same rows, same cell ids)."""
    assigned = ivf_assigned_table(spark, SF)
    refined = bounded_cells(assigned)
    a = assigned.select("vec_id", "cell")
    r = refined.select("vec_id", F.col("cell").alias("cell_r"))
    joined = a.join(r, "vec_id")
    assert joined.count() == a.count()
    assert joined.filter("cell <> cell_r").count() == 0


def test_bounded_cells_guarantee_on_10x_duplicated_corpus(spark):
    """On the probe's 10× duplicated embeddings (exact-duplicate skew:
    every vector has 10 identical copies), no refined cell may exceed
    the bound — the residual hard chunk is the guarantee the fine
    cosine split alone cannot give."""
    assigned = _scaled(ivf_assigned_table(spark, SF), copies=10)
    refined = bounded_cells(assigned)
    sizes = refined.groupBy("cell").count()
    max_size = sizes.agg(F.max("count")).collect()[0][0]
    assert max_size <= SEMDEDUP_CELL_BOUND, f"refined cell of {max_size} rows"
    # and the refinement conserves rows
    assert refined.count() == assigned.count()


def test_bounded_cells_split_ids_disjoint_from_coarse_ids(spark):
    """Split ids live in the negative namespace; coarse ids are
    non-negative — no collision can merge unrelated cells."""
    assigned = _scaled(ivf_assigned_table(spark, SF), copies=10)
    refined = bounded_cells(assigned)
    n_bad = refined.join(
        assigned.select(F.col("cell").alias("coarse")).distinct(),
        refined.cell == F.col("coarse"),
        "left_semi",
    ).filter(F.col("cell") < 0).count()
    assert n_bad == 0
