"""Arrow-vectorized similarity search kernels.

The expression-based cosine top-k (plans/llm_pipeline.q_sim_cosine_topk)
is the JVM-only reference; this module is the sanctioned shape for when
embedding math outgrows expressions (matrix kernels, quantization,
reranking models): a numpy matmul inside ``mapInPandas``.

Scale contract:
- the query matrix is broadcast ONCE per task via closure capture
  (numpy array serialized with the function, not per row);
- each Arrow batch computes scores for its rows with one BLAS matmul —
  no per-row Python;
- each PARTITION emits only its local top-k per query (the map-side
  combine), so the final global top-k shuffles k·queries rows per
  partition, not the whole corpus. That is what makes this plan valid
  on a 1000-executor scan of 10^9 vectors.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCORES_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ]
)


def cosine_topk_arrow(embeddings: DataFrame, query_ids: list[int], k: int = 10) -> DataFrame:
    """Top-k cosine neighbors for each query vector, numpy-batched.

    Equivalent to the expression-based brute force (same ids, cosines to
    float precision) — asserted in tests/test_vector_search.py.
    """
    q_rows = (
        embeddings.filter(F.col("vec_id").isin(query_ids))
        .select("vec_id", "embedding")
        .collect()
    )  # bounded: len(query_ids) rows — the one sanctioned collect
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition accumulator → emit only local top-k at the end
        parts: list[pd.DataFrame] = []
        for batch in batches:
            ids = batch["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(list(batch["embedding"]), dtype=np.float64)
            if len(mat) == 0:
                continue
            norms = np.linalg.norm(mat, axis=1)
            scores = (q_mat @ mat.T) / (q_norm[:, None] * norms[None, :])
            for qi, qid in enumerate(q_ids):
                mask = ids != qid
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "vec_id": ids[mask],
                            "cosine": scores[qi][mask],
                        }
                    )
                )
        if not parts:
            return
        allp = pd.concat(parts, ignore_index=True)
        # local top-k per query: the map-side combine
        allp = (
            allp.sort_values(["query_id", "cosine", "vec_id"], ascending=[True, False, True])
            .groupby("query_id", sort=False)
            .head(k)
        )
        yield allp

    local = embeddings.select("vec_id", "embedding").mapInPandas(kernel, SCORES_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        local.withColumn("k_rank", F.row_number().over(w))
        .filter(F.col("k_rank") <= k)
        .select("query_id", "vec_id", "cosine", "k_rank")
    )


ASSIGN_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("cell", T.LongType()),
    ]
)


def assign_cells_gemm(vectors: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """Nearest-centroid (argmin L2) assignment as one BLAS matmul per
    Arrow batch — the kernel that replaces the expression-fold
    assignment when embedding volume makes the O(n·k·d) interpreted
    fold the bottleneck.

    ``centroids`` is the bounded trained model ((cid, vector) pairs,
    k rows — the one sanctioned driver-side collect); it rides into
    each task via closure capture, serialized once per task, never per
    row. Per batch: ||x−c||² = ||x||² − 2·x·c + ||c||², and the
    ||x||² term is constant across centroids so argmin needs only the
    GEMM term and the centroid norms. Ties break to the smallest cid
    (centroids sorted by cid; np.argmin returns the first minimum) —
    the same deterministic rule as the expression path
    (plans/analytics_wave4._kmeans_assign), asserted equal in
    tests/test_vector_search.py.
    """
    order = sorted(range(len(centroids)), key=lambda i: centroids[i][0])
    cid = np.array([centroids[i][0] for i in order], dtype=np.int64)
    cmat = np.array([centroids[i][1] for i in order], dtype=np.float64)
    cnorm2 = (cmat * cmat).sum(axis=1)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            ids = batch["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(list(batch["embedding"]), dtype=np.float64)
            d2 = cnorm2[None, :] - 2.0 * (mat @ cmat.T)
            yield pd.DataFrame({"vec_id": ids, "cell": cid[np.argmin(d2, axis=1)]})

    return vectors.select("vec_id", "embedding").mapInPandas(kernel, ASSIGN_SCHEMA)
