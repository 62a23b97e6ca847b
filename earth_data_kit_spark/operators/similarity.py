"""Similarity search over an embedding column (array<float>).

* ``cosine_topk_bruteforce`` — the exact baseline: broadcast the
  query vectors, compute cosine as a pure Column expression
  (zip_with + aggregate → whole-stage codegen, no Python), window
  top-k.  One scan of the corpus, zero shuffles of the corpus side;
  the only shuffle is the window partitioned by query id.
* ``cosine_topk_lsh`` — the scale path: sign-random-projection (SRP)
  buckets (Charikar 2002) restrict the candidate set; exact cosine
  re-rank inside buckets.  Probing multiple buckets (the query's own
  + hamming-1 neighbors) trades recall for cost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from earth_data_kit_spark.partitioning import ensure_parallelism


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float> columns — JVM-side only:
    dot/(|a||b|), all via higher-order functions (no UDF)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


def cosine_topk_bruteforce(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact top-k: (query_id, rank, <id_col>, cosine)."""
    w = Window.partitionBy(qid_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        ensure_parallelism(emb).crossJoin(F.broadcast(queries))
        .withColumn("cosine", cosine_col(F.col(vec_col), F.col(qvec_col)))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "cosine")
    )


_SRP_SEED = 1234


def _srp_planes(n_planes: int, dim: int, table: int = 0) -> np.ndarray:
    rng = np.random.default_rng(_SRP_SEED + table)
    return rng.standard_normal((dim, n_planes))


def srp_bucket_udf(n_planes: int = 16, dim: int = 64, table: int = 0):
    """Sign-random-projection bucket id (deterministic planes)."""

    @F.pandas_udf("bigint")
    def _bucket(vec: pd.Series) -> pd.Series:
        planes = _srp_planes(n_planes, dim, table)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vec])
        signs = (m @ planes) > 0
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series(signs @ weights)

    return _bucket


def srp_multi_bucket_udf(n_planes: int, dim: int, n_tables: int):
    """All L table buckets in one Arrow pass: array of
    ``table*2^n_planes + bucket`` keys (one matmul for all tables)."""

    @F.pandas_udf("array<bigint>")
    def _buckets(vec: pd.Series) -> pd.Series:
        planes = np.concatenate(
            [_srp_planes(n_planes, dim, t) for t in range(n_tables)], axis=1
        )  # dim × (L*P)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vec])
        signs = (m @ planes) > 0  # n × (L*P)
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        out = []
        for row in signs.reshape(len(m), n_tables, n_planes):
            out.append([int(t << n_planes | int(row[t] @ weights)) for t in range(n_tables)])
        return pd.Series(out)

    return _buckets


def cosine_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Approximate top-k with L independent SRP tables (classic
    multi-table LSH: recall grows as 1-(1-p^P)^L while cost stays
    L × bucket size).  The corpus bucketing is one Arrow pass and is
    reusable as a persisted index column at scale; candidates are
    deduped before the exact re-rank."""
    bucketer = srp_multi_bucket_udf(n_planes, dim, n_tables)
    corpus = ensure_parallelism(emb).withColumn("bucket", F.explode(bucketer(F.col(vec_col))))
    q = queries.withColumn("bucket", F.explode(bucketer(F.col(qvec_col))))
    cand = corpus.join(F.broadcast(q), "bucket").dropDuplicates([qid_col, id_col])
    w = Window.partitionBy(qid_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("cosine", cosine_col(F.col(vec_col), F.col(qvec_col)))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "cosine")
    )
