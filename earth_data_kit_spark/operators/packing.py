"""Sequence packing: fill fixed token-budget training sequences.

Training pipelines don't feed documents one-per-sequence — they pack
them into context-window-sized sequences to avoid padding waste.
Optimal bin packing is NP-hard and inherently global; the standard
practice at corpus scale is greedy first-fit-decreasing (FFD) within
independent shards.  The Spark-first shape:

  1. token counts via the shared Arrow tokenizer (one map-only pass);
  2. shard by ``pmod(xxhash64(id), shards)`` — deterministic,
     retry-safe (same salting rule as salted_hot_keys: never rand());
  3. FFD inside each shard via ``applyInPandas`` (the only Python,
     one Arrow batch per shard);
  4. sequence ids are (shard << 32 | local bin) — globally unique
     without any coordination.

Shard independence costs a bounded amount of packing efficiency (at
most one under-full bin per shard, so waste ≤ shards·max_tokens
tokens over the whole corpus — negligible when shards ≪ corpus/
max_tokens) and buys full parallelism with zero shuffles beyond the
shard exchange.  Oversized documents (> max_tokens) get a solo
sequence flagged ``oversize`` — policy (truncate/split) belongs to
the caller.

No reference analog (no text pipeline in the reference); build-brief
training-data operator.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from earth_data_kit_spark.functions.udfs import token_count_udf


def ffd_pack(items: list[tuple[int, int]], max_tokens: int) -> dict[int, int]:
    """First-fit-decreasing on (id, n_tokens) pairs → {id: bin}.

    Deterministic: items sort by (−tokens, id); bins are scanned
    first-fit.  Pure python so the Spark path and the test oracle
    share one implementation (the distribution is what's under test,
    not the packer)."""
    bins: list[int] = []  # remaining capacity per bin
    out: dict[int, int] = {}
    for did, tok in sorted(items, key=lambda p: (-p[1], p[0])):
        if tok > max_tokens:
            bins.append(-1)  # solo and CLOSED: -1 < any tok ≥ 0, so
            # even zero-token docs can't join an oversize bin
            out[did] = len(bins) - 1
            continue
        for b, cap in enumerate(bins):
            if cap >= tok:
                bins[b] = cap - tok
                out[did] = b
                break
        else:
            bins.append(max_tokens - tok)
            out[did] = len(bins) - 1
    return out


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, seq_id, oversize) — every document assigned
    to exactly one packed sequence of ≤ ``max_tokens`` tokens.

    Pass ``token_col`` when token counts are already stored (the at-
    scale layout: count once at ingest) to skip the tokenizer pass.
    """
    if token_col is None:
        docs = docs.withColumn("n_tokens", token_count_udf(F.col(text_col)))
        token_col = "n_tokens"
    id_type = docs.schema[id_col].dataType.simpleString()  # string ids work too
    counted = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(token_col).cast("long").alias("n_tokens"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards)).alias("shard"),
    )

    def _pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        assign = ffd_pack(
            list(zip(pdf["doc_id"].tolist(), pdf["n_tokens"].tolist())), max_tokens
        )
        pdf = pdf.copy()
        pdf["seq_id"] = pdf["doc_id"].map(lambda d: (shard << 32) | assign[d])
        pdf["oversize"] = pdf["n_tokens"] > max_tokens
        return pdf[["doc_id", "n_tokens", "seq_id", "oversize"]]

    return counted.groupBy("shard").applyInPandas(
        _pack, f"doc_id {id_type}, n_tokens long, seq_id long, oversize boolean"
    )


def packing_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """One row: (n_docs, n_seqs, fill_rate, n_oversize) — fill_rate =
    packed tokens / (sequences × max_tokens) over the NON-oversize
    sequences only (an oversize sequence is truncated downstream, so
    counting its raw tokens would overstate fill); 0.0 when every
    sequence is oversize (the ratio is otherwise 0/0 → null).  The
    padding-waste metric packing exists to optimize."""
    per_seq = packed.groupBy("seq_id").agg(
        F.count("*").alias("n_docs_seq"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.max(F.col("oversize").cast("int")).alias("has_oversize"),
    )
    return per_seq.agg(
        F.sum("n_docs_seq").alias("n_docs"),
        F.sum(F.lit(1)).alias("n_seqs"),
        F.sum("has_oversize").alias("n_oversize"),
        # guard the denominator explicitly: under ANSI mode (Spark 4
        # default) 0/0 THROWS rather than yielding null, so the
        # all-oversize case must never reach the division
        F.when(
            F.sum(F.when(F.col("has_oversize") == 0, 1).otherwise(0)) > 0,
            F.sum(F.when(F.col("has_oversize") == 0, F.col("seq_tokens")).otherwise(0))
            / (F.sum(F.when(F.col("has_oversize") == 0, 1).otherwise(0)) * max_tokens),
        ).otherwise(F.lit(0.0)).alias("fill_rate"),
    )
