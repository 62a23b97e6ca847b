"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
public paper) as a distributed Spark pipeline.

Selects raw-corpus documents that look like a TARGET domain (e.g.
wiki/books) by importance weights under hashed n-gram bag-of-words
models:

1. featurize: word unigrams + bigrams hashed into ``n_buckets``
   (the paper's hashed n-gram features);
2. fit: bucket-count vectors for the target sample (p) and a raw
   sample (q), Laplace-smoothed — both via ONE distributed pass per
   table: an Arrow UDF emits per-batch (bucket, count) pairs and a
   groupBy(bucket).sum reduces them (shuffle volume ≤ n_buckets per
   partition, never corpus-sized);
3. weight: log w(x) = Σ_f count_f(x) · (log p_f − log q_f).  The
   log-ratio vector λ (n_buckets floats, ~0.5 MB at 2^16) ships in
   the UDF closure, so scoring is one Arrow pass with NO join and no
   sparse-vector materialization;
4. resample: the paper's Gumbel-top-k — rank by
   log w(x) + Gumbel(md5(salt‖id)) and keep the top n.  The Gumbel
   noise is derived from a content hash (operators/sampling.py's
   determinism convention), so the selected set is a pure function
   of (corpus, target, salt) — reproducible across engines, retries
   and cluster sizes.

Scale shape: two bounded fit passes (sample-scan + ≤n_buckets-row
shuffle), one map-only scoring pass, one top-n (map-side-pruned window
rank via operators/knn._topk).  No all-pairs, no driver loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_RE = r"[a-z0-9']+"


def _hash_ngrams(texts: "pd.Series", n_buckets: int) -> list[np.ndarray]:
    """Per-doc hashed unigram+bigram bucket ids (with repeats — the
    count vector is implicit).  zlib.crc32 is stable across
    processes/versions (unlike ``hash()``), cheap, and well-mixed
    enough for bucketing."""
    import re
    import zlib

    pat = re.compile(_WORD_RE)
    crc = zlib.crc32
    out = []
    for t in texts:
        toks = pat.findall((t or "").lower())
        # bigram crc WITHOUT building the joined string: crc32 is a
        # running checksum, so crc32("a b") == crc32(" b", crc32("a"))
        # — reuse each token's crc as the bigram seed (r7: ~35% less
        # python work per doc; values identical, the tests' python
        # recount still hashes the literal joined gram)
        tb = [w.encode() for w in toks]
        crcs = [crc(b) for b in tb]
        bis = [crc(b" " + tb[i + 1], crcs[i]) for i in range(len(tb) - 1)]
        ids = np.array(crcs + bis, dtype=np.int64)
        out.append(ids % n_buckets if len(ids) else ids)
    return out


def fit_hashed_counts(
    df: DataFrame, text_col: str, n_buckets: int = 1 << 16
) -> np.ndarray:
    """Bucket-count vector over a corpus/sample: Arrow UDF → exploded
    (bucket, count) partials → groupBy(bucket).sum → ≤ n_buckets rows
    collected.  Returns float64[n_buckets]."""

    @F.pandas_udf("map<bigint,bigint>")
    def _counts(texts: pd.Series) -> pd.Series:
        rows = []
        for ids in _hash_ngrams(texts, n_buckets):
            b, c = np.unique(ids, return_counts=True)
            rows.append(dict(zip(b.tolist(), c.tolist())))
        return pd.Series(rows)

    agg = (
        df.select(F.explode(_counts(F.col(text_col))).alias("bucket", "cnt"))
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    out = np.zeros(n_buckets, dtype=np.float64)
    for r in agg:
        out[r["bucket"]] = r["cnt"]
    return out


def dsir_log_weight_udf(
    target_counts: np.ndarray, raw_counts: np.ndarray, smoothing: float = 1.0
):
    """Arrow UDF: text → log importance weight under the fitted
    models.  λ = log p̂ − log q̂ (Laplace-smoothed) ships in the
    closure — scoring is map-only."""
    n_buckets = len(target_counts)
    p = (target_counts + smoothing) / (target_counts.sum() + smoothing * n_buckets)
    q = (raw_counts + smoothing) / (raw_counts.sum() + smoothing * n_buckets)
    lam = np.log(p) - np.log(q)

    @F.pandas_udf("double")
    def _w(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [float(lam[ids].sum()) for ids in _hash_ngrams(texts, n_buckets)]
        )

    return _w


def cross_entropy_udf(target_counts: np.ndarray, smoothing: float = 1.0):
    """Per-token cross-entropy of a document under the hashed n-gram
    TARGET model — the CCNet-style quality signal (Wenzek et al. 2020
    bucket corpora by target-LM perplexity; a hashed unigram+bigram
    bag model is the engine-native stand-in for KenLM, which isn't in
    this environment).  Lower = more target-like.  Map-only Arrow
    pass; the log-prob vector ships in the closure.  Empty docs score
    +inf-ish via the uniform-model entropy."""
    n_buckets = len(target_counts)
    p = (target_counts + smoothing) / (target_counts.sum() + smoothing * n_buckets)
    logp = np.log(p)
    uniform = float(-np.log(1.0 / n_buckets))

    @F.pandas_udf("double")
    def _ce(texts: pd.Series) -> pd.Series:
        out = []
        for ids in _hash_ngrams(texts, n_buckets):
            out.append(float(-logp[ids].mean()) if len(ids) else uniform)
        return pd.Series(out)

    return _ce


def _gumbel_col(key: Column, salt: str) -> Column:
    """Deterministic Gumbel(0,1) noise from a content hash: u =
    md5-derived uniform in (0,1), g = -log(-log u).  Pure Column
    arithmetic (conv of the first 15 hex chars), no Python."""
    u = (F.conv(F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 15), 16, 10)
         .cast("double") + F.lit(1.0)) / F.lit(float(16 ** 15 + 2))
    return -F.log(-F.log(u))


def dsir_resample(
    df: DataFrame,
    target: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1 << 16,
    smoothing: float = 1.0,
    temperature: float = 1.0,
    salt: str = "dsir",
    raw_fit_sample: DataFrame | None = None,
) -> DataFrame:
    """Top-``n`` documents by Gumbel-perturbed importance weight —
    the DSIR selection.  ``raw_fit_sample`` bounds the q-model fit
    scan (defaults to ``df`` itself; at 100 TB pass a hash-bucket
    sample, the ivf_train_sample pattern).  Output: df columns +
    ``dsir_log_w`` + ``dsir_rank``."""
    from earth_data_kit_spark.operators.knn import _topk

    tc = fit_hashed_counts(target, text_col, n_buckets)
    qc = fit_hashed_counts(raw_fit_sample or df, text_col, n_buckets)
    w = dsir_log_weight_udf(tc, qc, smoothing)
    scored = df.withColumn("dsir_log_w", w(F.col(text_col))).withColumn(
        "_g",
        F.col("dsir_log_w") / F.lit(float(temperature))
        + _gumbel_col(F.col(id_col), salt),
    )
    # global top-n: _topk with one pseudo-query — the row_number<=n
    # filter plans a map-side WindowGroupLimit, so each partition
    # forwards only its own top-n into the single final rank (r7:
    # the previous bucketed two-level rank shuffled B x more rows)
    ranked = _topk(
        scored.withColumn("_q", F.lit(1)),
        n,
        id_col,
        qid_col="_q",
        order_col="_g",
        descending=True,
    ).select(id_col, F.col("rank").alias("dsir_rank"))
    # join the n-row rank table back to the RAW corpus and score only
    # the survivors: the r6 shape joined into `scored`, re-running the
    # hashing UDF over the whole corpus a second time (ADVICE r6
    # medium) — scoring n rows costs O(n), not O(corpus).  Broadcast
    # only while n is bounded; a multi-million-row selection falls
    # back to a shuffle equi-join (the broadcast would OOM the
    # driver at the operator's stated 100 TB scale).
    j = F.broadcast(ranked) if n <= 1_000_000 else ranked
    sel = df.join(j, id_col)
    return sel.withColumn("dsir_log_w", w(F.col(text_col))).select(
        *df.columns, "dsir_log_w", "dsir_rank"
    )
