"""Deterministic sampling for training-data curation.

Random sampling (`df.sample`, `sampleBy`) is partition-order-
dependent and engine-specific — unusable when the sample must be
reproducible across reruns, engines, and cluster sizes (the property
a curation pipeline needs for auditability).  These operators order
rows by a CONTENT-derived md5 rank instead: the "randomness" is the
hash, so any engine computing md5 draws the identical sample.

Scale shape: one window per stratum (hash-uniform within, so no
skew beyond the strata sizes themselves); the rank column also
serves as a stable shuffle/sort key for downstream splits.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_rank_col(key: Column, salt: str = "") -> Column:
    """md5(salt ‖ key) — the deterministic pseudo-random order key.
    md5 is identical across Spark/DuckDB/python, unlike xxhash64
    (Spark-only) or rand() (nondeterministic under retries)."""
    return F.md5(F.concat(F.lit(salt), key.cast("string")))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """The first ``n_per_stratum`` rows per stratum in md5 order —
    a reproducible stratified sample (rows carry ``sample_rank``).
    Ties are impossible for distinct keys (md5 collisions aside), so
    the sample is exactly determined by (salt, keys)."""
    w = Window.partitionBy(strata_col).orderBy(
        hash_rank_col(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n_per_stratum)
    )


def deterministic_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Train/val/test-style split: buckets rows by the first 6 hex
    chars of the md5 rank (uniform in [0, 1)), assigning each row to
    the split whose cumulative fraction range contains it.  Stable
    under reruns, retries, and engine changes; adds ``split``."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = F.conv(F.substring(hash_rank_col(F.col(key_col), salt), 1, 6), 16, 10).cast(
        "double"
    ) / float(0xFFFFFF + 1)
    expr = None
    acc = 0.0
    last = list(fractions)[-1]
    for name, frac in fractions.items():
        acc += frac
        cond = u < acc
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    return df.withColumn("split", F.coalesce(expr, F.lit(last)))


def temperature_mixture(counts: dict, total_rows: int, alpha: float = 0.5) -> dict:
    """Temperature-scaled mixture weights over sources — the public
    multilingual-LM mixing rule (p_s ∝ n_s^α, α<1 upweights small
    sources; XLM-R / mT5 methodology).  Given per-source row counts
    and a target budget, returns per-source
    {target, keep_frac, n_repeats}:

    * ``keep_frac`` ≤ 1 — the without-replacement sampling fraction;
    * ``n_repeats`` ≥ 1 — the whole-epoch repeat factor when the
      target EXCEEDS the source (upsampling a small source means
      seeing it multiple times; the fractional remainder is drawn by
      keep_frac on the final repeat).
    """
    if not counts or total_rows <= 0:
        return {}
    w = {s: float(n) ** alpha for s, n in counts.items()}
    z = sum(w.values())
    out = {}
    for s, n in counts.items():
        target = total_rows * w[s] / z
        # ceil on the FLOAT target: int-truncating first undercounts
        # n_repeats by 1 whenever target is fractionally above an
        # exact multiple of n (e.g. target=200.3, n=100), and the
        # keep_frac clamp then silently drops the remainder (ADVICE r4)
        n_rep = max(1, math.ceil(target / max(n, 1)))
        out[s] = {
            "target": target,
            "n_repeats": n_rep,
            # fraction drawn from the LAST repeat (full repeats keep 1.0)
            "keep_frac": min(1.0, (target - (n_rep - 1) * n) / n),
        }
    return out


def mixture_sample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    total_rows: int,
    alpha: float = 0.5,
    salt: str = "",
    counts: dict | None = None,
) -> tuple[DataFrame, dict]:
    """Realize a temperature-α mixture deterministically: each row is
    kept when its md5-uniform u(key) falls below its source's
    keep_frac — content-derived, so the identical sample is drawn on
    any engine, at any cluster size, under any retry.  Downsampling
    only (n_repeats > 1 sources pass whole and report the repeat
    factor for the training loader; realizing repeats here would
    duplicate storage).  One tiny counts aggregation + one broadcast
    join + one map-side filter — no corpus shuffle.

    Returns (sampled df + ``mix_keep_frac``/``mix_n_repeats`` cols,
    the mixture table)."""
    if counts is None:
        counts = {
            r[source_col]: r["n"]
            for r in df.groupBy(source_col).agg(F.count("*").alias("n")).collect()
        }
    mix = temperature_mixture(counts, total_rows, alpha)
    spark = df.sparkSession
    mix_df = spark.createDataFrame(
        [(s, m["keep_frac"], m["n_repeats"]) for s, m in mix.items()],
        f"{source_col} string, mix_keep_frac double, mix_n_repeats int",
    )
    u = F.conv(
        F.substring(hash_rank_col(F.col(key_col), salt), 1, 6), 16, 10
    ).cast("double") / float(0xFFFFFF + 1)
    # LEFT join + executor-side assert: an externally supplied counts
    # dict that omits a source present in df must FAIL LOUDLY, not
    # silently drop the source's rows via the inner join (ADVICE r4).
    # assert_true lives inside the filter so Catalyst cannot prune it.
    guard = F.assert_true(
        F.col("mix_keep_frac").isNotNull(),
        F.concat(
            F.lit("mixture_sample: source absent from counts: "),
            F.col(source_col).cast("string"),
        ),
    )
    out = (
        df.join(F.broadcast(mix_df), source_col, "left")
        .where(guard.isNull() & ((F.col("mix_n_repeats") > 1) | (u < F.col("mix_keep_frac"))))
    )
    return out, mix
