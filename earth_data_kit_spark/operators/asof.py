"""As-of / nearest join — the reference's ``.sel(method="nearest")``
label lookup (SURVEY.md §2.5, /root/reference/tests/ndarray/
test_indexing.py:43-49) generalized to the classic streaming/finance
as-of join Spark lacks natively.

Spark-first plan (the union trick — one shuffle, no UDF):
  1. tag probe rows (is_probe=1) and event rows (is_probe=0),
     union by name;
  2. one window per ``by`` key ordered by (ts, is_probe) — events
     sort before probes at equal ts, giving ≤-semantics;
  3. ``last(payload, ignorenulls=True)`` carries the latest event
     payload forward onto each probe row;
  4. keep probe rows.

Shuffle analysis: exactly one hash partition by ``by`` over
|probes|+|events| narrow rows; with the events table bucketed by the
key it is co-located.  Skew: per-key state in the window is O(1)
(running last), so hot keys cost time, not memory; salting is not
needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_latest(
    probes: DataFrame,
    events: DataFrame,
    by: str,
    ts_col: str = "ts",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """For each probe row, attach the payload of the latest event with
    ``event.ts <= probe.ts`` and the same ``by`` key (left-join
    semantics: probes with no prior event keep null payloads).

    ``probes``: columns (by, ts_col, ...kept as-is)
    ``events``: columns (by, ts_col, *payload_cols)
    """
    payload_cols = payload_cols or [
        c for c in events.columns if c not in (by, ts_col)
    ]
    probe_cols = [c for c in probes.columns]

    l = probes.withColumn("_is_probe", F.lit(1))
    r = events.select(
        by, ts_col, *payload_cols
    ).withColumn("_is_probe", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts_col).asc(), F.col("_is_probe").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(F.when(F.col("_is_probe") == 0, F.col(c)), ignorenulls=True)
        .over(w)
        .alias(f"asof_{c}")
        for c in payload_cols
    ]
    return (
        u.select("*", *carried)
        .where(F.col("_is_probe") == 1)
        .select(*probe_cols, *[f"asof_{c}" for c in payload_cols])
    )
