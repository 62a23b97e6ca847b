"""Discovery: source-template expansion, date re-extraction, temporal
bucketing — the reference's scan/index pipeline (SURVEY.md §3.1) as
one declarative DataFrame plan.

Reference analogs (/root/reference/earth_data_kit/stitching/):
* time expansion  — engines/s3.py:39-181 (S2): strftime tokens in the
  source template → date_range at the smallest granularity → one
  search path per step.  Here: ``F.sequence`` + ``date_format``.
  At scale this IS partition pruning on a ts-partitioned table.
* space expansion — engines/s3.py:183-221 (S3): {var} tokens filtered
  by bbox intersection against a grid dataframe, substituted into
  paths.  Here: broadcast crossJoin + regexp_replace.
* date re-extraction — engines/s3.py:324-373 (S5): build a regex from
  the strftime template, parse listed keys back into timestamps
  (day-of-year %j handled), epoch sentinel for non-temporal.
* temporal bucketing — engines/commons.py:37-54 (A1): half-open
  [t, t+res) buckets anchored at the range start (the reference's
  O(buckets×rows) loop becomes one column expression).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# strftime token → (spark date_format pattern, regex, granularity rank)
_TOKENS = {
    "%Y": ("yyyy", r"(?P<year>\d{4})", 0),
    "%m": ("MM", r"(?P<month>\d{2})", 2),
    "%d": ("dd", r"(?P<day>\d{2})", 3),
    "%j": ("DDD", r"(?P<doy>\d{3})", 3),
    "%H": ("HH", r"(?P<hour>\d{2})", 4),
    "%M": ("mm", r"(?P<minute>\d{2})", 5),
}
_GRANULARITY_INTERVAL = {
    0: "interval 1 year",
    2: "interval 1 month",
    3: "interval 1 day",
    4: "interval 1 hour",
    5: "interval 1 minute",
}


def template_granularity(source: str) -> int | None:
    """Smallest time component present (s3.py:139-171 semantics)."""
    ranks = [rank for tok, (_, _, rank) in _TOKENS.items() if tok in source]
    return max(ranks) if ranks else None


def expand_time(
    spark: SparkSession, source: str, start: str, end: str
) -> DataFrame:
    """One (date, search_path) row per time step in [start, end].

    The template's strftime tokens are rewritten via date_format, so
    the whole expansion is a single generated-column expression —
    no driver loop (compare s3.py:173-181).
    """
    rank = template_granularity(source)
    if rank is None:
        return spark.createDataFrame(
            [(None, source)], "date timestamp, search_path string"
        )
    interval = _GRANULARITY_INTERVAL[rank]
    dates = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(end).cast("timestamp"),
                F.expr(interval),
            )
        ).alias("date")
    )
    # build the path by splicing date_format output into the template
    parts: list[Column] = []
    buf = ""
    i = 0
    while i < len(source):
        if source[i] == "%" and source[i : i + 2] in _TOKENS:
            if buf:
                parts.append(F.lit(buf))
                buf = ""
            parts.append(F.date_format("date", _TOKENS[source[i : i + 2]][0]))
            i += 2
        else:
            buf += source[i]
            i += 1
    if buf:
        parts.append(F.lit(buf))
    return dates.select("date", F.concat(*parts).alias("search_path"))


def expand_space(
    patterns: DataFrame,
    grid: DataFrame,
    bbox: tuple[float, float, float, float],
    variables: list[str],
) -> DataFrame:
    """Substitute {var} tokens with grid-cell values for cells whose
    bbox intersects the query bbox (s3.py:183-221).  The grid is tiny
    (MODIS: ~460 rows) → broadcast crossJoin; at scale this becomes
    partition pruning on a cell-partitioned table."""
    xmin, ymin, xmax, ymax = bbox
    g = grid.where(
        (F.col("minx") <= xmax)
        & (F.col("maxx") >= xmin)
        & (F.col("miny") <= ymax)
        & (F.col("maxy") >= ymin)
    )
    out = patterns.crossJoin(F.broadcast(g))
    path = F.col("search_path")
    for v in variables:
        path = F.regexp_replace(path, re.escape("{" + v + "}"), F.col(v))
    return out.withColumn("search_path", path)


def date_regex_from_template(template: str) -> str:
    """strftime template → named-group regex (s3.py:324-335 S5/F2)."""
    out = re.escape(template)
    for tok, (_, rx, _) in _TOKENS.items():
        out = out.replace(re.escape(tok), rx)
    # unescape the glob wildcards the reference allows
    out = out.replace(re.escape("*"), r"[^/]*").replace(re.escape("?"), ".")
    for v in set(re.findall(r"\\\{(\w+)\\\}", out)):
        out = out.replace(r"\{" + v + r"\}", r"[^/]*")
    return out


def extract_dates(listing: DataFrame, template: str, path_col: str = "path") -> DataFrame:
    """Parse timestamps back out of listed keys (S5, s3.py:324-373):
    %j day-of-year composes via date_add(make_date(y,1,1), doy-1);
    missing components default like the reference (epoch parts)."""
    rx = date_regex_from_template(template)
    # Spark regexp_extract uses group indexes; map names → index
    order = re.findall(r"\(\?P<(\w+)>", rx)
    spark_rx = re.sub(r"\(\?P<\w+>", "(", rx)

    def grp(name: str) -> Column:
        if name not in order:
            return F.lit(None)
        return F.regexp_extract(F.col(path_col), spark_rx, order.index(name) + 1)

    year = F.coalesce(grp("year").cast("int"), F.lit(1970))
    month = F.coalesce(grp("month").cast("int"), F.lit(1))
    day = F.coalesce(grp("day").cast("int"), F.lit(1))
    hour = F.coalesce(grp("hour").cast("int"), F.lit(0))
    minute = F.coalesce(grp("minute").cast("int"), F.lit(0))
    base = F.make_timestamp(year, month, day, hour, minute, F.lit(0))
    if "doy" in order:
        date = F.to_timestamp(
            F.date_add(F.make_date(year, F.lit(1), F.lit(1)), grp("doy").cast("int") - 1)
        )
    else:
        date = base
    return listing.withColumn("date", date)


def bucket_temporally(
    df: DataFrame, ts_col: str, start: str, resolution: str
) -> DataFrame:
    """A1 (engines/commons.py:37-54): assign each timestamp to the
    half-open bucket [t, t+resolution) anchored at ``start``.

    ``resolution`` is a SQL interval string like '1 day'.  Expressed
    with epoch arithmetic so it matches the SQL mirror
    (functions/columns.py time_bucket_sql) and stays codegen'd.
    """
    res_s = F.expr(f"unix_timestamp(timestamp'1970-01-01 00:00:00' + interval {resolution})")
    start_s = F.unix_timestamp(F.lit(start).cast("timestamp"))
    ts_s = F.unix_timestamp(F.col(ts_col))
    bucket = start_s + F.floor((ts_s - start_s) / res_s) * res_s
    return df.withColumn("bucket", F.timestamp_seconds(bucket))
