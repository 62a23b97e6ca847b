"""Driver-style oracle check: run declared queries in a PLAIN Spark
session (no session.py defaults — notably NO Arrow, matching the
correctness driver) and compare row-for-row against the DuckDB oracle.

Usage:
    python scripts/oracle_check.py [--sf /root/testdata/sf0.001] [names...]

With no names, checks every declared query.  Exit code 1 on any
mismatch.  This is a builder-side tool; the real gate is the driver's.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def _compare(sdf: pd.DataFrame, ddf: pd.DataFrame) -> str | None:
    sdf, ddf = _normalize(sdf), _normalize(ddf)
    if list(sdf.columns) != list(ddf.columns):
        return f"columns {list(sdf.columns)} vs {list(ddf.columns)}"
    if len(sdf) != len(ddf):
        return f"rows {len(sdf)} vs {len(ddf)}"
    for c in sdf.columns:
        a, b = sdf[c].values, ddf[c].values
        if np.issubdtype(sdf[c].dtype, np.floating):
            if not np.allclose(
                a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True
            ):
                return f"float col {c} diverges"
        else:
            if not (a == b).all():
                return f"col {c} diverges"
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    # sf0.01 is the driver's correctness scale (sf0.001 differs for
    # recall-dependent ANN rows: sim_ivf_ann's nprobe=12/nlist=32 has
    # recall 1.0 at sf0.01 — the gated config — but not at sf0.001)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # deliberately bare: the correctness driver does not apply
    # session.py's Arrow/AQE defaults, and engine correctness must not
    # depend on them
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("oracle-check")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)

    con = duckdb.connect()
    for p in sorted(Path(args.sf).glob("*.parquet")):
        con.execute(
            f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')"
        )

    failed = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
            ddf = con.execute(oracles[name]).fetchdf()
            err = _compare(sdf, ddf)
        except Exception as e:  # noqa: BLE001
            err = f"EXC {type(e).__name__}: {e}"
            sdf = ddf = pd.DataFrame()
        dt = time.time() - t0
        status = "OK " if err is None else "FAIL"
        print(
            f"{status} {name:28s} spark={len(sdf):6d} oracle={len(ddf):6d} "
            f"{dt:6.1f}s {err or ''}",
            flush=True,
        )
        if err is not None:
            failed.append(name)
    spark.stop()
    if failed:
        print("FAILED:", ", ".join(failed))
        return 1
    print(f"all {len(names)} queries match the oracle")
    return 0


if __name__ == "__main__":
    sys.exit(main())
