"""Snapshot-versioned catalog on parquet — the Iceberg seam.

The reference persists its discover output to ``catalog.csv`` and
re-reads it in every later stage (SURVEY.md S12, /root/reference/
earth_data_kit/stitching/classes/dataset.py:279-284, 370-385); its
EDKDataset JSON (S13) is a hand-rolled snapshot index.  The proper
table-format semantics are Iceberg's; the sandbox has no Iceberg jar,
so this module provides the same contract on parquet + an atomically
replaced manifest (``os.replace``):

  * every write is a new immutable snapshot directory,
  * the manifest names the current snapshot + full history,
  * readers pin a snapshot (time travel) or follow current,
  * rollback = manifest pointer move,
  * per-file column ranges harvested from parquet footers at commit
    (``stats_cols``) → ``scan()`` skips files before Spark lists
    them — Iceberg's manifest-stats data skipping.

Swap-to-Iceberg: replace write()/read() bodies with
``df.writeTo(table)`` / ``spark.read.table(table)`` — the call sites
don't change (SURVEY.md §7.4-6).
"""

from __future__ import annotations

import fcntl
import json
import os
import time
import uuid
from contextlib import contextmanager
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def _stat_value(v):
    """JSON-storable form of a parquet min/max, or None if the type
    has no faithful, comparison-preserving JSON encoding.  datetimes/
    dates become ISO strings (lexicographic == chronological, so
    scan()'s interval test still works against ISO-string ranges);
    bytes and anything exotic drop to None → the file is kept
    conservatively rather than mis-pruned."""
    import datetime
    import decimal

    if isinstance(v, bool) or v is None:
        return None  # boolean ranges are useless for pruning
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    return None


def _collect_file_stats(snap_dir: Path, cols: list[str]) -> dict:
    """Per-file [min, max] for ``cols`` from parquet FOOTERS — no data
    pages are read (pyarrow exposes the row-group statistics the
    writer already embedded).  Driver-side loop over the snapshot's
    files: bounded by file count, not rows — the same work an Iceberg
    writer does when it builds its manifest.  Values are sanitized to
    JSON-storable forms HERE (inside the commit's try block) so a
    non-serializable stat can never fail the commit after the
    snapshot rename."""
    import pyarrow.parquet as pq

    out: dict[str, dict[str, list]] = {}
    for f in sorted(snap_dir.glob("*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        file_stats: dict[str, list] = {}
        for col in cols:
            ci = names.get(col)
            if ci is None:
                continue
            lo = hi = None
            ok = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            lo, hi = _stat_value(lo), _stat_value(hi)
            if ok and lo is not None and hi is not None:
                file_stats[col] = [lo, hi]
        out[f.name] = file_stats
    # fail HERE (caller's try block cleans the in-flight dir) rather
    # than after the snapshot rename if anything slipped through
    json.dumps(out)
    return out


class Catalog:
    def __init__(self, base_dir: str):
        self.base = Path(base_dir)
        self.base.mkdir(parents=True, exist_ok=True)

    def _manifest_path(self, table: str) -> Path:
        return self.base / table / "manifest.json"

    def _load_manifest(self, table: str) -> dict:
        p = self._manifest_path(table)
        if not p.exists():
            return {"current": None, "history": []}
        return json.loads(p.read_text())

    @contextmanager
    def _commit_lock(self, table: str):
        """Serializes manifest read-modify-write across WRITERS (flock
        on a sidecar file — released on close even if the holder
        dies).  Readers never take it: they read one immutable
        manifest state via the atomic os.replace, Iceberg's
        snapshot-isolation contract."""
        d = self.base / table
        d.mkdir(parents=True, exist_ok=True)
        fd = os.open(str(d / ".commit.lock"), os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            os.close(fd)  # releases the flock

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "replace",
        stats_cols: list[str] | None = None,
    ) -> int:
        """Commit a new snapshot; returns its id.  ``append`` reads
        the current snapshot and unions (storage-level append would
        just add files; kept simple and explicit here).

        Concurrency-safe commit protocol (the Iceberg analog):
        REPLACE writes its data into a uniquely named in-flight
        directory WITHOUT any lock (the long part), then the manifest
        read-modify-write — rename in-flight dir to snap-{id}, append
        history, flip current — happens under the table's commit
        lock, so two writers interleaving never lose each other's
        snapshots.  APPEND holds the lock across read-current + union
        + write too: its read of the current snapshot is part of the
        transaction — done outside the lock, two concurrent appends
        would each union the SAME base and the second commit would
        silently drop the first's rows from current (they'd survive
        only as an orphaned history snapshot).  Appends therefore
        serialize; that is the price of read-modify-write without a
        real table format, and exactly what Iceberg's
        validate+retry commit loop replaces.

        A writer dying mid-commit leaks only a ``.snap-inflight-*``
        directory; the failure path removes it eagerly and every
        locked commit sweeps leftovers older than an hour."""
        if mode == "append":
            with self._commit_lock(table):
                man = self._load_manifest(table)
                if man["current"] is not None:
                    df = self.read(df.sparkSession, table).unionByName(df)
                return self._commit_data(df, table, mode, locked=True, stats_cols=stats_cols)
        return self._commit_data(df, table, mode, locked=False, stats_cols=stats_cols)

    _INFLIGHT_TTL_S = 3600.0

    def _sweep_inflight(self, table: str) -> None:
        """Remove crash-orphaned in-flight dirs / manifest temps older
        than the TTL (called only under the commit lock, so nothing
        swept can belong to a live commit that has reached the lock;
        a still-WRITING commit older than the TTL would lose its
        in-flight data and fail at rename — acceptable for a stale
        hour-old writer)."""
        import shutil

        now = time.time()
        for p in (self.base / table).glob(".snap-inflight-*"):
            if now - p.stat().st_mtime > self._INFLIGHT_TTL_S:
                shutil.rmtree(p, ignore_errors=True)
        for p in (self.base / table).glob("manifest.json.tmp-*"):
            if now - p.stat().st_mtime > self._INFLIGHT_TTL_S:
                p.unlink(missing_ok=True)

    def _commit_data(
        self,
        df: DataFrame,
        table: str,
        mode: str,
        locked: bool,
        stats_cols: list[str] | None = None,
    ) -> int:
        import shutil

        inflight = self.base / table / f".snap-inflight-{uuid.uuid4().hex}"
        try:
            df.write.mode("overwrite").parquet(str(inflight))
            stats = _collect_file_stats(inflight, stats_cols) if stats_cols else None
        except BaseException:
            shutil.rmtree(inflight, ignore_errors=True)
            raise

        def _finish() -> int:
            self._sweep_inflight(table)
            man = self._load_manifest(table)
            snap_id = int(time.time() * 1000)
            if man["history"] and snap_id <= man["history"][-1]["id"]:
                snap_id = man["history"][-1]["id"] + 1
            os.replace(inflight, self.base / table / f"snap-{snap_id}")
            if stats is not None:
                # Iceberg-manifest analog: per-file column ranges in a
                # sidecar named for the snapshot (immutable, so no lock
                # needed for readers; written before the manifest flip)
                (self.base / table / f"snap-{snap_id}.stats.json").write_text(
                    json.dumps(stats)
                )
            man["history"].append(
                {"id": snap_id, "committed_at": time.time(), "mode": mode}
            )
            man["current"] = snap_id
            self._replace_manifest(table, man)
            return snap_id

        if locked:
            return _finish()
        with self._commit_lock(table):
            return _finish()

    def _replace_manifest(self, table: str, man: dict) -> None:
        tmp = self._manifest_path(table).with_suffix(f".json.tmp-{uuid.uuid4().hex}")
        tmp.parent.mkdir(parents=True, exist_ok=True)
        tmp.write_text(json.dumps(man))
        os.replace(tmp, self._manifest_path(table))  # atomic commit

    def read(self, spark: SparkSession, table: str, snapshot: int | None = None) -> DataFrame:
        snap = self._resolve_snapshot(table, snapshot)
        return spark.read.parquet(str(self.base / table / f"snap-{snap}"))

    def _resolve_snapshot(self, table: str, snapshot: int | None) -> int:
        man = self._load_manifest(table)
        snap = snapshot if snapshot is not None else man["current"]
        if snap is None:
            raise FileNotFoundError(f"catalog table {table!r} has no snapshots")
        ids = {h["id"] for h in man["history"]}
        if snap not in ids:
            raise KeyError(f"unknown snapshot {snap} for {table!r} (have {sorted(ids)})")
        return snap

    def scan(
        self,
        spark: SparkSession,
        table: str,
        ranges: dict[str, tuple[float, float]],
        snapshot: int | None = None,
    ) -> DataFrame:
        """Stats-pruned read — Iceberg's data-skipping contract.

        ``ranges`` maps column → (lo, hi) inclusive.  Files whose
        manifest-recorded [min, max] (parquet footer stats harvested
        at commit, zero data read) don't intersect EVERY range are
        dropped from the listing before Spark ever sees them — at
        10^12 rows this is the difference between listing a handful
        of files and scanning a table.  The range predicates are
        ALSO applied to the surviving rows, so the result equals
        ``read().where(...)`` exactly; a file with no recorded stats
        for a column is conservatively kept.  Requires the snapshot
        to have been written with ``stats_cols`` covering the range
        columns (falls back to a plain filtered read otherwise).
        Timestamp/date stats are stored as ISO strings (lexicographic
        order == chronological) — pass ISO strings as that column's
        (lo, hi)."""
        from pyspark.sql import functions as F

        snap = self._resolve_snapshot(table, snapshot)
        snap_dir = self.base / table / f"snap-{snap}"
        stats_p = self.base / table / f"snap-{snap}.stats.json"

        def _with_filters(df: DataFrame) -> DataFrame:
            for col, (lo, hi) in ranges.items():
                df = df.where((F.col(col) >= lo) & (F.col(col) <= hi))
            return df

        if not stats_p.exists():
            return _with_filters(spark.read.parquet(str(snap_dir)))
        stats: dict[str, dict[str, list]] = json.loads(stats_p.read_text())
        keep = []
        for fname, cols in stats.items():
            ok = True
            for col, (lo, hi) in ranges.items():
                rng = cols.get(col)
                if rng is None:
                    continue  # no stats → keep (conservative)
                fmin, fmax = rng
                if fmin is None or fmax is None:
                    continue
                if fmax < lo or fmin > hi:
                    ok = False
                    break
            if ok:
                keep.append(str(snap_dir / fname))
        if not keep:
            # empty result with the right schema
            return _with_filters(spark.read.parquet(str(snap_dir))).limit(0)
        return _with_filters(spark.read.parquet(*keep))

    def history(self, table: str) -> list[dict]:
        return self._load_manifest(table)["history"]

    def rollback(self, table: str, snapshot: int) -> None:
        with self._commit_lock(table):
            man = self._load_manifest(table)
            if snapshot not in {h["id"] for h in man["history"]}:
                raise KeyError(f"unknown snapshot {snapshot}")
            man["current"] = snapshot
            self._replace_manifest(table, man)
