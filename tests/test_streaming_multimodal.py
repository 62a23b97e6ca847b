import numpy as np
from pyspark.sql import functions as F

from earth_data_kit_spark.operators import multimodal as mm
from earth_data_kit_spark.streaming import windows

SF = "/root/testdata/sf0.001"
EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def test_cell_window_stream_matches_batch(spark, tmp_path):
    """Geo-cell × tumbling-window rollup: stream == batch on the
    pages table (lat/lon → quadgrid cell inside the streaming agg)."""
    from earth_data_kit_spark.sources.pages import pages_meta_df

    pages = pages_meta_df(spark, SF).select(
        "page_id", F.col("ts_s").cast("timestamp").alias("warc_ts"), "lat", "lon"
    )
    stream_dir = tmp_path / "pages_stream"
    pages.coalesce(2).write.parquet(str(stream_dir))
    stored = spark.read.parquet(str(stream_dir))
    batch = {
        (r.bucket, r.cell): r.n_pages
        for r in windows.cell_window_agg(stored, res=4, window="2 days").collect()
    }
    q = windows.cell_window_stream(
        spark,
        str(stream_dir),
        "page_id bigint, warc_ts timestamp, lat double, lon double",
        res=4,
        window="2 days",
        query_name="c_win",
    )
    try:
        q.processAllAvailable()
        got = {
            (r.bucket, r.cell): r.n_pages
            for r in spark.sql("SELECT * FROM c_win").collect()
        }
        assert got == batch and len(batch) > 10
    finally:
        q.stop()


def test_streaming_matches_batch(spark, tmp_path):
    import shutil

    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", stream_dir / "part-0.parquet")
    events = spark.read.parquet(f"{SF}/events.parquet")
    batch = windows.tumbling_agg(events, "1 hour")
    q = windows.tumbling_agg_stream(
        spark, str(stream_dir), EVENTS_SCHEMA, "1 hour", query_name="t_stream"
    )
    try:
        q.processAllAvailable()
        stream = spark.sql("SELECT * FROM t_stream")
        b = {(r.bucket, r.event_type): (r.n, round(r.total_value, 6)) for r in batch.collect()}
        s = {(r.bucket, r.event_type): (r.n, round(r.total_value, 6)) for r in stream.collect()}
        assert b == s
    finally:
        q.stop()


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    import shutil

    stream_dir = tmp_path / "events_sess"
    stream_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", stream_dir / "part-0.parquet")
    events = spark.read.parquet(f"{SF}/events.parquet")
    batch = {
        (r.user_id): (r.n_sessions, r.n_events)
        for r in windows.sessionize_batch(events).collect()
    }
    q = windows.sessionize_stream(spark, str(stream_dir), EVENTS_SCHEMA, query_name="s_sess")
    try:
        q.processAllAvailable()
        got = {
            r.user_id: (r.n_sessions, r.n_events)
            for r in spark.sql("SELECT * FROM s_sess").collect()
        }
        assert got == batch
    finally:
        q.stop()


DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def test_streaming_exact_dedup_matches_batch(spark, tmp_path):
    """Incremental dedup: after two micro-batches (the second plants
    exact duplicates) the streamed per-hash state equals the batch
    exact_dedup over the union.  Update-mode memory sinks append a
    row per key per update — the latest (max n_dups) is the state."""
    from earth_data_kit_spark.operators.dedup import exact_dedup

    stream_dir = tmp_path / "docs_stream"
    stream_dir.mkdir()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.write.mode("overwrite").parquet(str(tmp_path / "b1"))
    import shutil

    for f in (tmp_path / "b1").glob("*.parquet"):
        shutil.copy(f, stream_dir / "b1.parquet")

    q = windows.exact_dedup_stream(spark, str(stream_dir), DOCS_SCHEMA, query_name="dd_s")
    try:
        q.processAllAvailable()
        # batch 2: 10 exact duplicates with HIGHER ids (reps must not
        # displace the min) and 2 with LOWER ids (they must)
        dup_hi = docs.limit(10).selectExpr(
            "doc_id + 100000 AS doc_id", "text", "lang", "source", "n_chars"
        )
        dup_lo = docs.where(F.col("doc_id").isin(5, 7)).selectExpr(
            "doc_id - 1000000 AS doc_id", "text", "lang", "source", "n_chars"
        )
        b2 = dup_hi.unionByName(dup_lo)
        b2.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "b2"))
        for f in (tmp_path / "b2").glob("*.parquet"):
            shutil.copy(f, stream_dir / "b2.parquet")
        q.processAllAvailable()

        rows = spark.sql(
            "SELECT text_md5, doc_id, n_dups, "
            "row_number() OVER (PARTITION BY text_md5 ORDER BY n_dups DESC) rn "
            "FROM dd_s"
        ).where("rn = 1")
        got = {(r.doc_id, r.n_dups) for r in rows.collect()}
        exp = {
            (r.doc_id, r.n_dups)
            for r in exact_dedup(docs.unionByName(b2)).collect()
        }
        assert got == exp
    finally:
        q.stop()


def test_watermark_drops_late_events_append_mode(spark, tmp_path):
    """Append-mode tumbling windows: a window emits once when the
    watermark passes its end, and an event arriving after the
    watermark (targeting an already-finalized window) is DROPPED —
    the bounded-state late-data contract of the streaming ingest."""
    import pandas as pd

    stream_dir = tmp_path / "late_events"
    stream_dir.mkdir()

    def write_batch(name, rows):
        pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        ).astype({"ts": "datetime64[us]"}).to_parquet(stream_dir / name)

    t = pd.Timestamp("2017-01-01 00:00:00")
    h = pd.Timedelta("1 hour")
    write_batch(
        "b1.parquet",
        [
            (1, t + pd.Timedelta("10 min"), 1, "click", 1.0, ""),
            (2, t + pd.Timedelta("20 min"), 1, "click", 1.0, ""),
            (3, t + h + pd.Timedelta("10 min"), 1, "click", 1.0, ""),
            (4, t + 3 * h + pd.Timedelta("30 min"), 1, "click", 1.0, ""),
        ],
    )
    q = windows.tumbling_agg_stream_append(
        spark, str(stream_dir), EVENTS_SCHEMA, window="1 hour", watermark="1 hour",
        query_name="late_append",
    )
    try:
        q.processAllAvailable()
        # a LATE event into the already-finalized [00:00, 01:00) window
        # plus a fresh event that advances the watermark past 04:00
        write_batch(
            "b2.parquet",
            [
                (5, t + pd.Timedelta("40 min"), 1, "click", 100.0, ""),
                (6, t + 6 * h, 1, "click", 1.0, ""),
            ],
        )
        q.processAllAvailable()
        write_batch("b3.parquet", [(7, t + 6 * h + pd.Timedelta("5 min"), 1, "click", 1.0, "")])
        q.processAllAvailable()
        got = {
            r.bucket: (r.n, r.total_value)
            for r in spark.sql("SELECT * FROM late_append").collect()
        }
        # the 00:00 window emitted ONCE with the on-time events only —
        # the late event (value 100) was dropped
        assert got[t.to_pydatetime()] == (2, 2.0)
        assert got[(t + h).to_pydatetime()] == (1, 1.0)
        assert got[(t + 3 * h).to_pydatetime()] == (1, 1.0)
    finally:
        q.stop()


def test_multimodal_features_all_kinds(spark):
    media = mm.synth_media_df(spark, 33)
    feats = mm.extract_features(media, out_w=4, out_h=4).collect()
    assert len(feats) == 33
    expected_len = {"image": 16, "audio": 4, "video": 3}
    for r in feats:
        assert len(r.feat) == expected_len[r.kind], r
    # distributed run == single-node python oracle, per row
    by_id = {r.media_id: list(r.feat) for r in feats}
    for i in range(33):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            exp = mm.image_features(mm.synth_image(i), 4, 4)
        elif kind == "audio":
            exp = mm.audio_features(mm.synth_audio(i), 4)
        else:
            exp = mm.video_features(mm.synth_video(i), mm.VID_W, mm.VID_H, mm.VID_FRAMES)
        assert np.allclose(by_id[i], exp, atol=1e-12), i


def test_ppm_roundtrip_and_codec_seam():
    img = np.arange(24 * 32 * 3, dtype=np.uint8).reshape(24, 32, 3)
    assert np.array_equal(mm.decode_ppm(mm.encode_ppm(img)), img)
    # real decode through the seam
    assert np.array_equal(mm.decode_image(mm.encode_ppm(img)), img)
    # truly unknown codecs fail loudly (JPEG now decodes for real)
    import pytest

    with pytest.raises(ValueError, match="unrecognized image payload"):
        mm.decode_image(b"BM notabitmap")


def test_pcm_and_rawvideo_decode():
    s = ((np.arange(480) * 7) % 2003 - 1001).astype("<i2")
    assert np.array_equal(mm.decode_pcm16(s.tobytes()), s.astype(np.int64))
    vid = np.arange(6 * 6 * 8 * 3, dtype=np.uint8).reshape(6, 6, 8, 3)
    assert np.array_equal(mm.decode_raw_video(vid.tobytes(), 8, 6, 6), vid)


def test_multimodal_resize_math():
    img = np.arange(24 * 32 * 3, dtype=np.uint8).reshape(24, 32, 3)
    small = mm.resize_nearest(img, 8, 8)
    assert small.shape == (8, 8, 3)
    assert mm.sample_frames(10, 3).tolist() == [0, 3, 6, 9]


def test_audio_features_short_payload_and_tail():
    """ADVICE r2: < n_windows samples raises a clear error (not
    ZeroDivisionError); a non-divisible sample count includes the
    tail in the last window instead of silently dropping it."""
    import struct

    import pytest as _pytest

    from earth_data_kit_spark.operators import multimodal as mm

    with _pytest.raises(ValueError, match="too short"):
        mm.audio_features(struct.pack("<3h", 1, 2, 3), n_windows=4)
    # 10 samples, 4 windows: 2,2,2,4 — last window = mean(|s[6:10]|)
    samples = [1, -2, 3, -4, 5, -6, 7, -8, 9, -10]
    payload = struct.pack("<10h", *samples)
    feats = mm.audio_features(payload, n_windows=4)
    assert len(feats) == 4
    assert feats[0] == (1 + 2) / 2
    assert feats[3] == (7 + 8 + 9 + 10) / 4


def test_streaming_exact_dedup_jvm_first_wins(spark, tmp_path):
    """JVM dropDuplicates twin: one surviving row per distinct text,
    same representative SET of hashes as the batch dedup (ids may
    differ — first-arriving wins, not min — which is the documented
    trade for the no-Python loop)."""
    import shutil

    from earth_data_kit_spark.operators.dedup import exact_dedup
    from earth_data_kit_spark.streaming.windows import exact_dedup_stream_jvm

    stream_dir = tmp_path / "docs_jvm"
    stream_dir.mkdir()
    shutil.copy(f"{SF}/documents.parquet", stream_dir / "b1.parquet")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = exact_dedup_stream_jvm(spark, str(stream_dir), DOCS_SCHEMA, query_name="dd_jvm")
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM dd_jvm").collect()
    finally:
        q.stop()
    batch = exact_dedup(docs).count()
    assert len(got) == batch  # one representative per distinct text
    assert len({r.text_md5 for r in got}) == len(got)


def test_sessionize_native_matches_batch(spark):
    """F.session_window (JVM dynamic-gap merging) == the lag/running-
    sum composition, including at the exact-gap boundary (both treat
    an event at prev + gap as the SAME session)."""
    import datetime

    from pyspark.sql import functions as F

    from earth_data_kit_spark.streaming import windows as W

    ev = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    a = {r.user_id: (r.n_sessions, r.n_events) for r in W.sessionize_batch(ev).collect()}
    b = {r.user_id: (r.n_sessions, r.n_events) for r in W.sessionize_native(ev).collect()}
    assert a == b and len(a) > 0
    t0 = datetime.datetime(2017, 1, 1)
    probe = spark.createDataFrame(
        [(1, t0, 7), (2, t0 + datetime.timedelta(seconds=1800), 7),
         (3, t0 + datetime.timedelta(seconds=3601), 7)],
        "event_id bigint, ts timestamp, user_id bigint",
    )
    pa = W.sessionize_batch(probe).collect()[0]
    pb = W.sessionize_native(probe).collect()[0]
    assert (pa.n_sessions, pa.n_events) == (pb.n_sessions, pb.n_events) == (2, 3)


def test_sliding_window_stream_matches_batch(spark, tmp_path):
    """Sliding windows (2h size, 1h slide) under readStream == the
    batch F.window plan — every event lands in exactly two windows in
    both forms."""
    import shutil

    from pyspark.sql import functions as F

    stream_dir = tmp_path / "ev_slide"
    stream_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", stream_dir / "part-0.parquet")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    batch = (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("tv"))
    )
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(stream_dir))
    agg = (
        stream.withWatermark("ts", "4 hours")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("tv"))
    )
    q = agg.writeStream.outputMode("complete").format("memory").queryName("slide_s").start()
    try:
        q.processAllAvailable()
        s = {(r.w.start, r.n, r.tv) for r in spark.sql("SELECT * FROM slide_s").collect()}
    finally:
        q.stop()
    b = {(r.w.start, r.n, r.tv) for r in batch.collect()}
    assert s == b and len(b) > 0
    # two windows per event in both
    assert sum(n for _, n, _ in b) == 2 * ev.count()


def test_rocksdb_state_store_configured(spark):
    """session.py must pin the RocksDB provider — heap-backed state
    cannot hold one row per distinct hash at corpus scale (SCALE.md
    §streaming-state; VERDICT r3 task 3)."""
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        == "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    assert (
        spark.conf.get(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        )
        == "true"
    )


def _make_png(img, ctype, filters):
    """Test-side PNG ENCODER implementing the spec's forward filter
    pass (types 0-4) independently of the decoder under test."""
    import struct
    import zlib

    import numpy as np

    h, w = img.shape[:2]
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    flat = img.reshape(h, w * ch).astype(np.int32)
    raw = b""
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        cur = flat[y]
        out = np.zeros(w * ch, dtype=np.int32)
        for i in range(w * ch):
            a = int(cur[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            if f == 0:
                out[i] = cur[i]
            elif f == 1:
                out[i] = (cur[i] - a) & 0xFF
            elif f == 2:
                out[i] = (cur[i] - b) & 0xFF
            elif f == 3:
                out[i] = (cur[i] - (a + b) // 2) & 0xFF
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[i] = (cur[i] - pr) & 0xFF
        raw += bytes([f]) + out.astype(np.uint8).tobytes()
        prev = cur

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_decode_all_filters_and_color_types():
    """decode_png inverts every spec filter type (0-4 incl. Paeth) for
    gray / RGB / RGBA — the test encodes FORWARD per the spec, the
    decoder must invert."""
    import numpy as np

    from earth_data_kit_spark.operators.multimodal import decode_image, decode_png

    rng = np.random.default_rng(11)
    for ctype, shape in ((0, (13, 9)), (2, (13, 9, 3)), (6, (13, 9, 4))):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            png = _make_png(img, ctype, filters)
            got = decode_png(png)
            if ctype == 0:
                exp = np.repeat(img[..., None], 3, axis=2)
            else:
                exp = img[..., :3]
            assert np.array_equal(got, exp), (ctype, filters)
    # dispatch: PNG magic routes through decode_image too
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(_make_png(img, 2, [4])), img)


def test_png_decode_of_engine_rendered_png():
    """plot.render_png output (RGBA, filter 0) decodes back — the two
    stdlib codecs in the repo agree."""
    import numpy as np

    from earth_data_kit_spark import plot
    from earth_data_kit_spark.operators.multimodal import decode_png

    a = np.arange(20, dtype=float).reshape(4, 5)
    png = plot.render_png(a)
    rgb = decode_png(png)
    assert rgb.shape == (4, 5, 3)
    assert tuple(rgb[0, 0]) == (68, 1, 84)      # viridis low anchor
    assert tuple(rgb[3, 4]) == (253, 231, 37)   # viridis high anchor


def test_jpeg_decodes_through_dispatch():
    """VERDICT r4 task 5: the JPEG seam is closed — a baseline JPEG
    payload decodes through decode_image to (h, w, 3) uint8."""
    import numpy as np

    from earth_data_kit_spark.operators.jpeg import encode_jpeg
    from earth_data_kit_spark.operators.multimodal import decode_image

    yy, xx = np.mgrid[0:24, 0:32]
    gray = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    out = decode_image(encode_jpeg(gray, quality=95))
    assert out.shape == (24, 32, 3)  # gray broadcast to 3 channels
    err = np.abs(out[..., 0].astype(float) - gray.astype(float))
    assert err.mean() < 3.0


def test_png_roundtrip_property():
    """Property test: random image shapes / color types / filter
    schedules encode forward per the spec and must decode exactly."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from earth_data_kit_spark.operators.multimodal import decode_png

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        ctype=st.sampled_from([0, 2, 6]),
        filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(w, h, ctype, filters, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if ctype == 0 else (h, w, {2: 3, 6: 4}[ctype])
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        got = decode_png(_make_png(img, ctype, filters))
        exp = np.repeat(img[..., None], 3, axis=2) if ctype == 0 else img[..., :3]
        assert np.array_equal(got, exp)

    check()
