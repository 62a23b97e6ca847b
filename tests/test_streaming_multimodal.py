import numpy as np
from pyspark.sql import functions as F

from earth_data_kit_spark.operators import multimodal as mm
from earth_data_kit_spark.streaming import windows

SF = "/root/testdata/sf0.001"
EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


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


def test_multimodal_feature_plumbing(spark):
    media = mm.synth_media_df(spark, 32)
    feats = mm.extract_features(media, out_w=4, out_h=4).collect()
    assert len(feats) == 32
    for r in feats:
        assert r.kind == "image"
        assert len(r.feat) == 16
        # deterministic: same payload byte → same features
    by_payload = {}
    for r in feats:
        by_payload.setdefault(r.media_id % 256, []).append(tuple(np.round(r.feat, 5)))
    # media 0 and 256 would share payload — only 32 rows, so just check determinism by recompute
    feats2 = mm.extract_features(media, out_w=4, out_h=4).collect()
    assert {r.media_id: tuple(r.feat) for r in feats} == {
        r.media_id: tuple(r.feat) for r in feats2
    }


def test_multimodal_resize_math():
    img = np.arange(24 * 32 * 3, dtype=np.uint8).reshape(24, 32, 3)
    small = mm.resize_nearest(img, 8, 8)
    assert small.shape == (8, 8, 3)
    assert mm.sample_frames(10, 3).tolist() == [0, 3, 6, 9]
