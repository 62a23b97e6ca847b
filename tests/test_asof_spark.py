"""As-of join operator edge cases vs hand-computed expectations."""

import datetime as dt

from earth_data_kit_spark.operators.asof import asof_join_latest


def test_asof_join_semantics(spark):
    T = dt.datetime
    events = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 10), 100, 1.0),
            (1, T(2024, 1, 1, 12), 101, 2.0),
            (2, T(2024, 1, 2, 9), 200, 5.0),
        ],
        "user_id bigint, ts timestamp, event_id bigint, value double",
    )
    probes = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 9)),    # before any event -> nulls
            (1, T(2024, 1, 1, 12)),   # equal ts -> that event (<= semantics)
            (1, T(2024, 1, 1, 11)),   # between -> event 100
            (2, T(2024, 1, 5, 0)),    # after -> event 200
            (3, T(2024, 1, 1, 0)),    # unknown key -> nulls
        ],
        "user_id bigint, ts timestamp",
    )
    out = {
        (r.user_id, r.ts): (r.asof_event_id, r.asof_value)
        for r in asof_join_latest(probes, events, by="user_id").collect()
    }
    assert out[(1, T(2024, 1, 1, 9))] == (None, None)
    assert out[(1, T(2024, 1, 1, 12))] == (101, 2.0)
    assert out[(1, T(2024, 1, 1, 11))] == (100, 1.0)
    assert out[(2, T(2024, 1, 5))] == (200, 5.0)
    assert out[(3, T(2024, 1, 1))] == (None, None)
    assert len(out) == 5  # exactly one output row per probe
