"""jobs/curate.py — the composed curation funnel: monotone counts,
planted leakage removed, deterministic output."""

from jobs.curate import run

SF = "/root/testdata/sf0.001"


def test_funnel_monotone_and_deterministic(spark):
    out = run(spark, SF, max_tokens=512)
    assert out["docs_in"] >= out["after_quality"] >= out["after_decontam"] >= out["after_dedup"]
    # the 3 eval snippets are verbatim spans of real docs → their
    # source docs (at least those passing quality) are removed
    assert out["after_decontam"] < out["after_quality"]
    assert out["after_dedup"] > 0 and out["sequences"] > 0
    assert 0.0 < out["fill_rate"] <= 1.0
    again = run(spark, SF, max_tokens=512)
    assert again == out
