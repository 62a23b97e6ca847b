"""Training-data curation Columns: canonical-URL dedup, Gopher-style
quality rules, PII redaction — hand-computed expected values, plus a
plan assertion that the whole layer stays JVM-side."""

import pytest
from pyspark.sql import functions as F

from earth_data_kit_spark.text import curation as cu


def _one(spark, col, value):
    return spark.createDataFrame([(value,)], "v string").select(col(F.col("v")).alias("o")).collect()[0].o


CANON_CASES = [
    # fragment + tracking + default port + trailing slash + host case
    ("HTTP://Example.COM:80/a/b/?utm_source=x&q=1#frag", "http://example.com/a/b?q=1"),
    ("https://Example.com:443/", "https://example.com/"),
    ("https://a.com/p?utm_campaign=z", "https://a.com/p"),
    ("https://a.com/p?a=1&utm_medium=m&b=2", "https://a.com/p?a=1&b=2"),
    ("https://a.com/p/?fbclid=abc", "https://a.com/p"),
    ("https://a.com", "https://a.com"),
    ("https://a.com:8080/p", "https://a.com:8080/p"),  # non-default port kept
    ("https://a.com/CaseKept/Path", "https://a.com/CaseKept/Path"),
]


@pytest.mark.parametrize("raw,expected", CANON_CASES)
def test_canonical_url(spark, raw, expected):
    assert _one(spark, cu.canonical_url_col, raw) == expected


def test_url_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [
            (1, "https://A.com/x?utm_source=t"),
            (2, "https://a.com/x"),
            (3, "https://a.com/x/#top"),
            (4, "https://b.com/y"),
        ],
        "page_id bigint, url string",
    )
    got = {r.canon_url: (r.page_id, r.n_dups) for r in cu.url_dedup(df).collect()}
    assert got == {"https://a.com/x": (1, 3), "https://b.com/y": (4, 1)}


def test_gopher_signals_closed_form(spark):
    text = "alpha beta gamma\nalpha beta gamma\n- bullet one\nreal line here...\n"
    q = _one(spark, cu.gopher_quality_cols, text)
    assert q.n_words == 12
    # duplicate line: 4 non-empty lines, 3 distinct
    assert q.dup_line_frac == pytest.approx(0.25)
    assert q.bullet_line_frac == pytest.approx(0.25)
    assert q.ellipsis_line_frac == pytest.approx(0.25)
    assert q.alpha_word_frac == pytest.approx(11 / 12, abs=1e-6)  # '...' suffix keeps 'here...' alphabetic; '-' is not
    assert q.symbol_word_ratio == pytest.approx(1 / 12, abs=1e-6)
    # mean word length: total chars of the 12 ws-tokens / 12
    toks = text.split()
    assert q.mean_word_len == pytest.approx(sum(len(t) for t in toks) / len(toks), abs=1e-6)


def test_gopher_keep_thresholds(spark):
    good = "word " * 60  # 60 words, mean len 4, no symbols
    short = "too short"
    symbols = ("ok " * 60) + "#" * 30
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], "id bigint, text string"
    )
    out = {
        r.id: r.keep
        for r in df.select(
            "id", cu.gopher_keep_col(cu.gopher_quality_cols(F.col("text"))).alias("keep")
        ).collect()
    }
    assert out == {1: True, 2: False, 3: False}


def test_pii_redaction_and_counts(spark):
    text = (
        "mail a.b+c@test.org or admin@x.co, call +1 415-555-0199, "
        "server at 10.0.0.1 but version 1.2.3.4.5 and year 2017 stay"
    )
    c = _one(spark, cu.pii_counts_col, text)
    # 10.0.0.1 counts; 1.2.3.4.5 rejected (lookaround on the dots)
    assert (c.n_emails, c.n_phones, c.n_ipv4) == (2, 1, 1)
    red = _one(spark, cu.redact_pii_col, text)
    assert "<EMAIL>" in red and "<PHONE>" in red
    assert "a.b+c@test.org" not in red and "415-555-0199" not in red
    assert "2017" in red  # plain years survive
    ip = _one(spark, cu.pii_counts_col, "ping 192.168.0.12 now")
    assert ip.n_ipv4 == 1
    assert "<IP>" in _one(spark, cu.redact_pii_col, "ping 192.168.0.12 now")


def test_pii_anchor_guards_are_value_equal(spark):
    """The r7 anchor-char guards (contains('@') / digit probe) must be
    invisible: guarded output == bare regexp output for anchor-less,
    anchor-bearing and NULL documents (incl. regexp_count's NULL
    semantics)."""
    rows = [
        ("no anchors at all, plain prose",),
        ("has at a.b@x.org but no digits in the rest",),
        ("digits 415-555-0199 and 10.0.0.1 but no at-sign",),
        ("both a@b.co and +1 415-555-0199",),
        ("",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "text string")
    bare_counts = F.struct(
        F.regexp_count(F.col("text"), F.lit(cu._EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(cu._PHONE_RE)).cast("bigint").alias("n_phones"),
        F.regexp_count(F.col("text"), F.lit(cu._IPV4_RE)).cast("bigint").alias("n_ipv4"),
    )
    bare_redact = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), cu._EMAIL_RE, "<EMAIL>"),
            cu._IPV4_RE, "<IP>",
        ),
        cu._PHONE_RE, "<PHONE>",
    )
    got = df.select(
        cu.pii_counts_col(F.col("text")).alias("g_c"),
        bare_counts.alias("b_c"),
        cu.redact_pii_col(F.col("text")).alias("g_r"),
        bare_redact.alias("b_r"),
    ).collect()
    for r in got:
        assert r.g_c == r.b_c, (r.g_c, r.b_c)
        assert r.g_r == r.b_r, (r.g_r, r.b_r)


def test_curation_layer_is_jvm_only(spark):
    df = spark.createDataFrame([(1, "u", "t")], "id bigint, url string, text string").select(
        cu.canonical_url_col(F.col("url")),
        cu.gopher_quality_cols(F.col("text")),
        cu.redact_pii_col(F.col("text")),
        cu.pii_counts_col(F.col("text")),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_canonical_url_idempotent(spark):
    """canon(canon(u)) == canon(u) over a messy corpus — canonical
    forms must be fixed points or URL-dedup keys drift."""
    urls = [u for u, _ in CANON_CASES] + [
        "https://x.com/a?utm_a=1&utm_b=2&c=3",
        "http://Y.com:80/?gclid=1",
        "https://z.com/p?a=1#f?utm_x=2",
        "not a url at all",
        "",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = df.select(cu.canonical_url_col(F.col("u")).alias("c1"))
    twice = once.select("c1", cu.canonical_url_col(F.col("c1")).alias("c2"))
    for r in twice.collect():
        assert r.c1 == r.c2, r


def test_pii_phone_not_greedy_on_bare_digit_runs(spark):
    """Epoch timestamps / order ids / ISBNs are bare digit runs and
    must survive the scrub (the earlier all-separators-optional regex
    redacted any 9-15 digit run — code-review r3)."""
    text = "order 1502870400 isbn 9780306406157 call +14155550199 or 415-555-0199"
    red = _one(spark, cu.redact_pii_col, text)
    assert "1502870400" in red and "9780306406157" in red
    assert "+14155550199" not in red and "415-555-0199" not in red
    c = _one(spark, cu.pii_counts_col, text)
    assert c.n_phones == 2


def test_ref_param_is_not_stripped(spark):
    """?ref= selects content (e.g. a VCS branch) — two refs must stay
    distinct canonical URLs (code-review r3)."""
    a = _one(spark, cu.canonical_url_col, "https://g.com/r/blob/x.py?ref=main")
    b = _one(spark, cu.canonical_url_col, "https://g.com/r/blob/x.py?ref=release-1.0")
    assert a != b and "ref=main" in a


class TestRepetitionSignals:
    def test_udf_matches_python_twin(self, spark):
        import pandas as pd

        from earth_data_kit_spark.text.curation import (
            _REP_FIELDS,
            repetition_signals,
            repetition_signals_udf,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(300)
        rows = docs.select(
            "doc_id", repetition_signals_udf()(F.col("text")).alias("r"), "text"
        ).collect()
        assert len(rows) == 300
        for r in rows:
            want = repetition_signals(r.text)
            for f in _REP_FIELDS:
                assert abs(getattr(r.r, f) - want[f]) < 1e-12, (r.doc_id, f)

    def test_planted_repetition_flagged(self, spark):
        from earth_data_kit_spark.text.curation import (
            gopher_repetition_keep_col,
            repetition_signals_udf,
        )

        spam = ("buy cheap meds now " * 50).strip()
        para = "unique paragraph one.\n\n" + ("same paragraph.\n\n" * 10)
        clean = (
            "The quick brown fox jumps over the lazy dog while seventeen "
            "distinct sentences describe entirely different things about "
            "geography, music, cooking, astronomy and sport without any "
            "repeated phrasing whatsoever in this particular passage."
        )
        df = spark.createDataFrame(
            [(1, spam), (2, para), (3, clean)], "id int, text string"
        )
        out = {
            r.id: r.keep
            for r in df.select(
                "id",
                gopher_repetition_keep_col(
                    repetition_signals_udf()(F.col("text"))
                ).alias("keep"),
            ).collect()
        }
        assert out[1] is False  # n-gram spam
        assert out[2] is False  # duplicated paragraphs
        assert out[3] is True

    def test_python_twin_handles_none_and_nan(self):
        from earth_data_kit_spark.text.curation import (
            _REP_FIELDS,
            repetition_signals,
        )

        for bad in (None, float("nan"), ""):
            out = repetition_signals(bad)
            assert all(out[f] == 0.0 for f in _REP_FIELDS)
