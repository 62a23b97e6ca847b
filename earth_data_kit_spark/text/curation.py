"""Corpus-curation operators a web-scale training pipeline runs
between extraction and storage — beyond the reference's surface (it
has no text pipeline), following the build brief's "operations a
large-scale training-data pipeline would need".

Everything below EXCEPT the repetition signals is PURE Columns
(whole-stage codegen, no Python in the hot path — the same rule as
text/textcols.py): at 10¹² documents these run in the same map stage
as extraction, shuffling nothing.  The Gopher repetition signals
(``repetition_signals_udf``) need per-document n-gram counting, which
is inherently an Arrow pandas UDF — still map-only and batched, but
Python-worker execution.

* ``canonical_url_col`` — scheme/host lowercasing, default-port and
  fragment stripping, tracking-parameter removal, trailing-slash
  normalization: the key for URL-level dedup (two crawls of the same
  page almost never share the raw URL string).
* ``gopher_quality_cols`` / ``gopher_keep_col`` — the repetition and
  shape heuristics of Rae et al. 2021 (Gopher, arXiv:2112.11446
  table A1) as a typed struct: word count bounds, mean word length,
  symbol-to-word ratio, bullet/ellipsis line fractions, duplicate-line
  fraction, alpha-word fraction.
* ``redact_pii_col`` / ``pii_counts_col`` — email / phone / IPv4
  pattern redaction with per-kind counts (the scrub a corpus pass
  applies before storage).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

# NOTE: deliberately excludes ``ref`` — unlike utm_*/gclid/fbclid it
# routinely selects CONTENT (e.g. a VCS branch), and stripping it
# would collapse distinct pages into one dedup key
_TRACKING_PARAMS = r"(utm_[a-z]+|gclid|fbclid|msclkid|mc_eid)"


def canonical_url_col(url: Column) -> Column:
    """Canonical form for URL-level dedup, as a regexp_replace chain
    (one codegen'd expression, no UDF):

    1. lowercase scheme+host (path/query case is significant — kept),
    2. drop the fragment,
    3. drop default ports (:80 http, :443 https),
    4. drop tracking query params (utm_*, gclid, fbclid, …),
    5. drop a now-empty query string / dangling separators,
    6. drop one trailing slash on a non-root path.
    """
    # 1. lowercase scheme://host (the authority ends at /, ?, # or EOS)
    c = F.concat(
        F.lower(F.regexp_extract(url, r"^([^:/?#]+://[^/?#]*)", 1)),
        F.regexp_replace(url, r"^[^:/?#]+://[^/?#]*", ""),
    )
    # 2. fragment
    c = F.regexp_replace(c, r"#.*$", "")
    # 3. default ports
    c = F.regexp_replace(c, r"^(http://[^/:?#]*):80(?=[/?#]|$)", r"$1")
    c = F.regexp_replace(c, r"^(https://[^/:?#]*):443(?=[/?#]|$)", r"$1")
    # 4. tracking params: lookbehind keeps the separator unconsumed,
    #    so adjacent tracking params all match in ONE replaceAll pass
    #    (Java lookbehind evaluates input positions, not prior
    #    consumption); each match eats its own trailing '&'
    c = F.regexp_replace(c, r"(?<=[?&])" + _TRACKING_PARAMS + r"=[^&#]*&?", "")
    # 5. drop a now-dangling trailing '?' / '&'
    c = F.regexp_replace(c, r"[?&]+$", "")
    # 6. trailing slash on a non-root path
    c = F.regexp_replace(c, r"(://[^/?#]+/[^?#]*?)/(?=\?|$)", r"$1")
    return c


def url_dedup(df, url_col: str = "url", id_col: str = "page_id"):
    """Exact dedup on the canonical URL: keep the lowest id per
    canonical form — one shuffle on the canonical string, map-side
    combinable (same shape as dedup.exact_dedup)."""
    return (
        df.select(F.col(id_col), canonical_url_col(F.col(url_col)).alias("canon_url"))
        .groupBy("canon_url")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_dups"))
        .select(id_col, "canon_url", "n_dups")
    )


# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021, appendix A1)
# ---------------------------------------------------------------------------


def gopher_quality_cols(text: Column) -> Column:
    """The document-shape signals as one struct Column.  Word = a
    whitespace token; line = a newline-split segment.  All array /
    higher-order functions — no Python."""
    words = F.split(F.trim(text), r"\s+")
    words = F.filter(words, lambda w: w != "")
    n_words = F.size(words)
    # mean word length over CHARACTERS of words (not the raw text)
    total_word_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = F.when(n_words > 0, total_word_chars / n_words).otherwise(F.lit(0.0))
    # fraction of words containing at least one alphabetic character
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-zÀ-ÿ]")))
    alpha_frac = F.when(n_words > 0, alpha_words / n_words).otherwise(F.lit(0.0))
    # symbol-to-word ratio: hashes and ellipses per word
    n_symbols = F.size(F.regexp_extract_all(text, F.lit(r"#"), 0)) + F.size(
        F.regexp_extract_all(text, F.lit(r"\.\.\.|…"), 0)
    )
    symbol_ratio = F.when(n_words > 0, n_symbols / n_words).otherwise(F.lit(0.0))
    lines = F.filter(F.split(text, r"\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^([-*•])"))) / n_lines,
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$"))) / n_lines,
    ).otherwise(F.lit(0.0))
    dup_line_frac = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct(F.transform(lines, F.trim)))) / n_lines,
    ).otherwise(F.lit(0.0))
    return F.struct(
        n_words.cast("bigint").alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        F.round(symbol_ratio, 6).alias("symbol_word_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_line_frac"),
        F.round(dup_line_frac, 6).alias("dup_line_frac"),
    )


def gopher_keep_col(q: Column) -> Column:
    """The published keep predicate over gopher_quality_cols output
    (Gopher A1 thresholds; word bounds scaled to web docs)."""
    return (
        (q["n_words"] >= 50)
        & (q["n_words"] <= 100_000)
        & (q["mean_word_len"] >= 3)
        & (q["mean_word_len"] <= 10)
        & (q["symbol_word_ratio"] <= 0.1)
        & (q["bullet_line_frac"] <= 0.9)
        & (q["ellipsis_line_frac"] <= 0.3)
        & (q["alpha_word_frac"] >= 0.8)
        & (q["dup_line_frac"] <= 0.3)
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# phone-shaped only: either an explicit +CC international run, or
# digit groups with MANDATORY separators — with all separators
# optional, any bare 9-15 digit run (epoch timestamps, order ids,
# ISBNs) matched and was destroyed by the scrub (code-review r3)
# possessive quantifiers ({..}+): digit runs never backtrack — the
# backtracking form measured 2.4× slower over the corpus scan
_PHONE_RE = (
    r"(?<![\w.])(?:"
    r"\+\d{7,15}+"  # +14155550199
    r"|\+?+\d{1,3}+[-. (]\(?+\d{2,4}+\)?+[-. )]\d{3,4}+[-. ]?+\d{0,4}+"  # separated groups
    r")(?![\w.])"
)
_IPV4_RE = (
    r"(?<![\w.])(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
    r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(?![\w.])"
)


def pii_counts_col(text: Column) -> Column:
    """(n_emails, n_phones, n_ipv4) per document — the audit signal a
    scrub pass reports before/after."""
    return F.struct(
        F.size(F.regexp_extract_all(text, F.lit(_EMAIL_RE), 0)).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(_PHONE_RE), 0)).cast("bigint").alias("n_phones"),
        F.size(F.regexp_extract_all(text, F.lit(_IPV4_RE), 0)).cast("bigint").alias("n_ipv4"),
    )


def redact_pii_col(text: Column) -> Column:
    """Replace matches with typed placeholder tokens (emails first —
    an email's host part must not be half-eaten by the IP rule)."""
    c = F.regexp_replace(text, _EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, _IPV4_RE, "<IP>")
    c = F.regexp_replace(c, _PHONE_RE, "<PHONE>")
    return c


# ---------------------------------------------------------------------------
# Gopher-style repetition removal (Rae et al. 2021, appendix A1 —
# public methodology; the signals beyond dup_line_frac need per-doc
# n-gram counting, which is an Arrow UDF, not Column algebra)
# ---------------------------------------------------------------------------


def repetition_signals(text: str) -> dict:
    """Pure-python twin of ``repetition_signals_udf`` — the UDF maps
    this over each Arrow batch, and the tests oracle against it.

    * dup_para_frac / dup_para_char_frac — duplicate paragraphs
      (``\\n\\n`` blocks) by count and by character mass;
    * dup_line_char_frac — characters inside duplicate lines;
    * top{2,3,4}gram_char_frac — character mass of the single most
      frequent word n-gram (boilerplate beacons);
    * dup{5..10}gram_char_frac — character mass of all word n-grams
      occurring more than once (templated spam), capped at 1.
    """
    t = text if isinstance(text, str) else ""  # None AND float NaN → ""
    total = max(len(t), 1)

    def _dup_fracs(parts: list[str]) -> tuple[float, float]:
        parts = [p for p in (s.strip() for s in parts) if p]
        if not parts:
            return 0.0, 0.0
        c = Counter(parts)
        dup_n = sum(n for n in c.values() if n > 1)
        dup_chars = sum(len(p) * n for p, n in c.items() if n > 1)
        return dup_n / len(parts), min(1.0, dup_chars / total)

    dup_para_frac, dup_para_char_frac = _dup_fracs(t.split("\n\n"))
    _, dup_line_char_frac = _dup_fracs(t.split("\n"))

    words = t.split()
    out = {
        "dup_para_frac": dup_para_frac,
        "dup_para_char_frac": dup_para_char_frac,
        "dup_line_char_frac": dup_line_char_frac,
    }
    for n in (2, 3, 4):
        grams = _ngram_counts(words, n)
        if grams:
            g, cnt = grams.most_common(1)[0]
            out[f"top{n}gram_char_frac"] = min(1.0, len(g) * cnt / total) if cnt > 1 else 0.0
        else:
            out[f"top{n}gram_char_frac"] = 0.0
    for n in range(5, 11):
        grams = _ngram_counts(words, n)
        dup_chars = sum(len(g) * c for g, c in grams.items() if c > 1)
        out[f"dup{n}gram_char_frac"] = min(1.0, dup_chars / total)
    return out


def _ngram_counts(words: list[str], n: int) -> "Counter":
    return Counter(" ".join(words[i : i + n]) for i in range(len(words) - n + 1))


_REP_FIELDS = (
    ["dup_para_frac", "dup_para_char_frac", "dup_line_char_frac"]
    + [f"top{n}gram_char_frac" for n in (2, 3, 4)]
    + [f"dup{n}gram_char_frac" for n in range(5, 11)]
)


def repetition_signals_udf():
    """Arrow UDF: text → struct of the 12 repetition signals."""
    schema = ", ".join(f"{f} double" for f in _REP_FIELDS)

    @F.pandas_udf(f"struct<{schema}>")
    def _rep(text: pd.Series) -> pd.DataFrame:
        rows = [repetition_signals(t) for t in text]
        return pd.DataFrame(rows, columns=_REP_FIELDS)

    return _rep


def gopher_repetition_keep_col(r: Column) -> Column:
    """The published repetition keep predicate (Gopher A1 thresholds:
    top-n-gram 0.20/0.18/0.16 for n=2..4; duplicated-n-gram 0.15 down
    to 0.10 for n=5..10; paragraph/line duplicate caps)."""
    keep = (
        (r["dup_para_frac"] <= 0.30)
        & (r["dup_para_char_frac"] <= 0.20)
        & (r["dup_line_char_frac"] <= 0.20)
    )
    for n, thr in ((2, 0.20), (3, 0.18), (4, 0.16)):
        keep = keep & (r[f"top{n}gram_char_frac"] <= thr)
    for i, n in enumerate(range(5, 11)):
        keep = keep & (r[f"dup{n}gram_char_frac"] <= 0.15 - 0.01 * i)
    return keep
