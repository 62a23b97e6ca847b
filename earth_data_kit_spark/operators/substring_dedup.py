"""Exact-substring deduplication (Lee et al. 2022, arXiv:2107.06499
"Deduplicating Training Data Makes Language Models Better") as a
distributed Spark pipeline.

The paper removes every duplicated ≥50-token substring from the
corpus, keeping one occurrence, via a monolithic suffix array.  The
distributed equivalent here hashes every k-token window with a
64-bit polynomial rolling hash and resolves duplicates relationally:

1. window pass (map-only Arrow UDF): per doc, tokenize with char
   offsets and emit (hash, start_char, end_char) for each k-token
   window — one row per token position, the same O(corpus tokens)
   volume a suffix array indexes;
2. duplicate detection (shuffle 1, on the 8-byte hash): document
   frequency per window hash; hashes seen at >1 position keep their
   GLOBAL KEEPER occurrence = min(doc_id, start) — the deterministic
   stand-in for the paper's "first" occurrence;
3. span assembly (shuffle 2, on doc_id): every non-keeper occurrence
   of a duplicated window marks its char span for removal; per doc
   the spans are merged (overlapping duplicate windows from one
   shared passage collapse to a single cut) and the text is rebuilt
   in one Arrow pass.

A shared passage of L tokens yields L−k+1 duplicated windows whose
merged span is exactly the passage, so the keeper doc keeps it intact
and every other doc loses precisely the shared chars — the paper's
semantics, pinned against a brute-force python oracle in
tests/test_substring_dedup.py.

Scale shape: the window table is the honest cost of EXACT substring
dedup (corpus-token-sized, shuffled once on uniform 64-bit keys; the
suffix-array build moves the same bytes through a single machine's
RAM instead).  ``max_occurrences`` caps degenerate windows (empty/
boilerplate explosions — the max_bucket pattern from the LSH family);
capped hashes are treated as boilerplate and removed from every doc
INCLUDING the would-be keeper, reported separately.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = np.uint64(1099511628211)  # FNV-ish odd multiplier for the rolling hash
_WORD_RE = r"[^\s]+"


def _token_spans(text: str):
    import re

    return [(m.start(), m.end(), m.group()) for m in re.finditer(_WORD_RE, text or "")]


def _window_rows(text: str, k: int):
    """(hash, start_char, end_char) per k-token window — rolling
    polynomial over per-token md5-free 64-bit FNV hashes (numpy
    wraparound arithmetic, stable across processes)."""
    toks = _token_spans(text)
    n = len(toks)
    if n < k:
        return np.empty((0, 3), dtype=np.int64)
    th = np.empty(n, dtype=np.uint64)
    for i, (_, _, w) in enumerate(toks):
        h = np.uint64(14695981039346656037)
        for b in w.encode():
            h = (h ^ np.uint64(b)) * _B
        th[i] = h
    # polynomial window hash: Σ th[i+j] · B^(k-1-j); computed per
    # window vectorized (k ≤ ~100: one (n-k+1, k) gather)
    idx = np.arange(n - k + 1)[:, None] + np.arange(k)[None, :]
    pw = np.empty(k, dtype=np.uint64)
    pw[-1] = np.uint64(1)
    for j in range(k - 2, -1, -1):
        pw[j] = pw[j + 1] * _B
    wh = (th[idx] * pw[None, :]).sum(axis=1, dtype=np.uint64)
    starts = np.array([toks[i][0] for i in range(n - k + 1)], dtype=np.int64)
    ends = np.array([toks[i + k - 1][1] for i in range(n - k + 1)], dtype=np.int64)
    return np.stack([wh.view(np.int64), starts, ends], axis=1)


def _windows_udf(k: int):
    @F.pandas_udf("array<struct<h: bigint, s: int, e: int>>")
    def _w(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            rows = _window_rows(t, k)
            out.append(
                [
                    {"h": int(h), "s": int(s), "e": int(e)}
                    for h, s, e in rows
                ]
            )
        return pd.Series(out)

    return _w


def _cut_spans_udf(text_col: str = "text"):
    """Merge overlapping char spans and cut them from the text —
    Arrow pass over (text, spans)."""

    @F.pandas_udf("struct<text: string, n_removed_chars: int, n_spans: int>")
    def _cut(texts: pd.Series, spans: pd.Series) -> pd.DataFrame:
        new_texts, n_chars, n_spans = [], [], []
        for t, sp in zip(texts, spans):
            t = t or ""
            if sp is None or len(sp) == 0:
                new_texts.append(t)
                n_chars.append(0)
                n_spans.append(0)
                continue
            ivs = sorted((int(x["s"]), int(x["e"])) for x in sp)
            merged = [list(ivs[0])]
            for s, e in ivs[1:]:
                if s <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], e)
                else:
                    merged.append([s, e])
            parts, pos, cut = [], 0, 0
            for s, e in merged:
                parts.append(t[pos:s])
                cut += e - s
                pos = e
            parts.append(t[pos:])
            # collapse whitespace runs the cuts leave behind
            new_texts.append(" ".join("".join(parts).split()))
            n_chars.append(cut)
            n_spans.append(len(merged))
        return pd.DataFrame(
            {"text": new_texts, "n_removed_chars": n_chars, "n_spans": n_spans}
        )

    return _cut


def substring_dedup(
    df: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_occurrences: int = 10_000,
) -> DataFrame:
    """Remove every duplicated ≥k-token substring, keeping the
    occurrence at min(doc_id, start_char).  Returns the input columns
    with ``text`` rewritten plus ``n_removed_chars``/``n_spans``.

    ``max_occurrences``: a window hash at more positions than this is
    degenerate boilerplate — removed from EVERY doc (no keeper) and
    counted in the spans like any other cut."""
    win = _windows_udf(k)
    wins = df.select(
        F.col(id_col), F.explode(win(F.col(text_col))).alias("w")
    ).select(
        id_col, F.col("w.h").alias("h"), F.col("w.s").alias("s"), F.col("w.e").alias("e")
    )
    # shuffle 1 (on the hash): occurrence count + global keeper
    dup = (
        wins.groupBy("h")
        .agg(
            F.count("*").alias("occ"),
            F.min(F.struct(F.col(id_col).alias("kid"), F.col("s").alias("ks"))).alias(
                "keep"
            ),
        )
        .where(F.col("occ") > 1)
    )
    marked = wins.join(dup, "h").where(
        (F.col("occ") > max_occurrences)
        | (F.col(id_col) != F.col("keep.kid"))
        | (F.col("s") != F.col("keep.ks"))
    )
    # shuffle 2 (on doc id): spans per doc, then one Arrow cut pass
    spans = marked.groupBy(id_col).agg(
        F.collect_list(F.struct("s", "e")).alias("_spans")
    )
    cut = _cut_spans_udf(text_col)
    joined = df.join(spans, id_col, "left")
    out = joined.withColumn("_c", cut(F.col(text_col), F.col("_spans")))
    keep_cols = [c for c in df.columns if c != text_col]
    return out.select(
        *keep_cols,
        F.col("_c.text").alias(text_col),
        F.col("_c.n_removed_chars").alias("n_removed_chars"),
        F.col("_c.n_spans").alias("n_spans"),
    )
