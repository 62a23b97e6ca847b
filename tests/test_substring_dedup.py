"""Exact-substring dedup (operators/substring_dedup.py) vs a
brute-force python oracle that uses literal token TUPLES (not the
rolling hash) — so a hash bug can't cancel out of the comparison."""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from earth_data_kit_spark.operators.substring_dedup import substring_dedup


def _oracle(docs: dict[int, str], k: int) -> dict[int, str]:
    """Literal-tuple reimplementation of the paper's semantics:
    duplicated k-token windows (by token content), keeper at
    (min doc, min start), merged spans cut, whitespace collapsed
    ONLY at the cut seams (untouched bytes preserved — ADVICE r6)."""
    toks = {
        d: [(m.start(), m.end(), m.group()) for m in re.finditer(r"[^\s]+", t)]
        for d, t in docs.items()
    }
    occ: dict[tuple, list] = {}
    for d, t in sorted(docs.items()):
        tt = toks[d]
        for i in range(len(tt) - k + 1):
            key = tuple(w for _, _, w in tt[i : i + k])
            occ.setdefault(key, []).append((d, tt[i][0], tt[i + k - 1][1]))
    spans: dict[int, list] = {d: [] for d in docs}
    for key, lst in occ.items():
        if len(lst) < 2:
            continue
        keeper = min((d, s) for d, s, _ in lst)
        for d, s, e in lst:
            if (d, s) != keeper:
                spans[d].append((s, e))
    out = {}
    for d, t in docs.items():
        ivs = sorted(spans[d])
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        parts, pos = [], 0
        for s, e in merged:
            parts.append(t[pos:s])
            pos = e
        parts.append(t[pos:])
        o = parts[0]
        for p in parts[1:]:
            left, right = o.rstrip(), p.lstrip()
            o = left + (" " if left and right else "") + right
        out[d] = o
    return out


def _run(spark, docs: dict[int, str], k: int, **kw):
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["text"]
        for r in substring_dedup(df, k=k, **kw).collect()
    }
    return got


PASSAGE = "the quick brown fox jumps over the lazy dog near the river bank today"


class TestOracleParity:
    def test_planted_shared_passage(self, spark):
        docs = {
            1: f"alpha beta {PASSAGE} gamma delta",
            2: f"one two three {PASSAGE} four five",
            3: f"{PASSAGE} six seven eight nine ten eleven",
            4: "totally unique words that never repeat anywhere else at all",
        }
        got = _run(spark, docs, k=5)
        want = _oracle(docs, k=5)
        assert got == want
        # the keeper (min doc_id=1 ... but doc 3 starts at char 0; the
        # keeper is per-WINDOW min(doc, start) — the oracle encodes
        # it): passage must survive in exactly one doc
        n_with = sum(PASSAGE in t for t in got.values())
        assert n_with == 1
        assert got[4] == docs[4]  # unique doc untouched

    def test_random_corpus_parity(self, spark):
        rng = np.random.default_rng(5)
        vocab = [f"w{i}" for i in range(30)]
        docs = {}
        for d in range(12):
            words = [vocab[j] for j in rng.integers(0, 30, 40)]
            docs[d] = " ".join(words)
        # small vocab + k=4 → natural collisions exercise every path
        got = _run(spark, docs, k=4)
        want = _oracle(docs, k=4)
        assert got == want

    def test_within_doc_repetition(self, spark):
        docs = {
            1: f"{PASSAGE} filler words here {PASSAGE}",
            2: "independent text with no duplication present whatsoever",
        }
        got = _run(spark, docs, k=5)
        want = _oracle(docs, k=5)
        assert got == want
        assert got[1].count("quick brown fox") == 1  # second copy cut

    def test_short_docs_pass_through(self, spark):
        docs = {1: "tiny doc", 2: "tiny doc"}  # < k tokens
        got = _run(spark, docs, k=5)
        assert got == docs

    def test_counters_and_boilerplate_cap(self, spark):
        banner = "click here to subscribe to our excellent newsletter today"
        docs = {d: f"{banner} tail{d} more{d}" for d in range(6)}
        df = spark.createDataFrame(
            [(d, t) for d, t in docs.items()], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in substring_dedup(df, k=5).collect()}
        # default keeps exactly one occurrence (the min-doc keeper)
        survivors = [d for d, r in out.items() if banner in r["text"]]
        assert survivors == [0]
        assert all(
            r["n_removed_chars"] > 0 for d, r in out.items() if d != 0
        )
        assert out[0]["n_removed_chars"] == 0
        # cap=1 treats the window as boilerplate: no keeper survives
        out2 = {
            r["doc_id"]: r["text"]
            for r in substring_dedup(df, k=5, max_occurrences=1).collect()
        }
        assert all(banner not in t for t in out2.values())

    def test_periodic_self_overlap_semantics(self, spark):
        """A periodic repeat ('spam'×6) contains its own k-gram twice
        at overlapping positions; cutting the non-keeper occurrence
        collapses the run even in the keeper doc — the oracle agrees
        (the suffix-array formulation collapses repeats the same
        way), pinned here so the behavior is a contract, not an
        accident."""
        docs = {d: f"spam spam spam spam spam spam tail{d}" for d in range(3)}
        got = _run(spark, docs, k=5)
        want = _oracle(docs, k=5)
        assert got == want
