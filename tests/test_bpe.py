"""BPE tokenizer: merge learning on the reduced word-frequency table
+ Arrow-batched encode, verified against an independent in-test
reference implementation (straight transcription of Sennrich et al.
2016 algorithm 1, written separately from the operator code)."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vrl_spark.operators import bpe


# ---- independent reference (test-side) ------------------------------

def _ref_train(freqs, k):
    vocab = {}
    for w, c in freqs.items():
        if w:
            key = tuple(w[:-1]) + (w[-1] + "</w>",)
            vocab[key] = vocab.get(key, 0) + c
    merges = []
    for _ in range(k):
        pairs = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        # count desc, then lexicographic asc on the pair
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] < 2:
            break
        (a, b) = best[0]
        merges.append((a, b))
        out = {}
        for sym, c in vocab.items():
            s, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == (a, b):
                    s.append(a + b); i += 2
                else:
                    s.append(sym[i]); i += 1
            out[tuple(s)] = out.get(tuple(s), 0) + c
        vocab = out
    return merges


def _ref_encode(word, merges):
    ranks = {m: i for i, m in enumerate(merges)}
    sym = list(word[:-1]) + [word[-1] + "</w>"]
    while True:
        cands = [(ranks[(sym[i], sym[i + 1])], i)
                 for i in range(len(sym) - 1)
                 if (sym[i], sym[i + 1]) in ranks]
        if not cands:
            return sym
        _, i = min(cands)
        sym[i:i + 2] = [sym[i] + sym[i + 1]]


# ---- tests ----------------------------------------------------------

def test_train_merges_classic_corpus():
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe.train_merges(freqs, 10)
    assert merges == _ref_train(freqs, 10)
    # the famous first steps: es -> est</w> -> lo
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t</w>")
    assert merges[2] == ("l", "o")


def test_train_stops_when_no_pair_repeats():
    merges = bpe.train_merges({"ab": 1, "cd": 1}, 100)
    assert merges == []  # every pair count is 1 -> nothing to learn


@settings(max_examples=30, deadline=None)
@given(st.dictionaries(
    st.text(alphabet="abcde", min_size=1, max_size=6),
    st.integers(min_value=1, max_value=9), min_size=1, max_size=8),
    st.integers(min_value=1, max_value=12))
def test_train_matches_reference(freqs, k):
    assert bpe.train_merges(freqs, k) == _ref_train(freqs, k)


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet="abcdef", min_size=1, max_size=8))
def test_encode_word_matches_reference(word):
    merges = _ref_train({"feed": 4, "fade": 3, "bead": 2, word: 5}, 8)
    assert bpe._encode_word(word, {m: i for i, m in enumerate(merges)}) \
        == _ref_encode(word, merges)


def test_spark_train_encode_roundtrip(spark):
    rows = [(i, t) for i, t in enumerate([
        "the lowest bid is lower than the newest offer",
        "newest widest lowest low low low",
        "the estimate of the widest span",
    ])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # distributed counts equal a local Counter over the same rule
    counted = {r["word"]: r["cnt"]
               for r in bpe.word_counts(df).collect()}
    local = Counter(w for _, t in rows
                    for w in re.split(r"\s+", t.strip().lower()) if w)
    assert counted == dict(local)

    merges = bpe.bpe_train(df, num_merges=20)
    assert merges == _ref_train(dict(local), 20)

    out = df.select(
        "doc_id", "text",
        bpe.bpe_encode(merges, F.col("text")).alias("units"),
        bpe.bpe_token_count(merges, F.col("text")).alias("n_units"),
    ).withColumn("decoded", bpe.bpe_decode_units(F.col("units"))).collect()
    for r in out:
        norm = " ".join(r["text"].strip().lower().split())
        assert r["decoded"] == norm          # lossless decode
        assert r["n_units"] == len(r["units"]) > 0
        # per-word greedy encode agrees with the reference encoder
        expect = [u for w in norm.split() for u in _ref_encode(w, merges)]
        assert r["units"] == expect
    # learned vocabulary compresses: fewer units than characters
    assert all(r["n_units"] < len(r["text"]) for r in out)


def test_merges_table_and_null_text(spark):
    merges = [("e", "s"), ("es", "t</w>")]
    mt = bpe.merges_table(spark, merges).collect()
    assert [(r["rank"], r["left"], r["right"]) for r in mt] == \
        [(0, "e", "s"), (1, "es", "t</w>")]
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = df.select(bpe.bpe_encode(merges, F.col("text")).alias("u")).collect()
    assert r[0]["u"] is None  # NULL text -> NULL units, no crash


def test_encode_uses_jvm_whitespace_charset(spark):
    """bpe_encode tokenizes with the JVM's ASCII-only \\s charset
    (java_ws_words), matching what word_counts trained on: a U+00A0
    joins its neighbors into ONE word type instead of Python
    str.split()'s two (which would desynchronize encode from the
    trained vocabulary)."""
    assert bpe.java_ws_words("the dog runs") == ["the dog", "runs"]
    df = spark.createDataFrame([(0, "the dog runs")], ["doc_id", "text"])
    units = df.select(
        bpe.bpe_encode([], F.col("text")).alias("u")
    ).first().u
    # no merges: chars + </w> per word; exactly TWO end-of-word units
    assert sum(1 for u in units if u.endswith(bpe.EOW)) == 2
    assert "".join(units).replace(bpe.EOW, " ").rstrip() == "the dog runs"
