"""Unigram-LM tokenizer (Kudo 2018 / SentencePiece family). Pins:
exact training parity vs an independent in-test reference (same
hard-EM, same seeding, same tie rules, plain Python), lossless
encode/decode roundtrip (fixed corpus + hypothesis), unseen-char
fallback, pruning bounds, determinism, and the token-count lane."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vrl_spark.operators import unigram
from vrl_spark.operators.unigram import WB, _UNK_GAP

L = 6  # max piece length for the tests
SEED_CAP = 500


# --------------------------------------------------------------- #
# independent reference: same algorithm, no Spark                  #
# --------------------------------------------------------------- #


def _ref_word_counts(texts):
    wc: dict = {}
    for t in texts:
        for w in t.strip().lower().split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def _ref_seed(wc, max_len=L, max_seed=SEED_CAP):
    cnt: dict = {}
    for w, c in wc.items():
        m = WB + w
        for i in range(len(m)):
            for j in range(i + 1, min(i + max_len, len(m)) + 1):
                cnt[m[i:j]] = cnt.get(m[i:j], 0) + c
    chars = {p: c for p, c in cnt.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cnt.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[:max_seed]
    out = dict(chars)
    out.update(multi)
    return out


def _ref_viterbi(word, logp, unk, max_len=L):
    n = len(word)
    best = [(-math.inf, 0)] * (n + 1)
    best[0] = (0.0, 0)
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            piece = word[i:j]
            sc = logp.get(piece)
            if sc is None:
                if j - i > 1:
                    continue
                sc = unk
            cand = (best[i][0] + sc, best[i][1] - 1)
            if cand > best[j]:
                best[j] = cand
                back[j] = i
    out = []
    j = n
    while j > 0:
        out.append(word[back[j]:j])
        j = back[j]
    return out[::-1]


def _ref_logp(pieces):
    total = sum(pieces.values())
    logp = {p: math.log(c / total) for p, c in pieces.items() if c > 0}
    return logp, min(logp.values()) - _UNK_GAP


def _ref_em_round(wc, pieces):
    logp, unk = _ref_logp(pieces)
    used: dict = {}
    for w, c in wc.items():
        for p in _ref_viterbi(WB + w, logp, unk):
            used[p] = used.get(p, 0) + c
    for p in pieces:
        if len(p) == 1 and p not in used:
            used[p] = 0
    return used


def _ref_train(texts, vocab_size, iterations=2):
    wc = _ref_word_counts(texts)
    pieces = _ref_seed(wc)
    for _ in range(iterations):
        pieces = _ref_em_round(wc, pieces)
    chars = {p: c for p, c in pieces.items() if len(p) == 1}
    n_multi = max(0, vocab_size - len(chars))
    multi = sorted(
        ((p, c) for p, c in pieces.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[:n_multi]
    pruned = dict(chars)
    pruned.update(multi)
    return _ref_em_round(wc, pruned)


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps under the quick brown tree",
    "quick thinking wins the day the quick way",
    "brown bears and brown foxes run over the hill",
    "over and over the dog jumps the fence",
]


@pytest.fixture(scope="module")
def trained(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    ).localCheckpoint()
    stats: dict = {}
    pieces = unigram.unigram_train(
        df, vocab_size=60, iterations=2, max_piece_len=L,
        max_seed=SEED_CAP, stats=stats,
    ).localCheckpoint()
    return df, pieces, stats


def test_training_matches_reference(trained):
    _, pieces, stats = trained
    want = _ref_train(CORPUS, vocab_size=60, iterations=2)
    got = {r.piece: r.cnt for r in pieces.collect()}
    assert got == want
    assert stats["word_types"] == len(_ref_word_counts(CORPUS))
    assert stats["seed_pieces"] == len(_ref_seed(_ref_word_counts(CORPUS)))
    # logp column agrees with the cnt/total model for every row
    rows = pieces.collect()
    total = sum(r.cnt for r in rows)
    for r in rows:
        if r.cnt > 0:
            assert r.logp == pytest.approx(math.log(r.cnt / total), rel=1e-12)
        else:
            assert r.logp is None


def test_encode_matches_reference_and_roundtrips(trained, spark):
    df, pieces, _ = trained
    enc = unigram.unigram_encode(df, pieces)
    got = {r.doc_id: r.units for r in enc.collect()}
    want_pieces = _ref_train(CORPUS, vocab_size=60, iterations=2)
    logp, unk = _ref_logp(want_pieces)
    for i, t in enumerate(CORPUS):
        want = []
        for w in t.strip().lower().split():
            want.extend(_ref_viterbi(WB + w, logp, unk))
        assert got[i] == want, (i, got[i], want)
    dec = enc.select(
        "doc_id",
        unigram.unigram_decode_units(F.col("units")).alias("back"),
        "text",
    )
    for r in dec.collect():
        assert r.back == r.text  # corpus is single-spaced lowercase


def test_unseen_chars_fallback_lossless(trained, spark):
    df, pieces, _ = trained
    alien = spark.createDataFrame(
        [(0, "the zzzqx dog über fox")], ["doc_id", "text"]
    )
    enc = unigram.unigram_encode(alien, pieces)
    row = enc.first()
    dec = enc.select(unigram.unigram_decode_units(F.col("units")).alias("b"))
    assert dec.first().b == "the zzzqx dog über fox"
    assert row.units is not None  # unknown chars segmented, not failed


def test_prune_bound_and_determinism(trained, spark):
    df, pieces, _ = trained
    n_chars = pieces.where(F.length("piece") == 1).count()
    assert pieces.count() <= max(60, n_chars)
    again = unigram.unigram_train(
        df, vocab_size=60, iterations=2, max_piece_len=L, max_seed=SEED_CAP
    )
    assert sorted(map(tuple, again.select("piece", "cnt").collect())) == sorted(
        map(tuple, pieces.select("piece", "cnt").collect())
    )


def test_token_count_lane(trained):
    df, pieces, _ = trained
    enc = unigram.unigram_encode(df, pieces)
    counted = df.select(
        "doc_id",
        unigram.unigram_token_count(pieces, F.col("text")).alias("n"),
    )
    want = {r.doc_id: len(r.units) for r in enc.collect()}
    for r in counted.collect():
        assert r.n == want[r.doc_id]


def test_model_reuse_and_null_and_java_ws(trained, spark):
    """model= reuses one collect across encode and count with
    identical results; NULL text encodes to NULL units and DECODES to
    NULL (array_join semantics — never a silent ''); the Python
    encode lane tokenizes with the JVM's ASCII-only whitespace
    charset, so a U+00A0 word survives as ONE word type exactly as
    word_counts trained it."""
    df, pieces, _ = trained
    model = unigram.unigram_model(pieces)
    e1 = unigram.unigram_encode(df, None, model=model)
    e2 = unigram.unigram_encode(df, pieces)
    assert [r.units for r in e1.orderBy("doc_id").collect()] == [
        r.units for r in e2.orderBy("doc_id").collect()
    ]
    c1 = df.select(
        unigram.unigram_token_count(None, F.col("text"), model=model).alias("n")
    )
    c2 = df.select(unigram.unigram_token_count(pieces, F.col("text")).alias("n"))
    assert [r.n for r in c1.collect()] == [r.n for r in c2.collect()]
    # NULL text: units NULL, decode NULL
    nul = spark.createDataFrame([(0, None)], "doc_id long, text string")
    enc = unigram.unigram_encode(nul, None, model=model)
    row = enc.select(
        "units", unigram.unigram_decode_units(F.col("units")).alias("b")
    ).first()
    assert row.units is None and row.b is None
    # U+00A0 is NOT whitespace to the JVM tokenization: one word type
    nbsp = spark.createDataFrame([(0, "the dog runs")], ["doc_id", "text"])
    got = unigram.unigram_encode(nbsp, None, model=model).first().units
    back = "".join(got).replace(unigram.WB, " ").lstrip()
    assert back == "the dog runs"
    assert sum(1 for u in got if u.startswith(unigram.WB)) == 2  # 2 words


def test_validation(trained, spark):
    df, _, _ = trained
    with pytest.raises(ValueError, match="vocab_size"):
        unigram.unigram_train(df, vocab_size=1)
    with pytest.raises(ValueError, match="iterations"):
        unigram.unigram_train(df, vocab_size=10, iterations=0)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(Exception, match="empty"):
        unigram.unigram_train(empty, vocab_size=10)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("abcde fgh"), min_size=1, max_size=30
        ),
        min_size=1,
        max_size=5,
    )
)
def test_roundtrip_hypothesis(spark, texts):
    """Any whitespace-word corpus roundtrips losslessly through
    train->encode->decode (after the repo-wide normalization: lower +
    single-space join of the split words)."""
    norm = [" ".join(t.strip().lower().split()) for t in texts]
    norm = [t for t in norm if t]
    if not norm:
        return
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(norm)], ["doc_id", "text"]
    )
    pieces = unigram.unigram_train(
        df, vocab_size=40, iterations=1, max_piece_len=4, max_seed=100
    )
    enc = unigram.unigram_encode(df, pieces)
    dec = {
        r.doc_id: r.b
        for r in enc.select(
            "doc_id", unigram.unigram_decode_units(F.col("units")).alias("b")
        ).collect()
    }
    for i, t in enumerate(norm):
        assert dec[i] == t


def test_tokenizer_eval_metrics(trained, spark):
    """fertility/compression metrics agree with hand computation for
    BOTH tokenizer families (unigram's ▁ marker, bpe's </w> ends)."""
    from vrl_spark.operators import bpe as bpe_mod

    df, pieces, _ = trained
    enc = unigram.unigram_encode(df, pieces)
    m = unigram.tokenizer_eval(enc, "units").first()
    rows = enc.collect()
    tu = sum(len(r.units) for r in rows)
    tw = sum(len(r.text.split()) for r in rows)
    tc = sum(len(r.text) for r in rows)
    # one word-marked unit per word BY CONSTRUCTION in both families
    starts = sum(1 for r in rows for u in r.units if u.startswith(WB))
    assert starts == tw
    assert m.total_units == tu and m.total_words == tw
    assert m.fertility == pytest.approx(tu / tw)
    assert m.chars_per_unit == pytest.approx(tc / tu)
    assert m.continued_ratio == pytest.approx(1 - tw / tu)
    assert m.fertility >= 1.0  # subword models never merge words
    # bpe lane: same identity via </w> ENDS
    merges = bpe_mod.bpe_train(df, num_merges=10)
    benc = df.withColumn("units", bpe_mod.bpe_encode(merges, F.col("text")))
    bm = unigram.tokenizer_eval(benc, "units").first()
    brows = benc.collect()
    btu = sum(len(r.units) for r in brows)
    bends = sum(1 for r in brows for u in r.units if u.endswith(bpe_mod.EOW))
    assert bends == tw
    assert bm.fertility == pytest.approx(btu / tw)
    assert bm.continued_ratio == pytest.approx(1 - tw / btu)
    # literal-marker text cannot corrupt the ratio (word-count based)
    weird = spark.createDataFrame(
        [(0, "\u2581foo bar</w> baz")], ["doc_id", "text"]
    )
    wenc = weird.withColumn(
        "units", bpe_mod.bpe_encode(merges, F.col("text"))
    )
    wm = unigram.tokenizer_eval(wenc, "units").first()
    assert wm.total_words == 3
    assert wm.continued_ratio == pytest.approx(1 - 3 / wm.total_units)
    # degenerate corpus raises in-plan, never NULL metrics
    nul = spark.createDataFrame(
        [(0, None)], "doc_id long, text string"
    ).withColumn("units", bpe_mod.bpe_encode(merges, F.col("text")))
    with pytest.raises(Exception, match="zero words"):
        unigram.tokenizer_eval(nul, "units").collect()
