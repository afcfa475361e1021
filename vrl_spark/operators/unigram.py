"""Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization"
— the SentencePiece unigram model): learned piece vocabulary via EM
over a seed set of substrings, Viterbi segmentation for encoding.

The learned-tokenizer family's second member next to
``operators/bpe.py``; same split of labor, different loop home:

- **Corpus pass (the 100 TB part) happens ONCE**: the same
  explode -> word-count aggregation BPE uses (bpe.word_counts). All
  training below runs on the WORD-FREQUENCY TABLE, weighted by
  count — byte-identical to training on the raw corpus.
- **The EM loop is DISTRIBUTED over the word table** (unlike BPE's
  documented driver-side merge loop): at web scale the word-type
  table reaches tens of millions of rows, so each hard-EM round is a
  Spark job — Viterbi-segment every distinct word (Arrow-batched
  pandas UDF, piece log-probs broadcast), explode the piece uses
  weighted by word count, one map-side-combined agg for the M-step,
  ``localCheckpoint`` per round (the kmeans/dedup_clusters loop
  discipline). Only the PIECE table (vocab-sized by construction,
  bounded by ``max_seed``) is ever collected for the broadcast.
- **Encoding is map-only**: Viterbi with the final piece log-probs
  broadcast into an Arrow-batched pandas UDF, per-batch memoization
  (bpe_encode's shape).

Simplifications vs full SentencePiece, stated honestly: hard EM
(Viterbi counts) instead of forward-backward expected counts, and a
single final prune to ``vocab_size`` by (count desc, piece asc)
instead of iterative loss-based pruning. Both keep training fully
deterministic and oracle/reference-replicable; the segmentation
model class (argmax unigram LM) is identical.

Word-boundary convention: every word is prefixed with the
SentencePiece marker ``▁`` before segmentation, so decode is
lossless for the repo-wide whitespace-lowercase tokenization:
concat units, turn ``▁`` back into a space, strip the leading one.
Characters unseen at training time segment as single-char pieces
scored with a fixed unknown penalty (below every vocab piece), so
encode never fails and decode stays lossless.
"""

from __future__ import annotations

import pandas as pd  # module level: pandas_udf resolves 'pd.Series' hints
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vrl_spark.operators.bpe import java_ws_words, word_counts

WB = "▁"  # ▁ SentencePiece word-boundary marker
_UNK_GAP = 10.0  # unk piece scores this far below the worst vocab piece


# ---------------------------------------------------------------------
# training
# ---------------------------------------------------------------------


def seed_pieces(
    words: DataFrame,
    max_piece_len: int = 8,
    max_seed: int = 20000,
) -> DataFrame:
    """(piece, cnt) — every substring up to ``max_piece_len`` of every
    (boundary-marked) word type, counted with word frequencies; kept
    are ALL single characters (segmentation coverage) plus the top
    ``max_seed`` multi-char substrings by (cnt desc, piece asc) — so
    at most ``n_distinct_chars + max_seed`` rows. Pure Catalyst: the
    substring grid is a nested transform over sequence(), exploded
    once over the word table — the corpus itself is never touched."""
    w = F.concat(F.lit(WB), F.col("word"))
    n = F.length(w)
    grid = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda s: F.transform(
                F.sequence(F.lit(1), F.least(F.lit(max_piece_len), n - s + 1)),
                lambda l: F.substring(w, s, l),
            ),
        )
    )
    counts = (
        words.select(F.explode(grid).alias("piece"), F.col("cnt"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
    )
    chars = counts.where(F.length("piece") == 1)
    multi = (
        counts.where(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(max_seed)
    )
    return chars.unionByName(multi)


def _viterbi(word: str, logp: dict, unk: float, max_len: int):
    """Argmax unigram segmentation. DP over end positions; ties break
    to FEWER pieces, then to the longer last piece (smaller start) —
    fully deterministic, mirrored by the in-test reference. Unknown
    single chars score ``unk``."""
    n = len(word)
    # (score, -pieces) per prefix; back[j] = start of last piece
    best = [(-float("inf"), 0)] * (n + 1)
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
            # strictly-better (score, fewer-pieces) wins; on an exact
            # tie the SMALLER i (longer last piece) stands, because i
            # scans ascending and equal candidates never replace
            if cand > best[j]:
                best[j] = cand
                back[j] = i
    out = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    return out[::-1]


def unigram_model(pieces: DataFrame) -> tuple[dict, float, int]:
    """Collect the vocab-sized piece table into the broadcastable
    model: ((piece -> logp) dict, unk score, max piece length). The
    only collect in the module; bounded by max_seed/vocab_size by
    construction (same contract as bpe's merge-rank collect). Pass
    the result to :func:`unigram_encode` / :func:`unigram_token_count`
    via ``model=`` when both run on the same trained pieces — each
    would otherwise collect and serialize its own copy. max piece
    length is DERIVED here so encode can never silently skip vocab
    pieces longer than a mismatched caller-supplied cap."""
    import math

    rows = pieces.select("piece", "cnt").collect()
    total = sum(r.cnt for r in rows)
    if total <= 0:
        raise ValueError("unigram: empty piece table (empty corpus?)")
    logp = {r.piece: math.log(r.cnt / total) for r in rows if r.cnt > 0}
    if not logp:
        raise ValueError("unigram: no piece has positive count")
    max_len = max(len(p) for p in logp)
    return logp, min(logp.values()) - _UNK_GAP, max_len


def _segment_words(
    words: DataFrame, logp: dict, unk: float, max_len: int
) -> DataFrame:
    """(word, cnt, units array<string>) — Viterbi-segment every
    distinct (marked) word under the current model. Arrow-batched;
    the model rides the closure as a broadcast-sized dict."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def seg(s: pd.Series) -> pd.Series:
        memo: dict = {}

        def one(wd):
            got = memo.get(wd)
            if got is None:
                got = memo[wd] = _viterbi(WB + wd, logp, unk, max_len)
            return got

        return s.map(one)

    return words.select("word", "cnt", seg(F.col("word")).alias("units"))


def unigram_train(
    corpus: DataFrame,
    vocab_size: int = 2000,
    text_col: str = "text",
    iterations: int = 3,
    max_piece_len: int = 8,
    max_seed: int = 20000,
    max_types: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Train the unigram LM; returns the (piece, cnt, logp) frame —
    at most ``max(vocab_size, n_distinct_chars)`` rows (single chars
    are ALWAYS retained for segmentation coverage, so a corpus with
    more distinct characters than ``vocab_size`` — CJK, say — keeps
    them all). ``iterations`` hard-EM rounds run DISTRIBUTED over the
    word-frequency table, then one prune to ``vocab_size`` by
    (cnt desc, piece asc), then one final EM round renormalizes the
    pruned model. ``stats`` (out-param) records
    {"word_types": int, "seed_pieces": int}."""
    if vocab_size < 2:
        raise ValueError(f"vocab_size must be >= 2, got {vocab_size}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    words = word_counts(corpus, text_col, max_types).localCheckpoint()
    pieces = seed_pieces(words, max_piece_len, max_seed).localCheckpoint()
    if stats is not None:
        stats["word_types"] = words.count()
        stats["seed_pieces"] = pieces.count()

    def em_round(p: DataFrame) -> DataFrame:
        # the derived cap (max piece length in the CURRENT model) can
        # only tighten the Viterbi scan vs max_piece_len — anything
        # longer is a guaranteed dict miss per position per word
        logp, unk, mlen = unigram_model(p)
        segged = _segment_words(words, logp, unk, mlen)
        used = (
            segged.select(F.explode("units").alias("piece"), F.col("cnt"))
            .groupBy("piece")
            .agg(F.sum("cnt").alias("cnt"))
        )
        # chars must survive even when Viterbi stops using them (an
        # unseen char at ENCODE time needs its neighbors' fallback):
        # keep zero-count single chars with cnt 0 -> they drop from
        # logp (cnt > 0 filter in _logp_map) but stay prunable rows
        kept_chars = p.where(F.length("piece") == 1).select(
            "piece", F.lit(0).cast("bigint").alias("cnt")
        )
        merged = (
            used.unionByName(kept_chars)
            .groupBy("piece")
            .agg(F.sum("cnt").alias("cnt"))
        )
        return merged.localCheckpoint()

    for _ in range(iterations):
        pieces = em_round(pieces)
    # prune: every single char + top multi-char by (cnt, piece)
    chars = pieces.where(F.length("piece") == 1)
    n_multi = max(0, vocab_size - chars.count())
    multi = (
        pieces.where(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(n_multi)
    )
    pieces = chars.unionByName(multi).localCheckpoint()
    pieces = em_round(pieces)
    # informational logp column, pure Catalyst (total via a window
    # sum over the vocab-sized frame — encode re-derives its own
    # dict from cnt, so the two lanes cannot drift)
    from pyspark.sql import Window

    total = F.sum("cnt").over(Window.partitionBy())
    return pieces.withColumn(
        "logp",
        F.when(F.col("cnt") > 0, F.log(F.col("cnt") / total)),
    )


# ---------------------------------------------------------------------
# encode / decode / count
# ---------------------------------------------------------------------


def unigram_encode(
    df: DataFrame,
    pieces: DataFrame | None,
    text_col: str = "text",
    out_col: str = "units",
    model: tuple[dict, float, int] | None = None,
) -> DataFrame:
    """df + ``out_col`` array<string>: Viterbi-segment each word of
    the JVM tokenization (java_ws_words — the SAME whitespace charset
    training counted with), boundary-marked, under the trained model.
    Map-only: the piece log-probs broadcast into one Arrow-batched
    pandas UDF with per-batch word memoization; the Viterbi piece cap
    is DERIVED from the vocab (no drift knob). Pass ``model=``
    (:func:`unigram_model`) when also calling unigram_token_count on
    the same pieces — each call otherwise collects its own copy."""
    if (pieces is None) == (model is None):
        raise ValueError(
            "pass exactly one of pieces= or model= (a model from "
            "DIFFERENT pieces would silently govern the call)"
        )
    logp, unk, max_len = model if model is not None else unigram_model(pieces)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def enc(s: pd.Series) -> pd.Series:
        memo: dict = {}

        def word_units(wd):
            got = memo.get(wd)
            if got is None:
                got = memo[wd] = _viterbi(WB + wd, logp, unk, max_len)
            return got

        def one(t):
            if t is None:
                return None
            out = []
            for wd in java_ws_words(t):
                out.extend(word_units(wd))
            return out

        return s.map(one)

    return df.withColumn(out_col, enc(F.col(text_col)))


def unigram_decode_units(units: Column) -> Column:
    """Inverse of unigram_encode for single-spaced lowercase text:
    concat the units (array_join: a NULL units row stays NULL, like
    bpe_decode_units — never a silent ''), turn each word-boundary
    marker back into a space, strip the leading one. Pure Catalyst.
    Caveat (as in real SentencePiece, which escapes it): input text
    containing the literal marker character ▁ decodes those
    occurrences to spaces — the lossless contract covers text free
    of the marker."""
    joined = F.array_join(units, "")
    return F.ltrim(F.replace(joined, F.lit(WB), F.lit(" ")))


def unigram_token_count(
    pieces: DataFrame | None,
    text: Column,
    model: tuple[dict, float, int] | None = None,
) -> Column:
    """Token count under the trained unigram model — the learned
    counter lane for pack_documents/shard_assign budgets (same
    contract as bpe_token_count: budgets measured in the units a
    training run actually consumes; materialize the counted frame
    before shard_assign, which reads its input in both prefix-sum
    passes). Pass ``model=`` to reuse unigram_encode's collect."""
    if (pieces is None) == (model is None):
        raise ValueError(
            "pass exactly one of pieces= or model= (a model from "
            "DIFFERENT pieces would silently govern the call)"
        )
    logp, unk, max_len = model if model is not None else unigram_model(pieces)

    @F.pandas_udf(T.LongType())
    def cnt(s: pd.Series) -> pd.Series:
        memo: dict = {}

        def word_n(wd):
            got = memo.get(wd)
            if got is None:
                got = memo[wd] = len(_viterbi(WB + wd, logp, unk, max_len))
            return got

        def one(t):
            if t is None:
                return None
            return sum(word_n(wd) for wd in java_ws_words(t))

        return s.map(one)

    return cnt(text)


def tokenizer_eval(
    df: DataFrame,
    units_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level quality metrics for ANY learned tokenizer's
    ``units`` column (bpe_encode or unigram_encode output) — the
    numbers a tokenizer sweep compares:

    - ``fertility``: units per word (SentencePiece/NMT convention;
      1.0 = whole-word vocab, higher = more subword splitting),
    - ``chars_per_unit``: text chars compressed into each unit
      (higher = better compression),
    - ``continued_ratio``: share of units that CONTINUE a word —
      identically ``1 - total_words/total_units``, because BOTH
      families emit exactly one word-marked unit per word (unigram's
      ``▁`` prefix, bpe's ``</w>`` suffix). Computed from the word
      count, NOT by sniffing marker strings in the units: text that
      happens to contain a literal marker would silently corrupt a
      marker-based count.

    Pure Catalyst over the already-encoded frame — one global agg,
    no Python, no re-tokenization (word counts use the same JVM
    whitespace charset the encoders tokenize with). An all-NULL /
    zero-word corpus raises IN-PLAN rather than returning NULL
    metrics a sweep would sort arbitrarily."""
    units = F.col(units_col)
    text = F.col(text_col)
    n_units = F.size(units)
    n_words = F.size(
        F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda w: w != "")
    )
    per_doc = df.where(text.isNotNull() & units.isNotNull()).select(
        n_units.cast("double").alias("_u"),
        n_words.cast("double").alias("_w"),
        F.length(text).cast("double").alias("_c"),
    )
    tw = F.sum("_w")
    guarded = F.when(
        tw.isNull() | (tw == 0),
        F.raise_error(
            "tokenizer_eval: zero words in the corpus (all text/"
            "units NULL or whitespace-only?)"
        ),
    ).otherwise(tw)
    return per_doc.agg(
        (F.sum("_u") / guarded).alias("fertility"),
        (F.sum("_c") / F.sum("_u")).alias("chars_per_unit"),
        (F.lit(1.0) - guarded / F.sum("_u")).alias("continued_ratio"),
        F.sum("_u").cast("long").alias("total_units"),
        F.sum("_w").cast("long").alias("total_words"),
    )
