"""Byte-pair-encoding tokenizer: distributed vocabulary training +
Arrow-batched corpus encoding.

The reference engine tokenizes with fixed rules (parse_tokens,
vrl_spark's whitespace/BPE-ish counters); a training-data pipeline
additionally needs a LEARNED subword vocabulary (Sennrich et al.
2016's BPE — the GPT/Llama tokenizer family). The split of labor
follows every production trainer (SentencePiece, HF tokenizers):

- **Corpus pass (the 100 TB part) is distributed and happens ONCE:**
  one explode -> word-count aggregation (map-side combined, one
  shuffle keyed by word type). The result is the WORD-FREQUENCY
  TABLE — vocabulary-sized (hundreds of thousands of rows, megabytes)
  regardless of corpus size.
- **The merge loop runs on that reduced table** (driver-side Python
  over a dict, exactly like collecting any aggregated statistic):
  BPE's pair statistics depend only on (word form, count), so
  training on the frequency table is byte-identical to training on
  the raw corpus — no loop over 100 TB exists in the algorithm.
- **Encoding is the map-only part**: the learned merge ranks
  broadcast to every task inside an Arrow-batched pandas UDF; each
  word greedily applies the lowest-rank merge until none applies
  (the standard encode; per-word results are memoized per batch).

End-of-word convention: the last symbol of each word carries the
``</w>`` suffix (original paper), so learned units distinguish
word-final from word-internal occurrences and decode is lossless:
concat symbols, strip the marker, join on space.
"""

from __future__ import annotations

import re

import pandas as pd  # module level: pandas_udf resolves 'pd.Series' hints
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EOW = "</w>"

_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def java_ws_words(t: str) -> list[str]:
    """Python-side mirror of the JVM tokenization ``word_counts``
    trains on (``split(lower(trim(text)), '\\s+')`` + the non-empty
    filter): Java's ``\\s`` is ASCII-only ([ \\t\\n\\x0B\\f\\r]),
    while Python's ``str.split()`` also eats U+00A0 and other Unicode
    whitespace — on such text the two produce DIFFERENT word types,
    so the encode lanes must match the charset training counted with
    or vocab mass lands on words the encoder never sees. (Case-
    mapping differences between Java toLowerCase and ``str.lower``
    on exotic codepoints remain out of scope.)"""
    return [w for w in _JAVA_WS.split(t.lower()) if w]


# ---------------------------------------------------------------------
# training
# ---------------------------------------------------------------------

def word_counts(
    df: DataFrame,
    text_col: str = "text",
    max_types: int | None = None,
) -> DataFrame:
    """(word, cnt) over the whitespace-lowercase tokenization (the
    repo-wide convention). One explode + one map-side-combined agg —
    the only corpus-wide pass BPE training needs. ``max_types`` keeps
    the top-N word types by (cnt desc, word asc) via TakeOrdered (no
    global sort)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    out = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(toks).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if max_types is not None:
        out = out.orderBy(F.col("cnt").desc(), F.col("word").asc()).limit(
            max_types
        )
    return out


def _pairs_of(sym: tuple[str, ...]):
    return zip(sym, sym[1:])


def train_merges(
    freqs: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency dict
    (Sennrich et al. 2016, algorithm 1). Deterministic: the best pair
    is (count desc, pair lexicographic asc); stops early when no pair
    occurs twice. Pure Python over the vocabulary-sized table — this
    is NOT a corpus loop (see module docstring)."""
    words: dict[tuple[str, ...], int] = {}
    for w, c in freqs.items():
        if not w:
            continue
        sym = tuple(w[:-1]) + (w[-1] + EOW,)
        words[sym] = words.get(sym, 0) + int(c)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, c in words.items():
            for p in _pairs_of(sym):
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        merged = a + b
        nxt: dict[tuple[str, ...], int] = {}
        for sym, c in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + c
        words = nxt
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 1000,
    max_types: int | None = None,
) -> list[tuple[str, str]]:
    """Distributed word counts -> merge learning. Returns the ordered
    merge list (rank = position). The collect here is of the REDUCED
    frequency table (vocabulary-sized), not the corpus — the same
    contract as collecting any aggregate."""
    rows = word_counts(df, text_col, max_types).collect()
    return train_merges({r["word"]: r["cnt"] for r in rows}, num_merges)


def merges_table(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The merge list as a (rank, left, right) DataFrame — the
    persistable/broadcastable artifact form."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        schema="rank long, left string, right string",
    )


# ---------------------------------------------------------------------
# encoding (map-only)
# ---------------------------------------------------------------------

def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word[:-1]) + [word[-1] + EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    merges: list[tuple[str, str]],
    text: Column,
) -> Column:
    """array<string> of BPE units for a text column. Arrow-batched
    pandas UDF (tokenization is the one sanctioned Python hot path —
    there is no per-word greedy merge in Catalyst's vocabulary); the
    merge ranks ride the closure (serialized once per task, not per
    row) and per-word results memoize within the process."""

    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _enc(s: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(t):
            if t is None:
                return None
            out: list[str] = []
            for w in java_ws_words(t):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        return s.map(one)

    return _enc(text)


def bpe_decode_units(units: Column) -> Column:
    """Inverse of bpe_encode for verification: concatenate units,
    split words on the end-of-word marker, join with single spaces.
    Pure Catalyst (no Python)."""
    joined = F.array_join(units, "")
    return F.rtrim(F.replace(joined, F.lit(EOW), F.lit(" ")))


def bpe_token_count(merges: list[tuple[str, str]], text: Column) -> Column:
    """Learned-vocabulary token count — the budget metric a trained
    tokenizer's pipeline shards/packs by: pass it as ``token_col`` to
    ``sharding.shard_assign`` / ``sampling.pack_documents`` so budgets
    are measured in the units a training run actually consumes.
    Materialize (localCheckpoint/persist) the counted frame before
    sharding: shard_assign reads its input in both prefix-sum passes,
    and an unmaterialized column re-runs the encode UDF per pass
    (plan-pinned in tests/test_sharding.py)."""
    return F.size(bpe_encode(merges, text)).cast("long")
