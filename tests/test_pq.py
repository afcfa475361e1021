"""Product quantization: recall against exact brute force on a
planted clustered corpus, reconstruction-error improvement over
training, determinism, and parameter validation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vrl_spark.operators import pq

DIM, M, K = 16, 4, 8
CENTERS = 8


def _planted(n=200, centers=CENTERS, seed=7):
    rng = np.random.RandomState(seed)
    c = rng.randn(centers, DIM) * 3.0
    rows = []
    for i in range(n):
        v = c[i % centers] + rng.randn(DIM) * 0.15
        rows.append((i, [float(x) for x in v]))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        _planted(), ["vec_id", "embedding"]
    ).localCheckpoint()


@pytest.fixture(scope="module")
def trained(corpus):
    stats = {}
    books = pq.pq_train(
        corpus, DIM, m=M, k=K, iterations=8, stats=stats
    ).localCheckpoint()
    codes = pq.pq_encode(corpus, books, DIM, m=M, k=K).localCheckpoint()
    return books, codes, stats


def test_codebook_shape_and_codes_range(trained):
    books, codes, stats = trained
    got = books.groupBy("sub_id").count().collect()
    assert {r.sub_id for r in got} == set(range(M))
    assert all(r["count"] <= K for r in got)
    assert stats["iterations"] >= 1
    for r in codes.collect():
        assert len(r.codes) == M
        assert all(0 <= c < K for c in r.codes)


def test_adc_recall_vs_exact(trained, corpus):
    books, codes, _ = trained
    data = {r.vec_id: np.array(r.embedding) for r in corpus.collect()}
    rng = np.random.RandomState(3)
    hits = total = 0
    for qid in rng.choice(sorted(data), 5, replace=False):
        q = data[qid]
        exact = sorted(
            data, key=lambda i: float(np.sum((data[i] - q) ** 2))
        )[:10]
        got = [
            r.vec_id
            for r in pq.pq_search(
                list(q), codes, books, DIM, m=M, k=K, top_k=10
            ).collect()
        ]
        # the HARD guarantee on this corpus: every ADC hit is in the
        # query's true planted cluster (same-cluster vectors share
        # codes, so within-cluster ADC ranks tie and id tie-breaks
        # bound exact-set overlap below 1.0 by construction)
        assert all(g % CENTERS == qid % CENTERS for g in got), (qid, got)
        hits += len(set(exact) & set(got))
        total += 10
    assert hits / total >= 0.4, hits / total


def test_reconstruction_error_improves_with_training(corpus):
    def mse(iters):
        books = pq.pq_train(corpus, DIM, m=M, k=K, iterations=iters)
        codes = pq.pq_encode(corpus, books, DIM, m=M, k=K)
        approx = pq.pq_decode(codes, books, M)
        from vrl_spark.operators.clustering import l2_sq

        joined = corpus.join(approx, "vec_id").select(
            l2_sq(
                F.transform("embedding", lambda x: x.cast("double")),
                F.col("approx"),
            ).alias("e")
        )
        return joined.agg(F.avg("e")).collect()[0][0]

    assert mse(6) < mse(1) * 0.9


def test_encode_is_partitioning_invariant(trained, corpus):
    books, codes, _ = trained
    again = pq.pq_encode(
        corpus.repartition(13), books, DIM, m=M, k=K
    )
    a = {r.vec_id: list(r.codes) for r in codes.collect()}
    b = {r.vec_id: list(r.codes) for r in again.collect()}
    assert a == b


def test_param_validation(corpus):
    with pytest.raises(ValueError):
        pq.pq_train(corpus, 15, m=M, k=K)  # 15 % 4 != 0
    with pytest.raises(ValueError):
        pq.pq_train(corpus, DIM, m=M, k=0)
    with pytest.raises(ValueError):
        pq.pq_train(corpus, DIM, m=M, k=K, iterations=0)
    with pytest.raises(ValueError):
        pq.pq_search([0.0] * 5, None, None, DIM, m=M, k=K)


def test_decode_roundtrips_centroid_vectors(trained, spark):
    """A vector that IS a centroid concatenation reconstructs
    exactly."""
    books, _, _ = trained
    cents = {
        (r.sub_id, r.centroid_id): r.centroid_vec
        for r in books.collect()
    }
    vec = []
    for j in range(M):
        vec += list(cents[(j, 0)])
    df = spark.createDataFrame([(999, vec)], ["vec_id", "embedding"])
    codes = pq.pq_encode(df, books, DIM, m=M, k=K)
    approx = pq.pq_decode(codes, books, M).collect()[0].approx
    assert np.allclose(np.array(approx), np.array(vec))


def test_encode_raises_on_wrong_length_or_null_embedding(trained, spark):
    books, _, _ = trained
    bad = spark.createDataFrame(
        [(1, [0.0] * 12)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="embedding NULL or length"):
        pq.pq_encode(bad, books, DIM, m=M, k=K).collect()
    nul = spark.createDataFrame(
        [(2, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="embedding NULL or length"):
        pq.pq_encode(nul, books, DIM, m=M, k=K).collect()


def test_decode_raises_on_foreign_codes(trained, spark):
    books, _, _ = trained
    foreign = spark.createDataFrame(
        [(1, [K + 5] * M)], "vec_id long, codes array<int>"
    )
    with pytest.raises(Exception, match="no matching centroid"):
        pq.pq_decode(foreign, books, M).collect()


def test_validator_rejects_malformed_codebooks(trained, spark):
    books, codes, _ = trained
    gap = books.where("sub_id != 1")  # non-contiguous subspaces
    with pytest.raises(ValueError, match="sub_ids"):
        pq.pq_encode(spark.range(0), gap, DIM, m=M, k=K)
    dup = books.unionAll(books.limit(1))
    with pytest.raises(ValueError, match="duplicate"):
        pq.pq_search([0.0] * DIM, codes, dup, DIM, m=M, k=K)
    shifted = books.withColumn("sub_id", F.col("sub_id") + 1)
    with pytest.raises(ValueError, match="sub_ids"):
        pq.pq_decode(codes, shifted, M)


def test_search_and_decode_raise_on_bad_code_rows(trained, spark):
    books, _, _ = trained
    for codes_val, schema in [
        ([K + 5] * M, "vec_id long, codes array<int>"),   # foreign
        ([0, 1], "vec_id long, codes array<int>"),        # short
        (None, "vec_id long, codes array<int>"),          # NULL row
    ]:
        bad = spark.createDataFrame([(1, codes_val)], schema)
        with pytest.raises(Exception, match="pq_search"):
            pq.pq_search(
                [0.0] * DIM, bad, books, DIM, m=M, k=K
            ).collect()
        with pytest.raises(Exception, match="pq_decode"):
            pq.pq_decode(bad, books, M).collect()


def test_encode_raises_on_null_element(trained, spark):
    books, _, _ = trained
    bad = spark.createDataFrame(
        [(1, [0.0] * (DIM - 1) + [None])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="embedding NULL or length"):
        pq.pq_encode(bad, books, DIM, m=M, k=K).collect()


def test_validator_rejects_null_centroid_id(trained, spark):
    books, _, _ = trained
    nulled = books.withColumn(
        "centroid_id",
        F.when(
            (F.col("sub_id") == 0) & (F.col("centroid_id") == 0),
            F.lit(None),
        ).otherwise(F.col("centroid_id")),
    )
    with pytest.raises(ValueError, match="NULL"):
        pq.pq_encode(spark.range(0), nulled, DIM, m=M, k=K)


def test_ivf_pq_degenerates_to_full_pq_search(trained, corpus, spark):
    """nprobe == n_lists must return exactly pq_search over the full
    corpus; nprobe=1 returns hits from the probed list only."""
    from vrl_spark.operators import similarity

    books, codes, _ = trained
    n_lists = 4
    cents = similarity.ivf_centroids(corpus, n_lists).localCheckpoint()
    assigns = similarity.ivf_assign(corpus, cents).select(
        "vec_id", "list_id"
    ).localCheckpoint()
    q = [0.5] * DIM
    full = [
        (r.vec_id, r.adc)
        for r in pq.pq_search(q, codes, books, DIM, m=M, k=K, top_k=10)
        .collect()
    ]
    comp = [
        (r.vec_id, r.adc)
        for r in pq.ivf_pq_search(
            q, codes, books, assigns, cents, DIM,
            m=M, k=K, nprobe=n_lists, top_k=10,
        ).collect()
    ]
    assert comp == full

    one = pq.ivf_pq_search(
        q, codes, books, assigns, cents, DIM, m=M, k=K, nprobe=1,
        top_k=10,
    ).collect()
    # replicate the probe: nearest centroid to q by rounded L2, then
    # smallest id — every hit must belong to THAT list
    cl = cents.collect()
    best_list = min(
        cl,
        key=lambda r: (
            round(
                sum(
                    (float(a) - b) ** 2
                    for a, b in zip(r.centroid_vec, q)
                ),
                6,
            ),
            r.centroid_id,
        ),
    ).centroid_id
    members = {
        r.vec_id for r in assigns.collect() if r.list_id == best_list
    }
    got_ids = {r.vec_id for r in one}
    assert got_ids and got_ids <= members
    assert len(one) <= 10
    with pytest.raises(ValueError):
        pq.ivf_pq_search(
            q, codes, books, assigns, cents, DIM, m=M, k=K, nprobe=0
        )


def test_ivf_pq_validates_centroids(trained, corpus, spark):
    books, codes, _ = trained
    assigns = spark.createDataFrame([(0, 0)], ["vec_id", "list_id"])
    q = [0.0] * DIM
    empty = spark.createDataFrame(
        [], "centroid_id int, centroid_vec array<double>"
    )
    with pytest.raises(ValueError, match="empty"):
        pq.ivf_pq_search(q, codes, books, assigns, empty, DIM, m=M, k=K)
    short = spark.createDataFrame(
        [(0, [0.0] * DIM), (1, [100.0])],
        "centroid_id int, centroid_vec array<double>",
    )
    with pytest.raises(ValueError, match="wrong-dim"):
        pq.ivf_pq_search(q, codes, books, assigns, short, DIM, m=M, k=K)


def test_search_raises_on_colliding_foreign_code(trained, spark):
    """A code foreign only in a NON-final subspace used to collide
    with another subspace's flattened map key and silently score."""
    books, _, _ = trained
    bad = spark.createDataFrame(
        [(1, [K + 5] + [0] * (M - 1))], "vec_id long, codes array<int>"
    )
    with pytest.raises(Exception, match="pq_search"):
        pq.pq_search([0.0] * DIM, bad, books, DIM, m=M, k=K).collect()


def test_partial_codebook_absent_centroid_raises(spark):
    """Corpus smaller than k -> partial codebooks pass validation;
    an in-range code pointing at an untrained centroid must raise the
    absent-centroid message (not fold to a silent NULL); a foreign
    code in the LAST subspace takes the falls-off-the-map path and
    must raise too."""
    small = spark.createDataFrame(
        [(i, [float(i)] * DIM) for i in range(3)],
        ["vec_id", "embedding"],
    )
    books = pq.pq_train(small, DIM, m=M, k=K, iterations=1)
    q = [0.0] * DIM
    absent = spark.createDataFrame(
        [(1, [K - 1] * M)], "vec_id long, codes array<int>"
    )  # in [0, k) but only 3 centroids trained
    with pytest.raises(Exception, match="no centroid in its"):
        pq.pq_search(q, absent, books, DIM, m=M, k=K).collect()
    last_foreign = spark.createDataFrame(
        [(1, [0] * (M - 1) + [K + 5])], "vec_id long, codes array<int>"
    )
    with pytest.raises(Exception, match="pq_search"):
        pq.pq_search(q, last_foreign, books, DIM, m=M, k=K).collect()


def test_train_raises_on_bad_training_vectors(corpus, spark):
    """pq_train applies the same in-plan guard as pq_encode: a NULL,
    short, or NULL-element training vector raises instead of silently
    winning argmins through NULL distances (ADVICE r5)."""
    bad = corpus.union(spark.createDataFrame(
        [(9001, [0.0] * (DIM - 4))], "vec_id long, embedding array<double>"
    ))
    with pytest.raises(Exception, match="pq_train: embedding NULL or length"):
        pq.pq_train(bad, DIM, m=M, k=K, iterations=1)
    nul_el = corpus.union(spark.createDataFrame(
        [(9002, [0.0] * (DIM - 1) + [None])],
        "vec_id long, embedding array<double>",
    ))
    with pytest.raises(Exception, match="pq_train: embedding NULL or length"):
        pq.pq_train(nul_el, DIM, m=M, k=K, iterations=1)
    # validate=False is the documented escape hatch for pre-screened
    # corpora: the clean rows still train
    books = pq.pq_train(corpus, DIM, m=M, k=K, iterations=1,
                        validate=False)
    assert books.count() == M * K


# ---------------------------------------------------------------------
# residual PQ (FAISS IVFPQ by_residual)
# ---------------------------------------------------------------------

@pytest.fixture(scope="module")
def coarse(corpus):
    from vrl_spark.operators import similarity

    cents = similarity.ivf_centroids(corpus, 8).localCheckpoint()
    assigns = similarity.ivf_assign(corpus, cents).select(
        "vec_id", "list_id"
    ).localCheckpoint()
    return cents, assigns


@pytest.fixture(scope="module")
def residual_trained(corpus, coarse):
    cents, _ = coarse
    books = pq.ivfpq_train(
        corpus, cents, DIM, m=M, k=K, iterations=8
    ).localCheckpoint()
    enc = pq.ivfpq_encode(
        corpus, cents, books, DIM, m=M, k=K
    ).localCheckpoint()
    return books, enc


def _query(corpus_rows):
    # a point near cluster 2's planted center: average of its members
    members = [r for i, r in enumerate(corpus_rows) if i % CENTERS == 2]
    d = len(members[0][1])
    return [sum(m[1][j] for m in members) / len(members) + 0.01
            for j in range(d)]


def test_ivfpq_search_exact_reconstruction_distance(
    residual_trained, coarse, corpus, spark
):
    """nprobe = n_lists degeneration: the per-list ADC must equal the
    brute-force reconstruction distance ||q - (c_list + decode)||^2
    for EVERY row (exact identity — residual quantization is the only
    approximation)."""
    books, enc = residual_trained
    cents, _ = coarse
    rows = corpus.collect()
    q = _query([(r.vec_id, r.embedding) for r in rows])

    got = {
        r.vec_id: r.adc
        for r in pq.ivfpq_search(
            q, enc, books, cents, DIM, m=M, k=K, nprobe=8, top_k=200
        ).collect()
    }
    assert len(got) == len(rows)

    cb = {
        (r.sub_id, r.centroid_id): list(r.centroid_vec)
        for r in books.collect()
    }
    cvec = {r.centroid_id: list(r.centroid_vec) for r in cents.collect()}
    sub_dim = DIM // M
    for e in enc.collect():
        rec = list(cvec[e.list_id])
        for j, code in enumerate(e.codes):
            for d, x in enumerate(cb[(j, code)]):
                rec[j * sub_dim + d] += x
        want = round(sum((a - b) ** 2 for a, b in zip(q, rec)), 6)
        assert got[e.vec_id] == pytest.approx(want, abs=2e-6), e.vec_id


def test_ivfpq_beats_raw_ivf_pq_recall(
    residual_trained, trained, coarse, corpus
):
    """The point of residuals (VERDICT r5 item 4): at equal
    nprobe/m/k on the planted-cluster corpus, recall@10 vs exact
    brute force improves over the non-residual composition (the
    shared codebooks spend resolution on within-list noise, not the
    between-cluster spread)."""
    books_raw, codes_raw, _ = trained
    books_res, enc_res = residual_trained
    cents, assigns = coarse
    rows = [(r.vec_id, list(r.embedding)) for r in corpus.collect()]
    q = _query(rows)
    exact_ids = {
        r[0]
        for r in sorted(
            rows,
            key=lambda r: sum((a - b) ** 2 for a, b in zip(r[1], q)),
        )[:10]
    }
    for nprobe in (2, 8):
        raw = {
            r.vec_id
            for r in pq.ivf_pq_search(
                q, codes_raw, books_raw, assigns, cents, DIM,
                m=M, k=K, nprobe=nprobe, top_k=10,
            ).collect()
        }
        res = {
            r.vec_id
            for r in pq.ivfpq_search(
                q, enc_res, books_res, cents, DIM,
                m=M, k=K, nprobe=nprobe, top_k=10,
            ).collect()
        }
        raw_rec = len(raw & exact_ids) / 10
        res_rec = len(res & exact_ids) / 10
        assert res_rec >= raw_rec, (nprobe, res_rec, raw_rec)
        assert res_rec >= 0.5, (nprobe, res_rec)


def test_ivfpq_probe_restriction_and_validation(
    residual_trained, coarse, corpus, spark
):
    books, enc = residual_trained
    cents, assigns = coarse
    rows = [(r.vec_id, list(r.embedding)) for r in corpus.collect()]
    q = _query(rows)
    # nprobe=1: every hit belongs to the single probed list
    one = pq.ivfpq_search(
        q, enc, books, cents, DIM, m=M, k=K, nprobe=1, top_k=10
    ).collect()
    cl = cents.collect()
    best = min(
        cl,
        key=lambda r: (
            round(sum((float(a) - b) ** 2
                      for a, b in zip(r.centroid_vec, q)), 6),
            r.centroid_id,
        ),
    ).centroid_id
    members = {r.vec_id for r in enc.collect() if r.list_id == best}
    assert one and {r.vec_id for r in one} <= members

    # plain pq_encode codes (no list_id) are rejected with direction
    plain = enc.select("vec_id", "codes")
    with pytest.raises(ValueError, match="list_id"):
        pq.ivfpq_search(q, plain, books, cents, DIM, m=M, k=K)
    with pytest.raises(ValueError):
        pq.ivfpq_search(q, enc, books, cents, DIM, m=M, k=K, nprobe=0)
    # negative list ids would corrupt the flattened table keys
    neg = spark.createDataFrame(
        [(-1, [0.0] * DIM)], "centroid_id int, centroid_vec array<double>"
    )
    with pytest.raises(ValueError, match="negative"):
        pq.ivfpq_search(q, enc, books, neg, DIM, m=M, k=K)
    # residuals: an assignments frame referencing a missing list raises
    bad_assign = assigns.select(
        "vec_id", (F.col("list_id") + 1000).alias("list_id")
    )
    with pytest.raises(Exception, match="has no centroid"):
        pq.pq_residuals(
            corpus, cents, DIM, assignments=bad_assign
        ).collect()


def test_residuals_raise_on_corpus_id_missing_from_assignments(
    coarse, corpus
):
    """A corpus id absent from a stale assignments snapshot must raise
    (left join + NULL-list_id guard), never silently vanish from the
    index — an unindexed vector is unsearchable at any nprobe."""
    cents, assigns = coarse
    stale = assigns.where(F.col("vec_id") != 0)  # drop one id
    with pytest.raises(Exception, match="has no centroid"):
        pq.pq_residuals(corpus, cents, DIM, assignments=stale).collect()
