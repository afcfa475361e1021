"""OPQ — learned orthogonal rotation before product quantization
(the non-parametric alternation of Ge et al., "Optimized Product
Quantization", CVPR 2013; FAISS ships it as OPQMatrix). Pins: the
planted-anisotropy reconstruction improvement over plain PQ at the
same m/k code budget, the opq_iterations=0 degeneration to plain PQ,
rotated-query search parity, rotation validation, and determinism of
the learned rotation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vrl_spark.operators import pq

DIM, M, K = 8, 4, 8


def _aniso(n=256, seed=11):
    """Anisotropic corpus that punishes axis-aligned subspace splits:
    nearly all variance lives in two latent directions, then a seeded
    random orthogonal mix spreads those directions across ALL
    coordinates — plain PQ must spend every subspace's k centroids on
    its share of the big variance, while OPQ can learn the un-mixing
    rotation and concentrate the variance into few coordinates."""
    rng = np.random.RandomState(seed)
    scales = np.array([4.0, 3.0, 0.25, 0.2, 0.15, 0.12, 0.1, 0.08])
    g = rng.randn(n, DIM) * scales
    q, _ = np.linalg.qr(rng.randn(DIM, DIM))
    x = g @ q.T
    return [(i, [float(v) for v in x[i]]) for i in range(n)]


@pytest.fixture(scope="module")
def aniso(spark):
    return spark.createDataFrame(
        _aniso(), ["vec_id", "embedding"]
    ).localCheckpoint()


def _orig_space_err(corpus, approx_df):
    """Mean squared reconstruction error in the ORIGINAL embedding
    space (driver-side on the small test corpus)."""
    vecs = {r.vec_id: np.array(r.embedding) for r in corpus.collect()}
    errs = [
        float(np.sum((vecs[r.vec_id] - np.array(r.approx)) ** 2))
        for r in approx_df.collect()
    ]
    assert len(errs) == len(vecs)
    return sum(errs) / len(errs)


@pytest.fixture(scope="module")
def opq_model(aniso):
    stats = {}
    rotation, books = pq.opq_train(
        aniso, DIM, m=M, k=K, opq_iterations=6, pq_iterations=3,
        iterations=6, stats=stats,
    )
    codes = pq.opq_encode(
        aniso, rotation, books, DIM, m=M, k=K
    ).localCheckpoint()
    return rotation, books.localCheckpoint(), codes, stats


def test_opq_beats_plain_pq_on_anisotropic_corpus(aniso, opq_model):
    rotation, obooks, ocodes, stats = opq_model
    pbooks = pq.pq_train(aniso, DIM, m=M, k=K, iterations=6)
    pcodes = pq.pq_encode(aniso, pbooks, DIM, m=M, k=K)
    err_pq = _orig_space_err(
        aniso, pq.pq_decode(pcodes, pbooks, M)
    )
    err_opq = _orig_space_err(
        aniso, pq.opq_decode(ocodes, rotation, obooks, M)
    )
    # the planted mix concentrates >90% of variance in 2 latent
    # directions; learning the un-mix should at least halve the error
    assert err_opq < 0.5 * err_pq, (err_opq, err_pq)
    # the alternation's objective (rotated-space error) must have
    # improved over the rounds (not strictly monotone: per-round
    # codebooks re-init deterministically rather than warm-start)
    hist = stats["err_history"]
    assert len(hist) == 6 and hist[-1] < hist[0], hist


def test_rotation_is_orthogonal_and_deterministic(aniso, opq_model):
    rotation, _, _, _ = opq_model
    r = np.array(rotation)
    assert np.abs(r @ r.T - np.eye(DIM)).max() < 1e-6
    rotation2, _ = pq.opq_train(
        aniso, DIM, m=M, k=K, opq_iterations=6, pq_iterations=3,
        iterations=6,
    )
    assert np.allclose(r, np.array(rotation2), atol=1e-9)


def test_zero_iterations_degenerates_to_plain_pq(aniso):
    rotation, books = pq.opq_train(
        aniso, DIM, m=M, k=K, opq_iterations=0, iterations=6
    )
    assert np.allclose(np.array(rotation), np.eye(DIM))
    pbooks = pq.pq_train(aniso, DIM, m=M, k=K, iterations=6)
    got = sorted(
        (r.sub_id, r.centroid_id, tuple(r.centroid_vec))
        for r in books.collect()
    )
    want = sorted(
        (r.sub_id, r.centroid_id, tuple(r.centroid_vec))
        for r in pbooks.collect()
    )
    assert got == want
    ocodes = pq.opq_encode(aniso, rotation, books, DIM, m=M, k=K)
    pcodes = pq.pq_encode(aniso, pbooks, DIM, m=M, k=K)
    assert sorted((r.vec_id, tuple(r.codes)) for r in ocodes.collect()) \
        == sorted((r.vec_id, tuple(r.codes)) for r in pcodes.collect())


def test_opq_search_is_pq_search_on_rotated_query(aniso, opq_model):
    rotation, books, codes, _ = opq_model
    q = [r.embedding for r in aniso.filter(F.col("vec_id") == 17)
         .collect()][0]
    via_opq = pq.opq_search(
        q, codes, rotation, books, DIM, m=M, k=K, top_k=10
    ).collect()
    rq = (np.array(rotation) @ np.array(q)).tolist()
    via_pq = pq.pq_search(
        rq, codes, books, DIM, m=M, k=K, top_k=10
    ).collect()
    assert [(r.vec_id, r.adc) for r in via_opq] == [
        (r.vec_id, r.adc) for r in via_pq
    ]
    # self-hit: the query IS a corpus vector, so its own code must
    # score at (tied-)minimum ADC — id 17 appears in the top ranks
    assert 17 in [r.vec_id for r in via_opq[:5]]


def test_rotation_validation_rejects_bad_matrices(aniso):
    bad_shape = np.eye(DIM)[: DIM - 1].tolist()
    with pytest.raises(ValueError, match="must be 8x8"):
        pq.rotate_vectors(aniso, bad_shape, DIM)
    skewed = (np.eye(DIM) * 1.5).tolist()
    with pytest.raises(ValueError, match="not orthogonal"):
        pq.rotate_vectors(aniso, skewed, DIM)
    with pytest.raises(ValueError, match="non-finite"):
        bad = np.eye(DIM)
        bad[0, 0] = np.nan
        pq.rotate_vectors(aniso, bad.tolist(), DIM)
    with pytest.raises(ValueError, match="already in input"):
        pq.rotate_vectors(
            aniso, np.eye(DIM).tolist(), DIM, out_col="embedding"
        )


def test_rotate_vectors_guards_bad_rows(aniso, spark):
    short = spark.createDataFrame(
        [(0, [1.0] * (DIM - 1))], ["vec_id", "embedding"]
    )
    rot = pq.rotate_vectors(short, np.eye(DIM).tolist(), DIM)
    with pytest.raises(Exception, match="rotate_vectors"):
        rot.collect()
    # validate=False documents the contract: an unguarded short row
    # flows NULL elements into the rotated vector (callers must have
    # pre-screened, as opq_train's checkpointed base has)
    unguarded = pq.rotate_vectors(
        short, np.eye(DIM).tolist(), DIM, validate=False
    ).collect()[0]
    assert any(x is None for x in unguarded.rotated)


def test_decode_keep_cols_passthrough_and_clash(aniso, opq_model):
    rotation, books, _, _ = opq_model
    enc = pq.opq_encode(
        aniso, rotation, books, DIM, m=M, k=K, keep_cols=("embedding",)
    )
    dec = pq.pq_decode(enc, books, M, keep_cols=("embedding",))
    row = dec.filter(F.col("vec_id") == 3).collect()[0]
    assert len(row.embedding) == DIM and len(row.approx) == DIM
    with pytest.raises(ValueError, match="clashes with output"):
        pq.pq_decode(enc, books, M, keep_cols=("approx",))
    with pytest.raises(ValueError, match="not in input"):
        pq.pq_decode(enc, books, M, keep_cols=("nope",))


def test_opq_train_validates_and_raises_on_empty(aniso, spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="corpus is empty"):
        pq.opq_train(empty, DIM, m=M, k=K)
    bad = spark.createDataFrame(
        [(0, [1.0] * DIM), (1, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="opq_train"):
        pq.opq_train(bad, DIM, m=M, k=K, opq_iterations=1)
    with pytest.raises(ValueError, match="opq_iterations"):
        pq.opq_train(aniso, DIM, m=M, k=K, opq_iterations=-1)
