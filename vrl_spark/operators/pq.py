"""Product quantization (PQ) for embedding columns — the compression
tier of the similarity family (brute -> LSH -> IVF -> PQ): each
d-dim vector is split into m contiguous subvectors, each subspace
gets its own k-centroid codebook (trained with the same Lloyd loop
discipline as operators/clustering.kmeans), and a vector is stored as
m small codes — d*4 bytes become m bytes at k<=256, a 16-32x
shrink of the index the 100 TB corpus actually has to keep hot.
Search is asymmetric distance computation (ADC): the query computes
one m x k distance table against the codebooks (tiny), and every
stored code scores with m map-side lookups — no decompression, no
per-row Python.

Scale shape:
- train: ONE subvector explode (m rows per vector) + per iteration
  one broadcast of the m*k centroid structs and one
  map-side-combined (sub, centroid, dim) mean shuffle; centroids
  localCheckpoint per round with the shift folded in (k-row action
  for convergence, mirroring kmeans/pagerank loop discipline).
- encode: MAP-ONLY — the folded codebook array broadcasts and each
  row computes its m argmins in place (the ivf_assign shape); codes
  never shuffle.
- search: the distance table is a 1-row broadcast map; scoring is a
  map-side fold over the code array; top-k is orderBy().limit()
  (TakeOrderedAndProject — no global single-task window).

Determinism: smallest-md5 per-subspace init, distances rounded to
1e-6 before every argmin with centroid-id tie-break, means divide
exact sums — identical codes across runs, partitionings and engines.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vrl_spark.operators.clustering import l2_sq


def _check_params(dim: int, m: int, k: int) -> int:
    if m < 1 or dim < 1 or dim % m != 0:
        raise ValueError(
            f"dim ({dim}) must be a positive multiple of m ({m})"
        )
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return dim // m


def _sub(vec: Column, j: Column | int, sub_dim: int) -> Column:
    start = (
        F.lit(j) * sub_dim + 1 if isinstance(j, int) else j * sub_dim + 1
    )
    return F.slice(vec, start, sub_dim)


def _bad_vec(vec_col: str, dim: int) -> Column:
    """The shared NULL/length/NULL-element predicate both train and
    encode guard on (a bad vector otherwise wins every argmin through
    NULL distances). isNull spelled out: size(NULL) is NULL and a NULL
    comparison silently takes the otherwise branch; a NULL ELEMENT
    inside a correct-length array likewise yields NULL distances."""
    return (
        F.col(vec_col).isNull()
        | (F.size(F.col(vec_col)) != dim)
        | F.exists(F.col(vec_col), lambda x: x.isNull())
    )


def _vec_error(fn: str, vec_col: str, dim: int) -> Column:
    return F.raise_error(
        F.concat(
            F.lit(f"{fn}: embedding NULL or length "),
            F.coalesce(
                F.size(F.col(vec_col)).cast("string"), F.lit("NULL")
            ),
            F.lit(f" != dim ({dim})"),
        )
    )


def _fold_codebooks(codebooks: DataFrame) -> DataFrame:
    """1-row frame for broadcasting: `_cb` is an array INDEXED BY
    sub_id (element j+1 = subspace j's array of (cid, cvec) structs),
    so per-subspace lookups are O(1) element_at instead of filtering
    the full m*k struct array once per subspace per row."""
    return (
        codebooks.groupBy("sub_id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("centroid_id").alias("cid"),
                    F.col("centroid_vec").alias("cvec"),
                )
            ).alias("_arr")
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub_id", "_arr"))),
                lambda s: s["_arr"],
            ).alias("_cb")
        )
    )


def _validate_codebooks(
    codebooks: DataFrame,
    m: int,
    sub_dim: int | None = None,
    k: int | None = None,
) -> None:
    """Driver-side shape check on the tiny codebook frame (one small
    eager agg per call — pass validate=False in hot loops if the same
    frame was already checked): a dim/m/k mismatch against a trained
    codebook would otherwise flow NULL distances (zip_with pads) into
    silently-garbage codes and a NULLS-FIRST ranking, and the
    positional element_at indexing requires sub_ids to be exactly
    0..m-1 with unique non-negative centroid ids."""
    row = codebooks.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("sub_id").alias("subs"),
        F.countDistinct(F.struct("sub_id", "centroid_id")).alias("uniq"),
        F.min("sub_id").alias("lo"),
        F.max("sub_id").alias("hi"),
        F.min("centroid_id").alias("minc"),
        F.max("centroid_id").alias("maxc"),
        F.min(F.size("centroid_vec")).alias("dmin"),
        F.max(F.size("centroid_vec")).alias("dmax"),
        F.sum(
            (
                F.col("sub_id").isNull()
                | F.col("centroid_id").isNull()
                | F.col("centroid_vec").isNull()
                # a NULL ELEMENT inside a centroid wins argmins via
                # NULL distances and desyncs the ADC map arrays
                | F.exists(
                    F.col("centroid_vec"), lambda x: x.isNull()
                )
            ).cast("int")
        ).alias("nulls"),
    ).collect()[0]
    if row["n"] == 0:
        raise ValueError("codebooks frame is empty")
    if row["nulls"]:
        raise ValueError(
            f"codebooks hold {row['nulls']} NULL "
            "sub_id/centroid_id/centroid_vec values"
        )
    if row["subs"] != m or row["lo"] != 0 or row["hi"] != m - 1:
        raise ValueError(
            f"codebooks cover sub_ids [{row['lo']}, {row['hi']}] "
            f"({row['subs']} distinct), expected exactly 0..{m - 1}"
        )
    if row["uniq"] != row["n"]:
        raise ValueError(
            f"codebooks hold {row['n'] - row['uniq']} duplicate "
            "(sub_id, centroid_id) rows"
        )
    if row["minc"] < 0:
        raise ValueError(
            f"codebooks hold negative centroid_id {row['minc']}"
        )
    if sub_dim is not None and (
        row["dmin"] != sub_dim or row["dmax"] != sub_dim
    ):
        raise ValueError(
            f"codebook centroid length {row['dmin']}..{row['dmax']} "
            f"!= dim/m = {sub_dim} — trained with different (dim, m)?"
        )
    if k is not None and row["maxc"] >= k:
        raise ValueError(
            f"codebooks hold centroid_id {row['maxc']} >= k ({k})"
        )


def _validate_centroids(centroids: DataFrame, dim: int) -> None:
    """Driver-side shape check on the tiny coarse-centroid frame: a
    NULL or wrong-dim centroid_vec yields a NULL probe distance,
    which would sort FIRST and silently win the probe over the true
    nearest list; an empty frame returns silently-empty hits; and
    negative list ids would corrupt the flattened per-list ADC map
    keys in the residual composition."""
    crow = centroids.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (
                F.col("centroid_id").isNull()
                | F.col("centroid_vec").isNull()
                | (F.size("centroid_vec") != dim)
                | F.exists(
                    F.col("centroid_vec"), lambda x: x.isNull()
                )
            ).cast("int")
        ).alias("bad"),
        F.countDistinct("centroid_id").alias("uniq"),
        F.min("centroid_id").alias("minc"),
    ).collect()[0]
    if crow["n"] == 0:
        raise ValueError("centroids frame is empty")
    if crow["bad"]:
        raise ValueError(
            f"centroids hold {crow['bad']} NULL/wrong-dim rows "
            f"(expected every centroid_vec length == {dim})"
        )
    if crow["uniq"] != crow["n"]:
        raise ValueError("centroids hold duplicate centroid_id rows")
    if crow["minc"] is not None and crow["minc"] < 0:
        raise ValueError(
            f"centroids hold negative centroid_id {crow['minc']}"
        )


def _best_cid(subvec: Column, sub_id: Column | int) -> Column:
    """argmin centroid id for one subvector against the broadcast
    indexed `_cb` array (rounded distance, centroid-id tie-break)."""
    sid = F.lit(sub_id) if isinstance(sub_id, int) else sub_id
    return F.array_min(
        F.transform(
            F.element_at(F.col("_cb"), sid + 1),
            lambda c: F.struct(
                F.round(l2_sq(subvec, c["cvec"]), 6).alias("d"),
                c["cid"].alias("cid"),
            ),
        )
    )["cid"]


def pq_train(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    iterations: int = 8,
    tol: float = 1e-9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats: dict | None = None,
    validate: bool = True,
) -> DataFrame:
    """Train the m per-subspace codebooks; returns (sub_id,
    centroid_id, centroid_vec array<double>). All m subspaces train
    in ONE joint Lloyd loop (one Spark job per iteration, not m).

    Training vectors get the same in-plan NULL/length guard as
    pq_encode (a NULL or short vector yields NULL subspace distances
    that win every argmin via the NULL-first struct compare, silently
    skewing centroid assignment); pass ``validate=False`` only for a
    corpus already screened by the caller."""
    sub_dim = _check_params(dim, m, k)
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    vec = F.col(vec_col)
    if validate:
        vec = F.when(
            _bad_vec(vec_col, dim), _vec_error("pq_train", vec_col, dim)
        ).otherwise(F.col(vec_col))
    subs = corpus.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.transform(
                    _sub(vec, j, sub_dim),
                    lambda x: x.cast("double"),
                ),
            )
        ).alias("sub_id", "subvec"),
    )
    # deterministic init: the k smallest-md5 VECTORS, sliced into all
    # m subspaces — one parallel top-k (TakeOrderedAndProject), no
    # per-subspace window funnel; the row_number below runs on the
    # k-row sample only
    sample = (
        corpus.select(
            F.col(id_col),
            # the guarded expression: a bad vector among the k
            # smallest-md5 init rows must raise, not seed NULL
            # centroid components
            vec.alias("_v"),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h", id_col)
        .limit(k)
    )
    w = Window.orderBy("_h", id_col)
    centroids = (
        sample.withColumn(
            "centroid_id", (F.row_number().over(w) - 1).cast("int")
        )
        .select(
            "centroid_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    lambda j: F.transform(
                        _sub(F.col("_v"), j, sub_dim),
                        lambda x: x.cast("double"),
                    ),
                )
            ).alias("sub_id", "centroid_vec"),
        )
        .select("sub_id", "centroid_id", "centroid_vec")
        .localCheckpoint()
    )
    # an empty corpus would silently yield an empty codebook and,
    # downstream, all-NULL codes — fail loudly here instead
    if not centroids.take(1):
        raise ValueError("pq_train: corpus is empty")
    it, max_shift, converged = 0, None, False
    for it in range(1, iterations + 1):
        assigned = subs.join(
            F.broadcast(_fold_codebooks(centroids))
        ).select(
            "sub_id", "subvec",
            _best_cid(F.col("subvec"), F.col("sub_id")).alias(
                "centroid_id"
            ),
        )
        means = (
            assigned.select(
                "sub_id", "centroid_id",
                F.posexplode("subvec").alias("_d", "_x"),
            )
            .groupBy("sub_id", "centroid_id", "_d")
            .agg(F.avg("_x").alias("_m"))
            .groupBy("sub_id", "centroid_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_d", "_m"))
                    ),
                    lambda s: s["_m"],
                ).alias("_new")
            )
        )
        # empty clusters carry their old centroid (shift 0)
        centroids = (
            centroids.join(means, ["sub_id", "centroid_id"], "left")
            .select(
                "sub_id", "centroid_id",
                F.coalesce("_new", "centroid_vec").alias("centroid_vec"),
                F.when(
                    F.col("_new").isNull(), F.lit(0.0)
                ).otherwise(
                    l2_sq(F.col("_new"), F.col("centroid_vec"))
                ).alias("shift"),
            )
            .localCheckpoint()
        )
        max_shift = centroids.agg(F.max("shift")).collect()[0][0] or 0.0
        if max_shift < tol:
            converged = True
            break
    if stats is not None:
        stats.update(
            iterations=it, converged=converged, max_shift=max_shift
        )
    return centroids.select("sub_id", "centroid_id", "centroid_vec")


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    validate: bool = True,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *keep_cols, codes array<int>) — MAP-ONLY: the folded
    codebooks broadcast and each row computes its m argmins in place;
    the corpus never expands or shuffles. Rows whose embedding length
    != dim raise in-plan (a short row would otherwise win every
    argmin through NULL distances and encode as silent garbage).
    ``keep_cols`` passes input columns through (e.g. the IVF list_id
    in the residual composition) without a join-back."""
    sub_dim = _check_params(dim, m, k)
    for c in keep_cols:
        if c in (id_col, "codes"):
            raise ValueError(f"keep_cols entry {c!r} clashes with output")
        if c not in corpus.columns:
            raise ValueError(f"keep_cols entry {c!r} not in input")
    if validate:
        _validate_codebooks(codebooks, m, sub_dim, k)
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: _best_cid(_sub(F.col(vec_col), j, sub_dim), j),
    )
    return corpus.join(F.broadcast(_fold_codebooks(codebooks))).select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.when(
            _bad_vec(vec_col, dim), _vec_error("pq_encode", vec_col, dim)
        ).otherwise(codes).alias("codes"),
    )


def pq_decode(
    codes_df: DataFrame,
    codebooks: DataFrame,
    m: int,
    id_col: str = "vec_id",
    validate: bool = True,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *keep_cols, approx array<double>) — reconstruct each
    vector as the concatenation of its m codebook centroids (map-only
    gather; used for reconstruction-error audits). A code with no
    matching centroid in its subspace (codes from a different
    codebook) raises in-plan instead of flattening to a silent NULL
    that downstream averages would skip. ``keep_cols`` passes input
    columns through (e.g. the original vector in opq_train's
    Procrustes step) without a join-back."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    for c in keep_cols:
        if c in (id_col, "approx"):
            raise ValueError(f"keep_cols entry {c!r} clashes with output")
        if c not in codes_df.columns:
            raise ValueError(f"keep_cols entry {c!r} not in input")
    if validate:
        _validate_codebooks(codebooks, m)
    # try_element_at: an unmatched code yields NULL (then the guard
    # below raises with a clear message) instead of ANSI's opaque
    # INVALID_ARRAY_INDEX from element_at on the empty filter result
    approx = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.try_element_at(
                F.filter(
                    F.element_at(F.col("_cb"), j + 1),
                    # try_element_at: a codes array shorter than m
                    # compares NULL (empty filter -> guard's clear
                    # message) instead of ANSI's opaque OOB error
                    lambda c: c["cid"]
                    == F.try_element_at(F.col("codes"), j + 1),
                ),
                F.lit(1),
            )["cvec"],
        )
    )
    from vrl_spark.functions.parse import bind

    def _guard(a: Column) -> Column:
        # flatten returns NULL when any per-subspace lookup missed
        # (NULL/short/foreign codes included) — raise, never emit a
        # silent NULL a downstream average would skip
        return F.when(
            a.isNull(),
            F.raise_error(
                "pq_decode: codes row is NULL, shorter than m, or "
                "has no matching centroid in a subspace (codes from "
                "a different codebook?)"
            ),
        ).otherwise(a)

    return codes_df.join(F.broadcast(_fold_codebooks(codebooks))).select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        bind(approx, _guard).alias("approx"),
    )


def pq_search(
    query: list[float],
    codes_df: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    top_k: int = 10,
    id_col: str = "vec_id",
    validate: bool = True,
) -> DataFrame:
    """ADC top-k: (id, adc) ascending by approximate squared-L2
    distance. One m x k distance table rides as a 1-row broadcast
    map; each stored code folds m lookups — the corpus-side cost is
    O(m) per row regardless of d."""
    sub_dim = _check_params(dim, m, k)
    if len(query) != dim:
        raise ValueError(
            f"query has {len(query)} dims, expected {dim}"
        )
    if validate:
        _validate_codebooks(codebooks, m, sub_dim, k)
    q = F.lit([float(x) for x in query])
    dtab = codebooks.select(
        (F.col("sub_id") * k + F.col("centroid_id")).alias("_key"),
        l2_sq(
            _sub(q, F.col("sub_id"), sub_dim), F.col("centroid_vec")
        ).alias("_dist"),
    ).agg(
        F.map_from_arrays(
            F.collect_list("_key"), F.collect_list("_dist")
        ).alias("_dt")
    )
    # Per-element range check FIRST: the flattened j*k+code map key
    # means an out-of-range code in a NON-final subspace collides
    # with another subspace's legitimate key and would silently score
    # a wrong-subspace distance (only the last subspace's overflow
    # falls off the map). NULL/short/foreign codes all raise here.
    bad_codes = (
        F.col("codes").isNull()
        | (F.size(F.col("codes")) != m)
        | F.exists(
            F.col("codes"),
            lambda c: c.isNull() | (c < 0) | (c >= k),
        )
    )
    # try_element_at: the fold is computed BEFORE the guard below
    # (bind evaluates its subject first), so a short codes row must
    # fold to NULL here rather than die in ANSI's opaque OOB — the
    # bad_codes guard then raises the clear message
    adc = F.round(
        F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0.0),
            lambda acc, j: acc
            + F.element_at(
                F.col("_dt"),
                j * k + F.try_element_at(F.col("codes"), j + 1),
            ),
        ),
        6,
    )
    from vrl_spark.functions.parse import bind

    def _guard(a: Column) -> Column:
        return (
            F.when(
                bad_codes,
                F.raise_error(
                    "pq_search: codes row is NULL, wrong length, or "
                    "references a centroid outside [0, k) (wrong m/k "
                    "or foreign codebook?)"
                ),
            )
            .when(
                # in-range code whose subspace trained fewer than k
                # centroids: the map key is legitimately absent
                a.isNull(),
                F.raise_error(
                    "pq_search: a code has no centroid in its "
                    "subspace's codebook"
                ),
            )
            .otherwise(a)
        )

    scored = codes_df.join(F.broadcast(dtab)).select(
        F.col(id_col), bind(adc, _guard).alias("adc")
    )
    return scored.orderBy(
        F.col("adc").asc(), F.col(id_col).asc()
    ).limit(top_k)


def ivf_pq_search(
    query: list[float],
    codes_df: DataFrame,
    codebooks: DataFrame,
    assignments: DataFrame,
    centroids: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    nprobe: int = 2,
    top_k: int = 10,
    id_col: str = "vec_id",
    validate: bool = True,
) -> DataFrame:
    """IVF + PQ composition (the FAISS IVFPQ shape): probe the
    ``nprobe`` coarse lists nearest the query (by squared L2 against
    the tiny ``centroids`` frame — consistent with ADC's metric),
    restrict the code table to those lists' members via
    ``assignments`` (id, list_id — from similarity.ivf_assign), and
    ADC-score ONLY the candidates.

    Metric note: similarity.ivf_assign buckets by COSINE argmax while
    this probe (and ADC) use squared L2 — the two agree exactly when
    vectors and centroids are unit-normalized (spherical k-means /
    clustering.l2_normalize), which is how the index should be built;
    on unnormalized data a vector can sit in a list the L2 probe
    skips.

    Scale shape: the probed list ids are a <=nprobe-row broadcast;
    with the corpus codes stored bucketed/partitioned by list_id the
    candidate restriction is a partition-pruned scan, so a query
    touches nprobe/n_lists of the codes — and each surviving row
    costs O(m) lookups. With nprobe = n_lists the result is exactly
    pq_search over the full corpus (degeneration test pins this),
    PROVIDED assignments cover every id in codes_df: build both from
    the same snapshot — an id missing from assignments is
    unsearchable at ANY nprobe (the semi-join drops it silently; at
    scale, audit coverage once per index build with an anti-join
    count, not per query).
    """
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    sub_dim = _check_params(dim, m, k)
    if len(query) != dim:
        raise ValueError(f"query has {len(query)} dims, expected {dim}")
    if validate:
        _validate_codebooks(codebooks, m, sub_dim, k)
        _validate_centroids(centroids, dim)
    q = F.lit([float(x) for x in query])
    probed = (
        centroids.select(
            F.col("centroid_id").alias("list_id"),
            F.round(l2_sq(q, F.col("centroid_vec")), 6).alias("_d"),
        )
        .orderBy(F.col("_d").asc_nulls_last(), F.col("list_id").asc())
        .limit(nprobe)
        .select("list_id")
    )
    candidates = codes_df.join(
        assignments.join(F.broadcast(probed), "list_id").select(id_col),
        id_col,
        "left_semi",
    )
    return pq_search(
        query, candidates, codebooks, dim, m=m, k=k, top_k=top_k,
        id_col=id_col, validate=False,
    )


# ---------------------------------------------------------------------
# residual PQ (FAISS IVFPQ's by_residual): quantize vec - centroid
# ---------------------------------------------------------------------

def pq_residuals(
    corpus: DataFrame,
    centroids: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assignments: DataFrame | None = None,
    validate: bool = True,
) -> DataFrame:
    """(id, list_id, residual array<double>) — each vector minus its
    IVF list's coarse centroid, the frame residual-PQ trains and
    encodes over. Residuals of a clustered corpus concentrate in a
    small ball around the origin, so the SAME m/k codebook budget
    spends its resolution on the within-list noise instead of the
    between-list spread — the accuracy trick that makes IVF+PQ the
    FAISS-style composition (quantize ``vec − c_list``, score
    ``||(q − c_list) − decode(codes)||²``, an exact identity for
    ``||q − (c_list + decode)||²``).

    ``assignments`` (id, list_id) reuses a materialized assignment
    snapshot (one corpus equi-join — LEFT, so a corpus id MISSING from
    the snapshot raises in-plan instead of silently vanishing from the
    index: an unindexed vector is unsearchable at any nprobe, the
    failure ivf_pq_search's docstring tells callers to audit for.
    Assignments must be unique per id — a duplicate fans the row out
    into duplicate code rows). By default the assignment is recomputed
    IN-PLAN via similarity.ivf_assign — map-only, zero shuffles, and
    by construction consistent with the centroids frame. The centroid
    gather is a 1-row broadcast map; a NULL/unknown list_id raises
    in-plan (it would otherwise flow NULL residuals into downstream
    guards with a misleading message)."""
    if validate:
        _validate_centroids(centroids, dim)
    if assignments is None:
        from vrl_spark.operators import similarity

        assigned = similarity.ivf_assign(corpus, centroids, id_col, vec_col)
    else:
        assigned = corpus.join(
            assignments.select(id_col, "list_id"), id_col, "left"
        )
    cmap = centroids.agg(
        F.map_from_arrays(
            F.collect_list("centroid_id"),
            F.collect_list("centroid_vec"),
        ).alias("_cmap")
    )
    cvec = F.try_element_at(F.col("_cmap"), F.col("list_id"))
    residual = F.when(
        F.col("list_id").isNull() | cvec.isNull(),
        F.raise_error(
            F.concat(
                F.lit("pq_residuals: list_id "),
                F.coalesce(F.col("list_id").cast("string"), F.lit("NULL")),
                F.lit(" has no centroid (corpus id missing from the "
                      "assignments snapshot, or assignments from a "
                      "different centroid set?)"),
            )
        ),
    ).otherwise(
        F.zip_with(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            cvec,
            lambda a, b: a - b,
        )
    )
    return assigned.join(F.broadcast(cmap)).select(
        F.col(id_col), F.col("list_id"), residual.alias("residual")
    )


def ivfpq_train(
    corpus: DataFrame,
    centroids: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    iterations: int = 8,
    tol: float = 1e-9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assignments: DataFrame | None = None,
    stats: dict | None = None,
    validate: bool = True,
) -> DataFrame:
    """Train the shared residual codebooks (one codebook set for ALL
    lists, classic FAISS IVFPQ): pq_train over the residual frame.
    Same loop discipline and determinism as pq_train."""
    res = pq_residuals(
        corpus, centroids, dim, id_col, vec_col, assignments, validate
    )
    return pq_train(
        res, dim, m=m, k=k, iterations=iterations, tol=tol,
        id_col=id_col, vec_col="residual", stats=stats, validate=validate,
    )


def ivfpq_encode(
    corpus: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assignments: DataFrame | None = None,
    validate: bool = True,
) -> DataFrame:
    """(id, list_id, codes array<int>) — MAP-ONLY like pq_encode (the
    residual subtraction is a broadcast map gather, the argmins fold
    in place; the corpus never shuffles). Store the result
    partitioned/bucketed by list_id so ivfpq_search's probe becomes a
    partition-pruned scan."""
    res = pq_residuals(
        corpus, centroids, dim, id_col, vec_col, assignments, validate
    )
    return pq_encode(
        res, codebooks, dim, m=m, k=k, id_col=id_col,
        vec_col="residual", validate=validate, keep_cols=("list_id",),
    )


def ivfpq_search(
    query: list[float],
    encoded: DataFrame,
    codebooks: DataFrame,
    centroids: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    nprobe: int = 2,
    top_k: int = 10,
    id_col: str = "vec_id",
    validate: bool = True,
) -> DataFrame:
    """Residual-PQ ADC top-k over the ``nprobe`` nearest lists.

    Unlike the non-residual :func:`ivf_pq_search` (kept for the
    plain-PQ degeneration contract), the distance table here is PER
    PROBED LIST: for each list L the query's residual ``q − c_L``
    scores against the shared residual codebooks, so a candidate in
    list L folds lookups from ITS list's table —
    ``||(q − c_L) − decode(codes)||²``, exactly
    ``||q − (c_L + decode)||²``. All nprobe tables ride ONE 1-row
    broadcast map of nprobe*m*k entries keyed
    ``list_id*(m*k) + sub*k + code`` (the centroid validator pins
    non-negative unique list ids, codes are range-checked per element,
    so keys cannot collide); candidates come from a broadcast inner
    join on the encoded frame's own list_id — partition-pruned when
    the codes table is stored by list_id. Corpus-side cost is O(m)
    lookups per candidate row, independent of dim and nprobe.
    """
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    sub_dim = _check_params(dim, m, k)
    if len(query) != dim:
        raise ValueError(f"query has {len(query)} dims, expected {dim}")
    if "list_id" not in encoded.columns:
        raise ValueError(
            "encoded frame has no list_id column — use ivfpq_encode "
            "(ivf_pq_search is the composition for plain pq_encode "
            "codes)"
        )
    if validate:
        _validate_codebooks(codebooks, m, sub_dim, k)
        _validate_centroids(centroids, dim)
    q = F.lit([float(x) for x in query])
    probed = (
        centroids.select(
            F.col("centroid_id").alias("list_id"),
            F.col("centroid_vec").alias("_cvec"),
            F.round(l2_sq(q, F.col("centroid_vec")), 6).alias("_d"),
        )
        .orderBy(F.col("_d").asc_nulls_last(), F.col("list_id").asc())
        .limit(nprobe)
    )
    # one flattened table for all probed lists: nprobe * m * k entries
    qres = F.zip_with(
        q, F.col("_cvec"), lambda a, b: a - b
    )
    dtab = codebooks.crossJoin(F.broadcast(probed)).select(
        (
            F.col("list_id").cast("long") * (m * k)
            + F.col("sub_id") * k
            + F.col("centroid_id")
        ).alias("_key"),
        l2_sq(
            _sub(qres, F.col("sub_id"), sub_dim), F.col("centroid_vec")
        ).alias("_dist"),
    ).agg(
        F.map_from_arrays(
            F.collect_list("_key"), F.collect_list("_dist")
        ).alias("_dt")
    )
    bad_codes = (
        F.col("codes").isNull()
        | (F.size(F.col("codes")) != m)
        | F.exists(
            F.col("codes"),
            lambda c: c.isNull() | (c < 0) | (c >= k),
        )
    )
    adc = F.round(
        F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0.0),
            lambda acc, j: acc
            + F.element_at(
                F.col("_dt"),
                F.col("list_id").cast("long") * (m * k)
                + j * k
                + F.try_element_at(F.col("codes"), j + 1),
            ),
        ),
        6,
    )
    from vrl_spark.functions.parse import bind

    def _guard(a: Column) -> Column:
        return (
            F.when(
                bad_codes,
                F.raise_error(
                    "ivfpq_search: codes row is NULL, wrong length, "
                    "or references a centroid outside [0, k) (wrong "
                    "m/k or foreign codebook?)"
                ),
            )
            .when(
                a.isNull(),
                F.raise_error(
                    "ivfpq_search: a code has no centroid in its "
                    "subspace's codebook"
                ),
            )
            .otherwise(a)
        )

    candidates = encoded.join(
        F.broadcast(probed.select("list_id")), "list_id"
    )
    scored = candidates.join(F.broadcast(dtab)).select(
        F.col(id_col), bind(adc, _guard).alias("adc")
    )
    return scored.orderBy(
        F.col("adc").asc(), F.col(id_col).asc()
    ).limit(top_k)

# ---------------------------------------------------------------------
# OPQ (optimized product quantization): learn an orthogonal rotation
# R so the rotated space's coordinates decorrelate ACROSS subspace
# boundaries before PQ splits them — the non-parametric alternating
# minimization of Ge et al., "Optimized Product Quantization" (CVPR
# 2013), the same procedure FAISS ships as OPQMatrix. Plain PQ's
# error is dominated by variance that straddles subspaces (each
# codebook can only spend its k centroids inside its own slice);
# rotating first routinely halves reconstruction error at the same
# m/k code budget.
# ---------------------------------------------------------------------


def _rotation_matrix(rotation: list[list[float]], dim: int) -> np.ndarray:
    """Driver-side shape + orthogonality check: a non-orthogonal
    matrix silently breaks the ADC identity (distances in the rotated
    space no longer equal distances in the original space), which is
    exactly the class of wrong-but-plausible results the in-plan
    guards elsewhere in this module exist to prevent."""
    r = np.asarray(rotation, dtype=np.float64)
    if r.shape != (dim, dim):
        raise ValueError(
            f"rotation must be {dim}x{dim}, got {r.shape}"
        )
    if not np.isfinite(r).all():
        raise ValueError("rotation holds non-finite values")
    err = float(np.abs(r @ r.T - np.eye(dim)).max())
    if err > 1e-6:
        raise ValueError(
            f"rotation is not orthogonal (max |R R^T - I| = {err:.3e})"
        )
    return r


def rotate_vectors(
    df: DataFrame,
    rotation: list[list[float]],
    dim: int,
    vec_col: str = "embedding",
    out_col: str = "rotated",
    validate: bool = True,
) -> DataFrame:
    """Append ``out_col`` = R @ vec (array<double>) — MAP-ONLY: the
    d x d rotation rides as ONE literal (a single Catalyst node, not
    d^2 of them) and each row folds its d dot products in place; rows
    never shuffle and nothing leaves the JVM. A NULL/short vector
    raises in-plan when ``validate`` (zip_with would otherwise pad
    the matvec with NULLs and emit a silently-NULL rotated vector).

    At 100 TB the d^2-per-row HOF fold is the deliberate trade: it
    stays inside Catalyst with zero Python round-trips; if profiling
    ever shows the matvec dominating a scoring job, the swap-in is an
    Arrow pandas_udf doing one BLAS matmul per batch with identical
    semantics (same float64 left-to-right accumulation order is NOT
    guaranteed there — re-pin determinism tests before swapping)."""
    _rotation_matrix(rotation, dim)
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already in input")
    rot = F.lit([[float(x) for x in row] for row in rotation])
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    matvec = F.transform(
        rot,
        lambda row: F.aggregate(
            F.zip_with(row, vec, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    if validate:
        matvec = F.when(
            _bad_vec(vec_col, dim),
            _vec_error("rotate_vectors", vec_col, dim),
        ).otherwise(matvec)
    return df.withColumn(out_col, matvec)


def opq_train(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    opq_iterations: int = 6,
    pq_iterations: int = 3,
    iterations: int = 8,
    tol: float = 1e-9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats: dict | None = None,
    validate: bool = True,
) -> tuple[list[list[float]], DataFrame]:
    """Learn (rotation, codebooks): ``opq_iterations`` rounds of the
    non-parametric OPQ alternation —

      1. rotate the training vectors by the current R (map-only),
      2. train PQ codebooks in the rotated space (``pq_iterations``
         Lloyd rounds — cheap inner refits; the FINAL codebooks get
         the full ``iterations`` budget),
      3. encode + decode to get each rotated vector's reconstruction,
      4. solve the orthogonal Procrustes problem min_R ||R X - Xhat||
         for the next R: M = sum(xhat x^T) (a d x d cross-covariance),
         SVD M = U S V^T, R = U V^T.

    Scale shape: like FAISS, train on a bounded SAMPLE (say 100k-1M
    vectors) — the guarded (id, vec) projection localCheckpoints once
    and each round's rotated frame localCheckpoints so the d^2 matvec
    is paid once per round, not once per downstream scan. Step 4's
    cross-covariance is a posexplode -> groupBy(pos) -> sum shuffle
    whose map-side combine collapses every task to d^2 partial rows;
    only d^2 floats reach the driver (same discipline as the kmeans
    convergence scalars). The d x d SVD is driver-side numpy.

    ``stats`` (out-param) records per-round rotated-space
    reconstruction error (``err_history``) — the alternation is not
    strictly monotone here because each round's codebooks re-init
    from the smallest-md5 sample (deterministic, stateless rounds)
    rather than warm-starting, but on anisotropic data the error
    drops fast and the planted-data test pins the improvement."""
    if opq_iterations < 0:
        raise ValueError(
            f"opq_iterations must be >= 0, got {opq_iterations}"
        )
    sub_dim = _check_params(dim, m, k)
    del sub_dim
    vec = F.col(vec_col)
    if validate:
        vec = F.when(
            _bad_vec(vec_col, dim), _vec_error("opq_train", vec_col, dim)
        ).otherwise(F.col(vec_col))
    base = corpus.select(
        F.col(id_col),
        F.transform(vec, lambda x: x.cast("double")).alias("_v"),
    ).localCheckpoint()
    if not base.take(1):
        raise ValueError("opq_train: corpus is empty")
    r = np.eye(dim)
    err_history: list[float] = []
    for _ in range(opq_iterations):
        rot = rotate_vectors(
            base, r.tolist(), dim, vec_col="_v", out_col="_rot",
            validate=False,
        ).localCheckpoint()
        cb = pq_train(
            rot, dim, m=m, k=k, iterations=pq_iterations, tol=tol,
            id_col=id_col, vec_col="_rot", validate=False,
        )
        dec = pq_decode(
            pq_encode(
                rot, cb, dim, m=m, k=k, id_col=id_col, vec_col="_rot",
                validate=False, keep_cols=("_v", "_rot"),
            ),
            cb, m, id_col=id_col, validate=False,
            keep_cols=("_v", "_rot"),
        )
        # one pass computes BOTH the round's objective and the d^2
        # cross-covariance cells for the Procrustes solve
        outer = F.posexplode(
            F.flatten(
                F.transform(
                    F.col("approx"),
                    lambda a: F.transform(F.col("_v"), lambda b: a * b),
                )
            )
        )
        cells = (
            dec.select(
                l2_sq(F.col("_rot"), F.col("approx")).alias("_e"),
                outer.alias("_pos", "_x"),
            )
            .groupBy("_pos")
            .agg(F.sum("_x").alias("_s"), F.sum("_e").alias("_esum"))
            .collect()
        )
        # every row repeats its full error under the explode — divide
        # the per-cell error sums back out via the d^2 cell count
        err_history.append(
            round(float(sum(c["_esum"] for c in cells)) / (dim * dim), 6)
        )
        mat = np.zeros(dim * dim)
        for c in cells:
            # round before the SVD: F.sum over doubles combines in
            # partition order, and un-rounded jitter in M would make
            # the learned rotation (hence every downstream argmin)
            # run-dependent — the same 1e-6 discipline as _best_cid
            mat[c["_pos"]] = round(c["_s"], 6)
        u, _, vt = np.linalg.svd(mat.reshape(dim, dim))
        r = u @ vt
    rotation = [[float(x) for x in row] for row in r]
    final_rot = rotate_vectors(
        base, rotation, dim, vec_col="_v", out_col="_rot",
        validate=False,
    )
    cb_stats: dict = {}
    codebooks = pq_train(
        final_rot, dim, m=m, k=k, iterations=iterations, tol=tol,
        id_col=id_col, vec_col="_rot",
        stats=cb_stats if stats is not None else None, validate=False,
    )
    if stats is not None:
        stats.update(err_history=err_history, **cb_stats)
    return rotation, codebooks


def opq_encode(
    corpus: DataFrame,
    rotation: list[list[float]],
    codebooks: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    validate: bool = True,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *keep_cols, codes) — rotate then pq_encode, still
    MAP-ONLY end to end (the rotation is a literal, the folded
    codebooks broadcast; the corpus never shuffles)."""
    rot = rotate_vectors(
        corpus, rotation, dim, vec_col=vec_col, out_col="_rot",
        validate=validate,
    )
    return pq_encode(
        rot, codebooks, dim, m=m, k=k, id_col=id_col, vec_col="_rot",
        validate=validate, keep_cols=keep_cols,
    )


def opq_decode(
    codes_df: DataFrame,
    rotation: list[list[float]],
    codebooks: DataFrame,
    m: int,
    id_col: str = "vec_id",
    validate: bool = True,
) -> DataFrame:
    """(id, approx) — pq_decode back to the ROTATED space, then
    un-rotate with R^T (orthogonal inverse) so reconstruction-error
    audits compare in the original embedding space."""
    dec = pq_decode(codes_df, codebooks, m, id_col=id_col,
                    validate=validate)
    r = _rotation_matrix(rotation, len(rotation))
    unrot = rotate_vectors(
        dec, r.T.tolist(), len(rotation), vec_col="approx",
        out_col="_orig", validate=False,
    )
    return unrot.select(F.col(id_col), F.col("_orig").alias("approx"))


def opq_search(
    query: list[float],
    codes_df: DataFrame,
    rotation: list[list[float]],
    codebooks: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    top_k: int = 10,
    id_col: str = "vec_id",
    validate: bool = True,
) -> DataFrame:
    """ADC top-k against opq_encode codes: the QUERY rotates once on
    the driver (orthogonality makes rotated-space L2 equal
    original-space L2, so ranks are exact w.r.t. the quantized
    corpus) and the scan is plain pq_search — O(m) lookups per row."""
    r = _rotation_matrix(rotation, dim)
    if len(query) != dim:
        raise ValueError(f"query has {len(query)} dims, expected {dim}")
    rq = (r @ np.asarray(query, dtype=np.float64)).tolist()
    return pq_search(
        rq, codes_df, codebooks, dim, m=m, k=k, top_k=top_k,
        id_col=id_col, validate=validate,
    )
