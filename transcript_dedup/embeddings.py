"""Similarity search over embedding columns (array<float>).

Training-data-pipeline operators with no reference analogue (the reference
has no vector data): brute-force cosine top-k as the exactness baseline, a
random-hyperplane LSH-bucketed variant as the scale path (same
candidate-generation-then-verify shape as the text detectors), and
embedding near-duplicate pair detection.

Exact cosine verification stays JVM-side (zip_with/aggregate expressions);
the LSH bucket signatures are one vectorized Arrow kernel (a single matrix
multiply per batch) — planes are generated inside the kernel from the seed,
never shipped as plan literals, and every hash table comes out of the same
single input scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))


def cosine_col(a, b, norm_a, norm_b):
    return _dot(a, b) / (norm_a * norm_b)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors per query (queries is small -> broadcast).

    Output: (qid, neighbor, cosine, rank). Deterministic total order
    (cosine desc, neighbor asc).
    """
    from pyspark.sql import Window

    v = with_norm(vectors, vec_col).select(
        F.col(id_col).alias("neighbor"), F.col(vec_col).alias("_v"), F.col("_norm").alias("_nv")
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("_q"), F.col("_norm").alias("_nq")
    )
    scored = v.join(F.broadcast(q), F.col("neighbor") != F.col("qid")).select(
        "qid",
        "neighbor",
        cosine_col(F.col("_v"), F.col("_q"), F.col("_nv"), F.col("_nq")).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor", F.round("cosine", 6).alias("cosine"), "rank")
    )


def hyperplane_planes(dim: int, n_planes: int, n_tables: int, seed: int = 7) -> np.ndarray:
    """Seeded random hyperplanes: n_tables independent sign-LSH tables of
    n_planes each (cos-similarity LSH, Charikar 2002). Shape
    (n_tables * n_planes, dim); deterministic given (dim, shape, seed), so
    every Arrow worker regenerates identical planes from the config alone —
    nothing is shipped through the plan or the closure."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables * n_planes, dim))


def lsh_bucket_keys(
    df: DataFrame,
    n_planes: int,
    n_tables: int,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, table_id, bucket): sign-pattern bucket per hash table.

    ONE vectorized Arrow kernel computes every table's bucket in a single
    pass (batch matrix multiply against the seeded planes, sign bits packed
    into an int64 per table — the packed bits ARE the bucket key), then one
    posexplode fans out (table_id, bucket) rows. No per-table re-scan of the
    input, no plan literals, no driver-side dimension probe: the kernel
    reads the dimension off its first batch."""
    n_pl, n_tb, sd = int(n_planes), int(n_tables), int(seed)
    if n_pl > 63:
        raise ValueError("n_planes must be <= 63 (sign bits pack into int64)")

    @F.pandas_udf("array<bigint>")
    def bucket_sig(vecs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if mat.size == 0:
            return pd.Series([], dtype=object)
        planes = hyperplane_planes(mat.shape[1], n_pl, n_tb, sd)
        signs = (mat @ planes.T) >= 0  # (batch, n_tables*n_planes)
        bits = signs.reshape(len(mat), n_tb, n_pl).astype(np.int64)
        keys = (bits << np.arange(n_pl, dtype=np.int64)[None, None, :]).sum(axis=2)
        return pd.Series(list(keys))

    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(bucket_sig(F.col(vec_col))).alias("table_id", "bucket"),
    )


def ann_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 6,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = bucket collisions in any table,
    verified with exact cosine. Same generate-then-verify shape as the text
    LSH; at 100 TB the bucket join replaces the O(n*q) cross product."""
    from pyspark.sql import Window

    vk = lsh_bucket_keys(vectors, n_planes, n_tables, seed, id_col, vec_col)
    qk = lsh_bucket_keys(queries, n_planes, n_tables, seed, id_col, vec_col)
    cand = (
        vk.join(qk.withColumnRenamed("id", "qid"), ["table_id", "bucket"])
        .filter(F.col("id") != F.col("qid"))
        .select(F.col("qid"), F.col("id").alias("neighbor"))
        .distinct()
    )
    v = with_norm(vectors, vec_col).select(
        F.col(id_col).alias("neighbor"), F.col(vec_col).alias("_v"), F.col("_norm").alias("_nv")
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("_q"), F.col("_norm").alias("_nq")
    )
    scored = cand.join(v, "neighbor").join(F.broadcast(q), "qid").select(
        "qid",
        "neighbor",
        cosine_col(F.col("_v"), F.col("_q"), F.col("_nv"), F.col("_nq")).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor", F.round("cosine", 6).alias("cosine"), "rank")
    )


#: fixed-point quantum for the k-means update accumulation: per-component
#: contributions are floor(v * 2^20) int64s, so the distributed sum is EXACT
#: integer arithmetic — order-independent across partitionings/AQE — and the
#: resulting centroids are bit-reproducible run-to-run and bit-identical to
#: the pure-numpy mirror (ivf_probe_artifacts_numpy). The 2^-20 quantization
#: of the *mean* is far below any component noise floor; overflow bound:
#: each contribution is at most |v| * 2^20, so int64 (< 2^63-1 ~ 9.22e18)
#: tolerates ~8.8e9 rows/cluster at |v| <= 1e3 and ~8.8e12 at |v| <= 1
#: (unit-scale embeddings). Spark's non-ANSI long sum would overflow
#: SILENTLY past that, so kmeans_centroids checks the bound explicitly
#: (one cheap max/count aggregate) and raises instead of corrupting
#: centroids.
_KMEANS_SCALE = float(1 << 20)


def kmeans_centroids(
    vectors: DataFrame,
    n_clusters: int = 16,
    n_iters: int = 5,
    seed: int = 11,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed Lloyd's k-means for the IVF coarse quantizer.

    Assignment is a vectorized Arrow kernel (batch matrix multiply against
    the broadcast centroids); the update step is one groupBy over
    (cluster, position) partial sums — both scale as single shuffles per
    iteration. DETERMINISTIC end-to-end: initial centroids are seeded RNG
    draws (``np.random.default_rng(seed)``), argmax ties break by index,
    and the update accumulates in exact fixed-point int64 (_KMEANS_SCALE)
    so floating-point partial-sum ORDER — which varies with partitioning —
    cannot perturb the centroids. Two runs of the same input produce
    bit-identical centroids on any cluster layout, which is what lets the
    driver's DuckDB oracle consume exported probe artifacts."""
    dim_row = vectors.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:
        raise ValueError("kmeans_centroids: vectors DataFrame is empty")
    dim = int(dim_row["d"])
    # overflow guard (see _KMEANS_SCALE): Spark's non-ANSI long sum wraps
    # silently, so verify the worst case — every row in one cluster, every
    # component at the corpus max magnitude — stays under 2^62 (2x margin)
    bound = vectors.select(
        F.count("*").alias("n"),
        F.max(
            F.aggregate(
                F.col(vec_col),
                F.lit(0.0),
                lambda a, x: F.greatest(a, F.abs(x.cast("double"))),
            )
        ).alias("vmax"),
    ).first()
    worst = (float(bound["vmax"] or 0.0) * _KMEANS_SCALE + 1.0) * float(bound["n"])
    if worst >= float(1 << 62):
        raise ValueError(
            f"kmeans_centroids: fixed-point sum could overflow int64 "
            f"(rows={bound['n']}, max|v|={bound['vmax']:.3g}, scale=2^20); "
            f"rescale the vectors or reduce _KMEANS_SCALE"
        )
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_clusters, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    for _ in range(n_iters):
        assigned = with_assignment(vectors, cents, vec_col)
        # update: per-cluster mean via explode -> (cluster, pos) partial sums
        # in exact int64 fixed point (see _KMEANS_SCALE)
        sums = (
            assigned.select("_cluster", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("_cluster", "pos")
            .agg(
                F.sum(
                    F.floor(F.col("v").cast("double") * F.lit(_KMEANS_SCALE)).cast(
                        "long"
                    )
                ).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new = cents.copy()
        acc = np.zeros((n_clusters, dim), dtype=np.int64)
        cnt = np.zeros(n_clusters)
        for r in sums:
            acc[r["_cluster"], r["pos"]] = r["s"]
            cnt[r["_cluster"]] = r["n"]
        for c in range(n_clusters):
            if cnt[c] > 0:
                new[c] = acc[c].astype(np.float64) / (_KMEANS_SCALE * cnt[c])
        cents = new
    return cents


def with_assignment(
    vectors: DataFrame, cents: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """+ _cluster column: argmax cosine against the (closure-broadcast)
    centroid matrix, one Arrow kernel pass."""
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    @F.pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if mat.size == 0:
            return pd.Series([], dtype="int32")
        norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = _centroid_sims(mat / norms, cn)
        return pd.Series(np.argmax(sims, axis=1).astype("int32"))

    return vectors.withColumn("_cluster", assign(F.col(vec_col)))


def _centroid_sims(unit_rows: np.ndarray, cn: np.ndarray) -> np.ndarray:
    """Row-vs-centroid cosine matrix as one matrix-VECTOR product per
    centroid (dgemv), not a single dgemm: a row's dot-product reduction
    order then depends only on the vector dimension, never on how many rows
    share the batch — so Arrow batch boundaries (and any future batch-size
    change) cannot perturb the result in the last ulp. This is what makes
    the Spark kernels bit-identical to the full-matrix numpy mirror."""
    return np.stack([unit_rows @ cn[c] for c in range(cn.shape[0])], axis=1)


def ivf_probe_artifacts_numpy(
    mat: np.ndarray,
    qmat: np.ndarray,
    n_clusters: int = 16,
    n_probe: int = 4,
    n_iters: int = 5,
    seed: int = 11,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pure-numpy mirror of the kmeans_centroids -> with_assignment ->
    probe_clusters chain: (per-vector cluster assignments int32, per-query
    (nq, n_probe) probe lists int32, final centroids float64).

    Bit-identical to the Spark path by construction: the distributed update
    step accumulates floor(v * _KMEANS_SCALE) in exact int64 arithmetic
    (order-independent, so partitioning cannot perturb it), and every float
    step here is the same numpy expression the Arrow kernels execute on the
    same float64 inputs. Pinned by
    tests/test_embeddings.py::test_ivf_numpy_mirror_matches_spark; consumed
    by the driver's partial-probe DuckDB oracle export."""
    mat = np.asarray(mat, dtype=np.float64)
    qmat = np.asarray(qmat, dtype=np.float64)
    # same int64 overflow guard as kmeans_centroids — the mirror must fail
    # loudly on exactly the inputs the Spark path refuses
    worst = (float(np.abs(mat).max(initial=0.0)) * _KMEANS_SCALE + 1.0) * mat.shape[0]
    if worst >= float(1 << 62):
        raise ValueError(
            "ivf_probe_artifacts_numpy: fixed-point sum could overflow int64; "
            "rescale the vectors or reduce _KMEANS_SCALE"
        )
    dim = mat.shape[1]
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_clusters, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    unit = mat / norms
    q_int = np.floor(mat * _KMEANS_SCALE).astype(np.int64)
    for _ in range(n_iters):
        cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(_centroid_sims(unit, cn), axis=1)
        new = cents.copy()
        for c in range(n_clusters):
            m = assign == c
            n = int(m.sum())
            if n > 0:
                new[c] = q_int[m].sum(axis=0).astype(np.float64) / (
                    _KMEANS_SCALE * n
                )
        cents = new

    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    assignments = np.argmax(_centroid_sims(unit, cn), axis=1).astype("int32")
    qnorms = np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    probes = np.argsort(-_centroid_sims(qmat / qnorms, cn), axis=1)[
        :, :n_probe
    ].astype("int32")
    return assignments, probes, cents


def ann_ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 11,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: a k-means coarse quantizer partitions the
    vectors into inverted lists; each query probes its n_probe nearest
    centroids' lists and verifies with exact cosine. The scale shape is a
    key-equality join on cluster id — candidates per query ~ n_probe/k of
    the corpus instead of all of it."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    if vectors.isEmpty():
        return vectors.sparkSession.createDataFrame(
            [], "qid string, neighbor string, cosine double, rank int"
        )
    # the quantizer makes n_iters passes over the vectors — cache them for
    # its duration only (the final probe join scans them exactly once)
    we_cached = vectors.storageLevel == StorageLevel.NONE
    if we_cached:
        vectors = vectors.persist()
    cents = kmeans_centroids(
        vectors, n_clusters, n_iters=n_iters, seed=seed, vec_col=vec_col
    )
    if we_cached:
        vectors.unpersist()
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    v = with_assignment(vectors, cents, vec_col).select(
        F.col(id_col).alias("neighbor"), F.col(vec_col).alias("_v"), "_cluster"
    )

    np_probe = int(n_probe)

    @F.pandas_udf("array<int>")
    def probe_clusters(vs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(x, dtype=np.float64) for x in vs])
        if mat.size == 0:
            return pd.Series([], dtype=object)
        norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = _centroid_sims(mat / norms, cn)
        top = np.argsort(-sims, axis=1)[:, :np_probe].astype("int32")
        return pd.Series(list(top))

    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("_q"),
        F.explode(probe_clusters(F.col(vec_col))).alias("_cluster"),
    )
    scored = (
        v.join(F.broadcast(q), "_cluster")
        .filter(F.col("neighbor") != F.col("qid"))
        .select(
            "qid",
            "neighbor",
            (
                _dot(F.col("_v"), F.col("_q"))
                / (
                    F.sqrt(_dot(F.col("_v"), F.col("_v")))
                    * F.sqrt(_dot(F.col("_q"), F.col("_q")))
                )
            ).alias("cosine"),
        )
        .dropDuplicates(["qid", "neighbor"])
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor", F.round("cosine", 6).alias("cosine"), "rank")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 14,
    n_tables: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= threshold) via
    bucket-join candidates + exact verify. Output (id_a, id_b, cosine).
    The threshold is applied to the UNROUNDED cosine (the rounding is for
    display/hash stability only)."""
    keys = lsh_bucket_keys(vectors, n_planes, n_tables, seed, id_col, vec_col)
    cand = (
        keys.alias("a")
        .join(keys.alias("b"), ["table_id", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    v = with_norm(vectors, vec_col)
    va = v.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), F.col("_norm").alias("_na"))
    vb = v.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), F.col("_norm").alias("_nb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            cosine_col(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
