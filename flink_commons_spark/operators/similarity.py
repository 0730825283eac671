"""Similarity search over embedding columns (``array<float>``).

Two tiers, mirroring how ANN is deployed on real clusters:

- :func:`cosine_topk` — exact brute force. The query side is
  ``broadcast()`` (it is small by construction: "find neighbors for
  these probes"), so the corpus is scanned once with **zero shuffle of
  the corpus**; per-query top-k is a window over (query, corpus-match)
  rows. Linear in corpus size → fine at 100 TB when the probe set is
  bounded.
- :func:`lsh_ann_topk` — random-hyperplane LSH. Corpus and probes are
  bucketed by sign-pattern; only same-bucket pairs are scored. The
  hyperplanes are deterministic (md5-derived), so results are
  reproducible and oracle-checkable. Sub-linear candidate sets at the
  cost of recall — the scale path when the probe set is itself huge.

Dot products / norms use ``zip_with`` + ``aggregate`` higher-order
functions — JVM-evaluated, no Python in the row path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


_COSINE_BATCH = None


def cosine_batch(a: Column, b: Column) -> Column:
    """Arrow-vectorized cosine similarity over two array columns.

    The hot path of every similarity operator: numpy einsum over the
    whole Arrow batch (~10-100× the throughput of interpreted
    higher-order-function evaluation, the alternative JVM-side encoding
    for array math that whole-stage codegen cannot compile). Lazily
    registered — ``pandas_udf`` needs an active SparkSession.
    """
    global _COSINE_BATCH
    if _COSINE_BATCH is None:

        @pandas_udf("double")
        def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
            A = np.stack(a.to_numpy()).astype(np.float64)
            B = np.stack(b.to_numpy()).astype(np.float64)
            dots = np.einsum("ij,ij->i", A, B)
            na = np.sqrt(np.einsum("ij,ij->i", A, A))
            nb = np.sqrt(np.einsum("ij,ij->i", B, B))
            return pd.Series(dots / (na * nb))

        _COSINE_BATCH = _cos
    return _COSINE_BATCH(a, b)


def plane_matrix(num_planes: int, dims: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes, identical values to
    :func:`_plane_component` (md5-derived — reproducible in any engine)."""
    return [
        [
            (int(hashlib.md5(f"plane{p}_dim{d}".encode()).hexdigest()[:14], 16) % 1000000)
            / 1000000.0
            - 0.5
            for d in range(dims)
        ]
        for p in range(num_planes)
    ]


def lsh_bucket_udf(num_planes: int, dims: int):
    """Vectorized sign-pattern bucketing: bit p = (v · plane_p) >= 0."""
    planes = np.array(plane_matrix(num_planes, dims))
    weights = np.array([2 ** p for p in range(num_planes)], dtype=np.int64)

    @pandas_udf("bigint")
    def _bucket(v: pd.Series) -> pd.Series:
        V = np.stack(v.to_numpy()).astype(np.float64)
        proj = V @ planes.T  # (n, planes)
        return pd.Series(((proj >= 0) @ weights).astype(np.int64))

    return _bucket


def lsh_multibucket_udf(num_tables: int, planes_per_table: int, dims: int):
    """One bucket id per hash table (OR-amplification): table *t* uses
    the global planes ``[t·p, (t+1)·p)`` from the same deterministic
    md5 family, so every table's bucket is reproducible in SQL."""
    total = num_tables * planes_per_table
    planes = np.array(plane_matrix(total, dims))          # (total, dims)
    weights = np.array([2 ** p for p in range(planes_per_table)], dtype=np.int64)

    @pandas_udf("array<bigint>")
    def _buckets(v: pd.Series) -> pd.Series:
        V = np.stack(v.to_numpy()).astype(np.float64)
        proj = V @ planes.T                                # (n, total)
        bits = proj >= 0
        out = []
        for row in bits:
            out.append(
                [int(row[t * planes_per_table : (t + 1) * planes_per_table] @ weights)
                 for t in range(num_tables)]
            )
        return pd.Series(out)

    return _buckets


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Returns (query_id, neighbor_id, sim, rank). Ties break on neighbor
    id for full determinism. Self-matches are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_batch(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# ----------------------------------------------------------------- LSH

def _plane_component(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane coefficient in [-0.5, 0.5):
    md5-derived, identical in any engine with md5 + hex→int."""
    h = F.conv(F.substring(F.md5(F.lit(f"plane{plane}_dim{dim}")), 1, 14), 16, 10).cast("bigint")
    return ((h % 1000000) / F.lit(1000000.0)) - 0.5


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    num_planes: int = 4,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: score only pairs sharing an LSH bucket in at
    least one of ``num_tables`` hash tables.

    Per table the bucket join shuffles both sides on the signature
    (2^num_planes buckets); per-bucket work is |q_bucket|·|c_bucket|.
    Recall knobs: fewer planes → bigger buckets (AND-relaxation),
    more tables → more chances to collide (OR-amplification); cost is
    proportional to tables · bucket size. Candidate pairs found by
    multiple tables are deduplicated before scoring, so each pair's
    cosine is computed once.
    """
    buckets = lsh_multibucket_udf(num_tables, num_planes, dims)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.posexplode(buckets(F.col(vec_col))).alias("table", "bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.posexplode(buckets(F.col(vec_col))).alias("table", "bucket"),
    )
    pairs = (
        c.join(q, ["table", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_batch(F.col("qv"), F.col("cv")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_assign_udf(centroids: list[list[float]]):
    """Vectorized coarse-quantizer assignment: nearest centroid by
    cosine (rounded to 6 decimals, ties → lowest centroid id — a total
    order every engine can reproduce)."""
    C = np.array(centroids, dtype=np.float64)            # (nlist, dim)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    @pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        V = np.stack(v.to_numpy()).astype(np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims = np.round(Vn @ Cn.T, 6)                    # (n, nlist)
        # argmax with lowest-id tie-break: scan ids ascending, keep strict >
        best = np.zeros(len(V), dtype=np.int32)
        best_sim = sims[:, 0].copy()
        for cid in range(1, sims.shape[1]):
            better = sims[:, cid] > best_sim
            best[better] = cid
            best_sim[better] = sims[better, cid]
        return pd.Series(best)

    return _assign


def ivf_probe_udf(centroids: list[list[float]], nprobe: int):
    """Top-``nprobe`` centroid ids per query vector (same total order)."""
    C = np.array(centroids, dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    @pandas_udf("array<int>")
    def _probe(v: pd.Series) -> pd.Series:
        V = np.stack(v.to_numpy()).astype(np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims = np.round(Vn @ Cn.T, 6)
        ids = np.arange(sims.shape[1])
        out = []
        for row in sims:
            order = np.lexsort((ids, -row))              # sim desc, id asc
            out.append([int(x) for x in order[:nprobe]])
        return pd.Series(out)

    return _probe


def train_ivf_centroids(
    corpus: DataFrame,
    nlist: int = 8,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Refine seeded centroids with spherical k-means Lloyd iterations.

    Seeds are the ``nlist`` lowest-id vectors (deterministic); each
    iteration assigns every corpus vector to its nearest centroid by
    cosine (distributed, vectorized) and recomputes centroids as the
    per-cell mean (one small groupBy aggregate over per-dimension sums —
    the only driver-side data is nlist × dims floats). Empty cells keep
    their previous centroid.

    The mean is decimal-fixed (elements summed as ``decimal(18,6)``,
    mean rounded to 6 in-engine) so trained centroids are
    order-independent and bit-identical across engines — the same
    portability stance as :func:`train_pq_codebooks`, which makes the
    trainer replicable in the ``ivf_trained_recall`` SQL oracle.
    """
    centroids = [
        [float(x) for x in r[1]]
        for r in corpus.orderBy(id_col).limit(nlist).select(id_col, vec_col).collect()
    ]
    for _ in range(iterations):
        assign = ivf_assign_udf(centroids)
        assigned = corpus.select(
            assign(F.col(vec_col)).alias("cell"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        )
        dims = len(centroids[0])
        means = assigned.groupBy("cell").agg(
            *[
                F.round(
                    F.sum(
                        F.element_at("v", d + 1).cast("decimal(18,6)")
                    ).cast("double")
                    / F.count("*"),
                    6,
                ).alias(f"c{d}")
                for d in range(dims)
            ],
        )
        new = list(centroids)
        for row in means.collect():
            new[row["cell"]] = [float(row[f"c{d}"]) for d in range(dims)]
        centroids = new
    return centroids


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroid_source: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into ``nlist`` cells,
    scan only each query's ``nprobe`` nearest cells.

    The coarse centroids here are ``nlist`` deterministic seed vectors
    (the lowest-id rows of ``centroid_source``) — the quantizer
    structure of FAISS-IVF without the k-means refinement, keeping the
    operator reproducible and oracle-checkable. Swapping in trained
    centroids is a drop-in (same assignment/probe/scan pipeline).

    Scale: assignment is a narrow vectorized map; the cell join
    shuffles on the cell id; per-query work is |probed cells| instead
    of the whole corpus.

    ``centroid_source`` may be a DataFrame (its ``nlist`` lowest-id
    vectors become the seeds) or a precomputed centroid list — e.g.
    from :func:`train_ivf_centroids`.
    """
    if isinstance(centroid_source, list):
        centroids = centroid_source
    else:
        centroids = [
            [float(x) for x in r[1]]
            for r in centroid_source.orderBy(id_col).limit(nlist)
            .select(id_col, vec_col).collect()
        ]
    assign = ivf_assign_udf(centroids)
    probe = ivf_probe_udf(centroids, nprobe)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        assign(F.col(vec_col)).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(probe(F.col(vec_col))).alias("cell"),
    )
    scored = (
        c.join(q, "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_batch(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 1,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via (multi-table) LSH.

    (a, b, sim) with a < b and sim ≥ threshold; a pair is scored when it
    shares a bucket in any of ``num_tables`` hash tables (deduplicated
    first, so each pair's cosine is computed once). Candidate volume
    stays near-linear; ``num_tables`` buys recall, ``num_planes`` buys
    precision.
    """
    buckets = lsh_multibucket_udf(num_tables, num_planes, dims)
    sigd = df.select(
        F.col(id_col),
        F.col(vec_col).alias("v"),
        F.posexplode(buckets(F.col(vec_col))).alias("table", "bucket"),
    )
    left = sigd.select(F.col(id_col).alias("a"), F.col("v").alias("va"), "table", "bucket")
    right = sigd.select(F.col(id_col).alias("b"), F.col("v").alias("vb"), "table", "bucket")
    pairs = (
        left.join(right, ["table", "bucket"])
        .where(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    return (
        pairs.select("a", "b", F.round(cosine_batch(F.col("va"), F.col("vb")), 6).alias("sim"))
        .where(F.col("sim") >= threshold)
        .select("a", "b", "sim")
    )


def assign_cells(
    corpus: DataFrame,
    centroid_source,
    nlist: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, v, cell)`` coarse-quantizer assignment (cosine argmax,
    the :func:`ivf_assign_udf` total order). Callers that fan the
    result into several consumers (pair legs + per-cell counts, as
    ``catalog.dedup_semantic`` does) should ``persist`` it so the
    Python assignment stage runs ONCE per corpus pass."""
    if isinstance(centroid_source, list):
        centroids = centroid_source
    else:
        centroids = [
            [float(x) for x in r[1]]
            for r in centroid_source.orderBy(id_col).limit(nlist)
            .select(id_col, vec_col).collect()
        ]
    assign = ivf_assign_udf(centroids)
    return corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("v"),
        assign(F.col(vec_col)).alias("cell"),
    )


def semantic_dedup_pairs(
    cells: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: cluster the
    embedding space with a coarse quantizer, then compare ONLY within
    a cluster (Abbas et al. 2023, "SemDeDup" — public paper; the
    within-cluster restriction is what makes semantic dedup tractable
    at corpus scale).

    ``cells`` is the :func:`assign_cells` output ``(id, v, cell)`` —
    persist it when you also aggregate per-cell stats from it, so the
    Python assignment stage runs once. Returns ``(cell, a, b, sim)``
    with ``a < b`` and rounded cosine ``sim ≥ threshold``. The
    self-join shuffles on the cell id, so the quadratic term is bounded
    per cell, not per corpus: with ``nlist ≈ √N`` cells the expected
    pair work is O(N^1.5) instead of O(N²), and each cell's pair block
    fits one task. Centroid seeding matches :func:`ivf_topk` (lowest-id
    rows, or a trained list from :func:`train_ivf_centroids`) —
    deterministic and oracle-checkable.
    """
    left = cells.select("cell", F.col(id_col).alias("a"), F.col("v").alias("va"))
    right = cells.select("cell", F.col(id_col).alias("b"), F.col("v").alias("vb"))
    return (
        left.join(right, "cell")
        .where(F.col("a") < F.col("b"))
        .select(
            F.col("cell").cast("bigint").alias("cell"),
            "a",
            "b",
            F.round(cosine_batch(F.col("va"), F.col("vb")), 6).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


# --------------------------------------------------------- quantization

def with_quantized(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 scalar quantization + reconstruction error — the
    standard 4x storage cut for embedding stores at corpus scale.

    Adds ``q`` (array<int>, each element ``floor(x*127/max|x| + 0.5)``
    clamped to [-127, 127] — add-half-then-floor instead of round():
    both engines floor identically on identical doubles, so values are
    bit-stable and SQL-oracle-checkable) and ``qerr`` (mean absolute
    reconstruction error, the metric a pipeline monitors when swapping
    float32 storage for int8). Zero vectors quantize to zeros.

    Scale/maxabs are materialized as REAL COLUMNS before any lambda
    references them — expressions inlined into higher-order-function
    lambdas are re-evaluated per array element (no CSE). Narrow map,
    no Python, no shuffle.
    """
    d = df.withColumn("__v", F.transform(F.col(vec_col), lambda x: x.cast("double")))
    d = d.withColumn(
        "__maxabs", F.array_max(F.transform(F.col("__v"), lambda x: F.abs(x)))
    )
    d = d.withColumn(
        "__scale",
        F.when(F.col("__maxabs") > 0, 127.0 / F.col("__maxabs")).otherwise(F.lit(0.0)),
    ).withColumn(
        "__inv",
        F.when(F.col("__maxabs") > 0, F.col("__maxabs") / 127.0).otherwise(F.lit(0.0)),
    )
    d = d.withColumn(
        "q",
        F.transform(
            F.col("__v"),
            lambda x: F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.floor(x * F.col("__scale") + 0.5).cast("int")),
            ),
        ),
    )
    diffs = F.zip_with(
        F.col("__v"), F.col("q"), lambda x, q: F.abs(x - q * F.col("__inv"))
    )
    d = d.withColumn(
        "qerr",
        F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x) / F.size(F.col("__v")),
    )
    return d.drop("__v", "__maxabs", "__scale", "__inv")


# ------------------------------------------------- product quantization

def group_dims_by_correlation(
    corpus: DataFrame,
    m: int = 8,
    dims: int = 64,
    vec_col: str = "embedding",
) -> list[int]:
    """OPQ restricted to dimension PERMUTATIONS: learn the orthogonal
    pre-transform of Optimized Product Quantization (Ge et al., CVPR
    2013 — "Optimized Product Quantization for Approximate Nearest
    Neighbor Search") in its cheapest family member, a permutation
    that groups CORRELATED dimensions into the same PQ subspace.
    Correlated dims split across subspaces is exactly what breaks
    plain PQ's independence assumption; on an already-isotropic corpus
    no rotation can help (measured: PCA-rotation recall 0.28 vs raw
    0.32 on the synthetic corpus — documented in PERFORMANCE.md), so
    the honest win is recovering structure that is MISALIGNED with the
    subspace boundaries, which this does.

    One distributed pass computes the Gram matrix and dimension sums
    (per-partition partial outer products over Arrow batches; the
    driver only ever holds #partitions × (dims² + dims) doubles — the
    d×d matrix OPQ's rotation estimation needs anyway). Grouping is a
    deterministic greedy: anchor = lowest unassigned dim, take the
    ``dims/m - 1`` unassigned dims with highest |corr| to it (ties to
    the lower index). The result is CANONICAL — blocks sorted by their
    minimum dim, ascending inside — so the same grouping yields the
    same permutation on every engine, and the float noise in the
    correlation estimate only matters near exact ties (the intended
    corpora separate within-group ≈0.8 from cross-group ≈0.05).

    Returns the permutation as 0-based source indices: output dim
    ``i`` of :func:`permute_dims` reads input dim ``perm[i]``.
    """
    import numpy as np
    import pandas as pd

    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    d = dims

    def part(it):
        G = np.zeros((d, d))
        s = np.zeros(d)
        cnt = 0
        for pdf in it:
            if not len(pdf):
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            G += X.T @ X
            s += X.sum(axis=0)
            cnt += len(X)
        if cnt:
            yield pd.DataFrame(
                {"g": [G.ravel().tolist()], "s": [s.tolist()], "n": [cnt]}
            )

    rows = corpus.select(vec_col).mapInPandas(
        part, schema="g array<double>, s array<double>, n bigint"
    ).collect()
    if not rows:
        raise ValueError("empty corpus")
    G = sum(np.asarray(r["g"]).reshape(d, d) for r in rows)
    s = sum(np.asarray(r["s"]) for r in rows)
    n = sum(r["n"] for r in rows)
    C = G / n - np.outer(s / n, s / n)
    std = np.sqrt(np.clip(np.diag(C), 1e-18, None))
    A = np.abs(C / np.outer(std, std))
    d_sub = d // m
    unassigned = set(range(d))
    blocks = []
    while unassigned:
        anchor = min(unassigned)
        unassigned.discard(anchor)
        mates = sorted(unassigned, key=lambda t: (-A[anchor, t], t))[: d_sub - 1]
        for t in mates:
            unassigned.discard(t)
        blocks.append(sorted([anchor] + mates))
    blocks.sort(key=lambda b: b[0])
    return [t for b in blocks for t in b]


def permute_dims(
    df: DataFrame, perm: "list[int]", vec_col: str = "embedding"
) -> DataFrame:
    """Apply a dimension permutation (the OPQ pre-transform of
    :func:`group_dims_by_correlation`, or any fixed scatter): output
    dim ``i`` reads input dim ``perm[i]`` (0-based). Pure codegen'd
    array construction — no UDF, no shuffle, and the same expression
    is a ``list_transform`` one-liner in any SQL engine. Orthogonal,
    so L2 distances (and therefore exact top-k truth) are invariant."""
    return df.withColumn(
        vec_col,
        F.array(
            *[F.element_at(F.col(vec_col), int(p) + 1) for p in perm]
        ),
    )


def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: ``codebooks[j][c]`` is subvector
    ``j`` of the ``c``-th lowest-id corpus vector — the quantizer
    structure of product quantization (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search") with seed codewords
    instead of per-subspace k-means, keeping the operator reproducible
    and SQL-oracle-checkable (the same seeding stance as
    :func:`ivf_topk`; refined codebooks drop in unchanged).

    Driver state is m x ksub x (dims/m) floats = dims x ksub — tiny.
    """
    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    rows = corpus.orderBy(id_col).limit(ksub).select(vec_col).collect()
    return seed_codebooks_from_vectors(
        [r[0] for r in rows], m=m, ksub=ksub, dims=dims
    )


def seed_codebooks_from_vectors(
    vectors: "list[list[float]]", m: int = 8, ksub: int = 16, dims: int = 64
) -> list[list[list[float]]]:
    """Driver-side seed slicer behind :func:`pq_codebooks`: codebooks
    from ALREADY-COLLECTED seed vectors. Callers that can derive one
    corpus's seeds from another's (e.g. an OPQ-permuted twin of the
    same corpus — identical rows, permuted elements) use this to avoid
    a second seed-collect job."""
    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    if len(vectors) < ksub:
        raise ValueError(f"corpus has fewer than ksub={ksub} vectors")
    d_sub = dims // m
    return [
        [
            [float(x) for x in v[j * d_sub:(j + 1) * d_sub]]
            for v in vectors[:ksub]
        ]
        for j in range(m)
    ]


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    dims: int = 64,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Per-subspace k-means (Lloyd) refinement of the seeded PQ
    codebooks — the trained quantizer of Jégou et al. 2011 §II-A
    (each subspace clustered independently with k-means), mirroring
    :func:`train_ivf_centroids` for the coarse quantizer.

    Per iteration: one distributed assignment pass (reuses
    :func:`with_pq_codes` — round-6 squared-L2, first-min tie-break)
    and ONE ``(subspace, code)``-keyed aggregate computing the
    per-cell per-dimension mean; the driver only ever holds the
    m × ksub aggregate rows (128 at the default shape). Empty cells
    keep their previous codeword.

    Determinism/portability: elements are summed as ``decimal(18,6)``
    (order-independent, exact) and the mean is rounded to 6 inside the
    engine — so the trained codewords are bit-identical across engines
    and partitionings, and the whole trainer is replicable in ANSI SQL
    (see the ``pq_trained_recall`` oracle).
    """
    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    d_sub = dims // m
    cbs = pq_codebooks(
        corpus, m=m, ksub=ksub, dims=dims, id_col=id_col, vec_col=vec_col
    )
    for _ in range(iterations):
        coded = with_pq_codes(corpus, cbs, vec_col)
        jc = coded.select(
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
            F.posexplode("pq_codes").alias("j", "code"),
        )
        means = jc.groupBy("j", "code").agg(
            *[
                F.round(
                    F.sum(
                        F.get(F.col("__v"), F.col("j") * d_sub + i).cast(
                            "decimal(18,6)"
                        )
                    ).cast("double")
                    / F.count("*"),
                    6,
                ).alias(f"c{i}")
                for i in range(d_sub)
            ],
        )
        new = [[list(cw) for cw in cb] for cb in cbs]
        for row in means.collect():
            new[row["j"]][row["code"]] = [
                float(row[f"c{i}"]) for i in range(d_sub)
            ]
        cbs = new
    return cbs


def train_pq_codebooks_joint(
    corpora: "dict[str, tuple[DataFrame, list[list[list[float]]]]]",
    m: int = 8,
    ksub: int = 16,
    dims: int = 64,
    iterations: int = 1,
    vec_col: str = "embedding",
) -> "dict[str, list[list[list[float]]]]":
    """Refine PQ codebooks for SEVERAL corpora in ONE distributed
    aggregate per iteration — bit-identical per corpus to
    :func:`train_pq_codebooks` (the per-cell mean groups on an extra
    corpus tag, so corpora never mix; the decimal(18,6) sums keep each
    cell order-independent), but the Lloyd step is a single union job
    instead of one assignment + one aggregate job per corpus. At
    cluster scale that halves scheduler round-trips for the common
    A/B-training shape (e.g. raw vs OPQ-permuted corpus); the driver
    holds len(corpora) × m × ksub aggregate rows.

    ``corpora`` maps a tag to ``(corpus, seed_codebooks)`` — seeds
    from :func:`pq_codebooks` or :func:`seed_codebooks_from_vectors`.
    """
    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    d_sub = dims // m
    cbs = {tag: cb for tag, (_, cb) in corpora.items()}
    for _ in range(iterations):
        tagged = None
        for tag, (df, _) in corpora.items():
            coded = with_pq_codes(df, cbs[tag], vec_col).select(
                F.lit(tag).alias("__corpus"),
                F.transform(
                    F.col(vec_col), lambda x: x.cast("double")
                ).alias("__v"),
                F.posexplode("pq_codes").alias("j", "code"),
            )
            tagged = coded if tagged is None else tagged.unionByName(coded)
        means = tagged.groupBy("__corpus", "j", "code").agg(
            *[
                F.round(
                    F.sum(
                        F.get(F.col("__v"), F.col("j") * d_sub + i).cast(
                            "decimal(18,6)"
                        )
                    ).cast("double")
                    / F.count("*"),
                    6,
                ).alias(f"c{i}")
                for i in range(d_sub)
            ],
        )
        new = {
            tag: [[list(cw) for cw in cb] for cb in cbs[tag]] for tag in cbs
        }
        for row in means.collect():
            new[row["__corpus"]][row["j"]][row["code"]] = [
                float(row[f"c{i}"]) for i in range(d_sub)
            ]
        cbs = new
    return cbs


def train_pq_codebook_views(
    corpus: DataFrame,
    views: "dict[str, tuple[list[int] | None, list[list[list[float]]]]]",
    m: int = 8,
    ksub: int = 16,
    dims: int = 64,
    iterations: int = 1,
    vec_col: str = "embedding",
) -> "dict[str, list[list[list[float]]]]":
    """Refine PQ codebooks for several PERMUTED VIEWS of ONE corpus in
    a single Arrow pass per Lloyd iteration — bit-identical per view
    to :func:`train_pq_codebooks_joint` over
    ``{tag: (permute_dims(corpus, perm), seeds)}`` (same round-6
    argmin assignment left-to-right, same decimal(18,6)
    order-independent cell sums), but the corpus is scanned and
    Arrow-transferred ONCE: the generator permutes each batch in
    numpy per view and emits only the (tag, j, code, d_sub-slice)
    rows the mean aggregate needs — an 8-double payload instead of
    the joint trainer's full-vector duplication. For the common
    raw-vs-OPQ A/B training shape this halves the Lloyd step's scan
    and UDF cost on top of the joint trainer's halved scheduling.

    ``views`` maps a tag to ``(perm, seed_codebooks)`` where ``perm``
    is a 0-based source-index permutation (``None`` = identity) —
    view rows are ``vec[perm]`` exactly like :func:`permute_dims`.
    """
    import numpy as np
    import pandas as pd

    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    d_sub = dims // m
    tags = sorted(views)
    perms = {
        tag: (list(map(int, p)) if p is not None else None)
        for tag, (p, _) in views.items()
    }
    cbs = {tag: cb for tag, (_, cb) in views.items()}
    for _ in range(iterations):
        cb_lists = {
            tag: [[[float(v) for v in cw] for cw in cb] for cb in cbs[tag]]
            for tag in tags
        }

        def gen(it, tags=tuple(tags), perms=dict(perms), cbl=cb_lists):
            for pdf in it:
                if not len(pdf):
                    continue
                X = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                n = len(X)
                out = {"__corpus": [], "j": [], "code": [], "__sub": []}
                for tag in tags:
                    p = perms[tag]
                    Xi = X[:, p] if p is not None else X
                    for j in range(m):
                        CB = np.asarray(cbl[tag][j], dtype=np.float64)
                        sub = Xi[:, j * d_sub:(j + 1) * d_sub]
                        D = np.zeros((n, CB.shape[0]), dtype=np.float64)
                        for i in range(d_sub):  # the SQL fold order
                            diff = sub[:, i][:, None] - CB[:, i][None, :]
                            D += diff * diff
                        D = np.round(D, 6)
                        codes = np.argmin(D, axis=1)  # first min wins
                        out["__corpus"].extend([tag] * n)
                        out["j"].extend([j] * n)
                        out["code"].extend(codes.tolist())
                        out["__sub"].extend(list(sub))
                yield pd.DataFrame(out)

        assigned = corpus.select(vec_col).mapInPandas(
            gen,
            schema="__corpus string, j int, code int, __sub array<double>",
        )
        means = assigned.groupBy("__corpus", "j", "code").agg(
            *[
                F.round(
                    F.sum(
                        F.get(F.col("__sub"), i).cast("decimal(18,6)")
                    ).cast("double")
                    / F.count("*"),
                    6,
                ).alias(f"c{i}")
                for i in range(d_sub)
            ],
        )
        new = {
            tag: [[list(cw) for cw in cb] for cb in cbs[tag]] for tag in cbs
        }
        for row in means.collect():
            new[row["__corpus"]][row["j"]][row["code"]] = [
                float(row[f"c{i}"]) for i in range(d_sub)
            ]
        cbs = new
    return cbs


def with_pq_codes(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign PQ codes: per subspace, the codeword minimizing the
    (round-6) squared L2 distance, ties to the lower code id.

    Adds ``pq_codes`` (array<int>, length m — the dims/m-fold storage
    cut: 8 bytes replace 256 at the default shape) and ``pq_err``
    (total squared reconstruction error of the round-6 subspace
    distances, accumulated in integer MICRO-UNITS so the value is
    bit-stable across engines).

    Implementation is the repo's Arrow fast path (one vectorized
    pandas UDF over the embedding column — the same stance as
    ``cosine_batch``): m × ksub distances per row in numpy. Both pure
    expression formulations measured FAR slower (interpreted
    higher-order functions ~6 s/3k rows; the expanded element_at
    arithmetic blew up codegen to ~50 s). Engine-portability is kept
    exactly: per-element accumulation runs left-to-right (matching
    the SQL fold order), distances round to 6 decimals before the
    argmin, ``np.argmin`` takes the FIRST minimum (= ties to the
    lower code id, the (dist, code) lexicographic rule), and the
    error total sums round-6 values as int64 micros (= decimal(18,6)
    arithmetic). Narrow map, no shuffle.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    cb_arrays = [
        [[float(v) for v in cw] for cw in cb] for cb in codebooks
    ]  # plain lists: serialize-friendly closure state

    @pandas_udf("codes: array<int>, err: double")
    def _assign(v: pd.Series) -> pd.DataFrame:
        X = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        n = len(X)
        codes = np.zeros((n, m), dtype=np.int32)
        err_micros = np.zeros(n, dtype=np.int64)
        for j in range(m):
            CB = np.asarray(cb_arrays[j], dtype=np.float64)  # (ksub, d_sub)
            sub = X[:, j * d_sub:(j + 1) * d_sub]
            D = np.zeros((n, CB.shape[0]), dtype=np.float64)
            for i in range(d_sub):  # left-to-right: the SQL fold order
                diff = sub[:, i][:, None] - CB[:, i][None, :]
                D += diff * diff
            D = np.round(D, 6)
            codes[:, j] = np.argmin(D, axis=1)  # first min = lower code
            err_micros += np.rint(D[np.arange(n), codes[:, j]] * 1e6).astype(np.int64)
        return pd.DataFrame(
            {"codes": list(codes), "err": err_micros / 1e6}
        )

    return (
        df.withColumn("__pq", _assign(F.col(vec_col)))
        .withColumn("pq_codes", F.col("__pq")["codes"])
        .withColumn("pq_err", F.col("__pq")["err"])
        .drop("__pq")
    )


def pq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ ASYMMETRIC-DISTANCE top-k: the query stays full precision,
    the corpus is its PQ codes, and each candidate's distance is the
    sum of per-subspace table lookups — the ADC search mode of Jégou
    et al. 2011. With m=8/ksub=16 the scan touches 8 bytes + 8 adds
    per candidate instead of 64 float multiplies: the memory-bound
    regime a 100 TB vector store actually runs in.

    Per query the distance TABLE (m x ksub round-6 squared-L2 entries
    against the codebooks) is computed once; the bounded probe set +
    tables broadcast against the coded corpus (corpus never shuffles,
    the same layout as the brute-force scan). Distances accumulate as
    decimal(18,6) lookups of pre-rounded entries, so ranking is
    bit-stable across engines; ties break on neighbor id. Returns
    (query_id, rank, neighbor_id, dist) ascending by distance.
    """
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    coded = with_pq_codes(corpus, codebooks, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "pq_codes"
    )
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cb_arrays = [[[float(v) for v in cw] for cw in cb] for cb in codebooks]

    # the distance table MUST come out of an opaque UDF stage: as a pure
    # expression Catalyst collapses the projection into the join output
    # and re-evaluates all m x ksub distances PER CANDIDATE ROW (measured
    # 60 s vs 2 s at sf0.1). Arrow materializes it once per query row.
    @pandas_udf("array<array<double>>")
    def _dtab(v: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        n = len(X)
        out = []
        tabs = np.zeros((n, m, len(cb_arrays[0])), dtype=np.float64)
        for j in range(m):
            CB = np.asarray(cb_arrays[j], dtype=np.float64)
            sub = X[:, j * d_sub:(j + 1) * d_sub]
            D = np.zeros((n, CB.shape[0]), dtype=np.float64)
            for i in range(d_sub):  # left-to-right: the SQL fold order
                diff = sub[:, i][:, None] - CB[:, i][None, :]
                D += diff * diff
            tabs[:, j, :] = np.round(D, 6)
        for r in range(n):
            out.append([list(tabs[r, j, :]) for j in range(m)])
        return pd.Series(out)

    q = queries.select(
        F.col(id_col).alias("query_id"), _dtab(F.col(vec_col)).alias("__dtab")
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("__dtab"), F.col("pq_codes"),
            lambda tab, c: F.element_at(tab, c + 1),
        ),
        F.lit(0).cast("decimal(18,6)"),
        # re-cast the sum: decimal + decimal widens precision, and the
        # fold's accumulator type must stay fixed
        lambda acc, x: (acc + x.cast("decimal(18,6)")).cast("decimal(18,6)"),
    ).cast("double")
    scored = (
        coded.join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", dist.alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dist")
    )


def pq_rerank_topk(
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ search the way a production vector store runs it: the
    compressed-domain ADC scan (:func:`pq_adc_topk`) prunes the corpus
    to a ``shortlist`` per query, then an EXACT squared-L2 re-rank of
    just those candidates restores neighbor quality (the
    shortlist-re-rank pattern of Jégou et al. 2011 §V). Full-precision
    work is bounded by |queries| × shortlist — the corpus itself is
    only ever touched through its 8-byte codes.

    Returns (query_id, rank, neighbor_id, dist) with round-6 exact
    distances, ties on neighbor id.
    """
    short = pq_adc_topk(
        queries, corpus, codebooks, k=shortlist, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id")
    cand = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).join(F.broadcast(short), "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    scored = cand.join(F.broadcast(q), "query_id").select(
        "query_id",
        "neighbor_id",
        F.round(l2_batch(F.col("qv"), F.col("cv")), 6).alias("dist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dist")
    )


_L2_BATCH = None


def l2_batch(a: Column, b: Column) -> Column:
    """Arrow-vectorized squared-L2 distance over two array columns
    (the exact twin of :func:`cosine_batch` for distance-ranked
    search; used as ground truth for the PQ recall audit)."""
    global _L2_BATCH
    if _L2_BATCH is None:

        @pandas_udf("double")
        def _l2(a: pd.Series, b: pd.Series) -> pd.Series:
            A = np.stack(a.to_numpy()).astype(np.float64)
            B = np.stack(b.to_numpy()).astype(np.float64)
            D = A - B
            return pd.Series(np.einsum("ij,ij->i", D, D))

        _L2_BATCH = _l2
    return _L2_BATCH(a, b)


def l2_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k squared-L2 neighbors per query (ascending distance,
    neighbor-id tie-break; self-matches excluded) — the brute-force
    layout of :func:`cosine_topk` with a distance metric, serving as
    ground truth for ADC/PQ recall measurement."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(l2_batch(F.col("qv"), F.col("cv")), 6).alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# ----------------------------------------------- binary quantization

def with_binary_codes(
    df: DataFrame, vec_col: str = "embedding", dims: int = 64
) -> DataFrame:
    """Sign-bit binary quantization: bit d = (v_d >= 0), packed into
    two 32-bit halves (``bq_lo``/``bq_hi`` — two bigints avoid the
    sign-bit hazard of one 64-bit pack). 1 bit/dim = a 32x cut over
    float32; Hamming distance between codes approximates angular
    distance, the re-rank prefilter binary-quantized vector stores
    scan first. Pure codegen'd CASE/bit arithmetic — no UDF, no
    shuffle, and the same expression is spellable in any SQL engine.
    """
    if dims != 64:
        raise ValueError("with_binary_codes packs exactly 64 dims")
    halves = []
    for h in range(2):
        expr = None
        for i in range(32):
            d = h * 32 + i
            term = F.when(
                F.element_at(F.col(vec_col), d + 1) >= 0,
                F.lit(1 << i).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
            expr = term if expr is None else expr + term
        halves.append(expr)
    return df.withColumn("bq_lo", halves[0]).withColumn("bq_hi", halves[1])


def hamming_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by Hamming distance over binary codes (ascending, ties to
    the lower neighbor id; self-matches excluded). The scan per
    candidate is two XORs + two popcounts over 16 bytes — entirely
    inside whole-stage codegen; the bounded probe side broadcasts
    (the brute-force layout at 1/32nd the bytes)."""
    q = with_binary_codes(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("bq_lo").alias("q_lo"),
        F.col("bq_hi").alias("q_hi"),
    )
    c = with_binary_codes(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "bq_lo", "bq_hi"
    )
    ham = F.expr("bit_count(q_lo ^ bq_lo) + bit_count(q_hi ^ bq_hi)").cast("bigint")
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", ham.alias("ham"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("ham"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "ham")
    )
