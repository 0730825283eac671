"""Deterministic dataset splitting and sampling for training pipelines.

Train/val/test assignment must be a PURE FUNCTION of a stable key —
never ``rand()`` — so that reruns, backfills and incremental additions
land every document in the same split (the classic requirement for
leakage-free evaluation sets). The split here hashes the key with md5
into a 10000-bucket space and cuts it by cumulative fractions; both
sides of the oracle can express it, and adding data never moves an
existing row's split.

Scale posture: a narrow map (one hash per row, whole-stage codegen);
no shuffle, no sampling state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: bucket space for fraction cuts — 1/10000 granularity
BUCKETS = 10_000


def split_bucket(key: Column, salt: str = "split") -> Column:
    """Stable bucket in [0, BUCKETS) from md5 of the salted key."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return h % BUCKETS


def mixture_sample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    weights: dict[str, int],
    salt: str = "mix",
) -> DataFrame:
    """Downsample each source so the kept corpus matches a target
    mixture — the domain-weighting step of a training-data build.

    ``weights`` are integer parts (e.g. ``{"web": 60, "code": 30,
    "wiki": 10}``). The largest corpus the targets allow is bounded by
    the scarcest source: ``T = min_s (n_s·100 div w_s)`` with
    ``100 = Σ weights``; each source then keeps ``t_s = T·w_s div
    100`` docs, enforced as the bucket cut ``t_s·BUCKETS div n_s`` over
    the same md5 bucket as ``with_split``. Every step is INTEGER
    arithmetic — no float rate ever decides a row, so any engine
    derives identical cuts.

    Scale posture: per-source counts are a tiny aggregate (|sources|
    rows); the min is a window over that aggregate, never over data;
    the cuts rejoin the corpus by broadcast. The corpus itself is
    touched by one narrow map (hash + compare).

    Returns the input rows that survive, with their ``__bucket`` and
    per-source ``__cut`` attached for auditability.
    """
    from pyspark.sql import Window

    total_w = sum(weights.values())
    if total_w <= 0 or any(w <= 0 for w in weights.values()):
        raise ValueError("mixture weights must be positive integers")
    w_map = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    counts = (
        df.where(F.col(source_col).isin(*weights))
        .groupBy(source_col)
        .agg(F.count("*").alias("__n"))
        .withColumn("__w", w_map[F.col(source_col)])
        .withColumn("__t_cap", F.expr(f"__n * {total_w} div __w"))
    )
    t_min = F.min("__t_cap").over(Window.partitionBy())  # |sources| rows only
    cuts = (
        counts.withColumn("__T", t_min)
        .withColumn("__t", F.expr(f"__T * __w div {total_w}"))
        .withColumn("__cut", F.expr(f"__t * {BUCKETS} div __n"))
        .select(F.col(source_col).alias("__src"), "__cut")
    )
    bucket = split_bucket(F.col(key_col), salt=salt)
    return (
        df.withColumn("__bucket", bucket)
        .join(F.broadcast(cuts), F.col(source_col) == F.col("__src"))
        .where(F.col("__bucket") < F.col("__cut"))
        .drop("__src")
    )


def with_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Attach a ``split`` column ('train'/'val'/... per ``fractions``).

    Fractions must sum to 1.0 (±1e-9). Assignment: bucket < 10000·c1 →
    first split, < 10000·(c1+c2) → second, … — insertion order of the
    dict defines the cut order, so spell it deterministically.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")
    bucket = split_bucket(F.col(key_col), salt)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cut = int(round(acc * BUCKETS))
        cond = bucket < F.lit(cut)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


# ------------------------------------------- importance resampling (DSIR)


def dsir_weights(
    df: DataFrame,
    is_target: Column,
    buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashed-bigram importance weights for target-matched data
    selection, after the DSIR recipe (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score each
    document by how much more likely its features are under the
    TARGET distribution than under the corpus (source) distribution,
    then keep the highest-weight documents.

    Features are word bigrams hashed into ``buckets`` md5 buckets (the
    paper's hashed n-gram feature space). Per-bucket probabilities are
    Laplace-smoothed counts; the per-document log weight is

        log w(d) = Σ_f  ln p_target(f) - ln p_source(f)

    summed over the document's feature OCCURRENCES. The per-bucket
    log-likelihood ratio is rounded to 6 decimals and fixed as
    ``decimal(18,6)``, so the per-doc sum is exact integer-decimal
    arithmetic — bit-stable across engines (float only at the very
    edges: the two ``ln`` calls, proven portable by the scalar
    gauntlet, and the final cast).

    Scale posture: one explode pass over the corpus; the bucket stats
    are a map-side-combined hash-agg to ``buckets`` rows; the LLR
    table (≤ ``buckets`` rows) broadcasts back onto the feature
    stream; one keyed agg by document and one keyed join to re-attach
    the corpus. No window over data, no driver state beyond the
    broadcast LLR table.

    Returns the input columns + ``n_feats`` (bigint) + ``log_weight``
    (double, 0.0 for documents with fewer than two tokens).
    """
    from flink_commons_spark.operators.text import tokens

    toks = tokens(F.lower(F.col(text_col)))
    tdf = df.select(id_col, is_target.alias("__tgt"), toks.alias("__toks"))
    bigram_at = lambda i: F.concat_ws(  # noqa: E731
        " ", F.get(F.col("__toks"), i), F.get(F.col("__toks"), i + 1)
    )
    # guard: sequence(0, -1) would DESCEND — short docs get no features
    bigrams = F.when(
        F.size(F.col("__toks")) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(F.col("__toks")) - 2), bigram_at),
    ).otherwise(F.array().cast("array<string>"))
    feats = (
        tdf.withColumn("__feat", F.explode(bigrams))
        .select(
            id_col,
            "__tgt",
            (
                F.conv(F.substring(F.md5(F.col("__feat")), 1, 14), 16, 10)
                .cast("bigint") % buckets
            ).alias("__bucket"),
        )
    )
    w_all = Window.partitionBy()  # over the bucket table only (≤ buckets rows)
    # NB: names must differ by more than case — Spark's default
    # case-insensitive resolution makes withColumn("__T", …) REPLACE "__t"
    bstats = (
        feats.groupBy("__bucket")
        .agg(
            F.count("*").alias("__s"),
            F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("__t"),
        )
        .withColumn("__s_tot", F.sum("__s").over(w_all))
        .withColumn("__t_tot", F.sum("__t").over(w_all))
    )
    llr = F.round(
        F.log((F.col("__t") + 0.5) / (F.col("__t_tot") + 0.5 * buckets))
        - F.log((F.col("__s") + 0.5) / (F.col("__s_tot") + 0.5 * buckets)),
        6,
    ).cast("decimal(18,6)")
    bucket_llr = bstats.select("__bucket", llr.alias("__llr"))
    weights = (
        feats.join(F.broadcast(bucket_llr), "__bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("__llr").alias("__lw"),
        )
    )
    return (
        df.join(weights, id_col, "left")
        .withColumn("n_feats", F.coalesce(F.col("n_feats"), F.lit(0)))
        .withColumn(
            "log_weight",
            F.coalesce(F.col("__lw").cast("double"), F.lit(0.0)),
        )
        .drop("__lw")
    )
