"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale design (the 100 TB posture, ``SURVEY.md §4.3``):

- Everything is shuffle-based — no driver-side state, no collects.
- Exact dedup is one hash-aggregate on a 56-bit fingerprint (map-side
  partial aggregation applies).
- MinHash-LSH shuffles by *band bucket*, so candidate generation is
  linear in corpus size times band count; only same-bucket pairs are
  materialized (classic banding bound on pair blow-up).
- All hashes are md5-based and deterministic → reproducible runs and
  SQL-oracle checkability (md5 exists in every engine).

No Python UDFs: shingling, hashing and banding are array/higher-order
functions executed JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from flink_commons_spark.operators.text import fingerprint, tokens


# --------------------------------------------------------------- exact

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per distinct (normalized) text.

    One shuffle on the 56-bit fingerprint; at 100 TB this is the
    cheapest possible exact pass (the fingerprint is 8 bytes vs the
    full text as shuffle key).
    """
    fp = df.withColumn("__fp", fingerprint(F.col(text_col)))
    keep = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col)).drop("__fp")
    return df.join(keep, id_col, "leftsemi")


# ------------------------------------------------------------ shingles

def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a TOKEN-ARRAY column.

    Pass a materialized token array (``tokens(lower(text))`` stored as a
    real column), not the inline tokenization expression: expressions
    referenced inside a higher-order-function lambda are re-evaluated
    per element (no CSE in the interpreted HOF path), so an inlined
    tokenize tree would rerun once per shingle.
    """
    idx = F.sequence(F.lit(1), F.greatest(F.size(col) - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(col, i, n)))
    return F.array_distinct(grams)


def shingle_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3) -> DataFrame:
    """(id, shingle) exploded distinct-shingle table (two fused narrow
    projections: tokenize once, then shingle by column reference)."""
    tdf = df.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__toks")
    )
    return tdf.select(
        F.col(id_col),
        F.explode(word_shingles(F.col("__toks"), n)).alias("shingle"),
    )


# ------------------------------------------------------------- minhash

def _portable_hash(col: Column) -> Column:
    """56-bit integer from md5 — identical in Spark and ANSI-ish SQL
    (DuckDB: ``('0x' || substr(md5(x), 1, 14))::bigint``)."""
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("bigint")


def minhash_signatures(shingles: DataFrame, num_hashes: int = 8,
                       id_col: str = "doc_id") -> DataFrame:
    """Per-doc MinHash signature: for seed s, ``min(h(s || shingle))``.

    One hash-aggregate over the shingle table; partial (map-side) min
    makes the shuffle carry only num_hashes bigints per doc.
    """
    aggs = [
        F.min(_portable_hash(F.concat(F.lit(f"{s}|"), F.col("shingle")))).alias(f"mh{s}")
        for s in range(num_hashes)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_candidates(signatures: DataFrame, num_hashes: int = 8, bands: int = 4,
                   id_col: str = "doc_id") -> DataFrame:
    """Banding: docs sharing any band bucket become candidate pairs.

    Returns distinct (a, b) with a < b. The self-join shuffles on the
    band-bucket key; bucket sizes are bounded by hash uniformity, so the
    pair count stays near-linear for non-degenerate corpora — the reason
    this survives 100 TB where all-pairs Jaccard cannot.
    """
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows_per_band + r}").cast("string")
                 for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"),
                     F.concat_ws("_", *parts).alias("bucket"))
        )
    exploded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    left = exploded.alias("l")
    right = exploded.alias("r")
    return (
        left.join(right, ["band", "bucket"])
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .distinct()
    )


# ------------------------------------------------------------- jaccard

def jaccard_pair_counts(candidates: DataFrame, shingles: DataFrame,
                        id_col: str = "doc_id") -> DataFrame:
    """(a, b, inter, sz_a, sz_b) for candidate pairs — the exact
    integer ingredients of Jaccard, kept unreduced so callers can rank
    with pure integer arithmetic (bit-stable across engines).

    ``|A∩B|`` via a join on the shingle value restricted to candidate
    pairs; all joins shuffle on doc id / shingle — no pairwise set
    materialization on any single node.
    """
    sizes = shingles.groupBy(id_col).agg(F.count("*").alias("sz"))
    inter = (
        candidates
        .join(shingles.withColumnRenamed(id_col, "a"), "a")
        .join(shingles.withColumnRenamed(id_col, "b"), ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter
        .join(sizes.withColumnRenamed(id_col, "a").withColumnRenamed("sz", "sz_a"), "a")
        .join(sizes.withColumnRenamed(id_col, "b").withColumnRenamed("sz", "sz_b"), "b")
        .select("a", "b", "inter", "sz_a", "sz_b")
    )


def jaccard_pairs(candidates: DataFrame, shingles: DataFrame,
                  id_col: str = "doc_id") -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (rounded double).
    ``|A∪B| = |A| + |B| − |A∩B|``; see :func:`jaccard_pair_counts`."""
    return (
        jaccard_pair_counts(candidates, shingles, id_col)
        .withColumn("jaccard",
                    F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
        .select("a", "b", "jaccard")
    )


def exact_jaccard_pairs(shingles: DataFrame, threshold: float = 0.5,
                        id_col: str = "doc_id") -> DataFrame:
    """ALL pairs with exact shingle-Jaccard ≥ ``threshold`` — the
    ground truth the MinHash banding path approximates, computed over
    an inverted index on the shingle value (never all-pairs: only
    docs that SHARE a shingle ever meet, and the shuffle key is the
    shingle itself).

    This is the measurement half of the dedup family: run it on a
    sample next to :func:`lsh_candidates` and the quotient is the
    banding recall (see ``catalog.dedup_minhash_recall``) — the same
    continuously-measurable quality dial ``ann_recall`` gives the ANN
    index. At 100 TB run the truth side on a sampled slice; the
    banding side is the production path.

    The threshold cut uses integer arithmetic (``|A∩B|·den ≥
    num·|A∪B|``), never the rounded float, so the cut is bit-stable
    across engines.
    """
    sizes = shingles.groupBy(id_col).agg(F.count("*").alias("sz"))
    left = shingles.select(F.col("shingle"), F.col(id_col).alias("a"))
    right = shingles.select(F.col("shingle"), F.col(id_col).alias("b"))
    inter = (
        left.join(right, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_inter"))
    )
    num, den = int(round(threshold * 1000)), 1000
    return (
        inter
        .join(sizes.withColumnRenamed(id_col, "a").withColumnRenamed("sz", "sz_a"), "a")
        .join(sizes.withColumnRenamed(id_col, "b").withColumnRenamed("sz", "sz_b"), "b")
        .where(
            F.col("n_inter") * den
            >= F.lit(num) * (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
        )
        .select("a", "b", "n_inter", "sz_a", "sz_b")
    )


def exact_jaccard_pairs_collapsed(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """:func:`exact_jaccard_pairs` with EXACT CLONES COLLAPSED first —
    the duplicate-heavy-corpus form (the regime a 100 TB crawl is, and
    the sf1 testdata literally: every doc sits in a 10-clone family).
    Identical text implies an identical shingle set, and pairwise
    Jaccard between DISTINCT texts is clone-count-invariant, so the
    inverted-index join runs on one representative per distinct text
    (a ×c-clone corpus shrinks its join work ×c²) and the qualifying
    representative pairs are expanded back to member pairs, plus the
    analytic intra-clone pairs (identical non-empty shingle sets have
    Jaccard exactly 1 ≥ any threshold; empty-shingle docs never pair,
    matching the inverted index, which never sees them). Output is
    row-identical to running :func:`exact_jaccard_pairs` on the raw
    corpus — the same collapse already used by
    ``curation.ngram_jaccard_pairs`` (measured there: sf1 truth-side
    wall time is the recall query's dominant cost without it).
    Returns ``(a, b)`` pairs with ``a < b``.
    """
    g = (
        docs.select(id_col, text_col)
        .groupBy(F.col(text_col))  # VALUE key: no hash-collision merge
        .agg(
            F.min(id_col).alias("__rep"),
            F.sort_array(F.collect_list(F.col(id_col))).alias("__members"),
        )
        .localCheckpoint(eager=False)
    )
    reps = g.select(F.col("__rep").alias(id_col), text_col)
    rep_sh = shingle_table(reps, text_col, id_col, n)
    rep_pairs = exact_jaccard_pairs(rep_sh, threshold, id_col).select("a", "b")
    ga = g.select(F.col("__rep").alias("a"), F.col("__members").alias("__ma"))
    gb = g.select(F.col("__rep").alias("b"), F.col("__members").alias("__mb"))
    cross = (
        rep_pairs.join(ga, "a")
        .join(gb, "b")
        .select(
            F.explode("__ma").alias("ma"),
            F.col("__mb"),
        )
        .select("ma", F.explode("__mb").alias("mb"))
        .select(
            F.least("ma", "mb").alias("a"), F.greatest("ma", "mb").alias("b")
        )
    )
    # intra-clone pairs: every member pair of a class whose rep has at
    # least one shingle (Jaccard of identical non-empty sets = 1)
    nonempty = rep_sh.select(F.col(id_col).alias("__rep")).distinct()
    intra = (
        g.join(nonempty, "__rep")
        .where(F.size("__members") >= 2)
        .select(F.col("__members").alias("__m"))
        .select(F.explode("__m").alias("a"), F.col("__m"))
        .select("a", F.explode("__m").alias("b"))
        .where(F.col("a") < F.col("b"))
    )
    return cross.unionAll(intra)


def minhash_dedup_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        num_hashes: int = 8, bands: int = 4, ngram: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline → verified pairs ≥ threshold.

    The shingle table feeds four consumers (signatures + the a-side,
    b-side and size legs of the Jaccard verify); persisting it trades
    one materialization (spilling to disk when it outgrows memory) for
    four recomputations of the shingling+hash pipeline — the difference
    between one corpus pass and four at 100 TB.
    """
    from pyspark import StorageLevel

    sh = shingle_table(df, text_col, id_col, ngram).persist(StorageLevel.MEMORY_AND_DISK)
    sig = minhash_signatures(sh, num_hashes, id_col)
    cand = lsh_candidates(sig, num_hashes, bands, id_col)
    return jaccard_pairs(cand, sh, id_col).where(F.col("jaccard") >= threshold)


# ------------------------------------------------------------- simhash
# (a single-column-expression simhash16 twin used to live here; it
# re-hashed every token 16× and was removed in favor of simhash_table)

# ------------------------------------------------- shared substring runs

def longest_shared_runs(
    df: DataFrame,
    n: int = 8,
    max_df: int = 100,
    min_tokens: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Longest EXACT duplicated token span between document pairs —
    substring-level dedup in the style of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"),
    which removes repeated SPANS rather than whole near-dup documents.

    Method: positional word ``n``-grams; grams shared by a pair at
    positions (pa, pb) lie on the diagonal ``d = pa − pb``, and a
    duplicated span of length L tokens appears as L−n+1 CONSECUTIVE
    diagonal hits — a gaps-and-islands pass over the match table
    recovers each maximal run as ``n + hits − 1`` tokens. Exactness:
    every output is an integer (positions, token counts), so any
    engine derives identical rows.

    Scale posture: the match table is the inverted-index self-join
    bounded by the ``max_df`` stop-gram cap (Σ min(df, max_df)² — same
    analysis as n-gram Jaccard, never all-pairs); the islands window
    partitions on (a, b, d) — a fine-grained key whose groups are runs
    on one diagonal, so no skew. Grams with df == 1 are pruned before
    the join.

    Returns one row per maximal shared run of ≥ ``max(min_tokens, n)``
    tokens: (a, b, d, start_a, start_b, run_tokens), a < b.
    """
    from pyspark.sql import Window

    toks_df = df.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__toks")
    )
    pos_grams = toks_df.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                F.size(F.col("__toks")) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(F.col("__toks")) - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i, n)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos", "gram"),
    )
    df_counts = pos_grams.groupBy("gram").agg(F.count("*").alias("gram_df"))
    joinable = pos_grams.join(
        df_counts.where(
            (F.col("gram_df") >= 2) & (F.col("gram_df") <= max_df)
        ).select("gram"),
        "gram",
    )
    left = joinable.select("gram", F.col(id_col).alias("a"), F.col("pos").alias("pa"))
    right = joinable.select("gram", F.col(id_col).alias("b"), F.col("pos").alias("pb"))
    matches = (
        left.join(right, "gram")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "pa", "pb", (F.col("pa") - F.col("pb")).alias("d"))
    )
    w = Window.partitionBy("a", "b", "d").orderBy("pa")
    runs = (
        matches.withColumn("__island", F.col("pa") - F.row_number().over(w))
        .groupBy("a", "b", "d", "__island")
        .agg(
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
            (F.count("*") + (n - 1)).cast("bigint").alias("run_tokens"),
        )
        .drop("__island")
    )
    return runs.where(F.col("run_tokens") >= max(min_tokens, n))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS rolling-hash scheme).

    Hash every ``k``-character gram of the normalized text, slide a
    ``window``-gram window and keep each window's minimum hash; the
    distinct selected minima are the document's fingerprints. Guarantees
    any shared substring of length ≥ ``k + window - 1`` yields at least
    one shared fingerprint — the substring-level dedup complement to
    token-level MinHash.

    Shape: ZERO-shuffle narrow map — the gram-hash array, the sliding
    window minima and the distinct selection are all per-document array
    expressions (whole-stage codegen), so cost is linear in corpus size
    with no exchange/sort at any scale. (The previous formulation
    exploded one row per character and paid a per-doc sort in a ranking
    window — same values, ~3× the wall clock and a full shuffle.)
    Per-row memory is O(doc_len) hashes; at 8 bytes per char a 1 MB
    document holds an 8 MB array — fine for web/training corpora, chunk
    pathological documents upstream. Returns (id, fingerprint) rows.
    """
    # materialize the normalized text as a real column FIRST: an
    # expression referenced inside a higher-order-function lambda is
    # re-evaluated per array element (no CSE in the interpreted HOF
    # path), so inlining the tokenize/normalize tree here would redo it
    # once per gram (~doc_len times)
    ndf = df.select(
        F.col(id_col),
        F.concat_ws(" ", tokens(F.lower(F.col(text_col)))).alias("__t"),
    )
    t = F.col("__t")
    n_grams = F.greatest(F.length(t) - (k - 1), F.lit(1))
    gram_hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: _portable_hash(t.substr(i, F.lit(k))),
    )
    # same reasoning: the hash array becomes a column so the window pass
    # reads it by reference instead of re-hashing per slice
    hashed = ndf.select(F.col(id_col), gram_hashes.alias("__h"))
    fps = F.transform(
        F.sequence(F.lit(1), F.size("__h")),
        lambda i: F.array_min(F.slice("__h", i, window)),
    )
    return hashed.select(
        F.col(id_col), F.explode(F.array_distinct(fps)).alias("fingerprint")
    )


def simhash_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) via the explode/aggregate formulation.

    Computes ``md5(token)`` exactly once per (doc, token) row and folds
    the 16 bit-votes in one hash aggregate with map-side partial
    aggregation — the shape that scales: shuffle payload is 16 ints per
    doc, all stages whole-stage-codegen. Bit *i* of the fingerprint is
    the sign of ``Σ_tokens ±1`` where the vote is the parity of hex
    digit *i* of ``md5(token)`` (≥'8' → +1); near-dup docs differ in few
    bits (compare via Hamming distance).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.lower(F.col(text_col))))).alias("tok"),
    )
    hexed = toks.withColumn("h", F.md5("tok"))
    votes = [
        F.sum(
            F.when(
                F.substring("h", i + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1
            ).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(16)
    ]
    per_doc = hexed.groupBy(id_col).agg(*votes)
    fp = F.lit(0).cast("bigint")
    for i in range(16):
        fp = fp + F.when(F.col(f"b{i}") > 0, F.lit(2 ** i)).otherwise(F.lit(0))
    return per_doc.select(F.col(id_col), fp.cast("bigint").alias("simhash"))


def simhash_buckets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(fingerprint, member count, min id) — identical-fingerprint docs
    are dedup groups; explode + two hash-aggregate shuffles."""
    return (
        simhash_table(df, text_col, id_col)
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )
