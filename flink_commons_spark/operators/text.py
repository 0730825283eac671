"""Text-analysis operators for large-scale training-data pipelines.

All operators are built from JVM-side ``pyspark.sql.functions`` only —
no Python UDFs in the hot path — so they run inside whole-stage codegen
and scale linearly with executor count. Each is a narrow map (no
shuffle) unless documented otherwise.

These extend the reference engine's surface (the reference delegates all
row-level computation to Flink SQL, ``SURVEY.md §2.5``); they are the
north-star LLM-data operators (``SURVEY.md §7.1`` step 7).

Determinism: every derived value is a pure function of the input text
(hashes are md5-based), so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Tiny built-in stopword marker sets for the language-ID heuristic.
#: Ordered — ties break toward the earlier entry (deterministic argmax).
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "of", "and", "is"]),
    ("de", ["der", "die", "das", "und", "ist"]),
    ("es", ["el", "la", "los", "que", "es"]),
    ("fr", ["le", "la", "les", "et", "est"]),
    ("zh", ["的", "是", "了", "在", "和"]),
]


def tokens(col: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped (codegen'd)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


#: letter-runs, digit-runs, single punctuation — a cheap deterministic
#: proxy for BPE segment counts; RE2-compatible (no lookarounds) so the
#: same pattern runs in any oracle engine.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^\w\s]"


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count via :data:`BPE_ISH_PATTERN` matches."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0))


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are not word chars or whitespace."""
    stripped = F.regexp_replace(col, r"[\w\s]", "")
    return F.length(stripped) / F.greatest(F.length(col), F.lit(1))


def _isin_pred(words: list[str]):
    """Single-arg lambda factory — PySpark counts lambda parameters to
    pick the higher-order-function arity, so default-arg captures are
    not allowed."""
    return lambda t: t.isin(*words)


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English, by default) stopwords."""
    words = stopwords if stopwords is not None else LANG_MARKERS[0][1]
    toks = tokens(F.lower(col))
    hits = F.size(F.filter(toks, _isin_pred(words)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def avg_word_length(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column) -> Column:
    """Composite document-quality score in [0, 1].

    Deterministic blend of length, punctuation and mean-word-length
    signals (the standard cheap pre-filter in training-data pipelines).
    Weights are fixed so the score is stable across releases.
    """
    length_term = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 5, F.lit(1.0))
    awl = avg_word_length(col)
    word_term = F.when((awl >= 3) & (awl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(0.4 * length_term + 0.3 * punct_term + 0.3 * word_term, 6)


def fingerprint(col: Column) -> Column:
    """Deterministic 56-bit document fingerprint.

    md5 over the whitespace-normalized, lower-cased text, folded to a
    bigint — collision-safe enough for dedup bucketing at 100 TB scale
    (~2^28 docs before birthday-bound collisions matter; use the full
    md5 hex from :func:`fingerprint_hex` when that is not enough).
    """
    normalized = F.concat_ws(" ", tokens(F.lower(col)))
    return F.conv(F.substring(F.md5(normalized), 1, 14), 16, 10).cast("bigint")


def fingerprint_hex(col: Column) -> Column:
    normalized = F.concat_ws(" ", tokens(F.lower(col)))
    return F.md5(normalized)


def lang_scores(col: Column) -> list[tuple[str, Column]]:
    """Marker-token hit count per language (the classic stopword vote)."""
    toks = tokens(F.lower(col))
    out = []
    for lang, markers in LANG_MARKERS:
        out.append((lang, F.size(F.filter(toks, _isin_pred(markers)))))
    return out


def detect_language(col: Column) -> Column:
    """Predicted language = argmax marker-hit count, ties → earlier
    entry in :data:`LANG_MARKERS`; 'und' when no marker matches."""
    scores = lang_scores(col)
    best_score = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    # build argmax right-to-left so earlier languages win ties
    for lang, score in reversed(scores):
        result = F.when((score == best_score) & (best_score > 0), F.lit(lang)).otherwise(result)
    return result


#: C4's line-level blocklist (lowercased substring match drops the line).
C4_LINE_BLOCKLIST = ["lorem ipsum", "javascript", "cookie policy", "{"]

#: terminal punctuation a kept line must end with (C4 rule 1)
C4_TERMINAL_PUNCT = (".", "!", "?", '"', "'")


def c4_clean_lines(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    blocklist: list[str] | None = None,
) -> DataFrame:
    """C4-style line-level document cleaning (Raffel et al. 2020),
    entirely as in-partition array expressions — a narrow map, no
    shuffle, no Python:

    - split the document on newlines;
    - drop lines that do not end in terminal punctuation;
    - drop lines with fewer than ``min_words`` words;
    - drop lines containing a blocklist phrase (case-insensitive);
    - rejoin the survivors; add kept/dropped line counts.

    The famous companion rule — discard any line that appears more
    than once in the ENTIRE corpus — is the line-granular exact dedup
    already provided by :mod:`..operators.dedup` (explode lines, keep
    ``row_number() = 1`` over the line fingerprint); compose the two
    for the full C4 pipeline.

    Returns the input plus ``clean_text``, ``n_lines_kept``,
    ``n_lines_dropped``.
    """
    block = blocklist if blocklist is not None else C4_LINE_BLOCKLIST
    c = F.col(text_col)
    lines = F.split(c, r"\n")

    def _keep(line: Column) -> Column:
        trimmed = F.trim(line)
        low = F.lower(trimmed)
        ends_ok = F.lit(False)
        for p in C4_TERMINAL_PUNCT:
            ends_ok = ends_ok | trimmed.endswith(p)
        blocked = F.lit(False)
        for phrase in block:
            blocked = blocked | low.contains(phrase.lower())
        enough_words = F.size(tokens(trimmed)) >= min_words
        return ends_ok & enough_words & ~blocked

    kept = F.filter(lines, _keep)
    return (
        df.withColumn("clean_text", F.concat_ws("\n", kept))
        .withColumn("n_lines_kept", F.size(kept))
        .withColumn(
            "n_lines_dropped", (F.size(lines) - F.size(kept)).cast("int")
        )
    )


def word_ngrams(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 6,
) -> DataFrame:
    """Positioned word ``n``-grams: (``__d``, ``pos``, ``g``) — tokens
    via ``posexplode(split(...))`` (narrow), grams via ``lead()``
    windows keyed on the document, so the sort is per-document and
    sharded; tail positions with fewer than ``n`` tokens are dropped.
    The shared gram builder for boilerplate redaction and n-gram
    decontamination."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("__d"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy("__d").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", k).over(w) for k in range(1, n)]
    return toks.select(
        "__d",
        "pos",
        F.concat_ws(" ", *parts).alias("g"),
        F.lead("tok", n - 1).over(w).alias("__last"),
    ).where(F.col("__last").isNotNull()).drop("__last")


def decontaminate_exact_ngrams(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """EXACT n-gram benchmark decontamination — the GPT-3/PaLM recipe
    (flag any training document sharing an ``n``-gram with the eval
    set), the exact-join complement of the repo's Bloom-sketch
    decontamination (``operators/sketch.py``): no false positives, at
    the cost of materializing the benchmark's gram set.

    Returns flagged documents only: (id, n_shared) where ``n_shared``
    counts DISTINCT shared grams. Scale posture: both sides are
    doc-keyed window grams (sharded, no global sort); the join keys on
    the gram hash — one shuffle, and AQE broadcast-converts the
    benchmark side when it is small (the usual case: eval suites are
    MBs against a 100 TB corpus)."""
    cg = word_ngrams(docs, id_col, text_col, n)
    bg = word_ngrams(benchmark, id_col, text_col, n).select("g").distinct()
    return (
        cg.join(bg, "g")
        .groupBy("__d")
        .agg(F.countDistinct("g").alias("n_shared"))
        .select(F.col("__d").alias(id_col), "n_shared")
    )


def remove_frequent_ngrams(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 6,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-global BOILERPLATE REDACTION — C4's rule family ("any
    three-sentence span occurring more than once is removed"), the
    word-n-gram form RefinedWeb/Dolma-style pipelines run before
    training: every token position covered by an ``n``-gram that
    appears in ≥ ``min_docs`` DISTINCT documents is deleted from every
    document, and the survivors re-join in order.

    Scale posture (the whole point — no driver state, no UDFs):

    - tokens via ``posexplode(split(...))`` (narrow);
    - grams via ``lead()`` windows keyed on the document — the window
      partitions by doc id, so the sort is per-document and sharded;
    - the frequent-gram set is a gram-keyed ``countDistinct``
      aggregate (one shuffle on the gram hash — the only corpus-global
      exchange, exactly the aggregation C4 runs);
    - covered positions come from ``explode(sequence(pos, pos+n-1))``
      joined doc-locally, removal is a ``left_anti`` join on
      (doc, pos), and reassembly is a per-document
      ``array_sort(collect_list(struct(pos, tok)))`` — bounded by the
      document's own length, never by the corpus.

    Returns (id, clean_text, n_tokens, n_removed); fully-redacted
    documents keep a row with an empty ``clean_text``.
    """
    did = F.col(id_col)
    toks = docs.select(
        did.alias("__d"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )
    grams = word_ngrams(docs, id_col, text_col, n)
    freq = (
        grams.groupBy("g")
        .agg(F.countDistinct("__d").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("g")
    )
    covered = (
        grams.join(freq, "g")
        .select(
            "__d",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    kept = toks.join(covered, ["__d", "pos"], "left_anti")
    rebuilt = kept.groupBy("__d").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s.tok,
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    base = docs.select(
        did.alias("__d"),
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("n_tokens"),
    )
    return base.join(rebuilt, "__d", "left").select(
        F.col("__d").alias(id_col),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_tokens",
        (F.col("n_tokens") - F.coalesce("__n_kept", F.lit(0)))
        .cast("bigint")
        .alias("n_removed"),
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis column family (narrow map, no shuffle)."""
    c = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(c))
        .withColumn("n_tokens_bpe", bpe_ish_token_count(c))
        .withColumn("punct_ratio", F.round(punct_ratio(c), 6))
        .withColumn("stopword_ratio", F.round(stopword_ratio(c), 6))
        .withColumn("avg_word_len", F.round(avg_word_length(c), 6))
        .withColumn("quality", quality_score(c))
        .withColumn("fingerprint", fingerprint(c))
        .withColumn("lang_pred", detect_language(c))
    )
