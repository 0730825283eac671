"""Unit tests for operators/curation.py (corpus-curation family)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_commons_spark.operators import curation as C


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d x"),
            (3, "q r s"),
            (4, "a b"),
            (5, "a b c d e"),
        ],
        ["doc_id", "text"],
    )


def test_ngrams_short_doc_empty_not_descending(spark, docs):
    rows = {
        r["doc_id"]: r["grams"]
        for r in C.with_ngrams(docs, 3).select("doc_id", "grams").collect()
    }
    assert rows[1] == ["a b c", "b c d", "c d e"]
    assert rows[4] == []  # < n tokens: empty, no sequence(0,-1) artifact
    assert rows[3] == ["q r s"]


def test_ngram_jaccard_exact_values(spark, docs):
    pairs = {
        (r["a"], r["b"]): (r["n_inter"], r["sz_a"], r["sz_b"], r["jaccard"])
        for r in C.ngram_jaccard_pairs(docs, n=3, threshold=0.4, max_df=10).collect()
    }
    # docs 1 and 5 are identical -> J=1; 1-2 and 2-5 share 2 of 4 grams
    assert pairs[(1, 5)] == (3, 3, 3, 1.0)
    assert pairs[(1, 2)] == (2, 3, 3, 0.5)
    assert pairs[(2, 5)] == (2, 3, 3, 0.5)
    assert len(pairs) == 3


def test_ngram_jaccard_stop_gram_cap_filters_space(spark, docs):
    # max_df=1 removes every shared gram: no pairs, and set sizes shrink
    out = C.ngram_jaccard_pairs(docs, n=3, threshold=0.1, max_df=1)
    assert out.count() == 0


def test_ngram_jaccard_threshold_is_exact_cut(spark, docs):
    # J(1,2) = 0.5 exactly: threshold 0.5 keeps it, 0.501 drops it
    keep = C.ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_df=10)
    assert (1, 2) in {(r["a"], r["b"]) for r in keep.collect()}
    drop = C.ngram_jaccard_pairs(docs, n=3, threshold=0.501, max_df=10)
    assert (1, 2) not in {(r["a"], r["b"]) for r in drop.collect()}


def test_ngram_jaccard_clone_expansion_matches_raw_semantics(spark):
    """The exact-clone collapse must be invisible in the output: clone
    groups expand to every member pair (intra AND cross), gram df is
    clone-weighted (a gram over max_df because of clones is a stop
    gram even though distinct texts holding it are few), and sizes
    follow the (a, b) slot order."""
    docs = spark.createDataFrame(
        [
            # group A: 3 clones of "a b c d e"; group B: 2 of "a b c d x"
            (10, "a b c d e"), (11, "a b c d e"), (12, "a b c d e"),
            (20, "a b c d x"), (21, "a b c d x"),
            (30, "q r s t u"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r["a"], r["b"]): (r["n_inter"], r["sz_a"], r["sz_b"], r["jaccard"])
        for r in C.ngram_jaccard_pairs(
            docs, n=3, threshold=0.4, max_df=10
        ).collect()
    }
    # intra-A: C(3,2)=3 pairs at J=1; intra-B: 1 pair; cross A×B: 3·2=6
    assert len(pairs) == 10
    for ab in [(10, 11), (10, 12), (11, 12)]:
        assert pairs[ab] == (3, 3, 3, 1.0)
    assert pairs[(20, 21)] == (3, 3, 3, 1.0)
    for a in (10, 11, 12):
        for b in (20, 21):
            assert pairs[(a, b)] == (2, 3, 3, 0.5)
    # clone-weighted stop-gram cap: "a b c" has distinct-text df 2 but
    # raw df 5 — max_df=4 must remove it from BOTH sides' gram space
    capped = {
        (r["a"], r["b"]): (r["n_inter"], r["sz_a"], r["sz_b"])
        for r in C.ngram_jaccard_pairs(
            docs, n=3, threshold=0.4, max_df=4
        ).collect()
    }
    # "a b c" and "b c d" (df 5) are stop grams; each text keeps 1 gram
    # so the cross pair shares nothing and must be ABSENT
    assert (10, 20) not in capped
    # cross pairs now share nothing -> only intra-clone pairs remain
    assert set(capped) == {(10, 11), (10, 12), (11, 12), (20, 21)}
    assert capped[(10, 11)] == (1, 1, 1)


def test_ngram_jaccard_null_and_empty_texts_produce_no_pairs(spark):
    """NULL/empty/too-short texts have empty kept gram sets: no pairs
    — including no intra-clone pairs for identical degenerate texts."""
    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, ""), (4, ""), (5, "a b"), (6, "a b")],
        "doc_id long, text string",
    )
    assert C.ngram_jaccard_pairs(docs, n=3, threshold=0.1, max_df=10).count() == 0


def test_decontaminate_counts_and_zero_overlap(spark, docs):
    corpus = docs.where("doc_id < 4")
    bench = docs.where("doc_id >= 4")  # "a b" + "a b c d e"
    rows = {r["doc_id"]: r for r in C.decontaminate(corpus, bench, n=2).collect()}
    assert rows[1]["n_overlap"] == 4 and rows[1]["contaminated"]
    assert rows[2]["n_overlap"] == 3
    assert rows[3]["n_overlap"] == 0 and not rows[3]["contaminated"]


def test_bigram_lm_scores_hand_computed(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "c d"), (3, "solo")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in C.bigram_lm_scores(df).collect()}
    # corpus counts: c2("a b")=2, c2("b a")=1, c2("c d")=1; prefixes V=3
    # P(b|a)=(2+1)/(2+3)=0.6  P(a|b)=(1+1)/(1+3)=0.5  P(d|c)=0.5
    lp_ab = round(math.log(0.6), 6)
    lp_ba = round(math.log(0.5), 6)
    assert got[1].n_bigrams == 3
    assert got[1].avg_logp == round((2 * lp_ab + lp_ba) / 3, 6)
    assert got[2].n_bigrams == 1 and got[2].avg_logp == lp_ba
    assert got[3].n_bigrams == 0 and got[3].avg_logp is None


def test_repetition_stats_counts(spark):
    d = spark.createDataFrame([(1, "a a a b"), (2, "x y")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in C.repetition_stats(d).collect()}
    assert (rows[1]["n_1"], rows[1]["top_1"]) == (4, 3)
    assert (rows[1]["n_2"], rows[1]["top_2"]) == (3, 2)  # "a a" twice
    assert (rows[1]["n_3"], rows[1]["top_3"]) == (2, 1)
    assert (rows[2]["n_3"], rows[2]["top_3"]) == (0, 0)  # shorter than n


def test_pii_scan_counts_and_redaction(spark):
    d = spark.createDataFrame(
        [
            (1, "write bob@example.com or call 555-123-4567 via https://x.y/z"),
            (2, "no pii here"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in C.with_pii_scan(d).collect()}
    assert (rows[1]["n_emails"], rows[1]["n_phones"], rows[1]["n_urls"]) == (1, 1, 1)
    assert (rows[2]["n_emails"], rows[2]["n_phones"], rows[2]["n_urls"]) == (0, 0, 0)
    assert rows[2]["redacted_len"] == len("no pii here")
    redacted = d.select(C.redact_pii(F.col("text")).alias("t")).collect()[0]["t"]
    assert redacted == "write <PII> or call <PII> via <PII>"


def test_pii_phone_needs_word_boundary(spark):
    d = spark.createDataFrame([(1, "id 9555-123-45679 x")], ["doc_id", "text"])
    row = C.with_pii_scan(d).collect()[0]
    assert row["n_phones"] == 0  # embedded digits: \b rejects


def test_tfidf_integer_score_and_ties(spark, docs):
    out = C.tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 3 "q r s": all tf=1 df=1 -> score ties at 1e6, lexicographic order
    d3 = sorted(by_doc[3], key=lambda r: r["rnk"])
    assert [r["tok"] for r in d3] == ["q", "r"]
    assert all(r["score"] == 1_000_000 for r in d3)
    # every score is floor(tf*1e6/df)
    for r in out:
        assert r["score"] == (r["tf"] * 1_000_000) // r["df"]


def test_chunk_windows_overlap_and_tail(spark):
    # 100 tokens, window 64 stride 48 -> chunks at 0 (64 full), 48 (52),
    # 96 (4): starts while i*48 < 100
    d = spark.createDataFrame([(1, " ".join(["w"] * 100)), (2, "a b")], ["doc_id", "text"])
    rows = sorted(
        C.chunk_windows(d, window=64, stride=48).collect(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    got = [(r["doc_id"], r["chunk_id"], r["chunk_tokens"], r["is_full"]) for r in rows]
    assert got == [(1, 0, 64, 1), (1, 1, 52, 0), (1, 2, 4, 0), (2, 0, 2, 0)]


def test_mixture_sample_respects_scarcest_source(spark):
    from flink_commons_spark.operators.sampling import mixture_sample

    # 100 'a' docs, 10 'b' docs, targets 50/50 -> b is scarce: cap
    # T = min(100*100/50, 10*100/50) = 20, so each source keeps 10 docs
    # worth of cut (a: 10*10000/100 = 1000 buckets, b: full 10000)
    rows = [(i, "a") for i in range(100)] + [(1000 + i, "b") for i in range(10)]
    d = spark.createDataFrame(rows, ["doc_id", "source"])
    kept = mixture_sample(d, "source", "doc_id", {"a": 50, "b": 50})
    cuts = {r["source"]: r["__cut"] for r in kept.select("source", "__cut").distinct().collect()}
    assert cuts == {"a": 1000, "b": 10000}
    by_src = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src["b"] == 10  # scarce source kept whole
    assert by_src.get("a", 0) <= 20  # ~10 expected from 1000/10000 buckets


def test_mixture_sample_rejects_bad_weights(spark):
    from flink_commons_spark.operators.sampling import mixture_sample

    d = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
    with pytest.raises(ValueError):
        mixture_sample(d, "source", "doc_id", {"a": 0})


def test_chunk_windows_rejects_bad_params(spark):
    d = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        C.chunk_windows(d, window=0)
    with pytest.raises(ValueError):
        C.chunk_windows(d, stride=-1)


def test_tfidf_rare_term_outranks_common(spark, docs):
    rows = {r["rnk"]: r for r in C.tfidf_top_terms(docs, k=2).collect() if r["doc_id"] == 2}
    assert rows[1]["tok"] == "x"  # df=1 beats the df=4 'a'/'b' terms


def test_dsir_weights_favor_target_like_docs(spark):
    """Docs sharing bigrams with the target population must outweigh
    docs that don't; short docs (<2 tokens) get weight 0."""
    from flink_commons_spark.operators.sampling import dsir_weights

    rows = [
        (1, "the quick brown fox jumps", "en"),      # target
        (2, "the quick brown dog runs", "en"),       # target
        (3, "the quick brown cat sits", "xx"),       # target-like source doc
        (4, "uno dos tres cuatro cinco", "xx"),      # target-unlike
        (5, "solo", "xx"),                           # no bigrams
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    from pyspark.sql import functions as F

    out = {r["doc_id"]: r for r in dsir_weights(
        d, F.col("lang") == "en", buckets=64
    ).collect()}
    assert out[5]["n_feats"] == 0 and out[5]["log_weight"] == 0.0
    # target-like doc 3 scores above target-unlike doc 4
    assert out[3]["log_weight"] > out[4]["log_weight"]
    # every doc with features got a finite weight and the right count
    assert out[1]["n_feats"] == 4 and out[4]["n_feats"] == 4


def test_longest_shared_runs_finds_exact_span(spark):
    """A 12-token span shared by two docs must surface as one maximal
    run of exactly 12 tokens; unrelated docs produce no rows."""
    from flink_commons_spark.operators.dedup import longest_shared_runs

    span = "a b c d e f g h i j k l"  # 12 shared tokens
    rows = [
        (1, "x y " + span + " q r"),          # span at tokens 2..13
        (2, span + " z w v u"),               # span at tokens 0..11
        (3, "totally different words only here unique tokens galore"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    runs = longest_shared_runs(d, n=8, max_df=10).collect()
    assert len(runs) == 1
    r = runs[0]
    assert (r["a"], r["b"]) == (1, 2)
    assert r["run_tokens"] == 12
    assert r["start_a"] == 2 and r["start_b"] == 0
    assert r["d"] == 2


def test_bloom_decontaminate_no_false_negatives(spark):
    """Bloom guarantees: every exactly-contaminated gram is also
    Bloom-positive (no false negatives), so n_bloom >= n_exact per
    doc; with a tiny bit space the filter must still flag every doc
    the exact scan flags."""
    from flink_commons_spark.operators.curation import (
        bloom_decontaminate, decontaminate,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = d.where("doc_id % 20 = 0")
    corpus = d.where("doc_id % 20 <> 0")
    out = bloom_decontaminate(corpus, bench, n=3, m_bits=4096, k_hashes=3)
    rows = out.collect()
    assert rows and all(r.n_bloom >= r.n_exact for r in rows)
    assert all(r.n_false_pos == r.n_bloom - r.n_exact for r in rows)
    exact = {
        r.doc_id: r.contaminated
        for r in decontaminate(corpus, bench, n=3, overlap_pct=5).collect()
    }
    for r in rows:
        if exact[r.doc_id]:
            assert r.flagged == 1  # no false negatives at the doc level
    # the 4096-bit space is deliberately small: false positives must
    # actually occur, or the test proves nothing about the trade
    assert sum(r.n_false_pos for r in rows) > 0


def test_cms_never_undercounts(spark):
    """CMS invariant: min-over-rows estimate >= exact count for every
    token, with equality exactly when none of the token's cells
    collide; shrinking the width can only grow estimates."""
    from pyspark.sql import functions as F

    from flink_commons_spark.operators.curation import cms_token_counts
    from flink_commons_spark.operators.text import tokens

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = (
        d.select(F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("c"))
    )
    ests = {}
    for width in (8, 64):
        counters, tokpos = cms_token_counts(d, width=width, depth=2)
        est = (
            tokpos.join(counters, ["row", "pos"])
            .groupBy("tok").agg(F.min("cnt").alias("est"))
        )
        rows = est.join(exact, "tok").collect()
        assert rows and all(r.est >= r.c for r in rows)
        ests[width] = {r.tok: r.est for r in rows}
    assert all(ests[8][t] >= ests[64][t] for t in ests[8])
    # the narrow sketch must actually collide on this corpus
    exact_map = {r.tok: r.c for r in exact.collect()}
    assert any(ests[8][t] > exact_map[t] for t in ests[8])


def test_hll_estimate_is_partition_invariant_and_mergeable(spark):
    """The portable HLL must be deterministic under repartitioning
    (integer-exact register sums — float harmonic means would not be)
    and its registers must merge across disjoint shards by max,
    yielding the identical estimate to sketching the union directly."""
    from pyspark.sql import functions as F

    from flink_commons_spark.operators.sketch import hll_estimate, hll_registers

    src = spark.range(0, 5000).select(F.col("id").alias("v"))
    e1 = hll_estimate(src.repartition(1), "v").collect()[0]["hll_est"]
    e32 = hll_estimate(src.repartition(32), "v").collect()[0]["hll_est"]
    assert e1 == e32
    # shard merge: max over per-shard registers == whole-data registers
    a = hll_registers(src.where("v < 2500"), "v")
    b = hll_registers(src.where("v >= 2500"), "v")
    merged = (
        a.unionAll(b).groupBy("bucket").agg(F.max("reg").alias("reg"))
    )
    whole = hll_registers(src, "v")
    assert {(r.bucket, r.reg) for r in merged.collect()} == {
        (r.bucket, r.reg) for r in whole.collect()
    }
    # sanity: the estimate is in the right neighborhood (sigma ~ 13%)
    assert abs(e1 - 5000) / 5000 < 0.4


def test_remove_frequent_ngrams_redacts_shared_spans(spark):
    """C4-style repeated-span removal: positions covered by a 6-gram
    occurring in >=2 distinct docs are deleted; fully-redacted docs
    keep a row with empty clean_text."""
    from flink_commons_spark.operators.text import remove_frequent_ngrams

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f x"),   # shared 6-gram at pos 0-5
            (2, "z a b c d e f"),   # shared 6-gram at pos 1-6
            (3, "q w e r t y"),     # unique 6-gram -> untouched
            (4, "a b c d e f"),     # fully redacted
            (5, "a b c d e f"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in remove_frequent_ngrams(docs, n=6, min_docs=2).collect()
    }
    assert got == {
        1: ("x", 7, 6),
        2: ("z", 7, 6),
        3: ("q w e r t y", 6, 0),
        4: ("", 6, 6),
        5: ("", 6, 6),
    }


def test_decontaminate_exact_ngrams_flags_shared_grams(spark):
    """GPT-3-style exact decontamination: a corpus doc sharing any
    4-gram with the benchmark is flagged with its DISTINCT shared-gram
    count; disjoint docs are absent."""
    from flink_commons_spark.operators.text import (
        decontaminate_exact_ngrams,
    )

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")],
        "doc_id bigint, text string",
    )
    corpus = spark.createDataFrame(
        [
            # shares 'the quick brown fox' AND 'quick brown fox jumps'
            (1, "x the quick brown fox jumps y"),
            (2, "quick brown fox leaps"),   # only a 3-gram overlap
            (3, "completely different words here"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: r.n_shared
        for r in decontaminate_exact_ngrams(corpus, bench, n=4).collect()
    }
    assert got == {1: 2}
