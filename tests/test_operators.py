"""Operator-level tests on constructed micro-datasets with known answers."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from flink_commons_spark.operators import dedup as D
from flink_commons_spark.operators import multimodal as MM
from flink_commons_spark.operators import similarity as S
from flink_commons_spark.operators import text as T
from flink_commons_spark.operators.asof import asof_join
from flink_commons_spark.operators.sessionize import session_stats, sessionize


# ----------------------------------------------------------------- text

def test_token_counts(spark):
    df = spark.createDataFrame([("  the quick  brown fox  ",), ("", ), ("one",)], ["text"])
    got = df.select(T.token_count(F.col("text")).alias("n")).collect()
    assert [r.n for r in got] == [4, 0, 1]


def test_bpe_ish_count(spark):
    df = spark.createDataFrame([("ab3,cd",)], ["text"])
    assert df.select(T.bpe_ish_token_count(F.col("text")).alias("n")).first().n == 4


def test_c4_clean_lines(spark):
    doc = "\n".join(
        [
            "This is a proper sentence.",       # kept
            "short.",                           # < 3 words
            "No terminal punctuation here",     # bad ending
            "Contains lorem ipsum filler text.",  # blocklist
            "Another good line stays!",         # kept
            "  Trimmed ending works too?  ",    # kept (trim before checks)
        ]
    )
    df = spark.createDataFrame([(doc,), ("",)], ["text"])
    got = T.c4_clean_lines(df).collect()
    assert got[0].n_lines_kept == 3
    assert got[0].n_lines_dropped == 3
    assert got[0].clean_text.splitlines() == [
        "This is a proper sentence.",
        "Another good line stays!",
        "  Trimmed ending works too?  ",
    ]
    assert got[1].n_lines_kept == 0


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame([("The  Quick Fox",), ("the quick   fox",)], ["text"])
    fps = [r.f for r in df.select(T.fingerprint(F.col("text")).alias("f")).collect()]
    assert fps[0] == fps[1] > 0


def test_detect_language(spark):
    df = spark.createDataFrame(
        [("the cat is on a mat",), ("der hund und die katze ist",), ("xyzzy qwerty",)],
        ["text"],
    )
    got = [r.l for r in df.select(T.detect_language(F.col("text")).alias("l")).collect()]
    assert got == ["en", "de", "und"]


def test_quality_score_range(spark):
    df = spark.createDataFrame([("a reasonable document with several words",), ("!!!???",)], ["text"])
    rows = df.select(T.quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r.q <= 1.0 for r in rows)
    assert rows[0].q > rows[1].q


# ---------------------------------------------------------------- dedup

def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")], ["doc_id", "text"]
    )
    kept = sorted(r.doc_id for r in D.exact_dedup(df).collect())
    assert kept == [1, 3]


def test_word_shingles(spark):
    from flink_commons_spark.operators.text import tokens

    df = spark.createDataFrame([("a b c d",)], ["text"])
    toked = df.select(tokens(F.lower(F.col("text"))).alias("toks"))
    got = toked.select(D.word_shingles(F.col("toks"), 3).alias("s")).first().s
    assert got == ["a b c", "b c d"]


def test_minhash_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    near = base.replace("tonight", "today")
    far = "completely unrelated text about spark dataframes and shuffles here now"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["doc_id", "text"]
    )
    pairs = D.minhash_dedup_pairs(df, threshold=0.5).collect()
    assert [(p.a, p.b) for p in pairs] == [(1, 2)]
    assert pairs[0].jaccard > 0.5


def test_exact_jaccard_pairs_ground_truth(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    near = base.replace("tonight", "today")
    far = "completely unrelated text about spark dataframes and shuffles here now"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["doc_id", "text"]
    )
    sh = D.shingle_table(df)
    got = D.exact_jaccard_pairs(sh, threshold=0.5).collect()
    assert [(p.a, p.b) for p in got] == [(1, 2)]
    p = got[0]
    # 14 tokens -> 12 shingles each; only the final shingle contains
    # the changed last word, so J = 11/13 ~ 0.846
    assert (p.sz_a, p.sz_b, p.n_inter) == (12, 12, 11)
    assert p.n_inter * 2 >= (p.sz_a + p.sz_b - p.n_inter)
    # threshold above the true Jaccard excludes the pair
    assert D.exact_jaccard_pairs(sh, threshold=0.9).count() == 0


def test_semantic_dedup_within_cell_only(spark):
    # two tight clusters on opposing axes; near-dups only within a cluster
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),   # near vec 0
        (3, [0.1, 0.9, 0.0, 0.0]),   # near vec 1
        (4, [0.0, -1.0, 0.0, 0.0]),  # anti-parallel to vec 1
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cells = S.assign_cells(df, df, nlist=2)
    by_id = {r.vec_id: r.cell for r in cells.collect()}
    assert by_id[0] == by_id[2] == 0 and by_id[1] == by_id[3] == 1
    assert by_id[4] == 0  # cos(v4, c1) = -1 < cos(v4, c0) = 0
    pairs = S.semantic_dedup_pairs(cells, threshold=0.9).collect()
    got = {(p.a, p.b) for p in pairs}
    assert got == {(0, 2), (1, 3)}
    assert all(p.sim > 0.97 for p in pairs)
    # cross-cluster near-misses never scored: cos(0,1)=0 pair absent even at low tau
    low = {(p.a, p.b) for p in S.semantic_dedup_pairs(cells, threshold=-1.0).collect()}
    assert (0, 1) not in low and (1, 4) not in low  # different cells


def test_winnow_shared_substring_guarantee(spark):
    # winnowing guarantees: a shared substring of length >= k+window-1
    # (= 11 here) produces at least one shared fingerprint
    shared = "identical stretch of text here"
    df = spark.createDataFrame(
        [
            (1, f"prefix alpha {shared} suffix one"),
            (2, f"other beginning {shared} another ending"),
            (3, "completely different content with nothing in common xyz"),
        ],
        ["doc_id", "text"],
    )
    fps = D.winnow_fingerprints(df, k=8, window=4)
    by_doc = {
        i: {r.fingerprint for r in fps.where(F.col("doc_id") == i).collect()}
        for i in (1, 2, 3)
    }
    assert by_doc[1] & by_doc[2]            # shared substring detected
    assert not (by_doc[1] & by_doc[3] & by_doc[2] & by_doc[3])


def test_simhash_identical_and_disjoint(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "ALPHA  beta GAMMA"), (3, "x1 y2 z3 w4 v5 u6")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r.simhash for r in D.simhash_table(df).collect()}
    assert rows[1] == rows[2]
    assert 0 <= rows[1] < 2 ** 16
    assert rows[1] != rows[3]


# ----------------------------------------------------------- similarity

def test_cosine_topk_identical_vector_first(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[2.0, 0.0, 0.0]),   # same direction as 0
        Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),
        Row(vec_id=3, embedding=[0.9, 0.1, 0.0]),
    ]
    df = spark.createDataFrame(rows)
    top = S.cosine_topk(df.where("vec_id = 0"), df, k=2).orderBy("rank").collect()
    assert top[0].neighbor_id == 1 and abs(top[0].sim - 1.0) < 1e-6
    assert top[1].neighbor_id == 3


def test_lsh_bucket_deterministic(spark):
    rows = [Row(vec_id=i, embedding=[float(i + j) for j in range(8)]) for i in range(4)]
    df = spark.createDataFrame(rows)
    b = S.lsh_bucket_udf(3, 8)
    got1 = [r.b for r in df.select(b(F.col("embedding")).alias("b")).collect()]
    got2 = [r.b for r in df.select(b(F.col("embedding")).alias("b")).collect()]
    assert got1 == got2
    assert all(0 <= x < 8 for x in got1)


def test_trained_ivf_centroids_improve_or_match_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id < 5")
    exact = {(r.query_id, r.neighbor_id) for r in S.cosine_topk(q, emb, 3).collect()}
    cents = S.train_ivf_centroids(emb, nlist=4, iterations=1)
    assert len(cents) == 4 and len(cents[0]) == 64
    got = S.ivf_topk(q, emb, cents, k=3, nlist=4, nprobe=2)
    pairs = {(r.query_id, r.neighbor_id) for r in got.collect()}
    # sane recall from trained cells (nprobe=2 of 4 cells)
    assert len(pairs & exact) / len(exact) >= 0.5
    # deterministic: training twice gives identical centroids
    assert cents == S.train_ivf_centroids(emb, nlist=4, iterations=1)


def test_near_dup_multitable_superset(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    one = {(r.a, r.b) for r in S.embedding_near_dup_pairs(
        emb, threshold=-1.0, num_planes=4, num_tables=1).collect()}
    three = {(r.a, r.b) for r in S.embedding_near_dup_pairs(
        emb, threshold=-1.0, num_planes=4, num_tables=3).collect()}
    # OR-amplification can only add candidate pairs (table 0 is shared)
    assert one <= three
    assert len(three) > len(one)


def test_plane_matrix_matches_column_formula(spark):
    mat = S.plane_matrix(2, 3)
    df = spark.range(1)
    cols = [S._plane_component(p, d).alias(f"c{p}_{d}") for p in range(2) for d in range(3)]
    row = df.select(*cols).first()
    flat = [row[f"c{p}_{d}"] for p in range(2) for d in range(3)]
    expected = [mat[p][d] for p in range(2) for d in range(3)]
    assert flat == pytest.approx(expected, abs=1e-12)


# ----------------------------------------------------------------- asof

def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 100, 10.0), (1, 205, 20.0), (2, 50, 30.0)], ["k", "t", "x"]
    ).select("k", F.col("t").cast("timestamp").alias("t"), "x")
    right = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (2, 60, "c")], ["k", "rt", "payload"]
    ).select("k", F.col("rt").cast("timestamp").alias("rt"), "payload")
    out = asof_join(left, right, on="k", left_time="t", right_time="rt",
                    payload=["payload"]).orderBy("k", "t").collect()
    # t=100 matches rt=100 (inclusive); t=205 matches rt=200; t=50 has no match
    assert [r.payload for r in out] == ["a", "b", None]


# ------------------------------------------------------------ sessions

def test_sessionize_gap_splits(spark):
    df = spark.createDataFrame(
        [(1, 0), (1, 60), (1, 4000), (2, 0)], ["user_id", "sec"]
    ).select("user_id", F.col("sec").cast("timestamp").alias("ts"))
    s = sessionize(df, gap_minutes=30.0).orderBy("user_id", "ts").collect()
    assert [r.session_no for r in s] == [1, 1, 2, 1]
    stats = session_stats(df, gap_minutes=30.0).orderBy("user_id", "session_no").collect()
    assert [(r.user_id, r.session_no, r.n_events, r.span_s) for r in stats] == [
        (1, 1, 2, 60), (1, 2, 1, 0), (2, 1, 1, 0)
    ]


# ----------------------------------------------------------------- skew

def test_replicated_salt_join_equals_plain_join(spark):
    from flink_commons_spark.operators.skew import replicated_salt_join, salted_sum_count

    left = spark.createDataFrame(
        [(1, i) for i in range(50)] + [(2, 99)], ["k", "v"]
    )
    right = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unused")], ["k", "name"])
    plain = sorted((r.k, r.v, r.name) for r in left.join(right, "k").collect())
    salted = sorted(
        (r.k, r.v, r.name)
        for r in replicated_salt_join(left, right, "k", buckets=4, salt_source="v").collect()
    )
    assert salted == plain

    agg = {r.k: (r.total, r.n) for r in
           salted_sum_count(left, ["k"], "v", salt_source="v", buckets=4).collect()}
    assert agg == {1: (sum(range(50)), 50), 2: (99.0, 1)}


# ----------------------------------------------------------- multimodal

def test_multimodal_feature_shape_and_determinism(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "world")], ["doc_id", "text"])
    binary = MM.attach_binary(df)
    feats = MM.extract_features(binary, dims=16)
    rows = {r.id: r for r in feats.collect()}
    assert rows[1].n_bytes == 5
    assert len(rows[1].feature) == 16
    assert all(0.0 <= f <= 1.0 for f in rows[1].feature)
    # deterministic across runs
    again = {r.id: r.feature for r in MM.extract_features(binary, dims=16).collect()}
    assert again[1] == rows[1].feature and again[2] == rows[2].feature


def test_multimodal_decode_stub_raises(spark):
    df = spark.createDataFrame([(1, "hello")], ["doc_id", "text"])
    feats = MM.extract_features(MM.attach_binary(df), dims=4, decode_stub=False)
    with pytest.raises(Exception, match="NotImplementedError|real codecs"):
        feats.collect()


def test_frame_sample_fanout(spark):
    df = spark.createDataFrame([(1, "0123456789abcdefghij")], ["doc_id", "text"])
    frames = MM.frame_sample(MM.attach_binary(df), every_n=10).collect()
    assert len(frames) == 2
    assert sorted(f.frame_no for f in frames) == [0, 1]


def test_connected_components_multi_hop(spark):
    """A 4-node chain needs >1 propagation round; labels converge to the
    component minimum. Second component and ordering checked too."""
    from flink_commons_spark.operators.graph import connected_components, dup_clusters

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], ["a", "b"]
    )
    labels = {r.node: r.label for r in connected_components(edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    clusters = {
        r.cluster_id: (r.n_docs, r.max_doc) for r in dup_clusters(edges).collect()
    }
    assert clusters == {1: (4, 4), 10: (2, 11)}


def test_pagerank_matches_integer_reference(spark):
    """Distributed PageRank equals a pure-python integer replica on an
    asymmetric 3-node graph (one dangling node, one 2-out hub)."""
    from flink_commons_spark.operators.graph import pagerank

    # A -> B, A -> C, B -> C; C dangling
    nodes_py = [1, 2, 3]
    edges_py = [(1, 2), (1, 3), (2, 3)]
    scale, n, iters = 10**12, 3, 5
    base = (scale * 3) // (20 * n)
    outdeg = {1: 2, 2: 1}
    ranks = {v: scale // n for v in nodes_py}
    for _ in range(iters):
        incoming = {v: 0 for v in nodes_py}
        for s, d in edges_py:
            incoming[d] += ranks[s] // outdeg[s]
        ranks = {v: base + (incoming[v] * 17) // 20 for v in nodes_py}

    nodes = spark.createDataFrame([(v,) for v in nodes_py], ["node"])
    edges = spark.createDataFrame(edges_py, ["src", "dst"])
    got = {r.node: r.rank_micro for r in pagerank(nodes, edges).collect()}
    assert got == ranks
    # rank mass ordering: sink C > hub-fed B > source A
    assert got[3] > got[2] > got[1]


def test_bfs_distances_chain_and_unreachable(spark):
    """Directed chain 1→2→3 with isolated node 9: hop counts 0/1/2 and
    -1 for the unreachable node; direction respected (nothing reaches
    back to the source)."""
    from flink_commons_spark.operators.graph import bfs_distances

    nodes = spark.createDataFrame([(1,), (2,), (3,), (9,)], ["node"])
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 2)], ["src", "dst"])
    sources = spark.createDataFrame([(1,)], ["node"])
    got = {r.nation_key if hasattr(r, "nation_key") else r.node: r.hops
           for r in bfs_distances(nodes, edges, sources).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 9: -1}
    # r14: local_threshold=0 forces the distributed rounds — same map
    dist = {r.node: r.hops
            for r in bfs_distances(nodes, edges, sources,
                                   local_threshold=0).collect()}
    assert dist == got


def test_bfs_local_matches_distributed(spark):
    """The r14 single-task BFS twin must agree with the distributed
    rounds on a seeded random directed graph, including the edge case
    the distributed union creates: a reached dst that is NOT in the
    node set still gets an output row."""
    from flink_commons_spark.operators.graph import bfs_distances

    import random

    rng = random.Random(21)
    edges_py = [(rng.randrange(40), rng.randrange(48)) for _ in range(70)]
    nodes = spark.createDataFrame([(v,) for v in range(40)], ["node"])
    edges = spark.createDataFrame(edges_py, ["src", "dst"])
    sources = spark.createDataFrame([(0,), (7,)], ["node"])
    local = {r.node: r.hops
             for r in bfs_distances(nodes, edges, sources).collect()}
    dist = {r.node: r.hops
            for r in bfs_distances(nodes, edges, sources,
                                    local_threshold=0).collect()}
    assert local == dist


def test_pagerank_local_matches_distributed(spark):
    """The r14 single-task PageRank twin must be bit-identical to the
    distributed rounds (exact integer micro-units) on a seeded random
    graph with dangling nodes and edges pointing outside the node
    set."""
    from flink_commons_spark.operators.graph import pagerank

    import random

    rng = random.Random(34)
    edges_py = list({(rng.randrange(30), rng.randrange(34))
                     for _ in range(60)})
    nodes = spark.createDataFrame([(v,) for v in range(30)], ["node"])
    edges = spark.createDataFrame(edges_py, ["src", "dst"])
    local = {r.node: r.rank_micro for r in pagerank(nodes, edges).collect()}
    dist = {r.node: r.rank_micro
            for r in pagerank(nodes, edges, local_threshold=0).collect()}
    assert local == dist


def test_graph_single_task_exact_beyond_2e53(spark):
    """ADVICE r15: the tagged union used to NULL-pad column b, which
    float64-ified it on the Arrow→pandas hop and silently rounded node
    ids ≥ 2^53 inside the single-task twins. With the self-pad, ids in
    that range must round-trip exactly and match the distributed
    path."""
    from flink_commons_spark.operators.graph import bfs_distances, pagerank

    big = 2**53  # 9007199254740992: big+1 is NOT representable in f64
    ids = [big + 1, big + 3, big + 5]
    nodes = spark.createDataFrame([(v,) for v in ids], "node long")
    edges = spark.createDataFrame(
        [(ids[0], ids[1]), (ids[1], ids[2])], "src long, dst long"
    )
    sources = spark.createDataFrame([(ids[0],)], "node long")
    local = {r.node: r.hops
             for r in bfs_distances(nodes, edges, sources).collect()}
    assert local == {ids[0]: 0, ids[1]: 1, ids[2]: 2}
    dist = {r.node: r.hops
            for r in bfs_distances(nodes, edges, sources,
                                   local_threshold=0).collect()}
    assert local == dist
    pr_l = {r.node: r.rank_micro for r in pagerank(nodes, edges).collect()}
    pr_d = {r.node: r.rank_micro
            for r in pagerank(nodes, edges, local_threshold=0).collect()}
    assert pr_l == pr_d and set(pr_l) == set(ids)


def test_pagerank_duplicate_node_ids_fall_through(spark):
    """ADVICE r15: duplicate node ids crash the single-task twin's
    pd.Index path; the gate must detect them and fall through to the
    distributed loop, so duplicate-id inputs return the loop's answer
    under the default threshold instead of raising."""
    from flink_commons_spark.operators.graph import pagerank

    nodes = spark.createDataFrame(
        [(1,), (2,), (2,), (3,)], "node long"
    )
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = sorted(
        (r.node, r.rank_micro) for r in pagerank(nodes, edges).collect()
    )
    want = sorted(
        (r.node, r.rank_micro)
        for r in pagerank(nodes, edges, local_threshold=0).collect()
    )
    assert got == want


def test_connected_components_non_convergence_raises(spark):
    from flink_commons_spark.operators.graph import connected_components

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["a", "b"])
    import pytest as _pytest

    # local_threshold=0 forces the distributed propagation loop — the
    # r14 size gate would otherwise solve this 3-edge graph in one task
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1, local_threshold=0)


# ----------------------------------------------------- split & packing

def test_hash_split_deterministic_and_fractioned(spark):
    from flink_commons_spark.operators.sampling import with_split

    df = spark.range(0, 10000).withColumnRenamed("id", "doc_id")
    s = with_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    # md5 buckets: within ~3% of the requested fractions at n=10000
    assert abs(counts["train"] / 10000 - 0.8) < 0.03
    assert abs(counts["val"] / 10000 - 0.1) < 0.03
    # pure function of the key: same assignment on rerun and on a subset
    s2 = with_split(df.where("doc_id < 100"), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    full = {r.doc_id: r.split for r in s.where("doc_id < 100").collect()}
    sub = {r.doc_id: r.split for r in s2.collect()}
    assert full == sub

    with pytest.raises(ValueError, match="sum to 1.0"):
        with_split(df, "doc_id", {"a": 0.5, "b": 0.2})


def test_pack_into_bins_budget_bound(spark):
    from flink_commons_spark.operators.packing import pack_into_bins, pack_stats

    rows = [(i, 100 + (i % 7) * 50) for i in range(200)]  # 100..400 tokens
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    packed = pack_into_bins(df, budget=1000, shards=4)
    stats = pack_stats(df, budget=1000, shards=4).collect()
    # every bin except a shard's last is filled past budget - max_doc + 1
    last_bin = {r.shard: r.bin for r in packed.groupBy("shard").agg(F.max("bin").alias("bin")).collect()}
    for r in stats:
        if r.bin != last_bin[r.shard]:
            assert r.sum_tokens >= 1000 - 400 + 1
    # deterministic rerun
    a = sorted((r.shard, r.bin, r.n_docs) for r in stats)
    b = sorted(
        (r.shard, r.bin, r.n_docs)
        for r in pack_stats(df, budget=1000, shards=4).collect()
    )
    assert a == b


# -------------------------------------------------------- interval join

def test_interval_join_bounds_and_plan(spark):
    from flink_commons_spark.operators.interval import interval_join

    left = spark.createDataFrame(
        [(1, 1000, "L1"), (1, 5000, "L2"), (2, 1000, "L3")], ["k", "t", "lname"]
    ).select("k", F.col("t").cast("timestamp").alias("t"), "lname")
    right = spark.createDataFrame(
        [(1, 1000, "R@0"), (1, 1010, "R@10"), (1, 1011, "R@11"), (2, 990, "Rpast")],
        ["k", "rt", "rname"],
    ).select("k", F.col("rt").cast("timestamp").alias("rt"), "rname")

    out = interval_join(
        left, right, on="k", left_ts="t", right_ts="rt",
        lower_s=0.0, upper_s=10.0, payload=["rname"],
    )
    got = sorted((r.lname, r.rname) for r in out.collect())
    # inclusive [t, t+10]: L1 matches R@0 and R@10, NOT R@11; L3 matches
    # nothing (Rpast is before); each pair appears exactly once
    assert got == [("L1", "R@0"), ("L1", "R@10")]

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_interval_join_matches_naive_theta_join(spark):
    """Property check: the bucketed interval join equals the naive
    theta-join on randomized-ish small data (seeded, multiple keys,
    boundary timestamps)."""
    from flink_commons_spark.operators.interval import interval_join

    left_rows = [(k, 1000 + 13 * i + k, f"L{k}_{i}") for k in (1, 2, 3) for i in range(20)]
    right_rows = [(k, 995 + 7 * j + 2 * k, f"R{k}_{j}") for k in (1, 2, 3) for j in range(30)]
    left = spark.createDataFrame(left_rows, ["k", "t", "lname"]).select(
        "k", F.col("t").cast("timestamp").alias("t"), "lname"
    )
    right = spark.createDataFrame(right_rows, ["k", "rt", "rname"]).select(
        "k", F.col("rt").cast("timestamp").alias("rt"), "rname"
    )
    for lower, upper in [(0.0, 10.0), (5.0, 17.0), (-4.0, 4.0)]:
        got = {
            (r.lname, r.rname)
            for r in interval_join(
                left, right, on="k", left_ts="t", right_ts="rt",
                lower_s=lower, upper_s=upper, payload=["rname"],
            ).collect()
        }
        lo_us, hi_us = int(lower * 1e6), int(upper * 1e6)
        naive = {
            (r.lname, r.rname)
            for r in left.join(right, "k")
            .where(
                (F.expr("unix_micros(cast(rt as timestamp))")
                 >= F.expr("unix_micros(cast(t as timestamp))") + lo_us)
                & (F.expr("unix_micros(cast(rt as timestamp))")
                   <= F.expr("unix_micros(cast(t as timestamp))") + hi_us)
            )
            .collect()
        }
        assert got == naive, f"bounds ({lower},{upper})"


def test_connected_components_matches_union_find(spark):
    """Property check vs a driver-side union-find on a seeded random
    graph (64 nodes, 80 edges — many components, some chains)."""
    from flink_commons_spark.operators.graph import connected_components

    import random

    rng = random.Random(7)
    edges = [(rng.randrange(64), rng.randrange(64)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(64))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    nodes_in_edges = {n for e in edges for n in e}
    for n in nodes_in_edges:
        root = find(n)
        expected.setdefault(root, set()).add(n)
    # canonical label = min member of the component
    want = {n: min(members) for members in expected.values() for n in members}

    df = spark.createDataFrame(edges, ["a", "b"])
    got = {r.node: r.label for r in connected_components(df).collect()}
    assert got == want


def test_star_contraction_handles_long_chain(spark):
    """A 200-node chain has diameter 199 — min-propagation needs 199
    rounds, the large-star/small-star contraction O(log d): it must
    converge within 12 rounds and label every node with the chain
    minimum."""
    from flink_commons_spark.operators.graph import connected_components_star

    edges = [(i, i + 1) for i in range(199)] + [(1000, 1001), (1001, 1002)]
    df = spark.createDataFrame(edges, ["a", "b"])
    got = {r.node: r.label for r in connected_components_star(
        df, max_iter=12, local_threshold=0).collect()}
    want = {i: 0 for i in range(200)} | {1000: 1000, 1001: 1000, 1002: 1000}
    assert got == want


def test_star_contraction_empty_edges(spark):
    """An EMPTY edge set must return an empty (node, label) frame, not
    crash: the first round's sum-probe is None on empty input, and a
    None-seeded ``prev`` used to send it into the structural fixpoint
    check before ``e_prev`` was ever assigned (UnboundLocalError)."""
    from pyspark.sql import types as T

    from flink_commons_spark.operators.graph import connected_components_star

    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.LongType())]
    )
    df = spark.createDataFrame([], schema)
    out = connected_components_star(df, local_threshold=0)
    assert out.columns == ["node", "label"]
    assert out.count() == 0


def test_star_contraction_matches_propagation(spark):
    """Both CC variants must produce identical (node, label) maps on a
    seeded random graph (shared contract: label = component min)."""
    from flink_commons_spark.operators.graph import (
        connected_components, connected_components_star,
    )

    import random

    rng = random.Random(13)
    edges = [(rng.randrange(48), rng.randrange(48)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["a", "b"])
    # local_threshold=0 keeps the distributed min-propagation loop
    # covered now that the default size-gates to the union-find task
    prop = {r.node: r.label for r in connected_components(
        df, local_threshold=0).collect()}
    star = {r.node: r.label for r in connected_components_star(
        df, local_threshold=0).collect()}
    assert star == prop
    # the size-gated single-task union-find fallback shares the contract
    local = {r.node: r.label for r in connected_components_star(df).collect()}
    assert local == prop
    # r14: connected_components carries the same size gate — its
    # defaulted (local) route must agree with its distributed loop
    gated = {r.node: r.label for r in connected_components(df).collect()}
    assert gated == prop


def test_star_contraction_string_ids_label_parity(spark):
    """Non-ASCII STRING ids: the size-gated union-find must pick the
    same component representative as the star-contraction path, which
    uses Spark's UTF-8-binary min() — the local side now takes the min
    over UTF-8-encoded bytes (the round-8 ADVICE label-choice note)."""
    from flink_commons_spark.operators.graph import (
        connected_components_star,
    )

    # mixed-script ids within one component; representative = the
    # UTF-8-binary minimum ("a1" — ASCII sorts below all multi-byte)
    edges = [
        ("éclair", "a1"), ("a1", "Ω-node"), ("Ω-node", "ß2"),
        ("日本", "中文"),
    ]
    df = spark.createDataFrame(edges, ["a", "b"])
    star = {r.node: r.label for r in connected_components_star(
        df, local_threshold=0).collect()}
    local = {r.node: r.label for r in connected_components_star(df).collect()}
    assert local == star
    assert local["éclair"] == "a1"
    assert local["日本"] == min("日本".encode(), "中文".encode()).decode()


def test_cc_local_mixed_null_ids_no_nan_labels(spark):
    """A string id column CONTAINING NULLS reaches _cc_local as a mixed
    object column (str + None). The UTF-8 encode path would map None to
    NaN and could silently hand a component a NaN label — the all-str
    gate must route such input to the generic branch: every emitted
    label is a real string and component labels stay correct."""
    from flink_commons_spark.operators.graph import connected_components_star

    df = spark.createDataFrame(
        [("b", "c"), ("a", None), ("x", "a")], "a string, b string"
    )
    got = {r.node: r.label for r in connected_components_star(df).collect()}
    assert all(isinstance(v, str) for v in got.values()), got
    assert got["b"] == "b" and got["c"] == "b"
    assert got["x"] == "a" and got["a"] == "a"


# ------------------------------------------------------------- sketches

def test_hll_sketch_rollup_accuracy(spark):
    """Mergeable-sketch distinct counts: per-group and union-rollup
    estimates within HLL tolerance of exact, from ONE sketch build."""
    from flink_commons_spark.operators.sketches import (
        estimate, rollup_estimates, sketch_by_group,
    )

    df = spark.range(20000).select(
        (F.col("id") % 4).alias("g"),
        (F.col("id") % 2).alias("g2"),
        (F.col("id") % 977).alias("u"),
    )
    sk = sketch_by_group(df, ["g", "g2"], "u")
    fine = {(r.g, r.g2): r.distinct_est for r in estimate(sk, ["g", "g2"]).collect()}
    coarse = {r.g2: r.distinct_est for r in rollup_estimates(sk, ["g", "g2"], ["g2"]).collect()}

    exact_fine = {
        (r.g, r.g2): r.n
        for r in df.groupBy("g", "g2").agg(F.countDistinct("u").alias("n")).collect()
    }
    exact_coarse = {
        r.g2: r.n
        for r in df.groupBy("g2").agg(F.countDistinct("u").alias("n")).collect()
    }
    for k, est in fine.items():
        assert abs(est - exact_fine[k]) <= max(3, 0.05 * exact_fine[k])
    for k, est in coarse.items():
        assert abs(est - exact_coarse[k]) <= max(3, 0.05 * exact_coarse[k])


# ------------------------------------------------------- global ranking

def test_global_ntile_matches_window_ntile(spark):
    """Distributed ntile (range exchange + offsets) must equal the
    single-window SQL ntile for several k, incl. uneven buckets."""
    from pyspark.sql import Window
    from flink_commons_spark.operators.rank import global_ntile, global_row_number

    df = spark.range(0, 1003).select(
        F.col("id"), ((F.col("id") * 37) % 101).alias("v")
    )
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    for k in (3, 10, 7):
        want = {
            r.id: r.nt
            for r in df.withColumn("nt", F.ntile(k).over(w)).collect()
        }
        got = {
            r.id: r.ntile
            for r in global_ntile(df, ["v", "id"], k, num_partitions=8).collect()
        }
        assert got == want, f"k={k}"

    rn = {r.id: r.rn for r in global_row_number(df, ["v", "id"], 8).collect()}
    want_rn = {
        r.id: r.rn
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert rn == want_rn


def test_multimodal_resize_and_audio_windows(spark):
    """Resize emits fixed-size payloads with dimension metadata; audio
    windowing fans out one row per window with bounded energy — both
    deterministic across runs (stubbed codecs, real plumbing)."""
    from flink_commons_spark.operators.multimodal import (
        attach_binary, audio_window_features, resize_images,
    )

    df = spark.createDataFrame(
        [(1, "short"), (2, "a considerably longer text payload for windows")],
        ["doc_id", "text"],
    )
    b = attach_binary(df)

    resized = resize_images(b, width=8, height=4).collect()
    assert {r.id for r in resized} == {1, 2}
    assert all(len(r.payload) == 32 and r.width == 8 and r.height == 4 for r in resized)
    again = resize_images(b, width=8, height=4).collect()
    assert {bytes(r.payload) for r in resized} == {bytes(r.payload) for r in again}

    wins = audio_window_features(b, window_bytes=16).collect()
    per_id = {}
    for r in wins:
        per_id.setdefault(r.id, []).append((r.window_no, r.energy))
        assert 0.0 <= r.energy <= 1.0
    assert len(per_id[2]) > len(per_id[1])  # longer payload → more windows
    assert [w for w, _ in sorted(per_id[2])] == list(range(len(per_id[2])))


def test_quantize_embedding_roundtrip(spark):
    from pyspark.sql import Row
    from flink_commons_spark.operators.similarity import with_quantized

    rows = [
        Row(vec_id=1, embedding=[1.0, -0.5, 0.25, 0.0]),
        Row(vec_id=2, embedding=[0.0, 0.0, 0.0, 0.0]),  # zero vector
    ]
    out = {r.vec_id: r for r in with_quantized(spark.createDataFrame(rows)).collect()}
    assert out[1].q == [127, -63, 32, 0]          # floor(x*127+0.5)
    assert out[2].q == [0, 0, 0, 0] and out[2].qerr == 0.0
    assert all(-127 <= x <= 127 for x in out[1].q)
    assert 0.0 <= out[1].qerr < 0.01              # <= 0.5/127 per dim


def test_pq_codes_reconstruct_seeds_exactly(spark):
    """A vector that IS a seed codeword must quantize to its own code
    in every subspace with zero reconstruction error."""
    from flink_commons_spark.operators.similarity import pq_codebooks, with_pq_codes
    from pyspark.sql import functions as F

    rows = [(i, [float(i * 64 + d) for d in range(64)]) for i in range(16)]
    d = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cbs = pq_codebooks(d, m=8, ksub=16, dims=64)
    assert len(cbs) == 8 and len(cbs[0]) == 16 and len(cbs[0][0]) == 8
    out = {r["vec_id"]: r for r in with_pq_codes(d, cbs).collect()}
    for i in (0, 7, 15):
        assert out[i]["pq_codes"] == [i] * 8
        assert out[i]["pq_err"] == 0.0


def test_pq_adc_topk_ranks_by_reconstruction_distance(spark):
    """ADC distance to a seed vector's own codes must be 0, so each
    seed's nearest PQ neighbor set starts with distance 0 (its exact
    duplicate under the codebooks)."""
    from flink_commons_spark.operators.similarity import pq_codebooks, pq_adc_topk

    rows = [(i, [float(i * 64 + d) for d in range(64)]) for i in range(16)]
    # vec 100 duplicates vec 0: ADC distance 0 at rank 1 for query 0
    rows.append((100, [float(d) for d in range(64)]))
    d = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cbs = pq_codebooks(d, m=8, ksub=16, dims=64)
    top = pq_adc_topk(d.where("vec_id = 0"), d, cbs, k=3).collect()
    assert top[0]["neighbor_id"] == 100 and top[0]["dist"] == 0.0
    assert [r["rank"] for r in top] == [1, 2, 3]


def test_train_pq_codebooks_reduces_reconstruction_error(spark):
    """One Lloyd iteration must not increase total quantization error
    (k-means monotonicity), and codebook shapes are preserved."""
    from pyspark.sql import functions as F
    from flink_commons_spark.operators.similarity import (
        pq_codebooks, train_pq_codebooks, with_pq_codes,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    seeded = pq_codebooks(emb)
    trained = train_pq_codebooks(emb, iterations=1)
    assert len(trained) == 8 and len(trained[0]) == 16 and len(trained[0][0]) == 8

    def total_err(cbs):
        return with_pq_codes(emb, cbs).agg(F.sum("pq_err")).collect()[0][0]

    assert total_err(trained) <= total_err(seeded) + 1e-6


def test_views_trainer_bit_identical_to_joint(spark):
    """The fused single-scan views trainer (round 13 — one Arrow pass
    over a SHARED corpus, per-view permutation applied in numpy) must
    produce codebooks BIT-IDENTICAL to the joint trainer run over the
    materialized permuted corpora, for 1 and 2 Lloyd iterations — the
    property that lets pq_opq_recall swap trainers with its DuckDB
    oracle unchanged."""
    from flink_commons_spark.operators.similarity import (
        permute_dims, seed_codebooks_from_vectors,
        train_pq_codebook_views, train_pq_codebooks_joint,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).localCheckpoint(eager=False)
    perm = list(range(63, -1, -1))  # a fixed nontrivial permutation
    seed_vecs = [
        list(r[0])
        for r in emb.orderBy("vec_id").limit(16).select("embedding").collect()
    ]
    seeds_r = seed_codebooks_from_vectors(seed_vecs, m=8, ksub=16, dims=64)
    seeds_o = seed_codebooks_from_vectors(
        [[v[p] for p in perm] for v in seed_vecs], m=8, ksub=16, dims=64
    )
    emb_o = permute_dims(emb, perm)
    for iters in (1, 2):
        joint = train_pq_codebooks_joint(
            {"o": (emb_o, seeds_o), "r": (emb, seeds_r)},
            m=8, ksub=16, dims=64, iterations=iters,
        )
        views = train_pq_codebook_views(
            emb, {"o": (perm, seeds_o), "r": (None, seeds_r)},
            m=8, ksub=16, dims=64, iterations=iters,
        )
        assert joint == views


def test_pq_rerank_recovers_exact_neighbors(spark):
    """The shortlist + exact-re-rank pass must return the TRUE nearest
    neighbors whenever they survive the ADC shortlist: with shortlist
    = corpus size, pq_rerank_topk degenerates to exact L2 top-k."""
    from flink_commons_spark.operators.similarity import (
        l2_topk, pq_codebooks, pq_rerank_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    cbs = pq_codebooks(emb)
    probes = emb.where("vec_id < 3")
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in l2_topk(probes, emb, k=3).collect()
    }
    rer = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in pq_rerank_topk(probes, emb, cbs, k=3, shortlist=n).collect()
    }
    assert rer == exact


def test_binary_codes_and_hamming(spark):
    """Sign-bit packing: identical vectors have Hamming 0; a vector
    with one flipped dim has Hamming 1, regardless of which half."""
    from flink_commons_spark.operators.similarity import hamming_topk

    base = [1.0] * 64
    flip5 = list(base); flip5[5] = -1.0       # low half
    flip40 = list(base); flip40[40] = -1.0    # high half
    d = spark.createDataFrame(
        [(0, base), (1, list(base)), (2, flip5), (3, flip40)],
        ["vec_id", "embedding"],
    )
    top = hamming_topk(d.where("vec_id = 0"), d, k=3).collect()
    got = {r["neighbor_id"]: r["ham"] for r in top}
    assert got == {1: 0, 2: 1, 3: 1}
    assert [r["rank"] for r in top] == [1, 2, 3]


def test_opq_grouping_recovers_scattered_subspaces(spark):
    """The correlation grouping must recover the clustered corpus's
    original subspaces from the fixed _OPQ_SIGMA scatter, in the same
    canonical form the oracle's literal permutation states — and
    permute_dims must be a pure index remap."""
    from flink_commons_spark import catalog as C
    from flink_commons_spark.operators import similarity as S

    emb_s = C._scattered_embeddings(spark, "/root/testdata/sf0.001")
    perm = S.group_dims_by_correlation(emb_s, m=8, dims=64)
    assert perm == C._opq_tau()
    # canonical shape: blocks ascending inside, sorted by min
    blocks = [perm[i * 8:(i + 1) * 8] for i in range(8)]
    assert all(b == sorted(b) for b in blocks)
    assert [b[0] for b in blocks] == sorted(b[0] for b in blocks)
    # permute_dims: output dim i reads input dim perm[i]
    row_s = emb_s.where("vec_id = 3").collect()[0]["embedding"]
    row_o = (
        S.permute_dims(emb_s, perm).where("vec_id = 3").collect()[0]["embedding"]
    )
    assert row_o == [row_s[p] for p in perm]


def test_exact_jaccard_collapsed_matches_raw(spark):
    """Clone-collapsed truth must be row-identical to the raw inverted
    index on a corpus with real clone families and near-dup classes."""
    from pyspark.sql import functions as F

    from flink_commons_spark.operators import dedup as D

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # clone of 1
        (3, "the quick brown fox jumps over the lazy cat"),   # near-dup
        (4, "completely different text with other words entirely here"),
        (5, "completely different text with other words entirely here"),
        (6, ""),                                               # empty text
        (7, ""),                                               # clone, empty set
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    raw = {
        (r.a, r.b)
        for r in D.exact_jaccard_pairs(
            D.shingle_table(d), threshold=0.5
        ).collect()
    }
    collapsed = {
        (r.a, r.b)
        for r in D.exact_jaccard_pairs_collapsed(d, threshold=0.5).collect()
    }
    assert collapsed == raw
    assert (1, 2) in collapsed and (4, 5) in collapsed
    assert (1, 3) in collapsed and (2, 3) in collapsed  # class expansion
