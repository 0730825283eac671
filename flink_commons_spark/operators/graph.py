"""Distributed graph operators for dedup-cluster formation.

Near-dup pair generation (MinHash-LSH / SimHash / embedding buckets)
yields an edge list; turning pairs into DUP CLUSTERS — "these 17
documents are all the same article" — is a connected-components
problem, and the canonical-document choice is the component's minimum
id. This is the step after pair mining in every production
training-data dedup pipeline.

Scale posture: iterative min-label propagation — per iteration one
join (labels to neighbors) and one min-aggregate, both shuffling on
the node id; no driver-side graph state (the driver sees only a
1-row convergence counter per iteration). Iteration count is the
graph diameter; near-dup clusters are dense and shallow (diameter ≤
~3), so the loop converges in a handful of passes even at 100 TB.
Lineage is cut every iteration with an eager ``localCheckpoint`` so
plans don't grow exponentially. For billion-edge general graphs one
would add the large-star/small-star contraction; for dedup-shaped
graphs plain propagation is the right cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 20,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Connected components of an undirected edge list.

    Returns (node, label) where ``label`` is the component's minimum
    node id — deterministic, so results are oracle-checkable.
    Converges in O(component diameter) iterations; raises if
    ``max_iter`` passes don't reach a fixpoint (pathological chain —
    raise the bound or pre-contract).

    Edge sets at or below ``local_threshold`` rows (no-null ids)
    short-circuit to :func:`_cc_local` — the same single-task
    union-find cutoff :func:`connected_components_star` documents:
    below that size the per-hop keyed join + min-aggregate rounds are
    pure per-round plan/scheduler cost, not data cost (r14 bench: the
    sf0.1 dedup-cluster graph is ~5k edges and the propagation loop's
    ~12 jobs were >2/3 of the query's wall time). Identical labels by
    construction — component minimum either way (the star path's
    A/B-pinned parity applies verbatim). ``local_threshold=0`` forces
    the distributed loop (tests pin the loop semantics through it).
    """
    spark = edges.sparkSession
    # constraint propagation off while the iterative plans are
    # DEFINED: pure analyzer cost on this loop shape (see the note in
    # :func:`connected_components_star`); restored in the finally
    cp_key = "spark.sql.constraintPropagation.enabled"
    cp_prev = spark.conf.get(cp_key, "true")
    spark.conf.set(cp_key, "false")
    try:
        # materialize the edge list once — its lineage (e.g. a full
        # MinHash-LSH pipeline) must not be re-executed every
        # iteration. Lazy: the initial label-sum probe below triggers
        # it, so the checkpoint doesn't cost a job of its own.
        edges = edges.select(
            F.col(src).alias("u"), F.col(dst).alias("v")
        ).localCheckpoint(eager=False)
        if local_threshold:
            from pyspark.sql import types as T

            # width-aware gate as in connected_components_star: string
            # ids are an order of magnitude wider per row
            numeric_ids = isinstance(edges.schema["u"].dataType, T.NumericType)
            cap = local_threshold if numeric_ids else max(
                1, local_threshold // 8
            )
            probe = edges.limit(cap + 1).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    (F.col("u").isNull() | F.col("v").isNull()).cast("int")
                ).alias("nn"),
            ).first()
            # null endpoints take the distributed path (the min-
            # aggregates' null handling is the defined behavior there;
            # pair-mining ids are never null, so this probe is the
            # checkpoint materializer and nothing else)
            if int(probe["n"]) <= cap and not int(probe["nn"] or 0):
                return _cc_local(edges)
        nodes = (
            edges.select(F.col("u").alias("node"))
            .union(edges.select(F.col("v").alias("node")))
            .distinct()
        )
        labels = nodes.withColumn("label", F.col("node"))
        adj = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # min-propagation is monotone (labels only ever decrease), so
        # the label SUM is a fixpoint detector: one tiny aggregate job
        # per iteration instead of a join + filter + count probe.
        # decimal(38,0) keeps the sum exact at any node-count ×
        # id-range scale.
        prev_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).first()[0]
        for _ in range(max_iter):
            nbr = adj.join(
                labels.withColumnRenamed("node", "v"), "v"
            ).select(F.col("u").alias("node"), "label")
            new_labels = (
                labels.union(nbr)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
            )
            # lazy checkpoint: the convergence probe right after is the
            # materializing action — one job per iteration, not two
            new_labels = new_labels.localCheckpoint(eager=False)
            cur_sum = new_labels.agg(
                F.sum(F.col("label").cast("decimal(38,0)"))
            ).first()[0]
            labels = new_labels
            if cur_sum == prev_sum:
                return labels
            prev_sum = cur_sum
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )
    finally:
        spark.conf.set(cp_key, cp_prev)


def _canon_edges(e: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Canonical undirected edge set: (u < v), no self-loops, distinct."""
    return (
        e.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _node_mins(e: DataFrame) -> DataFrame:
    """(u, m) where m = min(neighborhood(u) ∪ {u})."""
    adj = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return (
        adj.groupBy("u")
        .agg(F.min("v").alias("__mn"))
        .select("u", F.least("u", "__mn").alias("m"))
    ), adj


def _large_star(e: DataFrame, node_mins: "DataFrame | None" = None) -> DataFrame:
    """Connect every STRICTLY LARGER neighbor of u to m(u).

    Output is canonically oriented but NOT deduplicated — the
    min-aggregates downstream are duplicate-insensitive and the
    following small-star pass re-distincts, so skipping the exchange
    here saves one shuffle per round. ``node_mins`` lets a caller that
    already aggregated (u, m) — e.g. the contraction loop's
    convergence probe — pass it in instead of paying the node-keyed
    aggregate twice per round."""
    if node_mins is None:
        m, adj = _node_mins(e)
    else:
        m = node_mins
        adj = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    out = (
        adj.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
    )
    return (
        out.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .where(F.col("u") != F.col("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect every not-larger neighbor of u — and u itself — to m(u)."""
    m, adj = _node_mins(e)
    nbr = (
        adj.join(m, "u")
        .where(F.col("v") < F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
    )
    own = m.select(F.col("u").alias("a"), F.col("m").alias("b"))
    return _canon_edges(nbr.union(own))


def _cc_local(e: DataFrame) -> DataFrame:
    """Single-pass union-find over the whole (small) edge set — one
    Arrow batch into pandas, O(E·α(E)), no iteration. The right cost
    below the size gate where the star contraction's ~2·log(d) keyed
    shuffle rounds are pure scheduler/plan overhead: a 2M-edge frame
    is ~32 MB in one task, while the round-based path costs ~14 jobs
    regardless of size. Same contract as the star path: (node, label),
    label = component minimum by value, nodes = edge endpoints."""
    t = e.schema["u"].dataType.simpleString()

    def uf(pdf):
        import numpy as np
        import pandas as pd

        both = pd.concat([pdf["u"], pdf["v"]], ignore_index=True)
        codes, uniq = pd.factorize(both)
        ne = len(pdf)
        parent = np.arange(len(uniq))

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(codes[:ne].tolist(), codes[ne:].tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        roots = np.fromiter(
            (find(i) for i in range(len(uniq))), dtype=np.int64
        )
        ser = pd.Series(uniq)
        if ser.dtype == object and len(ser) and pd.api.types.infer_dtype(
            ser, skipna=False
        ) == "string":
            # all-str gate (C-speed infer_dtype, not a Python loop over
            # up-to-millions of ids): a mixed object column (str +
            # None/bytes) must take the generic branch — .str.encode
            # maps non-str entries to NaN, which would silently become
            # a component's label
            # pick the representative by UTF-8 BYTE order — the same
            # ordering Spark's min() uses on strings in the star-
            # contraction path, so the label choice is identical on
            # whichever side of the size gate a graph lands (Python's
            # str min is code-point order; isomorphic for valid
            # Unicode, but byte order makes the parity self-evident
            # and covers bytes-typed ids uniformly)
            enc = ser.str.encode("utf-8")
            label = enc.groupby(roots).transform("min").str.decode("utf-8")
        else:
            label = ser.groupby(roots).transform("min")
        return pd.DataFrame({"node": ser, "label": label})

    return (
        e.withColumn("__cc_g", F.lit(0))
        .groupBy("__cc_g")
        .applyInPandas(uf, f"node {t}, label {t}")
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 30,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Connected components by LARGE-STAR/SMALL-STAR contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — the O(log d)-round variant for graphs whose diameter
    makes :func:`connected_components`' per-hop min-propagation
    (O(d) rounds) infeasible: long chains, lineage graphs, web link
    paths. Same contract: (node, label) with label = component min.

    Per round: the node-keyed min-aggregate is computed ONCE (lazily
    checkpointed), then serves as BOTH the convergence probe (its sum
    is monotone non-increasing — every rewire points at a smaller
    endpoint — so a flat sum gates the exact fixpoint check) and the
    large-star join side, followed by the small-star pass — no driver
    graph state, lineage cut with lazy localCheckpoints. Each pass at
    least halves star-free paths, so rounds are logarithmic in the
    longest chain rather than linear. Convergence is confirmed
    structurally (the canonical edge set reaches the star-forest
    fixpoint: unchanged count + empty difference); the sum probe only
    gates that check.

    Edge sets at or below ``local_threshold`` rows short-circuit to
    :func:`_cc_local` (single-task union-find): below that size the
    contraction's ~2·log(d) rounds are pure per-round plan/scheduler
    cost, not data cost — the canonical small-graph cutoff every
    distributed CC implementation carries. ``local_threshold=0``
    forces the contraction path (tests use it to pin the round
    semantics).
    """
    spark = edges.sparkSession
    # Catalyst's constraint propagation is quadratic-ish in the
    # join/filter chain each round re-analyzes; on this iterative plan
    # it was MEASURED as half the sf0.1 wall time (9.1 s -> 5.9 s with
    # it off, pure plan-definition cost, zero effect on the executed
    # plan — every join key here is explicitly non-null by
    # construction). Standard practice for iterative DataFrame
    # algorithms; restored in the finally.
    cp_key = "spark.sql.constraintPropagation.enabled"
    cp_prev = spark.conf.get(cp_key, "true")
    spark.conf.set(cp_key, "false")
    from pyspark.sql import types as T

    try:
        e = _canon_edges(edges, src, dst).localCheckpoint(eager=False)
        numeric_ids = isinstance(e.schema["u"].dataType, T.NumericType)
        if local_threshold:
            # width-aware gate: the row threshold assumes ~16-byte
            # numeric ids; string/binary ids (URLs, UUIDs) are an
            # order of magnitude wider, so the single-task cutoff
            # shrinks accordingly (2M longs ≈ 32 MB in one Arrow
            # batch; 250k 100-byte strings ≈ 25 MB)
            cap = local_threshold if numeric_ids else max(
                1, local_threshold // 8
            )
            if e.limit(cap + 1).count() <= cap:
                # the limit-probe doubles as the checkpoint materializer
                return _cc_local(e)
        nodes = (
            e.select(F.col("u").alias("node"))
            .union(e.select(F.col("v").alias("node")))
            .distinct()
            .localCheckpoint(eager=False)
        )

        # seed prev with a non-None sentinel and e_prev with the input:
        # on an EMPTY edge set round 1's sum-probe is None, and None ==
        # None would reach the structural check before e_prev was ever
        # assigned (UnboundLocalError). The sentinel never equals a
        # Decimal/None probe, so round 1 always assigns e_prev first.
        prev: object = object()
        e_prev = e
        for _ in range(max_iter):
            # one contraction round per materialization: fusing two
            # rounds per checkpoint was measured 2.6× SLOWER here —
            # Catalyst re-analysis of the doubled plan costs more than
            # the saved probe/checkpoint jobs on these tiny frames
            m, _adj = _node_mins(e)
            m = m.localCheckpoint(eager=False)
            # the exact-decimal sum is a cheap monotone convergence
            # gate for NUMERIC ids only; string/binary ids (no decimal
            # cast) skip the gate and run the structural fixpoint
            # check every round from round 2 — exact either way, the
            # probe only saves jobs
            cur = (
                m.agg(F.sum(F.col("m").cast("decimal(38,0)"))).first()[0]
                if numeric_ids else None
            )
            if cur == prev:
                # labels flat — but flat sums gate, they do not prove,
                # convergence: confirm the STRUCTURAL fixpoint exactly
                # against the previous round's edge set
                if e.count() == e_prev.count() and (
                    e.exceptAll(e_prev).limit(1).count() == 0
                ):
                    break
            e_prev, prev = e, cur
            e = _small_star(_large_star(e, node_mins=m)).localCheckpoint(
                eager=False
            )
        else:
            raise RuntimeError(
                f"connected_components_star did not converge in "
                f"{max_iter} rounds"
            )
    finally:
        spark.conf.set(cp_key, cp_prev)
    # at the fixpoint the edge set is a star forest: every node's
    # min(neighborhood ∪ self) IS its component minimum — and that is
    # exactly the final round's (already materialized) m frame
    mins = m.select(F.col("u").alias("node"), F.col("m").alias("__mn"))
    return nodes.join(mins, "node", "left").select(
        "node",
        F.coalesce("__mn", F.col("node")).alias("label"),
    )


def _graph_small_enough(
    nodes: DataFrame, edges: DataFrame, cap: int,
    extra: "DataFrame | None" = None,
    unique_nodes: bool = False,
) -> bool:
    """True when EVERY frame is at or below ``cap`` rows with no null
    ids — the iterative graph operators' single-task gate (one bounded
    limit-probe job per frame, same shape as the CC gates). Numeric-id
    graphs only; callers check the dtype.

    ``unique_nodes=True`` additionally requires the nodes frame's id
    column to be DUPLICATE-FREE within the probed window: the PageRank
    single-task twin indexes nodes with ``pd.Index.get_indexer``, which
    raises on a non-unique index, while the distributed loop tolerates
    duplicates — so duplicate-id inputs must fall through to the loop
    (ADVICE r14). Checked inside the same bounded probe aggregation."""
    frames = [(nodes, nodes.columns[:1], unique_nodes),
              (edges, edges.columns[:2], False)]
    if extra is not None:
        frames.append((extra, extra.columns[:1], False))
    for df, cols, uniq in frames:
        null_pred = None
        for c in cols:
            p = F.col(c).isNull()
            null_pred = p if null_pred is None else (null_pred | p)
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum(null_pred.cast("int")).alias("nn"),
        ]
        if uniq:
            aggs.append(F.count_distinct(F.col(cols[0])).alias("nd"))
        probe = df.limit(cap + 1).agg(*aggs).first()
        if int(probe["n"]) > cap or int(probe["nn"] or 0):
            return False
        if uniq and int(probe["nd"] or 0) != int(probe["n"]):
            return False
    return True


def _tagged_single_task(nodes: DataFrame, edges: DataFrame,
                        extra: "DataFrame | None", fn, out_schema: str,
                        id_type: str) -> DataFrame:
    """Ship (nodes ∪ edges [∪ extra]) into ONE task as a tagged union
    and apply ``fn(pdf) -> pdf`` — the iterative graph operators'
    small-graph path (single Arrow batch, no per-round scheduling).
    ``fn`` sees columns (k, a, b): k=0 node rows (a=id), k=1 edge rows
    (a=src, b=dst), k=2 extra rows (a=id). Non-edge rows SELF-PAD
    ``b = a`` instead of NULL: a nullable int64 column converts to
    float64 on the Arrow→pandas hop, and node ids ≥ 2^53 would then
    silently lose precision inside the twin while the distributed path
    keeps them exact (ADVICE r14). ``fn`` never reads ``b`` of k≠1
    rows, so the pad value is free."""
    self_b = F.col(nodes.columns[0]).cast(id_type).alias("b")
    tagged = nodes.select(
        F.lit(0).alias("k"), F.col(nodes.columns[0]).alias("a"), self_b
    ).unionByName(edges.select(
        F.lit(1).alias("k"),
        F.col(edges.columns[0]).alias("a"),
        F.col(edges.columns[1]).alias("b"),
    ))
    if extra is not None:
        tagged = tagged.unionByName(extra.select(
            F.lit(2).alias("k"),
            F.col(extra.columns[0]).alias("a"),
            F.col(extra.columns[0]).cast(id_type).alias("b"),
        ))
    return (
        tagged.withColumn("__gr_g", F.lit(0))
        .groupBy("__gr_g")
        .applyInPandas(lambda pdf: fn(pdf), out_schema)
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    scale: int = 10**12,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Fixed-iteration PageRank in exact integer arithmetic.

    Ranks are bigint micro-units (``scale`` = total mass), damping is
    the rational 17/20 (=0.85), and every division is integer ``DIV`` —
    so the result is bit-identical on any engine and any partitioning
    (float summation order can never perturb it). Per iteration: one
    join of ranks to edges (ranks side is |nodes| rows — broadcast) and
    one ``dst``-keyed sum; driver holds no graph state. Fixed iteration
    count keeps the lineage shallow (no checkpoint needed) and is the
    standard production choice (convergence-to-epsilon needs float
    ranks anyway).

    Returns ``(node, rank_micro)``; dangling-node mass is dropped, not
    redistributed, matching the straightforward textbook formulation.
    """
    nodes = nodes.select(F.col(node_col).alias("node"))
    edges = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    from pyspark.sql import types as T

    t = nodes.schema["node"].dataType.simpleString()
    if local_threshold and isinstance(
        nodes.schema["node"].dataType, T.NumericType
    ):
        # cut the edge lineage BEFORE probing: the gate probe is the
        # materializing action, so an expensive mined edge list (e.g.
        # the 4-way trade-graph join) is computed once, not once for
        # the probe and again for the single-task union
        edges = edges.localCheckpoint(eager=False)
    if (
        local_threshold
        and isinstance(nodes.schema["node"].dataType, T.NumericType)
        # unique_nodes: the twin's pd.Index(nd).get_indexer raises on
        # duplicate node ids where the distributed loop tolerates them
        # — duplicates fall through to the loop (ADVICE r14)
        and _graph_small_enough(
            nodes, edges, local_threshold, unique_nodes=True
        )
    ):
        # single-task twin (r14): below the gate the 5 rounds of
        # join + dst-keyed sum are pure per-round plan/scheduler cost.
        # Bit-identical by construction — the same integer micro-unit
        # arithmetic on the same frames, order-free (np.add.at sums
        # int64 exactly; DIV on positive ints == floor division), with
        # the distributed path's join semantics replicated: edges
        # whose src is not a node contribute nothing (inner rank
        # join), dst outside the node set is dropped (left join from
        # nodes), outdeg counts every edge of a src. Parity is pinned
        # by test_pagerank_local_matches_distributed.
        def _pr(pdf):
            import numpy as np
            import pandas as pd

            nd = pdf.loc[pdf.k == 0, "a"].to_numpy()
            es = pdf.loc[pdf.k == 1, "a"].to_numpy()
            ed = pdf.loc[pdf.k == 1, "b"].to_numpy()
            n = len(nd)
            idx = pd.Index(nd)
            sc = idx.get_indexer(es)
            dc = idx.get_indexer(ed)
            keep = sc >= 0
            outdeg = np.zeros(n, dtype=np.int64)
            np.add.at(outdeg, sc[keep], 1)
            s_idx, d_idx = sc[keep], dc[keep]
            od = outdeg[s_idx]
            in_nodes = d_idx >= 0
            base = (scale * 3) // (20 * n)
            ranks = np.full(n, scale // n, dtype=np.int64)
            for _ in range(iterations):
                contrib = ranks[s_idx] // od
                s = np.zeros(n, dtype=np.int64)
                np.add.at(s, d_idx[in_nodes], contrib[in_nodes])
                ranks = base + s * 17 // 20
            return pd.DataFrame({"node": nd, "rank_micro": ranks})

        return _tagged_single_task(
            nodes, edges, None, _pr, f"node {t}, rank_micro bigint", t
        )
    n = nodes.count()
    base = (scale * 3) // (20 * n)  # (1-d)/N in micro-units
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # pre-join the per-edge denominator once; tiny vs re-deriving per
    # pass. localCheckpoint (lazy) rather than persist: it cuts lineage
    # the same way but is released by the ContextCleaner when the frame
    # goes out of scope, so a long-lived session running hundreds of
    # queries does not accumulate pinned executor memory.
    eo = edges.join(outdeg, "src").localCheckpoint(eager=False)
    ranks = nodes.withColumn("rank_micro", F.lit(scale // n).cast("bigint"))
    for _ in range(iterations):
        contrib = eo.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(
            "dst", F.expr("rank_micro DIV outdeg").alias("contrib")
        )
        incoming = contrib.groupBy(F.col("dst").alias("node")).agg(
            F.sum("contrib").alias("s")
        )
        ranks = (
            nodes.join(incoming, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr("coalesce(s, 0L) * 17 DIV 20")
                ).cast("bigint").alias("rank_micro"),
            )
        )
    return ranks


def bfs_distances(
    nodes: DataFrame,
    edges: DataFrame,
    sources: DataFrame,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 6,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Multi-hop BFS: minimum hop count from any source node, directed
    edges, fixed ``max_hops`` frontier expansions. All-integer label
    propagation (dist' = min(dist, 1 + dist over in-edges)) — the same
    keyed join + min-aggregate shape as :func:`connected_components`,
    so one dst-keyed exchange per hop and no driver graph state.
    Unreachable nodes report -1 (a NULL bigint would round-trip as NaN
    through comparison paths). Fixed hop count keeps lineage shallow;
    dedup-style graphs need 2-3.

    Graphs at or below ``local_threshold`` rows (numeric no-null ids)
    run the single-task numpy twin (r14) — per-hop min-updates via
    ``np.minimum.at`` are order-free, so hop counts are identical to
    the distributed rounds (pinned by
    test_bfs_local_matches_distributed); ``local_threshold=0`` forces
    the distributed loop."""
    spark = nodes.sparkSession
    # constraint propagation off while the unrolled 6-hop plan is
    # DEFINED: the analyzer cost is quadratic-ish in the join/union
    # chain (same note as :func:`connected_components`); pure
    # plan-definition cost, no effect on the executed plan — every
    # join key here is non-null by construction. Restored in finally.
    cp_key = "spark.sql.constraintPropagation.enabled"
    cp_prev = spark.conf.get(cp_key, "true")
    spark.conf.set(cp_key, "false")
    try:
        nodes = nodes.select(F.col(node_col).alias("node"))
        edges = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        from pyspark.sql import types as T

        t = nodes.schema["node"].dataType.simpleString()
        if (
            local_threshold
            and isinstance(nodes.schema["node"].dataType, T.NumericType)
            and _graph_small_enough(
                nodes, edges, local_threshold, extra=sources
            )
        ):
            # replicates the distributed rounds' exact semantics:
            # sources count only where they are nodes (the left join),
            # a reached dst ENTERS the output even when it is not in
            # the node set (the union + min-aggregate does the same),
            # and an edge whose src is neither node nor any dst can
            # never fire
            def _bfs(pdf):
                import numpy as np
                import pandas as pd

                nd = pdf.loc[pdf.k == 0, "a"]
                es = pdf.loc[pdf.k == 1, "a"].to_numpy()
                ed = pdf.loc[pdf.k == 1, "b"]
                srcs = pdf.loc[pdf.k == 2, "a"]
                uni = pd.Index(pd.unique(
                    pd.concat([nd, ed], ignore_index=True).dropna()
                ))
                ABSENT = np.int64(-2)
                INF = np.int64(2**62)
                dist = np.full(len(uni), ABSENT, dtype=np.int64)
                n_codes = uni.get_indexer(nd.to_numpy())
                dist[n_codes] = -1  # present, unreachable
                is_node = np.zeros(len(uni), dtype=bool)
                is_node[n_codes] = True
                s_codes = uni.get_indexer(srcs.to_numpy())
                s_codes = s_codes[s_codes >= 0]
                dist[s_codes[is_node[s_codes]]] = 0
                sc = uni.get_indexer(es)
                dc = uni.get_indexer(ed.to_numpy())
                keep = sc >= 0
                sc, dc = sc[keep], dc[keep]
                for _ in range(max_hops):
                    live = dist[sc] >= 0
                    if not live.any():
                        break  # fixpoint — further hops cannot change
                    work = np.where(dist >= 0, dist, INF)
                    np.minimum.at(work, dc[live], dist[sc[live]] + 1)
                    dist = np.where(work < INF, work, dist)
                mask = dist != ABSENT
                return pd.DataFrame(
                    {"node": uni.to_numpy()[mask], "hops": dist[mask]}
                )

            return _tagged_single_task(
                nodes, edges,
                sources.select(F.col(sources.columns[0]).alias("node")),
                _bfs, f"node {t}, hops bigint", t,
            )
        dist = nodes.join(
            sources.select(F.col(sources.columns[0]).alias("node")).withColumn(
                "d", F.lit(0).cast("bigint")
            ),
            "node",
            "left",
        )
        for _ in range(max_hops):
            reached = (
                edges.join(
                    dist.where(F.col("d").isNotNull()).withColumnRenamed(
                        "node", "src"
                    ),
                    "src",
                )
                .select(
                    F.col("dst").alias("node"), (F.col("d") + 1).alias("d")
                )
            )
            dist = (
                dist.unionByName(reached)
                .groupBy("node")
                .agg(F.min("d").alias("d"))
            )
            # lazy per-hop checkpoint (r15, mirrors the CC loop): the
            # unrolled 6-hop lineage otherwise nests every earlier
            # hop's join+union+agg inside the next one — a 254-node
            # plan whose tail hop re-plans (and without reuse would
            # re-scan) the whole prefix. Each hop's plan is now a
            # shallow scan-of-RDD + join + union + agg, flat in hop
            # count; eager=False so materialization happens once, at
            # the caller's action, not as 6 extra jobs here.
            dist = dist.localCheckpoint(eager=False)
        return dist.select(
            "node",
            F.coalesce(F.col("d"), F.lit(-1)).cast("bigint").alias("hops"),
        )
    finally:
        spark.conf.set(cp_key, cp_prev)


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "a",
    id_b: str = "b",
    max_iter: int = 20,
) -> DataFrame:
    """Near-dup clusters from a verified pair list.

    Returns (cluster_id, n_docs, max_doc) per component: the minimum
    member is the cluster id and the canonical survivor (the usual
    keep-first policy); ``max_doc`` is the largest member (a second
    oracle-checkable component stat). Singleton documents (no pair)
    are not rows here — they survive by definition.
    """
    comps = connected_components(pairs, id_a, id_b, max_iter)
    return comps.groupBy(F.col("label").alias("cluster_id")).agg(
        F.count("*").alias("n_docs"),
        F.max("node").alias("max_doc"),
    )
