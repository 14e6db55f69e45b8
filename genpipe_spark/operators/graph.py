"""Connected components over a pair/edge DataFrame — the clustering step
that turns near-duplicate PAIRS (MinHash-LSH / SimHash / Jaccard output)
into dedup GROUPS with one canonical survivor per group. The reference
pipeline stops at pair emission; every production dedup pipeline needs
this step to actually drop documents, so it is provided as a first-class
operator (additive, beyond SURVEY.md §2).

Scale design (100 TB):
  - min-label propagation: per iteration ONE shuffle-join (labels onto
    edge endpoints) + ONE groupBy(min) — both keyed on node id, so AQE
    coalesces/splits partitions and skew-splits hot nodes.
  - iterations are O(diameter(G)); near-dup graphs are dense clusters
    with tiny diameters (2-4 typical), not long chains, so the loop
    terminates in a handful of rounds even at corpus scale.
  - each iteration ends in ``localCheckpoint`` to CUT LINEAGE — without
    it the plan doubles per round and the driver OOMs on analysis long
    before executors see data. On a real cluster swap in
    ``df.checkpoint()`` against durable storage for fault tolerance.
  - convergence is a CHANGED-LABEL COUNT: the old label rides along the
    min-aggregation as one extra column, so ``count(label < old)`` costs
    no extra join and never overflows (it is bounded by the node count,
    unlike a sum of raw 64-bit node ids under ANSI mode). Zero changed
    labels means fixpoint.
  - exhausting ``max_iter`` before the fixpoint raises (or warns with
    ``strict=False``) instead of silently returning half-merged
    components.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    strict: bool = True,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.

    ``edges`` is undirected pair output (one row per pair, either order).
    Returns (node, component) for every node that appears in an edge;
    isolated nodes are their own singleton components and never enter
    the edge list — callers left-join and ``coalesce(component, id)``.

    Raises ``RuntimeError`` if ``max_iter`` rounds pass without reaching
    the fixpoint (labels would be wrong); ``strict=False`` downgrades
    that to a warning and returns the unconverged labels.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    e = e.localCheckpoint(eager=True)  # edges are reused every round

    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    converged = False
    for _ in range(max_iter):
        msgs = e.join(labels, e.a == labels.node).select(
            F.col("b").alias("node"), "label", F.lit(False).alias("__own")
        )
        merged = (
            labels.withColumn("__own", F.lit(True))
            .unionByName(msgs)
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                # every node has exactly one __own row, so this is its
                # previous label riding along the same shuffle
                F.min(F.when(F.col("__own"), F.col("label"))).alias("__old"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            merged.agg(
                F.sum((F.col("label") < F.col("__old")).cast("long"))
            ).first()[0]
            or 0
        )
        labels = merged.select("node", "label")
        if changed == 0:
            converged = True
            break

    if not converged:
        msg = (
            f"connected_components did not converge within max_iter={max_iter}; "
            "labels are incomplete — raise max_iter (iterations are "
            "O(graph diameter))"
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)

    return labels.select("node", F.col("label").alias("component"))


def dedup_groups(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs -> dedup groups: one row per component with the
    canonical survivor (min id == the component label), member count and
    the canonically-sorted member list (serialized for hashability).
    Output: component, n_members, member_ids."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.concat_ws("|", F.sort_array(F.collect_list("node"))).alias("member_ids"),
    )


def pagerank_micro(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    damping_micro: int = 850_000,
) -> DataFrame:
    """PageRank in EXACT integer micro-units — the iterative-algorithm
    pattern with a cross-engine-replayable result.

    Ranks live in millionths (node starts at 1_000_000); one iteration:

      r'(v) = (1e6 - damping) + damping * (sum over in-edges of
              r(u) div outdeg(u)) div 1e6

    with every division an int64 `div` (truncating), so a fixed
    iteration count yields bit-identical ranks on any engine — no
    float accumulation order, no libm. Two deliberate, documented
    simplifications of textbook PageRank: dangling-node mass is NOT
    redistributed (it simply decays), and the div truncation leaks
    <1 micro-unit per edge per round — both deterministic, both
    replayed by the oracle.

    Scale shape: per iteration ONE join (ranks onto edge sources,
    keyed on node) + ONE groupBy(dst) — the same two-shuffle round as
    connected_components, with ``localCheckpoint`` per round to cut
    lineage (swap for checkpoint() on a real cluster). Out-degrees are
    computed once and ride the edge table."""
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    e = edges.select(
        F.col(src_col).alias("node"), F.col(dst_col).alias("dst")
    ).join(outdeg, "node")
    base = F.lit(1_000_000 - damping_micro).cast("long")
    ranks = nodes.withColumn("rank_micro", F.lit(1_000_000).cast("long"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, "node")
            .withColumn("__share", F.expr("rank_micro div outdeg"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("__share").alias("__in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    base
                    + F.expr(
                        f"(CAST({damping_micro} AS BIGINT) * coalesce(__in, 0)) div 1000000"
                    )
                ).alias("rank_micro"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over an undirected graph — the
    clustering-coefficient / community-density primitive, via the
    degree-ordered wedge join (the standard distributed formulation:
    Suri & Vassilvitskii's MR triangle counting).

    Steps, all keyed joins/aggregates:
      1. canonicalize to distinct undirected edges (min, max), dropping
         self-loops;
      2. ORIENT each edge from its lower (degree, id) endpoint to the
         higher — every triangle then appears as exactly ONE wedge
         (u→v, v→w) closed by the oriented edge (u→w), and each
         node's oriented out-degree is O(sqrt(m)), which bounds the
         wedge explosion on skewed (hub-heavy) graphs — the reason for
         degree ordering rather than plain id ordering at scale;
      3. wedge join on the middle node + a semi-ish join back to the
         oriented edge set to keep closed wedges;
      4. explode each triangle to its three corners and count per node.

    Output: (node, n_triangles) for nodes in >= 1 triangle. The total
    triangle count is sum(n_triangles)/3. Deterministic (set-valued),
    oracle-replayable: the orientation is a pure function of the edge
    set."""
    e = edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"),
    ).where(F.col("a") != F.col("b")).distinct()
    deg = (
        e.select(F.col("a").alias("n"))
        .unionByName(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient a->b iff (deg(a), a) < (deg(b), b); else b->a
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("__da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("__db"))
    keyed = e.join(da, "a").join(db, "b")
    fwd = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    # r12 (guide §5 — cache only when reused): the oriented edge set is
    # referenced THREE times (both wedge sides + the closing semi-join)
    # and each reference inlined the full distinct+degree+orient chain —
    # the static plan grew to 90 parquet scans / 176 Exchanges. One lazy
    # localCheckpoint bounds it at the |E|-sized oriented edge list (the
    # standard materialization of the Suri-Vassilvitskii formulation).
    o = keyed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
    ).localCheckpoint(eager=False)
    wedges = o.alias("E1").join(
        o.alias("E2"), F.col("E1.v") == F.col("E2.u")
    ).select(
        F.col("E1.u").alias("u"), F.col("E1.v").alias("v"), F.col("E2.v").alias("w")
    ).alias("W")
    # triangle table referenced three times (one per corner): checkpoint
    # it too — bounded by the triangle count
    closed = wedges.join(
        o.alias("E3"),
        (F.col("W.u") == F.col("E3.u")) & (F.col("W.w") == F.col("E3.v")),
        "left_semi",
    ).localCheckpoint(eager=False)
    corners = (
        closed.select(F.col("u").alias("node"))
        .unionByName(closed.select(F.col("v").alias("node")))
        .unionByName(closed.select(F.col("w").alias("node")))
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def bfs_levels(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    max_depth: int = 6,
) -> DataFrame:
    """Multi-source BFS: minimum hop count from any seed node, bounded
    at ``max_depth`` — the recursive-CTE workload (org charts,
    dependency closures, contamination spread) expressed as Spark's
    iterative equivalent, with a deterministic integer result.

    Output: (node, level) for every node reachable within max_depth
    (seeds at level 0). Per round: ONE frontier-to-edges join (keyed on
    the node) + a min-aggregate against the visited set, with
    ``localCheckpoint`` cutting lineage exactly like
    connected_components; the frontier only carries NEWLY-discovered
    nodes, so total work is O(edges within the horizon), not O(paths)
    — the path-enumeration blowup a naive recursive expansion hits on
    cyclic graphs. The loop exits EARLY once the frontier empties
    (graph diameter < max_depth) — the frontier is eagerly
    checkpointed each round anyway, so the emptiness probe reads the
    materialized blocks, not a recomputation (the same
    cost-rides-the-round trick as connected_components' changed-count;
    VERDICT r5)."""
    visited = seeds.select(F.col(node_col).alias("node")).distinct().withColumn(
        "level", F.lit(0)
    )
    frontier = visited
    e = edges.select(F.col(src_col).alias("node"), F.col(dst_col).alias("__dst"))
    for depth in range(1, max_depth + 1):
        reached = (
            frontier.join(e, "node")
            .select(F.col("__dst").alias("node"))
            .distinct()
        )
        new = (
            reached.join(visited.select("node"), "node", "left_anti")
            .withColumn("level", F.lit(depth))
            .localCheckpoint(eager=True)
        )
        if new.isEmpty():
            break
        visited = visited.unionByName(new).localCheckpoint(eager=False)
        frontier = new
    return visited


def kcore(
    edges: DataFrame,
    k: int,
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 64,
) -> DataFrame:
    """k-core decomposition (the k-core for ONE fixed k): iteratively
    peel every node whose degree among the remaining nodes is < k until
    none remains — the standard dense-subgraph primitive (community
    cores, spam/bot rings, "serious collaborator" subgraphs). The
    k-core is a UNIQUE fixpoint independent of peel order, so the
    output is deterministic.

    Input: canonical undirected edges (``a_col`` < ``b_col``, distinct,
    no self-loops). Output: ``node, core_deg`` — each surviving node
    with its degree inside the core (>= k by construction); empty when
    the graph has no k-core.

    Scale shape: each round is ONE map-side-combinable degree groupBy +
    TWO semi-joins re-keying the adjacency on the surviving endpoints —
    all hash-partitioned on node id, AQE-managed; ``localCheckpoint``
    cuts lineage per round (the connected_components doctrine).
    Round count is the peeling DEPTH (max cascade length), not node
    count; the operator raises at ``max_rounds`` rather than silently
    returning a half-peeled graph. At 100 TB the same loop runs with
    durable ``checkpoint()``; the classic optimization (peel only the
    frontier's neighborhood) trades simplicity for traffic and is
    unnecessary while depth stays small."""
    und = (
        edges.select(F.col(a_col).alias("n"), F.col(b_col).alias("m"))
        .unionByName(
            edges.select(F.col(b_col).alias("n"), F.col(a_col).alias("m"))
        )
        .localCheckpoint()
    )
    cur, prev_cnt = und, und.count()
    for _ in range(max_rounds):
        keep = (
            cur.groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= k)
            .select("n")
        )
        nxt = (
            cur.join(keep, "n", "left_semi")
            .join(keep.withColumnRenamed("n", "m"), "m", "left_semi")
            .select("n", "m")
            .localCheckpoint()
        )
        cnt = nxt.count()
        if cnt == prev_cnt:
            cur = nxt
            break
        cur, prev_cnt = nxt, cnt
    else:
        raise RuntimeError(
            f"kcore: no fixpoint within {max_rounds} rounds — peeling "
            "depth exceeds the cap; raise max_rounds"
        )
    return cur.groupBy("n").agg(F.count(F.lit(1)).alias("core_deg")).select(
        F.col("n").alias("node"), "core_deg"
    )


def common_neighbors(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 1,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Common-neighbor link prediction over an undirected graph: for
    every NON-adjacent node pair (u, w) sharing >= ``min_common``
    neighbors, emit the common-neighbor count, both degrees, and the
    neighborhood-Jaccard score |N(u) ∩ N(w)| / |N(u) ∪ N(w)| in exact
    integer millionths — the classic link-prediction / entity-
    resolution candidate generator (Liben-Nowell & Kleinberg 2003).

    All keyed joins/aggregates: canonicalize distinct undirected edges,
    build the two-direction adjacency list, self-join it on the CENTER
    node (each shared neighbor contributes exactly one wedge to the
    u < w pair), count per pair, anti-join existing edges away, attach
    degrees. |N(u) ∪ N(w)| = du + dw − common needs no second join.

    Scale: wedge fan-out is sum_v d(v)^2 — hub-quadratic, the SAME
    pathology every common-neighbor system faces. ``max_center_degree``
    caps it: centers with d > cap generate no wedges (a super-hub
    shared by millions of pairs carries almost no link-prediction
    signal — standard practice). The cap changes semantics (documented
    approximation), so it is OFF by default and the oracle-checked
    query runs uncapped on a bounded-degree graph; at 100 TB you set
    it and the wedge stage is O(sum of capped d^2), shuffle-keyed on
    the center."""
    # r12 A/B adjudication — NO checkpoint: the distinct edge set is
    # referenced ~9x in the static plan, but every reference bottoms
    # out in the IDENTICAL distinct Exchange, which the runtime shares
    # across consumers; a lazy localCheckpoint here measured x1.11 in
    # interleaved A/B (materialization cost, nothing saved). Contrast
    # triangle_count, whose reused subtree is a projection ABOVE
    # differently-aliased joins (no shared exchange) — there the
    # checkpoint measured x0.87 and stays.
    e = edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"),
    ).where(F.col("a") != F.col("b")).distinct()
    adj = e.select(F.col("a").alias("v"), F.col("b").alias("n")).unionByName(
        e.select(F.col("b").alias("v"), F.col("a").alias("n"))
    )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    centers = adj
    if max_center_degree is not None:
        ok = deg.where(F.col("d") <= max_center_degree).select("v")
        centers = adj.join(ok, "v", "left_semi")
    pairs = (
        centers.alias("A1")
        .join(
            centers.alias("A2"),
            (F.col("A1.v") == F.col("A2.v")) & (F.col("A1.n") < F.col("A2.n")),
        )
        .select(F.col("A1.n").alias("u"), F.col("A2.n").alias("w"))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= min_common)
    )
    fresh = pairs.join(
        e.select(F.col("a").alias("u"), F.col("b").alias("w")),
        ["u", "w"],
        "left_anti",
    )
    du = deg.select(F.col("v").alias("u"), F.col("d").alias("du"))
    dw = deg.select(F.col("v").alias("w"), F.col("d").alias("dw"))
    return (
        fresh.join(du, "u")
        .join(dw, "w")
        .select(
            "u", "w", "common", "du", "dw",
            F.expr("(1000000 * common) div (du + dw - common)").alias(
                "jaccard_micro"
            ),
        )
    )


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 4,
) -> DataFrame:
    """SYNCHRONOUS label propagation (community detection) with a
    deterministic tiebreak — the classic Raghavan et al. 2007
    algorithm made cross-engine-replayable: labels start as node ids;
    each round every node adopts the most frequent label among its
    NEIGHBORS (not itself — pure propagation), ties to the SMALLEST
    label; a FIXED iteration count replaces the usual
    convergence-check + random order (async order-dependence is what
    makes textbook LPA non-deterministic; the synchronous min-tiebreak
    variant is a pure function of the graph).

    Edges are symmetrized and deduplicated; self-loops dropped. One
    round = one keyed join (labels onto the neighbor lists) + one
    (node, label) count + one per-node rank-1 window (count desc,
    label asc — order-agnostic, so node ids may be any orderable
    type including strings) — the pagerank_micro two-shuffle round
    shape, localCheckpoint per round to cut lineage. Nodes are the
    parallelism; no step is degree-quadratic.

    Returns ``node, label`` after ``iters`` rounds."""
    if iters < 1:
        raise ValueError(f"label_propagation: iters {iters} < 1")
    fwd = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    und = (
        fwd.unionByName(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    nodes = und.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node"))
    for _ in range(iters):
        neigh = und.join(
            labels.select(F.col("node").alias("b"), "label"), "b"
        ).select(F.col("a").alias("node"), "label")
        counts = neigh.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        # order-agnostic tiebreak (count desc, label asc): row_number
        # over a per-node window instead of the old max(struct(c,
        # -label)) negation trick, which silently required numeric
        # node ids (string ids broke; LONG_MIN overflowed — r8
        # advisory). The window partitions on node, so parallelism is
        # nodes and the per-partition sort is bounded by distinct
        # neighbor labels (<= degree).
        w = Window.partitionBy("node").orderBy(
            F.col("c").desc(), F.col("label").asc()
        )
        best = counts.withColumn("__r", F.row_number().over(w)).where(
            F.col("__r") == 1
        )
        labels = best.select("node", "label").localCheckpoint(eager=False)
    return labels


def harmonic_centrality(
    edges: DataFrame,
    iters: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Exact harmonic centrality H(v) = sum_{t != v, reachable}
    1/d(v, t) over the UNDIRECTED graph — the shortest-path
    centrality member of the graph family (pagerank ranks by flow,
    k-core by cohesion, this by closeness; harmonic rather than
    classic closeness because it is well-defined on disconnected
    graphs, Boldi & Vigna 2014).

    All-pairs BFS as ``iters`` rounds of min-plus relaxation over the
    distance TABLE (src, dst, d): each round joins the current table
    to the edge list and keeps the per-pair min — after r rounds
    every pair within distance r is final, so ``iters`` >= the graph
    diameter makes the result exact (callers bound it; the fixture
    graph's diameter is ~3). The table is |nodes|^2 at worst — this
    operator is for BOUNDED node domains (the LPA/pagerank fixture
    doctrine: nodes are a modular projection, so the table is
    constant-sized at ANY data scale and the joins never touch raw
    data volume). Reciprocals stay exact: 1/d in micro is
    ``1000000 div d`` — integer division both engines floor
    identically for positive d.

    Emits ``node, n_reached, harmonic_micro`` (sum of floored micro
    reciprocals; unreachable pairs contribute nothing).
    """
    fwd = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).where(F.col(src_col) != F.col(dst_col))
    und = (
        fwd.unionByName(
            fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    dist = und.select(
        F.col("a").alias("s"), F.col("b").alias("t"),
        F.lit(1).cast("long").alias("d"),
    )

    # r12 (guide §1.2 — fewer rounds where the algorithm allows): the
    # per-edge relaxation paid iters-1 sequential join+agg rounds. With
    # D_r = {exact distances <= r}, min-plus composition gives
    # D_{a+b} = min(D_a, D_a ⊗ D_b): split any shortest path of length
    # <= a+b at position a (paths <= a are covered by the union with
    # D_a, which requires a >= b — always true below). DOUBLING plus a
    # binary-decomposition remainder therefore reaches EXACTLY `iters`
    # in O(log iters) rounds (6: 1→2→4→6, 3 joins instead of 5) —
    # identical pairs and distances; composing exactly TO iters matters
    # because overshooting (e.g. 8) would admit distance-7/8 pairs the
    # iters-round contract excludes.
    def compose(left: DataFrame, right: DataFrame) -> DataFrame:
        r = right.select(
            F.col("s").alias("u"),
            F.col("t").alias("t2"),
            F.col("d").alias("d2"),
        )
        step = (
            left.join(r, left["t"] == r["u"])
            .select(
                "s",
                F.col("t2").alias("t"),
                (F.col("d") + F.col("d2")).alias("d"),
            )
            .where(F.col("s") != F.col("t"))
        )
        return (
            left.unionByName(step)
            .groupBy("s", "t")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=False)
        )

    powers = [(1, dist)]
    while powers[-1][0] * 2 <= iters:
        sz, tbl = powers[-1]
        powers.append((sz * 2, compose(tbl, tbl)))
    done, dist = powers[-1]
    for sz, tbl in reversed(powers[:-1]):
        if done + sz <= iters:
            dist = compose(dist, tbl)
            done += sz
    return (
        dist.groupBy(F.col("s").alias("node"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reached"),
            F.sum(F.expr("1000000 div d")).cast("long").alias("harmonic_micro"),
        )
    )
