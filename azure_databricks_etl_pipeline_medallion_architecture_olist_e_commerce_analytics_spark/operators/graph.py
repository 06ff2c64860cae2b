"""Distributed connected components (large-star / small-star contraction).

Groups near-duplicate PAIRS into duplicate CLUSTERS — the missing step
between pair generation (operators/dedup.py: MinHash LSH / Jaccard /
SimHash emit edges) and the actual dedup decision a training-data pipeline
makes (keep one canonical document per cluster). Duplicate similarity is
not transitive, but dedup policy treats it as if it were: A~B and B~C
means A, B, C are one cluster even when A≁C — exactly a connected-
components problem on the pair graph.

Algorithm: alternating large-star/small-star edge contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC 2014 — public
literature), chosen over plain min-label propagation because its round
count is O(log² n) regardless of graph shape, while label propagation
needs DIAMETER rounds — and near-dup graphs contain long transitive
chains (v1~v2~…~vk from gradually-drifting documents) that would turn a
100 TB run into thousands of rounds.

Spark mapping: pure DataFrame ops. Each half-round is one groupBy (min
neighbor per center node) + one join back to the symmetrized edge list —
both shuffle on the node key, partial aggregation map-side, no
driver-side graph state, no RDDs. The edge set is ``localCheckpoint``-ed
every round to truncate the exponentially-growing iterative lineage (the
classic iterative-algorithm pitfall in Spark), and the loop early-exits
on a cheap count+hash fixpoint probe (one tiny aggregate per round — the
only driver round-trip, O(1) rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalize(edges: DataFrame) -> DataFrame:
    """Undirected edge canonical form: (a = max endpoint, b = min), no
    self-loops, no nulls, no duplicates."""
    return (
        edges.filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .select(
            F.greatest(F.col("a"), F.col("b")).alias("a"),
            F.least(F.col("a"), F.col("b")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _half_star(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star (connect bigger neighbors to the center's min) or
    small-star (connect smaller neighbors to the center's min) pass.

    Every node also keeps its own edge to its local minimum, which only ever
    adds intra-component edges (m ∈ N(u) ∪ {u} is in u's component by
    construction), so components are preserved exactly while convergence to
    the star form proceeds.
    """
    from pyspark.sql import Window

    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # per-center min via a partition-only window: one shuffle on the center
    # key computes m for every neighbor row in place — no separate aggregate
    # + join back (half the shuffles of the groupBy formulation)
    m = F.least(F.min("b").over(Window.partitionBy("a")), F.col("a"))
    j = sym.withColumn("m", m)
    keep = F.col("b") > F.col("a") if large else F.col("b") < F.col("a")
    moved = j.filter(keep).select(F.col("b").alias("a"), F.col("m").alias("b"))
    center = j.select("a", F.col("m").alias("b"))
    return _normalize(moved.union(center))


def _driver_union_find(cur: DataFrame) -> DataFrame:
    """Exact union-find over a driver-bounded, already-deduplicated edge
    list. Returns the same (node, component=min member) contract as the
    distributed loop."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for row in cur.toLocalIterator():
        ra, rb = find(row[0]), find(row[1])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict = {}
    for node in list(parent.keys()):
        root = find(node)
        comp_min[root] = min(comp_min.get(root, root), node)
    data = [(node, comp_min.get(find(node), find(node))) for node in parent]
    # include roots themselves
    roots = {find(n) for n in parent}
    data += [(r, comp_min.get(r, r)) for r in roots if r not in parent]
    t = dict(cur.dtypes)["a"]
    return cur.sparkSession.createDataFrame(
        sorted(data), schema=f"node {t}, component {t}"
    )


# Above this many deduplicated edges the component computation stays fully
# distributed; below it, the edge list is union-found on the driver in one
# pass. The gate is sized where the driver path actually wins: the
# single-threaded Python union-find costs ~1 µs/edge plus toLocalIterator
# streaming, so 200k edges is well under one distributed round's scheduling
# cost (~0.5-1 s) while millions of edges would NOT be — a near-threshold
# graph must not trade 3-4 parallel rounds for tens of seconds of serial
# driver work. Dup graphs are edge-sparse relative to the corpus, so real
# workloads land far below the gate. The count() that prices the gate is a
# job, but over partitions the eager checkpoint already materialized.
SMALL_GRAPH_EDGE_LIMIT = 200_000


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    small_graph_limit: int | None = None,
) -> DataFrame:
    """Connected components of an undirected graph given as an edge list.

    Returns ``(node, component)`` where ``component`` is the smallest node
    id in the node's component. Nodes that appear in no edge are absent
    (a singleton is its own component — join the node universe back and
    ``coalesce(component, node)``, as :func:`dedup_clusters` does).

    Physical strategy is size-gated, the same shape as AQE's runtime join
    re-plan: the normalized edge list is already materialized by the eager
    checkpoint, so its count is cheap — integer-keyed graphs under
    ``SMALL_GRAPH_EDGE_LIMIT`` edges take one exact driver union-find pass
    (a dup graph's edge set is tiny relative to the corpus; ~10 scheduling
    round-trips of the distributed loop cost far more), and everything
    larger runs the large-star/small-star contraction, which converges in
    O(log² n) rounds regardless of component diameter.

    ``max_iter`` is a safety bound, not the expected round count: the
    alternation reaches the star fixpoint in O(log² n) rounds (2-4 in
    practice for dedup graphs) and the loop exits as soon as the edge set
    stops changing.
    """
    cur = _normalize(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    ).localCheckpoint()
    limit = SMALL_GRAPH_EDGE_LIMIT if small_graph_limit is None else small_graph_limit
    int_keyed = dict(cur.dtypes)["a"] in ("tinyint", "smallint", "int", "bigint")
    if int_keyed and cur.count() <= limit:
        return _driver_union_find(cur)
    prev_sig = None
    for _ in range(max_iter):
        cur = _half_star(cur, large=True)
        cur = _half_star(cur, large=False).localCheckpoint()
        row = cur.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulate: ANSI-safe (no long overflow), order-free
            F.coalesce(
                F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).first()
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    sym = cur.union(cur.select(F.col("b").alias("a"), F.col("a").alias("b")))
    return sym.groupBy("a").agg(F.min("b").alias("mn")).select(
        F.col("a").alias("node"), F.least(F.col("a"), F.col("mn")).alias("component")
    )


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Cluster near-dup pairs and pick one canonical doc per cluster.

    ``pairs`` is any (id_a, id_b) near-dup pair output (jaccard_pairs,
    minhash_lsh_pairs, simhash_pairs, embedding_dup_pairs). Returns every
    document with its cluster id (the cluster's smallest doc id) and an
    ``is_canonical`` keep/drop flag — the dedup decision a training
    pipeline applies downstream. Singletons are their own cluster. The
    node→component map is a few rows per duplicate cluster — broadcast-
    sized relative to the corpus — but we leave join strategy to Catalyst
    (AQE converts to broadcast when the map is small).
    """
    cc = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    return (
        docs.select(id_col)
        .join(cc, F.col(id_col) == F.col("node"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("component_id"),
        )
        .withColumn("is_canonical", F.col("component_id") == F.col(id_col))
    )


def count_triangles(edges: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Distributed triangle counting with DEGREE orientation (Suri &
    Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer",
    WWW 2011 — public literature).

    ``edges`` is an undirected, duplicate-free edge list (one row per
    unordered pair). Every edge is oriented toward its higher-(degree, id)
    endpoint, bounding each vertex's out-degree by O(√m); the wedge
    self-join therefore cannot explode on a hub vertex, where natural id
    orientation is O(hub-degree²). Each triangle is counted exactly once —
    at its unique orientation-source vertex (the (deg,id) total order
    makes every triangle's orientation acyclic) — so the total is
    orientation-invariant and an id-oriented SQL twin still matches.

    Returns a 1-row DataFrame (n_edges, n_triangles).
    """
    und = edges.select(F.col(a_col).alias("__a"), F.col(b_col).alias("__b"))
    n_edges = und.agg(F.count(F.lit(1)).alias("n_edges"))
    deg = (
        und.select(F.col("__a").alias("v"))
        .union(und.select("__b"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        und.join(deg.select(F.col("v").alias("__a"), F.col("d").alias("da")), "__a")
        .join(deg.select(F.col("v").alias("__b"), F.col("d").alias("db")), "__b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("__a") < F.col("__b"))),
                F.struct(F.col("__a").alias("src"), F.col("__b").alias("dst")),
            )
            .otherwise(F.struct(F.col("__b").alias("src"), F.col("__a").alias("dst")))
            .alias("e")
        )
        .select("e.src", "e.dst")
        .localCheckpoint()
    )
    w1 = e.select(F.col("src").alias("v"), F.col("dst").alias("x"))
    w2 = e.select(F.col("src").alias("v"), F.col("dst").alias("y"))
    wedges = w1.join(w2, "v").where(F.col("x") < F.col("y"))
    closing = e.select(
        F.least("src", "dst").alias("x"), F.greatest("src", "dst").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"])
    return n_edges.join(tri.agg(F.count(F.lit(1)).alias("n_triangles")))


def pagerank_integer(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    scale: int = 10**12,
    damping_pct: int = 85,
    weight_col: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank in INTEGER micro-unit arithmetic.

    Classic power iteration (Brin & Page 1998; the Pregel showcase
    algorithm), re-expressed as DataFrame joins with one deliberate twist:
    every rank is a 64-bit integer count of ``1/scale`` units and every
    step uses integer floor division, so the result is EXACTLY
    order-independent — floating-point PageRank sums incoming
    contributions in nondeterministic shuffle order and differs in ulps
    across engines/partitionings, which would make a value-level oracle
    impossible. Integer ranks make the whole fixpoint bitwise-reproducible
    (same trick as the curation score's ppm units).

    Update rule per iteration (d = damping_pct/100, n = node count)::

        contrib(v) = rank(v) div outdeg(v)          -- per out-edge
        rank'(u)   = (100-d%)*(scale div n) div 100
                   + d% * sum(contrib over in-edges) div 100

    Dangling nodes (no out-edges) leak their damped mass rather than
    redistributing it — the simplest standard variant; both engines apply
    the identical rule so the oracle stays exact.

    Scale: the edge list with attached out-degree is the reused loop
    operand — hash-partitioned on ``src`` once, localCheckpoint-ed so each
    iteration reads a materialized table instead of an exponentially
    deeper lineage. Each iteration is one equi-join (ranks × edges on src,
    partitioning reused) plus one hash aggregate on dst with map-side
    partial sums — the Pregel message-combine pattern; no driver-side
    state beyond the iteration counter, no collect. O(E) per iteration,
    ``iterations`` rounds.

    Returns (node, rank) with ``rank`` in integer micro-units of
    ``1/scale``; sum over all nodes ≤ scale (leakage from dangling nodes).

    ``weight_col`` (positive integer edge weights) generalizes the update
    to contrib(e) = rank(src)·w(e) div Σw(src) — mass splits
    proportionally to weight, still floor-per-edge so the weighted
    fixpoint stays bitwise. The unweighted path IS the w=1 special case
    (rank·1 div count ≡ rank div deg), so one code path serves both.
    """
    e = edges.select(
        F.col(src_col).alias("__src"),
        F.col(dst_col).alias("__dst"),
        (F.col(weight_col).cast("long") if weight_col else F.lit(1)).alias("__w"),
    )
    nodes = (
        e.select(F.col("__src").alias("__node"))
        .union(e.select("__dst"))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    outdeg = e.groupBy("__src").agg(F.sum("__w").alias("__deg"))
    e_deg = e.join(outdeg, "__src").localCheckpoint()
    base = F.lit((100 - damping_pct) * (scale // n) // 100)
    ranks = nodes.select("__node", F.lit(scale // n).alias("__rank"))
    for _ in range(iterations):
        inc = (
            e_deg.join(ranks, e_deg["__src"] == ranks["__node"])
            .select(
                "__dst",
                # identical to (__rank * __w) div __deg for non-negative
                # ints (rank = q·deg + r ⇒ rank·w div deg = q·w + r·w div
                # deg) but without the rank·w product, which exceeds int64
                # once w > ~9.2e6 — Spark would wrap silently (ANSI off)
                # while the oracle's int128 arithmetic stays exact. The
                # residual r·w term keeps the result exact while w·Σw per
                # source is below 2^63 (w ≤ Σw, so far past any realistic
                # weight mass); the oracle needs no change because the
                # decomposition is value-identical.
                F.expr(
                    "(__rank div __deg) * __w + ((__rank % __deg) * __w) div __deg"
                ).alias("__contrib"),
            )
            .groupBy("__dst")
            .agg(F.sum("__contrib").alias("__inc"))
        )
        ranks = (
            nodes.join(inc, nodes["__node"] == inc["__dst"], "left")
            .select(
                "__node",
                (
                    base
                    + F.expr(
                        f"({damping_pct} * coalesce(__inc, 0L)) div 100"
                    )
                ).alias("__rank"),
            )
            .localCheckpoint()
        )
    return ranks.select(F.col("__node").alias("node"), F.col("__rank").alias("rank"))
