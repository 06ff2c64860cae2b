"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the exact baseline, and an IVF-bucketed variant
as the scale path — both pure DataFrame ops (``zip_with``/``aggregate`` fold
for the dot product stays JVM-side; no Python in the row path).

Scale design (100 TB / billions of vectors):
- Brute force is O(n·m) pairs: usable when one side is small (a query batch)
  and the other side is broadcast-partitioned; never self-join a full corpus.
- IVF: k-means-style coarse quantizer (here: deterministic first-C centroids
  for reproducibility) → assign each vector to nearest centroid map-side
  (broadcast centroids) → queries probe only ``nprobe`` buckets → candidate
  set shrinks by ~C/nprobe. The bucket join is an equi-shuffle on
  ``centroid_id``, not a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.loader import spread_partitions

# Broadcasts created by the vectorized kernels, kept for explicit release.
# A query function returns a LAZY DataFrame, so its broadcast must outlive
# the call — but a bench/driver loop that re-invokes queries would otherwise
# accumulate broadcast blocks for the whole session (the ContextCleaner only
# reclaims them after Python GC drops the last reference). The bench's
# release_cached_state() calls :func:`release_broadcasts` between queries;
# after that, DataFrames built by earlier invocations must not be re-run.
_LIVE_BROADCASTS: list = []


def _register_broadcast(bc):
    _LIVE_BROADCASTS.append(bc)
    return bc


def release_broadcasts() -> None:
    """Destroy kernel broadcasts created since the last call (see above)."""
    while _LIVE_BROADCASTS:
        bc = _LIVE_BROADCASTS.pop()
        try:
            bc.destroy()
        except Exception:  # already destroyed / context gone
            pass


def _sql_scalar_lit(x, kind: str) -> str:
    if x is None:
        return f"CAST(NULL AS {'DOUBLE' if kind == 'double' else 'BIGINT'})"
    if kind == "double":
        v = float(x)
        if v != v or v == float("inf") or v == float("-inf"):
            return f"CAST('{v}' AS DOUBLE)"
        return repr(v) + "D"
    return str(int(x)) + "L"


def sql_array_lit(data, kind: str = "double") -> str:
    """A (nested) array literal as ONE SQL string for ``F.expr``.

    Round-10 optimization: building literal codebooks / centroid tables
    element-by-element with ``F.lit`` costs one py4j round-trip per value —
    a 16×64 centroid table or an 8×16×8 codebook is 1000+ driver RPCs,
    measured as SECONDS of DataFrame-construction time per ANN query
    (construction re-runs on every invocation; the bench and any real
    caller pay it every time). One generated SQL string parses JVM-side in
    milliseconds and constant-folds to the identical Literal. Values are
    exact: ``repr(float)`` round-trips doubles bit-for-bit, ints print
    exactly. ``kind`` is ``'double'`` (D-suffixed) or ``'long'``
    (L-suffixed); ``None`` scalars become typed NULLs.
    """
    if isinstance(data, (list, tuple)):
        return "array(" + ", ".join(sql_array_lit(e, kind) for e in data) + ")"
    return _sql_scalar_lit(data, kind)


def dot_col(a, b):
    """Σ aᵢ·bᵢ as a left-fold (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a, b):
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def brute_force_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    query_filter=None,
    exclude_group_col: str | None = None,
    vectorized_dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``query_filter`` bounds the query side (e.g. ``F.col('vec_id') < 100``) —
    the corpus side stays full. Sim is rounded to 6dp before ranking so the
    id tie-break is deterministic across engines.

    ``exclude_group_col`` turns the search into HARD-NEGATIVE MINING: only
    neighbors whose group value DIFFERS from the query's qualify (the
    contrastive-training pattern — for each anchor, the most similar
    vectors of a different class are the highest-loss negatives). The
    group inequality rides the same join predicate, so the plan shape is
    unchanged; NULL groups pair with nothing (SQL NULL semantics — both
    engines drop them identically). The output then carries both group
    columns alongside the pair.

    ``vectorized_dim`` (round-10; round-11 extends it to the
    ``exclude_group_col`` hard-negative form): compute the raw
    cosines in a mapInPandas kernel that REPLAYS the engine fold exactly —
    per-dimension accumulation ``acc += C[:,i] * Q[:,i]`` is the same
    IEEE-754 double sequence as the zip_with left fold (float32→float64
    widening is exact, numpy ops are IEEE doubles), norms likewise, and
    dot/(qn·nn) uses the identical operand order — so every emitted double
    is bit-identical to the expression path and the Spark-side
    round(…, 6) + rank pipeline is unchanged. Rows whose vector is NULL /
    wrong-dim / null-element (or NULL id) are dropped up front, the same
    robustness contract as :func:`brute_force_topk_np` (on clean oracle
    data nothing is dropped and the output is bitwise the expression
    path's — unit-pinned; on DIRTY data the two paths differ by design:
    the expression path would emit NULL-cosine pairs for NULL/wrong-dim
    vectors, the kernel drops such rows). Per-batch cost is vectorized
    numpy instead of an interpreted 64-element lambda fold per pair.

    CONTRACT: the query side is collected to the driver, so callers MUST
    bound it (pass ``query_filter`` selecting a serving batch, ~≤10⁴
    rows); ``query_filter=None`` with ``vectorized_dim`` would collect
    the entire corpus. Every catalog caller passes a bounded filter.
    """
    # Norms are per-vector, not per-pair: compute them once on each side so
    # the O(n·m) join evaluates one fold (the dot product) per pair, not three.
    df = spread_partitions(df)
    if vectorized_dim is not None:
        return _brute_force_topk_foldexact(
            df, id_col, vec_col, k, query_filter, vectorized_dim,
            exclude_group_col=exclude_group_col,
        )
    grp = [F.col(exclude_group_col)] if exclude_group_col else []
    corpus = df.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("nbr_vec"),
        norm_col(F.col(vec_col)).alias("nbr_norm"),
        *[g.alias("nbr_group") for g in grp],
    )
    queries = df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        norm_col(F.col(vec_col)).alias("query_norm"),
        *[g.alias("query_group") for g in grp],
    )
    if query_filter is not None:
        queries = queries.filter(query_filter)
    sim = F.round(
        dot_col(F.col("query_vec"), F.col("nbr_vec"))
        / (F.col("query_norm") * F.col("nbr_norm")),
        6,
    )
    cond = F.col("query_id") != F.col("nbr_id")
    if exclude_group_col:
        cond = cond & (F.col("query_group") != F.col("nbr_group"))
    out_grp = ["query_group", "nbr_group"] if exclude_group_col else []
    pairs = queries.join(corpus, cond).select(
        "query_id", "nbr_id", sim.alias("cosine"), *out_grp
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank", *out_grp)
    )


def _brute_force_topk_foldexact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    query_filter,
    dim: int,
    exclude_group_col: str | None = None,
) -> DataFrame:
    """The fold-exact vectorized brute-force path (see
    :func:`brute_force_topk` ``vectorized_dim``): numpy per-dimension
    accumulation replays the zip_with/aggregate left fold bit-for-bit;
    rounding and ranking stay in Spark, unchanged.

    ``exclude_group_col`` (round-11) carries the hard-negative group
    inequality into the kernel: the group column rides the collected query
    batch and the Arrow batch, and the self-pair mask gains
    ``group_a != group_b``. NULL-group rows pair with NOTHING under the
    expression path's SQL inequality (NULL != x is never true), so the
    kernel drops them up front on both sides — the same up-front-drop
    contract the no-group path already applies to NULL ids/vectors.
    Emitted doubles stay bit-identical to the expression fold
    (unit-pinned for both forms)."""
    import numpy as np
    import pandas as pd

    valid = _valid_vectors(df, vec_col, dim).filter(F.col(id_col).isNotNull())
    grp_type = None
    if exclude_group_col is not None:
        valid = valid.filter(F.col(exclude_group_col).isNotNull())
        grp_type = dict(df.dtypes)[exclude_group_col]
    queries = valid
    if query_filter is not None:
        queries = queries.filter(query_filter)
    out_grp = ["query_group", "nbr_group"] if exclude_group_col else []
    empty_schema = "query_id bigint, nbr_id bigint, cosine double, rank int" + (
        f", query_group {grp_type}, nbr_group {grp_type}" if grp_type else ""
    )
    q_cols = [id_col, vec_col] + (
        [exclude_group_col] if exclude_group_col else []
    )
    q_rows = queries.select(*q_cols).collect()
    if not q_rows:
        return df.sparkSession.createDataFrame([], empty_schema)
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    q_grp = (
        np.array([r[2] for r in q_rows]) if exclude_group_col else None
    )
    # query norms via the SAME left fold: acc = ((0 + x0²) + x1²) + …
    qn_acc = np.zeros(len(q_ids), dtype=np.float64)
    for i in range(dim):
        qn_acc = qn_acc + Q[:, i] * Q[:, i]
    qn = np.sqrt(qn_acc)
    bc = _register_broadcast(
        df.sparkSession.sparkContext.broadcast((q_ids, Q, qn, q_grp))
    )

    def score(batches):
        b_ids, b_Q, b_qn, b_grp = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["_id"].to_numpy(dtype=np.int64)
            C = np.array([list(v) for v in pdf["_vec"]], dtype=np.float64)
            cn_acc = np.zeros(len(ids), dtype=np.float64)
            dot = np.zeros((len(ids), len(b_ids)), dtype=np.float64)
            for i in range(dim):
                ci = C[:, i]
                cn_acc = cn_acc + ci * ci
                # per-pair: dot += C[i]*Q[i] — the fold's add order
                dot = dot + np.multiply.outer(ci, b_Q[:, i])
            cn = np.sqrt(cn_acc)
            # denominator operand order matches the expression:
            # query_norm * nbr_norm (zero norms yield the same ±Inf/NaN
            # IEEE results as the expression path — just quiet the warning)
            with np.errstate(divide="ignore", invalid="ignore"):
                raw = dot / (b_qn[None, :] * cn[:, None])
            keep = ids[:, None] != b_ids[None, :]
            if b_grp is not None:
                g = pdf["_grp"].to_numpy()
                keep &= g[:, None] != b_grp[None, :]
            ri, qi = np.nonzero(keep)
            out = {
                "query_id": b_ids[qi],
                "nbr_id": ids[ri],
                "_raw": raw[ri, qi],
            }
            if b_grp is not None:
                out["query_group"] = b_grp[qi]
                out["nbr_group"] = g[ri]
            yield pd.DataFrame(out)

    in_cols = [F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")] + (
        [F.col(exclude_group_col).alias("_grp")] if exclude_group_col else []
    )
    kernel_schema = "query_id bigint, nbr_id bigint, _raw double" + (
        f", query_group {grp_type}, nbr_group {grp_type}" if grp_type else ""
    )
    pairs = (
        valid.select(*in_cols)
        .mapInPandas(score, kernel_schema)
        .select(
            "query_id",
            "nbr_id",
            F.round(F.col("_raw"), 6).alias("cosine"),
            *out_grp,
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank", *out_grp)
    )


def brute_force_topk_np(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    query_filter=None,
) -> DataFrame:
    """Exact cosine top-k with an Arrow-vectorized BLAS scorer.

    Same semantics as :func:`brute_force_topk`, different physical plan: the
    bounded query batch is collected once (q×d floats — a *serving batch*,
    not the corpus) and broadcast; each corpus partition streams through
    ``mapInPandas`` as Arrow batches and is scored with one float64 matrix
    multiply (``C @ Qᵀ``), emitting only its per-partition top-k rows per
    query. The final exact top-k is a window over ≤ k·q rows per partition —
    shuffle volume O(k·q·partitions), never O(n·q) pairs. At 100 TB this is
    the shape that wins: per-element interpreted lambdas become per-batch
    BLAS calls (~100× per pair), and the pair matrix never materializes.
    """
    import numpy as np
    import pandas as pd

    # NULL vectors can neither query nor be scored, and a NULL id would
    # silently cast to garbage in the int64 numpy path — drop both up
    # front (missing values are routine at corpus scale; list(None) in
    # the driver batch or the Arrow kernel would abort the job)
    df = df.filter(F.col(vec_col).isNotNull() & F.col(id_col).isNotNull())
    queries = df
    if query_filter is not None:
        queries = queries.filter(query_filter)
    # single source of truth for BOTH the empty-batch fallback and the
    # scorer output — the full result appends the window rank to this
    out_schema = "query_id bigint, nbr_id bigint, cosine double"

    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        # empty query batch: np.array([]) is 1-D and norm(axis=1) raises —
        # the top-k of no queries is an empty result
        return df.sparkSession.createDataFrame([], out_schema + ", rank int")
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sc = df.sparkSession.sparkContext
    bc = _register_broadcast(sc.broadcast((q_ids, Qn)))

    def score(batches):
        b_ids, b_Qn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["_id"].to_numpy(dtype=np.int64)
            C = np.array([list(v) for v in pdf["_vec"]], dtype=np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            # round BEFORE ranking — the contract ranks rounded cosines with
            # an id tie-break, and the per-partition cut must agree with the
            # global one on ties or a boundary row could be lost.
            S = np.round(Cn @ b_Qn.T, 6)  # (batch × q)
            S[ids[:, None] == b_ids[None, :]] = -np.inf  # mask self-pairs
            kk = min(k, S.shape[0])
            qi, ni, cs = [], [], []
            for j in range(len(b_ids)):
                col = S[:, j]
                top = np.lexsort((ids, -col))[:kk]
                top = top[np.isfinite(col[top])]
                qi.append(np.full(len(top), b_ids[j]))
                ni.append(ids[top])
                cs.append(col[top])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(qi),
                    "nbr_id": np.concatenate(ni),
                    "cosine": np.concatenate(cs),
                }
            )

    partials = (
        spread_partitions(df)
        .select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
        .mapInPandas(score, out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def kmeans_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    iterations: int = 3,
) -> DataFrame:
    """Deterministic distributed Lloyd iterations for IVF coarse centroids.

    Seeds = the first ``k`` vectors by id; each iteration assigns every vector
    to its nearest centroid (broadcast cross join — k rows broadcast, one pass
    over the data) and recomputes centroids as per-cluster means (one shuffle
    keyed on centroid_id, map-side partial aggregation via
    ``array-position-wise`` sums). Driver holds only k centroid vectors per
    iteration — never data rows — so the loop scales to any corpus size.
    """
    spark = df.sparkSession
    dims = df.select(F.size(vec_col).alias("d")).first().d
    seeds = df.orderBy(id_col).limit(k).select(vec_col).collect()
    cents: list[tuple[int, list[float]]] = [
        (i + 1, [float(x) for x in row[0]]) for i, row in enumerate(seeds)
    ]
    points = df.select(F.col(vec_col).alias("v"))
    for _ in range(iterations):
        # centroids are a k×dims literal (the "model"); assignment is a pure
        # projection — greatest (sim, -cid) struct picks the nearest centroid
        # deterministically with zero shuffle and zero join.
        candidates = [
            F.struct(
                cosine_col(F.col("v"), F.expr(sql_array_lit(vec))).alias("s"),
                F.lit(-cid).alias("n"),
            )
            for cid, vec in cents
        ]
        assigned = points.select(
            (-F.greatest(*candidates).getField("n")).alias("centroid_id"), "v"
        )
        # per-cluster mean: ONE narrow shuffle keyed on centroid_id with
        # map-side partial sums; k result rows come back to the driver.
        rows = (
            assigned.groupBy("centroid_id")
            .agg(
                *[
                    F.sum(F.element_at("v", i + 1)).alias(f"s{i}")
                    for i in range(dims)
                ],
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        cents = sorted(
            (r.centroid_id, [float(r[f"s{i}"] / r.n) for i in range(dims)])
            for r in rows
        )
    return spark.createDataFrame(
        [(cid, vec) for cid, vec in cents],
        "centroid_id int, centroid_vec array<float>",
    )


def _fold_norm(vec) -> float | None:
    """Driver-side replay of ``norm_col`` (left-fold sum of squares, then
    sqrt) — bit-identical to the engine fold: Python floats ARE IEEE-754
    doubles and the additions run in the same element order. Returns None
    when the engine fold would return NULL (NULL vector / NULL element)."""
    import math

    if vec is None:
        return None
    acc = 0.0
    for x in vec:
        if x is None:
            return None
        v = float(x)
        acc = acc + v * v
    return math.sqrt(acc)


def ivf_assign_ranked(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    kmeans_iterations: int = 0,
    centroids: DataFrame | None = None,
    max_rank: int = 1,
) -> DataFrame:
    """Rank every vector's ``max_rank`` nearest coarse centroids.

    The shared assignment kernel, value-identical to the original
    broadcast-join formulation but ZERO-SHUFFLE (round-10 optimization):
    the bounded centroid table (n_centroids rows — collected to the
    driver, the same O(centroids) driver traffic the broadcast paid) is
    baked in as literals, each row computes its n_centroids cosines in
    one projection, and the per-vector (cosine desc, centroid_id asc)
    ranking is a ``sort_array`` over an n_centroids-element struct array
    instead of a row_number window. The pre-rewrite plan paid a
    BroadcastNestedLoopJoin ×n_centroids row blowup (each blown-up row
    carrying the full vector) plus an Exchange + two sorts for the
    window — per CONSUMER subtree (corpus and query sides each re-planned
    it). Now assignment is a pure map over the scan: filters (e.g. the
    bounded query batch) push all the way down, and no vector ever
    crosses the wire for ranking.

    Ordering equivalence with the window (pinned by the unchanged
    oracles): struct sort compares ``s`` first — descending puts NULL
    cosines last (null struct-field compares smallest) and NaN first
    (double ordering treats NaN as largest), exactly
    ``_csim DESC NULLS LAST``; ties fall to ``nc = -centroid_id``
    descending = centroid_id ascending. Norms of the literal centroids
    are precomputed driver-side by replaying the engine's left fold in
    Python doubles (bit-identical); the row vector's norm is computed
    once per row instead of once per (row, centroid) pair.

    ``max_rank=1`` is the classic cell assignment (:func:`ivf_assign`);
    ``max_rank=nprobe`` is the multi-cell QUERY-side probe list — the
    recall knob of a production IVF index.

    ``kmeans_iterations=0`` uses the first ``n_centroids`` vectors by id
    as centroids — deterministic and cheap; ``> 0`` refines them with
    distributed Lloyd iterations (:func:`kmeans_centroids`). A caller who
    already holds the seed rows passes ``centroids`` — a
    (centroid_id, centroid_vec) frame, still accepted and collected here
    (bounded by contract).
    """
    if centroids is not None:
        if kmeans_iterations > 0:
            raise ValueError(
                "pass either a pre-built `centroids` frame OR "
                "kmeans_iterations>0, not both — refining caller-supplied "
                "centroids here would silently retrain the caller's model"
            )
        cents = [
            (int(r["centroid_id"]), r["centroid_vec"])
            for r in centroids.collect()
        ]
        cents.sort(key=lambda t: t[0])
    elif kmeans_iterations > 0:
        cents = [
            (int(r["centroid_id"]), r["centroid_vec"])
            for r in kmeans_centroids(
                df, vec_col, id_col, n_centroids, kmeans_iterations
            ).collect()
        ]
        cents.sort(key=lambda t: t[0])
    else:
        seeds = df.orderBy(id_col).limit(n_centroids).select(vec_col).collect()
        cents = [(i + 1, row[vec_col]) for i, row in enumerate(seeds)]
    out_cols = [F.col(c) for c in df.columns]
    if not cents:
        # empty corpus: the crossJoin against zero centroids produced zero
        # rows; an F.array() of zero structs would be an untyped literal
        return df.select(
            *out_cols,
            F.lit(None).cast("int").alias("centroid_id"),
            F.lit(None).cast("int").alias("probe_rank"),
        ).limit(0)
    # The whole per-row ranking is ONE generated SQL expression (a single
    # F.expr parse): building it from F.lit/lambda Columns instead costs
    # ~1 s of py4j round-trips per invocation (measured) — pure driver
    # overhead the bench pays on every run. The folds are the exact SQL
    # spelling of dot_col/norm_col, so every double is bit-identical.
    vref = f"`{vec_col}`"
    entries = []
    for cid, vec in cents:
        cn = _fold_norm(vec)
        if cn is None:
            # NULL centroid vector / NULL element: every cosine against it
            # is NULL — same as the fold over the literal would yield
            sim = "CAST(NULL AS DOUBLE)"
        else:
            sim = (
                f"aggregate(zip_with({vref}, {sql_array_lit(vec)},"
                " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D,"
                " (acc, v) -> acc + v)"
                f" / (__nv * {_sql_scalar_lit(cn, 'double')})"
            )
        entries.append(f"struct({sim} AS s, {-cid} AS nc)")
    ranked = F.expr(
        f"slice(sort_array(array({', '.join(entries)}), false), 1, {max_rank})"
    )
    nv = F.expr(
        f"SQRT(aggregate(transform({vref},"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0.0D,"
        " (acc, v) -> acc + v))"
    )
    return (
        df.withColumn("__nv", nv)
        .select(*out_cols, F.posexplode(ranked).alias("__pos", "__sc"))
        .select(
            *out_cols,
            (-F.col("__sc.nc")).alias("centroid_id"),
            (F.col("__pos") + F.lit(1)).alias("probe_rank"),
        )
        .filter(F.col("probe_rank") <= max_rank)
    )


def ivf_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    kmeans_iterations: int = 0,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Assign each vector to its single nearest coarse centroid (broadcast
    join) — :func:`ivf_assign_ranked` at ``max_rank=1``."""
    return ivf_assign_ranked(
        df, id_col, vec_col, n_centroids, kmeans_iterations, centroids, max_rank=1
    ).drop("probe_rank")


def ivf_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_centroids: int = 16,
    query_filter=None,
    kmeans_iterations: int = 0,
    nprobe: int = 1,
    nprobes=None,
) -> DataFrame:
    """Approximate top-k: probe the query's ``nprobe`` nearest IVF cells.

    ``nprobes`` (optional tuple) switches to SWEEP mode — the FAISS-style
    recall/latency sweep that evaluates several nprobe settings against
    ONE index build: assignment and pair scoring run once at
    ``max(nprobes)``, each tier re-ranks the pre-scored candidates whose
    cell probe rank qualifies (scores are probe-set-independent, so each
    tier bitwise-equals the single-nprobe call — unit-pinned). Output
    gains a leading ``nprobe int`` column.

    ``nprobe`` is the recall/latency knob of a production IVF index: the
    corpus stays single-assigned (each vector lives in exactly ONE cell,
    so a candidate pair can never duplicate), while each query probes its
    ``nprobe`` nearest cells — candidates grow ~nprobe/n_centroids of the
    corpus and recall climbs monotonically toward exact
    (``nprobe == n_centroids`` probes every cell, which IS brute force:
    the equivalence unit test pins that identity). One assignment pass
    ranks both sides (the window computes all centroid ranks anyway); the
    candidate join stays an equi-join on ``centroid_id`` — the
    100 TB-safe shape at every nprobe.
    """
    if nprobes is not None:
        sweep = _validate_nprobes(nprobes, n_centroids)
        max_np = max(sweep)
    elif not 1 <= nprobe <= n_centroids:
        raise ValueError(f"nprobe must be in [1, n_centroids], got {nprobe}")
    else:
        sweep, max_np = None, nprobe
    ranked = ivf_assign_ranked(
        df, id_col, vec_col, n_centroids, kmeans_iterations, max_rank=max_np
    )
    corpus = ranked.filter(F.col("probe_rank") == 1).select(
        F.col("centroid_id"),
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("nbr_vec"),
        norm_col(F.col(vec_col)).alias("nbr_norm"),
    )
    queries = ranked.select(
        F.col("centroid_id"),
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        norm_col(F.col(vec_col)).alias("query_norm"),
        F.col("probe_rank").alias("_prank"),
    )
    if query_filter is not None:
        queries = queries.filter(query_filter)
    sim = F.round(
        dot_col(F.col("query_vec"), F.col("nbr_vec"))
        / (F.col("query_norm") * F.col("nbr_norm")),
        6,
    )
    pairs = (
        queries.join(corpus, on="centroid_id")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", sim.alias("cosine"), "_prank")
    )
    if sweep is not None:
        return _rank_topk_sweep(pairs, "cosine", k, sweep, ascending=False)
    pairs = pairs.drop("_prank")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def srp_band_keys(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits_per_band: int = 8,
    num_bands: int = 16,
    seed: int = 42,
    plane_family: str = "gaussian",
) -> DataFrame:
    """Sign-random-projection band keys per vector (Arrow/BLAS map-side).

    Each vector is projected onto ``bits_per_band * num_bands`` fixed
    hyperplanes (seeded Gaussian — regenerated identically inside every Arrow
    batch, so no broadcast and no driver round-trip) and the sign bits are
    packed per band into an int64 key. P(sign match) for a pair at cosine
    ``s`` is ``1 − arccos(s)/π``, so banding gives the classic LSH S-curve
    over *angular* similarity. One ``V @ P`` matmul per batch — per-batch
    BLAS, never per-row Python.
    """
    import numpy as np
    import pandas as pd

    nbits = bits_per_band * num_bands
    out_schema = "id bigint, " + ", ".join(f"h{k} bigint" for k in range(num_bands))

    def sig(batches):
        planes = None
        weights = (1 << np.arange(bits_per_band)).astype(np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([list(v) for v in pdf["_vec"]], dtype=np.float64)
            if planes is None:
                if plane_family == "md5":
                    import hashlib

                    planes = np.array(
                        [
                            [
                                1.0
                                if int(
                                    hashlib.md5(f"{j}:{d}".encode()).hexdigest()[0], 16
                                )
                                & 1
                                else -1.0
                                for j in range(nbits)
                            ]
                            for d in range(V.shape[1])
                        ]
                    )
                else:
                    planes = np.random.default_rng(seed).standard_normal(
                        (V.shape[1], nbits)
                    )
            B = (V @ planes) > 0
            out = {"id": pdf["_id"].to_numpy(dtype=np.int64)}
            for k in range(num_bands):
                out[f"h{k}"] = B[:, k * bits_per_band : (k + 1) * bits_per_band] @ weights
            yield pd.DataFrame(out)

    return (
        spread_partitions(df)
        # a NULL vector has no angle to hash, and a NULL id would cast to
        # garbage in the int64 numpy path — drop both before the Arrow
        # batch (at corpus scale some fraction of embeddings is always
        # missing; list(None) in the kernel would abort the job)
        .filter(F.col(vec_col).isNotNull() & F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
        .mapInPandas(sig, out_schema)
    )


def srp_lsh_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    bits_per_band: int = 8,
    num_bands: int = 16,
    seed: int = 42,
    query_filter=None,
    plane_family: str = "gaussian",
    bucket_cap: int | None = 8192,
) -> DataFrame:
    """Embedding near-duplicate pairs via SRP-LSH buckets + exact verify.

    The LSH-bucketed scale path for :func:`embedding_dup_pairs`: instead of
    the O(n²) self-join, vectors shuffle once as ``(id, h0..h{nb-1})`` keyed
    by (band, band_hash); a pair is emitted only in the *first* band where
    its keys collide (short-circuit comparison chain — no candidate-dedup
    shuffle), then verified with the exact cosine and filtered to
    ``threshold``. Precision is exactly 1 (every emitted pair is verified);
    recall follows the S-curve ``1 − (1 − p^b)^nb`` with
    ``p = 1 − arccos(s)/π`` — defaults (8×16) give >0.99 at s ≥ 0.9.
    For lower thresholds use fewer bits per band / more bands (the catalog
    query runs 4×24 for its 0.4-threshold corpus).

    Scale notes (100 TB / billions of vectors): signature computation is
    map-side BLAS; the bucket shuffle carries nb int64s per vector, not the
    vector; the verify join re-attaches vectors by id (narrow equi-joins);
    giant buckets (an embedding mega-cluster sharing a band key) distribute
    through the shared triangle-block decomposition
    (``dedup.banded_bucket_pairs``, ``bucket_cap`` default 8192) instead of
    streaming O(m²) pairs in one task — identical output.
    """
    t = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if query_filter is not None:
        t = t.filter(query_filter)
    keys = srp_band_keys(t, "id", "v", bits_per_band, num_bands, seed, plane_family)
    member = F.struct(F.col("id"), *[F.col(f"h{k}") for k in range(num_bands)])
    banded = keys.select(
        member.alias("mb"),
        F.posexplode(F.array(*[F.col(f"h{k}") for k in range(num_bands)])).alias(
            "band_id", "band_hash"
        ),
    )
    buckets = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list("mb")).alias("ms"))
        .filter(F.size("ms") >= 2)
    )
    from .dedup import banded_bucket_pairs

    e2 = banded_bucket_pairs(buckets, bucket_cap)
    matched_earlier = F.lit(False)
    for k in range(num_bands - 1):
        matched_earlier = matched_earlier | (
            (F.lit(k) < F.col("band_id")) & (F.col(f"a.h{k}") == F.col(f"b.h{k}"))
        )
    cand = e2.filter(~matched_earlier).select(
        F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
    )
    side = t.select(F.col("id"), F.col("v"), norm_col(F.col("v")).alias("n"))
    info_a = side.select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("n").alias("n_a")
    )
    info_b = side.select(
        F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("n").alias("n_b")
    )
    sim = F.round(
        dot_col(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")), 6
    )
    return (
        cand.join(info_a, "id_a")
        .join(info_b, "id_b")
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            sim.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    query_filter=None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, bounded input).

    The scale path reuses :func:`ivf_assign`: near-dups almost always share a
    bucket, so dedup becomes per-bucket pair generation.
    """
    t = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm_col(F.col(vec_col)).alias("n"),
    )
    if query_filter is not None:
        t = t.filter(query_filter)
    a, b = t.alias("a"), t.alias("b")
    sim = F.round(
        dot_col(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n")), 6
    )
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def semantic_prune(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    threshold: float = 0.3,
    broadcast_side: bool = True,
) -> DataFrame:
    """SemDeDup-style semantic dedup: cluster-scoped cosine pairs ->
    connected components -> one canonical member per semantic-dup group.

    The cluster assignment (``label_col``) bounds the pairwise comparison to
    within-cluster pairs — the core SemDeDup trick that turns O(n²) corpus
    dedup into Σ O(|cluster|²). Edges are cosine >= threshold (rounded to
    6 dp so the decision is reproducible across engines); duplicate groups
    are the connected components of that edge graph (operators/graph.py's
    large-star/small-star contraction); the canonical survivor is the
    smallest id per component.

    Scale notes: the within-label self-join shuffles both sides on the
    cluster key — at production scale the clusterer emits k >> cores
    clusters so the per-key groups stay small (this is the same contract as
    the k-means IVF path in ivf_topk); the component step is O(log²) rounds
    over the dup edges only, which are a tiny fraction of the corpus.
    """
    from .graph import dedup_clusters

    t = spread_partitions(
        df.select(
            F.col(id_col).alias("id"),
            F.col(label_col).alias("lbl"),
            F.col(vec_col).alias("v"),
            norm_col(F.col(vec_col)).alias("n"),
        )
    )
    a, b = t.alias("a"), t.alias("b")
    if broadcast_side:
        # With a handful of clusters the label-equality shuffle join lands
        # on |labels| tasks regardless of core count; broadcasting the build
        # side keeps the probe at full input parallelism. When the corpus
        # outgrows the broadcast limit, pass False: the cluster-key shuffle
        # join is the scale path (k >> cores clusters keeps groups small).
        b = F.broadcast(b)
    cos = F.round(
        dot_col(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n")), 6
    )
    pairs = (
        a.join(b, (F.col("a.lbl") == F.col("b.lbl")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    ids = df.select(F.col(id_col), F.col(label_col))
    clusters = dedup_clusters(ids.select(id_col), pairs, id_col=id_col)
    return (
        ids.join(clusters, id_col)
        .select(
            F.col(id_col),
            F.col(label_col),
            F.col("component_id"),
            F.col("is_canonical").alias("is_kept"),
        )
    )


def _pq_double_exprs(m_subspaces: int, n_codes: int, d_sub: int) -> tuple[str, str]:
    """The shared PQ fold expressions (double arithmetic, input column
    ``v``, literal codebook column ``cbl``): per-vector code array and
    per-query LUT array. L2² between v's m-th subvector and codebook[m][c];
    0-based m, 1-based c/i (element_at); fold order matches the DuckDB
    oracles' list_sum exactly. The argmin binds the per-subspace distance
    array once via the single-element transform trick — array_position of
    the min = smallest code id on ties."""
    dist = (
        "aggregate(sequence(1, {d}), CAST(0.0 AS DOUBLE), (s, i) -> s"
        " + (element_at(v, m * {d} + i)"
        "    - element_at(element_at(element_at(cbl, m + 1), c), i))"
        " * (element_at(v, m * {d} + i)"
        "    - element_at(element_at(element_at(cbl, m + 1), c), i)))"
    ).format(d=d_sub)
    codes_sql = (
        "transform(sequence(0, {M} - 1), m -> element_at("
        "  transform(array(transform(sequence(1, {K}), c -> {dist})),"
        "            ds -> array_position(ds, array_min(ds))), 1))"
    ).format(M=m_subspaces, K=n_codes, dist=dist)
    luts_sql = (
        "transform(sequence(0, {M} - 1), m ->"
        "  transform(sequence(1, {K}), c -> {dist}))"
    ).format(M=m_subspaces, K=n_codes, dist=dist)
    return codes_sql, luts_sql


def _valid_vectors(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Keep only rows whose vector is non-NULL, exactly ``dim`` long, and
    free of NULL elements — the shared precondition of every PQ path (and
    of the DuckDB oracles, which filter identically)."""
    return df.filter(
        F.col(vec_col).isNotNull()
        & (F.size(vec_col) == dim)
        & ~F.array_contains(
            F.transform(F.col(vec_col), lambda x: x.isNull()), F.lit(True)
        )
    )


def _pq_seeds(df: DataFrame, id_col: str, vec_col: str, n_codes: int):
    """Collect the deterministic first-``n_codes``-by-id seed rows shared
    by every PQ path. Returns ``(seeds, n_codes)`` with ``n_codes``
    clamped to the rows that exist, or ``(None, 0)`` on an empty corpus —
    the caller returns its own empty frame (schemas differ: ``adc_micro``
    vs ``adc_micro2``), because an ``F.array()`` of zero seed arrays
    would be an untyped empty literal (analysis error)."""
    seeds = df.orderBy(id_col).limit(n_codes).select(vec_col).collect()
    if not seeds:
        return None, 0
    return seeds, min(n_codes, len(seeds))


def _float_codebook_lit(seeds, vec_col: str, m_subspaces: int, d_sub: int):
    """The literal-seeded DOUBLE codebook (pq_topk / ivfpq_topk): one
    constant-folded array<array<array<double>>> Literal. The trained path
    builds its own INTEGER-micro codebook instead — that difference is
    the point of pq_topk_trained, not drift."""
    codebook = [
        [
            [float(x) for x in row[vec_col][m * d_sub : (m + 1) * d_sub]]
            for row in seeds
        ]
        for m in range(m_subspaces)
    ]
    # ONE parsed SQL literal instead of m*codes*d_sub F.lit py4j calls
    # (~1 s of construction per invocation at the 8x16x8 default)
    return F.expr(sql_array_lit(codebook))


def _adc_sum_sql(m_subspaces: int, floor_micro: bool) -> str:
    """The ADC total as ``m_subspaces`` UNROLLED terms instead of an
    aggregate() fold: higher-order functions are CodegenFallback
    (interpreted per candidate pair — the hottest expression of every PQ
    query); plain adds whole-stage-codegen. Value-identical: terms are
    exact BIGINTs (the float path floors each term independently before
    summing), integer addition is associative, and ``+`` propagates NULL
    exactly like the fold's NULL-strict lambda."""
    term = "element_at(element_at(luts, {m}), CAST(element_at(codes, {m}) AS INT))"
    if floor_micro:
        term = f"CAST(FLOOR(1000000.0 * {term}) AS BIGINT)"
    return " + ".join(term.format(m=m) for m in range(1, m_subspaces + 1))


def _rank_topk(pairs: DataFrame, score_col: str, k: int) -> DataFrame:
    """The shared ADC tail: per-query rank over (score ASC, nbr_id ASC) —
    WindowGroupLimit-eligible, smallest-id tie-break — keep ``k``."""
    w = Window.partitionBy("query_id").orderBy(F.asc(score_col), F.asc("nbr_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("int"))
    )


def _validate_nprobes(nprobes, n_centroids: int) -> tuple:
    """Shared validation for the nprobe-sweep parameter: a non-empty
    tuple of ints, each in [1, n_centroids]."""
    sweep = tuple(nprobes)
    if not sweep or any(not 1 <= p <= n_centroids for p in sweep):
        raise ValueError(
            f"nprobes must be non-empty with every value in "
            f"[1, n_centroids]; got {nprobes}"
        )
    return sweep


def _rank_topk_sweep(
    pairs: DataFrame, score_col: str, k: int, nprobes, ascending: bool
) -> DataFrame:
    """Per-nprobe top-k over ONCE-scored candidate pairs — the FAISS-style
    nprobe sweep that reuses the index instead of rebuilding it per tier.
    ``pairs`` carries ``_prank`` (the probe rank of the candidate's cell in
    the query's cell ranking); each tier filters ``_prank <= np`` and
    re-ranks. Scores are probe-set-independent, so this equals running the
    single-nprobe operator at each value (unit-pinned); only the cheap
    WindowGroupLimit rank repeats per tier, never the scoring."""
    order = F.asc(score_col) if ascending else F.desc(score_col)
    w = Window.partitionBy("nprobe", "query_id").orderBy(order, F.asc("nbr_id"))
    # materialize the scored pairs ONCE — the per-tier filters would
    # otherwise each re-evaluate the whole scoring subtree (assignment +
    # encode + candidate join) in the unioned plan. Volume is what the
    # single nprobe=max query already shuffles for its rank window.
    pairs = pairs.localCheckpoint()
    subsets = [
        pairs.filter(F.col("_prank") <= np_)
        .drop("_prank")
        .select(F.lit(np_).cast("int").alias("nprobe"), "*")
        for np_ in nprobes
    ]
    out = subsets[0]
    for s in subsets[1:]:
        out = out.unionByName(s)
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("int"))
    )


def pq_topk(
    df: DataFrame,
    k: int = 3,
    m_subspaces: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter=None,
) -> DataFrame:
    """Product-quantization approximate top-k (asymmetric distance, ADC) —
    the MEMORY-bounded ANN scale path: the corpus is represented by
    ``m_subspaces`` one-byte codes per vector (8 bytes here vs 256 bytes of
    float32), the standard trade when 100 TB of embeddings must fit an
    index tier.

    Codebooks are seeded deterministically (the first ``n_codes`` vectors
    by id — the same seed-free convention as the IVF oracle family) and
    shipped as one constant-folded LITERAL, so corpus encoding is a pure
    projection: per subspace, argmin_c L2²(subvector, code_c) with a
    smallest-code tie-break — zero shuffles. The argmin/LUT arithmetic is
    expressed as higher-order folds over the literal (NOT an unrolled
    m×codes×dim expression tree — the unrolled form cost ~20 s of Catalyst
    analysis/codegen per run at ANY data size).

    Query scoring is true ADC: each query precomputes its n_codes-entry
    distance LUT per subspace ONCE (on the bounded query side, before the
    broadcast), and a (query, corpus-vector) pair costs m_subspaces array
    lookups — never a recomputation against raw corpus floats. Per-subspace
    terms are floored to integer micro-units BEFORE summation so the ADC
    total is an order-independent BIGINT (the catalog's engine-exactness
    idiom); final per-query top-k is a WindowGroupLimit rank, never a
    global sort.

    Returns (query_id, nbr_id, adc_micro, rank<=k). Approximate by
    construction (quantization error), but fully value-oracled: DuckDB
    re-derives codebooks, codes, LUT terms, and ranks from the same
    deterministic recipe.
    """
    d_sub = dim // m_subspaces
    # NULL vectors, short vectors, and vectors with NULL ELEMENTS cannot be
    # coded or queried — drop them up front (the null-injection probe feeds
    # 10%-null columns; unguarded, a NULL element in a seed vector crashes
    # the driver-side float(None), and a NULL element in a corpus/query row
    # propagates NULL through element_at into codes/LUTs, silently dropping
    # the row). The oracle filters identically.
    df = _valid_vectors(df, vec_col, dim)
    seeds, n_codes = _pq_seeds(df, id_col, vec_col, n_codes)
    if seeds is None:
        return df.sparkSession.createDataFrame(
            [], "query_id long, nbr_id long, adc_micro long, rank int"
        )
    # one Literal after constant folding: array<array<array<double>>>
    cb_lit = _float_codebook_lit(seeds, vec_col, m_subspaces, d_sub)
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    codes_sql, luts_sql = _pq_double_exprs(m_subspaces, n_codes, d_sub)

    encoded = spread_partitions(df).select(
        F.col(id_col).alias("nbr_id"), vec_d.alias("v"), cb_lit.alias("cbl")
    ).select("nbr_id", F.expr(codes_sql).alias("codes"))

    queries = df.filter(query_filter) if query_filter is not None else df
    q = queries.select(
        F.col(id_col).alias("query_id"), vec_d.alias("v"), cb_lit.alias("cbl")
    ).select("query_id", F.expr(luts_sql).alias("luts"))

    # UNROLLED ADC (round-10): the former aggregate() fold is a
    # higher-order function — CodegenFallback, interpreted per candidate
    # pair. Eight explicit terms whole-stage-codegen; the sum is exact
    # BIGINT (each term floors independently), so any association is
    # value-identical and NULL propagation matches (+ is NULL-strict).
    adc = F.expr(_adc_sum_sql(m_subspaces, floor_micro=True))
    pairs = encoded.join(
        F.broadcast(q), F.col("nbr_id") != F.col("query_id")
    ).select("query_id", "nbr_id", adc.alias("adc_micro"))
    return _rank_topk(pairs, "adc_micro", k)


def _tdiv(a: int, b: int) -> int:
    """Integer division TRUNCATING toward zero — the semantics Spark's
    ``div`` and DuckDB's ``//`` share (both: -7/2 = -3). Python's ``//``
    floors, so the driver-side centroid update must not use it directly."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


def pq_topk_trained(
    df: DataFrame,
    k: int = 3,
    m_subspaces: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter=None,
):
    """Product-quantization ADC top-k with Lloyd-TRAINED codebooks — the
    production upgrade of ``pq_topk``'s first-``n_codes`` literal seeding
    (round-6 verdict ask #3). Same memory-bounded index tier (8 one-byte
    codes per vector), better codes: ``rounds`` fixed k-means iterations
    per subspace move the centroids to the data's actual density.

    **Engine-exact by construction** (the ``pagerank_integer`` fixed-round
    idiom): every vector is quantized ONCE to integer micro-units
    (``floor(1e6 * x)`` as BIGINT) and all distances, centroid sums, and
    centroid updates happen in exact integer arithmetic — order-independent
    sums, truncating integer division (Spark ``div`` == DuckDB ``//`` ==
    ``_tdiv``) — so DuckDB replays the identical training trajectory and
    the oracle value-matches code-for-code, not just rank-for-rank.

    Scale shape (100 TB): per round, ONE pass over the corpus — the code
    assignment is a zero-shuffle projection against the constant-folded
    literal codebook (fold expressions, not an unrolled tree), and the
    centroid update is a map-side-combined aggregate over exactly
    ``m_subspaces * n_codes`` (= 128) groups whose result — O(codebook),
    never O(corpus) — is collected to the driver. Empty clusters keep
    their previous centroid. The quantized corpus is localCheckpointed so
    round r never replays rounds 1..r-1's scan lineage. Final scoring is
    the same integer-ADC / broadcast-LUT / WindowGroupLimit plan as
    ``pq_topk``.
    """
    import math

    d_sub = dim // m_subspaces
    df = _valid_vectors(df, vec_col, dim)
    seeds, n_codes = _pq_seeds(df, id_col, vec_col, n_codes)
    if seeds is None:
        return df.sparkSession.createDataFrame(
            [], "query_id long, nbr_id long, adc_micro2 long, rank int"
        )
    # codebook[m][c][i]: integer micro-units, same quantization as vm below
    codebook = [
        [
            [
                int(math.floor(1_000_000.0 * float(x)))
                for x in row[vec_col][m * d_sub : (m + 1) * d_sub]
            ]
            for row in seeds
        ]
        for m in range(m_subspaces)
    ]

    def cb_lit():
        # re-generated per round (the codebook mutates); one SQL parse per
        # call instead of m*codes*d_sub F.lit py4j round-trips
        return F.expr(sql_array_lit(codebook, kind="long"))

    vm_expr = F.transform(
        F.col(vec_col),
        lambda x: F.floor(F.lit(1_000_000.0) * x.cast("double")).cast("long"),
    )
    # integer L2² between vm's m-th subvector and codebook[m][c] (0-based m,
    # 1-based c/i); exact BIGINT fold — no floating point anywhere past the
    # one-time quantization
    _dist = (
        "aggregate(sequence(1, {d}), CAST(0 AS BIGINT), (s, i) -> s"
        " + (element_at(vm, m * {d} + i)"
        "    - element_at(element_at(element_at(cbl, m + 1), c), i))"
        " * (element_at(vm, m * {d} + i)"
        "    - element_at(element_at(element_at(cbl, m + 1), c), i)))"
    ).format(d=d_sub)
    codes_sql = (
        "transform(sequence(0, {M} - 1), m -> element_at("
        "  transform(array(transform(sequence(1, {K}), c -> {dist})),"
        "            ds -> array_position(ds, array_min(ds))), 1))"
    ).format(M=m_subspaces, K=n_codes, dist=_dist)
    luts_sql = (
        "transform(sequence(0, {M} - 1), m ->"
        "  transform(sequence(1, {K}), c -> {dist}))"
    ).format(M=m_subspaces, K=n_codes, dist=_dist)
    subs_sql = (
        "transform(sequence(0, {M} - 1), m -> struct("
        "  element_at(codes, m + 1) AS code, slice(vm, m * {d} + 1, {d}) AS sub))"
    ).format(M=m_subspaces, d=d_sub)

    base = spread_partitions(df).select(
        F.col(id_col).alias("vid"), vm_expr.alias("vm")
    ).localCheckpoint()

    for _ in range(rounds):
        assigned = base.select(
            "vm", cb_lit().alias("cbl")
        ).select("vm", F.expr(codes_sql).alias("codes"))
        upd = (
            assigned.select(F.posexplode(F.expr(subs_sql)).alias("m", "s"))
            .select("m", F.col("s.code").alias("code"), F.col("s.sub").alias("sub"))
            .groupBy("m", "code")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                *[
                    F.sum(F.element_at("sub", i)).alias(f"s{i}")
                    for i in range(1, d_sub + 1)
                ],
            )
            .collect()  # exactly m_subspaces*n_codes rows — O(codebook)
        )
        for row in upd:
            m, c = int(row["m"]), int(row["code"]) - 1
            cnt = int(row["cnt"])
            codebook[m][c] = [
                _tdiv(int(row[f"s{i}"]), cnt) for i in range(1, d_sub + 1)
            ]

    final_cbl = cb_lit()
    encoded = base.select(
        F.col("vid").alias("nbr_id"), "vm", final_cbl.alias("cbl")
    ).select("nbr_id", F.expr(codes_sql).alias("codes"))
    queries = df.filter(query_filter) if query_filter is not None else df
    q = queries.select(
        F.col(id_col).alias("query_id"), vm_expr.alias("vm"), final_cbl.alias("cbl")
    ).select("query_id", F.expr(luts_sql).alias("luts"))
    adc = F.expr(_adc_sum_sql(m_subspaces, floor_micro=False))
    pairs = encoded.join(
        F.broadcast(q), F.col("nbr_id") != F.col("query_id")
    ).select("query_id", "nbr_id", adc.alias("adc_micro2"))
    return _rank_topk(pairs, "adc_micro2", k)


def ivfpq_residual_topk(
    df: DataFrame,
    k: int = 3,
    m_subspaces: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter=None,
    nprobe: int = 1,
    nprobes=None,
):
    """IVF-PQ with RESIDUAL encoding — the true FAISS IVF-PQ formulation,
    closing the simplification :func:`ivfpq_topk` documents (it codes raw
    vectors). Each vector is coded as the PQ of ``v − centroid(cell)``:
    residuals are centered near zero, so the same code budget quantizes a
    much smaller ball and ADC error drops — the gain grows with how
    clustered the corpus is (unit-tested on planted clusters).

    **Engine-exact by construction** (the pq_topk_trained discipline):
    vectors and centroids quantize ONCE to integer micro-units
    (``floor(1e6·x)``), residual subtraction / L2² / ADC all run in exact
    BIGINT — no float past the quantization, so a SQL oracle replays the
    trajectory bit-for-bit. Codebook seeding is deterministic AND disjoint
    from the centroid seeds: centroids are the first ``n_centroids``
    vectors by id, the codebook is the residuals of the NEXT ``n_codes``
    vectors (positions n_centroids+1 .. n_centroids+n_codes), computed by
    the same engine assignment pipeline — no driver-side float
    reimplementation. Disjointness matters: a codebook seeded from the
    centroid vectors themselves is all-zero (each centroid's rank-1 cell
    is itself, residual exactly 0), collapsing ADC to a constant per
    query — the round-8 defect this round fixed. If the corpus is too
    small to supply any disjoint codebook seed (≤ n_centroids valid
    rows), the codebook degrades to the single zero code — every corpus
    vector then IS a centroid with residual 0, so zero is the exact code.

    Scale shape (100 TB): coarse assignment is the shared
    :func:`ivf_assign_ranked` broadcast plan; the centroid table and the
    residual codebook ship as constant-folded literals (n_centroids·dim +
    m·n_codes·d_sub ints); corpus encode is a zero-shuffle projection;
    query LUTs are built per (query, probed cell) on the bounded
    broadcast side — the cell-dependent LUT is exactly what residual
    encoding costs over vector encoding, and it rides the same equi-join
    on ``centroid_id``; top-k is the shared WindowGroupLimit rank.
    """
    import math

    if nprobes is not None:
        sweep = _validate_nprobes(nprobes, n_centroids)
        nprobe = max(sweep)
    elif not 1 <= nprobe <= n_centroids:
        raise ValueError(f"nprobe must be in [1, n_centroids], got {nprobe}")
    else:
        sweep = None
    d_sub = dim // m_subspaces
    df = _valid_vectors(df, vec_col, dim)
    # ONE seed collect covers both roles: positions 1..n_centroids are the
    # coarse centroids, positions n_centroids+1..n_centroids+n_codes seed
    # the residual codebook (disjoint by construction — centroid vectors'
    # own residuals are exactly zero and would degenerate the codebook).
    seeds = (
        df.orderBy(id_col)
        .limit(n_centroids + max(n_codes, 1))
        .select(id_col, vec_col)
        .collect()
    )
    if not seeds:
        return df.sparkSession.createDataFrame(
            [],
            ("nprobe int, " if sweep is not None else "")
            + "query_id long, nbr_id long, adc_micro2 long, rank int",
        )

    def _micro(vals) -> list[int]:
        return [int(math.floor(1_000_000.0 * float(x))) for x in vals]

    # coarse centroids: the first-n-by-id convention, quantized to micro.
    # n_cent < n_centroids only when the CORPUS has fewer valid rows (you
    # cannot have more cells than vectors) — nprobe re-clamps to match so
    # the index never silently probes cells that do not exist.
    n_cent = min(n_centroids, len(seeds))
    nprobe = min(nprobe, n_cent)
    cent_micro = [_micro(row[vec_col]) for row in seeds[:n_cent]]
    cent_df = df.sparkSession.createDataFrame(
        [(i + 1, [float(x) for x in seeds[i][vec_col]]) for i in range(n_cent)],
        "centroid_id int, centroid_vec array<double>",
    )
    ranked = ivf_assign_ranked(
        df, id_col, vec_col, n_cent, centroids=cent_df, max_rank=nprobe
    )
    assigned = ranked.filter(F.col("probe_rank") == 1)

    # centroid micro table as ONE literal: element_at(cents, centroid_id)
    # (single SQL parse — n_centroids*dim F.lit calls measured ~1 s of
    # construction per invocation)
    cents_lit = F.expr(sql_array_lit(cent_micro, kind="long"))
    vm_expr = F.transform(
        F.col(vec_col),
        lambda x: F.floor(F.lit(1_000_000.0) * x.cast("double")).cast("long"),
    )
    # residual = vm - cents[cell], exact int64, computed inline
    rm_sql = "zip_with(vm, element_at(cents, centroid_id), (a, b) -> a - b)"

    # codebook: the residuals of the n_codes vectors AFTER the centroid
    # block (ids at positions n_cent+1 .. n_cent+n_codes by the first-by-id
    # convention), produced by the same engine assignment (rank-1 cells of
    # the seed ids) — collected O(n_codes) rows, never corpus rows. These
    # are disjoint from the centroids, so their residuals are genuinely
    # nonzero spread samples; seeding from the centroid vectors themselves
    # yields the all-zero codebook (ADVICE r8, fixed r9).
    seed_id_vals = [row[id_col] for row in seeds[n_cent : n_cent + n_codes]]
    res_by_id: dict[int, list[int]] = {}
    if seed_id_vals:
        seed_res = (
            assigned.filter(F.col(id_col).isin(seed_id_vals))
            .select(
                F.col(id_col).alias("sid"),
                vm_expr.alias("vm"),
                cents_lit.alias("cents"),
                "centroid_id",
            )
            .select("sid", F.expr(rm_sql).alias("rm"))
            .collect()
        )
        res_by_id = {int(r["sid"]): [int(x) for x in r["rm"]] for r in seed_res}
    if res_by_id:
        codebook = [
            [
                res_by_id[sid][m * d_sub : (m + 1) * d_sub]
                for sid in seed_id_vals
                if sid in res_by_id
            ]
            for m in range(m_subspaces)
        ]
    else:
        # corpus ≤ n_cent rows: every vector IS a centroid, every residual
        # is exactly zero — the single zero code is the exact encoding
        codebook = [[[0] * d_sub] for _ in range(m_subspaces)]
    n_codes = len(codebook[0])
    cb_lit = F.expr(sql_array_lit(codebook, kind="long"))

    _dist = (
        "aggregate(sequence(1, {d}), CAST(0 AS BIGINT), (s, i) -> s"
        " + (element_at(rm, m * {d} + i)"
        "    - element_at(element_at(element_at(cbl, m + 1), c), i))"
        " * (element_at(rm, m * {d} + i)"
        "    - element_at(element_at(element_at(cbl, m + 1), c), i)))"
    ).format(d=d_sub)
    codes_sql = (
        "transform(sequence(0, {M} - 1), m -> element_at("
        "  transform(array(transform(sequence(1, {K}), c -> {dist})),"
        "            ds -> array_position(ds, array_min(ds))), 1))"
    ).format(M=m_subspaces, K=n_codes, dist=_dist)
    luts_sql = (
        "transform(sequence(0, {M} - 1), m ->"
        "  transform(sequence(1, {K}), c -> {dist}))"
    ).format(M=m_subspaces, K=n_codes, dist=_dist)

    encoded = spread_partitions(assigned).select(
        "centroid_id",
        F.col(id_col).alias("nbr_id"),
        vm_expr.alias("vm"),
        cents_lit.alias("cents"),
    ).select(
        "centroid_id", "nbr_id", F.expr(rm_sql).alias("rm"), cb_lit.alias("cbl")
    ).select("centroid_id", "nbr_id", F.expr(codes_sql).alias("codes"))

    queries = ranked.filter(query_filter) if query_filter is not None else ranked
    # the query's residual — and therefore its LUT — is PER PROBED CELL:
    # the defining extra cost (and accuracy source) of residual IVF-PQ
    q = queries.select(
        "centroid_id",
        F.col(id_col).alias("query_id"),
        vm_expr.alias("vm"),
        cents_lit.alias("cents"),
        F.col("probe_rank").alias("_prank"),
    ).select(
        "centroid_id", "query_id", F.expr(rm_sql).alias("rm"),
        cb_lit.alias("cbl"), "_prank",
    ).select("centroid_id", "query_id", F.expr(luts_sql).alias("luts"), "_prank")

    adc = F.expr(_adc_sum_sql(m_subspaces, floor_micro=False))
    pairs = (
        encoded.join(F.broadcast(q), on="centroid_id")
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select("query_id", "nbr_id", adc.alias("adc_micro2"), "_prank")
    )
    if sweep is not None:
        return _rank_topk_sweep(pairs, "adc_micro2", k, sweep, ascending=True)
    return _rank_topk(pairs.drop("_prank"), "adc_micro2", k)


def ivfpq_topk(
    df: DataFrame,
    k: int = 3,
    m_subspaces: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter=None,
    nprobe: int = 1,
    nprobes=None,
):
    """IVF + PQ composed: the full production ANN index tier (FAISS's
    IVF-PQ shape). The coarse quantizer routes each vector to one of
    ``n_centroids`` cells (broadcast assignment — ann_topk_ivf's plan);
    within the probed cell, candidates are scored by PQ/ADC over 8
    one-byte codes — so a query touches ~1/n_centroids of the corpus AND
    never touches raw floats. Both approximations compose: recall(IVF-PQ)
    ≈ recall(IVF) · recall(PQ), the classic memory/compute trade matrix
    this catalog now covers end-to-end (brute → IVF-flat → PQ-exhaustive
    → IVF-PQ).

    Simplification vs FAISS, stated: codes quantize the VECTORS, not the
    cell residuals. The true residual formulation (shared codebook over
    ``v − centroid(cell)``, cell-dependent query LUTs) is
    :func:`ivfpq_residual_topk` — round-8, unit-tested to beat this
    variant's recall on clustered corpora.

    Scale shape (100 TB): assignment is a broadcast of n_centroids rows;
    encode is the zero-shuffle literal-codebook projection; the candidate
    join is an equi-join on ``centroid_id`` against the bounded broadcast
    query side — never a cross join; ADC terms floor to micro ints before
    the order-independent BIGINT sum; top-k is a WindowGroupLimit rank.

    ``nprobe`` (the recall knob, same semantics as :func:`ivf_topk`): each
    query probes its ``nprobe`` nearest cells while the corpus stays
    single-assigned, so candidate pairs never duplicate and recall climbs
    monotonically; ``nprobe == n_centroids`` probes every cell, collapsing
    the IVF tier entirely — the result must equal :func:`pq_topk` on the
    same corpus (the composition's equivalence unit test).
    """
    if nprobes is not None:
        sweep = _validate_nprobes(nprobes, n_centroids)
        nprobe = max(sweep)
    elif not 1 <= nprobe <= n_centroids:
        raise ValueError(f"nprobe must be in [1, n_centroids], got {nprobe}")
    else:
        sweep = None
    d_sub = dim // m_subspaces
    df = _valid_vectors(df, vec_col, dim)
    seeds, n_codes = _pq_seeds(df, id_col, vec_col, n_codes)
    if seeds is None:
        return df.sparkSession.createDataFrame(
            [],
            ("nprobe int, " if sweep is not None else "")
            + "query_id long, nbr_id long, adc_micro long, rank int",
        )
    cb_lit = _float_codebook_lit(seeds, vec_col, m_subspaces, d_sub)
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    codes_sql, luts_sql = _pq_double_exprs(m_subspaces, n_codes, d_sub)

    # One seed scan serves both tiers: the collected PQ seed rows ARE the
    # first-n-by-id vectors ivf_assign would top-k-scan the corpus for
    # again (seeds are id-ordered, centroid_id = 1-based list position —
    # the exact row_number-over-id contract), so the coarse centroids
    # rebuild driver-side whenever enough seeds exist. Values are bit-
    # identical: the original float32 elements pass through Python float
    # (double) and the assignment casts to double either way.
    if n_centroids <= len(seeds):
        cent = [
            (i + 1, [float(x) for x in seeds[i][vec_col]])
            for i in range(n_centroids)
        ]
        cent_df = df.sparkSession.createDataFrame(
            cent, "centroid_id int, centroid_vec array<double>"
        )
        ranked = ivf_assign_ranked(
            df, id_col, vec_col, n_centroids, centroids=cent_df, max_rank=nprobe
        )
    else:
        ranked = ivf_assign_ranked(
            df, id_col, vec_col, n_centroids, max_rank=nprobe
        )
    assigned = ranked.filter(F.col("probe_rank") == 1)
    encoded = spread_partitions(assigned).select(
        "centroid_id",
        F.col(id_col).alias("nbr_id"),
        vec_d.alias("v"),
        cb_lit.alias("cbl"),
    ).select("centroid_id", "nbr_id", F.expr(codes_sql).alias("codes"))
    queries = ranked.filter(query_filter) if query_filter is not None else ranked
    q = queries.select(
        "centroid_id",
        F.col(id_col).alias("query_id"),
        vec_d.alias("v"),
        cb_lit.alias("cbl"),
        F.col("probe_rank").alias("_prank"),
    ).select("centroid_id", "query_id", F.expr(luts_sql).alias("luts"), "_prank")
    adc = F.expr(_adc_sum_sql(m_subspaces, floor_micro=True))
    pairs = (
        encoded.join(F.broadcast(q), on="centroid_id")
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select("query_id", "nbr_id", adc.alias("adc_micro"), "_prank")
    )
    if sweep is not None:
        return _rank_topk_sweep(pairs, "adc_micro", k, sweep, ascending=True)
    return _rank_topk(pairs.drop("_prank"), "adc_micro", k)
