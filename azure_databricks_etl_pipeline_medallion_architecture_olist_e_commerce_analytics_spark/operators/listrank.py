"""Parallel list ranking by pointer jumping (Wyllie's algorithm).

The scale fallback the recursive chain walk (queries.q_recursive_chain)
names for degenerate chain depths: a recursive CTE — even with K-step
edges — runs rounds proportional to max-chain-length/K, so a corpus where
one key owns half the rows (a 750k-deep chain) never finishes. Pointer
jumping runs ceil(log2(max_depth)) rounds REGARDLESS of depth: each round
every node adds its predecessor-pointer's accumulated rank to its own and
jumps the pointer twice as far (rank(v) += rank(ptr(v));
ptr(v) = ptr(ptr(v))), so after k rounds each node has counted all
predecessors within 2^k hops.

Round shape: ONE self equi-join of the node table on the jump pointer (a
hash shuffle on the node id) plus a localCheckpoint to truncate lineage —
O(n) work per round, log(depth) rounds, no driver-side state beyond the
round counter. This is the classic BSP/Pregel primitive re-expressed as
DataFrame joins; the same ladder ranks any disjoint union of linked lists
(chains per customer here) in the same passes because the join key is the
global node id.

Cross-check: queries.q_list_ranking runs this against the identical
ROW_NUMBER contract the recursive walk uses — recursion, ranking, and
pointer jumping must agree exactly (oracle-verified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def list_rank(
    nodes: DataFrame,
    id_col: str,
    pred_col: str,
    rank_col: str = "rank",
    max_depth: int | None = None,
) -> DataFrame:
    """Rank every node within its linked list: rank = #predecessors.

    ``nodes`` must hold one row per node with a unique ``id_col`` and a
    ``pred_col`` naming the previous node in its list (NULL at a head).
    Returns (id_col, rank_col) with rank 0 at each head — total work
    O(n log d) for n nodes and maximum list depth d.

    ``max_depth`` bounds the rounds (ceil(log2(max_depth))); when omitted
    the global node count stands in (n nodes are at most n deep) — callers
    that know their depth (e.g. bounded orders-per-customer) pass it in to
    run fewer rounds. Depth here means list LENGTH (number of nodes). The
    node count itself is always taken — one cheap job over the checkpointed
    table — because it gates the per-round broadcast hint below.
    """
    cur = nodes.select(
        F.col(id_col).alias("__id"),
        F.col(pred_col).alias("__ptr"),
        F.when(F.col(pred_col).isNull(), F.lit(0)).otherwise(F.lit(1)).alias("__rank"),
    )
    cur = cur.localCheckpoint()
    n = cur.count()
    if max_depth is None:
        # list length = nodes per head; heads are nodes with NULL pred, so
        # count list membership by... lists are only linked, not labeled —
        # bound rounds by the GLOBAL worst case instead: n nodes can form a
        # chain at most n deep, but one extra jump per round is harmless,
        # so measure the longest chain cheaply via the pointer structure:
        # rounds only need log2(n) in the worst case.
        max_depth = n
    rounds = max(1, int(max_depth - 1).bit_length())  # ceil(log2(max_depth))
    # the jump table is the node table itself, re-emitted from
    # localCheckpoint each round with no size stats — AQE can't see it is
    # broadcastable, so without the hint every round exchanges + sorts BOTH
    # sides of the self-join. Under the gate the probe side stays in place
    # (map-only) each round; over it the SMJ path stands.
    from .graph import BROADCAST_NODE_LIMIT

    small = n <= BROADCAST_NODE_LIMIT
    for _ in range(rounds):
        jump = cur.select(
            F.col("__id").alias("__jid"),
            F.col("__ptr").alias("__jptr"),
            F.col("__rank").alias("__jrank"),
        )
        if small:
            jump = F.broadcast(jump)
        cur = (
            cur.join(jump, cur["__ptr"] == jump["__jid"], "left")
            .select(
                "__id",
                # no match (ptr NULL) → pointer exhausted: rank is final
                F.col("__jptr").alias("__ptr"),
                (F.col("__rank") + F.coalesce(F.col("__jrank"), F.lit(0))).alias(
                    "__rank"
                ),
            )
            .localCheckpoint()  # truncate lineage: each round reads the last
        )
    return cur.select(F.col("__id").alias(id_col), F.col("__rank").alias(rank_col))
