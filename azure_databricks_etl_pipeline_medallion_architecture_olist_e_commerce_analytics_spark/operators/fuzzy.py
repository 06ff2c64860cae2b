"""Blocked fuzzy string matching (entity resolution / record linkage).

The classic data-cleaning join the reference's silver layer approximates
with trim/lower normalization (/root/reference/scripts/silver/
silver_sellers.py:95-114 canonicalizes city strings before joining): here
generalized to true approximate matching — candidate pairs from a cheap
BLOCKING key, verified with edit distance.

Scale design: naive fuzzy join is O(|L|·|R|) — never viable. Blocking
turns it into one equi-shuffle on the block key plus per-block pair
verification, the standard entity-resolution decomposition (same plan
family as the MinHash-LSH band join in operators/dedup.py, which is the
blocking strategy of choice when no natural key exists). Levenshtein runs
JVM-side (no Python row path). Skewed blocks (a stop-word block key)
are the operator's failure mode at scale — pick block keys with bounded
selectivity, or compose with operators/skew.py salting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def last_token(col) -> Column:
    """Default block key: the final whitespace token (head noun)."""
    return F.element_at(F.split(F.trim(col), r"\s+"), -1)


def fuzzy_pairs(
    left: DataFrame,
    right: DataFrame,
    col: str,
    max_dist: int = 2,
    block=last_token,
) -> DataFrame:
    """Distinct value pairs (a < b) within a block at edit distance <= k.

    Operates on the DISTINCT values of ``col`` from each side first — the
    verification cost scales with vocabulary size, not corpus size, and the
    dedup is the same hash aggregate exact_dedup uses.
    """
    lv = left.select(F.col(col).alias("__l")).distinct()
    rv = right.select(F.col(col).alias("__r")).distinct()
    a = lv.withColumn("__blk", block(F.col("__l")))
    b = rv.withColumn("__blk", block(F.col("__r")))
    # normalize the pair with least/greatest rather than filtering __l < __r:
    # a one-sided filter would silently drop every cross-table match whose
    # left value sorts after its right value (~half of genuine links);
    # normalization keeps them all and dropDuplicates collapses the
    # both-orders duplicates a self-join produces
    return (
        a.join(b, "__blk")
        .filter(F.col("__l") != F.col("__r"))
        .select(
            F.least("__l", "__r").alias("name_a"),
            F.greatest("__l", "__r").alias("name_b"),
            F.levenshtein("__l", "__r").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= max_dist)
        .dropDuplicates(["name_a", "name_b"])
    )
