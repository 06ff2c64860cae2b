"""MERGE / upsert and SCD Type-2 dimension maintenance as pure DataFrame ops.

The reference's incremental layers (streaming tables, full-refresh MVs —
/root/reference/scripts/bronze/bronze_ingestion.py:38-45,
/root/reference/scripts/gold/*.sql:1) never mutate rows in place; real
warehouse pipelines also need keyed upserts and slowly-changing dimensions.
Both are expressed here as shuffle-minimal joins — no Delta MERGE dependency,
so they run on any Spark + parquet deployment and the result is a plain
DataFrame the caller writes with overwrite/append.

Scale notes (100 TB):
- ``merge_upsert`` is one anti-join shuffle on the merge keys plus a
  shuffle-free union. With both sides bucketed on the keys (sinks.py
  ``bucket_by``) the anti-join needs no Exchange at all.
- ``scd2_apply`` shuffles each side once on the business key; the change
  detection is a projected hash comparison (md5 over tracked columns), so
  wide rows compare in O(1) per row after one map-side pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """``MERGE INTO target USING source ON keys WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *`` — whole-row upsert semantics.

    Matched target rows are replaced by their source version; unmatched
    target rows pass through; source-only rows are inserted. Exactly one
    wide shuffle (the anti-join on ``keys``); the union is narrow.
    """
    return target.join(source, keys, "left_anti").unionByName(source)


def _tracked_hash(cols: list[str]):
    return F.md5(F.concat_ws("\u0001", *[F.coalesce(F.col(c).cast("string"), F.lit("\u0000")) for c in cols]))


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    tracked: list[str],
    effective_ts,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 merge.

    ``current`` is the existing dimension (already carrying
    ``valid_from``/``valid_to``/``is_current``); ``updates`` carries the new
    attribute values per business key. Rows whose tracked attributes changed
    are closed out (``valid_to = effective_ts``, ``is_current = false``) and
    a new open version is inserted; unchanged and historical rows pass
    through untouched. ``effective_ts`` is a Column/literal timestamp.

    Change detection compares an md5 over the tracked columns, so the join
    only carries keys + one 32-char digest per side.
    """
    eff = effective_ts if not isinstance(effective_ts, str) else F.lit(effective_ts)
    cur_open = current.filter(F.col(is_current))
    cur_hist = current.filter(~F.col(is_current))

    upd_h = updates.withColumn("__h_new", _tracked_hash(tracked))
    cur_h = cur_open.withColumn("__h_old", _tracked_hash(tracked))

    joined = cur_h.alias("c").join(
        upd_h.select(*keys, "__h_new").alias("u"), keys, "left"
    )
    unchanged = joined.filter(
        F.col("__h_new").isNull() | (F.col("__h_new") == F.col("__h_old"))
    ).select(cur_open.columns)
    closed = (
        joined.filter(F.col("__h_new").isNotNull() & (F.col("__h_new") != F.col("__h_old")))
        .select(cur_open.columns)
        .withColumn(valid_to, eff)
        .withColumn(is_current, F.lit(False))
    )

    changed_or_new = upd_h.alias("u").join(
        cur_h.select(*keys, "__h_old").alias("c"), keys, "left"
    ).filter(F.col("__h_old").isNull() | (F.col("__h_old") != F.col("__h_new")))
    opened = (
        changed_or_new.select(updates.columns)
        .withColumn(valid_from, eff)
        .withColumn(valid_to, F.lit(None).cast("timestamp"))
        .withColumn(is_current, F.lit(True))
    )

    return cur_hist.unionByName(unchanged).unionByName(closed).unionByName(
        opened.select(cur_hist.columns)
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str], compare: list[str]
) -> DataFrame:
    """Change-data-capture between two keyed snapshots.

    Emits one row per changed key with ``change_type`` ∈
    {'insert','update','delete'}; unchanged keys are omitted. This is the
    batch CDC primitive for pipelines whose sources deliver full snapshots
    (the reference re-reads full CSVs per run;
    /root/reference/scripts/bronze/bronze_ingestion.py:20-32) but whose
    downstream wants deltas — feed the output to :func:`merge_upsert` or
    :func:`scd2_apply`.

    One full-outer join shuffled on ``keys``; each side carries only the
    keys plus one md5 digest of the ``compare`` columns, so wide snapshots
    diff without shuffling their payloads.
    """
    oh = old.select(*keys, _tracked_hash(compare).alias("__h_old"))
    nh = new.select(*keys, _tracked_hash(compare).alias("__h_new"))
    j = oh.join(nh, keys, "full_outer")
    return (
        j.withColumn(
            "change_type",
            F.when(F.col("__h_old").isNull(), F.lit("insert"))
            .when(F.col("__h_new").isNull(), F.lit("delete"))
            .when(F.col("__h_old") != F.col("__h_new"), F.lit("update")),
        )
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type")
    )
