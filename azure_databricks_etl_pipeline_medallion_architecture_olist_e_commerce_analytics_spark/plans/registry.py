"""Declarative dataset registry + DAG execution — the DLT-equivalent core.

The reference declares its pipeline with ``@dlt.view`` / ``@dlt.table``
decorators and ``dlt.read`` / ``dlt.readStream`` name references
(/root/reference/scripts/silver/Silver_orders.py:6-26), plus SQL
``CREATE OR REFRESH MATERIALIZED VIEW`` files referencing ``LIVE.`` siblings
(/root/reference/scripts/gold/fact_order_items.sql:1,28). This module
implements those semantics on stock PySpark:

- :class:`Pipeline` holds a registry of dataset definitions (name, body
  function or SQL text, expectations, table properties).
- Dependencies are discovered *by execution*: a body calls
  ``ctx.read("silver.orders")`` which recursively resolves the upstream
  dataset (memoized), so the DAG is walked depth-first in exact topological
  order with cycle detection — the same name-reference model DLT uses.
- Two materialization modes:
  * ``views`` (default): every dataset is a lazy DataFrame; nothing touches
    disk. Catalyst sees the WHOLE pipeline as one logical plan per output, so
    cross-layer optimizations (filter pushdown through silver into the bronze
    scan, column pruning across the medallion) happen for free. At 100 TB this
    is the mode you run ad-hoc queries in.
  * ``tables``: each table/MV dataset is written to the warehouse
    (parquet ``saveAsTable``; Delta when the jars are present) and downstream
    reads hit storage — the incremental/production mode.

Streaming tables (``streaming=True``) execute in batch-incremental mode here
(``availableNow`` parity — identical results); the true-streaming runner lives
in ``streaming/incremental.py``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from .expectations import (
    DROP,
    FAIL,
    WARN,
    Expectation,
    ExpectationViolation,
    apply_expectations,
    enforce_fail,
    expectation_metrics,
    observe_expectations,
)

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*){0,2}$")


def _normalize(name: str) -> str:
    """Canonical dataset key: lowercase, ``live.``/catalog prefixes stripped.

    The reference addresses the same dataset as ``LIVE.silver_orders``,
    ``silver.silver_orders`` and ``olist_cat.silver.silver_geolocations``
    (fact_order_items.sql:28, dim_customers.sql:37); all three collapse to
    one registry key here (catalog part dropped, schema kept).
    """
    parts = name.strip().lower().split(".")
    if parts and parts[0] == "live":
        parts = parts[1:]
    if len(parts) == 3:  # catalog.schema.table → schema.table
        parts = parts[1:]
    return ".".join(parts)


@dataclass
class DatasetDef:
    name: str  # normalized "schema.table" or bare name for views
    kind: str  # "table" | "view" | "mv"
    fn: Callable | None = None  # body: fn(ctx) -> DataFrame
    sql: str | None = None  # SELECT body for SQL MVs
    comment: str = ""
    table_properties: dict = field(default_factory=dict)
    expectations: list[Expectation] = field(default_factory=list)
    streaming: bool = False
    cluster_by: tuple = ()
    partition_by: tuple = ()
    bucket_by: tuple = ()  # (n_buckets, col, ...) — hash-bucketed table layout
    sort_by: tuple = ()  # within-bucket sort columns (requires bucket_by)


class _Resolver:
    """Per-build memoized recursive resolver (one per ``Pipeline.dataframe`` call)."""

    def __init__(self, pipeline: "Pipeline", spark: SparkSession):
        self.pipeline = pipeline
        self.spark = spark
        self.cache: dict[str, DataFrame] = {}
        self.stack: list[str] = []

    # --- the ctx API exposed to dataset bodies -------------------------
    def read(self, name: str) -> DataFrame:
        """Batch read of a sibling pipeline dataset (``dlt.read`` equivalent)."""
        return self._resolve(name)

    def read_stream(self, name: str) -> DataFrame:
        """Streaming read — batch-incremental mode returns the batch frame.

        Reference uses ``dlt.readStream``/``dlt.read_stream``
        (Silver_orders.py:12,26); with availableNow-trigger semantics a batch
        read over the unprocessed data is behaviorally identical, and it is
        what the engine's batch mode executes.
        """
        return self._resolve(name)

    @property
    def spark_session(self) -> SparkSession:
        return self.spark

    # -------------------------------------------------------------------
    def _resolve(self, name: str) -> DataFrame:
        key = self.pipeline._lookup(name)
        if key is None:
            raise KeyError(
                f"unknown dataset {name!r}; registered: {sorted(self.pipeline._defs)}"
            )
        if key in self.cache:
            return self.cache[key]
        if key in self.stack:
            cycle = " -> ".join(self.stack + [key])
            raise ValueError(f"dependency cycle in pipeline: {cycle}")
        d = self.pipeline._defs[key]
        self.stack.append(key)
        try:
            if d.sql is not None:
                df = self._run_sql(d)
            else:
                df = d.fn(self)
        finally:
            self.stack.pop()
        df = apply_expectations(df, d.expectations)
        self.cache[key] = df
        return df

    def _run_sql(self, d: DatasetDef) -> DataFrame:
        """Execute a SQL dataset body, resolving ``LIVE.x`` / ``schema.x`` refs.

        Every referenced pipeline dataset is materialized as a session temp
        view with a mangled name, and the SQL text is rewritten to use the
        mangled names before ``spark.sql`` — the engine's equivalent of DLT's
        ``LIVE.`` resolution (fact_order_items.sql:28,86-112).
        """
        sql = d.sql
        refs = self.pipeline._sql_refs(sql)
        for ref in refs:
            key = self.pipeline._lookup(ref)
            if key == d.name:
                continue
            dep_df = self._resolve(key)
            view = "__mdl_" + key.replace(".", "__")
            dep_df.createOrReplaceTempView(view)
            sql = re.sub(
                r"(?<![A-Za-z0-9_.])" + re.escape(ref) + r"(?![A-Za-z0-9_])",
                view,
                sql,
                flags=re.IGNORECASE,
            )
        return self.spark.sql(sql)


class Pipeline:
    """Registry + runner for a declarative medallion pipeline."""

    def __init__(self, name: str = "pipeline"):
        self.name = name
        self._defs: dict[str, DatasetDef] = {}

    # --- declaration API ----------------------------------------------
    def view(self, name: str | None = None, comment: str = ""):
        """Register a named, non-materialized staging dataflow.

        Equivalent of ``@dlt.view`` (Silver_orders.py:6-13).
        """
        return self._decorator(kind="view", name=name, comment=comment)

    def table(
        self,
        name: str | None = None,
        comment: str = "",
        table_properties: dict | None = None,
        streaming: bool = False,
        partition_by: tuple = (),
        cluster_by: tuple = (),
        bucket_by: tuple = (),
        sort_by: tuple = (),
    ):
        """Register a (streaming) table. Equivalent of ``@dlt.table``
        (Silver_orders.py:16-21, bronze_ingestion.py:38-45).

        ``bucket_by=(n, col, ...)`` hash-buckets the stored table so joins
        and aggregations on those columns read pre-shuffled data (Spark's
        bucketed-table optimization — no Exchange at query time).
        """
        return self._decorator(
            kind="table",
            name=name,
            comment=comment,
            table_properties=table_properties or {},
            streaming=streaming,
            partition_by=tuple(partition_by),
            cluster_by=tuple(cluster_by),
            bucket_by=tuple(bucket_by),
            sort_by=tuple(sort_by),
        )

    def materialized_view(
        self,
        name: str,
        sql: str | None = None,
        comment: str = "",
        table_properties: dict | None = None,
        expectations: list[Expectation] | None = None,
        cluster_by: tuple = (),
    ):
        """Register a full-refresh materialized view from SQL text or a body fn.

        Equivalent of ``CREATE OR REFRESH MATERIALIZED VIEW``
        (scripts/gold/*.sql:1). When ``sql`` is given this registers directly;
        otherwise returns a decorator for a Python body.
        """
        key = _normalize(name)
        if sql is not None:
            self._register(
                DatasetDef(
                    name=key,
                    kind="mv",
                    sql=sql,
                    comment=comment,
                    table_properties=table_properties or {},
                    expectations=list(expectations or []),
                    cluster_by=tuple(cluster_by),
                )
            )
            return None
        return self._decorator(
            kind="mv",
            name=name,
            comment=comment,
            table_properties=table_properties or {},
            cluster_by=tuple(cluster_by),
        )

    # expectation decorators — attach to the body fn, collected by _decorator.
    def expect_all(self, rules: dict[str, str]):
        """Warn-level expectations (``@dlt.expect_all``, Silver_orders.py:23-24)."""
        return self._expect_decorator([Expectation(n, p, WARN) for n, p in rules.items()])

    def expect(self, name: str, predicate: str):
        """Single warn expectation (``@dlt.expect``, silver_sellers.py:48)."""
        return self._expect_decorator([Expectation(name, predicate, WARN)])

    def expect_all_or_drop(self, rules: dict[str, str]):
        return self._expect_decorator([Expectation(n, p, DROP) for n, p in rules.items()])

    def expect_all_or_fail(self, rules: dict[str, str]):
        """Fail-level (``ON VIOLATION FAIL UPDATE``, fact_order_items.sql:3-7)."""
        return self._expect_decorator([Expectation(n, p, FAIL) for n, p in rules.items()])

    @staticmethod
    def _expect_decorator(exps: list[Expectation]):
        def deco(fn):
            existing = getattr(fn, "_mdl_expectations", [])
            fn._mdl_expectations = existing + exps
            return fn

        return deco

    def _decorator(self, kind: str, name: str | None, comment: str = "", **kw):
        def deco(fn):
            ds_name = _normalize(name or fn.__name__)
            exps = list(getattr(fn, "_mdl_expectations", []))
            self._register(
                DatasetDef(
                    name=ds_name, kind=kind, fn=fn, comment=comment, expectations=exps, **kw
                )
            )
            return fn

        return deco

    def _register(self, d: DatasetDef) -> None:
        if not _NAME_RE.match(d.name):
            raise ValueError(f"invalid dataset name: {d.name!r}")
        if d.name in self._defs:
            raise ValueError(f"duplicate dataset definition: {d.name!r}")
        self._defs[d.name] = d

    # --- querying ------------------------------------------------------
    def dataframe(self, spark: SparkSession, name: str) -> DataFrame:
        """Resolve a dataset to a lazy DataFrame (views mode — no I/O)."""
        return _Resolver(self, spark).read(name)

    def datasets(self) -> list[DatasetDef]:
        return list(self._defs.values())

    def _lookup(self, name: str) -> str | None:
        """Registry key for a dataset reference, or None.

        ``LIVE.x`` resolves against table basenames across schemas (DLT
        resolves LIVE-namespace references to pipeline datasets regardless of
        their target schema — fact_order_items.sql:28 references
        ``LIVE.silver_order_payments`` which is ``silver.silver_order_payments``).
        """
        key = _normalize(name)
        if key in self._defs:
            return key
        if "." not in key:
            matches = [k for k in self._defs if k.rpartition(".")[2] == key]
            if len(matches) == 1:
                return matches[0]
        return None

    def _sql_refs(self, sql: str) -> list[str]:
        """Dataset references inside a SQL body (dotted identifiers only),
        longest-first so that ``a.b.c`` is rewritten before ``b.c``."""
        found: set[str] = set()
        for m in re.finditer(
            r"(?i)\b[a-z_][a-z0-9_]*(?:\.[a-z_][a-z0-9_]*){1,2}\b", sql
        ):
            tok = m.group(0)
            if self._lookup(tok) is not None:
                found.add(tok)
        return sorted(found, key=len, reverse=True)

    # --- execution -----------------------------------------------------
    def run(
        self,
        spark: SparkSession,
        warehouse: str | None = None,
        collect_metrics: bool = True,
        fmt: str = "parquet",
    ) -> dict:
        """Materialize every table/MV dataset in dependency order.

        Tables append-or-overwrite as parquet managed tables under the Spark
        warehouse (Delta when available — see sources/sinks.py); views stay
        virtual. Returns per-dataset row counts and expectation metrics.

        Full-refresh semantics for MVs mirror the reference's gold layer
        ("Materialized views / Full Refresh", docs/pipeline-flow.png).
        """
        from ..sources.sinks import write_table  # late import to avoid cycle

        resolver = _Resolver(self, spark)
        report: dict[str, dict] = {}
        for d in self._defs.values():
            if d.kind == "view":
                continue
            df = resolver.read(d.name)
            # fail gate runs on the UN-observed plan: its isEmpty probe
            # short-circuits, which would freeze an observation at partial
            # counts (see observe_expectations docstring)
            enforce_fail(d.name, df, d.expectations)
            obs = None
            if collect_metrics:
                # row count + warn violation counts ride the write job —
                # one scan materializes the table AND its metrics
                df, obs = observe_expectations(df, d.expectations)
            n = write_table(
                spark, df, d, warehouse=warehouse, fmt=fmt, count=obs is None
            )
            entry: dict = {}
            if obs is not None:
                m = obs.get
                entry["rows"] = int(m["__rows"])
                warn_counts = {k: int(v or 0) for k, v in m.items() if k != "__rows"}
                if warn_counts:
                    entry["expectations"] = warn_counts
            else:
                entry["rows"] = n
            report[d.name] = entry
        return report


def _table_ident(key: str) -> str:
    schema, _, table = key.rpartition(".")
    if not schema:
        return f"default.`{table}`"
    return f"`{schema}`.`{table}`"
