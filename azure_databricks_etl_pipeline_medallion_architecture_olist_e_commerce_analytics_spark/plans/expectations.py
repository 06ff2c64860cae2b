"""Row-level data-quality expectations (warn / drop / fail).

Re-implements the DLT expectation surface on open-source PySpark
(behavioral spec, not a port):

- ``@dlt.expect_all({name: predicate, ...})`` — warn-level: record violation
  counts, keep all rows (reference: /root/reference/scripts/silver/Silver_orders.py:23-24,
  order_payments.py:26-32).
- ``@dlt.expect(name, predicate)`` — single warn expectation
  (reference: silver_sellers.py:48).
- SQL ``CONSTRAINT n EXPECT (p) ON VIOLATION FAIL UPDATE`` — abort the refresh
  if any row violates (reference: scripts/gold/fact_order_items.sql:3-7).
- ``ON VIOLATION DROP ROW`` — filter violating rows (DLT public semantics;
  unused by the reference but part of the API surface).

Scale notes
-----------
Predicates are compiled with ``F.expr`` so they stay JVM-side inside
whole-stage codegen — no Python round trip. Warn metrics are computed in ONE
aggregate pass over the dataset (a single job with a map-side partial
aggregation; no per-predicate jobs). Fail mode short-circuits with
``isEmpty()`` on the violation filter, which stops scanning at the first
violating row per partition.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WARN = "warn"
DROP = "drop"
FAIL = "fail"


@dataclass(frozen=True)
class Expectation:
    name: str
    predicate: str  # SQL boolean expression over the dataset's columns
    action: str = WARN  # warn | drop | fail

    def as_column(self):
        return F.expr(self.predicate)


class ExpectationViolation(Exception):
    """Raised when a fail-level expectation has violating rows."""

    def __init__(self, dataset: str, failed: list[tuple[str, int]]):
        self.dataset = dataset
        self.failed = failed
        detail = ", ".join(f"{n} ({c} rows)" for n, c in failed)
        super().__init__(f"dataset {dataset!r}: fail-level expectations violated: {detail}")


def apply_expectations(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Apply drop-mode expectations to the DataFrame plan (lazy).

    Warn/fail expectations do not change the row set; they are evaluated by
    :func:`expectation_metrics` / :func:`enforce_fail` at materialization time.
    """
    drops = [e for e in expectations if e.action == DROP]
    if not drops:
        return df
    cond = drops[0].as_column()
    for e in drops[1:]:
        cond = cond & e.as_column()
    return df.filter(cond)


def expectation_metrics(df: DataFrame, expectations: list[Expectation]) -> dict[str, int]:
    """Violation count per expectation, computed in one aggregate job.

    ``sum(case when not (pred) or pred is null then 1 else 0)`` per predicate —
    a null predicate result counts as a violation, matching DLT's
    "expectation not met" semantics for NULL.
    """
    checked = [e for e in expectations if e.action in (WARN, FAIL)]
    if not checked:
        return {}
    aggs = [
        F.sum(
            F.when(F.coalesce(e.as_column().cast("boolean"), F.lit(False)), F.lit(0)).otherwise(F.lit(1))
        ).alias(e.name)
        for e in checked
    ]
    row = df.agg(*aggs).collect()[0]
    return {e.name: int(row[e.name] or 0) for e in checked}


def observe_expectations(df: DataFrame, expectations: list[Expectation]):
    """Attach warn-expectation violation counters plus a row count to the
    plan as an :class:`~pyspark.sql.Observation` — the metrics ride whatever
    action materializes the DataFrame next (normally the table write), so
    expectation reporting costs ZERO additional scans. This is the mechanism
    DLT itself uses for its expectation metrics (``observe`` feeds the
    Spark listener bus), where :func:`expectation_metrics` pays one extra
    aggregate job.

    Returns ``(df_observed, observation)``; read ``observation.get`` only
    AFTER an action that scans every row. In particular, do not run the
    short-circuiting :func:`enforce_fail` on the observed plan — its
    ``isEmpty`` probe stops early and would freeze the observation at
    partial counts.
    """
    from pyspark.sql import Observation

    checked = [e for e in expectations if e.action == WARN]
    aggs = [F.count(F.lit(1)).alias("__rows")] + [
        F.sum(
            F.when(
                F.coalesce(e.as_column().cast("boolean"), F.lit(False)), F.lit(0)
            ).otherwise(F.lit(1))
        ).alias(e.name)
        for e in checked
    ]
    obs = Observation()
    return df.observe(obs, *aggs), obs


def enforce_fail(dataset: str, df: DataFrame, expectations: list[Expectation]) -> None:
    """Raise :class:`ExpectationViolation` if any fail-level predicate has violations.

    Single filtered scan over the union of fail predicates; ``isEmpty`` lets
    Spark stop at the first violating row instead of counting all of them.
    """
    fails = [e for e in expectations if e.action == FAIL]
    if not fails:
        return
    viol = None
    for e in fails:
        bad = ~F.coalesce(e.as_column().cast("boolean"), F.lit(False))
        viol = bad if viol is None else (viol | bad)
    if df.filter(viol).isEmpty():
        return
    # Violations exist: now pay for exact per-expectation counts in one pass
    # (only on the failure path, so the happy path stays one cheap scan).
    counts = expectation_metrics(df, [Expectation(e.name, e.predicate, WARN) for e in fails])
    failed = [(n, c) for n, c in counts.items() if c > 0]
    raise ExpectationViolation(dataset, failed)
