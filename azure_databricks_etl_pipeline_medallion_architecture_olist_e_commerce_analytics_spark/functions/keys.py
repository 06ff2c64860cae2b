"""Deterministic surrogate keys.

The reference derives every surrogate key as SHA-256 over '|'-joined natural
keys so keys are stable across incremental refreshes
(/root/reference/scripts/gold/fact_order_items.sql:41-42, dim_orders.sql:14).
Pure JVM-side expression — stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def surrogate_key(*cols) -> Column:
    """``sha2(concat(cast(c1 as string),'|',cast(c2 as string),...), 256)``."""
    parts: list[Column] = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit("|"))
        col = c if isinstance(c, Column) else F.col(c)
        parts.append(col.cast("string"))
    return F.sha2(F.concat(*parts), 256)
