"""Literal-map lookup columns.

The reference expands Brazilian state codes with a ``create_map`` literal
lookup instead of 27 nested WHENs, noting it is "much faster"
(/root/reference/scripts/silver/silver_customers.py:64-72,
silver_sellers.py:63-91). A map literal is a single Catalyst expression —
constant-folded, codegen'd, no join and no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mapping_column(mapping: dict, key: Column, default: Column | None = None) -> Column:
    """``create_map(lit(k1), lit(v1), ...)[key]`` with optional fallback.

    With ``default`` the result is ``coalesce(map[key], default)`` — the
    reference's unmapped-state fallback pattern (silver_customers.py:78).
    """
    pairs = [F.lit(x) for kv in mapping.items() for x in kv]
    looked_up = F.create_map(*pairs)[key]
    if default is not None:
        return F.coalesce(looked_up, default)
    return looked_up
