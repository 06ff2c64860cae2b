"""User-defined aggregate functions (pandas GROUPED_AGG).

NOTE: no ``from __future__ import annotations`` here — pandas_udf infers
GROUPED_AGG from the REAL ``pd.Series -> scalar`` type hints, and postponed
(string) annotations break that inference.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def sum_of_squares(v: pd.Series) -> int:
    """Σ v² as an Arrow-batched numpy reduction — integer-exact, so a SQL
    oracle reproduces it bit-for-bit."""
    import numpy as np

    a = v.to_numpy(dtype="int64")
    return int(np.dot(a, a))
