"""Dtype-kind collapse shared by the local correctness gate
(tools/check_correctness.py), the dtype recorder
(tools/record_spark_dtypes.py), and the oracle-dtype pytest
(tests/test_oracle_dtypes.py).

The driver's order-insensitive value hash treats integer WIDTHS alike
(int32 vs int64 hash the same values) but int-vs-float as a mismatch:
DuckDB materializing a HUGEINT sum as float64 against Spark's int64 is
exactly what shipped the two r4 hash reds (VERDICT r4 "What's wrong" #1).
Collapsing to kinds keeps the gate faithful to that semantics.
"""

from __future__ import annotations

import pandas as pd


def kind(dtype) -> str:
    """Collapse a pandas dtype to its driver-hash-relevant kind."""
    k = pd.api.types.pandas_dtype(dtype).kind
    return "int" if k in "iu" else {"f": "float", "b": "bool"}.get(k, k)


def frame_kinds(df: pd.DataFrame) -> dict[str, str]:
    """Column → kind map for a materialized result frame."""
    return {c: kind(df[c].dtype) for c in df.columns}
