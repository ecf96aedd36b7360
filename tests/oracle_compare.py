"""Order-insensitive result comparison between a Spark DataFrame and a DuckDB
oracle result, mirroring the driver's CORRECTNESS gate: columns sorted by
name, rows canonicalized and sorted, values compared with a small float
tolerance (registered queries already round libm-dependent values on both
sides; the tolerance here only absorbs last-ulp noise)."""

from __future__ import annotations

import datetime as _dt
import decimal
import math
from typing import Any

import numpy as np
import pandas as pd

FLOAT_DECIMALS = 6


def _canon_value(v: Any) -> Any:
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if v is pd.NaT:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        if math.isinf(v):
            return f"inf:{v > 0}"
        return f"f:{round(float(v), FLOAT_DECIMALS):.{FLOAT_DECIMALS}f}"
    if isinstance(v, decimal.Decimal):
        return f"f:{round(float(v), FLOAT_DECIMALS):.{FLOAT_DECIMALS}f}"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return f"i:{int(v)}"
    if isinstance(v, (np.bool_, bool)):
        return f"b:{bool(v)}"
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return "t:" + v.isoformat()
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return "t:" + v.isoformat()
    if isinstance(v, _dt.date):
        return "d:" + v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(str(_canon_value(x)) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(f"{k}={_canon_value(x)}" for k, x in sorted(v.items()))
            + "}"
        )
    return "s:" + str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    """Columns sorted by name, every value canonicalized, rows sorted."""
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [
        tuple(_canon_value(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def diff_report(a: list[tuple], b: list[tuple], limit: int = 5) -> str:
    sa, sb = set(a), set(b)
    only_a = list(sa - sb)[:limit]
    only_b = list(sb - sa)[:limit]
    lines = [f"spark rows={len(a)} oracle rows={len(b)}"]
    if only_a:
        lines.append("only in spark: " + "; ".join(map(str, only_a)))
    if only_b:
        lines.append("only in oracle: " + "; ".join(map(str, only_b)))
    return "\n".join(lines)
