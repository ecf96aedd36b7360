"""Errors-as-data: per-row failures become columns, not job aborts.

The reference swallows per-unit failures and continues (try/except around
every message/batch/token -- etl_service/main.py:102-104, 143-145, 188-191,
215-217, 244-250; SURVEY.md T6/ST5). The Spark-native restatement: fallible
row-level operations run through try_* expressions that yield NULL instead
of throwing (ANSI mode throws otherwise), paired with an error-tag column
so failures are queryable, filterable, and countable downstream -- a task
retry replays deterministically, and one malformed row never kills a 100 TB
job.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def parse_timestamp_or_error(
    col: Column | str, fmt: str | None = None, error_tag: str = "PARSE_ERROR"
) -> tuple[Column, Column]:
    """(parsed_ts, error) pair: NULL input -> (NULL, NULL); unparseable
    input -> (NULL, tag); success -> (ts, NULL).

    Default format is the RFC-2822 Date header via headers.parse_rfc2822
    (Spark's datetime parser treats day-of-week as format-only, so 'EEE'
    cannot be parsed directly -- the shared helper strips it)."""
    c = F.col(col) if isinstance(col, str) else col
    if fmt is None:
        from ..functions.headers import parse_rfc2822

        ts = parse_rfc2822(c)
    else:
        ts = F.try_to_timestamp(c, F.lit(fmt))
    err = F.when(c.isNotNull() & ts.isNull(), F.lit(error_tag))
    return ts, err


def divide_or_error(
    num: Column | str, den: Column | str, error_tag: str = "DIV_BY_ZERO"
) -> tuple[Column, Column]:
    """ANSI-safe division with an error tag instead of an exception."""
    n = F.col(num) if isinstance(num, str) else num
    d = F.col(den) if isinstance(den, str) else den
    val = F.try_divide(n, d)
    err = F.when(
        n.isNotNull() & d.isNotNull() & val.isNull(), F.lit(error_tag)
    )
    return val, err
