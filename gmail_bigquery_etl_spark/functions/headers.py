"""Email-header column functions.

These reproduce, as Catalyst-optimizable higher-order functions (never
Python UDFs), the record-build idioms of the reference:

* header_value   -- the ``next((h["value"] for h in headers if
                    h["name"].lower() == name), None)`` idiom
                    (reference etl_service/main.py:199-202): first match,
                    case-insensitive on the header *name*, NULL if absent.
* flatten_labels -- ``",".join(resp.get("labelIds", []))``
                    (reference etl_service/main.py:203): array -> CSV string,
                    empty string (not NULL) for a missing/empty array.
* label_predicate -- the Gmail search predicate
                    ``in:inbox OR in:sent OR in:trash -in:spam -in:allmail``
                    (reference etl_service/main.py:160) as a boolean Column
                    over a labels array.
* parse_rfc2822  -- the idiomatic upgrade the reference never does
                    (main.py:202 keeps Date raw): parse the RFC-2822 Date
                    header to a TimestampType.

All of these stay inside whole-stage codegen -- header extraction at 100 TB
is a per-row expression, not a shuffle, so JVM-side evaluation is the whole
ballgame.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def header_value(headers: Column | str, name: str) -> Column:
    """First header value whose name matches case-insensitively; NULL if none.

    Exactly the reference's first-match semantics (etl_service/main.py:199):
    duplicate headers keep the first occurrence in array order.
    """
    col = F.col(headers) if isinstance(headers, str) else headers
    matched = F.filter(col, lambda h: F.lower(h["name"]) == name.lower())
    # try_element_at is 1-based and NULL on out-of-range (ANSI-safe),
    # matching the generator's ``None`` default.
    return F.try_element_at(matched, F.lit(1))["value"]


def flatten_labels(labels: Column | str) -> Column:
    """Array of labels -> CSV string; missing/empty array -> '' (not NULL).

    Parity with ``",".join(resp.get("labelIds", []))`` (main.py:203).
    """
    col = F.col(labels) if isinstance(labels, str) else labels
    return F.array_join(F.coalesce(col, F.array().cast("array<string>")), ",")


def label_predicate(labels: Column | str) -> Column:
    """(INBOX or SENT or TRASH) and not SPAM — the reference's pushed source
    predicate (main.py:160). ``-in:allmail`` excludes nothing real (ALLMAIL
    is a virtual view), so it is not modeled as a label test.
    """
    col = F.col(labels) if isinstance(labels, str) else labels
    wanted = (
        F.array_contains(col, "INBOX")
        | F.array_contains(col, "SENT")
        | F.array_contains(col, "TRASH")
    )
    return wanted & ~F.array_contains(col, "SPAM")


def parse_rfc2822(raw: Column | str) -> Column:
    """Best-effort RFC-2822 Date header -> timestamp; NULL when unparseable.

    The reference stores the raw string (main.py:202); we keep the raw column
    and add this derived one.
    """
    col = F.col(raw) if isinstance(raw, str) else raw
    # Strip an optional leading day-of-week ("Tue, ") then try the common
    # RFC-2822 layouts. try_to_timestamp returns NULL instead of raising.
    stripped = F.regexp_replace(col, r"^[A-Za-z]{3},\s*", "")
    return F.coalesce(
        F.try_to_timestamp(stripped, F.lit("d MMM yyyy HH:mm:ss Z")),
        F.try_to_timestamp(stripped, F.lit("d MMM yyyy HH:mm:ss")),
        F.try_to_timestamp(col),
    )
