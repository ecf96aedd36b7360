"""Property-based tests (hypothesis) for the CDC merge operator: random
base tables and key-unique change batches (upserts, deletes, inserts,
no-ops) must agree with a plain-Python dict-fold spec of MERGE semantics.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gmail_bigquery_etl_spark.operators.merge import merge_upsert

KEYS = st.integers(min_value=0, max_value=12)
VALS = st.integers(min_value=-5, max_value=5)

BASE = st.dictionaries(KEYS, VALS, max_size=8)
# change batch: key -> (value, is_delete); dict => key-unique by construction
CHANGES = st.dictionaries(KEYS, st.tuples(VALS, st.booleans()), max_size=8)


def _spec_merge(base: dict, changes: dict) -> dict:
    out = dict(base)
    for k, (v, is_del) in changes.items():
        if is_del:
            out.pop(k, None)
        else:
            out[k] = v
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(base=BASE, changes=CHANGES, broadcast=st.booleans())
def test_merge_upsert_matches_dict_fold_spec(spark, base, changes, broadcast):
    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()], "id bigint, v bigint"
    )
    ch_df = spark.createDataFrame(
        [(k, v, d) for k, (v, d) in changes.items()],
        "id bigint, v bigint, is_delete boolean",
    )
    got = {
        r["id"]: r["v"]
        for r in merge_upsert(
            base_df, ch_df, ["id"], delete_col="is_delete",
            broadcast_hint=broadcast,
        ).collect()
    }
    assert got == _spec_merge(base, changes)
