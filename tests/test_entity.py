"""Fuzzy entity resolution (queries/entity.py)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.text(alphabet="abcdefgh #0123456789", min_size=5, max_size=30),
    st.data(),
)
@settings(max_examples=200, deadline=None)
def test_blocking_keys_complete_for_single_deletion(name, data):
    """The documented recall guarantee: for len >= 5, ANY single-char
    deletion preserves the 2-char prefix or the 2-char suffix."""
    pos = data.draw(st.integers(0, len(name) - 1))
    dirty = name[:pos] + name[pos + 1 :]
    assert dirty[:2] == name[:2] or dirty[-2:] == name[-2:]


def test_fuzzy_match_recovers_typo(spark, tmp_path):
    """End-to-end on a handcrafted master: each dirty name (one deletion)
    must match its source name at dist 1 unless an exact-match master
    exists at dist 0 -- and ties break by master_id."""
    import shutil

    from gmail_bigquery_etl_spark.queries.entity import er_fuzzy_match_master

    rows = [
        (1, "alpha widget"),
        (2, "gamma widget"),
        (3, "delta spring"),
        (4, "delta sprng"),  # exactly 3's dirty form, itself a master
    ]
    df = spark.createDataFrame(rows, "p_partkey bigint, p_name string")
    d = tmp_path / "sf"
    d.mkdir()
    df.coalesce(1).write.parquet(str(d / "part.parquet"))
    try:
        got = {
            r.dirty_id: (r.master_id, r.dist)
            for r in er_fuzzy_match_master(spark, str(d)).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    # dirty(3) = "delta sprng" (pos (3*7)%12=9 deletes the 'i') is
    # EXACTLY master 4's name -> the dist-0 exact match must beat the
    # dist-1 deletion source (master 3)
    assert got[3] == (4, 0)
    # every dirty record matches at distance <= 1 (the deletion source
    # is always a candidate, by the blocking guarantee)
    assert all(dist <= 1 for _, dist in got.values())
    assert set(got) == {1, 2, 3, 4}
