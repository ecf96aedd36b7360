"""Fuzzy entity resolution (queries/entity.py, operators/er_blocking.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_deletion1_variants_complete_for_single_deletion(spark):
    """The recall contract of the deletion-1 neighborhood: for EVERY
    (name, deletion position), the dirty string is a member of the
    name's variant array -- checked through the actual Spark Column
    implementation over a deterministic sweep of names (mixed alphabet,
    spaces, unicode, repeats) and every position."""
    from gmail_bigquery_etl_spark.operators.er_blocking import (
        deletion1_variants,
    )

    names = [
        "a",
        "ab",
        "aa",
        "small ring",
        "red  widget",
        " lead pad",
        "x" * 30,
        "naïve café",
        "tab\tsep",
    ]
    rows = [
        (n, n[:p] + n[p + 1 :])
        for n in names
        for p in range(len(n))
    ]
    df = spark.createDataFrame(rows, "name string, dirty string")
    bad = df.where(
        ~F.array_contains(deletion1_variants("name"), F.col("dirty"))
    ).count()
    assert bad == 0
    # the identity variant is always present too (deletion distance 0)
    bad0 = (
        spark.createDataFrame([(n,) for n in names + [""]], "name string")
        .where(~F.array_contains(deletion1_variants("name"), F.col("name")))
        .count()
    )
    assert bad0 == 0


def test_deletion1_block_cap_exclusion_exact(spark):
    """The audited-exclusion contract (the LSH mega-bucket idiom): the
    capped index plus the overcap audit partition the uncapped
    neighborhood EXACTLY, and candidates lose exactly the over-cap
    block's pairs."""
    from gmail_bigquery_etl_spark.operators.er_blocking import (
        deletion1_candidates,
        deletion1_index,
        deletion1_overcap_variants,
    )

    master = spark.createDataFrame(
        [(1, "xa"), (2, "xb"), (3, "xc")], "master_id bigint, m_name string"
    )
    # variant "x" is shared by all three masters (block 3)
    over = deletion1_overcap_variants(master, "m_name", max_block=2).collect()
    assert [(r._variant, r.block_size) for r in over] == [("x", 3)]
    idx = deletion1_index(master, "m_name", max_block=2)
    got = {(r.master_id, r._variant) for r in idx.collect()}
    full = {
        (mid, v)
        for mid, name in [(1, "xa"), (2, "xb"), (3, "xc")]
        for v in {name, name[1:], name[:1]}
    }
    # exact partition: capped index == full neighborhood minus the
    # over-cap block's rows
    assert got == full - {(1, "x"), (2, "x"), (3, "x")}
    dirty = spark.createDataFrame(
        [(10, "x"), (11, "xa")], "dirty_id bigint, d_name string"
    )
    cand = deletion1_candidates(
        dirty, master, "d_name", "m_name", "dirty_id", "master_id", max_block=2
    )
    pairs = {(r.dirty_id, r.master_id) for r in cand.collect()}
    # dirty "x" only reached masters through the excluded block -> no
    # candidates; dirty "xa" still matches master 1 via variants "xa"/"a"
    assert pairs == {(11, 1)}


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
