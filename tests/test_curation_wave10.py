"""Round-10 curation wave: quality-rule battery + PII scrub.

Both gates are planted-control designs (the duplicate-payments /
profile_ind_candidates precedent): the fixture text is symbol- and
digit-free, so every failure and every PII hit has KNOWN md5-selected
membership these tests recompute independently.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.catalog import load_table
from gmail_bigquery_etl_spark.queries import ALL_QUERIES

SF = "/root/testdata/sf0.01"


def _planted_ids(spark, mod):
    rows = load_table(spark, SF, "documents").select("doc_id").collect()
    out = set()
    for r in rows:
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:15], 16)
        if h % mod == 0:
            out.add(r.doc_id)
    return out, len(rows)


def test_quality_battery_planted_symbol_failures(spark):
    """symbol_tokens must fail EXACTLY the md5%17 planted slice; every
    rule (and the conjunction) must be non-vacuous -- real passes AND
    real failures."""
    rows = {
        r.rule: r
        for r in ALL_QUERIES["curation_quality_battery"](
            spark, SF
        ).collect()
    }
    assert set(rows) == {
        "min_tokens",
        "mean_word_len",
        "stopword_count",
        "symbol_tokens",
        "alpha_fraction",
        "all_rules",
    }
    planted, n_docs = _planted_ids(spark, 17)
    assert rows["symbol_tokens"].n_fail == len(planted) > 0
    assert rows["symbol_tokens"].n_pass == n_docs - len(planted)
    for r in rows.values():
        assert r.n_pass + r.n_fail == n_docs
        assert r.n_pass > 0 and r.n_fail > 0, r.rule
    # the conjunction can never pass more docs than its weakest rule
    assert rows["all_rules"].n_pass <= min(
        r.n_pass for k, r in rows.items() if k != "all_rules"
    )


def test_pii_scrub_planted_membership_and_zero_residual(spark):
    """Per class: matches == the md5-planted slice exactly (each doc
    plants exactly one value per selected class), residual after the
    scrub pass is zero, and surrogates are 16-hex strings."""
    rows = {
        r.pii_class: r
        for r in ALL_QUERIES["curation_pii_scrub"](spark, SF).collect()
    }
    assert set(rows) == {"email", "phone", "ssn"}
    for cls, mod in (("email", 7), ("phone", 11), ("ssn", 13)):
        planted, _ = _planted_ids(spark, mod)
        r = rows[cls]
        assert r.n_docs_hit == len(planted) > 0, cls
        assert r.n_matches == len(planted), cls
        assert r.n_residual == 0, cls
        assert len(r.min_surrogate) == 16
        assert len(r.max_surrogate) == 16
        assert r.min_surrogate <= r.max_surrogate
    # distinct values: emails embed doc_id (all distinct); phone/ssn
    # embed doc_id % 10000 (distinct at this fixture scale too)
    assert rows["email"].n_distinct_vals == rows["email"].n_matches
