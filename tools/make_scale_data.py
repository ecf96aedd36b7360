"""Generate a scratch N-times replica of the documents/embeddings fixtures
for scale-curve benchmarking (the driver ships sf<=0.1; the 100 TB claims
deserve at least one measured 10x point).

Replicas are de-correlated so the near-dup problem SHAPE is preserved
(10x data => ~10x true pairs, not a dense cross-replica clique):
  * documents: every token gets a per-replica prefix, so replica k shares
    no shingles with replica j (jaccard 0 across replicas);
  * embeddings: the vector is circularly shifted by k components, so
    cross-replica cosine is uncorrelated while intra-replica neighbor
    structure is untouched.

Usage: python tools/make_scale_data.py [--mult 10] [--src /root/testdata/sf0.1]
                                       [--dst scratch/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gmail_bigquery_etl_spark.session import get_spark  # noqa: E402

ID_STRIDE = 1_000_000  # far above the +100000/+200000 augmented-corpus offsets


def replicate_documents(spark, src: str, dst: str, mult: int) -> int:
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    parts = []
    for k in range(mult):
        if k == 0:
            parts.append(docs)
            continue
        prefix = f"r{k}x"
        parts.append(
            docs.select(
                (F.col("doc_id") + k * ID_STRIDE).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda t: F.concat(F.lit(prefix), t),
                    ),
                    " ",
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "documents.parquet")
    )
    return out.count()


def replicate_embeddings(spark, src: str, dst: str, mult: int) -> int:
    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()[0])
    parts = []
    for k in range(mult):
        if k == 0:
            parts.append(emb)
            continue
        s = k % dim or 1
        shifted = F.concat(
            F.slice(F.col("embedding"), s + 1, dim - s),
            F.slice(F.col("embedding"), 1, s),
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + k * ID_STRIDE).alias("vec_id"),
                shifted.alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "embeddings.parquet")
    )
    return out.count()


def replicate_events(spark, src: str, dst: str, mult: int) -> int:
    """Replica k shifts event_id AND user_id by k*STRIDE: per-user time
    structure (sessions, purchase/click interleaving) is preserved while
    the user population grows mult-fold -- the realistic way event volume
    scales, so per-user joins/windows see mult-x keys, not mult-x rows per
    key."""
    from gmail_bigquery_etl_spark.catalog import load_table

    ev = load_table(spark, src, "events")
    parts = []
    for k in range(mult):
        parts.append(
            ev.select(
                (F.col("event_id") + k * ID_STRIDE).alias("event_id"),
                "ts",
                (F.col("user_id") + k * ID_STRIDE).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "events.parquet")
    )
    return out.count()


def replicate_orders(spark, src: str, dst: str, mult: int) -> int:
    """Replica k shifts o_orderkey and o_custkey by k*STRIDE. The stride
    is a multiple of 5, so the CDC change-batch selector (o_orderkey % 5)
    picks exactly the same per-replica subset; the delete selector (% 15)
    shifts phase per replica but keeps its ~1/15 density."""
    orders = spark.read.parquet(os.path.join(src, "orders.parquet"))
    parts = []
    for k in range(mult):
        parts.append(
            orders.select(
                (F.col("o_orderkey") + k * ID_STRIDE).alias("o_orderkey"),
                (F.col("o_custkey") + k * ID_STRIDE).alias("o_custkey"),
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "orders.parquet")
    )
    return out.count()


def replicate_lineitem(spark, src: str, dst: str, mult: int) -> int:
    """Replica k shifts l_orderkey by k*STRIDE; part/supp keys and the
    value columns stay as-is, so each replica contributes an independent
    copy of the basket/pair structure (10x baskets => ~10x co-occurrence
    pairs, not a cross-replica blowup)."""
    li = spark.read.parquet(os.path.join(src, "lineitem.parquet"))
    others = [c for c in li.columns if c != "l_orderkey"]
    parts = []
    for k in range(mult):
        parts.append(
            li.select(
                (F.col("l_orderkey") + k * ID_STRIDE).alias("l_orderkey"),
                *others,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "lineitem.parquet")
    )
    return out.count()


def replicate_part(spark, src: str, dst: str, mult: int) -> int:
    """Replica k shifts p_partkey by k*STRIDE and prefixes every name
    token with a per-replica tag -- names are DISJOINT across replicas,
    so the ER master grows mult-fold (mult-x distinct names) and the
    blocking joins see mult-x keys rather than mult-x-deep collision
    buckets: the realistic way a master dimension scales."""
    part = spark.read.parquet(os.path.join(src, "part.parquet"))
    others = [c for c in part.columns if c not in ("p_partkey", "p_name")]
    parts = []
    for k in range(mult):
        if k == 0:
            parts.append(part)
            continue
        prefix = f"r{k}x"
        parts.append(
            part.select(
                (F.col("p_partkey") + k * ID_STRIDE).alias("p_partkey"),
                F.concat(F.lit(prefix), F.col("p_name")).alias("p_name"),
                *others,
            )
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionAll(p_)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "part.parquet")
    )
    return out.count()


def replicate_customer(spark, src: str, dst: str, mult: int) -> int:
    """Replica k shifts c_custkey by k*STRIDE -- the same stride events'
    user_id uses, so the events-x-customer key join sees mult-x matching
    keys (each replica joins only its own replica's users), preserving the
    join's selectivity shape rather than creating cross-replica fan-out."""
    cust = spark.read.parquet(os.path.join(src, "customer.parquet"))
    others = [c for c in cust.columns if c != "c_custkey"]
    parts = []
    for k in range(mult):
        parts.append(
            cust.select(
                (F.col("c_custkey") + k * ID_STRIDE).alias("c_custkey"),
                *others,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "customer.parquet")
    )
    return out.count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="scratch/sf1")
    ap.add_argument(
        "--tables",
        default="documents,embeddings,events,orders,lineitem,part,customer",
        help="comma list of tables to replicate",
    )
    args = ap.parse_args()
    spark = get_spark()
    os.makedirs(args.dst, exist_ok=True)
    tables = set(args.tables.split(","))
    counts = {}
    if "documents" in tables:
        counts["documents"] = replicate_documents(spark, args.src, args.dst, args.mult)
    if "embeddings" in tables:
        counts["embeddings"] = replicate_embeddings(spark, args.src, args.dst, args.mult)
    if "events" in tables:
        counts["events"] = replicate_events(spark, args.src, args.dst, args.mult)
    if "lineitem" in tables:
        counts["lineitem"] = replicate_lineitem(spark, args.src, args.dst, args.mult)
    if "orders" in tables:
        counts["orders"] = replicate_orders(spark, args.src, args.dst, args.mult)
    if "part" in tables:
        counts["part"] = replicate_part(spark, args.src, args.dst, args.mult)
    if "customer" in tables:
        counts["customer"] = replicate_customer(spark, args.src, args.dst, args.mult)
    print(f"wrote {args.dst}: " + " ".join(f"{k}={v}" for k, v in counts.items()))


if __name__ == "__main__":
    main()
