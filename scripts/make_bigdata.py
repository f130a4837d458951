"""Synthesize a ~10× scale-up of /root/testdata/sf0.1 into /tmp/sfbig for
scaling validation (sf≈1: ~6M lineitem rows, 50k documents, 1M events).

Fact tables are replicated with key shifts that preserve join integrity
(orderkeys/custkeys shift together; dimension tables stay fixed). Documents
keep their text verbatim — the resulting cross-replica exact/near duplicates
are a *feature* for dedup stress (crawl corpora are duplicate-heavy).

Usage: python scripts/make_bigdata.py [replicas] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sales_etl_pipeline_spark.session import get_spark
from sales_etl_pipeline_spark.sources.readers import load_events

SRC = "/root/testdata/sf0.1"


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
    spark = get_spark(app_name="make-bigdata")
    spark.sparkContext.setLogLevel("ERROR")

    # dimensions: copy through unchanged
    for dim in ("region", "nation", "part", "supplier"):
        spark.read.parquet(f"{SRC}/{dim}.parquet").write.mode("overwrite").parquet(
            f"{out}/{dim}.parquet"
        )

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    lineitem = spark.read.parquet(f"{SRC}/lineitem.parquet")
    customer = spark.read.parquet(f"{SRC}/customer.parquet")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    events = load_events(spark, SRC)

    okey_shift = orders.agg(F.max("o_orderkey")).first()[0] + 1
    ckey_shift = customer.agg(F.max("c_custkey")).first()[0] + 1
    doc_shift = docs.agg(F.max("doc_id")).first()[0] + 1
    vec_shift = emb.agg(F.max("vec_id")).first()[0] + 1
    ev_shift = events.agg(F.max("event_id")).first()[0] + 1
    user_shift = events.agg(F.max("user_id")).first()[0] + 1

    def rep(df, shifts: dict):
        parts = []
        for i in range(replicas):
            d = df
            for col, shift in shifts.items():
                d = d.withColumn(col, F.col(col) + F.lit(i * shift))
            parts.append(d)
        base = parts[0]
        for p in parts[1:]:
            base = base.unionByName(p)
        return base

    rep(customer, {"c_custkey": ckey_shift}).write.mode("overwrite").parquet(
        f"{out}/customer.parquet"
    )
    rep(orders, {"o_orderkey": okey_shift, "o_custkey": ckey_shift}).write.mode(
        "overwrite"
    ).parquet(f"{out}/orders.parquet")
    rep(lineitem, {"l_orderkey": okey_shift}).write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet"
    )
    rep(docs, {"doc_id": doc_shift}).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    rep(emb, {"vec_id": vec_shift}).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )
    rep(events, {"event_id": ev_shift, "user_id": user_shift}).write.mode(
        "overwrite"
    ).parquet(f"{out}/events.parquet")
    for t in ("lineitem", "orders", "documents", "events"):
        print(t, spark.read.parquet(f"{out}/{t}.parquet").count())
    spark.stop()


if __name__ == "__main__":
    main()
