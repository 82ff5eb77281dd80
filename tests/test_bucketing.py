"""Bucketed-join audit: joining two tables bucketed on the join key must
produce a plan with NO shuffle exchange — the write-time bucketing
satisfies the join's distribution requirement."""

from __future__ import annotations

from kafka_streams_dexcom_spark.plans import explain_str
from kafka_streams_dexcom_spark.sources.bucketing import (
    read_table,
    write_bucketed,
)
from kafka_streams_dexcom_spark.sources.files import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    write_bucketed(orders, "orders_b", "o_custkey", 8)
    write_bucketed(customer, "customer_b", "c_custkey", 8)
    try:
        # force a non-broadcast join so the shuffle requirement is real
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_table(spark, "orders_b").join(
            read_table(spark, "customer_b"),
            read_table(spark, "orders_b").o_custkey
            == read_table(spark, "customer_b").c_custkey,
        )
        plan = explain_str(joined)
        assert "SortMergeJoin" in plan, plan
        # the whole point: no runtime shuffle on either side
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan
        assert joined.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
