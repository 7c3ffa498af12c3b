"""Demo graph: the driver's TPC-H-ish tables as a property graph.

Maps /root/testdata/sf*/ parquet (TESTDATA.md) onto the engine's storage
model so every Cypher operator can be exercised — and oracle-checked against
plain SQL over the same parquet. Entry ids are the natural keys, so packing
is a pure column expression (no shuffle at load: the reference's
``id_field_exists`` fast path, ``age_load.c:565``).

Scale note: all graph tables stay lazy parquet scans; label/property filters
compile onto the scans (pushdown), and the only shuffles are the pattern
joins themselves.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .api import AgeSession
from .graph import Graph


# The generator's schemas are deterministic and identical across every SF
# dir (pinned by tests/test_loaders.py::test_tpch_schemas_match_embedded),
# so the reader skips per-table footer inference — ~0.8 s of driver-side
# JVM round trips per session even when issued concurrently (guide §5).
# A drifted file fails loudly at the first action (the vectorized reader
# rejects incompatible physical types), never silently.
TPCH_SCHEMAS = {
    "region": "r_regionkey int, r_name string",
    "nation": "n_nationkey int, n_name string, n_regionkey int",
    "customer": (
        "c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string"
    ),
    "supplier": "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    "part": (
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double"
    ),
    "orders": (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"
    ),
    "lineitem": (
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp_ntz"
    ),
}


def build_tpch_graph(spark: SparkSession, sf_dir: str) -> Graph:
    age = AgeSession(spark)
    g = age.create_graph("tpch")

    def read(n: str):
        return spark.read.schema(TPCH_SCHEMAS[n]).parquet(f"{sf_dir}/{n}.parquet")

    region = read("region").select(
        F.col("r_regionkey").alias("rk"), F.col("r_name").alias("name")
    )
    g.add_vertices("Region", region, id_col="rk")

    nation = read("nation")
    g.add_vertices(
        "Nation",
        nation.select(F.col("n_nationkey").alias("nk"), F.col("n_name").alias("name")),
        id_col="nk",
    )

    customer = read("customer")
    g.add_vertices(
        "Customer",
        customer.select(
            F.col("c_custkey").alias("ck"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_mktsegment").alias("mktsegment"),
        ),
        id_col="ck",
    )

    supplier = read("supplier")
    g.add_vertices(
        "Supplier",
        supplier.select(
            F.col("s_suppkey").alias("sk"),
            F.col("s_name").alias("name"),
            F.col("s_acctbal").alias("acctbal"),
        ),
        id_col="sk",
    )

    part = read("part")
    g.add_vertices(
        "Part",
        part.select(
            F.col("p_partkey").alias("pk"),
            F.col("p_name").alias("name"),
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
            F.col("p_retailprice").alias("retailprice"),
        ),
        id_col="pk",
    )

    orders = read("orders")
    g.add_vertices(
        "Order",
        orders.select(
            F.col("o_orderkey").alias("ok"),
            F.col("o_orderstatus").alias("orderstatus"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("o_orderpriority").alias("orderpriority"),
        ),
        id_col="ok",
    )

    # edges — natural-key endpoints, packed by shifting in the label id
    nat_edges = nation.select(
        F.col("n_nationkey").alias("s"),
        F.col("n_regionkey").alias("t"),
        F.col("n_nationkey").alias("eid"),
    )
    g.add_edges(
        "IN_REGION", nat_edges, start_col="s", end_col="t",
        start_label="Nation", end_label="Region", id_col="eid",
    )

    cust_edges = customer.select(
        F.col("c_custkey").alias("s"),
        F.col("c_nationkey").alias("t"),
        F.col("c_custkey").alias("eid"),
    )
    g.add_edges(
        "FROM_NATION", cust_edges, start_col="s", end_col="t",
        start_label="Customer", end_label="Nation", id_col="eid",
    )

    supp_edges = supplier.select(
        F.col("s_suppkey").alias("s"),
        F.col("s_nationkey").alias("t"),
        F.col("s_suppkey").alias("eid"),
    )
    g.add_edges(
        "SUPP_NATION", supp_edges, start_col="s", end_col="t",
        start_label="Supplier", end_label="Nation", id_col="eid",
    )

    placed = orders.select(
        F.col("o_custkey").alias("s"),
        F.col("o_orderkey").alias("t"),
        F.col("o_orderkey").alias("eid"),
        F.col("o_totalprice").alias("totalprice"),
    )
    g.add_edges(
        "PLACED", placed, start_col="s", end_col="t",
        start_label="Customer", end_label="Order", id_col="eid",
    )

    lineitem = read("lineitem")
    li_edges = lineitem.select(
        F.col("l_orderkey").alias("s"),
        F.col("l_partkey").alias("t"),
        # unique edge entry id: orderkey*8 + linenumber (linenumber <= 7)
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("eid"),
        F.col("l_suppkey").alias("suppkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("extendedprice"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
    )
    g.add_edges(
        "LINE", li_edges, start_col="s", end_col="t",
        start_label="Order", end_label="Part", id_col="eid",
    )
    return g
