"""Explicit StructType schemas (SURVEY §1.2, FIXTURES.md).

Two families:

- Reference-domain tables (``stock_master``, ``stock_price``, raw crawler
  frames) — nullability mirrors the reference DDL exactly
  (reference: src/clickhouse/stock_master.py:18-30,
  src/clickhouse/price_client.py:78-96,
  src/crawlers/krx_delisted_crawler.py:200-223,
  src/crawlers/krx_new_listing_crawler.py:227-258).
- Driver-generated TPC-H-ish tables under /root/testdata/sf*/ — canonical
  for the oracle-checked query surface.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- Reference-domain tables -------------------------------------------------

# stock_master: symbol dimension, last-write-wins versioned by update_dt
# (reference: src/clickhouse/stock_master.py:18-30 — ReplacingMergeTree(update_dt)).
# sector/industry/delisting_reason come from the richer legacy-schema variant
# (reference: src/setup/setup_clickhouse.py:73-87): delisting_reason is parsed
# from the delisted crawl (RAW_DELISTED), industry from the new-listing crawl
# (RAW_NEW_LISTING) and FDR listings, sector from FDR listings where provided —
# all nullable, absent sources simply leave nulls.
STOCK_MASTER = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("name", StringType(), False),
        StructField("market", StringType(), False),
        StructField("sector", StringType(), True),
        StructField("industry", StringType(), True),
        StructField("listing_date", DateType(), True),
        StructField("delisting_date", DateType(), True),
        StructField("delisting_reason", StringType(), True),
        StructField("is_active", IntegerType(), False),
        StructField("create_dt", TimestampType(), False),
        StructField("update_dt", TimestampType(), False),
    ]
)

# stock_price: daily OHLCV fact, monthly partitions, clustered (symbol, date)
# (reference: src/clickhouse/price_client.py:78-96).
STOCK_PRICE = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("trade_date", DateType(), False),
        StructField("open_price", DoubleType(), True),
        StructField("high_price", DoubleType(), True),
        StructField("low_price", DoubleType(), True),
        StructField("close_price", DoubleType(), True),
        StructField("volume", LongType(), True),
        StructField("amount", LongType(), True),
        StructField("market_cap", LongType(), True),
        StructField("change_rate", DoubleType(), True),
        StructField("create_dt", TimestampType(), False),
        StructField("update_dt", TimestampType(), False),
    ]
)

# Crawler output pre-normalization: all-string frames, columns discovered from
# HTML headers then renamed (reference: src/crawlers/krx_delisted_crawler.py:200-223).
RAW_DELISTED = StructType(
    [
        StructField("company_name", StringType(), True),
        StructField("company_code", StringType(), True),
        StructField("delisting_date", StringType(), True),
        StructField("delisting_reason", StringType(), True),
        StructField("remarks", StringType(), True),
        StructField("sequence", StringType(), True),
        StructField("market", StringType(), False),
    ]
)

# (reference: src/crawlers/krx_new_listing_crawler.py:227-258).
RAW_NEW_LISTING = StructType(
    [
        StructField("company_name", StringType(), True),
        StructField("company_code", StringType(), True),
        StructField("listing_date", StringType(), True),
        StructField("market_type", StringType(), True),
        StructField("listing_type", StringType(), True),
        StructField("industry", StringType(), True),
        StructField("par_value", StringType(), True),
        StructField("ipo_price", StringType(), True),
        StructField("ipo_amount", StringType(), True),
        StructField("main_products", StringType(), True),
        StructField("listed_shares", StringType(), True),
        StructField("listing_advisor", StringType(), True),
        StructField("nationality", StringType(), True),
        StructField("sequence", StringType(), True),
        StructField("market", StringType(), False),
    ]
)

VALID_MARKETS = ("KOSPI", "KOSDAQ", "KONEX", "ETF", "UNKNOWN")

# --- Driver-generated tables (TESTDATA.md / FIXTURES.md §B) ------------------

REGION = StructType(
    [
        StructField("r_regionkey", IntegerType(), True),
        StructField("r_name", StringType(), True),
    ]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType(), True),
        StructField("n_name", StringType(), True),
        StructField("n_regionkey", IntegerType(), True),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType(), True),
        StructField("c_name", StringType(), True),
        StructField("c_nationkey", IntegerType(), True),
        StructField("c_acctbal", DoubleType(), True),
        StructField("c_mktsegment", StringType(), True),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType(), True),
        StructField("s_name", StringType(), True),
        StructField("s_nationkey", IntegerType(), True),
        StructField("s_acctbal", DoubleType(), True),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType(), True),
        StructField("p_name", StringType(), True),
        StructField("p_brand", StringType(), True),
        StructField("p_type", StringType(), True),
        StructField("p_size", IntegerType(), True),
        StructField("p_retailprice", DoubleType(), True),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType(), True),
        StructField("o_custkey", LongType(), True),
        StructField("o_orderstatus", StringType(), True),
        StructField("o_totalprice", DoubleType(), True),
        StructField("o_orderdate", TimestampType(), True),
        StructField("o_orderpriority", StringType(), True),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType(), True),
        StructField("l_partkey", LongType(), True),
        StructField("l_suppkey", LongType(), True),
        StructField("l_linenumber", IntegerType(), True),
        StructField("l_quantity", DoubleType(), True),
        StructField("l_extendedprice", DoubleType(), True),
        StructField("l_discount", DoubleType(), True),
        StructField("l_tax", DoubleType(), True),
        StructField("l_returnflag", StringType(), True),
        StructField("l_linestatus", StringType(), True),
        StructField("l_shipdate", TimestampType(), True),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType(), True),
        StructField("embedding", ArrayType(FloatType(), True), True),
        StructField("label", IntegerType(), True),
    ]
)

DRIVER_TABLES: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
