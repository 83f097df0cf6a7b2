"""Explicit StructTypes for every record family the engine touches.

The reference pipeline is schemaless almost everywhere (dynamic pandas
inference, schemaless Kafka JSON — see SURVEY.md §1.2). At 100 TB,
schema inference is both a correctness hazard and a full extra pass
over the data, so the rebuild declares every schema explicitly.

Two families:

1. Reference-domain records (COTAHIST rows, yfinance quotes, brapi
   quotes, enriched records, warehouse rows) — reconstructed from the
   producing code in the reference:
   - yfinance quote:   reference include/tasks/yfinance_to_postgres.py:80-88
   - brapi quote:      reference include/tasks/data_processing.py:70-75
   - enriched record:  reference include/tasks/data_processing.py:69-83
   - warehouse row:    reference include/tasks/data_warehouse.py:18-24,62
   - COTAHIST CSV:     reference include/tasks/batch_ingestion.py:26-40
2. Driver fixture tables (TPC-H-ish star schema + events/documents/
   embeddings) under /root/testdata/sf*/ — see FIXTURES.md §A.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# 1. Reference-domain record schemas
# ---------------------------------------------------------------------------

# Money stays double (not decimal) to match reference semantics — the
# reference stores prices as REAL/float and the correctness oracle
# (DuckDB) compares doubles. See SURVEY.md §1.2.

YFINANCE_QUOTE = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
    ]
)

BRAPI_QUOTE = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("longName", T.StringType(), True),
        T.StructField("regularMarketPrice", T.DoubleType(), True),
        T.StructField("regularMarketChange", T.DoubleType(), True),
        T.StructField("regularMarketChangePercent", T.DoubleType(), True),
        T.StructField("marketCap", T.LongType(), True),
    ]
)

# brapi REST payload: {"results": [ {...quote...} ]} — parsed with
# ArrayType(StructType) + element_at (SURVEY.md §1.2 mapping).
BRAPI_PAYLOAD = T.StructType(
    [T.StructField("results", T.ArrayType(BRAPI_QUOTE), True)]
)

ENRICHED_RECORD = T.StructType(
    list(BRAPI_QUOTE.fields)
    + [
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.LongType(), True),
        T.StructField("change_day", T.DoubleType(), True),
        T.StructField("processed_at", T.StringType(), True),
    ]
)

WAREHOUSE_ROW = T.StructType(
    [f for f in ENRICHED_RECORD.fields if f.name != "processed_at"]
    + [
        T.StructField("date", T.TimestampType(), True),
        T.StructField("sma_5", T.DoubleType(), True),
        T.StructField("sma_20", T.DoubleType(), True),
        T.StructField("turnover_ratio", T.DoubleType(), True),
    ]
)

# COTAHIST historical CSV — 26 named columns, B3 registry layout.
# Only the columns with enforced downstream semantics get strict types;
# the rest are passthrough strings (they arrive as strings, are never
# touched, and typing them would invent semantics the reference lacks).
_COTAHIST_TYPED = {
    "DATPRE": T.StringType(),  # parsed to timestamp downstream (P6)
    "CODBDI": T.IntegerType(),  # filter == 2 (P1)
    "CODNEG": T.StringType(),  # ticker
    "PREABE": T.StringType(),  # cast-with-null-on-error downstream (P5)
    "PREMAX": T.StringType(),
    "PREMIN": T.StringType(),
    "PREULT": T.StringType(),
    "QUATOT": T.StringType(),
    "VOLTOT": T.StringType(),
}
_COTAHIST_COLUMNS = [
    "Unnamed: 0", "TIPREG", "DATPRE", "CODBDI", "CODNEG", "TPMERC",
    "NOMRES", "ESPECI", "PRAZOT", "MODREF", "PREABE", "PREMAX", "PREMIN",
    "PREMED", "PREULT", "PREOFC", "PREOFV", "TOTNEG", "QUATOT", "VOLTOT",
    "PREEXE", "INDOPC", "DATVEN", "FATCOT", "PTOEXE", "CODISI", "DISMES",
]
COTAHIST = T.StructType(
    [
        T.StructField(c, _COTAHIST_TYPED.get(c, T.StringType()), True)
        for c in _COTAHIST_COLUMNS
    ]
)

# Kafka message envelope: JSON value (schemaless in the reference; the
# rebuild parses with an explicit schema in PERMISSIVE mode).
KAFKA_VALUE_IS_JSON = True

# ---------------------------------------------------------------------------
# 2. Driver fixture tables (FIXTURES.md §A)
# ---------------------------------------------------------------------------

FIXTURE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

FIXTURE_TABLES = tuple(FIXTURE_SCHEMAS)

# events.props JSON payload schema ({"k": <int>}) — F6 parse target.
EVENT_PROPS = T.StructType([T.StructField("k", T.LongType(), True)])
