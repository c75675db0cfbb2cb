"""Driver-contract query registry (SURVEY.md §2 coverage).

Every entry pairs a Ray Data pipeline (callable taking ``sf_dir``)
with, where SQL-expressible, an equivalent DuckDB oracle SQL string.
Column names match EXACTLY between both sides (driver hash contract).

Float determinism policy: aggregates over arbitrary doubles are
computed as exact int64 sums of scaled values (cents) so that Ray's
and DuckDB's different summation orders cannot diverge; single final
divisions (e.g. ratios/means) happen once per output row on both
sides, giving bitwise-identical float64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum

from engine.joins import broadcast_lookup, hash_join
from engine.shuffle import grouped_count_sums, topk

BATCH = 65_536


def _read(sf_dir: str, table: str, columns=None) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------- q1 agg


def q_lineitem_agg(sf_dir: str) -> Dataset:
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate"],
    )

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-01"))))
        cents = pc.cast(pc.round(pc.multiply(b["l_extendedprice"], 100.0), round_mode="half_towards_infinity"), pa.int64())
        return b.append_column("base_cents", cents).drop_columns(
            ["l_extendedprice", "l_shipdate"]
        )

    ds = ds.map_batches(prep, batch_format="pyarrow", batch_size=BATCH)
    return ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("base_cents", alias_name="sum_base_cents"),
        Count(alias_name="cnt"),
    )


SQL_LINEITEM_AGG = """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sum_base_cents,
       COUNT(*) AS cnt
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# ----------------------------------------------------------- filter/map


def q_filter_project(sf_dir: str) -> Dataset:
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def fn(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(b["l_discount"], 0.05), pc.less_equal(b["l_discount"], 0.07)
            ),
            pc.less(b["l_quantity"], 24.0),
        )
        b = b.filter(keep)
        rev = pc.cast(
            pc.round(
                pc.multiply(pc.multiply(b["l_extendedprice"], b["l_discount"]), 100.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_linenumber": b["l_linenumber"],
                "disc_revenue_cents": rev,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=BATCH)


SQL_FILTER_PROJECT = """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT) AS disc_revenue_cents
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# ---------------------------------------------------------------- top-k


def q_topk_orders(sf_dir: str) -> Dataset:
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


SQL_TOPK_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


# -------------------------------------------------------------- distinct


def q_distinct_flags(sf_dir: str) -> Dataset:
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    return ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(Count(alias_name="cnt"))


SQL_DISTINCT_FLAGS = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------ exact dedup


def q_dedup_documents(sf_dir: str) -> Dataset:
    """Exact dedup by full text content (A3 shape: hash-partition by
    content key, keep min id per group)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.groupby("text").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="copies")
    )
    return out.map_batches(
        lambda b: b.select(["doc_id", "copies"]), batch_format="pyarrow"
    )


SQL_DEDUP_DOCUMENTS = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS copies
FROM documents GROUP BY text
"""


# ----------------------------------------------- broadcast dimension join


def q_customer_per_region(sf_dir: str) -> Dataset:
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    ds = broadcast_lookup(cust, nation, "c_nationkey", "n_nationkey", ["n_regionkey"])
    ds = broadcast_lookup(ds, region, "n_regionkey", "r_regionkey", ["r_name"])

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(b["c_acctbal"], 100.0), round_mode="half_towards_infinity"), pa.int64())
        return b.append_column("bal_cents", c)

    ds = ds.map_batches(cents, batch_format="pyarrow")
    return ds.groupby("r_name").aggregate(
        Count(alias_name="n_customers"), Sum("bal_cents", alias_name="sum_bal_cents")
    )


SQL_CUSTOMER_PER_REGION = """
SELECT r_name,
       COUNT(*) AS n_customers,
       SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS sum_bal_cents
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --------------------------------------------------- partitioned hash join


def q_segment_revenue(sf_dir: str) -> Dataset:
    """orders ⋈ customer via the explicit bucketed hash join, then
    revenue per market segment."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0), round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"c_custkey": b["o_custkey"], "price_cents": cents})

    orders = orders.map_batches(prep, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = hash_join(orders, cust, key="c_custkey", num_buckets=16, how="inner")
    return joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"), Sum("price_cents", alias_name="sum_price_cents")
    )


SQL_SEGMENT_REVENUE = """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS sum_price_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# ------------------------------------------------------- windowed events


def q_events_daily(sf_dir: str) -> Dataset:
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def fn(b: pa.Table) -> pa.Table:
        day = pc.strftime(b["ts"], format="%Y-%m-%d")
        vc = pc.cast(pc.round(pc.multiply(b["value"], 1000.0), round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"day": day, "event_type": b["event_type"], "value_milli": vc})

    ds = ds.map_batches(fn, batch_format="pyarrow", batch_size=BATCH)
    return ds.groupby(["day", "event_type"]).aggregate(
        Count(alias_name="n_events"),
        Sum("value_milli", alias_name="sum_value_milli"),
        Min("value_milli", alias_name="min_value_milli"),
        Max("value_milli", alias_name="max_value_milli"),
    )


SQL_EVENTS_DAILY = """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       COUNT(*) AS n_events,
       SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS sum_value_milli,
       MIN(CAST(ROUND(value * 1000) AS BIGINT)) AS min_value_milli,
       MAX(CAST(ROUND(value * 1000) AS BIGINT)) AS max_value_milli
FROM events
GROUP BY day, event_type
"""


# ------------------------------------------------------- text statistics


def q_doc_token_stats(sf_dir: str) -> Dataset:
    """Token counting over documents (whitespace tokens via RE2),
    aggregated per language — the text-analysis op family."""
    ds = _read(sf_dir, "documents", ["lang", "text", "n_chars"])

    def fn(b: pa.Table) -> pa.Table:
        toks = pc.count_substring_regex(b["text"], r"\S+")
        return pa.table(
            {
                "lang": b["lang"],
                "n_tokens": pc.cast(toks, pa.int64()),
                "n_chars": b["n_chars"],
            }
        )

    ds = ds.map_batches(fn, batch_format="pyarrow")
    return ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tokens", alias_name="sum_tokens"),
        Sum("n_chars", alias_name="sum_chars"),
    )


SQL_DOC_TOKEN_STATS = """
SELECT lang, COUNT(*) AS n_docs,
       SUM(len(regexp_extract_all(text, '\\S+'))) AS sum_tokens,
       SUM(n_chars) AS sum_chars
FROM documents GROUP BY lang
"""


def q_doc_quality(sf_dir: str) -> Dataset:
    """Per-document quality metrics (length, token count, punctuation
    count, stopword count) — all exact ints."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_tokens": pc.cast(pc.count_substring_regex(b["text"], r"\S+"), pa.int64()),
                "n_punct": pc.cast(
                    pc.count_substring_regex(b["text"], r"[.,!?;:]"), pa.int64()
                ),
                "n_the": pc.cast(
                    pc.count_substring_regex(b["text"], r"\bthe\b"), pa.int64()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_DOC_QUALITY = """
SELECT doc_id,
       len(regexp_extract_all(text, '\\S+')) AS n_tokens,
       len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
       len(regexp_extract_all(text, '\\bthe\\b')) AS n_the
FROM documents
"""


REGISTRY: dict[str, tuple] = {
    "lineitem_agg": (q_lineitem_agg, SQL_LINEITEM_AGG),
    "filter_project": (q_filter_project, SQL_FILTER_PROJECT),
    "topk_orders": (q_topk_orders, SQL_TOPK_ORDERS),
    "distinct_flags": (q_distinct_flags, SQL_DISTINCT_FLAGS),
    "dedup_documents": (q_dedup_documents, SQL_DEDUP_DOCUMENTS),
    "customer_per_region": (q_customer_per_region, SQL_CUSTOMER_PER_REGION),
    "segment_revenue": (q_segment_revenue, SQL_SEGMENT_REVENUE),
    "events_daily": (q_events_daily, SQL_EVENTS_DAILY),
    "doc_token_stats": (q_doc_token_stats, SQL_DOC_TOKEN_STATS),
    "doc_quality": (q_doc_quality, SQL_DOC_QUALITY),
}
