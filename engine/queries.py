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

from engine.joins import broadcast_lookup, hash_join, salted_hash_join
from engine.shuffle import grouped_count_sums

BATCH = 65_536


def _read(
    sf_dir: str, table: str, columns=None, rows_per_block: int = 32_768
) -> Dataset:
    """Projected read with a block count sized to the table: Ray's
    default splits small files into ~2x-CPU blocks, and at test scale
    the per-task dispatch cost then dominates wall time (measured:
    segment_revenue 1.7 s task time vs 4.8 s wall across ~600 tiny
    tasks). Cap blocks at ceil(rows / rows_per_block) — callers with
    heavy per-row work (text/doc kernels) pass a smaller target. At
    corpus scale the cap exceeds 4x CPUs and Ray's own block-size
    policy (target_max_block_size) takes over unchanged."""
    from engine.util import clean_read_schema

    path = f"{sf_dir}/{table}.parquet"
    # Metadata-free subset schema: keeps every block schema hashable
    # (pandas-written parquet footers otherwise poison Ray's schema
    # dedup with an unhashable metadata dict — see clean_read_schema).
    schema = clean_read_schema(path, columns)
    try:
        n = pq.read_metadata(path).num_rows
    except Exception:  # noqa: BLE001 — directory datasets etc.
        return rd.read_parquet(path, columns=columns, schema=schema)
    import ray

    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        ncpu = 8
    blocks = max(1, min(4 * ncpu, -(-n // rows_per_block)))
    return rd.read_parquet(
        path, columns=columns, schema=schema, override_num_blocks=blocks
    )


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
    # Combiner pre-agg + coarse-partition merge (engine/shuffle.py):
    # the shuffle moves one partial row per (flag, status, block), and
    # Ray's per-block Aggregate overhead is avoided entirely.
    agg = grouped_count_sums(
        ds, key=["l_returnflag", "l_linestatus"], sum_cols=("l_quantity", "base_cents")
    )
    return agg.map_batches(
        lambda b: b.rename_columns(
            ["l_returnflag", "l_linestatus", "cnt", "sum_qty", "sum_base_cents"]
        ),
        batch_format="pyarrow",
    )


SQL_LINEITEM_AGG = """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
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
    """A4 top-k via per-block prune (engine.shuffle.topk): each block
    keeps its local top-10, the final sort touches ≤ 10×blocks rows —
    no full shuffle-sort of orders for 10 output rows. Exact: the sort
    key (o_totalprice DESC, o_orderkey) is a total order."""
    from engine.shuffle import topk

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return topk(ds, ["o_totalprice", "o_orderkey"], k=10, descending=[True, False])


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
    """Exact dedup by content DIGEST (A3 scale shape): map each doc to
    a 128-bit digest (two independent vectorized 64-bit FNV-1a
    variants with constants pinned in engine.shuffle — VERSION-STABLE,
    unlike polars' hash which is documented unstable across library
    versions and so unsafe for persisted digests), group by the digest
    pair, keep min doc_id + count. The shuffle moves O(rows × 24 B)
    instead of the corpus text; collision probability at 2^-128 is
    below any hardware error rate. Values identical to the
    group-by-text oracle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)

    def digest(b: pa.Table) -> pa.Table:
        from engine.dedupe import content_digests

        d1, d2 = content_digests(b["text"])
        return pa.table({"doc_id": b["doc_id"], "d1": pa.array(d1), "d2": pa.array(d2)})

    out = (
        ds.map_batches(digest, batch_format="pyarrow")
        .groupby(["d1", "d2"])
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="copies"))
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
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_bal_cents
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
    agg = grouped_count_sums(joined, key="c_mktsegment", sum_cols=("price_cents",))
    return agg.map_batches(
        lambda b: b.rename_columns(["c_mktsegment", "n_orders", "sum_price_cents"]),
        batch_format="pyarrow",
    )


SQL_SEGMENT_REVENUE = """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_left_join_f_orders(sf_dir: str) -> Dataset:
    """LEFT OUTER hash join with a live null-producing path: customers
    against per-customer counts of 'F'-status orders (71 customers at
    sf0.01 have none — their rows survive the join with a null count,
    COALESCEd to 0). The right side pre-aggregates BEFORE the join
    (combiner first: the join input is aggregate-scale, not
    order-scale) — the outer-join analog of segment_revenue's
    join-then-aggregate."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])

    def prep(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["o_orderstatus"], "F"))
        return pa.table({"c_custkey": f["o_custkey"]})

    counts = grouped_count_sums(
        orders.map_batches(prep, batch_format="pyarrow"), key="c_custkey"
    ).map_batches(
        lambda b: b.rename_columns(["c_custkey", "f_cnt"]), batch_format="pyarrow"
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = hash_join(cust, counts, key="c_custkey", num_buckets=16, how="left")

    def fill(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": b["c_custkey"],
                "c_mktsegment": b["c_mktsegment"],
                "n_f_orders": pc.fill_null(pc.cast(b["f_cnt"], pa.int64()), 0),
            }
        )

    return joined.map_batches(fill, batch_format="pyarrow")


SQL_LEFT_JOIN_F_ORDERS = """
SELECT c_custkey, c_mktsegment,
       CAST(COALESCE(f.cnt, 0) AS BIGINT) AS n_f_orders
FROM customer LEFT JOIN (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
) f ON c_custkey = f.o_custkey
"""


def q_hash_sample(sf_dir: str) -> Dataset:
    """Deterministic hash-based 10% sample (A6 scale path: seeded
    random_sample is not reproducible in SQL; key-hash sampling is
    exact on both sides AND stable under repartitioning at any scale
    — the property resumable sampling jobs need)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])

    def fn(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = b["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (ok * 2654435761 + ln * 97) % 1000 < 100
        return b.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_HASH_SAMPLE = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE (l_orderkey * 2654435761 + l_linenumber * 97) % 1000 < 100
"""


# ------------------------------------------------------- windowed events


def q_events_daily(sf_dir: str) -> Dataset:
    """Daily per-type rollup keyed on INTEGER epoch-day through the
    shuffle (strings ride the hash/groupby hot path otherwise); the
    '%Y-%m-%d' day string is rendered once per OUTPUT group at the
    end, not once per input row."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def fn(b: pa.Table) -> pa.Table:
        t = b["ts"].to_numpy(zero_copy_only=False)
        day_i = t.astype("datetime64[D]").astype(np.int64)
        vc = pc.cast(pc.round(pc.multiply(b["value"], 1000.0), round_mode="half_towards_infinity"), pa.int64())
        return pa.table(
            {"day_i": pa.array(day_i), "event_type": b["event_type"], "value_milli": vc}
        )

    ds = ds.map_batches(fn, batch_format="pyarrow", batch_size=BATCH)
    agg = grouped_count_sums(
        ds,
        key=["day_i", "event_type"],
        sum_cols=("value_milli",),
        min_cols=("value_milli",),
        max_cols=("value_milli",),
    )

    def render(b: pa.Table) -> pa.Table:
        b = b.rename_columns(
            [
                "day_i",
                "event_type",
                "n_events",
                "sum_value_milli",
                "min_value_milli",
                "max_value_milli",
            ]
        )
        day = np.datetime_as_string(
            b["day_i"].to_numpy(zero_copy_only=False).astype("datetime64[D]"), unit="D"
        )
        b = b.drop_columns(["day_i"]).add_column(0, "day", pa.array(day, pa.string()))
        return b

    return agg.map_batches(render, batch_format="pyarrow")


SQL_EVENTS_DAILY = """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli,
       MIN(CAST(ROUND(value * 1000) AS BIGINT)) AS min_value_milli,
       MAX(CAST(ROUND(value * 1000) AS BIGINT)) AS max_value_milli
FROM events
GROUP BY day, event_type
"""


# ------------------------------------------------------- text statistics


def q_doc_token_stats(sf_dir: str) -> Dataset:
    """Token counting over documents (whitespace tokens via RE2),
    aggregated per language — the text-analysis op family."""
    ds = _read(sf_dir, "documents", ["lang", "text", "n_chars"], rows_per_block=256)

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
       CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS sum_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang
"""


def q_doc_quality(sf_dir: str) -> Dataset:
    """Per-document quality metrics (length, token count, punctuation
    count, stopword count) — all exact ints."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)

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
    "left_join_f_orders": (q_left_join_f_orders, SQL_LEFT_JOIN_F_ORDERS),
    "events_daily": (q_events_daily, SQL_EVENTS_DAILY),
    "doc_token_stats": (q_doc_token_stats, SQL_DOC_TOKEN_STATS),
    "doc_quality": (q_doc_quality, SQL_DOC_QUALITY),
}


# ---------------------------------------------------- language ID (textops)


def q_langid(sf_dir: str) -> Dataset:
    """Heuristic language ID over documents: stopword-marker argmax
    with fixed precedence (engine.textops). SQL-mirrorable exactly."""
    from engine.textops import langid_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    ds = ds.map_batches(langid_batch, batch_format="pyarrow")
    return ds.map_batches(lambda b: b.select(["doc_id", "lang_pred"]), batch_format="pyarrow")


SQL_LANGID = r"""
WITH s AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '\b(the|and|of|to|a|in|is|it|that|for)\b')) AS en,
    len(regexp_extract_all(text, '\b(der|die|das|und|ist|nicht|mit|ein|zu|den)\b')) AS de,
    len(regexp_extract_all(text, '\b(el|la|los|de|que|y|en|un|por|con)\b')) AS es,
    len(regexp_extract_all(text, '\b(le|la|les|de|et|un|une|que|pour|dans)\b')) AS fr,
    len(regexp_extract_all(text, '\b(il|la|di|che|e|un|una|per|con|del)\b')) AS it,
    len(regexp_extract_all(text, '\b(je|in|na|se|za|da|so|pri|ki|tudi)\b')) AS sl
  FROM documents)
SELECT doc_id,
  CASE
    WHEN en=0 AND de=0 AND es=0 AND fr=0 AND it=0 AND sl=0 THEN 'und'
    WHEN en >= de AND en >= es AND en >= fr AND en >= it AND en >= sl THEN 'en'
    WHEN de >= es AND de >= fr AND de >= it AND de >= sl THEN 'de'
    WHEN es >= fr AND es >= it AND es >= sl THEN 'es'
    WHEN fr >= it AND fr >= sl THEN 'fr'
    WHEN it >= sl THEN 'it'
    ELSE 'sl'
  END AS lang_pred
FROM s
"""


def q_token_stats_ext(sf_dir: str) -> Dataset:
    """Whitespace + BPE-ish subword token counts per doc (textops)."""
    from engine.textops import token_count_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    ds = ds.map_batches(token_count_batch, batch_format="pyarrow")
    return ds.map_batches(
        lambda b: b.select(["doc_id", "n_ws_tokens", "n_subword_tokens"]),
        batch_format="pyarrow",
    )


SQL_TOKEN_STATS_EXT = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^\sA-Za-z0-9]')) AS n_subword_tokens
FROM documents
"""


def q_quality_scores(sf_dir: str) -> Dataset:
    """Per-doc quality metrics (all exact ints; textops.quality_batch)."""
    from engine.textops import quality_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    ds = ds.map_batches(quality_batch, batch_format="pyarrow")
    return ds.map_batches(
        lambda b: b.select(["doc_id", "n_chars_q", "n_punct", "n_digit", "alpha_ratio_milli"]),
        batch_format="pyarrow",
    )


SQL_QUALITY_SCORES = r"""
SELECT doc_id,
       length(text) AS n_chars_q,
       len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
       len(regexp_extract_all(text, '[0-9]')) AS n_digit,
       CAST(FLOOR(1000.0 * len(regexp_extract_all(text, '[A-Za-z]')) / GREATEST(length(text), 1) + 0.5) AS BIGINT) AS alpha_ratio_milli
FROM documents
"""


def q_repetition_signals(sf_dir: str) -> Dataset:
    """Gopher-style repetition quality signals (the repetition half of
    the Rae et al. filter set): per-doc duplicate-token fraction,
    top-token mass, duplicate-bigram fraction — exact-int milli so the
    DuckDB mirror is bitwise. Zero shuffles (fused per-doc scan)."""
    from engine.textops import repetition_signals_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    return ds.map_batches(repetition_signals_batch, batch_format="pyarrow")


# regexp_extract_all('[a-z0-9]+') ≡ the engine's split-and-drop-empties
# tokenizer (the SQL_VOCAB_TOPK equivalence). Bigrams pair adjacent
# token positions within a doc: range(1, len(ts)) yields p in
# [1, len-1], pairing ts[p] with ts[p+1] (1-indexed DuckDB lists); a
# 0/1-token doc drops out of the LATERAL and COALESCEs to 0.
SQL_REPETITION_SIGNALS = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents),
tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(ts) AS tok FROM t) GROUP BY doc_id, tok),
ta AS (
  SELECT doc_id, SUM(c) AS n, CAST(COUNT(*) AS BIGINT) AS d, MAX(c) AS m
  FROM tf GROUP BY doc_id),
bf AS (
  SELECT doc_id, bigram, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT doc_id, ts[p] || ' ' || ts[p + 1] AS bigram
        FROM t, LATERAL unnest(range(1, len(ts))) AS r(p))
  GROUP BY doc_id, bigram),
ba AS (
  SELECT doc_id, SUM(c) AS nb, CAST(COUNT(*) AS BIGINT) AS db
  FROM bf GROUP BY doc_id)
SELECT t.doc_id,
  CAST(COALESCE(ta.n, 0) AS BIGINT) AS n_tok_r,
  CAST(FLOOR(1000.0 * (COALESCE(ta.n, 0) - COALESCE(ta.d, 0))
             / GREATEST(COALESCE(ta.n, 0), 1) + 0.5) AS BIGINT) AS dup_tok_milli,
  CAST(FLOOR(1000.0 * COALESCE(ta.m, 0)
             / GREATEST(COALESCE(ta.n, 0), 1) + 0.5) AS BIGINT) AS top_tok_milli,
  CAST(FLOOR(1000.0 * (COALESCE(ba.nb, 0) - COALESCE(ba.db, 0))
             / GREATEST(COALESCE(ba.nb, 0), 1) + 0.5) AS BIGINT) AS dup_bigram_milli
FROM t LEFT JOIN ta ON t.doc_id = ta.doc_id LEFT JOIN ba ON t.doc_id = ba.doc_id
"""


def q_lm_quality(sf_dir: str):
    """Bigram-LM quality score per doc (the perplexity-filter shape,
    X22): distributed count training + broadcast LM + per-doc scoring
    (textops.bigram_lm_scores). Driver-excluded: transcendental log
    has no bitwise SQL mirror (the tfidf precedent); pytest-exact vs a
    scalar Counter+log oracle."""
    from engine.textops import bigram_lm_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    return bigram_lm_scores(ds)


def q_semantic_clusters(sf_dir: str):
    """SemDeDup-style semantic clustering + within-cluster near-dup
    verdict over embeddings (X23). Driver-excluded: k-means float
    geometry is approximate-by-design (the ann_ivf precedent);
    rule-exactness and determinism are pytest-checked."""
    from engine.ann import semantic_clusters

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"], rows_per_block=256)
    return semantic_clusters(ds, n_lists=8, threshold=0.95)


def q_pii_scrub(sf_dir: str) -> Dataset:
    """PII detection + redaction (curation scrubbing stage). The
    relational testdata carries no PII, so PII-bearing text is
    synthesized from `orders` by integer arithmetic + string casts —
    the geo_pipeline_sql precedent: BOTH sides build byte-identical
    strings from the same parquet, then the REAL kernel
    (textops.pii_scrub_batch) runs on the Ray side and the RE2-verbatim
    regexp_extract_all/regexp_replace mirror on the DuckDB side.
    Every 2nd order carries an email, every 3rd a phone, every 5th an
    IPv4 (so counts vary 0/1 per kind and combos overlap). Zero
    shuffles; the scrub fuses into the scan."""
    from engine.textops import pii_scrub_batch

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def synth(b: pa.Table) -> pa.Table:
        # Arrow-native printf (binary_join_element_wise + int casts):
        # byte-identical to (and ~40x faster than) the np.char chain it
        # replaced — np.char operates per element on object strings.
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)

        def s(a):
            return pc.cast(pa.array(a), pa.string())

        def J(*parts):
            return pc.binary_join_element_wise(*parts, "")

        email = J(" u", s(ok % 97), "@host", s(ck % 13), ".net")
        phone = J(
            " ", s(ok % 900 + 100), "-", s(ck % 900 + 100), "-", s(ok % 9000 + 1000)
        )
        ip = J(" ", s(ok % 256), ".", s(ck % 256), ".", s(ok % 100), ".", s(ck % 100))
        txt = J(
            "user ",
            s(ck),
            pc.if_else(pa.array(ok % 2 == 0), email, ""),
            pc.if_else(pa.array(ok % 3 == 0), phone, ""),
            pc.if_else(pa.array(ok % 5 == 0), ip, ""),
            " end",
        )
        return pa.table({"o_orderkey": pa.array(ok), "text": txt})

    ds = ds.map_batches(synth, batch_format="pyarrow")
    ds = ds.map_batches(pii_scrub_batch, batch_format="pyarrow")
    return ds.map_batches(
        lambda b: b.select(
            ["o_orderkey", "n_emails", "n_phones", "n_ips", "text_scrubbed"]
        ),
        batch_format="pyarrow",
    )


def _sql_pii_scrub() -> str:
    """Mirror generated from textops.PII_PATTERNS (single source for
    the regexes; DuckDB's regexp_* is RE2, the same engine as pyarrow's
    compute kernels, so the pattern strings transfer verbatim)."""
    from engine.textops import PII_PATTERNS

    counts = ",\n  ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    scrub = "text"
    for _, pat, repl in PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{repl}', 'g')"
    return f"""
WITH t AS (
  SELECT o_orderkey,
    'user ' || CAST(o_custkey AS VARCHAR)
    || CASE WHEN o_orderkey % 2 = 0 THEN
         ' u' || CAST(o_orderkey % 97 AS VARCHAR) || '@host'
         || CAST(o_custkey % 13 AS VARCHAR) || '.net' ELSE '' END
    || CASE WHEN o_orderkey % 3 = 0 THEN
         ' ' || CAST(o_orderkey % 900 + 100 AS VARCHAR)
         || '-' || CAST(o_custkey % 900 + 100 AS VARCHAR)
         || '-' || CAST(o_orderkey % 9000 + 1000 AS VARCHAR) ELSE '' END
    || CASE WHEN o_orderkey % 5 = 0 THEN
         ' ' || CAST(o_orderkey % 256 AS VARCHAR)
         || '.' || CAST(o_custkey % 256 AS VARCHAR)
         || '.' || CAST(o_orderkey % 100 AS VARCHAR)
         || '.' || CAST(o_custkey % 100 AS VARCHAR) ELSE '' END
    || ' end' AS text
  FROM orders)
SELECT o_orderkey,
  {counts},
  {scrub} AS text_scrubbed
FROM t
"""


# ------------------------------------------------------------------ ANN


def q_ann_bruteforce(sf_dir: str):
    """Exact cosine top-10 vs the vec_id=0 embedding (engine.ann)."""
    import pyarrow.parquet as _pq

    from engine.ann import brute_topk

    qvec = (
        _pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .filter(pc.equal(pc.field("vec_id"), 0))["embedding"][0]
        .as_py()
    )
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"], rows_per_block=256)
    return brute_topk(ds, qvec, k=10, exclude_ids={0})


SQL_ANN_BRUTEFORCE = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT vec_id, list_cosine_similarity(embedding, (SELECT qv FROM q)) AS cos
  FROM embeddings WHERE vec_id <> 0)
SELECT vec_id,
       CAST(FLOOR(cos * 1000 + 0.5) AS BIGINT) AS cos_milli,
       CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
FROM sims
ORDER BY cos DESC, vec_id
LIMIT 10
"""


def q_ann_ivf(sf_dir: str):
    """IVF approximate cosine top-10 (rows-only; pytest measures
    recall vs brute force). The query vector is selected BY vec_id
    with a predicate-pruned footer read (never by row position —
    parquet row order is not a contract), and k-means trains on a
    DISTRIBUTED hash-sample of the Dataset (engine.ann.train_sample)
    — no whole-table driver read anywhere on this path."""
    import pyarrow.parquet as _pq

    from engine.ann import IvfIndex, _emb_matrix, ivf_topk, train_sample

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"], rows_per_block=256)
    train = train_sample(ds, target=2000)
    qt = _pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", 0)],
    )
    qvec = _emb_matrix(qt, "embedding")[0]
    index = IvfIndex(train, n_lists=16)
    return ivf_topk(ds, index, qvec, k=10, nprobe=4, exclude_ids={0})


# -------------------------------------------------------------- dedup ops


def q_minhash_dedup(sf_dir: str):
    """MinHash-LSH near-dup candidate pairs over documents, band-count
    per pair (rows-only; exactness vs brute-force Jaccard in pytest)."""
    from engine.dedupe import minhash_lsh_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    return minhash_lsh_pairs(ds)


def q_incremental_dedup(sf_dir: str) -> Dataset:
    """Incremental exact dedup (X24, the resumable append-only ingest
    shape): an index built from the existing corpus, then a NEW batch
    deduped against it without touching old text. The corpus has no
    natural exact dups, so the new batch is synthesized from documents
    by arithmetic on BOTH sides (the pii_scrub precedent): +10000 ids
    re-carry old text (cross-batch dups), +20000 a second copy of a
    subset (dups of both index and batch), +30000/'fresh' unique
    newcomers, +40000/+50000 a ' novel' pair (within-batch-only dup —
    keeper is the smaller new id, not an index id)."""
    from engine.dedupe import exact_dedup_index, incremental_exact_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    index = exact_dedup_index(docs)

    def make_new(b: pa.Table) -> pa.Table:
        ids = b["doc_id"]
        txt = b["text"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        iv = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        parts = []
        m3 = pa.array(iv % 3 == 0)
        parts.append(
            pa.table({"doc_id": pc.add(ids.filter(m3), 10000), "text": txt.filter(m3)})
        )
        m9 = pa.array(iv % 9 == 0)
        parts.append(
            pa.table({"doc_id": pc.add(ids.filter(m9), 20000), "text": txt.filter(m9)})
        )
        m1 = pa.array(iv % 3 == 1)
        fresh = pc.binary_join_element_wise(txt.filter(m1), " fresh", "")
        parts.append(pa.table({"doc_id": pc.add(ids.filter(m1), 30000), "text": fresh}))
        m2 = pa.array(iv % 3 == 2)
        novel = pc.binary_join_element_wise(txt.filter(m2), " novel", "")
        parts.append(pa.table({"doc_id": pc.add(ids.filter(m2), 40000), "text": novel}))
        parts.append(pa.table({"doc_id": pc.add(ids.filter(m2), 50000), "text": novel}))
        return pa.concat_tables(parts)

    new = docs.map_batches(make_new, batch_format="pyarrow")
    return incremental_exact_dedup(new, index)


SQL_INCREMENTAL_DEDUP = """
WITH newb AS (
  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
  UNION ALL SELECT doc_id + 20000, text FROM documents WHERE doc_id % 9 = 0
  UNION ALL SELECT doc_id + 30000, text || ' fresh' FROM documents WHERE doc_id % 3 = 1
  UNION ALL SELECT doc_id + 40000, text || ' novel' FROM documents WHERE doc_id % 3 = 2
  UNION ALL SELECT doc_id + 50000, text || ' novel' FROM documents WHERE doc_id % 3 = 2),
idx AS (SELECT text, CAST(MIN(doc_id) AS BIGINT) AS keep_id FROM documents GROUP BY text),
r AS (SELECT n.doc_id, n.text,
        CAST(MIN(n.doc_id) OVER (PARTITION BY n.text) AS BIGINT) AS min_new
      FROM newb n)
SELECT r.doc_id,
       (i.keep_id IS NULL AND r.doc_id = r.min_new) AS keep,
       CAST(COALESCE(i.keep_id, r.min_new) AS BIGINT) AS dup_of
FROM r LEFT JOIN idx i ON r.text = i.text
"""


def q_corpus_diff(sf_dir: str) -> Dataset:
    """Content-level snapshot diff (X25): documents vs a synthesized
    next crawl (every 5th doc dropped, ids %5==1 rewritten, a batch of
    new docs appended) → per-status counts. Runs on the digest-scale
    indexes only (X24's state); both snapshots derive from the same
    parquet on both sides."""
    from engine.dedupe import corpus_diff, exact_dedup_index

    docs = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)

    def make_b(b: pa.Table) -> pa.Table:
        ids = b["doc_id"]
        txt = b["text"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        iv = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        kept = pa.array(iv % 5 != 0)
        k_ids = ids.filter(kept)
        k_txt = txt.filter(kept)
        k_iv = iv[iv % 5 != 0]
        mod = pa.array(k_iv % 5 == 1)
        k_txt = pc.if_else(
            mod, pc.binary_join_element_wise(k_txt, " v2", ""), k_txt
        )
        m2 = pa.array(iv % 5 == 2)
        extra = pa.table(
            {
                "doc_id": pc.add(ids.filter(m2), 60000),
                "text": pc.binary_join_element_wise(txt.filter(m2), " extra", ""),
            }
        )
        return pa.concat_tables(
            [pa.table({"doc_id": k_ids, "text": k_txt}), extra]
        )

    index_a = exact_dedup_index(docs)
    index_b = exact_dedup_index(docs.map_batches(make_b, batch_format="pyarrow"))
    d = corpus_diff(index_a, index_b)
    agg = grouped_count_sums(d.select_columns(["status"]), key="status")
    return agg.map_batches(
        lambda b: b.rename_columns(["status", "n"]), batch_format="pyarrow"
    )


SQL_CORPUS_DIFF = """
WITH a AS (SELECT text, MIN(doc_id) AS id FROM documents GROUP BY text),
bsrc AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 1 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 5 <> 0
  UNION ALL
  SELECT doc_id + 60000, text || ' extra' FROM documents WHERE doc_id % 5 = 2),
b AS (SELECT text, MIN(doc_id) AS id FROM bsrc GROUP BY text)
SELECT CASE WHEN a.id IS NULL THEN 'added'
            WHEN b.id IS NULL THEN 'removed'
            ELSE 'common' END AS status,
       CAST(COUNT(*) AS BIGINT) AS n
FROM a FULL OUTER JOIN b ON a.text = b.text
GROUP BY 1
"""


def q_simhash_pairs(sf_dir: str):
    from engine.dedupe import simhash_candidates

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    return simhash_candidates(ds, max_hamming=8)


def q_line_dedup(sf_dir: str) -> Dataset:
    """C4-style corpus-wide line dedup over documents (X20): a line
    occurring more than once anywhere survives only at its first
    (doc_id, line_no) occurrence; docs are rebuilt from kept lines.
    The single-line corpus gets its lines as 3-token windows (the
    span-dedup shape; SQL groups token positions by (p-1)//3) — the
    newline mode is pytest-covered."""
    from engine.dedupe import line_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    return line_dedup(ds, token_width=3)


SQL_LINE_DEDUP = r"""
WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ts FROM documents),
lines AS (
  SELECT doc_id, ln, string_agg(tok, ' ' ORDER BY p) AS line
  FROM (SELECT doc_id, p, ts[p] AS tok, (p - 1) // 3 AS ln
        FROM t, LATERAL unnest(range(1, len(ts) + 1)) AS r(p))
  GROUP BY doc_id, ln),
ranked AS (
  SELECT doc_id, ln, line,
         ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, ln) AS rn
  FROM lines),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         COALESCE(string_agg(CASE WHEN rn = 1 THEN line END, chr(10) ORDER BY ln), '')
           AS text_dedup
  FROM ranked GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(a.n_lines, 0) AS n_lines,
       COALESCE(a.n_dropped, 0) AS n_dropped,
       COALESCE(a.text_dedup, '') AS text_dedup
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


# Shared HUGEINT mirror of the engine's per-token FNV-1a (dedupe.
# _fnv1a_tokens): mod-2^64 arithmetic with the XOR done on the low
# byte only (h is always a multiple-of-256 split: (h//256)*256 +
# xor(h%256, byte) == h XOR byte because byte < 256). Tokenization is
# regexp '\\S+' == Python str.split() on this ASCII corpus (ord ==
# utf-8 byte; same guarantee the fingerprint oracle relies on).
def _sql_token_hashes(src: str = "documents") -> str:
    """The shared token-hash CTE over an arbitrary (doc_id, text)
    source relation — mirrors that tokenize a DERIVED corpus (e.g. the
    incremental-minhash index ∪ new-batch union) parameterize ``src``;
    the module constant below keeps the plain-``documents`` form every
    existing mirror interpolates."""
    return _SQL_TOKEN_HASHES.replace("FROM documents,", f"FROM {src},")


_SQL_TOKEN_HASHES = r"""
toks AS (
  SELECT doc_id, p AS pos, regexp_extract_all(text, '\S+')[p] AS tok
  FROM documents, LATERAL unnest(range(1, len(regexp_extract_all(text, '\S+')) + 1)) AS t(p)),
th AS (
  SELECT doc_id, pos,
    list_reduce(
      list_prepend(14695981039346656037::HUGEINT,
        list_transform(string_split(tok, ''), c -> ord(c)::HUGEINT)),
      (h, b) -> (((h // 256) * 256 +
                  CAST(xor(CAST(h % 256 AS BIGINT), CAST(b AS BIGINT)) AS HUGEINT))
                 * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
    ) AS h
  FROM toks)"""


def _sql_simhash_pairs(max_hamming: int = 8) -> str:
    """Term-for-term mirror of dedupe.simhash_batch +
    simhash_candidates: per-bit weighted token-hash sums -> 64-bit
    fingerprint (two's-complement BIGINT, exactly the engine's int64
    view) -> 16-bit-chunk blocking -> popcount-of-xor hamming."""
    pow2 = ", ".join(f"({j}, {1 << j}::HUGEINT)" for j in range(64))
    return f"""
WITH {_SQL_TOKEN_HASHES},
pow2(j, p) AS (VALUES {pow2}),
bitsums AS (
  SELECT th.doc_id, pow2.j, pow2.p,
         SUM(CAST((th.h // pow2.p) % 2 AS BIGINT)) AS ones, COUNT(*) AS n
  FROM th, pow2 GROUP BY th.doc_id, pow2.j, pow2.p),
shx AS (
  SELECT doc_id, SUM(CASE WHEN 2 * ones - n > 0 THEN p ELSE 0::HUGEINT END) AS us
  FROM bitsums GROUP BY doc_id),
u AS (
  SELECT d.doc_id, COALESCE(shx.us, 0::HUGEINT) AS us,
    CAST(CASE WHEN COALESCE(shx.us, 0::HUGEINT) >= 9223372036854775808::HUGEINT
              THEN COALESCE(shx.us, 0::HUGEINT) - 18446744073709551616::HUGEINT
              ELSE COALESCE(shx.us, 0::HUGEINT) END AS BIGINT) AS sh_i
  FROM documents d LEFT JOIN shx ON d.doc_id = shx.doc_id),
ch AS (
  SELECT doc_id, sh_i,
    CAST((us // 1::HUGEINT) % 65536 AS BIGINT) AS c0,
    CAST((us // 65536::HUGEINT) % 65536 AS BIGINT) AS c1,
    CAST((us // 4294967296::HUGEINT) % 65536 AS BIGINT) AS c2,
    CAST((us // 281474976710656::HUGEINT) % 65536 AS BIGINT) AS c3
  FROM u)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sh_i, b.sh_i)) AS BIGINT) AS hamming
FROM ch a JOIN ch b ON a.doc_id < b.doc_id
 AND (a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3)
WHERE bit_count(xor(a.sh_i, b.sh_i)) <= {max_hamming}
"""


def q_embedding_dups(sf_dir: str):
    """Embedding cosine near-dup over embeddings UNION a deterministic
    perturbed copy of every 10th vector (id + 10^9): the raw synthetic
    embeddings are near-orthogonal random vectors (zero true dups —
    verified), so the planted copies make the rows-only check
    meaningful: expected output ~= one pair per planted copy."""
    from engine.dedupe import embedding_dup_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"], rows_per_block=256)

    def plant(b: pa.Table) -> pa.Table:
        from engine.ann import _emb_matrix

        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        emb = _emb_matrix(b, "embedding")  # zero-copy flat-buffer reshape
        sel = ids % 10 == 0
        pid = ids[sel] + 1_000_000_000
        pemb = emb[sel] * 1.0001 + 1e-4  # same direction, tiny shift
        out_ids = np.concatenate([ids, pid])
        out_emb = np.vstack([emb, pemb])
        return pa.table(
            {
                "vec_id": pa.array(out_ids),
                "embedding": pa.array(list(out_emb), pa.list_(pa.float64())),
            }
        )

    planted = ds.map_batches(plant, batch_format="pyarrow")
    return embedding_dup_pairs(planted, threshold=0.8)


SQL_EMBEDDING_DUPS = """
WITH base AS (SELECT vec_id, embedding FROM embeddings),
planted AS (
  SELECT vec_id + 1000000000 AS vec_id,
         list_transform(embedding, x -> x * 1.0001e0 + 1.0e-4) AS embedding
  FROM base WHERE vec_id % 10 = 0),
allv AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    list_cosine_similarity(a.embedding, b.embedding) AS cos
  FROM allv a JOIN allv b ON a.vec_id < b.vec_id)
SELECT id_a, id_b, CAST(FLOOR(cos * 1000 + 0.5) AS BIGINT) AS cos_milli
FROM pairs WHERE cos >= 0.8
"""


def q_fingerprint_docs(sf_dir: str):
    from engine.textops import fingerprint_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    ds = ds.map_batches(fingerprint_batch, batch_format="pyarrow")
    return ds.map_batches(lambda b: b.select(["doc_id", "fingerprint"]), batch_format="pyarrow")


def _sql_fingerprint_docs() -> str:
    """Term-for-term HUGEINT mirror of textops.rolling_fingerprint:
    per window position p, h = (sum_i byte_i * B^(w-1-i)) mod 2^64;
    fingerprint = min(h) >> 1 as int64. Valid because the synthetic
    documents corpus is pure ASCII (ord == utf-8 byte, verified at
    every sf) and every doc is >= the 16-byte window (min len 44), so
    the short-doc branch never fires; a shorter doc would drop out of
    the LATERAL range and fail the driver's row-count check loudly."""
    from engine.textops import _B

    w = 16
    pows = [pow(int(_B), w - 1 - i, 1 << 64) for i in range(w)]
    terms = " + ".join(
        f"ord(substr(text, p + {i}, 1)) * {pows[i]}::HUGEINT" for i in range(w)
    )
    return f"""
WITH w AS (
  SELECT doc_id, ({terms}) % 18446744073709551616::HUGEINT AS h
  FROM documents, LATERAL unnest(range(1, length(text) - {w - 2})) AS t(p))
SELECT doc_id, CAST(MIN(h // 2) AS BIGINT) AS fingerprint
FROM w GROUP BY doc_id
"""


def q_vocab_topk(sf_dir: str) -> Dataset:
    """Vocabulary heavy hitters (training-data op: vocab building /
    frequent-token mining): exact top-20 tokens by count. Map-side
    combiner emits per-batch (token, _cnt) distinct-token partials
    (textops.token_count_partials — the shuffle moves vocab-sized
    partials, never occurrences), ONE coarse keyed partition merges
    them at C speed, then the per-block-prune top-k on the total order
    (cnt DESC, token ASC) so ties are deterministic on both sides."""
    from engine.shuffle import keyed_partition_map, topk
    from engine.textops import token_count_partials

    ds = _read(sf_dir, "documents", ["text"], rows_per_block=256)
    partials = ds.map_batches(token_count_partials, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", sort=False)["_cnt"].sum().reset_index()
        return pd.DataFrame(
            {"token": g["token"], "cnt": g["_cnt"].astype(np.int64)}
        )

    merged = keyed_partition_map(
        partials,
        ["token"],
        merge,
        num_partitions=32,
        out_schema=pa.schema([("token", pa.string()), ("cnt", pa.int64())]),
    )
    return topk(merged, ["cnt", "token"], 20, descending=[True, False])


# regexp_extract_all('[a-z0-9]+') ≡ split on '[^a-z0-9]+' + drop empties
# (prototype-verified token-for-token at sf0.01).
SQL_VOCAB_TOPK = """
SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents)
GROUP BY token
ORDER BY cnt DESC, token ASC
LIMIT 20
"""


def q_json_props_stats(sf_dir: str) -> Dataset:
    """Semi-structured ingestion: extract the integer `k` field from
    the JSON `props` payload with ONE vectorized RE2 pass
    (textops.json_field_int — no per-row parse), then the standard
    combiner rollup per event_type. The 100 TB shape: parse cost is a
    flat scan fused into the read stage; only (type, partial) rows
    shuffle."""
    from engine.textops import json_field_int

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def fn(b: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": b["event_type"], "k": json_field_int(b["props"], "k")}
        )

    ds = ds.map_batches(fn, batch_format="pyarrow")
    return grouped_count_sums(
        ds, "event_type", sum_cols=["k"], min_cols=["k"], max_cols=["k"]
    )


SQL_JSON_PROPS_STATS = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type
"""


REGISTRY.update(
    {
        "json_props_stats": (q_json_props_stats, SQL_JSON_PROPS_STATS),
        "vocab_topk": (q_vocab_topk, SQL_VOCAB_TOPK),
        "langid": (q_langid, SQL_LANGID),
        "token_stats_ext": (q_token_stats_ext, SQL_TOKEN_STATS_EXT),
        "repetition_signals": (q_repetition_signals, SQL_REPETITION_SIGNALS),
        "pii_scrub": (q_pii_scrub, _sql_pii_scrub()),
        "line_dedup_docs": (q_line_dedup, SQL_LINE_DEDUP),
        "lm_quality_scores": (q_lm_quality, None),
        "semantic_clusters": (q_semantic_clusters, None),
        "quality_scores": (q_quality_scores, SQL_QUALITY_SCORES),
        "ann_bruteforce": (q_ann_bruteforce, SQL_ANN_BRUTEFORCE),
        "ann_ivf": (q_ann_ivf, None),
        "minhash_dedup": (q_minhash_dedup, None),
        # Exact value oracle (round-3): the whole simhash pipeline is
        # SQL-expressible with the HUGEINT token-hash mirror.
        "simhash_pairs": (q_simhash_pairs, _sql_simhash_pairs()),
        "incremental_dedup": (q_incremental_dedup, SQL_INCREMENTAL_DEDUP),
        "corpus_diff_docs": (q_corpus_diff, SQL_CORPUS_DIFF),
        # LSH recall vs the exact cosine threshold is deterministic on
        # this corpus: multi-table random-hyperplane buckets find every
        # >=0.8 pair (planted dups at cos ~0.99997; random 128-dim pairs
        # are near-orthogonal) — verified pair-for-pair at all sfs, so
        # the brute-force SQL IS an exact oracle here.
        "embedding_dups": (q_embedding_dups, SQL_EMBEDDING_DUPS),
        "fingerprint_docs": (q_fingerprint_docs, _sql_fingerprint_docs()),
    }
)


# ------------------------------------------------- windowed / sessionized


def q_sessionize(sf_dir: str) -> Dataset:
    """Gap-based sessionization per user (engine.windows) — the
    stream-shaped stateful op, oracled by SQL window functions."""
    from engine.windows import sessionize

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return sessionize(ds, gap_ms=30 * 60 * 1000)


SQL_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > 1800000
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts,
    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged)
SELECT user_id, session_id, COUNT(*) AS n_events,
       CAST(epoch_ms(MAX(ts)) - epoch_ms(MIN(ts)) AS BIGINT) AS duration_ms
FROM sess GROUP BY user_id, session_id
"""


def q_topk_per_type(sf_dir: str) -> Dataset:
    """Top-2 events per event_type by value (window rank)."""
    from engine.windows import add_value_milli, topk_per_group

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    ds = ds.map_batches(add_value_milli, batch_format="pyarrow").map_batches(
        lambda b: b.drop_columns(["value"]), batch_format="pyarrow"
    )
    return topk_per_group(ds, group="event_type", order_col="value_milli", k=2)


SQL_TOPK_PER_TYPE = """
WITH r AS (
  SELECT event_id, event_type,
         CAST(ROUND(value * 1000) AS BIGINT) AS value_milli,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY CAST(ROUND(value * 1000) AS BIGINT) DESC, event_id) AS BIGINT) AS rank
  FROM events)
SELECT event_id, event_type, value_milli, rank FROM r WHERE rank <= 2
"""


def q_running_totals(sf_dir: str) -> Dataset:
    """Per-user cumulative count + exact-int cumulative value in
    (ts, event_id) order."""
    from engine.windows import add_value_milli, running_totals

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(add_value_milli, batch_format="pyarrow").map_batches(
        lambda b: b.drop_columns(["value"]), batch_format="pyarrow"
    )
    return running_totals(ds)


SQL_RUNNING_TOTALS = """
SELECT event_id, user_id,
       CAST(ROUND(value * 1000) AS BIGINT) AS value_milli,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS running_n,
       CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS running_value_milli
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
"""


def q_parts_by_brand(sf_dir: str) -> Dataset:
    """part-table aggregate: size stats per brand (exact cents)."""
    ds = _read(sf_dir, "part", ["p_brand", "p_size", "p_retailprice"])

    def prep(b: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(b["p_retailprice"], 100.0), round_mode="half_towards_infinity"),
            pa.int64(),
        )
        return pa.table(
            {"p_brand": b["p_brand"], "p_size": pc.cast(b["p_size"], pa.int64()), "price_cents": c}
        )

    ds = ds.map_batches(prep, batch_format="pyarrow")
    return ds.groupby("p_brand").aggregate(
        Count(alias_name="n_parts"),
        Sum("p_size", alias_name="sum_size"),
        Max("price_cents", alias_name="max_price_cents"),
        Min("price_cents", alias_name="min_price_cents"),
    )


SQL_PARTS_BY_BRAND = """
SELECT p_brand, COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS sum_size,
       MAX(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS max_price_cents,
       MIN(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS min_price_cents
FROM part GROUP BY p_brand
"""


def q_supplier_nation(sf_dir: str) -> Dataset:
    """supplier ⋈ nation broadcast join + per-nation balance."""
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    from engine.joins import broadcast_lookup

    ds = broadcast_lookup(sup, nation, "s_nationkey", "n_nationkey", ["n_name"])

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(b["s_acctbal"], 100.0), round_mode="half_towards_infinity"),
            pa.int64(),
        )
        return b.append_column("bal_cents", c)

    ds = ds.map_batches(cents, batch_format="pyarrow")
    return ds.groupby("n_name").aggregate(
        Count(alias_name="n_suppliers"), Sum("bal_cents", alias_name="sum_bal_cents")
    )


SQL_SUPPLIER_NATION = """
SELECT n_name, COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_bal_cents
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


REGISTRY.update(
    {
        "sessionize": (q_sessionize, SQL_SESSIONIZE),
        "topk_per_type": (q_topk_per_type, SQL_TOPK_PER_TYPE),
        "running_totals": (q_running_totals, SQL_RUNNING_TOTALS),
        "parts_by_brand": (q_parts_by_brand, SQL_PARTS_BY_BRAND),
        "supplier_nation": (q_supplier_nation, SQL_SUPPLIER_NATION),
    }
)


# ----------------------------------------------------- set ops / sampling


def q_set_ops_names(sf_dir: str) -> Dataset:
    """Union of two name columns (ds.union) + grouped count — the
    thin set-op helpers (SURVEY.md §2.5 set-ops note)."""
    nation = _read(sf_dir, "nation", ["n_name"]).map_batches(
        lambda b: pa.table({"name": b["n_name"]}), batch_format="pyarrow"
    )
    region = _read(sf_dir, "region", ["r_name"]).map_batches(
        lambda b: pa.table({"name": b["r_name"]}), batch_format="pyarrow"
    )
    return nation.union(region).groupby("name").aggregate(Count(alias_name="cnt"))


SQL_SET_OPS_NAMES = """
SELECT name, COUNT(*) AS cnt FROM (
  SELECT n_name AS name FROM nation
  UNION ALL
  SELECT r_name AS name FROM region)
GROUP BY name
"""


def q_sample_lineitem(sf_dir: str) -> Dataset:
    """Seeded deterministic sample (A6) — rows-only (sampling is not
    SQL-mirrorable row-for-row); driver checks determinism."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    return ds.random_sample(0.05, seed=42)


REGISTRY.update(
    {
        "set_ops_names": (q_set_ops_names, SQL_SET_OPS_NAMES),
        "sample_lineitem": (q_sample_lineitem, None),
    }
)


# ------------------------------------- SQL-oracled geodesy (bitwise match)
# Deterministic test points derived from lineitem keys by integer
# arithmetic (identical in numpy and SQL); the TM kernels' evaluation
# order is mirrored term-for-term in the generated SQL, and numpy and
# DuckDB share libm — measured bitwise-equal outputs.

_PTS_NP = None


def _derived_points(sf_dir: str):
    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber", "l_partkey"]
    )
    ok = t["l_orderkey"].to_numpy()
    ln = t["l_linenumber"].to_numpy().astype(np.int64)
    pk = t["l_partkey"].to_numpy()
    fi = 45.2 + ((ok * 40503 + ln) % 100000) * 1.9e-5
    la = 13.1 + ((ok * 69069 + pk) % 100000) * 3.6e-5
    return ok, ln, fi, la


_SQL_PTS = """
WITH pts AS (
 SELECT l_orderkey, l_linenumber,
   45.2 + ((l_orderkey * 40503 + l_linenumber) % 100000) * 1.9e-5 AS fi,
   13.1 + ((l_orderkey * 69069 + l_partkey) % 100000) * 3.6e-5 AS la
 FROM lineitem)
"""


def q_tm_scale_convergence(sf_dir: str):
    """TM point scale factor + meridian convergence diagnostics
    (reference's gk-slo diagnostic outputs, SURVEY.md §2.6) on derived
    points — bitwise-matched SQL oracle."""
    from geokit.datums import D96_TM
    from geokit.tm import tm_point_scale_convergence

    ok, ln, fi, la = _derived_points(sf_dir)
    k, gamma = tm_point_scale_convergence(fi, la, D96_TM)
    return pa.table(
        {
            "l_orderkey": pa.array(ok),
            "l_linenumber": pa.array(ln.astype(np.int32)),
            "k_scale": pa.array(k),
            "gamma_deg": pa.array(gamma),
        }
    )


def _sql_tm_scale_convergence() -> str:
    from geokit.datums import D96_TM

    ep2 = D96_TM.ellipsoid.ep2
    return (
        _SQL_PTS
        + f""",
c AS (SELECT l_orderkey, l_linenumber, radians(fi) AS phi, radians(la) - radians(15.0) AS dl FROM pts),
d AS (SELECT *, cos(phi) AS cp, sin(phi) AS sp FROM c),
e AS (SELECT *, dl * cp AS A, {ep2!r} * cp * cp AS C, (sp/cp)*(sp/cp) AS T FROM d),
f AS (SELECT *, A*A AS A2 FROM e)
SELECT l_orderkey, CAST(l_linenumber AS INTEGER) AS l_linenumber,
  0.9999 * (1.0 + (1.0 + C) * A2 / 2.0 + (5.0 - 4.0 * T) * (A2*A2) / 24.0) AS k_scale,
  degrees(dl * sp * (1.0 + (1.0 + 3.0 * C) * A2 / 3.0)) AS gamma_deg
FROM f
"""
    )


def q_tm_forward(sf_dir: str):
    """Full Gauss-Krüger forward projection (geokit.tm.tm_fwd, the
    reference's fila2xy_ellips K3) on derived points — the SQL oracle
    reproduces the meridian-arc + Redfearn series term-for-term."""
    from geokit.datums import D96_TM
    from geokit.tm import tm_fwd

    ok, ln, fi, la = _derived_points(sf_dir)
    x, y = tm_fwd(fi, la, D96_TM)
    return pa.table(
        {
            "l_orderkey": pa.array(ok),
            "l_linenumber": pa.array(ln.astype(np.int32)),
            "x_d96": pa.array(x),
            "y_d96": pa.array(y),
        }
    )


def _sql_tm_forward() -> str:
    from geokit.datums import D96_TM

    ell = D96_TM.ellipsoid
    e2 = ell.e2
    e4 = e2 * e2
    e6 = e4 * e2
    ep2 = ell.ep2
    a = ell.a
    c1 = 1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0
    c2 = 3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0
    c3 = 15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0
    c4 = 35.0 * e6 / 3072.0
    return (
        _SQL_PTS
        + f""",
c AS (SELECT l_orderkey, l_linenumber, radians(fi) AS phi, radians(la) AS lam FROM pts),
d AS (SELECT *, sin(phi) AS sp, cos(phi) AS cp FROM c),
e AS (SELECT *, sp / cp AS tp,
        {a!r} / sqrt(1.0 - {e2!r} * sp * sp) AS N,
        {ep2!r} * cp * cp AS C,
        (lam - radians(15.0)) * cp AS A,
        {a!r} * ({c1!r} * phi - {c2!r} * sin(2.0 * phi) + {c3!r} * sin(4.0 * phi) - {c4!r} * sin(6.0 * phi)) AS M
      FROM d),
f AS (SELECT *, tp * tp AS T, A * A AS A2 FROM e),
g AS (SELECT *, A2 * A AS A3, A2 * A2 AS A4 FROM f),
h AS (SELECT *, A4 * A AS A5, A4 * A2 AS A6 FROM g)
SELECT l_orderkey, CAST(l_linenumber AS INTEGER) AS l_linenumber,
  -5000000.0 + 0.9999 * (M - 0.0 + N * tp * (A2 / 2.0
      + (5.0 - T + 9.0 * C + 4.0 * C * C) * A4 / 24.0
      + (61.0 - 58.0 * T + T * T + 600.0 * C - 330.0 * {ep2!r}) * A6 / 720.0)) AS x_d96,
  500000.0 + 0.9999 * N * (A
      + (1.0 - T + C) * A3 / 6.0
      + (5.0 - 18.0 * T + T * T + 72.0 * C - 58.0 * {ep2!r}) * A5 / 120.0) AS y_d96
FROM h
"""
    )


REGISTRY.update(
    {
        "tm_scale_convergence": (q_tm_scale_convergence, _sql_tm_scale_convergence()),
        "tm_forward": (q_tm_forward, _sql_tm_forward()),
    }
)


def _c(v: float) -> str:
    """Embed a float constant in SQL, parenthesized — a bare negative
    after '-' would form '--', an SQL comment."""
    return f"({v!r})"


def q_helmert_chain(sf_dir: str):
    """The FULL D48/GK -> ETRS89 Helmert chain (reference
    ggeo.c::gkxy2fila_wgs, SURVEY.md §2.1 K10 = K4 tm_inv + K5
    fila2xyz + K7 helmert + K6 xyz2fila) on integer-derived D48 grid
    points, oracled by a term-for-term SQL mirror with the iterative
    geodetic-latitude solve unrolled 8x. numpy/DuckDB agree to ~2e-14
    deg; outputs are quantized (microdegrees / cm) with measured
    boundary margins >=23x the cross-engine diff at every sf."""
    t = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    ok = t["o_orderkey"].to_numpy()
    ck = t["o_custkey"].to_numpy()
    x48 = 30000.0 + ((ok * 40503 + ck) % 100000) * 1.7
    y48 = 380000.0 + ((ok * 69069 + ck) % 100000) * 2.2
    from geokit.transforms import gkxy2fila_wgs

    fi, la, h = gkxy2fila_wgs(x48, y48)
    return pa.table(
        {
            "o_orderkey": pa.array(ok),
            "fi_udeg": pa.array(np.floor(fi * 1e6 + 0.5).astype(np.int64)),
            "la_udeg": pa.array(np.floor(la * 1e6 + 0.5).astype(np.int64)),
            "h_cm": pa.array(np.floor(h * 1e2 + 0.5).astype(np.int64)),
        }
    )


def _sql_helmert_chain() -> str:
    import numpy as _np

    from geokit.datums import D48_GK, HELMERT_D48_TO_D96 as P
    from geokit.ellipsoids import GRS80

    bes = D48_GK.ellipsoid
    e2b, ep2b, ab = bes.e2, bes.ep2, bes.a
    e4b, e6b = e2b * e2b, e2b * e2b * e2b
    c1 = 1.0 - e2b / 4.0 - 3.0 * e4b / 64.0 - 5.0 * e6b / 256.0
    sq = _np.sqrt(1.0 - e2b)
    e1 = (1.0 - sq) / (1.0 + sq)
    d1 = 3.0 * e1 / 2.0 - 27.0 * e1**3 / 32.0
    d2 = 21.0 * e1**2 / 16.0 - 55.0 * e1**4 / 32.0
    d3 = 151.0 * e1**3 / 96.0
    d4 = 1097.0 * e1**4 / 512.0
    e2g, ag = GRS80.e2, GRS80.a
    c = P.scale

    iters = "\n".join(
        f"i{n} AS (SELECT * REPLACE (atan2(Z + {_c(e2g)} * ({_c(ag)} / sqrt(1.0 - {_c(e2g)} * sin(phi) * sin(phi))) * sin(phi), p) AS phi) FROM i{n-1}),"
        for n in range(1, 9)
    )
    return f"""
WITH pts AS (
 SELECT o_orderkey,
   30000.0 + ((o_orderkey * 40503 + o_custkey) % 100000) * 1.7 AS x48,
   380000.0 + ((o_orderkey * 69069 + o_custkey) % 100000) * 2.2 AS y48
 FROM orders),
m AS (SELECT o_orderkey, x48, y48, 0.0 + (x48 - (-5000000.0)) / 0.9999 AS M FROM pts),
mu AS (SELECT *, M / ({_c(ab)} * {_c(c1)}) AS mu FROM m),
p1 AS (SELECT *, mu + {_c(d1)} * sin(2.0*mu) + {_c(d2)} * sin(4.0*mu) + {_c(d3)} * sin(6.0*mu) + {_c(d4)} * sin(8.0*mu) AS phi1 FROM mu),
p2 AS (SELECT *, sin(phi1) AS sp1, cos(phi1) AS cp1 FROM p1),
p3 AS (SELECT *, sp1/cp1 AS tp1, {_c(ep2b)} * cp1 * cp1 AS C1, (sp1/cp1)*(sp1/cp1) AS T1, 1.0 - {_c(e2b)} * sp1 * sp1 AS om FROM p2),
p4 AS (SELECT *, {_c(ab)} / sqrt(om) AS N1, {_c(ab)} * (1.0 - {_c(e2b)}) / (om * sqrt(om)) AS R1 FROM p3),
p5 AS (SELECT *, (y48 - 500000.0) / (N1 * 0.9999) AS D FROM p4),
p6 AS (SELECT *, D*D AS DD2 FROM p5),
p7 AS (SELECT *, DD2*D AS DD3, DD2*DD2 AS DD4 FROM p6),
p8 AS (SELECT *, DD4*D AS DD5, DD4*DD2 AS DD6 FROM p7),
geo AS (SELECT o_orderkey,
  phi1 - (N1 * tp1 / R1) * (DD2/2.0 - (5.0 + 3.0*T1 + 10.0*C1 - 4.0*C1*C1 - 9.0*{_c(ep2b)}) * DD4/24.0
      + (61.0 + 90.0*T1 + 298.0*C1 + 45.0*T1*T1 - 252.0*{_c(ep2b)} - 3.0*C1*C1) * DD6/720.0) AS phib,
  radians(15.0) + (D - (1.0 + 2.0*T1 + C1) * DD3/6.0
      + (5.0 - 2.0*C1 + 28.0*T1 - 3.0*C1*C1 + 8.0*{_c(ep2b)} + 24.0*T1*T1) * DD5/120.0) / cp1 AS lamb
  FROM p8),
rads AS (SELECT o_orderkey, radians(degrees(phib)) AS phi2, radians(degrees(lamb)) AS lam2 FROM geo),
nb AS (SELECT o_orderkey, phi2, lam2, {_c(ab)} / sqrt(1.0 - {_c(e2b)} * sin(phi2) * sin(phi2)) AS Nb FROM rads),
ecef AS (SELECT o_orderkey,
   (Nb + 0.0) * cos(phi2) * cos(lam2) AS Xb,
   (Nb + 0.0) * cos(phi2) * sin(lam2) AS Yb,
   (Nb * (1.0 - {_c(e2b)}) + 0.0) * sin(phi2) AS Zb
  FROM nb),
helm AS (SELECT o_orderkey,
   {_c(c)} * (Xb - {_c(P.rz)} * Yb + {_c(P.ry)} * Zb) + {_c(P.dx)} AS X,
   {_c(c)} * ({_c(P.rz)} * Xb + Yb - {_c(P.rx)} * Zb) + {_c(P.dy)} AS Y,
   {_c(c)} * ((-{_c(P.ry)}) * Xb + {_c(P.rx)} * Yb + Zb) + {_c(P.dz)} AS Z
  FROM ecef),
i0 AS (SELECT o_orderkey, X, Y, Z, sqrt(X*X + Y*Y) AS p, atan2(Y, X) AS lam, atan2(Z, sqrt(X*X + Y*Y) * (1.0 - {_c(e2g)})) AS phi FROM helm),
{iters}
fin AS (SELECT o_orderkey, degrees(phi) AS fi, degrees(lam) AS la,
        p / cos(phi) - {_c(ag)} / sqrt(1.0 - {_c(e2g)} * sin(phi) * sin(phi)) AS h FROM i8)
SELECT o_orderkey,
  CAST(FLOOR(fi * 1e6 + 0.5) AS BIGINT) AS fi_udeg,
  CAST(FLOOR(la * 1e6 + 0.5) AS BIGINT) AS la_udeg,
  CAST(FLOOR(h * 1e2 + 0.5) AS BIGINT) AS h_cm
FROM fin
"""


REGISTRY.update({"helmert_chain": (q_helmert_chain, _sql_helmert_chain())})


def q_minhash_dedup_full(sf_dir: str):
    """End-to-end near-dup dedup verdict over documents (rows-only;
    planted-dup recall is pytest-verified)."""
    from engine.dedupe import minhash_dedup_verdict

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    return minhash_dedup_verdict(ds)


def _sql_minhash_dedup_full(threshold_num: int = 1, threshold_den: int = 2) -> str:
    """Term-for-term mirror of the ENTIRE minhash dedup pipeline
    (dedupe.minhash_lsh_pairs -> verify_pairs_jaccard_distributed ->
    connected components -> verdict), value-exact:

    - token FNV-1a via the shared HUGEINT kernel (_SQL_TOKEN_HASHES);
    - word-3-shingles by the same Horner mix (docs with 1-2 tokens
      fall back to raw token hashes, matching _flat_shingles);
    - 64 minhash permutations with the engine's seeded (a, b) pairs
      inlined; 16 bands of 4 rows via an ordered list_reduce Horner
      (h*P + s stays under 2^104, no HUGEINT overflow);
    - candidate pairs = shared (band, band_hash); exact-Jaccard
      verify in INTEGER form (i/(na+nb-i) >= num/den <=>
      den*i >= num*(na+nb-i), exact — no float compare);
    - connected components as a recursive min-reachable-label CTE;
    - verdict keep = (group_id == own id), singletons via LEFT JOIN.
    """
    from engine.dedupe import _perm_seeds

    M = "18446744073709551616::HUGEINT"
    P = "1099511628211"
    a, b = _perm_seeds(64)
    perms = ", ".join(
        f"({i}, {int(a[i])}::HUGEINT, {int(b[i])}::HUGEINT)" for i in range(64)
    )
    return f"""
WITH RECURSIVE {_SQL_TOKEN_HASHES.lstrip()},
cnt AS (SELECT doc_id, COUNT(*) AS n FROM th GROUP BY doc_id),
sh3 AS (
  SELECT a.doc_id, (((a.h * {P} + b.h) % {M}) * {P} + c.h) % {M} AS s
  FROM th a JOIN th b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
            JOIN th c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
sh1 AS (SELECT th.doc_id, th.h AS s FROM th JOIN cnt USING (doc_id) WHERE cnt.n < 3),
us AS (SELECT DISTINCT doc_id, s FROM (SELECT * FROM sh3 UNION ALL SELECT * FROM sh1)),
usize AS (SELECT doc_id, COUNT(*) AS n FROM us GROUP BY doc_id),
perms(i, a, b) AS (VALUES {perms}),
sig AS (
  SELECT us.doc_id, perms.i, MIN((us.s * perms.a + perms.b) % {M}) AS sg
  FROM us, perms GROUP BY us.doc_id, perms.i),
bands AS (
  SELECT doc_id, i // 4 AS band,
    CAST(list_reduce(list(sg ORDER BY i), (h, s) -> (h * {P} + s) % {M}) // 2 AS BIGINT) AS band_hash
  FROM sig GROUP BY doc_id, i // 4),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS i
  FROM cand c JOIN us ua ON ua.doc_id = c.id_a JOIN us ub ON ub.doc_id = c.id_b AND ub.s = ua.s
  GROUP BY c.id_a, c.id_b),
ver AS (
  SELECT c.id_a, c.id_b
  FROM cand c JOIN usize na ON na.doc_id = c.id_a JOIN usize nb ON nb.doc_id = c.id_b
       LEFT JOIN inter USING (id_a, id_b)
  WHERE {threshold_den} * COALESCE(inter.i, 0)
        >= {threshold_num} * (na.n + nb.n - COALESCE(inter.i, 0))),
edges AS (SELECT id_a AS a, id_b AS b FROM ver UNION ALL SELECT id_b, id_a FROM ver),
reach(id, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
labels AS (SELECT id AS doc_id, MIN(r) AS group_id FROM reach GROUP BY id)
SELECT d.doc_id,
       COALESCE(l.group_id, d.doc_id) AS group_id,
       COALESCE(l.group_id, d.doc_id) = d.doc_id AS keep
FROM documents d LEFT JOIN labels l USING (doc_id)
"""


# Exact value oracle (round-3): verified pair-for-pair against the
# candidate stage and verdict-for-verdict against the full pipeline.
REGISTRY.update({"minhash_dedup_full": (q_minhash_dedup_full, _sql_minhash_dedup_full())})


def minhash_index_cached(sf_dir: str, docs: Dataset):
    """Parquet-persisted minhash signature index for ``sf_dir``'s
    documents table — the state an ingest keeps between crawls
    (640 B/doc sig+band blobs; VERDICT r4 item 5: the gate was
    re-hashing the full corpus every run). Cache key = corpus path +
    documents.parquet mtime; the first call builds + writes (mkdtemp
    + atomic rename, the sorted_export concurrency rule), steady-state
    calls read blobs and never touch corpus text. bench.py bootstraps
    this untimed: an INCREMENTAL operator's index is pre-existing
    state by definition, so the measured number is the steady-state
    ingest."""
    import hashlib
    import os
    import shutil
    import tempfile

    import ray

    from engine.dedupe import minhash_index

    src = os.path.join(sf_dir, "documents.parquet")
    try:
        mtime = int(os.path.getmtime(src))
    except OSError:
        mtime = 0
    key = hashlib.sha1(
        f"{os.path.abspath(sf_dir)}:{mtime}:v1".encode()
    ).hexdigest()[:16]
    cache = os.path.join("/tmp/geokit_minhash_index", key)
    if os.path.exists(os.path.join(cache, "_SUCCESS")):
        # the 3 MB blob table reads as ONE block otherwise — which
        # serializes every downstream map (measured 2.4 s -> 5.5 s)
        return ray.data.read_parquet(cache, override_num_blocks=16)
    index = minhash_index(docs).materialize()
    tmp = tempfile.mkdtemp(prefix="geokit_mhidx_")
    index.write_parquet(tmp)
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    try:
        os.rename(tmp, cache)
    except OSError:  # concurrent run won the rename — use ours in RAM
        shutil.rmtree(tmp, ignore_errors=True)
    return index


def q_incremental_minhash(sf_dir: str) -> Dataset:
    """Incremental MinHash near-dup (X50, the steady-state crawl
    ingest shape): a persisted signature index built from the existing
    corpus, then a NEW batch near-dup'd against it without re-reading
    old text. The new batch is synthesized from documents by
    arithmetic on BOTH sides (the X24 precedent), one class per
    doc_id % 4 residue: +10000 exact re-carries (64/64 signature
    matches), +20000 a two-token tail append (high but sub-1.0
    estimated Jaccard), +30000 upper-cased text (all shingles change
    — fresh), +40000 a 40-char prefix truncation (partial overlap —
    whichever side of the threshold each doc lands, both engines
    compute the identical integer rule)."""
    from engine.dedupe import incremental_minhash_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    index = minhash_index_cached(sf_dir, docs)

    def make_new(b: pa.Table) -> pa.Table:
        ids = b["doc_id"]
        txt = b["text"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        iv = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        parts = []
        m0 = pa.array(iv % 4 == 0)
        parts.append(
            pa.table({"doc_id": pc.add(ids.filter(m0), 10000), "text": txt.filter(m0)})
        )
        m1 = pa.array(iv % 4 == 1)
        near = pc.binary_join_element_wise(txt.filter(m1), " zz qq", "")
        parts.append(pa.table({"doc_id": pc.add(ids.filter(m1), 20000), "text": near}))
        m2 = pa.array(iv % 4 == 2)
        parts.append(
            pa.table(
                {"doc_id": pc.add(ids.filter(m2), 30000), "text": pc.utf8_upper(txt.filter(m2))}
            )
        )
        m3 = pa.array(iv % 4 == 3)
        trunc = pc.utf8_slice_codeunits(txt.filter(m3), 0, 40)
        parts.append(pa.table({"doc_id": pc.add(ids.filter(m3), 40000), "text": trunc}))
        return pa.concat_tables(parts)

    new = docs.map_batches(make_new, batch_format="pyarrow")
    return incremental_minhash_dedup(new, index)


def _sql_incremental_minhash(threshold_num: int = 1, threshold_den: int = 2) -> str:
    """Term-for-term mirror of minhash_index +
    incremental_minhash_dedup: signatures over the index ∪ new-batch
    union (the shared token-FNV / shingle / 64-permutation CTEs,
    parameterized to the derived corpus), candidates = shared
    (band, band_hash) across sides, verify = count of equal signature
    positions in exact integer form (den*matches >= num*64), verdict
    per new doc = MIN matching index keeper else keep."""
    from engine.dedupe import _perm_seeds

    M = "18446744073709551616::HUGEINT"
    P = "1099511628211"
    a, b = _perm_seeds(64)
    perms = ", ".join(
        f"({i}, {int(a[i])}::HUGEINT, {int(b[i])}::HUGEINT)" for i in range(64)
    )
    return f"""
WITH newb AS (
  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 4 = 0
  UNION ALL SELECT doc_id + 20000, text || ' zz qq' FROM documents WHERE doc_id % 4 = 1
  UNION ALL SELECT doc_id + 30000, upper(text) FROM documents WHERE doc_id % 4 = 2
  UNION ALL SELECT doc_id + 40000, substr(text, 1, 40) FROM documents WHERE doc_id % 4 = 3),
alldocs AS (
  SELECT doc_id, text, TRUE AS is_idx FROM documents
  UNION ALL SELECT doc_id, text, FALSE FROM newb),
{_sql_token_hashes("alldocs").lstrip()},
cnt AS (SELECT doc_id, COUNT(*) AS n FROM th GROUP BY doc_id),
sh3 AS (
  SELECT a.doc_id, (((a.h * {P} + b.h) % {M}) * {P} + c.h) % {M} AS s
  FROM th a JOIN th b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
            JOIN th c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
sh1 AS (SELECT th.doc_id, th.h AS s FROM th JOIN cnt USING (doc_id) WHERE cnt.n < 3),
us AS (SELECT DISTINCT doc_id, s FROM (SELECT * FROM sh3 UNION ALL SELECT * FROM sh1)),
perms(i, a, b) AS (VALUES {perms}),
sig AS (
  SELECT us.doc_id, perms.i, MIN((us.s * perms.a + perms.b) % {M}) AS sg
  FROM us, perms GROUP BY us.doc_id, perms.i),
bands AS (
  SELECT doc_id, i // 4 AS band,
    CAST(list_reduce(list(sg ORDER BY i), (h, s) -> (h * {P} + s) % {M}) // 2 AS BIGINT) AS band_hash
  FROM sig GROUP BY doc_id, i // 4),
cand AS (
  SELECT i.doc_id AS idx_id, n.doc_id AS new_id
  FROM bands i
  JOIN alldocs ai ON ai.doc_id = i.doc_id AND ai.is_idx
  JOIN bands n ON i.band = n.band AND i.band_hash = n.band_hash
  JOIN alldocs an ON an.doc_id = n.doc_id AND NOT an.is_idx
  GROUP BY 1, 2),
m AS (
  SELECT c.new_id, c.idx_id, COUNT(*) AS mm
  FROM cand c
  JOIN sig sn ON sn.doc_id = c.new_id
  JOIN sig si ON si.doc_id = c.idx_id AND si.i = sn.i AND si.sg = sn.sg
  GROUP BY 1, 2),
ver AS (
  SELECT new_id, CAST(MIN(idx_id) AS BIGINT) AS dup_of
  FROM m WHERE {threshold_den} * mm >= {threshold_num} * 64
  GROUP BY new_id)
SELECT n.doc_id,
       (v.new_id IS NULL) AS keep,
       CAST(COALESCE(v.dup_of, n.doc_id) AS BIGINT) AS dup_of
FROM newb n LEFT JOIN ver v ON v.new_id = n.doc_id
"""


REGISTRY.update(
    {"incremental_minhash": (q_incremental_minhash, _sql_incremental_minhash())}
)


def q_jaccard_join(sf_dir: str):
    """Standalone exact n-gram Jaccard similarity self-join (the
    brief's 'n-gram Jaccard' dedup method as a first-class operator).
    Runs the PREFIX-FILTERED scale path (global rarest-first order,
    prefix index, endpoint-filtered verify — no df cap, no df^2 hot
    bucket); the inverted-index variant stays value-checked in pytest
    against the same brute-force oracle."""
    from engine.dedupe import jaccard_similarity_join

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    return jaccard_similarity_join(ds, method="prefix")


def _sql_jaccard_join(threshold_num: int = 1, threshold_den: int = 2) -> str:
    """Mirror: same token FNV-1a -> word-3-shingle Horner mix ->
    DISTINCT shingle sets (the minhash oracle's proven CTEs), then a
    plain shingle equi-self-join for |A∩B| and the identical integer
    cross-multiplied threshold."""
    M = "18446744073709551616::HUGEINT"
    P = "1099511628211"
    return f"""
WITH {_SQL_TOKEN_HASHES.lstrip()},
cnt AS (SELECT doc_id, COUNT(*) AS n FROM th GROUP BY doc_id),
sh3 AS (
  SELECT a.doc_id, (((a.h * {P} + b.h) % {M}) * {P} + c.h) % {M} AS s
  FROM th a JOIN th b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
            JOIN th c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
sh1 AS (SELECT th.doc_id, th.h AS s FROM th JOIN cnt USING (doc_id) WHERE cnt.n < 3),
us AS (SELECT DISTINCT doc_id, s FROM (SELECT * FROM sh3 UNION ALL SELECT * FROM sh1)),
usize AS (SELECT doc_id, COUNT(*) AS n FROM us GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM us a JOIN us b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT i.id_a, i.id_b, CAST(i.i AS BIGINT) AS inter,
  CAST(na.n AS BIGINT) AS na, CAST(nb.n AS BIGINT) AS nb
FROM inter i JOIN usize na ON na.doc_id = i.id_a
             JOIN usize nb ON nb.doc_id = i.id_b
WHERE {threshold_den} * i.i >= {threshold_num} * (na.n + nb.n - i.i)
"""


REGISTRY.update({"jaccard_join": (q_jaccard_join, _sql_jaccard_join())})
REGISTRY.update({"hash_sample": (q_hash_sample, SQL_HASH_SAMPLE)})


# SQL-value-oracled spatial operators (cells/geoid/DMS/kNN/PIP) —
# see engine/sql_oracles.py for the mirroring + margin methodology.
from engine.sql_oracles import SQL_ORACLES2 as _SQL_ORACLES2  # noqa: E402

REGISTRY.update(_SQL_ORACLES2)

# End-to-end flagship-chain value oracle (round 3): the REAL extract ->
# prepare -> spatial stages over an orders-derived coordinate-text
# corpus, mirrored completely in DuckDB (engine/geo_pipeline_oracle.py).
from engine.geo_pipeline_oracle import (  # noqa: E402
    _sql_geo_enriched,
    _sql_geo_muni_rollup,
    _sql_geo_pipeline,
    q_geo_enriched,
    q_geo_muni_rollup_sql,
    q_geo_pipeline_sql,
)

REGISTRY.update({"geo_pipeline_sql": (q_geo_pipeline_sql, _sql_geo_pipeline())})
REGISTRY.update(
    {"geo_muni_rollup_sql": (q_geo_muni_rollup_sql, _sql_geo_muni_rollup())}
)
# Round 4 (VERDICT-r3 #4): the enrichment TABLE itself at SQL-value
# strength — quantized mirror columns over the pages corpus, the
# DuckDB side reading the same cached parquet and running the
# corpus-agnostic chain mirror.
REGISTRY.update({"geo_enriched": (q_geo_enriched, _sql_geo_enriched())})

# Round 4 (VERDICT-r3 #6): the tri-modal media pipeline at SQL-value
# strength — native-size decode checksums vs a DuckDB byte-arithmetic
# re-implementation of all five container formats
# (engine/media_oracle.py).
from engine.media_oracle import (  # noqa: E402
    _sql_media_pipeline,
    q_media_pipeline,
)

REGISTRY.update({"media_pipeline": (q_media_pipeline, _sql_media_pipeline())})


# -------------------------------------- non-equi joins (as-of / range)
# The brief's custom-operator family beyond the upstream reference:
# as-of join (engine/asof.py) and interval/range join
# (engine/interval.py) complete the trio with the windowed aggregates
# (engine/windows.py). Both are value-oracled: DuckDB has a native
# ASOF JOIN, and the range join is a plain inequality-predicate join.


def q_asof_events(sf_dir: str) -> Dataset:
    """As-of join: each non-purchase event matched to the same user's
    most recent purchase at that moment (one hash co-partition shuffle
    + per-partition C-speed merge_asof; engine/asof.py). Timestamps
    are surfaced as epoch-microsecond BIGINTs and unmatched rows carry
    sentinels, so the driver's value hash covers the null path with no
    float-NaN / timestamp-unit ambiguity."""
    import pandas as pd

    from engine.asof import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    def split_left(b: pa.Table) -> pa.Table:
        return b.filter(pc.not_equal(b["event_type"], "purchase"))

    def split_right(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["event_type"], "purchase"))
        return pa.table(
            {
                "user_id": b["user_id"],
                "ts": b["ts"],
                "purchase_event_id": b["event_id"],
                "purchase_value": b["value"],
            }
        )

    left = ev.map_batches(split_left, batch_format="pyarrow")
    right = ev.map_batches(split_right, batch_format="pyarrow")
    joined = asof_join(
        left,
        right,
        key="user_id",
        on="ts",
        # purchases scale WITH the corpus (big-big at 100 TB): force
        # the co-partition shuffle path so the gate exercises the
        # scale-true plan; the broadcast path is pytest-equivalent.
        broadcast_threshold=0,
        tie_breaks=("purchase_event_id",),
        fill={
            "ts_r": pd.Timestamp("1970-01-01"),
            "purchase_event_id": -1,
            "purchase_value": -1.0,
        },
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "event_type": b["event_type"],
                "value": b["value"],
                "ts_us": b["ts"].cast(pa.int64()),
                "purchase_ts_us": b["ts_r"].cast(pa.int64()),
                "purchase_event_id": b["purchase_event_id"],
                "purchase_value": b["purchase_value"],
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_ASOF_EVENTS = """
WITH r0 AS (
  SELECT user_id, ts, event_id AS purchase_event_id, value AS purchase_value,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'),
-- identical (user, ts) purchases resolve to the max event_id: mirrors
-- the kernel's tie_breaks=("purchase_event_id",) last-wins contract
r AS (SELECT user_id, ts, purchase_event_id, purchase_value
      FROM r0 WHERE rn = 1),
l AS (SELECT event_id, user_id, ts, event_type, value FROM events
      WHERE event_type <> 'purchase')
SELECT l.event_id, l.user_id, l.event_type, l.value,
       CAST(epoch_us(l.ts) AS BIGINT) AS ts_us,
       COALESCE(CAST(epoch_us(r.ts) AS BIGINT), 0) AS purchase_ts_us,
       COALESCE(r.purchase_event_id, -1) AS purchase_event_id,
       COALESCE(r.purchase_value, -1.0) AS purchase_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_interval_bands(sf_dir: str) -> Dataset:
    """Interval (range) join: events joined to overlapping value bands
    derived from the nation table by integer arithmetic (binned
    replication + one co-partition shuffle; engine/interval.py).
    Bands overlap by 7 units so multi-match rows exist, and values
    above the last band exercise the unmatched (dropped) path."""
    ev = _read(sf_dir, "events", ["event_id", "value"])
    nat = _read(sf_dir, "nation", ["n_nationkey"])

    def bands(b: pa.Table) -> pa.Table:
        k = b["n_nationkey"].cast(pa.int64())
        lo = pc.multiply(k.cast(pa.float64()), 18.0)
        return pa.table(
            {"lo": lo, "hi": pc.add(lo, 25.0), "band_id": k}
        )

    bands_ds = nat.map_batches(bands, batch_format="pyarrow")
    return interval_join_entry(ev, bands_ds)


def interval_join_entry(points: Dataset, bands_ds: Dataset) -> Dataset:
    from engine.interval import interval_join

    return interval_join(
        points, bands_ds, value="value", bin_width=16.0, num_partitions=16
    )


SQL_INTERVAL_BANDS = """
WITH b AS (
  SELECT CAST(n_nationkey AS BIGINT) AS band_id,
         CAST(n_nationkey AS DOUBLE) * 18.0 AS lo,
         CAST(n_nationkey AS DOUBLE) * 18.0 + 25.0 AS hi
  FROM nation)
SELECT e.event_id, e.value, b.lo, b.hi, b.band_id
FROM events e JOIN b ON e.value >= b.lo AND e.value < b.hi
"""


REGISTRY.update(
    {
        "asof_events": (q_asof_events, SQL_ASOF_EVENTS),
        "interval_bands": (q_interval_bands, SQL_INTERVAL_BANDS),
    }
)


# ------------------------------------------------ analytics (SURVEY §2.8)
# Grouping-sets rollup, hopping windows, exact grouped quantiles and the
# semi/anti flag join live in engine.analytics (imported late: analytics
# defers its _read import to call time, so no cycle).

from engine.analytics import (  # noqa: E402
    SQL_GROUPED_QUANTILES,
    SQL_HOPPING_WINDOW,
    SQL_MOMENT_STATS,
    SQL_PIVOT_ORDERS,
    SQL_ROLLUP_LINEITEM,
    SQL_SEMI_ANTI,
    q_grouped_quantiles,
    q_hopping_window,
    q_moment_stats,
    q_pivot_orders,
    q_rollup_lineitem,
    q_semi_anti,
)

REGISTRY.update(
    {
        "rollup_lineitem": (q_rollup_lineitem, SQL_ROLLUP_LINEITEM),
        "hopping_window": (q_hopping_window, SQL_HOPPING_WINDOW),
        "grouped_quantiles": (q_grouped_quantiles, SQL_GROUPED_QUANTILES),
        "semi_anti_orders": (q_semi_anti, SQL_SEMI_ANTI),
        "pivot_orders": (q_pivot_orders, SQL_PIVOT_ORDERS),
        "moment_stats_events": (q_moment_stats, SQL_MOMENT_STATS),
    }
)

# Stratified domain-mixing sampler + sequence packing (engine.analytics,
# SURVEY §2.9 X19/X21) + per-source frequency cap (domain rebalancing).
from engine.analytics import (  # noqa: E402
    SQL_BUDGET_SELECT,
    SQL_DOMAIN_CAP,
    SQL_PACK_SHARDS,
    SQL_STRATIFIED_SAMPLE,
    SQL_WINSORIZED_EVENTS,
    q_budget_select,
    q_domain_cap,
    q_pack_shards,
    q_stratified_sample,
    q_winsorized_events,
)

REGISTRY.update(
    {
        "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
        "pack_shards_docs": (q_pack_shards, SQL_PACK_SHARDS),
        "domain_cap_docs": (q_domain_cap, SQL_DOMAIN_CAP),
        "winsorized_events": (q_winsorized_events, SQL_WINSORIZED_EVENTS),
        "budget_select_docs": (q_budget_select, SQL_BUDGET_SELECT),
    }
)


# HLL approximate distinct (engine.sketch): approximate by design, so
# driver-excluded like ann_ivf; accuracy/mergeability pytest-bounded.
from engine.sketch import q_approx_distinct_users  # noqa: E402

REGISTRY.update({"approx_distinct_users": (q_approx_distinct_users, None)})


# t-digest quantile sketch (engine.tdigest): the mergeable companion to
# grouped_quantiles for groups that exceed one worker; approximate by
# design -> driver-excluded, rank-error pytest-bounded.
from engine.tdigest import q_quantile_sketch_orders  # noqa: E402

REGISTRY.update({"quantile_sketch_orders": (q_quantile_sketch_orders, None)})

# Count-Min frequency sketch (approximate heavy hitters; overcount-only
# estimates pytest-bounded against the exact vocab_topk counts).
from engine.cms import q_cms_heavy_hitters  # noqa: E402

REGISTRY.update({"cms_heavy_hitters": (q_cms_heavy_hitters, None)})


def q_tfidf_top_terms(sf_dir: str, k: int = 3):
    """TF-IDF top-k terms per document — the classic relevance /
    keyword-extraction text op. Two passes over (doc, token, tf)
    combiner partials (docs never span blocks, so per-block tf is
    exact): pass 1 reduces df per token (each (doc, token) row counts
    once) plus N; the vocab-scale df table broadcasts (ray.put +
    searchsorted — swap in joins.hash_join for corpora whose vocab
    exceeds driver memory); pass 2 scores tf·ln(N/df) and takes the
    per-doc top-k on the (score DESC, token ASC) total order,
    vectorized per block.

    Driver-excluded: the transcendental idf has no bitwise SQL
    mirror; exactness is pytest-verified against a scalar brute-force
    oracle. Columns: doc_id, rank, term, score."""
    import ray

    from engine.textops import doc_token_tf_partials

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    n_docs = ds.count()
    tf = ds.map_batches(doc_token_tf_partials, batch_format="pyarrow").materialize()

    def df_partial(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(
            b["token"].combine_chunks() if isinstance(b["token"], pa.ChunkedArray) else b["token"]
        )
        return pa.table(
            {"token": vc.field("values"), "_cnt": pc.cast(vc.field("counts"), pa.int64())}
        )

    from engine.shuffle import keyed_partition_map

    df_ds = keyed_partition_map(
        tf.map_batches(df_partial, batch_format="pyarrow"),
        ["token"],
        lambda d: d.groupby("token", sort=False)["_cnt"].sum().reset_index(name="df"),
        num_partitions=16,
        out_schema=pa.schema([("token", pa.string()), ("df", pa.int64())]),
    )
    parts = [b for b in df_ds.iter_batches(batch_format="pyarrow")]
    dft = pa.concat_tables(parts).combine_chunks() if parts else pa.table(
        {"token": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
    )
    order = pc.sort_indices(dft, sort_keys=[("token", "ascending")])
    dft = dft.take(order)
    vocab = np.asarray(dft["token"].to_pylist(), dtype=object)
    dfv = dft["df"].to_numpy(zero_copy_only=False).astype(np.float64)
    ref = ray.put((vocab, dfv))

    def score(b: pa.Table) -> pa.Table:
        voc, dfs = ray.get(ref)
        toks = np.asarray(b["token"].to_pylist(), dtype=object)
        pos = np.searchsorted(voc, toks)
        tfs = b["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = tfs * np.log(float(n_docs) / dfs[pos])
        out = pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(zero_copy_only=False),
                "term": toks,
                "score": s,
            }
        )
        out = out.sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True], kind="mergesort"
        )
        top = out.groupby("doc_id", sort=False).head(k)
        top["rank"] = top.groupby("doc_id", sort=False).cumcount() + 1
        return pa.table(
            {
                "doc_id": pa.array(top["doc_id"].to_numpy(), pa.int64()),
                "rank": pa.array(top["rank"].to_numpy().astype(np.int64)),
                "term": pa.array(top["term"], pa.string()),
                "score": pa.array(top["score"].to_numpy()),
            }
        )

    return tf.map_batches(score, batch_format="pyarrow")


REGISTRY.update({"tfidf_top_terms": (q_tfidf_top_terms, None)})


def q_curation_pipeline(sf_dir: str):
    """The composed LLM-data curation chain (engine/curation.py) over
    the documents table: quality -> language -> exact dedup ->
    near-dup dedup -> split. Driver-excluded: a composition of parts
    that are each value-checked (quality_scores, langid,
    dedup_documents, minhash_dedup_full, hash_sample) — the
    composition itself is pytest-verified stage-by-stage on planted
    defect classes (tests/test_curation.py)."""
    from engine.curation import curate

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    out, report = curate(
        ds,
        langs=("en", "de", "es", "fr", "it", "sl", "und"),
        min_tokens=3,
        min_alpha_milli=200,
    )
    return out


REGISTRY.update({"curation_pipeline": (q_curation_pipeline, None)})


def q_bigram_topk(sf_dir: str) -> Dataset:
    """Top-20 word bigrams by exact count — vocab_topk's machinery
    with the n-gram combiner kernel (frequent-phrase mining /
    collocation extraction). Driver-excluded as the same combiner +
    coarse-merge + pruned-top-k machinery as vocab_topk; the SQL
    oracle is value-checked in the excluded-queries exactness test."""
    from engine.shuffle import keyed_partition_map, topk
    from engine.textops import ngram_count_partials

    ds = _read(sf_dir, "documents", ["text"], rows_per_block=256)
    partials = ds.map_batches(
        ngram_count_partials, batch_format="pyarrow", fn_kwargs=dict(n=2)
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("ngram", sort=False)["_cnt"].sum().reset_index()
        return pd.DataFrame({"ngram": g["ngram"], "cnt": g["_cnt"].astype(np.int64)})

    merged = keyed_partition_map(
        partials,
        ["ngram"],
        merge,
        num_partitions=32,
        out_schema=pa.schema([("ngram", pa.string()), ("cnt", pa.int64())]),
    )
    return topk(merged, ["cnt", "ngram"], 20, descending=[True, False])


SQL_BIGRAM_TOPK = """
WITH tok AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents)
SELECT ngram, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
  SELECT ts[i] || ' ' || ts[i + 1] AS ngram
  FROM tok, LATERAL unnest(range(1, len(ts))) AS t(i))
GROUP BY ngram
ORDER BY cnt DESC, ngram ASC
LIMIT 20
"""

REGISTRY.update({"bigram_topk": (q_bigram_topk, SQL_BIGRAM_TOPK)})


def q_chunk_docs(sf_dir: str) -> Dataset:
    """Sliding-window context chunking over documents (training-sample
    prep): 32-token windows advancing by 24 (8-token overlap), chunk
    text rebuilt from the doc's \\S+ tokens. Zero-shuffle single map
    pass — the canonical "cut long docs into model-context samples"
    stage of an LLM data pipeline."""
    from engine.textops import chunk_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    return ds.map_batches(
        chunk_batch, batch_format="pyarrow", fn_kwargs=dict(size=32, stride=24)
    )


# Chunk rule mirror (exact integers): k chunks with
# k = 1 if n <= 32 else (n - 32 + 23) // 24 + 1; chunk k covers
# 1-based token positions [k*24 + 1, min(k*24 + 32, n)] — DuckDB list
# slicing ts[a:b] is 1-based with inclusive end, matching tok_start =
# k*24 (0-based) .. tok_end = min(k*24 + 32, n) exclusive.
SQL_CHUNK_DOCS = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ts,
         len(regexp_extract_all(text, '\S+')) AS n
  FROM documents),
k AS (
  SELECT doc_id, ts, n,
         CASE WHEN n = 0 THEN 0
              WHEN n <= 32 THEN 1
              ELSE (n - 32 + 23) // 24 + 1 END AS n_chunks
  FROM t),
c AS (
  SELECT doc_id, ts, n, r.k AS chunk_no
  FROM k, LATERAL unnest(range(0, n_chunks)) AS r(k))
SELECT doc_id,
       chunk_no,
       chunk_no * 24 AS tok_start,
       least(chunk_no * 24 + 32, n) - chunk_no * 24 AS n_toks,
       array_to_string(ts[chunk_no * 24 + 1 : least(chunk_no * 24 + 32, n)], ' ')
         AS chunk_text,
       length(array_to_string(ts[chunk_no * 24 + 1 : least(chunk_no * 24 + 32, n)], ' '))
         AS chunk_chars
FROM c
"""

REGISTRY.update({"chunk_docs": (q_chunk_docs, SQL_CHUNK_DOCS)})


def q_substr_dedup(sf_dir: str) -> Dataset:
    """Exact repeated-substring removal (ExactSubstr, Lee et al. 2022):
    every duplicated 15-token span is removed from all but its global
    first occurrence. Returns one row per doc with exact token/char
    accounting and the rebuilt kept text."""
    from engine.dedupe import exact_substring_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    return exact_substring_dedup(ds, L=15, num_partitions=8)


# Mirror groups by the literal window text (the engine by two rolling
# 64-bit digests — digest-exact, the content_digests precedent).
# Canonical occurrence = ROW_NUMBER() OVER (PARTITION BY win ORDER BY
# doc_id, s) == 1; a position is removed iff covered by any
# non-canonical duplicated window. MATERIALIZED barriers keep DuckDB
# from inlining the window CTEs (see sql_oracles planning note).
SQL_SUBSTR_DEDUP = r"""
WITH t AS MATERIALIZED (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ts,
         len(regexp_extract_all(text, '\S+')) AS n
  FROM documents),
w AS MATERIALIZED (
  SELECT doc_id, r.s AS s, array_to_string(ts[r.s + 1 : r.s + 15], ' ') AS win
  FROM t, LATERAL unnest(range(0, n - 15 + 1)) AS r(s)
  WHERE n >= 15),
d AS MATERIALIZED (
  SELECT doc_id, s,
         ROW_NUMBER() OVER (PARTITION BY win ORDER BY doc_id, s) AS rn,
         COUNT(*) OVER (PARTITION BY win) AS c
  FROM w),
rem AS MATERIALIZED (
  SELECT DISTINCT doc_id, r.p AS p
  FROM d, LATERAL unnest(range(s, s + 15)) AS r(p)
  WHERE c > 1 AND rn > 1),
pos AS MATERIALIZED (
  SELECT t.doc_id, r.p AS p, ts[r.p + 1] AS tok
  FROM t, LATERAL unnest(range(0, n)) AS r(p)),
k AS MATERIALIZED (
  SELECT pos.doc_id, pos.p, pos.tok
  FROM pos LEFT JOIN rem ON pos.doc_id = rem.doc_id AND pos.p = rem.p
  WHERE rem.p IS NULL)
SELECT t.doc_id,
       t.n AS n_toks,
       CAST(t.n - COALESCE(kc.kept, 0) AS BIGINT) AS n_removed,
       COALESCE(kt.txt, '') AS kept_text,
       CAST(length(COALESCE(kt.txt, '')) AS BIGINT) AS kept_chars
FROM t
LEFT JOIN (SELECT doc_id, count(*) AS kept FROM k GROUP BY doc_id) kc
       ON t.doc_id = kc.doc_id
LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS txt
           FROM k GROUP BY doc_id) kt
       ON t.doc_id = kt.doc_id
"""

REGISTRY.update({"substr_dedup_docs": (q_substr_dedup, SQL_SUBSTR_DEDUP)})


def q_canonical_urls(sf_dir: str) -> Dataset:
    """URL canonicalization + canonical-URL dedup (X31): every messy
    surface form mapped to its canonical string (case/www/default-port/
    tracking-param/param-order/fragment/trailing-slash normalization),
    with per-canonical-group verdicts (n_forms, keeper_id, is_keeper).
    Reads the cached messy-URL corpus both engines share."""
    import ray.data as rd

    from engine.pages import sf_to_n_rows
    from engine.util import clean_read_schema
    from engine.weburl import canonical_url_dedup, urls_corpus_parquet

    n = max(200, sf_to_n_rows(sf_dir) // 10)
    path = urls_corpus_parquet(n)
    cols = ["page_id", "url"]
    ds = rd.read_parquet(path, columns=cols, schema=clean_read_schema(path, cols))
    return canonical_url_dedup(ds, num_partitions=8)


def _sql_canonical_urls(path: str) -> str:
    """DuckDB mirror of the canonical rule, built from the SAME RE2
    pattern constants the engine kernels run (engine/weburl.py —
    change them together; (?P<g>...) is spelled as a plain capture
    group).  Groups by the LITERAL canonical string, cross-checking the
    engine's 64-bit-digest reduction against text-exact grouping."""
    from engine.weburl import (
        RE_HOST,
        RE_PATH,
        RE_PORT,
        RE_QUERY,
        RE_SCHEME,
        RE_TRACKING,
    )

    g = lambda p: p.replace("(?P<g>", "(")
    return rf"""
WITH u AS (
  SELECT page_id, url, regexp_replace(url, '#.*$', '') AS u0
  FROM read_parquet('{path}')),
p AS (
  SELECT page_id, url,
    lower(regexp_extract(u0, '{g(RE_SCHEME)}', 1)) AS scheme,
    regexp_replace(lower(regexp_extract(u0, '{g(RE_HOST)}', 1)), '^www\.', '') AS host,
    regexp_extract(u0, '{g(RE_PORT)}', 1) AS port,
    regexp_replace(regexp_extract(u0, '{g(RE_PATH)}', 1), '/+$', '') AS path,
    regexp_extract(u0, '{g(RE_QUERY)}', 1) AS q0
  FROM u),
c AS (
  SELECT page_id, url,
    scheme || '://' || host ||
    CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
              OR (scheme = 'https' AND port = '443')
         THEN '' ELSE ':' || port END ||
    path ||
    CASE WHEN qc = '' THEN '' ELSE '?' || qc END AS canon_url
  FROM (
    SELECT *, COALESCE(array_to_string(list_sort(list_filter(string_split(q0, '&'),
      x -> x <> '' AND NOT regexp_matches(x, '{g(RE_TRACKING)}'))), '&'), '') AS qc
    FROM p))
SELECT page_id, url, canon_url,
  COUNT(*) OVER (PARTITION BY canon_url) AS n_forms,
  MIN(page_id) OVER (PARTITION BY canon_url) AS keeper_id,
  page_id = MIN(page_id) OVER (PARTITION BY canon_url) AS is_keeper
FROM c
"""


def _canonical_urls_sql_gate() -> str:
    from engine.weburl import urls_corpus_parquet
    import os

    # The driver gate runs at sf0.01 (50k pages -> n=5000); the Ray
    # query materializes the cache before the oracle runs (the
    # media_corpus_parquet precedent), so only the PATH is computed
    # here, never the corpus.
    n = 5000
    return _sql_canonical_urls(f"/tmp/geokit_weburl/n{n}/urls.parquet")


REGISTRY.update({"canonical_urls": (q_canonical_urls, _canonical_urls_sql_gate())})


# ------------------------------------ benchmark decontamination gate (X32)


def q_decontam_docs(sf_dir: str) -> Dataset:
    """Benchmark decontamination as a driver-gate query (X32 —
    promotes the X14 operator, textops.contamination_flags, to
    SQL-value strength). Flags every document sharing any word-k-gram
    with a stand-in eval set: the docs with ``doc_id % 101 == 0``
    (eval benchmarks are tiny by nature, so collecting the query side
    driver-side and broadcasting its k-gram hash set via ``ray.put``
    IS the scale design — the corpus side never moves, zero shuffles).

    k=3 here (the corpus' ~30-word vocabulary makes 8-grams
    all-but-unique: k=8 flags only the seeds themselves, while k=3
    yields a meaningful 180/500 split at sf0.01); the operator's
    API default stays k=8, the standard eval-decontamination width.
    Upstream parity: no analogue in GeoCoordinateConverter — this is
    a brief-mandated LLM-pipeline operator."""
    from engine.textops import contamination_flags

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)

    def seed_filter(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 101 == 0))

    seeds = ds.map_batches(seed_filter, batch_format="pyarrow").take_all()
    texts = [r["text"] for r in seeds]
    return contamination_flags(ds, texts, k=3)


# Mirror: the minhash/jaccard oracles' PROVEN token-FNV + word-3-
# shingle Horner CTEs (change together), then seed-set semi-join.
# Both engines recompute identical 64-bit hash values, so membership
# (including any collision) mirrors exactly; docs/seeds with <3
# tokens fall back to raw token hashes on both sides (sh1 == the
# _flat_shingles short-doc contract).
SQL_DECONTAM = f"""
WITH {_SQL_TOKEN_HASHES.lstrip()},
cnt AS (SELECT doc_id, COUNT(*) AS n FROM th GROUP BY doc_id),
sh3 AS (
  SELECT a.doc_id, (((a.h * 1099511628211 + b.h) % 18446744073709551616::HUGEINT) * 1099511628211 + c.h) % 18446744073709551616::HUGEINT AS s
  FROM th a JOIN th b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
            JOIN th c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
sh1 AS (SELECT th.doc_id, th.h AS s FROM th JOIN cnt USING (doc_id) WHERE cnt.n < 3),
us AS (SELECT DISTINCT doc_id, s FROM (SELECT * FROM sh3 UNION ALL SELECT * FROM sh1)),
qsh AS (SELECT DISTINCT s FROM us WHERE doc_id % 101 = 0),
hits AS (SELECT DISTINCT us.doc_id FROM us JOIN qsh USING (s))
SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


REGISTRY.update({"decontam_docs": (q_decontam_docs, SQL_DECONTAM)})


# ------------------------------------------ iterative graph analytics (X33)


def q_pagerank_docs(sf_dir: str) -> Dataset:
    """PageRank over a deterministic link graph on the documents table
    (X33 — iterative graph analytics; see engine/graph.py for the
    100 TB design). Node ids are the dense doc_ids; edges are the
    4-regular-out hash-derived multigraph; 5 integer-exact damped
    iterations. Runs the scale-honest PARTITIONED mode (ranks as a
    Dataset, one bucketed hash-join + one combiner dst-sum per
    iteration — only (id, int64) pairs ever shuffle); the
    dense-vector broadcast mode is pytest-checked bit-identical."""
    from engine.graph import derive_link_edges, pagerank

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    nodes = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        lambda b: b.rename_columns(["id"]), batch_format="pyarrow"
    )
    edges = derive_link_edges(nodes, n, id_col="id")
    pr = pagerank(nodes, edges, n, mode="partitioned")
    return pr.map_batches(
        lambda b: b.rename_columns(["doc_id", "pr"]), batch_format="pyarrow"
    )


def _sql_pagerank(
    iters: int = 5, out_degree: int = 4, scale: int = 10**12, damp_pct: int = 85
) -> str:
    """Mirror of engine.graph.pagerank + derive_link_edges: the SAME
    (A, B) edge constants (imported — change together), UNION ALL
    multigraph semantics, and the identical integer fixed-point
    unrolled as one CTE per iteration (floor `//` on both engines;
    all values positive). Integer arithmetic makes the mirror exact —
    float PageRank could never be order-free."""
    from engine.graph import EDGE_A, EDGE_B

    arms = "\n  UNION ALL ".join(
        f"SELECT doc_id AS src, (doc_id * {EDGE_A[j]} + {EDGE_B[j]})"
        f" % (SELECT n FROM nn) AS dst FROM documents"
        for j in range(out_degree)
    )
    teleport = ((100 - damp_pct) * scale) // 100
    iter_ctes = "".join(
        f""",
r{t} AS (
  SELECT n.id, CAST({teleport} + ({damp_pct} * COALESCE(s.c, 0)) // 100 AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS id, SUM(rp.r // {out_degree}) AS c
    FROM edges e JOIN r{t - 1} rp ON rp.id = e.src GROUP BY e.dst) s USING (id))"""
        for t in range(1, iters + 1)
    )
    return f"""
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
nodes AS (SELECT doc_id AS id FROM documents),
edges AS (
  {arms}),
r0 AS (SELECT id, {scale}::BIGINT AS r FROM nodes){iter_ctes}
SELECT id AS doc_id, r AS pr FROM r{iters}
"""


REGISTRY.update({"pagerank_docs": (q_pagerank_docs, _sql_pagerank())})


# --------------------------------------- multi-join pipeline, Q5 shape (X34)


def q_revenue_by_nation(sf_dir: str) -> Dataset:
    """TPC-H-Q5-shaped six-table join pipeline: revenue per nation for
    one region and a two-year order window, where the lineitem's
    supplier and the order's customer sit in the SAME nation. The
    join-planning showcase: dimension tables (region, nation,
    supplier) broadcast driver-side (KB-to-MB-scale — the classic
    small-side ray.put pattern; suppliers are the smallest fact table,
    1/10th of customers, so the broadcast bound is documented rather
    than structural), while the two order-of-magnitude tables flow
    through bucketed hash joins (orders⋈customer on custkey, then
    lineitem⋈that on orderkey) with filters and the
    revenue quantization PUSHED BELOW the joins — only
    (key, nationkey, int64-micros) rows ever shuffle.

    Revenue is exact-int: cents(l_extendedprice) × (1000 −
    milli(l_discount)) — discounts are cent-quantized in TPC-H, so
    the product is lossless and the sum order-free (the
    segment_revenue precedent). At true 100 TB the per-nation micros
    sum approaches 2^63: the production variant splits the sum into
    (hi, lo) int64 partials; at every test sf it fits with ~6 digits
    of headroom."""
    import pyarrow.parquet as _pq

    reg = _pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    nat = _pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    rkey = int(reg.loc[reg.r_name == "ASIA", "r_regionkey"].iloc[0])
    nat_in = nat[nat.n_regionkey == rkey]
    nkeys = nat_in.n_nationkey.to_numpy().astype(np.int64)
    norder = np.argsort(nkeys, kind="stable")
    nat_sorted_keys = nkeys[norder]
    nat_sorted_names = nat_in.n_name.to_numpy()[norder]
    sup = _pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    s_keys = sup["s_suppkey"].to_numpy().astype(np.int64)
    s_nat = sup["s_nationkey"].to_numpy().astype(np.int64)
    order_sk = np.argsort(s_keys, kind="stable")
    s_keys, s_nat = s_keys[order_sk], s_nat[order_sk]

    lo = np.datetime64("1995-01-01", "us")
    hi = np.datetime64("1997-01-01", "us")

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def cust_prep(b: pa.Table) -> pa.Table:
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(nk, nkeys)
        return pa.table(
            {
                "c_custkey": b["c_custkey"].to_numpy(zero_copy_only=False)[keep],
                "c_nationkey": nk[keep],
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def orders_prep(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"].to_numpy(zero_copy_only=False)
        keep = (d >= lo) & (d < hi)
        return pa.table(
            {
                "l_orderkey": b["o_orderkey"].to_numpy(zero_copy_only=False)[keep],
                "c_custkey": b["o_custkey"].to_numpy(zero_copy_only=False)[keep],
            }
        )

    oc = hash_join(
        orders.map_batches(orders_prep, batch_format="pyarrow"),
        cust.map_batches(cust_prep, batch_format="pyarrow"),
        key="c_custkey",
        num_buckets=16,
    ).select_columns(["l_orderkey", "c_nationkey"])

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def li_prep(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(b["l_extendedprice"], 100.0), round_mode="half_towards_infinity"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        milli = pc.cast(
            pc.round(pc.multiply(b["l_discount"], 1000.0), round_mode="half_towards_infinity"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "rev_micros": cents * (1000 - milli),
            }
        )

    joined = hash_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        oc,
        key="l_orderkey",
        num_buckets=16,
    )

    def same_nation(b: pa.Table) -> pa.Table:
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cn = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(s_keys, sk), 0, len(s_keys) - 1)
        keep = (s_keys[pos] == sk) & (s_nat[pos] == cn)
        # vectorized name lookup (surviving cn are region nations by
        # the cust_prep filter, so searchsorted is total)
        names = pa.array(
            nat_sorted_names[np.searchsorted(nat_sorted_keys, cn[keep])],
            pa.string(),
        )
        return pa.table(
            {
                "n_name": names,
                "rev_micros": b["rev_micros"].to_numpy(zero_copy_only=False)[keep],
            }
        )

    # num_partitions=1: the merge input is combiner partials over a
    # <=25-nation key space — the degenerate coalesced merge avoids
    # empty-partition zero-column blocks entirely.
    agg = grouped_count_sums(
        joined.map_batches(same_nation, batch_format="pyarrow"),
        key="n_name",
        sum_cols=("rev_micros",),
        num_partitions=1,
    )
    return agg.map_batches(
        lambda b: b.rename_columns(["n_name", "n_items", "revenue_micros"]),
        batch_format="pyarrow",
    )


SQL_REVENUE_BY_NATION = """
SELECT n_name,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (1000 - CAST(ROUND(l_discount * 1000) AS BIGINT))) AS BIGINT)
         AS revenue_micros
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


REGISTRY.update({"revenue_by_nation": (q_revenue_by_nation, SQL_REVENUE_BY_NATION)})


# ----------------------------------- exact grouped count-distinct (X35)


def q_distinct_users_per_type(sf_dir: str) -> Dataset:
    """Exact grouped COUNT(DISTINCT): distinct users per event type —
    the exact counterpart of the HLL sketch (approx_distinct_users),
    in the canonical two-level distributed shape:

      1. map side: per-block DISTINCT (type, user) pairs (the
         combiner — duplicate pairs die in their block, so the
         shuffle moves unique-pair-scale rows, never event-scale);
      2. ONE co-partition by hash(type, user): every surviving copy
         of a pair lands in exactly one partition, so a per-partition
         drop_duplicates -> per-type COUNT yields ADDITIVE partials;
      3. a single-partition sum over the tiny (type, partial) set.

    At 100 TB the shuffle is bounded by the distinct-pair count, not
    the event count, and a hot type is irrelevant (partitioning is by
    the PAIR hash, which spreads any one type over all partitions —
    the count-distinct analogue of salting)."""
    from engine.shuffle import grouped_count_sums, keyed_partition_map

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def block_distinct(b: pa.Table) -> pa.Table:
        df = b.to_pandas().drop_duplicates(["event_type", "user_id"])
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = ds.map_batches(block_distinct, batch_format="pyarrow")

    def partition_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.drop_duplicates(["event_type", "user_id"])
            .groupby("event_type", sort=False)
            .size()
            .reset_index(name="partial")
        )
        g["partial"] = g["partial"].astype(np.int64)
        return g

    partials = keyed_partition_map(
        pairs,
        ["event_type", "user_id"],
        partition_counts,
        num_partitions=16,
        out_schema=pa.schema(
            [("event_type", pa.string()), ("partial", pa.int64())]
        ),
    )
    agg = grouped_count_sums(
        partials, key="event_type", sum_cols=("partial",), num_partitions=1
    )
    return agg.map_batches(
        lambda b: b.select(["event_type", "sum_partial"]).rename_columns(
            ["event_type", "n_users"]
        ),
        batch_format="pyarrow",
    )


SQL_DISTINCT_USERS = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


REGISTRY.update(
    {"distinct_users_per_type": (q_distinct_users_per_type, SQL_DISTINCT_USERS)}
)


# ------------------------------------- C4 line-quality cleaning (X36)


def q_clean_lines_docs(sf_dir: str) -> Dataset:
    """C4-style line-quality cleaning (X36, engine/weblines.py): the
    five Raffel et al. §2.2 heuristics (terminal punctuation, >=3
    words per line, lorem-ipsum page drop, brace page drop, >=5
    surviving lines) as one vectorized zero-shuffle pass over the
    cached messy-lines corpus both engines share."""
    import ray.data as rd

    from engine.pages import sf_to_n_rows
    from engine.util import clean_read_schema
    from engine.weblines import clean_lines, lines_corpus_parquet

    n = max(200, sf_to_n_rows(sf_dir) // 10)
    path = lines_corpus_parquet(n)
    cols = ["page_id", "text"]
    # Split the single cache file so the per-line regex work
    # parallelizes (one block otherwise serializes the whole kernel).
    ds = rd.read_parquet(
        path,
        columns=cols,
        schema=clean_read_schema(path, cols),
        override_num_blocks=max(4, n // 8_192),
    )
    return clean_lines(ds)


def _sql_clean_lines(path: str) -> str:
    """Mirror of weblines.clean_lines_batch, built from the SAME
    regex/threshold constants (change together). COALESCE('') guards
    DuckDB's NULL string_agg over empty kept sets; the dropped-page
    CASE matches the engine's ''-for-dropped contract."""
    from engine.weblines import MIN_KEPT_LINES, MIN_WORDS, RE_LINE_END, RE_WORD

    drop = (
        "(contains(lower(s.text), 'lorem ipsum') OR contains(s.text, '{')"
        f" OR agg.n_kept < {MIN_KEPT_LINES})"
    )
    return rf"""
WITH s AS (
  SELECT page_id, text, string_split(text, chr(10)) AS ls
  FROM read_parquet('{path}')),
l AS (
  SELECT page_id, p, ls[p] AS line
  FROM s, LATERAL unnest(range(1, len(ls) + 1)) t(p)),
k AS (
  SELECT page_id, p, line,
    (regexp_matches(line, '{RE_LINE_END}')
     AND len(regexp_extract_all(line, '{RE_WORD}')) >= {MIN_WORDS}) AS keep
  FROM l),
agg AS (
  SELECT page_id,
    CAST(COUNT(*) AS BIGINT) AS n_lines,
    CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
    COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY p), '')
      AS joined
  FROM k GROUP BY page_id)
SELECT s.page_id, agg.n_lines, agg.n_kept,
  {drop} AS page_dropped,
  CASE WHEN {drop} THEN '' ELSE agg.joined END AS clean_text
FROM s JOIN agg USING (page_id)
"""


def _clean_lines_sql_gate() -> str:
    # Driver gate runs at sf0.01 (50k pages -> n=5000); the Ray query
    # materializes the cache before the oracle runs (weburl precedent).
    return _sql_clean_lines("/tmp/geokit_weblines/n5000/lines.parquet")


REGISTRY.update({"clean_lines_docs": (q_clean_lines_docs, _clean_lines_sql_gate())})


# ----------------------------------------- triangle counting (X37)


def q_triangle_counts_docs(sf_dir: str) -> Dataset:
    """Per-node triangle counts (X37, engine/graph.py) on the
    6-arm derived link graph (4 hash arms + the two ring arms that
    guarantee live clustered structure — pure affine maps close no
    3-cycles). Exact integer motif counting: canonical distinct
    undirected edges -> degree-bounded wedge join -> packed-key
    closure join -> per-corner combiner counts."""
    from engine.graph import derive_link_edges, triangle_counts

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    nodes = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        lambda b: b.rename_columns(["id"]), batch_format="pyarrow"
    )
    edges = derive_link_edges(nodes, n, id_col="id", out_degree=6)
    tri = triangle_counts(nodes, edges)
    return tri.map_batches(
        lambda b: b.rename_columns(["doc_id", "n_tri"]), batch_format="pyarrow"
    )


def _sql_triangle_counts(out_degree: int = 6) -> str:
    """Mirror of graph.triangle_counts over derive_link_edges: same
    (A, B) arm constants (imported — change together), LEAST/GREATEST
    canonicalization, the a<b<c ordered 3-way self-join (each
    triangle found exactly once), corner credits via UNION ALL."""
    from engine.graph import EDGE_A, EDGE_B

    arms = "\n  UNION ALL ".join(
        f"SELECT doc_id AS src, (doc_id * {EDGE_A[j]} + {EDGE_B[j]})"
        f" % (SELECT n FROM nn) AS dst FROM documents"
        for j in range(out_degree)
    )
    return f"""
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
edges AS (
  {arms}),
eu AS (SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
       FROM edges WHERE src <> dst),
tri AS (
  SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
  FROM eu e1 JOIN eu e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
       JOIN eu e3 ON e3.lo = e1.hi AND e3.hi = e2.hi),
pn AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS t
  FROM (SELECT a AS v FROM tri UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY v)
SELECT d.doc_id, CAST(COALESCE(pn.t, 0) AS BIGINT) AS n_tri
FROM documents d LEFT JOIN pn ON pn.v = d.doc_id
"""


REGISTRY.update({"triangle_counts_docs": (q_triangle_counts_docs, _sql_triangle_counts())})


# ------------------------------------- graph connected components (X38)


def q_graph_components(sf_dir: str) -> Dataset:
    """Connected components over a SPARSE one-arm link graph (X38,
    engine/graph.py::component_labels — the dedup CC machinery as a
    public graph operator). The graph restricts hash arm 0 to
    doc_id % 3 != 0 sources: a functional-graph fragment forest with
    ~n/15 live components plus isolated nodes (the full 6-arm graph
    is one giant component — structurally uninteresting)."""
    from engine.graph import EDGE_A, EDGE_B, component_labels

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    nodes = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        lambda b: b.rename_columns(["id"]), batch_format="pyarrow"
    )
    a0, b0 = EDGE_A[0], EDGE_B[0]

    def one_arm(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = ids[ids % 3 != 0]
        return pa.table({"src": src, "dst": (src * a0 + b0) % np.int64(n)})

    edges = nodes.map_batches(one_arm, batch_format="pyarrow")
    out = component_labels(nodes, edges)
    return out.map_batches(
        lambda b: b.rename_columns(["doc_id", "group_id"]), batch_format="pyarrow"
    )


def _sql_graph_components() -> str:
    """Recursive min-reachable-label mirror (the minhash verdict
    oracle's proven CTE shape) over the same one-arm edge derivation
    (shared constants — change together)."""
    from engine.graph import EDGE_A, EDGE_B

    return f"""
WITH RECURSIVE
nn AS (SELECT COUNT(*) AS n FROM documents),
edges0 AS (
  SELECT doc_id AS src, (doc_id * {EDGE_A[0]} + {EDGE_B[0]}) % (SELECT n FROM nn) AS dst
  FROM documents WHERE doc_id % 3 <> 0),
e AS (SELECT src AS a, dst AS b FROM edges0 WHERE src <> dst
      UNION SELECT dst, src FROM edges0 WHERE src <> dst),
reach(id, r) AS (
  SELECT a, a FROM e
  UNION
  SELECT reach.id, e.b FROM reach JOIN e ON reach.r = e.a),
labels AS (SELECT id AS doc_id, MIN(r) AS g FROM reach GROUP BY id)
SELECT d.doc_id, CAST(COALESCE(l.g, d.doc_id) AS BIGINT) AS group_id
FROM documents d LEFT JOIN labels l USING (doc_id)
"""


REGISTRY.update({"graph_components": (q_graph_components, _sql_graph_components())})


# ------------------------------- personalized PageRank variant (X33b)


def q_pagerank_personalized(sf_dir: str) -> Dataset:
    """Personalized PageRank with VARIABLE out-degree (X33b): the same
    integer fixed-point machinery as pagerank_docs, with (a) teleport
    mass restricted to seed nodes (doc_id % 17 == 0) and r0 = scale
    at seeds / 0 elsewhere, and (b) deg(u) counted from the edge
    multiset inside the src co-partition (the one-arm doc_id % 3 != 0
    graph has out-degrees 0 and 1 — dangling mass dropped by the
    documented convention)."""
    from engine.graph import EDGE_A, EDGE_B, pagerank

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    nodes = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        lambda b: b.rename_columns(["id"]), batch_format="pyarrow"
    )
    a0, b0 = EDGE_A[0], EDGE_B[0]

    def one_arm(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = ids[ids % 3 != 0]
        return pa.table({"src": src, "dst": (src * a0 + b0) % np.int64(n)})

    edges = nodes.map_batches(one_arm, batch_format="pyarrow")
    pr = pagerank(
        nodes, edges, n, out_degree=None, seed_mod=17, mode="partitioned"
    )
    return pr.map_batches(
        lambda b: b.rename_columns(["doc_id", "pr"]), batch_format="pyarrow"
    )


def _sql_pagerank_personalized(
    iters: int = 5, scale: int = 10**12, damp_pct: int = 85, seed_mod: int = 17
) -> str:
    """Unrolled mirror with a per-src COUNT(*) degree table and a
    CASE seed teleport (shared constants with the engine — change
    together)."""
    from engine.graph import EDGE_A, EDGE_B

    teleport = ((100 - damp_pct) * scale) // 100
    seed = f"CASE WHEN n.id % {seed_mod} = 0 THEN {teleport} ELSE 0 END"
    iter_ctes = "".join(
        f""",
r{t} AS (
  SELECT n.id, CAST({seed} + ({damp_pct} * COALESCE(s.c, 0)) // 100 AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS id, SUM(rp.r // deg.d) AS c
    FROM edges0 e JOIN deg USING (src) JOIN r{t - 1} rp ON rp.id = e.src
    GROUP BY e.dst) s USING (id))"""
        for t in range(1, iters + 1)
    )
    return f"""
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
nodes AS (SELECT doc_id AS id FROM documents),
edges0 AS (
  SELECT doc_id AS src, (doc_id * {EDGE_A[0]} + {EDGE_B[0]}) % (SELECT n FROM nn) AS dst
  FROM documents WHERE doc_id % 3 <> 0),
deg AS (SELECT src, COUNT(*) AS d FROM edges0 GROUP BY src),
r0 AS (SELECT doc_id AS id,
       CASE WHEN doc_id % {seed_mod} = 0 THEN {scale} ELSE 0 END AS r
       FROM documents){iter_ctes}
SELECT id AS doc_id, r AS pr FROM r{iters}
"""


REGISTRY.update(
    {"pagerank_personalized": (q_pagerank_personalized, _sql_pagerank_personalized())}
)


# ---------------------------------- composed web-refresh pipeline (X39)


def q_web_refresh(sf_dir: str):
    """Composed web-crawl refresh (X39): the round-4 webtext operators
    chained end-to-end the way a crawl refresh runs them —

      1. canonical-URL dedup over the messy-URL corpus (keep one page
         per canonical identity — the CCNet/RefinedWeb first stage);
      2. C4 line-quality cleaning of the kept pages' text (page drops
         + per-line cuts, text rebuilt);
      3. corpus-wide C4 line DEDUP (newline mode) over the cleaned
         survivors — this corpus' lines are heavily duplicated by
         construction, so the cut is live (first occurrence survives,
         every later one is removed).

    Both cached corpora are keyed by the same dense page_id, so the
    composition is a coherent crawl. Excluded rows-only entry: every
    stage is individually SQL-VALUE-checked in-window
    (canonical_urls, clean_lines_docs, line_dedup_docs — the
    curation_pipeline precedent); the composition's stage counts are
    pytest-checked against the corpora's truth columns.

    Returns Dataset[page_id, n_lines, n_dropped, clean_text] of
    surviving pages after all three stages.
    """
    import ray.data as rd

    from engine.dedupe import line_dedup
    from engine.joins import semi_filter
    from engine.pages import sf_to_n_rows
    from engine.util import clean_read_schema
    from engine.weblines import clean_lines, lines_corpus_parquet
    from engine.weburl import canonical_url_dedup, urls_corpus_parquet

    n = max(200, sf_to_n_rows(sf_dir) // 10)
    upath = urls_corpus_parquet(n)
    lpath = lines_corpus_parquet(n)
    ucols = ["page_id", "url"]
    urls = rd.read_parquet(upath, columns=ucols, schema=clean_read_schema(upath, ucols))
    keepers = canonical_url_dedup(urls, num_partitions=8)

    def keeper_ids(b: pa.Table) -> pa.Table:
        k = b.filter(b["is_keeper"])
        return k.select(["page_id"])

    kept = keepers.map_batches(keeper_ids, batch_format="pyarrow")
    # keeper set is canonical-identity-scale; broadcast semi-filter
    # (the candidate_docs bound applies — bucketed swap documented
    # there for keeper sets beyond broadcast)
    ids = np.sort(
        kept.to_pandas()["page_id"].to_numpy().astype(np.int64)
    )
    pcols = ["page_id", "text"]
    pages = rd.read_parquet(
        lpath,
        columns=pcols,
        schema=clean_read_schema(lpath, pcols),
        override_num_blocks=max(4, n // 8_192),
    )
    pages = semi_filter(pages, ids, "page_id")
    cleaned = clean_lines(pages)

    def survivors(b: pa.Table) -> pa.Table:
        k = b.filter(pc.invert(b["page_dropped"]))
        return pa.table({"page_id": k["page_id"], "text": k["clean_text"]})

    surv = cleaned.map_batches(survivors, batch_format="pyarrow")
    deduped = line_dedup(
        surv, id_col="page_id", text_col="text", num_partitions=8
    )
    return deduped.map_batches(
        lambda b: b.rename_columns(
            ["page_id", "n_lines", "n_dropped", "clean_text"]
        ),
        batch_format="pyarrow",
    )


REGISTRY.update({"web_refresh_pipeline": (q_web_refresh, None)})


# ------------------------------------ skew-salted equi-join (X40)


def q_salted_join_revenue(sf_dir: str) -> Dataset:
    """segment_revenue through the SKEW-SALTED join path (X40,
    engine/joins.py::salted_hash_join): five declared hot customer
    keys are salted (probe side split across 8 salts, build side
    replicated per salt) and the result must be VALUE-IDENTICAL to
    the plain join — the SQL mirror is the unsalted SQL, making
    'salting is semantically invisible' itself the checked claim."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(b["o_totalprice"], 100.0), round_mode="half_towards_infinity"),
            pa.int64(),
        )
        return pa.table({"c_custkey": b["o_custkey"], "price_cents": cents})

    orders = orders.map_batches(prep, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = salted_hash_join(
        orders, cust, key="c_custkey", hot_keys=[1, 7, 13, 19, 25], salts=8
    )
    agg = grouped_count_sums(joined, key="c_mktsegment", sum_cols=("price_cents",))
    return agg.map_batches(
        lambda b: b.rename_columns(["c_mktsegment", "n_orders", "sum_price_cents"]),
        batch_format="pyarrow",
    )


REGISTRY.update({"salted_join_revenue": (q_salted_join_revenue, SQL_SEGMENT_REVENUE)})


# ------------------- hashed linear classifier scoring gate (X41, round 4)


def q_classifier_scores(sf_dir: str) -> Dataset:
    """Quality-filter model scoring (textops.classifier_scores): the
    fastText/CCNet-shaped hashed bag-of-words linear model, scored
    per document — integer-exact (score = sum of int64 bucket weights
    over whitespace-token FNV hashes, label = score > 0) so the DuckDB
    mirror recomputes identical values from the shared token-FNV CTE
    plus the inline weight formula. The weight vector is actor-state
    (built/fetched once per scoring actor, never per batch)."""
    from engine.textops import classifier_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    return classifier_scores(ds)


# Mirror: the proven token-FNV CTE (change together with
# textops.CLF_* constants). h % 65536 fits BIGINT; bucket*MULT+ADD
# < 2^48. Empty docs keep (0, 0, false) via the LEFT JOIN.
SQL_CLASSIFIER_SCORES = f"""
WITH {_SQL_TOKEN_HASHES.lstrip()},
sc AS (
  SELECT doc_id, COUNT(*) AS n_toks,
         SUM((CAST(h % 65536 AS BIGINT) * 2654435761 + 40503) % 8192 - 4096) AS clf_score
  FROM th GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(sc.n_toks, 0) AS n_toks,
       CAST(COALESCE(sc.clf_score, 0) AS BIGINT) AS clf_score,
       COALESCE(sc.clf_score, 0) > 0 AS clf_label
FROM documents d LEFT JOIN sc USING (doc_id)
"""


REGISTRY.update({"classifier_scores": (q_classifier_scores, SQL_CLASSIFIER_SCORES)})


# -------- deterministic global shuffle + shard assignment gate (X42, r4)


def q_shard_shuffle_docs(sf_dir: str) -> Dataset:
    """Seeded global shuffle of the documents table into 64-row
    training shards (analytics.shard_shuffle): permutation key =
    (doc_id * SHUF_MULT + seed) mod 2^62 (odd multiplier -> bijective,
    no tiebreaks), rank in key order via the distributed prefix sum,
    shard_id = rank // 64, pos_in_shard = rank % 64. Only the pruned
    id projection rides the shuffle."""
    from engine.analytics import shard_shuffle

    ds = _read(sf_dir, "documents", ["doc_id"])
    return shard_shuffle(ds, id_col="doc_id", seed=7, shard_size=64)


# Mirror: same xor-mixed multiplicative key in HUGEINT (mod 2^62
# commutes with the engine's mod-2^64 uint wrap because 2^62 divides
# 2^64). 1406341421996795027 == (7 * SHUF_GOLDEN) mod 2^62, the
# seed-7 mix constant; xor operands are both < 2^62 so BIGINT xor is
# exact. Rank rule as a window function.
SQL_SHARD_SHUFFLE = """
WITH k AS (
  SELECT doc_id,
         CAST((xor(doc_id, 1406341421996795027)::HUGEINT
               * 6364136223846793005)
              % 4611686018427387904::HUGEINT AS BIGINT) AS skey
  FROM documents),
r AS (SELECT doc_id, skey,
             ROW_NUMBER() OVER (ORDER BY skey) - 1 AS rk FROM k)
SELECT doc_id, skey, rk // 64 AS shard_id, rk % 64 AS pos_in_shard
FROM r
"""


REGISTRY.update({"shard_shuffle_docs": (q_shard_shuffle_docs, SQL_SHARD_SHUFFLE)})


# ------------------- domain blocklist filtering gate (X43, round 4)


def q_blocklist_docs(sf_dir: str) -> Dataset:
    """URL-level domain blocklist filter (weburl.blocklist_filter):
    every host in the cached hosts corpus annotated with blocked /
    matched_domain under the label-boundary suffix rule (host == d or
    host ends with '.' + d; longest match wins). The engine matches
    via broadcast suffix DIGESTS with literal verification of hits;
    the DuckDB mirror matches LITERAL suffix strings — digest- vs
    text-exactness cross-checked (the canonical_urls precedent)."""
    import ray.data as rd

    from engine.pages import sf_to_n_rows
    from engine.util import clean_read_schema
    from engine.weburl import blocklist_filter, hosts_corpus_parquet

    n = max(200, sf_to_n_rows(sf_dir) // 10)
    path = hosts_corpus_parquet(n)
    cols = ["page_id", "host"]
    ds = rd.read_parquet(path, columns=cols, schema=clean_read_schema(path, cols))
    return blocklist_filter(ds)


def _sql_blocklist(path: str) -> str:
    from engine.weburl import BLOCKLIST_DEFAULT

    values = ", ".join(f"('{d}')" for d in BLOCKLIST_DEFAULT)
    return f"""
WITH hosts AS (SELECT page_id, host FROM read_parquet('{path}')),
lab AS (SELECT page_id, host, string_split(host, '.') AS ls FROM hosts),
suf AS (
  SELECT page_id, array_to_string(list_slice(ls, i, len(ls)), '.') AS s
  FROM lab, LATERAL unnest(range(1, len(ls) + 1)) AS t(i)),
bl(d) AS (VALUES {values}),
hit AS (SELECT page_id, s FROM suf JOIN bl ON suf.s = bl.d),
best AS (SELECT page_id, max_by(s, length(s)) AS matched
         FROM hit GROUP BY page_id)
SELECT h.page_id, h.host,
       (b.page_id IS NOT NULL) AS blocked,
       b.matched AS matched_domain
FROM hosts h LEFT JOIN best b USING (page_id)
"""


def _blocklist_sql_gate() -> str:
    # Driver gate runs at sf0.01 (n=5000); the Ray query materializes
    # the cached corpus before the oracle runs (urls-corpus idiom).
    return _sql_blocklist("/tmp/geokit_webhosts/n5000/hosts.parquet")


REGISTRY.update({"blocklist_docs": (q_blocklist_docs, _blocklist_sql_gate())})


def q_robots_filter(sf_dir: str) -> Dataset:
    """robots.txt crawl-policy filter (X51): parse each host's
    robots.txt into the group applying to our agent, verdict every
    candidate URL by longest-literal-prefix precedence (Allow wins
    ties; no rule / no robots = allowed). Both engines read the same
    cached robots + urls corpora (the canonical_urls precedent); the
    DuckDB mirror re-implements the parser with window functions and
    the verdict with starts_with + MAX/bool_or."""
    import ray.data as rd

    from engine.pages import sf_to_n_rows
    from engine.robots import robots_corpus_parquet, robots_filter
    from engine.util import clean_read_schema

    n_urls = max(200, sf_to_n_rows(sf_dir) // 10)
    n_hosts = max(40, n_urls // 25)
    rpath, upath = robots_corpus_parquet(n_hosts, n_urls)
    ucols = ["url_id", "host", "path"]
    urls = rd.read_parquet(upath, columns=ucols, schema=clean_read_schema(upath, ucols))
    rcols = ["host", "robots_txt"]
    robots = rd.read_parquet(rpath, columns=rcols, schema=clean_read_schema(rpath, rcols))
    return robots_filter(urls, robots)


def _sql_robots_filter(rpath: str, upath: str, agent: str = "graftbot") -> str:
    """DuckDB mirror of robots.parse_robots_batch + robots_filter,
    built from the SAME regex constants (engine/robots.py — change
    them together). Parser: comment strip + CR strip + line split,
    one regexp per line, LAG/SUM window group segmentation, exact-
    agent-else-'*' group selection; verdict: literal starts_with,
    longest prefix, Allow wins length ties."""
    from engine.robots import COMMENT_RE, DIRECTIVE_RE

    return f"""
WITH robots AS (SELECT * FROM read_parquet('{rpath}')),
urls AS (SELECT * FROM read_parquet('{upath}')),
clean AS (
  SELECT host,
         regexp_replace(replace(robots_txt, chr(13), ''), '{COMMENT_RE}', '', 'g') AS txt
  FROM robots),
lines AS (
  SELECT host, p AS ln, string_split(txt, chr(10))[p] AS line
  FROM clean, LATERAL unnest(range(1, len(string_split(txt, chr(10))) + 1)) AS t(p)),
dirs AS (
  SELECT host, ln,
    lower(regexp_extract(line, '{DIRECTIVE_RE}', 1)) AS d,
    regexp_extract(line, '{DIRECTIVE_RE}', 2) AS v
  FROM lines WHERE regexp_matches(line, '{DIRECTIVE_RE}')),
d2 AS (
  SELECT *, COALESCE(LAG(d) OVER (PARTITION BY host ORDER BY ln), '') AS pd,
         SUM(CASE WHEN d = 'user-agent' THEN 1 ELSE 0 END)
             OVER (PARTITION BY host ORDER BY ln) AS ua_seen
  FROM dirs),
grp AS (
  SELECT *, SUM(CASE WHEN d = 'user-agent' AND pd <> 'user-agent' THEN 1 ELSE 0 END)
              OVER (PARTITION BY host ORDER BY ln) AS gid
  FROM d2),
agents AS (SELECT host, gid, lower(v) AS agent FROM grp WHERE d = 'user-agent'),
sel AS (SELECT DISTINCT host, gid FROM agents WHERE agent = '{agent}'),
chosen AS (
  SELECT * FROM sel
  UNION
  SELECT s.host, s.gid FROM (SELECT DISTINCT host, gid FROM agents WHERE agent = '*') s
  WHERE s.host NOT IN (SELECT host FROM sel)),
rules AS (
  SELECT g.host, (g.d = 'allow') AS allow, g.v AS prefix
  FROM grp g JOIN chosen c ON c.host = g.host AND c.gid = g.gid
  WHERE g.d IN ('allow', 'disallow') AND g.v <> '' AND g.ua_seen > 0),
matched AS (
  SELECT u.url_id, r.allow, len(r.prefix) AS pl
  FROM urls u JOIN rules r ON r.host = u.host AND starts_with(u.path, r.prefix)),
best AS (SELECT url_id, MAX(pl) AS bp FROM matched GROUP BY url_id),
win AS (
  SELECT m.url_id, bool_or(m.allow) AS allowed, MAX(m.pl) AS pl
  FROM matched m JOIN best b ON b.url_id = m.url_id AND m.pl = b.bp
  GROUP BY m.url_id)
SELECT u.url_id, u.host, u.path,
       COALESCE(w.allowed, TRUE) AS allowed,
       CAST(COALESCE(w.pl, -1) AS BIGINT) AS matched_pl
FROM urls u LEFT JOIN win w ON w.url_id = u.url_id
"""


def _robots_sql_gate() -> str:
    # Driver gate runs at sf0.01 (n_urls=5000, n_hosts=200); the Ray
    # query materializes the cached corpora before the oracle runs
    # (urls-corpus idiom), so only the PATHS are computed here.
    root = "/tmp/geokit_robots/h200_u5000"
    return _sql_robots_filter(f"{root}/robots.parquet", f"{root}/urls.parquet")


REGISTRY.update({"robots_filter_urls": (q_robots_filter, _robots_sql_gate())})


# ----------------------------------------- HTML text extraction (X44)


def q_html_extract_docs(sf_dir: str) -> Dataset:
    """HTML -> text extraction (X44, engine/webhtml.py): the
    boilerplate-strip stage that opens every webtext pipeline —
    script/style/comment drop, block tags -> newline, inline tags ->
    space, fixed entity decode ('&amp;' last), whitespace collapse —
    one zero-shuffle vectorized RE2 chain over the cached messy-HTML
    corpus both engines share."""
    import ray.data as rd

    from engine.pages import sf_to_n_rows
    from engine.util import clean_read_schema
    from engine.webhtml import html_corpus_parquet, html_extract

    n = max(200, sf_to_n_rows(sf_dir) // 10)
    path = html_corpus_parquet(n)
    cols = ["page_id", "html"]
    # Split the single cache file so the regex chain parallelizes.
    ds = rd.read_parquet(
        path,
        columns=cols,
        schema=clean_read_schema(path, cols),
        override_num_blocks=max(4, n // 8_192),
    )
    return html_extract(ds)


def _sql_html_extract(path: str) -> str:
    """DuckDB mirror BUILT FROM the same step constants as the engine
    kernel (engine/webhtml.py — change together): the identical
    regexp_replace / replace chain in the identical order, newline
    replacements spelled chr(10). Compares extracted text verbatim
    plus the exact n_chars/n_tags ints."""
    from engine.webhtml import (
        HTML_ENTITY_STEPS,
        HTML_REGEX_STEPS,
        HTML_WS_STEPS,
        RE_ANY_TAG,
    )

    expr = "html"
    for pat, rep in HTML_REGEX_STEPS:
        r = "chr(10)" if rep == "\n" else f"'{rep}'"
        expr = f"regexp_replace({expr}, '{pat}', {r}, 'g')"
    for lit, rep in HTML_ENTITY_STEPS:
        expr = f"replace({expr}, '{lit}', '{rep.replace(chr(39), chr(39) * 2)}')"
    for pat, rep in HTML_WS_STEPS:
        r = "chr(10)" if rep == "\n" else f"'{rep}'"
        expr = f"regexp_replace({expr}, '{pat}', {r}, 'g')"
    return f"""
WITH x AS (
  SELECT page_id, html, {expr} AS text
  FROM read_parquet('{path}'))
SELECT page_id, text,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(regexp_extract_all(html, '{RE_ANY_TAG}')) AS BIGINT) AS n_tags
FROM x
"""


def _html_extract_sql_gate() -> str:
    # Driver gate runs at sf0.01 (n=5000); the Ray query materializes
    # the cached corpus before the oracle runs (urls-corpus idiom).
    return _sql_html_extract("/tmp/geokit_webhtml/n5000/html.parquet")


REGISTRY.update({"html_extract_docs": (q_html_extract_docs, _html_extract_sql_gate())})


# ----------------------------------------- CDC snapshot merge (X45)


def q_snapshot_merge_orders(sf_dir: str) -> Dataset:
    """CDC upsert / snapshot compaction (X45, engine/cdc.py): merge
    the orders snapshot with a synthesized changelog (upserts with
    winning/losing/TIED seqs, second-generation upserts, deletes that
    sometimes lose, brand-new keys) under the latest-wins
    (seq, src, op) rule. The changelog is derived from orders by
    integer arithmetic (the pii_scrub precedent) so every verdict
    class is live and the DuckDB mirror rebuilds it exactly."""
    import ray.data as rd

    from engine.cdc import snapshot_merge
    from engine.util import clean_read_schema

    path = f"{sf_dir}/orders.parquet"
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]

    def to_base(b: pa.Table) -> pa.Table:
        import numpy as np

        k = b["o_orderkey"].to_numpy()
        cents = pc.cast(
            pc.round(pc.multiply(b["o_totalprice"], 100.0), round_mode="half_towards_infinity"),
            pa.int64(),
        )
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "seq": pa.array((k % 5).astype(np.int64)),
                "o_custkey": b["o_custkey"],
                "o_orderstatus": b["o_orderstatus"],
                "cents": cents,
            }
        )

    def to_changelog(b: pa.Table) -> pa.Table:
        import numpy as np

        k = b["o_orderkey"].to_numpy()
        ck = b["o_custkey"].to_numpy()
        cents = pc.cast(
            pc.round(pc.multiply(b["o_totalprice"], 100.0), round_mode="half_towards_infinity"),
            pa.int64(),
        ).to_numpy()
        outs = []
        m1 = k % 7 == 0  # first-gen upserts: lose / TIE / win vs base
        outs.append(
            dict(
                k=k[m1],
                seq=(k[m1] % 5) + (k[m1] % 3) - 1,
                ck=ck[m1],
                st=np.full(m1.sum(), "U1"),
                c=cents[m1] + 11_111,
                op=np.full(m1.sum(), "u"),
            )
        )
        m2 = k % 21 == 0  # second-gen upserts: always win
        outs.append(
            dict(
                k=k[m2],
                seq=(k[m2] % 5) + 7,
                ck=ck[m2],
                st=np.full(m2.sum(), "U2"),
                c=cents[m2] + 222_222,
                op=np.full(m2.sum(), "u"),
            )
        )
        m3 = k % 11 == 3  # deletes: odd keys win, even keys lose
        outs.append(
            dict(
                k=k[m3],
                seq=(k[m3] % 5) + (k[m3] % 2) * 3 - 1,
                ck=ck[m3],
                st=np.full(m3.sum(), "D"),
                c=cents[m3],
                op=np.full(m3.sum(), "d"),
            )
        )
        m4 = k % 13 == 0  # brand-new keys
        outs.append(
            dict(
                k=k[m4] + 100_000_000,
                seq=np.ones(m4.sum(), np.int64),
                ck=ck[m4],
                st=np.full(m4.sum(), "N"),
                c=cents[m4] + 7,
                op=np.full(m4.sum(), "u"),
            )
        )
        return pa.table(
            {
                "o_orderkey": pa.array(
                    np.concatenate([o["k"] for o in outs]).astype(np.int64)
                ),
                "seq": pa.array(
                    np.concatenate([o["seq"] for o in outs]).astype(np.int64)
                ),
                "o_custkey": pa.array(
                    np.concatenate([o["ck"] for o in outs]).astype(np.int64)
                ),
                "o_orderstatus": pa.array(
                    np.concatenate([o["st"] for o in outs]), pa.string()
                ),
                "cents": pa.array(
                    np.concatenate([o["c"] for o in outs]).astype(np.int64)
                ),
                "op": pa.array(np.concatenate([o["op"] for o in outs]), pa.string()),
            }
        )

    base = rd.read_parquet(
        path, columns=cols, schema=clean_read_schema(path, cols)
    ).map_batches(to_base, batch_format="pyarrow")
    changelog = rd.read_parquet(
        path, columns=cols, schema=clean_read_schema(path, cols)
    ).map_batches(to_changelog, batch_format="pyarrow")
    return snapshot_merge(base, changelog, key="o_orderkey", num_partitions=8)


_SQL_SNAPSHOT_MERGE = """
WITH src AS (
  SELECT o_orderkey AS k, o_custkey AS ck, o_orderstatus AS st,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
base AS (
  SELECT k, k % 5 AS seq, ck, st, cents, 'u' AS op, 0 AS srcr FROM src),
cl AS (
  SELECT k, (k % 5) + (k % 3) - 1 AS seq, ck, 'U1' AS st,
         cents + 11111 AS cents, 'u' AS op, 1 AS srcr
  FROM src WHERE k % 7 = 0
  UNION ALL
  SELECT k, (k % 5) + 7, ck, 'U2', cents + 222222, 'u', 1
  FROM src WHERE k % 21 = 0
  UNION ALL
  SELECT k, (k % 5) + (k % 2) * 3 - 1, ck, 'D', cents, 'd', 1
  FROM src WHERE k % 11 = 3
  UNION ALL
  SELECT k + 100000000, 1, ck, 'N', cents + 7, 'u', 1
  FROM src WHERE k % 13 = 0),
allr AS (SELECT * FROM base UNION ALL SELECT * FROM cl),
w AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY k ORDER BY seq DESC, srcr DESC, op DESC) AS rn
  FROM allr)
SELECT k AS o_orderkey, CAST(seq AS BIGINT) AS seq, ck AS o_custkey,
       st AS o_orderstatus, cents
FROM w WHERE rn = 1 AND op = 'u'
"""


REGISTRY.update(
    {"snapshot_merge_orders": (q_snapshot_merge_orders, _SQL_SNAPSHOT_MERGE)}
)


# ----------------------------------------- WARC record parsing (X46)


def q_warc_records(sf_dir: str) -> Dataset:
    """WARC-style raw-crawl record parsing (X46, engine/warc.py): the
    web-scale ingest format — binary crawl chunks of concatenated
    WARC/1.0 records exploded one-row-per-record by CONTENT-LENGTH
    arithmetic (payloads may contain CRLFCRLF / marker lookalikes).
    The mirror extracts the same records by marker-split + CRLFCRLF
    POSITION arithmetic — two independent extraction paths compared
    verbatim on header fields AND payload text."""
    import ray.data as rd

    from engine.pages import sf_to_n_rows
    from engine.util import clean_read_schema
    from engine.warc import read_warc, warc_corpus_parquet

    n = max(100, sf_to_n_rows(sf_dir) // 50)
    path = warc_corpus_parquet(n)
    cols = ["chunk_id", "data"]
    ds = rd.read_parquet(
        path,
        columns=cols,
        schema=clean_read_schema(path, cols),
        override_num_blocks=max(4, n // 256),
    )
    return read_warc(ds)


def _sql_warc(path: str) -> str:
    """DuckDB mirror: an INDEPENDENT extraction path — split each
    chunk on the record marker, then recover headers and payload by
    first-CRLFCRLF position arithmetic (the engine instead jumps by
    Content-Length; module docstring documents why both agree on the
    gate corpus). Payload text compared verbatim."""
    m = "'WARC/1.0' || chr(13) || chr(10)"
    sep = "chr(13) || chr(10) || chr(13) || chr(10)"
    return rf"""
WITH c AS (
  SELECT chunk_id, string_split(decode(data), {m}) AS ls
  FROM read_parquet('{path}')),
r AS (
  SELECT chunk_id, CAST(t.i - 2 AS BIGINT) AS rec_index, ls[i] AS piece
  FROM c, LATERAL unnest(range(2, len(ls) + 1)) AS t(i)),
p AS (
  SELECT chunk_id, rec_index, piece,
         strpos(piece, {sep}) AS pos
  FROM r)
SELECT chunk_id, rec_index,
  regexp_extract(substr(piece, 1, pos - 1), 'WARC-Type: ([^\r\n]*)', 1) AS warc_type,
  regexp_extract(substr(piece, 1, pos - 1), 'WARC-Target-URI: ([^\r\n]*)', 1) AS target_uri,
  regexp_extract(substr(piece, 1, pos - 1), 'WARC-Date: ([^\r\n]*)', 1) AS warc_date,
  CAST(regexp_extract(substr(piece, 1, pos - 1), 'Content-Length: ([0-9]+)', 1) AS BIGINT)
    AS content_length,
  substr(piece, pos + 4, length(piece) - pos - 7) AS payload
FROM p
"""


def _warc_sql_gate() -> str:
    # Driver gate runs at sf0.01 (n=1000 chunks); the Ray query
    # materializes the cached corpus before the oracle runs.
    return _sql_warc("/tmp/geokit_warc/n1000/chunks.parquet")


REGISTRY.update({"warc_records": (q_warc_records, _warc_sql_gate())})


# ---------------------------------------- crawl ingest pipeline (X47)


def q_crawl_ingest(sf_dir: str) -> Dataset:
    """Composed crawl-ingest pipeline (X47, engine/crawl.py): WARC
    parse -> response filter -> canonical-URL dedup keepers -> domain
    blocklist -> HTML->text extraction -> classifier scoring, over a
    cached deterministic raw-crawl corpus whose records carry the
    messy-URL and messy-HTML corpora (with their truth columns).
    Driver-excluded rows-only (the X39/X15 composition precedent:
    every stage is individually SQL-VALUE-checked in-window); pytest
    cross-checks the survivor id set and extracted texts against a
    scalar recomputation from the generators' truths."""
    import ray.data as rd

    from engine.crawl import crawl_corpus_parquet, crawl_ingest
    from engine.pages import sf_to_n_rows
    from engine.util import clean_read_schema

    n_chunks = max(50, sf_to_n_rows(sf_dir) // 200)
    path = crawl_corpus_parquet(n_chunks)
    cols = ["chunk_id", "data"]
    ds = rd.read_parquet(
        path,
        columns=cols,
        schema=clean_read_schema(path, cols),
        override_num_blocks=max(4, n_chunks // 128),
    )
    return crawl_ingest(ds)


REGISTRY.update({"crawl_ingest_pipeline": (q_crawl_ingest, None)})


# ------------------------------------- anchor-text aggregation (X48)


def q_anchor_topk(sf_dir: str) -> Dataset:
    """Inbound anchor-text top-k per link target (X48,
    engine/anchors.py): exact (dst, anchor) counts via the combiner
    shuffle, then per-dst top-3 on the (cnt DESC, anchor ASC) total
    order — the web-graph signal that describes each page by how the
    rest of the web links to it."""
    import ray.data as rd

    from engine.anchors import anchor_topk, derive_anchor_edges
    from engine.util import clean_read_schema

    path = f"{sf_dir}/documents.parquet"
    n = pq.read_metadata(path).num_rows
    cols = ["doc_id"]
    nodes = rd.read_parquet(path, columns=cols, schema=clean_read_schema(path, cols))
    return anchor_topk(derive_anchor_edges(nodes, n), k=3, num_partitions=16)


def _sql_anchor_topk(out_degree: int = 4, k: int = 3) -> str:
    """Mirror of anchors.anchor_topk over derive_anchor_edges: same
    (A, B) arm constants and the same ANCHOR_VOCAB list (imported —
    change together), 1-based DuckDB list indexing, ROW_NUMBER on the
    identical (cnt DESC, anchor ASC) total order."""
    from engine.anchors import ANCHOR_VOCAB
    from engine.graph import EDGE_A, EDGE_B

    vocab = "[" + ", ".join(f"'{w}'" for w in ANCHOR_VOCAB) + "]"
    arms = "\n  UNION ALL ".join(
        f"SELECT doc_id AS src, (doc_id * {EDGE_A[j]} + {EDGE_B[j]})"
        f" % (SELECT n FROM nn) AS dst, {j} AS arm FROM documents"
        for j in range(out_degree)
    )
    return f"""
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
edges AS (
  {arms}),
an AS (
  SELECT dst, ({vocab})[1 + CAST((dst + 13 * ((src + arm) % 5)) % {len(ANCHOR_VOCAB)} AS INT)]
         AS anchor
  FROM edges),
cn AS (
  SELECT dst, anchor, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM an GROUP BY dst, anchor),
rk AS (
  SELECT dst, anchor, cnt, CAST(ROW_NUMBER() OVER (
    PARTITION BY dst ORDER BY cnt DESC, anchor ASC) AS BIGINT) AS rank
  FROM cn)
SELECT dst, rank, anchor, cnt FROM rk WHERE rank <= {k}
"""


REGISTRY.update({"anchor_topk_docs": (q_anchor_topk, _sql_anchor_topk())})


# ------------------------------------ grouped vector centroids (X49)


def q_label_centroids(sf_dir: str) -> Dataset:
    """Exact per-label embedding centroids (X49, engine/vecagg.py):
    vectors quantized once (2^20, half-away — the cents idiom), one
    scatter-reduce per batch, ONE (label, dim) combiner shuffle of
    group-scale partials, centroid derived from the exact int sums by
    a single fixed division (bitwise SQL-mirrorable)."""
    import ray.data as rd

    from engine.util import clean_read_schema
    from engine.vecagg import label_centroid_sums

    path = f"{sf_dir}/embeddings.parquet"
    cols = ["label", "embedding"]
    ds = rd.read_parquet(path, columns=cols, schema=clean_read_schema(path, cols))
    return label_centroid_sums(ds, num_partitions=8)


def _sql_label_centroids() -> str:
    from engine.vecagg import QUANT

    return f"""
WITH f AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(t.i - 1 AS BIGINT) AS dim,
         CAST(ROUND(CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) * {QUANT}) AS BIGINT) AS q
  FROM embeddings, LATERAL unnest(range(1, len(embedding) + 1)) AS t(i))
SELECT label, dim,
       CAST(SUM(q) AS BIGINT) AS sum_q,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(q) AS BIGINT) / (CAST(COUNT(*) AS DOUBLE) * {QUANT}.0) AS centroid
FROM f GROUP BY label, dim
"""


REGISTRY.update({"label_centroids": (q_label_centroids, _sql_label_centroids())})


# ------------------------------------------- X52: BPE tokenizer training


def q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer-training merges (X52, engine/bpe.py):
    ONE corpus-scale word-count combiner pass, then 8 exact greedy
    merge iterations over the materialized vocab-scale word table
    (pair-stat partials + keyed merge + per-block-prune argmax; merge
    applied as one vectorized replace under the double-space encoding
    that makes scan-forward replace ≡ classic greedy-leftmost BPE —
    probed bitwise across pyarrow/Python/DuckDB)."""
    from engine.bpe import bpe_merges

    ds = _read(sf_dir, "documents", ["text"], rows_per_block=256)
    return bpe_merges(ds, n_merges=8)


# ---------------------------------------- X53: inverted-index postings


def q_inverted_postings(sf_dir: str):
    """Sharded inverted-index construction (X53, engine/invindex.py):
    doc_token_tf_partials combiner (the tfidf/doc_token_stats per-
    (doc, token) tf machinery, promoted back to SQL-value strength
    in-window), shard key doc_id % 8 attached BEFORE the one
    (token, shard) co-partition so no hot term ever assembles a
    corpus-wide posting row."""
    from engine.invindex import inverted_postings

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    return inverted_postings(ds, n_shards=8)


# ------------------------------------- X54: windowed co-occurrence lift


def q_cooc_lift(sf_dir: str):
    """Windowed co-occurrence association mining (X54, engine/cooc.py):
    per-block ordered-pair partials (window 3), one (l, r) co-partition
    merge, vocab-scale marginals broadcast once, exact integer lift_ppm
    + per-block-prune top-50 on the (lift, cnt, pair) total order."""
    from engine.cooc import cooc_lift

    ds = _read(sf_dir, "documents", ["text"], rows_per_block=256)
    return cooc_lift(ds, window=3, min_count=5, k=50)


def _sql_bpe_merges_gate() -> str:
    from engine.bpe import sql_bpe_merges

    return sql_bpe_merges(8)


def _registry_add_x52_x54() -> None:
    from engine.cooc import SQL_COOC_LIFT
    from engine.invindex import SQL_INVERTED_POSTINGS

    REGISTRY.update(
        {
            "bpe_merges": (q_bpe_merges, _sql_bpe_merges_gate()),
            "inverted_postings": (q_inverted_postings, SQL_INVERTED_POSTINGS),
            "cooc_lift": (q_cooc_lift, SQL_COOC_LIFT),
        }
    )


_registry_add_x52_x54()


# ---------------------------------------- X55: BPE encode (train→apply)


def q_bpe_encode_docs(sf_dir: str):
    """Tokenizer lifecycle encode side (X55, engine/bpe.py): per-doc
    BPE token counts under the 8 merges trained on the same corpus —
    one corpus-scale count pass (shared with training), vocab-scale
    iterations, the token→symbol-count map broadcast once, one
    corpus-scale counting pass. Excluded from the driver window (no
    swap): a composition of bpe_merges (SQL-value in-window) + the
    broadcast-lookup counting shape (classifier_scores in-window);
    stays SQL-exact in the excluded-queries test."""
    from engine.bpe import bpe_token_counts

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    return bpe_token_counts(ds, n_merges=8)


def _sql_bpe_encode_gate() -> str:
    from engine.bpe import sql_bpe_encode

    return sql_bpe_encode(8)


REGISTRY.update({"bpe_encode_docs": (q_bpe_encode_docs, _sql_bpe_encode_gate())})


# --------------------------------------------- X56: product quantization


def q_pq_ann(sf_dir: str):
    """PQ-compressed ANN (X56, engine/pq.py): per-subspace codebooks
    trained on the distributed hash-stratum sample, one corpus-scale
    encode pass to m uint8 codes, ADC top-10 via broadcast distance
    tables (m gathers + adds per vector). Approximate by design (the
    ann_ivf precedent) — excluded rows-only; recall/exactness are
    pytest-bounded (tests/test_pq.py)."""
    import pyarrow.parquet as pq_

    from engine.pq import pq_encode, pq_topk, train_codebook

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cb = train_codebook(ds, m=16, k=64)
    codes = pq_encode(ds, cb)
    # deterministic query: the vec_id == 7 vector (tiny pruned read)
    t = pq_.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    import pyarrow.compute as pc_

    row = t.filter(pc_.equal(t["vec_id"], 7))
    q = np.asarray(row["embedding"].to_pylist()[0], dtype=np.float64)
    return pq_topk(codes, cb, q, k=10, rerank_ds=ds, rerank=50)


REGISTRY.update({"pq_ann": (q_pq_ann, None)})


# ------------------------------------ X57: Gopher document quality


def q_gopher_quality_docs(sf_dir: str) -> Dataset:
    """Gopher document-level quality rules (X57, engine/gopher.py):
    the Rae et al. 2021 per-document filter — word count, mean word
    length, symbol/bullet/ellipsis ratios, alpha-word ratio, stopword
    presence — every rule an exact integer cross-multiply, one
    zero-shuffle vectorized pass over the cached multi-line corpus
    both engines share (the weblines idiom)."""
    import ray.data as rd

    from engine.gopher import gopher_corpus_parquet, gopher_quality
    from engine.pages import sf_to_n_rows
    from engine.util import clean_read_schema

    n = max(200, sf_to_n_rows(sf_dir) // 10)
    path = gopher_corpus_parquet(n)
    cols = ["page_id", "text"]
    ds = rd.read_parquet(
        path,
        columns=cols,
        schema=clean_read_schema(path, cols),
        override_num_blocks=max(4, n // 8_192),
    )
    return gopher_quality(ds)


def _sql_gopher(path: str) -> str:
    """Mirror of gopher.gopher_stats_batch, built from the SAME
    constants (change together). Engine↔DuckDB RE2 agreement for all
    patterns (incl. (?m) multiline) probed bitwise in tests."""
    from engine import gopher as g

    counts = ",\n    ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS {name}"
        for name, pat in g.COUNT_COLS
    )
    stop = " + ".join(
        f"(CASE WHEN regexp_matches(text, '\\b{w}\\b') THEN 1 ELSE 0 END)"
        for w in g.STOPWORDS
    )
    keep = (
        f"(n_words >= {g.MIN_WORDS} AND n_words <= {g.MAX_WORDS}"
        f" AND {g.MIN_MEAN_WL} * n_words <= n_nonspace"
        f" AND n_nonspace <= {g.MAX_MEAN_WL} * n_words"
        f" AND {g.SYM_DEN} * (n_hash + n_ellipsis) <= {g.SYM_NUM} * n_words"
        f" AND {g.BULLET_DEN} * n_bullet_lines <= {g.BULLET_NUM} * n_lines"
        f" AND {g.ELL_DEN} * n_ell_lines <= {g.ELL_NUM} * n_lines"
        f" AND {g.ALPHA_DEN} * n_alpha_words >= {g.ALPHA_NUM} * n_words"
        f" AND n_stop >= {g.MIN_STOP})"
    )
    return f"""
WITH c AS (
  SELECT page_id,
    {counts},
    CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
    CAST({stop} AS BIGINT) AS n_stop
  FROM read_parquet('{path}'))
SELECT page_id, n_words, n_nonspace, n_hash, n_ellipsis, n_lines,
       n_bullet_lines, n_ell_lines, n_alpha_words, n_stop,
       {keep} AS keep
FROM c
"""


def _gopher_sql_gate() -> str:
    # Driver gate runs at sf0.01 (50k docs -> n=5000); the Ray query
    # materializes the cache before the oracle runs (weblines idiom).
    return _sql_gopher("/tmp/geokit_gopher/n5000/docs.parquet")


REGISTRY.update(
    {"gopher_quality_docs": (q_gopher_quality_docs, _gopher_sql_gate())}
)


# ----------------------------------------- X58: funnel analysis


def q_funnel_events(sf_dir: str) -> Dataset:
    """Ordered conversion funnel (X58, engine/funnel.py): per-user
    greedy staged matching view -> click -> purchase with strict-
    inequality advancement; exact int64 epoch-µs stage times (0
    sentinel for absent stages). One pruned read + per-block type
    filter + one user co-partition."""
    from engine.funnel import funnel

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    return funnel(ds)


def _funnel_sql_gate() -> str:
    from engine.funnel import sql_funnel

    return sql_funnel()


REGISTRY.update({"funnel_events": (q_funnel_events, _funnel_sql_gate())})


# ------------------------------------------ X59: z-order spatial layout


def q_zorder_points(sf_dir: str) -> Dataset:
    """Z-order spatial layout assignment (X59, engine/zorder.py):
    deterministic 20-bit grid coords from event ids -> Morton bit
    interleave -> exact global (zkey, id)-rank partition/position via
    the distributed prefix sum. The SQL mirror recomputes the
    identical bit-spread chain (shared SPREAD_STEPS constants) and the
    ROW_NUMBER rank rule."""
    from engine.zorder import zorder_points

    ds = _read(sf_dir, "events", ["event_id"])
    return zorder_points(ds)


def _zorder_sql_gate() -> str:
    from engine.zorder import sql_zorder_points

    return sql_zorder_points()


REGISTRY.update({"zorder_points": (q_zorder_points, _zorder_sql_gate())})


# ------------------------------------------ X60: grid-accelerated DBSCAN


def q_dbscan_events(sf_dir: str) -> Dataset:
    """Exact DBSCAN spatial clustering (X60, engine/dbscan.py):
    deterministic planted-blob points from event ids -> 3x3 cell
    stencil co-partition (complete local neighborhoods -> exact
    degrees + eps-pairs in ONE pass) -> core/border/noise verdicts
    with min-label connected components. The SQL mirror recomputes
    the identical integer derivation (shared constants) and the
    proven recursive min-reachable-label CC."""
    from engine.dbscan import EPS, MIN_PTS, dbscan, synth_points

    n = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    ev = _read(sf_dir, "events", ["event_id"])
    pts = synth_points(ev, n)
    out = dbscan(pts, EPS, MIN_PTS)
    return out.map_batches(
        lambda b: b.rename_columns(["event_id", "x", "y", "is_core", "cluster"]),
        batch_format="pyarrow",
    )


def _dbscan_sql_gate() -> str:
    from engine.dbscan import sql_dbscan_events

    return sql_dbscan_events()


REGISTRY.update({"dbscan_events": (q_dbscan_events, _dbscan_sql_gate())})


# ------------------------------------- X61: tile-pyramid aggregation


def q_tile_pyramid_events(sf_dir: str) -> Dataset:
    """Multi-resolution tile-pyramid aggregation (X61,
    engine/pyramid.py): deterministic 20-bit grid coords from event
    ids (the zorder synthetic-grid constants), floor-cent weights,
    one corpus-scale combiner rollup at the finest zoom, then every
    coarser level derived exactly from the level below (each parent =
    sum of its four children). The SQL mirror re-aggregates each
    level independently from the same base GROUP BY — the two
    derivations agree iff the level-by-level coarsening is exact."""
    from engine.pyramid import tile_pyramid_events

    ds = _read(sf_dir, "events", ["event_id", "value"])
    return tile_pyramid_events(ds)


def _pyramid_sql_gate() -> str:
    from engine.pyramid import sql_tile_pyramid_events

    return sql_tile_pyramid_events()


REGISTRY.update(
    {"tile_pyramid_events": (q_tile_pyramid_events, _pyramid_sql_gate())}
)


# ---------------------------------- X62: rectangle-overlap spatial join


def q_rect_join_orders(sf_dir: str) -> Dataset:
    """Exact rectangle-overlap spatial join (X62, engine/rectjoin.py):
    two rect sets derived from order/part keys by shared LCG
    constants, PBSM tile replication + reference-point dedup (each
    qualifying pair emitted only by the tile holding the
    intersection's min corner), exact closed-interval intersection
    areas. The SQL mirror runs the plain cross-join overlap predicate
    — no tiles, no replication — so agreement checks the dedup rule
    itself."""
    from engine.rectjoin import rect_join_gate

    o = _read(sf_dir, "orders", ["o_orderkey"])
    p = _read(sf_dir, "part", ["p_partkey"])
    return rect_join_gate(o, p)


def _rect_join_sql_gate() -> str:
    from engine.rectjoin import sql_rect_join

    return sql_rect_join()


REGISTRY.update({"rect_join_orders": (q_rect_join_orders, _rect_join_sql_gate())})


# ---------------------------------------- X63: cohort retention triangle


def q_cohort_retention(sf_dir: str) -> Dataset:
    """Cohort retention analysis (X63, engine/cohort.py): day-period
    first-touch cohorts over events, distinct-active counts per
    (cohort, offset) — the engine fuses distinct pairs + per-user MIN
    + offset emit into ONE user co-partition; the DuckDB mirror runs
    the four-op relational plan (DISTINCT, MIN, JOIN, COUNT), so
    agreement checks the fusion."""
    from engine.cohort import cohort_retention

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return cohort_retention(ds)


def _cohort_sql_gate() -> str:
    from engine.cohort import sql_cohort_retention

    return sql_cohort_retention()


REGISTRY.update({"cohort_retention": (q_cohort_retention, _cohort_sql_gate())})


# ---------------------------------------- X64: grouped Pareto skyline


def q_skyline_events(sf_dir: str) -> Dataset:
    """Grouped 2-D Pareto skyline (X64, engine/skyline.py): per
    event_type, the dominance frontier of (value-cents, epoch-us) —
    local-prune partials + segmented-prefix-max kernel in one group
    co-partition; the DuckDB mirror is the quadratic NOT EXISTS
    dominance anti-join, so agreement checks the kernel itself."""
    from engine.skyline import skyline_events

    ds = _read(sf_dir, "events", ["event_type", "value", "ts"])
    return skyline_events(ds)


def _skyline_sql_gate() -> str:
    from engine.skyline import sql_skyline_events

    return sql_skyline_events()


REGISTRY.update({"skyline_events": (q_skyline_events, _skyline_sql_gate())})


# ---------------------------------------- X65: interval-concurrency sweep


def q_sweep_concurrency(sf_dir: str) -> Dataset:
    """Interval-concurrency sweep (X65, engine/sweep.py): per-day max
    simultaneously-open intervals over events — two-pass global-carry
    prefix sum (range partials -> driver bases -> one co-partition);
    the DuckDB mirror runs ONE globally ordered window (the plan the
    engine avoids), so agreement checks the carry."""
    from engine.sweep import sweep_concurrency_events

    ds = _read(sf_dir, "events", ["ts", "value"])
    return sweep_concurrency_events(ds)


def _sweep_sql_gate() -> str:
    from engine.sweep import sql_sweep_concurrency

    return sql_sweep_concurrency()


REGISTRY.update({"sweep_concurrency": (q_sweep_concurrency, _sweep_sql_gate())})


# ---------------------------------------- X66: exact edit-distance join


def q_edit_join_docs(sf_dir: str) -> Dataset:
    """Exact edit-distance similarity join (X66, engine/editjoin.py):
    PassJoin pigeonhole segments + position-window probes + one
    segment co-partition + vectorized exact-DP verify over distinct
    blocking keys; the DuckDB mirror is the brute levenshtein()
    self-join, so agreement checks the whole candidate machinery."""
    from engine.editjoin import edit_join_docs

    ds = _read(sf_dir, "documents", ["source", "lang", "n_chars"])
    return edit_join_docs(ds)


def _edit_join_sql_gate() -> str:
    from engine.editjoin import sql_edit_join_docs

    return sql_edit_join_docs()


REGISTRY.update({"edit_join_docs": (q_edit_join_docs, _edit_join_sql_gate())})


# ---------------------------------------- X67: sorted-neighborhood blocking


def q_snm_pairs_docs(sf_dir: str) -> Dataset:
    """Sorted-neighborhood blocking (X67, engine/snm.py): ER candidate
    pairs within a w=5 window of the global (n_chars, doc_id) order —
    two-pass distributed rank + halo-replicated rank blocks; the
    DuckDB mirror runs ONE global ROW_NUMBER sort + rank-band
    self-join, so agreement checks the rank and the halo rule."""
    from engine.snm import snm_pairs_docs

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return snm_pairs_docs(ds)


def _snm_sql_gate() -> str:
    from engine.snm import sql_snm_pairs_docs

    return sql_snm_pairs_docs()


REGISTRY.update({"snm_pairs_docs": (q_snm_pairs_docs, _snm_sql_gate())})


# ---------------------------------------- X68: ordered grouped aggregation


def q_string_agg_orders(sf_dir: str) -> Dataset:
    """Order-sensitive grouped aggregation (X68, engine/ordagg.py):
    per order-priority, string_agg of order keys in ascending order —
    the NON-COMMUTATIVE aggregate kind (block partials cannot merge
    orderlessly); one key co-partition + vectorized lexsort + a
    single Arrow binary_join over group offsets."""
    from engine.ordagg import string_agg_orders

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderkey"])
    return string_agg_orders(ds)


def _string_agg_sql_gate() -> str:
    from engine.ordagg import sql_string_agg_orders

    return sql_string_agg_orders()


REGISTRY.update({"string_agg_orders": (q_string_agg_orders, _string_agg_sql_gate())})


# ---------------------------------------- X69: exact global k-th selection


def q_global_kth_events(sf_dir: str):
    """Exact distributed global selection (X69, engine/kselect.py):
    p25/p50/p75/p99 of events value-milli by iterative histogram
    narrowing (no global sort; <= 7 driver-synced rounds); the DuckDB
    mirror runs the ORDER BY + OFFSET sort plan per rank."""
    from engine.kselect import global_kth_events

    ds = _read(sf_dir, "events", ["value"])
    return global_kth_events(ds)


def _global_kth_sql_gate() -> str:
    from engine.kselect import sql_global_kth_events

    return sql_global_kth_events()


REGISTRY.update({"global_kth_events": (q_global_kth_events, _global_kth_sql_gate())})


# ---------------------------------------- X70: Markov transition counts


def q_transitions_events(sf_dir: str) -> Dataset:
    """Markov transition counts (X70, engine/transitions.py): per-user
    adjacent event-type bigrams under the (ts, event_id) order — one
    user co-partition, lexsort + shift-mask adjacency (no per-user
    loop); the DuckDB mirror runs the LAG window plan."""
    from engine.transitions import transition_counts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    return transition_counts(ds)


def _transitions_sql_gate() -> str:
    from engine.transitions import sql_transition_counts

    return sql_transition_counts()


REGISTRY.update(
    {"transitions_events": (q_transitions_events, _transitions_sql_gate())}
)


# ---------------------------------------- X71: rolling-window distinct users


def q_rolling_active_users(sf_dir: str) -> Dataset:
    """Rolling 7-day active users (X71, engine/rolling.py): trailing-
    window distinct counts — deduped (user, day) pairs replicated x7,
    one window-day co-partition with packed-unique re-dedup; the
    DuckDB mirror replicates via unnest(range) + COUNT(DISTINCT)."""
    from engine.rolling import rolling_active_users

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return rolling_active_users(ds)


def _rolling_sql_gate() -> str:
    from engine.rolling import sql_rolling_active_users

    return sql_rolling_active_users()


REGISTRY.update(
    {"rolling_active_users": (q_rolling_active_users, _rolling_sql_gate())}
)


# ---------------------------------------- X72: sorted export (ORDER BY sink)


def q_sorted_export_events(sf_dir: str):
    """Globally-sorted export (X72, engine/sortout.py): events written
    as range-partitioned sorted parquet via SAMPLED splits (TeraSort
    shape — equal-width ranges would hot-spot on skew), then read back
    with the global rank attached; the DuckDB mirror recomputes the
    rank as ROW_NUMBER() OVER (ORDER BY key), value-checking the
    write -> read -> rank chain end to end. Sort key = unique packed
    (value_milli, event_id), so the rank map is layout-independent."""
    import os
    import shutil

    import pyarrow.compute as pc

    from engine.sortout import ranked_rows, sorted_export

    ds = _read(sf_dir, "events", ["event_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        m = pc.cast(
            pc.round(pc.multiply(b["value"], 1000.0), round_mode="half_towards_infinity"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        e = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(e) and (e.min() < 0 or e.max() >= (1 << 25) or m.min() < 0):
            raise ValueError("sorted_export gate: packing contract")
        return pa.table({"key": m * (1 << 25) + e, "event_id": e})

    keyed = ds.map_batches(prep, batch_format="pyarrow")
    # Unique per-run dir: two concurrent runs over the same sf_dir
    # (parallel test workers) must not rmtree/overwrite each other's
    # partition files mid-read (ADVICE r4). sorted_export itself
    # documents the single-node shared-filesystem assumption.
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="geokit_sorted_export_")
    try:
        manifest = sorted_export(
            keyed, col="key", out_dir=out_dir, num_partitions=16,
            keep_cols=["event_id"],
        )
        return ranked_rows(out_dir, manifest, "key", ["event_id"])
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def _sorted_export_sql_gate() -> str:
    return """
WITH v AS (
  SELECT event_id, CAST(ROUND(value * 1000) AS BIGINT) AS m FROM events)
SELECT m * 33554432 + event_id AS key, event_id,
       ROW_NUMBER() OVER (ORDER BY m * 33554432 + event_id) - 1 AS "rank"
FROM v
"""


REGISTRY.update(
    {"sorted_export_events": (q_sorted_export_events, _sorted_export_sql_gate())}
)
