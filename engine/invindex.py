"""Sharded inverted-index construction (X53) — posting lists.

The search-/retrieval-side op of a web-text pipeline: token →
posting list of (doc_id, tf). Scale shape:

- Map side: ``doc_token_tf_partials`` (the tfidf/doc_token_stats
  combiner — split + flatten + one C-speed groupby per block; a doc's
  rows never split across blocks, so per-(doc, token) tfs are exact
  per block).
- Shard key: ``shard = doc_id % n_shards`` is attached BEFORE the
  shuffle and rides in the partition key, so no single posting list
  row ever holds a hot term's whole corpus-wide list — the 100 TB
  answer to the "posting list of 'the'" hot-row problem. Real
  deployments pick n_shards so each (term, shard) list fits a block;
  the final index is written partitioned by shard (resumable sink).
- Reduce side: ONE ``keyed_partition_map`` co-partition on
  (token, shard); within a partition the posting strings are built by
  a pandas groupby-agg join — per-group work is proportional to the
  output bytes themselves (you cannot emit a posting list without
  touching its entries), which is the optimal shape for this op.

Postings are emitted as ``"doc:tf"`` comma strings sorted by doc_id —
delta/varint packing would be the production encoding; the string
form keeps the driver gate value-comparable (the DuckDB mirror is
``string_agg(... ORDER BY doc_id)``) and the layout identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

__all__ = ["inverted_postings", "SQL_INVERTED_POSTINGS"]


def inverted_postings(
    ds: Dataset,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
) -> Dataset:
    """Build the sharded inverted index: one row per (token, shard)
    with exact df, summed tf and the doc_id-sorted posting string."""
    from engine.shuffle import keyed_partition_map
    from engine.textops import doc_token_tf_partials

    def tf_with_shard(batch: pa.Table) -> pa.Table:
        t = doc_token_tf_partials(batch, id_col=id_col, text_col=text_col)
        shard = pa.array(
            (t["doc_id"].to_numpy(zero_copy_only=False) % n_shards).astype(np.int64)
        )
        return t.append_column("shard", shard)

    tf = ds.map_batches(tf_with_shard, batch_format="pyarrow")

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["token", "shard", "doc_id"], kind="mergesort")
        df["entry"] = df["doc_id"].astype(str) + ":" + df["tf"].astype(str)
        g = df.groupby(["token", "shard"], sort=False)
        out = g.agg(
            df_shard=("doc_id", "size"),
            tf_sum=("tf", "sum"),
            postings=("entry", ",".join),
        ).reset_index()
        out["df_shard"] = out["df_shard"].astype(np.int64)
        out["tf_sum"] = out["tf_sum"].astype(np.int64)
        return out[["token", "shard", "df_shard", "tf_sum", "postings"]]

    return keyed_partition_map(
        tf,
        ["token", "shard"],
        assemble,
        num_partitions=num_partitions,
        out_schema=pa.schema(
            [
                ("token", pa.string()),
                ("shard", pa.int64()),
                ("df_shard", pa.int64()),
                ("tf_sum", pa.int64()),
                ("postings", pa.string()),
            ]
        ),
    )


# The tokenizer is the proven vocab_topk identity
# (regexp_extract_all('[a-z0-9]+') over lower(text) ≡ the engine's
# split-and-drop-empties); tf per (doc, token) then shard by
# doc_id % 8 and string_agg ordered by doc_id — bitwise the engine's
# sorted ",".join.
SQL_INVERTED_POSTINGS = """
WITH tf AS (
  SELECT doc_id, tok AS token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents)
  GROUP BY doc_id, tok)
SELECT token,
       CAST(doc_id % 8 AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS df_shard,
       CAST(SUM(tf) AS BIGINT) AS tf_sum,
       string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
FROM tf
GROUP BY token, shard
"""
