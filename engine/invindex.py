"""Sharded inverted-index construction (X53) — posting lists.

The search-/retrieval-side op of a web-text pipeline: token →
posting list of (doc_id, tf). Scale shape:

- Map side: ``_doc_token_tf_arrays`` (the tfidf/doc_token_stats tf
  core — split + flatten + dictionary-encode + one np.unique per
  block; a doc's rows never split across blocks, so per-(doc, token)
  tfs are exact per block), then a per-block COMBINER packs each
  distinct (token, shard)'s (doc, tf) pairs into one binary segment —
  the shuffle moves ~vocab × shards rows per block, not occurrences.
- Shard key: ``shard = doc_id % n_shards`` is attached BEFORE the
  shuffle and rides in the partition key, so no single posting list
  row ever holds a hot term's whole corpus-wide list — the 100 TB
  answer to the "posting list of 'the'" hot-row problem. Real
  deployments pick n_shards so each (term, shard) list fits a block;
  the final index is written partitioned by shard (resumable sink).
- Reduce side: ONE ``keyed_partition_map`` co-partition on
  (token, shard); within a partition every posting string is built in
  one lexsort + ListArray + ``binary_join`` pass (no per-group Python
  join) — per-group work is proportional to the output bytes
  themselves (you cannot emit a posting list without touching its
  entries), which is the optimal shape for this op.

Postings are emitted as ``"doc:tf"`` comma strings sorted by doc_id —
delta/varint packing would be the production encoding; the string
form keeps the driver gate value-comparable (the DuckDB mirror is
``string_agg(... ORDER BY doc_id)``) and the layout identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
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
    from engine.textops import _doc_token_tf_arrays

    def segments(batch: pa.Table) -> pa.Table:
        """Map-side COMBINER: one row per DISTINCT (token, shard) in
        the block, carrying that block's (doc, tf) pairs as a packed
        int64-pair binary segment (the _pack_u64_rows idiom, variable
        width). The shuffle then moves ~vocab x shards rows per block
        instead of per-occurrence rows — same payload bytes, ~30x
        fewer rows (measured: 1M-doc soak build 101 -> 51 s)."""
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        doc, code, vocab, tf = _doc_token_tf_arrays(ids, text)
        if doc.size == 0:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "shard": pa.array([], pa.int64()),
                    "seg": pa.array([], pa.binary()),
                }
            )
        shard = doc % n_shards
        order = np.lexsort((doc, shard, code))
        doc, code, tf, shard = doc[order], code[order], tf[order], shard[order]
        n = doc.size
        change = np.ones(n, dtype=bool)
        change[1:] = (code[1:] != code[:-1]) | (shard[1:] != shard[:-1])
        starts = np.flatnonzero(change)
        pairs = np.empty((n, 2), dtype=np.int64)
        pairs[:, 0], pairs[:, 1] = doc, tf
        data = pa.py_buffer(np.ascontiguousarray(pairs).tobytes())
        offsets = pa.py_buffer(
            (np.concatenate([starts, [n]]).astype(np.int64) * 16)
            .astype(np.int32)
            .tobytes()
        )
        seg = pa.BinaryArray.from_buffers(pa.binary(), starts.size, [None, offsets, data])
        return pa.table(
            {
                "token": vocab.take(pa.array(code[starts], pa.int64())),
                "shard": pa.array(shard[starts]),
                "seg": seg,
            }
        )

    tf = ds.map_batches(segments, batch_format="pyarrow")

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        # merge per-block segments: sort rows by (token, shard),
        # concatenate the packed pairs, re-sort each group's pairs by
        # doc_id, then build every posting string in ONE ListArray +
        # binary_join (no per-group Python join).
        tok = df["token"].to_numpy()
        shard = df["shard"].to_numpy().astype(np.int64)
        segs = df["seg"].to_numpy()
        if len(tok) == 0:
            return pd.DataFrame(
                {
                    "token": pd.Series([], dtype=object),
                    "shard": pd.Series([], dtype=np.int64),
                    "df_shard": pd.Series([], dtype=np.int64),
                    "tf_sum": pd.Series([], dtype=np.int64),
                    "postings": pd.Series([], dtype=object),
                }
            )
        order = np.lexsort((shard, tok))
        tok, shard, segs = tok[order], shard[order], segs[order]
        pairs = np.frombuffer(b"".join(segs), dtype=np.int64).reshape(-1, 2)
        seg_pairs = np.fromiter((len(s) for s in segs), dtype=np.int64) // 16
        rchange = np.ones(len(tok), dtype=bool)
        rchange[1:] = (tok[1:] != tok[:-1]) | (shard[1:] != shard[:-1])
        rstarts = np.flatnonzero(rchange)
        # group index per PAIR, then exact (group, doc) order
        grp_of_row = np.cumsum(rchange) - 1
        grp = np.repeat(grp_of_row, seg_pairs)
        porder = np.lexsort((pairs[:, 0], grp))
        doc, tfv, grp = pairs[porder, 0], pairs[porder, 1], grp[porder]
        gstarts = np.concatenate([[0], np.flatnonzero(grp[1:] != grp[:-1]) + 1])
        offsets = np.concatenate([gstarts, [doc.size]]).astype(np.int32)
        entries = np.char.add(np.char.add(doc.astype(str), ":"), tfv.astype(str))
        postings = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), pa.array(entries, pa.string())),
            ",",
        )
        return pd.DataFrame(
            {
                "token": tok[rstarts],
                "shard": shard[rstarts],
                "df_shard": np.diff(offsets).astype(np.int64),
                "tf_sum": np.add.reduceat(tfv, gstarts).astype(np.int64),
                "postings": postings.to_numpy(zero_copy_only=False),
            }
        )

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
