"""Similarity search over an embedding column (task mandate):

- ``brute_topk``: exact cosine top-k — per-batch numpy matmul against
  a broadcast query matrix, per-batch partial top-k, tiny final merge.
  The baseline and the oracle for the approximate paths.
- ``IvfIndex`` + ``ivf_topk``: IVF-style approximate search — k-means
  centroids (fixed seeded Lloyd iterations, trained once on a sample),
  per-batch assignment, probe only the nprobe closest lists. The
  100 TB shape: centroids broadcast, each batch scans only its
  resident rows, candidate lists shuffle nothing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def _topk_tie_safe(sims: np.ndarray, kk: int) -> np.ndarray:
    """Indices of the top-kk sims INCLUDING all boundary ties: a bare
    argpartition keeps an arbitrary kk rows when several candidates
    tie exactly at the cut, which can drop the tied row with the
    smaller id before the driver merge and diverge from the oracle's
    deterministic (cos DESC, id) order. Returning every row >= the
    kth value makes the partial a superset of any tie-broken top-kk;
    the final merge applies the exact order."""
    if kk >= len(sims):
        return np.arange(len(sims))
    part = np.argpartition(-sims, kth=kk - 1)
    thresh = sims[part[kk - 1]]
    return np.flatnonzero(sims >= thresh)


def _emb_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def _unit(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_topk(
    ds: Dataset,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: set | None = None,
) -> pd.DataFrame:
    """Exact cosine top-k of ``query`` over the dataset. Per-batch
    partials (k rows each) stream to the driver; the final merge is
    over n_batches*k rows, not the corpus. Returns (vec_id, cos_milli,
    rank) sorted by (-cos, id)."""
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _unit(_emb_matrix(batch, vec_col))
        sims = m @ q
        kk = min(k + (len(exclude_ids) if exclude_ids else 0), len(ids))
        top = _topk_tie_safe(sims, kk)
        return pa.table(
            {
                id_col: pa.array(ids[top]),
                "cos": pa.array(sims[top]),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if exclude_ids:
        parts = parts[~parts[id_col].isin(exclude_ids)]
    parts = parts.sort_values(["cos", id_col], ascending=[False, True], kind="stable").head(k)
    out = pd.DataFrame(
        {
            id_col: parts[id_col].to_numpy(),
            "cos_milli": np.floor(parts["cos"].to_numpy() * 1000 + 0.5).astype(np.int64),
            "rank": np.arange(1, len(parts) + 1, dtype=np.int64),
        }
    )
    return out


def train_sample(
    ds: Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target: int = 2000,
) -> np.ndarray:
    """Distributed deterministic hash-sample of the embedding column
    for k-means training — the 100 TB shape: each batch keeps rows
    whose well-mixed id hash lands in a 1/D stratum (stable under
    repartitioning, no coordination), and only the ~``target``-row
    sample is ever collected. Replaces the round-2 path that read the
    whole table driver-side and positionally sliced the first 2000
    rows (positional slices are also not a row-order contract)."""
    total = ds.count()
    D = max(1, total // max(1, target))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        iv = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        h = (iv * np.int64(-7046029254386353131)) >> np.int64(32)
        return batch.filter(pa.array(h % np.int64(D) == 0))

    batches = list(
        ds.map_batches(keep, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    batches = [b for b in batches if b.num_rows]
    if not batches:  # degenerate tiny input: fall back to everything
        batches = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    tbl = pa.concat_tables(batches, promote_options="default")
    # Sort by id: the kept SET is partition-independent but arrival
    # ORDER is not, and k-means init draws by row position — without
    # this, centroids (and every downstream cluster id) would vary
    # with the physical block layout.
    import pyarrow.compute as _pc

    tbl = tbl.take(_pc.sort_indices(tbl, sort_keys=[(id_col, "ascending")]))
    return _emb_matrix(tbl, vec_col)


class IvfIndex:
    """Seeded fixed-iteration Lloyd k-means over a training sample.
    Centroids are tiny -> broadcast to every batch."""

    def __init__(self, train: np.ndarray, n_lists: int = 16, iters: int = 10, seed: int = 9):
        rng = np.random.default_rng(seed)
        t = _unit(np.asarray(train, dtype=np.float64))
        init = t[rng.choice(len(t), size=min(n_lists, len(t)), replace=False)]
        c = init.copy()
        for _ in range(iters):
            assign = np.argmax(t @ c.T, axis=1)
            for j in range(len(c)):
                members = t[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
            c = _unit(c)
        self.centroids = c

    def assign(self, m: np.ndarray) -> np.ndarray:
        return np.argmax(_unit(m) @ self.centroids.T, axis=1)


def ivf_topk(
    ds: Dataset,
    index: IvfIndex,
    query: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: set | None = None,
) -> pd.DataFrame:
    """Approximate top-k: scan only rows whose IVF list is among the
    query's ``nprobe`` closest centroids. Same output contract as
    brute_topk (approximation may differ — pytest measures recall)."""
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    probe = set(np.argsort(-(index.centroids @ q))[:nprobe].tolist())

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _unit(_emb_matrix(batch, vec_col))
        lists = index.assign(m)
        mask = np.isin(lists, list(probe))
        if not mask.any():
            return pa.table({id_col: pa.array(ids[:0]), "cos": pa.array(np.zeros(0))})
        ids = ids[mask]
        sims = m[mask] @ q
        kk = min(k + (len(exclude_ids) if exclude_ids else 0), len(ids))
        top = _topk_tie_safe(sims, kk)
        return pa.table({id_col: pa.array(ids[top]), "cos": pa.array(sims[top])})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if exclude_ids:
        parts = parts[~parts[id_col].isin(exclude_ids)]
    parts = parts.sort_values(["cos", id_col], ascending=[False, True], kind="stable").head(k)
    return pd.DataFrame(
        {
            id_col: parts[id_col].to_numpy(),
            "cos_milli": np.floor(parts["cos"].to_numpy() * 1000 + 0.5).astype(np.int64),
            "rank": np.arange(1, len(parts) + 1, dtype=np.int64),
        }
    )


def brute_topk_many(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k for MANY queries at once — the broadcast-
    query-matrix shape: each batch does ONE (batch, dim) @ (dim, q)
    matmul and emits k partial rows per query; the driver-side final
    merge touches n_batches*q*k rows, never the corpus. Returns
    (query_id, vec_id, cos_milli, rank)."""
    Q = _unit(np.asarray(queries, dtype=np.float64))  # (q, dim)
    nq = len(Q)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _unit(_emb_matrix(batch, vec_col))
        sims = m @ Q.T  # (n, q)
        kk = min(k, len(ids))
        if kk >= len(ids):
            rows, qcols = np.nonzero(np.ones_like(sims, dtype=bool))
        else:
            # Per-query kth value, then keep ALL rows >= it (boundary
            # ties included — see _topk_tie_safe).
            part = np.argpartition(-sims, kth=kk - 1, axis=0)
            thr = sims[part[kk - 1, :], np.arange(nq)]
            rows, qcols = np.nonzero(sims >= thr[None, :])
        return pa.table(
            {
                "query_id": pa.array(qcols.astype(np.int64)),
                id_col: pa.array(ids[rows]),
                "cos": pa.array(sims[rows, qcols]),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["query_id", "cos", id_col], ascending=[True, False, True], kind="stable"
    )
    parts = parts.groupby("query_id", sort=True).head(k)
    parts["rank"] = parts.groupby("query_id").cumcount() + 1
    return pd.DataFrame(
        {
            "query_id": parts["query_id"].to_numpy(),
            id_col: parts[id_col].to_numpy(),
            "cos_milli": np.floor(parts["cos"].to_numpy() * 1000 + 0.5).astype(np.int64),
            "rank": parts["rank"].to_numpy().astype(np.int64),
        }
    )


def semantic_clusters(
    ds: Dataset,
    n_lists: int = 16,
    threshold: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 9,
    num_partitions: int = 16,
) -> Dataset:
    """SemDeDup-style semantic clustering over an embedding column
    (Abbas et al. 2023 shape): k-means cluster assignment plus an
    optional within-cluster near-duplicate verdict.

    1. TRAIN — k-means on a distributed hash sample (``train_sample``;
       only the sample is collected), centroids broadcast via the
       IvfIndex kernel.
    2. ASSIGN — per-batch argmax-cosine against the broadcast
       centroids, zero shuffles; adds ``cluster_id`` and
       ``cos_center_milli`` (cosine to the assigned centroid,
       quantized to milli — raw float dot products differ in the last
       ulp across batch shapes because BLAS reduction order follows
       the matrix shape, so a float column could not be
       repartition-deterministic; the repo-wide quantize idiom).
    3. VERDICT (when ``threshold`` is given) — ONE keyed co-location
       shuffle on cluster_id carrying (id, embedding) — ~1 KB/row at
       128 dims; within each cluster the keep rule is deterministic:
       ``keep(x) = no member y with id < x has cos(x, y) >= threshold``
       (a duplicate CLIQUE keeps exactly its min id; a chain drops
       every non-first member — the pairwise-ball rule SemDeDup
       implementations use). Pairwise cost is O(c^2) per cluster —
       bounded by cluster size, which n_lists controls; that bound is
       the point of clustering first (the corpus-scale alternative
       without it is the hyperplane-LSH path in engine.dedupe).

    Returns Dataset[id_col, cluster_id, cos_center_milli(, keep)]."""
    import pandas as pd

    from engine.shuffle import keyed_partition_map

    index = IvfIndex(train_sample(ds, id_col=id_col, vec_col=vec_col),
                     n_lists=n_lists, seed=seed)
    cent = index.centroids

    def assign(b: pa.Table) -> pa.Table:
        m = _unit(_emb_matrix(b, vec_col))
        sims = m @ cent.T
        cl = np.argmax(sims, axis=1).astype(np.int64)
        cos = sims[np.arange(len(cl)), cl]
        out = pa.table(
            {
                id_col: b[id_col],
                "cluster_id": pa.array(cl),
                "cos_center_milli": pa.array(
                    np.floor(cos * 1000 + 0.5).astype(np.int64)
                ),
            }
        )
        if threshold is not None:
            out = out.append_column(vec_col, b[vec_col])
        return out

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    if threshold is None:
        return assigned

    def verdict(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby("cluster_id", sort=False):
            g = g.sort_values(id_col, kind="stable")
            m = _unit(np.stack(g[vec_col].to_numpy()).astype(np.float64))
            sims = m @ m.T
            earlier_hit = np.triu(sims >= threshold, k=1).any(axis=0)
            out.append(
                pd.DataFrame(
                    {
                        id_col: g[id_col].to_numpy(),
                        "cluster_id": g["cluster_id"].to_numpy(),
                        "cos_center_milli": g["cos_center_milli"].to_numpy(),
                        "keep": ~earlier_hit,
                    }
                )
            )
        return (
            pd.concat(out)
            if out
            else pd.DataFrame(
                {
                    id_col: [],
                    "cluster_id": [],
                    "cos_center_milli": [],
                    "keep": [],
                }
            )
        )

    return keyed_partition_map(
        assigned,
        ["cluster_id"],
        verdict,
        num_partitions=num_partitions,
        out_schema=pa.schema(
            [
                (id_col, pa.int64()),
                ("cluster_id", pa.int64()),
                ("cos_center_milli", pa.int64()),
                ("keep", pa.bool_()),
            ]
        ),
    )
