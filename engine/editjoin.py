"""Exact edit-distance similarity self-join (X66) — PassJoin-style.

Character-level string similarity: over a DISTINCT key set, emit every
unordered pair (ka < kb) with Levenshtein distance <= max_dist, plus
the exact distance. This completes the similarity-join family by
criterion: set overlap (Jaccard, shingle inverted index), bit
proximity (SimHash bands), sketch agreement (MinHash) — X66 is the
EDIT-metric member, which none of those can express (a single
character insertion shifts every downstream shingle).

Candidate generation is the PassJoin pigeonhole (Li, Deng, Feng:
"PassJoin: a partition-based method for similarity joins", PVLDB
2011 — public literature): split each indexed key into D+1 segments;
if ed(r, s) <= D, at least one segment of s is untouched by any edit
and therefore appears VERBATIM in r, contiguously, displaced by at
most D positions (the net insert-delete drift before it). So:

  index side: key s of length l emits its D+1 segments
              (hash, seg_idx, l);
  probe side: key r probes, for every indexed length
              l_s in [max(D+1, l_r - D), l_r] and every segment i,
              the substrings of r at the segment's home position
              +/- D (<= (D+1)(2D+1)(D+1) = 45 probe rows at D = 2);
  equal-length pairs are found from both directions, longer-vs-
  shorter only from the longer probe — a pair-level dedup follows.

Keys shorter than D+1 cannot host D+1 non-empty segments; any partner
within distance D then has length <= 2D+1, so ALL keys of length
<= 2D+1 also go to one reserved SHORT bucket joined all-pairs
(bounded: raises beyond 100k short keys rather than go quadratic).

One (hash, seg_idx, l) co-partition matches probes to indexes (key
strings ride along, <= key-length bytes — never documents); one pair
co-partition dedups (a pair can arrive from several segments) and
VERIFIES with an exact vectorized DP over the pair axis, so hash
collisions and pigeonhole false positives cost work, never
correctness. A corpus whose keys share ultra-common segments
(structured ids) makes hot (hash, seg, l) groups quadratic in their
df — the documented worst case (the jaccard max_df analogue); the
position-window Delta already prunes it and the verify is exact
regardless.

Contract: keys are ASCII (<= 0x80) and <= 64 bytes — the DP and the
segment hashes run on BYTES while DuckDB's levenshtein counts
CODEPOINTS; both agree exactly on ASCII (asserted, loud).

Upstream parity: no analogue in GeoCoordinateConverter; brief-mandated
dedup/similarity machinery (near-dup keys, typo-tolerant entity
blocking over web corpora).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_FNV = np.uint64(1099511628211)
_KEY_CAP = 64
_SHORT_CAP = 100_000
# loud ceiling on one (hash, seg, len) group's candidate cross — hit
# only by corpora where huge key sets share an identical segment at
# the same position (e.g. sequential zero-padded ids: every key's
# first segment is the constant prefix). That case is quadratic for
# ANY segment-pigeonhole filter; the mitigation is a key transform
# (hash/reverse the constant prefix away), so fail with the message
# rather than silently grinding.
_GROUP_CROSS_CAP = 50_000_000


def _pad_matrix(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """list/array of ASCII str -> (N x KEY_CAP uint8 matrix, lengths)."""
    joined = "".join(keys.tolist()).encode("ascii")  # raises on non-ASCII
    lens = np.fromiter((len(k) for k in keys), np.int64, len(keys))
    if lens.size and lens.max() > _KEY_CAP:
        raise ValueError(f"editjoin: key longer than {_KEY_CAP} bytes")
    flat = np.frombuffer(joined, np.uint8)
    mat = np.zeros((len(keys), _KEY_CAP), np.uint8)
    ends = np.cumsum(lens)
    take = np.repeat(ends - lens, lens) + (
        np.arange(lens.sum()) - np.repeat(ends - lens, lens)
    )
    rows = np.repeat(np.arange(len(keys)), lens)
    cols = np.arange(int(lens.sum())) - np.repeat(ends - lens, lens)
    mat[rows, cols] = flat[take]
    return mat, lens


def _prefix_hashes(mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Rolling-polynomial prefix hashes H[:, j] over the first j bytes
    (uint64 wraparound); substring hash = H[e] - H[s] * FNV^(e-s)."""
    n, L = mat.shape
    H = np.zeros((n, L + 1), np.uint64)
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        for j in range(L):
            H[:, j + 1] = (
                H[:, j] * _FNV + mat[:, j].astype(np.uint64) + np.uint64(1)
            )
    return H


def _pow_table(L: int) -> np.ndarray:
    p = np.ones(L + 1, np.uint64)
    with np.errstate(over="ignore"):
        for i in range(1, L + 1):
            p[i] = p[i - 1] * _FNV
    return p


def _seg_bounds(lens: np.ndarray, i: int, d: int):
    """Start/length of segment i when a length-l key splits into d+1
    even segments (first l % (d+1) segments one longer)."""
    base = lens // (d + 1)
    rem = lens % (d + 1)
    seg_len = base + (i < rem)
    start = i * base + np.minimum(i, rem)
    return start, seg_len


def levenshtein_batch(
    a_mat: np.ndarray,
    a_len: np.ndarray,
    b_mat: np.ndarray,
    b_len: np.ndarray,
) -> np.ndarray:
    """Exact Levenshtein per pair, vectorized over the PAIR axis —
    full Wagner-Fischer over the padded byte matrices; cell (i, j)
    depends only on the i/j prefixes, so padding beyond
    (a_len, b_len) never leaks into the gathered result."""
    n = a_mat.shape[0]
    if n == 0:
        return np.zeros(0, np.int64)
    # trim the padded grid to the batch's real max length — the DP is
    # O(L^2) numpy calls, so running the full 64-byte pad for 10-char
    # keys would cost 40x the useful work (measured 2.06 s -> 60 ms
    # on 26k pairs of 10-char keys)
    L = int(max(a_len.max(), b_len.max(), 1))
    a_mat = a_mat[:, :L]
    b_mat = b_mat[:, :L]
    dp = np.tile(np.arange(L + 1, dtype=np.int16), (n, 1))
    final = dp.copy()  # row i = 0 result for a_len == 0 pairs
    idx = np.arange(n)
    for i in range(1, L + 1):
        prev = dp
        dp = np.empty_like(prev)
        dp[:, 0] = i
        cost = (a_mat[:, i - 1][:, None] != b_mat).astype(np.int16)
        for j in range(1, L + 1):
            dp[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, dp[:, j - 1] + 1),
                prev[:, j - 1] + cost[:, j - 1],
            )
        hit = a_len == i
        if hit.any():
            final[hit] = dp[hit]
    return final[idx, b_len].astype(np.int64)


_PAIR_SCHEMA = pa.schema(
    [("ka", pa.string()), ("kb", pa.string()), ("dist", pa.int64())]
)


def edit_distance_join(
    ds_keys: Dataset,
    *,
    key_col: str = "key",
    max_dist: int = 2,
    num_partitions: int = 32,
) -> Dataset:
    """Self-join Dataset[ka, kb, dist] over the DISTINCT values of
    ``key_col`` with Levenshtein(ka, kb) <= max_dist and ka < kb.
    See module docstring for the PassJoin shape."""
    from engine.shuffle import grouped_count_sums, keyed_partition_map

    d = int(max_dist)
    short_lim = 2 * d + 1

    distinct = grouped_count_sums(
        ds_keys, key_col, num_partitions=num_partitions
    ).map_batches(
        lambda b: b.select([key_col]), batch_format="pyarrow"
    )

    def gen(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return pa.table(
                {
                    "hk": pa.array([], pa.int64()),
                    "role": pa.array([], pa.int8()),
                    "key": pa.array([], pa.string()),
                }
            )
        mat, lens = _pad_matrix(keys)
        H = _prefix_hashes(mat, lens)
        POW = _pow_table(_KEY_CAP)
        out_hk: list[np.ndarray] = []
        out_role: list[np.ndarray] = []
        out_key: list[np.ndarray] = []

        def sub_hash(rows, start, ln):
            e = start + ln
            with np.errstate(over="ignore"):
                return H[rows, e] - H[rows, start] * POW[ln]

        def pack(h, i, l):
            with np.errstate(over="ignore"):
                mix = h ^ (np.uint64(i + 1) * np.uint64(0x9E3779B97F4A7C15))
                mix ^= l.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
            return mix.astype(np.int64)

        rows_all = np.arange(len(keys))
        # ---- index side: own D+1 segments (keys long enough only)
        long_rows = rows_all[lens >= d + 1]
        for i in range(d + 1):
            start, ln = _seg_bounds(lens[long_rows], i, d)
            h = sub_hash(long_rows, start, ln)
            out_hk.append(pack(h, i, lens[long_rows]))
            out_role.append(np.zeros(len(long_rows), np.int8))
            out_key.append(keys[long_rows])
        # ---- probe side: indexed lengths [max(d+1, l-d) .. l]
        for delta in range(d + 1):  # l_s = l - delta
            ls = lens - delta
            ok_l = ls >= d + 1
            for i in range(d + 1):
                s_start, s_len = _seg_bounds(np.maximum(ls, 1), i, d)
                for off in range(-d, d + 1):
                    p = s_start + off
                    ok = ok_l & (p >= 0) & (p + s_len <= lens)
                    r = rows_all[ok]
                    if len(r) == 0:
                        continue
                    h = sub_hash(r, p[ok], s_len[ok])
                    out_hk.append(pack(h, i, ls[ok]))
                    out_role.append(np.ones(len(r), np.int8))
                    out_key.append(keys[r])
        # ---- SHORT bucket: every key of length <= 2d+1, both roles
        sh = rows_all[lens <= short_lim]
        if len(sh):
            out_hk.append(np.full(len(sh), np.int64(-(2**62)), np.int64))
            out_role.append(np.full(len(sh), np.int8(2)))
            out_key.append(keys[sh])
        return pa.table(
            {
                "hk": pa.array(np.concatenate(out_hk)),
                "role": pa.array(np.concatenate(out_role)),
                "key": pa.array(
                    np.concatenate(out_key), pa.string()
                ),
            }
        )

    cand_rows = distinct.map_batches(gen, batch_format="pyarrow")

    pair_schema = pa.schema([("ka", pa.string()), ("kb", pa.string())])

    def match(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "hk" not in df.columns:
            return pd.DataFrame({"ka": pd.Series(dtype=object), "kb": pd.Series(dtype=object)})
        pairs_a: list[np.ndarray] = []
        pairs_b: list[np.ndarray] = []
        short = df[df.role == 2]
        if len(short):
            if len(short) > _SHORT_CAP:
                raise ValueError("editjoin: SHORT bucket beyond cap")
            ks = np.unique(short.key.to_numpy())
            ia, ib = np.triu_indices(len(ks), k=1)
            pairs_a.append(ks[ia])
            pairs_b.append(ks[ib])
        rest = df[df.role != 2]
        if len(rest):
            # per-(hk) group cross of (index rows x probe rows); the
            # loop is over CANDIDATE segment groups, not corpus rows
            rest = rest.sort_values(["hk", "role"], kind="stable")
            hk = rest.hk.to_numpy()
            role = rest.role.to_numpy()
            key = rest.key.to_numpy()
            starts = np.flatnonzero(np.r_[True, hk[1:] != hk[:-1]])
            ends = np.append(starts[1:], len(hk))
            for s, e in zip(starts, ends):
                r = role[s:e]
                nidx = int((r == 0).sum())
                if nidx == 0 or nidx == e - s:
                    continue
                ik = np.unique(key[s:e][r == 0])
                pk = np.unique(key[s:e][r == 1])
                if len(ik) * len(pk) > _GROUP_CROSS_CAP:
                    raise ValueError(
                        "editjoin: one segment group would cross "
                        f"{len(ik)}x{len(pk)} candidates — a huge key set "
                        "shares an identical segment (constant prefix?); "
                        "transform keys (hash/strip the shared prefix) "
                        "before joining"
                    )
                a = np.repeat(ik, len(pk))
                bb = np.tile(pk, len(ik))
                keep = a != bb
                pairs_a.append(a[keep])
                pairs_b.append(bb[keep])
        if not pairs_a:
            return pd.DataFrame({"ka": pd.Series(dtype=object), "kb": pd.Series(dtype=object)})
        a = np.concatenate(pairs_a)
        b = np.concatenate(pairs_b)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pd.DataFrame({"ka": lo, "kb": hi}).drop_duplicates()

    pairs = keyed_partition_map(
        cand_rows, ["hk"], match, num_partitions, out_schema=pair_schema
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "ka" not in df.columns:
            return pd.DataFrame(
                {
                    "ka": pd.Series(dtype=object),
                    "kb": pd.Series(dtype=object),
                    "dist": pd.Series(dtype=np.int64),
                }
            )
        df = df.drop_duplicates(["ka", "kb"])  # across-partition arrivals
        a_mat, a_len = _pad_matrix(df.ka.to_numpy())
        b_mat, b_len = _pad_matrix(df.kb.to_numpy())
        dist = levenshtein_batch(a_mat, a_len, b_mat, b_len)
        keep = dist <= d
        return pd.DataFrame(
            {
                "ka": df.ka.to_numpy()[keep],
                "kb": df.kb.to_numpy()[keep],
                "dist": dist[keep],
            }
        )

    return keyed_partition_map(
        pairs, ["ka", "kb"], verify, num_partitions, out_schema=_PAIR_SCHEMA
    )


def edit_join_docs(ds_documents: Dataset) -> Dataset:
    """Gate pipeline: typo-tolerant blocking-key join — keys
    ``source-lang-(n_chars // 100)`` (297 distinct at sf0.01, 7k+
    live pairs at D = 2: digit substitutions, 1- vs 2-digit
    insertions, source/lang near-misses)."""

    def mk(b: pa.Table) -> pa.Table:
        bucket = pc.cast(
            pc.divide(b["n_chars"], 100), pa.int64()
        )  # int floor division
        key = pc.binary_join_element_wise(
            b["source"], b["lang"], pc.cast(bucket, pa.string()), "-"
        )
        return pa.table({"key": key})

    keys = ds_documents.map_batches(mk, batch_format="pyarrow")
    return edit_distance_join(keys, key_col="key", max_dist=2)


def sql_edit_join_docs() -> str:
    """DuckDB mirror: brute DISTINCT-key self-join on the builtin
    levenshtein() — no segments, no windows, no hashes — so agreement
    checks the whole pigeonhole + verify machinery."""
    return """
WITH k AS (
  SELECT DISTINCT source || '-' || lang || '-'
         || CAST(n_chars // 100 AS VARCHAR) AS key
  FROM documents)
SELECT a.key AS ka, b.key AS kb,
       CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
FROM k a JOIN k b ON a.key < b.key
WHERE levenshtein(a.key, b.key) <= 2
"""
