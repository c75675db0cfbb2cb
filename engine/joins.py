"""Relational join strategies (SURVEY.md §2.4-2.5, ray_guide join
patterns).

- ``broadcast_lookup``: the small side (dimension table) is shipped
  once to the object store (``ray.put``) and materialized per worker
  process on first use; the per-batch lookup is a vectorized
  searchsorted / dict gather. No shuffle. This is the shape of every
  join the reference itself performs (static small sides).
- ``hash_join``: explicit partitioned hash join for two large sides:
  add ``bucket = hash(key) % B`` to both, co-group with a single
  ``groupby("bucket").map_groups`` doing an Arrow-native join per
  bucket (int64-exact; pandas merges cast null-filled int columns to
  float64 and corrupt 62-bit ids).
  Documented partitioning assumption: keys are hashable ints/strings;
  hot keys should be pre-salted by the caller (split a hot key into
  sub-buckets on the probe side and replicate the build row).
- ``semi_filter`` / ``anti_filter``: broadcast the key set and filter
  inside map_batches.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset


def broadcast_lookup(
    ds: Dataset,
    small: pa.Table,
    left_key: str,
    right_key: str,
    take_cols: Sequence[str],
    how: str = "left",
) -> Dataset:
    """Map-side join: for each row of ds, attach ``take_cols`` from
    the broadcast ``small`` table matched on key equality. 'inner'
    drops unmatched rows; 'left' leaves nulls."""
    ref = ray.put(small)

    class _Lookup:
        def __init__(self):
            t = ray.get(ref)
            keys = t[right_key].to_numpy(zero_copy_only=False)
            order = np.argsort(keys, kind="stable")
            self.sorted_keys = keys[order]
            self.cols = {
                c: t[c].to_numpy(zero_copy_only=False)[order] for c in take_cols
            }
            self.types = {c: t.schema.field(c).type for c in take_cols}

        def __call__(self, batch: pa.Table) -> pa.Table:
            # Single-chunk the input before appending single-chunk
            # lookup columns: pyarrow 16.1's variadic kernels
            # (pc.coalesce at least) ZIP CHUNKS PAIRWISE when two
            # ChunkedArray args have different chunk layouts, silently
            # misaligning rows (reproduced: a 4-chunk key column + a
            # 1-chunk appended column made downstream coalesce read
            # other rows' values). Aligning here fixes every consumer.
            batch = batch.combine_chunks()
            if len(self.sorted_keys) == 0:  # empty small side
                if how == "inner":
                    return batch.slice(0, 0)
                for c in take_cols:
                    batch = batch.append_column(
                        c, pa.nulls(batch.num_rows, self.types[c])
                    )
                return batch
            k = batch[left_key]
            if isinstance(k, pa.ChunkedArray):
                k = k.combine_chunks()
            kv = k.to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.sorted_keys, kv)
            pos_c = np.clip(pos, 0, len(self.sorted_keys) - 1)
            hit = self.sorted_keys[pos_c] == kv
            if how == "inner":
                batch = batch.filter(pa.array(hit))
                pos_c = pos_c[hit]
                hit = np.ones(len(pos_c), dtype=bool)
            for c in take_cols:
                vals = self.cols[c][pos_c]
                if not hit.all():
                    vals = pd.array(vals)
                    vals[~hit] = None
                    batch = batch.append_column(c, pa.array(vals))
                else:
                    batch = batch.append_column(c, pa.array(vals))
            return batch

    return ds.map_batches(_Lookup, batch_format="pyarrow", concurrency=(1, 8))


def hash_join(
    left: Dataset,
    right: Dataset,
    key: str,
    num_buckets: int = 16,
    how: str = "inner",
) -> Dataset:
    """Partitioned hash join of two Datasets on an equality key.

    Tags each side, buckets rows by ``hash(key) % B``, co-groups the
    union by bucket, and merges each bucket with an Arrow-native join.
    One shuffle total; B bounds per-group memory (size B so the
    largest bucket of the bigger side fits a worker heap).

    Width note: the union requires both sides to carry the UNION
    schema, so each side ships all-null fixed-width padding for the
    other side's columns (~2x shuffle width when both payloads are
    comparable). Acceptable for the narrow join payloads here; for
    wide payloads, project each side to (key, needed cols) before the
    join — or broadcast_lookup when one side fits in the object
    store, which moves no padding at all."""

    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    overlap = (set(l_cols) & set(r_cols)) - {key}
    if overlap:
        raise ValueError(f"non-key column overlap not supported: {overlap}")
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))

    def tag(side: str, missing: dict):
        def fn(batch: pa.Table) -> pa.Table:
            from engine.shuffle import deterministic_key_hash

            # Shared well-mixed hash: the earlier raw Knuth multiply is
            # the identity mod power-of-two bucket counts (2654435761 %
            # 16 == 1), collapsing stride-aligned keys into one bucket.
            hv = deterministic_key_hash(batch, [key])
            b = np.abs(hv % np.int64(num_buckets)).astype(np.int32)
            batch = batch.append_column("_bucket", pa.array(b)).append_column(
                "_side", pa.array(np.full(batch.num_rows, side))
            )
            # Align schemas for union: null-fill the other side's columns.
            for c, t in missing.items():
                batch = batch.append_column(c, pa.nulls(batch.num_rows, t))
            return batch

        return fn

    order = [key] + [c for c in l_cols if c != key] + [c for c in r_cols if c != key] + ["_bucket", "_side"]
    lt = left.map_batches(tag("l", {c: r_types[c] for c in r_cols if c != key}), batch_format="pyarrow").select_columns(order)
    rt = right.map_batches(tag("r", {c: l_types[c] for c in l_cols if c != key}), batch_format="pyarrow").select_columns(order)
    both = lt.union(rt)

    arrow_how = {"inner": "inner", "left": "left outer", "right": "right outer", "outer": "full outer"}[how]

    l_cast = pa.schema([(c, l_types[c]) for c in l_cols])
    r_cast = pa.schema([(c, r_types[c]) for c in r_cols])

    def merge(group: pa.Table) -> pa.Table:
        # Arrow-native join: a pandas merge here silently casts the
        # null-filled union's int64 columns to float64, corrupting
        # values above 2^53 (observed on 62-bit cell ids).
        # The casts pin the declared schema: Ray's pandas<->arrow block
        # conversions can type an all-null/empty column as `null`,
        # which acero joins reject ("Data type null is not supported").
        l = group.filter(pc.equal(group["_side"], "l")).select(l_cols).cast(l_cast)
        r = group.filter(pc.equal(group["_side"], "r")).select(r_cols).cast(r_cast)
        out = l.join(r, keys=key, join_type=arrow_how)
        return out.select(l_cols + [c for c in r_cols if c != key])

    return both.groupby("_bucket").map_groups(merge, batch_format="pyarrow")


def semi_filter(ds: Dataset, keys: np.ndarray, key: str, anti: bool = False) -> Dataset:
    """Semi/anti join: broadcast the key set, filter inside map_batches."""
    ref = ray.put(np.sort(np.asarray(keys)))

    def fn(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        if len(ks) == 0:  # empty key set: semi keeps nothing, anti all
            keep = np.full(batch.num_rows, bool(anti))
            return batch.filter(pa.array(keep))
        k = batch[key]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        kv = k.to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(ks, kv), 0, len(ks) - 1)
        hit = ks[pos] == kv
        return batch.filter(pa.array(~hit if anti else hit))

    return ds.map_batches(fn, batch_format="pyarrow")


# --- Bloom-filter semi PREFILTER (huge build sides) --------------------
#
# When the build-side key set is too large to broadcast exactly
# (semi_filter) but the probe side is vastly larger (the 100 TB case:
# filtering a corpus down to LSH candidate endpoints), an m-bit Bloom
# filter gives a constant-memory broadcast with NO false negatives:
# every true match survives; a bounded false-positive fraction of
# non-matches rides along and is dropped by the exact downstream join.
# NEVER use for anti joins — false positives would drop true anti rows.


def _bloom_seeds(k_hashes: int) -> np.ndarray:
    # Derived odd constants (splitmix64 of 1..k) — any distinct odd
    # values decorrelate the k index hashes.
    from engine.sketch import _splitmix64

    return _splitmix64(np.arange(1, k_hashes + 1, dtype=np.uint64)) | np.uint64(1)


def bloom_bits_size(n_keys_hint: int) -> int:
    """m_bits sized at ~16 bits/key (k=5 → ~1% FP), clamped to
    [2^20, 2^27] (128 KiB – 16 MiB of broadcast words)."""
    m = 1 << 20
    while m < 16 * max(n_keys_hint, 1) and m < (1 << 27):
        m <<= 1
    return m


def bloom_build(
    ds: Dataset, key: str, m_bits: int, k_hashes: int = 5
) -> np.ndarray:
    """Distributed Bloom bitset over a key column: per-block partial
    word arrays (uint64), tree-merged by bitwise OR inside map_batches
    (associative/commutative — register-exact like the HLL/CMS
    merges), final OR on the driver over the handful of surviving
    rows. Broadcast cost is m_bits/8 bytes regardless of key count."""
    from engine.sketch import _hash_column, _splitmix64

    n_words = m_bits // 64
    seeds = _bloom_seeds(k_hashes)

    def partial(b: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        base = _hash_column(b[key])
        for s in seeds:
            idx = _splitmix64(base ^ s) % np.uint64(m_bits)
            np.bitwise_or.at(
                words, (idx >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (idx & np.uint64(63)),
            )
        return pa.table(
            {"words": pa.FixedSizeListArray.from_arrays(pa.array(words), n_words)}
        )

    def merge_rows(b: pa.Table) -> pa.Table:
        arr = (
            b["words"].combine_chunks().values.to_numpy(zero_copy_only=False)
            .reshape(-1, n_words)
        )
        return pa.table(
            {
                "words": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.bitwise_or.reduce(arr, axis=0)), n_words
                )
            }
        )

    merged = ds.map_batches(partial, batch_format="pyarrow").map_batches(
        merge_rows, batch_format="pyarrow", batch_size=64
    )
    out = np.zeros(n_words, dtype=np.uint64)
    for b in merged.iter_batches(batch_format="pyarrow"):
        vals = b["words"].combine_chunks().values.to_numpy(zero_copy_only=False)
        out |= np.bitwise_or.reduce(vals.reshape(-1, n_words), axis=0)
    return out


def bloom_contains(
    words: np.ndarray, col, m_bits: int, k_hashes: int = 5
) -> np.ndarray:
    """Vectorized membership test (bool per value; no false negatives)."""
    from engine.sketch import _hash_column, _splitmix64

    base = _hash_column(col)
    hit = np.ones(len(base), dtype=bool)
    for s in _bloom_seeds(k_hashes):
        idx = _splitmix64(base ^ s) % np.uint64(m_bits)
        bit = words[(idx >> np.uint64(6)).astype(np.int64)] >> (idx & np.uint64(63))
        hit &= (bit & np.uint64(1)).astype(bool)
    return hit


def bloom_semi_filter(
    ds: Dataset, words: np.ndarray, key: str, m_bits: int, k_hashes: int = 5
) -> Dataset:
    """Filter ``ds`` to rows whose key is (probably) in the Bloom set:
    the bitset broadcasts once (ray.put), the test runs where the
    blocks live. Keeps ALL true matches plus ~FP-rate impostors — pair
    with an exact join/verify downstream when exactness is required."""
    ref = ray.put(words)

    def fn(batch: pa.Table) -> pa.Table:
        w = ray.get(ref)
        return batch.filter(pa.array(bloom_contains(w, batch[key], m_bits, k_hashes)))

    return ds.map_batches(fn, batch_format="pyarrow")


def salted_hash_join(
    left: Dataset,
    right: Dataset,
    key: str,
    hot_keys,
    salts: int = 8,
    num_buckets: int = 16,
    how: str = "inner",
) -> Dataset:
    """Skew-safe bucketed equi-join (the SURVEY-§4 'salt hot keys'
    promise for JOINS — ``grouped_count_sums(salts=...)`` is the
    aggregate analogue): rows of the declared hot keys are salted so
    one Zipfian key cannot flood a single join bucket.

    Shape: the PROBE (left) side's hot rows get ``salt = arrival
    index % S``; the BUILD (right) side REPLICATES its hot-key rows
    once per salt; both sides then join on the packed composite
    ``key * S + salt`` through the ordinary bucketed hash_join —
    each left row meets each right row exactly once, so results are
    value-identical to the unsalted join (pytest + the excluded-gate
    SQL mirror, which is the PLAIN join — salting must be
    semantically invisible).

    Bounds and limits (all raise):
    - int64 keys with |key| * salts < 2^62 (packing);
    - ``how`` in {"inner", "left"} — right/full outer would emit one
      unmatched copy PER SALT for a hot build key with no probe row;
    - ``hot_keys`` is caller-declared (sample with
      shuffle.sampled_key_histogram); replication cost is
      |hot build rows| x S — salt only what skews.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_hash_join: only inner/left are exact")
    hot = np.sort(np.asarray(list(hot_keys), dtype=np.int64))
    S = np.int64(salts)

    def _pack(keys: np.ndarray, salt: np.ndarray) -> np.ndarray:
        if len(keys) and np.abs(keys).max() >= (1 << 62) // salts:
            raise ValueError("salted_hash_join: key range too large to pack")
        return keys * S + salt

    def salt_left(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(hot, k), 0, max(len(hot) - 1, 0))
        is_hot = hot[pos] == k if len(hot) else np.zeros(len(k), bool)
        salt = np.where(is_hot, np.arange(len(k), dtype=np.int64) % S, 0)
        return b.set_column(
            b.schema.get_field_index(key), key, pa.array(_pack(k, salt))
        )

    def salt_right(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(hot, k), 0, max(len(hot) - 1, 0))
        is_hot = hot[pos] == k if len(hot) else np.zeros(len(k), bool)
        reps = np.where(is_hot, int(S), 1).astype(np.int64)
        idx = np.repeat(np.arange(len(k), dtype=np.int64), reps)
        out = b.take(pa.array(idx))
        ends = np.cumsum(reps)
        local = np.arange(len(idx), dtype=np.int64) - np.repeat(ends - reps, reps)
        return out.set_column(
            out.schema.get_field_index(key),
            key,
            pa.array(_pack(k[idx], local)),
        )

    joined = hash_join(
        left.map_batches(salt_left, batch_format="pyarrow"),
        right.map_batches(salt_right, batch_format="pyarrow"),
        key=key,
        num_buckets=num_buckets,
        how=how,
    )

    def unpack(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.set_column(
            b.schema.get_field_index(key), key, pa.array(k // S)
        )

    return joined.map_batches(unpack, batch_format="pyarrow")


def sampled_hot_keys(
    ds: Dataset, key: str, share_threshold: float = 0.05, fraction: float = 0.001
):
    """Auto-detect join hot keys for ``salted_hash_join`` with the
    SURVEY-§4 skew probe (shuffle.sampled_key_histogram): every key
    whose SAMPLED share exceeds ``share_threshold`` is declared hot.
    A false positive only costs |build rows| extra replicas for that
    key (results stay exact — salting is semantically invisible); a
    false negative degrades to the plain join's behavior for that
    key. The probe re-executes ``ds``'s lineage for the sample — use
    on cheap-lineage inputs (direct reads), pass explicit hot keys
    inside expensive pipelines (the grouped_count_sums "auto"
    contract)."""
    from engine.shuffle import sampled_key_histogram

    hist = sampled_key_histogram(ds, key, fraction=fraction)
    total = int(hist.cnt.sum()) if len(hist) else 0
    if total == 0:
        return []
    hot = hist.loc[hist.cnt / total > share_threshold, key]
    return [int(k) for k in hot]
