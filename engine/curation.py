"""End-to-end training-data curation pipeline — the composed workflow
every LLM-data op in this repo exists to serve:

    quality filter → language filter → [PII scrub] → exact dedup
    → near-dup dedup → [line-level dedup] → benchmark decontamination
    → deterministic train/val split → partitioned parquet write

    (bracketed stages are opt-in: ``scrub_pii=True`` redacts
    email/phone/IP before any digesting so duplicates of a doc that
    differ only in PII dedup together; ``line_dedup=True`` (newline
    lines; blank lines are exempt from the cut) or ``line_dedup=w``
    (w-token windows) applies the C4 corpus-wide duplicate-line cut
    after doc-level dedup and drops docs it empties entirely)

Composition and scale contracts (each stage's detail lives on its op):
- quality / language filters are per-block, zero-shuffle;
- exact dedup ships 24 B digests through its shuffle, never text, and
  the verdict returns as a DROP-ID set (duplicate-scale, sparse on
  real corpora) anti-filtered where the blocks live — broadcast under
  ``max_broadcast_drop_ids``, exact hash-join anti above it (a Bloom
  filter is NOT usable for anti: false positives would drop clean
  docs);
- near-dup dedup is the full minhash → LSH → semi-filtered exact
  verify → connected-components verdict (engine.dedupe), reduced to
  the same sparse drop-id shape;
- decontamination is a broadcast n-gram probe, zero-shuffle;
- the split is a deterministic content-id hash (resumable,
  repartition-stable);
- the write is one file per block per split directory (resumable).

The report counts come from streaming aggregations and drop-set
sizes; the driver never holds corpus rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from engine.textops import contamination_flags, langid_batch, quality_batch


def _drop_ids_exact(ds: Dataset, id_col: str, text_col: str) -> np.ndarray:
    """Doc ids to drop for exact dedup: every member of a digest group
    except the min id. The shuffle carries (id, d1, d2) only."""
    from engine.dedupe import content_digests
    from engine.shuffle import keyed_partition_map

    def digest(b: pa.Table) -> pa.Table:
        d1, d2 = content_digests(b[text_col])
        return pa.table({id_col: b[id_col], "d1": pa.array(d1), "d2": pa.array(d2)})

    dig = ds.map_batches(digest, batch_format="pyarrow")

    def drops(df):
        mins = df.groupby(["d1", "d2"], sort=False)[id_col].transform("min")
        return df.loc[df[id_col] != mins, [id_col]]

    drop_ds = keyed_partition_map(
        dig,
        ["d1", "d2"],
        drops,
        num_partitions=32,
        out_schema=pa.schema([(id_col, pa.int64())]),
    )
    parts = [
        b[id_col].to_numpy(zero_copy_only=False)
        for b in drop_ds.iter_batches(batch_format="pyarrow")
    ]
    return np.sort(np.concatenate(parts)) if parts else np.zeros(0, dtype=np.int64)


def _drop_ids_neardup(ds: Dataset, id_col: str, text_col: str, threshold: float) -> np.ndarray:
    """Doc ids to drop for near-dup dedup: verdict keep == False
    (duplicate-scale — the verdict's non-keep rows are exactly the
    grouped duplicates)."""
    from engine.dedupe import minhash_dedup_verdict

    verdict = minhash_dedup_verdict(
        ds.select_columns([id_col, text_col]), id_col=id_col, text_col=text_col,
        threshold=threshold,
    )
    parts = []
    for b in verdict.iter_batches(batch_format="pyarrow"):
        keep = b["keep"].to_numpy(zero_copy_only=False)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        parts.append(ids[~keep])
    return np.sort(np.concatenate(parts)) if parts else np.zeros(0, dtype=np.int64)


def curate(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 5,
    min_alpha_milli: int = 500,
    neardup_threshold: float = 0.5,
    scrub_pii: bool = False,
    line_dedup: bool | int = False,
    contamination_queries: tuple[str, ...] = (),
    contamination_k: int = 8,
    val_permille: int = 50,
    out_dir: str | None = None,
) -> tuple[Dataset, dict]:
    """Run the full curation chain; returns (curated dataset with a
    ``split`` column, per-stage report dict). When ``out_dir`` is
    given, also writes ``{out_dir}/train`` and ``{out_dir}/val``
    parquet directories (one file per block)."""
    from engine.joins import semi_filter

    report: dict[str, int] = {"input": ds.count()}

    def qual_lang(b: pa.Table) -> pa.Table:
        b = quality_batch(b, text_col)
        b = langid_batch(b, text_col)
        ok_tokens = pa.array(
            b["n_tokens"].to_numpy(zero_copy_only=False) >= min_tokens
        )
        ok_alpha = pa.array(
            b["alpha_ratio_milli"].to_numpy(zero_copy_only=False) >= min_alpha_milli
        )
        lang_pred = np.asarray(b["lang_pred"].to_pylist(), dtype=object)
        ok_lang = pa.array(np.isin(lang_pred, np.asarray(langs, dtype=object)))
        import pyarrow.compute as pc

        keep = pc.and_(pc.and_(ok_tokens, ok_alpha), ok_lang)
        return b.filter(keep).select([id_col, text_col])

    filtered = ds.map_batches(qual_lang, batch_format="pyarrow").materialize()
    report["after_quality_lang"] = filtered.count()

    if scrub_pii:
        from engine.textops import pii_scrub_batch

        def scrub(b: pa.Table) -> pa.Table:
            s = pii_scrub_batch(b, text_col)
            hits = (
                s["n_emails"].to_numpy(zero_copy_only=False)
                + s["n_phones"].to_numpy(zero_copy_only=False)
                + s["n_ips"].to_numpy(zero_copy_only=False)
            ) > 0
            return pa.table(
                {
                    id_col: b[id_col],
                    text_col: s["text_scrubbed"],
                    "pii_hit": pa.array(hits.astype(np.int64)),
                }
            )

        filtered = filtered.map_batches(scrub, batch_format="pyarrow").materialize()
        report["pii_docs_scrubbed"] = int(filtered.sum("pii_hit") or 0)
        filtered = filtered.map_batches(
            lambda b: b.select([id_col, text_col]), batch_format="pyarrow"
        )

    exact_drops = _drop_ids_exact(filtered, id_col, text_col)
    report["exact_dups_dropped"] = int(len(exact_drops))
    deduped = semi_filter(filtered, exact_drops, id_col, anti=True).materialize()

    near_drops = _drop_ids_neardup(deduped, id_col, text_col, neardup_threshold)
    report["near_dups_dropped"] = int(len(near_drops))
    deduped = semi_filter(deduped, near_drops, id_col, anti=True)

    if line_dedup:
        import pyarrow.compute as pc

        from engine.dedupe import line_dedup as _line_dedup

        width = None if line_dedup is True else int(line_dedup)
        ld = _line_dedup(
            deduped, id_col=id_col, text_col=text_col, token_width=width
        ).materialize()
        report["lines_dropped"] = int(ld.sum("n_dropped") or 0)

        def keep_nonempty(b: pa.Table) -> pa.Table:
            t = b.filter(pc.not_equal(b["text_dedup"], ""))
            return pa.table({id_col: t[id_col], text_col: t["text_dedup"]})

        nonempty = ld.map_batches(keep_nonempty, batch_format="pyarrow").materialize()
        report["emptied_docs_dropped"] = ld.count() - nonempty.count()
        deduped = nonempty

    if contamination_queries:
        flags = contamination_flags(
            deduped, list(contamination_queries), k=contamination_k,
            id_col=id_col, text_col=text_col,
        )
        bad = []
        for b in flags.iter_batches(batch_format="pyarrow"):
            c = b["contaminated"].to_numpy(zero_copy_only=False)
            bad.append(b[id_col].to_numpy(zero_copy_only=False)[c])
        bad_ids = np.sort(np.concatenate(bad)) if bad else np.zeros(0, dtype=np.int64)
        report["contaminated_dropped"] = int(len(bad_ids))
        deduped = semi_filter(deduped, bad_ids, id_col, anti=True)
    else:
        report["contaminated_dropped"] = 0

    def split(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (ids * 2654435761 + 97) % 1000
        s = np.where(h < val_permille, "val", "train")
        return b.append_column("split", pa.array(s, pa.string()))

    out = deduped.map_batches(split, batch_format="pyarrow").materialize()
    report["output"] = out.count()
    report["val_rows"] = int(
        sum(
            int((np.asarray(b["split"].to_pylist(), dtype=object) == "val").sum())
            for b in out.iter_batches(batch_format="pyarrow")
        )
    )
    if out_dir is not None:
        for name in ("train", "val"):
            part = out.map_batches(
                lambda b, nm=name: b.filter(
                    pa.array(np.asarray(b["split"].to_pylist(), dtype=object) == nm)
                ),
                batch_format="pyarrow",
            )
            part.write_parquet(f"{out_dir}/{name}")
    return out, report
