"""C4-style line-quality cleaning (X36): the five Raffel et al. 2020
§2.2 heuristics that open every webtext curation pipeline, as one
vectorized zero-shuffle Arrow stage.

Rules (exactly as implemented — change the SQL mirror in
engine/queries.py together):
  line kept   iff it ends in terminal punctuation (``[.!?"]$``)
              AND has >= 3 whitespace words;
  page dropped iff lowercased text contains "lorem ipsum"
              OR text contains ``{``
              OR fewer than 5 lines survive the line rules
                (kept-line count as the sentence-count proxy — this
                corpus is one sentence per line by construction).

Upstream parity: no analogue in GeoCoordinateConverter — brief-
mandated webtext infrastructure. The documents table carries no
newlines, so the gate corpus is a cached deterministic messy-lines
table both engines read byte-identically (the weburl/media idiom),
with closed-form truth columns for pytest.

Scale shape: pure per-page map — one split + two RE2 predicates over
the flattened line array + reduceat segment counts + ListArray
reassembly; no Python loops over rows, nothing shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

VOCAB = (
    "the fast key order sort table scan merge part window small hash "
    "join spark group query row data slow filter customer line batch "
    "value big vector stream column agg"
).split()

RE_LINE_END = r'[.!?"]$'
RE_WORD = r"\S+"
MIN_WORDS = 3
MIN_KEPT_LINES = 5


def make_messy_lines_table(n: int, seed: int = 31) -> pa.Table:
    """Deterministic multi-line page corpus with every rule outcome
    planted: good lines, short lines, unterminated lines, rare
    lorem-ipsum and brace poisons. Truth columns (truth_dropped,
    truth_n_kept) are computed by an independent per-line scalar pass
    (pytest ground truth; gate queries read only page_id/text)."""
    import re

    rng = np.random.default_rng(seed)
    texts, t_drop, t_kept = [], [], []
    for i in range(n):
        n_lines = 5 + (i * 13) % 8
        lines = []
        for j in range(n_lines):
            kind = (i * 31 + j * 7 + int(rng.integers(0, 3))) % 10
            w0 = (i * 17 + j * 5) % len(VOCAB)
            if kind == 0:  # too short (but terminated)
                lines.append(f"{VOCAB[w0]} {VOCAB[(w0 + 1) % len(VOCAB)]}.")
            elif kind == 1:  # long enough but unterminated
                ws = [VOCAB[(w0 + t) % len(VOCAB)] for t in range(4 + j % 3)]
                lines.append(" ".join(ws))
            else:  # good
                ws = [VOCAB[(w0 + t) % len(VOCAB)] for t in range(3 + (i + j) % 7)]
                lines.append(" ".join(ws) + ".!?"[(i + j) % 3])
        if i % 97 == 0:
            lines[n_lines // 2] = "Lorem Ipsum dolor sit amet."
        if i % 89 == 3:
            lines[0] = "if (x) { return y; }."
        texts.append("\n".join(lines))
        # independent scalar truth
        kept = [
            ln
            for ln in lines
            if re.search(RE_LINE_END, ln) and len(re.findall(RE_WORD, ln)) >= MIN_WORDS
        ]
        dropped = (
            "lorem ipsum" in texts[-1].lower()
            or "{" in texts[-1]
            or len(kept) < MIN_KEPT_LINES
        )
        t_drop.append(dropped)
        t_kept.append(len(kept))
    return pa.table(
        {
            "page_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "truth_dropped": pa.array(t_drop),
            "truth_n_kept": pa.array(np.array(t_kept, dtype=np.int64)),
        }
    )


def lines_corpus_parquet(n: int) -> str:
    """Persist (once, cached) the messy-lines gate corpus so both
    engines read identical bytes (the weburl/media idiom)."""
    import os

    import pyarrow.parquet as pq

    root = f"/tmp/geokit_weblines/n{n}"
    path = os.path.join(root, "lines.parquet")
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(root, exist_ok=True)
    pq.write_table(make_messy_lines_table(n), path)
    open(done, "w").write("ok")
    return path


def clean_lines_batch(
    b: pa.Table, id_col: str = "page_id", text_col: str = "text"
) -> pa.Table:
    """One vectorized pass of the five C4 rules over a batch.

    Returns (id, n_lines, n_kept, page_dropped, clean_text) — clean
    text is the kept lines re-joined with newlines, '' for dropped
    pages (and for pages whose every line fails, matching the SQL
    mirror's COALESCE('') — the DuckDB empty-list gotcha)."""
    text = b[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lines = pc.split_pattern(text, "\n")
    flat = pc.list_flatten(lines)
    counts = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
    ends_ok = pc.match_substring_regex(flat, RE_LINE_END)
    n_words = pc.count_substring_regex(flat, RE_WORD)
    keep = pc.and_(ends_ok, pc.greater_equal(n_words, MIN_WORDS)).to_numpy(
        zero_copy_only=False
    )
    keep = np.asarray(keep, dtype=bool)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    ends = np.cumsum(counts)
    ck = np.concatenate([[0], np.cumsum(keep)])
    n_kept = (ck[ends] - ck[starts]).astype(np.int64)

    has_lorem = pc.match_substring(pc.utf8_lower(text), "lorem ipsum").to_numpy(
        zero_copy_only=False
    )
    has_brace = pc.match_substring(text, "{").to_numpy(zero_copy_only=False)
    dropped = (
        np.asarray(has_lorem, bool)
        | np.asarray(has_brace, bool)
        | (n_kept < MIN_KEPT_LINES)
    )

    # Kept lines per SURVIVING page, reassembled zero-copy: offsets
    # from per-page kept counts (0 for dropped pages), values = the
    # kept flat lines masked to surviving pages.
    page_of_line = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    use = keep & ~dropped[page_of_line]
    out_counts = np.where(dropped, 0, n_kept)
    offsets = np.concatenate([[0], np.cumsum(out_counts)]).astype(np.int32)
    kept_list = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), flat.filter(pa.array(use))
    )
    clean = pc.binary_join(kept_list, "\n")

    return pa.table(
        {
            id_col: b[id_col],
            "n_lines": pa.array(counts),
            "n_kept": pa.array(n_kept),
            "page_dropped": pa.array(dropped),
            "clean_text": clean,
        }
    )


def clean_lines(ds: Dataset, id_col: str = "page_id", text_col: str = "text") -> Dataset:
    """C4 line-quality cleaning over a (id, text) Dataset — fused into
    the scan, zero shuffles at any corpus size."""
    return ds.map_batches(
        clean_lines_batch,
        batch_format="pyarrow",
        fn_kwargs=dict(id_col=id_col, text_col=text_col),
    )
