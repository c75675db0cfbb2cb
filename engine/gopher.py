"""Gopher document-level quality rules (X57): the Rae et al. 2021
(arXiv:2112.11446, Table A1) per-document quality filter that every
web-scale curation pipeline runs alongside C4 line cleaning
(engine/weblines.py covers the line half; engine/textops
repetition_signals covers the repetition half — this module is the
remaining document-level half).

Rules (exactly as implemented — the SQL mirror in engine/queries.py
is built from the SAME constants; change together). Every rule is an
exact integer comparison (cross-multiplied ratios), so the verdict is
engine-order independent and SQL-value checkable:

  keep iff  MIN_WORDS <= n_words <= MAX_WORDS
        AND MIN_MEAN_WL * n_words <= n_nonspace <= MAX_MEAN_WL * n_words
              (mean word length in [3, 10]; sum of word lengths ==
               count of non-whitespace chars)
        AND SYM_DEN * (n_hash + n_ellipsis) <= SYM_NUM * n_words
              (symbol-to-word ratio for '#' / '...' <= 0.1)
        AND BULLET_DEN * n_bullet_lines <= BULLET_NUM * n_lines
              (<= 90% of lines start with a bullet)
        AND ELL_DEN * n_ell_lines <= ELL_NUM * n_lines
              (<= 30% of lines end with an ellipsis)
        AND ALPHA_DEN * n_alpha_words >= ALPHA_NUM * n_words
              (>= 80% of words contain an alphabetic char)
        AND n_stop >= MIN_STOP distinct STOPWORDS present

Upstream parity: no analogue in GeoCoordinateConverter — brief-
mandated webtext infrastructure (the quality-filter stage of the
training-data pipeline family).

Scale shape: pure per-doc map — eight RE2 count kernels + eight
word-boundary stopword probes over the text column, numpy integer
verdicts; no Python loops over rows, nothing shuffles. Engine/DuckDB
RE2 agreement for every pattern (incl. the (?m) multiline ones) was
probed bitwise before this module was written (see tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# --- rule constants (single source for engine + SQL mirror + corpus truth)
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WL = 3
MAX_MEAN_WL = 10
SYM_NUM, SYM_DEN = 1, 10
BULLET_NUM, BULLET_DEN = 9, 10
ELL_NUM, ELL_DEN = 3, 10
ALPHA_NUM, ALPHA_DEN = 4, 5
MIN_STOP = 2
STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

RE_WORD = r"\S+"
RE_NONSPACE = r"\S"
RE_HASH = r"#"
RE_ELLIPSIS = r"\.\.\."
RE_BULLET = r"(?m)^[-*]"
RE_ELL_END = r"(?m)\.\.\.$"
RE_ALPHA_WORD = r"\S*[A-Za-z]\S*"

COUNT_COLS = (
    ("n_words", RE_WORD),
    ("n_nonspace", RE_NONSPACE),
    ("n_hash", RE_HASH),
    ("n_ellipsis", RE_ELLIPSIS),
    ("n_bullet_lines", RE_BULLET),
    ("n_ell_lines", RE_ELL_END),
    ("n_alpha_words", RE_ALPHA_WORD),
)


def _keep(c: dict[str, np.ndarray]) -> np.ndarray:
    """The verdict from the integer counters — shared shape of the
    vectorized kernel, the scalar corpus truth and (textually) the SQL
    mirror."""
    return (
        (c["n_words"] >= MIN_WORDS)
        & (c["n_words"] <= MAX_WORDS)
        & (MIN_MEAN_WL * c["n_words"] <= c["n_nonspace"])
        & (c["n_nonspace"] <= MAX_MEAN_WL * c["n_words"])
        & (SYM_DEN * (c["n_hash"] + c["n_ellipsis"]) <= SYM_NUM * c["n_words"])
        & (BULLET_DEN * c["n_bullet_lines"] <= BULLET_NUM * c["n_lines"])
        & (ELL_DEN * c["n_ell_lines"] <= ELL_NUM * c["n_lines"])
        & (ALPHA_DEN * c["n_alpha_words"] >= ALPHA_NUM * c["n_words"])
        & (c["n_stop"] >= MIN_STOP)
    )


def gopher_stats_batch(
    b: pa.Table, id_col: str = "page_id", text_col: str = "text"
) -> pa.Table:
    """One vectorized pass of all Gopher document rules over a batch:
    (id, the eight integer counters, keep)."""
    text = b[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    c: dict[str, np.ndarray] = {
        name: pc.count_substring_regex(text, pat)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
        for name, pat in COUNT_COLS
    }
    c["n_lines"] = (
        pc.count_substring(text, "\n").to_numpy(zero_copy_only=False).astype(np.int64)
        + 1
    )
    n_stop = np.zeros(len(text), dtype=np.int64)
    for w in STOPWORDS:
        n_stop += (
            pc.match_substring_regex(text, rf"\b{w}\b")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
    c["n_stop"] = n_stop
    out = {id_col: b[id_col]}
    for name in (
        "n_words",
        "n_nonspace",
        "n_hash",
        "n_ellipsis",
        "n_lines",
        "n_bullet_lines",
        "n_ell_lines",
        "n_alpha_words",
        "n_stop",
    ):
        out[name] = pa.array(c[name])
    out["keep"] = pa.array(_keep(c))
    return pa.table(out)


def gopher_quality(
    ds: Dataset, id_col: str = "page_id", text_col: str = "text"
) -> Dataset:
    """Per-document Gopher quality verdicts — zero-shuffle map."""
    return ds.map_batches(
        lambda b: gopher_stats_batch(b, id_col, text_col), batch_format="pyarrow"
    )


# --------------------------------------------------- gate corpus

VOCAB_STOP = list(STOPWORDS)
VOCAB_PLAIN = (
    "fast key order sort table scan merge part window small hash join "
    "spark group query row data slow filter customer line batch value "
    "big vector stream column agg"
).split()


def make_gopher_corpus(n: int, seed: int = 47) -> pa.Table:
    """Deterministic multi-line doc corpus planting every rule's
    defect class on disjoint residues, plus exact-boundary docs for
    the <=/>= semantics. truth_keep is computed by an INDEPENDENT
    per-line scalar pass (Python re + loops), not the vectorized
    kernel."""
    import re

    rng = np.random.default_rng(seed)

    def words(k: int, i: int, with_stop: bool = True) -> list[str]:
        src = (VOCAB_PLAIN + VOCAB_STOP) if with_stop else VOCAB_PLAIN
        return [src[(i * 7 + t * 3) % len(src)] for t in range(k)]

    texts: list[str] = []
    for i in range(n):
        cls = i % 13
        nw = 55 + (i * 11) % 60
        ws = words(nw, i)
        if cls == 5:  # too few words
            ws = words(MIN_WORDS - 1 - (i % 20), i)
        elif cls == 6:  # mean word length too high
            ws = ["x" * (11 + (i + t) % 4) for t in range(nw)]
        elif cls == 7:  # mean word length too low
            ws = ["ab"[t % 2] for t in range(nw)]
        elif cls == 8:  # symbol-heavy: > 10% hash/ellipsis
            n_sym = nw // 5
            ws = ws[: nw - n_sym] + ["#" if t % 2 else "..." for t in range(n_sym)]
        elif cls == 11:  # too many non-alpha words
            n_num = (nw * 3) // 10
            ws = ws[: nw - n_num] + [str(100 + t) for t in range(n_num)]
        elif cls == 12:  # no stopwords
            ws = words(nw, i, with_stop=False)
        # lay words onto lines of ~8 words
        lines = [" ".join(ws[j : j + 8]) for j in range(0, len(ws), 8)]
        if cls == 9:  # bullet-heavy: > 90% of lines
            lines = ["- " + ln for ln in lines]
        elif cls == 10:  # ellipsis-ended lines: > 30%
            k = (len(lines) * 4) // 10 + 1
            lines = [ln + "..." if j < k else ln for j, ln in enumerate(lines)]
        elif cls == 2 and len(lines) >= 10:
            # exact boundary: 10% of lines bulleted (keep side of <=90%)
            lines = ["- " + ln if j % 10 == 0 else ln for j, ln in enumerate(lines)]
        elif cls == 3:
            # sprinkle a legal amount of symbols (exactly 10% if divisible)
            n_sym = len(ws) // 10
            lines.append(" ".join(["#"] * max(n_sym, 1)))
        if int(rng.integers(0, 7)) == 0 and cls in (0, 1, 4):
            lines.append("- one legal bullet line with the usual words.")
        texts.append("\n".join(lines))

    # independent scalar truth
    truth = []
    for t in texts:
        lines = t.split("\n")
        wlist = re.findall(RE_WORD, t)
        c = {
            "n_words": len(wlist),
            "n_nonspace": sum(len(w) for w in wlist),
            "n_hash": t.count("#"),
            "n_ellipsis": len(re.findall(RE_ELLIPSIS, t)),
            "n_lines": len(lines),
            "n_bullet_lines": sum(1 for ln in lines if ln.startswith(("-", "*"))),
            "n_ell_lines": sum(1 for ln in lines if ln.endswith("...")),
            "n_alpha_words": sum(1 for w in wlist if re.search("[A-Za-z]", w)),
            "n_stop": sum(
                1 for w in STOPWORDS if re.search(rf"\b{w}\b", t) is not None
            ),
        }
        truth.append(bool(_keep({k: np.array([v]) for k, v in c.items()})[0]))
    return pa.table(
        {
            "page_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "truth_keep": pa.array(truth),
        }
    )


def gopher_corpus_parquet(n: int) -> str:
    """Persist (once, cached) the gate corpus so both engines read
    identical bytes (the weburl/weblines idiom)."""
    import os

    import pyarrow.parquet as pq

    root = f"/tmp/geokit_gopher/n{n}"
    path = os.path.join(root, "docs.parquet")
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(root, exist_ok=True)
    pq.write_table(make_gopher_corpus(n), path, row_group_size=65536)
    open(done, "w").write("ok")
    return path
