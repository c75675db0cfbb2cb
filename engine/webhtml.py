"""HTML -> text extraction (X44): the boilerplate-strip stage that
precedes every webtext heuristic (C4/CCNet/RefinedWeb pipelines run
tag stripping + entity decoding before any line or quality rule).

Upstream parity: no analogue in GeoCoordinateConverter — brief-
mandated webtext infrastructure (the clean_lines/weburl family).

The rule (exactly as implemented — the SQL mirror in engine/queries.py
is BUILT FROM these constants; change them together, in this order):
  1. drop <script ...>...</script> blocks  (case-insensitive, dotall)
  2. drop <style ...>...</style>  blocks   (case-insensitive, dotall)
  3. drop <!-- ... --> comments            (dotall)
  4. block-level open/close tags -> newline (p br div li ul ol h1-6
     tr table section article blockquote)
  5. every remaining tag -> one space (so inline tags never merge
     adjacent words)
  6. decode the fixed entity set, '&amp;' LAST (so '&amp;lt;' decodes
     to the literal text '&lt;', not to '<' — the standard
     double-encoding rule)
  7. collapse [ \\t]+ runs to one space; collapse newline runs (with
     surrounding spaces) to one newline; strip leading/trailing
     whitespace.

Scale shape: a pure zero-shuffle vectorized map — each step is ONE
pyarrow.compute RE2 (or literal) replacement kernel over the whole
column; no Python loops over rows, nothing shuffles, blocks stream.
The chain makes k passes over each block's bytes (k = len(steps),
all block-local allocations freed per batch) — at 100 TB that is
pure embarrassingly-parallel CPU, the ideal Ray Data stage.

Semantics note (documented, deliberate): this is the REGEX rule, not
a DOM parse — a '>' inside a quoted attribute value ends the tag for
rule 5, exactly as it does in the mirror and the scalar oracle. The
pytest oracle covers that adversarial case explicitly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# (pattern, replacement) — replacement '\n' renders as chr(10) in the
# SQL mirror. Inline (?i)/(?s) flags transfer verbatim to DuckDB's RE2.
HTML_REGEX_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (
        r"(?i)</?(?:p|br|div|li|ul|ol|h[1-6]|tr|table|section|article|blockquote)\b[^>]*/?>",
        "\n",
    ),
    (r"(?s)<[^>]*>", " "),
]
# Literal replacements, order significant ('&amp;' last).
HTML_ENTITY_STEPS: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]
HTML_WS_STEPS: list[tuple[str, str]] = [
    (r"[ \t]+", " "),
    (r" ?\n[ \n]*", "\n"),
    (r"^\s+|\s+$", ""),
]
# Tag counter (over the RAW html, before any stripping) — an integer
# cross-check column the mirror recomputes with the same pattern.
RE_ANY_TAG = r"(?s)<[^>]*>"

VOCAB = (
    "alpha tide river ledge stone marsh grove inlet ridge vale crest "
    "brook dune cliff shoal fjord delta basin butte mesa"
).split()


def extract_text_batch(
    b: pa.Table, id_col: str = "page_id", html_col: str = "html"
) -> pa.Table:
    """One vectorized pass of the full rule chain over a batch.

    Returns (id, text, n_chars, n_tags): extracted text, its UTF-8
    char count, and the raw tag count (exact ints for order-free
    downstream aggregation)."""
    arr = b[html_col]
    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        arr = pc.cast(arr, pa.string())
    raw = arr
    for pat, rep in HTML_REGEX_STEPS:
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=rep)
    for lit, rep in HTML_ENTITY_STEPS:
        arr = pc.replace_substring(arr, pattern=lit, replacement=rep)
    for pat, rep in HTML_WS_STEPS:
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=rep)
    return pa.table(
        {
            id_col: b[id_col],
            "text": arr,
            "n_chars": pc.cast(pc.utf8_length(arr), pa.int64()),
            "n_tags": pc.cast(pc.count_substring_regex(raw, pattern=RE_ANY_TAG), pa.int64()),
        }
    )


def html_extract(
    ds: Dataset, id_col: str = "page_id", html_col: str = "html"
) -> Dataset:
    """HTML -> text extraction over any Dataset with an html column."""
    return ds.map_batches(
        lambda b: extract_text_batch(b, id_col=id_col, html_col=html_col),
        batch_format="pyarrow",
    )


def _scalar_extract(html: str) -> str:
    """Independent scalar oracle: the same rule chain via Python `re`
    (a third regex engine next to pyarrow's and DuckDB's RE2) — used
    only to compute the corpus truth column and in pytest."""
    import re

    s = html
    for pat, rep in HTML_REGEX_STEPS:
        s = re.sub(pat, rep, s)
    for lit, rep in HTML_ENTITY_STEPS:
        s = s.replace(lit, rep)
    for pat, rep in HTML_WS_STEPS:
        s = re.sub(pat, rep, s)
    return s


def make_html_corpus(n: int, seed: int = 47) -> pa.Table:
    """Deterministic messy-HTML corpus with every rule outcome
    planted: scripts holding '<'/'{' junk, style blocks, comments
    containing tags, uppercase tags, self-closing tags, sloppy
    '</script >' closers, entities incl. the double-encoded
    '&amp;lt;', inline tags between words, and pure-boilerplate
    pages. truth_text/truth_n_tags come from the independent scalar
    pass (gate queries read only page_id/html)."""
    del seed  # determinism is index-driven; kept for signature parity
    htmls, truths, tag_counts = [], [], []
    import re

    for i in range(n):
        w = lambda k: VOCAB[(i * 7 + k) % len(VOCAB)]
        parts = [f"<html><head><title>{w(0)} {w(1)}</title>"]
        if i % 3 == 0:
            parts.append(
                f'<script type="text/js">if (a<b) {{ {w(2)}.go("</div>x"); }}</script >'
            )
        if i % 4 == 1:
            parts.append(f"<style>p {{ color: #{i % 999:03d}; }}</style>")
        parts.append("</head><body>")
        if i % 5 == 2:
            parts.append(f"<!-- hidden <b>{w(3)}</b> note -->")
        tag_h = "H2" if i % 2 else "h1"
        parts.append(f"<{tag_h} class='t'>{w(4)} {w(5)}</{tag_h}>")
        n_paras = 1 + (i * 13) % 4
        for j in range(int(n_paras)):
            words = " ".join(VOCAB[(i + j + t) % len(VOCAB)] for t in range(3 + j))
            ent = ["&amp;", "&lt;tag&gt;", "&amp;lt;", "&nbsp;", "&quot;q&#39;"][
                (i + j) % 5
            ]
            parts.append(f"<p>{words} {ent} <b>{w(j)}</b><br/>{w(j + 1)}</p>")
        if i % 6 == 3:
            parts.append(
                "<ul>" + "".join(f"<li>{VOCAB[(i + t) % len(VOCAB)]}</li>" for t in range(3)) + "</ul>"
            )
        if i % 97 == 13:  # pure-boilerplate page: empty extraction
            parts = ["<html><head><script>x<y&&z</script></head><body><!-- -->"]
        parts.append("</body></html>")
        html = "".join(parts)
        htmls.append(html)
        truths.append(_scalar_extract(html))
        tag_counts.append(len(re.findall(RE_ANY_TAG, html)))
    return pa.table(
        {
            "page_id": pa.array(np.arange(n, dtype=np.int64)),
            "html": pa.array(htmls, pa.string()),
            "truth_text": pa.array(truths, pa.string()),
            "truth_n_tags": pa.array(np.array(tag_counts, dtype=np.int64)),
        }
    )


def html_corpus_parquet(n: int) -> str:
    """Persist (once, cached) the messy-HTML gate corpus so both
    engines read identical bytes (the weburl/weblines idiom)."""
    import os

    import pyarrow.parquet as pq

    root = f"/tmp/geokit_webhtml/n{n}"
    path = os.path.join(root, "html.parquet")
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(root, exist_ok=True)
    pq.write_table(make_html_corpus(n), path)
    open(done, "w").write("ok")
    return path
