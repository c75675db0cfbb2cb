"""X44 HTML -> text extraction tests: planted adversarial fragments
vs the independent Python-`re` scalar oracle, the corpus ground-truth
columns, block-layout invariance, and DuckDB mirror parity at
gate scale."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from engine.webhtml import (
    _scalar_extract,
    extract_text_batch,
    html_corpus_parquet,
    make_html_corpus,
)

EDGE_HTML = [
    "",  # empty input
    "plain text, no tags at all",
    "<html><body></body></html>",  # tags only -> empty text
    "<p>a</p><p>b</p>",  # block tags become newlines
    "word<b>bold</b>tail",  # inline tag -> space, words never merge
    '<SCRIPT a="1">if (x<y) { f("</div>"); }</SCRIPT >junk gone?<p>kept</p>',
    "<style>.c { margin: 0; }</style>styled",
    "<!-- comment with <b>tags</b> inside -->after",
    "A&amp;B &lt;tag&gt; &amp;lt;still-encoded&gt; &nbsp;&quot;q&#39;s&quot;",
    '<a href="x>y">attr with gt</a>',  # regex rule: tag ends at first '>'
    "<br/><br />self closing<BR>",
    "  \t leading ws <p> and \t runs  </p>  ",
    "<div><ul><li>one</li><li>two</li></ul></div>",
    "<script>never closed so eaten nothing?<p>alive</p>",  # unclosed script: no match
]


def test_edge_fragments_match_scalar_oracle():
    t = pa.table(
        {
            "page_id": pa.array(np.arange(len(EDGE_HTML), dtype=np.int64)),
            "html": pa.array(EDGE_HTML, pa.string()),
        }
    )
    out = extract_text_batch(t)
    for i, h in enumerate(EDGE_HTML):
        assert out["text"][i].as_py() == _scalar_extract(h), h
    # spot semantic facts, not just oracle agreement:
    txts = out["text"].to_pylist()
    assert txts[3] == "a\nb"
    assert txts[4] == "word bold tail"
    assert "junk gone?" in txts[5] and "x<y" not in txts[5]
    assert txts[8] == 'A&B <tag> &lt;still-encoded> "q\'s"'
    assert "alive" in txts[13]  # unclosed <script> must not eat the doc


def test_corpus_truth_columns_exact():
    t = make_html_corpus(800)
    out = extract_text_batch(t.select(["page_id", "html"]))
    assert pc.all(pc.equal(out["text"], t["truth_text"])).as_py()
    assert pc.all(pc.equal(out["n_tags"], t["truth_n_tags"])).as_py()
    # the rule exercises every branch: some empty pages, some entities
    assert pc.sum(pc.equal(out["n_chars"], 0)).as_py() > 0


def test_block_layout_invariance(ray_session):
    import ray.data as rd

    from engine.webhtml import html_extract

    t = make_html_corpus(300).select(["page_id", "html"])
    a = (
        html_extract(rd.from_arrow(t).repartition(1))
        .to_pandas()
        .sort_values("page_id")
        .reset_index(drop=True)
    )
    b = (
        html_extract(rd.from_arrow(t).repartition(17))
        .to_pandas()
        .sort_values("page_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_gate_parity_sf0001(ray_session):
    """Ray query == DuckDB mirror, text verbatim (sf0.001 -> n=500)."""
    from engine.queries import REGISTRY, _sql_html_extract

    fn, _ = REGISTRY["html_extract_docs"]
    ray_df = (
        fn("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("page_id")
        .reset_index(drop=True)
    )
    path = html_corpus_parquet(500)
    sql_df = (
        duckdb.sql(_sql_html_extract(path))
        .df()
        .sort_values("page_id")
        .reset_index(drop=True)
    )
    assert list(ray_df.columns) == list(sql_df.columns)
    for c in ray_df.columns:
        assert (ray_df[c].to_numpy() == sql_df[c].to_numpy()).all(), c
