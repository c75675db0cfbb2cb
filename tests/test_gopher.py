"""X57 Gopher document-level quality rules (engine/gopher.py):
kernel vs independent scalar truth, boundary semantics, engine↔DuckDB
RE2 agreement for every pattern, block-layout invariance, and full
sf0.001 DuckDB value parity of the gate query."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from engine import gopher as g

SF = "/root/testdata/sf0.001"


def test_kernel_matches_scalar_truth_every_class():
    t = g.make_gopher_corpus(650)
    out = g.gopher_stats_batch(t)
    keep = out["keep"].to_numpy(zero_copy_only=False)
    truth = t["truth_keep"].to_numpy(zero_copy_only=False)
    assert (keep == truth).all()
    cls = np.arange(650) % 13
    for c in range(13):
        frac = keep[cls == c].mean()
        # classes 0-4 are keepers, 5-12 each plant one live defect
        assert frac == (1.0 if c <= 4 else 0.0), (c, frac)


@pytest.mark.parametrize(
    "text,expect_keep,why",
    [
        # exactly at every threshold that the rule keeps
        (
            "the of " + " ".join(["word"] * 48),
            True,
            "n_words == 50 (min boundary), 2 stopwords (min boundary)",
        ),
        (
            "the of " + " ".join(["word"] * 47),
            False,
            "n_words == 49 < 50",
        ),
        (
            "the of " + " ".join(["word"] * 46) + " 123",
            False,
            "only 1 stopword pair... n_stop==2 but words=49",
        ),
    ],
)
def test_word_count_boundary(text, expect_keep, why):
    t = pa.table({"page_id": [0], "text": [text]})
    out = g.gopher_stats_batch(t)
    assert out["keep"][0].as_py() == expect_keep, why


def test_symbol_ratio_boundary():
    # 50 words, 5 of them '#': 10*(5+0) <= 1*50 holds -> keep;
    # 6 hashes among 50 -> 60 > 50 -> drop. Stopwords + alpha kept
    # legal: hashes are non-alpha words, 45/50 = 90% >= 80%.
    base = ("the of and " + " ".join(["word"] * 42)).split()
    for n_hash, keep in [(5, True), (6, False)]:
        ws = base[: 50 - n_hash] + ["#"] * n_hash
        t = pa.table({"page_id": [0], "text": [" ".join(ws)]})
        out = g.gopher_stats_batch(t)
        assert out["n_words"][0].as_py() == 50
        assert out["n_hash"][0].as_py() == n_hash
        assert out["keep"][0].as_py() == keep, n_hash


def test_bullet_and_ellipsis_line_boundaries():
    # 10 lines of 6 words: 9 bulleted (90%, keep side) vs 10 (drop).
    line = "the word of word word word."
    for n_bullet, keep in [(9, True), (10, False)]:
        lines = [("- " if i < n_bullet else "") + line for i in range(10)]
        t = pa.table({"page_id": [0], "text": ["\n".join(lines)]})
        out = g.gopher_stats_batch(t)
        assert out["n_bullet_lines"][0].as_py() == n_bullet
        assert out["keep"][0].as_py() == keep
    # 3 of 10 lines ellipsis-ended (30%, keep) vs 4 (drop)
    for n_ell, keep in [(3, True), (4, False)]:
        lines = [line + ("..." if i < n_ell else "") for i in range(10)]
        t = pa.table({"page_id": [0], "text": ["\n".join(lines)]})
        out = g.gopher_stats_batch(t)
        assert out["n_ell_lines"][0].as_py() == n_ell
        # ellipses also count toward the symbol ratio: 4 of 60 words
        # is still <= 10%, so the line rule is the live one
        assert out["keep"][0].as_py() == keep


def test_mean_word_length_boundaries():
    # 50 words of exactly 3 chars -> mean == 3 (keep side);
    # 50 words of 2 chars -> mean 2 < 3 (drop). Stopword 'the'/'and'
    # are themselves 3 chars; 'of'/'to' are 2.
    ws3 = ["the", "and"] + ["abc"] * 48
    ws2 = ["of", "to"] + ["ab"] * 48
    for ws, keep in [(ws3, True), (ws2, False)]:
        t = pa.table({"page_id": [0], "text": [" ".join(ws)]})
        out = g.gopher_stats_batch(t)
        assert out["keep"][0].as_py() == keep
    # 10-char words -> mean == 10 keeps; 11-char drops
    for wl, keep in [(10, True), (11, False)]:
        ws = ["thethethe!"[:wl].ljust(wl, "x")] * 48 + ["the" + "x" * (wl - 3), "ofx".ljust(wl, "x")]
        # ensure stopword rule passes via \b matches inside the text
        text = "the of " + " ".join(["y" * wl] * 48)
        t = pa.table({"page_id": [0], "text": [text]})
        out = g.gopher_stats_batch(t)
        nw = out["n_words"][0].as_py()
        ns = out["n_nonspace"][0].as_py()
        assert nw == 50 and ns == 5 + 48 * wl
        assert out["keep"][0].as_py() == keep, wl


def test_alpha_word_ratio_boundary():
    # 50 words, 10 numeric -> 40/50 = 80% exactly (keep);
    # 11 numeric -> 78% (drop)
    for n_num, keep in [(10, True), (11, False)]:
        ws = ["the", "of"] + ["word"] * (48 - n_num) + [str(100 + i) for i in range(n_num)]
        t = pa.table({"page_id": [0], "text": [" ".join(ws)]})
        out = g.gopher_stats_batch(t)
        assert out["n_alpha_words"][0].as_py() == 50 - n_num
        assert out["keep"][0].as_py() == keep


def test_regex_agreement_pyarrow_vs_duckdb():
    """Every pattern the kernel uses (incl. (?m) multiline and \\b
    stopword probes) must count identically in pyarrow RE2 and DuckDB
    RE2 — the precondition of the SQL mirror."""
    import pyarrow.compute as pc

    t = g.make_gopher_corpus(130)
    texts = t["text"].to_pylist() + [
        "...\n-\n####\n123 456 !!!",
        "a\n\nb...",
        "end...",
        "* star\n- dash\nplain",
    ]
    arr = pa.array(texts)
    con = duckdb.connect()
    for name, pat in g.COUNT_COLS:
        a = pc.count_substring_regex(arr, pat).to_pylist()
        b = [
            r[0]
            for r in con.execute(
                "SELECT len(regexp_extract_all(t, ?)) FROM (SELECT unnest(?) t)",
                [pat, texts],
            ).fetchall()
        ]
        assert a == b, (name, pat)
    for w in g.STOPWORDS:
        a = pc.match_substring_regex(arr, rf"\b{w}\b").to_pylist()
        b = [
            bool(r[0])
            for r in con.execute(
                "SELECT regexp_matches(t, ?) FROM (SELECT unnest(?) t)",
                [rf"\b{w}\b", texts],
            ).fetchall()
        ]
        assert a == b, w


def test_gate_query_duckdb_parity_sf0001(ray_session):
    from engine.queries import REGISTRY, _sql_gopher

    fn, _ = REGISTRY["gopher_quality_docs"]
    ray_df = fn(SF).to_pandas()
    path = "/tmp/geokit_gopher/n500/docs.parquet"
    sql_df = duckdb.sql(_sql_gopher(path)).df()
    assert len(ray_df) == len(sql_df) == 500
    cols = sorted(ray_df.columns)
    assert cols == sorted(sql_df.columns)
    a = ray_df[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    b = sql_df[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    for c in cols:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


def test_block_layout_invariance(ray_session):
    import ray.data as rd

    from engine.gopher import gopher_corpus_parquet, gopher_quality

    path = gopher_corpus_parquet(500)
    outs = []
    for nb in (1, 7):
        ds = rd.read_parquet(path, columns=["page_id", "text"], override_num_blocks=nb)
        df = gopher_quality(ds).to_pandas().sort_values("page_id").reset_index(drop=True)
        outs.append(df)
    assert outs[0].equals(outs[1])
