"""C4 line-quality cleaning (engine/weblines.py, X36)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _scalar_oracle(texts):
    import re

    from engine.weblines import MIN_KEPT_LINES, MIN_WORDS, RE_LINE_END, RE_WORD

    out = []
    for t in texts:
        lines = t.split("\n")
        kept = [
            ln
            for ln in lines
            if re.search(RE_LINE_END, ln) and len(re.findall(RE_WORD, ln)) >= MIN_WORDS
        ]
        dropped = (
            "lorem ipsum" in t.lower() or "{" in t or len(kept) < MIN_KEPT_LINES
        )
        out.append(
            (
                len(lines),
                len(kept),
                dropped,
                "" if dropped else "\n".join(kept),
            )
        )
    return out


def test_clean_lines_batch_edge_cases():
    from engine.weblines import clean_lines_batch

    texts = [
        "",  # one empty line, dropped
        "one two three.\n" * 6,  # trailing '' line; 6 kept -> survives
        "a b c.\nd e f!\ng h i?\nj k l.\nm n o.",  # exactly 5 kept
        "a b c.\nd e f!\ng h i?\nj k l.",  # only 4 kept -> dropped
        'quoted line stays here."\nx y z.\np q r.\ns t u.\nv w x.',
        "Lorem IPSUM anywhere.\na b c.\nd e f.\ng h i.\nj k l.\nm n o.",
        "code { x }\na b c.\nd e f.\ng h i.\nj k l.\nm n o.",
        "no terminal punct here\nshort.\n" + "\n".join(f"w{i} ok fine." for i in range(6)),
    ]
    b = pa.table({"page_id": pa.array(np.arange(len(texts), dtype=np.int64)), "text": pa.array(texts)})
    got = clean_lines_batch(b).to_pandas()
    for i, (nl, nk, dr, ct) in enumerate(_scalar_oracle(texts)):
        assert got.n_lines[i] == nl, i
        assert got.n_kept[i] == nk, i
        assert bool(got.page_dropped[i]) == dr, i
        assert got.clean_text[i] == ct, i


def test_clean_lines_corpus_truth_columns(ray_session):
    """Engine verdicts must equal the generator's independent scalar
    truth for every page."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from engine.weblines import clean_lines, lines_corpus_parquet

    path = lines_corpus_parquet(500)
    got = (
        clean_lines(rd.read_parquet(path, columns=["page_id", "text"]))
        .to_pandas()
        .sort_values("page_id")
        .reset_index(drop=True)
    )
    truth = pq.read_table(path).to_pandas().sort_values("page_id").reset_index(drop=True)
    assert (got.page_dropped.to_numpy() == truth.truth_dropped.to_numpy()).all()
    assert (got.n_kept.to_numpy() == truth.truth_n_kept.to_numpy()).all()
    # live mix of outcomes
    assert 0 < int(got.page_dropped.sum()) < len(got)


def test_clean_lines_docs_query_matches_duckdb_oracle(ray_session):
    import duckdb

    from engine.pages import sf_to_n_rows
    from engine.queries import REGISTRY, _sql_clean_lines
    from engine.weblines import lines_corpus_parquet

    fn, _ = REGISTRY["clean_lines_docs"]
    sf = "/root/testdata/sf0.001"
    ray_df = fn(sf).to_pandas()
    path = lines_corpus_parquet(max(200, sf_to_n_rows(sf) // 10))
    con = duckdb.connect()
    sql_df = con.sql(_sql_clean_lines(path)).df()
    assert len(ray_df) == len(sql_df) > 0
    cols = sorted(ray_df.columns)
    assert cols == sorted(sql_df.columns)
    a = ray_df[cols].sort_values("page_id").reset_index(drop=True)
    b = sql_df[cols].sort_values("page_id").reset_index(drop=True)
    for c in cols:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        assert av.dtype.kind == bv.dtype.kind, (c, av.dtype, bv.dtype)
        assert (av == bv).all(), c


def test_web_refresh_pipeline_stage_counts(ray_session):
    """X39 composition: survivors must be exactly (URL keepers) ∩
    (pages the C4 truth says survive), and the line-dedup stage's
    totals must match a scalar recomputation over those pages'
    cleaned text."""
    import re

    import pyarrow.parquet as pq

    from engine.pages import sf_to_n_rows
    from engine.queries import REGISTRY
    from engine.weblines import (
        MIN_KEPT_LINES,
        MIN_WORDS,
        RE_LINE_END,
        RE_WORD,
        lines_corpus_parquet,
    )
    from engine.weburl import urls_corpus_parquet

    sf = "/root/testdata/sf0.001"
    fn, _ = REGISTRY["web_refresh_pipeline"]
    got = fn(sf).to_pandas().sort_values("page_id").reset_index(drop=True)

    n = max(200, sf_to_n_rows(sf) // 10)
    # scalar keepers: min page_id per canonical truth
    ut = pq.read_table(urls_corpus_parquet(n)).to_pandas()
    keep_ids = set(ut.groupby("truth_canon")["page_id"].min())
    lt = pq.read_table(lines_corpus_parquet(n)).to_pandas()
    surv_ids = sorted(
        set(lt.loc[~lt.truth_dropped, "page_id"]) & keep_ids
    )
    assert list(got.page_id) == surv_ids

    # scalar line dedup over the cleaned text of the survivors
    texts = {}
    for pid in surv_ids:
        t = lt.loc[lt.page_id == pid, "text"].iloc[0]
        kept = [
            ln
            for ln in t.split("\n")
            if re.search(RE_LINE_END, ln)
            and len(re.findall(RE_WORD, ln)) >= MIN_WORDS
        ]
        assert len(kept) >= MIN_KEPT_LINES
        texts[pid] = kept
    seen = set()
    exp_dropped = {}
    for pid in surv_ids:  # ascending page_id == first-occurrence order
        d = 0
        for ln in texts[pid]:
            if ln == "":
                continue
            if ln in seen:
                d += 1
            else:
                seen.add(ln)
        exp_dropped[pid] = d
    assert (got.n_lines.to_numpy() == [len(texts[p]) for p in surv_ids]).all()
    assert (got.n_dropped.to_numpy() == [exp_dropped[p] for p in surv_ids]).all()
