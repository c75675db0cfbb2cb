"""X47 composed crawl-ingest pipeline tests: the full chain's
survivor id set, extracted texts, hosts and scores cross-checked
against a scalar recomputation from the generators' truth columns;
plus stage-local facts (metadata records dropped, blocklisted sites
absent, canonical groups keep min id) and block-layout invariance."""

import re

import numpy as np
import pytest

from engine.crawl import RECS_PER_CHUNK, make_crawl_corpus


def _scalar_survivors(truth, blocklist):
    """Independent recomputation of the chain from the truth dict."""
    resp = {i: t for i, t in truth.items() if t["is_response"]}
    groups = {}
    for i, t in resp.items():
        groups.setdefault(t["canon"], []).append(i)
    keepers = {min(v) for v in groups.values()}

    def canon_host(canon):
        m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", canon)
        h = m.group(1).lower()
        return h[4:] if h.startswith("www.") else h

    def blocked(h):
        return any(h == d or h.endswith("." + d) for d in blocklist)

    return sorted(
        i for i in keepers if not blocked(canon_host(resp[i]["canon"]))
    )


@pytest.fixture(scope="module")
def run(ray_session):
    import ray.data as rd

    from engine.crawl import crawl_ingest

    tbl, truth = make_crawl_corpus(120)
    out = (
        crawl_ingest(rd.from_arrow(tbl).repartition(7))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out, truth


def test_survivor_set_matches_scalar_chain(run):
    from engine.weburl import BLOCKLIST_DEFAULT

    out, truth = run
    assert out["doc_id"].tolist() == _scalar_survivors(truth, BLOCKLIST_DEFAULT)


def test_extracted_texts_and_hosts_exact(run):
    out, truth = run
    for _, r in out.iterrows():
        t = truth[r["doc_id"]]
        assert r["text"] == t["text"]
        assert r["url"] == t["url"]
        m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", t["canon"])
        assert r["host"] == m.group(1)


def test_stage_local_facts(run):
    from engine.weburl import BLOCKLIST_DEFAULT

    out, truth = run
    ids = set(out["doc_id"])
    # metadata records never survive
    assert not any(not truth[i]["is_response"] for i in ids)
    # no blocklisted site survives (site3.example is in the default list)
    assert not out["host"].str.endswith("site3.example").any()
    assert any("site3.example" in t["canon"] for t in truth.values())
    # canonical groups: exactly one survivor per surviving canon,
    # and it is the group's min RESPONSE id
    resp = {i: t for i, t in truth.items() if t["is_response"]}
    canon_of = {i: resp[i]["canon"] for i in ids}
    assert len(set(canon_of.values())) == len(ids)
    for i in ids:
        grp = [j for j, t in resp.items() if t["canon"] == canon_of[i]]
        assert i == min(grp)


def test_scores_match_scalar_fnv_oracle(run):
    from engine.textops import clf_default_weights
    from engine.dedupe import _fnv1a_tokens

    out, truth = run
    w = clf_default_weights()
    nb = np.uint64(len(w))
    for _, r in out.head(40).iterrows():
        toks = r["text"].split()
        if toks:
            h = _fnv1a_tokens([t.encode() for t in toks])
            exp = int(w[(h % nb).astype(np.int64)].sum())
        else:
            exp = 0
        assert r["clf_score"] == exp, r["doc_id"]
        assert r["n_toks"] == len(toks)


def test_block_layout_invariance(ray_session):
    import ray.data as rd

    from engine.crawl import crawl_ingest

    tbl, _ = make_crawl_corpus(60)
    outs = []
    for p in (1, 9):
        outs.append(
            crawl_ingest(rd.from_arrow(tbl).repartition(p))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])
