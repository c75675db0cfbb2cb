"""End-to-end flagship pipeline tests over the synthetic pages corpus
(SURVEY.md §5.2.3-4): extraction oracle, text byte-identity invariant,
cell/PIP/kNN conformance, rollup consistency.
"""

import numpy as np
import pyarrow as pa
import pytest

import assets
from engine.extract import extract_coords
from engine.pages import make_pages_table, pages_parquet
from engine.pipeline import cell_rollup, enrich_pages
from geokit.cells import cell_id
from geokit.polygons import pip_lookup

N_PAGES = 1200


@pytest.fixture(scope="module")
def pages_table():
    return make_pages_table(N_PAGES, seed=123)


def test_extractor_matches_generator_truth(pages_table):
    out = extract_coords(pages_table)
    sys = out["system"].to_numpy(zero_copy_only=False)
    layout = pages_table["_true_layout"].to_numpy(zero_copy_only=False)
    # Every row with an embedded coordinate is found, none invented.
    assert ((sys >= 0) == (layout >= 0)).all()
    fi = out["fi"].to_numpy(zero_copy_only=False)
    la = out["la"].to_numpy(zero_copy_only=False)
    tfi = pages_table["_true_fi"].to_numpy(zero_copy_only=False)
    tla = pages_table["_true_la"].to_numpy(zero_copy_only=False)
    has = layout >= 0
    # Text formats truncate (4 decimals ~ 1e-4 deg ~ 11 m; DMS 0.01" ~
    # 0.3 m; projected 0.1 m) -> tolerance driven by the coarsest.
    assert np.abs(fi[has] - tfi[has]).max() < 1e-4
    assert np.abs(la[has] - tla[has]).max() < 1.5e-4


def test_extractor_normalizes_projected_layouts(pages_table):
    out = extract_coords(pages_table)
    layout = pages_table["_true_layout"].to_numpy(zero_copy_only=False)
    fi = out["fi"].to_numpy(zero_copy_only=False)
    tfi = pages_table["_true_fi"].to_numpy(zero_copy_only=False)
    for lo, sys_code in [(2, 2), (3, 3)]:
        m = layout == lo
        assert (out["system"].to_numpy(zero_copy_only=False)[m] == sys_code).all()
        # Projected strings carry 0.1 m precision -> ~1.5e-6 deg.
        assert np.abs(fi[m] - tfi[m]).max() < 5e-6


def test_extractor_drops_html_keeps_text(pages_table):
    out = extract_coords(pages_table)
    assert "html" not in out.column_names
    assert out["text"].equals(pages_table["text"])


@pytest.mark.usefixtures("ray_session")
def test_pipeline_end_to_end_invariants():
    path = pages_parquet(N_PAGES, seed=77)
    enriched = enrich_pages(path)
    t = pa.concat_tables(
        enriched.iter_batches(batch_format="pyarrow", batch_size=4096)
    )  # small test corpus — fine to collect

    # 1. text byte-identity per url vs the source parquet.
    import pyarrow.parquet as pq
    import glob

    src = pa.concat_tables(pq.read_table(f, columns=["url", "text", "_true_layout"]) for f in sorted(glob.glob(path + "/*.parquet")))
    src_map = dict(zip(src["url"].to_pylist(), src["text"].to_pylist()))
    for url, text in zip(t["url"].to_pylist(), t["text"].to_pylist()):
        assert src_map[url] == text

    # 2. row count == rows with embedded coords.
    n_expected = int(np.sum(np.array(src["_true_layout"].to_pylist()) >= 0))
    assert t.num_rows == n_expected

    # 3. cell ids match direct recomputation from fi/la.
    fi = np.array(t["fi"].to_pylist())
    la = np.array(t["la"].to_pylist())
    assert np.array_equal(
        np.array(t["cell"].to_pylist(), dtype=np.int64), cell_id(fi, la, 12)
    )

    # 4. PIP result matches direct lookup.
    polys = assets.load_municipalities()
    idx = pip_lookup(polys, np.array(t["x_d96"].to_pylist()), np.array(t["y_d96"].to_pylist()))
    expect = np.where(idx >= 0, polys.muni_id[np.where(idx >= 0, idx, 0)], -1)
    assert np.array_equal(np.array(t["muni_id"].to_pylist()), expect)


@pytest.mark.usefixtures("ray_session")
def test_cell_rollup_counts_total():
    path = pages_parquet(N_PAGES, seed=77)
    enriched = enrich_pages(path)
    roll = cell_rollup(enriched).to_pandas()
    assert roll.cnt.sum() == enrich_pages(path).count()
    assert (roll.cnt > 0).all()
    # mean coords stay inside the bbox
    assert roll.mean_fi.between(45.0, 47.3).all()
