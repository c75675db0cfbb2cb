"""Geo pipeline driver-contract queries (rows-only checks).

The geodesy operators are not ANSI-SQL-expressible (TM series, Helmert
chain, triangle AFT, bilinear geoid, S2 cells), so per the driver
contract they get rows-only checks here and their exactness is proven
by the pytest golden/oracle suite (tests/test_kernels.py,
tests/test_joins.py, tests/test_pipeline.py) instead.

Inputs are the deterministic synthetic pages corpus (FIXTURES.md §A)
sized from the sf dir — BASELINE.json:input_hint shape; the driver's
relational tables carry no coordinates.
"""

from __future__ import annotations

from ray.data import Dataset

from engine.pages import pages_parquet, sf_to_n_rows
from engine.pipeline import cell_day_rollup, cell_rollup, densest_cells, enrich_pages
from engine.shuffle import grouped_count_sums


def _pages(sf_dir: str) -> str:
    return pages_parquet(sf_to_n_rows(sf_dir))


def q_geo_enriched(sf_dir: str) -> Dataset:
    """Full flagship enrichment: extract -> project (both grids) ->
    geoid -> AFT -> cell -> PIP -> kNN. Registered as
    ``geo_enriched_full`` (full-precision floats, rows-only): the
    in-window ``geo_enriched`` gate entry is the quantized SQL-value
    variant (engine/geo_pipeline_oracle.q_geo_enriched) over the same
    chain — this one keeps the full-precision contract for library
    consumers and pytest."""
    ds = enrich_pages(_pages(sf_dir))
    return ds.select_columns(
        [
            "url",
            "lang",
            "fi",
            "la",
            "system",
            "x_d96",
            "y_d96",
            "x_d48",
            "y_d48",
            "x_d96_aft",
            "y_d96_aft",
            "H_orth",
            "cell",
            "muni_id",
        ]
    )


def q_geo_cell_rollup(sf_dir: str) -> Dataset:
    return cell_rollup(enrich_pages(_pages(sf_dir)))


def q_geo_densest_cells(sf_dir: str) -> Dataset:
    return densest_cells(enrich_pages(_pages(sf_dir)), k=20)


def q_geo_muni_rollup(sf_dir: str) -> Dataset:
    """Pages per municipality (PIP join then combiner aggregate)."""
    ds = enrich_pages(_pages(sf_dir)).select_columns(["muni_id", "H_orth"])
    return grouped_count_sums(ds, key="muni_id", mean_cols=("H_orth",))


def q_geo_cell_day(sf_dir: str) -> Dataset:
    """Pages per (cell, warc day) — the §2.7 event-time window."""
    return cell_day_rollup(enrich_pages(_pages(sf_dir)))


GEO_REGISTRY = {
    "geo_cell_day": q_geo_cell_day,
    "geo_enriched_full": q_geo_enriched,
    "geo_cell_rollup": q_geo_cell_rollup,
    "geo_densest_cells": q_geo_densest_cells,
    "geo_muni_rollup": q_geo_muni_rollup,
}


def q_geometry_transform(sf_dir: str):
    """gk-shp equivalent (SURVEY.md §3.2): entity geometry table ->
    explode vertices -> menu-5 transform -> reassemble. Deterministic
    synthetic entities sized from the sf dir; rows-only check (list
    columns + geodesy are non-SQL); exactness is pytest-verified
    against the direct kernel."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from engine.geometry import transform_geometry
    from engine.pages import sf_to_n_rows

    n_ent = max(50, sf_to_n_rows(sf_dir) // 100)
    rng = np.random.default_rng(123)
    # Fully vectorized draws (three C-speed calls instead of a
    # per-entity Python loop that took minutes of driver time at
    # sf >= 1; the fixture stays deterministic, just with a different
    # draw order than the old loop).
    counts = rng.integers(3, 12, n_ent).astype(np.int64)
    total = int(counts.sum())
    flat_x = rng.uniform(80000, 180000, total)
    flat_y = rng.uniform(400000, 600000, total)
    offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    t = pa.table(
        {
            "entity_id": pa.array(np.arange(n_ent, dtype=np.int64)),
            "xs": pa.ListArray.from_arrays(pa.array(offs), pa.array(flat_x)),
            "ys": pa.ListArray.from_arrays(pa.array(offs), pa.array(flat_y)),
        }
    )
    out = transform_geometry(rd.from_arrow(t), transform=5)

    def summarize(b: pa.Table) -> pa.Table:
        # Per-entity centroid straight off the Arrow list buffers:
        # segment sums via add.reduceat over the flat values (the
        # engine.geometry explode idiom) — no per-entity Python loop.
        # Entities always have >= 3 vertices here, so no zero-length
        # segments (reduceat would mis-handle them).
        xs, ys = b["xs"], b["ys"]
        if isinstance(xs, pa.ChunkedArray):
            xs, ys = xs.combine_chunks(), ys.combine_chunks()
        if isinstance(xs, pa.ExtensionArray):
            # Pandas-block ragged arrays arrive as Ray's variable-shaped
            # tensor extension; its storage struct's "data" field is the
            # plain list-of-double array with the offsets we need.
            xs = xs.storage.field("data")
            ys = ys.storage.field("data")
        counts = np.diff(np.asarray(xs.offsets, dtype=np.int64))
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        fx = xs.flatten().to_numpy(zero_copy_only=False)
        fy = ys.flatten().to_numpy(zero_copy_only=False)
        cx = np.add.reduceat(fx, starts) / counts if len(fx) else np.zeros(0)
        cy = np.add.reduceat(fy, starts) / counts if len(fy) else np.zeros(0)
        return pa.table(
            {
                "entity_id": b["entity_id"],
                "n_vertices": b["n_vertices"],
                "cx": pa.array(cx, pa.float64()),
                "cy": pa.array(cy, pa.float64()),
            }
        )

    return out.map_batches(summarize, batch_format="pyarrow")


def q_media_pipeline(sf_dir: str):
    """Tri-modal pipeline over REAL library-free media bytes, all five
    spec-implemented decoders: mixed PPM+BMP images and mixed WAV+AU
    clips each through ONE auto-sniffing actor pool (magic-byte format
    detection — the reference's layout-autodetect idiom; a real mixed
    corpus needs no pre-split by format), plus Y4M video decoded to
    timestamped frames and rolled up per media. Image ⋈ audio ⋈ video
    hash joins on media_id. Rows-only (binary path; decode exactness
    is pytest-verified against known pixels/waveforms/frames and
    golden-byte headers)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from engine.multimodal import (
        DecodeAudio,
        DecodeImage,
        audio_features_stage,
        image_features_stage,
        make_fake_media_table,
    )
    from engine.pages import sf_to_n_rows

    n = max(64, sf_to_n_rows(sf_dir) // 200)

    def shift_ids(off: int):
        def f(b):
            i = b.schema.get_field_index("media_id")
            return b.set_column(i, "media_id", pc.add(b["media_id"], off))

        return f

    def mixed_corpus(fmt_a: str, fmt_b: str, seed_a: int, seed_b: int):
        # One UNION corpus per modality; the auto backend sniffs the
        # format per payload (magic bytes), so ONE actor pool decodes
        # the mixed stream (and a real mixed-format corpus needs no
        # pre-split by format).
        a = make_fake_media_table(n, seed=seed_a, fmt=fmt_a)
        b = make_fake_media_table(n, seed=seed_b, fmt=fmt_b)
        return rd.from_arrow(a).union(
            rd.from_arrow(b).map_batches(shift_ids(n), batch_format="pyarrow")
        )

    imgs = mixed_corpus("ppm", "bmp", 7, 13).map_batches(
        DecodeImage,
        fn_constructor_kwargs=dict(backend="auto"),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, 8),
    )
    imgs = imgs.map_batches(image_features_stage, batch_format="pyarrow")
    auds = mixed_corpus("wav", "au", 11, 17).map_batches(
        DecodeAudio,
        fn_constructor_kwargs=dict(backend="auto"),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, 8),
    )
    auds = auds.map_batches(audio_features_stage, batch_format="pyarrow")

    # Video branch: REAL Y4M luma decode -> one row per sampled frame
    # -> per-media exact-int rollup (sampled-frame count + luma sums).
    from engine.multimodal import DecodeVideo

    vids = rd.from_arrow(make_fake_media_table(2 * n, seed=19, fmt="y4m"))
    frames = vids.map_batches(
        DecodeVideo,
        fn_constructor_kwargs=dict(backend="y4m", every_ms=200, out_hw=(8, 8)),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, 8),
    )

    def frame_partials(b):
        import numpy as np
        import pyarrow as pa

        ids = b["media_id"].to_numpy(zero_copy_only=False)
        fr = b["frame"]
        if hasattr(fr, "combine_chunks"):
            fr = fr.combine_chunks()
        mat = fr.flatten().to_numpy(zero_copy_only=False).reshape(b.num_rows, -1)
        return pa.table(
            {
                "media_id": pa.array(ids),
                "luma_sum": pa.array(mat.sum(axis=1).astype(np.int64)),
            }
        )

    vid_agg = grouped_count_sums(
        frames.map_batches(frame_partials, batch_format="pyarrow"),
        key="media_id",
        sum_cols=("luma_sum",),
    ).map_batches(
        lambda b: b.rename_columns(["media_id", "n_frames", "sum_luma"]),
        batch_format="pyarrow",
    )

    img_sel = imgs.select_columns(["media_id", "width", "height"])
    aud_sel = auds.select_columns(["media_id", "rms_milli", "zero_crossings"])
    from engine.joins import hash_join

    ia = hash_join(img_sel, aud_sel, key="media_id", num_buckets=4, how="inner")
    return hash_join(ia, vid_agg, key="media_id", num_buckets=4, how="inner")


GEO_REGISTRY.update(
    {
        "geometry_transform": q_geometry_transform,
        # The feature-stage variant (resize/rms/zcr/frame-sample
        # rollup) of the tri-modal pipeline; the in-window
        # media_pipeline gate entry is the SQL-value checksum variant
        # (engine/media_oracle.py).
        "media_features": q_media_pipeline,
    }
)
