"""engine/sources.py — JSONL / CSV ingestion round-trips, verified
against DuckDB's independent readers of the same files."""

from __future__ import annotations

import glob
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from engine.sources import (
    jsonl_to_parquet,
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs_table() -> pa.Table:
    return pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang", "text"])


def _sorted_df(df):
    return df.sort_values("doc_id").reset_index(drop=True)


def test_jsonl_roundtrip_and_duckdb_agreement(ray_session, docs_table, tmp_path):
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(rd.from_arrow(docs_table).repartition(4), out)
    files = glob.glob(os.path.join(out, "*"))
    assert len(files) > 1  # one file per block, never one giant file
    back = _sorted_df(read_jsonl(out).to_pandas())
    orig = _sorted_df(docs_table.to_pandas())
    assert back.equals(orig)
    duck = _sorted_df(
        duckdb.sql(
            f"SELECT doc_id, lang, text FROM read_json_auto('{out}/*.json', format='newline_delimited')"
        ).df()
    )
    assert duck.equals(orig)


def test_jsonl_column_projection(ray_session, docs_table, tmp_path):
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(rd.from_arrow(docs_table), out)
    got = read_jsonl(out, columns=["doc_id", "lang"])
    assert set(got.schema().names) == {"doc_id", "lang"}
    assert got.count() == docs_table.num_rows


def test_csv_roundtrip_with_quoting(ray_session, tmp_path):
    """Commas, quotes and newline-free text survive the CSV writer;
    DuckDB reads the same files identically."""
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(['plain', 'has, comma', 'has "quotes" too']),
        }
    )
    out = str(tmp_path / "csv")
    write_csv(rd.from_arrow(t), out)
    back = _sorted_df(read_csv(out).to_pandas())
    assert back.equals(_sorted_df(t.to_pandas()))
    duck = _sorted_df(duckdb.sql(f"SELECT * FROM read_csv_auto('{out}/*.csv')").df())
    assert duck.equals(_sorted_df(t.to_pandas()))


def test_jsonl_to_parquet_ingest(ray_session, docs_table, tmp_path):
    """The one-time ingest conversion: JSONL shards -> partitioned
    parquet with a pinned schema; the parquet then serves pruned
    reads."""
    jl = str(tmp_path / "jl")
    write_jsonl(rd.from_arrow(docs_table).repartition(3), jl)
    out = str(tmp_path / "pq")
    schema = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()), ("text", pa.string())]
    )
    jsonl_to_parquet(jl, out, schema=schema)
    back = pq.read_table(out)
    assert back.schema.equals(schema) or set(back.schema.names) == set(schema.names)
    got = _sorted_df(back.to_pandas()[["doc_id", "lang", "text"]])
    assert got.equals(_sorted_df(docs_table.to_pandas()))
    # pruned read off the converted parquet
    just_ids = pq.read_table(out, columns=["doc_id"])
    assert just_ids.num_rows == docs_table.num_rows


@pytest.mark.usefixtures("ray_session")
def test_orc_and_ipc_roundtrip_with_pruned_reads(tmp_path):
    """ORC and Arrow-IPC sinks write one file per block; the readers
    recover the exact table (values AND dtypes, incl. >2^53 ints) and
    prune columns at the read."""
    import pyarrow.parquet as pq

    from engine.sources import read_ipc, read_orc, write_ipc, write_orc

    src = pq.read_table(
        f"{SF}/documents.parquet",
        columns=["doc_id", "text", "lang"],
    )
    big = src.set_column(
        0, "doc_id", pa.array(src["doc_id"].to_numpy() + (1 << 60), pa.int64())
    )
    ds = rd.from_arrow(big).repartition(3)

    for name, ext, write, read in (
        ("orc", ".orc", write_orc, read_orc),
        ("ipc", ".arrow", write_ipc, read_ipc),
    ):
        out = tmp_path / name
        files = write(ds, str(out))
        assert len(files) == 3 and all(f.endswith(ext) for f in files), files
        back = (
            read(files)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        exp = big.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert back.equals(exp), name
        # pruned read: only the requested columns come back
        pruned = read(files, columns=["doc_id"]).to_pandas()
        assert list(pruned.columns) == ["doc_id"]
        assert sorted(pruned.doc_id) == sorted(exp.doc_id), name
        # a bare str path works (sibling-reader contract, not per-char)
        one = read(files[0]).to_pandas()
        assert len(one) > 0 and set(one.columns) == {"doc_id", "text", "lang"}
        # columns=[] is an explicit empty projection on BOTH readers
        empty = read(files[0], columns=[])
        assert empty.to_pandas().shape[1] == 0, name
