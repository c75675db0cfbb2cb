"""URL canonicalization + canonical-URL dedup (SURVEY §2 X31).

The first dedup stage of every web-crawl pipeline (CCNet, RefinedWeb,
C4 all dedupe or group by URL before touching text): a crawl carries
the same page under many surface URL forms — case-varied scheme/host,
``www.`` prefixes, explicit default ports, tracking query parameters,
reordered query parameters, fragments, trailing slashes.  This module
maps every form to ONE canonical string with pure vectorized Arrow
kernels and reduces per-canonical-URL groups with the engine's
combiner machinery.

Canonical rule (applied to well-formed absolute ``scheme://...`` URLs;
ASCII corpus contract — both engines compare bytewise):

1. strip the fragment (first ``#`` to end);
2. scheme -> lowercase;
3. host -> lowercase, then strip one leading ``www.``;
4. drop the port iff it is the scheme default (http:80, https:443);
5. strip ALL trailing ``/`` from the path (so ``https://h/`` ==
   ``https://h``);
6. query: split on ``&``; drop empty parts and tracking parameters
   (name in ``utm_*``, ``fbclid``, ``gclid``, ``ref``, ``mc_cid``,
   ``mc_eid``); SORT the survivors bytewise; drop the ``?`` when none
   survive.

Both engines implement the rule from the same RE2 patterns (the
pyarrow regex strings transfer verbatim into the DuckDB mirror — the
textops tokenizer precedent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

# One anchored RE2 pattern per URL piece; group `g` is the piece.
# These strings are the SINGLE SOURCE for both engines: the DuckDB
# mirror in engine/queries.py embeds them with (?P<g>) spelled as a
# plain capture group — change them together.
RE_SCHEME = r"^(?P<g>[A-Za-z][A-Za-z0-9+.-]*)://"
RE_HOST = r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<g>[^/:?#]+)"
RE_PORT = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:(?P<g>[0-9]+)"
RE_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(?P<g>/[^?#]*)"
RE_QUERY = r"^[^?]*\?(?P<g>.*)$"
RE_TRACKING = r"^(utm_[a-z0-9]*|fbclid|gclid|ref|mc_cid|mc_eid)(=|$)"


def canonicalize_urls(arr) -> pa.Array:
    """Vectorized canonical form of every URL in a string array.

    Zero Python loops over rows: piece extraction is one RE2 kernel
    per piece, query-parameter filtering is one flat regex match, the
    bytewise parameter sort is one ``np.lexsort`` over the flattened
    (row, param) pairs, and reassembly is ListArray offsets +
    ``binary_join`` (+ ``binary_join_element_wise`` int-free concat —
    the np.char lesson).
    """
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    u0 = pc.replace_substring_regex(arr, "#.*$", "")

    def ext(pattern: str) -> pa.Array:
        return pc.fill_null(pc.struct_field(pc.extract_regex(u0, pattern), "g"), "")

    scheme = pc.ascii_lower(ext(RE_SCHEME))
    host = pc.replace_substring_regex(pc.ascii_lower(ext(RE_HOST)), r"^www\.", "")
    port = ext(RE_PORT)
    path = pc.replace_substring_regex(ext(RE_PATH), "/+$", "")
    query = ext(RE_QUERY)

    default = pc.or_(
        pc.and_(pc.equal(scheme, "http"), pc.equal(port, "80")),
        pc.and_(pc.equal(scheme, "https"), pc.equal(port, "443")),
    )
    portseg = pc.if_else(
        pc.or_(pc.equal(port, ""), default),
        "",
        pc.binary_join_element_wise(":", port, ""),
    )

    # Query params: flatten -> drop empties/tracking -> bytewise sort
    # within each row -> rebuild per-row "&"-joined strings.
    parts = pc.split_pattern(query, "&")
    flat = pc.list_flatten(parts)
    counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    flat_np = flat.to_numpy(zero_copy_only=False)
    tracking = pc.match_substring_regex(flat, RE_TRACKING).to_numpy(
        zero_copy_only=False
    )
    keep = (flat_np != "") & ~tracking.astype(bool)
    rid = np.repeat(np.arange(len(counts), dtype=np.int64), counts)[keep]
    kept = flat_np[keep]
    order = np.lexsort((kept.astype("U"), rid))
    kept_counts = np.bincount(rid, minlength=len(counts)).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int32)
    lists = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(kept[order].tolist(), pa.string())
    )
    qjoin = pc.binary_join(lists, "&")
    qseg = pc.if_else(
        pc.equal(qjoin, ""), "", pc.binary_join_element_wise("?", qjoin, "")
    )
    return pc.binary_join_element_wise(scheme, "://", host, portseg, path, qseg, "")


def canonical_url_dedup(
    ds: Dataset,
    id_col: str = "page_id",
    url_col: str = "url",
    num_partitions: int = 32,
    max_broadcast: int = 8_000_000,
) -> Dataset:
    """Per-row canonical URL + canonical-group verdicts: ``id_col, url,
    canon_url, n_forms (group size), keeper_id (min id of the group),
    is_keeper``.

    Scale shape (100 TB): canonicalization is a ZERO-SHUFFLE map; the
    group reduction ships only (canon_digest u64, id) int pairs into
    :func:`engine.shuffle.grouped_count_sums` (per-block combiner
    partials — a hot canonical URL contributes one partial row per
    block, and ``salts`` protection is available there if crawl dups
    are Zipfian); the merged ``digest -> (cnt, min_id)`` table is
    distinct-canonical-scale and broadcasts once via ``ray.put`` for a
    searchsorted lookup per batch.  Raises above ``max_broadcast``
    distinct groups — the documented swap is the bucketed hash join
    back on the digest (the frequency_cap semi-filter shape).
    Exactness is digest-level (64-bit FNV of the canonical bytes — the
    content_digests precedent); the DuckDB mirror groups by the
    LITERAL canonical string, so the gate cross-checks digest- vs
    text-exactness on the corpus.
    """
    import ray
    import pyarrow.compute as pc

    from engine.dedupe import _fnv1a_tokens
    from engine.shuffle import grouped_count_sums

    def digest_rows(b: pa.Table) -> pa.Table:
        canon = canonicalize_urls(b[url_col])
        d = _fnv1a_tokens(pc.cast(canon, pa.binary()).to_pylist())
        return pa.table(
            {id_col: b[id_col], "canon_digest": pa.array(d.view(np.int64))}
        )

    proj = ds.select_columns([id_col, url_col]).map_batches(
        digest_rows, batch_format="pyarrow"
    )
    groups = grouped_count_sums(
        proj, "canon_digest", min_cols=[id_col], num_partitions=num_partitions
    )
    dparts, cparts, kparts = [], [], []
    for b in groups.iter_batches(batch_size=None, batch_format="pyarrow"):
        dparts.append(b["canon_digest"].to_numpy(zero_copy_only=False))
        cparts.append(b["cnt"].to_numpy(zero_copy_only=False))
        kparts.append(b[f"min_{id_col}"].to_numpy(zero_copy_only=False))
    if dparts:
        d = np.concatenate(dparts)
        if len(d) > max_broadcast:
            raise ValueError(
                f"{len(d)} distinct canonical URLs exceed max_broadcast="
                f"{max_broadcast}; use the bucketed hash-join swap"
            )
        o = np.argsort(d, kind="stable")
        d, cnt, kid = d[o], np.concatenate(cparts)[o], np.concatenate(kparts)[o]
    else:
        d = cnt = kid = np.zeros(0, dtype=np.int64)
    ref = ray.put((d, cnt.astype(np.int64), kid.astype(np.int64)))

    def annotate(b: pa.Table) -> pa.Table:
        dd, cc, kk = ray.get(ref)
        canon = canonicalize_urls(b[url_col])
        h = _fnv1a_tokens(pc.cast(canon, pa.binary()).to_pylist()).view(np.int64)
        pos = np.searchsorted(dd, h)
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        idv = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: ids,
                url_col: b[url_col],
                "canon_url": canon,
                "n_forms": pa.array(cc[pos]),
                "keeper_id": pa.array(kk[pos]),
                "is_keeper": pa.array(kk[pos] == idv),
            }
        )

    return ds.select_columns([id_col, url_col]).map_batches(
        annotate, batch_format="pyarrow"
    )


# --------------------------------------------------------- corpus


def make_messy_urls_table(n: int, seed: int = 23) -> pa.Table:
    """Deterministic messy-URL corpus: every row is a surface form of a
    canonical identity (``truth_canon`` column — oracle ground truth,
    the pages-table idiom; gate queries read only page_id/url).  The
    messy transforms are exactly the rule's invertible set: case, www,
    explicit default ports, tracking params, param reorder, fragments,
    trailing slashes, empty ``&&`` parts, lone ``?``.  Non-default
    ports (:8080) appear in BOTH the truth and the messy form."""
    rng = np.random.default_rng(seed)
    n_sites = max(3, n // 16)
    n_canon = max(2, int(n * 0.6))
    urls, canons = [], []
    track_pool = [
        "utm_source=feed",
        "utm_campaign=x9",
        "utm_",  # bare tracking name, no '='
        "fbclid=AbC123",
        "gclid=zz-7",
        "ref=home",
        "mc_cid=77",
        "mc_eid=e1",
    ]
    for i in range(n):
        k = i % n_canon
        scheme = "https" if k % 4 else "http"
        host = f"site{k % n_sites}.example"
        port = ":8080" if k % 7 == 3 else ""
        path = "" if k % 11 == 0 else f"/a{k % 5}/p{k}"
        params = []
        if k % 13:
            params.append(f"id={k}")
            if k % 3:
                params.append("q=x")
            if k % 5 == 2:
                params.append("b")  # valueless param, kept
        canon_q = "&".join(sorted(params))
        canon = f"{scheme}://{host}{port}{path}" + (f"?{canon_q}" if canon_q else "")
        canons.append(canon)

        # Messy surface form (rng-driven, canonicalizes back to canon).
        s = scheme.upper() if rng.random() < 0.3 else scheme.capitalize() if rng.random() < 0.3 else scheme
        h = host.upper() if rng.random() < 0.25 else host.title() if rng.random() < 0.25 else host
        if rng.random() < 0.4:
            h = "www." + h
        p = port
        if not port and rng.random() < 0.3:
            p = ":443" if scheme == "https" else ":80"
        pth = path
        if rng.random() < 0.3:
            pth = (pth if pth else "") + "/" * int(rng.integers(1, 3))
        q = list(params)
        for t in rng.choice(track_pool, size=int(rng.integers(0, 3)), replace=False):
            q.insert(int(rng.integers(0, len(q) + 1)), t)
        if q and rng.random() < 0.15:
            q.insert(int(rng.integers(0, len(q) + 1)), "")  # "&&" artifact
        if len(q) > 1:
            q = [q[j] for j in rng.permutation(len(q))]
        qs = "&".join(q)
        frag = f"#sec{int(rng.integers(0, 9))}" if rng.random() < 0.3 else ""
        if not qs and rng.random() < 0.1:
            qs_part = "?"  # lone '?', canonically dropped
        else:
            qs_part = f"?{qs}" if qs else ""
        urls.append(f"{s}://{h}{p}{pth}{qs_part}{frag}")
    return pa.table(
        {
            "page_id": pa.array(np.arange(n, dtype=np.int64)),
            "url": pa.array(urls, pa.string()),
            "truth_canon": pa.array(canons, pa.string()),
        }
    )


def urls_corpus_parquet(n: int) -> str:
    """Persist (once, cached) the messy-URL gate corpus so BOTH engines
    read identical bytes (the media_corpus_parquet idiom)."""
    import os

    import pyarrow.parquet as pq

    root = f"/tmp/geokit_weburl/n{n}"
    path = os.path.join(root, "urls.parquet")
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(root, exist_ok=True)
    pq.write_table(make_messy_urls_table(n), path)
    open(done, "w").write("ok")
    return path
