"""Text-analysis operators for large-scale training-data pipelines:
language ID (stopword/n-gram heuristic), quality scoring, token
counting, document fingerprinting (rolling hash). All vectorized
(RE2 via pyarrow.compute, numpy over fixed-width views); langid and
quality are deliberately SQL-mirrorable so the driver's DuckDB oracle
can value-check them exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Stopword marker sets per language. Tiny by design: the oracle SQL
# mirrors these exact regexes, and the scoring rule (count marker
# hits, argmax with fixed precedence) is deterministic on any corpus.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|a|in|is|it|that|for)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|zu|den)\b",
    "es": r"\b(el|la|los|de|que|y|en|un|por|con)\b",
    "fr": r"\b(le|la|les|de|et|un|une|que|pour|dans)\b",
    "it": r"\b(il|la|di|che|e|un|una|per|con|del)\b",
    "sl": r"\b(je|in|na|se|za|da|so|pri|ki|tudi)\b",
}
LANG_ORDER = list(LANG_MARKERS)  # fixed precedence for ties


def lang_scores(text: pa.ChunkedArray | pa.Array) -> dict[str, np.ndarray]:
    """Marker-hit counts per language (vectorized RE2)."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    return {
        lang: pc.count_substring_regex(text, pat).to_numpy(zero_copy_only=False)
        for lang, pat in LANG_MARKERS.items()
    }


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds ``lang_pred`` (argmax marker count; earlier LANG_ORDER
    entry wins ties; 'und' when zero hits everywhere)."""
    scores = lang_scores(batch[text_col])
    mat = np.stack([scores[l] for l in LANG_ORDER], axis=1)
    best = np.argmax(mat, axis=1)  # first max wins — matches precedence
    pred = np.array(LANG_ORDER, dtype=object)[best]
    pred[mat.max(axis=1) == 0] = "und"
    return batch.append_column("lang_pred", pa.array(pred, pa.string()))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality metrics per document, all exact-int based so aggregates
    are engine-order independent: n_chars_q, n_tokens, n_punct,
    n_digit, alpha_ratio_milli."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    n_tokens = pc.count_substring_regex(text, r"\S+").to_numpy(zero_copy_only=False).astype(np.int64)
    n_punct = pc.count_substring_regex(text, r"[.,!?;:]").to_numpy(zero_copy_only=False).astype(np.int64)
    n_digit = pc.count_substring_regex(text, r"[0-9]").to_numpy(zero_copy_only=False).astype(np.int64)
    n_alpha = pc.count_substring_regex(text, r"[A-Za-z]").to_numpy(zero_copy_only=False).astype(np.int64)
    alpha_ratio_milli = np.floor(1000.0 * n_alpha / np.maximum(n_chars, 1) + 0.5).astype(np.int64)
    return (
        batch.append_column("n_chars_q", pa.array(n_chars))
        .append_column("n_tokens", pa.array(n_tokens))
        .append_column("n_punct", pa.array(n_punct))
        .append_column("n_digit", pa.array(n_digit))
        .append_column("alpha_ratio_milli", pa.array(alpha_ratio_milli))
    )


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace tokens + a BPE-ish subword proxy count (runs of
    lowercase/uppercase/digit/other — the standard pretokenizer split,
    counted with one RE2 pass)."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    ws = pc.count_substring_regex(text, r"\S+")
    bpe = pc.count_substring_regex(text, r"[a-z]+|[A-Z][a-z]*|[0-9]+|[^\sA-Za-z0-9]")
    return batch.append_column(
        "n_ws_tokens", pc.cast(ws, pa.int64())
    ).append_column("n_subword_tokens", pc.cast(bpe, pa.int64()))


def json_field_int(col: pa.Array | pa.ChunkedArray, key: str) -> pa.Array:
    """Vectorized integer-field extraction from a FLAT JSON string
    column (one RE2 pass, no per-row parse) — the semi-structured
    ingestion fast path for telemetry/props payloads whose schema is
    one level deep (the `events.props` shape). Missing keys yield
    null. Nested / escaped-string JSON needs a real parser: route
    it through an actor-pool map_batches stage instead (the
    multimodal-decode pattern); this kernel deliberately matches only
    unquoted integer values."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    import re as _re

    pat = f'"{_re.escape(key)}":\\s*(?P<v>-?\\d+)'
    ext = pc.extract_regex(col, pat)
    return pc.cast(pc.struct_field(ext, "v"), pa.int64())


def token_count_partials(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Map-side combiner of vocabulary building: lowercase →
    ``[a-z0-9]+`` tokens → ONE (token, _cnt) row per DISTINCT token in
    the batch (RE2 split + list_flatten + value_counts, no Python
    loop). The downstream shuffle moves vocabulary-sized partials,
    never per-occurrence rows — at corpus scale the batch vocabulary
    saturates (Heaps' law) so partial size is ~constant per block."""
    flat, _, _ = _flat_tokens(batch[text_col])
    vc = pc.value_counts(flat)
    return pa.table(
        {
            "token": vc.field("values"),
            "_cnt": pc.cast(vc.field("counts"), pa.int64()),
        }
    )


# --- document fingerprinting (rolling hash / winnowing) ---------------

_B = np.uint64(1099511628211)  # FNV prime as rolling base
_MOD_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def rolling_fingerprint(texts: np.ndarray, window: int = 16) -> np.ndarray:
    """Per-document fingerprint: minimum of all w-byte rolling hashes
    (a 1-fingerprint winnowing sketch). Deterministic, order-free under
    content permutation only at window granularity — the standard
    near-dup prefilter primitive.

    Vectorized across the WHOLE BATCH (no per-doc Python loop): all
    docs' bytes concatenate into one buffer; every position's window
    hash H[p] = sum_i byte[p+i]*B^(w-1-i) comes from ``window`` strided
    multiply-adds over the flat buffer; per-doc minima (over windows
    that don't cross doc boundaries) via ``minimum.reduceat``. Values
    bit-identical to the per-doc path (pytest + SQL-oracle checked).
    Docs shorter than the window hash whole-content (rare; tiny loop)."""
    n = len(texts)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    encoded = [t.encode("utf-8") for t in texts]
    lens = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=n)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    buf = np.frombuffer(b"".join(encoded), dtype=np.uint8)
    powers = _B ** np.arange(window - 1, -1, -1, dtype=np.uint64)

    short = lens < window
    with np.errstate(over="ignore"):  # mod-2^64 wrap intended
        for i in np.flatnonzero(short):
            h = np.uint64(14695981039346656037)
            for byte in buf[starts[i] : starts[i] + lens[i]]:
                h = (h * _B + np.uint64(byte)) & _MOD_MASK
            out[i] = np.int64(h >> np.uint64(1))

        wc = np.where(short, 0, lens - window + 1)
        total_w = int(wc.sum())
        if total_w:
            # Horner over byte positions, in place: H = (H*B + byte)
            # twice per position — no powers multiply, no temporaries.
            nflat = len(buf) - window + 1
            hflat = np.zeros(nflat, dtype=np.uint64)
            for i in range(window):
                np.multiply(hflat, _B, out=hflat)
                np.add(hflat, buf[i : i + nflat], out=hflat, casting="unsafe")
            # Per-doc min over [start, start+wc) WITHOUT gathering:
            # interleave segment starts/ends, reduceat, take the even
            # slots (odd slots are the inter-doc gap segments).
            ws = starts[wc > 0]
            we = ws + wc[wc > 0]
            idx = np.empty(2 * len(ws), dtype=np.int64)
            idx[0::2] = ws
            idx[1::2] = we
            trailing = idx[-1] >= nflat  # last end == array end: implicit
            mins = np.minimum.reduceat(hflat, idx[:-1] if trailing else idx)
            out[wc > 0] = (mins[0::2] >> np.uint64(1)).astype(np.int64)
    return out


def fingerprint_batch(batch: pa.Table, text_col: str = "text", window: int = 16) -> pa.Table:
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    fp = rolling_fingerprint(np.array(texts.to_pylist(), dtype=object), window)
    return batch.append_column("fingerprint", pa.array(fp, pa.int64()))


def doc_token_tf_partials(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Per-(doc, token) term frequencies for one batch, fully
    vectorized: split + flatten, dictionary-encode the flat token
    column (Arrow C kernel — no per-token Python objects; the earlier
    pandas path spent its time in ``to_pylist`` on the occurrence
    column, the invindex soak's map side dropped from a
    dominant cost to ~1 s per 65k-doc block), then ONE ``np.unique`` over packed
    (doc position × vocab size + code) int64 keys."""
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    doc_ids, codes, vocab, tf = _doc_token_tf_arrays(ids, text)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "token": vocab.take(pa.array(codes, pa.int64())),
            "tf": pa.array(tf),
        }
    )


def _doc_token_tf_arrays(ids: pa.Array, text: pa.Array):
    """Vectorized per-(doc, token) tf core shared by
    doc_token_tf_partials and the invindex posting-segment combiner:
    returns (doc_ids int64, token codes int64, vocab StringArray,
    tf int64), doc-major order (sorted by (doc position, code))."""
    toks = pc.split_pattern_regex(pc.utf8_lower(text), "[^a-z0-9]+")
    flat = pc.list_flatten(toks)
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    ids_np = ids.to_numpy(zero_copy_only=False).astype(np.int64)
    doc_pos = np.repeat(np.arange(len(ids_np), dtype=np.int64), counts)
    d = pc.dictionary_encode(flat)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = d.dictionary
    keep = np.ones(codes.size, dtype=bool)
    empty_pos = pc.index(vocab, "").as_py()
    if empty_pos >= 0:
        keep = codes != empty_pos
    K = max(1, len(vocab))
    key = doc_pos[keep] * K + codes[keep]
    uniq, tf = np.unique(key, return_counts=True)
    return ids_np[uniq // K], uniq % K, vocab, tf.astype(np.int64)


def contamination_flags(
    ds,
    queries: list[str],
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Benchmark-decontamination flag: marks every document whose text
    contains ANY word-k-gram of any query string (the standard n-gram
    contamination test LLM training pipelines run against eval sets).

    Shape: the query side's k-gram hash set is computed once on the
    driver (query sets are benchmark-scale, thousands of rows) and
    broadcast via ray.put; each doc block re-uses the dedup module's
    flat-shingle kernel (whitespace tokens, FNV-1a, Horner k-gram —
    exact-token, case-sensitive matching; normalize upstream if
    desired) and tests membership with one searchsorted — zero
    shuffles, the corpus never moves. For query sets too large to
    broadcast exactly, swap the sorted array for joins.bloom_build
    (no false negatives; FP-rate flags verified downstream).

    Queries (and docs) with fewer than k tokens fall back to raw
    token hashes — a short query then flags any doc sharing a token,
    matching the shingle kernel's documented short-doc semantics.

    Returns Dataset[id_col, contaminated: bool]."""
    import ray

    from engine.dedupe import _flat_shingles

    qh = np.unique(_flat_shingles(list(queries), k)[0])
    ref = ray.put(qh)  # already sorted by np.unique

    def flag(b: pa.Table) -> pa.Table:
        q = ray.get(ref)
        texts_col = b[text_col]
        if isinstance(texts_col, pa.ChunkedArray):
            texts_col = texts_col.combine_chunks()
        sh, counts = _flat_shingles(texts_col.to_pylist(), k)
        if len(q) and len(sh):
            pos = np.clip(np.searchsorted(q, sh), 0, len(q) - 1)
            m = q[pos] == sh
        else:
            m = np.zeros(len(sh), dtype=bool)
        cm = np.concatenate([[0], np.cumsum(m)])
        ends = np.cumsum(counts)
        hits = cm[ends] - cm[ends - counts]
        return pa.table(
            {
                id_col: b[id_col],
                "contaminated": pa.array(hits > 0),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


def repetition_signals_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Gopher-style repetition quality signals per document (Rae et al.
    2021 §A1.1 repetition filters, re-expressed exact-int so aggregates
    and the SQL oracle are order-free):

      n_tok_r          total ``[a-z0-9]+`` tokens (lowercased — the
                       vocab_topk tokenizer)
      dup_tok_milli    floor(1000·(n_tok − n_distinct)/max(n_tok,1)+.5)
                       — fraction of tokens that are repeats
      top_tok_milli    floor(1000·max_tf/max(n_tok,1)+.5) — mass of the
                       single most frequent token
      dup_bigram_milli same repeat fraction over word bigrams

    Shape: ZERO shuffles — purely per-doc, fused into the scan. One
    flat token array per batch (split + flatten + offsets), per-doc
    term frequencies in one C-speed pandas groupby, bigrams via the
    shifted-slice element-wise join with cross-doc windows masked
    (the ngram_count_partials idiom). Docs with no tokens emit all
    zeros; docs with < 2 tokens have no bigrams (dup_bigram_milli 0).
    """
    import pandas as pd

    ids_col = batch[id_col]
    if isinstance(ids_col, pa.ChunkedArray):
        ids_col = ids_col.combine_chunks()
    flat, doc_of, n = _flat_tokens(batch[text_col])

    n_tok = np.zeros(n, dtype=np.int64)
    n_distinct = np.zeros(n, dtype=np.int64)
    max_tf = np.zeros(n, dtype=np.int64)
    n_bi = np.zeros(n, dtype=np.int64)
    n_bi_distinct = np.zeros(n, dtype=np.int64)
    total = len(flat)
    if total:
        tf = (
            pd.DataFrame({"d": doc_of, "t": flat.to_pandas()})
            .groupby(["d", "t"], sort=False)
            .size()
        )
        per_doc = tf.groupby(level=0)
        agg = per_doc.agg(["sum", "size", "max"])
        idx = agg.index.to_numpy().astype(np.int64)
        n_tok[idx] = agg["sum"].to_numpy()
        n_distinct[idx] = agg["size"].to_numpy()
        max_tf[idx] = agg["max"].to_numpy()
    if total >= 2:
        same_doc = doc_of[1:] == doc_of[:-1]
        if same_doc.any():
            bigrams = pc.binary_join_element_wise(
                flat.slice(0, total - 1), flat.slice(1), " "
            ).filter(pa.array(same_doc))
            bf = (
                pd.DataFrame({"d": doc_of[:-1][same_doc], "b": bigrams.to_pandas()})
                .groupby(["d", "b"], sort=False)
                .size()
            )
            bagg = bf.groupby(level=0).agg(["sum", "size"])
            bidx = bagg.index.to_numpy().astype(np.int64)
            n_bi[bidx] = bagg["sum"].to_numpy()
            n_bi_distinct[bidx] = bagg["size"].to_numpy()

    def milli(num: np.ndarray, den: np.ndarray) -> np.ndarray:
        return np.floor(1000.0 * num / np.maximum(den, 1) + 0.5).astype(np.int64)

    return pa.table(
        {
            id_col: ids_col,
            "n_tok_r": pa.array(n_tok),
            "dup_tok_milli": pa.array(milli(n_tok - n_distinct, n_tok)),
            "top_tok_milli": pa.array(milli(max_tf, n_tok)),
            "dup_bigram_milli": pa.array(milli(n_bi - n_bi_distinct, n_bi)),
        }
    )


def _flat_tokens(text: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, np.ndarray, int]:
    """THE corpus tokenizer, single-sourced: lowercase → split on
    ``[^a-z0-9]+`` → drop empty-string split artifacts. Equivalent to
    SQL ``regexp_extract_all(lower(text), '[a-z0-9]+')`` (the
    vocab_topk-proven identity every text oracle relies on) — change
    it HERE and every operator (vocab/ngram/repetition/LM) plus their
    SQL mirrors must move together.

    Returns ``(flat_tokens, doc_of, n_docs)`` — one Arrow string per
    token in document order, with ``doc_of[i]`` the 0-based row of
    token i."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = len(text)
    toks = pc.split_pattern_regex(pc.utf8_lower(text), "[^a-z0-9]+")
    flat = pc.list_flatten(toks)
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(bool)
    if not keep.all():
        flat = flat.filter(pa.array(keep))
        doc_of = doc_of[keep]
    return flat, doc_of, n


# PII patterns (RE2 — the same engine behind pyarrow.compute AND
# DuckDB's regexp_* functions, so the oracle mirrors these strings
# verbatim). Detection counts are taken on the ORIGINAL text; redaction
# applies sequentially EMAIL → PHONE → IP (placeholders contain no
# digits, so earlier replacements cannot create later matches).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phones", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    ("ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def pii_scrub_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """PII detection + redaction (the scrubbing stage of a training-data
    curation pipeline): appends ``n_emails``/``n_phones``/``n_ips``
    (match counts on the original text) and ``text_scrubbed`` (matches
    replaced by ``[EMAIL]``/``[PHONE]``/``[IP]`` in that order). One
    vectorized RE2 count + one RE2 replace per pattern, zero shuffles —
    at corpus scale this fuses into the scan like the other per-doc
    text kernels."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    out = batch
    scrubbed = text
    for name, pat, repl in PII_PATTERNS:
        cnt = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
        out = out.append_column(f"n_{name}", cnt)
        scrubbed = pc.replace_substring_regex(scrubbed, pat, repl)
    return out.append_column("text_scrubbed", scrubbed)


def ngram_count_partials(batch: pa.Table, n: int = 2, text_col: str = "text") -> pa.Table:
    """Map-side combiner of n-gram vocabulary building: word n-grams
    as space-joined strings, one (ngram, _cnt) row per distinct n-gram
    in the batch. Vectorized: one flat token array for the whole
    batch, n shifted slices joined element-wise, cross-document
    windows masked out via offsets."""
    flat, doc_of, _ = _flat_tokens(batch[text_col])
    total = len(flat)
    if total < n:
        return pa.table({"ngram": pa.array([], pa.string()), "_cnt": pa.array([], pa.int64())})
    window_ok = np.ones(total - n + 1, dtype=bool)
    for j in range(1, n):
        window_ok &= doc_of[j : total - n + 1 + j] == doc_of[: total - n + 1]
    parts = [flat.slice(j, total - n + 1) for j in range(n)]
    joined = parts[0]
    for p in parts[1:]:
        joined = pc.binary_join_element_wise(joined, p, " ")
    grams = joined.filter(pa.array(window_ok))
    vc = pc.value_counts(grams)
    return pa.table(
        {
            "ngram": vc.field("values"),
            "_cnt": pc.cast(vc.field("counts"), pa.int64()),
        }
    )


def bigram_lm_scores(ds, id_col: str = "doc_id", text_col: str = "text", k_smooth: float = 1.0):
    """Bigram language-model quality score per document (the
    perplexity-filter shape of LLM curation, e.g. CCNet/KenLM-style
    scoring — here an add-k bigram LM so everything is exact and
    library-free):

        score(d) = mean over d's bigrams (w1,w2) of
                   log((c(w1,w2) + k) / (c(w1) + k*V))

    Two passes, the TF-IDF broadcast shape:
    1. TRAIN — ONE read of the corpus emits both unigram and bigram
       count partials per block (the vocab_topk / bigram_topk
       combiners, unioned with an ``n`` order column so a SINGLE
       coarse keyed merge carries both; the shuffle moves
       vocabulary-sized partials, never occurrences); the merged
       tables are vocabulary-scale (Heaps' law) and broadcast ONCE via
       ray.put as sorted FNV-hash arrays + counts (hash-join swap
       documented for vocabularies too large to broadcast).
    2. SCORE — per block: rebuild each doc's bigram strings with the
       same shifted-slice join, probe both count tables with
       searchsorted, reduce per doc with bincount. Zero additional
       shuffles; float64 ops in a fixed order so results are
       bit-reproducible across partitionings.

    Trained on the scored corpus itself (self-inclusive); pass a
    held-out corpus's Dataset as ``train_ds`` upstream by training
    there and scoring here if leakage matters — the operator's two
    halves compose. Docs with < 2 tokens score 0.0 with n_bigrams 0.

    Returns Dataset[id_col, n_bigrams, lm_logprob_per_bigram]."""
    import ray

    from engine.shuffle import _fnv1a_bytes_vectorized, keyed_partition_map

    import pandas as pd

    def both_partials(b: pa.Table) -> pa.Table:
        u = token_count_partials(b, text_col)
        g = ngram_count_partials(b, 2, text_col)
        return pa.table(
            {
                "gram": pa.concat_arrays(
                    [u["token"].combine_chunks(), g["ngram"].combine_chunks()]
                ),
                "_cnt": pa.concat_arrays(
                    [u["_cnt"].combine_chunks(), g["_cnt"].combine_chunks()]
                ),
                "n": pa.array(
                    np.concatenate(
                        [
                            np.ones(len(u), dtype=np.int8),
                            np.full(len(g), 2, dtype=np.int8),
                        ]
                    )
                ),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["n", "gram"], sort=False)["_cnt"].sum().reset_index()
        return pd.DataFrame(
            {"n": g["n"], "gram": g["gram"], "cnt": g["_cnt"].astype(np.int64)}
        )

    # An n-gram "alpha beta" can never collide with a unigram (tokens
    # contain no spaces), but the n column keeps the contract explicit
    # and the split below O(1).
    counts = keyed_partition_map(
        ds.map_batches(both_partials, batch_format="pyarrow"),
        ["n", "gram"],
        merge,
        num_partitions=16,
        out_schema=pa.schema(
            [("n", pa.int8()), ("gram", pa.string()), ("cnt", pa.int64())]
        ),
    ).to_pandas()
    uni = counts[counts["n"] == 1].rename(columns={"gram": "token"})
    bi = counts[counts["n"] == 2].rename(columns={"gram": "ngram"})

    V = len(uni)
    uh = _fnv1a_bytes_vectorized(pa.array(uni["token"], pa.string()))
    uo = np.argsort(uh)
    bh = _fnv1a_bytes_vectorized(pa.array(bi["ngram"], pa.string()))
    bo = np.argsort(bh)
    ref = ray.put(
        (
            uh[uo],
            uni["cnt"].to_numpy()[uo].astype(np.int64),
            bh[bo],
            bi["cnt"].to_numpy()[bo].astype(np.int64),
            V,
        )
    )

    def lookup(sorted_h: np.ndarray, cnts: np.ndarray, probe: np.ndarray) -> np.ndarray:
        if len(sorted_h) == 0 or len(probe) == 0:
            return np.zeros(len(probe), dtype=np.int64)
        pos = np.clip(np.searchsorted(sorted_h, probe), 0, len(sorted_h) - 1)
        hit = sorted_h[pos] == probe
        out = np.where(hit, cnts[pos], 0)
        return out.astype(np.int64)

    def score(b: pa.Table) -> pa.Table:
        s_uh, s_uc, s_bh, s_bc, v = ray.get(ref)
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat, doc_of, n = _flat_tokens(b[text_col])
        total = len(flat)
        n_bi = np.zeros(n, dtype=np.int64)
        lp = np.zeros(n, dtype=np.float64)
        if total >= 2:
            same = doc_of[1:] == doc_of[:-1]
            if same.any():
                w1 = flat.slice(0, total - 1).filter(pa.array(same))
                grams = pc.binary_join_element_wise(
                    flat.slice(0, total - 1), flat.slice(1), " "
                ).filter(pa.array(same))
                d = doc_of[:-1][same]
                c_bi = lookup(s_bh, s_bc, _fnv1a_bytes_vectorized(grams))
                c_w1 = lookup(s_uh, s_uc, _fnv1a_bytes_vectorized(w1))
                ll = np.log(c_bi + k_smooth) - np.log(c_w1 + k_smooth * v)
                n_bi = np.bincount(d, minlength=n).astype(np.int64)
                lp_sum = np.bincount(d, weights=ll, minlength=n)
                nz = n_bi > 0
                lp[nz] = lp_sum[nz] / n_bi[nz]
        return pa.table(
            {
                id_col: ids,
                "n_bigrams": pa.array(n_bi),
                "lm_logprob_per_bigram": pa.array(lp),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


# -------------------------------------------- context-window chunking


def chunk_batch(
    batch: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    stride: int = 24,
) -> pa.Table:
    """Sliding-window context chunking (training-sample prep): split
    each document's whitespace tokens into windows of ``size`` tokens
    advancing by ``stride`` (overlap = size - stride), the shape used
    to cut long documents into model-context-sized training samples
    without losing cross-boundary spans.

    Chunk rule (exact, integer): a doc with n > 0 tokens emits
    ``1 if n <= size else (n - size + stride - 1) // stride + 1``
    chunks; chunk k covers tokens [k*stride, min(k*stride + size, n)).
    Zero-token docs emit no rows. Tokens are ``\\S+`` spans (the
    line_dedup/_doc_lines contract — case and punctuation preserved so
    chunk_text is faithful text); the SQL mirror slices the same
    ``regexp_extract_all(text, '\\S+')`` list.

    Fully local: one vectorized map pass, zero shuffles, linear at any
    corpus size. Overlapping windows cannot be expressed as ListArray
    offsets (slices must be disjoint), so tokens are GATHERED once via
    a flat take-index vector (~size/stride x token count) and joined
    per chunk — still all-Arrow/numpy, no Python loop.

    Output: id_col, chunk_no, tok_start, n_toks, chunk_text,
    chunk_chars (utf8 chars, = DuckDB length()).
    """
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    # \S+ tokens via split + empty-artifact filter (same equivalence
    # _doc_lines documents: split('\s+') minus '' == extract('\S+')).
    toks = pc.split_pattern_regex(text, r"\s+")
    flat = pc.list_flatten(toks)
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(bool)
    if not keep.all():
        doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)[keep]
        flat = flat.filter(pa.array(keep))
        counts = np.bincount(doc_of, minlength=len(counts)).astype(np.int64)
    n = counts
    k_per_doc = np.where(
        n == 0, 0, np.where(n <= size, 1, (n - size + stride - 1) // stride + 1)
    ).astype(np.int64)
    total_chunks = int(k_per_doc.sum())
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "chunk_no": pa.array([], pa.int64()),
            "tok_start": pa.array([], pa.int64()),
            "n_toks": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
            "chunk_chars": pa.array([], pa.int64()),
        }
    )
    if total_chunks == 0:
        return empty
    doc_of_chunk = np.repeat(np.arange(len(n), dtype=np.int64), k_per_doc)
    k_start = np.concatenate([[0], np.cumsum(k_per_doc)[:-1]])
    chunk_no = np.arange(total_chunks, dtype=np.int64) - np.repeat(k_start, k_per_doc)
    tok_start = chunk_no * stride
    tok_end = np.minimum(tok_start + size, n[doc_of_chunk])
    lens = tok_end - tok_start
    doc_start = np.concatenate([[0], np.cumsum(n)[:-1]])
    abs_start = doc_start[doc_of_chunk] + tok_start
    # Flat gather indices: for chunk i, abs_start[i] .. abs_start[i]+lens[i].
    total_tok = int(lens.sum())
    len_start = np.concatenate([[0], np.cumsum(lens)[:-1]])
    idx = (
        np.arange(total_tok, dtype=np.int64)
        - np.repeat(len_start, lens)
        + np.repeat(abs_start, lens)
    )
    gathered = flat.take(pa.array(idx))
    # int32 offsets: a single batch never gathers 2^31 tokens (batches
    # are block-sized); keeps chunk_text a plain string column.
    offsets = np.append(len_start, total_tok).astype(np.int32)
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), gathered)
    chunk_text = pc.binary_join(lists, " ")
    idv = ids.to_numpy(zero_copy_only=False)[doc_of_chunk]
    return pa.table(
        {
            id_col: pa.array(idv),
            "chunk_no": pa.array(chunk_no),
            "tok_start": pa.array(tok_start),
            "n_toks": pa.array(lens),
            "chunk_text": chunk_text,
            "chunk_chars": pc.cast(pc.utf8_length(chunk_text), pa.int64()),
        }
    )


# ---------------- hashed linear classifier scoring (X41, round 4)
#
# The fastText/CCNet-shaped quality-filter stage: a linear model over
# hashed bag-of-words features, scored per document. Real deployments
# load a trained weight vector (fastText .bin, a logistic head, ...);
# this container has no model artifacts, so the DEFAULT weights are a
# deterministic affine-mod table over the bucket index — integer-exact,
# SQL-mirrorable, and exercising the REAL plumbing end to end:
# the weight vector is broadcast ONCE via ray.put and gathered into
# each scoring actor's __init__ (never re-shipped per batch), scoring
# is one vectorized gather + segmented reduce per batch, and the
# output is exact int64 so any downstream aggregate is order-free.
# Upstream parity: none in GeoCoordinateConverter — brief-mandated
# LLM-pipeline operator (model-scoring family).

CLF_BUCKETS = 1 << 16  # 64k hashed feature buckets (512 KiB int64)
CLF_MULT = 2654435761  # Knuth multiplicative constant
CLF_ADD = 40503
CLF_MOD = 8192
CLF_HALF = CLF_MOD // 2


def clf_default_weights(n_buckets: int = CLF_BUCKETS) -> np.ndarray:
    """Deterministic stand-in weight table: w[b] = (b*MULT + ADD) %
    MOD - MOD/2, int64 in [-4096, 4096). The SQL oracle recomputes the
    same formula inline (change together)."""
    b = np.arange(n_buckets, dtype=np.int64)
    return (b * CLF_MULT + CLF_ADD) % CLF_MOD - CLF_HALF


class HashedLinearScorer:
    """Actor-pool stage: per-doc integer score = sum over whitespace
    tokens of weights[fnv1a(token) % n_buckets], label = score > 0.

    ``weights_ref``: a ``ray.put`` ObjectRef to the int64 weight
    vector — fetched once per actor in ``__init__`` (zero-copy from
    the local object store on every node that runs a scoring task),
    NOT per batch. Pass ``weights_ref=None`` for the deterministic
    default table (built locally, no broadcast needed at 512 KiB).
    """

    def __init__(
        self,
        weights_ref=None,
        id_col: str = "doc_id",
        text_col: str = "text",
        threshold: int = 0,
    ):
        if weights_ref is None:
            self.w = clf_default_weights()
        else:
            import ray

            self.w = ray.get(weights_ref)
        self.n_buckets = np.uint64(len(self.w))
        self.id_col, self.text_col = id_col, text_col
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from engine.dedupe import _token_hashes_batch

        texts = batch[self.text_col].to_pylist()
        th, counts = _token_hashes_batch(texts)
        bucket = (th % self.n_buckets).astype(np.int64)
        tok_w = self.w[bucket]
        # Segmented per-doc sum: reduceat over the flat token weights.
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        scores = np.zeros(len(texts), dtype=np.int64)
        nz = counts > 0
        if nz.any():
            # reduceat needs strictly valid start offsets; compute on
            # the non-empty docs only (empty docs keep score 0).
            scores[nz] = np.add.reduceat(tok_w, starts[nz].astype(np.int64))
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_toks": pa.array(counts),
                "clf_score": pa.array(scores),
                "clf_label": pa.array(scores > self.threshold),
            }
        )


def classifier_scores(
    ds,
    weights: np.ndarray | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: int = 0,
):
    """Score every document with the hashed linear model (see
    HashedLinearScorer). ``weights`` (optional) is broadcast once via
    ``ray.put``; omitted -> the deterministic default table."""
    import ray

    ref = ray.put(weights) if weights is not None else None
    return ds.map_batches(
        HashedLinearScorer,
        fn_constructor_kwargs=dict(
            weights_ref=ref, id_col=id_col, text_col=text_col, threshold=threshold
        ),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )
