"""Hypothesis property fuzzing of the pure geokit kernels (no Ray):
round-trip and invariant properties on arbitrary in-domain points —
complements the fixed golden vectors (SURVEY.md §5.2 item 2).

Assets are deterministic synthetic (SURVEY.md §7.2).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from geokit.cells import cell_id, cell_parent
from geokit.datums import D48_GK, D96_TM
from geokit.dms import deg2dms, dms2deg
from geokit.tm import tm_fwd, tm_inv

lat = st.floats(min_value=44.0, max_value=48.0, allow_nan=False)
lon = st.floats(min_value=12.0, max_value=18.0, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(fi=lat, la=lon)
def test_tm_roundtrip_1mm(fi, la):
    """tm_inv(tm_fwd(p)) == p within 1 mm (north_star bar) on BOTH
    Slovene projections, for arbitrary in-domain points."""
    for proj in (D96_TM, D48_GK):
        x, y = tm_fwd(np.array([fi]), np.array([la]), proj)
        fi2, la2 = tm_inv(x, y, proj)
        # 1e-8 deg ~ 1 mm
        assert abs(fi2[0] - fi) < 1e-8
        assert abs(la2[0] - la) < 1e-8


@settings(max_examples=200, deadline=None)
@given(dd=st.floats(min_value=-179.999, max_value=179.999, allow_nan=False))
def test_dms_roundtrip_exact(dd):
    d, m, s = deg2dms(np.array([dd]))
    back = dms2deg(d, m, s)[0]
    assert abs(back - dd) < 1e-12
    if dd >= 0:
        assert 0 <= m[0] < 60 and 0 <= s[0] < 60.0000001


@settings(max_examples=200, deadline=None)
@given(fi=lat, la=lon, lvl=st.integers(min_value=1, max_value=27))
def test_cell_parent_containment(fi, la, lvl):
    """A point's cell at level L has the point's coarser cell as its
    ancestor at every parent level (hierarchy consistency)."""
    fia = np.array([fi])
    laa = np.array([la])
    cid = cell_id(fia, laa, lvl)
    for pl in range(0, lvl + 1, max(1, lvl // 3)):
        par = cell_parent(cid, pl)
        direct = cell_id(fia, laa, pl)
        assert par[0] == direct[0], (lvl, pl)


@settings(max_examples=100, deadline=None)
@given(
    fi=lat,
    la=lon,
    h=st.floats(min_value=-100.0, max_value=3000.0, allow_nan=False),
)
def test_helmert_chain_roundtrip_1mm(fi, la, h):
    """fila_wgs2gkxy -> gkxy2fila_wgs round trip <= 1 mm / 1e-8 deg."""
    from geokit.transforms import fila_wgs2gkxy, gkxy2fila_wgs

    x, y, hb = fila_wgs2gkxy(np.array([fi]), np.array([la]), np.array([h]))
    fi2, la2, h2 = gkxy2fila_wgs(x, y, hb)
    assert abs(fi2[0] - fi) < 1e-8
    assert abs(la2[0] - la) < 1e-8
    assert abs(h2[0] - h) < 1e-3


# --- round-3 session-6 text-operator kernels (pure, no Ray) ------------

_words = st.lists(
    st.text(alphabet="abcz019", min_size=1, max_size=4), min_size=0, max_size=30
)


@settings(max_examples=150, deadline=None)
@given(wordlists=st.lists(_words, min_size=1, max_size=6),
       width=st.integers(min_value=1, max_value=5))
def test_fuzz_doc_lines_token_windows(wordlists, width):
    """_doc_lines(token_width=w) equals the scalar splitter (str.split
    + w-chunking) for arbitrary word soup, including empty docs and
    trailing partial windows."""
    import pyarrow as pa

    from engine.dedupe import _doc_lines

    texts = [" ".join(ws) for ws in wordlists]
    flat, nl = _doc_lines(pa.array(texts, pa.string()), width)
    got = flat.to_pylist()
    exp_lines, exp_nl = [], []
    for t in texts:
        toks = t.split()
        ls = [" ".join(toks[i : i + width]) for i in range(0, len(toks), width)]
        exp_lines += ls
        exp_nl.append(len(ls))
    assert got == exp_lines
    assert nl.tolist() == exp_nl


@settings(max_examples=150, deadline=None)
@given(texts=st.lists(st.text(alphabet="abZ 9.!", max_size=40),
                      min_size=1, max_size=6))
def test_fuzz_repetition_signals(texts):
    """repetition_signals_batch equals the Counter oracle on arbitrary
    text incl. all-punctuation and whitespace-only docs."""
    import collections
    import re

    import pyarrow as pa

    from engine.textops import repetition_signals_batch

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = repetition_signals_batch(t).to_pandas().sort_values("doc_id")

    def milli(num, den):
        return int(np.floor(1000.0 * num / max(den, 1) + 0.5))

    for i, s in enumerate(texts):
        toks = re.findall(r"[a-z0-9]+", s.lower())
        tf = collections.Counter(toks)
        bi = collections.Counter(zip(toks, toks[1:]))
        row = out.iloc[i]
        assert row.n_tok_r == len(toks)
        assert row.dup_tok_milli == milli(len(toks) - len(tf), len(toks))
        assert row.top_tok_milli == milli(max(tf.values(), default=0), len(toks))
        assert row.dup_bigram_milli == milli(
            sum(bi.values()) - len(bi), sum(bi.values())
        )


@settings(max_examples=150, deadline=None)
@given(texts=st.lists(st.text(alphabet="ab1 .-@x5", max_size=50),
                      min_size=1, max_size=5))
def test_fuzz_pii_scrub_matches_re(texts):
    """pii_scrub_batch counts and redactions equal Python re (both RE2
    patterns use only syntax with identical re semantics) on arbitrary
    strings from a PII-shaped alphabet."""
    import re

    import pyarrow as pa

    from engine.textops import PII_PATTERNS, pii_scrub_batch

    t = pa.table({"text": pa.array(texts, pa.string())})
    out = pii_scrub_batch(t).to_pandas()
    for i, s in enumerate(texts):
        scrub = s
        for name, pat, repl in PII_PATTERNS:
            assert out[f"n_{name}"][i] == len(re.findall(pat, s)), (name, s)
            scrub = re.sub(pat, repl.replace("\\", "\\\\"), scrub)
        assert out["text_scrubbed"][i] == scrub, s


# --- media codec round-trips (pure, no Ray) ----------------------------

_dims = st.integers(min_value=1, max_value=12)


@settings(max_examples=100, deadline=None)
@given(h=_dims, w=_dims, seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_fuzz_ppm_bmp_roundtrip(h, w, seed):
    """encode->parse is the identity for arbitrary pixel grids in both
    image codecs (BMP exercises every row-padding residue via w)."""
    from engine.multimodal import encode_bmp, encode_ppm, parse_bmp, parse_ppm

    pix = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(parse_ppm(encode_ppm(pix)), pix)
    np.testing.assert_array_equal(parse_bmp(encode_bmp(pix)), pix)


@settings(max_examples=100, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=64),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_fuzz_wav_au_roundtrip(n, seed, rate):
    """encode->parse is the identity for i2-representable samples in
    both audio codecs, including empty clips."""
    from engine.multimodal import encode_au, encode_wav, parse_au, parse_wav

    raw = np.random.default_rng(seed).integers(-32768, 32768, n)
    s = (raw / 32768.0).astype(np.float32)
    back, r = parse_wav(encode_wav(s, rate))
    assert r == rate
    np.testing.assert_array_equal(back, s)
    back, r = parse_au(encode_au(s, rate))
    assert r == rate
    np.testing.assert_array_equal(back, s)


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=6),
    h=st.integers(min_value=1, max_value=6),
    w=st.integers(min_value=1, max_value=6),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_fuzz_y4m_roundtrip(n, h, w, seed):
    """encode->parse recovers luma bit-exact for arbitrary frame
    stacks incl. zero frames (even plane dims per C420)."""
    from engine.multimodal import encode_y4m, parse_y4m

    frames = np.random.default_rng(seed).integers(
        0, 256, (n, 2 * h, 2 * w), dtype=np.uint8
    )
    back, num, den = parse_y4m(encode_y4m(frames, (10, 1)))
    assert (num, den) == (10, 1)
    np.testing.assert_array_equal(back, frames)


# ---------------- session-12 pure kernels (X64 / X65 / X66), no Ray


@settings(max_examples=150, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_skyline_mask_matches_brute(data):
    """X64: the segmented-prefix-max skyline kernel equals the O(n²)
    dominance definition on arbitrary small groups (ties/duplicates
    included)."""
    from engine.skyline import skyline_mask

    g = np.array([t[0] for t in data], np.int64)
    x = np.array([t[1] for t in data], np.int64)
    y = np.array([t[2] for t in data], np.int64)
    keep = skyline_mask(g, x, y)
    for i in range(len(x)):
        dominated = bool(
            (
                (g == g[i])
                & (x >= x[i])
                & (y >= y[i])
                & ((x > x[i]) | (y > y[i]))
            ).any()
        )
        assert keep[i] == (not dominated)


@settings(max_examples=150, deadline=None)
@given(
    a=st.text(alphabet="abcd", max_size=12),
    b=st.text(alphabet="abcd", max_size=12),
)
def test_levenshtein_batch_matches_scalar(a, b):
    """X66: the pair-axis-vectorized DP equals the scalar DP on
    arbitrary short strings (empties included)."""
    from engine.editjoin import _pad_matrix, levenshtein_batch

    am, al = _pad_matrix(np.array([a], object))
    bm, bl = _pad_matrix(np.array([b], object))
    got = int(levenshtein_batch(am, al, bm, bl)[0])
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, dp = dp, [i] + [0] * lb
        for j in range(1, lb + 1):
            dp[j] = min(
                prev[j] + 1, dp[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1])
            )
    assert got == dp[lb]


@settings(max_examples=100, deadline=None)
@given(
    iv=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),
            st.integers(min_value=1, max_value=80),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_sweep_plateau_rule_matches_instant_scan(iv):
    """X65: the max(run, run - d) per-boundary rule equals a direct
    per-instant open-interval count (half-open [s, e)) evaluated at
    every boundary and just before it."""
    s = np.array([t[0] for t in iv], np.int64)
    e = s + np.array([t[1] for t in iv], np.int64)
    bounds = np.concatenate(
        [np.stack([s, np.ones_like(s)], 1), np.stack([e, -np.ones_like(e)], 1)]
    )
    order = np.lexsort((bounds[:, 1], bounds[:, 0]))
    b = bounds[order]
    run = np.cumsum(b[:, 1])
    m = np.maximum(run, run - b[:, 1])

    def level(t):  # direct definition
        return int(((s <= t) & (t < e)).sum())

    got = int(m.max())
    probes = set(b[:, 0].tolist())
    probes |= {t - 1 for t in list(probes)}
    exp = max(level(t) for t in probes if t >= 0)
    assert got == exp
