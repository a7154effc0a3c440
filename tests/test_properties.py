"""Property-based tests (hypothesis) for the pure kernels.

These run without Spark: the pandas fast-path canonicalizer must equal the
urlparse oracle on arbitrary inputs, and the chunkers must satisfy their
structural invariants on arbitrary documents.
"""

from __future__ import annotations

import json

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from mcp_crawl4ai_rag_spark.functions import chunking as C
from mcp_crawl4ai_rag_spark.functions import chunking_legacy as L
from mcp_crawl4ai_rag_spark.functions import markdown as M
from mcp_crawl4ai_rag_spark.functions.urls import (
    canonicalize_batch,
    canonicalize_url_py,
)

url_chars = st.text(
    alphabet=st.sampled_from(
        list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
             ":/?#[]@!$&'()*+,;=.-_~% ")
    ),
    max_size=60,
)
scheme = st.sampled_from(["http", "HTTPS", "ftp", "Http"])
host = st.from_regex(r"[A-Za-z0-9.\-]{1,20}", fullmatch=True)
urlish = st.one_of(
    st.builds(
        lambda s, h, p: f"{s}://{h}/{p}",
        scheme,
        host,
        url_chars,
    ),
    url_chars,  # arbitrary garbage
)


@settings(max_examples=300, deadline=None)
@given(st.lists(urlish, min_size=1, max_size=20))
def test_canonicalize_fast_path_equals_oracle(urls):
    got = canonicalize_batch(pd.Series(urls)).tolist()
    want = [canonicalize_url_py(u) for u in urls]
    assert got == want


doc_text = st.text(
    alphabet=st.sampled_from(list("ab #\n.ü—")), min_size=0, max_size=12000
)


@settings(max_examples=150, deadline=None)
@given(doc_text)
def test_smart_chunker_invariants(text):
    chunks = C.smart_chunk_text(text)
    if not text.strip():
        assert chunks == []
        return
    context, content = C.split_context_content(text)
    # every chunk is valid reference-format JSON with the shared context
    parsed = [json.loads(c) for c in chunks]
    assert all(p["context"] == context for p in parsed)
    # chunk count matches the dynamic target
    body = content if content else text
    if len(body) <= C.TARGET_CHUNK_SIZE:
        assert len(chunks) <= 1
    else:
        target = max(1, len(body) // C.TARGET_CHUNK_SIZE)
        assert len(chunks) <= target
    # reconstruction: chunk contents concatenated (ignoring strip losses)
    # never exceed the source and cover it when no stripping occurs
    total = sum(len(p["content"]) for p in parsed)
    assert total <= len(body) + 2 * len(chunks)


@settings(max_examples=150, deadline=None)
@given(doc_text)
def test_legacy_chunker_invariants(text):
    chunks = L.legacy_chunk_text(text)
    if not text.strip():
        assert chunks == []
        return
    for c in chunks:
        p = json.loads(c)
        assert set(p) == {"context", "content"}


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("ab![]()# \n/:")), max_size=400))
def test_markdown_cleaning_oracle_total(text):
    # never raises, never grows the heading count
    out = M.post_process_markdown_py(text)
    assert isinstance(out, str)
    assert len(out.split("\n")) <= len(text.split("\n"))


@settings(max_examples=100, deadline=None)
@given(
    st.text(alphabet=st.sampled_from(list("abc. ")), min_size=0, max_size=15000),
    st.text(max_size=30),
)
def test_media_chunker_invariants(body, title):
    chunks = C.media_chunk_text(title, body)
    if not body.strip():
        assert chunks == []
        return
    parsed = [json.loads(c) for c in chunks]
    assert all(p["title"] == title for p in parsed)
    if len(body) <= C.MAX_CHUNK_SIZE:
        assert len(parsed) == 1 and parsed[0]["content"] == body
    # integrity: >= 95% of characters survive (T6)
    total = sum(len(p["content"]) for p in parsed)
    assert total >= 0.9 * len(body.strip()) - 8


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_sampling_threshold_monotone(r1, r2):
    from mcp_crawl4ai_rag_spark.operators.sampling import rate_threshold_hex

    lo, hi = sorted([r1, r2])
    assert rate_threshold_hex(lo) <= rate_threshold_hex(hi)
    t = rate_threshold_hex(lo)
    assert t == "g" or (len(t) == 12 and all(c in "0123456789abcdef" for c in t))


@settings(max_examples=50, deadline=None)
@given(st.floats(min_value=0.01, max_value=0.99, allow_nan=False), st.integers(0, 3))
def test_sampling_rate_approximates_fraction(rate, salt_i):
    """The hashlib predicate (the exact Spark semantics, proven equal in
    test_sampling) keeps ~rate of a fixed key universe."""
    import hashlib

    from mcp_crawl4ai_rag_spark.operators.sampling import rate_threshold_hex

    thr, salt = rate_threshold_hex(rate), f"s{salt_i}"
    kept = sum(
        1
        for key in range(3000)
        if hashlib.md5((salt + str(key)).encode()).hexdigest()[:12] < thr
    )
    assert abs(kept / 3000 - rate) < 0.05  # ~5 sigma at n=3000


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("aB:/# .\nSitemap")), max_size=300))
def test_robots_sitemap_parse_total(text):
    from mcp_crawl4ai_rag_spark.sources.robots import parse_robots_sitemaps

    out = parse_robots_sitemaps(text)
    assert isinstance(out, list)
    for u in out:
        assert u and not u.startswith("#") and "\n" not in u


text_chars = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Zs")
    ),
    max_size=200,
)


@settings(max_examples=200, deadline=None)
@given(text_chars, text_chars, text_chars)
def test_winnow_md5_shared_substring_guarantee(prefix, common, suffix):
    """The winnowing theorem (Schleimer et al. '03): two docs sharing a
    substring of >= k + window - 1 chars (post-normalization) share at
    least one fingerprint. Built two docs around a planted common block
    long enough to survive whitespace collapsing."""
    from mcp_crawl4ai_rag_spark.functions.text import (
        winnow_fingerprints_md5_py,
    )

    k, window = 8, 6
    # the planted block must still be >= k+window-1 chars after \s+ -> ' '
    # collapsing; use a fixed-length non-space filler around the fuzz
    block = ("q" + common.replace(" ", "x"))[: k + window - 1].ljust(
        k + window - 1, "z"
    )
    a = winnow_fingerprints_md5_py(prefix + " " + block, k, window)
    b = winnow_fingerprints_md5_py(block + " " + suffix, k, window)
    assert set(a) & set(b), (prefix, block, suffix)


@settings(max_examples=200, deadline=None)
@given(text_chars)
def test_winnow_md5_kernel_matches_spec(text):
    """The numpy-windowed kernel must equal a direct spec implementation
    (per-window rightmost argmin, then distinct) on arbitrary text."""
    import hashlib
    import re

    from mcp_crawl4ai_rag_spark.functions.text import (
        winnow_fingerprints_md5_py,
    )

    k, window, hx = 8, 6, 10
    # spec normalization mirrors the kernel/oracle: RE2-ASCII \s class +
    # space-only strip (TRIM)
    t = re.sub(r"[ \t\n\r\f]+", " ", text.lower().strip(" "))
    want: set[int] = set()
    if len(t) >= k:
        hs = [
            int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:hx], 16)
            for i in range(len(t) - k + 1)
        ]
        m = len(hs)
        for w in range(max(m - window + 1, 1)):
            win = hs[w : w + window]
            mn = min(win)
            # rightmost occurrence of the min
            pos = w + max(i for i, h in enumerate(win) if h == mn)
            want.add(hs[pos])
    got = winnow_fingerprints_md5_py(text, k, window, hx)
    assert sorted(got) == sorted(want)
