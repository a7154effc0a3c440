"""URL canonicalization / validation vs pure-Python oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.functions import urls as U

CASES = [
    "https://Developer.Apple.com/Documentation/SwiftUI/",
    "https://developer.apple.com/documentation/swiftui/view?language=objc#overview",
    "HTTP://EXAMPLE.COM/A/B/",
    "https://developer.apple.com/documentation/metal",
    "https://developer.apple.com/documentation/metal/",
    "https://a.com/x//",
    "https://a.com",
    "https://a.com/%ef%bb%bfpath",
    "https://a.com/p?q=1;r=2#frag",
    "https://developer.apple.com/documentation/a/documentation/b",
    "https://a.comhttps://b.com/x",
    "https:/broken.com/x",
    "https://developer.apple.com/documentation/" + "x" * 300,
    "https://a.com/UPPER/Case/Path",
    "ftp://weird.com/file",
    "https://www.youtube.com/watch?v=abc123",
]


def test_canonicalize_batch_kernel_matches_oracle():
    """The vectorized fast path must equal urlparse semantics exactly,
    including fallback shapes (params ';', no scheme, scheme-relative)."""
    import pandas as pd

    from mcp_crawl4ai_rag_spark.functions.urls import canonicalize_batch

    extra = [
        "https://A.com/P;Params=1?q#f",  # path params → fallback
        "//scheme.relative/Path/",
        "not a url at all",
        "mailto:Someone@Example.com",
        "https://a.com/Trailing///",
        "HTTPS://u:P@HOST.com:8080/Path?q=1#f",
        "https://h.com/%2FEncoded/",
        "ftp://Weird.com/File",
        "https://h.com/a//b//",
        "",
    ]
    urls = CASES + extra
    got = canonicalize_batch(pd.Series(urls)).tolist()
    want = [U.canonicalize_url_py(u) for u in urls]
    assert got == want


def test_canonicalize_matches_oracle(spark):
    df = spark.createDataFrame([(u,) for u in CASES], ["url"])
    got = [
        r["c"]
        for r in df.select(U.canonicalize_url(F.col("url")).alias("c"))
        .orderBy("c")
        .collect()
    ]
    want = sorted(U.canonicalize_url_py(u) for u in CASES)
    assert got == want


def test_canonicalize_spark_matches_batch_kernel(spark):
    """The Spark-side canonicalizer must be row-for-row identical to the
    pandas kernel (hence to the urlparse oracle) across fast, hard, and
    pathological shapes: path params, no scheme, scheme-relative, trailing
    CR/LF (regex `$` end-of-line divergence class), non-ASCII
    (locale-casing divergence class), userinfo/port, nulls. Guards any
    future reimplementation (e.g. a JVM fast path) against these classes —
    a JVM-expression hybrid was tried and measured SLOWER (expression
    duplication into downstream filter references multiplies the embedded
    fallback-UDF evaluation), so the pandas UDF stands."""
    import pandas as pd

    edge = [
        "https://A.com/P;Params=1?q#f",  # ';' in path → UDF fallback
        "//scheme.relative/Path/",  # no scheme → fallback
        "not a url at all",
        "mailto:Someone@Example.com",
        "https://a.com/Trailing///",
        "HTTPS://u:P@HOST.com:8080/Path?q=1#f",
        "https://h.com/a//b//",
        "",
        "https://a.com/b\n",  # trailing LF: fast in pandas, hard in JVM
        "https://a.com/b/\n",  # trailing '/' before LF — rstrip divergence class
        "https://a.com/b\r",  # trailing CR: Java $ would match, \\z must not
        "https://a.com#x\r",
        "https://a.com/b\tc",
        "https://BÜCHER.example/Straße/",  # non-ASCII → fallback (casing)
        "https://a.com/İstanbul",  # U+0130 lowercases to 2 codepoints
        "https://a.com/?",
        "https://a.com/#",
        "https://a.com/%2FEncoded/",
        None,
    ]
    urls = CASES + edge
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["c"] for r in df.select(U.canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    want = U.canonicalize_batch(pd.Series(urls, dtype=object)).tolist()
    assert got == [None if w is None or w != w else w for w in want]


def test_malformed_matches_oracle(spark):
    df = spark.createDataFrame([(u,) for u in CASES], ["url"])
    got = {
        r["url"]: r["bad"]
        for r in df.select("url", U.is_malformed(F.col("url")).alias("bad")).collect()
    }
    for u in CASES:
        assert got[u] == U.is_malformed_py(u), u


def test_malformed_known_cases(spark):
    assert U.is_malformed_py("https://a.comhttps://b.com/x")
    assert U.is_malformed_py("https:/broken.com/x")
    assert U.is_malformed_py("https://x/documentation/a/documentation/b")
    assert U.is_malformed_py("https://a.com/" + "y" * 200)
    assert not U.is_malformed_py(U.APPLE_DOCS_PREFIX + "swiftui")


def test_error_page_predicate(spark):
    rows = [
        ("ok content", 200, False),
        ("An unknown error occurred.", 200, True),
        ("x An unknown error occurred. y", 200, True),
        ("whatever", 404, True),
        ("whatever", 403, True),
        ("whatever", 410, True),
        ("whatever", 500, False),
        ("", 200, False),
        ("whatever", None, False),
    ]
    df = spark.createDataFrame(
        [(c, s) for c, s, _ in rows], "content string, status int"
    )
    got = [
        r["err"]
        for r in df.select(
            U.is_permanent_error(F.col("status"), F.col("content")).alias("err")
        ).collect()
    ]
    assert got == [e for _, _, e in rows]
    for c, s, e in rows:
        assert U.is_error_page_py(c, s) == e


def test_url_kind(spark):
    df = spark.createDataFrame(
        [
            (U.APPLE_DOCS_PREFIX + "swiftui",),
            ("https://developer.apple.com/documentation",),
            ("https://www.youtube.com/watch?v=abc",),
            ("https://other.com/x",),
        ],
        ["url"],
    )
    got = [r["k"] for r in df.select(U.url_kind(F.col("url")).alias("k")).collect()]
    assert got == ["web", "web", "media", "other"]
