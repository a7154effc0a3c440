"""S12 media source + P11/P12/A8 projections."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.sources import youtube as Y


def test_read_subtitle_dir(spark, tmp_path):
    d = tmp_path / "subs"
    d.mkdir()
    for vid, title, body in [
        ("abc123", "Video One", "sentence one. sentence two."),
        ("xyz789", "Video Two", "more text here."),
    ]:
        with open(d / f"{vid}.json", "w") as f:
            json.dump({"context": title, "content": body}, f)
    docs = Y.read_subtitle_dir(spark, str(d))
    rows = {r["url"]: r for r in docs.collect()}
    assert set(rows) == {
        Y.WATCH_PREFIX + "abc123",
        Y.WATCH_PREFIX + "xyz789",
    }
    assert rows[Y.WATCH_PREFIX + "abc123"]["title"] == "Video One"

    spans = Y.media_documents_as_spans(docs).collect()
    for r in spans:
        assert r["spans"][0]["kind"] == "media"
        assert r["spans"][0]["media_ref"] == r["url"]
        assert r["spans"][1]["kind"] == "text"
        assert r["embed_text"].startswith(r["title"] + "\n\n")


def test_display_url(spark):
    df = spark.createDataFrame(
        [
            ("https://developer.apple.com/documentation/metal/device",),
            ("https://www.youtube.com/watch?v=abc",),
            ("https://other.com/x",),
        ],
        ["url"],
    )
    got = [r["d"] for r in df.select(Y.display_url(F.col("url")).alias("d")).collect()]
    assert got == ["docs:metal/device", "yt:abc", "https://other.com/x"]


def test_token_accounting(spark):
    df = spark.createDataFrame([("a b c",), ("d e",), ("",)], ["t"])
    r = Y.token_accounting(df, "t").collect()[0]
    assert r["total_tokens"] == 5 and r["total_texts"] == 3
