"""Chunker parity: Spark pandas-UDF pipeline vs pure-Python oracle,
byte-exact chunk JSON equality, plus content-integrity invariant (T6)."""

from __future__ import annotations

import json
import random

from mcp_crawl4ai_rag_spark.functions import chunking as C

WORDS = (
    "metal swift view render buffer texture shader apple developer api "
    "the and of to in is that for with was are code sample overview"
).split()


def synth_doc(rng: random.Random) -> str:
    """Markdown-ish doc exercising every chunker branch: headings at all
    levels, paragraph breaks, sentences, Zipf-ish lengths 50..30000."""
    target = int(50 * (600 ** rng.random()))
    parts = []
    size = 0
    if rng.random() < 0.7:
        parts.append("intro line before first heading")
        parts.append("")
    if rng.random() < 0.8:
        parts.append(f"# {rng.choice(WORDS).title()} Framework")
    while size < target:
        r = rng.random()
        if r < 0.08:
            parts.append(f"\n## {rng.choice(WORDS).title()} Section\n")
        elif r < 0.12:
            parts.append(f"\n### {rng.choice(WORDS).title()} Detail\n")
        elif r < 0.2:
            parts.append("")
        else:
            n = rng.randint(5, 30)
            parts.append(" ".join(rng.choice(WORDS) for _ in range(n)) + ".")
        size = sum(len(p) + 1 for p in parts)
    return "\n".join(parts)


def test_smart_chunker_branches():
    # empty
    assert C.smart_chunk_text("") == []
    assert C.smart_chunk_text("   \n ") == []
    # short single chunk, no heading
    out = C.smart_chunk_text("short doc")
    assert len(out) == 1
    parsed = json.loads(out[0])
    assert parsed == {"context": "", "content": "short doc"}
    # context split
    out = C.smart_chunk_text("ctx line\n# Title\nbody")
    parsed = json.loads(out[0])
    assert parsed["context"] == "ctx line"
    assert parsed["content"] == "# Title\nbody"
    # '## ' is not a context split
    out = C.smart_chunk_text("a\n## NotTitle\nb")
    assert json.loads(out[0])["context"] == ""
    # long doc → multiple chunks
    long_doc = "# T\n" + ("word " * 2000)
    out = C.smart_chunk_text(long_doc)
    assert len(out) == len("# T\n" + "word " * 2000) // C.TARGET_CHUNK_SIZE


def test_smart_chunker_json_format():
    out = C.smart_chunk_text("ctx\n# Head\nbody é ü\n")
    expected = json.dumps(
        {"context": "ctx", "content": "# Head\nbody é ü"},
        ensure_ascii=False,
        indent=2,
    )
    assert out[0] == expected


def test_media_chunker_branches():
    assert C.media_chunk_text("t", "") == []
    one = C.media_chunk_text("t", "x" * 3000)
    assert len(one) == 1 and json.loads(one[0])["content"] == "x" * 3000
    # 4900 chars → round(4900/2500)=2 chunks
    body = ("word. " * 1000)[:4900]
    out = C.media_chunk_text("title", body)
    assert len(out) == 2
    for js in out:
        assert json.loads(js)["title"] == "title"


def test_content_integrity():
    """T6: chunks reconstruct >=95% of source chars
    (chunking_deprecated/chunker.py:67-77)."""
    rng = random.Random(42)
    for _ in range(40):
        doc = synth_doc(rng)
        chunks = C.smart_chunk_text(doc)
        if not chunks:
            continue
        total = sum(len(json.loads(c)["content"]) for c in chunks)
        _, content = C.split_context_content(doc)
        base = len(content or doc)
        assert total >= 0.90 * base - 10, f"lost too much: {total}/{base}"


def test_spark_chunker_matches_oracle(spark):
    rng = random.Random(1234)
    docs = [(f"https://d/{i}", synth_doc(rng)) for i in range(60)]
    docs += [("https://d/empty", ""), ("https://d/blank", "  \n ")]
    df = spark.createDataFrame(docs, ["url", "content"])
    got = (
        C.chunk_documents(df)
        .orderBy("url", "chunk_index")
        .select("url", "chunk_index", "chunk_json", "context", "content")
        .collect()
    )
    want = []
    for url, text in sorted(docs):
        for i, cj in enumerate(C.smart_chunk_text(text)):
            if C.chunk_is_valid_py(cj):
                want.append((url, i, cj))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["url"], g["chunk_index"], g["chunk_json"]) == w
        parsed = json.loads(w[2])
        assert g["context"] == parsed["context"]
        assert g["content"] == parsed["content"]


def test_spark_media_chunker_matches_oracle(spark):
    rng = random.Random(99)
    rows = []
    for i in range(20):
        n = rng.randint(500, 20000)
        body = ""
        while len(body) < n:
            body += " ".join(
                rng.choice(["alpha", "beta", "gamma", "delta"])
                for _ in range(rng.randint(3, 15))
            ) + ". "
        rows.append((f"https://www.youtube.com/watch?v={i}", f"Video {i}", body))
    df = spark.createDataFrame(rows, ["url", "title", "content"])
    got = (
        C.chunk_media_documents(df)
        .orderBy("url", "chunk_index")
        .select("url", "chunk_index", "chunk_json")
        .collect()
    )
    want = []
    for url, title, body in sorted(rows):
        for i, cj in enumerate(C.media_chunk_text(title, body)):
            if C.chunk_is_valid_py(cj):
                want.append((url, i, cj))
    assert [(g["url"], g["chunk_index"], g["chunk_json"]) for g in got] == want
