"""Exact duplicated-substring spans: differential vs a brute-force Python
oracle on planted boilerplate, plus edge cases (short docs, within-doc
repeats not counted, adjacent-island merging)."""

from __future__ import annotations

import pytest

from mcp_crawl4ai_rag_spark.operators.dedup import duplicated_token_spans


@pytest.fixture(scope="module")
def spark():
    from mcp_crawl4ai_rag_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _oracle(rows, k=10, min_df=2):
    # brute force: every k-shingle string -> set of docs; merge hit
    # positions <= k apart per doc
    from collections import defaultdict

    docs = {i: t.split(" ") for i, t in rows}
    seen = defaultdict(set)
    for i, toks in docs.items():
        for p in range(len(toks) - k + 1):
            seen[" ".join(toks[p : p + k])].add(i)
    dup = {s for s, ids in seen.items() if len(ids) >= min_df}
    out = set()
    for i, toks in docs.items():
        hits = [p + 1 for p in range(len(toks) - k + 1)
                if " ".join(toks[p : p + k]) in dup]
        if not hits:
            continue
        start = prev = hits[0]
        n = 1
        for p in hits[1:]:
            if p - prev > k:
                out.add((i, start, prev + k - 1, n))
                start, n = p, 0
            prev = p
            n += 1
        out.add((i, start, prev + k - 1, n))
    return out


def test_differential_vs_bruteforce(spark):
    base = "w{} " * 30
    bp = " ".join(f"bp{j}" for j in range(20))  # 20-token shared boilerplate
    rows = []
    for i in range(12):
        body = " ".join(f"u{i}x{j}" for j in range(25))  # unique per doc
        if i % 3 == 0:
            rows.append((i, body + " " + bp))
        elif i % 3 == 1:
            rows.append((i, bp + " " + body))
        else:
            rows.append((i, body))
    rows.append((100, "short doc"))  # < k tokens: no shingles, no crash
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_shingles"])
        for r in duplicated_token_spans(df, "text", "doc_id").collect()
    }
    assert got == _oracle(rows)
    assert got  # boilerplate was actually detected


def test_within_doc_repeat_not_counted(spark):
    # the same 10-token run twice in ONE doc only: distinct-doc df == 1
    run = " ".join(f"r{j}" for j in range(10))
    df = spark.createDataFrame(
        [(1, run + " mid " + run), (2, "totally different text " + " ".join(f"z{j}" for j in range(10)))],
        ["doc_id", "text"],
    )
    assert duplicated_token_spans(df, "text", "doc_id").count() == 0


def test_adjacent_islands_merge(spark):
    # two docs share a 40-token prefix: one maximal span each, not many
    shared = " ".join(f"s{j}" for j in range(40))
    df = spark.createDataFrame(
        [(1, shared + " tail one"), (2, shared + " other ending here")],
        ["doc_id", "text"],
    )
    got = {(r["doc_id"], r["span_start"], r["span_end"])
           for r in duplicated_token_spans(df, "text", "doc_id").collect()}
    assert got == {(1, 1, 40), (2, 1, 40)}


def _oracle_remove(rows, k=10, min_df=2):
    from collections import defaultdict

    docs = {i: t.split(" ") for i, t in rows}
    occ = defaultdict(list)
    for i in sorted(docs):
        toks = docs[i]
        for p in range(len(toks) - k + 1):
            occ[" ".join(toks[p : p + k])].append((i, p + 1))
    removable = defaultdict(set)
    for s, hits in occ.items():
        if len({d for d, _ in hits}) < min_df:
            continue
        for d, p in sorted(hits)[1:]:  # keep the global-first (doc, pos)
            removable[d].add(p)
    out = {}
    for i, toks in docs.items():
        rm = removable.get(i, set())
        kept = [t for j, t in enumerate(toks, start=1)
                if not any(p <= j <= p + k - 1 for p in rm)]
        out[i] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


def test_remove_differential_vs_bruteforce(spark):
    from mcp_crawl4ai_rag_spark.operators.dedup import remove_duplicated_spans

    bp = " ".join(f"bp{j}" for j in range(20))
    rows = []
    for i in range(9):
        body = " ".join(f"u{i}x{j}" for j in range(25))
        rows.append((i, body + " " + bp if i % 3 == 0 else body))
    rows.append((100, "tiny"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["cleaned_text"], r["n_tokens"], r["n_tokens_removed"])
        for r in remove_duplicated_spans(df, "text", "doc_id").collect()
    }
    want = _oracle_remove(rows)
    assert got == want
    # doc 0 keeps its boilerplate (global first occurrence); 3 and 6 lose it
    assert got[0][2] == 0
    assert got[3][2] == 20 and got[6][2] == 20
    assert bp in got[0][0] and bp not in got[3][0]
