"""Test-set decontamination (training-data extension; no reference
analogue — the GPT-3 appx-C / Gopher §A.3 n-gram overlap rule).

Differential gate: the Spark operator's flags must equal a brute-force
Python n-gram set-overlap computation on the same corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.operators.dedup import decontaminate


def _grams(text: str, n: int) -> set[str]:
    toks = text.split(" ")
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _brute(docs: list[tuple[int, str]], evals: list[str], n: int) -> dict[int, int]:
    eval_grams = set()
    for t in evals:
        eval_grams |= _grams(t, n)
    return {i: len(_grams(t, n) & eval_grams) for i, t in docs}


def _mk_corpus() -> tuple[list[tuple[int, str]], list[str]]:
    base = "the quick brown fox jumps over the lazy dog near the riverbank today"
    leak = "question seven asks what is the capital of france answer paris obviously"
    docs = [
        (0, base),
        (1, "completely unrelated text about spark physical plans and shuffles here"),
        # verbatim eval leak embedded mid-document
        (2, "intro words then " + leak + " trailing words after"),
        # shares only a 5-token prefix of the leak: under n=8, clean
        (3, "question seven asks what is something else entirely different now"),
        # shorter than n tokens: never contaminated
        (4, "tiny doc"),
        # duplicate of a contaminated doc: also contaminated
        (5, "intro words then " + leak + " trailing words after"),
    ]
    evals = [leak, "another benchmark prompt that no training document contains at all"]
    return docs, evals


def test_matches_bruteforce(spark):
    docs, evals = _mk_corpus()
    n = 8
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    ev = spark.createDataFrame([(t,) for t in evals], ["text"])
    got = {
        r["doc_id"]: (r["contaminated_grams"], r["contaminated"])
        for r in decontaminate(df, ev, "text", "doc_id", n=n).collect()
    }
    want = _brute(docs, evals, n)
    assert set(got) == {i for i, _ in docs}
    for i, _ in docs:
        assert got[i] == (want[i], want[i] >= 1), f"doc {i}"
    assert got[2][1] and got[5][1] and not got[0][1] and not got[3][1] and not got[4][1]


def test_min_hits_threshold(spark):
    docs, evals = _mk_corpus()
    n = 8
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    ev = spark.createDataFrame([(t,) for t in evals], ["text"])
    want = _brute(docs, evals, n)
    thresh = max(want.values())  # only the max-overlap docs survive
    got = decontaminate(df, ev, "text", "doc_id", n=n, min_hits=thresh)
    flagged = {r["doc_id"] for r in got.where("contaminated").collect()}
    assert flagged == {i for i, v in want.items() if v >= thresh}


def test_shuffle_join_branch_equals_broadcast(spark):
    docs, evals = _mk_corpus()
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    ev = spark.createDataFrame([(t,) for t in evals], ["text"])
    a = sorted(map(tuple, decontaminate(df, ev, "text", "doc_id").collect()))
    b = sorted(
        map(
            tuple,
            decontaminate(df, ev, "text", "doc_id", broadcast_eval=False).collect(),
        )
    )
    assert a == b


def test_plan_broadcasts_eval_side(spark):
    docs, evals = _mk_corpus()
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    ev = spark.createDataFrame([(t,) for t in evals], ["text"])
    plan = decontaminate(df, ev, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the training-side gram relation must not be broadcast: the semi
    # join's build side is the eval grams (the only broadcast exchange)
    assert plan.count("BroadcastExchange") == 1


def _brute_spans(docs, evals, n):
    """Brute-force surgical removal: cut token j iff some window
    [p, p+n-1] with gram(p) in the eval set covers it."""
    eval_grams = set()
    for t in evals:
        eval_grams |= _grams(t, n)
    out = {}
    for i, t in docs:
        toks = t.split(" ")
        starts = [
            p
            for p in range(len(toks) - n + 1)
            if " ".join(toks[p : p + n]) in eval_grams
        ]
        cut = set()
        for p in starts:
            cut.update(range(p, p + n))
        kept = [tok for j, tok in enumerate(toks) if j not in cut]
        out[i] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


def test_spans_match_bruteforce(spark):
    from mcp_crawl4ai_rag_spark.operators.dedup import decontaminate_spans

    docs, evals = _mk_corpus()
    n = 8
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    ev = spark.createDataFrame([(t,) for t in evals], ["text"])
    got = {
        r["doc_id"]: (r["cleaned_text"], r["n_tokens"], r["n_tokens_removed"])
        for r in decontaminate_spans(df, ev, "text", "doc_id", n=n).collect()
    }
    want = _brute_spans(docs, evals, n)
    assert got == want
    # the surgical property: contaminated docs keep their clean tokens
    # (doc 2 = "intro words then <leak> trailing words after")
    assert got[2][2] > 0 and got[2][0].startswith("intro words")
    assert got[2][0].endswith("after") or got[2][0].endswith("words after")
    # clean docs pass through byte-identical
    assert got[1] == (docs[1][1], len(docs[1][1].split(" ")), 0)


def test_spans_consistent_with_doc_level_flags(spark):
    """A doc loses tokens iff the doc-level operator flags it."""
    from mcp_crawl4ai_rag_spark.operators.dedup import (
        decontaminate,
        decontaminate_spans,
    )

    docs, evals = _mk_corpus()
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    ev = spark.createDataFrame([(t,) for t in evals], ["text"])
    flags = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(df, ev, "text", "doc_id").collect()
    }
    removed = {
        r["doc_id"]: r["n_tokens_removed"]
        for r in decontaminate_spans(df, ev, "text", "doc_id").collect()
    }
    for i in flags:
        assert (removed[i] > 0) == flags[i], i
