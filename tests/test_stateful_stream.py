"""Stateful streaming token-bucket admission (applyInPandasWithState):
deterministic epoch-based refill semantics, state carried across
micro-batches, per-host isolation."""

from __future__ import annotations

import json
import time


def expected_admissions(rows, capacity, rate):
    """Sequential oracle: rows = [(host, url, epoch, seq)] in any order."""
    out = {}
    state = {}
    by_host = {}
    for host, url, epoch, seq in rows:
        by_host.setdefault(host, []).append((epoch, seq, url))
    for host, items in by_host.items():
        tokens, last = capacity, None
        for epoch, seq, url in sorted(items):
            if last is None:
                last = epoch
            elif epoch > last:
                tokens = min(capacity, tokens + rate * (epoch - last))
                last = epoch
            ok = tokens >= 1.0
            if ok:
                tokens -= 1.0
            out[(host, url)] = ok
    return out


def run_stream(spark, tmp_path, files, capacity, rate, name):
    from mcp_crawl4ai_rag_spark.streaming.stateful import (
        LINK_EPOCH_SCHEMA,
        token_bucket_admission,
    )

    import os

    links_dir = tmp_path / f"links_{name}"
    links_dir.mkdir()
    base = time.time() - 3600
    for i, rows in enumerate(files):
        p = links_dir / f"b{i}.json"
        with open(p, "w") as f:
            for host, url, epoch, seq in rows:
                f.write(
                    json.dumps(
                        {"host": host, "url": url, "epoch": epoch, "seq": seq}
                    )
                    + "\n"
                )
        # distinct mtimes: the file source orders micro-batches by
        # modification time, and same-ms writes would tie
        os.utime(p, (base + i * 10, base + i * 10))
    stream = spark.readStream.schema(LINK_EPOCH_SCHEMA).option(
        "maxFilesPerTrigger", 1  # force one micro-batch per file
    ).json(str(links_dir))
    q = (
        token_bucket_admission(stream, capacity=capacity, rate=rate)
        .writeStream.format("memory")
        .queryName(f"adm_{name}")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    for _ in range(30):
        if not q.isActive:
            break
        time.sleep(1)
    return {
        (r["host"], r["url"]): r["admitted"]
        for r in spark.sql(f"select * from adm_{name}").collect()
    }


def test_token_bucket_matches_oracle_across_batches(spark, tmp_path):
    cap, rate = 3.0, 1.0
    # epoch 1: 5 urls on hot host (cap 3 → 3 admitted); 1 on cold host
    batch1 = [("hot.com", f"https://hot.com/{i}", 1, i) for i in range(5)] + [
        ("cold.com", "https://cold.com/0", 1, 0)
    ]
    # epoch 2 arrives in a SEPARATE micro-batch: refill 1 token → 1 more
    batch2 = [("hot.com", f"https://hot.com/e2-{i}", 2, i) for i in range(3)] + [
        ("cold.com", "https://cold.com/1", 2, 1)
    ]
    # epoch 5 (3-step gap): refill 3, capped at 3
    batch3 = [("hot.com", f"https://hot.com/e5-{i}", 5, i) for i in range(4)]

    rows = batch1 + batch2 + batch3
    got = run_stream(spark, tmp_path, [batch1, batch2, batch3], cap, rate, "a")
    want = expected_admissions(rows, cap, rate)
    assert got == want
    # sanity on the shape: 3 admitted in epoch 1 on hot, 1 in epoch 2,
    # 3 after the gap refill
    hot_admitted = sorted(u for (h, u), ok in got.items() if h == "hot.com" and ok)
    assert len(hot_admitted) == 7
    assert got[("cold.com", "https://cold.com/0")] is True


def test_single_batch_equals_multi_batch(spark, tmp_path):
    """The same rows in ONE micro-batch produce identical admissions —
    state semantics are batching-invariant."""
    cap, rate = 2.0, 1.0
    rows = (
        [("h.com", f"https://h.com/{i}", 1, i) for i in range(4)]
        + [("h.com", f"https://h.com/e3-{i}", 3, i) for i in range(3)]
    )
    one = run_stream(spark, tmp_path, [rows], cap, rate, "one")
    many = run_stream(
        spark, tmp_path, [rows[:2], rows[2:5], rows[5:]], cap, rate, "many"
    )
    assert one == many == expected_admissions(rows, cap, rate)
