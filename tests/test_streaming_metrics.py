"""Watermarked windowed fetch metrics: finalized windows match the batch
rollup; late events beyond the watermark are dropped."""

from __future__ import annotations

import json
import os
import time


def write_events(path, rows, mtime):
    with open(path, "w") as f:
        for host, outcome, ts in rows:
            f.write(json.dumps({"host": host, "outcome": outcome, "ts": ts}) + "\n")
    os.utime(path, (mtime, mtime))


def test_windowed_metrics_watermark(spark, tmp_path):
    from mcp_crawl4ai_rag_spark.streaming.metrics import (
        FETCH_EVENT_SCHEMA,
        windowed_fetch_metrics,
    )

    d = tmp_path / "events"
    d.mkdir()
    base = time.time() - 3600
    # batch 1: events inside the 10:00 window
    b1 = [
        ("a.com", "fetched", "2026-01-01T10:00:05Z"),
        ("a.com", "fetched", "2026-01-01T10:00:40Z"),
        ("a.com", "dead", "2026-01-01T10:00:30Z"),
        ("b.com", "fetched", "2026-01-01T10:00:59Z"),
    ]
    # batch 2: an event far ahead — advances the watermark to 10:08
    b2 = [("a.com", "fetched", "2026-01-01T10:10:00Z")]
    # batch 3: pushes the watermark further; the 10:00 window finalizes and
    # its state is evicted during this batch (Spark applies the advanced
    # watermark to eviction one batch before it gates late input rows)
    b3 = [("a.com", "fetched", "2026-01-01T10:12:00Z")]
    # batch 4: a LATE event for the already-finalized 10:00 window — must
    # not re-emit or mutate the published window
    b4 = [("a.com", "fetched", "2026-01-01T10:00:50Z")]
    write_events(d / "b0.json", b1, base)
    write_events(d / "b1.json", b2, base + 10)
    write_events(d / "b2.json", b3, base + 20)
    write_events(d / "b3.json", b4, base + 30)

    stream = (
        spark.readStream.schema(FETCH_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    q = (
        windowed_fetch_metrics(stream, window="1 minute", late_threshold="2 minutes")
        .writeStream.format("memory")
        .queryName("winmetrics")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    for _ in range(30):
        if not q.isActive:
            break
        time.sleep(1)
    got = {
        (str(r["window_start"]), r["host"], r["outcome"]): r["n"]
        for r in spark.sql("select * from winmetrics").collect()
    }
    # only the finalized 10:00 window is emitted; the late b3 event did NOT
    # bump a.com/fetched from 2 to 3; the 10:10 window stays open (no row)
    assert got == {
        ("2026-01-01 10:00:00", "a.com", "fetched"): 2,
        ("2026-01-01 10:00:00", "a.com", "dead"): 1,
        ("2026-01-01 10:00:00", "b.com", "fetched"): 1,
    }

    # batch twin over the ON-TIME rows gives the same finalized window
    batch = spark.createDataFrame(
        [(h, o, t.replace("T", " ").replace("Z", "")) for h, o, t in b1],
        "host string, outcome string, ts_s string",
    ).selectExpr("host", "outcome", "cast(ts_s as timestamp) as ts")
    from mcp_crawl4ai_rag_spark.streaming.metrics import windowed_fetch_metrics as wf

    bat = {
        (str(r["window_start"]), r["host"], r["outcome"]): r["n"]
        for r in wf(batch, window="1 minute").collect()
    }
    assert bat == got
