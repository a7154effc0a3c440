"""Snapshot table semantics: atomic versioned commits, fast append,
time travel, optimistic concurrency, expiry."""

from __future__ import annotations

import pytest

from mcp_crawl4ai_rag_spark.plans.snapshots import (
    CommitConflict,
    CrawlCheckpoint,
    SnapshotTable,
)


def test_commit_read_roundtrip(spark, tmp_path):
    t = SnapshotTable(str(tmp_path), "t")
    df = spark.range(0, 10)
    info = t.commit(df)
    assert info.version == 1
    assert t.read(spark).count() == 10


def test_fast_append_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path), "t")
    t.commit(spark.range(0, 5))
    t.commit(spark.range(5, 8), mode="append")
    assert t.read(spark).count() == 8
    assert t.read(spark, version=1).count() == 5
    assert len(t.current().paths) == 2  # append added a file, no rewrite


def test_optimistic_concurrency(spark, tmp_path):
    t = SnapshotTable(str(tmp_path), "t")
    t.commit(spark.range(3))
    with pytest.raises(CommitConflict):
        t.commit(spark.range(4), expected_version=0)
    t.commit(spark.range(4), expected_version=1)
    assert t.current().version == 2


def test_expiry_keeps_live_paths(spark, tmp_path):
    t = SnapshotTable(str(tmp_path), "t")
    for i in range(5):
        t.commit(spark.range(i, i + 2))
    t.expire_snapshots(keep=1)
    assert t.read(spark).count() == 2


def test_checkpoint_roundtrip(tmp_path):
    ck = CrawlCheckpoint(str(tmp_path))
    assert ck.load() is None
    ck.save({"round_id": 3, "seq_counter": 42})
    assert ck.load()["seq_counter"] == 42
    p = ck.save_filter(3, b"\x01\x02")
    with open(p, "rb") as f:
        assert f.read() == b"\x01\x02"
