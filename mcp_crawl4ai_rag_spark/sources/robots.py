"""robots.txt text parsing → the engine's broadcast rules table.

The reference has no robots.txt handling at all — its only allow-rule is
the hardcoded scope prefix (core.py:75,444); the north rule generalizes
that to "robots.txt rule evaluation as a broadcast-joined rules table"
(operators/politeness.py:robots_allowed). This module closes the loop from
*raw robots.txt documents* to that table, Spark-first:

- files (or any (host, content) frame — e.g. fetched robots bodies) parse
  in an Arrow-batched ``mapInPandas`` pass, one task per file;
- group selection follows RFC 9309 §2.2.1: the most specific matching
  ``User-agent`` group wins (longest agent token that is a prefix of our
  agent, ``*`` as fallback); multiple user-agent lines stack onto one
  group;
- output rows are exactly the politeness schema
  (host, rule_type, path_prefix, crawl_delay): Allow/Disallow path
  patterns pass through verbatim — RFC 9309 ``*``/``$`` wildcards are
  evaluated by ``robots_allowed`` (regexes compiled once at
  broadcast-build time; plain prefixes keep the startswith fast path) —
  and one synthetic ``(allow, "", delay)`` row carries Crawl-delay so
  ``hosts_from_robots`` can derive token-bucket rates;
- empty Disallow ("Disallow:") means allow-all per the original spec and
  produces no rule row.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROBOTS_RULE_SCHEMA = (
    "host string, rule_type string, path_prefix string, crawl_delay double"
)


def parse_robots_text(text: str, agent: str = "*") -> list[tuple[str, str, float]]:
    """One robots.txt body → [(rule_type, path_prefix, crawl_delay)].

    Returns the rules of the single group selected for ``agent`` (RFC 9309:
    most specific user-agent match; '*' group as fallback; no group ⇒ no
    rules ⇒ allow-all).
    """
    agent_l = agent.lower()
    groups: list[tuple[list[str], list[tuple[str, str, float]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, str, float]] = []
    in_group_body = False

    def flush() -> None:
        nonlocal cur_agents, cur_rules, in_group_body
        if cur_agents:
            groups.append((cur_agents, cur_rules))
        cur_agents, cur_rules, in_group_body = [], [], False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_body:
                flush()
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_group_body = True
            if cur_agents and value:
                cur_rules.append((field, value, float("nan")))
        elif field == "crawl-delay":
            in_group_body = True
            if cur_agents:
                try:
                    cur_rules.append(("crawl-delay", "", float(value)))
                except ValueError:
                    pass
        # unknown fields: ignored, but they do not split a group
    flush()

    best: tuple[int, list[tuple[str, str, float]]] | None = None
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                score = 0
            elif agent_l.startswith(a):
                score = len(a)
            else:
                continue
            if best is None or score > best[0]:
                best = (score, rules)
    return best[1] if best else []


def parse_robots_frame(files: DataFrame, agent: str = "*") -> DataFrame:
    """(host string, content binary) → ROBOTS_RULE_SCHEMA rows.

    Crawl-delay becomes one ``(allow, '', delay)`` row per host (an empty
    prefix matches every path at length 0, so it never wins a longest-
    prefix contest against a real rule — it only carries the delay for
    ``hosts_from_robots``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {k: [] for k in ("host", "rule_type", "path_prefix", "crawl_delay")}
            for host, blob in zip(batch["host"], batch["content"]):
                rules = parse_robots_text(
                    bytes(blob).decode("utf-8", errors="replace"), agent
                )
                delay = next(
                    (d for t, _, d in rules if t == "crawl-delay"), None
                )
                for rtype, prefix, _ in rules:
                    if rtype == "crawl-delay":
                        continue
                    out["host"].append(host)
                    out["rule_type"].append(rtype)
                    out["path_prefix"].append(prefix)
                    out["crawl_delay"].append(delay if delay is not None else 0.0)
                if delay is not None:
                    out["host"].append(host)
                    out["rule_type"].append("allow")
                    out["path_prefix"].append("")
                    out["crawl_delay"].append(delay)
            yield pd.DataFrame(out)

    return files.select("host", "content").mapInPandas(run, ROBOTS_RULE_SCHEMA)


def read_robots_dir(
    spark: SparkSession, paths: list[str] | str, agent: str = "*"
) -> DataFrame:
    """robots.txt files named ``<host>.txt`` → rules table. One parse task
    per file; rule tables are tiny relative to the frontier and broadcast
    at join time (politeness.robots_allowed)."""
    if isinstance(paths, str):
        paths = [paths]
    files = (
        spark.read.format("binaryFile")
        .load(paths)
        .select(
            F.regexp_extract(
                F.element_at(F.split(F.col("path"), "/"), -1), r"^(.*?)\.txt$", 1
            ).alias("host"),
            "content",
        )
    )
    return parse_robots_frame(files, agent)


def parse_robots_sitemaps(text: str) -> list[str]:
    """``Sitemap:`` directives from one robots.txt body. Per the
    sitemaps.org protocol these are GLOBAL — valid anywhere in the file,
    never scoped to a user-agent group — so this is a flat line scan
    (first ``:`` splits the field; the URL's own ``://`` survives)."""
    out = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out


def sitemaps_from_robots(files: DataFrame) -> DataFrame:
    """(host string, content binary) → (host, sitemap_url) — the seed
    DISCOVERY loop: fetched robots.txt bodies advertise their sitemaps,
    which feed sources/seeds.read_seed_sources → CrawlEngine.seed_df
    (priority-ordered frontier inserts). Arrow-batched mapInPandas, one
    task per partition of robots bodies; output is tiny (O(hosts))."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            hosts, urls = [], []
            for host, blob in zip(batch["host"], batch["content"]):
                for u in parse_robots_sitemaps(
                    bytes(blob).decode("utf-8", errors="replace")
                ):
                    hosts.append(host)
                    urls.append(u)
            yield pd.DataFrame({"host": hosts, "sitemap_url": urls})

    return files.select("host", "content").mapInPandas(
        run, "host string, sitemap_url string"
    )
