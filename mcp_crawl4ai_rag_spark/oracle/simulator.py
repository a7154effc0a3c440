"""Sequential crawl simulator — the ordering/state oracle.

A ~150-line single-threaded re-implementation of the reference's frontier
semantics (SURVEY.md §5.2), with the wall-clock nondeterminism replaced by
the deterministic rules our Spark engine also implements:

- frontier order: (priority DESC, discovered_seq ASC) — the reference's
  ``ORDER BY created_at ASC`` FIFO (operations.py:71-77) with an explicit
  monotone sequence instead of timestamps (plus the sitemap-priority axis
  from the north rule; priority=0 everywhere reproduces pure FIFO);
- pop budget: per-host token bucket first (north rule politeness; set
  capacity=∞ to reproduce the reference's architecture-only politeness),
  then global top-``batch_size``;
- dedup-on-insert: first occurrence wins (the reference's
  ``ON CONFLICT DO NOTHING``, operations.py:48-52; its per-page
  ``list(set(...))`` at core.py:461 is hash-order nondeterministic — we
  define first-occurrence order as the deterministic semantics);
- permanent errors delete the row — the URL leaves the seen set and can be
  re-discovered (operations.py:108-122 + core.py:399-409);
- empty content resets to pending (operations.py:100-104), bounded here by
  ``max_attempts`` (None = retry forever like the reference);
- links flow: per-page first-occurrence dedup → canonicalize → malformed
  filter → robots/scope filter → batch first-occurrence dedup → insert
  (core.py:436-449).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from mcp_crawl4ai_rag_spark.functions.markdown import (
    clean_spans_py,
    render_spans_text_py,
)
from mcp_crawl4ai_rag_spark.functions.urls import (
    canonicalize_url_py,
    host_of_py,
    is_error_page_py,
    is_malformed_py,
)


@dataclass
class SimResult:
    crawl_order: list = field(default_factory=list)  # (url, round, seq_in_round)
    documents: dict = field(default_factory=dict)  # url -> rendered text
    doc_spans: dict = field(default_factory=dict)  # url -> cleaned spans
    final_states: dict = field(default_factory=dict)  # url -> pending|fetched
    seen_set: set = field(default_factory=set)
    rounds: int = 0
    metrics: list = field(default_factory=list)  # per-round dicts


def rule_matches_py(path: str, pattern: str) -> bool:
    """RFC 9309 rule match: ``*`` = any char run, trailing ``$`` = end
    anchor, otherwise prefix semantics. Python twin of the engine's
    broadcast-built regex (operators/politeness.py:robots_allowed)."""
    import re as _re

    if "*" in pattern or pattern.endswith("$"):
        anchored = pattern.endswith("$")
        body = _re.escape(pattern[:-1] if anchored else pattern).replace(
            r"\*", ".*"
        )
        return _re.search("^" + body + ("$" if anchored else ""), path) is not None
    return path.startswith(pattern)


def robots_allows(robots: list, url: str) -> bool:
    """Most-specific (longest-pattern) match wins; allow when no rule
    matches; equal-length conflicts resolve to allow (RFC 9309: least
    restrictive) — identical precedence to the engine's
    array_max(struct(len, allow)).

    robots rows: (host, rule_type, path_prefix, crawl_delay).
    """
    host = host_of_py(url)
    after_scheme = url.partition("://")[2]
    path = (
        after_scheme[len(host):]
        if host and after_scheme.lower().startswith(host)
        else "/"
    )
    best = (-1, True)  # (pattern length, is_allow)
    for h, rtype, prefix, _delay in robots:
        if h == host and rule_matches_py(path, prefix):
            cand = (len(prefix), rtype == "allow")
            if cand > best:
                best = cand
    return best[1]


class CrawlSimulator:
    def __init__(
        self,
        corpus: dict,
        seeds: list,
        robots: list | None = None,
        host_budgets: dict | None = None,  # host -> (capacity, refill_rate)
        batch_size: int = 20,
        max_attempts: int | None = 3,
        max_rounds: int = 1000,
    ):
        self.corpus = corpus
        self.seeds = seeds
        self.robots = robots or []
        self.host_budgets = host_budgets or {}
        self.batch_size = batch_size
        self.max_attempts = max_attempts
        self.max_rounds = max_rounds

    def run(self) -> SimResult:
        res = SimResult()
        # frontier: url -> row dict
        frontier: dict[str, dict] = {}
        seq = 0
        tokens = {h: cap for h, (cap, _) in self.host_budgets.items()}

        def insert(url: str, depth: int, priority: int) -> None:
            nonlocal seq
            if url in frontier:
                return
            frontier[url] = {
                "url": url,
                "host": host_of_py(url),
                "depth": depth,
                "priority": priority,
                "seq": seq,
                "state": "pending",
                "attempts": 0,
            }
            seq += 1

        for url, priority in self.seeds:
            cu = canonicalize_url_py(url)
            if not is_malformed_py(cu) and robots_allows(self.robots, cu):
                insert(cu, 0, priority)

        for round_id in range(1, self.max_rounds + 1):
            pending = sorted(
                (r for r in frontier.values() if r["state"] == "pending"),
                key=lambda r: (-r["priority"], r["seq"]),
            )
            if not pending:
                break
            # politeness: per-host token budget, then global top-k
            for h in tokens:
                cap, refill = self.host_budgets[h]
                tokens[h] = min(cap, tokens[h] + (refill if round_id > 1 else 0))
            eligible = []
            taken: dict[str, int] = {}
            for row in pending:
                h = row["host"]
                budget = math.floor(tokens.get(h, float("inf")))
                if taken.get(h, 0) < budget:
                    eligible.append(row)
                    taken[h] = taken.get(h, 0) + 1
            batch = sorted(eligible, key=lambda r: (-r["priority"], r["seq"]))[
                : self.batch_size
            ]
            if not batch:
                break
            res.rounds = round_id
            popped_hosts: dict[str, int] = {}
            m = {
                "round": round_id,
                "popped": len(batch),
                "fetched": 0,
                "dead": 0,
                "retried": 0,
                "links_seen": 0,
                "links_inserted": 0,
            }

            batch_links: list[str] = []
            for i, row in enumerate(batch):
                url = row["url"]
                res.crawl_order.append((url, round_id, i))
                popped_hosts[row["host"]] = popped_hosts.get(row["host"], 0) + 1
                page = self.corpus.get(url)
                status = page["status_code"] if page else 404
                spans = clean_spans_py(page["spans"]) if page else []
                text = render_spans_text_py(spans)
                if is_error_page_py(text, status):
                    del frontier[url]  # dead: leaves the seen set
                    m["dead"] += 1
                    continue
                # contract: "empty" = nothing but Java-regex \s whitespace
                # (matches the engine's regexp_replace(text, '\\s', '') check)
                if not text.strip(" \t\n\x0b\f\r"):
                    row["attempts"] += 1
                    if self.max_attempts is not None and row["attempts"] >= self.max_attempts:
                        del frontier[url]
                        m["dead"] += 1
                    else:
                        m["retried"] += 1  # stays pending
                    continue
                row["state"] = "fetched"
                m["fetched"] += 1
                res.documents[url] = text
                res.doc_spans[url] = spans
                # per-page first-occurrence dedup
                seen_links: list[str] = []
                seen_set: set[str] = set()
                for href in page["out_links"]:
                    if href not in seen_set:
                        seen_set.add(href)
                        seen_links.append(href)
                batch_links.extend((url, row["depth"], href) for href in seen_links)

            m["links_seen"] = len(batch_links)
            inserted_before = seq
            for _parent, pdepth, href in batch_links:
                cu = canonicalize_url_py(href)
                if is_malformed_py(cu):
                    continue
                if not robots_allows(self.robots, cu):
                    continue
                insert(cu, pdepth + 1, 0)
            m["links_inserted"] = seq - inserted_before
            for h, n in popped_hosts.items():
                if h in tokens:
                    tokens[h] -= n
            res.metrics.append(m)

        res.seen_set = set(frontier.keys())
        res.final_states = {u: r["state"] for u, r in frontier.items()}
        return res
