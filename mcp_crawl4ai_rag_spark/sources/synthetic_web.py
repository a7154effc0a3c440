"""Deterministic synthetic web (FIXTURES.md §1-§5).

Replaces the reference's live HTTP fetch (apple_stealth_crawler.py:266-311)
with a joinable corpus table: multi-host graph, one hot host (~50% of URLs,
skew-salting test), BFS depth >= 4, cycles, canonicalization variants,
malformed links, robots-disallowed paths, permanent-error and empty-content
pages.

Everything derives from a seeded RNG; the same Python structures feed BOTH
the Spark corpus DataFrame and the sequential oracle simulator, so equality
tests compare two executions of identical input.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

CORPUS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("status_code", IntegerType(), False),
        StructField("spans", ArrayType(SPAN_STRUCT), False),
        StructField("out_links", ArrayType(StringType()), False),
    ]
)

WORDS = (
    "metal swift view render buffer texture shader scene audio video "
    "network storage index query stream batch vector tensor graph node"
).split()


@dataclass
class SyntheticWeb:
    corpus: dict = field(default_factory=dict)  # url -> page dict
    seeds: list = field(default_factory=list)  # [(url, priority)]
    robots: list = field(default_factory=list)  # [(host, rule_type, path_prefix, crawl_delay)]
    hosts: list = field(default_factory=list)  # [(host, capacity, refill_rate)]

    def corpus_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            (
                p["url"],
                p["host"],
                p["status_code"],
                [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in p["spans"]],
                p["out_links"],
            )
            for p in self.corpus.values()
        ]
        return spark.createDataFrame(rows, CORPUS_SCHEMA)

    def seeds_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.seeds, "url string, priority int")

    def robots_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            self.robots,
            "host string, rule_type string, path_prefix string, crawl_delay double",
        )

    def hosts_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            self.hosts, "host string, capacity double, refill_rate double"
        )


def _make_spans(rng: random.Random, url: str, error_body: bool) -> list[dict]:
    spans: list[dict] = []
    off = 0

    def text_span(t: str, kind: str = "text"):
        nonlocal off
        spans.append({"kind": kind, "text": t, "media_ref": None, "offset": off})
        off += 1

    def media_span():
        nonlocal off
        spans.append(
            {
                "kind": "media",
                "text": "",
                "media_ref": f"media://{url.split('//')[1]}/{off}",
                "offset": off,
            }
        )
        off += 1

    if error_body:
        text_span("An unknown error occurred.")
        return spans

    if rng.random() < 0.6:
        text_span("overview line before the title")
    text_span(f"# {rng.choice(WORDS).title()} Reference", "heading")
    n = rng.randint(3, 14)
    for _ in range(n):
        r = rng.random()
        if r < 0.18:
            media_span()
        elif r < 0.3:
            text_span(f"## {rng.choice(WORDS).title()} [{rng.choice(WORDS)}](https://x/{rng.randint(0,9)})", "heading")
        elif r < 0.38:
            text_span(f"see ![fig](https://img/{rng.randint(0,99)}.png) and [link]({url}) text")
        else:
            k = rng.randint(4, 40)
            text_span(" ".join(rng.choice(WORDS) for _ in range(k)) + ".")
    if rng.random() < 0.2:
        text_span(rng.choice(["## Topics", "## See Also"]), "heading")
        text_span("trailing content that must be truncated away")
    return spans


def _link_variants(rng: random.Random, url: str) -> str:
    """Raw href that canonicalizes back to `url`."""
    r = rng.random()
    if r < 0.25:
        scheme, rest = url.split("://", 1)
        host, _, path = rest.partition("/")
        return f"{scheme.upper()}://{host.upper()}/{path}"
    if r < 0.45:
        return url + "/"
    if r < 0.6:
        return url + "?session=1&x=2"
    if r < 0.7:
        return url + "#fragment"
    if r < 0.8:
        return url.replace("/doc", "/DOC", 1)
    return url


def generate_web(
    seed: int = 42,
    n_hosts: int = 8,
    n_pages: int = 300,
    n_seeds: int = 3,
    p_permanent_error: float = 0.05,
    p_error_body: float = 0.01,
    p_empty: float = 0.02,
    out_degree: tuple[int, int] = (2, 10),
    with_robots: bool = True,
) -> SyntheticWeb:
    rng = random.Random(seed)
    hosts = ["docs.example.com"] + [f"h{i}.example.org" for i in range(1, n_hosts)]

    # hot-host skew: host 0 holds ~half the pages
    urls: list[str] = []
    for i in range(n_pages):
        host = hosts[0] if rng.random() < 0.5 else rng.choice(hosts[1:])
        seg = rng.choice(WORDS)
        if with_robots and rng.random() < 0.08:
            urls.append(f"https://{host}/private/{seg}/{i}")
        else:
            urls.append(f"https://{host}/documentation/{seg}/{i}")

    web = SyntheticWeb()
    by_host: dict[str, list[str]] = {}
    for u in urls:
        by_host.setdefault(u.split("/")[2], []).append(u)
    for i, url in enumerate(urls):
        r = rng.random()
        if r < p_permanent_error:
            status = rng.choice([403, 404, 410])
            error_body = False
        elif r < p_permanent_error + p_error_body:
            status, error_body = 200, True
        elif r < p_permanent_error + p_error_body + p_empty:
            status, error_body = 200, False
        else:
            status, error_body = 200, False
        empty = p_permanent_error + p_error_body <= r < p_permanent_error + p_error_body + p_empty

        # outgoing links: mostly same-host (BFS locality), some cross-host,
        # canonicalization variants, dups, malformed injections
        deg = rng.randint(*out_degree)
        raw_links: list[str] = []
        for _ in range(deg):
            cands = by_host[url.split("/")[2]] if rng.random() < 0.75 else urls
            target = rng.choice(cands)
            raw_links.append(_link_variants(rng, target))
        if rng.random() < 0.3 and raw_links:
            raw_links.append(raw_links[0])  # in-page duplicate
        if rng.random() < 0.1:
            raw_links.append("https://evil.comhttps://evil.com/x")  # malformed
        if rng.random() < 0.05:
            raw_links.append("https://long.example.com/" + "z" * 250)
        if rng.random() < 0.05:
            raw_links.append(f"https://{url.split('/')[2]}/%ef%bb%bf/bom")

        host = url.split("/")[2]
        web.corpus[url] = {
            "url": url,
            "host": host,
            "status_code": status,
            "spans": [] if empty else _make_spans(rng, url, error_body),
            "out_links": raw_links,
        }

    # seeds: first page of the hot host + random others (canonical, fetchable)
    ok_urls = [u for u in urls if web.corpus[u]["status_code"] == 200 and web.corpus[u]["spans"]]
    seeds = [ok_urls[0]]
    while len(seeds) < min(n_seeds, len(ok_urls)):
        c = rng.choice(ok_urls)
        if c not in seeds:
            seeds.append(c)
    web.seeds = [(u, 0) for u in seeds]

    if with_robots:
        for h in hosts:
            web.robots.append((h, "disallow", "/private/", 0.0))
            web.robots.append((h, "allow", "/", 0.0))

    web.hosts = [(h, 1e9, 1e9) for h in hosts]  # default: unlimited budget
    return web


class _CorpusSession:
    """One per-partition fetch session (fake browser context)."""

    def __init__(self, pages: dict):
        import uuid

        self.id = uuid.uuid4().hex
        self.pages = pages
        self.closed = False

    def fetch_batch(self, urls):
        return [self.pages.get(u, (404, [], [])) for u in urls]

    def close(self):
        self.closed = True


class CorpusSessionFetcher:
    """Injected S10 fake for ``fetch_with_partition_sessions``: partition
    sessions backed by the synthetic corpus dict. Each factory call (one per
    non-empty partition) mints a session with a fresh id — tests count
    distinct ``fetch_session`` values to prove per-partition session reuse
    (the apple_stealth_crawler.py:16-21 browser-per-worker analogue)."""

    def __init__(self, corpus: dict):
        self.pages = {
            u: (
                p["status_code"],
                [
                    {
                        "kind": s["kind"],
                        "text": s["text"],
                        "media_ref": s["media_ref"],
                        "offset": s["offset"],
                    }
                    for s in p["spans"]
                ],
                list(p["out_links"]),
            )
            for u, p in corpus.items()
        }

    def __call__(self):
        return _CorpusSession(self.pages)


class _FlakySession(_CorpusSession):
    """A corpus session that fails deterministically: each url in
    ``fail_plan`` errors with its error_class until its per-url counter
    (shared across sessions via the factory) is exhausted. A 'session'
    error also marks this session broken — every later fetch on it fails
    the same way, mimicking a dead browser context."""

    def __init__(self, pages: dict, fail_plan: dict, counters: dict):
        super().__init__(pages)
        self.fail_plan = fail_plan
        self.counters = counters
        self.broken = False

    def fetch_batch(self, urls):
        out = []
        for u in urls:
            if self.broken:
                out.append((0, [], [], "session"))
                continue
            remaining = self.counters.get(u, 0)
            if remaining > 0:
                self.counters[u] = remaining - 1
                err = self.fail_plan[u]
                if err == "session":
                    self.broken = True
                out.append((0, [], [], err))
            else:
                status, spans, links = self.pages.get(u, (404, [], []))
                out.append((status, spans, links, None))
        return out


class FlakyCorpusSessionFetcher(CorpusSessionFetcher):
    """Failure-injecting S10 fake: ``fail_plan`` maps url ->
    (error_class, n_failures) — the url's first n_failures fetch attempts
    return (status 0, no content, error_class); later attempts succeed
    from the corpus. error_class 'session' additionally breaks the session
    it occurred on (reference analogue: apple_stealth_crawler.py:286-311
    recreates the browser instance on connection-closed errors).

    Counters live on the FACTORY (driver-pickled into the closure, shared
    by every session the partition creates), so a recreated session sees
    the remaining failure budget — deterministic regardless of session
    recreation."""

    def __init__(self, corpus: dict, fail_plan: dict):
        super().__init__(corpus)
        self.fail_plan = {u: e for u, (e, _n) in fail_plan.items()}
        self.counters = {u: n for u, (_e, n) in fail_plan.items()}

    def __call__(self):
        return _FlakySession(self.pages, self.fail_plan, self.counters)
