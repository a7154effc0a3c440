"""Sitemap / url-list seed sources: parsing, priority mapping, and the
north-rule e2e — sitemap priorities drive crawl order, engine == simulator."""

from __future__ import annotations

from mcp_crawl4ai_rag_spark.operators.crawl import CrawlEngine
from mcp_crawl4ai_rag_spark.oracle.simulator import CrawlSimulator
from mcp_crawl4ai_rag_spark.sources.seeds import (
    parse_sitemap_bytes,
    read_sitemap_seeds,
    read_url_list_seeds,
    sitemap_priority_to_int,
)
from mcp_crawl4ai_rag_spark.sources.synthetic_web import generate_web

SM_NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def urlset_xml(entries):
    body = "".join(
        "<url><loc>%s</loc>%s%s</url>"
        % (
            u,
            f"<priority>{p}</priority>" if p is not None else "",
            f"<lastmod>{lm}</lastmod>" if lm else "",
        )
        for u, p, lm in entries
    )
    return f'<?xml version="1.0" encoding="UTF-8"?><urlset {SM_NS}>{body}</urlset>'


def index_xml(locs):
    body = "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in locs)
    return (
        f'<?xml version="1.0" encoding="UTF-8"?><sitemapindex {SM_NS}>{body}</sitemapindex>'
    )


def test_parse_sitemap_bytes_urlset_and_index():
    urls, children = parse_sitemap_bytes(
        urlset_xml(
            [
                ("https://a/x", 0.9, "2024-01-01"),
                ("https://a/y", None, None),
                ("https://a/z", "bogus", None),
            ]
        ).encode()
    )
    assert urls == [
        ("https://a/x", 0.9, "2024-01-01"),
        ("https://a/y", None, None),
        ("https://a/z", None, None),
    ]
    assert children == []
    urls, children = parse_sitemap_bytes(
        index_xml(["file:///tmp/a.xml", "file:///tmp/b.xml"]).encode()
    )
    assert urls == [] and children == ["file:///tmp/a.xml", "file:///tmp/b.xml"]


def test_priority_mapping():
    assert sitemap_priority_to_int(None) == 500  # sitemaps.org default
    assert sitemap_priority_to_int(1.0) == 1000
    assert sitemap_priority_to_int(0.0) == 0
    assert sitemap_priority_to_int(2.5) == 1000  # clamped
    assert sitemap_priority_to_int(0.123) == 123


def test_read_url_list_seeds(spark, tmp_path):
    (tmp_path / "seeds.txt").write_text(
        "# comment\nhttps://h/one\n\n  https://h/two  \n# more\nhttps://h/three\n"
    )
    rows = (
        read_url_list_seeds(spark, str(tmp_path / "seeds.txt"), priority=7)
        .orderBy("pos")
        .collect()
    )
    assert [(r["pos"], r["raw_url"], r["priority"]) for r in rows] == [
        (0, "https://h/one", 7),
        (1, "https://h/two", 7),
        (2, "https://h/three", 7),
    ]


def test_read_sitemap_seeds_with_index(spark, tmp_path):
    (tmp_path / "child_a.xml").write_text(
        urlset_xml([("https://a/1", 0.2, None), ("https://a/2", 0.8, None)])
    )
    (tmp_path / "child_b.xml").write_text(urlset_xml([("https://b/1", None, None)]))
    (tmp_path / "index.xml").write_text(
        index_xml(
            [f"file://{tmp_path}/child_a.xml", f"file://{tmp_path}/child_b.xml"]
        )
    )
    rows = (
        read_sitemap_seeds(spark, str(tmp_path / "index.xml"))
        .orderBy("source", "pos")
        .collect()
    )
    got = [(r["raw_url"], r["priority"]) for r in rows]
    assert got == [("https://a/1", 200), ("https://a/2", 800), ("https://b/1", 500)]


def test_sitemap_seeded_crawl_matches_oracle(spark, tmp_path):
    """North rule: replay a sitemap fixture — priorities must reorder the
    crawl (max-heap pop), and engine == simulator bit-for-bit."""
    web = generate_web(seed=11, n_hosts=4, n_pages=80, n_seeds=2)
    from mcp_crawl4ai_rag_spark.functions.markdown import (
        clean_spans_py,
        render_spans_text_py,
    )
    from mcp_crawl4ai_rag_spark.functions.urls import is_error_page_py

    def fetchable(page):
        text = render_spans_text_py(clean_spans_py(page["spans"]))
        return (
            page["status_code"] == 200
            and text.strip()
            and not is_error_page_py(text, page["status_code"])
        )

    ok_urls = sorted(u for u, page in web.corpus.items() if fetchable(page))
    chosen = ok_urls[:6]
    # later-listed URLs get HIGHER priority → pop order must invert seed order
    pris = [0.1, 0.2, 0.4, 0.6, 0.8, 1.0]
    (tmp_path / "sm_a.xml").write_text(
        urlset_xml([(u, p, None) for u, p in zip(chosen[:3], pris[:3])])
    )
    (tmp_path / "sm_b.xml").write_text(
        urlset_xml([(u, p, None) for u, p in zip(chosen[3:], pris[3:])])
    )
    seeds_df = read_sitemap_seeds(
        spark, [str(tmp_path / "sm_a.xml"), str(tmp_path / "sm_b.xml")]
    )
    budgets = {h: (1e9, 1e9) for h, _, _ in web.hosts}
    hosts_df = spark.createDataFrame(
        [(h, 1e9, 1e9) for h, _, _ in web.hosts],
        "host string, capacity double, refill_rate double",
    )
    eng = CrawlEngine(
        spark,
        web.corpus_df(spark),
        web.robots_df(spark),
        hosts_df,
        str(tmp_path / "crawl"),
        batch_size=2,
        max_attempts=3,
    )
    n = eng.seed_df(seeds_df, order_cols=["source", "pos"])
    assert n == 6
    eng.run(max_rounds=100)

    # oracle seeded in (source path ASC, pos ASC) order with mapped priorities
    sim_seeds = [
        (u, sitemap_priority_to_int(p)) for u, p in zip(chosen, pris)
    ]
    sim = CrawlSimulator(
        web.corpus,
        sim_seeds,
        robots=web.robots,
        host_budgets=budgets,
        batch_size=2,
        max_attempts=3,
        max_rounds=100,
    ).run()

    got = {
        (r["url"], r["fetch_round"], r["seq_in_round"])
        for r in eng.crawl_order().collect()
    }
    want = {(u, rnd, s) for (u, rnd, s) in sim.crawl_order if u in sim.documents}
    assert got == want
    eng_seen = {r["url"] for r in eng.frontier().select("url").collect()}
    assert eng_seen == sim.seen_set
    # priority actually reordered the crawl: the first fetched page is the
    # highest-priority seed, not the first-listed one
    first = min(want, key=lambda t: (t[1], t[2]))
    assert first[0] == chosen[5]
