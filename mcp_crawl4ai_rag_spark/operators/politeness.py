"""Per-host politeness (token buckets) + robots rules evaluation.

The reference's politeness is architectural — a fixed worker pool
(core.py:86,234-237) and a 5 s per-page delay (apple_stealth_crawler.py:230)
bound per-host request rate because there is exactly one host. The north
rule generalizes this to explicit DataFrame state:

- ``hosts`` table (host, capacity, refill_rate, tokens): refilled each
  round, charged by actual pops; a host's pop budget for a round is
  floor(tokens). Unlimited budget (capacity=∞) degenerates to the
  reference's pure-FIFO behavior.
- robots rules: tiny table broadcast-joined on host; longest
  path-prefix match wins; no matching rule ⇒ allow. The reference's only
  allow-rule is the scope prefix filter (core.py:75,444), which is the
  special case of a single allow rule.

All pure DataFrame ops — the rules join is a broadcast hash join, the
budget is a window rank, nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HOST_RE = r"^[a-z][a-z0-9+.\-]*://([^/]*)"
PATH_RE = r"^[a-z][a-z0-9+.\-]*://[^/]*(/.*)?$"


def with_host_and_path(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Host/path extraction for *canonicalized* URLs (lowercased scheme and
    netloc) — no Python.

    One short anchored regex matches the scheme prefix; host/path then
    come from substring arithmetic (cheaper than running the two long
    extraction regexes over the full URL twice). Rows containing line
    terminators keep the original PATH_RE extraction, because Java's
    ``$`` treats a trailing terminator specially and the substring
    arithmetic would diverge there; all other rows are byte-equivalent
    (pinned by tests/test_robots_source.py)."""
    url = F.col(url_col)
    m = F.regexp_extract(url, r"^[a-z][a-z0-9+.\-]*://", 0)
    rest = F.substring(url, F.length(m) + F.lit(1), F.lit(1 << 30))
    host = F.when(m == "", F.lit("")).otherwise(F.substring_index(rest, "/", 1))
    simple_path = F.substring(
        rest, F.length(host) + F.lit(1), F.lit(1 << 30)
    )
    has_line_term = (
        url.contains("\n") | url.contains("\r") | url.contains("\u0085")
        | url.contains("\u2028") | url.contains("\u2029")
    )
    path = (
        F.when(m == "", F.lit(""))
        .when(has_line_term, F.regexp_extract(url, PATH_RE, 1))
        .otherwise(simple_path)
    )
    return df.withColumn("host", host).withColumn("path", path)


def build_robots_rules(robots: DataFrame) -> DataFrame:
    """Collapse the robots rules table to one array per host, with
    wildcard rules pre-translated to ^-anchored regexes — the broadcast
    side of robots_allowed. Build (and cache()) ONCE for a static rules
    table: a long-running crawl re-evaluates robots every round, and the
    tiny groupBy shuffle + regex translation need not repeat."""
    # ^-anchored regex for wildcard rules: escape specials, * -> .*,
    # a trailing $ (escaped to \$ by the first pass) becomes the anchor
    esc = F.regexp_replace(
        F.col("path_prefix"), r"([.\\+?\[\](){}|^$])", r"\\$1"
    )
    body = F.replace(esc, F.lit("*"), F.lit(".*"))
    anchored = F.when(
        F.col("path_prefix").endswith("$"),
        F.concat(F.lit("^"), F.regexp_replace(body, r"\\\$$", ""), F.lit("$")),
    ).otherwise(F.concat(F.lit("^"), body))
    is_re = F.col("path_prefix").contains("*") | F.col("path_prefix").endswith("$")
    return robots.groupBy("host").agg(
        F.collect_list(
            F.struct(
                F.col("path_prefix").alias("prefix"),
                F.col("rule_type").alias("rtype"),
                is_re.alias("is_re"),
                anchored.alias("pattern"),
            )
        ).alias("__rules")
    )


def compile_robots_predicate(
    rules: DataFrame, max_hosts: int = 64, max_rules: int = 256
) -> "F.Column | None":
    """Compile a SMALL prebuilt rules table into a literal keep-predicate.

    When the whole rules table is tiny, collect it once (bounded probe,
    the budgeted_pop precedent) and emit a chained CASE over literal
    startswith/rlike probes — whole-stage codegen, regexes compiled once,
    and no per-batch broadcast join.

    Measured caveat: on a WIDE admission batch the join+fold path is
    competitive (the broadcast join materializes host/path once, while a
    bare filter lets Catalyst inline the host/path defining expressions
    into every CASE branch — the p2 inlining trap), so robots_allowed
    only takes this path when the caller opts in; the intended user is
    the crawl round's small per-batch frame, where this removes one
    broadcast join + interpreted fold per round.

    Rule semantics replicated exactly: per host, rules ordered by
    (prefix length DESC, allow-first); the first matching rule in that
    order IS the lexicographic max the fold's array_max picks (longest
    match wins, equal-length conflicts resolve to allow); no matching
    rule / unknown host / NULL path ⇒ allow. Returns None when the table
    exceeds the bounds — callers fall back to the join+fold path, which
    is the right shape for a genuinely large rules corpus."""
    rows = rules.limit(max_hosts + 1).collect()
    if len(rows) > max_hosts:
        return None
    if sum(len(r["__rules"]) for r in rows) > max_rules:
        return None
    path = F.col("path")
    host_pred = None
    for r in rows:
        ordered = sorted(
            r["__rules"], key=lambda x: (-len(x["prefix"]), x["rtype"] != "allow")
        )
        chain = None
        for x in ordered:
            m = path.rlike(x["pattern"]) if x["is_re"] else path.startswith(x["prefix"])
            verdict = F.lit(x["rtype"] == "allow")
            chain = F.when(m, verdict) if chain is None else chain.when(m, verdict)
        keep = chain.otherwise(F.lit(True)) if chain is not None else F.lit(True)
        cond = F.col("host") == r["host"]
        host_pred = (
            F.when(cond, keep) if host_pred is None else host_pred.when(cond, keep)
        )
    return host_pred.otherwise(F.lit(True)) if host_pred is not None else F.lit(True)


def robots_allowed(
    df: DataFrame,
    robots: DataFrame | None = None,
    url_col: str = "url",
    prebuilt_rules: DataFrame | None = None,
    compiled: "F.Column | None" = None,
    try_compile: bool = False,
) -> DataFrame:
    """Keep rows whose URL passes robots evaluation.

    df must carry host/path columns (use with_host_and_path). robots:
    (host, rule_type, path_prefix, crawl_delay) — small → broadcast.
    Pass ``prebuilt_rules`` (build_robots_rules output, ideally cached)
    to skip rebuilding the rules aggregation per call.
    RFC 9309 matching: ``*`` matches any char run, a trailing ``$``
    anchors the rule to the path end; most-specific (longest-pattern)
    match wins; no matching rule ⇒ allow; equal-length conflicts resolve
    to allow (RFC: least restrictive).

    Shuffle-free: rules collapse to one array per host (tiny), broadcast
    hash join, then a per-row array fold picks the longest match — no
    window, no repartition, stays in whole-stage codegen except the
    broadcast build. Wildcard rules are translated to anchored regexes
    ONCE at broadcast-build time; plain prefix rules (the common case)
    keep the cheap ``startswith`` probe.
    """
    rules = prebuilt_rules if prebuilt_rules is not None else build_robots_rules(robots)
    if compiled is None and try_compile:
        compiled = compile_robots_predicate(rules)
    if compiled is not None:
        return df.where(compiled)
    joined = df.join(F.broadcast(rules), "host", "left")
    matches = F.filter(
        F.transform(
            F.col("__rules"),
            lambda r: F.when(
                F.when(r["is_re"], F.regexp_like(F.col("path"), r["pattern"]))
                .otherwise(F.col("path").startswith(r["prefix"])),
                F.struct(
                    F.length(r["prefix"]).alias("len"),
                    (r["rtype"] == "allow").alias("allow"),
                ),
            ),
        ),
        lambda m: m.isNotNull(),
    )
    best = F.array_max(matches)
    return (
        joined.withColumn("__best", best)
        .where(F.col("__rules").isNull() | F.col("__best").isNull() | F.col("__best")["allow"])
        .drop("__rules", "__best")
    )


def init_hosts(hosts: DataFrame) -> DataFrame:
    """(host, capacity, refill_rate) → + tokens(=capacity)."""
    return hosts.withColumn("tokens", F.col("capacity"))


def hosts_from_robots(
    robots: DataFrame,
    round_seconds: float = 1.0,
    default_rate: float = 1.0,
    burst_rounds: float = 1.0,
) -> DataFrame:
    """Derive the token-bucket table from robots crawl_delay rules.

    A host's refill rate is round_seconds / max(crawl_delay) tokens per
    round (one fetch per crawl_delay seconds); hosts without a delay rule
    get ``default_rate``. Capacity = rate x burst_rounds (how much unused
    budget may accumulate). This closes the loop robots → politeness that
    the reference approximates with a fixed per-page sleep
    (apple_stealth_crawler.py:230).
    """
    rates = robots.groupBy("host").agg(
        F.max("crawl_delay").alias("max_delay")
    ).select(
        "host",
        F.when(
            F.col("max_delay") > 0, F.lit(float(round_seconds)) / F.col("max_delay")
        )
        .otherwise(F.lit(float(default_rate)))
        .alias("refill_rate"),
    )
    return rates.select(
        "host",
        (F.col("refill_rate") * F.lit(float(burst_rounds))).alias("capacity"),
        "refill_rate",
    )


def refill_hosts(hosts: DataFrame) -> DataFrame:
    return hosts.withColumn(
        "tokens", F.least(F.col("capacity"), F.col("tokens") + F.col("refill_rate"))
    )


def charge_hosts(hosts: DataFrame, popped_counts: DataFrame) -> DataFrame:
    """popped_counts: (host, popped) — subtract actual pops."""
    return (
        hosts.join(popped_counts, "host", "left")
        .withColumn("tokens", F.col("tokens") - F.coalesce(F.col("popped"), F.lit(0)))
        .drop("popped")
    )


def budgeted_pop(
    pending: DataFrame,
    hosts: DataFrame,
    batch_size: int,
    salt_buckets: int = 16,
    broadcast_binding_max: int = 65536,
) -> DataFrame:
    """W1: the frontier pop. Per-host window rank bounded by the token
    budget, then global (priority DESC, seq ASC) top-``batch_size``.

    Replaces the reference's advisory lock + ``ORDER BY created_at ASC
    LIMIT n FOR UPDATE SKIP LOCKED`` (operations.py:61-83); the window-ranked
    snapshot IS the priority heap. Emits pop_rank (1-based pop order).

    Plan shape (two branches, union into one shuffle-free global top-k):

    - **Non-binding bypass.** For a host with no budget row (no
      politeness limit) — or one whose floor(tokens) >= batch_size, which
      provably cannot constrain the global top-k (see inline proof) —
      the per-host rank filter is an identity. Those rows skip BOTH
      window shuffles and flow straight into the final
      ``orderBy().limit()``, which compiles to TakeOrderedAndProject
      (per-partition heaps over the scan, no exchange). When NO budget
      binds (the common fast path — e.g. every host under its burst
      capacity), the join and union vanish entirely and the pop is a
      single-scan top-k.
    - **Budgeted hosts** (the genuinely rate-limited ones) go through the
      salted pre-prune + exact window: a naive per-host window puts a
      host holding 50% of the frontier into ONE task, so rank first
      within (host, xxhash64(url)%salt_buckets) and keep each bucket's
      top min(budget, batch_size) rows — provably a superset of every row
      the exact pop can emit (any popped row has true host-rank <=
      min(budget, batch_size), and a row's bucket-rank is <= its
      host-rank) — then the exact per-host window runs on <=
      salt_buckets * min(budget, batch_size) rows per host.

    Result is identical to the unpruned single-window pop (verified
    against the sequential oracle in tests/test_crawl_e2e.py and directly
    in tests/test_politeness_pop.py). The bypass is the scaling win when
    most of the frontier belongs to unlimited hosts: those rows never
    shuffle at all.

    **Binding-set cardinality dispatch.** The set of binding budgets is
    small when only a few hosts are rate-limited, but in the open-web
    configuration every host carries a crawl-delay and the set is O(total
    hosts). A single probe job (``limit(broadcast_binding_max + 1)``)
    decides the shape: within the threshold, the classic collect +
    broadcast path (bypass rows shuffle-free); above it, budgets stay
    distributed and the same semantics run as a (host, salt)-keyed
    shuffle join — the budget side exploded by salt bucket so a hot host
    spreads across ``salt_buckets`` join tasks and the join's exchange
    doubles as the salted window's partitioning. No O(hosts) driver
    materialization on either path (tests/test_politeness_pop.py pins
    the bound).
    """
    budgets = hosts.select(
        "host", F.floor(F.col("tokens")).cast("long").alias("__budget")
    )
    # Only budgets that can BIND this round matter. A host with
    # floor(tokens) >= batch_size is unconstrained: its host-rank filter
    # (rank <= budget) cannot change the global top-k, because a same-host
    # row with host-rank r > batch_size has >= batch_size better same-host
    # rows ahead of it in the SAME (priority DESC, seq ASC) order the
    # global top-k uses — it can never be emitted anyway. So such hosts
    # take the bypass, and the windows only ever shuffle rows of
    # genuinely rate-limited hosts.
    #
    # Cardinality dispatch (the binding set is NOT always small: in the
    # open-web configuration every host carries a crawl-delay, so
    # __budget < batch_size holds for ~all hosts and the set is O(total
    # hosts) — 10^7-10^8 rows that must never be materialized on the
    # driver). One probe job fetches at most broadcast_binding_max + 1
    # rows; when the set fits, the classic collect + broadcast fast path
    # costs nothing extra (the broadcast join pulls the budgets through
    # the driver anyway). When it overflows, budgets stay distributed and
    # the identical bypass semantics run as a plain (host)-keyed join:
    # budget row absent => bypass column, present => the same salted
    # pre-prune + exact window on the joined side only.
    binding_df = budgets.where(F.col("__budget") < batch_size)
    probe = binding_df.limit(broadcast_binding_max + 1).collect()
    w_global = Window.orderBy(F.desc("priority"), F.asc("seq"))
    if not probe:
        # nothing binds: the pop IS the global top-k — one scan, no join,
        # no union; compiles to TakeOrderedAndProject (per-partition heaps)
        return (
            pending.orderBy(F.desc("priority"), F.asc("seq"))
            .limit(batch_size)
            .withColumn("pop_rank", F.row_number().over(w_global))
        )
    salt_col = F.pmod(F.xxhash64("url"), F.lit(salt_buckets)).cast("int")
    keep_k = F.least(F.col("__budget"), F.lit(batch_size))
    w_salt = Window.partitionBy("host", "__salt").orderBy(
        F.desc("priority"), F.asc("seq")
    )
    w_host = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("seq"))
    if len(probe) <= broadcast_binding_max:
        # small binding set (the probe returned it whole): driver
        # round-trip is bounded by the threshold, broadcast join keeps
        # bypass rows shuffle-free — they skip BOTH windows and flow
        # straight into the TakeOrderedAndProject heap.
        bud = pending.sparkSession.createDataFrame(
            probe, "host string, __budget long"
        )
        tagged = pending.join(F.broadcast(bud), "host", "left")
        bypass = tagged.where(F.col("__budget").isNull()).drop("__budget")
        pruned = (
            tagged.where(F.col("__budget").isNotNull())
            .withColumn("__salt", salt_col)
            .withColumn("__srank", F.row_number().over(w_salt))
            .where(F.col("__srank") <= keep_k)
            .drop("__salt", "__srank")
        )
        eligible = (
            pruned.withColumn("__hrank", F.row_number().over(w_host))
            .where(F.col("__hrank") <= F.col("__budget"))
            .drop("__budget", "__hrank")
        )
        out = bypass.unionByName(eligible)
    else:
        # binding set exceeds the broadcast threshold (the open-web
        # all-hosts-budgeted regime): never materialize it. Salt the join
        # key itself — budgets explode x salt_buckets (still one small row
        # group per host), pending tags its bucket — so (a) a host holding
        # half the frontier spreads over salt_buckets join tasks instead
        # of one, and (b) the join's hashpartitioning(host, __salt) is
        # exactly the salted window's partitioning: one exchange serves
        # both. SINGLE-PASS shape: instead of a bypass/budgeted union
        # (which makes Spark scan + exchange the whole frontier once per
        # union arm), both windows run over the joined frame and
        # unbudgeted rows pass the rank filters via the isnull(__budget)
        # disjunct — row populations per (host[, salt]) partition are
        # identical because a host is either wholly budgeted or wholly
        # not, so ranks equal the two-branch formulation's exactly
        # (pinned by test_distributed_branch_exactness).
        unb = F.col("__budget").isNull()
        bud_s = binding_df.withColumn(
            "__salt",
            F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
        )
        tagged = pending.withColumn("__salt", salt_col).join(
            bud_s, ["host", "__salt"], "left"
        )
        # Unbudgeted rows are pre-pruned too, at the batch_size cap: a
        # row whose salt-bucket rank exceeds batch_size has >= batch_size
        # same-bucket rows ahead of it in the SAME (priority DESC, seq)
        # order the global top-k uses, so it can never be emitted — the
        # identical superset argument as the budgeted keep_k. Without
        # this, a hot UNBUDGETED host would funnel its whole frontier
        # share into one w_host task in this branch (the broadcast
        # branch's bypass rows skip the windows entirely); with it, every
        # host — budgeted or not — reaches w_host with at most
        # salt_buckets * batch_size rows.
        pruned = (
            tagged.withColumn("__srank", F.row_number().over(w_salt))
            .where(
                F.col("__srank")
                <= F.least(
                    F.coalesce(F.col("__budget"), F.lit(batch_size)),
                    F.lit(batch_size),
                )
            )
            .drop("__salt", "__srank")
        )
        out = (
            pruned.withColumn("__hrank", F.row_number().over(w_host))
            .where(unb | (F.col("__hrank") <= F.col("__budget")))
            .drop("__budget", "__hrank")
        )
    return (
        out.orderBy(F.desc("priority"), F.asc("seq"))
        .limit(batch_size)
        .withColumn("pop_rank", F.row_number().over(w_global))
    )
