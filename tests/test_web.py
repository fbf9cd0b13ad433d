"""Web-curation operator semantics (operators/web.py): URL
canonicalization edge cases, URL dedup groups, domain quota vs the
naive window, and the quota's scale plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators import web as W


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], ["i", "url"])
    rows = df.select("i", W.canonical_url(F.col("url")).alias("c")).collect()
    return [r["c"] for r in sorted(rows, key=lambda r: r["i"])]


def test_canonical_url_rules(spark):
    got = _canon(
        spark,
        [
            "HTTPS://WWW.Example.COM:443/a/b#frag",      # case+port+fragment
            "https://www.example.com/a/b",               # already canonical
            "http://host.com:80/",                        # http default port, root
            "http://host.com",                            # empty path -> /
            "https://h.com//x///y/",                      # slash collapse + trailing
            "https://h.com/x/y",
            "https://h.com/p?utm_source=x&b=2&a=1",       # tracking drop + sort
            "https://h.com/p?a=1&b=2",
            "https://h.com/p?utm_campaign=z&gclid=1&fbclid=2",  # all dropped
            "https://h.com/p",
            "https://host.com:8443/a",                    # NON-default port kept
            "https://h.com/p?gclid&a=1",                  # BARE tracking param (no '=')
            "https://h.com/p?fbclid&utm_x&a=1",
            "https://h.com/p?gclidx=1",                   # prefix-only is NOT gclid
        ],
    )
    assert got[0] == got[1] == "https://www.example.com/a/b"
    assert got[2] == got[3] == "http://host.com/"
    assert got[4] == got[5] == "https://h.com/x/y"
    assert got[6] == got[7] == "https://h.com/p?a=1&b=2"
    assert got[8] == got[9] == "https://h.com/p"
    assert got[10] == "https://host.com:8443/a"
    assert got[11] == got[12] == "https://h.com/p?a=1"
    assert got[13] == "https://h.com/p?gclidx=1"


def test_registered_domain(spark):
    df = spark.createDataFrame(
        [
            (0, "https://a.b.example.com/x"),
            (1, "deep.sub.host.org"),
            (2, "https://single/x"),  # no dot: no registered domain
        ],
        ["i", "u"],
    )
    got = {
        r["i"]: r["d"]
        for r in df.select("i", W.registered_domain(F.col("u")).alias("d")).collect()
    }
    assert got[0] == "example.com"
    assert got[1] == "host.org"
    assert got[2] == ""


def test_psl_registered_domain_rules(spark):
    """PSL semantics: longest matching rule wins (co.uk beats uk), no
    match falls back to the implicit '*' rule (last two labels),
    single-label hosts yield '', matching is case-folded, and rules
    deeper than max_suffix_labels are simply not candidates."""
    psl = spark.createDataFrame(
        [("com",), ("co.uk",), ("uk",), ("a.b.c.d.e",)], "suffix string"
    )
    hosts = [
        (0, "www.Example.CO.UK"),     # longest match co.uk -> example.co.uk
        (1, "sub.deep.host.com"),     # com -> host.com
        (2, "x.y.internal"),          # no rule -> fallback: y.internal
        (3, "localhost"),             # single label -> ''
        (4, "uk"),                    # host IS a rule, no label left -> ''
        (5, "z.a.b.c.d.e"),           # rule has 5 labels > max 4 -> fallback d.e
    ]
    df = spark.createDataFrame(hosts, "i long, host string")
    got = {
        r.i: r.registered_domain
        for r in W.psl_registered_domain(df, "host", psl).collect()
    }
    assert got[0] == "example.co.uk"
    assert got[1] == "host.com"
    assert got[2] == "y.internal"
    assert got[3] == ""
    assert got[4] == ""
    assert got[5] == "d.e"
    # original columns survive, one output row per input row
    out = W.psl_registered_domain(df, "host", psl)
    assert set(out.columns) == {"i", "host", "registered_domain"}
    assert out.count() == len(hosts)


def test_url_dedup_groups_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "https://h.com/a?b=2&a=1"),
            (2, "HTTPS://H.com:443/a/?a=1&b=2#f"),  # same canonical
            (3, "https://h.com/b"),
        ],
        ["doc_id", "url"],
    )
    got = {r["canonical_url"]: r for r in W.url_dedup_groups(df).collect()}
    a = got["https://h.com/a?a=1&b=2"]
    assert a["n_docs"] == 2 and a["kept_id"] == 1 and a["domain"] == "h.com"
    assert got["https://h.com/b"]["n_docs"] == 1


def test_domain_quota_matches_naive_window(spark):
    from pyspark.sql import Window

    rows = [
        (f"d{g}.com", g * 1000 + i, float((i * 37) % 19))
        for g in range(3)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["domain", "doc_id", "score"]).repartition(8)
    got = {
        r["domain"]: (r["n_total"], r["n_kept"], r["n_dropped"], r["min_kept_order"])
        for r in W.domain_quota_report(
            df, "domain", quota=25, order_col="score"
        ).collect()
    }
    w = Window.partitionBy("domain").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    naive = (
        df.withColumn("r", F.row_number().over(w))
        .filter("r <= 25")
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("k"), F.round(F.min("score"), 6).alias("m"))
        .collect()
    )
    for r in naive:
        t, k, dr, m = got[r["domain"]]
        assert (t, k, dr) == (200, 25, 175)
        assert m == r["m"]

    # quota >= group size: nothing dropped, floor = group min
    small = W.domain_quota_report(df, "domain", quota=500, order_col="score").collect()
    assert all(r["n_dropped"] == 0 and r["n_kept"] == 200 for r in small)


def test_domain_quota_plan_has_no_unsalted_domain_window_first(spark):
    """The first (bulk) ranking window must be partitioned by
    (domain, salt) — the corpus-sized row stream never funnels through a
    per-domain task; only the <= salt_parts*quota survivors hit the
    per-domain window."""
    df = spark.createDataFrame(
        [("d.com", 1, 1.0)], ["domain", "doc_id", "score"]
    )
    plan = (
        W.domain_quota_report(df, "domain", quota=5, order_col="score")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "pmod" in plan and "xxhash64" in plan, plan[:2000]


def test_quota_kept_count_is_least_quota_nurls(spark):
    """The r11 web_curation_funnel computes its domain-capped count as
    Σ_domain least(quota, n_urls) instead of materializing the quota
    filter — sound because the keep rule is row_number ≤ quota over a
    deterministic TOTAL order: the ordering decides WHICH rows survive,
    never HOW MANY. Pinned here against the materialized
    domain_quota_filter on a skew mix where the quota BINDS (the
    registered fixture's domains never exceed it): hot domain 25 urls,
    quota 7; mid domain exactly at quota; small domains below it; plus
    duplicate order keys (ties broken by id — still exactly quota
    kept)."""
    rows = []
    rid = 0
    for dom, n in [("hot.com", 25), ("edge.com", 7), ("a.com", 3), ("b.com", 1)]:
        for i in range(n):
            rid += 1
            # constant order_col on hot.com: maximal tie pressure
            rows.append((rid, dom, 100 if dom == "hot.com" else 100 + i))
    df = spark.createDataFrame(rows, "doc_id long, domain string, n_chars long")
    quota = 7
    kept = W.domain_quota_filter(df, "domain", quota, "n_chars").count()
    arith = (
        df.groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.sum(F.least(F.lit(quota).cast("long"), F.col("n"))).alias("k"))
        .collect()[0]["k"]
    )
    assert kept == arith == 7 + 7 + 3 + 1


def test_curation_funnel_matches_materialized_quota(spark):
    """End-to-end pin of the r11 one-subtree funnel against the r10
    window form: rebuild the r10 counts (groupBy → quota filter →
    count) on the registered fixture and assert the registered query
    reports the identical rows."""
    from etl_s3_to_redshift_spark.queries import REGISTRY
    from etl_s3_to_redshift_spark.queries_ops12 import (
        _FUNNEL_QUOTA,
        _synth_url,
    )

    sf_dir = "/root/testdata/sf0.001"
    # r10 shape, inline: canonical groupBy -> url dimension -> quota
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars", "source"
    )
    urls = base.select("doc_id", "n_chars", _synth_url().alias("url"))
    groups = (
        urls.select(
            "doc_id",
            "n_chars",
            W.canonical_url(F.col("url")).alias("canonical_url"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.min("doc_id").alias("doc_id"),
            F.min_by("n_chars", "doc_id").alias("n_chars"),
        )
    )
    url_level = groups.select(
        "doc_id",
        F.regexp_extract(F.col("canonical_url"), "^[a-z]+://([^/?#]*)", 1).alias(
            "domain"
        ),
        "n_chars",
    )
    n0 = groups.agg(F.sum("__n")).collect()[0][0]
    n1 = groups.count()
    n2 = W.domain_quota_filter(
        url_level, "domain", _FUNNEL_QUOTA, "n_chars", id_col="doc_id"
    ).count()
    got = {
        (r["stage_idx"], r["stage"], r["n_docs"], r["n_removed"])
        for r in REGISTRY["web_curation_funnel"].spark(spark, sf_dir).collect()
    }
    assert got == {
        (0, "raw", n0, 0),
        (1, "url_deduped", n1, n0 - n1),
        (2, "domain_capped", n2, n1 - n2),
    }


def test_canonical_url_idempotent_property(spark):
    """Canonicalization must be IDEMPOTENT — canon(canon(u)) == canon(u)
    for arbitrary URL-shaped inputs (hypothesis-generated scheme / host
    case / ports / duplicate slashes / params incl. tracking / fragments).
    A non-idempotent normalizer means the dedup key depends on how many
    times a pipeline stage ran — silent group splits."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    label = st.text(alphabet="abcDEF09-", min_size=1, max_size=6).filter(
        lambda s: not s.startswith("-") and not s.endswith("-")
    )
    param = st.one_of(
        st.just("utm_source=x"),
        st.just("gclid=1"),
        st.tuples(
            st.text(alphabet="abzQ9", min_size=1, max_size=4),
            st.text(alphabet="abz19", min_size=0, max_size=4),
        ).map(lambda kv: f"{kv[0]}={kv[1]}"),
    )
    urls = st.builds(
        lambda scheme, labels, port, segs, slash, params, frag: (
            scheme
            + "://"
            + ".".join(labels)
            + port
            + "".join("/" * sl + seg for sl, seg in segs)
            + ("/" if slash else "")
            + ("?" + "&".join(params) if params else "")
            + ("#frag" if frag else "")
        ),
        scheme=st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
        labels=st.lists(label, min_size=1, max_size=3),
        port=st.sampled_from(["", ":80", ":443", ":8080"]),
        segs=st.lists(
            st.tuples(st.integers(1, 3), st.text(alphabet="abzC2._~", min_size=1, max_size=5)),
            min_size=0,
            max_size=3,
        ),
        slash=st.booleans(),
        params=st.lists(param, max_size=4),
        frag=st.booleans(),
    )

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(batch=st.lists(urls, min_size=1, max_size=30))
    def run(batch):
        df = spark.createDataFrame([(i, u) for i, u in enumerate(batch)], ["i", "url"])
        once = df.select("i", W.canonical_url(F.col("url")).alias("c1"))
        twice = once.select(
            "i", "c1", W.canonical_url(F.col("c1")).alias("c2")
        ).collect()
        bad = [(r["c1"], r["c2"]) for r in twice if r["c1"] != r["c2"]]
        assert not bad, bad[:5]

    run()
