"""Web-corpus curation: URL canonicalization, URL-level dedup, and
per-domain quotas.

Web-scale training pipelines (C4, Raffel et al. 2020; RefinedWeb,
Penedo et al. 2023; CCNet) deduplicate on the CANONICAL form of a
page's URL before any content-level pass — the same page is crawled
under scheme/case/port/tracking-param/fragment variants — and then cap
how much any one registered domain contributes (domain quotas), since
a handful of template-heavy hosts otherwise dominate the token budget.

North-star extension (no reference counterpart —
/root/reference/sql_queries.py has no web surface). All operators here
are narrow per-row expressions plus bounded aggregations: canonical
form computes inside the scan stage at any corpus size; dedup is one
groupBy on the canonical key; quotas use the salted two-phase top-k
(the bm25_topk pattern) so no domain's row set ever funnels through a
single task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def canonical_url(url: Column) -> Column:
    """RFC-3986-style normalization of the equivalence class web dedup
    keys on: lowercase scheme and host, default ports stripped (:80
    http / :443 https), fragment dropped, duplicate path slashes
    collapsed, trailing slash stripped (non-root), tracking params
    (utm_*, gclid, fbclid) dropped, remaining query params SORTED
    (param order is not semantic for the dedup key — C4/RefinedWeb
    precedent; technically lossy for exotic servers, which is why this
    is the DEDUP key, not a rewrite of the stored URL).

    Pure narrow expressions — no UDF, no shuffle; the param filter keys
    on the param NAME (substring before '=', or the whole token when no
    '=' is present — a bare '?gclid' must not split a dedup group) via
    substring_index (no regex inside the higher-order function — HOFs
    are interpreted, so keep their lambdas cheap)."""
    no_frag = F.regexp_replace(url, "#.*$", "")
    base = F.regexp_replace(no_frag, r"\?.*$", "")
    query = F.when(
        no_frag.contains("?"), F.regexp_replace(no_frag, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    scheme = F.lower(F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    after = F.regexp_replace(base, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(after, "^([^/]*)", 1))
    host = (
        F.when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_replace(after, "^[^/]*", "")
    path = F.regexp_replace(path, "//+", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (F.length(path) > 1), F.regexp_replace(path, "/$", "")
    ).otherwise(path)
    def _keep(p: Column) -> Column:
        key = F.substring_index(p, "=", 1)
        return (
            (p != "")
            & ~key.startswith("utm_")
            & (key != "gclid")
            & (key != "fbclid")
        )

    params = F.array_sort(F.filter(F.split(query, "&"), _keep))
    qcanon = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")),
    )


def registered_domain(host_or_url: Column) -> Column:
    """Naive registered domain: the last two dot-labels of the host
    (example.com from a.b.example.com). A production system consults the
    Public Suffix List (co.uk et al.) — ``psl_registered_domain`` below
    is that lookup as a broadcast table join; the two-label rule is the
    standard approximation when no PSL is shipped, and the quota
    operator takes ANY domain column, so either drops in."""
    host = F.lower(
        F.regexp_extract(host_or_url, r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?([^/:?#]*)", 1)
    )
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def psl_registered_domain(
    df: DataFrame,
    host_col: str,
    psl: DataFrame,
    out_col: str = "registered_domain",
    max_suffix_labels: int = 4,
) -> DataFrame:
    """Registered domain via a Public Suffix List TABLE (publicsuffix.org
    — the list Mozilla/Chromium ship): the registered domain is one
    label more than the LONGEST public suffix matching the host, so
    a.b.example.co.uk → example.co.uk under the 'co.uk' rule while the
    naive two-label rule wrongly yields 'co.uk'. ``psl`` is a one-column
    (``suffix``) frame of lowercase rules — ~10k rows in the real list,
    a textbook broadcast dimension.

    Plan shape: per host, build the ≤``max_suffix_labels`` candidate
    dot-suffixes with narrow array expressions (split/slice/array_join —
    no UDF; 4 labels covers the deepest rules in the published list),
    posexplode, broadcast-hash-join against the rule table, and keep the
    longest hit per row (one match-sized aggregation — the exploded
    frame is ≤4× hosts and sheds immediately on the semi-ish join).
    Hosts matching NO rule fall back to the list's implicit default rule
    ``*`` (TLD = last label ⇒ registered domain = last two labels, the
    ``registered_domain`` approximation); single-label hosts yield ''.
    Wildcard (``*.ck``) and exception (``!www.ck``) rules are
    deliberately out of scope — expand them into plain rows when
    loading the list. Returns the input columns plus ``out_col``."""
    # the matched-suffix length is a pure function of the HOST, so the
    # lookup runs once per DISTINCT host (a hosts dimension ≪ corpus)
    # and hash-joins back by host value — deterministic under any
    # partition layout (a row-id join would re-derive layout-dependent
    # monotonically_increasing_ids per plan branch)
    hosts = (
        df.select(F.lower(F.col(host_col)).alias("__host"))
        .distinct()
        .withColumn("__labels", F.split(F.col("__host"), r"\."))
    )
    # candidate suffixes: the last k labels for k = 1..min(n-1, max);
    # k stops at n-1 because a suffix consuming the WHOLE host leaves no
    # label for the registrable part (single-label hosts get no
    # candidates — F.sequence would count DOWN for stop < start, so the
    # degenerate case is guarded explicitly)
    ks = F.when(
        F.size("__labels") >= 2,
        F.sequence(
            F.lit(1), F.least(F.size("__labels") - 1, F.lit(max_suffix_labels))
        ),
    ).otherwise(F.expr("array()").cast("array<int>"))
    cand = hosts.select(
        "__host",
        F.posexplode(
            F.transform(
                ks,
                lambda k: F.array_join(
                    F.slice(F.col("__labels"), F.size("__labels") - k + 1, k), "."
                ),
            )
        ).alias("__pos", "__suffix"),
    )
    hits = (
        cand.join(
            F.broadcast(psl.select(F.lower(F.col("suffix")).alias("__suffix"))),
            "__suffix",
        )
        .groupBy("__host")
        .agg(F.max(F.col("__pos") + 1).alias("__k"))  # longest rule, in labels
    )
    per_host = hosts.join(hits, "__host", "left").withColumn(
        "__k",
        # default rule '*': TLD = last label -> registered = last 2
        F.coalesce(F.col("__k"), F.lit(1)),
    )
    reg = F.when(
        F.size("__labels") >= F.col("__k") + 1,
        F.array_join(
            F.slice(
                F.col("__labels"),
                F.size("__labels") - F.col("__k"),
                F.col("__k") + 1,
            ),
            ".",
        ),
    ).otherwise(F.lit(""))
    dim = per_host.select("__host", reg.alias(out_col))
    return df.join(
        dim, F.lower(F.col(host_col)) == F.col("__host"), "left"
    ).drop("__host")


def url_dedup_groups(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level dedup report: one row per canonical URL with the kept
    (minimum-id) document and the duplicate count. ONE map-side-combined
    groupBy on the canonical key — the cheapest dedup in the whole stack,
    which is exactly why web pipelines run it before any content pass.
    Returns (canonical_url, domain, n_docs, kept_id)."""
    canon = df.select(
        F.col(id_col), canonical_url(F.col(url_col)).alias("canonical_url")
    )
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min(id_col).alias("kept_id"),
        )
        .select(
            "canonical_url",
            registered_domain(F.col("canonical_url")).alias("domain"),
            "n_docs",
            "kept_id",
        )
    )


def _quota_kept_rows(
    df: DataFrame,
    domain_col: str,
    quota: int,
    order_col: str,
    id_col: str,
    salt_parts: int,
) -> DataFrame:
    """The quota KEEP decision, shared by ``domain_quota_report`` (which
    aggregates it) and ``domain_quota_filter`` (which semi-joins it):
    at most ``quota`` rows per domain, best-first by (order_col DESC,
    id ASC — unique tiebreak), via the salted TWO-PHASE top-k (the
    bm25_topk ranking pattern) — rank within (domain, id-hash salt)
    first, then rank the <= salt_parts*quota survivors per domain, so a
    template-heavy host's row set never funnels through one task (the
    Zipf window trap). Returns (domain, __id, __ord) kept rows."""
    rows = df.select(
        F.col(domain_col).alias("domain"), F.col(id_col).alias("__id"),
        F.col(order_col).cast("double").alias("__ord"),
    )
    w_salt = Window.partitionBy(
        "domain", F.pmod(F.xxhash64(F.col("__id")), F.lit(salt_parts))
    ).orderBy(F.col("__ord").desc(), F.col("__id").asc())
    w_d = Window.partitionBy("domain").orderBy(
        F.col("__ord").desc(), F.col("__id").asc()
    )
    return (
        rows.withColumn("__r0", F.row_number().over(w_salt))
        .filter(F.col("__r0") <= quota)
        .withColumn("__r", F.row_number().over(w_d))
        .filter(F.col("__r") <= quota)
        .select("domain", "__id", "__ord")
    )


def domain_quota_filter(
    df: DataFrame,
    domain_col: str,
    quota: int,
    order_col: str,
    id_col: str = "doc_id",
    salt_parts: int = 32,
) -> DataFrame:
    """Ids of the documents the per-domain quota KEEPS — the
    funnel-stage form of ``domain_quota_report`` (identical keep
    decision: same salted two-phase top-k; the report is an aggregate
    of this set, pinned in tests). Semi-join against the corpus to
    apply the cap."""
    return _quota_kept_rows(
        df, domain_col, quota, order_col, id_col, salt_parts
    ).select(F.col("__id").alias(id_col))


def domain_quota_report(
    df: DataFrame,
    domain_col: str,
    quota: int,
    order_col: str,
    id_col: str = "doc_id",
    salt_parts: int = 32,
) -> DataFrame:
    """Per-domain contribution cap (the RefinedWeb quota): keep at most
    ``quota`` documents per domain, best-first by (order_col DESC,
    id ASC — unique tiebreak), and report what the cap did. Returns
    (domain, n_total, n_kept, n_dropped, min_kept_order) — the frame a
    curation run logs before materializing the kept set.

    Scale shape: the keep decision is the salted TWO-PHASE top-k
    (bm25_topk's ranking pattern): rank within (domain, id-hash salt)
    first, then rank the <= salt_parts*quota survivors per domain — a
    single window partitioned by only the domain would funnel a
    template-heavy host's entire row set through one task (the Zipf
    window trap, measured on bigram contexts). Totals come from a
    map-side-combined groupBy, joined domain-to-domain (domain-count
    sized — broadcastable in any real corpus)."""
    rows = df.select(
        F.col(domain_col).alias("domain"), F.col(id_col).alias("__id"),
        F.col(order_col).cast("double").alias("__ord"),
    )
    kept = (
        _quota_kept_rows(df, domain_col, quota, order_col, id_col, salt_parts)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.min("__ord").alias("min_kept_order"),
        )
    )
    totals = rows.groupBy("domain").agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        totals.join(kept, "domain", "left")
        .select(
            "domain",
            "n_total",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_total") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
            (F.round(F.col("min_kept_order"), 6) + F.lit(0.0)).alias(
                "min_kept_order"
            ),
        )
    )
