"""Round-9 registered queries (sixth batch): web-corpus curation — URL
canonicalization + dedup and per-domain quotas (operators/web.py).

Reference anchor: north-star extensions only (the reference's query
inventory at /root/reference/sql_queries.py has no web surface); both
queries carry exact DuckDB oracles. The documents lake has no URL
column, so the fixtures derive deterministic NOISY urls from
(doc_id, source) — scheme case, default ports, tracking params, param
order, duplicate/trailing slashes, fragments — exactly the variant
classes canonical_url collapses (the sparse-chain / dense-variant
fixture pattern: planted noise, derivable at any SF, same rows both
engines)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.queries import _t, register

# Deterministic noisy-URL synthesis, keyed on doc_id residues. Every
# branch total-function of (doc_id, source) -> identical rows on both
# engines. After canonicalization: scheme case merges, :443 strips,
# leading '//' collapses, trailing '/' strips, utm_* drops and the
# remaining params sort -> residues {0,1} mod 4 share one query form and
# {2,3} share the empty one, so each (source, doc_id%50) bucket
# collapses to exactly TWO canonical urls.
_URL_SYNTH_DUCK = """
    concat(
      CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END, '://',
      source,
      CASE WHEN doc_id % 5 = 0 THEN '.EXAMPLE.com' ELSE '.example.com' END,
      CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END,
      CASE WHEN doc_id % 11 = 0 THEN '//a/' ELSE '/a/' END,
      CAST(doc_id % 50 AS VARCHAR),
      CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END,
      CASE WHEN doc_id % 4 = 0 THEN '?utm_source=x&b=2&a=1'
           WHEN doc_id % 4 = 1 THEN '?a=1&b=2' ELSE '' END,
      CASE WHEN doc_id % 6 = 0 THEN '#top' ELSE '' END
    )
"""


def _synth_url() -> F.Column:
    d = F.col("doc_id")
    return F.concat(
        F.when(d % 2 == 0, F.lit("https")).otherwise(F.lit("HTTPS")),
        F.lit("://"),
        F.col("source"),
        F.when(d % 5 == 0, F.lit(".EXAMPLE.com")).otherwise(F.lit(".example.com")),
        F.when(d % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.when(d % 11 == 0, F.lit("//a/")).otherwise(F.lit("/a/")),
        (d % 50).cast("string"),
        F.when(d % 7 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 4 == 0, F.lit("?utm_source=x&b=2&a=1"))
        .when(d % 4 == 1, F.lit("?a=1&b=2"))
        .otherwise(F.lit("")),
        F.when(d % 6 == 0, F.lit("#top")).otherwise(F.lit("")),
    )


@register(
    "web_url_dedup",
    f"""
    WITH urls AS (
      SELECT doc_id, {_URL_SYNTH_DUCK} AS url FROM documents
    ), parts AS (
      SELECT doc_id,
             regexp_replace(url, '#.*$', '') AS no_frag
      FROM urls
    ), parts2 AS (
      SELECT doc_id,
             regexp_replace(no_frag, '\\?.*$', '') AS base,
             CASE WHEN contains(no_frag, '?')
                  THEN regexp_replace(no_frag, '^[^?]*\\?', '') ELSE '' END AS q
      FROM parts
    ), parts3 AS (
      SELECT doc_id, q,
             lower(regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             regexp_replace(base, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
      FROM parts2
    ), parts4 AS (
      SELECT doc_id, q, scheme,
             lower(regexp_extract(rest, '^([^/]*)', 1)) AS hostport,
             regexp_replace(regexp_replace(rest, '^[^/]*', ''), '//+', '/', 'g') AS p1
      FROM parts3
    ), parts5 AS (
      SELECT doc_id, q, scheme,
             CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
                  WHEN scheme = 'http'  THEN regexp_replace(hostport, ':80$', '')
                  ELSE hostport END AS host,
             CASE WHEN p1 = '' THEN '/'
                  WHEN length(p1) > 1 THEN regexp_replace(p1, '/$', '')
                  ELSE p1 END AS path,
             array_to_string(list_sort(list_filter(string_split(q, '&'),
               p -> p != '' AND NOT starts_with(split_part(p, '=', 1), 'utm_')
                    AND split_part(p, '=', 1) != 'gclid'
                    AND split_part(p, '=', 1) != 'fbclid')), '&') AS qc
      FROM parts4
    ), canon AS (
      SELECT doc_id,
             concat(scheme, '://', host, path,
                    CASE WHEN qc != '' THEN concat('?', qc) ELSE '' END)
               AS canonical_url
      FROM parts5
    )
    SELECT canonical_url,
           regexp_extract(regexp_extract(canonical_url, '^[a-z]+://([^/?#]*)', 1),
                          '([^.]+\\.[^.]+)$', 1) AS domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS kept_id
    FROM canon GROUP BY canonical_url
    """,
    doc=(
        "URL-level dedup on the CANONICAL form (operators/web."
        "canonical_url + url_dedup_groups; C4/RefinedWeb precedent — "
        "web pipelines dedupe on canonical URLs before any content "
        "pass): lowercase scheme/host, default ports stripped, "
        "fragments dropped, duplicate slashes collapsed, trailing "
        "slash stripped, tracking params (utm_*, gclid, fbclid) "
        "dropped, remaining params sorted. The fixture plants every "
        "one of those variant classes via doc_id-residue noise, so the "
        "groups prove each rule fires. Scale shape: canonicalization "
        "is narrow in-scan expressions (no UDF), dedup is ONE "
        "map-side-combined groupBy on the canonical key — the cheapest "
        "dedup in the stack, which is why real pipelines run it first. "
        "Exact DuckDB oracle (the same normalization, step-named CTEs)."
    ),
)
def web_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.web import url_dedup_groups

    docs = _t(spark, sf_dir, "documents").select("doc_id", _synth_url().alias("url"))
    return url_dedup_groups(docs, url_col="url", id_col="doc_id")


_QUOTA = 40


@register(
    "web_domain_quota",
    f"""
    WITH rows AS (
      SELECT concat(source, '.example.com') AS domain, doc_id,
             CAST(n_chars AS DOUBLE) AS ord
      FROM documents
    ), ranked AS (
      SELECT domain, doc_id, ord,
             row_number() OVER (PARTITION BY domain
                                ORDER BY ord DESC, doc_id ASC) AS r
      FROM rows
    ), kept AS (
      SELECT domain, CAST(count(*) AS BIGINT) AS n_kept,
             round(min(ord), 6) + 0.0 AS min_kept_order
      FROM ranked WHERE r <= {_QUOTA} GROUP BY domain
    ), totals AS (
      SELECT domain, CAST(count(*) AS BIGINT) AS n_total FROM rows GROUP BY domain
    )
    SELECT t.domain, t.n_total,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(t.n_total - coalesce(k.n_kept, 0) AS BIGINT) AS n_dropped,
           k.min_kept_order
    FROM totals t LEFT JOIN kept k ON k.domain = t.domain
    """,
    doc=(
        "Per-domain contribution cap (operators/web.domain_quota_report; "
        "the RefinedWeb quota): keep the best {quota} documents per "
        "domain by (n_chars DESC, doc_id ASC) and report "
        "total/kept/dropped + the kept floor per domain — the frame a "
        "curation run logs before materializing the kept set. The "
        "fixture's 5 domains each own ~corpus/5 documents (maximally "
        "hot keys), which is exactly why the keep decision is the "
        "salted TWO-PHASE top-k (the bm25_topk ranking pattern) — a "
        "window partitioned by domain alone would funnel a "
        "template-heavy host's whole row set through one task (the "
        "Zipf window trap). Totals are a map-side-combined groupBy "
        "joined on the domain-count-sized frame. Exact DuckDB oracle "
        "(plain window form — the oracle can afford the funnel)."
    ).replace("{quota}", str(_QUOTA)),
)
def web_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.web import domain_quota_report

    docs = _t(spark, sf_dir, "documents").select(
        F.concat(F.col("source"), F.lit(".example.com")).alias("domain"),
        "doc_id",
        "n_chars",
    )
    return domain_quota_report(
        docs, domain_col="domain", quota=_QUOTA, order_col="n_chars"
    )
