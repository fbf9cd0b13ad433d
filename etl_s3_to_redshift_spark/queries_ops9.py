"""Round-6 registered queries (second batch): bitext margin mining and
the Gopher corpus-filter rule gate.

Reference anchor: north-star extensions only (the reference's full query
inventory at /root/reference/sql_queries.py has no text/embedding
surface); each query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.queries import _t, register


# ---------------------------------------------------------------------------
# Margin-based bitext mining — cross-side parallel-pair extraction
# ---------------------------------------------------------------------------


@register(
    "emb_bitext_margin",
    """
    WITH dv AS (
      SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), sided AS (
      SELECT vec_id, label % 2 = 0 AS is_src, v,
             sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS n
      FROM dv
    ), a AS (
      SELECT vec_id AS src_id, v, n FROM sided WHERE is_src
    ), b AS (
      SELECT vec_id AS tgt_id, v, n FROM sided WHERE NOT is_src
    ), scored0 AS (
      SELECT a.src_id, b.tgt_id,
             round(CASE WHEN a.n > 0 AND b.n > 0 THEN
               list_aggregate(list_transform(range(len(a.v)),
                                             i -> a.v[i+1] * b.v[i+1]), 'sum')
               / (a.n * b.n) END, 6) AS cos_sim
      FROM a, b
    ), scored AS (
      SELECT * FROM scored0 WHERE cos_sim IS NOT NULL
    ), pen_s AS (
      SELECT src_id, sum(CAST(cos_sim AS DECIMAL(20,6))) AS pen FROM (
        SELECT src_id, cos_sim,
               row_number() OVER (PARTITION BY src_id
                                  ORDER BY cos_sim DESC, tgt_id) AS r
        FROM scored
      ) t WHERE r <= 4 GROUP BY src_id
    ), pen_t AS (
      SELECT tgt_id, sum(CAST(cos_sim AS DECIMAL(20,6))) AS pen FROM (
        SELECT tgt_id, cos_sim,
               row_number() OVER (PARTITION BY tgt_id
                                  ORDER BY cos_sim DESC, src_id) AS r
        FROM scored
      ) t WHERE r <= 4 GROUP BY tgt_id
    ), m AS (
      SELECT s.src_id, s.tgt_id, s.cos_sim,
             round(s.cos_sim
                   / (CAST(ps.pen + pt.pen AS DOUBLE) / 8.0), 6) + 0.0 AS margin
      FROM scored s
      JOIN pen_s ps USING (src_id)
      JOIN pen_t pt USING (tgt_id)
      WHERE CAST(ps.pen + pt.pen AS DOUBLE) / 8.0 > 0
    ), ranked AS (
      SELECT src_id, tgt_id, cos_sim, margin,
             row_number() OVER (PARTITION BY src_id
                                ORDER BY margin DESC, tgt_id) AS fwd,
             row_number() OVER (PARTITION BY tgt_id
                                ORDER BY margin DESC, src_id) AS bwd
      FROM m
    )
    SELECT src_id, tgt_id, cos_sim, margin, (bwd = 1) AS mutual
    FROM ranked WHERE fwd = 1 AND margin >= 1.0
    """,
    doc=(
        "Margin-based bitext mining (operators/similarity."
        "bitext_margin_pairs; Artetxe & Schwenk 2019): split the "
        "embedding space into two 'languages' by label parity, score "
        "every cross-side pair by cosine normalized by both vectors' "
        "average top-4 cross-side neighborhoods (the ratio margin that "
        "cancels hubness), and emit each source's best-margin target "
        "above 1.0 with a mutual-best flag — the parallel-corpus "
        "extraction step of multilingual training-data pipelines. "
        "Decimal-exact penalty sums over pre-rounded cosines keep the "
        "ranking cross-engine exact; at lake scale the |A|x|B| scored "
        "frame swaps for an ANN shortlist and the same penalty/margin/"
        "mutual pipeline applies unchanged."
    ),
)
def emb_bitext_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.similarity import bitext_margin_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return bitext_margin_pairs(
        emb, side=F.col("label") % 2 == 0, k=4, threshold=1.0
    )


# ---------------------------------------------------------------------------
# Gopher rules — the published corpus-filter keep/drop gate
# ---------------------------------------------------------------------------


@register(
    "text_gopher_rules",
    """
    WITH base AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x != '') AS toks,
             list_filter(string_split(text, chr(10)),
                         l -> trim(l) != '') AS lns
      FROM documents
    ), m AS (
      SELECT doc_id,
        len(toks) AS n_words,
        list_aggregate(list_transform(toks, w -> length(w)), 'sum') AS tok_chars,
        length(text) - length(replace(text, '#', '')) AS n_hash,
        (length(text) - length(replace(text, '...', ''))) / 3 AS n_ell,
        len(lns) AS n_lines,
        len(list_filter(lns, l -> ltrim(l) LIKE '- %'
                              OR ltrim(l) LIKE '* %'
                              OR ltrim(l) LIKE '•%')) AS n_bullet,
        len(list_filter(lns, l -> rtrim(l) LIKE '%...'
                              OR rtrim(l) LIKE '%…')) AS n_ell_end,
        len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
        len(list_filter(['the','be','to','of','and','that','have','with'],
                        w -> list_contains(list_transform(toks, x -> lower(x)),
                                           w))) AS n_req
      FROM base
    ), r AS (
      SELECT doc_id, n_words,
        CASE WHEN n_words > 0
             THEN CAST(tok_chars AS DOUBLE) / CAST(n_words AS DOUBLE) END
          AS mean_word_len,
        CASE WHEN n_words > 0
             THEN (n_hash + n_ell) / CAST(n_words AS DOUBLE) END
          AS symbol_ratio,
        CASE WHEN n_lines > 0
             THEN CAST(n_bullet AS DOUBLE) / CAST(n_lines AS DOUBLE)
             ELSE 0.0 END AS bullet_ratio,
        CASE WHEN n_lines > 0
             THEN CAST(n_ell_end AS DOUBLE) / CAST(n_lines AS DOUBLE)
             ELSE 0.0 END AS ellipsis_ratio,
        CASE WHEN n_words > 0
             THEN CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) END
          AS alpha_word_ratio,
        CAST(n_req AS INTEGER) AS n_required_words
      FROM m
    )
    SELECT doc_id, n_words,
      round(mean_word_len, 6) + 0.0 AS mean_word_len,
      round(symbol_ratio, 6) + 0.0 AS symbol_ratio,
      round(bullet_ratio, 6) + 0.0 AS bullet_ratio,
      round(ellipsis_ratio, 6) + 0.0 AS ellipsis_ratio,
      round(alpha_word_ratio, 6) + 0.0 AS alpha_word_ratio,
      n_required_words,
      (n_words >= 50 AND n_words <= 100000) AS rule_word_count,
      coalesce(mean_word_len >= 3.0 AND mean_word_len <= 10.0, FALSE)
        AS rule_mean_word_len,
      coalesce(symbol_ratio <= 0.1, FALSE) AS rule_symbol_ratio,
      (bullet_ratio < 0.9) AS rule_bullet_lines,
      (ellipsis_ratio < 0.3) AS rule_ellipsis_lines,
      coalesce(alpha_word_ratio >= 0.8, FALSE) AS rule_alpha_words,
      (n_required_words >= 2) AS rule_required_words,
      ((n_words >= 50 AND n_words <= 100000)
       AND coalesce(mean_word_len >= 3.0 AND mean_word_len <= 10.0, FALSE)
       AND coalesce(symbol_ratio <= 0.1, FALSE)
       AND bullet_ratio < 0.9
       AND ellipsis_ratio < 0.3
       AND coalesce(alpha_word_ratio >= 0.8, FALSE)
       AND n_required_words >= 2) AS keep
    FROM r
    """,
    doc=(
        "Gopher corpus-filter rule gate (operators/textops."
        "gopher_quality_rules; Rae et al. 2021 Appendix A): the "
        "published keep/drop rule set — 50-100k words, mean word length "
        "3-10, symbol ratio <= 0.1, bullet/ellipsis line limits, >= 80% "
        "alphabetic words, >= 2 of the 8 required function words — with "
        "measured features and per-rule booleans emitted alongside the "
        "conjunction so threshold sweeps don't re-scan. Pure narrow "
        "expressions over one materialized token array: runs inside the "
        "scan stage, shuffle-free at any corpus size."
    ),
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.textops import gopher_quality_rules

    docs = _t(spark, sf_dir, "documents")
    return gopher_quality_rules(docs)


# ---------------------------------------------------------------------------
# Bitext mining, lake-scale path — LSH-shortlist candidates
# ---------------------------------------------------------------------------


_MARGIN_TAIL_SQL = """
    pen_s AS (
      SELECT src_id, sum(CAST(cos_sim AS DECIMAL(20,6))) AS pen FROM (
        SELECT src_id, cos_sim,
               row_number() OVER (PARTITION BY src_id
                                  ORDER BY cos_sim DESC, tgt_id) AS r
        FROM scored
      ) t WHERE r <= {k} GROUP BY src_id
    ), pen_t AS (
      SELECT tgt_id, sum(CAST(cos_sim AS DECIMAL(20,6))) AS pen FROM (
        SELECT tgt_id, cos_sim,
               row_number() OVER (PARTITION BY tgt_id
                                  ORDER BY cos_sim DESC, src_id) AS r
        FROM scored
      ) t WHERE r <= {k} GROUP BY tgt_id
    ), m AS (
      SELECT s.src_id, s.tgt_id, s.cos_sim,
             round(s.cos_sim
                   / (CAST(ps.pen + pt.pen AS DOUBLE) / {twok}), 6) + 0.0
               AS margin
      FROM scored s
      JOIN pen_s ps USING (src_id)
      JOIN pen_t pt USING (tgt_id)
      WHERE CAST(ps.pen + pt.pen AS DOUBLE) / {twok} > 0
    ), ranked AS (
      SELECT src_id, tgt_id, cos_sim, margin,
             row_number() OVER (PARTITION BY src_id
                                ORDER BY margin DESC, tgt_id) AS fwd,
             row_number() OVER (PARTITION BY tgt_id
                                ORDER BY margin DESC, src_id) AS bwd
      FROM m
    )
    SELECT src_id, tgt_id, cos_sim, margin, (bwd = 1) AS mutual
    FROM ranked WHERE fwd = 1 AND margin >= {threshold}
"""


def _bitext_lsh_oracle_sql(
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    k: int = 4,
    threshold: float = 1.0,
) -> str:
    """Exact DuckDB twin of ``bitext_margin_pairs_lsh``: the plane
    literals are baked in (same doubles the Spark plan ships), bucket
    bits come from the identical left-associative fold chain, the
    rescore cosine is the same index-order list fold rounded to 6 dp,
    and the margin tail is shared verbatim with the exact miner's
    oracle — so even the APPROXIMATE mining path is cross-engine exact,
    the lsh_topk precedent applied to mining."""
    from etl_s3_to_redshift_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes, 42)
    rpb = n_planes // bands

    def chain(vec: str, ws) -> str:
        return " + ".join(
            f"CAST({vec}[{i + 1}] AS DOUBLE) * {w!r}" for i, w in enumerate(ws)
        )

    bits = ",\n               ".join(
        f"CASE WHEN ({chain('embedding', planes[i])}) > 0 THEN 1 ELSE 0 END AS bit{i}"
        for i in range(n_planes)
    )
    band_rows = "\n        UNION ALL\n        ".join(
        "SELECT vec_id, label, {b} AS band, {bk} AS bucket FROM sigs".format(
            b=b,
            bk=" || ".join(
                f"CAST(bit{b * rpb + r} AS VARCHAR)" for r in range(rpb)
            ),
        )
        for b in range(bands)
    )
    return f"""
    WITH sigs AS (
        SELECT vec_id, label,
               {bits}
        FROM embeddings
    ),
    bucketed AS (
        {band_rows}
    ),
    cand AS (
        SELECT DISTINCT sb.vec_id AS src_id, tb.vec_id AS tgt_id
        FROM bucketed sb
        JOIN bucketed tb USING (band, bucket)
        WHERE sb.label % 2 = 0 AND tb.label % 2 = 1
    ),
    dv AS (
        SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        FROM embeddings
    ),
    scored0 AS (
        SELECT c.src_id, c.tgt_id,
               round(CASE WHEN sn.n > 0 AND tn.n > 0 THEN
                 list_aggregate(list_transform(range({dim}),
                                               i -> sv.v[i+1] * tv.v[i+1]),
                                'sum') / (sn.n * tn.n) END, 6) AS cos_sim
        FROM cand c
        JOIN dv sv ON sv.vec_id = c.src_id
        JOIN dv tv ON tv.vec_id = c.tgt_id
        JOIN (SELECT vec_id,
                     sqrt(list_aggregate(list_transform(v, x -> x * x),
                                         'sum')) AS n
              FROM dv) sn ON sn.vec_id = c.src_id
        JOIN (SELECT vec_id,
                     sqrt(list_aggregate(list_transform(v, x -> x * x),
                                         'sum')) AS n
              FROM dv) tn ON tn.vec_id = c.tgt_id
    ),
    scored AS (
        SELECT * FROM scored0 WHERE cos_sim IS NOT NULL
    ),""" + _MARGIN_TAIL_SQL.format(k=k, twok=float(2 * k), threshold=threshold)


@register(
    "emb_bitext_margin_ann",
    _bitext_lsh_oracle_sql(dim=64, n_planes=16, bands=4, k=4, threshold=1.0),
    doc=(
        "Lake-scale bitext mining (operators/similarity."
        "bitext_margin_pairs_lsh): candidate pairs from random-"
        "hyperplane LSH bucket collisions — both sides bucketize with "
        "the same plane literals and meet in a plain (band, bucket) "
        "equi-join, neither side collected or broadcast — then the "
        "identical decimal-exact penalty/margin/mutual pipeline runs "
        "on the shortlist. Pair work is per-bucket, not |A|x|B|; "
        "recall < 1 by design vs emb_bitext_margin (the exact "
        "baseline it graduates from, the sim_ann_* pattern applied "
        "to mining). Bucket membership rides dot-product signs of "
        "literal chains and rescoring rounds before ranking, so this "
        "approximate path still carries an exact DuckDB oracle."
    ),
)
def emb_bitext_margin_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.similarity import (
        bitext_margin_pairs_lsh,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return bitext_margin_pairs_lsh(
        emb, side=F.col("label") % 2 == 0, dim=64, k=4, threshold=1.0
    )
