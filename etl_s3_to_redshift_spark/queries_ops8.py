"""Round-6 registered queries: training-data curation extensions —
importance-resampling data selection, contrastive hard-negative mining,
and first-occurrence novelty scoring.

Reference anchor: north-star extensions only (the reference's full query
inventory at /root/reference/sql_queries.py has no text/embedding
surface); each query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.queries import _t, register


# ---------------------------------------------------------------------------
# DSIR importance weights — classifier-free domain-targeted data selection
# ---------------------------------------------------------------------------


@register(
    "data_dsir_weights",
    """
    WITH toks AS (
        SELECT doc_id, CAST(lang = 'en' AS INTEGER) AS tgt,
               unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                  x -> x != '')) AS token
        FROM documents
    ),
    tf AS (
        SELECT doc_id, tgt, token, count(*) AS tf
        FROM toks GROUP BY doc_id, tgt, token
    ),
    s AS (
        SELECT CAST(sum(tf * tgt) AS BIGINT) AS nt,
               CAST(sum(tf) AS BIGINT) AS na,
               CAST(count(DISTINCT token) AS BIGINT) AS v
        FROM tf
    ),
    m AS (
        SELECT token,
               CAST(sum(tf * tgt) AS BIGINT) AS ct,
               CAST(sum(tf) AS BIGINT) AS ca
        FROM tf GROUP BY token
    )
    SELECT tf.doc_id,
           CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
           -- + 0 normalizes IEEE negative zero (round can yield -0.0 and
           -- the engines disagree on which); -0.0 + 0.0 = +0.0 exactly
           round(sum(tf.tf * (ln(CAST(m.ct + 1 AS DOUBLE) / CAST(s.nt + s.v AS DOUBLE))
                              - ln(CAST(m.ca + 1 AS DOUBLE) / CAST(s.na + s.v AS DOUBLE))))
                 / sum(tf.tf), 6) + 0.0 AS avg_logratio
    FROM tf JOIN m USING (token) CROSS JOIN s
    GROUP BY tf.doc_id
    """,
    doc=(
        "DSIR importance-resampling weights (operators/textops."
        "dsir_logratio_weights; Xie et al. 2023): per-document average "
        "unigram log-ratio between the add-1-smoothed model of the "
        "TARGET slice (lang='en' — the in-domain exemplar set) and the "
        "whole raw pool, over the shared corpus vocabulary. Resampling "
        "by this weight tilts a raw crawl toward the target domain with "
        "no trained classifier. One tokenization into the (doc, token) "
        "tf aggregate; both model counts ride token-key windows "
        "(vocabulary-sized shuffle, never a broadcast model); scalars "
        "N_t/N/V are one bounded 1-row driver read."
    ),
)
def data_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.textops import dsir_logratio_weights

    docs = _t(spark, sf_dir, "documents")
    return dsir_logratio_weights(docs, target=F.col("lang") == "en")


# ---------------------------------------------------------------------------
# Contrastive hard negatives — embedding training-pair mining
# ---------------------------------------------------------------------------


@register(
    "emb_hard_negatives",
    """
    WITH dv AS (
      SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM dv WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, c.vec_id,
             round(list_aggregate(list_transform(range(len(c.v)), i -> c.v[i+1] * q.qv[i+1]), 'sum')
               / (sqrt(list_aggregate(list_transform(range(len(c.v)), i -> c.v[i+1] * c.v[i+1]), 'sum'))
                  * sqrt(list_aggregate(list_transform(range(len(q.qv)), i -> q.qv[i+1] * q.qv[i+1]), 'sum'))), 6) AS cos_sim
      FROM dv c, q
      WHERE c.vec_id != q.query_id AND c.label != q.qlabel
    )
    SELECT query_id, vec_id, cos_sim, rank FROM (
      SELECT query_id, vec_id, cos_sim,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rank
      FROM scored
    ) t WHERE rank <= 5
    """,
    doc=(
        "Contrastive hard-negative mining (operators/similarity."
        "contrastive_hard_negatives): per query vector, the 5 highest-"
        "cosine corpus vectors with a DIFFERENT label — the 'looks "
        "similar, means different' pairs an embedding model learns most "
        "from. Same broadcast-streamed scan + rounded-rank determinism "
        "contract as the exact top-k baseline; at lake scale the scan "
        "swaps for LSH bucket mates with the same label predicate."
    ),
)
def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.similarity import (
        contrastive_hard_negatives,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    return contrastive_hard_negatives(emb, queries, k=5, round_to=6)


# ---------------------------------------------------------------------------
# N-gram novelty — does a new batch add anything?
# ---------------------------------------------------------------------------


@register(
    "text_ngram_novelty",
    """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z]+'),
                           x -> x != '') AS w
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id, w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS gram
        FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM toks)
    ),
    firsts AS (SELECT gram, min(doc_id) AS fd FROM grams GROUP BY gram)
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           round(sum(CASE WHEN f.fd = g.doc_id THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS novelty_rate
    FROM grams g JOIN firsts f USING (gram)
    GROUP BY g.doc_id
    """,
    doc=(
        "First-occurrence novelty (operators/textops.ngram_novelty_"
        "scores): fraction of each document's distinct word trigrams "
        "whose corpus-wide first occurrence (min doc id) is this "
        "document — the incremental-crawl 'does this batch add "
        "anything' signal next to dedup's 'is this document a copy'. "
        "Trigrams build inside the token array (zip of shifted slices, "
        "no posexplode self-join); wide ops are the (doc, gram) "
        "distinct and the min-over-gram-key window. Docs with < 3 "
        "tokens have no trigrams and are absent by definition."
    ),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.textops import ngram_novelty_scores

    return ngram_novelty_scores(_t(spark, sf_dir, "documents"), n=3)
