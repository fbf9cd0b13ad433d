"""Round-2b operator-coverage queries: time-series regularization,
fuzzy entity matching, embedding centroids, unpivot/melt, and salted
(skew-safe) aggregation — each with an exact DuckDB oracle.

Exactness rules follow queries.py: decimal casts before summation,
doubles only in final projections, counts BIGINT on both engines,
rounding only where summation order can drift sub-ulp (centroids).

Reference anchor: the reference's surface is exact-key enrichment +
full-refresh loads (/root/reference/sql_queries.py:132-190); these
queries extend that surface with the time-series, entity-resolution and
skew shapes a warehouse-scale corpus pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.queries import _t, register

# ---------------------------------------------------------------------------
# Time-series gap-fill / resample
# ---------------------------------------------------------------------------


@register(
    "ts_gapfill_hourly",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket_start,
             count(*) AS n, sum(CAST(value AS DECIMAL(12,2))) AS v
      FROM events WHERE user_id % 10 = 0
      GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, min(bucket_start) AS b0, max(bucket_start) AS b1
      FROM hourly GROUP BY 1
    ), spine AS (
      SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket_start
      FROM bounds
    )
    SELECT s.user_id, s.bucket_start,
           coalesce(h.n, 0) AS n_events,
           CAST(coalesce(h.v, 0) AS DOUBLE) AS bucket_value,
           CAST(last_value(h.v IGNORE NULLS) OVER (
                  PARTITION BY s.user_id ORDER BY s.bucket_start
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS carried_value
    FROM spine s LEFT JOIN hourly h
      ON h.user_id = s.user_id AND h.bucket_start = s.bucket_start
    """,
    doc=(
        "Hourly resample with gap-fill and forward-carry per user "
        "(operators/temporal.resample_gapfill): dense spine generated "
        "data-side with sequence+explode between each key's first/last "
        "bucket, observed buckets left-joined on, last non-empty total "
        "carried over gaps with last(ignorenulls) — one bucket-agg "
        "shuffle plus a per-key window sort, no driver loops. Subset to "
        "user_id%10=0 keeps the spine row-like at any SF."
    ),
)
def ts_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.temporal import resample_gapfill

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    return resample_gapfill(ev, key_col="user_id", ts_col="ts", value_col="value")


# ---------------------------------------------------------------------------
# Fuzzy entity matching (blocked levenshtein join)
# ---------------------------------------------------------------------------

# Deterministic dirty probes derived from customer names: substitute the
# (c_custkey % 9)-th digit of the 9-digit suffix with 'x'. Substitution
# keeps lengths equal, so segment blocking is position-aligned and the
# pigeonhole recall argument is exact.
_PROBE_SQL = """
      SELECT c_custkey AS probe_id,
             concat(substring(c_name, 1, 9 + (c_custkey % 9)), 'x',
                    substring(c_name, 11 + (c_custkey % 9))) AS probe
      FROM customer
"""


@register(
    "fuzzy_customer_match",
    f"""
    WITH probes AS ({_PROBE_SQL})
    SELECT p.probe_id, c.c_custkey AS matched_id,
           CAST(levenshtein(p.probe, c.c_name) AS INTEGER) AS dist
    FROM probes p JOIN customer c
      ON length(p.probe) = length(c.c_name)
     AND levenshtein(p.probe, c.c_name) <= 1
    """,
    doc=(
        "Entity resolution: match corrupted customer names (one digit "
        "substituted) back to the reference table within edit distance 1 "
        "(operators/fuzzy.blocked_substitution_join). Spark plan blocks "
        "on complement segment keys (equi-join, candidates track true "
        "matches) and verifies with levenshtein; the oracle IS the naive "
        "all-pairs definition, equal because complement-key pigeonhole "
        "recall is exactly 1.0 for substitution edits — never a cross "
        "product on the Spark side."
    ),
)
def fuzzy_customer_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.fuzzy import blocked_substitution_join

    customer = _t(spark, sf_dir, "customer")
    probes = customer.select(
        F.col("c_custkey").alias("probe_id"),
        F.expr(
            "concat(substring(c_name, 1, 9 + (c_custkey % 9)), 'x',"
            " substring(c_name, 11 + (c_custkey % 9)))"
        ).alias("probe"),
    )
    return blocked_substitution_join(
        probes,
        customer.select(F.col("c_custkey").alias("matched_id"), "c_name"),
        probe_id="probe_id",
        probe_col="probe",
        ref_id="matched_id",
        ref_col="c_name",
        max_dist=1,
        # single-char segments: every complement keeps 8 of the 9 digits,
        # so candidate blocks are ~10 names (the one varying digit) instead
        # of ~100 with 2-char segments — measured 8.2s -> 6.4s at sf1 on
        # top of the hashed-key join (n=3's constant-prefix complement
        # swallowed the corpus entirely; see operator notes)
        n_segments=18,
    )


# ---------------------------------------------------------------------------
# Embedding centroids per label
# ---------------------------------------------------------------------------


@register(
    "emb_label_centroids",
    """
    SELECT label, CAST(pos AS INTEGER) AS pos,
           round(sum(v) / count(*), 6) AS centroid
    FROM (
      SELECT label,
             generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    )
    GROUP BY label, pos
    """,
    doc=(
        "Per-label centroid components (operators/similarity."
        "label_centroids): posexplode to (label, pos, component), "
        "average per cell with map-side partial agg — the shuffle carries "
        "labels x dims partials, not vectors. Row-oriented output joins "
        "directly against IVF cell scoring. Rounded to 6 dp (summation "
        "order drift is sub-ulp; float32 components promote to double "
        "exactly on both engines)."
    ),
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.similarity import label_centroids

    return label_centroids(_t(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Unpivot / melt
# ---------------------------------------------------------------------------


@register(
    "unpivot_lineitem_measures",
    """
    WITH a AS (
      SELECT l_returnflag,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
             CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM a
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM a
    """,
    doc=(
        "Wide-to-long unpivot (DataFrame.unpivot / SQL UNPIVOT): per-flag "
        "measure matrix melted to (flag, measure, value) rows. The "
        "aggregate runs once; unpivot is a zero-shuffle projection "
        "(Expand node), NOT three re-scans — the oracle's UNION ALL form "
        "is the portable ANSI equivalent of the same result."
    ),
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double").alias("sum_price"),
        F.sum(F.col("l_discount").cast("decimal(12,2)")).cast("double").alias("sum_disc"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="measure",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# Salted (skew-safe) aggregation
# ---------------------------------------------------------------------------


@register(
    "skew_salted_event_agg",
    """
    SELECT event_type,
           count(value) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
           CAST(max(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS max_value
    FROM events GROUP BY event_type
    """,
    doc=(
        "Two-phase salted aggregation over a low-cardinality (hence "
        "skew-prone) group key (operators/skew.salted_aggregate): phase 1 "
        "groups by (key, salt) spreading each hot key over 16 reducers, "
        "phase 2 re-aggregates the tiny partials by the true key. The "
        "oracle is the plain GROUP BY — equal because sum/count/max over "
        "exact decimals are salt-partition-insensitive."
    ),
)
def skew_salted_event_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.skew import salted_aggregate

    ev = _t(spark, sf_dir, "events").withColumn(
        "__vd", F.col("value").cast("decimal(12,2)")
    )
    out = salted_aggregate(
        ev,
        keys=["event_type"],
        aggs={
            "n_events": ("__vd", "count"),
            "total_value": ("__vd", "sum"),
            "max_value": ("__vd", "max"),
        },
        n_salts=16,
    )
    return out.select(
        "event_type",
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
        F.col("max_value").cast("double").alias("max_value"),
    )


# ---------------------------------------------------------------------------
# Deterministic training order (global shuffle without a global sort)
# ---------------------------------------------------------------------------


@register(
    "data_training_order",
    """
    WITH h AS (
      SELECT doc_id,
             substring(md5('shuffle42:' || CAST(doc_id AS VARCHAR)), 1, 8) AS hk
      FROM documents
    )
    SELECT doc_id,
           CAST(('0x' || substring(hk, 1, 8))::BIGINT % 32 AS INTEGER) AS bucket,
           row_number() OVER (
             PARTITION BY ('0x' || substring(hk, 1, 8))::BIGINT % 32
             ORDER BY hk, doc_id) AS pos
    FROM h
    """,
    doc=(
        "Deterministic global training-shuffle order "
        "(operators/sampling.training_order): the permutation is factored "
        "into (bucket, pos) — content hash routes rows to 32 buckets, "
        "rank runs per bucket in parallel — so no single task ever sorts "
        "the corpus (a bare row_number() OVER (ORDER BY hash) would). "
        "Reader order = buckets by index, rows by pos; a new seed "
        "reshuffles the epoch. md5-derived, so assignment is identical "
        "across engines/re-runs/appends (same contract as data_hash_split)."
    ),
)
def data_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.sampling import training_order

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return training_order(docs, id_col="doc_id", seed="shuffle42", n_buckets=32)


# ---------------------------------------------------------------------------
# Window-function shapes not exercised elsewhere
# ---------------------------------------------------------------------------


@register(
    "w3_window_shapes",
    """
    SELECT event_id, user_id, value,
           lead(event_id) OVER w AS next_event,
           first_value(event_id) OVER w AS first_event,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pct_rank
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
    doc=(
        "Ranking/navigation window family not covered by w1/w2: lead, "
        "first_value, ntile, percent_rank over one per-user window — all "
        "four share a single sort (one shuffle on user_id, one per-key "
        "sort). The (value, event_id) ordering is a unique total order, "
        "so ntile/percent_rank are deterministic and percent_rank's "
        "(rank-1)/(n-1) divides identical operands on both engines — "
        "exact double equality, no rounding needed."
    ),
)
def w3_window_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lead("event_id").over(w).alias("next_event"),
        F.first("event_id").over(w).alias("first_event"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


# ---------------------------------------------------------------------------
# Span-level (paragraph-style) dedup: drop repeated chunks, keep the doc
# ---------------------------------------------------------------------------

_WORDS_SQL = r"list_filter(string_split_regex(trim(text), '\s+'), x -> x != '')"


@register(
    "dedup_repeated_chunks",
    f"""
    WITH base AS (
      SELECT doc_id, {_WORDS_SQL} AS w FROM documents
    ), chunked AS (
      SELECT doc_id,
             list_transform(
               range(greatest(CAST(ceil(len(w) / 15.0) AS INTEGER), 1)),
               i -> array_to_string(list_slice(w, i*15 + 1, i*15 + 15), ' ')) AS chunks
      FROM base
    ), c AS (
      SELECT doc_id,
             generate_subscripts(chunks, 1) - 1 AS idx,
             unnest(chunks) AS seg
      FROM chunked
    ), f AS (
      SELECT seg, count(*) AS freq FROM c GROUP BY seg
    ), kept AS (
      SELECT c.doc_id, c.idx, c.seg FROM c JOIN f USING (seg) WHERE f.freq <= 1
    ), clean AS (
      SELECT doc_id, string_agg(seg, ' ' ORDER BY idx) AS clean_text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT ch.doc_id,
           coalesce(cl.clean_text, '') AS clean_text,
           len(ch.chunks) AS n_total,
           coalesce(cl.n_kept, 0) AS n_kept
    FROM chunked ch LEFT JOIN clean cl USING (doc_id)
    """,
    doc=(
        "Span-level dedup, the C4/RefinedWeb curation step "
        "(operators/dedup.dedup_repeated_chunks): every 15-word chunk "
        "seen more than once across the corpus is dropped and documents "
        "are reassembled from their surviving chunks (vs whole-doc "
        "dedup_exact_docs). Spark counts chunk frequency by 60-bit "
        "md5-prefix hash so the frequency shuffle moves 8-byte keys, not "
        "text; the oracle counts by chunk text — equal because the "
        "collision odds at this corpus are ~1e-8 (same rationale as "
        "dedup_simhash's portable hash). Reassembly restores chunk order "
        "via sort_array(collect_list(struct)) / string_agg(ORDER BY)."
    ),
)
def dedup_repeated_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.dedup import dedup_repeated_chunks as op

    return op(_t(spark, sf_dir, "documents"), chunk_words=15, max_freq=1)


# ---------------------------------------------------------------------------
# Multimodal resize plumbing (metadata contract oracle-checked)
# ---------------------------------------------------------------------------


@register(
    "mm_resize_thumbs",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             octet_length(encode(text)) AS n_bytes,
             64 + (doc_id * 13) % 960 AS w,
             64 + (doc_id * 7) % 540 AS h
      FROM documents
    ), r AS (
      SELECT media_id, n_bytes, w, h, greatest(w, h) AS ls FROM m
    ), d AS (
      -- clamp each dim BEFORE the byte-budget product, exactly as the
      -- operator does (greatest(1, ...) per dimension) — without it the
      -- two would diverge for aspect ratios above max_side
      SELECT media_id, n_bytes, w, h, ls,
             CASE WHEN ls > 128 THEN greatest(1, w * 128 // ls) ELSE w END AS nw,
             CASE WHEN ls > 128 THEN greatest(1, h * 128 // ls) ELSE h END AS nh
      FROM r
    )
    SELECT media_id,
           CAST(nw AS INTEGER) AS width,
           CAST(nh AS INTEGER) AS height,
           CASE WHEN ls > 128
                THEN greatest(1, n_bytes * (nw * nh) // (w * h))
                ELSE n_bytes END AS out_bytes
    FROM d
    """,
    doc=(
        "Image-resize plumbing (operators/multimodal.resize_media): "
        "aspect-preserving thumbnail pass where target dims and the byte "
        "budget are exact JVM integer arithmetic and only the resample "
        "kernel runs in Arrow (deterministic truncation stub — the "
        "container has no codec; a real decoder swaps into the same "
        "kernel). Synthetic dims derive from the doc id; the oracle "
        "replays the integer math, so the metadata+byte contract is "
        "hash-exact, not rows-only."
    ),
)
def mm_resize_thumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.multimodal import docs_as_media, resize_media

    media = docs_as_media(_t(spark, sf_dir, "documents")).select(
        "media_id",
        "payload",
        "mime",
        (64 + (F.col("media_id") * 13) % 960).cast("int").alias("width"),
        (64 + (F.col("media_id") * 7) % 540).cast("int").alias("height"),
    )
    out = resize_media(media, max_side=128)
    return out.select(
        "media_id",
        "width",
        "height",
        F.octet_length("payload").cast("long").alias("out_bytes"),
    )


# ---------------------------------------------------------------------------
# Product-quantization ANN (compressed-domain search + exact re-rank)
# ---------------------------------------------------------------------------


@register(
    "sim_ann_pq",
    # Committed-expectation oracle (tools/gen_committed_oracle.py;
    # REGRESSION PIN generated under Spark 4.1.2 — partial-merge
    # results are not contractually stable across Spark versions,
    # so a red gate after an engine upgrade may be a version flake,
    # not a regression; regenerate the pin in that case):
    # seeded k-means training is not SQL-expressible, but the full
    # output is deterministic (verified bit-identical across plain
    # local[5/8/32] driver-style sessions, round 5), so the exact
    # 50-row result at the driver's sf0.01 gate is frozen here — any
    # recall/rank/score drift now fails the external hash check.
    # Valid only at sf0.01; other SFs fall back to rows-only.
    """
    SELECT CAST("query_id" AS BIGINT) AS "query_id",
           CAST("vec_id" AS BIGINT) AS "vec_id",
           CAST("cos_sim" AS DOUBLE) AS "cos_sim",
           CAST("rank" AS INTEGER) AS "rank"
    FROM (VALUES
        (0, 7, CAST('0.29284215147436643' AS DOUBLE), 6),
        (0, 73, CAST('0.29543411523164853' AS DOUBLE), 5),
        (0, 190, CAST('0.2817947192081154' AS DOUBLE), 7),
        (0, 334, CAST('0.3627220558741131' AS DOUBLE), 2),
        (0, 365, CAST('0.3699935965460897' AS DOUBLE), 1),
        (0, 387, CAST('0.33113871888314317' AS DOUBLE), 3),
        (0, 388, CAST('0.2763005476699542' AS DOUBLE), 9),
        (0, 423, CAST('0.2969335986409863' AS DOUBLE), 4),
        (0, 464, CAST('0.2766279302075019' AS DOUBLE), 8),
        (0, 483, CAST('0.2567003982986254' AS DOUBLE), 10),
        (1, 27, CAST('0.3482081864636984' AS DOUBLE), 2),
        (1, 80, CAST('0.23368964041224172' AS DOUBLE), 9),
        (1, 203, CAST('0.2681545538333194' AS DOUBLE), 6),
        (1, 220, CAST('0.28978222534717457' AS DOUBLE), 5),
        (1, 312, CAST('0.2590519854174673' AS DOUBLE), 8),
        (1, 363, CAST('0.263306379518924' AS DOUBLE), 7),
        (1, 386, CAST('0.37148454183744223' AS DOUBLE), 1),
        (1, 402, CAST('0.2923219897446138' AS DOUBLE), 4),
        (1, 407, CAST('0.3270099496117245' AS DOUBLE), 3),
        (1, 467, CAST('0.2325725850108785' AS DOUBLE), 10),
        (2, 117, CAST('0.318142564237661' AS DOUBLE), 1),
        (2, 145, CAST('0.26349429911567107' AS DOUBLE), 2),
        (2, 172, CAST('0.23982908281388693' AS DOUBLE), 6),
        (2, 188, CAST('0.263272104561668' AS DOUBLE), 3),
        (2, 197, CAST('0.23314916074606343' AS DOUBLE), 7),
        (2, 198, CAST('0.22685546841590845' AS DOUBLE), 9),
        (2, 202, CAST('0.22186129495652954' AS DOUBLE), 10),
        (2, 350, CAST('0.2400686712011323' AS DOUBLE), 5),
        (2, 418, CAST('0.25402949645206835' AS DOUBLE), 4),
        (2, 440, CAST('0.23136910975780278' AS DOUBLE), 8),
        (3, 130, CAST('0.39987234325628024' AS DOUBLE), 1),
        (3, 192, CAST('0.290802917949569' AS DOUBLE), 5),
        (3, 207, CAST('0.29170184705661967' AS DOUBLE), 4),
        (3, 231, CAST('0.29878836545413046' AS DOUBLE), 3),
        (3, 315, CAST('0.285191968671821' AS DOUBLE), 6),
        (3, 343, CAST('0.30847165466962984' AS DOUBLE), 2),
        (3, 363, CAST('0.26861521923374515' AS DOUBLE), 8),
        (3, 396, CAST('0.260964744503398' AS DOUBLE), 9),
        (3, 449, CAST('0.24274361210819173' AS DOUBLE), 10),
        (3, 474, CAST('0.2767381136347725' AS DOUBLE), 7),
        (4, 89, CAST('0.26596433888195814' AS DOUBLE), 6),
        (4, 114, CAST('0.39851269358433744' AS DOUBLE), 1),
        (4, 249, CAST('0.2796306459978647' AS DOUBLE), 5),
        (4, 288, CAST('0.22862537979323705' AS DOUBLE), 10),
        (4, 346, CAST('0.2315643366319568' AS DOUBLE), 9),
        (4, 384, CAST('0.2404132698982267' AS DOUBLE), 8),
        (4, 408, CAST('0.32275312529105415' AS DOUBLE), 3),
        (4, 470, CAST('0.2525366199686862' AS DOUBLE), 7),
        (4, 482, CAST('0.31389702932135605' AS DOUBLE), 4),
        (4, 496, CAST('0.34121178056570023' AS DOUBLE), 2)
    ) AS t("query_id", "vec_id", "cos_sim", "rank")
    """,
    oracle_sf="sf0.01",
    doc=(
        "Product-quantization ANN (operators/similarity.train_pq_codebooks"
        "/pq_encode/pq_topk_rerank): vectors compress 64 floats -> 8 "
        "one-byte codes (seeded Lloyd codebooks trained on a driver-side "
        "sample, the faiss shape); the corpus scan reads codes only, "
        "scoring via per-query lookup tables (m adds per vector), then "
        "exact cosine re-ranks the shortlist — the full-corpus raw-vector "
        "scan is gone. Rows-only: PQ is approximate by design; recall "
        "floor vs exact pinned in test_ops2."
    ),
)
def sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.similarity import (
        pq_encode,
        pq_topk_rerank,
        train_pq_codebooks,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    books = train_pq_codebooks(emb, dim=64, m=8, n_codes=16)
    codes = pq_encode(emb, books)
    return pq_topk_rerank(codes, books, emb, queries, k=10, shortlist_factor=4)


@register(
    "sim_ann_ivfpq",
    # Committed-expectation oracle (tools/gen_committed_oracle.py;
    # REGRESSION PIN generated under Spark 4.1.2 — partial-merge
    # results are not contractually stable across Spark versions,
    # so a red gate after an engine upgrade may be a version flake,
    # not a regression; regenerate the pin in that case):
    # seeded k-means training is not SQL-expressible, but the full
    # output is deterministic (verified bit-identical across plain
    # local[5/8/32] driver-style sessions, round 5), so the exact
    # 50-row result at the driver's sf0.01 gate is frozen here — any
    # recall/rank/score drift now fails the external hash check.
    # Valid only at sf0.01; other SFs fall back to rows-only.
    """
    SELECT CAST("query_id" AS BIGINT) AS "query_id",
           CAST("vec_id" AS BIGINT) AS "vec_id",
           CAST("cos_sim" AS DOUBLE) AS "cos_sim",
           CAST("rank" AS INTEGER) AS "rank"
    FROM (VALUES
        (0, 7, CAST('0.29284215147436643' AS DOUBLE), 6),
        (0, 36, CAST('0.23865664656584198' AS DOUBLE), 10),
        (0, 73, CAST('0.29543411523164853' AS DOUBLE), 5),
        (0, 190, CAST('0.2817947192081154' AS DOUBLE), 7),
        (0, 334, CAST('0.3627220558741131' AS DOUBLE), 2),
        (0, 365, CAST('0.3699935965460897' AS DOUBLE), 1),
        (0, 387, CAST('0.33113871888314317' AS DOUBLE), 3),
        (0, 388, CAST('0.2763005476699542' AS DOUBLE), 9),
        (0, 423, CAST('0.2969335986409863' AS DOUBLE), 4),
        (0, 464, CAST('0.2766279302075019' AS DOUBLE), 8),
        (1, 27, CAST('0.3482081864636984' AS DOUBLE), 2),
        (1, 80, CAST('0.23368964041224172' AS DOUBLE), 8),
        (1, 165, CAST('0.24386965334651073' AS DOUBLE), 7),
        (1, 353, CAST('0.2465920189390982' AS DOUBLE), 6),
        (1, 363, CAST('0.263306379518924' AS DOUBLE), 5),
        (1, 386, CAST('0.37148454183744223' AS DOUBLE), 1),
        (1, 402, CAST('0.2923219897446138' AS DOUBLE), 4),
        (1, 407, CAST('0.3270099496117245' AS DOUBLE), 3),
        (1, 441, CAST('0.20693214619351274' AS DOUBLE), 10),
        (1, 477, CAST('0.21537079740178447' AS DOUBLE), 9),
        (2, 65, CAST('0.20336320437387073' AS DOUBLE), 9),
        (2, 188, CAST('0.263272104561668' AS DOUBLE), 1),
        (2, 197, CAST('0.23314916074606343' AS DOUBLE), 6),
        (2, 202, CAST('0.22186129495652954' AS DOUBLE), 8),
        (2, 320, CAST('0.25504277088103294' AS DOUBLE), 2),
        (2, 341, CAST('0.18137835836831126' AS DOUBLE), 10),
        (2, 350, CAST('0.2400686712011323' AS DOUBLE), 5),
        (2, 418, CAST('0.25402949645206835' AS DOUBLE), 3),
        (2, 440, CAST('0.23136910975780278' AS DOUBLE), 7),
        (2, 471, CAST('0.24719275246584027' AS DOUBLE), 4),
        (3, 130, CAST('0.39987234325628024' AS DOUBLE), 1),
        (3, 192, CAST('0.290802917949569' AS DOUBLE), 4),
        (3, 207, CAST('0.29170184705661967' AS DOUBLE), 3),
        (3, 315, CAST('0.285191968671821' AS DOUBLE), 5),
        (3, 343, CAST('0.30847165466962984' AS DOUBLE), 2),
        (3, 363, CAST('0.26861521923374515' AS DOUBLE), 7),
        (3, 396, CAST('0.260964744503398' AS DOUBLE), 8),
        (3, 444, CAST('0.24449830063928985' AS DOUBLE), 9),
        (3, 449, CAST('0.24274361210819173' AS DOUBLE), 10),
        (3, 474, CAST('0.2767381136347725' AS DOUBLE), 6),
        (4, 114, CAST('0.39851269358433744' AS DOUBLE), 1),
        (4, 249, CAST('0.2796306459978647' AS DOUBLE), 4),
        (4, 269, CAST('0.21694823423610035' AS DOUBLE), 9),
        (4, 280, CAST('0.27982608680315935' AS DOUBLE), 3),
        (4, 346, CAST('0.2315643366319568' AS DOUBLE), 7),
        (4, 353, CAST('0.22501395538951718' AS DOUBLE), 8),
        (4, 384, CAST('0.2404132698982267' AS DOUBLE), 6),
        (4, 408, CAST('0.32275312529105415' AS DOUBLE), 2),
        (4, 434, CAST('0.20870624783799507' AS DOUBLE), 10),
        (4, 470, CAST('0.2525366199686862' AS DOUBLE), 5)
    ) AS t("query_id", "vec_id", "cos_sim", "rank")
    """,
    oracle_sf="sf0.01",
    doc=(
        "IVF-PQ composed ANN (operators/similarity.build_ivf_index + "
        "pq_encode + ivfpq_topk): the coarse quantizer restricts WHICH "
        "vectors are scored (each query scans only its n_probe nearest "
        "cells — partition pruning on a cell-partitioned codes table), "
        "PQ codes decide HOW (8-byte LUT scan, m adds per vector), then "
        "exact cosine re-ranks the shortlist. The faiss IVFPQ shape: at "
        "100 TB a probe reads n_probe/n_lists of an already-compressed "
        "corpus. Rows-only: both structures are approximate by design; "
        "recall floor vs exact pinned in test_ops2."
    ),
)
def sim_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.similarity import (
        build_ivf_index,
        ivfpq_topk,
        pq_encode,
        train_pq_codebooks,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    index = build_ivf_index(emb, n_lists=16)
    books = train_pq_codebooks(emb, dim=64, m=8, n_codes=16)
    codes = pq_encode(emb, books)
    return ivfpq_topk(index, codes, books, queries, k=10, n_probe=4, shortlist_factor=4)


# ---------------------------------------------------------------------------
# Fixed-width histogram (single-pass, no min/max pre-pass)
# ---------------------------------------------------------------------------


@register(
    "hist_order_values",
    """
    SELECT CAST(floor(o_totalprice / 5000) AS BIGINT) AS bucket,
           CAST(floor(o_totalprice / 5000) * 5000 AS DOUBLE) AS bucket_lo,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM orders
    GROUP BY 1, 2
    """,
    doc=(
        "Fixed-width histogram of order values (5000-wide buckets): a "
        "single-pass groupBy on a pure bucket expression — no min/max "
        "pre-pass, no driver round trip, map-side partials shuffle one "
        "row per (partition, bucket). The distribution-analysis shape "
        "that complements percentile_order_value's exact quantiles."
    ),
)
def hist_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 5000).cast("long")
    return (
        o.groupBy(
            bucket.alias("bucket"),
            (bucket * 5000).cast("double").alias("bucket_lo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
    )
