"""Round-3d operator-coverage queries: k-anonymity audit, percentile
winsorization, and Johnson–Lindenstrauss random projection — each with an
exact DuckDB oracle.

These close out the privacy/feature-prep surface next to round-3c's PII
scrub: k-anonymity is the release-gate audit against linkage attacks;
winsorization is the robust-scaling step before quality calibration;
JL projection is the dimensionality cut before ANN indexing (SURVEY §2c
similarity-search scale path).

Exactness rules follow queries.py: exact linear-interpolation percentiles
(Spark ``percentile`` == DuckDB ``quantile_cont``, probe-verified at
sf0.01); JL dot products fold in index order in double on BOTH engines
(the oracle's sum chain starts from a DOUBLE cast, and ±1 signs make
multiply-vs-subtract bit-identical); results rounded 6 dp, 10 orders
above any residual drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators.analytics import winsorize
from etl_s3_to_redshift_spark.operators.privacy import k_anonymity_violations
from etl_s3_to_redshift_spark.operators.similarity import (
    jl_sign_matrix,
    random_projection,
)
from etl_s3_to_redshift_spark.queries import _t, register

# ---------------------------------------------------------------------------
# k-anonymity audit (privacy release gate)
# ---------------------------------------------------------------------------

_KANON_K = 5


@register(
    "privacy_k_anonymity",
    f"""
    SELECT c_nationkey,
           c_mktsegment,
           CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS acctbal_band,
           count(*) AS n_rows
    FROM customer
    GROUP BY 1, 2, 3
    HAVING count(*) < {_KANON_K}
    """,
    doc=(
        "k-anonymity audit (operators/privacy.k_anonymity_violations): "
        "quasi-identifier combos (nation, segment, banded account "
        "balance) with group size < k — the rows a linkage attack could "
        "single out in a data release. One groupBy shuffle on the quasi "
        "tuple with map-side combine; the violation filter runs on the "
        "combo-sized aggregate, never the row-sized table."
    ),
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return k_anonymity_violations(
        _t(spark, sf_dir, "customer"),
        quasi_cols=[
            F.col("c_nationkey"),
            F.col("c_mktsegment"),
            F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("acctbal_band"),
        ],
        k=_KANON_K,
    )


# ---------------------------------------------------------------------------
# Percentile winsorization (robust feature scaling)
# ---------------------------------------------------------------------------


@register(
    "scale_winsorize",
    """
    WITH pct AS (
        SELECT c_mktsegment,
               round(quantile_cont(c_acctbal, 0.05), 6) AS p_lo_v,
               round(quantile_cont(c_acctbal, 0.95), 6) AS p_hi_v,
               quantile_cont(c_acctbal, 0.05) AS lo_raw,
               quantile_cont(c_acctbal, 0.95) AS hi_raw
        FROM customer GROUP BY 1
    )
    SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal, p.p_lo_v, p.p_hi_v,
           round(least(greatest(c.c_acctbal, p.lo_raw), p.hi_raw), 6) AS winsorized
    FROM customer c JOIN pct p USING (c_mktsegment)
    """,
    doc=(
        "Per-segment percentile winsorization of account balance "
        "(operators/analytics.winsorize): clamp to the exact "
        "linear-interpolation [p05, p95] band — the robust-scaling "
        "transform before calibration/regression features. Percentiles "
        "from ONE group aggregate, broadcast back (group-count rows); "
        "the clamp is a narrow projection. At 100 TB swap the exact "
        "percentile for percentile_approx — this query keeps the exact "
        "form because its contract is oracle equality."
    ),
)
def scale_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = winsorize(
        _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal"),
        value_col="c_acctbal",
        group_cols=["c_mktsegment"],
        p_lo=0.05,
        p_hi=0.95,
    )
    return out.select(
        "c_custkey", "c_mktsegment", "c_acctbal", "p_lo_v", "p_hi_v", "winsorized"
    )


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection (ANN preprocessing)
# ---------------------------------------------------------------------------

_JL_IN, _JL_OUT = 64, 16
_JL_SIGNS = jl_sign_matrix(_JL_IN, _JL_OUT)


def _jl_sql_dot(j: int) -> str:
    terms = "".join(
        (" + " if s > 0 else " - ") + f"embedding[{i + 1}]"
        for i, s in enumerate(_JL_SIGNS[j][1:], start=1)
    )
    head = f"CAST(embedding[1] AS DOUBLE)" if _JL_SIGNS[j][0] > 0 else f"(0.0 - CAST(embedding[1] AS DOUBLE))"
    return f"round(({head}{terms}) / 4.0, 6) AS p{j}"


@register(
    "emb_random_projection",
    "SELECT vec_id, label, "
    + ", ".join(_jl_sql_dot(j) for j in range(_JL_OUT))
    + " FROM embeddings",
    doc=(
        "Johnson–Lindenstrauss ±1 random projection 64 → 16 dims "
        "(operators/similarity.random_projection): content-addressed "
        "sign matrix from md5(i,j) — no RNG state, no stored matrix "
        "artifact — scaled 1/sqrt(16). The ANN-preprocessing "
        "dimensionality cut: pairwise distances preserved within (1±ε). "
        "Pure narrow projection inside the scan (index-order double "
        "folds against literal sign arrays); zero shuffles, zero UDFs. "
        "Oracle folds the identical chain (±1 makes multiply and "
        "subtract bit-identical), so 6-dp values match exactly."
    ),
)
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return random_projection(
        _t(spark, sf_dir, "embeddings"), in_dims=_JL_IN, out_dims=_JL_OUT
    )


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection (time-series monitoring)
# ---------------------------------------------------------------------------

_ZS_WIN, _ZS_THRESH = 24, 3.0


@register(
    "ts_anomaly_zscore",
    f"""
    WITH hourly AS (
        SELECT event_type,
               CAST(floor(CAST(epoch(ts) AS DOUBLE) / 3600) AS BIGINT) * 3600
                   AS bucket_epoch,
               count(*) AS n_events
        FROM events GROUP BY 1, 2
    ),
    scored AS (
        SELECT event_type, bucket_epoch, n_events,
               count(*) OVER wt AS n_trailing,
               avg(CAST(n_events AS DOUBLE)) OVER wt AS m,
               stddev_samp(CAST(n_events AS DOUBLE)) OVER wt AS sd
        FROM hourly
        WINDOW wt AS (PARTITION BY event_type ORDER BY bucket_epoch
                      ROWS BETWEEN {_ZS_WIN} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, bucket_epoch, n_events, n_trailing,
           CASE WHEN n_trailing >= 2 AND sd > 0
                THEN round((n_events - m) / sd, 6) END AS zscore,
           coalesce(abs(CASE WHEN n_trailing >= 2 AND sd > 0
                             THEN round((n_events - m) / sd, 6) END)
                    >= {_ZS_THRESH}, false) AS is_anomaly
    FROM scored
    """,
    doc=(
        "Rolling z-score anomaly detection on the hourly per-type event "
        "grid (operators/analytics.rolling_zscore_anomalies): each "
        "bucket's count scored against the mean/sample-stddev of the 24 "
        "PRECEDING observed buckets (the score never sees the value it "
        "judges); |z| >= 3 flags. One bucket-aggregate shuffle + one "
        "per-key window sort; state bounded by keys x window. 6-dp "
        "rounding is 6+ orders above cross-engine stddev drift."
    ),
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.analytics import rolling_zscore_anomalies

    out = rolling_zscore_anomalies(
        _t(spark, sf_dir, "events"),
        key_col="event_type",
        ts_col="ts",
        window_buckets=_ZS_WIN,
        z_threshold=_ZS_THRESH,
    )
    return out.select(
        "event_type", "bucket_epoch", "n_events", "n_trailing", "zscore", "is_anomaly"
    )


# ---------------------------------------------------------------------------
# U-shaped multi-touch attribution (marketing analytics)
# ---------------------------------------------------------------------------


@register(
    "attr_multi_touch",
    """
    WITH conv AS (
        SELECT user_id AS u, event_id AS conv_id, ts AS cts,
               CAST(value AS DOUBLE) AS val
        FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT user_id AS u, event_id AS touch_id, event_type AS channel, ts AS tts
        FROM events WHERE event_type IN ('click', 'view')
    ),
    pairs AS (
        SELECT c.conv_id, c.val, t.channel, t.tts, t.touch_id
        FROM conv c JOIN touch t USING (u)
        WHERE t.tts <= c.cts AND t.tts >= c.cts - INTERVAL 168 HOURS
    ),
    ranked AS (
        SELECT conv_id, val, channel,
               row_number() OVER (PARTITION BY conv_id
                                  ORDER BY tts ASC, touch_id ASC) AS pos,
               count(*) OVER (PARTITION BY conv_id) AS n
        FROM pairs
    ),
    credits AS (
        SELECT conv_id, channel,
               CAST(round(CASE WHEN n = 1 THEN 1.0
                               WHEN n = 2 THEN 0.5
                               WHEN pos = 1 THEN 0.4
                               WHEN pos = n THEN 0.4
                               ELSE 0.2 / (n - 2) END * val, 9)
                    AS DECIMAL(20,9)) AS credit
        FROM ranked
        UNION ALL
        SELECT c.conv_id, 'unattributed' AS channel,
               CAST(round(c.val, 9) AS DECIMAL(20,9)) AS credit
        FROM conv c
        WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.conv_id = c.conv_id)
    )
    SELECT channel,
           round(CAST(sum(credit) AS DOUBLE), 6) AS credited_value,
           count(*) AS n_credits,
           count(DISTINCT conv_id) AS n_conversions
    FROM credits GROUP BY channel
    """,
    doc=(
        "U-shaped multi-touch attribution "
        "(operators/analytics.attribution_u_shaped): every purchase "
        "splits its value across the user's click/view touches in the "
        "preceding 7 days — lone touch 100%, two 50/50, else 40/40 "
        "first/last + 20% shared by middles; untouched purchases credit "
        "'unattributed', so credited value conserves total conversion "
        "value. Per-user equi-join with in-join time bound (never a "
        "cross product), one window sort per conversion set, per-credit "
        "9-dp rounding + exact DECIMAL rollup (order-independent)."
    ),
)
def attr_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.analytics import attribution_u_shaped

    return attribution_u_shaped(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Split-contamination audit (train/eval leakage gate)
# ---------------------------------------------------------------------------


@register(
    "data_split_leakage",
    r"""
    WITH assigned AS (
        SELECT md5(array_to_string(list_slice(
                   list_filter(string_split_regex(trim(lower(text)), '\s+'),
                               x -> x != ''), 1, 5), ' ')) AS content_key,
               CASE WHEN substring(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 8)
                         < 'e6666666' THEN 'train'
                    WHEN substring(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 8)
                         < 'f3333333' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT content_key,
           count(*) AS n_docs,
           count(DISTINCT split) AS n_splits,
           array_to_string(list_sort(list_distinct(list(split))), ',') AS splits
    FROM assigned
    GROUP BY content_key
    HAVING count(DISTINCT split) > 1
    """,
    doc=(
        "Train/eval split-contamination audit "
        "(operators/sampling.split_leakage): content fingerprints that "
        "land in more than one split of the 90/5/5 hash_split — keyed "
        "here on the first-5-words blocking fingerprint so "
        "template/boilerplate near-dup families are caught, not just "
        "byte-exact dups (4 leaking families exist in the sf0.01 lake). "
        "Split assignment + fingerprint are in-scan expressions; the "
        "audit is one fingerprint groupBy with the >1-split filter on "
        "the fingerprint-sized aggregate — exact-dedup cost class."
    ),
)
def data_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.sampling import split_leakage

    return split_leakage(
        _t(spark, sf_dir, "documents"),
        {"train": 0.9, "val": 0.05, "test": 0.05},
        key_words=5,
    )


# ---------------------------------------------------------------------------
# Audio-modality plumbing (PCM windows via Arrow kernel)
# ---------------------------------------------------------------------------


@register(
    "mm_audio_windows",
    """
    WITH m AS (
        -- byte-based kernel vs char-based SQL: only identical for ASCII
        -- text (strlen = bytes, length = chars). The filter makes the
        -- precondition explicit — a lake that gains non-ASCII docs
        -- fails the row-count compare LOUDLY instead of silently
        -- diverging on misaligned samples.
        SELECT doc_id AS media_id, text, strlen(text) // 2 AS n_samp
        FROM documents
        WHERE strlen(text) = length(text)
    ),
    w AS (
        SELECT media_id, text, n_samp,
               unnest(range(least(CAST(ceil(n_samp / 64.0) AS INTEGER), 16)))
                   AS window_no
        FROM m WHERE n_samp > 0
    ),
    s AS (
        SELECT media_id, window_no, text,
               unnest(range(window_no * 64, least((window_no + 1) * 64, n_samp)))
                   AS si
        FROM w
    ),
    v AS (
        -- signed little-endian int16, matching the kernel's numpy view:
        -- unsigned word, then two's-complement correction (a no-op for
        -- ASCII payloads where the high byte is always < 0x80)
        SELECT media_id, window_no,
               CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS val
        FROM (
            SELECT media_id, window_no,
                   ascii(substring(text, si * 2 + 1, 1))
                       + 256 * ascii(substring(text, si * 2 + 2, 1)) AS u
            FROM s
        )
    )
    SELECT media_id,
           CAST(window_no AS INTEGER) AS window_no,
           CAST(count(*) AS INTEGER) AS n_samples,
           round(sqrt(CAST(sum(val * val) AS DOUBLE) / count(*)), 6) AS rms,
           CAST(max(abs(val)) AS INTEGER) AS peak
    FROM v GROUP BY media_id, window_no
    """,
    doc=(
        "Audio-modality plumbing (operators/multimodal.audio_windows): "
        "payloads interpreted as 16-bit LE PCM (the honest codec "
        "stand-in; payload bytes here are ASCII, so the oracle rebuilds "
        "each sample from character codes), windowed into 64-sample "
        "frames with per-window RMS (6 dp from an exact integer "
        "sum-of-squares) and peak. The windowing runs INSIDE the Arrow "
        "kernel — one vectorized numpy pass per batch, raw bytes never "
        "amplify across a shuffle, zero shuffles, partitioning "
        "preserved."
    ),
)
def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.multimodal import (
        audio_windows,
        docs_as_media,
    )

    media = docs_as_media(_t(spark, sf_dir, "documents"))
    return audio_windows(media, window_samples=64, max_windows=16)


# ---------------------------------------------------------------------------
# Deterministic mode + exact median per group
# ---------------------------------------------------------------------------


@register(
    "agg_mode_median",
    """
    WITH pr AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY 1, 2
    ),
    md AS (
        SELECT o_orderstatus, o_orderpriority AS mode_priority,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY n DESC, o_orderpriority ASC) AS rk
        FROM pr
    ),
    med AS (
        SELECT o_orderstatus,
               round(median(o_totalprice), 6) AS median_totalprice,
               count(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT m.o_orderstatus AS status, md.mode_priority,
           m.median_totalprice, m.n_orders
    FROM med m JOIN md ON md.o_orderstatus = m.o_orderstatus AND md.rk = 1
    """,
    doc=(
        "Deterministic MODE (most frequent order priority per status, "
        "count-desc value-asc tiebreak — engines' native mode() breaks "
        "ties arbitrarily, so it is computed as count+rank) and exact "
        "linear-interpolation MEDIAN of the order value per status "
        "(Spark median == DuckDB median == quantile_cont 0.5). Two "
        "group-sized aggregates; the rank runs on the (status, priority) "
        "combo frame, never row-sized data."
    ),
)
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    pr = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority").asc()
    )
    md = (
        pr.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"))
    )
    med = o.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 6).alias("median_totalprice"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return med.join(md, "o_orderstatus").select(
        F.col("o_orderstatus").alias("status"),
        "mode_priority",
        "median_totalprice",
        "n_orders",
    )


# ---------------------------------------------------------------------------
# Top-k per group WITH ties (rank semantics, vs w1's row_number)
# ---------------------------------------------------------------------------


@register(
    "w6_topk_with_ties",
    """
    SELECT o_custkey AS customer_id, o_orderkey AS order_id,
           o_totalprice AS total_price, CAST(rk AS INTEGER) AS rk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               rank() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC) AS rk
        FROM orders
    ) WHERE rk <= 3
    """,
    doc=(
        "Top-3 orders per customer WITH TIES (rank(), not w1's "
        "row_number()): equal-value orders all surface, so the result is "
        "deterministic without an id tiebreak and matches SQL:2008 FETCH "
        "... WITH TIES semantics. One per-key window sort; output size "
        "tracks k + tie multiplicity."
    ),
)
def w6_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return (
        o.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("o_custkey").alias("customer_id"),
            F.col("o_orderkey").alias("order_id"),
            F.col("o_totalprice").alias("total_price"),
            "rk",
        )
    )


# ---------------------------------------------------------------------------
# Containment dedup (asymmetric quote/excerpt relation)
# ---------------------------------------------------------------------------


@register(
    "dedup_containment",
    r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\s+'),
                           x -> x != '') AS w
        FROM documents
    ),
    s AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(greatest(len(w) - 2, 1)),
                   i -> array_to_string(list_slice(w, i + 1, i + 3), ' ')
               )) AS sh
        FROM t
    ),
    e AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
    sizes AS (SELECT doc_id, count(*) AS n FROM e GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    j AS (
        SELECT id_a, id_b, n_inter, sa.n AS n_a, sb.n AS n_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
    )
    SELECT CASE WHEN n_a < n_b OR (n_a = n_b AND id_a < id_b)
                THEN id_a ELSE id_b END AS id_small,
           CASE WHEN n_a < n_b OR (n_a = n_b AND id_a < id_b)
                THEN id_b ELSE id_a END AS id_big,
           round(CAST(n_inter AS DOUBLE) / least(n_a, n_b), 6) AS containment,
           least(n_a, n_b) AS n_small,
           greatest(n_a, n_b) AS n_big
    FROM j
    WHERE CAST(n_inter AS DOUBLE) / least(n_a, n_b) >= 0.9
    """,
    doc=(
        "Asymmetric containment dedup (operators/dedup.containment_pairs): "
        "pairs where the smaller shingle set is >=90% contained in the "
        "larger — the quote/excerpt relation Jaccard misses (a paragraph "
        "quoted inside a long page has tiny J but containment 1.0). Same "
        "inverted-index shape as jaccard_pairs: only co-shingle pairs "
        "materialize, exact intersection counts, sizes joined back "
        "id-partitioned; at 100 TB run over MinHash candidates."
    ),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.dedup import containment_pairs

    return containment_pairs(_t(spark, sf_dir, "documents"), threshold=0.9)


# ---------------------------------------------------------------------------
# Exact distinct users per SLIDING window (overlap-aware distinct)
# ---------------------------------------------------------------------------


@register(
    "w7_sliding_distinct_users",
    """
    WITH assigned AS (
        SELECT DISTINCT
               (CAST(floor(CAST(epoch(ts) AS DOUBLE) / 3600) AS BIGINT)
                    - k.k) * 3600 AS window_start_epoch,
               user_id
        FROM events
        CROSS JOIN (SELECT unnest(range(4)) AS k) k
    )
    SELECT window_start_epoch,
           count(*) AS n_distinct_users
    FROM assigned
    GROUP BY window_start_epoch
    """,
    doc=(
        "Exact distinct users per SLIDING 4-hour window (1-hour slide): "
        "distinct is NOT decomposable across overlapping windows (a user "
        "in 3 buckets of one window counts once), so each event expands "
        "to its 4 covering windows and a two-phase distinct-then-count "
        "aggregate runs per window — amplification is exactly "
        "window/slide = 4x, the price of exactness (streaming systems "
        "pay it in state; HLL sketches trade it for error). The "
        "(window, user) distinct is the only corpus-sized shuffle; the "
        "count runs on the already-distinct frame."
    ),
)
def w7_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hour = F.floor(F.unix_timestamp("ts") / 3600).cast("long")
    windows = ev.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)), lambda kk: (hour - kk) * 3600
            )
        ).alias("window_start_epoch"),
        "user_id",
    ).distinct()
    return windows.groupBy("window_start_epoch").agg(
        F.count(F.lit(1)).alias("n_distinct_users")
    )


# ---------------------------------------------------------------------------
# Moving exact median (order statistic over a sliding frame)
# ---------------------------------------------------------------------------


@register(
    "w8_moving_median",
    """
    WITH hourly AS (
        SELECT event_type,
               CAST(floor(CAST(epoch(ts) AS DOUBLE) / 3600) AS BIGINT) * 3600
                   AS bucket_epoch,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, bucket_epoch,
           round(v, 6) AS bucket_value,
           round(median(v) OVER (PARTITION BY event_type ORDER BY bucket_epoch
                                 ROWS BETWEEN 5 PRECEDING AND CURRENT ROW),
                 6) AS moving_median
    FROM hourly
    """,
    doc=(
        "Moving exact median of the hourly per-type value total over a "
        "trailing 6-bucket frame — the robust smoother for spiky "
        "series (a moving MEAN chases outliers; the z-score detector "
        "flags them). Spark has no frame-median, so the operator "
        "collects the frame into an array and takes the interpolated "
        "middle of its sort — O(frame log frame) per row, correct for "
        "the BOUNDED frames this op is for (the oracle uses DuckDB's "
        "native windowed median). Bucket values are exact decimal sums "
        "cast once to double, so both engines interpolate identical "
        "operands."
    ),
)
def w8_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    bucket = (
        F.floor(F.unix_timestamp("ts") / 3600).cast("long") * 3600
    ).alias("bucket_epoch")
    hourly = ev.groupBy(F.col("event_type"), bucket).agg(
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("v")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_epoch")
        .rowsBetween(-5, 0)
    )
    arr = F.array_sort(F.collect_list("v").over(w))
    n = F.size(arr)
    mid_hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    odd = F.element_at(arr, ((n + 1) / 2).cast("int"))
    even = (F.element_at(arr, (n / 2).cast("int")) + mid_hi) / 2.0
    median = F.when(n % 2 == 1, odd).otherwise(even)
    return hourly.select(
        "event_type",
        "bucket_epoch",
        F.round("v", 6).alias("bucket_value"),
        F.round(median, 6).alias("moving_median"),
    )


# ---------------------------------------------------------------------------
# Calendar heatmap: day-of-week x hour-of-day activity matrix (wide pivot)
# ---------------------------------------------------------------------------

_HEAT_HOURS = ", ".join(
    f"CAST(sum(CASE WHEN hr = {h} THEN 1 ELSE 0 END) AS BIGINT) AS h{h}"
    for h in range(24)
)


@register(
    "events_heatmap_dow_hour",
    f"""
    WITH e AS (
        SELECT ((CAST(floor(CAST(epoch(ts) AS DOUBLE) / 86400) AS BIGINT) + 4) % 7)
                   AS dow,
               CAST(floor((CAST(epoch(ts) AS DOUBLE) % 86400) / 3600) AS BIGINT)
                   AS hr
        FROM events
    )
    SELECT dow, {_HEAT_HOURS}
    FROM e GROUP BY dow
    """,
    doc=(
        "Calendar activity heatmap: day-of-week (0=Sunday, derived as "
        "(epoch_days + 4) %% 7 — pure integer arithmetic, immune to the "
        "engines' conflicting dayofweek() numbering) x hour-of-day event "
        "counts, pivoted to 24 wide columns. Spark uses the native "
        "pivot with an explicit value list (no extra distinct-values "
        "job, schema stable at any scale); the oracle is 24 conditional "
        "aggregates. One groupBy shuffle carrying 7 rows x 24 partials."
    ),
)
def events_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    staged = ev.select(
        ((F.floor(epoch / 86400).cast("long") + 4) % 7).alias("dow"),
        F.floor((epoch % 86400) / 3600).cast("long").alias("hr"),
    )
    out = (
        staged.groupBy("dow")
        .pivot("hr", list(range(24)))
        .count()
    )
    # pivot leaves null for absent (dow, hour) cells; the oracle's
    # conditional sums yield 0 — align, and rename to stable h{h} names
    return out.select(
        "dow",
        *[F.coalesce(F.col(str(h)), F.lit(0)).alias(f"h{h}") for h in range(24)],
    )
