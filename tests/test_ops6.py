"""Edge-case tests for the round-3d operators (queries_ops6): k-anonymity,
winsorization, JL random projection."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators.analytics import winsorize
from etl_s3_to_redshift_spark.operators.privacy import (
    k_anonymity_summary,
    k_anonymity_violations,
)
from etl_s3_to_redshift_spark.operators.similarity import (
    jl_sign_matrix,
    random_projection,
)


def test_k_anonymity_violations_and_summary(spark):
    rows = [(i, "a" if i < 8 else "b", i % 2) for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "seg", "flag"])
    # groups: (a,0)x4 (a,1)x4 (b,0)x1 (b,1)x1 -> two singleton violations at k=3
    v = k_anonymity_violations(df, ["seg", "flag"], k=3).collect()
    assert sorted((r["seg"], r["flag"], r["n_rows"]) for r in v) == [
        ("b", 0, 1),
        ("b", 1, 1),
    ]
    s = k_anonymity_summary(df, ["seg", "flag"], k=3).collect()[0]
    assert (s["n_combos"], s["n_violating_combos"], s["n_rows_at_risk"], s["actual_k"]) == (
        4,
        2,
        2,
        1,
    )


def test_winsorize_ungrouped_and_bounds(spark):
    vals = [float(x) for x in range(1, 101)]  # 1..100
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    out = winsorize(df, "x", group_cols=None, p_lo=0.10, p_hi=0.90).collect()
    lo = out[0]["p_lo_v"]
    hi = out[0]["p_hi_v"]
    # exact linear interpolation on 1..100: p10 = 1 + 0.10*99, p90 = 1 + 0.90*99
    assert lo == pytest.approx(10.9)
    assert hi == pytest.approx(90.1)
    for r in out:
        assert lo <= r["winsorized"] <= hi
        if lo <= r["x"] <= hi:
            assert r["winsorized"] == pytest.approx(r["x"])


def test_jl_sign_matrix_deterministic_and_balanced():
    m1 = jl_sign_matrix(64, 16)
    m2 = jl_sign_matrix(64, 16)
    assert m1 == m2
    flat = [s for row in m1 for s in row]
    assert set(flat) == {1.0, -1.0}
    # md5 parity should be near-balanced; huge tolerance, just not degenerate
    assert 0.35 < (flat.count(1.0) / len(flat)) < 0.65
    assert jl_sign_matrix(64, 16, seed="other") != m1


def test_random_projection_preserves_distances(spark):
    # JL guarantee is statistical; with 32 output dims and 20 unit-ish
    # vectors the pairwise distance ratios should stay within a loose band
    import random

    rng = random.Random(7)
    vecs = [
        (i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(20)
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = {
        r["vec_id"]: [r[f"p{j}"] for j in range(32)]
        for r in random_projection(df, in_dims=64, out_dims=32).collect()
    }
    orig = dict(vecs)

    def d(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    ratios = []
    for i in range(20):
        for j in range(i + 1, 20):
            do, dp = d(orig[i], orig[j]), d(out[i], out[j])
            if do > 0:
                ratios.append(dp / do)
    assert 0.4 < min(ratios) and max(ratios) < 1.8


def test_random_projection_keeps_other_columns(spark):
    df = spark.createDataFrame([(1, "x", [1.0] * 8)], ["vec_id", "tag", "embedding"])
    out = random_projection(df, in_dims=8, out_dims=4)
    assert set(out.columns) == {"vec_id", "tag", "p0", "p1", "p2", "p3"}


def test_rolling_zscore_flags_spike(spark):
    from etl_s3_to_redshift_spark.operators.analytics import rolling_zscore_anomalies

    # 30 quiet hours (alternating 10/12 events) then one 300-event spike
    rows = []
    eid = 0
    for h in range(30):
        n = 10 if h % 2 == 0 else 12
        for _ in range(n):
            rows.append((eid, f"2024-01-01 00:00:00", h)); eid += 1
    for _ in range(300):
        rows.append((eid, "2024-01-01 00:00:00", 30)); eid += 1
    df = spark.createDataFrame(rows, ["event_id", "base", "h"]).select(
        "event_id",
        (F.col("base").cast("timestamp") + F.make_interval(hours=F.col("h"))).alias("ts"),
        F.lit("click").alias("event_type"),
    )
    out = {
        r["bucket_epoch"]: r
        for r in rolling_zscore_anomalies(df, window_buckets=24).collect()
    }
    assert len(out) == 31
    spike = max(out)
    assert out[spike]["is_anomaly"] and out[spike]["zscore"] > 3
    quiet_flags = [r["is_anomaly"] for k, r in out.items() if k != spike]
    assert not any(quiet_flags)
    # first bucket has no trailing window -> NULL score, never flagged
    first = min(out)
    assert out[first]["zscore"] is None and not out[first]["is_anomaly"]


def test_attribution_conserves_value_and_weights(spark):
    from etl_s3_to_redshift_spark.operators.analytics import attribution_u_shaped

    rows = [
        # user 1: click, view, click then purchase 100 -> 40/20/40 by position
        (1, "2024-01-01 00:00:00", 1, "click", 0.0),
        (2, "2024-01-01 01:00:00", 1, "view", 0.0),
        (3, "2024-01-01 02:00:00", 1, "click", 0.0),
        (4, "2024-01-01 03:00:00", 1, "purchase", 100.0),
        # user 2: one view then purchase 50 -> view gets all 50
        (5, "2024-01-02 00:00:00", 2, "view", 0.0),
        (6, "2024-01-02 01:00:00", 2, "purchase", 50.0),
        # user 3: no touches -> unattributed 30
        (7, "2024-01-03 00:00:00", 3, "purchase", 30.0),
        # user 4: touch OUTSIDE the 7-day lookback -> unattributed 20
        (8, "2024-01-01 00:00:00", 4, "click", 0.0),
        (9, "2024-01-20 00:00:00", 4, "purchase", 20.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts_s", "user_id", "event_type", "value"]
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id",
        "event_type", "value",
    )
    out = {r["channel"]: r for r in attribution_u_shaped(df).collect()}
    assert out["click"]["credited_value"] == pytest.approx(80.0)  # 40 + 40
    assert out["view"]["credited_value"] == pytest.approx(70.0)  # 20 + 50
    assert out["unattributed"]["credited_value"] == pytest.approx(50.0)
    total = sum(float(r["credited_value"]) for r in out.values())
    assert total == pytest.approx(200.0)  # conservation
    assert out["unattributed"]["n_conversions"] == 2


def test_split_leakage_exact_and_prefix_modes(spark):
    from etl_s3_to_redshift_spark.operators.sampling import split_leakage

    # ids chosen so hash_split(50/50) separates some of them; texts: 1 and
    # 2 are byte-identical, 3 shares only the first five words, 4 unique
    rows = [
        (i, t)
        for i, t in [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "alpha beta gamma delta epsilon DIFFERENT tail entirely"),
            (4, "totally unrelated document body"),
        ]
    ] + [(i, "filler doc %d" % i) for i in range(10, 40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    w = {"a": 0.5, "b": 0.5}

    exact = split_leakage(df, w).collect()
    prefix = split_leakage(df, w, key_words=5).collect()
    # the exact key can only ever group docs 1+2; the prefix key groups
    # 1+2+3 — whether each LEAKS depends on the fixed hash assignment, so
    # assert the containment relation instead of specific rows
    exact_docs = sum(r["n_docs"] for r in exact)
    prefix_docs = sum(r["n_docs"] for r in prefix)
    assert exact_docs in (0, 2)
    assert prefix_docs >= exact_docs
    for r in exact + prefix:
        assert r["n_splits"] == 2 and r["splits"] == "a,b"


def test_audio_windows_kernel_math(spark):
    import math

    from etl_s3_to_redshift_spark.operators.multimodal import audio_windows

    # 6 bytes -> 3 int16 LE samples; window of 2 -> windows [s0,s1], [s2]
    payload = bytes([1, 0, 0, 1, 255, 127])  # samples 1, 256, 32767
    media = spark.createDataFrame(
        [(1, payload, "audio/pcm", None, None)],
        "media_id long, payload binary, mime string, width int, height int",
    )
    out = {
        r["window_no"]: r
        for r in audio_windows(media, window_samples=2, max_windows=8).collect()
    }
    assert out[0]["n_samples"] == 2 and out[1]["n_samples"] == 1
    assert out[0]["rms"] == pytest.approx(round(math.sqrt((1 + 256 * 256) / 2), 6))
    assert out[0]["peak"] == 256
    assert out[1]["peak"] == 32767

    # odd trailing byte dropped; empty payload yields no rows
    odd = spark.createDataFrame(
        [(2, bytes([5, 0, 9]), "audio/pcm", None, None),
         (3, b"", "audio/pcm", None, None)],
        "media_id long, payload binary, mime string, width int, height int",
    )
    rows = audio_windows(odd, window_samples=4).collect()
    assert len(rows) == 1 and rows[0]["media_id"] == 2 and rows[0]["n_samples"] == 1


def test_containment_catches_quote_jaccard_misses(spark):
    from etl_s3_to_redshift_spark.operators.dedup import containment_pairs, jaccard_pairs

    quote = "alpha beta gamma delta epsilon zeta eta theta"
    page = quote + " " + " ".join(f"filler{i} word{i} more{i}" for i in range(30))
    rows = [(1, quote), (2, page), (3, "completely different text about nothing")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    cont = containment_pairs(df, threshold=0.9).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r["id_small"], r["id_big"]) == (1, 2)
    assert r["containment"] == 1.0  # every quote shingle is in the page
    # Jaccard cannot see this pair at any near-dup threshold
    jac = jaccard_pairs(df, threshold=0.5).collect()
    assert jac == []


def test_stop_shingle_cap_kills_boilerplate_pair_explosion(spark):
    from etl_s3_to_redshift_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    # 1000 docs sharing ONE boilerplate shingle (and nothing else
    # pairwise) — the hot posting list that would quadratically explode
    # into ~500k candidate pairs — plus one genuine quote/page pair
    boiler = [
        (i, f"visit our website u{i}a u{i}b u{i}c") for i in range(1000)
    ]
    quote = "alpha beta gamma delta epsilon zeta"
    page = quote + " " + " ".join(f"tail{j}" for j in range(20))
    rows = boiler + [(5001, quote), (5002, page)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    # threshold 0 surfaces every candidate pair the self-join materializes:
    # without the cap the boilerplate family dominates quadratically...
    uncapped = containment_pairs(df, threshold=0.0).count()
    assert uncapped >= 1000 * 999 // 2
    # ...with the cap the 500k-pair bucket vanishes entirely while the
    # genuine containment pair survives with its exact score
    capped = containment_pairs(df, threshold=0.0, max_df=10).collect()
    assert len(capped) == 1
    r = capped[0]
    assert (r["id_small"], r["id_big"], r["containment"]) == (5001, 5002, 1.0)

    # same cap on the Jaccard generator
    jac = jaccard_pairs(df, threshold=0.01, max_df=10).collect()
    assert len(jac) == 1 and (jac[0]["id_a"], jac[0]["id_b"]) == (5001, 5002)


def test_sliding_distinct_counts_each_user_once_per_window(spark):
    from etl_s3_to_redshift_spark.queries import REGISTRY

    # user 7 appears in hours 0,1,2 -> within the window starting at hour
    # -1 (covering 0..3) they must count ONCE
    rows = [
        (1, "2024-01-01 00:30:00", 7),
        (2, "2024-01-01 01:30:00", 7),
        (3, "2024-01-01 02:30:00", 7),
        (4, "2024-01-01 00:45:00", 9),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts_s", "user_id"]).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id"
    )
    hour = F.floor(F.unix_timestamp("ts") / 3600).cast("long")
    win = df.select(
        F.explode(
            F.transform(F.sequence(F.lit(0), F.lit(3)), lambda kk: (hour - kk) * 3600)
        ).alias("w"),
        "user_id",
    ).distinct()
    got = {
        r["w"]: r["n"]
        for r in win.groupBy("w").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    epoch0 = 1704067200  # 2024-01-01 00:00 UTC
    assert got[epoch0] == 2  # window [0,4): users 7 and 9
    assert got[epoch0 - 3 * 3600] == 2  # window [-3,1): both users, once each
    assert got[epoch0 + 2 * 3600] == 1  # window [2,6): only user 7


def test_moving_median_interpolation(spark, tmp_path):
    from etl_s3_to_redshift_spark.queries_ops6 import w8_moving_median

    # one event per hour: frame prefixes [5], [5,1], [5,1,9], [5,1,9,3]
    # -> medians 5, 3 (interpolated), 5, 4 (interpolated)
    rows = [("a", f"2024-01-01 0{h}:10:00", v) for h, v in enumerate([5.0, 1.0, 9.0, 3.0])]
    df = spark.createDataFrame(rows, ["event_type", "ts_s", "value"]).select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = sorted(
        (r["bucket_epoch"], r["moving_median"])
        for r in w8_moving_median(spark, str(tmp_path)).collect()
    )
    assert [v for _e, v in out] == [5.0, 3.0, 5.0, 4.0]
