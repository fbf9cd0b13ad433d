"""Deterministic sampling / splitting / packing operators for training-data
pipelines.

Everything here is content-addressed and engine-portable: split and sample
decisions derive from md5 of the row's id (identical hex in Spark, DuckDB,
Redshift), never from RNG state, partition order, or row position. That is
the property that matters at 100 TB: re-running the pipeline on a different
cluster layout — or incrementally on new data — assigns every historical
row to the same split/sample, so train/val contamination can't creep in
through nondeterminism. All three operators are pure DataFrame expressions
(zero Python, zero UDFs); only ``stratified_sample`` and
``pack_sequences`` shuffle at all (one window each).

The reference has no sampling surface (it loads everything); these extend
the engine for the dataset-curation workloads in SURVEY §2c.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_WIDTH = 8  # 32 bits of the md5 — plenty below any realistic split skew


def _hash_key(id_col: Column, seed: str) -> Column:
    """First 8 hex chars of md5('{seed}:{id}') — a fixed-width lowercase
    hex string whose LEXICOGRAPHIC order equals its numeric order, so
    range-splitting works with plain string comparison in any engine."""
    return F.substring(F.md5(F.concat(F.lit(seed), F.lit(":"), id_col.cast("string"))), 1, _HEX_WIDTH)


def split_boundaries(weights: dict[str, float]) -> list[tuple[str, str | None]]:
    """(split_name, upper_hex_bound) pairs for cumulative weights; the
    last split's bound is None (it is the CASE/when fallback, so weights
    that do not sum to exactly 1.0 — float drift — still cover every
    row)."""
    total = sum(weights.values())
    bounds, acc = [], 0.0
    names = list(weights)
    for i, name in enumerate(names):
        acc += weights[name] / total
        upper = None if i == len(names) - 1 else format(int(acc * 16**_HEX_WIDTH), f"0{_HEX_WIDTH}x")
        bounds.append((name, upper))
    return bounds


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "split42",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by content hash.

    Each row lands in the split whose cumulative-weight range contains its
    32-bit md5 bucket — a pure per-row expression (no shuffle, no RNG).
    Stable under re-runs, appends, repartitioning, and engine ports (md5
    hex is identical everywhere; the oracle uses the same CASE WHEN over
    the same substring).
    """
    key = _hash_key(F.col(id_col), seed)
    bounds = split_boundaries(weights)
    expr = None
    for name, upper in bounds[:-1]:
        cond = key < F.lit(upper)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(bounds[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str = "doc_id",
    seed: str = "sample42",
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows inside each stratum by
    their content hash (id tiebreak) and keep the first k.

    Equivalent to a uniform random sample per stratum, but reproducible:
    the chosen set is a function of ids only. One shuffle on the strata
    key; rank via row_number (per-partition heaps would need a custom agg —
    at k ≪ stratum size the window is fine because only k rows per stratum
    survive the filter)."""
    w = Window.partitionBy(*strata_cols).orderBy(
        _hash_key(F.col(id_col), seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    part_col: str = "lang",
    order_col: str = "doc_id",
    bin_col: str = "bin_id",
) -> DataFrame:
    """Greedy sequential sequence packing: walk each partition's documents
    in ``order_col`` order, concatenating into context windows of
    ``budget`` tokens; a document starts in the bin its running prefix sum
    falls into (documents may straddle a boundary — the pack-with-split
    convention of LM training pipelines).

    bin = floor(exclusive_prefix_sum / budget): one window cumsum per
    partition key — a single shuffle, no iteration, no driver state. The
    same arithmetic runs as ANSI SQL for the oracle."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(bin_col, F.floor(prev / F.lit(budget)))


def training_order(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "shuffle42",
    n_buckets: int = 32,
) -> DataFrame:
    """Deterministic global shuffle order for training readers — WITHOUT a
    global sort. A single ``row_number() OVER (ORDER BY hash)`` would
    funnel the whole corpus through one task; instead the permutation is
    factored into (bucket, pos): the content hash routes each row to one
    of ``n_buckets`` buckets, and rows rank only within their bucket —
    every window partition runs in parallel. A reader consuming buckets in
    index order, each bucket in pos order, sees a deterministic
    pseudo-random permutation of the corpus (hash order is independent of
    ingest order), and epoch reshuffles are just a new seed.

    Same portability contract as hash_split: order derives from md5 hex,
    identical in any engine, stable under re-runs/appends/repartitioning.
    Set ``n_buckets`` to O(corpus/executor-memory) at scale so each
    bucket's sort fits one task comfortably. The bucket is taken from the
    first 8 hex chars (32 bits), so any n_buckets up to ~4e9 yields
    non-empty buckets — a 2-hex-char key would silently cap parallelism
    at 256 buckets.
    """
    if not (1 <= n_buckets <= 1 << 32):
        raise ValueError(f"n_buckets must be in [1, 2^32]; got {n_buckets}")
    key = _hash_key(F.col(id_col), seed)
    bucket = (
        F.pmod(F.conv(F.substring(key, 1, 8), 16, 10).cast("long"), F.lit(n_buckets))
        .cast("int")
    ).alias("bucket")
    w = Window.partitionBy("bucket").orderBy(F.col("__hk").asc(), F.col(id_col).asc())
    return (
        df.withColumn("__hk", key)
        .withColumn("bucket", bucket)
        .withColumn("pos", F.row_number().over(w))
        .drop("__hk")
    )


def source_quotas(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    temperature: float = 0.5,
) -> DataFrame:
    """Largest-remainder apportionment of ``budget`` rows across the
    distinct values of ``group_col``, with temperature-scaled weights
    ``w_g = n_g ** temperature`` — the standard multi-source mixture rule
    for LLM corpora (alpha < 1 upweights small sources, e.g. the 0.3-0.7
    exponents used for multilingual / multi-domain pretraining mixes).

    Engine-portable exactness: only ``temperature = 0.5`` (IEEE
    ``sqrt``, correctly rounded and therefore bit-identical in the JVM,
    DuckDB, and Redshift) and ``temperature in (0.0, 1.0)`` (integer
    weights) are guaranteed to reproduce across engines; other exponents
    go through ``pow``, where libm implementations may differ by 1 ulp.
    The weight is scaled to an integer (``floor(w * 1e9)``) and every
    subsequent step — base quota ``budget*W div T``, remainder ranking,
    leftover distribution — runs in exact DECIMAL(38,0) integer
    arithmetic (Spark decimal ``div``/``%`` are exact; the DuckDB twin
    uses HUGEINT), so the apportionment is deterministic everywhere and
    immune to the int64 overflow a BIGINT ``budget*W`` would hit at
    LLM-corpus scale (budget 1e6 x a 1e8-row source already exceeds
    2^63 with BIGINT; DECIMAL(38,0) holds products to 1e38).

    Scale shape: one map-side-combined groupBy on ``group_col`` over the
    corpus; everything after runs on #groups rows. Returns
    ``(group_col, n_rows, quota)`` with quota CAPPED at ``n_rows`` —
    a group cannot deliver more rows than it has, so when temperature
    upweights a small source past its size, ``sum(quota)`` is LESS than
    ``budget`` (visibly: the returned n_rows/quota columns show the
    saturation; callers needing the full budget re-apportion the
    shortfall over the unsaturated groups). With no saturated group,
    ``sum(quota) == min(budget, ...)`` exactly.
    """
    if temperature == 0.0:
        w = F.lit(int(1e9)).cast("decimal(38,0)")
    elif temperature == 1.0:
        w = (F.col("n_rows").cast("decimal(38,0)") * F.lit(int(1e9)).cast("decimal(38,0)"))
    elif temperature == 0.5:
        w = F.floor(F.sqrt(F.col("n_rows").cast("double")) * F.lit(1e9)).cast("decimal(38,0)")
    else:
        w = F.floor(
            F.pow(F.col("n_rows").cast("double"), F.lit(float(temperature))) * F.lit(1e9)
        ).cast("decimal(38,0)")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_rows")).withColumn("w", w)
    return _apportion(counts, budget, group_col)


def _apportion(counts: DataFrame, budget: int, group_col: str) -> DataFrame:
    """Largest-remainder apportionment over a pre-weighted counts frame
    ``(group_col, n_rows, w)`` — shared by the row-budget
    (``source_quotas``) and token-budget (``token_quotas``) mixtures.
    ``n_rows`` is the group's deliverable unit total (rows or tokens);
    the returned quota is capped at it."""
    # Total weight, leftover, and remainder rank are all computed with
    # GLOBAL windows over the #groups-row counts frame (single tiny
    # partition by construction) instead of scalar cross-joins — a
    # cross-join formulation re-derives the counts subtree per scalar
    # and triples the corpus scans in the physical plan.
    wall = Window.partitionBy()
    rk = Window.orderBy(F.col("rem").desc(), F.col(group_col).asc())
    return (
        counts.withColumn("t", F.sum("w").over(wall))
        .withColumn("__prod", F.expr(f"CAST({budget} AS DECIMAL(38,0)) * w"))
        .withColumn("quota0", F.expr("__prod div t"))
        .withColumn("rem", F.expr("__prod % t"))
        .withColumn("leftover", F.lit(budget) - F.sum("quota0").over(wall))
        .withColumn("rk", F.row_number().over(rk))
        .withColumn(
            "quota",
            F.least(
                (
                    F.col("quota0")
                    + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
                ).cast("long"),
                F.col("n_rows"),
            ),
        )
        .select(group_col, "n_rows", "quota")
    )


def source_mixture_sample(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    group_col: str = "source",
    temperature: float = 0.5,
    seed: str = "mix",
) -> DataFrame:
    """Deterministic temperature-mixture sample: apportion ``budget``
    rows across sources with ``source_quotas`` and take each source's
    first ``quota`` rows in content-hash order (md5 of the id — same
    portability contract as ``hash_split``; re-runs, appends, and engine
    ports pick the same rows). Quotas are capped at each source's size,
    so the delivered row count falls short of ``budget`` when
    temperature upweights a source past what it holds — compare
    ``sum(quota)`` from ``source_quotas`` against ``budget`` to detect
    saturation and re-apportion the shortfall if needed.

    Scale shape: the quota table is #sources rows → broadcast joined;
    per-source selection is one window shuffle partitioned by
    ``group_col``. For corpora where a single source exceeds one
    executor's sort budget, swap the rank for a two-phase cutoff: take
    every row with hash key below quota/n_rows of the key space, then
    exact-rank only the marginal band (same trick as hash_split's range
    split; not needed at test scale).
    """
    quotas = source_quotas(df, budget, group_col, temperature)
    w = Window.partitionBy(group_col).orderBy(F.col("__hk").asc(), F.col(id_col).asc())
    return (
        df.withColumn("__hk", _hash_key(F.col(id_col), seed))
        .join(F.broadcast(quotas), group_col)
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= F.col("quota"))
        .select(id_col, group_col, "quota")
    )


def token_quotas(
    df: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    token_col: str = "n_tokens",
    temperature: float = 0.5,
) -> DataFrame:
    """``source_quotas`` in TOKEN units — the budget LLM pretraining
    mixes are actually specified in (a 1T-token recipe apportions
    tokens, not documents; doc length varies 100x across sources).
    Weights are ``T_g ** temperature`` over each group's token total;
    apportionment is the same exact-DECIMAL largest-remainder machinery
    (see ``source_quotas`` for the engine-portability contract — the
    same temperature caveats apply). Returns
    ``(group_col, n_tokens, quota)`` with the token quota capped at the
    group's total.

    Scale shape: one map-side-combined groupBy summing a per-row token
    count; everything after runs on #groups rows.
    """
    if temperature == 0.0:
        w = F.lit(int(1e9)).cast("decimal(38,0)")
    elif temperature == 1.0:
        w = (
            F.col("n_rows").cast("decimal(38,0)")
            * F.lit(int(1e9)).cast("decimal(38,0)")
        )
    elif temperature == 0.5:
        w = F.floor(F.sqrt(F.col("n_rows").cast("double")) * F.lit(1e9)).cast(
            "decimal(38,0)"
        )
    else:
        w = F.floor(
            F.pow(F.col("n_rows").cast("double"), F.lit(float(temperature))) * F.lit(1e9)
        ).cast("decimal(38,0)")
    counts = (
        df.groupBy(group_col)
        .agg(F.sum(token_col).cast("long").alias("n_rows"))
        .withColumn("w", w)
    )
    return _apportion(counts, budget_tokens, group_col).withColumnRenamed(
        "n_rows", "n_tokens"
    )


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    group_col: str = "source",
    token_col: str = "n_tokens",
    temperature: float = 0.5,
    seed: str = "tokmix",
) -> DataFrame:
    """Token-budget mixture sampling — the document-selection step of a
    pretraining data recipe: apportion ``budget_tokens`` across sources
    with temperature weights (``token_quotas``), then within each
    source take documents in content-hash order while the RUNNING token
    total stays within the source's quota (greedy prefix; the first
    document that would cross the boundary is excluded, so delivered
    tokens <= quota always). Content-hash order makes the selection
    deterministic under re-runs, appends, and engine ports — the same
    contract as ``source_mixture_sample``, which this generalizes from
    row budgets to the token budgets real recipes are written in.

    Returns kept docs as (id, group, doc tokens, running total, quota).

    Scale shape: one groupBy for token totals, broadcast quota join,
    one per-source window shuffle for the running sum. A single source
    bigger than one executor's sort budget swaps the window for the
    two-pass prefix operator (``operators/prefix.ranked_running``
    partitioned by source) — same results, no single-task sort.
    """
    quotas = token_quotas(df, budget_tokens, group_col, token_col, temperature)
    w = Window.partitionBy(group_col).orderBy(F.col("__hk").asc(), F.col(id_col).asc())
    return (
        df.withColumn("__hk", _hash_key(F.col(id_col), seed))
        # project the quota frame down to (group, quota): its n_tokens
        # total would otherwise collide with the per-doc token column
        .join(F.broadcast(quotas.select(group_col, "quota")), group_col)
        .withColumn(
            "cum_tokens",
            F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
        )
        .filter(F.col("cum_tokens") <= F.col("quota"))
        .select(
            id_col,
            group_col,
            F.col(token_col).cast("long").alias("doc_tokens"),
            "cum_tokens",
            "quota",
        )
    )


def weighted_sample(

    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement via the
    Efraimidis–Spirakis priority: each row gets u ~ Uniform(0,1) derived
    from md5 of its id (content-addressed, no RNG state) and priority
    ``u ** (1/w)``; the n largest priorities are the sample. Inclusion
    probability is proportional to weight, and — like every operator in
    this module — re-running on a different cluster layout or an
    incrementally-grown corpus gives every historical row the same
    priority, so the sample only changes where the data did.

    Returns (id, weight, log_priority) for the n selected rows, ranked
    by the monotone-equivalent ``ln(u)/w`` (better floating-point spread
    than ``u**(1/w)``, which crushes against 1.0 for large weights),
    rounded to 9 dp with the id as total-order tiebreak.

    Scale shape: the priority is a narrow projection inside the scan;
    selection is ``orderBy(...).limit(n)`` → TakeOrderedAndProject (a
    per-task n-row heap + driver merge of n x tasks rows) — no global
    sort, no shuffle of the corpus. Rows with weight <= 0 are excluded,
    matching the estimator's domain.
    """
    u = (
        F.conv(_hash_key(F.col(id_col), seed), 16, 10).cast("double") + 1.0
    ) / float(16**_HEX_WIDTH + 1)
    w = F.col(weight_col).cast("double")
    pri = F.round(F.log(u) / w, 9)
    return (
        df.filter(w > 0)
        .select(F.col(id_col), w.alias("weight"), pri.alias("log_priority"))
        .orderBy(F.col("log_priority").desc(), F.col(id_col).asc())
        .limit(n)
    )


def split_leakage(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "split42",
    key_words: int | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Split-contamination audit: after a ``hash_split`` assignment, find
    content fingerprints that land in MORE THAN ONE split — the
    train/eval leakage that id-keyed splitting cannot see when the corpus
    carries duplicate or near-identical documents. Run it before
    release; any returned row means eval numbers are compromised until
    the duplicates are collapsed or re-keyed by content.

    ``key_words=None`` keys on the full normalized-text md5 (exact-dup
    leakage); ``key_words=n`` keys on the first n normalized words — the
    cheap blocking fingerprint that also catches near-duplicates sharing
    a prefix (template/boilerplate families). For full near-dup-aware
    auditing, feed ``dedup_groups`` cluster ids through this groupBy
    instead of a fingerprint.

    Returns (content_key, n_docs, n_splits, splits) for leaking content,
    ``splits`` as the sorted comma-joined split names.

    Split source: when ``df`` already carries ``split_col`` the audit
    groups by THAT column — the split the corpus actually ships with —
    never a re-derived hypothetical. Only when the column is absent does
    it derive the assignment via ``hash_split(weights, seed)``; passing
    neither an existing column nor ``weights`` is an error.

    Scale shape: split assignment and the fingerprint are per-row
    expressions inside the scan; the audit is ONE groupBy shuffle on the
    16-byte fingerprint (map-side combined) with the >1-split filter on
    the fingerprint-sized aggregate. Same cost class as exact dedup — and
    it shares its content key, so a lake that stages fingerprints for
    dedup gets this audit as a column-pruned scan.
    """
    from etl_s3_to_redshift_spark.functions.text import md5_fingerprint, words

    if key_words is None:
        key = md5_fingerprint(F.col(text_col))
    else:
        key = F.md5(
            F.array_join(
                F.slice(words(F.lower(F.col(text_col))), 1, key_words), " "
            ).cast("binary")
        )
    if split_col in df.columns:
        assigned = df.withColumnRenamed(split_col, "split") if split_col != "split" else df
    else:
        if weights is None:
            raise ValueError(
                f"split_leakage: no '{split_col}' column and no weights to derive one"
            )
        assigned = hash_split(df, weights, id_col=id_col, seed=seed)
    return (
        assigned.select(key.alias("content_key"), F.col("split"))
        .groupBy("content_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("split").alias("n_splits"),
            F.array_join(F.array_sort(F.collect_set("split")), ",").alias("splits"),
        )
        .filter(F.col("n_splits") > 1)
    )


def group_aware_split(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str,
    seed: str = "split42",
    split_col: str = "split",
) -> DataFrame:
    """Leakage-PREVENTING train/val/test assignment: split by the hash
    of a GROUP key (dedup cluster id, exact-content fingerprint, source
    document id of derived chunks, ...) so every member of a group lands
    in the same split by construction.

    ``split_leakage`` audits contamination after the fact; this closes
    it at the source — id-keyed splitting scatters near-duplicates
    across splits, group-keyed splitting cannot. Same deterministic
    md5-range machinery as ``hash_split`` (stable under re-runs,
    appends, repartitioning, engine ports), just keyed on the group.

    Scale: a pure per-row expression over whatever column carries the
    group id — deriving THAT id is the dedup pipeline's job
    (operators/components.dedup_groups, exact fingerprints, minhash
    clusters), which a curated corpus has already run.
    """
    return hash_split(df, weights, id_col=group_col, seed=seed, split_col=split_col)
