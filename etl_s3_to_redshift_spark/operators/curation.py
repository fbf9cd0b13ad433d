"""End-to-end corpus-curation pipeline composition — the staged
keep/drop funnel a web-scale pretraining pipeline actually runs
(FineWeb / RefinedWeb / CCNet shape): language ID → heuristic quality
gate → exact dedup → near-duplicate drop, with per-stage survivor
accounting.

The individual gates live in ``operators/textops`` (lang_id,
gopher_quality_rules) and ``operators/dedup``
(duplicated_window_coverage); this module wires them into one pipeline
and reports the funnel — stage-by-stage document counts, removals, and
cumulative keep rate — the first artifact anyone asks of a curation
run ("where did my corpus go?").

Sibling: ``plans/curation.curate_corpus`` is the MATERIALIZING
production plan (quality → exact dedup → MinHash near-dup →
decontamination → split, with optional parquet staging between
super-stages); this module is the driver-checkable published-gate
composition — every stage here has an exact cross-engine SQL
restatement, which is what lets the whole funnel ride the DuckDB
oracle gate as one query (``data_curation_funnel``).

North-star extension (no reference counterpart —
/root/reference/sql_queries.py has no text surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from etl_s3_to_redshift_spark.operators.dedup import (
    _spread,
    duplicated_window_coverage,
)
from etl_s3_to_redshift_spark.operators.textops import (
    gopher_quality_rules,
    lang_id,
)

STAGES = ("raw", "lang_id", "quality_rules", "exact_dedup", "near_dedup")


def curation_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 10,
    max_coverage: float = 0.5,
    **quality_kwargs,
) -> DataFrame:
    """Per-document cumulative survival flags for the four curation
    stages — the keep-list a pipeline materializes before writing the
    cleaned corpus. Stage semantics (each runs on the PREVIOUS stage's
    survivors, as the real pipeline would):

    1. ``s_lang`` — the marker-stopword language ID is confident
       (``pred_lang != 'und'``): documents whose language can't even be
       guessed are noise (CCNet's fastText-gate analogue).
    2. ``s_quality`` — the Gopher rule conjunction
       (``textops.gopher_quality_rules``; thresholds forwarded via
       ``quality_kwargs``) holds.
    3. ``s_exact`` — first occurrence (lowest id) per exact text
       (md5 fingerprint) among quality survivors: exact copies
       collapse to one keeper BEFORE span analysis (CCNet's
       paragraph-hash order — running it after would be dead code,
       since a fully-duplicated copy always fails the coverage gate).
    4. ``s_neardup`` — the document's exact-substring duplication
       coverage (Lee et al. 2021 window form,
       ``dedup.duplicated_window_coverage`` with ``window_tokens``,
       frequencies counted WITHIN the exact-dedup survivors) stays
       below ``max_coverage``: boilerplate pages whose spans recur
       across OTHER retained documents drop (doc-level EXACTSUBSTR —
       both members of a heavily-overlapping pair fail, by design;
       keep-one-of-cluster near-dedup is ``dedup.minhash groups``).

    Plan shape at corpus scale: stages 1–2 are pure narrow expressions
    fused into ONE scan (the language flag rides through the Gopher
    gate via its ``passthrough`` — no self-join of the corpus against
    its own flags). Stage 3 is ONE window partitioned by content hash
    over ALL rows, no keepers self-join: both gate verdicts are pure
    functions of the text, so every row of a content-hash partition
    carries the same ``s_quality`` and ``rank==1 ∧ s_quality`` IS
    first-surviving-occurrence. The gated frame is then materialized
    once (eager DISK_ONLY localCheckpoint, the coverage-operator
    precedent) so stage 4's coverage pass and the caller's aggregate
    both read one computed artifact instead of re-deriving the
    tokenize+gate scan per branch; stage 4 is the coverage operator's
    two linear shuffles over exact survivors only, joined back by id.

    Returns ``(id, s_lang, s_quality, s_exact, s_neardup)`` — one row
    per input document, booleans cumulative (``s_neardup`` ⇒ every
    earlier flag).
    """
    staged = gopher_quality_rules(
        _spread(docs, id_col).select(
            F.col(id_col),
            F.col(text_col),
            (lang_id(F.col(text_col)) != F.lit("und")).alias("__s_lang"),
        ),
        text_col=text_col,
        id_col=id_col,
        passthrough=(text_col, "__s_lang"),
        **quality_kwargs,
    ).select(
        F.col(id_col),
        F.col(text_col),
        F.col("__s_lang").alias("s_lang"),
        (F.col("__s_lang") & F.col("keep")).alias("s_quality"),
    )

    # quality is a pure function of the text, so within a content-hash
    # partition every row agrees on s_quality — rank 1 among ALL copies
    # is the first surviving occurrence, no survivors-only self-join
    w_first = Window.partitionBy(F.md5(F.col(text_col))).orderBy(
        F.col(id_col).asc()
    )
    flagged = staged.withColumn(
        "s_exact", F.col("s_quality") & (F.row_number().over(w_first) == 1)
    )
    # one computed artifact for both consumers (coverage + the caller's
    # aggregate); without it each branch re-runs the tokenize+gate scan
    flagged = flagged.localCheckpoint(
        eager=True, storageLevel=StorageLevel.DISK_ONLY
    )

    cov = duplicated_window_coverage(
        flagged.filter(F.col("s_exact")).select(id_col, text_col),
        window_tokens=window_tokens,
        text_col=text_col,
        id_col=id_col,
    ).select(
        F.col(id_col),
        (F.col("dup_coverage") < F.lit(max_coverage)).alias("__cov_ok"),
    )
    # NULL text propagates NULL through the gate booleans (size(NULL)
    # comparisons); pin flags three-valued-logic-free — a NULL-text row
    # is dropped at the stage that first inspects it, visibly false
    f = lambda c: F.coalesce(F.col(c), F.lit(False)).alias(c)  # noqa: E731
    return (
        flagged.join(cov, id_col, "left")
        .withColumn(
            "s_neardup",
            F.col("s_exact") & F.coalesce(F.col("__cov_ok"), F.lit(False)),
        )
        .select(
            F.col(id_col), f("s_lang"), f("s_quality"), f("s_exact"), f("s_neardup")
        )
    )


def curation_funnel(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 10,
    max_coverage: float = 0.5,
    **quality_kwargs,
) -> DataFrame:
    """The stage-by-stage curation funnel report over
    ``curation_flags``: one row per stage —
    ``(stage_idx, stage, n_docs, n_removed, pct_kept)`` where
    ``n_docs`` counts that stage's survivors, ``n_removed`` the drop
    versus the previous stage, and ``pct_kept`` the cumulative keep
    rate against the raw corpus (6 dp).

    The whole report is ONE aggregate over the flags frame (five
    conditional counts collapse map-side to a single row) followed by a
    literal 5-struct inline explode — no window over the aggregate, no
    second corpus pass. At 100 TB this is the cheap side of the
    pipeline: the flags frame itself is the expensive artifact, and the
    funnel rides on it.
    """
    flags = curation_flags(
        docs,
        text_col=text_col,
        id_col=id_col,
        window_tokens=window_tokens,
        max_coverage=max_coverage,
        **quality_kwargs,
    )
    # coalesce: sum() over an empty corpus is NULL in Spark and DuckDB
    # alike — the report's contract is 0 docs, not NULL docs
    one = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        F.coalesce(F.sum(F.col("s_lang").cast("long")), F.lit(0)).alias("n1"),
        F.coalesce(F.sum(F.col("s_quality").cast("long")), F.lit(0)).alias("n2"),
        F.coalesce(F.sum(F.col("s_exact").cast("long")), F.lit(0)).alias("n3"),
        F.coalesce(F.sum(F.col("s_neardup").cast("long")), F.lit(0)).alias("n4"),
    )
    cnt = [F.col(f"n{i}") for i in range(5)]
    stage_structs = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("stage_idx"),
                F.lit(STAGES[i]).alias("stage"),
                cnt[i].alias("n_docs"),
                (cnt[i - 1] - cnt[i] if i else F.lit(0)).cast("long").alias(
                    "n_removed"
                ),
                # n0>0 guard: on an empty corpus Spark's 0.0/0.0 is NULL
                # while DuckDB's IEEE round(0/0) is NaN — both engines
                # now emit NULL for the degenerate input (ADVICE r6)
                F.when(
                    cnt[0] > 0,
                    F.round(
                        cnt[i].cast("double") / cnt[0].cast("double"), 6
                    )
                    + F.lit(0.0),
                ).alias("pct_kept"),
            )
            for i in range(5)
        ]
    )
    return one.select(F.explode(stage_structs).alias("st")).select("st.*")
