"""Corpus RELEASE pipeline: the compliance + assembly stages that run
between curation (plans/curation.py) and shipping a training corpus.

    curated docs (deduped, quality-gated, split)
      → PII scrub            (emails/SSNs/phones/IPv4 redacted in-scan;
                              per-type counts kept for the audit trail)
      → split-leakage audit  (no content fingerprint may span splits —
                              provably empty for the exact key after
                              exact dedup; the blocking-key audit
                              surfaces template families that survive)
      → k-anonymity audit    (quasi-identifier combos of released
                              metadata below k)
      → mixture assembly     (temperature-weighted source quotas over
                              the train split)

Design rules, matching plans/curation.py:
- The scrub is a narrow in-scan projection (zero shuffles), so it rides
  the final write rather than adding a stage.
- Audits are REPORTS, not filters: the release gate decides; the plan
  returns the audit frames + scalar stats so the decision is recorded.
- Everything is content-addressed/deterministic — same corpus in, same
  release out, regardless of cluster layout (the property every audit
  above depends on).

Reference anchor: the reference ships data straight from staging to the
warehouse (/root/reference/etl.py:55-109) with no compliance pass; this
plan is the north-star extension of that load path for corpus releases.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators.privacy import k_anonymity_summary
from etl_s3_to_redshift_spark.operators.sampling import (
    source_mixture_sample,
    split_leakage,
)
from etl_s3_to_redshift_spark.operators.textops import PII_RULES, pii_scrub


@dataclass
class ReleaseResult:
    """Scrubbed corpus + audit frames + scalar accounting."""

    released: DataFrame
    leakage: DataFrame
    anonymity: DataFrame
    mixture: DataFrame | None
    stats: dict[str, int] = field(default_factory=dict)


def release_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    split_col: str = "split",
    split_weights: dict[str, float] | None = None,
    leakage_key_words: int | None = 5,
    quasi_cols: list[str] | None = None,
    anonymity_k: int = 5,
    mixture_budget: int | None = None,
    source_col: str = "source",
) -> ReleaseResult:
    """Run the release pipeline over a curated, already-split corpus.

    ``docs`` must carry ``split_col`` — the leakage audit groups by that
    column directly, so it audits the split the corpus actually ships
    with (never a re-derived hypothetical with its own seed/weights).
    ``split_weights`` is only a fallback for corpora missing the column.
    ``mixture_budget`` enables temperature-weighted assembly over the
    train split; ``None`` skips it.
    """
    if split_col not in docs.columns and split_weights is None:
        raise ValueError(
            f"release_corpus: input must carry '{split_col}' (the release "
            "contract) or provide split_weights to derive one"
        )

    # 1. PII scrub — replaces the text column; counts stay as audit trail
    scrubbed = pii_scrub(docs, text_col=text_col, out_col="__scrubbed")
    released = scrubbed.drop(text_col).withColumnRenamed("__scrubbed", text_col)

    # 2. split-leakage audit (on the SCRUBBED text: redaction must not
    # create new cross-split collisions unnoticed)
    leakage = split_leakage(
        released,
        split_weights,
        text_col=text_col,
        id_col=id_col,
        key_words=leakage_key_words,
        split_col=split_col,
    )

    # 3. k-anonymity over the released metadata columns
    qcols = quasi_cols or [c for c in (source_col, "lang") if c in released.columns]
    anonymity = k_anonymity_summary(released, qcols, k=anonymity_k)

    # 4. mixture assembly over the train split
    mixture = None
    if mixture_budget is not None:
        train = released.filter(F.col(split_col) == "train")
        mixture = source_mixture_sample(
            train, budget=mixture_budget, group_col=source_col, id_col=id_col
        )

    pii_cols = [f"n_{name}" for name, _p, _t in PII_RULES]
    stats_row = released.agg(
        F.count(F.lit(1)).alias("released"),
        *[F.sum(c).alias(c) for c in pii_cols],
    ).collect()[0]
    stats = {"released": stats_row["released"]}
    # F.sum over an empty corpus is NULL — report zeros, don't crash
    stats.update({c: int(stats_row[c] or 0) for c in pii_cols})
    return ReleaseResult(
        released=released,
        leakage=leakage,
        anonymity=anonymity,
        mixture=mixture,
        stats=stats,
    )
