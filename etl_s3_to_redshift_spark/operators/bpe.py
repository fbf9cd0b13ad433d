"""Distributed BPE tokenizer training (byte-pair-encoding merges).

The shape that scales: the corpus is scanned ONCE into a word-frequency
table (groupBy word — vocabulary-sized, map-side combined), and every
merge iteration runs over THAT table, never the corpus. Pair counting,
argmax selection, and merge application are all built-in column
expressions — the merge rewrite is an ``F.aggregate`` fold that scans
each word's symbol array left-to-right and fuses adjacent (left, right)
occurrences non-overlapping, exactly the classic BPE apply rule — so no
Python ever touches row data; the only driver round-trip per iteration
is the 1-row argmax (a scalar collect, same class as Q11's threshold).

Determinism: integer pair counts are exact; the winning pair breaks
ties by (count desc, left asc, right asc); the fold is index-order. The
whole merge table is therefore reproducible bit-for-bit, pinned in
tests against a pure-Python reference BPE on the same word counts.

Lineage: each iteration's word table derives from the previous one;
after ``checkpoint_every`` merges the table is localCheckpoint-ed to
truncate the plan (same pattern as dedup_groups_incremental), keeping
iteration N's analysis cost flat instead of linear in N.

Reference anchor: none — the reference ships load SQL only
(/root/reference/sql_queries.py); this is north-star LLM-pipeline
surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.functions.text import words

_EOW = "</w>"


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the corpus — lowercased whitespace tokens. The one
    corpus-sized pass; everything after runs on this table."""
    return (
        docs.select(F.explode(words(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _init_symbols(word: Column) -> Column:
    """Split a word into characters + the end-of-word marker."""
    # split at every inter-character boundary; Spark's split(limit=-1)
    # keeps the trailing empty element the end-of-string boundary makes,
    # so drop empties before appending the marker
    return F.concat(
        F.filter(F.split(word, "(?!^)"), lambda x: x != ""),
        F.array(F.lit(_EOW)),
    )


def _merge_fold(symbols: Column, left: str, right: str) -> Column:
    """Fuse adjacent (left, right) symbol pairs, left-to-right,
    non-overlapping — as one JVM-side aggregate fold."""
    merged = left + right

    def step(acc: Column, x: Column) -> Column:
        can = (F.size(acc) > 0) & (F.element_at(acc, -1) == F.lit(left)) & (
            x == F.lit(right)
        )
        return F.when(
            can,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        symbols, F.array().cast("array<string>"), step
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbolized vocab: explode
    positions 1..len-1, pair (sym[i], sym[i+1]), weight by word count."""
    pairs = vocab.select(
        "n",
        F.explode(
            F.zip_with(
                F.slice(F.col("syms"), 1, F.size("syms") - 1),
                F.slice(F.col("syms"), 2, F.size("syms") - 1),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right")).agg(
        F.sum("n").alias("pair_n")
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    checkpoint_every: int = 5,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (merge_rank, left, right, merged, pair_n) in learned order.

    Driver loop of ``n_merges`` vocabulary-sized jobs; the corpus is
    read exactly once (word_freq_table)."""
    spark = docs.sparkSession
    vocab = word_freq_table(docs, text_col).select(
        _init_symbols(F.col("word")).alias("syms"), "n"
    )
    # the word table is reused every iteration — checkpoint the base once
    vocab = vocab.localCheckpoint(eager=True)

    merges = []
    for rank in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("pair_n").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_n"] <= 0:
            break
        left, right, pair_n = top[0]["left"], top[0]["right"], int(top[0]["pair_n"])
        merges.append((rank, left, right, left + right, pair_n))
        vocab = vocab.select(_merge_fold(F.col("syms"), left, right).alias("syms"), "n")
        if (rank + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, merged string, pair_n long"
    )


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize with a learned merge list: per word, start from
    characters+EOW and apply every merge in learned order — the fold
    expression chained ``len(merges)`` deep INSIDE a transform over the
    word array, so token order is preserved and nothing ever leaves the
    row (zero shuffles, all JVM-side)."""

    def tokenize_word(w: Column) -> Column:
        sym = _init_symbols(w)
        for left, right in merges:
            sym = _merge_fold(sym, left, right)
        return sym

    return docs.withColumn(
        out_col,
        F.flatten(F.transform(words(F.lower(F.col(text_col))), tokenize_word)),
    )
