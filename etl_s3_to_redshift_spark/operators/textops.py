"""Text-analysis operators over a documents table — language ID, quality
scoring, token statistics, fingerprinting. Pure built-in expressions: these
run inside the scan stage, shuffle-free, at any scale.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from etl_s3_to_redshift_spark.functions.text import (
    md5_fingerprint,
    shingles,
    shingles_all,
    token_count_bpe,
    token_count_ws,
    words,
)

# Marker stopwords per language for the n-gram/stopword-count heuristic.
# Ordered dict: ties broken by this order (deterministic argmax).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "es": ("el", "la", "los", "y", "que", "es"),
    "fr": ("le", "la", "les", "et", "est", "une"),
}

STOPWORDS_EN = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

PUNCT_CHARS = ".,!?;:"


def _count_in(tokens: Column, vocab: tuple[str, ...]) -> Column:
    vocab_arr = F.array(*[F.lit(v) for v in vocab])
    return F.size(F.filter(tokens, lambda t: F.array_contains(vocab_arr, t)))


def lang_id(text: Column, toks: Column | None = None) -> Column:
    """Heuristic language ID: count per-language marker stopwords among the
    lowercased tokens; argmax with deterministic tie-break (marker-table
    order); 'und' (undetermined) when no marker hits at all.

    Pass a pre-materialized ``toks`` column when scoring many languages —
    the per-language filters are higher-order functions that would
    otherwise re-run the split per language."""
    if toks is None:
        toks = words(F.lower(text))
    scores = {lang: _count_in(toks, markers) for lang, markers in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    result = F.lit("und")
    # reversed so earlier languages win ties (last when() wins in a chain
    # built by wrapping: build from lowest priority outward)
    for lang in reversed(list(LANG_MARKERS)):
        result = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(result)
    return result


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features: char/token counts, mean token length,
    punctuation density, English stopword ratio, alpha ratio — the standard
    pre-filter features of web-scale corpus cleaning.

    The token array is materialized in its own projection first: the four
    token-consuming expressions are higher-order functions, which skip
    whole-stage subexpression elimination — inline, the split would run
    4× per row."""
    df = df.select(F.col(id_col), F.col(text_col), words(F.col(text_col)).alias("__toks"))
    text = F.col(text_col)
    toks = F.col("__toks")
    n_tok = F.size(toks)
    n_chars = F.length(text)
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    n_punct = n_chars - F.length(F.translate(text, PUNCT_CHARS, ""))
    n_alpha = n_chars - F.length(F.regexp_replace(text, "[A-Za-z]", ""))
    n_stop = _count_in(toks, STOPWORDS_EN)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.when(n_tok > 0, tok_chars.cast("double") / n_tok.cast("double")).alias("mean_token_len"),
        (n_punct.cast("double") / n_chars.cast("double")).alias("punct_ratio"),
        (n_alpha.cast("double") / n_chars.cast("double")).alias("alpha_ratio"),
        F.when(n_tok > 0, n_stop.cast("double") / n_tok.cast("double")).alias("stopword_ratio"),
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace + BPE-ish token counts per document."""
    return df.select(
        F.col(id_col),
        token_count_ws(F.col(text_col)).alias("n_tokens_ws"),
        token_count_bpe(F.col(text_col)).alias("n_tokens_bpe"),
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Engine-portable md5 content fingerprint of normalized text."""
    return df.select(F.col(id_col), md5_fingerprint(F.col(text_col)).alias("fingerprint"))


def repetition_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Intra-document repetition: fraction of duplicated k-gram slots
    (1 − distinct/total over the position-ordered shingle multiset) plus
    the duplicated-token fraction — the standard boilerplate/spam signals
    for corpus filtering (high ratio ⇒ templated or looping text).

    Pure per-row array expressions inside the scan stage — zero shuffles
    at any corpus size. The token and shingle arrays are materialized in
    their own projection first — each is consumed 3× below, and inline
    expression references re-run the tokenize/shingle per use (same
    inlining trap measured in ``ngram_top_terms``/``quality_features``)."""
    staged = df.select(
        F.col(id_col),
        words(F.col(text_col)).alias("__toks"),
    ).select(
        F.col(id_col),
        F.col("__toks"),
        shingles_all(F.col("__toks"), k).alias("__sh"),
    )
    dup_frac = lambda arr: F.when(  # noqa: E731
        F.size(arr) > 0,
        F.round(1.0 - F.size(F.array_distinct(arr)) / F.size(arr).cast("double"), 6),
    ).otherwise(F.lit(0.0))
    return staged.select(
        F.col(id_col),
        dup_frac(F.col("__sh")).alias(f"dup_{k}gram_frac"),
        dup_frac(F.col("__toks")).alias("dup_token_frac"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: count, per corpus document, the distinct
    k-gram shingles it shares with ANY benchmark document — the standard
    guard against eval-set leakage into training data (docs with
    n_shared > 0 are dropped or audited upstream).

    Scale shape: benchmark n-gram sets are tiny relative to the corpus
    (eval suites, not datasets) → distinct benchmark shingles BROADCAST;
    the corpus side explodes shingles inside its scan stage and the only
    exchange is the per-doc count aggregation. The corpus is never
    self-joined and never shuffled by shingle."""
    # materialize the token arrays before shingling: shingles() references
    # its input inside a per-shingle lambda, and a bare words(...) argument
    # is re-inlined (re-split) once per shingle position — the O(tokens^2)
    # inlining trap measured in ngram_top_terms
    bench_sh = (
        benchmark.select(words(F.col(text_col)).alias("__w"))
        .select(F.explode(shingles(F.col("__w"), k)).alias("shingle"))
        .distinct()
    )
    corp_sh = corpus.select(
        F.col(id_col), words(F.col(text_col)).alias("__w")
    ).select(F.col(id_col), F.explode(shingles(F.col("__w"), k)).alias("shingle"))
    return (
        corp_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


def tfidf_top_terms(
    df: DataFrame,
    top_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k terms by TF-IDF, pure DataFrame ops (no
    pyspark.ml pipeline): explode tokens → term frequencies → document
    frequencies → idf = ln((N+1)/(df+1)) + 1 (smoothed) → window top-k.

    Two shuffles (doc-term agg, term df agg joined back broadcast) + one
    window — each linear in the token count. Deterministic tiebreak: term
    asc at equal score."""
    n_docs = df.count()  # scalar action on metadata scale; cheap vs the scan
    toks = df.select(
        F.col(id_col), F.explode(words(F.lower(F.col(text_col)))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # Document frequency comes from a WINDOW over the tf frame, not a
    # second aggregate + join: a separate dfreq branch re-derives the
    # whole tokenize+aggregate subtree (column pruning gives the two
    # branches different canonical scans, so ReuseExchange never fires —
    # verified: the join form plans 2 corpus scans). The window shuffles
    # only (doc, term, tf) rows on the term key — tf-frame-sized, one
    # corpus pass total.
    wterm = Window.partitionBy("term")
    scored = tf.withColumn("df", F.count(F.lit(1)).over(wterm)).select(
        id_col,
        "term",
        F.round(
            F.col("tf")
            * (F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1)) + 1.0),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "term", "tfidf", "rank")
    )


def vocab_top_terms(
    df: DataFrame,
    k: int = 100,
    text_col: str = "text",
    min_len: int = 1,
) -> DataFrame:
    """Corpus-level vocabulary: the ``k`` most frequent lowercase-alpha
    tokens with their counts (BPE-vocab seeding / wordcount). Tokens are
    ``lower(text)`` split on runs of non-[a-z] — a character-class split
    every regex engine executes identically.

    Scale shape: explode + groupBy(token) with map-side combine — the
    shuffle carries (token, partial_count) pairs, i.e. vocabulary-sized
    data, not corpus-sized. The final top-k is ``orderBy(...).limit(k)``
    → TakeOrderedAndProject: each task keeps a k-row heap and the driver
    merges k·tasks rows; no single-partition global sort ever
    materializes the full vocabulary. Tie order (n desc, token asc) is a
    total order, so the k-boundary is deterministic cross-engine.
    """
    toks = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("token")
    ).filter(F.length("token") >= min_len)
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )


def unigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document average unigram negative log-probability under the
    corpus's own maximum-likelihood unigram model — the cheap
    perplexity-style quality signal (boilerplate and template text score
    low surprisal; gibberish and OOV-heavy text score high). Tokens are
    the same lowercase-alpha split as ``vocab_top_terms``.

    Scale shape: ONE corpus tokenization into the per-(doc, token) tf
    aggregate, consumed by a single linear chain — tf → token-key window
    (n_w) → per-doc regroup — with NO corpus-sized materialization. The
    model's only out-of-band input, the scalar n_total, comes from a
    separate map-side-combined aggregate over the RAW text (sum of
    per-row token counts: same split, same length filter — exact integer
    equality with sum(tf) by construction), a pure scan that is free
    next to the tf shuffle. The previous form localCheckpointed the
    CORPUS-sized tf frame just to serve that one scalar; at the sf100
    spill decade the checkpoint write+re-read was the dominant cost
    (the dedup_exact_substrings lesson — don't materialize a corpus-
    sized frame to answer a 1-row question). A pinned broadcast of the
    model would OOM on web-scale vocabularies (typos/urls grow without
    bound) — the window form keeps the model implicit. No UDFs. The
    per-doc mean is sum(tf * neglogp) / sum(tf), rounded 6 dp: ``ln``
    differs across libms at ~1e-16/token, 10 orders below the rounding
    grain.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("token"),
    ).filter(F.length("token") >= 1)
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    # NULL texts must contribute 0 (they contribute no tf rows): coalesce
    # the TEXT, not the size — with spark.sql.ansi.enabled=false, legacy
    # size(NULL) returns -1 (not NULL), which a size-side coalesce would
    # pass through, silently skewing n_total by -1 per null row. split('')
    # → [''] → length filter → [] → size 0 under BOTH ANSI settings
    # (pinned by the ansi_off row of tests/test_config_matrix.py).
    n_total_row = df.select(
        F.sum(
            F.size(
                F.filter(
                    F.split(
                        F.lower(F.coalesce(F.col(text_col), F.lit(""))), "[^a-z]+"
                    ),
                    lambda t: F.length(t) >= 1,
                )
            )
        ).alias("s")
    ).collect()[0]["s"]
    # empty/tokenless corpus: the scored frame below is empty whatever
    # literal we use — 1 keeps log's argument finite so the plan compiles
    n_total = int(n_total_row) if n_total_row else 1
    # The token-key WINDOW is deliberate here — the bigram scorer's
    # aggregate+join rewrite was A/B'd on this operator and measured
    # SLOWER (sf100 45.0 → 83.1 s): a token partition is bounded by the
    # DOC count (a word counts once per doc in tf), so the hot-stopword
    # sort the bigram contexts suffered is mild here, while the join
    # form re-evaluates the unmaterialized tf chain (a second full
    # tokenization) on its second consumer. One window = one tf
    # shuffle, one tokenization.
    wtok = Window.partitionBy("token")
    scored = (
        tf.withColumn("n_w", F.sum("tf").over(wtok))
        .withColumn(
            "neglogp",
            -F.log(F.col("n_w").cast("double") / F.lit(float(n_total))),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        F.round(F.sum(F.col("tf") * F.col("neglogp")) / F.sum("tf"), 6).alias(
            "avg_neglogp"
        ),
    )


# ---------------------------------------------------------------------------
# PII scrubbing (round 3c)
# ---------------------------------------------------------------------------

# (name, pattern, replacement). Patterns use only constructs that Java
# regex (Spark) and RE2 (DuckDB/Go) execute identically: character
# classes, bounded repetition, \b word boundaries, one optional group —
# no lookaround, no backreferences. Order matters: emails first (their
# domain part could otherwise be half-eaten by the IPv4 rule), SSN
# before the generic phone shape.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}(-[0-9]{4})?", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IPV4>"),
)


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "scrubbed",
    rules: tuple[tuple[str, str, str], ...] = PII_RULES,
) -> DataFrame:
    """Redact PII-shaped spans (emails, SSNs, phone numbers, IPv4
    addresses) from ``text_col``, appending one ``n_<rule>`` match-count
    column per rule and the fully-scrubbed text as ``out_col``.

    Counts are taken on the text as it stood BEFORE that rule's own
    replacement but AFTER all earlier rules ran, so overlapping shapes
    (an IPv4 inside an already-redacted email domain) are never
    double-counted and the counts always sum to the number of
    replacements performed.

    Scale shape: the whole operator is a single narrow projection — a
    chain of ``regexp_extract_all``/``regexp_replace`` expressions that
    Catalyst collapses into one codegen stage inside the scan. Zero
    shuffles, zero UDFs; it composes with any downstream filter (e.g.
    drop documents with n_email > 0) while keeping pushdown intact.
    """
    res = df.withColumn("__pii_s", F.col(text_col))
    for name, pat, token in rules:
        res = res.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col("__pii_s"), F.lit(pat), F.lit(0))),
        ).withColumn("__pii_s", F.regexp_replace(F.col("__pii_s"), pat, token))
    return res.withColumnRenamed("__pii_s", out_col)


def dsir_logratio_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by the average per-token log-ratio between a TARGET
    unigram model (documents where ``target`` is true — the
    high-quality / in-domain exemplar set) and the model of the whole
    raw pool. Documents whose token mix resembles the target score
    high; importance-resampling by this weight tilts a raw crawl
    toward the target domain without a trained classifier.

    Both models are add-1 smoothed over the SHARED corpus vocabulary V:
    p_t(w) = (c_t(w)+1)/(N_t+V), q(w) = (c(w)+1)/(N+V); the per-doc
    score is Σ_w tf_wd · ln(p_t(w)/q(w)) / Σ_w tf_wd, rounded 6 dp
    (log args are exact integer ratios on both engines; libm drift is
    ~1e-16/token, 10 orders below the grain). Tokens are the
    lowercase-alpha split shared with ``vocab_top_terms``.

    Scale shape: the plan is the unigram-surprisal scorer's with one
    extra model sum — ONE corpus tokenization into the per-(doc,
    token) tf aggregate (localCheckpointed DISK_ONLY: it is re-read by
    the scalar aggregate and the scoring pass), target/raw model
    counts as two sums over the token-key window (vocabulary-sized
    shuffle, model never broadcast — web-scale vocabularies grow
    without bound), and the three scalars (N_t, N, V) as one bounded
    1-row driver read. No UDFs, no corpus rescan. (A checkpoint-free
    variant that sourced N_t/N from a raw-text scan and V from a
    distinct-count — the unigram_logprob_scores restructure — was
    MEASURED SLOWER here at the sf100 decade, 111.8 -> 185.2 s: this
    operator consumes the chain once, so dropping the materialization
    just re-tokenizes the corpus twice more; V has no raw-scan form.)
    """
    toks = df.select(
        F.col(id_col),
        target.cast("long").alias("__tgt"),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("token"),
    ).filter(F.length("token") >= 1)
    # __tgt is functionally dependent on the doc id — keying on it adds
    # no groups, it just rides the aggregate so the scoring pass needs
    # no join back to the document table.
    tf = toks.groupBy(id_col, "__tgt", "token").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    s = tf.agg(
        F.sum(F.col("tf") * F.col("__tgt")).alias("nt"),
        F.sum("tf").alias("na"),
        F.count_distinct(F.col("token")).alias("v"),
    ).collect()[0]
    n_t, n_all, vocab = int(s["nt"] or 0), int(s["na"] or 0), int(s["v"])
    # The token-key WINDOW is deliberate — the bigram scorer's
    # aggregate+join rewrite was A/B'd here too and measured SLOWER
    # (sf100 83.6 → 94.0 s): token partitions are doc-count-bounded
    # (mild skew, unlike bigram contexts), and the window computes both
    # model sums in the single token shuffle of the already-
    # checkpointed tf.
    wtok = Window.partitionBy("token")
    logratio = F.log(
        (F.sum(F.col("tf") * F.col("__tgt")).over(wtok) + 1).cast("double")
        / F.lit(float(n_t + vocab))
    ) - F.log(
        (F.sum("tf").over(wtok) + 1).cast("double") / F.lit(float(n_all + vocab))
    )
    scored = tf.withColumn("__lr", logratio)
    # + 0.0 normalizes IEEE negative zero: a doc whose average rounds to
    # zero from below yields -0.0, and engines disagree on the sign bit
    return scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        (F.round(F.sum(F.col("tf") * F.col("__lr")) / F.sum("tf"), 6) + 0.0).alias(
            "avg_logratio"
        ),
    )


def ngram_novelty_scores(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document novelty under first-occurrence attribution: the
    fraction of a document's DISTINCT word n-grams (default trigrams)
    whose corpus-wide first occurrence (minimum doc id) is this
    document. Freshly-crawled boilerplate and quoted/copied spans score
    near 0, genuinely new text near 1 — the incremental-crawl signal
    for "does this batch add anything", complementing exact/fuzzy dedup
    (which answer "is this WHOLE document a copy").

    Documents with fewer than ``n`` tokens contribute no n-grams and do
    not appear in the output. Rate is an exact small-integer ratio
    rounded 6 dp; min-id attribution is deterministic cross-engine.

    Scale shape: n-grams are built inside the token array (the chained
    zip of shifted slices shared with ``ngram_top_terms`` — no
    posexplode self-join); the wide ops are the (doc, gram) distinct
    (corpus-sized, hash-partitioned) and the min-over-gram window
    (gram-key partitions, no global window). At lake scale the gram key
    is where skew lives — hot boilerplate grams concentrate — but the
    window carries only (doc, gram, min) triples, not text.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda t: F.length(t) >= 1
    )
    toks_df = df.select(F.col(id_col), toks.alias("__toks"))
    t = F.col("__toks")
    m = F.greatest(F.size(t) - (n - 1), F.lit(0))
    grams = F.slice(t, 1, m)
    for i in range(1, n):
        grams = F.zip_with(
            grams, F.slice(t, i + 1, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    g = (
        toks_df.select(F.col(id_col), F.explode(grams).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.lit(1).alias("__one"))
    )
    wg = Window.partitionBy("gram")
    scored = g.withColumn("__first", F.min(id_col).over(wg))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.round(
            F.sum((F.col("__first") == F.col(id_col)).cast("int"))
            / F.count(F.lit(1)),
            6,
        ).alias("novelty_rate"),
    )


def ngram_top_terms(
    df: DataFrame,
    k: int = 50,
    n: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level top-k word n-grams (default bigrams) with counts —
    the n-gram companion to ``vocab_top_terms`` (collocation mining /
    boilerplate phrase detection). Tokens are the same lowercase-alpha
    split; an n-gram is n consecutive tokens joined by single spaces.

    Scale shape: n-grams are built INSIDE the token array as a chained
    zip of n shifted slices — no posexplode + self-join, no per-doc
    window sort; the only wide operations are the vocabulary-sized
    groupBy (map-side combined) and the final TakeOrderedAndProject
    top-k heap. Tie order (count desc, ngram asc) is total, so the
    k-boundary is deterministic cross-engine.

    The token array is materialized as its own projection before the
    gram builder references it: a single ``toks`` expression referenced
    from inside a higher-order-function lambda is INLINED at each use by
    the analyzer, so the bare-expression form re-ran split+filter per
    sequence element — O(tokens^2) re-tokenization per document
    (measured 2.4x wall on the bigram query at sf0.1).
    """
    toks_df = df.select(
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z]+"),
            lambda t: F.length(t) >= 1,
        ).alias("__toks")
    )
    toks = F.col("__toks")
    # n-grams as a chained zip of n shifted slices — 2.5x faster than the
    # transform(sequence)+slice form at sf1 (0.90s vs 2.29s measured: the
    # per-index slice re-walks the array, the zip is one linear pass).
    # Short docs need no guard: size-(n-1) <= 0 clamps to empty slices,
    # and zipping empties yields the empty gram array.
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, m)
    for i in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, i + 1, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return (
        toks_df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("ngram").asc())
        .limit(k)
    )


def _session_spill_regime(spark, threshold: int = 96) -> bool:
    """True when the session is configured for the data-bound/spill
    regime: ``spark.sql.shuffle.partitions`` at or above ``threshold``.
    This is the knob every deployment of this engine already turns with
    data volume (the sf100 protocol sets 128; local correctness runs sit
    at core count, ≤32) — the honest session-level signal for "is a
    scale-only mitigation worth its overhead here" (r9–r10 it gated the
    bigram tf materialization, gone in r11; now it gates the ER star
    exchange sizing in operators/fuzzy). Deliberately NOT a data-size
    sample: sampling would make the physical plan depend on the data
    and cost a scan of its own."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions")) >= threshold
    except (TypeError, ValueError):  # e.g. "auto" on some deployments
        return False


def bigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = None,
) -> DataFrame:
    """Per-document average bigram negative log-probability under the
    corpus's own add-1/2-smoothed bigram model — the next step up from
    ``unigram_logprob_scores``: word-order-aware surprisal, the quality
    signal that separates shuffled-word salad (high bigram surprisal,
    normal unigram) from natural text.

    P(w2|w1) = (c(w1,w2) + 1/2) / (c(w1,·) + V/2) computed as the exact
    integer ratio (2·c12 + 1) / (2·c1 + V) — one double division per
    bigram key, so both engines iterate identical values; the per-doc
    mean rounds 6 dp (libm ``ln`` drift sits ~10 orders below).

    Scale shape (r11, guide §2.3/§2.4 — aggregate before you shuffle,
    and shuffle key-sized rows, not the corpus): a document's bigrams
    all live in its OWN row, so the per-(doc, w1, w2) tf is computed
    IN-SCAN as a run-length pass over the sorted per-doc gram array —
    the corpus-sized ``groupBy(doc, w1, w2)`` exchange of the r8–r10
    shape (536M exploded rows at sf100) disappears outright. Every
    exchange left is bounded by the data's bigram-TYPE cardinality or
    the doc count: the model aggregates map-side-combine per-doc tf
    rows down to the bigram vocabulary, V (distinct second words) rides
    the same model exchange as a 1-row ``count_distinct`` crossJoin
    (no driver round-trip; AQE reuses the model12 exchange across its
    three consumers — pinned in tests), the vocab-sized scores frame
    joins back under the auto-broadcast threshold, and the final
    per-doc mean's partial aggregation collapses each doc's rows in
    its scan partition before the docs-sized exchange. The r9
    spill-regime-gated DISK_ONLY checkpoint of tf existed to avoid
    re-tokenizing the corpus for the second consumer; with no
    corpus-sized shuffle left, two in-scan tokenize passes are cheaper
    than materializing a near-corpus-sized frame to disk at every SF
    measured (sf1/sf10/sf100 A/B in OPTIMIZATION_r11.md), so the gate
    is gone. ``vocab_size``: passing it pins V as a literal; None
    derives it in-plan (same exact integer).
    """
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda x: x != ""
    )
    m = F.greatest(F.size(arr) - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(arr, 1, m),
        F.slice(arr, 2, m),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    # STAGE each array as a real projected column before anything
    # references it from inside a higher-order-function lambda: a bare
    # expression is INLINED at every use by the analyzer, and a use
    # inside a lambda re-evaluates it PER ELEMENT — element_at(<sort
    # expr>, i) re-sorts the doc's grams for every i, O(n² log n) per
    # document (measured: the un-staged form hung the sf0.1 bench; the
    # ngram_top_terms docstring pins the same trap). Multi-use non-cheap
    # aliases survive CollapseProject, so each step evaluates once per
    # row.
    s = F.col("__s")
    n = F.size(s)
    # run starts: 1-based positions where the sorted gram differs from
    # its predecessor (position 1 guarded — ANSI element_at(s, 0) would
    # throw; CaseWhen evaluates lazily, so the otherwise-branch never
    # sees i == 1). The n == 0 guard is mandatory HERE, not only on
    # ``runs``: staged as its own column this evaluates for every row,
    # and sequence(1, 0) DESCENDS ([1, 0]) — its 0 would reach
    # element_at
    idx_expr = F.when(n == 0, F.array().cast("array<int>")).otherwise(
        F.filter(
            F.sequence(F.lit(1), n),
            lambda i: F.when(i == F.lit(1), F.lit(True)).otherwise(
                F.element_at(s, i) != F.element_at(s, i - 1)
            ),
        )
    )
    # each run's end boundary = the next run's start (size+1 for the
    # last); n == 0 must short-circuit BEFORE sequence/zip_with:
    # sequence(1, 0) descends and zip_with null-pads the shorter side
    idx = F.col("__idx")
    nxt = F.concat(
        F.slice(idx, 2, F.greatest(F.size(idx) - 1, F.lit(0))),
        F.array(n + 1),
    )
    runs = F.when(
        n == 0,
        F.lit(None).cast("array<struct<g:struct<w1:string,w2:string>,tf:bigint>>"),
    ).otherwise(
        F.zip_with(
            idx,
            nxt,
            lambda a, b: F.struct(
                F.element_at(s, a).alias("g"), (b - a).cast("long").alias("tf")
            ),
        )
    )
    # exactly the rows groupBy(doc, w1, w2) produced — computed without
    # the exchange (explode(NULL) drops gram-less docs, matching the
    # old shape where such docs contributed no pair rows)
    tf = (
        df.select(F.col(id_col), F.array_sort(grams).alias("__s"))
        .select(id_col, "__s", idx_expr.alias("__idx"))
        .select(id_col, F.explode(runs).alias("r"))
        .select(
            id_col,
            F.col("r.g.w1").alias("w1"),
            F.col("r.g.w2").alias("w2"),
            F.col("r.tf").alias("tf"),
        )
    )
    # model counts: same integers the r8 windows produced (Σ tf per
    # key), so neglogp is the identical double per (w1, w2) key
    model12 = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))
    model1 = model12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    if vocab_size is None:
        # in-plan scalar: count_distinct over the already-aggregated
        # bigram keys — rides the model12 exchange (AQE ReusedExchange),
        # replacing the r8–r10 driver-side distinct-count job
        v_df = model12.agg(F.count_distinct("w2").cast("long").alias("__V"))
    else:
        v_df = df.sparkSession.range(1).select(
            F.lit(int(vocab_size)).cast("long").alias("__V")
        )
    scores = (
        model12.join(model1, "w1")
        .crossJoin(v_df)
        .select(
            "w1",
            "w2",
            (
                -F.log(
                    (2 * F.col("c12") + 1).cast("double")
                    / (2 * F.col("c1") + F.col("__V")).cast("double")
                )
            ).alias("neglogp"),
        )
    )
    scored = tf.join(scores, ["w1", "w2"])
    return scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_bigrams"),
        F.round(F.sum(F.col("tf") * F.col("neglogp")) / F.sum("tf"), 6).alias(
            "avg_neglogp"
        ),
    )


GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_required_words: int = 2,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """The Gopher corpus-filter rule set (Rae et al. 2021, Appendix A —
    the keep/drop gate reused verbatim by later open pipelines): a
    document survives iff it has 50–100k words, mean word length 3–10,
    a hash/ellipsis symbol-to-word ratio ≤ 0.1, <90% bullet-started and
    <30% ellipsis-ended lines, ≥80% of words containing an alphabetic
    character, and at least 2 of the 8 required English function words
    (the/be/to/of/and/that/have/with). Emits the measured features, one
    boolean per rule, and the conjunction ``keep`` — features kept
    alongside the verdict so threshold sweeps don't re-scan the corpus.
    ``passthrough`` names extra input columns to carry into the output
    unchanged (pipeline composition — e.g. the curation funnel keeps
    the raw text and an upstream language flag through this gate
    without a second corpus scan or a re-join).

    Scale shape: pure narrow per-row expressions over one materialized
    token array — runs inside the scan stage, shuffle-free, at any
    corpus size; the output is a filter gate for the pipeline's next
    stage, so nothing here ever widens. Rounded to 6 dp (+0.0 to
    normalize IEEE -0.0) for cross-engine comparison.

    North-star extension (no reference counterpart —
    /root/reference/sql_queries.py has no text surface).
    """
    toks = words(F.col(text_col))
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda l: F.trim(l) != "")
    base = df.select(
        F.col(id_col),
        F.col(text_col),
        toks.alias("__toks"),
        lines.alias("__lines"),
        # text_col/id_col are already projected; adding them again would
        # make the passthrough reference ambiguous downstream
        *[F.col(c) for c in passthrough if c not in (id_col, text_col)],
    )
    t = F.col("__toks")
    ln = F.col("__lines")
    n_words = F.size(t)
    tok_chars = F.aggregate(t, F.lit(0), lambda acc, w: acc + F.length(w))
    mean_wl = F.when(
        n_words > 0, tok_chars.cast("double") / n_words.cast("double")
    )
    text = F.col(text_col)
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    sym_ratio = F.when(
        n_words > 0, (n_hash + n_ellipsis).cast("double") / n_words.cast("double")
    )
    n_lines = F.size(ln)
    n_bullet = F.size(
        F.filter(
            ln,
            lambda l: F.ltrim(l).startswith("- ")
            | F.ltrim(l).startswith("* ")
            | F.ltrim(l).startswith("•"),
        )
    )
    n_ell_end = F.size(
        F.filter(
            ln,
            lambda l: F.rtrim(l).endswith("...") | F.rtrim(l).endswith("…"),
        )
    )
    bullet_ratio = F.when(
        n_lines > 0, n_bullet.cast("double") / n_lines.cast("double")
    ).otherwise(F.lit(0.0))
    ell_ratio = F.when(
        n_lines > 0, n_ell_end.cast("double") / n_lines.cast("double")
    ).otherwise(F.lit(0.0))
    n_alpha_words = F.size(F.filter(t, lambda w: w.rlike("[A-Za-z]")))
    alpha_ratio = F.when(
        n_words > 0, n_alpha_words.cast("double") / n_words.cast("double")
    )
    lower_toks = F.transform(t, F.lower)
    n_required = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS]),
            lambda w: F.array_contains(lower_toks, w),
        )
    )
    r6 = lambda c: F.round(c, 6) + F.lit(0.0)  # noqa: E731
    rule_wc = (n_words >= min_words) & (n_words <= max_words)
    rule_mwl = (
        mean_wl.isNotNull()
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
    )
    rule_sym = sym_ratio.isNotNull() & (sym_ratio <= max_symbol_ratio)
    rule_bullet = bullet_ratio < max_bullet_ratio
    rule_ell = ell_ratio < max_ellipsis_ratio
    rule_alpha = alpha_ratio.isNotNull() & (alpha_ratio >= min_alpha_word_ratio)
    rule_req = n_required >= min_required_words
    return base.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        n_words.alias("n_words"),
        r6(mean_wl).alias("mean_word_len"),
        r6(sym_ratio).alias("symbol_ratio"),
        r6(bullet_ratio).alias("bullet_ratio"),
        r6(ell_ratio).alias("ellipsis_ratio"),
        r6(alpha_ratio).alias("alpha_word_ratio"),
        n_required.cast("int").alias("n_required_words"),
        rule_wc.alias("rule_word_count"),
        rule_mwl.alias("rule_mean_word_len"),
        rule_sym.alias("rule_symbol_ratio"),
        rule_bullet.alias("rule_bullet_lines"),
        rule_ell.alias("rule_ellipsis_lines"),
        rule_alpha.alias("rule_alpha_words"),
        rule_req.alias("rule_required_words"),
        (
            rule_wc
            & rule_mwl
            & rule_sym
            & rule_bullet
            & rule_ell
            & rule_alpha
            & rule_req
        ).alias("keep"),
    )


def c4_quality_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """The C4 heuristic cleaning gate (Raffel et al. 2020, §2.2 — the
    rule set behind the Colossal Clean Crawled Corpus, reused by T5 and
    most later English web pipelines). Line level: a (non-blank) line
    survives iff it ends in a terminal punctuation mark (. ! ? closing
    quote), has at least ``min_line_words`` words, and does not mention
    "javascript". Page level: the cleaned page is kept iff it has at
    least ``min_sentences`` sentences left, does not contain the phrase
    "lorem ipsum", and does not contain a curly brace. The two rules C4
    applies that live elsewhere in this engine are cited, not repeated:
    span dedup is ``dedup.dedup_repeated_chunks`` (C4 dropped repeated
    3-sentence spans) and the bad-word list is a trivial parameter of
    this gate's javascript clause.

    Emits per document: line/sentence tallies, the reassembled
    ``clean_text`` (kept lines joined with newlines), one boolean per
    page rule, and the ``keep`` conjunction — features alongside the
    verdict so threshold sweeps don't re-scan (the Gopher-gate shape).

    Scale shape: pure narrow per-row expressions over one materialized
    line array — runs inside the scan stage, shuffle-free at any corpus
    size. Sentences are counted as terminal-punctuation marks in the
    kept text (the cheap proxy; C4 used an English sentence splitter).

    North-star extension (no reference counterpart —
    /root/reference/sql_queries.py has no text surface).
    """
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda l: F.trim(l) != "")
    base = df.select(F.col(id_col), F.col(text_col), lines.alias("__lines"))
    ln = F.col("__lines")

    def line_kept(l: Column) -> Column:
        n_words = F.size(F.filter(F.split(F.trim(l), r"\s+"), lambda t: t != ""))
        return (
            F.rtrim(l).rlike('[.!?"”]$')
            & (n_words >= min_line_words)
            & ~F.contains(F.lower(l), F.lit("javascript"))
        )

    staged = base.select(
        F.col(id_col),
        F.col(text_col),
        F.size(ln).alias("n_lines"),
        F.filter(ln, line_kept).alias("__kept"),
    )
    kept = F.col("__kept")
    clean_text = F.array_join(kept, "\n")
    n_sentences = F.size(F.regexp_extract_all(clean_text, F.lit("[.!?]"), 0))
    text = F.col(text_col)
    rule_sent = n_sentences >= min_sentences
    rule_lorem = ~F.contains(F.lower(text), F.lit("lorem ipsum"))
    rule_brace = ~F.contains(text, F.lit("{"))
    return staged.select(
        F.col(id_col),
        F.col("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        clean_text.alias("clean_text"),
        rule_sent.alias("rule_min_sentences"),
        rule_lorem.alias("rule_no_lorem_ipsum"),
        rule_brace.alias("rule_no_curly_brace"),
        (rule_sent & rule_lorem & rule_brace).alias("keep"),
    )


def perplexity_buckets(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score each
    document with a language-model perplexity proxy, then split each
    language's corpus into head / middle / tail terciles — head (lowest
    perplexity) is the training-quality slice, tail the discard/review
    slice. The LM here is the corpus's own unigram model
    (``unigram_logprob_scores``); CCNet uses a pretrained KenLM, which
    is a drop-in replacement for the score column.

    Boundaries are EXACT interpolated percentiles (1/3, 2/3) per
    language over the rounded per-doc score — two scalars per language
    broadcast back as a tiny join, deliberately NOT a global ntile
    (ranking every document in one window partition is a single-node
    sort at web scale; the customer_rfm_segments pattern). Spark
    ``percentile`` == DuckDB ``quantile_cont`` (linear interpolation)
    on identical rounded doubles, so boundaries are bit-identical
    cross-engine. Docs with no scoreable tokens are absent (they have
    no LM score), matching ``unigram_logprob_scores``.

    Returns (id, lang, n_tokens, avg_neglogp, ppl, bucket); ``ppl`` =
    exp(mean surprisal) rounded 6 dp (libm exp drift is ~1 ulp of ~e^4,
    ten orders below the grain).
    """
    scores = unigram_logprob_scores(df, text_col=text_col, id_col=id_col)
    langs = df.select(F.col(id_col), F.col(lang_col).alias("lang"))
    # j feeds TWO consumers (the per-lang percentile aggregate and the
    # final bucket projection). Materialize it once — but j is DOC-sized
    # (one narrow row per doc), ~two orders smaller than the (doc, token)
    # tf frame the scorer shuffles; checkpointing HERE instead of inside
    # the scorer is what flattened the sf100 decade (33× → tf-shuffle
    # slope). DISK_ONLY: unbounded frame, truncated lineage must survive
    # eviction (components.py).
    j = scores.join(langs, id_col).localCheckpoint(
        eager=True, storageLevel=StorageLevel.DISK_ONLY
    )
    third = 1.0 / 3.0
    # boundaries are ROUNDED to the same 6-dp grid the scores live on:
    # when the interpolation endpoints tie (heavy score ties), engines
    # may assemble x*(1-f)+x*f vs x+f*(x-x) and land one ulp apart —
    # observed flipping boundary docs at sf0.1. On-grid boundaries make
    # the <= compare cross-engine exact (a boundary strictly between
    # grid points can't equal any score either way).
    bounds = j.groupBy("lang").agg(
        F.round(F.percentile(F.col("avg_neglogp"), F.lit(third)), 6).alias("__b1"),
        F.round(F.percentile(F.col("avg_neglogp"), F.lit(2.0 * third)), 6).alias(
            "__b2"
        ),
    )
    s = F.col("avg_neglogp")
    return j.join(F.broadcast(bounds), "lang").select(
        F.col(id_col),
        "lang",
        "n_tokens",
        s.alias("avg_neglogp"),
        (F.round(F.exp(s), 6) + F.lit(0.0)).alias("ppl"),
        F.when(s <= F.col("__b1"), F.lit("head"))
        .when(s <= F.col("__b2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt_parts: int = 32,
) -> DataFrame:
    """BM25 lexical retrieval (Robertson & Zaragoza 2009; the Lucene
    ``k1/b`` variant with the always-positive idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``): score every document
    containing at least one query term and return each query's top-k.
    ``queries`` is a tiny ``(query_id, query_text)`` frame; repeated
    query terms count once (distinct-term query model). This is the
    sparse/lexical sibling of the dense retrieval stack
    (sim_topk_cosine / sim_ann_*): same shortlist contract, inverse
    document frequency instead of embedding geometry.

    Plan shape, sized for a 100 TB corpus with a handful of queries:
    - the corpus tokenizes ONCE into a staged projection (higher-order
      functions skip subexpression elimination — the analyzer-inlining
      trap measured in dedup_repeated_chunks);
    - the exploded postings stream is semi-joined against the broadcast
      distinct query-term set BEFORE any aggregation, so only postings
      for query terms ever shuffle (the inverted-index access path —
      everything else dies in the scan stage);
    - term frequencies aggregate map-side-combined on (doc, term);
      document frequencies aggregate from the tf frame (term-count
      rows) and broadcast back;
    - corpus scalars N and avgdl come from one map-side count/sum
      aggregate, broadcast as a 1-row frame (allowlisted 1-row BNLJ,
      the scalar-subquery pattern of q22/ts_seasonal_anomalies);
    - per-term partial scores are rounded to 6 dp and summed as
      DECIMAL(20,6) per (query, doc) — exact and associative, immune
      to partition-order float drift (the bitext-margin contract);
    - top-k is TWO-PHASE: rank within (query_id, doc-hash salt) first,
      then rank the <= salt_parts*k survivors per query — a single
      window partitioned by only query_id would funnel the whole
      candidate set of each query through one task at corpus scale.

    Returns (query_id, doc_id, score DOUBLE, rank INT), rank 1..k by
    (score DESC, doc_id ASC) — the unique-tiebreak ordering contract.
    """
    toked = docs.select(
        F.col(id_col), words(F.lower(F.col(text_col))).alias("__toks")
    )
    toked = toked.select(
        F.col(id_col), F.col("__toks"), F.size("__toks").alias("__dl")
    )

    qterms = queries.select(
        F.col("query_id"),
        F.explode(
            F.array_distinct(words(F.lower(F.col("query_text"))))
        ).alias("term"),
    )
    qterm_set = qterms.select("term").distinct()

    stats = toked.agg(
        F.count(F.lit(1)).cast("double").alias("__n_docs"),
        (
            F.sum("__dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("__avgdl"),
    )

    postings = toked.select(
        F.col(id_col), F.col("__dl"), F.explode("__toks").alias("term")
    ).join(F.broadcast(qterm_set), "term", "leftsemi")
    tf = postings.groupBy(id_col, "term", "__dl").agg(
        F.count(F.lit(1)).alias("__tf")
    )
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    return _bm25_score_topk(
        tf, df_counts, stats, qterms, k, k1, b, id_col, salt_parts
    )


def _bm25_score_topk(
    tf: DataFrame,
    df_counts: DataFrame,
    stats: DataFrame,
    qterms: DataFrame,
    k: int,
    k1: float,
    b: float,
    id_col: str,
    salt_parts: int,
) -> DataFrame:
    """BM25 scoring + two-phase top-k over pre-derived postings frames —
    the seam between the inline (``bm25_topk``) and staged
    (``bm25_topk_staged``) paths, so both produce bit-identical scores
    by construction (the ``_lsh_pairs_from`` precedent in dedup).
    Inputs: ``tf`` (id, term, __dl, __tf), ``df_counts`` (term, __df),
    ``stats`` 1-row (__n_docs, __avgdl), ``qterms`` (query_id, term)."""
    scored = (
        tf.join(F.broadcast(df_counts), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n_docs") - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )
    tfnorm = (F.col("__tf").cast("double") * F.lit(k1 + 1.0)) / (
        F.col("__tf").cast("double")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b) * F.col("__dl").cast("double") / F.col("__avgdl")
        )
    )
    per_term = scored.select(
        "query_id",
        F.col(id_col),
        F.round(idf * tfnorm, 6).cast("decimal(20,6)").alias("__s"),
    )
    doc_scores = per_term.groupBy("query_id", id_col).agg(
        F.sum("__s").cast("double").alias("score")
    )

    w_salt = Window.partitionBy(
        "query_id", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_parts))
    ).orderBy(F.col("score").desc(), F.col(id_col).asc())
    w_q = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        doc_scores.withColumn("__r0", F.row_number().over(w_salt))
        .filter(F.col("__r0") <= k)
        .withColumn("rank", F.row_number().over(w_q))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col(id_col), "score", F.col("rank").cast("int").alias("rank")
        )
    )


def stage_bm25(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    files_per_bucket: int = 1,
) -> None:
    """Materialize the BM25 inverted index ONCE: full-vocabulary postings
    ``(doc_id, term, tf, dl)`` PARTITIONED BY a term-hash ``bucket``
    (probes statically prune to the query terms' buckets — the on-disk
    inverted-file access path, the ``IvfIndex.save`` analogue for the
    sparse leg), per-term document frequencies ``(term, df)`` under the
    same bucketing, and the corpus scalars ``(n_docs, avgdl, n_buckets)``
    as a 1-row dataset. All three datasets stage into one unpublished
    ``SnapshotIndex`` version and publish with a single atomic pointer
    swap (VERDICT r9 #5 — the three writes used to be sequentially
    visible), so a crash anywhere mid-stage leaves either no published
    index (fresh stage) or the previous version fully readable.

    This is the 100 TB form of ``bm25_topk``: the inline path
    re-tokenizes the WHOLE corpus per retrieval call (the last
    unamortized scan in the retrieval stack — VERDICT r8 #1); staging
    pays one tokenize + one shuffle on (doc, term) + one write, and
    every later query reads only its terms' buckets — a
    vocabulary-partition-pruned scan whose cost scales with the query,
    not the corpus. ``files_per_bucket`` sizes the layout exactly like
    ``IvfIndex.save``: without compaction every upstream task writes a
    sliver into every bucket dir and probes pay file listing, not scan.
    The repartition key must include an in-bucket splitter —
    ``pmod(xxhash64(id), files_per_bucket)`` — because hashing the
    bucket value alone lands ALL of a bucket's rows in one partition
    (one file per bucket dir regardless of the knob; ADVICE r9).

    Unlike the query-dependent inline semi-join, the staged postings
    cover the FULL vocabulary (queries aren't known at stage time), so
    stats/df/tf are identical to the inline derivation restricted to any
    query-term set — staged==inline is pinned in tests."""
    from etl_s3_to_redshift_spark.operators.table_commit import SnapshotIndex

    toked = docs.select(
        F.col(id_col), words(F.lower(F.col(text_col))).alias("__toks")
    ).select(F.col(id_col), F.col("__toks"), F.size("__toks").alias("dl"))

    tf = (
        toked.select(F.col(id_col), F.col("dl"), F.explode("__toks").alias("term"))
        .groupBy(id_col, "term", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", F.pmod(F.xxhash64(F.col("term")), F.lit(n_buckets)))
    )
    snap = SnapshotIndex(path)
    stage = snap.begin()
    try:
        split = F.pmod(F.xxhash64(F.col(id_col)), F.lit(files_per_bucket))
        (
            tf.repartition(n_buckets * files_per_bucket, "bucket", split)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(stage, "postings"))
        )
        dfc = (
            tf.groupBy("term", "bucket")
            .agg(F.count(F.lit(1)).alias("df"))
            .repartition(
                n_buckets * files_per_bucket,
                "bucket",
                F.pmod(F.xxhash64(F.col("term")), F.lit(files_per_bucket)),
            )
        )
        dfc.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(stage, "df")
        )
        # sum_dl rides along as the EXACT integer total so
        # append_to_staged_bm25 can update avgdl without re-scanning the
        # staged corpus (recovering the sum from the avgdl double would
        # not be exact)
        toked.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "avgdl"
            ),
            F.lit(n_buckets).cast("int").alias("n_buckets"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sum_dl"),
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(stage, "stats"))
    except BaseException:
        snap.abort(stage)
        raise
    snap.publish(stage)


def append_to_staged_bm25(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    files_per_bucket: int = 1,
) -> None:
    """Append NEW documents into a ``stage_bm25`` index without
    re-tokenizing the staged corpus — the sparse-leg member of the
    incremental-maintenance triple (``minhash append`` /
    ``IvfIndex.append_to_saved``): arriving data costs its own size,
    never a corpus re-stage. The new docs' postings rows are written
    ``mode('append')`` into the existing bucket layout (same
    ``pmod(xxhash64(term), n_buckets)`` hashing — read from the staged
    stats, so the bucketing always matches); per-term df merges old+delta;
    N/avgdl update from the EXACT integer ``sum_dl`` the stage recorded.
    Result == a full re-stage of the union corpus (pinned in tests):
    tf/dl are per-doc, df/N/avgdl are sums — all associative.

    Caller contract (the ``append_to_saved`` one): ``new_docs`` ids are
    disjoint from the staged corpus. The append is ATOMIC
    (VERDICT r9 #5): old postings files are hardlinked into a fresh
    unpublished ``SnapshotIndex`` version (metadata-only — arriving
    data still costs its own size), the delta postings / merged df /
    updated stats are written there, and ONE pointer swap publishes all
    three together — a crash anywhere mid-append leaves the previous
    version published with internally consistent postings/df/N."""
    from etl_s3_to_redshift_spark.operators.table_commit import SnapshotIndex

    spark = new_docs.sparkSession
    snap = SnapshotIndex(path)
    if not snap.exists():
        raise ValueError(
            "no published SnapshotIndex at this path (pre-r10 "
            "unversioned layouts cannot be appended atomically) — "
            "re-run stage_bm25 before appending"
        )
    cur_root = snap.current_path()
    st_frame = spark.read.parquet(os.path.join(cur_root, "stats"))
    if "sum_dl" not in st_frame.columns:
        raise ValueError(
            "staged BM25 index predates append support (no sum_dl in "
            "stats) — re-run stage_bm25 before appending"
        )
    st = st_frame.collect()[0]
    n_buckets = int(st["n_buckets"])

    toked = new_docs.select(
        F.col(id_col), words(F.lower(F.col(text_col))).alias("__toks")
    ).select(F.col(id_col), F.col("__toks"), F.size("__toks").alias("dl"))
    tf_new = (
        toked.select(F.col(id_col), F.col("dl"), F.explode("__toks").alias("term"))
        .groupBy(id_col, "term", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", F.pmod(F.xxhash64(F.col("term")), F.lit(n_buckets)))
    )
    stage = snap.begin()
    try:
        # carry the staged corpus by reference: hardlink the published
        # postings files into the new version (O(#files) metadata ops,
        # no data copy), then land ONLY the delta rows next to them
        snap.link_from_current(stage, "postings")
        (
            tf_new.repartition(
                n_buckets * files_per_bucket,
                "bucket",
                # in-bucket splitter, same layout rule as stage_bm25
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(files_per_bucket)),
            )
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(os.path.join(stage, "postings"))
        )
        df_delta = tf_new.groupBy("term", "bucket").agg(
            F.count(F.lit(1)).alias("df")
        )
        # reads the OLD version, writes the NEW one — no read-overwrite
        # conflict, so no lineage truncation needed (the pre-snapshot
        # code localCheckpoint'ed to break exactly that conflict)
        df_old = spark.read.parquet(os.path.join(cur_root, "df"))
        merged = (
            df_old.unionByName(df_delta)
            .groupBy("term", "bucket")
            .agg(F.sum("df").cast("long").alias("df"))
        )
        merged.repartition(
            n_buckets * files_per_bucket,
            "bucket",
            F.pmod(F.xxhash64(F.col("term")), F.lit(files_per_bucket)),
        ).write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(stage, "df")
        )

        new_agg = toked.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("s"),
        ).collect()[0]
        n_total = int(st["n_docs"]) + int(new_agg["n"])
        sum_total = int(st["sum_dl"]) + int(new_agg["s"])
        spark.createDataFrame(
            [
                (
                    float(n_total),
                    float(sum_total) / float(n_total),
                    n_buckets,
                    sum_total,
                )
            ],
            "n_docs double, avgdl double, n_buckets int, sum_dl long",
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(stage, "stats"))
    except BaseException:
        snap.abort(stage)
        raise
    snap.publish(stage)


def compact_staged_bm25(
    spark,
    path: str,
    files_per_bucket: int = 1,
    id_col: str = "doc_id",
) -> None:
    """Fold an appended BM25 index's accumulated small files back to the
    stage-time layout — the ``compact_snapshot`` / OPTIMIZE analogue for
    the inverted index. Every ``append_to_staged_bm25`` lands one file
    per touched bucket (by design: arriving data costs its own size),
    so after many appends a probe pays file listing/open per bucket
    instead of scan; compaction rewrites the published postings
    compacted (one shuffle keyed exactly like ``stage_bm25``), carries
    df/stats by hardlink (the append just rewrote them — they are
    already compact), and publishes as a new atomic ``SnapshotIndex``
    version: readers mid-compaction keep the fragmented old version,
    and a crash changes nothing. Scores are byte-identical — postings
    ROWS are untouched, only their file layout changes (pinned in
    tests)."""
    from etl_s3_to_redshift_spark.operators.table_commit import SnapshotIndex

    snap = SnapshotIndex(path)
    cur_root = snap.current_path()
    postings = spark.read.parquet(os.path.join(cur_root, "postings"))
    n_buckets = int(
        spark.read.parquet(os.path.join(cur_root, "stats")).collect()[0]["n_buckets"]
    )
    stage = snap.begin()
    try:
        (
            postings.repartition(
                n_buckets * files_per_bucket,
                "bucket",
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(files_per_bucket)),
            )
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(stage, "postings"))
        )
        snap.link_from_current(stage, "df")
        snap.link_from_current(stage, "stats")
    except BaseException:
        snap.abort(stage)
        raise
    snap.publish(stage)


def bm25_topk_staged(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    salt_parts: int = 32,
) -> DataFrame:
    """BM25 retrieval over a ``stage_bm25`` index: identical output to
    ``bm25_topk`` on the staged corpus (same tokenization, same stats,
    same decimal score sums — the shared ``_bm25_score_topk`` tail;
    pinned in tests), but the corpus-sized tokenize→explode→aggregate
    pipeline is replaced by a statically partition-pruned scan of the
    query terms' buckets. The query-term set is collected once to plan
    the pruning (queries ≪ corpus — the same tiny-queries serving
    contract as ``ivf_probe``); terms are pushed as both a ``bucket``
    partition filter (directory pruning) and a ``term IN`` data filter
    (parquet row-group stats within the probed buckets).

    ``path`` resolves through the ``SnapshotIndex`` pointer ONCE here,
    so the whole probe reads one immutable version even if a concurrent
    append publishes mid-query (snapshot isolation; pre-r10 unversioned
    layouts resolve to themselves)."""
    from etl_s3_to_redshift_spark.operators.table_commit import resolve_index_root

    path = resolve_index_root(path)
    stats_all = spark.read.parquet(os.path.join(path, "stats"))
    stats = stats_all.select(
        F.col("n_docs").alias("__n_docs"), F.col("avgdl").alias("__avgdl")
    )

    qterms = queries.select(
        F.col("query_id"),
        F.explode(
            F.array_distinct(words(F.lower(F.col("query_text"))))
        ).alias("term"),
    )
    # static pruning values, hashed by the SAME JVM expression used at
    # stage time (xxhash64 is seed-stable across sessions). ONE driver
    # round-trip plans the probe (VERDICT r10 #7 — was two): the 1-row
    # stats frame rides the term collect as a broadcast crossJoin, so
    # n_buckets and the per-term buckets arrive together; both frames
    # read the SAME already-resolved version root, so snapshot isolation
    # is untouched.
    q_rows = (
        qterms.select("term")
        .distinct()
        .crossJoin(F.broadcast(stats_all.select("n_buckets")))
        .select(
            "term",
            F.pmod(F.xxhash64(F.col("term")), F.col("n_buckets")).alias("b"),
        )
        .collect()
    )
    terms = [r["term"] for r in q_rows]
    buckets = sorted({int(r["b"]) for r in q_rows})
    # no special case for an empty term set: isin([]) is FALSE, so the
    # pruned scans go empty and the result is the correctly-typed
    # zero-row frame
    tf = (
        spark.read.parquet(os.path.join(path, "postings"))
        .filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
        .select(
            F.col(id_col),
            F.col("term"),
            F.col("dl").alias("__dl"),
            F.col("tf").alias("__tf"),
        )
    )
    df_counts = (
        spark.read.parquet(os.path.join(path, "df"))
        .filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
        .select(F.col("term"), F.col("df").alias("__df"))
    )
    return _bm25_score_topk(
        tf, df_counts, stats, qterms, k, k1, b, id_col, salt_parts
    )
