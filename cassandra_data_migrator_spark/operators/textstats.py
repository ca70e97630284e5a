"""Text analysis operators: language-ID, quality scoring, token counts,
document fingerprinting. All built-in-function expressions (JVM-side,
codegen) — no UDFs — and each is DuckDB-oracle-expressible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.functions.hashing import md5_int48_expr
from cassandra_data_migrator_spark.operators.dedup import tokens_expr

# tiny deterministic stopword banks (heuristic langid, not a model)
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans"],
    "es": ["el", "la", "los", "que", "es", "una", "para", "con"],
}
_LANG_ORDER = ["en", "de", "fr", "es"]  # fixed tie-break priority


def _stopword_hits(toks: Column, lang: str) -> Column:
    return F.size(F.array_intersect(
        toks, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))


def lang_id(df: DataFrame, text_col: str, out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: most distinct stopword hits wins; ties go
    to the fixed priority order en > de > fr > es; zero hits → 'und'."""
    toks = F.array_distinct(tokens_expr(text_col))
    scores = {lang: _stopword_hits(toks, lang) for lang in _LANG_ORDER}
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in reversed(_LANG_ORDER):   # earlier langs overwrite on >=
        cond = scores[lang] >= F.greatest(best_score, F.lit(1))
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return df.withColumn(out_col, best)


def token_count(df: DataFrame, text_col: str,
                out_col: str = "n_tokens") -> DataFrame:
    """Whitespace token count (empties excluded)."""
    return df.withColumn(out_col, F.size(tokens_expr(text_col)))


# GPT-2-style pre-tokenizer pattern, lookahead-free so Java regex
# (Spark) and RE2 (DuckDB) segment identically: common contractions,
# space-prefixed letter runs, space-prefixed digit runs, space-prefixed
# punctuation runs, residual whitespace runs. Counting these segments
# approximates a BPE tokenizer's pre-merge token budget — the number an
# LLM-data pipeline filters and bills by — without shipping a vocab.
BPE_ISH_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_token_count(df: DataFrame, text_col: str,
                    out_col: str = "n_bpe_tokens") -> DataFrame:
    """BPE-ish token count: the number of GPT-2-style pre-tokenizer
    segments in ``text_col`` (see :data:`BPE_ISH_PATTERN`). Stays
    codegen'd (``regexp_extract_all`` + ``size``); null text counts 0,
    matching the whitespace counter's empty-input behavior."""
    return df.withColumn(
        out_col,
        F.coalesce(
            F.size(F.regexp_extract_all(
                F.col(text_col), F.lit(BPE_ISH_PATTERN), F.lit(0))),
            F.lit(0)))


def quality_score(df: DataFrame, text_col: str,
                  out_col: str = "quality",
                  round_digits: int | None = 4) -> DataFrame:
    """Deterministic quality heuristic in [0,1]:

    0.4·min(1, tokens/64) + 0.3·distinct-token ratio + 0.3·stopword
    presence. Fixed expression tree (both engines evaluate IEEE doubles
    in the same order) → oracle-exact. ``round_digits=None`` returns the
    raw double (use ``floor(x*10^d + 0.5)`` when an exact cross-engine
    integer is needed — ``round`` half-mode differs between engines).
    """
    toks = tokens_expr(text_col)
    n = F.size(toks).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    sw = _stopword_hits(F.array_distinct(toks), "en").cast("double")
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(64.0))
        + F.lit(0.3) * F.when(n > 0, n_distinct / n).otherwise(F.lit(0.0))
        + F.lit(0.3) * F.least(F.lit(1.0), sw / F.lit(4.0))
    )
    if round_digits is not None:
        score = F.round(score, round_digits)
    return df.withColumn(out_col, score)


def doc_fingerprint(df: DataFrame, text_col: str,
                    out_col: str = "fingerprint") -> DataFrame:
    """Content fingerprint: md5-derived 48-bit int of the normalized
    token stream (whitespace-insensitive, case-insensitive)."""
    normalized = F.concat_ws(" ", tokens_expr(text_col))
    return df.withColumn(out_col, md5_int48_expr(normalized))


def _ngrams_expr(toks: Column, n: int) -> Column:
    """Word n-grams of a token array as space-joined strings; empty
    array below n tokens (the Spark-side guard matters: an unguarded
    ``sequence(0, size-n)`` with size < n would DESCEND). DuckDB twin:
    ``list_transform(range(1, len(toks) - (n-2)),
    i -> array_to_string(toks[i:i+(n-1)], ' '))`` — ``range`` is
    empty-safe there, no guard needed.

    ``toks`` MUST be a cheap reference (a materialized column, not the
    raw ``tokens_expr`` chain): the ``transform`` lambda re-evaluates
    ``toks`` on EVERY element access, so an inlined tokenization makes
    the gram build O(tokens²) per document — measured 417 s vs seconds
    at 50k docs before the callers materialized their arrays."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(
            " ", *[F.get(toks, i + j) for j in range(n)]))
    return F.when(F.size(toks) >= n, grams) \
            .otherwise(F.array().cast("array<string>"))


def _dup_frac_bp(arr: Column) -> Column:
    """Duplicate fraction of an array in basis points:
    ``floor((1 - distinct/total)·1e4 + 0.5)``, 0 for an empty array.
    One fixed IEEE expression tree → bit-deterministic across Spark
    and DuckDB (same reasoning as ``quality_score``'s basis points)."""
    n = F.size(arr)
    nd = F.size(F.array_distinct(arr))
    return F.when(
        n > 0,
        F.floor((F.lit(1.0) - nd.cast("double") / n.cast("double"))
                * 10000 + 0.5)
    ).otherwise(F.lit(0)).cast("long")


def repetition_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, "Scaling
    Language Models", table A1 — the public repetition-filter family a
    webtext curation pipeline applies before training): per document,
    the non-empty line count and the duplicate fraction (basis points)
    of lines, word 2-grams, and word 3-grams. All pure-codegen array
    expressions — no shuffle, no UDF; the fractions are
    cross-engine-exact (see ``_dup_frac_bp``).

    Adds ``n_lines``, ``dup_line_bp``, ``dup_2gram_bp``,
    ``dup_3gram_bp``.
    """
    # materialize every array ONCE per row: tokens feed the gram
    # lambdas (which re-evaluate their input per element — see
    # _ngrams_expr) and each gram/line array is read 3× by
    # _dup_frac_bp. CollapseProject keeps multi-use non-cheap aliases
    # as separate projections, so these stay materialized in the plan.
    d = (df
         .withColumn("_rs_toks", tokens_expr(text_col))
         .withColumn("_rs_lines",
                     F.filter(F.split(F.col(text_col), "\n"),
                              lambda x: x != "")))
    d = (d
         .withColumn("_rs_g2", _ngrams_expr(F.col("_rs_toks"), 2))
         .withColumn("_rs_g3", _ngrams_expr(F.col("_rs_toks"), 3)))
    return (d
            .withColumn("n_lines", F.size(F.col("_rs_lines")).cast("long"))
            .withColumn("dup_line_bp", _dup_frac_bp(F.col("_rs_lines")))
            .withColumn("dup_2gram_bp", _dup_frac_bp(F.col("_rs_g2")))
            .withColumn("dup_3gram_bp", _dup_frac_bp(F.col("_rs_g3")))
            .drop("_rs_toks", "_rs_lines", "_rs_g2", "_rs_g3"))


def curate_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    langs: tuple[str, ...] = ("en",),
    min_quality_bp: int = 4500,
    max_dup_2gram_bp: int = 2500,
) -> DataFrame:
    """End-to-end corpus curation — the composite keep/drop decision a
    training-data pipeline runs over a crawled corpus (C4/Gopher-style
    rule stack): language gate (``lang_id``), quality floor
    (``quality_score`` basis points), repetition ceiling
    (``dup_2gram_bp``), then exact-duplicate removal (lowest ``id_col``
    per content ``fingerprint`` survives). Emits the full audit trail —
    every signal plus ``keep`` and ``reject_reason`` (the FIRST failing
    check in the fixed order lang → quality → repetition → duplicate;
    NULL when kept) — so downstream can both filter and account for
    drop rates per reason.

    Scale shape: the signals are one codegen projection; the only
    shuffle is the duplicate window, partitioned by ``fingerprint``
    (md5-derived 48-bit — uniformly distributed, no hot keys by
    construction). Canonical-survivor choice is min-id over the WHOLE
    corpus, independent of the other gates, so the decision is stable
    under re-partitioning and incremental re-runs.
    """
    from pyspark.sql import Window

    d = lang_id(df, text_col)
    d = quality_score(d, text_col, round_digits=None)
    d = d.withColumn(
        "quality_bp",
        F.floor(F.col("quality") * 10000 + 0.5).cast("long")
    ).drop("quality")
    # tokens and grams materialized once per row (see _ngrams_expr:
    # an inlined tokenization is O(tokens²) inside the gram lambda)
    d = d.withColumn("_cc_toks", tokens_expr(text_col))
    d = d.withColumn("_cc_g2", _ngrams_expr(F.col("_cc_toks"), 2))
    d = (d.withColumn("dup_2gram_bp", _dup_frac_bp(F.col("_cc_g2")))
          .drop("_cc_toks", "_cc_g2"))
    d = doc_fingerprint(d, text_col)
    canon = F.min(id_col).over(Window.partitionBy("fingerprint"))
    reason = (
        F.when(~F.col("lang_pred").isin(*langs), F.lit("lang"))
         .when(F.col("quality_bp") < min_quality_bp, F.lit("quality"))
         .when(F.col("dup_2gram_bp") > max_dup_2gram_bp,
               F.lit("repetition"))
         .when(F.col(id_col) != canon, F.lit("duplicate")))
    return (d.withColumn("reject_reason", reason)
             .withColumn("keep", reason.isNull()))
