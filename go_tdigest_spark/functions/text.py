"""Text-analysis functions for training-data pipelines.

Every function here is a *pure Spark SQL expression* (JVM-side, inside
whole-stage codegen — no Python in the hot path) with a paired DuckDB SQL
generator producing the bit-identical formula, so the driver's oracle
comparison is exact.  The pairs are kept adjacent in this module so they
cannot drift apart.

Ops: token counting (whitespace), quality scoring (length/alpha/stopword/
punctuation ratios), language-ID heuristic (byte-vs-char width + stopword
hits), and document fingerprinting (polynomial rolling hash over
codepoints).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "and", "of", "to", "in", "is", "a")
FP_MOD = 1_000_000_007
FP_BASE = 31

# ------------------------------------------------------------- token count


def token_count(col: str) -> Column:
    return F.expr(token_count_frag_spark(col))


def token_count_frag_spark(col: str) -> str:
    return (
        f"CASE WHEN length(trim({col})) = 0 THEN 0 "
        f"ELSE size(split(trim({col}), '\\\\s+')) END"
    )


def token_count_frag_duck(col: str) -> str:
    return (
        f"CASE WHEN length(trim({col})) = 0 THEN 0 "
        f"ELSE len(string_split_regex(trim({col}), '\\s+')) END"
    )


# ---------------------------------------------------------- stopword hits


def _stop_hits_frag(col: str) -> str:
    # occurrences of whole stopwords, counted by length delta after
    # replace on a space-padded copy; same non-overlapping replace
    # semantics in Spark and DuckDB
    terms = []
    for w in STOPWORDS:
        needle = f" {w} "
        terms.append(
            f"(length(' ' || {col} || ' ') - "
            f"length(replace(' ' || {col} || ' ', '{needle}', ''))) "
            f"/ {len(needle)}"
        )
    return "(" + " + ".join(terms) + ")"


def stop_hits(col: str) -> Column:
    return F.expr(_stop_hits_frag(col))


# ---------------------------------------------------------- quality score


def quality_score_frag(col: str, dialect: str) -> str:
    if dialect == "spark":
        punct = f"length(regexp_replace({col}, '[^.,!?;:]', ''))"
        alpha = f"length(regexp_replace({col}, '[^a-zA-Z]', ''))"
        tokens = token_count_frag_spark(col)
    else:
        punct = f"length(regexp_replace({col}, '[^.,!?;:]', '', 'g'))"
        alpha = f"length(regexp_replace({col}, '[^a-zA-Z]', '', 'g'))"
        tokens = token_count_frag_duck(col)
    stops = _stop_hits_frag(col)
    n = f"greatest(length({col}), 1)"
    t = f"greatest({tokens}, 1)"
    return (
        "round("
        f"0.4 * least(1.0, {tokens} / 100.0) + "
        f"0.3 * ({alpha} * 1.0 / {n}) + "
        f"0.2 * least(1.0, ({stops} * 5.0) / {t}) + "
        f"0.1 * (1.0 - least(1.0, ({punct} * 10.0) / {n}))"
        ", 4)"
    )


def quality_score(col: str) -> Column:
    return F.expr(quality_score_frag(col, "spark"))


# ------------------------------------------------------------ language id


def lang_id_frag(col: str, dialect: str) -> str:
    # byte width vs char width exposes non-ASCII text; stopword density
    # separates English-like prose from symbol soup
    nbytes = f"octet_length({col})" if dialect == "spark" else f"strlen({col})"
    stops = _stop_hits_frag(col)
    return (
        f"CASE WHEN {nbytes} > length({col}) THEN 'nonlatin' "
        f"WHEN {stops} >= 2 THEN 'en' "
        f"ELSE 'unk' END"
    )


def lang_id(col: str) -> Column:
    return F.expr(lang_id_frag(col, "spark"))


# ------------------------------------------------------------- fingerprint


def fingerprint_frag(col: str, dialect: str) -> str:
    """Polynomial rolling hash over codepoints: h = (h*31 + cp) mod p."""
    # NB: Spark's sequence(1, 0) yields a DESCENDING sequence, not empty —
    # the empty-string case must be guarded in both dialects
    if dialect == "spark":
        agg = (
            f"aggregate(transform(sequence(1, length({col})), "
            f"i -> ascii(substring({col}, i, 1))), 0L, "
            f"(acc, c) -> (acc * {FP_BASE} + c) % {FP_MOD})"
        )
    else:
        # DuckDB folds in the element type (INT32) unless the seed is BIGINT
        agg = (
            f"list_reduce(list_prepend(0::BIGINT, list_transform("
            f"generate_series(1, length({col})), "
            f"i -> ascii(substr({col}, i, 1))::BIGINT)), "
            f"(acc, c) -> (acc * {FP_BASE} + c) % {FP_MOD})"
        )
    return f"CASE WHEN length({col}) = 0 THEN 0 ELSE {agg} END"


def fingerprint(col: str) -> Column:
    return F.expr(fingerprint_frag(col, "spark"))
