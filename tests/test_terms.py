"""TF-IDF top-k terms (operators/terms.py)."""

from __future__ import annotations

import pytest

from go_tdigest_spark.operators.terms import tfidf_topk_terms


CORPUS = [
    ("d1", "apple apple banana shared"),
    ("d2", "banana cherry shared shared"),
    ("d3", "apple cherry shared"),
]
# df: apple 2, banana 2, cherry 2, shared 3   (N = 3)


def _run(spark, **kw):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    out = tfidf_topk_terms(df, "text", "doc_id", **kw)
    return {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["tfidf"], r["rank"])
        for r in out.collect()
    }


def test_scores_and_ranks_hand_computed(spark):
    got = _run(spark, k=2, min_df=2)
    # d1: apple tf2 df2 -> 2*3/2=3.0 ; banana 1*3/2=1.5 ; shared 1*3/3=1.0
    assert got[("d1", "apple")] == (2, 2, 3.0, 1)
    assert got[("d1", "banana")] == (1, 2, 1.5, 2)
    assert ("d1", "shared") not in got  # k=2 cut
    # d2: shared tf2 df3 -> 2.0 ; banana 1.5 ; cherry 1.5 (term tiebreak)
    assert got[("d2", "shared")] == (2, 3, 2.0, 1)
    assert got[("d2", "banana")] == (1, 2, 1.5, 2)
    assert ("d2", "cherry") not in got  # lost the tie on term asc


def test_min_df_drops_hapax(spark):
    df = spark.createDataFrame(
        CORPUS + [("d4", "zzz_unique apple")], ["doc_id", "text"]
    )
    got = {
        (r["doc_id"], r["term"])
        for r in tfidf_topk_terms(df, "text", "doc_id", k=5, min_df=2).collect()
    }
    assert ("d4", "zzz_unique") not in got
    assert ("d4", "apple") in got


def test_max_df_ratio_cuts_ubiquitous(spark):
    # shared appears in 3/3 docs; ratio 0.9 -> floor(2.7)=2 -> cut
    got = _run(spark, k=5, min_df=1, max_df_ratio=0.9)
    assert all(term != "shared" for (_, term) in got)
    assert ("d1", "apple") in got


def test_n_docs_hint_matches_derived(spark):
    assert _run(spark, k=3, min_df=1) == _run(spark, k=3, min_df=1, n_docs=3)


def test_rank_is_dense_per_doc_and_k_bound(spark):
    got = _run(spark, k=2, min_df=1)
    by_doc = {}
    for (doc, _), (_, _, _, rank) in got.items():
        by_doc.setdefault(doc, []).append(rank)
    for ranks in by_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 2


def test_param_validation(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    with pytest.raises(ValueError, match="k must"):
        tfidf_topk_terms(df, "text", "doc_id", k=0)
    with pytest.raises(ValueError, match="min_df"):
        tfidf_topk_terms(df, "text", "doc_id", min_df=0)


def test_plan_stays_jvm_side(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    out = tfidf_topk_terms(df, "text", "doc_id", k=2, min_df=1, n_docs=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_null_doc_id_dropped(spark):
    df = spark.createDataFrame(
        CORPUS + [(None, "apple apple")], ["doc_id", "text"]
    )
    # the NULL doc must neither appear in output nor inflate N/df:
    # results identical to the corpus without it (review fix)
    with_null = _run_df(spark, df)
    without = _run_df(spark, spark.createDataFrame(CORPUS, ["doc_id", "text"]))
    assert with_null == without


def _run_df(spark, df):
    out = tfidf_topk_terms(df, "text", "doc_id", k=3, min_df=1)
    return sorted(tuple(r) for r in out.collect())


def test_ngram_commonness_hand_computed(spark):
    """Corpus-statistics LM-analog scoring: hand-computed bigram
    occurrence counts, multiplicity kept, short/empty/NULL docs
    handled."""
    from go_tdigest_spark.operators.terms import ngram_commonness

    rows = [
        (0, "a b c"),      # bigrams: (a b), (b c)
        (1, "a b d"),      # (a b), (b d)
        (2, "x"),          # < 2 words -> zero n-grams
        (3, ""),           # empty -> zero
        (4, None),         # NULL text -> excluded entirely
        (5, "a b a b"),    # (a b), (b a), (a b) — multiplicity kept
    ]
    # corpus occurrence counts: (a b)=4, (b a)=1, (b c)=1, (b d)=1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc"]: (r["n_grams"], r["commonness"], r["n_hapax"])
        for r in ngram_commonness(df, "text", "doc_id", n=2).collect()
    }
    assert out == {
        0: (2, 5, 1),   # 4 + 1, hapax (b c)
        1: (2, 5, 1),   # 4 + 1, hapax (b d)
        2: (0, 0, 0),
        3: (0, 0, 0),
        5: (3, 9, 1),   # 4 + 1 + 4, hapax (b a)
    }


def test_ngram_commonness_cross_engine_parity(spark):
    """Spark vs the DuckDB SQL twin on a hostile mixed corpus (unicode,
    repeated whitespace, punctuation runs) — every column must match
    exactly."""
    import duckdb
    import pandas as pd

    from go_tdigest_spark.operators.terms import (
        ngram_commonness,
        ngram_commonness_sql,
    )

    rows = [
        (0, "The  quick\tbrown fox"),
        (1, "the quick brown FOX!"),
        (2, "naïve Ärger naïve Ärger naïve"),
        (3, "one-token"),
        (4, " \t\n "),
        (5, "the quick brown fox jumps over the lazy dog the quick"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in ngram_commonness(df, "text", "doc_id", n=2).collect()
    )
    con = duckdb.connect()
    con.register("tdocs", pdf)
    want = sorted(
        tuple(r)
        for r in con.execute(
            ngram_commonness_sql("tdocs", "text", "doc_id", n=2)
        ).fetchall()
    )
    assert got == want
