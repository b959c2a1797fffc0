"""Salted skew join (operators/skew.py): row-for-row equal to the plain
join, for every `how` and salt count, with the salt column never leaking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_tdigest_spark.operators.skew import salted_join


def _fixtures(spark):
    # key "hot" is heavily skewed; "x" unmatched on the dim side
    fact = spark.createDataFrame(
        [("hot", i) for i in range(50)] + [("cold", 0), ("x", 7)],
        ["k", "v"],
    )
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("unused", "U")], ["k", "label"]
    )
    return fact, dim


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("n_salts", [1, 8])
def test_equals_plain_join(spark, how, n_salts):
    fact, dim = _fixtures(spark)
    got = salted_join(fact, dim, ["k"], n_salts=n_salts, how=how)
    want = fact.join(dim, ["k"], how)
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)


def test_salt_actually_spreads(spark):
    # the hot key's 50 rows must occupy >1 salt bucket (whole-row hash
    # over distinct rows), else the operator silently degenerates
    fact, dim = _fixtures(spark)
    n = (
        fact.withColumn(
            "s", F.pmod(F.xxhash64(*fact.columns), F.lit(8)).cast("int")
        )
        .where(F.col("k") == "hot")
        .select("s")
        .distinct()
        .count()
    )
    assert n > 1


def test_validation(spark):
    fact, dim = _fixtures(spark)
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(fact, dim, ["k"], n_salts=0)
    with pytest.raises(ValueError, match="how"):
        salted_join(fact, dim, ["k"], how="full")
    with pytest.raises(ValueError, match="missing"):
        salted_join(fact, dim, ["nope"])
    with pytest.raises(ValueError, match="reserved"):
        salted_join(fact.withColumn("__salt", F.lit(1)), dim, ["k"])


def test_plan_joins_on_key_plus_salt(spark):
    fact, dim = _fixtures(spark)
    out = salted_join(fact, dim, ["k"], n_salts=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # join condition carries the salt
    assert "BatchEvalPython" not in plan


def test_map_column_fact_does_not_crash(spark):
    # xxhash64 rejects MapType; the salt must skip unhashable columns
    # instead of failing the whole join (review fix)
    fact = spark.createDataFrame(
        [("hot", {"a": 1}), ("cold", {"b": 2})], "k string, props map<string,int>"
    )
    dim = spark.createDataFrame([("hot", "H"), ("cold", "C")], ["k", "label"])
    got = salted_join(fact, dim, ["k"], n_salts=4)
    want = fact.join(dim, ["k"], "inner")
    assert sorted((r["k"], r["label"]) for r in got.collect()) == sorted(
        (r["k"], r["label"]) for r in want.collect()
    )
