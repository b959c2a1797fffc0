"""SQL-callable reads for the auxiliary sketch family.

``register_sketch_sql_functions(spark)`` exposes the KLL / HLL / CMS /
Bloom read surface to ``spark.sql`` users, mirroring
``register_sql_functions`` for the t-digest — so a SQL-only consumer can
query any sketch column the aggregations produce:

    SELECT event_type, hll_estimate(sketch) FROM sketches
    SELECT kll_quantile(sketch, 0.99) FROM kll_sketches
    SELECT cms_point_query(sketch, xxhash64(l_suppkey)) FROM cms, probes
    SELECT bloom_might_contain(sketch, xxhash64(k), xxhash64(k, 1)) ...

Parameters arrive as columns (SQL can't close over Python literals).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

from ..sketches import HLL, KLL, BloomFilter, CountMinSketch


def register_sketch_sql_functions(spark: SparkSession) -> None:
    @pandas_udf("double")
    def kll_quantile_sql(s: pd.Series, q: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if b is None or qv is None
                else KLL.from_bytes(bytes(b)).quantile(float(qv))
                for b, qv in zip(s, q)
            ]
        )

    @pandas_udf("double")
    def kll_cdf_sql(s: pd.Series, x: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if b is None or xv is None
                else KLL.from_bytes(bytes(b)).cdf(float(xv))
                for b, xv in zip(s, x)
            ]
        )

    @pandas_udf("long")
    def kll_count_sql(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else KLL.from_bytes(bytes(b)).count)

    @pandas_udf("double")
    def hll_estimate_sql(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: None if b is None else HLL.from_bytes(bytes(b)).estimate()
        )

    @pandas_udf("long")
    def cms_point_query_sql(s: pd.Series, h: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if b is None or hv is None
                else int(
                    CountMinSketch.from_bytes(bytes(b)).point_query_hashes(
                        np.array([hv], dtype=np.int64)
                    )[0]
                )
                for b, hv in zip(s, h)
            ]
        )

    @pandas_udf("boolean")
    def bloom_might_contain_sql(
        s: pd.Series, h1: pd.Series, h2: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [
                None if b is None or a is None or c is None
                else bool(
                    BloomFilter.from_bytes(bytes(b)).might_contain_hashes(
                        np.array([a], dtype=np.int64),
                        np.array([c], dtype=np.int64),
                    )[0]
                )
                for b, a, c in zip(s, h1, h2)
            ]
        )

    spark.udf.register("kll_quantile", kll_quantile_sql)
    spark.udf.register("kll_cdf", kll_cdf_sql)
    spark.udf.register("kll_count", kll_count_sql)
    spark.udf.register("hll_estimate", hll_estimate_sql)
    spark.udf.register("cms_point_query", cms_point_query_sql)
    spark.udf.register("bloom_might_contain", bloom_might_contain_sql)
