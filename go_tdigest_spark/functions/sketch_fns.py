"""SQL-callable reads for the auxiliary sketch family.

``register_sketch_sql_functions(spark)`` exposes the KLL / HLL / CMS /
Bloom read surface to ``spark.sql`` users, mirroring
``register_sql_functions`` for the t-digest:

    SELECT event_type, hll_estimate(sketch) FROM sketches
    SELECT kll_quantile(sketch, 0.99) FROM kll_sketches
    SELECT cms_point_query(sketch, xxhash64(l_suppkey)) FROM cms, probes
    SELECT bloom_might_contain(sketch, xxhash64(k), xxhash64(k, 1)) ...

These register the SAME pandas UDFs the Column API uses (one decode per
distinct sketch per batch for the probe joins, SQL NULL semantics for
NULL sketches/params) — no second per-row implementation to drift.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.sketch_agg import (
    _bloom_might_contain_udf,
    _cms_point_query_udf,
    _hll_estimate_udf,
    _kll_cdf_udf,
    _kll_count_udf,
    _kll_quantile_udf,
)


def register_sketch_sql_functions(spark: SparkSession) -> None:
    spark.udf.register("kll_quantile", _kll_quantile_udf)
    spark.udf.register("kll_cdf", _kll_cdf_udf)
    spark.udf.register("kll_count", _kll_count_udf)
    spark.udf.register("hll_estimate", _hll_estimate_udf)
    spark.udf.register("cms_point_query", _cms_point_query_udf)
    spark.udf.register("bloom_might_contain", _bloom_might_contain_udf)
