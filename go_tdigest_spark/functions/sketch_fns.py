"""SQL-callable reads for the auxiliary sketch family.

``register_sketch_sql_functions(spark)`` exposes the KLL / HLL / CMS /
Bloom / Theta read surface to ``spark.sql`` users, mirroring
``register_sql_functions`` for the t-digest:

    SELECT event_type, hll_estimate(sketch) FROM sketches
    SELECT kll_quantile(sketch, 0.99) FROM kll_sketches
    SELECT cms_point_query(sketch, xxhash64(l_suppkey)) FROM cms, probes
    SELECT bloom_might_contain(sketch, xxhash64(k), xxhash64(k, 1)) ...

These register the SAME pandas UDFs the Column API uses (one decode per
distinct sketch per batch for the probe joins) — no second per-row
implementation to drift.  The probe functions (``cms_point_query``,
``bloom_might_contain``) are registered as SQL functions that wrap the
raw UDF in the IDENTICAL coalesce/CASE mask the Column API applies: a
NULL-bearing int64 hash column otherwise arrives in pandas as lossy
float64 (53-bit mantissa vs ~2^63 xxhash64 values) and the raw kernel
refuses it loudly — SQL callers get true NULL-in/NULL-out semantics
instead of that error.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.sketch_agg import (
    _bloom_might_contain_udf,
    _cms_point_query_udf,
    _cms_total_udf,
    _fd_bound_udf,
    _fd_fnorm2_udf,
    _fd_rows_udf,
    _fd_singular_values_udf,
    _hll_estimate_udf,
    _kll_cdf_udf,
    _kll_count_udf,
    _kll_quantile_udf,
    _theta_estimate_udf,
    _theta_n_retained_udf,
    _theta_rse_bound_udf,
)


def register_sketch_sql_functions(spark: SparkSession) -> None:
    spark.udf.register("kll_quantile", _kll_quantile_udf)
    spark.udf.register("kll_cdf", _kll_cdf_udf)
    spark.udf.register("kll_count", _kll_count_udf)
    spark.udf.register("hll_estimate", _hll_estimate_udf)
    spark.udf.register("theta_estimate", _theta_estimate_udf)
    spark.udf.register("theta_n_retained", _theta_n_retained_udf)
    spark.udf.register("theta_rse_bound", _theta_rse_bound_udf)
    spark.udf.register("cms_total", _cms_total_udf)
    spark.udf.register("fd_rows", _fd_rows_udf)
    spark.udf.register("fd_fnorm2", _fd_fnorm2_udf)
    spark.udf.register("fd_spectral_bound", _fd_bound_udf)
    spark.udf.register("fd_singular_values", _fd_singular_values_udf)
    # sketch algebra (pair ops share the Column API's module-level UDFs)
    from ..operators.sketch_agg import (
        _bloom_intersect_pair_udf,
        _bloom_union_pair_udf,
        _cms_merge_pair_udf,
        _hll_intersect_udf,
        _hll_union_pair_udf,
        _kll_merge_pair_udf,
        _theta_a_not_b_pair_udf,
        _theta_intersect_pair_udf,
        _theta_union_pair_udf,
    )

    spark.udf.register("theta_union_pair", _theta_union_pair_udf)
    spark.udf.register("theta_intersect_pair", _theta_intersect_pair_udf)
    spark.udf.register("theta_a_not_b_pair", _theta_a_not_b_pair_udf)
    spark.udf.register("hll_union_pair", _hll_union_pair_udf)
    spark.udf.register("hll_intersect_estimate", _hll_intersect_udf)
    spark.udf.register("bloom_union_pair", _bloom_union_pair_udf)
    spark.udf.register("bloom_intersect_pair", _bloom_intersect_pair_udf)
    spark.udf.register("cms_merge_pair", _cms_merge_pair_udf)
    spark.udf.register("kll_merge_pair", _kll_merge_pair_udf)
    # raw probe kernels under private names; the public SQL names are
    # NULL-masking wrappers (coalesce keeps the hash column int64 even
    # when the CASE branch is batch-evaluated over NULL rows — the same
    # trick as the Column API wrappers in sketch_agg.py)
    spark.udf.register("_cms_point_query_raw", _cms_point_query_udf)
    spark.udf.register("_bloom_might_contain_raw", _bloom_might_contain_udf)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION cms_point_query(
            sk BINARY, h BIGINT) RETURNS BIGINT
        RETURN CASE WHEN sk IS NOT NULL AND h IS NOT NULL
               THEN _cms_point_query_raw(sk, coalesce(h, 0L)) END
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION bloom_might_contain(
            sk BINARY, h1 BIGINT, h2 BIGINT) RETURNS BOOLEAN
        RETURN CASE WHEN sk IS NOT NULL AND h1 IS NOT NULL
                    AND h2 IS NOT NULL
               THEN _bloom_might_contain_raw(
                        sk, coalesce(h1, 0L), coalesce(h2, 0L)) END
        """
    )
