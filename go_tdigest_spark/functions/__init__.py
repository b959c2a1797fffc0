from .sketch_fns import register_sketch_sql_functions
from .udtf_fns import register_udtfs
from .tdigest_fns import (
    register_sql_functions,
    td_cdf,
    td_cdf_col,
    td_centroids,
    td_count,
    td_from_ref_bytes,
    td_ks_distance,
    td_merge_pair,
    td_ncentroids,
    td_quantile,
    td_quantile_col,
    td_to_ref_bytes,
    td_trimmed_mean,
)

__all__ = [
    "register_udtfs",
    "register_sql_functions",
    "register_sketch_sql_functions",
    "td_cdf",
    "td_cdf_col",
    "td_centroids",
    "td_count",
    "td_from_ref_bytes",
    "td_ks_distance",
    "td_merge_pair",
    "td_ncentroids",
    "td_quantile",
    "td_quantile_col",
    "td_to_ref_bytes",
    "td_trimmed_mean",
]
