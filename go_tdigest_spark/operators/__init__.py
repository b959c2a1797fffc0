from .aggregate import build_partials, merge_partials, tdigest_agg

__all__ = ["build_partials", "merge_partials", "tdigest_agg"]
