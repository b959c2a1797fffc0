"""Python UDTFs (Spark 4 table functions) over digest columns.

``register_udtfs(spark)`` registers:

  - ``td_centroids_t(digest)`` — explode a digest into (idx, mean, count,
    cum_count) rows: the lineage/debug view as a proper table function,
    usable as ``SELECT t.* FROM digests, LATERAL td_centroids_t(digest) t``;
  - ``td_quantile_table(digest, lo, hi, steps)`` — a quantile-profile
    table (q, value) for plotting/reporting.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql.functions import udtf

from .. import serde


@udtf(returnType="idx int, mean double, count long, cum_count long")
class CentroidsUDTF:
    def eval(self, digest):  # noqa: ANN001
        if digest is None:
            return
        d = serde.decode(bytes(digest))
        means, counts = d.centroids()
        cum = 0
        for i, (m, c) in enumerate(zip(means, counts)):
            cum += int(c)
            yield i, float(m), int(c), cum


@udtf(returnType="q double, value double")
class QuantileTableUDTF:
    def eval(self, digest, lo: float, hi: float, steps: int):  # noqa: ANN001
        if digest is None:
            return
        d = serde.decode(bytes(digest))
        qs = np.linspace(float(lo), float(hi), int(steps))
        vals = d.quantile(qs)
        for q, v in zip(qs, vals):
            yield float(q), float(v)


def register_udtfs(spark) -> None:
    spark.udtf.register("td_centroids_t", CentroidsUDTF)
    spark.udtf.register("td_quantile_table", QuantileTableUDTF)
