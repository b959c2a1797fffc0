"""Shared salted tree-merge for mergeable-sketch partials.

One reduction shape serves every sketch in the library (t-digest, HLL,
CMS, Bloom, KLL): stage-1 emits one partial row per (input partition x
group); this helper merges them down to one row per group with *bounded
reducer fan-in* at every level, which is what keeps a global or hot-key
merge from funnelling 100k partials into a single python worker.

Salt derivation is deterministic at every level (advisor finding,
round 1): level 0 uses ``spark_partition_id() % n_salts`` — a hard bound
because each input partition contributes at most one partial per group —
and each subsequent level re-buckets the *carried* salt via integer
division by ``fanin``, so the per-reducer fan-in is exactly ``<= fanin``
at every level, not just in expectation under hash partitioning.

Merge associativity (reference: tdigest.go:262-272 for the digest; HLL
register-max / CMS counter-add / Bloom bit-or are trivially associative)
is what makes tree depth irrelevant to correctness.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def tree_merge(
    partials: DataFrame,
    by: Sequence[str],
    schema: StructType,
    merge_fn: Callable[[pd.DataFrame], pd.DataFrame],
    fanin: int | None,
    n_units: int | None = None,
) -> DataFrame:
    """Merge partial rows to one row per group.

    ``merge_fn(pdf) -> list`` must return ONE plain row (a list of
    values in ``schema`` column order) for the group slice it receives
    (it may receive extra columns, e.g. the salt — select what it
    needs).  Returning a list instead of a 1-row DataFrame lets the
    merge stage assemble a SINGLE DataFrame per task: at fine groupings
    (hourly windows — 720 groups) the per-group DataFrame construction
    + concat was most of the merge stage's wall time.  ``fanin=None``
    disables salting (single-level merge).

    ``n_units``: upper bound on partials per group.  The default (None)
    assumes the stage-1 builder invariant — at most one partial per
    (input partition, group), true for mapInArrow builder output — and
    sizes/salts level 0 by partition id (hard bound).  Partials read
    back FROM STORAGE break that invariant (the parquet reader packs
    many small files into one partition), so those callers must pass the
    actual partial row count: level 0 then salts by a hash of a unique
    row id (uniform in expectation over >= fanin rows per salt), and
    every later level re-buckets the carried salt deterministically
    (hard bound again, since level 0 leaves one row per (group, salt)).
    """
    by = list(by)
    columns = [f.name for f in schema.fields]
    if fanin is not None and fanin < 2:
        raise ValueError("fanin must be >= 2")

    def grouped_merge(
        df: DataFrame, group_cols: list[str], out_schema: StructType,
        fn: Callable[[pd.DataFrame], pd.DataFrame],
        n_upstream: int | None = None,
    ) -> DataFrame:
        """One-row-per-group merge via repartition + mapInPandas.

        Same co-location guarantee as groupBy().applyInPandas (hash
        partitioning on the group columns), but ONE python call per
        shuffle partition instead of one per group — Spark's per-group
        pandas machinery costs ~2-4 ms/group, which dominates when a
        fine-grained grouping (hourly windows, per-user keys) produces
        thousands of tiny groups.  Per-group row order stays shuffle
        arrival order either way (merge associativity makes it moot).

        Exact-key discipline (advisor r3, medium): a long key column
        with ANY null in a partition arrives from Arrow->pandas as lossy
        float64 (the documented round-2 pandas trap), so distinct int64
        keys beyond 2^53 could collide — silently merging two groups —
        and the merged row's key VALUE itself could come back corrupted.
        Two measures: (1) the pandas-side split groups on a JVM-computed
        JSON encoding of the key tuple (injective over distinct key
        tuples, rendered from exact values), never on pandas key
        columns; (2) the stage runs as mapInArrow and key columns are
        handed to ``fn`` as exact python objects (object dtype via
        ``to_pylist``), so ``pdf[key].iloc[0]`` in every merge_fn reads
        the true value.  Non-key columns (sketch bytes, counts —NOT
        NULL by construction) keep the plain pandas conversion.
        """
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_type

        gkey = "_gkey"
        # Float/double group keys: normalize -0.0 to +0.0 BEFORE both
        # the exchange and the JSON rendering.  Spark's own groupBy
        # folds them into one group (NormalizeFloatingNumbers), but
        # to_json renders them differently ({"k":0.0} vs {"k":-0.0}),
        # so without this a double `by` column containing both zeros
        # would emit two digest rows for one logical group.  The SQL
        # comparison -0.0 == 0.0 is TRUE, so the when() rewrites
        # exactly the two zeros; NaN/null fall through unchanged.
        from pyspark.sql.types import DoubleType, FloatType

        for f in df.schema.fields:
            if f.name in group_cols and isinstance(
                f.dataType, (FloatType, DoubleType)
            ):
                df = df.withColumn(
                    f.name,
                    F.when(
                        F.col(f.name) == 0.0, F.lit(0.0).cast(f.dataType)
                    ).otherwise(F.col(f.name)),
                )
        # Merge-exchange width is DERIVED from the upstream partition
        # count instead of pinned to spark.sql.shuffle.partitions: the
        # partial tables carry at most (upstream partitions x groups)
        # rows of O(compression) bytes, so min(shuffle.partitions,
        # upstream) reducers is always enough — at scale upstream >>
        # shuffle.partitions and the width is unchanged, while a small
        # input stops scheduling one python-worker task per configured
        # shuffle partition for a handful of partial rows (guide §2.2:
        # size the exchange from the data, not the core count).
        # gkey is computed AFTER the exchange so the JSON rendering is
        # not serialized through the shuffle alongside the raw keys.
        # Default to_json truncates timestamps to MILLISECONDS (.SSS) —
        # explicit micro-precision formats keep the encoding injective
        # for sub-millisecond-distinct timestamp keys (Spark timestamps
        # are exactly microsecond-precision, so 6 fractional digits are
        # lossless).
        try:
            n_shuffle = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        except (TypeError, ValueError):
            n_shuffle = df.sparkSession.sparkContext.defaultParallelism
        if n_upstream is None:
            n_upstream = df.rdd.getNumPartitions()
        n_target = max(1, min(n_shuffle, n_upstream))
        dist = df.repartition(
            n_target, *[F.col(c) for c in group_cols]
        ).withColumn(
            gkey,
            F.to_json(
                F.struct(*[F.col(c) for c in group_cols]),
                {
                    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
                    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
                },
            ),
        )
        in_fields = dist.schema.fields
        key_set = set(group_cols)
        arrow_out = pa.schema(
            [
                pa.field(f.name, to_arrow_type(f.dataType))
                for f in out_schema.fields
            ]
        )

        out_columns = [f.name for f in out_schema.fields]

        def run(batches):
            chunks = []
            for batch in batches:
                if batch.num_rows == 0:
                    continue
                cols = {}
                for i, f in enumerate(in_fields):
                    col = batch.column(i)
                    if f.name in key_set:
                        cols[f.name] = pd.Series(col.to_pylist(), dtype=object)
                    else:
                        cols[f.name] = col.to_pandas()
                chunks.append(pd.DataFrame(cols))
            if not chunks:
                return
            whole = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            )
            # one plain row per group, ONE DataFrame per task (fn never
            # reads gkey, so the group slice is passed as-is)
            rows = [
                fn(grp)
                for _, grp in whole.groupby(gkey, dropna=False, sort=False)
            ]
            if rows:
                # column-wise OBJECT-dtype assembly: pd.DataFrame(rows)
                # would re-infer dtypes — int64 keys beyond 2^53 beside
                # NULLs become lossy float64, timestamp/decimal keys
                # fail the Arrow cast — while object columns convert
                # through the explicit schema value-exactly
                data = {
                    name: pd.Series(col, dtype=object)
                    for name, col in zip(out_columns, zip(*rows))
                }
                yield pa.RecordBatch.from_pandas(
                    pd.DataFrame(data),
                    schema=arrow_out,
                    preserve_index=False,
                )

        return dist.mapInArrow(run, out_schema)

    if not fanin:
        n_parts = 0
    elif n_units is not None:
        n_parts = n_units
    else:
        n_parts = partials.rdd.getNumPartitions()
    if fanin:
        salted_schema = StructType(
            [StructField("_salt", LongType(), False)] + list(schema.fields)
        )

        def merge_salted(pdf: pd.DataFrame) -> list:
            return [pdf["_salt"].iloc[0]] + merge_fn(pdf[columns])

        first = True
        while n_parts > fanin:
            n_salts = int(math.ceil(n_parts / fanin))
            if first and n_units is not None:
                # storage-read partials: rows per (partition, group) are
                # unbounded, so spread by hashed unique row id instead
                salt = F.pmod(
                    F.xxhash64(F.monotonically_increasing_id()),
                    F.lit(n_salts),
                ).cast("long")
            elif first:
                # hard bound: partition ids 0..P-1 map round-robin onto
                # salts, and each input partition holds <=1 partial/group
                salt = (F.spark_partition_id() % F.lit(n_salts)).cast("long")
            else:
                # hard bound: previous level left exactly one row per
                # (group, salt<n_parts); consecutive-salt blocks of size
                # `fanin` collapse into one reducer
                salt = F.floor(F.col("_salt") / F.lit(fanin)).cast("long")
            first = False
            partials = grouped_merge(
                partials.withColumn("_salt", salt),
                by + ["_salt"],
                salted_schema,
                merge_salted,
                n_upstream=n_parts,
            )
            n_parts = n_salts

    if by:
        return grouped_merge(
            partials, by, schema, lambda pdf: merge_fn(pdf[columns]),
            # after salt levels the upstream width is the last level's
            # reducer count; fanin=None probes the plan directly
            n_upstream=n_parts if fanin else None,
        )
    # global aggregate: single group (applyInPandas needs a DataFrame)
    return partials.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda pdf: pd.DataFrame([merge_fn(pdf[columns])], columns=columns),
        schema,
    )
