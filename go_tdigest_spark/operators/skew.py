"""Salted join for skewed keys.

A shuffle join places every row of one key in ONE reducer; at 100 TB a
hot key (a few users generating 1% of all events, one document template
stamped a billion times) turns that reducer into the job's critical path
while the other 999 executors idle.  AQE's runtime skew-split
(``spark.sql.adaptive.skewJoin``) mitigates *sort-merge* joins after a
stage materializes; this operator is the explicit, planner-independent
form — the same remedy the package's aggregation tree already applies to
digest merges (`_tree.py` salting) — usable when AQE is off, when the
join is not sort-merge, or when the skew is known ahead of time.

Mechanics: the FACT side gets a deterministic pseudo-random salt in
``[0, n_salts)`` hashed from the whole row, splitting each hot key's
rows across ``n_salts`` reducers; the DIM side is replicated once per
salt with ``explode(sequence(...))`` (rows multiply by n_salts — keep
the dim side the small one) and the join runs on ``keys + salt``.  The
result is row-for-row identical to the plain join — salting is pure
repartitioning, which the driver query pins against an unsalted SQL
oracle.

Picking n_salts: hot-key rows / n_salts should land near the size of an
average reducer's input; 8-32 covers most real skew.  Salting costs
n_salts x the dim side's shuffle volume — it is a targeted tool, not a
default (an unskewed join pays the replication for nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]

_SALT = "__salt"


def _hashable(dt) -> bool:
    """xxhash64 accepts everything except MapType (at any nesting)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _hashable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_hashable(f.dataType) for f in dt.fields)
    return True


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` with ``dim`` on equality of ``on``, spreading each
    fact key over ``n_salts`` reducers.  Supported ``how``: inner, left
    (semantics where every fact row must survive are exactly the plain
    join's; right/full would need the dim side de-replicated and are out
    of scope).  Output columns: fact columns, then dim's non-key
    columns — the same layout ``fact.join(dim, on, how)`` produces."""
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    missing = [c for c in on if c not in fact.columns or c not in dim.columns]
    if missing:
        raise ValueError(f"join keys missing from an input: {missing}")
    if _SALT in fact.columns or _SALT in dim.columns:
        raise ValueError(f"reserved column name in input: {_SALT}")
    # whole-row hash: deterministic (re-evaluation safe under task retry,
    # unlike rand()/monotonically_increasing_id), and any assignment is
    # correct — identical rows sharing a salt only weakens spreading for
    # exact-duplicate floods, which exact dedup removes upstream anyway.
    # Restricted to hashable columns: xxhash64 rejects MapType (and any
    # nesting of it), and the join keys are always hashable, so the salt
    # source is never empty.
    salt_cols = [
        f.name for f in fact.schema.fields if _hashable(f.dataType)
    ]
    salted_fact = fact.withColumn(
        _SALT, F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)).cast("int")
    )
    replicated_dim = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_fact.join(replicated_dim, on + [_SALT], how)
    return out.drop(_SALT)
