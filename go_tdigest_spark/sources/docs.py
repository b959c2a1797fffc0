"""Deterministic synthetic `docs` corpus generator (FIXTURES.md F5).

Feeds the SHUFFLE-HEAVY scaling workload (minhash-LSH end-to-end:
signatures -> banded equijoin -> candidate pairs), complementing the
map-heavy token-sketch job of :mod:`.tokens` — together the two cover
both plan shapes the N -> 4N gate must evidence (BENCH/BASELINE.md).

Schema: ``doc string, text string``.  Every ODD row is a near-duplicate
of the preceding even row (a fixed fraction of its word slots
resampled), so the corpus has a known, non-trivial duplicate structure
and the LSH pair-emission path genuinely fires; pair counts are exactly
reproducible at any parallelism.

Determinism is partitioning-independent, same contract as
:mod:`.tokens`: rows come in fixed blocks of ``BLOCK_ROWS``; block ``b``
derives entirely from ``PCG64(SeedSequence([seed, b]))`` and near-dup
pairs never cross a block boundary, so table content depends only on
(seed, n_rows), never on parallelism.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

BLOCK_ROWS = 4096
VOCAB_WORDS = 30_000
MIN_WORDS, MAX_WORDS = 40, 160
DUP_MUTATE_FRAC = 0.05

ARROW_SCHEMA = pa.schema(
    [pa.field("doc", pa.string()), pa.field("text", pa.string())]
)
SPARK_SCHEMA = "doc string, text string"


def generate_docs_block(
    block_id: int, n_rows: int = BLOCK_ROWS, seed: int = 42
) -> pa.RecordBatch:
    """One deterministic block: even rows fresh, odd rows near-dups of
    the previous row with DUP_MUTATE_FRAC of word slots resampled."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, block_id]))
    base = block_id * BLOCK_ROWS
    lens = rng.integers(MIN_WORDS, MAX_WORDS + 1, size=n_rows)
    # Zipf word ids: realistic head-heavy shingle frequency (hot LSH
    # buckets exist, like a web corpus) while the 5-word shingles stay
    # discriminative
    total = int(lens.sum())
    words = (rng.zipf(1.3, size=total) % VOCAB_WORDS).astype(np.int64)
    bounds = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=bounds[1:])

    texts: list[str] = []
    prev: np.ndarray | None = None
    for i in range(n_rows):
        w = words[bounds[i] : bounds[i + 1]]
        if i % 2 == 1 and prev is not None:
            # near-dup of the previous doc: same length, a few slots
            # resampled (uses this row's own word draw as mutation pool)
            w = prev.copy()
            k = max(1, int(len(w) * DUP_MUTATE_FRAC))
            pos = rng.choice(len(w), size=k, replace=False)
            w[pos] = words[bounds[i] : bounds[i] + k]
        prev = w
        texts.append(" ".join(f"w{x}" for x in w))

    doc = pa.array([f"doc{base + i:012d}" for i in range(n_rows)])
    return pa.RecordBatch.from_arrays(
        [doc, pa.array(texts)], schema=ARROW_SCHEMA
    )


def docs_df(spark, n_rows: int, seed: int = 42, partitions: int | None = None):
    """Distributed deterministic generation via mapInArrow over block ids."""
    n_blocks = (n_rows + BLOCK_ROWS - 1) // BLOCK_ROWS
    if partitions is None:
        partitions = min(
            n_blocks, int(spark.sparkContext.defaultParallelism) * 2
        )
    blocks = spark.range(0, n_blocks, 1, partitions)

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for bid in batch.column(0).to_numpy():
                bid = int(bid)
                rows = min(BLOCK_ROWS, n_rows - bid * BLOCK_ROWS)
                if rows > 0:
                    yield generate_docs_block(bid, rows, seed)

    return blocks.mapInArrow(gen, SPARK_SCHEMA)


def write_docs(
    spark,
    path: str,
    n_rows: int,
    seed: int = 42,
    partitions: int | None = None,
) -> None:
    docs_df(spark, n_rows, seed, partitions).write.mode("overwrite").parquet(
        path
    )
