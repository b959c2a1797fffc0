"""Deterministic synthetic `tokens` table generator (FIXTURES.md F1).

Schema per BASELINE.json ``input_hint``:
    doc_id string, tokens array<int32>, n_tok int32, source string
with ``n_tok == size(tokens)`` (the per-row invariant) and deliberate
source skew (web 70%, books 15%, code 10%, wiki 4%, forum 1%) to
exercise the salted aggregation path.

Determinism is partitioning-independent: rows are generated in fixed
blocks of ``BLOCK_ROWS``; block ``b`` comes entirely from
``PCG64(SeedSequence([seed, b]))``, and a Spark partition covering an
arbitrary row range regenerates whole blocks and slices — so the table
content depends only on (seed, n_rows), never on parallelism.

Per-source n_tok distributions mirror the reference's accuracy suites
(/root/reference/tdigest_test.go): web=uniform (TestUniformDistribution),
books=gamma heavy skew (TestGammaDistribution), code=sequential ramp
(TestSequentialInsertion), wiki=strided (TestNonSequentialInsertion),
forum=constant-with-singleton (TestSingletonInACrowd).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

BLOCK_ROWS = 8192
VOCAB = 50257
SOURCES = np.array(["web", "books", "code", "wiki", "forum"])
_CUM = np.array([0.70, 0.85, 0.95, 0.99, 1.01])

ARROW_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)

SPARK_SCHEMA = (
    "doc_id string, tokens array<int>, n_tok int, source string"
)


def generate_block(
    block_id: int,
    n_rows: int = BLOCK_ROWS,
    seed: int = 42,
    include_tokens: bool = True,
    token_scale: float = 1.0,
) -> pa.RecordBatch:
    """Generate one deterministic block of the tokens table."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, block_id]))
    base = block_id * BLOCK_ROWS
    rows = np.arange(base, base + n_rows, dtype=np.int64)

    src_idx = np.searchsorted(_CUM, rng.random(n_rows), side="right")
    n_tok = np.empty(n_rows, dtype=np.int64)

    web = src_idx == 0
    n_tok[web] = rng.integers(1, 2049, size=int(web.sum()))
    books = src_idx == 1
    n_tok[books] = np.minimum(
        np.round(rng.gamma(0.1, 0.1, size=int(books.sum())) * 1e4).astype(np.int64)
        + 1,
        65536,
    )
    code = src_idx == 2
    n_tok[code] = 1 + (rows[code] % 10000)
    wiki = src_idx == 3
    n_tok[wiki] = 1 + (rows[wiki] * 1627) % 1000
    forum = src_idx == 4
    n_tok[forum] = np.where(rows[forum] % 10000 == 9999, 20, 10)

    if token_scale != 1.0:
        n_tok = np.maximum(1, (n_tok * token_scale).astype(np.int64))

    doc_id = pa.array([f"d{r:012d}" for r in rows], type=pa.string())
    source = pa.array(SOURCES[src_idx], type=pa.string())
    n_tok32 = pa.array(n_tok, type=pa.int32())

    if include_tokens:
        total = int(n_tok.sum())
        if total > np.iinfo(np.int32).max:
            # Arrow ListArray offsets are int32; a silent same-kind
            # cumsum cast would wrap negative and emit a corrupt tokens
            # column — fail loudly with the fix
            raise ValueError(
                f"block token total {total} exceeds int32 list offsets; "
                "lower token_scale or the rows-per-block"
            )
        toks = (rng.zipf(1.2, size=total) % VOCAB).astype(np.int32)
        offsets = np.zeros(n_rows + 1, dtype=np.int32)
        np.cumsum(n_tok, out=offsets[1:])
        tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(toks))
    else:
        empty = np.zeros(n_rows + 1, dtype=np.int32)
        tokens = pa.ListArray.from_arrays(
            pa.array(empty), pa.array(np.empty(0, dtype=np.int32))
        )

    return pa.RecordBatch.from_arrays(
        [doc_id, tokens, n_tok32, source], schema=ARROW_SCHEMA
    )


def tokens_df(
    spark,
    n_rows: int,
    seed: int = 42,
    include_tokens: bool = True,
    token_scale: float = 1.0,
    partitions: int | None = None,
):
    """Distributed deterministic generation via mapInArrow over block ids."""
    n_blocks = (n_rows + BLOCK_ROWS - 1) // BLOCK_ROWS
    if partitions is None:
        partitions = min(n_blocks, int(spark.sparkContext.defaultParallelism) * 2)
    blocks = spark.range(0, n_blocks, 1, partitions)

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for bid in batch.column(0).to_numpy():
                bid = int(bid)
                rows = min(BLOCK_ROWS, n_rows - bid * BLOCK_ROWS)
                if rows > 0:
                    yield generate_block(
                        bid, rows, seed, include_tokens, token_scale
                    )

    return blocks.mapInArrow(gen, SPARK_SCHEMA)


def write_tokens(
    spark,
    path: str,
    n_rows: int,
    seed: int = 42,
    include_tokens: bool = True,
    token_scale: float = 1.0,
    partitions: int | None = None,
) -> None:
    df = tokens_df(spark, n_rows, seed, include_tokens, token_scale, partitions)
    df.write.mode("overwrite").parquet(path)
