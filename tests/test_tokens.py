"""Tokens-table generator (FIXTURES.md F1) + per-token sketch tests."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from go_tdigest_spark import serde
from go_tdigest_spark.operators import tdigest_agg
from go_tdigest_spark.sources.tokens import BLOCK_ROWS, generate_block, tokens_df


def test_block_determinism_and_invariants():
    a = generate_block(3)
    b = generate_block(3)
    assert a.equals(b)  # same block id -> identical bytes
    assert not a.equals(generate_block(4))
    n_tok = a.column(2).to_numpy()
    lens = np.asarray([len(x) for x in a.column(1).to_pylist()])
    assert (n_tok == lens).all()  # the per-row invariant
    assert (n_tok >= 1).all()
    toks = a.column(1).flatten().to_numpy()
    assert toks.min() >= 0 and toks.max() < 50257


def test_partitioning_independence(spark):
    h = []
    for parts in (3, 11):
        df = tokens_df(spark, 30_000, partitions=parts)
        h.append(
            tuple(
                df.selectExpr(
                    "sum(hash(doc_id, n_tok, source)) AS a",
                    "sum(aggregate(tokens, 0L, (x, y) -> x + y)) AS b",
                    "count(*) AS c",
                ).collect()[0]
            )
        )
    assert h[0] == h[1]


def test_source_skew_shape(spark):
    df = tokens_df(spark, 50_000, include_tokens=False, partitions=4)
    frac = {
        r["source"]: r["count"] / 50_000
        for r in df.groupBy("source").count().collect()
    }
    assert abs(frac["web"] - 0.70) < 0.02
    assert abs(frac["books"] - 0.15) < 0.02
    assert abs(frac["forum"] - 0.01) < 0.005


def test_per_token_sketch_accuracy(spark):
    n_rows = 4 * BLOCK_ROWS
    df = tokens_df(spark, n_rows, partitions=4)
    out = tdigest_agg(df, "tokens", by=["source"], explode_arrays=True).toPandas()

    # exact oracle: regenerate locally and flatten per source
    by_source: dict[str, list] = {}
    for blk in range(4):
        batch = generate_block(blk)
        srcs = batch.column(3).to_pylist()
        toks = batch.column(1).to_pylist()
        for s, t in zip(srcs, toks):
            by_source.setdefault(s, []).append(np.asarray(t))

    assert set(out["source"]) == set(by_source)
    for _, row in out.iterrows():
        flat = np.sort(np.concatenate(by_source[row["source"]]))
        d = serde.decode(bytes(row["digest"]))
        assert d.count == len(flat) == row["total_weight"]
        assert d.quantile(0.0) == flat[0]
        assert d.quantile(1.0) == flat[-1]
        for q in (0.1, 0.5, 0.9, 0.99):
            est = d.quantile(q)
            lo = np.searchsorted(flat, est, side="left") / len(flat)
            hi = np.searchsorted(flat, est, side="right") / len(flat)
            assert lo - 0.015 <= q <= hi + 0.015, (row["source"], q, est)


def test_n_tok_sketch_by_source(spark):
    df = tokens_df(spark, 30_000, include_tokens=False, partitions=6)
    out = tdigest_agg(df, "n_tok", by=["source"]).toPandas()
    stats = {
        r["source"]: r
        for r in df.groupBy("source")
        .agg(
            F.count("n_tok").alias("n"),
            F.min("n_tok").alias("mn"),
            F.max("n_tok").alias("mx"),
        )
        .collect()
    }
    for _, row in out.iterrows():
        d = serde.decode(bytes(row["digest"]))
        s = stats[row["source"]]
        assert d.count == s["n"]
        assert d.quantile(0.0) == s["mn"]
        assert d.quantile(1.0) == s["mx"]


# ---------------------------------------------------------------- F5 docs


def test_docs_block_determinism_and_dup_structure():
    from go_tdigest_spark.operators.dedup import py_words
    from go_tdigest_spark.sources.docs import generate_docs_block

    a = generate_docs_block(2)
    assert a.equals(generate_docs_block(2))
    assert not a.equals(generate_docs_block(5))
    texts = a.column(1).to_pylist()
    # odd rows are near-dups of the preceding even row: same length,
    # word overlap >= 1 - 2*DUP_MUTATE_FRAC (mutated slots may also
    # collide back, so >=)
    for i in (1, 101, 2001):
        w_even, w_odd = py_words(texts[i - 1]), py_words(texts[i])
        assert len(w_even) == len(w_odd)
        same = sum(x == y for x, y in zip(w_even, w_odd))
        assert same >= len(w_even) * 0.88
        assert same < len(w_even)  # mutation genuinely fired
    # consecutive even rows are unrelated
    w0, w2 = py_words(texts[0]), py_words(texts[2])
    assert sum(x == y for x, y in zip(w0, w2)) < min(len(w0), len(w2)) * 0.5


def test_docs_partitioning_independence_and_lsh_invariant(spark):
    from go_tdigest_spark.operators import minhash_lsh_pairs
    from go_tdigest_spark.operators.dedup import release_dedup_caches
    from go_tdigest_spark.sources.docs import docs_df

    counts = []
    for parts in (2, 7):
        docs = docs_df(spark, 9_000, partitions=parts)
        # content identical regardless of partitioning
        h = docs.selectExpr(
            "bit_xor(xxhash64(doc, text)) AS h", "count(*) AS n"
        ).collect()[0]
        pairs = minhash_lsh_pairs(
            docs, "text", "doc", n=5, n_hashes=32, bands=8, threshold=0.5
        )
        counts.append((h["h"], h["n"], pairs.count()))
        release_dedup_caches()
    assert counts[0] == counts[1]
    # the known duplicate structure surfaces: at least 80% of the 4500
    # planted near-dup pairs are candidate pairs at threshold 0.5
    assert counts[0][2] >= 0.8 * 4_500
