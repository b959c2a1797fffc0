"""Deduplication operators for training-data pipelines.

All candidate generation is shuffle-on-key (inverted shingle index /
LSH band buckets), never a cross join — the shapes that survive 100 TB:

  - exact dedup: hash groupBy on the text key (map-side combine free);
  - n-gram Jaccard: explode distinct shingles -> self-equijoin on the
    shingle -> per-pair intersection counts (the classic inverted-index
    similarity join; shuffle keys are shingles, so hot shingles can be
    frequency-capped via ``max_doc_freq``);
  - MinHash + LSH: per-doc signature (pure Spark expressions), banded
    bucket join for candidates, signature-agreement estimate as filter;
  - SimHash: vectorized numpy (mapInArrow) 64-bit signatures, banded by
    16-bit chunks for candidate pairs, hamming distance via bit_count;
  - embedding near-dup: cosine over normalized vectors (see ann.py for
    the bucketed form).

MinHash / shingle / fingerprint hashing is plain integer arithmetic so a
DuckDB oracle can replicate it bit-for-bit; the SQL generators live
beside the Spark expressions.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MH_PRIME = 2_147_483_647  # 2^31 - 1
FP_MOD = 1_000_000_007
FP_BASE = 31


def minhash_params(n_hashes: int, seed: int = 7) -> tuple[list[int], list[int]]:
    rng = np.random.default_rng(seed)
    a = (rng.integers(1, MH_PRIME - 1, size=n_hashes)).tolist()
    b = (rng.integers(0, MH_PRIME - 1, size=n_hashes)).tolist()
    return a, b


# ------------------------------------------------------------- shingles


def words_frag(col: str, dialect: str) -> str:
    if dialect == "spark":
        return f"split(trim(lower({col})), '\\\\s+')"
    return f"string_split_regex(trim(lower({col})), '\\s+')"


def shingles_frag(col: str, n: int, dialect: str) -> str:
    """Distinct word n-gram shingles (n=1: distinct words)."""
    w = words_frag(col, dialect)
    if dialect == "spark":
        if n == 1:
            return f"array_distinct({w})"
        joined = " || ' ' || ".join(f"element_at(_w, i + {j})" for j in range(n))
        return (
            f"CASE WHEN size({w}) < {n} THEN array() ELSE "
            f"array_distinct(transform(sequence(1, size({w}) - {n - 1}), "
            f"i -> {joined.replace('_w', w)})) END"
        )
    if n == 1:
        return f"list_distinct({w})"
    joined = " || ' ' || ".join(f"({w})[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len({w}) < {n} THEN [] ELSE "
        f"list_distinct(list_transform(generate_series(1, len({w}) - {n - 1}), "
        f"i -> {joined})) END"
    )


def shingle_hash_frag(var: str, dialect: str) -> str:
    """Polynomial hash of one shingle string (lambda var ``var``)."""
    if dialect == "spark":
        return (
            f"aggregate(transform(sequence(1, length({var})), "
            f"i -> ascii(substring({var}, i, 1))), 0L, "
            f"(acc, c) -> (acc * {FP_BASE} + c) % {FP_MOD})"
        )
    return (
        f"list_reduce(list_prepend(0::BIGINT, list_transform("
        f"generate_series(1, length({var})), "
        f"i -> ascii(substr({var}, i, 1))::BIGINT)), "
        f"(acc, c) -> (acc * {FP_BASE} + c) % {FP_MOD})"
    )


# ------------------------------------------------------------ exact dedup


def dedup_exact_stats(df: DataFrame, text_col: str, by: list[str]) -> DataFrame:
    """Per-group exact-duplicate statistics (hash groupBy, fully
    Catalyst-planned; at scale this is one partial-aggregated shuffle)."""
    return df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(text_col).alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct(text_col)).alias("n_dup_docs"),
    )


def dedup_exact_keep_first(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Keep the lowest-id doc per identical text (exact dedup)."""
    keep = df.groupBy(text_col).agg(F.min(id_col).alias(id_col))
    return df.join(keep, [text_col, id_col], "left_semi")


# --------------------------------------------------------- ngram jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 1,
    threshold: float = 0.5,
    max_doc_freq: float | None = 0.1,
) -> DataFrame:
    """Jaccard similarity over distinct word n-gram sets, computed with
    an inverted-index self-join (shuffle key = shingle).

    ``max_doc_freq``: shingles present in more than this fraction of
    documents are dropped *before* the join (from both the index and the
    set sizes, so the Jaccard is exact over the rare-shingle universe).
    Ubiquitous shingles carry no dedup signal but quadratically blow up
    the inverted-index join — df-capping is what makes this shape viable
    at corpus scale.  ``None`` disables the cap."""
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.expr(shingles_frag(text_col, n, "spark")).alias("sh"),
    ).where(F.size("sh") > 0)
    inv = sh.select("doc", F.explode("sh").alias("s"))
    if max_doc_freq is not None:
        n_docs = sh.select(F.count(F.lit(1)).alias("nd"))
        freq = inv.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
        keep = freq.crossJoin(F.broadcast(n_docs)).where(
            F.col("df") <= F.col("nd") * max_doc_freq
        )
        inv = inv.join(F.broadcast(keep.select("s")), "s", "left_semi")
    sizes = inv.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    a, b = inv.alias("a"), inv.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs_sql(
    table: str,
    text_col: str,
    id_col: str,
    n: int = 1,
    threshold: float = 0.5,
    max_doc_freq: float | None = 0.1,
) -> str:
    sh_frag = shingles_frag(text_col, n, "duck")
    df_filter = ""
    if max_doc_freq is not None:
        df_filter = f"""
            , keep AS (
                SELECT s FROM inv GROUP BY s
                HAVING count(*) <= (SELECT count(*) FROM grams2) * {max_doc_freq}
            ), inv2 AS (
                SELECT inv.doc, inv.s FROM inv JOIN keep USING (s)
            )"""
        inv_name = "inv2"
    else:
        inv_name = "inv"
    return f"""
        WITH grams AS (
            SELECT {id_col} AS doc, {sh_frag} AS sh FROM {table}
        ), grams2 AS (
            SELECT doc, sh FROM grams WHERE len(sh) > 0
        ), inv AS (
            SELECT doc, unnest(sh) AS s FROM grams2
        ){df_filter}, sizes AS (
            SELECT doc, count(*) AS sz FROM {inv_name} GROUP BY doc
        ), inter AS (
            SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
            FROM {inv_name} a JOIN {inv_name} b ON a.s = b.s AND a.doc < b.doc
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc = doc_a
        JOIN sizes sb ON sb.doc = doc_b
        WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) >= {threshold}
    """


# ------------------------------------------------------------- minhash


def minhash_signature_col(
    text_col: str, n: int, n_hashes: int, seed: int = 7
) -> Column:
    """MinHash signature as array<long>: per permutation i,
    min over shingles of (a_i * h(s) + b_i) mod p.

    Shingle hashes are computed once and threaded through a named lambda
    argument (a single ``transform`` over a wrapping array) so the 16+
    permutations reuse them instead of re-hashing per permutation."""
    a, b = minhash_params(n_hashes, seed)
    sh = shingles_frag(text_col, n, "spark")
    hs = f"transform({sh}, s -> ({shingle_hash_frag('s', 'spark')}))"
    mins = ", ".join(
        f"array_min(transform(hs, h -> (({ai}L * h + {bi}L) % {MH_PRIME})))"
        for ai, bi in zip(a, b)
    )
    # element_at(transform(array(hs), ...), 1): binds `hs` once per row
    return F.expr(
        f"CASE WHEN size({sh}) = 0 THEN NULL ELSE "
        f"element_at(transform(array({hs}), hs -> array({mins})), 1) END"
    )


def minhash_signature_sql(
    table: str,
    text_col: str,
    id_col: str,
    n: int,
    n_hashes: int,
    seed: int = 7,
    as_string: bool = False,
) -> str:
    """``as_string=True`` emits the signature as a comma-joined string —
    the scalar form external comparators (the driver's canonicalizer)
    can sort and hash; the array form stays the internal default."""
    a, b = minhash_params(n_hashes, seed)
    sh = shingles_frag(text_col, n, "duck")
    mins = ", ".join(
        f"list_min(list_transform(hs, h -> ({ai} * h + {bi}) % {MH_PRIME}))"
        for ai, bi in zip(a, b)
    )
    inner = f"""
        WITH grams AS (
            SELECT {id_col} AS doc, {sh} AS sh FROM {table}
        ), hashed AS (
            SELECT doc,
                   list_transform(sh, s -> ({shingle_hash_frag('s', 'duck')})) AS hs
            FROM grams WHERE len(sh) > 0
        )
        SELECT doc, [{mins}] AS sig FROM hashed
    """
    if not as_string:
        return inner
    return f"""
        SELECT doc, array_to_string(sig, ',') AS sig FROM ({inner})
    """


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    n_hashes: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Vectorized MinHash signatures (mapInArrow + NumPy).

    Computes bit-identical results to the pure-SQL formulation in
    ``minhash_signature_sql`` (polynomial codepoint hash + affine
    permutations mod 2^31-1, all exact int64 arithmetic), but ~30x
    faster: per Arrow batch, every shingle of every doc is hashed with
    ``max_shingle_len`` column-wise vectorized passes, and per-doc minima
    come from one ``np.minimum.reduceat`` per permutation.  Duplicate
    shingles need no dedup — min() is idempotent.
    """
    import pyarrow as pa

    a_params, b_params = minhash_params(n_hashes, seed)
    a_vec = np.array(a_params, dtype=np.int64)
    b_vec = np.array(b_params, dtype=np.int64)

    id_field = df.select(id_col).schema.fields[0]
    id_dt = id_field.dataType.simpleString()
    pruned = df.select(id_col, text_col).where(F.col(text_col).isNotNull())

    def shingles_of(text: str) -> list[str]:
        words = text.strip().lower().split()
        if n == 1:
            return words
        if len(words) < n:
            return []
        return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]

    def gen(batches):
        import re  # noqa: F401

        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            doc_ids = []
            all_shingles: list[str] = []
            doc_bounds = [0]
            for i, t in enumerate(texts):
                sh = shingles_of(t)
                if not sh:
                    continue
                doc_ids.append(ids[i])
                all_shingles.extend(sh)
                doc_bounds.append(doc_bounds[-1] + len(sh))
            if not doc_ids:
                continue
            # one encode for the whole batch; codepoints == SQL ascii()
            lens = np.fromiter(
                (len(s) for s in all_shingles), dtype=np.int64, count=len(all_shingles)
            )
            cps = np.frombuffer(
                "".join(all_shingles).encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            offs = np.zeros(lens.size + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            # column-wise polynomial hash: h = (h*31 + cp) % M
            h = np.zeros(lens.size, dtype=np.int64)
            max_len = int(lens.max())
            for j in range(max_len):
                active = lens > j
                idx = offs[:-1][active] + j
                h[active] = (h[active] * FP_BASE + cps[idx]) % FP_MOD
            # affine permutations + per-doc segment minima
            starts = np.asarray(doc_bounds[:-1])
            sig = np.empty((len(doc_ids), a_vec.size), dtype=np.int64)
            for p in range(a_vec.size):
                hp = (a_vec[p] * h + b_vec[p]) % MH_PRIME
                sig[:, p] = np.minimum.reduceat(hp, starts)
            offsets32 = np.arange(
                0, (len(doc_ids) + 1) * a_vec.size, a_vec.size, dtype=np.int32
            )
            sig_arr = pa.ListArray.from_arrays(
                pa.array(offsets32), pa.array(sig.ravel(), type=pa.int64())
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(doc_ids), sig_arr], names=["doc", "sig"]
            )

    return pruned.mapInArrow(gen, f"doc {id_dt}, sig array<long>")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    seed: int = 7,
) -> DataFrame:
    """LSH-banded candidate pairs with signature-agreement estimate.

    Shape at scale: explode to (band_idx, band_key) -> equijoin within
    buckets -> estimate filter.  Never a cross join; hot buckets can be
    frequency-capped upstream.
    """
    rows = n_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n, n_hashes, seed)
    band_arr = F.expr(
        "transform(sequence(0, {b} - 1), i -> "
        "struct(i AS band, concat_ws(',', slice(sig, i * {r} + 1, {r})) AS key))".format(
            b=bands, r=rows
        )
    )
    banded = sigs.select("doc", "sig", F.explode(band_arr).alias("bk")).select(
        "doc", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.expr(
        f"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / {n_hashes}"
    )
    return (
        cand.withColumn("est_jaccard", F.round(est, 4))
        .where(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def minhash_lsh_pairs_sql(
    table: str,
    text_col: str,
    id_col: str,
    n: int = 2,
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    seed: int = 7,
) -> str:
    rows = n_hashes // bands
    sig_sql = minhash_signature_sql(table, text_col, id_col, n, n_hashes, seed)
    band_keys = ", ".join(
        "struct_pack(band := {i}, key := array_to_string(sig[{lo}:{hi}], ','))".format(
            i=i, lo=i * rows + 1, hi=(i + 1) * rows
        )
        for i in range(bands)
    )
    return f"""
        WITH sigs AS ({sig_sql}),
        banded AS (
            SELECT doc, sig, unnest([{band_keys}]) AS bk FROM sigs
        ), cand AS (
            SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
                   a.sig AS sig_a, b.sig AS sig_b
            FROM banded a JOIN banded b
              ON a.bk.band = b.bk.band AND a.bk.key = b.bk.key
             AND a.doc < b.doc
        )
        SELECT doc_a, doc_b,
               round(len(list_filter(list_zip(sig_a, sig_b),
                     z -> z[1] = z[2])) * 1.0 / {n_hashes}, 4) AS est_jaccard
        FROM cand
        WHERE round(len(list_filter(list_zip(sig_a, sig_b),
                    z -> z[1] = z[2])) * 1.0 / {n_hashes}, 4) >= {threshold}
    """


# --------------------------------------------- LSH-verified jaccard dedup


def minhash_jaccard_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    n_hashes: int = 16,
    bands: int = 4,
    est_floor: float = 0.3,
    threshold: float = 0.5,
    seed: int = 7,
) -> DataFrame:
    """The production dedup shape: MinHash-LSH candidate generation, then
    *exact* Jaccard verification computed only on the candidate pairs.

    All-pairs exact Jaccard (ngram_jaccard_pairs) is O(pairs-sharing-a-
    shingle) and melts on self-similar corpora; this composition is
    O(collisions) end to end and is what you run at 100 TB.  Output is
    exact Jaccard over the full distinct-shingle sets (no df-capping
    needed — per-pair verification touches each candidate's own set
    only)."""
    import pandas as pd

    cand = minhash_lsh_pairs(
        df, text_col, id_col, n, n_hashes, bands, est_floor, seed
    )
    texts = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("txt"))
    ta = texts.select(F.col("doc").alias("doc_a"), F.col("txt").alias("txt_a"))
    tb = texts.select(F.col("doc").alias("doc_b"), F.col("txt").alias("txt_b"))
    joined = cand.join(ta, "doc_a").join(tb, "doc_b").select(
        "doc_a", "doc_b", "txt_a", "txt_b"
    )

    # exact jaccard per candidate pair in Python sets — candidates are few
    # by construction, and set intersection on two docs' shingles is far
    # cheaper than materializing shingle arrays for the whole corpus
    # through interpreted expressions
    def sh_set(text: str) -> set:
        words = text.strip().lower().split()
        if n == 1:
            return set(words)
        if len(words) < n:
            return set()
        return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}

    def verify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            jac = []
            for a, b in zip(pdf["txt_a"], pdf["txt_b"]):
                sa = sh_set(a)
                sb = sh_set(b)
                inter = len(sa & sb)
                union = len(sa) + len(sb) - inter
                jac.append(inter / union if union else 0.0)
            yield pd.DataFrame(
                {"doc_a": pdf["doc_a"], "doc_b": pdf["doc_b"], "raw": jac}
            )

    id_dt = df.select(id_col).schema.fields[0].dataType.simpleString()
    raw = joined.mapInPandas(
        verify, f"doc_a {id_dt}, doc_b {id_dt}, raw double"
    )
    # round/threshold in Spark so HALF_UP semantics match the SQL oracle
    # exactly (python's round() is banker's rounding)
    return (
        raw.withColumn("jaccard", F.round("raw", 4))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_jaccard_dedup_sql(
    table: str,
    text_col: str,
    id_col: str,
    n: int = 2,
    n_hashes: int = 16,
    bands: int = 4,
    est_floor: float = 0.3,
    threshold: float = 0.5,
    seed: int = 7,
) -> str:
    cand_sql = minhash_lsh_pairs_sql(
        table, text_col, id_col, n, n_hashes, bands, est_floor, seed
    )
    sh = shingles_frag(text_col, n, "duck")
    return f"""
        WITH cand AS ({cand_sql}),
        grams AS (
            SELECT {id_col} AS doc, {sh} AS sh FROM {table}
        ), grams2 AS (
            SELECT doc, sh FROM grams WHERE len(sh) > 0
        )
        SELECT doc_a, doc_b,
               round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
                     (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))),
                     4) AS jaccard
        FROM cand
        JOIN grams2 sa ON sa.doc = doc_a
        JOIN grams2 sb ON sb.doc = doc_b
        WHERE round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
                    (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))),
                    4) >= {threshold}
    """


# -------------------------------------------------------------- simhash


def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, seed: int = 11
) -> DataFrame:
    """64-bit SimHash over word tokens, vectorized numpy inside mapInArrow.

    No SQL oracle (crc32-based token hashing); properties are pinned in
    tests instead (near-dup text -> small hamming distance).
    """
    import pyarrow as pa

    id_field = df.select(id_col).schema.fields[0]
    out_type = {
        "bigint": pa.int64(),
        "string": pa.string(),
    }[id_field.dataType.simpleString()]
    out_schema = pa.schema(
        [pa.field("doc", out_type), pa.field("simhash", pa.int64())]
    )

    pruned = df.select(id_col, text_col).where(F.col(text_col).isNotNull())

    def gen(batches):
        import zlib

        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1).to_pylist()
            out = np.empty(len(texts), dtype=np.int64)
            for i, t in enumerate(texts):
                words = t.lower().split()
                if not words:
                    out[i] = 0
                    continue
                h32 = np.fromiter(
                    (zlib.crc32((w + str(seed)).encode()) for w in set(words)),
                    dtype=np.uint64,
                )
                # widen to 64 bits (splitmix-style)
                h = (h32 * np.uint64(0x9E3779B97F4A7C15)) ^ (h32 << np.uint64(31))
                bits = (h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
                sig = np.uint64(0)
                for k in np.nonzero(votes >= 0)[0]:
                    sig |= np.uint64(1) << np.uint64(k)
                out[i] = np.int64(sig.astype(np.int64))
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out, type=pa.int64())], schema=out_schema
            )

    return pruned.mapInArrow(gen, f"doc {id_field.dataType.simpleString()}, simhash long")


def simhash_candidate_pairs(
    sigs: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Banded candidate generation over four 16-bit chunks.

    Pigeonhole guarantees a shared chunk only for hamming distance d <= 3
    (4 chunks, so d >= 4 can place one differing bit in every chunk) —
    hence the default.  Passing ``max_hamming`` above 3 widens the
    *filter* but candidate recall for d in [4, max_hamming] is partial:
    only pairs that happen to share an identical chunk are found."""
    chunks = F.expr(
        "transform(sequence(0, 3), i -> "
        "struct(i AS band, shiftright(simhash, i * 16) & 65535 AS key))"
    )
    banded = sigs.select("doc", "simhash", F.explode(chunks).alias("bk")).select(
        "doc", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .where(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------------- embedding near-dup


def embedding_similar_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.9,
) -> DataFrame:
    """Cosine near-duplicate pairs (exact, all-pairs).

    Plan shape: the (small) corpus matrix is broadcast once; each task
    computes one row-block x full-matrix BLAS product and emits only the
    pairs over threshold.  All-pairs cosine is inherently O(N^2) — at
    corpus scale this exact form is the *verification* stage applied to
    LSH candidates (ann.lsh_ann_topk / minhash_lsh_pairs generate the
    candidates); here it doubles as the oracle-checkable exact operator.
    """
    import pyarrow as pa

    pdf = df.select(F.col(id_col).alias("doc"), F.col(vec_col).alias("v")).toPandas()
    ids = pdf["doc"].to_numpy()
    mat = np.vstack(pdf["v"].map(lambda x: np.asarray(x, dtype=np.float64)))
    nrm = np.sqrt((mat * mat).sum(axis=1))
    keep = nrm > 0
    ids, mat, nrm = ids[keep], mat[keep], nrm[keep]
    unit = mat / nrm[:, None]

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((ids, unit))
    n = len(ids)
    block = 256
    blocks = spark.range(0, (n + block - 1) // block, 1)

    def gen(batches):
        b_ids, b_unit = bc.value
        for batch in batches:
            for blk in batch.column(0).to_numpy():
                lo = int(blk) * block
                hi = min(lo + block, len(b_ids))
                sims = b_unit[lo:hi] @ b_unit.T  # BLAS
                sims = np.round(sims, 4)
                for i in range(lo, hi):
                    row = sims[i - lo]
                    js = np.nonzero((row >= threshold) & (b_ids > b_ids[i]))[0]
                    if js.size:
                        yield pa.RecordBatch.from_arrays(
                            [
                                pa.array(
                                    np.full(js.size, b_ids[i]), type=pa.int64()
                                ),
                                pa.array(b_ids[js], type=pa.int64()),
                                pa.array(row[js], type=pa.float64()),
                            ],
                            names=["doc_a", "doc_b", "cosine"],
                        )

    return blocks.mapInArrow(gen, "doc_a long, doc_b long, cosine double")
