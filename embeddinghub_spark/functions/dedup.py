"""Deduplication operators for LLM training-data pipelines (beyond
the reference's surface — BASELINE.json: "dedup, similarity search").

Strategies, all shuffle-disciplined for 100 TB:

- exact: hash-groupBy on a canonical fingerprint — one shuffle on the
  16-byte hash, never on the document text.
- MinHash: per-doc signature of K independent min-hashes over token
  shingles; banding → bucket-join for candidate pairs (classic
  MMDS/LSH). Signature computation is explode-free (array exprs),
  candidate generation shuffles only (band_hash) pairs.
- SimHash: 64-bit majority fingerprint of token hashes; near-dups =
  buckets sharing the fingerprint (or its bands for Hamming<k).
- n-gram Jaccard: exact pairwise similarity *within candidate
  buckets only* — never all-pairs.
- embedding cosine: near-dup via LSH bucket + cosine threshold
  (functions.vector).

Hash function is md5-prefix → BIGINT everywhere: deterministic,
portable to any SQL oracle engine (DuckDB lacks xxhash64).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from embeddinghub_spark.functions.text import fingerprint, tokens
from embeddinghub_spark.functions.vector import cosine_similarity, with_lsh_bucket


def _md5_long(c: Column) -> Column:
    """First 15 hex chars of md5 → non-negative BIGINT (60 bits).
    conv() is the same in DuckDB (from_hex equivalent via
    hash-compatible SQL: CAST(('0x' || substr(md5(x),1,15)) AS BIGINT))."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


# -- exact dedup --------------------------------------------------------------

def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of exact (canonicalized) duplicates: one row per
    fingerprint with the keeper (min id) and the group size."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_docs"),
        )
    )


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one doc (min id) per canonical fingerprint."""
    w_keep = exact_duplicates(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(w_keep, id_col, "left_semi")


# -- shingles + MinHash -------------------------------------------------------

def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Sliding word n-grams joined by space; docs shorter than n words
    yield their full token string as the single shingle."""
    toks = tokens(col)
    k = F.size(toks)
    joined = F.array_join(toks, " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(k - F.lit(n), F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.when(k > n, grams).otherwise(F.array(joined))


def _salt_hash(i: int):
    # single-arg lambda: a 2-arg signature would make Spark pass
    # the element index as the second argument
    return lambda s: F.md5(F.concat(F.lit(f"{i}#"), s))


def minhash_signature(
    col: Column | str, num_hashes: int = 8, shingle_n: int = 3
) -> Column:
    """Array of ``num_hashes`` min-hash values over shingles.

    Permutation i is simulated by salting: h_i(s) = md5(i || '#' || s);
    min is lexicographic over the hex strings (identical ordering in
    any md5-bearing engine — no numeric conversion needed). Pure array
    exprs — no explode, no shuffle; one pass over each document.

    NOTE: inlines the shingle expression per hash — fine for one-off
    use; the staged pipelines below (_with_signature) materialize the
    shingle column ONCE so the optimizer can't re-expand it 8×.
    """
    sh = word_shingles(col, shingle_n)
    mins = [
        F.array_min(F.transform(sh, _salt_hash(i))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return F.array(*mins)


def _with_signature(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    shingle_n: int,
    keep_shingles: bool = False,
) -> DataFrame:
    """Staged signature computation: tokens → shingles → signature as
    separate projections, so each expensive array is computed once per
    row instead of once per downstream expression (an 8× md5-over-
    shingles blowup otherwise — measured 20× slower inline)."""
    staged = df.select(
        F.col(id_col), word_shingles(text_col, shingle_n).alias("_sh")
    )
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("_sh"), _salt_hash(i)))
            for i in range(num_hashes)
        ]
    )
    cols = [F.col(id_col), sig.alias("_sig")]
    if keep_shingles:
        cols.append(F.col("_sh"))
    return staged.select(*cols)


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature are
    candidate near-duplicates. Output: (band, band_hash, doc_id) —
    grouping by (band, band_hash) yields the candidate buckets;
    self-join within bucket yields candidate pairs.

    Scale: the only shuffle key is the band hash; bucket sizes are
    bounded by true near-dup cluster sizes (plus tiny hash-collision
    noise), so no quadratic blowup on the full corpus.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes={num_hashes} not divisible by bands={bands}: trailing "
            "hashes would be silently dropped, reducing LSH recall"
        )
    rows_per_band = num_hashes // bands
    with_sig = _with_signature(df, text_col, id_col, num_hashes, shingle_n)
    band_cols = []
    for b in range(bands):
        piece = F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band)
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.array_join(F.transform(piece, lambda x: x.cast("string")), ",")).alias(
                    "band_hash"
                ),
            )
        )
    return (
        with_sig.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bh"))
        .select(id_col, F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash"))
    )


def minhash_duplicate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Distinct candidate pairs (a < b) from banded MinHash."""
    cand = minhash_candidates(df, text_col, id_col, num_hashes, bands, shingle_n)
    a = cand.alias("a")
    b = cand.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


# -- SimHash ------------------------------------------------------------------

def simhash(col: Column | str, bits: int = 16) -> Column:
    """SimHash fingerprint: bit j is the majority vote of bit j over
    all token hashes. ``bits`` kept ≤ 16 by default: each bit is an
    array-expr vote, and 16 bits is plenty for bucketing.

    Returns BIGINT in [0, 2^bits).
    """
    toks = tokens(col)
    hashes = F.transform(toks, lambda t: _md5_long(t))
    n = F.size(toks)
    acc = F.lit(0).cast("bigint")

    def bit_filter(j: int):
        # single-arg lambda: a 2-arg signature would make Spark pass
        # the element index as the second argument
        return lambda h: h.bitwiseAND(F.lit(1 << j)) != 0

    for j in range(bits):
        ones = F.size(F.filter(hashes, bit_filter(j)))
        acc = acc + F.when(ones * 2 >= n, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return acc


def simhash_staged(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """Staged SimHash: token-hash array materialized once, then the
    bit votes — ``bits``× cheaper than inlining ``simhash()`` (which
    re-derives the hash array per bit)."""
    staged = df.select(
        F.col(id_col),
        F.transform(tokens(text_col), lambda t: _md5_long(t)).alias("_hs"),
    )
    n = F.size(F.col("_hs"))
    acc = F.lit(0).cast("bigint")

    def bit_filter(j: int):
        return lambda h: h.bitwiseAND(F.lit(1 << j)) != 0

    for j in range(bits):
        ones = F.size(F.filter(F.col("_hs"), bit_filter(j)))
        acc = acc + F.when(ones * 2 >= n, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return staged.select(F.col(id_col), acc.alias("simhash"))


def simhash_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """Bucket docs by exact SimHash (near-dup candidates)."""
    return (
        df.select(F.col(id_col), simhash(text_col, bits).alias("simhash"))
        .groupBy("simhash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_docs"))
    )


# -- n-gram Jaccard -----------------------------------------------------------

def jaccard_similarity(a: Column, b: Column) -> Column:
    """|A∩B| / |A∪B| over shingle arrays (deduped)."""
    ai, bi = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(ai, bi)).cast("double")
    union = F.size(F.array_union(ai, bi)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Verified near-dup pairs: MinHash candidates filtered by exact
    n-gram Jaccard ≥ threshold. The expensive exact measure runs ONLY
    on candidate pairs (bucket-scoped), never all-pairs."""
    pairs = minhash_duplicate_pairs(df, text_col, id_col, num_hashes, bands, shingle_n)
    # tiny (id + shingles); read twice by the pair join. localCheckpoint
    # (lazy) materializes on first action and is GC-cleaned with the
    # plan — no unpersist contract leaks onto the caller.
    sh = df.select(
        F.col(id_col), word_shingles(text_col, shingle_n).alias("_sh")
    ).localCheckpoint(eager=False)
    return (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("_sh", "_sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("_sh", "_sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard_similarity(F.col("_sh_a"), F.col("_sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# -- embedding near-dup -------------------------------------------------------

def embedding_near_duplicates(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Cosine near-dup pairs via LSH bucketing: pairs in the same
    sign-projection bucket with cosine ≥ threshold. Linear-ish in N:
    the self-join is bucket-equi, not cross."""
    b = with_lsh_bucket(df, vec_col, dim, n_planes, seed)
    x = b.alias("x")
    y = b.alias("y")
    return (
        x.join(
            y,
            (F.col("x.lsh_bucket") == F.col("y.lsh_bucket"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            F.round(
                cosine_similarity(F.col(f"x.{vec_col}"), F.col(f"y.{vec_col}")), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
