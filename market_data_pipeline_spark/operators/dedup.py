"""Deduplication operators for large-scale document pipelines (SURVEY §7
Phase 6; generalizes the reference's key-subset dedup A9 at
src/crawlers/krx_delisted_crawler.py:314-318).

All operators are pure DataFrame ops designed for the 100 TB path:

- exact dedup is a hash groupBy (one shuffle on the text hash, never on the
  full text);
- MinHash/LSH banding turns near-dup detection into an equi-join on
  (band_id, band_hash) buckets — no pairwise cross join ever materializes;
- n-gram Jaccard verification only runs on candidate pairs emitted by a
  bucket join (or, for small corpora, a same-language shingle join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per exact text value; report group size.

    Grouping key is ``xxhash64(text)`` so the shuffle moves an 8-byte key,
    not the document body; the full text never leaves its partition.
    Returns (id_col, dup_count).
    """
    return (
        df.groupBy(F.xxhash64(F.col(text_col)).alias("_h"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("dup_count"),
        )
        .drop("_h")
    )


def shingle_tokens(text_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (array<string>).

    Pure built-in expression (split + sequence + transform) — stays in
    whole-stage codegen, no UDF.
    """
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.array_distinct(grams)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = "lang",
    n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard similarity.

    Exploded shingles are equi-joined on (group, shingle) so only documents
    sharing at least one shingle ever pair up; Jaccard is computed from
    |A∩B| (join match count) and per-doc shingle counts:
    ``J = common / (|A| + |B| - common)``.

    At 100 TB, ``group_col`` (language / source bucket) bounds the join
    fan-out; for unbounded corpora use :func:`minhash_lsh_pairs` first and
    feed its candidates here for verification.
    Returns (doc_a, doc_b, common, jaccard).
    """
    group = [group_col] if group_col else []
    sh = (
        df.select(
            F.col(id_col), *group, F.explode(shingle_tokens(F.col(text_col), n)).alias("shingle")
        )
    )
    sizes = sh.groupBy(id_col, *group).agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    join_cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) & (
        F.col("a.shingle") == F.col("b.shingle")
    )
    for g in group:
        join_cond = join_cond & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    common = (
        a.join(b, join_cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "common", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per document: for hash function i, the minimum of
    ``xxhash64(shingle, seed+i)`` over the doc's shingles.

    Implemented as one exploded frame + ``min_by``-free groupBy of
    ``min(hash_i)`` columns — a single shuffle on doc_id, signature width
    columns computed JVM-side.
    Returns (id_col, sig: array<bigint>).
    """
    sh = df.select(
        F.col(id_col), F.explode(shingle_tokens(F.col(text_col), n)).alias("shingle")
    )
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(seed + i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col), F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding over MinHash.

    The signature is cut into ``bands`` bands of ``num_hashes // bands``
    rows; documents collide if any band hashes equal. The pair set comes
    from a self-equi-join on (band_id, band_hash) — the classic
    shuffle-friendly formulation: at 100 TB the only shuffle keys are
    16-byte band buckets, and skew (a viral duplicate cluster) is bounded
    per-band and AQE-splittable.

    Returns (doc_a, doc_b, n_bands_matched) — verify candidates with
    :func:`ngram_jaccard_pairs` or estimate similarity from the signature.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes, seed)
    band_cols = []
    for b in range(bands):
        band = F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
        band_cols.append(F.struct(F.lit(b).alias("band_id"), F.xxhash64(band).alias("bh")))
    buckets = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bucket")
    ).select(
        F.col(id_col),
        F.col("bucket.band_id").alias("band_id"),
        F.col("bucket.bh").alias("band_hash"),
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count("*").alias("n_bands_matched"))
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash fingerprint per document.

    For each shingle hash, each bit position contributes +1/-1 to a
    per-document tally; the fingerprint sets bits with positive tally.
    Expressed as explode → per-bit conditional sums → bit OR-fold; all
    built-in expressions, one shuffle on doc_id.

    Near-dup detection = hamming distance on fingerprints
    (``bit_count(fp_a ^ fp_b)``), typically via banding the 64 bits into
    4×16-bit keys for an equi-join — same shape as MinHash LSH.
    Returns (id_col, fingerprint: bigint).
    """
    sh = df.select(
        F.col(id_col), F.explode(shingle_tokens(F.col(text_col), n)).alias("_sh")
    ).select(F.col(id_col), F.xxhash64(F.col("_sh")).alias("h"))
    # bit masks via shiftleft — a python literal 1 << 63 overflows long
    def mask(i: int):
        return F.shiftleft(F.lit(1).cast("long"), i)

    aggs = [
        F.sum(
            F.when(F.col("h").bitwiseAND(mask(i)) != 0, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    tallies = sh.groupBy(id_col).agg(*aggs)
    fp = F.lit(0).cast("long")
    for i in range(bits):
        fp = fp.bitwiseOR(F.when(F.col(f"b{i}") > 0, mask(i)).otherwise(F.lit(0).cast("long")))
    return tallies.select(F.col(id_col), fp.alias("fingerprint"))


def simhash_near_pairs(
    fingerprints: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    band_bits: int = 16,
) -> DataFrame:
    """Candidate pairs whose SimHash fingerprints agree on at least one
    16-bit band (necessary condition for hamming distance <= 3 with 4
    bands), verified exactly with bit_count on the XOR.

    Returns (doc_a, doc_b, hamming).
    """
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    bands = fingerprints.select(
        F.col(id_col),
        F.col("fingerprint"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftright(F.col("fingerprint"), i * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select(id_col, "fingerprint", "b.band_id", "b.band_val")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(
                F.col("a.fingerprint").bitwiseXOR(F.col("b.fingerprint"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
