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


def shingles_from_tokens(toks_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a *materialized* token-array
    column. Callers must stage the token array into a real column first
    (see :func:`shingled`): if the split expression is passed in directly,
    Catalyst inlines it into every per-gram element access and recomputes
    the split n times per shingle — measured 40x slower."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks_col) - (n - 1), F.lit(0)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks_col, i, n), " "))
    return F.array_distinct(grams)


def shingled(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, extra..., shingles: array<string>) with the tokenization staged
    through a materialized column (two select stages — see
    :func:`shingles_from_tokens` for why)."""
    from market_data_pipeline_spark.operators.util import ensure_parallelism

    df = ensure_parallelism(df, id_col)
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    staged = df.select(F.col(id_col), *[F.col(c) for c in extra_cols], toks.alias("_toks"))
    return staged.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        shingles_from_tokens(F.col("_toks"), n).alias("shingles"),
    )


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
    from market_data_pipeline_spark.operators.util import pairs_within_groups

    group = [group_col] if group_col else []
    # Plan-shape decisions that matter at scale:
    # - bucket on the 8-byte shingle hash, not the shingle string (same
    #   pair counts — xxhash64 collisions are negligible — far cheaper
    #   exchange);
    # - carry each doc's shingle count |A| on the exploded rows (it is
    #   just size(shingles), known before explode), so no separate sizes
    #   aggregate + joins;
    # - generate pairs with a single groupBy-on-bucket (see
    #   pairs_within_groups) instead of a self-join, so the shingling
    #   pipeline executes once.
    # explode_outer + isNotNull, not explode: see pairs_within_groups for
    # why (the inferred non-empty filter re-evaluates the HOF shingle
    # expression row-by-row, interpreted)
    sh = (
        shingled(df, id_col, text_col, n, extra_cols=tuple(group))
        .select(
            F.col(id_col),
            *group,
            F.size("shingles").alias("sz"),
            F.explode_outer("shingles").alias("_s"),
        )
        .filter(F.col("_s").isNotNull())
        .select(F.col(id_col), *group, F.col("sz"), F.xxhash64(F.col("_s")).alias("shingle"))
    )
    pairs = pairs_within_groups(sh, [*group, "shingle"], id_col, ["sz"])
    return (
        pairs.groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count("*").alias("common"))
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "common", "jaccard")
    )


def _minhash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash parameters (odd 31-bit multiplier,
    31-bit offset): h_i(x) = a_i * (x & 0x7fffffff) + b_i. Operands are
    sized so the product stays < 2^62 — ANSI mode (Spark 4 default) makes
    wrapping long arithmetic an error, so the hash must not overflow."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 30) * 2 + 1, rng.randrange(0, 1 << 31))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per document.

    Fully map-side: each shingle is xxhash64'd ONCE to a long, then the
    ``num_hashes`` permutations are cheap wrapping multiply-adds over that
    long (universal hashing) folded with ``array_min`` — no explode, no
    shuffle, signature computed in a single pass per row. (The earlier
    explode+groupBy formulation shuffled |docs|x|shingles| rows and hashed
    each shingle string 64 times.)
    Returns (id_col, sig: array<bigint>).
    """
    params = _minhash_params(num_hashes, seed)
    hashed = shingled(df, id_col, text_col, n).select(
        F.col(id_col),
        F.transform(
            F.col("shingles"),
            lambda s: F.xxhash64(s).bitwiseAND(F.lit(0x7FFFFFFF).cast("long")),
        ).alias("_hs"),
    )
    sig_cols = [
        F.array_min(
            F.transform(F.col("_hs"), lambda h: h * F.lit(a).cast("long") + F.lit(b).cast("long"))
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(params)
    ]
    return hashed.select(F.col(id_col), *sig_cols).select(
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
    rows; documents collide if any band hashes equal. Pairs come from ONE
    shuffle on the 16-byte (band_id, band_hash) bucket key
    (pairs_within_groups) — the signature pipeline executes once, and at
    100 TB the exchange carries only (id, band, hash) rows.

    Returns (doc_a, doc_b, n_bands_matched) — verify candidates with
    :func:`ngram_jaccard_pairs` or estimate similarity from the signature.
    """
    from market_data_pipeline_spark.operators.util import pairs_within_groups

    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes, seed)
    band_cols = []
    for b in range(bands):
        band = F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
        band_cols.append(F.struct(F.lit(b).alias("band_id"), F.xxhash64(band).alias("bh")))
    # explode_outer: the inferred-filter trap again — the band array embeds
    # the full minhash signature expression (see pairs_within_groups)
    buckets = (
        sig.select(F.col(id_col), F.explode_outer(F.array(*band_cols)).alias("bucket"))
        .filter(F.col("bucket").isNotNull())
        .select(
            F.col(id_col),
            F.col("bucket.band_id").alias("band_id"),
            F.col("bucket.bh").alias("band_hash"),
        )
    )
    pairs = pairs_within_groups(buckets, ["band_id", "band_hash"], id_col)
    return pairs.groupBy(
        F.col(f"a.{id_col}").alias("doc_a"),
        F.col(f"b.{id_col}").alias("doc_b"),
    ).agg(F.count("*").alias("n_bands_matched"))


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
    Fully map-side: shingle hashes are a per-row array, each bit tally an
    ``aggregate`` fold over it — no explode, no shuffle.

    Near-dup detection = hamming distance on fingerprints
    (``bit_count(fp_a ^ fp_b)``), typically via banding the 64 bits into
    4×16-bit keys for an equi-join — same shape as MinHash LSH.
    Returns (id_col, fingerprint: bigint).
    """
    hashed = shingled(df, id_col, text_col, n).select(
        F.col(id_col),
        F.transform(F.col("shingles"), lambda s: F.xxhash64(s)).alias("_hs"),
    )

    # Bit tallies fold 64 interpreted `aggregate` lambdas per row (HOFs
    # don't codegen); an Arrow-batched numpy unpackbits tally is ~5x
    # faster and bit-identical (integer-only — no float divergence). The
    # shingle hashing itself stays JVM-side (xxhash64 above).
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    def tally(hs):
        out = np.zeros(len(hs), dtype=np.int64)
        for row_i, arr in enumerate(hs):
            if arr is None or len(arr) == 0:
                continue
            a = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            # (n_shingles, 64) bit matrix, bit i in column i (LSB first)
            bit_mat = (a[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
            votes = 2 * bit_mat.sum(axis=0, dtype=np.int64) - len(a)
            fp = 0
            for i in np.nonzero(votes > 0)[0]:
                fp |= 1 << int(i)
            # two's-complement wrap into int64 (python ints don't overflow)
            out[row_i] = fp - (1 << 64) if fp >= (1 << 63) else fp
        return pd.Series(out)

    tally.__annotations__ = {"hs": pd.Series, "return": pd.Series}
    fp_udf = pandas_udf(tally, "long")
    return hashed.select(F.col(id_col), fp_udf(F.col("_hs")).alias("fingerprint"))


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
    from market_data_pipeline_spark.operators.util import pairs_within_groups

    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    bands = (
        fingerprints.select(
            F.col(id_col),
            F.col("fingerprint"),
            F.explode_outer(
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
        )
        .filter(F.col("b").isNotNull())
        .select(id_col, "fingerprint", "b.band_id", "b.band_val")
    )
    pairs = pairs_within_groups(bands, ["band_id", "band_val"], id_col, ["fingerprint"])
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(
                F.col("a.fingerprint").bitwiseXOR(F.col("b.fingerprint"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --- entity resolution -------------------------------------------------------


def blocked_name_pairs(
    df: DataFrame,
    block_col: str,
    id_col: str,
    name_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """Blocked entity resolution: candidate duplicate pairs whose names are
    within ``max_dist`` Levenshtein edits, compared only WITHIN a blocking
    key (nation, market, first-token, ...).

    The unblocked formulation is an O(N^2) cross join with a string-edit
    predicate — a nested-loop plan no optimizer can save. Blocking turns it
    into one groupBy shuffle on the block key plus in-group pair expansion
    (``pairs_within_groups``), i.e. sum over blocks of k^2 instead of N^2;
    block-size skew is the operator's knob, same as every LSH family op
    here. ``F.levenshtein`` runs JVM-side in codegen.

    Returns (block_col, id_a, id_b, edit_dist) with id_a < id_b.
    """
    from market_data_pipeline_spark.operators.util import pairs_within_groups

    pairs = pairs_within_groups(
        df.select(block_col, id_col, name_col), [block_col], id_col, [name_col]
    )
    return (
        pairs.select(
            F.col(block_col),
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.levenshtein(F.col(f"a.{name_col}"), F.col(f"b.{name_col}"))
            .cast("long")
            .alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= max_dist)
    )


# --- duplicate clustering ----------------------------------------------------


def connected_components(
    pairs: DataFrame,
    left_col: str = "doc_a",
    right_col: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over a pair list: every node labeled with the
    smallest node id reachable from it — the clustering step that turns
    near-dup PAIRS (minhash/simhash/cosine candidates) into dedup GROUPS,
    from which one canonical document per cluster survives.

    Iterative min-label propagation ("large-star" style, undirected):
    each round every node takes the min label in its neighborhood
    (including its own), via one groupBy over the symmetrized edge list;
    stop when no label changed. Rounds needed is the graph diameter
    (near-dup clusters are shallow — a handful of rounds), and each round
    is one shuffle of |E| rows, nothing driver-side but the convergence
    flag. Labels are checkpointed through ``localCheckpoint`` each round
    to cut the exponentially deepening lineage (a plan-size, not
    correctness, concern).

    Returns (node, component) — component = min node id in the cluster.
    Isolated nodes (absent from pairs) are by definition their own
    component and are not emitted; union them in from the corpus if a
    total labeling is needed.
    """
    a, b = F.col(left_col), F.col(right_col)
    edges = (
        pairs.select(a.alias("src"), b.alias("dst"))
        .unionByName(pairs.select(b.alias("src"), a.alias("dst")))
        .distinct()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    for _ in range(max_iterations):
        # candidate label per node: min over neighbors' current labels
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("n_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("n_comp"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
