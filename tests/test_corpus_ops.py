"""Corpus-preparation operators: PII redaction, TF-IDF, chunking,
sequence packing, leakage-safe splits (round-2 additions)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from market_data_pipeline_spark.operators import text as TX


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at john.doe+x@example.co.uk or call +82 10-1234-5678 ok"),
            (2, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in TX.redact_pii(df).collect()}
    assert "[EMAIL]" in out[1].text and "[PHONE]" in out[1].text
    assert "example" not in out[1].text and "1234" not in out[1].text
    assert out[1].n_emails == 1 and out[1].n_phones == 1
    assert out[2].text == "no pii here at all"
    assert out[2].n_emails == 0 and out[2].n_phones == 0


def test_tfidf_top_terms_values(spark):
    # 3 docs; "shared" in all (idf=0), "rare" only in doc 1
    df = spark.createDataFrame(
        [
            (1, "shared rare rare"),
            (2, "shared other"),
            (3, "shared other"),
        ],
        "doc_id long, text string",
    )
    out = TX.tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    top1 = {d: rows[0] for d, rows in by_doc.items()}
    assert top1[1].term == "rare"
    assert top1[1].tf == 2 and top1[1].df == 1
    assert top1[1].tfidf == pytest.approx(round(2 * math.log(3 / 1), 6))
    # idf of an everywhere-term is 0
    shared = [r for r in out if r.term == "shared"]
    assert all(r.tfidf == 0.0 for r in shared)


def test_chunk_documents_stride_and_tail(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    chunks = {r.chunk_idx: r for r in TX.chunk_documents(df, 4, 1).collect()}
    # stride 3 over 10 tokens: starts 1,4,7,10
    assert sorted(chunks) == [0, 1, 2, 3]
    assert chunks[0].chunk_text == "t0 t1 t2 t3" and chunks[0].n_tokens == 4
    assert chunks[1].chunk_text == "t3 t4 t5 t6"  # 1-token overlap
    assert chunks[3].chunk_text == "t9" and chunks[3].n_tokens == 1


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        TX.chunk_documents(df, 4, 4)


def test_pack_sequences_greedy_invariant(spark):
    docs = [(i, " ".join(["w"] * (7 + (i * 13) % 40))) for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = TX.pack_sequences(df, budget=50).collect()
    # recompute the greedy concat assignment per shard in plain python
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
        cum = by_shard.get(r.shard, 0) + r.n_tokens
        by_shard[r.shard] = cum
        assert r.pack_no == (cum - r.n_tokens) // 50
        expected_shard = hashlib.md5(str(r.doc_id).encode()).hexdigest()[0]
        assert r.shard == expected_shard


def test_train_val_test_split_group_coherent(spark):
    df = spark.createDataFrame(
        [(i, f"src{i % 7}") for i in range(200)], "doc_id long, source string"
    )
    out = TX.train_val_test_split(df, key_col="source").collect()
    per_source = {}
    for r in out:
        per_source.setdefault(r.source, set()).add(r.split)
    # every group lands wholly in one split — the leakage guard
    assert all(len(s) == 1 for s in per_source.values())
    assert set().union(*per_source.values()) <= {"train", "val", "test"}


def test_train_val_test_split_fractions(spark):
    df = spark.createDataFrame([(i,) for i in range(3000)], "k long")
    counts = {
        r.split: r["count"]
        for r in TX.train_val_test_split(df, key_col="k").groupBy("split").count().collect()
    }
    n = sum(counts.values())
    assert n == 3000
    assert 0.74 < counts["train"] / n < 0.85
    assert 0.06 < counts["val"] / n < 0.14
    assert 0.06 < counts["test"] / n < 0.14


def test_prepare_corpus_round5_gates(spark):
    """The optional charset/TTR/dup-sentence gates drop exactly the
    crafted offenders and leave clean docs alone; defaults (None) change
    nothing."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from corpus_prep import prepare_corpus

    docs = spark.createDataFrame(
        [
            (1, "a clean document with several distinct words here. and one more sentence too.", "en", "s", 10),
            (2, "中文内容 全部都是 非ASCII 字符 的文档 测试用", "zh", "s", 10),  # low ascii ratio
            (3, "spam spam spam spam spam spam spam spam", "en", "s", 10),  # low TTR
            (4, "buy now. buy now. buy now. buy now. unique tail words follow here.", "en", "s", 10),  # dup sentences
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # defaults: all four survive the quality stage
    _, counts0 = prepare_corpus(spark, docs, min_tokens=2, n_shards=2)
    assert counts0["after_quality"] == 4
    _, counts = prepare_corpus(
        spark,
        docs,
        min_tokens=2,
        n_shards=2,
        min_ascii_ratio=0.8,
        min_ttr=0.3,
        max_dup_sentence_ratio=0.5,
    )
    assert counts["after_quality"] == 1


def test_prepare_corpus_end_to_end_invariants(spark):
    """pipeline4's composition (r10): dedup really deduplicates, the
    benchmark leaks nothing, and the per-shard pack stage is the greedy
    concat assignment recomputed in plain python."""
    from market_data_pipeline_spark.plans.pipelines import prepare_corpus

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, base + " iota"),          # near/exact dups
         (4, "one two three four five six seven eight nine ten " * 8),
         (5, "completely different words here about spark engines"),
         (6, "short")],                                      # fails min_tokens 5? no: 1 token
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "completely different words here about spark engines")],
        "doc_id long, text string",
    )
    out, counts = prepare_corpus(
        spark, docs, benchmark=bench, min_tokens=5,
        chunk_tokens=8, overlap=2, n_shards=2, pack_budget=16,
    )
    rows = out.collect()
    kept_docs = {r.doc_id for r in rows}
    # doc 6 fails the quality floor; doc 2 is an exact dup of 1; doc 3
    # near-dups 1 (shared 3-gram shingles) and is LONGER so it survives
    # instead; doc 5 is contaminated (identical to the benchmark text)
    assert 6 not in kept_docs and 2 not in kept_docs and 5 not in kept_docs
    assert 3 in kept_docs and 4 in kept_docs and 1 not in kept_docs
    assert counts["after_exact_dedup"] == counts["after_quality"] - 1
    # pack stage: recompute greedy per-shard assignment from (pos, n_tokens)
    by_shard: dict = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.pos)):
        cum = by_shard.get(r.shard, 0) + r.n_tokens
        by_shard[r.shard] = cum
        assert r.pack_no == (cum - r.n_tokens) // 16
    # chunking honors the 8/2 window: every chunk but a doc's last has 8
    last_idx = {}
    for r in rows:
        last_idx[r.doc_id] = max(last_idx.get(r.doc_id, -1), r.chunk_idx)
    for r in rows:
        if r.chunk_idx < last_idx[r.doc_id]:
            assert r.n_tokens == 8


def test_prepare_corpus_gates_are_keyword_only():
    """r10 advice: prepare_corpus inserted pack_budget before the
    round-5 quality gates, silently re-binding a stale positional
    caller's min_ascii_ratio to pack_budget. The gates (and
    pack_budget) are keyword-only so such a call fails loudly."""
    import inspect

    from market_data_pipeline_spark.plans.pipelines import prepare_corpus

    sig = inspect.signature(prepare_corpus)
    for name in (
        "pack_budget",
        "min_ascii_ratio",
        "min_ttr",
        "max_dup_sentence_ratio",
        "audit_counts",
    ):
        assert sig.parameters[name].kind is inspect.Parameter.KEYWORD_ONLY
