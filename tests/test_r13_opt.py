"""Round-13 optimization invariants."""

from __future__ import annotations

from market_data_pipeline_spark.plans.driver_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_mm6_phash_dedup_surface_is_canonicalizable(spark):
    """mm6 is rows-only (no oracle), so the driver records its raw rows —
    which its canonicalizer sorts with pandas. pandas cannot order list
    cells, so every output column must be a scalar type, and the row set
    must actually survive a pandas lexsort (r12 verdict item #2: the old
    array<long> media_ids crashed the driver's recorder)."""
    import pandas as pd

    df = QUERIES["mm6_phash_dedup"](spark, SF_DIR)
    for f in df.schema.fields:
        assert f.dataType.typeName() in {
            "string",
            "long",
            "integer",
            "double",
            "float",
            "boolean",
            "date",
            "timestamp",
            "decimal",
        }, f"non-scalar column {f.name}: {f.dataType}"
    rows = df.collect()
    assert rows, "duplicate salting must produce at least one group"
    pdf = pd.DataFrame([r.asDict() for r in rows])
    pdf.sort_values(by=list(pdf.columns))  # the canonicalizer's operation
    # the salted exact re-ingests must pair original with +1_000_000 copy
    for r in rows:
        assert r["n_images"] >= 2
        ids = [int(x) for x in r["media_ids"].split(",")]
        assert ids == sorted(ids)
