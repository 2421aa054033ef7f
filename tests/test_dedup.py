"""Unit tests for dedup operators beyond the catalog oracles (SURVEY.md
M6): the frequency-cap guard on exact Jaccard."""

from __future__ import annotations

from pyspark.sql import functions as F

from echo_chambers_detection_spark.operators.dedup import jaccard_pairs


def _shingles(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, shingle string")


def test_jaccard_max_shingle_freq_drops_boilerplate(spark):
    # 'common' appears in all 4 docs (boilerplate); each pair also shares
    # nothing else except (d1, d2) which share 'x'
    rows = []
    for d in ("d1", "d2", "d3", "d4"):
        rows.append((d, "common"))
        rows.append((d, f"uniq-{d}"))
    rows.append(("d1", "x"))
    rows.append(("d2", "x"))
    sh = _shingles(spark, rows)

    uncapped = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in jaccard_pairs(sh, threshold=0.0).collect()
    }
    # every pair shares 'common' -> 6 pairs
    assert len(uncapped) == 6

    capped = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in jaccard_pairs(
            sh, threshold=0.0, max_shingle_freq=3
        ).collect()
    }
    # boilerplate dropped: only (d1, d2) still share a shingle, and
    # jaccard is over the FILTERED sets: {uniq-d1, x} vs {uniq-d2, x}
    assert set(capped) == {("d1", "d2")}
    assert abs(capped[("d1", "d2")] - 1.0 / 3.0) < 1e-12


def test_jaccard_cap_no_op_when_under_threshold(spark):
    rows = [("a", "s1"), ("a", "s2"), ("b", "s1"), ("b", "s3")]
    sh = _shingles(spark, rows)
    base = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in jaccard_pairs(sh, threshold=0.0).collect()
    }
    capped = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in jaccard_pairs(sh, threshold=0.0, max_shingle_freq=10).collect()
    }
    assert base == capped
