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


def _md5_vote16(c):
    """Test seam: a vote-hash long whose low 16 bits reproduce
    simhash16's per-digit votes (bit j set iff hex digit j of md5 is in
    8..f), bits 16+ all zero."""
    h = F.md5(c)
    acc = F.lit(0).cast("long")
    for j in range(16):
        acc = acc + F.when(
            h.substr(j + 1, 1).isin(*"89abcdef"),
            F.lit(1 << j).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
    return acc


def _sim_docs(spark):
    return spark.createDataFrame(
        [
            ("a", "the quick brown fox jumps over the lazy dog"),
            ("b", "the quick brown fox jumps over the lazy cat"),
            ("c", "pack my box with five dozen liquor jugs"),
            ("d", "the quick brown fox jumps over the lazy dog"),
            ("e", "sphinx of black quartz judge my vow"),
        ],
        "doc_id string, text string",
    )


def test_simhash64_parity_with_simhash16_on_overlapping_width(spark):
    """simhash64 with the md5-digit vote hash must reproduce simhash16
    bit-for-bit on the overlapping 16-bit width (bits 16+ get no votes,
    so the signatures are equal outright) — pins both paths to the same
    vote/aggregate machinery (VERDICT r3 #5)."""
    from echo_chambers_detection_spark.operators.dedup import (
        simhash16,
        simhash64,
    )

    docs = _sim_docs(spark)
    got16 = {r["doc_id"]: r["simhash"] for r in simhash16(docs).collect()}
    got64 = {
        r["doc_id"]: r["simhash"]
        for r in simhash64(docs, vote_hash=_md5_vote16).collect()
    }
    assert got64 == got16


def test_simhash64_default_hash_deterministic_and_64bit(spark):
    from echo_chambers_detection_spark.operators.dedup import simhash64

    docs = _sim_docs(spark)
    a = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert a == b
    assert a["a"] == a["d"]  # identical docs, identical signatures
    # xxhash64 votes really exercise the top bits on some doc
    assert any(s < 0 or s >= (1 << 32) for s in a.values())


def test_simhash64_banded_candidates_match_bruteforce(spark):
    """Banded candidate generation finds EXACTLY the pairs within the
    Hamming budget (pigeonhole guarantee, then exact verify)."""
    from echo_chambers_detection_spark.operators.dedup import (
        simhash64,
        simhash_candidate_pairs_banded,
    )

    docs = _sim_docs(spark)
    sigs = simhash64(docs)
    rows = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    for max_h in (0, 3, 7):
        want = set()
        ids = sorted(rows)
        for i, d1 in enumerate(ids):
            for d2 in ids[i + 1:]:
                ham = bin((rows[d1] ^ rows[d2]) & ((1 << 64) - 1)).count("1")
                if ham <= max_h:
                    want.add((d1, d2, ham))
        got = {
            (r["d1"], r["d2"], r["hamming"])
            for r in simhash_candidate_pairs_banded(
                sigs, max_hamming=max_h
            ).collect()
        }
        assert got == want, f"max_hamming={max_h}"


def test_simhash64_rowwise_parity(spark):
    """The row-local fold (streaming/ingest shape, zero shuffle) equals
    the aggregation formulation bit-for-bit."""
    from echo_chambers_detection_spark.operators.dedup import (
        simhash64,
        simhash64_rowwise,
    )

    docs = _sim_docs(spark)
    agg = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    row = {
        r["doc_id"]: r["simhash"]
        for r in docs.select(
            "doc_id", simhash64_rowwise("text").alias("simhash")
        ).collect()
    }
    assert row == agg


def test_simhash64_overflow_is_loud(spark):
    """>= 65,536 tokens would corrupt the SWAR lane counters — both
    signature forms must fail LOUDLY instead (round-4 self-review).
    Two layers guarantee it: ANSI arithmetic overflows the packed SUM
    itself for typical token mixes, and the explicit n-based
    raise_error covers adversarial mixes that keep the top lane cold;
    either way, never a silent wrong signature."""
    import pytest

    from echo_chambers_detection_spark.operators.dedup import (
        simhash64,
        simhash64_rowwise,
    )

    big = spark.createDataFrame(
        [("huge", "w " * 66_000)], "doc_id string, text string"
    )
    with pytest.raises(Exception, match="lane overflow|ARITHMETIC_OVERFLOW"):
        simhash64(big).collect()
    with pytest.raises(Exception, match="lane overflow|ARITHMETIC_OVERFLOW"):
        big.select(simhash64_rowwise("text")).collect()
    # and normal docs still sign fine with the guard in the plan
    ok = spark.createDataFrame(
        [("d", "normal sized document text")], "doc_id string, text string"
    )
    assert simhash64(ok).count() == 1


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style; operators/dedup.py)
# ---------------------------------------------------------------------------


def _emb_fixture(spark):
    """Three near-dup groups + two singletons; ids chosen so min-id
    keepers are unambiguous."""
    import math

    rows = []

    def vec(angle, scale=1.0):
        return [scale * math.cos(angle), scale * math.sin(angle), 0.0, 0.0]

    # group A: a0/a1/a2 nearly colinear (cos ~ 0.999)
    for i, eps in enumerate((0.0, 0.01, 0.02)):
        rows.append((f"a{i}", vec(0.3 + eps)))
    # group B: two vectors, scaled differently (cosine ignores norm)
    rows.append(("b0", vec(1.4, 1.0)))
    rows.append(("b1", vec(1.41, 7.5)))
    # singletons far from everything
    rows.append(("s0", vec(2.8)))
    rows.append(("s1", [0.0, 0.0, 1.0, 0.0]))
    return spark.createDataFrame(
        rows, "post_cid string, vector array<double>"
    )


def test_semantic_dedup_exhaustive_known_groups(spark):
    from echo_chambers_detection_spark.operators.dedup import (
        semantic_dedup_keep_list,
    )

    out = {
        r["post_cid"]: r["keeper"]
        for r in semantic_dedup_keep_list(
            _emb_fixture(spark), threshold=0.99, mode="exhaustive"
        ).collect()
    }
    assert out == {"a1": "a0", "a2": "a0", "b1": "b0"}


def test_semantic_dedup_clustering_only_loses_pairs(spark):
    """Any clustering can only MISS cross-cluster pairs: the dropped
    set under kmeans/md5 must be a subset of the exhaustive drop."""
    from echo_chambers_detection_spark.operators.dedup import (
        semantic_dedup_keep_list,
    )

    emb = _emb_fixture(spark)
    exhaustive = {
        r["post_cid"]
        for r in semantic_dedup_keep_list(
            emb, threshold=0.99, mode="exhaustive"
        ).collect()
    }
    for mode, k in (("md5", 4), ("kmeans", 2)):
        dropped = {
            r["post_cid"]
            for r in semantic_dedup_keep_list(
                emb, threshold=0.99, mode=mode, k=k
            ).collect()
        }
        assert dropped <= exhaustive, (mode, dropped, exhaustive)


def test_semantic_clusters_md5_matches_duckdb_nibble(spark):
    import duckdb

    from echo_chambers_detection_spark.operators.dedup import (
        semantic_clusters,
    )

    emb = _emb_fixture(spark)
    got = {
        r["post_cid"]: r["cluster"]
        for r in semantic_clusters(emb, mode="md5", k=16).collect()
    }
    con = duckdb.connect()
    for cid in got:
        want = con.execute(
            "SELECT (strpos('0123456789abcdef', substr(md5(?), 1, 1)) - 1) % 16",
            [cid],
        ).fetchone()[0]
        assert got[cid] == want, cid


def test_semantic_dedup_rejects_bad_modes(spark):
    import pytest

    from echo_chambers_detection_spark.operators.dedup import (
        semantic_clusters,
    )

    emb = _emb_fixture(spark)
    with pytest.raises(ValueError, match="nibble"):
        semantic_clusters(emb, mode="md5", k=64)
    with pytest.raises(ValueError, match="mode"):
        semantic_clusters(emb, mode="hdbscan")
