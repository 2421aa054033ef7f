"""Record-cleaning expressions (SURVEY.md §2.2 P1-P3, §2.8 F2-F6).

Everything here is a native Column expression — the reference implements
these as per-record Python functions (clean(), make_id()); in Spark they
stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def clean_unknown(col: Column | str) -> Column:
    """None/'' -> 'unknown' (reference clean(),
    project/neo4j/consumer_user.py:39-41; SURVEY.md P1)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.nullif(F.trim(c), F.lit("")), F.lit("unknown"))


def presence_filter(text_col: Column | str, key_col: Column | str) -> Column:
    """Keep records with non-empty text and a present key (reference
    project/qdrant/consumer_post.py:79-87; SURVEY.md P2)."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    k = F.col(key_col) if isinstance(key_col, str) else key_col
    return (F.length(F.trim(t)) > 0) & k.isNotNull()


def deterministic_id(col: Column | str) -> Column:
    """Deterministic 128-bit id from a natural key.

    Mirrors the reference's uuid5(NAMESPACE_URL, id) point ids
    (project/qdrant/consumer_post.py:56-60; SURVEY.md F2). We use md5 —
    same determinism and width; exact RFC-4122 v5 byte layout is declared
    out of scope (SURVEY.md §7.2)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("string"))


def run_description() -> Column:
    """'Run <Mon dd>' description string (reference
    project/metrics/community_detection.py:87-88; SURVEY.md F4/F6)."""
    return F.concat(F.lit("Run "), F.date_format(F.current_timestamp(), "MMM dd"))
