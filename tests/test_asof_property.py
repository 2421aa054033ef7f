"""Property-based check of asof_join against a pure-Python model
(SURVEY.md §5 names the reference's lack of property testing; hypothesis
is the superset here). Versions are unique per (key, ts) — the operator's
documented precondition (same-instant changes collapse upstream, as
membership_asof_join does with max_by)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from echo_chambers_detection_spark.operators.asof import asof_join

KEYS = ("a", "b", "c")


@st.composite
def scenario(draw):
    versions = draw(
        st.dictionaries(
            st.tuples(st.sampled_from(KEYS), st.integers(0, 30)),
            st.integers(0, 9),
            max_size=8,
        )
    )
    probes = draw(
        st.lists(
            st.tuples(st.sampled_from(KEYS), st.integers(0, 30)),
            min_size=1,
            max_size=8,
        )
    )
    return versions, probes


def model_asof(versions: dict, key: str, ts: int):
    best = None
    for (k, vts), val in versions.items():
        if k == key and vts <= ts and (best is None or vts > best[0]):
            best = (vts, val)
    return None if best is None else best[1]


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(scenario())
def test_asof_join_matches_model(spark, sc):
    versions, probes = sc
    probes_df = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(probes)],
        "k string, ts long, pid long",
    )
    if versions:
        versions_df = spark.createDataFrame(
            [(k, vts, v) for (k, vts), v in versions.items()],
            "k string, vts long, val long",
        )
    else:
        versions_df = spark.createDataFrame([], "k string, vts long, val long")
    out = asof_join(
        probes_df, versions_df, key="k", probe_ts="ts", version_ts="vts",
        value_cols=["val"], how="left",
    )
    got = {r["pid"]: r["val"] for r in out.collect()}
    want = {i: model_asof(versions, k, ts) for i, (k, ts) in enumerate(probes)}
    assert got == want
