"""Source/sink format round-trips beyond parquet+CSV (SURVEY.md S18/S19
family): JSON-lines and ORC, both with exact content equality and (for
ORC) predicate-pushdown plan checks — format glue is only done when the
scan still prunes."""

from __future__ import annotations

from pyspark.sql import functions as F

from echo_chambers_detection_spark.sources.tables import (
    load_table,
    read_jsonl,
    read_orc,
    write_jsonl,
    write_orc,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, "documents", SF_DIR).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


def test_jsonl_roundtrip_exact(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, schema=docs.schema)
    assert back.schema == docs.schema
    a = sorted(docs.collect())
    b = sorted(back.collect())
    assert a == b


def test_jsonl_lines_are_one_json_doc_each(spark, tmp_path):
    import glob
    import json

    docs = _docs(spark).limit(20)
    path = str(tmp_path / "docs_jsonl2")
    write_jsonl(docs, path)
    lines = []
    for f in glob.glob(path + "/part-*"):
        with open(f) as fh:
            lines += [ln for ln in fh.read().splitlines() if ln]
    assert len(lines) == 20
    parsed = [json.loads(ln) for ln in lines]
    assert {p["doc_id"] for p in parsed} == {
        r["doc_id"] for r in docs.collect()
    }


def test_orc_roundtrip_exact_and_pushdown(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = read_orc(spark, path)
    assert sorted(back.collect()) == sorted(docs.collect())
    # filter + projection must reach the ORC scan
    q = back.where(F.col("lang") == "en").select("doc_id", "lang")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "lang" in plan.split(
        "PushedFilters"
    )[1][:120], plan[:800]
    assert q.count() == docs.where(F.col("lang") == "en").count()
