"""Edge-case checks for the native text expressions (SURVEY.md M6 text
analysis). The short-document cases are the regression for the
sequence(1,0)-descends crash: Spark's sequence(1, 0) evaluates to [1, 0]
and slice(t, 0, n) then raises INVALID_PARAMETER_VALUE.START, so
word_ngrams must branch explicitly on size(t) >= n. Quality filters see
empty / punctuation-only docs constantly, so this path must not throw."""

from __future__ import annotations

from pyspark.sql import functions as F

from echo_chambers_detection_spark.functions.text import (
    minhash_fingerprint,
    quality_score,
    tokenize,
    word_ngrams,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            ("d0", ""),
            ("d1", "!!! ... ???"),
            ("d2", "one"),
            ("d3", "two words"),
            ("d4", "the quick brown fox jumps"),
        ],
        "doc_id string, text string",
    )


def test_word_ngrams_short_docs_do_not_crash(spark):
    rows = {
        r.doc_id: r.bigrams
        for r in _docs(spark)
        .select(
            "doc_id", word_ngrams(tokenize("text"), 2).alias("bigrams")
        )
        .collect()
    }
    assert rows["d0"] == []
    assert rows["d1"] == []  # punctuation-only -> zero tokens
    assert rows["d2"] == []  # one token < n=2
    assert rows["d3"] == ["two words"]
    assert rows["d4"] == [
        "the quick",
        "quick brown",
        "brown fox",
        "fox jumps",
    ]


def test_word_ngrams_trigram_boundary(spark):
    rows = {
        r.doc_id: r.tri
        for r in _docs(spark)
        .select("doc_id", word_ngrams(tokenize("text"), 3).alias("tri"))
        .collect()
    }
    assert rows["d3"] == []  # 2 tokens < n=3
    assert len(rows["d4"]) == 3


def test_fingerprint_and_quality_on_short_docs(spark):
    # minhash_fingerprint shingles via word_ngrams: NULL (not crash) for
    # docs shorter than the shingle width; quality_score stays defined.
    rows = (
        _docs(spark)
        .select(
            "doc_id",
            minhash_fingerprint("text", ngram=3).alias("fp"),
            quality_score("text").alias("q"),
        )
        .collect()
    )
    by_id = {r.doc_id: r for r in rows}
    assert by_id["d0"].fp is None
    assert by_id["d1"].fp is None
    assert by_id["d3"].fp is None
    assert by_id["d4"].fp is not None
    for r in rows:
        assert r.q is not None and 0.0 <= r.q <= 1.0


def test_doc_repetition_query_handles_short_docs(spark, tmp_path):
    # End-to-end regression on the registered query itself: write a tiny
    # documents table containing empty/one-token docs and run
    # doc_repetition_scores over it (ADVICE r3: crashed before the guard).
    from echo_chambers_detection_spark.catalog import QUERY_REGISTRY

    d = str(tmp_path / "sf_tiny")
    _docs(spark).write.mode("overwrite").parquet(d + "/documents.parquet")
    out = {
        r.doc_id: r
        for r in QUERY_REGISTRY["doc_repetition_scores"]
        .spark(spark, d)
        .collect()
    }
    assert len(out) == 5
    assert out["d0"].n_tokens == 0
    assert out["d0"].top_bigram_frac is None
    assert out["d3"].top_bigram_frac == 1.0


def test_bpe_tokens_split_shape(spark):
    from echo_chambers_detection_spark.functions.text import bpe_tokens

    df = spark.createDataFrame(
        [("d1", "Hello, world! v2.0 costs $35")],
        "doc_id string, text string",
    )
    toks = df.select(bpe_tokens("text").alias("t")).first().t
    assert toks == [
        "hello", ",", " world", "!", " v", "2", ".", "0",
        " costs", " $", "35",
    ]


def test_scrub_urls_and_emails(spark):
    from echo_chambers_detection_spark.functions.text import (
        EMAIL_PATTERN,
        URL_PATTERN,
        scrub_urls_and_emails,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("d1", "see https://example.com/a?b=1 or mail bob@corp.io now"),
            ("d2", "no links here"),
        ],
        "doc_id string, text string",
    )
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            scrub_urls_and_emails("text").alias("clean"),
            F.size(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(URL_PATTERN), 0
                )
            ).alias("n_urls"),
            F.size(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(EMAIL_PATTERN), 0
                )
            ).alias("n_emails"),
        ).collect()
    }
    assert rows["d1"].n_urls == 1 and rows["d1"].n_emails == 1
    assert "https" not in rows["d1"].clean and "@" not in rows["d1"].clean
    assert "see" in rows["d1"].clean and "now" in rows["d1"].clean
    assert rows["d2"].clean == "no links here"
    assert rows["d2"].n_urls == 0 and rows["d2"].n_emails == 0


def test_scrub_matches_duckdb_semantics(spark):
    """The exact catalog query vs DuckDB on a crafted corpus WITH urls
    and e-mails — the sf corpora are clean, so this is where the scrub
    mechanics are actually oracle-checked."""
    import duckdb

    from echo_chambers_detection_spark.catalog import QUERY_REGISTRY

    docs = spark.createDataFrame(
        [
            ("1", "Visit HTTPS://Example.COM/x and ping a.b-c@mail.org ok"),
            ("2", "two urls http://a.io http://b.io one mail x@y.dev"),
            ("3", "plain text only"),
        ],
        "doc_id string, text string",
    )
    import tempfile, os

    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = (
        QUERY_REGISTRY["text_scrub_stats"]
        .spark(spark, d)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = (
        con.execute(QUERY_REGISTRY["text_scrub_stats"].oracle)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_urls"].tolist() == want["n_urls"].tolist()
    assert got["n_emails"].tolist() == want["n_emails"].tolist()
    assert got["clean_len"].tolist() == want["clean_len"].tolist()


def _crafted_corpus(spark, tmp_path):
    import os

    docs = spark.createDataFrame(
        [
            ("1", "Good line one.\nAnother fine line!\nIs this enough?\n"
                  "no punctuation here\nGood line one."),
            ("2", "Lorem ipsum dolor sit amet { padding: 0 }"),
            ("3", "short"),
            ("4", ""),
        ],
        "doc_id string, text string",
    )
    d = str(tmp_path / "crafted")
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def test_c4_flags_multiline_mechanics(spark, tmp_path):
    """The sf corpora are single-line; the line-level C4 rules are
    verified here on a crafted multi-line corpus, Spark vs DuckDB."""
    import duckdb

    from echo_chambers_detection_spark.catalog import QUERY_REGISTRY

    d = _crafted_corpus(spark, tmp_path)
    got = {
        r.doc_id: r
        for r in QUERY_REGISTRY["c4_quality_flags"].spark(spark, d).collect()
    }
    assert got["1"].n_lines == 5
    assert got["1"].frac_terminal_punct_lines == 0.8  # 4 of 5
    assert got["1"].frac_duplicate_lines == 0.2  # one repeated line
    assert got["2"].has_lorem_ipsum and got["2"].has_curly_brace
    assert got["4"].n_lines == 0
    assert got["4"].frac_terminal_punct_lines is None
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = con.execute(
        QUERY_REGISTRY["c4_quality_flags"].oracle
    ).df().set_index("doc_id")
    for did, r in got.items():
        w = want.loc[did]
        assert r.n_lines == w["n_lines"]
        assert bool(r.has_lorem_ipsum) == bool(w["has_lorem_ipsum"])


def test_winnowing_detects_shared_runs(spark):
    """Winnowing's guarantee: two docs sharing a run of >= k+w-1 = 11
    chars share at least one fingerprint; disjoint-content docs (over
    the md5 gram space) share none."""
    from echo_chambers_detection_spark.catalog import QUERY_REGISTRY
    import os, tempfile

    shared = "identical-substring-here"
    docs = spark.createDataFrame(
        [
            ("1", "prefix AAA " + shared + " suffix BBB"),
            ("2", "zzz " + shared + " qqq totally other tail"),
            ("3", "unrelated content with nothing in common at all"),
        ],
        "doc_id string, text string",
    )
    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    # recompute the fingerprint SETS (the query returns summaries;
    # reuse its internals by re-deriving with the same expressions)
    from pyspark.sql import functions as F

    t = F.lower(F.col("text"))
    h = F.transform(
        F.sequence(F.lit(1), F.length(t) - 7),
        lambda i: F.md5(F.substring(t, i, F.lit(8))),
    )
    w = F.transform(
        F.sequence(F.lit(1), F.size(h) - 3),
        lambda j: F.array_min(F.slice(h, j, 4)),
    )
    fps = {
        r.doc_id: set(r.fp)
        for r in docs.select(
            "doc_id", F.array_distinct(w).alias("fp")
        ).collect()
    }
    assert fps["1"] & fps["2"], "shared 24-char run must share a fingerprint"
    assert not (fps["1"] & fps["3"])
    assert not (fps["2"] & fps["3"])
    # and the registered query runs green on this frame
    out = {
        r.doc_id: r
        for r in QUERY_REGISTRY["winnowing_fingerprints"]
        .spark(spark, d)
        .collect()
    }
    assert out["1"].n_fingerprints > 0
