"""Co-occurrence / association mining over grouped item sets.

Beyond-reference addition (SURVEY.md §2.12): the transcript payload's
natural "market-basket" question — which tools are used together in a
conversation, and is the pairing more frequent than independence
predicts (lift > 1)? The same operator serves doc-tag affinity, host
co-citation, and label co-occurrence.

Plan shape: distinct (group, item) -> per-item group counts -> pair
counts via a per-group self-join with ``item_a < item_b``. The
self-join is quadratic in a group's item count, so ``max_items_per_
group`` (default 1000) drops pathological groups the same way the LSH
hub-bucket cap does (functions/dedup.py) — at 100 TB one conversation
touching every tool would otherwise dominate the shuffle; dropped
groups still count toward the per-item totals and N, so support/lift
remain probabilities over ALL qualifying groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cooccurrence(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_pair_count: int = 1,
    max_items_per_group: int | None = 1000,
    round_to: int = 6,
) -> DataFrame:
    """(item_a, item_b, n_both, support, lift) for unordered item pairs
    co-occurring in a group; support = n_both/N and lift =
    n_both*N/(n_a*n_b) over N = #groups with at least one item."""
    gi = (
        df.select(F.col(group_col).alias("g"), F.col(item_col).alias("it"))
        .where(F.col("it").isNotNull())
        .distinct()
        .persist()
    )
    n_groups = gi.select("g").distinct().count()
    item_counts = gi.groupBy("it").agg(F.count("*").alias("n_i"))
    basket = gi
    if max_items_per_group is not None:
        sizes = gi.groupBy("g").agg(F.count("*").alias("sz"))
        basket = gi.join(
            sizes.where(F.col("sz") <= max_items_per_group).select("g"), "g"
        )
    pairs = (
        basket.alias("a")
        .join(basket.alias("b"), "g")
        .where(F.col("a.it") < F.col("b.it"))
        .groupBy(
            F.col("a.it").alias("item_a"), F.col("b.it").alias("item_b")
        )
        .agg(F.count("*").alias("n_both"))
        .where(F.col("n_both") >= min_pair_count)
    )
    out = (
        pairs.join(
            F.broadcast(item_counts.select(F.col("it").alias("item_a"),
                                           F.col("n_i").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(item_counts.select(F.col("it").alias("item_b"),
                                           F.col("n_i").alias("n_b"))),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            F.col("n_both").cast("long").alias("n_both"),
            F.round(F.col("n_both") / F.lit(n_groups), round_to).alias("support"),
            F.round(
                F.col("n_both") * F.lit(n_groups)
                / (F.col("n_a") * F.col("n_b")),
                round_to,
            ).alias("lift"),
        )
    )
    gi.unpersist()
    return out


def cooccurrence_sql(
    source_cte: str,
    group_col: str = "g",
    item_col: str = "it",
    min_pair_count: int = 1,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`cooccurrence` (no size cap — oracle scale
    has no pathological groups; the cap is a scale guard, and driver
    fixtures stay far below it). ``source_cte`` must define relation
    ``src(g, it)``."""
    return f"""
WITH {source_cte},
gi AS MATERIALIZED (
  SELECT DISTINCT {group_col} AS g, {item_col} AS it FROM src
  WHERE {item_col} IS NOT NULL
),
ng AS (SELECT COUNT(DISTINCT g) AS n FROM gi),
ic AS MATERIALIZED (SELECT it, COUNT(*) AS n_i FROM gi GROUP BY it),
pairs AS (
  SELECT a.it AS item_a, b.it AS item_b, COUNT(*) AS n_both
  FROM gi a JOIN gi b ON a.g = b.g AND a.it < b.it
  GROUP BY a.it, b.it
  HAVING COUNT(*) >= {min_pair_count}
)
SELECT p.item_a, p.item_b, CAST(p.n_both AS BIGINT) AS n_both,
       ROUND(p.n_both / CAST((SELECT n FROM ng) AS DOUBLE), {round_to})
         AS support,
       ROUND(p.n_both * CAST((SELECT n FROM ng) AS DOUBLE)
             / (ia.n_i * ib.n_i), {round_to}) AS lift
FROM pairs p JOIN ic ia ON p.item_a = ia.it JOIN ic ib ON p.item_b = ib.it
"""


def bipartite_project(
    pairs: DataFrame,
    left_col: str = "u",
    right_col: str = "a",
    min_weight: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Weighted one-mode projection of a bipartite entity-attribute
    table: (src, dst, weight) with src < dst, weight = number of
    distinct shared attributes, edges below ``min_weight`` dropped.

    The standard co-occurrence-graph constructor (user-item, doc-term,
    author-paper). Scale guards for 100 TB:

    - a hot attribute with df = d fans out C(d, 2) pairs; ``max_df``
      drops attributes above the cap BEFORE the self-join (same posture
      as the LSH/minhash hub-bucket caps) — at web scale stopwords and
      mega-hubs must be capped or the join is quadratic;
    - ``min_weight`` prunes the long tail of weight-1 coincidence edges
      at the aggregation (map-side combinable), which is where most of
      the projection's mass lives on real corpora.

    Plan: distinct -> (optional df-cap semi-join) -> one self-join on
    the attribute key -> one groupBy(src, dst) count.
    """
    ua = pairs.select(
        F.col(left_col).alias("u"), F.col(right_col).alias("a")
    ).distinct()
    if max_df is not None:
        keep = (
            ua.groupBy("a")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= max_df)
            .select("a")
        )
        ua = ua.join(keep, "a", "left_semi")
    x = ua.select(F.col("u").alias("ua"), "a")
    y = ua.select(F.col("u").alias("ub"), "a")
    return (
        x.join(y, "a")
        .where(F.col("ua") < F.col("ub"))
        .groupBy(F.col("ua").alias("src"), F.col("ub").alias("dst"))
        .agg(F.count("*").cast("long").alias("weight"))
        .where(F.col("weight") >= min_weight)
    )


def transition_counts(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    label_col: str,
) -> DataFrame:
    """Ordered-sequence bigram mining: counts of consecutive
    ``label -> label`` transitions within each group under the stable
    ``order_cols`` ordering (the transcript invariant: per-turn order is
    (conv_id, turn_idx); here any total order works), plus the
    conditional probability p(dst | src).

    One window (partitioned by group, so no global sort), one groupBy;
    counts are exact integers and p is a single IEEE double division of
    two of them — the cross-engine contract the SQL twin
    (:func:`transition_counts_sql`) replays exactly.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(*order_cols)
    pairs = (
        df.select(
            F.col(group_col),
            F.col(label_col).alias("dst_label"),
            F.lag(F.col(label_col)).over(w).alias("src_label"),
        )
        .where(F.col("src_label").isNotNull() & F.col("dst_label").isNotNull())
        .groupBy("src_label", "dst_label")
        .agg(F.count("*").alias("n"))
    )
    tot = pairs.groupBy("src_label").agg(F.sum("n").alias("_t"))
    return pairs.join(tot, "src_label").select(
        "src_label",
        "dst_label",
        "n",
        F.round(F.col("n") / F.col("_t"), 9).alias("p"),
    )


def transition_counts_sql(
    source_cte: str,
    group_col: str = "g",
    order_by: str = "o",
    label_col: str = "lab",
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`transition_counts`: ``source_cte`` must
    define ``seq(g, o, lab)`` (or the given column names); the ordering
    expression must be a total order within each group."""
    return f"""WITH {source_cte},
pairs AS MATERIALIZED (
  SELECT src_label, dst_label, COUNT(*) AS n FROM (
    SELECT LAG({label_col}) OVER (PARTITION BY {group_col} ORDER BY {order_by})
             AS src_label,
           {label_col} AS dst_label
    FROM seq) t
  WHERE src_label IS NOT NULL AND dst_label IS NOT NULL
  GROUP BY src_label, dst_label),
tot AS MATERIALIZED (
  SELECT src_label, SUM(n) AS t FROM pairs GROUP BY src_label)
SELECT p.src_label, p.dst_label, CAST(p.n AS BIGINT) AS n,
       ROUND(CAST(p.n AS DOUBLE) / t.t, {round_to}) AS p
FROM pairs p JOIN tot t ON p.src_label = t.src_label"""


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    horizon_us: int | None = None,
) -> DataFrame:
    """Ordered-funnel completion counts (the classic product-analytics
    funnel): for each prefix of ``steps``, how many users performed the
    steps IN ORDER — step k's event strictly after step k-1's — plus
    the exact total lag (microseconds from step 1) over completers.

    Semantics: t1 = min event time of steps[0]; t_k = min event time of
    steps[k-1] strictly after t_{k-1}. "Strictly after" compares epoch
    MICROseconds, so same-microsecond events never chain — a
    deterministic rule both engines share. ``horizon_us`` additionally
    requires t_k - t1 <= horizon_us (the "within N hours" funnel).

    Scale shape: one filtered min-aggregation per step (map-side
    combine over user keys), each joined user-to-user with the previous
    step's frame — k small (3-5), every join co-keyed on the user
    column. No window over the whole event stream, no per-user event
    arrays: hub users (10^6 events) collapse in the partial aggregates.

    Returns (step int, event_type, n_users, total_lag_us) — one row per
    funnel prefix, fully lazy (a union of 1-row aggregates).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    spark = events.sparkSession
    prev = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(us).alias("t1"))
        .select("u", "t1", F.col("t1").alias("tk"))
    )
    out = prev.agg(
        F.lit(1).alias("step"),
        F.lit(steps[0]).alias("event_type"),
        F.count("*").cast("long").alias("n_users"),
        F.lit(0).cast("long").alias("total_lag_us"),
    )
    for k, ev in enumerate(steps[1:], start=2):
        nxt = (
            events.where(F.col(type_col) == ev)
            .select(
                F.col(user_col).alias("u"), us.alias("t_ev")
            )
            .join(prev, "u")
            .where(F.col("t_ev") > F.col("tk"))
        )
        if horizon_us is not None:
            nxt = nxt.where(
                F.col("t_ev") - F.col("t1") <= F.lit(int(horizon_us))
            )
        prev = nxt.groupBy("u").agg(
            F.min("t1").alias("t1"), F.min("t_ev").alias("tk")
        )
        out = out.unionByName(
            prev.agg(
                F.lit(k).alias("step"),
                F.lit(ev).alias("event_type"),
                F.count("*").cast("long").alias("n_users"),
                F.coalesce(
                    F.sum(F.col("tk") - F.col("t1")), F.lit(0)
                ).cast("long").alias("total_lag_us"),
            )
        )
    return out
