"""Distributed Louvain-style modularity optimization.

Synchronous, deterministic modularity label moves + graph contraction
— the community-detection companion to label propagation (SURVEY.md
§2.10: the reference authors' LLP is a resolution-parameterized
relative of this objective; ``algos/llp.py`` implements LLP itself,
this module optimizes plain Newman modularity, the gamma-independent
quality score already reported by ``labelprop.modularity``).

Semantics chosen for exact cross-engine reproducibility (the same
design rule as labelprop.py / llp.py):

- **synchronous schedule**: every node evaluates moves against the
  PREVIOUS round's labels and community totals, so the result is
  independent of visit order and parallelism (classic sequential
  Louvain is visit-order-dependent and unreproducible on a cluster;
  synchronous parallel moves are the standard distributed variant,
  e.g. Que et al. IPDPS'15). Synchronous moves can oscillate on
  symmetric ties — bounded rounds, not convergence, is the contract.
- **integer-exact gain**: moving node i (strength s_i) from community
  cur to candidate c changes modularity by

      dQ(i->c) = k_ic/m - s_i * tot'_c / m^2     (+ const in c)

  where k_ic = arc mass from i into c, tot'_c = community strength
  with i removed, m = total arc mass. Scaled by m^2 > 0 the argmax is
  over the INTEGER score  m*k_ic - s_i*tot'_c  — no float arithmetic
  anywhere, so Spark, DuckDB, and numpy agree bit-for-bit. Scores are
  computed as DECIMAL(38,0): at 10^12 arcs and 10^7-strength hubs the
  product m*k overflows int64, decimal keeps it exact.
- **candidate set**: the node's neighbour communities plus its own
  (staying is always a candidate with its true k_i,cur, 0 if no
  neighbour shares the community). Argmax ties break to the MINIMUM
  community label. Isolated nodes keep their label.
- **alternating-parity move gate**: in round k only nodes with
  ``(node + k) % 2 == 0`` may move; the rest hold their label. Fully
  synchronous moves oscillate on symmetric structure — on a path
  graph every node adopts its left neighbour's label each round, so
  singleton labels shift forever and never merge (measured: Q < 0 on
  the chain-shaped transcript graph). Gating half the nodes per round
  breaks every 2-cycle deterministically (the distributed-Louvain
  standard remedy — vertex-coloring/partial-move rules in Que et al.
  IPDPS'15; parity is the 2-coloring special case) while staying
  order-independent, and costs nothing: the gate is a filter BEFORE
  the per-node argmax window, halving that stage's work.

Contraction (``louvain`` multi-level driver) replaces each community
with one node; arc multiplicities become integer weights, internal
arcs become self-loop weight, and the same move rule runs on the
weighted graph (k_ic excludes the self-loop, strength includes it) —
the textbook Louvain phase-2 with all mass kept integer.

Shuffle shape per round: one co-partitioned join of the arc table
against the label table (by dst) + one groupBy(src, label) with
map-side combine for k_ic, one tiny groupBy(label) for community
strengths (broadcast back), one per-node window for the argmax. The
only per-round state is the (node, label) table — O(n), same as LP —
so the plan survives a 100x scale-up exactly as LP does.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from ..operators.transforms import no_loops, symmetrize

DEC = "decimal(38,0)"


@dataclass
class LouvainResult:
    labels: DataFrame  # (node: long, label: long)
    rounds: int
    levels: int


def _weighted_sym(edges: DataFrame) -> DataFrame:
    """(src, dst, w=1) distinct symmetric loop-free arcs — the graph
    labelprop/modularity run on, with an explicit unit weight column so
    contracted levels reuse the same move kernel."""
    return no_loops(symmetrize(edges.select("src", "dst"))).withColumn(
        "w", F.lit(1).cast("long")
    )


def louvain_moves(
    edges: DataFrame,
    rounds: int = 2,
    num_partitions: int | None = None,
    weighted: bool = False,
) -> LouvainResult:
    """One Louvain level: ``rounds`` synchronous integer-exact
    modularity move rounds over the symmetrized simple graph.

    ``weighted=True`` treats ``edges`` as an already-symmetric
    (src, dst, w) arc table with integer weights and possible
    self-loops (the contracted graph of a previous level); self-loop
    weight counts toward node strength but never toward a move gain.
    """
    from ..plans.iterate import iterate, iteration_confs

    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    arcs = (
        edges.select("src", "dst", F.col("w").cast("long").alias("w"))
        if weighted
        else _weighted_sym(edges)
    )
    flow = (
        arcs.where(F.col("src") != F.col("dst"))
        .repartition(num_partitions, "dst")
        .persist()
    )

    # strength s_i = sum of incident arc weight INCLUDING self-loops
    # (contracted internal mass); m = total arc weight. Both exact longs.
    strength = (
        arcs.groupBy(F.col("src").alias("node"))
        .agg(F.sum("w").alias("s"))
        .persist()
    )
    m_total = int(arcs.agg(F.sum("w")).collect()[0][0] or 0)

    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels0 = nodes.select("node", F.col("node").alias("label"))

    m_lit = F.lit(m_total).cast(DEC)
    win = Window.partitionBy("node").orderBy(
        F.col("score").desc(), F.col("label").asc()
    )

    def step(labels: DataFrame, k: int):
        lab = labels.select("node", "label")
        # community strength totals from the PREVIOUS round's labels
        tot = (
            lab.join(strength.hint("shuffle_hash"), "node", "left")
            .groupBy("label")
            .agg(F.sum(F.coalesce("s", F.lit(0))).alias("tot"))
        )
        # k_ic: arc mass from each node into each neighbour community
        kic = (
            flow.join(
                lab.withColumnRenamed("node", "dst")
                .withColumnRenamed("label", "nbr_label")
                .hint("shuffle_hash"),
                "dst",
            )
            .groupBy(F.col("src").alias("node"), F.col("nbr_label").alias("label"))
            .agg(F.sum("w").alias("kic"))
        )
        # candidates = neighbour communities ∪ the stay option (kic may
        # already contain the stay row; max() keeps the true mass)
        stay = lab.select("node", "label", F.lit(0).cast("long").alias("kic"))
        cand = (
            kic.unionByName(stay)
            .groupBy("node", "label")
            .agg(F.max("kic").alias("kic"))
            # alternating-parity move gate (see module docstring)
            .where((F.col("node") + F.lit(k)) % 2 == 0)
        )
        cur = lab.withColumnRenamed("label", "cur")
        scored = (
            cand.join(cur.hint("shuffle_hash"), "node")
            .join(strength.hint("shuffle_hash"), "node", "left")
            .join(tot.hint("shuffle_hash"), "label", "left")
            .withColumn("s", F.coalesce("s", F.lit(0)))
            .withColumn("tot", F.coalesce("tot", F.lit(0)))
            .withColumn(
                "score",
                m_lit * F.col("kic").cast(DEC)
                - F.col("s").cast(DEC)
                * (
                    F.col("tot")
                    - F.when(F.col("label") == F.col("cur"), F.col("s")).otherwise(
                        F.lit(0)
                    )
                ).cast(DEC),
            )
        )
        from pyspark.sql import Observation

        best = (
            scored.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        obs = Observation()
        new_labels = (
            lab.join(best.hint("shuffle_hash"), "node", "left")
            .select(
                "node",
                F.col("label").alias("_old"),
                F.coalesce("new_label", "label").alias("label"),
            )
            .observe(
                obs,
                F.sum(
                    F.when(F.col("label") != F.col("_old"), 1).otherwise(0)
                ).alias("moved"),
            )
            .select("node", "label")
        )
        return new_labels, {}, obs

    # convergence = BOTH parities quiet: one moved==0 round only says
    # that round's parity class is at a fixpoint
    quiet = {"streak": 0}

    def stop(obs_metrics: dict, k: int) -> bool:
        quiet["streak"] = quiet["streak"] + 1 if obs_metrics.get("moved", 1) == 0 else 0
        return quiet["streak"] >= 2

    with iteration_confs(spark):
        labels, it, _ = iterate(
            spark,
            labels0,
            step,
            max_iter=rounds,
            run_id="louvain_moves",
            stop=stop,
        )
    flow.unpersist()
    strength.unpersist()
    return LouvainResult(labels, it, 1)


def contract(edges_w: DataFrame, labels: DataFrame) -> DataFrame:
    """Phase-2 contraction: quotient the weighted symmetric arc table by
    the community map. Internal arcs become self-loops whose weight is
    the community's internal arc mass (kept — it feeds strength at the
    next level). One groupBy shuffle; output is community-count sized."""
    lab_s = labels.withColumnRenamed("node", "src").withColumnRenamed(
        "label", "lsrc"
    )
    lab_d = labels.withColumnRenamed("node", "dst").withColumnRenamed(
        "label", "ldst"
    )
    return (
        edges_w.join(lab_s.hint("shuffle_hash"), "src")
        .join(lab_d.hint("shuffle_hash"), "dst")
        .groupBy(F.col("lsrc").alias("src"), F.col("ldst").alias("dst"))
        .agg(F.sum("w").alias("w"))
    )


def louvain(
    edges: DataFrame,
    levels: int = 2,
    rounds: int = 4,
    num_partitions: int | None = None,
) -> LouvainResult:
    """Multi-level Louvain: move rounds, contract, repeat; the returned
    labels map every ORIGINAL node to its final (top-level) community.
    Each level's graph is community-count sized, so levels get cheap."""
    arcs = _weighted_sym(edges)
    mapping = None  # node -> current community
    total_rounds = 0
    for lvl in range(levels):
        res = louvain_moves(
            arcs if lvl else edges,
            rounds=rounds,
            num_partitions=num_partitions,
            weighted=bool(lvl),
        )
        total_rounds += res.rounds
        if mapping is None:
            mapping = res.labels
        else:
            mapping = (
                mapping.join(
                    res.labels.withColumnRenamed("label", "new_label")
                    .withColumnRenamed("node", "label"),
                    "label",
                )
                .select("node", F.col("new_label").alias("label"))
            )
        mapping = mapping.localCheckpoint(eager=True)
        arcs = contract(arcs, res.labels).localCheckpoint(eager=True)
    return LouvainResult(mapping, total_rounds, levels)


# ---------------------------------------------------------------- oracle


def louvain_moves_numpy(
    adj: np.ndarray,
    rounds: int = 2,
    weights: np.ndarray | None = None,
    node_ids: np.ndarray | None = None,
) -> np.ndarray:
    """Single-process twin with the identical synchronous integer rule.

    ``adj`` is any directed boolean adjacency; it is symmetrized and
    de-looped exactly like the Spark path. ``weights`` (optional int
    matrix, symmetric, may carry a diagonal) switches to weighted mode.
    ``node_ids`` maps matrix index -> real node id for the parity gate
    (required when indices aren't the ids, e.g. a contracted graph).
    """
    if weights is None:
        w = (adj | adj.T).astype(np.int64)
        np.fill_diagonal(w, 0)
    else:
        w = weights.astype(np.int64)
    n = w.shape[0]
    off = w.copy()
    np.fill_diagonal(off, 0)
    s = w.sum(axis=1)  # strength incl. self-loops
    m = int(w.sum())
    labels = np.arange(n)
    quiet = 0
    for rk in range(1, rounds + 1):
        tot = np.bincount(labels, weights=s, minlength=n).astype(object)
        new = labels.copy()
        moved = False
        for i in range(n):
            nid = int(node_ids[i]) if node_ids is not None else i
            if (nid + rk) % 2 != 0:  # alternating-parity move gate
                continue
            # k_ic over neighbour communities + stay
            kic: dict[int, int] = {int(labels[i]): 0}
            for j in np.nonzero(off[i])[0]:
                c = int(labels[j])
                kic[c] = kic.get(c, 0) + int(off[i, j])
            best_c, best_score = None, None
            for c in sorted(kic):
                totp = int(tot[c]) - (int(s[i]) if c == labels[i] else 0)
                score = m * kic[c] - int(s[i]) * totp
                if best_score is None or score > best_score:
                    best_c, best_score = c, score
            if best_c != labels[i]:
                moved = True
            new[i] = best_c
        labels = new
        quiet = quiet + 1 if not moved else 0
        if quiet >= 2:
            break
    return labels
