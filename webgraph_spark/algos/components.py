"""Connected components via hash-min label propagation.

Reference contract: ConnectedComponents.java:44-101 computes components
of a SYMMETRIC graph (BFS rounds); tests compare component *partitions*,
not label values (ConnectedComponentsTest.java:32-43). The north rule
mandates the hash-min dataflow: ``label <- min(label, min over neighbor
labels)`` iterated to fixpoint — same partition, labels = min node id of
each component; converges in O(diameter) Spark jobs.

``sort_components_by_size`` renumbers components by decreasing size
(ConnectedComponents.computeSizes/sortBySize, ConnectedComponents.java:148-173)
and ``largest_component`` extracts the biggest one re-indexed
(ConnectedComponents.java:111-141).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from ..operators.transforms import symmetrize


@dataclass
class ComponentsResult:
    labels: DataFrame  # (node: long, component: long) — component = min node id
    iterations: int
    converged: bool


def connected_components(
    edges: DataFrame,
    max_iter: int = 50,
    num_partitions: int | None = None,
    assume_symmetric: bool = False,
    checkpoint_dir: str | None = None,
    run_id: str = "cc",
    init_labels: DataFrame | None = None,
    algorithm: str = "auto",
) -> ComponentsResult:
    """Connected components over ``edges(src, dst)`` (directions ignored).

    ``algorithm`` selects the fixpoint engine:

    - ``"auto"`` (default): the O(log n)-round large-star/small-star
      path (:func:`connected_components_stars`) — on a 100-TB graph a
      high-diameter component costs hash-min one full shuffle round
      PER HOP, so log-rounds is the only scale-safe default. Falls
      back to hash-min when ``init_labels`` is given (the incremental
      warm-start is a hash-min-specific contract).
    - ``"stars"``: force the log-round path.
    - ``"hashmin"``: force hash-min label propagation — the variant
      whose PARTIAL ``max_iter``-round state is oracle-defined (the
      k-round unroll the DuckDB twins replicate); converged labels are
      identical between the two (component = min node id).

    ``init_labels`` (node, component) WARM-STARTS the iteration — the
    incremental-maintenance path for a continuously-ingested graph
    (streaming/events.py): seed with the previous snapshot's labels and
    hash-min only has to propagate across the NEW arcs (edge additions
    can only merge components, never split them — min labels are
    monotone non-increasing, so any valid previous labeling is a sound
    starting point). New nodes default to self-labels; a stale label
    must itself be a node id from the previous snapshot, so the
    fixpoint is the same min-node-id labeling as a cold start (tested:
    small edge deltas converge in a fraction of the cold-start
    rounds). Deletions are NOT incremental — recompute cold.
    """
    if algorithm not in ("auto", "hashmin", "stars"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if algorithm == "stars" or (algorithm == "auto" and init_labels is None):
        return connected_components_stars(
            edges,
            max_iter=max_iter,
            num_partitions=num_partitions,
            checkpoint_dir=checkpoint_dir,
            run_id=run_id,
        )
    from ..plans.iterate import iterate

    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    from ..operators.transforms import no_loops

    # node set from ALL edge endpoints (a node appearing only in a
    # self-loop is still a node and labels itself); self-loops are then
    # dropped from the propagation edges — they can never change a min
    sym = edges.select("src", "dst") if assume_symmetric else symmetrize(edges)
    sym = no_loops(sym).repartition(num_partitions, "src").persist()

    labels0 = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("component"))
    )
    if init_labels is not None:
        labels0 = (
            labels0.join(
                init_labels.select(
                    "node", F.col("component").alias("_c0")
                ),
                "node",
                "left",
            )
            # a previous label can only be <= the self-label; least()
            # guards against a malformed seed making labels grow
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("_c0", F.col("component"))
                ).alias("component"),
            )
        )
    labels0 = labels0.repartition(num_partitions, "node")

    def step(labels: DataFrame, k: int):
        from pyspark.sql import Observation

        msgs = (
            sym.join(labels.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        obs = Observation()
        new_labels = (
            labels.join(msgs.hint("shuffle_hash"), "node", "left")
            .select(
                "node",
                F.col("component").alias("_old"),
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
            )
            .observe(
                obs,
                F.sum(
                    F.when(F.col("component") != F.col("_old"), 1).otherwise(0)
                ).alias("changed"),
            )
            .select("node", "component")
        )
        return new_labels, {}, obs

    def stop(obs_metrics: dict, k: int) -> bool:
        return obs_metrics.get("changed", 1) == 0

    from ..plans.iterate import iteration_confs

    with iteration_confs(spark):
        labels, it, done = iterate(
            spark,
            labels0,
            step,
            max_iter=max_iter,
            checkpoint_dir=checkpoint_dir,
            run_id=run_id,
            stop=stop,
        )
    sym.unpersist()
    return ComponentsResult(labels, it, done)


def component_sizes(labels: DataFrame) -> DataFrame:
    """(component, size) histogram (ConnectedComponents.computeSizes)."""
    return labels.groupBy("component").agg(F.count("*").alias("size"))


def sort_components_by_size(labels: DataFrame) -> DataFrame:
    """Renumber components 0..c-1 by decreasing size, ties by min node id
    (ConnectedComponents.sortBySize analog). Returns (node, component).

    The component count is orders of magnitude below the node count, so
    the size table is small; rank it with a dense-id pass and join back.
    """
    from ..util.ids import assign_dense_ids

    sizes = component_sizes(labels).withColumn("_key", -F.col("size"))
    ranked = assign_dense_ids(sizes, ["_key", "component"], id_col="rank").select(
        F.col("component").alias("_c"), F.col("rank")
    )
    return (
        labels.join(F.broadcast(ranked), labels.component == F.col("_c"))
        .select("node", F.col("rank").alias("component"))
    )


def largest_component(edges: DataFrame, labels: DataFrame | None = None):
    """Extract the largest component as a re-indexed subgraph
    (ConnectedComponents.getLargestComponent). Returns (sub_edges, id_map)."""
    from ..operators.transforms import induced_subgraph

    if labels is None:
        labels = connected_components(edges).labels
    top = (
        component_sizes(labels)
        .orderBy(F.col("size").desc(), F.col("component"))
        .limit(1)
    )
    keep = labels.join(
        F.broadcast(top.select("component")), "component", "left_semi"
    ).select("node")
    return induced_subgraph(edges, keep, reindex=True)


def connected_components_stars(
    edges: DataFrame,
    max_iter: int = 30,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    run_id: str = "cc_stars",
) -> ComponentsResult:
    """Connected components via alternating LARGE-STAR / SMALL-STAR edge
    rewriting (Kiveris et al., "Connected Components in MapReduce and
    Beyond" — the O(log n)-round algorithm). Converges to a star forest
    whose center is each component's minimum node id, so the labels are
    IDENTICAL to :func:`connected_components`'s hash-min fixpoint — but
    in rounds logarithmic in component size instead of linear in
    component DIAMETER. On a 100-TB graph whose components contain long
    paths (transcript turn chains), hash-min pays one full shuffle per
    hop of diameter; this pays ~log2(n) rounds total, each a constant
    number of same-keyed shuffles.

    large-star(u): m = min(neighborhood(u) + {u}); every strict-greater
    neighbor v > u re-attaches as (v, m). small-star: orient edges
    toward the smaller endpoint, re-attach all non-min smaller
    neighbors plus u itself to m. Both preserve connectivity; alternated
    to a fixpoint the edge set IS the (node -> component-min) map.

    Reference contract: same partition/labels as
    ConnectedComponents.java:44-101 (tests compare partitions).
    """
    from ..plans.iterate import iterate, iteration_confs

    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    from ..operators.transforms import no_loops

    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(num_partitions, "node")
        .persist()
    )
    state0 = (
        no_loops(edges.select("src", "dst"))
        .distinct()
        .repartition(num_partitions, "src")
    )

    def _large_star(e: DataFrame) -> DataFrame:
        nbr = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mins = nbr.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        return (
            nbr.where(F.col("dst") > F.col("src"))
            .join(mins.hint("shuffle_hash"), "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .where(F.col("src") != F.col("dst"))
        )

    def _small_star(e: DataFrame) -> DataFrame:
        e2 = e.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        ).where(F.col("src") != F.col("dst"))
        mins = e2.groupBy("src").agg(F.min("dst").alias("m"))
        moved = (
            e2.join(mins.hint("shuffle_hash"), "src")
            .where(F.col("dst") != F.col("m"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        centers = mins.select("src", F.col("m").alias("dst"))
        return moved.unionByName(centers).where(F.col("src") != F.col("dst"))

    # fixpoint detection: the (count, xxhash64-sum) fingerprint of the
    # distinct edge set is stable across a full LS+SS round only at the
    # star forest (both transforms are identity exactly there); the
    # fingerprint rides the materializing action as an Observation
    prev_fp: list = [None]

    def step(e: DataFrame, k: int):
        from pyspark.sql import Observation

        obs = Observation()
        new_e = (
            _small_star(_large_star(e))
            .distinct()
            .repartition(num_partitions, "src")
            .observe(
                obs,
                F.count(F.lit(1)).alias("n_e"),
                # decimal(38,0) sum: xxhash64 values are ~19 digits, so the
                # sum stays exact (and ANSI-overflow-free) to ~10^19 edges
                F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("fp"),
            )
        )
        return new_e, {}, obs

    def stop(obs_metrics: dict, k: int) -> bool:
        fp = (obs_metrics.get("n_e"), obs_metrics.get("fp"))
        done = fp == prev_fp[0]
        prev_fp[0] = fp
        return done

    with iteration_confs(spark):
        star, it, done = iterate(
            spark,
            state0,
            step,
            max_iter=max_iter,
            checkpoint_dir=checkpoint_dir,
            run_id=run_id,
            stop=stop,
        )

    labels = (
        nodes.join(
            star.select(F.col("src").alias("node"), F.col("dst").alias("_m"))
            .hint("shuffle_hash"),
            "node",
            "left",
        )
        .select("node", F.coalesce(F.col("_m"), F.col("node")).alias("component"))
    )
    nodes.unpersist()
    return ComponentsResult(labels, it, done)


def merge_components_incremental(
    labels: DataFrame,
    new_edges: DataFrame,
    max_iter: int = 50,
    num_partitions: int | None = None,
) -> ComponentsResult:
    """Exact incremental CC maintenance by contraction: given the
    previous snapshot's ``labels(node, component)`` and a batch of
    ``new_edges(src, dst)``, return the labels of the union graph
    WITHOUT rescanning the old edge table.

    Edge additions only merge components, so the old graph can be
    contracted to its component ids: relabel the batch's endpoints
    through ``labels`` (unseen endpoints are new nodes labeling
    themselves), drop now-internal arcs, run hash-min CC on the
    resulting DELTA GRAPH — whose size is bounded by the batch, not the
    accumulated graph — and compose the merge map back onto the label
    table. Work beyond the one label-table join is O(batch + affected
    components); this is the streaming-maintenance path
    (streaming/events.py ingests arcs, this folds them into labels).

    Correctness: contracting a graph by any valid component labeling
    preserves connectivity between labels, and min-id labels compose
    (the merge map sends each old component id to the min old id in its
    merged group, which is the min NODE id of the merged component
    because old ids are themselves min node ids). Same fixpoint as a
    cold run over the union graph (tested on random deltas); deletions
    are not incremental — recompute cold.
    """
    spark = labels.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    la = labels.select(
        F.col("node").alias("src"), F.col("component").alias("_ca")
    )
    lb = labels.select(
        F.col("node").alias("dst"), F.col("component").alias("_cb")
    )
    relabeled = (
        new_edges.select("src", "dst")
        .join(la, "src", "left")
        .join(lb, "dst", "left")
        .select(
            F.coalesce("_ca", F.col("src")).alias("src"),
            F.coalesce("_cb", F.col("dst")).alias("dst"),
        )
    )
    delta = relabeled.where(F.col("src") != F.col("dst"))
    merge = connected_components(
        delta, max_iter=max_iter, num_partitions=num_partitions
    )
    mm = merge.labels.select(
        F.col("node").alias("component"), F.col("component").alias("_m")
    )
    old = labels.join(mm, "component", "left").select(
        "node", F.coalesce("_m", F.col("component")).alias("component")
    )
    new_nodes = (
        new_edges.select(F.col("src").alias("node"))
        .unionByName(new_edges.select(F.col("dst").alias("node")))
        .distinct()
        .join(labels.select("node"), "node", "left_anti")
        # a new node's delta-graph id IS its node id (it labeled itself
        # in the relabel step); loop-only new nodes miss and self-label
        .join(merge.labels.select("node", "component"), "node", "left")
        .select("node", F.coalesce("component", F.col("node")).alias("component"))
    )
    out = old.unionByName(new_nodes).repartition(num_partitions, "node")
    return ComponentsResult(out, merge.iterations, merge.converged)


def attack_tolerance(
    edges: DataFrame,
    ks: list[int],
    max_iter: int = 40,
    num_partitions: int | None = None,
) -> DataFrame:
    """Hub-removal robustness curve (Albert-Jeong-Barabasi, Nature
    2000 — "error and attack tolerance of complex networks", the other
    canonical whole-web structural analysis beside the bowtie): for
    each k, delete the k highest-sym-degree nodes (deg DESC, node ASC
    tie-break) and report how the graph fragments.

    Returns one row per k: (k, n_nodes, n_arcs, largest_cc,
    n_components) over the surviving symmetrized loop-free graph.

    Scale shape: the hub list is top-k of a degree aggregate (tiny,
    broadcast into a filter — deleting hubs is a scan, not a shuffle);
    each surviving graph runs large-star/small-star CC (O(log n)
    rounds). len(ks) curves = len(ks) independent CC jobs; the curve
    is usually 3-5 points.
    """
    from ..operators.transforms import no_loops

    sym_all = no_loops(symmetrize(edges.select("src", "dst"))).persist()
    deg = sym_all.groupBy("src").agg(F.count("*").alias("d"))
    spark = edges.sparkSession
    out: list[tuple] = []
    for k in ks:
        if k > 0:
            hubs = [
                int(r["src"])
                for r in deg.orderBy(F.col("d").desc(), F.col("src").asc())
                .limit(k)
                .collect()
            ]
            sym = sym_all.where(
                ~F.col("src").isin(hubs) & ~F.col("dst").isin(hubs)
            )
        else:
            sym = sym_all
        res = connected_components_stars(
            sym, max_iter=max_iter, num_partitions=num_partitions
        )
        if not res.converged:
            raise RuntimeError(
                f"attack_tolerance CC truncated at k={k}; raise max_iter"
            )
        # isolated survivors (every neighbor deleted) leave the arc
        # table and are not counted — the curve is over nodes that
        # still participate in the graph, mirrored by the oracle
        sizes = res.labels.groupBy("component").agg(
            F.count("*").alias("sz")
        )
        stat = sizes.agg(
            F.max("sz").cast("long").alias("largest_cc"),
            F.count("*").cast("long").alias("n_components"),
            F.sum("sz").cast("long").alias("n_nodes"),
        ).collect()[0]
        n_arcs = sym.count()
        out.append(
            (
                int(k),
                int(stat["n_nodes"] or 0),
                int(n_arcs),
                int(stat["largest_cc"] or 0),
                int(stat["n_components"]),
            )
        )
    sym_all.unpersist()
    return spark.createDataFrame(
        out,
        "k int, n_nodes long, n_arcs long, largest_cc long, "
        "n_components long",
    )


def random_failure_tolerance(
    edges: DataFrame,
    permilles: list[int],
    max_iter: int = 40,
    num_partitions: int | None = None,
) -> DataFrame:
    """Random-FAILURE robustness curve — the companion experiment to
    :func:`attack_tolerance` in Albert-Jeong-Barabasi (Nature 2000):
    instead of the k largest hubs, delete a uniformly "random" fraction
    of nodes and measure fragmentation. Scale-free graphs are famously
    resilient to random failure yet fragile to targeted attack; the two
    curves side by side are the canonical robustness diagnostic.

    Determinism: the coin is the engine-portable md5 hash of the node
    id — node survives iff md5_long('rf:' || node) % 1000 >= permille —
    so both engines (and any rerun) delete the identical node set; no
    RNG state, no sampling nondeterminism.

    Scale shape: node deletion is a hash predicate pushed into the edge
    scan (no hub list, no broadcast at all); each surviving graph runs
    large-star/small-star CC (O(log n) rounds). len(permilles)
    independent CC jobs.

    Returns one row per level: (permille, n_nodes, n_arcs, largest_cc,
    n_components) over the surviving symmetrized loop-free graph.
    """
    from ..functions.hashing import md5_long
    from ..operators.transforms import no_loops

    sym_all = no_loops(symmetrize(edges.select("src", "dst"))).persist()
    spark = edges.sparkSession

    def coin(col: str) -> Column:
        return md5_long(
            F.concat(F.lit("rf:"), F.col(col).cast("string"))
        ) % 1000

    out: list[tuple] = []
    for pm in permilles:
        if pm > 0:
            sym = sym_all.where(
                (coin("src") >= pm) & (coin("dst") >= pm)
            )
        else:
            sym = sym_all
        res = connected_components_stars(
            sym, max_iter=max_iter, num_partitions=num_partitions
        )
        if not res.converged:
            raise RuntimeError(
                f"random_failure CC truncated at permille={pm}; "
                "raise max_iter"
            )
        sizes = res.labels.groupBy("component").agg(
            F.count("*").alias("sz")
        )
        stat = sizes.agg(
            F.max("sz").cast("long").alias("largest_cc"),
            F.count("*").cast("long").alias("n_components"),
            F.sum("sz").cast("long").alias("n_nodes"),
        ).collect()[0]
        n_arcs = sym.count()
        out.append(
            (
                int(pm),
                int(stat["n_nodes"] or 0),
                int(n_arcs),
                int(stat["largest_cc"] or 0),
                int(stat["n_components"]),
            )
        )
    sym_all.unpersist()
    return spark.createDataFrame(
        out,
        "permille int, n_nodes long, n_arcs long, largest_cc long, "
        "n_components long",
    )
