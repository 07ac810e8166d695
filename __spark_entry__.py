"""Driver contract for the spark-graft builder (PySpark target).

queries() exposes the engine's operator inventory over the driver's
test tables; oracle_sql() returns DuckDB twins. Iterative algorithms use
UNROLLED k-round SQL (webgraph_spark.graph.testdata generators) so both
engines execute the same recurrence from the same initialization.
Floating-point outputs are ROUNDed on both sides; integer outputs are
cast to BIGINT on both sides; hashing uses the engine-portable md5/
universal-hash family (webgraph_spark.functions.hashing).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from webgraph_spark.algos.bfs import bfs
from webgraph_spark.algos.components import connected_components
from webgraph_spark.algos.labelprop import label_propagation
from webgraph_spark.algos.pagerank import pagerank
from webgraph_spark.algos.triangles import triangle_count
from webgraph_spark.functions.dedup import (
    DEFAULT_MAX_BUCKET,
    lsh_band_keys,
    minhash_lsh_candidates,
    minhash_signatures,
    near_dup_clusters,
    ngram_jaccard,
    simhash16,
)
from webgraph_spark.functions.hashing import (
    MERSENNE_P,
    hash_family,
    md5_long_sql as _md5_sql,
)
from webgraph_spark.functions.similarity import cosine_topk, cosine_topk_lsh
from webgraph_spark.functions import clustering as _clustering
from webgraph_spark.algos import motifs as _motifs
from webgraph_spark.functions import mining as _mining
from webgraph_spark.functions import retrieval as _retrieval
from webgraph_spark.functions import similarity as _similarity
from webgraph_spark.algos import features as _features
from webgraph_spark.functions import mlscore as _mlscore
from webgraph_spark.functions import sketches as _sketches
from webgraph_spark.functions.text import STOPWORDS_EN, text_stats
from webgraph_spark.graph import testdata as td
from webgraph_spark.operators.csr import pack_csr, unpack_csr
from webgraph_spark.operators.degrees import degree_distribution, graph_stats
from webgraph_spark.operators.transforms import compose, map_nodes

SF_DEFAULT = "/root/testdata/sf0.001"
NUM_HASHES = 16
BAND_ROWS = 4
SHINGLE = 3
HASH_SEED = 12345
DEDUP_THRESHOLD = 0.8
_A, _B = hash_family(NUM_HASHES, HASH_SEED)


# --------------------------------------------------------------- flagship

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank over the sf0.001 link graph, top-20 with
    node-kind decoding (driver smoke check)."""
    edges = td.tpch_edges(spark, SF_DEFAULT)
    res = pagerank(edges, tol=1e-6, max_iter=60, num_partitions=16)
    kind = (
        F.when(F.col("node") < td.OFF_ORDER, F.lit("customer"))
        .when(F.col("node") < td.OFF_PART, F.lit("order"))
        .when(F.col("node") < td.OFF_SUPP, F.lit("part"))
        .otherwise(F.lit("supplier"))
    )
    return (
        res.ranks.select("node", kind.alias("kind"), F.round("rank", 9).alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("node"))
        .limit(20)
    )


# ---------------------------------------------------------------- queries

def _edges(spark, sf_dir):
    return td.tpch_edges(spark, sf_dir)


def q_degree_out(spark, sf_dir):
    return degree_distribution(_edges(spark, sf_dir), "out").select(
        F.col("degree").cast("long").alias("degree"),
        F.col("n_nodes").cast("long").alias("n_nodes"),
    )


def q_degree_in(spark, sf_dir):
    return degree_distribution(_edges(spark, sf_dir), "in").select(
        F.col("degree").cast("long").alias("degree"),
        F.col("n_nodes").cast("long").alias("n_nodes"),
    )


def q_graph_stats(spark, sf_dir):
    return graph_stats(_edges(spark, sf_dir)).select(
        F.col("nodes").cast("long"),
        F.col("arcs").cast("long"),
        F.col("loops").cast("long"),
        F.col("dangling").cast("long"),
        F.col("minoutdegree").cast("long"),
        F.col("maxoutdegree").cast("long"),
        F.round("avgoutdegree_nonzero", 6).alias("avgoutdegree_nonzero"),
    )


def q_pagerank5(spark, sf_dir):
    res = pagerank(_edges(spark, sf_dir), fixed_iterations=5, num_partitions=16)
    return res.ranks.select("node", F.round("rank", 9).alias("rank"))


def q_cc8(spark, sf_dir):
    # algorithm pinned: the oracle replicates the 8-round hash-min
    # PARTIAL state, which only the hashmin engine produces
    res = connected_components(
        _edges(spark, sf_dir), max_iter=8, num_partitions=16,
        algorithm="hashmin",
    )
    return res.labels.select("node", "component")


def q_lp3(spark, sf_dir):
    res = label_propagation(_edges(spark, sf_dir), max_iter=3, num_partitions=16)
    return res.labels.select("node", "label")


def q_modularity3(spark, sf_dir):
    """Modularity Q of the 3-round label-propagation partition — the
    LLP-style community-quality score (SURVEY.md §2.10)."""
    from webgraph_spark.algos.labelprop import modularity

    e = _edges(spark, sf_dir)
    res = label_propagation(e, max_iter=3, num_partitions=16)
    return modularity(e, res.labels)


def q_conductance(spark, sf_dir):
    """Conductance of the 5 largest LP(3) communities — exact integer
    cut/vol, one rounded division (algos/labelprop.py:
    community_conductance); the per-community quality companion to Q."""
    from webgraph_spark.algos.labelprop import community_conductance

    e = _edges(spark, sf_dir)
    res = label_propagation(e, max_iter=3, num_partitions=16)
    return community_conductance(e, res.labels, k=5)


def q_louvain2(spark, sf_dir):
    """Two synchronous integer-exact Louvain modularity move rounds
    (algos/louvain.py) — the distributed community-detection companion
    to LP/LLP; deterministic at any parallelism, HUGEINT-scored gains."""
    from webgraph_spark.algos.louvain import louvain_moves

    res = louvain_moves(_edges(spark, sf_dir), rounds=2, num_partitions=16)
    return res.labels.select("node", "label")


def q_hitting6(spark, sf_dir):
    """Truncated random-walk hitting time to the supplier layer
    (algos/paths.py:hitting_time): expected steps for the uniform walk
    on the symmetric graph to first reach a supplier node, value
    iteration truncated at 6 — decimal-exact sums, bit-equal twin."""
    from webgraph_spark.algos.paths import hitting_time
    from webgraph_spark.graph.testdata import OFF_SUPP

    e = _edges(spark, sf_dir)
    targets = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .where(F.col("node") >= OFF_SUPP)
        .distinct()
    )
    return hitting_time(e, targets, iters=6, num_partitions=16)


def q_triangles(spark, sf_dir):
    n = triangle_count(_edges(spark, sf_dir))
    return spark.createDataFrame([(n,)], "triangles long")


def q_doulion(spark, sf_dir):
    """DOULION sparsified triangle estimate (Tsourakakis KDD'09;
    algos/triangles.py:doulion_estimate): deterministic md5 edge coin
    keeps ~1/4 of canonical undirected pairs, exact degree-oriented
    count on the sparsified graph, 4^3 scale-up — the estimator for
    graphs where even the oriented exact count is too heavy."""
    from webgraph_spark.algos.triangles import doulion_estimate

    kept, tri, est = doulion_estimate(_edges(spark, sf_dir), k=4)
    return spark.createDataFrame(
        [(kept, tri, est)],
        "kept_edges long, triangles_sampled long, estimate double",
    )


def q_rmat_degrees(spark, sf_dir):
    """Deterministic distributed R-MAT generation (Graph500 input
    model; datagen/graphs.py:rmat): 32768 edges at scale 12 decided by
    engine-portable md5 quadrant coins against integer thresholds,
    then the out-degree distribution of the distinct-arc view — one
    generation projection with no shuffle, one groupBy chain."""
    from webgraph_spark.datagen.graphs import rmat

    e = rmat(spark, scale=12, n_edges=32768, seed=7).distinct()
    return (
        e.groupBy("src").count()
        .groupBy(F.col("count").alias("degree"))
        .agg(F.count("*").alias("n_nodes"))
        .select(F.col("degree").cast("long"), F.col("n_nodes").cast("long"))
    )


def q_bfs3(spark, sf_dir):
    e = _edges(spark, sf_dir)
    src = e.where(F.col("src") < td.OFF_ORDER).agg(F.min("src")).collect()[0][0]
    res = bfs(e, [int(src)], max_rounds=3, num_partitions=16)
    return res.distances.select("node", F.col("dist").cast("long").alias("dist"))


def q_compose(spark, sf_dir):
    e = _edges(spark, sf_dir)
    cust_order = e.where(F.col("src") < td.OFF_ORDER)
    order_part = e.where(
        (F.col("dst") >= td.OFF_PART) & (F.col("dst") < td.OFF_SUPP)
        & (F.col("src") >= td.OFF_ORDER) & (F.col("src") < td.OFF_PART)
    )
    return compose(cust_order, order_part)


def q_quotient_nation(spark, sf_dir):
    e = _edges(spark, sf_dir)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    mapping = nodes.join(
        cust.select(
            F.col("c_custkey").alias("node"),
            (F.lit(td.OFF_NATION) + F.col("c_nationkey")).alias("t"),
        ),
        "node",
        "left",
    ).select("node", F.coalesce("t", "node").alias("target"))
    return map_nodes(e, mapping)


def q_csr_roundtrip(spark, sf_dir):
    e = _edges(spark, sf_dir)
    return unpack_csr(pack_csr(e, num_blocks=8)).select("src", "dst")


def q_bv_stream_roundtrip(spark, sf_dir):
    """REAL γ-coded bitstream pack (split-γ, operators/bitstream.py):
    store -> load -> same arc set. Unlike csr_roundtrip this exercises
    physical bit packing (BVGraph.store/load record grammar at the
    residual level, BVGraph.java:526,2198,2202), not raw int64 arrays."""
    from webgraph_spark.operators.bitstream import pack_bv, unpack_bv

    e = _edges(spark, sf_dir)
    return unpack_bv(pack_bv(e, num_blocks=8)).select("src", "dst")


def q_bv_labelled_roundtrip(spark, sf_dir):
    """Labelled bitstream roundtrip: arc-multiplicity labels γ-coded
    into a parallel substream (BitStreamArcLabelledImmutableGraph +
    GammaCodedIntLabel analog, labelling/BitStreamArcLabelledImmutable-
    Graph.java:60-86) — store -> load -> same (src, dst, label) set."""
    from webgraph_spark.operators.bitstream import pack_bv, unpack_bv

    e = td.tpch_edges_labelled(spark, sf_dir)
    return unpack_bv(pack_bv(e, num_blocks=8, label_col="label"), labelled=True)


def q_bvdisk_labelled_roundtrip(spark, sf_dir):
    """Native LABELLED on-disk interop: γ-coded arc labels in the
    reference's BitStreamArcLabelledImmutableGraph layout (.labels /
    .labeloffsets / underlyinggraph property) around a real BVGraph
    underlying file — densify → storeLabelled → distributed load →
    map ids back. Same twin as bv_labelled_roundtrip (our columnar
    labelled format), different physical layout."""
    import tempfile

    from webgraph_spark.sources.bvdisk import (
        read_bvgraph_labelled,
        write_bvgraph_distributed,
    )
    from webgraph_spark.util.ids import assign_dense_ids

    e = td.tpch_edges_labelled(spark, sf_dir)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    ids = assign_dense_ids(nodes, ["node"], id_col="nid").persist()
    dense = (
        e.join(ids.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("nid", "dsrc")
        .join(ids.withColumnRenamed("node", "dst"), "dst")
        .withColumnRenamed("nid", "ddst")
        .select(F.col("dsrc").alias("src"), F.col("ddst").alias("dst"),
                "label")
    )
    base = tempfile.mkdtemp(prefix="bvdisk_lab_") + "/g"
    write_bvgraph_distributed(dense, base, num_partitions=8,
                              label_col="label")
    back = read_bvgraph_labelled(spark, base, num_partitions=8)
    return (
        back.join(ids.withColumnRenamed("nid", "src"), "src")
        .withColumnRenamed("node", "osrc")
        .join(ids.withColumnRenamed("nid", "dst"), "dst")
        .withColumnRenamed("node", "odst")
        .select(F.col("osrc").alias("src"), F.col("odst").alias("dst"),
                F.col("label").cast("long").alias("label"))
    )


def q_bvdisk_fixed_label_roundtrip(spark, sf_dir):
    """Native labelled interop with FIXED-WIDTH labels
    (labelling/FixedWidthIntLabel.java:71-74: width bits per arc, no
    code prefix — vs the γ-coded layout of bvdisk_labelled_roundtrip):
    densify → store at width=16 → distributed load (the labelspec
    property drives the decode) → map ids back. Same value oracle as
    the γ twin; only the physical label coding differs."""
    import tempfile

    from webgraph_spark.sources.bvdisk import (
        read_bvgraph_labelled,
        write_bvgraph_labelled_from_edges,
    )
    from webgraph_spark.util.ids import assign_dense_ids

    e = td.tpch_edges_labelled(spark, sf_dir)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    ids = assign_dense_ids(nodes, ["node"], id_col="nid").persist()
    dense = (
        e.join(ids.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("nid", "dsrc")
        .join(ids.withColumnRenamed("node", "dst"), "dst")
        .withColumnRenamed("nid", "ddst")
        .select(F.col("dsrc").alias("src"), F.col("ddst").alias("dst"),
                "label")
    )
    base = tempfile.mkdtemp(prefix="bvdisk_fw_") + "/g"
    write_bvgraph_labelled_from_edges(
        dense, base, label_kind="fixed", label_width=16)
    back = read_bvgraph_labelled(spark, base, num_partitions=8)
    return (
        back.join(ids.withColumnRenamed("nid", "src"), "src")
        .withColumnRenamed("node", "osrc")
        .join(ids.withColumnRenamed("nid", "dst"), "dst")
        .withColumnRenamed("node", "odst")
        .select(F.col("osrc").alias("src"), F.col("odst").alias("dst"),
                F.col("label").cast("long").alias("label"))
    )


def q_bv_full_roundtrip(spark, sf_dir):
    """PHYSICAL full-BV format (operators/bvfull.py): copy-blocks +
    intervals + ζ₃ residuals stored as homogeneous split substreams,
    reference chains resolved at decode — store -> load -> same arcs.
    The reference's actual BVGraph.store grammar made physical."""
    from webgraph_spark.operators.bvfull import pack_bv_full, unpack_bv_full

    e = _edges(spark, sf_dir)
    return unpack_bv_full(pack_bv_full(e, num_blocks=8)).select("src", "dst")


def q_bvdisk_roundtrip(spark, sf_dir):
    """On-disk interop with the reference's NATIVE layout
    (sources/bvdisk.py): write basename.graph/.offsets/.properties the
    way BVGraph.store does (γ outdegrees, unary refs, γ blocks/
    intervals, ζ₃ residuals, greedy window-7 reference selection —
    BVGraph.java:2049-2327), then the DISTRIBUTED byte-range reader
    decodes it back. store -> load -> same arcs. The writer is the
    reference's PARALLEL store shape (per-segment streams, bit-level
    concat — write_bvgraph_distributed) and the distributed byte-range
    reader. BVGraph node ids are DENSE 0..n-1 by contract — the
    reference routes sparse id spaces through a dictionary
    (ScatteredArcsASCIIGraph) first — so the pipeline densifies with
    the distributed rank, stores/loads, and joins the original ids
    back (the full ingest→store→load→export chain)."""
    import tempfile

    from webgraph_spark.sources.bvdisk import (
        read_bvgraph,
        write_bvgraph_distributed,
    )
    from webgraph_spark.util.ids import assign_dense_ids

    e = _edges(spark, sf_dir)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    ids = assign_dense_ids(nodes, ["node"], id_col="nid").persist()
    dense = (
        e.join(ids.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("nid", "dsrc")
        .join(ids.withColumnRenamed("node", "dst"), "dst")
        .withColumnRenamed("nid", "ddst")
        .select(F.col("dsrc").alias("src"), F.col("ddst").alias("dst"))
    )
    base = tempfile.mkdtemp(prefix="bvdisk_") + "/g"
    write_bvgraph_distributed(dense, base, num_partitions=8)
    back = read_bvgraph(spark, base, num_partitions=8)
    out = (
        back.join(ids.withColumnRenamed("nid", "src"), "src")
        .withColumnRenamed("node", "osrc")
        .join(ids.withColumnRenamed("nid", "dst"), "dst")
        .withColumnRenamed("node", "odst")
        .select(F.col("osrc").alias("src"), F.col("odst").alias("dst"))
    )
    return out


def q_bv_full_bits(spark, sf_dir):
    """The interleaved-BV model figure DERIVED FROM the physical pack's
    decoded token streams (not pack-time counters), at the
    oracle-checkable config (window=1, unlimited chain depth, single
    block) — same oracle as graph_bv_bits, so the stored encoding is
    pinned to the dry-run model end-to-end."""
    from webgraph_spark.operators.bvfull import (
        bv_full_model_bits,
        pack_bv_full,
    )

    e = _edges(spark, sf_dir)
    blocks = pack_bv_full(e, num_blocks=1, window=1, max_ref_count=None)
    return bv_full_model_bits(blocks).select(
        F.col("model_bits").cast("long").alias("bv_bits"),
        F.col("n_arcs").cast("long").alias("n_arcs"),
        F.round("bits_per_link", 6).alias("bits_per_link"),
    )


def q_bv_zeta_bits(spark, sf_dir):
    """Interleaved-ζ₃ payload of a code='zeta3' physical pack, derived
    by DECODING the stored split-ζ streams (the reference's default
    residual code, BVGraph ZETA_3). Oracle: closed-form ζ₃ model with
    integer-exact bit lengths."""
    from webgraph_spark.operators.bitstream import bv_bits_per_link, pack_bv

    e = _edges(spark, sf_dir)
    return bv_bits_per_link(pack_bv(e, num_blocks=8, code="zeta3")).select(
        F.col("gamma_bits").cast("long").alias("zeta_bits"),
        F.col("n_arcs").cast("long").alias("n_arcs"),
        F.round("bits_per_link", 6).alias("bits_per_link"),
    )


def q_bv_golomb_bits(spark, sf_dir):
    """Interleaved-Golomb payload of a code='golomb1000000' physical
    pack, derived by decoding the stored split streams
    (RESIDUALS_GOLOMB, BVGraph.java:791-816). b=1e6 sits near the
    firsts-stream scale AND is not a power of two, so both minimal-
    binary branches are exercised; Golomb demands b ~ the gap mean —
    the encoder fails fast when b is orders off. Oracle: closed-form
    Golomb model, all-integer arithmetic. Closes the last partial §2.9
    row together with bv_nibble_bits."""
    from webgraph_spark.operators.bitstream import bv_bits_per_link, pack_bv

    e = _edges(spark, sf_dir)
    return bv_bits_per_link(
        pack_bv(e, num_blocks=8, code="golomb1000000")
    ).select(
        F.col("gamma_bits").cast("long").alias("golomb_bits"),
        F.col("n_arcs").cast("long").alias("n_arcs"),
        F.round("bits_per_link", 6).alias("bits_per_link"),
    )


def q_bv_nibble_bits(spark, sf_dir):
    """Variable-length-nibble payload of a code='nibble' physical pack
    (RESIDUALS_NIBBLE; OutputBitStream.writeNibble semantics — 4-bit
    stop+payload groups). The split layout's size EQUALS the
    interleaved code's, so the measured stream is the model exactly."""
    from webgraph_spark.operators.bitstream import bv_bits_per_link, pack_bv

    e = _edges(spark, sf_dir)
    return bv_bits_per_link(pack_bv(e, num_blocks=8, code="nibble")).select(
        F.col("gamma_bits").cast("long").alias("nibble_bits"),
        F.col("n_arcs").cast("long").alias("n_arcs"),
        F.round("bits_per_link", 6).alias("bits_per_link"),
    )


def q_bv_stream_bits(spark, sf_dir):
    """Payload of the PHYSICAL γ streams, measured by decoding the
    stored unary substreams (not echoed from pack-time counters). The
    oracle is the closed-form γ model in SQL — equality proves the bits
    on disk are exactly the entropy-model figure."""
    from webgraph_spark.operators.bitstream import bv_bits_per_link, pack_bv

    e = _edges(spark, sf_dir)
    return bv_bits_per_link(pack_bv(e, num_blocks=8)).select(
        F.col("gamma_bits").cast("long").alias("gamma_bits"),
        F.col("n_arcs").cast("long").alias("n_arcs"),
        F.round("bits_per_link", 6).alias("bits_per_link"),
    )


def q_ef_roundtrip(spark, sf_dir):
    """Elias–Fano second physical format: store -> load -> same arc set
    (EFGraph.store/load, EFGraph.java:283-420)."""
    from webgraph_spark.operators.ef import pack_ef, unpack_ef

    e = _edges(spark, sf_dir)
    return unpack_ef(pack_ef(e, num_blocks=8)).select("src", "dst")


def q_ef_bits(spark, sf_dir):
    """Exact Elias–Fano storage cost of the pack; the oracle recomputes
    the closed form sum(k*l + (max>>l) + k) analytically in SQL."""
    from webgraph_spark.operators.ef import ef_bits_per_link, pack_ef

    e = _edges(spark, sf_dir)
    return ef_bits_per_link(pack_ef(e, num_blocks=8)).select(
        F.col("ef_bits").cast("long").alias("ef_bits"),
        F.col("n_arcs").cast("long").alias("n_arcs"),
        F.round("bits_per_link", 6).alias("bits_per_link"),
    )


def q_bv_bits(spark, sf_dir):
    """Full BVGraph compression entropy model (reference/copy-block +
    intervalization + zeta_3 residuals + gamma outdegrees,
    BVGraph.java:2048-2226) at the oracle-checkable configuration:
    window=1, unlimited chain depth (per-node choices independent),
    single block (window never truncated). tests/test_bvcomp.py checks
    the vectorized kernels against a literal diffComp walk and the
    window-7 default config's monotonicity."""
    from webgraph_spark.operators.bvcomp import bv_bits_per_link
    from webgraph_spark.operators.csr import pack_csr

    e = _edges(spark, sf_dir)
    return bv_bits_per_link(
        pack_csr(e, num_blocks=1), window=1, max_ref_count=None
    ).select(
        F.col("bv_bits").cast("long").alias("bv_bits"),
        F.col("n_arcs").cast("long").alias("n_arcs"),
        F.round("bits_per_link", 6).alias("bits_per_link"),
    )


def _gamma_row(edges, spark):
    from webgraph_spark.operators.csr import gamma_bits_per_link

    return gamma_bits_per_link(pack_csr(edges, num_blocks=8)).select(
        F.col("gamma_bits").cast("long").alias("gamma_bits"),
        F.col("n_arcs").cast("long").alias("n_arcs"),
        F.round("bits_per_link", 6).alias("bits_per_link"),
    )


def q_gamma_bits(spark, sf_dir):
    """Entropy-model bits/link of the CSR pack in natural node order
    (BVGraph properties bits/link bookkeeping)."""
    return _gamma_row(_edges(spark, sf_dir), spark)


def q_gray_gamma_bits(spark, sf_dir):
    """Same, after the Gray-code compression ordering — the oracle
    replicates the permutation itself (prefix-XOR array key, dense rank)
    so the relabeled gap structure is checked bit-for-bit."""
    from webgraph_spark.operators.transforms import gray_code_permutation

    g, _ = gray_code_permutation(_edges(spark, sf_dir))
    return _gamma_row(g, spark)


def q_hostgray_gamma_bits(spark, sf_dir):
    """Group-major Gray ordering (hostByHostGrayCodePermutation,
    Transform.java:2455-2516): the node-id layer (customer/order/part/
    supplier decade) plays the host; the Gray sort runs within each
    group. Oracle replicates the group-major rank bit-for-bit."""
    from webgraph_spark.operators.transforms import gray_code_permutation

    e = _edges(spark, sf_dir)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    groups = nodes.withColumn(
        "group", F.floor(F.col("node") / F.lit(td.OFF_ORDER)).cast("long")
    )
    g, _ = gray_code_permutation(e, groups)
    return _gamma_row(g, spark)


def q_random_walks(spark, sf_dir):
    """Deterministic random-walk corpus (DeepWalk/node2vec sampling):
    2 walks of length 4 from each of the 5 smallest customer sources;
    step choice = portable md5(walk:step:node) mod outdeg over the
    dst-sorted successor index — the oracle replays identical walks."""
    from webgraph_spark.algos.walks import random_walks

    e = _edges(spark, sf_dir)
    srcs = (
        e.where(F.col("src") < td.OFF_ORDER)
        .select(F.col("src").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(5)
    )
    return random_walks(e, srcs, length=4, n_walks=2)


def q_node2vec(spark, sf_dir):
    """Second-order biased walk corpus (node2vec, Grover-Leskovec
    KDD'16; algos/walks.py:node2vec_walks): 2 walks of length 4 from
    each of the 5 smallest customer sources, return bias p=2, explore
    bias q=1/2 — dyadic, so candidate weights are exact small integers
    and the cumulative-weight pick (first dst whose integer cumsum
    exceeds md5 mod total) replays identically in the oracle."""
    from webgraph_spark.algos.walks import node2vec_walks

    e = _edges(spark, sf_dir)
    srcs = (
        e.where(F.col("src") < td.OFF_ORDER)
        .select(F.col("src").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(5)
    )
    return node2vec_walks(e, srcs, length=4, n_walks=2, p=2.0, q=0.5)


def q_wl_labels(spark, sf_dir):
    """1-WL color refinement (algos/features.py:wl_refinement): 3
    rounds of H(own label, commutative mod-2^31 multiset hash of
    neighbour labels) from a degree init over the simple symmetric
    link graph. Returns (node, wl) — equal labels = 3-hop
    WL-indistinguishable structural roles."""
    from webgraph_spark.algos.features import wl_refinement

    return wl_refinement(_edges(spark, sf_dir), iters=3, num_partitions=16)


def q_simrank_top20(spark, sf_dir):
    """Fingerprint SimRank (Fogaras-Racz WWW'05): top-20 node pairs by
    expected decay^(first meeting step) of md5-seeded reverse walks —
    the scalable Monte-Carlo SimRank, hub-capped meeting buckets,
    shared decay literals (algos/linkpred.py:simrank_fingerprint)."""
    from webgraph_spark.algos.linkpred import simrank_fingerprint

    return simrank_fingerprint(
        _edges(spark, sf_dir), n_walks=8, length=4, decay=0.5, k=20
    )


def q_link_prediction(spark, sf_dir):
    """Link-prediction scores (Liben-Nowell & Kleinberg 2003): common
    neighbours / Jaccard / Adamic-Adar for all pairs among the 20
    smallest customers, on the simplified graph. AA terms are rounded
    then decimal-summed so both engines agree order-independently."""
    from webgraph_spark.algos.linkpred import link_prediction_scores

    e = _edges(spark, sf_dir)
    custs = (
        e.where(F.col("src") < td.OFF_ORDER)
        .select(F.col("src").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(20)
    )
    ids = [r["node"] for r in custs.collect()]
    pairs = spark.createDataFrame(
        [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]],
        "a long, b long",
    )
    return link_prediction_scores(e, pairs)


def q_clustering_coeff(spark, sf_dir):
    """Per-node local clustering coefficient: triangles_per_node over
    the degree-oriented wedge join, degree from the simplified graph,
    cc = 2T / d(d-1). Nodes below degree 2 report 0."""
    from webgraph_spark.algos.triangles import triangles_per_node
    from webgraph_spark.operators.transforms import simplify

    e = _edges(spark, sf_dir)
    tri = triangles_per_node(e)
    deg = (
        simplify(e).groupBy("src").agg(F.count("*").alias("deg"))
        .select(F.col("src").alias("node"), "deg")
    )
    return deg.join(tri, "node", "left").select(
        "node",
        F.col("deg").cast("long").alias("deg"),
        F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
        F.round(
            F.when(
                F.col("deg") >= 2,
                F.lit(2.0)
                * F.coalesce("triangles", F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("clustering"),
    )


def q_assortativity(spark, sf_dir):
    """Degree assortativity (Newman 2002) of the simplified graph:
    Pearson correlation of endpoint degrees over the symmetric arc
    list. The three moments are EXACT int64 sums (degrees are
    integers), so both engines compute the identical final double."""
    from webgraph_spark.operators.transforms import simplify

    sym = simplify(_edges(spark, sf_dir))
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    j = (
        sym.join(deg.select(F.col("src"), F.col("deg").alias("dj")), "src")
        .join(
            deg.select(F.col("src").alias("dst"), F.col("deg").alias("dk")), "dst"
        )
    )
    agg = j.agg(
        F.count("*").alias("m"),
        F.sum(F.col("dj") * F.col("dk")).alias("sjk"),
        F.sum("dj").alias("sj"),
        F.sum(F.col("dj") * F.col("dj")).alias("sj2"),
    )
    return agg.select(
        F.col("m").cast("long").alias("n_sym_arcs"),
        F.round(
            (
                F.col("m").cast("double") * F.col("sjk")
                - F.col("sj").cast("double") * F.col("sj")
            )
            / (
                F.col("m").cast("double") * F.col("sj2")
                - F.col("sj").cast("double") * F.col("sj")
            ),
            6,
        ).alias("assortativity"),
    )


def q_avg_neighbor_degree(spark, sf_dir):
    """Average-nearest-neighbour degree per node (the ANND curve that
    complements scalar assortativity): mean neighbour degree over the
    simplified graph — integer sum / integer count, identical double."""
    from webgraph_spark.operators.transforms import simplify

    sym = simplify(_edges(spark, sf_dir))
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    j = sym.join(
        deg.select(F.col("src").alias("dst"), F.col("deg").alias("dk")), "dst"
    )
    return (
        j.groupBy("src")
        .agg(F.count("*").alias("d"), F.sum("dk").alias("sk"))
        .select(
            F.col("src").alias("node"),
            F.col("d").cast("long").alias("deg"),
            F.round(F.col("sk") / F.col("d"), 6).alias("avg_nbr_deg"),
        )
    )


# ------------------------------------------------------------- documents

def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_text_stats(spark, sf_dir):
    out = text_stats(_docs(spark, sf_dir), "doc_id", "text")
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
        "punct_ratio",
        "stopword_ratio",
        "quality",
        "fingerprint",
    )


def q_token_totals(spark, sf_dir):
    from webgraph_spark.functions.text import (
        regex_token_count,
        whitespace_token_count,
    )

    d = _docs(spark, sf_dir)
    return d.agg(
        F.sum(whitespace_token_count(F.col("text"))).cast("long").alias("ws_tokens"),
        F.sum(regex_token_count(F.col("text"))).cast("long").alias("bpe_tokens"),
        F.sum(F.length("text")).cast("long").alias("chars"),
    )


def q_docs_by_lang(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
    )


def q_minhash_sigs(spark, sf_dir):
    return minhash_signatures(
        _docs(spark, sf_dir), "doc_id", "text", NUM_HASHES, SHINGLE, HASH_SEED
    ).select("id", F.col("i").cast("long").alias("i"), "minhash")


def q_lsh_pairs(spark, sf_dir):
    return minhash_lsh_candidates(
        _docs(spark, sf_dir), "doc_id", "text", NUM_HASHES, BAND_ROWS, SHINGLE, HASH_SEED
    )


def q_jaccard(spark, sf_dir):
    d = _docs(spark, sf_dir)
    pairs = minhash_lsh_candidates(
        d, "doc_id", "text", NUM_HASHES, BAND_ROWS, SHINGLE, HASH_SEED
    )
    return ngram_jaccard(d, pairs, "doc_id", "text", SHINGLE)


def q_simhash(spark, sf_dir):
    return simhash16(_docs(spark, sf_dir), "doc_id", "text")


def q_dedup_clusters(spark, sf_dir):
    return near_dup_clusters(
        _docs(spark, sf_dir), "doc_id", "text",
        NUM_HASHES, BAND_ROWS, SHINGLE, HASH_SEED,
        threshold=DEDUP_THRESHOLD,
    )


# ------------------------------------------------------------- embeddings

def q_cosine_top5(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    return cosine_topk(emb, queries, k=5)


def q_emb_anisotropy(spark, sf_dir):
    """Exact mean pairwise cosine of the normalized corpus (Ethayarajh
    EMNLP'19 anisotropy diagnostic) via the ||sum of unit vectors||^2
    identity — all n^2 pairs measured with ONE n*d-row aggregation,
    no pair join (functions/similarity.py:anisotropy)."""
    from webgraph_spark.functions.similarity import anisotropy

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return anisotropy(emb)


def q_emb_label_counts(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.groupBy(F.col("label").cast("long").alias("label")).agg(
        F.count("*").alias("n")
    )


# ----------------------------------------------------------------- events

def q_events_hourly(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00:00").alias(
            "hour"
        ),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


def q_event_sessions(spark, sf_dir):
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_prev = ev.withColumn("prev", F.lag("ts").over(w))
    is_new = F.when(
        F.col("prev").isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp("prev") > 1800),
        1,
    ).otherwise(0)
    return (
        with_prev.select("user_id", is_new.alias("is_new"))
        .groupBy("user_id")
        .agg(F.sum("is_new").cast("long").alias("n_sessions"))
    )


def q_closeness_sample(spark, sf_dir):
    from webgraph_spark.algos.centrality import geometric_centralities

    e = _edges(spark, sf_dir)
    srcs = [
        r[0]
        for r in e.where(F.col("src") < td.OFF_ORDER)
        .select("src")
        .distinct()
        .orderBy("src")
        .limit(5)
        .collect()
    ]
    out = geometric_centralities(e, srcs)
    return out.select(
        "source",
        F.col("reachable").cast("long").alias("reachable"),
        F.round("closeness", 9).alias("closeness"),
        F.round("harmonic", 9).alias("harmonic"),
    )


def q_scc_dag(spark, sf_dir):
    from webgraph_spark.algos.scc import scc_coloring

    return scc_coloring(_edges(spark, sf_dir), max_rounds=30)


# ----------------------------------------- converged / approximate queries

def q_pagerank_converged(spark, sf_dir):
    """To convergence (L-inf < 1e-6) within 35 iterations; the oracle
    unrolls the same recurrence WITH the delta rule, so both engines
    stop at the identical iteration."""
    res = pagerank(_edges(spark, sf_dir), tol=1e-6, max_iter=35, num_partitions=16)
    return res.ranks.select("node", F.round("rank", 9).alias("rank"))


def q_cc_converged(spark, sf_dir):
    """Hash-min to fixpoint within 30 rounds. Early stop fires only at
    the fixpoint, so the state equals the full 30-round unroll exactly
    whether or not convergence happened earlier."""
    res = connected_components(
        _edges(spark, sf_dir), max_iter=30, num_partitions=16,
        algorithm="hashmin",
    )
    return res.labels


def q_cc_stars(spark, sf_dir):
    """Large-star/small-star CC to fixpoint: O(log n) rounds instead of
    hash-min's O(diameter). Same converged labels (component = min node
    id), so the oracle is the converged hash-min unroll."""
    from webgraph_spark.algos.components import connected_components_stars

    res = connected_components_stars(
        _edges(spark, sf_dir), max_iter=30, num_partitions=16
    )
    return res.labels


def q_ann_lsh_top5(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    return cosine_topk_lsh(emb, queries, k=5, dim=64)


def q_ann_recall5(spark, sf_dir):
    """Recall@5 of the LSH candidate path vs the exact top-5 — the
    approximation-quality gate (sketches are accepted by measured error
    vs ground truth, HyperBallTest.java:78-80). tests/test_functions.py
    asserts the recall floor; here the exact value is oracle-matched."""
    from webgraph_spark.functions.similarity import ann_recall

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    return ann_recall(emb, queries, k=5, dim=64)


def q_ivf_recall5(spark, sf_dir):
    """Recall@5 of the IVF-Flat candidate path vs the exact top-5 — the
    same approximation-quality gate as emb_ann_recall5, applied to the
    coarse-quantizer search (nprobe cells instead of LSH buckets)."""
    from webgraph_spark.functions.similarity import ivf_recall

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    return ivf_recall(
        emb, queries, k=5, n_clusters=IVF_K, nprobe=IVF_NPROBE,
        iters=IVF_ITERS, dim=64,
    )


def q_sq8_top5(spark, sf_dir):
    """Top-5 cosine neighbours scored on 8-bit scalar-quantized vectors
    — the memory-footprint ANN path (4x corpus compression); the full
    quantize -> dequantize -> rank chain is oracle-replicated."""
    from webgraph_spark.functions.similarity import sq8_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    return sq8_topk(emb, queries, k=5, dim=64)


def q_sq8_recall5(spark, sf_dir):
    """Recall@5 of the SQ8-quantized scorer vs the exact float top-5 —
    the approximation-quality gate for 8-bit compression (how much
    ranking the 4x footprint saving costs)."""
    from webgraph_spark.functions.similarity import sq8_recall

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    return sq8_recall(emb, queries, k=5, dim=64)


def q_semdedup(spark, sf_dir):
    """SemDeDup-style semantic pruning: k-means blocks, then within
    each cluster a vector is pruned when a smaller-id neighbour has
    cosine >= eps (kept=0). Cluster-blocked pairs, never all-pairs."""
    from webgraph_spark.functions.clustering import semdedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semdedup(emb, k=4, iters=3, eps=0.33, dim=64)


def q_multimodal_features(spark, sf_dir):
    from webgraph_spark.functions.multimodal import extract_features, synthesize_media

    media = synthesize_media(spark, n=48)
    feats = extract_features(media, dim=16)
    # checksum = sum_k feature[k] * (k+1), rounded — the md5-derived
    # payloads make the whole decode->feature chain oracle-replicable
    idx = F.sequence(F.lit(1), F.size("feature"))
    checksum = F.aggregate(
        F.zip_with(
            F.col("feature"), idx, lambda v, i: v.cast("double") * i.cast("double")
        ),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    return feats.select(
        "media_id",
        "kind",
        "ok",
        F.size("feature").cast("long").alias("dim"),
        F.round(checksum, 6).alias("checksum"),
    )


def q_transcript_graph(spark, sf_dir):
    """The input_hint pipeline end-to-end over a transcripts table
    derived deterministically from the events view (conv_id/turn_idx/
    role/text/tool/ts): node dictionary -> edges -> 10-iteration
    PageRank. Fully oracle-checked — the SQL twin replicates the
    dictionary (dense rank over the same total order), the three arc
    kinds, and the unrolled recurrence."""
    from pyspark.sql import Window
    from webgraph_spark.graph.edges import (
        build_node_dictionary,
        extract_edges,
        simple_edges,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.when(F.col("event_id") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.concat_ws(":", "event_type", F.col("event_id").cast("string")).alias("text"),
        F.when(F.col("event_id") % 3 == 0, F.col("event_type"))
        .otherwise(F.lit(None).cast("string"))
        .alias("tool"),
        "ts",
    )
    edges = simple_edges(extract_edges(tr, build_node_dictionary(tr)))
    res = pagerank(edges, fixed_iterations=10, num_partitions=16)
    return res.ranks.select("node", F.round("rank", 9).alias("rank"))


HB_LOG2M = 5
HB_SEED = 31
HB_RSD = 1.04 / (2 ** (HB_LOG2M / 2))


def q_hyperball_nf(spark, sf_dir):
    """(t, nf_exact, est_ok): exact NF via one batched all-sources BFS,
    plus the HyperBall estimate's acceptance flag |est/exact - 1| <=
    2 x RSD at every t (the reference's own tolerance,
    HyperBallTest.java:78-80). Deterministic: fixed seed."""
    from webgraph_spark.algos.centrality import nf_exact
    from webgraph_spark.algos.hyperball import hyperball

    e = _edges(spark, sf_dir)
    res = hyperball(e, log2m=HB_LOG2M, max_t=10, num_partitions=16, seed=HB_SEED)
    exact = nf_exact(e)
    nf = res.nf

    def est_at(t: int) -> float:
        return nf[t] if t < len(nf) else nf[-1]

    rows = [(int(r.t), int(r.nf_exact)) for r in exact.collect()]
    out = [
        (t, x, bool(abs(est_at(t) / x - 1.0) <= 2 * HB_RSD)) for t, x in rows
    ]
    return spark.createDataFrame(out, "t long, nf_exact long, est_ok boolean")


def q_hyperball_wide_nf(spark, sf_dir):
    """Same contract as graph_hyperball_nf but through the GROUPED
    register path (hyperball_wide, log2m=10 -> 1024 registers in 16
    group rows/node — beyond the packed path's 256-column cap): exact
    NF plus the acceptance flag at the tighter RSD the extra registers
    buy (1.04/sqrt(1024) ~ 3.25%). Deterministic: integer-exact HLL
    indicator (see algos/hyperball.py hyperball_wide docstring)."""
    from webgraph_spark.algos.centrality import nf_exact
    from webgraph_spark.algos.hyperball import hyperball_wide

    e = _edges(spark, sf_dir)
    log2m = 10
    rsd = 1.04 / (2 ** (log2m / 2))
    res = hyperball_wide(e, log2m=log2m, max_t=10, num_partitions=16, seed=HB_SEED)
    exact = nf_exact(e)
    nf = res.nf

    def est_at(t: int) -> float:
        return nf[t] if t < len(nf) else nf[-1]

    rows = [(int(r.t), int(r.nf_exact)) for r in exact.collect()]
    out = [
        (t, x, bool(abs(est_at(t) / x - 1.0) <= 2 * rsd)) for t, x in rows
    ]
    return spark.createDataFrame(out, "t long, nf_exact long, est_ok boolean")


def q_harmonic_approx(spark, sf_dir):
    """Exact all-nodes harmonic/closeness centralities (batched BFS,
    per-node rows — oracle-checked in SQL), with HyperBall's estimate
    acceptance (|est_sum/exact_sum - 1| <= 2 x RSD, the reference's own
    tolerance) riding as a deterministic flag column the oracle expects
    to be true. Per-node values are rounded per row (hundreds of terms
    each), never as one global float sum — hash-stable across engines."""
    from webgraph_spark.algos.centrality import geometric_centralities
    from webgraph_spark.algos.hyperball import hyperball

    e = _edges(spark, sf_dir)
    cents = geometric_centralities(e).persist()
    exact_sum = cents.agg(F.sum("harmonic")).collect()[0][0]
    res = hyperball(e, log2m=HB_LOG2M, max_t=10, num_partitions=16, seed=HB_SEED)
    got_sum = res.centralities().agg(F.sum("harmonic")).collect()[0][0]
    ok = abs(got_sum - exact_sum) <= 2 * HB_RSD * exact_sum
    out = cents.select(
        "source",
        F.col("reachable").cast("long").alias("reachable"),
        F.round("harmonic", 6).alias("harmonic"),
        F.round("closeness", 9).alias("closeness"),
        F.lit(bool(ok)).alias("est_within_2rsd"),
    )
    return out


NEARDUP_THRESHOLD = 0.3
NEARDUP_PLANES = 6
NEARDUP_TABLES = 4


def q_emb_near_dups(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH bucketed
    self-join (never all-pairs) + exact float64 cosine verification —
    the dense-vector member of the dedup pillar."""
    from webgraph_spark.functions.similarity import embedding_near_dups

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_near_dups(
        emb, threshold=NEARDUP_THRESHOLD, n_planes=NEARDUP_PLANES,
        n_tables=NEARDUP_TABLES, dim=64,
    )


def _near_dups_sql(
    threshold: float = NEARDUP_THRESHOLD,
    n_planes: int = NEARDUP_PLANES,
    n_tables: int = NEARDUP_TABLES,
    seed: int = 777,
    dim: int = 64,
) -> str:
    """Twin of embedding_near_dups: identical md5-baked planes, identical
    left-to-right float64 folds, identical bucket self-joins."""
    from webgraph_spark.functions.similarity import _hyperplanes

    def dot_signed(plane) -> str:
        lits = "[" + ", ".join(f"{x:.1f}" for x in plane) + "]"
        return (
            f"list_reduce(list_transform(range(1, {dim + 1}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({lits})[i]), (a, b) -> a + b)"
        )

    bt = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        bucket = " + ".join(
            f"(CASE WHEN ({dot_signed(planes[j])}) > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(n_planes)
        )
        bt.append(
            f"bt{t} AS (SELECT vec_id, ({bucket}) AS bucket FROM embeddings)"
        )
    cand_unions = " UNION ".join(
        f"SELECT a.vec_id AS id_a, b.vec_id AS id_b "
        f"FROM bt{t} a JOIN bt{t} b ON a.bucket = b.bucket "
        f"WHERE a.vec_id < b.vec_id"
        for t in range(n_tables)
    )
    def vec_expr(alias):
        return (
            f"list_reduce(list_transform(range(1, {dim + 1}), "
            f"i -> CAST({alias}.embedding[i] AS DOUBLE) * CAST({alias}.embedding[i] AS DOUBLE)), "
            f"(a, b) -> a + b)"
        )
    dot = (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        "i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)), "
        "(a, b) -> a + b)"
    )
    return f"""WITH {", ".join(bt)},
cand AS ({cand_unions})
SELECT id_a, id_b, sim FROM (
  SELECT c.id_a, c.id_b,
         ROUND(({dot}) / (sqrt({vec_expr('ea')}) * sqrt({vec_expr('eb')})), 6) AS sim
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.id_a
  JOIN embeddings eb ON eb.vec_id = c.id_b) t
WHERE sim >= {threshold}"""


def q_emb_dedup_clusters(spark, sf_dir):
    """Embedding near-dup clustering: LSH pairs -> large-star/small-star
    CC -> canonical vector per cluster (second oracle-checked consumer
    of the O(log n)-round CC)."""
    from webgraph_spark.functions.similarity import embedding_dedup_clusters

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_dedup_clusters(
        emb, threshold=NEARDUP_THRESHOLD, n_planes=NEARDUP_PLANES,
        n_tables=NEARDUP_TABLES, dim=64,
    )


def _emb_clusters_sql() -> str:
    """Recursive min-reach closure over the near-dups pair oracle."""
    nd = _near_dups_sql()
    return f"""WITH RECURSIVE ver AS (SELECT id_a, id_b FROM ({nd}) q),
dup_e AS (
  SELECT id_a AS a, id_b AS b FROM ver
  UNION ALL SELECT id_b, id_a FROM ver
),
cl AS (
  SELECT vec_id AS node, vec_id AS reach FROM embeddings
  UNION
  SELECT cl.node, dup_e.b FROM cl JOIN dup_e ON cl.reach = dup_e.a
),
lab AS (SELECT node AS vec_id, MIN(reach) AS canonical_id FROM cl GROUP BY node),
sz AS (SELECT canonical_id, COUNT(*) AS cluster_size FROM lab GROUP BY canonical_id)
SELECT l.vec_id, l.canonical_id, s.cluster_size
FROM lab l JOIN sz s USING (canonical_id)"""


IVF_K = 8
IVF_ITERS = 2
IVF_NPROBE = 2


def q_ivf_top5(spark, sf_dir):
    """IVF-Flat ANN: deterministic Lloyd k-means coarse quantizer
    (md5-smallest seeds, fixed iterations, rounded centroids) + nprobe
    cell search. The oracle twin re-runs the SAME unrolled training in
    SQL — centroids are recomputed independently, not baked from engine
    output."""
    from webgraph_spark.functions.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    return ivf_topk(
        emb, q, k=5, n_clusters=IVF_K, nprobe=IVF_NPROBE, iters=IVF_ITERS,
        dim=64,
    )


def _ivf_sql(
    k_nn: int = 5,
    n_clusters: int = IVF_K,
    nprobe: int = IVF_NPROBE,
    iters: int = IVF_ITERS,
    dim: int = 64,
) -> str:
    """Unrolled-Lloyd twin of q_ivf_top5. Distance folds are
    left-to-right list_reduce in pos order (identical to Spark's
    zip_with/aggregate fold); centroid means are ROUND(avg, 6) on both
    sides so engine/partitioning float jitter cannot leak into the
    literals of the next iteration."""
    def dist(vec, cent):
        return (
            f"list_reduce(list_transform(range(1, {dim + 1}), "
            f"i -> (CAST({vec}[i] AS DOUBLE) - {cent}[i]) "
            f"* (CAST({vec}[i] AS DOUBLE) - {cent}[i])), (a, b) -> a + b)"
        )

    parts = [f"""
seeds AS (
  SELECT vec_id, CAST(ROW_NUMBER() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS BIGINT) AS c
  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {n_clusters})""", f"""
cent0 AS (
  SELECT s.c, list_transform(range(1, {dim + 1}),
           i -> CAST(e.embedding[i] AS DOUBLE)) AS cent
  FROM seeds s JOIN embeddings e ON e.vec_id = s.vec_id)"""]
    prev = "cent0"
    for it in range(1, iters + 1):
        parts.append(f"""
asg{it} AS (
  SELECT vec_id, embedding, c FROM (
    SELECT e.vec_id, e.embedding, ct.c,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {dist('e.embedding', 'ct.cent')}, ct.c) AS rn
    FROM embeddings e CROSS JOIN {prev} ct) t
  WHERE rn = 1)""")
        parts.append(f"""
mu{it} AS (
  SELECT c, pos, ROUND(AVG(CAST(embedding[pos] AS DOUBLE)), 6) AS mu
  FROM asg{it}, range(1, {dim + 1}) AS r(pos)
  GROUP BY c, pos)""")
        parts.append(f"""
cent{it} AS (
  SELECT p.c,
         COALESCE(m.cent, p.cent) AS cent
  FROM {prev} p LEFT JOIN (
    SELECT c, list(mu ORDER BY pos) AS cent FROM mu{it} GROUP BY c) m
  ON m.c = p.c)""")
        prev = f"cent{it}"
    dot = (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), "
        "(a, b) -> a + b)"
    )

    def norm(alias):
        return (
            f"sqrt(list_reduce(list_transform(range(1, {dim + 1}), "
            f"i -> CAST({alias}.embedding[i] AS DOUBLE) * CAST({alias}.embedding[i] AS DOUBLE)), "
            f"(a, b) -> a + b))"
        )

    parts.append(f"""
cells AS (
  SELECT vec_id, c AS cell FROM (
    SELECT e.vec_id, ct.c,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {dist('e.embedding', 'ct.cent')}, ct.c) AS rn
    FROM embeddings e CROSS JOIN {prev} ct) t
  WHERE rn = 1)""")
    parts.append(f"""
probes AS (
  SELECT vec_id AS query_id, c AS cell FROM (
    SELECT q.vec_id, ct.c,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {dist('q.embedding', 'ct.cent')}, ct.c) AS rn
    FROM embeddings q CROSS JOIN {prev} ct
    WHERE q.vec_id < 10) t
  WHERE rn <= {nprobe})""")
    return f"""WITH {",".join(parts)},
cand AS (
  SELECT p.query_id, cl.vec_id AS neighbor_id
  FROM probes p JOIN cells cl ON cl.cell = p.cell
  WHERE cl.vec_id <> p.query_id),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         ROUND(({dot}) / (({norm('q')}) * ({norm('e')})), 6) AS sim
  FROM cand c
  JOIN embeddings q ON q.vec_id = c.query_id
  JOIN embeddings e ON e.vec_id = c.neighbor_id)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim FROM (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored) t
WHERE rank <= {k_nn}"""


def q_topk_harmonic(spark, sf_dir):
    """Top-10 positive harmonic centralities via the CutClos batched BFS
    (algos/topk.py; TopKGeometricCentrality.java:80-222). Values-only
    (rank, harmonic) output: equal centralities make the rank->node
    assignment ambiguous, but the sorted value multiset is unique.
    scc_max=0 skips the condensation DP — the TPC-H DAG's condensation
    is all singletons, so its bounds never beat the trivial reachU=n."""
    from webgraph_spark.algos.topk import top_k_geometric

    res = top_k_geometric(
        _edges(spark, sf_dir), 10, "harmonic", batch_size=4096,
        num_partitions=16, scc_max=0,
    )
    rows = [(i + 1, round(c, 6)) for i, (_v, c) in enumerate(res.top_k)]
    return spark.createDataFrame(rows, "rank long, harmonic double")


def q_betweenness(spark, sf_dir):
    """Brandes betweenness from the 100 smallest customer sources — the
    sampled-estimator ``sources`` path (algos/betweenness.py) with
    scale 1, exact per-node dependency sums."""
    from webgraph_spark.algos.betweenness import betweenness

    e = _edges(spark, sf_dir)
    srcs = (
        e.where(F.col("src") < td.OFF_ORDER)
        .select(F.col("src").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(100)
    )
    out = betweenness(e, num_partitions=16, sources=srcs)
    return out.select("node", F.round("betweenness", 6).alias("betweenness"))


def q_union_transpose(spark, sf_dir):
    """Graph union with its transpose = symmetrized arc set
    (Transform.union, UnionImmutableGraph.java:27-31)."""
    from webgraph_spark.operators.transforms import transpose, union_graphs

    e = _edges(spark, sf_dir)
    return union_graphs(e, transpose(e))


def q_line_graph(spark, sf_dir):
    """Line graph of the customer->order->part layers (Transform.line,
    Transform.java:2267-2382): nodes = arcs, arc <x,y> -> <y,z>; arc ids
    are the dense (src, dst)-order dictionary."""
    from webgraph_spark.operators.transforms import line_graph

    e = _edges(spark, sf_dir).where(F.col("src") < td.OFF_PART)
    line, _arcs = line_graph(e)
    return line.select("src", "dst")


def q_induced_subgraph(spark, sf_dir):
    """Node-induced subgraph of the customer+order layers, re-indexed to
    dense ids (ImmutableSubgraph.java:30-60 to/fromSupergraphNode)."""
    from webgraph_spark.operators.transforms import induced_subgraph

    e = _edges(spark, sf_dir)
    ns = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .where(F.col("node") < td.OFF_PART)
    )
    sub, _ = induced_subgraph(e, ns, reindex=True)
    return sub.select("src", "dst")


def q_degree_range(spark, sf_dir):
    """Arcs between nodes with outdegree in [1, 8)
    (DegreeRangeImmutableSubgraph.java:25-35; dangling nodes count 0)."""
    from webgraph_spark.operators.transforms import degree_range_subgraph

    sub, _ = degree_range_subgraph(_edges(spark, sf_dir), 1, 8, reindex=False)
    return sub.select("src", "dst")


def q_mask_interval(spark, sf_dir):
    """Interval expansion + successor masking (IntIntervalSequenceIterator
    + MaskedIntIterator): drop each list's leading [min, min+31] band."""
    from webgraph_spark.operators.transforms import intervals_to_arcs, mask_arcs

    e = _edges(spark, sf_dir)
    intervals = e.groupBy("src").agg(F.min("dst").alias("lo")).select(
        "src", "lo", (F.col("lo") + 31).alias("hi")
    )
    return mask_arcs(e, intervals_to_arcs(intervals)).select("src", "dst")


def q_lex_gamma_bits(spark, sf_dir):
    """γ-model bits/link after the lexicographic-by-adjacency-row
    ordering (Transform.lexicographicalPermutation, Transform.java:
    2518-2580) — the oracle replicates the permutation itself."""
    from webgraph_spark.operators.transforms import lexicographical_permutation

    g, _ = lexicographical_permutation(_edges(spark, sf_dir))
    return _gamma_row(g, spark)


def q_ppr5(spark, sf_dir):
    """Personalized PageRank, 5 fixed iterations, restart uniform on the
    10 smallest node ids (LAW PageRank --preferenceVector analog)."""
    from webgraph_spark.algos.pagerank import personalized_pagerank

    e = _edges(spark, sf_dir)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = nodes.orderBy("node").limit(10)
    res = personalized_pagerank(e, seeds, alpha=0.85, fixed_iterations=5)
    return res.ranks.select("node", F.round("rank", 9).alias("rank"))


def q_hits8(spark, sf_dir):
    """HITS hubs/authorities, 8 synchronous L1-normalized iterations
    (LAW rank-family analog alongside PageRank)."""
    from webgraph_spark.algos.spectral import hits

    res = hits(_edges(spark, sf_dir), iterations=8)
    return res.scores.select(
        "node",
        F.round("hub", 9).alias("hub"),
        F.round("authority", 9).alias("authority"),
    )


def q_katz8(spark, sf_dir):
    """Truncated Katz centrality, alpha=0.1 beta=1, 8 terms
    (KatzParallelGaussSeidel analog, synchronous truncation)."""
    from webgraph_spark.algos.spectral import katz_centrality

    out = katz_centrality(_edges(spark, sf_dir), alpha=0.1, beta=1.0, iterations=8)
    return out.select("node", F.round("katz", 9).alias("katz"))


def q_llp_gamma_bits(spark, sf_dir):
    """γ-model bits/link after the Layered-Label-Propagation ordering
    (Boldi et al. WWW 2011; the LAW LayeredLabelPropagation driver run
    ahead of BVGraph.store) — deterministic synchronous variant, the
    oracle unrolls both γ layers' penalized updates."""
    from webgraph_spark.algos.llp import llp_permutation

    g, _ = llp_permutation(_edges(spark, sf_dir), gammas=(0.0, 0.5), rounds=2)
    return _gamma_row(g, spark)


def q_eff_diameter(spark, sf_dir):
    """(avg_distance, spid, effective_diameter): derived distance
    statistics from the exact NF — EstimateEffectiveDiameter.java /
    HyperANF SPID analogs. Moments accumulate as exact int64 sums over
    the integer NF increments with one double division each, so the SQL
    oracle bit-matches (see algos/centrality.py nf_stats)."""
    from webgraph_spark.algos.centrality import nf_exact, nf_stats

    return nf_stats(nf_exact(_edges(spark, sf_dir)), quantile=0.9)


def q_distance_cdf(spark, sf_dir):
    """Sampled distance CDF from the 5 smallest customer sources
    (SampleDistanceCumulativeDistributionFunction analog)."""
    from webgraph_spark.algos.centrality import distance_cdf

    e = _edges(spark, sf_dir)
    srcs = [
        r[0]
        for r in e.where(F.col("src") < td.OFF_ORDER)
        .select("src")
        .distinct()
        .orderBy("src")
        .limit(5)
        .collect()
    ]
    out = distance_cdf(e, srcs)
    return out.select(
        F.col("dist").cast("long").alias("dist"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("cum_pairs").cast("long").alias("cum_pairs"),
    )


def q_temporal_reach(spark, sf_dir):
    """Temporal earliest-arrival reachability (Wu et al. VLDB'14;
    algos/paths.py:temporal_reachability) from the smallest user over
    the interaction arcs (prev_user -> user at epoch-us t, consecutive
    events within each event_type stream under the stable (ts,
    event_id) order). An arc is usable only at its timestamp by a
    walker already present — the time-respecting influence model
    static reachability over-approximates. Fixed 20-round schedule
    (fixpoint at <=14 on this data; extra rounds are no-ops); exact
    int64 arrival times, no float contract."""
    from pyspark.sql import Window

    from webgraph_spark.algos.paths import temporal_reachability

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    arcs = (
        ev.select(
            "user_id", "ts", "event_id", "event_type",
            F.lag("user_id").over(w).alias("prev"),
        )
        .where(F.col("prev").isNotNull() & (F.col("prev") != F.col("user_id")))
        .select(
            F.col("prev").alias("src"),
            F.col("user_id").alias("dst"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        )
    )
    src_node = int(ev.agg(F.min("user_id")).collect()[0][0])
    res = temporal_reachability(arcs, [src_node], fixed_rounds=20,
                                num_partitions=16)
    return res.select(F.col("node").cast("long"),
                      F.col("arrival").cast("long"))


def q_scattered_arcs(spark, sf_dir):
    """Scattered string-id arc ingest (ScatteredArcsASCIIGraph.java:
    60-140): (user, event_type) pairs -> dense-id dictionary, de-loop,
    symmetrize."""
    from webgraph_spark.sources.arclist import scattered_arcs_from_df

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw = ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("rsrc"),
        F.concat(F.lit("e:"), F.col("event_type")).alias("rdst"),
    )
    e, _dic = scattered_arcs_from_df(raw, symmetrize=True, no_loops=True)
    return e.select("src", "dst")


def _event_snapshots(spark, sf_dir):
    """Two (user -> event_type:k) arc snapshots split at the integer
    midpoint of the event-time range (epoch micros, floor division —
    bit-identical in any engine). The props JSON's k field refines the
    arc key so the two halves genuinely differ."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    b = ev.agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("mn"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("mx"),
    ).select(F.expr("(mn + mx) div 2").alias("mid"))
    e = ev.crossJoin(F.broadcast(b))
    dst = F.concat(
        F.col("event_type"), F.lit(":"), F.get_json_object("props", "$.k")
    )
    g0 = e.where(F.unix_micros(F.col("ts").cast("timestamp")) < F.col("mid")).select(
        F.col("user_id").alias("src"), dst.alias("dst")
    )
    g1 = e.where(F.unix_micros(F.col("ts").cast("timestamp")) >= F.col("mid")).select(
        F.col("user_id").alias("src"), dst.alias("dst")
    )
    return g0, g1


def _user_attr_pairs(spark, sf_dir):
    """(user, event_type:k:valuebucket) bipartite table over events —
    the entity-attribute input for co-occurrence projection."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    attr = F.concat(
        F.col("event_type"),
        F.lit(":"),
        F.get_json_object("props", "$.k"),
        F.lit(":"),
        F.floor(F.col("value") / 50).cast("int").cast("string"),
    )
    return ev.select(F.col("user_id").alias("u"), attr.alias("a"))


_PROJ_ATTR_SQL = (
    "event_type || ':' || json_extract_string(props, '$.k') || ':' "
    "|| CAST(CAST(FLOOR(value / 50) AS INT) AS VARCHAR)"
)


def q_user_projection(spark, sf_dir):
    """Weighted one-mode projection of the user-attribute bipartite
    graph: user pairs sharing >= 7 distinct attributes (co-occurrence
    graph constructor with hub-df and min-weight scale guards)."""
    from webgraph_spark.functions.mining import bipartite_project

    return bipartite_project(
        _user_attr_pairs(spark, sf_dir), min_weight=7
    )


def q_truss4(spark, sf_dir):
    """4-truss of the user co-occurrence projection: every surviving
    edge closes >= 2 triangles inside the truss — the dense-subgraph
    rung above k-core (graph_kcore5), peeled to fixpoint."""
    from webgraph_spark.algos.truss import ktruss
    from webgraph_spark.functions.mining import bipartite_project

    proj = bipartite_project(_user_attr_pairs(spark, sf_dir), min_weight=7)
    return ktruss(proj.select("src", "dst"), k=4)


def q_events_graph_diff(spark, sf_dir):
    """Snapshot evolution: arc-set delta (retained/added/removed +
    Jaccard stability) between the first and second half of the event
    stream's (user -> event_type) graph — the between-crawls diff a
    stored-graph engine runs per re-store."""
    from webgraph_spark.operators.transforms import arc_diff

    g0, g1 = _event_snapshots(spark, sf_dir)
    return arc_diff(g0, g1)


def q_events_degree_churn(spark, sf_dir):
    """Top-10 users by absolute out-degree change between the two
    event-stream snapshots (hub churn)."""
    from webgraph_spark.operators.transforms import degree_churn

    g0, g1 = _event_snapshots(spark, sf_dir)
    return degree_churn(g0, g1, k=10)


def q_sample_stratified(spark, sf_dir):
    """Deterministic stratified sample: exactly 20 docs per language in
    portable-md5 order (functions/sampling.py) — the language-balanced
    subset draw of a training-data pipeline, reproducible at any
    parallelism."""
    from webgraph_spark.functions.sampling import stratified_sample_k

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return stratified_sample_k(docs, "lang", 20, "doc_id").select("doc_id", "lang")


def q_contamination(spark, sf_dir):
    """Decontamination scan (functions/dedup.py contamination_check):
    training docs sharing >= 2 distinct 3-gram shingles with the eval
    slice (doc_id < 40), with eval-side containment. Broadcast eval
    shingles + one corpus pass."""
    from webgraph_spark.functions.dedup import contamination_check

    docs = _docs(spark, sf_dir)
    ev = docs.where(F.col("doc_id") < 40)
    return contamination_check(
        docs, ev, "doc_id", "text", shingle=3, min_shared=2
    ).select(
        F.col("train_id").cast("long").alias("train_id"),
        F.col("eval_id").cast("long").alias("eval_id"),
        F.col("shared_shingles").cast("long").alias("shared_shingles"),
        "containment",
    )


def q_mixture_sample(spark, sf_dir):
    """Mixture curation (functions/sampling.py token_budget_sample):
    per-source 3000-token budget in portable-md5 order; result is the
    per-source doc count and token total of the selected mix."""
    from webgraph_spark.functions.sampling import token_budget_sample
    from webgraph_spark.functions.text import whitespace_token_count

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        whitespace_token_count(F.col("text")).alias("n_tokens"),
    )
    sel = token_budget_sample(docs, "source", "n_tokens", 3000, "doc_id")
    return sel.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tokens"),
    )


def q_hash_split(spark, sf_dir):
    """Deterministic train/val/test split by portable-md5 bucket ranges
    (functions/sampling.py hash_split): per-split doc counts + token
    totals. A row's split is a pure function of its doc_id, so no
    document can migrate between train and test as the corpus grows."""
    from webgraph_spark.functions.sampling import hash_split
    from webgraph_spark.functions.text import whitespace_token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    return out.groupBy("split").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(whitespace_token_count(F.col("text")))
        .cast("long")
        .alias("ws_tokens"),
    )


def q_pack_chunks(spark, sf_dir):
    """GPT-style concat-and-chunk sequence packing (functions/packing.py
    pack_by_token_budget): per-language deterministic doc order,
    2048-token budget, per-batch doc counts and token sums. One window
    + one groupBy, all JVM."""
    from webgraph_spark.functions.packing import pack_by_token_budget
    from webgraph_spark.functions.text import whitespace_token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = docs.select(
        "doc_id",
        "lang",
        whitespace_token_count(F.col("text")).alias("n_tokens"),
    )
    out = pack_by_token_budget(d, "n_tokens", 2048, "lang", "doc_id")
    return out.groupBy("lang", "batch_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tokens"),
    )


def q_docs_repetition(spark, sf_dir):
    """Gopher-style repetition filters (Rae et al. 2021): top-bigram
    coverage and duplicated-trigram fraction per document, with the
    repetitive flag. All-JVM split/transform/explode/groupBy."""
    from webgraph_spark.functions.text import repetition_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return repetition_stats(docs, "doc_id", "text")


def q_docs_window_dedup(spark, sf_dir):
    """Exact substring-level duplication at 8-token window granularity
    (Lee et al. 2022 ExactSubstr posture): per-doc duplicated-window
    counts from one corpus-wide hash-partitioned window count."""
    from webgraph_spark.functions.dedup import window_dedup_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return window_dedup_stats(docs, "doc_id", "text", k=8)


BPE_MERGES = 8  # merges learned by the driver BPE queries


def q_docs_bpe_merges(spark, sf_dir):
    """Distributed BPE tokenizer training (Sennrich et al. 2016) over
    the documents corpus: the first 8 learned merge rules
    (rank, lhs, rhs, pair_count). Corpus collapses to a distinct-word
    dictionary in one shuffle; each merge is one map-side-combined
    pair-count groupBy + a one-row argmax collect + an all-JVM greedy
    fold rewrite of the dictionary's symbol arrays."""
    from webgraph_spark.functions.bpe import bpe_train, rules_df

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    res = bpe_train(docs, "text", BPE_MERGES)
    return rules_df(spark, res)


def q_docs_bpe_tokens(spark, sf_dir):
    """Per-document subword token counts under the 8 trained BPE merges
    (doc_id, n_words, n_tokens): tokenize-by-dictionary-join — each
    DISTINCT word is tokenized once (it already is, in the trained
    vocab), then one corpus explode + join + groupBy(doc_id)."""
    from webgraph_spark.functions.bpe import bpe_token_counts, bpe_train

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    res = bpe_train(docs, "text", BPE_MERGES)
    return bpe_token_counts(docs, "doc_id", "text", res)


def q_pq_top5(spark, sf_dir):
    """Top-5 cosine with a product-quantized corpus (Jegou TPAMI'11;
    functions/similarity.py:pq_topk): 8 subspaces x 8 codewords trained
    by the deterministic Lloyd recipe, corpus vectors replaced by their
    codebook reconstruction, full-precision queries (asymmetric PQ) —
    the 32x-footprint billion-scale ANN layout; whole train -> encode
    -> decode -> rank chain oracle-replicated."""
    from webgraph_spark.functions.similarity import pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    return pq_topk(emb, queries, k=5, m=8, n_codes=8, iters=2, dim=64)


def q_pq_recall5(spark, sf_dir):
    """Recall@5 of the PQ scorer vs the exact float top-5 — the
    approximation-quality gate for the 32x compression."""
    from webgraph_spark.functions.similarity import pq_recall

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    return pq_recall(emb, queries, k=5, m=8, n_codes=8, iters=2, dim=64)


def q_mis(spark, sf_dir):
    """Maximal independent set (Luby 1986, algos/mis.py) of the simple
    link graph: engine-portable md5 round priorities, (p, node)-tuple
    winner rule, winners+neighbours leave the live set. Fixed 5-round
    schedule (fixpoint at 3 on this graph; extra rounds are no-ops) for
    the unrolled-SQL oracle twin. Returns (node, round selected)."""
    from webgraph_spark.algos.mis import luby_mis

    res = luby_mis(_edges(spark, sf_dir), fixed_rounds=5, num_partitions=16)
    return res.selected.select(
        F.col("node").cast("long"), F.col("round").cast("int")
    )


def q_densest(spark, sf_dir):
    """Densest subgraph (Bahmani batched greedy peel, eps = 1/2,
    algos/densest.py): exact-integer peel test deg*n > 3m, exact
    cross-multiplied best-snapshot argmax. Fixed 4-round schedule
    (drains in 2 on this graph) for the unrolled-SQL oracle twin.
    Returns the densest snapshot's nodes with its (n, m)."""
    from webgraph_spark.algos.densest import densest_subgraph

    res = densest_subgraph(
        _edges(spark, sf_dir), fixed_rounds=4, num_partitions=16
    )
    return res.nodes.select(
        F.col("node").cast("long"),
        F.lit(res.n_nodes).cast("long").alias("n_nodes"),
        F.lit(res.m_edges).cast("long").alias("m_edges"),
    )


def q_local_cluster(spark, sf_dir):
    """Local clustering: PPR conductance sweep (Andersen-Chung-Lang
    posture, algos/localcluster.py) around the 10 smallest node ids —
    5 fixed PPR iterations, ranks rounded to 9 decimals before the
    score ordering (the green PPR query's cross-engine float contract),
    top-300 candidate sweep with exact integer cut/vol prefix sums.
    Returns the best prefix's members with (k, conductance)."""
    from webgraph_spark.algos.localcluster import ppr_sweep

    e = _edges(spark, sf_dir)
    seeds = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .orderBy("node")
        .limit(10)
    )
    res = ppr_sweep(e, seeds, iters=5, max_candidates=300, num_partitions=16)
    return res.members.select(
        F.col("node").cast("long"),
        F.col("sweep_rank").cast("int"),
        F.lit(res.k).cast("int").alias("k"),
        F.round(F.lit(res.conductance), 9).alias("conductance"),
    )


def q_matching(spark, sf_dir):
    """Maximal matching (distributed handshaking, Israeli-Itai posture,
    algos/matching.py): each live node points at its min-md5-priority
    incident edge; mutual picks enter the matching, matched nodes leave.
    Fixed 6-round schedule (fixpoint at 3-4 on this graph; extra rounds
    are no-ops) for the unrolled-SQL oracle twin. Returns the matched
    edges (a, b, round) — node-disjoint by construction."""
    from webgraph_spark.algos.matching import maximal_matching

    res = maximal_matching(
        _edges(spark, sf_dir), fixed_rounds=6, num_partitions=16
    )
    return res.matching.select(
        F.col("a").cast("long"), F.col("b").cast("long"),
        F.col("round").cast("int"),
    )


def q_partition4(spark, sf_dir):
    """Balanced edge-locality partitioning (deterministic Spinner
    variant, algos/partition.py): 4 capacity-bounded synchronous LP
    rounds from the node%4 seed, k=4 blocks, 5% slack. The block id is
    the physical placement key a 100-TB deployment co-locates CSR
    adjacency blocks by. Returns the per-node assignment."""
    from webgraph_spark.algos.partition import balanced_partition

    res = balanced_partition(
        _edges(spark, sf_dir), k=4, rounds=4, slack_pct=5, num_partitions=16
    )
    return res.assignment.select(
        F.col("node").cast("long"), F.col("block").cast("int")
    )


def q_partition_quality(spark, sf_dir):
    """Quality row of q_partition4's assignment: cut arcs / total sym
    arcs, max block load, block count — all integer, exact."""
    from webgraph_spark.algos.partition import (
        balanced_partition,
        partition_quality,
    )

    e = _edges(spark, sf_dir)
    res = balanced_partition(e, k=4, rounds=4, slack_pct=5, num_partitions=16)
    return partition_quality(e, res.assignment)


def q_coloring(spark, sf_dir):
    """Distributed greedy graph coloring (speculative mex + conflict
    handshake, algos/coloring.py) of the simple link graph: fixed
    engine-portable md5 priorities, every live node picks the mex of
    its final neighbours' colors, same-pick adjacent losers re-queue.
    Fixed 14-round schedule (fixpoint at 10 on this graph; extra rounds
    are no-ops) for the unrolled-SQL oracle twin. Returns (node, color,
    round assigned)."""
    from webgraph_spark.algos.coloring import speculative_coloring

    res = speculative_coloring(
        _edges(spark, sf_dir), fixed_rounds=14, num_partitions=16
    )
    return res.colors.select(
        F.col("node").cast("long"),
        F.col("color").cast("int"),
        F.col("round").cast("int"),
    )


def q_role_bigrams(spark, sf_dir):
    """Ordered-sequence bigram mining on the transcript payload: which
    event types follow which within a conversation under the stable
    per-turn ordering (conv = user_id, order = event_id — the
    input-hint invariant: analytics over turns must respect stable
    (conv_id, turn_idx) ordering). Exact transition counts + one IEEE
    double division for p(dst | src)."""
    from webgraph_spark.functions.mining import transition_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    seq = ev.select(
        F.col("user_id").alias("conv_id"),
        F.col("event_id"),
        F.col("event_type"),
    )
    return transition_counts(
        seq, "conv_id", ["event_id"], "event_type"
    ).select(
        F.col("src_label"), F.col("dst_label"),
        F.col("n").cast("long"), F.col("p"),
    )


def q_msf(spark, sf_dir):
    """Minimum spanning forest (distributed Borůvka, algos/msf.py) of
    the undirected weighted view of the labelled link graph (weight =
    arc multiplicity): per-component argmin edge under the (w, a, b)
    total order, mutual-minimum cycle break, pointer-doubling merge.
    Fixed 6-round / 12-jump schedule (fixpoint at 4 rounds on this
    graph; the schedule is idempotent past it) for the unrolled-SQL
    oracle twin. Returns the forest edges (a, b, w)."""
    from webgraph_spark.algos.msf import boruvka_msf

    e = td.tpch_edges_labelled(spark, sf_dir)
    res = boruvka_msf(e, "label", fixed_rounds=6, jumps=12, num_partitions=16)
    return res.forest.select(
        F.col("a").cast("long"), F.col("b").cast("long"), F.col("w").cast("long")
    )


def q_compose_minplus(spark, sf_dir):
    """Min-plus semiring composition (Transform.compose with a
    LabelSemiring, Transform.java:2125-2265): cheapest customer->part
    2-hop cost over the multiplicity-labelled layers."""
    from webgraph_spark.operators.transforms import compose_semiring

    le = td.tpch_edges_labelled(spark, sf_dir)
    g0 = le.where(F.col("src") < td.OFF_ORDER)
    g1 = le.where((F.col("src") >= td.OFF_ORDER) & (F.col("src") < td.OFF_PART))
    out = compose_semiring(g0, g1, "label")
    return out.select("src", "dst", F.col("label").cast("long").alias("label"))


def q_union_labelled(spark, sf_dir):
    """Labelled union with SUM merge strategy
    (labelling/UnionArcLabelledImmutableGraph + LabelMergeStrategy):
    full labelled arcs unioned with the multiplicity>1 arcs re-labelled
    1, so overlap arcs exercise the merge and singletons pass through."""
    from webgraph_spark.operators.transforms import union_labelled

    le = td.tpch_edges_labelled(spark, sf_dir)
    boost = le.where(F.col("label") > 1).select(
        "src", "dst", F.lit(1).alias("label")
    )
    out = union_labelled(le, boost, "label", merge="sum")
    return out.select("src", "dst", F.col("label").cast("long").alias("label"))


def q_seeded_perm(spark, sf_dir):
    """Portable seeded random permutation
    (Transform.randomPermutation, Transform.java:2436-2453): nodes
    relabelled by dense rank over (md5_long(node || ':seed'), node) —
    an engine-portable total order — then the arc table remapped.
    Distributed rank via assign_dense_ids (no global window)."""
    from webgraph_spark.functions.hashing import md5_long
    from webgraph_spark.operators.transforms import map_nodes
    from webgraph_spark.util.ids import assign_dense_ids

    e = _edges(spark, sf_dir)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn(
            "_h", md5_long(F.concat(F.col("node").cast("string"), F.lit(":42")))
        )
    )
    perm = assign_dense_ids(nodes, ["_h", "node"], id_col="target").drop("_h")
    return map_nodes(e, perm)


def q_ecc_sample(spark, sf_dir):
    """Forward eccentricity + reachable-set size from the 5 smallest
    customer sources (examples/BreadthFirst analog, BreadthFirst.java):
    per-source max BFS level over the batched multi-source BFS."""
    from webgraph_spark.algos.centrality import multi_source_bfs

    e = _edges(spark, sf_dir)
    srcs = [
        r[0]
        for r in e.where(F.col("src") < td.OFF_ORDER)
        .select("src")
        .distinct()
        .orderBy("src")
        .limit(5)
        .collect()
    ]
    d = multi_source_bfs(e, srcs)
    return d.groupBy("source").agg(
        F.max("dist").cast("long").alias("ecc"),
        F.count("*").cast("long").alias("n_reached"),
    )


def q_landmark_sketch(spark, sf_dir):
    """Landmark distance sketch (algos/landmarks.py): 3 top-sym-degree
    landmarks, one batched multi-source BFS to depth 4 on the
    symmetrized loop-free graph, pivoted to wide int distance columns
    (null = unreached). The distance-oracle companion to
    SampleDistanceCDF — built once, pairwise estimates are then
    row-local. Oracle: unrolled frontier CTEs replaying the same BFS."""
    from webgraph_spark.algos.landmarks import landmark_sketch

    sk = landmark_sketch(_edges(spark, sf_dir), n_landmarks=3, max_depth=4)
    return sk.select(
        F.col("node").cast("long"),
        *[F.col(f"d{i}").cast("int") for i in range(3)],
    )


def q_events_anomaly(spark, sf_dir):
    """Per-type hourly volume z-scores: hours whose event count
    deviates from the type's mean (population sigma). Moments are
    EXACT integer sums, so both engines divide identical operands —
    no float-order hazard anywhere. The monitoring primitive a
    continuous-ingest deployment alarms on."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    h = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(F.count("*").alias("n"))
    )
    stats = h.groupBy("event_type").agg(
        F.count("*").alias("k"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    j = h.join(F.broadcast(stats), "event_type")
    mu = F.col("s1").cast("double") / F.col("k")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("k")
    ) / F.col("k")
    z = F.when(
        var > 0, F.round((F.col("n") - mu) / F.sqrt(var), 6)
    )
    return j.select(
        "event_type",
        F.date_format("hour", "yyyy-MM-dd HH:00").alias("hour"),
        F.col("n").cast("long"),
        z.alias("z"),
    )


def _events_anomaly_sql() -> str:
    return """WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
st AS (SELECT event_type, COUNT(*) AS k, SUM(n) AS s1,
              SUM(n * n) AS s2 FROM h GROUP BY event_type)
SELECT h.event_type, strftime(h.hour, '%Y-%m-%d %H:00') AS hour,
       CAST(h.n AS BIGINT) AS n,
       CASE WHEN (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k) / k > 0
            THEN ROUND((h.n - CAST(s1 AS DOUBLE) / k)
                 / sqrt((CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * s1 / k) / k), 6) END AS z
FROM h JOIN st ON h.event_type = st.event_type"""


def q_trustrank(spark, sf_dir):
    """TrustRank (algos/pagerank.py:trustrank): inverse-PageRank seed
    selection (5 rounds, top-20 at a round-9 deterministic cut) +
    8 rounds of seed-restart trust propagation — the canonical
    link-spam-demotion pipeline, both stages the engine's standard
    one-shuffle-per-iteration PageRank plan."""
    from webgraph_spark.algos.pagerank import trustrank

    return trustrank(
        _edges(spark, sf_dir),
        n_seeds=20, inv_iters=5, iters=8, num_partitions=16,
    ).select(F.col("node").cast("long"), "trust")


def q_oddball(spark, sf_dir):
    """OddBall ego-net anomaly scores (algos/features.py:oddball_scores)
    over the user co-occurrence projection (triangle-bearing surface):
    log-space residuals from the Ego Density Power Law fit. Regression
    sums ride exact decimals, so alpha/beta and every score are
    engine-identical."""
    from webgraph_spark.algos.features import oddball_scores
    from webgraph_spark.functions.mining import bipartite_project

    proj = bipartite_project(
        _user_attr_pairs(spark, sf_dir), min_weight=7
    ).select("src", "dst")
    return oddball_scores(proj)


def _oddball_sql() -> str:
    return f"""WITH ua AS (
  SELECT DISTINCT user_id AS u, {_PROJ_ATTR_SQL} AS a FROM events),
proj AS (
  SELECT x.u AS src, y.u AS dst FROM ua x JOIN ua y
  ON x.a = y.a AND x.u < y.u
  GROUP BY x.u, y.u HAVING COUNT(*) >= 7),
und AS (
  SELECT src, dst FROM proj WHERE src <> dst
  UNION
  SELECT dst AS src, src AS dst FROM proj WHERE src <> dst),
deg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS d FROM und GROUP BY src),
orient AS MATERIALIZED (
  SELECT u.src, u.dst FROM und u
  JOIN deg ds ON ds.node = u.src
  JOIN deg dd ON dd.node = u.dst
  WHERE ds.d < dd.d OR (ds.d = dd.d AND u.src < u.dst)),
tri AS (
  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
  FROM orient e1
  JOIN orient e2 ON e1.dst = e2.src
  JOIN orient e3 ON e3.src = e1.src AND e3.dst = e2.dst),
corners AS (
  SELECT u AS node FROM tri UNION ALL
  SELECT v FROM tri UNION ALL SELECT w FROM tri),
pt AS (SELECT node, COUNT(*) AS t FROM corners GROUP BY node),
base AS (
  SELECT d.node, d.d AS deg, d.d + COALESCE(pt.t, 0) AS ego_edges
  FROM deg d LEFT JOIN pt ON d.node = pt.node),
terms AS MATERIALIZED (
  SELECT node, deg, ego_edges,
         ROUND(ln(CAST(deg AS DOUBLE)), 9) AS x,
         ROUND(ln(CAST(ego_edges AS DOUBLE)), 9) AS y
  FROM base),
sums AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * y, 12) AS DECIMAL(38,12))) AS DOUBLE)
           AS sxy,
         CAST(SUM(CAST(ROUND(x * x, 12) AS DECIMAL(38,12))) AS DOUBLE)
           AS sxx
  FROM terms),
coefs AS (
  SELECT (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0.0) AS beta,
         n, sx, sy FROM sums),
c2 AS (SELECT beta, (sy - beta * sx) / n AS alpha FROM coefs)
SELECT t.node, CAST(t.deg AS BIGINT) AS deg,
       CAST(t.ego_edges AS BIGINT) AS ego_edges,
       ROUND(ABS(t.y - (c.alpha + c.beta * t.x)), 6) AS score
FROM terms t CROSS JOIN c2 c"""


def q_fiedler(spark, sf_dir):
    """Approximate Fiedler vector (algos/spectral.py:fiedler_bisection):
    12 deflated power-iteration rounds on cI - L, the spectral-
    bisection partitioning signal. Fixed rounds, md5-parity start;
    both engines execute the identical recurrence."""
    from webgraph_spark.algos.spectral import fiedler_bisection

    return fiedler_bisection(
        _edges(spark, sf_dir), iters=12, num_partitions=16
    ).select(F.col("node").cast("long"), "score")


def q_trunc_top5(spark, sf_dir):
    """Matryoshka-truncated top-5 cosine: score on the first 16 of 64
    dims (4x compute/bandwidth saving; the slice happens before the
    cross join so the corpus scan ships 16 floats per row)."""
    from webgraph_spark.functions.similarity import truncated_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    return truncated_topk(emb, queries, k=5, dim_keep=16)


def q_trunc_recall5(spark, sf_dir):
    """Recall@5 of the 16-dim truncated scorer vs the exact 64-dim
    top-5 — the approximation-quality gate for dimension truncation.
    NOTE: the synthetic fixture embeddings are NOT matryoshka-trained
    (energy is uniform across dims), so this measures ~0.08 — the gate
    correctly reporting that truncation is unsafe on non-MRL vectors;
    the pytest shows recall ~1.0 when the prefix carries the energy."""
    from webgraph_spark.functions.similarity import truncated_recall

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    return truncated_recall(emb, queries, k=5, dim_keep=16)


def q_attack_tolerance(spark, sf_dir):
    """Albert-Jeong-Barabasi attack-tolerance curve: delete the k
    top-degree hubs (k = 0, 10, 50) and measure fragmentation
    (largest CC, component count) of the survivors — star-CC to
    fixpoint per point, truncation-raising
    (algos/components.py:attack_tolerance)."""
    from webgraph_spark.algos.components import attack_tolerance

    return attack_tolerance(
        _edges(spark, sf_dir), ks=[0, 10, 50], num_partitions=16
    )


def q_langid_trained(spark, sf_dir):
    """Trained in-engine language ID (functions/langid.py): one-vs-rest
    logistic regression over hashed char-trigram fractions, full-batch
    GD, argmax with a CASE-chain tie-break. The driver corpus' lang
    labels are synthetic noise, so this row gates cross-engine GD
    determinism; the accuracy gate lives in the pytest on a separable
    fixture."""
    from webgraph_spark.functions.langid import train_and_classify

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return train_and_classify(docs).select(
        F.col("doc_id").cast("long"), "lang_true", "pred", "p"
    )


def _langid_sql_cached() -> str:
    from webgraph_spark.functions.langid import langid_sql

    return langid_sql()


def q_events_funnel(spark, sf_dir):
    """view -> click -> purchase ordered funnel over the events table
    (functions/mining.py:funnel_counts): per prefix, users completing
    the steps in strict epoch-microsecond order, plus exact total lag.
    One filtered min-agg per step, joins co-keyed on user — no event
    arrays, no whole-stream window."""
    from webgraph_spark.functions.mining import funnel_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return funnel_counts(ev, ["view", "click", "purchase"]).select(
        F.col("step").cast("int"),
        "event_type",
        F.col("n_users").cast("long"),
        F.col("total_lag_us").cast("long"),
    )


def _events_funnel_sql() -> str:
    return """WITH p1 AS (
  SELECT user_id AS u, MIN(epoch_us(ts)) AS t1, MIN(epoch_us(ts)) AS tk
  FROM events WHERE event_type = 'view' GROUP BY user_id),
p2 AS (
  SELECT e.user_id AS u, MIN(p.t1) AS t1, MIN(epoch_us(e.ts)) AS tk
  FROM events e JOIN p1 p ON e.user_id = p.u
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > p.tk
  GROUP BY e.user_id),
p3 AS (
  SELECT e.user_id AS u, MIN(p.t1) AS t1, MIN(epoch_us(e.ts)) AS tk
  FROM events e JOIN p2 p ON e.user_id = p.u
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > p.tk
  GROUP BY e.user_id)
SELECT CAST(1 AS INT) AS step, 'view' AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(0 AS BIGINT) AS total_lag_us FROM p1
UNION ALL
SELECT 2, 'click', CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM(tk - t1), 0) AS BIGINT) FROM p2
UNION ALL
SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM(tk - t1), 0) AS BIGINT) FROM p3"""


def q_transitivity(spark, sf_dir):
    """Global transitivity C = 3*triangles / wedges, wedges =
    sum d(d-1)/2 — the whole-graph companion to the per-node
    graph_clustering_coeff, computed over the user co-occurrence
    projection (the layered TPC-H link graph is triangle-free by
    construction, so the projection is the triangle-bearing surface,
    same as graph_truss4). Exact integer numerator and denominator
    (the wedge sum aggregates the even integer d*(d-1) as decimal(38,0)
    and halves after the aggregation, so it stays exact past 2^53
    total wedges); one float division at the end."""
    from webgraph_spark.algos.triangles import triangle_count
    from webgraph_spark.functions.mining import bipartite_project
    from webgraph_spark.operators.transforms import simplify

    e = bipartite_project(
        _user_attr_pairs(spark, sf_dir), min_weight=7
    ).select("src", "dst")
    tri = triangle_count(e)
    sym = simplify(e)
    w = (
        sym.groupBy("src")
        .agg(F.count("*").alias("d"))
        .agg(
            # sum the even integer d*(d-1) exactly (decimal, no double
            # path), halve AFTER aggregation — exact past 2^53
            (F.sum((F.col("d") * (F.col("d") - 1)).cast("decimal(38,0)")) / 2)
            .cast("long")
            .alias("wedges")
        )
    )
    return w.select(
        F.lit(int(tri)).cast("long").alias("triangles"),
        "wedges",
        F.round(
            F.lit(3.0) * F.lit(int(tri)) / F.col("wedges").cast("double"), 6
        ).alias("transitivity"),
    )


def _transitivity_sql() -> str:
    return f"""WITH ua AS (
  SELECT DISTINCT user_id AS u, {_PROJ_ATTR_SQL} AS a FROM events),
proj AS (
  SELECT x.u AS src, y.u AS dst FROM ua x JOIN ua y
  ON x.a = y.a AND x.u < y.u
  GROUP BY x.u, y.u HAVING COUNT(*) >= 7),
und AS (
  SELECT src, dst FROM proj WHERE src <> dst
  UNION
  SELECT dst AS src, src AS dst FROM proj WHERE src <> dst
),
deg AS (SELECT src AS node, COUNT(*) AS d FROM und GROUP BY src),
orient AS (
  SELECT u.src, u.dst FROM und u
  JOIN deg ds ON ds.node = u.src
  JOIN deg dd ON dd.node = u.dst
  WHERE ds.d < dd.d OR (ds.d = dd.d AND u.src < u.dst)
),
tri AS (SELECT COUNT(*) AS t FROM orient e1
  JOIN orient e2 ON e1.dst = e2.src
  JOIN orient e3 ON e3.src = e1.src AND e3.dst = e2.dst),
wed AS (SELECT CAST(SUM(CAST(d * (d - 1) AS HUGEINT)) // 2 AS BIGINT)
          AS wedges FROM deg)
SELECT CAST(tri.t AS BIGINT) AS triangles, wed.wedges,
       ROUND(3.0 * tri.t / CAST(wed.wedges AS DOUBLE), 6) AS transitivity
FROM tri, wed"""


def _triangle_participation_sql() -> str:
    ctes, final = _motifs._dir_profile_parts()
    return f"""WITH {td.EDGES_CTE},
{ctes},
tprof AS MATERIALIZED (
{final})
SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(CASE WHEN t_cyc + t_mid + t_in + t_out > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS tri_nodes,
       ROUND(SUM(CASE WHEN t_cyc + t_mid + t_in + t_out > 0
                      THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS participation
FROM tprof"""


def _transitivity_null_sql() -> str:
    return f"""WITH ua AS (
  SELECT DISTINCT user_id AS u, {_PROJ_ATTR_SQL} AS a FROM events),
proj AS (
  SELECT x.u AS src, y.u AS dst FROM ua x JOIN ua y
  ON x.a = y.a AND x.u < y.u
  GROUP BY x.u, y.u HAVING COUNT(*) >= 7),
und AS (
  SELECT src, dst FROM proj WHERE src <> dst
  UNION
  SELECT dst AS src, src AS dst FROM proj WHERE src <> dst
),
deg AS (SELECT src AS node, COUNT(*) AS d FROM und GROUP BY src),
orient AS (
  SELECT u.src, u.dst FROM und u
  JOIN deg ds ON ds.node = u.src
  JOIN deg dd ON dd.node = u.dst
  WHERE ds.d < dd.d OR (ds.d = dd.d AND u.src < u.dst)
),
tri AS (SELECT COUNT(*) AS t FROM orient e1
  JOIN orient e2 ON e1.dst = e2.src
  JOIN orient e3 ON e3.src = e1.src AND e3.dst = e2.dst),
mom AS (SELECT CAST(SUM(d) AS BIGINT) AS s1,
               CAST(SUM(d * d) AS BIGINT) AS s2,
               CAST(SUM(CAST(d * (d - 1) AS HUGEINT)) // 2 AS BIGINT) AS wedges
        FROM deg)
SELECT CAST(tri.t AS BIGINT) AS triangles, mom.wedges,
       ROUND(3.0 * tri.t / CAST(mom.wedges AS DOUBLE), 6) AS transitivity,
       ROUND(CAST(mom.s2 - mom.s1 AS DOUBLE) * CAST(mom.s2 - mom.s1 AS DOUBLE)
             / (CAST(mom.s1 AS DOUBLE) * CAST(mom.s1 AS DOUBLE)
                * CAST(mom.s1 AS DOUBLE)), 6) AS c_null,
       ROUND((3.0 * tri.t / CAST(mom.wedges AS DOUBLE))
             / (CAST(mom.s2 - mom.s1 AS DOUBLE) * CAST(mom.s2 - mom.s1 AS DOUBLE)
                / (CAST(mom.s1 AS DOUBLE) * CAST(mom.s1 AS DOUBLE)
                   * CAST(mom.s1 AS DOUBLE))), 3) AS ratio
FROM tri, mom"""


def q_events_retention(spark, sf_dir):
    """Day-granular retention cohorts: users grouped by first-activity
    day (cohort), counted by distinct activity on each later day-offset
    — the canonical product-analytics triangle table. Two aggregations
    + one user-keyed join; distinct (cohort, offset, user) collapses in
    map-side partials, so hub users cost one row per active day."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    days = F.date_trunc("day", F.col("ts"))
    acts = ev.select(
        F.col("user_id").alias("u"), days.alias("d")
    ).distinct()
    first = acts.groupBy("u").agg(F.min("d").alias("cohort"))
    joined = acts.join(first, "u").select(
        "cohort",
        F.datediff(F.col("d"), F.col("cohort")).alias("day_offset"),
        "u",
    )
    return (
        joined.groupBy("cohort", "day_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.col("day_offset").cast("int"),
            "n_users",
        )
    )


def _events_retention_sql() -> str:
    return """WITH acts AS (
  SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS d FROM events),
first AS (SELECT u, MIN(d) AS cohort FROM acts GROUP BY u)
SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', f.cohort, a.d) AS INT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM acts a JOIN first f ON a.u = f.u
GROUP BY 1, 2"""


def q_bowtie(spark, sf_dir):
    """Broder bowtie decomposition (algos/bowtie.py) of the TPC-H link
    graph made cyclic with nation-mediated supplier->customer back-arcs
    (td.cyclic_edges). Pivot = smallest customer with orders whose
    nation has suppliers; three set-reachability BFS sweeps classify
    every node as core/in/out/tendrils+tubes/disconnected. Spark runs
    the sweeps to fixpoint (raising if >12 rounds were needed); the
    oracle unrolls exactly 12 rounds, so equal depth = equal sets."""
    from webgraph_spark.algos.bowtie import bowtie

    e = td.cyclic_edges(spark, sf_dir)
    p = td.bowtie_pivot(spark, sf_dir)
    res = bowtie(e, pivot=p, max_rounds=13)
    return res.counts.select(
        "component", F.col("n_nodes").cast("long")
    )


def q_dsir_weights(spark, sf_dir):
    """DSIR importance log-weights (functions/curation.py): hashed
    word-bigram bucket LMs for target = docs from source 'src0' vs all
    other docs, add-one smoothing, per-doc summed log-likelihood ratio.
    Decimal(38,9) sums of 9-digit-rounded per-bucket log ratios make
    the result order-independent and engine-exact."""
    from webgraph_spark.functions.curation import dsir_log_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = dsir_log_weights(
        docs, "doc_id", "text", F.col("source") == "src0",
        ngram=2, n_buckets=1024,
    )
    return w.select(
        F.col("id").cast("long").alias("doc_id"), "n_grams", "logw"
    )


def q_dsir_sample(spark, sf_dir):
    """Derandomized Gumbel-top-50 DSIR resample: logw + Gumbel noise
    from a portable md5-derived uniform, largest 50 win. The exact
    DSIR sampling rule with a reproducible seed — both engines select
    the identical documents."""
    from webgraph_spark.functions.curation import (
        dsir_gumbel_topk,
        dsir_log_weights,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = dsir_log_weights(
        docs, "doc_id", "text", F.col("source") == "src0",
        ngram=2, n_buckets=1024,
    )
    return dsir_gumbel_topk(w, k=50).select(
        F.col("id").cast("long").alias("doc_id"), "logw", "key"
    )


def _dsir_cte() -> str:
    # deferred: _TOKS is defined further down the module
    return f"""
dtoks AS (SELECT doc_id AS id, (source = 'src0') AS tgt, {_TOKS} AS t
          FROM documents),
dgr AS (SELECT id, tgt, unnest(
    CASE WHEN len(t) >= 2
         THEN list_transform(range(1, len(t)),
                             i -> array_to_string(t[i:i+1], ' '))
         ELSE [array_to_string(t, ' ')] END) AS g
  FROM dtoks),
dfb AS MATERIALIZED (SELECT id, tgt,
    (('0x' || substr(md5(g), 1, 15))::BIGINT % 1024) AS b FROM dgr),
dbc AS MATERIALIZED (SELECT b,
    SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
    SUM(CASE WHEN tgt THEN 0 ELSE 1 END) AS cs
  FROM dfb GROUP BY b),
dtot AS (SELECT SUM(ct) AS big_ct, SUM(cs) AS big_cs FROM dbc),
dlr AS (SELECT b,
    ROUND(ln((CAST(ct + 1 AS DOUBLE) * (big_cs + 1024))
           / (CAST(cs + 1 AS DOUBLE) * (big_ct + 1024))),
          9)::DECIMAL(38,9) AS lr
  FROM dbc, dtot),
dw AS (SELECT f.id, COUNT(*) AS n_grams, SUM(l.lr) AS s
       FROM dfb f JOIN dlr l ON f.b = l.b GROUP BY f.id)"""


def _dsir_weights_sql() -> str:
    return f"""WITH {_dsir_cte()}
SELECT id AS doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       ROUND(CAST(s AS DOUBLE), 6) AS logw
FROM dw"""


def _dsir_sample_sql(k: int = 50) -> str:
    m = 1 << 48
    return f"""WITH {_dsir_cte()},
dwf AS (SELECT id, ROUND(CAST(s AS DOUBLE), 6) AS logw FROM dw),
du AS (SELECT id, logw,
    (CAST(('0x' || substr(md5('dsir:' || CAST(id AS VARCHAR)), 1, 15))::BIGINT
          % {m} AS DOUBLE) + 0.5) / {float(m)} AS u
  FROM dwf)
SELECT id AS doc_id, logw, ROUND(logw + (-ln(-ln(u))), 6) AS key
FROM du ORDER BY key DESC, id ASC LIMIT {k}"""


def q_rich_club(spark, sf_dir):
    """Rich-club curve phi(k) over every observed sym-degree threshold
    (algos/features.py:rich_club): density of the subgraph induced by
    nodes of degree > k, computed entirely from two degree histograms
    + suffix sums — no per-k subgraph materialization."""
    from webgraph_spark.algos.features import rich_club

    return rich_club(_edges(spark, sf_dir))


def _rich_club_sql() -> str:
    return f"""WITH {td.EDGES_CTE},{td.SYM_CTE},
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM sym GROUP BY src),
am AS (SELECT LEAST(a.deg, b.deg) AS val
       FROM sym s JOIN deg a ON s.src = a.src JOIN deg b ON s.dst = b.src),
nh AS (SELECT deg AS val, COUNT(*) AS n_at FROM deg GROUP BY deg),
ah AS (SELECT val, COUNT(*) AS a_at FROM am GROUP BY val),
vals AS (SELECT COALESCE(nh.val, ah.val) AS val,
                COALESCE(n_at, 0) AS n_at, COALESCE(a_at, 0) AS a_at
         FROM nh FULL OUTER JOIN ah ON nh.val = ah.val),
cum AS (SELECT val, n_at,
  COALESCE(SUM(n_at) OVER (ORDER BY val DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_gt,
  COALESCE(SUM(a_at) OVER (ORDER BY val DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a_gt
  FROM vals)
SELECT CAST(val AS BIGINT) AS k,
       CAST(n_gt AS BIGINT) AS n_rich,
       CAST(a_gt AS BIGINT) AS rich_arcs,
       CASE WHEN n_gt >= 2 THEN
         ROUND(CAST(a_gt AS DOUBLE) / (n_gt * (n_gt - 1)), 6) END AS phi
FROM cum WHERE n_at > 0"""


def q_rich_club_norm(spark, sf_dir):
    """Normalized rich-club rho(k) = observed rich arcs / their exact
    configuration-model expectation (S^2 - Q)/M (Colizza et al. 2006)
    — same histogram-suffix-sum plan as graph_rich_club with two extra
    window columns; rho > 1 = ordering beyond the degree sequence."""
    from webgraph_spark.algos.features import rich_club_normalized

    return rich_club_normalized(_edges(spark, sf_dir))


def _rich_club_norm_sql() -> str:
    return f"""WITH {td.EDGES_CTE},{td.SYM_CTE},
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM sym GROUP BY src),
am AS (SELECT LEAST(a.deg, b.deg) AS val
       FROM sym s JOIN deg a ON s.src = a.src JOIN deg b ON s.dst = b.src),
nh AS (SELECT deg AS val, COUNT(*) AS n_at FROM deg GROUP BY deg),
ah AS (SELECT val, COUNT(*) AS a_at FROM am GROUP BY val),
vals AS (SELECT COALESCE(nh.val, ah.val) AS val,
                COALESCE(n_at, 0) AS n_at, COALESCE(a_at, 0) AS a_at
         FROM nh FULL OUTER JOIN ah ON nh.val = ah.val),
tot AS (SELECT SUM(a_at) AS m_total FROM vals),
cum AS (SELECT val, n_at,
  COALESCE(SUM(n_at) OVER (ORDER BY val DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_gt,
  COALESCE(SUM(a_at) OVER (ORDER BY val DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a_gt,
  COALESCE(SUM(val * n_at) OVER (ORDER BY val DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s_gt,
  COALESCE(SUM(val * val * n_at) OVER (ORDER BY val DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS q_gt
  FROM vals)
SELECT CAST(val AS BIGINT) AS k,
       CAST(n_gt AS BIGINT) AS n_rich,
       CAST(a_gt AS BIGINT) AS rich_arcs,
       CASE WHEN n_gt >= 2 THEN
         ROUND(CAST(a_gt AS DOUBLE) / (n_gt * (n_gt - 1)), 6) END AS phi,
       CASE WHEN n_gt >= 2 AND a_gt > 0 THEN
         ROUND(CAST(a_gt AS DOUBLE)
             / ((CAST(s_gt AS DOUBLE) * s_gt - CAST(q_gt AS DOUBLE))
                / CAST(m_total AS DOUBLE)), 6) END AS rho
FROM cum, tot WHERE n_at > 0"""


def q_landmark_est(spark, sf_dir):
    """Distance-oracle QUERY side: row-local pairwise estimates
    d_hat(u,v) = min_i d(u,l_i)+d(l_i,v) from the landmark sketch, over
    the 190 u<v pairs of the 20 smallest customer nodes. Null = no
    landmark covers both ends within the BFS horizon — the honest
    unknown. At 100 TB the sketch is built once; this query is two
    broadcast joins + a row-local least(), no traversal."""
    from webgraph_spark.algos.landmarks import (
        estimate_distances,
        landmark_sketch,
    )

    e = _edges(spark, sf_dir)
    sk = landmark_sketch(e, n_landmarks=3, max_depth=4)
    cands = [
        r[0]
        for r in e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .where(F.col("node") < td.OFF_ORDER)
        .distinct()
        .orderBy("node")
        .limit(20)
        .collect()
    ]
    pairs = spark.createDataFrame(
        [(u, v) for u in cands for v in cands if u < v], "u long, v long"
    )
    est = estimate_distances(sk, pairs)
    return est.select(
        F.col("u").cast("long"),
        F.col("v").cast("long"),
        F.col("d_hat").cast("int"),
    )


def q_kcore5(spark, sf_dir):
    """5-core of the simplified TPC-H link graph by iterative degree
    peeling (not a reference operator — first-class dense-subgraph
    analytic; one degree shuffle + two semi-joins per round, shrinking
    monotonically). Oracle: 8 unrolled peel rounds (fixpoint is 4 at
    both sf0.001 and sf0.01; extra rounds are no-ops)."""
    from webgraph_spark.algos.kcore import kcore

    return kcore(_edges(spark, sf_dir), k=5)


def q_docs_pii(spark, sf_dir):
    """PII scrub pass (emails / IPv4s / phone numbers -> typed
    placeholders). The synthetic corpus carries no PII, so the query
    plants a deterministic contact line per doc, then counts matches per
    class and fingerprints the scrubbed output — the oracle re-runs the
    identical RE2-safe patterns in DuckDB."""
    from webgraph_spark.functions.pii import pii_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.2."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 call +1 555-000-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return pii_stats(aug, "doc_id", "text")


def q_coreness(spark, sf_dir):
    """Full core decomposition by the h-index iteration (Lü et al. 2016:
    iterating per-node h-index of neighbour values from degree converges
    to coreness). Oracle: 10 unrolled h-index rounds (fixpoint is 6/5
    rounds at sf0.001/sf0.01; the operator is a no-op past it)."""
    from webgraph_spark.algos.kcore import coreness

    out = coreness(_edges(spark, sf_dir))
    return out.select("node", F.col("c").alias("coreness"))


def q_extract_component(spark, sf_dir):
    """tool/ExtractComponent.java analog: largest connected component's
    node-induced subgraph of the directed edge table, re-indexed to
    dense ids in node order (composition of cc + induced_subgraph —
    the reference tool is exactly that composition)."""
    from webgraph_spark.algos.components import connected_components, largest_component

    e = _edges(spark, sf_dir)
    labels = connected_components(
        e, max_iter=8, num_partitions=16, algorithm="hashmin"
    ).labels
    sub, _id_map = largest_component(e, labels)
    return sub


def q_sssp6(spark, sf_dir):
    """Weighted shortest distances: 6 synchronous Bellman-Ford rounds
    over the labelled edge table (weight = arc multiplicity) from the
    customer nodes with key < 100. Integer distances — exact compare."""
    from webgraph_spark.algos.paths import sssp

    e = td.tpch_edges_labelled(spark, sf_dir)
    sources = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .where(F.col("node") < 100)
    )
    res = sssp(e, sources, weight_col="label", rounds=6, num_partitions=16)
    return res.distances.select("node", F.col("dist").cast("long").alias("dist"))


def q_dag_layers(spark, sf_dir):
    """Longest-path layering of the (structurally acyclic) TPC-H link
    graph: 4 max-propagation rounds reach the fixpoint (longest path 3)."""
    from webgraph_spark.algos.paths import dag_layers

    res = dag_layers(_edges(spark, sf_dir), rounds=4, num_partitions=16)
    return res.layers.select("node", F.col("layer").cast("long").alias("layer"))


def q_eigenvector8(spark, sf_dir):
    """Eigenvector centrality: 8 L1-normalized power-iteration rounds on
    the simplified (symmetrized, loop-free) graph — on the directed DAG
    the iterate drains to zero past the longest path, so the undirected
    score is the meaningful one."""
    from webgraph_spark.algos.spectral import eigenvector_centrality
    from webgraph_spark.operators.transforms import simplify

    return eigenvector_centrality(
        simplify(_edges(spark, sf_dir)), iters=8, num_partitions=16, round_to=9
    )


def q_salsa4(spark, sf_dir):
    """SALSA authority chain, 4 rounds from uniform-over-authorities."""
    from webgraph_spark.algos.spectral import salsa_authority

    return salsa_authority(
        _edges(spark, sf_dir), iters=4, num_partitions=16, round_to=9
    )


BM25_QUERY_TERMS = ["data", "model", "learning", "spark", "graph"]


def q_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: BM25 lexical + exact-cosine semantic lists
    fused by reciprocal-rank fusion (functions/retrieval.py) — the
    standard hybrid-search recipe for RAG/training-data stacks; both
    rankers bounded to a top-50 pool, fusion is a pool-sized join."""
    from webgraph_spark.functions.retrieval import hybrid_rrf_topk

    docs = _docs(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return hybrid_rrf_topk(
        docs, emb, BM25_QUERY_TERMS, query_vec_id=0, k=10, pool=50
    )


def q_bm25_top10(spark, sf_dir):
    """Okapi BM25 top-10 documents for a fixed bag-of-terms query
    (inverted-index DataFrame plan; ties break on doc_id)."""
    from webgraph_spark.functions.retrieval import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bm25_topk(docs, BM25_QUERY_TERMS, k=10)


def q_ngram_topk(spark, sf_dir):
    """Top-20 corpus trigrams with occurrence and document counts —
    boilerplate/template discovery over the documents table."""
    from webgraph_spark.functions.retrieval import ngram_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_topk(docs, n=3, k=20)


def q_bigram_lm(spark, sf_dir):
    """Corpus-trained add-one bigram LM: per-document mean negative
    log2 bigram probability (the statistical perplexity filter)."""
    from webgraph_spark.functions.retrieval import bigram_lm_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bigram_lm_scores(docs)


def q_kmeans(spark, sf_dir):
    """Deterministic Lloyd's k-means (k=4, 3 iterations, init = 4
    smallest vec_ids) over the embedding table; per-vector cluster and
    rounded squared distance to the final centroid."""
    from webgraph_spark.functions.clustering import kmeans

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned, _cents = kmeans(emb, k=4, iters=3)
    return assigned.select(F.col("id").alias("vec_id"), "cluster", "dist")


def q_hll_users(spark, sf_dir):
    """Portable-HLL approximate distinct users per event type (log2m=8),
    with the exact count and relative error — the sketch-quality gate
    (registers bit-identical to the SQL twin, not just the estimate)."""
    from webgraph_spark.functions.sketches import hll_approx_distinct

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return hll_approx_distinct(ev, ["event_type"], "user_id", log2m=8)


def q_tool_pairs(spark, sf_dir):
    """Market-basket mining on the transcript payload: which tools
    co-occur in a conversation, with support and lift vs independence
    (same tool derivation as the transcript pipeline: event_type on
    every third event)."""
    from webgraph_spark.functions.mining import cooccurrence

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    tr = ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.when(F.col("event_id") % 3 == 0, F.col("event_type"))
        .otherwise(F.lit(None).cast("string"))
        .alias("tool"),
    )
    return cooccurrence(tr, "conv_id", "tool")


def _transcripts_view(spark, sf_dir):
    """The events-derived transcripts table every transcript_* query
    shares (identical derivation to q_transcript_graph /
    testdata.TRANSCRIPT_EDGES_CTES): conv = user, stable (ts, event_id)
    turn order, user/assistant role by event parity, tool on every
    third event, text = event_type:event_id."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.when(F.col("event_id") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.concat_ws(":", "event_type", F.col("event_id").cast("string")).alias("text"),
        F.when(F.col("event_id") % 3 == 0, F.col("event_type"))
        .otherwise(F.lit(None).cast("string"))
        .alias("tool"),
        "ts",
    )


def q_tool_markov(spark, sf_dir):
    """Stationary tool-importance over the transcript payload: the
    tool->next-tool transition multigraph (consecutive tool turns within
    a conversation, self-transitions kept — Markov chain semantics) fed
    to weight-proportional PageRank (alpha=0.85, 8 fixed iterations) so
    hub tools rank by where conversations actually route, not raw
    frequency. Nodes are the tool names themselves; the oracle unrolls
    the identical recurrence over a lag-derived transition CTE."""
    from pyspark.sql import Window

    from webgraph_spark.algos.pagerank import pagerank_weighted

    tr = _transcripts_view(spark, sf_dir)
    tools = tr.filter(F.col("tool").isNotNull())
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    trans = (
        tools.select(
            F.col("tool").alias("src"),
            F.lead("tool").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("label"))
    )
    res = pagerank_weighted(trans, weight_col="label", fixed_iterations=8,
                            num_partitions=8)
    return res.ranks.select(
        F.col("node").alias("tool"), F.round("rank", 9).alias("rank")
    )


def q_turn_latency(spark, sf_dir):
    """Reply-latency rollup on the transcript payload: microsecond gap
    from the previous turn in the same conversation, attributed to the
    responding turn's role. Integer-exact sums/maxima (epoch-microsecond
    longs on both engines); the mean is one IEEE double division of two
    exact longs, rounded per row."""
    from pyspark.sql import Window

    tr = _transcripts_view(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gaps = (
        tr.select(
            "role",
            F.timestamp_diff(
                "MICROSECOND", F.lag("ts").over(w), F.col("ts")
            ).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    return gaps.groupBy("role").agg(
        F.count(F.lit(1)).alias("n_replies"),
        F.sum("gap_us").alias("sum_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.round(F.sum("gap_us") / F.count(F.lit(1)), 9).alias("avg_gap_us"),
    )


PACK_BUDGET = 64


def q_context_pack(spark, sf_dir):
    """Training-context packing on the transcript payload: turns fill
    fixed character-budget context windows in stable turn order
    (exclusive-prefix-sum chunking, functions/packing.py — one window
    cumsum per conversation, no per-row Python), then a per-window
    rollup. The overflow-tolerant chunk rule floor(excl/budget) is
    closed-form, so the oracle replicates it with the same window
    cumsum in SQL."""
    from webgraph_spark.functions.packing import pack_by_token_budget

    tr = _transcripts_view(spark, sf_dir).withColumn(
        "tokens", F.length("text").cast("long")
    )
    packed = pack_by_token_budget(
        tr, "tokens", PACK_BUDGET, "conv_id", "turn_idx"
    )
    return packed.groupBy("conv_id", "batch_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("tokens").alias("total_tokens"),
        F.min("turn_idx").cast("int").alias("first_turn"),
        F.max("turn_idx").cast("int").alias("last_turn"),
    )


def q_pattern_dups(spark, sf_dir):
    """Behavioral similarity candidates on the transcript payload:
    conversation pairs whose role+tool interaction pattern (one token
    per turn, stable turn order) collides in >= 1 MinHash LSH band,
    scored with the exact shingle-set Jaccard — the same
    MinHash -> LSH-band -> exact-Jaccard chain as docs_jaccard,
    bucketed end-to-end (never all-pairs), over pattern strings instead
    of document text. Surfaces conversation templates / scripted
    traffic; thresholding is the caller's choice (the jaccard column
    carries the evidence)."""
    from webgraph_spark.functions.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard,
    )

    tr = _transcripts_view(spark, sf_dir)
    tok = F.concat(
        F.col("role"),
        F.when(
            F.col("tool").isNotNull(), F.concat(F.lit("+"), F.col("tool"))
        ).otherwise(F.lit("")),
    )
    pat = (
        tr.select("conv_id", "turn_idx", tok.alias("tok"))
        .groupBy("conv_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "tok"))),
                    lambda s: s["tok"],
                ),
            ).alias("text")
        )
    )
    pairs = minhash_lsh_candidates(
        pat, "conv_id", "text", NUM_HASHES, BAND_ROWS, SHINGLE, HASH_SEED
    )
    return ngram_jaccard(pat, pairs, "conv_id", "text", SHINGLE)


def q_role_assortativity(spark, sf_dir):
    """Categorical (role) assortativity of the turn-sequence chain
    (Newman 2003 mixing coefficient): r = (m*Tr(E) - sum_i a_i*b_i) /
    (m^2 - sum_i a_i*b_i) over the (src_role, dst_role) transition
    counts. All three terms are EXACT int64 sums, so both engines
    compute the identical final double (same posture as
    graph_assortativity)."""
    from pyspark.sql import Window

    tr = _transcripts_view(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = (
        tr.select(
            F.col("role").alias("src_role"),
            F.lead("role").over(w).alias("dst_role"),
        )
        .filter(F.col("dst_role").isNotNull())
    )
    e = pairs.groupBy("src_role", "dst_role").agg(F.count(F.lit(1)).alias("c"))
    tot = e.agg(
        F.sum("c").alias("m"),
        F.sum(
            F.when(F.col("src_role") == F.col("dst_role"), F.col("c")).otherwise(
                F.lit(0)
            )
        ).alias("diag"),
    )
    rows = e.groupBy("src_role").agg(F.sum("c").alias("rc"))
    cols = e.groupBy("dst_role").agg(F.sum("c").alias("cc"))
    sab = (
        rows.join(cols, rows.src_role == cols.dst_role)
        .agg(F.sum(F.col("rc") * F.col("cc")).alias("s"))
    )
    return tot.crossJoin(sab).select(
        F.col("m").cast("long").alias("m_pairs"),
        F.round(
            (F.col("m").cast("double") * F.col("diag") - F.col("s"))
            / (F.col("m").cast("double") * F.col("m") - F.col("s")),
            9,
        ).alias("r_assort"),
    )


def q_conv_stats(spark, sf_dir):
    """Conversation-length distribution on the transcript payload (the
    degree-distribution analog for conversations): for each length,
    how many conversations have exactly that many turns and how many
    tool calls those conversations make in total. Integer-exact."""
    tr = _transcripts_view(spark, sf_dir)
    per_conv = tr.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.count("tool").alias("n_tool_calls"),
    )
    return per_conv.groupBy("n_turns").agg(
        F.count(F.lit(1)).alias("n_convs"),
        F.sum("n_tool_calls").alias("tool_calls"),
    )


def q_wpagerank5(spark, sf_dir):
    """Weighted PageRank over the labelled edge table: transition
    probability proportional to arc multiplicity (rank*w/W(u)), uniform
    dangling redistribution — 5 fixed iterations vs the unrolled SQL
    recurrence."""
    from webgraph_spark.algos.pagerank import pagerank_weighted

    ledges = td.tpch_edges_labelled(spark, sf_dir)
    res = pagerank_weighted(
        ledges, weight_col="label", fixed_iterations=5, num_partitions=16
    )
    return res.ranks.select("node", F.round("rank", 9).alias("rank"))


def q_heavy_hitters(spark, sf_dir):
    """Count-Min top-10 heavy hitters over events.user_id with a
    deliberately tight sketch (4x32 cells) so bucket collisions are real:
    est >= exact (one-sided CM guarantee), overcount column shows the
    collision inflation. Sketch cells bit-match the SQL twin."""
    from webgraph_spark.functions.sketches import count_min_topk

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return count_min_topk(
        ev, "user_id", d=4, w=32, k=10, seed=HASH_SEED
    )


def q_cocitation2(spark, sf_dir):
    """Co-citation matrix off-diagonals (pairs of nodes cited by >= 2
    common sources): wedge self-join on the citing endpoint + one
    count aggregation (algos/motifs.py)."""
    from webgraph_spark.algos.motifs import common_neighbor_counts

    return common_neighbor_counts(
        _edges(spark, sf_dir), mode="cocitation", min_count=2
    )


def q_quad_count(spark, sf_dir):
    """Exact 4-cycle count of the symmetrized simple graph via the
    diagonal-pair identity quads = sum C(cn,2) / 2 (all-int64)."""
    from webgraph_spark.algos.motifs import common_neighbor_counts

    cn = common_neighbor_counts(_edges(spark, sf_dir), mode="undirected")
    return cn.agg(
        (F.sum(F.col("common") * (F.col("common") - 1)) / 4)
        .cast("long")
        .alias("quads")
    )


def q_reciprocity(spark, sf_dir):
    """Arc reciprocity over the graph unioned with the reversed even-dst
    arcs (the base graph is a layered DAG with reciprocity 0; the
    deterministic partial reversal makes the fraction non-trivial)."""
    from webgraph_spark.algos.motifs import reciprocity

    e = _edges(spark, sf_dir)
    rev = e.where(F.col("dst") % 2 == 0).select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return reciprocity(e.unionByName(rev))


def q_reciprocity_corrected(spark, sf_dir):
    """Garlaschelli-Loffredo corrected reciprocity rho = (r - a)/(1 - a)
    (PRL 93, 268701): classical r = mutual/arcs compared against the
    arc density a = m/(n(n-1)) a random digraph with the same density
    would show — rho > 0 means genuinely reciprocal structure, not just
    density. Same partially-reversed graph as graph_reciprocity; exact
    integer counts, two float divisions at the end."""
    e_base = _edges(spark, sf_dir)
    rev = e_base.where(F.col("dst") % 2 == 0).select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    e = (
        e_base.unionByName(rev)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    n_df = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .agg(F.count("*").alias("n"))
    )
    m_df = e.agg(F.count("*").alias("m"))
    mut_df = e.join(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ["src", "dst"],
    ).agg(F.count("*").alias("mut"))
    a = F.col("m") / (F.col("n") * (F.col("n") - 1))
    r = F.col("mut") / F.col("m")
    return (
        n_df.crossJoin(m_df)
        .crossJoin(mut_df)
        .select(
            F.col("n").cast("long").alias("n_nodes"),
            F.col("m").cast("long").alias("arcs"),
            F.col("mut").cast("long").alias("mutual_arcs"),
            F.round(r, 6).alias("r"),
            F.round(a, 6).alias("a"),
            F.round((r - a) / (F.lit(1.0) - a), 6).alias("rho"),
        )
    )


def q_transitivity_null(spark, sf_dir):
    """Small-world evidence: observed transitivity vs its
    configuration-model expectation C_null = (s2 - s1)^2 / s1^3 (Newman
    2003, s_k = sum of degree^k) on the same co-occurrence projection
    as graph_transitivity. ratio >> 1 means triangles beyond what the
    degree sequence alone produces. Exact integer moments; float
    division at the end."""
    from webgraph_spark.algos.triangles import triangle_count
    from webgraph_spark.functions.mining import bipartite_project
    from webgraph_spark.operators.transforms import simplify

    e = bipartite_project(
        _user_attr_pairs(spark, sf_dir), min_weight=7
    ).select("src", "dst")
    tri = triangle_count(e)
    sym = simplify(e)
    mom = (
        sym.groupBy("src")
        .agg(F.count("*").alias("d"))
        .agg(
            F.sum("d").cast("long").alias("s1"),
            F.sum(F.col("d") * F.col("d")).cast("long").alias("s2"),
            # sum the even integer d*(d-1) exactly (decimal, no double
            # path), halve AFTER aggregation — exact past 2^53
            (F.sum((F.col("d") * (F.col("d") - 1)).cast("decimal(38,0)")) / 2)
            .cast("long")
            .alias("wedges"),
        )
    )
    c_obs = F.lit(3.0) * F.lit(int(tri)) / F.col("wedges").cast("double")
    c_null = (
        (F.col("s2") - F.col("s1")).cast("double")
        * (F.col("s2") - F.col("s1")).cast("double")
        / (
            F.col("s1").cast("double")
            * F.col("s1").cast("double")
            * F.col("s1").cast("double")
        )
    )
    return mom.select(
        F.lit(int(tri)).cast("long").alias("triangles"),
        "wedges",
        F.round(c_obs, 6).alias("transitivity"),
        F.round(c_null, 6).alias("c_null"),
        F.round(c_obs / c_null, 3).alias("ratio"),
    )


def q_pagerank_localization(spark, sf_dir):
    """PageRank mass localization: inverse participation ratio
    IPR = sum(p^2) (and its reciprocal, the effective number of nodes
    holding the mass) plus the Gini coefficient of the rank vector —
    the standard diagnostics for hub concentration of a centrality
    measure. Computed over the same 5-iteration recurrence as
    graph_pagerank5, on ranks scaled to exact int64 with ONE half-up
    round (v = round(rank*1e9, 0) — the identical single-round
    expression in both twins, no double-rounding) so every sum is
    integer and
    order-independent; the Gini rank index uses the distributed
    range-partition + offset rank of util/ids.assign_dense_ids (a
    global row_number window would funnel the table through ONE
    task)."""
    from webgraph_spark.util.ids import assign_dense_ids

    ranks = q_pagerank5(spark, sf_dir)
    v = F.round(F.col("rank") * F.lit(1e9), 0).cast("long").alias("v")
    o = assign_dense_ids(
        ranks.select("node", v), ["v", "node"], id_col="i0"
    ).select("v", (F.col("i0") + 1).alias("i"))
    agg = o.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
        F.sum(F.col("i") * F.col("v")).alias("siv"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n_nodes"),
        F.round(s2 / (s1 * s1), 9).alias("ipr"),
        F.round(s1 * s1 / s2, 3).alias("effective_nodes"),
        F.round(
            F.lit(2.0) * F.col("siv").cast("double") / (n * s1)
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    )


def _pagerank_localization_sql() -> str:
    parts = [td.EDGES_CTE, td.NODES_CTE] + td._pagerank_body(5, 0.85)
    return (
        "WITH " + ",".join(parts)
        + """,
pr AS (SELECT node,
              CAST(ROUND(rank * 1e9, 0) AS BIGINT) AS v FROM r5),
o AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, node) AS i FROM pr),
agg AS (SELECT COUNT(*) AS n, SUM(v) AS s1, SUM(v * v) AS s2,
               SUM(i * v) AS siv FROM o)
SELECT CAST(n AS BIGINT) AS n_nodes,
       ROUND(CAST(s2 AS DOUBLE) / (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)),
             9) AS ipr,
       ROUND(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(s2 AS DOUBLE),
             3) AS effective_nodes,
       ROUND(2.0 * CAST(siv AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
FROM agg"""
    )


def q_inout_degree_corr(spark, sf_dir):
    """Node-level in/out degree correlation (do high-in nodes also emit
    many arcs?) — Pearson over (d_in, d_out) pairs per node, exact
    integer moment sums, one degree aggregation. Distinct from
    graph_assortativity_dir, which correlates degrees across arc
    ENDPOINTS; this correlates the two degrees of the SAME node."""
    e = _edges(spark, sf_dir)
    dout = e.groupBy(F.col("src").alias("v")).agg(
        F.count("*").alias("dout")
    )
    din = e.groupBy(F.col("dst").alias("v")).agg(F.count("*").alias("din"))
    d = (
        dout.join(din, "v", "full_outer")
        .select(
            F.coalesce("dout", F.lit(0)).alias("o"),
            F.coalesce("din", F.lit(0)).alias("i"),
        )
    )
    # moments in DECIMAL(38,0): n*soo - so^2 overflows int64 on large
    # skewed graphs (hub d~3e6 at n~1e7 puts the cross terms past 2^63)
    # while the DuckDB twin sums in HUGEINT — decimal keeps both exact.
    dec = "decimal(38,0)"
    mom = d.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum("o").cast(dec).alias("so"),
        F.sum("i").cast(dec).alias("si"),
        F.sum(F.col("o").cast(dec) * F.col("o")).alias("soo"),
        F.sum(F.col("i").cast(dec) * F.col("i")).alias("sii"),
        F.sum(F.col("o").cast(dec) * F.col("i")).alias("soi"),
    )
    cov = F.col("n") * F.col("soi") - F.col("so") * F.col("si")
    vo = F.col("n") * F.col("soo") - F.col("so") * F.col("so")
    vi = F.col("n") * F.col("sii") - F.col("si") * F.col("si")
    return mom.select(
        F.col("n").cast("long").alias("n_nodes"),
        F.round(
            cov.cast("double")
            / F.sqrt(vo.cast("double") * vi.cast("double")),
            6,
        ).alias("corr_in_out"),
    )


def q_hub_dominance(spark, sf_dir):
    """Hub dominance: the fraction of arcs incident to the top-1% of
    nodes by total degree — the skew statistic that motivates salted
    aggregation and AQE skew joins at 100 TB (BENCH/BASELINE.md's hub
    caveats). k_top = ceil(n/100) nodes by (degree desc, node asc);
    exact integer arc counts. Ranking uses the distributed dense-rank
    of util/ids.assign_dense_ids on (-degree, node) — no
    single-partition global window. Both twins normalize the arc set
    up front (DISTINCT, no self-loops) so the query stays correct on
    multigraph/loopy inputs, and hub_share is an integer half-up
    division scaled by 1e6 — no libm ROUND in either engine."""
    from webgraph_spark.util.ids import assign_dense_ids

    e = (
        _edges(spark, sf_dir)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    ranked = assign_dense_ids(
        deg.withColumn("negd", -F.col("d")), ["negd", "v"], id_col="rk0"
    ).select("v", (F.col("rk0") + 1).alias("rk"))
    n_df = deg.agg(F.count("*").alias("n"))
    k = F.ceil(F.col("n") / 100).cast("int")
    top = (
        ranked.crossJoin(n_df)
        .where(F.col("rk") <= k)
        .select("v")
    )
    m_df = e.agg(F.count("*").alias("m"))
    hub_arcs = (
        e.join(top.withColumnRenamed("v", "src"), "src", "left_semi")
        .unionByName(
            e.join(top.withColumnRenamed("v", "dst"), "dst", "left_semi")
            .select("src", "dst")
        )
        .distinct()
        .agg(F.count("*").alias("ha"))
    )
    return (
        n_df.crossJoin(m_df)
        .crossJoin(hub_arcs)
        .select(
            F.col("n").cast("long").alias("n_nodes"),
            F.ceil(F.col("n") / 100).cast("long").alias("k_top"),
            F.col("m").cast("long").alias("arcs"),
            F.col("ha").cast("long").alias("hub_arcs"),
            (
                F.expr("(2 * ha * 1000000 + m) div (2 * m)").cast("double")
                / F.lit(1e6)
            ).alias("hub_share"),
        )
    )


def q_logreg_score(spark, sf_dir):
    """Quality-classifier stage: full-batch logistic regression (8 GD
    steps, lr=1) trained INSIDE the engine on rounded JVM-expression
    features (punct/stopword ratios, log-length; label = lang='en'),
    then scored as a pure projection. One 4-scalar aggregation per step,
    zero shuffles (functions/mlscore.py)."""
    from webgraph_spark.functions.mlscore import train_and_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return train_and_score(docs, lr=1.0, iters=8)


def q_tfidf_pairs(spark, sf_dir):
    """Exact TF-IDF cosine similarity pairs >= 0.85 via inverted-index
    self-join; idf=0 terms dropped pre-join (exact no-op that removes
    the hottest join keys) — functions/retrieval.py."""
    from webgraph_spark.functions.retrieval import tfidf_pair_similarity

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tfidf_pair_similarity(docs, min_sim=0.85)


def q_sage_features(spark, sf_dir):
    """One GraphSAGE-mean message-passing layer: graph nodes map onto
    the embedding table via node % 500; each node's output is the
    elementwise mean of its in-neighbors' vectors (identity fallback
    for message-less nodes). Exploded to (node, pos, val) for
    deterministic cross-engine hashing (algos/features.py)."""
    from webgraph_spark.algos.features import neighborhood_mean_features

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vec = emb.count()
    e = (
        _edges(spark, sf_dir)
        .select(
            (F.col("src") % n_vec).alias("src"),
            (F.col("dst") % n_vec).alias("dst"),
        )
        .distinct()
    )
    out = neighborhood_mean_features(
        e, emb, hops=1, id_col="vec_id", vec_col="embedding",
        direction="in", round_to=6,
    )
    return out.select("node", F.posexplode("vec").alias("pos", "val")).select(
        "node", F.col("pos").cast("long").alias("pos"), "val"
    )


def q_value_quantiles(spark, sf_dir):
    """Histogram-sketch quantiles of events.value (256 fixed-width bins,
    ONE sketch-sized aggregation; error bound = bin width) — the third
    member of the sketch family after HLL and Count-Min."""
    from webgraph_spark.functions.sketches import histogram_quantiles

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return histogram_quantiles(
        ev, "value", [0.1, 0.25, 0.5, 0.75, 0.9, 0.99], bins=256
    )


def q_decay_pagerank(spark, sf_dir):
    """Temporal graph analytics: user -> event-type arcs weighted by
    INTEGER half-life decay (1000 >> weeks-of-age — exact in both
    engines, no libm pow), then weighted PageRank (5 iters). The
    recency-biased engagement rank over a continuously-growing event
    log."""
    from webgraph_spark.algos.pagerank import pagerank_weighted
    from webgraph_spark.functions.hashing import md5_long

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    max_d = ev.agg(F.max(F.to_date("ts"))).collect()[0][0]
    weeks = F.least(
        F.floor(F.datediff(F.lit(max_d), F.to_date("ts")) / 7).cast("int"),
        F.lit(10),
    )
    w = F.floor(F.lit(1000) / F.expr("shiftleft(cast(1 as bigint), _weeks)"))
    arcs = (
        ev.withColumn("_weeks", weeks)
        .select(
            F.col("user_id").alias("src"),
            (F.lit(10**9) + md5_long(F.col("event_type")) % F.lit(10**6)).alias(
                "dst"
            ),
            w.alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").cast("long").alias("label"))
    )
    res = pagerank_weighted(arcs, fixed_iterations=5, num_partitions=16)
    return res.ranks.select("node", F.round("rank", 9).alias("rank"))


def q_powerlaw_alpha(spark, sf_dir):
    """Newman MLE power-law exponent of the out-degree distribution:
    alpha = 1 + n / sum(ln(d / (dmin - 0.5))), dmin = 1 — the
    distribution-analysis companion to the reference's Stats sink."""
    e = _edges(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    return deg.agg(
        F.count("*").cast("long").alias("n_tail"),
        F.round(
            F.lit(1.0) + F.count("*") / F.sum(F.log(F.col("d") / F.lit(0.5))),
            6,
        ).alias("alpha"),
    )


def q_ck_curve(spark, sf_dir):
    """Degree-dependent clustering C(k) (Ravasz-Barabasi hierarchy
    probe): per-degree-class average local clustering, computed as
    2 * sum(triangles at degree k) / (k (k-1) n_k) so the numerator and
    denominator are EXACT integers and the only float op is one double
    multiply-divide chain, identical on both engines. A falling C(k)
    power law is the standard hierarchical-modularity signature in web
    and social graphs (the reference's Stats-sink users plot exactly
    this). One wedge-join triangle count + two small groupBys — the
    rollup adds no shuffle beyond graph_clustering_coeff's plan."""
    from webgraph_spark.algos.triangles import triangles_per_node
    from webgraph_spark.operators.transforms import simplify

    e = _edges(spark, sf_dir)
    tri = triangles_per_node(e)
    deg = (
        simplify(e).groupBy("src").agg(F.count("*").alias("deg"))
        .select(F.col("src").alias("node"), "deg")
    )
    per_node = deg.join(tri, "node", "left").select(
        "deg", F.coalesce("triangles", F.lit(0)).cast("long").alias("t")
    )
    return per_node.groupBy("deg").agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum("t").cast("long").alias("sum_triangles"),
        F.round(
            F.when(
                F.col("deg") >= 2,
                F.lit(2.0)
                * F.sum("t")
                / (F.col("deg") * (F.col("deg") - 1) * F.count("*")),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("ck"),
    ).select(F.col("deg").cast("long").alias("deg"), "n_nodes",
             "sum_triangles", "ck")


def _ck_curve_sql() -> str:
    """Twin of q_ck_curve: the graph_clustering_coeff oracle body
    rolled up by degree with integer-exact triangle sums."""
    return f"""SELECT CAST(deg AS BIGINT) AS deg,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(triangles) AS BIGINT) AS sum_triangles,
       ROUND(CASE WHEN deg >= 2
             THEN 2.0 * SUM(triangles) / (deg * (deg - 1) * COUNT(*))
             ELSE 0.0 END, 6) AS ck
FROM ({_clustering_sql()}) per_node
GROUP BY deg"""


BURSTINESS_MIN_GAPS = 3


def q_events_burstiness(spark, sf_dir):
    """Per-user inter-event burstiness B = (sigma - mu) / (sigma + mu)
    (Goh-Barabasi 2008) over microsecond inter-arrival gaps in the
    stable (ts, event_id) order — the bot/automation detector a
    continuous-ingest deployment runs next to the anomaly z-scores:
    B -> -1 is a metronome (scripted traffic), B ~ 0 Poisson,
    B -> +1 bursty human sessions. Gap moments are EXACT
    DECIMAL(38,0) sums (gap^2 overflows int64), so both engines feed
    identical integers into one sqrt and one division. One window +
    one groupBy — two shuffles on user_id, scale-safe."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id",
            F.timestamp_diff(
                "MICROSECOND", F.lag("ts").over(w), F.col("ts")
            ).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    dec = F.col("gap_us").cast("decimal(38,0)")
    st = gaps.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("gap_us").alias("s1"),
        F.sum(dec * dec).alias("s2"),
    ).filter(F.col("n") >= BURSTINESS_MIN_GAPS)
    mu = F.col("s1").cast("double") / F.col("n")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n")
    ) / F.col("n")
    sig = F.sqrt(var)
    return st.select(
        "user_id",
        F.col("n").cast("long").alias("n_gaps"),
        F.col("s1").cast("long").alias("sum_gap_us"),
        F.round(
            F.when(sig + mu > 0, (sig - mu) / (sig + mu)).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("burstiness"),
    )


def _events_burstiness_sql() -> str:
    return f"""WITH g AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events),
st AS (
  SELECT user_id, COUNT(*) AS n, SUM(gap_us) AS s1,
         SUM(CAST(gap_us AS HUGEINT) * gap_us) AS s2
  FROM g WHERE gap_us IS NOT NULL
  GROUP BY user_id HAVING COUNT(*) >= {BURSTINESS_MIN_GAPS})
SELECT user_id, CAST(n AS BIGINT) AS n_gaps, CAST(s1 AS BIGINT) AS sum_gap_us,
  ROUND(CASE WHEN sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n)
                  + CAST(s1 AS DOUBLE) / n > 0
        THEN (sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n)
              - CAST(s1 AS DOUBLE) / n)
           / (sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n)
              + CAST(s1 AS DOUBLE) / n)
        ELSE 0.0 END, 6) AS burstiness
FROM st"""


def q_role_diversity(spark, sf_dir):
    """Per-role next-role routing diversity on the transcript payload:
    Gini-Simpson index 1 - sum_j (c_j / t)^2 of each role's outgoing
    transition distribution over the stable turn chain — the collision
    complement, 0 = deterministic routing, (J-1)/J = uniform over J
    successors. Chosen over Shannon entropy deliberately: the index is
    a rational function of exact integer counts (numerator t^2 -
    sum c^2 is an exact int64), so both engines perform ONE double
    division with identical operands — no transcendental-libm hazard.
    Same lag-window plan as transcript_role_bigrams plus one tiny
    groupBy."""
    from pyspark.sql import Window

    tr = _transcripts_view(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    bi = (
        tr.select(
            F.col("role").alias("src"),
            F.lead("role").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return bi.groupBy("src").agg(
        F.count("*").cast("long").alias("n_next_roles"),
        F.sum("c").cast("long").alias("n_out"),
        F.round(
            (
                F.sum("c") * F.sum("c") - F.sum(F.col("c") * F.col("c"))
            ).cast("double")
            / (F.sum("c") * F.sum("c")),
            9,
        ).alias("simpson_diversity"),
    ).select(F.col("src").alias("role"), "n_next_roles", "n_out",
             "simpson_diversity")


def _role_diversity_sql() -> str:
    return f"""WITH {td.TRANSCRIPT_TR_CTE},
bi AS (
  SELECT src, dst, COUNT(*) AS c FROM (
    SELECT role AS src,
           LEAD(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS dst
    FROM tr) t
  WHERE dst IS NOT NULL GROUP BY src, dst)
SELECT src AS role, CAST(COUNT(*) AS BIGINT) AS n_next_roles,
       CAST(SUM(c) AS BIGINT) AS n_out,
       ROUND(CAST(SUM(c) * SUM(c) - SUM(c * c) AS DOUBLE)
             / (SUM(c) * SUM(c)), 9) AS simpson_diversity
FROM bi GROUP BY src"""


ZIPF_TOP = 200


def q_zipf_slope(spark, sf_dir):
    """Zipf exponent of the corpus token-frequency distribution: OLS
    slope of ln(count) on ln(rank) over the top-200 tokens (rank by
    count desc, token asc — a total order, so both engines pick the
    identical head). Natural corpora sit near slope -1 (Zipf 1949);
    template/synthetic text flattens the head — a cheap corpus-health
    dial next to docs_repetition. Per-row ln values are quantized to
    12 decimals and the four regression moments are DECIMAL(38,12)
    sums (order-free exact, the anisotropy discipline), so the final
    slope/intercept are single IEEE divisions of identical operands.
    Scale: one token groupBy + a 200-row tail — nothing else."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    toks = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    w = Window.orderBy(F.col("c").desc(), F.col("tok").asc())
    top = counts.withColumn("r", F.row_number().over(w)).where(
        F.col("r") <= ZIPF_TOP
    )
    x = F.round(F.log(F.col("r").cast("double")), 12)
    y = F.round(F.log(F.col("c").cast("double")), 12)
    dec = lambda col: F.round(col, 12).cast("decimal(38,12)")
    m = top.agg(
        F.count("*").alias("n"),
        F.sum(x.cast("decimal(38,12)")).alias("sx"),
        F.sum(y.cast("decimal(38,12)")).alias("sy"),
        F.sum(dec(x * y)).alias("sxy"),
        F.sum(dec(x * x)).alias("sx2"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sx2 = F.col("sx2").cast("double")
    slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    return m.select(
        F.col("n").cast("long").alias("n_tokens_ranked"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


def _zipf_slope_sql() -> str:
    return f"""WITH toks AS (
  SELECT unnest({_TOKS}) AS tok FROM documents),
counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
top AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC) AS r
  FROM counts QUALIFY r <= {ZIPF_TOP}),
m AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(ROUND(ln(CAST(r AS DOUBLE)), 12) AS DECIMAL(38,12))) AS sx,
         SUM(CAST(ROUND(ln(CAST(c AS DOUBLE)), 12) AS DECIMAL(38,12))) AS sy,
         SUM(CAST(ROUND(ROUND(ln(CAST(r AS DOUBLE)), 12)
                        * ROUND(ln(CAST(c AS DOUBLE)), 12), 12)
             AS DECIMAL(38,12))) AS sxy,
         SUM(CAST(ROUND(ROUND(ln(CAST(r AS DOUBLE)), 12)
                        * ROUND(ln(CAST(r AS DOUBLE)), 12), 12)
             AS DECIMAL(38,12))) AS sx2
  FROM top)
SELECT CAST(n AS BIGINT) AS n_tokens_ranked,
  ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (n * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
        6) AS zipf_slope,
  ROUND((CAST(sy AS DOUBLE)
         - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (n * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           * CAST(sx AS DOUBLE)) / n, 6) AS intercept
FROM m"""


SIMHASH_BAND_BITS = 8
SIMHASH_MAX_HAM = 1


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup candidate pairs (Manku-Jain-Das Sarma WWW'07,
    the web-crawl dedup complement to MinHash-LSH): documents whose
    16-bit SimHash agrees on one of two 8-bit bands (pigeonhole: any
    pair within Hamming distance 1 MUST share a band) and whose full
    Hamming distance is <= 1 — at 16 bits this keeps only
    characteristically-near signatures (the paper's 64-bit/ham-3
    operating point scaled to the portable 16-bit variant). Banding
    keys the join — never all-pairs; the Hamming check is one
    XOR+popcount. Returns (id_a, id_b, hamming)."""
    from webgraph_spark.functions.dedup import simhash16

    sh = simhash16(_docs(spark, sf_dir), "doc_id", "text")
    bands = sh.select(
        F.col("id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * SIMHASH_BAND_BITS)
                        .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
                        .alias("key"),
                    )
                    for b in range(16 // SIMHASH_BAND_BITS)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key"))
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    ham = F.bit_count(
        F.col("ha").bitwiseXOR(F.col("hb"))
    )
    return cand.select(
        "id_a", "id_b", ham.cast("int").alias("hamming")
    ).where(F.col("hamming") <= SIMHASH_MAX_HAM)


def _simhash_pairs_sql() -> str:
    nb = 16 // SIMHASH_BAND_BITS
    mask = (1 << SIMHASH_BAND_BITS) - 1
    return f"""WITH shs AS MATERIALIZED ({_simhash_sql()}),
sbands AS MATERIALIZED (
  SELECT id, simhash, b.b AS band, (simhash >> (b.b * {SIMHASH_BAND_BITS})) & {mask} AS key
  FROM shs CROSS JOIN (SELECT unnest(range(0, {nb})) AS b) b),
scand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         a.simhash AS ha, b.simhash AS hb
  FROM sbands a JOIN sbands b
    ON a.band = b.band AND a.key = b.key AND a.id < b.id)
SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM scand WHERE bit_count(xor(ha, hb)) <= {SIMHASH_MAX_HAM}"""


def q_two_hop_hist(spark, sf_dir):
    """Exact 2-hop out-reach distribution: for every node, the number
    of distinct nodes reachable in <= 2 directed steps (excluding the
    node itself), histogrammed — the first neighbourhood-function
    point past the degree distribution, and the per-node exact twin
    of what HyperBall estimates at t=2. One self-join on the distinct
    arc set + a distinct count (work bounded by the wedge count, the
    triangle-plan budget) + two tiny groupBys."""
    arcs = (
        _edges(spark, sf_dir)
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    two = arcs.select(F.col("src").alias("u"), F.col("dst").alias("m")).join(
        arcs.select(F.col("src").alias("m"), F.col("dst").alias("w")), "m"
    ).select("u", F.col("w").alias("v"))
    reach = (
        arcs.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionAll(two)
        .where(F.col("u") != F.col("v"))
        .distinct()
        .groupBy("u")
        .agg(F.count("*").alias("r2"))
    )
    out = reach.groupBy("r2").agg(
        F.count("*").cast("long").alias("n_nodes")
    ).select(F.col("r2").cast("long").alias("reach2"), "n_nodes")
    arcs.unpersist()
    return out


def _two_hop_hist_sql() -> str:
    return f"""WITH {td.EDGES_CTE},
tarcs2 AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
reach AS (
  SELECT u, COUNT(*) AS r2 FROM (
    SELECT src AS u, dst AS v FROM tarcs2
    UNION
    SELECT a.src AS u, b.dst AS v
    FROM tarcs2 a JOIN tarcs2 b ON a.dst = b.src
    WHERE a.src <> b.dst) t
  GROUP BY u)
SELECT CAST(r2 AS BIGINT) AS reach2, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM reach GROUP BY r2"""


def q_algebraic_connectivity(spark, sf_dir):
    """Algebraic connectivity estimate (Fiedler 1973): the Rayleigh
    quotient of the deflated power-iteration Fiedler vector on the
    Laplacian, lambda2 ~ [1/2 sum over sym arcs (x_u - x_v)^2] /
    sum x_u^2 — an upper bound on lambda2 that tightens as the
    iteration converges; the single number that says how hard the
    graph is to cut. Determinism: x is graph_fiedler's ROUND-6 output
    (already oracle-identical), per-arc and per-node terms are
    quantized to 12 decimals and DECIMAL-summed (order-free), leaving
    one division. One co-partitioned arc join + two aggregates on top
    of the oracled fiedler run."""
    from webgraph_spark.algos.spectral import fiedler_bisection
    from webgraph_spark.operators.transforms import simplify

    e = _edges(spark, sf_dir)
    x = fiedler_bisection(e, iters=12, num_partitions=16)
    sym = simplify(e.select("src", "dst"))
    j = (
        sym.join(x.select(F.col("node").alias("src"),
                          F.col("score").alias("xu")), "src")
        .join(x.select(F.col("node").alias("dst"),
                       F.col("score").alias("xv")), "dst")
    )
    dec = lambda c: F.round(c, 12).cast("decimal(38,12)")
    num = j.agg(
        F.sum(dec((F.col("xu") - F.col("xv")) * (F.col("xu") - F.col("xv"))))
        .alias("s")
    )
    den = x.agg(
        F.count("*").alias("n"),
        F.sum(dec(F.col("score") * F.col("score"))).alias("d"),
    )
    return num.crossJoin(den).select(
        F.col("n").cast("long").alias("n_nodes"),
        F.round(
            F.col("s").cast("double")
            / (F.lit(2.0) * F.col("d").cast("double")),
            9,
        ).alias("lambda2_rayleigh"),
    )


def _algebraic_connectivity_sql() -> str:
    inner = td.fiedler_sql(iters=12, round_to=6)
    return f"""WITH fx AS MATERIALIZED (
{inner}
),
{td.EDGES_CTE},
acsym AS (
  SELECT src, dst FROM edges WHERE src <> dst
  UNION
  SELECT dst, src FROM edges WHERE src <> dst),
num AS (
  SELECT SUM(CAST(ROUND((a.score - b.score) * (a.score - b.score), 12)
             AS DECIMAL(38,12))) AS s
  FROM acsym e JOIN fx a ON e.src = a.node JOIN fx b ON e.dst = b.node),
den AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(ROUND(score * score, 12) AS DECIMAL(38,12))) AS d
  FROM fx)
SELECT CAST(den.n AS BIGINT) AS n_nodes,
       ROUND(CAST(num.s AS DOUBLE) / (2.0 * CAST(den.d AS DOUBLE)), 9)
         AS lambda2_rayleigh
FROM num CROSS JOIN den"""


def q_onion_layers(spark, sf_dir):
    """Onion decomposition (algos/kcore.py:onion_layers): the k-core
    peel refined by removal pass — (node, layer, coreness); the layer
    spectrum separates tree-like from loopy cores. The coreness
    column cross-checks graph_coreness's independent h-index oracle."""
    from webgraph_spark.algos.kcore import onion_layers

    return onion_layers(_edges(spark, sf_dir), max_rounds=60)


def _onion_sql() -> str:
    from webgraph_spark.algos.kcore import onion_rounds_sql

    return (
        f"WITH {td.EDGES_CTE},{td.SYM_CTE},"
        + onion_rounds_sql(60)
        + "\nSELECT node, layer, coreness FROM onion_final"
    )


def q_weighted_clustering(spark, sf_dir):
    """Barrat weighted clustering coefficient (Barrat-Barthelemy-
    Pastor-Satorras-Vespignani PNAS 2004): per node,
    c_w(i) = [sum over triangles at i of (w_ij + w_ih)] /
    (2 * s_i * (k_i - 1)) with integer arc-multiplicity weights —
    whether a node's triangles carry its heavy edges (c_w > c) or its
    weak ones. The numerator, strength s_i, and degree k_i are EXACT
    integers (weights are arc multiplicities; symmetrized weight =
    fwd + rev); one double division per node. Plan: the same
    degree-oriented wedge join as triangles_per_node, carrying the
    three pair weights and unioned back to all three corners."""
    led = td.tpch_edges_labelled(spark, sf_dir)
    x = F.least("src", "dst")
    y = F.greatest("src", "dst")
    und = (
        led.where(F.col("src") != F.col("dst"))
        .select(x.alias("x"), y.alias("y"), F.col("label").alias("w"))
        .groupBy("x", "y")
        .agg(F.sum("w").alias("w"))
        .persist()
    )
    cns = und.select(
        F.col("x").alias("node"), F.col("w")
    ).unionAll(und.select(F.col("y").alias("node"), "w"))
    ks = cns.groupBy("node").agg(
        F.count("*").alias("k"), F.sum("w").alias("s")
    )
    deg = ks.select("node", "k")
    e = (
        und.join(deg.select(F.col("node").alias("x"), F.col("k").alias("kx")), "x")
        .join(deg.select(F.col("node").alias("y"), F.col("k").alias("ky")), "y")
    )
    lo_first = (F.col("kx") < F.col("ky")) | (
        (F.col("kx") == F.col("ky")) & (F.col("x") < F.col("y"))
    )
    ot = e.select(
        F.when(lo_first, F.col("x")).otherwise(F.col("y")).alias("a"),
        F.when(lo_first, F.col("y")).otherwise(F.col("x")).alias("b"),
        "w",
    )
    tri = (
        ot.select(F.col("a").alias("u"), F.col("b").alias("v"),
                  F.col("w").alias("w1"))
        .join(
            ot.select(F.col("a").alias("v"), F.col("b").alias("t"),
                      F.col("w").alias("w2")),
            "v",
        )
        .join(
            ot.select(F.col("a").alias("u"), F.col("b").alias("t"),
                      F.col("w").alias("w3")),
            ["u", "t"],
        )
    )
    corners = (
        tri.select(F.col("u").alias("node"),
                   (F.col("w1") + F.col("w3")).alias("c"))
        .unionAll(tri.select(F.col("v").alias("node"),
                             (F.col("w1") + F.col("w2")).alias("c")))
        .unionAll(tri.select(F.col("t").alias("node"),
                             (F.col("w2") + F.col("w3")).alias("c")))
        .groupBy("node")
        .agg(F.sum("c").alias("num"))
    )
    out = ks.join(corners, "node", "left").select(
        "node",
        F.col("k").cast("long").alias("k"),
        F.col("s").cast("long").alias("strength"),
        F.round(
            F.when(
                F.col("k") >= 2,
                F.coalesce("num", F.lit(0)).cast("double")
                / (F.lit(2) * F.col("s") * (F.col("k") - 1)),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("wclustering"),
    )
    und.unpersist()
    return out


def _weighted_clustering_sql() -> str:
    return f"""WITH {td.LABELLED_EDGES_CTE},
wund AS MATERIALIZED (
  SELECT LEAST(src, dst) AS x, GREATEST(src, dst) AS y, SUM(label) AS w
  FROM ledges WHERE src <> dst GROUP BY 1, 2),
wcns AS (
  SELECT x AS node, w FROM wund UNION ALL SELECT y, w FROM wund),
wks AS MATERIALIZED (
  SELECT node, COUNT(*) AS k, SUM(w) AS s FROM wcns GROUP BY node),
wot AS MATERIALIZED (
  SELECT CASE WHEN a.k < b.k OR (a.k = b.k AND u.x < u.y)
              THEN u.x ELSE u.y END AS oa,
         CASE WHEN a.k < b.k OR (a.k = b.k AND u.x < u.y)
              THEN u.y ELSE u.x END AS ob,
         u.w
  FROM wund u JOIN wks a ON u.x = a.node JOIN wks b ON u.y = b.node),
wtri AS (
  SELECT e1.oa AS u, e1.ob AS v, e2.ob AS t,
         e1.w AS w1, e2.w AS w2, e3.w AS w3
  FROM wot e1 JOIN wot e2 ON e1.ob = e2.oa
  JOIN wot e3 ON e3.oa = e1.oa AND e3.ob = e2.ob),
wcorn AS (
  SELECT node, SUM(c) AS num FROM (
    SELECT u AS node, w1 + w3 AS c FROM wtri
    UNION ALL SELECT v, w1 + w2 FROM wtri
    UNION ALL SELECT t, w2 + w3 FROM wtri) z
  GROUP BY node)
SELECT k.node, CAST(k.k AS BIGINT) AS k, CAST(k.s AS BIGINT) AS strength,
  ROUND(CASE WHEN k.k >= 2
        THEN CAST(COALESCE(c.num, 0) AS DOUBLE) / (2 * k.s * (k.k - 1))
        ELSE 0.0 END, 6) AS wclustering
FROM wks k LEFT JOIN wcorn c ON k.node = c.node"""


def q_conversion_lag_quantiles(spark, sf_dir):
    """Quantiles of the view -> click -> purchase completion lag (per
    completing user, microseconds from the first view): the
    time-to-convert distribution product analytics reads next to the
    funnel's completion counts. Per-user lags are the events_funnel3
    chain (strictly-after min-aggregations, integer-exact); the
    quantiles ride the 256-bin histogram sketch
    (functions/sketches.py:histogram_quantiles) with its deterministic
    integer-rank interpolation."""
    from webgraph_spark.functions.sketches import histogram_quantiles

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = (
        ev.where(F.col("event_type") == "view")
        .groupBy(F.col("user_id").alias("u"))
        .agg(F.min(us).alias("t1"))
        .select("u", "t1", F.col("t1").alias("tk"))
    )
    for step in ("click", "purchase"):
        nxt = (
            ev.where(F.col("event_type") == step)
            .select(F.col("user_id").alias("u"), us.alias("t"))
            .join(prev, "u")
            .where(F.col("t") > F.col("tk"))
            .groupBy("u")
            .agg(F.min("t1").alias("t1"), F.min("t").alias("tk"))
        )
        prev = nxt
    lags = prev.select((F.col("tk") - F.col("t1")).alias("lag_us"))
    return histogram_quantiles(
        lags, "lag_us", [0.1, 0.25, 0.5, 0.75, 0.9], bins=256
    )


def _conversion_lag_quantiles_sql() -> str:
    from webgraph_spark.functions import sketches as _sk

    lag_rel = """(
  WITH p1 AS (
    SELECT user_id AS u, MIN(epoch_us(ts)) AS t1, MIN(epoch_us(ts)) AS tk
    FROM events WHERE event_type = 'view' GROUP BY user_id),
  p2 AS (
    SELECT e.user_id AS u, MIN(p.t1) AS t1, MIN(epoch_us(e.ts)) AS tk
    FROM events e JOIN p1 p ON e.user_id = p.u
    WHERE e.event_type = 'click' AND epoch_us(e.ts) > p.tk
    GROUP BY e.user_id),
  p3 AS (
    SELECT e.user_id AS u, MIN(p.t1) AS t1, MIN(epoch_us(e.ts)) AS tk
    FROM events e JOIN p2 p ON e.user_id = p.u
    WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > p.tk
    GROUP BY e.user_id)
  SELECT tk - t1 AS lag_us FROM p3) lags"""
    return _sk.histogram_quantiles_sql(
        lag_rel, "lag_us", [0.1, 0.25, 0.5, 0.75, 0.9], bins=256
    )


def q_rw_sample(spark, sf_dir):
    """Random-walk-induced subgraph sample (Leskovec-Faloutsos KDD'06
    — RW sampling preserves degree/clustering shape better than node
    sampling): 2 deterministic md5 walks of length 6 from the 20
    smallest customer sources; the sample is the visited node set and
    its induced arc count plus coverage fraction — the scale-down
    constructor for benchmark subgraphs, replayable bit-for-bit on
    any engine/parallelism. Walk state is frontier-sized; induction
    is two semi-joins."""
    from webgraph_spark.algos.walks import random_walks

    e = _edges(spark, sf_dir)
    srcs = (
        e.where(F.col("src") < td.OFF_ORDER)
        .select(F.col("src").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(20)
    )
    walks = random_walks(e, srcs, length=6, n_walks=2)
    visited = walks.select("node").distinct()
    n_vis = visited.count()
    ind = (
        e.join(visited.select(F.col("node").alias("src")), "src")
        .join(visited.select(F.col("node").alias("dst")), "dst")
    )
    n_nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .count()
    )
    return ind.agg(F.count("*").alias("c")).select(
        F.lit(n_vis).cast("long").alias("n_sampled_nodes"),
        F.col("c").cast("long").alias("n_induced_arcs"),
        F.round(F.lit(n_vis) / F.lit(float(n_nodes)), 6).alias(
            "node_fraction"
        ),
    )


def _rw_sample_sql() -> str:
    from webgraph_spark.algos.walks import random_walks_sql

    inner = (
        f"""WITH {td.EDGES_CTE},
wsrc AS (SELECT o_custkey AS node FROM orders GROUP BY o_custkey
         ORDER BY node LIMIT 20),"""
        + random_walks_sql(length=6, n_walks=2)
    )
    return f"""WITH aw AS MATERIALIZED (
{inner}
),
visited AS MATERIALIZED (SELECT DISTINCT node FROM aw),
{td.EDGES_CTE},
{td.NODES_CTE},
ind AS (
  SELECT COUNT(*) AS c FROM edges e
  JOIN visited a ON e.src = a.node
  JOIN visited b ON e.dst = b.node)
SELECT CAST((SELECT COUNT(*) FROM visited) AS BIGINT) AS n_sampled_nodes,
       CAST((SELECT c FROM ind) AS BIGINT) AS n_induced_arcs,
       ROUND((SELECT COUNT(*) FROM visited)
             / CAST((SELECT COUNT(*) FROM nodes) AS DOUBLE), 6)
         AS node_fraction"""


def q_sq8_error(spark, sf_dir):
    """SQ8 reconstruction-error report: corpus MSE and max absolute
    per-component error of the 8-bit scalar quantizer — the
    quantization QA that belongs next to emb_sq8_recall5 (recall says
    retrieval survives; this says HOW MUCH geometry was spent).
    Per-row squared-error sums are the deterministic left-to-right
    array fold, quantized to 12 decimals and DECIMAL-summed
    (order-free); the max is order-free by nature. One scan, zero
    joins (stats are driver literals, the sq8 contract)."""
    from webgraph_spark.functions.similarity import (
        sq8_codes,
        sq8_dequantize,
        sq8_stats,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mins, scales = sq8_stats(emb)
    x = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    dq = sq8_dequantize(sq8_codes(x, mins, scales), mins, scales)
    err2 = F.aggregate(
        F.zip_with(x, dq, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    maxabs = F.array_max(
        F.zip_with(x, dq, lambda a, b: F.round(F.abs(a - b), 9))
    )
    base = emb.select(
        F.round(err2, 12).cast("decimal(38,12)").alias("e2"),
        maxabs.alias("ma"),
        F.size("embedding").alias("d"),
    )
    return base.agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.round(
            F.sum("e2").cast("double") / F.sum("d"), 9
        ).alias("mse"),
        F.max("ma").alias("max_abs_err"),
    )


def _sq8_error_sql() -> str:
    return """WITH lf AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
mm AS MATERIALIZED (
  SELECT d, MIN(x) AS mn, (MAX(x) - MIN(x)) / 255.0 AS sc
  FROM lf GROUP BY d
),
dq AS MATERIALIZED (
  SELECT vec_id, lf.d, x,
         (CASE WHEN sc > 0 THEN LEAST(255.0, GREATEST(0.0,
              FLOOR((x - mn) / sc + 0.5))) ELSE 0.0 END) * sc + mn AS v
  FROM lf JOIN mm USING (d)
),
vecs AS MATERIALIZED (
  SELECT vec_id, list(x ORDER BY d) AS xs, list(v ORDER BY d) AS vs,
         COUNT(*) AS dim
  FROM dq GROUP BY vec_id
),
rows_ AS (
  SELECT CAST(ROUND(list_reduce(
           list_transform(range(1, len(xs) + 1),
                          i -> (xs[i] - vs[i]) * (xs[i] - vs[i])),
           (a, b) -> a + b), 12) AS DECIMAL(38,12)) AS e2,
         list_max(list_transform(range(1, len(xs) + 1),
                                 i -> ROUND(abs(xs[i] - vs[i]), 9))) AS ma,
         dim
  FROM vecs)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       ROUND(CAST(SUM(e2) AS DOUBLE) / SUM(dim), 9) AS mse,
       MAX(ma) AS max_abs_err
FROM rows_"""


def q_hourly_autocorr(spark, sf_dir):
    """Diurnal-seasonality strength: Pearson autocorrelation of the
    hourly event-count series at lag 24h (count at hour h vs h+24,
    over hours where both exist). Counts are exact ints from one
    date_trunc groupBy; the lag join is an integer epoch-hour
    self-join; all five moments exact int64 — one sqrt-divide at the
    end. The scalar that says HOW periodic the traffic is (the
    seasonality profile shows WHERE)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hours = ev.groupBy(
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(3600000000)
        ).alias("h")
    ).agg(F.count("*").alias("n"))
    j = hours.alias("a").join(
        hours.alias("b"), F.col("a.h") + 24 == F.col("b.h")
    ).select(F.col("a.n").alias("x"), F.col("b.n").alias("y"))
    m = j.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
        F.sum(F.col("y") * F.col("y")).alias("sy2"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    return m.select(
        F.col("n").cast("long").alias("n_hour_pairs"),
        F.round(
            (n * F.col("sxy").cast("double") - sx * sy)
            / (
                F.sqrt(n * F.col("sx2").cast("double") - sx * sx)
                * F.sqrt(n * F.col("sy2").cast("double") - sy * sy)
            ),
            6,
        ).alias("autocorr_24h"),
    )


def _hourly_autocorr_sql() -> str:
    return """WITH hours AS (
  SELECT epoch_us(ts) // 3600000000 AS h, COUNT(*) AS n
  FROM events GROUP BY 1),
j AS (
  SELECT a.n AS x, b.n AS y
  FROM hours a JOIN hours b ON a.h + 24 = b.h),
m AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sx2, SUM(y * y) AS sy2
  FROM j)
SELECT CAST(n AS BIGINT) AS n_hour_pairs,
  ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (sqrt(n * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           * sqrt(n * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
        6) AS autocorr_24h
FROM m"""


HEAPS_CHECKPOINTS = [100, 200, 300, 400, 500]


def q_heaps_points(spark, sf_dir):
    """Heaps-law vocabulary-growth points: (corpus prefix size,
    cumulative tokens, distinct vocabulary) at fixed doc-count
    checkpoints in doc_id order — the sublinear V(n) ~ K n^beta curve
    that distinguishes natural vocabulary growth from template text
    (whose vocabulary saturates). Exact distinct counts per prefix;
    len(checkpoints) small grouped-distinct passes."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    )
    outs = []
    for c in HEAPS_CHECKPOINTS:
        pre = toks.where(F.col("doc_id") < c)
        outs.append(
            pre.agg(
                F.count("*").alias("total_tokens"),
                F.countDistinct("tok").alias("vocab"),
            ).select(
                F.lit(c).cast("int").alias("n_docs"),
                F.col("total_tokens").cast("long").alias("total_tokens"),
                F.col("vocab").cast("long").alias("vocab"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def _heaps_points_sql() -> str:
    sels = []
    for c in HEAPS_CHECKPOINTS:
        sels.append(f"""
SELECT CAST({c} AS INT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS total_tokens,
       CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab
FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents) t
WHERE doc_id < {c}""")
    return " UNION ALL ".join(sels)


def q_len_latency_corr(spark, sf_dir):
    """Does conversation length predict reply speed? Pearson
    correlation between a conversation's turn count and its mean
    inter-turn gap (conversations with >= 2 turns). EVERYTHING before
    the final correlation is integer-exact: the mean gap is a
    floor-division integer (µs) and all five regression moments are
    exact int64/DECIMAL(38,0)/HUGEINT sums (y^2 ~ 1e24 overflows
    int64, so squares multiply as decimals), leaving two sqrt + one
    divide on identical operands. One window + two groupBys."""
    from pyspark.sql import Window

    tr = _transcripts_view(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    per = (
        tr.select(
            "conv_id",
            F.timestamp_diff(
                "MICROSECOND", F.lag("ts").over(w), F.col("ts")
            ).alias("g"),
        )
        .groupBy("conv_id")
        .agg(
            (F.count(F.lit(1))).alias("n_turns"),
            F.sum("g").alias("tot"),
        )
        .where(F.col("n_turns") >= 2)
        .select(
            F.col("n_turns").cast("long").alias("x"),
            # floor-division integer mean gap (µs) — exact both engines
            (
                (F.col("tot") - F.col("tot") % (F.col("n_turns") - 1))
                / (F.col("n_turns") - 1)
            ).cast("long").alias("y"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    m = per.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sx2"),
        F.sum(dec("y") * dec("y")).alias("sy2"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sx2 = F.col("sx2").cast("double")
    sy2 = F.col("sy2").cast("double")
    return m.select(
        F.col("n").cast("long").alias("n_convs"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sx2 - sx * sx) * F.sqrt(n * sy2 - sy * sy)),
            6,
        ).alias("len_latency_corr"),
    )


def _len_latency_corr_sql() -> str:
    return (
        "WITH "
        + td.TRANSCRIPT_TR_CTE
        + """,
per AS (
  SELECT CAST(n_turns AS BIGINT) AS x,
         CAST(tot // (n_turns - 1) AS BIGINT) AS y
  FROM (
    SELECT conv_id, COUNT(*) AS n_turns, SUM(g) AS tot FROM (
      SELECT conv_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY conv_id ORDER BY turn_idx) AS g
      FROM tr) gg
    GROUP BY conv_id) t
  WHERE n_turns >= 2),
m AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sx2,
         SUM(CAST(y AS HUGEINT) * y) AS sy2
  FROM per)
SELECT CAST(n AS BIGINT) AS n_convs,
  ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (sqrt(n * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           * sqrt(n * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
        6) AS len_latency_corr
FROM m"""
    )


def q_length_hist(spark, sf_dir):
    """Log2-bucketed document-length histogram (bucket =
    floor(log2(n_tokens + 1)), computed with INTEGER bit-length
    arithmetic — no libm): doc counts and exact token totals per
    octave — the standard corpus length profile (truncation/padding
    budget planning). One projection + one groupBy."""
    from webgraph_spark.functions.text import whitespace_token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_tok = whitespace_token_count(F.col("text"))
    # floor(log2(x)) via bit_length - 1 (x >= 1): bucket of n_tok+1
    bucket = (
        F.length(F.conv((n_tok + 1).cast("string"), 10, 2)) - 1
    ).alias("bucket")
    return docs.select(bucket, n_tok.alias("nt")).groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("total_tokens"),
    ).select(F.col("bucket").cast("int").alias("bucket"), "n_docs",
             "total_tokens")


def _length_hist_sql() -> str:
    n_tok = f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKS}) END"
    return f"""WITH t AS (SELECT {n_tok} AS nt FROM documents)
SELECT CAST(length(bin(nt + 1)) - 1 AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS total_tokens
FROM t GROUP BY 1"""


def q_core_sizes(spark, sf_dir):
    """k-core size curve: number of nodes with coreness >= k for every
    k (the cumulative shell profile read off every core-decomposition
    paper's figure 1) — histogram of the coreness table + one suffix
    sum over the tiny distinct-k axis (the rich-club plan shape)."""
    from pyspark.sql import Window

    from webgraph_spark.algos.kcore import coreness

    cor = coreness(_edges(spark, sf_dir))
    hist = cor.groupBy(F.col("c").alias("k")).agg(
        F.count("*").alias("n")
    )
    w = Window.orderBy(F.col("k").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return hist.select(
        F.col("k").cast("long").alias("k"),
        F.sum("n").over(w).cast("long").alias("core_size"),
    )


def _core_sizes_sql() -> str:
    return (
        f"WITH {td.EDGES_CTE},{td.SYM_CTE},"
        + _coreness_body_sql()
        + """
SELECT CAST(k AS BIGINT) AS k,
       CAST(SUM(n) OVER (ORDER BY k DESC ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS core_size
FROM (SELECT coreness AS k, COUNT(*) AS n FROM core_final GROUP BY 1)"""
    )


def _coreness_body_sql() -> str:
    from webgraph_spark.algos.kcore import coreness_rounds_sql

    return coreness_rounds_sql(10)


def q_strength_dist(spark, sf_dir):
    """Out-STRENGTH distribution over the labelled edge table
    (strength = sum of arc multiplicities per source; Barrat et al.
    2004's weighted-degree): strength s -> node count — the weighted
    companion of the degree-distribution Stats sink. Two groupBys,
    both map-side combinable."""
    ledges = td.tpch_edges_labelled(spark, sf_dir)
    st = ledges.groupBy("src").agg(F.sum("label").alias("strength"))
    return st.groupBy("strength").agg(
        F.count("*").cast("long").alias("n_nodes")
    ).select(F.col("strength").cast("long").alias("strength"), "n_nodes")


def _strength_dist_sql() -> str:
    return f"""WITH {td.LABELLED_EDGES_CTE}
SELECT CAST(strength AS BIGINT) AS strength,
       CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM (SELECT src, SUM(label) AS strength FROM ledges GROUP BY src)
GROUP BY strength"""


def q_label_tightness(spark, sf_dir):
    """Per-label embedding compactness: mean cosine of each vector to
    its OWN label centroid — the intra-class counterpart of
    emb_centroid_confusion's between-class recoverability (together
    they are the scatter decomposition a curation pipeline reads
    before trusting labels). Same rounded-centroid discipline as
    centroid_classify; per-label mean via quantize-12 + DECIMAL sum
    (order-free), one division."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.col("label").alias("lbl"),
        F.posexplode(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("pos", "x"),
    )
    cent = pts.groupBy("lbl", "pos").agg(
        F.round(F.avg("x"), 9).alias("m")
    )
    cnorm = cent.groupBy("lbl").agg(
        F.round(F.sum(F.col("m") * F.col("m")), 9).alias("cn2")
    )
    vnorm = pts.groupBy("id", "lbl").agg(
        F.round(F.sum(F.col("x") * F.col("x")), 9).alias("vn2")
    )
    dots = (
        pts.join(F.broadcast(cent), ["lbl", "pos"])
        .groupBy("id", "lbl")
        .agg(F.round(F.sum(F.col("x") * F.col("m")), 9).alias("dot"))
    )
    per_vec = (
        dots.join(F.broadcast(cnorm), "lbl")
        .join(vnorm, ["id", "lbl"])
        .select(
            "lbl",
            F.round(
                F.col("dot") / (F.sqrt("vn2") * F.sqrt("cn2")), 6
            ).alias("cos"),
        )
    )
    return per_vec.groupBy("lbl").agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.round(
            F.sum(F.round(F.col("cos"), 12).cast("decimal(38,12)"))
            .cast("double")
            / F.count("*"),
            6,
        ).alias("mean_cos_to_centroid"),
    ).select(F.col("lbl").cast("long").alias("label"), "n_vectors",
             "mean_cos_to_centroid")


def _label_tightness_sql() -> str:
    return """WITH pts AS MATERIALIZED (
  SELECT vec_id AS id, label AS lbl, d.i AS pos,
         CAST(embedding[d.i + 1] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS i) d),
cent AS MATERIALIZED (
  SELECT lbl, pos, ROUND(AVG(x), 9) AS m FROM pts GROUP BY lbl, pos),
cnorm AS (SELECT lbl, ROUND(SUM(m * m), 9) AS cn2 FROM cent GROUP BY lbl),
vnorm AS (SELECT id, lbl, ROUND(SUM(x * x), 9) AS vn2
          FROM pts GROUP BY id, lbl),
dots AS (
  SELECT p.id, p.lbl, ROUND(SUM(p.x * c.m), 9) AS dot
  FROM pts p JOIN cent c ON p.lbl = c.lbl AND p.pos = c.pos
  GROUP BY p.id, p.lbl),
per_vec AS (
  SELECT d.lbl,
         ROUND(d.dot / (sqrt(v.vn2) * sqrt(c.cn2)), 6) AS cos
  FROM dots d JOIN cnorm c ON d.lbl = c.lbl
  JOIN vnorm v ON d.id = v.id AND d.lbl = v.lbl)
SELECT CAST(lbl AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       ROUND(CAST(SUM(CAST(ROUND(cos, 12) AS DECIMAL(38,12))) AS DOUBLE)
             / COUNT(*), 6) AS mean_cos_to_centroid
FROM per_vec GROUP BY lbl"""


def q_cc_size_dist(spark, sf_dir):
    """Component-size distribution (size s -> number of components)
    of the degree-bounded subgraph (outdegree in [1, 8), the
    DegreeRangeImmutableSubgraph operator): removing the hubs
    fragments the giant component, so the histogram exposes the
    'dust' structure the full graph's single-component answer hides —
    the classic tail summary beside graph_bowtie. Converged hash-min
    CC over the subgraph + two tiny groupBys."""
    from webgraph_spark.operators.transforms import degree_range_subgraph

    sub, _ = degree_range_subgraph(_edges(spark, sf_dir), 1, 8, reindex=False)
    res = connected_components(
        sub.select("src", "dst"), max_iter=30, num_partitions=16
    )
    if not res.converged:
        raise RuntimeError("cc_size_dist: CC truncated; raise max_iter")
    sizes = res.labels.groupBy("component").agg(
        F.count("*").alias("size")
    )
    return sizes.groupBy("size").agg(
        F.count("*").cast("long").alias("n_components")
    ).select(F.col("size").cast("long").alias("size"), "n_components")


def _cc_size_dist_sql(rounds: int = 30) -> str:
    parts = [
        td.EDGES_CTE,
        td.NODES_CTE,
        """
outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM edges GROUP BY src)""",
        """
keep AS MATERIALIZED (
  SELECT n.node FROM nodes n LEFT JOIN outdeg o ON n.node = o.src
  WHERE COALESCE(o.d, 0) >= 1 AND COALESCE(o.d, 0) < 8)""",
        """
sub AS MATERIALIZED (
  SELECT e.src, e.dst FROM edges e
  JOIN keep a ON e.src = a.node JOIN keep b ON e.dst = b.node)""",
        """
snodes AS MATERIALIZED (
  SELECT src AS node FROM sub UNION SELECT dst FROM sub)""",
        """
ssym AS MATERIALIZED (
  SELECT src, dst FROM sub WHERE src <> dst
  UNION SELECT dst, src FROM sub WHERE src <> dst)""",
        """
sl0 AS MATERIALIZED (SELECT node, node AS component FROM snodes)""",
    ]
    for k in range(1, rounds + 1):
        prev = f"sl{k - 1}"
        parts.append(f"""
sm{k} AS MATERIALIZED (SELECT s.dst AS node, MIN(l.component) AS mn
  FROM ssym s JOIN {prev} l ON s.src = l.node GROUP BY s.dst)""")
        parts.append(f"""
sl{k} AS MATERIALIZED (SELECT l.node,
  LEAST(l.component, COALESCE(m.mn, l.component)) AS component
  FROM {prev} l LEFT JOIN sm{k} m ON l.node = m.node)""")
    return (
        "WITH " + ",".join(parts)
        + f"""
SELECT CAST(size AS BIGINT) AS size,
       CAST(COUNT(*) AS BIGINT) AS n_components
FROM (SELECT component, COUNT(*) AS size FROM sl{rounds}
      GROUP BY component)
GROUP BY size"""
    )


def q_source_overlap(spark, sf_dir):
    """Cross-source duplication matrix: verified near-dup pairs
    (>= 0.8 shingle Jaccard, the docs_dedup_clusters rule) rolled up
    by unordered source pair — which feeds duplicate each other, the
    provenance-level view a curation pipeline uses to deprioritize a
    mirrored source wholesale instead of fighting it document by
    document. Rides the bucketed LSH chain; the rollup adds one
    broadcast join to the doc->source map and one tiny groupBy."""
    from webgraph_spark.functions.dedup import ngram_jaccard

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = _docs(spark, sf_dir)
    pairs = minhash_lsh_candidates(
        d, "doc_id", "text", NUM_HASHES, BAND_ROWS, SHINGLE, HASH_SEED
    )
    ver = ngram_jaccard(d, pairs, "doc_id", "text", SHINGLE).where(
        F.col("jaccard") >= DEDUP_THRESHOLD
    )
    src = docs.select("doc_id", "source")
    j = (
        ver.join(
            src.select(F.col("doc_id").alias("id_a"),
                       F.col("source").alias("sa")),
            "id_a",
        )
        .join(
            src.select(F.col("doc_id").alias("id_b"),
                       F.col("source").alias("sb")),
            "id_b",
        )
    )
    return j.groupBy(
        F.least("sa", "sb").alias("source_a"),
        F.greatest("sa", "sb").alias("source_b"),
    ).agg(F.count("*").cast("long").alias("n_dup_pairs"))


def _source_overlap_sql() -> str:
    return f"""WITH {_PAIRS_CTE},
sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT s1.id AS id_a, s2.id AS id_b, COUNT(*) AS common
  FROM sh s1 JOIN sh s2 ON s1.shingle = s2.shingle AND s1.id < s2.id
  JOIN pairs p ON p.id_a = s1.id AND p.id_b = s2.id
  GROUP BY s1.id, s2.id),
ver AS (
  SELECT x.id_a, x.id_b
  FROM inter x
  JOIN sizes na ON na.id = x.id_a
  JOIN sizes nb ON nb.id = x.id_b
  WHERE ROUND(x.common / (na.n + nb.n - x.common), 6) >= {DEDUP_THRESHOLD})
SELECT LEAST(da.source, db.source) AS source_a,
       GREATEST(da.source, db.source) AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
FROM ver v
JOIN documents da ON da.doc_id = v.id_a
JOIN documents db ON db.doc_id = v.id_b
GROUP BY 1, 2"""


def q_events_type_markov(spark, sf_dir):
    """Stationary importance of event types: the per-user event-type
    transition multigraph (consecutive events in the stable (ts,
    event_id) order, self-transitions kept) fed to weight-proportional
    PageRank (8 fixed rounds) — 'where does user traffic settle', the
    events-stream twin of transcript_tool_markov riding the same
    pagerank_weighted kernel and wpagerank_sql oracle."""
    from pyspark.sql import Window

    from webgraph_spark.algos.pagerank import pagerank_weighted

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("label"))
    )
    res = pagerank_weighted(
        trans, weight_col="label", fixed_iterations=8, num_partitions=8
    )
    return res.ranks.select(
        F.col("node").alias("event_type"), F.round("rank", 9).alias("rank")
    )


def _events_type_markov_sql() -> str:
    ledges = """
ledges AS MATERIALIZED (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS label FROM (
    SELECT event_type AS src,
           LEAD(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS dst
    FROM events
  ) t WHERE dst IS NOT NULL GROUP BY src, dst
)"""
    inner = td.wpagerank_sql(iters=8, alpha=0.85, ledges_cte=ledges)
    return f"SELECT node AS event_type, rank FROM (\n{inner}\n) q"


def q_core_pagerank_share(spark, sf_dir):
    """Core-periphery mass profile: PageRank mass aggregated by
    coreness shell — the composition that answers 'does authority
    live in the dense core?' (core-periphery structure, Borgatti-
    Everett). Joins the 5-iteration PageRank vector against the full
    h-index core decomposition; per shell: node count and DECIMAL-
    exact sum of the round-9 ranks (quantized ranks are identical
    doubles on both engines, so the order-free decimal sum is too).
    Gates the COMPOSITION of two independently-oracled iterative
    operators in one plan."""
    from webgraph_spark.algos.kcore import coreness

    e = _edges(spark, sf_dir)
    pr = pagerank(e, fixed_iterations=5, num_partitions=16).ranks.select(
        "node", F.round("rank", 9).alias("rank")
    )
    cor = coreness(e).select("node", F.col("c").alias("coreness"))
    j = pr.join(cor, "node")
    return j.groupBy("coreness").agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.round(
            F.sum(F.col("rank").cast("decimal(38,12)")).cast("double"), 9
        ).alias("rank_mass"),
    ).select(
        F.col("coreness").cast("long").alias("coreness"),
        "n_nodes",
        "rank_mass",
    )


def _core_pagerank_share_sql() -> str:
    import re

    from webgraph_spark.algos.kcore import coreness_rounds_sql

    # the coreness chain and the pagerank body both use c{t} CTE
    # names; namespace the coreness ones (kc{t}) for the composition
    core = re.sub(r"\bc(\d+)\b", r"kc\1", coreness_rounds_sql(10))
    parts = (
        [td.EDGES_CTE, td.SYM_CTE]
        + [core]
        + [td.NODES_CTE]
        + td._pagerank_body(5, 0.85)
    )
    return (
        "WITH "
        + ",".join(parts)
        + """
SELECT CAST(c.coreness AS BIGINT) AS coreness,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       ROUND(CAST(SUM(CAST(ROUND(r.rank, 9) AS DECIMAL(38,12)))
                  AS DOUBLE), 9) AS rank_mass
FROM r5 r JOIN (SELECT node, coreness FROM core_final) c
  ON r.node = c.node
GROUP BY c.coreness"""
    )


def q_source_report(spark, sf_dir):
    """Per-source curation dashboard over the documents table: doc and
    char counts, DECIMAL-exact mean quality (round-6 qualities are
    identical doubles on both engines), and the within-source exact-
    duplicate rate (1 - distinct fingerprints / docs) — the
    provenance-level triage view (which feed is low-quality or
    self-repetitive) run before any per-document filtering."""
    from webgraph_spark.functions.text import text_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    st = text_stats(docs, "doc_id", "text")
    j = docs.select("doc_id", "source").join(st, "doc_id")
    return j.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(
            F.sum(F.col("quality").cast("decimal(38,12)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_quality"),
        F.round(
            (
                F.count("*") - F.countDistinct("fingerprint")
            ).cast("double")
            / F.count("*"),
            6,
        ).alias("dup_rate"),
    )


def _source_report_sql() -> str:
    return f"""WITH stats AS ({_text_stats_sql()})
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(st.n_chars) AS BIGINT) AS total_chars,
       ROUND(CAST(SUM(CAST(st.quality AS DECIMAL(38,12))) AS DOUBLE)
             / COUNT(*), 6) AS mean_quality,
       ROUND(CAST(COUNT(*) - COUNT(DISTINCT st.fingerprint) AS DOUBLE)
             / COUNT(*), 6) AS dup_rate
FROM documents d JOIN stats st ON d.doc_id = st.doc_id
GROUP BY d.source"""


def q_dup_turns(spark, sf_dir):
    """Turn-level boilerplate profile on the transcript payload: the
    top-10 most repeated turn texts across ALL conversations (count,
    number of distinct conversations carrying them) — the scripted-
    content detector a transcript-training pipeline runs before
    per-document dedup (repeated single turns survive document-level
    MinHash). Rank by (count desc, text asc) — a total order. One
    groupBy(text); the top-10 head is a tiny tail sort."""
    tr = _transcripts_view(spark, sf_dir)
    agg = tr.groupBy("text").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("conv_id").alias("n_convs"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("text").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select(
            F.col("rank").cast("long").alias("rank"),
            "text",
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.col("n_convs").cast("long").alias("n_convs"),
        )
    )


def _dup_turns_sql() -> str:
    return (
        "WITH "
        + td.TRANSCRIPT_TR_CTE
        + """,
agg AS (
  SELECT text, COUNT(*) AS n_occurrences,
         COUNT(DISTINCT conv_id) AS n_convs
  FROM tr GROUP BY text)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, text ASC)
            AS BIGINT) AS rank,
       text, CAST(n_occurrences AS BIGINT) AS n_occurrences,
       CAST(n_convs AS BIGINT) AS n_convs
FROM agg ORDER BY n_occurrences DESC, text ASC LIMIT 10"""
    )


def q_events_seasonality(spark, sf_dir):
    """Hour-of-week activity profile of the event stream (0 = Monday
    00:00 UTC ... 167 = Sunday 23:00): exact counts plus each slot's
    permille share of total traffic (one integer-scaled division per
    row) — the seasonality fingerprint capacity planning and
    anomaly-baseline jobs consume. Weekday/hour are integer functions
    of epoch microseconds, identical in both engines."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # Monday=0 via (dayofweek + 5) % 7 (Spark dayofweek: Sunday=1)
    how = (
        ((F.dayofweek("ts") + 5) % 7) * 24 + F.hour("ts")
    ).alias("hour_of_week")
    agg = ev.groupBy(how).agg(F.count("*").alias("n"))
    tot = agg.agg(F.sum("n").alias("t"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            F.col("hour_of_week").cast("int").alias("hour_of_week"),
            F.col("n").cast("long").alias("n_events"),
            F.round(
                F.col("n") * F.lit(1000.0) / F.col("t"), 6
            ).alias("permille"),
        )
    )


def _events_seasonality_sql() -> str:
    return """WITH agg AS (
  SELECT (CAST(isodow(ts) AS INT) - 1) * 24
         + CAST(hour(ts) AS INT) AS hour_of_week,
         COUNT(*) AS n
  FROM events GROUP BY 1),
tot AS (SELECT SUM(n) AS t FROM agg)
SELECT CAST(hour_of_week AS INT) AS hour_of_week,
       CAST(n AS BIGINT) AS n_events,
       ROUND(n * 1000.0 / t, 6) AS permille
FROM agg CROSS JOIN tot"""


def q_minhash_estimate(spark, sf_dir):
    """Sketch-vs-truth calibration for MinHash: for every LSH candidate
    pair, the signature-agreement estimate (matching positions / H —
    the unbiased Jaccard estimator the sketch promises) NEXT TO the
    exact shingle Jaccard, plus the absolute error. The acceptance
    posture of HyperBallTest applied to the dedup sketch: the driver
    row proves the estimator is computed correctly; the companion
    pytest asserts the error bound on seeded fixtures. One join of the
    already-built signature table against itself restricted to
    candidate pairs — |pairs| x H work, never all-pairs."""
    d = _docs(spark, sf_dir)
    pairs = minhash_lsh_candidates(
        d, "doc_id", "text", NUM_HASHES, BAND_ROWS, SHINGLE, HASH_SEED
    )
    sigs = minhash_signatures(
        d, "doc_id", "text", NUM_HASHES, SHINGLE, HASH_SEED
    )
    est = (
        pairs.join(
            sigs.select(F.col("id").alias("id_a"), "i",
                        F.col("minhash").alias("ha")),
            "id_a",
        )
        .join(
            sigs.select(F.col("id").alias("id_b"), "i",
                        F.col("minhash").alias("hb")),
            ["id_b", "i"],
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                F.when(F.col("ha") == F.col("hb"), 1).otherwise(0)
            ).alias("agree")
        )
        .select(
            "id_a",
            "id_b",
            F.round(F.col("agree") / F.lit(NUM_HASHES), 6).alias("est_jaccard"),
        )
    )
    exact = ngram_jaccard(d, pairs, "doc_id", "text", SHINGLE)
    return est.join(exact, ["id_a", "id_b"]).select(
        "id_a",
        "id_b",
        "est_jaccard",
        "jaccard",
        F.round(F.abs(F.col("est_jaccard") - F.col("jaccard")), 6).alias(
            "abs_err"
        ),
    )


def _minhash_estimate_sql() -> str:
    return f"""WITH {_PAIRS_CTE},
agree AS (
  SELECT p.id_a, p.id_b,
         ROUND(SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END)
               / {NUM_HASHES}, 6) AS est_jaccard
  FROM pairs p
  JOIN sigs sa ON sa.id = p.id_a
  JOIN sigs sb ON sb.id = p.id_b AND sb.i = sa.i
  GROUP BY p.id_a, p.id_b),
sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT s1.id AS id_a, s2.id AS id_b, COUNT(*) AS common
  FROM sh s1 JOIN sh s2 ON s1.shingle = s2.shingle AND s1.id < s2.id
  JOIN pairs p ON p.id_a = s1.id AND p.id_b = s2.id
  GROUP BY s1.id, s2.id),
exact AS (
  SELECT x.id_a, x.id_b,
         ROUND(x.common / (na.n + nb.n - x.common), 6) AS jaccard
  FROM inter x
  JOIN sizes na ON na.id = x.id_a
  JOIN sizes nb ON nb.id = x.id_b)
SELECT a.id_a, a.id_b, a.est_jaccard, e.jaccard,
       ROUND(abs(a.est_jaccard - e.jaccard), 6) AS abs_err
FROM agree a JOIN exact e ON a.id_a = e.id_a AND a.id_b = e.id_b"""


def q_tool_latency(spark, sf_dir):
    """Per-tool reply latency on the transcript payload: the
    microsecond gap from a tool-bearing turn to the NEXT turn in the
    conversation, attributed to the tool — 'how long after tool X
    fires does the conversation move' (integer-exact sums, one
    division per row; the tool-level drill-down of
    transcript_turn_latency)."""
    from pyspark.sql import Window

    tr = _transcripts_view(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gaps = (
        tr.select(
            "tool",
            F.timestamp_diff(
                "MICROSECOND", F.col("ts"), F.lead("ts").over(w)
            ).alias("gap_us"),
        )
        .filter(F.col("tool").isNotNull() & F.col("gap_us").isNotNull())
    )
    return gaps.groupBy("tool").agg(
        F.count(F.lit(1)).alias("n_calls"),
        F.sum("gap_us").alias("sum_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.round(F.sum("gap_us") / F.count(F.lit(1)), 9).alias("avg_gap_us"),
    )


def _tool_latency_sql() -> str:
    return (
        "WITH "
        + td.TRANSCRIPT_TR_CTE
        + """,
gaps AS (
  SELECT tool,
         LEAD(epoch_us(ts)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx) - epoch_us(ts) AS gap_us
  FROM tr)
SELECT tool, CAST(COUNT(*) AS BIGINT) AS n_calls,
       CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
       ROUND(CAST(SUM(gap_us) AS DOUBLE) / COUNT(*), 9) AS avg_gap_us
FROM gaps WHERE tool IS NOT NULL AND gap_us IS NOT NULL
GROUP BY tool"""
    )


def q_kmeans_silhouette(spark, sf_dir):
    """Per-cluster simplified silhouette of the emb_kmeans clustering
    (functions/clustering.py:kmeans_silhouette) — the clustering-
    quality gate a curation pipeline runs before trusting k-means
    blocks for SemDeDup/IVF."""
    from webgraph_spark.functions.clustering import kmeans_silhouette

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return kmeans_silhouette(emb, k=4, iters=3)


def q_assortativity_dir(spark, sf_dir):
    """Directed degree assortativity, all four (alpha, beta) flavors
    (Foster-Foster-Grassberger-Paczuski PNAS 2010): Pearson
    correlation of (alpha-degree of src, beta-degree of dst) over the
    loop-free distinct arc set, alpha/beta in {out, in}. Every moment
    is an exact int64 sum; each variance stays exact int64 and is
    cast to double only for the final sqrt/divide (the variance
    PRODUCT would overflow int64, so the twin multiplies doubles in
    the identical order). Complements the undirected
    graph_assortativity with the directionality webgraph users
    actually study (e.g. out-in is the classic 'do prolific linkers
    point at popular pages')."""
    arcs = (
        _edges(spark, sf_dir)
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    dout = arcs.groupBy(F.col("src").alias("v")).agg(
        F.count("*").alias("dout")
    )
    din = arcs.groupBy(F.col("dst").alias("v")).agg(
        F.count("*").alias("din")
    )
    degs = (
        dout.join(din, "v", "full_outer")
        .select(
            "v",
            F.coalesce("dout", F.lit(0)).alias("dout"),
            F.coalesce("din", F.lit(0)).alias("din"),
        )
    )
    j = (
        arcs.join(
            degs.select(
                F.col("v").alias("src"),
                F.col("dout").alias("so"),
                F.col("din").alias("si"),
            ),
            "src",
        )
        .join(
            degs.select(
                F.col("v").alias("dst"),
                F.col("dout").alias("to"),
                F.col("din").alias("ti"),
            ),
            "dst",
        )
    )

    aggs = [F.count("*").alias("m")]
    for xa, xn in (("so", "o"), ("si", "i")):
        aggs += [
            F.sum(xa).alias(f"s_{xn}"),
            F.sum(F.col(xa) * F.col(xa)).alias(f"s2_{xn}"),
        ]
    for ya, yn in (("to", "o"), ("ti", "i")):
        aggs += [
            F.sum(ya).alias(f"t_{yn}"),
            F.sum(F.col(ya) * F.col(ya)).alias(f"t2_{yn}"),
        ]
    for xa, xn in (("so", "o"), ("si", "i")):
        for ya, yn in (("to", "o"), ("ti", "i")):
            aggs.append(F.sum(F.col(xa) * F.col(ya)).alias(f"p_{xn}{yn}"))
    mo = j.agg(*aggs)

    def corr(xn, yn):
        d = lambda c: F.col(c).cast("decimal(38,0)")
        m = d("m")
        cov = m * d(f"p_{xn}{yn}") - d(f"s_{xn}") * d(f"t_{yn}")
        vx = m * d(f"s2_{xn}") - d(f"s_{xn}") * d(f"s_{xn}")
        vy = m * d(f"t2_{yn}") - d(f"t_{yn}") * d(f"t_{yn}")
        return F.when(
            (vx > 0) & (vy > 0),
            F.round(
                cov.cast("double")
                / F.sqrt(vx.cast("double") * vy.cast("double")),
                6,
            ),
        )

    out = mo.select(
        F.col("m").cast("long").alias("n_arcs"),
        corr("o", "i").alias("r_out_in"),
        corr("o", "o").alias("r_out_out"),
        corr("i", "i").alias("r_in_in"),
        corr("i", "o").alias("r_in_out"),
    )
    return out


def _assortativity_dir_sql() -> str:
    corrs = []
    for xn, xcol in (("o", "so"), ("i", "si")):
        for yn, ycol in (("o", "to"), ("i", "ti")):
            cov = f"(m * p_{xn}{yn} - s_{xn} * t_{yn})"
            vx = f"(m * s2_{xn} - s_{xn} * s_{xn})"
            vy = f"(m * t2_{yn} - t_{yn} * t_{yn})"
            corrs.append(
                (xn, yn,
                 f"CASE WHEN {vx} > 0 AND {vy} > 0 THEN "
                 f"ROUND(CAST({cov} AS DOUBLE) / "
                 f"sqrt(CAST({vx} AS DOUBLE) * CAST({vy} AS DOUBLE)), 6) "
                 f"END")
            )
    sel = {f"{x}{y}": e for x, y, e in corrs}
    return f"""WITH {td.EDGES_CTE},
darcs AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
degs AS MATERIALIZED (
  SELECT v, COALESCE(MAX(dout), 0) AS dout, COALESCE(MAX(din), 0) AS din
  FROM (
    SELECT src AS v, COUNT(*) AS dout, NULL AS din FROM darcs GROUP BY src
    UNION ALL
    SELECT dst AS v, NULL, COUNT(*) FROM darcs GROUP BY dst) u
  GROUP BY v),
j AS (
  SELECT a.dout AS so, a.din AS si, b.dout AS "to", b.din AS ti
  FROM darcs e JOIN degs a ON e.src = a.v JOIN degs b ON e.dst = b.v),
mo AS (
  SELECT COUNT(*) AS m,
    SUM(so) AS s_o, SUM(so * so) AS s2_o,
    SUM(si) AS s_i, SUM(si * si) AS s2_i,
    SUM("to") AS t_o, SUM("to" * "to") AS t2_o,
    SUM(ti) AS t_i, SUM(ti * ti) AS t2_i,
    SUM(so * "to") AS p_oo, SUM(so * ti) AS p_oi,
    SUM(si * "to") AS p_io, SUM(si * ti) AS p_ii
  FROM j)
SELECT CAST(m AS BIGINT) AS n_arcs,
  {sel['oi']} AS r_out_in,
  {sel['oo']} AS r_out_out,
  {sel['ii']} AS r_in_in,
  {sel['io']} AS r_in_out
FROM mo"""


def q_triad_census(spark, sf_dir):
    """Holland-Leinhardt 16-class directed triad census on the TPC-H
    link graph (algos/motifs.py:triad_census — Batagelj-Mrvar sparse
    enumeration + combinatorial completion): the canonical directed
    micro-structure statistic refining triangles/reciprocity."""
    from webgraph_spark.algos.motifs import triad_census

    return triad_census(_edges(spark, sf_dir))


def q_directed_triangle_profile(spark, sf_dir):
    """Fagiolo directed-clustering triangle roles per node
    (algos/motifs.py:directed_triangle_profile): cycle / middleman /
    in / out triangle counts from one degree-ordered support-triangle
    enumeration — the per-node refinement of the triad census.
    Reference analog: the clustering-coefficient statistics layer of
    webgraph's Stats (Stats.java) extended to directed roles."""
    from webgraph_spark.algos.motifs import directed_triangle_profile

    return directed_triangle_profile(_edges(spark, sf_dir))


def q_directed_clustering(spark, sf_dir):
    """Fagiolo directed clustering coefficients per node
    (algos/motifs.py:directed_clustering): the four triangle roles
    normalized by their degree-attainable maxima — the directed
    refinement of graph_clustering_coeff, one degree agg on top of the
    profile's triangle join."""
    from webgraph_spark.algos.motifs import directed_clustering

    return directed_clustering(_edges(spark, sf_dir))


def q_triangle_participation(spark, sf_dir):
    """Triangle participation ratio: the fraction of nodes on at least
    one (support) triangle — the standard cohesion companion to
    transitivity (every support-triangle corner realizes at least one
    directed role, so participation = any role count > 0). One
    aggregate over the profile."""
    from webgraph_spark.algos.motifs import directed_triangle_profile

    prof = directed_triangle_profile(_edges(spark, sf_dir))
    t = (
        F.col("t_cyc") + F.col("t_mid") + F.col("t_in") + F.col("t_out")
    )
    return prof.agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum(F.when(t > 0, 1).otherwise(0)).cast("long").alias("tri_nodes"),
        F.round(
            F.sum(F.when(t > 0, 1).otherwise(0)) / F.count("*"), 6
        ).alias("participation"),
    )


def q_curation_funnel(spark, sf_dir):
    """End-to-end training-data curation funnel — the pipeline-level
    composition of the pillar's stages with per-stage survivor counts
    (what a data-curation run reports to its dashboard):

      0 total -> 1 quality (composite score >= 0.6)
      -> 2 exact dedup (keep min doc_id per content fingerprint)
      -> 3 near-dup (keep only full-corpus MinHash-LSH cluster
           canonicals, threshold 0.8 Jaccard)
      -> 4 language (lang = 'en')

    Every stage reuses the already-oracle-checked operator (text_stats
    quality, md5 fingerprint, near_dup_clusters) so the funnel gates
    the COMPOSITION: joins between stages, filter ordering, and the
    keep-min rules. Near-dup canonicals are computed on the full
    corpus (the standard order: dedup clusters don't depend on which
    quality survivors remain). Scale: each stage is one groupBy or
    semi-join over the shrinking survivor set."""
    from webgraph_spark.functions.dedup import near_dup_clusters
    from webgraph_spark.functions.text import text_stats

    docs = _docs(spark, sf_dir)
    st = text_stats(docs, "doc_id", "text")
    base = docs.select("doc_id", "lang").join(
        st.select("doc_id", "quality", "fingerprint"), "doc_id"
    )
    s1 = base.where(F.col("quality") >= 0.6)
    keep2 = s1.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    s2 = s1.join(keep2.select("doc_id"), "doc_id")
    cl = near_dup_clusters(
        docs, "doc_id", "text",
        NUM_HASHES, BAND_ROWS, SHINGLE, HASH_SEED,
        threshold=DEDUP_THRESHOLD,
    )
    canon = cl.where(F.col("doc_id") == F.col("canonical_id")).select("doc_id")
    s3 = s2.join(canon, "doc_id")
    s4 = s3.where(F.col("lang") == "en")

    def stage(df, i, name):
        return df.agg(F.count("*").cast("long").alias("n_docs")).select(
            F.lit(i).cast("int").alias("stage"),
            F.lit(name).alias("filter"),
            "n_docs",
        )

    return (
        stage(base, 0, "total")
        .unionAll(stage(s1, 1, "quality"))
        .unionAll(stage(s2, 2, "exact_dedup"))
        .unionAll(stage(s3, 3, "near_dedup"))
        .unionAll(stage(s4, 4, "lang_en"))
    )


def _curation_funnel_sql() -> str:
    """Twin of q_curation_funnel: the docs_dedup_clusters recursive
    canonical chain + the text-stats quality/fingerprint expressions,
    composed into the same five survivor counts."""
    return f"""WITH RECURSIVE {_PAIRS_CTE},
sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT s1.id AS id_a, s2.id AS id_b, COUNT(*) AS common
  FROM sh s1 JOIN sh s2 ON s1.shingle = s2.shingle AND s1.id < s2.id
  JOIN pairs p ON p.id_a = s1.id AND p.id_b = s2.id
  GROUP BY s1.id, s2.id
),
ver AS (
  SELECT x.id_a, x.id_b
  FROM inter x
  JOIN sizes na ON na.id = x.id_a
  JOIN sizes nb ON nb.id = x.id_b
  WHERE ROUND(x.common / (na.n + nb.n - x.common), 6) >= {DEDUP_THRESHOLD}
),
dup_e AS (
  SELECT id_a AS a, id_b AS b FROM ver
  UNION ALL SELECT id_b, id_a FROM ver
),
cl AS (
  SELECT doc_id AS node, doc_id AS reach FROM documents
  UNION
  SELECT cl.node, dup_e.b FROM cl JOIN dup_e ON cl.reach = dup_e.a
),
lab AS (SELECT node AS doc_id, MIN(reach) AS canonical_id FROM cl GROUP BY node),
stats AS ({_text_stats_sql()}),
base AS (
  SELECT d.doc_id, d.lang, st.quality, st.fingerprint
  FROM documents d JOIN stats st USING (doc_id)),
s1 AS (SELECT * FROM base WHERE quality >= 0.6),
s2 AS (
  SELECT s1.* FROM s1
  JOIN (SELECT fingerprint, MIN(doc_id) AS doc_id
        FROM s1 GROUP BY fingerprint) k USING (doc_id)),
s3 AS (
  SELECT s2.* FROM s2
  JOIN lab ON s2.doc_id = lab.doc_id AND lab.doc_id = lab.canonical_id),
s4 AS (SELECT * FROM s3 WHERE lang = 'en')
SELECT CAST(0 AS INT) AS stage, 'total' AS filter,
       CAST(COUNT(*) AS BIGINT) AS n_docs FROM base
UNION ALL SELECT 1, 'quality', CAST(COUNT(*) AS BIGINT) FROM s1
UNION ALL SELECT 2, 'exact_dedup', CAST(COUNT(*) AS BIGINT) FROM s2
UNION ALL SELECT 3, 'near_dedup', CAST(COUNT(*) AS BIGINT) FROM s3
UNION ALL SELECT 4, 'lang_en', CAST(COUNT(*) AS BIGINT) FROM s4"""


def q_events_gini(spark, sf_dir):
    """Gini coefficient of per-user event activity via the exact
    rank formula G = (2*sum(i*x_i) - (n+1)*sum(x_i)) / (n*sum(x_i))
    over counts sorted by (count asc, user asc — a total order, so
    both engines rank identically). Every moment is an exact int64
    sum; the Gini is ONE double division. The concentration dial for
    traffic/contributor skew — the Lorenz summary next to
    events_heavy_hitters' sketch. Scale: one groupBy + one sort of
    the per-user counts relation."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("x"))
    w = Window.orderBy(F.col("x").asc(), F.col("user_id").asc())
    ranked = counts.withColumn("i", F.row_number().over(w))
    return ranked.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("total_events"),
        F.round(
            (
                F.lit(2) * F.sum(F.col("i") * F.col("x"))
                - (F.count("*") + 1) * F.sum("x")
            ).cast("double")
            / (F.count("*") * F.sum("x")),
            9,
        ).alias("gini"),
    )


def _events_gini_sql() -> str:
    return """WITH counts AS (
  SELECT user_id, COUNT(*) AS x FROM events GROUP BY user_id),
ranked AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x ASC, user_id ASC) AS i
  FROM counts)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(x) AS BIGINT) AS total_events,
       ROUND(CAST(2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x) AS DOUBLE)
             / (COUNT(*) * SUM(x)), 9) AS gini
FROM ranked"""


def q_events_degree_ks(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov drift statistic between the
    out-degree distributions of the two event-stream snapshots
    (same split as events_graph_diff): KS = max_k |F0(k) - F1(k)|
    computed as max |C0(k)*n1 - C1(k)*n0| over the union of degree
    values — an EXACT integer maximization with one final double
    division, so no float-comparison hazard picks the wrong argmax.
    The distribution-drift alarm for a continuously re-ingested
    graph (degree churn tells you WHO moved; KS tells you whether
    the SHAPE moved). Scale: two degree aggregates + a cumsum over
    the tiny distinct-degree axis."""
    from pyspark.sql import Window

    g0, g1 = _event_snapshots(spark, sf_dir)

    def hist(g):
        return (
            g.groupBy("src").agg(F.count("*").alias("d"))
            .groupBy("d").agg(F.count("*").alias("c"))
        )

    h0 = hist(g0).withColumnRenamed("c", "c0")
    h1 = hist(g1).withColumnRenamed("c", "c1")
    u = (
        h0.join(h1, "d", "full_outer")
        .select(
            "d",
            F.coalesce("c0", F.lit(0)).alias("c0"),
            F.coalesce("c1", F.lit(0)).alias("c1"),
        )
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = u.select(
        "d",
        F.sum("c0").over(w).alias("k0"),
        F.sum("c1").over(w).alias("k1"),
    )
    tot = u.agg(
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
    )
    scored = cum.crossJoin(F.broadcast(tot)).select(
        "d",
        "n0",
        "n1",
        F.abs(
            F.col("k0") * F.col("n1") - F.col("k1") * F.col("n0")
        ).alias("num"),
    )
    ww = Window.orderBy(F.col("num").desc(), F.col("d").asc())
    return (
        scored.withColumn("rk", F.row_number().over(ww))
        .where(F.col("rk") == 1)
        .select(
            F.col("d").cast("long").alias("ks_at_degree"),
            "n0",
            "n1",
            F.round(
                F.col("num").cast("double") / (F.col("n0") * F.col("n1")), 9
            ).alias("ks_stat"),
        )
    )


def _events_degree_ks_sql() -> str:
    return """WITH b AS (
  SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid FROM events),
g0 AS (
  SELECT user_id AS src,
         event_type || ':' || json_extract_string(props, '$.k') AS dst
  FROM events, b WHERE epoch_us(ts) < b.mid),
g1 AS (
  SELECT user_id AS src,
         event_type || ':' || json_extract_string(props, '$.k') AS dst
  FROM events, b WHERE epoch_us(ts) >= b.mid),
h0 AS (SELECT d, COUNT(*) AS c0 FROM (
  SELECT src, COUNT(*) AS d FROM g0 GROUP BY src) GROUP BY d),
h1 AS (SELECT d, COUNT(*) AS c1 FROM (
  SELECT src, COUNT(*) AS d FROM g1 GROUP BY src) GROUP BY d),
u AS (
  SELECT COALESCE(h0.d, h1.d) AS d, COALESCE(c0, 0) AS c0,
         COALESCE(c1, 0) AS c1
  FROM h0 FULL OUTER JOIN h1 ON h0.d = h1.d),
cum AS (
  SELECT d,
         SUM(c0) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS k0,
         SUM(c1) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS k1
  FROM u),
tot AS (SELECT SUM(c0) AS n0, SUM(c1) AS n1 FROM u)
SELECT CAST(d AS BIGINT) AS ks_at_degree,
       CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       ROUND(CAST(abs(k0 * n1 - k1 * n0) AS DOUBLE) / (n0 * n1), 9)
         AS ks_stat
FROM (
  SELECT d, k0, k1, n0, n1,
         ROW_NUMBER() OVER (
           ORDER BY abs(k0 * n1 - k1 * n0) DESC, d ASC) AS rk
  FROM cum CROSS JOIN tot) WHERE rk = 1"""


def q_pca_top(spark, sf_dir):
    """Top principal component + explained-variance ratio of the
    embedding corpus (functions/similarity.py:pca_top): power
    iteration on the centered covariance, md5-parity start, sign
    canonicalized — with emb_anisotropy the standard collapsed-
    geometry diagnostic."""
    from webgraph_spark.functions.similarity import pca_top

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return pca_top(emb)


def q_random_failure(spark, sf_dir):
    """Random-failure robustness curve (Albert-Jeong-Barabasi, the
    companion to graph_attack_tolerance): delete a deterministic
    md5-coin fraction of nodes (0 / 200 / 500 permille) and measure
    fragmentation of the survivors
    (algos/components.py:random_failure_tolerance)."""
    from webgraph_spark.algos.components import random_failure_tolerance

    return random_failure_tolerance(
        _edges(spark, sf_dir), permilles=[0, 200, 500], num_partitions=16
    )


def q_containment(spark, sf_dir):
    """Asymmetric near-dup verification on the documents table: exact
    shingle-set containment max(|A∩B|/|A|, |A∩B|/|B|) for the same LSH
    candidate pairs docs_jaccard verifies — catches quotes/subset
    duplicates that symmetric Jaccard under-scores (Broder 1997). Same
    pair-driven bounded plan (functions/dedup.py:ngram_containment)."""
    from webgraph_spark.functions.dedup import ngram_containment

    d = _docs(spark, sf_dir)
    pairs = minhash_lsh_candidates(
        d, "doc_id", "text", NUM_HASHES, BAND_ROWS, SHINGLE, HASH_SEED
    )
    return ngram_containment(d, pairs, "doc_id", "text", SHINGLE)


def q_centroid_classify(spark, sf_dir):
    """Nearest-class-centroid confusion matrix over the embeddings
    table (Rocchio prototype probe of label recoverability) —
    functions/clustering.py:centroid_classify."""
    from webgraph_spark.functions.clustering import centroid_classify

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return centroid_classify(emb)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # Registry order note: rotated for round 5 so the driver's first-50
        # correctness sample covers queries never verified in rounds 1-4
        # (see tools/driver_coverage.py for the per-round manifest).
        "bvdisk_fixed_label_roundtrip": q_bvdisk_fixed_label_roundtrip,
        "graph_hyperball_wide_nf": q_hyperball_wide_nf,
        "graph_topk_harmonic": q_topk_harmonic,
        "graph_betweenness": q_betweenness,
        "emb_near_dups": q_emb_near_dups,
        "emb_dedup_clusters": q_emb_dedup_clusters,
        "emb_ivf_top5": q_ivf_top5,
        "emb_ivf_recall5": q_ivf_recall5,
        "emb_sq8_top5": q_sq8_top5,
        "emb_sq8_recall5": q_sq8_recall5,
        "emb_pq_top5": q_pq_top5,
        "emb_pq_recall5": q_pq_recall5,
        "emb_semdedup": q_semdedup,
        "graph_union_transpose": q_union_transpose,
        "graph_line_graph": q_line_graph,
        "graph_induced_subgraph": q_induced_subgraph,
        "graph_degree_range": q_degree_range,
        "graph_mask_interval": q_mask_interval,
        "graph_lex_gamma_bits": q_lex_gamma_bits,
        "graph_llp_gamma_bits": q_llp_gamma_bits,
        "graph_ppr5": q_ppr5,
        "graph_hits8": q_hits8,
        "graph_katz8": q_katz8,
        "graph_distance_cdf": q_distance_cdf,
        "graph_eff_diameter": q_eff_diameter,
        "events_scattered_arcs": q_scattered_arcs,
        "events_temporal_reach": q_temporal_reach,
        "events_graph_diff": q_events_graph_diff,
        "events_degree_churn": q_events_degree_churn,
        "events_user_projection": q_user_projection,
        "graph_truss4": q_truss4,
        "graph_msf": q_msf,
        "graph_mis": q_mis,
        "graph_densest": q_densest,
        "graph_local_cluster": q_local_cluster,
        "graph_matching": q_matching,
        "graph_coloring": q_coloring,
        "graph_partition4": q_partition4,
        "graph_partition_quality": q_partition_quality,
        "graph_landmark_sketch": q_landmark_sketch,
        "graph_landmark_est": q_landmark_est,
        "graph_rich_club": q_rich_club,
        "graph_rich_club_norm": q_rich_club_norm,
        "docs_dsir_weights": q_dsir_weights,
        "docs_dsir_sample": q_dsir_sample,
        "graph_bowtie": q_bowtie,
        "events_funnel3": q_events_funnel,
        "events_retention": q_events_retention,
        "graph_transitivity": q_transitivity,
        "docs_langid_trained": q_langid_trained,
        "graph_attack_tolerance": q_attack_tolerance,
        "emb_trunc_top5": q_trunc_top5,
        "emb_trunc_recall5": q_trunc_recall5,
        "graph_fiedler": q_fiedler,
        "graph_oddball": q_oddball,
        "graph_trustrank": q_trustrank,
        "events_anomaly_z": q_events_anomaly,
        "transcript_role_bigrams": q_role_bigrams,
        "docs_sample_stratified": q_sample_stratified,
        "docs_contamination": q_contamination,
        "docs_hash_split": q_hash_split,
        "docs_mixture_sample": q_mixture_sample,
        "docs_pack_chunks": q_pack_chunks,
        "docs_repetition": q_docs_repetition,
        "docs_window_dedup": q_docs_window_dedup,
        "docs_bpe_merges": q_docs_bpe_merges,
        "docs_bpe_tokens": q_docs_bpe_tokens,
        "graph_compose_minplus": q_compose_minplus,
        "graph_union_labelled": q_union_labelled,
        "graph_seeded_perm": q_seeded_perm,
        "graph_ecc_sample": q_ecc_sample,
        "graph_kcore5": q_kcore5,
        "docs_pii_scrub": q_docs_pii,
        "graph_coreness": q_coreness,
        "graph_extract_component": q_extract_component,
        "graph_hostgray_gamma_bits": q_hostgray_gamma_bits,
        "graph_random_walks": q_random_walks,
        "graph_simrank_top20": q_simrank_top20,
        "graph_node2vec_walks": q_node2vec,
        "graph_wl_labels": q_wl_labels,
        "graph_link_prediction": q_link_prediction,
        "graph_clustering_coeff": q_clustering_coeff,
        "graph_assortativity": q_assortativity,
        "graph_avg_nbr_degree": q_avg_neighbor_degree,
        "graph_sssp6": q_sssp6,
        "graph_dag_layers": q_dag_layers,
        "graph_eigenvector8": q_eigenvector8,
        "graph_salsa4": q_salsa4,
        "docs_bm25_top10": q_bm25_top10,
        "docs_hybrid_rrf_top10": q_hybrid_rrf,
        "docs_bigram_lm": q_bigram_lm,
        "docs_ngram_topk": q_ngram_topk,
        "emb_kmeans": q_kmeans,
        "events_hll_users": q_hll_users,
        "transcript_tool_pairs": q_tool_pairs,
        "transcript_tool_markov": q_tool_markov,
        "transcript_turn_latency": q_turn_latency,
        "transcript_context_pack": q_context_pack,
        "transcript_role_assortativity": q_role_assortativity,
        "transcript_conv_stats": q_conv_stats,
        "transcript_pattern_dups": q_pattern_dups,
        "transcript_role_diversity": q_role_diversity,
        "graph_ck_curve": q_ck_curve,
        "events_burstiness": q_events_burstiness,
        "docs_containment": q_containment,
        "emb_centroid_confusion": q_centroid_classify,
        "graph_random_failure": q_random_failure,
        "docs_zipf_slope": q_zipf_slope,
        "emb_pca_top": q_pca_top,
        "events_gini": q_events_gini,
        "events_degree_ks": q_events_degree_ks,
        "docs_curation_funnel": q_curation_funnel,
        "graph_triad_census": q_triad_census,
        "graph_dir_triangle_profile": q_directed_triangle_profile,
        "graph_dir_clustering": q_directed_clustering,
        "graph_triangle_participation": q_triangle_participation,
        "graph_assortativity_dir": q_assortativity_dir,
        "emb_kmeans_silhouette": q_kmeans_silhouette,
        "docs_minhash_estimate": q_minhash_estimate,
        "transcript_tool_latency": q_tool_latency,
        "transcript_dup_turns": q_dup_turns,
        "events_seasonality": q_events_seasonality,
        "graph_core_pagerank_share": q_core_pagerank_share,
        "docs_source_report": q_source_report,
        "events_type_markov": q_events_type_markov,
        "docs_source_overlap": q_source_overlap,
        "graph_cc_size_dist": q_cc_size_dist,
        "graph_strength_dist": q_strength_dist,
        "emb_label_tightness": q_label_tightness,
        "docs_length_hist": q_length_hist,
        "graph_core_sizes": q_core_sizes,
        "transcript_len_latency_corr": q_len_latency_corr,
        "events_hourly_autocorr": q_hourly_autocorr,
        "docs_heaps_points": q_heaps_points,
        "emb_sq8_error": q_sq8_error,
        "graph_rw_sample": q_rw_sample,
        "events_conversion_lag_quantiles": q_conversion_lag_quantiles,
        "graph_weighted_clustering": q_weighted_clustering,
        "graph_onion_layers": q_onion_layers,
        "graph_algebraic_connectivity": q_algebraic_connectivity,
        "graph_two_hop_hist": q_two_hop_hist,
        "docs_simhash_pairs": q_simhash_pairs,
        "graph_wpagerank5": q_wpagerank5,
        "events_heavy_hitters": q_heavy_hitters,
        "graph_cocitation2": q_cocitation2,
        "graph_quad_count": q_quad_count,
        "graph_reciprocity": q_reciprocity,
        "graph_reciprocity_rho": q_reciprocity_corrected,
        "graph_transitivity_null": q_transitivity_null,
        "graph_pagerank_localization": q_pagerank_localization,
        "graph_inout_degree_corr": q_inout_degree_corr,
        "graph_hub_dominance": q_hub_dominance,
        "docs_logreg_score": q_logreg_score,
        "docs_tfidf_pairs": q_tfidf_pairs,
        "graph_sage_features": q_sage_features,
        "events_value_quantiles": q_value_quantiles,
        "events_decay_pagerank": q_decay_pagerank,
        "graph_powerlaw_alpha": q_powerlaw_alpha,
        "graph_degree_dist_out": q_degree_out,
        "graph_degree_dist_in": q_degree_in,
        "graph_stats": q_graph_stats,
        "graph_pagerank5": q_pagerank5,
        "graph_cc8": q_cc8,
        "graph_lp3": q_lp3,
        "graph_modularity3": q_modularity3,
        "graph_louvain2": q_louvain2,
        "graph_hitting6": q_hitting6,
        "graph_conductance5": q_conductance,
        "graph_triangles": q_triangles,
        "graph_doulion_triangles": q_doulion,
        "graph_rmat_degrees": q_rmat_degrees,
        "graph_bfs3": q_bfs3,
        "graph_compose_cust_part": q_compose,
        "graph_quotient_nation": q_quotient_nation,
        "csr_roundtrip": q_csr_roundtrip,
        "bv_stream_roundtrip": q_bv_stream_roundtrip,
        "bv_labelled_roundtrip": q_bv_labelled_roundtrip,
        "bv_zeta_bits": q_bv_zeta_bits,
        "bv_golomb_bits": q_bv_golomb_bits,
        "bv_nibble_bits": q_bv_nibble_bits,
        "bv_full_roundtrip": q_bv_full_roundtrip,
        "bvdisk_roundtrip": q_bvdisk_roundtrip,
        "bvdisk_labelled_roundtrip": q_bvdisk_labelled_roundtrip,
        "bv_full_bits": q_bv_full_bits,
        "bv_stream_bits": q_bv_stream_bits,
        "ef_roundtrip": q_ef_roundtrip,
        "ef_bits": q_ef_bits,
        "graph_gamma_bits": q_gamma_bits,
        "graph_bv_bits": q_bv_bits,
        "graph_gray_gamma_bits": q_gray_gamma_bits,
        "graph_closeness_sample": q_closeness_sample,
        "graph_scc_dag": q_scc_dag,
        "docs_text_stats": q_text_stats,
        "docs_token_totals": q_token_totals,
        "docs_by_lang": q_docs_by_lang,
        "docs_minhash_sigs": q_minhash_sigs,
        "docs_lsh_pairs": q_lsh_pairs,
        "docs_jaccard": q_jaccard,
        "docs_simhash": q_simhash,
        "docs_dedup_clusters": q_dedup_clusters,
        "emb_cosine_top5": q_cosine_top5,
        "emb_anisotropy": q_emb_anisotropy,
        "emb_label_counts": q_emb_label_counts,
        "events_hourly": q_events_hourly,
        "events_sessions": q_event_sessions,
        "graph_pagerank_converged": q_pagerank_converged,
        "graph_cc_converged": q_cc_converged,
        "graph_cc_stars": q_cc_stars,
        "emb_ann_lsh_top5": q_ann_lsh_top5,
        "emb_ann_recall5": q_ann_recall5,
        "multimodal_features": q_multimodal_features,
        "transcript_graph_pagerank": q_transcript_graph,
        "graph_hyperball_nf": q_hyperball_nf,
        "graph_harmonic_approx": q_harmonic_approx,
    }


# -------------------------------------------------------------- oracles

_SW_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS_EN) + "]"
_P = MERSENNE_P
_A_SQL = "[" + ", ".join(str(x) for x in _A) + "]"
_B_SQL = "[" + ", ".join(str(x) for x in _B) + "]"

_TOKS = "string_split_regex(trim(text), '\\s+')"

_SHINGLES_CTE = f"""
toks AS (SELECT doc_id AS id, {_TOKS} AS t FROM documents),
sh AS (
  SELECT id, unnest(list_distinct(
    CASE WHEN len(t) >= {SHINGLE}
         THEN list_transform(range(1, len(t) - {SHINGLE - 2}),
                             i -> array_to_string(t[i:i+{SHINGLE - 1}], ' '))
         ELSE [array_to_string(t, ' ')] END)) AS shingle
  FROM toks
),
hh AS (SELECT id, (('0x' || substr(md5(shingle), 1, 15))::BIGINT % {_P}) AS h FROM sh)"""

_SIGS_CTE = f"""{_SHINGLES_CTE},
sigs AS (
  SELECT id, idx.i AS i,
         MIN((({_A_SQL})[idx.i + 1] * h + ({_B_SQL})[idx.i + 1]) % {_P}) AS minhash
  FROM hh CROSS JOIN (SELECT unnest(range(0, {NUM_HASHES})) AS i) idx
  GROUP BY id, idx.i
)"""

_BANDS_CTE = f"""{_SIGS_CTE},
bands AS (
  SELECT id, i // {BAND_ROWS} AS band,
         string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY i) AS band_key
  FROM sigs GROUP BY id, i // {BAND_ROWS}
)"""

_PAIRS_CTE = f"""{_BANDS_CTE},
bsz AS (SELECT band, band_key FROM bands GROUP BY band, band_key
        HAVING COUNT(*) <= {DEFAULT_MAX_BUCKET}),
bands_c AS (SELECT b.* FROM bands b
            JOIN bsz USING (band, band_key)),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands_c a JOIN bands_c b
    ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
)"""


def _pattern_dups_sql() -> str:
    """Twin of q_pattern_dups: the documents MinHash/LSH/Jaccard chain
    (same hash family, bands, shingles) re-sourced from per-conversation
    role+tool pattern strings built with an ordered string_agg."""
    return f"""WITH {td.TRANSCRIPT_TR_CTE},
pdocs AS (
  SELECT conv_id AS doc_id,
         string_agg(role || CASE WHEN tool IS NOT NULL THEN '+' || tool ELSE '' END,
                    ' ' ORDER BY turn_idx) AS text
  FROM tr GROUP BY conv_id
),
toks AS (SELECT doc_id AS id, {_TOKS} AS t FROM pdocs),
sh AS (
  SELECT id, unnest(list_distinct(
    CASE WHEN len(t) >= {SHINGLE}
         THEN list_transform(range(1, len(t) - {SHINGLE - 2}),
                             i -> array_to_string(t[i:i+{SHINGLE - 1}], ' '))
         ELSE [array_to_string(t, ' ')] END)) AS shingle
  FROM toks
),
hh AS (SELECT id, (('0x' || substr(md5(shingle), 1, 15))::BIGINT % {_P}) AS h FROM sh),
sigs AS (
  SELECT id, idx.i AS i,
         MIN((({_A_SQL})[idx.i + 1] * h + ({_B_SQL})[idx.i + 1]) % {_P}) AS minhash
  FROM hh CROSS JOIN (SELECT unnest(range(0, {NUM_HASHES})) AS i) idx
  GROUP BY id, idx.i
),
bands AS (
  SELECT id, i // {BAND_ROWS} AS band,
         string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY i) AS band_key
  FROM sigs GROUP BY id, i // {BAND_ROWS}
),
bsz AS (SELECT band, band_key FROM bands GROUP BY band, band_key
        HAVING COUNT(*) <= {DEFAULT_MAX_BUCKET}),
bands_c AS (SELECT b.* FROM bands b JOIN bsz USING (band, band_key)),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands_c a JOIN bands_c b
    ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
),
sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT s1.id AS id_a, s2.id AS id_b, COUNT(*) AS common
  FROM sh s1 JOIN sh s2 ON s1.shingle = s2.shingle AND s1.id < s2.id
  JOIN pairs p ON p.id_a = s1.id AND p.id_b = s2.id
  GROUP BY s1.id, s2.id
)
SELECT x.id_a, x.id_b,
       ROUND(x.common / (na.n + nb.n - x.common), 6) AS jaccard
FROM inter x
JOIN sizes na ON na.id = x.id_a
JOIN sizes nb ON nb.id = x.id_b"""


def _simhash_sql() -> str:
    bit_sums = ",\n    ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(16)
    )
    assemble = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16)
    )
    return f"""WITH tok AS (
  SELECT doc_id AS id, unnest({_TOKS}) AS tk FROM documents
),
hh AS (SELECT id, (('0x' || substr(md5(tk), 1, 15))::BIGINT % 65536) AS h FROM tok),
bits AS (SELECT id, {bit_sums} FROM hh GROUP BY id)
SELECT id, CAST({assemble} AS BIGINT) AS simhash FROM bits"""


def _coreness_sql(rounds: int) -> str:
    from webgraph_spark.algos.kcore import coreness_rounds_sql

    return (
        f"WITH {td.EDGES_CTE},{td.SYM_CTE},"
        + coreness_rounds_sql(rounds)
        + "\nSELECT node, coreness FROM core_final"
    )


def _clustering_sql() -> str:
    return f"""WITH {td.EDGES_CTE},
und AS (
  SELECT src, dst FROM edges WHERE src <> dst
  UNION
  SELECT dst AS src, src AS dst FROM edges WHERE src <> dst),
deg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS d FROM und GROUP BY src),
orient AS MATERIALIZED (
  SELECT u.src, u.dst FROM und u
  JOIN deg ds ON ds.node = u.src
  JOIN deg dd ON dd.node = u.dst
  WHERE ds.d < dd.d OR (ds.d = dd.d AND u.src < u.dst)),
tri AS (
  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
  FROM orient e1
  JOIN orient e2 ON e1.dst = e2.src
  JOIN orient e3 ON e3.src = e1.src AND e3.dst = e2.dst),
corners AS (
  SELECT u AS node FROM tri UNION ALL
  SELECT v FROM tri UNION ALL
  SELECT w FROM tri),
pt AS (SELECT node, COUNT(*) AS t FROM corners GROUP BY node)
SELECT d.node, CAST(d.d AS BIGINT) AS deg,
  CAST(COALESCE(pt.t, 0) AS BIGINT) AS triangles,
  ROUND(CASE WHEN d.d >= 2
        THEN 2.0 * COALESCE(pt.t, 0) / (d.d * (d.d - 1))
        ELSE 0.0 END, 6) AS clustering
FROM deg d LEFT JOIN pt ON d.node = pt.node"""


def _assortativity_sql() -> str:
    return f"""WITH {td.EDGES_CTE},{td.SYM_CTE},
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM sym GROUP BY src),
j AS (SELECT a.deg AS dj, b.deg AS dk
      FROM sym s JOIN deg a ON s.src = a.src JOIN deg b ON s.dst = b.src),
m AS (SELECT COUNT(*) AS m, SUM(dj * dk) AS sjk, SUM(dj) AS sj,
             SUM(dj * dj) AS sj2 FROM j)
SELECT CAST(m AS BIGINT) AS n_sym_arcs,
  ROUND((CAST(m AS DOUBLE) * sjk - CAST(sj AS DOUBLE) * sj)
      / (CAST(m AS DOUBLE) * sj2 - CAST(sj AS DOUBLE) * sj), 6)
    AS assortativity
FROM m"""


def _link_prediction_sql() -> str:
    return f"""WITH {td.EDGES_CTE},{td.SYM_CTE},
custs AS (SELECT o_custkey AS node FROM orders GROUP BY o_custkey
          ORDER BY node LIMIT 20),
prs AS (SELECT a.node AS a, b.node AS b FROM custs a JOIN custs b
        ON a.node < b.node),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM sym GROUP BY src),
wed AS (
  SELECT p.a, p.b, COUNT(*) AS common,
         CAST(SUM(ROUND(1.0 / ln(d.deg), 9)::DECIMAL(38,9)) AS DOUBLE) AS aa
  FROM prs p
  JOIN sym na ON na.src = p.a
  JOIN sym nb ON nb.src = p.b AND nb.dst = na.dst
  JOIN deg d ON d.src = na.dst
  GROUP BY p.a, p.b)
SELECT p.a, p.b,
  CAST(COALESCE(w.common, 0) AS BIGINT) AS common,
  ROUND(COALESCE(w.common / CAST(da.deg + db.deg - w.common AS DOUBLE), 0.0), 6)
    AS jaccard,
  ROUND(COALESCE(w.aa, 0.0), 6) AS adamic_adar
FROM prs p
LEFT JOIN wed w ON w.a = p.a AND w.b = p.b
LEFT JOIN deg da ON da.src = p.a
LEFT JOIN deg db ON db.src = p.b"""


def _random_walks_sql() -> str:
    from webgraph_spark.algos.walks import random_walks_sql

    return (
        f"""WITH {td.EDGES_CTE},
wsrc AS (SELECT o_custkey AS node FROM orders GROUP BY o_custkey
         ORDER BY node LIMIT 5),"""
        + random_walks_sql(length=4, n_walks=2)
    )


def _simrank_sql() -> str:
    from webgraph_spark.algos.linkpred import simrank_fingerprint_sql

    return simrank_fingerprint_sql(
        td.EDGES_CTE, n_walks=8, length=4, decay=0.5, k=20
    )


def _node2vec_sql() -> str:
    from webgraph_spark.algos.walks import node2vec_walks_sql

    return (
        f"""WITH {td.EDGES_CTE},
wsrc AS (SELECT o_custkey AS node FROM orders GROUP BY o_custkey
         ORDER BY node LIMIT 5),"""
        + node2vec_walks_sql(length=4, n_walks=2, p=2.0, q=0.5)
    )


def _pq_sql(
    k_nn: int = 5, m: int = 8, kc: int = 8, iters: int = 2, dim: int = 64
) -> str:
    """Unrolled twin of q_pq_top5: per-subspace Lloyd training on
    sliced sub-vectors (same md5 seeds, ROUND(avg, 6) centroid
    snapping, lowest-c ties as the Spark argmin), encode-then-decode
    reconstruction by list concatenation, asymmetric cosine vs
    full-precision queries."""
    sd = dim // m
    parts = [f"""
seeds AS (
  SELECT vec_id, CAST(ROW_NUMBER() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS BIGINT) AS c
  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {kc})"""]
    recs = []
    for sub in range(m):
        lo = sub * sd

        def dist(vec_alias):
            return (
                f"list_reduce(list_transform(range(1, {sd + 1}), "
                f"i -> (CAST({vec_alias}.embedding[{lo} + i] AS DOUBLE) - ct.cent[i]) "
                f"* (CAST({vec_alias}.embedding[{lo} + i] AS DOUBLE) - ct.cent[i])), "
                "(a, b) -> a + b)"
            )

        parts.append(f"""
c{sub}_0 AS (
  SELECT s.c, list_transform(range({lo + 1}, {lo + sd + 1}),
           i -> CAST(e.embedding[i] AS DOUBLE)) AS cent
  FROM seeds s JOIN embeddings e ON e.vec_id = s.vec_id)""")
        prev = f"c{sub}_0"
        for it in range(1, iters + 1):
            parts.append(f"""
a{sub}_{it} AS (
  SELECT vec_id, embedding, c FROM (
    SELECT e.vec_id, e.embedding, ct.c,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {dist('e')}, ct.c) AS rn
    FROM embeddings e CROSS JOIN {prev} ct) t
  WHERE rn = 1)""")
            parts.append(f"""
m{sub}_{it} AS (
  SELECT c, pos, ROUND(AVG(CAST(embedding[{lo} + pos] AS DOUBLE)), 6) AS mu
  FROM a{sub}_{it}, range(1, {sd + 1}) AS r(pos)
  GROUP BY c, pos)""")
            parts.append(f"""
c{sub}_{it} AS (
  SELECT p.c, COALESCE(x.cent, p.cent) AS cent
  FROM {prev} p LEFT JOIN (
    SELECT c, list(mu ORDER BY pos) AS cent FROM m{sub}_{it} GROUP BY c) x
  ON x.c = p.c)""")
            prev = f"c{sub}_{it}"
        parts.append(f"""
r{sub} AS (
  SELECT vec_id, cent FROM (
    SELECT e.vec_id, ct.cent,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {dist('e')}, ct.c) AS rn
    FROM embeddings e CROSS JOIN {prev} ct) t
  WHERE rn = 1)""")
        recs.append(f"r{sub}")
    cat = " || ".join(f"{r}.cent" for r in recs)
    joins = " ".join(f"JOIN {r} ON {r}.vec_id = r0.vec_id" for r in recs[1:])
    parts.append(f"""
rec AS (
  SELECT r0.vec_id, {cat} AS v
  FROM {recs[0]} r0 {joins})""")
    dot = (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        "i -> CAST(q.embedding[i] AS DOUBLE) * e.v[i]), (a, b) -> a + b)"
    )
    qn = (
        f"sqrt(list_reduce(list_transform(range(1, {dim + 1}), "
        "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)), "
        "(a, b) -> a + b))"
    )
    en = (
        f"sqrt(list_reduce(list_transform(range(1, {dim + 1}), "
        "i -> e.v[i] * e.v[i]), (a, b) -> a + b))"
    )
    return f"""WITH {",".join(parts)},
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         ROUND(({dot}) / (({qn}) * ({en})), 6) AS sim
  FROM embeddings q CROSS JOIN rec e
  WHERE q.vec_id < 10 AND e.vec_id <> q.vec_id)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim FROM (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored) t
WHERE rank <= {k_nn}"""


def _wl_sql() -> str:
    from webgraph_spark.algos.features import wl_sql

    return (
        f"WITH {td.EDGES_CTE},{td.NODES_CTE},{td.SYM_CTE},"
        + wl_sql(iters=3)
    )


def _temporal_reach_sql(rounds: int = 20) -> str:
    LONG_MIN = -(1 << 62)
    BIG = 1 << 62
    parts = ["""
tarcs AS MATERIALIZED (
  SELECT prev AS src, user_id AS dst, epoch_us(ts) AS t FROM (
    SELECT user_id, ts, epoch_us(ts) AS _eu,
           LAG(user_id) OVER (PARTITION BY event_type
                              ORDER BY ts, event_id) AS prev
    FROM events) x
  WHERE prev IS NOT NULL AND prev <> user_id)""", f"""
s0 AS MATERIALIZED (
  SELECT (SELECT MIN(user_id) FROM events) AS node,
         CAST({LONG_MIN} AS BIGINT) AS arrival)"""]
    for k in range(1, rounds + 1):
        parts.append(f"""
m{k} AS MATERIALIZED (
  SELECT a.dst AS node, MIN(a.t) AS m FROM tarcs a
  JOIN s{k - 1} s ON s.node = a.src AND a.t >= s.arrival
  GROUP BY a.dst)""")
        parts.append(f"""
s{k} AS MATERIALIZED (
  SELECT COALESCE(s.node, m.node) AS node,
         LEAST(COALESCE(s.arrival, {BIG}), COALESCE(m.m, {BIG})) AS arrival
  FROM s{k - 1} s FULL OUTER JOIN m{k} m ON s.node = m.node)""")
    return (
        "WITH " + ",".join(parts)
        + f"""
SELECT node, CAST(arrival AS BIGINT) AS arrival FROM s{rounds}"""
    )


def _rmat_sql() -> str:
    from webgraph_spark.datagen.graphs import rmat_sql

    return f"""WITH {rmat_sql(scale=12, n_edges=32768, seed=7)},
dedup AS (SELECT DISTINCT src, dst FROM rmat_edges),
degs AS (SELECT src, COUNT(*) AS degree FROM dedup GROUP BY src)
SELECT CAST(degree AS BIGINT) AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM degs GROUP BY degree"""


def _truss4_sql(rounds: int = 12) -> str:
    from webgraph_spark.algos.truss import ktruss_rounds_sql

    return f"""WITH ua AS (
  SELECT DISTINCT user_id AS u, {_PROJ_ATTR_SQL} AS a FROM events
),
sym AS (
  SELECT src, dst FROM (
    SELECT x.u AS src, y.u AS dst
    FROM ua x JOIN ua y ON x.a = y.a AND x.u <> y.u
  ) GROUP BY src, dst HAVING COUNT(*) >= 7
),
{ktruss_rounds_sql(4, rounds)}
SELECT src, dst, support FROM truss"""


def _kcore_sql(k: int, rounds: int) -> str:
    from webgraph_spark.algos.kcore import peel_rounds_sql

    return (
        f"WITH {td.EDGES_CTE},{td.SYM_CTE},"
        + peel_rounds_sql(k, rounds)
        + "\nSELECT node, deg FROM core"
    )


def _pii_sql() -> str:
    from webgraph_spark.functions.pii import PII_PATTERNS

    aug = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com from 10.2.' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.7 call +1 555-000-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    )
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    scrub = "t"
    for _, pat, repl in PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{repl}', 'g')"
    return f"""WITH aug AS (SELECT doc_id, {aug} AS t FROM documents)
SELECT doc_id, {counts},
  ('0x' || substr(md5({scrub}), 1, 15))::BIGINT AS scrubbed_fp
FROM aug"""


def _text_stats_sql() -> str:
    toks = _TOKS
    low_toks = "string_split_regex(trim(lower(text)), '\\s+')"
    n_tok = f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({toks}) END"
    punct = (
        "CASE WHEN length(text) = 0 THEN 0.0 ELSE "
        "length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) / length(text) END"
    )
    sw_ratio = (
        f"CASE WHEN len({low_toks}) = 0 THEN 0.0 ELSE "
        f"len(list_filter({low_toks}, x -> list_contains({_SW_SQL}, x)))"
        f" / len({low_toks}) END"
    )
    quality = (
        f"((CASE WHEN ({n_tok}) BETWEEN 5 AND 10000 THEN 1.0 ELSE 0.0 END)"
        f" + (CASE WHEN ({punct}) <= 0.2 THEN 1.0 ELSE 0.0 END)"
        f" + (CASE WHEN ({sw_ratio}) >= 0.05 THEN 1.0 ELSE 0.0 END)) / 3.0"
    )
    return f"""SELECT doc_id,
  CAST({n_tok} AS BIGINT) AS n_tokens,
  CAST(length(text) AS BIGINT) AS n_chars,
  ROUND({punct}, 6) AS punct_ratio,
  ROUND({sw_ratio}, 6) AS stopword_ratio,
  ROUND({quality}, 6) AS quality,
  ('0x' || substr(md5(text), 1, 15))::BIGINT AS fingerprint
FROM documents"""


_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _ann_lsh_sql(n_planes: int = 8, n_tables: int = 4, seed: int = 777, dim: int = 64) -> str:
    """Bit-replicating twin of cosine_topk_lsh: the Rademacher plane
    entries are md5-derived on the Python side and baked into BOTH plans
    as literals; bucket bits compare the identical left-to-right float64
    fold, so candidate sets match exactly."""
    from webgraph_spark.functions.similarity import _hyperplanes

    def dot_signed(plane) -> str:
        lits = "[" + ", ".join(f"{x:.1f}" for x in plane) + "]"
        return (
            f"list_reduce(list_transform(range(1, {dim + 1}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({lits})[i]), (a, b) -> a + b)"
        )

    bt = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        bucket = " + ".join(
            f"(CASE WHEN ({dot_signed(planes[j])}) > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(n_planes)
        )
        bt.append(
            f"bt{t} AS (SELECT vec_id, ({bucket}) AS bucket FROM embeddings)"
        )
    cand_unions = " UNION ".join(
        f"SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id "
        f"FROM bt{t} c JOIN bt{t} q ON c.bucket = q.bucket "
        f"WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id"
        for t in range(n_tables)
    )
    dot = (
        "list_reduce(list_transform(range(1, len(q.embedding) + 1), "
        "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), "
        "(a, b) -> a + b)"
    )
    qnorm = (
        "sqrt(list_reduce(list_transform(range(1, len(q.embedding) + 1), "
        "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)), "
        "(a, b) -> a + b))"
    )
    enorm = (
        "sqrt(list_reduce(list_transform(range(1, len(e.embedding) + 1), "
        "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), "
        "(a, b) -> a + b))"
    )
    return f"""WITH {", ".join(bt)},
cand AS ({cand_unions}),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         ROUND(({dot}) / (({qnorm}) * ({enorm})), 6) AS sim
  FROM cand c
  JOIN embeddings q ON q.vec_id = c.query_id
  JOIN embeddings e ON e.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim FROM (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored) t
WHERE rank <= 5"""


def _multimodal_sql(n: int = 48, dim: int = 16) -> str:
    """Twin of synthesize_media + _fake_decode + the checksum query: the
    payload is ascii(md5 hex) so the byte values are reproducible, and
    the centered/normalized float32 feature chain is replicated with the
    same element order."""
    return f"""WITH ids AS (SELECT unnest(range(0, {n})) AS media_id),
m AS (SELECT media_id,
        CASE CAST(media_id % 3 AS INT) WHEN 0 THEN 'image'
             WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        md5('media:' || CAST(media_id AS VARCHAR)) AS hx
      FROM ids),
b AS (SELECT media_id, kind,
        list_transform(range(1, {dim + 1}),
                       i -> CAST(ascii(substr(hx, CAST(i AS INT), 1)) AS DOUBLE)) AS arr
      FROM m),
c AS (SELECT media_id, kind, arr,
        list_reduce(arr, (a, b) -> a + b) / {dim} AS mu FROM b),
v AS (SELECT media_id, kind,
        list_transform(arr, x -> x - mu) AS cv FROM c),
nn AS (SELECT media_id, kind, cv,
        sqrt(list_reduce(list_transform(cv, x -> x * x), (a, b) -> a + b)) AS nrm
       FROM v),
f AS (SELECT media_id, kind,
        list_transform(cv, x -> CAST(x / nrm AS FLOAT)) AS feat FROM nn)
SELECT media_id, kind, TRUE AS ok, CAST({dim} AS BIGINT) AS dim,
       ROUND(list_reduce(list_transform(range(1, {dim + 1}),
             i -> CAST(feat[CAST(i AS INT)] AS DOUBLE) * CAST(i AS DOUBLE)),
             (a, b) -> a + b), 6) AS checksum
FROM f"""


def _hyperball_nf_sql() -> str:
    return (
        "SELECT t, nf_exact, TRUE AS est_ok FROM ("
        + td.nf_exact_sql(max_depth=4)
        + ") x"
    )


def _eff_diameter_sql(quantile: float = 0.9) -> str:
    # Mirrors algos/centrality.py nf_stats operation-for-operation:
    # exact int64 moment sums, then the identical double divisions.
    return f"""WITH nfq AS ({td.nf_exact_sql(max_depth=4)}),
agg AS (SELECT MIN(CASE WHEN t = 0 THEN nf_exact END) AS nf0,
               MAX(nf_exact) AS nflast FROM nfq),
inc AS (SELECT n.t AS t, n.nf_exact - p.nf_exact AS c
        FROM nfq n JOIN nfq p ON p.t = n.t - 1),
mom AS (SELECT SUM(t * c) AS s1, SUM(t * t * c) AS s2 FROM inc),
mv AS (SELECT CAST(s1 AS DOUBLE) / CAST(nflast - nf0 AS DOUBLE) AS mean,
              CAST(s2 AS DOUBLE) / CAST(nflast - nf0 AS DOUBLE) AS msq
       FROM mom CROSS JOIN agg),
th AS (SELECT MIN(t) AS t_hit FROM nfq CROSS JOIN agg
       WHERE CAST(nf_exact AS DOUBLE) >= {quantile} * CAST(nflast AS DOUBLE)),
ed AS (SELECT CASE WHEN th.t_hit = 0 THEN 0.0 ELSE
         CAST(th.t_hit - 1 AS DOUBLE) +
         ({quantile} * CAST(a.nflast AS DOUBLE) - CAST(p.nf_exact AS DOUBLE))
         / (CAST(c.nf_exact AS DOUBLE) - CAST(p.nf_exact AS DOUBLE)) END AS effd
       FROM th
       CROSS JOIN agg a
       JOIN nfq c ON c.t = th.t_hit
       LEFT JOIN nfq p ON p.t = th.t_hit - 1)
SELECT ROUND(mean, 9) AS avg_distance,
       ROUND((msq - mean * mean) / mean, 9) AS spid,
       ROUND(effd, 9) AS effective_diameter
FROM mv CROSS JOIN ed"""


def _sq8_topk_sql(k: int = 5) -> str:
    """DuckDB twin of sq8_topk: per-dim min/scale stats, the same
    floor-half-up quantization, dequantized vectors rebuilt as ordered
    lists so the cosine is the identical left-to-right list_reduce fold
    Spark's F.aggregate performs (bit-matched before ROUND)."""
    dot = (
        "list_reduce(list_transform(range(1, len(q.v) + 1), "
        "i -> q.v[i] * e.v[i]), (x, y) -> x + y)"
    )
    qn = (
        "sqrt(list_reduce(list_transform(range(1, len(q.v) + 1), "
        "i -> q.v[i] * q.v[i]), (x, y) -> x + y))"
    )
    en = (
        "sqrt(list_reduce(list_transform(range(1, len(e.v) + 1), "
        "i -> e.v[i] * e.v[i]), (x, y) -> x + y))"
    )
    return f"""WITH lf AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
mm AS MATERIALIZED (
  SELECT d, MIN(x) AS mn, (MAX(x) - MIN(x)) / 255.0 AS sc
  FROM lf GROUP BY d
),
dq AS MATERIALIZED (
  SELECT vec_id, lf.d,
         (CASE WHEN sc > 0 THEN LEAST(255.0, GREATEST(0.0,
              FLOOR((x - mn) / sc + 0.5))) ELSE 0.0 END) * sc + mn AS v
  FROM lf JOIN mm USING (d)
),
vecs AS MATERIALIZED (
  SELECT vec_id, list(v ORDER BY d) AS v FROM dq GROUP BY vec_id
),
q AS (SELECT * FROM vecs WHERE vec_id < 10),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         ROUND(({dot}) / (({qn}) * ({en})), 6) AS sim
  FROM vecs e CROSS JOIN q
  WHERE e.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim FROM (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored) t
WHERE rank <= {k}"""


def _cosine_sql(dim_keep: int | None = None) -> str:
    emb = (
        "embedding" if dim_keep is None else f"embedding[1:{dim_keep}]"
    )
    dot = (
        "list_reduce(list_transform(range(1, len(q.embedding) + 1), "
        "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), "
        "(a, b) -> a + b)"
    )
    qnorm = (
        "sqrt(list_reduce(list_transform(range(1, len(q.embedding) + 1), "
        "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)), "
        "(a, b) -> a + b))"
    )
    enorm = (
        "sqrt(list_reduce(list_transform(range(1, len(e.embedding) + 1), "
        "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), "
        "(a, b) -> a + b))"
    )
    return f"""WITH qsrc AS (SELECT vec_id, {emb} AS embedding FROM embeddings),
e AS (SELECT vec_id, embedding FROM qsrc),
q AS (SELECT vec_id, embedding FROM qsrc WHERE vec_id < 10),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         ROUND(({dot}) / (({qnorm}) * ({enorm})), 6) AS sim
  FROM e CROSS JOIN q
  WHERE e.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim FROM (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored) t
WHERE rank <= 5"""


def _bpe_merges_sql_lazy() -> str:
    from webgraph_spark.functions.bpe import bpe_merges_sql

    return bpe_merges_sql(BPE_MERGES)


def _bpe_tokens_sql_lazy() -> str:
    from webgraph_spark.functions.bpe import bpe_token_counts_sql

    return bpe_token_counts_sql(BPE_MERGES)


def oracle_sql() -> dict[str, str]:
    return {
        "graph_degree_dist_out": td.degree_dist_sql("out"),
        "graph_degree_dist_in": td.degree_dist_sql("in"),
        "graph_stats": td.graph_stats_sql(),
        "graph_pagerank5": td.pagerank_sql(iters=5, alpha=0.85, round_to=9),
        "graph_cc8": td.cc_sql(rounds=8),
        "graph_lp3": td.lp_sql(rounds=3),
        "graph_modularity3": td.modularity_sql(rounds=3),
        "graph_louvain2": td.louvain_sql(rounds=2),
        "graph_hitting6": td.hitting_time_sql(iters=6),
        "graph_conductance5": td.conductance_sql(rounds=3, k=5),
        "graph_triangles": td.triangles_sql(),
        "graph_doulion_triangles": td.doulion_sql(k=4),
        "graph_rmat_degrees": _rmat_sql(),
        "events_temporal_reach": _temporal_reach_sql(rounds=20),
        "graph_bfs3": td.bfs_sql(rounds=3),
        "graph_compose_cust_part": td.compose_sql(),
        "graph_quotient_nation": td.quotient_nation_sql(),
        "csr_roundtrip": f"WITH {td.EDGES_CTE} SELECT src, dst FROM edges",
        "bv_stream_roundtrip": f"WITH {td.EDGES_CTE} SELECT src, dst FROM edges",
        "bv_labelled_roundtrip": f"WITH {td.LABELLED_EDGES_CTE} SELECT src, dst, label FROM ledges",
        "bv_zeta_bits": td.zeta3_bits_sql(),
        "bv_golomb_bits": td.golomb_bits_sql(1000000),
        "bv_nibble_bits": td.nibble_bits_sql(),
        "bv_full_roundtrip": f"WITH {td.EDGES_CTE} SELECT src, dst FROM edges",
        "bvdisk_roundtrip": f"WITH {td.EDGES_CTE} SELECT src, dst FROM edges",
        "bvdisk_labelled_roundtrip":
            f"WITH {td.LABELLED_EDGES_CTE} "
            f"SELECT src, dst, CAST(label AS BIGINT) AS label FROM ledges",
        "bvdisk_fixed_label_roundtrip":
            f"WITH {td.LABELLED_EDGES_CTE} "
            f"SELECT src, dst, CAST(label AS BIGINT) AS label FROM ledges",
        "bv_full_bits": td.bv_bits_sql(),
        "bv_stream_bits": td.gamma_bits_sql(),
        "ef_roundtrip": f"WITH {td.EDGES_CTE} SELECT src, dst FROM edges",
        "ef_bits": f"""WITH {td.EDGES_CTE},
dedup AS (SELECT DISTINCT src, dst FROM edges),
uni AS (SELECT MAX(dst) + 1 AS u FROM dedup),
lists AS (
  SELECT src, COUNT(*) AS k, MAX(dst) AS maxd FROM dedup GROUP BY src
),
per AS (
  -- l = floor(log2(u/k)) via INTEGER arithmetic (bit length of u//k),
  -- matching the engine's (u // k).bit_length() - 1: no float-ulp
  -- disagreement near exact powers of two
  SELECT k, maxd,
    CASE WHEN u <= k THEN 0
         ELSE length(bin(u // k)) - 1
    END AS l
  FROM lists, uni
)
SELECT CAST(SUM(k * l + (maxd >> l) + k) AS BIGINT) AS ef_bits,
       CAST(SUM(k) AS BIGINT) AS n_arcs,
       ROUND(CAST(SUM(k * l + (maxd >> l) + k) AS DOUBLE) / SUM(k), 6) AS bits_per_link
FROM per
""",
        "graph_gamma_bits": td.gamma_bits_sql(),
        "graph_bv_bits": td.bv_bits_sql(),
        "graph_gray_gamma_bits": td.gray_gamma_bits_sql(),
        "graph_closeness_sample": td.closeness_sql(n_sources=5),
        "graph_scc_dag": td.scc_dag_sql(),
        "docs_text_stats": _text_stats_sql(),
        "docs_token_totals": f"""SELECT
  CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKS}) END) AS BIGINT) AS ws_tokens,
  CAST(SUM(len(regexp_extract_all(text, '{_BPE_RE}'))) AS BIGINT) AS bpe_tokens,
  CAST(SUM(length(text)) AS BIGINT) AS chars
FROM documents""",
        "docs_by_lang": "SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang",
        "docs_minhash_sigs": f"WITH {_SIGS_CTE} SELECT id, i, minhash FROM sigs",
        "docs_lsh_pairs": f"WITH {_PAIRS_CTE} SELECT id_a, id_b FROM pairs",
        "docs_jaccard": f"""WITH {_PAIRS_CTE},
sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT s1.id AS id_a, s2.id AS id_b, COUNT(*) AS common
  FROM sh s1 JOIN sh s2 ON s1.shingle = s2.shingle AND s1.id < s2.id
  JOIN pairs p ON p.id_a = s1.id AND p.id_b = s2.id
  GROUP BY s1.id, s2.id
)
SELECT x.id_a, x.id_b,
       ROUND(x.common / (na.n + nb.n - x.common), 6) AS jaccard
FROM inter x
JOIN sizes na ON na.id = x.id_a
JOIN sizes nb ON nb.id = x.id_b""",
        "docs_simhash": _simhash_sql(),
        "docs_dedup_clusters": f"""WITH RECURSIVE {_PAIRS_CTE},
sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT s1.id AS id_a, s2.id AS id_b, COUNT(*) AS common
  FROM sh s1 JOIN sh s2 ON s1.shingle = s2.shingle AND s1.id < s2.id
  JOIN pairs p ON p.id_a = s1.id AND p.id_b = s2.id
  GROUP BY s1.id, s2.id
),
ver AS (
  SELECT x.id_a, x.id_b
  FROM inter x
  JOIN sizes na ON na.id = x.id_a
  JOIN sizes nb ON nb.id = x.id_b
  WHERE ROUND(x.common / (na.n + nb.n - x.common), 6) >= {DEDUP_THRESHOLD}
),
dup_e AS (
  SELECT id_a AS a, id_b AS b FROM ver
  UNION ALL SELECT id_b, id_a FROM ver
),
cl AS (
  SELECT doc_id AS node, doc_id AS reach FROM documents
  UNION
  SELECT cl.node, dup_e.b FROM cl JOIN dup_e ON cl.reach = dup_e.a
),
lab AS (SELECT node AS doc_id, MIN(reach) AS canonical_id FROM cl GROUP BY node),
sz AS (SELECT canonical_id, COUNT(*) AS cluster_size FROM lab GROUP BY canonical_id)
SELECT l.doc_id, l.canonical_id, s.cluster_size
FROM lab l JOIN sz s USING (canonical_id)""",
        "emb_cosine_top5": _cosine_sql(),
        "emb_anisotropy": _similarity.anisotropy_sql(),
        "emb_label_counts": (
            "SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n "
            "FROM embeddings GROUP BY label"
        ),
        "events_hourly": """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2""",
        "events_sessions": """WITH x AS (
  SELECT user_id, ts, event_id,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT user_id,
       CAST(SUM(CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM x GROUP BY user_id""",
        # --- converged / approximate queries (round-2 oracles) ---
        "graph_pagerank_converged": td.pagerank_converged_sql(
            max_iters=35, tol=1e-6, round_to=9
        ),
        "graph_cc_converged": td.cc_sql(rounds=30),
        "graph_cc_stars": td.cc_sql(rounds=30),
        "emb_ann_lsh_top5": _ann_lsh_sql(),
        "emb_ann_recall5": f"""WITH ex AS (
  SELECT query_id, neighbor_id FROM ({_cosine_sql()}) t1
), ap AS (
  SELECT query_id, neighbor_id, 1 AS hit FROM ({_ann_lsh_sql()}) t2
)
SELECT COUNT(*) AS exact_pairs,
       CAST(COALESCE(SUM(ap.hit), 0) AS BIGINT) AS hits,
       ROUND(CAST(COALESCE(SUM(ap.hit), 0) AS DOUBLE) / COUNT(*), 6) AS recall_at_k
FROM ex LEFT JOIN ap USING (query_id, neighbor_id)""",
        "multimodal_features": _multimodal_sql(n=48, dim=16),
        "transcript_graph_pagerank": td.transcript_pipeline_sql(iters=10),
        "graph_hyperball_nf": _hyperball_nf_sql(),
        "graph_hyperball_wide_nf": _hyperball_nf_sql(),
        "graph_harmonic_approx": td.harmonic_all_sql(max_depth=4),
        "graph_topk_harmonic": td.topk_harmonic_sql(k=10, max_depth=4),
        "graph_betweenness": td.betweenness_sql(n_sources=100, max_depth=4),
        "emb_near_dups": _near_dups_sql(),
        "emb_dedup_clusters": _emb_clusters_sql(),
        "emb_ivf_top5": _ivf_sql(),
        "emb_ivf_recall5": f"""WITH ex AS (
  SELECT query_id, neighbor_id FROM ({_cosine_sql()}) t1
), ap AS (
  SELECT query_id, neighbor_id, 1 AS hit FROM ({_ivf_sql()}) t2
)
SELECT COUNT(*) AS exact_pairs,
       CAST(COALESCE(SUM(ap.hit), 0) AS BIGINT) AS hits,
       ROUND(CAST(COALESCE(SUM(ap.hit), 0) AS DOUBLE) / COUNT(*), 6) AS recall_at_k
FROM ex LEFT JOIN ap USING (query_id, neighbor_id)""",
        "emb_sq8_top5": _sq8_topk_sql(k=5),
        "emb_sq8_recall5": f"""WITH ex AS (
  SELECT query_id, neighbor_id FROM ({_cosine_sql()}) t1
), ap AS (
  SELECT query_id, neighbor_id, 1 AS hit FROM ({_sq8_topk_sql(k=5)}) t2
)
SELECT COUNT(*) AS exact_pairs,
       CAST(COALESCE(SUM(ap.hit), 0) AS BIGINT) AS hits,
       ROUND(CAST(COALESCE(SUM(ap.hit), 0) AS DOUBLE) / COUNT(*), 6) AS recall_at_k
FROM ex LEFT JOIN ap USING (query_id, neighbor_id)""",
        "emb_pq_top5": _pq_sql(k_nn=5, m=8, kc=8, iters=2, dim=64),
        "emb_pq_recall5": f"""WITH ex AS (
  SELECT query_id, neighbor_id FROM ({_cosine_sql()}) t1
), ap AS (
  SELECT query_id, neighbor_id, 1 AS hit FROM ({_pq_sql(k_nn=5, m=8, kc=8, iters=2, dim=64)}) t2
)
SELECT COUNT(*) AS exact_pairs,
       CAST(COALESCE(SUM(ap.hit), 0) AS BIGINT) AS hits,
       ROUND(CAST(COALESCE(SUM(ap.hit), 0) AS DOUBLE) / COUNT(*), 6) AS recall_at_k
FROM ex LEFT JOIN ap USING (query_id, neighbor_id)""",
        "emb_semdedup": _clustering.semdedup_sql(k=4, iters=3, eps=0.33, dim=64),
        # --- round-3 transform/source/sampling twins ---
        "graph_union_transpose": td.union_transpose_sql(),
        "graph_line_graph": td.line_graph_sql(),
        "graph_induced_subgraph": td.induced_subgraph_sql(),
        "graph_degree_range": td.degree_range_sql(1, 8),
        "graph_mask_interval": td.mask_interval_sql(31),
        "graph_lex_gamma_bits": td.lex_gamma_bits_sql(),
        "graph_llp_gamma_bits": td.llp_gamma_bits_sql(gammas=(0.0, 0.5), rounds=2),
        "graph_ppr5": td.ppr_sql(iters=5, alpha=0.85, n_seeds=10, round_to=9),
        "graph_hits8": td.hits_sql(iterations=8, round_to=9),
        "graph_katz8": td.katz_sql(alpha=0.1, beta=1.0, iterations=8, round_to=9),
        "graph_distance_cdf": td.distance_cdf_sql(n_sources=5),
        "graph_eff_diameter": _eff_diameter_sql(quantile=0.9),
        "events_scattered_arcs": td.scattered_arcs_events_sql(),
        "events_user_projection": f"""WITH ua AS (
  SELECT DISTINCT user_id AS u, {_PROJ_ATTR_SQL} AS a FROM events
)
SELECT x.u AS src, y.u AS dst, CAST(COUNT(*) AS BIGINT) AS weight
FROM ua x JOIN ua y ON x.a = y.a AND x.u < y.u
GROUP BY x.u, y.u HAVING COUNT(*) >= 7""",
        "graph_truss4": _truss4_sql(),
        "graph_msf": td.msf_sql(rounds=6, jumps=12),
        "graph_mis": td.mis_sql(rounds=5),
        "graph_densest": td.densest_sql(rounds=4),
        "graph_local_cluster": td.local_cluster_sql(iters=5, n_seeds=10, max_candidates=300),
        "graph_matching": td.matching_sql(rounds=6),
        "graph_coloring": td.coloring_sql(rounds=14),
        "graph_partition4": td.partition_sql(k=4, rounds=4, slack_pct=5),
        "graph_partition_quality": td.partition_quality_sql(
            k=4, rounds=4, slack_pct=5
        ),
        "graph_landmark_sketch": td.landmark_sketch_sql(
            n_landmarks=3, max_depth=4
        ),
        "graph_landmark_est": td.landmark_estimate_sql(
            n_landmarks=3, max_depth=4, n_cands=20
        ),
        "graph_rich_club": _rich_club_sql(),
        "graph_rich_club_norm": _rich_club_norm_sql(),
        "docs_dsir_weights": _dsir_weights_sql(),
        "docs_dsir_sample": _dsir_sample_sql(k=50),
        "graph_bowtie": td.bowtie_sql(max_depth=12),
        "events_funnel3": _events_funnel_sql(),
        "events_retention": _events_retention_sql(),
        "graph_transitivity": _transitivity_sql(),
        "docs_langid_trained": _langid_sql_cached(),
        "graph_attack_tolerance": td.attack_tolerance_sql(
            ks=[0, 10, 50], rounds=30
        ),
        "graph_fiedler": td.fiedler_sql(iters=12, round_to=6),
        "graph_oddball": _oddball_sql(),
        "graph_trustrank": td.trustrank_sql(
            n_seeds=20, inv_iters=5, iters=8
        ),
        "events_anomaly_z": _events_anomaly_sql(),
        "emb_trunc_top5": _cosine_sql(dim_keep=16),
        "emb_trunc_recall5": f"""WITH ex AS (
  SELECT query_id, neighbor_id FROM ({_cosine_sql()}) t1
), ap AS (
  SELECT query_id, neighbor_id, 1 AS hit FROM ({_cosine_sql(dim_keep=16)}) t2
)
SELECT COUNT(*) AS exact_pairs,
       CAST(COALESCE(SUM(ap.hit), 0) AS BIGINT) AS hits,
       ROUND(CAST(COALESCE(SUM(ap.hit), 0) AS DOUBLE) / COUNT(*), 6) AS recall_at_k
FROM ex LEFT JOIN ap USING (query_id, neighbor_id)""",
        "transcript_role_bigrams": _mining.transition_counts_sql(
            source_cte="seq AS MATERIALIZED (SELECT user_id AS g, event_id AS o, event_type AS lab FROM events)",
        ),
        "events_graph_diff": """WITH b AS (
  SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid FROM events
),
a AS MATERIALIZED (
  SELECT DISTINCT user_id AS src,
         event_type || ':' || json_extract_string(props, '$.k') AS dst
  FROM events, b WHERE epoch_us(ts) < mid
),
bb AS MATERIALIZED (
  SELECT DISTINCT user_id AS src,
         event_type || ':' || json_extract_string(props, '$.k') AS dst
  FROM events, b WHERE epoch_us(ts) >= mid
),
j AS (
  SELECT CAST(SUM(CASE WHEN a.src IS NOT NULL AND bb.src IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS arcs_retained,
         CAST(SUM(CASE WHEN a.src IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS arcs_added,
         CAST(SUM(CASE WHEN bb.src IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS arcs_removed
  FROM a FULL OUTER JOIN bb USING (src, dst)
)
SELECT arcs_retained, arcs_added, arcs_removed,
       CASE WHEN arcs_retained + arcs_added + arcs_removed > 0
            THEN ROUND(CAST(arcs_retained AS DOUBLE)
                       / (arcs_retained + arcs_added + arcs_removed), 6)
            ELSE 0.0 END AS jaccard
FROM j""",
        "events_degree_churn": """WITH b AS (
  SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid FROM events
),
d0 AS (
  SELECT src, COUNT(*) AS deg0 FROM (
    SELECT DISTINCT user_id AS src,
           event_type || ':' || json_extract_string(props, '$.k') AS dst
    FROM events, b WHERE epoch_us(ts) < mid) GROUP BY src
),
d1 AS (
  SELECT src, COUNT(*) AS deg1 FROM (
    SELECT DISTINCT user_id AS src,
           event_type || ':' || json_extract_string(props, '$.k') AS dst
    FROM events, b WHERE epoch_us(ts) >= mid) GROUP BY src
),
j AS (
  SELECT COALESCE(d0.src, d1.src) AS node,
         CAST(COALESCE(deg0, 0) AS BIGINT) AS deg_before,
         CAST(COALESCE(deg1, 0) AS BIGINT) AS deg_after
  FROM d0 FULL OUTER JOIN d1 ON d0.src = d1.src
)
SELECT node, deg_before, deg_after,
       CAST(deg_after - deg_before AS BIGINT) AS delta
FROM j
ORDER BY ABS(deg_after - deg_before) DESC, node ASC
LIMIT 10""",
        "docs_sample_stratified": td.stratified_sample_sql(20),
        "docs_contamination": f"""WITH {_SHINGLES_CTE},
ev AS (SELECT id AS eval_id, shingle FROM sh WHERE id < 40),
evn AS (SELECT eval_id, COUNT(*) AS n_ev FROM ev GROUP BY eval_id),
s2 AS (SELECT t.id AS train_id, e.eval_id, COUNT(*) AS shared_shingles
       FROM sh t JOIN ev e USING (shingle)
       WHERE t.id <> e.eval_id
       GROUP BY t.id, e.eval_id
       HAVING COUNT(*) >= 2)
SELECT train_id, eval_id, CAST(shared_shingles AS BIGINT) AS shared_shingles,
       ROUND(CAST(shared_shingles AS DOUBLE) / n_ev, 6) AS containment
FROM s2 JOIN evn USING (eval_id)""",
        "docs_hash_split": f"""WITH h AS (
  SELECT text,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
          % 1000000) AS hb
  FROM documents),
s AS (SELECT CASE WHEN hb < 800000 THEN 'train'
                  WHEN hb < 900000 THEN 'val'
                  WHEN hb < 1000000 THEN 'test' END AS split, text FROM h)
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len({_TOKS}) END) AS BIGINT) AS ws_tokens
FROM s GROUP BY split""",
        "docs_mixture_sample": f"""WITH tk AS (
  SELECT doc_id, source,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len({_TOKS}) END AS n_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hk
  FROM documents),
sel AS (SELECT source, n_tokens,
          COALESCE(SUM(n_tokens) OVER (
            PARTITION BY source ORDER BY hk, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
        FROM tk)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens
FROM sel WHERE excl < 3000 GROUP BY source""",
        "docs_pack_chunks": f"""WITH tk AS (
  SELECT doc_id, lang,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len({_TOKS}) END AS n_tokens
  FROM documents),
b AS (SELECT lang, n_tokens,
        CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             / 2048.0) AS BIGINT) AS batch_id
      FROM tk)
SELECT lang, batch_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens
FROM b GROUP BY lang, batch_id""",
        "docs_repetition": """WITH base AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks,
         len(string_split_regex(trim(text), '\\s+')) AS n
  FROM documents),
bi AS (
  SELECT doc_id, g, COUNT(*) AS c FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, n),
                  i -> array_to_string(toks[i:i+1], ' '))) AS g
    FROM base WHERE n >= 2) t GROUP BY doc_id, g),
bia AS (SELECT doc_id, MAX(c) AS top2 FROM bi GROUP BY doc_id),
tri AS (
  SELECT doc_id, g, COUNT(*) AS c FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, n - 1),
                  i -> array_to_string(toks[i:i+2], ' '))) AS g
    FROM base WHERE n >= 3) t GROUP BY doc_id, g),
tria AS (SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup3,
                SUM(c) AS tot3 FROM tri GROUP BY doc_id),
fr AS (
  SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens,
    ROUND(COALESCE((2 * bia.top2) / CAST(b.n AS DOUBLE), 0.0), 6)
      AS top_bigram_frac,
    ROUND(COALESCE(tria.dup3 / CAST(tria.tot3 AS DOUBLE), 0.0), 6)
      AS dup_trigram_frac
  FROM base b LEFT JOIN bia ON b.doc_id = bia.doc_id
              LEFT JOIN tria ON b.doc_id = tria.doc_id)
SELECT doc_id, n_tokens, top_bigram_frac, dup_trigram_frac,
  CAST(CASE WHEN top_bigram_frac > 0.18 OR dup_trigram_frac > 0.30
       THEN 1 ELSE 0 END AS BIGINT) AS repetitive
FROM fr""",
        "docs_window_dedup": """WITH base AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks,
         len(string_split_regex(trim(text), '\\s+')) AS n
  FROM documents),
occ AS (
  SELECT doc_id,
         unnest(list_transform(range(1, n - 6),
                i -> md5(array_to_string(toks[i:i+7], ' ')))) AS h
  FROM base WHERE n >= 8),
cnt AS (SELECT doc_id, h, COUNT(*) OVER (PARTITION BY h) AS c FROM occ),
per AS (SELECT doc_id, COUNT(*) AS n_windows,
               SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS dup_windows
        FROM cnt GROUP BY doc_id)
SELECT b.doc_id,
  CAST(COALESCE(per.n_windows, 0) AS BIGINT) AS n_windows,
  CAST(COALESCE(per.dup_windows, 0) AS BIGINT) AS dup_windows,
  ROUND(COALESCE(per.dup_windows / CAST(per.n_windows AS DOUBLE), 0.0), 6)
    AS dup_frac
FROM base b LEFT JOIN per ON b.doc_id = per.doc_id""",
        "docs_bpe_merges": _bpe_merges_sql_lazy(),
        "docs_bpe_tokens": _bpe_tokens_sql_lazy(),
        "graph_compose_minplus": td.compose_minplus_sql(),
        "graph_union_labelled": td.union_labelled_boost_sql(),
        "graph_seeded_perm": td.seeded_perm_sql(seed=42),
        "graph_ecc_sample": td.ecc_sample_sql(n_sources=5),
        "graph_kcore5": _kcore_sql(k=5, rounds=8),
        "docs_pii_scrub": _pii_sql(),
        "graph_coreness": _coreness_sql(rounds=10),
        "graph_extract_component": td.extract_component_sql(rounds=8),
        "graph_hostgray_gamma_bits": td.gray_gamma_bits_sql(
            group_expr=f"CAST(FLOOR(node / {td.OFF_ORDER}) AS BIGINT)"
        ),
        "graph_random_walks": _random_walks_sql(),
        "graph_simrank_top20": _simrank_sql(),
        "graph_node2vec_walks": _node2vec_sql(),
        "graph_wl_labels": _wl_sql(),
        "graph_link_prediction": _link_prediction_sql(),
        "graph_clustering_coeff": _clustering_sql(),
        "graph_assortativity": _assortativity_sql(),
        "graph_avg_nbr_degree": f"""WITH {td.EDGES_CTE},{td.SYM_CTE},
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM sym GROUP BY src)
SELECT s.src AS node, CAST(COUNT(*) AS BIGINT) AS deg,
       ROUND(SUM(b.deg) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_nbr_deg
FROM sym s JOIN deg b ON s.dst = b.src
GROUP BY s.src""",
        "graph_sssp6": td.sssp_sql(rounds=6, source_pred="node < 100"),
        "graph_dag_layers": td.dag_layers_sql(rounds=4),
        "graph_eigenvector8": td.eigenvector_sql(iters=8, round_to=9),
        "graph_salsa4": td.salsa_sql(iters=4, round_to=9),
        "docs_bm25_top10": _retrieval.bm25_topk_sql(BM25_QUERY_TERMS, k=10),
        "docs_hybrid_rrf_top10": _retrieval.hybrid_rrf_sql(
            BM25_QUERY_TERMS, query_vec_id=0, k=10, pool=50
        ),
        "docs_bigram_lm": _retrieval.bigram_lm_sql(),
        "docs_ngram_topk": _retrieval.ngram_topk_sql(n=3, k=20),
        "emb_kmeans": (
            "SELECT id AS vec_id, cluster, dist FROM ("
            + _clustering.kmeans_assign_sql(k=4, iters=3)
            + ")"
        ),
        "events_hll_users": _sketches.hll_approx_distinct_sql(
            "events", ["event_type"], "user_id", log2m=8
        ),
        "transcript_tool_pairs": _mining.cooccurrence_sql(
            "src AS (SELECT CAST(user_id AS VARCHAR) AS g, "
            "CASE WHEN event_id % 3 = 0 THEN event_type ELSE NULL END AS it "
            "FROM events)"
        ),
        "transcript_tool_markov": td.transcript_tool_markov_sql(iters=8),
        "transcript_turn_latency": td.transcript_turn_latency_sql(),
        "transcript_context_pack": td.transcript_context_pack_sql(
            budget=PACK_BUDGET
        ),
        "transcript_role_assortativity": td.transcript_role_assortativity_sql(),
        "transcript_conv_stats": td.transcript_conv_stats_sql(),
        "transcript_pattern_dups": _pattern_dups_sql(),
        "transcript_role_diversity": _role_diversity_sql(),
        "graph_ck_curve": _ck_curve_sql(),
        "events_burstiness": _events_burstiness_sql(),
        "docs_containment": f"""WITH {_PAIRS_CTE},
sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT s1.id AS id_a, s2.id AS id_b, COUNT(*) AS common
  FROM sh s1 JOIN sh s2 ON s1.shingle = s2.shingle AND s1.id < s2.id
  JOIN pairs p ON p.id_a = s1.id AND p.id_b = s2.id
  GROUP BY s1.id, s2.id
)
SELECT x.id_a, x.id_b,
       ROUND(x.common / na.n, 6) AS c_ab,
       ROUND(x.common / nb.n, 6) AS c_ba,
       ROUND(GREATEST(x.common / na.n, x.common / nb.n), 6) AS containment
FROM inter x
JOIN sizes na ON na.id = x.id_a
JOIN sizes nb ON nb.id = x.id_b""",
        "emb_centroid_confusion": _clustering.centroid_classify_sql(),
        "graph_random_failure": td.random_failure_sql(
            permilles=[0, 200, 500]
        ),
        "docs_zipf_slope": _zipf_slope_sql(),
        "emb_pca_top": _similarity.pca_top_sql(),
        "events_gini": _events_gini_sql(),
        "events_degree_ks": _events_degree_ks_sql(),
        "docs_curation_funnel": _curation_funnel_sql(),
        "graph_triad_census": _motifs.triad_census_sql(td.EDGES_CTE),
        "graph_dir_triangle_profile": _motifs.directed_triangle_profile_sql(
            td.EDGES_CTE
        ),
        "graph_dir_clustering": _motifs.directed_clustering_sql(
            td.EDGES_CTE
        ),
        "graph_triangle_participation": _triangle_participation_sql(),
        "graph_assortativity_dir": _assortativity_dir_sql(),
        "emb_kmeans_silhouette": _clustering.kmeans_silhouette_sql(
            k=4, iters=3
        ),
        "docs_minhash_estimate": _minhash_estimate_sql(),
        "transcript_tool_latency": _tool_latency_sql(),
        "transcript_dup_turns": _dup_turns_sql(),
        "events_seasonality": _events_seasonality_sql(),
        "graph_core_pagerank_share": _core_pagerank_share_sql(),
        "docs_source_report": _source_report_sql(),
        "events_type_markov": _events_type_markov_sql(),
        "docs_source_overlap": _source_overlap_sql(),
        "graph_cc_size_dist": _cc_size_dist_sql(),
        "graph_strength_dist": _strength_dist_sql(),
        "emb_label_tightness": _label_tightness_sql(),
        "docs_length_hist": _length_hist_sql(),
        "graph_core_sizes": _core_sizes_sql(),
        "transcript_len_latency_corr": _len_latency_corr_sql(),
        "events_hourly_autocorr": _hourly_autocorr_sql(),
        "docs_heaps_points": _heaps_points_sql(),
        "emb_sq8_error": _sq8_error_sql(),
        "graph_rw_sample": _rw_sample_sql(),
        "events_conversion_lag_quantiles": _conversion_lag_quantiles_sql(),
        "graph_weighted_clustering": _weighted_clustering_sql(),
        "graph_onion_layers": _onion_sql(),
        "graph_algebraic_connectivity": _algebraic_connectivity_sql(),
        "graph_two_hop_hist": _two_hop_hist_sql(),
        "docs_simhash_pairs": _simhash_pairs_sql(),
        "graph_wpagerank5": td.wpagerank_sql(iters=5, alpha=0.85, round_to=9),
        "events_heavy_hitters": _sketches.count_min_topk_sql(
            "events", "user_id", d=4, w=32, k=10, seed=HASH_SEED
        ),
        "graph_cocitation2": f"""WITH {td.EDGES_CTE},
e AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
p AS (SELECT l.dst AS a, r.dst AS b
      FROM e l JOIN e r ON l.src = r.src AND l.dst < r.dst)
SELECT a, b, CAST(COUNT(*) AS BIGINT) AS common
FROM p GROUP BY a, b HAVING COUNT(*) >= 2""",
        "graph_quad_count": f"""WITH {td.EDGES_CTE},
d AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
und AS (SELECT src, dst FROM d UNION SELECT dst, src FROM d),
p AS (SELECT l.dst AS a, r.dst AS b
      FROM und l JOIN und r ON l.src = r.src AND l.dst < r.dst),
cn AS (SELECT a, b, COUNT(*) AS c FROM p GROUP BY a, b)
SELECT CAST(SUM(c * (c - 1)) / 4 AS BIGINT) AS quads FROM cn""",
        "graph_reciprocity": f"""WITH {td.EDGES_CTE},
base AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst FROM edges WHERE dst % 2 = 0
),
e AS (SELECT DISTINCT src, dst FROM base WHERE src <> dst),
m AS (SELECT e.src, e.dst FROM e
      WHERE EXISTS (SELECT 1 FROM e r
                    WHERE r.src = e.dst AND r.dst = e.src))
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS arcs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS mutual_arcs,
       ROUND((SELECT COUNT(*) FROM m) * 1.0 /
             (SELECT COUNT(*) FROM e), 6) AS reciprocity""",
        "graph_reciprocity_rho": f"""WITH {td.EDGES_CTE},
base AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst FROM edges WHERE dst % 2 = 0
),
e AS (SELECT DISTINCT src, dst FROM base WHERE src <> dst),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM
       (SELECT src AS v FROM e UNION SELECT dst FROM e) z),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
mu AS (SELECT CAST(COUNT(*) AS BIGINT) AS mut FROM e
       WHERE EXISTS (SELECT 1 FROM e r
                     WHERE r.src = e.dst AND r.dst = e.src))
SELECT nn.n AS n_nodes, mm.m AS arcs, mu.mut AS mutual_arcs,
       ROUND(mu.mut * 1.0 / mm.m, 6) AS r,
       ROUND(mm.m * 1.0 / (nn.n * (nn.n - 1)), 6) AS a,
       ROUND((mu.mut * 1.0 / mm.m - mm.m * 1.0 / (nn.n * (nn.n - 1)))
             / (1.0 - mm.m * 1.0 / (nn.n * (nn.n - 1))), 6) AS rho
FROM nn, mm, mu""",
        "graph_transitivity_null": _transitivity_null_sql(),
        "graph_pagerank_localization": _pagerank_localization_sql(),
        "graph_inout_degree_corr": f"""WITH {td.EDGES_CTE},
dout AS (SELECT src AS v, COUNT(*) AS o FROM edges GROUP BY 1),
din AS (SELECT dst AS v, COUNT(*) AS i FROM edges GROUP BY 1),
d AS (SELECT COALESCE(o, 0) AS o, COALESCE(i, 0) AS i
      FROM dout FULL OUTER JOIN din USING (v)),
mom AS (SELECT COUNT(*) AS n, SUM(o) AS so, SUM(i) AS si,
               SUM(o * o) AS soo, SUM(i * i) AS sii,
               SUM(o * i) AS soi FROM d)
SELECT CAST(n AS BIGINT) AS n_nodes,
       ROUND(CAST(n * soi - so * si AS DOUBLE)
             / SQRT(CAST(n * soo - so * so AS DOUBLE)
                    * CAST(n * sii - si * si AS DOUBLE)), 6) AS corr_in_out
FROM mom""",
        "graph_hub_dominance": f"""WITH {td.EDGES_CTE},
e2 AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
deg AS (SELECT v, COUNT(*) AS d FROM
        (SELECT src AS v FROM e2 UNION ALL SELECT dst FROM e2) z
        GROUP BY v),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
ranked AS (SELECT v, ROW_NUMBER() OVER (ORDER BY d DESC, v) AS rk FROM deg),
top AS (SELECT v FROM ranked, nn WHERE rk <= CEIL(n / 100.0)),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e2),
ha AS (SELECT CAST(COUNT(*) AS BIGINT) AS ha FROM e2 e
       WHERE e.src IN (SELECT v FROM top)
          OR e.dst IN (SELECT v FROM top))
SELECT nn.n AS n_nodes,
       CAST(CEIL(nn.n / 100.0) AS BIGINT) AS k_top,
       mm.m AS arcs, ha.ha AS hub_arcs,
       CAST((2 * ha.ha * 1000000 + mm.m) // (2 * mm.m) AS DOUBLE) / 1000000.0
         AS hub_share
FROM nn, mm, ha""",
        "docs_logreg_score": _mlscore.logreg_sql(
            "documents", lr=1.0, iters=8
        ),
        "docs_tfidf_pairs": _retrieval.tfidf_pair_similarity_sql(min_sim=0.85),
        "graph_sage_features": _features.neighborhood_mean_sql(
            td.EDGES_CTE, node_mod=500
        ),
        "events_value_quantiles": _sketches.histogram_quantiles_sql(
            "events", "value", [0.1, 0.25, 0.5, 0.75, 0.9, 0.99], bins=256
        ),
        "events_decay_pagerank": td.wpagerank_sql(
            iters=5,
            alpha=0.85,
            round_to=9,
            ledges_cte=f"""
ledges AS MATERIALIZED (
  SELECT src, dst, CAST(SUM(w) AS BIGINT) AS label FROM (
    SELECT user_id AS src,
           1000000000 + ({_md5_sql('event_type')}) % 1000000 AS dst,
           1000 // (CAST(1 AS BIGINT) << LEAST(
             date_diff('day', CAST(ts AS DATE),
               (SELECT MAX(CAST(ts AS DATE)) FROM events)) // 7, 10)) AS w
    FROM events) t
  GROUP BY src, dst
)""",
        ),
        "graph_powerlaw_alpha": f"""WITH {td.EDGES_CTE},
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src)
SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
       ROUND(1.0 + COUNT(*) / SUM(ln(d / 0.5)), 6) AS alpha
FROM deg""",
    }
