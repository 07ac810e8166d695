"""Text graph sources/sinks — the reference's ASCII format family.

| reference | format | here |
|---|---|---|
| ArcListASCIIGraph (ArcListASCIIGraph.java:53-62) | one ``src<TAB>dst`` per line | read_arclist / write_arclist |
| ShiftedByOneArcListASCIIGraph (...:30-40) | same, 1-based ids | shift=1 |
| ASCIIGraph (ASCIIGraph.java:56-63) | line i = successor list of node i; first line = n | read_asciigraph / write_asciigraph |
| ScatteredArcsASCIIGraph (ScatteredArcsASCIIGraph.java:60-140) | unordered arcs, arbitrary string/64-bit ids -> dense dictionary; optional symmetrize/de-loop | read_scattered_arcs |

All readers produce the canonical edge DataFrame; the scattered reader
also returns the id dictionary (the ``.ids`` side file analog).
Deterministic dictionary order replaces first-appearance order
(SURVEY.md §1.4) so results are stable at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..util.ids import assign_dense_ids


def read_arclist(
    spark: SparkSession, path: str, sep: str = "\t", shift: int = 0
) -> DataFrame:
    """src/dst per line; ``shift`` subtracted from both (1-based inputs
    use shift=1, the ShiftedByOne variant)."""
    df = (
        spark.read.csv(path, sep=sep, comment="#")
        .toDF("src", "dst")
        .select(
            (F.col("src").cast("long") - shift).alias("src"),
            (F.col("dst").cast("long") - shift).alias("dst"),
        )
    )
    return df


def write_arclist(edges: DataFrame, path: str, sep: str = "\t") -> None:
    edges.select(
        F.concat_ws(sep, F.col("src").cast("string"), F.col("dst").cast("string")).alias(
            "value"
        )
    ).write.mode("overwrite").text(path)


def read_asciigraph(spark: SparkSession, path: str) -> DataFrame:
    """ASCIIGraph: first line n, line i+1 = space-separated successors of
    node i. The format is line-POSITIONAL, so the reader recovers global
    line numbers with ``textFile(...).zipWithIndex()`` (stable file
    order per split + one partition-count pass) and then the parse is
    fully distributed: node id = line index − 1, successors exploded
    from the split line. No driver-side collect — a positional file of
    10^9 lines parses like any other text source."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    lines = spark.createDataFrame(rdd, "line string, idx long")
    n = int(lines.where(F.col("idx") == 0).head()["line"].strip())
    toks = F.filter(
        F.split(F.trim("line"), r"\s+"), lambda x: x != F.lit("")
    )
    return (
        lines.where((F.col("idx") >= 1) & (F.col("idx") <= n))
        .select(
            (F.col("idx") - 1).alias("src"),
            F.explode(toks).alias("d"),
        )
        .select("src", F.col("d").cast("long").alias("dst"))
    )


def write_asciigraph(edges: DataFrame, path: str, num_nodes: int | None = None) -> None:
    """Inverse of read_asciigraph (driver-side; fixture scale)."""
    rows = edges.groupBy("src").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("dst")), lambda x: x.cast("string")
            ),
            " ",
        ).alias("succ")
    ).collect()
    by_src = {r.src: r.succ for r in rows}
    if num_nodes is None:
        mx = edges.agg(F.greatest(F.max("src"), F.max("dst"))).collect()[0][0]
        num_nodes = int(mx) + 1 if mx is not None else 0
    import os

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "graph.ascii"), "w") as f:
        f.write(f"{num_nodes}\n")
        for i in range(num_nodes):
            f.write(str(by_src.get(i, "")) + "\n")


def read_scattered_arcs(
    spark: SparkSession,
    path: str,
    sep: str = "\t",
    symmetrize: bool = False,
    no_loops: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Arbitrary-id arc list FILE -> (edges with dense ids, dictionary).

    Options mirror ScatteredArcsASCIIGraph.java:87-89 (symmetrize,
    de-loop at ingest); see :func:`scattered_arcs_from_df` for the
    dictionary contract.
    """
    raw = spark.read.csv(path, sep=sep, comment="#").toDF("rsrc", "rdst")
    return scattered_arcs_from_df(raw, symmetrize=symmetrize, no_loops=no_loops)


def scattered_arcs_from_df(
    raw: DataFrame,
    symmetrize: bool = False,
    no_loops: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Arbitrary-id arc table ``(rsrc, rdst)`` -> (edges with dense ids,
    dictionary).

    Dictionary: (raw_id string, node_id long), ordered by raw_id — the
    deterministic replacement for the reference's first-appearance order
    (ScatteredArcsASCIIGraph.java:60-86; SURVEY.md §1.4 determinism
    rule). De-loop happens BEFORE symmetrize, matching the reference's
    ingest order.
    """
    raw = raw.select(
        F.col("rsrc").cast("string").alias("rsrc"),
        F.col("rdst").cast("string").alias("rdst"),
    )
    ids = (
        raw.select(F.col("rsrc").alias("raw_id"))
        .unionByName(raw.select(F.col("rdst").alias("raw_id")))
        .distinct()
    )
    dic = assign_dense_ids(ids, ["raw_id"], id_col="node_id")
    e = (
        raw.join(dic.withColumnRenamed("raw_id", "rsrc"), "rsrc")
        .withColumnRenamed("node_id", "src")
        .join(dic.withColumnRenamed("raw_id", "rdst"), "rdst")
        .withColumnRenamed("node_id", "dst")
        .select("src", "dst")
    )
    if no_loops:
        e = e.where(F.col("src") != F.col("dst"))
    if symmetrize:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return e.distinct(), dic
