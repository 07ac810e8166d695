"""CSR block packing: the BVGraph storage analog as a columnar kernel.

Reference physical layout (BVGraph.java:139-196): per-node records with
gap-coded residuals — first residual zig-zag(succ - x) (Fast.int2nat,
BVGraph.java:2198), rest ``succ[i] - succ[i-1] - 1`` (BVGraph.java:2202)
— plus an offsets stream (row pointers). Per SURVEY.md §1.2 the Spark
translation keeps gap+delta as int64 numpy buffers inside per-partition
CSR blocks and delegates entropy coding to Parquet encodings + zstd
(reference-copy blocks and intervalization are compression refinements
the columnar layer approximates).

Block table schema (one row per node-range block; the .graph/.offsets
pair of BVGraph.java:97-101 becomes columns):

    block_id   long     -- ordinal of the node range
    node_lo    long     -- min src in block  (partition pruning)
    node_hi    long     -- max src in block
    n_lists    long     -- number of non-empty successor lists
    n_arcs     long     -- total arcs in block
    srcs       binary   -- int64[n_lists]  distinct sources, sorted
    counts     binary   -- int64[n_lists]  outdegrees (indptr = cumsum)
    firsts     binary   -- int64[n_lists]  first successor per list
    gaps       binary   -- int64[n_arcs - n_lists] successor gaps - 1

Arc-balanced block bounds come from quantiles of the edge table's src
column (each edge row is one arc, so equal-frequency src quantiles are
equal-ARC node ranges) — the EliasFanoCumulativeOutdegreeList.skipTo
work-splitting idea (algo/EliasFanoCumulativeOutdegreeList.java:27-41,
used by HyperBall.java:864-871) expressed as a one-line approxQuantile.

Pack/unpack are Arrow-vectorized (applyInPandas / mapInPandas, pure
numpy inside); round-trip equality is the test oracle (the reference's
compress->reload->assertEquals pattern, BVGraphTest.java:51-100).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

CSR_SCHEMA = (
    "block_id long, node_lo long, node_hi long, n_lists long, n_arcs long, "
    "srcs binary, counts binary, firsts binary, gaps binary, labels binary"
)


def arc_balanced_bounds(edges: DataFrame, num_blocks: int) -> list[int]:
    """Node-range split points such that blocks carry ~equal ARCS (not
    equal nodes) — hub-skew control for pack/iterate work assignment."""
    if num_blocks <= 1:
        return []
    qs = [i / num_blocks for i in range(1, num_blocks)]
    bounds = edges.stat.approxQuantile("src", qs, 0.001)
    # dedupe (heavy hubs can repeat a bound); keep strictly increasing
    out: list[int] = []
    for b in bounds:
        ib = int(b)
        if not out or ib > out[-1]:
            out.append(ib)
    return out


def _block_expr(bounds: list[int]):
    """block_id column: searchsorted(bounds, src, side='right') as a
    small fold expression (bounds is tiny; the per-row cost is O(B) in
    expression form — fine for B up to a few hundred; larger B should
    pre-compute block ids in the upstream kernel)."""
    if not bounds:
        return F.lit(0).cast("long")
    arr = F.array(*[F.lit(int(b)) for b in bounds])
    return F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.when(F.col("src") > b, 1).otherwise(0),
    )


def pack_csr(
    edges: DataFrame,
    num_blocks: int | None = None,
    bounds: list[int] | None = None,
    label_col: str | None = None,
) -> DataFrame:
    """Pack ``edges(src, dst[, label])`` into the CSR block table.

    Upholds the ImmutableGraph invariant: successor lists are strictly
    increasing (duplicates collapse; the reference encoder throws on
    repeats, BVGraph.java:2201 — we dedupe, matching distinct()).

    ``label_col`` (int64) rides as a parallel per-arc array in the same
    (src, dst) order — the ArcLabelledImmutableGraph analog
    (BitStreamArcLabelledImmutableGraph.java: labels stored alongside the
    successor stream). Duplicate (src, dst) keep the MIN label.
    """
    spark = edges.sparkSession
    if bounds is None:
        if num_blocks is None:
            num_blocks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        bounds = arc_balanced_bounds(edges, num_blocks)

    cols = ["src", "dst"] + ([label_col] if label_col else [])
    tagged = edges.select(*cols).withColumn("block_id", _block_expr(bounds))

    def pack(key, pdf):
        block_id = int(key[0])
        src = pdf["src"].to_numpy(np.int64)
        dst = pdf["dst"].to_numpy(np.int64)
        lab = pdf[label_col].to_numpy(np.int64) if label_col else None
        order = (
            np.lexsort((lab, dst, src)) if lab is not None else np.lexsort((dst, src))
        )
        src, dst = src[order], dst[order]
        if lab is not None:
            lab = lab[order]
        # dedupe (src,dst) pairs — strictly increasing successor lists
        # (first kept = min label when labelled, by the lexsort above)
        keep = np.ones(len(src), dtype=bool)
        keep[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
        src, dst = src[keep], dst[keep]
        if lab is not None:
            lab = lab[keep]
        srcs, starts, counts = np.unique(src, return_index=True, return_counts=True)
        firsts = dst[starts]
        # gaps: dst[i] - dst[i-1] - 1 within each list (BVGraph.java:2202)
        gaps_all = dst[1:] - dst[:-1] - 1
        is_start = np.zeros(len(dst), dtype=bool)
        is_start[starts] = True
        gaps = gaps_all[~is_start[1:]]
        return pd.DataFrame(
            {
                "block_id": [block_id],
                "node_lo": [int(srcs[0]) if len(srcs) else -1],
                "node_hi": [int(srcs[-1]) if len(srcs) else -1],
                "n_lists": [len(srcs)],
                "n_arcs": [len(dst)],
                "srcs": [srcs.tobytes()],
                "counts": [counts.astype(np.int64).tobytes()],
                "firsts": [firsts.tobytes()],
                "gaps": [gaps.astype(np.int64).tobytes()],
                "labels": [lab.tobytes() if lab is not None else b""],
            }
        )

    return tagged.groupBy("block_id").applyInPandas(pack, schema=CSR_SCHEMA)


def _decode_block(row) -> tuple[np.ndarray, np.ndarray]:
    """One block row -> (src, dst) arrays (vectorized segment decode)."""
    srcs = np.frombuffer(row["srcs"], dtype=np.int64)
    counts = np.frombuffer(row["counts"], dtype=np.int64)
    firsts = np.frombuffer(row["firsts"], dtype=np.int64)
    gaps = np.frombuffer(row["gaps"], dtype=np.int64)
    n = int(counts.sum())
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    vals = np.empty(n, dtype=np.int64)
    mask = np.ones(n, dtype=bool)
    mask[starts] = False
    vals[~mask] = firsts
    vals[mask] = gaps + 1
    c = np.cumsum(vals)
    seg_base = np.repeat(c[starts] - vals[starts], counts)
    dst = c - seg_base
    src = np.repeat(srcs, counts)
    return src, dst


def unpack_csr(blocks: DataFrame, label_col: str | None = None) -> DataFrame:
    """CSR block table -> edge DataFrame (round-trip inverse). Pass
    ``label_col`` to surface the packed per-arc labels."""

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                src, dst = _decode_block(row)
                if not len(src):
                    continue
                out = {"src": src, "dst": dst}
                if label_col:
                    out[label_col] = np.frombuffer(row["labels"], dtype=np.int64)
                yield pd.DataFrame(out)

    schema = "src long, dst long" + (f", {label_col} long" if label_col else "")
    return blocks.mapInPandas(unpack, schema=schema)


def successors(blocks: DataFrame, node: int) -> list[int]:
    """Random-access successor query via block pruning
    (entry point B of SURVEY.md §3.2: partition-pruned lookup —
    ``node_lo <= x <= node_hi`` prunes to one block)."""
    hit = blocks.where(
        (F.col("node_lo") <= node) & (F.col("node_hi") >= node)
    ).collect()
    for row in hit:
        srcs = np.frombuffer(row["srcs"], dtype=np.int64)
        i = np.searchsorted(srcs, node)
        if i < len(srcs) and srcs[i] == node:
            counts = np.frombuffer(row["counts"], dtype=np.int64)
            firsts = np.frombuffer(row["firsts"], dtype=np.int64)
            gaps = np.frombuffer(row["gaps"], dtype=np.int64)
            start = int(counts[:i].sum())
            cnt = int(counts[i])
            gap_start = start - i  # i lists precede -> i firsts consumed
            lst = np.empty(cnt, dtype=np.int64)
            lst[0] = firsts[i]
            if cnt > 1:
                seg = gaps[gap_start : gap_start + cnt - 1]
                lst[1:] = firsts[i] + np.cumsum(seg + 1)
            return lst.tolist()
    return []


def gamma_bits_per_link(blocks: DataFrame) -> DataFrame:
    """Entropy-model storage cost of the pack under γ coding — the
    ordering-sensitive bits/link figure of BVGraph's properties output
    (BVGraph.java:2561-2650; γ length 2*floor(log2(x+1))+1). Firsts are
    costed as γ(int2nat(first - src)) (Fast.int2nat zig-zag,
    BVGraph.java:2198), gaps as γ(gap). Node orderings that shrink gaps
    (Gray / lexicographic / degree / host-blocked, Transform.java:
    2383-2580) show directly in this number, while the raw int64 block
    buffers stay fixed-width (entropy coding is delegated to Parquet).
    Returns one row: (gamma_bits, n_arcs, bits_per_link)."""

    def gamma_len(x: np.ndarray) -> int:
        # gamma code length of non-negative ints: 2*floor(log2(x+1))+1
        if len(x) == 0:
            return 0
        return int((2 * np.floor(np.log2(x + 1.0)) + 1).sum())

    def cost(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bits = np.int64(0)
            arcs = np.int64(0)
            for _, row in pdf.iterrows():
                srcs = np.frombuffer(row["srcs"], dtype=np.int64)
                firsts = np.frombuffer(row["firsts"], dtype=np.int64)
                gaps = np.frombuffer(row["gaps"], dtype=np.int64)
                d = firsts - srcs
                int2nat = np.where(d >= 0, 2 * d, -2 * d - 1)
                bits += gamma_len(int2nat) + gamma_len(gaps)
                arcs += int(row["n_arcs"])
            yield pd.DataFrame({"gamma_bits": [int(bits)], "n_arcs": [int(arcs)]})

    per_part = blocks.mapInPandas(cost, schema="gamma_bits long, n_arcs long")
    return per_part.agg(
        F.sum("gamma_bits").alias("gamma_bits"),
        F.sum("n_arcs").alias("n_arcs"),
        (F.sum("gamma_bits") / F.sum("n_arcs")).alias("bits_per_link"),
    )


def csr_stats(blocks: DataFrame) -> DataFrame:
    """Accounting invariants per block + storage bytes (the
    bits-per-link bookkeeping of BVGraph properties,
    BVGraph.java:2561-2650): sum(counts) must equal n_arcs."""
    return blocks.select(
        "block_id",
        "node_lo",
        "node_hi",
        "n_lists",
        "n_arcs",
        (F.length("srcs") + F.length("counts") + F.length("firsts") + F.length("gaps")).alias(
            "payload_bytes"
        ),
        (
            (F.length("srcs") + F.length("counts") + F.length("firsts") + F.length("gaps"))
            * 8.0
            / F.col("n_arcs")
        ).alias("bits_per_link_raw"),
    )
