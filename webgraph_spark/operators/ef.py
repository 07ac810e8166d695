"""Elias–Fano successor-list packing: the EFGraph second physical format.

Reference (EFGraph.java:68-120): each successor list, a strictly
increasing sequence of k values in a universe [0, u), is stored as
- the l = max(0, floor(log2(u/k))) LOW bits of every value, packed
  contiguously (EFGraph's LongWordBitReader over the lower-bits array);
- the HIGH bits in a unary/Elias–Fano upper-bits bit vector: bit
  ``(v_i >> l) + i`` is set for the i-th value (EFGraph.java:1016-1060).
This gives 2 + log2(u/k) bits/value worst-case and O(1)-ish skipTo via
select on the upper-bits vector (EFGraph.java:1147 skipTo).

Spark translation (same posture as operators/csr.py — SURVEY.md §1.2):
the bitstreams become per-block ``binary`` columns built and decoded by
Arrow-vectorized numpy kernels; per-list offsets ride alongside so a
single list can be sliced and decoded without touching the rest of the
block (the random-access contract of ImmutableGraph.successors).
Entropy-exact sizes are reported by :func:`ef_bits_per_link`; block
pruning on (node_lo, node_hi) is the partition-level skip structure and
:func:`skip_to` is the in-list one.

Block table schema (one row per node-range block):

    block_id long, node_lo long, node_hi long, n_lists long, n_arcs long,
    srcs    binary  -- int64[n_lists] distinct sources, sorted
    counts  binary  -- int64[n_lists] outdegrees
    maxs    binary  -- int64[n_lists] max successor per list (sizes the
                       upper-bits vector WITHOUT decoding it — the cost
                       aggregation in :func:`ef_bits_per_link` is a pure
                       array sum over this column)
    lbits   binary  -- int64[n_lists] lower-bit width l per list
    lo_off  binary  -- int64[n_lists] BYTE offset of each list's lower-bits slab
    up_off  binary  -- int64[n_lists] BYTE offset of each list's upper-bits slab
    lowers  binary  -- packed low bits, per-list slabs (MSB-first per value)
    uppers  binary  -- packed upper-bits unary vectors, per-list slabs

Deliberate format divergence from EFGraph: the reference sizes lower
bits with length+1 (a terminator sentinel is appended and outdegree+1
values are encoded, EFGraph.java:491-530); this format stores exactly k
values with l = floor(log2(u/k)) and NO sentinel, so the two bitstreams
are not bit-comparable — same asymptotics (2 + log2(u/k) bits/value),
different constants. Future bit-level comparisons against the reference
should not read the difference as a bug.

The pack/unpack kernels are FLAT-vectorized: one numpy pass per block
for the upper-bits scatter (global bit positions via per-list cumsum
offsets + one ``bits[pos] = 1``) and one pass per distinct lower-bit
width l (<= 64 of them) for the low-bits matrix — no per-list Python
loop, matching the csr.py ``_decode_block`` posture. At 10^9 nodes the
pack cost is numpy-bound, not Python-interpreter-bound.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .csr import arc_balanced_bounds, _block_expr

EF_SCHEMA = (
    "block_id long, node_lo long, node_hi long, n_lists long, n_arcs long, "
    "srcs binary, counts binary, maxs binary, lbits binary, lo_off binary, "
    "up_off binary, lowers binary, uppers binary"
)


def _lbits(k: int, u: int) -> int:
    """EFGraph's lower-bit width: max(0, floor(log2(u/k))), computed with
    INTEGER arithmetic — (u // k).bit_length() - 1 equals
    floor(log2(u/k)) for u > k (floor(x) and x share a power-of-two
    interval), matching the reference's
    Fast.mostSignificantBit(upperBound/length) with no float-ulp hazard
    near exact powers of two."""
    if k == 0 or u <= k:
        return 0
    return (u // k).bit_length() - 1


def _lbits_vec(k: np.ndarray, u: int) -> np.ndarray:
    """Vectorized :func:`_lbits`: float log2 gives a +-1 guess, then two
    integer-shift corrections make it exact."""
    k = k.astype(np.int64)
    q = np.maximum(u // np.maximum(k, 1), 1)
    l = np.floor(np.log2(q.astype(np.float64))).astype(np.int64)
    l = np.where((np.int64(1) << np.minimum(l, 62)) > q, l - 1, l)
    bump = np.minimum(l + 1, 62)
    l = np.where((l < 62) & ((np.int64(1) << bump) <= q), l + 1, l)
    l = np.clip(l, 0, 62)  # universe is int64: l can never exceed 62
    return np.where((k == 0) | (u <= k), 0, l)


def _pack_low(vals: np.ndarray, l: int) -> bytes:
    """Pack the low ``l`` bits of each value, MSB-first, contiguously."""
    if l == 0 or len(vals) == 0:
        return b""
    shifts = np.arange(l - 1, -1, -1, dtype=np.int64)
    bits = ((vals[:, None] >> shifts[None, :]) & 1).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()

def _unpack_low(buf: np.ndarray, k: int, l: int) -> np.ndarray:
    """Inverse of :func:`_pack_low` -> int64[k] of the low-bit fields."""
    if l == 0 or k == 0:
        return np.zeros(k, dtype=np.int64)
    bits = np.unpackbits(buf, count=k * l).reshape(k, l).astype(np.int64)
    weights = (np.int64(1) << np.arange(l - 1, -1, -1, dtype=np.int64))
    return bits @ weights


def _pack_upper(vals: np.ndarray, l: int) -> bytes:
    """Upper-bits unary vector: bit (v_i >> l) + i set (EFGraph layout)."""
    k = len(vals)
    if k == 0:
        return b""
    hi = (vals >> l) + np.arange(k, dtype=np.int64)
    nbits = int(hi[-1]) + 1
    bits = np.zeros(nbits, dtype=np.uint8)
    bits[hi] = 1
    return np.packbits(bits).tobytes()

def _unpack_upper(buf: np.ndarray, k: int, l: int) -> np.ndarray:
    """Select the k set bits -> high-bit fields (v_i >> l)."""
    if k == 0:
        return np.zeros(0, dtype=np.int64)
    bits = np.unpackbits(buf)
    idx = np.flatnonzero(bits)[:k].astype(np.int64)
    return idx - np.arange(k, dtype=np.int64)


def ef_encode_list(vals: np.ndarray, u: int) -> tuple[int, bytes, bytes]:
    """Encode one strictly-increasing list -> (l, lowers, uppers)."""
    l = _lbits(len(vals), u)
    mask = (np.int64(1) << l) - 1 if l else np.int64(0)
    return l, _pack_low(vals & mask, l), _pack_upper(vals, l)


def ef_decode_list(k: int, l: int, lowers: np.ndarray, uppers: np.ndarray) -> np.ndarray:
    """Decode one list back to its strictly-increasing int64 values."""
    return (_unpack_upper(uppers, k, l) << l) | _unpack_low(lowers, k, l)


def pack_ef(
    edges: DataFrame,
    num_blocks: int | None = None,
    bounds: list[int] | None = None,
    universe: int | None = None,
) -> DataFrame:
    """Pack ``edges(src, dst)`` into the Elias–Fano block table
    (EFGraph.store analog, EFGraph.java:283-420). ``universe`` defaults
    to max(dst)+1 computed once. Duplicate arcs collapse (the encoder
    requires strictly increasing lists, EFGraph.java:1016)."""
    spark = edges.sparkSession
    if universe is None:
        universe = int(
            edges.agg(F.max("dst").alias("m")).collect()[0]["m"] or 0
        ) + 1
    if bounds is None:
        if num_blocks is None:
            num_blocks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        bounds = arc_balanced_bounds(edges, num_blocks)
    tagged = edges.select("src", "dst").withColumn("block_id", _block_expr(bounds))
    u = int(universe)

    def pack(key, pdf):
        block_id = int(key[0])
        src = pdf["src"].to_numpy(np.int64)
        dst = pdf["dst"].to_numpy(np.int64)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        keep = np.ones(len(src), dtype=bool)
        keep[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
        src, dst = src[keep], dst[keep]
        srcs, starts, counts = np.unique(src, return_index=True, return_counts=True)
        nl = len(srcs)
        k = counts.astype(np.int64)
        lb = _lbits_vec(k, u)
        maxs = dst[starts + k - 1] if nl else np.empty(0, np.int64)
        # per-list byte-aligned slab sizes + offsets (one cumsum each)
        lo_bytes = (k * lb + 7) >> 3
        up_nbits = (maxs >> lb) + k  # last set bit is (max>>l)+k-1
        up_bytes = (up_nbits + 7) >> 3
        lo_off = np.zeros(nl, np.int64)
        up_off = np.zeros(nl, np.int64)
        if nl:
            lo_off[1:] = np.cumsum(lo_bytes)[:-1]
            up_off[1:] = np.cumsum(up_bytes)[:-1]
        # value-level index arrays (flat across ALL lists)
        j_in_list = np.arange(len(dst), dtype=np.int64) - np.repeat(starts, k)
        l_per_val = np.repeat(lb, k)
        # upper bits: one global scatter — bit (v>>l)+j at each list's
        # byte-aligned base (exactly per-list _pack_upper concatenated,
        # since trailing pad bits are zero)
        total_up_bits = int((up_off[-1] + up_bytes[-1]) * 8) if nl else 0
        up_bits = np.zeros(total_up_bits, dtype=np.uint8)
        if total_up_bits:
            up_pos = np.repeat(up_off * 8, k) + (dst >> l_per_val) + j_in_list
            up_bits[up_pos] = 1
        uppers = np.packbits(up_bits).tobytes()
        # lower bits: one scatter per DISTINCT l (<= 64 passes), each a
        # vectorized (n_vals_with_l, l) bit-matrix write
        total_lo_bits = int((lo_off[-1] + lo_bytes[-1]) * 8) if nl else 0
        lo_bits = np.zeros(total_lo_bits, dtype=np.uint8)
        if total_lo_bits:
            val_start = np.repeat(lo_off * 8, k) + j_in_list * l_per_val
            for l in np.unique(l_per_val):
                l = int(l)
                if l == 0:
                    continue
                sel = l_per_val == l
                v = dst[sel] & ((np.int64(1) << l) - 1)
                shifts = np.arange(l - 1, -1, -1, dtype=np.int64)
                bits = ((v[:, None] >> shifts[None, :]) & 1).astype(np.uint8)
                pos = (
                    val_start[sel][:, None]
                    + np.arange(l, dtype=np.int64)[None, :]
                ).ravel()
                lo_bits[pos] = bits.ravel()
        lowers = np.packbits(lo_bits).tobytes()
        return pd.DataFrame(
            {
                "block_id": [block_id],
                "node_lo": [int(srcs[0]) if nl else -1],
                "node_hi": [int(srcs[-1]) if nl else -1],
                "n_lists": [nl],
                "n_arcs": [len(dst)],
                "srcs": [srcs.tobytes()],
                "counts": [k.tobytes()],
                "maxs": [maxs.tobytes()],
                "lbits": [lb.tobytes()],
                "lo_off": [lo_off.tobytes()],
                "up_off": [up_off.tobytes()],
                "lowers": [lowers],
                "uppers": [uppers],
            }
        )

    return tagged.groupBy("block_id").applyInPandas(pack, schema=EF_SCHEMA)


def _list_slices(row, i: int) -> tuple[int, int, np.ndarray, np.ndarray]:
    """Slice list i's (k, l, lowers, uppers) out of a block row without
    decoding the others — the per-list random-access contract."""
    counts = np.frombuffer(row["counts"], dtype=np.int64)
    lbits = np.frombuffer(row["lbits"], dtype=np.int64)
    lo_off = np.frombuffer(row["lo_off"], dtype=np.int64)
    up_off = np.frombuffer(row["up_off"], dtype=np.int64)
    k, l = int(counts[i]), int(lbits[i])
    lo_end = int(lo_off[i + 1]) if i + 1 < len(lo_off) else len(row["lowers"])
    up_end = int(up_off[i + 1]) if i + 1 < len(up_off) else len(row["uppers"])
    lo = np.frombuffer(row["lowers"], dtype=np.uint8)[int(lo_off[i]) : lo_end]
    up = np.frombuffer(row["uppers"], dtype=np.uint8)[int(up_off[i]) : up_end]
    return k, l, lo, up


def _decode_block_row(row) -> tuple[np.ndarray, np.ndarray]:
    """Decode ALL of a block's lists in flat numpy passes (no per-list
    loop — the mirror of the vectorized pack): one unpackbits +
    flatnonzero recovers every list's upper fields (slabs are
    byte-aligned and each contains exactly k_i set bits), one gather per
    distinct lower width recovers the low fields."""
    srcs = np.frombuffer(row["srcs"], dtype=np.int64)
    if not len(srcs):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    k = np.frombuffer(row["counts"], dtype=np.int64)
    lb = np.frombuffer(row["lbits"], dtype=np.int64)
    lo_off = np.frombuffer(row["lo_off"], dtype=np.int64)
    up_off = np.frombuffer(row["up_off"], dtype=np.int64)
    total = int(k.sum())
    kcum = np.zeros(len(k), dtype=np.int64)
    kcum[1:] = np.cumsum(k)[:-1]
    j_in_list = np.arange(total, dtype=np.int64) - np.repeat(kcum, k)
    # upper fields: set-bit positions relative to each slab base, minus rank
    idx = np.flatnonzero(
        np.unpackbits(np.frombuffer(row["uppers"], dtype=np.uint8))
    ).astype(np.int64)
    hi = idx - np.repeat(up_off * 8, k) - j_in_list
    # lower fields
    l_per_val = np.repeat(lb, k)
    val_start = np.repeat(lo_off * 8, k) + j_in_list * l_per_val
    low = np.zeros(total, dtype=np.int64)
    if (l_per_val > 0).any():
        lo_bits = np.unpackbits(np.frombuffer(row["lowers"], dtype=np.uint8))
        for l in np.unique(l_per_val):
            l = int(l)
            if l == 0:
                continue
            sel = l_per_val == l
            pos = (
                val_start[sel][:, None]
                + np.arange(l, dtype=np.int64)[None, :]
            )
            weights = np.int64(1) << np.arange(l - 1, -1, -1, dtype=np.int64)
            low[sel] = lo_bits[pos].astype(np.int64) @ weights
    return np.repeat(srcs, k), (hi << l_per_val) | low


def unpack_ef(blocks: DataFrame) -> DataFrame:
    """EF block table -> edge DataFrame (EFGraph.load / sequential scan,
    round-trip inverse of :func:`pack_ef`)."""

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in range(len(pdf)):  # one iteration per BLOCK, not per list
                src, dst = _decode_block_row(pdf.iloc[i])
                if len(src):
                    yield pd.DataFrame({"src": src, "dst": dst})

    return blocks.mapInPandas(unpack, schema="src long, dst long")


def ef_successors(blocks: DataFrame, node: int) -> list[int]:
    """Random-access successor list: block pruning on (node_lo, node_hi)
    then a single-list decode (ImmutableGraph.successors via EFGraph's
    offsets, EFGraph.java:1100-1140)."""
    hit = blocks.where(
        (F.col("node_lo") <= node) & (F.col("node_hi") >= node)
    ).collect()
    for row in hit:
        srcs = np.frombuffer(row["srcs"], dtype=np.int64)
        i = int(np.searchsorted(srcs, node))
        if i < len(srcs) and srcs[i] == node:
            return ef_decode_list(*_list_slices(row, i)).tolist()
    return []


def skip_to(vals: np.ndarray, lower_bound: int) -> int:
    """EFGraph's LongWordBitReader.skipTo semantics on a decoded list:
    smallest successor >= lower_bound, or -1 past the end
    (EFGraph.java:1147; used by the reference's merged/masked iterators
    for galloping intersection)."""
    i = int(np.searchsorted(vals, lower_bound))
    return int(vals[i]) if i < len(vals) else -1


def ef_bits_per_link(blocks: DataFrame) -> DataFrame:
    """Exact Elias–Fano storage cost: sum over lists of
    k*l + (upper-bits vector length) bits, / n_arcs — the EFGraph
    counterpart of the γ-entropy bits/link figure (csr.gamma_bits_per_link).
    Returns one row (ef_bits, n_arcs, bits_per_link)."""

    def cost(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bits = 0
            arcs = 0
            for _, row in pdf.iterrows():  # one row per block; no decode
                counts = np.frombuffer(row["counts"], dtype=np.int64)
                lbits = np.frombuffer(row["lbits"], dtype=np.int64)
                maxs = np.frombuffer(row["maxs"], dtype=np.int64)
                # k*l low bits + (max>>l)+k unary bits, straight from the
                # pack-time max column — a pure array sum, no bitstream
                bits += int((counts * lbits + (maxs >> lbits) + counts).sum())
                arcs += int(row["n_arcs"])
            yield pd.DataFrame({"ef_bits": [bits], "n_arcs": [arcs]})

    per_part = blocks.select("counts", "lbits", "maxs", "n_arcs").mapInPandas(
        cost, schema="ef_bits long, n_arcs long"
    )
    return per_part.agg(
        F.sum("ef_bits").alias("ef_bits"),
        F.sum("n_arcs").alias("n_arcs"),
        (F.sum("ef_bits") / F.sum("n_arcs")).alias("bits_per_link"),
    )
