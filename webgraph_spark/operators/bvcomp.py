"""BVGraph compression entropy model: reference/copy-block + interval
+ zeta-residual bits accounting — the number webgraph users actually
compare across node orderings (the ~2-3 bits/link headline).

Reference (all BVGraph.java):
- diffComp (:2048-2226): greedy merge of the current list against one
  reference list (a previous node's list, distance ``ref`` back) into
  alternating copy/skip blocks over the reference, plus an "extras"
  list; the recorded block sequence drops the implicit trailing block.
- intervalize (:1631-1654): maximal runs of >= min_interval consecutive
  integers in the extras become (left, len) intervals; the rest are
  residuals.
- best-reference selection (:2302-2326): for each node, try every
  ref in the window (default 7) whose chain depth < max_ref_count
  (default 3) and pick the cheapest, counting bits with the default
  codings: outdegree GAMMA, reference UNARY, block-count/blocks GAMMA,
  interval data GAMMA, residuals ZETA_3 (:526-535, :454-472).

This module COSTS the encoding exactly (a "dry run" over the same
greedy); it does not emit a bitstream — actual byte storage is
delegated to Parquet (SURVEY.md §1.2), the model is the
ordering-comparison instrument. Divergence from the reference: the
window cannot cross a CSR block boundary (lists are costed per block),
so the first ``window`` lists of each block see a truncated candidate
set — strictly pessimistic, O(window / lists_per_block) relative error.

Scale shape: one mapInPandas over the packed CSR block table — the
greedy is per-node sequential ONLY within a block (the reference's own
multi-thread store makes the same per-chunk cut, BVGraph.java:2554).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .csr import _decode_block


def gamma_bits(x: int) -> int:
    """gamma code length of x >= 0: 2*floor(log2(x+1)) + 1."""
    return 2 * ((x + 1).bit_length() - 1) + 1


def zeta_bits(x: int, k: int = 3) -> int:
    """zeta_k code length of x >= 0 (OutputBitStream.writeZeta):
    n = x+1, h = floor(log2(n) / k) -> unary(h) is h+1 bits, then the
    minimal-binary code of n - 2^(hk) over an interval of size
    2^(hk) * (2^k - 1): hk + k - 1 bits for the first 2^(hk) values,
    hk + k bits otherwise."""
    n = x + 1
    h = (n.bit_length() - 1) // k
    m = n - (1 << (h * k))
    return (h + 1) + (h * k + k - 1) + (0 if m < (1 << (h * k)) else 1)


def unary_bits(x: int) -> int:
    return x + 1


def _copy_blocks(cur: np.ndarray, ref: np.ndarray) -> tuple[list[int], np.ndarray]:
    """Copy/skip block sequence of ``cur`` against ``ref`` (diffComp's
    merge, BVGraph.java:2053-2106) -> (blocks, extras).

    The walk consumes the prefix of ``ref`` with values <= cur[-1];
    runs of matched (copied) / unmatched (skipped) reference elements
    alternate starting with a copy run (a leading skip run is preceded
    by an explicit empty copy block); the trailing run is recorded only
    if it is a copy run that ends before the reference does."""
    p = int(np.searchsorted(ref, cur[-1], side="right"))
    if p == 0:
        # exit still in the initial (empty) copy phase with ref unconsumed
        return [0], cur
    # both lists are sorted unique: membership via searchsorted beats
    # isin/setdiff1d (which re-sort) — this runs window+1 times per list
    refp = ref[:p]
    i = np.minimum(np.searchsorted(refp, cur), p - 1)
    extras = cur[refp[i] != cur]
    j = np.minimum(np.searchsorted(cur, refp), len(cur) - 1)
    mask = cur[j] == refp
    change = np.flatnonzero(mask[1:] != mask[:-1]) + 1
    run_starts = np.concatenate(([0], change))
    run_lens = np.diff(np.concatenate((run_starts, [p])))
    seq: list[int] = []
    if not mask[0]:
        seq.append(0)  # explicit empty first copy block
    seq.extend(int(v) for v in run_lens)
    if mask[run_starts[-1]]:
        if p == len(ref):
            seq.pop()  # copied to the end of ref: trailing block implicit
    else:
        seq.pop()  # trailing skip run never recorded
    return seq, extras


def _intervalize(extras: np.ndarray, min_interval: int):
    """(lefts, lens, residuals): maximal consecutive runs of length >=
    min_interval become intervals (BVGraph.intervalize, :1631-1654)."""
    if len(extras) == 0:
        return [], [], extras
    run_id = extras - np.arange(len(extras))
    change = np.flatnonzero(run_id[1:] != run_id[:-1]) + 1
    starts = np.concatenate(([0], change))
    lens = np.diff(np.concatenate((starts, [len(extras)])))
    is_int = lens >= min_interval
    lefts = extras[starts[is_int]].tolist()
    ilens = lens[is_int].tolist()
    keep = np.ones(len(extras), dtype=bool)
    for s, l in zip(starts[is_int], lens[is_int]):
        keep[s : s + l] = False
    return lefts, ilens, extras[keep]


def _int2nat(d: int) -> int:
    return 2 * d if d >= 0 else -2 * d - 1


def _extras_bits(node: int, extras: np.ndarray, min_interval: int, zeta_k: int) -> int:
    """Interval + residual coding cost of the extras (diffComp's
    interval/residual section, BVGraph.java:2146-2211). Residual gaps
    are costed with the vectorized ζ kernel (bitstream.zeta_bits_vec ==
    Σ zeta_bits, pinned by tests/test_bitstream.py) — this sum is the
    inner loop of the whole reference-selection greedy."""
    if len(extras) == 0:
        return 0
    from .bitstream import zeta_bits_vec

    lefts, lens, residuals = _intervalize(extras, min_interval)
    bits = gamma_bits(len(lefts))
    prev = 0
    for i, (lf, ln) in enumerate(zip(lefts, lens)):
        if i == 0:
            bits += gamma_bits(_int2nat(lf - node))
        else:
            bits += gamma_bits(lf - prev - 1)
        prev = lf + ln
        bits += gamma_bits(ln - min_interval)
    if len(residuals):
        bits += zeta_bits(_int2nat(int(residuals[0]) - node), zeta_k)
        if len(residuals) > 64:
            bits += zeta_bits_vec(np.diff(residuals) - 1, k=zeta_k)
        else:
            # short lists: scalar bit_length beats numpy dispatch
            bits += sum(
                zeta_bits(int(g), zeta_k) for g in np.diff(residuals) - 1
            )
    return bits


def _list_cost(
    node: int,
    cur: np.ndarray,
    ref_dist: int,
    ref: np.ndarray | None,
    min_interval: int,
    zeta_k: int,
) -> int:
    """diffComp bit count for one (current, reference) pair; ref_dist=0
    costs the no-reference encoding."""
    bits = unary_bits(ref_dist)  # reference coding: UNARY (default)
    if ref_dist == 0 or ref is None:
        return bits + _extras_bits(node, cur, min_interval, zeta_k)
    blocks, extras = _copy_blocks(cur, ref)
    bits += gamma_bits(len(blocks))
    for i, b in enumerate(blocks):
        bits += gamma_bits(b if i == 0 else b - 1)
    return bits + _extras_bits(node, extras, min_interval, zeta_k)


def _block_bv_bits(
    row,
    window: int,
    max_ref_count: int | None,
    min_interval: int,
    zeta_k: int,
) -> tuple[int, int]:
    """(bv_bits, n_arcs) for one CSR block: the reference's sequential
    best-candidate greedy over node order (BVGraph.java:2302-2326),
    window-limited to ids inside the block."""
    src, dst = _decode_block(row)
    if not len(src):
        return 0, 0
    srcs = np.frombuffer(row["srcs"], dtype=np.int64)
    counts = np.frombuffer(row["counts"], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    lists = {
        int(s): dst[st : st + c]
        for s, st, c in zip(srcs, starts, counts)
    }
    ref_depth: dict[int, int] = {}
    bits = 0
    for s in srcs.tolist():
        cur = lists[s]
        bits += gamma_bits(len(cur))  # outdegree (ordering-insensitive
        # for a fixed degree sequence, but part of the headline figure)
        best = _list_cost(s, cur, 0, None, min_interval, zeta_k)
        best_ref = 0
        for r in range(1, window + 1):
            cand = s - r
            ref = lists.get(cand)
            if ref is None or len(ref) == 0:
                continue
            if max_ref_count is not None and ref_depth.get(cand, 0) >= max_ref_count:
                continue
            c = _list_cost(s, cur, r, ref, min_interval, zeta_k)
            if c < best:
                best, best_ref = c, r
        ref_depth[s] = 0 if best_ref == 0 else ref_depth.get(s - best_ref, 0) + 1
        bits += best
    return bits, int(len(dst))


def bv_bits_per_link(
    blocks: DataFrame,
    window: int = 7,
    max_ref_count: int | None = 3,
    min_interval: int = 4,
    zeta_k: int = 3,
) -> DataFrame:
    """Full BVGraph-default entropy model over a packed CSR block table.
    One row: (bv_bits, n_arcs, bits_per_link). ``max_ref_count=None``
    lifts the chain-depth cap, making per-node choices independent of
    each other (the oracle-checkable configuration — see
    graph/testdata.bv_bits_sql)."""

    def cost(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bits = 0
            arcs = 0
            for _, row in pdf.iterrows():
                b, a = _block_bv_bits(row, window, max_ref_count, min_interval, zeta_k)
                bits += b
                arcs += a
            yield pd.DataFrame({"bv_bits": [bits], "n_arcs": [arcs]})

    per_part = blocks.mapInPandas(cost, schema="bv_bits long, n_arcs long")
    return per_part.agg(
        F.sum("bv_bits").alias("bv_bits"),
        F.sum("n_arcs").alias("n_arcs"),
        (F.sum("bv_bits") / F.sum("n_arcs")).alias("bits_per_link"),
    )
