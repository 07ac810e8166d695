"""PHYSICAL full-BV compressed storage: reference/copy-block +
interval + ζ₃-residual bitstreams — the format whose cost
operators/bvcomp.py models.

Grammar per successor list (BVGraph.java diffComp :2048-2226, decode
:897-1100, defaults :454-535): outdegree γ; reference distance;
copy/skip block count γ + block lengths γ (first verbatim, rest −1,
alternating copy/skip starting copy, trailing run implicit); interval
count γ + (left, len) γ-deltas when extras exist; residuals ζ₃
(zig-zag first, gap-coded rest).

Spark-first layout: instead of one interleaved bitstream per list, each
TOKEN ROLE becomes one homogeneous split-coded substream per block
(deg/ref/blkcnt/blocks/intcnt/lefts/lens/res) — the same
split-for-wholesale-decode trick as operators/bitstream.py, applied to
the full grammar. Token-to-list boundaries are all RECOVERABLE without
resolving any reference values:

- #refs = #lists with d>0; #blkcnts = #lists with ref>0; #blocks = Σ
  blkcnt;
- copied-per-list is a function of (block runs, referenced list's
  outdegree) alone — run phases alternate copy/skip from copy, the
  implicit trailing run covers the rest of the reference — so
  n_extras = d − copied is known BEFORE any value resolution, which
  pins #intcnts (= #lists with extras), #intervals, and #residuals.

Value resolution then runs in ref-chain-depth rounds (≤ max_ref_count,
reference default 3): round r materializes every list whose reference
resolved in round r−1 by applying its copy mask to the resolved
reference and merging extras.

Documented divergences from the reference bitstream (the MODEL in
bvcomp.py stays exact; `bv_full_model_bits` derives the model figure
from the decoded tokens): (a) reference distances are split-γ coded,
not unary; (b) split-ζ spends +1 bit per short code (bitstream.py
zeta_encode); (c) per-block windows as in bvcomp (no cross-block
references).

Like BVGraph itself, this is the STORAGE format: analytics run on the
CSR/parquet path; pack/unpack are mapInPandas over arc-balanced blocks,
sequential per list only inside a block (the reference's own
per-chunk cut, BVGraph.java:2554).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .bitstream import (
    gamma_decode,
    gamma_encode,
    zeta_bits_vec,
    zeta_decode,
    zeta_encode,
)
from .bvcomp import _copy_blocks, _intervalize, _list_cost
from .csr import arc_balanced_bounds, _block_expr


BVFULL_SCHEMA = (
    "block_id int, node_lo long, node_hi long, n_lists long, n_arcs long, "
    "zeta_k int, min_interval int, "
    "src_u binary, src_v binary, "
    "deg_u binary, deg_v binary, "
    "ref_u binary, ref_v binary, "
    "blkcnt_u binary, blkcnt_v binary, "
    "blocks_u binary, blocks_v binary, "
    "intcnt_u binary, intcnt_v binary, "
    "lefts_u binary, lefts_v binary, "
    "lens_u binary, lens_v binary, "
    "res_u binary, res_v binary"
)


def _int2nat_arr(d: np.ndarray) -> np.ndarray:
    return np.where(d >= 0, 2 * d, -2 * d - 1)


def _nat2int_arr(n: np.ndarray) -> np.ndarray:
    return np.where(n % 2 == 0, n // 2, -(n + 1) // 2)


def _copied_count(seq: list[int], ref_len: int) -> int:
    """Number of reference elements copied, from the block runs alone:
    phases alternate copy/skip starting copy; the implicit trailing run
    (phase = alternation continues) covers the rest of the reference."""
    copied = sum(seq[0::2])
    consumed = sum(seq)
    if len(seq) % 2 == 0:  # next (implicit) phase is copy
        copied += ref_len - consumed
    return copied


def _copy_mask(seq: list[int], ref_len: int) -> np.ndarray:
    """Boolean copy mask over the reference list, same rule."""
    mask = np.zeros(ref_len, dtype=bool)
    pos = 0
    phase = True  # copy
    for run in seq:
        if phase:
            mask[pos : pos + run] = True
        pos += run
        phase = not phase
    if phase:  # implicit trailing run is a copy run
        mask[pos:] = True
    return mask


def pack_bv_full(
    edges: DataFrame,
    num_blocks: int | None = None,
    window: int = 7,
    max_ref_count: int | None = 3,
    min_interval: int = 4,
    zeta_k: int = 3,
) -> DataFrame:
    """Pack ``edges(src, dst)`` into full-BV compressed block rows.

    Reference selection is the same greedy the cost model runs
    (bvcomp._block_bv_bits): for each list try every in-window
    candidate under the chain-depth cap and keep the cheapest under the
    REFERENCE's interleaved cost (so pack decisions match the model's
    bit accounting exactly)."""
    spark = edges.sparkSession
    if num_blocks is None:
        num_blocks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    bounds = arc_balanced_bounds(edges, num_blocks)
    tagged = edges.select("src", "dst").withColumn("block_id", _block_expr(bounds))

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
        node_lo = int(srcs[0]) if len(srcs) else -1
        lists = {
            int(s): dst[st : st + c] for s, st, c in zip(srcs, starts, counts)
        }
        ref_depth: dict[int, int] = {}
        refs, blkcnts, blocks_tok = [], [], []
        intcnts, lefts_tok, lens_tok, res_tok = [], [], [], []
        for s in srcs.tolist():
            cur = lists[s]
            best = _list_cost(s, cur, 0, None, min_interval, zeta_k)
            best_ref = 0
            for r in range(1, window + 1):
                ref = lists.get(s - r)
                if ref is None or len(ref) == 0:
                    continue
                if (
                    max_ref_count is not None
                    and ref_depth.get(s - r, 0) >= max_ref_count
                ):
                    continue
                c = _list_cost(s, cur, r, ref, min_interval, zeta_k)
                if c < best:
                    best, best_ref = c, r
            ref_depth[s] = (
                0 if best_ref == 0 else ref_depth.get(s - best_ref, 0) + 1
            )
            refs.append(best_ref)
            if best_ref == 0:
                extras = cur
            else:
                seq, extras = _copy_blocks(cur, lists[s - best_ref])
                blkcnts.append(len(seq))
                blocks_tok.extend(
                    b if i == 0 else b - 1 for i, b in enumerate(seq)
                )
            if len(extras):
                lefts, lens, residuals = _intervalize(extras, min_interval)
                intcnts.append(len(lefts))
                prev = 0
                for i, (lf, ln) in enumerate(zip(lefts, lens)):
                    lefts_tok.append(
                        int(_int2nat_arr(np.array([lf - s]))[0])
                        if i == 0
                        else lf - prev - 1
                    )
                    prev = lf + ln
                    lens_tok.append(ln - min_interval)
                if len(residuals):
                    first = int(
                        _int2nat_arr(np.array([int(residuals[0]) - s]))[0]
                    )
                    res_tok.append(first)
                    res_tok.extend((np.diff(residuals) - 1).tolist())

        def g(vals):
            return gamma_encode(np.asarray(vals, dtype=np.int64))

        src_u, src_v = g(np.diff(srcs, prepend=node_lo))
        deg_u, deg_v = g(counts)
        ref_u, ref_v = g(refs)
        blkcnt_u, blkcnt_v = g(blkcnts)
        blocks_u, blocks_v = g(blocks_tok)
        intcnt_u, intcnt_v = g(intcnts)
        lefts_u, lefts_v = g(lefts_tok)
        lens_u, lens_v = g(lens_tok)
        res_u, res_v = zeta_encode(np.asarray(res_tok, dtype=np.int64), k=zeta_k)
        return pd.DataFrame(
            {
                "block_id": [block_id],
                "node_lo": [node_lo],
                "node_hi": [int(srcs[-1]) if len(srcs) else -1],
                "n_lists": [len(srcs)],
                "n_arcs": [len(dst)],
                "zeta_k": [zeta_k],
                "min_interval": [min_interval],
                "src_u": [src_u], "src_v": [src_v],
                "deg_u": [deg_u], "deg_v": [deg_v],
                "ref_u": [ref_u], "ref_v": [ref_v],
                "blkcnt_u": [blkcnt_u], "blkcnt_v": [blkcnt_v],
                "blocks_u": [blocks_u], "blocks_v": [blocks_v],
                "intcnt_u": [intcnt_u], "intcnt_v": [intcnt_v],
                "lefts_u": [lefts_u], "lefts_v": [lefts_v],
                "lens_u": [lens_u], "lens_v": [lens_v],
                "res_u": [res_u], "res_v": [res_v],
            }
        )

    return tagged.groupBy("block_id").applyInPandas(pack, schema=BVFULL_SCHEMA)


def _decode_full_block(row):
    """One full-BV block row -> per-list dict of decoded token arrays +
    resolved (src, dst) arrays."""
    n_lists = int(row["n_lists"])
    if n_lists == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    k = int(row["zeta_k"])
    min_interval = int(row["min_interval"])
    counts = gamma_decode(row["deg_u"], row["deg_v"], n_lists)
    srcs = int(row["node_lo"]) + np.cumsum(
        gamma_decode(row["src_u"], row["src_v"], n_lists)
    )
    refs = gamma_decode(row["ref_u"], row["ref_v"], n_lists)
    n_with_ref = int((refs > 0).sum())
    blkcnts = gamma_decode(row["blkcnt_u"], row["blkcnt_v"], n_with_ref)
    blocks_tok = gamma_decode(
        row["blocks_u"], row["blocks_v"], int(blkcnts.sum())
    )
    deg_of = {int(s): int(c) for s, c in zip(srcs, counts)}

    # ---- structural pass: recover per-list block seqs, copied counts,
    # extras/interval/residual counts — NO value resolution needed
    seqs: dict[int, list[int]] = {}
    copied = np.zeros(n_lists, dtype=np.int64)
    bi = 0  # blocks_tok cursor
    ri = 0  # blkcnts cursor
    for i in range(n_lists):
        if refs[i] == 0:
            continue
        nb = int(blkcnts[ri]); ri += 1
        seq = [
            int(b) if j == 0 else int(b) + 1
            for j, b in enumerate(blocks_tok[bi : bi + nb])
        ]
        bi += nb
        seqs[i] = seq
        ref_len = deg_of[int(srcs[i] - refs[i])]
        copied[i] = _copied_count(seq, ref_len)
    n_extras = counts - copied
    has_extras = n_extras > 0
    intcnts_all = np.zeros(n_lists, dtype=np.int64)
    intcnts = gamma_decode(
        row["intcnt_u"], row["intcnt_v"], int(has_extras.sum())
    )
    intcnts_all[has_extras] = intcnts
    n_int_tok = int(intcnts_all.sum())
    lefts_tok = gamma_decode(row["lefts_u"], row["lefts_v"], n_int_tok)
    lens_tok = gamma_decode(row["lens_u"], row["lens_v"], n_int_tok)

    # interval expansion + residual boundaries per list
    extras_parts: dict[int, list[np.ndarray]] = {}
    n_res = np.zeros(n_lists, dtype=np.int64)
    li = 0
    for i in range(n_lists):
        nint = int(intcnts_all[i])
        tot_int = 0
        if nint:
            vals = []
            prev = 0
            for j in range(nint):
                ln = int(lens_tok[li + j]) + min_interval
                if j == 0:
                    lf = int(srcs[i]) + int(
                        _nat2int_arr(np.array([lefts_tok[li]]))[0]
                    )
                else:
                    lf = prev + int(lefts_tok[li + j]) + 1
                vals.append(np.arange(lf, lf + ln, dtype=np.int64))
                prev = lf + ln
                tot_int += ln
            li += nint
            extras_parts[i] = vals
        n_res[i] = n_extras[i] - tot_int
    res_tok = zeta_decode(row["res_u"], row["res_v"], int(n_res.sum()), k=k)

    ci = 0
    extras_of: dict[int, np.ndarray] = {}
    for i in range(n_lists):
        parts = extras_parts.get(i, [])
        nr = int(n_res[i])
        if nr:
            seg = res_tok[ci : ci + nr].copy()
            ci += nr
            seg[0] = int(srcs[i]) + int(_nat2int_arr(seg[:1])[0])
            if nr > 1:
                seg[1:] += 1
                seg = np.cumsum(seg)
            parts = parts + [seg]
        if parts:
            extras_of[i] = np.sort(np.concatenate(parts))
        else:
            extras_of[i] = np.empty(0, dtype=np.int64)

    # ---- value resolution in ref-chain-depth rounds
    resolved: dict[int, np.ndarray] = {}
    idx_of = {int(s): i for i, s in enumerate(srcs)}
    pending = list(range(n_lists))
    while pending:
        nxt = []
        progressed = False
        for i in pending:
            if refs[i] == 0:
                resolved[i] = extras_of[i]
                progressed = True
                continue
            j = idx_of[int(srcs[i] - refs[i])]
            if j not in resolved:
                nxt.append(i)
                continue
            ref_list = resolved[j]
            mask = _copy_mask(seqs[i], len(ref_list))
            merged = np.concatenate((ref_list[mask], extras_of[i]))
            resolved[i] = np.sort(merged)
            progressed = True
        if not progressed:
            raise ValueError("unresolvable reference chain (corrupt block)")
        pending = nxt

    out_src = np.repeat(srcs, counts)
    out_dst = np.concatenate([resolved[i] for i in range(n_lists)])
    return out_src, out_dst


def unpack_bv_full(blocks: DataFrame) -> DataFrame:
    """Full-BV block table -> edge DataFrame (round-trip inverse)."""

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                src, dst = _decode_full_block(row)
                if len(src):
                    yield pd.DataFrame({"src": src, "dst": dst})

    return blocks.mapInPandas(unpack, schema="src long, dst long")


def bv_full_model_bits(blocks: DataFrame) -> DataFrame:
    """The INTERLEAVED BV model figure derived from the physical pack's
    decoded token streams (outdegree γ + reference unary + blocks γ +
    intervals γ + residuals interleaved-ζ) — independent of pack-time
    counters; equals bvcomp.bv_bits_per_link on the same edges/config
    (pinned by tests). Also reports the physical payload (split-stream
    bits actually stored) so the documented split overhead is visible."""

    def cost(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            model = 0
            physical = 0
            arcs = 0
            for _, row in pdf.iterrows():
                n_lists = int(row["n_lists"])
                if n_lists == 0:
                    continue
                k = int(row["zeta_k"])
                counts = gamma_decode(row["deg_u"], row["deg_v"], n_lists)
                refs = gamma_decode(row["ref_u"], row["ref_v"], n_lists)
                n_with_ref = int((refs > 0).sum())
                blkcnts = gamma_decode(
                    row["blkcnt_u"], row["blkcnt_v"], n_with_ref
                )
                n_blocks = int(blkcnts.sum())
                blocks_tok = gamma_decode(
                    row["blocks_u"], row["blocks_v"], n_blocks
                )
                # structural pass to size intcnt/lefts/lens/res streams
                srcs = int(row["node_lo"]) + np.cumsum(
                    gamma_decode(row["src_u"], row["src_v"], n_lists)
                )
                deg_of = {int(s): int(c) for s, c in zip(srcs, counts)}
                copied = np.zeros(n_lists, dtype=np.int64)
                bi = ri = 0
                for i in range(n_lists):
                    if refs[i] == 0:
                        continue
                    nb = int(blkcnts[ri]); ri += 1
                    seq = [
                        int(b) if j == 0 else int(b) + 1
                        for j, b in enumerate(blocks_tok[bi : bi + nb])
                    ]
                    bi += nb
                    copied[i] = _copied_count(
                        seq, deg_of[int(srcs[i] - refs[i])]
                    )
                n_extras = counts - copied
                n_he = int((n_extras > 0).sum())
                intcnts = gamma_decode(row["intcnt_u"], row["intcnt_v"], n_he)
                n_int = int(intcnts.sum())
                lefts_tok = gamma_decode(row["lefts_u"], row["lefts_v"], n_int)
                lens_tok = gamma_decode(row["lens_u"], row["lens_v"], n_int)
                tot_int = (lens_tok + int(row["min_interval"])).sum() if n_int else 0
                nres = int(n_extras.sum() - tot_int)
                res_tok = zeta_decode(row["res_u"], row["res_v"], nres, k=k)

                def gsum(vals):
                    v = np.asarray(vals, dtype=np.int64)
                    if v.size == 0:
                        return 0
                    from .bitstream import _bitlen

                    return int((2 * _bitlen(v + 1) - 1).sum())

                model += gsum(counts)               # outdegrees γ
                model += int((refs + 1).sum())      # references UNARY
                model += gsum(blkcnts) + gsum(blocks_tok)
                model += gsum(intcnts) + gsum(lefts_tok) + gsum(lens_tok)
                model += zeta_bits_vec(res_tok, k=k)
                physical += gsum(
                    np.diff(srcs, prepend=int(row["node_lo"]))
                )
                for name, toks in (
                    ("deg", counts), ("ref", refs), ("blkcnt", blkcnts),
                    ("blocks", blocks_tok), ("intcnt", intcnts),
                    ("lefts", lefts_tok), ("lens", lens_tok),
                ):
                    physical += gsum(toks)
                # split-ζ physical = unary(h+1) + fixed k(h+1) field
                if nres:
                    from .bitstream import _bitlen

                    h = (_bitlen(res_tok + 1) - 1) // k
                    physical += int(((h + 1) + k * (h + 1)).sum())
                arcs += int(row["n_arcs"])
            yield pd.DataFrame(
                {"model_bits": [model], "physical_bits": [physical],
                 "n_arcs": [arcs]}
            )

    per = blocks.mapInPandas(
        cost, schema="model_bits long, physical_bits long, n_arcs long"
    )
    return per.agg(
        F.sum("model_bits").alias("model_bits"),
        F.sum("physical_bits").alias("physical_bits"),
        F.sum("n_arcs").alias("n_arcs"),
        (F.sum("model_bits") / F.sum("n_arcs")).alias("bits_per_link"),
    )


def bv_full_successors(blocks: DataFrame, node: int) -> list[int]:
    """Random-access successor query on the full-BV table: prune to the
    one block whose [node_lo, node_hi] covers the node, decode only that
    block (entry point B, SURVEY.md §3.2; BVGraph.java:897-904 — the
    reference also resolves the whole reference chain for one list; here
    the chain lives inside the block by construction)."""
    hit = blocks.where(
        (F.col("node_lo") <= node) & (F.col("node_hi") >= node)
    ).collect()
    for row in hit:
        src, dst = _decode_full_block(row)
        sel = dst[src == node]
        if len(sel):
            return sel.tolist()
    return []
