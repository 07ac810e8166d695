"""Custom stateful streaming operator: per-node approximate distinct
out-degree via HLL registers kept in ``applyInPandasWithState``.

The batch engine's HyperBall state (algos/hyperball.py — per-node HLL
registers, register-max merge; HyperBall.java:639) re-expressed as a
STREAMING operator: arcs arrive continuously (the
IncrementalImmutableSequentialGraph regime,
IncrementalImmutableSequentialGraph.java:26-46), duplicates and all, and
each source node's state is its m-register HLL sketch — so "how many
distinct successors does this node have so far" is answered at any time
without storing successor sets.

Division of labor (the 100 TB posture):
- hashing stays JVM-side: ``xxhash64(dst, seed)`` is computed as a
  column BEFORE the stateful op, so Python never sees strings or does
  per-row hashing;
- the Python state function only does numpy register math on Arrow
  batches: reg index / rho from the int64 hash (the same sign-masked
  bit budget as the batch HyperBall), ``np.maximum`` merge against the
  m-byte state blob;
- state is m bytes per key (log2m=5 -> 32 bytes), the same packed
  posture as the batch engine's wide-column registers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_SIGN_MASK = 0x7FFFFFFFFFFFFFFF


def _alpha(m: int) -> float:
    # numpy twin of algos.hyperball._alpha
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _bitlen(x: np.ndarray) -> np.ndarray:
    """Exact integer bit length (MSB position + 1) — no float log2, which
    rounds for ints above 2^53."""
    r = np.zeros(x.shape, dtype=np.int64)
    v = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.int64(1) << s)
        r[big] += s
        v[big] >>= s
    return r + (v > 0)


def _rhos(h: np.ndarray, log2m: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) for int64 hashes — bit-identical to the
    batch HyperBall derivation (hyperball.py:170-176): reg = pmod(h, m),
    rho = 1 + leading zeros of the sign-masked remaining 63-log2m bits."""
    m = 1 << log2m
    reg = np.mod(h, m)  # numpy mod is floored => matches Spark pmod
    rest = (h & np.int64(_SIGN_MASK)) >> log2m
    budget = 63 - log2m
    rho = np.where(rest == 0, budget + 1, budget + 1 - _bitlen(rest))
    return reg.astype(np.int64), rho.astype(np.uint8)


def _estimate(regs: np.ndarray) -> float:
    """numpy twin of hyperball._estimate_expr (HLL + linear counting)."""
    m = len(regs)
    z = np.sum(np.power(2.0, -regs.astype(np.float64)))
    nnz = int(np.count_nonzero(regs))
    e_raw = _alpha(m) * m * m / z
    if e_raw < 2.5 * m and nnz < m:
        return float(m * np.log(m / (m - nnz)))
    return float(e_raw)


OUT_SCHEMA = StructType(
    [
        StructField("src", LongType()),
        StructField("arcs_seen", LongType()),
        StructField("distinct_est", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("regs", BinaryType()),
        StructField("arcs_seen", LongType()),
    ]
)


def streaming_distinct_outdegree(
    arcs: DataFrame,
    log2m: int = 5,
    seed: int = 31,
) -> DataFrame:
    """``(src, arcs_seen, distinct_est)`` updated per micro-batch.

    ``arcs`` is a STREAMING DataFrame with (src, dst); output mode is
    ``update`` (one row per source seen in the batch, carrying its
    cumulative state). The register state never shrinks, so estimates
    are monotone across batches and independent of how arcs are split
    into batches — the streaming answer equals the batch answer on the
    same arc multiset (tests/test_sources_streaming.py asserts this
    against an identical-math numpy batch twin and an exact-distinct
    tolerance gate).
    """
    m = 1 << log2m

    def update(key, pdfs, state):
        if state.exists:
            regs_b, seen = state.get
            regs = np.frombuffer(regs_b, dtype=np.uint8).copy()
        else:
            regs = np.zeros(m, dtype=np.uint8)
            seen = 0
        for pdf in pdfs:
            h = pdf["h"].to_numpy(dtype=np.int64)
            reg, rho = _rhos(h, log2m)
            np.maximum.at(regs, reg, rho)
            seen += len(h)
        state.update((regs.tobytes(), seen))
        yield pd.DataFrame(
            {
                "src": [key[0]],
                "arcs_seen": [seen],
                "distinct_est": [_estimate(regs)],
            }
        )

    hashed = arcs.select(
        "src", F.xxhash64(F.col("dst"), F.lit(seed)).alias("h")
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    return hashed.groupBy("src").applyInPandasWithState(
        update,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def batch_distinct_outdegree_twin(
    arcs_pdf: pd.DataFrame, log2m: int = 5, seed_hashes: np.ndarray | None = None
) -> pd.DataFrame:
    """Single-process oracle: identical register math over a pandas edge
    list whose ``h`` column holds the SAME JVM xxhash64 values (pass the
    hashed arcs collected from Spark so the hash function is shared, not
    reimplemented)."""
    m = 1 << log2m
    out = []
    for src, grp in arcs_pdf.groupby("src"):
        regs = np.zeros(m, dtype=np.uint8)
        reg, rho = _rhos(grp["h"].to_numpy(dtype=np.int64), log2m)
        np.maximum.at(regs, reg, rho)
        out.append((src, len(grp), _estimate(regs)))
    return pd.DataFrame(out, columns=["src", "arcs_seen", "distinct_est"])


FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("t1", LongType()),
        StructField("tk", LongType()),
    ]
)
FUNNEL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("steps_done", LongType()),
        StructField("t1", LongType()),
        StructField("tk", LongType()),
    ]
)


def streaming_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming twin of functions.mining.funnel_counts: a per-user
    funnel STATE MACHINE in ``applyInPandasWithState``.

    State per user = (steps completed, t1, t_last) — three longs, O(1)
    regardless of event volume. Each micro-batch walks its (filtered,
    time-sorted) events forward: an event advances the state iff it is
    the NEXT step and strictly later (epoch micros) than the current
    step time — exactly the batch operator's ordering rule, applied
    greedily in time order, which yields the identical minima when a
    user's events arrive time-ordered across batches (asserted in
    tests). A late event older than the current state time is IGNORED
    (the documented approximation every O(1)-state streaming funnel
    makes; replay cold for exact late-data semantics).

    Division of labor: type->step mapping and epoch-micros conversion
    happen JVM-side; Python sees (us, st) int columns only. Output mode
    ``update``: one row per user seen in the batch with its cumulative
    progress.
    """
    nsteps = len(steps)
    st = F.when(F.col(type_col) == steps[0], 1)
    for i, s in enumerate(steps[1:], start=2):
        st = st.when(F.col(type_col) == s, i)
    prepared = (
        events.where(F.col(type_col).isin(steps))
        .select(
            F.col(user_col).alias("user_id"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
            st.cast("long").alias("st"),
        )
    )

    def update(key, pdfs, state):
        if state.exists:
            k, t1, tk = state.get
        else:
            k, t1, tk = 0, -1, -1
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values("us", kind="mergesort")
        us = batch["us"].to_numpy(dtype=np.int64)
        stp = batch["st"].to_numpy(dtype=np.int64)
        for i in range(len(us)):
            if k == 0:
                if stp[i] == 1:
                    k, t1, tk = 1, int(us[i]), int(us[i])
            elif k < nsteps and stp[i] == k + 1 and us[i] > tk:
                k += 1
                tk = int(us[i])
        state.update((k, t1, tk))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "steps_done": [k],
                "t1": [t1],
                "tk": [tk],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return prepared.groupBy("user_id").applyInPandasWithState(
        update,
        FUNNEL_OUT_SCHEMA,
        FUNNEL_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
