"""Engine-portable HyperLogLog approximate distinct counts per group.

The HyperBall machinery (algos/hyperball.py) keeps per-NODE HLL counters
for neighbourhood functions; this module exposes the same sketch as a
general aggregation surface — ``APPROX COUNT DISTINCT ... GROUP BY`` —
built on the portable md5 hash family (functions/hashing.py) so the
whole register file, not just the final estimate, is bit-identical in
Spark and the DuckDB oracle:

- hash: md5_long(value) — 60 non-negative bits in both engines;
- register index = h % m, rank rho = (#leading zero bits of the
  remaining 60 - log2m bits) + 1, computed by base-2 string length
  (integer-exact, no libm);
- the HLL indicator Z is carried as the EXACT integer
  zs = sum over registers of 2^(R - r) (absent registers contribute
  2^R), R = 61 - log2m; zs <= m * 2^R = 2^61 fits int64, so the only
  floating-point steps are the final estimate formula itself.

Scale posture: one groupBy (group, register) max + one groupBy (group)
sum — two uniform shuffles with map-side combine, the same shape Spark's
own approx_count_distinct lowers to, but with a deterministic,
cross-engine-reproducible register file (Spark's builtin uses its own
xxhash64 seeding, which no other engine reproduces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .hashing import md5_long, md5_long_sql


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_approx_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    log2m: int = 8,
    round_to: int = 6,
    with_exact: bool = True,
) -> DataFrame:
    """(group..., approx_distinct [, exact_distinct, rel_err]) via the
    portable HLL sketch with linear-counting small-range correction."""
    if not 4 <= log2m <= 16:
        raise ValueError("log2m must be in [4, 16]")
    m = 1 << log2m
    budget = 60 - log2m
    R = budget + 1
    h = md5_long(F.col(value_col).cast("string"))
    rest = F.shiftright(h, log2m)
    rho = F.when(rest == 0, F.lit(R)).otherwise(
        F.lit(R) - F.length(F.conv(rest.cast("string"), 10, 2))
    )
    regs = (
        df.select(*group_cols, (h % m).alias("reg"), rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("r"))
    )
    zterm = F.expr(f"shiftleft(cast(1 as bigint), {R} - cast(r as int))")
    agg = regs.groupBy(*group_cols).agg(
        F.sum(zterm).alias("zp"), F.count("*").alias("nnz")
    )
    zs = F.col("zp") + (F.lit(m) - F.col("nnz")) * F.lit(1 << R)
    raw = F.lit(_alpha(m) * m * m) / (zs.cast("double") / F.lit(float(2**R)))
    est = F.when(
        (raw < 2.5 * m) & (F.col("nnz") < m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / (F.lit(m) - F.col("nnz"))),
    ).otherwise(raw)
    out = agg.select(*group_cols, F.round(est, round_to).alias("approx_distinct"))
    if with_exact:
        exact = df.groupBy(*group_cols).agg(
            F.countDistinct(value_col).cast("long").alias("exact_distinct")
        )
        out = out.join(exact, group_cols).select(
            *group_cols,
            "approx_distinct",
            "exact_distinct",
            F.round(
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                round_to,
            ).alias("rel_err"),
        )
    return out


def hll_approx_distinct_sql(
    table: str,
    group_cols: list[str],
    value_col: str,
    log2m: int = 8,
    round_to: int = 6,
    with_exact: bool = True,
) -> str:
    """DuckDB twin of :func:`hll_approx_distinct` — same hash, same
    registers, same exact-integer Z, same estimate formula."""
    m = 1 << log2m
    budget = 60 - log2m
    R = budget + 1
    alpha = _alpha(m)
    g = ", ".join(group_cols)
    h = md5_long_sql(f"CAST({value_col} AS VARCHAR)")
    sql = f"""
WITH hashed AS MATERIALIZED (
  SELECT {g}, ({h}) AS h FROM {table}
),
regs AS MATERIALIZED (
  SELECT {g}, h % {m} AS reg,
         MAX(CASE WHEN h // {1 << log2m} = 0 THEN {R}
                  ELSE {R} - length(bin(h // {1 << log2m})) END) AS r
  FROM hashed GROUP BY {g}, reg
),
agg AS (
  SELECT {g},
         SUM(CAST(1 AS BIGINT) << ({R} - r)) AS zp,
         COUNT(*) AS nnz
  FROM regs GROUP BY {g}
),
est AS (
  -- zs is assembled in exact HUGEINT then converted once to DOUBLE, the
  -- same int->IEEE rounding Spark's int64 cast performs; literals are
  -- CAST to DOUBLE because DuckDB parses bare decimals as DECIMAL
  SELECT {g}, nnz,
         CAST({alpha!r} AS DOUBLE) * {m} * {m}
           / (CAST(CAST(zp AS HUGEINT)
                   + ({m} - nnz) * CAST({1 << R} AS HUGEINT) AS DOUBLE)
              / CAST({float(2 ** R)!r} AS DOUBLE)) AS raw
  FROM agg
),
final AS (
  SELECT {g},
         ROUND(CASE WHEN raw < 2.5 * {m} AND nnz < {m}
                    THEN CAST({float(m)!r} AS DOUBLE)
                         * LN(CAST({float(m)!r} AS DOUBLE) / ({m} - nnz))
                    ELSE raw END, {round_to}) AS approx_distinct
  FROM est
)"""
    if with_exact:
        sql += f"""
SELECT f.*, CAST(x.exact_distinct AS BIGINT) AS exact_distinct,
       ROUND(ABS(f.approx_distinct - x.exact_distinct) / x.exact_distinct,
             {round_to}) AS rel_err
FROM final f JOIN (
  SELECT {g}, COUNT(DISTINCT {value_col}) AS exact_distinct
  FROM {table} GROUP BY {g}
) x USING ({g})"""
    else:
        sql += "\nSELECT * FROM final"
    return sql


# ------------------------------------------------- Count-Min heavy hitters

def count_min_cells(
    df: DataFrame, item_col: str, d: int, w: int, seed: int
) -> DataFrame:
    """(i, bkt, cnt) sketch cells for one input chunk — ONE
    map-side-combined groupBy whose state is d*w cells regardless of row
    count. Count-Min is a LINEAR sketch: cells from disjoint chunks add
    cell-wise to the whole-stream sketch, which is what the streaming
    sink (streaming/events.py count_min_stream_sink) exploits."""
    from .hashing import universal_hash, hash_family

    a, b = hash_family(d, seed)
    occ = df.select(F.col(item_col).cast("string").alias("it"))
    h = md5_long(F.col("it"))
    return (
        occ.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            (universal_hash(h, a[i], b[i]) % w).alias("bkt"),
                        )
                        for i in range(d)
                    ]
                )
            ).alias("c")
        )
        .select("c.i", "c.bkt")
        .groupBy("i", "bkt")
        .agg(F.count("*").alias("cnt"))
    )


def count_min_estimates(
    cells: DataFrame,
    items: DataFrame,
    item_col: str,
    d: int,
    w: int,
    seed: int,
) -> DataFrame:
    """(item, est_count) for every distinct item in ``items``, looked up
    against a (possibly merged) cell table: min over the d probed cells.
    The sketch side is broadcast (d*w cells)."""
    from .hashing import universal_hash, hash_family

    a, b = hash_family(d, seed)
    occ = items.select(F.col(item_col).cast("string").alias("it")).distinct()
    h = md5_long(F.col("it"))
    melted = occ.select(
        "it",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        (universal_hash(h, a[i], b[i]) % w).alias("bkt"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("c"),
    ).select("it", "c.i", "c.bkt")
    merged = cells.groupBy("i", "bkt").agg(F.sum("cnt").alias("cnt"))
    return (
        melted.join(F.broadcast(merged), ["i", "bkt"])
        .groupBy("it")
        .agg(F.min("cnt").cast("long").alias("est_count"))
        .withColumnRenamed("it", "item")
    )


def count_min_topk(
    df: DataFrame,
    item_col: str,
    d: int = 4,
    w: int = 1024,
    k: int = 10,
    seed: int = 12345,
    with_exact: bool = True,
) -> DataFrame:
    """Top-k heavy hitters by Count-Min-estimated occurrence count.

    The sketch is d x w integer cells: cell(i, h_i(x) % w) accumulates
    every occurrence of x under the i-th portable universal hash;
    est(x) = min_i cell(i, h_i(x)) >= true count (one-sided error,
    classic CM guarantee). Building the sketch is ONE map-side-combined
    groupBy over d*w <= a few thousand cells — the aggregation state is
    sketch-sized no matter how many rows stream through, which is the
    whole point at 100 TB. Estimates for candidate items join the tiny
    sketch broadcast-side. All arithmetic is int64 — the oracle matches
    exactly, and ``overcount = est - exact`` is provably >= 0 (asserted
    by tests and visible in the driver query output).

    Returns (item, est_count, exact_count, overcount) top-k by
    (est_count desc, item asc).
    """
    occ = df.select(F.col(item_col).cast("string").alias("it"))
    cells = count_min_cells(df, item_col, d, w, seed)
    out = count_min_estimates(cells, occ, "it", d, w, seed)
    if with_exact:
        exact = occ.groupBy("it").agg(
            F.count("*").cast("long").alias("exact_count")
        ).withColumnRenamed("it", "item")
        out = out.join(exact, "item").select(
            "item",
            "est_count",
            "exact_count",
            (F.col("est_count") - F.col("exact_count")).alias("overcount"),
        )
    return out.orderBy(F.col("est_count").desc(), F.col("item")).limit(k)


def count_min_topk_sql(
    table: str,
    item_col: str,
    d: int = 4,
    w: int = 1024,
    k: int = 10,
    seed: int = 12345,
    with_exact: bool = True,
) -> str:
    """DuckDB twin of :func:`count_min_topk` (same hashes, same cells)."""
    from .hashing import hash_family, universal_hash_sql

    a, b = hash_family(d, seed)
    h = md5_long_sql(f"CAST({item_col} AS VARCHAR)")
    cell_selects = " UNION ALL ".join(
        f"SELECT {i} AS i, ({universal_hash_sql('h', a[i], b[i])}) % {w} AS bkt"
        f" FROM occ"
        for i in range(d)
    )
    exact_cols = (
        ", CAST(x.exact_count AS BIGINT) AS exact_count,"
        " CAST(e.est_count - x.exact_count AS BIGINT) AS overcount"
        if with_exact
        else ""
    )
    exact_join = (
        "JOIN (SELECT it, COUNT(*) AS exact_count FROM occ GROUP BY it) x"
        " ON e.it = x.it"
        if with_exact
        else ""
    )
    return f"""
WITH occ AS MATERIALIZED (
  SELECT CAST({item_col} AS VARCHAR) AS it, ({h}) AS h FROM {table}
),
melt AS MATERIALIZED ({cell_selects}),
cells AS MATERIALIZED (
  SELECT i, bkt, COUNT(*) AS cnt FROM melt GROUP BY i, bkt
),
cand AS MATERIALIZED (SELECT DISTINCT it, h FROM occ),
cand_b AS (
  {" UNION ALL ".join(
    f"SELECT it, {i} AS i, ({universal_hash_sql('h', a[i], b[i])}) % {w} AS bkt FROM cand"
    for i in range(d)
  )}
),
est AS (
  SELECT cb.it, CAST(MIN(c.cnt) AS BIGINT) AS est_count
  FROM cand_b cb JOIN cells c ON cb.i = c.i AND cb.bkt = c.bkt
  GROUP BY cb.it
)
SELECT e.it AS item, e.est_count{exact_cols}
FROM est e {exact_join}
ORDER BY e.est_count DESC, e.it LIMIT {k}
"""


# ------------------------------------------------- histogram quantiles

def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: list[float],
    bins: int = 256,
    lo: float | None = None,
    hi: float | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Approximate quantiles from a fixed-width histogram sketch.

    The third member of the engine's sketch family (HLL distinct,
    Count-Min heavy hitters, histogram quantiles): ONE
    map-side-combined groupBy over <= ``bins`` cells — aggregation
    state is sketch-sized regardless of row count, and histograms from
    disjoint chunks merge by cell-wise addition (linear, like CM).
    Estimate = left-closed linear interpolation inside the bin that
    crosses the target rank; the error bound is the bin width
    (hi - lo) / bins. ``lo``/``hi`` default to the exact min/max
    (one extra aggregation; pass them to stay single-pass at scale).

    Returns (q, est) — one row per requested quantile, deterministic
    integer-rank arithmetic so the SQL twin matches exactly.
    """
    if not quantiles or any(not (0.0 <= q <= 1.0) for q in quantiles):
        raise ValueError("quantiles must be in [0, 1]")
    v = F.col(value_col).cast("double")
    if lo is None or hi is None:
        row = df.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).collect()[0]
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    if hi <= lo:
        hi = lo + 1.0
    width = (hi - lo) / bins
    bin_col = F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")),
    )
    cells = (
        df.select(bin_col.alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("cnt"))
        .orderBy("b")
        .collect()
    )
    # cumulative walk over <= bins rows on the driver (sketch-sized)
    total = sum(r["cnt"] for r in cells)
    spark = df.sparkSession
    out_rows = []
    for q in quantiles:
        rank = q * (total - 1)  # 0-based fractional rank
        cum = 0
        est = hi
        for r in cells:
            b, cnt = r["b"], r["cnt"]
            if cum + cnt > rank:
                # interpolate inside this bin by rank position
                frac = (rank - cum + 1.0) / cnt
                est = lo + width * (b + min(1.0, max(0.0, frac)))
                break
            cum += cnt
        out_rows.append((float(q), round(est, round_to)))
    return spark.createDataFrame(out_rows, "q double, est double")


def histogram_quantiles_sql(
    table: str,
    value_col: str,
    quantiles: list[float],
    bins: int = 256,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`histogram_quantiles` (lo/hi from the same
    min/max aggregation, identical bin + interpolation arithmetic)."""
    qs = ", ".join(str(q) for q in quantiles)
    return f"""
WITH v AS (SELECT CAST({value_col} AS DOUBLE) AS v FROM {table}),
mm AS (SELECT MIN(v) AS lo,
              CASE WHEN MAX(v) <= MIN(v) THEN MIN(v) + 1.0 ELSE MAX(v) END AS hi
       FROM v),
cells AS MATERIALIZED (
  SELECT LEAST({bins} - 1, GREATEST(0,
           CAST(FLOOR((v - mm.lo) / ((mm.hi - mm.lo) / {bins})) AS INT))) AS b,
         COUNT(*) AS cnt
  FROM v, mm GROUP BY 1
),
tot AS (SELECT SUM(cnt) AS n FROM cells),
cum AS (
  SELECT b, cnt,
         SUM(cnt) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS cum0
  FROM cells
),
qs AS (SELECT CAST(unnest([{qs}]) AS DOUBLE) AS q),
hit AS (
  SELECT q.q, c.b, c.cnt, COALESCE(c.cum0, 0) AS cum0,
         ROW_NUMBER() OVER (PARTITION BY q.q ORDER BY c.b) AS rn
  FROM qs q JOIN cum c
    ON COALESCE(c.cum0, 0) + c.cnt > q.q * ((SELECT n FROM tot) - 1)
)
SELECT h.q,
       ROUND(mm.lo + ((mm.hi - mm.lo) / {bins}) *
             (h.b + LEAST(1.0, GREATEST(0.0,
               (h.q * ((SELECT n FROM tot) - 1) - h.cum0 + 1.0) / h.cnt))),
             {round_to}) AS est
FROM hit h, mm WHERE h.rn = 1
"""
