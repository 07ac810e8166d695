"""HyperBall vs exact BFS neighbourhood function.

Acceptance mirrors the reference's statistical tests: the estimate must
fall within 2x the theoretical RSD of the exact value in >= 9 of 10
checks (HyperBallTest.java:78-80, 104-108, Vysochanskii-Petunin)."""

from __future__ import annotations

import numpy as np
import pytest

from webgraph_spark.algos.hyperball import effective_diameter, hyperball
from webgraph_spark.datagen.graphs import (
    complete_graph,
    directed_cycle,
    erdos_renyi,
    erdos_renyi_numpy,
)


def nf_exact_numpy(adj: np.ndarray, max_t: int = 64) -> list[int]:
    """Exact NF(t) by boolean matrix closure (test-scale oracle —
    the NeighbourhoodFunction.java:44-49 regime)."""
    n = adj.shape[0]
    reach = np.eye(n, dtype=bool)
    out = [n]
    for _ in range(max_t):
        nxt = reach | (reach @ adj)
        out.append(int(nxt.sum()))
        if (nxt == reach).all():
            out.pop()
            break
        reach = nxt
    return out


def test_clique_nf(spark):
    n = 12
    g = complete_graph(spark, n)
    res = hyperball(g, log2m=6, max_t=5)
    # NF(0) = n, NF(1) = n^2 (everyone reaches everyone at distance 1)
    rsd = 1.04 / (2 ** (6 / 2))
    assert abs(res.nf[0] - n) <= 2 * rsd * n
    assert abs(res.nf[-1] - n * n) <= 2 * rsd * n * n
    assert res.converged


def test_cycle_nf_growth(spark):
    n = 16
    res = hyperball(directed_cycle(spark, n), log2m=6, max_t=20)
    # NF(t) = n*(t+1) for t < n; estimates must grow monotonically and
    # land near n^2
    assert res.converged
    assert res.iterations >= n - 2
    rsd = 1.04 / (2 ** (6 / 2))
    assert abs(res.nf[-1] - n * n) <= 2.5 * rsd * n * n
    assert all(b >= a * 0.99 for a, b in zip(res.nf, res.nf[1:]))


@pytest.mark.parametrize("seed", [1, 2])
def test_er_nf_vs_exact(spark, seed):
    n, p = 60, 0.05
    g = erdos_renyi(spark, n, p, seed=seed)
    adj = erdos_renyi_numpy(n, p, seed=seed)
    # isolated nodes don't appear in the edge table; restrict the oracle
    present = adj.any(axis=1) | adj.any(axis=0)
    exact = nf_exact_numpy(adj[np.ix_(present, present)], max_t=30)
    res = hyperball(g, log2m=6, max_t=30, seed=seed)
    rsd = 1.04 / (2 ** (6 / 2))
    # compare the final (saturated) NF values; 2x theoretical RSD
    got, want = res.nf[-1], exact[-1]
    assert abs(got - want) <= 2 * rsd * want, f"{got} vs {want}"
    # effective diameter within +-1 of exact (EstimateEffectiveDiameterTest)
    def eff(nfl):
        return effective_diameter([float(x) for x in nfl], 0.9)

    assert abs(eff(res.nf) - eff(exact)) <= 1.0


def test_effective_diameter_interpolation():
    # NF: 10, 55, 100 -> 90% of 100 = 90 reached between t=1 and t=2
    nf = [10.0, 55.0, 100.0]
    d = effective_diameter(nf, 0.9)
    assert 1.0 < d < 2.0
    assert effective_diameter([5.0], 0.9) == 0.0


@pytest.mark.parametrize("seed", [3, 4])
def test_nf_stats_matches_driver_formula(spark, seed):
    """Distributed nf_stats (one-row avg_distance/spid/eff-diameter
    frame, EstimateEffectiveDiameter analog) agrees with the driver-side
    nf_statistics/effective_diameter formulas on the same exact NF."""
    from webgraph_spark.algos.centrality import nf_exact, nf_stats
    from webgraph_spark.algos.hyperball import nf_statistics

    g = erdos_renyi(spark, 50, 0.06, seed=seed)
    exact_df = nf_exact(g)
    nf = [
        float(r.nf_exact)
        for r in exact_df.orderBy("t").collect()
    ]
    want = nf_statistics(nf)
    got = nf_stats(exact_df, quantile=0.9).collect()[0]
    assert abs(got.avg_distance - want["avg_distance"]) < 1e-9
    assert abs(got.spid - want["spid"]) < 1e-9
    assert abs(got.effective_diameter - want["effective_diameter"]) < 1e-9


def test_hyperball_centralities_2rsd_9of10(spark):
    """HyperBall harmonic/closeness-sum vs exact GeometricCentralities,
    the reference's own acceptance: within 2x theoretical RSD in >= 9 of
    10 seeded runs (HyperBallTest.java:78-80 posture), on one ER graph."""
    from webgraph_spark.algos.centrality import geometric_centralities
    import pyspark.sql.functions as F

    n, p = 50, 0.06
    g = erdos_renyi(spark, n, p, seed=7).persist()
    exact = (
        geometric_centralities(g)
        .agg(
            F.sum("harmonic").alias("h"),
            F.sum("reachable").alias("nf"),
        )
        .collect()[0]
    )
    log2m = 6
    rsd = 1.04 / (2 ** (log2m / 2))
    ok_h = ok_nf = 0
    for seed in range(10):
        res = hyperball(g, log2m=log2m, max_t=30, seed=100 + seed)
        got = res.centralities().agg(
            F.sum("harmonic").alias("h"), F.sum("reachable").alias("nf")
        ).collect()[0]
        if abs(got["h"] - exact["h"]) <= 2 * rsd * exact["h"]:
            ok_h += 1
        if abs(got["nf"] - exact["nf"]) <= 2 * rsd * exact["nf"]:
            ok_nf += 1
    g.unpersist()
    assert ok_h >= 9, f"harmonic sum within 2xRSD only {ok_h}/10"
    assert ok_nf >= 9, f"reachable sum within 2xRSD only {ok_nf}/10"


def test_hyperball_discount_matches_harmonic(spark):
    """A custom discount f(t)=1/t must reproduce the built-in harmonic
    accumulator exactly (HyperBall.java:227-250 extension surface)."""
    import pyspark.sql.functions as F

    g = erdos_renyi(spark, 40, 0.08, seed=3)
    res = hyperball(g, log2m=5, max_t=20, seed=5, discounts={"invd": lambda t: 1.0 / t})
    diff = (
        res.state.select(
            F.max(F.abs(F.col("harmonic") - F.col("disc_invd"))).alias("d")
        ).collect()[0]["d"]
    )
    assert diff < 1e-9


def test_anf_combine_and_jackknife():
    from webgraph_spark.algos.hyperball import combine_nfs, jackknife_nf, nf_statistics

    nfs = [[10.0, 50.0, 100.0], [10.0, 54.0, 104.0], [10.0, 52.0]]
    mean = combine_nfs(nfs)
    assert mean[0] == 10.0 and abs(mean[1] - 52.0) < 1e-9
    assert abs(mean[2] - (100.0 + 104.0 + 52.0) / 3) < 1e-9
    m, se = jackknife_nf(nfs[:2])
    assert abs(m[1] - 52.0) < 1e-9 and se[1] > 0
    stats = nf_statistics([10.0, 55.0, 100.0])
    # pmf over dist 1,2 = (45, 45)/90 -> mean 1.5, var 0.25, spid 1/6
    assert abs(stats["avg_distance"] - 1.5) < 1e-9
    assert abs(stats["spid"] - 0.25 / 1.5) < 1e-9


def test_delta_tail_bit_identical(spark):
    """The delta-state tail (base + overlay, only diverged rows
    rewritten) must be BIT-identical to the dense path — registers,
    est, every accumulator, and the NF curve (the NF increment is an
    exact decimal telescoping sum; see algos/hyperball.py). Also
    exercises overlay compaction (overlay_cap=1 forces a compact every
    round) and the dense-fallback path (delta_exit=3 forces it)."""

    def rows(res):
        return sorted(tuple(r) for r in res.state.collect())

    for g in (erdos_renyi(spark, 250, 0.02, seed=11), directed_cycle(spark, 20)):
        g = g.persist()
        full = hyperball(g, log2m=5, max_t=40, seed=31, systolic=False, delta_tail=False)
        dense = hyperball(g, log2m=5, max_t=40, seed=31, delta_tail=False)
        delta = hyperball(g, log2m=5, max_t=40, seed=31, delta_enter=10**9)
        assert any(r["mode"] == "delta" for r in delta.per_round)
        assert full.nf == dense.nf == delta.nf
        assert full.iterations == delta.iterations
        assert full.converged and delta.converged
        ref = rows(full)
        assert rows(delta) == ref
        compact = hyperball(
            g, log2m=5, max_t=40, seed=31, delta_enter=10**9, overlay_cap=1
        )
        assert compact.nf == full.nf and rows(compact) == ref
        fallback = hyperball(
            g, log2m=5, max_t=40, seed=31, delta_enter=10**9, delta_exit=3
        )
        assert fallback.nf == full.nf and rows(fallback) == ref
        g.unpersist()


def test_delta_tail_with_discounts(spark):
    """Discount accumulators ride the delta-tail update identically."""
    g = erdos_renyi(spark, 120, 0.04, seed=5).persist()
    kw = dict(log2m=4, max_t=30, seed=7, discounts={"exp": lambda t: 0.5**t})
    dense = hyperball(g, delta_tail=False, **kw)
    delta = hyperball(g, delta_enter=10**9, **kw)
    assert dense.nf == delta.nf
    a = sorted(tuple(r) for r in dense.state.collect())
    b = sorted(tuple(r) for r in delta.state.collect())
    g.unpersist()
    assert a == b


def test_hyperball_wide_vs_numpy_propagation(spark):
    """hyperball_wide (grouped registers, log2m=10) vs an independent
    numpy simulation: seed registers with the same hash contract
    (collected once from JVM expressions — the hash family is
    bit-matched elsewhere), then propagate register-wise max along arcs
    and evaluate the HLL estimate in plain Python. Convergence round,
    per-node estimates, harmonic accumulators, and the NF curve must
    all agree."""
    import numpy as np
    import pyspark.sql.functions as F
    from webgraph_spark.algos.hyperball import hyperball_wide, _alpha

    log2m, seed, max_t = 10, 31, 30
    m = 1 << log2m
    g = erdos_renyi(spark, 120, 0.05, seed=13).persist()
    res = hyperball_wide(g, log2m=log2m, max_t=max_t, seed=seed)

    arcs = [(r["src"], r["dst"]) for r in g.collect()]
    nodes = sorted({v for arc in arcs for v in arc})
    idx = {v: i for i, v in enumerate(nodes)}
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    h = F.xxhash64(F.col("node"), F.lit(seed))
    rest = F.shiftright(h.bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF)), log2m)
    budget = 63 - log2m
    rho = F.when(rest == F.lit(0), F.lit(budget + 1)).otherwise(
        F.lit(budget + 1) - F.length(F.conv(rest.cast("string"), 10, 2))
    )
    seeds = ndf.select(
        "node", F.pmod(h, F.lit(m)).alias("reg"), rho.alias("rho")
    ).collect()

    n = len(nodes)
    regs = np.zeros((n, m), dtype=np.int64)
    for r in seeds:
        regs[idx[r["node"]], int(r["reg"])] = int(r["rho"])
    succ = [[] for _ in range(n)]
    for s, d in arcs:
        succ[idx[s]].append(idx[d])

    def est_vec(rg):
        z = (2.0 ** (-rg.astype(float))).sum(axis=1)
        nnz = (rg > 0).sum(axis=1)
        e_raw = _alpha(m) * m * m / z
        lin = np.where(nnz < m, m * np.log(m / np.maximum(m - nnz, 1)), np.inf)
        return np.where((e_raw < 2.5 * m) & (nnz < m), lin, e_raw)

    est = est_vec(regs)
    nf = [est.sum()]
    harmonic = np.zeros(n)
    rounds = 0
    for t in range(1, max_t + 1):
        new = regs.copy()
        for i in range(n):
            for j in succ[i]:
                np.maximum(new[i], regs[j], out=new[i])
        if (new == regs).all():
            break
        rounds = t
        regs = new
        est_new = est_vec(regs)
        harmonic += (est_new - est) / t
        est = est_new
        nf.append(est.sum())
    g.unpersist()

    assert res.converged and res.iterations == rounds
    assert len(res.nf) == len(nf)
    for a, b in zip(res.nf, nf):
        assert abs(a - b) <= 1e-6 * abs(b)
    got = {r["node"]: (r["est"], r["harmonic"]) for r in res.state.collect()}
    for v in nodes:
        ge, gh = got[v]
        i = idx[v]
        assert abs(ge - est[i]) <= 1e-9 * max(abs(est[i]), 1.0)
        assert abs(gh - harmonic[i]) <= 1e-6 * max(abs(harmonic[i]), 1e-9)


def test_hyperball_wide_bounds(spark):
    from webgraph_spark.algos.hyperball import hyperball_wide

    g = directed_cycle(spark, 4)
    with pytest.raises(ValueError):
        hyperball(g, log2m=9)
    with pytest.raises(ValueError):
        hyperball_wide(g, log2m=8)
    with pytest.raises(ValueError):
        hyperball_wide(g, log2m=15)
