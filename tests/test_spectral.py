"""HITS and Katz vs independent numpy power iterations."""

import numpy as np
import pytest

from webgraph_spark.algos.spectral import hits, katz_centrality
from webgraph_spark.datagen.graphs import erdos_renyi, erdos_renyi_numpy


def _hits_numpy(adj, iters):
    n = adj.shape[0]
    h = np.full(n, 1.0 / n)
    a = np.full(n, 1.0 / n)
    for _ in range(iters):
        a = adj.T.astype(float) @ h
        a = a / a.sum()
        h = adj.astype(float) @ a
        h = h / h.sum()
    return h, a


def _katz_numpy(adj, alpha, beta, iters):
    n = adj.shape[0]
    x = np.full(n, beta)
    for _ in range(iters):
        x = beta + alpha * (adj.T.astype(float) @ x)
    return x


@pytest.mark.parametrize("n,p,seed", [(40, 0.1, 11), (80, 0.05, 12)])
def test_hits_vs_numpy(spark, n, p, seed):
    edges = erdos_renyi(spark, n, p, seed=seed)
    adj = erdos_renyi_numpy(n, p, seed=seed)
    res = hits(edges, iterations=6)
    pdf = res.scores.toPandas()
    hub = np.zeros(n)
    auth = np.zeros(n)
    hub[pdf["node"].to_numpy()] = pdf["hub"].to_numpy()
    auth[pdf["node"].to_numpy()] = pdf["authority"].to_numpy()
    want_h, want_a = _hits_numpy(adj, 6)
    present = adj.any(axis=1) | adj.any(axis=0)
    np.testing.assert_allclose(hub[present], want_h[present], atol=1e-9)
    np.testing.assert_allclose(auth[present], want_a[present], atol=1e-9)


@pytest.mark.parametrize("n,p,seed", [(50, 0.08, 13)])
def test_katz_vs_numpy(spark, n, p, seed):
    edges = erdos_renyi(spark, n, p, seed=seed)
    adj = erdos_renyi_numpy(n, p, seed=seed)
    out = katz_centrality(edges, alpha=0.05, beta=1.0, iterations=7).toPandas()
    got = np.zeros(n)
    got[out["node"].to_numpy()] = out["katz"].to_numpy()
    want = _katz_numpy(adj, 0.05, 1.0, 7)
    present = adj.any(axis=1) | adj.any(axis=0)
    np.testing.assert_allclose(got[present], want[present], rtol=1e-12)


def test_hits_star_extremes(spark):
    # hub 0 -> spokes 1..5: node 0 is the only hub, spokes the authorities
    arcs = [(0, i) for i in range(1, 6)]
    edges = spark.createDataFrame(arcs, "src long, dst long")
    res = hits(edges, iterations=4)
    got = {r.node: (r.hub, r.authority) for r in res.scores.collect()}
    assert got[0][0] == pytest.approx(1.0)
    assert got[0][1] == pytest.approx(0.0)
    for i in range(1, 6):
        assert got[i][0] == pytest.approx(0.0)
        assert got[i][1] == pytest.approx(0.2)


# ------------------------- eigenvector centrality + SALSA (round 3)

def _eigen_numpy(adj, iters):
    n = adj.shape[0]
    x = np.full(n, 1.0 / n)
    for _ in range(iters):
        y = adj.T.astype(float) @ x
        s = y.sum()
        x = y / s if s > 0 else np.zeros(n)
    return x


def _salsa_numpy(adj, iters):
    n = adj.shape[0]
    ind = adj.sum(axis=0)
    outd = adj.sum(axis=1)
    auth_nodes = ind > 0
    a = np.where(auth_nodes, 1.0 / auth_nodes.sum(), 0.0)
    for _ in range(iters):
        h = adj.astype(float) @ np.divide(
            a, ind, out=np.zeros(n), where=ind > 0
        )
        a = adj.T.astype(float) @ np.divide(
            h, outd, out=np.zeros(n), where=outd > 0
        )
    return a


@pytest.mark.parametrize("n,p,seed", [(50, 0.08, 61)])
def test_eigenvector_vs_numpy(spark, n, p, seed):
    from webgraph_spark.algos.spectral import eigenvector_centrality
    from webgraph_spark.operators.transforms import simplify

    edges = erdos_renyi(spark, n, p, seed=seed)
    adj = erdos_renyi_numpy(n, p, seed=seed)
    sym = ((adj | adj.T) & ~np.eye(n, dtype=bool))
    out = eigenvector_centrality(simplify(edges), iters=8).toPandas()
    got = np.zeros(n)
    got[out["node"].to_numpy()] = out["score"].to_numpy()
    want = _eigen_numpy(sym, 8)
    present = sym.any(axis=1)
    np.testing.assert_allclose(got[present], want[present], atol=1e-12)


def test_eigenvector_dag_drains_to_zero(spark):
    from webgraph_spark.algos.spectral import eigenvector_centrality

    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    out = eigenvector_centrality(edges, iters=5).toPandas()
    assert (out["score"] == 0.0).all()


@pytest.mark.parametrize("n,p,seed", [(50, 0.08, 62)])
def test_salsa_vs_numpy(spark, n, p, seed):
    from webgraph_spark.algos.spectral import salsa_authority

    edges = erdos_renyi(spark, n, p, seed=seed)
    adj = erdos_renyi_numpy(n, p, seed=seed)
    out = salsa_authority(edges, iters=4).toPandas()
    got = np.zeros(n)
    got[out["node"].to_numpy()] = out["auth"].to_numpy()
    want = _salsa_numpy(adj, 4)
    nz = want > 0
    np.testing.assert_allclose(got[nz], want[nz], atol=1e-12)
    # stochastic chain: mass preserved
    assert abs(out["auth"].sum() - 1.0) < 1e-9


def test_fiedler_bisection_splits_two_blocks(spark):
    """Two dense ER blocks joined by one bridge edge: the sign pattern
    must separate the blocks and agree with numpy's exact Fiedler
    vector (up to global sign)."""
    import numpy as np

    from webgraph_spark.algos.spectral import fiedler_bisection

    rng = np.random.RandomState(17)
    nb = 25
    n = 2 * nb
    adj = np.zeros((n, n), dtype=bool)
    for lo in (0, nb):
        for i in range(lo, lo + nb):
            for j in range(lo, lo + nb):
                if i < j and rng.rand() < 0.5:
                    adj[i, j] = adj[j, i] = True
    adj[0, nb] = adj[nb, 0] = True  # the bridge
    rows = [(int(u), int(v)) for u, v in zip(*np.nonzero(adj))]
    edges = spark.createDataFrame(rows, "src long, dst long")

    got = {
        r["node"]: r["score"]
        for r in fiedler_bisection(edges, iters=60).collect()
    }
    # numpy exact Fiedler vector
    d = adj.sum(axis=1)
    L = np.diag(d) - adj.astype(float)
    vals, vecs = np.linalg.eigh(L)
    fied = vecs[:, 1]
    # align global sign via node 0
    if fied[0] * got[0] < 0:
        fied = -fied
    agree = sum(1 for v in range(n) if got[v] * fied[v] > 0)
    assert agree >= int(0.95 * n), f"sign agreement {agree}/{n}"
    blocks = {v: (0 if v < nb else 1) for v in range(n)}
    side = {v: got[v] > 0 for v in range(n)}
    # the two blocks land on opposite sides (allow the bridge endpoints
    # to wobble)
    from collections import Counter

    c0 = Counter(side[v] for v in range(nb))
    c1 = Counter(side[v] for v in range(nb, n))
    assert c0.most_common(1)[0][1] >= nb - 1
    assert c1.most_common(1)[0][1] >= nb - 1
    assert c0.most_common(1)[0][0] != c1.most_common(1)[0][0]
