"""k-means vs an independent numpy Lloyd's loop; portable-HLL accuracy."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from webgraph_spark.functions.clustering import kmeans
from webgraph_spark.functions.sketches import hll_approx_distinct


def _lloyd_numpy(X, k, iters, round_to=9):
    cents = np.round(X[:k].astype(float), round_to)  # ids 0..k-1 smallest
    for _ in range(iters):
        d = np.round(
            ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), round_to
        )
        assign = d.argmin(axis=1)  # numpy argmin ties -> first = smallest
        new = cents.copy()
        for j in range(k):
            sel = X[assign == j]
            if len(sel):
                new[j] = np.round(sel.mean(axis=0), round_to)
        cents = new
    d = np.round(((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), round_to)
    return d.argmin(axis=1), cents


def test_kmeans_vs_numpy(spark):
    rng = np.random.RandomState(7)
    # three well-separated blobs in 8 dims
    X = np.concatenate(
        [rng.randn(30, 8) * 0.3 + c for c in (0.0, 5.0, -5.0)]
    ).astype(np.float32)
    rows = [(i, [float(x) for x in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got, cents = kmeans(df, k=3, iters=4, dim=8)
    gmap = {r["id"]: r["cluster"] for r in got.collect()}
    want, wcents = _lloyd_numpy(X.astype(float), 3, 4)
    for i in range(len(X)):
        assert gmap[i] == want[i], f"vec {i}"
    np.testing.assert_allclose(np.array(cents), wcents, atol=1e-9)


def test_kmeans_separated_blobs_recovered(spark):
    rng = np.random.RandomState(11)
    X = np.concatenate([rng.randn(40, 4) + c for c in (0.0, 20.0)])
    rows = [(i, [float(x) for x in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got, _ = kmeans(df, k=2, iters=3, dim=4)
    pdf = got.toPandas().sort_values("id")
    a = set(pdf.cluster[:40])
    b = set(pdf.cluster[40:])
    assert len(a) == 1 and len(b) == 1 and a != b


def test_hll_rsd_bound(spark):
    # one group with 5000 distinct values: |err| within 3 RSD at log2m=8
    df = spark.range(5000).select(
        F.lit("g").alias("grp"), F.col("id").alias("v")
    )
    out = hll_approx_distinct(df, ["grp"], "v", log2m=8).collect()[0]
    rsd = 1.04 / np.sqrt(256)
    assert out["exact_distinct"] == 5000
    assert out["rel_err"] <= 3 * rsd


def test_hll_small_range_linear_counting_is_tight(spark):
    # 40 distinct values in 256 registers -> linear counting regime
    df = spark.range(40).select(F.lit("g").alias("grp"), F.col("id").alias("v"))
    out = hll_approx_distinct(df, ["grp"], "v", log2m=8).collect()[0]
    assert abs(out["approx_distinct"] - 40) <= 5


def test_hll_deterministic_and_multiset_invariant(spark):
    df1 = spark.range(300).select(
        (F.col("id") % 7).cast("string").alias("grp"), F.col("id").alias("v")
    )
    # duplicating every row must not change the sketch
    df2 = df1.unionAll(df1)
    a = {r["grp"]: r["approx_distinct"] for r in
         hll_approx_distinct(df1, ["grp"], "v").collect()}
    b = {r["grp"]: r["approx_distinct"] for r in
         hll_approx_distinct(df2, ["grp"], "v").collect()}
    assert a == b


def test_hll_log2m_bounds():
    import pyspark.sql  # noqa: F401

    with pytest.raises(ValueError):
        hll_approx_distinct(None, ["g"], "v", log2m=3)


# ------------------------------------------------- Count-Min heavy hitters

def _zipf_items(spark):
    # item i appears (20 - i) times, i = 0..19: known exact counts
    rows = [(i,) for i in range(20) for _ in range(20 - i)]
    return spark.createDataFrame(rows, "item_id long")


def test_count_min_one_sided_and_exact_when_wide(spark):
    from webgraph_spark.functions.sketches import count_min_topk

    df = _zipf_items(spark)
    # w >> distinct items: no collisions possible to matter after min over d
    out = count_min_topk(df, "item_id", d=4, w=4096, k=20).toPandas()
    assert (out["overcount"] >= 0).all()  # CM one-sided guarantee
    assert (out["overcount"] == 0).all()  # wide sketch: exact
    top = out.sort_values(
        ["est_count", "item"], ascending=[False, True]
    ).reset_index(drop=True)
    assert top.loc[0, "item"] == "0" and top.loc[0, "est_count"] == 20


def test_count_min_tight_sketch_overcounts_but_never_under(spark):
    from webgraph_spark.functions.sketches import count_min_topk

    df = _zipf_items(spark)
    out = count_min_topk(df, "item_id", d=2, w=4, k=20).toPandas()
    # 20 distinct items in 4 buckets: collisions certain, but never undercount
    assert (out["est_count"] >= out["exact_count"]).all()
    assert (out["overcount"] > 0).any()


def test_count_min_multiset_additivity(spark):
    from webgraph_spark.functions.sketches import count_min_topk

    df = _zipf_items(spark)
    a = count_min_topk(df, "item_id", d=4, w=64, k=5).toPandas()
    b = count_min_topk(df.unionAll(df), "item_id", d=4, w=64, k=5).toPandas()
    pa = a.sort_values("item").reset_index(drop=True)
    pb = b.sort_values("item").reset_index(drop=True)
    assert list(pa["item"]) == list(pb["item"])
    assert (pb["est_count"].to_numpy() == 2 * pa["est_count"].to_numpy()).all()


# ------------------------------------------------- histogram quantiles

def test_histogram_quantiles_error_bound(spark):
    from webgraph_spark.functions.sketches import histogram_quantiles

    rng = np.random.RandomState(3)
    vals = rng.randn(5000) * 10 + 50
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = {r["q"]: r["est"] for r in
           histogram_quantiles(df, "v", [0.1, 0.5, 0.9], bins=256).collect()}
    width = (vals.max() - vals.min()) / 256
    for q in (0.1, 0.5, 0.9):
        exact = np.quantile(vals, q)
        assert abs(got[q] - exact) <= width + 1e-9, (q, got[q], exact)


def test_histogram_quantiles_merge_linearity(spark):
    from webgraph_spark.functions.sketches import histogram_quantiles

    rng = np.random.RandomState(8)
    vals = rng.rand(2000) * 100
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    lo, hi = float(vals.min()), float(vals.max())
    whole = histogram_quantiles(df, "v", [0.5], bins=64, lo=lo, hi=hi).collect()
    # same sketch computed over the doubled multiset: same quantiles
    doubled = histogram_quantiles(
        df.unionAll(df), "v", [0.5], bins=64, lo=lo, hi=hi
    ).collect()
    # doubling every count moves rank interpolation by at most one
    # in-bin position; estimates stay within one bin width
    assert abs(whole[0]["est"] - doubled[0]["est"]) <= (hi - lo) / 64 + 1e-9


def test_histogram_quantiles_monotone_and_extremes(spark):
    from webgraph_spark.functions.sketches import histogram_quantiles

    df = spark.range(1000).selectExpr("cast(id as double) as v")
    qs = [0.0, 0.25, 0.5, 0.75, 1.0]
    got = [r["est"] for r in sorted(
        histogram_quantiles(df, "v", qs, bins=128).collect(),
        key=lambda r: r["q"])]
    assert got == sorted(got)
    assert got[0] >= 0.0 and got[-1] <= 999.0 + (999.0 / 128)
