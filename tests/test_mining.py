"""Co-occurrence mining vs hand-computed support/lift."""

from webgraph_spark.functions.mining import cooccurrence


def test_cooccurrence_basic(spark):
    rows = [
        ("c1", "a"), ("c1", "b"), ("c1", "b"),  # dup item collapses
        ("c2", "a"), ("c2", "b"),
        ("c3", "a"),
        ("c4", "c"), ("c4", None),  # null item ignored, group counts
    ]
    df = spark.createDataFrame(rows, "conv string, tool string")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in cooccurrence(df, "conv", "tool").collect()
    }
    # N = 4 groups with >=1 item; n_a=3, n_b=2, n_ab=2
    ab = out[("a", "b")]
    assert ab["n_both"] == 2
    assert abs(ab["support"] - 0.5) < 1e-9
    assert abs(ab["lift"] - (2 * 4) / (3 * 2)) < 1e-6
    assert ("a", "c") not in out and ("b", "c") not in out


def test_cooccurrence_group_cap_drops_pathological_group(spark):
    rows = [("big", f"t{i}") for i in range(10)] + [
        ("s1", "t0"), ("s1", "t1"), ("s2", "t0"), ("s2", "t1"),
    ]
    df = spark.createDataFrame(rows, "conv string, tool string")
    out = cooccurrence(df, "conv", "tool", max_items_per_group=5).collect()
    pairs = {(r["item_a"], r["item_b"]): r["n_both"] for r in out}
    # only the small groups contribute pairs
    assert pairs == {("t0", "t1"): 2}
    # but N still counts the big group: support = 2/3
    r = [x for x in out if (x["item_a"], x["item_b"]) == ("t0", "t1")][0]
    assert abs(r["support"] - 2 / 3) < 1e-6


def test_cooccurrence_min_pair_count(spark):
    rows = [("c1", "a"), ("c1", "b"), ("c2", "a"), ("c2", "c")]
    df = spark.createDataFrame(rows, "conv string, tool string")
    out = cooccurrence(df, "conv", "tool", min_pair_count=2).collect()
    assert out == []


def test_transition_counts_vs_pandas(spark):
    import numpy as np
    import pandas as pd

    from webgraph_spark.functions.mining import transition_counts

    rng = np.random.default_rng(19)
    n = 400
    pdf = pd.DataFrame(
        {
            "g": rng.integers(0, 30, n),
            "o": np.arange(n),
            "lab": rng.choice(list("abcd"), n),
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        (r["src_label"], r["dst_label"]): (r["n"], r["p"])
        for r in transition_counts(df, "g", ["o"], "lab").collect()
    }
    # independent pandas twin: sort by (g, o), lag within group
    pdf = pdf.sort_values(["g", "o"])
    pdf["prev"] = pdf.groupby("g")["lab"].shift(1)
    pairs = pdf.dropna(subset=["prev"]).groupby(["prev", "lab"]).size()
    tot = pairs.groupby(level=0).sum()
    exp = {
        (a, b): (int(c), round(c / tot[a], 9))
        for (a, b), c in pairs.items()
    }
    assert got == exp
