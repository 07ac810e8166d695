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
