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


def test_funnel_counts_vs_python(spark):
    from webgraph_spark.functions.mining import funnel_counts

    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    rows = []
    # user 1: full ordered funnel; user 2: B before A (breaks at step 2
    # only for the A-started chain); user 3: A then B same-microsecond
    # (must NOT chain); user 4: A,B,C spread wide (horizon test)
    ev = [
        (1, "A", 0), (1, "B", 10), (1, "C", 20),
        (2, "B", 0), (2, "A", 5), (2, "C", 9),
        (3, "A", 7), (3, "B", 7), (3, "C", 30),
        (4, "A", 0), (4, "B", 1), (4, "C", 1000),
    ]
    for u, t, off in ev:
        rows.append((u, base + dt.timedelta(microseconds=off), t))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")

    got = {
        r["step"]: (r["event_type"], r["n_users"], r["total_lag_us"])
        for r in funnel_counts(df, ["A", "B", "C"]).collect()
    }
    # step1: users 1,2,3,4 all have an A
    assert got[1] == ("A", 4, 0)
    # step2: u1 (B@10>0), u4 (B@1>0); u2 has no B after A@5; u3's B ties
    assert got[2] == ("B", 2, (10 - 0) + (1 - 0))
    # step3: u1 (C@20), u4 (C@1000)
    assert got[3] == ("C", 2, 20 + 1000)

    got_h = {
        r["step"]: r["n_users"]
        for r in funnel_counts(df, ["A", "B", "C"], horizon_us=100).collect()
    }
    assert got_h[3] == 1  # u4's C exceeds the 100us horizon
