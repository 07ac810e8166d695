"""Transcript generation + edge extraction invariants (FIXTURES.md §1-2)."""

from __future__ import annotations

import pandas as pd
import pytest

from webgraph_spark.datagen.transcripts import (
    TranscriptSpec,
    generate_transcripts,
    transcripts_pandas_oracle,
)
from webgraph_spark.graph.edges import (
    build_node_dictionary,
    edges_pandas_oracle,
    extract_edges,
)

SPEC = TranscriptSpec(seed=42)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_schema(spark):
    df = generate_transcripts(spark, n_convs=10, spec=SPEC)
    assert [f.name for f in df.schema.fields] == [
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
    ]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types["turn_idx"] == "int"
    assert types["ts"] == "timestamp"


def test_per_turn_text_equality_vs_oracle(spark):
    """The input_hint gate: per-turn text equality under stable
    (conv_id, turn_idx) ordering, Spark vs single-process pandas."""
    got = _sorted(generate_transcripts(spark, n_convs=50, spec=SPEC).toPandas())
    want = _sorted(transcripts_pandas_oracle(n_convs=50, spec=SPEC))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_partitioning_independence(spark):
    a = _sorted(
        generate_transcripts(spark, n_convs=30, spec=SPEC, num_partitions=1).toPandas()
    )
    b = _sorted(
        generate_transcripts(spark, n_convs=30, spec=SPEC, num_partitions=16).toPandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_turn_idx_dense_and_ts_increasing(spark):
    pdf = _sorted(generate_transcripts(spark, n_convs=40, spec=SPEC).toPandas())
    for _, grp in pdf.groupby("conv_id"):
        assert list(grp["turn_idx"]) == list(range(len(grp)))
        assert grp["ts"].is_monotonic_increasing
    assert set(pdf["role"]) <= {"user", "assistant", "tool"}
    # tool turns always carry a tool name
    assert pdf.loc[pdf["role"] == "tool", "tool"].notna().all()


@pytest.fixture(scope="module")
def graph50(spark):
    tr = generate_transcripts(spark, n_convs=50, spec=SPEC)
    nodes = build_node_dictionary(tr)
    edges = extract_edges(tr, nodes)
    return tr, nodes, edges


def test_node_dictionary_dense(spark, graph50):
    _, nodes, _ = graph50
    pdf = nodes.toPandas().sort_values("node_id").reset_index(drop=True)
    assert list(pdf["node_id"]) == list(range(len(pdf)))
    # turn nodes come first, ordered by (conv_id, turn_idx); tools after
    turns = pdf[pdf["kind"] == 0]
    tools = pdf[pdf["kind"] == 1]
    assert turns["node_id"].max() < tools["node_id"].min()
    keys = list(zip(turns["conv_id"], turns["turn_idx"]))
    assert keys == sorted(keys)
    assert list(tools["tool"]) == sorted(tools["tool"])


def test_edges_match_pandas_oracle(spark, graph50):
    tr, _, edges = graph50
    got = (
        edges.toPandas()
        .sort_values(["kind", "src", "dst"])
        .reset_index(drop=True)[["src", "dst", "kind"]]
    )
    want = (
        edges_pandas_oracle(tr.toPandas())
        .sort_values(["kind", "src", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_transcript_payload_queries(spark):
    """The three transcript-payload rollups (__spark_entry__): Markov
    tool ranks form a distribution, latency gaps are positive and
    complete, context windows respect the overflow-tolerant budget rule."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    qs = entry.queries()

    ranks = qs["transcript_tool_markov"](spark, sf).toPandas()
    assert ranks["rank"].sum() == pytest.approx(1.0, abs=1e-6)
    assert (ranks["rank"] > 0).all()

    lat = qs["transcript_turn_latency"](spark, sf).toPandas()
    assert set(lat["role"]) <= {"user", "assistant", "tool"}
    assert (lat["sum_gap_us"] >= lat["max_gap_us"]).all()
    assert (lat["max_gap_us"] > 0).all()
    # every turn except each conversation's first contributes one gap
    ev = spark.read.parquet(f"{sf}/events.parquet")
    n_turns = ev.count()
    n_convs = ev.select("user_id").distinct().count()
    assert int(lat["n_replies"].sum()) == n_turns - n_convs

    packed = qs["transcript_context_pack"](spark, sf).toPandas()
    # batch ids are dense from 0 per conversation; exclusive-prefix rule
    # means every non-final window starts below the budget boundary
    for _, grp in packed.groupby("conv_id"):
        bids = sorted(grp["batch_id"])
        assert bids == list(range(len(bids)))
    assert int(packed["n_turns"].sum()) == n_turns
