"""Bucketed edge-table storage: physical-plan proof that co-located
joins and aggregations skip the Exchange."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from webgraph_spark.datagen.graphs import erdos_renyi
from webgraph_spark.sources.storage import read_bucketed, write_bucketed_edges


@contextmanager
def _sql_confs(spark, confs: dict):
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_and_agg_have_no_scan_side_exchange(spark, tmp_path):
    e = erdos_renyi(spark, 300, 0.05, seed=2)
    write_bucketed_edges(
        e, "e_bucketed_t1", str(tmp_path / "e_bucketed"), buckets=8
    )
    try:
        be = read_bucketed(spark, "e_bucketed_t1")
        assert be.count() == e.count()

        with _sql_confs(spark, {
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.sources.bucketing.enabled": "true",
        }):
            # aggregation keyed on the bucket column: partial+final agg
            # collapse into one stage, zero Exchange
            agg = be.groupBy("src").agg(F.count("*").alias("outdeg"))
            p = _plan(agg)
            assert "Exchange" not in p, p

            # self-join on the bucket column: both sides pre-bucketed,
            # sort-merge join with zero Exchange
            j = be.alias("a").join(
                read_bucketed(spark, "e_bucketed_t1").alias("b"), "src"
            )
            pj = _plan(j)
            assert "Exchange" not in pj, pj
            assert j.count() > 0

            # control: the SAME join from the raw parquet path (bucket
            # spec dropped) DOES shuffle — the metadata is what saves it
            raw = spark.read.parquet(str(tmp_path / "e_bucketed"))
            pr = _plan(raw.alias("a").join(raw.alias("b"), "src"))
            assert "Exchange" in pr
    finally:
        spark.sql("DROP TABLE IF EXISTS e_bucketed_t1")


def test_bucketed_roundtrip_preserves_rows(spark, tmp_path):
    e = erdos_renyi(spark, 100, 0.1, seed=6)
    write_bucketed_edges(
        e, "e_bucketed_t2", str(tmp_path / "e2"), buckets=4
    )
    try:
        got = sorted(
            (r["src"], r["dst"]) for r in read_bucketed(spark, "e_bucketed_t2").collect()
        )
        want = sorted((r["src"], r["dst"]) for r in e.collect())
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS e_bucketed_t2")
