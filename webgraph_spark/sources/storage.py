"""Table-format layer for durable artifacts (checkpoints, edge tables).

The north star stores the edge table and per-iteration state as
**Iceberg** tables. This sandbox's Spark distribution has NO Iceberg
runtime jars (verified: no iceberg-spark-runtime in $SPARK_HOME/jars),
so the engine writes plain parquet directories instead — an EXPLICIT,
isolated substitution, not a silent one: every durable write funnels
through :func:`write_state` / :func:`read_state`, which pick Iceberg
path-based tables (HadoopTables, ``format("iceberg")``) whenever the
runtime is on the classpath and fall back to parquet otherwise.
See README.md "Table formats".

Completion detection differs by format: parquet directories are
complete iff Spark's ``_SUCCESS`` marker exists; Iceberg tables are
complete iff the ``metadata`` directory holds a committed snapshot —
:func:`state_complete` hides the difference from CheckpointManager.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_ICEBERG_CLASS = "org.apache.iceberg.spark.source.IcebergSource"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(_ICEBERG_CLASS)
        return True
    except Exception:
        return False


def preferred_format(spark: SparkSession) -> str:
    return "iceberg" if iceberg_available(spark) else "parquet"


def write_state(df: DataFrame, path: str, fmt: str | None = None) -> str:
    """Write a durable state artifact; returns the format used."""
    fmt = fmt or preferred_format(df.sparkSession)
    if fmt == "iceberg":
        # path-based (HadoopTables) Iceberg table: atomic snapshot commit
        df.write.format("iceberg").mode("overwrite").save(path)
    else:
        df.write.mode("overwrite").parquet(path)
    return fmt


def read_state(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    fmt = fmt or preferred_format(spark)
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)


def state_complete(fs, Path, path: str, fmt: str) -> bool:
    """Atomic-completion check: _SUCCESS marker (parquet) or a committed
    Iceberg snapshot (metadata dir non-empty)."""
    if fmt == "iceberg":
        meta = Path(f"{path}/metadata")
        return fs.exists(meta) and len(fs.listStatus(meta)) > 0
    return fs.exists(Path(f"{path}/_SUCCESS"))
