"""Iteration framework: durable per-iteration checkpoints, per-partition
lineage + metrics, resumable mid-run (north_rule requirement).

Reference analogs: HyperBall's external-memory update lists + its
`.properties`-style run metadata (HyperBall.java:300-307; BVGraph
properties BVGraph.java:2554-2650). In Spark the concerns map to:

- **lineage blowup**: every iterative DataFrame job grows its logical
  plan each round; writing state to parquet and re-reading truncates the
  plan AND yields durability (SURVEY.md §4 "iterative lineage control").
- **resumability**: each iteration directory is committed atomically by
  Spark's _SUCCESS marker; ``latest()`` finds the last complete
  iteration, so a killed run restarts exactly where it stopped.
- **per-partition lineage/metrics**: after each write we aggregate per
  output file (= per partition of the durable artifact): row count plus
  an order-insensitive BIT_XOR(xxhash64(*)) checksum — verifiable
  without re-reading history, stored in ``<base>/_lineage``.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F


class CheckpointManager:
    """Manages ``<base_dir>/iter_<k>`` state snapshots + a lineage table."""

    def __init__(self, spark: SparkSession, base_dir: str, run_id: str = "run"):
        self.spark = spark
        self.base_dir = base_dir.rstrip("/")
        self.run_id = run_id
        jvm = spark.sparkContext._jvm
        self._hconf = spark.sparkContext._jsc.hadoopConfiguration()
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(self.base_dir).getFileSystem(self._hconf)

    # ------------------------------------------------------------ paths
    def _iter_path(self, k: int) -> str:
        return f"{self.base_dir}/iter_{k:05d}"

    def _exists(self, path: str) -> bool:
        return self._fs.exists(self._Path(path))

    # --------------------------------------------------------- resume
    def completed_iterations(self) -> list[int]:
        base = self._Path(self.base_dir)
        if not self._fs.exists(base):
            return []
        out = []
        for st in self._fs.listStatus(base):
            name = st.getPath().getName()
            if name.startswith("iter_") and self._exists(
                f"{self.base_dir}/{name}/_SUCCESS"
            ):
                out.append(int(name[5:]))
        return sorted(out)

    def latest(self) -> tuple[int, DataFrame] | None:
        done = self.completed_iterations()
        if not done:
            return None
        k = done[-1]
        return k, self.spark.read.parquet(self._iter_path(k))

    # ----------------------------------------------------------- save
    def save(self, df: DataFrame, iteration: int, metrics: dict | None = None) -> DataFrame:
        """Write iteration state, append lineage rows, return the re-read
        (lineage-truncated, durable) DataFrame."""
        path = self._iter_path(iteration)
        t0 = time.time()
        df.write.mode("overwrite").parquet(path)
        t_write_ms = int((time.time() - t0) * 1000)

        reread = self.spark.read.parquet(path)
        cols = [F.col(c) for c in reread.columns]
        per_file = (
            reread.groupBy(F.input_file_name().alias("file"))
            .agg(
                F.count("*").alias("rows"),
                F.bit_xor(F.xxhash64(*cols)).alias("checksum"),
            )
            .select(
                F.lit(self.run_id).alias("run_id"),
                F.lit(iteration).alias("iteration"),
                "file",
                "rows",
                "checksum",
                F.lit(t_write_ms).alias("t_write_ms"),
                F.current_timestamp().alias("ts"),
                F.lit(str(metrics or {})).alias("metrics"),
            )
        )
        per_file.write.mode("append").parquet(f"{self.base_dir}/_lineage")
        return reread

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.base_dir}/_lineage")


def iterate(
    spark: SparkSession,
    state0: DataFrame,
    step,
    max_iter: int,
    checkpoint_dir: str | None = None,
    converged=None,
    run_id: str = "run",
    start_iteration: int | None = None,
):
    """Generic driver loop shared by the iterative algorithms.

    ``step(state, k) -> (new_state, metrics_dict)``;
    ``converged(old_state, new_state, k) -> bool`` (optional).
    With ``checkpoint_dir``, resumes from the last complete iteration.
    Returns (final_state, iterations_done, converged_flag).
    """
    mgr = CheckpointManager(spark, checkpoint_dir, run_id) if checkpoint_dir else None
    k0 = 0
    state = state0
    if mgr is not None and start_iteration is None:
        got = mgr.latest()
        if got is not None:
            k0, state = got
    state = state.persist()
    state.count()

    done = False
    k = k0
    for k in range(k0 + 1, max_iter + 1):
        new_state, metrics = step(state, k)
        if mgr is not None:
            new_state = mgr.save(new_state, k, metrics)
        else:
            new_state = new_state.persist().localCheckpoint(eager=True)
        new_state = new_state.persist()
        new_state.count()
        if converged is not None and converged(state, new_state, k):
            done = True
        state.unpersist()
        state = new_state
        if done:
            break
    return state, k, done
