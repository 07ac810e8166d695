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
- **one job per iteration**: convergence statistics (L-inf delta,
  changed-row counts, dangling mass) ride on the materializing action
  as ``Observation`` metrics instead of separate aggregate jobs — at
  hub-skew scale an extra full-table scan per iteration is real money.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F


def release_local_checkpoint(df: DataFrame) -> None:
    """Free the storage blocks behind an eagerly localCheckpointed
    DataFrame that is no longer reachable by any live plan.

    ``Dataset.localCheckpoint`` stores its blocks OUTSIDE the SQL cache
    manager, so ``DataFrame.unpersist()`` cannot reach them and they
    survive until the JVM ContextCleaner eventually collects the RDD —
    which, across a long iterative loop, means storage grows linearly
    with iteration count (measured: hash-min CC at 31.5M edges OOMs an
    8 GiB driver ~20 rounds in; each round's state blocks were still
    resident). An iteration loop knows the exact moment iteration k-1's
    state becomes garbage — the instant iteration k's state finishes
    materializing — so it can release the blocks deterministically
    instead of waiting for GC.

    Best-effort by design: only a LogicalRDD-backed frame (the plan
    shape an eager localCheckpoint produces) is touched; durable
    (parquet-backed) states and anything unexpected are left to the
    ContextCleaner. NEVER call this on a frame that may still be read —
    a released local checkpoint cannot be recomputed.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass


def eager_checkpoint(df: DataFrame) -> DataFrame:
    """persist → eager localCheckpoint → unpersist, in one action.

    The persist is load-bearing, not an optimization (same reason as in
    :func:`iterate`): Spark 4's ``localCheckpoint`` copies sizeInBytes
    stats from the SOURCE plan, and join-product estimates COMPOUND
    across nested checkpoints — BigInt digit counts double per level,
    costing minutes of driver CPU within a few dozen nested checkpoints.
    The InMemoryRelation interposed by ``persist`` caps the stats and
    resets the growth at every checkpoint. An ``Observation`` attached
    to ``df`` fires on the checkpoint job.
    """
    cached = df.persist()
    out = cached.localCheckpoint(eager=True)
    cached.unpersist()
    return out


def pin(df: DataFrame) -> DataFrame:
    """Materialize a shared sub-plan once so several downstream branches
    reuse the result instead of each recomputing it.

    Fault-tolerance aware: when the SparkContext has a RELIABLE
    checkpoint directory configured (``sc.setCheckpointDir``), uses
    ``df.checkpoint(eager=True)`` — replicated storage that survives
    executor loss, the right choice on a long-lived cluster run.
    Otherwise falls back to :func:`eager_checkpoint` (persist-capped
    eager local checkpoint) — fast, but the blocks are executor-local
    and unreplicated, so losing an executor mid-query aborts the query
    (a retry recomputes from source; results are never wrong).

    Either way this runs a Spark job at plan-construction time — by
    design: the pinned table feeds multiple plan branches, and a
    persist that is unpersisted before any action would never
    materialize, recomputing the sub-plan once per branch.

    Reliable-checkpoint housekeeping: Spark only deletes reliable
    checkpoint files when ``spark.cleaner.referenceTracking.
    cleanCheckpoints=true`` (default false) and the RDD is GC'd — on a
    long-lived cluster that repeatedly calls pinned analytics, set
    that conf (or point the checkpoint dir at storage with a TTL) so
    pins are reclaimed; otherwise each call leaves its materialized
    table under the checkpoint dir until the application exits.
    """
    try:
        ckdir = df.sparkSession.sparkContext.getCheckpointDir()
    except Exception:
        ckdir = None
    if ckdir:
        return df.checkpoint(eager=True)
    return eager_checkpoint(df)


@contextmanager
def iteration_confs(spark: SparkSession, extra: dict | None = None):
    """Pin loop-friendly confs for the duration of an iterative job.

    - AQE off: the loop's partitioning is chosen explicitly; adaptive
      re-planning adds per-iteration driver latency (~25% measured at
      1M edges) for no benefit on a fixed-shape recurrence.
    - auto-broadcast off: iteration state is co-partitioned with the
      edge table; the planner would otherwise rebuild a multi-MB
      broadcast of the state EVERY iteration at small-to-mid scale
      (explicit F.broadcast hints remain honored).
    - ``extra``: caller-pinned confs for the loop's scope (e.g.
      ``spark.sql.shuffle.partitions`` equal to the state partitioning
      so groupBy output co-partitions with the checkpointed state).
    """
    keys = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        **(extra or {}),
    }
    old: dict[str, str | None] = {}
    for k, v in keys.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


class CheckpointManager:
    """Manages ``<base_dir>/iter_<k>`` state snapshots + a lineage table."""

    def __init__(self, spark: SparkSession, base_dir: str, run_id: str = "run"):
        from ..sources.storage import preferred_format

        self.spark = spark
        self.base_dir = base_dir.rstrip("/")
        self.run_id = run_id
        # Iceberg when the runtime is on the classpath, parquet otherwise
        # (explicit substitution — see sources/storage.py + README)
        self.table_format = preferred_format(spark)
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
        from ..sources.storage import state_complete

        base = self._Path(self.base_dir)
        if not self._fs.exists(base):
            return []
        out = []
        for st in self._fs.listStatus(base):
            name = st.getPath().getName()
            if name.startswith("iter_") and state_complete(
                self._fs, self._Path, f"{self.base_dir}/{name}", self.table_format
            ):
                out.append(int(name[5:]))
        return sorted(out)

    def latest(self) -> tuple[int, DataFrame] | None:
        from ..sources.storage import read_state

        done = self.completed_iterations()
        if not done:
            return None
        k = done[-1]
        return k, read_state(self.spark, self._iter_path(k), self.table_format)

    # ----------------------------------------------------------- save
    def save(self, df: DataFrame, iteration: int, metrics: dict | None = None) -> DataFrame:
        """Write iteration state, append lineage rows, return the re-read
        (lineage-truncated, durable) DataFrame. The write IS the
        materializing action — attached Observations fire here."""
        from ..sources.storage import read_state, write_state

        path = self._iter_path(iteration)
        t0 = time.time()
        write_state(df, path, self.table_format)
        t_write_ms = int((time.time() - t0) * 1000)

        reread = read_state(self.spark, path, self.table_format)
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
    run_id: str = "run",
    stop=None,
):
    """Generic driver loop shared by the iterative algorithms.

    ``step(state, k) -> (new_state, metrics_dict, observation_or_None)``
    — attach convergence statistics to ``new_state`` via
    ``pyspark.sql.Observation`` so they ride the materializing action
    (ONE Spark job per iteration, no separate aggregate jobs).

    ``stop(obs_metrics: dict, k) -> bool`` decides convergence from the
    observed metrics; a 3-arg ``stop(obs_metrics, k, state)`` also
    receives the just-MATERIALIZED state (durable or localCheckpointed)
    so convergence rules may run a cheap follow-up aggregate on it
    without recomputing the step. With ``checkpoint_dir``, state is
    durable and the loop resumes from the last complete iteration.

    Returns (final_state, iterations_done, converged_flag).
    """
    import inspect

    stop_arity = len(inspect.signature(stop).parameters) if stop is not None else 0
    mgr = CheckpointManager(spark, checkpoint_dir, run_id) if checkpoint_dir else None
    k0 = 0
    state = state0
    if mgr is not None:
        got = mgr.latest()
        if got is not None:
            k0, state = got
    if k0 == 0:
        state = state.localCheckpoint(eager=True)

    done = False
    k = k0
    for k in range(k0 + 1, max_iter + 1):
        new_state, metrics, obs = step(state, k)
        if mgr is not None:
            new_state = mgr.save(new_state, k, metrics)  # action: write
        else:
            # persist THEN eagerly localCheckpoint: one action total
            # (the checkpoint job materializes through the cache and the
            # Observation fires on it). The persist is load-bearing, not
            # an optimization: Spark 4's localCheckpoint rewrites
            # LogicalRDD stats from the source plan, and join-product
            # sizeInBytes estimates COMPOUND across nested checkpoints
            # (BigInt digits double per iteration -> minutes of driver
            # CPU by iteration ~25); the InMemoryRelation in between
            # caps the stats and resets that growth every iteration.
            cached = new_state.persist()
            new_state = cached.localCheckpoint(eager=True)
            cached.unpersist()
        obs_metrics = dict(obs.get) if obs is not None else {}
        prev = state
        state = new_state
        # iteration k-1's blocks are garbage the moment k materialized
        # (bounds storage at 2 states instead of growing with rounds)
        release_local_checkpoint(prev)
        if stop is not None and (
            stop(obs_metrics, k, state) if stop_arity >= 3 else stop(obs_metrics, k)
        ):
            done = True
            break
    return state, k, done
