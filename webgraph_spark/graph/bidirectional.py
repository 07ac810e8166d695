"""Bidirectional graph view: forward + backward traversal over ONE
edge table (BidirectionalImmutableGraph.java:33-60 analog).

The reference pairs a graph with its transpose so callers can ask for
successors AND predecessors. The Spark-first analog is not two stored
graphs but ONE logical edge table kept in TWO physical partitionings:

- ``fwd``: hash-partitioned on ``src`` — any successor-side join
  (BFS frontier expansion, out-degree, message generation keyed by
  source) is exchange-free against it;
- ``bwd``: the transposed columns hash-partitioned on the NEW ``src``
  (= original dst) — predecessor-side joins are exchange-free too.

Both views share the same number of partitions so algorithms that
alternate directions (SCC forward/backward reachability, HITS,
SumSweep's alternating sweeps) never reshuffle the big table; only the
(small) frontier/state side of each join moves. At 100 TB this is the
difference between 2 stored copies with stable co-partitioning vs a
shuffle of the full arc table per direction switch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.degrees import in_degrees, out_degrees
from ..operators.transforms import transpose


class BidirectionalGraph:
    """Forward + backward co-partitioned views of an edge table.

    Lazily persists each direction on first use; ``unpersist()``
    releases both. ``successors_of``/``predecessors_of`` are
    driver-side point lookups (fixture/debug scale, like the
    reference's sequential iterators); the distributed surface is
    ``fwd``/``bwd`` + the degree frames.
    """

    def __init__(self, edges: DataFrame, num_partitions: int | None = None):
        spark = edges.sparkSession
        if num_partitions is None:
            num_partitions = int(
                spark.conf.get("spark.sql.shuffle.partitions", "32")
            )
        self.num_partitions = num_partitions
        self._fwd = edges.select("src", "dst").repartition(num_partitions, "src")
        self._bwd = transpose(edges.select("src", "dst")).repartition(
            num_partitions, "src"
        )
        self._fwd_live = False
        self._bwd_live = False

    @property
    def fwd(self) -> DataFrame:
        if not self._fwd_live:
            self._fwd = self._fwd.persist()
            self._fwd_live = True
        return self._fwd

    @property
    def bwd(self) -> DataFrame:
        """Transposed arcs: (src=original dst, dst=original src)."""
        if not self._bwd_live:
            self._bwd = self._bwd.persist()
            self._bwd_live = True
        return self._bwd

    def out_degrees(self, include_zero_for: DataFrame | None = None) -> DataFrame:
        return out_degrees(self.fwd, include_zero_for)

    def in_degrees(self, include_zero_for: DataFrame | None = None) -> DataFrame:
        # degree view of the transpose: outdegree of bwd == indegree
        return in_degrees(self.fwd, include_zero_for)

    def successors_of(self, node: int) -> list[int]:
        rows = self.fwd.where(F.col("src") == node).select("dst").collect()
        return sorted(r[0] for r in rows)

    def predecessors_of(self, node: int) -> list[int]:
        rows = self.bwd.where(F.col("src") == node).select("dst").collect()
        return sorted(r[0] for r in rows)

    def unpersist(self) -> None:
        if self._fwd_live:
            self._fwd.unpersist()
            self._fwd_live = False
        if self._bwd_live:
            self._bwd.unpersist()
            self._bwd_live = False
