"""webgraph_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the capabilities of vigna/webgraph (reference studied at
/root/reference, v3.6.12) as idiomatic Spark DataFrame programs:

- logical model: an edge DataFrame ``(src: long, dst: long [, label cols])``
  over nodes ``0..n-1`` (reference: ImmutableGraph.java:169 contract);
- physical accelerator: per-partition CSR blocks with gap-encoded successor
  arrays packed by Arrow-vectorized kernels (reference: BVGraph.java:349);
- transforms: transpose/symmetrize/simplify/union/compose/map/filters
  (reference: Transform.java);
- analytics: PageRank, hash-min connected components, label propagation,
  degree-ordered triangle counting, BFS, HyperBall-style approximate
  neighbourhood function (reference: algo/*.java);
- plus large-scale training-data pipeline operators (dedup, similarity
  search, text analysis) over document/embedding tables.

Nothing here is a port: the execution strategy is Catalyst + Tungsten via
the public DataFrame API; Python touches data only through Arrow-batched
pandas UDFs.
"""

__version__ = "0.1.0"
