"""Export sinks (WebGraph2Dot / JungAdapter analogs, tool/WebGraph2Dot.java).

Fixture-scale: dot text for visual inspection of small graphs. The
production sinks are the parquet/Iceberg tables written elsewhere."""

from __future__ import annotations

from pyspark.sql import DataFrame


def to_dot(edges: DataFrame, name: str = "g", max_arcs: int = 10_000) -> str:
    """GraphViz dot text of a small edge DataFrame."""
    rows = edges.select("src", "dst").distinct().limit(max_arcs + 1).collect()
    if len(rows) > max_arcs:
        raise ValueError(f"graph too large for dot export (> {max_arcs} arcs)")
    body = "\n".join(f"  {r.src} -> {r.dst};" for r in rows)
    return f"digraph {name} {{\n{body}\n}}\n"


def write_dot(edges: DataFrame, path: str, name: str = "g") -> None:
    with open(path, "w") as f:
        f.write(to_dot(edges, name))
