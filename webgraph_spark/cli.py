"""Command-line tool surface mirroring the reference's main classes.

The reference is driven through per-class ``main()`` entry points
(``java it.unimi.dsi.webgraph.BVGraph -o ...``, ``...webgraph.Transform
transpose src dst``, ``...algo.HyperBall``, Stats, Check,
ArcListASCIIGraph, tool/ExtractComponent, WebGraph2Dot, examples/
ErdosRenyiGraph — every file with a ``public static void main``). This
module is the Spark-first equivalent: one subcommand per tool, edge
tables as parquet ``(src, dst [, label...])`` directories instead of
``.graph`` basenames, results as parquet or a JSON line on stdout.

    python -m webgraph_spark stats -i edges/ [--degrees out/]
    python -m webgraph_spark transform transpose -i edges/ -o out/
    python -m webgraph_spark pack --format bv -i edges/ -o blocks/
    python -m webgraph_spark pagerank -i edges/ -o ranks/ --tol 1e-6
    python -m webgraph_spark hyperball -i edges/ --log2m 6

Every subcommand is a thin argparse dispatch into the library — no
logic lives here, so the CLI and the Python API cannot drift.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from .session import get_spark

    return get_spark(
        "webgraph_spark_cli",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )


def _edges(spark, path):
    return spark.read.parquet(path)


def _emit_df(df, args, order=None):
    """Write ``--output`` parquet, else print the first ``--show`` rows."""
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
    else:
        if order:
            df = df.orderBy(*order)
        for row in df.limit(args.show).collect():
            print(json.dumps(row.asDict(), default=str))


def _emit_json(obj):
    print(json.dumps(obj, default=str))


# ---------------------------------------------------------------- tools


def cmd_stats(args):
    """Stats sink: one-row property summary (+ degree distributions)."""
    from .operators.degrees import degree_distribution, graph_stats

    spark = _spark(args)
    e = _edges(spark, args.input)
    row = graph_stats(e).collect()[0].asDict()
    _emit_json(row)
    if args.degrees:
        for d in ("out", "in"):
            degree_distribution(e, direction=d).write.mode(
                "overwrite"
            ).parquet(f"{args.degrees}/{d}")


def cmd_check(args):
    """Check.symmetry analog."""
    from .operators.transforms import is_symmetric

    spark = _spark(args)
    _emit_json({"symmetric": is_symmetric(_edges(spark, args.input))})


def _require_other(args, op):
    if not args.other:
        raise SystemExit(
            f"transform {op} requires --other (second graph / mapping / "
            "node-set parquet)"
        )


_TRANSFORMS = (
    "transpose symmetrize simplify no-loops gray lex degree-order "
    "random-perm map union compose line-graph induced degree-range "
    "label-geq label-in"
).split()


def cmd_transform(args):
    """Transform.java main: graph-to-graph operators."""
    from .operators import transforms as T

    spark = _spark(args)
    e = _edges(spark, args.input)
    op = args.op
    perm = None
    if op == "transpose":
        out = T.transpose(e)
    elif op == "symmetrize":
        out = T.symmetrize(e)
    elif op == "simplify":
        out = T.simplify(e)
    elif op == "no-loops":
        out = T.no_loops(e)
    elif op == "gray":
        out, perm = T.gray_code_permutation(e)
    elif op == "lex":
        out, perm = T.lexicographical_permutation(e)
    elif op == "degree-order":
        out, perm = T.degree_ordered_permutation(e)
    elif op == "random-perm":
        out, perm = T.random_permutation(e, seed=args.seed)
    elif op == "map":
        _require_other(args, op)
        out = T.map_nodes(e, spark.read.parquet(args.other))
    elif op == "union":
        _require_other(args, op)
        out = T.union_graphs(e, _edges(spark, args.other))
    elif op == "compose":
        _require_other(args, op)
        out = T.compose(e, _edges(spark, args.other))
    elif op == "line-graph":
        out, perm = T.line_graph(e)  # perm = arc_id -> (src, dst) map
    elif op == "induced":
        _require_other(args, op)
        out, perm = T.induced_subgraph(e, spark.read.parquet(args.other))
    elif op == "degree-range":
        out, perm = T.degree_range_subgraph(e, args.min_deg, args.max_deg)
    elif op == "label-geq":
        out = T.label_lower_bound(e, args.label_col, args.threshold)
    elif op == "label-in":
        if not args.values:
            raise SystemExit("transform label-in requires --values")
        out = T.label_in_set(e, args.label_col, args.values.split(","))
    else:  # pragma: no cover - argparse choices guard this
        raise SystemExit(f"unknown transform {op}")
    _emit_df(out, args, order=["src", "dst"])
    if perm is not None and args.perm_out:
        perm.write.mode("overwrite").parquet(args.perm_out)


def cmd_pack(args):
    """BVGraph.store / EFGraph.store / CSR pack (--bits: compression
    stats the way the reference's store main prints them)."""
    if not args.output:
        raise SystemExit("pack requires --output")
    spark = _spark(args)
    e = _edges(spark, args.input)
    if args.format == "csr":
        from .operators.csr import gamma_bits_per_link, pack_csr

        blocks, bits_fn = pack_csr(e, num_blocks=args.blocks), gamma_bits_per_link
    elif args.format == "ef":
        from .operators.ef import ef_bits_per_link, pack_ef

        blocks, bits_fn = pack_ef(e, num_blocks=args.blocks), ef_bits_per_link
    else:
        from .operators.bvfull import bv_full_model_bits, pack_bv_full

        blocks, bits_fn = (
            pack_bv_full(e, num_blocks=args.blocks),
            bv_full_model_bits,
        )
    blocks.write.mode("overwrite").parquet(args.output)
    # count/bits from the WRITTEN files — blocks.count() would replay
    # the whole pack lineage a second time
    stored = spark.read.parquet(args.output)
    info = {"format": args.format, "blocks": stored.count()}
    if args.bits:
        info.update(bits_fn(stored).collect()[0].asDict())
    _emit_json(info)


def cmd_bvstore(args):
    """BVGraph.store to the reference's NATIVE on-disk layout
    (basename.graph/.offsets/.properties) — the interop export path;
    driver-side sequential encoder (sources/bvdisk.py docstring)."""
    from .sources.bvdisk import write_bvgraph_from_edges

    if not args.basename:
        raise SystemExit("bvstore requires --basename")
    spark = _spark(args)
    e = _edges(spark, args.input)
    codings = {}
    if args.residuals:
        codings["residuals"] = args.residuals
    kw = dict(
        window_size=args.window_size,
        max_ref_count=args.max_ref_count,
        min_interval_length=args.min_interval_length,
        zeta_k=args.zeta_k,
        codings=codings or None,
    )
    if args.distributed:
        from .sources.bvdisk import write_bvgraph_distributed

        stats = write_bvgraph_distributed(
            e, args.basename, label_col=args.label_col,
            label_kind=args.label_kind, label_width=args.label_width,
            **kw
        )
    elif args.label_col:
        from .sources.bvdisk import write_bvgraph_labelled_from_edges

        stats = write_bvgraph_labelled_from_edges(
            e.withColumnRenamed(args.label_col, "label"),
            args.basename, label_kind=args.label_kind,
            label_width=args.label_width, **kw,
        )
    else:
        stats = write_bvgraph_from_edges(e, args.basename, **kw)
    _emit_json(stats)


def cmd_bvload(args):
    """BVGraph.load from a reference-layout basename -> edge table
    (distributed byte-range decode; labelled basenames return
    (src, dst, label) via the graphclass dispatch)."""
    from .sources.storage import load_graph

    spark = _spark(args)
    out = load_graph(spark, args.basename)
    _emit_df(out, args, order=["src", "dst"])
    try:
        from .sources.bvdisk import bvgraph_stats

        _emit_json(bvgraph_stats(args.basename))
    except ValueError:
        # labelled basename: report from the UNDERLYING graph's
        # offsets/properties — never re-run the distributed decode
        # just for a count
        import os

        from .sources.bvdisk import bvgraph_stats, read_labelled_properties

        und = read_labelled_properties(args.basename)["underlyinggraph"]
        if not os.path.isabs(und):
            und = os.path.join(os.path.dirname(args.basename), und)
        _emit_json({"labelled": True, **bvgraph_stats(und)})


def cmd_unpack(args):
    """BVGraph.load / EFGraph.load / CSR scan back to an edge table."""
    spark = _spark(args)
    blocks = spark.read.parquet(args.input)
    if args.format == "csr":
        from .operators.csr import unpack_csr

        out = unpack_csr(blocks)
    elif args.format == "ef":
        from .operators.ef import unpack_ef

        out = unpack_ef(blocks)
    else:
        from .operators.bvfull import unpack_bv_full

        out = unpack_bv_full(blocks)
    _emit_df(out, args, order=["src", "dst"])


def cmd_arclist(args):
    """ArcListASCIIGraph / ShiftedByOne / ASCIIGraph / scattered arcs."""
    from .sources import arclist as A

    spark = _spark(args)
    if args.direction == "import":
        if args.format == "arclist":
            out = A.read_arclist(spark, args.input, shift=args.shift)
        elif args.format == "ascii":
            out = A.read_asciigraph(spark, args.input)
        else:
            out, mapping = A.read_scattered_arcs(spark, args.input)
            if args.perm_out:
                mapping.write.mode("overwrite").parquet(args.perm_out)
        _emit_df(out, args, order=["src", "dst"])
    else:
        e = _edges(spark, args.input)
        if not args.output:
            raise SystemExit("arclist export requires --output")
        if args.format == "ascii":
            A.write_asciigraph(e, args.output)
        else:
            A.write_arclist(e, args.output)


def cmd_generate_transcripts(args):
    """Synthesize the deterministic transcript table (conv_id, turn_idx,
    role, text, tool, ts) at small scale — the input_hint shape."""
    from .datagen.transcripts import generate_transcripts

    spark = _spark(args)
    t = generate_transcripts(spark, n_convs=args.n_convs)
    if not args.output:
        raise SystemExit("generate-transcripts requires --output")
    t.write.mode("overwrite").parquet(args.output)
    _emit_json({"conversations": args.n_convs, "turns": t.count()})


def cmd_ingest(args):
    """Transcripts → node dictionary + link-graph edge table (the
    BuildHostMap / ScatteredArcsASCIIGraph ingestion analog)."""
    from .graph.edges import build_node_dictionary, extract_edges

    spark = _spark(args)
    t = spark.read.parquet(args.input)
    nodes = build_node_dictionary(t)
    edges = extract_edges(t, nodes)
    if args.nodes_out:
        nodes.write.mode("overwrite").parquet(args.nodes_out)
        # count from the written parquet (cmd_pack's pattern) — never
        # re-run the dictionary/join lineage just for a count
        nodes = spark.read.parquet(args.nodes_out)
    else:
        nodes = nodes.persist()
    _emit_df(edges, args, order=["src", "dst"])
    if args.output:
        edges = spark.read.parquet(args.output)
    else:
        edges = edges.persist()
    _emit_json({"nodes": nodes.count(), "arcs": edges.count()})


def cmd_erdosrenyi(args):
    """examples/ErdosRenyiGraph: seeded generator."""
    from .datagen.graphs import erdos_renyi

    spark = _spark(args)
    _emit_df(
        erdos_renyi(spark, args.n, args.p, seed=args.seed),
        args,
        order=["src", "dst"],
    )


def cmd_pagerank(args):
    from .algos.pagerank import pagerank

    spark = _spark(args)
    res = pagerank(
        _edges(spark, args.input).select("src", "dst"),
        alpha=args.alpha,
        tol=args.tol,
        max_iter=args.max_iter,
        checkpoint_dir=args.checkpoint_dir,
    )
    _emit_df(res.ranks, args, order=["node"])
    _emit_json(
        {
            "iterations": res.iterations,
            "converged": res.converged,
            "delta": res.delta,
        }
    )


def cmd_cc(args):
    from .algos import components as C

    spark = _spark(args)
    e = _edges(spark, args.input).select("src", "dst")
    algo = "stars" if args.stars else args.algorithm
    res = C.connected_components(
        e, checkpoint_dir=args.checkpoint_dir, algorithm=algo
    )
    _emit_df(res.labels, args, order=["node"])
    _emit_json({"iterations": res.iterations, "converged": res.converged})


def cmd_scc(args):
    from .algos.scc import scc_coloring

    spark = _spark(args)
    _emit_df(
        scc_coloring(_edges(spark, args.input).select("src", "dst")),
        args,
        order=["node"],
    )


def cmd_lp(args):
    from .algos.labelprop import label_propagation

    spark = _spark(args)
    res = label_propagation(
        _edges(spark, args.input).select("src", "dst"),
        max_iter=args.max_iter,
        checkpoint_dir=args.checkpoint_dir,
    )
    _emit_df(res.labels, args, order=["node"])
    _emit_json({"iterations": res.iterations, "converged": res.converged})


def cmd_triangles(args):
    from .algos import triangles as T

    spark = _spark(args)
    e = _edges(spark, args.input).select("src", "dst")
    if args.per_node:
        _emit_df(T.triangles_per_node(e), args, order=["node"])
    else:
        _emit_json({"triangles": T.triangle_count(e)})


def cmd_bfs(args):
    from .algos.bfs import bfs

    spark = _spark(args)
    res = bfs(_edges(spark, args.input).select("src", "dst"), [args.root])
    _emit_df(res.distances, args, order=["node"])
    _emit_json({"rounds": res.rounds})


def cmd_nf(args):
    """NeighbourhoodFunction (exact) + interpolated effective diameter."""
    from .algos.bfs import neighbourhood_function_exact
    from .algos.hyperball import effective_diameter

    spark = _spark(args)
    nf = neighbourhood_function_exact(
        _edges(spark, args.input).select("src", "dst"), max_t=args.max_t
    )
    _emit_json({"nf": nf, "effective_diameter": effective_diameter(nf)})


def cmd_hyperball(args):
    from .algos.hyperball import hyperball

    spark = _spark(args)
    res = hyperball(
        _edges(spark, args.input).select("src", "dst"),
        log2m=args.log2m,
        max_t=args.max_t,
        seed=args.seed,
    )
    if args.output:
        res.centralities().write.mode("overwrite").parquet(args.output)
    from .algos.hyperball import effective_diameter

    _emit_json(
        {
            "nf": res.nf,
            "effective_diameter": effective_diameter(res.nf),
            "iterations": res.iterations,
            "converged": res.converged,
            "log2m": res.log2m,
        }
    )


def cmd_geometric(args):
    """GeometricCentralities (exact, all or sampled sources)."""
    from .algos.centrality import geometric_centralities

    spark = _spark(args)
    sources = (
        [int(s) for s in args.sources.split(",")] if args.sources else None
    )
    _emit_df(
        geometric_centralities(
            _edges(spark, args.input).select("src", "dst"), sources=sources
        ),
        args,
        order=["source"],
    )


def cmd_betweenness(args):
    from .algos import betweenness as B

    spark = _spark(args)
    e = _edges(spark, args.input).select("src", "dst")
    if args.samples:
        out = B.betweenness_sampled(e, n_samples=args.samples, seed=args.seed)
    else:
        out = B.betweenness(e)
    _emit_df(out, args, order=["node"])


def cmd_topk(args):
    """TopKGeometricCentrality (CutClos-pruned)."""
    from .algos.topk import top_k_geometric

    spark = _spark(args)
    res = top_k_geometric(
        _edges(spark, args.input).select("src", "dst"),
        k=args.k,
        centrality=args.centrality,
    )
    _emit_df(res.to_df(spark), args)


def cmd_sumsweep(args):
    from .algos import sumsweep as S

    spark = _spark(args)
    e = _edges(spark, args.input).select("src", "dst")
    res = (
        S.four_sweep_ifub(e) if args.undirected else S.sum_sweep_directed(e)
    )
    _emit_json(
        {
            "diameter": res.diameter,
            "radius": res.radius,
            "certified": res.certified,
            "sweeps": res.sweeps,
        }
    )


def cmd_distance_cdf(args):
    """SampleDistanceCumulativeDistributionFunction."""
    from .algos.centrality import distance_cdf

    spark = _spark(args)
    _emit_df(
        distance_cdf(
            _edges(spark, args.input).select("src", "dst"),
            [int(s) for s in args.sources.split(",")],
        ),
        args,
        order=["dist"],
    )


def cmd_extract_component(args):
    """tool/ExtractComponent: keep the largest (or a given) component."""
    from .algos import components as C
    from .operators.transforms import induced_subgraph

    spark = _spark(args)
    e = _edges(spark, args.input).select("src", "dst")
    if args.component is None:
        out = C.largest_component(e)
        if isinstance(out, tuple):
            out = out[0]
    else:
        from pyspark.sql import functions as F

        labels = C.connected_components(e).labels
        keep = labels.where(
            F.col("component") == args.component
        ).select("node")
        out, _ = induced_subgraph(e, keep, reindex=False)
    _emit_df(out, args, order=["src", "dst"])


def cmd_equals(args):
    """Extensional graph equality (ImmutableGraph.equals: same arc
    set) between two edge tables — the reference's test oracle."""
    from .operators.transforms import graphs_equal

    spark = _spark(args)
    _emit_json(
        {
            "equal": graphs_equal(
                _edges(spark, args.input), _edges(spark, args.other)
            )
        }
    )


def cmd_successors(args):
    """ImmutableGraph.successors(x): random-access successor-list
    lookup on a packed block table (block-pruned, one-partition read)."""
    spark = _spark(args)
    blocks = spark.read.parquet(args.input)
    if args.format == "csr":
        from .operators.csr import successors as fn
    elif args.format == "ef":
        from .operators.ef import ef_successors as fn
    else:
        from .operators.bvfull import bv_full_successors as fn
    succ = fn(blocks, args.node)
    _emit_json(
        {"node": args.node, "outdegree": len(succ), "successors": succ}
    )


def cmd_to_dot(args):
    """WebGraph2Dot export."""
    from .operators.export import write_dot

    spark = _spark(args)
    if not args.output:
        raise SystemExit("to-dot requires --output")
    write_dot(_edges(spark, args.input).select("src", "dst"), args.output)
    _emit_json({"wrote": args.output})


# ------------------------------------------------------------- argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m webgraph_spark",
        description=__doc__.splitlines()[0],
    )
    p.add_argument("--master", default=None, help="Spark master URL")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    sub = p.add_subparsers(dest="command", required=True)

    def add(name, fn, **kw):
        doc = (fn.__doc__ or "").strip().splitlines()
        sp = sub.add_parser(name, help=doc[0] if doc else None)
        sp.set_defaults(fn=fn)
        sp.add_argument("-i", "--input", required=kw.pop("needs_input", True))
        sp.add_argument("-o", "--output", default=None)
        sp.add_argument("--show", type=int, default=20)
        return sp

    add("stats", cmd_stats).add_argument("--degrees", default=None)
    add("check", cmd_check)

    sp = add("transform", cmd_transform)
    sp.add_argument("op", choices=_TRANSFORMS)
    sp.add_argument("--other", default=None, help="second graph / mapping / node set parquet")
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--min-deg", type=int, default=0)
    sp.add_argument("--max-deg", type=int, default=1 << 62)
    sp.add_argument("--perm-out", default=None)
    sp.add_argument("--label-col", default="label")
    sp.add_argument("--threshold", type=float, default=0.0)
    sp.add_argument("--values", default=None)

    sp = add("pack", cmd_pack)
    sp.add_argument("--format", choices=["csr", "ef", "bv"], default="csr")
    sp.add_argument("--blocks", type=int, default=None)
    sp.add_argument("--bits", action="store_true",
                    help="report bits/link compression stats")
    sp = add("unpack", cmd_unpack)
    sp.add_argument("--format", choices=["csr", "ef", "bv"], default="csr")

    sp = add("bvstore", cmd_bvstore)
    sp.add_argument("--basename", required=True)
    sp.add_argument("--window-size", type=int, default=7)
    sp.add_argument("--max-ref-count", type=int, default=3)
    sp.add_argument("--min-interval-length", type=int, default=4)
    sp.add_argument("--zeta-k", type=int, default=3)
    sp.add_argument("--residuals", default=None,
                    choices=["GAMMA", "DELTA", "ZETA", "GOLOMB", "NIBBLE"])
    sp.add_argument("--label-col", default=None,
                    help="store as BitStreamArcLabelledImmutableGraph "
                         "with this column as the arc label")
    sp.add_argument("--label-kind", default="gamma",
                    choices=["gamma", "fixed", "fixedlist"],
                    help="label class: GammaCodedIntLabel (default), "
                         "FixedWidthIntLabel, or FixedWidthIntListLabel "
                         "(fixedlist is ragged per arc, driver writer "
                         "only)")
    sp.add_argument("--label-width", type=int, default=None,
                    help="bit width for the fixed/fixedlist label kinds")
    sp.add_argument("--distributed", action="store_true",
                    help="parallel per-segment compression (the "
                         "reference's threaded store), bit-concat on "
                         "the driver")
    sp = add("bvload", cmd_bvload, needs_input=False)
    sp.add_argument("--basename", required=True)

    sp = add("arclist", cmd_arclist)
    sp.add_argument("direction", choices=["import", "export"])
    sp.add_argument(
        "--format", choices=["arclist", "ascii", "scattered"], default="arclist"
    )
    sp.add_argument("--shift", type=int, default=0)
    sp.add_argument("--perm-out", default=None)

    sp = add("generate-transcripts", cmd_generate_transcripts,
             needs_input=False)
    sp.add_argument("--n-convs", type=int, default=1000)

    add("ingest", cmd_ingest).add_argument("--nodes-out", default=None)

    sp = add("erdosrenyi", cmd_erdosrenyi, needs_input=False)
    sp.add_argument("--n", type=int, required=True)
    sp.add_argument("--p", type=float, required=True)
    sp.add_argument("--seed", type=int, default=0)

    sp = add("pagerank", cmd_pagerank)
    sp.add_argument("--alpha", type=float, default=0.85)
    sp.add_argument("--tol", type=float, default=1e-6)
    sp.add_argument("--max-iter", type=int, default=100)
    sp.add_argument("--checkpoint-dir", default=None,
                    help="durable per-iteration state + lineage; resumable")

    sp = add("cc", cmd_cc)
    sp.add_argument("--stars", action="store_true",
                    help="alias for --algorithm stars")
    sp.add_argument("--algorithm", default="auto",
                    choices=["auto", "hashmin", "stars"])
    sp.add_argument("--checkpoint-dir", default=None)
    add("scc", cmd_scc)
    sp = add("lp", cmd_lp)
    sp.add_argument("--max-iter", type=int, default=10)
    sp.add_argument("--checkpoint-dir", default=None)
    add("triangles", cmd_triangles).add_argument(
        "--per-node", action="store_true"
    )
    add("bfs", cmd_bfs).add_argument("--root", type=int, required=True)
    add("nf", cmd_nf).add_argument("--max-t", type=int, default=50)

    sp = add("hyperball", cmd_hyperball)
    sp.add_argument("--log2m", type=int, default=5)
    sp.add_argument("--max-t", type=int, default=64)
    sp.add_argument("--seed", type=int, default=31)

    add("geometric-centralities", cmd_geometric).add_argument(
        "--sources", default=None
    )

    sp = add("betweenness", cmd_betweenness)
    sp.add_argument("--samples", type=int, default=None)
    sp.add_argument("--seed", type=int, default=0)

    sp = add("top-k", cmd_topk)
    sp.add_argument("--k", type=int, required=True)
    sp.add_argument(
        "--centrality", choices=["harmonic", "closeness", "lin"],
        default="harmonic",
    )

    add("sumsweep", cmd_sumsweep).add_argument(
        "--undirected", action="store_true"
    )
    add("distance-cdf", cmd_distance_cdf).add_argument(
        "--sources", required=True
    )
    add("extract-component", cmd_extract_component).add_argument(
        "--component", type=int, default=None
    )
    add("equals", cmd_equals).add_argument("--other", required=True)
    sp = add("successors", cmd_successors)
    sp.add_argument("--node", type=int, required=True)
    sp.add_argument("--format", choices=["csr", "ef", "bv"], default="csr")
    add("to-dot", cmd_to_dot)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
