"""spark-submit entry point for querying a materialized triple store.

    spark-submit --py-files nametag3_spark.zip jobs/run_kg_query.py \
        --triples /path/to/triples.parquet \
        --query '[["?s", "knows", "?o"]]' [--optional ...] \
        [--not-exists ...] [--construct '[["?s","p","?o"]]'] \
        [--distinct] [--output /path/out.parquet] [--limit 20]

``--query`` / ``--optional`` / ``--not-exists`` / ``--construct`` take
JSON pattern lists (terms starting with ``?`` are variables; a literal
predicate ending in ``+`` is a one-or-more property path). With
``--construct`` the job emits derived (subj, pred, obj) triples;
otherwise it emits the variable bindings. ``--output`` writes parquet;
without it the job prints up to ``--limit`` rows as JSON lines.

The triple store read is a plain parquet/Iceberg scan, so a
pred-partitioned store gets partition pruning on literal-predicate
patterns for free.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _patterns(raw: str) -> list[tuple[str, str, str]]:
    pats = json.loads(raw)
    return [tuple(p) for p in pats]


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--triples", required=True,
                        help="parquet path of the (subj, pred, obj) store")
    parser.add_argument("--query", default=None,
                        help="JSON list of [s, p, o] patterns")
    parser.add_argument("--sparql", default=None,
                        help="SPARQL text (SELECT/ASK/CONSTRUCT subset) — "
                             "alternative to the JSON flags")
    parser.add_argument("--describe", default=None, metavar="ENTITY",
                        help="emit every triple where ENTITY is subj or obj")
    parser.add_argument("--optional", action="append", default=[],
                        help="JSON pattern list; repeatable per OPTIONAL block")
    parser.add_argument("--not-exists", action="append", default=[],
                        help="JSON pattern list; repeatable per NOT EXISTS block")
    parser.add_argument("--construct", default=None,
                        help="JSON template triples -> emit derived triples")
    parser.add_argument("--values", default=None,
                        help='JSON {"var": ["allowed", ...]} binding lists')
    parser.add_argument("--distinct", action="store_true")
    parser.add_argument("--graph", default=None,
                        help="GRAPH scope over a quad store: literal id or ?var")
    parser.add_argument("--graph-col", default="graph")
    parser.add_argument("--path-depth", type=int, default=8)
    parser.add_argument("--stats", action="store_true",
                        help="collect per-predicate counts first and use "
                             "them for cardinality-driven join ordering")
    parser.add_argument("--explain", action="store_true",
                        help="print the formatted physical plan instead of "
                             "executing")
    parser.add_argument("--output", default=None)
    parser.add_argument("--limit", type=int, default=20)
    parser.add_argument("--master", default=None)
    args = parser.parse_args()

    from nametag3_spark.operators.bgp import bgp_query, construct
    from nametag3_spark.session import get_spark

    if sum(map(bool, (args.query, args.sparql, args.describe))) != 1:
        parser.error("exactly one of --query, --sparql, --describe is required")

    spark = get_spark(app_name="kg_query", master=args.master)
    triples = spark.read.parquet(args.triples)

    pred_stats = None
    if args.stats:
        # one cheap pass (map-side partial count per predicate); at
        # store scale collect once and reuse across queries
        pred_stats = {
            r["pred"]: r["n"]
            for r in triples.groupBy("pred").count()
            .withColumnRenamed("count", "n").collect()
        }

    start = time.perf_counter()
    if args.describe:
        from nametag3_spark.operators.bgp import describe

        _emit(describe(triples, args.describe), args, start)
        return
    if args.sparql:
        from nametag3_spark.operators.sparql import execute

        out = execute(triples, args.sparql, path_depth=args.path_depth,
                      graph_col=args.graph_col, pred_stats=pred_stats)
        if isinstance(out, bool):
            print(json.dumps({"ask": out,
                              "elapsed_sec": round(time.perf_counter() - start, 2)}))
            return
        _emit(out, args, start)
        return
    common = dict(
        optional=[_patterns(o) for o in args.optional] or None,
        not_exists=[_patterns(o) for o in args.not_exists] or None,
        values=json.loads(args.values) if args.values else None,
        path_depth=args.path_depth,
        graph=args.graph,
        graph_col=args.graph_col,
        pred_stats=pred_stats,
    )
    if args.construct:
        out = construct(
            triples, _patterns(args.query), _patterns(args.construct), **common
        )
    else:
        out = bgp_query(
            triples, _patterns(args.query), distinct=args.distinct, **common
        )

    _emit(out, args, start)


def _emit(out, args, start: float) -> None:
    if getattr(args, "explain", False):
        out.explain("formatted")
        return
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
        n = out.sparkSession.read.parquet(args.output).count()
    else:
        rows = out.limit(args.limit).collect()
        for r in rows:
            print(json.dumps(r.asDict()), file=sys.stdout)
        n = out.count()
    print(
        json.dumps(
            {"rows": n, "elapsed_sec": round(time.perf_counter() - start, 2)}
        ),
        file=sys.stdout,
    )


if __name__ == "__main__":
    main()
