"""CLI entry point — the ``ray job submit`` surface of the north rule:

    ray job submit --working-dir . -- python -m lucene_ray build \\
        --input /data/pages --index /data/idx --key-col url
    ray job submit -- python -m lucene_ray merge --index /data/idx
    ray job submit -- python -m lucene_ray search --index /data/idx \\
        --query "web +crawl -spam" --k 10
    ray job submit -- python -m lucene_ray check --index /data/idx

On a cluster the driver's ``ray.init(address="auto")`` attaches to the
running cluster; standalone it starts a local session. Build/merge are
resumable: re-submitting the same job skips committed partitions.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _init_ray(num_cpus=None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        import os

        addr = os.environ.get("RAY_ADDRESS", "local")
        if addr == "local" and num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(address=addr, **kwargs)
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    except Exception:
        pass


def main(argv=None):
    p = argparse.ArgumentParser(prog="lucene_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build or resume an index")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--key-col", default="doc_id")
    b.add_argument("--text-col", default="text")
    b.add_argument("--rows-per-segment", type=int, default=1 << 20)
    b.add_argument("--buckets", type=int, default=1)
    b.add_argument("--no-positions", action="store_true")
    b.add_argument("--keyword-cols", default="",
                   help="comma-separated StringField-style keyword columns")
    b.add_argument("--dv-cols", default="",
                   help="comma-separated doc-values columns")
    b.add_argument("--point-cols", default="",
                   help="comma-separated dv columns that also get the 1-D "
                        "point sidecar (LongPoint/BKD range filtering)")
    b.add_argument("--geo-cols", default="",
                   help="geo point fields as field=lat_col:lon_col,... "
                        "(LatLonPoint role; cols must be in --dv-cols)")
    b.add_argument("--range-cols", default="",
                   help="interval fields as field=lo_col:hi_col,... "
                        "(IntRange role; cols must be in --dv-cols)")
    b.add_argument("--term-vectors", action="store_true",
                   help="store per-doc (term, freq) vectors "
                        "(TermVectorsFormat role)")
    b.add_argument("--index-sort", default=None,
                   help="'field:asc|desc' index sort (IndexWriterConfig."
                        "setIndexSort role); field must be in --dv-cols")
    b.add_argument("--shuffle", action="store_true",
                   help="use the groupby-term shuffle build (postings only)")
    b.add_argument("--num-cpus", type=int, default=None)

    m = sub.add_parser("merge", help="run tiered merge rounds to quiescence")
    m.add_argument("--index", required=True)
    m.add_argument("--force-max", type=int, default=None,
                   help="force-merge down to N segments")
    m.add_argument("--num-cpus", type=int, default=None)

    s = sub.add_parser("search", help="run a query")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--mode", default="auto",
                   choices=["auto", "exhaustive", "wand"])
    s.add_argument("--num-cpus", type=int, default=None)

    c = sub.add_parser("check", help="CheckIndex-style validation")
    c.add_argument("--index", required=True)
    c.add_argument("--num-cpus", type=int, default=None)

    e = sub.add_parser(
        "export",
        help="stream a query's FULL match set to partitioned Parquet "
             "(one file per segment — resumable, never a driver list)",
    )
    e.add_argument("--index", required=True)
    e.add_argument("--query", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--num-cpus", type=int, default=None)

    a = sub.add_parser(
        "add-indexes",
        help="adopt committed segments of other indexes into --index "
             "(IndexWriter.addIndexes role: file-verbatim, new manifest "
             "generation)",
    )
    a.add_argument("--index", required=True)
    a.add_argument("--src", required=True, nargs="+",
                   help="source index dirs to import")
    a.add_argument("--num-cpus", type=int, default=None)

    args = p.parse_args(argv)
    _init_ray(args.num_cpus)

    if args.cmd == "build":
        from lucene_ray.index.config import IndexConfig

        def _cols(v):
            return tuple(c.strip() for c in v.split(",") if c.strip())

        isort = None
        if args.index_sort:
            f_, _, d_ = args.index_sort.partition(":")
            isort = (f_, d_ or "asc")

        def _triples(v):
            # "field=colA:colB,..." → ((field, colA, colB), ...)
            out = []
            for item in _cols(v):
                f_, _, pair = item.partition("=")
                a_, _, b_ = pair.partition(":")
                if not (f_ and a_ and b_):
                    raise SystemExit(
                        f"bad field spec {item!r}; want field=colA:colB"
                    )
                out.append((f_, a_, b_))
            return tuple(out)

        cfg = IndexConfig(
            key_col=args.key_col,
            text_col=args.text_col,
            rows_per_segment=args.rows_per_segment,
            num_buckets=args.buckets,
            positions=not args.no_positions and not args.shuffle,
            keyword_cols=_cols(args.keyword_cols),
            dv_cols=_cols(args.dv_cols),
            point_cols=_cols(args.point_cols),
            geo_cols=_triples(args.geo_cols),
            range_cols=_triples(args.range_cols),
            index_sort=isort,
            store_term_vectors=args.term_vectors,
        )
        t0 = time.time()
        if args.shuffle:
            from lucene_ray.index.shuffle_build import build_index_shuffled

            man = build_index_shuffled(args.input, args.index, cfg)
        else:
            from lucene_ray.index.build import build_index

            man = build_index(args.input, args.index, cfg)
        dt = time.time() - t0
        print(json.dumps({
            "segments": len(man.segments),
            "docs": man.total_docs,
            "docs_per_s": round(man.total_docs / dt, 1),
            "field_stats": man.field_stats,
            "generation": man.generation,
        }))
    elif args.cmd == "merge":
        from lucene_ray.index.merge import force_merge, merge_round

        if args.force_max:
            man = force_merge(args.index, args.force_max)
        else:
            prev = -1
            from lucene_ray.index.manifest import load_manifest

            man = load_manifest(args.index)
            while man and len(man.segments) != prev:
                prev = len(man.segments)
                man = merge_round(args.index)
        print(json.dumps({"segments": len(man.segments),
                          "generation": man.generation}))
    elif args.cmd == "add-indexes":
        from lucene_ray.index.add_indexes import add_indexes

        man = add_indexes(args.index, args.src)
        print(json.dumps({"segments": len(man.segments),
                          "generation": man.generation,
                          "total_docs": man.total_docs}))
    elif args.cmd == "search":
        from lucene_ray.search.searcher import IndexSearcher

        res = IndexSearcher(args.index).search(args.query, args.k, mode=args.mode)
        print(json.dumps({
            "hits": [
                {"rank": i, "key": k, "docid": int(d), "score": float(sc)}
                for i, (k, d, sc) in enumerate(
                    zip(res["keys"], res["docids"], res["scores"])
                )
            ],
            "total_hits": res["total_hits"],
            "relation": res["relation"],
        }))
    elif args.cmd == "export":
        from lucene_ray.pipelines.export import export_matches

        n = export_matches(args.index, args.query, args.out)
        print(json.dumps({"out": args.out, "rows": n}))
    elif args.cmd == "check":
        from lucene_ray.index.check import check_index

        problems = check_index(args.index)
        print(json.dumps({"healthy": not problems, "problems": problems}))
        sys.exit(1 if problems else 0)


if __name__ == "__main__":
    main()
