"""CLI entrypoint — the ``ray job submit`` surface (north rule: "the
pipeline runs via ray job submit on fixed-size clusters").

Usage (each subcommand is a complete job):

    # single node / driver machine
    python -m splade_ray build  --input /data/web_pages --out /data/index
    python -m splade_ray search --index /data/index --query "hello world" -k 10
    python -m splade_ray merge  --segments segA segB --out merged
    python -m splade_ray bench  --input /data/web_pages --out /tmp/idx
    python -m splade_ray curate --input /data/docs.parquet --out /data/curated

    # on a cluster (Ray auto-connects via RAY_ADDRESS inside the job)
    ray job submit --working-dir . -- python -m splade_ray build \\
        --input s3://bucket/web_pages --out s3://bucket/index

Config knobs map 1:1 onto :class:`~splade_ray.config.EngineConfig` via
``--set key=value`` (repeatable).  The CLI owns the Ray session (init if
absent, shutdown on exit); library code never does.
"""

from __future__ import annotations

import argparse
import os
import json
import sys
import time


def _cfg(sets: list[str]):
    from .config import EngineConfig

    kwargs = {}
    for s in sets or []:
        k, _, v = s.partition("=")
        default = getattr(EngineConfig, k, None)
        if isinstance(default, bool):
            kwargs[k] = v.lower() in ("1", "true", "yes")
        elif isinstance(default, int):
            kwargs[k] = int(v)
        elif isinstance(default, float):
            kwargs[k] = float(v)
        else:
            kwargs[k] = v
    return EngineConfig(**kwargs).validate()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="splade_ray")
    p.add_argument("--set", action="append", metavar="KEY=VALUE", help="EngineConfig override (repeatable)")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--input", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--doc-id-base", type=int, default=0)
    b.add_argument("--verify-extraction", action="store_true")

    s = sub.add_parser("search", help="query an index")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--method", default="exhaustive", choices=["exhaustive", "wand"])

    m = sub.add_parser("merge", help="merge segment indexes")
    m.add_argument("--segments", nargs="+", required=True)
    m.add_argument("--out", required=True)

    be = sub.add_parser("bench", help="timed build + query latency")
    be.add_argument("--input", required=True)
    be.add_argument("--out", required=True)

    cu = sub.add_parser("curate", help="resumable partitioned curated-corpus write")
    cu.add_argument("--input", required=True)
    cu.add_argument("--out", required=True)
    cu.add_argument("--partitions", type=int, default=64)

    op = sub.add_parser("op", help="run a registered operator by name (registry surface)")
    op.add_argument("name", nargs="?", help="operator name; omit to list all")
    op.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    op.add_argument("--limit", type=int, default=20, help="max result rows printed")

    args = p.parse_args(argv)
    cfg = _cfg(args.set)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(ignore_reinit_error=True, logging_level="ERROR")
    try:
        if args.cmd == "build":
            from .pipelines.build import build_index

            summary = build_index(
                args.input, args.out, cfg, verify_extraction=args.verify_extraction, doc_id_base=args.doc_id_base
            )
            print(json.dumps(summary))
        elif args.cmd == "search":
            from .pipelines.search import IndexReader

            reader = IndexReader(args.index, cfg)
            for rank, (doc, score, url) in enumerate(reader.search(args.query, args.k, method=args.method), 1):
                print(json.dumps({"rank": rank, "doc_id": doc, "score": round(score, 6), "url": url}))
        elif args.cmd == "merge":
            from .pipelines.merge import merge_segments

            print(json.dumps(merge_segments(args.segments, args.out, cfg)))
        elif args.cmd == "curate":
            from .pipelines.curate import curate_corpus

            print(json.dumps(curate_corpus(args.input, args.out, n_partitions=args.partitions)))
        elif args.cmd == "op":
            import importlib.util as _ilu

            # populate the registry from the driver contract
            spec = _ilu.spec_from_file_location(
                "__ray_entry__", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__ray_entry__.py")
            )
            entry = _ilu.module_from_spec(spec)
            spec.loader.exec_module(entry)
            entry.queries()
            from .registry import get_op, list_ops

            if not args.name:
                print(json.dumps(list_ops()))
            else:
                res = get_op(args.name)(args.sf_dir)
                if hasattr(res, "to_pandas"):
                    res = res.to_pandas()
                print(res.head(args.limit).to_string())
        elif args.cmd == "bench":
            from .pipelines.build import build_index
            from .pipelines.search import IndexReader

            t0 = time.perf_counter()
            summary = build_index(args.input, args.out, cfg)
            dt = time.perf_counter() - t0
            reader = IndexReader(args.out, cfg)
            t1 = time.perf_counter()
            reader.search("benchmark probe query", 10)
            print(
                json.dumps(
                    {
                        "build_s": round(dt, 3),
                        "docs_per_sec": round(summary["n_docs"] / dt, 1) if dt else None,
                        "first_query_ms": round(1000 * (time.perf_counter() - t1), 2),
                        **{k: summary[k] for k in ("n_docs", "nnz")},
                    }
                )
            )
    finally:
        if owns_ray:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
