"""spark-submit job: query a built index.

    spark-submit --py-files konlspark.zip jobs/query.py \
        --index /path/to/index --tokens 마법 특별 \
        [--mode or|and|phrase|bm25] [--k 10] [--suggest-prefix 특] \
        [--batch-file queries.json]   # {query_id: [tokens]}, one plan
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--tokens", nargs="*", default=[])
    ap.add_argument("--mode", default="bm25",
                    choices=["or", "and", "phrase", "phrase-exact", "bm25"],
                    help="phrase = reference first-occurrence semantics; "
                         "phrase-exact = contiguous extension")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--no-wand", action="store_true")
    ap.add_argument("--suggest-prefix")
    ap.add_argument("--batch-file",
                    help="JSON file {query_id: [tokens, ...]} — runs all "
                         "queries in ONE plan (bm25 mode uses "
                         "bm25_topk_batch, or/and use search_batch); "
                         "file contents dodge the argv locale trap")
    args = ap.parse_args()

    # spark-submit launches Python through the JVM, which decodes argv
    # with the platform locale: with LANG/LC_ALL unset (POSIX), every
    # non-ASCII query token arrives corrupted as '?'. Fail loudly.
    import os
    import sys
    if any("?" in t for t in args.tokens) and not (
            os.environ.get("LC_ALL") or os.environ.get("LANG")):
        print("error: query tokens look locale-corrupted; run spark-submit "
              "with LC_ALL=C.UTF-8 for non-ASCII tokens", file=sys.stderr)
        sys.exit(2)

    from konlspark.query import SearchEngine

    spark = SparkSession.builder.appName("konlspark-query").getOrCreate()
    eng = SearchEngine(spark, args.index)
    if args.suggest_prefix:
        print(json.dumps({"suggestions": eng.search_suggestions(
            args.suggest_prefix)}, ensure_ascii=False))
        return
    if args.batch_file:
        with open(args.batch_file, encoding="utf-8") as f:
            batch = json.load(f)
        if args.mode == "bm25":
            rows = eng.bm25_topk_batch(batch, k=args.k,
                                       use_wand=not args.no_wand).collect()
            out: dict = {}
            for r in rows:
                out.setdefault(r["query_id"], []).append(
                    (r["doc_id"], r["score"]))
        elif args.mode in ("or", "and"):
            rows = eng.search_batch(batch, mode=args.mode).collect()
            out = {}
            for r in rows:
                out.setdefault(r["query_id"], []).append(r["doc_id"])
        else:
            print("error: --batch-file supports modes bm25/or/and",
                  file=sys.stderr)
            sys.exit(2)
        print(json.dumps({"batch": out}, ensure_ascii=False))
        return
    if args.mode == "bm25":
        rows = eng.bm25_topk(args.tokens, k=args.k,
                             use_wand=not args.no_wand).collect()
        print(json.dumps({"topk": [(r["doc_id"], r["score"]) for r in rows]}))
    elif args.mode == "phrase-exact":
        rows = eng.search_phrase_contiguous(args.tokens).collect()
        print(json.dumps({"doc_ids": [r["doc_id"] for r in rows]}))
    else:
        rows = eng.search(args.tokens, args.mode).collect()
        print(json.dumps({"doc_ids": [r["doc_id"] for r in rows]}))


if __name__ == "__main__":
    main()
