"""Engine CLI — run any registered query without writing code:

    python -m assignment_2_dataengineering_spark list
    python -m assignment_2_dataengineering_spark run q_groupby_sum [--sf-dir D] [-n 20]
    python -m assignment_2_dataengineering_spark explain q_dedup_minhash_lsh
    python -m assignment_2_dataengineering_spark oracle q_groupby_sum

`run` prints the result as JSON lines (machine-pipeable, like the
reference's batch-file outputs); `explain` prints the formatted
physical plan (the scale-review tool SCALE.md is built from); `oracle`
runs the registered DuckDB oracle side-by-side and reports match/
mismatch — the driver's correctness gate, on demand for one query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="assignment_2_dataengineering_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    for name in ("run", "explain", "oracle"):
        s = sub.add_parser(name)
        s.add_argument("query")
        s.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
        if name == "run":
            s.add_argument("-n", "--limit", type=int, default=20)
    args = p.parse_args(argv)

    from .plans.registry import all_specs

    specs = all_specs()
    if args.cmd == "list":
        for n, s in sorted(specs.items()):
            kind = "oracle" if s.oracle else "rows-only"
            doc = " ".join((s.doc or "").split())[:80]
            print(f"{n:28s} [{kind}]{' [bench]' if s.bench else ''}  {doc}")
        return 0

    if args.query not in specs:
        print(f"unknown query {args.query!r}; `list` shows all", file=sys.stderr)
        return 2
    spec = specs[args.query]

    from pyspark.sql import SparkSession

    from .session import get_spark

    # Only stop the session on exit if the CLI created it (in-process
    # callers — tests, notebooks — keep theirs).
    owned = SparkSession.getActiveSession() is None
    spark = get_spark(app_name=f"a2de-cli-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        df = spec.fn(spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain(mode="formatted")
            return 0
        if args.cmd == "run":
            for row in df.limit(args.limit).collect():
                print(json.dumps(row.asDict(recursive=True), default=str))
            return 0
        # oracle
        if spec.oracle is None:
            n = df.count()
            print(json.dumps({"query": args.query, "mode": "rows-only", "rows": n}))
            return 0
        import duckdb

        con = duckdb.connect()
        for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')")
        import math
        from datetime import date, datetime

        def norm(v):
            if v is None:
                return "null"
            if isinstance(v, float):
                return "nan" if math.isnan(v) else f"{v + 0.0:.6f}"
            if isinstance(v, (datetime, date)):
                return v.isoformat()
            return str(v)

        sc, sr = df.columns, [tuple(r) for r in df.collect()]
        rel = con.sql(spec.oracle)
        dc, dr = rel.columns, rel.fetchall()
        i_s = sorted(range(len(sc)), key=lambda i: sc[i])
        i_d = sorted(range(len(dc)), key=lambda i: dc[i])
        sh = sorted("|".join(norm(r[i]) for i in i_s) for r in sr)
        dh = sorted("|".join(norm(r[i]) for i in i_d) for r in dr)
        ok = sorted(sc) == sorted(dc) and sh == dh
        print(json.dumps({
            "query": args.query, "match": ok,
            "spark_rows": len(sr), "oracle_rows": len(dr),
        }))
        return 0 if ok else 1
    finally:
        if owned:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
