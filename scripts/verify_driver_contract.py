#!/usr/bin/env python
"""Local replica of the driver's correctness gate at sf0.01 (the
/verify skill's surface #1): run every __spark_entry__.queries() entry
against its oracle_sql() DuckDB twin, comparing row count + columns +
order-insensitive normalized values. Prints per-query MISMATCH lines
and a final BAD count."""
import math
import sys
from datetime import date, datetime

sys.path.insert(0, ".")
import duckdb  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from assignment_2_dataengineering_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def norm(v):
    if v is None:
        return "null"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v + 0.0:.6f}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    return str(v)


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    qs, osql = e.queries(), e.oracle_sql()
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else sorted(qs)
    bad = 0
    for name in names:
        fn = qs[name]
        try:
            sdf = fn(spark, SF)
            sc = sdf.columns
            sr = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(name, "ERROR", str(ex)[:160], flush=True)
            bad += 1
            continue
        if name not in osql:
            print(name, "rows-only", len(sr), flush=True)
            continue
        rel = con.sql(osql[name])
        dc = rel.columns
        dr = rel.fetchall()
        i_s = sorted(range(len(sc)), key=lambda i: sc[i])
        i_d = sorted(range(len(dc)), key=lambda i: dc[i])
        sh = sorted("|".join(norm(r[i]) for i in i_s) for r in sr)
        dh = sorted("|".join(norm(r[i]) for i in i_d) for r in dr)
        m = sorted(sc) == sorted(dc) and sh == dh
        if not m:
            bad += 1
            print(name, "MISMATCH", len(sr), len(dr), flush=True)
    print("BAD:", bad, flush=True)
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
