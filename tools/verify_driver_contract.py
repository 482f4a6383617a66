"""Driver-faithful verification: a VANILLA SparkSession (no engine
configs) imports __spark_entry__ and exercises entry() + every
queries()/oracle_sql() pair, comparing to DuckDB exactly as the
external driver does (rowcount, sorted column names, order-insensitive
rows, floats @6dp, naive-iso timestamps).

Usage: python tools/verify_driver_contract.py [sf_dir] [names...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys
from pathlib import Path

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 6)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows), key=repr
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    spark = SparkSession.builder.master("local[8]").getOrCreate()

    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    n = df.count()
    print(f"entry(): {n} rows, schema={[f.name for f in df.schema.fields]}")
    assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = []
    for name, fn in sorted(queries.items()):
        if names and name not in names:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"rows-only {name}: {len(s_rows)} rows")
                continue
            rel = con.sql(oracles[name])
            o_cols, o_rows = list(rel.columns), rel.fetchall()
            ok = (
                len(s_rows) == len(o_rows)
                and sorted(s_cols) == sorted(o_cols)
                and _norm(s_cols, s_rows) == _norm(o_cols, o_rows)
            )
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            continue
        print(("pass" if ok else "FAIL") + f" {name}: {len(s_rows)} rows")
        if not ok:
            bad.append(name)
    print(f"\n{len(bad)} failing: {bad}" if bad else "\nALL GREEN")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
