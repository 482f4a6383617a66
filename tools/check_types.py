"""Strict output-type parity check between Spark workloads and their
DuckDB oracles.

The driver's value-hash is type-sensitive (DuckDB HUGEINT vs Spark
BIGINT serialize differently even when numerically equal — see
VERDICT.md round 1, "What's wrong" #1), so beyond the value compare in
check_correctness.py we assert that, column by column (sorted by name,
as the driver does), the *Arrow* types on both sides agree up to the
equivalences that are genuinely lossless:

- int8/16/32/64 all fine as long as BOTH sides are some integer width?
  NO — the driver hash failed on int128-vs-int64, so we only accept
  identical Arrow storage class AND bit width for integers.
- timestamp unit differences (us vs ns) are tolerated; tz-naive only.
- string/large_string are equivalent.

Usage: python tools/check_types.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datanika_core_spark.session import TESTDATA_TABLES, build_spark
from datanika_core_spark.workloads import load_all


def _canon(t: pa.DataType) -> str:
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon(t.value_type)}>"
    return str(t)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]
    spark = build_spark(app_name="type_check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    registry = load_all()
    bad = []
    for name, wl in sorted(registry.items()):
        if name_filter and name not in name_filter:
            continue
        if wl.oracle is None:
            continue
        sdf = wl.fn(spark, sf_dir)
        # toArrow converts via the DataFrame's own schema — unlike
        # pandas round-tripping, a sampled empty list stays
        # list<string> instead of inferring list<null>
        s_schema = {f.name: _canon(t) for f, t in zip(
            sdf.schema.fields,
            sdf.limit(1).toArrow().schema.types,
        )}
        o_schema = {
            f.name: _canon(f.type)
            for f in con.sql(wl.oracle).fetch_arrow_table().schema
        }
        diffs = {
            c: (s_schema.get(c), o_schema.get(c))
            for c in sorted(set(s_schema) | set(o_schema))
            if s_schema.get(c) != o_schema.get(c)
            # all-NULL sample column infers as pa.null() — not a real
            # type difference (the limit(1) sample just had no value)
            and "null" not in (s_schema.get(c), o_schema.get(c))
        }
        if diffs:
            bad.append(name)
            print(f"FAIL {name}: {diffs}")
        else:
            print(f"ok   {name}")
    print(f"\n{len(bad)} type-mismatched" if bad else "\nall green")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
