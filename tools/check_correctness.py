"""Local stand-in for the driver's correctness gate: run every registered
query on Spark and its oracle on DuckDB over the same parquet tables,
compare row count, sorted column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

from asctb_ct_label_mapper_spark.queries import all_oracles, all_queries  # noqa: E402
from asctb_ct_label_mapper_spark.schemas import TESTDATA_TABLES  # noqa: E402
from asctb_ct_label_mapper_spark.session import get_spark  # noqa: E402


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_signature(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    sig_rows = sorted(tuple(normalize(r[i]) for i in order) for r in rows)
    return sorted_cols, sig_rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = all_queries()
    oracles = all_oracles()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        # Several operators persist intermediates whose consumers live
        # inside the returned plan (q11/q15/q20/q21, the dedup family) —
        # they cannot unpersist before execution, so the harness drops
        # cache entries between queries (as bench.py does) to keep a
        # 112-query session from accumulating executor storage.
        spark.catalog.clearCache()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(srows)} rows, cols={scols})")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        sc, sr = table_signature(scols, srows)
        oc, orws = table_signature(ocols, orows)
        if sc != oc:
            print(f"FAIL  {name}: columns differ spark={sc} oracle={oc}")
            failures += 1
            continue
        if len(sr) != len(orws):
            print(f"FAIL  {name}: rows spark={len(sr)} oracle={len(orws)}")
            failures += 1
            continue
        if sr != orws:
            diffs = [i for i, (a, b) in enumerate(zip(sr, orws)) if a != b][:3]
            print(f"FAIL  {name}: values differ at sorted rows {diffs}")
            for i in diffs:
                print(f"      spark : {sr[i]}")
                print(f"      oracle: {orws[i]}")
            failures += 1
            continue
        print(f"OK    {name}: {len(sr)} rows hash-match")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
