"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
names, column TYPES, and order-insensitive values. Usage:
    python tools/check_contract.py [sf_dir] [name ...]

The type check exists because the driver's value hash is typed: DuckDB
silently widens integer aggregates (sum(BIGINT) -> HUGEINT, for example)
while Spark stays at BIGINT, and Python's fetch coerces both to int so a
value-only compare is blind to it (that exact drift failed a16_degree_stats
in round 4's driver grade while this tool said ALL PASS). We normalize
DuckDB's DESCRIBE output into Spark's dtype vocabulary and fail on any
mismatch so oracle type drift is caught before the driver grades.
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entrymod
from engine.session import build_session

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


_DUCK_TO_SPARK = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "HUGEINT": "hugeint",  # no Spark equivalent: always a mismatch, by design
    "UBIGINT": "ubigint",
    "DOUBLE": "double",
    "FLOAT": "float",
    "REAL": "float",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "DATE": "date",
    "BLOB": "binary",
}


def duck_type_to_spark(t: str) -> str:
    """Normalize a DuckDB DESCRIBE column_type into Spark dtype vocabulary."""
    t = t.strip()
    if t.endswith("[]"):
        return f"array<{duck_type_to_spark(t[:-2])}>"
    up = t.upper()
    if up.startswith("DECIMAL"):
        return up.lower().replace(" ", "")
    return _DUCK_TO_SPARK.get(up, t.lower())


def oracle_types(con, sql: str) -> dict[str, str]:
    """Column name -> Spark-vocabulary type for a DuckDB query, via DESCRIBE."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: duck_type_to_spark(r[1]) for r in rows}


def type_mismatches(spark_types: dict[str, str], duck_types: dict[str, str]) -> list[str]:
    """Per-column '<col>: spark=<t> duck=<t>' strings for every type drift."""
    return [
        f"{c}: spark={spark_types[c]} duck={duck_types[c]}"
        for c in sorted(spark_types)
        if c in duck_types and spark_types[c] != duck_types[c]
    ]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return repr(v)


def df_to_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session(app_name="contract-check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            # pin_scope: LSH/triangle queries pin multi-consumer
            # intermediates; without the scope 59 queries in one session
            # accumulate MEMORY_AND_DISK cache (the CacheManager holds pins
            # until an explicit unpersist)
            from engine.operators._pins import pin_scope

            with pin_scope():
                sdf = fn(spark, sf)
                scols = sdf.columns
                srows = sdf.collect()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows, cols={scols} ({time.time()-t0:.1f}s)")
            if len(srows) == 0 and name != "a2_dangling_nodes":
                print(f"  WARNING: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        elif (tm := type_mismatches(dict(sdf.dtypes), oracle_types(con, oracles[name]))):
            print(f"FAIL {name}: type mismatch {tm}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            ok = False
        else:
            sn = df_to_rows(scols, [[r[c] for c in scols] for r in srows])
            dn = df_to_rows(dcols, drows)
            if sn != dn:
                diff = [i for i, (a, b) in enumerate(zip(sn, dn)) if a != b][:3]
                print(f"FAIL {name}: value mismatch at sorted rows {diff}")
                for i in diff[:2]:
                    print(f"   spark: {sn[i]}")
                    print(f"   duck : {dn[i]}")
                ok = False
        if ok:
            print(f"OK   {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)
    print(f"\n{'ALL PASS' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
