"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
stringified with float canonicalization).
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from ecov003_l2t_stars_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    return str(v)


def table_fingerprint(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    mat = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return mat


def main() -> int:
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        sdf = fn(spark, SF_DIR)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            # every driver query must carry an oracle (approximate ops
            # use containment + recall-floor form) — a rows-only entry
            # is a gate failure so local and driver signals stay equal
            print(f"{name}: NO ORACLE ({len(srows)} rows) — FAIL")
            failures += 1
            continue
        ddf = con.execute(oracles[name])
        dcols = [d[0] for d in ddf.description]
        drows = ddf.fetchall()
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"{name}: COLUMN MISMATCH spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        if len(srows) != len(drows):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(srows)} duck={len(drows)}")
            ok = False
        if ok:
            sm = table_fingerprint([tuple(r) for r in srows], scols)
            dm = table_fingerprint(drows, dcols)
            if sm != dm:
                ok = False
                ndiff = sum(1 for a, b in zip(sm, dm) if a != b)
                print(f"{name}: VALUE MISMATCH ({ndiff}/{len(sm)} rows differ)")
                for a, b in zip(sm, dm):
                    if a != b:
                        print("  spark:", a)
                        print("  duck :", b)
                        break
        if ok:
            print(f"{name}: OK ({len(srows)} rows)")
        else:
            failures += 1
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
