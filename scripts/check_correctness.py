"""Self-check harness mimicking the driver's CORRECTNESS gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB against
the same sf dir, compares row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, values stringified).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from shovel_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(canon).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=8, app_name="check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    executed = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        executed += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"OK(rows-only) {name}: {len(s_rows)} rows  [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.sql(oracles[name])
            d_cols = [c for c in ddf.columns]
            d_rows = [tuple(r) for r in ddf.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        else:
            # dtype-CLASS parity (round-1 lesson: the driver's value hash is
            # pandas-dtype-class sensitive — DuckDB HUGEINT lands as an
            # 'object' column and hash-mismatches even when values agree;
            # numeric width differences like int32 vs int64 are fine)
            try:
                s_pd = sdf.limit(0).toPandas()
                d_pd = ddf.limit(0).df()  # limit BEFORE df(): no full re-run of the oracle

                def _kind(dt):
                    k = dt.kind
                    return {"i": "int", "u": "int", "f": "float", "b": "bool"}.get(k, k)

                for c in s_cols:
                    sk, dk = _kind(s_pd[c].dtype), _kind(d_pd[c].dtype)
                    if sk != dk:
                        problems.append(f"dtype-class {c}: spark={s_pd[c].dtype} duckdb={d_pd[c].dtype}")
            except Exception:  # noqa: BLE001 — advisory check only
                pass
        if not problems:
            hs, hd = value_hash(s_cols, s_rows), value_hash(d_cols, d_rows)
            if hs != hd:
                problems.append(f"value-hash spark={hs} duckdb={hd}")
                so = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                do = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                sset = {tuple(_norm(r[i]) for i in so) for r in s_rows}
                dset = {tuple(_norm(r[i]) for i in do) for r in d_rows}
                for diff in list(sset - dset)[:3]:
                    problems.append(f"  spark-only: {diff}")
                for diff in list(dset - sset)[:3]:
                    problems.append(f"  duckdb-only: {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"OK {name}: {len(s_rows)} rows match  [{time.time()-t0:.1f}s]")
    spark.stop()
    label = "selected queries" if only else "queries"
    print(f"\n{executed - len(failures)}/{executed} {label} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
