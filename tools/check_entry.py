"""Self-check of __spark_entry__ against the DuckDB oracles — mimics
the driver's CORRECTNESS gate: per query compare row count + sorted-
column order-insensitive value hash between the Spark result and the
oracle SQL run on the same parquet tables.

Usage: python tools/check_entry.py [--json OUT.json] [sf_dir] [query ...]

With --json the per-query results (status, rows, oracled flag,
seconds) are also written as a committed-artifact JSON so a round's
full-dictionary gate run needs no re-derivation (VERDICT r4 #4).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    # type-tagged: a Decimal/float that happens to print like an int must
    # NOT hash-match an int — the driver's hasher distinguishes them (the
    # r1 counter_merge/bucket_checksums driver-red came from exactly this:
    # DuckDB HUGEINT/DECIMAL sums vs Spark longs).
    from decimal import Decimal
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"f:{v:.10g}"
    if isinstance(v, Decimal):
        return f"dec:{v}"
    return str(v)


def table_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return h, lines


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: check_entry.py [SF_DIR] [QUERY ...] "
                     "[--json OUT.json] — --json needs a file path")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as E
    from cassandra_data_migrator_spark.session import get_spark
    spark = get_spark("check_entry")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table = a DIRECTORY of part files (the
            # tools/make_scaled_sf.py layout); DuckDB wants a glob
            p = os.path.join(p, "*.parquet")
        elif not os.path.exists(p):
            continue
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            results[name] = {"status": "err", "err": f"spark: {ex}"[:300],
                             "secs": round(time.time() - t0, 1)}
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(rows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            if len(rows) == 0:
                print(f"  WARN {name}: empty result")
            results[name] = {"status": "rows_only", "rows": len(rows),
                             "secs": round(time.time() - t0, 1)}
            continue
        try:
            res = con.sql(sql)
            ocols = [c for c in res.columns]
            # Arrow fetch (not fetchall): HUGEINT surfaces as decimal128 →
            # Decimal, exactly the typed value the driver's hasher sees
            orows = [tuple(d[c] for c in ocols)
                     for d in res.arrow().to_pylist()]
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            results[name] = {"status": "err", "err": f"duckdb: {ex}"[:300],
                             "secs": round(time.time() - t0, 1)}
            continue
        ok = True
        if sorted(cols) != sorted(ocols):
            print(f"FAIL  {name}: column mismatch spark={sorted(cols)} "
                  f"oracle={sorted(ocols)}")
            ok = False
        if len(rows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(rows)} oracle={len(orows)}")
            ok = False
        if ok:
            hs, ls = table_sig(cols, rows)
            ho, lo = table_sig(ocols, orows)
            if hs != ho:
                ok = False
                diff_s = [l for l in ls if l not in set(lo)][:3]
                diff_o = [l for l in lo if l not in set(ls)][:3]
                print(f"FAIL  {name}: value hash mismatch")
                for l in diff_s:
                    print(f"   spark-only: {l[:200]}")
                for l in diff_o:
                    print(f"  oracle-only: {l[:200]}")
        if ok:
            print(f"PASS  {name}: {len(rows)} rows [{time.time()-t0:.1f}s]")
            if len(rows) == 0:
                print(f"  WARN {name}: empty result")
            results[name] = {"status": "pass", "rows": len(rows),
                             "oracle_rows": len(orows),
                             "secs": round(time.time() - t0, 1)}
        else:
            failures.append(name)
            results[name] = {"status": "fail", "rows": len(rows),
                             "oracle_rows": len(orows),
                             "secs": round(time.time() - t0, 1)}

    if json_out:
        import json
        with open(json_out, "w") as f:
            json.dump({
                "sf_dir": sf_dir,
                "n_queries": len(results),
                "n_pass": sum(r["status"] == "pass" for r in results.values()),
                "n_rows_only": sum(
                    r["status"] == "rows_only" for r in results.values()),
                "n_fail": len(failures),
                "failures": failures,
                "queries": results,
            }, f, indent=1)
        print(f"artifact written: {json_out}")

    print("=" * 60)
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all checked queries PASS")
    spark.stop()


if __name__ == "__main__":
    main()
