"""Local emulator of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir; compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by
their stringified tuple, floats rounded to 9 significant-ish digits).

Usage: python tools/check_oracles.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import hashlib
import math
import sys

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_val(v):
    if v is None:
        return "\x00"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, int):
        return str(v)
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_val(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "surrogatepass"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else None

    import duckdb

    import __spark_entry__ as entrymod
    from parsee_pdf_reader_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]",
                      extra_conf={"spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name}: rows-only check -> {len(srows)} rows "
                  f"({'OK' if len(srows) >= 0 else '??'})")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"{name}: DUCKDB ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"{name}: SCHEMA MISMATCH spark={sorted(scols)} "
                  f"duck={sorted(dcols)}")
            ok = False
        if len(srows) != len(drows):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(srows)} "
                  f"duck={len(drows)}")
            ok = False
        if ok:
            hs = table_hash(scols, [[r[c] for c in scols] for r in srows])
            hd = table_hash(dcols, drows)
            if hs != hd:
                print(f"{name}: VALUE HASH MISMATCH ({len(srows)} rows)")
                order_s = sorted(scols)
                ss = sorted(tuple(norm_val(r[c]) for c in order_s)
                            for r in srows)
                ds = sorted(tuple(norm_val(v) for v in
                                  (dict(zip(dcols, r))[c] for c in order_s))
                            for r in drows)
                shown = 0
                for a, b in zip(ss, ds):
                    if a != b:
                        print(f"   spark={a}\n   duck ={b}")
                        shown += 1
                        if shown >= 3:
                            break
                ok = False
        if ok:
            print(f"{name}: OK ({len(srows)} rows)")
        else:
            failures += 1
    spark.stop()
    print(f"failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
