"""Local emulator of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir; compares row count, column names, and an
order-insensitive value hash.

Crucially, BOTH sides are fetched **as pandas DataFrames** (Spark
``toPandas()``, DuckDB ``fetch_df()``) because the driver canonicalizes
via pandas. This reproduces driver-visible type effects the old
``fetchall()`` path hid — e.g. DuckDB ``list_sum`` over integers returns
HUGEINT which lands in pandas as float64, so ``290.0`` vs Spark's
``290`` is a real driver mismatch (round-1 VERDICT item 1). Ints and
floats deliberately hash differently here for the same reason.

KNOWN PROPERTY: the six golden-fixture flagship rows (extract_pages/
pdf/web, media_decode, tables_df_format/pivot) compare against
reference dumps pinned on the **sf0.01** corpus — running this tool at
sf0.001 reports ~5 expected mismatches on exactly those rows (different
corpus, same kernel). The driver's gate runs at sf0.01, where all rows
must be green; registry operators (everything else) must be green at
EVERY sf.

Usage: python tools/check_oracles.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import decimal
import hashlib
import sys

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_val(v):
    import numpy as np

    if v is None:
        return "\x00"
    if isinstance(v, (bool, np.bool_)):
        return "t" if v else "f"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        # driver-green precedent: decimal columns compare equal to the
        # numerically-equal float on the other engine
        return repr(float(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if f != f:
            return "\x00"  # NaN ~ null (pandas collapses them anyway)
        return repr(f)
    try:
        if v != v:  # pandas NaT / NaN-like
            return "\x00"
    except Exception:
        pass
    return str(v)


def pandas_rows(pdf, cols):
    return [[pdf.iloc[i][c] for c in cols] for i in range(len(pdf))]


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
            spdf = sdf.toPandas()
            scols = list(sdf.columns)
        except Exception as e:
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name}: rows-only check -> {len(spdf)} rows "
                  f"({'OK' if len(spdf) >= 0 else '??'})")
            continue
        try:
            res = con.execute(oracles[name])
            dpdf = res.fetch_df()
            dcols = list(dpdf.columns)
        except Exception as e:
            print(f"{name}: DUCKDB ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"{name}: SCHEMA MISMATCH spark={sorted(scols)} "
                  f"duck={sorted(dcols)}")
            ok = False
        if len(spdf) != len(dpdf):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(spdf)} "
                  f"duck={len(dpdf)}")
            ok = False
        if ok:
            srows = pandas_rows(spdf, scols)
            drows = pandas_rows(dpdf, dcols)
            hs = table_hash(scols, srows)
            hd = table_hash(dcols, drows)
            if hs != hd:
                print(f"{name}: VALUE HASH MISMATCH ({len(srows)} rows)")
                order_s = sorted(scols)
                ss = sorted(tuple(norm_val(dict(zip(scols, r))[c])
                                  for c in order_s) for r in srows)
                ds = sorted(tuple(norm_val(dict(zip(dcols, r))[c])
                                  for c in order_s) for r in drows)
                shown = 0
                for a, b in zip(ss, ds):
                    if a != b:
                        print(f"   spark={a}\n   duck ={b}")
                        shown += 1
                        if shown >= 3:
                            break
                ok = False
        if ok:
            print(f"{name}: OK ({len(spdf)} rows)")
        else:
            failures += 1
    spark.stop()
    print(f"failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
