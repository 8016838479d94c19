"""Every queries() entry agrees with its DuckDB oracle at sf0.001
(the driver runs the same comparison at sf0.01)."""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_oracles import TABLES, table_hash

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{SF}/{t}.parquet'")
    return con


def _oracle_names():
    return sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    sdf = fn(spark, SF)
    scols = sdf.columns
    srows = sdf.collect()
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    hs = table_hash(scols, [[r[c] for c in scols] for r in srows])
    hd = table_hash(dcols, drows)
    assert hs == hd, f"{name}: value hash mismatch over {len(srows)} rows"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(2000).collect()
    assert len(rows) > 0
    assert {"url", "page_index", "extracted_text"} <= set(df.columns)
