"""Every queries() entry agrees with its DuckDB oracle.

Comparison is driver-faithful: both sides go through pandas
(``toPandas()`` / ``fetch_df()``) exactly like tools/check_oracles.py,
so int-vs-float type drift (DuckDB HUGEINT -> float64) fails here too.

Most entries compare at sf0.001; the golden-fixture-backed entries
(extract_pages_flagship / tables_df_format / extract_web_pages) compare
at sf0.01 because their fixtures are pinned there — the same sf the
driver gate uses.
"""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_oracles import TABLES, pandas_rows, table_hash

SF = "/root/testdata/sf0.001"
SF_GOLDEN = "/root/testdata/sf0.01"

_GOLDEN = set(entrymod._GOLDEN_ORACLES)


def _sf_for(name):
    return SF_GOLDEN if name in _GOLDEN else SF


@pytest.fixture(scope="module")
def ducks():
    cons = {}
    for sf in (SF, SF_GOLDEN):
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"create view {t} as select * from '{sf}/{t}.parquet'")
        cons[sf] = con
    return cons


def _oracle_names():
    return sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, ducks, name):
    sf = _sf_for(name)
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    sdf = fn(spark, sf)
    scols = list(sdf.columns)
    spdf = sdf.toPandas()
    res = ducks[sf].execute(sql)
    dpdf = res.fetch_df()
    dcols = list(dpdf.columns)
    assert sorted(scols) == sorted(dcols)
    assert len(spdf) == len(dpdf)
    hs = table_hash(scols, pandas_rows(spdf, scols))
    hd = table_hash(dcols, pandas_rows(dpdf, dcols))
    assert hs == hd, f"{name}: value hash mismatch over {len(spdf)} rows"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(2000).collect()
    assert len(rows) > 0
    assert {"url", "page_index", "extracted_text"} <= set(df.columns)
