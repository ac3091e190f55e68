"""Local mirror of the driver's correctness gate: every oracle-checked
queries() entry is executed through Spark AND through DuckDB and compared
exactly (row count + sorted-by-name columns + values).

Exact comparison (== on doubles) is intentional: the numeric-parity
conventions in __spark_entry__ (decimal sums, closed-form stddev, epoch
casts, md5 hashes) are designed to make results bit-identical, and this
harness is what proves it.
"""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # unify None; array cells (list/ndarray) become tuples so the
            # multi-key lexsort can hash them
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(oracle_pdf)}"
    )
    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    assert list(s.columns) == list(o.columns), f"{name}: columns {list(s.columns)} vs {list(o.columns)}"
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(ov.dtype, np.floating):
            sv = sv.astype(float)
            ov = ov.astype(float)
            both_nan = np.isnan(sv) & np.isnan(ov)
            eq = (sv == ov) | both_nan
            if not eq.all():
                bad = np.nonzero(~eq)[0][:5]
                raise AssertionError(
                    f"{name}.{c}: {int((~eq).sum())} mismatches, e.g. rows {bad.tolist()}: "
                    f"spark={sv[bad].tolist()} oracle={ov[bad].tolist()}"
                )
        else:
            eq = pd.Series(sv).fillna("__null__").eq(pd.Series(ov).fillna("__null__"))
            if not eq.all():
                bad = np.nonzero(~eq.to_numpy())[0][:5]
                raise AssertionError(
                    f"{name}.{c}: {int((~eq).sum())} mismatches, e.g. rows {bad.tolist()}: "
                    f"spark={sv[bad].tolist()} oracle={ov[bad].tolist()}"
                )


ORACLE_NAMES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    oracle_pdf = ddb.execute(sql).df()
    _compare(spark_pdf, oracle_pdf, name)


NO_ORACLE = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, "/root/testdata/sf0.001")
    n = df.count()
    assert n >= 0
    assert len(df.schema) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_verified_by_covers_exactly_the_rows_only_queries():
    """Every queries() entry without an oracle must carry a verified_by
    note naming its pytest evidence — and no stale notes for queries
    that have since gained oracles."""
    vb = entrymod.verified_by()
    rows_only = set(entrymod.queries()) - set(entrymod.oracle_sql())
    assert set(vb) == rows_only
    for name, how in vb.items():
        assert "tests/" in how, f"{name}: note must name its test evidence"
