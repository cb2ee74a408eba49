"""Local replica of the driver's t2 gate: every entry_queries query must
match its DuckDB oracle on the same parquet tables (sf0.001 for speed)."""

import os

import duckdb
import pandas as pd
import pytest

from rdf_fusion_spark import entry_queries as EQ

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), na_position="first") \
        .reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", sorted(set(EQ.queries()) & set(EQ.oracle_sql())))
def test_query_matches_oracle(spark, ddb, name):
    qfn = EQ.queries()[name]
    spark_pdf = qfn(spark, SF_DIR).toPandas()
    oracle_pdf = ddb.execute(EQ.oracle_sql()[name]).fetchdf()

    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    assert list(s.columns) == list(o.columns), f"{name}: columns differ"
    assert len(s) == len(o), f"{name}: row counts differ {len(s)} vs {len(o)}"
    for col in s.columns:
        sv, ov = s[col], o[col]
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            sv = sv.astype("float64")
            ov = ov.astype("float64")
            pd.testing.assert_series_equal(sv, ov, check_names=False,
                                           check_exact=True)
        elif "datetime" in str(ov.dtype) or "datetime" in str(sv.dtype):
            pd.testing.assert_series_equal(
                pd.to_datetime(sv).dt.tz_localize(None)
                .astype("datetime64[ns]"),
                pd.to_datetime(ov).dt.tz_localize(None)
                .astype("datetime64[ns]"),
                check_names=False)
        else:
            assert sv.astype(str).tolist() == ov.astype(str).tolist(), \
                f"{name}: values differ in {col}"
