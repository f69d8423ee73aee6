"""Driver-style correctness gate: every query vs its DuckDB oracle.

Mimics the driver's comparison: run the Ray pipeline and the oracle SQL on
the same parquet tables, sort columns by name, compare row count + schema +
order-insensitive values. Non-SQL queries get a rows/determinism check.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _to_pandas(res):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == np.uint64:
            df[c] = df[c].astype(np.int64)  # order-insensitive value compare only
        if str(df[c].dtype) in ("int32", "uint32", "int16"):
            df[c] = df[c].astype(np.int64)
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype(np.float64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    a, b = _normalize(ray_df), _normalize(sql_df)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    for c in a.columns:
        if a[c].dtype == np.float64:
            assert np.allclose(a[c], b[c], rtol=0, atol=1e-9), f"{name}: float col {c} mismatch"
            # the driver hashes exact values — demand bit-equality too
            assert (a[c].to_numpy() == b[c].to_numpy()).all(), f"{name}: col {c} not bit-identical"
        else:
            assert (a[c].to_numpy() == b[c].to_numpy()).all(), f"{name}: col {c} mismatch"


def _sql_names():
    from cloud_crawler_ray import queries as q

    return sorted(q.ORACLE_SQL)


def _rows_only_names():
    from cloud_crawler_ray import queries as q

    return sorted(set(q.QUERIES) - set(q.ORACLE_SQL))


@pytest.mark.parametrize("name", _sql_names())
def test_query_vs_oracle(name, duck, ray_session):
    from cloud_crawler_ray import queries as q

    ray_df = _to_pandas(q.QUERIES[name](SF_DIR))
    sql_df = duck.sql(q.ORACLE_SQL[name]).df()
    compare(ray_df, sql_df, name)


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_queries_deterministic(name, ray_session):
    from cloud_crawler_ray import queries as q

    df1 = _normalize(_to_pandas(q.QUERIES[name](SF_DIR)))
    df2 = _normalize(_to_pandas(q.QUERIES[name](SF_DIR)))
    assert len(df1) >= 0 and list(df1.columns)
    pd.testing.assert_frame_equal(df1, df2)


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    df = _to_pandas(e.entry())
    assert len(df) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_embedding_neardup_block_guard(ray_session, monkeypatch):
    """A label whose embedding block exceeds the per-task memory bound must
    raise loudly (VERDICT r4 #6) instead of silently OOMing one worker."""
    import pytest

    from cloud_crawler_ray import queries as q

    monkeypatch.setattr(q, "_NEARDUP_MAX_BLOCK_BYTES", 64)  # force the trip
    with pytest.raises(Exception, match="per-label block bound"):
        q.q_embedding_neardup(SF_DIR).to_pandas()
