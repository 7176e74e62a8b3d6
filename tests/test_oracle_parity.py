"""Mirror of the driver's correctness gate: run every queries() entry at
sf0.01 and compare against its oracle_sql() through DuckDB (row count, schema
names, order-insensitive values)."""

import duckdb
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Normalize WIDTH but preserve KIND: ints → int64, floats →
    rounded float64, bools → bool, rest → str. The driver's value hash
    is dtype-sensitive (r3's doc_chunking red row was an oracle emitting
    double where the engine emits int64), so the comparison below runs
    check_dtype=True over these normalized frames — an int-vs-float
    mismatch fails here exactly as it fails the driver gate."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        kind = getattr(df[c].dtype, "kind", "O")
        if kind in "iu":
            df[c] = df[c].astype("int64")
        elif kind == "f":
            df[c] = df[c].round(9).astype("float64")
        elif kind == "b":
            df[c] = df[c].astype(bool)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _pairs():
    from metrics_ray.pipelines.queries import VALIDATION_QUERIES

    return [(n, fn, sql) for n, (fn, sql) in VALIDATION_QUERIES.items()
            if sql is not None]


@pytest.mark.parametrize("name", [p[0] for p in _pairs()])
def test_query_matches_oracle(name, con):
    from metrics_ray.pipelines.queries import VALIDATION_QUERIES

    fn, sql = VALIDATION_QUERIES[name]
    got = fn(SF)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = con.execute(sql).df()
    assert list(sorted(got.columns)) == list(sorted(want.columns)), name
    g, w = _normalize(got), _normalize(want)
    assert len(g) == len(w), f"{name}: {len(g)} vs {len(w)} rows"
    pd.testing.assert_frame_equal(g, w, check_dtype=True)


def test_rows_only_queries_run():
    from metrics_ray.pipelines.queries import VALIDATION_QUERIES

    for name in ("val_decode_violations", "val_audio_features",
                 "emb_neardup_lsh", "emb_knn_ivf"):
        fn, _ = VALIDATION_QUERIES[name]
        t = fn(SF)
        assert t.num_rows > 0, name


def test_entry_smoke():
    import __ray_entry__ as e

    df = e.entry()
    assert len(df) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
