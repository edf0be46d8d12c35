"""Operator-surface tests.

- Registry contract: every query id has a callable; oracle keys ⊆ query keys;
  every callable runs at sf0.001 and yields a non-empty schema.
- DuckDB parity at sf0.001 for a representative subset (the full sweep runs
  in tools/check_oracles.py at sf0.01 — same comparison logic).
"""

import datetime as dt
import math

import pytest

import __spark_entry__ as entrymod

PARITY_SUBSET = [
    "q_agg_hash", "q_join_inner", "q_window_rank", "q_dedup_exact",
    "q_text_stats", "q_sim_search", "q_snapshot_replace",
    "q_insert_overwrite_partition", "q_date_from_ts" if False else "q_date_funcs",
    "q_multimodal",
]


@pytest.fixture(scope="module")
def registry():
    return entrymod.queries(), entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_small):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_small}/{t}.parquet')")
    return con


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(round(v, 9))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


class TestRegistry:
    def test_oracle_keys_subset_of_queries(self, registry):
        qs, oracles = registry
        assert set(oracles) <= set(qs)
        assert len(qs) >= 40

    def test_rows_only_queries_documented(self, registry):
        qs, oracles = registry
        rows_only = set(qs) - set(oracles)
        # exactly the algorithm-specific ops may omit an oracle
        assert rows_only == {"q_agg_approx_distinct", "q_sim_ann_ivf",
                             "q_dedup_minhash", "q_dedup_simhash"}

    @pytest.mark.parametrize("name", sorted(entrymod.queries()))
    def test_query_runs(self, spark, sf_small, registry, name):
        qs, _ = registry
        df = qs[name](spark, sf_small)
        assert len(df.columns) > 0
        assert df.count() >= 0


class TestParity:
    @pytest.mark.parametrize("name", PARITY_SUBSET)
    def test_matches_duckdb(self, spark, sf_small, duck, registry, name):
        qs, oracles = registry
        sdf = qs[name](spark, sf_small)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        rel = duck.sql(oracles[name])
        d_cols = list(rel.columns)
        d_rows = rel.fetchall()
        assert sorted(s_cols) == sorted(d_cols)
        assert len(s_rows) == len(d_rows)
        so = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
        do = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
        s_set = sorted("|".join(canon(r[i]) for i in so) for r in s_rows)
        d_set = sorted("|".join(canon(r[i]) for i in do) for r in d_rows)
        assert s_set == d_set


class TestEntry:
    def test_entry_smoke(self, spark):
        df = entrymod.entry(spark)
        assert df.count() > 0
        assert "sum_qty" in df.columns
