"""Round-11 profiling family: candidate keys, functional dependencies,
column entropy, HHI concentration, KL/JS corpus divergence — each
pinned against an independent pandas/pure-Python recomputation on the
small testdata (the oracle sweep covers DuckDB parity; these pin the
MATH, not just engine agreement).
"""

import math

import pytest
from pyspark.sql import functions as F

from table_versions_spark.operators import profiling
from table_versions_spark.operators.common import load


@pytest.fixture(scope="module")
def orders_pd(spark, sf_small):
    return load(spark, sf_small, "orders").toPandas()


@pytest.fixture(scope="module")
def docs_pd(spark, sf_small):
    return (load(spark, sf_small, "documents")
            .select("doc_id", "source", "text").toPandas())


def _tok_counts(docs_pd, sources=None):
    from collections import Counter
    per_source: dict[str, Counter] = {}
    for _, r in docs_pd.iterrows():
        if sources is not None and r.source not in sources:
            continue
        toks = [t for t in r.text.split(" ") if t != ""]
        per_source.setdefault(r.source, Counter()).update(toks)
    return per_source


class TestKeyCandidates:
    def test_matches_pandas(self, spark, sf_small, orders_pd):
        got = (profiling.q_key_candidates(spark, sf_small)
               .toPandas().set_index("column_name"))
        n = len(orders_pd)
        assert set(got.index) == set(profiling.KEY_COLS)
        for c in profiling.KEY_COLS:
            d = orders_pd[c].nunique()
            row = got.loc[c]
            assert row.n_rows == n
            assert row.n_distinct == d
            assert row.uniqueness == round(d / n, 6)
            assert bool(row.is_unique_key) == (d == n)
        # the primary key is detected, a 3-value enum is not
        assert bool(got.loc["o_orderkey"].is_unique_key)
        assert not bool(got.loc["o_orderstatus"].is_unique_key)


class TestFuncDependencies:
    def test_matches_pandas(self, spark, sf_small):
        got = (profiling.q_func_dependencies(spark, sf_small)
               .toPandas().set_index("fd"))
        for table, lhs, rhs in profiling.FD_SPECS:
            pdf = load(spark, sf_small, table).select(lhs, rhs).toPandas()
            k = pdf.groupby(lhs)[rhs].nunique()
            row = got.loc[f"{table}.{lhs}->{rhs}"]
            assert row.n_lhs == len(k)
            assert row.n_violating == int((k > 1).sum())
            assert row.max_fanout == int(k.max())
            assert bool(row.holds) == bool((k <= 1).all())
        # the primary-key FD holds by construction
        assert bool(got.loc["orders.o_orderkey->o_orderstatus"].holds)


class TestColEntropy:
    def test_matches_pure_python(self, spark, sf_small, orders_pd):
        got = (profiling.q_col_entropy(spark, sf_small)
               .toPandas().set_index("column_name"))
        for c in profiling.ENTROPY_COLS:
            vals = orders_pd[c].astype(str).value_counts()
            n = int(vals.sum())
            h = -sum((cnt / n) * math.log(cnt / n)
                     for _, cnt in sorted(vals.items())) / math.log(2)
            row = got.loc[c]
            assert row.n_distinct == len(vals)
            assert row.n_rows == n
            assert abs(row.entropy_bits - h) < 1e-6
        # entropy is bounded by log2(distinct)
        for c in profiling.ENTROPY_COLS:
            row = got.loc[c]
            assert -1e-9 <= row.entropy_bits <= (
                math.log2(row.n_distinct) + 1e-9)


class TestHHI:
    def test_matches_pandas(self, spark, sf_small):
        got = (profiling.q_hhi_concentration(spark, sf_small)
               .toPandas().set_index("nation"))
        li = load(spark, sf_small, "lineitem").select(
            "l_suppkey", "l_extendedprice", "l_discount").toPandas()
        sup = load(spark, sf_small, "supplier").select(
            "s_suppkey", "s_nationkey").toPandas()
        nat = load(spark, sf_small, "nation").select(
            "n_nationkey", "n_name").toPandas()
        li["rev"] = (li.l_extendedprice * (1 - li.l_discount)
                     * 10000).round().astype("int64")
        j = li.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
        per = (j.groupby(["s_nationkey", "s_suppkey"])["rev"].sum()
               .reset_index())
        for nk, g in per.groupby("s_nationkey"):
            t = g.rev.sum()
            hhi = sum((r / t) ** 2 for r in g.rev)
            name = nat[nat.n_nationkey == nk].n_name.iloc[0]
            row = got.loc[name]
            assert row.n_suppliers == len(g)
            assert row.revenue_e4 == t
            assert abs(row.hhi - hhi) < 1e-6
            # HHI lives in [1/n, 1]
            assert 1 / len(g) - 1e-9 <= row.hhi <= 1 + 1e-9


class TestKLDivergence:
    def test_matches_pure_python(self, spark, sf_small, docs_pd):
        got = (profiling.q_kl_divergence(spark, sf_small)
               .toPandas().set_index("source"))
        per_source = _tok_counts(docs_pd)
        corpus: dict[str, int] = {}
        for c in per_source.values():
            for w, k in c.items():
                corpus[w] = corpus.get(w, 0) + k
        big_n = sum(corpus.values())
        for s, cnt in per_source.items():
            n_i = sum(cnt.values())
            kl = sum((c / n_i) * math.log((c / n_i) / (corpus[w] / big_n))
                     for w, c in sorted(cnt.items()))
            row = got.loc[s]
            assert row.n_tokens == n_i
            assert row.n_terms == len(cnt)
            assert abs(row.kl_nats - kl) < 1e-6
            # KL against a covering mixture is non-negative
            assert row.kl_nats >= -1e-9


class TestJSDivergence:
    def test_matches_pure_python(self, spark, sf_small, docs_pd):
        got = profiling.q_js_divergence(spark, sf_small).toPandas()
        srcs = profiling.JS_SOURCES
        per_source = _tok_counts(docs_pd, sources=set(srcs))
        totals = {s: sum(per_source.get(s, {}).values()) for s in srcs}
        vocab = sorted({w for c in per_source.values() for w in c})

        def js(a, b):
            ca, cb = per_source.get(a, {}), per_source.get(b, {})
            out = 0.0
            for w in vocab:
                p = ca.get(w, 0) / totals[a]
                q = cb.get(w, 0) / totals[b]
                m = (p + q) / 2
                if p > 0:
                    out += (p * math.log(p / m)) / 2
                if q > 0:
                    out += (q * math.log(q / m)) / 2
            return out

        assert len(got) == len(srcs) * (len(srcs) - 1) // 2
        for _, r in got.iterrows():
            expect = js(r.src_a, r.src_b)
            assert abs(r.js_nats - expect) < 1e-6
            # JS is symmetric, non-negative, bounded by ln 2
            assert -1e-9 <= r.js_nats <= math.log(2) + 1e-9
            assert abs(js(r.src_b, r.src_a) - expect) < 1e-12


class TestKAnonymity:
    def test_matches_pandas(self, spark, sf_small, orders_pd):
        got = (profiling.q_k_anonymity(spark, sf_small)
               .toPandas().set_index("qi_set"))
        cust = load(spark, sf_small, "customer").toPandas()
        sizes = cust.groupby(["c_nationkey", "c_mktsegment"]).size()
        row = got.loc["customer:nationkey+mktsegment"]
        assert row.n_groups == len(sizes)
        assert row.min_group_size == int(sizes.min())
        at_risk = int(sizes[sizes < profiling.K_ANON_K].sum())
        assert row.rows_at_risk == at_risk
        assert row.n_rows == len(cust)
        assert row.pct_at_risk == round(at_risk / len(cust), 6)
        o = orders_pd.copy()
        o["y"] = o.o_orderdate.map(lambda d: d.year)
        sizes2 = o.groupby(["o_orderstatus", "o_orderpriority", "y"]).size()
        row2 = got.loc["orders:status+priority+year"]
        assert row2.n_groups == len(sizes2)
        assert row2.min_group_size == int(sizes2.min())


class TestLDiversity:
    def test_matches_pandas(self, spark, sf_small):
        got = profiling.q_l_diversity(spark, sf_small).toPandas().iloc[0]
        cust = load(spark, sf_small, "customer").toPandas()
        cust["band"] = (cust.c_acctbal / profiling.LDIV_BAND).map(
            math.floor)
        ls = cust.groupby(["c_nationkey", "c_mktsegment"])["band"].nunique()
        assert got.n_groups == len(ls)
        assert got.min_l == int(ls.min())
        assert got.n_homogeneous == int((ls == 1).sum())
        assert got.avg_l == round(float(ls.sum()) / len(ls), 6)


class TestDQChecks:
    def test_clean_testdata_passes_and_planted_violation_fails(
            self, spark, sf_small, tmp_path):
        got = (profiling.q_dq_checks(spark, sf_small)
               .toPandas().set_index("rule"))
        # the generated testdata satisfies every rule
        assert bool(got.passed.all()), got
        assert (got.n_violations == 0).all()
        assert (got.n_checked > 0).all()
        # planted violations: an orphan order and an out-of-range balance
        sf_dir = str(tmp_path / "sf")
        for t in ["orders", "customer", "lineitem", "documents"]:
            df = load(spark, sf_small, t)
            if t == "orders":
                extra = df.limit(1).selectExpr(
                    "o_orderkey + 1000000 AS o_orderkey",
                    "CAST(-1 AS BIGINT) AS o_custkey",  # orphan FK
                    "'X' AS o_orderstatus",             # bad enum
                    "o_totalprice", "o_orderdate", "o_orderpriority")
                df = df.unionByName(extra)
            if t == "customer":
                extra = df.limit(1).selectExpr(
                    "c_custkey + 1000000 AS c_custkey", "c_name",
                    "c_nationkey",
                    "CAST(99999.0 AS DOUBLE) AS c_acctbal",  # range
                    "c_mktsegment")
                df = df.unionByName(extra)
            df.write.mode("overwrite").parquet(f"{sf_dir}/{t}.parquet")
        got2 = (profiling.q_dq_checks(spark, sf_dir)
                .toPandas().set_index("rule"))
        assert not bool(
            got2.loc["fk:orders.o_custkey->customer"].passed)
        assert got2.loc["fk:orders.o_custkey->customer"].n_violations == 1
        assert not bool(
            got2.loc["accepted:orders.o_orderstatus{O,F,P}"].passed)
        assert not bool(
            got2.loc["range:customer.c_acctbal[-1000,10000]"].passed)
        assert bool(got2.loc["positive:lineitem.l_quantity"].passed)


class TestEmbeddingDrift:
    def test_matches_numpy(self, spark, sf_small):
        import numpy as np
        got = profiling.q_embedding_drift(spark, sf_small).toPandas()
        emb = load(spark, sf_small, "embeddings").toPandas()
        emb["q"] = emb.embedding.map(
            lambda v: np.round(np.asarray(v, dtype="float64")
                               * profiling.EMB_FP).astype("int64"))
        means = {}
        for lab, g in emb.groupby("label"):
            s = np.sum(np.stack(g.q.values), axis=0)
            means[lab] = s / (profiling.EMB_FP * len(g))
        labs = sorted(means)
        assert len(got) == len(labs) * (len(labs) - 1) // 2
        for _, r in got.iterrows():
            a, b = means[r.label_a], means[r.label_b]
            expect = float(np.dot(a, b)
                           / (np.sqrt(np.dot(a, a))
                              * np.sqrt(np.dot(b, b))))
            assert r.cosine == pytest.approx(expect, abs=1e-6)
            assert -1 - 1e-9 <= r.cosine <= 1 + 1e-9
