"""Round-11 trends family: time-series/growth/corpus-statistics
operators, each pinned against an independent pandas/pure-Python
recomputation on the small testdata (the oracle sweep covers DuckDB
parity; these pin the MATH, not just engine agreement).
"""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from table_versions_spark.operators import trends
from table_versions_spark.operators.common import load, load_events


@pytest.fixture(scope="module")
def events_pd(spark, sf_small):
    return (load_events(spark, sf_small)
            .select("event_id", "user_id", "event_type", "value", "ts",
                    "event_date").toPandas())


class TestCohortRetention:
    def test_age0_equals_cohort_size(self, spark, sf_small):
        got = trends.q_cohort_retention(spark, sf_small).toPandas()
        orders = (load(spark, sf_small, "orders")
                  .select("o_custkey", F.to_date("o_orderdate").alias("od"))
                  .toPandas())
        first = orders.groupby("o_custkey")["od"].min()
        cohort_sizes = (first.map(lambda d: d.replace(day=1))
                        .value_counts())
        age0 = got[got.age_months == 0].set_index("cohort_month")["n_active"]
        for m, n in cohort_sizes.items():
            assert age0[m] == n
        # retention never exceeds the cohort's size
        for _, r in got.iterrows():
            assert r.n_active <= cohort_sizes[r.cohort_month]


class TestEventPaths:
    def test_paths_match_pandas(self, spark, sf_small, events_pd):
        got = trends.q_event_paths(spark, sf_small).toPandas()
        df = events_pd.sort_values(["user_id", "ts", "event_id",
                                    "event_type"])
        paths = (df.groupby("user_id")["event_type"]
                 .apply(lambda s: ">".join(s.head(trends.PATH_LEN))))
        counts = paths.value_counts()
        assert len(got) <= trends.PATH_TOP
        for _, r in got.iterrows():
            assert counts[r.path] == r.n_users
        # top-1 agrees (deterministic tiebreak on path)
        top = counts.reset_index()
        top.columns = ["path", "n"]
        top = top.sort_values(["n", "path"], ascending=[False, True])
        assert got.iloc[0]["path"] == top.iloc[0]["path"]


class TestEwma:
    def test_recursion_matches_pandas(self, spark, sf_small, events_pd):
        got = trends.q_ewma(spark, sf_small).toPandas()
        daily = (events_pd.groupby(["event_type", "event_date"])
                 .size().rename("c").reset_index())
        for et, grp in daily.groupby("event_type"):
            series = grp.sort_values("event_date")["c"].astype(float)
            ref = series.ewm(alpha=float(trends.EWMA_ALPHA),
                             adjust=False).mean().round(6).tolist()
            mine = (got[got.event_type == et].sort_values("day")["ewma"]
                    .tolist())
            assert mine == pytest.approx(ref, abs=1e-6)


class TestAutocorr:
    def test_matches_numpy_formula(self, spark, sf_small, events_pd):
        got = (trends.q_autocorr(spark, sf_small).toPandas()
               .set_index("event_type"))
        daily = (events_pd.groupby(["event_type", "event_date"])
                 .size().rename("c").reset_index())
        for et, grp in daily.groupby("event_type"):
            x = grp.sort_values("event_date")["c"].astype(float).values
            m = x.mean()
            num = float(((x[:-1] - m) * (x[1:] - m)).sum())
            den = float(((x - m) ** 2).sum())
            assert got.loc[et, "autocorr_lag1"] == pytest.approx(
                num / den, abs=1e-6)
            assert -1.0 <= got.loc[et, "autocorr_lag1"] <= 1.0


class TestMoments:
    def test_matches_pandas_population_moments(self, spark, sf_small):
        got = (trends.q_moments(spark, sf_small).toPandas()
               .set_index("l_returnflag"))
        li = (load(spark, sf_small, "lineitem")
              .select("l_returnflag", "l_quantity").toPandas())
        for rf, grp in li.groupby("l_returnflag"):
            q = grp["l_quantity"].astype(int)
            m = q.mean()
            m2 = ((q - m) ** 2).mean()
            m3 = ((q - m) ** 3).mean()
            m4 = ((q - m) ** 4).mean()
            assert got.loc[rf, "mean_qty"] == pytest.approx(m, abs=1e-5)
            assert got.loc[rf, "skewness_qty"] == pytest.approx(
                m3 / m2 ** 1.5, abs=1e-5)
            assert got.loc[rf, "kurtosis_qty"] == pytest.approx(
                m4 / m2 ** 2 - 3, abs=1e-5)


class TestYoyGrowth:
    def test_spot_check_against_pandas(self, spark, sf_small):
        got = trends.q_yoy_growth(spark, sf_small).toPandas()
        orders = (load(spark, sf_small, "orders")
                  .select(F.to_date("o_orderdate").alias("od"),
                          F.round(F.col("o_totalprice") * 100)
                          .cast("long").alias("cents")).toPandas())
        orders["month"] = orders["od"].map(lambda d: d.replace(day=1))
        monthly = orders.groupby("month")["cents"].sum()
        assert len(got) > 0
        for _, r in got.iterrows():
            prev_m = r.month.replace(year=r.month.year - 1)
            assert monthly[r.month] == r.rev_cents
            assert monthly[prev_m] == r.prev_cents
            assert r.yoy == pytest.approx(
                r.rev_cents / r.prev_cents - 1, abs=1e-6)


class TestPsiDrift:
    def test_nonnegative_and_matches_python(self, spark, sf_small,
                                            events_pd):
        got = (trends.q_psi_drift(spark, sf_small).toPandas()
               .set_index("event_type"))
        dmin, dmax = events_pd.event_date.min(), events_pd.event_date.max()
        mid = dmin + pd.Timedelta(days=(dmax - dmin).days // 2)
        B, W = trends.PSI_BINS, trends.PSI_BIN_WIDTH
        for et, grp in events_pd.groupby("event_type"):
            b = grp.value.map(
                lambda v: min(B - 1, max(0, int(math.floor(v / W)))))
            first = grp.event_date <= mid
            na, nb = int(first.sum()), int((~first).sum())
            psi = 0.0
            for k in range(B):
                ca = int(((b == k) & first).sum())
                cb = int(((b == k) & ~first).sum())
                pa, pb = (ca + 1) / (na + B), (cb + 1) / (nb + B)
                psi += (pa - pb) * math.log(pa / pb)
            assert got.loc[et, "psi"] == pytest.approx(psi, abs=1e-6)
            assert got.loc[et, "psi"] >= 0
            assert got.loc[et, "n_first"] == na
            assert got.loc[et, "n_second"] == nb


class TestKsTest:
    def test_matches_manual_ecdf(self, spark, sf_small, events_pd):
        got = trends.q_ks_test(spark, sf_small).collect()[0]
        a = sorted(events_pd[events_pd.event_type == trends.KS_TYPE_A]
                   .value)
        b = sorted(events_pd[events_pd.event_type == trends.KS_TYPE_B]
                   .value)
        import bisect
        points = sorted(set(a) | set(b))
        d = max(abs(bisect.bisect_right(a, v) / len(a)
                    - bisect.bisect_right(b, v) / len(b))
                for v in points)
        assert got["n_a"] == len(a) and got["n_b"] == len(b)
        assert got["ks_stat"] == pytest.approx(d, abs=1e-6)
        assert 0.0 <= got["ks_stat"] <= 1.0


class TestTargetEncoding:
    def test_shrinks_toward_prior(self, spark, sf_small):
        got = trends.q_target_encoding(spark, sf_small).toPandas()
        total_n = got.n_items.sum()
        prior = (got.mean_rev * got.n_items).sum() / total_n
        for _, r in got.iterrows():
            lo, hi = sorted([r.mean_rev, prior])
            assert lo - 1e-4 <= r.enc_smoothed <= hi + 1e-4
            # shrinkage weight matches (n·mean + m·prior)/(n+m)
            expect = ((r.n_items * r.mean_rev
                       + trends.TE_SMOOTHING * prior)
                      / (r.n_items + trends.TE_SMOOTHING))
            assert r.enc_smoothed == pytest.approx(expect, abs=1e-3)


class TestSeasonality:
    def test_counts_and_identity(self, spark, sf_small, events_pd):
        got = trends.q_seasonality(spark, sf_small).toPandas()
        for et, grp in events_pd.groupby("event_type"):
            dow = grp.ts.map(lambda t: (t.weekday() + 1) % 7)
            sub = got[got.event_type == et]
            assert sub.n_events.sum() == len(grp)
            for _, r in sub.iterrows():
                sel = grp[dow == r.dow]
                assert r.n_events == len(sel)
                per_day = len(sel) / sel.event_date.nunique()
                overall = len(grp) / grp.event_date.nunique()
                assert r.seasonal_index == pytest.approx(
                    per_day / overall, abs=1e-6)


class TestCorpusScreens:
    def test_readability_counts(self, spark, sf_small):
        got = trends.q_readability(spark, sf_small).toPandas()
        docs = (load(spark, sf_small, "documents")
                .select("doc_id", "text").limit(5).toPandas())
        by_id = got.set_index("doc_id")
        for _, r in docs.iterrows():
            words = [w for w in r.text.split(" ") if w]
            vg = sum(1 for i, ch in enumerate(r.text)
                     if ch in "aeiouAEIOU"
                     and (i == 0 or r.text[i - 1] not in "aeiouAEIOU"))
            assert by_id.loc[r.doc_id, "n_words"] == len(words)
            assert by_id.loc[r.doc_id, "n_vowel_groups"] == vg
            assert by_id.loc[r.doc_id, "n_sentences"] >= 1

    def test_zipf_slope_negative(self, spark, sf_small):
        got = trends.q_zipf_fit(spark, sf_small).toPandas()
        assert len(got) > 0
        assert (got.zipf_slope < 0).all()
        assert (got.n_top <= trends.ZIPF_TOP).all()

    def test_hapax_and_vocab_match_pandas(self, spark, sf_small):
        hap = (trends.q_hapax_ratio(spark, sf_small).toPandas()
               .set_index("source"))
        voc = (trends.q_vocab_growth(spark, sf_small).toPandas()
               .set_index("source"))
        docs = (load(spark, sf_small, "documents")
                .select("source", "text").toPandas())
        for src, grp in docs.groupby("source"):
            from collections import Counter
            c = Counter(w for t in grp.text for w in t.split(" ") if w)
            n_tokens, n_vocab = sum(c.values()), len(c)
            n_hapax = sum(1 for v in c.values() if v == 1)
            assert hap.loc[src, "n_vocab"] == n_vocab
            assert hap.loc[src, "n_hapax"] == n_hapax
            assert voc.loc[src, "n_tokens"] == n_tokens
            assert voc.loc[src, "heaps_exponent"] == pytest.approx(
                math.log(n_vocab) / math.log(n_tokens), abs=1e-6)


def _daily_counts(events_pd):
    df = events_pd.copy()
    df["d"] = df.event_date
    return (df.groupby(["event_type", "d"]).size()
            .rename("c").reset_index())


class TestCusumChangepoint:
    def test_matches_pure_python(self, spark, sf_small, events_pd):
        got = (trends.q_cusum_changepoint(spark, sf_small).toPandas()
               .set_index("event_type"))
        daily = _daily_counts(events_pd)
        for et, g in daily.groupby("event_type"):
            g = g.sort_values("d")
            mean = g.c.sum() / len(g)
            cus, best = 0.0, None
            for _, r in g.iterrows():
                cus += r.c - mean
                key = (-abs(cus), r.d)
                if best is None or key < best[0]:
                    best = (key, r.d, cus)
            row = got.loc[et]
            assert row.n_days == len(g)
            assert row.change_day == best[1]
            assert row.cusum_at_change == pytest.approx(best[2], abs=1e-6)
            assert row.max_abs_cusum == pytest.approx(abs(best[2]),
                                                      abs=1e-6)


class TestRollingCorr:
    def test_matches_pandas_rolling(self, spark, sf_small, events_pd):
        got = trends.q_rolling_corr(spark, sf_small).toPandas()
        daily = _daily_counts(events_pd)
        x = daily[daily.event_type == trends.ROLL_X].set_index("d").c
        y = daily[daily.event_type == trends.ROLL_Y].set_index("d").c
        days = sorted(set(x.index) & set(y.index))
        j = pd.DataFrame({"x": x[days], "y": y[days]})
        roll = j.x.rolling(trends.ROLL_W).corr(j.y)
        assert len(got) == max(0, len(days) - trends.ROLL_W + 1)
        for _, r in got.iterrows():
            expect = roll[r.day]
            if pd.isna(expect):
                assert pd.isna(r[f"corr{trends.ROLL_W}d"])
            else:
                assert r[f"corr{trends.ROLL_W}d"] == pytest.approx(
                    expect, abs=1e-6)


class TestLeadLagCorr:
    def test_matches_pandas_shift(self, spark, sf_small, events_pd):
        got = (trends.q_lead_lag_corr(spark, sf_small).toPandas()
               .set_index("lag_days"))
        daily = _daily_counts(events_pd)
        x = daily[daily.event_type == trends.LAG_X].set_index("d").c
        y = daily[daily.event_type == trends.LAG_Y].set_index("d").c
        import datetime as dt
        for lag in range(trends.LAG_MAX + 1):
            pairs = [(x[d], y[d + dt.timedelta(days=lag)])
                     for d in x.index
                     if d + dt.timedelta(days=lag) in y.index]
            xs = pd.Series([p[0] for p in pairs], dtype="float64")
            ys = pd.Series([p[1] for p in pairs], dtype="float64")
            row = got.loc[lag]
            assert row.n_days == len(pairs)
            expect = xs.corr(ys)
            if pd.isna(expect):
                assert pd.isna(row["corr"])
            else:
                assert row["corr"] == pytest.approx(expect, abs=1e-6)


class TestTheilSenMannKendall:
    def test_matches_brute_force(self, spark, sf_small, events_pd):
        import numpy as np
        ts = (trends.q_theil_sen(spark, sf_small).toPandas()
              .set_index("event_type"))
        mk = (trends.q_mann_kendall(spark, sf_small).toPandas()
              .set_index("event_type"))
        daily = _daily_counts(events_pd)
        for et, g in daily.groupby("event_type"):
            g = g.sort_values("d").reset_index(drop=True)
            slopes, s = [], 0
            for i in range(len(g)):
                for j in range(i + 1, len(g)):
                    dx = (g.d[j] - g.d[i]).days
                    slopes.append((g.c[j] - g.c[i]) / dx)
                    s += int(g.c[j] > g.c[i]) - int(g.c[j] < g.c[i])
            row = ts.loc[et]
            assert row.n_pairs == len(slopes)
            assert row.slope_per_day == pytest.approx(
                np.median(slopes), abs=1e-6)
            n = len(g)
            ties = g.c.value_counts()
            tt = sum(t * (t - 1) * (2 * t + 5) for t in ties)
            var = (n * (n - 1) * (2 * n + 5) - tt) / 18
            mrow = mk.loc[et]
            assert mrow.n_days == n
            assert mrow.s_stat == s
            if var == 0:
                assert pd.isna(mrow.z_score)
            else:
                expect = 0.0 if s == 0 else (
                    (s - 1) / math.sqrt(var) if s > 0
                    else (s + 1) / math.sqrt(var))
                assert mrow.z_score == pytest.approx(expect, abs=1e-6)


class TestConversionLag:
    def test_matches_pandas(self, spark, sf_small, events_pd):
        got = trends.q_conversion_lag(spark, sf_small).toPandas().iloc[0]
        ev = events_pd
        s = (ev[ev.event_type == trends.CONV_FROM]
             .groupby("user_id").ts.min())
        lags = []
        for u, s_ts in s.items():
            purch = ev[(ev.event_type == trends.CONV_TO)
                       & (ev.user_id == u) & (ev.ts >= s_ts)]
            if len(purch):
                lags.append((purch.ts.min() - s_ts).total_seconds()
                            * 1e6)
        import numpy as np
        assert got.n_signup == len(s)
        assert got.n_converted == len(lags)
        assert got.conv_rate == round(len(lags) / len(s), 6)
        assert got.p50_hours == pytest.approx(
            np.percentile(lags, 50, method="linear") / 3.6e9, abs=2e-6)
        assert got.p90_hours == pytest.approx(
            np.percentile(lags, 90, method="linear") / 3.6e9, abs=2e-6)


class TestForecastBaseline:
    def test_matches_pure_python(self, spark, sf_small, events_pd):
        got = (trends.q_forecast_baseline(spark, sf_small).toPandas()
               .set_index("event_type"))
        daily = _daily_counts(events_pd)
        for et, g in daily.groupby("event_type"):
            c = list(g.sort_values("d").c)
            if len(c) <= 7:
                assert et not in got.index
                continue
            sn = sum(abs(c[i] - c[i - 1]) for i in range(7, len(c)))
            ss = sum(abs(c[i] - c[i - 7]) for i in range(7, len(c)))
            row = got.loc[et]
            n = len(c) - 7
            assert row.n_eval == n
            assert row.mae_naive == round(sn / n, 6)
            assert row.mae_seasonal == round(ss / n, 6)
            if sn == 0:
                assert pd.isna(row.ratio_seasonal_naive)
            else:
                assert row.ratio_seasonal_naive == round(ss / sn, 6)
