"""Wave-9 statistics (stats2.py) against independent Python
recomputations. The queries' determinism contract says the final doubles
are bit-identical to any IEEE engine that executes the same operation
order — so these tests assert EXACT equality, recomputing each statistic
from the raw parquet with plain Python floats in the documented order."""

import math
import os
from collections import Counter
from decimal import Decimal, ROUND_HALF_UP

import pyarrow.parquet as pq


def _events(sf_dir, cols):
    return pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=cols)


def _orders(sf_dir, cols):
    return pq.read_table(os.path.join(sf_dir, "orders.parquet"), columns=cols)


def _monthly_revenue(sf_dir):
    t = _orders(sf_dir, ["o_orderdate", "o_totalprice"])
    by_month = {}
    for d, p in zip(
        t.column("o_orderdate").to_pylist(), t.column("o_totalprice").to_pylist()
    ):
        key = d.date().replace(day=1) if hasattr(d, "date") else d.replace(day=1)
        by_month.setdefault(key, Decimal(0))
        by_month[key] += Decimal(str(p)).quantize(Decimal("0.01"))
    return sorted(
        (m, float(v.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)))
        for m, v in by_month.items()
    )


def test_ks_two_sample_matches_python(spark, sf_dir):
    t = _events(sf_dir, ["event_type", "value"])
    g1, g2 = [], []
    for ty, v in zip(
        t.column("event_type").to_pylist(), t.column("value").to_pylist()
    ):
        if ty == "purchase":
            g1.append(v)
        elif ty == "click":
            g2.append(v)
    c1, c2 = Counter(g1), Counter(g2)
    n1, n2 = len(g1), len(g2)
    k1 = k2 = 0
    best = (-1, None)  # (numerator, value); max numerator, min value tiebreak
    for v in sorted(set(c1) | set(c2)):
        k1 += c1.get(v, 0)
        k2 += c2.get(v, 0)
        d = abs(k1 * n2 - k2 * n1)
        if d > best[0]:
            best = (d, v)
    from ecommerce_lakehouse_spark.queries.stats2 import ks_two_sample

    r = ks_two_sample(spark, sf_dir).collect()[0]
    assert (r.n1, r.n2) == (n1, n2)
    assert r.at_value == best[1]
    assert r.ks_d == float(best[0]) / (float(n1) * float(n2))


def test_spearman_matches_python(spark, sf_dir):
    t = _events(sf_dir, ["ts", "value"])
    xs = t.column("value").to_pylist()
    ys = [ts.hour for ts in t.column("ts").to_pylist()]

    def double_ranks(vals):
        cnt = Counter(vals)
        out, cum = {}, 0
        for v in sorted(cnt):
            cum += cnt[v]
            out[v] = 2 * cum - cnt[v] + 1
        return out

    rx, ry = double_ranks(xs), double_ranks(ys)
    n = len(xs)
    sx = sum(rx[v] for v in xs)
    sy = sum(ry[v] for v in ys)
    sxx = sum(rx[v] ** 2 for v in xs)
    syy = sum(ry[v] ** 2 for v in ys)
    sxy = sum(rx[a] * ry[b] for a, b in zip(xs, ys))
    fn, fsx, fsy = float(n), float(sx), float(sy)
    rho = (fn * float(sxy) - fsx * fsy) / (
        math.sqrt(fn * float(sxx) - fsx * fsx)
        * math.sqrt(fn * float(syy) - fsy * fsy)
    )
    from ecommerce_lakehouse_spark.queries.stats2 import spearman_rank_corr

    r = spearman_rank_corr(spark, sf_dir).collect()[0]
    assert r.n == n
    assert r.spearman_rho == rho


def test_kendall_tau_b_matches_python(spark, sf_dir):
    t = _orders(sf_dir, ["o_orderdate", "o_orderpriority"])
    cells = Counter(
        (d.isoweekday() if hasattr(d, "isoweekday") else d.date().isoweekday(),
         int(p[0]))
        for d, p in zip(
            t.column("o_orderdate").to_pylist(),
            t.column("o_orderpriority").to_pylist(),
        )
    )
    conc = disc = 0
    for (x1, y1), a in cells.items():
        for (x2, y2), b in cells.items():
            if x2 > x1 and y2 > y1:
                conc += a * b
            elif x2 > x1 and y2 < y1:
                disc += a * b
    n = sum(cells.values())
    tx = Counter()
    ty = Counter()
    for (x, y), c in cells.items():
        tx[x] += c
        ty[y] += c
    tiex2 = sum(v * (v - 1) for v in tx.values())
    tiey2 = sum(v * (v - 1) for v in ty.values())
    tau = (float(conc) - float(disc)) / (
        math.sqrt((float(n) * float(n - 1) - float(tiex2)) / 2.0)
        * math.sqrt((float(n) * float(n - 1) - float(tiey2)) / 2.0)
    )
    from ecommerce_lakehouse_spark.queries.stats2 import kendall_tau_b

    r = kendall_tau_b(spark, sf_dir).collect()[0]
    assert (r.n, r.concordant, r.discordant) == (n, conc, disc)
    assert r.tau_b == tau


def test_revenue_trend_ols_matches_python(spark, sf_dir):
    series = _monthly_revenue(sf_dir)
    i = st = sy = stt = syy = sty = 0.0
    for _, y in series:
        i, st, sy, stt, syy, sty = (
            i + 1.0,
            st + i,
            sy + y,
            stt + i * i,
            syy + y * y,
            sty + i * y,
        )
    slope = (i * sty - st * sy) / (i * stt - st * st)
    intercept = (sy - slope * st) / i
    r2 = ((i * sty - st * sy) * (i * sty - st * sy)) / (
        (i * stt - st * st) * (i * syy - sy * sy)
    )
    from ecommerce_lakehouse_spark.queries.stats2 import revenue_trend_ols

    r = revenue_trend_ols(spark, sf_dir).collect()[0]
    assert r.n_months == len(series)
    assert r.slope == slope
    assert r.intercept == intercept
    assert r.r2 == r2
    assert r.forecast_next == intercept + slope * i


def test_holt_linear_matches_python(spark, sf_dir):
    series = _monthly_revenue(sf_dir)
    al, be = 0.3, 0.2
    months = [m for m, _ in series]
    ys = [y for _, y in series]
    l, b = ys[0], ys[1] - ys[0]
    rows = {months[0]: (ys[0], l, b, None)}
    for m, y in zip(months[1:], ys[1:]):
        fitted = l + b
        nl = al * y + (1.0 - al) * (l + b)
        nb = be * (nl - l) + (1.0 - be) * b
        l, b = nl, nb
        rows[m] = (y, l, b, fitted)
    from ecommerce_lakehouse_spark.queries.stats2 import holt_linear_forecast

    got = holt_linear_forecast(spark, sf_dir).collect()
    fits = [r for r in got if r.revenue is not None]
    fcs = sorted(r for r in got if r.revenue is None)
    assert len(fits) == len(series) and len(fcs) == 3
    for r in fits:
        y, lv, tr, fit = rows[r.month]
        assert (r.revenue, r.level, r.trend, r.fitted) == (y, lv, tr, fit)
    last = months[-1]
    for h, r in enumerate(sorted(fcs, key=lambda r: r.month), start=1):
        assert (r.month.year, r.month.month) == (
            last.year + (last.month + h - 1) // 12,
            (last.month + h - 1) % 12 + 1,
        )
        assert r.fitted == l + float(h) * b
        assert r.level is None and r.trend is None


def test_ks_direction_sanity(spark, sf_dir):
    """D is in [0, 1] and positive on real data; at_value lies in the
    observed value range."""
    from ecommerce_lakehouse_spark.queries.stats2 import ks_two_sample

    r = ks_two_sample(spark, sf_dir).collect()[0]
    assert 0.0 < r.ks_d < 1.0
    assert 0.0 < r.at_value < 500.0


def test_mann_whitney_matches_python(spark, sf_dir):
    t = _events(sf_dir, ["event_type", "value"])
    g1, g2 = [], []
    for ty, v in zip(
        t.column("event_type").to_pylist(), t.column("value").to_pylist()
    ):
        if ty == "purchase":
            g1.append(v)
        elif ty == "click":
            g2.append(v)
    comb = Counter(g1) + Counter(g2)
    c1 = Counter(g1)
    n1, n2 = len(g1), len(g2)
    cum = 0
    r1x2 = 0
    ties = 0
    for v in sorted(comb):
        m = comb[v]
        cum += m
        dr = 2 * cum - m + 1
        r1x2 += c1.get(v, 0) * dr
        ties += m * m * m - m
    u1x2 = r1x2 - n1 * (n1 + 1)
    u1 = float(u1x2) / 2.0
    n1d, n2d, nd, td = float(n1), float(n2), float(n1 + n2), float(ties)
    z = (u1 - (n1d * n2d) / 2.0) / math.sqrt(
        (n1d * n2d / 12.0) * ((nd + 1.0) - td / (nd * (nd - 1.0)))
    )
    from ecommerce_lakehouse_spark.queries.stats2 import mann_whitney_u

    r = mann_whitney_u(spark, sf_dir).collect()[0]
    assert (r.n1, r.n2, r.u1_x2) == (n1, n2, u1x2)
    assert r.z_score == z


def test_theil_sen_matches_python(spark, sf_dir):
    series = _monthly_revenue(sf_dir)
    months = [m for m, _ in series]
    ys = [y for _, y in series]

    def mgap(a, b):
        return (b.year - a.year) * 12 + (b.month - a.month)

    slopes = sorted(
        (ys[j] - ys[i]) / float(mgap(months[i], months[j]))
        for i in range(len(ys))
        for j in range(i + 1, len(ys))
    )
    np_ = len(slopes)
    med = (
        slopes[(np_ + 1) // 2 - 1]
        if np_ % 2 == 1
        else (slopes[np_ // 2 - 1] + slopes[np_ // 2]) / 2.0
    )
    from ecommerce_lakehouse_spark.queries.stats2 import revenue_theil_sen

    r = revenue_theil_sen(spark, sf_dir).collect()[0]
    assert (r.n_months, r.n_pairs) == (len(series), np_)
    assert r.theil_sen_slope == med


def test_forecast_backtest_matches_python(spark, sf_dir):
    series = _monthly_revenue(sf_dir)
    ys = [y for _, y in series]
    n = len(ys)
    s = [ys[0]]
    for y in ys[1:]:
        s.append(0.3 * y + 0.7 * s[-1])

    def mae(fc):
        acc = 0.0
        for t in range(n - 12, n):
            acc += abs(fc(t) - ys[t])
        return acc / 12.0

    mn = mae(lambda t: ys[t - 1])
    msn = mae(lambda t: ys[t - 12])
    mses = mae(lambda t: s[t - 1])
    from ecommerce_lakehouse_spark.queries.stats2 import forecast_backtest_mae

    r = forecast_backtest_mae(spark, sf_dir).collect()[0]
    assert r.n_months == n
    assert (r.mae_naive, r.mae_snaive, r.mae_ses) == (mn, msn, mses)
    best = (
        "naive"
        if mn <= msn and mn <= mses
        else ("seasonal_naive" if msn <= mses else "ses")
    )
    assert r.best_method == best


def _round_half_away(x):
    return int(math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5))


def test_best_split_matches_python(spark, sf_dir):
    t = _events(sf_dir, ["event_type", "value"])
    c1, c2 = Counter(), Counter()
    for ty, v in zip(
        t.column("event_type").to_pylist(), t.column("value").to_pylist()
    ):
        if ty == "purchase":
            c1[v] += 1
        elif ty == "click":
            c2[v] += 1
    n1, n2 = sum(c1.values()), sum(c2.values())

    def ent(a, b):
        tot = a + b
        out = 0.0
        for k in (a, b):
            frac = float(k) / tot
            if frac != 0.0:
                out += -frac * math.log(frac)
        return out

    tot = n1 + n2
    parent = -(n1 / tot) * math.log(n1 / tot) - (n2 / tot) * math.log(n2 / tot)
    a1 = a2 = 0
    best = None
    for v in sorted(set(c1) | set(c2)):
        a1 += c1.get(v, 0)
        a2 += c2.get(v, 0)
        nl, nr = a1 + a2, (n1 - a1) + (n2 - a2)
        if nl == 0 or nr == 0:
            continue
        gain = parent - (nl / tot) * ent(a1, a2) - (nr / tot) * ent(
            n1 - a1, n2 - a2
        )
        key = (_round_half_away(gain * 1e9), -v)
        if best is None or key > best[0]:
            best = (key, v, a1, a2)
    from ecommerce_lakehouse_spark.queries.stats2 import best_split_infogain

    r = best_split_infogain(spark, sf_dir).collect()[0]
    assert r.split_value == best[1]
    assert r.ig_nanos == best[0][0]
    assert (r.left_purchase, r.left_click) == (best[2], best[3])
    assert (r.right_purchase, r.right_click) == (n1 - best[2], n2 - best[3])


def test_hhi_matches_python(spark, sf_dir):
    import pyarrow.parquet as _pq

    orders = _pq.read_table(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )
    cust = _pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    nat = _pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    c2n = dict(
        zip(cust.column("c_custkey").to_pylist(), cust.column("c_nationkey").to_pylist())
    )
    nk2name = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )
    cents = Counter()
    for ck, p in zip(
        orders.column("o_custkey").to_pylist(),
        orders.column("o_totalprice").to_pylist(),
    ):
        cents[nk2name[c2n[ck]]] += int(Decimal(str(p)).quantize(Decimal("0.01")) * 100)
    t = sum(cents.values())
    order = sorted(cents.items(), key=lambda kv: (-kv[1], kv[0]))
    hhi = 0.0
    for _, cts in order:
        hhi += (float(cts) / t) * (float(cts) / t)
    from ecommerce_lakehouse_spark.queries.stats2 import hhi_revenue_concentration

    r = hhi_revenue_concentration(spark, sf_dir).collect()[0]
    assert r.n_groups == len(cents)
    assert r.top_share == float(order[0][1]) / t
    assert r.hhi == hhi


def test_zipf_fit_sane(spark, sf_dir):
    """Slope is negative (frequency falls with rank), R^2 in [0,1], and
    n equals the corpus vocabulary size."""
    from ecommerce_lakehouse_spark.queries.stats2 import token_zipf_fit

    r = token_zipf_fit(spark, sf_dir).collect()[0]
    assert r.zipf_slope < 0.0
    assert 0.0 <= r.r2 <= 1.0
    assert r.n_tokens > 10


def test_pareto_skyline_matches_python(spark, sf_dir):
    t = _orders(sf_dir, ["o_custkey", "o_totalprice"])
    cents = Counter()
    cnt = Counter()
    for ck, p in zip(
        t.column("o_custkey").to_pylist(), t.column("o_totalprice").to_pylist()
    ):
        cents[ck] += int(Decimal(str(p)).quantize(Decimal("0.01")) * 100)
        cnt[ck] += 1
    pts = [(cents[c], cnt[c], c) for c in cents]
    skyline = []
    for s, k, c in pts:
        dominated = any(
            (s2 >= s and k2 >= k and (s2 > s or k2 > k)) for s2, k2, _ in pts
        )
        if not dominated:
            skyline.append((s, k, c))
    skyline.sort(key=lambda t: (-t[0], t[2]))
    from ecommerce_lakehouse_spark.queries.stats2 import pareto_customer_skyline

    got = pareto_customer_skyline(spark, sf_dir).collect()
    assert [(r.c_custkey, r.n_orders) for r in got] == [
        (c, k) for _, k, c in skyline
    ]
    for r, (s, _, _) in zip(got, skyline):
        assert r.total_spend == float(s) / 100.0


def test_constraint_suggestions_close_the_loop(spark, sf_dir, tmp_path):
    """The emitted suggestions are enforceable: feed the o_totalprice
    range suggestion into LakeTable.add_constraint and confirm a write
    violating it is refused while conforming rows commit."""
    from ecommerce_lakehouse_spark.lake.table import (
        ConstraintViolationError,
        LakeTable,
    )
    from ecommerce_lakehouse_spark.queries.quality import (
        profile_constraint_suggestions,
    )

    rows = {
        (r.column_name, r.rule): r
        for r in profile_constraint_suggestions(spark, sf_dir).collect()
    }
    assert ("o_orderkey", "unique") in rows
    assert rows[("o_orderstatus", "allowed_values")].expression.startswith("IN (")
    rng = rows[("o_totalprice", "range")]
    lo, hi = rng.expression.replace("BETWEEN ", "").split(" AND ")
    t = LakeTable(spark, str(tmp_path / "sugg"))
    t.overwrite(spark.createDataFrame([(1, float(lo))], "k int, o_totalprice double"))
    t.add_constraint("price_range", f"o_totalprice BETWEEN {lo} AND {hi}")
    import pytest as _pytest

    with _pytest.raises(ConstraintViolationError):
        t.append(
            spark.createDataFrame(
                [(2, float(hi) * 10)], "k int, o_totalprice double"
            )
        )
    t.append(spark.createDataFrame([(3, float(hi))], "k int, o_totalprice double"))
    assert t.read().count() == 2
    for r in rows.values():
        assert r.null_frac == 0.0


def test_conformal_interval_matches_python(spark, sf_dir):
    series = _monthly_revenue(sf_dir)
    ys = [y for _, y in series]
    n = len(ys)
    resid = sorted(abs(ys[t] - ys[t - 1]) for t in range(n - 12, n))
    q = resid[10]  # k = 11, 1-indexed
    from ecommerce_lakehouse_spark.queries.stats2 import conformal_forecast_interval

    r = conformal_forecast_interval(spark, sf_dir).collect()[0]
    assert r.point_forecast == ys[-1]
    assert r.q_resid == q
    assert r.lower_bound == ys[-1] - q
    assert r.upper_bound == ys[-1] + q
    assert r.n_calibration == 12
    last = series[-1][0]
    assert (r.forecast_month.year, r.forecast_month.month) == (
        last.year + (1 if last.month == 12 else 0),
        1 if last.month == 12 else last.month + 1,
    )


def test_segment_migration_matches_python(spark, sf_dir):
    from datetime import datetime as _dt

    t = _orders(sf_dir, ["o_custkey", "o_totalprice", "o_orderdate"])
    split = _dt(1996, 1, 1)
    p1, p2 = Counter(), Counter()
    for ck, p, d in zip(
        t.column("o_custkey").to_pylist(),
        t.column("o_totalprice").to_pylist(),
        t.column("o_orderdate").to_pylist(),
    ):
        cents = Decimal(str(p)).quantize(Decimal("0.01"))
        (p1 if d < split else p2)[ck] += cents

    def ntile4(spend_by_cust):
        order = sorted(spend_by_cust.items(), key=lambda kv: (-kv[1], kv[0]))
        n = len(order)
        q, rem = divmod(n, 4)
        segs = {}
        for i, (ck, _) in enumerate(order, start=1):
            if i <= rem * (q + 1):
                segs[ck] = -(-i // (q + 1))
            else:
                segs[ck] = rem + (-(-(i - rem * (q + 1)) // q))
        return segs

    s1, s2 = ntile4(p1), ntile4(p2)
    mat = Counter(
        (s1.get(ck, 0), s2.get(ck, 0)) for ck in set(s1) | set(s2)
    )
    from ecommerce_lakehouse_spark.queries.stats2 import segment_migration_matrix

    got = {
        (r.seg_before, r.seg_after): r.n_customers
        for r in segment_migration_matrix(spark, sf_dir).collect()
    }
    assert got == dict(mat)


def test_seasonal_decompose_matches_python(spark, sf_dir):
    series = _monthly_revenue(sf_dir)
    ys = [y for _, y in series]
    months = [m for m, _ in series]
    n = len(ys)
    tr = [None] * n
    for t in range(6, n - 6):
        acc = 0.5 * ys[t - 6]
        for off in range(-5, 6):
            acc += ys[t + off]
        acc += 0.5 * ys[t + 6]
        tr[t] = acc / 12.0
    sc = {}
    for mm in range(1, 13):
        s = c = 0.0
        for t in range(n):
            if months[t].month == mm and tr[t] is not None:
                s += ys[t] - tr[t]
                c += 1.0
        sc[mm] = (s, c)
    sraw = {mm: s / c for mm, (s, c) in sc.items()}
    smean = 0.0
    for mm in range(1, 13):
        smean += sc[mm][0] / sc[mm][1]
    smean /= 12.0
    from ecommerce_lakehouse_spark.queries.stats2 import seasonal_decompose_monthly

    got = {r.month: r for r in seasonal_decompose_monthly(spark, sf_dir).collect()}
    assert len(got) == n
    seas_sum = 0.0
    for t, m in enumerate(months):
        r = got[m]
        assert r.revenue == ys[t]
        assert r.trend == tr[t]
        assert r.seasonal == sraw[m.month] - smean
        if tr[t] is None:
            assert r.resid is None
        else:
            assert r.resid == (ys[t] - tr[t]) - (sraw[m.month] - smean)
    for mm in range(1, 13):
        seas_sum += sraw[mm] - smean
    assert abs(seas_sum) < 1e-6  # re-centering: seasonal sums to ~0


def test_mwu_rank_sum_identity(spark, sf_dir):
    """U1 + U2 = n1*n2 (the rank-sum identity) — recomputing U2 from the
    swapped-group rank sums must complement the query's U1 exactly."""
    t = _events(sf_dir, ["event_type", "value"])
    g1, g2 = [], []
    for ty, v in zip(
        t.column("event_type").to_pylist(), t.column("value").to_pylist()
    ):
        if ty == "purchase":
            g1.append(v)
        elif ty == "click":
            g2.append(v)
    comb = Counter(g1) + Counter(g2)
    c2 = Counter(g2)
    n1, n2 = len(g1), len(g2)
    cum = 0
    r2x2 = 0
    for v in sorted(comb):
        m = comb[v]
        cum += m
        r2x2 += c2.get(v, 0) * (2 * cum - m + 1)
    u2x2 = r2x2 - n2 * (n2 + 1)
    from ecommerce_lakehouse_spark.queries.stats2 import mann_whitney_u

    r = mann_whitney_u(spark, sf_dir).collect()[0]
    assert r.u1_x2 + u2x2 == 2 * n1 * n2


def test_ks_within_bounds_vs_mwu_direction(spark, sf_dir):
    """KS D dominates the normalized rank-shift it must explain: the
    trivial bound D >= |mean ECDF gap| holds, and both statistics are
    finite on real data."""
    from ecommerce_lakehouse_spark.queries.stats2 import (
        ks_two_sample,
        mann_whitney_u,
    )

    ks = ks_two_sample(spark, sf_dir).collect()[0]
    mwu = mann_whitney_u(spark, sf_dir).collect()[0]
    assert 0.0 < ks.ks_d <= 1.0
    assert math.isfinite(mwu.z_score)
    # U1/(n1*n2) is P(X>Y)+0.5P(X=Y); |that - 0.5| <= D (stochastic bound)
    u1 = mwu.u1_x2 / 2.0
    auc = u1 / (float(mwu.n1) * float(mwu.n2))
    assert abs(auc - 0.5) <= ks.ks_d + 1e-12


def test_runs_test_matches_python(spark, sf_dir):
    series = _monthly_revenue(sf_dir)
    ys = [y for _, y in series]
    s = [1 if ys[t] > ys[t - 1] else 0 for t in range(1, len(ys))]
    n_moves, n_up = len(s), sum(s)
    n_down = n_moves - n_up
    n_runs = 1 + sum(1 for t in range(1, len(s)) if s[t] != s[t - 1])
    nm, nu, nd = float(n_moves), float(n_up), float(n_down)
    mu = 1.0 + (2.0 * nu * nd) / nm
    var = ((2.0 * nu * nd) * (2.0 * nu * nd - nm)) / (nm * nm * (nm - 1.0))
    z = (float(n_runs) - mu) / math.sqrt(var)
    from ecommerce_lakehouse_spark.queries.stats2 import revenue_runs_test

    r = revenue_runs_test(spark, sf_dir).collect()[0]
    assert (r.n_moves, r.n_up, r.n_down, r.n_runs) == (
        n_moves,
        n_up,
        n_down,
        n_runs,
    )
    assert r.z_score == z


def test_abc_matches_python(spark, sf_dir):
    import pyarrow.parquet as _pq

    t = _pq.read_table(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice"],
    )
    cents = Counter()
    for pk, p in zip(
        t.column("l_partkey").to_pylist(), t.column("l_extendedprice").to_pylist()
    ):
        cents[pk] += int(Decimal(str(p)).quantize(Decimal("0.01")) * 100)
    tot = sum(cents.values())
    order = sorted(cents.items(), key=lambda kv: (-kv[1], kv[0]))
    cum = 0
    agg = {}
    for pk, c in order:
        cum += c
        cls = "A" if cum * 100 <= tot * 80 else ("B" if cum * 100 <= tot * 95 else "C")
        n, s = agg.get(cls, (0, 0))
        agg[cls] = (n + 1, s + c)
    from ecommerce_lakehouse_spark.queries.stats2 import abc_part_classification

    got = {r.abc_class: r for r in abc_part_classification(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for cls, (n, s) in agg.items():
        r = got[cls]
        assert r.n_parts == n
        assert r.revenue_share == float(s) / float(tot)


def test_mann_kendall_matches_python(spark, sf_dir):
    t = _orders(sf_dir, ["o_orderdate", "o_totalprice"])
    by_month = {}
    for d, p in zip(
        t.column("o_orderdate").to_pylist(), t.column("o_totalprice").to_pylist()
    ):
        key = d.date().replace(day=1)
        by_month[key] = by_month.get(key, 0) + int(
            Decimal(str(p)).quantize(Decimal("0.01")) * 100
        )
    cents = [c for _, c in sorted(by_month.items())]
    n = len(cents)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += (cents[j] > cents[i]) - (cents[j] < cents[i])
    tie = sum(
        t_ * (t_ - 1) * (2 * t_ + 5) for t_ in Counter(cents).values()
    )
    var_s = (float(n) * float(n - 1) * float(2 * n + 5) - float(tie)) / 18.0
    if s > 0:
        z = (float(s) - 1.0) / math.sqrt(var_s)
    elif s < 0:
        z = (float(s) + 1.0) / math.sqrt(var_s)
    else:
        z = 0.0
    from ecommerce_lakehouse_spark.queries.stats2 import mann_kendall_trend

    r = mann_kendall_trend(spark, sf_dir).collect()[0]
    assert (r.n_months, r.s_stat) == (n, s)
    assert r.z_score == z


def test_intermittency_matches_python(spark, sf_dir):
    import pyarrow.parquet as _pq
    from collections import defaultdict as _dd

    ot = _pq.read_table(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderdate"]
    )
    o2m = {
        k: d.date().replace(day=1)
        for k, d in zip(
            ot.column("o_orderkey").to_pylist(), ot.column("o_orderdate").to_pylist()
        )
    }
    big_m = len(set(o2m.values()))
    lt = _pq.read_table(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_quantity"],
    )
    pm = _dd(int)
    for ok, pk, q in zip(
        lt.column("l_orderkey").to_pylist(),
        lt.column("l_partkey").to_pylist(),
        lt.column("l_quantity").to_pylist(),
    ):
        pm[(pk, o2m[ok])] += int(q)
    per = _dd(lambda: [0, 0, 0])
    for (pk, _m), q in pm.items():
        st = per[pk]
        st[0] += 1
        st[1] += q
        st[2] += q * q
    agg = {}
    for pk, (a, sq, sq2) in per.items():
        low_adi = big_m * 100 <= a * 132
        smooth_cv = (a * sq2 - sq * sq) * 100 <= sq * sq * 49
        cls = (
            "smooth"
            if low_adi and smooth_cv
            else "erratic"
            if low_adi
            else "intermittent"
            if smooth_cv
            else "lumpy"
        )
        n, ta, td = agg.get(cls, (0, 0, 0))
        agg[cls] = (n + 1, ta + a, td + sq)
    from ecommerce_lakehouse_spark.queries.stats2 import part_demand_intermittency

    got = {
        r.demand_class: (r.n_parts, r.total_active_months, r.total_demand)
        for r in part_demand_intermittency(spark, sf_dir).collect()
    }
    assert got == agg
