"""Experimentation wave (experiment.py) against independent Python
recomputations — exact equality per the determinism contract."""

import pytest
import hashlib
import math
import os
from collections import Counter, defaultdict
from datetime import datetime
from decimal import Decimal

import pyarrow.parquet as pq


def _events(sf_dir, cols):
    return pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=cols)


def _arm(uid):
    h = hashlib.md5(f"cuped|{uid}".encode()).hexdigest()[:8]
    return "A" if int(h, 16) % 2 == 0 else "B"


@pytest.mark.slow  # demoted r10 (VERDICT r09 #4): oracle/property coverage kept in the release gate
def test_cuped_matches_python(spark, sf_dir):
    t = _events(sf_dir, ["user_id", "ts", "value"])
    split = datetime(2024, 1, 16)
    xs = defaultdict(int)
    ys = defaultdict(int)
    for u, ts, v in zip(
        t.column("user_id").to_pylist(),
        t.column("ts").to_pylist(),
        t.column("value").to_pylist(),
    ):
        cents = int(Decimal(str(v)) * 100)
        if ts < split:
            xs[u] += cents
        else:
            ys[u] += cents
        xs.setdefault(u, 0)
        ys.setdefault(u, 0)
    users = sorted(set(xs) | set(ys))
    n = len(users)
    x = {u: xs.get(u, 0) for u in users}
    y = {u: ys.get(u, 0) for u in users}
    sx = float(sum(x.values()))
    sy = float(sum(y.values()))
    sxx = float(sum(v * v for v in x.values()))
    syy = float(sum(v * v for v in y.values()))
    sxy = float(sum(x[u] * y[u] for u in users))
    arms = {u: _arm(u) for u in users}
    na = float(sum(1 for u in users if arms[u] == "A"))
    nb = float(n - na)
    sxa = float(sum(x[u] for u in users if arms[u] == "A"))
    sxb = float(sum(x[u] for u in users if arms[u] == "B"))
    sya = float(sum(y[u] for u in users if arms[u] == "A"))
    syb = float(sum(y[u] for u in users if arms[u] == "B"))
    nd = float(n)
    theta = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    rho2 = ((nd * sxy - sx * sy) * (nd * sxy - sx * sy)) / (
        (nd * sxx - sx * sx) * (nd * syy - sy * sy)
    )
    raw = (syb / nb - sya / na) / 100.0
    cuped = ((syb / nb - sya / na) - theta * (sxb / nb - sxa / na)) / 100.0
    from ecommerce_lakehouse_spark.queries.experiment import cuped_adjusted_lift

    r = cuped_adjusted_lift(spark, sf_dir).collect()[0]
    assert r.n_users == n
    assert r.theta == theta
    assert r.raw_lift == raw
    assert r.cuped_lift == cuped
    assert r.var_reduction == rho2


def test_overdispersion_matches_python(spark, sf_dir):
    t = _events(sf_dir, ["user_id", "event_type"])
    users = set(t.column("user_id").to_pylist())
    per = Counter(
        zip(t.column("event_type").to_pylist(), t.column("user_id").to_pylist())
    )
    by_type = defaultdict(list)
    for (ty, _u), k in per.items():
        by_type[ty].append(k)
    from ecommerce_lakehouse_spark.queries.experiment import event_overdispersion

    got = {r.event_type: r for r in event_overdispersion(spark, sf_dir).collect()}
    assert set(got) == set(by_type)
    u = len(users)
    for ty, ks in by_type.items():
        sk, sk2 = sum(ks), sum(k * k for k in ks)
        mean = float(sk) / float(u)
        var = (float(sk2) - (float(sk) * float(sk)) / float(u)) / float(u)
        r = got[ty]
        assert (r.n_users, r.n_active, r.total_events) == (u, len(ks), sk)
        assert r.mean_per_user == mean
        assert r.dispersion_index == var / mean


def test_did_cells_consistent(spark, sf_dir):
    """The four cell counts partition the joined order set, and the DiD
    estimate equals the closed form of the four means."""
    from ecommerce_lakehouse_spark.queries.experiment import did_revenue_effect

    r = did_revenue_effect(spark, sf_dir).collect()[0]
    t = pq.read_table(os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey"])
    assert r.n_t_pre + r.n_t_post + r.n_c_pre + r.n_c_post == t.num_rows
    assert r.did_estimate == (r.t_post - r.t_pre) - (r.c_post - r.c_pre)
    assert not math.isnan(r.did_estimate)


def test_psi_matches_python(spark, sf_dir):
    t = _events(sf_dir, ["ts", "value"])
    split = datetime(2024, 1, 16)
    c1, c2 = Counter(), Counter()
    for ts, v in zip(t.column("ts").to_pylist(), t.column("value").to_pylist()):
        b = min(9, int(v // 50.0))
        (c1 if ts < split else c2)[b] += 1
    bins = sorted(set(c1) | set(c2))
    n1, n2, k = sum(c1.values()), sum(c2.values()), len(bins)
    terms = {}
    for b in bins:
        p = float(c1.get(b, 0) + 1) / float(n1 + k)
        q = float(c2.get(b, 0) + 1) / float(n2 + k)
        x = (p - q) * math.log(p / q) * 1e9
        terms[b] = int(math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5))
    total = float(sum(terms.values())) / 1e9
    from ecommerce_lakehouse_spark.queries.experiment import psi_value_drift

    got = psi_value_drift(spark, sf_dir).collect()
    assert [r.bin for r in got] == bins
    for r in got:
        assert (r.n1_bin, r.n2_bin, r.term_nanos) == (
            c1.get(r.bin, 0),
            c2.get(r.bin, 0),
            terms[r.bin],
        )
        assert r.psi_total == total


def test_cohort_ltv_matches_python(spark, sf_dir):
    t = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice", "o_orderdate"],
    )
    firsts = {}
    rows = list(
        zip(
            t.column("o_custkey").to_pylist(),
            t.column("o_totalprice").to_pylist(),
            t.column("o_orderdate").to_pylist(),
        )
    )
    for ck, _p, d in rows:
        m = d.date().replace(day=1)
        if ck not in firsts or m < firsts[ck]:
            firsts[ck] = m
    size = Counter(firsts.values())
    rev = defaultdict(Decimal)
    for ck, p, d in rows:
        m = d.date().replace(day=1)
        c = firsts[ck]
        age = (m.year - c.year) * 12 + (m.month - c.month)
        rev[(c, age)] += Decimal(str(p)).quantize(Decimal("0.01"))
    expect = {}
    for c in size:
        cum = Decimal(0)
        for age in sorted(a for (cc, a) in rev if cc == c):
            cum += rev[(c, age)]
            if age <= 11:
                expect[(c, age)] = float(cum)
    from ecommerce_lakehouse_spark.queries.experiment import cohort_ltv_curve

    got = cohort_ltv_curve(spark, sf_dir).collect()
    assert len(got) == len(expect)
    for r in got:
        assert r.cum_revenue == expect[(r.cohort, r.age)]
        assert r.cohort_size == size[r.cohort]
        assert r.ltv_per_customer == r.cum_revenue / r.cohort_size
