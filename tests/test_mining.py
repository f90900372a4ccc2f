"""Behavioral tests for queries/mining.py (wave-3 mining operators):
formula consistency, structural invariants, convergence, and agreement
with an independent numpy implementation where one exists."""

import math

import pyspark.sql.functions as F

from ecommerce_lakehouse_spark.queries.mining import (
    _KC_K,
    _PMI_MIN_COUNT,
    _SH_MAXDIST,
    _RP_NBUCKETS,
    ar2_yule_walker_forecast,
    kcore_peeling_profile,
    pmi_collocations,
    random_projection_distortion,
    readability_profile,
    simhash_hamming_pairs,
)


def test_pmi_rows_respect_floor_and_log_consistency(spark, sf_dir):
    rows = pmi_collocations(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.n_pair >= _PMI_MIN_COUNT
        assert r.n_w1 >= r.n_pair and r.n_w2 >= r.n_pair
        # pmi_nanos is log2(lift) rounded once into nanos
        assert abs(r.pmi_nanos - round(math.log2(r.lift) * 1e9)) <= 1
    # ranked by lift descending
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_readability_formula_reconstructs_from_integer_counts(spark, sf_dir):
    rows = readability_profile(spark, sf_dir).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r.n_docs > 0 and r.n_words > 0 and r.n_sentences > 0
        wps = r.n_words / r.n_sentences
        spw = r.n_syllables / r.n_words
        assert math.isclose(r.words_per_sentence, wps, rel_tol=1e-12)
        assert math.isclose(
            r.flesch_reading_ease,
            206.835 - 1.015 * wps - 84.6 * spw,
            rel_tol=1e-12,
        )


def test_simhash_pairs_within_radius_and_signature_consistent(spark, sf_dir):
    from ecommerce_lakehouse_spark.queries.llm2 import simhash_signatures

    pairs = simhash_hamming_pairs(spark, sf_dir)
    rows = pairs.collect()
    assert len(rows) > 0
    assert all(0 <= r.hamming_dist <= _SH_MAXDIST for r in rows)
    assert all(r.doc_a < r.doc_b for r in rows)
    # recompute the reported distance from the registered signature query
    sig = {
        r.doc_id: r.simhash for r in simhash_signatures(spark, sf_dir).collect()
    }
    for r in rows[:20]:
        got = bin(sig[r.doc_a] ^ sig[r.doc_b]).count("1")
        assert got == r.hamming_dist


def test_kcore_profile_monotone_and_converges(spark, sf_dir):
    rows = sorted(
        kcore_peeling_profile(spark, sf_dir).collect(), key=lambda r: r.round
    )
    assert rows[0].round == 0 and rows[0].n_removed == 0
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_nodes <= prev.n_nodes  # peeling only shrinks
        assert cur.n_edges <= prev.n_edges
        assert cur.n_removed == prev.n_nodes - cur.n_nodes
    # the fixed budget must reach the fixpoint plateau on test data
    assert rows[-1].n_nodes == rows[-2].n_nodes
    assert rows[-1].n_edges == rows[-2].n_edges


def test_kcore_budget_covers_worst_sf(spark):
    """sf0.01 is the measured worst case (fixpoint at 11 rounds) — the
    12-round budget must plateau there too."""
    rows = sorted(
        kcore_peeling_profile(spark, "/root/testdata/sf0.01").collect(),
        key=lambda r: r.round,
    )
    assert rows[-1].n_nodes == rows[-2].n_nodes
    # and the 3-core found is a real core: nonempty at this SF
    assert rows[-1].n_nodes > 0
    # every survivor supports >= K induced edges on average
    assert rows[-1].n_edges * 2 >= rows[-1].n_nodes * _KC_K


def test_ar2_matches_independent_numpy_fit(spark, sf_dir):
    import numpy as np

    m = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("rev")
        )
        .orderBy("m")
        .collect()
    )
    x = np.array([r.rev for r in m])
    mu = x.mean()
    c = x - mu
    g0 = float((c * c).sum())
    r1 = float((c[:-1] * c[1:]).sum()) / g0
    r2 = float((c[:-2] * c[2:]).sum()) / g0
    phi1 = r1 * (1 - r2) / (1 - r1 * r1)
    phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
    rows = sorted(
        ar2_yule_walker_forecast(spark, sf_dir).collect(), key=lambda r: r.h
    )
    assert len(rows) == 6
    got = rows[0]
    assert math.isclose(got.r1, r1, rel_tol=1e-9)
    assert math.isclose(got.r2, r2, rel_tol=1e-9)
    assert math.isclose(got.phi1, phi1, rel_tol=1e-9)
    assert math.isclose(got.phi2, phi2, rel_tol=1e-9)
    # recursive forecast agrees
    prev2, prev1 = x[-2], x[-1]
    for r in rows:
        f = mu + phi1 * (prev1 - mu) + phi2 * (prev2 - mu)
        assert math.isclose(r.forecast, f, rel_tol=1e-9)
        prev2, prev1 = prev1, f


def test_random_projection_distortion_concentrates(spark, sf_dir):
    rows = sorted(
        random_projection_distortion(spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    n_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    total = sum(r.n_pairs for r in rows)
    assert total == 10 * (n_emb - 1)  # every query-corpus pair audited
    for r in rows:
        assert 0 <= r.bucket < _RP_NBUCKETS
        assert r.min_ratio <= r.max_ratio
        if r.bucket < _RP_NBUCKETS - 1:  # unclamped bucket bounds hold
            assert r.bucket / 10 <= r.min_ratio
            assert r.max_ratio < (r.bucket + 1) / 10
    # the JL claim: distortion mass concentrates around ratio 1.0
    mid = sum(r.n_pairs for r in rows if 6 <= r.bucket <= 13)
    assert mid / total >= 0.6
    # determinism: the hash-derived sign matrix is reproducible
    again = sorted(
        random_projection_distortion(spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    assert [(r.bucket, r.n_pairs) for r in rows] == [
        (r.bucket, r.n_pairs) for r in again
    ]


def test_dbscan_roles_and_cluster_keys(spark, sf_dir):
    from ecommerce_lakehouse_spark.queries.mining import (
        _DB_MINPTS,
        dbscan_customer_segments,
    )

    rows = dbscan_customer_segments(spark, sf_dir).collect()
    assert len(rows) > 0
    by_cell = {(r.cx, r.cy): r for r in rows}
    n_cust = sum(r.n_customers for r in rows)
    # every customer lands in exactly one cell
    assert (
        n_cust
        == spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    )
    roles = {r.role for r in rows}
    assert roles <= {"core", "border", "noise"}
    for r in rows:
        if r.role == "core":
            assert r.n_neighbors >= _DB_MINPTS
            assert r.cluster_key is not None
        elif r.role == "noise":
            assert r.n_neighbors < _DB_MINPTS
            assert r.cluster_key is None
        else:  # border: sub-threshold but adjacent to a core cell
            assert r.n_neighbors < _DB_MINPTS
            assert r.cluster_key is not None
            adj_core = [
                by_cell[(r.cx + dx, r.cy + dy)]
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                if (r.cx + dx, r.cy + dy) in by_cell
                and by_cell[(r.cx + dx, r.cy + dy)].role == "core"
            ]
            assert adj_core
            assert r.cluster_key == min(c.cluster_key for c in adj_core)
    # adjacent core cells share a cluster (the DBSCAN connectivity law)
    for r in rows:
        if r.role != "core":
            continue
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = by_cell.get((r.cx + dx, r.cy + dy))
                if nb is not None and nb.role == "core":
                    assert nb.cluster_key == r.cluster_key


def test_markov_accuracy_matches_pure_python_recount(spark, sf_dir):
    """Full independent recount: rebuild the split, the train argmax,
    and the held-out accuracy in plain Python from the parquet rows.
    (No signal assertion — the synthetic event stream is near-uniform,
    so argmax accuracy ~ chance; the query's job is to MEASURE that.)"""
    import hashlib
    from collections import Counter, defaultdict

    from ecommerce_lakehouse_spark.queries.mining import (
        _MK_TRAIN_PCT,
        markov_prediction_accuracy,
    )

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    train_pairs, test_pairs = Counter(), []
    for uid, rs in by_user.items():
        is_train = (
            int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % 100
            < _MK_TRAIN_PCT
        )
        rs.sort(key=lambda r: (r.ts, r.event_id))
        for a, b in zip(rs, rs[1:]):
            if is_train:
                train_pairs[(a.event_type, b.event_type)] += 1
            else:
                test_pairs.append((a.event_type, b.event_type))
    pred = {}
    for (f, t), n in train_pairs.items():
        cur = pred.get(f)
        if cur is None or (-n, t) < cur:
            pred[f] = (-n, t)
    pred = {f: t for f, (_, t) in pred.items()}
    want = defaultdict(lambda: [0, 0])
    for f, t in test_pairs:
        if f in pred:
            want[f][0] += 1
            want[f][1] += int(pred[f] == t)
    rows = markov_prediction_accuracy(spark, sf_dir).collect()
    got = {r.from_type: (r.predicted_type, r.n_test, r.n_correct) for r in rows}
    assert set(got) == set(want)
    for f, (n_test, n_correct) in want.items():
        assert got[f] == (pred[f], n_test, n_correct)


def test_frequent_triples_respect_apriori_bound(spark, sf_dir):
    from ecommerce_lakehouse_spark.queries.mining import (
        frequent_triple_itemsets,
    )

    from collections import Counter
    from itertools import combinations

    rows = frequent_triple_itemsets(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.x < r.y < r.z  # canonical ordering
        # the Apriori monotonicity law: a triple's support never exceeds
        # the support of any of its pairs
        assert r.n_orders <= r.min_pair_support
    # independent recount: the selected 20 ARE the global top-20
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    baskets = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    tri = Counter()
    for parts in baskets.values():
        for c in combinations(sorted(parts), 3):
            tri[c] += 1
    want = sorted(tri.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = sorted(((r.x, r.y, r.z), r.n_orders) for r in rows)
    assert got == sorted(want)


def test_isotonic_calibration_is_monotone_and_mass_preserving(spark, sf_dir):
    from ecommerce_lakehouse_spark.queries.llm10 import (
        classifier_calibration_curve,
    )
    from ecommerce_lakehouse_spark.queries.mining import isotonic_calibration

    blocks = sorted(
        isotonic_calibration(spark, sf_dir).collect(),
        key=lambda r: r.bucket_start,
    )
    curve = classifier_calibration_curve(spark, sf_dir).collect()
    # mass preservation: blocks partition the curve's docs and passes
    assert sum(b.n_docs for b in blocks) == sum(c.n_docs for c in curve)
    assert sum(b.n_pass for b in blocks) == sum(c.n_pass for c in curve)
    # block intervals are disjoint and ordered
    for a, b in zip(blocks, blocks[1:]):
        assert a.bucket_end < b.bucket_start
    # the PAVA postcondition: pooled rates are non-decreasing in score
    for a, b in zip(blocks, blocks[1:]):
        # exact cross-multiplied comparison, same as the query's test
        assert a.n_pass * b.n_docs <= b.n_pass * a.n_docs
    for b in blocks:
        assert math.isclose(b.iso_rate, b.n_pass / b.n_docs)
    # PAVA only merges where the raw curve violated monotonicity:
    # a multi-bucket block must contain at least one raw violation
    raw = {c.score_bucket: (c.n_docs, c.n_pass) for c in curve}
    for b in blocks:
        members = sorted(k for k in raw if b.bucket_start <= k <= b.bucket_end)
        if len(members) > 1:
            viol = any(
                raw[x][1] * raw[y][0] > raw[y][1] * raw[x][0]
                for x, y in zip(members, members[1:])
            )
            assert viol


def test_binary_segmentation_matches_recount(spark, sf_dir):
    from ecommerce_lakehouse_spark.queries.mining import (
        binary_segmentation_changepoints,
    )

    daily = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
        .orderBy("day")
        .collect()
    )
    days = [r.day for r in daily]
    cents = [r.cents for r in daily]

    def argmax_cusum(ds, cs):
        n, t = len(cs), sum(cs)
        mu = t / n
        best = None
        cum = 0
        for i, (dy, c) in enumerate(zip(ds, cs), start=1):
            cum += c
            cval = (float(cum) - float(i) * mu) / 100.0
            key = (-abs(cval), dy)
            if best is None or key < best[0]:
                best = (key, dy, cval, n, (t / n) / 100.0)
        return best[1:]

    rows = {r.segment: r for r in binary_segmentation_changepoints(spark, sf_dir).collect()}
    f_day, f_cusum, f_n, f_mean = argmax_cusum(days, cents)
    assert rows["full"].changepoint_day == f_day
    assert math.isclose(rows["full"].cusum_at_peak, f_cusum, rel_tol=1e-12)
    assert rows["full"].n_days == f_n
    cut = days.index(f_day)
    for seg, (ds, cs) in {
        "left": (days[: cut + 1], cents[: cut + 1]),
        "right": (days[cut + 1 :], cents[cut + 1 :]),
    }.items():
        if not ds:
            assert seg not in rows
            continue
        d2, c2, n2, m2 = argmax_cusum(ds, cs)
        assert rows[seg].changepoint_day == d2
        assert math.isclose(rows[seg].cusum_at_peak, c2, rel_tol=1e-12)
        assert rows[seg].n_days == n2
        assert math.isclose(rows[seg].seg_mean_daily, m2, rel_tol=1e-12)


def test_qte_deciles_match_python_selection(spark, sf_dir):
    import hashlib

    from ecommerce_lakehouse_spark.queries.mining import (
        quantile_treatment_effects,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_totalprice"
    )
    spend = {r.c_custkey: 0 for r in cust.collect()}
    for r in orders.collect():
        spend[r.o_custkey] = spend.get(r.o_custkey, 0) + round(
            r.o_totalprice * 100
        )
    groups = {0: [], 1: []}
    for k, v in spend.items():
        g = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 2
        groups[g].append((v, k))
    for g in groups:
        groups[g].sort()
    rows = sorted(
        quantile_treatment_effects(spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 10))
    for r in rows:
        for g, qcol, ncol in [
            (1, r.q_treatment, r.n_treatment),
            (0, r.q_control, r.n_control),
        ]:
            n = len(groups[g])
            assert ncol == n
            want = groups[g][(r.decile * n + 9) // 10 - 1][0] / 100.0
            assert math.isclose(qcol, want, rel_tol=1e-12)
        assert math.isclose(r.qte, r.q_treatment - r.q_control, abs_tol=1e-9)
    # monotone deciles within each group
    for col in ("q_treatment", "q_control"):
        vals = [getattr(r, col) for r in rows]
        assert vals == sorted(vals)


def test_haar_energy_matches_numpy_and_conserves(spark, sf_dir):
    import numpy as np

    from ecommerce_lakehouse_spark.queries.mining import (
        _HW_LEVELS,
        haar_wavelet_energy,
    )

    daily = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
        .orderBy("d")
        .collect()
    )
    a = np.zeros(2 ** _HW_LEVELS)
    a[: len(daily)] = [r.cents for r in daily]
    rows = sorted(
        haar_wavelet_energy(spark, sf_dir).collect(), key=lambda r: r.level
    )
    assert len(rows) == _HW_LEVELS
    total_detail = 0.0
    cur = a
    for r in rows:
        approx = cur[0::2] + cur[1::2]
        detail = cur[0::2] - cur[1::2]
        assert r.n_coeffs == len(detail)
        want = float((detail * detail).sum()) / (2 ** r.level)
        assert math.isclose(r.detail_energy, want, rel_tol=1e-9)
        total_detail += r.detail_energy
        cur = approx
    # Parseval: total detail energy + final approx energy = input energy
    final_approx_energy = float((cur * cur).sum()) / (2 ** _HW_LEVELS)
    input_energy = float((a * a).sum())
    assert math.isclose(
        total_detail + final_approx_energy, input_energy, rel_tol=1e-9
    )


def test_event_path_trigrams_match_recount(spark, sf_dir):
    from collections import Counter, defaultdict

    from ecommerce_lakehouse_spark.queries.mining import event_path_trigrams

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    paths = Counter()
    for rs in by_user.values():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        for a, b, c in zip(rs, rs[1:], rs[2:]):
            paths[(a.event_type, b.event_type, c.event_type)] += 1
    total = sum(paths.values())
    want = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = event_path_trigrams(spark, sf_dir).collect()
    got = [((r.e1, r.e2, r.e3), r.n_paths) for r in rows]
    assert sorted(got) == sorted(want)
    for r in rows:
        assert math.isclose(r.path_share, paths[(r.e1, r.e2, r.e3)] / total)


def test_chao1_matches_python_fof_recount(spark, sf_dir):
    import re
    from collections import Counter

    from ecommerce_lakehouse_spark.queries.mining import vocab_chao1_estimate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text").collect()
    c = Counter()
    for r in docs:
        for w in re.sub(r"[^a-z]+", " ", r.text.lower()).split():
            c[w] += 1
    v = len(c)
    n = sum(c.values())
    f1 = sum(1 for x in c.values() if x == 1)
    f2 = sum(1 for x in c.values() if x == 2)
    row = vocab_chao1_estimate(spark, sf_dir).collect()[0]
    assert (row.n_tokens, row.vocab_observed, row.f1, row.f2) == (n, v, f1, f2)
    assert math.isclose(
        row.chao1_estimate, v + f1 * (f1 - 1) / (2 * (f2 + 1)), rel_tol=1e-12
    )
    assert math.isclose(row.good_turing_coverage, 1 - f1 / n, rel_tol=1e-12)
    # the estimator's lower-bound property: chao1 >= observed vocabulary
    assert row.chao1_estimate >= v


def test_hurst_matches_numpy_rs_analysis(spark, sf_dir):
    import numpy as np

    from ecommerce_lakehouse_spark.queries.mining import (
        _HU_WINDOWS,
        hurst_rs_exponent,
    )

    daily = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 0)
            .cast("long")
            .alias("v")
        )
        .orderBy("d")
        .collect()
    )
    x = np.array([r.v for r in daily], dtype=np.float64)
    rows = sorted(
        hurst_rs_exponent(spark, sf_dir).collect(), key=lambda r: r.window_w
    )
    assert [r.window_w for r in rows] == _HU_WINDOWS
    ys = []
    for r in rows:
        w = r.window_w
        nb = len(x) // w
        assert r.n_blocks == nb
        rss = []
        for b in range(nb):
            blk = x[b * w : (b + 1) * w]
            z = np.cumsum(blk - blk.mean())
            rng = z.max() - z.min()
            s = blk.std()  # population std, ddof=0
            rss.append(rng / s)
        want = float(np.mean(rss))
        assert math.isclose(r.rs_mean, want, rel_tol=1e-9)
        assert abs(r.log2_rs_nanos - round(math.log2(r.rs_mean) * 1e9)) <= 1
        ys.append(r.log2_rs_nanos / 1e9)
    # the slope column matches an OLS fit over (log2 w, log2 RS)
    xs = np.array([math.log2(w) for w in _HU_WINDOWS])
    slope = float(
        ((xs - xs.mean()) * (np.array(ys))).sum() / ((xs - xs.mean()) ** 2).sum()
    )
    for r in rows:
        assert math.isclose(r.hurst, slope, rel_tol=1e-9)
    # an aggregated revenue series is noisy-stationary: H in a sane band
    assert 0.1 < rows[0].hurst < 1.0
