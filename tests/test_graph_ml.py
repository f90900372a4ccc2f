"""Graph-ML wave (graph_ml.py) against independent Python
recomputations on the same relative-support co-purchase graph (threshold max(2, ceil(2n/150000)) baskets)."""

import math
import os
from collections import Counter, defaultdict

import pyarrow.parquet as pq


def _graph(sf_dir):
    """Support>=2 co-purchase graph: canonical s<d edge set + adjacency."""
    t = pq.read_table(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    )
    per_order = defaultdict(set)
    for o, p in zip(
        t.column("l_orderkey").to_pylist(), t.column("l_partkey").to_pylist()
    ):
        per_order[o].add(p)
    support = Counter()
    for parts in per_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                support[(a, b)] += 1
    edges = {pair for pair, c in support.items() if c >= 2}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    return edges, adj


def test_adamic_adar_matches_python(spark, sf_dir):
    edges, adj = _graph(sf_dir)
    scores = Counter()
    common = Counter()
    for z, nbrs in adj.items():
        if len(nbrs) < 2:
            continue
        wz = int(round(1000000000.0 / math.log(float(len(nbrs)))))
        ns = sorted(nbrs)
        for i, u in enumerate(ns):
            for v in ns[i + 1 :]:
                scores[(u, v)] += wz
                common[(u, v)] += 1
    cand = [
        (s, (u, v), common[(u, v)])
        for (u, v), s in scores.items()
        if (u, v) not in edges
    ]
    cand.sort(key=lambda t: (-t[0], t[1]))
    from ecommerce_lakehouse_spark.queries.graph_ml import adamic_adar_links

    got = adamic_adar_links(spark, sf_dir).collect()
    assert len(got) == min(20, len(cand))
    for row, (s, (u, v), nc) in zip(got, cand[:20]):
        assert (row.part_a, row.part_b, row.aa_nanos, row.n_common) == (u, v, s, nc)


def test_label_propagation_matches_python(spark, sf_dir):
    _, adj = _graph(sf_dir)
    labels = {n: n for n in adj}
    for _ in range(4):
        new = {}
        for node, nbrs in adj.items():
            votes = Counter(labels[n] for n in nbrs)
            # argmax count, tiebreak min label
            new[node] = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        labels = new
    comm = defaultdict(list)
    for n, lbl in labels.items():
        comm[lbl].append(n)
    expect = sorted(
        ((lbl, len(ms), min(ms), max(ms)) for lbl, ms in comm.items()),
        key=lambda t: (-t[1], t[0]),
    )
    from ecommerce_lakehouse_spark.queries.graph_ml import (
        label_propagation_communities,
    )

    got = [
        (r.community, r.n_members, r.min_member, r.max_member)
        for r in label_propagation_communities(spark, sf_dir).collect()
    ]
    assert got == expect


def test_adamic_adar_excludes_existing_edges(spark, sf_dir):
    edges, _ = _graph(sf_dir)
    from ecommerce_lakehouse_spark.queries.graph_ml import adamic_adar_links

    for r in adamic_adar_links(spark, sf_dir).collect():
        assert (r.part_a, r.part_b) not in edges
        assert r.part_a < r.part_b
        assert r.n_common >= 1


def test_degree_profile_matches_python(spark, sf_dir):
    _, adj = _graph(sf_dir)
    degs = {z: len(nbrs) for z, nbrs in adj.items()}
    hist = Counter(degs.values())
    lsum = 0
    ntail = 0
    for d in degs.values():
        if d >= 2:
            x = math.log(float(d) / 2.0) * 1e9
            lsum += int(math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5))
            ntail += 1
    alpha = (
        1.0 + float(ntail) / (float(lsum) / 1e9) if lsum > 0 else None
    )
    from ecommerce_lakehouse_spark.queries.graph_ml import copurchase_degree_profile

    got = copurchase_degree_profile(spark, sf_dir).collect()
    assert {(r.degree, r.n_nodes) for r in got} == set(hist.items())
    for r in got:
        assert r.total_nodes == len(degs)
        assert r.powerlaw_alpha == alpha
