"""Deterministic random-walk corpus: validity, termination, stability."""

from __future__ import annotations

import random

from engine.operators.walks import random_walks


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, schema="src long, dst long")


def _graph(n=40, m=120, seed=3):
    rng = random.Random(seed)
    return list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})


def test_walks_are_valid_paths(spark):
    edges = _graph()
    eset = {(u, v) for u, v in edges if u != v}
    rows = random_walks(_edges_df(spark, edges), 4, num_walks=2, salt="s").collect()
    byw = {}
    for r in rows:
        byw.setdefault(r.walk_id, {})[r.step] = r.node
    nodes = {u for e in eset for u in e}
    assert len(byw) == 2 * len(nodes)  # every vertex starts num_walks walks
    for wid, steps in byw.items():
        assert steps[0] == wid // 2  # walk_id encodes the start vertex
        ks = sorted(steps)
        assert ks == list(range(len(ks)))  # contiguous steps (stop, no gaps)
        for k in ks[1:]:
            assert (steps[k - 1], steps[k]) in eset  # every hop is an edge


def test_walks_terminate_at_dangling(spark):
    # chain 0->1->2: from 0 the unique walk is 0,1,2 then stops (2 dangling)
    rows = random_walks(_edges_df(spark, [(0, 1), (1, 2)]), 5).collect()
    w0 = sorted((r.step, r.node) for r in rows if r.walk_id == 0)
    assert w0 == [(0, 0), (1, 1), (2, 2)]
    assert sorted((r.step, r.node) for r in rows if r.walk_id == 2) == [(0, 2)]


def test_walks_stable_under_repartition_and_salted(spark):
    edges = _graph(seed=9)
    df = _edges_df(spark, edges)
    a = {(r.walk_id, r.step): r.node for r in random_walks(df, 3, salt="x").collect()}
    b = {
        (r.walk_id, r.step): r.node
        for r in random_walks(df.repartition(7), 3, salt="x").collect()
    }
    assert a == b  # corpus depends only on (graph, salt), never layout
    c = {(r.walk_id, r.step): r.node for r in random_walks(df, 3, salt="y").collect()}
    assert a != c  # a different salt draws a different corpus
