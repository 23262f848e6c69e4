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


# ---------------------------------------------------------------------------
# node2vec biased walks
# ---------------------------------------------------------------------------

def _n2v_py(edges, L, wr, wi, wo, num_walks=1, salt=""):
    """Exact replay of node2vec_walks' integer-weighted md5 draws."""
    import hashlib

    adj: dict[int, set] = {}
    for u, v in edges:
        if u != v:
            adj.setdefault(u, set()).add(v)
    adjs = {u: sorted(vs) for u, vs in adj.items()}
    nodes = sorted({x for e in edges for x in e})

    def h(cur, step, wid):
        s = f"{cur}|{step}|{wid}|{salt}"
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    out = {}
    for n in nodes:
        for rep in range(num_walks):
            wid = n * num_walks + rep
            walk = [n]
            if n in adjs and L >= 1:
                walk.append(adjs[n][h(n, 1, wid) % len(adjs[n])])
            for step in range(2, L + 1):
                if len(walk) != step:
                    break
                prev, cur = walk[-2], walk[-1]
                if cur not in adjs:
                    break
                cands = adjs[cur]
                ws = [
                    wr
                    if x == prev
                    else (wi if x in adj.get(prev, set()) else wo)
                    for x in cands
                ]
                tw = sum(ws)
                if tw == 0:
                    break
                d = h(cur, step, wid) % tw
                acc = 0
                for x, w in zip(cands, ws):
                    acc += w
                    if d < acc:
                        walk.append(x)
                        break
            out[wid] = walk
    return out


def test_node2vec_vs_python_replay(spark):
    from engine.operators.walks import node2vec_walks

    edges = _graph(n=30, m=120, seed=21)
    rows = node2vec_walks(
        _edges_df(spark, edges),
        4,
        return_weight=4,
        in_weight=2,
        out_weight=1,
        salt="nv",
    ).collect()
    byw: dict = {}
    for r in rows:
        byw.setdefault(r.walk_id, {})[r.step] = r.node
    got = {
        wid: [steps[k] for k in sorted(steps)] for wid, steps in byw.items()
    }
    want = _n2v_py(edges, 4, 4, 2, 1, salt="nv")
    assert got == want
    # the bias must actually bite on this graph: a uniform corpus differs
    assert got != _n2v_py(edges, 4, 1, 1, 1, salt="nv")


def test_node2vec_uniform_weights_equal_random_walks(spark):
    from engine.operators.walks import node2vec_walks

    # with 1:1:1 weights the cumulative pick over dst order collapses to
    # the mod-degree index — bit-identical corpora, same hash stream
    edges = _graph(n=25, m=90, seed=22)
    df = _edges_df(spark, edges)
    a = {
        (r.walk_id, r.step): r.node
        for r in random_walks(df, 3, salt="eq").collect()
    }
    b = {
        (r.walk_id, r.step): r.node
        for r in node2vec_walks(df, 3, salt="eq").collect()
    }
    assert a == b


def test_node2vec_zero_return_weight_never_backtracks(spark):
    from engine.operators.walks import node2vec_walks

    edges = _graph(n=30, m=140, seed=23)
    # symmetrize so immediate backtracking is always structurally possible
    edges = list({e for u, v in edges for e in ((u, v), (v, u))})
    rows = node2vec_walks(
        _edges_df(spark, edges), 5, return_weight=0, salt="nb"
    ).collect()
    byw: dict = {}
    for r in rows:
        byw.setdefault(r.walk_id, {})[r.step] = r.node
    for steps in byw.values():
        ks = sorted(steps)
        assert ks == list(range(len(ks)))
        for k in ks:
            if k >= 2:
                assert steps[k] != steps[k - 2]  # no immediate return


def test_node2vec_rejects_bad_weights(spark):
    import pytest

    from engine.operators.walks import node2vec_walks

    df = _edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        node2vec_walks(df, 2, return_weight=0.5)  # type: ignore[arg-type]
    with pytest.raises(ValueError):
        node2vec_walks(df, 2, return_weight=0, in_weight=0, out_weight=0)
