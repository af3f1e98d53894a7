"""scc_coloring: exact SCC decomposition (FW-BW coloring) pinned
against an in-process Tarjan, plus bucket-count invariance and the
degenerate shapes (pure chain -> all singletons, pure cycle -> one
SCC). scc_id must be the lexicographically smallest member url and
scc_size the true component size."""
import numpy as np
import pyarrow as pa
import ray.data as rd


def _tarjan(edges, nodes):
    import collections

    g = collections.defaultdict(list)
    for s, d in edges:
        g[s].append(d)
    index, low, onstk, stk, out, c = {}, {}, set(), [], [], [0]
    for vroot in nodes:
        if vroot in index:
            continue
        work = [(vroot, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = c[0]
                c[0] += 1
                stk.append(v)
                onstk.add(v)
            recurse = False
            succ = g.get(v, [])
            for i in range(pi, len(succ)):
                w = succ[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in onstk:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stk.pop()
                    onstk.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                out.append(comp)
            work.pop()
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])
    return {v: min(comp) for comp in out for v in comp}


def _run(edges, num_buckets):
    from webcollector_ray.functions.graph import scc_coloring

    t = pa.table(
        {"src": [e[0] for e in edges], "dst": [e[1] for e in edges]}
    )
    df = scc_coloring(
        rd.from_arrow(t), src_col="src", dst_col="dst",
        num_buckets=num_buckets,
    ).to_pandas()
    return df


def test_scc_matches_tarjan_and_bucket_invariant(ray_session):
    import collections

    rng = np.random.default_rng(11)
    n, m = 40, 120
    edges = [
        (f"u{int(rng.integers(n)):02d}", f"u{int(rng.integers(n)):02d}")
        for _ in range(m)
    ]
    nodes = sorted({x for e in edges for x in e})
    truth = _tarjan(edges, nodes)
    sizes = collections.Counter(truth.values())
    for nb in (1, 4):
        df = _run(edges, nb)
        got = dict(zip(df.url, df.scc_id))
        assert got == truth
        for _, r in df.iterrows():
            assert r.scc_size == sizes[r.scc_id]


def test_scc_chain_all_singletons(ray_session):
    edges = [(f"n{i}", f"n{i+1}") for i in range(8)]
    df = _run(edges, 2)
    assert len(df) == 9
    assert (df.url == df.scc_id).all()
    assert (df.scc_size == 1).all()


def test_scc_cycle_one_component(ray_session):
    edges = [(f"n{i}", f"n{(i+1) % 7}") for i in range(7)]
    df = _run(edges, 2)
    assert len(df) == 7
    assert set(df.scc_id) == {"n0"}
    assert (df.scc_size == 7).all()
