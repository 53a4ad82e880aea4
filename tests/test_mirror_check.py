"""The at-scale numpy mirrors (tools/mirror_check.py) are themselves
verified here against brute-force implementations on a random graph
with dangling vertices and multiple components — the mirror that
value-checks the engine at sf10 must not be wrong in the same way the
engine could be."""

from __future__ import annotations

import collections
import importlib.util

import numpy as np


def _load():
    spec = importlib.util.spec_from_file_location(
        "mirror_check", "/root/repo/tools/mirror_check.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _graph(seed=0, n_src=200, n_dst=220, m=600):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_src, m)
    dst = rng.integers(0, n_dst, m)
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], 1), axis=0)
    return pairs[:, 0], pairs[:, 1]


def test_mirror_pagerank_matches_bruteforce():
    mc = _load()
    src, dst = _graph()
    uids, srci, dsti = mc._compact(src, dst)
    n, d = len(uids), 0.85
    outdeg = np.bincount(srci, minlength=n).astype(float)
    r = np.full(n, 1 / n)
    for _ in range(10):
        dm = r[outdeg == 0].sum()
        contrib = np.zeros(n)
        for s, t in zip(srci, dsti):
            contrib[t] += r[s] / outdeg[s]
        r = (1 - d) / n + d * dm / n + d * contrib
    got = mc.mirror_pagerank(uids, srci, dsti, 10)
    assert np.abs(got - r).max() < 1e-15


def test_mirror_lp_matches_bruteforce():
    mc = _load()
    for seed in (0, 3):
        src, dst = _graph(seed)
        uids, srci, dsti = mc._compact(src, dst)
        n = len(uids)
        # brute force: distinct symmetrized neighbor sets, synchronous
        # rounds, max label count with ties to the smaller label
        nbrs = [set() for _ in range(n)]
        for s, t in zip(srci, dsti):
            if s != t:
                nbrs[s].add(t)
                nbrs[t].add(s)
        lbl = list(range(n))
        for _ in range(5):
            new = lbl[:]
            for v in range(n):
                if not nbrs[v]:
                    continue
                counts: dict[int, int] = {}
                for u in nbrs[v]:
                    counts[lbl[u]] = counts.get(lbl[u], 0) + 1
                best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
            lbl = new
        want = uids[np.array(lbl)]
        got = mc.mirror_lp(uids, srci, dsti, 5)
        assert np.array_equal(got, want), seed


def test_mirror_cc_matches_bfs():
    mc = _load()
    for seed in (0, 1, 2):
        src, dst = _graph(seed)
        uids, srci, dsti = mc._compact(src, dst)
        n = len(uids)
        adj = collections.defaultdict(list)
        for s, t in zip(srci, dsti):
            adj[s].append(t)
            adj[t].append(s)
        lbl = -np.ones(n, dtype=np.int64)
        for i in range(n):
            if lbl[i] >= 0:
                continue
            comp, q = {i}, [i]
            while q:
                x = q.pop()
                for y in adj[x]:
                    if y not in comp:
                        comp.add(y)
                        q.append(y)
            m = uids[min(comp)]  # uids sorted: min index == min id
            for x in comp:
                lbl[x] = m
        got = mc.mirror_cc(uids, srci, dsti)
        assert np.array_equal(got, lbl), seed
