"""Pure numpy/pandas oracles transcribing the reference semantics.

These are the single-node golden implementations used by the test
suite, mirroring the reference's validation style (LDBC Graphalytics
goldens compared byte-exact / np.allclose —
analytical_engine/test/app_tests.sh:115-126,
python/graphscope/tests/unittest/test_app.py:189-234). Each function
takes plain numpy edge arrays and returns per-vertex results; the
pytest suite asserts the distributed DataFrame implementations match
(allclose 1e-6 for PageRank, exact for WCC/CDLP/triangles).

Semantics sources (transcribed, not copied):
  pagerank  — apps/pagerank/pagerank_networkx.h:54-163
  wcc       — apps/projected/wcc_projected.h:70-182 (min-id labels)
  cdlp      — LDBC CDLP / apps/flash/clustering/lpa.h:47-77
              (most-frequent neighbor label, ties -> min, sync rounds)
  triangles — apps/clustering/triangles.h:43-158 (degree-ordered)
  bfs/sssp  — grape BFS/SSSP semantics (level / min-dist fixpoint)
  hits      — apps/hits/hits.h (L2-normalized, tol on both vectors)
"""

from __future__ import annotations

import numpy as np


def _relabel(src: np.ndarray, dst: np.ndarray, ids: np.ndarray | None = None):
    """Map arbitrary int64 vertex ids to dense [0,n); returns
    (n, ids_sorted, s, d) with s/d dense."""
    if ids is None:
        ids = np.unique(np.concatenate([src, dst]))
    else:
        ids = np.unique(ids)
    s = np.searchsorted(ids, src)
    d = np.searchsorted(ids, dst)
    return len(ids), ids, s, d


def pagerank(src, dst, directed=True, alpha=0.85, max_iter=100, tol=1e-6, ids=None):
    """Returns (ids, rank) — networkx/GRAPE semantics with uniform
    dangling redistribution and the eps < tol*N L1 stop rule."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    n, ids, s, d = _relabel(src, dst, ids)
    if not directed:
        pairs = np.unique(np.stack([np.concatenate([s, d]), np.concatenate([d, s])], axis=1), axis=0)
        s, d = pairs[:, 0], pairs[:, 1]
    else:
        pairs = np.unique(np.stack([s, d], axis=1), axis=0)
        s, d = pairs[:, 0], pairs[:, 1]
    deg = np.bincount(s, minlength=n).astype(np.float64)
    rank = np.full(n, 1.0 / n)
    dangling_mask = deg == 0
    for _ in range(max_iter):
        dangling = rank[dangling_mask].sum()
        w = np.zeros(n)
        nz = deg > 0
        w[nz] = rank[nz] / deg[nz]
        msg = np.bincount(d, weights=w[s], minlength=n)
        new_rank = (1 - alpha) / n + alpha * msg + alpha * dangling / n
        eps = np.abs(new_rank - rank).sum()
        rank = new_rank
        if eps < tol * n:
            break
    return ids, rank


def wcc(src, dst, ids=None):
    """Returns (ids, comp) with comp = min vertex id of the component
    (wcc_projected.h labels components by min gid)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    n, ids, s, d = _relabel(src, dst, ids)
    comp = np.arange(n)
    changed = True
    while changed:
        changed = False
        # min-label propagation both directions until fixpoint
        for a, b in ((s, d), (d, s)):
            new = comp.copy()
            np.minimum.at(new, b, comp[a])
            if (new < comp).any():
                comp = np.minimum(comp, new)
                changed = True
    return ids, ids[comp]


def cdlp(src, dst, max_round=10, ids=None):
    """LDBC CDLP on the undirected view: synchronous rounds, each
    vertex adopts the most frequent neighbor label, ties -> min label;
    isolated vertices keep their own label. Returns (ids, label)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    n, ids, s, d = _relabel(src, dst, ids)
    pairs = np.unique(
        np.stack([np.concatenate([s, d]), np.concatenate([d, s])], axis=1), axis=0
    )
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    u, v = pairs[:, 0], pairs[:, 1]
    label = ids.copy()
    for _ in range(max_round):
        nbr_lab = label[v]
        # histogram per (u, label): sort by (u, label) and count runs
        order = np.lexsort((nbr_lab, u))
        uu, ll = u[order], nbr_lab[order]
        grp = np.concatenate([[True], (uu[1:] != uu[:-1]) | (ll[1:] != ll[:-1])])
        gi = np.cumsum(grp) - 1
        cnt = np.bincount(gi)
        g_u = uu[grp]
        g_l = ll[grp]
        # pick per u: max count, tie -> min label. lexsort ascending by
        # (u, -cnt, label) then take first of each u-run.
        o2 = np.lexsort((g_l, -cnt, g_u))
        g_u2, g_l2 = g_u[o2], g_l[o2]
        first = np.concatenate([[True], g_u2[1:] != g_u2[:-1]])
        new_label = label.copy()
        new_label[g_u2[first]] = g_l2[first]
        if np.array_equal(new_label, label):
            break
        label = new_label
    return ids, label


def triangles(src, dst, ids=None):
    """Per-vertex triangle counts on the undirected simple graph,
    degree-ordered enumeration (apps/clustering/triangles.h:70-139:
    keep neighbor u of v iff (deg,id) of u < of v; intersect).
    Returns (ids, count)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    n, ids, s, d = _relabel(src, dst, ids)
    pairs = np.unique(
        np.stack([np.concatenate([s, d]), np.concatenate([d, s])], axis=1), axis=0
    )
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    u, v = pairs[:, 0], pairs[:, 1]
    deg = np.bincount(u, minlength=n)
    # orient: keep u->v iff (deg[u],u) < (deg[v],v)
    keep = (deg[u] < deg[v]) | ((deg[u] == deg[v]) & (u < v))
    ou, ov = u[keep], v[keep]
    adj: dict[int, set] = {}
    for a, b in zip(ou.tolist(), ov.tolist()):
        adj.setdefault(a, set()).add(b)
    cnt = np.zeros(n, dtype=np.int64)
    for a, b in zip(ou.tolist(), ov.tolist()):
        common = adj.get(a, set()) & adj.get(b, set())
        for c in common:
            cnt[a] += 1
            cnt[b] += 1
            cnt[c] += 1
    return ids, cnt


def bfs(src, dst, source, directed=True, ids=None):
    """BFS levels from `source` (unreached = -1). Returns (ids, level)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    n, ids, s, d = _relabel(src, dst, ids)
    if not directed:
        s, d = np.concatenate([s, d]), np.concatenate([d, s])
    level = np.full(n, -1, dtype=np.int64)
    si = int(np.searchsorted(ids, source))
    level[si] = 0
    frontier = np.array([si])
    lvl = 0
    while frontier.size:
        lvl += 1
        mask = np.isin(s, frontier)
        nxt = np.unique(d[mask])
        nxt = nxt[level[nxt] == -1]
        level[nxt] = lvl
        frontier = nxt
    return ids, level


def sssp(src, dst, w, source, directed=True, ids=None):
    """Single-source shortest paths (Bellman-Ford fixpoint), unreached
    = +inf. Returns (ids, dist)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    w = np.asarray(w, dtype=np.float64)
    n, ids, s, d = _relabel(src, dst, ids)
    if not directed:
        s, d = np.concatenate([s, d]), np.concatenate([d, s])
        w = np.concatenate([w, w])
    dist = np.full(n, np.inf)
    dist[int(np.searchsorted(ids, source))] = 0.0
    for _ in range(n):
        cand = dist[s] + w
        new = dist.copy()
        np.minimum.at(new, d, cand)
        if (new == dist).all():
            break
        dist = new
    return ids, dist


def hits(src, dst, max_iter=100, tol=1e-8, ids=None):
    """HITS hubs/authorities with L2 normalization each round
    (apps/hits/hits.h). Returns (ids, hub, auth)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    n, ids, s, d = _relabel(src, dst, ids)
    hub = np.full(n, 1.0)
    auth = np.full(n, 1.0)
    for _ in range(max_iter):
        raw_auth = np.bincount(d, weights=hub[s], minlength=n)
        na = np.linalg.norm(raw_auth) or 1.0
        raw_hub = np.bincount(s, weights=(raw_auth / na)[d], minlength=n)
        nh = np.linalg.norm(raw_hub) or 1.0
        # one-pass L2 stop rule (see linkgraph/algos/hits.py docstring):
        # delta per vector = sqrt(2 - 2*<raw, prev_normalized>/||raw||)
        d_a = max(0.0, 2.0 - 2.0 * float(raw_auth @ auth) / na) ** 0.5
        d_h = max(0.0, 2.0 - 2.0 * float(raw_hub @ hub) / nh) ** 0.5
        hub, auth = raw_hub / nh, raw_auth / na
        if d_a + d_h < tol:
            break
    return ids, hub, auth


def eigenvector_centrality(src, dst, directed=True, max_iter=100, tol=1e-6, ids=None):
    """Shifted power iteration x' = normalize(x + A^T x), networkx
    semantics (reference eigenvector app mirrors nx). Returns (ids, x)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    n, ids, s, d = _relabel(src, dst, ids)
    if not directed:
        pairs = np.unique(np.stack([np.concatenate([s, d]), np.concatenate([d, s])], axis=1), axis=0)
        s, d = pairs[:, 0], pairs[:, 1]
    else:
        pairs = np.unique(np.stack([s, d], axis=1), axis=0)
        s, d = pairs[:, 0], pairs[:, 1]
    x = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        xlast = x
        raw = xlast + np.bincount(d, weights=xlast[s], minlength=n)
        nrm = np.linalg.norm(raw) or 1.0
        x = raw / nrm
        # one-pass L2 stop rule (see linkgraph/algos/hits.py docstring)
        eps = max(0.0, 2.0 - 2.0 * float(raw @ xlast) / nrm) ** 0.5
        if eps < n * tol:
            break
    return ids, x


def katz_centrality(src, dst, alpha=0.1, beta=1.0, directed=True, max_iter=1000, tol=1e-6, ids=None):
    """Katz series x' = alpha * A^T x + beta, L2-normalized at the end.
    Returns (ids, x)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    n, ids, s, d = _relabel(src, dst, ids)
    if not directed:
        pairs = np.unique(np.stack([np.concatenate([s, d]), np.concatenate([d, s])], axis=1), axis=0)
        s, d = pairs[:, 0], pairs[:, 1]
    else:
        pairs = np.unique(np.stack([s, d], axis=1), axis=0)
        s, d = pairs[:, 0], pairs[:, 1]
    x = np.full(n, beta, dtype=np.float64)
    for _ in range(max_iter):
        xlast = x
        x = alpha * np.bincount(d, weights=xlast[s], minlength=n) + beta
        if np.abs(x - xlast).sum() < n * tol:
            break
    nrm = np.linalg.norm(x) or 1.0
    return ids, x / nrm


# -- path family (closeness/betweenness/apsp; apps/centrality/...,
#    apps/apsp/all_pairs_shortest_path_length.h) ----------------------

def _adj(src, dst, n, s, d, directed=True):
    """Dense adjacency lists (list of sorted np arrays)."""
    if not directed:
        s, d = np.concatenate([s, d]), np.concatenate([d, s])
    keep = s != d
    s, d = s[keep], d[keep]
    pairs = np.unique(np.stack([s, d], axis=1), axis=0)
    out = [[] for _ in range(n)]
    for a, b in pairs.tolist():
        out[a].append(b)
    return [np.array(sorted(x), dtype=np.int64) for x in out]


def bfs_levels_from(adj, n, source):
    dist = np.full(n, -1, dtype=np.int64)
    dist[source] = 0
    frontier = [source]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u].tolist():
                if dist[v] < 0:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    return dist


def closeness_centrality(src, dst, directed=True, wf_improved=True, ids=None,
                         sources=None):
    """closeness_centrality.h:118-140: reverse BFS per vertex;
    (reached-1)/Σd, wf: ×(reached-1)/(n-1). Returns (ids, closeness)
    restricted to `sources` (original ids) or all."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    n, ids, s, d = _relabel(src, dst, ids)
    # reverse: BFS over incoming edges
    radj = _adj(src, dst, n, d, s, directed=directed) if directed else \
        _adj(src, dst, n, s, d, directed=False)
    which = np.arange(n) if sources is None else np.searchsorted(ids, np.asarray(sorted(sources)))
    out = np.zeros(len(which))
    for i, v in enumerate(which.tolist()):
        dist = bfs_levels_from(radj, n, v)
        reached = dist >= 0
        tot = dist[reached].sum()
        r = int(reached.sum())
        if tot > 0 and n > 1:
            c = (r - 1.0) / tot
            if wf_improved:
                c *= (r - 1.0) / (n - 1.0)
            out[i] = c
    return ids[which], out


def betweenness_centrality(src, dst, directed=True, normalized=True,
                           endpoints=False, ids=None, sources=None):
    """Brandes per source (betweenness_centrality.h:73-196) with the
    reference's norm (context:56-67): (directed?1:0.5), normalized ÷
    K(K-1) (endpoints False) / K(K+1) (True), K=|sources|."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    n, ids, s, d = _relabel(src, dst, ids)
    adj = _adj(src, dst, n, s, d, directed=directed)
    which = np.arange(n) if sources is None else np.searchsorted(ids, np.asarray(sorted(sources)))
    cent = np.zeros(n)
    for sv in which.tolist():
        dist = np.full(n, -1, dtype=np.int64)
        sigma = np.zeros(n)
        dist[sv] = 0
        sigma[sv] = 1.0
        frontier = [sv]
        while frontier:
            nxt = set()
            for u in frontier:
                for v in adj[u].tolist():
                    if dist[v] < 0:
                        nxt.add(v)
            for v in nxt:
                dist[v] = dist[frontier[0]] + 1
            for u in frontier:
                for v in adj[u].tolist():
                    if dist[v] == dist[u] + 1:
                        sigma[v] += sigma[u]
            frontier = sorted(nxt)
        # accumulate dependencies over depth levels descending
        delta = np.zeros(n)
        maxd = dist.max()
        for dd in range(int(maxd) - 1, -1, -1):
            for u in np.where(dist == dd)[0].tolist():
                acc = 0.0
                for v in adj[u].tolist():
                    if dist[v] == dd + 1:
                        acc += (1.0 + delta[v]) / sigma[v]
                if acc:
                    delta[u] = sigma[u] * acc
        delta[sv] = 0.0
        cent += delta
    k = len(which)
    norm = 1.0 if directed else 0.5
    if normalized and k > 1:
        norm *= 1.0 / (k * (k + 1)) if endpoints else 1.0 / (k * (k - 1))
    return ids, cent * norm


def apsp_lengths(src, dst, directed=True, ids=None, sources=None):
    """(rows of (src_id, dst_id, dist)) for reached pairs."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    n, ids, s, d = _relabel(src, dst, ids)
    adj = _adj(src, dst, n, s, d, directed=directed)
    which = np.arange(n) if sources is None else np.searchsorted(ids, np.asarray(sorted(sources)))
    rows = []
    for sv in which.tolist():
        dist = bfs_levels_from(adj, n, sv)
        for v in np.where(dist >= 0)[0].tolist():
            rows.append((int(ids[sv]), int(ids[v]), int(dist[v])))
    return rows


def louvain_local_move(src, dst, w=None, max_round=10, ids=None):
    """Synchronous deterministic Louvain phase-1 transcribing
    apps/pregel/louvain/louvain.h:229-314: gain = k_i_in − k_i·σ'/m2,
    candidates = neighbor communities ∪ {(cur, 0)}, argmax with min-id
    ties, parity oscillation guard (even rounds cancel moves to a
    smaller id, odd rounds to a larger). Returns (ids, community)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    n, ids, s, d = _relabel(src, dst, ids)
    if w is None:
        w = np.ones(len(s))
    w = np.asarray(w, dtype=np.float64)
    # symmetrize, sum parallel, drop self-loops
    ss = np.concatenate([s, d]); dd = np.concatenate([d, s]); ww = np.concatenate([w, w])
    keep = ss != dd
    ss, dd, ww = ss[keep], dd[keep], ww[keep]
    agg: dict = {}
    for a, b, x in zip(ss.tolist(), dd.tolist(), ww.tolist()):
        agg[(a, b)] = agg.get((a, b), 0.0) + x
    k = np.zeros(n)
    for (a, b), x in agg.items():
        k[a] += x
    m2 = k.sum() or 1.0
    comm = np.arange(n)
    prev_moved = -1
    for rnd in range(max_round):
        sig = np.zeros(n)  # indexed by community id (dense labels)
        for v in range(n):
            sig[comm[v]] += k[v]
        # neighbor-community weights per vertex
        wic: list[dict] = [dict() for _ in range(n)]
        for (a, b), x in agg.items():
            c = comm[b]
            wic[a][c] = wic[a].get(c, 0.0) + x
        newc = comm.copy()
        moved = 0
        for v in range(n):
            cur = comm[v]
            # candidate set: formula ΔQ for each neighbor community,
            # plus the synthetic stay-put (cur, 0) entry — for c=cur
            # the better of the two rows wins in the global argmax
            cands: dict = {}
            for c, kin in wic[v].items():
                is_cur = c == cur
                sg = sig[c] - (k[v] if is_cur else 0.0)
                if is_cur and sg == 0.0:
                    dq = 0.0
                else:
                    dq = kin - k[v] * sg / m2  # + internal terms (0 at level 0)
                cands[c] = dq
            cands[cur] = max(cands.get(cur, 0.0), 0.0)
            best_q = max(cands.values())
            best_c = min(c for c, q in cands.items() if q == best_q)
            # parity guard
            if (cur > best_c and rnd % 2 == 0) or (cur < best_c and rnd % 2 != 0):
                best_c = cur
            if best_c != cur:
                moved += 1
            newc[v] = best_c
        comm = newc
        if moved == 0 and prev_moved == 0:
            break
        prev_moved = moved
    return ids, ids[comm]


def core_numbers(src, dst, ids=None):
    """Core (shell) number per vertex by sequential peeling — the
    golden check for the distributed iterated-H-index fixpoint
    (apps/kshell/kshell.h semantics). Returns (ids, core)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    n, ids, s, d = _relabel(src, dst, ids)
    adj = _adj(src, dst, n, s, d, directed=False)
    deg = np.array([len(a) for a in adj])
    core = np.zeros(n, dtype=np.int64)
    removed = np.zeros(n, dtype=bool)
    k = 0
    left = n
    while left > 0:
        prog = True
        while prog:
            prog = False
            for v in np.where(~removed & (deg <= k))[0].tolist():
                core[v] = k
                removed[v] = True
                left -= 1
                prog = True
                for u in adj[v].tolist():
                    if not removed[u]:
                        deg[u] -= 1
        if left > 0 and not (~removed & (deg <= k)).any():
            k += 1
    return ids, core
