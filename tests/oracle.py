"""Pure NumPy / pure-Python oracles for engine correctness tests.

`pagerank_numpy` is a faithful translation of the reference CPU recurrence
(pagerank_gpu.cu:137-191) — dangling mass from the *current* vector, L1
convergence checked after the swap, final renormalization. The graph kernels
(CC / LP / triangles) have no reference implementation; these oracles are
tiny single-machine versions of the published algorithms' *semantics* (min
component label, synchronous mode-with-min-tie-break propagation, triangle
count), used for exact-match assertions.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def pagerank_numpy(edges, n=None, alpha=0.85, tol=1e-8, max_iter=100):
    """edges: iterable of (src, dst) int pairs, duplicates count.

    Returns (ranks ndarray normalized to sum 1, iterations_done, converged).
    """
    edges = list(edges)
    if n is None:
        n = max(max(u, v) for u, v in edges) + 1
    outdeg = np.zeros(n, dtype=np.int64)
    for u, _ in edges:
        outdeg[u] += 1
    is_dangling = outdeg == 0

    src = np.array([u for u, _ in edges], dtype=np.int64)
    dst = np.array([v for _, v in edges], dtype=np.int64)
    w = 1.0 / outdeg[src]  # every src has outdeg >= 1 by construction

    r = np.full(n, 1.0 / n)
    teleport = (1.0 - alpha) / n
    converged = False
    it = -1
    for it in range(max_iter):
        dangling_mass = r[is_dangling].sum()
        gathered = np.zeros(n)
        np.add.at(gathered, dst, w * r[src])
        r_new = alpha * (gathered + dangling_mass / n) + teleport
        delta = np.abs(r_new - r).sum()
        r = r_new
        if delta < tol:
            converged = True
            break
    total = r.sum()
    if total > 0:
        r = r / total
    return r, it + 1, converged


def connected_components_py(edges, nodes=None):
    """Undirected CC; label = min node id in component. Union-find."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    for u, v in edges:
        union(u, v)
    universe = set(parent)
    if nodes is not None:
        universe |= set(nodes)
    return {x: find(x) for x in universe}


def label_propagation_py(edges, nodes=None, max_iter=20):
    """Synchronous LP over the undirected graph: new label = most frequent
    neighbor label, ties broken by min label; isolated nodes keep their own.
    Deterministic; stops when no label changes or max_iter."""
    adj = defaultdict(set)
    universe = set(nodes) if nodes is not None else set()
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
        universe.add(u)
        universe.add(v)
    labels = {x: x for x in universe}
    for _ in range(max_iter):
        new = {}
        changed = False
        for x in universe:
            if not adj[x]:
                new[x] = labels[x]
                continue
            cnt = Counter(labels[y] for y in adj[x])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            new[x] = best
            if best != labels[x]:
                changed = True
        labels = new
        if not changed:
            break
    return labels


def triangle_count_py(edges):
    """Total triangles in the undirected simple graph (self-loops and
    duplicate/reverse edges collapsed)."""
    und = set()
    for u, v in edges:
        if u != v:
            und.add((min(u, v), max(u, v)))
    adj = defaultdict(set)
    for u, v in und:
        adj[u].add(v)  # oriented: only higher neighbors
    return sum(len(adj[u] & adj[v]) for u, v in und)


def tokenize_py(text):
    """Reference tokenizer (api/tfidf_index.py:23-28)."""
    import re

    return [t.lower() for t in re.findall(r"\b\w+\b", text, re.UNICODE)]


def tfidf_weights_py(docs):
    """docs: dict doc_id -> text. Returns (postings dict term->{doc: w},
    doc_norms, idf) per api/tfidf_index.py:50-93."""
    import math

    inverted = defaultdict(dict)
    df = Counter()
    N = 0
    for doc_id, text in docs.items():
        tokens = tokenize_py(text)
        if not tokens:
            continue
        N += 1
        tf = Counter(tokens)
        for term, freq in tf.items():
            inverted[term][doc_id] = float(freq)
            df[term] += 1
    idf = {t: math.log((1 + N) / (1 + d)) + 1.0 for t, d in df.items()}
    doc_norm_sq = defaultdict(float)
    for term, posting in inverted.items():
        for doc_id, tf in posting.items():
            w = tf * idf[term]
            posting[doc_id] = w
            doc_norm_sq[doc_id] += w * w
    norms = {d: (nsq ** 0.5 if nsq > 0 else 1.0) for d, nsq in doc_norm_sq.items()}
    return inverted, norms, idf


def tfidf_search_py(docs, query, top_k=10):
    """Reference CPU search (api/tfidf_index.py:95-132)."""
    import math

    inverted, norms, idf = tfidf_weights_py(docs)
    tokens = tokenize_py(query)
    if not tokens:
        return []
    q_tf = Counter(tokens)
    q_weights = {t: f * idf[t] for t, f in q_tf.items() if t in idf}
    if not q_weights:
        return []
    q_norm = math.sqrt(sum(w * w for w in q_weights.values())) or 1.0
    scores = defaultdict(float)
    for term, q_w in q_weights.items():
        for doc_id, d_w in inverted.get(term, {}).items():
            scores[doc_id] += q_w * d_w
    results = [(d, dot / (q_norm * norms.get(d, 1.0))) for d, dot in scores.items()]
    results.sort(key=lambda x: x[1], reverse=True)
    return results[:top_k]


def personalized_pagerank_numpy(edges, personalization, n=None, alpha=0.85, tol=1e-8, max_iter=100):
    """PPR recurrence matching engine.operators.pagerank(personalization=...):
    r init = p; r_new = alpha*(gather + dm*p) + (1-alpha)*p; final Σ=1.
    personalization: dict id -> weight (normalized here)."""
    edges = list(edges)
    if n is None:
        n = max(max(u, v) for u, v in edges) + 1
    p = np.zeros(n)
    for i, wgt in personalization.items():
        p[i] = wgt
    p = p / p.sum()
    outdeg = np.zeros(n, dtype=np.int64)
    for u, _ in edges:
        outdeg[u] += 1
    is_dangling = outdeg == 0
    src = np.array([u for u, _ in edges], dtype=np.int64)
    dst = np.array([v for _, v in edges], dtype=np.int64)
    w = 1.0 / outdeg[src]
    r = p.copy()
    converged = False
    it = -1
    for it in range(max_iter):
        dm = r[is_dangling].sum()
        gathered = np.zeros(n)
        np.add.at(gathered, dst, w * r[src])
        r_new = alpha * (gathered + dm * p) + (1.0 - alpha) * p
        delta = np.abs(r_new - r).sum()
        r = r_new
        if delta < tol:
            converged = True
            break
    total = r.sum()
    if total > 0:
        r = r / total
    return r, it + 1, converged


def hits_numpy(edges, n=None, tol=1e-8, max_iter=100):
    """HITS (Kleinberg): a = L2norm(A^T h); h = L2norm(A a); init h = 1/sqrt(n).
    Returns (hub ndarray, authority ndarray, iterations, converged)."""
    edges = list(set(edges))  # simple graph
    if n is None:
        n = max(max(u, v) for u, v in edges) + 1
    src = np.array([u for u, _ in edges], dtype=np.int64)
    dst = np.array([v for _, v in edges], dtype=np.int64)
    h = np.full(n, 1.0 / np.sqrt(n))
    a = np.zeros(n)
    converged = False
    it = -1
    for it in range(max_iter):
        a_new = np.zeros(n)
        np.add.at(a_new, dst, h[src])
        na = np.sqrt((a_new ** 2).sum())
        if na > 0:
            a_new /= na
        h_new = np.zeros(n)
        np.add.at(h_new, src, a_new[dst])
        nh = np.sqrt((h_new ** 2).sum())
        if nh > 0:
            h_new /= nh
        delta = np.abs(h_new - h).sum() + np.abs(a_new - a).sum()
        h, a = h_new, a_new
        if delta < tol:
            converged = True
            break
    return h, a, it + 1, converged


def salsa_numpy(edges, n=None, tol=1e-8, max_iter=100):
    """SALSA (Lempel & Moran 2000): two stochastic chains on the bipartite
    hub/authority view. authority: a' = a·(W_c^T W_r); hub: h' = h·(W_r W_c^T)
    with W_r row-normalized (1/out_deg) and W_c column-normalized (1/in_deg).
    Init uniform over each chain's support; no renormalization (the chains
    are stochastic on their support, L1 mass conserved). Returns
    (hub ndarray, authority ndarray, iterations, converged)."""
    edges = list(set(edges))  # simple graph
    if n is None:
        n = max(max(u, v) for u, v in edges) + 1
    src = np.array([u for u, _ in edges], dtype=np.int64)
    dst = np.array([v for _, v in edges], dtype=np.int64)
    outd = np.zeros(n)
    ind = np.zeros(n)
    np.add.at(outd, src, 1.0)
    np.add.at(ind, dst, 1.0)
    inv_out = np.divide(1.0, outd, out=np.zeros(n), where=outd > 0)
    inv_in = np.divide(1.0, ind, out=np.zeros(n), where=ind > 0)
    hub_support = outd > 0
    auth_support = ind > 0
    h = np.where(hub_support, 1.0 / hub_support.sum(), 0.0)
    a = np.where(auth_support, 1.0 / auth_support.sum(), 0.0)
    converged = False
    it = -1
    for it in range(max_iter):
        # authority chain: back to hubs (·inv_in of the authority left),
        # forward to authorities (·inv_out of the hub)
        t = np.zeros(n)
        np.add.at(t, src, a[dst] * inv_in[dst])
        a_new = np.zeros(n)
        np.add.at(a_new, dst, t[src] * inv_out[src])
        # hub chain: forward then back
        u = np.zeros(n)
        np.add.at(u, dst, h[src] * inv_out[src])
        h_new = np.zeros(n)
        np.add.at(h_new, src, u[dst] * inv_in[dst])
        delta = np.abs(h_new - h).sum() + np.abs(a_new - a).sum()
        h, a = h_new, a_new
        if delta < tol:
            converged = True
            break
    return h, a, it + 1, converged


def scc_py(edges, nodes=None):
    """Directed SCC; label = min node id in the component. Iterative Tarjan."""
    adj: dict = {}
    universe = set()
    for u, v in edges:
        universe.add(u)
        universe.add(v)
        if u != v:
            adj.setdefault(u, []).append(v)
    if nodes is not None:
        universe |= set(nodes)

    index = {}
    low = {}
    on_stack = set()
    stack = []
    comp = {}
    counter = [0]

    for root in universe:
        if root in index:
            continue
        # iterative Tarjan: work stack of (node, child-iterator)
        work = [(root, iter(adj.get(root, ())))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        on_stack.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(adj.get(w, ()))))
                    advanced = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                p = work[-1][0]
                low[p] = min(low[p], low[v])
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                label = min(members)
                for w in members:
                    comp[w] = label
    return comp


def pagerank_weighted_numpy(edges_w, n=None, alpha=0.85, tol=1e-8, max_iter=100):
    """Weighted PageRank oracle: edges_w = (src, dst, weight) triples,
    weight >= 0. Each positive-weight edge contributes
    rank(src)·w/Σw(src); sources whose weights are all zero are dangling.
    Same recurrence/convergence/normalization as pagerank_numpy."""
    edges_w = [(u, v, float(w)) for u, v, w in edges_w]
    if n is None:
        n = max(max(u, v) for u, v, _ in edges_w) + 1
    wsum = np.zeros(n, dtype=np.float64)
    for u, _, w in edges_w:
        wsum[u] += w
    is_dangling = wsum == 0.0
    r = np.full(n, 1.0 / n)
    it = 0
    converged = False
    for it in range(max_iter):
        dm = r[is_dangling].sum()
        g = np.zeros(n)
        for u, v, w in edges_w:
            if w > 0:
                g[v] += r[u] * (w / wsum[u])
        r_new = alpha * (g + dm / n) + (1.0 - alpha) / n
        delta = np.abs(r_new - r).sum()
        r = r_new
        if delta < tol:
            converged = True
            break
    return r / r.sum(), it + 1, converged


def louvain_rounds_py(edges, rounds=5, weights=None):
    """Synchronous Louvain move rounds (exact replica of
    engine.operators.louvain.louvain_move_rounds semantics): every node
    simultaneously moves to the candidate community (neighbor communities
    + its own) with the highest exact-integer gain
    2m·ki_in(i,c) − k_i·Σtot(c∖i), ties broken by min community id, moving
    only on a strict improvement over staying; a singleton may join another
    singleton only when the target id is smaller (swap prevention,
    Ghosh et al. IPDPS 2018). Self-loops count 2·w into k_i, generate no
    candidates. Returns {id: label}."""
    w_und = defaultdict(int)
    loops = defaultdict(int)
    if weights is None:
        weights = [1] * len(edges)
    for (u, v), w in zip(edges, weights):
        if u == v:
            loops[u] += w
        else:
            w_und[(min(u, v), max(u, v))] += w
    adj = defaultdict(dict)
    for (a, b), w in w_und.items():
        adj[a][b] = w
        adj[b][a] = w
    k = defaultdict(int)
    for x, nb in adj.items():
        k[x] = sum(nb.values())
    for x, lw in loops.items():
        k[x] += 2 * lw
    universe = set(k)
    labels = {x: x for x in universe}
    two_m = sum(k.values())
    for _ in range(rounds):
        tot = defaultdict(int)
        csize = defaultdict(int)
        for x in universe:
            tot[labels[x]] += k[x]
            csize[labels[x]] += 1
        new = {}
        moved = 0
        for x in universe:
            ki_in = defaultdict(int)
            for y, w in adj[x].items():
                ki_in[labels[y]] += w
            cands = set(ki_in) | {labels[x]}
            def score(c):
                t = tot[c] - (k[x] if c == labels[x] else 0)
                return two_m * ki_in.get(c, 0) - k[x] * t
            best = min(cands, key=lambda c: (-score(c), c))
            blocked = (
                csize[labels[x]] == 1 and csize[best] == 1 and best > labels[x]
            )
            if score(best) > score(labels[x]) and best != labels[x] and not blocked:
                new[x] = best
                moved += 1
            else:
                new[x] = labels[x]
        labels = new
        if moved == 0:
            break
    return labels


def bpe_train_py(texts, num_merges=100):
    """Classic dict-based learn_bpe (Sennrich et al. 2016), exact replica
    of engine.operators.bpe.bpe_train semantics: words from the reference
    tokenizer (lowercase \\w+ runs), symbols = chars + '</w>', per round
    the (count DESC, pair ASC) argmax merged greedily left-to-right,
    stopping when the best pair count < 2. Returns (merges, vocab) with
    merges = [(left, right, count)] and vocab = {token: weighted count}."""
    import re

    wc = Counter()
    for t in texts:
        wc.update(re.findall(r"\w+", t.lower(), re.UNICODE))
    words = {w: tuple(w) + ("</w>",) for w in wc}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b, cnt))
        new_words = {}
        for w, syms in words.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    vocab = Counter()
    for w, syms in words.items():
        for s in syms:
            vocab[s] += wc[w]
    return merges, dict(vocab)
