"""GenESeSS — PFSA structure + parameter inference (reference operator X1).

Reimplements the published algorithm (``tex/ms.tex:299-338``; invoked by the
reference at ``patternly/detection.py:372-393``) in pure numpy:

  Step 1  approximate epsilon-synchronizing sequence: build the derivative
          heap {phi_hat^x_y : |y| <= L}, L = ceil(log_|S| 1/eps); pick the
          most frequent subsequence whose follower distribution is a vertex
          of the heap's convex hull.
  Step 2  BFS state discovery: states carry a sequence identifier and its
          follower distribution; delta(q,s) merges into an existing state
          when the inf-norm distance < eps, else mints a new state; finally
          restrict to the largest strongly-connected subgraph.
  Step 3  transition probabilities: one pass over the data counting
          (state, symbol) visits; rows normalized (light Laplace smoothing
          so fitted models assign nonzero mass to every symbol).

Validation is by simulation-recovery (SURVEY §5.2 — the M2.cfg pattern),
not bit-parity with the closed-source zedsuite binary.

Spark surface: ``fit_cluster_pfsas`` fits one PFSA per cluster with
``applyInPandas`` over ``groupBy('cluster')`` — model fits are per-group
and each cluster's windowed data fits in executor memory (SURVEY §4.3.2).
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from patternly_spark.pfsa.model import PFSA

_MAX_STATES = 64
_MIN_COUNT = 5


def _follower_counts(seqs_b: list[bytes], pattern: bytes, k: int) -> np.ndarray:
    """Counts of the symbol immediately following each occurrence of
    ``pattern`` across all sequences (no cross-sequence matches)."""
    counts = np.zeros(k, dtype=np.int64)
    plen = len(pattern)
    for sb in seqs_b:
        if plen == 0:
            # empty pattern: every position's symbol counts
            arr = np.frombuffer(sb, dtype=np.uint8)
            counts += np.bincount(arr, minlength=k)[:k]
            continue
        start = 0
        end = len(sb)
        while True:
            i = sb.find(pattern, start)
            if i < 0:
                break
            j = i + plen
            if j < end:
                counts[sb[j]] += 1
            start = i + 1
    return counts


def _hull_vertices(points: np.ndarray, seed: int = 42) -> np.ndarray:
    """Indices of approximate convex-hull vertices of distribution points
    (rows on the probability simplex).  Exact for |Sigma|=2 (1-D hull);
    for larger alphabets uses a fixed direction set (coordinate axes +
    seeded random directions) — adequate because the selection is only a
    heuristic for a well-synchronizing prefix."""
    n, k = points.shape
    if n == 1:
        return np.array([0])
    dirs = []
    for j in range(k):
        e = np.zeros(k)
        e[j] = 1.0
        dirs.append(e)
        dirs.append(-e)
    rng = np.random.default_rng(seed)
    for _ in range(4 * k):
        v = rng.normal(size=k)
        dirs.append(v / np.linalg.norm(v))
    verts: set[int] = set()
    for d in dirs:
        verts.add(int(np.argmax(points @ d)))
    return np.array(sorted(verts))


def _tarjan_scc(n: int, edges: dict[int, set[int]]) -> list[list[int]]:
    """Iterative Tarjan SCC (standard — the reference's stack-pop quirk at
    ``patternly/_utils.py:157-160`` is consciously NOT replicated; SURVEY
    §2.5 A7 flags it as an internal bug)."""
    index = [0]
    idx = [-1] * n
    low = [0] * n
    on_stack = [False] * n
    stack: list[int] = []
    sccs: list[list[int]] = []

    for root in range(n):
        if idx[root] != -1:
            continue
        work = [(root, iter(sorted(edges.get(root, ()))))]
        idx[root] = low[root] = index[0]
        index[0] += 1
        stack.append(root)
        on_stack[root] = True
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if idx[w] == -1:
                    idx[w] = low[w] = index[0]
                    index[0] += 1
                    stack.append(w)
                    on_stack[w] = True
                    work.append((w, iter(sorted(edges.get(w, ())))))
                    advanced = True
                    break
                elif on_stack[w]:
                    low[v] = min(low[v], idx[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == idx[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    comp.append(w)
                    if w == v:
                        break
                sccs.append(comp)
    return sccs


def genesess(
    sequences: Iterable[Sequence[int]],
    eps: float = 0.1,
    alphabet_size: int | None = None,
    pfsa_id: int = 0,
    smoothing: float = 0.5,
) -> PFSA:
    """Infer a PFSA from symbol sequences.  Deterministic given input order."""
    seqs = []
    for s in sequences:
        if len(s) == 0:
            continue
        a = np.asarray(s)
        # the byte-level n-gram machinery packs symbols into uint8; a larger
        # alphabet would silently wrap modulo 256 and fit a wrong machine
        if int(a.max()) > 255 or int(a.min()) < 0:
            raise ValueError(
                f"genesess: symbols must be in [0, 255], got range "
                f"[{int(a.min())}, {int(a.max())}]"
            )
        seqs.append(a.astype(np.uint8))
    if not seqs:
        raise ValueError("genesess: no non-empty sequences")
    k = alphabet_size if alphabet_size is not None else int(max(int(s.max()) for s in seqs)) + 1
    k = max(k, 2)
    seqs_b = [s.tobytes() for s in seqs]
    total_len = sum(len(s) for s in seqs)

    # global symbol frequencies (%SYM_FRQ)
    sym_frq = np.zeros(k)
    for s in seqs:
        sym_frq += np.bincount(s, minlength=k)[:k]
    sym_frq = sym_frq / max(sym_frq.sum(), 1)

    get_counts = lambda p: _follower_counts(seqs_b, p, k)  # noqa: E731
    x0, connx, kept_dists, degenerate = _structure_from_counts(
        get_counts, k, eps, sym_frq, total_len
    )
    if degenerate:
        pit = (sym_frq + 1e-12) / (sym_frq + 1e-12).sum()
        return PFSA(
            pitilde=pit.reshape(1, k), connx=connx, pfsa_id=pfsa_id,
            ann_err=0.0, mrg_eps=eps, syn_str=list(x0), sym_frq=sym_frq,
        )
    m = connx.shape[0]

    # ---- Step 3: transition probabilities by one counting pass ----------
    counts = np.zeros((m, k), dtype=np.int64)
    for s in seqs:
        q = 0
        for sigma in s:
            counts[q, sigma] += 1
            q = connx[q, sigma]
    pit = (counts + smoothing) / (counts + smoothing).sum(axis=1, keepdims=True)

    ann_err = float(np.mean([np.max(np.abs(pit[q] - kept_dists[q])) for q in range(m)]))
    return PFSA(
        pitilde=pit,
        connx=connx,
        pfsa_id=pfsa_id,
        ann_err=ann_err,
        mrg_eps=eps,
        syn_str=list(x0),
        sym_frq=sym_frq,
    )


def _structure_from_counts(get_counts, k: int, eps: float, sym_frq: np.ndarray, total_len: int):
    """Steps 1-2 of GenESeSS driven purely by a follower-count oracle
    ``get_counts(pattern: bytes) -> np.ndarray(k)`` — shared by the
    in-memory path (scan the sequence list) and the distributed path
    (one Spark n-gram aggregation).  Returns (sync_string, connx,
    per-state follower dists, degenerate_flag)."""
    # ---- Step 1: derivative heap over subsequences of length <= L -------
    L = max(1, math.ceil(math.log(1.0 / max(eps, 1e-9), k)))
    L = min(L, 8)  # bound the n-gram space; longer prefixes add nothing at eps >= 1e-5
    cand_patterns: list[bytes] = [b""]
    for length in range(1, L + 1):
        if k ** length > 4096:
            break
        from itertools import product

        for tup in product(range(k), repeat=length):
            cand_patterns.append(bytes(tup))

    pats: list[bytes] = []
    dists: list[np.ndarray] = []
    freqs: list[int] = []
    for p in cand_patterns:
        c = get_counts(p)
        tot = int(c.sum())
        if tot >= _MIN_COUNT:
            pats.append(p)
            dists.append(c / tot)
            freqs.append(tot)
    if not pats:
        pats, dists, freqs = [b""], [sym_frq.copy()], [total_len]

    pts = np.vstack(dists)
    verts = _hull_vertices(pts)
    # vertex with the highest frequency in x (ms.tex GenSyncSeq line)
    best = max(verts, key=lambda i: (freqs[i], -len(pats[i])))
    x0 = pats[best]

    # ---- Step 2: state discovery over the full L-context set ------------
    # Contexts longer than L are statistically indistinguishable at
    # resolution eps (that is what L = ceil(log_|Sigma| 1/eps) encodes, the
    # ms.tex GenL line), so the state space is built from ALL length-L
    # contexts at once: cluster contexts whose follower distributions are
    # within eps in inf-norm (greedy, by descending support — merging into
    # the count-weighted state mean), then derive delta by count-weighted
    # majority over context successors.  Unlike a greedy BFS over growing
    # sequence identifiers, this construction is total and keeps the graph
    # recurrent, so the strongly-connected restriction does not degenerate.
    Lc = L
    while Lc > 1 and k ** Lc > 4096:
        Lc -= 1

    def _context_stats(Lc: int):
        ctxs: list[bytes] = []
        cdists: list[np.ndarray] = []
        ccounts: list[int] = []
        from itertools import product as _product

        for tup in _product(range(k), repeat=Lc):
            p = bytes(tup)
            c = get_counts(p)
            tot = int(c.sum())
            if tot >= _MIN_COUNT:
                ctxs.append(p)
                cdists.append(c / tot)
                ccounts.append(tot)
        return ctxs, cdists, ccounts

    ctxs, cdists, ccounts = _context_stats(Lc)
    while not ctxs and Lc > 1:
        Lc -= 1
        ctxs, cdists, ccounts = _context_stats(Lc)
    if not ctxs:
        # degenerate input: single uniform-ish state from global frequencies
        return x0, np.zeros((1, k), dtype=np.int32), [sym_frq.copy()], True

    # greedy eps-clustering of contexts, seeded by the sync context's
    # cluster; order by descending support for determinism
    order = sorted(range(len(ctxs)), key=lambda i: (-ccounts[i], ctxs[i]))
    ctx_state: dict[bytes, int] = {}
    state_sum: list[np.ndarray] = []  # count-weighted sums of follower dists
    state_cnt: list[int] = []
    for i in order:
        d = cdists[i]
        jbest, gbest = -1, np.inf
        for j in range(len(state_sum)):
            g = float(np.max(np.abs(d - state_sum[j] / state_cnt[j])))
            if g < gbest:
                jbest, gbest = j, g
        if jbest >= 0 and (gbest < eps or len(state_sum) >= _MAX_STATES):
            ctx_state[ctxs[i]] = jbest
            state_sum[jbest] = state_sum[jbest] + d * ccounts[i]
            state_cnt[jbest] += ccounts[i]
        else:
            ctx_state[ctxs[i]] = len(state_sum)
            state_sum.append(d * ccounts[i])
            state_cnt.append(ccounts[i])
    n_states0 = len(state_sum)
    state_dists = [state_sum[j] / state_cnt[j] for j in range(n_states0)]

    # transition structure: count-weighted majority vote over successors
    votes: dict[tuple[int, int], dict[int, float]] = {}
    for i, y in enumerate(ctxs):
        q = ctx_state[y]
        for sigma in range(k):
            succ = (y + bytes([sigma]))[-Lc:]
            if succ not in ctx_state:
                continue
            w = ccounts[i] * cdists[i][sigma]
            votes.setdefault((q, sigma), {}).setdefault(ctx_state[succ], 0.0)
            votes[(q, sigma)][ctx_state[succ]] += w
    delta: dict[tuple[int, int], int] = {}
    fallback = int(np.argmax(state_cnt))
    for q in range(n_states0):
        for sigma in range(k):
            v = votes.get((q, sigma))
            if v:
                delta[(q, sigma)] = max(sorted(v), key=lambda s: v[s])
            else:
                delta[(q, sigma)] = fallback

    state_ids = [b"" for _ in range(n_states0)]
    for y, q in ctx_state.items():
        if not state_ids[q]:
            state_ids[q] = y

    # ---- largest strongly-connected subgraph ----------------------------
    n = len(state_ids)
    adj: dict[int, set[int]] = {q: set() for q in range(n)}
    for (q, _s), q2 in delta.items():
        adj[q].add(q2)
    sccs = _tarjan_scc(n, adj)
    keep = max(sccs, key=len)
    keep_sorted = sorted(keep)
    remap = {old: new for new, old in enumerate(keep_sorted)}
    kept_dists = [state_dists[q] for q in keep_sorted]
    m = len(keep_sorted)
    connx = np.zeros((m, k), dtype=np.int32)
    for new_q, old_q in enumerate(keep_sorted):
        for sigma in range(k):
            tgt = delta[(old_q, sigma)]
            if tgt in remap:
                connx[new_q, sigma] = remap[tgt]
            else:
                # edge leaves the SCC: redirect to the in-SCC state whose
                # follower distribution is nearest the dangling target's
                d = state_dists[tgt]
                j = int(np.argmin([np.max(np.abs(d - kd)) for kd in kept_dists]))
                connx[new_q, sigma] = j

    return x0, connx, kept_dists, False


_FIT_SCHEMA = T.StructType(
    [
        T.StructField("cluster", T.IntegerType(), False),
        T.StructField("pfsa_id", T.IntegerType(), False),
        T.StructField("ann_err", T.DoubleType(), True),
        T.StructField("mrg_eps", T.DoubleType(), True),
        T.StructField("syn_str", T.ArrayType(T.IntegerType()), True),
        T.StructField("sym_frq", T.ArrayType(T.DoubleType()), True),
        T.StructField("pitilde", T.ArrayType(T.ArrayType(T.DoubleType())), False),
        T.StructField("connx", T.ArrayType(T.ArrayType(T.IntegerType())), False),
    ]
)


def fit_cluster_pfsas(
    seq_df: DataFrame,
    eps: float = 0.1,
    alphabet_size: int | None = None,
    *,
    cluster_col: str = "cluster",
    seq_col: str = "symbols",
    id_col: str = "seq_id",
) -> DataFrame:
    """One GenESeSS fit per cluster (SURVEY X1 Spark mapping).

    groupBy(cluster).applyInPandas — each group's sequences are sorted by
    seq_id inside the UDF so the fit is deterministic under any shuffle
    partitioning.  Returns a PFSA-library DataFrame with a ``cluster``
    column; pfsa_id == cluster label.
    """

    def fit(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col)
        cluster = int(pdf[cluster_col].iloc[0])
        model = genesess(pdf[seq_col].tolist(), eps=eps, alphabet_size=alphabet_size, pfsa_id=cluster)
        return pd.DataFrame(
            [
                {
                    "cluster": cluster,
                    "pfsa_id": cluster,
                    "ann_err": model.ann_err,
                    "mrg_eps": model.mrg_eps,
                    "syn_str": model.syn_str,
                    "sym_frq": model.sym_frq.tolist(),
                    "pitilde": model.pitilde.tolist(),
                    "connx": [[int(v) for v in row] for row in model.connx],
                }
            ]
        )

    return seq_df.select(cluster_col, id_col, seq_col).groupBy(cluster_col).applyInPandas(fit, schema=_FIT_SCHEMA)


def genesess_distributed(
    seq_df,
    eps: float = 0.1,
    alphabet_size: int | None = None,
    pfsa_id: int = 0,
    smoothing: float = 0.5,
    seq_col: str = "symbols",
) -> PFSA:
    """GenESeSS over a (seq_id, symbols) DataFrame without collecting the
    sequences (SURVEY §4.3.2 fallback for clusters that exceed one
    executor's memory).

    Two Spark passes, both narrow-then-one-shuffle:
      1. follower-count aggregation — every (n-gram <= L, next-symbol)
         pair is pre-aggregated per partition in a mapInPandas kernel
         (output bounded by the pattern space, <= 4096 x k rows per
         partition regardless of data size), then summed in one tiny
         groupBy;
      2. automaton-walk counting — each sequence walks the (broadcast)
         fitted structure independently; per-partition (|Q| x k) count
         matrices are summed on the driver.
    The structure inference between the passes is the identical
    ``_structure_from_counts`` code the in-memory path runs, so both
    paths produce the same machine from the same data.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    spark = seq_df.sparkSession
    if alphabet_size is None:
        alphabet_size = int(
            seq_df.select(F.max(F.array_max(F.col(seq_col).cast("array<int>")))).first()[0]
        ) + 1
    k = max(int(alphabet_size), 2)
    L = max(1, math.ceil(math.log(1.0 / max(eps, 1e-9), k)))
    L = min(L, 8)
    while L > 1 and k ** L > 4096:
        L -= 1

    count_schema = T.StructType(
        [
            T.StructField("pattern", T.BinaryType(), False),
            T.StructField("next_sym", T.IntegerType(), False),
            T.StructField("cnt", T.LongType(), False),
        ]
    )

    def count_partition(batches):
        acc: dict[tuple[bytes, int], int] = {}
        for pdf in batches:
            for symbols in pdf[seq_col]:
                s = np.asarray(symbols, dtype=np.uint8)
                n = len(s)
                for t in range(n):
                    nxt = int(s[t])
                    for l in range(0, L + 1):
                        if t - l < 0:
                            break
                        key = (s[t - l : t].tobytes(), nxt)
                        acc[key] = acc.get(key, 0) + 1
        if acc:
            yield pd.DataFrame(
                {
                    "pattern": [p for p, _ in acc],
                    "next_sym": [x for _, x in acc],
                    "cnt": list(acc.values()),
                }
            )

    agg = (
        seq_df.select(seq_col)
        .mapInPandas(count_partition, schema=count_schema)
        .groupBy("pattern", "next_sym")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    counts: dict[bytes, np.ndarray] = {}
    for r in agg:
        p = bytes(r["pattern"])
        counts.setdefault(p, np.zeros(k))[int(r["next_sym"])] += int(r["cnt"])

    empty = counts.get(b"", np.zeros(k))
    total_len = int(empty.sum())
    if total_len == 0:
        raise ValueError("genesess_distributed: no symbols")
    sym_frq = empty / max(empty.sum(), 1)

    get_counts = lambda p: counts.get(p, np.zeros(k))  # noqa: E731
    x0, connx, kept_dists, degenerate = _structure_from_counts(
        get_counts, k, eps, sym_frq, total_len
    )
    if degenerate:
        pit = (sym_frq + 1e-12) / (sym_frq + 1e-12).sum()
        return PFSA(
            pitilde=pit.reshape(1, k), connx=connx, pfsa_id=pfsa_id,
            ann_err=0.0, mrg_eps=eps, syn_str=list(x0), sym_frq=sym_frq,
        )

    m = connx.shape[0]
    connx_b = spark.sparkContext.broadcast(connx)

    walk_schema = T.StructType([T.StructField("flat", T.ArrayType(T.LongType()), False)])

    def walk_partition(batches):
        cx = connx_b.value
        mat = np.zeros((m, k), dtype=np.int64)
        for pdf in batches:
            for symbols in pdf[seq_col]:
                q = 0
                for sigma in np.asarray(symbols, dtype=np.uint8):
                    mat[q, sigma] += 1
                    q = cx[q, sigma]
        yield pd.DataFrame({"flat": [mat.reshape(-1).tolist()]})

    walked = seq_df.select(seq_col).mapInPandas(walk_partition, schema=walk_schema).collect()
    wcounts = np.zeros((m, k), dtype=np.int64)
    for r in walked:
        wcounts += np.asarray(r["flat"], dtype=np.int64).reshape(m, k)
    pit = (wcounts + smoothing) / (wcounts + smoothing).sum(axis=1, keepdims=True)
    ann_err = float(np.mean([np.max(np.abs(pit[q] - kept_dists[q])) for q in range(m)]))
    return PFSA(
        pitilde=pit, connx=connx, pfsa_id=pfsa_id, ann_err=ann_err,
        mrg_eps=eps, syn_str=list(x0), sym_frq=sym_frq,
    )
