"""Iterative graph operators: exact fixed-point PageRank and bounded-hop
multi-source BFS over an edge Dataset.

The reference has no graph operators at all; at web scale the link graph
IS the corpus structure (crawl ranking, spam propagation, seed-set
expansion), so these are first-class training-data-pipeline extensions
(SURVEY §2.3 "user extension" + round brief).  Both are expressed as the
same Ray-Data-first plan shape as the MinHash connected-components
closure (stages/dedup.py:lsh_group_labels): a FIXED number of rounds,
each round = one bucketed hash join (ship current per-node state onto
the edges, keyed by src) + one coarse-bucket keyed reduce (combine the
propagated values per dst with every node's previous state).  Only
fixed-width (node, int) rows ever shuffle besides the edge table itself.

Numeric design: PageRank is computed in FIXED-POINT INTEGER arithmetic
(ranks scaled by ``scale``, damping as the exact rational d_num/d_den,
per-edge contribution = floor(rank / outdeg), update = base +
floor(d_num * Σcontrib / d_den)).  Integer sums are order-independent,
so the result is bit-exact against the mirrored SQL (no IEEE
float-summation-order hazard) — the same discipline as the MinHash /
SimHash kernels.  With the default scale=10^12 the per-node quantization
error is < outdeg/scale per step; sums stay far below 2^62.

Scale notes (100 TB):
* the edge table re-shuffles once per round inside the bucketed join —
  that is the dominant cost and matches the classic Pregel/BSP plan; on
  a real cluster the next optimization is pinning edge blocks to
  hash(src) buckets once and shipping only the (node, rank) table, which
  Ray Data cannot express without actor-held state (documented trade).
* per-round reduces are combiner-first: contributions are pre-summed per
  dst INSIDE each joined batch, so the all-to-all moves at most one row
  per (dst, batch), never one per edge.
* dangling nodes (outdeg = 0) receive rank but contribute none — their
  mass decays, the standard simplification; both sides of the oracle
  compute the same thing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .bucketed import bucketed_groupby
from .hashjoin import bucketed_join

NODE = "node"


def distinct_tuples(ds, cols: list[str], n_buckets: int = 64):
    """Global DISTINCT over ``cols``: per-batch pre-distinct (combiner)
    then one bucketed drop_duplicates — at most one row per (tuple,
    batch) shuffles."""

    def pre(b: pa.Table) -> pa.Table:
        df = b.select(cols).to_pandas().drop_duplicates(cols)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    return bucketed_groupby(
        ds.map_batches(pre, batch_format="pyarrow"),
        cols,
        lambda g: g.drop_duplicates(cols),
        n_buckets=n_buckets,
    )


def node_degrees(edges, *, src: str = "src", dst: str = "dst",
                 weight_col: str | None = None, n_buckets: int = 64):
    """(node, outdeg) over the FULL node universe (src ∪ dst); dst-only
    nodes get outdeg 0.  With ``weight_col``, outdeg is the total
    OUT-WEIGHT per node instead of the edge count.  One combiner-first
    shuffle."""

    def partial(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False)
        d = b.column(dst).to_numpy(zero_copy_only=False)
        if weight_col is None:
            us, cs = np.unique(s, return_counts=True)
            cs = cs.astype(np.int64)
        else:
            w = b.column(weight_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            us, inv = np.unique(s, return_inverse=True)
            cs = np.zeros(len(us), dtype=np.int64)
            np.add.at(cs, inv, w)
        ud = np.unique(d)
        return pa.table({
            NODE: pa.array(np.concatenate([us, ud])),
            "_c": pa.array(np.concatenate(
                [cs, np.zeros(len(ud), np.int64)])),
        })

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(NODE, sort=False, as_index=False)["_c"].sum()
        return out.rename(columns={"_c": "outdeg"})

    return bucketed_groupby(
        edges.map_batches(partial, batch_format="pyarrow"),
        [NODE], combine, n_buckets=n_buckets,
    )


def _propagated(edges, state, *, src: str, n_buckets: int):
    """Ship per-node ``state`` onto the edges: one bucketed hash join on
    ``src`` — each edge row gains its source node's state columns."""
    renamed = state.map_batches(
        lambda b: b.rename_columns(
            [src if c == NODE else c for c in b.column_names]),
        batch_format="pyarrow",
    )
    return bucketed_join(edges, renamed, [src], n_buckets=n_buckets)


def _auto_buckets(n_rows: int) -> int:
    """Size the coarse-bucket count to the data: a shuffle's latency on
    small inputs is TASK-count-bound (see lsh_group_labels), so floor at
    8 for parallelism and grow one bucket per ~50k rows up to 64."""
    return int(min(64, max(8, n_rows // 50_000)))


#: node-count ceiling for the BROADCAST state path.  Below it, per-round
#: state (ranks / labels / distances / survivors — all node-bounded, a
#: few int64 arrays) is shipped once via ``ray.put`` and looked up with
#: searchsorted inside the edge map, so THE EDGE TABLE NEVER RE-SHUFFLES
#: and each round is ONE dataset execution.  Above it, the bucketed BSP
#: path runs (state too big for one object — the 1e9-node cluster path).
#: 2M nodes ≈ 50 MB of state — comfortably a broadcast object.
BROADCAST_NODES = 2_000_000

_STATE_CACHE: dict = {}


def _get_blob(ref):
    """Per-worker-process memoized ``ray.get`` (the
    stages/join.py:_PROCESS_CACHE pattern) — one deserialize per worker
    per round instead of per batch; capped because iterative rounds mint
    a fresh ref each round."""
    key = str(ref)
    v = _STATE_CACHE.get(key)
    if v is None:
        import ray
        if len(_STATE_CACHE) > 8:
            _STATE_CACHE.clear()
        _STATE_CACHE[key] = v = ray.get(ref)
    return v


def _settle(ds, n_blocks: int):
    """Materialize an iterative round's state with a BOUNDED block count.

    Sort-based bucketed stages emit roughly one block per input block,
    and each round's union/join would otherwise COMPOUND the state's
    block count (~4x per round measured: 4 -> 24 -> 104 -> 424 blocks
    for 77 rows) until fixed per-task overhead dominates the loop.
    Coalescing to the bucket count keeps every round O(n_buckets)
    tasks regardless of round number — at cluster scale this is the
    difference between O(rounds) and O(4^rounds) scheduler pressure."""
    return ds.repartition(n_blocks).materialize()


def _settled_edges(edges, n_buckets: int | None):
    """Materialize the edge table and COALESCE it when fragmented.

    Edge inputs arriving from joins/unions (e.g. incremental_pagerank's
    parquet-log union anti-join output) can carry hundreds of tiny
    blocks, and every iterative round re-maps the whole edge table — so
    per-round cost becomes task-count-bound (a 158-block 1.2M-edge
    input measured ~5x slower per warm round than the same rows in 37
    blocks).  Returns (edges, n_edges, n_buckets)."""
    edges = edges.materialize()
    n_edges = edges.count()
    if n_buckets is None:
        n_buckets = _auto_buckets(n_edges)
    if edges.num_blocks() > 4 * n_buckets:
        edges = _settle(edges, n_buckets)
    return edges, n_edges, n_buckets



#: edge-count threshold above which ``engine="auto"`` routes the
#: iterative ops to the actor-pinned engine (stages/pregel.py): at 10M
#: edges the pinned paths measured 2-6x the Dataset rounds (scc 270.5s
#: -> 42.7s, round-4 soaks) because edges ship to shards ONCE instead
#: of re-mapping per round.  Oracle-scale inputs stay on the Dataset
#: path (the SQL-mirrored surface).
PINNED_EDGE_THRESHOLD = 2_000_000


def _route_pinned(engine: str, n_edges: int) -> bool:
    if engine == "pinned":
        return True
    if engine == "dataset":
        return False
    if engine != "auto":
        raise ValueError(
            f"engine must be 'auto'|'dataset'|'pinned', got {engine!r}")
    return n_edges >= PINNED_EDGE_THRESHOLD


def pagerank(edges, *, src: str = "src", dst: str = "dst", iters: int = 4,
             scale: int = 10 ** 12, d_num: int = 85, d_den: int = 100,
             n_buckets: int | None = None, seeds=None,
             weight_col: str | None = None, warm_state=None,
             broadcast_threshold: int = BROADCAST_NODES,
             engine: str = "auto"):
    """Exact fixed-point (optionally PERSONALIZED) PageRank; returns
    (node, outdeg, pr) with pr an int64 rank scaled by ``scale``
    (Σpr ≈ scale up to floor residue and dangling decay).

    pr_0(v)   = seed(v) * (scale // S)
    pr_i(v)   = seed(v) * base
                + (d_num * Σ_{u→v} (pr_{i-1}(u) // outdeg(u))) // d_den
    base      = ((d_den - d_num) * scale) // (d_den * S)

    ``seeds`` (a Dataset with a ``node`` column) personalizes the walk:
    teleport mass lands only on the S seed nodes — the seed-set
    expansion / trust-propagation primitive.  ``seeds=None`` means every
    node is a seed (S = N), which is classic PageRank.  The seed set is
    driver-collected and broadcast (seed sets are small by contract —
    they personalize; a billion-seed "personalization" is just global
    PageRank).  ``weight_col`` names a POSITIVE integer edge-weight
    column (w >= 1 — a zero-weight source would divide by zero on the
    SQL side): ``outdeg`` becomes the node's total out-weight W_u and
    each edge contributes ``(pr * w) // W_u`` — still exact (keep
    scale * max_weight * d_num below 2^62).  All operations are int64;
    the mirrored SQL (pipelines/queries.py ``_sql_pagerank``) computes
    the identical recurrence, so equality is exact, not approximate.

    ``warm_state`` (a Dataset with ``node``/``pr`` columns, e.g. a prior
    run's output) overrides the uniform start vector: pr_0(v) = stored
    pr(v) when present, else seed(v) * (scale // S).  The warm vector is
    what makes ``incremental_pagerank`` converge in a fraction of the
    cold-start rounds — semantics stay exactly SQL-mirrorable
    (COALESCE(prev.pr, seed * (scale // S))).  On the broadcast path the
    warm state is driver-collected (node-bounded like every per-round
    array there); on the bucketed path it enters through ONE extra
    bucketed left join, so ranks never pass through the driver.
    """
    if scale * d_num >= 1 << 62:
        raise ValueError("scale * d_num must stay below 2^62")
    edges, n_edges, n_buckets = _settled_edges(edges, n_buckets)
    if _route_pinned(engine, n_edges):
        from .pregel import pinned_pagerank

        return pinned_pagerank(edges, src=src, dst=dst, iters=iters,
                               scale=scale, d_num=d_num, d_den=d_den,
                               weight_col=weight_col, seeds=seeds,
                               warm_state=warm_state)
    nodes = node_degrees(edges, src=src, dst=dst, weight_col=weight_col,
                         n_buckets=n_buckets).materialize()
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda b: b.append_column("pr", pa.nulls(len(b), pa.int64())),
            batch_format="pyarrow",
        )
    seed_ids = None
    if seeds is not None:
        seed_ids = np.sort(np.unique(
            seeds.to_pandas()[NODE].to_numpy().astype(np.int64)))
        if len(seed_ids) == 0:
            raise ValueError("personalized pagerank needs >= 1 seed node")
    s_count = n if seed_ids is None else int(len(seed_ids))
    base = ((d_den - d_num) * scale) // (d_den * s_count)
    r0 = scale // s_count

    def _seed_flags(node_arr: np.ndarray) -> np.ndarray:
        if seed_ids is None:
            return np.ones(len(node_arr), dtype=np.int64)
        if len(node_arr) == 0:
            return np.zeros(0, dtype=np.int64)
        ix = np.minimum(np.searchsorted(seed_ids, node_arr),
                        len(seed_ids) - 1)
        return (seed_ids[ix] == node_arr).astype(np.int64)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(NODE, sort=False, as_index=False).agg(
            outdeg=("outdeg", "max"), seed=("seed", "max"), _s=("_s", "sum"))
        s = agg["_s"].to_numpy().astype(np.int64)
        sd = agg["seed"].to_numpy().astype(np.int64)
        agg["pr"] = sd * base + (d_num * s) // d_den
        return agg[[NODE, "outdeg", "seed", "pr"]]

    if n <= broadcast_threshold:
        # broadcast path: ranks live as driver arrays (node-bounded);
        # edges map in place, one execution per round
        import ray
        import ray.data as rd

        npdf = nodes.to_pandas()
        order = np.argsort(npdf[NODE].to_numpy(), kind="mergesort")
        node_sorted = npdf[NODE].to_numpy()[order].astype(np.int64)
        outdeg = npdf["outdeg"].to_numpy()[order].astype(np.int64)
        flags = _seed_flags(node_sorted)
        pr = flags * r0
        if warm_state is not None:
            wdf = warm_state.to_pandas()
            wn = wdf[NODE].to_numpy().astype(np.int64)
            wp = wdf["pr"].to_numpy().astype(np.int64)
            if len(wn):
                wo = np.argsort(wn, kind="mergesort")
                wn, wp = wn[wo], wp[wo]
                ix = np.minimum(np.searchsorted(wn, node_sorted),
                                len(wn) - 1)
                hit = wn[ix] == node_sorted
                pr = np.where(hit, wp[ix], pr)
        zeros = np.zeros(n, dtype=np.int64)
        seed_rows = rd.from_arrow(pa.table({
            NODE: pa.array(node_sorted), "outdeg": pa.array(outdeg),
            "seed": pa.array(flags), "_s": pa.array(zeros)})).materialize()

        for _ in range(iters):
            if weight_col is None:
                # unweighted: the per-node contribution is a constant —
                # precompute it on the driver, ship one array
                contrib = np.where(outdeg > 0,
                                   pr // np.maximum(outdeg, 1),
                                   0).astype(np.int64)
                ref = ray.put((node_sorted, contrib, None))
            else:
                ref = ray.put((node_sorted, pr,
                               np.maximum(outdeg, 1)))

            def edge_partial_bc(b: pa.Table, _ref=ref) -> pa.Table:
                ns, cb, ow = _get_blob(_ref)
                s = b.column(src).to_numpy(zero_copy_only=False)
                d = b.column(dst).to_numpy(zero_copy_only=False)
                ix = np.searchsorted(ns, s)
                if ow is None:
                    c = cb[ix]
                else:
                    w = b.column(weight_col).to_numpy(
                        zero_copy_only=False).astype(np.int64)
                    c = (cb[ix] * w) // ow[ix]
                df = pd.DataFrame({NODE: d, "_s": c}).groupby(
                    NODE, sort=False, as_index=False)["_s"].sum()
                m = len(df)
                return pa.table({
                    NODE: pa.array(df[NODE].to_numpy()),
                    "outdeg": pa.array(np.zeros(m, dtype=np.int64)),
                    "seed": pa.array(np.zeros(m, dtype=np.int64)),
                    "_s": pa.array(df["_s"].to_numpy().astype(np.int64)),
                })

            partials = edges.map_batches(edge_partial_bc,
                                         batch_format="pyarrow")
            res = bucketed_groupby(seed_rows.union(partials), [NODE],
                                   finalize,
                                   n_buckets=n_buckets).to_pandas()
            ro = np.argsort(res[NODE].to_numpy(), kind="mergesort")
            pr = res["pr"].to_numpy()[ro].astype(np.int64)

        return rd.from_arrow(pa.table({
            NODE: pa.array(node_sorted), "outdeg": pa.array(outdeg),
            "pr": pa.array(pr)}))

    def init_state(b: pa.Table) -> pa.Table:
        nd = b.column(NODE).to_numpy(zero_copy_only=False).astype(np.int64)
        fl = _seed_flags(nd)
        return pa.table({
            NODE: b.column(NODE), "outdeg": b.column("outdeg"),
            "seed": pa.array(fl), "pr": pa.array(fl * r0),
        })

    if warm_state is None:
        state = _settle(nodes.map_batches(init_state,
                                          batch_format="pyarrow"),
                        n_buckets)
    else:
        # ONE bucketed left join ships the prior ranks onto the node
        # universe; missing nodes fall back to the cold seed vector.
        # The left join keeps nullable int payloads exact (CLAUDE.md),
        # so pr survives at all 64 bits.
        prev = warm_state.map_batches(
            lambda b: pa.table({NODE: pc.cast(b.column(NODE), pa.int64()),
                                "_pr0": pc.cast(b.column("pr"),
                                                pa.int64())}),
            batch_format="pyarrow",
        )
        merged = bucketed_join(nodes, prev, [NODE], how="left",
                               n_buckets=n_buckets)

        def init_warm(b: pa.Table) -> pa.Table:
            nd = b.column(NODE).to_numpy(
                zero_copy_only=False).astype(np.int64)
            fl = _seed_flags(nd)
            p0 = pc.cast(b.column("_pr0"), pa.int64())
            pr0 = pc.if_else(pc.is_null(p0),
                             pa.array(fl * r0, type=pa.int64()), p0)
            return pa.table({
                NODE: pa.array(nd),
                "outdeg": pc.cast(b.column("outdeg"), pa.int64()),
                "seed": pa.array(fl), "pr": pr0,
            })

        state = _settle(merged.map_batches(init_warm,
                                           batch_format="pyarrow"),
                        n_buckets)

    def contrib_partial(b: pa.Table) -> pa.Table:
        d = b.column(dst).to_numpy(zero_copy_only=False)
        pr = b.column("pr").to_numpy(zero_copy_only=False).astype(np.int64)
        od = b.column("outdeg").to_numpy(zero_copy_only=False).astype(np.int64)
        if weight_col is None:
            c = pr // od  # od >= 1 for every src by construction
        else:
            w = b.column(weight_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            c = (pr * w) // od
        df = pd.DataFrame({NODE: d, "_s": c}).groupby(
            NODE, sort=False, as_index=False)["_s"].sum()
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    for _ in range(iters):
        joined = _propagated(edges, state, src=src, n_buckets=n_buckets)
        partials = joined.map_batches(contrib_partial, batch_format="pyarrow")
        seed_rows = state.map_batches(
            lambda b: b.select([NODE, "outdeg", "seed"]).append_column(
                "_s", pa.array(np.zeros(len(b), dtype=np.int64))),
            batch_format="pyarrow",
        )
        # contrib rows carry outdeg/seed 0 so the per-node max recovers
        # the true values from each node's single seed row
        partials = partials.map_batches(
            lambda b: pa.table({
                NODE: b.column(NODE),
                "outdeg": pa.array(np.zeros(len(b), dtype=np.int64)),
                "seed": pa.array(np.zeros(len(b), dtype=np.int64)),
                "_s": b.column("_s"),
            }),
            batch_format="pyarrow",
        )
        state = _settle(bucketed_groupby(
            seed_rows.union(partials), [NODE], finalize, n_buckets=n_buckets,
        ), n_buckets)
    return state.map_batches(
        lambda b: b.select([NODE, "outdeg", "pr"]), batch_format="pyarrow")


def incremental_pagerank(new_edges, store_dir: str, *,
                         src: str = "src", dst: str = "dst",
                         boot_iters: int = 4, delta_iters: int = 2,
                         scale: int = 10 ** 12, d_num: int = 85,
                         d_den: int = 100, n_buckets: int | None = None,
                         broadcast_threshold: int = BROADCAST_NODES,
                         engine: str = "dataset"):
    """CROSS-RUN incremental PageRank over an append-only edge log — the
    cross-run-store idea (``incremental_exact_dedup``) applied to the
    iterative graph family.  The reference has no streaming-graph
    surface at all; this is the 100-TB "edges arrive in batches" shape.

    Store layout: ``store_dir/edges/run-*/`` (append-only DISTINCT
    (src, dst) parquet log — new pairs are anti-joined against the log
    before appending, so the log stays duplicate-free by invariant) and
    ``store_dir/state/run-NNNN/`` (the latest (node, pr) vector).

    Semantics, mirrored bit-exactly by the ``delta_pagerank`` oracle:
    the FIRST run bootstraps ``boot_iters`` cold rounds over its own
    edges; every LATER run unions the stored log with the new distinct
    pairs and runs only ``delta_iters`` rounds WARM-STARTED from the
    stored ranks (nodes unseen by the store start at scale // S of the
    union graph).  Power iteration touches every edge per round by
    definition — the incremental win is ROUND COUNT (a warm vector is
    already near the fixed point) plus the rank vector persisting as
    node-bounded parquet instead of recomputing from uniform.

    Unweighted, classic teleport only (a weighted/personalized warm
    start composes the same way via ``pagerank(warm_state=...)``).

    ``engine="pinned"`` runs the warm rounds on actor-pinned edge
    shards (stages/pregel.py:pinned_pagerank) instead of Dataset BSP
    rounds — bit-identical ranks (parity-tested), ~67x the round rate
    at 10M edges; the store layout and delta semantics are unchanged,
    so the ``delta_pagerank`` oracle covers both engines.
    """
    import os
    import uuid

    import ray.data as rd

    from .hashjoin import bucketed_join

    new_pairs = distinct_tuples(
        new_edges.map_batches(lambda b: b.select([src, dst]),
                              batch_format="pyarrow"),
        [src, dst],
        n_buckets=n_buckets or 64,
    )
    edges_dir = os.path.join(store_dir, "edges")
    state_dir = os.path.join(store_dir, "state")

    def _has_parquet(d: str) -> bool:
        return os.path.isdir(d) and any(
            fn.endswith(".parquet")
            for root, _, files in os.walk(d) for fn in files
        )

    if _has_parquet(edges_dir):
        old = rd.read_parquet(edges_dir, columns=[src, dst])
        # the log is distinct by invariant: append only genuinely-new
        # pairs (at billion-edge scale put a Bloom prefilter in front of
        # this anti join, exactly like incremental_exact_dedup's
        # bloom_threshold path)
        new_pairs = bucketed_join(new_pairs, old, [src, dst], how="anti",
                                  n_buckets=n_buckets or 64).materialize()
        all_edges = old.union(new_pairs)
    else:
        new_pairs = new_pairs.materialize()
        all_edges = new_pairs

    warm = None
    if _has_parquet(state_dir):
        runs = sorted(d for d in os.listdir(state_dir)
                      if d.startswith("run-"))
        warm = rd.read_parquet(os.path.join(state_dir, runs[-1]),
                               columns=[NODE, "pr"])
    run_iters = delta_iters if warm is not None else boot_iters
    if engine == "pinned":
        from .pregel import pinned_pagerank

        res = pinned_pagerank(all_edges, src=src, dst=dst,
                              iters=run_iters, scale=scale,
                              d_num=d_num, d_den=d_den, warm_state=warm)
    else:
        res = pagerank(all_edges, src=src, dst=dst, iters=run_iters,
                       scale=scale, d_num=d_num, d_den=d_den,
                       n_buckets=n_buckets, warm_state=warm,
                       broadcast_threshold=broadcast_threshold
                       ).materialize()

    os.makedirs(edges_dir, exist_ok=True)
    new_pairs.write_parquet(
        os.path.join(edges_dir, f"run-{uuid.uuid4().hex[:12]}"))
    os.makedirs(state_dir, exist_ok=True)
    n_runs = len([d for d in os.listdir(state_dir) if d.startswith("run-")])
    res.map_batches(lambda b: b.select([NODE, "pr"]),
                    batch_format="pyarrow").write_parquet(
        os.path.join(state_dir, f"run-{n_runs:04d}"))
    return res


def connected_components(edges, *, src: str = "src", dst: str = "dst",
                         max_rounds: int = 50, n_buckets: int | None = None,
                         broadcast_threshold: int = BROADCAST_NODES,
                         engine: str = "auto"):
    """Weakly-connected components of an arbitrary edge Dataset:
    (node, comp) where comp is the MINIMUM node id of the component.

    The PUBLIC generalization of the MinHash closure
    (stages/dedup.py:lsh_group_labels, which walks doc↔LSH-bucket
    bipartite rows): edges are symmetrized, labels start as node ids,
    and each round is one edge RELAX (min-label propagation: bucketed
    join + keyed min reduce) followed by one POINTER JUMP
    (comp <- comp_of(comp)), so ``max_rounds`` bounds the reachable
    diameter at ~2^rounds, not rounds.  Raises RuntimeError instead of
    returning partial groups if the budget is still exceeded.
    Self-loops are harmless and give isolated nodes singleton
    components."""

    if engine != "dataset":
        edges = edges.materialize()
        if _route_pinned(engine, edges.count()):
            from .pregel import pinned_components

            return pinned_components(edges, src=src, dst=dst,
                             max_rounds=max_rounds)

    def symm(b: pa.Table) -> pa.Table:
        s = b.column(src).combine_chunks()
        d = b.column(dst).combine_chunks()
        return pa.table({src: pa.concat_arrays([s, d]),
                         dst: pa.concat_arrays([d, s])})

    e = edges.map_batches(symm, batch_format="pyarrow").materialize()
    if n_buckets is None:
        n_buckets = _auto_buckets(e.count())

    def node_partial(b: pa.Table) -> pa.Table:
        u = np.unique(b.column(src).to_numpy(zero_copy_only=False))
        return pa.table({NODE: pa.array(u)})

    nodes = bucketed_groupby(
        e.map_batches(node_partial, batch_format="pyarrow"),
        [NODE], lambda g: g.drop_duplicates(NODE), n_buckets=n_buckets,
    ).materialize()

    def take_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(NODE, sort=False, as_index=False)["comp"].min()

    if nodes.count() <= broadcast_threshold:
        # broadcast path: labels are driver arrays; relax maps edges in
        # place (one execution/round) and the pointer jump + fixpoint
        # test are FREE numpy gathers on the driver
        import ray
        import ray.data as rd

        node_sorted = np.sort(
            nodes.to_pandas()[NODE].to_numpy().astype(np.int64))
        comp = node_sorted.copy()
        for _ in range(max_rounds):
            ref = ray.put((node_sorted, comp))

            def relax_bc(b: pa.Table, _ref=ref) -> pa.Table:
                ns, cp = _get_blob(_ref)
                s = b.column(src).to_numpy(zero_copy_only=False)
                d = b.column(dst).to_numpy(zero_copy_only=False)
                c = cp[np.searchsorted(ns, s)]
                df = pd.DataFrame({NODE: d, "comp": c}).groupby(
                    NODE, sort=False, as_index=False)["comp"].min()
                return pa.Table.from_pandas(
                    df, preserve_index=False).replace_schema_metadata(None)

            red = bucketed_groupby(
                e.map_batches(relax_bc, batch_format="pyarrow"),
                [NODE], take_min, n_buckets=n_buckets,
            ).to_pandas()
            new = comp.copy()
            idx = np.searchsorted(node_sorted, red[NODE].to_numpy())
            new[idx] = np.minimum(new[idx],
                                  red["comp"].to_numpy().astype(np.int64))
            new = new[np.searchsorted(node_sorted, new)]  # pointer jump
            if np.array_equal(new, comp):
                return rd.from_arrow(pa.table({
                    NODE: pa.array(node_sorted), "comp": pa.array(new)}))
            comp = new
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            "relax+jump rounds (covers diameter ~2^rounds); raise "
            "max_rounds")

    state = _settle(nodes.map_batches(
        lambda b: b.append_column("comp", b.column(NODE)),
        batch_format="pyarrow",
    ), n_buckets)

    def relax_partial(b: pa.Table) -> pa.Table:
        d = b.column(dst).to_numpy(zero_copy_only=False)
        c = b.column("comp").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({NODE: d, "comp": c}).groupby(
            NODE, sort=False, as_index=False)["comp"].min()
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    # every round = RELAX (one edge hop of min-label propagation) then
    # POINTER JUMP (comp <- comp_of(comp); label-chain depth halves) —
    # the hash-to-min-style interleave, so convergence is O(log
    # diameter) rounds instead of O(diameter).  Labels are monotonically
    # non-increasing node ids, so the label sum is a one-scalar fixpoint
    # test; a fixpoint of relax+jump is per-component constant = the
    # component MIN (relax-stable => constant across every edge;
    # jump-stable + min-reachability => that constant is the min).
    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        joined = _propagated(e, state, src=src, n_buckets=n_buckets)
        relaxed = joined.map_batches(relax_partial, batch_format="pyarrow")
        state = _settle(bucketed_groupby(
            state.union(relaxed), [NODE], take_min, n_buckets=n_buckets,
        ), n_buckets)
        parent = state.map_batches(
            lambda b: pa.table({"comp": b.column(NODE),
                                "_p": b.column("comp")}),
            batch_format="pyarrow",
        )
        state = _settle(bucketed_join(
            state, parent, ["comp"], n_buckets=n_buckets,
        ).map_batches(
            lambda b: pa.table({NODE: b.column(NODE),
                                "comp": b.column("_p")}),
            batch_format="pyarrow",
        ), n_buckets)
        new_sum = state.sum("comp", ignore_nulls=False)
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            "relax+jump rounds (covers diameter ~2^rounds); raise "
            "max_rounds")
    return state


def _oriented_edges(edges, *, src: str, dst: str,
                    n_buckets: int | None,
                    broadcast_threshold: int):
    """Distinct undirected edges ORIENTED from the (degree, id)-smaller
    endpoint — the shared front half of triangle_count /
    local_clustering.  Returns (o, deg, n_buckets): o has columns
    (lo, hi, dhi), deg has (node, _c)."""
    def norm(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        m = u != v
        return pa.table({"u": pa.array(u[m]), "v": pa.array(v[m])})

    pairs = distinct_tuples(
        edges.map_batches(norm, batch_format="pyarrow"), ["u", "v"],
        n_buckets=n_buckets or 64,
    ).materialize()
    if n_buckets is None:
        n_buckets = _auto_buckets(pairs.count())

    def deg_partial(b: pa.Table) -> pa.Table:
        x = np.concatenate([
            b.column("u").to_numpy(zero_copy_only=False),
            b.column("v").to_numpy(zero_copy_only=False),
        ])
        un, c = np.unique(x, return_counts=True)
        return pa.table({NODE: pa.array(un), "_c": pa.array(c.astype(np.int64))})

    def deg_combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(NODE, sort=False, as_index=False)["_c"].sum()

    deg = bucketed_groupby(
        pairs.map_batches(deg_partial, batch_format="pyarrow"),
        [NODE], deg_combine, n_buckets=n_buckets,
    ).materialize()

    def _orient_arrays(u, v, a, c):
        swap = (c < a) | ((c == a) & (v < u))
        return pa.table({
            "lo": pa.array(np.where(swap, v, u)),
            "hi": pa.array(np.where(swap, u, v)),
            "dhi": pa.array(np.where(swap, a, c)),
        })

    if deg.count() <= broadcast_threshold:
        # the degree table is NODE-bounded: broadcast it and orient
        # inside the edge map — saves two edge-wide attach joins
        import ray

        ddf = deg.to_pandas()
        order = np.argsort(ddf[NODE].to_numpy(), kind="mergesort")
        dref = ray.put((ddf[NODE].to_numpy()[order].astype(np.int64),
                        ddf["_c"].to_numpy()[order].astype(np.int64)))

        def orient_bc(b: pa.Table, _ref=dref) -> pa.Table:
            ns, dv = _get_blob(_ref)
            u = b.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
            v = b.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
            return _orient_arrays(u, v, dv[np.searchsorted(ns, u)],
                                  dv[np.searchsorted(ns, v)])

        o = pairs.map_batches(orient_bc, batch_format="pyarrow").materialize()
    else:
        du = deg.map_batches(lambda b: b.rename_columns(["u", "_du"]),
                             batch_format="pyarrow")
        dv = deg.map_batches(lambda b: b.rename_columns(["v", "_dv"]),
                             batch_format="pyarrow")
        j = bucketed_join(
            bucketed_join(pairs, du, ["u"], n_buckets=n_buckets),
            dv, ["v"], n_buckets=n_buckets)

        def orient(b: pa.Table) -> pa.Table:
            return _orient_arrays(
                b.column("u").to_numpy(zero_copy_only=False).astype(np.int64),
                b.column("v").to_numpy(zero_copy_only=False).astype(np.int64),
                b.column("_du").to_numpy(zero_copy_only=False).astype(np.int64),
                b.column("_dv").to_numpy(zero_copy_only=False).astype(np.int64))

        o = j.map_batches(orient, batch_format="pyarrow").materialize()

    return o, deg, n_buckets


def triangle_count(edges, *, src: str = "src", dst: str = "dst",
                   n_buckets: int | None = None,
                   broadcast_threshold: int = BROADCAST_NODES,
                   engine: str = "auto"):
    """Exact global triangle count; returns a ONE-ROW Dataset {n_tri}.

    The DEGREE-ORIENTED wedge plan (the standard skew-safe distributed
    algorithm): orient every undirected edge from its (degree, id)-SMALLER
    endpoint to the larger, enumerate wedges only at each edge's lo
    endpoint (out-degree after orientation is O(sqrt(E)) even for hot
    hubs, so wedge volume is bounded by arboricity, never deg² of a
    celebrity node), then one semi join closes wedges against the
    oriented edge set.  Each triangle is counted exactly once, at its
    orientation-minimal vertex.  Wedges STREAM through the closing join —
    they are never materialized or collected."""
    if engine != "dataset":
        edges = edges.materialize()
        if _route_pinned(engine, edges.count()):
            from .pregel import pinned_triangles

            return pinned_triangles(edges, src=src, dst=dst)

    o, _deg, n_buckets = _oriented_edges(
        edges, src=src, dst=dst, n_buckets=n_buckets,
        broadcast_threshold=broadcast_threshold)

    o2 = o.map_batches(
        lambda b: b.rename_columns(["lo", "_hi2", "_dhi2"]),
        batch_format="pyarrow",
    )
    wedged = bucketed_join(o, o2, ["lo"], n_buckets=n_buckets)

    def wedge_filter(b: pa.Table) -> pa.Table:
        h1 = b.column("hi").to_numpy(zero_copy_only=False).astype(np.int64)
        d1 = b.column("dhi").to_numpy(zero_copy_only=False).astype(np.int64)
        h2 = b.column("_hi2").to_numpy(zero_copy_only=False).astype(np.int64)
        d2 = b.column("_dhi2").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (d1 < d2) | ((d1 == d2) & (h1 < h2))
        # wedge endpoints re-keyed as (lo, hi): the closing edge, if it
        # exists, is oriented exactly this way by transitivity of the
        # (degree, id) order
        return pa.table({"lo": pa.array(h1[keep]), "hi": pa.array(h2[keep])})

    wedges = wedged.map_batches(wedge_filter, batch_format="pyarrow")
    closed = bucketed_join(wedges, o, ["lo", "hi"], how="semi",
                           n_buckets=n_buckets)

    counts = closed.map_batches(
        lambda b: pa.table({"n_tri": pa.array([len(b)], pa.int64())}),
        batch_format="pyarrow",
    )
    # seed row keeps the one-row contract (schema included) even when
    # the graph is triangle-free and `closed` yields zero blocks
    import ray.data as rd
    seed = rd.from_arrow(pa.table({"n_tri": pa.array([0], pa.int64())}))

    def finalize(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        total = pc.sum(b.column("n_tri")).as_py() if len(b) else 0
        return pa.table({"n_tri": pa.array([int(total or 0)], pa.int64())})

    return counts.union(seed).repartition(1).map_batches(
        finalize, batch_format="pyarrow")


def local_clustering(edges, *, src: str = "src", dst: str = "dst",
                     n_buckets: int | None = None,
                     broadcast_threshold: int = BROADCAST_NODES):
    """PER-NODE triangle counts + local clustering coefficient
    cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) — the Watts–Strogatz local
    statistic, on the same degree-oriented skew-safe wedge plan as
    triangle_count, except each closed triangle credits ALL THREE
    vertices (the wedge keeps its center through the closing join, and
    the close is an inner-semi that preserves left payloads).  One
    bucketed count-per-node reduce + one padded LEFT join back onto
    the degree table (zero-triangle nodes keep cc = 0; masked-int
    padding keeps counts exact).  Output (node, deg, tri, cc); cc NULL
    for degree-1 nodes, float shape 2*tri / (deg*(deg-1)) both sides."""
    o, deg, n_buckets = _oriented_edges(
        edges, src=src, dst=dst, n_buckets=n_buckets,
        broadcast_threshold=broadcast_threshold)

    o2 = o.map_batches(
        lambda b: b.rename_columns(["lo", "_hi2", "_dhi2"]),
        batch_format="pyarrow",
    )
    wedged = bucketed_join(o, o2, ["lo"], n_buckets=n_buckets)

    def wedge_filter(b: pa.Table) -> pa.Table:
        c0 = b.column("lo").to_numpy(zero_copy_only=False).astype(np.int64)
        h1 = b.column("hi").to_numpy(zero_copy_only=False).astype(np.int64)
        d1 = b.column("dhi").to_numpy(zero_copy_only=False).astype(np.int64)
        h2 = b.column("_hi2").to_numpy(zero_copy_only=False).astype(np.int64)
        d2 = b.column("_dhi2").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (d1 < d2) | ((d1 == d2) & (h1 < h2))
        return pa.table({"ctr": pa.array(c0[keep]),
                         "lo": pa.array(h1[keep]),
                         "hi": pa.array(h2[keep])})

    wedges = wedged.map_batches(wedge_filter, batch_format="pyarrow")
    closed = bucketed_join(wedges, o, ["lo", "hi"], how="semi",
                           n_buckets=n_buckets)

    def credit(b: pa.Table) -> pa.Table:
        x = np.concatenate([
            b.column("ctr").to_numpy(zero_copy_only=False),
            b.column("lo").to_numpy(zero_copy_only=False),
            b.column("hi").to_numpy(zero_copy_only=False),
        ]).astype(np.int64)
        u, c = np.unique(x, return_counts=True)
        return pa.table({NODE: pa.array(u),
                         "_t": pa.array(c.astype(np.int64))})

    def tri_combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(NODE, sort=False, as_index=False)["_t"].sum()

    tric = bucketed_groupby(
        closed.map_batches(credit, batch_format="pyarrow"),
        [NODE], tri_combine, n_buckets=n_buckets)

    j = bucketed_join(deg, tric, [NODE], how="left", n_buckets=n_buckets)

    def fin(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = b.column("_c").to_numpy(zero_copy_only=False).astype(np.int64)
        t = pc.fill_null(b.column("_t"), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        den = d * (d - 1)
        cc = np.where(den > 0,
                      (2 * t).astype(np.float64)
                      / np.where(den > 0, den, 1).astype(np.float64),
                      np.nan)
        return pa.table({
            NODE: b.column(NODE),
            "deg": pa.array(d),
            "tri": pa.array(t),
            "cc": pa.array(np.where(den > 0, cc, np.nan), pa.float64(),
                           from_pandas=True),
        })

    return j.map_batches(fin, batch_format="pyarrow")


def diameter_double_sweep(edges, *, src: str = "src", dst: str = "dst",
                          max_hops: int = 12,
                          n_buckets: int | None = None) -> pa.Table:
    """DOUBLE-SWEEP diameter lower bound (Magnien-Latapy-Habib): BFS
    from the minimum node id, then BFS again from the farthest node
    reached (ties to the smallest id) — max eccentricity observed is a
    LOWER bound on the undirected diameter (exact on trees, near-exact
    on real-world graphs).  Two bfs_hops runs on the symmetrized edge
    set; each BFS's reached frontier is node-bounded, so the argmax is
    a tiny driver reduce.  Distances cap at ``max_hops`` (mirrored by
    the oracle, so the bound stays bit-identical).  One row:
    (start, ecc1, far_node, ecc2, diameter_lb)."""
    import ray.data as rd

    def symm(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([s, d])),
            "dst": pa.array(np.concatenate([d, s])),
        })

    sym = distinct_tuples(
        edges.map_batches(symm, batch_format="pyarrow"),
        ["src", "dst"], n_buckets=n_buckets or 32).materialize()

    def node_min(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False)
        return pa.table({"m": pa.array(
            [int(s.min())] if len(s) else [], pa.int64())})

    mins = sym.map_batches(node_min,
                           batch_format="pyarrow").to_pandas()
    if not len(mins):
        return pa.table({c: pa.array([], pa.int64()) for c in
                         ("start", "ecc1", "far_node", "ecc2",
                          "diameter_lb")})
    start = int(mins["m"].min())

    def sweep(seed: int):
        seeds = rd.from_arrow(
            pa.table({"node": pa.array([seed], pa.int64())}))
        df = bfs_hops(sym, seeds, max_hops=max_hops,
                      n_buckets=n_buckets).to_pandas()
        ecc = int(df["dist"].max())
        far = int(df.loc[df["dist"] == ecc, "node"].min())
        return ecc, far

    ecc1, far1 = sweep(start)
    ecc2, _far2 = sweep(far1)
    return pa.table({
        "start": pa.array([start], pa.int64()),
        "ecc1": pa.array([ecc1], pa.int64()),
        "far_node": pa.array([far1], pa.int64()),
        "ecc2": pa.array([ecc2], pa.int64()),
        "diameter_lb": pa.array([max(ecc1, ecc2)], pa.int64()),
    })


def _undirected_deg(edges, *, src: str, dst: str, n_buckets: int):
    """(distinct undirected pairs Dataset, degree Dataset (node, _c))
    — the shared front of rich_club / powerlaw_alpha."""
    def norm(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        m = u != v
        return pa.table({"u": pa.array(u[m]), "v": pa.array(v[m])})

    pairs = distinct_tuples(
        edges.map_batches(norm, batch_format="pyarrow"), ["u", "v"],
        n_buckets=n_buckets).materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        x = np.concatenate([
            b.column("u").to_numpy(zero_copy_only=False),
            b.column("v").to_numpy(zero_copy_only=False),
        ])
        un, c = np.unique(x, return_counts=True)
        return pa.table({NODE: pa.array(un),
                         "_c": pa.array(c.astype(np.int64))})

    deg = bucketed_groupby(
        pairs.map_batches(deg_partial, batch_format="pyarrow"),
        [NODE],
        lambda g: g.groupby(NODE, sort=False, as_index=False)["_c"].sum(),
        n_buckets=n_buckets)
    return pairs, deg


def rich_club(edges, *, ks: list[int], src: str = "src",
              dst: str = "dst", n_buckets: int = 16) -> pa.Table:
    """Rich-club coefficient phi(k) = 2*E_k / (N_k*(N_k-1)): the
    density of the subgraph induced by nodes with degree > k, for each
    threshold in ``ks`` (Colizza et al. 2006).  Degree table is
    node-bounded -> broadcast (sorted arrays via ray.put); one counting
    map over the distinct edge stream accumulates E_k partials per
    block, integers end to end; phi is one shared float division.
    Output (k, n_k, e_k, phi)."""
    import ray

    pairs, deg = _undirected_deg(edges, src=src, dst=dst,
                                 n_buckets=n_buckets)
    ddf = deg.to_pandas()
    nodes_ = ddf[NODE].to_numpy().astype(np.int64)
    order = np.argsort(nodes_, kind="mergesort")
    nodes_, degs_ = nodes_[order], \
        ddf["_c"].to_numpy().astype(np.int64)[order]
    ks_arr = np.asarray(sorted(ks), dtype=np.int64)
    n_k = [int((degs_ > k).sum()) for k in ks_arr.tolist()]
    ref = ray.put((nodes_, degs_)) if ray.is_initialized() \
        else (nodes_, degs_)

    def count_ek(b: pa.Table, _ref=ref) -> pa.Table:
        ns, dv = _get_blob(_ref)
        u = b.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = b.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        du = dv[np.searchsorted(ns, u)]
        dw = dv[np.searchsorted(ns, v)]
        both_min = np.minimum(du, dw)
        ek = [int((both_min > k).sum()) for k in ks_arr.tolist()]
        return pa.table({"k": pa.array(ks_arr),
                         "e": pa.array(np.asarray(ek, dtype=np.int64))})

    parts = pairs.map_batches(count_ek, batch_format="pyarrow") \
        .to_pandas()
    e_k = parts.groupby("k")["e"].sum()
    rows_k, rows_n, rows_e, rows_phi = [], [], [], []
    for k, nk in zip(ks_arr.tolist(), n_k):
        ek = int(e_k.get(k, 0))
        rows_k.append(k)
        rows_n.append(nk)
        rows_e.append(ek)
        rows_phi.append(float(2 * ek) / float(nk * (nk - 1))
                        if nk >= 2 else None)
    return pa.table({
        "k": pa.array(rows_k, pa.int64()),
        "n_k": pa.array(rows_n, pa.int64()),
        "e_k": pa.array(rows_e, pa.int64()),
        "phi": pa.array(rows_phi, pa.float64()),
    })


def powerlaw_alpha(edges, *, dmin: int = 2, src: str = "src",
                   dst: str = "dst", n_buckets: int = 16,
                   ln_scale: int = 1 << 16) -> pa.Table:
    """Quantized-ln MLE power-law exponent of the degree distribution
    (Clauset-Shalizi-Newman continuous approximation, deterministic
    variant): over nodes with deg >= dmin,

        denom = SUM floor(ln(d)*2^16) - m*floor(ln(dmin)*2^16)  (int)
        alpha = 1.0 + m*2^16 / denom                    (one division)

    math.log == DuckDB ln bit-for-bit on this glibc (the approx_users
    precedent), so the per-degree quantized terms are identical
    integers on both sides.  Output one row (dmin, m, denom, alpha)."""
    import math

    _pairs, deg = _undirected_deg(edges, src=src, dst=dst,
                                  n_buckets=n_buckets)
    ddf = deg.to_pandas()
    degs_ = ddf["_c"].to_numpy().astype(np.int64)
    u, c = np.unique(degs_[degs_ >= dmin], return_counts=True)
    m = int(c.sum())
    lqmin = math.floor(math.log(float(dmin)) * float(ln_scale))
    denom = int(sum(
        int(cnt) * (math.floor(math.log(float(d)) * float(ln_scale))
                    - lqmin)
        for d, cnt in zip(u.tolist(), c.tolist())))
    alpha = (1.0 + (float(m) * float(ln_scale)) / float(denom)) \
        if denom > 0 else None
    return pa.table({
        "dmin": pa.array([dmin], pa.int64()),
        "m": pa.array([m], pa.int64()),
        "denom": pa.array([denom], pa.int64()),
        "alpha": pa.array([alpha], pa.float64()),
    })


def kcore(edges, *, k: int, rounds: int, src: str = "src",
          dst: str = "dst", n_buckets: int | None = None,
          broadcast_threshold: int = BROADCAST_NODES,
          engine: str = "auto"):
    """SYNCHRONOUS k-core peeling for a FIXED number of rounds: each
    round recomputes every surviving node's degree among surviving
    neighbors and drops nodes with degree < k.  Returns (node, deg) for
    the survivors of round ``rounds`` with their within-survivor degree.

    Fixed-round semantics (not run-to-fixpoint) so the chained-CTE SQL
    oracle mirrors it term for term; once peeling stabilizes, extra
    rounds are no-ops, so for any graph whose peel sequence settles
    within ``rounds`` this IS the k-core.  Round shape: two bucketed
    SEMI joins keep edges whose BOTH endpoints survive (edges stream,
    survivors are the small side), one combiner-first degree reduce —
    the same BSP discipline as pagerank/bfs, with `_settle` bounding
    block growth."""
    if rounds < 1:
        raise ValueError("kcore needs rounds >= 1")
    if engine != "dataset":
        edges = edges.materialize()
        if _route_pinned(engine, edges.count()):
            from .pregel import pinned_kcore

            return pinned_kcore(edges, k=k, rounds=rounds,
                        src=src, dst=dst)

    def symm(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d
        s, d = s[m], d[m]
        return pa.table({"u": pa.array(np.concatenate([s, d])),
                         "v": pa.array(np.concatenate([d, s]))})

    # distinct symmetric edges so degree counts each neighbor once
    e = distinct_tuples(
        edges.map_batches(symm, batch_format="pyarrow"), ["u", "v"],
        n_buckets=n_buckets or 64,
    ).materialize()
    n_edges = e.count()
    if n_buckets is None:
        n_buckets = _auto_buckets(n_edges)

    def deg_combine_named(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(NODE, sort=False, as_index=False)["_c"].sum()
        return out.rename(columns={"_c": "deg"})

    if n_edges <= broadcast_threshold:
        # broadcast path: the survivor set is a driver array; the
        # alive-edge filter runs inside the edge map via searchsorted
        # membership — one execution per round, edges never re-shuffle
        import ray
        import ray.data as rd

        surv = None  # None = all alive in round 1
        node_out = deg_out = None
        for _ in range(rounds):
            if surv is not None and len(surv) == 0:
                break  # empty core is a fixpoint — later rounds no-op
            ref = ray.put(surv)

            def alive_deg_partial(b: pa.Table, _ref=ref) -> pa.Table:
                sv = _get_blob(_ref)
                u = b.column("u").to_numpy(zero_copy_only=False)
                v = b.column("v").to_numpy(zero_copy_only=False)
                if sv is not None:
                    if len(sv) == 0:
                        return pa.table({NODE: pa.array([], pa.int64()),
                                         "_c": pa.array([], pa.int64())})
                    iu = np.minimum(np.searchsorted(sv, u), len(sv) - 1)
                    iv = np.minimum(np.searchsorted(sv, v), len(sv) - 1)
                    m = (sv[iu] == u) & (sv[iv] == v)
                    u = u[m]
                un, c = np.unique(u, return_counts=True)
                return pa.table({NODE: pa.array(un),
                                 "_c": pa.array(c.astype(np.int64))})

            red = bucketed_groupby(
                e.map_batches(alive_deg_partial, batch_format="pyarrow"),
                [NODE], deg_combine_named, n_buckets=n_buckets,
            ).to_pandas()
            if "deg" not in red.columns:
                # a fully-peeled round yields zero blocks, and the empty
                # frame loses its columns — a legitimate empty k-core
                red = pd.DataFrame({NODE: np.array([], np.int64),
                                    "deg": np.array([], np.int64)})
            keep = red[red["deg"] >= k].sort_values(NODE, kind="mergesort")
            node_out = keep[NODE].to_numpy().astype(np.int64)
            deg_out = keep["deg"].to_numpy().astype(np.int64)
            surv = node_out
        return rd.from_arrow(pa.table({NODE: pa.array(node_out),
                                       "deg": pa.array(deg_out)}))

    def deg_partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(b.column("u").to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({NODE: pa.array(u),
                         "_c": pa.array(c.astype(np.int64))})

    def degrees(ed):
        return bucketed_groupby(
            ed.map_batches(deg_partial, batch_format="pyarrow"),
            [NODE], deg_combine_named, n_buckets=n_buckets,
        )

    import ray.data as rd

    empty_core = pa.table({NODE: pa.array([], pa.int64()),
                           "deg": pa.array([], pa.int64())})
    survivors = None  # None = all nodes alive (round 1 skips the semis)
    state = None
    for _ in range(rounds):
        alive = e
        if survivors is not None:
            su = survivors.map_batches(
                lambda b: b.select([NODE]).rename_columns(["u"]),
                batch_format="pyarrow")
            sv = survivors.map_batches(
                lambda b: b.select([NODE]).rename_columns(["v"]),
                batch_format="pyarrow")
            alive = bucketed_join(
                bucketed_join(e, su, ["u"], how="semi", n_buckets=n_buckets),
                sv, ["v"], how="semi", n_buckets=n_buckets)
        deg = degrees(alive)
        state = _settle(deg.map_batches(
            lambda b: b.filter(
                pc.greater_equal(b.column("deg"), pa.scalar(k, pa.int64()))),
            batch_format="pyarrow",
        ), n_buckets)
        if state.count() == 0:
            # legitimate empty k-core: later rounds would feed a
            # schema-less survivor set into the semi joins — return a
            # TYPED empty (node, deg) dataset instead
            return rd.from_arrow(empty_core)
        survivors = state
    return state


def common_neighbors(edges, *, src: str = "src", dst: str = "dst",
                     max_degree: int = 16, min_common: int = 2,
                     n_buckets: int | None = None,
                     broadcast_threshold: int = BROADCAST_NODES,
                     scores: bool = False, aa: bool = False,
                     engine: str = "auto"):
    """Per-pair COMMON-NEIGHBOR counts — the classic link-prediction /
    who-to-crawl-next feature: (u, v, n_common) for unordered pairs
    u < v that share >= ``min_common`` neighbors.

    Wedges are enumerated at every center with degree <= ``max_degree``
    (the standard hub guard: a celebrity center contributes deg² wedges;
    capped centers are excluded IDENTICALLY on both oracle sides, so the
    semantics stay exact — raise the cap when hubs matter more than
    cost).  Shape: one bucketed self-join on the center key, per-batch
    pair-count partials, one bucketed sum — pair volume is bounded by
    Σ_{deg(z)<=D} deg(z)²/2.

    ``aa=True`` additionally sums the two degree-weighted wedge scores —
    Adamic–Adar Σ 1/ln(deg z) and resource allocation Σ 1/deg z — as
    QUANTIZED int64 partials (per-center weight floor(2^16/ln d) /
    2^16//d, looked up from a d<=max_degree table precomputed with
    math.log, which is bit-identical to DuckDB ln on this glibc; the
    ndcg inline-constant discipline), so the sums are order-free and the
    float finale is one exact /65536.0 rescale on both oracle sides."""
    if engine != "dataset" and not scores and not aa:
        edges = edges.materialize()
        if _route_pinned(engine, edges.count()):
            from .pregel import pinned_common_neighbors

            return pinned_common_neighbors(
                edges, src=src, dst=dst, max_degree=max_degree,
                min_common=min_common)

    if aa:
        import math

        waa_tab = np.zeros(max_degree + 1, dtype=np.int64)
        wra_tab = np.zeros(max_degree + 1, dtype=np.int64)
        for d in range(1, max_degree + 1):
            if d >= 2:
                waa_tab[d] = int((1 << 16) / math.log(d))
            wra_tab[d] = (1 << 16) // d

    def norm(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        m = u != v
        return pa.table({"u": pa.array(u[m]), "v": pa.array(v[m])})

    pairs = distinct_tuples(
        edges.map_batches(norm, batch_format="pyarrow"), ["u", "v"],
        n_buckets=n_buckets or 64,
    ).materialize()
    if n_buckets is None:
        n_buckets = _auto_buckets(pairs.count())

    def symm_adj(b: pa.Table) -> pa.Table:
        u = b.column("u").combine_chunks()
        v = b.column("v").combine_chunks()
        return pa.table({"z": pa.concat_arrays([u, v]),
                         "nb": pa.concat_arrays([v, u])})

    adj = pairs.map_batches(symm_adj, batch_format="pyarrow").materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        z, c = np.unique(b.column("z").to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({NODE: pa.array(z),
                         "_c": pa.array(c.astype(np.int64))})

    deg = bucketed_groupby(
        adj.map_batches(deg_partial, batch_format="pyarrow"),
        [NODE],
        lambda g: g.groupby(NODE, sort=False, as_index=False)["_c"].sum(),
        n_buckets=n_buckets,
    ).materialize()

    use_broadcast = deg.count() <= broadcast_threshold
    dref = None
    if use_broadcast:
        import ray

        ddf = deg.to_pandas()
        order = np.argsort(ddf[NODE].to_numpy(), kind="mergesort")
        dref = ray.put((ddf[NODE].to_numpy()[order].astype(np.int64),
                        ddf["_c"].to_numpy()[order].astype(np.int64)))

    if use_broadcast:

        def center_filter(b: pa.Table, _ref=dref) -> pa.Table:
            ns, dv = _get_blob(_ref)
            z = b.column("z").to_numpy(zero_copy_only=False)
            d = dv[np.searchsorted(ns, z)]
            keep = d <= max_degree
            t = b.filter(pa.array(keep))
            if aa:
                dk = d[keep]
                t = t.append_column("_waa", pa.array(waa_tab[dk]))
                t = t.append_column("_wra", pa.array(wra_tab[dk]))
            return t

        kept = adj.map_batches(center_filter, batch_format="pyarrow")
    elif aa:
        def small_weights(b: pa.Table) -> pa.Table:
            t = b.filter(pc.less_equal(
                b.column("_c"), pa.scalar(max_degree, pa.int64())))
            d = t.column("_c").to_numpy(zero_copy_only=False)
            return pa.table({"z": t.column(NODE),
                             "_waa": pa.array(waa_tab[d]),
                             "_wra": pa.array(wra_tab[d])})

        small = deg.map_batches(small_weights, batch_format="pyarrow")
        kept = bucketed_join(adj, small, ["z"], n_buckets=n_buckets)
    else:
        small = deg.map_batches(
            lambda b: b.filter(pc.less_equal(
                b.column("_c"), pa.scalar(max_degree, pa.int64()))
            ).select([NODE]).rename_columns(["z"]),
            batch_format="pyarrow",
        )
        kept = bucketed_join(adj, small, ["z"], how="semi",
                             n_buckets=n_buckets)

    nb2 = kept.map_batches(
        lambda b: b.select(["z", "nb"]).rename_columns(["z", "_nb2"]),
        batch_format="pyarrow")
    wedged = bucketed_join(kept, nb2, ["z"], n_buckets=n_buckets)

    def pair_partial(b: pa.Table) -> pa.Table:
        a = b.column("nb").to_numpy(zero_copy_only=False).astype(np.int64)
        c = b.column("_nb2").to_numpy(zero_copy_only=False).astype(np.int64)
        m = a < c
        df = pd.DataFrame({"u": a[m], "v": c[m]})
        df["n_common"] = np.int64(1)
        if aa:
            df["aa_q"] = b.column("_waa").to_numpy(
                zero_copy_only=False).astype(np.int64)[m]
            df["ra_q"] = b.column("_wra").to_numpy(
                zero_copy_only=False).astype(np.int64)[m]
        agg = df.groupby(["u", "v"], sort=False, as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False) \
            .replace_schema_metadata(None)

    sum_cols = ["n_common"] + (["aa_q", "ra_q"] if aa else [])

    def pair_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["u", "v"], sort=False, as_index=False)[
            sum_cols].sum()
        return out[out["n_common"] >= min_common]

    cn = bucketed_groupby(
        wedged.map_batches(pair_partial, batch_format="pyarrow"),
        ["u", "v"], pair_sum, n_buckets=n_buckets,
    )
    if aa:
        def add_aa(b: pa.Table) -> pa.Table:
            q1 = b.column("aa_q").to_numpy(zero_copy_only=False)
            q2 = b.column("ra_q").to_numpy(zero_copy_only=False)
            b = b.append_column(
                "aa", pa.array(q1.astype(np.float64) / 65536.0))
            return b.append_column(
                "ra", pa.array(q2.astype(np.float64) / 65536.0))

        cn = cn.map_batches(add_aa, batch_format="pyarrow")
    if not scores:
        return cn

    # Link-prediction scores per surviving pair: Jaccard coefficient
    # n_common / (deg(u) + deg(v) - n_common) — ONE int64/int64 division,
    # so the double is the correctly-rounded quotient on both oracle
    # sides — and preferential attachment deg(u) * deg(v) (pure int64).
    # Degrees are TRUE degrees over the full undirected graph (the hub
    # guard only caps wedge CENTERS; a hub common neighbor is skipped
    # identically in the SQL, so n_common stays mirror-exact).
    if use_broadcast:

        def add_scores(b: pa.Table, _ref=dref) -> pa.Table:
            ns, dv = _get_blob(_ref)
            u = b.column("u").to_numpy(zero_copy_only=False)
            v = b.column("v").to_numpy(zero_copy_only=False)
            c = b.column("n_common").to_numpy(zero_copy_only=False)
            du = dv[np.searchsorted(ns, u)]
            dw = dv[np.searchsorted(ns, v)]
            union = du + dw - c
            return pa.table({
                "u": pa.array(u), "v": pa.array(v),
                "n_common": pa.array(c),
                "jaccard": pa.array(c.astype(np.float64)
                                    / union.astype(np.float64)),
                "pa_score": pa.array(du * dw),
            })

        return cn.map_batches(add_scores, batch_format="pyarrow")

    # large-graph path: two bucketed joins ship only the bounded cn
    # pairs + the (node, deg) table — never the edges
    du_t = deg.map_batches(
        lambda b: b.rename_columns(["u", "_du"]), batch_format="pyarrow")
    dv_t = deg.map_batches(
        lambda b: b.rename_columns(["v", "_dv"]), batch_format="pyarrow")
    j = bucketed_join(cn, du_t, ["u"], n_buckets=n_buckets)
    j = bucketed_join(j, dv_t, ["v"], n_buckets=n_buckets)

    def finish(b: pa.Table) -> pa.Table:
        c = b.column("n_common").to_numpy(zero_copy_only=False)
        du = b.column("_du").to_numpy(zero_copy_only=False)
        dw = b.column("_dv").to_numpy(zero_copy_only=False)
        union = du + dw - c
        return pa.table({
            "u": b.column("u"), "v": b.column("v"),
            "n_common": b.column("n_common"),
            "jaccard": pa.array(c.astype(np.float64)
                                / union.astype(np.float64)),
            "pa_score": pa.array((du * dw).astype(np.int64)),
        })

    return j.map_batches(finish, batch_format="pyarrow")


def bfs_hops(edges, seeds, *, src: str = "src", dst: str = "dst",
             max_hops: int = 3, n_buckets: int | None = None,
             broadcast_threshold: int = BROADCAST_NODES,
             engine: str = "auto"):
    """Multi-source bounded-hop BFS: (node, dist) for every node whose
    shortest hop count from ANY seed is <= max_hops.

    ``seeds`` is a Dataset with a ``node`` column (dist 0).  Round i
    relaxes every edge once: dist_i(v) = min(dist_{i-1}(v),
    min_{u→v} dist_{i-1}(u) + 1) — after round i every node within i
    hops holds its exact distance (standard Bellman-Ford layering), so
    ``max_hops`` rounds are sufficient AND mirror the chained-CTE SQL
    oracle term for term.  The broadcast path is FRONTIER-DELTA: unit
    hops make a node's distance final at first reach, so each round
    ships only the newly-settled frontier and the walk stops early when
    it empties — same results, shrinking blobs.  The bucketed path ships
    the whole (node, dist) table (frontier bookkeeping there would cost
    an extra shuffle per round).
    """
    edges, n_edges, n_buckets = _settled_edges(edges, n_buckets)
    if _route_pinned(engine, n_edges):
        from .pregel import pinned_bfs

        return pinned_bfs(edges, seeds, src=src, dst=dst,
                          max_hops=max_hops)

    def take_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(NODE, sort=False, as_index=False)["dist"].min()

    # reachable-set size is bounded by 2 * edge rows, so the edge count
    # is a safe proxy for the node-bounded broadcast decision
    if n_edges <= broadcast_threshold:
        import ray
        import ray.data as rd

        sdf = seeds.to_pandas()
        known = np.sort(np.unique(sdf[NODE].to_numpy().astype(np.int64)))
        dist = np.zeros(len(known), dtype=np.int64)
        # FRONTIER-DELTA: with unit hop weights a node's distance is
        # FINAL the first time it is reached, so round i only needs to
        # relax edges whose source joined `known` in round i-1.  The
        # broadcast blob therefore shrinks to the active frontier, and
        # the walk stops early once the frontier empties.
        frontier = known
        fdist = dist
        for _ in range(max_hops):
            if len(frontier) == 0:
                break
            ref = ray.put((frontier, fdist))

            def relax_bc(b: pa.Table, _ref=ref) -> pa.Table:
                ns, dv = _get_blob(_ref)
                s = b.column(src).to_numpy(zero_copy_only=False)
                d = b.column(dst).to_numpy(zero_copy_only=False)
                idx_c = np.minimum(np.searchsorted(ns, s), len(ns) - 1)
                m = ns[idx_c] == s
                df = pd.DataFrame({NODE: d[m], "dist": dv[idx_c[m]] + 1}
                                  ).groupby(NODE, sort=False,
                                            as_index=False)["dist"].min()
                return pa.Table.from_pandas(
                    df, preserve_index=False).replace_schema_metadata(None)

            red = bucketed_groupby(
                edges.map_batches(relax_bc, batch_format="pyarrow"),
                [NODE], take_min, n_buckets=n_buckets,
            ).to_pandas()
            if len(red) == 0:
                # frontier of pure sinks: relax emits nothing and the
                # empty frame has no columns — the walk is done
                break
            rn = red[NODE].to_numpy().astype(np.int64)
            rdist = red["dist"].to_numpy().astype(np.int64)
            # new frontier = reached nodes NOT already known
            ik = np.minimum(np.searchsorted(known, rn),
                            max(len(known) - 1, 0))
            fresh = (known[ik] != rn) if len(known) \
                else np.ones(len(rn), dtype=bool)
            frontier = rn[fresh]
            fdist = rdist[fresh]
            order = np.argsort(frontier, kind="mergesort")
            frontier, fdist = frontier[order], fdist[order]
            merged = np.concatenate([known, frontier])
            mdist = np.concatenate([dist, fdist])
            mo = np.argsort(merged, kind="mergesort")
            known, dist = merged[mo], mdist[mo]
        return rd.from_arrow(pa.table({NODE: pa.array(known),
                                       "dist": pa.array(dist)}))

    state = _settle(seeds.map_batches(
        lambda b: pa.table({
            NODE: b.column(NODE),
            "dist": pa.array(np.zeros(len(b), dtype=np.int64)),
        }),
        batch_format="pyarrow",
    ), n_buckets)

    def relax_partial(b: pa.Table) -> pa.Table:
        d = b.column(dst).to_numpy(zero_copy_only=False)
        dist = b.column("dist").to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({NODE: d, "dist": dist + 1}).groupby(
            NODE, sort=False, as_index=False)["dist"].min()
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    # unit-hop BFS distances are final at first reach, so an unchanged
    # (count, dist-sum) pair is a fixpoint — stop early instead of
    # spending (and chaining plans for) the full max_hops budget when
    # the reachable set saturates sooner
    prev = None
    for _ in range(max_hops):
        joined = _propagated(edges, state, src=src, n_buckets=n_buckets)
        relaxed = joined.map_batches(relax_partial, batch_format="pyarrow")
        state = _settle(bucketed_groupby(
            state.union(relaxed), [NODE], take_min, n_buckets=n_buckets,
        ), n_buckets)
        cur = (state.count(), state.sum("dist", ignore_nulls=False))
        if cur == prev:
            break
        prev = cur
    return state


def _truss_decrement(ku, kv, ks, du, dv, chunk_expansion: int = 4_000_000):
    """Batch-DECREMENTAL k-truss support update (driver-side numpy, the
    broadcast regime's round-2+ kernel — the truss-decomposition trick).

    Inputs: survivors (ku, kv, ks) whose supports ``ks`` were counted
    over the edge set S = keep ∪ drop, and the dropped edges (du, dv).
    Returns the survivors' supports counted over keep alone: old support
    minus the number of S-triangles through the edge touching >= 1
    dropped edge.  Rounds after the first cost O(|D| * deg(D)) instead of
    a full wedge recount — and a stabilized peel costs nothing.

    Triangles are enumerated from each dropped edge (common-neighbor
    lookup against S's CSR, expansion chunked to bound memory), deduped
    GLOBALLY (a triangle with 2-3 dropped edges is found once per dropped
    edge but must decrement each surviving edge exactly ONCE), then the
    surviving edges' decrements aggregate via one np.unique.  All keys
    are dense-rank packed (rank * n + rank <= 2^44 at the 2M-edge
    broadcast cap) so everything stays exact int64.
    """
    ku = np.asarray(ku, np.int64)
    kv = np.asarray(kv, np.int64)
    ks = np.asarray(ks, np.int64)
    du = np.asarray(du, np.int64)
    dv = np.asarray(dv, np.int64)
    if len(du) == 0 or len(ku) == 0:
        return ks.copy()
    au = np.concatenate([ku, du])
    av = np.concatenate([kv, dv])
    nodes, inv = np.unique(np.concatenate([au, av]), return_inverse=True)
    ra, rb = inv[:len(au)], inv[len(au):]
    nn = np.int64(len(nodes))
    # CSR over S, both directions
    aa = np.concatenate([ra, rb])
    bb = np.concatenate([rb, ra])
    o = np.lexsort((bb, aa))
    aa, bb = aa[o], bb[o]
    starts = np.searchsorted(aa, np.arange(nn))
    deg = np.searchsorted(aa, np.arange(nn), side="right") - starts
    kset = np.sort(ra * nn + rb)          # ranks preserve u < v order
    da, db = ra[len(ku):], rb[len(ku):]
    dset = np.sort(da * nn + db)
    low = deg[da] <= deg[db]
    x = np.where(low, da, db)             # enumerate from the low-degree end
    ot = np.where(low, db, da)
    cnt = deg[x]
    cum = np.cumsum(cnt)
    bounds = [0]
    while bounds[-1] < len(cnt):
        s0 = bounds[-1]
        base = int(cum[s0 - 1]) if s0 else 0
        e0 = int(np.searchsorted(cum, base + chunk_expansion)) + 1
        bounds.append(min(max(e0, s0 + 1), len(cnt)))
    t12s, t3s = [], []
    for s0, e0 in zip(bounds[:-1], bounds[1:]):
        xs, os_, cs = x[s0:e0], ot[s0:e0], cnt[s0:e0]
        das, dbs = da[s0:e0], db[s0:e0]
        total = int(cs.sum())
        if total == 0:
            continue
        offs = np.concatenate([[0], np.cumsum(cs)[:-1]])
        pos = np.arange(total) - np.repeat(offs, cs) + np.repeat(starts[xs], cs)
        cand = bb[pos]
        a_r = np.repeat(das, cs)
        b_r = np.repeat(dbs, cs)
        o_r = np.repeat(os_, cs)
        key = np.minimum(cand, o_r) * nn + np.maximum(cand, o_r)
        ix = np.minimum(np.searchsorted(kset, key), len(kset) - 1)
        hit = (kset[ix] == key) & (cand != o_r)
        if not hit.any():
            continue
        a_r, b_r, c_r = a_r[hit], b_r[hit], cand[hit]
        r1 = np.minimum(np.minimum(a_r, b_r), c_r)
        r3 = np.maximum(np.maximum(a_r, b_r), c_r)
        r2 = a_r + b_r + c_r - r1 - r3
        t12s.append(r1 * nn + r2)
        t3s.append(r3)
    if not t12s:
        return ks.copy()
    k12 = np.concatenate(t12s)
    k3 = np.concatenate(t3s)
    o = np.lexsort((k3, k12))
    k12, k3 = k12[o], k3[o]
    first = np.ones(len(k12), bool)
    first[1:] = (k12[1:] != k12[:-1]) | (k3[1:] != k3[:-1])
    k12, k3 = k12[first], k3[first]
    r1, r2, r3 = k12 // nn, k12 % nn, k3
    ekeys = np.concatenate([r1 * nn + r2, r1 * nn + r3, r2 * nn + r3])
    ix = np.minimum(np.searchsorted(dset, ekeys), len(dset) - 1)
    ekeys = ekeys[dset[ix] != ekeys]      # dropped edges need no decrement
    if len(ekeys) == 0:
        return ks.copy()
    uk, uc = np.unique(ekeys, return_counts=True)
    keep_keys = ra[:len(ku)] * nn + rb[:len(ku)]
    out = ks.copy()
    ix = np.minimum(np.searchsorted(uk, keep_keys), len(uk) - 1)
    m = uk[ix] == keep_keys
    out[m] -= uc[ix[m]]
    return out


def ktruss(edges, *, k: int, rounds: int, src: str = "src",
           dst: str = "dst", n_buckets: int | None = None,
           broadcast_threshold: int = BROADCAST_NODES,
           engine: str = "auto"):
    """SYNCHRONOUS k-truss peeling for a FIXED number of rounds: each
    round computes every surviving edge's triangle SUPPORT (triangles
    within the surviving edge set) and drops edges with support < k-2.
    Returns (u, v, support) for the canonical (u < v) edges surviving
    round ``rounds`` with that round's support — fixed-round semantics
    so the chained-CTE SQL oracle mirrors it term for term (the same
    discipline as :func:`kcore`); once peeling stabilizes, extra rounds
    are no-ops, so any graph whose peel settles within ``rounds`` gets
    its true k-truss.

    Round shape: degree-oriented wedge enumeration (the triangle_count
    hub guard — wedges only at each edge's (degree, id)-smaller
    endpoint, volume bounded by arboricity) with the wedge CENTER
    carried through the closing semi join; each closed triangle
    explodes to its three canonical edges, a combiner-first bucketed
    sum yields per-edge support, one inner join filters survivors.
    The degree table is node-bounded, so it broadcasts below
    ``broadcast_threshold`` (orientation happens inside the edge map —
    no attach joins).  The per-round state is EDGE-valued; below
    ``broadcast_threshold`` EDGES the whole round runs as BROADCAST
    ROUNDS: the driver holds the (small) surviving edge list, ships an
    oriented CSR adjacency + a dense-rank edge-membership key array via
    ``ray.put``, and each round is ONE wedge-enumeration map (partners
    of an edge = the CSR entries strictly after its own slot — exactly
    the (deg, id) order predicate) + ONE combiner-first support sum —
    no joins at all.  Above the threshold the distributed join rounds
    run (the billion-edge path).  Both paths are parity-tested.
    """
    if k < 3:
        raise ValueError("ktruss needs k >= 3 (support threshold k-2 >= 1)")
    if rounds < 1:
        raise ValueError("ktruss needs rounds >= 1")
    if engine != "dataset":
        edges = edges.materialize()
        if _route_pinned(engine, edges.count()):
            from .pregel import pinned_ktruss

            return pinned_ktruss(edges, k=k, rounds=rounds,
                         src=src, dst=dst)

    def norm(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        m = u != v
        return pa.table({"u": pa.array(u[m]), "v": pa.array(v[m])})

    e = distinct_tuples(
        edges.map_batches(norm, batch_format="pyarrow"), ["u", "v"],
        n_buckets=n_buckets or 64,
    ).materialize()
    if n_buckets is None:
        n_buckets = _auto_buckets(e.count())

    empty = pa.table({"u": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64()),
                      "support": pa.array([], pa.int64())})
    import ray.data as rd

    def support_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["u", "v"], sort=False, as_index=False)[
            "support"].sum()
        return out[out["support"] >= k - 2]

    if e.count() <= broadcast_threshold:
        # BROADCAST ROUNDS: surviving edges are driver state; each round
        # ships an oriented CSR + dense-rank membership keys once and
        # runs ONE wedge map + ONE support reduce — no joins.
        import ray

        cur = e.to_pandas()
        state_df = None
        pend_drop = None   # edges removed from the set supports count over
        for _ in range(rounds):
            if len(cur) == 0:
                return rd.from_arrow(empty)
            if state_df is not None and pend_drop is not None:
                # DECREMENTAL rounds (truss-decomposition trick): a full
                # recount is only needed once — afterwards each round
                # subtracts the triangles lost with last round's dropped
                # edges, O(|D| * deg) instead of a full wedge sweep
                if len(pend_drop[0]) == 0:
                    break  # peel stabilized: remaining rounds are no-ops
                su = state_df["u"].to_numpy().astype(np.int64)
                sv = state_df["v"].to_numpy().astype(np.int64)
                ns = _truss_decrement(
                    su, sv, state_df["support"].to_numpy(),
                    pend_drop[0], pend_drop[1])
                keep = ns >= k - 2
                if not keep.any():
                    return rd.from_arrow(empty)
                pend_drop = (su[~keep], sv[~keep])
                state_df = pd.DataFrame({
                    "u": su[keep], "v": sv[keep], "support": ns[keep]})
                cur = state_df[["u", "v"]]
                continue
            u = cur["u"].to_numpy().astype(np.int64)
            v = cur["v"].to_numpy().astype(np.int64)
            nodes, inv = np.unique(np.concatenate([u, v]),
                                   return_inverse=True)
            deg = np.bincount(inv, minlength=len(nodes)).astype(np.int64)
            ru, rv = inv[:len(u)], inv[len(u):]
            du, dv = deg[ru], deg[rv]
            swap = (dv < du) | ((dv == du) & (v < u))
            # DENSE RANKS stand in for node ids everywhere below: nodes
            # is sorted ascending, so rank order == id order and the
            # (deg, id) orientation + canonical min/max are identical;
            # rank*n_nodes+rank packs the closure key into one int64
            lo = np.where(swap, rv, ru).astype(np.int64)
            hi = np.where(swap, ru, rv).astype(np.int64)
            dhi = np.where(swap, du, dv)
            order = np.lexsort((hi, dhi, lo))
            lo, hi, dhi = lo[order], hi[order], dhi[order]
            nn = np.int64(len(nodes))
            run_end = np.searchsorted(lo, lo, side="right")
            kset = np.sort(lo * nn + hi)
            ref = ray.put((lo, hi, run_end, nodes, kset, nn))
            gidx_ds = rd.from_arrow(pa.table({
                "gidx": pa.array(np.arange(len(lo), dtype=np.int64))})) \
                .repartition(n_buckets)

            def wedge_support(b: pa.Table, _ref=ref) -> pa.Table:
                lo_, hi_, rend, nodes_, ks, n_ = _get_blob(_ref)
                g = b.column("gidx").to_numpy(zero_copy_only=False)
                cnt = rend[g] - g - 1
                m = cnt > 0
                g2, c2 = g[m], cnt[m]
                total = int(c2.sum())
                if total == 0:
                    return empty
                offs = np.concatenate([[0], np.cumsum(c2)[:-1]])
                pos = (np.arange(total) - np.repeat(offs, c2)
                       + np.repeat(g2 + 1, c2))
                own = np.repeat(g2, c2)
                z, h1, h2 = lo_[own], hi_[own], hi_[pos]
                key = h1 * n_ + h2
                ix = np.minimum(np.searchsorted(ks, key), len(ks) - 1)
                hit = ks[ix] == key
                z, h1, h2 = z[hit], h1[hit], h2[hit]
                if len(z) == 0:
                    return empty
                eu = np.concatenate([np.minimum(z, h1), np.minimum(z, h2),
                                     np.minimum(h1, h2)])
                ev = np.concatenate([np.maximum(z, h1), np.maximum(z, h2),
                                     np.maximum(h1, h2)])
                df = pd.DataFrame({"u": nodes_[eu], "v": nodes_[ev]})
                df["support"] = np.int64(1)
                agg = df.groupby(["u", "v"], sort=False,
                                 as_index=False).sum()
                return pa.Table.from_pandas(agg, preserve_index=False) \
                    .replace_schema_metadata(None)

            partials = gidx_ds.map_batches(wedge_support,
                                           batch_format="pyarrow")
            state_df = bucketed_groupby(
                partials, ["u", "v"], support_sum, n_buckets=n_buckets,
            ).to_pandas()
            if len(state_df) == 0 or "support" not in state_df.columns:
                return rd.from_arrow(empty)
            diff = cur.merge(state_df[["u", "v"]], on=["u", "v"],
                             how="left", indicator=True)
            gone = diff[diff["_merge"] == "left_only"]
            pend_drop = (gone["u"].to_numpy().astype(np.int64),
                         gone["v"].to_numpy().astype(np.int64))
            cur = state_df[["u", "v"]]
        out = pa.Table.from_pandas(
            state_df[["u", "v", "support"]].astype(np.int64),
            preserve_index=False).replace_schema_metadata(None)
        return rd.from_arrow(out)

    def deg_partial(b: pa.Table) -> pa.Table:
        x = np.concatenate([
            b.column("u").to_numpy(zero_copy_only=False),
            b.column("v").to_numpy(zero_copy_only=False)])
        un, c = np.unique(x, return_counts=True)
        return pa.table({NODE: pa.array(un),
                         "_c": pa.array(c.astype(np.int64))})

    def _orient_tbl(u, v, a, c):
        swap = (c < a) | ((c == a) & (v < u))
        return pa.table({
            "lo": pa.array(np.where(swap, v, u)),
            "hi": pa.array(np.where(swap, u, v)),
            "dhi": pa.array(np.where(swap, a, c)),
        })

    state = None
    for _ in range(rounds):
        deg = bucketed_groupby(
            e.map_batches(deg_partial, batch_format="pyarrow"),
            [NODE],
            lambda g: g.groupby(NODE, sort=False, as_index=False)["_c"].sum(),
            n_buckets=n_buckets,
        ).materialize()

        if deg.count() <= broadcast_threshold:
            import ray

            ddf = deg.to_pandas()
            order = np.argsort(ddf[NODE].to_numpy(), kind="mergesort")
            dref = ray.put((ddf[NODE].to_numpy()[order].astype(np.int64),
                            ddf["_c"].to_numpy()[order].astype(np.int64)))

            def orient_bc(b: pa.Table, _ref=dref) -> pa.Table:
                ns, dv = _get_blob(_ref)
                u = b.column("u").to_numpy(
                    zero_copy_only=False).astype(np.int64)
                v = b.column("v").to_numpy(
                    zero_copy_only=False).astype(np.int64)
                return _orient_tbl(u, v, dv[np.searchsorted(ns, u)],
                                   dv[np.searchsorted(ns, v)])

            o = e.map_batches(orient_bc, batch_format="pyarrow").materialize()
        else:
            du = deg.map_batches(lambda b: b.rename_columns(["u", "_du"]),
                                 batch_format="pyarrow")
            dv = deg.map_batches(lambda b: b.rename_columns(["v", "_dv"]),
                                 batch_format="pyarrow")
            j = bucketed_join(
                bucketed_join(e, du, ["u"], n_buckets=n_buckets),
                dv, ["v"], n_buckets=n_buckets)

            def orient(b: pa.Table) -> pa.Table:
                g = lambda c: b.column(c).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                return _orient_tbl(g("u"), g("v"), g("_du"), g("_dv"))

            o = j.map_batches(orient, batch_format="pyarrow").materialize()

        o2 = o.map_batches(
            lambda b: b.rename_columns(["lo", "_hi2", "_dhi2"]),
            batch_format="pyarrow")
        wedged = bucketed_join(o, o2, ["lo"], n_buckets=n_buckets)

        def wedge_rows(b: pa.Table) -> pa.Table:
            z = b.column("lo").to_numpy(zero_copy_only=False).astype(np.int64)
            h1 = b.column("hi").to_numpy(zero_copy_only=False).astype(np.int64)
            d1 = b.column("dhi").to_numpy(zero_copy_only=False).astype(np.int64)
            h2 = b.column("_hi2").to_numpy(zero_copy_only=False).astype(np.int64)
            d2 = b.column("_dhi2").to_numpy(zero_copy_only=False).astype(np.int64)
            keep = (d1 < d2) | ((d1 == d2) & (h1 < h2))
            # re-key by the potential closing edge; CENTER rides along
            return pa.table({"lo": pa.array(h1[keep]),
                             "hi": pa.array(h2[keep]),
                             "_z": pa.array(z[keep])})

        wedges = wedged.map_batches(wedge_rows, batch_format="pyarrow")
        closed = bucketed_join(
            wedges, o.map_batches(lambda b: b.select(["lo", "hi"]),
                                  batch_format="pyarrow"),
            ["lo", "hi"], how="semi", n_buckets=n_buckets)

        def support_partial(b: pa.Table) -> pa.Table:
            z = b.column("_z").to_numpy(zero_copy_only=False).astype(np.int64)
            h1 = b.column("lo").to_numpy(zero_copy_only=False).astype(np.int64)
            h2 = b.column("hi").to_numpy(zero_copy_only=False).astype(np.int64)
            eu = np.concatenate([np.minimum(z, h1), np.minimum(z, h2),
                                 np.minimum(h1, h2)])
            ev = np.concatenate([np.maximum(z, h1), np.maximum(z, h2),
                                 np.maximum(h1, h2)])
            df = pd.DataFrame({"u": eu, "v": ev})
            df["support"] = np.int64(1)
            agg = df.groupby(["u", "v"], sort=False, as_index=False).sum()
            return pa.Table.from_pandas(agg, preserve_index=False) \
                .replace_schema_metadata(None)

        state = _settle(bucketed_groupby(
            closed.map_batches(support_partial, batch_format="pyarrow"),
            ["u", "v"], support_sum, n_buckets=n_buckets,
        ), n_buckets)
        if state.count() == 0:
            return rd.from_arrow(empty)  # empty truss is a fixpoint
        e = state.map_batches(lambda b: b.select(["u", "v"]),
                              batch_format="pyarrow").materialize()
    return state


def label_propagation(edges, *, rounds: int, src: str = "src",
                      dst: str = "dst", n_buckets: int | None = None,
                      broadcast_threshold: int = BROADCAST_NODES,
                      engine: str = "auto"):
    """SYNCHRONOUS label propagation (community detection, Raghavan et
    al. 2007) for a FIXED number of rounds: label(0) = node id; each
    round every node adopts the most frequent label among its
    neighbors' previous labels, ties broken by the SMALLEST label —
    fully deterministic, so the chained-CTE SQL oracle mirrors it
    round for round.  Returns (node, lab).

    Self-loops drop and the edge set symmetrizes + dedups first, so a
    neighbor votes exactly once per round.

    Dual paths (the graph-suite discipline):
    * broadcast (edges <= threshold): labels live in a driver array
      shipped once per round via ``ray.put``; one map over the pinned
      edge Dataset emits combiner-first (node, lab, count) partials and
      one bucketed argmax reduce closes the round — edges NEVER
      re-shuffle.
    * bucketed BSP: per round one bucketed hash join ships the (node,
      lab) state onto the edges keyed by dst, then the same partial ->
      argmax reduce; `_settle` stops block compounding.
    """
    if engine != "dataset":
        edges = edges.materialize()
        if _route_pinned(engine, edges.count()):
            from .pregel import pinned_lpa

            return pinned_lpa(edges, rounds=rounds, src=src, dst=dst)

    if rounds < 1:
        raise ValueError("label_propagation needs rounds >= 1")

    def symm(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d
        s, d = s[m], d[m]
        return pa.table({"u": pa.array(np.concatenate([s, d])),
                         "v": pa.array(np.concatenate([d, s]))})

    e = distinct_tuples(
        edges.map_batches(symm, batch_format="pyarrow"), ["u", "v"],
        n_buckets=n_buckets or 64,
    ).materialize()
    n_edges = e.count()
    if n_buckets is None:
        n_buckets = _auto_buckets(n_edges)

    def argmax_votes(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({NODE: pd.Series([], dtype="int64"),
                                 "lab": pd.Series([], dtype="int64")})
        s = g.groupby([NODE, "lab"], sort=False, as_index=False)["_c"].sum()
        n = s[NODE].to_numpy().astype(np.int64)
        l = s["lab"].to_numpy().astype(np.int64)
        c = s["_c"].to_numpy()
        o = np.lexsort((l, -c, n))
        n, l = n[o], l[o]
        new = np.ones(len(n), dtype=bool)
        new[1:] = n[1:] != n[:-1]
        return pd.DataFrame({NODE: n[new], "lab": l[new]})

    def pair_counts(u: np.ndarray, lv: np.ndarray) -> pa.Table:
        o = np.lexsort((lv, u))
        uu, ll = u[o], lv[o]
        new = np.ones(len(uu), dtype=bool)
        new[1:] = (uu[1:] != uu[:-1]) | (ll[1:] != ll[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(uu)))
        return pa.table({NODE: pa.array(uu[starts]),
                         "lab": pa.array(ll[starts]),
                         "_c": pa.array(cnt.astype(np.int64))})

    import ray.data as rd

    if n_edges <= broadcast_threshold:
        import ray

        parts = e.map_batches(
            lambda b: pa.table({"u": pa.array(np.unique(
                b.column("u").to_numpy(zero_copy_only=False)))}),
            batch_format="pyarrow").to_pandas()
        nodes = np.unique(parts["u"].to_numpy().astype(np.int64))
        labels = nodes.copy()
        for _ in range(rounds):
            ref = ray.put((nodes, labels))

            def vote_partial(b: pa.Table, _ref=ref) -> pa.Table:
                ns, lb = _get_blob(_ref)
                u = b.column("u").to_numpy(zero_copy_only=False)
                v = b.column("v").to_numpy(zero_copy_only=False)
                lv = lb[np.searchsorted(ns, v)]
                return pair_counts(u, lv)

            red = bucketed_groupby(
                e.map_batches(vote_partial, batch_format="pyarrow"),
                [NODE], argmax_votes, n_buckets=n_buckets,
            ).to_pandas()
            new_lab = labels.copy()
            idx = np.searchsorted(nodes, red[NODE].to_numpy())
            new_lab[idx] = red["lab"].to_numpy()
            labels = new_lab
        return rd.from_arrow(pa.table({NODE: pa.array(nodes),
                                       "lab": pa.array(labels)}))

    # bucketed BSP path
    nodes_ds = distinct_tuples(
        e.map_batches(
            lambda b: pa.table({NODE: b.column("u")}),
            batch_format="pyarrow"),
        [NODE], n_buckets=n_buckets)
    state = nodes_ds.map_batches(
        lambda b: b.append_column("lab", b.column(NODE)),
        batch_format="pyarrow")
    for _ in range(rounds):
        lab_v = state.map_batches(
            lambda b: pa.table({"v": b.column(NODE),
                                "lab": b.column("lab")}),
            batch_format="pyarrow")
        j = bucketed_join(e, lab_v, ["v"], how="inner",
                          n_buckets=n_buckets)

        def vote_partial_b(b: pa.Table) -> pa.Table:
            u = b.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
            lv = b.column("lab").to_numpy(zero_copy_only=False).astype(np.int64)
            return pair_counts(u, lv)

        partial = j.map_batches(vote_partial_b, batch_format="pyarrow")
        state = _settle(
            bucketed_groupby(partial, [NODE], argmax_votes,
                             n_buckets=n_buckets), n_buckets)
    return state


def hits(edges, *, src: str = "src", dst: str = "dst", iters: int = 3,
         scale: int = 10 ** 6, n_buckets: int | None = None,
         broadcast_threshold: int = BROADCAST_NODES):
    """HITS hubs & authorities (Kleinberg 1999) over a DIRECTED edge
    set, in the exact integer fixed-point discipline of ``pagerank``:

        a_raw_i(v) = Σ_{u→v} h_{i-1}(u)
        a_i(v)     = (a_raw_i(v) * scale) // max_v a_raw_i
        h_raw_i(u) = Σ_{u→v} a_i(v)
        h_i(u)     = (h_raw_i(u) * scale) // max_u h_raw_i

    with h_0 = a_0 = scale everywhere.  MAX-normalization replaces the
    classic L2 norm so every round is int64-exact and the chained-CTE
    oracle (`hits`) matches bit for bit — rank ORDER is what HITS is
    used for and max-scaling preserves it.  Keep
    ``scale^2 * max_degree < 2^63`` (defaults allow degree ~9e6).

    Returns (node, hub, auth), int64 in [0, scale].

    100-TB shape: below ``broadcast_threshold`` nodes, each half-round
    ships the node-bounded score vector via ``ray.put`` and the edges
    NEVER re-shuffle (one execution per half-round); above it, the
    bucketed BSP path runs — per half-round ONE bucketed join ships
    scores onto edges, one combiner-first reduce sums per target, and
    the global max is a scalar aggregate (driver sees one int, never
    rows).  ``_settle`` bounds per-round block growth.
    """
    import ray
    import ray.data as rd

    edges, _, n_buckets = _settled_edges(edges, n_buckets)
    nodes = node_degrees(edges, src=src, dst=dst,
                         n_buckets=n_buckets).materialize()
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda b: pa.table({NODE: b.column(NODE),
                                "hub": pa.array([], pa.int64()),
                                "auth": pa.array([], pa.int64())}),
            batch_format="pyarrow")

    if n <= broadcast_threshold:
        npdf = nodes.to_pandas()
        node_sorted = np.sort(npdf[NODE].to_numpy().astype(np.int64))
        h = np.full(n, scale, dtype=np.int64)
        a = np.full(n, scale, dtype=np.int64)

        def make_gather(vec, kin, kout):
            ref = ray.put((node_sorted, vec))

            def gather(b: pa.Table, _ref=ref) -> pa.Table:
                ns, v = _get_blob(_ref)
                s = b.column(kin).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                d = b.column(kout).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                df = pd.DataFrame({
                    NODE: d, "_s": v[np.searchsorted(ns, s)],
                }).groupby(NODE, sort=False, as_index=False)["_s"].sum()
                return pa.table({
                    NODE: pa.array(df[NODE].to_numpy()),
                    "_s": pa.array(df["_s"].to_numpy().astype(np.int64)),
                })

            return gather

        def reduce_align(partials) -> np.ndarray:
            res = bucketed_groupby(
                partials, [NODE],
                lambda g: g.groupby(NODE, sort=False,
                                    as_index=False)["_s"].sum(),
                n_buckets=n_buckets).to_pandas()
            raw = np.zeros(n, dtype=np.int64)
            if len(res):
                ix = np.searchsorted(node_sorted,
                                     res[NODE].to_numpy().astype(np.int64))
                raw[ix] = res["_s"].to_numpy().astype(np.int64)
            return raw

        for _ in range(iters):
            araw = reduce_align(edges.map_batches(
                make_gather(h, src, dst), batch_format="pyarrow"))
            am = int(araw.max()) if len(araw) else 0
            a = (araw * scale) // am if am > 0 else np.zeros(n, np.int64)
            hraw = reduce_align(edges.map_batches(
                make_gather(a, dst, src), batch_format="pyarrow"))
            hm = int(hraw.max()) if len(hraw) else 0
            h = (hraw * scale) // hm if hm > 0 else np.zeros(n, np.int64)
        return rd.from_arrow(pa.table({
            NODE: pa.array(node_sorted), "hub": pa.array(h),
            "auth": pa.array(a)}))

    # bucketed BSP path: per half-round one join + one reduce + one
    # scalar max aggregate
    zero_rows = nodes.map_batches(
        lambda b: pa.table({
            NODE: pc.cast(b.column(NODE), pa.int64()),
            "_s": pa.array(np.zeros(len(b), dtype=np.int64))}),
        batch_format="pyarrow").materialize()

    def init_vec(b: pa.Table) -> pa.Table:
        return pa.table({
            NODE: pc.cast(b.column(NODE), pa.int64()),
            "_v": pa.array(np.full(len(b), scale, dtype=np.int64))})

    h_ds = _settle(nodes.map_batches(init_vec, batch_format="pyarrow"),
                   n_buckets)
    a_ds = h_ds

    def sum_by_node(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(NODE, sort=False, as_index=False)["_s"].sum()
        out["_s"] = out["_s"].astype(np.int64)
        return out

    def half_round(vec_ds, kin, kout):
        renamed = vec_ds.map_batches(
            lambda b: b.rename_columns(
                [kin if c == NODE else c for c in b.column_names]),
            batch_format="pyarrow")
        joined = bucketed_join(edges, renamed, [kin],
                               n_buckets=n_buckets)

        def partial(b: pa.Table) -> pa.Table:
            d = b.column(kout).to_numpy(
                zero_copy_only=False).astype(np.int64)
            v = b.column("_v").to_numpy(
                zero_copy_only=False).astype(np.int64)
            df = pd.DataFrame({NODE: d, "_s": v}).groupby(
                NODE, sort=False, as_index=False)["_s"].sum()
            return pa.table({
                NODE: pa.array(df[NODE].to_numpy()),
                "_s": pa.array(df["_s"].to_numpy().astype(np.int64))})

        partials = joined.map_batches(partial, batch_format="pyarrow")
        raw = _settle(bucketed_groupby(zero_rows.union(partials), [NODE],
                                       sum_by_node, n_buckets=n_buckets),
                      n_buckets)
        m = raw.max("_s")
        m = int(m) if m is not None else 0

        def norm(b: pa.Table, _m=m) -> pa.Table:
            s = b.column("_s").to_numpy(
                zero_copy_only=False).astype(np.int64)
            v = (s * scale) // _m if _m > 0 else np.zeros(len(s),
                                                          np.int64)
            return pa.table({NODE: b.column(NODE), "_v": pa.array(v)})

        return raw.map_batches(norm, batch_format="pyarrow")

    for _ in range(iters):
        a_ds = half_round(h_ds, src, dst)
        h_ds = half_round(a_ds, dst, src)

    hub = h_ds.map_batches(
        lambda b: pa.table({NODE: b.column(NODE), "hub": b.column("_v")}),
        batch_format="pyarrow")
    auth = a_ds.map_batches(
        lambda b: pa.table({NODE: b.column(NODE), "auth": b.column("_v")}),
        batch_format="pyarrow")
    return bucketed_join(hub, auth, [NODE], n_buckets=n_buckets)


def degree_assortativity(edges, *, src: str = "src", dst: str = "dst",
                         n_buckets: int | None = None,
                         broadcast_threshold: int = BROADCAST_NODES):
    """Degree assortativity: the Pearson correlation of endpoint degrees
    over the edge list (Newman 2002's mixing diagnostic — do hubs link
    to hubs?).  Degree = out-degree, which IS the undirected degree on
    a symmetrized edge list.

    All five moments (sx, sy, sxx, syy, sxy) and the edge count m are
    EXACT int64 partial sums folded to Python ints on the driver; the
    coefficient is one shared-parenthesization float expression

        assort = double(m*sxy - sx*sy)
                 / (sqrt(double(m*sxx - sx*sx)) * sqrt(double(m*syy - sy*sy)))

    — int->double casts and sqrt are correctly rounded on both sides,
    so the oracle value-checks the DOUBLE.  Degenerate (zero-variance)
    degree sequences are the caller's precondition.

    Returns ONE row: (m, sx, sy, sxx, syy, sxy, assort).

    100-TB shape: below ``broadcast_threshold`` the node-bounded degree
    vector broadcasts once and edges stream through one stateless map
    (per-batch 6-int partials — the reduce is |blocks| rows on the
    driver); above it, two bucketed joins ship degrees onto the edges
    and the same bounded partials follow.  Keep
    ``edges * maxdeg^2 < 2^63``.
    """
    import math

    import ray
    import ray.data as rd

    edges, m_edges, n_buckets = _settled_edges(edges, n_buckets)
    nodes = node_degrees(edges, src=src, dst=dst,
                         n_buckets=n_buckets).materialize()
    n = nodes.count()
    if n == 0 or m_edges == 0:
        return rd.from_arrow(pa.table({c: pa.array([], pa.int64())
                                       for c in ("m", "sx", "sy", "sxx",
                                                 "syy", "sxy")}
                                      | {"assort": pa.array([],
                                                            pa.float64())}))

    def moments(x: np.ndarray, y: np.ndarray) -> pa.Table:
        return pa.table({
            "m": pa.array([np.int64(len(x))]),
            "sx": pa.array([x.sum()]), "sy": pa.array([y.sum()]),
            "sxx": pa.array([(x * x).sum()]),
            "syy": pa.array([(y * y).sum()]),
            "sxy": pa.array([(x * y).sum()]),
        })

    if n <= broadcast_threshold:
        npdf = nodes.to_pandas()
        order = np.argsort(npdf[NODE].to_numpy(), kind="mergesort")
        node_sorted = npdf[NODE].to_numpy()[order].astype(np.int64)
        deg = npdf["outdeg"].to_numpy()[order].astype(np.int64)
        ref = ray.put((node_sorted, deg))

        def partial(b: pa.Table, _ref=ref) -> pa.Table:
            ns, dg = _get_blob(_ref)
            s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
            d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
            return moments(dg[np.searchsorted(ns, s)],
                           dg[np.searchsorted(ns, d)])

        parts = edges.map_batches(partial,
                                  batch_format="pyarrow").to_pandas()
    else:
        x_state = nodes.map_batches(
            lambda b: pa.table({NODE: pc.cast(b.column(NODE), pa.int64()),
                                "_x": pc.cast(b.column("outdeg"),
                                              pa.int64())}),
            batch_format="pyarrow")
        y_state = nodes.map_batches(
            lambda b: pa.table({NODE: pc.cast(b.column(NODE), pa.int64()),
                                "_y": pc.cast(b.column("outdeg"),
                                              pa.int64())}),
            batch_format="pyarrow")
        j = _propagated(_propagated(edges, x_state, src=src,
                                    n_buckets=n_buckets),
                        y_state, src=dst, n_buckets=n_buckets)

        def partial_b(b: pa.Table) -> pa.Table:
            x = b.column("_x").to_numpy(zero_copy_only=False).astype(np.int64)
            y = b.column("_y").to_numpy(zero_copy_only=False).astype(np.int64)
            return moments(x, y)

        parts = j.map_batches(partial_b, batch_format="pyarrow").to_pandas()

    m = int(parts["m"].sum())
    sx, sy = int(parts["sx"].sum()), int(parts["sy"].sum())
    sxx, syy = int(parts["sxx"].sum()), int(parts["syy"].sum())
    sxy = int(parts["sxy"].sum())
    assort = (float(m * sxy - sx * sy)
              / (math.sqrt(float(m * sxx - sx * sx))
                 * math.sqrt(float(m * syy - sy * sy))))
    return rd.from_arrow(pa.table({
        "m": pa.array([m], pa.int64()), "sx": pa.array([sx], pa.int64()),
        "sy": pa.array([sy], pa.int64()),
        "sxx": pa.array([sxx], pa.int64()),
        "syy": pa.array([syy], pa.int64()),
        "sxy": pa.array([sxy], pa.int64()),
        "assort": pa.array([assort], pa.float64()),
    }))


def community_stats(edges, labels, *, src: str = "src", dst: str = "dst",
                    node_col: str = "node", lab_col: str = "lab",
                    n_buckets: int | None = None,
                    broadcast_threshold: int = BROADCAST_NODES):
    """Per-community MODULARITY / CONDUCTANCE sufficient statistics.

    Given an edge table and a (node, lab) community assignment (e.g.
    ``label_propagation`` output), returns one row per community::

        (lab, n_nodes, e_in, deg_sum, cut, q_num)

    where ``e_in`` = undirected within-community edge count, ``deg_sum``
    = sum of member degrees (Σ deg_sum = 2m), ``cut`` = deg_sum - 2·e_in
    = edges leaving the community, and ``q_num`` = 4·m·e_in - deg_sum²
    — the exact-INTEGER numerator of the community's Newman-modularity
    contribution over the shared denominator 4·m² (so global
    Q = Σ q_num / (4 m²), and conductance = cut / min(deg_sum,
    2m - deg_sum) — both derivable with one division).  Integer sums
    are order-independent, so the chained-SQL oracle matches bit-exact.

    Edge normalization matches ``label_propagation``: self-loops drop,
    the pair set symmetrizes + dedups to canonical (u < v) pairs, so a
    neighbor counts once.  Every pair endpoint must appear in
    ``labels`` (raises otherwise — an unlabeled endpoint means the
    caller's assignment and edge table disagree).

    Dual paths (the graph-suite discipline):

    * labels ≤ ``broadcast_threshold``: the sorted (node → lab) arrays
      ship ONCE via ``ray.put``; one map over the canonical pair table
      emits combiner-first (lab, n_nodes, e_in, deg) partials — the
      pairs never shuffle.
    * bucketed: two bucketed hash joins tag the pair endpoints with
      labels, then the same partial → reduce plan.

    Guard: requires m < 2^30.7 so 4·m² stays inside int64; beyond that
    the raw (e_in, deg_sum) rows are still exact — recompute q_num
    driver-side in Python ints.
    """
    import ray

    def canon(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d
        s, d = s[m], d[m]
        return pa.table({"u": pa.array(np.minimum(s, d)),
                         "v": pa.array(np.maximum(s, d))})

    pairs = distinct_tuples(
        edges.map_batches(canon, batch_format="pyarrow"), ["u", "v"],
        n_buckets=n_buckets or 64,
    ).materialize()
    m_edges = pairs.count()
    if 4 * m_edges * m_edges >= (1 << 63):
        raise ValueError(
            f"community_stats: m={m_edges} overflows the int64 q_num; "
            "compute Q from the raw (e_in, deg_sum) rows instead")
    if n_buckets is None:
        n_buckets = _auto_buckets(m_edges)

    labels = labels.materialize()
    n_lab_rows = labels.count()

    def _partials(lu: np.ndarray, lv: np.ndarray) -> pa.Table:
        both = np.concatenate([lu, lv])
        dl, dc = np.unique(both, return_counts=True)
        same = lu[lu == lv]
        el, ec = np.unique(same, return_counts=True)
        lab = np.concatenate([dl, el])
        return pa.table({
            lab_col: pa.array(lab),
            "n_nodes": pa.array(np.zeros(len(lab), dtype=np.int64)),
            "e_in": pa.array(np.concatenate(
                [np.zeros(len(dl), dtype=np.int64), ec.astype(np.int64)])),
            "deg_sum": pa.array(np.concatenate(
                [dc.astype(np.int64), np.zeros(len(el), dtype=np.int64)])),
        })

    def node_partial(b: pa.Table) -> pa.Table:
        l = b.column(lab_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ul, uc = np.unique(l, return_counts=True)
        z = np.zeros(len(ul), dtype=np.int64)
        return pa.table({lab_col: pa.array(ul),
                         "n_nodes": pa.array(uc.astype(np.int64)),
                         "e_in": pa.array(z), "deg_sum": pa.array(z)})

    if n_lab_rows <= broadcast_threshold:
        lp = labels.to_pandas()
        nodes = lp[node_col].to_numpy().astype(np.int64)
        labs = lp[lab_col].to_numpy().astype(np.int64)
        o = np.argsort(nodes, kind="stable")
        nodes, labs = nodes[o], labs[o]
        ref = ray.put((nodes, labs))

        def tag_bc(b: pa.Table, _ref=ref) -> pa.Table:
            nd, lb = _get_blob(_ref)
            u = b.column("u").to_numpy(zero_copy_only=False)
            v = b.column("v").to_numpy(zero_copy_only=False)
            iu = np.searchsorted(nd, u)
            iv = np.searchsorted(nd, v)
            ok = ((iu < len(nd)) & (nd[np.minimum(iu, len(nd) - 1)] == u)
                  & (iv < len(nd)) & (nd[np.minimum(iv, len(nd) - 1)] == v))
            if not ok.all():
                raise ValueError("community_stats: unlabeled pair endpoint")
            return _partials(lb[iu], lb[iv])

        tagged = pairs.map_batches(tag_bc, batch_format="pyarrow")
    else:
        lu = labels.map_batches(
            lambda b: pa.table({
                "u": pc.cast(b.column(node_col), pa.int64()),
                "_lu": pc.cast(b.column(lab_col), pa.int64())}),
            batch_format="pyarrow")
        lv = labels.map_batches(
            lambda b: pa.table({
                "v": pc.cast(b.column(node_col), pa.int64()),
                "_lv": pc.cast(b.column(lab_col), pa.int64())}),
            batch_format="pyarrow")
        j = bucketed_join(pairs, lu, ["u"], n_buckets=n_buckets)
        j = bucketed_join(j, lv, ["v"], n_buckets=n_buckets)

        def tag_bk(b: pa.Table) -> pa.Table:
            return _partials(
                b.column("_lu").to_numpy(zero_copy_only=False).astype(np.int64),
                b.column("_lv").to_numpy(zero_copy_only=False).astype(np.int64))

        tagged = j.map_batches(tag_bk, batch_format="pyarrow")

    parts = tagged.union(
        labels.map_batches(node_partial, batch_format="pyarrow"))

    def reduce_lab(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(lab_col, sort=False, as_index=False)[
            ["n_nodes", "e_in", "deg_sum"]].sum()
        return s

    stats = bucketed_groupby(parts, [lab_col], reduce_lab,
                             n_buckets=n_buckets)

    def finalize(b: pa.Table) -> pa.Table:
        e = b.column("e_in").to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column("deg_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            lab_col: pc.cast(b.column(lab_col), pa.int64()),
            "n_nodes": pc.cast(b.column("n_nodes"), pa.int64()),
            "e_in": pa.array(e), "deg_sum": pa.array(d),
            "cut": pa.array(d - 2 * e),
            "q_num": pa.array(4 * m_edges * e - d * d),
        })

    return stats.map_batches(finalize, batch_format="pyarrow")


WALK_C = 1_000_003  # step-stream offset for the walk hash


def hash_walks(edges, seeds, *, steps: int, src: str = "src",
               dst: str = "dst", n_buckets: int | None = None,
               broadcast_threshold: int = BROADCAST_NODES):
    """DeepWalk/node2vec-style corpus generation with DETERMINISTIC
    hash-driven walks — reproducible pseudo-random without RNG state
    (the neighbor-sampling discipline of quota_per_key applied to
    multi-step walks):

        j(u, t) = knuth(u + t·C) mod deg(u)       (0-based)
        next    = the (j+1)-th neighbor of u in NEIGHBOR-SORTED order

    so both sides of the oracle agree on every hop.  One walk per seed
    (walk_id = the seed node); output (walk_id, step, node) for step
    0..steps.  Node-id contract: ids must stay below 2^31 − steps·C
    (the knuth_hash input bound) — raises otherwise.

    Dual paths: edges ≤ threshold ships a CSR (sorted nodes, offsets,
    neighbor array) once via ray.put and ALL hops advance inside one
    map over seed batches — zero shuffles; above it each step is two
    bucketed joins (deg lookup keyed node, then neighbor keyed
    (node, idx)) with `_settle` bounding block growth.
    """
    import ray
    import ray.data as rd

    def symm(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d
        s, d = s[m], d[m]
        return pa.table({"u": pa.array(np.concatenate([s, d])),
                         "v": pa.array(np.concatenate([d, s]))})

    adj = distinct_tuples(
        edges.map_batches(symm, batch_format="pyarrow"), ["u", "v"],
        n_buckets=n_buckets or 64,
    ).materialize()
    n_adj = adj.count()
    if n_buckets is None:
        n_buckets = _auto_buckets(n_adj)

    from ..functions.hashing import knuth_hash

    def check_ids(arr):
        if len(arr) and int(arr.max()) >= (1 << 31) - steps * WALK_C:
            raise ValueError("hash_walks: node ids exceed the knuth "
                             "hash input bound (2^31 - steps*C)")

    if n_adj <= broadcast_threshold:
        ap = adj.to_pandas().sort_values(["u", "v"], kind="mergesort")
        nodes_u = ap["u"].to_numpy().astype(np.int64)
        nbrs = ap["v"].to_numpy().astype(np.int64)
        check_ids(nodes_u)
        uniq, starts = np.unique(nodes_u, return_index=True)
        offs = np.append(starts, len(nbrs))
        ref = ray.put((uniq, offs, nbrs))

        def walk_bc(b: pa.Table, _ref=ref) -> pa.Table:
            un, of, nb = _get_blob(_ref)
            cur = b.column("node").to_numpy(
                zero_copy_only=False).astype(np.int64)
            wid = cur.copy()
            out_w = [wid]
            out_t = [np.zeros(len(cur), dtype=np.int64)]
            out_n = [cur.copy()]
            for t in range(1, steps + 1):
                p = np.searchsorted(un, cur)
                ok = (p < len(un)) & (un[np.minimum(p, len(un) - 1)]
                                      == cur)
                if not ok.all():
                    raise ValueError("hash_walks: seed off the graph")
                deg = of[p + 1] - of[p]
                j = knuth_hash(cur + t * WALK_C) % deg
                cur = nb[of[p] + j]
                out_w.append(wid)
                out_t.append(np.full(len(cur), t, dtype=np.int64))
                out_n.append(cur.copy())
            return pa.table({
                "walk_id": pa.array(np.concatenate(out_w)),
                "step": pa.array(np.concatenate(out_t)),
                NODE: pa.array(np.concatenate(out_n)),
            })

        return seeds.map_batches(walk_bc, batch_format="pyarrow")

    # bucketed path: per-node degree + 1-based neighbor index tables
    def index_adj(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "v"], kind="mergesort")
        u = g["u"].to_numpy().astype(np.int64)
        check_ids(u)
        starts = np.flatnonzero(
            np.concatenate([[True], u[1:] != u[:-1]]))
        seg = np.repeat(np.arange(len(starts)),
                        np.diff(np.append(starts, len(u))))
        idx = np.arange(len(u)) - starts[seg] + 1
        deg = np.diff(np.append(starts, len(u)))[seg]
        return pd.DataFrame({"u": u, "_idx": idx.astype(np.int64),
                             "_nbr": g["v"].to_numpy(),
                             "_deg": deg.astype(np.int64)})

    iadj = bucketed_groupby(adj, ["u"], index_adj,
                            n_buckets=n_buckets).materialize()
    def deg_rows(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("_idx"), 1))
        return pa.table({"u": f.column("u"),
                         "_deg2": f.column("_deg")})

    degs = iadj.map_batches(deg_rows,
                            batch_format="pyarrow").materialize()

    state = seeds.map_batches(
        lambda b: pa.table({
            "walk_id": pc.cast(b.column("node"), pa.int64()),
            "u": pc.cast(b.column("node"), pa.int64())}),
        batch_format="pyarrow").materialize()
    outputs = [state.map_batches(
        lambda b: pa.table({
            "walk_id": b.column("walk_id"),
            "step": pa.array(np.zeros(len(b), dtype=np.int64)),
            NODE: b.column("u")}),
        batch_format="pyarrow")]
    for t in range(1, steps + 1):
        with_deg = bucketed_join(state, degs, ["u"],
                                 n_buckets=n_buckets)

        def pick(b: pa.Table, _t=t) -> pa.Table:
            cur = b.column("u").to_numpy(
                zero_copy_only=False).astype(np.int64)
            deg = b.column("_deg2").to_numpy(
                zero_copy_only=False).astype(np.int64)
            j = knuth_hash(cur + _t * WALK_C) % deg
            return pa.table({
                "walk_id": b.column("walk_id"),
                "u": pa.array(cur),
                "_idx": pa.array((j + 1).astype(np.int64)),
            })

        keyed = with_deg.map_batches(pick, batch_format="pyarrow")
        nxt = bucketed_join(keyed, iadj.map_batches(
            lambda b: b.select(["u", "_idx", "_nbr"]),
            batch_format="pyarrow"), ["u", "_idx"],
            n_buckets=n_buckets)
        state = _settle(nxt.map_batches(
            lambda b: pa.table({
                "walk_id": b.column("walk_id"),
                "u": pc.cast(b.column("_nbr"), pa.int64())}),
            batch_format="pyarrow"), n_buckets)
        outputs.append(state.map_batches(
            lambda b, _t=t: pa.table({
                "walk_id": b.column("walk_id"),
                "step": pa.array(np.full(len(b), _t, dtype=np.int64)),
                NODE: b.column("u")}),
            batch_format="pyarrow"))
    out = outputs[0]
    for o in outputs[1:]:
        out = out.union(o)
    return out


def sssp_bounded(edges, seeds, *, src: str = "src", dst: str = "dst",
                 weight_col: str = "w", max_rounds: int = 3,
                 n_buckets: int | None = None,
                 broadcast_threshold: int = BROADCAST_NODES,
                 engine: str = "auto"):
    """Multi-source bounded-round WEIGHTED shortest paths (Bellman-Ford
    layering) — the weighted sibling of ``bfs_hops``: (node, dist) =
    minimum total weight over paths of <= ``max_rounds`` edges from any
    seed (non-negative int64 weights; seeds start at 0).

    Round i relaxes every edge once: dist_i(v) = min(dist_{i-1}(v),
    min_{u→v} dist_{i-1}(u) + w(u, v)) — exact over <= i-edge paths, so
    ``max_rounds`` rounds mirror the chained-CTE oracle term for term.
    Unlike unit-hop BFS a reached distance is NOT final, so the
    broadcast path ships the CHANGED-DELTA set instead of the frontier:
    only edges whose source IMPROVED last round can improve a neighbor,
    and the walk stops early once a round improves nothing (same
    results).  The bucketed path ships the whole (node, dist) state per
    round like bfs_hops.
    """
    if engine != "dataset":
        edges = edges.materialize()
        if _route_pinned(engine, edges.count()):
            from .pregel import pinned_sssp

            return pinned_sssp(edges, seeds, src=src, dst=dst,
                        weight_col=weight_col,
                        max_rounds=max_rounds)

    edges, n_edges, n_buckets = _settled_edges(edges, n_buckets)

    def take_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(NODE, sort=False, as_index=False)["dist"].min()

    if n_edges <= broadcast_threshold:
        import ray
        import ray.data as rd

        sdf = seeds.to_pandas()
        known = np.sort(np.unique(sdf[NODE].to_numpy().astype(np.int64)))
        dist = np.zeros(len(known), dtype=np.int64)
        ch_nodes, ch_dist = known, dist
        for _ in range(max_rounds):
            if len(ch_nodes) == 0:
                break
            ref = ray.put((ch_nodes, ch_dist))

            def relax_bc(b: pa.Table, _ref=ref) -> pa.Table:
                ns, dv = _get_blob(_ref)
                s = b.column(src).to_numpy(zero_copy_only=False)
                d = b.column(dst).to_numpy(zero_copy_only=False)
                wv = b.column(weight_col).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                idx_c = np.minimum(np.searchsorted(ns, s), len(ns) - 1)
                m = ns[idx_c] == s
                df = pd.DataFrame({NODE: d[m],
                                   "dist": dv[idx_c[m]] + wv[m]}
                                  ).groupby(NODE, sort=False,
                                            as_index=False)["dist"].min()
                return pa.Table.from_pandas(
                    df, preserve_index=False).replace_schema_metadata(None)

            red = bucketed_groupby(
                edges.map_batches(relax_bc, batch_format="pyarrow"),
                [NODE], take_min, n_buckets=n_buckets,
            ).to_pandas()
            rn = red[NODE].to_numpy().astype(np.int64)
            rdist = red["dist"].to_numpy().astype(np.int64)
            if len(known):
                ik = np.minimum(np.searchsorted(known, rn),
                                len(known) - 1)
                exists = known[ik] == rn
            else:
                ik = np.zeros(len(rn), dtype=np.int64)
                exists = np.zeros(len(rn), dtype=bool)
            better = exists & (rdist < dist[ik])
            fresh = ~exists
            dist[ik[better]] = rdist[better]
            merged = np.concatenate([known, rn[fresh]])
            mdist = np.concatenate([dist, rdist[fresh]])
            mo = np.argsort(merged, kind="mergesort")
            known, dist = merged[mo], mdist[mo]
            ch = np.concatenate([rn[better], rn[fresh]])
            cd = np.concatenate([rdist[better], rdist[fresh]])
            co = np.argsort(ch, kind="mergesort")
            ch_nodes, ch_dist = ch[co], cd[co]
        return rd.from_arrow(pa.table({NODE: pa.array(known),
                                       "dist": pa.array(dist)}))

    state = _settle(seeds.map_batches(
        lambda b: pa.table({
            NODE: b.column(NODE),
            "dist": pa.array(np.zeros(len(b), dtype=np.int64)),
        }),
        batch_format="pyarrow",
    ), n_buckets)

    def relax_partial(b: pa.Table) -> pa.Table:
        d = b.column(dst).to_numpy(zero_copy_only=False)
        wv = b.column(weight_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        dist = b.column("dist").to_numpy(
            zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({NODE: d, "dist": dist + wv}).groupby(
            NODE, sort=False, as_index=False)["dist"].min()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    for _ in range(max_rounds):
        joined = _propagated(edges, state, src=src, n_buckets=n_buckets)
        relaxed = joined.map_batches(relax_partial, batch_format="pyarrow")
        state = _settle(bucketed_groupby(
            state.union(relaxed), [NODE], take_min, n_buckets=n_buckets,
        ), n_buckets)
    return state


def temporal_reachability(edges, seeds, *, src: str = "src",
                          dst: str = "dst", ts_col: str = "ts",
                          start: int = 0, max_rounds: int = 3,
                          n_buckets: int | None = None,
                          broadcast_threshold: int = BROADCAST_NODES):
    """TIME-RESPECTING earliest-arrival reachability (the temporal-graph
    sibling of sssp_bounded): (node, t) = the earliest arrival time at
    each node over paths of <= ``max_rounds`` edges whose timestamps
    are non-decreasing along the path — an edge (u → v, ts) is
    traversable only when ts >= arrival(u), and arriving via it means
    arrival(v) = ts.  Seeds start at ``start``.

    Round i mirrors the chained-CTE oracle term for term:
    t_i(v) = min(t_{i-1}(v), min over eligible edges of e.ts).
    Improvements only propagate from nodes whose arrival IMPROVED
    (a smaller arrival can only widen the eligible edge set), so the
    broadcast path ships the changed-delta set and exits early like
    sssp_bounded; the bucketed path ships full state per round.
    """
    edges, n_edges, n_buckets = _settled_edges(edges, n_buckets)

    def take_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(NODE, sort=False, as_index=False)["t"].min()

    if n_edges <= broadcast_threshold:
        import ray
        import ray.data as rd

        sdf = seeds.to_pandas()
        known = np.sort(np.unique(sdf[NODE].to_numpy().astype(np.int64)))
        dist = np.full(len(known), start, dtype=np.int64)
        ch_nodes, ch_dist = known, dist
        for _ in range(max_rounds):
            if len(ch_nodes) == 0:
                break
            ref = ray.put((ch_nodes, ch_dist))

            def relax_bc(b: pa.Table, _ref=ref) -> pa.Table:
                ns, dv = _get_blob(_ref)
                s = b.column(src).to_numpy(zero_copy_only=False)
                d = b.column(dst).to_numpy(zero_copy_only=False)
                tv = b.column(ts_col).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                idx_c = np.minimum(np.searchsorted(ns, s), len(ns) - 1)
                m = (ns[idx_c] == s) & (tv >= dv[idx_c])
                df = pd.DataFrame({NODE: d[m], "t": tv[m]}).groupby(
                    NODE, sort=False, as_index=False)["t"].min()
                return pa.Table.from_pandas(
                    df, preserve_index=False).replace_schema_metadata(None)

            red = bucketed_groupby(
                edges.map_batches(relax_bc, batch_format="pyarrow"),
                [NODE], take_min, n_buckets=n_buckets,
            ).to_pandas()
            rn = red[NODE].to_numpy().astype(np.int64)
            rdist = red["t"].to_numpy().astype(np.int64)
            if len(known):
                ik = np.minimum(np.searchsorted(known, rn),
                                len(known) - 1)
                exists = known[ik] == rn
                better = exists & (rdist < dist[ik])
                dist[ik[better]] = rdist[better]
                fresh = ~exists
            else:
                better = np.zeros(len(rn), dtype=bool)
                fresh = np.ones(len(rn), dtype=bool)
            merged = np.concatenate([known, rn[fresh]])
            mdist = np.concatenate([dist, rdist[fresh]])
            mo = np.argsort(merged, kind="mergesort")
            known, dist = merged[mo], mdist[mo]
            ch = np.concatenate([rn[better], rn[fresh]])
            cd = np.concatenate([rdist[better], rdist[fresh]])
            co = np.argsort(ch, kind="mergesort")
            ch_nodes, ch_dist = ch[co], cd[co]
        return rd.from_arrow(pa.table({NODE: pa.array(known),
                                       "t": pa.array(dist)}))

    state = _settle(seeds.map_batches(
        lambda b: pa.table({
            NODE: b.column(NODE),
            "t": pa.array(np.full(len(b), start, dtype=np.int64)),
        }),
        batch_format="pyarrow",
    ), n_buckets)

    def relax_partial(b: pa.Table) -> pa.Table:
        d = b.column(dst).to_numpy(zero_copy_only=False)
        tv = b.column(ts_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        arr = b.column("t").to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = tv >= arr
        df = pd.DataFrame({NODE: d[m], "t": tv[m]}).groupby(
            NODE, sort=False, as_index=False)["t"].min()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    for _ in range(max_rounds):
        joined = _propagated(edges, state, src=src, n_buckets=n_buckets)
        relaxed = joined.map_batches(relax_partial, batch_format="pyarrow")
        state = _settle(bucketed_groupby(
            state.union(relaxed), [NODE], take_min, n_buckets=n_buckets,
        ), n_buckets)
    return state


def k_smallest_nodes(edges, k: int, *, src: str = "src", dst: str = "dst"):
    """The ``k`` smallest distinct node ids in the edge table — the
    deterministic seed derivation for sampled-source centralities (the
    SQL mirror is ``ORDER BY node LIMIT k``).  Per-block partials are
    BOUNDED (<= k rows each), so the driver reduce is O(k * blocks)."""
    import ray.data as rd

    def part(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.unique(np.concatenate([s, d]))[:k]
        return pa.table({NODE: pa.array(u)})

    parts = edges.map_batches(part, batch_format="pyarrow").to_pandas()
    arr = np.unique(parts[NODE].to_numpy().astype(np.int64))[:k]
    return rd.from_arrow(pa.table({NODE: pa.array(arr)}))


def _simple_adj(edges, *, src: str, dst: str, n_buckets: int):
    """UNDIRECTED SIMPLE adjacency (z, nb) from a raw edge table: self
    loops dropped, parallel edges deduped (path counts require a simple
    graph), both directions emitted.  Materialized — iterative callers
    re-map it every round."""
    def norm(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d
        return pa.table({"u": pa.array(np.minimum(s[m], d[m])),
                         "v": pa.array(np.maximum(s[m], d[m]))})

    pairs = distinct_tuples(edges.map_batches(norm, batch_format="pyarrow"),
                            ["u", "v"], n_buckets=n_buckets)

    def both_dirs(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        return pa.table({"z": pa.array(np.concatenate([u, v])),
                         "nb": pa.array(np.concatenate([v, u]))})

    return pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()


def _pick_seeds(adj, seeds, n_seeds: int, n_buckets: int) -> np.ndarray:
    """Sorted seed array: the caller's Dataset if given, else the
    ``n_seeds`` HIGHEST-DEGREE nodes (ties by smaller id — hubs sit in
    the giant component, so sampled pairs are actually connected; the
    SQL mirror is ``ORDER BY deg DESC, node LIMIT k``)."""
    if seeds is not None:
        return np.sort(np.unique(
            seeds.to_pandas()[NODE].to_numpy().astype(np.int64)))

    def deg_partial(b: pa.Table) -> pa.Table:
        z = b.column("z").to_numpy(zero_copy_only=False)
        uz, cz = np.unique(z, return_counts=True)
        return pa.table({NODE: pa.array(uz),
                         "_c": pa.array(cz.astype(np.int64))})

    def deg_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(NODE, sort=False, as_index=False)["_c"].sum()

    deg = bucketed_groupby(
        adj.map_batches(deg_partial, batch_format="pyarrow"),
        [NODE], deg_sum, n_buckets=n_buckets)

    def top_partial(b: pa.Table, _k=n_seeds) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["_c", NODE], ascending=[False, True], kind="mergesort").head(_k)
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    # block partials are BOUNDED (<= n_seeds rows each): driver reduce
    # is O(n_seeds * blocks)
    sd_df = deg.map_batches(top_partial, batch_format="pyarrow").to_pandas()
    sd_df = sd_df.sort_values(["_c", NODE], ascending=[False, True],
                              kind="mergesort").head(n_seeds)
    return np.sort(sd_df[NODE].to_numpy().astype(np.int64))


def _sum_sig(g: pd.DataFrame) -> pd.DataFrame:
    return g.groupby(["_s", NODE], sort=False, as_index=False)["_sig"].sum()


def _sigma_bfs_broadcast(adj, sarr: np.ndarray, max_hops: int,
                         n_buckets: int) -> dict:
    """Layered BFS with exact path counts from every seed at once —
    broadcast regime: per round the combined frontier (node, seed,
    sigma) ships once via ray.put and the adjacency NEVER re-shuffles.
    Returns reached[i] = (nodes sorted, dist, sigma) per seed index."""
    import ray

    K = len(sarr)
    reached = {i: (sarr[i:i + 1].copy(),
                   np.zeros(1, np.int64), np.ones(1, np.int64))
               for i in range(K)}
    f_n = sarr.copy()
    f_s = np.arange(K, dtype=np.int64)
    f_sig = np.ones(K, np.int64)
    for hop in range(1, max_hops + 1):
        if len(f_n) == 0:
            break
        ref = ray.put((f_n, f_s, f_sig))

        def expand(b: pa.Table, _ref=ref) -> pa.Table:
            fn, fs, fg = _get_blob(_ref)
            z = b.column("z").to_numpy(zero_copy_only=False)
            nb = b.column("nb").to_numpy(zero_copy_only=False)
            lo = np.searchsorted(fn, z, "left")
            hi = np.searchsorted(fn, z, "right")
            cnt = hi - lo
            tot = int(cnt.sum())
            if tot == 0:
                return pa.table({"_s": pa.array([], pa.int64()),
                                 NODE: pa.array([], pa.int64()),
                                 "_sig": pa.array([], pa.int64())})
            # one-to-many frontier expansion (a node may sit in several
            # seeds' frontiers): ranges [lo, hi) per edge
            rep = np.repeat(np.arange(len(z)), cnt)
            j = np.repeat(lo, cnt) + (np.arange(tot)
                                      - np.repeat(np.cumsum(cnt) - cnt, cnt))
            df = pd.DataFrame({"_s": fs[j], NODE: nb[rep],
                               "_sig": fg[j]}).groupby(
                ["_s", NODE], sort=False, as_index=False)["_sig"].sum()
            return pa.Table.from_pandas(
                df, preserve_index=False).replace_schema_metadata(None)

        red = bucketed_groupby(
            adj.map_batches(expand, batch_format="pyarrow"),
            ["_s", NODE], _sum_sig, n_buckets=n_buckets,
        ).to_pandas()
        if len(red) == 0:
            break
        rs = red["_s"].to_numpy().astype(np.int64)
        rn = red[NODE].to_numpy().astype(np.int64)
        rg = red["_sig"].to_numpy().astype(np.int64)
        parts_n, parts_s, parts_g = [], [], []
        for i in range(K):
            mi = rs == i
            nn, sg = rn[mi], rg[mi]
            kn, kd, ks = reached[i]
            pos = np.minimum(np.searchsorted(kn, nn), len(kn) - 1)
            fresh = kn[pos] != nn
            nn, sg = nn[fresh], sg[fresh]
            if len(nn) == 0:
                continue
            o = np.argsort(nn, kind="mergesort")
            nn, sg = nn[o], sg[o]
            mn = np.concatenate([kn, nn])
            md = np.concatenate([kd, np.full(len(nn), hop, np.int64)])
            ms = np.concatenate([ks, sg])
            mo = np.argsort(mn, kind="mergesort")
            reached[i] = (mn[mo], md[mo], ms[mo])
            parts_n.append(nn)
            parts_s.append(np.full(len(nn), i, np.int64))
            parts_g.append(sg)
        if not parts_n:
            break
        f_n = np.concatenate(parts_n)
        f_s = np.concatenate(parts_s)
        f_sig = np.concatenate(parts_g)
        o = np.argsort(f_n, kind="mergesort")
        f_n, f_s, f_sig = f_n[o], f_s[o], f_sig[o]
    return reached


def _sigma_bfs_bucketed(adj, sarr: np.ndarray, max_hops: int,
                        n_buckets: int):
    """Bucketed-BSP sigma BFS: state table (_s, node, _d, _sig)
    advances by one bucketed join + one combiner-first reduce + one
    anti join per round.  Returns the settled state Dataset."""
    import ray.data as rd

    K = len(sarr)
    f = rd.from_arrow(pa.table({
        "_s": pa.array(sarr), NODE: pa.array(sarr),
        "_sig": pa.array(np.ones(K, np.int64))}))
    r_state = rd.from_arrow(pa.table({
        "_s": pa.array(sarr), NODE: pa.array(sarr),
        "_d": pa.array(np.zeros(K, np.int64)),
        "_sig": pa.array(np.ones(K, np.int64))})).materialize()

    def cand_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "_s": b.column("_s").to_numpy(zero_copy_only=False),
            NODE: b.column("nb").to_numpy(zero_copy_only=False),
            "_sig": b.column("_sig").to_numpy(
                zero_copy_only=False).astype(np.int64),
        }).groupby(["_s", NODE], sort=False, as_index=False)["_sig"].sum()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    for hop in range(1, max_hops + 1):
        fz = f.map_batches(
            lambda b: b.rename_columns(
                ["z" if c == NODE else c for c in b.column_names]),
            batch_format="pyarrow")
        cand = bucketed_join(adj, fz, ["z"], n_buckets=n_buckets)
        summed = bucketed_groupby(
            cand.map_batches(cand_partial, batch_format="pyarrow"),
            ["_s", NODE], _sum_sig, n_buckets=n_buckets)
        rkeys = r_state.map_batches(lambda b: b.select(["_s", NODE]),
                                    batch_format="pyarrow")
        new = bucketed_join(summed, rkeys, ["_s", NODE], how="anti",
                            n_buckets=n_buckets).materialize()
        if new.count() == 0:
            break
        newd = new.map_batches(
            lambda b, _h=hop: b.append_column(
                "_d", pa.array(np.full(len(b), _h, np.int64))
            ).select(["_s", NODE, "_d", "_sig"]),
            batch_format="pyarrow")
        r_state = _settle(r_state.union(newd), n_buckets)
        f = new
    return r_state


def stress_centrality(edges, seeds=None, *, n_seeds: int = 6,
                      src: str = "src", dst: str = "dst",
                      max_hops: int = 3, n_buckets: int | None = None,
                      broadcast_threshold: int = BROADCAST_NODES):
    """STRESS centrality (Shimbel 1953) from a sampled seed set — the
    all-integer member of the betweenness family: stress(v) = number of
    shortest paths passing THROUGH v, summed over seed pairs s < t with
    d(s, t) <= ``max_hops``.  Unlike Brandes betweenness (whose
    dependency accumulation is rational-valued), every quantity here is
    an exact integer — layered-BFS path counts sigma_sv (sum over
    predecessors, order-free) and the combine is sigma_sv * sigma_tv
    over nodes with d_sv + d_tv = d_st — so the chained-CTE SQL oracle
    matches bit for bit.

    ``seeds`` is a small Dataset with a ``node`` column (sampled-pivot
    centrality is the standard scale answer — exact all-pairs is
    O(V*E)); ``seeds=None`` picks the top-``n_seeds`` hubs
    (``_pick_seeds``).  The graph is simplified internally
    (``_simple_adj``).  Returns (node, stress), stress > 0 rows only.

    Broadcast path (<= ``broadcast_threshold`` edges): the sigma BFS
    ships frontiers via ray.put (adjacency never re-shuffles) and the
    pair combine is driver-side over the node-bounded reached state.
    Bucketed path: ``_sigma_bfs_bucketed`` rounds, then ONE self-join
    on node for the pair combine (the K x K seed-distance matrix is
    driver-collected — K^2 rows)."""
    import ray.data as rd

    edges, n_edges, n_buckets = _settled_edges(edges, n_buckets)
    adj = _simple_adj(edges, src=src, dst=dst, n_buckets=n_buckets)
    sarr = _pick_seeds(adj, seeds, n_seeds, n_buckets)
    K = len(sarr)
    empty = rd.from_arrow(pa.table({NODE: pa.array([], pa.int64()),
                                    "stress": pa.array([], pa.int64())}))
    if K < 2:
        return empty

    if n_edges <= broadcast_threshold:
        reached = _sigma_bfs_broadcast(adj, sarr, max_hops, n_buckets)
        acc_n, acc_v = [], []
        for i in range(K):
            ni, di, gi = reached[i]
            for j2 in range(i + 1, K):
                nj, dj, gj = reached[j2]
                p = np.searchsorted(ni, sarr[j2])
                if p >= len(ni) or ni[p] != sarr[j2]:
                    continue  # pair unreachable within max_hops
                d_st = di[p]
                ii = np.minimum(np.searchsorted(ni, nj), len(ni) - 1)
                m = ni[ii] == nj
                ci, cj = ii[m], np.nonzero(m)[0]
                ok = ((di[ci] + dj[cj] == d_st)
                      & (ni[ci] != sarr[i]) & (ni[ci] != sarr[j2]))
                acc_n.append(ni[ci][ok])
                acc_v.append(gi[ci][ok] * gj[cj][ok])
        if not acc_n:
            return empty
        an = np.concatenate(acc_n)
        av = np.concatenate(acc_v)
        if len(an) == 0:
            return empty
        un, inv = np.unique(an, return_inverse=True)
        out = np.zeros(len(un), np.int64)
        np.add.at(out, inv, av)
        return rd.from_arrow(pa.table({NODE: pa.array(un),
                                       "stress": pa.array(out)}))

    r_state = _sigma_bfs_bucketed(adj, sarr, max_hops, n_buckets)

    sd = r_state.map_batches(
        lambda b: b.filter(pc.is_in(b.column(NODE),
                                    value_set=pa.array(sarr))),
        batch_format="pyarrow").to_pandas()
    dmat = np.full((K, K), -1, np.int64)
    si = np.searchsorted(sarr, sd["_s"].to_numpy().astype(np.int64))
    ti = np.searchsorted(sarr, sd[NODE].to_numpy().astype(np.int64))
    dmat[si, ti] = sd["_d"].to_numpy().astype(np.int64)

    r2 = r_state.map_batches(
        lambda b: b.rename_columns(
            [{"_s": "_t", "_d": "_d2", "_sig": "_sig2"}.get(c, c)
             for c in b.column_names]),
        batch_format="pyarrow")
    joined = bucketed_join(r_state, r2, [NODE], n_buckets=n_buckets)

    def combine_partial(b: pa.Table, _dmat=dmat, _sarr=sarr) -> pa.Table:
        s_ = b.column("_s").to_numpy(zero_copy_only=False).astype(np.int64)
        t_ = b.column("_t").to_numpy(zero_copy_only=False).astype(np.int64)
        nd = b.column(NODE).to_numpy(zero_copy_only=False).astype(np.int64)
        d1 = b.column("_d").to_numpy(zero_copy_only=False).astype(np.int64)
        d2 = b.column("_d2").to_numpy(zero_copy_only=False).astype(np.int64)
        g1 = b.column("_sig").to_numpy(zero_copy_only=False).astype(np.int64)
        g2 = b.column("_sig2").to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = s_ < t_
        dd = _dmat[np.searchsorted(_sarr, s_[m]),
                   np.searchsorted(_sarr, t_[m])]
        ok = (d1[m] + d2[m] == dd) & (nd[m] != s_[m]) & (nd[m] != t_[m])
        df = pd.DataFrame({NODE: nd[m][ok],
                           "stress": g1[m][ok] * g2[m][ok]}).groupby(
            NODE, sort=False, as_index=False)["stress"].sum()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    def final_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(NODE, sort=False, as_index=False)["stress"].sum()

    return bucketed_groupby(
        joined.map_batches(combine_partial, batch_format="pyarrow"),
        [NODE], final_sum, n_buckets=n_buckets)


def _bw_terms(g1: np.ndarray, g2: np.ndarray, sig_st: int,
              quant: int) -> np.ndarray:
    """Per-pair quantized dependency terms (g1*g2*quant) // sig_st —
    int64-vectorized when the worst-case product provably fits,
    exact-Python-int fallback otherwise (path counts can explode on
    dense graphs; the floor-div terms themselves stay bounded)."""
    if not len(g1):
        return np.zeros(0, dtype=np.int64)
    if int(g1.max()) * int(g2.max()) * quant < (1 << 62):
        return (g1 * g2 * quant) // sig_st
    return np.array([(int(a) * int(b) * quant) // sig_st
                     for a, b in zip(g1.tolist(), g2.tolist())],
                    dtype=np.int64)


def betweenness_centrality(edges, seeds=None, *, n_seeds: int = 6,
                           src: str = "src", dst: str = "dst",
                           max_hops: int = 3, quant: int = 1 << 20,
                           n_buckets: int | None = None,
                           broadcast_threshold: int = BROADCAST_NODES):
    """Seeded BETWEENNESS centrality (Brandes 2001, sampled-pivot
    form) with the pair-dependency QUANTIZED so every term is an exact
    integer:

        bw_q(v) = Σ_{seed pairs s < t, d(s,t) <= max_hops}
                  (sigma_sv * sigma_tv * quant) // sigma_st
                  over v on a shortest s-t path (d_sv + d_tv = d_st)

    i.e. classic betweenness x ``quant``, with each pair's rational
    dependency floored independently — the sum is order-free, so the
    chained-CTE SQL oracle matches bit for bit (divide by ``quant``
    downstream for the float value).  This is the true-betweenness
    sibling of :func:`stress_centrality` (same sigma BFS, same seed
    contract, same 100-TB shape: adjacency never re-shuffles on the
    broadcast path; one self-join + K^2 driver rows on the bucketed
    path).  Keep max path-count products * quant below 2^62 for the
    vectorized fast path (``_bw_terms`` falls back to exact Python
    ints above it)."""
    import ray.data as rd

    edges, n_edges, n_buckets = _settled_edges(edges, n_buckets)
    adj = _simple_adj(edges, src=src, dst=dst, n_buckets=n_buckets)
    sarr = _pick_seeds(adj, seeds, n_seeds, n_buckets)
    K = len(sarr)
    empty = rd.from_arrow(pa.table({NODE: pa.array([], pa.int64()),
                                    "bw_q": pa.array([], pa.int64())}))
    if K < 2:
        return empty

    if n_edges <= broadcast_threshold:
        reached = _sigma_bfs_broadcast(adj, sarr, max_hops, n_buckets)
        acc_n, acc_v = [], []
        for i in range(K):
            ni, di, gi = reached[i]
            for j2 in range(i + 1, K):
                nj, dj, gj = reached[j2]
                p = np.searchsorted(ni, sarr[j2])
                if p >= len(ni) or ni[p] != sarr[j2]:
                    continue  # pair unreachable within max_hops
                d_st, sig_st = int(di[p]), int(gi[p])
                ii = np.minimum(np.searchsorted(ni, nj), len(ni) - 1)
                m = ni[ii] == nj
                ci, cj = ii[m], np.nonzero(m)[0]
                ok = ((di[ci] + dj[cj] == d_st)
                      & (ni[ci] != sarr[i]) & (ni[ci] != sarr[j2]))
                acc_n.append(ni[ci][ok])
                acc_v.append(_bw_terms(gi[ci][ok], gj[cj][ok],
                                       sig_st, quant))
        if not acc_n:
            return empty
        an = np.concatenate(acc_n)
        av = np.concatenate(acc_v)
        if len(an) == 0:
            return empty
        un, inv = np.unique(an, return_inverse=True)
        out = np.zeros(len(un), np.int64)
        np.add.at(out, inv, av)
        return rd.from_arrow(pa.table({NODE: pa.array(un),
                                       "bw_q": pa.array(out)}))

    r_state = _sigma_bfs_bucketed(adj, sarr, max_hops, n_buckets)

    sd = r_state.map_batches(
        lambda b: b.filter(pc.is_in(b.column(NODE),
                                    value_set=pa.array(sarr))),
        batch_format="pyarrow").to_pandas()
    dmat = np.full((K, K), -1, np.int64)
    smat = np.ones((K, K), np.int64)
    si = np.searchsorted(sarr, sd["_s"].to_numpy().astype(np.int64))
    ti = np.searchsorted(sarr, sd[NODE].to_numpy().astype(np.int64))
    dmat[si, ti] = sd["_d"].to_numpy().astype(np.int64)
    smat[si, ti] = sd["_sig"].to_numpy().astype(np.int64)

    r2 = r_state.map_batches(
        lambda b: b.rename_columns(
            [{"_s": "_t", "_d": "_d2", "_sig": "_sig2"}.get(c, c)
             for c in b.column_names]),
        batch_format="pyarrow")
    joined = bucketed_join(r_state, r2, [NODE], n_buckets=n_buckets)

    def combine_partial(b: pa.Table, _dmat=dmat, _smat=smat,
                        _sarr=sarr) -> pa.Table:
        s_ = b.column("_s").to_numpy(zero_copy_only=False).astype(np.int64)
        t_ = b.column("_t").to_numpy(zero_copy_only=False).astype(np.int64)
        nd = b.column(NODE).to_numpy(zero_copy_only=False).astype(np.int64)
        d1 = b.column("_d").to_numpy(zero_copy_only=False).astype(np.int64)
        d2 = b.column("_d2").to_numpy(zero_copy_only=False).astype(np.int64)
        g1 = b.column("_sig").to_numpy(zero_copy_only=False).astype(np.int64)
        g2 = b.column("_sig2").to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = s_ < t_
        six = np.searchsorted(_sarr, s_[m])
        tix = np.searchsorted(_sarr, t_[m])
        dd = _dmat[six, tix]
        ok = (d1[m] + d2[m] == dd) & (nd[m] != s_[m]) & (nd[m] != t_[m])
        sig_st = _smat[six, tix][ok]
        a1, a2 = g1[m][ok], g2[m][ok]
        if len(a1) and int(a1.max()) * int(a2.max()) * quant < (1 << 62):
            terms = (a1 * a2 * quant) // sig_st
        else:
            terms = np.array(
                [(int(x) * int(y) * quant) // int(z)
                 for x, y, z in zip(a1.tolist(), a2.tolist(),
                                    sig_st.tolist())], dtype=np.int64)
        df = pd.DataFrame({NODE: nd[m][ok], "bw_q": terms}).groupby(
            NODE, sort=False, as_index=False)["bw_q"].sum()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    def final_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(NODE, sort=False, as_index=False)["bw_q"].sum()

    return bucketed_groupby(
        joined.map_batches(combine_partial, batch_format="pyarrow"),
        [NODE], final_sum, n_buckets=n_buckets)


def seed_reach(edges, seeds=None, *, n_seeds: int = 6,
               src: str = "src", dst: str = "dst",
               max_hops: int = 3, n_buckets: int | None = None,
               broadcast_threshold: int = BROADCAST_NODES):
    """Per-seed bounded-hop REACH statistics over the same sigma BFS as
    ``stress_centrality`` — the graph-health / influence panel: for
    each seed, its eccentricity within ``max_hops`` (max settled
    distance), the number of reached nodes (seed included, d=0), and
    the total shortest-path count Σ sigma.  All int64, so the shared
    chained-CTE oracle value-checks (SELECT s, MAX(d), COUNT(*),
    SUM(sig) ... GROUP BY s).

    Returns (seed, ecc, n_reached, n_paths)."""
    import ray.data as rd

    edges, n_edges, n_buckets = _settled_edges(edges, n_buckets)
    adj = _simple_adj(edges, src=src, dst=dst, n_buckets=n_buckets)
    sarr = _pick_seeds(adj, seeds, n_seeds, n_buckets)
    K = len(sarr)
    if K == 0:
        return rd.from_arrow(pa.table({
            "seed": pa.array([], pa.int64()),
            "ecc": pa.array([], pa.int64()),
            "n_reached": pa.array([], pa.int64()),
            "n_paths": pa.array([], pa.int64())}))

    if n_edges <= broadcast_threshold:
        reached = _sigma_bfs_broadcast(adj, sarr, max_hops, n_buckets)
        ecc = np.array([int(reached[i][1].max()) for i in range(K)],
                       np.int64)
        nr = np.array([len(reached[i][0]) for i in range(K)], np.int64)
        npth = np.array([int(reached[i][2].sum()) for i in range(K)],
                        np.int64)
        return rd.from_arrow(pa.table({
            "seed": pa.array(sarr), "ecc": pa.array(ecc),
            "n_reached": pa.array(nr), "n_paths": pa.array(npth)}))

    r_state = _sigma_bfs_bucketed(adj, sarr, max_hops, n_buckets)

    def reach_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "seed": b.column("_s").to_numpy(zero_copy_only=False),
            "_d": b.column("_d").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "_sig": b.column("_sig").to_numpy(
                zero_copy_only=False).astype(np.int64),
        })
        agg = df.groupby("seed", sort=False).agg(
            ecc=("_d", "max"), n_reached=("_d", "size"),
            n_paths=("_sig", "sum")).reset_index()
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    def reach_final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("seed", sort=False, as_index=False).agg(
            {"ecc": "max", "n_reached": "sum", "n_paths": "sum"})

    return bucketed_groupby(
        r_state.map_batches(reach_partial, batch_format="pyarrow"),
        ["seed"], reach_final, n_buckets=n_buckets)


def harmonic_centrality(edges, seeds=None, *, n_seeds: int = 6,
                        src: str = "src", dst: str = "dst",
                        max_hops: int = 3, quant: int = 1 << 16,
                        n_buckets: int | None = None,
                        broadcast_threshold: int = BROADCAST_NODES):
    """Bounded-hop HARMONIC centrality (Boldi & Vigna 2014) of each
    seed: sum of 1/d over nodes reached within ``max_hops`` — the
    centrality that is well-defined on disconnected graphs (unreached
    nodes contribute 0, no infinite-distance hazard).

    Reuses the shared sigma-BFS (the stress/seed_reach plan: broadcast
    frontier / bucketed-BSP state, adjacency never re-shuffles on the
    broadcast path).  1/d is QUANTIZED as quant // d — integer sums
    are order-free, so h_q value-checks against the chained-CTE
    oracle; ``harmonic`` = h_q / quant is the ONE shared float.

    Returns (seed, n_reached, h_q, harmonic): n_reached EXCLUDES the
    seed itself (d >= 1 only), unlike seed_reach."""
    import ray.data as rd

    edges, n_edges, n_buckets = _settled_edges(edges, n_buckets)
    adj = _simple_adj(edges, src=src, dst=dst, n_buckets=n_buckets)
    sarr = _pick_seeds(adj, seeds, n_seeds, n_buckets)
    K = len(sarr)
    qf = float(quant)
    if K == 0:
        return rd.from_arrow(pa.table({
            "seed": pa.array([], pa.int64()),
            "n_reached": pa.array([], pa.int64()),
            "h_q": pa.array([], pa.int64()),
            "harmonic": pa.array([], pa.float64())}))

    if n_edges <= broadcast_threshold:
        reached = _sigma_bfs_broadcast(adj, sarr, max_hops, n_buckets)
        nr, hq = [], []
        for i in range(K):
            d = reached[i][1]
            m = d >= 1
            nr.append(int(m.sum()))
            hq.append(int((quant // d[m]).sum()) if m.any() else 0)
        return rd.from_arrow(pa.table({
            "seed": pa.array(sarr),
            "n_reached": pa.array(np.asarray(nr, np.int64)),
            "h_q": pa.array(np.asarray(hq, np.int64)),
            "harmonic": pa.array([float(v) / qf for v in hq],
                                 pa.float64())}))

    r_state = _sigma_bfs_bucketed(adj, sarr, max_hops, n_buckets)

    def h_partial(b: pa.Table) -> pa.Table:
        d = b.column("_d").to_numpy(zero_copy_only=False).astype(np.int64)
        s = b.column("_s").to_numpy(zero_copy_only=False)
        m = d >= 1
        df = pd.DataFrame({
            "seed": s[m],
            "n_reached": np.ones(int(m.sum()), np.int64),
            "h_q": quant // d[m],
        }).groupby("seed", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    def h_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("seed", sort=False, as_index=False)[
            ["n_reached", "h_q"]].sum()
        out["harmonic"] = np.array(
            [float(int(v)) / qf for v in out["h_q"]], np.float64)
        return out

    got = bucketed_groupby(
        r_state.map_batches(h_partial, batch_format="pyarrow"),
        ["seed"], h_final, n_buckets=n_buckets).to_pandas()
    # isolated seeds reach nothing -> keep the (seed, 0, 0, 0.0) row
    have = set(got["seed"].tolist())
    missing = [int(s) for s in sarr.tolist() if s not in have]
    full = pd.concat([got, pd.DataFrame({
        "seed": missing,
        "n_reached": np.zeros(len(missing), np.int64),
        "h_q": np.zeros(len(missing), np.int64),
        "harmonic": np.zeros(len(missing), np.float64)})],
        ignore_index=True)
    return rd.from_arrow(pa.Table.from_pandas(
        full, preserve_index=False).replace_schema_metadata(None))


def closeness_centrality(edges, seeds=None, *, n_seeds: int = 6,
                         src: str = "src", dst: str = "dst",
                         max_hops: int = 3,
                         n_buckets: int | None = None,
                         broadcast_threshold: int = BROADCAST_NODES):
    """Bounded-hop CLOSENESS centrality of each seed (the
    Wasserman–Faust disconnected-graph form restricted to the
    ``max_hops`` ball): n_reached and d_sum = Σ d over nodes reached
    within ``max_hops`` are EXACT integers whose sums are order-free,
    and ``closeness`` = n_reached / d_sum is the ONE shared float
    division (0.0 for isolated seeds).

    Same plan as harmonic_centrality (reference: zen3geo has no graph
    ops; this extends the sigma-BFS family): broadcast frontier under
    ``broadcast_threshold`` edges, bucketed BSP above, adjacency never
    re-shuffles on the broadcast path."""
    import ray.data as rd

    edges, n_edges, n_buckets = _settled_edges(edges, n_buckets)
    adj = _simple_adj(edges, src=src, dst=dst, n_buckets=n_buckets)
    sarr = _pick_seeds(adj, seeds, n_seeds, n_buckets)
    K = len(sarr)
    if K == 0:
        return rd.from_arrow(pa.table({
            "seed": pa.array([], pa.int64()),
            "n_reached": pa.array([], pa.int64()),
            "d_sum": pa.array([], pa.int64()),
            "closeness": pa.array([], pa.float64())}))

    def _close(nr: int, dsum: int) -> float:
        return float(nr) / float(dsum) if dsum > 0 else 0.0

    if n_edges <= broadcast_threshold:
        reached = _sigma_bfs_broadcast(adj, sarr, max_hops, n_buckets)
        nr, dsums = [], []
        for i in range(K):
            d = reached[i][1]
            m = d >= 1
            nr.append(int(m.sum()))
            dsums.append(int(d[m].sum()) if m.any() else 0)
        return rd.from_arrow(pa.table({
            "seed": pa.array(sarr),
            "n_reached": pa.array(np.asarray(nr, np.int64)),
            "d_sum": pa.array(np.asarray(dsums, np.int64)),
            "closeness": pa.array(
                [_close(a, b) for a, b in zip(nr, dsums)],
                pa.float64())}))

    r_state = _sigma_bfs_bucketed(adj, sarr, max_hops, n_buckets)

    def c_partial(b: pa.Table) -> pa.Table:
        d = b.column("_d").to_numpy(zero_copy_only=False).astype(np.int64)
        s = b.column("_s").to_numpy(zero_copy_only=False)
        m = d >= 1
        df = pd.DataFrame({
            "seed": s[m],
            "n_reached": np.ones(int(m.sum()), np.int64),
            "d_sum": d[m],
        }).groupby("seed", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    def c_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("seed", sort=False, as_index=False)[
            ["n_reached", "d_sum"]].sum()
        out["closeness"] = np.array(
            [_close(int(a), int(b))
             for a, b in zip(out["n_reached"], out["d_sum"])],
            np.float64)
        return out

    got = bucketed_groupby(
        r_state.map_batches(c_partial, batch_format="pyarrow"),
        ["seed"], c_final, n_buckets=n_buckets).to_pandas()
    have = set(got["seed"].tolist())
    missing = [int(s) for s in sarr.tolist() if s not in have]
    full = pd.concat([got, pd.DataFrame({
        "seed": missing,
        "n_reached": np.zeros(len(missing), np.int64),
        "d_sum": np.zeros(len(missing), np.int64),
        "closeness": np.zeros(len(missing), np.float64)})],
        ignore_index=True)
    return rd.from_arrow(pa.Table.from_pandas(
        full, preserve_index=False).replace_schema_metadata(None))


def butterfly_count(edges, *, src: str = "src", dst: str = "dst",
                    n_buckets: int | None = None,
                    broadcast_threshold: int = BROADCAST_NODES):
    """Exact BUTTERFLY (4-cycle) census of a BIPARTITE graph
    (Sanei-Mehri et al. 2018) — the bipartite clustering primitive:

        butterflies  = Σ_{pairs (u,v) same side} C(codeg(u,v), 2)
        caterpillars = Σ_{edges (a,b)} (deg(a)-1) * (deg(b)-1)
        bf_cc        = 4 * butterflies / caterpillars

    ``src`` and ``dst`` are the two PARTS (every src value is a left
    vertex, every dst a right vertex; parallel edges deduped).  Wedges
    are enumerated at centers on the side with the SMALLER exact wedge
    volume Σ C(deg, 2) (both sides give identical counts — a butterfly
    has exactly one diagonal pair on each side — so the choice is pure
    cost and the oracle may fix either side).  Pair counts reduce
    combiner-first; per-pair C(c,2) partials sum into ONE row.
    Returns one row (butterflies, caterpillars, bf_cc)."""
    import ray.data as rd

    def norm(b: pa.Table) -> pa.Table:
        return pa.table({
            "a": b.column(src).cast(pa.int64()),
            "b": b.column(dst).cast(pa.int64())})

    pairs = distinct_tuples(
        edges.map_batches(norm, batch_format="pyarrow"), ["a", "b"],
        n_buckets=n_buckets or 64).materialize()
    if n_buckets is None:
        n_buckets = _auto_buckets(pairs.count())

    def deg_of(col: str):
        def part(b: pa.Table) -> pa.Table:
            u, c = np.unique(
                b.column(col).to_numpy(zero_copy_only=False),
                return_counts=True)
            return pa.table({col: pa.array(u),
                             "_d": pa.array(c.astype(np.int64))})

        return bucketed_groupby(
            pairs.map_batches(part, batch_format="pyarrow"), [col],
            lambda g: g.groupby(col, sort=False, as_index=False)[
                "_d"].sum(),
            n_buckets=n_buckets).materialize()

    da, db = deg_of("a"), deg_of("b")

    def wedge_cost(deg) -> int:
        t = deg.map_batches(
            lambda b: pa.table({"w": pa.array([int((lambda d: (
                d * (d - 1) // 2).sum())(b.column("_d").to_numpy(
                    zero_copy_only=False).astype(np.int64)))],
                pa.int64())}),
            batch_format="pyarrow").to_pandas()
        return int(t["w"].sum())

    # center side = smaller exact wedge volume (skew guard: a hot hub
    # on ONE side only inflates the side we then avoid)
    center, other = ("a", "b") if wedge_cost(da) <= wedge_cost(db) \
        else ("b", "a")

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([center, other], kind="mergesort")
        v = g[other].to_numpy()
        _, sizes = np.unique(g[center].to_numpy(), return_counts=True)
        rep = np.repeat(sizes, sizes) - 1 \
            - (np.arange(len(v)) - np.repeat(
                np.cumsum(sizes) - sizes, sizes))
        tot = int(rep.sum())
        if tot == 0:
            return pd.DataFrame({"u": np.array([], np.int64),
                                 "v": np.array([], np.int64),
                                 "c": np.array([], np.int64)})
        L = np.repeat(np.arange(len(v)), rep)
        R = L + (np.arange(tot) - np.repeat(
            np.cumsum(rep) - rep, rep)) + 1
        return pd.DataFrame({"u": v[L], "v": v[R],
                             "c": np.ones(tot, np.int64)}).groupby(
            ["u", "v"], sort=False, as_index=False)["c"].sum()

    wedge_parts = bucketed_groupby(pairs, [center], expand,
                                   n_buckets=n_buckets)
    codeg = bucketed_groupby(
        wedge_parts, ["u", "v"],
        lambda g: g.groupby(["u", "v"], sort=False,
                            as_index=False)["c"].sum(),
        n_buckets=n_buckets)

    bf_t = codeg.map_batches(
        lambda b: pa.table({"bf": pa.array([int((lambda c: (
            c * (c - 1) // 2).sum())(b.column("c").to_numpy(
                zero_copy_only=False).astype(np.int64)))], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    butterflies = int(bf_t["bf"].sum()) if len(bf_t) else 0

    # caterpillars: attach both degrees to every edge (broadcast the
    # node-bounded tables when they fit, else two bucketed joins)
    if da.count() + db.count() <= broadcast_threshold:
        import ray

        adf = da.to_pandas().sort_values("a", kind="mergesort")
        bdf = db.to_pandas().sort_values("b", kind="mergesort")
        ref = ray.put((adf["a"].to_numpy().astype(np.int64),
                       adf["_d"].to_numpy().astype(np.int64),
                       bdf["b"].to_numpy().astype(np.int64),
                       bdf["_d"].to_numpy().astype(np.int64)))

        def cat_partial(b: pa.Table, _ref=ref) -> pa.Table:
            an, ad, bn, bd = _get_blob(_ref)
            a = b.column("a").to_numpy(zero_copy_only=False)
            bb = b.column("b").to_numpy(zero_copy_only=False)
            w = ((ad[np.searchsorted(an, a)] - 1)
                 * (bd[np.searchsorted(bn, bb)] - 1))
            return pa.table({"cat": pa.array([int(w.sum())], pa.int64())})

        cat_ds = pairs.map_batches(cat_partial, batch_format="pyarrow")
    else:
        j = bucketed_join(
            bucketed_join(pairs, da.map_batches(
                lambda b: b.rename_columns(["a", "_da"]),
                batch_format="pyarrow"), ["a"], n_buckets=n_buckets),
            db.map_batches(lambda b: b.rename_columns(["b", "_db"]),
                           batch_format="pyarrow"),
            ["b"], n_buckets=n_buckets)

        def cat_partial2(b: pa.Table) -> pa.Table:
            w = ((b.column("_da").to_numpy(zero_copy_only=False)
                  .astype(np.int64) - 1)
                 * (b.column("_db").to_numpy(zero_copy_only=False)
                    .astype(np.int64) - 1))
            return pa.table({"cat": pa.array([int(w.sum())], pa.int64())})

        cat_ds = j.map_batches(cat_partial2, batch_format="pyarrow")

    ct = cat_ds.to_pandas()
    caterpillars = int(ct["cat"].sum()) if len(ct) else 0
    cc = (float(4 * butterflies) / float(caterpillars)
          if caterpillars else None)
    return rd.from_arrow(pa.table({
        "butterflies": pa.array([butterflies], pa.int64()),
        "caterpillars": pa.array([caterpillars], pa.int64()),
        "bf_cc": pa.array([cc], pa.float64())}))


def maximal_independent_set(edges, *, rounds: int = 6,
                            src: str = "src", dst: str = "dst",
                            n_buckets: int | None = None,
                            broadcast_threshold: int = BROADCAST_NODES):
    """Deterministic Luby-style MAXIMAL INDEPENDENT SET over a
    SYMMETRIC edge table (both directions present; self loops
    ignored): node priorities are the 63-bit BIJECTION mulrot63
    (functions/hashing.py) — distinct nodes get distinct priorities,
    so symmetry breaking is TIE-FREE and needs no id fallback.  Round
    r: an alive node joins the MIS iff it has no alive neighbor or
    its priority is strictly below every alive neighbor's; winners
    and their neighbors leave.  FIXED ``rounds`` (Luby converges in
    O(log n) rounds w.h.p.; once alive empties further rounds are
    no-ops, so the chained-CTE oracle mirrors round for round).

    Broadcast path: per round TWO edge maps (min alive-neighbor
    priority; neighbors-of-winners), node-bounded state via ray.put,
    edges never re-shuffle.  Bucketed path: per round one state join +
    combiner-first min reduce + one left join + semi/anti prunes, all
    on fixed-width rows.  Returns (node, round) for MIS members."""
    import ray.data as rd

    from ..functions.hashing import mulrot63

    edges, n_edges, n_buckets = _settled_edges(edges, n_buckets)

    def node_partial(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({NODE: pa.array(np.unique(np.concatenate([s, d])))})

    nodes = distinct_tuples(
        edges.map_batches(node_partial, batch_format="pyarrow"),
        [NODE], n_buckets=n_buckets)

    if n_edges <= broadcast_threshold:
        import ray

        alive = np.sort(nodes.to_pandas()[NODE].to_numpy()
                        .astype(np.int64))
        h = mulrot63(alive).astype(np.int64)
        out_nodes, out_round = [], []
        for r in range(1, rounds + 1):
            if len(alive) == 0:
                break
            ref = ray.put((alive, h))

            def nbr_min(b: pa.Table, _ref=ref) -> pa.Table:
                av, hv = _get_blob(_ref)
                s = b.column(src).to_numpy(zero_copy_only=False)
                d = b.column(dst).to_numpy(zero_copy_only=False)
                si = np.minimum(np.searchsorted(av, s), len(av) - 1)
                di = np.minimum(np.searchsorted(av, d), len(av) - 1)
                m = (av[si] == s) & (av[di] == d) & (s != d)
                df = pd.DataFrame({NODE: d[m], "m": hv[si[m]]}).groupby(
                    NODE, sort=False, as_index=False)["m"].min()
                return pa.Table.from_pandas(
                    df, preserve_index=False).replace_schema_metadata(None)

            red = bucketed_groupby(
                edges.map_batches(nbr_min, batch_format="pyarrow"),
                [NODE],
                lambda g: g.groupby(NODE, sort=False,
                                    as_index=False)["m"].min(),
                n_buckets=n_buckets).to_pandas()
            m_full = np.full(len(alive), np.iinfo(np.int64).max, np.int64)
            if len(red):
                rn = red[NODE].to_numpy().astype(np.int64)
                rm = red["m"].to_numpy().astype(np.int64)
                m_full[np.searchsorted(alive, rn)] = rm
            win = h < m_full  # isolated nodes: m = +inf, always win
            winners = alive[win]
            if len(winners) == 0:
                break
            out_nodes.append(winners)
            out_round.append(np.full(len(winners), r, np.int64))
            wref = ray.put(winners)

            def nbrs_of(b: pa.Table, _ref=wref) -> pa.Table:
                wv = _get_blob(_ref)
                s = b.column(src).to_numpy(zero_copy_only=False)
                d = b.column(dst).to_numpy(zero_copy_only=False)
                i = np.minimum(np.searchsorted(wv, s), len(wv) - 1)
                return pa.table({NODE: pa.array(
                    np.unique(d[wv[i] == s]))})

            nb = bucketed_groupby(
                edges.map_batches(nbrs_of, batch_format="pyarrow"),
                [NODE],
                lambda g: g.drop_duplicates(NODE),
                n_buckets=n_buckets).to_pandas()
            dead = np.union1d(winners, nb[NODE].to_numpy()
                              .astype(np.int64))
            keep = ~np.isin(alive, dead, assume_unique=False)
            alive, h = alive[keep], h[keep]
        if not out_nodes:
            return rd.from_arrow(pa.table({
                NODE: pa.array([], pa.int64()),
                "round": pa.array([], pa.int64())}))
        return rd.from_arrow(pa.table({
            NODE: pa.array(np.concatenate(out_nodes)),
            "round": pa.array(np.concatenate(out_round))}))

    # --- bucketed BSP path -------------------------------------------
    def with_h(b: pa.Table) -> pa.Table:
        v = b.column(NODE).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({NODE: pa.array(v),
                         "h": pa.array(mulrot63(v).astype(np.int64))})

    state = _settle(nodes.map_batches(with_h, batch_format="pyarrow"),
                    n_buckets)
    mis_parts = []
    for r in range(1, rounds + 1):
        if state.count() == 0:
            break
        sh = state.map_batches(
            lambda b: b.rename_columns([src, "_hs"]),
            batch_format="pyarrow")
        e1 = bucketed_join(edges.map_batches(
            lambda b: pa.table({src: b.column(src), dst: b.column(dst)}),
            batch_format="pyarrow"), sh, [src], n_buckets=n_buckets)

        def min_partial(b: pa.Table) -> pa.Table:
            s = b.column(src).to_numpy(zero_copy_only=False)
            d = b.column(dst).to_numpy(zero_copy_only=False)
            hs = b.column("_hs").to_numpy(
                zero_copy_only=False).astype(np.int64)
            m = s != d
            df = pd.DataFrame({NODE: d[m], "m": hs[m]}).groupby(
                NODE, sort=False, as_index=False)["m"].min()
            return pa.Table.from_pandas(
                df, preserve_index=False).replace_schema_metadata(None)

        nbrmin = bucketed_groupby(
            e1.map_batches(min_partial, batch_format="pyarrow"),
            [NODE],
            lambda g: g.groupby(NODE, sort=False,
                                as_index=False)["m"].min(),
            n_buckets=n_buckets)
        j = bucketed_join(state, nbrmin, [NODE], how="left",
                          n_buckets=n_buckets)

        def pick(b: pa.Table, _r=r) -> pa.Table:
            h_ = b.column("h").to_numpy(zero_copy_only=False)
            mcol = b.column("m")
            isnull = pc.is_null(mcol).to_numpy(zero_copy_only=False)
            mv = mcol.to_pandas().fillna(np.iinfo(np.int64).max) \
                .to_numpy().astype(np.int64)
            win = isnull | (h_ < mv)
            return pa.table({
                NODE: pa.array(b.column(NODE).to_numpy(
                    zero_copy_only=False)[win]),
                "round": pa.array(np.full(int(win.sum()), _r, np.int64))})

        winners = j.map_batches(pick, batch_format="pyarrow") \
            .materialize()
        if winners.count() == 0:
            break
        mis_parts.append(winners)
        wsrc = winners.map_batches(
            lambda b: pa.table({src: b.column(NODE)}),
            batch_format="pyarrow")
        nbrs = bucketed_join(edges, wsrc, [src], how="semi",
                             n_buckets=n_buckets).map_batches(
            lambda b: pa.table({NODE: b.column(dst)}),
            batch_format="pyarrow")
        wn = winners.map_batches(lambda b: b.select([NODE]),
                                 batch_format="pyarrow")
        state = bucketed_join(
            bucketed_join(state, wn, [NODE], how="anti",
                          n_buckets=n_buckets),
            nbrs, [NODE], how="anti", n_buckets=n_buckets)
        state = _settle(state, n_buckets)
    import functools

    if not mis_parts:
        return rd.from_arrow(pa.table({
            NODE: pa.array([], pa.int64()),
            "round": pa.array([], pa.int64())}))
    return functools.reduce(lambda a, b: a.union(b), mis_parts)


def minimum_spanning_forest(edges, *, src: str = "src", dst: str = "dst",
                            weight_col: str = "w", rounds: int = 8,
                            n_buckets: int | None = None,
                            broadcast_threshold: int = BROADCAST_NODES):
    """Borůvka MINIMUM SPANNING FOREST of an undirected weighted graph
    — the classic distributed MST plan (Borůvka 1926; the GHS /
    connected-components-with-weights shape): each round every
    component selects its minimum incident OUTGOING edge under the
    TOTAL order (w, u, v) (parallel edges pre-reduced to their min
    weight; the total order makes the forest UNIQUE and tie-free),
    selected edges join the forest, touching components contract.

    Per round: ONE map over the (never re-shuffled) edge table
    relabels endpoints by broadcast component ids and emits per-comp
    lexicographic-min partials; one bucketed reduce finds each comp's
    champion; hooking + 2-cycle break + pointer-jump contraction run
    driver-side on the NODE-BOUNDED component array (consistent
    tie-breaking means selection 2-cycles always share one edge, so
    the hook graph is a forest and jumping converges).  Rounds are
    FIXED (Borůvka halves components, <= log2 n rounds; converged
    rounds are no-ops) so the chained-CTE oracle mirrors round for
    round.  Returns forest edges (u, v, w) with u < v.

    State is node-bounded (the BROADCAST_NODES discipline); above the
    threshold the contraction belongs on the pinned actor-shard path
    (stages/pregel.py) — raises for now rather than degrade."""
    import ray
    import ray.data as rd

    edges, n_edges, n_buckets = _settled_edges(edges, n_buckets)

    def norm(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        w = b.column(weight_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = s != d
        df = pd.DataFrame({"u": np.minimum(s[m], d[m]),
                           "v": np.maximum(s[m], d[m]),
                           "w": w[m]}).groupby(
            ["u", "v"], sort=False, as_index=False)["w"].min()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    uedges = bucketed_groupby(
        edges.map_batches(norm, batch_format="pyarrow"), ["u", "v"],
        lambda g: g.groupby(["u", "v"], sort=False,
                            as_index=False)["w"].min(),
        n_buckets=n_buckets).materialize()

    def node_partial(b: pa.Table) -> pa.Table:
        x = np.concatenate([
            b.column("u").to_numpy(zero_copy_only=False),
            b.column("v").to_numpy(zero_copy_only=False)])
        return pa.table({NODE: pa.array(np.unique(x))})

    nodes_df = distinct_tuples(
        uedges.map_batches(node_partial, batch_format="pyarrow"),
        [NODE], n_buckets=n_buckets).to_pandas()
    nodes = np.sort(nodes_df[NODE].to_numpy().astype(np.int64))
    if len(nodes) > broadcast_threshold:
        raise NotImplementedError(
            "minimum_spanning_forest: node count exceeds the broadcast "
            "state bound; contract on the pinned actor-shard path")
    comp = nodes.copy()  # comp id per node (aligned with sorted nodes)

    fu, fv, fw = [], [], []
    for _ in range(rounds):
        ref = ray.put((nodes, comp))

        def champion(b: pa.Table, _ref=ref) -> pa.Table:
            ns, cp = _get_blob(_ref)
            u = b.column("u").to_numpy(zero_copy_only=False)
            v = b.column("v").to_numpy(zero_copy_only=False)
            w = b.column("w").to_numpy(
                zero_copy_only=False).astype(np.int64)
            cu = cp[np.searchsorted(ns, u)]
            cv = cp[np.searchsorted(ns, v)]
            m = cu != cv
            if not m.any():
                return pa.table({"comp": pa.array([], pa.int64()),
                                 "w": pa.array([], pa.int64()),
                                 "u": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64()),
                                 "tgt": pa.array([], pa.int64())})
            df = pd.DataFrame({
                "comp": np.concatenate([cu[m], cv[m]]),
                "w": np.concatenate([w[m], w[m]]),
                "u": np.concatenate([u[m], u[m]]),
                "v": np.concatenate([v[m], v[m]]),
                "tgt": np.concatenate([cv[m], cu[m]])})
            df = df.sort_values(["comp", "w", "u", "v"],
                                kind="mergesort")
            df = df.drop_duplicates("comp", keep="first")
            return pa.Table.from_pandas(
                df, preserve_index=False).replace_schema_metadata(None)

        def champ_fold(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["comp", "w", "u", "v"], kind="mergesort")
            return g.drop_duplicates("comp", keep="first")

        sel = bucketed_groupby(
            uedges.map_batches(champion, batch_format="pyarrow"),
            ["comp"], champ_fold, n_buckets=n_buckets).to_pandas()
        if len(sel) == 0:
            break
        # forest edges (an edge may be both endpoints' champion)
        eu = sel["u"].to_numpy().astype(np.int64)
        ev = sel["v"].to_numpy().astype(np.int64)
        ew = sel["w"].to_numpy().astype(np.int64)
        _, first = np.unique(np.stack([eu, ev], 1), axis=0,
                             return_index=True)
        fu.append(eu[first])
        fv.append(ev[first])
        fw.append(ew[first])

        # hooking over the CURRENT comp-id universe
        comps = np.unique(comp)
        parent = comps.copy()
        ci = np.searchsorted(comps, sel["comp"].to_numpy()
                             .astype(np.int64))
        parent[ci] = sel["tgt"].to_numpy().astype(np.int64)
        # 2-cycle break: c -> t -> c keeps the SMALLER id as root
        pt = parent[np.searchsorted(comps, parent)]
        two = (pt == comps) & (parent != comps) & (comps < parent)
        parent[two] = comps[two]
        # pointer jump to fixpoint (forest after the break)
        while True:
            nxt = parent[np.searchsorted(comps, parent)]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
        comp = parent[np.searchsorted(comps, comp)]

    if not fu:
        return rd.from_arrow(pa.table({
            "u": pa.array([], pa.int64()),
            "v": pa.array([], pa.int64()),
            "w": pa.array([], pa.int64())}))
    return rd.from_arrow(pa.table({
        "u": pa.array(np.concatenate(fu)),
        "v": pa.array(np.concatenate(fv)),
        "w": pa.array(np.concatenate(fw))}))


def strongly_connected_components(edges, *, src: str = "src",
                                  dst: str = "dst", max_rounds: int = 12,
                                  inner_rounds: int = 192,
                                  n_buckets: int | None = None,
                                  broadcast_threshold: int = BROADCAST_NODES,
                                  engine: str = "auto"):
    """STRONGLY-connected components of a DIRECTED edge Dataset:
    (node, comp) with comp the MINIMUM node id of the SCC — the
    directed sibling of :func:`connected_components`, via min-pivot
    forward-backward label REFINEMENT (the distributed FW-BW/coloring
    family — Fleischer 2000; Orzan 2004's color propagation):

    every node carries a block label ``part`` (invariant: the min node
    id of its block; blocks only ever REFINE, and an SCC is never
    split because mutually-reachable nodes always agree on both
    propagated labels).  DIRECTED min propagation is inherently
    O(block diameter) edge passes worst case — pointer jumps only
    compress DESCENDING label chains, they cannot shortcut a distant
    minimum crawling through locally-minimal waypoints (unlike the
    undirected hash-to-min trick), hence the generous ``inner_rounds``
    budget: unused passes cost nothing (the loop exits at the
    fixpoint), and diameter-deep graphs need it.  Per outer round,
    restricted to SAME-BLOCK edges:

        f(v) = min id that REACHES v      (forward min propagation)
        b(v) = min id REACHABLE FROM v    (backward min propagation)
        part'(v) = min node id of the (part, f, b) class

    The block-min pivot m gets (m, m, m) while every non-SCC(m) node
    in its block differs in f or b (f=b=m would mean mutual
    reachability with m), so each round peels at least one SCC per
    live block; at the fixpoint blocks ARE the SCCs.  Each inner
    propagation runs to ITS fixpoint (relax + pointer jump — f(f(v))
    reaches f(v) reaches v, all in-block, so jumping is sound and
    convergence is O(log diameter) edge passes); a non-converged
    inner pass would split blocks spuriously, so both paths raise
    RuntimeError rather than return a partial refinement.

    Broadcast path (<= ``broadcast_threshold`` nodes): part/f/b are
    driver arrays shipped per inner pass via ray.put — the edge table
    NEVER re-shuffles, pointer jumps and the regroup are free numpy /
    hash-group gathers.  Bucketed BSP path above it: per outer round
    the edge table is annotated once with both endpoint parts and
    filtered to active (same-block) edges, then each inner pass is
    the connected_components relax+jump plan on those directed
    edges."""
    edges, n_edges, n_buckets = _settled_edges(edges, n_buckets)
    if _route_pinned(engine, n_edges):
        from .pregel import pinned_scc

        return pinned_scc(edges, src=src, dst=dst,
                          max_rounds=max_rounds,
                          inner_rounds=inner_rounds)

    def node_partial(b: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            b.column(src).to_numpy(zero_copy_only=False).astype(np.int64),
            b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64),
        ]))
        return pa.table({NODE: pa.array(u)})

    nodes = bucketed_groupby(
        edges.map_batches(node_partial, batch_format="pyarrow"),
        [NODE], lambda g: g.drop_duplicates(NODE), n_buckets=n_buckets,
    ).materialize()
    n_nodes = nodes.count()

    import ray
    import ray.data as rd

    if n_nodes == 0:
        return rd.from_arrow(pa.table({NODE: pa.array([], pa.int64()),
                                       "comp": pa.array([], pa.int64())}))

    def take_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(NODE, sort=False, as_index=False)["lab"].min()

    if n_nodes <= broadcast_threshold:
        ns = np.sort(nodes.to_pandas()[NODE].to_numpy().astype(np.int64))
        part = np.full(len(ns), ns[0], dtype=np.int64)

        def take_min2(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby([NODE, "dir"], sort=False,
                             as_index=False)["lab"].min()

        def prop_fixpoint(part: np.ndarray, e_cur):
            """Run the forward AND backward propagations to their
            fixpoints in the SAME edge passes (they are independent,
            so the pass count is max(fwd, bwd) instead of the sum —
            executions dominate wall time here)."""
            f = ns.copy()
            bk = ns.copy()
            f_done = b_done = False
            for _ in range(inner_rounds):
                ref = ray.put((ns, part, f, bk, f_done, b_done))

                def relax(b: pa.Table, _ref=ref) -> pa.Table:
                    nsl, pt, fl, bl, fd, bd = _get_blob(_ref)
                    s = b.column(src).to_numpy(zero_copy_only=False)
                    d = b.column(dst).to_numpy(zero_copy_only=False)
                    si = np.searchsorted(nsl, s)
                    di = np.searchsorted(nsl, d)
                    m = pt[si] == pt[di]
                    frames = []
                    if not fd:      # forward: min reacher flows s -> d
                        frames.append(pd.DataFrame({
                            NODE: d[m], "dir": np.int64(0),
                            "lab": fl[si[m]]}))
                    if not bd:      # backward: min reachable flows d -> s
                        frames.append(pd.DataFrame({
                            NODE: s[m], "dir": np.int64(1),
                            "lab": bl[di[m]]}))
                    df = pd.concat(frames, ignore_index=True).groupby(
                        [NODE, "dir"], sort=False,
                        as_index=False)["lab"].min()
                    return pa.Table.from_pandas(
                        df, preserve_index=False) \
                        .replace_schema_metadata(None)

                red = bucketed_groupby(
                    e_cur.map_batches(relax, batch_format="pyarrow"),
                    [NODE, "dir"], take_min2, n_buckets=n_buckets,
                ).to_pandas()
                if len(red) == 0:   # no active candidates at all
                    return f, bk

                def apply(lab: np.ndarray, dirno: int) -> np.ndarray:
                    new = lab.copy()
                    part_r = red[red["dir"] == dirno]
                    if len(part_r):
                        idx = np.searchsorted(
                            ns, part_r[NODE].to_numpy().astype(np.int64))
                        np.minimum.at(
                            new, idx,
                            part_r["lab"].to_numpy().astype(np.int64))
                    while True:  # pointer jumps — free driver gathers
                        j = np.minimum(new, new[np.searchsorted(ns, new)])
                        if np.array_equal(j, new):
                            break
                        new = j
                    return new

                if not f_done:
                    nf = apply(f, 0)
                    f_done = np.array_equal(nf, f)
                    f = nf
                if not b_done:
                    nb = apply(bk, 1)
                    b_done = np.array_equal(nb, bk)
                    bk = nb
                if f_done and b_done:
                    return f, bk
            raise RuntimeError(
                f"scc inner propagation did not converge in "
                f"{inner_rounds} relax+jump passes; raise inner_rounds")

        e_cur = edges
        final = np.zeros(len(ns), dtype=bool)
        for _ in range(max_rounds):
            if np.array_equal(part, ns):      # all singletons
                break
            f, bk = prop_fixpoint(part, e_cur)
            df = pd.DataFrame({"p": part, "f": f, "b": bk, "v": ns})
            cand = df.groupby(["p", "f", "b"], sort=False)["v"] \
                .transform("min").to_numpy().astype(np.int64)
            # FINAL blocks are frozen: their edges were peeled, so the
            # reset self-labels would spuriously re-split them
            newp = np.where(final, part, cand)
            if np.array_equal(newp, part):
                break
            part = newp
            # a class with f == b == its min is PROVABLY a whole SCC
            # (every member mutually reaches the pivot) — it never
            # splits again, so drop its edges: later rounds scan only
            # the still-live fraction (the FW-BW "peel" made literal)
            final = final | ((f == bk) & (f == newp))
            if final.all():
                break
            fref = ray.put((ns, final))

            def live(b: pa.Table, _ref=fref) -> pa.Table:
                nsl, fin = _get_blob(_ref)
                s = b.column(src).to_numpy(zero_copy_only=False)
                d = b.column(dst).to_numpy(zero_copy_only=False)
                keep = (~fin[np.searchsorted(nsl, s)]
                        & ~fin[np.searchsorted(nsl, d)])
                return b.filter(pa.array(keep))

            e_cur = edges.map_batches(
                live, batch_format="pyarrow").materialize()
        else:
            raise RuntimeError(
                f"scc did not converge in {max_rounds} refinement "
                "rounds (each peels >= one SCC per live block); raise "
                "max_rounds")
        return rd.from_arrow(pa.table({NODE: pa.array(ns),
                                       "comp": pa.array(part)}))

    # ---- bucketed BSP path (state too big to broadcast) ----
    gmin = int(nodes.min(NODE))
    part = _settle(nodes.map_batches(
        lambda b: pa.table({
            NODE: b.column(NODE),
            "part": pa.array(np.full(len(b), gmin, np.int64))}),
        batch_format="pyarrow"), n_buckets)

    def prop_fix_bucketed(e_act, reverse: bool):
        lab = _settle(nodes.map_batches(
            lambda b: pa.table({NODE: b.column(NODE),
                                "lab": b.column(NODE)}),
            batch_format="pyarrow"), n_buckets)
        join_col, emit_col = (dst, src) if reverse else (src, dst)

        def relax_partial(b: pa.Table) -> pa.Table:
            d = b.column(emit_col).to_numpy(zero_copy_only=False)
            lv = b.column("lab").to_numpy(zero_copy_only=False)
            df = pd.DataFrame({NODE: d, "lab": lv}).groupby(
                NODE, sort=False, as_index=False)["lab"].min()
            return pa.Table.from_pandas(
                df, preserve_index=False).replace_schema_metadata(None)

        prev_sum = None
        for _ in range(inner_rounds):
            joined = _propagated(e_act, lab, src=join_col,
                                 n_buckets=n_buckets)
            relaxed = joined.map_batches(relax_partial,
                                         batch_format="pyarrow")
            lab = _settle(bucketed_groupby(
                lab.union(relaxed), [NODE], take_min,
                n_buckets=n_buckets), n_buckets)
            parent = lab.map_batches(
                lambda b: pa.table({"lab": b.column(NODE),
                                    "_p": b.column("lab")}),
                batch_format="pyarrow")
            lab = _settle(bucketed_join(
                lab, parent, ["lab"], n_buckets=n_buckets,
            ).map_batches(
                lambda b: pa.table({NODE: b.column(NODE),
                                    "lab": b.column("_p")}),
                batch_format="pyarrow"), n_buckets)
            new_sum = lab.sum("lab", ignore_nulls=False)
            if new_sum == prev_sum:
                return lab
            prev_sum = new_sum
        raise RuntimeError(
            f"scc inner propagation did not converge in {inner_rounds} "
            "relax+jump passes; raise inner_rounds")

    prev_part_sum = None
    for _ in range(max_rounds):
        # annotate both endpoints' parts once per round; keep only
        # same-block edges — the inner passes then need no part check
        ann = _propagated(edges, part, src=src, n_buckets=n_buckets)
        pd_state = part.map_batches(
            lambda b: pa.table({dst: b.column(NODE),
                                "_pd": b.column("part")}),
            batch_format="pyarrow")
        e_act = _settle(bucketed_join(
            ann, pd_state, [dst], n_buckets=n_buckets,
        ).map_batches(
            lambda b: b.filter(pc.equal(b.column("part"),
                                        b.column("_pd")))
            .select([src, dst]),
            batch_format="pyarrow"), n_buckets)
        f_state = prop_fix_bucketed(e_act, False).map_batches(
            lambda b: pa.table({NODE: b.column(NODE),
                                "_f": b.column("lab")}),
            batch_format="pyarrow")
        b_state = prop_fix_bucketed(e_act, True).map_batches(
            lambda b: pa.table({NODE: b.column(NODE),
                                "_b": b.column("lab")}),
            batch_format="pyarrow")
        fb = bucketed_join(f_state, b_state, [NODE], n_buckets=n_buckets)
        all3 = _settle(bucketed_join(fb, part, [NODE],
                                     n_buckets=n_buckets), n_buckets)

        def regroup(g: pd.DataFrame) -> pd.DataFrame:
            np_ = g.groupby(["part", "_f", "_b"], sort=False)[NODE] \
                .transform("min")
            return pd.DataFrame({NODE: g[NODE].to_numpy(),
                                 "part": np_.to_numpy()})

        part = _settle(bucketed_groupby(
            all3, ["part", "_f", "_b"], regroup, n_buckets=n_buckets),
            n_buckets)
        new_sum = part.sum("part", ignore_nulls=False)
        if new_sum == prev_part_sum:
            return part.map_batches(
                lambda b: pa.table({NODE: b.column(NODE),
                                    "comp": b.column("part")}),
                batch_format="pyarrow")
        prev_part_sum = new_sum
    raise RuntimeError(
        f"scc did not converge in {max_rounds} refinement rounds "
        "(each peels >= one SCC per live block); raise max_rounds")


def bowtie_decomposition(edges, *, src: str = "src", dst: str = "dst",
                         max_hops: int = 64, max_rounds: int = 12,
                         n_buckets: int | None = None,
                         broadcast_threshold: int = BROADCAST_NODES):
    """BOW-TIE decomposition of a directed graph (Broder et al. 2000,
    the web-graph macro-structure): the GIANT SCC (largest component,
    ties to the smaller comp id), IN = nodes that reach it, OUT =
    nodes it reaches, OTHER = tendrils/tubes/disconnected.  Composes
    :func:`strongly_connected_components` with two multi-source
    :func:`bfs_hops` sweeps (forward on the edges, backward on the
    swapped edges) seeded by the giant SCC's members — IN and OUT are
    provably disjoint from each other and from the SCC (overlap would
    mean mutual reachability), so the counts are three Dataset counts.

    ``max_hops`` bounds the reachability sweeps (frontier-delta BFS
    stops early when the frontier empties, so a generous bound is
    cheap on shallow graphs); a graph with true eccentricity beyond it
    undercounts IN/OUT — raise the bound.  Output ONE row
    (n_nodes, giant_comp, n_scc, n_in, n_out, n_other)."""
    import ray.data as rd  # noqa: F401  (parity with sibling ops)

    edges = edges.materialize()
    comp = strongly_connected_components(
        edges, src=src, dst=dst, max_rounds=max_rounds,
        n_buckets=n_buckets,
        broadcast_threshold=broadcast_threshold).materialize()
    n_nodes = comp.count()
    if n_nodes == 0:
        return pa.table({
            "n_nodes": pa.array([0], pa.int64()),
            "giant_comp": pa.array([None], pa.int64()),
            "n_scc": pa.array([0], pa.int64()),
            "n_in": pa.array([0], pa.int64()),
            "n_out": pa.array([0], pa.int64()),
            "n_other": pa.array([0], pa.int64())})
    if n_buckets is None:
        n_buckets = _auto_buckets(n_nodes)

    def size_partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(b.column("comp").to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"comp": pa.array(u.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    sizes = bucketed_groupby(
        comp.map_batches(size_partial, batch_format="pyarrow"),
        ["comp"],
        lambda g: g.groupby("comp", sort=False, as_index=False)["c"].sum(),
        n_buckets=n_buckets)
    top = sizes.map_batches(  # block-local top then a tiny driver pick
        lambda b: b.sort_by([("c", "descending"), ("comp", "ascending")])
        .slice(0, 1),
        batch_format="pyarrow",
    ).to_pandas()  # bounded: ONE row per block
    top = top.sort_values(["c", "comp"], ascending=[False, True],
                          kind="mergesort")
    giant = int(top["comp"].iloc[0])

    seeds = comp.map_batches(
        lambda b, _g=giant: pa.table({
            NODE: b.filter(pc.equal(b.column("comp"),
                                    pa.scalar(_g, pa.int64())))
            .column(NODE)}),
        batch_format="pyarrow").materialize()
    n_scc = seeds.count()

    fwd = bfs_hops(edges, seeds, src=src, dst=dst, max_hops=max_hops,
                   n_buckets=n_buckets,
                   broadcast_threshold=broadcast_threshold)
    rev = edges.map_batches(
        lambda b: pa.table({src: b.column(dst), dst: b.column(src)}),
        batch_format="pyarrow")
    bwd = bfs_hops(rev, seeds, src=src, dst=dst, max_hops=max_hops,
                   n_buckets=n_buckets,
                   broadcast_threshold=broadcast_threshold)
    n_out = fwd.count() - n_scc
    n_in = bwd.count() - n_scc
    return pa.table({
        "n_nodes": pa.array([n_nodes], pa.int64()),
        "giant_comp": pa.array([giant], pa.int64()),
        "n_scc": pa.array([n_scc], pa.int64()),
        "n_in": pa.array([n_in], pa.int64()),
        "n_out": pa.array([n_out], pa.int64()),
        "n_other": pa.array([n_nodes - n_scc - n_in - n_out],
                            pa.int64())})


def negative_edge_sample(edges, *, k: int, slack: int = 2,
                         src: str = "src", dst: str = "dst",
                         n_buckets: int | None = None):
    """DETERMINISTIC negative sampling for link prediction (the GNN
    training-data prep step): for every node u, up to ``k`` NON-edges
    (u, v) — candidates come from the SQL-mirrorable mulrot63 hash
    h(u·64 + j) mapped onto the sorted node array (j = 0..k·slack−1,
    so ``k·slack <= 64``), self-pairs and EXISTING directed edges are
    excluded exactly (bucketed anti join against the distinct edge
    set — no Bloom approximation), and the first ``k`` survivors in
    j order win.  No RNG state: re-running any shard reproduces the
    same sample (the temp_sample/wsample hash-predicate discipline).
    Output (src, neg, j)."""
    import ray

    from ..functions.hashing import mulrot63

    if k * slack > 64:
        raise ValueError("k * slack must be <= 64 (hash lane budget)")
    edges, n_edges, n_buckets = _settled_edges(edges, n_buckets)

    def node_partial(b: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            b.column(src).to_numpy(zero_copy_only=False).astype(np.int64),
            b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64),
        ]))
        return pa.table({NODE: pa.array(u)})

    nodes = bucketed_groupby(
        edges.map_batches(node_partial, batch_format="pyarrow"),
        [NODE], lambda g: g.drop_duplicates(NODE), n_buckets=n_buckets,
    ).materialize()
    ns = np.sort(nodes.to_pandas()[NODE].to_numpy().astype(np.int64))
    if len(ns) == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            src: pa.array([], pa.int64()),
            "neg": pa.array([], pa.int64()),
            "j": pa.array([], pa.int64())}))
    ref = ray.put(ns)
    nj = k * slack

    def cand(b: pa.Table, _ref=ref) -> pa.Table:
        nsl = _get_blob(_ref)
        u = b.column(NODE).to_numpy(zero_copy_only=False)
        uu = np.repeat(u, nj)
        jj = np.tile(np.arange(nj, dtype=np.int64), len(u))
        h = mulrot63((uu * 64 + jj).astype(np.uint64))
        v = nsl[(h % np.uint64(len(nsl))).astype(np.int64)]
        keep = v != uu
        return pa.table({src: pa.array(uu[keep]),
                         dst: pa.array(v[keep]),
                         "j": pa.array(jj[keep])})

    cands = nodes.map_batches(cand, batch_format="pyarrow")
    dedup_e = distinct_tuples(edges, [src, dst], n_buckets=n_buckets)
    fresh = bucketed_join(cands, dedup_e, [src, dst], how="anti",
                          n_buckets=n_buckets)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([src, "j"], kind="mergesort")
        # two lanes can hash to the same target: keep the smallest-j
        # copy of each (u, v) so the k cap counts DISTINCT negatives
        # (round-4 advice item 2)
        g = g.drop_duplicates([src, dst], keep="first")
        pos = g.groupby(src, sort=False).cumcount()
        out = g[pos < k].rename(columns={dst: "neg"})
        return out[[src, "neg", "j"]]

    return bucketed_groupby(fresh, [src], topk, n_buckets=n_buckets)


def seed_harmonic_centrality(edges, seeds, *, max_hops: int = 3,
                        src: str = "src", dst: str = "dst",
                        n_buckets: int | None = None,
                        broadcast_threshold: int = BROADCAST_NODES,
                        engine: str = "auto"):
    """Bounded-hop HARMONIC CENTRALITY of every node with respect to a
    (small-by-contract) SEED set: h(v) = Σ_{s∈S, 0<d(s,v)<=H} 1/d(s,v)
    — the influence/reachability score that, unlike closeness, handles
    disconnection natively.

    Exact rational arithmetic: distances are hops <= ``max_hops``, so
    every 1/d lands on the lcm(1..H) lattice — ``hnum = Σ L // d`` is
    an exact int64 and ``h = hnum / L`` is the ONE mirrored division.

    Plan: one bounded BFS per seed (seed sets personalize — the ppr
    seed-contract; each BFS is the bfs_hops engine, auto-routable to
    the pinned path) → union tagged per seed → one bucketed per-node
    reduce.  Output (node, n_from, hnum, h); nodes reached by no seed
    (or only at d=0) emit nothing.
    """
    import math

    import pandas as pd
    import ray.data as rd

    from .bucketed import bucketed_groupby

    L = math.lcm(*range(1, max_hops + 1))
    seed_ids = np.sort(np.unique(
        seeds.to_pandas()[NODE].to_numpy().astype(np.int64)))
    if len(seed_ids) == 0:
        raise ValueError("harmonic_centrality needs >= 1 seed")
    edges, n_edges, n_buckets = _settled_edges(edges, n_buckets)

    runs = []
    for sid in seed_ids.tolist():
        one = rd.from_arrow(pa.table({NODE: pa.array([sid], pa.int64())}))
        d = bfs_hops(edges, one, src=src, dst=dst, max_hops=max_hops,
                     n_buckets=n_buckets,
                     broadcast_threshold=broadcast_threshold,
                     engine=engine)
        runs.append(d)
    alld = runs[0]
    for r in runs[1:]:
        alld = alld.union(r)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        dist = g["dist"].to_numpy().astype(np.int64)
        g = g[dist > 0]
        if len(g) == 0:
            return pd.DataFrame({NODE: pd.Series([], dtype="int64"),
                                 "n_from": pd.Series([], dtype="int64"),
                                 "hnum": pd.Series([], dtype="int64"),
                                 "h": pd.Series([], dtype="float64")})
        d = g["dist"].to_numpy().astype(np.int64)
        df = pd.DataFrame({NODE: g[NODE].to_numpy().astype(np.int64),
                           "q": L // d})
        out = df.groupby(NODE, as_index=False).agg(
            n_from=("q", "size"), hnum=("q", "sum"))
        out["n_from"] = out["n_from"].astype(np.int64)
        out["hnum"] = out["hnum"].astype(np.int64)
        out["h"] = out["hnum"].to_numpy().astype(np.float64) / float(L)
        return out

    return bucketed_groupby(alld, [NODE], fold, n_buckets=n_buckets)
