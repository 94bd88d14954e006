"""Distributed graph algorithms over edge tables.

Connected components lives in pipelines/dedup.py (it grew out of the
near-dup clusterer); this module holds the general-purpose iterative
algorithms. Both follow the same house rules for iterative Dataset loops
(build-notes "CC-loop lesson"): the carried table is ``repartition``-ed to a
FIXED block count and ``materialize()``-d every iteration — union/join
chains otherwise triple the block count per iteration — and every step is a
standard exchange (shuffle_join / groupby_agg), never a driver-side matrix.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.functions import arrays as A


def pagerank(edges, src: str = "src", dst: str = "dst", damping: float = 0.85,
             iters: int = 5, state_blocks: int = 16, fixed_point: int | None = None,
             driver_node_budget: int = 2_000_000):
    """Fixed-iteration PageRank: ``r_0 = 1`` for every node;
    ``r_{i+1}(v) = (1-d) + d * sum over edges (u -> v) of r_i(u)/outdeg(u)``.

    This is the classic unnormalized formulation (dangling-node mass is NOT
    redistributed — documented divergence from the random-surfer variant;
    the SQL oracle uses the identical recurrence). Duplicate edges count
    once each (SQL parity: the oracle aggregates the raw edge table).

    ``fixed_point=S`` switches to the integer-exact variant: ranks live in
    1/S units (int64), contributions are FLOOR(rank // outdeg) and the
    damping step is ``(1-d)*S + floor(d_num * sum / d_den)`` with damping
    expressed as a rational (e.g. 0.85 = 17/20). Every operation is integer
    arithmetic, so the result is bit-identical across engines and
    accumulation orders (the cross-engine float-sum ULP problem, build-notes
    rule "compare exact integer forms"); output column ``rank`` is int64
    micro-units. Requires ``damping`` with an exact small-denominator
    rational (q/100 supported).

    Scale plan, per iteration (everything distributed, state is O(nodes)):
      1. ``shuffle_join`` edges with the (node, rank, outdeg) state on the
         source — per-edge contribution ``rank/outdeg`` is one vectorized
         divide;
      2. ``groupby_agg`` sums contributions per destination (per-block
         partials, tiny exchange);
      3. a left ``shuffle_join`` folds the sums back onto the full node
         state (nodes with no in-edges get the (1-d) floor).
    The state is repartitioned to ``state_blocks`` and materialized each
    iteration (fixed block count, no recompute chains). ``edges`` is
    materialized once up front so iterations do not re-run the upstream
    read. Returns (node, rank).

    When the node count fits ``driver_node_budget``, the state is instead
    held as ONE driver table broadcast to the edge scan (``ray.put`` once
    per iteration) — each iteration is then a single distributed pass
    (broadcast join + contribution map + partial-agg sum) with no
    sort-shuffles at all; the per-iteration driver work is O(nodes). Above
    the budget the fully distributed 3-exchange loop runs (a 100-TB web
    graph with billions of nodes never ships state to the driver)."""
    from kamae_ray.stages.aggregate import groupby_agg
    from kamae_ray.stages.join import shuffle_join

    if iters < 0:
        raise ValueError("iters must be >= 0")
    is_table = isinstance(edges, pa.Table)

    def _map(x, fn, name):
        if isinstance(x, pa.Table):
            return fn(x)
        fn.__name__ = name
        return x.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                             batch_size=None)

    def _checkpoint(state):
        if isinstance(state, pa.Table):
            return state
        return state.repartition(state_blocks).materialize()

    if not is_table:
        edges = edges.materialize()

    # node universe AND out-degree in ONE exchange: sources contribute a 1
    # per edge, destinations a 0 — the per-node sum IS the out-degree, and
    # every endpoint appears (a pure sink sums to 0 -> deg null below)
    def endpoint_ones(b: pa.Table) -> pa.Table:
        n = b.num_rows
        # src and dst must share one arrow type (single node-id domain)
        return pa.table({
            "node": pa.concat_arrays([A.as_array(b.column(src)), A.as_array(b.column(dst))]),
            "__kr_one": pa.array(np.concatenate([np.ones(n), np.zeros(n)]).astype(np.int64)),
        })

    agg = groupby_agg(_map(edges, endpoint_ones, "pr_endpoints"), "node",
                      {"__kr_one": ["sum"]})

    def node_state(b: pa.Table) -> pa.Table:
        s = pc.cast(pc.fill_null(b.column("__kr_one_sum"), 0.0), pa.float64(), safe=False)
        sv = s.to_numpy(zero_copy_only=False)
        deg = pa.array(np.where(sv > 0, sv, np.nan))
        return pa.table({"node": b.column("node"), "deg": deg})

    state = _map(agg, node_state, "pr_node_state")
    d_num = int(round(damping * 100))
    if fixed_point is not None and not np.isclose(d_num / 100.0, damping):
        raise ValueError("fixed_point needs damping expressible as q/100")

    def init_rank(b: pa.Table) -> pa.Table:
        if fixed_point is not None:
            r = pa.array(np.full(b.num_rows, fixed_point, np.int64))
        else:
            r = pa.array(np.ones(b.num_rows, np.float64))
        return pa.table({"node": b.column("node"), "rank": r, "deg": b.column("deg")})

    state = _checkpoint(_map(state, init_rank, "pr_init"))

    def contrib(b: pa.Table) -> pa.Table:
        if fixed_point is not None:
            r = b.column("rank").to_numpy(zero_copy_only=False).astype(np.int64)
            g = b.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
            w = pa.array(r // g)  # exact integer floor per edge
        else:
            w = pc.divide(pc.cast(b.column("rank"), pa.float64()), b.column("deg"))
        return pa.table({"node": A.as_array(b.column(dst)), "w": w})

    def fold(b: pa.Table) -> pa.Table:
        if fixed_point is not None:
            # groupby_agg sums in float64 — exact for integers < 2^53
            s = pc.fill_null(pc.cast(b.column("w_sum"), pa.int64(), safe=False), 0)
            sv = s.to_numpy(zero_copy_only=False)
            r = pa.array((100 - d_num) * fixed_point // 100 + d_num * sv // 100)
        else:
            s = pc.fill_null(pc.cast(b.column("w_sum"), pa.float64(), safe=False), 0.0)
            r = pc.add(pa.scalar(1.0 - damping), pc.multiply(pa.scalar(damping), s))
        return pa.table({"node": b.column("node"), "rank": r, "deg": b.column("deg")})

    def as_src(b: pa.Table) -> pa.Table:
        return pa.table({src: b.column("node"), "rank": b.column("rank"),
                         "deg": b.column("deg")})

    driver_state = False
    if not is_table:
        from kamae_ray.base import collect_tables

        if state.count() <= driver_node_budget:
            driver_state = True
            state = pa.concat_tables([t for t in collect_tables(state) if t.num_rows])

    if driver_state and fixed_point is not None and state.column("node").null_count == 0:
        # Vectorized driver loop for the EXACT integer recurrence: encode
        # edge endpoints to dense node codes ONCE (one pass, materialized as
        # two int64 columns), then each iteration is ONE map over the coded
        # edges — gather rank/deg by src code, exact floor-div contribution,
        # per-block segmented sum by dst code — plus a driver fold of the
        # (code, sum) partials. No sort exchange, no join per iteration
        # (integer sums are order-free, so the driver merge is exact).
        # Null endpoints drop at encode (SQL: null never matches — identical
        # to the joins they replace). Driver state stays O(nodes), same
        # budget as the broadcast path.
        import ray

        from kamae_ray.base import collect_tables
        from kamae_ray.functions import arrays as _A
        from kamae_ray.functions import segments as _S

        node_arr = state.column("node").combine_chunks()
        n_nodes = len(node_arr)
        deg_f = pc.cast(state.column("deg"), pa.float64(), safe=False).to_numpy(zero_copy_only=False)
        deg_i = np.where(np.isnan(deg_f), 1, deg_f).astype(np.int64)  # sinks never appear as src
        rank = pc.cast(state.column("rank"), pa.int64(), safe=False).to_numpy(zero_copy_only=False).astype(np.int64, copy=True)
        nk_ref = ray.put(node_arr)

        def encode(b: pa.Table) -> pa.Table:
            nkv = ray.get(nk_ref)
            sc = pc.index_in(_A.as_array(b.column(src)), value_set=nkv)
            dc = pc.index_in(_A.as_array(b.column(dst)), value_set=nkv)
            ok = pc.and_(pc.is_valid(sc), pc.is_valid(dc))
            t = pa.table({"s": pc.cast(sc, pa.int64()), "d": pc.cast(dc, pa.int64())})
            return t.filter(ok)

        encode.__name__ = "pr_encode_edges"
        coded = edges.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True,
                                  batch_size=None).materialize()
        deg_ref = ray.put(deg_i)
        for _ in range(iters):
            rank_ref = ray.put(rank)

            def it_pass(b: pa.Table, _r=rank_ref) -> pa.Table:
                r = ray.get(_r)
                dg = ray.get(deg_ref)
                s = b.column("s").to_numpy(zero_copy_only=False)
                d = b.column("d").to_numpy(zero_copy_only=False)
                w = r[s] // dg[s]
                order = np.argsort(d, kind="stable")
                starts, _l = _S.segments(d[order])
                return pa.table({"d": pa.array(d[order][starts]),
                                 "w": pa.array(np.add.reduceat(w[order], starts))})

            it_pass.__name__ = "pr_iter_pass"
            parts = [t for t in collect_tables(
                coded.map_batches(it_pass, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=None)
            ) if t.num_rows]
            sv = np.zeros(n_nodes, np.int64)
            if parts:
                allp = pa.concat_tables(parts)
                dd = allp.column("d").to_numpy(zero_copy_only=False)
                ww = allp.column("w").to_numpy(zero_copy_only=False)
                order = np.argsort(dd, kind="stable")
                starts, _l = _S.segments(dd[order])
                sv[dd[order][starts]] = np.add.reduceat(ww[order], starts)
            rank = (100 - d_num) * fixed_point // 100 + d_num * sv // 100

        return ray.data.from_arrow(pa.table({"node": node_arr, "rank": pa.array(rank)}))

    for _ in range(iters):
        if driver_state:
            from kamae_ray.stages.join import broadcast_join

            # ONE distributed pass: broadcast the (node, rank, deg) state to
            # the edge scan, per-edge contribution, partial-agg sum per dst
            joined = broadcast_join(edges, as_src(state), on=src,
                                    right_cols=["rank", "deg"], how="inner")
            sums = groupby_agg(_map(joined, contrib, "pr_contrib"), "node", {"w": ["sum"]})
            nonempty = [t for t in collect_tables(sums) if t.num_rows]
            sums = pa.concat_tables(nonempty) if nonempty else pa.table(
                {"node": state.column("node").slice(0, 0),
                 "w_sum": pa.array([], pa.float64())}
            )
            state = fold(shuffle_join(state, sums, on="node",
                                      right_cols=["w_sum"], how="left"))
            continue
        # fully distributed loop: edges enriched with the source's
        # (rank, deg) via one sort-shuffle
        src_state = _map(state, as_src, "pr_state_as_src")
        joined = shuffle_join(edges, src_state, on=src,
                              right_cols=["rank", "deg"], how="inner")
        sums = groupby_agg(_map(joined, contrib, "pr_contrib"), "node", {"w": ["sum"]})
        state = shuffle_join(state, sums, on="node", right_cols=["w_sum"], how="left")
        state = _checkpoint(_map(state, fold, "pr_fold"))

    if driver_state:
        import ray

        return ray.data.from_arrow(
            pa.table({"node": state.column("node"), "rank": state.column("rank")})
        )

    def project(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"), "rank": b.column("rank")})

    return _map(state, project, "pr_project")


def triangle_count(edges, src: str = "src", dst: str = "dst"):
    """Exact triangle count of the undirected simple graph underlying an
    edge table — the classic graph-health / clustering-coefficient
    numerator, computed with the canonical two-join plan (every triangle
    {a < b < c} materializes exactly once as the wedge a-b-c closed by edge
    (a, c)):

    1. canonicalize: (min, max) per edge, self-loops and null endpoints
       dropped, ``distinct`` (block combiner + ONE sort — the exchange
       carries at most one row per (block, edge)).
    2. wedges: sort-shuffle equi-join of the edge list with itself on the
       middle vertex (left (a,b) x right (b,c) keeps a < b < c for free);
       ``salt_partitions="auto"`` handles hot middle vertices. Wedge volume
       is sum-of-deg^2-bounded — cap hub degrees upstream for power-law
       graphs (the standard mitigation) or the join streams its chunked
       hot-segment path.
    3. closure: SEMI join the (a, c) wedge ends against the edge list —
       only wedge keys shuffle, no right columns ride.

    Returns a one-row table ``(n_wedges, n_triangles)`` (both int64; the
    wedge count makes the result a clustering-coefficient pair)."""
    from kamae_ray.stages.aggregate import distinct
    from kamae_ray.stages.join import shuffle_join

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column(src)
        d = batch.column(dst)
        ok = pc.and_(pc.and_(pc.is_valid(s), pc.is_valid(d)), pc.not_equal(s, d))
        batch = batch.filter(ok)
        s, d = batch.column(src), batch.column(dst)
        return pa.table({"a": pc.min_element_wise(s, d),
                         "b": pc.max_element_wise(s, d)})

    canon.__name__ = "canonical_edges"
    if isinstance(edges, pa.Table):
        e = distinct(canon(edges), ["a", "b"])
        n_edges = e.num_rows
    else:
        e = distinct(edges.map_batches(canon, batch_format="pyarrow",
                                       zero_copy_batch=True, batch_size=None),
                     ["a", "b"]).materialize()  # consumed 3x
        n_edges = e.count()
    if n_edges == 0:
        return pa.table({"n_wedges": pa.array([0], pa.int64()),
                         "n_triangles": pa.array([0], pa.int64())})

    def ren_right(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["b", "c"])

    ren_right.__name__ = "wedge_right"
    if isinstance(e, pa.Table):
        wedges = shuffle_join(e, ren_right(e), on="b", how="inner")
        n_wedges = wedges.num_rows
        closed = shuffle_join(
            wedges, e.rename_columns(["a", "c"]), on=["a", "c"], how="semi")
        n_tri = closed.num_rows
    else:
        right = e.map_batches(ren_right, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
        wedges = shuffle_join(e, right, on="b", how="inner",
                              salt_partitions="auto").materialize()
        n_wedges = wedges.count()

        def ren_edge_ac(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(["a", "c"])

        ren_edge_ac.__name__ = "closure_edges"
        closure = e.map_batches(ren_edge_ac, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=None)
        closed = shuffle_join(wedges, closure, on=["a", "c"], how="semi")
        n_tri = closed.count()
    return pa.table({"n_wedges": pa.array([n_wedges], pa.int64()),
                     "n_triangles": pa.array([n_tri], pa.int64())})


def clustering_coefficients(edges, src: str = "src", dst: str = "dst"):
    """Per-node triangle count, degree and local clustering coefficient of
    the undirected simple graph — the node-level sibling of
    :func:`triangle_count`:

        ``lcc_ppm = 2_000_000 * tri(v) // (deg(v) * (deg(v) - 1))``

    (pure int64 — no float anywhere; NULL when deg < 2). Every closed
    triangle {a < b < c} is found once by the canonical wedge+SEMI plan and
    credited to all three corners via a 3-way explode + ONE partial-agg
    groupby; degrees come from one endpoint explode of the distinct edge
    list. Output: (node, degree, triangles, lcc_ppm).

    Scale notes as :func:`triangle_count` (wedge volume is sum-of-deg^2;
    auto-salted middle-vertex join)."""
    from kamae_ray.stages.aggregate import distinct, groupby_agg
    from kamae_ray.stages.join import shuffle_join

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column(src)
        d = batch.column(dst)
        ok = pc.and_(pc.and_(pc.is_valid(s), pc.is_valid(d)), pc.not_equal(s, d))
        batch = batch.filter(ok)
        s, d = batch.column(src), batch.column(dst)
        return pa.table({"a": pc.min_element_wise(s, d),
                         "b": pc.max_element_wise(s, d)})

    canon.__name__ = "canonical_edges"
    table_in = isinstance(edges, pa.Table)
    if table_in:
        import ray.data

        edges = ray.data.from_arrow(edges)
    e = distinct(edges.map_batches(canon, batch_format="pyarrow",
                                   zero_copy_batch=True, batch_size=None),
                 ["a", "b"]).materialize()  # consumed 4x

    def endpoints(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([a, b]), pa.int64()),
                         "__one": pa.array(np.ones(2 * len(a), np.int64))})

    endpoints.__name__ = "edge_endpoints"
    deg = groupby_agg(e.map_batches(endpoints, batch_format="pyarrow",
                                    zero_copy_batch=True), "node",
                      {"__one": ["count"]})

    def deg_cols(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"),
                         "degree": pc.cast(batch.column("__one_count"),
                                           pa.int64(), safe=False)})

    deg_cols.__name__ = "degree_finish"
    deg = deg.map_batches(deg_cols, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()

    def ren_right(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["b", "c"])

    ren_right.__name__ = "wedge_right"
    right = e.map_batches(ren_right, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
    wedges = shuffle_join(e, right, on="b", how="inner",
                          salt_partitions="auto").materialize()
    closed = shuffle_join(wedges, e.rename_columns(["a", "c"]),
                          on=["a", "c"], how="semi").materialize()

    def corners(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        c = batch.column("c").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.concatenate([a, b, c]), pa.int64()),
            "__one": pa.array(np.ones(3 * len(a), np.int64)),
        })

    corners.__name__ = "triangle_corners"
    tri = groupby_agg(closed.map_batches(corners, batch_format="pyarrow",
                                         zero_copy_batch=True), "node",
                      {"__one": ["count"]})

    def tri_cols(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"),
                         "triangles": pc.cast(batch.column("__one_count"),
                                              pa.int64(), safe=False)})

    tri_cols.__name__ = "triangles_finish"
    tri = tri.map_batches(tri_cols, batch_format="pyarrow", zero_copy_batch=True)
    joined = shuffle_join(deg, tri, on="node", how="left")

    def finish(batch: pa.Table) -> pa.Table:
        d = batch.column("degree").to_numpy(zero_copy_only=False)
        t = pc.fill_null(batch.column("triangles"), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        den = d * (d - 1)
        ok = den > 0
        lcc = np.zeros(len(d), np.int64)
        lcc[ok] = (2_000_000 * t[ok]) // den[ok]
        return pa.table({
            "node": batch.column("node"),
            "degree": pa.array(d),
            "triangles": pa.array(t),
            "lcc_ppm": pa.array(lcc, pa.int64(), mask=~ok),
        })

    finish.__name__ = "lcc_finish"
    out = joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    if table_in:
        parts = [t for t in __import__("kamae_ray.base", fromlist=["x"])
                 .collect_tables(out) if t.num_rows]
        return pa.concat_tables(parts) if parts else pa.table(
            {"node": pa.array([], pa.int64()),
             "degree": pa.array([], pa.int64()),
             "triangles": pa.array([], pa.int64()),
             "lcc_ppm": pa.array([], pa.int64())})
    return out


def degree_assortativity(edges, src: str = "src", dst: str = "dst"):
    """Degree assortativity coefficient of the undirected simple graph —
    the Newman (2002) mixing statistic: the Pearson correlation of the
    degree pairs at the two ends of every edge (each undirected edge
    contributes BOTH orientations, the standard symmetric convention).

    Exactness: the six power sums (n, s1, s2, s12, s11, s22) over the
    directed pair list are folded as arbitrary-precision python ints from
    per-block int64 partials (guarded < 2^63 — the welch family); the
    coefficient is the fixed mirrored Pearson chain

        r = (n*s12 - s1*s2) / (sqrt(n*s11 - s1*s1) * sqrt(n*s22 - s2*s2))

    over integer-derived doubles (sqrt/mul/div only — bit-identical
    cross-engine). NULL when either variance term is <= 0 (regular graph).

    Scale plan: canonical distinct edge list (ONE exchange) -> endpoint
    explode + groupby for degrees -> TWO degree equi-joins back onto the
    edge list (auto-salted; degrees table is O(nodes)) -> O(blocks) 1-row
    partials; the driver folds O(blocks) cells. Returns a one-row table
    ``(n, s1, s2, s12, s11, s22, assortativity)``."""
    from kamae_ray.base import collect_tables
    from kamae_ray.stages.aggregate import distinct, groupby_agg
    from kamae_ray.stages.join import shuffle_join

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column(src)
        d = batch.column(dst)
        ok = pc.and_(pc.and_(pc.is_valid(s), pc.is_valid(d)), pc.not_equal(s, d))
        batch = batch.filter(ok)
        s, d = batch.column(src), batch.column(dst)
        return pa.table({"a": pc.min_element_wise(s, d),
                         "b": pc.max_element_wise(s, d)})

    canon.__name__ = "canonical_edges"
    table_in = isinstance(edges, pa.Table)
    if table_in:
        import ray.data

        edges = ray.data.from_arrow(edges)
    e = distinct(edges.map_batches(canon, batch_format="pyarrow",
                                   zero_copy_batch=True, batch_size=None),
                 ["a", "b"]).materialize()  # consumed 3x

    def endpoints(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([a, b]), pa.int64()),
                         "__one": pa.array(np.ones(2 * len(a), np.int64))})

    endpoints.__name__ = "edge_endpoints"
    deg = groupby_agg(e.map_batches(endpoints, batch_format="pyarrow",
                                    zero_copy_batch=True), "node",
                      {"__one": ["count"]})

    def deg_a(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch.column("node"),
                         "deg_a": pc.cast(batch.column("__one_count"),
                                          pa.int64(), safe=False)})

    def deg_b(batch: pa.Table) -> pa.Table:
        return pa.table({"b": batch.column("node"),
                         "deg_b": pc.cast(batch.column("__one_count"),
                                          pa.int64(), safe=False)})

    deg_a.__name__ = "deg_as_a"
    deg_b.__name__ = "deg_as_b"
    deg = deg.materialize()
    ja = shuffle_join(e, deg.map_batches(deg_a, batch_format="pyarrow",
                                         zero_copy_batch=True), on="a",
                      how="inner", salt_partitions="auto")
    jb = shuffle_join(ja, deg.map_batches(deg_b, batch_format="pyarrow",
                                          zero_copy_batch=True), on="b",
                      how="inner", salt_partitions="auto")

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column("deg_a").to_numpy(zero_copy_only=False)
        y = batch.column("deg_b").to_numpy(zero_copy_only=False)
        # both orientations: s1 == s2 and s11 == s22 by construction, but
        # all six are carried so the mirrored Pearson chain stays generic
        s1 = int(x.sum()) + int(y.sum())
        s12 = 2 * int((x * y).sum())
        s11 = int((x * x).sum()) + int((y * y).sum())
        vals = [2 * len(x), s1, s1, s12, s11, s11]
        if any(abs(v) >= (1 << 63) for v in vals):
            raise ValueError("assortativity block partials exceed int64")
        return pa.table({k: pa.array([v], pa.int64()) for k, v in
                         zip(("n", "s1", "s2", "s12", "s11", "s22"), vals)})

    partial.__name__ = "assort_partials"
    parts = [t for t in collect_tables(
        jb.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)) if t.num_rows]
    tot = {k: 0 for k in ("n", "s1", "s2", "s12", "s11", "s22")}
    for t in parts:
        for k in tot:
            tot[k] += sum(t.column(k).to_pylist())
    n, s1, s2 = tot["n"], tot["s1"], tot["s2"]
    s12, s11, s22 = tot["s12"], tot["s11"], tot["s22"]
    if any(abs(v) >= (1 << 63) for v in tot.values()):
        raise ValueError("assortativity sums exceed int64 — rescale degrees")
    va, vb = n * s11 - s1 * s1, n * s22 - s2 * s2
    r = None
    if va > 0 and vb > 0:
        r = float(n * s12 - s1 * s2) / (np.sqrt(float(va)) * np.sqrt(float(vb)))
    out = {k: pa.array([tot[k]], pa.int64()) for k in tot}
    out["assortativity"] = pa.array([r], pa.float64())
    return pa.table(out)


def link_prediction(edges, src: str = "src", dst: str = "dst",
                    min_common: int = 1):
    """Common-neighbor link-prediction scores over the undirected simple
    graph: for every node pair ``u < v`` sharing at least ``min_common``
    neighbors, the exact common-neighbor count, both degrees, the
    neighbor-set Jaccard in ppm (``cn * 1e6 // (deg_u + deg_v - cn)`` —
    exact integer division) and ``is_edge`` (1 when (u, v) is already an
    edge; filter ``is_edge = 0`` for new-link candidates). All columns
    integer — cross-engine exact.

    Scale plan (the canonical two-hop join, triangle_count's shape):
    canonical distinct edge list (ONE exchange) -> symmetric adjacency
    with the node's degree attached (degree agg + ONE equi-join) -> wedge
    self-join on the shared neighbor (auto-salted; wedge volume is
    sum-of-deg^2-bounded — cap hub degrees upstream on power-law graphs)
    -> pair groupby fold -> ONE left join back onto the edge list for the
    is_edge flag. No driver state, no per-node Python."""
    from kamae_ray.stages.aggregate import distinct, groupby_agg
    from kamae_ray.stages.join import shuffle_join

    def canon(batch: pa.Table) -> pa.Table:
        s = pc.cast(A.as_array(batch.column(src)), pa.int64(), safe=False)
        d = pc.cast(A.as_array(batch.column(dst)), pa.int64(), safe=False)
        ok = pc.and_(pc.and_(pc.is_valid(s), pc.is_valid(d)),
                     pc.not_equal(s, d))
        t = pa.table({"s": s, "d": d}).filter(ok)
        return pa.table({"a": pc.min_element_wise(t.column("s"), t.column("d")),
                         "b": pc.max_element_wise(t.column("s"), t.column("d"))})

    canon.__name__ = "canonical_edges"
    table_in = isinstance(edges, pa.Table)
    if table_in:
        import ray.data

        edges = ray.data.from_arrow(edges)
    e = distinct(edges.map_batches(canon, batch_format="pyarrow",
                                   zero_copy_batch=True, batch_size=None),
                 ["a", "b"]).materialize()  # consumed 3x: und, wedges, flag

    def endpoints(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), pa.int64()),
            "z": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    endpoints.__name__ = "symmetric_adjacency"
    und = e.map_batches(endpoints, batch_format="pyarrow",
                        zero_copy_batch=True, batch_size=None)
    deg = groupby_agg(und, "node", {"z": ["count"]})

    def deg_ren(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"),
                         "deg": pc.cast(batch.column("z_count"), pa.int64(),
                                        safe=False)})

    deg_ren.__name__ = "degree_table"
    undd = shuffle_join(und, deg.map_batches(deg_ren, batch_format="pyarrow",
                                             zero_copy_batch=True),
                        on="node", right_cols=["deg"], how="inner",
                        salt_partitions="auto").materialize()  # both wedge sides

    def as_left(batch: pa.Table) -> pa.Table:
        return pa.table({"u": batch.column("node"), "z": batch.column("z"),
                         "deg_u": batch.column("deg")})

    def as_right(batch: pa.Table) -> pa.Table:
        return pa.table({"z": batch.column("z"), "v": batch.column("node"),
                         "deg_v": batch.column("deg")})

    as_left.__name__ = "wedge_left"
    as_right.__name__ = "wedge_right"
    left = undd.map_batches(as_left, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
    right = undd.map_batches(as_right, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)
    wedges = shuffle_join(left, right, on="z",
                          right_cols=["v", "deg_v"], how="inner",
                          salt_partitions="auto")

    def ordered(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch.column("u"), batch.column("v")))

    ordered.__name__ = "ordered_pairs"
    pairs = wedges.map_batches(ordered, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None)
    # lesson 14: the pair-count table feeds another shuffle_join, whose
    # schema probe would otherwise re-run the whole wedge chain
    cnt = groupby_agg(pairs, ["u", "v", "deg_u", "deg_v"],
                      {"z": ["count"]}).materialize()

    def flag_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"u": batch.column("a"), "v": batch.column("b"),
                         "__is_edge": pa.array(
                             np.ones(batch.num_rows, np.int64))})

    flag_edges.__name__ = "edge_flags"
    flags = e.map_batches(flag_edges, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
    out = shuffle_join(cnt, flags, on=["u", "v"], right_cols=["__is_edge"],
                       how="left")

    def finish(batch: pa.Table) -> pa.Table:
        cn = pc.cast(batch.column("z_count"), pa.int64(), safe=False)
        keep = pc.greater_equal(cn, min_common)
        batch = batch.filter(keep)
        cn = pc.cast(batch.column("z_count"), pa.int64(), safe=False) \
            .to_numpy(zero_copy_only=False)
        du = batch.column("deg_u").to_numpy(zero_copy_only=False)
        dv = batch.column("deg_v").to_numpy(zero_copy_only=False)
        jac = cn * np.int64(1_000_000) // (du + dv - cn)
        return pa.table({
            "u": batch.column("u"), "v": batch.column("v"),
            "cn": pa.array(cn), "deg_u": batch.column("deg_u"),
            "deg_v": batch.column("deg_v"),
            "jaccard_ppm": pa.array(jac),
            "is_edge": pc.fill_null(batch.column("__is_edge"), 0),
        })

    finish.__name__ = "link_scores"
    res = out.map_batches(finish, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
    if table_in:
        from kamae_ray.base import collect_tables

        parts = collect_tables(res)
        return pa.concat_tables(parts) if parts else res.schema()
    return res


def k_core(edges, k: int, src: str = "src", dst: str = "dst",
           rounds: int = 8, max_driver_edges: int = 5_000_000):
    """R-round k-core peel of the undirected simple graph underlying an
    edge table: iteratively remove nodes of degree < ``k`` (degrees over
    canonical DISTINCT edges, self-loops dropped) for exactly ``rounds``
    rounds, then report every surviving endpoint with its degree in the
    surviving edge set. When the peel converges within ``rounds`` (checked
    by the tests on the tested graphs; adversarial chains peel one layer
    per round) the result IS the classic k-core; the fixed round count is
    part of the operator contract so the result is deterministic and
    SQL-mirrorable regardless (``k_core_oracle_sql`` unrolls the SAME
    rounds). Output: ``node, deg`` (deg >= 1; isolated leftovers vanish
    with their edges).

    Scale plan: canonical distinct edges via the triangle_count plan (block
    combiner + one sort); under ``max_driver_edges`` the peel runs as
    numpy bincount rounds on the driver (the pagerank lesson-23 fast path —
    each round is O(E), no exchanges); above it, each round is one
    degree-count groupby + two SEMI shuffle-joins with the carried edge set
    re-materialized at a fixed block count per round (CC-loop lesson)."""
    from kamae_ray.stages.aggregate import distinct, groupby_agg
    from kamae_ray.stages.join import shuffle_join

    if k < 1:
        raise ValueError("k must be >= 1")

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column(src)
        d = batch.column(dst)
        ok = pc.and_(pc.and_(pc.is_valid(s), pc.is_valid(d)), pc.not_equal(s, d))
        batch = batch.filter(ok)
        s, d = batch.column(src), batch.column(dst)
        return pa.table({"a": pc.cast(pc.min_element_wise(s, d), pa.int64(), safe=False),
                         "b": pc.cast(pc.max_element_wise(s, d), pa.int64(), safe=False)})

    canon.__name__ = "kcore_canon"

    def _drive(a: np.ndarray, b: np.ndarray) -> pa.Table:
        for _ in range(rounds):
            if len(a) == 0:
                break
            nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
            deg = np.bincount(inv, minlength=len(nodes))
            ok = deg >= k
            keep = ok[inv[:len(a)]] & ok[inv[len(a):]]
            if keep.all():
                break  # fixpoint: further rounds are identity
            a, b = a[keep], b[keep]
        if len(a) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64())})
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        deg = np.bincount(inv, minlength=len(nodes))
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "deg": pa.array(deg.astype(np.int64), pa.int64())})

    if isinstance(edges, pa.Table):
        e = distinct(canon(edges), ["a", "b"])
        return _drive(e.column("a").to_numpy(zero_copy_only=False),
                      e.column("b").to_numpy(zero_copy_only=False))

    e = distinct(edges.map_batches(canon, batch_format="pyarrow",
                                   zero_copy_batch=True, batch_size=None),
                 ["a", "b"]).materialize()
    n_edges = e.count()
    if n_edges <= max_driver_edges:
        from kamae_ray.base import collect_tables

        full = pa.concat_tables(collect_tables(e)).combine_chunks()
        return _drive(full.column("a").to_numpy(zero_copy_only=False),
                      full.column("b").to_numpy(zero_copy_only=False))

    import ray  # noqa: F401  (documents the distributed tier's dependency)

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [A.as_array(t.column("a")), A.as_array(t.column("b"))])})

    endpoints.__name__ = "kcore_endpoints"
    n_blocks = max(1, min(64, n_edges // 65536 + 1))
    for _ in range(rounds):
        degs = groupby_agg(e.map_batches(endpoints, batch_format="pyarrow",
                                         zero_copy_batch=True, batch_size=None),
                           "node", {"node": ["count"]})

        def active_only(t: pa.Table) -> pa.Table:
            cnt = pc.cast(t.column("node_count"), pa.int64(), safe=False)
            t = t.filter(pc.greater_equal(cnt, k))
            return pa.table({"node": pc.cast(t.column("node"), pa.int64(), safe=False)})

        active_only.__name__ = "kcore_active"
        act = degs.map_batches(active_only, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None).materialize()

        def ren(col_out):
            def f(t: pa.Table) -> pa.Table:
                return t.rename_columns([col_out])
            f.__name__ = f"kcore_ren_{col_out}"
            return f

        e = shuffle_join(e, act.map_batches(ren("a"), batch_format="pyarrow",
                                            zero_copy_batch=True, batch_size=None),
                         on="a", how="semi")
        e = shuffle_join(e, act.map_batches(ren("b"), batch_format="pyarrow",
                                            zero_copy_batch=True, batch_size=None),
                         on="b", how="semi")
        e = e.repartition(n_blocks).materialize()
    final = groupby_agg(e.map_batches(endpoints, batch_format="pyarrow",
                                      zero_copy_batch=True, batch_size=None),
                        "node", {"node": ["count"]})

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"node": pc.cast(t.column("node"), pa.int64(), safe=False),
                         "deg": pc.cast(t.column("node_count"), pa.int64(), safe=False)})

    finish.__name__ = "kcore_finish"
    return final.map_batches(finish, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)


def k_core_oracle_sql(edges_cte: str, k: int, rounds: int = 8) -> str:
    """DuckDB mirror of :func:`k_core`: the SAME fixed round count unrolled
    as a CTE chain over ``edges_cte`` (a subquery yielding src, dst)."""
    parts = [
        f"WITH raw AS ({edges_cte}), ",
        "e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
        "FROM raw WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst)",
    ]
    prev = "e0"
    for r in range(1, rounds + 1):
        parts.append(
            f", d{r} AS MATERIALIZED (SELECT node, count(*) AS deg FROM "
            f"(SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev}) "
            f"GROUP BY node)"
        )
        parts.append(
            f", e{r} AS MATERIALIZED (SELECT a, b FROM {prev} WHERE "
            f"a IN (SELECT node FROM d{r} WHERE deg >= {k}) AND "
            f"b IN (SELECT node FROM d{r} WHERE deg >= {k}))"
        )
        prev = f"e{r}"
    parts.append(
        f" SELECT node, CAST(count(*) AS BIGINT) AS deg FROM "
        f"(SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev}) GROUP BY node"
    )
    return "".join(parts)


def adamic_adar(edges, src: str = "src", dst: str = "dst",
                min_common: int = 1):
    """Adamic-Adar link-prediction scores: for node pairs ``u < v`` with
    common neighbors, ``AA = sum over common z of 1 / ln(deg(z))`` — the
    degree-discounted companion of :func:`link_prediction` (hub neighbors
    count less). Every per-wedge term quantizes to micro-units
    (``round(1e6 / ln(deg_z))``, libm ln + half-away — the KM order-free-
    sum family), so the pair sums are exact int64 and cross-engine exact;
    common neighbors have degree >= 2 by construction, so ln is never 0.
    Output: ``u, v, cn, aa_micro``.

    Scale plan: the canonical two-hop wedge join with the SHARED
    neighbor's degree riding the left side (one extra degree join keyed on
    z); pair fold carries (count, exact term sum) only."""
    from kamae_ray.stages.aggregate import distinct, groupby_agg
    from kamae_ray.stages.join import shuffle_join

    def canon(batch: pa.Table) -> pa.Table:
        s = pc.cast(A.as_array(batch.column(src)), pa.int64(), safe=False)
        d = pc.cast(A.as_array(batch.column(dst)), pa.int64(), safe=False)
        ok = pc.and_(pc.and_(pc.is_valid(s), pc.is_valid(d)),
                     pc.not_equal(s, d))
        t = pa.table({"s": s, "d": d}).filter(ok)
        return pa.table({"a": pc.min_element_wise(t.column("s"), t.column("d")),
                         "b": pc.max_element_wise(t.column("s"), t.column("d"))})

    canon.__name__ = "aa_canon"
    if isinstance(edges, pa.Table):
        import ray.data

        edges = ray.data.from_arrow(edges)
    e = distinct(edges.map_batches(canon, batch_format="pyarrow",
                                   zero_copy_batch=True, batch_size=None),
                 ["a", "b"]).materialize()

    def endpoints(batch: pa.Table) -> pa.Table:
        a = A.as_array(batch.column("a"))
        b = A.as_array(batch.column("b"))
        return pa.table({"node": pa.concat_arrays([a, b]),
                         "z": pa.concat_arrays([b, a])})

    endpoints.__name__ = "aa_adjacency"
    und = e.map_batches(endpoints, batch_format="pyarrow",
                        zero_copy_batch=True, batch_size=None)
    deg = groupby_agg(und, "node", {"z": ["count"]})

    def deg_z(batch: pa.Table) -> pa.Table:
        import numpy as np

        d = pc.cast(batch.column("z_count"), pa.int64(), safe=False) \
            .to_numpy(zero_copy_only=False)
        # degree-1 nodes can never be a COMMON neighbor (their single wedge
        # is the filtered self pair) — but guard ln(1)=0 anyway so no inf
        # term ever exists on either engine
        safe_d = np.maximum(d, 2).astype(np.float64)
        term = np.where(d >= 2,
                        np.floor(1_000_000.0 / A.libm_log(safe_d) + 0.5),
                        0.0).astype(np.int64)
        return pa.table({"z": batch.column("node"),
                         "aa_term": pa.array(term, pa.int64())})

    deg_z.__name__ = "aa_degree_terms"
    zterms = deg.map_batches(deg_z, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)
    undt = shuffle_join(und, zterms, on="z", right_cols=["aa_term"],
                        how="inner", salt_partitions="auto").materialize()

    def as_left(batch: pa.Table) -> pa.Table:
        return pa.table({"u": batch.column("node"), "z": batch.column("z"),
                         "aa_term": batch.column("aa_term")})

    def as_right(batch: pa.Table) -> pa.Table:
        return pa.table({"z": batch.column("z"), "v": batch.column("node")})

    as_left.__name__ = "aa_left"
    as_right.__name__ = "aa_right"
    left = undt.map_batches(as_left, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
    right = undt.map_batches(as_right, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)
    wedges = shuffle_join(left, right, on="z", right_cols=["v"],
                          how="inner", salt_partitions="auto")

    def ordered(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less(batch.column("u"), batch.column("v")))
        return pa.table({"u": batch.column("u"), "v": batch.column("v"),
                         "one": pa.array(np.ones(batch.num_rows, np.int64)),
                         "aa_term": batch.column("aa_term")})

    ordered.__name__ = "aa_pairs"
    pairs = wedges.map_batches(ordered, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None)
    agg = groupby_agg(pairs, ["u", "v"], {"one": ["sum"], "aa_term": ["sum"]})

    def finish(batch: pa.Table) -> pa.Table:
        cn = pc.cast(batch.column("one_sum"), pa.int64(), safe=False)
        batch = batch.append_column("__cn", cn)
        batch = batch.filter(pc.greater_equal(batch.column("__cn"), min_common))
        return pa.table({"u": batch.column("u"), "v": batch.column("v"),
                         "cn": batch.column("__cn"),
                         "aa_micro": pc.cast(batch.column("aa_term_sum"),
                                             pa.int64(), safe=False)})

    finish.__name__ = "aa_finish"
    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
