"""Iterative distributed graph operators: connected components (min-label
propagation) and PageRank (fixed-point integer arithmetic).

Both are the classic bulk-synchronous iteration expressed Ray-Data-first:
the EDGE LIST is the big table and every superstep streams over it once
with ``map_batches`` doing per-block PARTIAL aggregation (groupby-min /
groupby-sum inside the block), so only pre-shrunk (node, value) partials
ever leave a block.  The node-side table (labels / scores, O(V)) is the
small side and rides the standard size-based switch the dedup and
anti-join ops use:

- ``mode="broadcast"``: the node table lives in a ``ray.put`` object;
  per-block partials are collected and merged on the driver with
  VECTORIZED numpy/pd.Index kernels (O(V) driver memory — the
  broadcast-side assumption; no per-node Python loops).  One distributed
  edge scan + one tiny merge per superstep; no shuffle, no join.
- ``mode="join"``: the node table stays a Dataset and each superstep is
  a keyed ``Dataset.join`` + hash aggregate — the path for a node table
  beyond driver memory (V ~ 10^9 at the 10^10-edge scale target).  Same
  results, bit-for-bit, at ~10x the per-superstep cost on a small
  cluster (aggregator-actor spin-up dominates), which is why it is not
  used below the threshold.
- ``mode="auto"`` (default): picks by materialized edge-row count.
  V ≤ 2·E for edge-defined node universes, so an edge count under
  ``_JOIN_MODE_EDGE_ROWS`` proves the node table is broadcast-safe;
  above it the join path runs.  Every caller (including
  ``pipelines.analyze.host_pagerank``) inherits the switch.

Determinism: PageRank runs in integer micro-units (int64 scores, floor
division for share splitting) so results are bit-identical across block
orders and match the single-threaded naive twin exactly — the same
policy the driver contract uses for float-sensitive aggregates
(``__ray_entry__`` float policy).  Connected components propagates
min-labels, order-independent by construction.  Both modes therefore
agree exactly, which the tests assert.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min, Sum

from .relational import cap_join_partitions, distinct_rows
from .relational import scrub_empty_blocks as _scrub

__all__ = ["connected_components", "pagerank", "bfs_distances",
           "triangle_counts", "shortest_paths", "core_numbers"]

# mode="auto" switches to the distributed-node-table join path above
# this many (undirected/projected) edge rows: V <= 2E, so below it the
# O(V) driver arrays are provably bounded. Same 2M knee as the
# anti-join/dedup broadcast switches.
_JOIN_MODE_EDGE_ROWS = 2_000_000


def _resolve_mode(mode: str, edge_rows: int) -> str:
    if mode != "auto":
        return mode
    return "join" if edge_rows > _JOIN_MODE_EDGE_ROWS else "broadcast"


def _collect(ds: ray.data.Dataset) -> pa.Table:
    """Drain a (small, pre-aggregated) dataset to one driver table."""
    parts = [b if isinstance(b, pa.Table) else pa.table(b)
             for b in ds.iter_batches(batch_format="pyarrow",
                                      batch_size=None)]
    parts = [p for p in parts if p.num_rows]
    return pa.concat_tables(parts) if parts else None


def _damped(sc: "np.ndarray", damping_ppm: int) -> "np.ndarray":
    """floor(sc * damping_ppm / 1e6) WITHOUT int64 overflow: splitting
    sc = a*1e6 + b gives the exact identity a*d + (b*d)//1e6 (the first
    term's product was divisible by 1e6), so hub scores can hold the
    whole graph's mass (~9e18 micro-units) before wrapping — a plain
    sc*d would wrap at ~1e13 (found in review; silently corrupted
    scores on >1e7-node mass concentrations)."""
    a, b = np.divmod(sc, np.int64(1_000_000))
    return a * np.int64(damping_ppm) + (b * np.int64(damping_ppm)) \
        // np.int64(1_000_000)


def _undirect(edges: ray.data.Dataset, src: str, dst: str) -> ray.data.Dataset:
    """(a,b) -> both directions, columns (src, dst)."""
    fwd = edges.map_batches(
        lambda b: pa.table({"src": b.column(src), "dst": b.column(dst)}),
        batch_format="pyarrow")
    rev = edges.map_batches(
        lambda b: pa.table({"src": b.column(dst), "dst": b.column(src)}),
        batch_format="pyarrow")
    return fwd.union(rev)


def connected_components(edges: ray.data.Dataset, src: str = "a",
                         dst: str = "b", max_iters: int = 50,
                         mode: str = "auto") -> ray.data.Dataset:
    """Undirected connected components by min-label propagation.

    Returns (node, component) where component is the smallest node id in
    the node's component.  Each superstep proposes
    ``min(own label, neighbors' labels)`` for every node; broadcast mode
    additionally applies full path compression on the driver's O(V)
    label arrays each round (the pointer-jumping analog), so convergence
    is O(log diameter) supersteps.  Join mode applies one pointer-jumping
    shortcut per round (label <- label(label)) via a self-join.
    """
    und = _undirect(edges, src, dst).materialize()
    if _resolve_mode(mode, und.count()) == "join":
        return _components_join(und, max_iters)

    def block_nodes(b: pa.Table) -> pa.Table:
        return pa.table({"node": pc.unique(b.column("src"))})

    # node universe + labels as parallel driver arrays (pd.Index for
    # O(1) hash positions — works for int AND string node ids)
    nt = _collect(und.map_batches(block_nodes, batch_format="pyarrow"))
    if nt is None:
        return ray.data.from_arrow(pa.table(
            {"node": pa.array([], pa.int64()),
             "component": pa.array([], pa.int64())}))
    node_arr = np.unique(nt.column("node").to_numpy(zero_copy_only=False))
    node_idx = pd.Index(node_arr)
    lab = node_arr.copy()

    for _ in range(max_iters):
        ref = ray.put(dict(zip(node_arr.tolist(), lab.tolist())))

        def propose(b: pa.Table) -> pa.Table:
            m = ray.get(ref)
            d = pd.DataFrame({
                "node": b.column("dst").to_pandas(),
                "lab": b.column("src").to_pandas().map(m)})
            part = d.groupby("node", sort=False)["lab"].min()
            return pa.table({"node": pa.array(part.index),
                             "lab": pa.array(part.values)})

        pt = _collect(und.map_batches(propose, batch_format="pyarrow"))
        prev = lab.copy()
        if pt is not None:
            pos = node_idx.get_indexer(
                pt.column("node").to_numpy(zero_copy_only=False))
            np.minimum.at(lab, pos,
                          pt.column("lab").to_numpy(zero_copy_only=False))
        if np.array_equal(lab, prev):
            break
        # full path compression (pointer jumping), vectorized: labels
        # are node ids, so label-of-label is one positional gather;
        # each pass halves chain depth
        while True:
            jumped = lab[node_idx.get_indexer(lab)]
            if np.array_equal(jumped, lab):
                break
            lab = jumped
    return ray.data.from_arrow(pa.table({"node": pa.array(node_arr),
                                         "component": pa.array(lab)}))


def _components_join(und: ray.data.Dataset,
                     max_iters: int) -> ray.data.Dataset:
    """Keyed-join scale path: node table stays distributed end to end.
    ``und`` is the materialized undirected edge list."""
    labels = und.map_batches(
        lambda b: pa.table({"node": b.column("src")}), batch_format="pyarrow"
    ).groupby("node").aggregate(Min("node", alias_name="label"))
    labels = _scrub(labels.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "label": b.column("node")}),
        batch_format="pyarrow"))

    for _ in range(max_iters):
        # message passing: each edge forwards src's label to dst
        msgs = und.join(labels, join_type="inner",
                        num_partitions=cap_join_partitions(8),
                        on=("src",), right_on=("node",))
        inbox = msgs.map_batches(
            lambda b: pa.table({"node": b.column("dst"),
                                "label": b.column("label")}),
            batch_format="pyarrow")
        proposed = _scrub(inbox.union(labels).groupby("node").aggregate(
            Min("label", alias_name="new_label")))
        joined = _scrub(proposed.join(
            labels, join_type="inner",
            num_partitions=cap_join_partitions(8),
            on=("node",), right_on=("node",)))
        changed = joined.map_batches(
            lambda b: pa.table({"c": pc.cast(
                pc.not_equal(b.column("new_label"), b.column("label")),
                pa.int64())}),
            batch_format="pyarrow").sum("c")
        labels = _scrub(joined.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "label": b.column("new_label")}),
            batch_format="pyarrow"))
        if not changed:
            break
        # pointer jumping: label <- label(label); doubles the distance
        # collapsed per round, so chains converge in O(log diameter)
        jump = labels.join(labels, join_type="left_outer",
                           num_partitions=cap_join_partitions(8),
                           on=("label",), right_on=("node",),
                           right_suffix="_r")
        labels = _scrub(jump.map_batches(
            lambda b: pa.table({
                "node": b.column("node"),
                "label": pc.min_element_wise(
                    b.column("label"),
                    pc.fill_null(b.column("label_r"), b.column("label")))}),
            batch_format="pyarrow"))
    return labels.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "component": b.column("label")}),
        batch_format="pyarrow")


def pagerank(edges: ray.data.Dataset, src: str = "a", dst: str = "b",
             iters: int = 10, damping_ppm: int = 850_000,
             scale: int = 1_000_000, mode: str = "auto",
             teleport: list | None = None) -> ray.data.Dataset:
    """Directed PageRank in fixed-point integer arithmetic.

    Scores are int64 micro-units (``scale`` = one unit of probability
    mass per node at init).  Each iteration: every node splits
    ``damping_ppm``-per-million of its score equally over its out-edges
    with FLOOR division (the dropped remainder, like the dangling-node
    mass, is implicitly lost rather than redistributed — documented
    determinism > exact stochasticity), then adds the ``(1 - damping)``
    teleport base.  Integer ops make the result independent of
    block/summation order — bit-identical to the single-threaded twin,
    across any parallelism and across both modes.

    Returns (node, score) with score in micro-units.

    ``teleport`` (a small caller-supplied seed list) switches to
    PERSONALIZED PageRank — TrustRank when the seeds are trusted hosts
    (Gyongyi, Garcia-Molina & Pedersen, VLDB'04): initial mass and the
    per-iteration ``(1 - damping)`` base go ONLY to the seeds (``scale``
    and ``base`` per seed, un-normalized — documented integer
    semantics), so score flows outward from the trust set and spam
    farms unreachable from it stay at 0.
    """
    e = edges.map_batches(
        lambda b: pa.table({"src": b.column(src), "dst": b.column(dst)}),
        batch_format="pyarrow").materialize()
    if _resolve_mode(mode, e.count()) == "join":
        return _pagerank_join(e, iters, damping_ppm, scale, teleport)

    def block_deg(b: pa.Table) -> pa.Table:
        part = pd.Series(b.column("src").to_pylist()) \
                 .value_counts(sort=False)
        return pa.table({"node": pa.array(part.index),
                         "n": pa.array(part.values, pa.int64())})

    # out-degrees + node universe: vectorized driver merges over the
    # pre-aggregated per-block partials (no per-node Python loops)
    dt = _collect(e.map_batches(block_deg, batch_format="pyarrow"))
    ut = _collect(e.map_batches(
        lambda b: pa.table({"node": pc.unique(b.column("dst"))}),
        batch_format="pyarrow"))
    if dt is None:
        return ray.data.from_arrow(pa.table(
            {"node": pa.array([], pa.int64()),
             "score": pa.array([], pa.int64())}))
    deg_nodes = dt.column("node").to_numpy(zero_copy_only=False)
    node_arr = np.unique(np.concatenate([
        deg_nodes,
        ut.column("node").to_numpy(zero_copy_only=False)
        if ut is not None else deg_nodes[:0]]))
    node_idx = pd.Index(node_arr)
    outdeg_vec = np.zeros(len(node_arr), np.int64)
    np.add.at(outdeg_vec, node_idx.get_indexer(deg_nodes),
              dt.column("n").to_numpy(zero_copy_only=False))
    has_out = outdeg_vec > 0
    base = scale - scale * damping_ppm // 1_000_000
    deg_ref = ray.put(dict(zip(node_arr[has_out].tolist(),
                               outdeg_vec[has_out].tolist())))
    if teleport is None:
        base_vec = np.full(len(node_arr), base, np.int64)
        scores = np.full(len(node_arr), scale, np.int64)
    else:
        trusted = node_idx.get_indexer(
            pd.Index(list(dict.fromkeys(teleport))))
        trusted = trusted[trusted >= 0]
        base_vec = np.zeros(len(node_arr), np.int64)
        base_vec[trusted] = base
        scores = np.zeros(len(node_arr), np.int64)
        scores[trusted] = scale

    for _ in range(iters):
        sref = ray.put(dict(zip(node_arr.tolist(), scores.tolist())))

        def share(b: pa.Table) -> pa.Table:
            s, dgs = ray.get(sref), ray.get(deg_ref)
            srcs = b.column("src").to_pandas()
            sc = srcs.map(s).to_numpy(np.int64)
            dg = srcs.map(dgs).to_numpy(np.int64)
            out = _damped(sc, damping_ppm) // dg
            part = pd.DataFrame({"node": b.column("dst").to_pandas(),
                                 "g": out}).groupby("node", sort=False)[
                                     "g"].sum()
            return pa.table({"node": pa.array(part.index),
                             "g": pa.array(part.values, pa.int64())})

        gt = _collect(e.map_batches(share, batch_format="pyarrow"))
        scores = base_vec.copy()
        if gt is not None:
            np.add.at(scores,
                      node_idx.get_indexer(
                          gt.column("node").to_numpy(zero_copy_only=False)),
                      gt.column("g").to_numpy(zero_copy_only=False))
    order = np.argsort(node_arr, kind="stable")
    return ray.data.from_arrow(pa.table({
        "node": pa.array(node_arr[order]),
        "score": pa.array(scores[order], pa.int64())}))


def _pagerank_join(e: ray.data.Dataset, iters: int,
                   damping_ppm: int, scale: int,
                   teleport: list | None = None) -> ray.data.Dataset:
    """Keyed-join scale path: scores stay a distributed Dataset.
    ``e`` is the materialized (src, dst) projection."""
    # out-degrees ride along every superstep join (computed once)
    deg = e.map_batches(
        lambda b: pa.table({"src": b.column("src"),
                            "one": pa.array(np.ones(b.num_rows, np.int64))}),
        batch_format="pyarrow").groupby("src").aggregate(
            Sum("one", alias_name="outdeg"))
    deg = _scrub(deg)
    # node universe: every endpoint
    nodes = _undirect(e, "src", "dst").map_batches(
        lambda b: pa.table({"node": b.column("src")}), batch_format="pyarrow"
    ).groupby("node").aggregate(Min("node", alias_name="_"))
    nodes = _scrub(nodes.select_columns(["node"]))
    base = scale - scale * damping_ppm // 1_000_000
    tset_ref = ray.put(set(teleport)) if teleport is not None else None

    def init_scores(b: pa.Table) -> pa.Table:
        if tset_ref is None:
            v = np.full(b.num_rows, scale, np.int64)
        else:
            ts = ray.get(tset_ref)
            inset = np.fromiter(
                (x in ts for x in b.column("node").to_pylist()),
                bool, b.num_rows)
            v = np.where(inset, scale, 0).astype(np.int64)
        return pa.table({"node": b.column("node"),
                         "score": pa.array(v, pa.int64())})

    scores = _scrub(nodes.map_batches(init_scores,
                                      batch_format="pyarrow"))

    e_deg = _scrub(e.join(deg, join_type="inner",
                          num_partitions=cap_join_partitions(8),
                          on=("src",), right_on=("src",)))

    for _ in range(iters):
        contrib = e_deg.join(scores, join_type="inner",
                             num_partitions=cap_join_partitions(8),
                             on=("src",), right_on=("node",))

        def share(b: pa.Table) -> pa.Table:
            s = b.column("score").to_numpy(zero_copy_only=False)
            d = b.column("outdeg").to_numpy(zero_copy_only=False)
            out = _damped(s, damping_ppm) // d
            return pa.table({"node": b.column("dst"),
                             "in_share": pa.array(out, pa.int64())})

        inbox = _scrub(contrib.map_batches(share, batch_format="pyarrow")
                       .groupby("node").aggregate(
                           Sum("in_share", alias_name="gain")))
        joined = nodes.join(inbox, join_type="left_outer",
                            num_partitions=cap_join_partitions(8),
                            on=("node",), right_on=("node",))

        def apply(b: pa.Table) -> pa.Table:
            g = pc.fill_null(b.column("gain"), 0)
            if tset_ref is None:
                bb = base
            else:
                ts = ray.get(tset_ref)
                inset = np.fromiter(
                    (x in ts for x in b.column("node").to_pylist()),
                    bool, b.num_rows)
                bb = pa.array(np.where(inset, base, 0).astype(np.int64))
            return pa.table({"node": b.column("node"),
                             "score": pc.add(g, bb)})

        scores = _scrub(joined.map_batches(apply, batch_format="pyarrow"))
    return scores


def bfs_distances(edges: ray.data.Dataset, seeds: list,
                  src: str = "a", dst: str = "b",
                  directed: bool = False, max_hops: int = 20,
                  mode: str = "auto") -> ray.data.Dataset:
    """Level-synchronous BFS hop distances from a seed set.

    Returns (node, dist) for every node reachable within ``max_hops``
    hops of any seed (seeds themselves at dist 0; unreachable nodes
    absent — SQL-twin shape: the recursive CTE's MIN(dist) per node
    with the same hop cap). Distances are small exact integers, so the
    result hash-matches the DuckDB recursive oracle at any parallelism.

    Scale shape mirrors ``connected_components``: each superstep is ONE
    streaming edge scan with per-block partial dedup of proposed
    frontier nodes; broadcast mode keeps the visited set as an O(V)
    driver pd.Index and ships the CURRENT FRONTIER ONLY via ``ray.put``
    (frontiers are bounded by V but typically far smaller); join mode
    keeps (node, dist) a Dataset and expands via a frontier-edge keyed
    join + anti semantics (left_outer null-probe) per hop — the path
    for node tables beyond driver memory. Seeds are a caller-supplied
    LIST (query shapes seed from a handful of ids); a Dataset seed set
    only makes sense in join mode, where the list is promoted to one.
    """
    if directed:
        und = edges.map_batches(
            lambda b: pa.table({"src": b.column(src),
                                "dst": b.column(dst)}),
            batch_format="pyarrow")
    else:
        und = _undirect(edges, src, dst)
    und = und.materialize()
    if _resolve_mode(mode, und.count()) == "join":
        return _bfs_join(und, seeds, max_hops)

    # visited: node -> dist, as parallel driver arrays
    seen_nodes = list(dict.fromkeys(seeds))
    seen_dist = [0] * len(seen_nodes)
    frontier = set(seen_nodes)

    for hop in range(1, max_hops + 1):
        if not frontier:
            break
        ref = ray.put(frontier)

        def expand(b: pa.Table, _ref=ref) -> pa.Table:
            f = ray.get(_ref)
            s = b.column("src").to_pandas()
            hit = s.isin(f).to_numpy()
            if not hit.any():
                return pa.table({"node": pa.array(
                    [], b.column("dst").type)})
            return pa.table(
                {"node": pc.unique(b.filter(pa.array(hit)).column("dst"))})

        pt = _collect(und.map_batches(expand, batch_format="pyarrow"))
        if pt is None:
            break
        idx = pd.Index(seen_nodes)
        cand = pd.unique(pt.column("node").to_pandas())
        new = [n for n, p in zip(cand, idx.get_indexer(cand)) if p < 0]
        if not new:
            break
        seen_nodes.extend(new)
        seen_dist.extend([hop] * len(new))
        frontier = set(new)

    return ray.data.from_arrow(pa.table(
        {"node": pa.array(seen_nodes),
         "dist": pa.array(seen_dist, pa.int64())}))


def _bfs_join(und: ray.data.Dataset, seeds: list,
              max_hops: int) -> ray.data.Dataset:
    """Keyed-join scale path: visited (node, dist) stays a Dataset; the
    per-hop frontier expansion is a frontier⋈edges join and the
    visited-set subtraction a left_outer null-probe (anti join)."""
    sch = und.schema()
    node_t = sch.types[sch.names.index("src")]
    visited = ray.data.from_arrow(pa.table(
        {"node": pa.array(list(dict.fromkeys(seeds)), node_t),
         "dist": pa.array([0] * len(set(seeds)), pa.int64())}))
    frontier = visited.select_columns(["node"])

    for hop in range(1, max_hops + 1):
        msgs = und.join(frontier, join_type="inner",
                        num_partitions=cap_join_partitions(8),
                        on=("src",), right_on=("node",))
        # scrub AFTER the groupby so the aggregate runs exactly once
        # (its materialized handle feeds both the count and the probe
        # join — a lazy cand would re-execute the join per consumer)
        cand = _scrub(msgs.map_batches(
            lambda b: pa.table({"node": b.column("dst")}),
            batch_format="pyarrow").groupby("node").count())
        if cand.count() == 0:
            break
        probe = cand.join(visited, join_type="left_outer",
                          num_partitions=cap_join_partitions(8),
                          on=("node",), right_on=("node",),
                          right_suffix="_v")
        def fresh(b: pa.Table, _h=hop) -> pa.Table:
            # anti semantics: unmatched probe rows are the new frontier
            b = b.filter(pc.is_null(b.column("dist")))
            return pa.table({"node": b.column("node"),
                             "dist": pa.array([_h] * b.num_rows,
                                              pa.int64())})

        # scrub: the anti filter empties most blocks and Ray 2.49 strips
        # their schema, which poisons the next hop's join partitions
        new = _scrub(probe.map_batches(fresh, batch_format="pyarrow"))
        if new.count() == 0:
            break
        visited = visited.union(new).materialize()
        frontier = new.select_columns(["node"])
    return visited


def triangle_counts(edges: ray.data.Dataset, src: str = "a",
                    dst: str = "b", mode: str = "auto"
                    ) -> ray.data.Dataset:
    """Per-node triangle participation counts (node, n_tri) over the
    undirected simple graph of ``edges`` (self-loops dropped, parallel
    edges collapsed). Every triangle contributes 1 to each of its three
    corners; nodes in no triangle are absent — the shape of the 3-way
    self-join SQL oracle.

    Join mode (scale path) is the degree-ordered wedge algorithm
    (Suri & Vassilvitskii, WWW'11): orient every edge from its
    lower-(degree, id) endpoint to the higher one, form wedges at each
    LOW vertex by a self-join, and close them with one keyed join
    against the oriented edge set. Orientation bounds out-degree by
    O(sqrt(E)), so the wedge plane is O(E^1.5) worst-case and far
    smaller on power-law graphs — the curse-of-the-last-reducer fix;
    plain id-ordering would make the hottest hub emit deg^2 wedges.
    Broadcast mode keys the same orientation on driver arrays with
    per-edge sorted-neighbor intersections (O(E^1.5) work, O(E) memory)
    below the shared 2M-edge switch.
    """
    canon = edges.map_batches(
        lambda b: _canon_block(b, src, dst), batch_format="pyarrow")
    e = distinct_rows(canon, ["u", "v"])
    if _resolve_mode(mode, e.count()) == "join":
        return _triangles_join(e)

    t = _collect(e)
    if t is None:
        return ray.data.from_arrow(pa.table(
            {"node": pa.array([], pa.int64()),
             "n_tri": pa.array([], pa.int64())}))
    u = t.column("u").to_numpy(zero_copy_only=False)
    v = t.column("v").to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[:len(u)], inv[len(u):]
    deg = np.bincount(ui, minlength=len(nodes)) \
        + np.bincount(vi, minlength=len(nodes))
    # orient low -> high by (deg, node-position) total order
    rank = np.lexsort((np.arange(len(nodes)), deg))
    pos = np.empty(len(nodes), np.int64)
    pos[rank] = np.arange(len(nodes))
    lo = np.where(pos[ui] < pos[vi], ui, vi)
    hi = np.where(pos[ui] < pos[vi], vi, ui)
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    ends = np.searchsorted(lo, np.arange(len(nodes)), side="right")
    ntri = np.zeros(len(nodes), np.int64)
    # Vectorized wedge-close: every ordered out-neighbor pair (x, y)
    # at a low vertex is a wedge; it closes iff the oriented edge
    # between x and y exists (probed by searchsorted on the sorted
    # (lo, hi) key). Wedge volume is the same O(E^1.5) the per-edge
    # intersection loop did, but enumerated array-at-once in bounded
    # chunks instead of ~E interpreter iterations.
    edge_key = lo * np.int64(len(nodes)) + hi
    pair_cnt = ends[lo] - np.arange(len(lo)) - 1  # wedges led by edge k
    cum = np.concatenate([[0], np.cumsum(pair_cnt)])
    CHUNK = 4_000_000
    start_edge = 0
    while start_edge < len(lo):
        stop_edge = int(np.searchsorted(cum, cum[start_edge] + CHUNK,
                                        side="left"))
        stop_edge = min(max(stop_edge, start_edge + 1), len(lo))
        sl = slice(start_edge, stop_edge)
        cnt = pair_cnt[sl]
        total = int(cnt.sum())
        start_edge = stop_edge
        if total == 0:
            continue
        first = np.repeat(np.arange(sl.start, sl.stop), cnt)
        offs = np.concatenate([[0], np.cumsum(cnt)])
        second = (np.arange(total) - np.repeat(offs[:-1], cnt)
                  + first + 1)
        a, x, y = lo[first], hi[first], hi[second]
        # orient the wedge endpoints by the same (deg, id) rank the
        # edge set uses before probing for the closing edge
        swap = pos[x] > pos[y]
        w_lo = np.where(swap, y, x)
        w_hi = np.where(swap, x, y)
        probe = w_lo * np.int64(len(nodes)) + w_hi
        j = np.searchsorted(edge_key, probe)
        found = (j < len(edge_key)) & (edge_key[np.minimum(
            j, len(edge_key) - 1)] == probe)
        if found.any():
            np.add.at(ntri, np.concatenate(
                [a[found], x[found], y[found]]), 1)
    keep = ntri > 0
    return ray.data.from_arrow(pa.table(
        {"node": pa.array(nodes[keep]),
         "n_tri": pa.array(ntri[keep], pa.int64())}))


def _canon_block(b: pa.Table, src: str, dst: str) -> pa.Table:
    u = b.column(src)
    v = b.column(dst)
    lo = pc.min_element_wise(u, v)
    hi = pc.max_element_wise(u, v)
    t = pa.table({"u": lo, "v": hi})
    return t.filter(pc.not_equal(t.column("u"), t.column("v")))


def _triangles_join(e: ray.data.Dataset) -> ray.data.Dataset:
    """Degree-ordered wedge join; ``e`` is the canonical distinct
    (u < v) edge Dataset."""
    # degree per node: one count over exploded endpoints
    deg = _scrub(e.map_batches(
        lambda b: pa.table({"node": pa.concat_arrays(
            [b.column("u").combine_chunks().cast(b.column("u").type),
             b.column("v").combine_chunks().cast(b.column("v").type)])}),
        batch_format="pyarrow")).groupby("node").count()
    deg = _scrub(deg.map_batches(
        lambda b: b.rename_columns(
            ["node", "deg"] if b.column_names[0] == "node"
            else ["deg", "node"]),
        batch_format="pyarrow"))

    # attach both endpoint degrees (two keyed joins), orient by
    # (deg, id): lo = lower-rank endpoint
    j1 = e.join(deg, join_type="inner",
                num_partitions=cap_join_partitions(8),
                on=("u",), right_on=("node",))
    j1 = _scrub(j1.map_batches(
        lambda b: b.rename_columns(
            [("deg_u" if c == "deg" else c) for c in b.column_names]),
        batch_format="pyarrow"))
    j2 = j1.join(deg, join_type="inner",
                 num_partitions=cap_join_partitions(8),
                 on=("v",), right_on=("node",))

    def orient(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        du = b.column("deg_u").to_numpy(zero_copy_only=False)
        dv = b.column("deg").to_numpy(zero_copy_only=False)
        u_low = (du < dv) | ((du == dv) & (u < v))
        return pa.table({
            "lo": pa.array(np.where(u_low, u, v)),
            "hi": pa.array(np.where(u_low, v, u)),
            "dlo": pa.array(np.where(u_low, du, dv), pa.int64()),
            "dhi": pa.array(np.where(u_low, dv, du), pa.int64())})

    ori = _scrub(j2.map_batches(orient, batch_format="pyarrow"))

    # wedges at each low vertex: self-join on lo, keep (y, z) ordered
    # by the same (deg, id) rank so each wedge forms once
    w = ori.join(ori, join_type="inner",
                 num_partitions=cap_join_partitions(8),
                 on=("lo",), right_on=("lo",), right_suffix="_r")

    def wedge(b: pa.Table) -> pa.Table:
        y = b.column("hi").to_numpy(zero_copy_only=False)
        z = b.column("hi_r").to_numpy(zero_copy_only=False)
        dy = b.column("dhi").to_numpy(zero_copy_only=False)
        dz = b.column("dhi_r").to_numpy(zero_copy_only=False)
        keep = (dy < dz) | ((dy == dz) & (y < z))
        t = pa.table({"x": b.column("lo"),
                      "y": b.column("hi"), "z": b.column("hi_r")})
        return t.filter(pa.array(keep))

    wedges = _scrub(w.map_batches(wedge, batch_format="pyarrow"))

    # close wedges against the oriented edge set on the (y, z) pair —
    # a two-column equi-join, NOT a fused string key: string node ids
    # containing the separator would collide ("a|b","c" vs "a","b|c")
    # and fabricate triangles only in this mode
    ek = _scrub(ori.map_batches(
        lambda b: pa.table({"ey": b.column("lo"), "ez": b.column("hi")}),
        batch_format="pyarrow"))
    tri = wedges.join(ek, join_type="inner",
                      num_partitions=cap_join_partitions(8),
                      on=("y", "z"), right_on=("ey", "ez"))

    # per-node counts: explode corners, one count aggregate
    corners = _scrub(tri.map_batches(
        lambda b: pa.table({"node": pa.concat_arrays([
            b.column(c).combine_chunks() for c in ("x", "y", "z")])}),
        batch_format="pyarrow"))
    out = corners.groupby("node").count()
    return _scrub(out.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "n_tri": pc.cast(b.column("count()"),
                                             pa.int64())}),
        batch_format="pyarrow"))


def shortest_paths(edges: ray.data.Dataset, seeds: list,
                   src: str = "a", dst: str = "b", weight: str = "w",
                   max_hops: int = 10, mode: str = "auto"
                   ) -> ray.data.Dataset:
    """Hop-bounded single-source(-set) shortest paths over a weighted
    DIGRAPH (Bellman-Ford relaxation, ``max_hops`` synchronous rounds).

    Returns (node, dist) = the minimum total weight over paths of at
    most ``max_hops`` edges from any seed (seeds at 0; unreachable
    absent). Parallel edges collapse to their MINIMUM weight first
    (simple-digraph semantics — the SQL twin does the same). Integer
    weights + min-reductions make the result exactly parallelism-
    invariant, and the hop bound is part of the semantics (it is what
    makes the recursive-CTE oracle finite on cyclic graphs).

    Scale shape mirrors the other supersteps here: each round is ONE
    streaming edge scan with per-block groupby-min partials; broadcast
    mode merges partials into O(V) driver arrays; join mode keeps
    (node, dist) a Dataset — per round, a dist⋈edges keyed join, a
    groupby-min, and a min-union with the standing table. Rounds stop
    early when no distance improves.
    """
    canon = edges.map_batches(
        lambda b: pa.table({"src": b.column(src), "dst": b.column(dst),
                            "w": pc.cast(b.column(weight), pa.int64())}),
        batch_format="pyarrow")
    e = canon.groupby(["src", "dst"]).aggregate(Min("w", alias_name="w")) \
        .materialize()
    e = _scrub(e)
    if _resolve_mode(mode, e.count()) == "join":
        return _sssp_join(e, seeds, max_hops)

    seed_list = list(dict.fromkeys(seeds))
    nodes = list(seed_list)
    idx = pd.Index(nodes)
    dist = np.zeros(len(nodes), np.int64)

    for _ in range(max_hops):
        ref = ray.put(dict(zip(nodes, dist.tolist())))

        def relax(b: pa.Table, _ref=ref) -> pa.Table:
            m = ray.get(_ref)
            s = b.column("src").to_pandas().map(m)
            ok = s.notna().to_numpy()
            if not ok.any():
                return pa.table({"node": pa.array([], b.column("dst").type),
                                 "d": pa.array([], pa.int64())})
            d = pd.DataFrame({
                "node": b.column("dst").to_pandas()[ok],
                "d": s[ok].astype(np.int64)
                + b.column("w").to_pandas()[ok]})
            part = d.groupby("node", sort=False)["d"].min()
            return pa.table({"node": pa.array(part.index),
                             "d": pa.array(part.values, pa.int64())})

        pt = _collect(e.map_batches(relax, batch_format="pyarrow"))
        if pt is None:
            break
        cand = pd.DataFrame({
            "node": pt.column("node").to_pandas(),
            "d": pt.column("d").to_numpy(zero_copy_only=False)}) \
            .groupby("node", sort=False)["d"].min()
        cn = cand.index.to_numpy()
        cd = cand.to_numpy(np.int64)
        pos = idx.get_indexer(cn)
        known = pos >= 0
        before = dist.copy()
        np.minimum.at(dist, pos[known], cd[known])
        changed = not np.array_equal(dist, before)
        if (~known).any():
            nodes.extend(cn[~known].tolist())
            dist = np.concatenate([dist, cd[~known]])
            idx = pd.Index(nodes)
            changed = True
        if not changed:
            break
    return ray.data.from_arrow(pa.table(
        {"node": pa.array(nodes),
         "dist": pa.array(dist, pa.int64())}))


def _sssp_join(e: ray.data.Dataset, seeds: list,
               max_hops: int) -> ray.data.Dataset:
    """Keyed-join scale path: (node, dist) stays a Dataset."""
    sch = e.schema()
    node_t = sch.types[sch.names.index("src")]
    seed_list = list(dict.fromkeys(seeds))
    dist = ray.data.from_arrow(pa.table(
        {"node": pa.array(seed_list, node_t),
         "dist": pa.array([0] * len(seed_list), pa.int64())}))

    for _ in range(max_hops):
        msgs = e.join(dist, join_type="inner",
                      num_partitions=cap_join_partitions(8),
                      on=("src",), right_on=("node",))
        prop = _scrub(msgs.map_batches(
            lambda b: pa.table({
                "node": b.column("dst"),
                "dist": pc.add(b.column("dist"), b.column("w"))}),
            batch_format="pyarrow"))
        if prop.count() == 0:
            break
        merged = _scrub(prop.union(dist).groupby("node").aggregate(
            Min("dist", alias_name="new_dist")))
        # changed = any node whose new dist beats (or is new vs) the
        # standing table: left_outer null-probe + comparison
        probe = merged.join(dist, join_type="left_outer",
                            num_partitions=cap_join_partitions(8),
                            on=("node",), right_on=("node",),
                            right_suffix="_old")
        changed = probe.map_batches(
            lambda b: pa.table({"c": pc.cast(pc.or_kleene(
                pc.is_null(b.column("dist")),
                pc.less(b.column("new_dist"), b.column("dist"))),
                pa.int64())}),
            batch_format="pyarrow").sum("c")
        dist = _scrub(merged.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "dist": b.column("new_dist")}),
            batch_format="pyarrow")).materialize()
        if not changed:
            break
    return dist


def core_numbers(edges: ray.data.Dataset, src: str = "a",
                 dst: str = "b", max_iters: int = 100,
                 mode: str = "auto") -> ray.data.Dataset:
    """k-core decomposition: (node, core) where core is the largest k
    such that the node survives in the k-core (every member has >= k
    neighbors inside the subgraph) — the coreness signal web-quality
    and spam pipelines compute over host graphs.

    Algorithm: the h-index fixed point (Lu, Chen, Zhang & Zhou 2016,
    "The H-index of a network node" — coreness = repeated h-index of
    neighbor values, initialized at degree). Each BSP round streams the
    undirected edge list ONCE, emitting per-block (node, neighbor
    value) HISTOGRAM partials (groupby counts — pre-shrunk, never raw
    edges), then computes each node's h-index from its merged
    histogram; values only decrease, and the fixed point is exactly
    the classic peel algorithm's core number (deterministic integers,
    so both modes and the naive twin agree bit-for-bit).

    Broadcast mode merges histogram partials into O(V)-indexed driver
    frames (vectorized rank-vs-value h-index, no per-node loops); join
    mode keeps (node, value) a Dataset — per round, a values⋈edges
    keyed join, a (node, value) count aggregate, and a block-local
    h-index finish after ONE node-keyed repartition. Self-loops are
    dropped; parallel edges collapse (simple-graph semantics).
    """
    canon = edges.map_batches(
        lambda b: _canon_block(b, src, dst), batch_format="pyarrow")
    e = distinct_rows(canon, ["u", "v"])
    und = _undirect(e, "u", "v").materialize()
    if _resolve_mode(mode, und.count()) == "join":
        return _core_join(und, max_iters)

    def block_deg(b: pa.Table) -> pa.Table:
        return pa.table(b.select(["src"]).group_by("src").aggregate(
            [("src", "count")]).rename_columns(["node", "d"]))

    dt = _collect(und.map_batches(block_deg, batch_format="pyarrow"))
    if dt is None:
        return ray.data.from_arrow(pa.table(
            {"node": pa.array([], pa.int64()),
             "core": pa.array([], pa.int64())}))
    agg = pd.DataFrame({"node": dt.column("node").to_pandas(),
                        "d": dt.column("d").to_numpy(
                            zero_copy_only=False)}) \
        .groupby("node", sort=True)["d"].sum()
    nodes = agg.index.to_numpy()
    val = agg.to_numpy(np.int64)
    idx = pd.Index(nodes)

    def _h_from_pairs(node_pos: np.ndarray, nb_val: np.ndarray,
                      n_nodes: int) -> np.ndarray:
        # h-index per node from (node position, neighbor value) pairs:
        # sort by (node, value desc); h = max over rows of
        # min(value, within-node rank)
        order = np.lexsort((-nb_val, node_pos))
        p, v = node_pos[order], nb_val[order]
        starts = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
        rank = np.arange(len(p), dtype=np.int64) + 1 \
            - np.repeat(starts, np.diff(np.r_[starts, len(p)]))
        h = np.zeros(n_nodes, np.int64)
        np.maximum.at(h, p, np.minimum(v, rank))
        return h

    for _ in range(max_iters):
        ref = ray.put(dict(zip(nodes.tolist(), val.tolist())))

        def hist(b: pa.Table) -> pa.Table:
            m = ray.get(ref)
            d = pd.DataFrame({
                "node": b.column("dst").to_pandas(),
                "v": b.column("src").to_pandas().map(m)})
            part = d.groupby(["node", "v"], sort=False).size()
            lv = part.index.get_level_values
            return pa.table({
                "node": pa.array(lv("node")),
                "v": pa.array(lv("v").to_numpy(np.int64)),
                "c": pa.array(part.to_numpy(np.int64))})

        pt = _collect(und.map_batches(hist, batch_format="pyarrow"))
        df = pd.DataFrame({
            "node": pt.column("node").to_pandas(),
            "v": pt.column("v").to_numpy(zero_copy_only=False),
            "c": pt.column("c").to_numpy(zero_copy_only=False)}) \
            .groupby(["node", "v"], sort=False)["c"].sum().reset_index()
        # expand histogram rows back to one row per (node, neighbor):
        # total neighbor rows == 2E, bounded in broadcast mode
        pos = idx.get_indexer(df["node"].to_numpy()).repeat(
            df["c"].to_numpy())
        nv = df["v"].to_numpy(np.int64).repeat(df["c"].to_numpy())
        new = _h_from_pairs(pos, nv, len(nodes))
        if np.array_equal(new, val):
            break
        val = new
    return ray.data.from_arrow(pa.table(
        {"node": pa.array(nodes), "core": pa.array(val, pa.int64())}))


def _core_join(und: ray.data.Dataset, max_iters: int) -> ray.data.Dataset:
    """Keyed-join scale path: (node, value) stays a Dataset; the
    h-index finish is block-local after one node-keyed repartition."""
    from .dedup import _hash_shuffle

    vals = _scrub(und.map_batches(
        lambda b: pa.table({"node": b.column("src")}),
        batch_format="pyarrow").groupby("node").count())
    vals = _scrub(vals.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "val": pc.cast(b.column("count()"),
                                           pa.int64())}),
        batch_format="pyarrow")).materialize()

    for _ in range(max_iters):
        msgs = und.join(vals, join_type="inner",
                        num_partitions=cap_join_partitions(8),
                        on=("src",), right_on=("node",))
        pairs = _scrub(msgs.map_batches(
            lambda b: pa.table({"node": b.column("dst"),
                                "v": b.column("val")}),
            batch_format="pyarrow"))
        hist = _scrub(pairs.groupby(["node", "v"]).count())

        def block_h(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "new_val": pa.array([], pa.int64())})
            idx_ = pc.sort_indices(b, sort_keys=[
                ("node", "ascending"), ("v", "descending")])
            s = b.take(idx_)
            n = s.column("node").to_numpy(zero_copy_only=False)
            v = s.column("v").to_numpy(zero_copy_only=False)
            c = s.column("count()").to_numpy(zero_copy_only=False)
            # histogram rows -> cumulative neighbor count per node;
            # h = max min(v, cum) over rows (v desc within node)
            starts = np.flatnonzero(np.r_[True, n[1:] != n[:-1]])
            cum = np.cumsum(c)
            base = np.repeat(np.r_[0, cum[starts[1:] - 1]]
                             if len(starts) > 1 else [0],
                             np.diff(np.r_[starts, len(n)]))
            within = cum - base
            h = np.minimum(v, within)
            hm = pd.Series(h).groupby(pd.Series(n)).max()
            return pa.table({"node": pa.array(hm.index.to_numpy()),
                             "new_val": pa.array(hm.to_numpy(np.int64))})

        with _hash_shuffle(hist):
            newv = _scrub(hist.repartition(
                num_blocks=cap_join_partitions(8), keys=["node"])
                .map_batches(block_h, batch_format="pyarrow",
                             batch_size=None)).materialize()
        probe = newv.join(vals, join_type="inner",
                          num_partitions=cap_join_partitions(8),
                          on=("node",), right_on=("node",))
        changed = probe.map_batches(
            lambda b: pa.table({"c": pc.cast(pc.not_equal(
                b.column("new_val"), b.column("val")), pa.int64())}),
            batch_format="pyarrow").sum("c")
        vals = _scrub(newv.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "val": b.column("new_val")}),
            batch_format="pyarrow")).materialize()
        if not changed:
            break
    return vals.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "core": b.column("val")}),
        batch_format="pyarrow")
