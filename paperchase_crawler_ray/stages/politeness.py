"""Per-host politeness-aware priority scheduling (SURVEY.md A3).

Expressed Ray-Data-natively as ``groupby("host").map_groups`` — the
politeness invariant ("a host's budget is global per wave") is exactly a
per-host grouping, so the hash-by-host shuffle IS the correctness
mechanism. Within a group the order is the deterministic total order
(-priority, depth, url_hash); admission honors the host's crawl_delay
under a VIRTUAL clock (budget = wave_seconds / delay), so results are
reproducible at any parallelism — the reproducibility requirement of
BASELINE.json:14.

Deferred rows (over budget) get ``admitted=false`` and a decayed
priority; the crawl loop unions them into the next wave's frontier.

Skew note (BASELINE.json:14 "hot-host salting"): the politeness stage
must stay strictly host-keyed, but a hot host's group cost is dominated
by the sort of its frontier rows, and its admitted output is capped by
the budget. The dedup/priority shuffles ahead of this stage are the ones
that get salted (see pipelines/crawl.py).
"""

from __future__ import annotations

import numpy as np

from ..oracle import CrawlConfig


def schedule_block(batch, cfg: CrawlConfig):
    """A3 vectorized over a WHOLE block holding complete hosts (correct
    only after ``repartition(keys=["host"])``): one lexsort orders every
    host's rows by the deterministic total order (-priority, depth,
    url_hash); per-host rank < budget admits; deferred priorities decay.
    """
    import pyarrow as pa

    if batch.num_rows == 0:
        return batch.append_column("admitted", pa.array([], pa.bool_()))
    host = np.asarray(batch.column("host").to_pylist())
    pri = batch.column("priority").to_numpy(zero_copy_only=False).copy()
    depth = batch.column("depth").to_numpy(zero_copy_only=False)
    uh = batch.column("url_hash").to_numpy(zero_copy_only=False)
    delay = batch.column("crawl_delay").to_numpy(zero_copy_only=False)
    order = np.lexsort((uh, depth, -pri, host))
    hs = host[order]
    new_host = np.ones(len(hs), bool)
    new_host[1:] = hs[1:] != hs[:-1]
    group_start = np.maximum.accumulate(np.where(new_host, np.arange(len(hs)), 0))
    rank = np.arange(len(hs)) - group_start
    budgets = np.array([cfg.host_wave_budget(float(d))
                        for d in delay[order]], np.int64)
    admitted_sorted = rank < budgets
    admitted = np.zeros(len(hs), bool)
    admitted[order] = admitted_sorted
    pri[~admitted] *= cfg.defer_decay
    out = batch.set_column(batch.schema.get_field_index("priority"),
                           "priority", pa.array(pri, pa.float64()))
    return out.append_column("admitted", pa.array(admitted, pa.bool_()))

# The naive per-group pandas twin of this kernel lives in
# tests/test_stages.py (PolitenessSchedulerTwin) — it is a test oracle,
# not a production stage; crawl.py wires schedule_block (host mode) and
# schedule_salted (skew mode) only.


def schedule_salted(deduped, cfg: CrawlConfig, host_partitions: int):
    """Skew-proof A3 admission over an already-DEDUPED frontier plane
    (the salted scale path; round-5 measurement: the fused host-keyed
    exchange scored 0.708 scaling efficiency on an 80%-one-host
    frontier because one partition received 80% of the wave).

    Decomposes the budget rule exactly, keeping the wave on its
    UNIFORM url_hash partitioning:

      1. one narrow per-block partial -> exact per-host (count, delay)
         on the driver (bounded by distinct hosts per wave; waves with
         more hosts than driver memory should stay on the host-keyed
         path, whose skew is then bounded by definition);
      2. hosts with count <= budget admit EVERY row row-locally — no
         exchange at all (an unbounded politeness budget costs
         nothing, as it should);
      3. only OVER-budget hosts enter an exchange, and only their
         per-block top-budget CANDIDATES cross it (the grouped_topk
         two-level prune: global top-B == top-B of the union of block
         top-Bs) — <= blocks x budget rows per hot host regardless of
         skew; block-local losers defer immediately (their global rank
         is provably >= budget).

    Returns ``(sched_dataset, host_counts)`` with ``host_counts`` the
    exact ``{host: [n, crawl_delay]}`` map (the wave's hot-host stats
    for free). Admitted set, deferred decay and columns are identical
    to ``schedule_block`` over the same deduped plane (test-forced).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    def host_partial(b: pa.Table) -> pa.Table:
        h = np.asarray(b.column("host").to_pylist())
        if not len(h):
            return pa.table({"host": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "delay": pa.array([], pa.float64())})
        d = b.column("crawl_delay").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        hs, ds_ = h[order], d[order]
        newg = np.ones(len(hs), bool)
        newg[1:] = hs[1:] != hs[:-1]
        starts = np.flatnonzero(newg)
        counts = np.diff(np.r_[starts, len(hs)])
        return pa.table({
            "host": pa.array(hs[starts].tolist(), pa.string()),
            "n": pa.array(counts, pa.int64()),
            "delay": pa.array(ds_[starts], pa.float64())})

    totals: dict[str, list] = {}
    for b in deduped.select_columns(["host", "crawl_delay"]) \
            .map_batches(host_partial, batch_format="pyarrow",
                         batch_size=None) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.table(b)
        for h, n, d in zip(t.column("host").to_pylist(),
                           t.column("n").to_pylist(),
                           t.column("delay").to_pylist()):
            if h in totals:
                totals[h][0] += int(n)
            else:
                totals[h] = [int(n), float(d)]
    hot = {h: int(cfg.host_wave_budget(d))
           for h, (n, d) in totals.items()
           if n > cfg.host_wave_budget(d)}

    if not hot:
        def admit_all(b: pa.Table) -> pa.Table:
            return b.append_column(
                "admitted", pa.array(np.ones(b.num_rows, bool),
                                     pa.bool_()))
        return (deduped.map_batches(admit_all, batch_format="pyarrow",
                                    batch_size=None), totals)

    hot_ref = ray.put(hot)
    decay = float(cfg.defer_decay)
    hot_arr = np.asarray(sorted(hot), dtype=object)

    def split_block(b: pa.Table) -> pa.Table:
        """Non-hot rows + hot-host block losers finalize here; hot-host
        block top-budget candidates get ``_cand`` for the exchange."""
        hotmap = ray.get(hot_ref)
        h = np.asarray(b.column("host").to_pylist())
        pri = b.column("priority").to_numpy(zero_copy_only=False).copy()
        depth = b.column("depth").to_numpy(zero_copy_only=False)
        uh = b.column("url_hash").to_numpy(zero_copy_only=False)
        is_hot = np.isin(h, hot_arr)
        admitted = ~is_hot          # non-hot hosts: n <= budget, all in
        cand = np.zeros(len(h), bool)
        if is_hot.any():
            idx = np.flatnonzero(is_hot)
            order = idx[np.lexsort((uh[idx], depth[idx], -pri[idx],
                                    h[idx]))]
            hs = h[order]
            newg = np.ones(len(hs), bool)
            newg[1:] = hs[1:] != hs[:-1]
            gstart = np.maximum.accumulate(
                np.where(newg, np.arange(len(hs)), 0))
            rank = np.arange(len(hs)) - gstart
            budgets = np.array([hotmap[x] for x in hs], np.int64)
            cand[order] = rank < budgets
            lose = is_hot & ~cand
            pri[lose] *= decay      # global rank certainly >= budget
        out = b.set_column(b.schema.get_field_index("priority"),
                           "priority", pa.array(pri, pa.float64()))
        out = out.append_column("admitted",
                                pa.array(admitted, pa.bool_()))
        return out.append_column("_cand", pa.array(cand, pa.bool_()))

    tagged = deduped.map_batches(split_block, batch_format="pyarrow",
                                 batch_size=None).materialize()
    finals = tagged.map_batches(
        lambda b: b.filter(pc.invert(b.column("_cand")))
        .drop_columns(["_cand"]), batch_format="pyarrow")

    def rank_candidates(b: pa.Table) -> pa.Table:
        """Exact per-host rank over the pruned candidate plane (hosts
        co-located by the keyed repartition; whole-block batches)."""
        hotmap = ray.get(hot_ref)
        h = np.asarray(b.column("host").to_pylist())
        pri = b.column("priority").to_numpy(zero_copy_only=False).copy()
        depth = b.column("depth").to_numpy(zero_copy_only=False)
        uh = b.column("url_hash").to_numpy(zero_copy_only=False)
        order = np.lexsort((uh, depth, -pri, h))
        hs = h[order]
        newg = np.ones(len(hs), bool)
        newg[1:] = hs[1:] != hs[:-1]
        gstart = np.maximum.accumulate(
            np.where(newg, np.arange(len(hs)), 0))
        rank = np.arange(len(hs)) - gstart
        budgets = np.array([hotmap[x] for x in hs], np.int64)
        admitted = np.zeros(len(h), bool)
        admitted[order] = rank < budgets
        pri[~admitted] *= decay
        out = b.set_column(b.schema.get_field_index("priority"),
                           "priority", pa.array(pri, pa.float64()))
        out = out.set_column(out.schema.get_field_index("admitted"),
                             "admitted", pa.array(admitted, pa.bool_()))
        return out.drop_columns(["_cand"])

    from ..ops.dedup import _hash_shuffle
    from ..ops.relational import scrub_empty_blocks
    pruned = scrub_empty_blocks(tagged.map_batches(
        lambda b: b.filter(b.column("_cand")), batch_format="pyarrow"))
    with _hash_shuffle(pruned):   # keyed repartition needs HASH_SHUFFLE
        cands = pruned.repartition(
            num_blocks=max(2, min(host_partitions, len(hot))),
            keys=["host"]) \
            .map_batches(rank_candidates, batch_format="pyarrow",
                         batch_size=None).materialize()
    return finals.union(cands), totals
