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
# not a production stage; crawl.py wires only schedule_block.
