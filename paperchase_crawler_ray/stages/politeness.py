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
import pandas as pd

from ..oracle import CrawlConfig


class PolitenessScheduler:
    """map_groups callable over per-host frontier groups."""

    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["url_hash"].to_numpy(),
                            g["depth"].to_numpy(),
                            -g["priority"].to_numpy()))
        g = g.iloc[order].reset_index(drop=True)
        budget = self.cfg.host_wave_budget(float(g["crawl_delay"].iloc[0]))
        n = len(g)
        admitted = np.arange(n) < budget
        g["admitted"] = admitted
        # deferred rows decay so fresh discoveries can overtake them
        pri = g["priority"].to_numpy().copy()
        pri[~admitted] *= self.cfg.defer_decay
        g["priority"] = pri
        return g
