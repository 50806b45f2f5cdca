"""Decade-of-scale sweep (VERDICT r4 next #1): deterministically tile
the driver's sf0.1 parquet tables 10x into a local sf~1 instance, then
time the slowest bench queries over it at full CPU width.

Tiling rule: 10 disjoint key universes. Every foreign-key DOMAIN
(custkey, orderkey, suppkey, partkey, event, doc, vec) gets one offset
ceiling (max over the sf0.1 domain + 1), and copy k adds k*ceil to
every column of that domain in every table — so joins/anti-joins/
groupbys behave exactly like a real 10x instance (no cross-copy key
collisions, no dangling FKs). nation/region are fixed dimensions and
are copied as-is. Document texts get a per-copy suffix so the dedup
queries see 10x corpora, not 10 byte-identical clones of one corpus.

Output: one directory per table named <table>.parquet holding one file
per copy (ray.data.read_parquet reads the directory file-parallel).

Usage:
  python tools/scale_sweep.py [--build-only] [--out /tmp/sf1]
                              [--queries q_a q_b ...] [--cpus N]
Prints one JSON line: {"sf1_dir":..., "build_sec":..., "queries":
{name: {"wall_sec":..., "rows":...}}, plus memory evidence}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COPIES = 10
SRC = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

# domain -> {table: [columns]}
DOMAINS = {
    "custkey": {"customer": ["c_custkey"], "orders": ["o_custkey"],
                "events": ["user_id"]},
    "orderkey": {"orders": ["o_orderkey"], "lineitem": ["l_orderkey"]},
    "suppkey": {"supplier": ["s_suppkey"], "lineitem": ["l_suppkey"]},
    "partkey": {"part": ["p_partkey"], "lineitem": ["l_partkey"]},
    "event": {"events": ["event_id"]},
    "doc": {"documents": ["doc_id"]},
    "vec": {"embeddings": ["vec_id"]},
}
TILED = ["customer", "orders", "lineitem", "supplier", "part", "events",
         "documents", "embeddings"]
COPIED = ["nation", "region"]

DEFAULT_QUERIES = [
    "q_supplier_parts", "q_late_only_supplier", "q_paragraph_dedup",
    "q_big_orders", "q_exists_orders", "q_minhash_dedup", "q_asof_join",
    "q_curate", "q_heavy_hitters", "q_min_cost_supplier",
]


def _domain_ceils() -> dict[str, int]:
    ceils = {}
    for dom, cols in DOMAINS.items():
        mx = 0
        for table, col_names in cols.items():
            t = pq.read_table(os.path.join(SRC, f"{table}.parquet"),
                              columns=col_names)
            for c in col_names:
                mx = max(mx, int(pc.max(t.column(c)).as_py() or 0))
        ceils[dom] = mx + 1
    return ceils


def build_sf1(out_dir: str) -> float:
    """Idempotent: skips tables whose directory already exists."""
    t0 = time.monotonic()
    ceils = _domain_ceils()
    col_domain: dict[str, dict[str, str]] = {}
    for dom, tables in DOMAINS.items():
        for table, cols in tables.items():
            for c in cols:
                col_domain.setdefault(table, {})[c] = dom
    os.makedirs(out_dir, exist_ok=True)
    for table in COPIED:
        d = os.path.join(out_dir, f"{table}.parquet")
        if not os.path.isdir(d):
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                pq.read_table(os.path.join(SRC, f"{table}.parquet")),
                os.path.join(d, "part-0.parquet"))
    for table in TILED:
        d = os.path.join(out_dir, f"{table}.parquet")
        if os.path.isdir(d) and len(os.listdir(d)) == COPIES:
            continue
        os.makedirs(d, exist_ok=True)
        src = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
        for k in range(COPIES):
            t = src
            for c, dom in col_domain.get(table, {}).items():
                idx = t.schema.get_field_index(c)
                shifted = pc.add(t.column(c),
                                 pa.scalar(k * ceils[dom],
                                           t.schema.field(c).type))
                t = t.set_column(idx, c, shifted)
            if table == "documents" and k > 0:
                idx = t.schema.get_field_index("text")
                t = t.set_column(
                    idx, "text", pc.binary_join_element_wise(
                        t.column("text"), f" copyslice {k}", " "))
            pq.write_table(t, os.path.join(d, f"part-{k}.parquet"),
                           row_group_size=65536)
    return time.monotonic() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--build-only", action="store_true")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", nargs="*", default=DEFAULT_QUERIES)
    args = ap.parse_args()

    build_sec = build_sf1(args.out)
    result = {"sf1_dir": args.out, "build_sec": round(build_sec, 1),
              "copies": COPIES, "src": SRC, "num_cpus": args.cpus}
    if not args.build_only:
        import ray
        if not ray.is_initialized():
            ray.init(address="local", num_cpus=args.cpus,
                     include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        import pandas as pd
        import __ray_entry__ as entrymod
        from bench import _mem_evidence
        qs = entrymod.queries()
        out = {}
        for name in args.queries:
            t0 = time.monotonic()
            res = qs[name](args.out)
            if isinstance(res, pd.DataFrame):
                n = len(res)
            elif isinstance(res, pa.Table):
                n = res.num_rows
            else:
                n = res.count()
            out[name] = {"wall_sec": round(time.monotonic() - t0, 3),
                         "rows": int(n)}
            print(f"# {name} {out[name]}", file=sys.stderr, flush=True)
        result["queries"] = out
        result.update(_mem_evidence())
        ray.shutdown()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
