"""Full-coverage correctness artifact (VERDICT r4 next #3): run EVERY
`queries()` entry at sf0.01 — DuckDB-oracled entries compared on
schema/rows/values (the driver's gate, replicated from
tools/check_oracle.py), rows-only entries executed and row-counted —
and write one machine-readable JSON artifact.

Usage: python tools/self_correctness.py [out.json] [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_oracle import _to_pandas, compare  # noqa: E402  (sibling)


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_SELF_r05.json"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    import duckdb
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as e
    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    results: dict[str, dict] = {}
    n_ok = n_bad = 0
    for name, fn in qs.items():
        t0 = time.time()
        rec: dict = {"oracled": name in osql}
        try:
            mine = _to_pandas(fn(sf))
            rec["rows"] = int(len(mine))
            if name in osql:
                err = compare(mine, con.execute(osql[name]).df())
                rec["status"] = "fail" if err else "match"
                if err:
                    rec["err"] = err
            else:
                rec["status"] = "rows_only"
        except Exception as ex:  # noqa: BLE001
            rec["status"] = "error"
            rec["err"] = f"{type(ex).__name__}: {ex}"
        rec["wall_sec"] = round(time.time() - t0, 2)
        ok = rec["status"] in ("match", "rows_only")
        n_ok += ok
        n_bad += not ok
        results[name] = rec
        print(("ok  " if ok else "FAIL"), name, rec["status"],
              f"{rec['wall_sec']}s", file=sys.stderr, flush=True)
    head = os.popen("git -C " + os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + " rev-parse --short HEAD").read().strip()
    artifact = {
        "sf_dir": sf,
        "git_head": head,
        "total": len(qs),
        "oracled": sum(1 for r in results.values() if r["oracled"]),
        "green": n_ok,
        "failed": n_bad,
        "queries": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"{n_ok}/{len(qs)} green -> {out_path}", file=sys.stderr)
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
