"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl pipeline (fixture web -> landed
image_caption table, the BASELINE.json:15 schema) plus a small
training-data pass over /root/testdata/sf0.001.

``queries()`` / ``oracle_sql()`` cover SURVEY.md §2.9's operator analogs
plus the training-data operators (dedup / similarity / text analysis).
Float policy for SQL-checked queries: no float aggregation across rows
(distributed summation order differs from DuckDB's); integer-valued sums,
raw pass-through floats, and per-row ROUND'ed floats only.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _rp(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                                 columns=columns)


def _meta_rows(sf_dir: str, table: str) -> int:
    """Row count from parquet METADATA only (file or directory layout)
    — the size probe for broadcast/keyed plan switches; no data read."""
    import glob

    import pyarrow.parquet as _pq
    p = os.path.join(sf_dir, f"{table}.parquet")
    files = sorted(glob.glob(os.path.join(p, "*.parquet"))) \
        if os.path.isdir(p) else [p]
    return sum(_pq.read_metadata(f).num_rows for f in files)


def _cache_tag(sf_dir: str, tables: tuple[str, ...]) -> str:
    """Cache key for derived-layout queries: the sf path PLUS each
    source parquet's (mtime, size) identity — a regenerated testdata
    tree must never hit a stale /tmp layout from a previous run."""
    import hashlib
    h = hashlib.blake2b(sf_dir.encode(), digest_size=8)
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        st = os.stat(p)
        h.update(f"{t}:{st.st_mtime_ns}:{st.st_size}".encode())
    return h.hexdigest()


def _rename(ds: ray.data.Dataset, mapping: dict[str, str]) -> ray.data.Dataset:
    def r(b: pa.Table) -> pa.Table:
        return b.rename_columns([mapping.get(c, c) for c in b.column_names])
    return ds.map_batches(r, batch_format="pyarrow")


def entry() -> Any:
    """Flagship: fixture-web crawl -> image_caption table; plus a
    documents enrichment pass over sf0.001 (token/quality/langid)."""
    from paperchase_crawler_ray.ops.textstats import (fingerprint_batch,
                                                      language_id_batch,
                                                      quality_score_batch)
    from paperchase_crawler_ray.pipelines.crawl import demo_crawl

    # training-data pass over the driver tables (streamed, not returned)
    docs = _rp("/root/testdata/sf0.001", "documents")
    enriched = docs.map_batches(quality_score_batch, batch_format="pyarrow") \
        .map_batches(language_id_batch, batch_format="pyarrow") \
        .map_batches(fingerprint_batch, batch_format="pyarrow")
    assert enriched.count() == docs.count()

    out = tempfile.mkdtemp(prefix="pc_entry_")
    res = demo_crawl(out, n_hosts=6, total_pages=40, n_seeds=3, max_waves=3)
    return res.images_dataset()


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_host_counts(sf: str):
    ds = _rp(sf, "documents", columns=["source"])
    return _rename(ds.groupby("source").count(), {"count()": "c"})


def _q_exact_dedup(sf: str):
    from paperchase_crawler_ray.ops.relational import exact_dedup
    ds = _rp(sf, "events",
             columns=["event_id", "ts", "user_id", "event_type", "value"])
    out = exact_dedup(ds, ["user_id", "event_type"],
                      [("ts", False), ("event_id", False)])
    return out.select_columns(["event_id", "user_id", "event_type", "ts", "value"])


def _q_seen_anti_join(sf: str):
    from paperchase_crawler_ray.ops.relational import anti_join
    ev = _rp(sf, "events", columns=["event_id", "user_id"])
    cust = _rp(sf, "customer", columns=["c_custkey", "c_mktsegment"]) \
        .filter(expr="c_mktsegment == 'BUILDING'")
    return anti_join(ev, "user_id", cust, "c_custkey")


def _q_priority_rebalance(sf: str):
    from ray.data.aggregate import Sum
    li = _rp(sf, "lineitem", columns=["l_suppkey", "l_quantity"])
    agg = li.groupby("l_suppkey").aggregate(Sum("l_quantity", alias_name="total_qty"))
    return agg.sort(["total_qty", "l_suppkey"], descending=[True, False])


def _q_topk(sf: str):
    from paperchase_crawler_ray.ops.relational import global_topk
    o = _rp(sf, "orders", columns=["o_custkey"])
    counts = _rename(o.groupby("o_custkey").count(), {"count()": "c"})
    return global_topk(counts, [("c", True), ("o_custkey", False)], 10)


def _q_scope_semi(sf: str):
    from paperchase_crawler_ray.ops.relational import semi_join
    o = _rp(sf, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    c = _rp(sf, "customer", columns=["c_custkey", "c_mktsegment"]) \
        .filter(expr="c_mktsegment == 'BUILDING'")
    return semi_join(o, "o_custkey", c, "c_custkey")


def _q_equi_join(sf: str):
    o = _rp(sf, "orders", columns=["o_orderkey", "o_custkey"])
    c = _rp(sf, "customer", columns=["c_custkey", "c_nationkey"])
    n = _rp(sf, "nation", columns=["n_nationkey", "n_name"])
    j = o.join(c, join_type="inner", num_partitions=8,
               on=("o_custkey",), right_on=("c_custkey",))
    j2 = j.join(n, join_type="inner", num_partitions=8,
                on=("c_nationkey",), right_on=("n_nationkey",))
    return _rename(j2.groupby("n_name").count(), {"count()": "n_orders"})


def _q_union_budget(sf: str):
    from paperchase_crawler_ray.ops.relational import global_topk
    ev = _rp(sf, "events", columns=["event_id", "event_type", "value"])
    a = ev.filter(expr="event_type == 'click'")
    b = ev.filter(expr="event_type == 'error'")
    return global_topk(a.union(b), [("value", True), ("event_id", False)], 100)


def _ts_us(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """Pin a timestamp column to microseconds: Ray 2.49's hash aggregate
    nondeterministically round-trips timestamp keys through second
    precision, and the driver's value-hash is unit-sensitive."""
    def fix(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index(col)
        return b.set_column(i, col, pc.cast(b.column(col),
                                            pa.timestamp("us")))
    return ds.map_batches(fix, batch_format="pyarrow")


def _q_window_wave(sf: str):
    ev = _rp(sf, "events", columns=["ts"])

    def floor_hour(batch: pa.Table) -> pa.Table:
        return pa.table({"h": pc.floor_temporal(batch.column("ts"), unit="hour")})

    return _ts_us(_rename(ev.map_batches(floor_hour, batch_format="pyarrow")
                          .groupby("h").count(), {"count()": "c"}), "h")


def _q_props_json(sf: str):
    ev = _rp(sf, "events", columns=["props"])

    def extract(batch: pa.Table) -> pa.Table:
        ks = [str(json.loads(p)["k"]) if p else None
              for p in batch.column("props").to_pylist()]
        return pa.table({"k": pa.array(ks, pa.string())})

    return _rename(ev.map_batches(extract, batch_format="pyarrow")
                   .groupby("k").count(), {"count()": "c"})


def _q_distinct(sf: str):
    langs = _rp(sf, "documents", columns=["lang"]).unique("lang")
    return pd.DataFrame({"n_langs": np.array([len(langs)], np.int64)})


def _q_distinct_pairs(sf: str):
    """Exact multi-column DISTINCT via the `distinct_rows` kernel
    (block distinct -> capped key-hash repartition -> block distinct;
    no per-group count columns, no 200-partition default aggregate)."""
    from paperchase_crawler_ray.ops.relational import distinct_rows
    li = _rp(sf, "lineitem", columns=["l_partkey", "l_suppkey"])
    return distinct_rows(li, ["l_partkey", "l_suppkey"])


def _q_partial_agg(sf: str):
    """Two-level partial keyed aggregate (`partial_keyed_agg`): per-
    supplier sum/min/max of lineitem quantity via block-local pyarrow
    partials + ONE capped key-hash exchange — the combiner aggregate
    shape every fact-sized sum/min/max plane in this engine rides
    (~3x the Ray aggregate; measured in SCALE.md §13). Integer
    measures, so the sums are exact in any order."""
    from paperchase_crawler_ray.ops.relational import partial_keyed_agg
    li = _rp(sf, "lineitem", columns=["l_suppkey", "l_quantity"])

    def to_int(b: pa.Table) -> pa.Table:
        return pa.table({"l_suppkey": b.column("l_suppkey"),
                         "q": pc.cast(b.column("l_quantity"),
                                      pa.int64())})

    return partial_keyed_agg(
        li.map_batches(to_int, batch_format="pyarrow"),
        ["l_suppkey"], [("q", "sum"), ("q", "min"), ("q", "max")])


def _q_embedding_norm(sf: str):
    emb = _rp(sf, "embeddings", columns=["vec_id", "embedding"])

    def norms(batch: pa.Table) -> pa.Table:
        E = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)
                     ).astype(np.float64)
        l2 = np.round(np.sqrt((E * E).sum(axis=1)), 3)
        return pa.table({"vec_id": batch.column("vec_id"),
                         "l2norm": pa.array(l2, pa.float64())})

    return emb.map_batches(norms, batch_format="pyarrow")


def _q_dim_stats(sf: str):
    """Per-dimension feature profile over the embedding vector column
    (the scaling/clipping statistics pass an ML pipeline runs before
    normalization): each batch reduces its (n, d) float32 matrix to d
    partial rows (min, max, positive count) — order-independent or
    integer aggregates only, so bit-identical to SQL regardless of
    reduction order — then a tiny d x n_blocks groupby finishes. At
    100 TB the shuffle carries d rows per block, never a vector."""
    from ray.data.aggregate import Max, Min, Sum
    emb = _rp(sf, "embeddings", columns=["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        E = np.stack(batch.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64)
        d = E.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
            "pmin": pa.array(E.min(axis=0), pa.float64()),
            "pmax": pa.array(E.max(axis=0), pa.float64()),
            "pnp": pa.array((E > 0).sum(axis=0).astype(np.int64)),
        })

    agg = emb.map_batches(partial, batch_format="pyarrow") \
        .groupby("dim").aggregate(Min("pmin", alias_name="min_v"),
                                  Max("pmax", alias_name="max_v"),
                                  Sum("pnp", alias_name="n_pos"))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"dim": b.column("dim"),
                         "min_v": b.column("min_v"),
                         "max_v": b.column("max_v"),
                         "n_pos": pc.cast(b.column("n_pos"), pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def _q_above_avg(sf: str):
    """Correlated-subquery shape: lineitem rows whose quantity exceeds
    their return-flag group's average — a 3-row aggregate broadcast
    into a streaming filter, never a shuffle join back to the fact
    table. Exact despite the float compare: quantities are
    integer-valued doubles, so the SUM is exact in any order and the
    single division matches the SQL engine bit-for-bit."""
    from ray.data.aggregate import Count, Sum
    li = _rp(sf, "lineitem", columns=["l_orderkey", "l_linenumber",
                                      "l_returnflag", "l_quantity"])
    avgs = {r["l_returnflag"]: r["sum_q"] / r["n_q"]
            for b in li.groupby("l_returnflag").aggregate(
                Sum("l_quantity", alias_name="sum_q"),
                Count(alias_name="n_q"))
            .iter_batches(batch_format="pandas", batch_size=None)
            for _, r in b.iterrows()}
    ref = ray.put(avgs)

    def flt(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        flags = b.column("l_returnflag").to_pylist()
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        thr = np.array([m[f] for f in flags], np.float64)
        return b.filter(pa.array(q > thr))

    return li.map_batches(flt, batch_format="pyarrow")


def _q_priority_class(sf: str):
    """Conditional aggregates over a fact-fact join (TPC-H Q12 shape,
    l_linestatus standing in for shipmode): lineitem |><| orders on the
    shared key, a row-level date predicate that forces the join (not a
    pre-aggregate), then CASE-WHEN counts per status class. One keyed
    shuffle; the CASE arithmetic is all-integer."""
    from ray.data.aggregate import Sum
    from paperchase_crawler_ray.ops.relational import cap_join_partitions
    li = _rp(sf, "lineitem", columns=["l_orderkey", "l_linestatus",
                                      "l_shipdate"])
    o = _rp(sf, "orders", columns=["o_orderkey", "o_orderpriority",
                                   "o_orderdate"])
    j = li.join(o, join_type="inner",
                num_partitions=cap_join_partitions(8),
                on=("l_orderkey",), right_on=("o_orderkey",))

    def classify(b: pa.Table) -> pa.Table:
        late = pc.greater(b.column("l_shipdate"), b.column("o_orderdate"))
        mask = late.to_numpy(zero_copy_only=False)
        pri = b.column("o_orderpriority").to_numpy(zero_copy_only=False)
        high = np.isin(pri, ["1-URGENT", "2-HIGH"])
        return pa.table({
            "l_linestatus": b.column("l_linestatus").filter(late),
            "high_c": pa.array((high[mask]).astype(np.int64)),
            "low_c": pa.array((~high[mask]).astype(np.int64)),
        })

    agg = j.map_batches(classify, batch_format="pyarrow") \
        .groupby("l_linestatus").aggregate(
            Sum("high_c", alias_name="high_count"),
            Sum("low_c", alias_name="low_count"))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"l_linestatus": b.column("l_linestatus"),
                         "high_count": pc.cast(b.column("high_count"),
                                               pa.int64()),
                         "low_count": pc.cast(b.column("low_count"),
                                              pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def _ts_us_col(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """Timestamp COLUMN -> int64 microseconds (exact, order-free).
    Distinct name from the Dataset-level `_ts_us` above: a same-name
    redefinition shadowed it at module scope and silently broke the
    window queries that call the Dataset form."""
    return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())


def _q_exists_orders(sf: str):
    """TPC-H Q4 shape: orders in a date window that have at least one
    lineitem shipped after the order date, counted per priority. The
    correlated EXISTS is rewritten two ways, size-switched on the
    orders table: below the broadcast bound the WINDOWED orders attach
    map-side into the lineitem scan, late rows filter immediately, and
    one ``distinct_rows`` exchange over the (orderkey, priority)
    survivors replaces the full-fact MAX aggregate + keyed join (sf1:
    25.1s -> measured in SCALE.md); above it, the pre-aggregate
    pushdown — EXISTS(l_shipdate > o_orderdate) == MAX(l_shipdate) >
    o_orderdate via the two-level partial max — keeps one row per
    orderkey crossing the keyed join."""
    from ray.data.aggregate import Count

    from paperchase_crawler_ray.ops.relational import (
        broadcast_lookup_join, cap_join_partitions, distinct_rows,
        partial_keyed_agg)
    li = _rp(sf, "lineitem", columns=["l_orderkey", "l_shipdate"])

    lo = pd.Timestamp("1996-01-01").value // 1000
    hi = pd.Timestamp("1997-01-01").value // 1000
    o = _rp(sf, "orders", columns=["o_orderkey", "o_orderdate",
                                   "o_orderpriority"])

    def window(b: pa.Table) -> pa.Table:
        d = _ts_us_col(b.column("o_orderdate"))
        keep = pc.and_(pc.greater_equal(d, pa.scalar(lo, pa.int64())),
                       pc.less(d, pa.scalar(hi, pa.int64())))
        t = b.filter(keep)
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "od_us": _ts_us_col(t.column("o_orderdate")),
                         "o_orderpriority": t.column("o_orderpriority")})

    win = o.map_batches(window, batch_format="pyarrow")
    broadcast_max = int(os.environ.get("PC_Q4_BROADCAST_MAX", 2_000_000))
    if _meta_rows(sf, "orders") <= broadcast_max:
        def ship_int(b: pa.Table) -> pa.Table:
            return pa.table({
                "l_orderkey": b.column("l_orderkey"),
                "ship_us": _ts_us_col(b.column("l_shipdate"))})

        att = broadcast_lookup_join(
            li.map_batches(ship_int, batch_format="pyarrow"),
            "l_orderkey", win, "o_orderkey",
            ["od_us", "o_orderpriority"])
        late_rows = att.map_batches(
            lambda b: b.filter(pc.greater(b.column("ship_us"),
                                          b.column("od_us"))),
            batch_format="pyarrow")
        pairs = distinct_rows(late_rows,
                              ["l_orderkey", "o_orderpriority"])
        agg = pairs.groupby("o_orderpriority").aggregate(
            Count(alias_name="n_orders"))
    else:
        mx = partial_keyed_agg(
            li.map_batches(lambda b: pa.table({
                "l_orderkey": b.column("l_orderkey"),
                "ship_us": _ts_us_col(b.column("l_shipdate"))}),
                batch_format="pyarrow"),
            ["l_orderkey"], [("ship_us", "max")])
        j = mx.join(win, join_type="inner",
                    num_partitions=cap_join_partitions(8),
                    on=("l_orderkey",), right_on=("o_orderkey",))
        agg = j.map_batches(
            lambda b: b.filter(pc.greater(b.column("ship_us_max"),
                                          b.column("od_us"))),
            batch_format="pyarrow") \
            .groupby("o_orderpriority").aggregate(
                Count(alias_name="n_orders"))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderpriority": b.column("o_orderpriority"),
                         "n_orders": pc.cast(b.column("n_orders"),
                                             pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def _q_big_orders(sf: str):
    """TPC-H Q18 shape: orders whose total lineitem quantity clears a
    HAVING threshold, joined back to orders and customers. The
    aggregate runs FIRST as the two-level partial sum (block-local
    combiner before ONE capped key-hash exchange — ~3x the Ray
    aggregate on this plane), the >150 filter prunes before either
    probe, and the surviving plane attaches orders + customer by
    size-switched broadcast lookups (keyed joins above the bound).
    Quantities are integer-valued, so the HAVING sum is exact in any
    order."""
    from paperchase_crawler_ray.ops.relational import (
        broadcast_lookup_join, cap_join_partitions, partial_keyed_agg)
    li = _rp(sf, "lineitem", columns=["l_orderkey", "l_quantity"])

    def to_int(b: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "q": pc.cast(b.column("l_quantity"), pa.int64())})

    agg = partial_keyed_agg(li.map_batches(to_int, batch_format="pyarrow"),
                            ["l_orderkey"], [("q", "sum")])
    hot = agg.map_batches(
        lambda b: b.filter(pc.greater(b.column("q_sum"),
                                      pa.scalar(150))),
        batch_format="pyarrow").materialize()

    o = _rp(sf, "orders", columns=["o_orderkey", "o_custkey",
                                   "o_totalprice"])
    c = _rp(sf, "customer", columns=["c_custkey", "c_name"])
    broadcast_max = int(os.environ.get("PC_Q18_BROADCAST_MAX",
                                       2_000_000))
    if hot.count() <= broadcast_max:
        # the HAVING survivors broadcast into the orders scan (unique
        # orderkeys), customer attaches as a dimension lookup — the
        # big tables never shuffle
        j = broadcast_lookup_join(o, "o_orderkey", hot, "l_orderkey",
                                  ["q_sum"])
        jc = broadcast_lookup_join(j, "o_custkey", c, "c_custkey",
                                   ["c_name"])

        def fin_b(b: pa.Table) -> pa.Table:
            return pa.table({"c_name": b.column("c_name"),
                             "o_orderkey": b.column("o_orderkey"),
                             "o_totalprice": b.column("o_totalprice"),
                             "total_qty": pc.cast(b.column("q_sum"),
                                                  pa.float64())})
        return jc.map_batches(fin_b, batch_format="pyarrow")

    j = hot.join(o, join_type="inner",
                 num_partitions=cap_join_partitions(8),
                 on=("l_orderkey",), right_on=("o_orderkey",))
    jc = j.join(c, join_type="inner",
                num_partitions=cap_join_partitions(8),
                on=("o_custkey",), right_on=("c_custkey",))

    def fin(b: pa.Table) -> pa.Table:
        # the joins keep the LEFT key column (l_orderkey / o_custkey)
        return pa.table({"c_name": b.column("c_name"),
                         "o_orderkey": b.column("l_orderkey"),
                         "o_totalprice": b.column("o_totalprice"),
                         "total_qty": pc.cast(b.column("q_sum"),
                                              pa.float64())})

    return jc.map_batches(fin, batch_format="pyarrow")


def _q_promo_share(sf: str):
    """TPC-H Q14 shape: share of promo revenue in a ship-date window.
    Float policy: revenue is computed in EXACT integer 10^-4 currency
    units (prices/discounts are 2-decimal by data contract, so
    round(price*100) * (100 - round(disc*100)) is an integer) — the
    sums commute bit-exactly with SQL and the single final division is
    IEEE-deterministic. part attaches via the broadcast lookup join
    (dimension side, unique key): the fact table never shuffles."""
    from paperchase_crawler_ray.ops.relational import broadcast_lookup_join
    lo = pd.Timestamp("1996-01-01").value // 1000
    hi = pd.Timestamp("1996-04-01").value // 1000
    li = _rp(sf, "lineitem", columns=["l_partkey", "l_extendedprice",
                                      "l_discount", "l_shipdate"])

    def rev(b: pa.Table) -> pa.Table:
        d = _ts_us_col(b.column("l_shipdate"))
        keep = pc.and_(pc.greater_equal(d, pa.scalar(lo, pa.int64())),
                       pc.less(d, pa.scalar(hi, pa.int64())))
        t = b.filter(keep)
        price = np.rint(t.column("l_extendedprice").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        disc = np.rint(t.column("l_discount").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"l_partkey": t.column("l_partkey"),
                         "r": pa.array(price * (100 - disc))})

    typed = broadcast_lookup_join(
        li.map_batches(rev, batch_format="pyarrow"), "l_partkey",
        _rp(sf, "part", columns=["p_partkey", "p_type"]),
        "p_partkey", ["p_type"])

    def partial(b: pa.Table) -> pa.Table:
        r = b.column("r").to_numpy(zero_copy_only=False)
        promo = pc.equal(b.column("p_type"), pa.scalar("PROMO")) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"p": pa.array([int(r[promo].sum())]),
                         "t": pa.array([int(r.sum())])})

    tot_p = tot_t = 0
    for b in typed.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.table(b)
        tot_p += sum(t.column("p").to_pylist())
        tot_t += sum(t.column("t").to_pylist())
    share = float(tot_p) / float(tot_t) if tot_t else 0.0
    return pd.DataFrame({"promo_rev": [tot_p], "total_rev": [tot_t],
                         "promo_share": [share]})


def _q_important_nations(sf: str):
    """TPC-H Q11 shape: nations holding more than 1/20 of global
    supplier balance. Group sums in exact integer cents; the global
    scalar is the sum of the (tiny) group sums, and the HAVING compares
    cross-multiplied integers (bal*20 > global) — no float anywhere."""
    from ray.data.aggregate import Sum

    from paperchase_crawler_ray.ops.relational import broadcast_lookup_join
    sup = _rp(sf, "supplier", columns=["s_nationkey", "s_acctbal"])

    def cents(b: pa.Table) -> pa.Table:
        bal = np.rint(b.column("s_acctbal").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"s_nationkey": b.column("s_nationkey"),
                         "bal": pa.array(bal)})

    grp = sup.map_batches(cents, batch_format="pyarrow") \
        .groupby("s_nationkey").aggregate(Sum("bal", alias_name="bal_c"))
    named = broadcast_lookup_join(
        grp, "s_nationkey",
        _rp(sf, "nation", columns=["n_nationkey", "n_name"]),
        "n_nationkey", ["n_name"])
    rows = named.to_pandas()  # one row per nation — bounded tiny
    total = int(rows["bal_c"].sum())
    keep = rows[rows["bal_c"] * 20 > total]
    return pd.DataFrame({"n_name": keep["n_name"].to_numpy(),
                         "bal_cents": keep["bal_c"].astype(np.int64)
                         .to_numpy()})


def _q_volume_shipping(sf: str):
    """TPC-H Q7 shape: cross-border revenue by (supplier nation,
    customer nation, ship year). The fact table shuffles ONCE (lineitem
    |><| orders on orderkey); customer, supplier and nation all attach
    via broadcast lookups, and the year is extracted vectorized from
    the us-int timestamp. Revenue is exact integer 10^-4 currency units
    per the float policy — sums commute bit-exactly with SQL."""
    from ray.data.aggregate import Sum

    from paperchase_crawler_ray.ops.relational import (broadcast_lookup_join,
                                                       cap_join_partitions)
    lo = pd.Timestamp("1996-01-01").value // 1000
    hi = pd.Timestamp("1998-01-01").value // 1000
    li = _rp(sf, "lineitem", columns=["l_orderkey", "l_suppkey",
                                      "l_extendedprice", "l_discount",
                                      "l_shipdate"])

    def window(b: pa.Table) -> pa.Table:
        d = _ts_us_col(b.column("l_shipdate"))
        keep = pc.and_(pc.greater_equal(d, pa.scalar(lo, pa.int64())),
                       pc.less(d, pa.scalar(hi, pa.int64())))
        t = b.filter(keep)
        price = np.rint(t.column("l_extendedprice").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        disc = np.rint(t.column("l_discount").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        yr = pc.cast(pc.year(pc.cast(t.column("l_shipdate"),
                                     pa.timestamp("us"))), pa.int64())
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "l_suppkey": t.column("l_suppkey"),
                         "l_year": yr,
                         "r": pa.array(price * (100 - disc))})

    o = _rp(sf, "orders", columns=["o_orderkey", "o_custkey"])
    j = li.map_batches(window, batch_format="pyarrow") \
        .join(o, join_type="inner",
              num_partitions=cap_join_partitions(8),
              on=("l_orderkey",), right_on=("o_orderkey",))
    c = _rp(sf, "customer", columns=["c_custkey", "c_nationkey"])
    s = _rp(sf, "supplier", columns=["s_suppkey", "s_nationkey"])
    n = _rp(sf, "nation", columns=["n_nationkey", "n_name"])
    j = broadcast_lookup_join(j, "o_custkey", c, "c_custkey",
                              ["c_nationkey"])
    j = broadcast_lookup_join(j, "l_suppkey", s, "s_suppkey",
                              ["s_nationkey"])
    j = broadcast_lookup_join(j, "s_nationkey", n, "n_nationkey",
                              ["n_name"])
    j = j.rename_columns({"n_name": "supp_nation"})
    j = broadcast_lookup_join(j, "c_nationkey", n, "n_nationkey",
                              ["n_name"])
    j = j.rename_columns({"n_name": "cust_nation"})

    def cross_border(b: pa.Table) -> pa.Table:
        t = b.filter(pc.not_equal(b.column("supp_nation"),
                                  b.column("cust_nation")))
        return t.select(["supp_nation", "cust_nation", "l_year", "r"])

    agg = j.map_batches(cross_border, batch_format="pyarrow") \
        .groupby(["supp_nation", "cust_nation", "l_year"]) \
        .aggregate(Sum("r", alias_name="revenue"))
    return agg.map_batches(
        lambda b: b.set_column(b.column_names.index("revenue"), "revenue",
                               pc.cast(b.column("revenue"), pa.int64())),
        batch_format="pyarrow")


def _q_custdist(sf: str):
    """TPC-H Q13 shape: distribution of per-customer order counts with
    a filtered LEFT join (orders not 1-URGENT). The left-join-then-
    count is rewritten as count-then-histogram: orders aggregate to one
    int row per custkey, the histogram aggregate runs over THAT, and
    the customers-with-zero-orders bucket is total_customers minus the
    histogram's mass — no row-level left join anywhere."""
    from ray.data.aggregate import Count

    from paperchase_crawler_ray.ops.relational import semi_join
    o = _rp(sf, "orders", columns=["o_custkey", "o_orderpriority"])
    cust = _rp(sf, "customer", columns=["c_custkey"])
    per_cust = o.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("o_orderpriority"),
                                        pa.scalar("1-URGENT")))
        .select(["o_custkey"]),
        batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Count(alias_name="c_count"))
    # semi-filter against customer keys: an order row with a dangling
    # o_custkey must not inflate a nonzero bucket and shrink the derived
    # zero bucket (the LEFT-JOIN oracle never sees it) — correct under
    # broken FK integrity, not just clean fixtures (ADVICE r3 #4)
    per_cust = semi_join(per_cust, "o_custkey", cust, "c_custkey")
    hist = per_cust.groupby("c_count").aggregate(
        Count(alias_name="custdist"))
    rows = hist.to_pandas()  # one row per distinct order count — tiny
    n_total = cust.count()
    n_zero = n_total - int(rows["custdist"].sum())
    assert n_zero >= 0, "custdist histogram exceeds customer count"
    out = pd.DataFrame({
        "c_count": rows["c_count"].astype(np.int64),
        "custdist": rows["custdist"].astype(np.int64)})
    if n_zero > 0:
        out = pd.concat([out, pd.DataFrame({"c_count": [0],
                                            "custdist": [n_zero]})],
                        ignore_index=True)
    return out


def _q_supplier_parts(sf: str):
    """TPC-H Q16 shape (partsupp stood in by the lineitem part-supplier
    relation): distinct supplier count per (brand, size), excluding one
    brand and suppliers with negative balance. Two-level COUNT(DISTINCT)
    expansion: dedup (partkey, suppkey) pairs block-locally first, then
    attach part attrs by broadcast, dedup (brand, size, suppkey), and
    count — every exchange is pre-shrunk to distinct rows."""
    from ray.data.aggregate import Count

    from paperchase_crawler_ray.ops.relational import (anti_join,
                                                       broadcast_lookup_join,
                                                       distinct_rows)
    li = _rp(sf, "lineitem", columns=["l_partkey", "l_suppkey"])
    # distinct_rows (block pre-shrink + ONE capped key-hash exchange)
    # measured ~2x faster than groupby().count() on this plane
    pairs = distinct_rows(li, ["l_partkey", "l_suppkey"])
    bad = _rp(sf, "supplier", columns=["s_suppkey", "s_acctbal"]) \
        .map_batches(lambda b: b.filter(
            pc.less(b.column("s_acctbal"), pa.scalar(0.0)))
            .select(["s_suppkey"]), batch_format="pyarrow")
    # size-switched: broadcast below the threshold, native left_anti
    # above (the excluded-supplier set is unbounded at corpus scale)
    pairs = anti_join(pairs, "l_suppkey", bad, "s_suppkey")
    p = _rp(sf, "part", columns=["p_partkey", "p_brand", "p_size"])
    typed = broadcast_lookup_join(pairs, "l_partkey", p, "p_partkey",
                                  ["p_brand", "p_size"])
    typed = typed.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("p_brand"),
                                        pa.scalar("Brand#13")))
        .select(["p_brand", "p_size", "l_suppkey"]),
        batch_format="pyarrow")
    tri = distinct_rows(typed, ["p_brand", "p_size", "l_suppkey"])
    agg = tri.groupby(["p_brand", "p_size"]).aggregate(
        Count(alias_name="supplier_cnt"))
    return agg.map_batches(
        lambda b: b.set_column(b.column_names.index("supplier_cnt"),
                               "supplier_cnt",
                               pc.cast(b.column("supplier_cnt"),
                                       pa.int64())),
        batch_format="pyarrow")


def _q_small_qty_rev(sf: str):
    """TPC-H Q17 shape: revenue from lineitems far below their part's
    average quantity. The correlated AVG subquery is rewritten exact:
    l_quantity < 0.2*avg  ==  5*q*n < sum(q) in integers. The brand
    filter pushes down FIRST (broadcast partkey semi-filter), so both
    the per-part aggregate and the join-back touch only the ~1/25 of
    fact rows that can qualify."""
    from ray.data.aggregate import Count, Sum

    from paperchase_crawler_ray.ops.relational import (broadcast_semi_join,
                                                       cap_join_partitions)
    keys = _rp(sf, "part", columns=["p_partkey", "p_brand"]) \
        .map_batches(lambda b: b.filter(
            pc.equal(b.column("p_brand"), pa.scalar("Brand#23")))
            .select(["p_partkey"]), batch_format="pyarrow")
    li = _rp(sf, "lineitem", columns=["l_partkey", "l_quantity",
                                      "l_extendedprice"])
    li = broadcast_semi_join(li, "l_partkey", keys, "p_partkey")

    def to_int(b: pa.Table) -> pa.Table:
        price = np.rint(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"l_partkey": b.column("l_partkey"),
                         "q": pc.cast(b.column("l_quantity"), pa.int64()),
                         "price_c": pa.array(price)})

    # materialized: the per-part aggregate AND the join-back probe
    # both consume it; lazy reuse would re-run the brand-filtered
    # read twice. Brand-filtered, so ~1/25 of the fact table.
    fact = li.map_batches(to_int, batch_format="pyarrow").materialize()
    per_part = fact.groupby("l_partkey").aggregate(
        Sum("q", alias_name="sq"), Count(alias_name="n"))
    j = fact.join(per_part, join_type="inner",
                  num_partitions=cap_join_partitions(8),
                  on=("l_partkey",), right_on=("l_partkey",))

    def small(b: pa.Table) -> pa.Table:
        q = b.column("q").to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        sq = b.column("sq").to_numpy(zero_copy_only=False).astype(np.int64)
        t = b.filter(pa.array(5 * q * n < sq))
        pr = t.column("price_c").to_numpy(zero_copy_only=False)
        return pa.table({"rev": pa.array([int(pr.sum())]),
                         "n_rows": pa.array([t.num_rows])})

    tot_r = tot_n = 0
    for bt in j.map_batches(small, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        t = bt if isinstance(bt, pa.Table) else pa.table(bt)
        tot_r += sum(t.column("rev").to_pylist())
        tot_n += sum(t.column("n_rows").to_pylist())
    return pd.DataFrame({"rev_cents": [tot_r], "n_rows": [tot_n]})


def _q_disjunctive_rev(sf: str):
    """TPC-H Q19 shape: revenue under an OR of (brand, size-range,
    quantity-range) conjunctions. part attaches by broadcast lookup;
    the disjunction is one vectorized numpy mask per batch; revenue in
    exact integer 10^-4 units with two scalar partial sums — the fact
    table never shuffles at all."""
    from paperchase_crawler_ray.ops.relational import broadcast_lookup_join
    li = _rp(sf, "lineitem", columns=["l_partkey", "l_quantity",
                                      "l_extendedprice", "l_discount"])
    p = _rp(sf, "part", columns=["p_partkey", "p_brand", "p_size"])
    typed = broadcast_lookup_join(li, "l_partkey", p, "p_partkey",
                                  ["p_brand", "p_size"])
    CASES = (("Brand#12", 1, 15, 1, 11),
             ("Brand#23", 1, 25, 10, 20),
             ("Brand#3", 1, 35, 20, 30))

    def disj(b: pa.Table) -> pa.Table:
        brand = b.column("p_brand").to_numpy(zero_copy_only=False)
        size = b.column("p_size").to_numpy(zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        mask = np.zeros(b.num_rows, bool)
        for br, s_lo, s_hi, q_lo, q_hi in CASES:
            mask |= ((brand == br) & (size >= s_lo) & (size <= s_hi)
                     & (qty >= q_lo) & (qty <= q_hi))
        t = b.filter(pa.array(mask))
        price = np.rint(t.column("l_extendedprice").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        disc = np.rint(t.column("l_discount").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"rev": pa.array([int((price * (100 - disc)).sum())]),
                         "n": pa.array([t.num_rows])})

    tot_r = tot_n = 0
    for bt in typed.map_batches(disj, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        t = bt if isinstance(bt, pa.Table) else pa.table(bt)
        tot_r += sum(t.column("rev").to_pylist())
        tot_n += sum(t.column("n").to_pylist())
    return pd.DataFrame({"revenue": [tot_r], "n_rows": [tot_n]})


def _q_late_only_supplier(sf: str):
    """TPC-H Q21 shape (receipt/commit dates stood in by ship-vs-order
    lateness): suppliers who were the ONLY late shipper in a
    multi-supplier finished order. The double EXISTS/NOT-EXISTS is
    rewritten as per-order aggregates over the distinct
    (order, supplier, any_late) pair table: n_supp > 1 AND n_late == 1
    AND this pair is the late one. Scale shape (round-5 rewrite): the
    orders side broadcasts below 2M rows (size-switched to the keyed
    join above), the pair-max collapses BLOCK-LOCALLY before ONE
    order-keyed exchange, and the per-order stats + culprit filter run
    inside that exchange's blocks (orders co-located) — one exchange
    where the old plan paid a keyed join plus two Ray aggregates plus
    a semi join (sf1: 49s -> measured below)."""
    from ray.data.aggregate import Count

    from paperchase_crawler_ray.ops.dedup import _hash_shuffle
    from paperchase_crawler_ray.ops.relational import (broadcast_lookup_join,
                                                       cap_join_partitions,
                                                       scrub_empty_blocks)
    LATE_US = 60 * 86_400_000_000  # 60 days in microseconds
    o = _rp(sf, "orders", columns=["o_orderkey", "o_orderstatus",
                                   "o_orderdate"])

    def finished(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("o_orderstatus"), pa.scalar("F")))
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "od_us": _ts_us_col(t.column("o_orderdate"))})

    li = _rp(sf, "lineitem", columns=["l_orderkey", "l_suppkey",
                                      "l_shipdate"])
    fin = o.map_batches(finished, batch_format="pyarrow")
    broadcast_max = int(os.environ.get("PC_Q21_BROADCAST_MAX", 2_000_000))
    if _meta_rows(sf, "orders") <= broadcast_max:
        # dimension-sized orders side: map-side attach, fact never
        # shuffles for the date lookup
        j = broadcast_lookup_join(li, "l_orderkey", fin, "o_orderkey",
                                  ["od_us"])
    else:
        j = li.join(fin, join_type="inner",
                    num_partitions=cap_join_partitions(8),
                    on=("l_orderkey",), right_on=("o_orderkey",))

    def late_flag(b: pa.Table) -> pa.Table:
        late = pc.cast(pc.greater(
            _ts_us_col(b.column("l_shipdate")),
            pc.add(b.column("od_us"), pa.scalar(LATE_US, pa.int64()))),
            pa.int64())
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "l_suppkey": b.column("l_suppkey"),
                         "late": late})

    # block-local pair-max pre-shrink (collapses each block to its
    # distinct (order, supplier, late-max) rows before any exchange)
    def pair_partial(b: pa.Table) -> pa.Table:
        return b.group_by(["l_orderkey", "l_suppkey"]).aggregate(
            [("late", "max")])

    pre = j.map_batches(late_flag, batch_format="pyarrow") \
        .map_batches(pair_partial, batch_format="pyarrow",
                     batch_size=None)

    def resolve_block(b: pa.Table) -> pa.Table:
        """Orders are co-located here: finish the pair max, compute
        per-order (n_supp, n_late) and emit the lone-late culprit
        suppliers — all within the block, no further exchange."""
        t = b.group_by(["l_orderkey", "l_suppkey"]).aggregate(
            [("late_max", "max")])
        if t.num_rows == 0:
            return pa.table({"l_suppkey": pa.array(
                [], b.schema.field("l_suppkey").type)})
        ordk = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        supp = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        late = t.column("late_max_max").to_numpy(zero_copy_only=False)
        order = np.argsort(ordk, kind="stable")
        og, lg = ordk[order], late[order]
        newg = np.ones(len(og), bool)
        newg[1:] = og[1:] != og[:-1]
        starts = np.flatnonzero(newg)
        n_supp = np.diff(np.r_[starts, len(og)])
        n_late = np.add.reduceat(lg, starts)
        ok = np.repeat((n_supp > 1) & (n_late == 1), n_supp) & (lg == 1)
        return pa.table({"l_suppkey": pa.array(supp[order][ok])})

    pre = scrub_empty_blocks(pre)
    with _hash_shuffle(pre):
        culprits = pre.repartition(
            num_blocks=cap_join_partitions(16), keys=["l_orderkey"]) \
            .map_batches(resolve_block, batch_format="pyarrow",
                         batch_size=None).materialize()
    s = _rp(sf, "supplier", columns=["s_suppkey", "s_name"])
    named = broadcast_lookup_join(culprits, "l_suppkey", s, "s_suppkey",
                                  ["s_name"])
    agg = named.groupby("s_name").aggregate(Count(alias_name="numwait"))
    return agg.map_batches(
        lambda b: b.set_column(b.column_names.index("numwait"), "numwait",
                               pc.cast(b.column("numwait"), pa.int64())),
        batch_format="pyarrow")


def _q_dormant_customers(sf: str):
    """TPC-H Q22 shape (phone prefix stood in by a nationkey set, the
    no-orders NOT EXISTS by no-URGENT-orders): per-nation count and
    balance of above-average-balance customers with no urgent orders.
    The global average is exact — two integer scalars (sum, n) from a
    partial-sum pass — and the HAVING compares cross-multiplied ints.
    The anti side auto-switches broadcast vs keyed on size."""
    from ray.data.aggregate import Count, Sum

    from paperchase_crawler_ray.ops.relational import anti_join
    NATIONS = np.array([1, 3, 5, 7, 9, 11, 13], np.int64)
    c = _rp(sf, "customer", columns=["c_custkey", "c_nationkey",
                                     "c_acctbal"])

    def in_scope(b: pa.Table) -> pa.Table:
        nk = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(np.isin(nk, NATIONS)))
        bal = np.rint(t.column("c_acctbal").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"c_custkey": t.column("c_custkey"),
                         "c_nationkey": t.column("c_nationkey"),
                         "bal": pa.array(bal)})

    # materialized: the global-average partials and the HAVING filter
    # both consume it (nation-scoped, so a bounded slice of customer)
    scoped = c.map_batches(in_scope, batch_format="pyarrow").materialize()

    def pos_partial(b: pa.Table) -> pa.Table:
        bal = b.column("bal").to_numpy(zero_copy_only=False)
        pos = bal[bal > 0]
        return pa.table({"s": pa.array([int(pos.sum())]),
                         "n": pa.array([int(pos.size)])})

    tot_s = tot_n = 0
    for bt in scoped.map_batches(pos_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        t = bt if isinstance(bt, pa.Table) else pa.table(bt)
        tot_s += sum(t.column("s").to_pylist())
        tot_n += sum(t.column("n").to_pylist())

    urgent = _rp(sf, "orders", columns=["o_custkey", "o_orderpriority"]) \
        .map_batches(lambda b: b.filter(
            pc.equal(b.column("o_orderpriority"), pa.scalar("1-URGENT")))
            .select(["o_custkey"]), batch_format="pyarrow")
    rich = scoped.map_batches(
        lambda b, s=tot_s, n=tot_n: b.filter(pa.array(
            b.column("bal").to_numpy(zero_copy_only=False) * n > s)),
        batch_format="pyarrow")
    dormant = anti_join(rich, "c_custkey", urgent, "o_custkey")
    agg = dormant.groupby("c_nationkey").aggregate(
        Count(alias_name="numcust"),
        Sum("bal", alias_name="totacctbal_cents"))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_nationkey": b.column("c_nationkey"),
            "numcust": pc.cast(b.column("numcust"), pa.int64()),
            "totacctbal_cents": pc.cast(b.column("totacctbal_cents"),
                                        pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def _q_agg_stats(sf: str):
    """Multi-aggregate groupby (Ray native Sum/Count partial+final)."""
    from ray.data.aggregate import Count, Sum
    li = _rp(sf, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])
    return li.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Count(alias_name="count_order"))


def _q_minmax(sf: str):
    from ray.data.aggregate import Count, Max, Min
    o = _rp(sf, "orders", columns=["o_orderpriority", "o_totalprice"])
    return o.groupby("o_orderpriority").aggregate(
        Min("o_totalprice", alias_name="min_price"),
        Max("o_totalprice", alias_name="max_price"),
        Count(alias_name="c"))


def _q_grouped_median(sf: str):
    """D5 analog: per-group discrete median (quantile_disc semantics —
    sorted[floor((n-1)/2)] == the ceil(p*n)-1 rule at p=0.5),
    deterministic and exactly SQL-matchable. Runs on the stitched-sort
    grouped_quantiles kernel — no per-group pandas map_groups (the
    Ray 2.49 slow/hang shape) anywhere on the path."""
    from paperchase_crawler_ray.ops.relational import grouped_quantiles
    ev = _rp(sf, "events", columns=["event_type", "value"])
    q = grouped_quantiles(ev, "event_type", "value", ps=(0.5,))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b.column("event_type"),
                         "median_value": pc.cast(b.column("p50"),
                                                 pa.float64())})

    return q.map_batches(fin, batch_format="pyarrow")


def _q_word_count(sf: str):
    """Corpus word count: per-batch token explode (Arrow-native regex
    split + flatten, no per-row Python) -> wide groupby-count -> top 50
    by (count desc, word). The classic vocabulary-statistics pipeline
    over the documents table."""
    from paperchase_crawler_ray.ops.relational import global_topk
    docs = _rp(sf, "documents", columns=["text"])

    def explode_tokens(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), pattern=r"\W+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({"word": flat})

    counts = _rename(docs.map_batches(explode_tokens, batch_format="pyarrow")
                     .groupby("word").count(), {"count()": "c"})
    return global_topk(counts, [("c", True), ("word", False)], 50)


def _q_redact(sf: str):
    """PII-style scrub: digits -> '#' (Arrow-native RE2 kernel —
    the same regex engine DuckDB's regexp_replace uses)."""
    docs = _rp(sf, "documents", columns=["doc_id", "text"])

    def scrub(batch: pa.Table) -> pa.Table:
        red = pc.replace_substring_regex(batch.column("text"),
                                         pattern=r"\d", replacement="#")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "redacted": red})

    return docs.map_batches(scrub, batch_format="pyarrow")


def _q_normalize(sf: str):
    """Text canonicalization (the first stage of every LLM-prep chain):
    unicode NFC + lowercase + whitespace collapse + trim, all Arrow
    kernels (same RE2/ICU semantics DuckDB uses)."""
    docs = _rp(sf, "documents", columns=["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        t = pc.utf8_normalize(batch.column("text"), form="NFC")
        t = pc.replace_substring_regex(pc.utf8_lower(t), pattern=r"\s+",
                                       replacement=" ")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "norm_text": pc.utf8_trim_whitespace(t)})

    return docs.map_batches(norm, batch_format="pyarrow")


def _q_sessionize(sf: str):
    """Windowed aggregate: 30-min-gap sessionization per user."""
    from paperchase_crawler_ray.ops.relational import sessionize
    ev = _rp(sf, "events", columns=["user_id", "ts", "event_id"])
    return sessionize(ev, "user_id", "ts", gap_minutes=30.0, tie_col="event_id")


def _q_asof_join(sf: str):
    """As-of join: latest order date at or before each event, per user."""
    from paperchase_crawler_ray.ops.relational import asof_join_with_id
    ev = _rp(sf, "events", columns=["event_id", "user_id", "ts"])
    orders = _rp(sf, "orders", columns=["o_custkey", "o_orderdate"])
    out = asof_join_with_id(ev, orders, "user_id", "o_custkey",
                            "ts", "o_orderdate", "event_id")
    return _ts_us(out.select_columns(["event_id", "matched_ts"]),
                  "matched_ts")


def _q_session_ids(sf: str):
    """Per-event session assignment (the row-level sibling of
    q_sessionize): LAG gives the 30-min-gap session-start flag, a
    grouped prefix sum turns flags into 1-based session ids — two
    stitched sorts, no per-group pandas."""
    from paperchase_crawler_ray.ops.relational import (grouped_lag,
                                                       grouped_prefix_sum)
    ev = _rp(sf, "events", columns=["event_id", "user_id", "ts"])
    lagged = grouped_lag(ev, "user_id", [("ts", False), ("event_id", False)],
                         "ts", out_col="_prev")

    def flag(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False)
        prev = b.column("_prev").to_numpy(zero_copy_only=False)
        gap = (ts - prev) > np.timedelta64(30 * 60 * 1_000_000, "us")
        new_s = (np.isnat(prev) | gap).astype(np.int64)
        return pa.table({"event_id": b.column("event_id"),
                         "user_id": b.column("user_id"),
                         "ts": b.column("ts"),
                         "new_s": pa.array(new_s)})

    flagged = lagged.map_batches(flag, batch_format="pyarrow")
    out = grouped_prefix_sum(flagged, "user_id",
                             [("ts", False), ("event_id", False)], "new_s",
                             out_col="session_id")
    return out.select_columns(["event_id", "user_id", "session_id"])


def _q_sample(sf: str):
    """O4: seeded sample — rows-only check (sampling isn't SQL-stable)."""
    docs = _rp(sf, "documents", columns=["doc_id", "lang"])
    return docs.random_sample(0.2, seed=42)


# -- training-data operators -------------------------------------------------

def _q_text_hash_dedup(sf: str):
    from paperchase_crawler_ray.ops.relational import exact_dedup
    from paperchase_crawler_ray.ops.textstats import fingerprint_batch
    docs = _rp(sf, "documents", columns=["doc_id", "text", "lang", "source"])
    hashed = docs.map_batches(fingerprint_batch, batch_format="pyarrow")
    out = exact_dedup(hashed, ["text_hash"], [("doc_id", False)])
    return out.select_columns(["doc_id", "lang", "source"])


def _q_token_count(sf: str):
    from paperchase_crawler_ray.ops.textstats import token_count
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return token_count(docs).select_columns(["doc_id", "n_tokens"])


def _q_length_buckets(sf: str):
    """Sequence-length bucketing for training batches: each doc goes to
    the smallest power-of-2 token-length bucket (exact integer
    bit-length arithmetic, no float log), then one tiny groupby."""
    from ray.data.aggregate import Count, Sum

    from paperchase_crawler_ray.ops.textstats import token_count
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    counted = token_count(docs).select_columns(["n_tokens"])

    def to_bucket(b: pa.Table) -> pa.Table:
        n = b.column("n_tokens").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nm1 = np.maximum(n - 1, 0)
        # bit_length(n-1): position of highest set bit + 1, vectorized
        bl = np.zeros(len(nm1), np.int64)
        v = nm1.copy()
        while (v > 0).any():
            bl[v > 0] += 1
            v >>= 1
        bucket = np.where(n <= 1, 1, 1 << bl)
        return pa.table({"bucket": pa.array(bucket),
                         "n": pa.array(n)})

    agg = counted.map_batches(to_bucket, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Count(alias_name="n_docs"),
                                     Sum("n", alias_name="total_tokens"))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": b.column("bucket"),
            "n_docs": pc.cast(b.column("n_docs"), pa.int64()),
            "total_tokens": pc.cast(b.column("total_tokens"), pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def _q_quality_stats(sf: str):
    from paperchase_crawler_ray.ops.textstats import quality_stats
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return quality_stats(docs).select_columns(
        ["doc_id", "n_tokens", "n_uniq", "n_stop", "n_punct"])


def _q_minhash_dedup(sf: str):
    from paperchase_crawler_ray.ops.dedup import minhash_lsh_dedup
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.6) \
        .select_columns(["doc_id"])


def _q_simhash_dedup(sf: str):
    from paperchase_crawler_ray.ops.dedup import simhash_dedup
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return simhash_dedup(docs, "doc_id", "text", hamming_max=3) \
        .select_columns(["doc_id"])


def _q_ngram_dedup(sf: str):
    from paperchase_crawler_ray.ops.dedup import ngram_jaccard_dedup
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return ngram_jaccard_dedup(docs, "doc_id", "text", threshold=0.8) \
        .select_columns(["doc_id"])


def _q_embed_neardup(sf: str):
    from paperchase_crawler_ray.ops.dedup import embedding_neardup_dedup
    emb = _rp(sf, "embeddings", columns=["vec_id", "embedding", "label"])
    return embedding_neardup_dedup(emb, threshold=0.35) \
        .select_columns(["vec_id", "label"])


def _q_semdedup(sf: str):
    """SemDeDup semantic dedup: distributed k-means cells + within-cell
    cosine prune, smallest-id representative. Rows-only (Lloyd
    iterations are not SQL-expressible); pytest carries the exact
    driver-numpy twin with shared centroids."""
    from paperchase_crawler_ray.ops.dedup import semdedup
    emb = _rp(sf, "embeddings", columns=["vec_id", "embedding", "label"])
    return semdedup(emb, ncell=32, threshold=0.40) \
        .select_columns(["vec_id", "label"])


def _q_ann_topk(sf: str):
    from paperchase_crawler_ray.ops.similarity import brute_force_topk
    emb = _rp(sf, "embeddings", columns=["vec_id", "embedding"])
    return brute_force_topk(emb, query_ids=[0, 1, 2, 3], k=5)


def _q_ivf_ann(sf: str):
    from paperchase_crawler_ray.ops.similarity import ivf_topk
    emb = _rp(sf, "embeddings", columns=["vec_id", "embedding"])
    return ivf_topk(emb, query_ids=[0, 1, 2, 3], k=5)


def _q_pq_ann(sf: str):
    """PQ-compressed ANN (ADC byte lookups + exact shortlist refine) —
    the memory-scale rung of the ANN ladder; deterministic for a fixed
    layout, rows-only (model/quantizer scoring is non-SQL)."""
    from paperchase_crawler_ray.ops.similarity import pq_topk
    emb = _rp(sf, "embeddings", columns=["vec_id", "embedding"])
    return pq_topk(emb, query_ids=[0, 1, 2, 3], k=5)


def _q_ivfpq_ann(sf: str):
    """IVF-PQ: coarse cell prune + ADC byte scoring + exact shortlist
    refine — the composed production ANN shape (rows-only)."""
    from paperchase_crawler_ray.ops.similarity import ivfpq_topk
    emb = _rp(sf, "embeddings", columns=["vec_id", "embedding"])
    return ivfpq_topk(emb, query_ids=[0, 1, 2, 3], k=5)


def _q_langid(sf: str):
    from paperchase_crawler_ray.ops.textstats import language_id
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return language_id(docs).select_columns(["doc_id", "lang_pred"])


def _q_fingerprint(sf: str):
    from paperchase_crawler_ray.ops.textstats import fingerprints
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return fingerprints(docs).select_columns(["doc_id", "fingerprint", "simhash"])


def _q_quality_score(sf: str):
    from paperchase_crawler_ray.ops.textstats import quality_score
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return quality_score(docs).select_columns(["doc_id", "quality"])


def _q_jaccard_join(sf: str):
    """EXACT similarity self-join via prefix filtering (SSJoin/PPJoin)
    — the provably-complete counterpart of the LSH dedups; integer
    cross-multiplied threshold so SQL compares bit-for-bit."""
    from paperchase_crawler_ray.ops.dedup import jaccard_similarity_join
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return jaccard_similarity_join(docs, "doc_id", "text", 3, 5) \
        .select_columns(["id_a", "id_b", "inter", "uni"])


def _q_dup_ngrams(sf: str):
    """Gopher duplicate-ngram components (exact ints) per document."""
    from paperchase_crawler_ray.ops.textstats import dup_ngram_stats
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return dup_ngram_stats(docs).select_columns(
        ["doc_id", "n_2grams", "dup_2grams", "n_3grams", "dup_3grams"])


def _q_skyline(sf: str):
    """Pareto frontier over parts: maximize size AND retail price —
    two-phase distributed skyline (local prune, then survivor merge)."""
    from paperchase_crawler_ray.ops.relational import skyline
    part = _rp(sf, "part", columns=["p_partkey", "p_size", "p_retailprice"])
    return skyline(part, [("p_size", True), ("p_retailprice", True)])


def _q_pii_stats(sf: str):
    """PII candidate counts per document (corpus-scrub first pass) —
    Arrow RE2 count kernels, zero Python per row."""
    from paperchase_crawler_ray.ops.textstats import pii_stats
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return pii_stats(docs).select_columns(
        ["doc_id", "n_emails", "n_phones", "n_ipv4", "pii_flag"])


def _q_value_stats(sf: str):
    """Ray native Mean/Std/Quantile aggregates (rows-only: float
    aggregation order differs from DuckDB's, per the float policy)."""
    from ray.data.aggregate import Mean, Quantile, Std
    ev = _rp(sf, "events", columns=["event_type", "value"])
    return ev.groupby("event_type").aggregate(
        Mean("value", alias_name="mean_value"),
        Std("value", alias_name="std_value"),
        Quantile("value", q=0.9, alias_name="p90_value"))


def _q_image_augment(sf: str):
    """Multimodal: deterministic hflip/crop/brightness augmentations."""
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.ops.multimodal import image_augment
    rows = make_image_rows(32)
    ds = ray.data.from_arrow(rows.select(["image_id", "bytes"]))
    return image_augment(ds, batch_size=8).select_columns(
        ["image_id", "aug", "w", "h", "phash"])


def _q_image_features(sf: str):
    """Multimodal: image_caption fixture rows -> decoded feature columns."""
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.ops.multimodal import image_features
    rows = make_image_rows(64)
    ds = ray.data.from_arrow(rows.select(["image_id", "bytes"]))
    return image_features(ds, batch_size=16).select_columns(
        ["image_id", "w", "h", "fmt", "phash"])


def _q_image_patches(sf: str):
    """Multimodal: ViT-style patch extraction (lossless tiling of real
    decoded pixels; rows-only — binary payload op)."""
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.ops.multimodal import image_patchify
    rows = make_image_rows(32)
    ds = ray.data.from_arrow(rows.select(["image_id", "bytes"]))
    out = image_patchify(ds, patch=8, batch_size=8)
    return out.select_columns(["image_id", "patch_id", "py", "px"])


def _q_image_preprocess(sf: str):
    """Multimodal: vision-training input transform (bilinear short-side
    resize + center crop) with exact-int channel sums (rows-only —
    binary payload op; pytest golden covers the resize kernel)."""
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.ops.multimodal import image_preprocess
    rows = make_image_rows(48)
    ds = ray.data.from_arrow(rows.select(["image_id", "bytes"]))
    return image_preprocess(ds, size=24, batch_size=8).select_columns(
        ["image_id", "w", "h", "sum_r", "sum_g", "sum_b", "phash"])


def _q_caption_align(sf: str):
    """Multimodal: CLIP-shaped two-tower caption<->image alignment
    (actor-pool; real decoded pixels; int64 basis-point scores —
    deterministic, rows-only: model scoring is non-SQL-expressible)."""
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.ops.multimodal import caption_alignment
    rows = make_image_rows(64)
    ds = ray.data.from_arrow(rows.select(["image_id", "bytes", "caption"]))
    return caption_alignment(ds, batch_size=16).select_columns(
        ["image_id", "align_bp"])


def _q_image_transcode(sf: str):
    """Multimodal: storage-ladder transcode (any fmt -> jpeg at q85/q98)
    with exact byte/PSNR accounting columns (centi-dB int64)."""
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.ops.multimodal import image_transcode
    rows = make_image_rows(32)
    ds = ray.data.from_arrow(rows.select(["image_id", "bytes"]))
    return image_transcode(ds, batch_size=8).select_columns(
        ["image_id", "fmt_in", "fmt_out", "quality",
         "nbytes_in", "nbytes_out", "psnr_cdb", "phash"])


def _q_running_sum(sf: str):
    """Per-user running total (SUM OVER PARTITION BY ... ORDER BY) of
    floor(value) — the grouped distributed scan with sum carries."""
    from paperchase_crawler_ray.ops.relational import grouped_prefix_sum
    ev = _rp(sf, "events", columns=["event_id", "user_id", "ts", "value"])

    def fl(b: pa.Table) -> pa.Table:
        return pa.table({"event_id": b.column("event_id"),
                         "user_id": b.column("user_id"),
                         "ts": b.column("ts"),
                         "fval": pc.cast(pc.floor(b.column("value")),
                                         pa.int64())})

    prepped = ev.map_batches(fl, batch_format="pyarrow")
    out = grouped_prefix_sum(prepped, "user_id",
                             [("ts", False), ("event_id", False)], "fval",
                             out_col="running")
    return out.select_columns(["event_id", "user_id", "running"])


def _q_moving_sum(sf: str):
    """Sliding-window SUM (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) of
    floor(value) per user — cumsum-difference blocks + tail-window
    carries over one global sort."""
    from paperchase_crawler_ray.ops.relational import grouped_moving_sum
    ev = _rp(sf, "events", columns=["event_id", "user_id", "ts", "value"])

    def fl(b: pa.Table) -> pa.Table:
        return pa.table({"event_id": b.column("event_id"),
                         "user_id": b.column("user_id"),
                         "ts": b.column("ts"),
                         "fval": pc.cast(pc.floor(b.column("value")),
                                         pa.int64())})

    prepped = ev.map_batches(fl, batch_format="pyarrow")
    out = grouped_moving_sum(prepped, "user_id",
                             [("ts", False), ("event_id", False)], "fval",
                             window=4, out_col="win_sum")
    return out.select_columns(["event_id", "user_id", "win_sum"])


def _q_ntile(sf: str):
    """NTILE(4) quartile bucket per customer's orders by price — the
    grouped rank stitched sort + a broadcast group-size map."""
    from paperchase_crawler_ray.ops.relational import grouped_ntile
    o = _rp(sf, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    out = grouped_ntile(o, "o_custkey",
                        [("o_totalprice", True), ("o_orderkey", False)], 4)
    return out.select_columns(["o_orderkey", "o_custkey", "tile"])


def _q_first_last(sf: str):
    """FIRST_VALUE / LAST_VALUE per group, as two block-combiner winner
    reductions (exact_dedup both directions) + one small keyed join."""
    from paperchase_crawler_ray.ops.relational import (cap_join_partitions,
                                                       exact_dedup)
    ev = _rp(sf, "events", columns=["event_id", "user_id", "ts"])
    first = exact_dedup(ev, ["user_id"], [("ts", False), ("event_id", False)])
    last = exact_dedup(ev, ["user_id"], [("ts", True), ("event_id", True)])

    def tag(name):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({"user_id": b.column("user_id"),
                             name: b.column("event_id")})
        return f

    f = first.map_batches(tag("first_event"), batch_format="pyarrow")
    l_ = last.map_batches(tag("last_event_r"), batch_format="pyarrow")
    j = f.join(l_, join_type="inner",
               num_partitions=cap_join_partitions(4),
               on=("user_id",))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b.column("user_id"),
                         "first_event": b.column("first_event"),
                         "last_event": b.column("last_event_r")})

    return j.map_batches(fin, batch_format="pyarrow")


def _q_string_agg(sf: str):
    """LISTAGG: per-user comma-joined event types in (ts, event_id)
    order — one global sort collapses blocks to per-group partials, a
    keyed repartition stitches them in block order."""
    from paperchase_crawler_ray.ops.relational import grouped_string_agg
    ev = _rp(sf, "events", columns=["event_id", "user_id", "ts",
                                    "event_type"])
    return grouped_string_agg(ev, "user_id",
                              [("ts", False), ("event_id", False)],
                              "event_type", sep=",", out_col="types")


def _q_dense_rank(sf: str):
    """DENSE_RANK over a low-cardinality order column (ties are the
    point) — stitched sort with a continued-value boundary carry."""
    from paperchase_crawler_ray.ops.relational import grouped_dense_rank
    ev = _rp(sf, "events", columns=["event_id", "user_id", "event_type"])
    out = grouped_dense_rank(ev, "user_id", "event_type", out_col="drnk")
    return out.select_columns(["event_id", "user_id", "drnk"])


def _q_pct_rank(sf: str):
    """PERCENT_RANK + CUME_DIST per event within user: stitched
    row-number + a broadcast group-size lookup; the float divisions are
    row-local on int64 inputs, so they are bit-identical to the SQL
    engine's (driver float policy: no cross-row float accumulation)."""
    from ray.data.aggregate import Count

    from paperchase_crawler_ray.ops.relational import (broadcast_lookup_join,
                                                       grouped_rank)
    ev = _rp(sf, "events", columns=["event_id", "user_id", "ts"])
    ranked = grouped_rank(ev, "user_id",
                          [("ts", False), ("event_id", False)],
                          out_col="_rnk")
    sizes = ev.groupby("user_id").aggregate(Count(alias_name="_gn"))
    withn = broadcast_lookup_join(ranked, "user_id", sizes, "user_id",
                                  ["_gn"])

    def fin(b: pa.Table) -> pa.Table:
        r = b.column("_rnk").to_numpy(zero_copy_only=False).astype(np.float64)
        n = b.column("_gn").to_numpy(zero_copy_only=False).astype(np.float64)
        pct = np.where(n > 1, (r - 1) / np.maximum(n - 1, 1), 0.0)
        cd = r / n
        return pa.table({"event_id": b.column("event_id"),
                         "user_id": b.column("user_id"),
                         "pct": pa.array(pct, pa.float64()),
                         "cd": pa.array(cd, pa.float64())})

    return withn.map_batches(fin, batch_format="pyarrow")


def _q_filtered_revenue(sf: str):
    """TPC-H Q6 shape: the canonical pruned-scan aggregate. Column-
    pruned read, one vectorized mask, two integer partial sums — the
    whole query is a single streaming map; nothing shuffles. The
    discount predicate compares exact integer cents on both sides."""
    lo = pd.Timestamp("1996-01-01").value // 1000
    hi = pd.Timestamp("1997-01-01").value // 1000
    li = _rp(sf, "lineitem", columns=["l_shipdate", "l_discount",
                                      "l_quantity", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        d = _ts_us_col(b.column("l_shipdate")).to_numpy(
            zero_copy_only=False)
        disc = np.rint(b.column("l_discount").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        keep = ((d >= lo) & (d < hi) & (disc >= 5) & (disc <= 7)
                & (qty < 24))
        price = np.rint(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[keep] * 100.0).astype(np.int64)
        return pa.table({"rev": pa.array([int((price * disc[keep]).sum())]),
                         "n": pa.array([int(keep.sum())])})

    tot_r = tot_n = 0
    for bt in li.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        t = bt if isinstance(bt, pa.Table) else pa.table(bt)
        tot_r += sum(t.column("rev").to_pylist())
        tot_n += sum(t.column("n").to_pylist())
    return pd.DataFrame({"revenue": [tot_r], "n_rows": [tot_n]})


def _q_top_supplier(sf: str):
    """TPC-H Q15 shape: supplier(s) whose windowed revenue equals the
    global max. Per-supplier integer revenue aggregate (one row per
    supplier crosses the shuffle), the scalar max reduces over THAT,
    and the name attaches by broadcast — ties kept, like the SQL."""
    from ray.data.aggregate import Sum

    from paperchase_crawler_ray.ops.relational import broadcast_lookup_join
    lo = pd.Timestamp("1996-01-01").value // 1000
    hi = pd.Timestamp("1996-04-01").value // 1000
    li = _rp(sf, "lineitem", columns=["l_suppkey", "l_shipdate",
                                      "l_extendedprice", "l_discount"])

    def rev(b: pa.Table) -> pa.Table:
        d = _ts_us_col(b.column("l_shipdate")).to_numpy(
            zero_copy_only=False)
        keep = (d >= lo) & (d < hi)
        t = b.filter(pa.array(keep))
        price = np.rint(t.column("l_extendedprice").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        disc = np.rint(t.column("l_discount").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"l_suppkey": t.column("l_suppkey"),
                         "r": pa.array(price * (100 - disc))})

    # materialized: both the scalar max and the filter consume it, and
    # lazy reuse would run the fact aggregate twice
    per_supp = li.map_batches(rev, batch_format="pyarrow") \
        .groupby("l_suppkey").aggregate(Sum("r", alias_name="total_rev")) \
        .materialize()
    best = per_supp.max("total_rev") if per_supp.count() else None
    if best is None:  # empty window: the SQL twin returns zero rows
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                             "s_name": pd.Series([], dtype=object),
                             "total_rev": pd.Series([], dtype=np.int64)})
    top = per_supp.map_batches(
        lambda b: b.filter(pc.equal(b.column("total_rev"),
                                    pa.scalar(int(best)))),
        batch_format="pyarrow")
    named = broadcast_lookup_join(
        top, "l_suppkey",
        _rp(sf, "supplier", columns=["s_suppkey", "s_name"]),
        "s_suppkey", ["s_name"])

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"s_suppkey": b.column("l_suppkey"),
                         "s_name": b.column("s_name"),
                         "total_rev": pc.cast(b.column("total_rev"),
                                              pa.int64())})

    return named.map_batches(fin, batch_format="pyarrow")


def _q_market_share(sf: str):
    """TPC-H Q8 shape: one supplier-nation's share of ASIA-customer
    revenue per order year. Fact rows shuffle once (lineitem |><|
    date-cut orders); customer/nation/region ride broadcast lookups
    (the inner ASIA lookup doubles as the region filter) and the share
    is reported as two exact integer columns per year."""
    from ray.data.aggregate import Sum

    from paperchase_crawler_ray.ops.relational import (broadcast_lookup_join,
                                                       cap_join_partitions)
    r = _rp(sf, "region", columns=["r_regionkey", "r_name"])
    n = _rp(sf, "nation", columns=["n_nationkey", "n_regionkey"])
    asia_keys = {row["r_regionkey"] for row in r.take_all()
                 if row["r_name"] == "ASIA"}
    asia_n = n.map_batches(
        lambda b: b.filter(pa.array(np.isin(
            b.column("n_regionkey").to_numpy(zero_copy_only=False),
            np.array(sorted(asia_keys), np.int64)))),
        batch_format="pyarrow")
    lo = pd.Timestamp("1996-01-01").value // 1000
    hi = pd.Timestamp("1998-01-01").value // 1000
    o = _rp(sf, "orders", columns=["o_orderkey", "o_custkey",
                                   "o_orderdate"])

    def date_cut(b: pa.Table) -> pa.Table:
        d = _ts_us_col(b.column("o_orderdate"))
        keep = pc.and_(pc.greater_equal(d, pa.scalar(lo, pa.int64())),
                       pc.less(d, pa.scalar(hi, pa.int64())))
        t = b.filter(keep)
        yr = pc.cast(pc.year(pc.cast(t.column("o_orderdate"),
                                     pa.timestamp("us"))), pa.int64())
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "o_custkey": t.column("o_custkey"),
                         "o_year": yr})

    li = _rp(sf, "lineitem", columns=["l_orderkey", "l_suppkey",
                                      "l_extendedprice", "l_discount"])

    def vol(b: pa.Table) -> pa.Table:
        price = np.rint(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        disc = np.rint(b.column("l_discount").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "l_suppkey": b.column("l_suppkey"),
                         "v": pa.array(price * (100 - disc))})

    j = li.map_batches(vol, batch_format="pyarrow") \
        .join(o.map_batches(date_cut, batch_format="pyarrow"),
              join_type="inner", num_partitions=cap_join_partitions(8),
              on=("l_orderkey",), right_on=("o_orderkey",))
    c = _rp(sf, "customer", columns=["c_custkey", "c_nationkey"])
    s = _rp(sf, "supplier", columns=["s_suppkey", "s_nationkey"])
    j = broadcast_lookup_join(j, "o_custkey", c, "c_custkey",
                              ["c_nationkey"])
    # inner lookup against ASIA nations == the region filter
    j = broadcast_lookup_join(j, "c_nationkey", asia_n, "n_nationkey",
                              ["n_regionkey"])
    j = broadcast_lookup_join(j, "l_suppkey", s, "s_suppkey",
                              ["s_nationkey"])
    TARGET = 5   # the measured supplier nation

    def split(b: pa.Table) -> pa.Table:
        v = b.column("v").to_numpy(zero_copy_only=False)
        hit = b.column("s_nationkey").to_numpy(
            zero_copy_only=False) == TARGET
        return pa.table({"o_year": b.column("o_year"),
                         "nv": pa.array(np.where(hit, v, 0)),
                         "tv": pa.array(v)})

    agg = j.map_batches(split, batch_format="pyarrow") \
        .groupby("o_year").aggregate(Sum("nv", alias_name="nation_vol"),
                                     Sum("tv", alias_name="total_vol"))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"o_year": b.column("o_year"),
                         "nation_vol": pc.cast(b.column("nation_vol"),
                                               pa.int64()),
                         "total_vol": pc.cast(b.column("total_vol"),
                                              pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def _q_product_profit(sf: str):
    """TPC-H Q9 shape: profit by supplier nation and order year for a
    part-name family (p_retailprice stands in for the partsupp cost).
    Profit stays in exact 10^-4 units: price*(100-disc) minus
    cost_cents*qty*100. part/supplier/nation attach broadcast; the one
    keyed exchange is lineitem |><| orders."""
    from ray.data.aggregate import Sum

    from paperchase_crawler_ray.ops.relational import (broadcast_lookup_join,
                                                       cap_join_partitions)
    p = _rp(sf, "part", columns=["p_partkey", "p_name", "p_retailprice"])

    def gears(b: pa.Table) -> pa.Table:
        t = b.filter(pc.match_substring(b.column("p_name"), "gear"))
        cost = np.rint(t.column("p_retailprice").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"p_partkey": t.column("p_partkey"),
                         "cost_c": pa.array(cost)})

    li = _rp(sf, "lineitem", columns=["l_orderkey", "l_partkey",
                                      "l_suppkey", "l_quantity",
                                      "l_extendedprice", "l_discount"])
    typed = broadcast_lookup_join(li, "l_partkey",
                                  p.map_batches(gears,
                                                batch_format="pyarrow"),
                                  "p_partkey", ["cost_c"])

    def profit(b: pa.Table) -> pa.Table:
        price = np.rint(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        disc = np.rint(b.column("l_discount").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        qty = pc.cast(b.column("l_quantity"), pa.int64()).to_numpy(
            zero_copy_only=False)
        cost = b.column("cost_c").to_numpy(zero_copy_only=False)
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "l_suppkey": b.column("l_suppkey"),
                         "pf": pa.array(price * (100 - disc)
                                        - cost * qty * 100)})

    o = _rp(sf, "orders", columns=["o_orderkey", "o_orderdate"])

    def year(b: pa.Table) -> pa.Table:
        yr = pc.cast(pc.year(pc.cast(b.column("o_orderdate"),
                                     pa.timestamp("us"))), pa.int64())
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "o_year": yr})

    j = typed.map_batches(profit, batch_format="pyarrow") \
        .join(o.map_batches(year, batch_format="pyarrow"),
              join_type="inner", num_partitions=cap_join_partitions(8),
              on=("l_orderkey",), right_on=("o_orderkey",))
    s = _rp(sf, "supplier", columns=["s_suppkey", "s_nationkey"])
    n = _rp(sf, "nation", columns=["n_nationkey", "n_name"])
    j = broadcast_lookup_join(j, "l_suppkey", s, "s_suppkey",
                              ["s_nationkey"])
    j = broadcast_lookup_join(j, "s_nationkey", n, "n_nationkey",
                              ["n_name"])
    agg = j.groupby(["n_name", "o_year"]).aggregate(
        Sum("pf", alias_name="profit"))
    return agg.map_batches(
        lambda b: b.set_column(b.column_names.index("profit"), "profit",
                               pc.cast(b.column("profit"), pa.int64())),
        batch_format="pyarrow")


def _q_rolling_distinct(sf: str):
    """Rolling 7-day COUNT(DISTINCT user) per active day: the window
    join is rewritten as a 7-offset explode of the distinct (day, user)
    pairs + the standard two-level distinct — no range join, and the
    active-day spine applies as a broadcast semi filter."""
    from ray.data.aggregate import Count

    from paperchase_crawler_ray.ops.relational import broadcast_semi_join
    ev = _rp(sf, "events", columns=["ts", "user_id"])

    def to_day(b: pa.Table) -> pa.Table:
        us = _ts_us_col(b.column("ts")).to_numpy(zero_copy_only=False)
        return pa.table({"d": pa.array((us // 86_400_000_000)
                                       .astype(np.int32)),
                         "user_id": b.column("user_id")})

    du = ev.map_batches(to_day, batch_format="pyarrow") \
        .groupby(["d", "user_id"]).count() \
        .select_columns(["d", "user_id"]).materialize()
    days = du.groupby("d").count().select_columns(["d"])  # active days

    def explode(b: pa.Table) -> pa.Table:
        d = b.column("d").to_numpy(zero_copy_only=False)
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        td = (d[None, :] + np.arange(7, dtype=d.dtype)[:, None]).ravel()
        return pa.table({"td": pa.array(td),
                         "user_id": pa.array(np.tile(u, 7))})

    ex = broadcast_semi_join(du.map_batches(explode, batch_format="pyarrow"),
                             "td", days, "d")
    pairs2 = ex.groupby(["td", "user_id"]).count() \
        .select_columns(["td", "user_id"])
    out = pairs2.groupby("td").aggregate(Count(alias_name="n_users"))

    def fin(b: pa.Table) -> pa.Table:
        us = pc.multiply(pc.cast(b.column("td"), pa.int64()),
                         pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({
            "day": pc.cast(us, pa.timestamp("us")),
            "n_users": pc.cast(b.column("n_users"), pa.int64())})

    return out.map_batches(fin, batch_format="pyarrow")


def _q_cooccurrence(sf: str):
    """Event-type co-occurrence (frequent pairs): users that exhibit
    BOTH types, for every unordered type pair. Bounded-cardinality
    rewrite: each type gets a bit, a per-user bitmask falls out of one
    int Sum over the distinct (user, type) pairs (distinct rows make
    Sum == OR), and pair counts are k^2/2 vectorized bit tests per
    block with tiny integer partials — no self-join, nothing keyed by
    user ever shuffles twice. Assumes type cardinality fits a 63-bit
    mask (asserted); the general shape would keyed-repartition by user."""
    from ray.data.aggregate import Sum
    ev = _rp(sf, "events", columns=["user_id", "event_type"])
    ut = ev.groupby(["user_id", "event_type"]).count() \
        .select_columns(["user_id", "event_type"]).materialize()
    types = sorted(r["event_type"]
                   for r in ut.groupby("event_type").count()
                   .select_columns(["event_type"]).take_all())
    assert len(types) <= 63, "bitmask path needs <= 63 distinct types"
    idx = {t: i for i, t in enumerate(types)}
    idx_ref = ray.put(idx)

    def to_bits(b: pa.Table) -> pa.Table:
        m = ray.get(idx_ref)
        bits = np.array([1 << m[t] for t in
                         b.column("event_type").to_pylist()], np.int64)
        return pa.table({"user_id": b.column("user_id"),
                         "bit": pa.array(bits)})

    masks = ut.map_batches(to_bits, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Sum("bit", alias_name="mask"))
    k = len(types)

    def pair_partials(b: pa.Table) -> pa.Table:
        m = b.column("mask").to_numpy(zero_copy_only=False).astype(np.int64)
        ia, ib, cnt = [], [], []
        for i in range(k):
            for j in range(i + 1, k):
                both = int((((m >> i) & 1) & ((m >> j) & 1)).sum())
                if both:
                    ia.append(i); ib.append(j); cnt.append(both)
        return pa.table({"ia": pa.array(ia, pa.int64()),
                         "ib": pa.array(ib, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    agg = masks.map_batches(pair_partials, batch_format="pyarrow") \
        .groupby(["ia", "ib"]).aggregate(Sum("n", alias_name="n_users"))
    rows = agg.to_pandas()  # <= k^2/2 rows
    return pd.DataFrame({
        "type_a": [types[int(i)] for i in rows["ia"]],
        "type_b": [types[int(i)] for i in rows["ib"]],
        "n_users": rows["n_users"].astype(np.int64).to_numpy()})


def _q_rank_ties(sf: str):
    """SQL RANK() (ties share the min row number, gaps follow) per
    order over lineitem quantities — the stitched-sort kernel carries
    both the spanning group's row count and the rank where a
    block-spanning tie run started."""
    from paperchase_crawler_ray.ops.relational import grouped_rank_ties
    li = _rp(sf, "lineitem", columns=["l_orderkey", "l_linenumber",
                                      "l_quantity"])
    out = grouped_rank_ties(li, "l_orderkey", "l_quantity",
                            out_col="qty_rank")
    return out.select_columns(["l_orderkey", "l_linenumber", "qty_rank"])


def _q_approx_quantiles(sf: str):
    """Histogram quantile sketch (rows-only: the within-one-bin
    accuracy gate vs quantile_disc lives in pytest; the histogramming
    itself is not SQL-expressible bit-exactly)."""
    from paperchase_crawler_ray.ops.sketch import approx_quantiles
    ev = _rp(sf, "events", columns=["value"])
    r = approx_quantiles(ev, "value", ps=(0.1, 0.5, 0.9))
    q = r["quantiles"]
    return pd.DataFrame({"p10": [q[0.1]], "p50": [q[0.5]],
                         "p90": [q[0.9]], "n": [r["count"]],
                         "bin_width": [r["bin_width"]]})


def _q_grouped_mad(sf: str):
    """Per-group median absolute deviation: grouped quantile_disc
    median (stitched sort), broadcast the tiny per-group medians, one
    row-local |v - med| derivation, then the SAME grouped-median kernel
    over the derived column — two sorts, zero driver state beyond the
    group map."""
    from paperchase_crawler_ray.ops.relational import (broadcast_lookup_join,
                                                       grouped_quantiles)
    ev = _rp(sf, "events", columns=["event_type", "value"])
    med = grouped_quantiles(ev, "event_type", "value", ps=(0.5,))
    med = med.map_batches(
        lambda b: pa.table({"event_type": b.column("event_type"),
                            "med": pc.cast(b.column("p50"), pa.float64())}),
        batch_format="pyarrow")
    withmed = broadcast_lookup_join(ev, "event_type", med, "event_type",
                                    ["med"])

    def absdev(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b.column("event_type"),
                         "dev": pc.abs(pc.subtract(
                             b.column("value"), b.column("med")))})

    dev = withmed.map_batches(absdev, batch_format="pyarrow")
    out = grouped_quantiles(dev, "event_type", "dev", ps=(0.5,))
    return out.map_batches(
        lambda b: pa.table({"event_type": b.column("event_type"),
                            "mad": pc.cast(b.column("p50"), pa.float64())}),
        batch_format="pyarrow")


def _q_grouped_pct_cont(sf: str):
    """Per-group interpolated percentiles (quantile_cont) on the
    stitched-sort bracketing-rank kernel."""
    from paperchase_crawler_ray.ops.relational import grouped_quantiles_cont
    ev = _rp(sf, "events", columns=["event_type", "value"])
    return grouped_quantiles_cont(ev, "event_type", "value",
                                  ps=(0.25, 0.5, 0.9))


def _q_mad(sf: str):
    """Median absolute deviation, exact: quantile_disc median via the
    shared radix descent, then a second descent over the derived
    |value - med| column. The derivation is one row-local float op
    (bit-identical to SQL's abs/subtract), so the float policy holds —
    no cross-row float accumulation anywhere."""
    from paperchase_crawler_ray.ops.relational import (count_non_null,
                                                       multi_kth_smallest)
    ev = _rp(sf, "events", columns=["value"])
    nn = count_non_null(ev, "value")
    if nn == 0:
        return pd.DataFrame({"med": [None], "mad": [None]})
    k = (nn - 1) // 2
    med = float(multi_kth_smallest(ev, "value", [k])[0])

    def absdev(b: pa.Table) -> pa.Table:
        return pa.table({"dev": pc.abs(pc.subtract(
            b.column("value"), pa.scalar(med, pa.float64())))})

    dev = ev.map_batches(absdev, batch_format="pyarrow")
    mad = float(multi_kth_smallest(dev, "dev", [k])[0])
    return pd.DataFrame({"med": [med], "mad": [mad]})


def _q_intersect(sf: str):
    """INTERSECT: distinct event users that are also customer keys —
    exact_dedup + the size-switched semi join."""
    from paperchase_crawler_ray.ops.relational import exact_dedup, semi_join
    ev = _rp(sf, "events", columns=["user_id"])
    cust = _rp(sf, "customer", columns=["c_custkey"])
    users = exact_dedup(ev, ["user_id"], [("user_id", False)])
    return _rename(semi_join(users, "user_id", cust, "c_custkey"),
                   {"user_id": "k"})


def _q_except(sf: str):
    """EXCEPT: customer keys with NO event activity — exact_dedup + the
    size-switched anti join (direction chosen so the result is
    non-empty: every fixture event user IS a customer key)."""
    from paperchase_crawler_ray.ops.relational import anti_join, exact_dedup
    ev = _rp(sf, "events", columns=["user_id"])
    cust = _rp(sf, "customer", columns=["c_custkey"])
    keys = exact_dedup(cust, ["c_custkey"], [("c_custkey", False)])
    return _rename(anti_join(keys, "c_custkey", ev, "user_id"),
                   {"c_custkey": "k"})


def _q_mode(sf: str):
    """Per-group MODE (most frequent event_type, lexicographic
    tie-break): hash-aggregate counts, then the dedup winner reduction
    over the (group, category) result — never over the raw rows."""
    from ray.data.aggregate import Count

    from paperchase_crawler_ray.ops.relational import exact_dedup
    ev = _rp(sf, "events", columns=["user_id", "event_type"])
    counts = ev.groupby(["user_id", "event_type"]).aggregate(
        Count(alias_name="_n"))
    win = exact_dedup(counts, ["user_id"],
                      [("_n", True), ("event_type", False)])
    return _rename(win.select_columns(["user_id", "event_type"]),
                   {"event_type": "mode_type"})


def _q_cube(sf: str):
    """GROUP BY CUBE over (returnflag, linestatus): all four grouping
    sets from one finest-level pass."""
    from paperchase_crawler_ray.ops.relational import cube_agg
    li = _rp(sf, "lineitem",
             columns=["l_returnflag", "l_linestatus", "l_quantity"])
    return cube_agg(li, ["l_returnflag", "l_linestatus"], "l_quantity",
                    sum_name="sum_qty", count_name="n_rows")


def _q_grouping_sets(sf: str):
    """GROUP BY GROUPING SETS ((flag), (status), (flag, status)) —
    arbitrary-set OLAP aggregate from one finest-level pass (no grand
    total, distinguishing it from CUBE)."""
    from paperchase_crawler_ray.ops.relational import grouping_sets_agg
    li = _rp(sf, "lineitem",
             columns=["l_returnflag", "l_linestatus", "l_quantity"])
    return grouping_sets_agg(
        li, ["l_returnflag", "l_linestatus"],
        [["l_returnflag"], ["l_linestatus"],
         ["l_returnflag", "l_linestatus"]],
        "l_quantity", sum_name="sum_qty", count_name="n_rows")


def _q_funnel(sf: str):
    """Conversion-funnel analysis (view -> click -> purchase, strictly
    ordered first timestamps): one hash aggregate to per-(user, step)
    min ts, then a keyed whole-block pivot and three scalar flag sums —
    per-user row data never reaches the driver."""
    from ray.data.aggregate import Min

    from paperchase_crawler_ray.ops.dedup import _hash_shuffle
    from paperchase_crawler_ray.ops.relational import cap_join_partitions
    steps = ("view", "click", "purchase")
    ev = _rp(sf, "events", columns=["user_id", "event_type", "ts"])

    def keep_steps(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("event_type"),
                                 value_set=pa.array(steps)))

    mins = ev.map_batches(keep_steps, batch_format="pyarrow") \
        .groupby(["user_id", "event_type"]).aggregate(
            Min("ts", alias_name="t0"))

    def flags(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        piv = df.pivot_table(index="user_id", columns="event_type",
                             values="t0", aggfunc="min")
        for s in steps:
            if s not in piv.columns:
                piv[s] = pd.NaT
        s1 = piv["view"].notna()
        s2 = s1 & (piv["click"] > piv["view"])
        s3 = s2 & (piv["purchase"] > piv["click"])
        return pa.table({"f1": pa.array(s1.to_numpy().astype(np.int64)),
                         "f2": pa.array(s2.to_numpy().astype(np.int64)),
                         "f3": pa.array(s3.to_numpy().astype(np.int64))})

    with _hash_shuffle(mins):
        co = mins.repartition(num_blocks=cap_join_partitions(8),
                              keys=["user_id"])
        per_user = co.map_batches(flags, batch_format="pyarrow",
                                  batch_size=None).materialize()
    return pd.DataFrame({
        "n_view": np.array([per_user.sum("f1") or 0], np.int64),
        "n_view_click": np.array([per_user.sum("f2") or 0], np.int64),
        "n_full": np.array([per_user.sum("f3") or 0], np.int64)})


def _q_inverted_index(sf: str):
    """Inverted index build (token -> sorted posting list of doc ids):
    Arrow-native token explode, pair dedup, then the string-agg stitch.
    The IR-shaped sibling of q_word_count."""
    from paperchase_crawler_ray.ops.relational import (exact_dedup,
                                                       grouped_string_agg)
    docs = _rp(sf, "documents", columns=["doc_id", "text"])

    def explode_pairs(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), pattern=r"\W+")
        n_per = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc = np.repeat(batch.column("doc_id").to_numpy(
            zero_copy_only=False), n_per)
        flat = pc.list_flatten(toks).combine_chunks()
        keep = pc.not_equal(flat, "")
        return pa.table({"word": flat.filter(keep),
                         "doc_id": pa.array(doc).filter(keep)})

    pairs = docs.map_batches(explode_pairs, batch_format="pyarrow")
    distinct = exact_dedup(pairs, ["word", "doc_id"], [("doc_id", False)])

    def as_str(b: pa.Table) -> pa.Table:
        return pa.table({"word": b.column("word"),
                         "doc_id": b.column("doc_id"),
                         "doc_str": pc.cast(b.column("doc_id"),
                                            pa.string())})

    prepped = distinct.map_batches(as_str, batch_format="pyarrow")
    return grouped_string_agg(prepped, "word", [("doc_id", False)],
                              "doc_str", sep=",", out_col="postings")


def _q_salted_join(sf: str):
    """The q_equi_join chain with the hot-key-salted exchange on the
    orders-customer hop (left salted round-robin, right replicated per
    salt) — result identical to the unsalted join by construction."""
    from paperchase_crawler_ray.ops.relational import salted_equi_join
    o = _rp(sf, "orders", columns=["o_orderkey", "o_custkey"])
    c = _rp(sf, "customer", columns=["c_custkey", "c_nationkey"])
    n = _rp(sf, "nation", columns=["n_nationkey", "n_name"])
    j = salted_equi_join(o, "o_custkey", c, "c_custkey", salts=8)
    j2 = j.join(n, join_type="inner", num_partitions=8,
                on=("c_nationkey",), right_on=("n_nationkey",))
    return _rename(j2.groupby("n_name").count(), {"count()": "n_orders"})


def _q_repetition(sf: str):
    """Gopher-style repetition filter components (integer counts +
    cross-multiplied threshold flag — no float division)."""
    from paperchase_crawler_ray.ops.textstats import repetition_stats
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return repetition_stats(docs).select_columns(
        ["doc_id", "n_tokens", "n_distinct", "top_count", "kept"])


def _q_mixture(sf: str):
    """Training-mixture builder: deterministic per-source up/down
    weighting (weight = source index mod 4; 0 drops the source) with a
    copy index per replica — the epoch-mixing explode."""
    from paperchase_crawler_ray.ops.textstats import replicate_by_weight
    docs = _rp(sf, "documents", columns=["doc_id", "source"])

    def wts(b: pa.Table) -> np.ndarray:
        idx = pc.cast(pc.utf8_slice_codeunits(
            b.column("source"), start=3, stop=32), pa.int64())
        return pc.bit_wise_and(idx, 3).to_numpy(zero_copy_only=False)

    return replicate_by_weight(docs, wts, copy_col="copy")


def _q_lm_score(sf: str):
    """Unigram-LM perplexity-proxy quality score (CCNet-style): corpus
    unigram fit + broadcast log-prob table + per-doc mean token
    log-probability. Row-local float sums only — deterministic, but not
    SQL-expressible bit-for-bit (log/odds arithmetic), so rows-only;
    the pytest naive twin checks exact values."""
    from paperchase_crawler_ray.ops.textstats import unigram_logprob_score
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return unigram_logprob_score(docs).select_columns(["doc_id", "logprob"])


def _q_prep_pipeline(sf: str):
    """Flagship LLM-data prep composition, end to end in one streaming
    Dataset chain: length+repetition quality filter -> exact text dedup
    (hash winner) -> sliding-window chunking (`pipelines/prep.py`,
    whose production wrapper lands the same chain through the resumable
    sharded sink). The composed SQL twin mirrors the whole chain."""
    from paperchase_crawler_ray.pipelines.prep import prep_chain
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    chunks = prep_chain(docs)
    return chunks.select_columns(["doc_id", "chunk_id", "n_chunk_tokens"])


def _q_curate(sf: str):
    """Full curation PRODUCT chain (pipelines/curate.py) in its
    SQL-expressible configuration: Gopher quality gate -> exact-dup
    collapse (best copy = most tokens, then lowest doc_id; identical
    texts tie on tokens so winner = min doc_id per text) -> sliding
    window chunking -> deterministic md5 shuffle-to-shards. The twin
    replays every stage: the Gopher rule (q_gopher_filter's integer
    arithmetic), PARTITION BY text winner, the q_chunk window algebra,
    and the q_train_shards md5 shard+seq on key 'doc_id:chunk_id'."""
    from paperchase_crawler_ray.pipelines.curate import (CurateConfig,
                                                         curate_chain)
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    out = curate_chain(docs, CurateConfig(filters=("gopher",),
                                          neardup_threshold=None,
                                          n_shards=8))
    return out.select_columns(["doc_id", "chunk_id", "shard", "seq"])


def _q_doc_clusters(sf: str):
    """Topic bucketing for data-mixture construction: feature-hashed
    doc vectors (Weinberger et al. 2009) -> distributed Lloyd k-means
    -> (doc_id, cluster). Rows-only — float centroids are
    layout-stable, not layout-independent (kmeans_distributed's
    documented policy); pytest carries the fixed-layout bit-exact twin
    (test_document_clusters_matches_twin)."""
    from paperchase_crawler_ray.ops.textstats import document_clusters
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return document_clusters(docs, n_clusters=8, dim=64, iters=6) \
        .sort(["doc_id"])


def _q_weighted_sample(sf: str):
    """Weighted sampling without replacement (Efraimidis–Spirakis
    priorities from a stable seeded hash): deterministic top-k, so
    rows-only is exact; hash priorities are non-SQL-expressible."""
    from paperchase_crawler_ray.ops.textstats import weighted_sample
    docs = _rp(sf, "documents", columns=["doc_id", "n_chars"])
    return weighted_sample(docs, "doc_id", "n_chars", 50) \
        .select_columns(["doc_id", "n_chars"])


def _q_bpe(sf: str):
    """Tokenizer-training op: BPE merge-table induction from one
    distributed word count (unique merge order via deterministic
    tie-break; iterative — non-SQL-expressible, naive-twin pytest)."""
    from paperchase_crawler_ray.ops.textstats import bpe_merges
    docs = _rp(sf, "documents", columns=["text"])
    return bpe_merges(docs, n_merges=20)


def _q_full_join(sf: str):
    """FULL OUTER join (Ray native full_outer): per-user event counts x
    BUILDING-segment customers — unmatched rows survive on BOTH sides."""
    ev = _rp(sf, "events", columns=["user_id"])
    counts = _rename(ev.groupby("user_id").count(), {"count()": "n_events"})
    cust = _rp(sf, "customer", columns=["c_custkey", "c_mktsegment"]) \
        .filter(expr="c_mktsegment == 'BUILDING'")

    def mark(b: pa.Table) -> pa.Table:
        # Ray's full_outer coalesces the right key INTO the left key
        # column and drops it, so right-side presence needs a marker
        return pa.table({"c_custkey": b.column("c_custkey"),
                         "_inb": pa.array(np.ones(b.num_rows, np.int8))})

    from paperchase_crawler_ray.ops.relational import scrub_empty_blocks
    # scrub: filter(expr=)-emptied blocks skip the mark UDF and would
    # poison a join partition's right schema (Ray 2.49 empty-block skip)
    marked = scrub_empty_blocks(cust.map_batches(mark,
                                                 batch_format="pyarrow"))
    # the hash-aggregate left side emits schema-less empty blocks too
    j = scrub_empty_blocks(counts).join(
        marked, join_type="full_outer", num_partitions=8,
        on=("user_id",), right_on=("c_custkey",))

    def fin(b: pa.Table) -> pa.Table:
        n = pc.fill_null(b.column("n_events"), 0)
        in_seg = pc.cast(pc.is_valid(b.column("_inb")), pa.int64())
        return pa.table({"k": b.column("user_id"),
                         "n_events": pc.cast(n, pa.int64()),
                         "in_building": in_seg})

    return j.map_batches(fin, batch_format="pyarrow")


def _q_outliers(sf: str):
    """Robust per-group outlier profile (median / MAD with
    quantile_disc semantics, cross-multiplied 1.5x-MAD rule — exact
    arithmetic, no float accumulation): the distribution-screening pass
    a data-quality pipeline runs before filtering."""
    from paperchase_crawler_ray.ops.relational import grouped_quantiles
    li = _rp(sf, "lineitem", columns=["l_returnflag", "l_quantity"])

    def _gq_map(ds, gcol, vcol) -> dict:
        # stitched-sort discrete median per group (ceil(n/2)-1 ==
        # floor((n-1)/2)), collected as a tiny {group: median} dict —
        # one row per group, never per-group pandas map_groups
        return {r[gcol]: r["p50"]
                for b in grouped_quantiles(ds, gcol, vcol, ps=(0.5,))
                .iter_batches(batch_format="pandas", batch_size=None)
                for _, r in b.iterrows()}

    meds = _gq_map(li, "l_returnflag", "l_quantity")
    mref = ray.put(meds)

    def absdev(b: pa.Table) -> pa.Table:
        m = ray.get(mref)
        flags = b.column("l_returnflag").to_pylist()
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        med = np.array([m[f] for f in flags], np.float64)
        return pa.table({"l_returnflag": b.column("l_returnflag"),
                         "ad": pa.array(np.abs(q - med), pa.float64())})

    devs = li.map_batches(absdev, batch_format="pyarrow")

    mads = _gq_map(devs, "l_returnflag", "ad")
    dref = ray.put(mads)

    def flag(b: pa.Table) -> pa.Table:
        d = ray.get(dref)
        flags = b.column("l_returnflag").to_pylist()
        ad = b.column("ad").to_numpy(zero_copy_only=False)
        mad = np.array([d[f] for f in flags], np.float64)
        out = (2.0 * ad > 3.0 * mad).astype(np.int64)  # ad > 1.5*MAD
        return pa.table({"l_returnflag": b.column("l_returnflag"),
                         "is_out": pa.array(out)})

    from ray.data.aggregate import Sum
    n_out = devs.map_batches(flag, batch_format="pyarrow") \
        .groupby("l_returnflag").aggregate(Sum("is_out",
                                               alias_name="n_outliers"))

    rows = sorted(meds)
    prof = pd.DataFrame({
        "l_returnflag": rows,
        "med_qty": [meds[f] for f in rows],
        "mad_qty": [mads[f] for f in rows]})
    out = n_out.to_pandas().merge(prof, on="l_returnflag")
    out["n_outliers"] = out["n_outliers"].astype(np.int64)
    return out[["l_returnflag", "med_qty", "mad_qty", "n_outliers"]]


def _q_resample(sf: str):
    """Time-series resample: per-user hourly grid (floor-hour span
    explode) forward-filled with the latest event timestamp at or
    before each grid point via the as-of join."""
    from ray.data.aggregate import Max, Min

    from paperchase_crawler_ray.ops.relational import asof_join_time
    ev = _rp(sf, "events", columns=["user_id", "ts"])
    spans = ev.groupby("user_id").aggregate(Min("ts", alias_name="t0"),
                                            Max("ts", alias_name="t1"))

    def mkgrid(b: pa.Table) -> pa.Table:
        t0 = b.column("t0").to_numpy(zero_copy_only=False)
        t1 = b.column("t1").to_numpy(zero_copy_only=False)
        h = np.timedelta64(3_600_000_000, "us")
        g0 = t0.astype("datetime64[h]").astype("datetime64[us]")
        g1 = t1.astype("datetime64[h]").astype("datetime64[us]")
        counts = ((g1 - g0) // h).astype(np.int64) + 1
        users = np.repeat(b.column("user_id").to_numpy(
            zero_copy_only=False), counts)
        starts = np.repeat(g0, counts)
        offs = np.arange(int(counts.sum())) \
            - np.repeat(np.cumsum(counts) - counts, counts)
        return pa.table({"user_id": pa.array(users),
                         "gts": pa.array(starts + offs * h)})

    grid = spans.map_batches(mkgrid, batch_format="pyarrow")
    res = asof_join_time(grid, ev, "user_id", "user_id", "gts", "ts")
    out = res.select_columns(["user_id", "gts", "matched_ts"])
    return _ts_us(_ts_us(out, "gts"), "matched_ts")


def _q_unpivot(sf: str):
    """UNPIVOT/melt: wide metric columns -> (key, metric, value) long
    rows — the reshape every feature-store export runs. Stateless
    per-batch explode (3x row growth, no shuffle)."""
    li = _rp(sf, "lineitem", columns=["l_orderkey", "l_linenumber",
                                      "l_quantity", "l_extendedprice",
                                      "l_discount"])
    metrics = ("l_quantity", "l_extendedprice", "l_discount")

    def melt(b: pa.Table) -> pa.Table:
        n = b.num_rows
        parts = []
        for m in metrics:
            parts.append(pa.table({
                "l_orderkey": b.column("l_orderkey"),
                "l_linenumber": b.column("l_linenumber"),
                "metric": pa.array([m] * n, pa.string()),
                "value": pc.cast(b.column(m), pa.float64())}))
        return pa.concat_tables(parts)

    return li.map_batches(melt, batch_format="pyarrow")


def _q_cross_join(sf: str):
    """CROSS JOIN of two small dimensions via broadcast (no shuffle):
    every (region, nation) pair."""
    r = _rp(sf, "region", columns=["r_name"])
    n = _rp(sf, "nation", columns=["n_name"])
    r_names = sorted(x["r_name"] for x in r.take_all())
    ref = ray.put(r_names)

    def cross(b: pa.Table) -> pa.Table:
        rs = ray.get(ref)
        nn = b.column("n_name").to_pylist()
        return pa.table({
            "r_name": pa.array([x for x in rs for _ in nn]),
            "n_name": pa.array(nn * len(rs))})

    return n.map_batches(cross, batch_format="pyarrow")


def _q_regression(sf: str):
    """Per-group OLS slope as EXACT integer numerator/denominator
    (n·Σxy − Σx·Σy over n·Σx² − (Σx)²): float-policy-safe distributed
    regression — every sum is int64, division left to the consumer."""
    from ray.data.aggregate import Count, Sum
    li = _rp(sf, "lineitem", columns=["l_returnflag", "l_quantity",
                                      "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        x = pc.cast(b.column("l_quantity"), pa.int64())
        y = pc.cast(pc.floor(pc.divide(b.column("l_extendedprice"),
                                       100.0)), pa.int64())
        return pa.table({"l_returnflag": b.column("l_returnflag"),
                         "x": x, "y": y,
                         "xy": pc.multiply(x, y),
                         "xx": pc.multiply(x, x)})

    agg = li.map_batches(prep, batch_format="pyarrow") \
        .groupby("l_returnflag").aggregate(
            Count(alias_name="n"), Sum("x", alias_name="sx"),
            Sum("y", alias_name="sy"), Sum("xy", alias_name="sxy"),
            Sum("xx", alias_name="sxx"))

    def fin(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        sx = b.column("sx").to_numpy(zero_copy_only=False)
        sy = b.column("sy").to_numpy(zero_copy_only=False)
        sxy = b.column("sxy").to_numpy(zero_copy_only=False)
        sxx = b.column("sxx").to_numpy(zero_copy_only=False)
        return pa.table({"l_returnflag": b.column("l_returnflag"),
                         "slope_num": pa.array(n * sxy - sx * sy),
                         "slope_den": pa.array(n * sxx - sx * sx)})

    return agg.map_batches(fin, batch_format="pyarrow")


def _q_extract(sf: str):
    """Regex field extraction (Arrow RE2 kernel — the same engine as
    DuckDB's regexp_extract): structured id out of a formatted name."""
    c = _rp(sf, "customer", columns=["c_custkey", "c_name"])

    def ex(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b.column("c_name"), pattern=r"#(?P<num>\d+)")
        num = pc.cast(pc.struct_field(m, "num"), pa.int64())
        return pa.table({"c_custkey": b.column("c_custkey"),
                         "name_num": num})

    return c.map_batches(ex, batch_format="pyarrow")


def _edge_ds(sf: str):
    """Bipartite user<->event_type edge list in ONE string node space
    (graph ops need a single-typed node column)."""
    ev = _rp(sf, "events", columns=["user_id", "event_type"])

    def mk(b: pa.Table) -> pa.Table:
        u = pc.binary_join_element_wise(
            "u", pc.cast(b.column("user_id"), pa.string()), "")
        t = pc.binary_join_element_wise("t", b.column("event_type"), "")
        return pa.table({"a": u, "b": t})

    return ev.map_batches(mk, batch_format="pyarrow")


def _q_pagerank(sf: str):
    """Iterative distributed PageRank (BSP supersteps) in fixed-point
    integers — deterministic across any parallelism, so it hash-matches
    the DuckDB RECURSIVE-CTE twin bit for bit (integer floor-division
    share splits on both sides)."""
    from paperchase_crawler_ray.ops.graph import pagerank
    return pagerank(_edge_ds(sf), iters=4).sort(["node"])


def _q_trustrank(sf: str):
    """TrustRank (personalized PageRank; Gyongyi et al. VLDB'04):
    initial mass and teleport base flow ONLY to the trusted seed nodes,
    so score propagates outward from the trust set. Same fixed-point
    integer arithmetic as q_pagerank — the iterative recursive-CTE
    twin hash-matches bit for bit."""
    from paperchase_crawler_ray.ops.graph import pagerank
    return pagerank(_edge_ds(sf), iters=4,
                    teleport=["tclick", "tview"]).sort(["node"])


def _q_components(sf: str):
    """Distributed connected components: min-label propagation with
    pointer-jumping shortcuts (O(log diameter) rounds); oracle is the
    min-reachable-label RECURSIVE CTE."""
    from paperchase_crawler_ray.ops.graph import connected_components
    return connected_components(_edge_ds(sf)).sort(["node"])


def _q_bfs(sf: str):
    """Level-synchronous BFS hop distances from the 'click' event-type
    node over the bipartite user<->event_type graph: one streaming edge
    scan per hop with per-block frontier dedup (broadcast mode) or a
    frontier-keyed join per hop (auto-switched scale path). Distances
    are exact small integers, so the recursive-CTE oracle hash-matches
    at any parallelism; the hop cap (20) is part of the op semantics
    and appears in both sides."""
    from paperchase_crawler_ray.ops.graph import bfs_distances
    return bfs_distances(_edge_ds(sf), ["tclick"]).sort(["node"])


def _q_triangles(sf: str):
    """Per-node triangle counts over a deterministic modular projection
    of events (a = user_id % 499, b = event_id % 499): the
    degree-ordered wedge-join algorithm (Suri & Vassilvitskii) on the
    auto broadcast/join switch; exact small integers, so the 3-way
    self-join SQL twin hash-matches at any parallelism."""
    from paperchase_crawler_ray.ops.graph import triangle_counts
    ev = _rp(sf, "events", columns=["event_id", "user_id"])

    def mk(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        e = b.column("event_id").to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(u % 499, pa.int64()),
                         "b": pa.array(e % 499, pa.int64())})

    return triangle_counts(ev.map_batches(mk, batch_format="pyarrow")) \
        .sort(["node"])


def _q_sssp(sf: str):
    """Hop-bounded weighted shortest paths (Bellman-Ford supersteps)
    from node 0 over the modular-projected events digraph with
    deterministic integer weights; min-reductions over integers, so
    the recursive-CTE twin (which explores every <=6-hop path and
    takes MIN) hash-matches at any parallelism."""
    from paperchase_crawler_ray.ops.graph import shortest_paths
    ev = _rp(sf, "events", columns=["event_id", "user_id"])

    def mk(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        e = b.column("event_id").to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(u % 499, pa.int64()),
                         "b": pa.array(e % 499, pa.int64()),
                         "w": pa.array(1 + (u + e) % 7, pa.int64())})

    return shortest_paths(ev.map_batches(mk, batch_format="pyarrow"),
                          [0], max_hops=6).sort(["node"])


def _q_core(sf: str):
    """k-core decomposition (h-index fixed point == the classic peel's
    core numbers) over the modular-projected events graph. Iterative
    peel has no practical SQL form — rows-only; pytest carries the
    sequential-peel twin (test_core_numbers_matches_peel_both_modes)."""
    from paperchase_crawler_ray.ops.graph import core_numbers
    ev = _rp(sf, "events", columns=["event_id", "user_id"])

    def mk(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        e = b.column("event_id").to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(u % 499, pa.int64()),
                         "b": pa.array(e % 499, pa.int64())})

    return core_numbers(ev.map_batches(mk, batch_format="pyarrow")) \
        .sort(["node"])


def _q_spectrogram(sf: str):
    """Multimodal audio: per-frame FFT band energies over REAL WAV
    fixtures (numpy rFFT, 8 equal bands). Rows-only — float spectra;
    pytest carries the bit-exact numpy twin and a sine band-placement
    golden (test_audio_spectrogram_matches_numpy_twin)."""
    from paperchase_crawler_ray.fixtures import make_audio_rows
    from paperchase_crawler_ray.ops.multimodal import AudioSpectrogram
    rows = make_audio_rows(120)
    out = ray.data.from_arrow(rows).map_batches(
        AudioSpectrogram, batch_format="pyarrow", batch_size=32,
        concurrency=(1, 4))
    return out.sort(["media_id", "frame_idx"])


def _q_transitions(sf: str):
    """Per-user event-type transition matrix (the Markov-chain counts a
    sessionization analysis feeds): LAG(event_type) within user by
    (ts, event_id) via the stitched-sort lag kernel, then one count
    aggregate over (prev_type, event_type)."""
    from paperchase_crawler_ray.ops.relational import grouped_lag
    ev = _rp(sf, "events", columns=["event_id", "user_id", "event_type",
                                    "ts"])
    lag = grouped_lag(ev, "user_id", [("ts", False), ("event_id", False)],
                      "event_type", out_col="prev_type")

    def pairs(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("prev_type")))
        return pa.table({"prev_type": b.column("prev_type"),
                         "event_type": b.column("event_type")})

    out = lag.map_batches(pairs, batch_format="pyarrow") \
        .groupby(["prev_type", "event_type"]).count()
    return _rename(out, {"count()": "n"})


def _q_event_gap(sf: str):
    """LAG window: microseconds since the user's previous event (first
    event per user omitted — SQL NULL rows filtered on both sides)."""
    from paperchase_crawler_ray.ops.relational import grouped_lag
    ev = _rp(sf, "events", columns=["event_id", "user_id", "ts"])
    lag = grouped_lag(ev, "user_id", [("ts", False), ("event_id", False)],
                      "ts", out_col="prev_ts")

    def gap(b: pa.Table) -> pa.Table:
        mask = pc.is_valid(b.column("prev_ts"))
        b = b.filter(mask)
        d = pc.cast(pc.subtract(b.column("ts"), b.column("prev_ts")),
                    pa.duration("us")).cast(pa.int64())
        return pa.table({"event_id": b.column("event_id"),
                         "user_id": b.column("user_id"),
                         "gap_us": d})

    return lag.map_batches(gap, batch_format="pyarrow")


def _q_distinct_per_group(sf: str):
    """COUNT(DISTINCT supplier) per returnflag: dedup-pairs hash
    aggregate, then a count over the (tiny) distinct-pair result —
    two shuffles but the second moves only #distinct-pairs rows."""
    li = _rp(sf, "lineitem", columns=["l_returnflag", "l_suppkey"])
    pairs = li.groupby(["l_returnflag", "l_suppkey"]).count()
    return _rename(pairs.groupby("l_returnflag").count(),
                   {"count()": "n_suppliers"})


def _q_left_join(sf: str):
    """Left OUTER join: per-customer order count INCLUDING the
    zero-order customers (null-preserving keyed hash join)."""
    from ray.data.aggregate import Sum
    from paperchase_crawler_ray.ops.relational import cap_join_partitions
    c = _rp(sf, "customer", columns=["c_custkey"])
    o = _rp(sf, "orders", columns=["o_orderkey", "o_custkey"])
    j = c.join(o, join_type="left_outer",
               num_partitions=cap_join_partitions(8),
               on=("c_custkey",), right_on=("o_custkey",))

    def ind(b: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": b.column("c_custkey"),
                         "has": pc.cast(pc.is_valid(b.column("o_orderkey")),
                                        pa.int64())})

    return j.map_batches(ind, batch_format="pyarrow") \
        .groupby("c_custkey").aggregate(Sum("has", alias_name="n_orders"))


def _q_chunk(sf: str):
    """LLM context-window chunking: sliding 64-token windows, stride 48
    (chunk text = space-joined lowercase tokens, SQL list-slice twin)."""
    from paperchase_crawler_ray.ops.textstats import chunk_documents
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return chunk_documents(docs, window=64, stride=48)


def _q_decontaminate(sf: str):
    """Benchmark decontamination: corpus docs sharing an 8-token shingle
    with the deterministic 'benchmark' slice (doc_id % 50 == 0); n=4
    here so the random test corpus yields a non-trivial match set (19
    docs at sf0.01) — production default is n=8."""
    from paperchase_crawler_ray.ops.textstats import ngram_contamination
    docs = _rp(sf, "documents", columns=["doc_id", "text"])

    def pick(bench: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % 50) == 0
            return b.filter(pa.array(m if bench else ~m))
        return f

    corpus = docs.map_batches(pick(False), batch_format="pyarrow")
    bench = docs.map_batches(pick(True), batch_format="pyarrow")
    return ngram_contamination(corpus, bench, n=4)


def _q_approx_distinct(sf: str):
    """HLL approximate distinct orders per clerk-free global count
    (rows-only: the estimate is deterministic but not SQL-reproducible;
    pytest pins it within 2% of exact)."""
    from paperchase_crawler_ray.ops.sketch import approx_distinct
    li = _rp(sf, "lineitem", columns=["l_orderkey"])
    return approx_distinct(li, "l_orderkey", p=14)


def _q_image_quality(sf: str):
    """Multimodal curation signals: sharpness/brightness/contrast/entropy
    from real decoded pixels (rows-only + pytest golden)."""
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.ops.multimodal import image_quality
    rows = make_image_rows(64)
    ds = ray.data.from_arrow(rows.select(["image_id", "bytes"]))
    return image_quality(ds, batch_size=16).select_columns(
        ["image_id", "sharpness", "brightness", "contrast", "entropy"])


def _q_image_ann(sf: str):
    """Image similarity search (the image-axis ANN): 64-dim 8x8
    grayscale thumbnail vectors from REAL decoded pixels, brute-force
    cosine top-5 for three query images (rows-only: float cosine)."""
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.ops.multimodal import image_features
    from paperchase_crawler_ray.ops.similarity import brute_force_topk
    rows = make_image_rows(128)
    ds = ray.data.from_arrow(rows.select(["image_id", "bytes"]))
    feats = image_features(ds, batch_size=32)

    def vecs(b: pa.Table) -> pa.Table:
        ids = [int(s.rsplit("-", 1)[-1]) for s in
               b.column("image_id").to_pylist()]
        embs = [np.frombuffer(t, np.uint8).astype(np.float64)
                for t in b.column("thumb").to_pylist()]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "embedding": pa.array(embs)})

    return brute_force_topk(feats.map_batches(vecs, batch_format="pyarrow"),
                            query_ids=[0, 1, 2], k=5)


def _q_image_neardup(sf: str):
    """Image near-dup clustering: originals + their brightness/hflip
    augmentations, banded-phash candidate buckets, hamming<=6 verify,
    distributed connected components (attach_components) — cluster_id
    = min member id."""
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.ops.multimodal import (image_augment,
                                                       image_features,
                                                       image_neardup_clusters)
    rows = make_image_rows(48)
    base = ray.data.from_arrow(rows.select(["image_id", "bytes"]))
    feats = image_features(base, batch_size=16) \
        .select_columns(["image_id", "phash"])
    aug = image_augment(base, batch_size=16)

    def tag(b: pa.Table) -> pa.Table:
        ids = [f"{i}+{a}" for i, a in zip(b.column("image_id").to_pylist(),
                                          b.column("aug").to_pylist())]
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "phash": b.column("phash")})

    allimgs = feats.union(aug.map_batches(tag, batch_format="pyarrow"))
    return image_neardup_clusters(allimgs, hamming_max=6)


def _q_anti_join_keyed(sf: str):
    """J1 large-side path: Ray native hash left_anti join (broadcast_max=0
    forces the keyed path so the driver oracle checks it, not just the
    broadcast filter)."""
    from paperchase_crawler_ray.ops.relational import anti_join
    ev = _rp(sf, "events", columns=["event_id", "user_id"])
    cust = _rp(sf, "customer", columns=["c_custkey", "c_mktsegment"]) \
        .filter(expr="c_mktsegment == 'BUILDING'")
    return anti_join(ev, "user_id", cust, "c_custkey",
                     broadcast_max=0).select_columns(["event_id", "user_id"])


def _q_semi_join_keyed(sf: str):
    """J3 large-side path: Ray native hash left_semi join."""
    from paperchase_crawler_ray.ops.relational import semi_join
    o = _rp(sf, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    c = _rp(sf, "customer", columns=["c_custkey", "c_mktsegment"]) \
        .filter(expr="c_mktsegment == 'BUILDING'")
    return semi_join(o, "o_custkey", c, "c_custkey", broadcast_max=0) \
        .select_columns(["o_orderkey", "o_custkey", "o_totalprice"])


def _q_grouped_topk(sf: str):
    """Per-group top-k (O2 generalized): top 3 events by value per
    event_type, deterministic event_id tie-break."""
    from paperchase_crawler_ray.ops.relational import grouped_topk
    ev = _rp(sf, "events", columns=["event_id", "event_type", "value"])
    return grouped_topk(ev, "event_type", "value", 3, descending=True,
                        tie_col="event_id") \
        .select_columns(["event_id", "event_type", "value"])


def _q_lookup_join(sf: str):
    """J2 generalized: map-side broadcast dimension lookup (no shuffle of
    the big side) — attach the customer segment to orders, count per
    segment."""
    from paperchase_crawler_ray.ops.relational import broadcast_lookup_join
    o = _rp(sf, "orders", columns=["o_orderkey", "o_custkey"])
    c = _rp(sf, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = broadcast_lookup_join(o, "o_custkey", c, "c_custkey",
                                   ["c_mktsegment"])
    return _rename(joined.groupby("c_mktsegment").count(),
                   {"count()": "n_orders"})


def _q_rolling_max(sf: str):
    """Windowed aggregate: per-user rolling MAX of value over the last 3
    events ordered by (ts, event_id). MAX is order-insensitive, so the
    float column is safe under the driver's hash compare."""
    from paperchase_crawler_ray.ops.relational import grouped_rolling_max
    ev = _rp(sf, "events", columns=["event_id", "user_id", "ts", "value"])
    out = grouped_rolling_max(ev, "user_id", "ts", "value", window=3,
                              tie_col="event_id")
    return out.select_columns(["event_id", "user_id", "rolling_max"])


def _q_dup_clusters(sf: str):
    """Near-dup cluster assignment (rows-only: LSH banding is not
    SQL-expressible; the pytest naive twin checks the semantics)."""
    from paperchase_crawler_ray.ops.dedup import duplicate_clusters
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return duplicate_clusters(docs, "doc_id", "text", threshold=0.6) \
        .select_columns(["doc_id", "cluster_id"])


def _q_tfidf(sf: str):
    """TF-IDF over the documents corpus: explode -> tf -> ONE term
    groupby for df -> broadcast df lookup -> per-row score (rounded so
    the float hash compares exactly)."""
    from paperchase_crawler_ray.ops.textstats import tfidf
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return tfidf(docs).select_columns(["doc_id", "term", "tfidf"])


def _q_range_join(sf: str):
    """Inequality (interval) self-join: every click within 2 days BEFORE
    a purchase by the same user — the windowed attribution shape
    (events and orders live in disjoint calendars in the test data, so
    the attribution pair is events-vs-events)."""
    from paperchase_crawler_ray.ops.relational import range_join_time
    ev = _rp(sf, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def side(etype: str, idname: str):
        def f(b: pa.Table) -> pa.Table:
            b = b.filter(pc.equal(b.column("event_type"), etype))
            return pa.table({"user_id": b.column("user_id"),
                             "ts": b.column("ts"),
                             idname: b.column("event_id")})
        return ev.map_batches(f, batch_format="pyarrow")

    return range_join_time(side("purchase", "purchase_id"),
                           side("click", "click_id"),
                           "user_id", "user_id", "ts", "ts",
                           "purchase_id", "click_id", window_days=2.0)


def _q_nation_qty(sf: str):
    """Multi-way join chain (TPC-H Q5 shape, integer-valued measure):
    lineitem |><| orders via the keyed hash join (both sides large), then
    customer/nation attached via the map-side broadcast lookup (dimension
    tables) — no shuffle of the fact rows after the first join."""
    from ray.data.aggregate import Count, Sum
    from paperchase_crawler_ray.ops.relational import (broadcast_lookup_join,
                                                       cap_join_partitions)
    li = _rp(sf, "lineitem", columns=["l_orderkey", "l_quantity"])
    o = _rp(sf, "orders", columns=["o_orderkey", "o_custkey"])
    j = li.join(o, join_type="inner",
                num_partitions=cap_join_partitions(8),
                on=("l_orderkey",), right_on=("o_orderkey",))
    c = _rp(sf, "customer", columns=["c_custkey", "c_nationkey"])
    n = _rp(sf, "nation", columns=["n_nationkey", "n_name"])
    j = broadcast_lookup_join(j, "o_custkey", c, "c_custkey", ["c_nationkey"])
    j = broadcast_lookup_join(j, "c_nationkey", n, "n_nationkey", ["n_name"])
    return j.groupby("n_name").aggregate(
        Sum("l_quantity", alias_name="total_qty"),
        Count(alias_name="n_items"))


_STRATA_RATES = {"click": 20, "view": 10, "error": 2, "purchase": 1,
                 "signup": 1}


def _q_stratified_sample(sf: str):
    """Deterministic stratified downsampling: per-class keep rates
    applied via id-modulo (class-balancing pass for training data;
    reproducible, so SQL-oracle-able unlike seeded random sampling)."""
    ev = _rp(sf, "events", columns=["event_id", "event_type"])

    def keep(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        ids = batch.column("event_id").to_numpy(zero_copy_only=False)
        rates = np.ones(len(et), np.int64)
        for t, r in _STRATA_RATES.items():  # loop over classes, not rows
            rates[et == t] = r
        return batch.filter(pa.array(ids % rates == 0))

    return ev.map_batches(keep, batch_format="pyarrow")


def _q_histogram(sf: str):
    """Value-distribution histogram per event type (bin width 10)."""
    from paperchase_crawler_ray.ops.relational import grouped_histogram
    ev = _rp(sf, "events", columns=["event_type", "value"])
    return _rename(grouped_histogram(ev, "event_type", "value", 10.0),
                   {"count()": "c"})


def _q_rollup(sf: str):
    """Multi-level aggregate (GROUP BY ROLLUP): per (returnflag,
    linestatus), per returnflag subtotals, and a grand total."""
    from paperchase_crawler_ray.ops.relational import rollup_agg
    li = _rp(sf, "lineitem",
             columns=["l_returnflag", "l_linestatus", "l_quantity"])
    return rollup_agg(li, ["l_returnflag", "l_linestatus"], "l_quantity",
                      sum_name="sum_qty", count_name="n_rows")


def _q_bigram(sf: str):
    """Language-model n-gram statistics: top-40 corpus bigrams."""
    from paperchase_crawler_ray.ops.relational import global_topk
    from paperchase_crawler_ray.ops.textstats import bigram_counts
    docs = _rp(sf, "documents", columns=["text"])
    return global_topk(bigram_counts(docs), [("c", True), ("bigram", False)],
                       40)


_PACK_CAP = 2048  # tokens per packed training sequence


def _q_doc_pack(sf: str):
    """Sequence packing: assign each document to a fixed-token-budget
    training bin by a distributed prefix sum over token counts in
    doc_id order (bin = exclusive-cumsum // cap) — the deterministic
    contiguous-packing pass an LLM pretraining pipeline runs to build
    context windows. Exercises the generic scan primitive."""
    from paperchase_crawler_ray.ops.relational import prefix_sum
    from paperchase_crawler_ray.ops.textstats import token_count
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    tc = token_count(docs).select_columns(["doc_id", "n_tokens"])
    cs = prefix_sum(tc, [("doc_id", False)], "n_tokens",
                    out_col="cum_tokens")

    def binit(b: pa.Table) -> pa.Table:
        cum = b.column("cum_tokens").to_numpy()
        tok = b.column("n_tokens").to_numpy(zero_copy_only=False)
        return b.append_column(
            "bin", pa.array((cum - tok) // _PACK_CAP, pa.int64()))

    return cs.map_batches(binit, batch_format="pyarrow")


def _q_group_rank(sf: str):
    """Per-customer ROW_NUMBER over orders by price (desc, orderkey
    tiebreak) — the windowed rank shape, stitched across sorted blocks
    without per-group pandas."""
    from paperchase_crawler_ray.ops.relational import grouped_rank
    o = _rp(sf, "orders",
            columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return grouped_rank(o, "o_custkey",
                        [("o_totalprice", True), ("o_orderkey", False)],
                        out_col="rnk")


def _q_pivot(sf: str):
    """Categorical pivot: per-user event-type count columns."""
    from paperchase_crawler_ray.ops.relational import pivot_counts
    ev = _rp(sf, "events", columns=["user_id", "event_type"])
    return pivot_counts(ev, "user_id", "event_type",
                        ["click", "view", "error", "purchase", "signup"])


def _q_tumbling(sf: str):
    """Tumbling time-window aggregate: per (user, day) event count and
    integer-valued floor(value) sum (kept integral per the float-SUM
    oracle policy)."""
    from ray.data.aggregate import Count, Sum
    ev = _rp(sf, "events", columns=["user_id", "ts", "value"])

    def trunc(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(b.column("ts"), unit="day"),
                      pa.timestamp("us"))
        fv = pc.cast(pc.floor(b.column("value")), pa.int64())
        return pa.table({"user_id": b.column("user_id"), "day": day,
                         "fval": fv})

    agg = ev.map_batches(trunc, batch_format="pyarrow") \
        .groupby(["user_id", "day"]).aggregate(
            Count(alias_name="c"), Sum("fval", alias_name="sum_floor"))
    return _ts_us(agg, "day")


def _q_hopping(sf: str):
    """Hopping (sliding) time-window aggregate: 60-min windows every
    30 min — each event lands in size/hop = 2 windows via a vectorized
    window-start explode, then one keyed count. The streaming-analytics
    window shape tumbling can't express."""
    ev = _rp(sf, "events", columns=["ts"])
    size_us = 60 * 60 * 1_000_000
    hop_us = 30 * 60 * 1_000_000
    m = size_us // hop_us

    def explode_windows(b: pa.Table) -> pa.Table:
        t = pc.cast(b.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        base = (t // hop_us) * hop_us
        ws = np.concatenate([base - i * hop_us for i in range(m)])
        return pa.table({"window_start": pa.array(ws, pa.int64())})

    agg = _rename(ev.map_batches(explode_windows, batch_format="pyarrow")
                  .groupby("window_start").count(), {"count()": "c"})

    def to_ts(b: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": pc.cast(b.column("window_start"),
                                    pa.timestamp("us")),
            "c": pc.cast(b.column("c"), pa.int64())})

    return agg.map_batches(to_ts, batch_format="pyarrow")


def _q_bucket_join(sf: str):
    """Shuffle-free co-partitioned join: orders and customer are
    hash-sharded by custkey ONCE (the resumable sink's deterministic
    shard function), then the join runs as independent per-shard tasks
    with zero query-time exchange — the pay-the-partitioning-once
    pattern every 100-TB star schema uses."""
    from paperchase_crawler_ray.ops.sink import bucket_join, write_resumable
    o = _rp(sf, "orders", columns=["o_orderkey", "o_custkey"])
    c = _rp(sf, "customer", columns=["c_custkey", "c_mktsegment"])
    # fixed per-sf cache dir: write_resumable makes reruns no-ops via
    # the _COMMITTED markers instead of leaking a new tempdir per call
    tag = _cache_tag(sf, ("orders", "customer"))
    base = f"/tmp/pc_q_cache/{tag}/bucket"
    write_resumable(o, f"{base}/orders", "o_custkey", 8)
    write_resumable(c, f"{base}/customer", "c_custkey", 8)
    j = bucket_join(f"{base}/orders", f"{base}/customer",
                    "o_custkey", "c_custkey", 8)
    return j.select_columns(["o_orderkey", "o_custkey", "c_mktsegment"])


def _q_pruned_scan(sf: str):
    """The layout loop closed: z-order rewrite of lineitem -> parquet
    files with tight 2-D zone maps -> statistics-pruned range scan
    (skipped files' data pages are never opened). Result == a plain
    range predicate, verified by the SQL twin; the pruning itself is
    asserted in pytest."""
    from paperchase_crawler_ray.ops.layout import (pruned_read,
                                                   write_sorted_by_zorder)
    li = _rp(sf, "lineitem",
             columns=["l_orderkey", "l_linenumber", "l_partkey",
                      "l_suppkey"])
    # fixed per-sf cache dir with a completion marker: reruns reuse
    # the layout instead of leaking a fresh tempdir each invocation
    tag = _cache_tag(sf, ("lineitem",))
    out = f"/tmp/pc_q_cache/{tag}/zorder"
    marker = f"{out}_DONE"
    if not os.path.exists(marker):
        write_sorted_by_zorder(li, out, "l_partkey", "l_suppkey",
                               rows_per_file=4096)
        with open(marker, "w") as f:
            f.write("ok\n")
    ds, _stats = pruned_read(out, "zkey", 0, 16383)
    return ds.select_columns(["l_orderkey", "l_linenumber", "zkey"])


def _q_top_orders(sf: str):
    """TPC-H Q3 shape: segment-filtered customers ⋈ date-filtered
    orders ⋈ lineitem -> per-order quantity totals -> global top 10.
    Two keyed joins (small side first), one hash aggregate, pruned
    top-k — the canonical multi-stage analytical plan. Quantity (not
    revenue) keeps the aggregate integer-exact per the float policy."""
    from ray.data.aggregate import Sum
    from paperchase_crawler_ray.ops.relational import (global_topk,
                                                       semi_join)
    cust = _rp(sf, "customer", columns=["c_custkey", "c_mktsegment"]) \
        .filter(expr="c_mktsegment == 'BUILDING'")
    orders = _rp(sf, "orders",
                 columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def date_cut(b: pa.Table) -> pa.Table:
        lim_us = pd.Timestamp("2024-06-01").value // 1000
        d = pc.cast(pc.cast(b.column("o_orderdate"), pa.timestamp("us")),
                    pa.int64())
        return b.filter(pc.less(d, pa.scalar(lim_us, pa.int64())))

    o = semi_join(orders.map_batches(date_cut, batch_format="pyarrow"),
                  "o_custkey", cust, "c_custkey")
    li = _rp(sf, "lineitem", columns=["l_orderkey", "l_quantity"])
    j = semi_join(li, "l_orderkey", o, "o_orderkey")

    def to_int(b: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "q": pc.cast(b.column("l_quantity"),
                                      pa.int64())})

    agg = j.map_batches(to_int, batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(Sum("q", alias_name="total_qty"))

    def pin(b: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "total_qty": pc.cast(b.column("total_qty"),
                                              pa.int64())})

    return global_topk(agg.map_batches(pin, batch_format="pyarrow"),
                       [("total_qty", True), ("l_orderkey", False)], 10)


def _q_returned_qty(sf: str):
    """TPC-H Q10 shape: quantity returned per customer (lineitem
    R-flag filter -> orderkey->custkey broadcast-scale lookup join ->
    hash aggregate -> top 20). Quantity keeps the aggregate
    integer-exact per the float policy."""
    from ray.data.aggregate import Sum
    from paperchase_crawler_ray.ops.relational import global_topk
    li = _rp(sf, "lineitem",
             columns=["l_orderkey", "l_quantity", "l_returnflag"]) \
        .filter(expr="l_returnflag == 'R'")
    orders = _rp(sf, "orders", columns=["o_orderkey", "o_custkey"])
    j = li.join(orders, join_type="inner",
                num_partitions=8,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def to_int(b: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": b.column("o_custkey"),
                         "q": pc.cast(b.column("l_quantity"), pa.int64())})

    agg = j.map_batches(to_int, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Sum("q", alias_name="ret_qty"))

    def pin(b: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": b.column("o_custkey"),
                         "ret_qty": pc.cast(b.column("ret_qty"),
                                            pa.int64())})

    return global_topk(agg.map_batches(pin, batch_format="pyarrow"),
                       [("ret_qty", True), ("o_custkey", False)], 20)


def _q_cohort_retention(sf: str):
    """Cohort retention: users grouped by first-event day (cohort),
    counted distinct-active per (cohort, activity day) — the classic
    events-table product-analytics matrix. One hash aggregate to the
    tiny per-user cohort map (broadcast), then one keyed
    distinct-count aggregate; the big table is scanned twice, shuffled
    never (cohort attach is map-side)."""
    from ray.data.aggregate import Min
    ev = _rp(sf, "events", columns=["user_id", "ts"])

    def day(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b.column("user_id"),
                         "day": pc.cast(
                             pc.floor_temporal(b.column("ts"), unit="day"),
                             pa.timestamp("us"))})

    days = ev.map_batches(day, batch_format="pyarrow")
    firsts = days.groupby("user_id").aggregate(
        Min("day", alias_name="cohort"))
    cmap = {}
    for b in firsts.iter_batches(batch_format="pyarrow", batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.table(b)
        # pin to us BEFORE the int64 hop: the hash aggregate may have
        # round-tripped the timestamp through SECOND precision
        cmap.update(zip(t.column("user_id").to_pylist(),
                        pc.cast(pc.cast(t.column("cohort"),
                                        pa.timestamp("us")),
                                pa.int64()).to_pylist()))
    ref = ray.put(cmap)

    def attach(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        users = b.column("user_id").to_pylist()
        co = pa.array([m[u] for u in users], pa.int64())
        return pa.table({"user_id": b.column("user_id"),
                         "cohort": pc.cast(co, pa.timestamp("us")),
                         "day": b.column("day")})

    # distinct users per (cohort, day): two-level hash aggregate
    pairs = days.map_batches(attach, batch_format="pyarrow") \
        .groupby(["cohort", "day", "user_id"]).count()

    def drop_cnt(b: pa.Table) -> pa.Table:
        return b.select(["cohort", "day"])

    agg = _rename(pairs.map_batches(drop_cnt, batch_format="pyarrow")
                  .groupby(["cohort", "day"]).count(),
                  {"count()": "active_users"})

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "cohort": pc.cast(b.column("cohort"), pa.timestamp("us")),
            "day": pc.cast(b.column("day"), pa.timestamp("us")),
            "active_users": pc.cast(b.column("active_users"), pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def _q_sample_hash(sf: str):
    """Deterministic 8% Bernoulli sample via md5(key) % 100 — the
    SQL-auditable sampling twin to seeded random_sample (q_sample):
    membership is a pure function of the key, so re-runs, resumes and
    replicas agree exactly."""
    from paperchase_crawler_ray.ops.relational import hash_split
    ev = _rp(sf, "events", columns=["event_id", "user_id", "value"])
    tagged = hash_split(ev, "event_id", {"in": 8, "out": 92})

    def pick(b: pa.Table) -> pa.Table:
        # filter + project in ONE UDF: a filter(expr=)-emptied block
        # would skip a later select_columns and keep its stray "split"
        # column (Ray 2.49 empty-block projection skip)
        t = b.filter(pc.equal(b.column("split"), "in"))
        return t.select(["event_id", "user_id", "value"])

    return tagged.map_batches(pick, batch_format="pyarrow")


def _q_hash_split(sf: str):
    """Deterministic train/val/test split assignment (md5-bucketed,
    seedless, partitioning-independent) — reproducible in SQL so
    held-out contamination is auditable."""
    from paperchase_crawler_ray.ops.relational import hash_split
    c = _rp(sf, "customer", columns=["c_custkey"])
    return hash_split(c, "c_custkey",
                      {"train": 80, "val": 10, "test": 10})


def _q_expectations(sf: str):
    """Data-quality expectations audit: per-rule violation counts
    (null / range / composite-key uniqueness) — the pre-consumption
    validation gate."""
    from paperchase_crawler_ray.ops.relational import expect
    li = _rp(sf, "lineitem",
             columns=["l_orderkey", "l_linenumber", "l_quantity"])
    return expect(li, not_null=["l_orderkey"],
                  between={"l_quantity": (1.0, 25.0)},
                  unique=[["l_orderkey", "l_linenumber"]])


def _q_group_max_rows(sf: str):
    """All rows equal to their group's max (RANK() = 1 — TIES KEPT,
    unlike exact_dedup's ROW_NUMBER winner): one hash aggregate to the
    tiny (group, max) map, broadcast once, equality filter inside
    map_batches — no second shuffle."""
    from ray.data.aggregate import Max
    li = _rp(sf, "lineitem",
             columns=["l_orderkey", "l_linenumber", "l_suppkey",
                      "l_quantity"])
    gm = li.groupby("l_suppkey").aggregate(
        Max("l_quantity", alias_name="mx"))
    lut = {r["l_suppkey"]: r["mx"]
           for b in gm.iter_batches(batch_format="pandas", batch_size=None)
           for _, r in b.iterrows()}
    ref = ray.put(lut)

    def keep_max(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        mx = np.array([m[s] for s in sk], q.dtype)
        return b.filter(pa.array(q == mx))

    return li.map_batches(keep_max, batch_format="pyarrow")


def _q_rolling_7d(sf: str):
    """Trailing-7-day event counts per calendar day — the composed
    time-series shape: distributed daily aggregate (the only pass over
    the big table) -> dense day grid (gaps count as 0) via broadcast
    lookup -> windowed moving sum over the tiny grid."""
    from ray.data.aggregate import Max, Min
    from paperchase_crawler_ray.ops.relational import grouped_moving_sum
    ev = _rp(sf, "events", columns=["ts"])

    def trunc(b: pa.Table) -> pa.Table:
        return pa.table({"day": pc.cast(
            pc.floor_temporal(b.column("ts"), unit="day"),
            pa.timestamp("us"))})

    daily = _rename(ev.map_batches(trunc, batch_format="pyarrow")
                    .groupby("day").count(), {"count()": "c"})
    mm = daily.aggregate(Min("day", alias_name="lo"),
                         Max("day", alias_name="hi"))
    day_us = 86_400_000_000
    lo = int(pd.Timestamp(mm["lo"]).value // 1000)
    hi = int(pd.Timestamp(mm["hi"]).value // 1000)
    grid = ray.data.from_arrow(pa.table({
        "day": pa.array(np.arange(lo, hi + day_us, day_us),
                        pa.timestamp("us")),
        "g": pa.array(np.zeros((hi - lo) // day_us + 1, np.int64))}))
    # broadcast fill (not broadcast_lookup_join: that's inner-join and
    # would drop gap days, which must count as 0 in the window)
    small = {pd.Timestamp(r["day"]).value // 1000: r["c"]
             for b in daily.iter_batches(batch_format="pandas",
                                         batch_size=None)
             for _, r in b.iterrows()}
    sref = ray.put(small)

    def attach(b: pa.Table) -> pa.Table:
        m = ray.get(sref)
        days = pc.cast(b.column("day"), pa.int64()).to_numpy(
            zero_copy_only=False)
        c = np.array([m.get(int(d), 0) for d in days], np.int64)
        return pa.table({"day": b.column("day"),
                         "g": b.column("g"),
                         "c": pa.array(c, pa.int64())})

    dense = grid.map_batches(attach, batch_format="pyarrow")
    out = grouped_moving_sum(dense, "g", [("day", False)], "c", 7,
                             out_col="c7")

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"day": pc.cast(b.column("day"),
                                        pa.timestamp("us")),
                         "c7": pc.cast(b.column("c7"), pa.int64())})

    return out.map_batches(fin, batch_format="pyarrow")


def _q_bloom_semi(sf: str):
    """Semi join with a broadcast Bloom pre-filter: the probe side is
    pruned inside map_batches (no false negatives) before the exact
    join sees only survivors — the shuffle-avoidance shape for a
    selective semi join at 100 TB. Result is exact."""
    from paperchase_crawler_ray.ops.sketch import bloom_semi_join
    li = _rp(sf, "lineitem",
             columns=["l_orderkey", "l_linenumber", "l_suppkey"])
    sup = _rp(sf, "supplier", columns=["s_suppkey", "s_nationkey"])
    small = sup.map_batches(
        lambda b: b.filter(pc.less(b.column("s_nationkey"),
                                   pa.scalar(5, pa.int32()))),
        batch_format="pyarrow")
    return bloom_semi_join(li, "l_suppkey", small, "s_suppkey",
                           n_bits=1 << 16, k=5) \
        .select_columns(["l_orderkey", "l_linenumber", "l_suppkey"])


def _q_heavy_hitters(sf: str):
    """Exact frequent items (count > 40) via a Misra-Gries candidate
    pass + an isin-restricted exact counting pass — the two-pass heavy
    hitter that never groupbys the full key space."""
    from paperchase_crawler_ray.ops.sketch import heavy_hitters
    li = _rp(sf, "lineitem", columns=["l_partkey"])
    # capacity must scale with n to keep the exactness precondition
    # threshold > n/(capacity+1): fixed 32768 breaks above sf ~0.22
    n = li.count()  # metadata-only straight off the parquet read
    cap = max(32768, (4 * n) // 40)
    # n is an upper bound on the non-null count — sound (see op doc)
    return heavy_hitters(li, "l_partkey", threshold=40, capacity=cap,
                         total_n=n)


def _q_corr_stats(sf: str):
    """Per-returnflag exact integer sufficient statistics for
    corr(extendedprice, quantity) — moments stay mergeable integers,
    the ratio is one downstream formula."""
    from paperchase_crawler_ray.ops.relational import grouped_corr_suffstats
    li = _rp(sf, "lineitem",
             columns=["l_returnflag", "l_extendedprice", "l_quantity"])
    return grouped_corr_suffstats(li, "l_returnflag",
                                  "l_extendedprice", "l_quantity")


def _q_grouped_quantiles(sf: str):
    """Per-group exact p25/p50/p75 (quantile_disc semantics) — the
    distribution-profiling aggregate a data-quality pass runs per
    source/type before setting filter thresholds."""
    from paperchase_crawler_ray.ops.relational import grouped_quantiles
    ev = _rp(sf, "events", columns=["event_type", "value"])
    return grouped_quantiles(ev, "event_type", "value", (0.25, 0.5, 0.75))


def _q_kth_value(sf: str):
    """Exact global percentiles WITHOUT a sort: distributed radix
    selection (<= 4 counting passes + one tiny collect per quantile, no
    shuffle at any scale) — vs ORDER BY + OFFSET, which is a full
    all-to-all. Returns one row of (n, p10, p50, p90) over
    events.value; values are raw data elements (float pass-through,
    no float aggregation)."""
    from paperchase_crawler_ray.ops.relational import (count_non_null,
                                                        multi_kth_smallest)
    ev = _rp(sf, "events", columns=["value"])
    n = ev.count()
    # ranks index the NON-NULL sorted order (quantile_disc ignores
    # nulls; multi_kth_smallest ranks only non-null values) — n itself
    # stays COUNT(*) to match the oracle's reported row count
    nn = count_non_null(ev, "value")
    if nn == 0:
        return pa.table({"n": pa.array([n], pa.int64()),
                         "p10": pa.array([None], pa.float64()),
                         "p50": pa.array([None], pa.float64()),
                         "p90": pa.array([None], pa.float64())})
    ks = [min(max(int(np.ceil(p * nn)) - 1, 0), nn - 1)
          for p in (0.10, 0.50, 0.90)]
    p10, p50, p90 = multi_kth_smallest(ev, "value", ks)
    return pa.table({"n": pa.array([n], pa.int64()),
                     "p10": pa.array([p10], pa.float64()),
                     "p50": pa.array([p50], pa.float64()),
                     "p90": pa.array([p90], pa.float64())})


def _q_equidepth(sf: str):
    """Equi-depth histogram boundaries (9 deciles of o_totalprice) in
    ONE shared radix-selection descent — <= 4 counting passes + 1
    collect for all 9 quantiles together, zero shuffle."""
    from paperchase_crawler_ray.ops.relational import (count_non_null,
                                                        multi_kth_smallest)
    o = _rp(sf, "orders", columns=["o_totalprice"])
    n = o.count()
    # rank against the non-null count (quantile_disc semantics) — see
    # _q_kth_value
    nn = count_non_null(o, "o_totalprice")
    ps = [i / 10 for i in range(1, 10)]
    if nn == 0:
        cols = {"n": pa.array([n], pa.int64())}
        for p in ps:
            cols[f"b{int(p * 100):02d}"] = pa.array([None], pa.float64())
        return pa.table(cols)
    ks = [min(max(int(np.ceil(p * nn)) - 1, 0), nn - 1) for p in ps]
    vals = multi_kth_smallest(o, "o_totalprice", ks)
    cols = {"n": pa.array([n], pa.int64())}
    for p, v in zip(ps, vals):
        cols[f"b{int(p * 100):02d}"] = pa.array([v], pa.float64())
    return pa.table(cols)


def _q_snapshot_diff(sf: str):
    """CDC snapshot diff: today's customer table vs a derived
    yesterday (deterministic synthetic deltas: custkey%97 rows deleted
    from new, %31 rows get acctbal+100, %89 rows absent from old =
    added) — one keyed full_outer join + vectorized classification."""
    from paperchase_crawler_ray.ops.relational import snapshot_diff
    cust = _rp(sf, "customer", columns=["c_custkey", "c_acctbal"])

    def as_old(b: pa.Table) -> pa.Table:
        key = b.column("c_custkey").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(key % 89 != 0))

    def as_new(b: pa.Table) -> pa.Table:
        key = b.column("c_custkey").to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(key % 97 != 0))
        key = t.column("c_custkey").to_numpy(zero_copy_only=False)
        bumped = pc.if_else(
            pa.array(key % 31 == 0),
            pc.add(t.column("c_acctbal"), pa.scalar(100.0)),
            t.column("c_acctbal"))
        return t.set_column(t.column_names.index("c_acctbal"),
                            "c_acctbal", bumped)

    old = cust.map_batches(as_old, batch_format="pyarrow")
    new = cust.map_batches(as_new, batch_format="pyarrow")
    return snapshot_diff(old, new, "c_custkey", ["c_acctbal"])


def _q_lev_join(sf: str):
    """Record linkage: all distinct part-name pairs within edit
    distance 2, via PassJoin segment signatures (never all-pairs) +
    banded-DP verify. Dedupe-to-distinct first is the linkage-join
    shape that bounds hot-segment skew."""
    import hashlib as _hl
    from paperchase_crawler_ray.ops.linkage import edit_distance_join
    names = _rename(_rp(sf, "part", columns=["p_name"])
                    .groupby("p_name").count(), {"count()": "_c"})

    def with_id(b: pa.Table) -> pa.Table:
        ns = b.column("p_name").to_pylist()
        ids = []
        for n in ns:
            v = int.from_bytes(
                _hl.blake2b(n.encode(), digest_size=8).digest(), "big")
            ids.append(v - (1 << 64) if v >= (1 << 63) else v)
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "name": pa.array(ns, pa.string())})

    ds = names.map_batches(with_id, batch_format="pyarrow")
    pairs = edit_distance_join(ds, "id", "name", max_dist=2,
                               with_texts=True)

    def orient(b: pa.Table) -> pa.Table:
        ta = b.column("text_a").to_pylist()
        tb = b.column("text_b").to_pylist()
        lo = [min(x, y) for x, y in zip(ta, tb)]
        hi = [max(x, y) for x, y in zip(ta, tb)]
        return pa.table({"name_a": pa.array(lo, pa.string()),
                         "name_b": pa.array(hi, pa.string()),
                         "dist": pc.cast(b.column("dist"), pa.int64())})

    return pairs.map_batches(orient, batch_format="pyarrow")


def _q_interval_lookup(sf: str):
    """Static-interval (price-band) lookup: broadcast sorted bands +
    per-batch searchsorted — the zero-shuffle form of a small-side
    range join (geo-IP shape)."""
    from paperchase_crawler_ray.ops.relational import interval_lookup_join
    bands = pa.table({
        "lo": pa.array([0, 50_000, 150_000], pa.int64()),
        "hi": pa.array([50_000, 150_000, 1_000_000_000], pa.int64()),
        "band": pa.array(["low", "mid", "high"], pa.string())})
    o = _rp(sf, "orders", columns=["o_orderkey", "o_totalprice"])
    out = interval_lookup_join(o, "o_totalprice", bands, "lo", "hi")
    return out.select_columns(["o_orderkey", "band"])


def _q_winsorize(sf: str):
    """Percentile capping at exact [p05, p95] quantiles (radix-selected,
    zero shuffle) — outlier clipping before training. Clipped values
    are data elements (float pass-through, no float math)."""
    from paperchase_crawler_ray.ops.relational import winsorize
    ev = _rp(sf, "events", columns=["event_id", "value"])
    out = winsorize(ev, "value", 0.05, 0.95, out_col="value_w")
    return out.select_columns(["event_id", "value_w"])


def _q_table_checksum(sf: str):
    """Order/partitioning-independent content checksum (anti-entropy
    replica validation): md5-top-8-bytes per row, wrapping int sum."""
    from paperchase_crawler_ray.ops.sketch import table_checksum
    li = _rp(sf, "lineitem",
             columns=["l_orderkey", "l_linenumber", "l_suppkey"])
    return table_checksum(li, ["l_orderkey", "l_linenumber", "l_suppkey"])


def _q_zorder(sf: str):
    """Z-order (Morton) layout keys over (partkey, suppkey) low 16 bits
    — the data-layout pass that makes 2-D-filtered scans prune files.
    Emits the key per row; the downstream sort is the layout rewrite."""
    from paperchase_crawler_ray.ops.layout import zorder_keys
    li = _rp(sf, "lineitem",
             columns=["l_orderkey", "l_linenumber", "l_partkey",
                      "l_suppkey"])
    out = zorder_keys(li, "l_partkey", "l_suppkey")
    return out.select_columns(["l_orderkey", "l_linenumber", "zkey"])


def _q_pca(sf: str):
    """Embedding decorrelation: distributed PCA fit (one moments pass,
    O(dim^2) exchange per block) + whitened projection (rows-only —
    float covariance; pytest compares against numpy eigh)."""
    from paperchase_crawler_ray.ops.similarity import pca_fit, pca_transform
    emb = _rp(sf, "embeddings", columns=["vec_id", "embedding"])
    mu, comps, _ = pca_fit(emb, k=8, whiten=True)
    return pca_transform(emb, mu, comps, round_dp=4)


def _q_image_prep(sf: str):
    """Image-side flagship prep chain: phash near-dup collapse on the
    NARROW plane -> ONE wide pass (decode-quality gate + aspect tags).
    Rows-only — binary payloads; pytest carries the naive twin +
    kill-resume check via the resumable sink."""
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.pipelines.prep import image_prep_chain
    rows = make_image_rows(96)
    out = image_prep_chain(ray.data.from_arrow(rows))
    return out.select_columns(["image_id", "aspect_bucket", "res_tier"])


def _q_image_shard(sf: str):
    """Multimodal: aspect/resolution bucketing for training batch
    locality (tags from metadata columns, one keyed co-location
    shuffle; rows-only — fixture image table)."""
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.ops.multimodal import shard_by_aspect
    rows = make_image_rows(96)
    ds = ray.data.from_arrow(rows.select(["image_id", "w", "h"]))
    out = shard_by_aspect(ds, num_shards=4)
    return out.select_columns(["image_id", "aspect_bucket", "res_tier"])


def _q_audio_features(sf: str):
    """Multimodal audio: REAL stdlib WAV/PCM decode in an actor pool
    (small batch_size — payload bytes dominate block memory) ->
    (duration, rms) features. Rows-only — float signal math; pytest
    carries the sine-ground-truth golden."""
    from paperchase_crawler_ray.fixtures import make_audio_rows
    from paperchase_crawler_ray.ops.multimodal import AudioDecode
    rows = make_audio_rows(120)
    ds = ray.data.from_arrow(rows)
    out = ds.map_batches(AudioDecode, fn_constructor_kwargs={"backend": "real"},
                         batch_format="pyarrow", batch_size=32,
                         concurrency=(1, 4))
    return out.select_columns(["media_id", "sample_rate", "n_channels",
                               "duration_sec", "rms"]).sort("media_id")


def _q_audio_vad(sf: str):
    """Multimodal audio: energy-threshold voice-activity detection over
    REAL WAV fixtures — exploded (media_id, seg_idx, start/end_frame)
    segment rows, frame-integer exact. Rows-only — binary payload
    input; pytest carries the constructed-boundary golden
    (test_audio_vad_matches_constructed_segments)."""
    from paperchase_crawler_ray.fixtures import make_speech_rows
    from paperchase_crawler_ray.ops.multimodal import AudioVAD
    rows = make_speech_rows(120)
    ds = ray.data.from_arrow(rows.drop_columns(["segments_json"]))
    out = ds.map_batches(AudioVAD, batch_format="pyarrow", batch_size=32,
                         concurrency=(1, 4))
    return out.sort(["media_id", "seg_idx"])


def _q_bm25(sf: str):
    """BM25 retrieval top-k per query over the documents table
    (Lucene-form idf, block-local score sums, grouped_topk finish).
    Rows-only — float scoring by design; pytest carries the bit-exact
    single-process twin (test_bm25_topk_matches_naive)."""
    from paperchase_crawler_ray.ops.textstats import bm25_topk
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    out = bm25_topk(docs, ["quick brown fox", "data pipeline quality",
                           "machine learning model"], k=10)
    return out.select_columns(["query_idx", "doc_id", "score", "rnk"]) \
        .sort(["query_idx", "rnk"])


def _q_video_frames(sf: str):
    """Multimodal video: REAL motion-JPEG frame sampling (marker-scan
    split, engine-native JPEG decode of sampled frames) exploded to
    frame rows. Rows-only — binary frame payloads; pytest carries the
    per-frame pixel goldens."""
    from paperchase_crawler_ray.fixtures import make_video_rows
    from paperchase_crawler_ray.ops.multimodal import VideoFrameSample
    rows = make_video_rows(40)
    ds = ray.data.from_arrow(rows)
    out = ds.map_batches(VideoFrameSample,
                         fn_constructor_kwargs={"stride": 2,
                                                "backend": "real"},
                         batch_format="pyarrow", batch_size=16,
                         concurrency=(1, 4))
    return out.select_columns(["media_id", "frame_idx", "w", "h"]) \
              .sort(["media_id", "frame_idx"])


def _q_quality_classifier(sf: str):
    """Model-in-the-loop quality filtering: train a hashed-ngram
    logistic classifier against a quality-marker label (docs
    containing the corpus' "slow" marker token) with full-batch
    distributed Adagrad — fixed 16 KB gradient partials per block per
    epoch, content-sorted driver fold — then score the corpus with
    one broadcast + stateless map (rows-only: float weights by
    design; pytest pins numpy-twin weight equality, held-out
    accuracy, and fixed-partitioning bit-identity). The lang label is
    NOT used: every language in the synthetic corpus shares one
    vocabulary, so it carries no text signal; "contains slow" is the
    corpus' only per-doc text-derivable label, and the separating
    feature (the marker's hash bucket) is ~0.02-valued, which is
    exactly the conditioning regime Adagrad exists for."""
    from paperchase_crawler_ray.ops.textstats import (
        score_text_classifier, train_text_classifier)
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    labeled = docs.add_column(
        "label",
        lambda df: df["text"].str.contains("slow").astype("int64"),
        batch_format="pandas")
    model = train_text_classifier(labeled, buckets=2048, epochs=12,
                                  lr=20.0)
    out = score_text_classifier(labeled, model)
    return out.add_column(
        "pred", lambda df: (df["quality_prob"] > 0.5).astype("int64"),
        batch_format="pandas") \
        .select_columns(["doc_id", "label", "pred"]).sort("doc_id")


def _q_video_keyframes(sf: str):
    """Content-based video keyframe extraction: sequential phash scan
    per MJPEG payload — static shots collapse to one frame, scene
    cuts survive (rows-only: binary frame payloads; pytest pins exact
    equality with the sequential naive twin). Per-video state only —
    embarrassingly parallel across a 100-TB video corpus, no
    cross-video exchange."""
    from paperchase_crawler_ray.fixtures import make_shot_video_rows
    from paperchase_crawler_ray.ops.multimodal import VideoKeyframes
    ds = ray.data.from_arrow(make_shot_video_rows(30))
    out = ds.map_batches(VideoKeyframes,
                         fn_constructor_kwargs={"hamming_max": 10,
                                                "backend": "real"},
                         batch_format="pyarrow", batch_size=8,
                         concurrency=(1, 4))
    return out.select_columns(["media_id", "frame_idx", "w", "h",
                               "n_frames"]) \
              .sort(["media_id", "frame_idx"])


def _q_train_shards(sf: str):
    """Deterministic global training shuffle into 8 shards (md5
    shard + within-shard md5 rank): the permutation every training
    export ends with, fully SQL-auditable including the ORDER (seq is
    a value column) — one shard-keyed hash exchange, whole-block
    lexsort, no global sort."""
    from paperchase_crawler_ray.ops.relational import shuffle_to_shards
    c = _rp(sf, "customer", columns=["c_custkey"])
    return shuffle_to_shards(c, "c_custkey", 8)


def _q_kn_score(sf: str):
    """CCNet-shape perplexity filter, bigram order: fit an
    interpolated Kneser-Ney bigram LM on the corpus (one distributed
    bigram count; derived tables folded in sorted key order), score
    every doc with its mean token log-probability (rows-only: float
    log-probs by design; pytest pins exact naive-twin equality and
    parallelism invariance)."""
    from paperchase_crawler_ray.ops.textstats import (kneser_ney_fit,
                                                      kneser_ney_score)
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    model = kneser_ney_fit(docs)
    return kneser_ney_score(docs, model) \
        .select_columns(["doc_id", "kn_logprob"]).sort("doc_id")


def _q_budget_select(sf: str):
    """Token-budget corpus selection: rank docs by a quality key
    (distinct-token count DESC, doc_id), keep the prefix whose
    RUNNING token total fits the budget — the 'best docs until the
    token budget is spent' curation primitive. Pure composition:
    integer token stats -> ONE global sort + block-local prefix-sum
    scan with O(blocks) carries -> stateless filter. Exact integers
    end-to-end, so the running total itself is SQL-value-checked."""
    from paperchase_crawler_ray.ops.relational import grouped_prefix_sum
    from paperchase_crawler_ray.ops.textstats import _WORD_RE
    docs = _rp(sf, "documents", columns=["doc_id", "text"])

    def stats(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        toks = [_WORD_RE.findall(t) for t in texts]
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": pa.array([len(t) for t in toks], pa.int64()),
            "n_distinct": pa.array([len(set(t)) for t in toks],
                                   pa.int64()),
            "_g": pa.array(np.zeros(len(texts), np.int64))})

    prepped = docs.map_batches(stats, batch_format="pyarrow")
    run = grouped_prefix_sum(prepped, "_g",
                             [("n_distinct", True), ("doc_id", False)],
                             "n_tokens", out_col="running")
    out = run.filter(expr="running <= 8000")
    return out.select_columns(["doc_id", "n_tokens", "running"])


def _q_dup_spans(sf: str):
    """Substring-level dedup diagnostic (Lee et al. shape): per-doc
    count of token positions whose 5-gram occurs >= 2 times anywhere in
    the CORPUS — block-combined ngram-hash counts through one keyed
    aggregate, duplicated set broadcast (keyed semi-join path above the
    size switch)."""
    from paperchase_crawler_ray.ops.textstats import corpus_dup_spans
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return corpus_dup_spans(docs, "doc_id", "text", n=5)


def _q_clean_spans(sf: str):
    """Substring-dedup REMOVAL: duplicated-5-gram token spans dropped
    corpus-wide, clean token stream re-emitted. Fully SQL-oracled (the
    DuckDB twin reconstructs covered positions via interval join +
    ordered string_agg); pytest additionally carries the exact naive
    twin on both size-switch paths."""
    from paperchase_crawler_ray.ops.textstats import remove_dup_spans
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    out = remove_dup_spans(docs, "doc_id", "text", n=5)
    return out.select_columns(["doc_id", "clean_text", "n_removed"])


def _q_grouped_distinct(sf: str):
    """Exact COUNT(DISTINCT) per group without any driver state: one
    keyed aggregate to the distinct (group, value) pairs, then a second
    tiny aggregate over the pair table — the standard two-level
    expansion that keeps both exchanges pre-shrunk."""
    from ray.data.aggregate import Count
    ev = _rp(sf, "events", columns=["event_type", "user_id"])
    pairs = ev.groupby(["event_type", "user_id"]).count() \
        .select_columns(["event_type", "user_id"])
    out = pairs.groupby("event_type").aggregate(
        Count(alias_name="n_users"))
    return out.map_batches(
        lambda b: b.set_column(b.column_names.index("n_users"), "n_users",
                               pc.cast(b.column("n_users"), pa.int64())),
        batch_format="pyarrow")


def _q_local_supplier_qty(sf: str):
    """TPC-H Q5 distinctive shape: revenue-from-LOCAL-suppliers — the
    5-way chain region|>nation|>customer|>orders(date range)|>lineitem
    |>supplier with the c_nationkey = s_nationkey locality predicate.
    Fact rows shuffle ONCE (lineitem |><| filtered orders); every
    dimension attaches via the map-side broadcast lookup, and the ASIA
    region filter rides the nation lookup (inner semantics drop
    non-ASIA rows for free). Quantity sum keeps the measure
    integer-exact per the float policy."""
    from ray.data.aggregate import Sum
    from paperchase_crawler_ray.ops.relational import (broadcast_lookup_join,
                                                       cap_join_partitions)
    r = _rp(sf, "region", columns=["r_regionkey", "r_name"])
    n = _rp(sf, "nation", columns=["n_nationkey", "n_name", "n_regionkey"])
    asia_keys = {row["r_regionkey"] for row in r.take_all()
                 if row["r_name"] == "ASIA"}
    asia_n = n.map_batches(
        lambda b: b.filter(pa.array(np.isin(
            b.column("n_regionkey").to_numpy(zero_copy_only=False),
            np.array(sorted(asia_keys), np.int64)))),
        batch_format="pyarrow")

    o = _rp(sf, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def date_cut(b: pa.Table) -> pa.Table:
        d = pc.cast(pc.cast(b.column("o_orderdate"), pa.timestamp("us")),
                    pa.int64())
        lo = pd.Timestamp("1996-01-01").value // 1000
        hi = pd.Timestamp("1998-01-01").value // 1000
        keep = pc.and_(pc.greater_equal(d, pa.scalar(lo, pa.int64())),
                       pc.less(d, pa.scalar(hi, pa.int64())))
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "o_custkey": b.column("o_custkey")}).filter(keep)

    o = o.map_batches(date_cut, batch_format="pyarrow")
    li = _rp(sf, "lineitem",
             columns=["l_orderkey", "l_suppkey", "l_quantity"])
    j = li.join(o, join_type="inner",
                num_partitions=cap_join_partitions(8),
                on=("l_orderkey",), right_on=("o_orderkey",))
    c = _rp(sf, "customer", columns=["c_custkey", "c_nationkey"])
    s = _rp(sf, "supplier", columns=["s_suppkey", "s_nationkey"])
    j = broadcast_lookup_join(j, "o_custkey", c, "c_custkey",
                              ["c_nationkey"])
    j = broadcast_lookup_join(j, "l_suppkey", s, "s_suppkey",
                              ["s_nationkey"])

    def local_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b.column("c_nationkey"),
                                 b.column("s_nationkey")))

    j = j.map_batches(local_only, batch_format="pyarrow")
    # inner lookup against ASIA nations doubles as the region filter
    j = broadcast_lookup_join(j, "c_nationkey", asia_n, "n_nationkey",
                              ["n_name"])

    def q_int(b: pa.Table) -> pa.Table:
        return pa.table({"n_name": b.column("n_name"),
                         "q": pc.cast(b.column("l_quantity"), pa.int64())})

    return j.map_batches(q_int, batch_format="pyarrow") \
        .groupby("n_name").aggregate(Sum("q", alias_name="total_qty"))


def _q_lead(sf: str):
    """LEAD window (NULL on each user's last event) — LAG over the
    reversed total order through the same one-sort stitch."""
    from paperchase_crawler_ray.ops.relational import grouped_lead
    ev = _rp(sf, "events", columns=["event_id", "user_id", "ts", "value"])
    out = grouped_lead(ev, "user_id", [("ts", False), ("event_id", False)],
                       "value", out_col="next_value")
    return out.select_columns(["event_id", "user_id", "next_value"])


def _q_pct_cont(sf: str):
    """Interpolated percentiles (quantile_cont semantics): shared radix
    descent fetches BOTH bracketing data values per percentile, the
    interpolation is one deterministic per-value formula (no float
    aggregation, so the float policy holds)."""
    from paperchase_crawler_ray.ops.relational import (count_non_null,
                                                       multi_kth_smallest)
    ev = _rp(sf, "events", columns=["value"])
    nn = count_non_null(ev, "value")
    ps = (0.10, 0.50, 0.90)
    if nn == 0:
        return pa.table({f"p{int(p*100):02d}c": pa.array([None], pa.float64())
                         for p in ps})
    ranks = []
    for p in ps:
        idx = p * (nn - 1)
        ranks += [int(np.floor(idx)), int(np.ceil(idx))]
    uniq = sorted(set(ranks))
    vals = dict(zip(uniq, multi_kth_smallest(ev, "value", uniq)))
    cols = {}
    for p in ps:
        idx = p * (nn - 1)
        lo, hi = int(np.floor(idx)), int(np.ceil(idx))
        # bit-match quantile_cont: v_lo*(CRN-RN) + v_hi*(RN-FRN), with
        # the exact-index case returned directly (the weighted form
        # would collapse to 0.0 when lo == hi)
        if lo == hi:
            v = vals[lo]
        else:
            v = vals[lo] * (hi - idx) + vals[hi] * (idx - lo)
        cols[f"p{int(p*100):02d}c"] = pa.array([v], pa.float64())
    return pa.table(cols)


def _q_versioned_table(sf: str):
    """Lance-style versioned table lifecycle over fixture image rows:
    append -> append -> O(keys) logical delete (deletion vector) ->
    compact, then read back the latest snapshot's metadata columns.
    Rows-only — binary payloads; pytest carries byte-exact payload,
    time-travel and crash-safety goldens."""
    import tempfile
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.ops import table_format as T
    rows = make_image_rows(60)
    root = tempfile.mkdtemp(prefix="pc_vt_")
    T.append_table(ray.data.from_arrow(rows.slice(0, 40)), root)
    T.append_table(ray.data.from_arrow(rows.slice(40, 20)), root)
    dead = [i for k, i in enumerate(rows.column("image_id").to_pylist())
            if k % 5 == 0]
    T.delete_where_keys(root, dead)
    T.compact_table(root)
    # expire the pre-compaction history: the latest view must be
    # bit-identical after GC (the deterministic invariant this
    # rows-only query carries; pytest has the full expiry goldens)
    T.expire_snapshots(root, keep_last=1)
    out = T.read_table(root, columns=["image_id", "w", "h", "phash"]) \
        .sort("image_id")
    return out


def _q_upsert_table(sf: str):
    """Merge-on-read UPSERT lifecycle on the versioned table (rows-only:
    binary payloads; pytest carries the replace/insert/time-travel/
    compaction goldens): append -> upsert replacing half the keys and
    adding new ones -> compact -> latest metadata view. Deterministic:
    fixture rows + fixed key split."""
    import tempfile
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.ops import table_format as T
    rows = make_image_rows(60)
    root = tempfile.mkdtemp(prefix="pc_vt_up_")
    T.append_table(ray.data.from_arrow(rows.slice(0, 40)), root)
    # upsert: rows 20-59 — replaces 20-39, inserts 40-59
    T.upsert_table(ray.data.from_arrow(rows.slice(20, 40)), root)
    T.compact_table(root)
    return T.read_table(root, columns=["image_id", "w", "h", "phash"]) \
        .sort("image_id")


def _q_grouped_heavy_hitters(sf: str):
    """EXACT grouped frequent pairs — heavy_hitters with the composite
    (group, value) item (identical Misra-Gries soundness, n = total
    rows): (event_type, user_id) pairs occurring more than 15 times.
    Candidate exchange <= capacity rows per block; pass 2 exact-counts
    only rows whose item is in the candidate set."""
    from paperchase_crawler_ray.ops.sketch import heavy_hitters_by
    ev = _rp(sf, "events", columns=["event_type", "user_id"])
    return heavy_hitters_by(ev, "event_type", "user_id", threshold=15)


def _q_corpus_overlap(sf: str):
    """Corpus-overlap measurement via KMV sketches (zero-shuffle on
    both sides; the contamination metric between two 10^10-row corpora
    at 100 TB): distinct/union/intersection of the TEXT sets of two
    derived document splits. Oracled: when the UNION of the two text
    sets has fewer than k=4096 distinct values the sketches provably
    degenerate to the exact hash sets, and the driver's sf0.01 corpus
    has 500 distinct texts total — pytest carries the
    approximate-regime error bounds."""
    from paperchase_crawler_ray.ops.sketch import approx_overlap
    docs = _rp(sf, "documents", columns=["doc_id", "text"])

    def split(mod: int):
        def f(b: pa.Table) -> pa.Table:
            k = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(k % mod == 0)).select(["text"])
        return f

    a = docs.map_batches(split(2), batch_format="pyarrow")
    b = docs.map_batches(split(3), batch_format="pyarrow")
    return approx_overlap(a, "text", b, k=4096).select_columns(
        ["distinct_a", "distinct_b", "distinct_union",
         "distinct_intersection"])


def _q_grouped_approx_distinct(sf: str):
    """Per-group approximate COUNT(DISTINCT) — HyperLogLog registers
    per (block, group), ONE fixed-size-row keyed exchange, co-located
    byte-max merge (rows-only: approximate by design; pytest pins the
    p=12 error band vs exact and cross-partitioning determinism). The
    shape that replaces a corpus-wide shuffle when a 10^10-row table
    needs per-domain distinct users."""
    from paperchase_crawler_ray.ops.sketch import approx_distinct_by
    ev = _rp(sf, "events", columns=["event_type", "user_id"])
    return approx_distinct_by(ev, "event_type", "user_id", p=12) \
        .sort("event_type")


def _q_grouped_approx_quantiles(sf: str):
    """Per-group histogram quantile sketch (rows-only: approximate by
    design; pytest pins the per-group one-bin error bound vs the exact
    discrete quantile plus cross-partitioning determinism). Sparse
    (group, bin, count) combiner rows are the ONLY exchange — the
    shape that replaces a corpus sort when a 10^10-row table needs
    per-domain latency/price percentiles."""
    from paperchase_crawler_ray.ops.sketch import approx_quantiles_by
    li = _rp(sf, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    return approx_quantiles_by(li, "l_returnflag", "l_extendedprice",
                               ps=(0.25, 0.5, 0.75, 0.95), nbins=4096) \
        .sort(["l_returnflag", "p"])


def _q_dsir_select(sf: str):
    """DSIR data selection (Xie et al. 2023): sample 100 documents
    from the full corpus with probability proportional to the hashed
    n-gram importance ratio against the English subset as the target
    distribution (rows-only: the log-weights are float by design;
    pytest pins exact twin equality and parallelism invariance). Two
    fixed-size bucket-vector reduces + a stateless scoring map + one
    pruned top-k exchange — no driver row pass at any corpus size."""
    from paperchase_crawler_ray.ops.textstats import dsir_select
    docs = _rp(sf, "documents", columns=["doc_id", "text", "lang"])
    target = docs.filter(expr="lang == 'en'")
    sel = dsir_select(docs, target, k=100, id_col="doc_id",
                      text_col="text", buckets=4096)
    return sel.select_columns(["doc_id", "lang", "dsir_logw"]) \
        .sort("doc_id")


def _q_pricing_summary(sf: str):
    """TPC-H Q1 shape: the canonical pricing-summary scan-aggregate.
    Every measure is an exact integer (qty; cents; 10^-4 disc-price
    units; 10^-6 charge units) so the distributed Sum is order-
    insensitive and bit-matches DuckDB. ONE column-pruned scan, per-row
    vectorized measures, a 2-key groupby over a handful of groups.
    (At 10^10-row scale the 10^-6 charge unit would move to 10^-2 to
    stay inside int64 — the unit is a parameter, the shape is not.)"""
    from ray.data.aggregate import Count, Sum
    li = _rp(sf, "lineitem", columns=[
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate"])
    cutoff = pd.Timestamp("1999-01-01").value // 1000

    def measures(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(_ts_us_col(b.column("l_shipdate")),
                             pa.scalar(cutoff, pa.int64())))
        price_c = np.rint(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        disc_c = np.rint(b.column("l_discount").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        tax_c = np.rint(b.column("l_tax").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        disc4 = price_c * (100 - disc_c)
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "qty": pc.cast(b.column("l_quantity"), pa.int64()),
            "price_c": pa.array(price_c),
            "disc4": pa.array(disc4),
            "charge6": pa.array(disc4 * (100 + tax_c))})

    agg = li.map_batches(measures, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("price_c", alias_name="sum_base_c"),
            Sum("disc4", alias_name="sum_disc_c4"),
            Sum("charge6", alias_name="sum_charge_c6"),
            Count(alias_name="n"))

    def finish(b: pa.Table) -> pa.Table:
        for c in ("sum_qty", "sum_base_c", "sum_disc_c4",
                  "sum_charge_c6", "n"):
            b = b.set_column(b.column_names.index(c), c,
                             pc.cast(b.column(c), pa.int64()))
        return b

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_min_cost_supplier(sf: str):
    """TPC-H Q2 shape (partsupp stood in by the lineitem part-supplier
    plane; supply cost = MIN line price in cents): for every qualifying
    part (LARGE, size >= 25), the EUROPE supplier(s) achieving the
    part's minimum cost — the correlated-MIN-subquery shape. Dimension
    chains (supplier|><|nation|><|region, part filter) broadcast; the
    fact scan is semi-filtered map-side; ONE keyed exchange builds the
    (part, supplier) cost plane and the per-part MIN re-attaches with a
    second small keyed join (cost-plane-sized, partsupp-scale)."""
    from ray.data.aggregate import Min

    from paperchase_crawler_ray.ops.relational import (
        broadcast_lookup_join, broadcast_semi_join, cap_join_partitions)
    r = _rp(sf, "region", columns=["r_regionkey", "r_name"]) \
        .filter(expr="r_name == 'EUROPE'")
    n = _rp(sf, "nation", columns=["n_nationkey", "n_regionkey"])
    n_eu = broadcast_semi_join(n, "n_regionkey", r, "r_regionkey")
    s = _rp(sf, "supplier", columns=["s_suppkey", "s_name",
                                     "s_nationkey"])
    s_eu = broadcast_semi_join(s, "s_nationkey", n_eu, "n_nationkey")
    p = _rp(sf, "part", columns=["p_partkey", "p_type", "p_size"])

    def pfilter(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(b.column("p_type"), pa.scalar("LARGE")),
                       pc.greater_equal(b.column("p_size"),
                                        pa.scalar(25, pa.int32())))
        return b.filter(keep).select(["p_partkey"])

    pe = p.map_batches(pfilter, batch_format="pyarrow")
    li = _rp(sf, "lineitem", columns=["l_partkey", "l_suppkey",
                                      "l_extendedprice"])
    li = broadcast_semi_join(li, "l_partkey", pe, "p_partkey")
    li = broadcast_semi_join(li, "l_suppkey", s_eu, "s_suppkey")

    def price(b: pa.Table) -> pa.Table:
        c = np.rint(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"l_partkey": b.column("l_partkey"),
                         "l_suppkey": b.column("l_suppkey"),
                         "price_c": pa.array(c)})

    cost = li.map_batches(price, batch_format="pyarrow") \
        .groupby(["l_partkey", "l_suppkey"]).aggregate(
            Min("price_c", alias_name="cost_c"))
    minp = cost.groupby("l_partkey").aggregate(
        Min("cost_c", alias_name="min_c"))
    j = cost.join(minp, join_type="inner",
                  num_partitions=cap_join_partitions(8),
                  on=("l_partkey",))
    j = j.filter(expr="cost_c == min_c")
    j = broadcast_lookup_join(j, "l_suppkey", s_eu, "s_suppkey",
                              ["s_name"])

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": b.column("l_partkey"),
            "s_name": b.column("s_name"),
            "cost_c": pc.cast(b.column("cost_c"), pa.int64())})

    return j.map_batches(finish, batch_format="pyarrow")


def _q_part_promotion(sf: str):
    """TPC-H Q20 shape (ps_availqty stood in by the deterministic
    p_size): suppliers whose 1997 shipments of a 'bolt' part stayed
    under twice its available quantity — the nested
    EXISTS-over-aggregate shape, with the qualifying-part count kept
    per supplier so the value hash discriminates (the bare existential
    saturates at small SF). The part plane broadcasts (semi filter +
    availqty lookup); the fact scan takes ONE keyed exchange for the
    (part, supplier) quantity rollup; the per-supplier count rides the
    already-distinct rollup rows."""
    from ray.data.aggregate import Count, Sum

    from paperchase_crawler_ray.ops.relational import (
        broadcast_lookup_join, broadcast_semi_join)
    p = _rp(sf, "part", columns=["p_partkey", "p_name", "p_size"])

    def pfilter(b: pa.Table) -> pa.Table:
        t = b.filter(pc.match_substring(b.column("p_name"), "bolt"))
        availq2 = pc.multiply(pc.cast(t.column("p_size"), pa.int64()),
                              pa.scalar(2, pa.int64()))
        return pa.table({"p_partkey": t.column("p_partkey"),
                         "availq2": availq2})

    pe = p.map_batches(pfilter, batch_format="pyarrow")
    li = _rp(sf, "lineitem", columns=["l_partkey", "l_suppkey",
                                      "l_quantity", "l_shipdate"])
    lo = pd.Timestamp("1997-01-01").value // 1000
    hi = pd.Timestamp("1998-01-01").value // 1000

    def window(b: pa.Table) -> pa.Table:
        d = _ts_us_col(b.column("l_shipdate"))
        b = b.filter(pc.and_(
            pc.greater_equal(d, pa.scalar(lo, pa.int64())),
            pc.less(d, pa.scalar(hi, pa.int64()))))
        return pa.table({"l_partkey": b.column("l_partkey"),
                         "l_suppkey": b.column("l_suppkey"),
                         "qty": pc.cast(b.column("l_quantity"),
                                        pa.int64())})

    li = broadcast_semi_join(li, "l_partkey", pe, "p_partkey") \
        .map_batches(window, batch_format="pyarrow")
    sold = li.groupby(["l_partkey", "l_suppkey"]).aggregate(
        Sum("qty", alias_name="sold"))
    sold = broadcast_lookup_join(sold, "l_partkey", pe, "p_partkey",
                                 ["availq2"])

    def qualify(b: pa.Table) -> pa.Table:
        keep = pc.less(pc.cast(b.column("sold"), pa.int64()),
                       b.column("availq2"))
        return b.filter(keep).select(["l_suppkey"])

    # rollup rows are already distinct (l_partkey, l_suppkey) pairs, so
    # the qualifying-part count is a plain per-supplier Count
    supp = sold.map_batches(qualify, batch_format="pyarrow") \
        .groupby("l_suppkey").aggregate(Count(alias_name="n_parts"))
    s = _rp(sf, "supplier", columns=["s_suppkey", "s_name"])
    out = broadcast_lookup_join(supp, "l_suppkey", s, "s_suppkey",
                                ["s_name"])
    return out.map_batches(
        lambda b: pa.table({"s_suppkey": b.column("l_suppkey"),
                            "s_name": b.column("s_name"),
                            "n_parts": pc.cast(b.column("n_parts"),
                                               pa.int64())}),
        batch_format="pyarrow")


def _q_table_changes(sf: str):
    """Change-data-feed over the versioned table (rows-only: lifecycle
    op; pytest carries the replay-invariant golden): snapshot F ->
    upsert + append + delete inside the window -> read_table_changes
    emits the catch-up changelog (insert rows + retract keys) a
    downstream incremental consumer applies instead of rescanning.
    Deterministic: fixture rows + fixed key split."""
    import tempfile
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.ops import table_format as T
    rows = make_image_rows(60)
    root = tempfile.mkdtemp(prefix="pc_vt_cdc_")
    F = T.append_table(ray.data.from_arrow(rows.slice(0, 40)), root)
    T.upsert_table(ray.data.from_arrow(rows.slice(20, 20)), root)
    T.append_table(ray.data.from_arrow(rows.slice(40, 20)), root)
    dead = [i for k, i in enumerate(
        rows.column("image_id").to_pylist()) if k % 10 == 0]
    T.delete_where_keys(root, dead)
    ch = T.read_table_changes(root, F)
    ins = ch["appended"].select_columns(["image_id"]).map_batches(
        lambda b: b.append_column("change",
                                  pa.array(["insert"] * b.num_rows)),
        batch_format="pyarrow")
    dels = ch["deleted_keys"].map_batches(
        lambda b: pa.table({"image_id": b.column("key"),
                            "change": pa.array(["delete"] * b.num_rows)}),
        batch_format="pyarrow")
    return ins.union(dels).sort(["image_id", "change"])


def _q_incremental_dedup(sf: str):
    """Incremental ingest dedup: new shard minus documents whose TEXT
    already exists in the prior corpus (derived split: doc_id%3==0 is
    'already ingested') — the size-switched anti_join on a STRING key,
    the shape every nightly ingest runs against yesterday's index."""
    from paperchase_crawler_ray.ops.relational import anti_join
    docs = _rp(sf, "documents", columns=["doc_id", "text"])

    def prior(b: pa.Table) -> pa.Table:
        k = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(k % 3 == 0))

    def fresh(b: pa.Table) -> pa.Table:
        k = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(k % 3 != 0))

    new = docs.map_batches(fresh, batch_format="pyarrow")
    old = docs.map_batches(prior, batch_format="pyarrow")
    return anti_join(new, "text", old, "text") \
        .select_columns(["doc_id", "text"])


def _q_group_sample(sf: str):
    """Deterministic per-class sample (eval-set carve-out): k=100 rows
    per event_type selected by md5 order — the same rows on any
    cluster/partitioning/run (row-local hashing), computed on the
    grouped_topk two-level prune (never a global sort), and the
    SELECTION itself is SQL-auditable via the md5 + ROW_NUMBER twin."""
    import hashlib

    from paperchase_crawler_ray.ops.relational import grouped_topk
    ev = _rp(sf, "events", columns=["event_id", "event_type"])

    def key(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("event_id"), pa.string()).to_pylist()
        pos = np.array([int.from_bytes(
            hashlib.md5(("s:" + k).encode()).digest()[:8], "big")
            for k in ids], np.uint64)
        return batch.append_column("_pos", pa.array(pos, pa.uint64()))

    out = grouped_topk(ev.map_batches(key, batch_format="pyarrow"),
                       "event_type", "_pos", 100, descending=False,
                       tie_col="event_id")
    return out.select_columns(["event_id", "event_type"])


def _q_paragraph_dedup(sf: str):
    """Corpus-wide exact paragraph dedup (RefinedWeb/Gopher line-dedup
    shape): keep the first occurrence of each non-empty paragraph,
    reassemble surviving paragraphs per document. Winner plane =
    exact_dedup on (hash64, para); reassembly = the stitched
    grouped_string_agg — exact string output, fully SQL-oracled."""
    from paperchase_crawler_ray.ops.textstats import paragraph_dedup
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return paragraph_dedup(docs).select_columns(["doc_id", "clean_text"])


def _q_gopher_filter(sf: str):
    """Gopher-rule quality components + combined pass flag, every field
    an exact BIGINT (ratios as integer cross-multiplications) so the
    DuckDB twin value-hashes bit-for-bit."""
    from paperchase_crawler_ray.ops.textstats import gopher_stats
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return gopher_stats(docs).select_columns(
        ["doc_id", "n_words", "sum_word_len", "n_alpha_words",
         "n_symbols", "n_lines", "n_bullet_lines", "n_ellipsis_lines",
         "n_stop_distinct", "pass_gopher"])


def _q_c4_filter(sf: str):
    """C4-rule components (Raffel et al. 2020 §2.2) as exact integers
    plus the combined pass flag — the second classic heuristic cleaner
    next to q_gopher_filter, same SQL-twin design."""
    from paperchase_crawler_ray.ops.textstats import c4_stats
    docs = _rp(sf, "documents", columns=["doc_id", "text"])
    return c4_stats(docs).select_columns(
        ["doc_id", "n_lines", "n_kept_lines", "n_sentences",
         "has_lorem", "has_brace", "pass_c4"])


def _q_keep_best(sf: str):
    """Canonical-document selection: ONE winner per exact-duplicate
    cluster, chosen by QUALITY (longest doc wins, doc_id breaks ties)
    rather than first occurrence — the RefinedWeb/FineWeb 'keep the
    best copy' dedup policy. Pure composition: fingerprint -> the
    combiner-shuffled exact_dedup with a score order."""
    from paperchase_crawler_ray.ops.relational import exact_dedup
    from paperchase_crawler_ray.ops.textstats import fingerprint_batch
    docs = _rp(sf, "documents",
               columns=["doc_id", "text", "lang", "n_chars"])
    hashed = docs.map_batches(fingerprint_batch, batch_format="pyarrow")
    out = exact_dedup(hashed, ["text_hash"],
                      [("n_chars", True), ("doc_id", False)])
    return out.select_columns(["doc_id", "lang", "n_chars"])


def _q_jsonl_roundtrip(sf: str):
    """Source-format breadth: documents -> task-parallel JSONL sink ->
    streaming JSONL source -> the full table. The oracle is the
    original parquet — a value-hash match proves every int64/string
    survives the JSON hop bit-exactly."""
    from paperchase_crawler_ray.sources import read_jsonl, write_jsonl
    tag = _cache_tag(sf, ("documents",))
    out = f"/tmp/pc_q_cache/{tag}/jsonl"
    marker = f"{out}_DONE"
    if not os.path.exists(marker):
        write_jsonl(_rp(sf, "documents"), out)
        with open(marker, "w") as f:
            f.write("ok\n")
    return read_jsonl(out).select_columns(
        ["doc_id", "text", "lang", "source", "n_chars"])


def _q_ipc_roundtrip(sf: str):
    """Arrow IPC (Feather v2) sink + source roundtrip over orders —
    including the timestamp column, surfaced as exact epoch
    microseconds. IPC is the bit-exact Arrow interchange format; the
    parquet original is the oracle."""
    from paperchase_crawler_ray.sources import read_arrow_ipc, \
        write_arrow_ipc
    tag = _cache_tag(sf, ("orders",))
    out = f"/tmp/pc_q_cache/{tag}/ipc"
    marker = f"{out}_DONE"
    if not os.path.exists(marker):
        write_arrow_ipc(
            _rp(sf, "orders",
                columns=["o_orderkey", "o_custkey", "o_orderstatus",
                         "o_orderpriority", "o_orderdate"]), out)
        with open(marker, "w") as f:
            f.write("ok\n")

    def us(b: pa.Table) -> pa.Table:
        od = _ts_us_col(b.column("o_orderdate"))
        return b.drop_columns(["o_orderdate"]).append_column("od_us", od)

    return read_arrow_ipc(out).map_batches(us, batch_format="pyarrow")


def _q_csv_roundtrip(sf: str):
    """CSV sink + source roundtrip over customer's int/string columns
    (RFC-4180 quoting covers embedded commas/quotes/newlines in
    comments). The parquet original is the oracle — a value-hash match
    proves the text hop is exact."""
    from paperchase_crawler_ray.sources import read_csv, write_csv
    cols = ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]
    tag = _cache_tag(sf, ("customer",))
    out = f"/tmp/pc_q_cache/{tag}/csv"
    marker = f"{out}_DONE"
    if not os.path.exists(marker):
        write_csv(_rp(sf, "customer", columns=cols), out)
        with open(marker, "w") as f:
            f.write("ok\n")
    return read_csv(out).select_columns(cols)


def _q_webdataset_roundtrip(sf: str):
    """WebDataset-style tar-shard sink + source (the public image+
    caption training-corpus convention: per-sample <key>.txt /
    <key>.json members grouped in tar shards, one shard per block,
    written task-parallel). The parquet original is the oracle — a
    value-hash match proves every text byte and metadata field
    survives the tar hop."""
    from paperchase_crawler_ray.sources import (read_webdataset,
                                                write_webdataset)
    tag = _cache_tag(sf, ("documents",))
    out = f"/tmp/pc_q_cache/{tag}/wds"
    marker = f"{out}_DONE"
    if not os.path.exists(marker):
        write_webdataset(_rp(sf, "documents"), out, key_col="doc_id",
                         text_col="text",
                         meta_cols=["lang", "source", "n_chars"])
        with open(marker, "w") as f:
            f.write("ok\n")

    def restore(b: pa.Table) -> pa.Table:
        did = pc.cast(b.column("key"), pa.int64())
        return b.drop_columns(["key"]).append_column("doc_id", did)

    return read_webdataset(out).map_batches(
        restore, batch_format="pyarrow").select_columns(
        ["doc_id", "text", "lang", "source", "n_chars"])


def _q_ccnet_buckets(sf: str):
    """The CCNet head/middle/tail split (Wenzek et al. 2020): score
    every doc with the corpus Kneser-Ney LM, then cut each LANGUAGE
    into three equal-count perplexity terciles (best log-prob = head).
    Pure composition: kn scoring -> grouped_ntile (SQL NTILE rule).
    Rows-only: float log-probs by design; pytest pins the naive-twin
    bucket assignment exactly."""
    from paperchase_crawler_ray.ops.relational import grouped_ntile
    from paperchase_crawler_ray.ops.textstats import (kneser_ney_fit,
                                                      kneser_ney_score)
    docs = _rp(sf, "documents", columns=["doc_id", "text", "lang"])
    model = kneser_ney_fit(docs)
    scored = kneser_ney_score(docs, model)
    tiled = grouped_ntile(scored, "lang",
                          [("kn_logprob", True), ("doc_id", False)], 3,
                          out_col="tile")

    def label(b: pa.Table) -> pa.Table:
        t = b.column("tile").to_numpy(zero_copy_only=False)
        lab = np.array(["head", "middle", "tail"])[t - 1]
        return pa.table({"doc_id": b.column("doc_id"),
                         "lang": b.column("lang"),
                         "bucket": pa.array(lab, pa.string())})

    return tiled.map_batches(label, batch_format="pyarrow") \
        .sort("doc_id")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "q_host_counts": _q_host_counts,
        "q_exact_dedup": _q_exact_dedup,
        "q_seen_anti_join": _q_seen_anti_join,
        "q_priority_rebalance": _q_priority_rebalance,
        "q_topk": _q_topk,
        "q_scope_semi": _q_scope_semi,
        "q_equi_join": _q_equi_join,
        "q_anti_join_keyed": _q_anti_join_keyed,
        "q_semi_join_keyed": _q_semi_join_keyed,
        "q_grouped_topk": _q_grouped_topk,
        "q_lookup_join": _q_lookup_join,
        "q_rolling_max": _q_rolling_max,
        "q_range_join": _q_range_join,
        "q_nation_qty": _q_nation_qty,
        "q_stratified_sample": _q_stratified_sample,
        "q_histogram": _q_histogram,
        "q_rollup": _q_rollup,
        "q_bigram": _q_bigram,
        "q_doc_pack": _q_doc_pack,
        "q_group_rank": _q_group_rank,
        "q_pivot": _q_pivot,
        "q_tumbling": _q_tumbling,
        "q_hopping": _q_hopping,
        "q_grouping_sets": _q_grouping_sets,
        "q_normalize": _q_normalize,
        "q_rolling_7d": _q_rolling_7d,
        "q_group_max_rows": _q_group_max_rows,
        "q_hash_split": _q_hash_split,
        "q_sample_hash": _q_sample_hash,
        "q_cohort_retention": _q_cohort_retention,
        "q_top_orders": _q_top_orders,
        "q_returned_qty": _q_returned_qty,
        "q_expectations": _q_expectations,
        "q_pruned_scan": _q_pruned_scan,
        "q_bucket_join": _q_bucket_join,
        "q_running_sum": _q_running_sum,
        "q_moving_sum": _q_moving_sum,
        "q_pagerank": _q_pagerank,
        "q_components": _q_components,
        "q_ntile": _q_ntile,
        "q_first_last": _q_first_last,
        "q_string_agg": _q_string_agg,
        "q_dense_rank": _q_dense_rank,
        "q_pct_rank": _q_pct_rank,
        "q_intersect": _q_intersect,
        "q_except": _q_except,
        "q_mode": _q_mode,
        "q_cube": _q_cube,
        "q_funnel": _q_funnel,
        "q_inverted_index": _q_inverted_index,
        "q_salted_join": _q_salted_join,
        "q_repetition": _q_repetition,
        "q_mixture": _q_mixture,
        "q_lm_score": _q_lm_score,
        "q_prep_pipeline": _q_prep_pipeline,
        "q_caption_align": _q_caption_align,
        "q_weighted_sample": _q_weighted_sample,
        "q_bpe": _q_bpe,
        "q_full_join": _q_full_join,
        "q_outliers": _q_outliers,
        "q_resample": _q_resample,
        "q_session_ids": _q_session_ids,
        "q_pq_ann": _q_pq_ann,
        "q_ivfpq_ann": _q_ivfpq_ann,
        "q_image_patches": _q_image_patches,
        "q_image_preprocess": _q_image_preprocess,
        "q_unpivot": _q_unpivot,
        "q_cross_join": _q_cross_join,
        "q_regression": _q_regression,
        "q_extract": _q_extract,
        "q_event_gap": _q_event_gap,
        "q_distinct_per_group": _q_distinct_per_group,
        "q_left_join": _q_left_join,
        "q_chunk": _q_chunk,
        "q_decontaminate": _q_decontaminate,
        "q_approx_distinct": _q_approx_distinct,
        "q_image_quality": _q_image_quality,
        "q_image_ann": _q_image_ann,
        "q_image_neardup": _q_image_neardup,
        "q_tfidf": _q_tfidf,
        "q_dup_clusters": _q_dup_clusters,
        "q_union_budget": _q_union_budget,
        "q_window_wave": _q_window_wave,
        "q_props_json": _q_props_json,
        "q_distinct": _q_distinct,
        "q_distinct_pairs": _q_distinct_pairs,
        "q_partial_agg": _q_partial_agg,
        "q_agg_stats": _q_agg_stats,
        "q_minmax": _q_minmax,
        "q_grouped_median": _q_grouped_median,
        "q_sample": _q_sample,
        "q_word_count": _q_word_count,
        "q_redact": _q_redact,
        "q_sessionize": _q_sessionize,
        "q_asof_join": _q_asof_join,
        "q_embedding_norm": _q_embedding_norm,
        "q_dim_stats": _q_dim_stats,
        "q_above_avg": _q_above_avg,
        "q_priority_class": _q_priority_class,
        "q_exists_orders": _q_exists_orders,
        "q_big_orders": _q_big_orders,
        "q_promo_share": _q_promo_share,
        "q_important_nations": _q_important_nations,
        "q_volume_shipping": _q_volume_shipping,
        "q_custdist": _q_custdist,
        "q_supplier_parts": _q_supplier_parts,
        "q_small_qty_rev": _q_small_qty_rev,
        "q_disjunctive_rev": _q_disjunctive_rev,
        "q_late_only_supplier": _q_late_only_supplier,
        "q_dormant_customers": _q_dormant_customers,
        "q_text_hash_dedup": _q_text_hash_dedup,
        "q_token_count": _q_token_count,
        "q_length_buckets": _q_length_buckets,
        "q_quality_stats": _q_quality_stats,
        "q_minhash_dedup": _q_minhash_dedup,
        "q_simhash_dedup": _q_simhash_dedup,
        "q_ngram_dedup": _q_ngram_dedup,
        "q_embed_neardup": _q_embed_neardup,
        "q_semdedup": _q_semdedup,
        "q_ann_topk": _q_ann_topk,
        "q_ivf_ann": _q_ivf_ann,
        "q_langid": _q_langid,
        "q_pii_stats": _q_pii_stats,
        "q_skyline": _q_skyline,
        "q_bloom_semi": _q_bloom_semi,
        "q_heavy_hitters": _q_heavy_hitters,
        "q_corr_stats": _q_corr_stats,
        "q_grouped_quantiles": _q_grouped_quantiles,
        "q_kth_value": _q_kth_value,
        "q_equidepth": _q_equidepth,
        "q_snapshot_diff": _q_snapshot_diff,
        "q_lev_join": _q_lev_join,
        "q_interval_lookup": _q_interval_lookup,
        "q_image_shard": _q_image_shard,
        "q_image_prep": _q_image_prep,
        "q_audio_features": _q_audio_features,
        "q_video_frames": _q_video_frames,
        "q_video_keyframes": _q_video_keyframes,
        "q_quality_classifier": _q_quality_classifier,
        "q_train_shards": _q_train_shards,
        "q_kn_score": _q_kn_score,
        "q_budget_select": _q_budget_select,
        "q_paragraph_dedup": _q_paragraph_dedup,
        "q_gopher_filter": _q_gopher_filter,
        "q_c4_filter": _q_c4_filter,
        "q_keep_best": _q_keep_best,
        "q_jsonl_roundtrip": _q_jsonl_roundtrip,
        "q_ipc_roundtrip": _q_ipc_roundtrip,
        "q_webdataset_roundtrip": _q_webdataset_roundtrip,
        "q_ccnet_buckets": _q_ccnet_buckets,
        "q_group_sample": _q_group_sample,
        "q_dup_spans": _q_dup_spans,
        "q_clean_spans": _q_clean_spans,
        "q_grouped_distinct": _q_grouped_distinct,
        "q_local_supplier_qty": _q_local_supplier_qty,
        "q_lead": _q_lead,
        "q_pct_cont": _q_pct_cont,
        "q_mad": _q_mad,
        "q_grouped_pct_cont": _q_grouped_pct_cont,
        "q_grouped_mad": _q_grouped_mad,
        "q_approx_quantiles": _q_approx_quantiles,
        "q_rank_ties": _q_rank_ties,
        "q_rolling_distinct": _q_rolling_distinct,
        "q_cooccurrence": _q_cooccurrence,
        "q_filtered_revenue": _q_filtered_revenue,
        "q_top_supplier": _q_top_supplier,
        "q_market_share": _q_market_share,
        "q_product_profit": _q_product_profit,
        "q_versioned_table": _q_versioned_table,
        "q_upsert_table": _q_upsert_table,
        "q_table_changes": _q_table_changes,
        "q_grouped_approx_distinct": _q_grouped_approx_distinct,
        "q_grouped_approx_quantiles": _q_grouped_approx_quantiles,
        "q_dsir_select": _q_dsir_select,
        "q_corpus_overlap": _q_corpus_overlap,
        "q_grouped_heavy_hitters": _q_grouped_heavy_hitters,
        "q_pricing_summary": _q_pricing_summary,
        "q_min_cost_supplier": _q_min_cost_supplier,
        "q_part_promotion": _q_part_promotion,
        "q_incremental_dedup": _q_incremental_dedup,
        "q_pca": _q_pca,
        "q_winsorize": _q_winsorize,
        "q_table_checksum": _q_table_checksum,
        "q_zorder": _q_zorder,
        "q_dup_ngrams": _q_dup_ngrams,
        "q_jaccard_join": _q_jaccard_join,
        "q_fingerprint": _q_fingerprint,
        "q_quality_score": _q_quality_score,
        "q_value_stats": _q_value_stats,
        "q_image_augment": _q_image_augment,
        "q_image_features": _q_image_features,
        "q_image_transcode": _q_image_transcode,
        "q_curate": _q_curate,
        "q_bfs": _q_bfs,
        "q_audio_vad": _q_audio_vad,
        "q_bm25": _q_bm25,
        "q_triangles": _q_triangles,
        "q_transitions": _q_transitions,
        "q_sssp": _q_sssp,
        "q_csv_roundtrip": _q_csv_roundtrip,
        "q_core": _q_core,
        "q_spectrogram": _q_spectrogram,
        "q_trustrank": _q_trustrank,
        "q_doc_clusters": _q_doc_clusters,
    }


_STOP_SQL = "('the','a','of','and','to','in','is','it')"


def _langid_sql() -> str:
    """SQL twin of `language_id_batch`: marker densities share the
    per-doc denominator, so the argmax reduces to integer
    substring-count sums (replace-length trick); zh via CJK codepoint
    ratio; ties fall to the alphabetically first language, matching the
    op's sorted-language scan."""
    def s(markers):
        return "+".join(f"(length(low)-length(replace(low,'{m}','')))"
                        for m in markers)
    return (
        "WITH L AS (SELECT doc_id, lower(text) AS low FROM documents), "
        "N AS (SELECT doc_id, low, length(low) AS n, "
        f"{s(('der', 'und', 'sch', 'ein', 'ch'))} AS s_de, "
        f"{s(('the', 'and', 'ing', 'ion', 'th'))} AS s_en, "
        f"{s(('los', 'que', 'cion', 'ado', 'll'))} AS s_es, "
        f"{s(('les', 'ent', 'que', 'eau', 'ou'))} AS s_fr, "
        "length(regexp_replace(low, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) "
        "AS cjk FROM L) SELECT doc_id, CASE "
        "WHEN TRIM(low) = '' THEN 'und' "
        "WHEN 10*cjk > n THEN 'zh' "
        "WHEN GREATEST(s_de,s_en,s_es,s_fr) = 0 THEN 'und' "
        "WHEN s_de = GREATEST(s_de,s_en,s_es,s_fr) THEN 'de' "
        "WHEN s_en = GREATEST(s_de,s_en,s_es,s_fr) THEN 'en' "
        "WHEN s_es = GREATEST(s_de,s_en,s_es,s_fr) THEN 'es' "
        "ELSE 'fr' END AS lang_pred FROM N")


def _pii_sql() -> str:
    """SQL twin of pii_stats: same RE2 patterns, DuckDB's
    regexp_extract_all counts the same non-overlapping matches as
    Arrow's count_substring_regex (both RE2)."""
    from paperchase_crawler_ray.ops.textstats import PII_PATTERNS
    cols = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{rx}')) AS BIGINT) AS {name}"
        for name, rx in PII_PATTERNS.items())
    total = " + ".join(
        f"len(regexp_extract_all(text, '{rx}'))"
        for rx in PII_PATTERNS.values())
    return (f"SELECT doc_id, {cols}, ({total}) > 0 AS pii_flag "
            "FROM documents")


def oracle_sql() -> dict[str, str]:
    from paperchase_crawler_ray.ops.layout import zorder_sql
    return {
        "q_host_counts":
            "SELECT source, COUNT(*) AS c FROM documents GROUP BY source",
        "q_exact_dedup":
            "SELECT event_id, user_id, event_type, ts, value FROM events "
            "QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type "
            "ORDER BY ts, event_id) = 1",
        "q_seen_anti_join":
            "SELECT event_id, user_id FROM events e WHERE NOT EXISTS "
            "(SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id "
            "AND c.c_mktsegment = 'BUILDING')",
        "q_priority_rebalance":
            "SELECT l_suppkey, SUM(l_quantity) AS total_qty FROM lineitem "
            "GROUP BY l_suppkey ORDER BY total_qty DESC, l_suppkey",
        "q_topk":
            "SELECT o_custkey, COUNT(*) AS c FROM orders GROUP BY o_custkey "
            "ORDER BY c DESC, o_custkey LIMIT 10",
        "q_scope_semi":
            "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE "
            "o_custkey IN (SELECT c_custkey FROM customer "
            "WHERE c_mktsegment = 'BUILDING')",
        "q_equi_join":
            "SELECT n_name, COUNT(*) AS n_orders FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name",
        "q_anti_join_keyed":
            "SELECT event_id, user_id FROM events e WHERE NOT EXISTS "
            "(SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id "
            "AND c.c_mktsegment = 'BUILDING')",
        "q_semi_join_keyed":
            "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
            "WHERE o_custkey IN (SELECT c_custkey FROM customer "
            "WHERE c_mktsegment = 'BUILDING')",
        "q_grouped_topk":
            "SELECT event_id, event_type, value FROM events "
            "QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type "
            "ORDER BY value DESC, event_id) <= 3",
        "q_lookup_join":
            "SELECT c_mktsegment, COUNT(*) AS n_orders FROM orders "
            "JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment",
        "q_rolling_max":
            "SELECT event_id, user_id, MAX(value) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rolling_max "
            "FROM events",
        "q_range_join":
            "SELECT p.event_id AS purchase_id, c.event_id AS click_id "
            "FROM events p JOIN events c ON p.user_id = c.user_id "
            "AND p.event_type = 'purchase' AND c.event_type = 'click' "
            "AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 DAY",
        "q_nation_qty":
            "SELECT n_name, SUM(l_quantity) AS total_qty, "
            "COUNT(*) AS n_items FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name",
        "q_stratified_sample":
            "SELECT event_id, event_type FROM events WHERE event_id % "
            "(CASE event_type WHEN 'click' THEN 20 WHEN 'view' THEN 10 "
            "WHEN 'error' THEN 2 ELSE 1 END) = 0",
        "q_histogram":
            "SELECT event_type, CAST(FLOOR(value / 10) AS BIGINT) AS bin, "
            "COUNT(*) AS c FROM events GROUP BY event_type, bin",
        "q_rollup":
            "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag, "
            "COALESCE(l_linestatus, 'ALL') AS l_linestatus, "
            "SUM(l_quantity) AS sum_qty, "
            "CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem "
            "GROUP BY ROLLUP(l_returnflag, l_linestatus)",
        "q_doc_pack":
            "SELECT doc_id, n_tokens, "
            "CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens, "
            "COALESCE(CAST(SUM(n_tokens) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT)"
            f", 0) // {_PACK_CAP} AS bin "
            "FROM (SELECT doc_id, CAST(len(regexp_extract_all(text, "
            "'\\w+')) AS BIGINT) AS n_tokens FROM documents) "
            "WINDOW w AS (ORDER BY doc_id ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND CURRENT ROW)",
        "q_running_sum":
            "SELECT event_id, user_id, CAST(SUM(CAST(FLOOR(value) AS "
            "BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
            " AS running FROM events",
        "q_moving_sum":
            "SELECT event_id, user_id, CAST(SUM(CAST(FLOOR(value) AS "
            "BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT)"
            " AS win_sum FROM events",
        "q_ntile":
            "SELECT o_orderkey, o_custkey, CAST(NTILE(4) OVER (PARTITION "
            "BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS "
            "BIGINT) AS tile FROM orders",
        "q_first_last":
            "SELECT DISTINCT user_id, FIRST_VALUE(event_id) OVER w AS "
            "first_event, LAST_VALUE(event_id) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "UNBOUNDED FOLLOWING) AS last_event FROM events WINDOW w AS "
            "(PARTITION BY user_id ORDER BY ts, event_id)",
        "q_string_agg":
            "SELECT user_id, STRING_AGG(event_type, ',' ORDER BY ts, "
            "event_id) AS types FROM events GROUP BY user_id",
        "q_dense_rank":
            "SELECT event_id, user_id, CAST(DENSE_RANK() OVER (PARTITION "
            "BY user_id ORDER BY event_type) AS BIGINT) AS drnk "
            "FROM events",
        "q_pct_rank":
            "SELECT event_id, user_id, PERCENT_RANK() OVER w AS pct, "
            "CUME_DIST() OVER w AS cd FROM events WINDOW w AS (PARTITION "
            "BY user_id ORDER BY ts, event_id)",
        "q_intersect":
            "SELECT user_id AS k FROM events INTERSECT "
            "SELECT c_custkey AS k FROM customer",
        "q_except":
            "SELECT c_custkey AS k FROM customer EXCEPT "
            "SELECT user_id AS k FROM events",
        "q_mode":
            "SELECT user_id, mode_type FROM (SELECT user_id, event_type "
            "AS mode_type, ROW_NUMBER() OVER (PARTITION BY user_id ORDER "
            "BY COUNT(*) DESC, event_type) AS rn FROM events GROUP BY "
            "user_id, event_type) WHERE rn = 1",
        "q_cube":
            "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag, "
            "COALESCE(l_linestatus, 'ALL') AS l_linestatus, "
            "SUM(l_quantity) AS sum_qty, CAST(COUNT(*) AS BIGINT) AS "
            "n_rows FROM lineitem GROUP BY CUBE(l_returnflag, "
            "l_linestatus)",
        "q_grouping_sets":
            "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag, "
            "COALESCE(l_linestatus, 'ALL') AS l_linestatus, "
            "SUM(l_quantity) AS sum_qty, CAST(COUNT(*) AS BIGINT) AS "
            "n_rows FROM lineitem GROUP BY GROUPING SETS ("
            "(l_returnflag), (l_linestatus), "
            "(l_returnflag, l_linestatus))",
        "q_funnel":
            "SELECT CAST(SUM(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_view, CAST(SUM(CASE WHEN tv IS NOT NULL "
            "AND tc > tv THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click, "
            "CAST(SUM(CASE WHEN tv IS NOT NULL AND tc > tv AND tp > tc "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_full FROM (SELECT "
            "user_id, MIN(ts) FILTER (WHERE event_type = 'view') AS tv, "
            "MIN(ts) FILTER (WHERE event_type = 'click') AS tc, "
            "MIN(ts) FILTER (WHERE event_type = 'purchase') AS tp "
            "FROM events GROUP BY user_id)",
        "q_inverted_index":
            "SELECT word, STRING_AGG(CAST(doc_id AS VARCHAR), ',' ORDER "
            "BY doc_id) AS postings FROM (SELECT DISTINCT doc_id, "
            "unnest(regexp_extract_all(lower(text), '\\w+')) AS word "
            "FROM documents) GROUP BY word",
        "q_salted_join":
            "SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_orders FROM "
            "orders JOIN customer ON o_custkey = c_custkey JOIN nation "
            "ON c_nationkey = n_nationkey GROUP BY n_name",
        "q_repetition":
            # anchored on documents via LEFT JOIN so token-free docs
            # still emit their (0,0,0,0) row like the Ray op does
            "SELECT d.doc_id, CAST(COALESCE(g.n_tokens, 0) AS BIGINT) "
            "AS n_tokens, CAST(COALESCE(g.n_distinct, 0) AS BIGINT) AS "
            "n_distinct, CAST(COALESCE(g.top_count, 0) AS BIGINT) AS "
            "top_count, CAST(CASE WHEN COALESCE(g.n_distinct, 0) * 4 >="
            " COALESCE(g.n_tokens, 0) AND COALESCE(g.top_count, 0) * 2 "
            "<= COALESCE(g.n_tokens, 0) AND COALESCE(g.n_tokens, 0) > 0"
            " THEN 1 ELSE 0 END AS BIGINT) AS kept FROM documents d "
            "LEFT JOIN (SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS "
            "n_distinct, MAX(c) AS top_count FROM (SELECT doc_id, word,"
            " COUNT(*) AS c FROM (SELECT doc_id, unnest("
            "regexp_extract_all(lower(text), '\\w+')) AS word FROM "
            "documents) GROUP BY doc_id, word) GROUP BY doc_id) g "
            "ON d.doc_id = g.doc_id",
        "q_mixture":
            "SELECT doc_id, source, CAST(UNNEST(range(CAST(substr("
            "source, 4) AS BIGINT) % 4)) AS BIGINT) AS copy "
            "FROM documents",
        "q_pagerank":
            "WITH RECURSIVE e AS (SELECT 'u' || CAST(user_id AS VARCHAR)"
            " AS src, 't' || event_type AS dst FROM events), deg AS ("
            "SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY "
            "src), nodes AS (SELECT DISTINCT node FROM (SELECT src AS "
            "node FROM e UNION ALL SELECT dst FROM e)), pr(iter, node, "
            "score) AS (SELECT 0, node, CAST(1000000 AS BIGINT) FROM "
            "nodes UNION ALL SELECT p.iter + 1, p.node, COALESCE(("
            "SELECT SUM((p2.score * 850000 // 1000000) // deg.d) FROM "
            "pr p2 JOIN e ON e.src = p2.node JOIN deg ON deg.src = "
            "p2.node WHERE e.dst = p.node AND p2.iter = p.iter), 0) + "
            "150000 FROM pr p WHERE p.iter < 4) SELECT node, CAST(score "
            "AS BIGINT) AS score FROM pr WHERE iter = 4",
        "q_trustrank":
            "WITH RECURSIVE e AS (SELECT 'u' || CAST(user_id AS VARCHAR)"
            " AS src, 't' || event_type AS dst FROM events), deg AS ("
            "SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY "
            "src), nodes AS (SELECT DISTINCT node FROM (SELECT src AS "
            "node FROM e UNION ALL SELECT dst FROM e)), pr(iter, node, "
            "score) AS (SELECT 0, node, CAST(CASE WHEN node IN "
            "('tclick','tview') THEN 1000000 ELSE 0 END AS BIGINT) FROM"
            " nodes UNION ALL SELECT p.iter + 1, p.node, COALESCE(("
            "SELECT SUM((p2.score * 850000 // 1000000) // deg.d) FROM "
            "pr p2 JOIN e ON e.src = p2.node JOIN deg ON deg.src = "
            "p2.node WHERE e.dst = p.node AND p2.iter = p.iter), 0) + "
            "CASE WHEN p.node IN ('tclick','tview') THEN 150000 ELSE 0 "
            "END FROM pr p WHERE p.iter < 4) SELECT node, CAST(score "
            "AS BIGINT) AS score FROM pr WHERE iter = 4",
        "q_components":
            "WITH RECURSIVE und AS (SELECT 'u' || CAST(user_id AS "
            "VARCHAR) AS src, 't' || event_type AS dst FROM events UNION"
            " SELECT 't' || event_type, 'u' || CAST(user_id AS VARCHAR) "
            "FROM events), nodes AS (SELECT DISTINCT src AS node FROM "
            "und), reach(node, label) AS (SELECT node, node FROM nodes "
            "UNION SELECT u.dst, r.label FROM reach r JOIN und u ON "
            "u.src = r.node) SELECT node, MIN(label) AS component FROM "
            "reach GROUP BY node",
        "q_sssp":
            "WITH RECURSIVE e AS (SELECT src, dst, MIN(w) AS w FROM ("
            "SELECT user_id % 499 AS src, event_id % 499 AS dst, "
            "1 + (user_id + event_id) % 7 AS w FROM events) "
            "GROUP BY src, dst), reach(node, dist, hops) AS ("
            "SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0 "
            "UNION SELECT e.dst, r.dist + e.w, r.hops + 1 FROM reach r "
            "JOIN e ON e.src = r.node WHERE r.hops < 6) "
            "SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM reach "
            "GROUP BY node",
        "q_triangles":
            "WITH e0 AS (SELECT DISTINCT LEAST(user_id % 499, event_id "
            "% 499) AS u, GREATEST(user_id % 499, event_id % 499) AS v "
            "FROM events WHERE user_id % 499 <> event_id % 499), "
            "tri AS (SELECT a.u AS x, a.v AS y, b.v AS z FROM e0 a "
            "JOIN e0 b ON a.u = b.u AND a.v < b.v "
            "JOIN e0 c ON c.u = a.v AND c.v = b.v) "
            "SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM ("
            "SELECT x AS node FROM tri UNION ALL SELECT y FROM tri "
            "UNION ALL SELECT z FROM tri) GROUP BY node",
        "q_transitions":
            "SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS "
            "n FROM (SELECT event_type, LAG(event_type) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS prev_type "
            "FROM events) WHERE prev_type IS NOT NULL "
            "GROUP BY prev_type, event_type",
        "q_bfs":
            "WITH RECURSIVE und AS (SELECT 'u' || CAST(user_id AS "
            "VARCHAR) AS src, 't' || event_type AS dst FROM events "
            "UNION SELECT 't' || event_type, 'u' || CAST(user_id AS "
            "VARCHAR) FROM events), reach(node, dist) AS ("
            "SELECT 'tclick', 0 UNION SELECT u.dst, r.dist + 1 FROM "
            "reach r JOIN und u ON u.src = r.node WHERE r.dist < 20) "
            "SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM reach "
            "GROUP BY node",
        "q_session_ids":
            "SELECT event_id, user_id, CAST(SUM(new_s) OVER (PARTITION "
            "BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM ("
            "SELECT event_id, user_id, ts, CASE WHEN LAG(ts) OVER w IS "
            "NULL OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1 "
            "ELSE 0 END AS new_s FROM events WINDOW w AS (PARTITION BY "
            "user_id ORDER BY ts, event_id))",
        "q_unpivot":
            "SELECT l_orderkey, l_linenumber, metric, value FROM ("
            "SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, "
            "CAST(l_quantity AS DOUBLE) AS value FROM lineitem UNION ALL"
            " SELECT l_orderkey, l_linenumber, 'l_extendedprice', "
            "CAST(l_extendedprice AS DOUBLE) FROM lineitem UNION ALL "
            "SELECT l_orderkey, l_linenumber, 'l_discount', "
            "CAST(l_discount AS DOUBLE) FROM lineitem)",
        "q_cross_join":
            "SELECT r_name, n_name FROM region CROSS JOIN nation",
        "q_regression":
            "SELECT l_returnflag, CAST(COUNT(*) * SUM(x*y) - SUM(x) * "
            "SUM(y) AS BIGINT) AS slope_num, CAST(COUNT(*) * SUM(x*x) - "
            "SUM(x) * SUM(x) AS BIGINT) AS slope_den FROM (SELECT "
            "l_returnflag, CAST(l_quantity AS BIGINT) AS x, CAST(FLOOR("
            "l_extendedprice / 100.0) AS BIGINT) AS y FROM lineitem) "
            "GROUP BY l_returnflag",
        "q_extract":
            "SELECT c_custkey, CAST(regexp_extract(c_name, '#(\\d+)', 1)"
            " AS BIGINT) AS name_num FROM customer",
        "q_full_join":
            "SELECT COALESCE(e.user_id, c.c_custkey) AS k, "
            "CAST(COALESCE(e.n_events, 0) AS BIGINT) AS n_events, "
            "CAST(CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE 0 END "
            "AS BIGINT) AS in_building FROM (SELECT user_id, COUNT(*) "
            "AS n_events FROM events GROUP BY user_id) e FULL OUTER "
            "JOIN (SELECT c_custkey FROM customer WHERE c_mktsegment = "
            "'BUILDING') c ON e.user_id = c.c_custkey",
        "q_outliers":
            "WITH m AS (SELECT l_returnflag, quantile_disc(l_quantity, "
            "0.5) AS med FROM lineitem GROUP BY l_returnflag), d AS ("
            "SELECT l.l_returnflag, ABS(l.l_quantity - m.med) AS ad, "
            "m.med AS med FROM lineitem l JOIN m USING (l_returnflag)), "
            "s AS (SELECT l_returnflag, quantile_disc(ad, 0.5) AS mad "
            "FROM d GROUP BY l_returnflag) SELECT d.l_returnflag, "
            "MIN(d.med) AS med_qty, MIN(s.mad) AS mad_qty, CAST(SUM("
            "CASE WHEN 2.0 * d.ad > 3.0 * s.mad THEN 1 ELSE 0 END) AS "
            "BIGINT) AS n_outliers FROM d JOIN s USING (l_returnflag) "
            "GROUP BY d.l_returnflag",
        "q_resample":
            "WITH spans AS (SELECT user_id, date_trunc('hour', MIN(ts)) "
            "AS g0, date_trunc('hour', MAX(ts)) AS g1 FROM events GROUP "
            "BY user_id), grid AS (SELECT user_id, UNNEST("
            "generate_series(g0, g1, INTERVAL 1 HOUR)) AS gts FROM "
            "spans) SELECT g.user_id, g.gts, e.ts AS matched_ts FROM "
            "grid g ASOF LEFT JOIN events e ON g.user_id = e.user_id "
            "AND g.gts >= e.ts",
        "q_prep_pipeline":
            "WITH rep AS (SELECT doc_id, SUM(c) AS n, MAX(c) AS top "
            "FROM (SELECT doc_id, word, COUNT(*) AS c FROM (SELECT "
            "doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS "
            "word FROM documents) GROUP BY doc_id, word) GROUP BY "
            "doc_id), kept AS (SELECT d.doc_id, d.text FROM documents d "
            "JOIN rep USING(doc_id) WHERE rep.n >= 30 AND rep.top * 8 "
            "<= rep.n), dd AS (SELECT doc_id, text FROM kept QUALIFY "
            "ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1),"
            " toks AS (SELECT doc_id, regexp_extract_all(lower(text), "
            "'\\w+') AS t FROM dd), c AS (SELECT doc_id, t, len(t) AS n "
            "FROM toks WHERE len(t) > 0) SELECT doc_id, CAST(i - 1 AS "
            "BIGINT) AS chunk_id, CAST(len(t[(i-1)*48 + 1 : (i-1)*48 + "
            "64]) AS BIGINT) AS n_chunk_tokens FROM c, UNNEST("
            "generate_series(1, 1 + CAST(CEIL(GREATEST(n - 64, 0) / "
            "48.0) AS BIGINT))) AS u(i)",
        "q_event_gap":
            "SELECT event_id, user_id, CAST(epoch_us(ts) - epoch_us(prev)"
            " AS BIGINT) AS gap_us FROM (SELECT event_id, user_id, ts, "
            "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "AS prev FROM events) WHERE prev IS NOT NULL",
        "q_distinct_per_group":
            "SELECT l_returnflag, CAST(COUNT(DISTINCT l_suppkey) AS "
            "BIGINT) AS n_suppliers FROM lineitem GROUP BY l_returnflag",
        "q_left_join":
            "SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS "
            "n_orders FROM customer LEFT JOIN orders "
            "ON c_custkey = o_custkey GROUP BY c_custkey",
        "q_chunk":
            "WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), "
            "'\\w+') AS t FROM documents), "
            "c AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0) "
            "SELECT doc_id, CAST(i - 1 AS BIGINT) AS chunk_id, "
            "CAST(len(t[(i-1)*48 + 1 : (i-1)*48 + 64]) AS BIGINT) "
            "AS n_chunk_tokens, "
            "array_to_string(t[(i-1)*48 + 1 : (i-1)*48 + 64], ' ') "
            "AS chunk_text "
            "FROM c, UNNEST(generate_series(1, 1 + CAST(CEIL(GREATEST("
            "n - 64, 0) / 48.0) AS BIGINT))) AS u(i)",
        "q_decontaminate":
            "WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), "
            "'\\w+') AS t FROM documents), "
            "sh AS (SELECT doc_id, unnest(list_transform(generate_series("
            "1, len(t) - 3), i -> array_to_string(t[i : i + 3], ' '))) AS s "
            "FROM toks WHERE len(t) >= 4) "
            "SELECT DISTINCT doc_id FROM sh WHERE doc_id % 50 <> 0 AND "
            "s IN (SELECT s FROM sh WHERE doc_id % 50 = 0)",
        "q_group_rank":
            "SELECT o_orderkey, o_custkey, o_totalprice, "
            "CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk "
            "FROM orders",
        "q_pivot":
            "SELECT user_id, "
            "CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_click, "
            "CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_view, "
            "CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_error, "
            "CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase, "
            "CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup "
            "FROM events GROUP BY user_id",
        "q_tumbling":
            "SELECT user_id, date_trunc('day', ts) AS day, "
            "CAST(COUNT(*) AS BIGINT) AS c, "
            "CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS sum_floor "
            "FROM events GROUP BY user_id, day",
        "q_hopping":
            "SELECT make_timestamp((epoch_us(ts) // 1800000000) "
            "* 1800000000 - i * 1800000000) AS window_start, "
            "CAST(COUNT(*) AS BIGINT) AS c "
            "FROM events CROSS JOIN (SELECT unnest(range(0, 2)) AS i) "
            "GROUP BY window_start",
        "q_bigram":
            "SELECT bigram, c FROM (SELECT bigram, COUNT(*) AS c FROM ("
            "SELECT unnest(list_transform(generate_series(1, len(toks)-1), "
            "i -> toks[i] || ' ' || toks[i+1])) AS bigram FROM ("
            "SELECT regexp_extract_all(lower(text), '\\w+') AS toks "
            "FROM documents)) GROUP BY bigram) "
            "ORDER BY c DESC, bigram LIMIT 40",
        "q_tfidf":
            "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all("
            "lower(text), '\\w+')) AS term FROM documents), "
            "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks "
            "GROUP BY doc_id, term), "
            "df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), "
            "n AS (SELECT COUNT(*) AS n FROM documents) "
            "SELECT t.doc_id, t.term, "
            "ROUND(t.tf * ln(CAST(n.n AS DOUBLE) / d.df), 6) AS tfidf "
            "FROM tf t JOIN df d USING (term) CROSS JOIN n",
        "q_union_budget":
            "SELECT event_id, event_type, value FROM ("
            "SELECT event_id, event_type, value FROM events "
            "WHERE event_type = 'click' UNION ALL "
            "SELECT event_id, event_type, value FROM events "
            "WHERE event_type = 'error') "
            "ORDER BY value DESC, event_id LIMIT 100",
        "q_window_wave":
            "SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c FROM events "
            "GROUP BY 1",
        "q_props_json":
            "SELECT json_extract_string(props, '$.k') AS k, COUNT(*) AS c "
            "FROM events GROUP BY 1",
        "q_distinct":
            "SELECT COUNT(DISTINCT lang) AS n_langs FROM documents",
        "q_distinct_pairs":
            "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem",
        "q_partial_agg":
            "SELECT l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS q_sum, "
            "MIN(CAST(l_quantity AS BIGINT)) AS q_min, "
            "MAX(CAST(l_quantity AS BIGINT)) AS q_max "
            "FROM lineitem GROUP BY l_suppkey",
        "q_agg_stats":
            "SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, "
            "COUNT(*) AS count_order FROM lineitem "
            "GROUP BY l_returnflag, l_linestatus",
        "q_minmax":
            "SELECT o_orderpriority, MIN(o_totalprice) AS min_price, "
            "MAX(o_totalprice) AS max_price, COUNT(*) AS c FROM orders "
            "GROUP BY o_orderpriority",
        "q_grouped_median":
            "SELECT event_type, CAST(quantile_disc(value, 0.5) AS DOUBLE) "
            "AS median_value FROM events GROUP BY event_type",
        "q_word_count":
            "SELECT word, c FROM (SELECT word, COUNT(*) AS c FROM ("
            "SELECT unnest(regexp_extract_all(lower(text), '\\w+')) AS word "
            "FROM documents) GROUP BY word) ORDER BY c DESC, word LIMIT 50",
        "q_redact":
            "SELECT doc_id, regexp_replace(text, '\\d', '#', 'g') "
            "AS redacted FROM documents",
        "q_sessionize":
            "SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions FROM ("
            "SELECT user_id, CASE WHEN LAG(ts) OVER w IS NULL OR "
            "ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END "
            "AS new_s FROM events WINDOW w AS "
            "(PARTITION BY user_id ORDER BY ts, event_id)) GROUP BY user_id",
        "q_asof_join":
            "SELECT e.event_id, o.o_orderdate AS matched_ts FROM events e "
            "ASOF LEFT JOIN orders o ON e.user_id = o.o_custkey "
            "AND e.ts >= o.o_orderdate",
        "q_embedding_norm":
            "SELECT vec_id, ROUND(sqrt(list_sum(list_transform("
            "embedding::DOUBLE[], x -> x*x))), 3) AS l2norm FROM embeddings",
        "q_dim_stats":
            "SELECT CAST(u.ord AS BIGINT) AS dim, MIN(u.v) AS min_v, "
            "MAX(u.v) AS max_v, CAST(SUM(CASE WHEN u.v > 0 THEN 1 ELSE 0 "
            "END) AS BIGINT) AS n_pos FROM (SELECT "
            "unnest(embedding::DOUBLE[]) AS v, "
            "generate_subscripts(embedding, 1) AS ord FROM embeddings) u "
            "GROUP BY u.ord",
        "q_above_avg":
            "SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity "
            "FROM lineitem l WHERE l_quantity > (SELECT AVG(l_quantity) "
            "FROM lineitem l2 WHERE l2.l_returnflag = l.l_returnflag)",
        "q_priority_class":
            "SELECT l_linestatus, CAST(SUM(CASE WHEN o_orderpriority IN "
            "('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS "
            "high_count, CAST(SUM(CASE WHEN o_orderpriority IN "
            "('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS "
            "low_count FROM lineitem JOIN orders ON l_orderkey = "
            "o_orderkey WHERE l_shipdate > o_orderdate "
            "GROUP BY l_linestatus",
        "q_exists_orders":
            "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders "
            "FROM orders o WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' AND EXISTS "
            "(SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
            "AND l.l_shipdate > o.o_orderdate) GROUP BY o_orderpriority",
        "q_big_orders":
            "SELECT c_name, o_orderkey, o_totalprice, "
            "CAST(SUM(l_quantity) AS DOUBLE) AS total_qty FROM orders "
            "JOIN lineitem ON o_orderkey = l_orderkey JOIN customer ON "
            "c_custkey = o_custkey GROUP BY c_name, o_orderkey, "
            "o_totalprice HAVING SUM(l_quantity) > 150",
        "q_promo_share":
            "SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN r ELSE 0 "
            "END) AS BIGINT) AS promo_rev, CAST(SUM(r) AS BIGINT) AS "
            "total_rev, CAST(SUM(CASE WHEN p_type = 'PROMO' THEN r ELSE "
            "0 END) AS DOUBLE) / CAST(SUM(r) AS DOUBLE) AS promo_share "
            "FROM (SELECT l_partkey, CAST(ROUND(l_extendedprice * 100) "
            "AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS "
            "BIGINT)) AS r FROM lineitem WHERE l_shipdate >= TIMESTAMP "
            "'1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01') l "
            "JOIN part ON l_partkey = p_partkey",
        "q_important_nations":
            "WITH s AS (SELECT s_nationkey, CAST(ROUND(s_acctbal * 100) "
            "AS BIGINT) AS bal FROM supplier) SELECT n_name, "
            "CAST(SUM(bal) AS BIGINT) AS bal_cents FROM s JOIN nation "
            "ON s_nationkey = n_nationkey GROUP BY n_name "
            "HAVING SUM(bal) * 20 > (SELECT SUM(bal) FROM s)",
        "q_volume_shipping":
            "SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation, "
            "CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year, "
            "CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) "
            "AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ns ON s_nationkey = ns.n_nationkey "
            "JOIN nation nc ON c_nationkey = nc.n_nationkey "
            "WHERE ns.n_name <> nc.n_name "
            "AND l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01' "
            "GROUP BY 1, 2, 3",
        "q_custdist":
            "SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM ("
            "SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS "
            "c_count FROM customer LEFT JOIN orders ON c_custkey = "
            "o_custkey AND o_orderpriority <> '1-URGENT' "
            "GROUP BY c_custkey) GROUP BY c_count",
        "q_supplier_parts":
            "SELECT p_brand, p_size, CAST(COUNT(DISTINCT l_suppkey) AS "
            "BIGINT) AS supplier_cnt "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE p_brand <> 'Brand#13' AND l_suppkey NOT IN ("
            "SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
            "GROUP BY p_brand, p_size",
        "q_small_qty_rev":
            "WITH a AS (SELECT l_partkey, SUM(CAST(l_quantity AS BIGINT))"
            " AS sq, COUNT(*) AS n FROM lineitem GROUP BY l_partkey) "
            "SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) "
            "AS BIGINT) AS rev_cents, CAST(COUNT(*) AS BIGINT) AS n_rows "
            "FROM lineitem JOIN a USING (l_partkey) "
            "JOIN part ON l_partkey = p_partkey "
            "WHERE p_brand = 'Brand#23' "
            "AND 5 * CAST(l_quantity AS BIGINT) * n < sq",
        "q_disjunctive_rev":
            "SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) *"
            " (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) "
            "AS revenue, CAST(COUNT(*) AS BIGINT) AS n_rows "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 "
            "AND l_quantity BETWEEN 1 AND 11) "
            "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 "
            "AND l_quantity BETWEEN 10 AND 20) "
            "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 "
            "AND l_quantity BETWEEN 20 AND 30)",
        "q_late_only_supplier":
            "WITH l AS (SELECT l_orderkey, l_suppkey, l_shipdate, "
            "o_orderdate FROM lineitem JOIN orders ON l_orderkey = "
            "o_orderkey WHERE o_orderstatus = 'F'), "
            "pairs AS (SELECT l_orderkey, l_suppkey, MAX(CASE WHEN "
            "l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 "
            "END) AS any_late FROM l GROUP BY 1, 2), "
            "per AS (SELECT l_orderkey, COUNT(*) AS n_supp, "
            "SUM(any_late) AS n_late FROM pairs GROUP BY 1) "
            "SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait "
            "FROM pairs JOIN per USING (l_orderkey) "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "WHERE any_late = 1 AND n_supp > 1 AND n_late = 1 "
            "GROUP BY s_name",
        "q_dormant_customers":
            "WITH pos AS (SELECT CAST(ROUND(c_acctbal*100) AS BIGINT) AS "
            "bal, c_custkey, c_nationkey FROM customer "
            "WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)), "
            "stats AS (SELECT SUM(bal) AS s, COUNT(*) AS n FROM pos "
            "WHERE bal > 0) "
            "SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust, "
            "CAST(SUM(bal) AS BIGINT) AS totacctbal_cents "
            "FROM pos, stats WHERE bal * n > s AND NOT EXISTS ("
            "SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            "AND o_orderpriority = '1-URGENT') "
            "GROUP BY c_nationkey",
        "q_text_hash_dedup":
            "SELECT doc_id, lang, source FROM documents "
            "QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1",
        "q_token_count":
            "SELECT doc_id, CAST(len(regexp_extract_all(text, '\\w+')) "
            "AS BIGINT) AS n_tokens FROM documents",
        "q_length_buckets":
            # bucket = smallest power of two >= n, in exact integer
            # arithmetic on both sides (length(bin(n-1)) == bit_length)
            "WITH t AS (SELECT len(regexp_extract_all(text, '\\w+')) AS n "
            "FROM documents) "
            "SELECT CAST(CASE WHEN n <= 1 THEN 1 ELSE "
            "1 << LENGTH(BIN(CAST(n - 1 AS BIGINT))) END AS BIGINT) AS "
            "bucket, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n) AS BIGINT) AS total_tokens FROM t GROUP BY 1",
        "q_quality_stats":
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '\\w+')) AS BIGINT) AS n_tokens, "
            "CAST(len(list_distinct(regexp_extract_all(lower(text), '\\w+'))) "
            "AS BIGINT) AS n_uniq, "
            "CAST(len(list_filter(regexp_extract_all(lower(text), '\\w+'), "
            f"x -> x IN {_STOP_SQL})) AS BIGINT) AS n_stop, "
            "CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS BIGINT) "
            "AS n_punct FROM documents",
        "q_quality_score":
            # same expression tree as ops/textstats.quality_score_batch —
            # IEEE double arithmetic is bit-identical between numpy and
            # DuckDB when the operation order matches (verified exact)
            "WITH s AS (SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '\\w+')) AS BIGINT) AS n_tok, "
            "CAST(len(list_distinct(regexp_extract_all(lower(text), "
            "'\\w+'))) AS BIGINT) AS n_uniq, "
            "CAST(len(list_filter(regexp_extract_all(lower(text), '\\w+'), "
            f"x -> x IN {_STOP_SQL})) AS BIGINT) AS n_stop FROM documents) "
            "SELECT doc_id, LEAST(GREATEST("
            "(CASE WHEN n_tok > 0 THEN CAST(n_uniq AS DOUBLE)/n_tok "
            "ELSE 0.0 END) * 0.5 "
            "+ (1.0 - abs((CASE WHEN n_tok > 0 THEN "
            "CAST(n_stop AS DOUBLE)/n_tok ELSE 0.0 END) - 0.08) / 0.92) "
            "* 0.25 + LEAST(GREATEST(n_tok / 64.0, 0.0), 1.0) * 0.25, "
            "0.0), 1.0) AS quality FROM s",
        "q_embed_neardup":
            "SELECT vec_id, label FROM embeddings a WHERE NOT EXISTS ("
            "SELECT 1 FROM embeddings b WHERE b.vec_id < a.vec_id AND "
            "list_cosine_similarity(a.embedding::DOUBLE[], "
            "b.embedding::DOUBLE[]) >= 0.35)",
        "q_ann_topk":
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
            "FROM embeddings WHERE vec_id IN (0, 1, 2, 3)) "
            "SELECT query_id, vec_id, rank FROM ("
            "SELECT q.query_id, e.vec_id, CAST(ROW_NUMBER() OVER ("
            "PARTITION BY q.query_id ORDER BY list_cosine_similarity("
            "e.embedding::DOUBLE[], q.qe::DOUBLE[]) DESC, e.vec_id) AS BIGINT)"
            " AS rank FROM embeddings e CROSS JOIN q) WHERE rank <= 5",
        "q_langid": _langid_sql(),
        "q_pii_stats": _pii_sql(),
        "q_jaccard_join":
            "WITH S AS (SELECT doc_id, list_distinct("
            "regexp_extract_all(lower(text), '\\w+')) AS s "
            "FROM documents) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter, "
            "CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) "
            "AS BIGINT) AS uni "
            "FROM S a JOIN S b ON a.doc_id < b.doc_id "
            "WHERE len(a.s) > 0 AND len(b.s) > 0 AND "
            "5 * len(list_intersect(a.s, b.s)) >= "
            "3 * (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))",
        "q_dup_ngrams":
            "WITH T AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '\\w+') AS toks "
            "FROM documents), G AS (SELECT doc_id, "
            "[list_aggregate(toks[i:i+1], 'string_agg', ' ') "
            "for i in range(1, len(toks))] AS g2, "
            "[list_aggregate(toks[i:i+2], 'string_agg', ' ') "
            "for i in range(1, len(toks)-1)] AS g3 FROM T) "
            "SELECT doc_id, CAST(len(g2) AS BIGINT) AS n_2grams, "
            "CAST(len(g2) - len(list_distinct(g2)) AS BIGINT) "
            "AS dup_2grams, CAST(len(g3) AS BIGINT) AS n_3grams, "
            "CAST(len(g3) - len(list_distinct(g3)) AS BIGINT) "
            "AS dup_3grams FROM G",
        "q_grouped_distinct":
            "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) "
            "AS n_users FROM events GROUP BY event_type",
        "q_clean_spans":
            "WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), "
            "'\\w+') AS t FROM documents), "
            "pos AS (SELECT doc_id, i, array_to_string(t[i:i+4], ' ') AS g "
            "FROM toks, UNNEST(range(1, len(t) - 3)) AS u(i) "
            "WHERE len(t) >= 5), "
            "cnt AS (SELECT g FROM pos GROUP BY g HAVING COUNT(*) >= 2), "
            "dup AS (SELECT p.doc_id, p.i FROM pos p JOIN cnt USING (g)), "
            "tokpos AS (SELECT doc_id, j, t[j] AS w FROM toks, "
            "UNNEST(range(1, len(t) + 1)) AS u(j)), "
            "cov AS (SELECT DISTINCT tp.doc_id, tp.j FROM tokpos tp "
            "JOIN dup d ON tp.doc_id = d.doc_id AND tp.j >= d.i "
            "AND tp.j <= d.i + 4), "
            "kept AS (SELECT tp.doc_id, tp.j, tp.w FROM tokpos tp "
            "ANTI JOIN cov c ON tp.doc_id = c.doc_id AND tp.j = c.j), "
            "agg AS (SELECT doc_id, string_agg(w, ' ' ORDER BY j) "
            "AS clean_text, COUNT(*) AS n_kept FROM kept GROUP BY doc_id), "
            "tot AS (SELECT doc_id, len(t) AS n_tok FROM toks) "
            "SELECT tot.doc_id, COALESCE(agg.clean_text, '') AS clean_text, "
            "CAST(tot.n_tok - COALESCE(agg.n_kept, 0) AS BIGINT) "
            "AS n_removed FROM tot LEFT JOIN agg USING (doc_id)",
        "q_incremental_dedup":
            "SELECT d.doc_id, d.text FROM documents d "
            "WHERE d.doc_id % 3 <> 0 AND NOT EXISTS ("
            "SELECT 1 FROM documents p WHERE p.doc_id % 3 = 0 "
            "AND p.text = d.text)",
        "q_lead":
            "SELECT event_id, user_id, LEAD(value) OVER (PARTITION BY "
            "user_id ORDER BY ts, event_id) AS next_value FROM events",
        "q_filtered_revenue":
            "SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) "
            "* CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT) AS "
            "revenue, CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate "
            "< TIMESTAMP '1997-01-01' AND CAST(ROUND(l_discount*100) AS "
            "BIGINT) BETWEEN 5 AND 7 AND l_quantity < 24",
        "q_top_supplier":
            "WITH r AS (SELECT l_suppkey, CAST(SUM(CAST(ROUND("
            "l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND("
            "l_discount*100) AS BIGINT))) AS BIGINT) AS total_rev "
            "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
            "SELECT s_suppkey, s_name, total_rev FROM supplier "
            "JOIN r ON s_suppkey = l_suppkey "
            "WHERE total_rev = (SELECT MAX(total_rev) FROM r)",
        "q_market_share":
            "WITH t AS (SELECT CAST(EXTRACT(year FROM o_orderdate) AS "
            "BIGINT) AS o_year, CAST(ROUND(l_extendedprice*100) AS "
            "BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS "
            "v, s_nationkey FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP "
            "'1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01') "
            "SELECT o_year, CAST(SUM(CASE WHEN s_nationkey = 5 THEN v "
            "ELSE 0 END) AS BIGINT) AS nation_vol, CAST(SUM(v) AS "
            "BIGINT) AS total_vol FROM t GROUP BY o_year",
        "q_product_profit":
            "SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS "
            "BIGINT) AS o_year, CAST(SUM(CAST(ROUND(l_extendedprice*100)"
            " AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))"
            " - CAST(ROUND(p_retailprice*100) AS BIGINT) * "
            "CAST(l_quantity AS BIGINT) * 100) AS BIGINT) AS profit "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE p_name LIKE '%gear%' GROUP BY n_name, o_year",
        "q_rolling_distinct":
            "WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id "
            "FROM events), days AS (SELECT DISTINCT d FROM du) "
            "SELECT CAST(days.d AS TIMESTAMP) AS day, "
            "CAST(COUNT(DISTINCT du.user_id) AS "
            "BIGINT) AS n_users FROM days JOIN du ON du.d BETWEEN "
            "days.d - INTERVAL 6 DAY AND days.d GROUP BY 1",
        "q_cooccurrence":
            "WITH ut AS (SELECT DISTINCT user_id, event_type FROM events) "
            "SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "CAST(COUNT(*) AS BIGINT) AS n_users FROM ut a JOIN ut b "
            "ON a.user_id = b.user_id AND a.event_type < b.event_type "
            "GROUP BY 1, 2",
        "q_rank_ties":
            "SELECT l_orderkey, l_linenumber, CAST(RANK() OVER ("
            "PARTITION BY l_orderkey ORDER BY l_quantity) AS BIGINT) "
            "AS qty_rank FROM lineitem",
        "q_grouped_mad":
            # null values drop from both the median and the deviation
            # median (quantile_disc ignores nulls; null - med is null)
            "WITH m AS (SELECT event_type, quantile_disc(value, 0.5) AS "
            "med FROM events GROUP BY event_type) "
            "SELECT e.event_type, CAST(quantile_disc(abs(e.value - m.med)"
            ", 0.5) AS DOUBLE) AS mad FROM events e JOIN m ON "
            "e.event_type = m.event_type GROUP BY e.event_type",
        "q_grouped_pct_cont":
            "SELECT event_type, "
            "CAST(quantile_cont(value, 0.25) AS DOUBLE) AS p25c, "
            "CAST(quantile_cont(value, 0.50) AS DOUBLE) AS p50c, "
            "CAST(quantile_cont(value, 0.90) AS DOUBLE) AS p90c "
            "FROM events GROUP BY event_type",
        "q_mad":
            "WITH m AS (SELECT quantile_disc(value, 0.5) AS med "
            "FROM events) "
            "SELECT CAST(med AS DOUBLE) AS med, "
            "CAST(quantile_disc(abs(value - med), 0.5) AS DOUBLE) AS mad "
            "FROM events, m GROUP BY med",
        "q_pct_cont":
            "SELECT CAST(quantile_cont(value, 0.10) AS DOUBLE) AS p10c, "
            "CAST(quantile_cont(value, 0.50) AS DOUBLE) AS p50c, "
            "CAST(quantile_cont(value, 0.90) AS DOUBLE) AS p90c "
            "FROM events",
        "q_local_supplier_qty":
            "SELECT n_name, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)"
            " AS total_qty "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE c_nationkey = s_nationkey AND r_name = 'ASIA' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1998-01-01' "
            "GROUP BY n_name",
        "q_dup_spans":
            "WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), "
            "'\\w+') AS t FROM documents), "
            "pos AS (SELECT doc_id, array_to_string(t[i:i+4], ' ') AS g "
            "FROM toks, UNNEST(range(1, len(t) - 3)) AS u(i) "
            "WHERE len(t) >= 5), "
            "cnt AS (SELECT g, COUNT(*) AS c FROM pos GROUP BY g) "
            "SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_pos, "
            "CAST(SUM(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_dup_pos FROM pos p JOIN cnt ON p.g = cnt.g "
            "GROUP BY p.doc_id",
        "q_bloom_semi":
            "SELECT l_orderkey, l_linenumber, l_suppkey FROM lineitem "
            "WHERE l_suppkey IN (SELECT s_suppkey FROM supplier "
            "WHERE s_nationkey < 5)",
        "q_heavy_hitters":
            "SELECT l_partkey AS item, CAST(COUNT(*) AS BIGINT) "
            "AS n_occurrences FROM lineitem GROUP BY l_partkey "
            "HAVING COUNT(*) > 40",
        "q_grouped_quantiles":
            "SELECT event_type, "
            "CAST(quantile_disc(value, 0.25) AS DOUBLE) AS p25, "
            "CAST(quantile_disc(value, 0.50) AS DOUBLE) AS p50, "
            "CAST(quantile_disc(value, 0.75) AS DOUBLE) AS p75 "
            "FROM events GROUP BY event_type",
        "q_kth_value":
            "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(quantile_disc(value, 0.10) AS DOUBLE) AS p10, "
            "CAST(quantile_disc(value, 0.50) AS DOUBLE) AS p50, "
            "CAST(quantile_disc(value, 0.90) AS DOUBLE) AS p90 "
            "FROM events",
        "q_normalize":
            "SELECT doc_id, trim(regexp_replace(lower(nfc_normalize("
            "text)), '\\s+', ' ', 'g')) AS norm_text FROM documents",
        "q_group_max_rows":
            "SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity "
            "FROM lineitem QUALIFY RANK() OVER (PARTITION BY l_suppkey "
            "ORDER BY l_quantity DESC) = 1",
        "q_bucket_join":
            "SELECT o_orderkey, o_custkey, c_mktsegment FROM orders "
            "JOIN customer ON o_custkey = c_custkey",
        "q_top_orders":
            "SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) "
            "AS BIGINT) AS total_qty FROM lineitem WHERE l_orderkey IN "
            "(SELECT o_orderkey FROM orders WHERE o_orderdate < "
            "TIMESTAMP '2024-06-01' AND o_custkey IN (SELECT c_custkey "
            "FROM customer WHERE c_mktsegment = 'BUILDING')) "
            "GROUP BY l_orderkey ORDER BY total_qty DESC, l_orderkey "
            "LIMIT 10",
        "q_returned_qty":
            "SELECT o_custkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS "
            "BIGINT) AS ret_qty FROM lineitem JOIN orders ON "
            "l_orderkey = o_orderkey WHERE l_returnflag = 'R' "
            "GROUP BY o_custkey ORDER BY ret_qty DESC, o_custkey "
            "LIMIT 20",
        "q_cohort_retention":
            "WITH d AS (SELECT user_id, date_trunc('day', ts) AS day "
            "FROM events), f AS (SELECT user_id, MIN(day) AS cohort "
            "FROM d GROUP BY user_id) "
            "SELECT f.cohort, d.day, CAST(COUNT(DISTINCT d.user_id) "
            "AS BIGINT) AS active_users FROM d JOIN f USING (user_id) "
            "GROUP BY f.cohort, d.day",
        "q_sample_hash":
            "SELECT event_id, user_id, value FROM events "
            "WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), "
            "1, 8)) AS UBIGINT) % 100 < 8",
        "q_budget_select":
            "SELECT doc_id, n_tokens, running FROM ("
            "SELECT doc_id, n_tokens, SUM(n_tokens) OVER ("
            "ORDER BY n_distinct DESC, doc_id) AS running FROM ("
            "SELECT doc_id, CAST(len(regexp_extract_all(text, '\\w+')) "
            "AS BIGINT) AS n_tokens, CAST(len(list_distinct("
            "regexp_extract_all(text, '\\w+'))) AS BIGINT) AS n_distinct"
            " FROM documents)) WHERE running <= 8000",
        "q_group_sample":
            "SELECT event_id, event_type FROM ("
            "SELECT event_id, event_type, row_number() OVER ("
            "PARTITION BY event_type ORDER BY "
            "CAST(('0x' || substr(md5('s:' || CAST(event_id AS "
            "VARCHAR)), 1, 16)) AS UBIGINT), event_id) AS rn "
            "FROM events) t WHERE rn <= 100",
        "q_paragraph_dedup":
            # explode via zipped unnest (1-based idx = range() parity
            # with the Ray side), first-occurrence winners via
            # row_number over (doc_id, idx), empties kept as structure,
            # ordered string_agg reassembly
            "WITH p AS (SELECT doc_id, unnest(lst) AS para, "
            "unnest(range(1, len(lst)+1)) AS idx FROM ("
            "SELECT doc_id, string_split(text, chr(10)) AS lst "
            "FROM documents)), w AS (SELECT doc_id, idx, para, "
            "row_number() OVER (PARTITION BY para ORDER BY doc_id, idx)"
            " AS rn FROM p WHERE para <> ''), kept AS ("
            "SELECT doc_id, idx, para FROM w WHERE rn = 1 "
            "UNION ALL SELECT doc_id, idx, para FROM p WHERE para = '')"
            " SELECT doc_id, string_agg(para, chr(10) ORDER BY idx) "
            "AS clean_text FROM kept GROUP BY doc_id",
        "q_gopher_filter":
            # same rule constants as ops/textstats.gopher_stats_batch;
            # '...' count via non-overlapping replace (str.count parity)
            "WITH s AS (SELECT doc_id, "
            "regexp_extract_all(text, '\\w+') AS words, "
            "string_split(text, chr(10)) AS lines, "
            "CAST((len(text) - len(replace(text, '...', ''))) // 3 "
            "AS BIGINT) AS n_ell, "
            "CAST(len(text) - len(replace(text, '#', '')) AS BIGINT) "
            "AS n_hash FROM documents), c AS (SELECT doc_id, "
            "CAST(len(words) AS BIGINT) AS n_words, "
            "CAST(coalesce(list_sum(list_transform(words, "
            "w -> len(w))), 0) AS BIGINT) AS sum_word_len, "
            "CAST(len(list_filter(words, w -> regexp_matches(w, "
            "'[a-zA-Z]'))) AS BIGINT) AS n_alpha_words, "
            "n_hash + n_ell AS n_symbols, "
            "CAST(len(lines) AS BIGINT) AS n_lines, "
            "CAST(len(list_filter(lines, x -> x LIKE '- %' OR "
            "x LIKE '* %')) AS BIGINT) AS n_bullet_lines, "
            "CAST(len(list_filter(lines, x -> x LIKE '%...')) "
            "AS BIGINT) AS n_ellipsis_lines, "
            "CAST(len(list_distinct(list_filter(list_transform(words, "
            f"w -> lower(w)), w -> w IN {_STOP_SQL}))) AS BIGINT) "
            "AS n_stop_distinct FROM s) "
            "SELECT doc_id, n_words, sum_word_len, n_alpha_words, "
            "n_symbols, n_lines, n_bullet_lines, n_ellipsis_lines, "
            "n_stop_distinct, CAST(CASE WHEN "
            "n_words BETWEEN 50 AND 100000 "
            "AND 3*n_words <= sum_word_len "
            "AND sum_word_len <= 10*n_words "
            "AND 10*n_symbols <= n_words "
            "AND 10*n_bullet_lines <= 9*n_lines "
            "AND 10*n_ellipsis_lines <= 3*n_lines "
            "AND 10*n_alpha_words >= 8*n_words "
            "AND n_stop_distinct >= 2 THEN 1 ELSE 0 END AS BIGINT) "
            "AS pass_gopher FROM c",
        "q_c4_filter":
            # same rule constants as ops/textstats.c4_stats_batch; a
            # kept line ends in . ! ? or ", has >=5 \w+ words, and has
            # no word-bounded 'javascript'; sentence count = terminal
            # punctuation chars
            "WITH s AS (SELECT doc_id, "
            "string_split(text, chr(10)) AS lines, "
            "CAST(len(text) - len(replace(text, '.', '')) "
            "+ len(text) - len(replace(text, '!', '')) "
            "+ len(text) - len(replace(text, '?', '')) AS BIGINT) "
            "AS n_sentences, "
            "CAST(CASE WHEN contains(lower(text), 'lorem ipsum') "
            "THEN 1 ELSE 0 END AS BIGINT) AS has_lorem, "
            "CAST(CASE WHEN contains(text, '{') OR contains(text, '}')"
            " THEN 1 ELSE 0 END AS BIGINT) AS has_brace "
            "FROM documents), c AS (SELECT doc_id, "
            "CAST(len(lines) AS BIGINT) AS n_lines, "
            "CAST(len(list_filter(lines, x -> "
            "(x LIKE '%.' OR x LIKE '%!' OR x LIKE '%?' OR "
            "x LIKE '%\"') "
            "AND len(regexp_extract_all(x, '\\w+')) >= 5 "
            "AND NOT regexp_matches(lower(x), "
            "'\\bjavascript\\b'))) AS BIGINT) AS n_kept_lines, "
            "n_sentences, has_lorem, has_brace FROM s) "
            "SELECT doc_id, n_lines, n_kept_lines, n_sentences, "
            "has_lorem, has_brace, CAST(CASE WHEN n_sentences >= 3 "
            "AND has_lorem = 0 AND has_brace = 0 AND n_kept_lines >= 1"
            " THEN 1 ELSE 0 END AS BIGINT) AS pass_c4 FROM c",
        "q_keep_best":
            "SELECT doc_id, lang, n_chars FROM documents QUALIFY "
            "ROW_NUMBER() OVER (PARTITION BY text "
            "ORDER BY n_chars DESC, doc_id) = 1",
        "q_jsonl_roundtrip":
            "SELECT doc_id, text, lang, source, n_chars FROM documents",
        "q_webdataset_roundtrip":
            "SELECT doc_id, text, lang, source, n_chars FROM documents",
        "q_ipc_roundtrip":
            "SELECT o_orderkey, o_custkey, o_orderstatus, "
            "o_orderpriority, CAST(epoch_us(o_orderdate) AS BIGINT) "
            "AS od_us FROM orders",
        "q_csv_roundtrip":
            "SELECT c_custkey, c_name, c_nationkey, c_mktsegment "
            "FROM customer",
        "q_curate":
            # gopher gate (q_gopher_filter's integer rule) -> exact-dup
            # winner (min doc_id per text) -> q_chunk window algebra ->
            # q_train_shards md5 shard/seq on key 'doc_id:chunk_id'
            "WITH s AS (SELECT doc_id, text, "
            "regexp_extract_all(text, '\\w+') AS words, "
            "string_split(text, chr(10)) AS lines, "
            "CAST((len(text) - len(replace(text, '...', ''))) // 3 "
            "AS BIGINT) AS n_ell, "
            "CAST(len(text) - len(replace(text, '#', '')) AS BIGINT) "
            "AS n_hash FROM documents), g AS (SELECT doc_id, text FROM ("
            "SELECT doc_id, text, "
            "CAST(len(words) AS BIGINT) AS n_words, "
            "CAST(coalesce(list_sum(list_transform(words, "
            "w -> len(w))), 0) AS BIGINT) AS sum_word_len, "
            "CAST(len(list_filter(words, w -> regexp_matches(w, "
            "'[a-zA-Z]'))) AS BIGINT) AS n_alpha_words, "
            "n_hash + n_ell AS n_symbols, "
            "CAST(len(lines) AS BIGINT) AS n_lines, "
            "CAST(len(list_filter(lines, x -> x LIKE '- %' OR "
            "x LIKE '* %')) AS BIGINT) AS n_bullet_lines, "
            "CAST(len(list_filter(lines, x -> x LIKE '%...')) "
            "AS BIGINT) AS n_ellipsis_lines, "
            "CAST(len(list_distinct(list_filter(list_transform(words, "
            f"w -> lower(w)), w -> w IN {_STOP_SQL}))) AS BIGINT) "
            "AS n_stop_distinct FROM s) WHERE "
            "n_words BETWEEN 50 AND 100000 "
            "AND 3*n_words <= sum_word_len "
            "AND sum_word_len <= 10*n_words "
            "AND 10*n_symbols <= n_words "
            "AND 10*n_bullet_lines <= 9*n_lines "
            "AND 10*n_ellipsis_lines <= 3*n_lines "
            "AND 10*n_alpha_words >= 8*n_words "
            "AND n_stop_distinct >= 2), "
            "dd AS (SELECT doc_id, text FROM g QUALIFY ROW_NUMBER() "
            "OVER (PARTITION BY text ORDER BY doc_id) = 1), "
            "toks AS (SELECT doc_id, regexp_extract_all(lower(text), "
            "'\\w+') AS t FROM dd), "
            "c AS (SELECT doc_id, t, len(t) AS n FROM toks "
            "WHERE len(t) > 0), "
            "ch AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS chunk_id "
            "FROM c, UNNEST(generate_series(1, 1 + CAST(CEIL(GREATEST("
            "n - 64, 0) / 48.0) AS BIGINT))) AS u(i)), "
            "k AS (SELECT doc_id, chunk_id, CAST(doc_id AS VARCHAR) || "
            "':' || CAST(chunk_id AS VARCHAR) AS ck FROM ch) "
            "SELECT doc_id, chunk_id, shard, CAST(ROW_NUMBER() OVER ("
            "PARTITION BY shard ORDER BY pos, ck) - 1 AS BIGINT) AS seq"
            " FROM (SELECT doc_id, chunk_id, ck, CAST(CAST(('0x' || "
            "substr(md5(ck), 1, 8)) AS UBIGINT) % 8 AS BIGINT) AS shard"
            ", CAST(('0x' || substr(md5('p:' || ck), 1, 16)) AS "
            "UBIGINT) AS pos FROM k)",
        "q_train_shards":
            "SELECT c_custkey, shard, CAST(ROW_NUMBER() OVER ("
            "PARTITION BY shard ORDER BY pos, c_custkey) - 1 AS BIGINT)"
            " AS seq FROM (SELECT c_custkey, CAST(CAST(('0x' || "
            "substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS UBIGINT)"
            " % 8 AS BIGINT) AS shard, CAST(('0x' || substr(md5('p:' ||"
            " CAST(c_custkey AS VARCHAR)), 1, 16)) AS UBIGINT) AS pos "
            "FROM customer)",
        "q_hash_split":
            "SELECT c_custkey, CASE WHEN b < 80 THEN 'train' "
            "WHEN b < 90 THEN 'val' ELSE 'test' END AS split FROM ("
            "SELECT c_custkey, CAST(('0x' || substr(md5(CAST(c_custkey "
            "AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS b FROM customer)",
        "q_expectations":
            "SELECT 'null:l_orderkey' AS rule, CAST(SUM(CASE WHEN "
            "l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS "
            "n_violations FROM lineitem UNION ALL "
            "SELECT 'range:l_quantity', CAST(SUM(CASE WHEN "
            "l_quantity < 1 OR l_quantity > 25 THEN 1 ELSE 0 END) "
            "AS BIGINT) FROM lineitem UNION ALL "
            "SELECT 'unique:l_orderkey,l_linenumber', "
            "CAST(SUM(c - 1) AS BIGINT) FROM (SELECT COUNT(*) AS c "
            "FROM lineitem GROUP BY l_orderkey, l_linenumber)",
        "q_pruned_scan":
            "SELECT l_orderkey, l_linenumber, zkey FROM ("
            "SELECT l_orderkey, l_linenumber, CAST("
            + zorder_sql("(l_partkey & 65535)", "(l_suppkey & 65535)")
            + " AS BIGINT) AS zkey FROM lineitem) "
            "WHERE zkey BETWEEN 0 AND 16383",
        "q_rolling_7d":
            "WITH d AS (SELECT date_trunc('day', ts) AS day, "
            "COUNT(*) AS c FROM events GROUP BY day), "
            "g AS (SELECT unnest(generate_series("
            "(SELECT MIN(day) FROM d), (SELECT MAX(day) FROM d), "
            "INTERVAL 1 DAY)) AS day) "
            "SELECT g.day, CAST(SUM(COALESCE(d.c, 0)) OVER ("
            "ORDER BY g.day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) "
            "AS BIGINT) AS c7 FROM g LEFT JOIN d USING (day)",
        "q_interval_lookup":
            "SELECT o_orderkey, band FROM orders JOIN (VALUES "
            "(0, 50000, 'low'), (50000, 150000, 'mid'), "
            "(150000, 1000000000, 'high')) AS b(lo, hi, band) "
            "ON o_totalprice >= lo AND o_totalprice < hi",
        "q_winsorize":
            "WITH q AS (SELECT quantile_disc(value, 0.05) AS ql, "
            "quantile_disc(value, 0.95) AS qh FROM events) "
            "SELECT event_id, CASE WHEN value < ql THEN ql "
            "WHEN value > qh THEN qh ELSE value END AS value_w "
            "FROM events, q",
        "q_table_checksum":
            "SELECT CAST(n AS BIGINT) AS n_rows, CAST(CASE WHEN m >= "
            "9223372036854775808 THEN m - 18446744073709551616 "
            "ELSE m END AS BIGINT) AS checksum FROM ("
            "SELECT COUNT(*) AS n, COALESCE(SUM(CAST(CAST('0x' || "
            "substr(md5(concat_ws('|', CAST(l_orderkey AS VARCHAR), "
            "CAST(l_linenumber AS VARCHAR), CAST(l_suppkey AS VARCHAR)"
            ")), 1, 16) AS UBIGINT) AS HUGEINT)), 0) "
            "% 18446744073709551616 AS m FROM lineitem)",
        "q_zorder":
            "SELECT l_orderkey, l_linenumber, CAST("
            + zorder_sql("(l_partkey & 65535)", "(l_suppkey & 65535)")
            + " AS BIGINT) AS zkey FROM lineitem",
        "q_lev_join":
            "WITH n AS (SELECT DISTINCT p_name AS name FROM part) "
            "SELECT a.name AS name_a, b.name AS name_b, "
            "CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist "
            "FROM n a, n b WHERE a.name < b.name "
            "AND levenshtein(a.name, b.name) <= 2",
        "q_equidepth":
            "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            + ", ".join(
                f"CAST(quantile_disc(o_totalprice, {i / 10:.1f}) AS DOUBLE)"
                f" AS b{i * 10:02d}" for i in range(1, 10))
            + " FROM orders",
        "q_snapshot_diff":
            "WITH old AS (SELECT c_custkey, c_acctbal FROM customer "
            "WHERE c_custkey % 89 <> 0), "
            "new AS (SELECT c_custkey, CASE WHEN c_custkey % 31 = 0 "
            "THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal "
            "FROM customer WHERE c_custkey % 97 <> 0) "
            "SELECT COALESCE(n.c_custkey, o.c_custkey) AS c_custkey, "
            "CASE WHEN o.c_custkey IS NULL THEN 'added' "
            "WHEN n.c_custkey IS NULL THEN 'removed' "
            "ELSE 'changed' END AS change, "
            "COALESCE(n.c_acctbal, o.c_acctbal) AS c_acctbal "
            "FROM old o FULL OUTER JOIN new n USING (c_custkey) "
            "WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL "
            "OR n.c_acctbal <> o.c_acctbal",
        "q_corr_stats":
            "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(x) AS BIGINT) AS sum_x, "
            "CAST(SUM(y) AS BIGINT) AS sum_y, "
            "CAST(SUM(x*x) AS BIGINT) AS sum_xx, "
            "CAST(SUM(y*y) AS BIGINT) AS sum_yy, "
            "CAST(SUM(x*y) AS BIGINT) AS sum_xy FROM ("
            "SELECT l_returnflag, "
            "CAST(FLOOR(l_extendedprice) AS BIGINT) AS x, "
            "CAST(FLOOR(l_quantity) AS BIGINT) AS y FROM lineitem) "
            "GROUP BY l_returnflag",
        "q_skyline":
            "SELECT p_partkey, p_size, p_retailprice FROM part a "
            "WHERE NOT EXISTS (SELECT 1 FROM part b WHERE "
            "b.p_size >= a.p_size AND b.p_retailprice >= a.p_retailprice "
            "AND (b.p_size > a.p_size OR "
            "b.p_retailprice > a.p_retailprice))",
        "q_grouped_heavy_hitters":
            "SELECT event_type, user_id AS item, "
            "CAST(COUNT(*) AS BIGINT) AS n_occurrences FROM events "
            "GROUP BY event_type, user_id HAVING COUNT(*) > 15",
        "q_corpus_overlap":
            # exact regime: the sf0.01 corpus' text-set UNION has < 4096
            # distinct values, where the KMV sketches degenerate to the
            # exact distinct sets (pytest carries the approximate-regime
            # error-bound oracle)
            "WITH a AS (SELECT DISTINCT text FROM documents "
            "WHERE doc_id % 2 = 0), "
            "b AS (SELECT DISTINCT text FROM documents "
            "WHERE doc_id % 3 = 0) "
            "SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS "
            "distinct_a, "
            "CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS distinct_b, "
            "CAST((SELECT COUNT(*) FROM (SELECT text FROM a UNION "
            "SELECT text FROM b)) AS BIGINT) AS distinct_union, "
            "CAST((SELECT COUNT(*) FROM (SELECT text FROM a INTERSECT "
            "SELECT text FROM b)) AS BIGINT) AS distinct_intersection",
        "q_pricing_summary":
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS "
            "BIGINT) AS sum_base_c, "
            "CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) "
            "AS sum_disc_c4, "
            "CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount*100) AS BIGINT)) * "
            "(100 + CAST(ROUND(l_tax*100) AS BIGINT))) AS BIGINT) "
            "AS sum_charge_c6, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01' "
            "GROUP BY l_returnflag, l_linestatus",
        "q_min_cost_supplier":
            "WITH elig AS (SELECT s_suppkey, s_name FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'EUROPE'), "
            "pe AS (SELECT p_partkey FROM part WHERE p_type = 'LARGE' "
            "AND p_size >= 25), "
            "cost AS (SELECT l_partkey, l_suppkey, "
            "MIN(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS cost_c "
            "FROM lineitem JOIN elig ON l_suppkey = s_suppkey "
            "JOIN pe ON l_partkey = p_partkey GROUP BY 1, 2), "
            "m AS (SELECT l_partkey, MIN(cost_c) AS min_c FROM cost "
            "GROUP BY 1) "
            "SELECT c.l_partkey AS p_partkey, e.s_name, c.cost_c "
            "FROM cost c JOIN m ON c.l_partkey = m.l_partkey "
            "AND c.cost_c = m.min_c "
            "JOIN elig e ON c.l_suppkey = e.s_suppkey",
        "q_part_promotion":
            "WITH pe AS (SELECT p_partkey, CAST(p_size AS BIGINT) * 2 "
            "AS availq2 FROM part WHERE p_name LIKE '%bolt%'), "
            "sold AS (SELECT l_partkey, l_suppkey, "
            "SUM(CAST(l_quantity AS BIGINT)) AS sold FROM lineitem "
            "JOIN pe ON l_partkey = p_partkey "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01' GROUP BY 1, 2) "
            "SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS "
            "n_parts FROM sold "
            "JOIN pe ON sold.l_partkey = pe.p_partkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "WHERE sold < availq2 GROUP BY s_suppkey, s_name",
        # q_minhash_dedup / q_simhash_dedup / q_ngram_dedup /
        # q_dup_clusters / q_ivf_ann / q_fingerprint /
        # q_image_features / q_image_augment / q_sample / q_value_stats:
        # SQL-inexpressible (LSH banding, approximate
        # ANN, binary decode, seeded sampling, float-sum order) ->
        # rows-only driver check + pytest oracles.
    }
