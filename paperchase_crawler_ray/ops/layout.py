"""Data-layout operators: space-filling-curve keys for scan locality.

At 100 TB the dominant cost of a multi-dimensional-filtered scan is how
many files/row-groups a predicate touches.  Sorting by a Z-order (Morton)
key interleaves the bits of several columns so rows close in EVERY
dimension land close in the file order — the standard public technique
(Morton 1966; used by every lakehouse OPTIMIZE ZORDER BY).  The key
computation is a stateless vectorized map; the one all-to-all is the
final sort, which any layout rewrite pays by definition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _spread16(x: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 16 bits of x (uint64 out):
    classic Morton bit-twiddling masks, fully vectorized."""
    v = x.astype(np.uint64) & np.uint64(0xFFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def morton_key2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """32-bit Morton code of two 16-bit non-negative ints (int64 out):
    bit i of x -> bit 2i, bit i of y -> bit 2i+1."""
    return (_spread16(x) | (_spread16(y) << np.uint64(1))).astype(np.int64)


def zorder_keys(ds: ray.data.Dataset, x_col: str, y_col: str,
                out_col: str = "zkey") -> ray.data.Dataset:
    """Append the Morton key of (x % 2^16, y % 2^16).  Callers that
    need full-width columns should first quantile-bucket each column to
    16 bits (rank / 2^16 buckets) — the curve needs bounded coordinates
    by construction."""
    def key(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64) & 0xFFFF
        y = batch.column(y_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64) & 0xFFFF
        return batch.append_column(out_col,
                                   pa.array(morton_key2(x, y), pa.int64()))

    return ds.map_batches(key, batch_format="pyarrow")


def zorder_sql(x_expr: str, y_expr: str) -> str:
    """The DuckDB twin of morton_key2 as a generated bit-ops expression
    (sum over bit positions) — lets the driver's SQL oracle verify the
    layout key bit-for-bit."""
    terms = []
    for i in range(16):
        terms.append(f"((({x_expr} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y_expr} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def write_sorted_by_zorder(ds: ray.data.Dataset, out_dir: str,
                           x_col: str, y_col: str,
                           rows_per_file: int = 8192) -> int:
    """Layout rewrite: append the Morton key, globally sort by it, and
    land fixed-size parquet files (one per block). After this, rows
    close in BOTH dimensions are close in file order, so per-file
    min/max statistics become tight 2-D zone maps. Returns the number
    of files written. An existing ``out_dir`` is WIPED first — parquet
    writes append uniquely-named files, so rerunning into a stale dir
    would silently double every row a later scan reads."""
    import os
    import shutil
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    keyed = zorder_keys(ds, x_col, y_col)
    srt = keyed.sort("zkey")
    n = srt.count()
    num_blocks = max(1, (n + rows_per_file - 1) // rows_per_file)
    srt.repartition(num_blocks).write_parquet(out_dir)
    return len([f for f in os.listdir(out_dir) if f.endswith(".parquet")])


def pruned_read(in_dir: str, col: str, lo: int, hi: int
                ) -> tuple[ray.data.Dataset, dict]:
    """Statistics-pruned scan: read ONLY the parquet files whose
    row-group [min, max] range on ``col`` overlaps [lo, hi] (metadata
    footers only — no data pages touched for skipped files), then apply
    the exact residual filter to the survivors.

    This is the 100-TB read path the Z-order rewrite exists for: a 2-D
    selective predicate over a z-ordered table touches O(matching
    zone) files instead of all of them. Returns (dataset, stats) where
    stats reports files_total / files_read so callers (and tests) can
    assert real pruning happened."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(in_dir, "*.parquet")))
    keep = []
    for f in files:
        md = pq.read_metadata(f)
        idx = md.schema.to_arrow_schema().get_field_index(col)
        overlaps = False
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                overlaps = True  # no stats -> cannot prune, must read
                break
            if st.min <= hi and st.max >= lo:
                overlaps = True
                break
        if overlaps:
            keep.append(f)
    if not keep:
        # preserve schema with an emptied read of one pruned file
        ds = (ray.data.read_parquet(files[:1])
              .map_batches(lambda b: b.slice(0, 0), batch_format="pyarrow")
              if files else ray.data.from_items([]))
        return ds, {"files_total": len(files), "files_read": 0}

    ds = ray.data.read_parquet(keep)

    def residual(batch):
        import pyarrow as pa
        import pyarrow.compute as pc
        m = pc.and_(pc.greater_equal(batch.column(col), pa.scalar(lo)),
                    pc.less_equal(batch.column(col), pa.scalar(hi)))
        return batch.filter(m)

    return (ds.map_batches(residual, batch_format="pyarrow"),
            {"files_total": len(files), "files_read": len(keep)})
