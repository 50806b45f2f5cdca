"""Sources / sinks (SURVEY.md §2.1 S1-S6) — the user-facing I/O surface.

The image sink is parquet in this sandbox; ``format="lance"`` routes to
``Dataset.write_lance`` / ``ray.data.read_lance`` (the production target
per BASELINE.json:15) behind an import guard because the ``lance``
package cannot be installed here (no network).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from .fixtures import make_seeds
from .schemas import IMAGE_CAPTION


def read_seeds(spec: str) -> pa.Table:
    """S1: seed list from parquet (url, seed_id, priority), plain text
    (one URL per line), or the deterministic fixture
    (``fixture:<n_seeds>:<n_hosts>``)."""
    if spec.startswith("fixture:"):
        _, n_seeds, n_hosts = spec.split(":")
        return make_seeds(int(n_seeds), int(n_hosts))
    if spec.endswith(".parquet"):
        return pq.read_table(spec)
    with open(spec) as f:
        urls = [ln.strip() for ln in f if ln.strip()]
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "seed_id": pa.array(range(len(urls)), pa.int32()),
        "priority": pa.array([1.0] * len(urls), pa.float64()),
    })


def last_committed_wave(out_dir: str) -> int | None:
    """Highest wave K with a ``_COMMITTED`` marker, or None."""
    best = None
    if not os.path.isdir(out_dir):
        return None
    for d in os.listdir(out_dir):
        if d.startswith("wave=") and os.path.exists(
                os.path.join(out_dir, d, "_COMMITTED")):
            k = int(d.split("=", 1)[1])
            best = k if best is None else max(best, k)
    return best


def read_frontier_checkpoint(out_dir: str) -> ray.data.Dataset | None:
    """S2: the NEXT wave's frontier after the last committed wave (what a
    resumed run would process first), or None if nothing is committed /
    the crawl finished."""
    last = last_committed_wave(out_dir)
    if last is None:
        return None
    nxt = os.path.join(out_dir, f"wave={last + 1}", "frontier")
    if not os.path.isdir(nxt) or not os.listdir(nxt):
        return None
    return ray.data.read_parquet(nxt)


def read_image_table(path: str, format: str = "parquet",
                     version: int | None = None) -> ray.data.Dataset:
    """S3: an image_caption table (IMAGE_CAPTION schema).

    ``format="versioned"`` reads the self-contained Lance-style
    fragment-manifest layout (`ops/table_format.py`: snapshots, time
    travel via ``version=``, deletion vectors); ``format="lance"``
    routes to the real package where installed."""
    if format == "lance":
        return ray.data.read_lance(path)  # needs the lance package (prod)
    if format == "versioned":
        from .ops.table_format import read_table
        return read_table(path, version=version)
    return ray.data.read_parquet(path)


def write_image_table(ds: ray.data.Dataset, path: str,
                      format: str = "parquet") -> None:
    """S4: append image rows to the sink. Parquet is written uncompressed
    (the ``bytes`` column holds already-compressed codec payloads)."""
    if format == "lance":
        try:
            ds.write_lance(path)  # ray 2.49 API; lance package required
            return
        except ImportError as e:  # pragma: no cover - sandbox has no lance
            raise ImportError(
                "the 'lance' package is not installed in this environment; "
                "use format='parquet' or format='versioned'") from e
    if format == "versioned":
        from .ops.table_format import append_table
        append_table(ds, path, key_col="image_id")
        return
    ds.write_parquet(path, compression="none")


def tombstone_files(wave_dir: str) -> list[str]:
    """All near-dup tombstone sidecar parquet files of one wave, in
    BOTH layouts: the single-file form (small, driver-computed waves)
    and the Dataset-written directory form (big waves whose drop plane
    never consolidates on the driver)."""
    out = []
    f = os.path.join(wave_dir, "images_tombstones.parquet")
    if os.path.exists(f):
        out.append(f)
    d = os.path.join(wave_dir, "images_tombstones")
    if os.path.isdir(d):
        out.extend(os.path.join(d, x) for x in sorted(os.listdir(d))
                   if x.endswith(".parquet"))
    return out


@ray.remote
def _compact_file(fp: str, dead) -> int:
    """Rewrite one image file without tombstoned rows (atomic replace).
    Returns rows dropped. A task per file: files are block-sized, so the
    compaction parallelizes across the cluster like any map stage (the
    drop set is passed as an ObjectRef — ray.put once, auto-dereferenced
    here, never re-serialized per task)."""
    t = pq.read_table(fp)
    kept = t.filter(pc.invert(pc.is_in(t.column("image_id"),
                                       value_set=dead)))
    if kept.num_rows == t.num_rows:
        return 0
    tmp = fp + ".compact"
    pq.write_table(kept, tmp, compression="none")
    os.replace(tmp, fp)
    return t.num_rows - kept.num_rows


def compact_images(out_dir: str) -> int:
    """Fold the per-wave near-dup TOMBSTONE sidecars into the data files
    (the background-compaction half of the delete-vector design): each
    wave's image files are rewritten without dead rows — ONE RAY TASK
    PER FILE (the drop set broadcasts via ``ray.put``) — then the
    sidecar is removed. Returns the number of rows dropped. Idempotent
    and crash-safe: files are replaced atomically and a sidecar is
    deleted only after every file of its wave is rewritten."""
    import shutil
    dropped = 0
    if not os.path.isdir(out_dir):
        return 0
    for d in sorted(os.listdir(out_dir)):
        if not d.startswith("wave="):
            continue
        wave_dir = os.path.join(out_dir, d)
        ts_paths = tombstone_files(wave_dir)
        img_dir = os.path.join(wave_dir, "images")
        if not ts_paths:
            continue
        # the drop set rides ray.put once per wave (compaction is a
        # background job; per-wave drop sets are bounded by wave size)
        dead = pa.concat_arrays(
            [pq.read_table(p).column("image_id").combine_chunks()
             for p in ts_paths])
        if len(dead) and os.path.isdir(img_dir):
            dead_ref = ray.put(dead)
            futures = [_compact_file.remote(os.path.join(img_dir, f),
                                            dead_ref)
                       for f in sorted(os.listdir(img_dir))
                       if f.endswith(".parquet")]
            dropped += sum(ray.get(futures))
        for p in ts_paths:
            os.remove(p)
        ts_dir = os.path.join(wave_dir, "images_tombstones")
        if os.path.isdir(ts_dir):
            shutil.rmtree(ts_dir, ignore_errors=True)
    return dropped


def image_sink_schema() -> pa.Schema:
    return IMAGE_CAPTION


# ---------------------------------------------------------------------------
# Interchange formats beyond parquet (SURVEY.md §2.1 source breadth):
# newline-delimited JSON (the lingua franca of public text-corpus dumps)
# and Arrow IPC / Feather (zero-copy interchange between Arrow engines).
# Both write ONE FILE PER BLOCK inside tasks — the write parallelizes
# like any map stage and a partial run leaves whole-file units a resumed
# run can skip — and both read back into a streaming Dataset.
# ---------------------------------------------------------------------------


def _clear_stale_parts(path: str, *patterns: str) -> int:
    """Driver-side rerun idempotence for the one-file-per-block sinks:
    sweep a previous run's part files (and orphaned ``*.tmp*`` files
    from killed tasks) out of the target directory before writing.
    Part names embed content hash + task id, so a rerun writes
    DIFFERENTLY-named files; without this sweep a reader of the
    directory would see both runs' rows side by side. Only files
    matching this writer's own naming convention are touched —
    unrelated files are left alone."""
    import fnmatch
    if not os.path.isdir(path):
        return 0
    n = 0
    pats = list(patterns) + [p + ".tmp*" for p in patterns]
    for f in sorted(os.listdir(path)):
        if any(fnmatch.fnmatch(f, p) for p in pats):
            os.remove(os.path.join(path, f))
            n += 1
    return n


def _unique_part_namer(prefix: str, ext: str):
    """Per-task part-file namer: content hash + Ray task id + a
    within-task call counter. A RETRIED task replays the same batches
    in the same order under the same task id, so a retry rewrites the
    same file (idempotent) — while two DISTINCT blocks holding
    identical rows (pre-dedup corpora do this) get different names
    instead of silently overwriting each other, which pure
    content-hash naming would do. The closure ships to each map task
    with the counter at 0, so numbering is per-task deterministic."""
    import hashlib
    import itertools

    calls = itertools.count()

    def name(buf: bytes) -> str:
        key = hashlib.blake2b(buf, digest_size=8).hexdigest()
        try:
            tid = ray.get_runtime_context().get_task_id() or "local"
        except Exception:
            tid = "local"
        return f"{prefix}-{key}-{tid[:12]}-{next(calls)}{ext}"

    return name


def write_jsonl(ds: ray.data.Dataset, path: str,
                compression: str | None = None) -> None:
    """Write a Dataset as a directory of newline-delimited JSON files
    (one per block, written task-parallel).
    Exact for int64 / string / bool columns — the shapes a text corpus
    exports (binary / timestamp columns should ship as parquet or IPC).

    ``compression="gzip"`` writes ``.jsonl.gz`` files (the format
    public text dumps actually ship in); serialization stays
    vectorized (pandas' C ``to_json``), gzip wraps the block once."""
    if compression is None:
        _clear_stale_parts(path, "*.json")   # Ray names parts per run
        ds.write_json(path)
        return
    if compression != "gzip":
        raise ValueError(f"unsupported jsonl compression: {compression}")
    import gzip

    os.makedirs(path, exist_ok=True)
    _clear_stale_parts(path, "part-*.jsonl.gz")
    namer = _unique_part_namer("part", ".jsonl.gz")

    def _write_block(df) -> pa.Table:
        if len(df) == 0:
            return pa.table({"rows": pa.array([], pa.int64())})
        raw = gzip.compress(
            df.to_json(orient="records", lines=True,
                       force_ascii=False).encode("utf-8"), mtime=0)
        dst = os.path.join(path, namer(raw))
        tmp = f"{dst}.tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(raw)
        os.replace(tmp, dst)
        return pa.table({"rows": pa.array([len(df)], pa.int64())})

    # batch_format="pandas" is INTENTIONAL in this one sink: the JSON
    # encoder dominates the stage, and pandas' C to_json is the fastest
    # row-wise JSON encoder in this environment — the arrow->pandas
    # conversion it costs is noise next to encoding + gzip.
    ds.map_batches(_write_block, batch_format="pandas",
                   batch_size=None).materialize()


def read_jsonl(path: str) -> ray.data.Dataset:
    """Read a directory (or single file) of newline-delimited JSON into
    a streaming Dataset (pyarrow's block-wise JSON parser; types are
    inferred per block and reconciled by Ray at the schema boundary).
    ``.jsonl.gz`` files decompress transparently (arrow detects gzip
    from the extension)."""
    return ray.data.read_json(path)


def write_arrow_ipc(ds: ray.data.Dataset, path: str) -> int:
    """Write a Dataset as a directory of Arrow IPC (Feather v2) files,
    one per block, inside map tasks. IPC is the BIT-EXACT interchange
    format: every Arrow type (timestamps, decimals, binary, nested
    lists) round-trips unchanged, unlike JSON. Files are named by the
    block's content hash (a retried task rewrites the same bytes to the
    same name) and land via pid-suffixed temp + ``os.replace`` so a
    killed task never leaves a truncated file at a canonical name.
    Returns the number of rows written."""
    os.makedirs(path, exist_ok=True)
    _clear_stale_parts(path, "part-*.arrow")
    namer = _unique_part_namer("part", ".arrow")

    def _write_block(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"rows": pa.array([], pa.int64())})
        sink = pa.BufferOutputStream()
        with pa.ipc.new_file(sink, tbl.schema) as w:
            w.write_table(tbl)
        buf = sink.getvalue()
        dst = os.path.join(path, namer(buf))
        tmp = f"{dst}.tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, dst)
        return pa.table({"rows": pa.array([tbl.num_rows], pa.int64())})

    counts = ds.map_batches(_write_block, batch_format="pyarrow",
                            batch_size=None)
    return int(sum(r["rows"] for r in counts.take_all()))


def read_arrow_ipc(path: str) -> ray.data.Dataset:
    """Read a directory of Arrow IPC files as a streaming Dataset: the
    binary-file read parallelizes per file and each file decodes to its
    table zero-copy from the read buffer (``pa.ipc.open_file`` maps the
    record batches without re-decoding values)."""
    raw = ray.data.read_binary_files(path)

    def _decode(b: pa.Table) -> pa.Table:
        tables = []
        for v in b.column("bytes"):   # a handful of FILES, not rows
            reader = pa.ipc.open_file(pa.BufferReader(v.as_py()))
            tables.append(reader.read_all())
        return pa.concat_tables(tables) if tables else pa.table({})

    return raw.map_batches(_decode, batch_format="pyarrow")


def write_webdataset(ds: ray.data.Dataset, path: str, key_col: str,
                     text_col: str | None = None,
                     bytes_col: str | None = None,
                     meta_cols: list[str] | None = None) -> int:
    """Write a Dataset as WebDataset-style tar shards (the public
    convention for image+caption training corpora: one tar per shard,
    each sample a group of files sharing a basename — ``<key>.txt`` for
    the caption/text, ``<key>.bin`` for an opaque payload, ``<key>.json``
    for scalar metadata). One shard per block, written inside map tasks
    (task-parallel, content-hash named, atomic replace — a retried task
    rewrites the same bytes). Returns rows written.

    Deterministic: tar member mtimes are 0 and members are emitted in
    row order, so a shard's bytes are a pure function of its block.
    Content-hash naming is collision-safe HERE (unlike the csv/jsonl/
    ipc writers, which salt with the task id): the tar bytes embed
    every sample's ``key_col`` value, so two blocks can only collide if
    they hold the same sample keys — i.e. they ARE the same data."""
    import hashlib
    import io
    import json
    import tarfile

    os.makedirs(path, exist_ok=True)
    # shards are content-addressed (a rerun over the SAME data rewrites
    # the same names), but a rerun over CHANGED upstream data would
    # leave the old run's shards beside the new — same sweep as the
    # other one-file-per-block sinks
    _clear_stale_parts(path, "shard-*.tar")
    meta_cols = list(meta_cols or [])

    def _write_block(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"rows": pa.array([], pa.int64())})
        buf = io.BytesIO()
        keys = tbl.column(key_col).to_pylist()
        texts = tbl.column(text_col).to_pylist() if text_col else None
        blobs = tbl.column(bytes_col).to_pylist() if bytes_col else None
        metas = {c: tbl.column(c).to_pylist() for c in meta_cols}
        with tarfile.open(fileobj=buf, mode="w") as tf:
            def add(name: str, data: bytes) -> None:
                ti = tarfile.TarInfo(name=name)
                ti.size = len(data)
                ti.mtime = 0
                tf.addfile(ti, io.BytesIO(data))
            for i, k in enumerate(keys):
                base = str(k)
                if texts is not None:
                    add(f"{base}.txt", texts[i].encode("utf-8"))
                if blobs is not None:
                    add(f"{base}.bin", blobs[i])
                if meta_cols:
                    add(f"{base}.json", json.dumps(
                        {c: metas[c][i] for c in meta_cols},
                        sort_keys=True).encode("utf-8"))
        raw = buf.getvalue()
        h = hashlib.blake2b(raw, digest_size=10).hexdigest()
        dst = os.path.join(path, f"shard-{h}.tar")
        tmp = f"{dst}.tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(raw)
        os.replace(tmp, dst)
        return pa.table({"rows": pa.array([tbl.num_rows], pa.int64())})

    counts = ds.map_batches(_write_block, batch_format="pyarrow",
                            batch_size=None)
    return int(sum(r["rows"] for r in counts.take_all()))


def read_webdataset(path: str) -> ray.data.Dataset:
    """Read a directory of WebDataset tar shards back into a Dataset
    with columns ``key`` (string), plus ``text`` / ``payload`` / one
    column per JSON metadata field, whichever member kinds the shards
    carry. Shards parse in parallel (one binary-file read per tar)."""
    import io
    import json
    import tarfile

    raw = ray.data.read_binary_files(path)

    def _decode(b: pa.Table) -> pa.Table:
        samples: dict[str, dict] = {}
        order: list[str] = []
        for v in b.column("bytes"):     # a handful of SHARDS, not rows
            with tarfile.open(fileobj=io.BytesIO(v.as_py())) as tf:
                for m in tf:
                    base, _, ext = m.name.rpartition(".")
                    data = tf.extractfile(m).read()
                    if base not in samples:
                        samples[base] = {}
                        order.append(base)
                    if ext == "txt":
                        samples[base]["text"] = data.decode("utf-8")
                    elif ext == "bin":
                        samples[base]["payload"] = data
                    elif ext == "json":
                        samples[base].update(json.loads(data))
        cols: dict[str, list] = {"key": []}
        for k in order:
            cols["key"].append(k)
        field_names = sorted({f for s in samples.values() for f in s})
        for f in field_names:
            cols[f] = [samples[k].get(f) for k in order]
        out = {"key": pa.array(cols["key"], pa.string())}
        for f in field_names:
            if f == "payload":
                out[f] = pa.array(cols[f], pa.binary())
            else:
                out[f] = pa.array(cols[f])
        return pa.table(out)

    return raw.map_batches(_decode, batch_format="pyarrow")


def write_csv(ds: ray.data.Dataset, path: str) -> int:
    """Write a Dataset as a directory of RFC-4180 CSV files, one per
    block, inside map tasks (atomic pid-suffixed temp + ``os.replace``
    like the IPC/JSONL writers). Exact for int64 / string / bool
    columns (pyarrow's CSV writer quotes embedded commas / quotes /
    newlines); floats, timestamps and binary should ship as parquet or
    IPC. Returns rows written.

    Naming: content hash + the Ray task id + a within-task call
    counter. A RETRIED task replays the same batches in the same order
    under the same task id, so retries rewrite the same file
    (idempotent) — while two DISTINCT blocks that happen to hold
    identical rows (pre-dedup corpora do this) get different names
    instead of silently overwriting each other, which pure
    content-hash naming would do."""
    from pyarrow import csv as pacsv

    os.makedirs(path, exist_ok=True)
    _clear_stale_parts(path, "part-*.csv")
    namer = _unique_part_namer("part", ".csv")

    def _write_block(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"rows": pa.array([], pa.int64())})
        sink = pa.BufferOutputStream()
        pacsv.write_csv(tbl, sink)
        buf = sink.getvalue()
        dst = os.path.join(path, namer(bytes(buf)))
        tmp = f"{dst}.tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, dst)
        return pa.table({"rows": pa.array([tbl.num_rows],
                                          pa.int64())})

    counts = ds.map_batches(_write_block, batch_format="pyarrow",
                            batch_size=None)
    return int(sum(r["rows"] for r in counts.take_all()))


def read_csv(path: str) -> ray.data.Dataset:
    """Read a directory (or single file) of CSV into a streaming
    Dataset — Ray's native block-parallel CSV reader (pyarrow parser;
    per-file type inference reconciled at the schema boundary)."""
    return ray.data.read_csv(path)
