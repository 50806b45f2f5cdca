"""Versioned fragment-manifest table format — the Lance-style layout
(BASELINE.json:15 "Lance image+caption tables") expressed with nothing
but parquet + JSON manifests, so the sandbox (no ``lance`` package, no
network) still exercises the production table semantics end to end:

  <root>/data/v<N>-<k>.parquet      immutable data fragments
  <root>/_deletes/v<N>.parquet      deletion vectors (key lists)
  <root>/_versions/<N>.json         snapshot manifest
  <root>/_versions/_LATEST          atomic current-version pointer

Semantics (the subset of Lance/Iceberg a training-data sink needs):
  * ``append``/``overwrite`` create a NEW immutable snapshot; a reader
    holding version N is never disturbed (time travel: ``read_table(
    version=N)``).
  * ``delete_where_keys`` is O(deleted keys): it writes a deletion
    vector and a new manifest — no data rewrite (the tombstone pattern
    the crawl sink already uses per wave).
  * ``compact`` folds deletion vectors into rewritten fragments — one
    Ray task per fragment, cluster-parallel — and commits the result as
    a new snapshot.
  * Commit protocol is crash-safe: fragments and the manifest are fully
    written BEFORE the ``_LATEST`` pointer flips via atomic
    ``os.replace``; a crash mid-commit leaves the previous version
    intact and only orphan files behind.

Readers apply deletion vectors with a broadcast key filter inside
``map_batches`` (delete files are small by construction; a pathological
delete set is what ``compact`` is for).
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

__all__ = ["append_table", "overwrite_table", "read_table",
           "delete_where_keys", "compact_table", "table_versions",
           "current_version", "expire_snapshots", "upsert_table",
           "read_table_changes"]


def _vdir(root: str) -> str:
    return os.path.join(root, "_versions")


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(_vdir(root), f"{version}.json")


def current_version(root: str) -> int | None:
    p = os.path.join(_vdir(root), "_LATEST")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def table_versions(root: str) -> list[int]:
    if not os.path.isdir(_vdir(root)):
        return []
    return sorted(int(f.split(".")[0]) for f in os.listdir(_vdir(root))
                  if f.endswith(".json"))


def _load_manifest(root: str, version: int | None) -> dict:
    v = current_version(root) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version under {root}")
    with open(_manifest_path(root, v)) as f:
        m = json.load(f)
    m["version"] = v
    return m


def _write_fragments(ds: ray.data.Dataset, root: str,
                     version: int) -> list[str]:
    """Stream ``ds`` into immutable fragment files for snapshot
    ``version``. Uses a staging dir + rename so partially-written
    fragments are never visible to any manifest."""
    data_dir = os.path.join(root, "data")
    os.makedirs(data_dir, exist_ok=True)
    stage = os.path.join(root, f"_stage-{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)
    ds.write_parquet(stage, compression="none")
    frags = []
    for i, f in enumerate(sorted(os.listdir(stage))):
        if not f.endswith(".parquet"):
            continue
        name = f"v{version}-{i:05d}.parquet"
        os.replace(os.path.join(stage, f), os.path.join(data_dir, name))
        frags.append(os.path.join("data", name))
    os.rmdir(stage)
    return frags


def _commit(root: str, version: int, manifest: dict) -> int:
    os.makedirs(_vdir(root), exist_ok=True)
    mp = _manifest_path(root, version)
    tmp = mp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mp)
    ptr = os.path.join(_vdir(root), "_LATEST")
    with open(ptr + ".tmp", "w") as f:
        f.write(str(version))
    os.replace(ptr + ".tmp", ptr)      # the atomic commit point
    return version


def append_table(ds: ray.data.Dataset, root: str,
                 key_col: str = "image_id") -> int:
    """Append a new snapshot: previous fragments + deletes carry over."""
    cur = current_version(root)
    base = _load_manifest(root, cur) if cur is not None else \
        {"fragments": [], "deletes": [], "key_col": key_col}
    v = (cur or 0) + 1
    frags = _write_fragments(ds, root, v)
    return _commit(root, v, {
        "fragments": base["fragments"] + frags,
        "deletes": base["deletes"],
        "key_col": base.get("key_col", key_col),
    })


def overwrite_table(ds: ray.data.Dataset, root: str,
                    key_col: str = "image_id") -> int:
    """Replace the table contents in one new snapshot (old versions stay
    readable — their fragments are immutable)."""
    v = (current_version(root) or 0) + 1
    frags = _write_fragments(ds, root, v)
    return _commit(root, v, {"fragments": frags, "deletes": [],
                             "key_col": key_col})


def delete_where_keys(root: str, keys: pa.Array | list) -> int:
    """O(|keys|) logical delete: write a deletion vector + manifest."""
    m = _load_manifest(root, None)
    v = m["version"] + 1
    ddir = os.path.join(root, "_deletes")
    os.makedirs(ddir, exist_ok=True)
    name = os.path.join("_deletes", f"v{v}.parquet")
    arr = keys if isinstance(keys, (pa.Array, pa.ChunkedArray)) \
        else pa.array(keys)
    pq.write_table(pa.table({"key": arr}), os.path.join(root, name))
    return _commit(root, v, {"fragments": m["fragments"],
                             "deletes": m["deletes"] + [name],
                             "key_col": m["key_col"]})


def _name_version(rel: str) -> int:
    """Snapshot version embedded in a fragment / delete file name
    (``data/v<N>-...`` / ``_deletes/v<N>.parquet``)."""
    base = os.path.basename(rel)
    return int(base[1:].split("-")[0].split(".")[0])


def _delete_keys(root: str, m: dict,
                 frag_version: int | None = None) -> np.ndarray | None:
    """Union of the manifest's deletion vectors. Sequence-number rule
    (what makes ``upsert_table`` correct): a delete vector applies only
    to fragments OLDER than it — pass ``frag_version`` to get the dead
    set for one fragment generation; ``None`` unions everything (the
    pre-upsert behavior, still right for ``delete_where_keys``-only
    tables where every fragment predates every delete)."""
    rel = [d for d in m["deletes"]
           if frag_version is None or _name_version(d) > frag_version]
    if not rel:
        return None
    parts = [pq.read_table(os.path.join(root, d)).column("key")
             .to_numpy(zero_copy_only=False) for d in rel]
    return np.unique(np.concatenate(parts))


def _fragments_by_generation(root: str,
                             fragments: list[str]) -> dict[int, list[str]]:
    """Group fragment paths by the snapshot that wrote them.
    Generations = versions, so everything keyed by this dict is
    O(snapshots), not O(fragments)."""
    by_ver: dict[int, list[str]] = {}
    for f in fragments:
        by_ver.setdefault(_name_version(f), []).append(
            os.path.join(root, f))
    return by_ver


def _generation_schemas(by_ver: dict[int, list[str]]
                        ) -> tuple[dict[int, pa.Schema],
                                   dict[str, pa.Field]]:
    """Per-generation schema (one parquet footer each, no data) and the
    union schema across generations — newest generation's type wins
    (the schema-evolution rule)."""
    gen_schema = {fv: pq.read_schema(files[0])
                  for fv, files in by_ver.items()}
    target_fields: dict[str, pa.Field] = {}
    for fv in sorted(gen_schema):
        for fld in gen_schema[fv]:
            target_fields[fld.name] = fld
    return gen_schema, target_fields


def _resolve_columns(target_fields: dict[str, pa.Field],
                     columns: list[str] | None) -> list[str]:
    want = list(target_fields) if columns is None else list(columns)
    unknown = [c for c in want if c not in target_fields]
    if unknown:
        raise KeyError(f"column(s) {unknown} not in table schema "
                       f"{list(target_fields)}")
    return want


def _read_generation(files: list[str], gen_names: set,
                     want: list[str],
                     target_fields: dict[str, pa.Field], key_col: str,
                     dead: np.ndarray | None) -> ray.data.Dataset:
    """The ONE per-generation reader (shared by ``read_table`` and
    ``read_table_changes``): column-pruned parquet read (the key column
    is fetched when deletes apply, dropped after the filter if not
    requested), broadcast delete-vector anti filter, typed-null padding
    to the union schema."""
    present = [c for c in want if c in gen_names]
    read_cols = present
    if dead is not None and key_col not in read_cols:
        read_cols = present + [key_col]
    ds = ray.data.read_parquet(files, columns=read_cols)
    ref = None if dead is None else ray.put(dead)

    def fix(b: pa.Table) -> pa.Table:
        if ref is not None:
            k = b.column(key_col).to_numpy(zero_copy_only=False)
            b = b.filter(pa.array(~np.isin(k, ray.get(ref))))
        cols = [b.column(c) if c in b.column_names
                else pa.nulls(b.num_rows, target_fields[c].type)
                for c in want]
        return pa.table(dict(zip(want, cols)))

    return ds.map_batches(fix, batch_format="pyarrow")


def read_table(root: str, version: int | None = None,
               columns: list[str] | None = None) -> ray.data.Dataset:
    """Snapshot read (latest, or time travel to ``version``): fragments
    stream as a parquet read; deletion vectors apply as one broadcast
    anti filter. ``columns`` prunes at the read, but the key column is
    fetched when deletes exist (and dropped after the filter if it was
    not requested).

    SCHEMA EVOLUTION: an append/upsert may add columns. Each fragment
    generation is read with its OWN schema and padded with typed nulls
    to the union schema (newest generation wins on type) before the
    union — old snapshots stay byte-identical on disk, old readers see
    old schemas (time travel), new readers see nulls for pre-evolution
    rows. Column metadata comes from one parquet footer per generation
    (O(snapshots) metadata reads, no data). Each generation reads with
    the union of the delete vectors NEWER than it (the sequence-number
    rule upsert_table relies on)."""
    m = _load_manifest(root, version)
    key_col = m["key_col"]
    if not m["fragments"]:
        return ray.data.from_arrow(pa.table({}))
    by_ver = _fragments_by_generation(root, m["fragments"])
    gen_schema, target_fields = _generation_schemas(by_ver)
    want = _resolve_columns(target_fields, columns)
    gens = [_read_generation(files, set(gen_schema[fv].names), want,
                             target_fields, key_col,
                             _delete_keys(root, m, frag_version=fv))
            for fv, files in sorted(by_ver.items())]
    out = gens[0]
    for g in gens[1:]:
        out = out.union(g)
    return out


def _pad_to_schema(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project ``t`` to ``schema``'s column set/order, padding columns
    it lacks with typed nulls (the read/compact half of schema
    evolution)."""
    cols = [t.column(f.name) if f.name in t.column_names
            else pa.nulls(t.num_rows, f.type) for f in schema]
    return pa.table(dict(zip(schema.names, cols)))


@ray.remote
def _fragment_keys(src: str, key_col: str) -> pa.Array:
    """Distinct key column of one fragment (upsert's delete-vector
    derivation — column-pruned read, runs one task per fragment)."""
    return pc.unique(pq.read_table(src, columns=[key_col])
                     .column(key_col))


@ray.remote
def _rewrite_fragment(src: str, dst: str, key_col: str, dead_ref,
                      schema_ref=None) -> int:
    t = pq.read_table(src)
    k = t.column(key_col).to_numpy(zero_copy_only=False)
    kept = t.filter(pa.array(~np.isin(k, dead_ref)))
    if schema_ref is not None:
        kept = _pad_to_schema(kept, schema_ref)
    pq.write_table(kept, dst, compression="none")
    return kept.num_rows


def compact_table(root: str) -> int:
    """Fold deletion vectors into rewritten fragments (one Ray task per
    fragment) and commit the clean file set as a new snapshot. No-op
    version bump when there is nothing to fold."""
    m = _load_manifest(root, None)
    v = m["version"] + 1
    if not m["deletes"]:
        return _commit(root, v, {"fragments": m["fragments"],
                                 "deletes": [], "key_col": m["key_col"]})
    # per-generation dead sets (sequence-number rule — see read_table):
    # a fragment is only filtered by delete vectors newer than it.
    # Rewritten fragments all join the NEW generation, so they are
    # padded to the table's union schema (schema evolution) — one
    # footer read per source generation decides it, newest wins.
    gen_schema: dict[int, pa.Schema] = {}
    for frag in m["fragments"]:
        fv = _name_version(frag)
        if fv not in gen_schema:
            gen_schema[fv] = pq.read_schema(os.path.join(root, frag))
    target_fields: dict[str, pa.Field] = {}
    for fv in sorted(gen_schema):
        for fld in gen_schema[fv]:
            target_fields[fld.name] = fld
    target_schema = pa.schema(list(target_fields.values()))
    schema_ref = ray.put(target_schema)
    dead_refs: dict[int, object] = {}
    data_dir = os.path.join(root, "data")
    new_frags, futures = [], []
    for i, frag in enumerate(m["fragments"]):
        fv = _name_version(frag)
        if fv not in dead_refs:
            d = _delete_keys(root, m, frag_version=fv)
            dead_refs[fv] = None if d is None else ray.put(d)
        name = f"v{v}-{i:05d}.parquet"
        dst = os.path.join(data_dir, name)
        if dead_refs[fv] is None:
            # untouched generation: carry the fragment over as-is (it
            # keeps its version name, so its own schema stays valid)
            new_frags.append(frag)
            continue
        futures.append(_rewrite_fragment.remote(
            os.path.join(root, frag), dst, m["key_col"], dead_refs[fv],
            schema_ref))
        new_frags.append(os.path.join("data", name))
    ray.get(futures)
    return _commit(root, v, {"fragments": new_frags, "deletes": [],
                             "key_col": m["key_col"]})


def expire_snapshots(root: str, keep_last: int = 1) -> dict:
    """Snapshot expiry + vacuum (the Iceberg ``expire_snapshots`` /
    ``remove_orphan_files`` pair): drop all but the newest
    ``keep_last`` version manifests (the ``_LATEST``-pointed version is
    always kept), then delete every data fragment / deletion vector no
    remaining manifest references — including orphans left by a crash
    between fragment write and commit — and any stale staging dirs.

    Ordering is the crash-safe direction: manifests go first (an
    expired version becomes unreadable before its files disappear), so
    a crash mid-vacuum only leaves orphans for the next run. Single-
    admin operation: do not run concurrently with a writer (a live
    ``_stage-*`` dir would be swept).

    Returns ``{"removed_versions": [...], "removed_files": N}``.
    """
    import shutil
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    cur = current_version(root)
    if cur is None:
        return {"removed_versions": [], "removed_files": 0}
    versions = table_versions(root)
    keep = set(versions[-keep_last:]) | {cur}
    drop = [v for v in versions if v not in keep]
    for v in drop:
        os.remove(_manifest_path(root, v))
    referenced: set = set()
    for v in sorted(keep):
        m = _load_manifest(root, v)
        referenced.update(m["fragments"])
        referenced.update(m["deletes"])
    removed_files = 0
    for sub in ("data", "_deletes"):
        d = os.path.join(root, sub)
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            rel = os.path.join(sub, f)
            if f.endswith(".parquet") and rel not in referenced:
                os.remove(os.path.join(root, rel))
                removed_files += 1
    for f in sorted(os.listdir(root)):
        if f.startswith("_stage-"):
            shutil.rmtree(os.path.join(root, f), ignore_errors=True)
    return {"removed_versions": drop, "removed_files": removed_files}


def read_table_changes(root: str, from_version: int,
                       to_version: int | None = None,
                       columns: list[str] | None = None) -> dict:
    """Incremental (change-data-feed) read: everything a consumer that
    has processed snapshot ``from_version`` needs to catch up to
    ``to_version`` (default: latest) WITHOUT rescanning the table.

    Returns ``{"appended": Dataset, "deleted_keys": Dataset,
    "from_version": F, "to_version": T}`` where

      * ``appended`` streams the rows of fragments written by snapshots
        in ``(F, T]``, already filtered by any delete vector in the
        window that is newer than the fragment (a row appended and then
        deleted inside the window never surfaces), padded to the same
        union schema ``read_table(version=T)`` serves;
      * ``deleted_keys`` is the ``(key,)`` plane of the window's delete
        vectors (distinct per vector; a key deleted by two window
        snapshots may appear twice — retraction is idempotent, apply it
        as a set) — the keys the consumer must retract.
        An ``upsert_table`` batch therefore appears as the standard CDC
        pair: its keys in ``deleted_keys`` AND its new rows in
        ``appended`` (retract-then-insert; apply deletes first).

    Replay invariant (tested): state(F) minus ``deleted_keys`` plus
    ``appended`` == state(T) as multisets of rows keyed by ``key_col``.
    Cost is O(changed fragments + window delete vectors) — metadata
    decides everything; untouched generations are never opened.
    ``compact_table``/``overwrite_table`` rewrite fragments, so a
    compaction inside the window degrades to a full re-read (same rule
    as Iceberg's CDC: use changelog-preserving operations between
    incremental consumers) — callers can detect it because ``appended``
    then carries carried-over rows; prefer windows that do not span a
    compaction.
    """
    m = _load_manifest(root, to_version)
    T = m["version"]
    if from_version > T:
        raise ValueError(f"from_version {from_version} is newer than "
                         f"to_version {T}")
    key_col = m["key_col"]

    # union schema of the FULL table at T (what read_table(T) serves),
    # so appended rows line up with the consumer's existing schema
    by_ver_all = _fragments_by_generation(root, m["fragments"])
    gen_schema, target_fields = _generation_schemas(by_ver_all)
    want = _resolve_columns(target_fields, columns)

    # window fragments; window delete vectors (vectors <= F applied
    # before F's snapshot was consumed — only newer ones are news)
    by_ver = {fv: files for fv, files in by_ver_all.items()
              if fv > from_version}
    win_deletes = [d for d in m["deletes"]
                   if _name_version(d) > from_version]

    # each window generation reads via the SAME reader as read_table:
    # deletes newer than a window fragment (fv > F) are themselves
    # inside the window by construction, so the sequence-number dead
    # set is identical to the snapshot read's
    if by_ver:
        gens = [_read_generation(files, set(gen_schema[fv].names), want,
                                 target_fields, key_col,
                                 _delete_keys(root, m, frag_version=fv))
                for fv, files in sorted(by_ver.items())]
        appended = gens[0]
        for g in gens[1:]:
            appended = appended.union(g)
    else:
        appended = ray.data.from_arrow(
            pa.table({c: pa.nulls(0, target_fields[c].type)
                      for c in want}))

    if win_deletes:
        deleted = ray.data.read_parquet(
            [os.path.join(root, d) for d in win_deletes]) \
            .map_batches(lambda b: pa.table(
                {"key": pc.unique(b.column("key"))}),
                batch_format="pyarrow", batch_size=None)
    else:
        # typed empty plane (key type comes from the table key column)
        deleted = ray.data.from_arrow(
            pa.table({"key": pa.nulls(0, target_fields[key_col].type)}))

    return {"appended": appended, "deleted_keys": deleted,
            "from_version": from_version, "to_version": T}


def upsert_table(ds: ray.data.Dataset, root: str,
                 key_col: str | None = None) -> int:
    """Merge-on-read UPSERT in ONE commit: rows of ``ds`` replace any
    existing rows with the same key (a deletion vector over the incoming
    keys) and append as new fragments. Readers of the previous version
    are undisturbed; the new snapshot carries carried-over fragments +
    the new delete file + the new fragments, all committed atomically by
    the single ``_LATEST`` flip. First call on an empty table degrades
    to a plain append. ``compact_table`` folds the accumulated delete
    vectors when merge debt builds up (the merge-on-read contract)."""
    cur = current_version(root)
    if cur is None:
        return append_table(ds, root, key_col=key_col or "image_id")
    m = _load_manifest(root, cur)
    key_col = key_col or m["key_col"]
    if key_col != m["key_col"]:
        raise ValueError(f"table is keyed by {m['key_col']!r}, "
                         f"got {key_col!r}")
    v = cur + 1
    # ONE execution of the (possibly expensive) ingest pipeline: stage
    # the fragments first — they are invisible to every reader until
    # the manifest commits — then derive the deletion vector from the
    # staged files' key column (column-pruned footer-level reads, no
    # recompute), so the delete plane exactly matches the rows written
    # even if upstream stages are nondeterministic
    frags = _write_fragments(ds, root, v)
    # one Ray task per staged fragment re-reads JUST the key column
    # (column-pruned data pages) and distincts it; the driver unions
    # the per-fragment distinct planes — parallel, and bounded by ONE
    # ingest batch's distinct keys, not the table. A crash here leaves
    # orphan fragments for expire_snapshots
    key_parts = ray.get([_fragment_keys.remote(os.path.join(root, f),
                                               key_col) for f in frags])
    keys = pc.unique(pa.concat_tables(
        [pa.table({key_col: p}) for p in key_parts]).column(key_col)) \
        if key_parts else pa.array([])
    ddir = os.path.join(root, "_deletes")
    os.makedirs(ddir, exist_ok=True)
    name = os.path.join("_deletes", f"v{v}.parquet")
    pq.write_table(pa.table({"key": keys}), os.path.join(root, name))
    return _commit(root, v, {
        "fragments": m["fragments"] + frags,
        "deletes": m["deletes"] + [name],
        "key_col": key_col,
    })
