"""Sources/sinks + tombstone compaction (SURVEY.md §2.1)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from paperchase_crawler_ray.pipelines.crawl import RunConfig, crawl
from paperchase_crawler_ray.sources import (compact_images,
                                            last_committed_wave,
                                            read_frontier_checkpoint,
                                            read_image_table, read_seeds,
                                            write_image_table)


@pytest.fixture(scope="module")
def crawl_out(fixture_web, fixture_seeds, crawl_cfg, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("src_crawl"))
    res = crawl(fixture_web, fixture_seeds, out, crawl_cfg, RunConfig(nshards=2))
    return out, res


def test_read_seeds_variants(tmp_path):
    t = read_seeds("fixture:4:8")
    assert t.num_rows == 4 and set(t.column_names) == {"url", "seed_id", "priority"}
    txt = tmp_path / "seeds.txt"
    txt.write_text("http://a.example/\nhttp://b.example/x\n")
    t2 = read_seeds(str(txt))
    assert t2.num_rows == 2
    pqf = tmp_path / "seeds.parquet"
    pq.write_table(t, str(pqf))
    assert read_seeds(str(pqf)).num_rows == 4


def test_checkpoint_readers(crawl_out):
    out, res = crawl_out
    assert last_committed_wave(out) == res.waves_run - 1
    fr = read_frontier_checkpoint(out)
    # either a residual frontier exists or the crawl drained it
    assert fr is None or fr.count() > 0
    assert last_committed_wave("/nonexistent") is None


def test_image_table_roundtrip(crawl_out, tmp_path):
    out, res = crawl_out
    ds = res.images_dataset()
    n = ds.count()
    sink = str(tmp_path / "sink")
    write_image_table(ds, sink)
    back = read_image_table(sink)
    assert back.count() == n
    assert set(back.schema().names) >= {"image_id", "bytes", "w", "h", "fmt",
                                        "caption", "phash"}


def test_compaction_preserves_reader_view(fixture_web, fixture_seeds,
                                          crawl_cfg, tmp_path):
    """Compaction folds tombstones into the files: images_dataset() is
    identical before and after, sidecars are gone, files shrink."""
    out = str(tmp_path / "compact")
    res = crawl(fixture_web, fixture_seeds, out, crawl_cfg, RunConfig(nshards=2))
    before = sorted(res.images_dataset().to_pandas()["image_id"])
    n_sidecars = sum(
        1 for d in os.listdir(out)
        if os.path.exists(os.path.join(out, d, "images_tombstones.parquet")))
    assert n_sidecars == res.waves_run
    dropped = compact_images(out)
    assert dropped >= 0
    after_sidecars = sum(
        1 for d in os.listdir(out)
        if os.path.exists(os.path.join(out, d, "images_tombstones.parquet")))
    assert after_sidecars == 0
    after = sorted(res.images_dataset().to_pandas()["image_id"])
    assert after == before
    # second compaction is a no-op
    assert compact_images(out) == 0


def test_dataset_tombstone_dir_roundtrip(tmp_path):
    """The Dataset-written tombstone DIRECTORY layout (big waves, r3
    verdict wrong #3) with REAL drops: neardup_drops_ds must equal the
    driver-path block computation, images_dataset() must apply the dir
    sidecar on both the broadcast and the forced anti-join read paths,
    and compact_images must fold + remove it."""
    import numpy as np
    import pyarrow as pa

    from paperchase_crawler_ray.ops.dedup import _hash_shuffle
    from paperchase_crawler_ray.pipelines.crawl import CrawlResult
    from paperchase_crawler_ray.stages.image import (neardup_drops_block,
                                                     neardup_drops_ds)

    rng = np.random.default_rng(3)
    n = 200
    # phashes engineered for collisions: 4 shared 16-bit prefixes, and
    # within each bucket half the rows are hamming<=2 from a centroid
    prefixes = np.array([0x1111, 0x2222, 0x3333, 0x4444], np.uint64)
    pref = prefixes[rng.integers(0, 4, n)] << np.uint64(48)
    centroid = rng.integers(0, 1 << 40, n).astype(np.uint64)
    low = np.where(rng.random(n) < 0.5,
                   centroid & np.uint64(0xFFFF),  # near the bucket centroid
                   rng.integers(0, 1 << 48, n).astype(np.uint64))
    ph = (pref | low).view(np.int64)
    ids = np.array([f"img{i:04d}" for i in range(n)])
    narrow = pa.table({
        "image_id": pa.array(ids, pa.string()),
        "phash": pa.array(ph, pa.int64()),
        "bucket": pa.array((ph.view(np.uint64) >> np.uint64(48))
                           .astype(np.int64), pa.int64())})
    want_drops = set(neardup_drops_block(narrow, 2)
                     .column("drop_id").to_pylist())
    assert want_drops, "fixture must produce real near-dup drops"

    nds = ray.data.from_arrow(narrow).repartition(6)
    with _hash_shuffle(nds):
        drops = neardup_drops_ds(nds, 2, partitions=2).materialize()
    got_drops = set(drops.to_pandas()["image_id"])
    assert got_drops == want_drops

    # lay out one committed wave: data files + the dir sidecar
    out = str(tmp_path / "tsdir")
    wd = os.path.join(out, "wave=0")
    img_dir = os.path.join(wd, "images")
    os.makedirs(img_dir)
    rows = pa.table({
        "image_id": pa.array(ids, pa.string()),
        "caption": pa.array([f"cap {i}" for i in range(n)], pa.string()),
        "phash": pa.array(ph, pa.int64()),
        "bucket": narrow.column("bucket")})
    pq.write_table(rows.slice(0, n // 2), os.path.join(img_dir, "p0.parquet"))
    pq.write_table(rows.slice(n // 2), os.path.join(img_dir, "p1.parquet"))
    drops.write_parquet(os.path.join(wd, "images_tombstones"))
    with open(os.path.join(wd, "_COMMITTED"), "w") as f:
        f.write("ok")

    res = CrawlResult(out_dir=out)
    kept = set(ids) - want_drops
    view = res.images_dataset().to_pandas()
    assert set(view["image_id"]) == kept and "bucket" not in view.columns
    view_aj = res.images_dataset(broadcast_max=0).to_pandas()
    assert set(view_aj["image_id"]) == kept
    assert "bucket" not in view_aj.columns

    dropped = compact_images(out)
    assert dropped == len(want_drops)
    assert not os.path.isdir(os.path.join(wd, "images_tombstones"))
    after = res.images_dataset().to_pandas()
    assert set(after["image_id"]) == kept
    assert compact_images(out) == 0


def test_jsonl_roundtrip_exact(tmp_path):
    import ray.data

    from paperchase_crawler_ray.sources import read_jsonl, write_jsonl
    t = pa.table({
        "doc_id": pa.array([3, 1, 2], pa.int64()),
        "text": pa.array(["a b\nc", 'quote " brace', "unicode é"],
                         pa.string()),
        "flag": pa.array([True, False, True]),
    })
    out = str(tmp_path / "jl")
    write_jsonl(ray.data.from_arrow(t), out)
    back = read_jsonl(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    orig = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back[orig.columns.tolist()].equals(orig)


def test_arrow_ipc_roundtrip_bit_exact(tmp_path):
    import numpy as np
    import ray.data

    from paperchase_crawler_ray.sources import (read_arrow_ipc,
                                                write_arrow_ipc)
    # IPC must carry what JSON cannot: timestamps, binary, list<float>
    t = pa.table({
        "k": pa.array(range(100), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(100)],
                       pa.timestamp("us")),
        "payload": pa.array([bytes([i, 255 - i]) for i in range(100)],
                            pa.binary()),
        "vec": pa.array([[float(i), i / 3.0] for i in range(100)],
                        pa.list_(pa.float32())),
    })
    out = str(tmp_path / "ipc")
    n = write_arrow_ipc(
        ray.data.from_arrow(t).repartition(4), out)
    assert n == 100
    files = [f for f in os.listdir(out) if f.endswith(".arrow")]
    assert len(files) >= 2 and not any(".tmp" in f for f in files)
    back = read_arrow_ipc(out).to_pandas().sort_values("k") \
        .reset_index(drop=True)
    orig = t.to_pandas()
    assert back["ts"].equals(orig["ts"])
    assert list(back["payload"]) == list(orig["payload"])
    assert all(np.array_equal(a, b)
               for a, b in zip(back["vec"], orig["vec"]))


def test_jsonl_gzip_roundtrip(tmp_path):
    import ray.data

    from paperchase_crawler_ray.sources import read_jsonl, write_jsonl
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["hello world", "unicode é ok"])})
    out = str(tmp_path / "gz")
    write_jsonl(ray.data.from_arrow(t), out, compression="gzip")
    files = os.listdir(out)
    assert files and all(f.endswith(".jsonl.gz") for f in files)
    back = read_jsonl(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert back[["doc_id", "text"]].equals(t.to_pandas())


def test_webdataset_binary_roundtrip(tmp_path):
    import ray.data

    from paperchase_crawler_ray.sources import (read_webdataset,
                                                write_webdataset)
    t = pa.table({
        "image_id": pa.array([f"img{i:03d}" for i in range(50)]),
        "caption": pa.array([f"caption {i} é" for i in range(50)]),
        "bytes": pa.array([bytes([i % 256]) * (i + 1) for i in range(50)],
                          pa.binary()),
        "w": pa.array([i * 2 for i in range(50)], pa.int64()),
    })
    out = str(tmp_path / "wds")
    n = write_webdataset(ray.data.from_arrow(t).repartition(3), out,
                         key_col="image_id", text_col="caption",
                         bytes_col="bytes", meta_cols=["w"])
    assert n == 50
    shards = [f for f in os.listdir(out) if f.endswith(".tar")]
    assert len(shards) >= 2
    back = read_webdataset(out).to_pandas().sort_values("key") \
        .reset_index(drop=True)
    orig = t.to_pandas().sort_values("image_id").reset_index(drop=True)
    assert list(back["key"]) == list(orig["image_id"])
    assert list(back["text"]) == list(orig["caption"])
    assert list(back["payload"]) == list(orig["bytes"])
    assert list(back["w"]) == list(orig["w"])


def test_webdataset_shards_deterministic(tmp_path):
    """Same block -> same shard bytes (mtime pinned to 0), so a retried
    task rewrites identical content under the identical name."""
    import ray.data

    from paperchase_crawler_ray.sources import write_webdataset
    t = pa.table({"k": pa.array(["a", "b"]),
                  "txt": pa.array(["one", "two"])})
    o1, o2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    write_webdataset(ray.data.from_arrow(t), o1, "k", text_col="txt")
    write_webdataset(ray.data.from_arrow(t), o2, "k", text_col="txt")
    f1, f2 = sorted(os.listdir(o1)), sorted(os.listdir(o2))
    assert f1 == f2
    assert open(os.path.join(o1, f1[0]), "rb").read() == \
        open(os.path.join(o2, f2[0]), "rb").read()


def test_csv_roundtrip_exact(ray_session, tmp_path):
    """CSV sink+source roundtrip is exact for int64/string/bool,
    including strings with embedded commas, quotes and newlines
    (RFC-4180 quoting)."""
    import pandas as pd
    from paperchase_crawler_ray.sources import read_csv, write_csv
    df = pd.DataFrame({
        "k": range(50),
        "s": [f"row {i}, \"quoted\"\nsecond line" if i % 3 == 0
              else f"plain-{i}" for i in range(50)],
        "flag": [i % 2 == 0 for i in range(50)]})
    out = str(tmp_path / "csv")
    n = write_csv(ray.data.from_pandas(df).repartition(4), out)
    assert n == 50
    got = read_csv(out).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "s", "flag"]],
                                  df.sort_values("k").reset_index(drop=True))


def test_jsonl_gz_and_ipc_keep_identical_blocks(ray_session, tmp_path):
    """The gzip-JSONL and Arrow IPC sinks keep BOTH of two distinct
    blocks holding identical rows (content-hash-only naming overwrote
    one; review fix — write_webdataset keeps pure content naming
    because its tar bytes embed every sample key)."""
    import glob
    import pandas as pd
    from paperchase_crawler_ray.sources import (read_arrow_ipc,
                                                read_jsonl,
                                                write_arrow_ipc,
                                                write_jsonl)
    df = pd.DataFrame({"k": [1, 2]})
    ds = ray.data.from_pandas([df.copy(), df.copy()])
    gz = str(tmp_path / "gz")
    write_jsonl(ds, gz, compression="gzip")
    assert len(glob.glob(gz + "/*.jsonl.gz")) == 2
    assert sorted(read_jsonl(gz).to_pandas()["k"]) == [1, 1, 2, 2]
    ipc = str(tmp_path / "ipc")
    n = write_arrow_ipc(ds, ipc)
    assert n == 4
    assert len(glob.glob(ipc + "/*.arrow")) == 2
    assert sorted(read_arrow_ipc(ipc).to_pandas()["k"]) == [1, 1, 2, 2]


def test_per_block_sinks_rerun_idempotent(ray_session, tmp_path):
    """Re-running a write into the SAME directory replaces the previous
    run's parts instead of doubling data (the task-salted part names
    differ run-to-run, so without the driver-side stale-part sweep a
    reader would see both runs' rows)."""
    import glob
    import pandas as pd
    from paperchase_crawler_ray.sources import (read_arrow_ipc, read_csv,
                                                read_jsonl,
                                                read_webdataset,
                                                write_arrow_ipc,
                                                write_csv, write_jsonl,
                                                write_webdataset)
    first = pd.DataFrame({"k": list(range(10)),
                          "s": [f"a{i}" for i in range(10)]})
    second = pd.DataFrame({"k": list(range(100, 104)),
                           "s": [f"b{i}" for i in range(4)]})

    def ds(df, parts):
        return ray.data.from_pandas(df).repartition(parts)

    gz = str(tmp_path / "gz")
    write_jsonl(ds(first, 3), gz, compression="gzip")
    write_jsonl(ds(second, 2), gz, compression="gzip")
    assert sorted(read_jsonl(gz).to_pandas()["k"]) == [100, 101, 102, 103]

    jl = str(tmp_path / "jl")
    write_jsonl(ds(first, 3), jl)
    write_jsonl(ds(second, 2), jl)
    assert sorted(read_jsonl(jl).to_pandas()["k"]) == [100, 101, 102, 103]

    ipc = str(tmp_path / "ipc")
    write_arrow_ipc(ds(first, 3), ipc)
    assert write_arrow_ipc(ds(second, 2), ipc) == 4
    assert sorted(read_arrow_ipc(ipc).to_pandas()["k"]) == \
        [100, 101, 102, 103]

    csv = str(tmp_path / "csv")
    write_csv(ds(first, 3), csv)
    assert write_csv(ds(second, 2), csv) == 4
    assert sorted(read_csv(csv).to_pandas()["k"]) == [100, 101, 102, 103]

    wd = str(tmp_path / "wd")
    kf = first.rename(columns={"k": "key_", "s": "txt"})
    ks = second.rename(columns={"k": "key_", "s": "txt"})
    kf["key_"] = kf["key_"].astype(str)
    ks["key_"] = ks["key_"].astype(str)
    write_webdataset(ds(kf, 3), wd, key_col="key_", text_col="txt")
    assert write_webdataset(ds(ks, 2), wd, key_col="key_",
                            text_col="txt") == 4
    assert sorted(read_webdataset(wd).to_pandas()["key"]) == \
        ["100", "101", "102", "103"]
    # orphaned tmp files from a killed task are swept too
    open(f"{csv}/part-dead.csv.tmp123", "w").close()
    write_csv(ds(second, 1), csv)
    assert not glob.glob(csv + "/*.tmp*")
