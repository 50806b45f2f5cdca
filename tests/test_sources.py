"""Sources/sinks + tombstone compaction (SURVEY.md §2.1)."""

import os

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
