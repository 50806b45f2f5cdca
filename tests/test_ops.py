"""Pure-Python naive twins for the training-data operators (dedup /
similarity / textstats / multimodal). Each Ray op must reproduce its
naive twin exactly (same semantics, same determinism) on real sf0.001
driver tables."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data

from paperchase_crawler_ray.functions.texthash import (jaccard, ngram_set,
                                                       simhash64, tokens)
from paperchase_crawler_ray.functions.phash import hamming64
from paperchase_crawler_ray.ops.dedup import (band_keys, embedding_lsh_dedup,
                                              embedding_neardup_dedup,
                                              minhash_lsh_dedup,
                                              minhash_params32, minhash_sig32,
                                              ngram_jaccard_dedup,
                                              simhash_dedup)
from paperchase_crawler_ray.ops.dedup import _ngram_hashes, word_shingles
from paperchase_crawler_ray.ops.relational import (broadcast_anti_join,
                                                   broadcast_semi_join,
                                                   exact_dedup, global_topk)
from paperchase_crawler_ray.ops.similarity import brute_force_topk, ivf_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_table():
    return pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def emb_table():
    return pq.read_table(f"{SF}/embeddings.parquet")


def _docs_ds(docs_table):
    return ray.data.from_arrow(docs_table)


# -- dedup -------------------------------------------------------------------

def _naive_lsh_drops(ids, texts, sig_fn, bands, verify_fn, threshold):
    """Reference LSH-dedup: bucket -> pairs -> verify -> drop larger id."""
    buckets: dict = {}
    for i, t in zip(ids, texts):
        for bk in band_keys(sig_fn(t), bands):
            buckets.setdefault(bk, []).append(i)
    pairs = set()
    for members in buckets.values():
        ms = sorted(set(members))[:64]
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                pairs.add((ms[x], ms[y]))
    lookup = dict(zip(ids, texts))
    return {b for a, b in pairs if verify_fn(lookup[a], lookup[b]) >= threshold}


def test_minhash_lsh_dedup_matches_naive(docs_table):
    ids = docs_table.column("doc_id").to_pylist()
    texts = docs_table.column("text").to_pylist()
    a, b = minhash_params32(128)

    def sig(t):
        return minhash_sig32(word_shingles(t, 3), a, b)

    def verify(t1, t2):
        def s(t):
            tk = tokens(t)
            return {" ".join(tk[i:i + 3]) for i in range(len(tk) - 2)} if len(tk) >= 3 \
                else ({" ".join(tk)} if tk else set())
        return jaccard(s(t1), s(t2))

    drops = _naive_lsh_drops(ids, texts, sig, 16, verify, 0.6)
    want = sorted(set(ids) - drops)
    got = sorted(minhash_lsh_dedup(_docs_ds(docs_table), "doc_id", "text",
                                   threshold=0.6).to_pandas()["doc_id"])
    assert got == want
    assert len(want) < len(ids)  # the op actually drops something


def test_ngram_dedup_matches_naive(docs_table):
    ids = docs_table.column("doc_id").to_pylist()
    texts = docs_table.column("text").to_pylist()
    a, b = minhash_params32(128)

    def sig(t):
        return minhash_sig32(_ngram_hashes(t, 5), a, b)

    def verify(t1, t2):
        return jaccard(ngram_set(t1, 5), ngram_set(t2, 5))

    drops = _naive_lsh_drops(ids, texts, sig, 32, verify, 0.8)
    want = sorted(set(ids) - drops)
    got = sorted(ngram_jaccard_dedup(_docs_ds(docs_table), "doc_id", "text",
                                     threshold=0.8).to_pandas()["doc_id"])
    assert got == want


def test_simhash_dedup_matches_naive(docs_table):
    ids = np.array(docs_table.column("doc_id").to_pylist())
    texts = docs_table.column("text").to_pylist()
    sigs = np.array([simhash64(t) for t in texts], np.int64)
    buckets: dict = {}
    for i in range(len(ids)):
        u = sigs[i:i + 1].view(np.uint64)[0]
        for bi in range(4):
            key = (bi << 16) | int((u >> np.uint64(16 * bi)) & np.uint64(0xFFFF))
            buckets.setdefault(key, []).append(i)
    drops = set()
    for members in buckets.values():
        ms = sorted(set(members))
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                if hamming64(sigs[ms[x]:ms[x] + 1], sigs[ms[y]:ms[y] + 1])[0] <= 3:
                    drops.add(int(ids[ms[y]]))
    want = sorted(set(ids.tolist()) - drops)
    got = sorted(simhash_dedup(_docs_ds(docs_table), "doc_id", "text",
                               hamming_max=3).to_pandas()["doc_id"])
    assert got == want
    assert len(want) < len(ids)


def _norm(m):
    m = m.astype(np.float64)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def test_embedding_neardup_matches_naive(emb_table):
    ids = np.array(emb_table.column("vec_id").to_pylist())
    E = _norm(np.stack([np.asarray(v) for v in
                        emb_table.column("embedding").to_pylist()]))
    order = np.argsort(ids)
    ids_s, E_s = ids[order], E[order]
    S = E_s @ E_s.T
    t = 0.32
    dominated = np.triu(S >= t, k=1).any(axis=0)
    want = sorted(ids_s[~dominated].tolist())
    ds = ray.data.from_arrow(emb_table)
    got = sorted(embedding_neardup_dedup(ds, threshold=t).to_pandas()["vec_id"])
    assert got == want
    assert 0 < len(want) < len(ids)


def test_embedding_lsh_recall(emb_table):
    """The LSH-bucketed scale path must keep a superset of the exact
    survivors (it can only MISS duplicate pairs, never invent them)."""
    ds = ray.data.from_arrow(emb_table)
    exact = set(embedding_neardup_dedup(ds, threshold=0.32).to_pandas()["vec_id"])
    approx = set(embedding_lsh_dedup(ds, dim=64, threshold=0.32,
                                     nbits=6).to_pandas()["vec_id"])
    assert exact <= approx


def test_exact_dedup_matches_pandas(docs_table):
    df = pd.DataFrame({
        "k": [1, 1, 2, 2, 2, 3],
        "v": [5, 4, 9, 9, 1, 0],
        "id": [10, 11, 12, 13, 14, 15],
    })
    ds = ray.data.from_pandas(df)
    got = exact_dedup(ds, ["k"], [("v", False), ("id", False)]).to_pandas()
    got = got.sort_values("k").reset_index(drop=True)
    assert got["id"].tolist() == [11, 14, 15]


def test_broadcast_joins():
    left = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4], "x": list("abcd")}))
    right = ray.data.from_pandas(pd.DataFrame({"j": [2, 4, 9]}))
    anti = broadcast_anti_join(left, "k", right, "j").to_pandas()
    semi = broadcast_semi_join(left, "k", right, "j").to_pandas()
    assert sorted(anti["k"]) == [1, 3]
    assert sorted(semi["k"]) == [2, 4]


def test_global_topk_deterministic():
    df = pd.DataFrame({"v": [3.0, 3.0, 2.0, 5.0, 3.0], "id": [4, 2, 9, 7, 3]})
    ds = ray.data.from_pandas(df)
    got = global_topk(ds, [("v", True), ("id", False)], 3).to_pandas()
    assert got["id"].tolist() == [7, 2, 3]


# -- similarity --------------------------------------------------------------

def test_brute_force_topk_matches_naive(emb_table):
    ids = np.array(emb_table.column("vec_id").to_pylist())
    E = _norm(np.stack([np.asarray(v) for v in
                        emb_table.column("embedding").to_pylist()]))
    qids = [0, 5, 7]
    ds = ray.data.from_arrow(emb_table)
    got = brute_force_topk(ds, qids, k=4).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    for q in qids:
        Q = E[ids == q][0]
        sims = E @ Q
        order = np.lexsort((ids, -sims))[:4]
        want = ids[order].tolist()
        sub = got[got["query_id"] == q]
        assert sub["vec_id"].tolist() == want
        assert sub["rank"].tolist() == [1, 2, 3, 4]


def test_ivf_recall(emb_table):
    ds = ray.data.from_arrow(emb_table)
    qids = [0, 5, 7, 11]
    exact = brute_force_topk(ds, qids, k=5).to_pandas()
    approx = ivf_topk(ds, qids, k=5, ncell=8, nprobe=3).to_pandas()
    hits = tot = 0
    for q in qids:
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        hits += len(e & a)
        tot += len(e)
    assert hits / tot >= 0.5  # nprobe=3/8 cells: recall well above chance


# -- textstats ---------------------------------------------------------------

def test_textstats_match_re(docs_table):
    from paperchase_crawler_ray.ops.textstats import (STOPWORDS,
                                                      quality_stats_batch)
    texts = docs_table.column("text").to_pylist()
    out = quality_stats_batch(docs_table)
    wre = re.compile(r"\w+")
    for i in (0, 1, 17, 100, len(texts) - 1):
        toks = [w.lower() for w in wre.findall(texts[i])]
        assert out.column("n_tokens")[i].as_py() == len(toks)
        assert out.column("n_uniq")[i].as_py() == len(set(toks))
        assert out.column("n_stop")[i].as_py() == sum(
            1 for w in toks if w in set(STOPWORDS))


def test_langid_deterministic_and_sane(docs_table):
    from paperchase_crawler_ray.ops.textstats import language_id_batch
    out1 = language_id_batch(docs_table)
    out2 = language_id_batch(docs_table)
    assert out1.column("lang_pred").to_pylist() == out2.column("lang_pred").to_pylist()
    assert language_id_batch(
        pa.table({"text": pa.array(["the cat and the dog in the house"])})
    ).column("lang_pred")[0].as_py() == "en"
    assert language_id_batch(
        pa.table({"text": pa.array(["der hund und der schein ein buch"])})
    ).column("lang_pred")[0].as_py() == "de"
    assert language_id_batch(
        pa.table({"text": pa.array(["这是一个中文句子的测试文本"])})
    ).column("lang_pred")[0].as_py() == "zh"
    assert language_id_batch(
        pa.table({"text": pa.array([""])})).column("lang_pred")[0].as_py() == "und"


def test_quality_score_bounds(docs_table):
    from paperchase_crawler_ray.ops.textstats import quality_score_batch
    q = quality_score_batch(docs_table).column("quality").to_numpy()
    assert ((q >= 0) & (q <= 1)).all()
    assert q.std() > 0  # non-degenerate


# -- multimodal --------------------------------------------------------------

def test_image_features_match_fixture():
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.ops.multimodal import image_features
    rows = make_image_rows(24)
    ds = ray.data.from_arrow(rows.select(["image_id", "bytes"]))
    got = image_features(ds, batch_size=8).to_pandas().set_index("image_id")
    want = rows.to_pandas().set_index("image_id")
    assert len(got) == 24
    for iid in want.index:
        assert got.loc[iid, "w"] == want.loc[iid, "w"]
        assert got.loc[iid, "h"] == want.loc[iid, "h"]
        assert got.loc[iid, "fmt"] == want.loc[iid, "fmt"]
        assert got.loc[iid, "phash"] == want.loc[iid, "phash"]
        assert len(got.loc[iid, "thumb"]) == 64


def test_audio_video_fake_backends():
    from paperchase_crawler_ray.ops.multimodal import (AudioDecode,
                                                       VideoFrameSample)
    batch = pa.table({
        "media_id": pa.array(["m1", "m2"]),
        "payload": pa.array([b"x" * 1000, b"y" * 500], pa.binary()),
        "codec": pa.array(["fake", "fake"]),
        "sample_rate": pa.array([16000, 8000], pa.int32()),
    })
    a1 = AudioDecode(backend="fake")(batch)
    a2 = AudioDecode(backend="fake")(batch)
    assert a1.column("rms").to_pylist() == a2.column("rms").to_pylist()
    vbatch = pa.table({
        "media_id": pa.array(["v1"]),
        "payload": pa.array([b"z" * 100], pa.binary()),
        "n_frames": pa.array([25], pa.int32()),
    })
    frames = VideoFrameSample(stride=10, backend="fake")(vbatch)
    assert frames.column("frame_idx").to_pylist() == [0, 10, 20]
    assert all(len(x) == 64 for x in frames.column("frame_bytes").to_pylist())


def test_audio_real_wav_decode_matches_signal_math():
    """backend='real' (now the default) decodes true PCM WAV: duration
    from the container, RMS ≈ amp/√2 for a pure sine (VERDICT r2 #3)."""
    from paperchase_crawler_ray.functions.av import wav_decode, wav_encode
    from paperchase_crawler_ray.ops.multimodal import AudioDecode
    rate = 8000
    t = np.arange(rate, dtype=np.float64) / rate  # exactly 1 second
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    payload = wav_encode(x, rate)
    # encode/decode round-trip is exact at int16 resolution
    back, r2 = wav_decode(payload)
    assert r2 == rate and back.shape == (rate, 1)
    assert np.abs(back[:, 0] - x).max() <= 1.0 / 32767
    batch = pa.table({
        "media_id": pa.array(["a"]), "payload": pa.array([payload], pa.binary()),
        "codec": pa.array(["wav"]), "sample_rate": pa.array([rate], pa.int32()),
        "n_channels": pa.array([1], pa.int32())})
    out = AudioDecode()(batch)
    assert out.column("duration_sec")[0].as_py() == 1.0
    assert abs(out.column("rms")[0].as_py() - 0.5 / np.sqrt(2)) < 1e-3
    # stereo + fixture generator path
    from paperchase_crawler_ray.fixtures import make_audio_rows
    rows = make_audio_rows(6)
    feats = AudioDecode()(rows)
    assert feats.num_rows == 6 and all(
        d > 0 for d in feats.column("duration_sec").to_pylist())


def test_video_real_mjpeg_frame_sampler():
    """backend='real' splits MJPEG by marker scan and decodes sampled
    frames with the engine's own JPEG codec (VERDICT r2 #3)."""
    from paperchase_crawler_ray.fixtures import make_pixels, make_video_rows
    from paperchase_crawler_ray.functions.av import mjpeg_split
    from paperchase_crawler_ray.functions.codec import psnr
    from paperchase_crawler_ray.functions.jpeg import jpeg_decode
    from paperchase_crawler_ray.ops.multimodal import VideoFrameSample
    rows = make_video_rows(3)
    nf = rows.column("n_frames").to_pylist()
    # split recovers exactly n_frames spans
    for payload, n in zip(rows.column("payload").to_pylist(), nf):
        assert len(mjpeg_split(payload)) == n
    out = VideoFrameSample(stride=2)(rows)
    got = out.to_pandas()
    for mid, n in zip(rows.column("media_id").to_pylist(), nf):
        sub = got[got.media_id == mid]
        assert sub.frame_idx.tolist() == list(range(0, n, 2))
    # sampled frame bytes are decodable JPEG at the fixture geometry,
    # faithful to the source pixels (lossy path, PSNR gate)
    r0 = got.iloc[0]
    px = jpeg_decode(r0.frame_bytes)
    assert px.shape == (16, 24, 3) and (r0.w, r0.h) == (24, 16)
    src = make_pixels(f"{r0.media_id}/f{r0.frame_idx}", 24, 16)
    assert psnr(px, src) >= 30.0


# -- windowed / as-of operators ---------------------------------------------

def test_sessionize_matches_naive():
    from paperchase_crawler_ray.ops.relational import sessionize
    rng = np.random.Generator(np.random.PCG64(7))
    base = np.datetime64("2026-01-01T00:00:00", "us")
    users = rng.integers(0, 12, 300)
    ts = base + rng.integers(0, 86_400_000_000, 300).astype("timedelta64[us]")
    ids = np.arange(300)
    df = pd.DataFrame({"user_id": users, "ts": ts, "event_id": ids})
    ds = ray.data.from_pandas(df)
    got = sessionize(ds, "user_id", "ts", gap_minutes=30.0,
                     tie_col="event_id").to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    gap = np.timedelta64(30 * 60_000_000, "us")
    want = {}
    for u, g in df.groupby("user_id"):
        t = np.sort(g["ts"].to_numpy())
        want[u] = 1 + int((np.diff(t) > gap).sum())
    assert dict(zip(got["user_id"], got["n_sessions"])) == want


def test_asof_join_matches_naive():
    from paperchase_crawler_ray.ops.relational import asof_join_with_id
    rng = np.random.Generator(np.random.PCG64(8))
    base = np.datetime64("2026-01-01T00:00:00", "us")
    ev = pd.DataFrame({
        "event_id": np.arange(200),
        "user_id": rng.integers(0, 10, 200),
        "ts": base + rng.integers(0, 1_000_000_000, 200).astype("timedelta64[us]"),
    })
    orders = pd.DataFrame({
        "o_custkey": rng.integers(0, 12, 50),
        "o_orderdate": base + rng.integers(-100_000_000, 900_000_000, 50)
        .astype("timedelta64[us]"),
    })
    got = asof_join_with_id(ray.data.from_pandas(ev),
                            ray.data.from_pandas(orders),
                            "user_id", "o_custkey", "ts", "o_orderdate",
                            "event_id").to_pandas() \
        .set_index("event_id")["matched_ts"]
    for row in ev.itertuples():
        cand = orders[(orders["o_custkey"] == row.user_id)
                      & (orders["o_orderdate"] <= row.ts)]["o_orderdate"]
        want = cand.max() if len(cand) else pd.NaT
        g = got.loc[row.event_id]
        assert (pd.isna(g) and pd.isna(want)) or g == want, row.event_id


def test_image_augment_deterministic_and_real():
    from paperchase_crawler_ray.fixtures import make_image_rows, make_pixels
    from paperchase_crawler_ray.functions.codec import decode
    from paperchase_crawler_ray.ops.multimodal import ImageAugment
    rows = make_image_rows(6)
    aug = ImageAugment()
    out1 = aug(rows.select(["image_id", "bytes"]))
    out2 = aug(rows.select(["image_id", "bytes"]))
    assert out1.column("phash").to_pylist() == out2.column("phash").to_pylist()
    assert out1.num_rows == 6 * 3
    by = {(i, a): b for i, a, b in zip(out1.column("image_id").to_pylist(),
                                       out1.column("aug").to_pylist(),
                                       out1.column("bytes").to_pylist())}
    # row 1 is png (lossless), so exact pixel equality is well-defined;
    # row 0 is the lossy jpeg class
    iid = rows.column("image_id")[1].as_py()
    w = rows.column("w")[1].as_py(); h = rows.column("h")[1].as_py()
    orig = make_pixels(iid, w, h)
    assert (decode(by[(iid, "hflip")]) == orig[:, ::-1]).all()
    cropped = decode(by[(iid, "crop")])
    assert cropped.shape[0] == max(1, int(h * 0.8))
    bright = decode(by[(iid, "bright")])
    assert bright.astype(int).sum() >= orig.astype(int).sum()


def test_kmeans_distributed_deterministic_and_usable(emb_table):
    from paperchase_crawler_ray.ops.similarity import kmeans_distributed
    ds = ray.data.from_arrow(emb_table)
    C1 = kmeans_distributed(ds, ncell=6, iters=3)
    C2 = kmeans_distributed(ds, ncell=6, iters=3)
    assert (C1 == C2).all()  # deterministic: sorted-block-order reduce
    assert C1.shape == (6, 64)
    assert np.allclose(np.linalg.norm(C1, axis=1), 1.0)
    # distributed-kmeans IVF keeps reasonable recall vs brute force
    qids = [0, 5, 7]
    exact = brute_force_topk(ds, qids, k=5).to_pandas()
    approx = ivf_topk(ds, qids, k=5, ncell=6, nprobe=3,
                      distributed_kmeans=True).to_pandas()
    hits = tot = 0
    for q in qids:
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        hits += len(e & a); tot += len(e)
    assert hits / tot >= 0.4


def test_ann_training_layout_independent(emb_table):
    """The seeded hash-sample makes IVF/PQ/k-means training start from
    the SAME rows in the SAME order across block layouts: identical
    centroids/codebooks for a 2-block and a shuffled 7-block layout of
    the same data (VERDICT r4 next #7)."""
    from paperchase_crawler_ray.ops.similarity import (kmeans_lite,
                                                       pq_train,
                                                       seeded_vector_sample)
    perm = np.random.Generator(np.random.PCG64(5)) \
        .permutation(emb_table.num_rows)
    ds_a = ray.data.from_arrow(emb_table).repartition(2)
    ds_b = ray.data.from_arrow(
        emb_table.take(pa.array(perm))).repartition(7)
    s_a = seeded_vector_sample(ds_a, 64)
    s_b = seeded_vector_sample(ds_b, 64)
    assert s_a.shape == (64, 64)
    np.testing.assert_array_equal(s_a, s_b)
    np.testing.assert_array_equal(kmeans_lite(s_a, 6), kmeans_lite(s_b, 6))
    np.testing.assert_array_equal(
        pq_train(ds_a, m=8, ksub=8, sample_n=64),
        pq_train(ds_b, m=8, ksub=8, sample_n=64))
    # sample smaller than the dataset really is a strict subset
    assert len(seeded_vector_sample(ds_a, 10_000)) == emb_table.num_rows


def test_document_clusters_string_ids(docs_table, ray_session):
    """hashed_doc_vectors / document_clusters accept STRING doc ids
    (real corpora use them): vec_id is a stable hash, clusters are
    identical to the int-id run on the same texts (ADVICE r4)."""
    from paperchase_crawler_ray.ops.textstats import document_clusters
    t = docs_table.slice(0, 200)
    s = t.set_column(0, "doc_id",
                     pc.cast(t.column("doc_id"), pa.string()))
    got = document_clusters(ray.data.from_arrow(s), n_clusters=4,
                            iters=2).to_pandas()
    assert len(got) == 200 and got["doc_id"].dtype == object
    assert set(got["doc_id"]) == set(
        str(i) for i in t.column("doc_id").to_pylist())
    assert got["cluster"].between(0, 3).all()


# -- round-2 scale paths (VERDICT.md next-round items 5-7, ADVICE fixes) -----

def test_lsh_candidate_pairs_dataset_path_matches_driver(docs_table):
    """The distributed pair plane (driver_max=0: band-keyed shuffle ->
    per-block pairs -> pair-keyed shuffle -> distinct) must return a
    DATASET with exactly the driver path's unique pair set
    (VERDICT r3 weak #1)."""
    from paperchase_crawler_ray.ops.dedup import (MinHashSignatures,
                                                  lsh_candidate_pairs)
    bands = _docs_ds(docs_table).map_batches(
        MinHashSignatures, fn_constructor_args=("doc_id", "text", 128, 16, 3),
        batch_format="pyarrow", concurrency=(1, 2))
    want = lsh_candidate_pairs(bands, "doc_id").to_pandas()
    got_ds = lsh_candidate_pairs(bands, "doc_id", driver_max=0)
    assert isinstance(got_ds, ray.data.Dataset)
    got = got_ds.to_pandas()
    assert len(got) == len(got.drop_duplicates())  # globally distinct
    assert (set(zip(got.id_a, got.id_b))
            == set(zip(want.id_a, want.id_b)))


def test_minhash_dedup_distributed_pair_plane(docs_table, monkeypatch):
    """End-to-end minhash dedup with the pair plane FORCED distributed
    (the 100-TB path): survivors must match the default plan."""
    import paperchase_crawler_ray.ops.dedup as dd
    ds = _docs_ds(docs_table)
    want = sorted(minhash_lsh_dedup(ds, "doc_id", "text",
                                    threshold=0.6).to_pandas()["doc_id"])
    orig = dd.lsh_candidate_pairs
    monkeypatch.setattr(
        dd, "lsh_candidate_pairs",
        lambda b, c, **kw: orig(b, c, **{**kw, "driver_max": 0}))
    got = sorted(minhash_lsh_dedup(ds, "doc_id", "text", threshold=0.6,
                                   broadcast_max_docs=0)
                 .to_pandas()["doc_id"])
    assert got == want


def test_minhash_join_verify_path_matches_broadcast(docs_table):
    """Forcing the Dataset.join verification path (broadcast_max_docs=0)
    must keep exactly the same documents as the broadcast path."""
    ds = _docs_ds(docs_table)
    want = sorted(minhash_lsh_dedup(ds, "doc_id", "text",
                                    threshold=0.6).to_pandas()["doc_id"])
    got = sorted(minhash_lsh_dedup(ds, "doc_id", "text", threshold=0.6,
                                   broadcast_max_docs=0).to_pandas()["doc_id"])
    assert got == want


def test_ngram_join_verify_path_matches_broadcast(docs_table):
    ds = _docs_ds(docs_table)
    want = sorted(ngram_jaccard_dedup(ds, "doc_id", "text",
                                      threshold=0.8).to_pandas()["doc_id"])
    got = sorted(ngram_jaccard_dedup(ds, "doc_id", "text", threshold=0.8,
                                     broadcast_max_docs=0).to_pandas()["doc_id"])
    assert got == want


def test_keyed_joins_match_broadcast():
    """anti_join/semi_join with broadcast_max=0 exercise Ray's native
    left_anti/left_semi hash join (the large-right-side path)."""
    from paperchase_crawler_ray.ops.relational import anti_join, semi_join
    left = ray.data.from_pandas(
        pd.DataFrame({"k": [1, 2, 3, 4, 2], "x": list("abcde")}))
    right = ray.data.from_pandas(pd.DataFrame({"j": [2, 4, 9, 2]}))
    anti = anti_join(left, "k", right, "j", broadcast_max=0,
                     num_partitions=4).to_pandas()
    semi = semi_join(left, "k", right, "j", broadcast_max=0,
                     num_partitions=4).to_pandas()
    assert sorted(anti["k"]) == [1, 3]
    assert sorted(semi["k"]) == [2, 2, 4]  # left multiplicity preserved
    # duplicate right keys must not duplicate left rows in the semi join
    assert len(semi) == 3


def test_embed_neardup_size_switch_routes_to_lsh(emb_table):
    """Above exact_max_rows the op must route to the LSH scale path and
    return the same survivors as calling embedding_lsh_dedup directly."""
    ds = ray.data.from_arrow(emb_table)
    direct = sorted(embedding_lsh_dedup(ds, dim=64, threshold=0.32,
                                        nbits=8).to_pandas()["vec_id"])
    routed = sorted(embedding_neardup_dedup(ds, threshold=0.32,
                                            exact_max_rows=0,
                                            nbits=8).to_pandas()["vec_id"])
    assert routed == direct
    exact = set(embedding_neardup_dedup(ds, threshold=0.32).to_pandas()["vec_id"])
    assert exact <= set(routed)  # LSH only misses pairs, never invents


def test_exact_dedup_descending_string_key():
    """ADVICE round 1: descending NON-NUMERIC order keys must pick the
    lexicographically-largest winner in BOTH phases."""
    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2],
        "s": ["apple", "zebra", "mango", "beta", "alpha"],
        "id": [10, 11, 12, 13, 14],
    })
    # one row per block forces the cross-block final phase to do the work
    ds = ray.data.from_pandas([df.iloc[[i]] for i in range(len(df))])
    got = exact_dedup(ds, ["k"], [("s", True), ("id", False)]).to_pandas()
    got = got.sort_values("k")
    assert got["id"].tolist() == [11, 13]


def test_global_topk_descending_string():
    """ADVICE round 1: the per-block prune must not discard true top-k
    rows under a descending non-numeric order column (dense-rank
    inversion, ties falling through to the tie-break key)."""
    df = pd.DataFrame({
        "s": ["kiwi", "zeta", "zeta", "apple", "mango", "zeta"],
        "id": [1, 5, 2, 3, 4, 0],
    })
    ds = ray.data.from_pandas([df.iloc[[i, i + 1]] for i in (0, 2, 4)])
    got = global_topk(ds, [("s", True), ("id", False)], 3).to_pandas()
    assert got["id"].tolist() == [0, 2, 5]


def test_broadcast_lookup_join_matches_pandas():
    from paperchase_crawler_ray.ops.relational import broadcast_lookup_join
    left = pd.DataFrame({"k": [3, 1, 9, 1, 5], "x": list("abcde")})
    dim = pd.DataFrame({"j": [1, 3, 5], "name": ["one", "three", "five"]})
    got = broadcast_lookup_join(
        ray.data.from_pandas(left), "k",
        ray.data.from_pandas(dim), "j", ["name"]).to_pandas()
    want = left.merge(dim, left_on="k", right_on="j")[["k", "x", "name"]]
    got = got.sort_values(["k", "x"]).reset_index(drop=True)
    want = want.sort_values(["k", "x"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "x", "name"]], want)
    with pytest.raises(Exception):
        # non-unique right key must be rejected, not silently mis-joined
        broadcast_lookup_join(
            ray.data.from_pandas(left), "k",
            ray.data.from_pandas(pd.DataFrame({"j": [1, 1], "name": ["a", "b"]})),
            "j", ["name"])


def test_grouped_rolling_max_matches_pandas():
    from paperchase_crawler_ray.ops.relational import grouped_rolling_max
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, 200),
        "ts": rng.permutation(200),
        "id": np.arange(200),
        "v": rng.random(200),
    })
    got = grouped_rolling_max(ray.data.from_pandas(df), "k", "ts", "v",
                              window=3, tie_col="id").to_pandas()
    want = df.sort_values(["k", "ts", "id"]).copy()
    want["rolling_max"] = want.groupby("k")["v"].transform(
        lambda s: s.rolling(3, min_periods=1).max())
    got = got.sort_values(["k", "ts", "id"]).reset_index(drop=True)
    want = want.reset_index(drop=True)
    assert np.array_equal(got["rolling_max"].to_numpy(),
                          want["rolling_max"].to_numpy())


def test_duplicate_clusters_matches_naive(docs_table):
    """cluster_id = min doc id of the connected component over verified
    LSH duplicate pairs (same pair semantics as minhash_lsh_dedup)."""
    from paperchase_crawler_ray.ops.dedup import duplicate_clusters
    ids = docs_table.column("doc_id").to_pylist()
    texts = docs_table.column("text").to_pylist()
    a, b = minhash_params32(128)

    def sig(t):
        return minhash_sig32(word_shingles(t, 3), a, b)

    def verify(t1, t2):
        def s(t):
            tk = tokens(t)
            return {" ".join(tk[i:i + 3]) for i in range(len(tk) - 2)} \
                if len(tk) >= 3 else ({" ".join(tk)} if tk else set())
        return jaccard(s(t1), s(t2))

    # naive: same buckets/pairs, then BFS components
    buckets: dict = {}
    for i, t in zip(ids, texts):
        for bk in band_keys(sig(t), 16):
            buckets.setdefault(bk, []).append(i)
    lookup = dict(zip(ids, texts))
    adj: dict = {i: set() for i in ids}
    for members in buckets.values():
        ms = sorted(set(members))[:64]
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                if verify(lookup[ms[x]], lookup[ms[y]]) >= 0.6:
                    adj[ms[x]].add(ms[y]); adj[ms[y]].add(ms[x])
    want = {}
    seen: set = set()
    for i in sorted(ids):
        if i in seen:
            continue
        comp, stack = [], [i]
        while stack:
            v = stack.pop()
            if v in seen:
                continue
            seen.add(v); comp.append(v)
            stack.extend(adj[v] - seen)
        root = min(comp)
        for v in comp:
            want[v] = root
    got = duplicate_clusters(_docs_ds(docs_table), "doc_id", "text",
                             threshold=0.6).to_pandas()
    assert dict(zip(got["doc_id"], got["cluster_id"])) == want
    assert any(v != k for k, v in want.items())  # non-trivial clusters exist


def test_duplicate_clusters_join_path(docs_table):
    from paperchase_crawler_ray.ops.dedup import duplicate_clusters
    ds = _docs_ds(docs_table)
    base = duplicate_clusters(ds, "doc_id", "text", threshold=0.6).to_pandas()
    joined = duplicate_clusters(ds, "doc_id", "text", threshold=0.6,
                                broadcast_max_docs=0).to_pandas()
    assert dict(zip(base["doc_id"], base["cluster_id"])) == \
        dict(zip(joined["doc_id"], joined["cluster_id"]))


def test_exact_dedup_salted_equals_unsalted():
    """Explicit hot-key salting (BASELINE 'hot-host salting'): the salted
    two-stage plan must return exactly the unsalted winners on skewed
    data (one key holds 90% of rows)."""
    rng = np.random.default_rng(3)
    n = 5000
    hot = rng.random(n) < 0.9
    df = pd.DataFrame({
        "k": np.where(hot, 7, rng.integers(0, 50, n)),
        "v": rng.integers(0, 1 << 30, n),
        "id": np.arange(n),
    })
    ds = ray.data.from_pandas([df.iloc[i::8].copy() for i in range(8)])
    base = exact_dedup(ds, ["k"], [("v", False), ("id", False)]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    salted = exact_dedup(ds, ["k"], [("v", False), ("id", False)],
                         salt_partitions=4) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, salted)


def test_prefix_sum_matches_numpy():
    """Distributed scan over MANY small blocks must equal the global
    numpy cumsum in sort order (block totals stitched exclusively)."""
    from paperchase_crawler_ray.ops.relational import prefix_sum
    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame({"id": rng.permutation(n),
                       "v": rng.integers(0, 100, n)})
    ds = ray.data.from_pandas([df.iloc[i::16].copy() for i in range(16)])
    got = prefix_sum(ds, [("id", False)], "v", out_col="cum") \
        .to_pandas().sort_values("id").reset_index(drop=True)
    want = df.sort_values("id").reset_index(drop=True)
    assert np.array_equal(got["cum"].to_numpy(),
                          np.cumsum(want["v"].to_numpy()))


def test_grouped_rank_spanning_blocks():
    """ROW_NUMBER stitch: FEW huge groups over MANY blocks forces every
    group to span several sorted blocks, so the carry chain (not the
    block-local rank) determines correctness."""
    from paperchase_crawler_ray.ops.relational import grouped_rank
    rng = np.random.default_rng(12)
    n = 6000
    df = pd.DataFrame({"g": rng.integers(0, 3, n),
                       "score": rng.integers(0, 50, n),
                       "uid": rng.permutation(n)})
    ds = ray.data.from_pandas([df.iloc[i::24].copy() for i in range(24)])
    got = grouped_rank(ds, "g", [("score", True), ("uid", False)],
                       out_col="rnk").to_pandas()
    want = df.copy()
    want["rnk"] = want.sort_values(["score", "uid"],
                                   ascending=[False, True]) \
        .groupby("g").cumcount() + 1
    merged = got.merge(want, on=["g", "score", "uid"], suffixes=("", "_w"))
    assert len(merged) == n
    assert (merged["rnk"] == merged["rnk_w"]).all()


def test_grouped_rank_string_keys():
    from paperchase_crawler_ray.ops.relational import grouped_rank
    df = pd.DataFrame({"g": list("aabbbc") * 50,
                       "v": np.arange(300) % 7,
                       "uid": np.arange(300)})
    ds = ray.data.from_pandas([df.iloc[i::10].copy() for i in range(10)])
    got = grouped_rank(ds, "g", [("v", False), ("uid", False)]).to_pandas()
    want = df.sort_values(["v", "uid"]).groupby("g").cumcount() + 1
    w = df.copy(); w["rnk"] = want
    merged = got.merge(w, on=["g", "v", "uid"], suffixes=("", "_w"))
    assert len(merged) == 300 and (merged["rnk"] == merged["rnk_w"]).all()


def test_pivot_counts_matches_crosstab():
    from paperchase_crawler_ray.ops.relational import pivot_counts
    rng = np.random.default_rng(13)
    cats = ["a", "b", "c"]
    df = pd.DataFrame({"u": rng.integers(0, 20, 1000),
                       "t": rng.choice(cats, 1000)})
    ds = ray.data.from_pandas([df.iloc[i::6].copy() for i in range(6)])
    got = pivot_counts(ds, "u", "t", cats).to_pandas() \
        .sort_values("u").reset_index(drop=True)
    ct = pd.crosstab(df["u"], df["t"]).reindex(columns=cats, fill_value=0)
    for c in cats:
        assert np.array_equal(got[f"n_{c}"].to_numpy(),
                              ct[c].to_numpy()), c


def test_chunk_documents_matches_naive(docs_table):
    from paperchase_crawler_ray.ops.textstats import chunk_documents, _WORD_RE
    ds = _docs_ds(docs_table)
    got = chunk_documents(ds, window=10, stride=7).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    want = []
    for did, text in zip(docs_table["doc_id"].to_pylist(),
                         docs_table["text"].to_pylist()):
        toks = _WORD_RE.findall(text.lower())
        if not toks:
            continue
        n_chunks = 1 + max(0, -(-(len(toks) - 10) // 7))
        for i in range(n_chunks):
            piece = toks[i * 7: i * 7 + 10]
            want.append((did, i, len(piece), " ".join(piece)))
    assert list(map(tuple, got.itertuples(index=False))) == want
    # reconstruction: stride-prefixes of all but the last chunk + the
    # last chunk = the full token stream (no token lost or duplicated)
    for did, grp in got.groupby("doc_id"):
        toks = []
        rows = grp.sort_values("chunk_id")
        for _, r in rows.iloc[:-1].iterrows():
            toks += r["chunk_text"].split(" ")[:7]
        toks += rows.iloc[-1]["chunk_text"].split(" ")
        full = _WORD_RE.findall(
            docs_table["text"].to_pylist()[
                docs_table["doc_id"].to_pylist().index(did)].lower())
        assert toks == full


def test_ngram_contamination_matches_naive():
    from paperchase_crawler_ray.ops.textstats import ngram_contamination
    bench_texts = ["alpha beta gamma delta epsilon zeta", "one two three four"]
    corpus = [
        (0, "prefix words then alpha beta gamma delta and more"),   # hit (4-gram)
        (1, "alpha beta delta gamma epsilon"),                      # no 4-gram overlap
        (2, "x one two three four y"),                              # hit
        (3, "completely unrelated text with nothing shared here"),  # miss
        (4, "one two"),                                             # too short
    ]
    c_ds = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([c[0] for c in corpus], pa.int64()),
         "text": pa.array([c[1] for c in corpus], pa.string())}))
    b_ds = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([100, 101], pa.int64()),
         "text": pa.array(bench_texts, pa.string())}))
    got = sorted(ngram_contamination(c_ds, b_ds, n=4).to_pandas()["doc_id"])
    assert got == [0, 2]


def test_hll_accuracy_and_merge_invariance():
    from paperchase_crawler_ray.ops.sketch import (_hash_column,
                                                   hll_estimate,
                                                   hll_registers)
    rng = np.random.default_rng(21)
    vals = rng.integers(0, 1 << 60, 20000, dtype=np.int64)
    exact = len(np.unique(vals))
    hashes = _hash_column(pa.array(vals))
    regs = hll_registers(hashes, 14)
    est = hll_estimate(regs)
    assert abs(est - exact) / exact < 0.02
    # register merge == single-pass registers (the distributed partials
    # reduce to exactly the one-machine sketch)
    merged = np.zeros(1 << 14, np.uint8)
    for part in np.array_split(hashes, 13):
        np.maximum(merged, hll_registers(part, 14), out=merged)
    assert np.array_equal(merged, regs)


def test_approx_distinct_dataset_and_strings():
    from paperchase_crawler_ray.ops.sketch import approx_distinct
    n = 5000
    ds = ray.data.from_arrow(pa.table(
        {"s": pa.array([f"key-{i % 1200}" for i in range(n)], pa.string())}
    )).repartition(num_blocks=9)
    out = approx_distinct(ds, "s", p=14).to_pandas()
    assert out["column"][0] == "s"
    assert abs(int(out["approx_distinct"][0]) - 1200) / 1200 < 0.03
    # determinism across runs
    out2 = approx_distinct(ds, "s", p=14).to_pandas()
    assert int(out["approx_distinct"][0]) == int(out2["approx_distinct"][0])


def test_approx_distinct_by_groups():
    """Grouped HLL: per-group estimates within the p=12 error band vs
    exact per-group distincts, skew-proof (one group holds half the
    rows), deterministic across runs and partitionings (byte max is
    order-free), and int64 group keys work alongside strings."""
    from paperchase_crawler_ray.ops.sketch import approx_distinct_by
    rng = np.random.default_rng(11)
    n = 60_000
    g = rng.choice(["big", "mid", "small"], n, p=[0.5, 0.35, 0.15])
    base = {"big": 0, "mid": 1_000_000, "small": 2_000_000}
    v = rng.integers(0, 8_000, n) + np.vectorize(base.get)(g)
    t = pa.table({"g": pa.array(g.tolist(), pa.string()),
                  "v": pa.array(v.tolist(), pa.int64())})
    exact = pd.DataFrame({"g": g, "v": v}).groupby("g")["v"].nunique()
    ds = ray.data.from_arrow(t).repartition(num_blocks=7)
    est = approx_distinct_by(ds, "g", "v", p=12).to_pandas() \
        .set_index("g")["approx_distinct"]
    assert set(est.index) == set(exact.index)
    for k in exact.index:
        assert abs(int(est[k]) - exact[k]) / exact[k] < 0.05, \
            (k, int(est[k]), exact[k])
    # determinism under a different partitioning
    est2 = approx_distinct_by(
        ray.data.from_arrow(t).repartition(num_blocks=3), "g", "v",
        p=12).to_pandas().set_index("g")["approx_distinct"]
    assert est.sort_index().tolist() == est2.sort_index().tolist()
    # int64 group keys
    ti = pa.table({"g": pa.array([int(x != "big") for x in g],
                                 pa.int64()),
                   "v": t.column("v")})
    esti = approx_distinct_by(ray.data.from_arrow(ti)
                              .repartition(num_blocks=5),
                              "g", "v", p=12).to_pandas()
    assert set(esti["g"]) == {0, 1}


def test_image_quality_golden():
    from paperchase_crawler_ray.functions.codec import png_encode
    from paperchase_crawler_ray.ops.multimodal import image_quality
    flat = np.full((32, 32, 3), 100, np.uint8)
    grad = np.zeros((32, 32, 3), np.uint8)
    grad[:, :, :] = (np.arange(32, dtype=np.uint8) * 8)[None, :, None]
    noise = np.random.default_rng(5).integers(0, 256, (32, 32, 3)) \
        .astype(np.uint8)
    ds = ray.data.from_arrow(pa.table({
        "image_id": pa.array(["flat", "grad", "noise"], pa.string()),
        "bytes": pa.array([png_encode(flat), png_encode(grad),
                           png_encode(noise)], pa.binary())}))
    got = image_quality(ds, batch_size=2).to_pandas() \
        .set_index("image_id")
    assert got.loc["flat", "sharpness"] == 0.0
    assert got.loc["flat", "contrast"] == 0.0
    assert got.loc["flat", "entropy"] == 0.0
    assert abs(got.loc["flat", "brightness"] - 100.0) < 1e-9
    # a noise image is sharper and higher-entropy than a smooth gradient
    assert got.loc["noise", "sharpness"] > got.loc["grad", "sharpness"]
    assert got.loc["noise", "entropy"] > got.loc["grad", "entropy"]


def test_grouped_prefix_sum_spanning_blocks():
    from paperchase_crawler_ray.ops.relational import grouped_prefix_sum
    rng = np.random.default_rng(31)
    n = 5000
    df = pd.DataFrame({"g": rng.integers(0, 3, n),
                       "o": rng.permutation(n),
                       "v": rng.integers(0, 100, n)})
    ds = ray.data.from_pandas([df.iloc[i::20].copy() for i in range(20)])
    got = grouped_prefix_sum(ds, "g", [("o", False)], "v", out_col="cum") \
        .to_pandas()
    want = df.sort_values("o")
    want["cum"] = want.groupby("g")["v"].cumsum()
    merged = got.merge(want, on=["g", "o", "v"], suffixes=("", "_w"))
    assert len(merged) == n and (merged["cum"] == merged["cum_w"]).all()


def test_grouped_lag_spanning_blocks():
    from paperchase_crawler_ray.ops.relational import grouped_lag
    rng = np.random.default_rng(32)
    n = 3000
    df = pd.DataFrame({"g": rng.integers(0, 4, n),
                       "o": rng.permutation(n),
                       "v": rng.integers(0, 10**6, n)})
    ds = ray.data.from_pandas([df.iloc[i::15].copy() for i in range(15)])
    got = grouped_lag(ds, "g", [("o", False)], "v", out_col="prev") \
        .to_pandas()
    want = df.sort_values("o")
    want["prev"] = want.groupby("g")["v"].shift(1)
    merged = got.merge(want, on=["g", "o", "v"], suffixes=("", "_w"))
    assert len(merged) == n
    both_null = merged["prev"].isna() & merged["prev_w"].isna()
    assert (both_null | (merged["prev"] == merged["prev_w"])).all()
    # each group has exactly one NULL (its first row)
    assert got["prev"].isna().sum() == df["g"].nunique()


def test_image_neardup_clusters_matches_naive():
    """Banded-bucket + union-find clustering == naive O(n^2) connected
    components of the <=hamming_max graph (min-id labels)."""
    from paperchase_crawler_ray.functions.phash import hamming64
    from paperchase_crawler_ray.ops.multimodal import image_neardup_clusters
    rng = np.random.default_rng(41)
    base = rng.integers(-(1 << 62), 1 << 62, 40, dtype=np.int64)
    # plant near-dups: flip 1-3 bits of some hashes
    ph = list(base)
    ids = [f"im{i:03d}" for i in range(40)]
    for i in range(0, 40, 5):
        mutated = base[i]
        for b in rng.integers(0, 64, rng.integers(1, 4)):
            mutated = np.int64(np.uint64(mutated) ^ (np.uint64(1) << np.uint64(int(b))))
        ph.append(mutated)
        ids.append(f"im{i:03d}+dup")
    ds = ray.data.from_arrow(pa.table({
        "image_id": pa.array(ids, pa.string()),
        "phash": pa.array(ph, pa.int64())})).repartition(num_blocks=5)
    got = image_neardup_clusters(ds, hamming_max=6).to_pandas()
    # naive union-find
    parent = {i: i for i in ids}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    arr = np.array(ph)
    for j in range(len(ids)):
        d = hamming64(arr[:j], arr[j]) if j else np.array([], np.int64)
        for i in np.flatnonzero(d <= 6):
            ra, rb = find(ids[int(i)]), find(ids[j])
            if ra != rb:
                lo, hi = sorted((ra, rb))
                parent[hi] = lo
    want = {x: find(x) for x in ids}
    assert dict(zip(got["image_id"], got["cluster_id"])) == want
    # the planted dups actually landed in shared clusters
    assert any(want[f"im{i:03d}+dup"] == want[f"im{i:03d}"]
               for i in range(0, 40, 5))


def test_image_ann_self_match():
    import __ray_entry__ as E
    out = E.queries()["q_image_ann"]("/root/testdata/sf0.001").to_pandas()
    top = out[out["rank"] == 1]
    assert set(top["query_id"]) == {0, 1, 2}
    assert (top["query_id"] == top["vec_id"]).all()


def test_image_transcode_ladder():
    """Transcode any-fmt -> jpeg at two qualities: per-row PSNR floor,
    byte accounting, and the lossless-source rows shrink at q85."""
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.functions.codec import decode, psnr, sniff_format
    from paperchase_crawler_ray.fixtures import make_pixels
    from paperchase_crawler_ray.ops.multimodal import image_transcode
    rows = make_image_rows(8)
    ds = ray.data.from_arrow(rows.select(["image_id", "bytes"]))
    out = image_transcode(ds, qualities=(85, 98), batch_size=4).to_pandas()
    assert len(out) == 8 * 2
    assert set(out["quality"]) == {85, 98}
    assert (out["fmt_out"] == "jpeg").all()
    w_by_id = dict(zip(rows.column("image_id").to_pylist(),
                       zip(rows.column("w").to_pylist(),
                           rows.column("h").to_pylist())))
    for r in out.itertuples():
        assert sniff_format(bytes(r.bytes)) == "jpeg"
        assert r.nbytes_out == len(r.bytes)
        # reported centi-dB PSNR is truthful vs source pixels
        w, h = w_by_id[r.image_id]
        truth_px = decode(bytes(rows.column("bytes")[
            rows.column("image_id").to_pylist().index(r.image_id)].as_py()))
        got = psnr(truth_px, decode(bytes(r.bytes)))
        assert abs(r.psnr_cdb - round(got * 100)) <= 1
    # q98 is always >= q85 fidelity and >= size, per image
    by = out.set_index(["image_id", "quality"])
    for iid in rows.column("image_id").to_pylist():
        assert by.loc[(iid, 98), "psnr_cdb"] >= by.loc[(iid, 85), "psnr_cdb"]
        assert by.loc[(iid, 98), "nbytes_out"] >= by.loc[(iid, 85), "nbytes_out"]
    # raw sources (class 3: 128x96 uncompressed) must shrink at q85 even
    # on the noisy fixture content (JPEG's worst case)
    raws = out[(out["fmt_in"] == "raw") & (out["quality"] == 85)]
    assert len(raws) and (raws["nbytes_out"] < raws["nbytes_in"]).all()


def test_grouped_moving_sum_matches_pandas():
    from paperchase_crawler_ray.ops.relational import grouped_moving_sum
    rng = np.random.default_rng(11)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "o": rng.permutation(n),
        "v": rng.integers(-50, 50, n),
    })
    for w in (1, 3, 7):
        want = df.sort_values(["k", "o"]).copy()
        want["win_sum"] = (want.groupby("k")["v"]
                           .rolling(w, min_periods=1).sum()
                           .reset_index(level=0, drop=True).astype(int))
        ds = ray.data.from_pandas(df).repartition(8)
        got = grouped_moving_sum(ds, "k", [("o", False)], "v", w).to_pandas()
        got = got.sort_values(["k", "o"]).reset_index(drop=True)
        assert got["win_sum"].tolist() == want["win_sum"].tolist(), f"w={w}"


def test_grouped_moving_sum_single_spanning_group():
    """One giant group across many blocks exercises the carry-extension
    branch (block fully inside the spanning group)."""
    from paperchase_crawler_ray.ops.relational import grouped_moving_sum
    n = 2000
    df = pd.DataFrame({"k": ["g"] * n, "o": range(n), "v": [1] * n})
    ds = ray.data.from_pandas(df).repartition(16)
    got = grouped_moving_sum(ds, "k", [("o", False)], "v", 5).to_pandas()
    got = got.sort_values("o")
    want = [min(i + 1, 5) for i in range(n)]
    assert got["win_sum"].tolist() == want


def test_grouped_ntile_matches_duckdb():
    import duckdb
    from paperchase_crawler_ray.ops.relational import grouped_ntile
    rng = np.random.default_rng(12)
    n = 3000
    df = pd.DataFrame({
        "k": rng.integers(0, 37, n),          # sizes not divisible by n
        "o": rng.permutation(n),
    })
    for buckets in (2, 4, 7):
        ds = ray.data.from_pandas(df).repartition(6)
        got = grouped_ntile(ds, "k", [("o", False)], buckets).to_pandas()
        got = got.sort_values(["k", "o"]).reset_index(drop=True)
        want = duckdb.sql(
            f"SELECT k, o, NTILE({buckets}) OVER "
            "(PARTITION BY k ORDER BY o) AS tile FROM df ORDER BY k, o").df()
        assert got["tile"].tolist() == want["tile"].tolist(), f"n={buckets}"


def test_cube_agg_matches_duckdb():
    import duckdb
    from paperchase_crawler_ray.ops.relational import cube_agg
    rng = np.random.default_rng(13)
    n = 2000
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], n),
        "b": rng.choice(["p", "q"], n),
        "v": rng.integers(0, 100, n).astype(float),
    })
    got = cube_agg(ray.data.from_pandas(df).repartition(5), ["a", "b"],
                   "v", sum_name="s", count_name="c").to_pandas()
    want = duckdb.sql(
        "SELECT COALESCE(a, 'ALL') AS a, COALESCE(b, 'ALL') AS b, "
        "SUM(v) AS s, CAST(COUNT(*) AS BIGINT) AS c FROM df "
        "GROUP BY CUBE(a, b) ORDER BY a, b").df()
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    assert got["s"].tolist() == want["s"].tolist()
    assert got["c"].tolist() == want["c"].tolist()
    assert len(got) == len(want)


def test_salted_join_equals_plain_join():
    """Salting must not change the result — every left row meets every
    matching right row exactly once, including under heavy key skew."""
    from paperchase_crawler_ray.ops.relational import salted_equi_join
    rng = np.random.default_rng(14)
    # 80% of left rows share ONE hot key
    lk = np.where(rng.random(4000) < 0.8, 7, rng.integers(0, 50, 4000))
    left = pd.DataFrame({"k": lk, "lv": np.arange(4000)})
    right = pd.DataFrame({"rk": np.arange(50), "rv": np.arange(50) * 10})
    got = salted_equi_join(ray.data.from_pandas(left).repartition(6), "k",
                           ray.data.from_pandas(right), "rk",
                           salts=5).to_pandas()
    want = left.merge(right, left_on="k", right_on="rk")
    assert len(got) == len(want)
    gs = got.sort_values(["k", "lv"]).reset_index(drop=True)
    ws = want.sort_values(["k", "lv"]).reset_index(drop=True)
    assert gs["lv"].tolist() == ws["lv"].tolist()
    assert gs["rv"].tolist() == ws["rv"].tolist()


def test_grouped_string_agg_matches_duckdb():
    import duckdb
    from paperchase_crawler_ray.ops.relational import grouped_string_agg
    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 50, n),
        "o": rng.permutation(n),
        "v": [f"w{int(x)}" for x in rng.integers(0, 9, n)],
    })
    ds = ray.data.from_pandas(df).repartition(7)
    got = grouped_string_agg(ds, "k", [("o", False)], "v",
                             sep=",", out_col="agg").to_pandas()
    want = duckdb.sql("SELECT k, STRING_AGG(v, ',' ORDER BY o) AS agg "
                      "FROM df GROUP BY k ORDER BY k").df()
    got = got.sort_values("k").reset_index(drop=True)
    assert got["agg"].tolist() == want["agg"].tolist()


def test_grouped_string_agg_spanning_group():
    import duckdb
    from paperchase_crawler_ray.ops.relational import grouped_string_agg
    df = pd.DataFrame({"k": ["g"] * 3000, "o": range(3000),
                       "v": [f"x{i % 4}" for i in range(3000)]})
    ds = ray.data.from_pandas(df).repartition(16)
    got = grouped_string_agg(ds, "k", [("o", False)], "v").to_pandas()
    want = duckdb.sql("SELECT k, STRING_AGG(v, ',' ORDER BY o) AS agg "
                      "FROM df GROUP BY k").df()
    assert got["agg"].tolist() == want["agg"].tolist()


def test_grouped_dense_rank_matches_duckdb():
    import duckdb
    from paperchase_crawler_ray.ops.relational import grouped_dense_rank
    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 50, n),
        "o": rng.permutation(n),
        "v": [f"w{int(x)}" for x in rng.integers(0, 9, n)],
    })
    ds = ray.data.from_pandas(df).repartition(9)
    got = grouped_dense_rank(ds, "k", "v", out_col="drnk").to_pandas()
    want = duckdb.sql("SELECT k, o, DENSE_RANK() OVER (PARTITION BY k "
                      "ORDER BY v) AS drnk FROM df ORDER BY k, o").df()
    got = got.sort_values(["k", "o"]).reset_index(drop=True)
    assert got["drnk"].tolist() == want["drnk"].tolist()


def test_grouped_dense_rank_value_split_across_blocks():
    """A single group whose repeated order values straddle block
    boundaries must not double-count the boundary value."""
    import duckdb
    from paperchase_crawler_ray.ops.relational import grouped_dense_rank
    df = pd.DataFrame({"k": ["g"] * 3000, "o": range(3000),
                       "v": [f"x{i % 4}" for i in range(3000)]})
    ds = ray.data.from_pandas(df).repartition(16)
    got = grouped_dense_rank(ds.sort("o"), "k", "v").to_pandas()
    want = duckdb.sql("SELECT k, o, DENSE_RANK() OVER (PARTITION BY k "
                      "ORDER BY v) AS drnk FROM df ORDER BY k, o").df()
    assert got.sort_values("o")["drnk"].tolist() == want["drnk"].tolist()


def test_grouped_rank_family_nan_group_key_spans_blocks():
    """A NaN-keyed group split across sorted blocks must keep ONE rank
    sequence — the spanning-key carry uses NaN==NaN (_val_eq), not plain
    ``==`` which is always false for NaN (ADVICE r3 #3)."""
    import duckdb
    from paperchase_crawler_ray.ops.relational import (grouped_dense_rank,
                                                       grouped_rank_ties)
    n = 2000
    rng = np.random.default_rng(11)
    k = np.where(rng.integers(0, 2, n) == 1, np.nan, 1.0)
    df = pd.DataFrame({"k": k, "o": np.arange(n),
                       "v": rng.integers(0, 5, n).astype("int64")})
    ds = ray.data.from_pandas(df).repartition(13)
    want = duckdb.sql(
        "SELECT o, RANK() OVER (PARTITION BY k ORDER BY v) AS r, "
        "DENSE_RANK() OVER (PARTITION BY k ORDER BY v) AS d "
        "FROM df ORDER BY o").df()
    got_t = grouped_rank_ties(ds, "k", "v", out_col="r").to_pandas()
    assert got_t.sort_values("o")["r"].tolist() == want["r"].tolist()
    got_d = grouped_dense_rank(ds, "k", "v", out_col="d").to_pandas()
    assert got_d.sort_values("o")["d"].tolist() == want["d"].tolist()


def test_pq_topk_recall_and_determinism():
    """PQ-ADC top-k must be parallelism-invariant and recall most of
    the exact top-k on clustered data; codes must be m bytes."""
    from paperchase_crawler_ray.ops.similarity import (brute_force_topk,
                                                       pq_encode, pq_topk,
                                                       pq_train)
    rng = np.random.default_rng(31)
    centers = rng.standard_normal((10, 64)) * 3
    X = np.repeat(centers, 50, axis=0) + rng.standard_normal((500, 64))
    df = pd.DataFrame({"vec_id": np.arange(500),
                       "embedding": list(X.astype(np.float64))})
    qids = [3, 77, 401]

    def mk(nblocks):
        return ray.data.from_pandas(df).repartition(nblocks)

    exact = brute_force_topk(mk(4), qids, k=10).to_pandas()
    a = pq_topk(mk(4), qids, k=10).to_pandas()
    b = pq_topk(mk(4), qids, k=10).to_pandas()
    key = lambda d: sorted(zip(d["query_id"], d["rank"], d["vec_id"]))
    # deterministic for a fixed layout; WHICH candidates each block's
    # ADC shortlist refines depends on block membership (approximate
    # method — recall, not layout invariance, is the contract)
    assert key(a) == key(b)
    recalls = []
    for q in qids:
        ex = set(exact[exact["query_id"] == q]["vec_id"])
        ap = set(a[a["query_id"] == q]["vec_id"])
        recalls.append(len(ex & ap) / len(ex))
    assert np.mean(recalls) >= 0.8, recalls

    books = pq_train(mk(4))
    codes = pq_encode(mk(4), books).to_pandas()
    assert all(len(c) == 8 for c in codes["pq_code"])  # 64 floats -> 8 B


def test_ivfpq_topk_recall():
    """The composed ladder (coarse prune + ADC + refine) must still
    recall most of the exact top-k and stay fixed-layout deterministic."""
    from paperchase_crawler_ray.ops.similarity import (brute_force_topk,
                                                       ivfpq_topk)
    rng = np.random.default_rng(33)
    centers = rng.standard_normal((10, 64)) * 3
    X = np.repeat(centers, 50, axis=0) + rng.standard_normal((500, 64))
    df = pd.DataFrame({"vec_id": np.arange(500),
                       "embedding": list(X.astype(np.float64))})
    qids = [3, 77, 401]

    def mk():
        return ray.data.from_pandas(df).repartition(4)

    exact = brute_force_topk(mk(), qids, k=10).to_pandas()
    a = ivfpq_topk(mk(), qids, k=10).to_pandas()
    b = ivfpq_topk(mk(), qids, k=10).to_pandas()
    key = lambda d: sorted(zip(d["query_id"], d["rank"], d["vec_id"]))
    assert key(a) == key(b)
    recalls = []
    for q in qids:
        ex = set(exact[exact["query_id"] == q]["vec_id"])
        ap = set(a[a["query_id"] == q]["vec_id"])
        recalls.append(len(ex & ap) / len(ex))
    assert np.mean(recalls) >= 0.7, recalls


def test_resumable_sink_kill_resume(tmp_path):
    """Kill-resume contract for the batch sink: a rerun rewrites ONLY
    unsealed shards (including wiping a partial orphan file) and a
    fully-sealed rerun writes nothing."""
    import os
    import shutil
    from paperchase_crawler_ray.ops.sink import (committed_shards,
                                                 read_resumable,
                                                 write_resumable)
    out = str(tmp_path / "sink")
    df = pd.DataFrame({"k": np.arange(500), "v": np.arange(500) * 2})
    r1 = write_resumable(ray.data.from_pandas(df).repartition(4), out,
                         "k", num_shards=8)
    assert sorted(r1["written"]) == list(range(8)) and not r1["skipped"]
    got = read_resumable(out, 8).to_pandas().sort_values("k")
    assert got["v"].tolist() == df.sort_values("k")["v"].tolist()

    # simulate a crash: unseal shards 1 and 5, leave a partial orphan
    for s in (1, 5):
        os.remove(os.path.join(out, f"shard={s}", "_COMMITTED"))
    with open(os.path.join(out, "shard=1", "partial_orphan.parquet"),
              "wb") as f:
        f.write(b"garbage")
    sealed_before = {s: os.listdir(os.path.join(out, f"shard={s}"))
                     for s in (0, 2)}
    r2 = write_resumable(ray.data.from_pandas(df).repartition(4), out,
                         "k", num_shards=8)
    assert sorted(r2["written"]) == [1, 5]
    assert sorted(r2["skipped"]) == [0, 2, 3, 4, 6, 7]
    for s in (0, 2):  # untouched sealed shards
        assert os.listdir(os.path.join(out, f"shard={s}")) \
            == sealed_before[s]
    assert committed_shards(out, 8) == set(range(8))
    got2 = read_resumable(out, 8).to_pandas().sort_values("k")
    assert got2["v"].tolist() == df.sort_values("k")["v"].tolist()

    r3 = write_resumable(ray.data.from_pandas(df), out, "k", num_shards=8)
    assert r3["written"] == [] and sorted(r3["skipped"]) == list(range(8))
    shutil.rmtree(out)


def test_prep_documents_end_to_end_resumable(tmp_path):
    """The production prep pipeline: output equals the lazy chain, and
    a second invocation is a no-op (all shards sealed)."""
    import os
    from paperchase_crawler_ray.pipelines.prep import (prep_chain,
                                                       prep_documents)
    sf = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "prep")
    r1 = prep_documents(sf, out, num_shards=4)
    assert r1["shards_done"] == 4 and len(r1["written"]) == 4
    from paperchase_crawler_ray.ops.sink import read_resumable
    got = read_resumable(out, 4).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    want = prep_chain(ray.data.read_parquet(sf, columns=["doc_id", "text"])
                      ).to_pandas().sort_values(["doc_id", "chunk_id"]) \
        .reset_index(drop=True)
    assert got["chunk_text"].tolist() == want["chunk_text"].tolist()
    assert len(got) > 0
    r2 = prep_documents(sf, out, num_shards=4)
    assert r2["written"] == [] and r2["shards_done"] == 4


def test_asof_join_carry_across_blocks():
    """One key spanning many blocks with its right rows only at the
    start: later-block left rows must forward-fill through the driver
    carry chain, and a key with NO right rows must stay NaT."""
    import duckdb
    from paperchase_crawler_ray.ops.relational import asof_join_with_id
    n = 4000
    ev = pd.DataFrame({
        "k": ["a"] * n + ["b"] * 50,
        "ts": pd.to_datetime(
            np.concatenate([np.arange(n), np.arange(50)]) * 1000, unit="us"),
        "eid": np.arange(n + 50),
    })
    od = pd.DataFrame({"rk": ["a", "a"],
                       "rts": pd.to_datetime([0, 1500], unit="us")})
    got = asof_join_with_id(
        ray.data.from_pandas(ev).repartition(16),
        ray.data.from_pandas(od), "k", "rk", "ts", "rts", "eid"
    ).to_pandas().sort_values("eid").reset_index(drop=True)
    want = duckdb.sql(
        "SELECT e.eid, o.rts AS matched_ts FROM ev e ASOF LEFT JOIN od o "
        "ON e.k = o.rk AND e.ts >= o.rts ORDER BY e.eid").df()
    assert got["matched_ts"].astype("datetime64[us]").equals(
        want["matched_ts"].astype("datetime64[us]"))


def test_weighted_sample_matches_naive_and_parallelism_invariant():
    from paperchase_crawler_ray.functions.texthash import stable_hash64
    from paperchase_crawler_ray.ops.textstats import weighted_sample
    rng = np.random.default_rng(21)
    n = 3000
    df = pd.DataFrame({"id": [f"d{i}" for i in range(n)],
                       "w": rng.integers(1, 100, n).astype(float)})
    # naive twin with identical arithmetic
    h = np.array([stable_hash64(f"42:{i}") for i in df["id"]],
                 np.int64).astype(np.uint64)
    u = (h.astype(np.float64) + 2.0) / (2.0 ** 64 + 4.0)
    key = np.log(u) / df["w"].to_numpy()
    want = set(df["id"].to_numpy()[np.argsort(-key)[:100]])
    for nblocks in (3, 11):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = weighted_sample(ds, "id", "w", 100).to_pandas()
        assert set(got["id"]) == want, nblocks


def test_weighted_sample_bias():
    """A row with overwhelming weight must (essentially) always be
    sampled; tiny-weight rows must not dominate."""
    from paperchase_crawler_ray.ops.textstats import weighted_sample
    df = pd.DataFrame({"id": [f"d{i}" for i in range(200)],
                       "w": [1e6] + [1.0] * 199})
    got = weighted_sample(ray.data.from_pandas(df), "id", "w", 10) \
        .to_pandas()
    assert "d0" in set(got["id"])


def _naive_bpe(word_freq, n_merges):
    seqs = {w: (tuple(w) + ("</w>",), c) for w, c in word_freq.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, (s, f) in seqs.items():
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        merges.append((best[0], best[1], counts[best]))

        def ap(s):
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(s[i] + s[i + 1]); i += 2
                else:
                    out.append(s[i]); i += 1
            return tuple(out)
        seqs = {w: (ap(s), f) for w, (s, f) in seqs.items()}
    return merges


def test_bpe_merges_matches_naive():
    import re
    from collections import Counter
    from paperchase_crawler_ray.ops.textstats import bpe_merges
    texts = ["the cat sat on the mat", "the dog sat", "a cat and a dog",
             "mat and cat chat"] * 3
    df = pd.DataFrame({"text": texts})
    got = bpe_merges(ray.data.from_pandas(df).repartition(3),
                     n_merges=12).to_pandas()
    wf = Counter(w for t in texts for w in re.findall(r"\w+", t.lower()))
    want = _naive_bpe(wf, 12)
    assert list(zip(got["left"], got["right"], got["count"])) == want


def test_bpe_token_count_applies_merges():
    from paperchase_crawler_ray.ops.textstats import (bpe_merges,
                                                      bpe_token_count)
    texts = ["the the the cat", "thethe theme"]
    df = pd.DataFrame({"doc_id": [0, 1], "text": texts})
    ds = ray.data.from_pandas(df)
    m = bpe_merges(ds, n_merges=6).to_pandas()
    merges = list(zip(m["left"], m["right"]))
    out = bpe_token_count(ray.data.from_pandas(df), merges).to_pandas() \
        .sort_values("doc_id")
    # with enough merges "the</w>" fuses to one token: doc0 = 3x the + cat syms
    assert out.loc[0, "n_bpe"] < 3 * 4 + 4  # strictly fewer than chars+EOW
    assert (out["n_bpe"] > 0).all()


def test_image_patchify_lossless_reconstruction():
    """Patches must tile back into the exact decoded pixels over the
    covered region, at any parallelism."""
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.functions.codec import decode, sniff_format
    from paperchase_crawler_ray.ops.multimodal import image_patchify
    rows = make_image_rows(12)
    ds = ray.data.from_arrow(rows.select(["image_id", "bytes"])) \
        .repartition(5)
    p = 8
    out = image_patchify(ds, patch=p, batch_size=3).to_pandas()
    blobs = dict(zip(rows.column("image_id").to_pylist(),
                     rows.column("bytes").to_pylist()))
    seen_imgs = set(out["image_id"])
    assert seen_imgs  # at least the decodable ones
    for img_id in sorted(seen_imgs):
        px = decode(blobs[img_id], sniff_format(blobs[img_id]))
        ny, nx = px.shape[0] // p, px.shape[1] // p
        sub = out[out["image_id"] == img_id].sort_values("patch_id")
        assert len(sub) == ny * nx
        recon = np.zeros((ny * p, nx * p, 3), np.uint8)
        for _, r in sub.iterrows():
            tile = np.frombuffer(r["patch"], np.uint8).reshape(p, p, 3)
            recon[r["py"] * p:(r["py"] + 1) * p,
                  r["px"] * p:(r["px"] + 1) * p] = tile
        assert (recon == px[:ny * p, :nx * p]).all()


def test_caption_alignment_deterministic_and_bounded():
    """Two-tower alignment must be parallelism-invariant (int64 basis
    points), bounded by cosine range, and sensitive to the caption (a
    different caption for the same image changes the text tower)."""
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.ops.multimodal import caption_alignment
    rows = make_image_rows(24)
    base = ray.data.from_arrow(rows.select(["image_id", "bytes", "caption"]))
    a = caption_alignment(base, batch_size=5).to_pandas() \
        .sort_values("image_id")
    b = caption_alignment(
        ray.data.from_arrow(rows.select(["image_id", "bytes", "caption"]))
        .repartition(7), batch_size=3).to_pandas().sort_values("image_id")
    assert a["align_bp"].tolist() == b["align_bp"].tolist()
    assert a["align_bp"].between(-10000, 10000).all()
    # same pixels, shuffled captions -> different scores somewhere
    caps = rows.column("caption").to_pylist()
    rot = pa.table({"image_id": rows.column("image_id"),
                    "bytes": rows.column("bytes"),
                    "caption": pa.array(caps[1:] + caps[:1])})
    c = caption_alignment(ray.data.from_arrow(rot)).to_pandas() \
        .sort_values("image_id")
    assert a["align_bp"].tolist() != c["align_bp"].tolist()


def test_repetition_stats_naive_twin():
    import re
    from paperchase_crawler_ray.ops.textstats import repetition_stats
    texts = ["the the the the cat", "a b c d e f g", "", "x x y y z z",
             "one two two three three three"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = repetition_stats(ray.data.from_pandas(df)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(texts):
        toks = re.findall(r"\w+", t.lower())
        assert got.loc[i, "n_tokens"] == len(toks)
        assert got.loc[i, "n_distinct"] == len(set(toks))
        top = max((toks.count(w) for w in set(toks)), default=0)
        assert got.loc[i, "top_count"] == top
        want_kept = int(len(set(toks)) * 4 >= len(toks)
                        and top * 2 <= len(toks) and len(toks) > 0)
        assert got.loc[i, "kept"] == want_kept
    # the fixture must exercise both outcomes
    assert set(got["kept"]) == {0, 1}


def test_replicate_by_weight():
    from paperchase_crawler_ray.ops.textstats import replicate_by_weight
    df = pd.DataFrame({"id": range(6), "w": [0, 1, 2, 3, 0, 2]})
    ds = ray.data.from_pandas(df).repartition(3)
    got = replicate_by_weight(
        ds, lambda b: b.column("w").to_numpy(zero_copy_only=False),
    ).to_pandas().sort_values(["id", "copy"]).reset_index(drop=True)
    want = [(i, c) for i, w in zip(df["id"], df["w"]) for c in range(w)]
    assert list(zip(got["id"], got["copy"])) == want


def test_unigram_logprob_matches_naive():
    import re
    from paperchase_crawler_ray.ops.textstats import unigram_logprob_score
    texts = ["the cat sat", "the dog sat on the mat", "cat dog cat",
             "mat the on"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = unigram_logprob_score(
        ray.data.from_pandas(df).repartition(2)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # naive twin with the IDENTICAL numpy arithmetic
    from collections import Counter
    all_toks = [w for t in texts for w in re.findall(r"\w+", t.lower())]
    cnt, total = Counter(all_toks), len(all_toks)
    lp = {w: float(np.log(c) - np.log(total)) for w, c in cnt.items()}
    for i, t in enumerate(texts):
        toks = re.findall(r"\w+", t.lower())
        want = float(np.float64(np.sum(
            np.array([lp[w] for w in toks], np.float64))) / len(toks))
        assert got.loc[i, "logprob"] == want, i
    # higher-frequency tokens => higher (less negative) mean logprob
    assert got.loc[0, "logprob"] > got.loc[3, "logprob"] - 1e9


# -- graph -------------------------------------------------------------------

def _naive_components(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find():
    from paperchase_crawler_ray.ops.graph import connected_components
    rng = np.random.default_rng(5)
    # several chains + rings + singleton pairs over int ids
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 400, (600, 2))]
    want = _naive_components(pairs)
    edges = ray.data.from_pandas(pd.DataFrame(pairs, columns=["a", "b"]))
    got = connected_components(edges).to_pandas()
    got_map = dict(zip(got["node"], got["component"]))
    assert got_map == want


def test_connected_components_long_chain():
    """A 60-node path needs many propagation rounds — exercises the
    iterate-to-convergence loop, not just one superstep."""
    from paperchase_crawler_ray.ops.graph import connected_components
    pairs = [(i, i + 1) for i in range(60)]
    edges = ray.data.from_pandas(pd.DataFrame(pairs, columns=["a", "b"]))
    got = connected_components(edges).to_pandas()
    assert set(got["component"]) == {0}
    assert len(got) == 61


def _naive_pagerank(pairs, iters, damping_ppm=850_000, scale=1_000_000):
    from collections import defaultdict
    outdeg = defaultdict(int)
    nodes = set()
    for a, b in pairs:
        outdeg[a] += 1
        nodes.update((a, b))
    base = scale - scale * damping_ppm // 1_000_000
    score = {n: scale for n in nodes}
    for _ in range(iters):
        gain = defaultdict(int)
        for a, b in pairs:
            gain[b] += (score[a] * damping_ppm // 1_000_000) // outdeg[a]
        score = {n: gain[n] + base for n in nodes}
    return score


def test_pagerank_matches_naive_and_is_parallelism_invariant():
    from paperchase_crawler_ray.ops.graph import pagerank
    rng = np.random.default_rng(6)
    pairs = list({(int(a), int(b)) for a, b in rng.integers(0, 120, (500, 2))
                  if a != b})
    want = _naive_pagerank(pairs, iters=6)
    df = pd.DataFrame(pairs, columns=["a", "b"])
    for nblocks in (2, 11):
        edges = ray.data.from_pandas(df).repartition(nblocks)
        got = pagerank(edges, iters=6).to_pandas()
        assert dict(zip(got["node"], got["score"])) == want, nblocks


def test_graph_join_scale_path_matches_broadcast():
    """mode="join" (node table stays distributed — the V-beyond-driver
    path) must agree bit-for-bit with the broadcast default; kept tiny
    because each superstep pays real hash-join actor spin-up."""
    from paperchase_crawler_ray.ops.graph import (connected_components,
                                                  pagerank)
    pairs = [(i, i + 1) for i in range(8)] + [(20, 21)]
    df = pd.DataFrame(pairs, columns=["a", "b"])

    cj = connected_components(ray.data.from_pandas(df), mode="join").to_pandas()
    cb = connected_components(ray.data.from_pandas(df)).to_pandas()
    assert dict(zip(cj["node"], cj["component"])) == \
        dict(zip(cb["node"], cb["component"]))

    pj = pagerank(ray.data.from_pandas(df), iters=2, mode="join").to_pandas()
    pb = pagerank(ray.data.from_pandas(df), iters=2).to_pandas()
    assert dict(zip(pj["node"], pj["score"])) == \
        dict(zip(pb["node"], pb["score"]))


def test_pagerank_authority_ordering():
    """A hub pointed at by everyone must outscore leaf nodes."""
    from paperchase_crawler_ray.ops.graph import pagerank
    pairs = [(i, 99) for i in range(1, 20)] + [(99, 0)]
    edges = ray.data.from_pandas(pd.DataFrame(pairs, columns=["a", "b"]))
    got = pagerank(edges, iters=8).to_pandas()
    s = dict(zip(got["node"], got["score"]))
    assert s[99] > s[0] > s[1] == s[2]


def test_skyline_matches_naive():
    """Two-phase distributed skyline == O(n^2) naive dominance filter,
    across several block layouts (phase-1 pruning must be lossless)."""
    from paperchase_crawler_ray.ops.relational import skyline
    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame({
        "id": np.arange(n),
        "x": rng.integers(0, 25, n),          # coarse -> many ties
        "y": rng.random(n).round(2),          # coarse -> exact dup points
    })
    pts = df[["x", "y"]].to_numpy(np.float64)
    naive = set()
    for i in range(n):
        dom = ((pts >= pts[i]).all(axis=1) & (pts > pts[i]).any(axis=1))
        if not dom.any():
            naive.add(i)
    for nblocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = skyline(ds, [("x", True), ("y", True)]).to_pandas()
        assert set(got["id"]) == naive

    # minimize direction: flip both dims, frontier must flip too
    ds = ray.data.from_pandas(df).repartition(3)
    lo = skyline(ds, [("x", False), ("y", False)]).to_pandas()
    naive_lo = {i for i in range(n)
                if not (((-pts) >= (-pts[i])).all(axis=1)
                        & ((-pts) > (-pts[i])).any(axis=1)).any()}
    assert set(lo["id"]) == naive_lo


def test_pii_stats_matches_naive(docs_table):
    from paperchase_crawler_ray.ops.textstats import (PII_PATTERNS,
                                                      pii_stats)
    got = pii_stats(ray.data.from_arrow(docs_table)).to_pandas()
    assert len(got) == docs_table.num_rows
    compiled = {k: re.compile(rx) for k, rx in PII_PATTERNS.items()}
    texts = dict(zip(docs_table.column("doc_id").to_pylist(),
                     docs_table.column("text").to_pylist()))
    for row in got.sample(n=min(60, len(got)), random_state=1).itertuples():
        t = texts[row.doc_id]
        tot = 0
        for k, cre in compiled.items():
            n = len(cre.findall(t))
            assert getattr(row, k) == n, (row.doc_id, k)
            tot += n
        assert row.pii_flag == (tot > 0)


def test_pii_stats_synthetic_hits():
    from paperchase_crawler_ray.ops.textstats import pii_stats
    tbl = pa.table({"doc_id": [1, 2, 3], "text": [
        "mail a@b.io and c.d+e@f-g.org, host 10.0.0.1",
        "call (303) 555-7788 now", "clean"]})
    got = pii_stats(ray.data.from_arrow(tbl)).to_pandas() \
        .set_index("doc_id")
    assert got.loc[1, "n_emails"] == 2 and got.loc[1, "n_ipv4"] == 1
    assert got.loc[2, "n_phones"] == 1 and bool(got.loc[2, "pii_flag"])
    assert not bool(got.loc[3, "pii_flag"])


def test_bilinear_resize_golden():
    """Vectorized bilinear == independent scalar reference (half-pixel
    centers), plus exact identity and constant-preservation."""
    from paperchase_crawler_ray.ops.multimodal import bilinear_resize

    def scalar_ref(px, oh, ow):
        h, w = px.shape[:2]
        out = np.zeros((oh, ow, 3))
        for i in range(oh):
            for j in range(ow):
                sy = (i + 0.5) * h / oh - 0.5
                sx = (j + 0.5) * w / ow - 0.5
                y0, x0 = int(np.floor(sy)), int(np.floor(sx))
                wy, wx = sy - y0, sx - x0
                y0c, y1c = np.clip([y0, y0 + 1], 0, h - 1)
                x0c, x1c = np.clip([x0, x0 + 1], 0, w - 1)
                p = px.astype(np.float64)
                out[i, j] = ((1 - wy) * ((1 - wx) * p[y0c, x0c]
                                         + wx * p[y0c, x1c])
                             + wy * ((1 - wx) * p[y1c, x0c]
                                     + wx * p[y1c, x1c]))
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    for oh, ow in [(10, 14), (3, 4), (5, 7), (17, 2)]:
        got = bilinear_resize(px, oh, ow)
        assert got.shape == (oh, ow, 3)
        assert np.array_equal(got, scalar_ref(px, oh, ow)), (oh, ow)
    assert np.array_equal(bilinear_resize(px, 5, 7), px)   # identity
    const = np.full((4, 9, 3), 77, np.uint8)
    assert (bilinear_resize(const, 13, 5) == 77).all()


def test_image_preprocess_end_to_end():
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.functions.codec import decode
    from paperchase_crawler_ray.ops.multimodal import image_preprocess
    rows = make_image_rows(12)
    ds = ray.data.from_arrow(rows.select(["image_id", "bytes"]))
    out = image_preprocess(ds, size=16, batch_size=4).to_pandas()
    assert len(out) == 12
    assert (out["w"] == 16).all() and (out["h"] == 16).all()
    for r in out.itertuples():
        crop = decode(r.bytes)              # PNG roundtrip is lossless
        assert crop.shape == (16, 16, 3)
        sums = crop.reshape(-1, 3).sum(axis=0)
        assert (r.sum_r, r.sum_g, r.sum_b) == tuple(sums)


def test_dup_ngram_stats_edges():
    from paperchase_crawler_ray.ops.textstats import dup_ngram_stats
    tbl = pa.table({"doc_id": [1, 2, 3, 4], "text": [
        "", "one", "spam spam", "a b a b c a b"]})
    got = dup_ngram_stats(ray.data.from_arrow(tbl)).to_pandas() \
        .set_index("doc_id").drop(columns=["text"])
    assert tuple(got.loc[1]) == (0, 0, 0, 0)
    assert tuple(got.loc[2]) == (0, 0, 0, 0)
    assert tuple(got.loc[3]) == (1, 0, 0, 0)
    # bigrams of 'a b a b c a b': ab ba ab bc ca ab -> 6 total, 2 extra
    # trigrams: aba bab abc bca cab -> 5 total, 0 extra
    assert tuple(got.loc[4]) == (6, 2, 5, 0)


def test_jaccard_similarity_join_exact_and_join_path():
    """Prefix-filter join == naive all-pairs on adversarial synthetic
    data (near-identical docs -> giant buckets; exactness must not be
    capped), on both the broadcast and the Dataset.join verify paths."""
    import itertools
    from paperchase_crawler_ray.ops.dedup import jaccard_similarity_join
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(80):
        base = list(rng.choice(vocab, size=rng.integers(3, 12)))
        texts.append(" ".join(base))
    df = pd.DataFrame({"doc_id": np.arange(80, dtype=np.int64),
                       "text": texts})
    sets = {r.doc_id: set(re.findall(r"\w+", r.text.lower()))
            for r in df.itertuples()}
    naive = set()
    for a, b in itertools.combinations(range(80), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        k = len(sa & sb)
        if 5 * k >= 3 * (len(sa) + len(sb) - k):
            naive.add((a, b))
    for kwargs in ({}, {"broadcast_max_docs": 0}):
        got = jaccard_similarity_join(
            ray.data.from_pandas(df).repartition(5), "doc_id", "text",
            3, 5, **kwargs).to_pandas()
        assert set(zip(got.id_a, got.id_b)) == naive, kwargs
        for r in got.itertuples():
            sa, sb = sets[r.id_a], sets[r.id_b]
            assert r.inter == len(sa & sb)
            assert r.uni == len(sa | sb)


# ---------------------------------------------------------------------------
# bloom semi join / heavy hitters / corr suffstats
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_prunes():
    from paperchase_crawler_ray.ops.sketch import (_hash_column, bloom_build,
                                                   bloom_contains,
                                                   bloom_semi_join)
    rng = np.random.default_rng(7)
    members = rng.choice(10_000_000, size=2000, replace=False)
    small = ray.data.from_arrow(pa.table({"k": pa.array(members, pa.int64())}))
    n_bits, k = 1 << 16, 5
    words = bloom_build(small, "k", n_bits=n_bits, k=k)
    # every member must probe true
    hm = _hash_column(pa.chunked_array([pa.array(members, pa.int64())]))
    assert bloom_contains(words, hm, n_bits, k).all()
    # non-members mostly pruned (fpp ~ (1-e^{-kn/m})^k ~ 0.5% here)
    others = np.setdiff1d(rng.choice(10_000_000, size=20000, replace=False),
                          members)
    ho = _hash_column(pa.chunked_array([pa.array(others, pa.int64())]))
    fpp = bloom_contains(words, ho, n_bits, k).mean()
    assert fpp < 0.05
    # end-to-end exactness on real tables
    li = ray.data.read_parquet(f"{SF}/lineitem.parquet",
                               columns=["l_orderkey", "l_suppkey"])
    sup = ray.data.read_parquet(f"{SF}/supplier.parquet",
                                columns=["s_suppkey", "s_nationkey"])
    sup_small = sup.map_batches(
        lambda b: b.filter(pc.less(b.column("s_nationkey"),
                                   pa.scalar(5, pa.int32()))),
        batch_format="pyarrow")
    got = bloom_semi_join(li, "l_suppkey", sup_small, "s_suppkey",
                          n_bits=1 << 14, k=4).to_pandas()
    li_df = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    sup_df = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
    keys = set(sup_df.loc[sup_df.s_nationkey < 5, "s_suppkey"])
    want = li_df[li_df.l_suppkey.isin(keys)]
    assert sorted(got.l_orderkey.tolist()) == sorted(want.l_orderkey.tolist())


def test_heavy_hitters_matches_exact_counts():
    from paperchase_crawler_ray.ops.sketch import heavy_hitters
    rng = np.random.default_rng(11)
    # zipf-ish: few hot keys + long tail, shuffled across blocks
    vals = np.concatenate([np.repeat(np.arange(10), 500),
                           rng.integers(100, 100_000, size=20000)])
    rng.shuffle(vals)
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(vals, pa.int64())})).repartition(8)
    got = heavy_hitters(ds, "v", threshold=100, capacity=1024).to_pandas()
    ser = pd.Series(vals).value_counts()
    want = ser[ser > 100]
    assert dict(zip(got["item"], got["n_occurrences"])) == \
        {int(k): int(v) for k, v in want.items()}


def test_heavy_hitters_raises_when_capacity_too_small():
    from paperchase_crawler_ray.ops.sketch import heavy_hitters
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(np.arange(5000) % 50, pa.int64())}))
    with pytest.raises(ValueError):
        heavy_hitters(ds, "v", threshold=2, capacity=8).to_pandas()


def test_mg_truncate_superset_guarantee():
    from paperchase_crawler_ray.ops.sketch import _mg_truncate
    rng = np.random.default_rng(3)
    counts = rng.integers(1, 1000, size=500).astype(np.int64)
    ids = np.arange(500)
    cap = 32
    kids, kcounts = _mg_truncate(ids, counts.copy(), cap)
    assert len(kids) <= cap
    n = counts.sum()
    # every id with true count > n/(cap+1) must survive
    for i, c in zip(ids, counts):
        if c > n // (cap + 1):
            assert i in kids
    # and kept counters never exceed true counts
    true = dict(zip(ids, counts))
    for i, c in zip(kids, kcounts):
        assert c <= true[i]


def test_grouped_corr_suffstats_matches_pandas():
    from paperchase_crawler_ray.ops.relational import grouped_corr_suffstats
    li = ray.data.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"])
    got = grouped_corr_suffstats(
        li, "l_returnflag", "l_extendedprice", "l_quantity") \
        .to_pandas().set_index("l_returnflag").sort_index()
    df = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    df["x"] = np.floor(df.l_extendedprice).astype(np.int64)
    df["y"] = np.floor(df.l_quantity).astype(np.int64)
    for flag, g in df.groupby("l_returnflag"):
        row = got.loc[flag]
        assert row["n"] == len(g)
        assert row["sum_x"] == g.x.sum()
        assert row["sum_y"] == g.y.sum()
        assert row["sum_xx"] == (g.x * g.x).sum()
        assert row["sum_yy"] == (g.y * g.y).sum()
        assert row["sum_xy"] == (g.x * g.y).sum()
        # the downstream formula reproduces pandas corr on ints
        n = row["n"]
        cov = row["sum_xy"] - row["sum_x"] * row["sum_y"] / n
        vx = row["sum_xx"] - row["sum_x"] ** 2 / n
        vy = row["sum_yy"] - row["sum_y"] ** 2 / n
        assert np.isclose(cov / np.sqrt(vx * vy), g.x.corr(g.y))


# ---------------------------------------------------------------------------
# grouped quantiles / kth smallest (radix selection) / snapshot diff
# ---------------------------------------------------------------------------

def test_grouped_quantiles_disc_semantics():
    from paperchase_crawler_ray.ops.relational import grouped_quantiles
    rng = np.random.default_rng(5)
    g = np.repeat(["a", "b", "c"], [7, 20, 1])
    v = rng.normal(size=len(g))
    ds = ray.data.from_arrow(pa.table({"g": pa.array(g), "v": pa.array(v)}))
    got = grouped_quantiles(ds, "g", "v", (0.25, 0.5, 0.75)) \
        .to_pandas().set_index("g").sort_index()
    df = pd.DataFrame({"g": g, "v": v})
    for key, grp in df.groupby("g"):
        s = np.sort(grp["v"].to_numpy())
        n = len(s)
        for p, col in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75")]:
            idx = min(max(int(np.ceil(p * n)) - 1, 0), n - 1)
            assert got.loc[key, col] == s[idx]


def test_kth_smallest_matches_sort_floats_and_negatives():
    from paperchase_crawler_ray.ops.relational import kth_smallest
    rng = np.random.default_rng(9)
    v = np.concatenate([rng.normal(size=3000), [-1e300, 1e300, 0.0, -0.0]])
    ds = ray.data.from_arrow(pa.table({"x": pa.array(v)})).repartition(6)
    s = np.sort(v)
    for k in [0, 1, 1500, len(v) - 1]:
        assert kth_smallest(ds, "x", k) == s[k]


def test_kth_smallest_multilevel_descent_and_ints():
    from paperchase_crawler_ray.ops.relational import kth_smallest
    rng = np.random.default_rng(13)
    v = rng.integers(-10**12, 10**12, size=5000)
    ds = ray.data.from_arrow(pa.table({"x": pa.array(v, pa.int64())})) \
        .repartition(4)
    s = np.sort(v)
    # collect_limit=8 forces descent through multiple 16-bit levels
    for k in [0, 2500, 4999]:
        assert kth_smallest(ds, "x", k, collect_limit=8) == s[k]


def test_kth_smallest_constant_column_and_nulls():
    from paperchase_crawler_ray.ops.relational import kth_smallest
    v = pa.array([7.5] * 1000 + [None] * 50)
    ds = ray.data.from_arrow(pa.table({"x": v}))
    # constant column: every level descends into one digit; must not loop
    assert kth_smallest(ds, "x", 0, collect_limit=8) == 7.5
    assert kth_smallest(ds, "x", 999, collect_limit=8) == 7.5
    with pytest.raises(IndexError):
        kth_smallest(ds, "x", 1000)  # nulls don't count


def test_snapshot_diff_classification():
    from paperchase_crawler_ray.ops.relational import snapshot_diff
    old = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([10.0, 20.0, 30.0, 40.0])}))
    new = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 3, 4, 5], pa.int64()),
        "v": pa.array([20.0, 31.0, 40.0, 50.0])}))
    got = snapshot_diff(old, new, "k", ["v"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    want = {1: ("removed", 10.0), 3: ("changed", 31.0), 5: ("added", 50.0)}
    assert len(got) == 3
    for _, r in got.iterrows():
        ch, v = want[r.k]
        assert r.change == ch and r.v == v


# ---------------------------------------------------------------------------
# edit-distance join (PassJoin segment signatures)
# ---------------------------------------------------------------------------

def _lev_full(a: str, b: str) -> int:
    """Reference full-DP Levenshtein for tests."""
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j - 1] + (a[i - 1] != b[j - 1]),
                         prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return prev[lb]


def test_lev_banded_matches_full_dp():
    from paperchase_crawler_ray.ops.linkage import lev_banded
    rng = np.random.default_rng(2)
    alpha = "abcde"
    for _ in range(300):
        a = "".join(rng.choice(list(alpha), rng.integers(0, 12)))
        b = "".join(rng.choice(list(alpha), rng.integers(0, 12)))
        true = _lev_full(a, b)
        for d in (0, 1, 2, 3):
            got = lev_banded(a, b, d)
            assert got == (true if true <= d else d + 1), (a, b, d)


def _mutate(rng, s: str, n_edits: int) -> str:
    alpha = "abcdefgh"
    for _ in range(n_edits):
        op = rng.integers(0, 3)
        if op == 0 and s:  # substitute
            i = rng.integers(0, len(s))
            s = s[:i] + str(rng.choice(list(alpha))) + s[i + 1:]
        elif op == 1 and s:  # delete
            i = rng.integers(0, len(s))
            s = s[:i] + s[i + 1:]
        else:  # insert
            i = rng.integers(0, len(s) + 1)
            s = s[:i] + str(rng.choice(list(alpha))) + s[i:]
    return s


def test_edit_distance_join_lossless_vs_bruteforce():
    from paperchase_crawler_ray.ops.linkage import edit_distance_join
    rng = np.random.default_rng(17)
    base = ["".join(rng.choice(list("abcdefgh"), rng.integers(4, 14)))
            for _ in range(120)]
    texts = base + [_mutate(rng, s, int(rng.integers(1, 3))) for s in base]
    texts = list(dict.fromkeys(texts))  # unique strings, stable order
    ids = np.arange(len(texts), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(ids), "t": pa.array(texts)})).repartition(4)
    for d in (1, 2):
        got = edit_distance_join(ds, "id", "t", max_dist=d).to_pandas()
        got_pairs = {(int(r.id_a), int(r.id_b)): int(r.dist)
                     for _, r in got.iterrows()}
        want = {}
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                dist = _lev_full(texts[i], texts[j])
                if dist <= d:
                    want[(i, j)] = dist
        assert got_pairs == want, f"d={d}"


def test_edit_distance_join_path_matches_broadcast():
    from paperchase_crawler_ray.ops.linkage import edit_distance_join
    rng = np.random.default_rng(23)
    base = ["".join(rng.choice(list("abcd"), rng.integers(5, 10)))
            for _ in range(60)]
    texts = list(dict.fromkeys(
        base + [_mutate(rng, s, 1) for s in base]))
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "t": pa.array(texts)}))
    bc = edit_distance_join(ds, "id", "t", 1, with_texts=True).to_pandas()
    jn = edit_distance_join(ds, "id", "t", 1, broadcast_max_docs=0,
                            with_texts=True).to_pandas()
    key = lambda df: sorted(map(tuple, df[["id_a", "id_b", "dist",
                                           "text_a", "text_b"]].values))
    assert key(bc) == key(jn) and len(bc) > 0


# ---------------------------------------------------------------------------
# interval lookup / winsorize / table checksum / z-order
# ---------------------------------------------------------------------------

def test_interval_lookup_bounds_and_unmatched():
    from paperchase_crawler_ray.ops.relational import interval_lookup_join
    bands = pa.table({"lo": pa.array([0, 10], pa.int64()),
                      "hi": pa.array([10, 20], pa.int64()),
                      "band": pa.array(["a", "b"])})
    ds = ray.data.from_arrow(pa.table({
        "v": pa.array([-1.0, 0.0, 9.999, 10.0, 19.999, 20.0, 25.0])}))
    got = interval_lookup_join(ds, "v", bands, "lo", "hi").to_pandas()
    # [lo, hi): -1, 20, 25 drop; 0/9.999 -> a; 10/19.999 -> b
    assert got["band"].tolist() == ["a", "a", "b", "b"]
    kept = interval_lookup_join(ds, "v", bands, "lo", "hi",
                                unmatched="keep").to_pandas()
    assert len(kept) == 7 and kept["band"].isna().sum() == 3
    overlapping = pa.table({"lo": pa.array([0, 5], pa.int64()),
                            "hi": pa.array([10, 20], pa.int64()),
                            "band": pa.array(["a", "b"])})
    with pytest.raises(ValueError):
        interval_lookup_join(ds, "v", overlapping, "lo", "hi")


def test_winsorize_clips_to_exact_quantiles():
    from paperchase_crawler_ray.ops.relational import winsorize
    rng = np.random.default_rng(31)
    v = rng.normal(size=2001)
    ds = ray.data.from_arrow(pa.table({"x": pa.array(v)})).repartition(5)
    got = np.sort(winsorize(ds, "x", 0.05, 0.95).to_pandas()["x"].to_numpy())
    s = np.sort(v)
    n = len(v)
    lo = s[int(np.ceil(0.05 * n)) - 1]
    hi = s[int(np.ceil(0.95 * n)) - 1]
    assert np.array_equal(got, np.sort(np.clip(v, lo, hi)))
    assert got.min() == lo and got.max() == hi


def test_table_checksum_order_invariant_and_sensitive():
    from paperchase_crawler_ray.ops.sketch import table_checksum
    t = pa.table({"a": pa.array(np.arange(500), pa.int64()),
                  "b": pa.array([f"s{i%7}" for i in range(500)])})
    ds1 = ray.data.from_arrow(t)
    perm = np.random.default_rng(3).permutation(500)
    ds2 = ray.data.from_arrow(t.take(pa.array(perm))).repartition(7)
    c1 = table_checksum(ds1, ["a", "b"]).to_pandas()
    c2 = table_checksum(ds2, ["a", "b"]).to_pandas()
    assert c1["checksum"][0] == c2["checksum"][0]
    assert c1["n_rows"][0] == c2["n_rows"][0] == 500
    # one changed cell changes the sum
    t3 = t.set_column(0, "a", pa.array(
        np.concatenate([[999999], np.arange(1, 500)]), pa.int64()))
    c3 = table_checksum(ray.data.from_arrow(t3), ["a", "b"]).to_pandas()
    assert c3["checksum"][0] != c1["checksum"][0]


def test_morton_key_bit_interleave():
    from paperchase_crawler_ray.ops.layout import morton_key2
    def slow(x, y):
        out = 0
        for i in range(16):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out
    rng = np.random.default_rng(41)
    xs = rng.integers(0, 1 << 16, size=200)
    ys = rng.integers(0, 1 << 16, size=200)
    got = morton_key2(xs, ys)
    assert all(int(g) == slow(int(x), int(y))
               for g, x, y in zip(got, xs, ys))
    # locality sanity: nearby points get nearby keys within a quad
    assert morton_key2(np.array([0]), np.array([0]))[0] == 0
    assert morton_key2(np.array([1]), np.array([0]))[0] == 1
    assert morton_key2(np.array([0]), np.array([1]))[0] == 2
    assert morton_key2(np.array([1]), np.array([1]))[0] == 3


# ---------------------------------------------------------------------------
# aspect/resolution bucketing shards
# ---------------------------------------------------------------------------

def test_aspect_buckets_block_edges_exact():
    from paperchase_crawler_ray.ops.multimodal import aspect_buckets_block
    t = pa.table({
        "w": pa.array([3, 3, 4, 4, 8, 100, 2000], pa.int32()),
        "h": pa.array([4, 5, 4, 3, 6, 100, 1000], pa.int32())})
    got = aspect_buckets_block(t)
    # 3/4 == tall_below edge -> square (strict <); 3/5 tall;
    # 4/3 and 8/6 == wide_above edge -> square (strict >); 2000/1000 wide
    assert got.column("aspect_bucket").to_pylist() == \
        ["square", "tall", "square", "square", "square", "square", "wide"]
    # res tiers at edges (64, 256, 1024), side = max(w, h), right-closed
    assert got.column("res_tier").to_pylist() == [0, 0, 0, 0, 0, 1, 3]


def test_shard_by_aspect_colocates_buckets():
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.ops.multimodal import shard_by_aspect
    rows = make_image_rows(48)
    ds = ray.data.from_arrow(rows).repartition(6)
    out = shard_by_aspect(ds, num_shards=4)
    assert out.count() == 48
    # every (aspect_bucket, res_tier) key lives in exactly one block
    seen: dict = {}
    for bi, b in enumerate(out.iter_batches(batch_format="pyarrow",
                                            batch_size=None)):
        t = b if isinstance(b, pa.Table) else pa.table(b)
        for a, r in set(zip(t.column("aspect_bucket").to_pylist(),
                            t.column("res_tier").to_pylist())):
            assert seen.setdefault((a, r), bi) == bi
    # tag-only path is shuffle-free and preserves row count + columns
    tagged = shard_by_aspect(ds, colocate=False)
    assert tagged.count() == 48
    assert "aspect_bucket" in tagged.schema().names


# ---------------------------------------------------------------------------
# distributed PCA / whitening
# ---------------------------------------------------------------------------

def test_pca_matches_numpy_and_whitens():
    from paperchase_crawler_ray.ops.similarity import (pca_fit,
                                                       pca_transform)
    rng = np.random.default_rng(19)
    # anisotropic gaussian so components are well separated
    A = rng.normal(size=(6, 6)) * np.array([10, 5, 2, 1, 0.5, 0.1])
    X = rng.normal(size=(800, 6)) @ A.T
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(800), pa.int64()),
        "embedding": pa.array(list(X.astype(np.float32)),
                              pa.list_(pa.float32()))})).repartition(5)
    mu, comps, var = pca_fit(ds, k=3)
    Xf = X.astype(np.float32).astype(np.float64)
    assert np.allclose(mu, Xf.mean(axis=0), atol=1e-8)
    cov = np.cov(Xf, rowvar=False)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    want = vecs[:, order].T
    flip = np.sign(want[np.arange(3), np.abs(want).argmax(axis=1)])
    want = want * flip[:, None]
    assert np.allclose(np.abs(comps), np.abs(want), atol=1e-6)
    assert np.allclose(var, vals[order], rtol=1e-6)
    # whitened projection has ~unit variance per component
    muw, compsw, _ = pca_fit(ds, k=3, whiten=True)
    out = pca_transform(ds, muw, compsw).to_pandas()
    P = np.stack(out["pca"].to_numpy())
    assert P.shape == (800, 3)
    assert np.allclose(P.var(axis=0, ddof=1), 1.0, rtol=1e-2)
    assert "embedding" not in out.columns


def test_multi_kth_smallest_shared_descent():
    from paperchase_crawler_ray.ops.relational import multi_kth_smallest
    rng = np.random.default_rng(29)
    v = rng.integers(-10**14, 10**14, size=8000)
    ds = ray.data.from_arrow(pa.table({"x": pa.array(v, pa.int64())})) \
        .repartition(5)
    s = np.sort(v)
    ks = [0, 1, 2, 799, 800, 4000, 7999]  # duplicates of prefix + extremes
    got = multi_kth_smallest(ds, "x", ks)
    assert got == [s[k] for k in ks]
    # deep descent for every rank
    got_deep = multi_kth_smallest(ds, "x", ks, collect_limit=4)
    assert got_deep == [s[k] for k in ks]
    with pytest.raises(IndexError):
        multi_kth_smallest(ds, "x", [0, 8000])


def test_grouping_sets_matches_manual_union():
    from paperchase_crawler_ray.ops.relational import grouping_sets_agg
    df = pd.DataFrame({
        "a": ["x", "x", "y", "y", "y"],
        "b": ["p", "q", "p", "p", "q"],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    got = grouping_sets_agg(ds, ["a", "b"], [["a"], [], ["a", "b"]],
                            "v").to_pandas()
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    # set (a): x->3, y->12; set (): grand 15; set (a,b): 4 rows
    assert len(got) == 2 + 1 + 4
    g_a = got[(got.b == "ALL") & (got.a != "ALL")]
    assert dict(zip(g_a.a, g_a.sum_val)) == {"x": 3.0, "y": 12.0}
    grand = got[(got.a == "ALL") & (got.b == "ALL")]
    assert grand.sum_val.tolist() == [15.0] and grand.n_rows.tolist() == [5]
    fine = got[(got.a != "ALL") & (got.b != "ALL")]
    assert dict(zip(zip(fine.a, fine.b), fine.sum_val)) == \
        {("x", "p"): 1.0, ("x", "q"): 2.0, ("y", "p"): 7.0, ("y", "q"): 5.0}
    with pytest.raises(ValueError):
        grouping_sets_agg(ds, ["a", "b"], [["zz"]], "v")


def test_prep_images_end_to_end_resumable(tmp_path):
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.functions.codec import decode, sniff_format
    from paperchase_crawler_ray.functions.phash import hamming64
    from paperchase_crawler_ray.pipelines.prep import prep_images

    rows = make_image_rows(40)
    src = str(tmp_path / "imgs.parquet")
    pq.write_table(rows, src)
    out = str(tmp_path / "prep")
    res = prep_images(src, out, num_shards=4, hamming_max=6,
                      min_entropy=1.0)
    assert len(res["written"]) > 0 and res["shards_done"] == 4

    # naive twin: all-pairs phash union-find reps + entropy gate
    ids = rows.column("image_id").to_pylist()
    ph = np.array(rows.column("phash").to_pylist(), np.int64)
    parent = {i: i for i in ids}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for j in range(1, len(ids)):
        d = hamming64(ph[:j], ph[j])
        for i in np.flatnonzero(d <= 6):
            ra, rb = sorted((find(ids[i]), find(ids[j])))
            parent[rb] = ra
    reps = {i for i in ids if find(i) == i}
    gray_w = np.array([0.299, 0.587, 0.114])
    expected = set()
    for i, blob in zip(ids, rows.column("bytes").to_pylist()):
        if i not in reps:
            continue
        g = decode(blob, sniff_format(blob)).astype(np.float64) @ gray_w
        hist = np.bincount(np.clip(g, 0, 255).astype(np.uint8).ravel(),
                           minlength=256).astype(np.float64)
        p = hist[hist > 0] / hist.sum()
        if float(-(p * np.log2(p)).sum()) >= 1.0:
            expected.add(i)
    import glob
    got = pq.read_table(glob.glob(f"{out}/shard=*/**/*.parquet",
                                  recursive=True))
    assert set(got.column("image_id").to_pylist()) == expected
    assert "aspect_bucket" in got.column_names

    # kill-safe rerun: every shard sealed -> nothing rewritten
    res2 = prep_images(src, out, num_shards=4, hamming_max=6,
                       min_entropy=1.0)
    assert res2["written"] == [] and \
        sorted(res2["skipped"]) == sorted(res["written"] + res["skipped"])


def test_zorder_write_and_pruned_read(tmp_path):
    from paperchase_crawler_ray.ops.layout import (morton_key2, pruned_read,
                                                   write_sorted_by_zorder)
    rng = np.random.default_rng(47)
    n = 20000
    t = pa.table({
        "x": pa.array(rng.integers(0, 1 << 16, n), pa.int64()),
        "y": pa.array(rng.integers(0, 1 << 16, n), pa.int64()),
        "payload": pa.array(rng.integers(0, 10**9, n), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(6)
    out = str(tmp_path / "z")
    nfiles = write_sorted_by_zorder(ds, out, "x", "y", rows_per_file=2048)
    assert nfiles >= 8
    # a selective zkey range: the bottom-left quadrant's key space
    lo, hi = 0, int(morton_key2(np.array([(1 << 14) - 1]),
                                np.array([(1 << 14) - 1]))[0])
    got, stats = pruned_read(out, "zkey", lo, hi)
    gdf = got.to_pandas()
    keys = morton_key2(t.column("x").to_numpy(), t.column("y").to_numpy())
    want = np.flatnonzero((keys >= lo) & (keys <= hi))
    assert len(gdf) == len(want)
    assert sorted(gdf["payload"]) == sorted(
        t.column("payload").to_numpy()[want].tolist())
    # the point of the layout: most files were never opened
    assert stats["files_read"] < stats["files_total"]
    assert stats["files_read"] <= max(2, stats["files_total"] // 4)
    # empty range still returns the schema and reads nothing
    empty, st2 = pruned_read(out, "zkey", -100, -50)
    assert empty.count() == 0 and st2["files_read"] == 0


def test_bucket_join_equals_plain_join(tmp_path):
    from paperchase_crawler_ray.ops.sink import bucket_join, write_resumable
    rng = np.random.default_rng(53)
    a = pa.table({
        "k": pa.array(rng.integers(0, 300, 2000), pa.int64()),
        "va": pa.array(rng.integers(0, 10**6, 2000), pa.int64())})
    b = pa.table({
        "k2": pa.array(rng.integers(0, 300, 500), pa.int64()),
        "vb": pa.array(rng.integers(0, 10**6, 500), pa.int64())})
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    write_resumable(ray.data.from_arrow(a).repartition(4), da, "k", 8)
    write_resumable(ray.data.from_arrow(b).repartition(3), db, "k2", 8)
    got = bucket_join(da, db, "k", "k2", 8).to_pandas()
    want = a.to_pandas().merge(b.to_pandas(), left_on="k", right_on="k2") \
        .drop(columns=["k2"])
    key = lambda df: sorted(map(tuple, df[["k", "va", "vb"]].values))
    assert key(got) == key(want) and len(got) > 0
    # unsealed input refused
    import os
    os.remove(os.path.join(db, "shard=3", "_COMMITTED"))
    with pytest.raises(ValueError):
        bucket_join(da, db, "k", "k2", 8)


def test_write_clustered_key_locality_and_order(tmp_path):
    import glob
    from paperchase_crawler_ray.ops.sink import (read_resumable,
                                                 write_clustered)
    rng = np.random.default_rng(61)
    n = 5000
    t = pa.table({
        "k": pa.array(rng.integers(0, 120, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 10**9, n), pa.int64()),
        "v": pa.array(rng.integers(0, 10**6, n), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(7)
    out = str(tmp_path / "clustered")
    res = write_clustered(ds, out, "k", "ts", num_shards=6)
    assert sorted(res["written"]) == list(range(6))
    # every key lives in exactly ONE file, contiguous and ts-sorted
    key_file: dict = {}
    for f in glob.glob(f"{out}/shard=*/**/*.parquet", recursive=True):
        ft = pq.read_table(f)
        ks = ft.column("k").to_numpy()
        ts = ft.column("ts").to_numpy()
        for k in np.unique(ks):
            assert key_file.setdefault(int(k), f) == f
            kt = ts[ks == k]
            assert (np.diff(kt) >= 0).all()
            # contiguity: the key's rows form one run
            pos = np.flatnonzero(ks == k)
            assert pos[-1] - pos[0] + 1 == len(pos)
    assert read_resumable(out, 6).count() == n


# ---------------------------------------------------------------------------
# null-handling regressions (code-review findings)
# ---------------------------------------------------------------------------

def test_winsorize_ignores_nulls_in_ranks():
    from paperchase_crawler_ray.ops.relational import winsorize
    v = list(np.linspace(0, 99, 100)) + [None] * 50
    ds = ray.data.from_arrow(pa.table({"x": pa.array(v)})).repartition(4)
    out = winsorize(ds, "x", 0.05, 0.95).to_pandas()["x"]
    non_null = out.dropna().to_numpy()
    # quantiles over the 100 non-null values: ceil(.05*100)-1=4 -> 4.0
    s = np.sort(np.linspace(0, 99, 100))
    lo, hi = s[4], s[94]
    assert non_null.min() == lo and non_null.max() == hi
    assert out.isna().sum() == 50  # nulls pass through


def test_heavy_hitters_skips_nulls():
    from paperchase_crawler_ray.ops.sketch import heavy_hitters
    vals = ["a"] * 100 + ["b"] * 5 + [None] * 3
    ds = ray.data.from_arrow(pa.table({"s": pa.array(vals)})).repartition(3)
    got = heavy_hitters(ds, "s", threshold=50, capacity=64).to_pandas()
    assert dict(zip(got["item"], got["n_occurrences"])) == {"a": 100}


def test_edit_distance_join_null_texts():
    from paperchase_crawler_ray.ops.linkage import edit_distance_join
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([0, 1, 2, 3], pa.int64()),
        "t": pa.array([None, "", "a", "zzzzzz"])}))
    got = edit_distance_join(ds, "id", "t", 1).to_pandas()
    pairs = {(int(r.id_a), int(r.id_b)): int(r.dist)
             for _, r in got.iterrows()}
    # null ~ "": dist("", "")=0, dist("", "a")=1 both ways
    assert pairs == {(0, 1): 0, (0, 2): 1, (1, 2): 1}


def test_table_checksum_null_cells():
    from paperchase_crawler_ray.ops.sketch import table_checksum
    t1 = pa.table({"a": pa.array([1, None, 3], pa.int64()),
                   "b": pa.array(["x", "y", None])})
    c1 = table_checksum(ray.data.from_arrow(t1), ["a", "b"]).to_pandas()
    assert c1["n_rows"][0] == 3
    # null is distinguishable from empty string
    t2 = pa.table({"a": pa.array([1, None, 3], pa.int64()),
                   "b": pa.array(["x", "y", ""])})
    c2 = table_checksum(ray.data.from_arrow(t2), ["a", "b"]).to_pandas()
    assert c1["checksum"][0] != c2["checksum"][0]


def test_multi_kth_bounded_collect_on_massive_ties():
    from paperchase_crawler_ray.ops.relational import multi_kth_smallest
    # one dominant tied value: the collect pass must ship (value, count)
    # pairs, never the raw tied population
    v = np.concatenate([np.full(50000, 7), np.arange(100)])
    ds = ray.data.from_arrow(pa.table({"x": pa.array(v, pa.int64())})) \
        .repartition(6)
    s = np.sort(v)
    got = multi_kth_smallest(ds, "x", [0, 25000, 50099], collect_limit=4)
    assert got == [s[0], s[25000], s[50099]]


def test_zorder_rewrite_is_idempotent(tmp_path):
    from paperchase_crawler_ray.ops.layout import (pruned_read,
                                                   write_sorted_by_zorder)
    rng = np.random.default_rng(67)
    t = pa.table({"x": pa.array(rng.integers(0, 1 << 16, 3000), pa.int64()),
                  "y": pa.array(rng.integers(0, 1 << 16, 3000), pa.int64())})
    out = str(tmp_path / "z")
    n1 = write_sorted_by_zorder(ray.data.from_arrow(t), out, "x", "y",
                                rows_per_file=1024)
    got1, _ = pruned_read(out, "zkey", 0, 1 << 62)
    c1 = got1.count()  # drain before the rewrite wipes the dir
    # rerun into the SAME dir: stale files must be wiped, not doubled
    n2 = write_sorted_by_zorder(ray.data.from_arrow(t), out, "x", "y",
                                rows_per_file=1024)
    got2, _ = pruned_read(out, "zkey", 0, 1 << 62)
    assert n1 == n2 and c1 == got2.count() == 3000


def test_shard_by_aspect_streams_to_out_dir(tmp_path):
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.ops.multimodal import shard_by_aspect
    rows = make_image_rows(32)
    ds = ray.data.from_arrow(rows).repartition(4)
    out = shard_by_aspect(ds, num_shards=4,
                          out_dir=str(tmp_path / "shards"))
    df = out.to_pandas()
    assert len(df) == 32 and "aspect_bucket" in df.columns
    assert set(df["image_id"]) == set(rows.column("image_id").to_pylist())


def test_hash_split_deterministic_and_proportional():
    from paperchase_crawler_ray.ops.relational import hash_split
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(5000), pa.int64())}))
    a = hash_split(ds, "k", {"train": 80, "val": 10, "test": 10}) \
        .to_pandas().set_index("k")["split"]
    b = hash_split(ds.repartition(7), "k",
                   {"train": 80, "val": 10, "test": 10}) \
        .to_pandas().set_index("k")["split"]
    assert (a.sort_index() == b.sort_index()).all()  # partition-invariant
    frac = a.value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.02
    with pytest.raises(ValueError):
        hash_split(ds, "k", {"train": 70, "val": 10})


def test_expect_counts_violations():
    from paperchase_crawler_ray.ops.relational import expect
    t = pa.table({
        "id": pa.array([1, 1, 2, 3, None], pa.int64()),
        "v": pa.array([5.0, 50.0, -2.0, 10.0, 7.0])})
    ds = ray.data.from_arrow(t).repartition(2)
    got = expect(ds, not_null=["id"], between={"v": (0.0, 20.0)},
                 unique=[["id"]]).to_pandas().set_index("rule")
    assert got.loc["null:id", "n_violations"] == 1
    assert got.loc["range:v", "n_violations"] == 2  # 50.0 and -2.0
    # duplicate id=1 contributes one extra row (null key groups too,
    # but the single null row is not a duplicate)
    assert got.loc["unique:id", "n_violations"] == 1


def test_text_ops_tolerate_null_text():
    """Null text == empty text across the text-op library (the
    production corpus always has some)."""
    from paperchase_crawler_ray.ops.dedup import (minhash_lsh_dedup,
                                                  simhash_dedup)
    from paperchase_crawler_ray.ops.textstats import (fingerprint_batch,
                                                      language_id_batch,
                                                      quality_score_batch,
                                                      quality_stats_batch,
                                                      token_count)
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["hello world", None, ""])})
    ds = ray.data.from_arrow(t)
    assert token_count(ds).to_pandas()["n_tokens"].tolist() == [2, 0, 0]
    for fn in (quality_stats_batch, quality_score_batch,
               language_id_batch, fingerprint_batch):
        out = fn(t)
        assert out.num_rows == 3
    assert minhash_lsh_dedup(ds, "doc_id", "text").count() >= 1
    assert simhash_dedup(ds, "doc_id", "text").count() >= 1


def test_image_prep_chain_split_assignment():
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.pipelines.prep import image_prep_chain
    rows = make_image_rows(48)
    out = image_prep_chain(ray.data.from_arrow(rows),
                           split_fractions={"train": 80, "val": 10,
                                            "test": 10}).to_pandas()
    assert set(out["split"]) <= {"train", "val", "test"}
    # deterministic: same ids -> same splits on a rerun
    out2 = image_prep_chain(ray.data.from_arrow(rows),
                            split_fractions={"train": 80, "val": 10,
                                             "test": 10}).to_pandas()
    a = out.set_index("image_id")["split"].sort_index()
    b = out2.set_index("image_id")["split"].sort_index()
    assert (a == b).all()


def test_pagerank_damped_no_overflow():
    from paperchase_crawler_ray.ops.graph import _damped
    sc = np.array([10**18, 1_000_000, 0, 123_456_789_012_345], np.int64)
    got = _damped(sc, 850_000)
    want = [s * 850_000 // 1_000_000 for s in sc.tolist()]  # python ints
    assert got.tolist() == want
    # the naive form overflows on the first element; ours must not
    assert got[0] == 850_000_000_000_000_000


def test_grouping_sets_int_column_keeps_int64():
    from paperchase_crawler_ray.ops.relational import rollup_agg
    t = pa.table({"a": pa.array(["x", "y", "x"]),
                  "b": pa.array(["p", "p", "q"]),
                  "v": pa.array([2**53 + 1, 1, 1], pa.int64())})
    got = rollup_agg(ray.data.from_arrow(t), ["a", "b"], "v").to_pandas()
    assert str(got["sum_val"].dtype) == "int64"
    grand = got[(got.a == "ALL") & (got.b == "ALL")]
    assert int(grand["sum_val"].iloc[0]) == 2**53 + 3  # exact past 2^53


# -- round-3 ADVICE regressions ----------------------------------------------

def test_bucket_join_empty_sealed_table(tmp_path):
    """A fully-sealed but EMPTY write_resumable output is a legitimate
    input: bucket_join must return an empty result with the joined
    schema, not raise (ADVICE r2)."""
    from paperchase_crawler_ray.ops.sink import (bucket_join,
                                                 read_resumable,
                                                 write_resumable)
    a = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "va": pa.array([10, 20, 30], pa.int64())})
    b_empty = pa.table({"k2": pa.array([], pa.int64()),
                        "vb": pa.array([], pa.int64())})
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    write_resumable(ray.data.from_arrow(a), da, "k", 4)
    write_resumable(ray.data.from_arrow(b_empty), db, "k2", 4)
    res = bucket_join(da, db, "k", "k2", 4)
    # schema asserted on the Dataset (Ray 2.49 to_pandas() drops
    # columns for all-empty datasets)
    assert set(res.schema().names) == {"k", "va", "vb"}
    assert res.count() == 0
    # and the empty sealed table reads back typed, not as an error
    rb = read_resumable(db, 4)
    assert rb.count() == 0
    assert set(rb.schema().names) >= {"k2", "vb"}


def test_winner_check_insert_retry_regrant(ray_session):
    """Ray Data retries map tasks: a re-probed winner batch must get the
    SAME grants as its first attempt (per-wave claimed map), not be
    silently dropped by the cross-wave cuckoo (ADVICE r2, medium)."""
    import ray as _ray
    from paperchase_crawler_ray.stages.seen import SeenShardActor
    actor = SeenShardActor.remote(capacity=1 << 12)
    h = np.array([111, 111, 222], np.int64)
    prio = np.array([5, 3, 1], np.int64)      # row0 wins hash 111
    depth = np.array([0, 0, 0], np.int64)
    ph = np.array([7, 8, 9], np.int64)
    pos = np.array([0, 1, 0], np.int64)
    _ray.get(actor.begin_wave.remote())
    _ray.get(actor.offer_winners.remote(h, prio, depth, ph, pos))
    first = _ray.get(actor.winner_check_insert.remote(h, prio, depth, ph, pos))
    assert first.tolist() == [True, False, True]
    # simulated task retry: identical probe must re-grant identically
    retry = _ray.get(actor.winner_check_insert.remote(h, prio, depth, ph, pos))
    assert retry.tolist() == first.tolist()
    # next wave: hashes are now cross-wave seen -> denied
    _ray.get(actor.begin_wave.remote())
    _ray.get(actor.offer_winners.remote(h, prio, depth, ph, pos))
    nxt = _ray.get(actor.winner_check_insert.remote(h, prio, depth, ph, pos))
    assert nxt.tolist() == [False, False, False]


def test_multi_kth_null_aware_ranks(ray_session):
    """Quantile ranks must index the NON-NULL sorted order (DuckDB
    quantile_disc ignores nulls) — the _q_kth_value/_q_equidepth shape
    on a null-bearing column (ADVICE r2)."""
    from paperchase_crawler_ray.ops.relational import (count_non_null,
                                                       multi_kth_smallest)
    rng = np.random.default_rng(7)
    vals = rng.normal(0, 100, 401).round(3).tolist()
    vals = [None if i % 5 == 0 else v for i, v in enumerate(vals)]
    ds = ray.data.from_arrow(pa.table({"value": pa.array(vals, pa.float64())}))
    nn = count_non_null(ds, "value")
    nonnull = sorted(v for v in vals if v is not None)
    assert nn == len(nonnull)
    ps = (0.10, 0.50, 0.90)
    ks = [min(max(int(np.ceil(p * nn)) - 1, 0), nn - 1) for p in ps]
    got = multi_kth_smallest(ds, "value", ks)
    assert got == [nonnull[k] for k in ks]


def test_dedup_drop_antijoin_path_equivalent(docs_table, ray_session,
                                             monkeypatch):
    """Forcing _DROP_BROADCAST_MAX=0 routes duplicate-id removal through
    the native left_anti join (the 100 TB path) — results must be
    identical to the broadcast np.isin path (VERDICT r2 next-round #1)."""
    from paperchase_crawler_ray.ops import dedup as D
    ds = ray.data.from_arrow(docs_table)
    base_mh = sorted(D.minhash_lsh_dedup(ds, "doc_id", "text", threshold=0.6)
                     .select_columns(["doc_id"]).to_pandas()["doc_id"])
    base_sh = sorted(D.simhash_dedup(ds, "doc_id", "text")
                     .select_columns(["doc_id"]).to_pandas()["doc_id"])
    monkeypatch.setattr(D, "_DROP_BROADCAST_MAX", 0)
    forced_mh = sorted(D.minhash_lsh_dedup(ds, "doc_id", "text", threshold=0.6)
                       .select_columns(["doc_id"]).to_pandas()["doc_id"])
    forced_sh = sorted(D.simhash_dedup(ds, "doc_id", "text")
                       .select_columns(["doc_id"]).to_pandas()["doc_id"])
    assert forced_mh == base_mh and len(base_mh) > 0
    assert forced_sh == base_sh and len(base_sh) > 0


def test_graph_auto_mode_switches_to_join(ray_session, monkeypatch):
    """mode='auto' (the default every caller inherits) must route to the
    distributed join path above the edge threshold and produce identical
    results (VERDICT r2 next-round #2)."""
    from paperchase_crawler_ray.ops import graph as G
    pairs = [(i, i + 1) for i in range(0, 40, 2)] + [(1, 20), (3, 21)]
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], pa.int64()),
        "b": pa.array([p[1] for p in pairs], pa.int64())}))
    cc_b = G.connected_components(edges).to_pandas().sort_values("node")
    pr_b = G.pagerank(edges, iters=3).to_pandas().sort_values("node")
    monkeypatch.setattr(G, "_JOIN_MODE_EDGE_ROWS", 0)
    cc_j = G.connected_components(edges).to_pandas().sort_values("node")
    pr_j = G.pagerank(edges, iters=3).to_pandas().sort_values("node")
    assert cc_b.values.tolist() == cc_j.values.tolist()
    assert pr_b.values.tolist() == pr_j.values.tolist()


def test_components_string_nodes_vectorized_driver(ray_session):
    """The vectorized driver merge must handle STRING node ids (the
    host-graph case: pipelines.analyze feeds host names)."""
    from paperchase_crawler_ray.ops.graph import connected_components
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array(["h1", "h2", "h4", "h5"], pa.string()),
        "b": pa.array(["h2", "h3", "h5", "h6"], pa.string())}))
    got = connected_components(edges).to_pandas()
    comp = dict(zip(got["node"], got["component"]))
    assert comp == {"h1": "h1", "h2": "h1", "h3": "h1",
                    "h4": "h4", "h5": "h4", "h6": "h4"}


def test_corpus_dup_spans_matches_naive(docs_table, ray_session):
    """Corpus-wide duplicated-5-gram position coverage == pure-Python
    twin on real driver docs, on BOTH the broadcast and keyed-semi-join
    paths."""
    from collections import Counter
    from paperchase_crawler_ray.ops.textstats import corpus_dup_spans
    n = 5
    toks = {r["doc_id"]: re.findall(r"\w+", (r["text"] or "").lower(),
                                    re.ASCII)
            for r in docs_table.to_pylist()}
    grams = {d: [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]
             for d, t in toks.items()}
    cnt = Counter(g for gs in grams.values() for g in gs)
    want = {d: (len(gs), sum(1 for g in gs if cnt[g] >= 2))
            for d, gs in grams.items() if gs}
    ds = ray.data.from_arrow(docs_table)
    for bmax in (2_000_000, 0):   # broadcast path, then keyed semi-join
        got = corpus_dup_spans(ds, "doc_id", "text", n=n,
                               broadcast_max=bmax).to_pandas()
        got_map = {r.doc_id: (r.n_pos, r.n_dup_pos)
                   for r in got.itertuples()}
        assert got_map == want, f"broadcast_max={bmax}"
    assert sum(v[1] for v in want.values()) > 0  # non-degenerate corpus


def test_remove_dup_spans_matches_naive(docs_table, ray_session):
    """Token-level duplicated-span removal == pure-Python twin on both
    the broadcast and keyed (semi-join + string-agg + re-attach) paths."""
    from collections import Counter
    from paperchase_crawler_ray.ops.textstats import remove_dup_spans
    n = 5
    toks = {r["doc_id"]: re.findall(r"\w+", (r["text"] or "").lower(),
                                    re.ASCII)
            for r in docs_table.to_pylist()}
    grams = {d: [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]
             for d, t in toks.items()}
    cnt = Counter(g for gs in grams.values() for g in gs)
    want = {}
    for d, t in toks.items():
        covered = [False] * len(t)
        for i, g in enumerate(grams[d]):
            if cnt[g] >= 2:
                for j in range(i, min(i + n, len(t))):
                    covered[j] = True
        want[d] = (" ".join(w for w, c in zip(t, covered) if not c),
                   sum(covered))
    ds = ray.data.from_arrow(docs_table)
    for bmax in (2_000_000, 0):
        got = remove_dup_spans(ds, "doc_id", "text", n=n,
                               broadcast_max=bmax).to_pandas()
        gm = {r.doc_id: (r.clean_text, r.n_removed) for r in got.itertuples()}
        assert gm == want, f"broadcast_max={bmax}"
    assert any(v[1] > 0 for v in want.values())


def test_grouped_lead_matches_pandas(ray_session):
    """LEAD == pandas shift(-1) per group over the total order,
    including null values riding through."""
    from paperchase_crawler_ray.ops.relational import grouped_lead
    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 37, n),
        "o": rng.permutation(n),
        "v": rng.integers(0, 10**6, n).astype("float64")})
    df.loc[df.index % 7 == 0, "v"] = np.nan
    got = grouped_lead(ray.data.from_pandas(df), "k", [("o", False)], "v",
                       out_col="nxt").to_pandas()
    want = df.sort_values(["k", "o"]).copy()
    want["nxt"] = want.groupby("k")["v"].shift(-1)
    g = got.sort_values(["k", "o"]).reset_index(drop=True)
    w = want.reset_index(drop=True)
    assert np.array_equal(g["nxt"].isna(), w["nxt"].isna())
    m = ~g["nxt"].isna()
    assert np.array_equal(g.loc[m, "nxt"].to_numpy(),
                          w.loc[m, "nxt"].to_numpy())


# -- versioned fragment-manifest table format --------------------------------

def test_versioned_table_snapshots_and_time_travel(tmp_path, ray_session):
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.ops import table_format as T
    root = str(tmp_path / "vt")
    rows = make_image_rows(24)
    a, b = rows.slice(0, 16), rows.slice(16, 8)
    v1 = T.append_table(ray.data.from_arrow(a), root)
    v2 = T.append_table(ray.data.from_arrow(b), root)
    assert (v1, v2) == (1, 2) and T.current_version(root) == 2
    # time travel: v1 sees only the first batch; latest sees both
    ids_v1 = set(T.read_table(root, version=1)
                 .select_columns(["image_id"]).to_pandas()["image_id"])
    ids_v2 = set(T.read_table(root)
                 .select_columns(["image_id"]).to_pandas()["image_id"])
    assert ids_v1 == set(a.column("image_id").to_pylist())
    assert ids_v2 == set(rows.column("image_id").to_pylist())
    # O(keys) logical delete -> new version, no rewrite; old version intact
    dead = a.column("image_id").to_pylist()[:5]
    v3 = T.delete_where_keys(root, dead)
    ids_v3 = set(T.read_table(root)
                 .select_columns(["image_id"]).to_pandas()["image_id"])
    assert ids_v3 == ids_v2 - set(dead)
    assert set(T.read_table(root, version=2).select_columns(["image_id"])
               .to_pandas()["image_id"]) == ids_v2
    # column pruning still applies deletes when key not requested
    caps = T.read_table(root, columns=["caption"]).to_pandas()
    assert len(caps) == len(ids_v3) and list(caps.columns) == ["caption"]
    # compact folds the deletion vector; contents unchanged, deletes gone
    v4 = T.compact_table(root)
    assert v4 == v3 + 1
    ids_v4 = set(T.read_table(root)
                 .select_columns(["image_id"]).to_pandas()["image_id"])
    assert ids_v4 == ids_v3
    import json, os
    m = json.load(open(os.path.join(root, "_versions", f"{v4}.json")))
    assert m["deletes"] == []
    # payload survives byte-exact through append/delete/compact
    got = T.read_table(root).to_pandas().set_index("image_id")
    src = rows.to_pandas().set_index("image_id")
    for iid in ids_v4:
        assert got.loc[iid, "bytes"] == src.loc[iid, "bytes"]
        assert got.loc[iid, "phash"] == src.loc[iid, "phash"]


def test_versioned_table_overwrite_and_crash_safety(tmp_path, ray_session):
    import os
    from paperchase_crawler_ray.fixtures import make_image_rows
    from paperchase_crawler_ray.ops import table_format as T
    root = str(tmp_path / "vt2")
    rows = make_image_rows(12)
    T.append_table(ray.data.from_arrow(rows.slice(0, 8)), root)
    v2 = T.overwrite_table(ray.data.from_arrow(rows.slice(8, 4)), root)
    ids = set(T.read_table(root).select_columns(["image_id"])
              .to_pandas()["image_id"])
    assert ids == set(rows.slice(8, 4).column("image_id").to_pylist())
    # v1 still fully readable after the overwrite (immutable fragments)
    assert len(T.read_table(root, version=1).to_pandas()) == 8
    # crash simulation: an orphan manifest WITHOUT the _LATEST flip must
    # be invisible to plain reads (commit point = pointer rename)
    orphan = os.path.join(root, "_versions", f"{v2 + 1}.json")
    with open(orphan, "w") as f:
        f.write('{"fragments": [], "deletes": [], "key_col": "image_id"}')
    assert T.current_version(root) == v2
    assert len(T.read_table(root).to_pandas()) == 4


def _duckdb_twin(name: str, sf: str = "/root/testdata/sf0.001"):
    """Run a queries() entry and its oracle_sql() twin side by side."""
    import duckdb

    import __ray_entry__ as E
    got = E.queries()[name](sf)
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    want = con.execute(E.oracle_sql()[name]).df()
    cols = sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    return len(g)


def test_dim_stats_matches_duckdb(ray_session):
    """Per-dimension vector stats: 64 dims, exact min/max/pos-count."""
    assert _duckdb_twin("q_dim_stats") == 64


def test_above_avg_matches_duckdb(ray_session):
    """Correlated-subquery broadcast filter, non-trivial selectivity."""
    n = _duckdb_twin("q_above_avg")
    assert 0 < n


def test_priority_class_matches_duckdb(ray_session):
    """Q12-shape conditional aggregates over the fact-fact join."""
    assert _duckdb_twin("q_priority_class") >= 1


def test_exists_orders_matches_duckdb(ray_session):
    """Q4-shape correlated EXISTS as a max-pushdown keyed join."""
    assert _duckdb_twin("q_exists_orders") >= 1


def test_big_orders_matches_duckdb(ray_session):
    """Q18-shape HAVING-filtered aggregate joined back to dims."""
    assert _duckdb_twin("q_big_orders") > 1


def test_late_only_supplier_keyed_path_matches_duckdb(ray_session,
                                                      monkeypatch):
    """Q21's orders side is size-switched (broadcast below 2M rows,
    keyed join above); force the KEYED branch and re-verify against the
    oracle so the at-scale plan stays correctness-covered."""
    monkeypatch.setenv("PC_Q21_BROADCAST_MAX", "0")
    assert _duckdb_twin("q_late_only_supplier") >= 1


def test_exists_big_orders_keyed_paths_match_duckdb(ray_session,
                                                    monkeypatch):
    """Q4/Q18's size-switched KEYED branches (partial max + keyed join;
    two keyed joins) re-verified against the oracle — the broadcast
    branches are what the sampled driver check exercises."""
    monkeypatch.setenv("PC_Q4_BROADCAST_MAX", "0")
    monkeypatch.setenv("PC_Q18_BROADCAST_MAX", "0")
    assert _duckdb_twin("q_exists_orders") >= 1
    assert _duckdb_twin("q_big_orders") > 1


def test_partial_keyed_agg_matches_ray_aggregate(ray_session):
    """Two-level partial sum/min/max == Ray's groupby aggregate, with
    duplicate keys spanning blocks."""
    from ray.data.aggregate import Max, Min, Sum
    from paperchase_crawler_ray.ops.relational import partial_keyed_agg
    rng = np.random.Generator(np.random.PCG64(3))
    t = pa.table({
        "k": pa.array(rng.integers(0, 40, 5000), pa.int64()),
        "v": pa.array(rng.integers(-100, 100, 5000), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(7)
    got = partial_keyed_agg(ds, ["k"], [("v", "sum"), ("v", "min"),
                                        ("v", "max")]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    want = ray.data.from_arrow(t).groupby("k").aggregate(
        Sum("v", alias_name="v_sum"), Min("v", alias_name="v_min"),
        Max("v", alias_name="v_max")).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "v_sum", "v_min", "v_max"]],
        want[["k", "v_sum", "v_min", "v_max"]], check_dtype=False)
    with pytest.raises(ValueError):
        partial_keyed_agg(ds, ["k"], [("v", "mean")])


def test_promo_share_matches_duckdb(ray_session):
    """Q14-shape conditional revenue ratio in exact integer units."""
    assert _duckdb_twin("q_promo_share") == 1


def test_important_nations_matches_duckdb(ray_session):
    """Q11-shape group-sum vs global-scalar HAVING, integer-exact."""
    assert _duckdb_twin("q_important_nations") >= 1


def test_volume_shipping_matches_duckdb(ray_session):
    """Q7-shape cross-border revenue by nation pair and ship year."""
    assert _duckdb_twin("q_volume_shipping") >= 1


def test_custdist_matches_duckdb(ray_session):
    """Q13-shape order-count distribution incl. the zero bucket."""
    assert _duckdb_twin("q_custdist") >= 1


def test_supplier_parts_matches_duckdb(ray_session):
    """Q16-shape distinct-supplier count with NOT IN exclusion."""
    assert _duckdb_twin("q_supplier_parts") >= 1


def test_small_qty_rev_matches_duckdb(ray_session):
    """Q17-shape correlated-AVG rewrite in cross-multiplied ints."""
    assert _duckdb_twin("q_small_qty_rev") == 1


def test_disjunctive_rev_matches_duckdb(ray_session):
    """Q19-shape OR-of-conjunctions revenue, broadcast part attach."""
    assert _duckdb_twin("q_disjunctive_rev") == 1


def test_late_only_supplier_matches_duckdb(ray_session):
    """Q21-shape double-EXISTS as per-order distinct-pair aggregates."""
    assert _duckdb_twin("q_late_only_supplier") >= 1


def test_dormant_customers_matches_duckdb(ray_session):
    """Q22-shape global-avg HAVING + anti join, integer-exact."""
    assert _duckdb_twin("q_dormant_customers") >= 1


def test_exact_dedup_null_key_group_survives(ray_session):
    """Null keys form their OWN group (SQL DISTINCT / PARTITION BY):
    the value->null sort transition must start a new run — not_equal
    alone yields null there and a bare fill_null(False) silently
    merged the null group into its neighbor, dropping its winner."""
    from paperchase_crawler_ray.ops.relational import exact_dedup
    t = pa.table({"k": [1, 1, None, None, 2], "v": [3, 1, 5, 2, 9]})
    out = exact_dedup(ray.data.from_arrow(t), ["k"],
                      [("v", False)]).to_pandas()
    assert len(out) == 3
    assert out.loc[out["k"].isna(), "v"].item() == 2
    # multi-block + stitched final stage: same semantics
    t2 = pa.table({"k": ([None] * 50) + list(range(200)),
                   "v": list(range(250))})
    out2 = exact_dedup(ray.data.from_arrow(t2).repartition(7), ["k"],
                       [("v", False)]).to_pandas()
    assert len(out2) == 201
    assert out2.loc[out2["k"].isna(), "v"].item() == 0


def test_exact_dedup_stitched_final_matches_pandas(ray_session):
    """The sort-stitched winner stage (replacing per-group pandas
    map_groups) over many blocks, with and without salting."""
    from paperchase_crawler_ray.ops.relational import exact_dedup
    rng = np.random.default_rng(7)
    n = 20000
    tt = pa.table({"k": rng.integers(0, 300, n),
                   "u": np.arange(n),
                   "v": rng.integers(0, 1000, n)})
    df = tt.to_pandas()
    want = (df.sort_values(["v", "u"], ascending=[False, True])
            .groupby("k").head(1).sort_values("k").reset_index(drop=True))
    ds = ray.data.from_arrow(tt).repartition(13)
    for salt in (None, 4):
        got = exact_dedup(ds, ["k"], [("v", True), ("u", False)],
                          salt_partitions=salt).to_pandas()
        got = got.sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want[got.columns.tolist()])


def test_semdedup_matches_driver_twin(ray_session):
    """SemDeDup (k-means cells + within-cell cosine prune) must equal
    the exact driver-numpy twin when both share centroids, and must
    keep the smallest vec_id of every semantic-dup group."""
    from paperchase_crawler_ray.ops.dedup import semdedup
    from paperchase_crawler_ray.ops.similarity import kmeans_distributed
    sf = "/root/testdata/sf0.001"
    emb = ray.data.read_parquet(f"{sf}/embeddings.parquet",
                                columns=["vec_id", "embedding", "label"])
    cents = kmeans_distributed(
        emb.select_columns(["vec_id", "embedding"]), 16, iters=8, seed=42)
    thr = 0.35
    got = sorted(semdedup(emb, threshold=thr, centroids=cents)
                 .to_pandas()["vec_id"])

    df = emb.to_pandas().sort_values("vec_id").reset_index(drop=True)
    E = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
    cell = (E @ cents.T).argmax(axis=1)
    ids = df["vec_id"].to_numpy()
    keep = []
    for c in np.unique(cell):
        idx = np.flatnonzero(cell == c)      # ascending vec_id within cell
        sub = E[idx]
        close = np.triu(sub @ sub.T >= thr, k=1)
        keep.extend(ids[idx[~close.any(axis=0)]])
    assert got == sorted(keep)
    assert 0 < len(got) < len(df)            # pruned something, kept something


def test_mad_matches_duckdb(ray_session):
    """Median absolute deviation via two radix descents, exact vs
    quantile_disc SQL."""
    assert _duckdb_twin("q_mad") == 1


def test_rolling_distinct_matches_duckdb(ray_session):
    """7-day rolling COUNT(DISTINCT) via offset explode + two-level
    distinct, vs the SQL range join."""
    assert _duckdb_twin("q_rolling_distinct") >= 1


def test_cooccurrence_matches_duckdb(ray_session):
    """Type co-occurrence via per-user bitmasks vs the SQL self-join."""
    assert _duckdb_twin("q_cooccurrence") >= 1


def test_filtered_revenue_matches_duckdb(ray_session):
    """Q6-shape pruned-scan aggregate, integer-exact."""
    assert _duckdb_twin("q_filtered_revenue") == 1


def test_top_supplier_matches_duckdb(ray_session):
    """Q15-shape max-revenue supplier with exact-int tie semantics."""
    assert _duckdb_twin("q_top_supplier") >= 1


def test_market_share_matches_duckdb(ray_session):
    """Q8-shape per-year nation share as two exact integer columns."""
    assert _duckdb_twin("q_market_share") >= 1


def test_product_profit_matches_duckdb(ray_session):
    """Q9-shape profit by nation and year, exact 1e-4 units."""
    assert _duckdb_twin("q_product_profit") >= 1


def test_length_buckets_matches_duckdb(ray_session):
    """Power-of-2 sequence-length bucketing, exact int bit arithmetic."""
    assert _duckdb_twin("q_length_buckets") >= 1


def test_grouped_pct_cont_matches_duckdb(ray_session):
    """Per-group quantile_cont, bit-exact interpolation."""
    assert _duckdb_twin("q_grouped_pct_cont") >= 1


def test_grouped_mad_matches_duckdb(ray_session):
    """Per-group MAD: two stitched grouped-median passes, exact."""
    assert _duckdb_twin("q_grouped_mad") >= 1


def test_approx_quantiles_within_bin_bound(ray_session):
    """Histogram quantile sketch: every percentile lands within one bin
    width of the exact quantile_disc value; nulls ignored."""
    import duckdb

    from paperchase_crawler_ray.ops.sketch import approx_quantiles
    sf = "/root/testdata/sf0.01"
    ds = ray.data.read_parquet(f"{sf}/events.parquet", columns=["value"])
    r = approx_quantiles(ds, "value", ps=(0.1, 0.5, 0.9, 0.99))
    ex = duckdb.sql(
        "SELECT quantile_disc(value, 0.1), quantile_disc(value, 0.5), "
        "quantile_disc(value, 0.9), quantile_disc(value, 0.99) "
        f"FROM read_parquet('{sf}/events.parquet')").fetchone()
    for p, e in zip((0.1, 0.5, 0.9, 0.99), ex):
        assert abs(r["quantiles"][p] - e) <= r["bin_width"] + 1e-9
    # degenerate inputs
    empty = ray.data.from_arrow(pa.table({"value": pa.array([],
                                                            pa.float64())}))
    r0 = approx_quantiles(empty, "value")
    assert r0["count"] == 0 and r0["quantiles"][0.5] is None
    const = ray.data.from_arrow(pa.table({"value": [7.0] * 10}))
    rc = approx_quantiles(const, "value")
    assert rc["quantiles"][0.5] == 7.0 and rc["bin_width"] == 0.0


def test_rank_ties_matches_duckdb(ray_session):
    """SQL RANK(): ties share the min row number, gaps follow."""
    assert _duckdb_twin("q_rank_ties") > 1000


def test_rank_ties_block_spanning_run(ray_session):
    """A tie run split across many blocks must keep its original rank,
    and the next distinct value must resume at its row number."""
    from paperchase_crawler_ray.ops.relational import grouped_rank_ties
    tables = [pa.table({"g": [1] * 10, "v": [5.0] * 10,
                        "rid": list(range(b * 10, (b + 1) * 10))})
              for b in range(8)]
    tables.append(pa.table({"g": [1] * 5 + [2] * 5,
                            "v": [7.0] * 5 + [5.0, 5.0, 6.0, 6.0, 8.0],
                            "rid": list(range(80, 90))}))
    ds = ray.data.from_arrow(tables)
    out = grouped_rank_ties(ds, "g", "v", out_col="r") \
        .to_pandas().sort_values("rid")
    assert out["r"].tolist() == [1] * 80 + [81] * 5 + [1, 1, 3, 3, 5]


def test_distinct_rows_matches_pandas():
    """distinct_rows (block pre-shrink + key-hash repartition + block
    distinct) == drop_duplicates, including null keys as a group."""
    from paperchase_crawler_ray.ops.relational import distinct_rows
    rng = np.random.default_rng(5)
    t = pa.table({
        "a": pa.array([int(x) if x >= 0 else None
                       for x in rng.integers(-1, 6, 500)], pa.int64()),
        "b": pa.array(rng.integers(0, 4, 500), pa.int64()),
        "c": pa.array(rng.random(500))})
    ds = ray.data.from_arrow(t).repartition(7)
    got = distinct_rows(ds, ["a", "b"]).to_pandas()
    want = t.to_pandas()[["a", "b"]].drop_duplicates()
    key = lambda df: sorted(map(tuple, df.fillna(-999).to_numpy().tolist()))
    assert key(got) == key(want)
    assert len(got) == len(want)


def test_image_neardup_clusters_join_attach_path():
    """broadcast_max=0 forces the left-outer-join cluster attach (the
    100-TB path through attach_components): identical assignment to the
    broadcast path, including singletons keeping their own id."""
    from paperchase_crawler_ray.ops.multimodal import image_neardup_clusters
    rng = np.random.default_rng(13)
    base = rng.integers(-(1 << 62), 1 << 62, 30, dtype=np.int64)
    ph = list(base) + [np.int64(np.uint64(base[i]) ^ np.uint64(1))
                       for i in range(0, 30, 6)]
    ids = [f"im{i:03d}" for i in range(30)] + \
          [f"im{i:03d}+d" for i in range(0, 30, 6)]
    ds = ray.data.from_arrow(pa.table({
        "image_id": pa.array(ids, pa.string()),
        "phash": pa.array(ph, pa.int64())})).repartition(num_blocks=4)
    a = image_neardup_clusters(ds, hamming_max=6).to_pandas()
    b = image_neardup_clusters(ds, hamming_max=6,
                               broadcast_max=0).to_pandas()
    assert dict(zip(a["image_id"], a["cluster_id"])) == \
        dict(zip(b["image_id"], b["cluster_id"]))
    assert any(a["image_id"] != a["cluster_id"])  # real clusters exist


def test_versioned_table_expire_snapshots(tmp_path, ray_session):
    """expire_snapshots keeps the newest N versions readable, makes the
    expired ones unreadable, and vacuums every file (fragments, delete
    vectors, crash-orphan stage dirs) no kept manifest references."""
    import os
    from paperchase_crawler_ray.ops import table_format as T
    root = str(tmp_path / "vt_expire")
    mk = lambda lo, hi: pa.table({
        "image_id": pa.array([f"k{i}" for i in range(lo, hi)], pa.string()),
        "v": pa.array(list(range(lo, hi)), pa.int64())})
    v1 = T.append_table(ray.data.from_arrow(mk(0, 8)), root)
    v2 = T.append_table(ray.data.from_arrow(mk(8, 12)), root)
    v3 = T.delete_where_keys(root, [f"k{i}" for i in range(0, 3)])
    v4 = T.compact_table(root)
    # crash orphan: a stage dir left behind
    os.makedirs(os.path.join(root, "_stage-deadbeef"))
    before = sorted(T.table_versions(root))
    assert before == [v1, v2, v3, v4]
    want = sorted(T.read_table(root).to_pandas()["image_id"])

    res = T.expire_snapshots(root, keep_last=1)
    assert sorted(res["removed_versions"]) == [v1, v2, v3]
    assert res["removed_files"] > 0
    assert T.table_versions(root) == [v4]
    assert sorted(T.read_table(root).to_pandas()["image_id"]) == want
    with pytest.raises(FileNotFoundError):
        T.read_table(root, version=v2)
    assert not any(f.startswith("_stage-") for f in os.listdir(root))
    # every surviving file is referenced; second expire is a no-op
    res2 = T.expire_snapshots(root, keep_last=1)
    assert res2 == {"removed_versions": [], "removed_files": 0}
    # keep_last is validated
    with pytest.raises(ValueError):
        T.expire_snapshots(root, keep_last=0)


def test_grouped_topk_two_level_prune_matches_pandas():
    """Per-group top-k (two-level prune + group-keyed shuffle) ==
    pandas nlargest with deterministic tie-break, including a hot
    group spread across many blocks."""
    from paperchase_crawler_ray.ops.relational import grouped_topk
    rng = np.random.default_rng(9)
    n = 4000
    g = np.where(rng.random(n) < 0.7, "hot",
                 rng.choice(["a", "b", "c"], n)).astype(object)
    t = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "grp": pa.array(list(g), pa.string()),
        "val": pa.array(rng.integers(0, 50, n).astype(float))})  # many ties
    ds = ray.data.from_arrow(t).repartition(9)
    got = grouped_topk(ds, "grp", "val", 5, descending=True,
                       tie_col="id").to_pandas()
    df = t.to_pandas()
    want = (df.sort_values(["grp", "val", "id"],
                           ascending=[True, False, True])
            .groupby("grp").head(5))
    key = lambda d: sorted(map(tuple, d[["grp", "val", "id"]].to_numpy()))
    assert key(got) == key(want)
    # ascending variant
    got2 = grouped_topk(ds, "grp", "val", 2, descending=False,
                        tie_col="id").to_pandas()
    want2 = (df.sort_values(["grp", "val", "id"]).groupby("grp").head(2))
    assert key(got2) == key(want2)


def test_versioned_table_upsert_merge_on_read(tmp_path, ray_session):
    """upsert_table: incoming rows replace same-key rows in one atomic
    commit (sequence-number rule: the upsert's delete vector must NOT
    swallow its own fragments), time travel still sees the pre-upsert
    view, and compaction folds the merge debt without changing the
    reader view."""
    from paperchase_crawler_ray.ops import table_format as T
    root = str(tmp_path / "vt_upsert")
    mk = lambda ks, vs: pa.table({
        "image_id": pa.array(ks, pa.string()),
        "v": pa.array(vs, pa.int64())})
    v1 = T.append_table(ray.data.from_arrow(
        mk([f"k{i}" for i in range(10)], list(range(10)))), root)
    # upsert: overwrite k3..k6 with new values, add k10/k11
    up_keys = [f"k{i}" for i in range(3, 7)] + ["k10", "k11"]
    v2 = T.upsert_table(ray.data.from_arrow(
        mk(up_keys, [100 + i for i in range(6)])), root)
    want = {f"k{i}": i for i in range(10)}
    want.update({k: 100 + i for i, k in enumerate(up_keys)})
    view = T.read_table(root).to_pandas()
    assert dict(zip(view["image_id"], view["v"])) == want
    assert len(view) == 12
    # time travel: v1 unchanged
    old = T.read_table(root, version=v1).to_pandas()
    assert dict(zip(old["image_id"], old["v"])) == \
        {f"k{i}": i for i in range(10)}
    # a plain delete AFTER the upsert kills the new row too
    T.delete_where_keys(root, ["k10"])
    view2 = T.read_table(root).to_pandas()
    assert "k10" not in set(view2["image_id"]) and len(view2) == 11
    # compact folds everything; reader view identical; upsert again
    T.compact_table(root)
    view3 = T.read_table(root).to_pandas()
    assert dict(zip(view3["image_id"], view3["v"])) == \
        dict(zip(view2["image_id"], view2["v"]))
    T.upsert_table(ray.data.from_arrow(mk(["k0"], [999])), root)
    view4 = T.read_table(root).to_pandas()
    assert dict(zip(view4["image_id"], view4["v"]))["k0"] == 999
    # key-column mismatch fails loudly
    with pytest.raises(ValueError):
        T.upsert_table(ray.data.from_arrow(mk(["x"], [1])), root,
                       key_col="other")


def test_versioned_table_schema_evolution(tmp_path, ray_session):
    """Appends/upserts may ADD columns: old fragments stay untouched on
    disk, the latest read pads pre-evolution rows with typed nulls,
    time travel sees the old schema, column pruning works across
    generations, and compaction after evolution is reader-invariant."""
    from paperchase_crawler_ray.ops import table_format as T
    root = str(tmp_path / "vt_evo")
    old = pa.table({"image_id": pa.array(["a", "b"], pa.string()),
                    "v": pa.array([1, 2], pa.int64())})
    new = pa.table({"image_id": pa.array(["c", "b"], pa.string()),
                    "v": pa.array([3, 20], pa.int64()),
                    "lang": pa.array(["en", "fr"], pa.string())})
    v1 = T.append_table(ray.data.from_arrow(old), root)
    T.upsert_table(ray.data.from_arrow(new), root)
    df = T.read_table(root).to_pandas().set_index("image_id")
    assert sorted(df.index) == ["a", "b", "c"]
    assert df.loc["b", "v"] == 20 and df.loc["b", "lang"] == "fr"
    assert pd.isna(df.loc["a", "lang"])           # padded null
    # time travel: v1 has no lang column
    assert "lang" not in T.read_table(root, version=v1).schema().names
    # pruned reads across generations
    assert sorted(T.read_table(root, columns=["lang"]).to_pandas()
                  ["lang"].fillna("-")) == ["-", "en", "fr"]
    with pytest.raises(KeyError):
        T.read_table(root, columns=["nope"])
    # delete + compact after evolution: view unchanged
    T.delete_where_keys(root, ["c"])
    want = T.read_table(root).to_pandas().sort_values("image_id") \
        .reset_index(drop=True)
    T.compact_table(root)
    got = T.read_table(root).to_pandas().sort_values("image_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)])


def test_versioned_table_change_data_feed(tmp_path, ray_session):
    """read_table_changes: the replay invariant — state(F) with the
    window's deleted_keys retracted plus the window's appended rows
    equals state(T) — across appends, upserts (retract-then-insert
    pairs), plain deletes, and a schema-evolving append inside the
    window; a row appended then deleted inside the window never
    surfaces; the empty window returns empty planes."""
    from paperchase_crawler_ray.ops import table_format as T
    root = str(tmp_path / "vt_cdc")
    mk = lambda ks, vs, **extra: pa.table({
        "image_id": pa.array(ks, pa.string()),
        "v": pa.array(vs, pa.int64()),
        **{c: pa.array(a) for c, a in extra.items()}})
    F = T.append_table(ray.data.from_arrow(
        mk([f"k{i}" for i in range(8)], list(range(8)))), root)
    # window: upsert k2/k3 + new k8, schema-evolving append k9,
    # plain delete of k5 and k8 (k8 appended AND deleted in-window)
    T.upsert_table(ray.data.from_arrow(
        mk(["k2", "k3", "k8"], [102, 103, 108])), root)
    T.append_table(ray.data.from_arrow(
        mk(["k9"], [9], lang=["en"])), root)
    Tv = T.delete_where_keys(root, ["k5", "k8"])

    ch = T.read_table_changes(root, F)
    assert ch["from_version"] == F and ch["to_version"] == Tv
    app = ch["appended"].to_pandas()
    dels = set(ch["deleted_keys"].to_pandas()["key"])
    # k8 was appended then deleted inside the window: never surfaces
    assert set(app["image_id"]) == {"k2", "k3", "k9"}
    assert dict(zip(app["image_id"], app["v"])) == \
        {"k2": 102, "k3": 103, "k9": 9}
    # union schema of the table at T (lang padded for pre-evo appends)
    assert app.loc[app["image_id"] == "k9", "lang"].iloc[0] == "en"
    assert pd.isna(app.loc[app["image_id"] == "k2", "lang"].iloc[0])
    # upsert keys retract-then-insert; plain deletes retract only
    assert dels == {"k2", "k3", "k8", "k5"}
    # replay invariant: state(F) - deleted + appended == state(T)
    base = T.read_table(root, version=F).to_pandas()
    replay = pd.concat([base[~base["image_id"].isin(dels)]
                        .assign(lang=pd.NA), app], ignore_index=True)
    now = T.read_table(root).to_pandas()
    key = lambda d: d.sort_values("image_id")[
        ["image_id", "v", "lang"]].reset_index(drop=True).astype(
        {"v": "int64"})
    a, b = key(replay), key(now)
    assert list(a["image_id"]) == list(b["image_id"])
    assert list(a["v"]) == list(b["v"])
    assert [x if pd.notna(x) else None for x in a["lang"]] == \
        [x if pd.notna(x) else None for x in b["lang"]]
    # empty window
    ch0 = T.read_table_changes(root, Tv)
    assert ch0["appended"].count() == 0
    assert ch0["deleted_keys"].count() == 0
    # column pruning + unknown column fails loudly
    got = T.read_table_changes(root, F, columns=["image_id"])
    assert set(got["appended"].to_pandas()["image_id"]) == \
        {"k2", "k3", "k9"}
    with pytest.raises(KeyError):
        T.read_table_changes(root, F, columns=["nope"])
    with pytest.raises(ValueError):
        T.read_table_changes(root, Tv + 1, to_version=Tv)


def test_versioned_table_upsert_single_execution(tmp_path, ray_session):
    """upsert_table executes its input pipeline ONCE: the delete vector
    is derived from the staged fragments, so even an upstream whose
    output CHANGES between executions cannot tear the commit (keys
    deleted == keys written). The counter file counts actual upstream
    executions."""
    import os

    from paperchase_crawler_ray.ops import table_format as T
    root = str(tmp_path / "vt_once")
    marker = str(tmp_path / "exec_count")
    T.append_table(ray.data.from_arrow(pa.table({
        "image_id": pa.array(["k0", "k1"], pa.string()),
        "v": pa.array([0, 1], pa.int64())})), root)

    def unstable(b: pa.Table) -> pa.Table:
        # append one byte per execution; a second execution would emit
        # DIFFERENT keys, so any key-plane/fragment divergence is loud
        with open(marker, "a") as f:
            f.write("x")
        n = os.path.getsize(marker)
        return pa.table({
            "image_id": pa.array([f"k{n}"], pa.string()),
            "v": pa.array([100 + n], pa.int64())})

    src = ray.data.from_arrow(pa.table({"seed": pa.array([1])})) \
        .map_batches(unstable, batch_format="pyarrow")
    T.upsert_table(src, root)
    assert os.path.getsize(marker) == 1      # executed exactly once
    view = T.read_table(root).to_pandas()
    got = dict(zip(view["image_id"], view["v"]))
    assert got == {"k0": 0, "k1": 101}       # k1 replaced by the upsert
    m = T._load_manifest(root, None)
    import pyarrow.parquet as _pq
    del_keys = set()
    for d in m["deletes"]:
        del_keys |= set(_pq.read_table(os.path.join(root, d))
                        .column("key").to_pylist())
    assert del_keys == {"k1"}                # vector == staged keys


def test_approx_overlap_kmv():
    """KMV overlap sketch: ~1/sqrt(k) accuracy on a 1/3-Jaccard pair of
    150k-distinct sides, EXACT degeneration below k distinct values,
    and partitioning invariance (sorted-unique merges are order-free)."""
    from paperchase_crawler_ray.ops.sketch import approx_overlap
    A = ray.data.from_arrow(pa.table(
        {"v": pa.array([f"k{i}" for i in range(150_000)], pa.string())}
    )).repartition(num_blocks=9)
    B = ray.data.from_arrow(pa.table(
        {"v": pa.array([f"k{i}" for i in range(75_000, 225_000)],
                       pa.string())})).repartition(num_blocks=5)
    r = approx_overlap(A, "v", B, k=4096).to_pandas().iloc[0]
    for col, true in [("distinct_a", 150_000), ("distinct_b", 150_000),
                      ("distinct_union", 225_000),
                      ("distinct_intersection", 75_000)]:
        assert abs(int(r[col]) - true) / true < 0.06, (col, int(r[col]))
    assert abs(r["jaccard"] - 1 / 3) < 0.02
    # exact below k (including duplicate input rows)
    A2 = ray.data.from_arrow(pa.table(
        {"v": pa.array([i % 100 for i in range(1000)], pa.int64())}))
    B2 = ray.data.from_arrow(pa.table(
        {"v": pa.array(list(range(50, 130)), pa.int64())}))
    r2 = approx_overlap(A2, "v", B2, k=4096).to_pandas().iloc[0]
    assert (int(r2["distinct_a"]), int(r2["distinct_b"]),
            int(r2["distinct_union"]),
            int(r2["distinct_intersection"])) == (100, 80, 130, 50)
    # partitioning invariance
    r3 = approx_overlap(A.repartition(num_blocks=3), "v",
                        B.repartition(num_blocks=11), k=4096) \
        .to_pandas().iloc[0]
    assert list(r3) == list(r)


def test_heavy_hitters_by_exact():
    """Grouped frequent pairs: exact equality with the pandas
    groupby-size truth on a zipf-skewed corpus (composite-item MG
    soundness), MG-precondition error, null exclusion, and the
    zero-candidate path."""
    from paperchase_crawler_ray.ops.sketch import heavy_hitters_by
    rng = np.random.default_rng(3)
    n = 50_000
    g = rng.choice(["x", "y", "z"], n, p=[0.6, 0.3, 0.1])
    v = (rng.zipf(1.5, n) % 300).astype(np.int64)
    truth = pd.DataFrame({"g": g, "v": v}).groupby(["g", "v"]).size()
    thr = 150
    want = {(a, b): c for (a, b), c in truth.items() if c > thr}
    ds = ray.data.from_arrow(pa.table(
        {"g": pa.array(g.tolist(), pa.string()),
         "v": pa.array(v.tolist(), pa.int64())})) \
        .repartition(num_blocks=11)
    out = heavy_hitters_by(ds, "g", "v", threshold=thr,
                           capacity=1024).to_pandas()
    got = {(r.g, r.item): r.n_occurrences for r in out.itertuples()}
    assert got == want and len(want) > 0
    # nulls excluded
    ds_n = ray.data.from_arrow(pa.table(
        {"g": pa.array(["x", "x", None, "x"], pa.string()),
         "v": pa.array([1, 1, 1, None], pa.int64())}))
    assert heavy_hitters_by(ds_n, "g", "v", threshold=1,
                            capacity=64).to_pandas().to_dict("records") \
        == [{"g": "x", "item": 1, "n_occurrences": 2}]
    # precondition: threshold must clear the MG slack
    with pytest.raises(ValueError):
        heavy_hitters_by(ds, "g", "v", threshold=1, capacity=8)
    # zero candidates
    assert len(heavy_hitters_by(ds, "g", "v", threshold=n,
                                capacity=1024).to_pandas()) == 0


def test_approx_quantiles_by_bound_and_edges():
    """Grouped histogram quantile sketch: the per-group one-bin error
    bound vs the exact discrete quantile, inf-only and constant
    groups, null-key exclusion, and cross-partitioning determinism."""
    from paperchase_crawler_ray.ops.sketch import approx_quantiles_by
    rng = np.random.default_rng(7)
    n = 60_000
    g = rng.choice(["a", "b", "c", "d"], n, p=[0.5, 0.3, 0.15, 0.05])
    v = np.where(g == "a", rng.normal(100, 15, n), rng.lognormal(3, 1, n))
    g = np.concatenate([g, ["e"] * 50, ["f"] * 10])
    v = np.concatenate([v, np.full(50, 42.0),
                        [np.inf] * 6 + [-np.inf] * 4])
    t = pa.table({"g": pa.array(g.tolist() + [None], pa.string()),
                  "v": pa.array(v.tolist() + [1.0], pa.float64())})
    ds = ray.data.from_arrow(t).repartition(num_blocks=9)
    ps, nbins = (0.1, 0.5, 0.9), 1024
    out = approx_quantiles_by(ds, "g", "v", ps=ps, nbins=nbins).to_pandas()
    assert sorted(out.g.unique()) == ["a", "b", "c", "d", "e", "f"]
    assert len(out) == 6 * len(ps)
    df = pd.DataFrame({"g": g, "v": v})
    for gval, sub in df.groupby("g"):
        vals = np.sort(sub["v"].to_numpy())
        fin = vals[np.isfinite(vals)]
        bw = ((fin.max() - fin.min()) / nbins
              if len(fin) and fin.max() > fin.min() else 0.0)
        for p in ps:
            exact = vals[min(max(int(np.ceil(p * len(vals))), 1),
                             len(vals)) - 1]
            got = out[(out.g == gval) & (out.p == p)]["value"].iloc[0]
            if np.isfinite(exact):
                assert abs(got - exact) <= bw + 1e-9, (gval, p)
            else:
                assert got == exact, (gval, p)
    # constant group is exact; inf-only group rank-exact
    assert (out[out.g == "e"]["value"] == 42.0).all()
    assert (out[out.g == "f"]["value"] == np.inf).sum() == 2
    # determinism across partitionings
    out2 = approx_quantiles_by(ds.repartition(num_blocks=3), "g", "v",
                               ps=ps, nbins=nbins).to_pandas()
    a = out.sort_values(["g", "p"]).reset_index(drop=True)
    b = out2.sort_values(["g", "p"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # empty input
    empty = approx_quantiles_by(
        ray.data.from_arrow(t.slice(0, 0)), "g", "v", ps=ps).to_pandas()
    assert len(empty) == 0


def test_dsir_logweights_and_select():
    """DSIR importance resampling: exact log-weight equality with a
    pure-Python twin (same tokenizer/hash/smoothing), deterministic
    Gumbel-top-k selection at two parallelism levels, and the
    distribution-shift sanity (target-like docs enriched)."""
    import math
    from paperchase_crawler_ray.functions.texthash import stable_hash64
    from paperchase_crawler_ray.ops.textstats import (
        _ASCII_WORD_RE, dsir_logweights, dsir_select)
    rng = np.random.default_rng(11)
    food = ["fresh bread olive oil tomato soup", "garlic pasta dinner",
            "roast chicken lemon herb", "chocolate cake butter sugar"]
    tech = ["gpu kernel memory bandwidth", "compiler register allocation",
            "distributed hash shuffle", "network packet latency"]
    raw_texts, kinds = [], []
    for i in range(400):
        src = food if i % 2 == 0 else tech
        words = " ".join(rng.choice(" ".join(src).split(), 8))
        raw_texts.append(words)
        kinds.append("food" if i % 2 == 0 else "tech")
    tgt_texts = [" ".join(rng.choice(" ".join(food).split(), 8))
                 for _ in range(200)]
    raw = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(range(400), pa.int64()),
         "text": pa.array(raw_texts, pa.string())})) \
        .repartition(num_blocks=7)
    tgt = ray.data.from_arrow(pa.table(
        {"text": pa.array(tgt_texts, pa.string())})) \
        .repartition(num_blocks=3)
    B, alpha = 512, 1.0

    # pure-Python twin
    def feats(t):
        toks = _ASCII_WORD_RE.findall(t.lower())
        return ([stable_hash64(w) % B for w in toks]
                + [stable_hash64(a + " " + b) % B
                   for a, b in zip(toks, toks[1:])])
    pc_, qc_ = np.zeros(B), np.zeros(B)
    for t in tgt_texts:
        for b in feats(t):
            pc_[b] += 1
    for t in raw_texts:
        for b in feats(t):
            qc_[b] += 1
    logp = np.log(pc_ + alpha) - np.log(pc_.sum() + alpha * B)
    logq = np.log(qc_ + alpha) - np.log(qc_.sum() + alpha * B)
    r = (logp - logq).astype(np.float64)   # same association as the op
    want = {}
    for i, t in enumerate(raw_texts):
        out = np.zeros(1, np.float64)
        fs = feats(t)
        if fs:
            np.add.at(out, np.zeros(len(fs), np.int64),
                      r[np.array(fs)])
        want[i] = float(out[0])

    got = dsir_logweights(raw, tgt, buckets=B, alpha=alpha).to_pandas()
    assert len(got) == 400
    for row in got.itertuples():
        assert row.dsir_logw == want[row.doc_id], row.doc_id

    sel = dsir_select(raw, tgt, k=50, buckets=B, alpha=alpha).to_pandas()
    assert len(sel) == 50
    n_food = sum(1 for d in sel.doc_id if kinds[d] == "food")
    assert n_food >= 45           # target-like docs dominate the sample
    # twin selection: same Gumbel priorities -> same ids
    pri = {}
    for i in range(400):
        h = np.uint64(stable_hash64(f"42:{i}"))
        u = (np.float64(h) + 2.0) / (2.0 ** 64 + 4.0)
        pri[i] = want[i] + float(-np.log(-np.log(u)))
    want_ids = set(sorted(pri, key=lambda i: (-pri[i], i))[:50])
    assert set(sel.doc_id) == want_ids
    # parallelism invariance
    sel2 = dsir_select(raw.repartition(num_blocks=2), tgt, k=50,
                       buckets=B, alpha=alpha).to_pandas()
    assert set(sel2.doc_id) == want_ids


def test_video_keyframes_matches_naive():
    """Content-based keyframe extraction: exact (media_id, frame_idx)
    equality with the sequential naive twin over shot-structured
    MJPEG fixtures, real compression (static shots collapse, scene
    cuts survive), keyframe bytes decode to the source dims, and the
    fake backend's plumbing shape."""
    from paperchase_crawler_ray.fixtures import make_shot_video_rows
    from paperchase_crawler_ray.functions.av import mjpeg_split
    from paperchase_crawler_ray.functions.jpeg import jpeg_decode
    from paperchase_crawler_ray.functions.phash import hamming64, phash64
    from paperchase_crawler_ray.ops.multimodal import VideoKeyframes
    rows = make_shot_video_rows(12)
    want, total, cuts = set(), 0, 0
    for mid, payload in zip(rows.column("media_id").to_pylist(),
                            rows.column("payload").to_pylist()):
        last = None
        for f, fb in enumerate(mjpeg_split(payload)):
            total += 1
            ph = phash64(jpeg_decode(fb))
            if last is None or int(hamming64(np.array([last]),
                                             np.array([ph]))[0]) > 10:
                want.add((mid, f))
                last = ph
                if f:
                    cuts += 1
    ds = ray.data.from_arrow(rows).repartition(num_blocks=5)
    out = ds.map_batches(VideoKeyframes,
                         fn_constructor_kwargs={"hamming_max": 10,
                                                "backend": "real"},
                         batch_format="pyarrow", batch_size=4,
                         concurrency=(1, 4)).to_pandas()
    assert set(zip(out.media_id, out.frame_idx)) == want
    assert cuts > 0                      # some mid-video keyframes kept
    assert len(want) < total / 2         # static shots really collapse
    # keyframe bytes are self-contained JPEG frames at source dims
    r0 = out.iloc[0]
    px = jpeg_decode(r0.frame_bytes)
    assert (px.shape[0], px.shape[1]) == (r0.h, r0.w)
    # fake backend: per-frame pseudo-phash, no pixel work, same rule
    fake = ray.data.from_arrow(rows) \
        .map_batches(VideoKeyframes,
                     fn_constructor_kwargs={"backend": "fake"},
                     batch_format="pyarrow", batch_size=None,
                     concurrency=(1, 2)).to_pandas()
    assert (fake.groupby("media_id").frame_idx.min() == 0).all()
    assert (fake.w == 0).all()


def test_text_classifier_quality_filter():
    """Distributed logistic-regression quality classifier: weights
    allclose to a single-matrix numpy twin (same features, epochs,
    lr), >=97% accuracy on separable synthetic corpora, bit-identical
    reruns on a fixed partitioning, and deterministic scoring."""
    from paperchase_crawler_ray.ops.textstats import (
        _dsir_feature_hashes, score_text_classifier,
        train_text_classifier)
    rng = np.random.default_rng(5)
    food = "bread olive tomato soup garlic pasta roast chicken lemon cake".split()
    tech = "gpu kernel memory compiler register shuffle packet latency cache bus".split()
    texts, labels = [], []
    for i in range(600):
        words = food if i % 2 == 0 else tech
        texts.append(" ".join(rng.choice(words, 10)))
        labels.append(1 if i % 2 == 0 else 0)
    t = pa.table({"doc_id": pa.array(range(600), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "label": pa.array(labels, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(num_blocks=6)
    B, E_, LR = 256, 25, 2.0
    model = train_text_classifier(ds, buckets=B, epochs=E_, lr=LR,
                                  l2=0.0)

    # numpy twin: identical featurization, dense full-batch Adagrad
    X = np.zeros((600, B))
    for i, txt in enumerate(texts):
        _, bk = _dsir_feature_hashes([txt], B)
        u, cnt = np.unique(bk, return_counts=True)
        X[i, u] = cnt / len(bk)
    y = np.array(labels, np.float64)
    w, b = np.zeros(B), 0.0
    aw, ab = np.zeros(B), 0.0
    for _ in range(E_):
        z = X @ w + b
        r = 1.0 / (1.0 + np.exp(-z)) - y
        gw = (X.T @ r) / 600
        gb = r.sum() / 600
        aw += gw * gw
        ab += gb * gb
        w -= LR * gw / np.sqrt(aw + 1e-8)
        b -= LR * gb / np.sqrt(ab + 1e-8)
    assert np.allclose(model["w"], w, atol=1e-8)
    assert abs(model["bias"] - b) < 1e-8
    assert model["losses"][-1] < model["losses"][0]

    # plain-GD mode: twin equality on one epoch of vanilla descent
    mgd = train_text_classifier(ds, buckets=B, epochs=1, lr=LR, l2=0.0,
                                optimizer="gd")
    z0 = np.zeros(600)
    r0 = 1.0 / (1.0 + np.exp(-z0)) - y
    assert np.allclose(mgd["w"], -LR * (X.T @ r0) / 600, atol=1e-12)

    scored = score_text_classifier(ds, model).to_pandas()
    acc = ((scored.quality_prob > 0.5).astype(int)
           == scored.label).mean()
    assert acc >= 0.97
    # held-out generalization
    ho = [" ".join(rng.choice(food, 10)) for _ in range(50)] \
        + [" ".join(rng.choice(tech, 10)) for _ in range(50)]
    ho_ds = ray.data.from_arrow(pa.table({"text": pa.array(ho)}))
    probs = score_text_classifier(ho_ds, model).to_pandas().quality_prob
    assert (probs[:50] > 0.5).mean() >= 0.95
    assert (probs[50:] < 0.5).mean() >= 0.95
    # fixed partitioning -> bit-identical retrain
    m2 = train_text_classifier(ds, buckets=B, epochs=E_, lr=LR, l2=0.0)
    assert (m2["w"] == model["w"]).all() and m2["bias"] == model["bias"]


def test_shuffle_to_shards_matches_naive():
    """Deterministic training shuffle: exact (shard, seq) equality
    with the md5 twin, every shard a contiguous 0..n-1 sequence,
    and partitioning invariance."""
    import collections
    import hashlib

    from paperchase_crawler_ray.ops.relational import shuffle_to_shards
    ids = list(range(1, 501))
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(ids, pa.int64())}))

    def md5i(s, nb):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:nb],
                              "big")

    by_shard = collections.defaultdict(list)
    for k in ids:
        by_shard[md5i(str(k), 4) % 8].append((md5i(f"p:{k}", 8), k))
    want = {k: (sh, i) for sh, lst in by_shard.items()
            for i, (_, k) in enumerate(sorted(lst))}
    for nb in (1, 7):
        out = shuffle_to_shards(ds.repartition(num_blocks=nb),
                                "k", 8).to_pandas()
        assert {r.k: (r.shard, r.seq)
                for r in out.itertuples()} == want
        seqs = out.groupby("shard").seq.agg(["min", "max", "count"])
        assert (seqs["min"] == 0).all()
        assert (seqs["max"] == seqs["count"] - 1).all()


def test_kneser_ney_lm_matches_naive():
    """Interpolated-KN bigram LM: fitted tables equal the sequential
    twin's, per-doc scores equal the twin's scoring loop bit-exactly,
    unseen words/contexts score finitely, and a corpus-frequent bigram
    outscores an unseen one."""
    from paperchase_crawler_ray.ops.textstats import (
        _ASCII_WORD_RE, _KN_BOS, kn_logprob, kneser_ney_fit,
        kneser_ney_score)
    texts = ["the cat sat on the mat", "the dog sat", "a cat ran",
             "", "the the the", "dog and cat and dog"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t).repartition(num_blocks=3)
    m = kneser_ney_fit(ds)
    big = {}
    for txt in texts:
        toks = _ASCII_WORD_RE.findall(txt.lower())
        prev = _KN_BOS
        for w in toks:
            big[(prev, w)] = big.get((prev, w), 0) + 1
            prev = w
    assert m["bigrams"] == big
    assert m["ctx_total"][_KN_BOS] == 5          # 5 non-empty docs
    sc = kneser_ney_score(ds, m).to_pandas().sort_values("doc_id")
    for i, txt in enumerate(texts):
        toks = _ASCII_WORD_RE.findall(txt.lower())
        exp, prev = 0.0, _KN_BOS
        for w in toks:
            exp += kn_logprob(m, prev, w)
            prev = w
        exp = exp / len(toks) if toks else 0.0
        assert sc.kn_logprob.iloc[i] == exp
    assert kn_logprob(m, "the", "cat") > kn_logprob(m, "cat", "dog")
    assert np.isfinite(kn_logprob(m, "zzz", "qqq"))
    # parallelism invariance: driver fold is sorted, scoring row-local
    m2 = kneser_ney_fit(ds.repartition(num_blocks=1))
    sc2 = kneser_ney_score(ds, m2).to_pandas().sort_values("doc_id")
    assert (sc2.kn_logprob.values == sc.kn_logprob.values).all()


def test_paragraph_dedup_matches_duckdb(ray_session):
    """Corpus-wide first-occurrence paragraph dedup + reassembly."""
    assert _duckdb_twin("q_paragraph_dedup") == 500


def test_gopher_filter_matches_duckdb(ray_session):
    """Gopher-rule integer components + combined pass flag."""
    assert _duckdb_twin("q_gopher_filter") == 500


def test_paragraph_dedup_semantics(ray_session):
    """First occurrence kept, empties preserved as structure, a doc
    whose every paragraph was seen earlier disappears."""
    from paperchase_crawler_ray.ops.textstats import paragraph_dedup
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["aa\nbb\n\ncc", "bb\ndd\naa", "aa\ncc"]),
    })
    got = paragraph_dedup(ray.data.from_arrow(t)).to_pandas() \
        .set_index("doc_id")["clean_text"].to_dict()
    # doc1 keeps everything incl. the empty line; doc2 loses aa/bb;
    # doc3 loses both paragraphs -> no row
    assert got == {1: "aa\nbb\n\ncc", 2: "dd"}


def test_gopher_filter_selects_pass_rows(ray_session):
    """gopher_filter == rows whose pass_gopher flag is 1, original
    columns only."""
    from paperchase_crawler_ray.ops.textstats import (gopher_filter,
                                                      gopher_stats)
    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                                 columns=["doc_id", "text"])
    s = gopher_stats(docs).to_pandas()
    kept = gopher_filter(docs).to_pandas()
    assert set(kept.columns) == {"doc_id", "text"}
    assert sorted(kept["doc_id"]) == sorted(
        s.loc[s["pass_gopher"] == 1, "doc_id"])
    assert 0 < len(kept) < len(s)


def test_group_sample_matches_duckdb(ray_session):
    """Deterministic md5-ordered k-per-class sample (5 types x 100)."""
    assert _duckdb_twin("q_group_sample") == 500


def test_c4_filter_matches_duckdb(ray_session):
    """C4-rule integer components + combined pass flag (SQL twin)."""
    assert _duckdb_twin("q_c4_filter") == 500


def test_c4_stats_rich_text(ray_session):
    """Every C4 rule exercised on punctuation-rich synthetic docs
    (the corpus fixture has no punctuation, so the sf twin alone
    cannot distinguish the rule constants)."""
    from paperchase_crawler_ray.ops.textstats import c4_stats
    texts = [
        # 3 sentences, two keepable lines -> pass
        "one two three four five.\nshort line.\nsix seven eight nine ten!",
        # javascript word kills the only long line; still >=3 sentences
        # but zero kept lines -> fail
        "enable javascript one two three four.\nno. no. no.",
        # lorem ipsum -> fail even with good lines
        "lorem ipsum dolor sit amet consectetur.\nmore good words here ok.",
        # curly brace -> fail
        "var x = {a: 1} one two three four five.\nclean line here today ok.",
        # only 2 sentences -> fail
        "one two three four five.\nsix seven eight nine ten",
        # quote-terminated line counts as kept
        'he said "one two three four five."\nagain. again. again.',
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    s = c4_stats(ray.data.from_arrow(t)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert list(s["pass_c4"]) == [1, 0, 0, 0, 0, 1]
    # doc0: 'short line.' has 2 words -> dropped; the 5-word '.' and
    # '!' lines survive
    assert s.loc[0, "n_kept_lines"] == 2
    assert s.loc[1, "n_kept_lines"] == 0       # javascript line killed
    assert list(s["has_lorem"]) == [0, 0, 1, 0, 0, 0]
    assert list(s["has_brace"]) == [0, 0, 0, 1, 0, 0]
    assert s.loc[5, "n_sentences"] == 4        # three '.' + one '.'

    from paperchase_crawler_ray.ops.textstats import c4_clean
    c = c4_clean(ray.data.from_arrow(t)).to_pandas() \
        .set_index("doc_id")["clean_text"].to_dict()
    assert c == {
        0: "one two three four five.\nsix seven eight nine ten!",
        5: 'he said "one two three four five."',
    }


def test_keep_best_matches_duckdb(ray_session):
    """Quality-argmax canonical dedup (longest copy wins)."""
    assert _duckdb_twin("q_keep_best") > 0


def test_keep_best_picks_highest_quality(ray_session):
    """Among exact duplicates the LONGEST doc survives (ties -> lowest
    doc_id), unlike the first-occurrence policy of q_text_hash_dedup."""
    from paperchase_crawler_ray.ops.relational import exact_dedup
    from paperchase_crawler_ray.ops.textstats import fingerprint_batch
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["dup", "dup", "uniq", "dup", "other"]),
        "n_chars": pa.array([3, 9, 4, 9, 5], pa.int64()),
    })
    hashed = ray.data.from_arrow(t).map_batches(
        fingerprint_batch, batch_format="pyarrow")
    out = exact_dedup(hashed, ["text_hash"],
                      [("n_chars", True), ("doc_id", False)]).to_pandas()
    # 'dup' cluster: docs 2 and 4 tie on n_chars=9 -> doc 2 wins
    assert sorted(out["doc_id"]) == [2, 3, 5]


def test_ccnet_buckets_matches_naive(ray_session):
    """Per-language NTILE(3) over the exact KN scores: the distributed
    bucket assignment equals a single-process numpy recomputation."""
    import __ray_entry__ as E
    from paperchase_crawler_ray.ops.textstats import (kneser_ney_fit,
                                                      kneser_ney_score)
    sf = "/root/testdata/sf0.001"
    got = E.queries()["q_ccnet_buckets"](sf).to_pandas() \
        .set_index("doc_id")
    docs = ray.data.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id", "text", "lang"])
    scored = kneser_ney_score(docs, kneser_ney_fit(docs)).to_pandas()
    labels = np.array(["head", "middle", "tail"])
    for lang, g in scored.groupby("lang"):
        g = g.sort_values(["kn_logprob", "doc_id"],
                          ascending=[False, True]).reset_index(drop=True)
        n, k = len(g), 3
        q, r = divmod(n, k)
        sizes = [q + 1] * r + [q] * (k - r)
        tile = np.repeat(np.arange(k), sizes)
        for doc, t in zip(g["doc_id"], tile):
            assert got.loc[doc, "bucket"] == labels[t], (lang, doc)
    # equal-count property: per (lang, bucket) sizes differ by <= 1
    counts = got.groupby(["lang", "bucket"]).size()
    for lang in got["lang"].unique():
        c = counts[lang]
        assert c.max() - c.min() <= 1


def test_bfs_distances_matches_naive_both_modes(ray_session):
    """BFS hop distances equal a single-process BFS on BOTH the
    broadcast-frontier and keyed-join paths, directed and undirected,
    including the unreachable-nodes-absent and hop-cap semantics."""
    import collections
    import random as _r
    from paperchase_crawler_ray.ops.graph import bfs_distances
    rng = _r.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(150)]
    edges.append((97, 98))   # an island the seeds never reach
    seeds = [0, 1]

    def naive(directed, max_hops=20):
        adj = collections.defaultdict(list)
        for a, b in edges:
            adj[a].append(b)
            if not directed:
                adj[b].append(a)
        dist = {s: 0 for s in seeds}
        q = collections.deque(seeds)
        while q:
            n = q.popleft()
            if dist[n] >= max_hops:
                continue
            for m in adj[n]:
                if m not in dist:
                    dist[m] = dist[n] + 1
                    q.append(m)
        return dist

    eds = ray.data.from_arrow(pa.table(
        {"a": pa.array([e[0] for e in edges], pa.int64()),
         "b": pa.array([e[1] for e in edges], pa.int64())})).repartition(5)
    for directed in (False, True):
        want = naive(directed)
        for mode in ("broadcast", "join"):
            got = bfs_distances(eds, seeds, directed=directed,
                                mode=mode).to_pandas()
            assert dict(zip(got["node"], got["dist"])) == want, \
                (directed, mode)
        assert 97 not in set(
            bfs_distances(eds, seeds, directed=directed)
            .to_pandas()["node"])
    # hop cap: a 5-node path with max_hops=2 stops at dist 2
    path = ray.data.from_arrow(pa.table(
        {"a": pa.array([0, 1, 2, 3], pa.int64()),
         "b": pa.array([1, 2, 3, 4], pa.int64())}))
    for mode in ("broadcast", "join"):
        got = bfs_distances(path, [0], directed=True, max_hops=2,
                            mode=mode).to_pandas()
        assert dict(zip(got["node"], got["dist"])) == {0: 0, 1: 1, 2: 2}


def test_audio_vad_matches_constructed_segments(ray_session):
    """Energy VAD over REAL WAV fixtures recovers the constructed
    silence/voice boundaries EXACTLY (boundaries are frame-aligned by
    fixture design), plus the gap-bridge and min-length rules on a
    hand-built signal."""
    import json
    from paperchase_crawler_ray.fixtures import make_speech_rows
    from paperchase_crawler_ray.functions.av import wav_encode
    from paperchase_crawler_ray.ops.multimodal import AudioVAD
    rows = make_speech_rows(40)
    got = ray.data.from_arrow(rows).map_batches(
        AudioVAD, batch_format="pyarrow", batch_size=16,
        concurrency=(1, 4)).to_pandas()
    by_media = {}
    for r in got.itertuples():
        by_media.setdefault(r.media_id, []).append(
            (r.seg_idx, r.start_frame, r.end_frame, r.n_frames))
    for r in rows.to_pylist():
        want = [(j, s, e, e - s) for j, (s, e) in
                enumerate(json.loads(r["segments_json"]))]
        assert sorted(by_media.get(r["media_id"], [])) == want

    # gap-bridge (1 silent frame inside a burst is bridged) and
    # min-frames (an isolated 1-frame blip is dropped)
    rate, frame = 8000, 160
    tone = 0.5 * np.sin(2 * np.pi * 440.0
                        * np.arange(3 * frame) / rate)
    sig = np.concatenate([
        np.zeros(2 * frame), tone, np.zeros(frame), tone,   # bridged
        np.zeros(4 * frame), tone[:frame],                  # dropped
        np.zeros(2 * frame)])
    t = pa.table({
        "media_id": pa.array(["x"], pa.string()),
        "payload": pa.array([wav_encode(sig, rate)], pa.binary()),
        "sample_rate": pa.array([rate], pa.int32())})
    vad = AudioVAD()
    out = vad(t).to_pylist()
    assert [(r["start_frame"], r["end_frame"]) for r in out] == [(2, 9)]


def test_bm25_topk_matches_naive(docs_table, ray_session):
    """BM25 top-k == a single-process twin (same tokenizer, same
    Lucene-form idf, SAME float evaluation order: per-term contribution
    then x idf, summed in first-appearance order), bit-for-bit, at two
    partitionings."""
    from collections import Counter
    from paperchase_crawler_ray.ops.textstats import bm25_topk
    queries = ["quick brown fox", "data pipeline quality", "the"]
    k1, b, k = 1.2, 0.75, 8
    rows = docs_table.to_pylist()
    toks = {r["doc_id"]: [w.lower() for w in
                          re.findall(r"\w+", r["text"] or "", re.ASCII)]
            for r in rows}
    N = len(rows)
    avgdl = sum(len(t) for t in toks.values()) / N
    qtoks = [[w.lower() for w in re.findall(r"\w+", q, re.ASCII)]
             for q in queries]
    df = {t: sum(1 for tk in toks.values() if t in tk)
          for ts in qtoks for t in ts}
    idf = {t: float(np.log(1.0 + (N - d + 0.5) / (d + 0.5)))
           for t, d in df.items()}
    want = []
    for qi, ts in enumerate(qtoks):
        scores = {}
        for d_, tk in toks.items():
            cnt = Counter(tk)
            s, dl = 0.0, np.float64(len(tk))
            for term in cnt:
                if term in set(ts):
                    tf = np.float64(cnt[term])
                    s += idf[term] * (tf * (k1 + 1.0) /
                                      (tf + k1 * (1.0 - b + b * dl / avgdl)))
            if s > 0.0:
                scores[d_] = s
        top = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        want += [(int(qi), int(d_), float(s), int(r))
                 for r, (d_, s) in enumerate(top, 1)]
    for nparts in (3, 11):
        ds = ray.data.from_arrow(docs_table).repartition(nparts)
        got = bm25_topk(ds, queries, k=k).to_pandas()
        gotl = sorted((int(a), int(b_), float(c), int(d)) for a, b_, c, d
                      in zip(got["query_idx"], got["doc_id"],
                             got["score"], got["rnk"]))
        assert gotl == sorted(want), nparts
        assert list(got.columns) == ["query_idx", "doc_id", "score",
                                     "query", "rnk"]


def test_triangle_counts_matches_naive_both_modes(ray_session):
    """Per-node triangle counts == brute-force enumeration over the
    canonical edge set, on the broadcast (driver intersect) and
    degree-ordered wedge-join paths, with self-loops and parallel
    edges in the input."""
    import itertools
    import random as _r
    from paperchase_crawler_ray.ops.graph import triangle_counts
    rng = _r.Random(11)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(160)]
    edges += [(5, 5), (0, 1), (1, 0)]        # self-loop + parallels
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({n for e in es for n in e})
    want = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if (x, y) in es and (x, z) in es and (y, z) in es:
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    eds = ray.data.from_arrow(pa.table(
        {"a": pa.array([e[0] for e in edges], pa.int64()),
         "b": pa.array([e[1] for e in edges], pa.int64())})).repartition(7)
    for mode in ("broadcast", "join"):
        got = triangle_counts(eds, mode=mode).to_pandas()
        assert dict(zip(got["node"], got["n_tri"])) == want, mode
    # triangle-free (bipartite) graph -> empty result
    bip = ray.data.from_arrow(pa.table(
        {"a": pa.array([0, 0, 1, 1], pa.int64()),
         "b": pa.array([10, 11, 10, 11], pa.int64())}))
    assert triangle_counts(bip).count() == 0


def test_shortest_paths_matches_naive_both_modes(ray_session):
    """Hop-bounded Bellman-Ford == a single-process Jacobi relaxation
    (min over <= H-edge paths) on both mode paths, with parallel edges
    collapsing to their minimum weight; unreachable nodes absent."""
    import random as _r
    from paperchase_crawler_ray.ops.graph import shortest_paths
    rng = _r.Random(3)
    edges = [(rng.randrange(30), rng.randrange(30), rng.randrange(1, 8))
             for _ in range(120)]
    edges.append((0, 1, 99))   # parallel edge, must lose to the min
    edges.append((0, 1, 1))
    seeds, H = [0, 7], 10
    w = {}
    for a, b, c in edges:
        w[(a, b)] = min(w.get((a, b), 1 << 60), c)
    dist = {s: 0 for s in seeds}
    for _ in range(H):
        snap = dict(dist)
        for (a, b), c in w.items():
            if a in snap and snap[a] + c < dist.get(b, 1 << 60):
                dist[b] = snap[a] + c
    eds = ray.data.from_arrow(pa.table(
        {"a": pa.array([e[0] for e in edges], pa.int64()),
         "b": pa.array([e[1] for e in edges], pa.int64()),
         "w": pa.array([e[2] for e in edges], pa.int64())})).repartition(5)
    for mode in ("broadcast", "join"):
        got = shortest_paths(eds, seeds, max_hops=H, mode=mode).to_pandas()
        assert dict(zip(got["node"], got["dist"])) == dist, mode
    # hop cap binds: a 3-edge chain with H=2 leaves the tail out
    chain = ray.data.from_arrow(pa.table(
        {"a": pa.array([0, 1, 2], pa.int64()),
         "b": pa.array([1, 2, 3], pa.int64()),
         "w": pa.array([5, 5, 5], pa.int64())}))
    for mode in ("broadcast", "join"):
        got = shortest_paths(chain, [0], max_hops=2, mode=mode).to_pandas()
        assert dict(zip(got["node"], got["dist"])) == {0: 0, 1: 5, 2: 10}


def test_core_numbers_matches_peel_both_modes(ray_session):
    """h-index fixed-point coreness == the classic sequential peel
    algorithm, on both mode paths, with self-loops/parallel edges in
    the input and an isolated clique pinning the top core."""
    import random as _r
    from paperchase_crawler_ray.ops.graph import core_numbers
    rng = _r.Random(5)
    edges = [(rng.randrange(50), rng.randrange(50)) for _ in range(250)]
    edges += [(9, 9), (0, 1), (1, 0)]
    for a in (60, 61, 62, 63):          # K4 island: all cores == 3
        for b in (60, 61, 62, 63):
            if a < b:
                edges.append((a, b))
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # sequential peel (Batagelj-Zaversnik semantics)
    live = {n: set(v) for n, v in adj.items()}
    core, k = {}, 0
    while live:
        k = max(k, min(len(v) for v in live.values()))
        peel = [n for n, v in live.items() if len(v) <= k]
        while peel:
            n = peel.pop()
            if n not in live:
                continue
            core[n] = k
            for m in live[n]:
                live[m].discard(n)
                if len(live[m]) <= k:
                    peel.append(m)
            del live[n]
    eds = ray.data.from_arrow(pa.table(
        {"a": pa.array([e[0] for e in edges], pa.int64()),
         "b": pa.array([e[1] for e in edges], pa.int64())})).repartition(7)
    for mode in ("broadcast", "join"):
        got = core_numbers(eds, mode=mode).to_pandas()
        assert dict(zip(got["node"], got["core"])) == core, mode
    assert all(core[n] == 3 for n in (60, 61, 62, 63))


def test_audio_spectrogram_matches_numpy_twin(ray_session):
    """Per-frame FFT band energies == the same-math numpy twin
    bit-for-bit; a pure sine's energy lands in the band containing its
    frequency bin."""
    from paperchase_crawler_ray.fixtures import make_audio_rows
    from paperchase_crawler_ray.functions.av import wav_decode, wav_encode
    from paperchase_crawler_ray.ops.multimodal import AudioSpectrogram
    rows = make_audio_rows(30)
    got = ray.data.from_arrow(rows).map_batches(
        AudioSpectrogram, batch_format="pyarrow", batch_size=8,
        concurrency=(1, 4)).to_pandas()
    want = {}
    for r in rows.to_pylist():
        x, rate = wav_decode(r["payload"])
        if x.ndim == 2:
            x = x.mean(axis=1)
        flen = max(2, rate * 20 // 1000)
        nfr = len(x) // flen
        if nfr == 0:
            continue
        fr = x[:nfr * flen].reshape(nfr, flen)
        spec = np.abs(np.fft.rfft(fr, axis=1)) ** 2
        body = spec[:, 1:]
        edges = np.linspace(0, body.shape[1], 9, dtype=np.int64)
        be = np.stack([body[:, edges[j]:edges[j + 1]].sum(axis=1)
                       for j in range(8)], axis=1)
        for f in range(nfr):
            want[(r["media_id"], f)] = be[f]
    assert len(got) == len(want)
    for r in got.itertuples():
        w = want[(r.media_id, r.frame_idx)]
        assert all(getattr(r, f"b{j}") == w[j] for j in range(8))
    # pure 2kHz sine at 8kHz, 20ms frames -> bin 40 of 80 -> band 3/8
    rate = 8000
    sig = 0.5 * np.sin(2 * np.pi * 2000.0 * np.arange(rate) / rate)
    t = pa.table({"media_id": pa.array(["sine"], pa.string()),
                  "payload": pa.array([wav_encode(sig, rate)], pa.binary()),
                  "sample_rate": pa.array([rate], pa.int32())})
    out = AudioSpectrogram()(t).to_pandas()
    bsums = [out[f"b{j}"].sum() for j in range(8)]
    assert int(np.argmax(bsums)) == 3
    assert bsums[3] > 100 * sum(b for j, b in enumerate(bsums) if j != 3)


def test_trustrank_matches_naive_both_modes(ray_session):
    """Personalized PageRank (teleport-to-seeds) == the integer
    single-process twin bit-for-bit on both mode paths; nodes
    unreachable from the trust set score exactly 0, and the uniform
    path is unchanged by the new parameter."""
    import collections
    import random as _r
    from paperchase_crawler_ray.ops.graph import pagerank
    rng = _r.Random(9)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(150)]
    edges.append((90, 91))   # island: unreachable from the seeds
    seeds, iters, damp, scale = [0, 3, 5], 6, 850_000, 1_000_000

    def damped(x):
        a, b = divmod(x, 1_000_000)
        return a * damp + (b * damp) // 1_000_000

    nodes = sorted({n for e in edges for n in e})
    outdeg = collections.Counter(a for a, _b in edges)
    base = scale - scale * damp // 1_000_000
    sc = {n: (scale if n in seeds else 0) for n in nodes}
    for _ in range(iters):
        snap = dict(sc)
        sc = {n: (base if n in seeds else 0) for n in nodes}
        for a, b in edges:
            sc[b] += damped(snap[a]) // outdeg[a]
    eds = ray.data.from_arrow(pa.table(
        {"a": pa.array([e[0] for e in edges], pa.int64()),
         "b": pa.array([e[1] for e in edges], pa.int64())})).repartition(5)
    for mode in ("broadcast", "join"):
        got = pagerank(eds, iters=iters, mode=mode,
                       teleport=seeds).to_pandas()
        gd = dict(zip(got["node"], got["score"]))
        assert gd == sc, mode
        assert gd[90] == 0 and gd[91] == 0
    # uniform behavior unchanged: teleport=None == old semantics
    u1 = pagerank(eds, iters=3).to_pandas()
    assert (u1["score"] > 0).all()


def test_triangle_counts_string_ids_with_separator(ray_session):
    """Join-mode wedge close is a two-column equi-join, so string node
    ids containing any would-be separator cannot collide into
    fabricated triangles (review fix); both modes agree."""
    import itertools
    from paperchase_crawler_ray.ops.graph import triangle_counts
    # K3 on pipe-bearing ids + a wedge that must NOT close
    ids = ["a|b", "c", "a", "b|c", "x|", "|y"]
    es = {("a|b", "c"), ("c", "a"), ("a", "a|b"),       # triangle
          ("b|c", "x|"), ("x|", "|y")}                   # open wedge
    nodes = sorted({n for e in es for n in e})
    esn = {tuple(sorted(e)) for e in es}
    want = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if (tuple(sorted((x, y))) in esn and tuple(sorted((x, z))) in esn
                and tuple(sorted((y, z))) in esn):
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    eds = ray.data.from_arrow(pa.table(
        {"a": pa.array([e[0] for e in es], pa.string()),
         "b": pa.array([e[1] for e in es], pa.string())}))
    for mode in ("broadcast", "join"):
        got = triangle_counts(eds, mode=mode).to_pandas()
        assert dict(zip(got["node"], got["n_tri"])) == want, mode


def test_write_resumable_rejects_out_of_range_shard(ray_session, tmp_path):
    """A precomputed shard value outside [0, num_shards) must fail
    loudly — silent dropping would seal _COMMITTED over missing rows
    (review fix)."""
    import pandas as pd
    from paperchase_crawler_ray.ops.sink import write_resumable
    df = pd.DataFrame({"k": range(8), "shard": [0, 1, 2, 3, 4, 5, 6, 7]})
    with pytest.raises(Exception, match="outside"):
        write_resumable(ray.data.from_pandas(df), str(tmp_path / "o"),
                        num_shards=4, shard_col="shard")


def test_curate_rejects_unknown_filter(ray_session):
    """A typo'd gate name raises instead of shipping an ungated corpus
    (review fix)."""
    from paperchase_crawler_ray.pipelines.curate import (CurateConfig,
                                                         curate_chain)
    docs = ray.data.range(1)
    with pytest.raises(ValueError, match="unknown quality filters"):
        curate_chain(docs, CurateConfig(filters=("Gopher",)))


def test_write_csv_keeps_identical_blocks(ray_session, tmp_path):
    """Two distinct blocks with identical content both land on disk —
    content-hash-only naming would overwrite one (review fix) — while
    the returned count matches the rows actually written."""
    import glob
    import pandas as pd
    from paperchase_crawler_ray.sources import read_csv, write_csv
    df = pd.DataFrame({"k": [1, 2, 3]})
    ds = ray.data.from_pandas([df.copy(), df.copy()])   # 2 equal blocks
    out = str(tmp_path / "csv")
    n = write_csv(ds, out)
    assert n == 6
    files = glob.glob(out + "/*.csv")
    assert len(files) == 2
    got = read_csv(out).to_pandas()
    assert sorted(got["k"]) == [1, 1, 2, 2, 3, 3]


def test_document_clusters_matches_twin(docs_table, ray_session):
    """Feature-hash -> distributed k-means -> assignment equals the
    same-math single-process twin bit-for-bit on a FIXED block layout
    (kmeans_distributed's documented layout-stability), and every
    cluster id is in range."""
    from collections import Counter
    from paperchase_crawler_ray.functions.texthash import stable_hash64
    from paperchase_crawler_ray.ops.similarity import kmeans_distributed
    from paperchase_crawler_ray.ops.textstats import document_clusters
    ds = ray.data.from_arrow(docs_table)     # one block: fixed layout
    got = document_clusters(ds, n_clusters=5, dim=32, iters=4).to_pandas()
    assert len(got) == docs_table.num_rows
    assert got["cluster"].between(0, 4).all()
    X = np.zeros((docs_table.num_rows, 32))
    for i, t in enumerate(docs_table.column("text").to_pylist()):
        for tok, c in Counter(w.lower() for w in
                              re.findall(r"\w+", t, re.ASCII)).items():
            h = stable_hash64(tok)
            X[i, h % 32] += (1.0 if (h >> 62) & 1 else -1.0) \
                * np.log1p(np.float64(c))
    n = np.sqrt((X * X).sum(axis=1, keepdims=True))
    n[n == 0] = 1
    X = X / n
    vds = ray.data.from_arrow(pa.table(
        {"vec_id": docs_table.column("doc_id"),
         "embedding": pa.array(list(X), pa.list_(pa.float64()))}))
    C = kmeans_distributed(vds, 5, iters=4)
    want = {int(k): int(v) for k, v in zip(
        docs_table.column("doc_id").to_pylist(),
        (X @ C.T).argmax(axis=1))}
    assert {int(k): int(v)
            for k, v in zip(got["doc_id"], got["cluster"])} == want
