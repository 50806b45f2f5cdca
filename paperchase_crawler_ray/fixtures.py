"""Deterministic fixture generation (FIXTURES.md) — seed=42, no I/O.

One generator feeds unit tests, the end-to-end golden test, ``entry()``
and the bench harness (scaled up with the same rules), so correctness and
throughput runs exercise identical semantics.

Everything is keyed off ``seed ^ stable_hash(identity)`` so any row can be
regenerated independently of generation order.
"""

from __future__ import annotations

from functools import lru_cache as _lru_cache

import numpy as np
import pyarrow as pa

from .functions.codec import decode, encode
from .functions.phash import phash64
from .functions.texthash import stable_hash64
from .schemas import WEB_FIXTURE

_WORDS = (
    "amber basalt cedar delta ember fjord garnet harbor indigo jasper keel "
    "lumen meadow nectar onyx prism quartz raven sierra tundra umber vortex "
    "willow xenon yarrow zephyr anchor breeze cobalt dusk echo flint grove "
    "haze iris juniper kelp larch mist nimbus oak pine quay reef slate "
    "thorn undertow vale wharf yew zenith arbor bluff crest dune eyrie "
    "fern glen heath inlet knoll ledge marsh moor"
).split()
assert len(_WORDS) == 64

_W_CYCLE = (16, 32, 64, 128)
_H_CYCLE = (16, 24, 64, 96)
# fmt aligned with the size class: the lossy jpeg path rides the small
# class so the e2e/bench corpus exercises encode->decode->PSNR on every
# wave without letting entropy-coding CPU dominate the image branch.
_FMT_CYCLE = ("jpeg", "png", "bmp", "raw")


def _rng_for(seed: int, identity: str) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(seed ^ (stable_hash64(identity) & 0x7FFFFFFFFFFFFFFF)))


def make_caption(k: int, rng: np.random.Generator) -> str:
    a, b, c = (int(x) for x in rng.integers(0, 64, size=3))
    return f"Figure {k}: {_WORDS[a]} {_WORDS[b]} under {_WORDS[c]}."


@_lru_cache(maxsize=16)
def _grad_base(w: int, h: int) -> np.ndarray:
    """The (h, w, 3) gradient plane — pure function of the dims, cached
    (the fixture cycles over 4 size classes, and recomputing it per
    image dominated synthesis cost for the big classes)."""
    yy, xx = np.mgrid[0:h, 0:w]
    grad = ((xx * 255) // max(1, w - 1) + (yy * 255) // max(1, h - 1)) // 2
    return np.stack([grad, 255 - grad, (grad * 2) % 256],
                    axis=2).astype(np.int64)


def make_pixels(image_id: str, w: int, h: int, seed: int = 42) -> np.ndarray:
    """Deterministic gradient + noise RGB image so PSNR is meaningful.
    The rng.integers call is byte-identical to the original per-call
    form — pixel values (and every phash/PSNR golden) are unchanged."""
    rng = _rng_for(seed, image_id)
    noise = rng.integers(-24, 25, size=(h, w, 3))
    return np.clip(_grad_base(w, h) + noise, 0, 255).astype(np.uint8)


def make_shot_video_rows(n: int, seed: int = 42, frame_w: int = 24,
                         frame_h: int = 16) -> pa.Table:
    """Deterministic motion-JPEG videos with SHOT structure (for the
    keyframe extractor): 2-4 shots per video, each a base gradient
    frame repeated 3-5 times with tiny (+-2) per-frame noise — so
    within-shot phash distances are near zero and scene cuts are
    large. Same VIDEO_SCHEMA shape as ``make_video_rows``."""
    from .functions.av import mjpeg_encode
    ids, payloads, fps, nframes = [], [], [], []
    for k in range(n):
        mid = f"shotvid{k:06d}"
        rng = _rng_for(seed, mid)
        frames = []
        for s in range(int(rng.integers(2, 5))):
            base = make_pixels(f"{mid}/shot{s}", frame_w, frame_h, seed)
            for _ in range(int(rng.integers(3, 6))):
                jitter = rng.integers(-2, 3, size=base.shape)
                frames.append(np.clip(base.astype(np.int64) + jitter,
                                      0, 255).astype(np.uint8))
        ids.append(mid)
        payloads.append(mjpeg_encode(frames, quality=90))
        fps.append(10.0)
        nframes.append(len(frames))
    return pa.table({
        "media_id": pa.array(ids, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "codec": pa.array(["mjpeg"] * n, pa.string()),
        "fps": pa.array(fps, pa.float32()),
        "n_frames": pa.array(nframes, pa.int32()),
    })


def make_image_rows(n: int, seed: int = 42, seed_id: int = 0) -> pa.Table:
    """Standalone image_caption table rows (FIXTURES.md §1)."""
    ids, blobs, ws, hs, fmts, captions, phashes = [], [], [], [], [], [], []
    for k in range(n):
        image_id = f"img-{seed_id:04d}-{k:06d}"
        w, h = _W_CYCLE[k % 4], _H_CYCLE[k % 4]
        fmt = _FMT_CYCLE[k % 4]
        px = make_pixels(image_id, w, h, seed)
        rng = _rng_for(seed, "cap:" + image_id)
        ids.append(image_id)
        blob = encode(px, fmt)
        blobs.append(blob)
        if fmt == "jpeg":
            # metadata must describe the payload: phash of what the lossy
            # bytes decode to, not of the pre-encode pixels
            px = decode(blob, fmt)
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        captions.append(make_caption(k, rng))
        phashes.append(phash64(px))
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phashes, pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# fixture web (FIXTURES.md §3): page graph over H hosts, power-law skew
# --------------------------------------------------------------------------

def host_name(i: int) -> str:
    return f"h{i:03d}.example"


def _pages_per_host(n_hosts: int, total_pages: int,
                    hot_share: float = 0.4) -> list[int]:
    """Power-law page counts; host 0 gets ``hot_share`` of all pages
    (0.4 default; the skew-stress scaling protocol raises it to 0.8)."""
    hot = max(1, int(total_pages * hot_share))
    rest = total_pages - hot
    weights = np.array([1.0 / (i + 1) for i in range(1, n_hosts)]) if n_hosts > 1 else np.array([])
    counts = [hot]
    if n_hosts > 1:
        share = (weights / weights.sum() * rest).astype(int)
        share[: rest - share.sum()] += 1
        counts.extend(max(1, int(c)) for c in share)
    return counts


def _page_url(host_i: int, page_j: int) -> str:
    return f"http://{host_name(host_i)}/p/{page_j}"


def _image_url(host_i: int, page_j: int, k: int, fmt: str) -> str:
    return f"http://{host_name(host_i)}/img/{page_j}-{k}.{fmt}"


def _page_html(host_i: int, page_j: int, pages: list[int], seed: int) -> tuple[str, list[str]]:
    """HTML body for a page + list of image URLs it references."""
    url = _page_url(host_i, page_j)
    rng = _rng_for(seed, "page:" + url)
    n_hosts = len(pages)
    links: list[str] = []
    for _ in range(8):
        style = int(rng.integers(0, 10))
        if style < 5:  # same-host relative/absolute, sometimes non-canonical
            tgt = int(rng.integers(0, pages[host_i]))
            variant = int(rng.integers(0, 5))
            if variant == 0:
                links.append(f"/p/{tgt}")
            elif variant == 1:
                links.append(f"/p/./{tgt}#frag")
            elif variant == 2:
                links.append(f"http://{host_name(host_i).upper()}:80/p/{tgt}")
            elif variant == 3:
                links.append(f"/p/{tgt}?b=2&a=1")
            else:
                links.append(_page_url(host_i, tgt))
        elif style < 9:  # cross-host
            hj = int(rng.integers(0, n_hosts))
            links.append(_page_url(hj, int(rng.integers(0, pages[hj]))))
        else:  # off-scope
            links.append("ftp://files.example/skip")
    if int(rng.integers(0, 4)) == 0 and links:
        links.append(links[0])  # deliberate duplicate
    imgs: list[str] = []
    figures = []
    n_figs = int(rng.integers(0, 3))
    for k in range(n_figs):
        fmt = _FMT_CYCLE[(page_j + k) % 4]  # matches image_spec size class
        src = _image_url(host_i, page_j, k, fmt)
        imgs.append(src)
        cap = make_caption(page_j * 4 + k, _rng_for(seed, "cap:" + src))
        if k % 2 == 0:
            figures.append(f'<figure><img src="{src}"><figcaption>{cap}</figcaption></figure>')
        else:
            figures.append(f'<img src="{src}" alt="{cap}">')
    body = "<html><body>" + "".join(
        f'<a href="{l}">link</a>' for l in links
    ) + "".join(figures) + "</body></html>"
    return body, imgs


def image_spec(src: str, img_scale: int = 1) -> tuple[int, int, str]:
    """(w, h, fmt) for a fixture image URL — the shared rule both the
    eager web generator and the GenerativeFetcher derive bytes from."""
    fmt = src.rsplit(".", 1)[-1]
    tail = src.rsplit("/", 1)[-1]          # "{j}-{k}.{fmt}"
    j, rest = tail.split("-", 1)
    idx = int(rest.split(".")[0])
    c = (int(j) + idx) % 4
    return _W_CYCLE[c] * img_scale, _H_CYCLE[c] * img_scale, fmt


def gen_image_bytes(src: str, img_scale: int = 1, seed: int = 42
                    ) -> tuple[bytes, str]:
    """Deterministic image body for a fixture image URL -> (bytes, fmt)."""
    w, h, fmt = image_spec(src, img_scale)
    return encode(make_pixels(src, w, h, seed), fmt), fmt


def make_web(n_hosts: int = 20, total_pages: int = 400, seed: int = 42,
             materialize_images: bool = True, img_scale: int = 1,
             hot_share: float = 0.4) -> pa.Table:
    """The synthetic web the sandbox Fetcher serves (FIXTURES.md §3).

    ``materialize_images=False`` returns only the HTML/robots rows — image
    bodies are then synthesized on demand by ``stages.fetch
    .GenerativeFetcher`` (same deterministic rule), which keeps the
    broadcast table tiny at bench scale. ``hot_share`` skews host 0's
    page share (the adversarial-skew scaling protocol uses 0.8).
    """
    pages = _pages_per_host(n_hosts, total_pages, hot_share)
    urls, statuses, ctypes, bodies, locations = [], [], [], [], []

    def add(url, status, ctype, body, location=""):
        urls.append(url)
        statuses.append(status)
        ctypes.append(ctype)
        bodies.append(body)
        locations.append(location)

    for i in range(n_hosts):
        delay = float(i % 3)  # Crawl-delay in {0, 1, 2} virtual units
        robots = "User-agent: *\n" + "".join(
            f"Disallow: /p/{j}\n" for j in range(pages[i]) if j % 10 == 7
        ) + (f"Crawl-delay: {int(delay)}\n" if delay else "")
        add(f"http://{host_name(i)}/robots.txt", 200, "text/plain", robots.encode())
        for j in range(pages[i]):
            url = _page_url(i, j)
            if (i * 131 + j) % 17 == 5:
                add(url, 404, "text/html", b"not found")
                continue
            if (i * 131 + j) % 13 == 11:
                tgt = _page_url(i, (j + 1) % pages[i])
                add(url, 301, "text/html", b"", location=tgt)
                continue
            body, imgs = _page_html(i, j, pages, seed)
            add(url, 200, "text/html", body.encode())
            if materialize_images:
                for src in imgs:
                    data, fmt = gen_image_bytes(src, img_scale, seed)
                    add(src, 200, f"image/{fmt}", data)
    return pa.table(
        {
            "url_canon": pa.array(urls, pa.string()),
            "status": pa.array(statuses, pa.int32()),
            "content_type": pa.array(ctypes, pa.string()),
            "body": pa.array(bodies, pa.binary()),
            "location": pa.array(locations, pa.string()),
        },
        schema=WEB_FIXTURE,
    )


def make_seeds(n_seeds: int = 6, n_hosts: int = 20, seed: int = 42) -> pa.Table:
    """Seed URLs, deliberately non-canonical to exercise M1."""
    urls, seed_ids, prios = [], [], []
    variants = [
        lambda i: f"http://{host_name(i).upper()}/p/0",
        lambda i: f"http://{host_name(i)}:80/p/0#top",
        lambda i: f"http://{host_name(i)}/p/./0",
        lambda i: f"http://{host_name(i)}/p/0",
    ]
    for s in range(n_seeds):
        i = s % n_hosts
        urls.append(variants[s % len(variants)](i))
        seed_ids.append(s)
        prios.append(1.0)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "seed_id": pa.array(seed_ids, pa.int32()),
            "priority": pa.array(prios, pa.float64()),
        }
    )


def make_audio_rows(n: int, seed: int = 42, sample_rate: int = 8000) -> pa.Table:
    """Deterministic REAL WAV/PCM audio rows (AUDIO_SCHEMA shape): sine
    mixtures with per-row frequency/amplitude/length keyed off the media
    id, encoded with ``functions.av.wav_encode`` — so the real decode
    path has ground truth (RMS of a sine ≈ amp/√2)."""
    from .functions.av import wav_encode
    ids, payloads, rates, chans = [], [], [], []
    for k in range(n):
        mid = f"aud{k:06d}"
        rng = _rng_for(seed, mid)
        n_samp = int(rng.integers(sample_rate // 20, sample_rate // 4))
        freq = float(rng.uniform(80, 2000))
        amp = float(rng.uniform(0.1, 0.9))
        ch = 1 if k % 3 else 2
        t = np.arange(n_samp, dtype=np.float64) / sample_rate
        x = amp * np.sin(2 * np.pi * freq * t)
        if ch == 2:
            x = np.stack([x, 0.5 * x], axis=1)
        ids.append(mid)
        payloads.append(wav_encode(x, sample_rate))
        rates.append(sample_rate)
        chans.append(ch)
    return pa.table({
        "media_id": pa.array(ids, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "codec": pa.array(["wav"] * n, pa.string()),
        "sample_rate": pa.array(rates, pa.int32()),
        "n_channels": pa.array(chans, pa.int32()),
    })


def make_speech_rows(n: int, seed: int = 42,
                     sample_rate: int = 8000) -> pa.Table:
    """Deterministic REAL WAV rows shaped like speech for VAD tests:
    alternating exact-silence and sine-burst spans whose boundaries are
    MULTIPLES OF THE 20ms VAD FRAME (160 samples at 8kHz), so the
    expected voice segments are knowable by construction. The expected
    segments (in frames) ride along as JSON in ``segments_json``."""
    import json as _json

    from .functions.av import wav_encode
    frame = sample_rate // 50          # 20 ms
    ids, payloads, rates, segjs = [], [], [], []
    for k in range(n):
        mid = f"spc{k:06d}"
        rng = _rng_for(seed, mid)
        spans, segs, pieces, pos = int(rng.integers(2, 6)), [], [], 0
        for s in range(spans):
            sil = int(rng.integers(2, 6))      # frames of silence
            voc = int(rng.integers(3, 9))      # frames of voice
            pieces.append(np.zeros(sil * frame))
            t = np.arange(voc * frame, dtype=np.float64) / sample_rate
            amp = float(rng.uniform(0.3, 0.8))
            freq = float(rng.uniform(100, 800))
            pieces.append(amp * np.sin(2 * np.pi * freq * t))
            segs.append((pos + sil, pos + sil + voc))
            pos += sil + voc
        pieces.append(np.zeros(int(rng.integers(2, 5)) * frame))
        x = np.concatenate(pieces)
        ids.append(mid)
        payloads.append(wav_encode(x, sample_rate))
        rates.append(sample_rate)
        segjs.append(_json.dumps(segs))
    return pa.table({
        "media_id": pa.array(ids, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "codec": pa.array(["wav"] * n, pa.string()),
        "sample_rate": pa.array(rates, pa.int32()),
        "n_channels": pa.array([1] * n, pa.int32()),
        "segments_json": pa.array(segjs, pa.string()),
    })


def make_video_rows(n: int, seed: int = 42, frame_w: int = 24,
                    frame_h: int = 16) -> pa.Table:
    """Deterministic REAL motion-JPEG video rows (VIDEO_SCHEMA shape):
    3-9 gradient+noise frames per row, each encoded by the engine's own
    baseline-JPEG codec and concatenated (``functions.av.mjpeg_encode``)."""
    from .functions.av import mjpeg_encode
    ids, payloads, fps, nframes = [], [], [], []
    for k in range(n):
        mid = f"vid{k:06d}"
        rng = _rng_for(seed, mid)
        nf = int(rng.integers(3, 10))
        frames = [make_pixels(f"{mid}/f{j}", frame_w, frame_h, seed)
                  for j in range(nf)]
        ids.append(mid)
        payloads.append(mjpeg_encode(frames, quality=90))
        fps.append(10.0)
        nframes.append(nf)
    return pa.table({
        "media_id": pa.array(ids, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "codec": pa.array(["mjpeg"] * n, pa.string()),
        "fps": pa.array(fps, pa.float32()),
        "n_frames": pa.array(nframes, pa.int32()),
    })
