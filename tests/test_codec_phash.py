"""M8-M10 codec + phash tests: round-trip losslessness (PSNR=inf),
sniffing, phash goldens and hamming (SURVEY.md §5.2 item 1)."""

import numpy as np
import pytest

from paperchase_crawler_ray.fixtures import make_pixels
from paperchase_crawler_ray.functions.codec import (
    bmp_decode, bmp_encode, decode, encode, png_decode, png_encode, psnr,
    raw_decode, raw_encode, sniff_format)
from paperchase_crawler_ray.functions.phash import hamming64, phash64


@pytest.mark.parametrize("fmt", ["png", "bmp", "raw"])
@pytest.mark.parametrize("wh", [(16, 16), (33, 17), (64, 96)])
def test_roundtrip_lossless(fmt, wh):
    w, h = wh
    px = make_pixels(f"t-{fmt}-{w}x{h}", w, h)
    data = encode(px, fmt)
    assert sniff_format(data) == fmt
    out = decode(data)
    assert out.shape == px.shape
    assert (out == px).all()
    assert psnr(px, out) == float("inf")


def test_individual_codecs():
    px = make_pixels("t2", 20, 12)
    assert (png_decode(png_encode(px)) == px).all()
    assert (bmp_decode(bmp_encode(px)) == px).all()
    assert (raw_decode(raw_encode(px)) == px).all()


def test_sniff_rejects_garbage():
    assert sniff_format(b"") == ""
    assert sniff_format(b"<html><body>") == ""
    assert sniff_format(b"\x00" * 32) == ""


def test_psnr_sensitivity():
    px = make_pixels("t3", 32, 32)
    noisy = px.astype(np.int64).copy()
    noisy[0, 0, 0] += 8
    v = psnr(px, np.clip(noisy, 0, 255).astype(np.uint8))
    assert 40.0 < v < 100.0


def test_phash_deterministic_and_robust():
    px = make_pixels("t4", 64, 64)
    h1 = phash64(px)
    assert h1 == phash64(px.copy())
    # tiny noise must stay within small hamming distance
    rng = np.random.Generator(np.random.PCG64(0))
    noisy = np.clip(px.astype(np.int64) + rng.integers(-3, 4, px.shape), 0, 255
                    ).astype(np.uint8)
    assert hamming64(np.array([h1]), np.array([phash64(noisy)]))[0] <= 6
    # a different image must be far
    other = make_pixels("t5-completely-different", 64, 64)
    inverted = (255 - px).astype(np.uint8)
    assert hamming64(np.array([h1]), np.array([phash64(inverted)]))[0] > 10


def test_hamming64_vectorized():
    a = np.array([0, -1, 0x0F0F0F0F0F0F0F0F], np.int64)
    b = np.array([0, 0, 0], np.int64)
    assert hamming64(a, b).tolist() == [0, 64, 32]
