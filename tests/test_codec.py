import numpy as np
import pytest

from simplecrawler_spark import codec


def _img(seed=0, w=32, h=24):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


def test_png_roundtrip_exact():
    img = _img(1)
    assert np.array_equal(codec.png_decode(codec.png_encode(img)), img)


def test_ppm_roundtrip_exact():
    img = _img(2)
    assert np.array_equal(codec.ppm_decode(codec.ppm_encode(img)), img)


def test_qpng_lossy_psnr_above_40():
    img = _img(3, 64, 64)
    dec = codec.png_decode(codec.qpng_encode(img))
    assert not np.array_equal(dec, img)  # actually lossy
    assert codec.psnr(img, dec) >= 40.0


def test_png_filters_unfilter():
    # hand-build a 2x2 image with filter type 2 (Up) rows and check decode
    import struct, zlib
    img = _img(4, 2, 2)
    row0 = np.concatenate([[0], img[0].ravel()]).astype(np.uint8)
    delta = (img[1].ravel().astype(np.int32) - img[0].ravel().astype(np.int32)) % 256
    row1 = np.concatenate([[2], delta]).astype(np.uint8)
    raw = np.concatenate([row0, row1]).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    data = (codec._PNG_SIG + codec._chunk(b"IHDR", ihdr)
            + codec._chunk(b"IDAT", zlib.compress(raw)) + codec._chunk(b"IEND", b""))
    assert np.array_equal(codec.png_decode(data), img)


def test_average_hash_stable_and_discriminative():
    a, b = _img(5, 64, 64), _img(6, 64, 64)
    ha, hb = codec.average_hash(a), codec.average_hash(b)
    assert ha == codec.average_hash(a)
    assert ha != hb
    assert -(2**63) <= ha < 2**63


def test_decode_dispatch_errors():
    with pytest.raises(ValueError):
        codec.decode(b"garbage", "png")
    with pytest.raises(ValueError):
        codec.decode(b"garbage", "webp")
