"""Pure numpy+zlib image codecs (PNG / quantized-PNG / PPM) + perceptual hash.

The sandbox has no PIL/cv2/imageio, so payload bytes are produced and decoded
with a self-contained RGB8 PNG implementation (spec: RFC 2083 / W3C PNG).
``qpng`` is a deliberately lossy variant (6-bit/channel quantization before
encoding) so the PSNR≥40dB invariant path (BASELINE.json:15) is exercised for
real. All batch decode happens inside Arrow/pandas UDFs — callers pass numpy
arrays of byte strings; nothing here touches Spark rows one at a time.

Reference parity note: simplecrawler stores response bodies as opaque Buffers
(``lib/cache-backend-fs.js:≈L60–320``); the decoded-pixel invariant is our
graft's payload-correctness analog.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def png_encode(img: np.ndarray, level: int = 6) -> bytes:
    """Encode an (h, w, 3) uint8 array as an RGB8 PNG (filter type 0 rows)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # bitdepth 8, colortype 2 (RGB)
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter: None — keeps decode fully vectorized
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG row filters. Filter 0 (ours) is pure reshape; 1–4 supported
    for spec completeness (row-sequential, off the hot path)."""
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    data = rows[:, 1:].astype(np.int32)
    if not ftypes.any():
        return data.astype(np.uint8)
    out = np.zeros_like(data)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, cur = int(ftypes[y]), data[y].copy()
        if f == 0:
            line = cur
        elif f == 1:  # Sub
            line = cur
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif f == 2:  # Up
            line = (cur + prev) & 0xFF
        elif f == 3:  # Average
            line = cur
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            line = cur
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b, cc = prev[x], (prev[x - bpp] if x >= bpp else 0)
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = line
        prev = line
    return out.astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    """Decode an RGB8 PNG produced by :func:`png_encode` (or any RGB8/filter-
    simple PNG) to an (h, w, 3) uint8 array."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = []
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("only RGB8 non-interlaced supported")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    return _unfilter(raw, h, w * 3, 3).reshape(h, w, 3)


def qpng_encode(img: np.ndarray) -> bytes:
    """Lossy variant: quantize to 6 bits/channel (max err 2 → PSNR ≈ 46 dB),
    then PNG-encode. Exercises the PSNR≥40dB invariant path."""
    q = ((img.astype(np.uint16) >> 2) << 2) + 2
    return png_encode(np.minimum(q, 255).astype(np.uint8))


def ppm_encode(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def ppm_decode(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    parts = data.split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    return np.frombuffer(parts[3][: w * h * 3], dtype=np.uint8).reshape(h, w, 3)


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt in ("png", "qpng"):
        return png_decode(data)
    if fmt == "ppm":
        return ppm_decode(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def encode(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(img)
    if fmt == "qpng":
        return qpng_encode(img)
    if fmt == "ppm":
        return ppm_encode(img)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def average_hash(img: np.ndarray) -> int:
    """64-bit average hash: grayscale → 8×8 block means → bits (>mean),
    packed MSB-first, returned as *signed* int64 (Spark LongType)."""
    g = img.astype(np.float64).mean(axis=2)
    h, w = g.shape
    bh, bw = h // 8, w // 8
    small = g[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (small > small.mean()).astype(np.uint64).ravel()
    val = np.uint64(0)
    for bit in bits:
        val = (val << np.uint64(1)) | bit
    return int(val.astype(np.int64))
