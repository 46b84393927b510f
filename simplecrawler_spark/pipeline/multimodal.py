"""Multimodal payload operators: image/audio/video as opaque ``binary``
columns + typed metadata, processed in Arrow batches.

The image path is REAL end-to-end in this repo (pure numpy+zlib PNG codec —
decode, feature-extract, resize, perceptual-hash all tested). Audio/video
decode is STUBBED (no codec libs in the sandbox, marked explicitly) but the
Spark-side plumbing — schema, batch shape, partition behavior — is the same
``mapInPandas`` pattern and is tested with the fake decoder.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from simplecrawler_spark import codec

IMAGE_FEATURES_SCHEMA = (
    "image_id string, w int, h int, fmt string, mean_r double, mean_g double, "
    "mean_b double, brightness double, phash long"
)


def image_features(images: DataFrame) -> DataFrame:
    """Decode + feature-extract per Arrow batch: channel means, brightness,
    perceptual hash. Input: input_hint schema (image_id, bytes, fmt, …)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            mr, mg, mb, br = (np.zeros(n) for _ in range(4))
            ph = np.zeros(n, dtype=np.int64)
            w = np.zeros(n, dtype=np.int32)
            h = np.zeros(n, dtype=np.int32)
            for i in range(n):
                img = codec.decode(pdf["bytes"].iat[i], pdf["fmt"].iat[i])
                h[i], w[i] = img.shape[:2]
                m = img.reshape(-1, 3).mean(axis=0)
                mr[i], mg[i], mb[i] = m
                br[i] = m.mean()
                ph[i] = codec.average_hash(img)
            yield pd.DataFrame({
                "image_id": pdf["image_id"], "w": w, "h": h, "fmt": pdf["fmt"],
                "mean_r": mr, "mean_g": mg, "mean_b": mb, "brightness": br, "phash": ph,
            })

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        feats, schema=IMAGE_FEATURES_SCHEMA)


def image_resize(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize (pure numpy index grid), re-encoded as PNG."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i in range(len(pdf)):
                img = codec.decode(pdf["bytes"].iat[i], pdf["fmt"].iat[i])
                ys = (np.arange(out_h) * img.shape[0] // out_h)
                xs = (np.arange(out_w) * img.shape[1] // out_w)
                out.append(codec.png_encode(img[ys][:, xs]))
            yield pd.DataFrame({
                "image_id": pdf["image_id"], "bytes": out,
                "w": np.full(len(pdf), out_w, dtype=np.int32),
                "h": np.full(len(pdf), out_h, dtype=np.int32),
                "fmt": ["png"] * len(pdf),
            })

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        resize, schema="image_id string, bytes binary, w int, h int, fmt string")


def phash_near_dupes(images: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate images by perceptual hash — same pigeonhole-blocked
    Hamming join as SimHash text dedupe (shared scale pattern)."""
    from simplecrawler_spark.pipeline.dedup import simhash_pairs

    fps = images.select(F.col("image_id").cast("string"), F.col("phash"))
    # reuse the 4×16-bit segment blocking; relabel columns for images
    renamed = fps.select(F.xxhash64("image_id").alias("doc_id"), F.col("phash").alias("simhash"))
    pairs = simhash_pairs(renamed, max_hamming=max_hamming)
    ids = fps.select(F.xxhash64("image_id").alias("k"), "image_id")
    return (pairs.join(ids.withColumnRenamed("image_id", "image_a"), pairs.a == ids.k)
            .drop("k")
            .join(ids.withColumnRenamed("image_id", "image_b"), pairs.b == F.col("k"))
            .select("image_a", "image_b", "hamming"))


AUDIO_FEATURES_SCHEMA = "media_id string, duration_s double, n_frames long, feature_ok boolean"


def audio_features(media: DataFrame) -> DataFrame:
    """STUB decode (no audio codec libs in sandbox): deterministic fake
    parses a header-length pseudo-format so the batch plumbing is testable.
    Swap ``_decode_audio_stub`` for a real decoder on a cluster."""

    def _decode_audio_stub(b: bytes) -> tuple[float, int]:
        if b is None or len(b) < 4:
            raise NotImplementedError("real audio decode requires codec libs")
        n = int.from_bytes(b[:4], "big")
        return n / 16000.0, n

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dur = np.zeros(len(pdf))
            nf = np.zeros(len(pdf), dtype=np.int64)
            ok = np.zeros(len(pdf), dtype=bool)
            for i in range(len(pdf)):
                try:
                    dur[i], nf[i] = _decode_audio_stub(pdf["bytes"].iat[i])
                    ok[i] = True
                except NotImplementedError:
                    ok[i] = False
            yield pd.DataFrame({"media_id": pdf["media_id"], "duration_s": dur,
                                "n_frames": nf, "feature_ok": ok})

    return media.select("media_id", "bytes").mapInPandas(feats, schema=AUDIO_FEATURES_SCHEMA)


VIDEO_FRAME_SCHEMA = ("media_id string, frame_idx long, w int, h int, "
                      "png binary, frame_ok boolean")
_VID_MAGIC = b"VID0"


def pack_video(frames: np.ndarray) -> bytes:
    """Deterministic raw-frame container for tests/benchmarks: ``VID0`` +
    uint32 n_frames + uint16 w + uint16 h + concatenated RGB24 frames.
    Stands in for a real container until a codec lib is swapped in."""
    n, h, w, _ = frames.shape
    head = (_VID_MAGIC + int(n).to_bytes(4, "big")
            + int(w).to_bytes(2, "big") + int(h).to_bytes(2, "big"))
    return head + frames.astype(np.uint8).tobytes()


def _decode_video_frames(b: bytes) -> np.ndarray:
    """STUB real-codec seam: only the ``VID0`` raw container decodes here
    (no video codec libs in the sandbox); anything else is a real bitstream
    and raises. Swap this function for an ffmpeg/pyav decoder on a cluster —
    the Spark plumbing above it does not change."""
    if b is None or len(b) < 12 or b[:4] != _VID_MAGIC:
        raise NotImplementedError("real video decode requires codec libs")
    n = int.from_bytes(b[4:8], "big")
    w = int.from_bytes(b[8:10], "big")
    h = int.from_bytes(b[10:12], "big")
    body = np.frombuffer(b, dtype=np.uint8, offset=12)
    if len(body) != n * h * w * 3:
        # truncated/corrupt container (header inconsistent with body length):
        # must surface as an undecodable payload, not a task-killing reshape
        # error — video_frame_sample turns this into a frame_ok=false row
        raise NotImplementedError("corrupt VID0 container: header/body length mismatch")
    return body.reshape(n, h, w, 3)


def video_frame_sample(media: DataFrame, every_n: int = 10,
                       max_frames: int | None = None) -> DataFrame:
    """Frame sampling: one input video row → one output row per sampled
    frame (every ``every_n``-th, optionally capped at ``max_frames``), each
    re-encoded as a real PNG via the repo codec. Row-exploding
    ``mapInPandas`` keeps the decode batch-local — no shuffle; downstream
    per-frame ops (features, phash near-dup) join on (media_id, frame_idx).
    Undecodable payloads yield a single ``frame_ok=false`` row instead of
    failing the task (poison-pill isolation at 100 TB)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in
                                    ("media_id", "frame_idx", "w", "h", "png", "frame_ok")}
            for i in range(len(pdf)):
                mid = pdf["media_id"].iat[i]
                try:
                    frames = _decode_video_frames(pdf["bytes"].iat[i])
                except NotImplementedError:
                    out["media_id"].append(mid); out["frame_idx"].append(-1)
                    out["w"].append(0); out["h"].append(0)
                    out["png"].append(None); out["frame_ok"].append(False)
                    continue
                idxs = range(0, frames.shape[0], every_n)
                if max_frames is not None:
                    idxs = list(idxs)[:max_frames]
                for j in idxs:
                    fr = frames[j]
                    out["media_id"].append(mid); out["frame_idx"].append(int(j))
                    out["w"].append(int(fr.shape[1])); out["h"].append(int(fr.shape[0]))
                    out["png"].append(codec.encode(fr, "png")); out["frame_ok"].append(True)
            yield pd.DataFrame(out)

    return media.select("media_id", "bytes").mapInPandas(sample, schema=VIDEO_FRAME_SCHEMA)
