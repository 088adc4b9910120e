"""Video + audio payload tables (the non-image legs of the multimodal
column contract: opaque binary payloads + typed metadata, with decode /
frame-sample / feature-extract as Arrow-batched ``mapInPandas`` stages).

Reference parity note: the reference stores every fetched asset as raw
sha256-named bytes regardless of media type (file_storage.py:279-293) —
it has no media decode at all; these operators are the forward-looking
training-pipeline surface the task brief names (frame-sample for video,
feature-extract for audio) built on the same binary-column model as
``images.py``.

No AV library (ffmpeg/PyAV/soundfile) ships in this container, so the
container formats are deterministic stand-ins with REAL Spark plumbing —
schema, partitioning, Arrow batch shape, empty-batch guards — exactly
like the image codec note in ``images.py``.  Real demuxers plug in behind
``_decode_video`` / ``_decode_audio`` the same way Pillow plugs in behind
``images._decode``.

* video fmt='vraw8': 16-byte header (magic VID8, w:u16, h:u16,
  n_frames:u16, fps:u16, reserved:i32) + ``n_frames`` raw RGB24 frames.
  Frame ``j`` of video ``v`` has the pixel field of
  ``images._pixels(v * FRAME_STRIDE + j)`` — every frame is distinct yet
  bit-reproducible on any executor, and because the pixel field is
  linear in the seed mod 256, ``phash(frame) = phash_table[(v *
  FRAME_STRIDE + j) % 256]`` — the same period-256 property the image
  phash oracle exploits, so frame-sampling is fully value-oracle-able.
* audio fmt='pcm16': 16-byte header (magic PCMS, sample_rate:u32,
  n_samples:u32, reserved:i32) + little-endian int16 samples.  Sample
  ``t`` of clip ``a`` is ``((a*2654435761 + t*40503) % 65536) - 32768``
  — pure int64 arithmetic both numpy and ANSI SQL reproduce exactly, so
  windowed energy/peak features are hash-stable against a DuckDB oracle
  (no float trig, no ulp drift).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .images import HEADER as _IMG_HEADER
from .images import MAGIC_RAW as IMG_MAGIC_RAW
from .images import _phash_batch, _pixels_batch

# sample_frames re-encodes kept frames as images.py payloads; the literal
# format is used in the closure because struct.Struct doesn't pickle
IMG_HEADER_FMT = "<4sHHi"
assert struct.Struct(IMG_HEADER_FMT).format == _IMG_HEADER.format

VIDEO_HEADER = struct.Struct("<4sHHHHi")  # magic, w, h, n_frames, fps, rsvd
AUDIO_HEADER = struct.Struct("<4sIIi")    # magic, sample_rate, n_samples, rsvd
MAGIC_VIDEO = b"VID8"
MAGIC_AUDIO = b"PCMS"

# frame seed stride: prime > any sane n_frames, so (video_id, frame_idx)
# -> seed is injective per video and seeds never collide across frames
FRAME_STRIDE = 1009

# Knuth multiplicative-hash constants for the PCM stand-in waveform
_PCM_A = 2654435761
_PCM_T = 40503

VIDEOS_SCHEMA = (
    "video_id string, bytes binary, w int, h int, n_frames int, fps int, "
    "fmt string, duration_ms bigint"
)
AUDIO_SCHEMA = (
    "audio_id string, bytes binary, sample_rate int, n_samples int, "
    "fmt string, duration_ms bigint"
)


def _decode_video(buf: bytes) -> tuple[np.ndarray, int]:
    """(n_frames, h, w, 3) uint8 frames + fps.  Real demuxers (PyAV etc.)
    plug in here on payloads whose signature isn't the stand-in magic."""
    magic, w, h, n_frames, fps, _ = VIDEO_HEADER.unpack_from(buf)
    if magic != MAGIC_VIDEO:
        raise NotImplementedError(
            "non-stand-in video container; a real demuxer (ffmpeg/PyAV) "
            "is required and none ships in this environment")
    body = np.frombuffer(buf, np.uint8, offset=VIDEO_HEADER.size)
    return body.reshape(n_frames, h, w, 3), fps


def _decode_audio(buf: bytes) -> tuple[np.ndarray, int]:
    """(n_samples,) int16 PCM + sample_rate."""
    magic, sample_rate, n_samples, _ = AUDIO_HEADER.unpack_from(buf)
    if magic != MAGIC_AUDIO:
        raise NotImplementedError(
            "non-stand-in audio container; a real decoder (soundfile/"
            "ffmpeg) is required and none ships in this environment")
    pcm = np.frombuffer(buf, np.dtype("<i2"), count=n_samples,
                        offset=AUDIO_HEADER.size)
    return pcm, sample_rate


def _pcm_batch(ids: np.ndarray, n_samples: int) -> np.ndarray:
    """(B, n_samples) int16 — the stand-in waveform, one int64 pass."""
    a = ids.astype(np.int64).reshape(-1, 1)
    t = np.arange(n_samples, dtype=np.int64)
    return (((a * _PCM_A + t * _PCM_T) % 65536) - 32768).astype(np.int16)


# ---------------------------------------------------------------------------
# table builders
# ---------------------------------------------------------------------------

def videos_table(
    spark: SparkSession,
    n_videos: int,
    w: int = 32,
    h: int = 32,
    n_frames: int = 12,
    fps: int = 24,
    partitions: int | None = None,
) -> DataFrame:
    """Video payload table; generation is mapInPandas over spark.range —
    executor-parallel, never on the driver (same shape as images_table)."""
    hdr = VIDEO_HEADER.pack(MAGIC_VIDEO, w, h, n_frames, fps, 0)
    duration_ms = (n_frames * 1000) // fps

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            # (B * n_frames) seeds -> one pixel pass for the whole batch
            seeds = (ids.reshape(-1, 1) * FRAME_STRIDE
                     + np.arange(n_frames, dtype=np.int64)).ravel()
            px = _pixels_batch(seeds, w, h).reshape(len(ids), -1)
            yield pd.DataFrame({
                "video_id": [str(int(i)) for i in ids],
                "bytes": [hdr + row.tobytes() for row in px],
                "w": np.full(len(ids), w, dtype=np.int32),
                "h": np.full(len(ids), h, dtype=np.int32),
                "n_frames": np.full(len(ids), n_frames, dtype=np.int32),
                "fps": np.full(len(ids), fps, dtype=np.int32),
                "fmt": "vraw8",
                "duration_ms": np.full(len(ids), duration_ms,
                                       dtype=np.int64),
            })

    rng = spark.range(
        0, n_videos,
        numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, VIDEOS_SCHEMA)


def audio_table(
    spark: SparkSession,
    n_clips: int,
    sample_rate: int = 8000,
    n_samples: int = 2000,
    partitions: int | None = None,
) -> DataFrame:
    """PCM16 audio payload table (binary column + typed metadata)."""
    hdr = AUDIO_HEADER.pack(MAGIC_AUDIO, sample_rate, n_samples, 0)
    duration_ms = (n_samples * 1000) // sample_rate

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            pcm = _pcm_batch(ids, n_samples)
            yield pd.DataFrame({
                "audio_id": [str(int(i)) for i in ids],
                "bytes": [hdr + row.tobytes() for row in pcm],
                "sample_rate": np.full(len(ids), sample_rate,
                                       dtype=np.int32),
                "n_samples": np.full(len(ids), n_samples, dtype=np.int32),
                "fmt": "pcm16",
                "duration_ms": np.full(len(ids), duration_ms,
                                       dtype=np.int64),
            })

    rng = spark.range(
        0, n_clips,
        numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------

def sample_frames(
    videos: DataFrame, k: int, include_bytes: bool = True
) -> DataFrame:
    """Uniform-k frame sampling: decode the container, keep frames at
    ``floor(j * n_frames / k)`` for j in 0..k-1 (the standard uniform
    temporal sample; indices dedupe when n_frames < k), re-encode each
    kept frame as a standalone lossless image payload and phash it.

    The output rows are valid ``images.py`` payloads (rgb8 header +
    RGB24), so sampled frames flow straight into the EXISTING image
    operators — ``phash_near_dupes``, ``image_features`` -> ANN — with no
    adapter: video near-dup at scale is frame-sample + the image path.

    One Arrow pass per batch; per-row work is only the two container
    (de)serializations, which is the codec boundary by nature.  For the
    raw stand-in container the "decode" is a zero-copy numpy view of the
    payload buffer — only the k KEPT frames are ever copied, so the
    operator reads O(payload) and writes O(k·frame), shuffle-free; a
    real inter-frame codec (H.264 etc.) would decode sequentially inside
    the same per-row boundary.

    ``include_bytes=False`` drops the re-encoded payload column (and its
    per-frame copy + Arrow transfer) for hash-only consumers — the video
    near-dup rollup uses only (video_id#frame_idx, phash), so shipping
    every sampled frame's full image bytes across Arrow just to discard
    them was the dominant per-row cost of that path.
    """

    # struct.Struct doesn't pickle (images.py note) — the closure uses
    # struct.pack with the literal image-header format instead
    img_hdr_fmt, img_magic = IMG_HEADER_FMT, IMG_MAGIC_RAW

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            frames_out = []
            # group by shape so same-shape videos (the normal case after
            # ingest bucketing) vectorize ACROSS rows: per-row work is
            # one zero-copy view + one k-frame gather; phash and the
            # output columns are one whole-group pass
            for (nf, fps, w_, h_), grp in pdf.groupby(
                    ["n_frames", "fps", "w", "h"], sort=False):
                nf, fps, w_, h_ = int(nf), int(fps), int(w_), int(h_)
                idx = np.unique((np.arange(k, dtype=np.int64) * nf) // k)
                kk = len(idx)
                decoded = [_decode_video(b) for b in grp["bytes"]]
                # shape drift fails loudly in np.stack; fps is the only
                # silently-wrong metadata/container mismatch — guard it
                if any(cfps != fps for _, cfps in decoded):
                    raise ValueError("container fps != metadata fps")
                kept = np.stack([fr[idx] for fr, _ in decoded])
                flat = kept.reshape(len(grp) * kk, h_, w_, 3)
                ph = _phash_batch(flat)
                ts = (idx * 1000) // fps
                cols = {
                    "video_id": np.repeat(grp["video_id"].to_numpy(), kk),
                    "frame_idx": np.tile(idx, len(grp)).astype(np.int32),
                    "ts_ms": np.tile(ts, len(grp)),
                    "w": np.int32(w_),
                    "h": np.int32(h_),
                    "phash": ph,
                }
                if include_bytes:
                    img_hdr = struct.pack(img_hdr_fmt, img_magic, w_, h_, 0)
                    cols["bytes"] = [img_hdr + f.tobytes() for f in flat]
                frames_out.append(pd.DataFrame(cols))
            yield pd.concat(frames_out)

    schema = (
        "video_id string, frame_idx int, ts_ms bigint, "
        + ("bytes binary, " if include_bytes else "")
        + "w int, h int, phash long"
    )
    return videos.mapInPandas(sample, schema)


def audio_energy_windows(audio: DataFrame, window_ms: int = 50) -> DataFrame:
    """Feature-extract: decode PCM and emit per-window energy (sum of
    squared samples, exact int64), peak (max |sample|) and sample count —
    the canonical cheap audio feature (VAD / silence trim / loudness
    bucketing run on exactly these).

    Windows are fixed-size sample blocks of ``window_ms``; a trailing
    partial window is emitted with its true (smaller) count.  All
    arithmetic is integer, so results are bit-stable against a SQL
    oracle.  Whole-batch vectorized: samples for B clips form one
    (B, n) int64 array; the window reduction is one reshape+sum.
    """

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            frames = []
            # group by (sample_rate, n_samples) so same-shape clips
            # reduce in one vectorized pass (mixed corpora still batch)
            for (sr, ns), grp in pdf.groupby(
                    ["sample_rate", "n_samples"], sort=False):
                sr, ns = int(sr), int(ns)
                win = max(1, (sr * window_ms) // 1000)
                pcm = np.stack([
                    _decode_audio(bytes(b))[0] for b in grp["bytes"]
                ]).astype(np.int64)
                n_win = -(-ns // win)  # ceil
                pad = n_win * win - ns
                if pad:
                    pcm = np.pad(pcm, ((0, 0), (0, pad)))
                blocks = pcm.reshape(len(grp), n_win, win)
                energy = (blocks * blocks).sum(axis=2)
                peak = np.abs(blocks).max(axis=2)
                counts = np.full(n_win, win, dtype=np.int64)
                if pad:
                    counts[-1] = ns - (n_win - 1) * win
                aid = np.repeat(grp["audio_id"].to_numpy(), n_win)
                widx = np.tile(np.arange(n_win, dtype=np.int32), len(grp))
                frames.append(pd.DataFrame({
                    "audio_id": aid,
                    "win_idx": widx,
                    "start_ms": (widx.astype(np.int64) * win * 1000) // sr,
                    "energy": energy.ravel(),
                    "peak": peak.ravel().astype(np.int32),
                    "n": np.tile(counts, len(grp)),
                }))
            yield pd.concat(frames) if frames else pd.DataFrame(
                columns=["audio_id", "win_idx", "start_ms", "energy",
                         "peak", "n"])

    return audio.mapInPandas(
        feat,
        "audio_id string, win_idx int, start_ms bigint, energy bigint, "
        "peak int, n bigint",
    )


def video_near_dupes(
    videos: DataFrame,
    k: int = 4,
    max_hamming: int = 0,
    min_matching_frames: int = 2,
) -> DataFrame:
    """Video-level near-dup pairs: uniform-k frame sample -> the UNCHANGED
    image phash band-join (`images.phash_near_dupes`) on the sampled
    frames -> roll frame matches up to video pairs that share at least
    ``min_matching_frames`` near-identical frames.

    This is the standard scalable video-dedup shape (content-ID systems
    match sampled keyframes, not full streams): per-video cost is k frame
    hashes, the candidate join is the banded phash equi-join — never
    all-pairs over videos — and the rollup is one (video_a, video_b)
    count aggregate.  Returns (video_a, video_b, n_frame_matches) with
    video_a/video_b carrying the input video_id type (string contract;
    pairs are canonicalized by string order).
    """
    from pyspark.sql import functions as F

    from .images import phash_near_dupes

    frames = sample_frames(videos, k, include_bytes=False).select(
        F.concat_ws("#", "video_id", "frame_idx").alias("image_id"),
        "phash",
    )
    pairs = phash_near_dupes(frames, max_hamming=max_hamming)

    # Recover video_id by stripping the LAST '#<digits>' suffix (the
    # frame_idx we appended) — greedy '.*' keeps any '#' inside the id
    # itself.  A frame id that doesn't match (only possible if video_id
    # was NULL, which concat_ws silently drops) fails loudly instead of
    # silently merging/dropping pairs (ADVICE r04).
    def _vid(col: str):
        c = F.col(col)
        return F.when(
            c.rlike(r"^.*#\d+$"), F.regexp_extract(c, r"^(.*)#\d+$", 1)
        ).otherwise(F.raise_error(F.concat(
            F.lit("video_near_dupes: unrecoverable frame id "), c)))

    va, vb = _vid("id_a"), _vid("id_b")
    return (
        pairs
        .select(F.least(va, vb).alias("video_a"),
                F.greatest(va, vb).alias("video_b"))
        .where(F.col("video_a") != F.col("video_b"))
        .groupBy("video_a", "video_b")
        .agg(F.count("*").alias("n_frame_matches"))
        .where(F.col("n_frame_matches") >= min_matching_frames)
    )
