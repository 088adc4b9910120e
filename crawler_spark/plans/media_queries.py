"""Video frame-sampling and audio feature-extraction driver queries.

Both are FULL value oracles (not rows-only) despite running through
binary payloads and mapInPandas decode:

* video: frame pixels are ``images._pixels(video_id * FRAME_STRIDE +
  frame_idx)`` and the pixel field is linear in the seed mod 256, so
  every sampled frame's phash comes from the same 256-entry VALUES
  vocabulary the image phash oracle uses — the oracle restates uniform-k
  index selection, timestamps and payload sizes as pure integer
  arithmetic and joins the phash table on ``seed % 256``.  A wrong
  container layout, decode, sampling rule or phash kernel all surface as
  value-hash mismatches.
* audio: the stand-in waveform is integer modular arithmetic
  (media.py), so DuckDB recomputes every int16 sample exactly and
  aggregates the same windowed energy/peak — a full end-to-end check of
  encode -> binary column -> decode -> vectorized window reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .crawl_queries import _phash_values_sql
from .registry import register
from ..sources.testdata import load_table

# fixed query-shape constants (mirrored literally in the oracle SQL)
_V_CAP, _V_FRAMES, _V_FPS, _V_K = 400, 12, 24, 4
_A_CAP, _A_SR, _A_NSAMP, _A_WINMS = 300, 8000, 2000, 50
_A_WIN = (_A_SR * _A_WINMS) // 1000  # 400 samples/window


@register(
    "video_frame_sample",
    oracle=f"""
    WITH ph(pid, ph) AS (VALUES {{values}}),
    nn AS (SELECT LEAST(COUNT(*), {_V_CAP}) AS n FROM documents),
    vids AS (
      SELECT r.range AS vid FROM range(0, {_V_CAP}) r
      WHERE r.range < (SELECT n FROM nn)
    ),
    frames AS (
      SELECT vid, (j.range * {_V_FRAMES}) // {_V_K} AS frame_idx
      FROM vids, range(0, {_V_K}) j
    )
    SELECT CAST(vid AS BIGINT) AS video_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST((frame_idx * 1000) // {_V_FPS} AS BIGINT) AS ts_ms,
           p.ph AS phash,
           CAST(12 + 32 * 32 * 3 AS BIGINT) AS payload_bytes
    FROM frames f
    JOIN ph p ON (f.vid * 1009 + f.frame_idx) % 256 = p.pid
    """.format(values=_phash_values_sql()),
)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-k temporal frame sampling out of a binary video container
    (multimodal brief: frame-sample as a Pandas-UDF mapInPandas stage).
    Sampled frames are standalone image payloads feeding the existing
    phash/feature operators — checked here via phash + payload size."""
    from ..frontier import media as M

    n = min(load_table(spark, sf_dir, "documents").count(), _V_CAP)
    vids = M.videos_table(spark, n, n_frames=_V_FRAMES, fps=_V_FPS)
    frames = M.sample_frames(vids, k=_V_K)
    return frames.select(
        F.col("video_id").cast("long").alias("video_id"),
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.col("ts_ms").cast("long").alias("ts_ms"),
        "phash",
        F.length("bytes").cast("long").alias("payload_bytes"),
    )


@register(
    "audio_energy_windows",
    oracle=f"""
    WITH nn AS (SELECT LEAST(COUNT(*), {_A_CAP}) AS n FROM documents),
    clips AS (
      SELECT r.range AS aid FROM range(0, {_A_CAP}) r
      WHERE r.range < (SELECT n FROM nn)
    ),
    smp AS (
      SELECT aid, t.range AS t,
             ((aid * 2654435761 + t.range * 40503) % 65536) - 32768 AS s
      FROM clips, range(0, {_A_NSAMP}) t
    ),
    win AS (SELECT aid, t // {_A_WIN} AS win_idx, s FROM smp)
    SELECT CAST(aid AS BIGINT) AS audio_id,
           CAST(win_idx AS INT) AS win_idx,
           CAST((win_idx * {_A_WIN} * 1000) // {_A_SR} AS BIGINT)
             AS start_ms,
           CAST(SUM(s * s) AS BIGINT) AS energy,
           CAST(MAX(ABS(s)) AS INT) AS peak,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM win GROUP BY aid, win_idx
    """,
)
def audio_energy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM16 binary payload -> decode -> vectorized per-window energy /
    peak features (multimodal brief: audio feature-extract).  DuckDB
    recomputes every sample from the integer waveform definition."""
    from ..frontier import media as M

    n = min(load_table(spark, sf_dir, "documents").count(), _A_CAP)
    clips = M.audio_table(spark, n, sample_rate=_A_SR, n_samples=_A_NSAMP)
    feats = M.audio_energy_windows(clips, window_ms=_A_WINMS)
    return feats.select(
        F.col("audio_id").cast("long").alias("audio_id"),
        "win_idx", "start_ms", "energy", "peak", "n",
    )


@register(
    "video_near_dup",
    oracle=f"""
    WITH ph(pid, ph) AS (VALUES {{values}}),
    nn AS (SELECT LEAST(COUNT(*), {_V_CAP}) AS n FROM documents),
    vids AS (
      SELECT r.range AS vid FROM range(0, {_V_CAP}) r
      WHERE r.range < (SELECT n FROM nn)
    ),
    frames AS (
      SELECT vid, (j.range * {_V_FRAMES}) // {_V_K} AS fi
      FROM vids, range(0, {_V_K}) j
    ),
    fph AS (
      SELECT vid, fi, p.ph
      FROM frames f JOIN ph p ON (f.vid * 1009 + f.fi) % 256 = p.pid
    ),
    m AS (
      SELECT a.vid AS va, b.vid AS vb, COUNT(*) AS nm
      FROM fph a JOIN fph b ON a.ph = b.ph AND a.vid < b.vid
      GROUP BY a.vid, b.vid
    )
    SELECT CAST(va AS BIGINT) AS video_a, CAST(vb AS BIGINT) AS video_b,
           CAST(nm AS BIGINT) AS n_frame_matches
    FROM m WHERE nm >= 2
    """.format(values=_phash_values_sql()),
)
def video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed video-dedup chain (sample -> banded phash join -> video
    rollup) vs a brute-force equal-phash oracle over the period-256
    vocabulary.  Demoted tail query: each stage is driver-proven by
    video_frame_sample + image_phash_near_dup."""
    from ..frontier import media as M

    n = min(load_table(spark, sf_dir, "documents").count(), _V_CAP)
    vids = M.videos_table(spark, n, n_frames=_V_FRAMES, fps=_V_FPS)
    dupes = M.video_near_dupes(vids, k=_V_K, max_hamming=0,
                               min_matching_frames=2)
    # The operator canonicalizes pairs by STRING order (its video_id
    # contract); this table's ids are numeric, so re-canonicalize by
    # numeric order to match the oracle's a.vid < b.vid ("10" < "9" as
    # strings).  Each unordered pair is one row either way, so the
    # rollup counts are unaffected.
    a = F.col("video_a").cast("long")
    b = F.col("video_b").cast("long")
    return dupes.select(
        F.least(a, b).alias("video_a"),
        F.greatest(a, b).alias("video_b"),
        "n_frame_matches",
    )
