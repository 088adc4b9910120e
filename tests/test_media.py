"""Video/audio payload invariants (the non-image multimodal legs):
container round-trip, uniform-k frame sampling vs the direct pixel
reference, sampled frames feeding the EXISTING image operators, and
integer-exact windowed audio features incl. the trailing partial window.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.frontier import images as I
from crawler_spark.frontier import media as M

NV, NA = 60, 60


@pytest.fixture(scope="module")
def vids(spark):
    return M.videos_table(spark, NV, w=32, h=32, n_frames=12,
                          fps=24).localCheckpoint()


@pytest.fixture(scope="module")
def clips(spark):
    return M.audio_table(spark, NA, sample_rate=8000,
                         n_samples=950).localCheckpoint()


def test_video_schema_and_metadata(vids):
    assert [(f.name, f.dataType.simpleString()) for f in vids.schema.fields] == [
        ("video_id", "string"), ("bytes", "binary"), ("w", "int"),
        ("h", "int"), ("n_frames", "int"), ("fps", "int"),
        ("fmt", "string"), ("duration_ms", "bigint"),
    ]
    row = vids.filter(F.col("video_id") == "7").first()
    assert (row.n_frames, row.fps, row.duration_ms) == (12, 24, 500)
    # payload = header + n_frames raw RGB24 frames, exactly
    assert len(row.bytes) == M.VIDEO_HEADER.size + 12 * 32 * 32 * 3


def test_video_container_roundtrip(vids):
    row = vids.filter(F.col("video_id") == "5").first()
    frames, fps = M._decode_video(bytes(row.bytes))
    assert frames.shape == (12, 32, 32, 3) and fps == 24
    for j in (0, 3, 11):  # frame j == the pixel field of its seed
        want = I._pixels(5 * M.FRAME_STRIDE + j, 32, 32)
        assert np.array_equal(frames[j], want)


def test_unknown_container_raises():
    with pytest.raises(NotImplementedError):
        M._decode_video(b"MOOV" + b"\0" * 64)
    with pytest.raises(NotImplementedError):
        M._decode_audio(b"OGGS" + b"\0" * 64)


def test_sample_frames_uniform_k(spark, vids):
    out = M.sample_frames(vids, k=4).localCheckpoint()
    pdf = out.toPandas()
    assert len(pdf) == NV * 4
    # uniform-k indices over 12 frames are {0,3,6,9}; ts at 24 fps
    got = sorted(pdf[pdf.video_id == "3"].frame_idx)
    assert got == [0, 3, 6, 9]
    ts = dict(zip(pdf[pdf.video_id == "3"].frame_idx,
                  pdf[pdf.video_id == "3"].ts_ms))
    assert ts == {0: 0, 3: 125, 6: 250, 9: 375}
    # each emitted frame is a valid standalone image payload whose pixels
    # and phash match the seed's reference values
    r = pdf[(pdf.video_id == "3") & (pdf.frame_idx == 6)].iloc[0]
    px = I._decode(bytes(r["bytes"]))
    want = I._pixels(3 * M.FRAME_STRIDE + 6, 32, 32)
    assert np.array_equal(px, want)
    assert int(r["phash"]) == I._phash(want)


def test_sample_frames_k_exceeding_n_frames(spark):
    few = M.videos_table(spark, 4, n_frames=3, fps=10)
    pdf = M.sample_frames(few, k=8).toPandas()
    # indices floor(j*3/8) dedupe to {0,1,2}
    assert sorted(pdf[pdf.video_id == "1"].frame_idx) == [0, 1, 2]


def test_sampled_frames_feed_image_phash_operator(spark, vids):
    """The video->image bridge: sampled frames run through the UNCHANGED
    image near-dup operator.  phash(frame) depends only on its seed
    (v*FRAME_STRIDE + j) mod 256, so sampled frames whose seeds agree
    mod 256 are exact phash duplicates — the operator's hamming<=0 pairs
    must equal the brute-force equal-phash pairs over the corpus."""
    frames = M.sample_frames(vids, k=4).select(
        F.concat_ws("_", "video_id", "frame_idx").alias("image_id"),
        "phash")
    pairs = I.phash_near_dupes(frames, max_hamming=0).toPandas()
    # reference: brute force over the small corpus
    pdf = M.sample_frames(vids, k=4).select(
        "video_id", "frame_idx", "phash").toPandas()
    ph = {f"{r.video_id}_{r.frame_idx}": int(r.phash)
          for r in pdf.itertuples(index=False)}
    want = {tuple(sorted((a, b)))
            for a in ph for b in ph if a < b and ph[a] == ph[b]}
    got = {tuple(sorted((r.id_a, r.id_b)))
           for r in pairs.itertuples(index=False)}
    assert got == want and len(want) > 0


def test_audio_schema_and_roundtrip(clips):
    assert [(f.name, f.dataType.simpleString()) for f in clips.schema.fields] == [
        ("audio_id", "string"), ("bytes", "binary"), ("sample_rate", "int"),
        ("n_samples", "int"), ("fmt", "string"), ("duration_ms", "bigint"),
    ]
    row = clips.filter(F.col("audio_id") == "9").first()
    assert row.duration_ms == (950 * 1000) // 8000
    pcm, sr = M._decode_audio(bytes(row.bytes))
    assert sr == 8000 and pcm.shape == (950,)
    assert np.array_equal(pcm, M._pcm_batch(np.array([9]), 950)[0])


def test_audio_energy_windows_exact(spark, clips):
    """Windowed energy/peak vs a pure-numpy reference, including the
    trailing PARTIAL window (950 = 2*400 + 150 at window_ms=50)."""
    out = M.audio_energy_windows(clips, window_ms=50).toPandas()
    assert set(out.columns) == {"audio_id", "win_idx", "start_ms",
                                "energy", "peak", "n"}
    assert len(out) == NA * 3
    pcm = M._pcm_batch(np.arange(NA), 950).astype(np.int64)
    for aid in (0, 17, NA - 1):
        sub = out[out.audio_id == str(aid)].sort_values("win_idx")
        assert list(sub.win_idx) == [0, 1, 2]
        assert list(sub.start_ms) == [0, 50, 100]
        assert list(sub.n) == [400, 400, 150]
        for wi, (lo, hi) in enumerate([(0, 400), (400, 800), (800, 950)]):
            seg = pcm[aid, lo:hi]
            row = sub[sub.win_idx == wi].iloc[0]
            assert int(row.energy) == int((seg * seg).sum())
            assert int(row.peak) == int(np.abs(seg).max())


def test_empty_partition_batches(spark):
    """More partitions than rows -> empty Arrow batches must not break
    the media UDFs (repo-wide empty-batch guard convention)."""
    vids = M.videos_table(spark, 3, partitions=8)
    assert M.sample_frames(vids, k=2).count() == 6
    clips = M.audio_table(spark, 3, n_samples=800, partitions=8)
    assert M.audio_energy_windows(clips, window_ms=50).count() == 6


def test_video_near_dupes_rollup(spark):
    """Video pairs sharing >=2 equal-phash sampled frames, vs a
    numpy brute force. Videos v and v+256 share ALL sampled frames
    (seeds differ by 256*1009 == 0 mod 256), so with 300 videos the
    result is non-empty by construction."""
    n = 300
    vids = M.videos_table(spark, n, n_frames=12, fps=24)
    # the operator canonicalizes pairs by STRING id order (its contract);
    # normalize both sides to numeric-sorted unordered pairs
    got = {tuple(sorted((int(r.video_a), int(r.video_b)))):
           int(r.n_frame_matches)
           for r in M.video_near_dupes(vids, k=4, max_hamming=0,
                                       min_matching_frames=2).collect()}
    # brute force over the phash vocabulary
    idx = [0, 3, 6, 9]
    ph = {(v, i): I._phash(I._pixels((v * M.FRAME_STRIDE + i) % 256,
                                     32, 32))
          for v in range(n) for i in idx}
    want: dict[tuple[int, int], int] = {}
    for va in range(n):
        for vb in range(va + 1, n):
            m = sum(1 for i in idx for j in idx
                    if ph[(va, i)] == ph[(vb, j)])
            if m >= 2:
                want[(va, vb)] = m
    assert got == want
    assert any(v == 4 for v in got.values())  # the v/v+256 full dups


def test_video_near_dupes_string_ids_with_hash(spark):
    """ADVICE r04: video_id is a STRING contract — ids containing '#'
    (the internal frame-key separator) must round-trip exactly, not
    silently cast to NULL and merge/drop pairs."""
    from pyspark.sql import functions as F

    vids = M.videos_table(spark, 280, n_frames=12, fps=24).withColumn(
        "video_id", F.concat(F.lit("v#id#"), F.col("video_id")))
    rows = M.video_near_dupes(vids, k=4, max_hamming=0,
                              min_matching_frames=2).collect()
    assert rows, "v/v+256 planted dups must survive string ids"
    for r in rows:
        assert r.video_a.startswith("v#id#") and r.video_b.startswith("v#id#")
        # exact inverse of the planted naming: suffix is the numeric id
        int(r.video_a[len("v#id#"):]), int(r.video_b[len("v#id#"):])


def test_sample_frames_hash_only_matches_full(spark):
    """include_bytes=False must agree with the full output on every
    non-bytes column (it is the same sampling/phash pass minus the
    payload re-encode the near-dup rollup never reads)."""
    from crawler_spark.frontier.media import sample_frames, videos_table

    vids = videos_table(spark, 40).localCheckpoint()
    full = sample_frames(vids, 4).drop("bytes")
    lean = sample_frames(vids, 4, include_bytes=False)
    assert lean.columns == full.columns
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, lean.collect()))
    assert a == b and len(a) > 0
