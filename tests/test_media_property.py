"""Property-based media-container tests (hypothesis): round-trip
exactness and windowing invariants over arbitrary shapes. Pure-Python on
the batch kernels — the mapInPandas operators are the same functions
batched (test_media proves that)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from crawler_spark.frontier import media as M
from crawler_spark.frontier.images import _pixels_batch


@settings(max_examples=40, deadline=None)
@given(
    vid=st.integers(min_value=0, max_value=2**31),
    w=st.integers(min_value=1, max_value=48),
    h=st.integers(min_value=1, max_value=48),
    n_frames=st.integers(min_value=1, max_value=30),
    fps=st.integers(min_value=1, max_value=120),
)
def test_video_container_roundtrip_any_shape(vid, w, h, n_frames, fps):
    seeds = vid * M.FRAME_STRIDE + np.arange(n_frames, dtype=np.int64)
    px = _pixels_batch(seeds, w, h)
    buf = (M.VIDEO_HEADER.pack(M.MAGIC_VIDEO, w, h, n_frames, fps, 0)
           + px.tobytes())
    frames, got_fps = M._decode_video(buf)
    assert got_fps == fps and frames.shape == (n_frames, h, w, 3)
    assert np.array_equal(frames, px)


@settings(max_examples=40, deadline=None)
@given(
    aid=st.integers(min_value=0, max_value=2**31),
    sr=st.integers(min_value=1, max_value=96_000),
    ns=st.integers(min_value=1, max_value=5_000),
)
def test_audio_container_roundtrip_any_shape(aid, sr, ns):
    pcm = M._pcm_batch(np.array([aid]), ns)[0]
    buf = M.AUDIO_HEADER.pack(M.MAGIC_AUDIO, sr, ns, 0) + pcm.tobytes()
    got, got_sr = M._decode_audio(buf)
    assert got_sr == sr
    assert np.array_equal(got, pcm)
    # every sample within int16 and equal to the SQL-side definition
    t = np.arange(ns, dtype=np.int64)
    want = ((aid * M._PCM_A + t * M._PCM_T) % 65536) - 32768
    assert np.array_equal(got.astype(np.int64), want)


@settings(max_examples=30, deadline=None)
@given(
    k=st.integers(min_value=1, max_value=32),
    n_frames=st.integers(min_value=1, max_value=64),
)
def test_uniform_k_index_invariants(k, n_frames):
    """The sampling rule floor(j*n/k) is sorted, in-range, starts at
    frame 0 and after dedup has min(k, n_frames) indices."""
    idx = np.unique((np.arange(k, dtype=np.int64) * n_frames) // k)
    assert idx[0] == 0
    assert idx[-1] < n_frames
    assert len(idx) == min(k, n_frames)
    assert np.all(np.diff(idx) > 0)


@settings(max_examples=40, deadline=None)
@given(
    sr=st.integers(min_value=100, max_value=48_000),
    ns=st.integers(min_value=1, max_value=4_000),
    window_ms=st.integers(min_value=1, max_value=1_000),
)
def test_window_partitioning_invariants(sr, ns, window_ms):
    """Window counts always cover every sample exactly once (full
    windows of sr*window_ms//1000 samples + at most one partial)."""
    win = max(1, (sr * window_ms) // 1000)
    n_win = -(-ns // win)
    counts = [win] * n_win
    if n_win * win > ns:
        counts[-1] = ns - (n_win - 1) * win
    assert sum(counts) == ns
    assert all(1 <= c <= win for c in counts)
