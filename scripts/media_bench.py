"""Media operator throughput probe (BENCH.md evidence).

Measures the two media operators over checkpointed payload tables (input
materialized first, so the timing is the operator, not the synth — the
analogue of reading payloads from storage):

* sample_frames: N videos x 12 frames of 32x32 RGB24 (~36.9 KB/row),
  uniform k=4 -> frames/s out and payload MB/s in;
* audio_energy_windows: M clips x 2000 int16 samples (~4 KB/row),
  50 ms windows -> windows/s and payload MB/s in.

Both plans are Range -> MapInPandas -> (count) — zero shuffles; the probe
exists to show payload-bound scaling, and accepts a cores argument so the
same job can be run at two parallelism levels.

Usage: python scripts/media_bench.py [cores] [n_videos] [n_clips]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.frontier import media as M  # noqa: E402
from crawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_videos = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n_clips = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
    spark = get_spark("media_bench", cores=cores)

    vids = M.videos_table(spark, n_videos).localCheckpoint(eager=True)
    video_bytes = M.VIDEO_HEADER.size + 12 * 32 * 32 * 3
    # warm-up must span EVERY partition: each local task slot forks its
    # own python daemon worker, and a single-partition warm-up leaves the
    # other workers paying numpy/pandas import inside the timed run
    M.sample_frames(M.videos_table(spark, cores * 64), k=4).count()
    best = None
    for _ in range(2):
        t0 = time.time()
        n_frames = M.sample_frames(vids, k=4).count()
        best = min(best or 1e9, time.time() - t0)
    video = {
        "n_videos": n_videos, "n_frames_out": n_frames, "sec": round(best, 3),
        "frames_per_sec": round(n_frames / best),
        "payload_mb_per_sec": round(n_videos * video_bytes / best / 1e6),
    }

    clips = M.audio_table(spark, n_clips).localCheckpoint(eager=True)
    clip_bytes = M.AUDIO_HEADER.size + 2 * 2000
    M.audio_energy_windows(M.audio_table(spark, cores * 256)).count()
    best = None
    for _ in range(2):
        t0 = time.time()
        n_win = M.audio_energy_windows(clips).count()
        best = min(best or 1e9, time.time() - t0)
    audio = {
        "n_clips": n_clips, "n_windows_out": n_win, "sec": round(best, 3),
        "windows_per_sec": round(n_win / best),
        "payload_mb_per_sec": round(n_clips * clip_bytes / best / 1e6),
    }

    print(json.dumps({"cores": cores, "video": video, "audio": audio,
                      "loadavg_1m": round(os.getloadavg()[0], 1)}))


if __name__ == "__main__":
    main()
