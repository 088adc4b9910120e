"""Partitioned Bloom-filter URL-seen sidecars (SURVEY.md D1, §4.3(1)).

The reference keeps one in-process ``pybloom_live.BloomFilter(eps=0.001,
cap=1e6)`` per worker (worker.py:241) — volatile, unshared, and it DROPS
false positives (a URL can be wrongly skipped). This rebuild keeps the
bloom as a pure *pre-filter* in front of the exact anti-join, so:

- no false negatives are possible by construction (bloom-miss => definitely
  never enqueued => bypasses the anti-join shuffle entirely);
- bloom-hit rows (true dups + ~fpp false positives) still go through the
  exact ``left_anti`` join vs `seen`, so correctness is bit-identical to
  the exact-dedupe spec;
- the filter is partitioned into host-hash buckets stored as packed-bit
  .npy sidecar files next to the seen table. At 10^10 URLs / 1% fpp the
  full filter is ~12 GB — per-bucket files mean an executor task only
  loads the buckets its rows actually touch (with the frontier's
  bucket(host_hash) layout that is ~1 file per task), cached per process.

Hashing: h1 = xxhash64(url), h2 = xxhash64(url, GOLDEN) computed JVM-side
(vectorized, codegen), then k probe positions via enhanced double hashing
h_i = h1 + i*h2 (mod m) in numpy inside an Arrow-batched mapInPandas — no
per-row Python.
"""

from __future__ import annotations

import json
import math
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GOLDEN = 0x9E3779B9  # second-hash salt column


def _params(capacity: int, fpp: float) -> tuple[int, int]:
    """Optimal (m_bits, k) for target capacity/fpp, m rounded to 64."""
    m = max(64, int(-capacity * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 63) // 64 * 64
    k = max(1, round(m / max(capacity, 1) * math.log(2)))
    return m, k


def _probe(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> Iterator[np.ndarray]:
    """Yield k probe bit-positions per row (uint64 wraparound arithmetic)."""
    u1 = h1.astype(np.int64).view(np.uint64)
    u2 = h2.astype(np.int64).view(np.uint64)
    for i in range(k):
        yield ((u1 + np.uint64(i) * u2) % np.uint64(m)).astype(np.int64)


class BloomSeen:
    """A built sidecar: directory of per-bucket packed-bit arrays."""

    def __init__(self, path: str, n_buckets: int, m_bits: int, k: int):
        self.path = path
        self.n_buckets = n_buckets
        self.m_bits = m_bits
        self.k = k

    # ---- build ----------------------------------------------------------

    @staticmethod
    def build(
        seen: DataFrame,
        path: str,
        capacity_per_bucket: int,
        n_buckets: int = 64,
        fpp: float = 0.01,
        url_col: str = "url",
    ) -> "BloomSeen":
        """Build bucket files from the seen table with one groupBy-bucket
        pass (applyInPandas); rebuilt incrementally per round in practice
        (only buckets with new URLs change)."""
        m, k = _params(capacity_per_bucket, fpp)
        os.makedirs(path, exist_ok=True)
        # persist the geometry NEXT TO the bucket files: a later open()
        # must probe with the exact (m, k, n_buckets) the bits were
        # written with — re-deriving them from possibly-different caller
        # args would silently produce false negatives.
        tmp = os.path.join(path, "params.json.tmp")
        with open(tmp, "w") as fh:
            json.dump({"m_bits": m, "k": k, "n_buckets": n_buckets,
                       "capacity_per_bucket": capacity_per_bucket,
                       "fpp": fpp}, fh)
        os.replace(tmp, os.path.join(path, "params.json"))

        hashed = seen.select(
            F.xxhash64(url_col).alias("h1"),
            F.xxhash64(url_col, F.lit(GOLDEN)).alias("h2"),
        ).withColumn("bucket", F.pmod(F.col("h1"), F.lit(n_buckets)).cast("int"))

        def write_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(pdf["bucket"].iloc[0])
            bits = np.zeros(m // 64, dtype=np.uint64)
            h1 = pdf["h1"].to_numpy()
            h2 = pdf["h2"].to_numpy()
            for pos in _probe(h1, h2, k, m):
                np.bitwise_or.at(
                    bits, pos // 64, np.uint64(1) << (pos.view(np.uint64) % np.uint64(64))
                )
            tmp = os.path.join(path, f"bucket_{b:05d}.npy.tmp")
            with open(tmp, "wb") as fh:  # np.save(path) would append .npy
                np.save(fh, bits)
            os.replace(tmp, os.path.join(path, f"bucket_{b:05d}.npy"))
            return pd.DataFrame({"bucket": [b], "n": [len(pdf)]})

        (
            hashed.groupBy("bucket")
            .applyInPandas(write_bucket, "bucket int, n long")
            .count()  # force materialization of every bucket write
        )
        return BloomSeen(path, n_buckets, m, k)

    @staticmethod
    def open(path: str, capacity_per_bucket: int, n_buckets: int = 64,
             fpp: float = 0.01) -> "BloomSeen":
        """Handle to an existing sidecar directory. The PERSISTED geometry
        (params.json written by build) wins over the caller's arguments —
        a resume with different capacity/buckets would otherwise probe
        the stored bits at the wrong positions (silent false negatives).
        Falls back to deriving from the arguments only for pre-params
        sidecars."""
        pfile = os.path.join(path, "params.json")
        if os.path.exists(pfile):
            with open(pfile) as fh:
                p = json.load(fh)
            return BloomSeen(path, int(p["n_buckets"]),
                             int(p["m_bits"]), int(p["k"]))
        m, k = _params(capacity_per_bucket, fpp)
        return BloomSeen(path, n_buckets, m, k)

    # ---- incremental update --------------------------------------------

    def update(self, new_urls: DataFrame, url_col: str = "url") -> "BloomSeen":
        """Incremental sidecar maintenance: OR the new URLs' bits into the
        EXISTING bucket files, touching only buckets that actually receive
        new URLs. This is the per-round production path — at 10^10 seen
        URLs a round's discoveries hit a handful of buckets, so the
        full-rebuild (``build``) cost is paid once, not per round.

        Same probe family and pmod bucketing as build/with_flag, so the
        result is bit-identical to rebuilding from seen ∪ new (asserted in
        tests/test_bloom.py). Returns self (files mutated via atomic
        rename)."""
        path, n_buckets, m, k = self.path, self.n_buckets, self.m_bits, self.k

        hashed = new_urls.select(
            F.xxhash64(url_col).alias("h1"),
            F.xxhash64(url_col, F.lit(GOLDEN)).alias("h2"),
        ).withColumn("bucket", F.pmod(F.col("h1"), F.lit(n_buckets)).cast("int"))

        def or_into_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(pdf["bucket"].iloc[0])
            f = os.path.join(path, f"bucket_{b:05d}.npy")
            bits = np.load(f) if os.path.exists(f) else np.zeros(m // 64, dtype=np.uint64)
            h1 = pdf["h1"].to_numpy()
            h2 = pdf["h2"].to_numpy()
            for pos in _probe(h1, h2, k, m):
                np.bitwise_or.at(
                    bits, pos // 64, np.uint64(1) << (pos.view(np.uint64) % np.uint64(64))
                )
            tmp = f + ".tmp"
            with open(tmp, "wb") as fh:
                np.save(fh, bits)
            os.replace(tmp, f)
            return pd.DataFrame({"bucket": [b], "n": [len(pdf)]})

        (
            hashed.groupBy("bucket")
            .applyInPandas(or_into_bucket, "bucket int, n long")
            .count()
        )
        return self

    # ---- probe ----------------------------------------------------------

    def with_flag(self, df: DataFrame, url_col: str = "url",
                  flag: str = "bloom_maybe") -> DataFrame:
        """Append ``flag``: True when the bloom says maybe-seen. Bucket
        files load lazily per executor process and are memo-cached."""
        path, n_buckets, m, k = self.path, self.n_buckets, self.m_bits, self.k
        in_schema = df.schema
        out_schema = (
            ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema)
            + f", {flag} boolean"
        )
        # bucket id computed with the SAME Spark pmod as the build side —
        # signed-modulo semantics must match or probes hit the wrong file.
        hashed = (
            df.withColumn("__h1", F.xxhash64(url_col))
            .withColumn("__h2", F.xxhash64(url_col, F.lit(GOLDEN)))
            .withColumn("__b", F.pmod(F.col("__h1"), F.lit(n_buckets)).cast("int"))
        )

        def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cache: dict[int, np.ndarray] = {}

            def bucket_bits(b: int) -> np.ndarray | None:
                if b not in cache:
                    f = os.path.join(path, f"bucket_{b:05d}.npy")
                    cache[b] = np.load(f) if os.path.exists(f) else None
                return cache[b]

            for pdf in batches:
                h1 = pdf["__h1"].to_numpy()
                h2 = pdf["__h2"].to_numpy()
                buckets = pdf["__b"].to_numpy()
                maybe = np.zeros(len(pdf), dtype=bool)
                for b in np.unique(buckets):
                    sel = buckets == b
                    bits = bucket_bits(int(b))
                    if bits is None:
                        continue  # empty bucket: definitely unseen
                    hit = np.ones(sel.sum(), dtype=bool)
                    for pos in _probe(h1[sel], h2[sel], k, m):
                        word = bits[pos // 64]
                        bit = (word >> (pos.view(np.uint64) % np.uint64(64))) & np.uint64(1)
                        hit &= bit.astype(bool)
                    maybe[sel] = hit
                out = pdf.drop(columns=["__h1", "__h2", "__b"])
                out[flag] = maybe
                yield out

        return hashed.mapInPandas(check, out_schema)

    def filter_new(self, df: DataFrame, seen: DataFrame,
                   url_col: str = "url") -> DataFrame:
        """Exact first-discovery-wins dedupe with the bloom as shuffle
        saver: bloom-miss rows bypass the anti-join; bloom-hit rows get the
        exact check. Result == plain ``df.join(seen, 'left_anti')``."""
        flagged = self.with_flag(df, url_col)
        definitely_new = flagged.where(~F.col("bloom_maybe")).drop("bloom_maybe")
        maybe = flagged.where(F.col("bloom_maybe")).drop("bloom_maybe")
        return definitely_new.unionByName(
            maybe.join(seen.select(F.col(url_col)), url_col, "left_anti")
        )
