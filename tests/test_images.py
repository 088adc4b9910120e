"""Image payload invariants (BASELINE input_hint): schema, PSNR >= 40 dB
for lossy, bit-exact for lossless, caption equality, phash near-dup op."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.frontier import images as I

N = 300


@pytest.fixture(scope="module")
def imgs(spark):
    df = I.images_table(spark, N, w=32, h=32).localCheckpoint()
    return df


def test_schema_matches_input_hint(imgs):
    assert [(f.name, f.dataType.simpleString()) for f in imgs.schema.fields] == [
        ("image_id", "string"), ("bytes", "binary"), ("w", "int"),
        ("h", "int"), ("fmt", "string"), ("caption", "string"),
        ("phash", "bigint"),
    ]
    assert imgs.count() == N


def test_psnr_and_caption_invariant(imgs):
    v = I.verify_payload(imgs).localCheckpoint()
    assert v.count() == N
    bad = v.where(
        (F.col("psnr_db") < 40.0) | ~F.col("caption_ok") | ~F.col("phash_ok")
    ).count()
    assert bad == 0
    # lossless rows decode bit-exact (psnr capped at 99 = inf marker)
    lossless = v.where(F.col("fmt") == "rgb8")
    assert lossless.where(F.col("psnr_db") < 99.0).count() == 0
    # lossy rows are genuinely lossy but >= 40 dB
    lossy = v.where(F.col("fmt") == "qrgb6")
    assert lossy.count() > 0
    assert lossy.where(F.col("psnr_db") >= 99.0).count() == 0


def test_batch_forms_bit_identical_to_scalar():
    """The whole-batch vectorized pixel/phash forms must match the scalar
    definitions bit-for-bit (stored phashes + near-dup joins depend on it)."""
    ids = np.array([0, 1, 7, 256, 4095], dtype=np.int64)
    bpx = I._pixels_batch(ids, 32, 32)
    bph = I._phash_batch(bpx)
    for j, i in enumerate(ids):
        spx = I._pixels(int(i), 32, 32)
        assert np.array_equal(bpx[j], spx), i
        assert int(bph[j]) == I._phash(spx), i


def test_quantizer_psnr_math():
    px = I._pixels(7, 64, 64)
    dec = I._decode(I._encode(px, "qrgb6"))
    p = I.psnr(px, dec)
    assert 40.0 <= p < 60.0


def test_phash_near_dupes_finds_self_similar(spark, imgs):
    """Images whose ids differ by 256 have identical pixel formulas mod 256
    in two channels — near-identical phash -> the banded LSH join finds
    them without a cross join."""
    pairs = I.phash_near_dupes(imgs, max_hamming=6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # ids p and p+256 share r,g channels mod 256 -> tiny hamming distance;
    # with 8x8-bit bands, EVERY pair at distance <= 6 is guaranteed found
    # (pigeonhole: <= 7 differing bits cannot touch all 8 bands).
    expected_some = 0
    for p in range(0, N - 256):
        a = I._phash(I._pixels(p, 32, 32)) & (2**64 - 1)
        b = I._phash(I._pixels(p + 256, 32, 32)) & (2**64 - 1)
        if bin(a ^ b).count("1") <= 6:
            expected_some += 1
            key = tuple(sorted((str(p), str(p + 256))))
            assert key in got or (key[1], key[0]) in got
    assert expected_some > 0
