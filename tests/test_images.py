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


@pytest.mark.parametrize("fmt", I.available_codecs())
def test_codec_roundtrip_paths(fmt):
    """Every codec available in THIS environment round-trips through the
    same _encode/_decode seam (r03 verdict #3): the stand-in formats are
    always present and byte-deterministic; when Pillow exists the
    adapter adds png (lossless => PSNR inf) and jpeg (quality 95 =>
    PSNR >= 40 dB on the smooth synthetic gradients). In the jar-less
    sandbox only the stand-ins parametrize — the real-codec rows light
    up wherever PIL is installed, with no code change."""
    px = I._pixels(4217, 48, 40)
    dec = I._decode(I._encode(px, fmt))
    assert dec.shape == px.shape and dec.dtype == np.uint8
    p = I.psnr(px, dec)
    if fmt in ("rgb8", "png"):
        assert p == float("inf")  # lossless
    else:
        assert p >= 40.0, (fmt, p)
    # stand-in encodes stay byte-identical run to run (resume contract)
    if fmt in ("rgb8", "qrgb6"):
        assert I._encode(px, fmt) == I._encode(px, fmt)


def test_unavailable_codec_raises_loudly():
    px = I._pixels(1, 8, 8)
    if "png" not in I.available_codecs():
        with pytest.raises(NotImplementedError):
            I._encode(px, "png")
        # a PNG-signature payload without a decoder must raise, not
        # silently mis-parse as a stand-in header
        with pytest.raises(NotImplementedError):
            I._decode(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(NotImplementedError):
        I._encode(px, "webp")


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


def test_resize_nearest_exact(spark):
    """Nearest-neighbor resize of a lossless image must equal the source
    pixels sampled at the integer-mapped coordinates — exact, no
    interpolation drift — and re-encode with the right header/length."""
    import numpy as np

    from crawler_spark.frontier import images as I

    imgs = I.images_table(spark, 12, w=32, h=32)
    small = I.resize_images(imgs, 8, 8)
    rows = {r["image_id"]: r for r in small.collect()}
    assert len(rows) == 12
    sy = ((np.arange(8) + 0.5) * 32 // 8).astype(int)
    sx = sy
    for iid, r in rows.items():
        assert (r["w"], r["h"]) == (8, 8)
        assert len(r["bytes"]) == 12 + 8 * 8 * 3
        decoded = I._decode(bytes(r["bytes"]))
        src = I._pixels(int(iid), 32, 32)
        want = src[sy[:, None], sx[None, :], :]
        if r["fmt"] == "rgb8":
            assert (decoded == want).all(), iid
        else:  # lossy plane: within quantization step of the source
            assert np.abs(decoded.astype(int) - want.astype(int)).max() <= 2
        assert r["caption"] == I.caption_of(int(iid))


def test_image_features_feed_ann_near_dup(spark):
    """decode -> feature-extract -> the SAME near-dup ANN operator used
    for text embeddings, on the lossless slice (fmt='rgb8', so decode is
    bit-exact and identity is purely pixel identity). Pixels cycle with
    id mod 256, so ids congruent mod 256 have unit-identical features
    (cos exactly 1.0 — found under ANY hyperplane set: identical vectors
    share every band bucket); the deterministic non-identical ceiling on
    this smooth corpus is cos 0.99981, so the 0.9999 threshold admits
    exactly the identity classes, and the min-id representative election
    must map every later class member to the class minimum."""
    from pyspark.sql import functions as F

    from crawler_spark.frontier import images as I
    from crawler_spark.operators.similarity import near_dup_ann

    imgs = I.images_table(spark, 1000, w=32, h=32).where(
        F.col("fmt") == "rgb8")  # ids 0..999 with id % 3 != 0
    feats = I.image_features(imgs).select(
        F.col("image_id").cast("long").alias("vec_id"),
        F.col("embedding"),
    )
    out = near_dup_ann(feats, "vec_id", "embedding", threshold=0.9999,
                       dim=192)
    got = {(r["kept_id"], r["dup_id"]) for r in out.collect()}
    classes: dict[int, list[int]] = {}
    for i in range(1000):
        if i % 3 != 0:
            classes.setdefault(i % 256, []).append(i)
    want = {(c[0], b) for c in classes.values() for b in c[1:]}
    assert got == want, (got - want, want - got)


def test_captions_batch_equals_scalar():
    import numpy as np

    from crawler_spark.frontier.images import _captions_batch, caption_of

    ids = np.array([0, 1, 7, 255, 256, 257, 511, 999, 12345])
    assert _captions_batch(ids) == [caption_of(int(i)) for i in ids]


def test_mixed_dims_table_invariants(spark):
    """images_table_mixed: per-row (w, h) follows mixed_dims_of exactly,
    payload length is 12 + w*h*3 for both codecs, and the PSNR/caption/
    phash invariants hold across every (w, h) group (the grouped Arrow
    batching path that fixed-size tables never exercise)."""
    n = 350
    df = I.images_table_mixed(spark, n).localCheckpoint()
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] \
        == [(f.name, f.dataType.simpleString())
            for f in I.images_table(spark, 1, w=8, h=8).schema.fields]
    rows = {int(r["image_id"]): r for r in df.collect()}
    assert len(rows) == n
    dims = set()
    for i, r in rows.items():
        w, h = I.mixed_dims_of(i)
        assert (r["w"], r["h"]) == (w, h), i
        assert len(r["bytes"]) == 12 + w * h * 3, i
        assert r["fmt"] == ("qrgb6" if i % 3 == 0 else "rgb8"), i
        dims.add((w, h))
    assert len(dims) == 35  # all 5 x 7 (w, h) classes materialize
    v = I.verify_payload(df)
    bad = v.where((F.col("psnr_db") < 40.0) | ~F.col("caption_ok")
                  | ~F.col("phash_ok")).count()
    assert bad == 0


def test_anchor_colors_exact_and_passthrough(spark):
    """anchor_colors: decoded (0,0) pixel matches the arithmetic form
    per codec, passthrough columns survive, bytes is dropped."""
    df = I.images_table_mixed(spark, 60)
    out = I.anchor_colors(df.select("image_id", "fmt", "caption", "bytes"))
    assert out.columns == ["image_id", "fmt", "caption", "r0", "g0", "b0"]
    for r in out.collect():
        i = int(r["image_id"])
        want = [(7 * i) % 256, (13 * i) % 256, i % 256]
        if i % 3 == 0:  # qrgb6 bin centers
            want = [(v // 4) * 4 + 2 for v in want]
        assert [r["r0"], r["g0"], r["b0"]] == want, i
        assert r["caption"] == I.caption_of(i)


def test_aspect_bucket_argmin_matches_bruteforce(spark):
    from crawler_spark.plans.image_queries import (
        _AB_BUCKETS, _MIN_SIDE, image_aspect_buckets,
    )
    got = {int(r["image_id"]): r["bucket_idx"]
           for r in image_aspect_buckets(
               spark, "/root/testdata/sf0.001").collect()}
    assert got  # gate keeps a non-trivial subset
    for i, b in got.items():
        w, h = I.mixed_dims_of(i)
        assert min(w, h) >= _MIN_SIDE and 2 * w >= h and 2 * h >= w
        scores = [abs(w * bh - h * bw) * (12 // bh)
                  for (bw, bh) in _AB_BUCKETS]
        assert b == scores.index(min(scores)), (i, w, h, scores)
    # exact-aspect pins: 1:2, 3:4, 1:1, 4:3, 2:1 all materialize
    pinned = {(16, 32): 0, (24, 32): 1, (32, 32): 2, (32, 24): 3,
              (48, 24): 4}
    seen = {}
    for i, b in got.items():
        seen[I.mixed_dims_of(i)] = b
    for dims, want in pinned.items():
        if dims in seen:
            assert seen[dims] == want, dims
