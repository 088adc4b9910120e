"""Image+caption payload table (BASELINE input_hint):

    images(image_id string, bytes binary, w int, h int, fmt string,
           caption string, phash long)

The reference stores raw image bytes as sha256-named files mirrored to S3
(file_storage.py:279-293, worker.py:159-165); here the content store IS a
table with a BinaryType column — no side files.

Codec note: no image library (Pillow/ffmpeg) ships in this container, so
the codec layer is a deterministic stand-in with REAL Spark plumbing
(SURVEY.md input-hint contract; multimodal-stub pattern):

- pixels are a pure function of (image_id, x, y) — no RNG, reproducible on
  any executor;
- fmt='rgb8'  : lossless — raw RGB24 after a 12-byte header; decode is
  bit-exact;
- fmt='qrgb6' : "lossy" — channels uniformly quantized to 6 bits
  (step 4 -> MSE ~= 4^2/12 -> PSNR ~= 46.9 dB >= the 40 dB invariant);
- real codecs (JPEG/PNG via Pillow) plug in behind ``_encode``/``_decode``
  — the Spark-side schema, partitioning, Arrow batch shape and the PSNR
  verification operator are the deliverable and are fully tested.

All generation/verification runs in ``mapInPandas`` (Arrow-batched,
iterator form) — binary payloads of 10KB-1MB/row are why session.py caps
``arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HEADER = struct.Struct("<4sHHi")  # magic, w, h, reserved
MAGIC_RAW = b"RGB8"
MAGIC_Q6 = b"QRG6"

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def _pixels(image_id: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB pixels: smooth gradients + id-dependent phase so
    every image is distinct but bit-reproducible anywhere."""
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 3 + image_id * 7) % 256
    g = (y * 5 + image_id * 13) % 256
    b = (x + y + image_id) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


# -- real-codec adapter (r03 verdict #3) -----------------------------------
# Pillow plugs in behind the same _encode/_decode seam when importable;
# this sandbox ships no image library, so the deterministic stand-in
# formats stay the default and the adapter is exercised only where PIL
# exists (tests parametrize over whichever codec set is available —
# tests/test_images.py::test_codec_roundtrip_paths).

try:  # deliberate import-try: never a hard dependency
    from PIL import Image as _PILImage  # type: ignore
except Exception:  # pragma: no cover - sandbox has no Pillow
    _PILImage = None

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPEG_SIG = b"\xff\xd8"


def available_codecs() -> list[str]:
    """Formats `_encode`/`_decode` can round-trip in this environment."""
    base = ["rgb8", "qrgb6"]
    return base + (["png", "jpeg"] if _PILImage is not None else [])


def _encode(px: np.ndarray, fmt: str) -> bytes:
    h, w, _ = px.shape
    if fmt == "rgb8":
        return HEADER.pack(MAGIC_RAW, w, h, 0) + px.tobytes()
    if fmt == "qrgb6":  # lossy: quantize to 6 bits/channel
        q = (px >> 2).astype(np.uint8)
        return HEADER.pack(MAGIC_Q6, w, h, 0) + q.tobytes()
    if fmt in ("png", "jpeg") and _PILImage is not None:
        import io

        bio = io.BytesIO()
        # quality=95 keeps the smooth synthetic gradients above the
        # 40 dB PSNR invariant; PNG is lossless (PSNR = inf).
        _PILImage.fromarray(px, mode="RGB").save(
            bio, format=fmt.upper(),
            **({"quality": 95} if fmt == "jpeg" else {}))
        return bio.getvalue()
    raise NotImplementedError(f"codec {fmt!r} needs an image library")


def _decode(buf: bytes) -> np.ndarray:
    if buf[:8] == _PNG_SIG or buf[:2] == _JPEG_SIG:
        if _PILImage is None:
            raise NotImplementedError(
                "PNG/JPEG payload but no image library in this environment")
        import io

        return np.asarray(
            _PILImage.open(io.BytesIO(buf)).convert("RGB"), dtype=np.uint8)
    magic, w, h, _ = HEADER.unpack_from(buf)
    body = np.frombuffer(buf, np.uint8, offset=HEADER.size).reshape(h, w, 3)
    if magic == MAGIC_RAW:
        return body
    if magic == MAGIC_Q6:  # dequantize to bin centers
        return np.minimum(body.astype(np.uint16) * 4 + 2, 255).astype(np.uint8)
    raise NotImplementedError("unknown magic; real codecs not available here")


def _phash(px: np.ndarray) -> int:
    """64-bit average-hash: mean-pool to 8x8 luma, threshold at the mean.
    (The classic aHash; DCT-based pHash plugs in the same way.)"""
    luma = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = luma.shape
    blocks = luma[: h - h % 8, : w - w % 8].reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= 1 << 63 else v


# -- batch (whole-Arrow-batch) forms: one numpy pass for B images, bit-
# identical to the scalar forms above (asserted in test_images) ------------

def _pixels_batch(ids: np.ndarray, w: int, h: int) -> np.ndarray:
    """(B, h, w, 3) uint8 — `_pixels` vectorized over image ids."""
    y, x = np.mgrid[0:h, 0:w]
    i = ids.astype(np.int64).reshape(-1, 1, 1)
    r = (x * 3 + i * 7) % 256
    g = (y * 5 + i * 13) % 256
    b = (x + y + i) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def _phash_batch(px: np.ndarray) -> np.ndarray:
    """(B,) int64 — `_phash` vectorized; identical reduction order per
    image (same reshape structure), so the floats — and bits — match."""
    luma = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    nb, h, w = luma.shape
    blocks = luma[:, : h - h % 8, : w - w % 8] \
        .reshape(nb, 8, h // 8, 8, w // 8).mean(axis=(2, 4))
    bits = blocks.reshape(nb, 64) > blocks.mean(axis=(1, 2), keepdims=True) \
        .reshape(nb, 1)
    weights = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))
    return (bits.astype(np.uint64) * weights).sum(axis=1).astype(np.uint64) \
        .view(np.int64)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10.0 * np.log10(255.0**2 / mse)


def caption_of(image_id: int) -> str:
    px = _pixels(image_id, 2, 2)
    return (
        f"synthetic photo {image_id}: dominant rgb "
        f"({int(px[0,0,0])},{int(px[0,0,1])},{int(px[0,0,2])})"
    )


def _captions_batch(ids: np.ndarray) -> list[str]:
    """`caption_of` vectorized: the (0,0) pixel is ((7id)%256, (13id)%256,
    id%256), so no per-row mgrid allocation — one arithmetic pass then
    string formatting (asserted equal to the scalar form in test_images)."""
    i = ids.astype(np.int64)
    r, g, b = (7 * i) % 256, (13 * i) % 256, i % 256
    return [
        f"synthetic photo {ii}: dominant rgb ({rr},{gg},{bb})"
        for ii, rr, gg, bb in zip(i, r, g, b)
    ]


# ---------------------------------------------------------------------------
# table builders / operators
# ---------------------------------------------------------------------------

def images_table(
    spark: SparkSession,
    n_images: int,
    w: int = 32,
    h: int = 32,
    partitions: int | None = None,
) -> DataFrame:
    """Build the image+caption table. Generation is mapInPandas over
    spark.range — executor-parallel, never materialized on the driver."""

    # struct.Struct doesn't pickle — bake the two headers to plain bytes
    # before the closure captures them (w, h are fixed per table)
    hdr_raw = HEADER.pack(MAGIC_RAW, w, h, 0)
    hdr_q6 = HEADER.pack(MAGIC_Q6, w, h, 0)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            px = _pixels_batch(ids, w, h)          # one pass, whole batch
            ph = _phash_batch(px)
            q = (px >> 2).astype(np.uint8)         # lossy plane, whole batch
            caps = _captions_batch(ids)
            rows = []
            for j, image_id in enumerate(ids):
                image_id = int(image_id)
                if image_id % 3 == 0:
                    fmt, body = "qrgb6", hdr_q6 + q[j].tobytes()
                else:
                    fmt, body = "rgb8", hdr_raw + px[j].tobytes()
                rows.append(
                    (str(image_id), body, w, h, fmt, caps[j], int(ph[j]))
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
            )

    rng = spark.range(0, n_images,
                      numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, IMAGES_SCHEMA)


def mixed_dims_of(image_id: int) -> tuple[int, int]:
    """Per-id (w, h) for the mixed-size corpus — pure id arithmetic so a
    SQL oracle restates it: w in {16..48}, h in {16..64}, both multiples
    of 8 (the phash block size). Aspect ratios span 1:4 .. 3:1, so
    LAION-style resolution/aspect gates have real work to do."""
    return 16 + (image_id % 5) * 8, 16 + (image_id % 7) * 8


def images_table_mixed(
    spark: SparkSession,
    n_images: int,
    partitions: int | None = None,
) -> DataFrame:
    """Mixed-dimensions image+caption table: same schema/codecs as
    ``images_table`` but (w, h) vary per row (``mixed_dims_of``) — the
    realistic web-crawl shape where no two fetched images agree on size.
    Exercises the (w, h)-grouped Arrow batching every decode-side
    operator (verify/resize/features) already implements.  Generation
    stays one vectorized numpy pass per (w, h) group per batch."""

    # struct.Struct doesn't pickle — capture only the format string and
    # magics; headers are packed per (w, h) group inside the task
    hdr_fmt, magic_raw, magic_q6 = HEADER.format, MAGIC_RAW, MAGIC_Q6

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            w_all = 16 + (ids % 5) * 8
            h_all = 16 + (ids % 7) * 8
            out_frames = []
            for key in np.unique(w_all * 1000 + h_all):
                sel = (w_all * 1000 + h_all) == key
                gids = ids[sel]
                w, h = int(key // 1000), int(key % 1000)
                px = _pixels_batch(gids, w, h)
                ph = _phash_batch(px)
                q = (px >> 2).astype(np.uint8)
                caps = _captions_batch(gids)
                hdr_raw = struct.pack(hdr_fmt, magic_raw, w, h, 0)
                hdr_q6 = struct.pack(hdr_fmt, magic_q6, w, h, 0)
                rows = []
                for j, image_id in enumerate(gids):
                    image_id = int(image_id)
                    if image_id % 3 == 0:
                        fmt, body = "qrgb6", hdr_q6 + q[j].tobytes()
                    else:
                        fmt, body = "rgb8", hdr_raw + px[j].tobytes()
                    rows.append(
                        (str(image_id), body, w, h, fmt, caps[j], int(ph[j]))
                    )
                out_frames.append(pd.DataFrame(
                    rows, columns=["image_id", "bytes", "w", "h", "fmt",
                                   "caption", "phash"]))
            yield pd.concat(out_frames) if out_frames else pd.DataFrame(
                columns=["image_id", "bytes", "w", "h", "fmt", "caption",
                         "phash"])

    rng = spark.range(0, n_images,
                      numPartitions=partitions
                      or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, IMAGES_SCHEMA)


def verify_payload(images: DataFrame, min_psnr_db: float = 40.0) -> DataFrame:
    """Decode every row and check the input-hint invariant: decoded-pixel
    PSNR >= 40 dB for lossy formats (bit-exact for lossless) + caption
    equality. Returns (image_id, fmt, psnr_db, caption_ok, phash_ok)."""

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # decode per row (codec boundary is inherently per-buffer);
            # everything after is one vectorized pass over the batch,
            # grouped by (w, h) so mixed-size corpora still batch
            out_frames = []
            for (w_, h_), grp in pdf.groupby(["w", "h"], sort=False):
                ids = grp["image_id"].to_numpy(dtype=np.int64)
                decoded = np.stack(
                    [_decode(bytes(b)) for b in grp["bytes"]])
                orig = _pixels_batch(ids, int(w_), int(h_))
                err = (orig.astype(np.float64) - decoded.astype(np.float64))
                mse = np.mean(err * err, axis=(1, 2, 3))
                with np.errstate(divide="ignore"):
                    p = np.where(
                        mse == 0, 99.0,
                        np.minimum(10.0 * np.log10(255.0**2 / mse), 99.0))
                ph_ok = grp["phash"].to_numpy(dtype=np.int64) \
                    == _phash_batch(orig)
                cap_ok = np.array(
                    [c == want for c, want
                     in zip(grp["caption"], _captions_batch(ids))])
                out_frames.append(pd.DataFrame({
                    "image_id": grp["image_id"].to_numpy(),
                    "fmt": grp["fmt"].to_numpy(),
                    "psnr_db": p,
                    "caption_ok": cap_ok,
                    "phash_ok": ph_ok,
                }))
            yield (pd.concat(out_frames) if out_frames else pd.DataFrame(
                columns=["image_id", "fmt", "psnr_db", "caption_ok",
                         "phash_ok"]))

    return images.mapInPandas(
        check,
        "image_id string, fmt string, psnr_db double, caption_ok boolean, "
        "phash_ok boolean",
    )


def phash_near_dupes(images: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate image pairs by phash Hamming distance.

    Scale path: band-bucket the 64-bit phash into 8x8-bit bands. By
    pigeonhole, any pair within Hamming distance <= 7 differs in at most 7
    bands and therefore shares at least one exact band — so recall is
    GUARANTEED for the default max_hamming=6 (4x16-bit bands would only
    guarantee distance <= 3). Candidate pairs join per band; the exact
    popcount residual filters. Avoids the O(n^2) cross join; narrower
    bands trade more candidate collisions for the recall guarantee."""
    bands = images.select(
        "image_id", "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright("phash", 8 * i).bitwiseAND(F.lit(0xFF)).alias("val"),
                )
                for i in range(8)
            ])
        ).alias("b"),
    ).select("image_id", "phash", "b.band", "b.val")

    cand = (
        bands.alias("a")
        .join(bands.alias("x"), ["band", "val"])
        .where(F.col("a.image_id") < F.col("x.image_id"))
        .select(
            F.col("a.image_id").alias("id_a"),
            F.col("x.image_id").alias("id_b"),
            F.col("a.phash").alias("ph_a"),
            F.col("x.phash").alias("ph_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return cand.withColumn("hamming", hamming).where(hamming <= max_hamming) \
               .select("id_a", "id_b", "hamming")


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode -> nearest-neighbor resample -> re-encode, preserving each
    row's format (the resize stage of a multimodal ingest pipeline; the
    reference stores originals only, file_storage.py:279-293 — thumbnails
    are new capability). Pixel-center sampling grid
    ``src = floor((i + 0.5) * src_dim / dst_dim)`` (PIL NEAREST), pure
    integer indexing — deterministic on any executor, no interpolation
    float drift. One vectorized numpy pass per Arrow batch per (w, h)
    group; phash recomputed on the resized plane.

    Plumbing contract (what a real-codec swap keeps): binary in/binary
    out, schema unchanged, bounded Arrow batches (session.py caps
    maxRecordsPerBatch for payload columns)."""
    hdr_raw = HEADER.pack(MAGIC_RAW, out_w, out_h, 0)
    hdr_q6 = HEADER.pack(MAGIC_Q6, out_w, out_h, 0)

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_frames = []
            for (w_, h_), grp in pdf.groupby(["w", "h"], sort=False):
                w_, h_ = int(w_), int(h_)
                sy = ((np.arange(out_h) + 0.5) * h_ // out_h).astype(np.int64)
                sx = ((np.arange(out_w) + 0.5) * w_ // out_w).astype(np.int64)
                decoded = np.stack([_decode(bytes(b)) for b in grp["bytes"]])
                small = decoded[:, sy[:, None], sx[None, :], :]
                ph = _phash_batch(small)
                q = (small >> 2).astype(np.uint8)
                rows = []
                for j, (iid, fmt, cap) in enumerate(
                    zip(grp["image_id"], grp["fmt"], grp["caption"])
                ):
                    if fmt == "qrgb6":
                        body = hdr_q6 + q[j].tobytes()
                    else:
                        body = hdr_raw + small[j].tobytes()
                    rows.append((iid, body, out_w, out_h, fmt, cap,
                                 int(ph[j])))
                out_frames.append(pd.DataFrame(
                    rows, columns=["image_id", "bytes", "w", "h", "fmt",
                                   "caption", "phash"]))
            yield (pd.concat(out_frames) if out_frames else pd.DataFrame(
                columns=["image_id", "bytes", "w", "h", "fmt", "caption",
                         "phash"]))

    return images.mapInPandas(rz, IMAGES_SCHEMA)


def image_features(images: DataFrame, grid: int = 8) -> DataFrame:
    """Decode -> feature-extract: L2-normalized thumbnail vector
    (nearest-neighbor grid x grid subsample, all 3 channels ->
    ``embedding array<float>`` of 3*grid^2 dims) — the bridge from the
    binary payload table into the similarity/ANN operators
    (operators/similarity.py), so image near-dup runs through the SAME
    LSH/IVF/cosine machinery as text embeddings. One numpy pass per
    Arrow batch. Identical pixels (ids congruent mod 256 in the
    synthetic corpus) map to identical unit vectors (cos = 1.0); on this
    deliberately smooth gradient corpus distinct images still reach
    cos ~0.9998 (everything is a near-dup of everything — a property of
    the corpus, not the operator), so thresholds live in (0.9998, 1)."""

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_frames = []
            for (w_, h_), grp in pdf.groupby(["w", "h"], sort=False):
                w_, h_ = int(w_), int(h_)
                sy = ((np.arange(grid) + 0.5) * h_ // grid).astype(np.int64)
                sx = ((np.arange(grid) + 0.5) * w_ // grid).astype(np.int64)
                decoded = np.stack([_decode(bytes(b)) for b in grp["bytes"]])
                thumb = decoded[:, sy[:, None], sx[None, :], :].astype(
                    np.float64)
                v = thumb.reshape(len(thumb), grid * grid * 3)
                v = v / np.maximum(
                    np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
                out_frames.append(pd.DataFrame({
                    "image_id": grp["image_id"].to_numpy(),
                    "embedding": [row.astype(np.float32).tolist()
                                  for row in v],
                }))
            yield (pd.concat(out_frames) if out_frames else pd.DataFrame(
                columns=["image_id", "embedding"]))

    return images.mapInPandas(feat, "image_id string, embedding array<float>")


def anchor_colors(images: DataFrame) -> DataFrame:
    """Decode -> per-image anchor color: the decoded (0, 0) pixel's
    (r, g, b), the value the synthetic caption's "dominant rgb (r,g,b)"
    clause claims (``caption_of``).  The decode-side half of the
    CLIP-score-style caption<->image alignment gate
    (plans/image_queries.py::caption_align_filter): Python touches ONLY
    the codec boundary (one `_decode` per buffer, so real codecs behind
    the seam keep working); caption parsing and the tolerance compare
    stay JVM-native in the query.  Input needs (image_id, bytes) plus
    any passthrough columns; output replaces `bytes` with r0/g0/b0.

    Reference analogue: none — the reference stores bytes and captions
    without ever checking they agree (file_storage.py:279-293); this is
    the multimodal-consistency filter a LAION-style pipeline runs."""
    passthrough = [c for c in images.columns if c != "bytes"]

    def anchor(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = [_decode(bytes(b))[0, 0] for b in pdf["bytes"]]
            a = (np.stack(px) if px
                 else np.zeros((0, 3), dtype=np.uint8)).astype(np.int32)
            out = pdf[passthrough].copy()
            out["r0"], out["g0"], out["b0"] = a[:, 0], a[:, 1], a[:, 2]
            yield out

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in images.schema.fields if f.name != "bytes")
    return images.mapInPandas(anchor, f"{fields}, r0 int, g0 int, b0 int")


def cross_modal_dupes(
    images: DataFrame,
    max_hamming: int = 6,
    jaccard_num: int = 1,
    jaccard_den: int = 2,
) -> DataFrame:
    """Cross-modal duplicate pairs: images whose CAPTION near-matches
    (MinHash-LSH candidates, exact token-Jaccard >= num/den verify) AND
    whose PIXELS near-match (banded phash, Hamming <= max_hamming) —
    the multimodal curation primitive for image+caption training data
    (a re-post with the same alt text, vs a caption coincidence on
    different pixels, vs the same pixels under unrelated text: only the
    first is a true pair-level duplicate).

    Scale shape: both candidate streams are the existing banded
    equi-joins (caption minhash bands, phash 8x8-bit bands) — never
    all-pairs — and the final AND is one equi-join on the canonical
    (id_a, id_b) pair key, so the plan is three hash joins over id-only
    rows.  Requires columns (image_id, caption, phash); returns
    (id_a, id_b, hamming, n_intersect, n_union) with id_a < id_b.

    Reference parity note: the reference stores captions and images but
    dedups neither (file_storage.py:279-293 writes raw bytes keyed by
    URL); this operator is part of the beyond-reference training-data
    set (COVERAGE.md "LLM-data-pipeline operators").
    """
    from ..operators.dedup import minhash_lsh_candidates, verify_pairs_jaccard

    cap_cand = minhash_lsh_candidates(
        images, "image_id", "caption", k=6, band_size=2, shingle_n=3)
    cap_pairs = verify_pairs_jaccard(
        cap_cand, images, "image_id", "caption").where(
        jaccard_den * F.col("n_intersect")
        >= jaccard_num * F.col("n_union"))
    ph_pairs = phash_near_dupes(
        images.select("image_id", "phash"), max_hamming=max_hamming)
    return cap_pairs.join(ph_pairs, ["id_a", "id_b"]).select(
        "id_a", "id_b", "hamming", "n_intersect", "n_union")
