"""Image-payload curation queries (round 5, second wave).

The graft's payload axis is IMAGE: these queries exercise the full
training-data curation story directly over the binary image+caption
table (BASELINE input_hint schema) rather than the text corpus —

* ``image_filter_stats``   — LAION-style resolution/aspect gates over a
  mixed-dimensions corpus (no two web images agree on size), with the
  kept-payload byte accounting a storage planner needs.
* ``image_packing``        — the image analogue of sequence packing:
  deterministic byte-capacity bin assignment per shard (webdataset-style
  tar-shard planning), reusing operators/packing.py unchanged with
  bytes-per-image as the size column.
* ``image_exact_dedup``    — first-wins exact dedup on md5 of the RAW
  PAYLOAD BYTES (the D3 analogue on the binary column): one hash
  shuffle; captions are ignored, so byte-identical re-encodes under
  different alt text still collapse.
* ``image_curation_e2e``   — the image+caption analogue of
  curation_e2e: corpus (+planted caption-mangled rows, +planted
  re-posts) -> caption-quality gate -> cross-modal (caption MinHash AND
  phash) near-dup connected components keep-min -> per-source quota cap
  (salted) -> stable train/val/test split -> join back to the payload
  table — ONE chained DuckDB oracle end-to-end.

Oracles: pixels/captions/phashes are pure functions of image_id
(frontier/images.py), so every expected value restates as id arithmetic
— the phash vocabulary has period 256, payload bytes are
``12 + w*h*3``, and bytes-level equality classes on the fixed-size
corpus are exactly ``id mod lcm(256, 3) = 768``.

Reference parity: the reference stores raw image bytes keyed by URL and
never dedups, sizes, or shards them (file_storage.py:279-293); this
module is part of the beyond-reference training-data set (COVERAGE.md
"LLM-data-pipeline operators").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..frontier import images as I
from ..operators.dedup import cluster_representatives
from ..operators.mixing import quota_cap
from ..operators.packing import pack_sequences
from ..operators.sampling import (
    hex_threshold,
    oracle_hash_prefix_sql,
    train_val_test_split,
)
from ..sources.testdata import load_table
from .crawl_queries import _phash_values_sql
from .pipeline_queries import _MH_SQL
from .registry import register

# mixed-size corpus cap (documents*2 capped — 1000 at sf<=0.01, 1600 at
# sf0.1) and the LAION-style gate constants
_MIX_CAP = 1600
_MIN_SIDE = 24          # min(w, h) >= 24px
_PACK_CAPACITY = 16384  # bytes per packed bin (tar-shard planning unit)
_PACK_BUCKETS = 8

# mixed-dims restatement (images.mixed_dims_of) as SQL fragments
_W_SQL = "16 + (r.range % 5) * 8"
_H_SQL = "16 + (r.range % 7) * 8"
_MIX_IMGS_SQL = f"""
    nn AS (SELECT LEAST(COUNT(*) * 2, {_MIX_CAP}) AS n FROM documents),
    imgs AS (
      SELECT r.range AS image_id, {_W_SQL} AS w, {_H_SQL} AS h,
             CASE WHEN r.range % 3 = 0 THEN 'qrgb6' ELSE 'rgb8' END AS fmt
      FROM range(0, {_MIX_CAP}) r
      WHERE r.range < (SELECT n FROM nn)
    )"""


def _mixed_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = min(load_table(spark, sf_dir, "documents").count() * 2, _MIX_CAP)
    return I.images_table_mixed(spark, n).select(
        F.col("image_id").cast("long").alias("image_id"),
        "w", "h", "fmt", "bytes",
    )


def _aspect_keep():
    """LAION-style gates: both sides >= _MIN_SIDE px, aspect in [1:2, 2:1]
    — integer-only so both engines compare exactly."""
    w, h = F.col("w"), F.col("h")
    return ((F.least(w, h) >= _MIN_SIDE)
            & (2 * w >= h) & (2 * h >= w))


@register(
    "image_filter_stats",
    oracle=f"""
    WITH {_MIX_IMGS_SQL},
    flt AS (
      SELECT *, (LEAST(w, h) >= {_MIN_SIDE}
                 AND 2 * w >= h AND 2 * h >= w) AS keep
      FROM imgs
    )
    SELECT fmt,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(COALESCE(SUM(CASE WHEN keep THEN 12 + w * h * 3 END), 0)
                AS BIGINT) AS payload_bytes_kept,
           COUNT(DISTINCT CASE WHEN keep THEN w * 1000 + h END)
             AS n_dims_kept
    FROM flt GROUP BY fmt
    """,
)
def image_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolution/aspect gate accounting over the mixed-size corpus.
    payload_bytes_kept sums the ACTUAL binary column length (length =
    12-byte header + w*h*3 for both codecs), so the oracle also pins the
    generator's byte layout."""
    imgs = _mixed_corpus(spark, sf_dir)
    keep = _aspect_keep()
    return imgs.groupBy("fmt").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.coalesce(F.sum(F.when(keep, F.length("bytes"))), F.lit(0))
         .cast("bigint").alias("payload_bytes_kept"),
        F.countDistinct(
            F.when(keep, F.col("w") * 1000 + F.col("h"))
        ).alias("n_dims_kept"),
    )


@register(
    "image_packing",
    oracle=f"""
    WITH {_MIX_IMGS_SQL},
    gated AS (
      SELECT image_id, CAST(12 + w * h * 3 AS BIGINT) AS n_bytes,
             image_id % {_PACK_BUCKETS} AS bucket
      FROM imgs
      WHERE LEAST(w, h) >= {_MIN_SIDE} AND 2 * w >= h AND 2 * h >= w
    ),
    cum AS (
      SELECT image_id, n_bytes, bucket,
             CAST(COALESCE(SUM(n_bytes) OVER (
               PARTITION BY bucket ORDER BY image_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_excl
      FROM gated
    )
    SELECT image_id, n_bytes, bucket,
           cum_excl // {_PACK_CAPACITY} AS bin_id,
           cum_excl % {_PACK_CAPACITY} AS bin_offset
    FROM cum
    """,
)
def image_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-capacity bin assignment for the gated mixed-size corpus —
    pack_sequences with n_bytes (actual binary length) as the size
    column: the webdataset/tar-shard planning step. One exchange (the
    bucket window); never a corpus-wide ORDER BY."""
    gated = _mixed_corpus(spark, sf_dir).where(_aspect_keep())
    packed = pack_sequences(
        gated, "image_id", F.length("bytes"),
        capacity=_PACK_CAPACITY, n_buckets=_PACK_BUCKETS,
    )
    return packed.select(
        "image_id", F.col("n_tokens").alias("n_bytes"),
        "bucket", "bin_id", "bin_offset",
    )


# fixed-size corpus: pixels are linear in id mod 256 per channel and the
# payload body is either the raw plane (rgb8, any id % 3 != 0) or the
# quantized plane (qrgb6, id % 3 == 0) — so exact byte-equality classes
# are (id % 256, id % 3 == 0), NOT id % lcm(256,3): two rgb8 rows with
# the same pixels are byte-identical even when id % 3 is 1 vs 2.
@register(
    "image_exact_dedup",
    oracle=f"""
    WITH nn AS (SELECT LEAST(COUNT(*) * 2, {_MIX_CAP}) AS n FROM documents),
    ids AS (
      SELECT r.range AS id FROM range(0, {_MIX_CAP}) r
      WHERE r.range < (SELECT n FROM nn)
    ),
    cls AS (SELECT id, id % 256 AS c, (id % 3 = 0) AS q FROM ids),
    reps AS (SELECT c, q, MIN(id) AS kept_id FROM cls GROUP BY c, q)
    SELECT r.kept_id, c.id AS dup_id
    FROM cls c JOIN reps r ON c.c = r.c AND c.q = r.q AND c.id > r.kept_id
    """,
)
def image_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-wins exact dedup keyed on md5 of the raw payload BYTES (not
    the caption — byte-identical pixels under different alt text still
    collapse; the caption embeds the id so no two captions match here).
    Scale shape: one shuffle on the 128-bit digest, min-agg reps, one
    join back — the D3 plan on the binary column."""
    n = min(load_table(spark, sf_dir, "documents").count() * 2, _MIX_CAP)
    imgs = I.images_table(spark, n).select(
        F.col("image_id").cast("long").alias("image_id"), "bytes")
    d = imgs.select("image_id", F.md5("bytes").alias("k"))
    reps = d.groupBy("k").agg(F.min("image_id").alias("kept_id"))
    return (
        d.join(reps, "k")
        .where(F.col("image_id") > F.col("kept_id"))
        .select("kept_id", F.col("image_id").alias("dup_id"))
    )


# ---------------------------------------------------------------------------
# image_curation_e2e — the image+caption analogue of curation_e2e
# ---------------------------------------------------------------------------

_IC_CAP = 1200     # corpus cap (documents*2 capped -> 1000 small-SF)
_IC_DUPS = 40      # planted re-posts (same pixels+caption, new id)
_IC_OFF = 100000   # planted re-post id offset
_IC_MANGLE = 13    # ids with id % 13 == 5 get a truncated caption
_IC_SRC = 16       # synthetic source id = image_id % 16
_IC_QUOTA = 8      # per-source keep cap
_IC_VAL, _IC_TEST, _IC_SEED = 0.1, 0.1, "imgsplit0"
_IC_H = oracle_hash_prefix_sql("image_id", _IC_SEED)

_IC_ORACLE = f"""
WITH RECURSIVE ph(pid, ph) AS (VALUES {_phash_values_sql()}),
nn AS (SELECT LEAST(COUNT(*) * 2, {_IC_CAP}) AS n FROM documents),
base AS (
  SELECT r.range AS image_id,
         CASE WHEN r.range % {_IC_MANGLE} = 5 THEN 'synthetic photo'
              ELSE 'synthetic photo ' || r.range || ': dominant rgb ('
                   || (r.range * 7) % 256 || ',' || (r.range * 13) % 256
                   || ',' || r.range % 256 || ')' END AS caption,
         p.ph AS phash
  FROM range(0, {_IC_CAP}) r JOIN ph p ON r.range % 256 = p.pid
  WHERE r.range < (SELECT n FROM nn)
),
aug AS MATERIALIZED (
  SELECT image_id, caption, phash FROM base
  UNION ALL
  SELECT image_id + {_IC_OFF}, caption, phash
  FROM base WHERE image_id < {_IC_DUPS}
),
gated AS MATERIALIZED (
  SELECT * FROM aug WHERE len(string_split(caption, ' ')) >= 5
),
toks AS (SELECT image_id, string_split(caption, ' ') AS l FROM gated),
sh AS (
  SELECT image_id, list_transform(range(1, len(l) - 1),
           i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]) AS sh
  FROM toks WHERE len(l) >= 3
),
shingle AS (SELECT image_id, unnest(sh) AS s FROM sh),
hashed AS (SELECT image_id, md5(s) AS d1, md5('x' || s) AS d2 FROM shingle),
sig AS (SELECT image_id, {_MH_SQL} FROM hashed GROUP BY image_id),
bands AS (
  SELECT image_id, 0 AS band_idx, md5(mh0 || '_' || mh1) AS band_key FROM sig
  UNION ALL SELECT image_id, 1, md5(mh2 || '_' || mh3) FROM sig
  UNION ALL SELECT image_id, 2, md5(mh4 || '_' || mh5) FROM sig
),
cand AS (
  SELECT DISTINCT l.image_id AS id_a, r.image_id AS id_b
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key
   AND l.image_id < r.image_id
),
tk AS (SELECT image_id, list_distinct(string_split(caption, ' ')) AS t
       FROM gated),
verified AS (
  SELECT c.id_a, c.id_b
  FROM cand c JOIN tk a ON c.id_a = a.image_id
              JOIN tk b ON c.id_b = b.image_id
  WHERE 2 * len(list_intersect(a.t, b.t))
        >= len(list_distinct(list_concat(a.t, b.t)))
),
php AS (
  SELECT a.image_id AS id_a, b.image_id AS id_b
  FROM gated a JOIN gated b ON a.image_id < b.image_id
  WHERE bit_count(xor(a.phash, b.phash)) <= 6
),
xm AS MATERIALIZED (
  SELECT v.id_a, v.id_b FROM verified v JOIN php p USING (id_a, id_b)
),
edges AS (SELECT id_a AS s_, id_b AS d_ FROM xm
          UNION ALL SELECT id_b, id_a FROM xm),
reach(node, lbl) AS (
  SELECT DISTINCT s_, s_ FROM edges
  UNION
  SELECT e.d_, r.lbl FROM reach r JOIN edges e ON e.s_ = r.node
),
comp AS (SELECT node, MIN(lbl) AS rep FROM reach GROUP BY node),
kept AS MATERIALIZED (
  SELECT g.image_id FROM gated g
  WHERE g.image_id NOT IN (SELECT node FROM comp WHERE node <> rep)
),
quota AS (
  SELECT image_id, image_id % {_IC_SRC} AS src,
         CAST(ROW_NUMBER() OVER (PARTITION BY image_id % {_IC_SRC}
                                 ORDER BY image_id) AS INT) AS quota_rank
  FROM kept
),
capped AS (SELECT * FROM quota WHERE quota_rank <= {_IC_QUOTA}),
labeled AS (
  SELECT image_id, src, quota_rank,
         CASE WHEN {_IC_H} < '{hex_threshold(_IC_VAL)}' THEN 'val'
              WHEN {_IC_H} < '{hex_threshold(_IC_VAL + _IC_TEST)}'
                THEN 'test'
              ELSE 'train' END AS split
  FROM capped
)
SELECT split, src, image_id, quota_rank,
       CASE WHEN image_id % 3 = 0 THEN 'qrgb6' ELSE 'rgb8' END AS fmt,
       CAST(3084 AS BIGINT) AS payload_bytes
FROM labeled
"""


@register("image_curation_e2e", oracle=_IC_ORACLE)
def image_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image+caption corpus -> caption-quality gate -> cross-modal
    near-dup connected components (keep each component's min id) ->
    per-source quota cap (salted two-phase) -> stable split -> join back
    to the payload table: one query, one chained oracle — the r04
    verdict #7 composition, on the IMAGE leg.

    Scale shape: every curation decision flows through id-only streams
    (caption/phash projections; the 3 KB binary column is pruned out of
    all shuffles) and joins back to the payload table exactly once at
    the end — the column-pruning discipline a 100 TB image corpus
    requires."""
    n = min(load_table(spark, sf_dir, "documents").count() * 2, _IC_CAP)
    full = I.images_table(spark, n)
    base = full.select(
        F.col("image_id").cast("long").alias("image_id"),
        F.when(F.col("image_id").cast("long") % _IC_MANGLE == 5,
               F.lit("synthetic photo"))
         .otherwise(F.col("caption")).alias("caption"),
        "phash",
    )
    dups = base.where(F.col("image_id") < _IC_DUPS).select(
        (F.col("image_id") + _IC_OFF).alias("image_id"), "caption", "phash")
    aug = base.unionByName(dups)

    # caption-quality gate (token floor) BEFORE pair generation — the
    # mangled captions and their planted re-posts drop symmetrically
    gated = aug.where(F.size(F.split(F.col("caption"), " ")) >= 5)

    # cross-modal near-dup pairs -> transitive components -> keep min
    pairs = I.cross_modal_dupes(gated, max_hamming=6).select("id_a", "id_b")
    comp = cluster_representatives(pairs)
    dup_nodes = comp.where(F.col("node") != F.col("rep")).select(
        F.col("node").alias("image_id"))
    kept = gated.select("image_id").join(dup_nodes, "image_id", "left_anti")

    # per-source quota (salted two-phase top-k), then the stable split
    capped = quota_cap(
        kept.withColumn("src", F.col("image_id") % _IC_SRC),
        "src", [F.col("image_id")], cap=_IC_QUOTA, salt_buckets=4,
    )
    labeled = train_val_test_split(
        capped, "image_id", _IC_VAL, _IC_TEST, seed=_IC_SEED)

    # single join back to the binary payload table (bytes pruned until
    # here); length() pins that the payload actually arrived
    payload = full.select(
        F.col("image_id").cast("long").alias("image_id"), "fmt", "bytes")
    return labeled.join(payload, "image_id").select(
        "split", "src", "image_id", "quota_rank", "fmt",
        F.length("bytes").cast("bigint").alias("payload_bytes"),
    )


# ---------------------------------------------------------------------------
# caption_align_filter — CLIP-score-style caption<->image consistency gate
# ---------------------------------------------------------------------------

_AL_SWAP = 11   # ids with id % 11 == 7 get the NEXT image's caption
_AL_TOL = 2     # qrgb6 bin-center error is <= 2 per channel


@register(
    "caption_align_filter",
    oracle=f"""
    WITH {_MIX_IMGS_SQL},
    probe AS (
      SELECT image_id, fmt,
             CASE WHEN image_id % {_AL_SWAP} = 7
                  THEN image_id + 1 ELSE image_id END AS src
      FROM imgs
    ),
    ch AS (
      SELECT image_id, fmt,
             CAST((7 * src) % 256 AS INT) AS claim_r,
             CAST((13 * src) % 256 AS INT) AS claim_g,
             CAST(src % 256 AS INT) AS claim_b,
             (7 * image_id) % 256 AS vr,
             (13 * image_id) % 256 AS vg,
             image_id % 256 AS vb
      FROM probe
    ),
    dec AS (
      SELECT image_id, fmt, claim_r, claim_g, claim_b,
             CAST(CASE WHEN fmt = 'qrgb6' THEN (vr // 4) * 4 + 2 ELSE vr END
                  AS INT) AS r0,
             CAST(CASE WHEN fmt = 'qrgb6' THEN (vg // 4) * 4 + 2 ELSE vg END
                  AS INT) AS g0,
             CAST(CASE WHEN fmt = 'qrgb6' THEN (vb // 4) * 4 + 2 ELSE vb END
                  AS INT) AS b0
      FROM ch
    )
    SELECT image_id, fmt, claim_r, claim_g, claim_b, r0, g0, b0,
           CAST(GREATEST(ABS(r0 - claim_r), ABS(g0 - claim_g),
                         ABS(b0 - claim_b)) AS INT) AS color_delta,
           GREATEST(ABS(r0 - claim_r), ABS(g0 - claim_g),
                    ABS(b0 - claim_b)) <= {_AL_TOL} AS aligned
    FROM dec
    """,
)
def caption_align_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption<->image alignment gate (the CLIP-score filter of a
    LAION-style pipeline, made exact): decode each payload's anchor
    pixel (`images.anchor_colors` — Python touches only the codec
    boundary), parse the caption's claimed "dominant rgb (r,g,b)" with
    a NATIVE regexp_extract, and keep rows whose decoded color is
    within the codec's quantization tolerance. Rows with id % 11 == 7
    carry the NEXT image's caption (planted mismatch — analyst swap
    bug), so the gate has real work: every planted row must read
    aligned=false (channel deltas >= 7 - tolerance), every honest row
    aligned=true (rgb8 exact, qrgb6 within +-2 bin-center error).

    Scale shape: one pipelined mapInPandas decode (no shuffle), then
    pure codegen'd column algebra — scan-speed over a 100 TB payload
    table, with `bytes` dropped the moment the anchor is extracted.

    Reference parity: none — the reference never cross-checks stored
    bytes against captions (file_storage.py:279-293)."""
    imgs = I.images_table_mixed(
        spark,
        min(load_table(spark, sf_dir, "documents").count() * 2, _MIX_CAP),
    )
    iid = F.col("image_id").cast("long")
    src = F.when(iid % _AL_SWAP == 7, iid + 1).otherwise(iid)
    probe = imgs.select(
        iid.alias("image_id"), "fmt", "bytes",
        # planted swap: rebuild caption_of(id+1) natively; honest rows
        # keep the TABLE caption (so the regex parses produced data)
        F.when(
            iid % _AL_SWAP == 7,
            F.format_string(
                "synthetic photo %d: dominant rgb (%d,%d,%d)",
                src, (7 * src) % 256, (13 * src) % 256, src % 256),
        ).otherwise(F.col("caption")).alias("caption"),
    )
    anchored = I.anchor_colors(probe)
    pat = r"rgb \((\d+),(\d+),(\d+)\)"
    claim = [
        F.regexp_extract("caption", pat, i + 1).cast("int").alias(n)
        for i, n in enumerate(["claim_r", "claim_g", "claim_b"])
    ]
    parsed = anchored.select("image_id", "fmt", "r0", "g0", "b0", *claim)
    delta = F.greatest(
        F.abs(F.col("r0") - F.col("claim_r")),
        F.abs(F.col("g0") - F.col("claim_g")),
        F.abs(F.col("b0") - F.col("claim_b")),
    )
    return parsed.select(
        "image_id", "fmt", "claim_r", "claim_g", "claim_b",
        "r0", "g0", "b0",
        delta.cast("int").alias("color_delta"),
        (delta <= _AL_TOL).alias("aligned"),
    )


# ---------------------------------------------------------------------------
# image_aspect_buckets — SDXL-style aspect-ratio bucketed batch planning
# ---------------------------------------------------------------------------

# (bucket_w : bucket_h) aspect targets; lcm of the bh values is 12, so
# |w*bh - h*bw| * (12 / bh) compares |w/h - bw/bh| EXACTLY across
# buckets in integers (common factor 1/(12*h) > 0 dropped)
_AB_BUCKETS = [(1, 2), (3, 4), (1, 1), (4, 3), (2, 1)]
_AB_SHARDS = 8
_AB_BATCH = 4

_AB_SCORES_SQL = ", ".join(
    f"ABS(w * {bh} - h * {bw}) * {12 // bh} AS s{i}"
    for i, (bw, bh) in enumerate(_AB_BUCKETS))
_AB_ARGMIN_SQL = (
    "CASE " + " ".join(
        f"WHEN s{i} = LEAST(s0, s1, s2, s3, s4) THEN {i}"
        for i in range(len(_AB_BUCKETS))) + " END")


@register(
    "image_aspect_buckets",
    oracle=f"""
    WITH {_MIX_IMGS_SQL},
    gated AS (
      SELECT image_id, w, h, {_AB_SCORES_SQL}
      FROM imgs
      WHERE LEAST(w, h) >= {_MIN_SIDE} AND 2 * w >= h AND 2 * h >= w
    ),
    bkt AS (
      SELECT image_id, w, h,
             CAST({_AB_ARGMIN_SQL} AS INT) AS bucket_idx,
             CAST(image_id % {_AB_SHARDS} AS INT) AS shard
      FROM gated
    ),
    seq AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket_idx, shard
                                   ORDER BY image_id) - 1 AS rn
      FROM bkt
    )
    SELECT image_id, w, h, bucket_idx, shard,
           CAST(rn // {_AB_BATCH} AS INT) AS batch_id,
           CAST(rn % {_AB_BATCH} AS INT) AS seq_in_batch
    FROM seq
    """,
)
def image_aspect_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SDXL-style aspect-ratio bucketed batch planning: every gated
    image is assigned the nearest aspect bucket (argmin over
    cross-multiplied integer distances — exact, no FP ratios; ties go
    to the lowest index) and then a deterministic (batch_id,
    seq_in_batch) within its (bucket, shard) — the plan a training
    loader needs so each batch resizes to ONE canvas shape.

    Scale shape: bucket assignment is pure codegen'd column algebra;
    the only exchange is the (bucket_idx, shard) window, and the shard
    axis (id % {_AB_SHARDS}) keeps partition count proportional to
    data — never a 5-partition window at 100 TB (same discipline as
    operators/packing.py)."""
    gated = _mixed_corpus(spark, sf_dir).where(_aspect_keep()) \
        .select("image_id", "w", "h")
    w, h = F.col("w"), F.col("h")
    scores = [
        (F.abs(w * bh - h * bw) * (12 // bh)).alias(f"s{i}")
        for i, (bw, bh) in enumerate(_AB_BUCKETS)
    ]
    scored = gated.select("image_id", "w", "h", *scores)
    m = F.least(*[F.col(f"s{i}") for i in range(len(_AB_BUCKETS))])
    idx = F.when(F.col("s0") == m, 0)
    for i in range(1, len(_AB_BUCKETS)):
        idx = idx.when(F.col(f"s{i}") == m, i)
    from pyspark.sql import Window
    win = Window.partitionBy("bucket_idx", "shard").orderBy("image_id")
    bkt = scored.select(
        "image_id", "w", "h",
        idx.cast("int").alias("bucket_idx"),
        (F.col("image_id") % _AB_SHARDS).cast("int").alias("shard"),
    )
    return bkt.withColumn("rn", F.row_number().over(win) - 1).select(
        "image_id", "w", "h", "bucket_idx", "shard",
        F.expr(f"cast(rn div {_AB_BATCH} as int)").alias("batch_id"),
        (F.col("rn") % _AB_BATCH).cast("int").alias("seq_in_batch"),
    )
