"""Training-data pipeline queries: dedup, similarity, text analysis over
the documents/embeddings testdata — each paired with a DuckDB oracle.

These wrap the generic operators in crawler_spark.operators.{dedup,
similarity} and crawler_spark.functions.text; the oracle SQL restates the
same math in ANSI SQL (md5-based hash family keeps both engines
bit-identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators import dedup as DD
from ..operators import similarity as SIM
from ..sources.testdata import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Exact dedupe stats (hash-groupBy).
# ---------------------------------------------------------------------------


@register(
    "exact_dup_stats",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_unique,
           COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dups
    FROM documents
    """,
)
def exact_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
        (F.count("*") - F.countDistinct(F.md5("text"))).alias("n_dups"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup candidates (k=6 hashes, 3 bands of 2, 3-shingles).
# ---------------------------------------------------------------------------

# lane j = disjoint 40-bit hex slice of md5(s) (j<3) / md5('x'||s) —
# mirrors operators/dedup.py::minhash_lsh_candidates exactly
_MH_SQL = ", ".join(
    "MIN(substr({d}, {pos}, 10)) AS mh{j}".format(
        d="d1" if j < 3 else "d2", pos=1 + 10 * (j % 3), j=j
    )
    for j in range(6)
)

_LSH_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), sh AS (
  SELECT doc_id,
         list_transform(range(1, len(l) - 1),
                        i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]) AS sh
  FROM toks WHERE len(l) >= 3
), shingle AS (
  SELECT doc_id, unnest(sh) AS s FROM sh
), hashed AS (
  SELECT doc_id, md5(s) AS d1, md5('x' || s) AS d2 FROM shingle
), sig AS (
  SELECT doc_id, {mh} FROM hashed GROUP BY doc_id
), bands AS (
  SELECT doc_id, 0 AS band_idx, md5(mh0 || '_' || mh1) AS band_key FROM sig
  UNION ALL
  SELECT doc_id, 1, md5(mh2 || '_' || mh3) FROM sig
  UNION ALL
  SELECT doc_id, 2, md5(mh4 || '_' || mh5) FROM sig
)
SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
FROM bands l JOIN bands r
  ON l.band_idx = r.band_idx AND l.band_key = r.band_key
 AND l.doc_id < r.doc_id
""".format(mh=_MH_SQL)


@register("minhash_lsh_pairs", oracle=_LSH_ORACLE)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return DD.minhash_lsh_candidates(d, "doc_id", "text", k=6, band_size=2)


# ---------------------------------------------------------------------------
# n-gram (token-set) Jaccard verification over LSH candidates.
# ---------------------------------------------------------------------------


@register(
    "lsh_jaccard_verify",
    oracle="""
    WITH cand AS ({lsh}),
    toks AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS t FROM documents
    )
    SELECT c.id_a, c.id_b,
           len(list_intersect(a.t, b.t)) AS n_intersect,
           len(list_distinct(list_concat(a.t, b.t))) AS n_union
    FROM cand c JOIN toks a ON c.id_a = a.doc_id
                JOIN toks b ON c.id_b = b.doc_id
    """.format(lsh=_LSH_ORACLE),
)
def lsh_jaccard_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = DD.minhash_lsh_candidates(d, "doc_id", "text", k=6, band_size=2)
    return DD.verify_pairs_jaccard(pairs, d, "doc_id", "text")


# ---------------------------------------------------------------------------
# Bounded-window pairwise Jaccard (the quadratic baseline, on a bounded
# slice — models the reference's in-batch set() dedupe exactly).
# ---------------------------------------------------------------------------


@register(
    "ngram_jaccard_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS t
      FROM documents WHERE doc_id < 40
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.t, b.t)) AS n_intersect,
           len(list_distinct(list_concat(a.t, b.t))) AS n_union
    FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    t = d.select(
        "doc_id", "lang", F.array_distinct(F.split("text", " ")).alias("t")
    )
    a = t.select(
        F.col("doc_id").alias("id_a"), F.col("lang").alias("lang_a"),
        F.col("t").alias("ta"),
    )
    b = t.select(
        F.col("doc_id").alias("id_b"), F.col("lang").alias("lang_b"),
        F.col("t").alias("tb"),
    )
    inter, union = DD.jaccard_counts(F.col("ta"), F.col("tb"))
    return (
        a.join(b, (F.col("lang_a") == F.col("lang_b")) & (F.col("id_a") < F.col("id_b")))
        .select(
            "id_a", "id_b", inter.alias("n_intersect"), union.alias("n_union")
        )
    )


# ---------------------------------------------------------------------------
# SimHash (16-bit, md5-digit family) — per-row, zero shuffle.
# ---------------------------------------------------------------------------

_SIMHASH_BIT_SQL = " + ".join(
    "(CASE WHEN list_aggregate(list_transform(t, tok -> "
    "CASE WHEN strpos('0123456789abcdef', substring(md5(tok), {pos}, 1)) - 1 >= 8 "
    "THEN 1 ELSE -1 END), 'sum') > 0 THEN {weight} ELSE 0 END)".format(
        pos=i + 1, weight=2**i
    )
    for i in range(16)
)


@register(
    "simhash16",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS t FROM documents
    )
    SELECT doc_id, CAST({bits} AS INT) AS simhash FROM toks
    """.format(bits=_SIMHASH_BIT_SQL),
)
def simhash16(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return DD.simhash16_agg(d, "doc_id", "text")


# ---------------------------------------------------------------------------
# Embedding cosine top-k (exact brute force — the ANN baseline).
# ---------------------------------------------------------------------------

_DOT = (
    "list_aggregate(list_transform(range(1, len({a}) + 1), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), 'sum')"
)


_COSINE_TOPK_ORACLE = """
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 5
    ), c AS (
      SELECT vec_id AS n_id, embedding AS nv FROM embeddings
    ), scored AS (
      SELECT q_id, n_id,
             {dot_qn} / (sqrt({dot_qq}) * sqrt({dot_nn})) AS cos
      FROM c, q WHERE q_id <> n_id
    )
    SELECT q_id, n_id, CAST(rank AS INT) AS rank, ROUND(cos, 4) AS cos_sim
    FROM (
      SELECT q_id, n_id, cos,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """.format(
    dot_qn=_DOT.format(a="qv", b="nv"),
    dot_qq=_DOT.format(a="qv", b="qv"),
    dot_nn=_DOT.format(a="nv", b="nv"),
)


@register("embedding_cosine_topk", oracle=_COSINE_TOPK_ORACLE)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5)
    return SIM.cosine_topk(e, queries, "vec_id", "embedding", k=5)


@register("embedding_cosine_topk_matmul", oracle=_COSINE_TOPK_ORACLE)
def embedding_cosine_topk_matmul(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact top-k, scored by the two-phase Arrow matmul operator
    (cosine_topk_matmul) — the scale form of the HOF-fold baseline above;
    both must hash-match the same brute-force SQL oracle."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5)
    return SIM.cosine_topk_matmul(e, queries, "vec_id", "embedding", k=5)


# ---------------------------------------------------------------------------
# LSH-bucketed ANN with a FULL value oracle via planted structure
# (round-2 verdict #4): the corpus is augmented with x2-scaled duplicate
# vectors used as queries. x2 is exact in float32 and preserves every
# hyperplane projection sign, so each query provably lands in the same
# bucket as its original; the original is the global top-1 (cos = 1.0 vs
# background max ~0.47), so the in-bucket exact re-rank at k=1 equals
# brute force — DuckDB restates it as plain brute-force top-1.  The k=5
# tail is bucket-dependent (not SQL-expressible) and stays covered by
# tests/test_similarity_ivf.py recall assertions.
# ---------------------------------------------------------------------------

_ANN_TOP1_ORACLE = """
    WITH base AS (
      SELECT vec_id, embedding FROM embeddings
    ), aug AS (
      SELECT vec_id, embedding FROM base
      UNION ALL
      SELECT vec_id + 10000,
             list_transform(embedding, x -> x * CAST(2.0 AS FLOAT))
      FROM base WHERE vec_id < 25
    ), q AS (
      SELECT vec_id AS q_id, embedding AS qv FROM aug WHERE vec_id >= 10000
    ), scored AS (
      SELECT q_id, c.vec_id AS n_id,
             {dot_qn} / (sqrt({dot_qq}) * sqrt({dot_nn})) AS cos
      FROM aug c, q WHERE c.vec_id <> q_id
    )
    SELECT q_id, n_id, CAST(rank AS INT) AS rank, ROUND(cos, 4) AS cos_sim
    FROM (
      SELECT q_id, n_id, cos,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, n_id) AS rank
      FROM scored
    ) WHERE rank = 1
    """.format(
    dot_qn=_DOT.format(a="qv", b="c.embedding"),
    dot_qq=_DOT.format(a="qv", b="qv"),
    dot_nn=_DOT.format(a="c.embedding", b="c.embedding"),
)


def _planted_corpus_and_queries(spark: SparkSession, sf_dir: str):
    """Corpus + x2-scaled planted duplicates (ids +10000) as queries."""
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding")
    dups = base.where(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x * F.lit(2.0).cast("float")
        ).alias("embedding"),
    )
    aug = base.unionByName(dups)
    return aug, aug.where(F.col("vec_id") >= 10000)


@register("embedding_ann_lsh", oracle=_ANN_TOP1_ORACLE)
def embedding_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug, queries = _planted_corpus_and_queries(spark, sf_dir)
    return SIM.lsh_ann_topk(aug, queries, "vec_id", "embedding", k=1)


# ---------------------------------------------------------------------------
# Text analysis: language ID, quality score, token counts, fingerprints.
# ---------------------------------------------------------------------------

_STOP_SQL = "('the', 'a', 'and', 'of', 'to', 'in', 'is')"


@register(
    "lang_id_heuristic",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN 10 * len(list_filter(toks, x -> x IN {stop})) >= len(toks)
                THEN 'en' ELSE 'other' END AS lang_guess
    FROM t
    """.format(stop=_STOP_SQL),
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", TX.lang_guess(F.col("text")).alias("lang_guess"))


@register(
    "quality_score",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           CAST((CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 3 ELSE 0 END)
              + (CASE WHEN 10 * len(list_filter(toks, x -> x IN {stop})) >= len(toks)
                      THEN 2 ELSE 0 END)
              + (CASE WHEN len(toks) >= 30 THEN 1 ELSE 0 END) AS INT) AS quality
    FROM t
    """.format(stop=_STOP_SQL),
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", TX.quality_score(F.col("text"), F.col("n_chars")).alias("quality")
    )


@register(
    "token_counts",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens
    FROM documents
    """,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_ws_tokens"),
        TX.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


@register(
    "filename_sanitize",
    # DuckDB literals do no backslash processing, so FOUR backslashes in
    # this Python source -> two in the SQL text -> RE2 sees an escaped
    # literal backslash inside the class (review finding: two produced
    # only '\\|' = escaped pipe, silently dropping the backslash — and
    # the input then contained none, so the oracle passed vacuously for
    # that character). The '\\' || 'b' piece puts a real backslash in
    # the synthesized name on both engines.
    oracle="""
    SELECT doc_id,
           substring(
             regexp_replace('t:' || source || '/<' || doc_id || '>?*|' || '\\' || 'b',
                            '[<>:"/\\\\|?*]', '_', 'g'),
             1, 200) AS fname
    FROM documents
    """,
)
def filename_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14 scalar surface (content_storage.py:142-156) over synthesized
    unsafe names (incl. a literal backslash); DuckDB restates the same
    regexp_replace+truncate."""
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("t:"), F.col("source"), F.lit("/<"),
        F.col("doc_id").cast("string"), F.lit(">?*|"), F.lit("\\b"),
    )
    return d.select("doc_id", TX.sanitize_filename(raw).alias("fname"))


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(text, '[^a-z0-9]+', '', 'g')) AS fp_full,
           list_aggregate(
             list_transform(range(1, greatest(length(text) - 7, 1) + 1),
                            i -> md5(substring(text, i, 8))), 'min') AS fp_min8
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.fingerprint(F.col("text")).alias("fp_full"),
        TX.min_kgram_fingerprint("text", 8).alias("fp_min8"),
    )


# ---------------------------------------------------------------------------
# B9 — blocked-content substring filter (html_downloader.py:255-278): drop
# documents whose head contains any indicator token.
# ---------------------------------------------------------------------------


@register(
    "blocked_content_filter",
    oracle="""
    SELECT doc_id FROM documents
    WHERE NOT (contains(substring(text, 1, 200), 'spark')
               OR contains(substring(text, 1, 200), 'vector'))
    """,
)
def blocked_content_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    head = F.substring(F.col("text"), 1, 200)
    return d.where(
        ~(head.contains("spark") | head.contains("vector"))
    ).select("doc_id")


# ---------------------------------------------------------------------------
# Gopher-style repetition quality signals (operators/quality.py): every
# 7th document is self-concatenated so the corpus contains genuinely
# repetition-heavy rows for the gate to drop, and every (5k+1)th doc has
# its separators mangled to newline+double-space — the counts must come
# out IDENTICAL to the single-space form (whitespace-run tokenization);
# both engines apply the same augmentation so the oracle checks planted
# and natural docs alike.
# ---------------------------------------------------------------------------


@register(
    "repetition_signals",
    oracle="""
    WITH a1 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' ' || text
                  ELSE text END AS aug
      FROM documents
    ),
    t AS (
      SELECT doc_id,
             list_filter(
               regexp_split_to_array(
                 CASE WHEN doc_id % 5 = 1
                      THEN replace(aug, ' ', chr(10) || '  ')
                      ELSE aug END, '\\s+'),
               x -> x <> '') AS toks
      FROM a1
    ),
    tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
    tc AS (SELECT doc_id, count(*) AS n_tokens,
                  count(DISTINCT tk) AS n_distinct_tokens
           FROM tok GROUP BY doc_id),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i+1]))
                  AS gram
           FROM t),
    gc AS (SELECT doc_id, gram, count(*) AS c FROM bg GROUP BY doc_id, gram),
    ba AS (SELECT doc_id,
                  CAST(sum(c) AS BIGINT) AS n_bigrams,
                  CAST(max(c) AS BIGINT) AS top_bigram_count,
                  CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
                    AS dup_bigram_occurrences
           FROM gc GROUP BY doc_id)
    SELECT tc.doc_id, n_tokens, n_distinct_tokens, n_bigrams,
           top_bigram_count, dup_bigram_occurrences,
           CAST(CASE WHEN n_tokens < 20 THEN 1
                     WHEN 5 * top_bigram_count <= n_bigrams
                      AND 10 * (n_tokens - n_distinct_tokens) <= 3 * n_tokens
                     THEN 1 ELSE 0 END AS INT) AS keep
    FROM tc JOIN ba USING (doc_id)
    """,
)
def repetition_signals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import repetition_signals

    d = load_table(spark, sf_dir, "documents")
    a1 = F.when(F.col("doc_id") % 7 == 0,
                F.concat_ws(" ", "text", "text")).otherwise(F.col("text"))
    aug = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 1,
               F.replace(a1, F.lit(" "), F.lit("\n  ")))
        .otherwise(a1).alias("text"),
    )
    return repetition_signals(aug)


# ---------------------------------------------------------------------------
# PII scrubbing (functions/text.py redact_pii): emails / IPv4 / long digit
# runs -> typed placeholders. The corpus is letters-only, so each doc is
# augmented with deterministic synthetic PII (one email, one phone, one
# IP, parameterized by doc_id) before both engines scrub — counts verify
# the patterns, the redacted string verifies the replacement chain.
# ---------------------------------------------------------------------------


@register(
    "pii_redact",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             text || ' contact User' || doc_id || '@Mail.example.COM or 0'
                  || lpad(CAST(doc_id * 7919 % 100000000 AS VARCHAR), 8, '0')
                  || ' at 10.' || (doc_id % 200) || '.0.7 end' AS raw
      FROM documents
    )
    SELECT doc_id,
      len(regexp_extract_all(raw,
          '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}')) AS n_emails,
      len(regexp_extract_all(
          regexp_replace(raw, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}',
                         '<EMAIL>', 'g'),
          '([0-9]{1,3}[.]){3}[0-9]{1,3}')) AS n_ips,
      len(regexp_extract_all(
          regexp_replace(
            regexp_replace(raw, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}',
                           '<EMAIL>', 'g'),
            '([0-9]{1,3}[.]){3}[0-9]{1,3}', '<IP>', 'g'),
          '[0-9]{9,}')) AS n_phones,
      regexp_replace(
        regexp_replace(
          regexp_replace(raw, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}',
                         '<EMAIL>', 'g'),
          '([0-9]{1,3}[.]){3}[0-9]{1,3}', '<IP>', 'g'),
        '[0-9]{9,}', '<PHONE>', 'g') AS redacted
    FROM t
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"), F.lit(" contact User"),
        F.col("doc_id").cast("string"), F.lit("@Mail.example.COM or 0"),
        F.lpad((F.col("doc_id") * 7919 % 100000000).cast("string"), 8, "0"),
        F.lit(" at 10."), (F.col("doc_id") % 200).cast("string"),
        F.lit(".0.7 end"),
    )
    return d.select(
        "doc_id",
        *TX.pii_counts(raw),
        TX.redact_pii(raw).alias("redacted"),
    )


# ---------------------------------------------------------------------------
# L — streaming-shaped aggregations over events: tumbling hour + sessions.
# ---------------------------------------------------------------------------


@register(
    "hourly_tumbling_agg",
    oracle="""
    SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms,
           event_type,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def hourly_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts").cast("timestamp"))
    return (
        e.groupBy(F.unix_millis(hour).alias("hour_ms"), "event_type")
        .agg(
            F.count("*").alias("n"),
            # exact decimal sum internally, rounded-double on the output
            # (driver hashes Decimal/HUGEINT asymmetrically — round-1 lesson)
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("sum_value"),
        )
    )


@register(
    "sessionization",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts)) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(1 + SUM(new_session) AS INT) AS n_sessions
    FROM gaps GROUP BY user_id
    """,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = ts_ms - F.lag(ts_ms).over(w)
    return (
        e.withColumn("new_session", F.when(gap > 1800000, 1).otherwise(0))
        .groupBy("user_id")
        .agg((1 + F.sum("new_session")).cast("int").alias("n_sessions"))
    )


@register("embedding_ann_ivf", oracle=_ANN_TOP1_ORACLE)
def embedding_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (nprobe cell search + exact re-rank) against the same
    planted-top-1 brute-force oracle as the LSH path: cell assignment
    normalizes vectors, and the x2-scaled query normalizes to the
    bit-identical unit vector as its original, so the query's first
    probed cell IS the original's cell for ANY centroid set — top-1
    provably equals brute force.  n_cells left to the sqrt(N) default;
    k=5 recall stays asserted in tests/test_similarity_ivf.py."""
    from ..operators.similarity import ivf_topk

    aug, queries = _planted_corpus_and_queries(spark, sf_dir)
    return ivf_topk(aug, queries, "vec_id", "embedding", k=1, nprobe=4)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup DEDUP: threshold pairs over a bounded slice +
# min-id representative election (drop row -> kept row). The 0.35
# threshold is calibrated to this synthetic corpus (max pairwise cos
# ~0.46); real corpora use ~0.9+. Scale path: LSH/IVF candidates feed the
# same threshold+representative stage instead of the bounded cross join.
# ---------------------------------------------------------------------------
@register(
    "embedding_near_dup",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {dot_ab} / (sqrt({dot_aa}) * sqrt({dot_bb})) AS cos
      FROM e a JOIN e b ON a.vec_id < b.vec_id
    ), nd AS (
      SELECT id_a, id_b FROM pairs WHERE cos >= 0.35
    )
    SELECT id_b AS dup_id, CAST(MIN(id_a) AS BIGINT) AS kept_id
    FROM nd GROUP BY id_b
    """.format(
        dot_ab=_DOT.format(a="a.embedding", b="b.embedding"),
        dot_aa=_DOT.format(a="a.embedding", b="a.embedding"),
        dot_bb=_DOT.format(a="b.embedding", b="b.embedding"),
    ),
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", SIM.cosine(F.col("va"), F.col("vb")))
        .where(F.col("cos") >= 0.35)
    )
    return pairs.groupBy(F.col("id_b").alias("dup_id")).agg(
        F.min("id_a").alias("kept_id")
    )


# ---------------------------------------------------------------------------
# THE composite training-data cleaning pipeline, one query: exact dedupe
# -> MinHash-LSH near-dup removal (Jaccard >= 1/2 on verified candidates)
# -> language gate -> quality gate -> token stats. Every stage reuses the
# individually-proven operator; the oracle restates the whole chain.
# ---------------------------------------------------------------------------

_CLEAN_ORACLE = """
WITH dedup AS MATERIALIZED (
  SELECT doc_id, text, n_chars FROM (
    SELECT doc_id, text, n_chars,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn = 1
), toks0 AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM dedup
), sh AS (
  SELECT doc_id,
         list_transform(range(1, len(l) - 1),
                        i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]) AS sh
  FROM toks0 WHERE len(l) >= 3
), shingle AS (
  SELECT doc_id, unnest(sh) AS s FROM sh
), hashed AS (
  SELECT doc_id, md5(s) AS d1, md5('x' || s) AS d2 FROM shingle
), sig AS MATERIALIZED (
  SELECT doc_id, {mh} FROM hashed GROUP BY doc_id
), bands AS MATERIALIZED (
  SELECT doc_id, 0 AS band_idx, md5(mh0 || '_' || mh1) AS band_key FROM sig
  UNION ALL SELECT doc_id, 1, md5(mh2 || '_' || mh3) FROM sig
  UNION ALL SELECT doc_id, 2, md5(mh4 || '_' || mh5) FROM sig
), cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key
   AND l.doc_id < r.doc_id
), dtk AS MATERIALIZED (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS t FROM dedup
), drops AS (
  SELECT DISTINCT c.id_b
  FROM cand c JOIN dtk a ON c.id_a = a.doc_id JOIN dtk b ON c.id_b = b.doc_id
  WHERE 2 * len(list_intersect(a.t, b.t))
        >= len(list_distinct(list_concat(a.t, b.t)))
), scored AS (
  SELECT d.doc_id,
         len(string_split(d.text, ' ')) AS n_ws_tokens,
         CAST((CASE WHEN d.n_chars BETWEEN 100 AND 2000 THEN 3 ELSE 0 END)
            + (CASE WHEN 10 * len(list_filter(string_split(d.text, ' '),
                                              x -> x IN {stop}))
                    >= len(string_split(d.text, ' ')) THEN 2 ELSE 0 END)
            + (CASE WHEN len(string_split(d.text, ' ')) >= 30
                    THEN 1 ELSE 0 END) AS INT) AS quality,
         CASE WHEN 10 * len(list_filter(string_split(d.text, ' '),
                                        x -> x IN {stop}))
                   >= len(string_split(d.text, ' '))
              THEN 'en' ELSE 'other' END AS lang_guess
  FROM dedup d
  WHERE d.doc_id NOT IN (SELECT id_b FROM drops)
)
SELECT doc_id, n_ws_tokens, quality
FROM scored WHERE lang_guess = 'en' AND quality >= 4
""".format(mh=_MH_SQL, stop=_STOP_SQL)


@register("corpus_clean", oracle=_CLEAN_ORACLE)
def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end cleaning: exact dedupe -> LSH near-dup removal ->
    lang-ID gate -> quality gate -> token stats, each stage the proven
    operator; hash-checked as ONE pipeline against the composed oracle."""
    d = load_table(spark, sf_dir, "documents")
    survivors = DD.corpus_near_dup_dedup(d, "doc_id", "text")
    return (
        survivors.where(TX.lang_guess(F.col("text")) == "en")
        .select(
            "doc_id",
            TX.token_count(F.col("text")).alias("n_ws_tokens"),
            TX.quality_score(F.col("text"), F.col("n_chars")).alias("quality"),
        )
        .where(F.col("quality") >= 4)
    )


# ---------------------------------------------------------------------------
# Near-dup dedup via the WIRED scale path: LSH-banded candidates -> exact
# cosine threshold -> min-id representative, one operator
# (similarity.near_dup_ann). The oracle is plain brute force over the same
# slice — equality holds because the corpus is augmented with positively-
# scaled duplicate vectors (x2 is exact in float32 and preserves every
# hyperplane projection sign, so LSH recall is provably 1.0 for the
# planted pairs) and no background pair reaches the 0.9 threshold (max
# background cos ~0.47 on this corpus).
# ---------------------------------------------------------------------------
# Shared by embedding_near_dup_ann and embedding_dup_clusters: the
# planted-dup corpus (Spark builder) and its brute-force verified-pair
# CTE chain (oracle side) — one definition, so a slice or threshold
# change cannot silently diverge between the two queries.
_ND_PAIRS_CTES = """base AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200
    ), aug AS (
      SELECT vec_id, embedding FROM base
      UNION ALL
      SELECT vec_id + 10000,
             list_transform(embedding, x -> x * CAST(2.0 AS FLOAT))
      FROM base WHERE vec_id < 50
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {dot_ab} / (sqrt({dot_aa}) * sqrt({dot_bb})) AS cos
      FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    ), nd AS (
      SELECT id_a, id_b FROM pairs WHERE cos >= 0.9
    )""".format(
    dot_ab=_DOT.format(a="a.embedding", b="b.embedding"),
    dot_aa=_DOT.format(a="a.embedding", b="a.embedding"),
    dot_bb=_DOT.format(a="b.embedding", b="b.embedding"),
)


def _aug_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planted-dup embedding corpus (mirrors _ND_PAIRS_CTES's aug)."""
    base = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") < 200
    ).select("vec_id", "embedding")
    dups = base.where(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x * F.lit(2.0).cast("float")
        ).alias("embedding"),
    )
    return base.unionByName(dups)


@register(
    "embedding_near_dup_ann",
    oracle="""
    WITH {nd}
    SELECT id_b AS dup_id, CAST(MIN(id_a) AS BIGINT) AS kept_id
    FROM nd GROUP BY id_b
    """.format(nd=_ND_PAIRS_CTES),
)
def embedding_near_dup_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _aug_embeddings(spark, sf_dir)
    return SIM.near_dup_ann(aug, "vec_id", "embedding", threshold=0.9)


# ---------------------------------------------------------------------------
# SimHash bucket near-dup candidates: identical 16-bit simhash => pair.
# Per-row signature (zero shuffle) + one equi-join on the bucket value —
# the hash-bucket analogue of the MinHash band join.
# ---------------------------------------------------------------------------
@register(
    "simhash_bucket_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS t
      FROM documents WHERE doc_id < 800
    ), sh AS (
      SELECT doc_id, CAST({bits} AS INT) AS simhash FROM toks
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.simhash
    FROM sh a JOIN sh b ON a.simhash = b.simhash AND a.doc_id < b.doc_id
    """.format(bits=_SIMHASH_BIT_SQL),
)
def simhash_bucket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 800)
    sh = DD.simhash16_agg(d, "doc_id", "text")
    a = sh.select(F.col("doc_id").alias("id_a"), "simhash")
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"))
    return (
        a.join(b, (F.col("simhash") == F.col("sh_b"))
               & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b", "simhash")
    )


# ---------------------------------------------------------------------------
# Near-dup clustering: LSH candidate pairs -> connected components -> one
# canonical representative (component min) + cluster size. The step a real
# dedup pipeline runs after candidate generation — pairwise drops under-
# merge transitive chains (a~b, b~c but a!~b by pair logic); components
# give each doc exactly one canonical id. Oracle: DuckDB WITH RECURSIVE
# transitive closure over the SAME candidate edges — the fixpoint
# (component minimum) is unique, so the iterative Spark propagation and
# the recursive SQL closure must agree bit-for-bit.
# ---------------------------------------------------------------------------
# Recursive-closure tail shared by every clustering oracle: components
# (min label per node) + per-component sizes over a pair CTE named
# ``{pairs}``, output id column named ``{id}``.
_CLOSURE_SQL = """edges AS (
  SELECT id_a AS src, id_b AS dst FROM {pairs}
  UNION ALL
  SELECT id_b, id_a FROM {pairs}
),
reach(node, lbl) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (
  SELECT node AS {id}, MIN(lbl) AS rep_id FROM reach GROUP BY node
),
sizes AS (
  SELECT rep_id, COUNT(*) AS cluster_size FROM comp GROUP BY rep_id
)
SELECT c.{id}, c.rep_id, s.cluster_size
FROM comp c JOIN sizes s USING (rep_id)
"""

_CLUSTER_ORACLE = (
    "WITH RECURSIVE cand AS ({lsh}),\n".format(lsh=_LSH_ORACLE)
    + _CLOSURE_SQL.format(pairs="cand", id="doc_id")
)


@register("near_dup_clusters", oracle=_CLUSTER_ORACLE)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = DD.minhash_lsh_candidates(d, "doc_id", "text", k=6, band_size=2)
    return DD.cluster_representatives(pairs).select(
        F.col("node").alias("doc_id"),
        F.col("rep").alias("rep_id"),
        "cluster_size",
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination: corpus docs sharing any word 4-gram with the
# held-out eval slice (doc_id % 17 = 3 — deterministic, no external data).
# The eval n-gram set is broadcast; the corpus side never shuffles its
# grams. Output: contaminated doc -> count of shared distinct 4-grams.
# ---------------------------------------------------------------------------
@register(
    "decontaminate_ngrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ), grams AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(l) - 2),
               i -> md5(l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]))) AS gs
      FROM toks WHERE len(l) >= 4
    ), g AS (
      SELECT doc_id, unnest(gs) AS g FROM grams
    ), ev AS (
      SELECT DISTINCT g FROM g WHERE doc_id % 17 = 3
    ), tr AS (
      SELECT doc_id, g FROM g WHERE doc_id % 17 <> 3
    )
    SELECT tr.doc_id, COUNT(*) AS n_shared
    FROM tr JOIN ev USING (g) GROUP BY tr.doc_id
    """,
)
def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ev = d.where(F.col("doc_id") % 17 == 3)
    tr = d.where(F.col("doc_id") % 17 != 3)
    return DD.decontaminate(tr, ev, "doc_id", "text", n=4)


# ---------------------------------------------------------------------------
# Sequence packing: pack docs into fixed 512-token bins, shard-local
# (bucket = doc_id % 8) and deterministic — the pretraining-batch layout
# step. One window shuffle on the bucket; a corpus-wide ORDER BY pack
# would be a single-partition window (the scale trap this shape avoids;
# real packers pack per shard anyway).
# ---------------------------------------------------------------------------
@register(
    "sequence_packing",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             doc_id % 8 AS bucket
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens, bucket,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_excl
      FROM t
    )
    SELECT doc_id, n_tokens, bucket,
           cum_excl // 512 AS bin_id,
           cum_excl % 512 AS bin_offset
    FROM c
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    return pack_sequences(
        d, "doc_id", TX.token_count(F.col("text")), capacity=512, n_buckets=8
    )


# ---------------------------------------------------------------------------
# Transitive embedding dedup: the SAME verified near-dup pairs as
# embedding_near_dup_ann, run through connected components — the
# pairwise min-id election under-merges a~b~c chains (b is then both
# dup and kept); the closure gives every vector exactly one canonical
# representative. Tail query: each stage is driver-proven by
# embedding_near_dup_ann (pairs) + near_dup_clusters (closure).
# ---------------------------------------------------------------------------
@register(
    "embedding_dup_clusters",
    oracle="WITH RECURSIVE " + _ND_PAIRS_CTES + ",\n"
    + _CLOSURE_SQL.format(pairs="nd", id="vec_id"),
)
def embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _aug_embeddings(spark, sf_dir)
    pairs = SIM.near_dup_pairs_ann(aug, "vec_id", "embedding", threshold=0.9)
    return DD.cluster_representatives(pairs).select(
        F.col("node").alias("vec_id"),
        F.col("rep").alias("rep_id"),
        "cluster_size",
    )


# ---------------------------------------------------------------------------
# Chunk-level exact dedup (C4-style span dedup): segment docs into 8-token
# chunks, drop every chunk seen earlier in the corpus (first occurrence by
# (doc_id, pos) wins), reassemble. One md5(chunk)-keyed shuffle — the C4
# paper's three-sentence-span dedup with deterministic token windows.
# ---------------------------------------------------------------------------
_CHUNK_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS l
  FROM documents
), ch AS (
  SELECT doc_id, i AS pos,
         array_to_string(l[(i*8+1):(i*8+8)], ' ') AS chunk
  FROM toks, unnest(range(CAST(ceil(len(l)/8.0) AS BIGINT))) AS u(i)
), r AS (
  SELECT doc_id, pos, chunk,
         (row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, pos)) = 1 AS keep
  FROM ch
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       string_agg(CASE WHEN keep THEN chunk END, ' ' ORDER BY pos) AS text_kept
FROM r GROUP BY doc_id
"""


@register("chunk_dedup_docs", oracle=_CHUNK_ORACLE)
def chunk_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return DD.chunk_dedup(d, "doc_id", "text", chunk_tokens=8)


# ---------------------------------------------------------------------------
# Per-domain quota cap (RefinedWeb/C4 corpus mixing): keep the top-15 docs
# per source by quality — salted two-phase window, bit-identical to the
# single-window form, never serializes a mega-domain into one task.
# ---------------------------------------------------------------------------
_QUOTA_ORACLE = """
WITH scored AS (
  SELECT doc_id, source,
         CAST((CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 3 ELSE 0 END)
            + (CASE WHEN 10 * len(list_filter(string_split(text, ' '),
                                              x -> x IN {stop}))
                    >= len(string_split(text, ' ')) THEN 2 ELSE 0 END)
            + (CASE WHEN len(string_split(text, ' ')) >= 30
                    THEN 1 ELSE 0 END) AS INT) AS quality
  FROM documents
), r AS (
  SELECT doc_id, source, quality,
         CAST(row_number() OVER (PARTITION BY source
                ORDER BY quality DESC, doc_id) AS INT) AS quota_rank
  FROM scored
)
SELECT doc_id, source, quality, quota_rank FROM r WHERE quota_rank <= 15
""".format(stop=_STOP_SQL)


@register("domain_quota_cap", oracle=_QUOTA_ORACLE)
def domain_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mixing import quota_cap

    d = load_table(spark, sf_dir, "documents").withColumn(
        "quality", TX.quality_score(F.col("text"), F.col("n_chars"))
    )
    return quota_cap(
        d, "source", [F.col("quality").desc(), F.col("doc_id")], cap=15
    ).select("doc_id", "source", "quality", "quota_rank")


# ---------------------------------------------------------------------------
# K-means cluster assignment over embeddings (SemDeDup-style corpus
# diversification): md5-ordered deterministic init (oracle-replayable),
# one Lloyd refinement pass, final nearest-centroid assignment. Spark
# side: TakeOrderedAndProject init + Arrow-batched assignment + one
# map-side-combined means agg — only the C x dim table reaches the driver.
# ---------------------------------------------------------------------------
_KM_MEANS_SQL = ", ".join(f"AVG(embedding[{i}]::DOUBLE)" for i in range(1, 65))
_KM_CTES = """e AS (SELECT vec_id, embedding FROM embeddings),
h AS (
  SELECT vec_id, embedding,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell
  FROM e
), init AS (
  SELECT cell, list_transform(embedding, x -> x::DOUBLE) AS cent
  FROM h WHERE cell < 10
), a0 AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, i.cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(
               list_transform(e.embedding, x -> x::DOUBLE), i.cent) DESC,
             i.cell) AS rn
    FROM e CROSS JOIN init i
  ) WHERE rn = 1
), m AS (
  SELECT a0.cell, list_value({means}) AS cent
  FROM a0 JOIN e USING (vec_id) GROUP BY a0.cell
), fin AS (
  SELECT i.cell, COALESCE(m.cent, i.cent) AS cent
  FROM init i LEFT JOIN m ON i.cell = m.cell
), a1 AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, f.cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(
               list_transform(e.embedding, x -> x::DOUBLE), f.cent) DESC,
             f.cell) AS rn
    FROM e CROSS JOIN fin f
  ) WHERE rn = 1
)""".format(means=_KM_MEANS_SQL)

_KM_ORACLE = (
    "WITH " + _KM_CTES + """
SELECT vec_id, CAST(cell AS INT) AS cell,
       CAST(COUNT(*) OVER (PARTITION BY cell) AS BIGINT) AS cell_size
FROM a1
"""
)

def _km_assign(spark: SparkSession, sf_dir: str):
    e = load_table(spark, sf_dir, "embeddings")
    return e, SIM.kmeans_assign(
        e, "vec_id", "embedding", n_cells=10, lloyd_iters=1,
        order_hash=lambda c: F.md5(c.cast("string")),
    )


@register("kmeans_cells", oracle=_KM_ORACLE)
def kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, (asg, _cent) = _km_assign(spark, sf_dir)
    return asg.select(
        "vec_id", "cell",
        F.count("*").over(W.partitionBy("cell")).cast("long")
        .alias("cell_size"),
    )


# ---------------------------------------------------------------------------
# Semantic diversification (SemDeDup keep-most-central): within each
# k-means cell keep the 20 vectors most similar to the final centroid —
# composition of kmeans_assign + the salted quota_cap window. Output is
# integer-only (rank, not sim) so the hash is FP-noise-immune.
# ---------------------------------------------------------------------------
_DIVERSIFY_ORACLE = (
    "WITH " + _KM_CTES + """, sims AS (
  SELECT a1.vec_id, a1.cell,
         list_cosine_similarity(
           list_transform(e.embedding, x -> x::DOUBLE), f.cent) AS sim
  FROM a1 JOIN e USING (vec_id) JOIN fin f ON a1.cell = f.cell
), rk AS (
  SELECT vec_id, cell,
         CAST(row_number() OVER (PARTITION BY cell
                ORDER BY sim DESC, vec_id) AS INT) AS quota_rank
  FROM sims
)
SELECT vec_id, CAST(cell AS INT) AS cell, quota_rank
FROM rk WHERE quota_rank <= 20
"""
)


@register("semantic_diversify", oracle=_DIVERSIFY_ORACLE)
def semantic_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mixing import quota_cap

    e, (asg, cent) = _km_assign(spark, sf_dir)
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(cent)],
        "cell int, cent array<double>",
    )
    scored = (
        e.join(asg, "vec_id")
        .join(F.broadcast(cent_df), "cell")
        .withColumn("sim", SIM.cosine(F.col("embedding"), F.col("cent")))
    )
    return quota_cap(
        scored, "cell", [F.col("sim").desc(), F.col("vec_id")], cap=20
    ).select("vec_id", "cell", "quota_rank")


# ---------------------------------------------------------------------------
# Fast-hash (xxhash64) MinHash-LSH, value-checked through a
# hash-independent verify stage.  The md5 family above is the
# cross-engine-restatable form; production at 100 TB wants JVM-native
# xxhash64 lanes (several times cheaper per shingle, and the min-agg
# shuffle carries 8-byte longs instead of 10-char hex strings).  DuckDB
# cannot recompute xxhash64, so the oracle states the TRUTH instead:
# every pair with shingle-Jaccard >= 0.97 (integer cross-multiplied).
# The Spark side routes candidates through the xxhash64 banding and then
# the exact shingle-Jaccard verify — so a hash-green row proves the fast
# path's recall on these pairs is complete.  (Per-pair candidate
# probability at J=0.97 with k=6/band_size=2 is 1-(1-J^2)^3 ~ 0.99986;
# on the frozen testdata corpora recall is verified complete at both
# sf0.001 and sf0.01, and data + hash are deterministic, so the check is
# stable, not flaky.)
# ---------------------------------------------------------------------------

_SHINGLE_TRUTH_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(l) - 1),
                       i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS s
  FROM toks WHERE len(l) >= 3
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       len(list_intersect(a.s, b.s)) AS n_intersect,
       len(list_distinct(list_concat(a.s, b.s))) AS n_union
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s)) * 100
      >= len(list_distinct(list_concat(a.s, b.s))) * 97
"""


@register("near_dup_pairs_fast", oracle=_SHINGLE_TRUTH_SQL)
def near_dup_pairs_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cand = DD.minhash_lsh_candidates(
        d, "doc_id", "text", k=6, band_size=2, hash_family="xxhash64")
    sh = d.select(
        "doc_id",
        F.array_distinct(DD.word_shingles(F.col("text"), 3)).alias("s"),
    ).where(F.size("s") >= 1)
    ni = F.size(F.array_intersect("sa", "sb"))
    nu = F.size(F.array_distinct(F.concat("sa", "sb")))
    return (
        cand
        .join(sh.select(F.col("doc_id").alias("id_a"),
                        F.col("s").alias("sa")), "id_a")
        .join(sh.select(F.col("doc_id").alias("id_b"),
                        F.col("s").alias("sb")), "id_b")
        .select(
            "id_a", "id_b",
            ni.cast("long").alias("n_intersect"),
            nu.cast("long").alias("n_union"),
        )
        .where(F.col("n_intersect") * 100 >= F.col("n_union") * 97)
    )


# ---------------------------------------------------------------------------
# LSH operating point: ONE row of integer counts quantifying the
# candidate generator against brute-force truth on a bounded slice
# (doc_id < 200 keeps the quadratic truth oracle-computable, the
# ngram_jaccard_pairs pattern).  n_true = pairs with shingle-Jaccard
# >= 1/2; n_candidates = banded-LSH candidate pairs on the slice;
# n_hits = their intersection.  Recall = n_hits/n_true and precision =
# n_hits/n_candidates stay caller-side divisions — the driver-checked
# artifact is the exact integer triple.  The production observability
# hook for tuning (k, band_size) per corpus, same spirit as
# robots.fast_path_guard_rate.
# ---------------------------------------------------------------------------

_SLICE_LSH_SQL = _LSH_ORACLE.replace(
    "FROM documents", "FROM (SELECT * FROM documents WHERE doc_id < 200)")

_SLICE_TRUTH_SQL = """
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM (
    SELECT doc_id,
           list_distinct(list_transform(range(1, len(l) - 1),
                         i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS s
    FROM (SELECT doc_id, string_split(text, ' ') AS l
          FROM documents WHERE doc_id < 200)
    WHERE len(l) >= 3
  ) a JOIN (
    SELECT doc_id,
           list_distinct(list_transform(range(1, len(l) - 1),
                         i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS s
    FROM (SELECT doc_id, string_split(text, ' ') AS l
          FROM documents WHERE doc_id < 200)
    WHERE len(l) >= 3
  ) b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s)) * 2
        >= len(list_distinct(list_concat(a.s, b.s)))
"""


@register(
    "lsh_operating_point",
    oracle="""
    WITH cand AS ({cand}), truth AS ({truth})
    SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
           CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT COUNT(*) FROM cand c
                 JOIN truth t ON c.id_a = t.id_a AND c.id_b = t.id_b)
                AS BIGINT) AS n_hits
    """.format(cand=_SLICE_LSH_SQL, truth=_SLICE_TRUTH_SQL),
)
def lsh_operating_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    cand = DD.minhash_lsh_candidates(d, "doc_id", "text", k=6, band_size=2)
    sh = d.select(
        "doc_id",
        F.array_distinct(DD.word_shingles(F.col("text"), 3)).alias("s"),
    ).where(F.size("s") >= 1)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    ni = F.size(F.array_intersect("sa", "sb"))
    nu = F.size(F.array_distinct(F.concat("sa", "sb")))
    truth = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .where(ni * 2 >= nu)
        .select("id_a", "id_b")
    )
    hits = cand.join(truth, ["id_a", "id_b"])
    return (
        truth.agg(F.count("*").cast("long").alias("n_true"))
        .crossJoin(cand.agg(
            F.count("*").cast("long").alias("n_candidates")))
        .crossJoin(hits.agg(F.count("*").cast("long").alias("n_hits")))
    )
