"""Round-5 composed curation queries.

``curation_e2e`` is THE artifact a training-data user runs: one chained
pipeline from crawled pages to packed pretraining bins —

    crawl (2 engine rounds) -> corpus clean (exact dedup + LSH near-dup
    drop + lang/quality gates) -> transitive near-dup clustering (keep
    component minima) -> benchmark n-gram decontamination -> stable
    train/val/test split -> per-(split, bucket) sequence packing

— value-checked as ONE DuckDB oracle (the unrolled crawl SQL of
crawl_queries feeding the corpus_clean/cluster/decontaminate/split/pack
restatements of pipeline_queries/sampling_queries).  Every stage is the
individually-driver-proven operator; this query proves the COMPOSITION.

``cross_modal_dedup`` is the multimodal curation primitive the
image+caption north rule implies: pairs that are duplicates in BOTH
modalities (caption MinHash-LSH + exact Jaccard, pixel phash bands),
joined on the canonical pair key — see frontier/images.py::
cross_modal_dupes for the scale shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..frontier import synth
from ..frontier.engine import run_crawl
from ..functions import text as TX
from ..operators import dedup as DD
from ..operators.packing import pack_sequences
from ..operators.sampling import (
    hex_threshold,
    oracle_hash_prefix_sql,
    train_val_test_split,
)
from ..sources.testdata import load_table
from .crawl_queries import (
    K_PER_HOST, N_HOSTS, N_SEEDS, _oracle_sql, _phash_values_sql,
)
from .pipeline_queries import _MH_SQL, _STOP_SQL
from .registry import register

# ---------------------------------------------------------------------------
# curation_e2e
# ---------------------------------------------------------------------------

_VAL_FRAC, _TEST_FRAC, _SPLIT_SEED = 0.1, 0.1, "split0"
_CAPACITY, _N_BUCKETS = 512, 8
_H_SPLIT = oracle_hash_prefix_sql("doc_id", _SPLIT_SEED)

# The whole post-crawl chain as a continuation of the crawl CTE list
# (passed to crawl_queries._oracle_sql as final_select, so fetched1/2 are
# in scope).  Stage restatements mirror the proven single-stage oracles:
# corpus_clean (_CLEAN_ORACLE), near_dup_clusters (_CLOSURE_SQL),
# decontaminate_ngrams, corpus_split_stats, sequence_packing.
_E2E_TAIL = """
, nd AS (SELECT COUNT(*) AS n FROM documents)
, crawled AS MATERIALIZED (
    SELECT DISTINCT (f.p * 5 + j.range) % (SELECT n FROM nd) AS doc_id
    FROM (SELECT p FROM fetched1 WHERE status = 200
          UNION ALL SELECT p FROM fetched2 WHERE status = 200
          UNION ALL SELECT p FROM fetched3 WHERE status = 200) f
    CROSS JOIN range(5) j
)
, docs AS MATERIALIZED (
    SELECT d.doc_id, d.text, d.n_chars
    FROM documents d JOIN crawled USING (doc_id)
)
, ddup AS MATERIALIZED (
    SELECT doc_id, text, n_chars FROM (
      SELECT doc_id, text, n_chars,
             ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM docs
    ) WHERE rn = 1
)
, ctoks AS (SELECT doc_id, string_split(text, ' ') AS l FROM ddup)
, csh AS (
    SELECT doc_id, list_transform(range(1, len(l) - 1),
                                  i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]) AS sh
    FROM ctoks WHERE len(l) >= 3
)
, cshingle AS (SELECT doc_id, unnest(sh) AS s FROM csh)
, chashed AS (SELECT doc_id, md5(s) AS d1, md5('x' || s) AS d2 FROM cshingle)
, csig AS MATERIALIZED (SELECT doc_id, {mh} FROM chashed GROUP BY doc_id)
, cbands AS MATERIALIZED (
    SELECT doc_id, 0 AS band_idx, md5(mh0 || '_' || mh1) AS band_key FROM csig
    UNION ALL SELECT doc_id, 1, md5(mh2 || '_' || mh3) FROM csig
    UNION ALL SELECT doc_id, 2, md5(mh4 || '_' || mh5) FROM csig
)
, ccand AS (
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
    FROM cbands l JOIN cbands r
      ON l.band_idx = r.band_idx AND l.band_key = r.band_key
     AND l.doc_id < r.doc_id
)
, cdtk AS MATERIALIZED (
    SELECT doc_id, list_distinct(string_split(text, ' ')) AS t FROM ddup
)
, cdrops AS (
    SELECT DISTINCT c.id_b
    FROM ccand c JOIN cdtk a ON c.id_a = a.doc_id
                 JOIN cdtk b ON c.id_b = b.doc_id
    WHERE 2 * len(list_intersect(a.t, b.t))
          >= len(list_distinct(list_concat(a.t, b.t)))
)
, cleaned AS MATERIALIZED (
    SELECT d.doc_id, d.text FROM ddup d
    WHERE d.doc_id NOT IN (SELECT id_b FROM cdrops)
      AND 10 * len(list_filter(string_split(d.text, ' '), x -> x IN {stop}))
          >= len(string_split(d.text, ' '))
      AND (CASE WHEN d.n_chars BETWEEN 100 AND 2000 THEN 3 ELSE 0 END)
        + (CASE WHEN 10 * len(list_filter(string_split(d.text, ' '),
                                          x -> x IN {stop}))
                >= len(string_split(d.text, ' ')) THEN 2 ELSE 0 END)
        + (CASE WHEN len(string_split(d.text, ' ')) >= 30
                THEN 1 ELSE 0 END) >= 4
)
, kbands AS (SELECT b.* FROM cbands b JOIN cleaned USING (doc_id))
, kcand AS (
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
    FROM kbands l JOIN kbands r
      ON l.band_idx = r.band_idx AND l.band_key = r.band_key
     AND l.doc_id < r.doc_id
)
, cedges AS (SELECT id_a AS src, id_b AS dst FROM kcand
             UNION ALL SELECT id_b, id_a FROM kcand)
, creach(node, lbl) AS (
    SELECT DISTINCT src, src FROM cedges
    UNION
    SELECT e.dst, r.lbl FROM creach r JOIN cedges e ON e.src = r.node
)
, ccomp AS (SELECT node, MIN(lbl) AS rep FROM creach GROUP BY node)
, kept AS MATERIALIZED (
    SELECT c.doc_id, c.text FROM cleaned c
    WHERE c.doc_id NOT IN (SELECT node FROM ccomp WHERE node <> rep)
      AND c.doc_id % 17 <> 3
)
, ktoks AS (SELECT doc_id, string_split(text, ' ') AS l FROM kept)
, kgr AS (
    SELECT doc_id, list_distinct(list_transform(range(1, len(l) - 2),
      i -> md5(l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]))) AS gs
    FROM ktoks WHERE len(l) >= 4
)
, kg AS (SELECT doc_id, unnest(gs) AS g FROM kgr)
, etoks AS (SELECT doc_id, string_split(text, ' ') AS l
            FROM documents WHERE doc_id % 17 = 3)
, egr AS (
    SELECT doc_id, list_distinct(list_transform(range(1, len(l) - 2),
      i -> md5(l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]))) AS gs
    FROM etoks WHERE len(l) >= 4
)
, eg AS (SELECT DISTINCT unnest(gs) AS g FROM egr)
, contaminated AS (SELECT DISTINCT kg.doc_id FROM kg JOIN eg USING (g))
, final AS MATERIALIZED (
    SELECT k.doc_id, k.text FROM kept k
    WHERE k.doc_id NOT IN (SELECT doc_id FROM contaminated)
)
, labeled AS (
    SELECT doc_id, text,
           CASE WHEN {h} < '{t_val}' THEN 'val'
                WHEN {h} < '{t_vt}' THEN 'test'
                ELSE 'train' END AS split
    FROM final
)
, ptk AS (
    SELECT split, doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           doc_id % {nb} AS bucket
    FROM labeled
)
, cum AS (
    SELECT split, doc_id, n_tokens, bucket,
           CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY split, bucket ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS cum_excl
    FROM ptk
)
SELECT split, doc_id, n_tokens, bucket,
       cum_excl // {cap} AS bin_id,
       cum_excl % {cap} AS bin_offset
FROM cum
""".format(
    mh=_MH_SQL, stop=_STOP_SQL, h=_H_SPLIT,
    t_val=hex_threshold(_VAL_FRAC),
    t_vt=hex_threshold(_VAL_FRAC + _TEST_FRAC),
    nb=_N_BUCKETS, cap=_CAPACITY,
)

# the closure CTE needs the RECURSIVE keyword up front; the crawl CTEs
# are plain (DuckDB allows non-recursive CTEs under WITH RECURSIVE)
_E2E_ORACLE = _oracle_sql(rounds=3, final_select=_E2E_TAIL).replace(
    "WITH ", "WITH RECURSIVE ", 1)


@register("curation_e2e", oracle=_E2E_ORACLE)
def curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl -> clean -> cluster -> decontaminate -> split -> pack, one
    query, one oracle (r04 verdict #7).  Returns one row per surviving
    doc: (split, doc_id, n_tokens, bucket, bin_id, bin_offset)."""
    docs_t = load_table(spark, sf_dir, "documents")
    n_docs = docs_t.count()
    n_pages = load_table(spark, sf_dir, "orders").count()
    web = synth.web_graph(spark, n_pages, N_HOSTS)
    robots = synth.robots_dim(spark, N_HOSTS)
    seeds = synth.seed_urls(spark, n_pages, N_SEEDS, N_HOSTS)
    state = run_crawl(spark, web, seeds, robots, rounds=3,
                      k_per_host=K_PER_HOST)
    pages = state.pages[0]
    for d in state.pages[1:]:
        pages = pages.unionByName(d)
    # crawl -> corpus bridge: each fetched page yields 5 docs
    # ((page_id*5 + j) mod |documents|) — the fetch count is politeness-
    # budget-bound, so a 1:1 bridge would starve the downstream stages
    ids = (
        pages.select(
            "page_id",
            F.explode(F.sequence(F.lit(0), F.lit(4))).alias("j"),
        )
        .select(
            F.pmod(F.col("page_id") * 5 + F.col("j"),
                   F.lit(n_docs)).alias("doc_id")
        )
        .distinct()
    )
    docs = docs_t.join(ids, "doc_id")

    # clean (the corpus_clean recipe: exact dedup + verified LSH pair
    # drop + lang/quality gates)
    survivors = DD.corpus_near_dup_dedup(docs, "doc_id", "text")
    cleaned = (
        survivors
        .where(TX.lang_guess(F.col("text")) == "en")
        .where(TX.quality_score(F.col("text"), F.col("n_chars")) >= 4)
    )

    # transitive near-dup clustering on the cleaned corpus: keep each
    # component's minimum (pairwise drops under-merge a~b~c chains)
    pairs = DD.minhash_lsh_candidates(cleaned, "doc_id", "text",
                                      k=6, band_size=2)
    comp = DD.cluster_representatives(pairs)
    dup_nodes = comp.where(F.col("node") != F.col("rep")).select(
        F.col("node").alias("doc_id"))
    kept = cleaned.join(dup_nodes, "doc_id", "left_anti").where(
        F.col("doc_id") % 17 != 3)

    # benchmark decontamination vs the held-out eval slice of the RAW
    # corpus (doc_id % 17 = 3 — same slice as decontaminate_ngrams)
    ev = docs_t.where(F.col("doc_id") % 17 == 3)
    cont = DD.decontaminate(kept, ev, "doc_id", "text", n=4).select("doc_id")
    final = kept.join(cont, "doc_id", "left_anti")

    # stable split, then pack each (split, bucket) shard independently
    labeled = train_val_test_split(final, "doc_id", _VAL_FRAC, _TEST_FRAC,
                                   seed=_SPLIT_SEED)
    return pack_sequences(
        labeled, "doc_id", TX.token_count(F.col("text")),
        capacity=_CAPACITY, n_buckets=_N_BUCKETS, partition_extra=("split",),
    )


# ---------------------------------------------------------------------------
# cross_modal_dedup
# ---------------------------------------------------------------------------

_XM_CAP = 1500     # corpus size cap (images)
_XM_DUPS = 40      # planted duplicate count (re-posts: same pixels+caption)
_XM_OFF = 100000   # planted duplicate id offset


@register(
    "cross_modal_dedup",
    oracle=f"""
    WITH ph(pid, ph) AS (VALUES {_phash_values_sql()}),
    nn AS (SELECT LEAST(COUNT(*), {_XM_CAP}) AS n FROM documents),
    base AS (
      SELECT r.range AS image_id,
             'synthetic photo ' || r.range || ': dominant rgb ('
               || (r.range * 7) % 256 || ',' || (r.range * 13) % 256 || ','
               || r.range % 256 || ')' AS caption,
             p.ph AS phash
      FROM range(0, {_XM_CAP}) r JOIN ph p ON r.range % 256 = p.pid
      WHERE r.range < (SELECT n FROM nn)
    ),
    aug AS MATERIALIZED (
      SELECT image_id, caption, phash FROM base
      UNION ALL
      SELECT image_id + {_XM_OFF}, caption, phash
      FROM base WHERE image_id < {_XM_DUPS}
    ),
    toks AS (SELECT image_id, string_split(caption, ' ') AS l FROM aug),
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
           FROM aug),
    verified AS (
      SELECT c.id_a, c.id_b,
             CAST(len(list_intersect(a.t, b.t)) AS INT) AS n_intersect,
             CAST(len(list_distinct(list_concat(a.t, b.t))) AS INT) AS n_union
      FROM cand c JOIN tk a ON c.id_a = a.image_id
                  JOIN tk b ON c.id_b = b.image_id
      WHERE 2 * len(list_intersect(a.t, b.t))
            >= len(list_distinct(list_concat(a.t, b.t)))
    ),
    php AS (
      SELECT a.image_id AS id_a, b.image_id AS id_b,
             CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
      FROM aug a JOIN aug b ON a.image_id < b.image_id
      WHERE bit_count(xor(a.phash, b.phash)) <= 6
    )
    SELECT v.id_a, v.id_b, p.hamming, v.n_intersect, v.n_union
    FROM verified v JOIN php p USING (id_a, id_b)
    """,
)
def cross_modal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image pairs that near-match in BOTH modalities (caption
    MinHash-LSH + Jaccard >= 1/2, phash Hamming <= 6) over a corpus with
    planted re-posts (same pixels + same alt text under a new id) — the
    brute-force oracle recomputes both candidate streams from the pure
    id->caption/id->phash functions.  r04 verdict #9."""
    from ..frontier import images as I

    n = min(load_table(spark, sf_dir, "documents").count(), _XM_CAP)
    imgs = I.images_table(spark, n).select(
        F.col("image_id").cast("long").alias("image_id"), "caption", "phash")
    dups = imgs.where(F.col("image_id") < _XM_DUPS).select(
        (F.col("image_id") + _XM_OFF).alias("image_id"), "caption", "phash")
    aug = imgs.unionByName(dups)
    pairs = I.cross_modal_dupes(aug, max_hamming=6)
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("int").alias("hamming"),
        F.col("n_intersect").cast("int").alias("n_intersect"),
        F.col("n_union").cast("int").alias("n_union"),
    )


# ---------------------------------------------------------------------------
# DSIR-style hashed-token importance weights (Xie et al. 2023): score
# every document by target-vs-raw hashed-feature hit mass, as exact
# integers (see operators/importance.py).  Target domain = the 'fr'
# minority slice — rank or threshold callers use integer
# cross-multiplication on (imp_num, imp_den).
# ---------------------------------------------------------------------------


_DSIR_WEIGHTS_SQL = """
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(list_distinct(list_filter(
                 regexp_split_to_array(text, '\\s+'), t -> t <> ''))) AS t
      FROM documents
    ), bucketed AS (
      SELECT doc_id, lang, substr(md5(t), 1, 2) AS b FROM toks
    ), stats AS (
      SELECT b,
             CAST(COUNT(*) AS BIGINT) AS raw_cnt,
             CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END)
                  AS BIGINT) AS tgt_cnt
      FROM bucketed GROUP BY b
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(s.tgt_cnt) AS BIGINT) AS imp_num,
           CAST(SUM(s.raw_cnt) AS BIGINT) AS imp_den
    FROM bucketed t JOIN stats s USING (b)
    GROUP BY t.doc_id
"""


@register(
    "dsir_importance",
    oracle=_DSIR_WEIGHTS_SQL,
)
def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.importance import importance_weights

    d = load_table(spark, sf_dir, "documents")
    return importance_weights(d, "doc_id", "text", F.col("lang") == "fr")


# ---------------------------------------------------------------------------
# DSIR selection (the step after the weights): real DSIR keeps the
# top-eta most target-like documents, so selection is a TOP-K by
# affinity, not an absolute cut (the synthetic corpus's affinity ratios
# shift with SF — an absolute threshold keeps everything at one SF and
# nothing at another, which is exactly why quantile selection is the
# standard).  Affinity is quantized engine-exactly (num * 10^12 div den
# — integral, monotone in the true ratio; doc_id breaks ties), the
# global top-100 runs through the salted two-phase quota_cap with a
# constant key (never a single-partition window), and a deterministic
# hash-threshold half of the winners is the sampled budget.
# ---------------------------------------------------------------------------


@register(
    "dsir_resample",
    oracle="""
    WITH w AS ({weights}),
    scored AS (
      SELECT doc_id, n_tokens, imp_num, imp_den,
             CAST((imp_num * 1000000000000) // imp_den AS BIGINT) AS affinity
      FROM w
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY affinity DESC, doc_id ASC) AS rn
      FROM scored
    )
    SELECT doc_id, n_tokens, imp_num, imp_den, affinity
    FROM ranked
    WHERE rn <= 100 AND {prefix} < '80000000'
    """.format(
        weights=_DSIR_WEIGHTS_SQL,
        prefix=oracle_hash_prefix_sql("doc_id", "dsir0"),
    ),
)
def dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.importance import importance_weights
    from ..operators.mixing import quota_cap
    from ..operators.sampling import hash_sample

    d = load_table(spark, sf_dir, "documents")
    w = importance_weights(d, "doc_id", "text", F.col("lang") == "fr")
    scored = w.withColumn(
        "affinity",
        F.expr("imp_num * 1000000000000 div imp_den").cast("long"))
    # plain columns only (quota_cap salts on the last order column, so
    # SortOrder wrappers are out of contract): descending affinity =
    # ascending negated affinity; doc_id last as the unique tiebreak
    top = quota_cap(
        scored.withColumn("__all", F.lit(1)),
        "__all",
        [F.col("affinity") * -1, F.col("doc_id")],
        cap=100,
    ).drop("__all", "quota_rank")
    return hash_sample(top, "doc_id", 0.5, seed="dsir0")
