"""Driver-window contract: the grading driver runs exactly the first 50
``queries()`` entries (CORRECTNESS_r01..r04 each have exactly 50 rows), so
every operator-covering query from SURVEY.md §2 must land inside that
window.  Round 2 lost driver rows for 11 queries because the round-2
flagship work was appended at registry positions 50-60; this test pins
the fix (registry.ordered_queries + DRIVER_DEMOTED) so a future
registration can't silently starve the check again.

Round 5 adds the ROTATION contract (r04 verdict #2): long-proven window
queries rotate to the tail for one round so never-driver-run tail queries
earn first-ever driver rows.  Rotation is evidence-based — each rotated
query must already hold full-pass rows in >= 2 past CORRECTNESS files
(asserted below from the actual driver output, not from memory).
"""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entry_mod
from crawler_spark.plans import (
    DRIVER_DEMOTED, DRIVER_ROTATED, DRIVER_TAIL_NEW, DRIVER_WINDOW, QUERIES,
    ordered_queries,
)

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries that MUST have a driver correctness row: one per operator
# family whose only covering query sat past the window in r02 (VERDICT
# "untested (driver)" components A8/A9, H1/H2/H3, C9/C10, A15-parse,
# A6-headers, D1/G1-deep, E1-geo) plus the scale-form cosine anchor,
# plus the r05 first-ever promotions.
WINDOW_CRITICAL = [
    "crawl_delay_budget_golden",  # G1 heterogeneous crawl_delay budgets
    "crawl_5round_golden",        # D1 bloom + G1 cooldown deep oracle
    "crawl_pages_headers",        # A6/A12 headers map
    "image_payload_verify",       # A8/A9 binary cols + codec
    "image_phash_near_dup",       # image near-dup (phash bands)
    "html_parse_fields_udf",      # C4-C10, H3
    "html_extract_links_udf",     # H1
    "html_extract_images_udf",    # H2
    "robots_txt_parse",           # A15 parse
    "robots_can_fetch",           # A15 matching
    "priority_assign_geo",        # E1 geo-fixture form
    "embedding_cosine_topk_matmul",  # exact-cosine scale anchor
    "crawl_pages_with_captions",  # north-rule image+caption table
    "video_frame_sample",         # multimodal video frame-sample (r04)
    "audio_energy_windows",       # multimodal audio feature-extract (r04)
    "corpus_split_stats",         # deterministic split/sampling (r04)
    "near_dup_clusters",          # connected-components clustering (r04)
    "decontaminate_ngrams",       # eval-set n-gram decontamination (r04)
    "sequence_packing",           # pretraining bin packing (r04)
    # r05 first-ever promotions (never driver-run before this round)
    "video_near_dup",             # composed video content-ID chain
    "stratified_sample",          # per-stratum hash-threshold sampling
    "embedding_dup_clusters",     # ANN pairs -> transitive closure
    "state_coords_radius",        # J1/J2 fixture radius composite
    "similar_nearby",             # A16 composite endpoint
    "image_near_dup_pipeline",    # decode->feature->ANN composed chain
    "curation_e2e",               # crawl->clean->cluster->decon->split->pack
    "cross_modal_dedup",          # caption-minhash AND phash pair dedup
]


def _correctness_files() -> list[str]:
    return sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")))


def test_demoted_names_registered():
    missing = [n for n in DRIVER_DEMOTED + DRIVER_ROTATED + DRIVER_TAIL_NEW
               if n not in QUERIES]
    assert not missing, missing


def test_no_overlap_between_tail_lists():
    lists = [set(DRIVER_DEMOTED), set(DRIVER_ROTATED), set(DRIVER_TAIL_NEW)]
    for i, a in enumerate(lists):
        for b in lists[i + 1:]:
            assert not (a & b), a & b


def test_ordered_is_a_permutation():
    oq = ordered_queries()
    assert set(oq) == set(QUERIES)
    assert len(oq) == len(QUERIES)


def test_critical_queries_inside_driver_window():
    window = list(ordered_queries())[:DRIVER_WINDOW]
    out = [n for n in WINDOW_CRITICAL if n not in window]
    assert not out, f"operator-critical queries outside driver window: {out}"


def test_demoted_fit_in_tail():
    """Everything non-demoted must fit in the window — if the registry
    grows past DRIVER_WINDOW + len(tail), something critical will
    silently fall out."""
    tail = len(DRIVER_DEMOTED) + len(DRIVER_ROTATED) + len(DRIVER_TAIL_NEW)
    assert len(QUERIES) - tail <= DRIVER_WINDOW, (
        "registry grew: demote or rotate a query to keep every "
        "operator-covering query inside the driver's 50-entry window")


def test_rotated_have_multi_round_driver_evidence():
    """The rotation contract: a query may rotate out of the window ONLY
    if the driver has already full-passed it (rows+schema+hash) in at
    least two past rounds — verified from the produced CORRECTNESS
    files, not from memory."""
    files = _correctness_files()
    passes: dict[str, int] = {}
    for f in files:
        with open(f) as fh:
            rows = json.load(fh)
        for name in DRIVER_ROTATED:
            r = rows.get(name)
            if r and r.get("rows_match") and r.get("schema_match") \
                    and r.get("hash_match"):
                passes[name] = passes.get(name, 0) + 1
    weak = [n for n in DRIVER_ROTATED if passes.get(n, 0) < 2]
    assert not weak, (
        f"rotated without >=2 past full-pass driver rounds: {weak}")


def test_rotated_never_window_critical():
    both = set(DRIVER_ROTATED) & set(WINDOW_CRITICAL)
    assert not both, f"WINDOW_CRITICAL queries are pinned, not rotatable: {both}"


# Queries first registered OR first promoted in the CURRENT round cannot
# yet have a row in the previous round's driver output — list them here,
# and empty the set at the next round rollover.
NEW_THIS_ROUND = {
    # r05 promotions (first-ever driver rows)
    "video_near_dup", "stratified_sample", "embedding_dup_clusters",
    "state_coords_radius", "similar_nearby", "image_near_dup_pipeline",
    # r05 new registrations
    "curation_e2e", "cross_modal_dedup",
}


def test_latest_correctness_output_covers_window_critical():
    """ADVICE r03 #3: the driver-window contract (first 50 entries) is
    observed, not owned — so verify it from the driver's OUTPUT, not
    from assumption: the most recent CORRECTNESS_r*.json must contain a
    row for every WINDOW_CRITICAL query. If the driver ever resizes or
    resamples its window, this fails on the next round's file instead
    of silently starving operator-critical checks."""
    files = _correctness_files()
    assert files, "no driver correctness output found"
    with open(files[-1]) as f:
        rows = json.load(f)
    missing = [n for n in WINDOW_CRITICAL
               if n not in rows and n not in NEW_THIS_ROUND]
    assert not missing, (
        f"{os.path.basename(files[-1])} lacks rows for window-critical "
        f"queries {missing} — driver window contract changed?")


def test_entry_module_uses_ordered_registry():
    names = list(entry_mod.queries())
    assert names == list(ordered_queries())
    window = names[:DRIVER_WINDOW]
    for n in WINDOW_CRITICAL:
        assert n in window


def test_demoted_coverage_subsumed_by_in_window_sibling():
    """Each demoted query's operator coverage has a named sibling (the
    reason demotion is safe).  The sibling must be in-window OR itself
    covered by the rotation contract (rotated queries hold >=2 past
    full-pass driver rounds, so subsumption-through-them still rests on
    driver evidence)."""
    sibling = {
        "quality_score": "corpus_clean",
        "dedup_first_wins": "crawl_5round_golden",
        "hourly_tumbling_agg": "sessionization",
        "fifo_sequence": "crawl_delay_budget_golden",
        "exact_dup_stats": "corpus_clean",
        "semi_join_seen": "anti_join_unseen",
        "filter_validity": "crawl_5round_golden",
        "tpch_q1": "success_rate",
        "simhash16": "simhash_bucket_pairs",
        "politeness_lag": "crawl_5round_golden",
        "embedding_cosine_topk": "embedding_cosine_topk_matmul",
        "crawl_3round_golden": "crawl_5round_golden",
        "embedding_near_dup": "embedding_near_dup_ann",
        "ngram_jaccard_pairs": "lsh_jaccard_verify",
        "properties_by_price_type": "pages_paginate",
        "properties_by_city": "nearby_radius",
        "property_by_id": "pages_paginate",
    }
    assert set(sibling) == set(DRIVER_DEMOTED)
    window = list(ordered_queries())[:DRIVER_WINDOW]
    for demoted, kept in sibling.items():
        assert kept in window or kept in DRIVER_ROTATED, (demoted, kept)
