"""Seed-list sources: every format normalizes to identical (url) rows,
and a file-fed crawl equals the synthetic-seed crawl when the lists
match (add_seeds.py / config.json seed dispatch replaced)."""

from __future__ import annotations

import json

import pytest

from crawler_spark.frontier import synth
from crawler_spark.sources.seeds import read_seed_files

N_PAGES, N_HOSTS, N_SEEDS = 2000, 20, 6


@pytest.fixture(scope="module")
def seed_urls(spark):
    return sorted(
        r["url"] for r in
        synth.seed_urls(spark, N_PAGES, N_SEEDS, N_HOSTS).collect()
    )


def test_all_formats_equal(spark, tmp_path, seed_urls):
    text = tmp_path / "seeds.txt"
    text.write_text(
        "# seed list\n\n" + "\n".join(seed_urls)
        + "\n  \n# trailing comment\n" + seed_urls[0] + "\n")  # dup + junk
    csvf = tmp_path / "seeds.csv"
    csvf.write_text("url,source\n" + "\n".join(
        f"{u},manual" for u in seed_urls) + "\n")
    jsonf = tmp_path / "seeds.jsonl"
    jsonf.write_text("\n".join(
        json.dumps({"url": u, "priority": 1}) for u in seed_urls) + "\n")
    pq = tmp_path / "seeds.parquet"
    spark.createDataFrame([(u,) for u in seed_urls], "url string") \
        .write.parquet(str(pq))

    for path in (text, csvf, jsonf, pq):
        got = sorted(r["url"] for r in
                     read_seed_files(spark, str(path)).collect())
        assert got == seed_urls, path


def test_unknown_suffix_raises(spark, tmp_path):
    p = tmp_path / "seeds.xyz"
    p.write_text("http://a/\n")
    with pytest.raises(ValueError, match="cannot infer"):
        read_seed_files(spark, str(p))
    # explicit fmt overrides inference
    got = read_seed_files(spark, str(p), fmt="text").collect()
    assert [r["url"] for r in got] == ["http://a/"]


def test_file_fed_crawl_equals_synthetic(spark, tmp_path, seed_urls):
    from crawler_spark.frontier.store import RoundStore, run_crawl_checkpointed

    web = synth.web_graph(spark, N_PAGES, N_HOSTS)
    robots = synth.robots_dim(spark, N_HOSTS)

    f = tmp_path / "seeds.txt"
    f.write_text("\n".join(seed_urls) + "\n")

    a = RoundStore(spark, str(tmp_path / "a"))
    run_crawl_checkpointed(
        a, web, robots, 2, 2,
        seeds=synth.seed_urls(spark, N_PAGES, N_SEEDS, N_HOSTS))
    b = RoundStore(spark, str(tmp_path / "b"))
    run_crawl_checkpointed(
        b, web, robots, 2, 2, seeds=read_seed_files(spark, str(f)))

    rows = lambda st: sorted(  # noqa: E731
        map(tuple, st.read_deltas("fetch_log").collect()))
    assert rows(a) == rows(b)


def test_seeds_from_sitemaps_shape(spark):
    from crawler_spark.sources.seeds import seeds_from_sitemaps

    bodies = spark.createDataFrame(
        [("User-agent: *\nSitemap: https://a/s.xml\n"
          "Sitemap: https://a/s.xml\n",),   # in-file dupe collapses
         ("Sitemap: https://b/x.xml\n",),
         ("Disallow: /\n",)],
        "robots_txt string",
    )
    out = sorted(r["url"] for r in seeds_from_sitemaps(bodies).collect())
    assert out == ["https://a/s.xml", "https://b/x.xml"]
