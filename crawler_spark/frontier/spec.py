"""Frozen crawl-spec: the deterministic semantics every implementation
(Spark engine, DuckDB oracle SQL, pure-Python golden simulator) must match
bit-for-bit.

The reference crawler's ordering is partly accidental (per-process bloom
state, Kafka round-robin partitioner, a volatile global counter —
`worker.py:241,433-438`, `prioritizer.py:18,157-159`), so golden equality is
defined against THIS deterministic spec, which preserves the reference's
intent (first-discovery-wins dedupe, 5-level priority, per-host politeness
budget, robots gating, exponential retry backoff) while being exactly
reproducible on any engine. See SURVEY.md §4.3(4).

Portability note: ordering tiebreaks and the listing round-robin parity use
`md5(url)` because Spark (`F.md5`), DuckDB (`md5()`) and Python
(`hashlib.md5`) all agree on it byte-for-byte, which is what makes the
DuckDB oracle and the Python simulator possible. At production scale the
64-bit `xxhash64(url)` is the cheaper order key (swap via
`ORDER_HASH = F.xxhash64`); dedupe identity is always the exact URL string,
so the choice of hash never affects correctness, only tie order.

--- The spec ---

Synthetic web of N pages over H hosts (all formulas pure functions of the
integer page id p — no RNG, no wall clock):

  is_listing(p) = p % 10 == 0
  host_id(p)    = p % 3           if p % 4 == 0   (hosts 0..2 are hot: Zipf-ish skew)
                = p % H           otherwise
  url(p)        = https://h{host}.synth.test/search/apa?p={p}        (listing)
                = https://h{host}.synth.test/apa/d/item-{p}/{p}.html (property)
  outdegree(p)  = 12 (listing) | 3 (property)
  child(p, i)   = (p*31 + i*17 + 1) % N
  outlinks(p)   = [url(child(p, i)) for i in range(outdegree(p))]
  status(p)     = 503 if p % 97 == 13 else 200
  image_id(p)   = p for property pages, NULL for listings

Robots (allow-by-default, reference `robots_checker.py:118-120`): hosts with
host_id % 7 == 3 disallow any URL containing '/apa/d/' (their property
pages). Gate applied AT ENQUEUE TIME (seeds and discovered links alike);
blocked URLs never enter the frontier and are re-counted if re-discovered.

Priority (1 best .. 5, reference `prioritizer.py:150-162`):
  listing  -> 1 + (ascii(md5(url)[0]) % 2)      (deterministic round-robin G2)
  property -> 3 + host_id % 3                   (region = host tertile)

Frontier row: (url, host_id, priority, disc_round, retry_count,
eligible_round). Seeds enter at disc_round=0 through the same enqueue path
(robots gate + priority + first-discovery-wins dedupe against `seen`).
`seen` = every URL ever enqueued.

Scheduling round r = 1, 2, ... (one pure DataFrame job):
  1. eligible  = queued rows with eligible_round <= r
  2. batch     = per-host top-k of eligible by ORDER KEY
                 (priority ASC, disc_round ASC, md5(url) ASC, url ASC),
                 seq = 1..k rank within host.   [politeness budget: k
                 fetches/host/round; round period >= min_request_interval]
  3. fetch     = batch JOIN web ON url; status(p) decides ok/failed
  4. ok pages  -> pages log (round, seq ordering key = (r, priority,
                 host_id, seq) — THE golden crawl ordering)
  5. links     = explode(outlinks of ok) -> validity filter (https, no
                 dot-dot, <=2000 chars, no binary-file extensions) ->
                 relevance filter (listing|property URL regex) ->
                 DISTINCT url -> robots gate -> anti-join seen ->
                 priority assign -> enqueue (disc_round=r)
  6. failed    -> retry_count c -> c+1; if c+1 > MAX_RETRIES(3): state=dlq
                 else requeue with eligible_round = r + 2^c  (backoff E5)
  7. frontier' = (frontier - batch) ∪ new links ∪ requeues
     seen'     = seen ∪ new links
  8. metrics row appended (counts + per-partition lineage)

Termination: crawl runs a fixed number of rounds or until batch is empty.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---- web-shape constants (defaults; engine/simulator take overrides) ----
N_HOSTS = 20
LISTING_OUTDEG = 12
PROPERTY_OUTDEG = 3
MAX_RETRIES = 3
FAIL_MOD = 97          # status(p)=503 when p % FAIL_MOD == FAIL_REM
FAIL_REM = 13
ROBOTS_MOD = 7         # hosts with host_id % ROBOTS_MOD == ROBOTS_REM ...
ROBOTS_REM = 3
ROBOTS_DISALLOW = "/apa/d/"   # ... disallow URLs containing this substring
# robots crawl-delay (robots_checker.py caches RobotFileParser incl.
# crawl_delay): hosts with host_id % DELAY_MOD == DELAY2_REM get delay 2,
# == DELAY4_REM get delay 4; per-round budget = max(1, k // delay).
DELAY_MOD = 11
DELAY2_REM = 5
DELAY4_REM = 9


def host_budget(k_per_host: int, host_id: int) -> int:
    """Python form of the per-host politeness budget (simulator/tests)."""
    if host_id % DELAY_MOD == DELAY2_REM:
        return max(1, k_per_host // 2)
    if host_id % DELAY_MOD == DELAY4_REM:
        return max(1, k_per_host // 4)
    return k_per_host
HOT_HOSTS = 3          # pages with p % 4 == 0 collapse onto hosts 0..HOT_HOSTS-1

# ---- URL classes (synth.test flavor of property_matcher.py:17-26) ----
LISTING_RE = r"^https://h[0-9]+\.synth\.test/search/apa\?p=[0-9]+$"
PROPERTY_RE = r"^https://h[0-9]+\.synth\.test/apa/d/item-[0-9]+/[0-9]+\.html$"
HOST_RE = r"^https://h([0-9]+)\.synth\.test/"

# link-validity (html_downloader.py:292-318, link_extractor.py:122-160)
SKIP_EXT_RE = r"\.(pdf|jpg|jpeg|png|gif|zip|exe|dmg|mp3|mp4|avi|css|js|ico|svg|woff)$"
MAX_URL_LEN = 2000


# ---- native column builders (shared by synth + engine; no Python UDFs) ----

def url_of(p: Column, host_id: Column, is_listing: Column) -> Column:
    """URL string for page id p (pure concat — whole-stage codegen)."""
    host = F.concat(F.lit("https://h"), host_id.cast("string"), F.lit(".synth.test"))
    ps = p.cast("string")
    return F.when(
        is_listing, F.concat(host, F.lit("/search/apa?p="), ps)
    ).otherwise(
        F.concat(host, F.lit("/apa/d/item-"), ps, F.lit("/"), ps, F.lit(".html"))
    )


def host_id_of_page(p: Column, n_hosts: int) -> Column:
    return F.when(p % 4 == 0, p % HOT_HOSTS).otherwise(p % n_hosts).cast("int")


def host_id_of_url(url: Column) -> Column:
    """Recover host_id from a URL (native regexp — no UDF)."""
    return F.regexp_extract(url, HOST_RE, 1).cast("int")


def is_listing_url(url: Column) -> Column:
    return url.rlike(LISTING_RE)


def is_property_url(url: Column) -> Column:
    return url.rlike(PROPERTY_RE)


def priority_of(url: Column) -> Column:
    """Deterministic 5-level priority, a pure function of the URL.

    listing -> 1 + ascii(md5[0]) % 2 ; property -> 3 + host_id % 3.
    Matches prioritizer.py:150-162 shape with the volatile global counter
    replaced by a stable hash parity (SURVEY.md G2).
    """
    parity = F.ascii(F.substring(F.md5(url), 1, 1)) % 2
    region = host_id_of_url(url) % 3
    return (
        F.when(is_listing_url(url), 1 + parity)
        .when(is_property_url(url), 3 + region)
        .otherwise(-1)
        .cast("int")
    )


def order_key(priority: Column, disc_round: Column, url: Column) -> list[Column]:
    """THE frozen per-host scheduling order (spec step 2)."""
    return [priority.asc(), disc_round.asc(), F.md5(url).asc(), url.asc()]


def is_valid_link(url: Column) -> Column:
    """B1/B2 validity: scheme, traversal, extension, length."""
    return (
        (F.length(url) <= MAX_URL_LEN)
        & url.startswith("https://")
        & ~url.contains("..")
        & ~url.rlike("(?i)" + SKIP_EXT_RE)
    )


def is_relevant(url: Column) -> Column:
    """B3 relevance: listing-page or property-page URL class."""
    return is_listing_url(url) | is_property_url(url)
