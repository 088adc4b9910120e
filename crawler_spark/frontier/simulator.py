"""Pure-Python golden simulator of the frozen crawl spec (spec.py).

A straight, independent transcription of the reference crawler's loop
(worker.py:348-456 / master.py:64-131) under the deterministic spec — no
Spark, no pandas. The engine's fetch log, seen set, pages and DLQ must
equal this bit-for-bit (tests/test_frontier_golden.py). Kept intentionally
naive (dicts + sorts) so a bug is overwhelmingly unlikely to be shared
with the DataFrame implementation.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

from . import spec

_LISTING = re.compile(spec.LISTING_RE)
_PROPERTY = re.compile(spec.PROPERTY_RE)
_HOST = re.compile(spec.HOST_RE)
_SKIP_EXT = re.compile(spec.SKIP_EXT_RE)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


# ---- web formulas (mirror synth.py) ----

def host_id_of_page(p: int, n_hosts: int) -> int:
    return p % spec.HOT_HOSTS if p % 4 == 0 else p % n_hosts


def url_of(p: int, n_hosts: int) -> str:
    h = host_id_of_page(p, n_hosts)
    if p % 10 == 0:
        return f"https://h{h}.synth.test/search/apa?p={p}"
    return f"https://h{h}.synth.test/apa/d/item-{p}/{p}.html"


def outlinks(p: int, n_pages: int, n_hosts: int) -> list[str]:
    deg = spec.LISTING_OUTDEG if p % 10 == 0 else spec.PROPERTY_OUTDEG
    return [url_of((p * 31 + i * 17 + 1) % n_pages, n_hosts) for i in range(deg)]


def status_of(p: int) -> int:
    return 503 if p % spec.FAIL_MOD == spec.FAIL_REM else 200


# ---- URL semantics (mirror spec.py column builders) ----

def host_id_of_url(url: str) -> int:
    m = _HOST.match(url)
    return int(m.group(1)) if m else -1


def priority_of(url: str) -> int:
    if _LISTING.match(url):
        return 1 + ord(_md5(url)[0]) % 2
    if _PROPERTY.match(url):
        return 3 + host_id_of_url(url) % 3
    return -1


def is_valid_link(url: str) -> bool:
    return (
        url.startswith("https://")
        and ".." not in url
        and not _SKIP_EXT.search(url.lower())
        and len(url) <= spec.MAX_URL_LEN
    )


def robots_allowed(url: str, host_id: int) -> bool:
    if host_id % spec.ROBOTS_MOD == spec.ROBOTS_REM:
        return spec.ROBOTS_DISALLOW not in url
    return True


@dataclass
class FrontierRow:
    url: str
    host_id: int
    priority: int
    disc_round: int
    retry_count: int = 0
    eligible_round: int = 0


@dataclass
class SimResult:
    fetch_log: list[tuple] = field(default_factory=list)   # (round, priority, host_id, url, seq)
    pages: list[tuple] = field(default_factory=list)       # (round, url, page_id)
    dlq: list[tuple] = field(default_factory=list)         # (round, url)
    seen: set = field(default_factory=set)


def simulate(
    n_pages: int,
    n_seeds: int,
    rounds: int,
    k_per_host: int,
    n_hosts: int = spec.N_HOSTS,
    max_retries: int = spec.MAX_RETRIES,
    cooldown_rounds: int = 1,
    budget_fn=None,
) -> SimResult:
    # budget_fn(k_per_host, host_id) -> per-host round budget; defaults
    # to the frozen spec dim (spec.host_budget). Tests exercising a
    # custom robots crawl_delay profile pass their own.
    budget_fn = budget_fn or spec.host_budget
    res = SimResult()
    page_of_url = {url_of(p, n_hosts): p for p in range(n_pages)}
    last_fetch: dict[int, int] = {}  # host_id -> last fetched round (G1)

    def enqueue(urls: set[str], disc_round: int, frontier: list[FrontierRow]):
        for u in sorted(urls):
            if not (is_valid_link(u) and (_LISTING.match(u) or _PROPERTY.match(u))):
                continue
            prio = priority_of(u)
            if prio == -1:
                continue
            h = host_id_of_url(u)
            if not robots_allowed(u, h):
                continue
            if u in res.seen:
                continue
            res.seen.add(u)
            frontier.append(FrontierRow(u, h, prio, disc_round,
                                        eligible_round=disc_round))

    frontier: list[FrontierRow] = []
    seeds = {url_of((j * 10) % n_pages, n_hosts) for j in range(n_seeds)}
    enqueue(seeds, 0, frontier)

    for r in range(1, rounds + 1):
        eligible = [
            row for row in frontier
            if row.eligible_round <= r
            and (row.host_id not in last_fetch
                 or last_fetch[row.host_id] + cooldown_rounds <= r)
        ]
        by_host: dict[int, list[FrontierRow]] = {}
        for row in eligible:
            by_host.setdefault(row.host_id, []).append(row)

        batch: list[tuple[FrontierRow, int]] = []
        for h, rows in by_host.items():
            rows.sort(key=lambda x: (x.priority, x.disc_round, _md5(x.url), x.url))
            picked_rows = rows[: budget_fn(k_per_host, h)]
            if picked_rows:
                last_fetch[h] = r
            for seq, row in enumerate(picked_rows, start=1):
                batch.append((row, seq))

        picked = {row.url for row, _ in batch}
        frontier = [row for row in frontier if row.url not in picked]

        new_links: set[str] = set()
        for row, seq in batch:
            res.fetch_log.append((r, row.priority, row.host_id, row.url, seq))
            p = page_of_url.get(row.url)
            if p is None:  # dead link: not in the web -> straight to DLQ
                res.dlq.append((r, row.url))
            elif status_of(p) == 200:
                res.pages.append((r, row.url, p))
                new_links.update(outlinks(p, n_pages, n_hosts))
            else:
                c = row.retry_count + 1
                if c > max_retries:
                    res.dlq.append((r, row.url))
                else:
                    frontier.append(FrontierRow(
                        row.url, row.host_id, row.priority, row.disc_round,
                        retry_count=c,
                        eligible_round=r + 2 ** row.retry_count))
        enqueue(new_links, r, frontier)

    return res
