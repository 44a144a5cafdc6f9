"""Sequential crawl simulator — ground truth for ordering/seen-set parity.

Emulates the reference's single-threaded crawl discipline
(/root/reference/src/orchestrators/agency.py:48-102: deterministic issue
order, per-request politeness, persistent seen-set) over the same synthetic
pages corpus, purely in Python. The distributed engine (crawl.py) must
produce the IDENTICAL per-wave, per-host issue order and the identical final
URL-seen set — that is the north-rule parity criterion, and pytest compares
the two outputs list-for-list.

This module is test scaffolding: O(corpus) in driver memory, never used at
scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..extract.reference import extract_one

DEFAULT_CRAWL_DELAY_MS = 100
DISCOVERED_PRIORITY = 2


def canonicalize(url: str) -> str:
    """Pure-Python twin of functions.urls.canonicalize_url (same contract)."""
    u = url.strip().split("#", 1)[0]
    if "://" in u:
        scheme, rest = u.split("://", 1)
    else:
        scheme, rest = "", u
    scheme = scheme.lower()
    sep = len(rest)
    for ch in "/?":
        i = rest.find(ch)
        if i != -1:
            sep = min(sep, i)
    hostport, pathq = rest[:sep], rest[sep:]
    host, port = hostport, ""
    if ":" in hostport:
        h, p = hostport.rsplit(":", 1)
        if p.isdigit():
            host, port = h, p
    host = host.lower()
    if (scheme, port) in (("http", "80"), ("https", "443")):
        port = ""
    if "?" in pathq:
        path, query = pathq.split("?", 1)
    else:
        path, query = pathq, ""
    path = path or "/"
    qparts = sorted(p for p in query.split("&") if p)
    q = "&".join(qparts)
    return (
        scheme
        + "://"
        + host
        + (":" + port if port else "")
        + path
        + ("?" + q if q else "")
    )


@dataclass
class SimResult:
    schedule: list[tuple[int, str, int, str]]  # (wave, host, host_rank, url_canon)
    seen: set[str] = field(default_factory=set)
    extracted: list[dict] = field(default_factory=list)


def simulate_crawl(
    pages_rows: list[dict],
    seeds: list[tuple[str, int]],
    robots: list[dict] | None = None,
    wave_ms: int = 1_000,
    max_waves: int = 10,
    max_depth: int = 3,
    epoch0: int = 1_700_000_000,
    max_attempts: int = 1,
) -> SimResult:
    """pages_rows: dicts with url, warc_ts (datetime), html (bytes), lang."""
    from datetime import datetime, timezone

    by_canon = {canonicalize(r["url"]): r for r in pages_rows}
    rules = {r["host"]: r for r in (robots or [])}
    t0 = datetime.fromtimestamp(epoch0, tz=timezone.utc).replace(tzinfo=None)

    def host_of(canon: str) -> str:
        rest = canon.split("://", 1)[1]
        hp = rest.split("/", 1)[0].split("?", 1)[0]
        return hp.rsplit(":", 1)[0] if ":" in hp and hp.rsplit(":", 1)[1].isdigit() else hp

    def allowed(canon: str, host: str) -> bool:
        r = rules.get(host)
        if r is None:
            return True
        path = canon.split("://", 1)[1]
        path = path[len(host):] if path.startswith(host) else "/" + path.split("/", 1)[1] if "/" in path else "/"
        path = path.split("?", 1)[0]
        return bool(r["allow"]) and path.startswith(r.get("path_prefix") or "")

    def budget(host: str) -> int:
        r = rules.get(host)
        delay = r["crawl_delay_ms"] if r else DEFAULT_CRAWL_DELAY_MS
        return max(1, wave_ms // delay)

    # frontier: canon -> (priority, discovered_ts, depth, attempt); best
    # (priority, ts, depth) wins, attempt = MAX over merged entries (mirrors
    # CrawlEngine._dedup_frontier: a rediscovery never resets a retry count).
    frontier: dict[str, tuple[int, object, int, int]] = {}

    def merge(c: str, e: tuple) -> None:
        old = frontier.get(c)
        if old is None:
            frontier[c] = e
            return
        att = max(old[3], e[3])
        best = min(old[:3], e[:3])
        frontier[c] = (*best, att)

    for url, prio in seeds:
        merge(canonicalize(url), (prio, t0, 0, 0))
    seen: set[str] = set()
    res = SimResult(schedule=[], seen=seen)

    for wave in range(max_waves):
        cands = [
            (c, e) for c, e in frontier.items() if c not in seen and allowed(c, host_of(c))
        ]
        # per-host rank by (priority, discovered_ts, url_canon)
        perhost: dict[str, list] = {}
        for c, (prio, ts, depth, attempt) in cands:
            perhost.setdefault(host_of(c), []).append((prio, ts, c, depth, attempt))
        scheduled = []
        for host, lst in perhost.items():
            lst.sort()
            for rank, (prio, ts, c, depth, attempt) in enumerate(
                lst[: budget(host)], 1
            ):
                scheduled.append((wave, host, rank, c, depth, ts, attempt, prio))
        if not scheduled:
            break
        for wv, host, rank, c, *_ in sorted(scheduled):
            res.schedule.append((wv, host, rank, c))
        # Pop every scheduled canon BEFORE processing: the engine removes the
        # whole wave from the frontier first, then best-wins-dedups retries
        # against same-wave outlink rediscoveries. Popping inside the loop
        # would let a scheduled miss destroy an outlink entry inserted
        # earlier in the same loop, diverging from the engine on corpora
        # where a page links to a dead url scheduled in the same wave.
        for _, _, _, c, *_rest in scheduled:
            frontier.pop(c, None)
        for _, _, _, c, depth, ts, attempt, prio in scheduled:
            page = by_canon.get(c)
            if page is None:
                # fetch miss: retry with attempt+1 (same priority/ts/depth)
                # until max_attempts, then give up and mark seen
                # (reference: 3 tries, base.py:16-45)
                if attempt + 1 < max_attempts:
                    merge(c, (prio, ts, depth, attempt + 1))
                else:
                    seen.add(c)
                continue
            seen.add(c)
            x = extract_one(page["html"])
            res.extracted.append({"url_canon": c, **x})
            if depth < max_depth:
                for link in x["outlinks"]:
                    lc = canonicalize(link)
                    if lc in seen:
                        continue
                    merge(lc, (DISCOVERED_PRIORITY, page["warc_ts"], depth + 1, 0))
    return res
