"""Single-threaded reference scheduler.

Implements the exact crawl spec of plans/scheduler.py in plain Python
(dicts + sorts, no Spark). Parity tests assert that the distributed
scheduler produces identical per-round fetch orderings and an identical
final URL-seen set under the same seed list + politeness budgets
[north-rule requirement].
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from datetime import date

from .canonical import canonicalize_url_py

REF_DATE = date(2024, 6, 1)
NO_DATE_RECENCY = 0.1
DEFAULT_BUDGET = 2.0


def recency_score_py(date_str: str | None) -> float:
    if not date_str:
        return NO_DATE_RECENCY
    d = date.fromisoformat(date_str)
    age_days = max(0, (REF_DATE - d).days)
    return 1.0 / (1.0 + age_days / 365.0)


def host_of(url: str) -> str:
    import re

    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)", url)
    return m.group(1).lower() if m else ""


def path_of(url: str) -> str:
    import re

    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", url)
    p = m.group(1) if m else ""
    return p or "/"


def robots_allowed_py(path: str, rules: list[tuple[str, bool]] | None) -> bool:
    if not rules:
        return True
    matched = [(len(pfx), bool(allow)) for pfx, allow in rules if path.startswith(pfx)]
    if not matched:
        return True
    matched.sort()  # (length, allow) — max = longest prefix, allow on ties
    return matched[-1][1]


@dataclass
class OracleScheduler:
    # page corpus: canonical url → (extracted_date_str, outlinks list)
    pages: dict[str, tuple[str, list[str]]]
    robots: dict[str, list[tuple[str, bool]]] = field(default_factory=dict)
    budgets: dict[str, float] = field(default_factory=dict)
    # robots crawl_delay seconds per host; caps per-round fetches at
    # floor(round_seconds / delay)
    delays: dict[str, float] = field(default_factory=dict)
    round_seconds: float = 60.0
    # UT1-style domain blocklist: discovered URLs whose host equals or
    # is a label-boundary subdomain of an entry are never frontier'd
    blocked_domains: set[str] = field(default_factory=set)
    # per-IP politeness (queue-by-IP): host → ip DNS cache; hosts
    # sharing an ip share ip_budget fetches/round (0 = off). Unmapped
    # hosts are their own ip.
    ip_map: dict[str, str] = field(default_factory=dict)
    ip_budget: int = 0
    # per-site politeness: hosts sharing a registrable domain
    # (publicsuffix.org grouping, plans/psl.py) share site_budget
    # fetches/round (0 = off).
    site_budget: int = 0
    psl_rules: tuple = ()  # () = plans/psl.MINI_PSL
    # starvation guard: additive per-round boost for unscheduled
    # frontier URLs (0 = off); applied before the max-merge with
    # discoveries, mirroring CrawlConfig.aging
    aging: float = 0.0
    # URL-pattern yield prior (plans/yield_prior.py): when set, each
    # round's ORDERING uses priority x yields.get(signature(url), 0.5);
    # the frontier keeps base priorities (the gate is a view, not
    # state), mirroring CrawlScheduler's yield_table
    yields: dict[str, float] | None = None

    frontier: dict[str, float] = field(default_factory=dict)  # url → priority
    seen: set[str] = field(default_factory=set)
    fetch_log: list[list[str]] = field(default_factory=list)

    def init_from_seeds(self, seeds: list[tuple[str, float]]) -> None:
        self.frontier = {}
        for url, prio in seeds:
            cu = canonicalize_url_py(url)
            self.frontier[cu] = max(self.frontier.get(cu, -math.inf), prio)
        self.seen = set()
        self.fetch_log = []

    def budget(self, host: str) -> float:
        return self.budgets.get(host, DEFAULT_BUDGET)

    def blocked(self, host: str) -> bool:
        if not self.blocked_domains:
            return False
        labels = host.lower().split(".")
        return any(
            ".".join(labels[i:]) in self.blocked_domains
            for i in range(len(labels))
        )

    def fetch_cap(self, host: str) -> int:
        k = int(math.floor(self.budget(host)))
        d = self.delays.get(host)
        if d is not None and d > 0:
            k = min(k, int(math.floor(self.round_seconds / d)))
        return k

    def run_round(self) -> list[str]:
        # 2. drop seen
        candidates = {
            u: p for u, p in self.frontier.items() if u not in self.seen
        }
        # 3. robots
        candidates = {
            u: p
            for u, p in candidates.items()
            if robots_allowed_py(path_of(u), self.robots.get(host_of(u)))
        }
        # 4-5. per-host top-k by (priority desc, url asc); with a
        # yield-prior table the ORDERING priority is base x learned
        # pattern yield (frontier state stays in base currency)
        if self.yields is not None:
            from .yield_prior import url_pattern_signature_py

            candidates = {
                u: p * self.yields.get(url_pattern_signature_py(u), 0.5)
                for u, p in candidates.items()
            }
        by_host: dict[str, list[tuple[float, str]]] = {}
        for u, p in candidates.items():
            by_host.setdefault(host_of(u), []).append((p, u))
        scheduled: list[tuple[float, str]] = []
        for host, items in by_host.items():
            k = self.fetch_cap(host)
            items.sort(key=lambda t: (-t[0], t[1]))
            scheduled.extend(items[:k])

        # 5.5 per-IP cap over the per-host selection (queue-by-IP)
        if self.ip_budget > 0:
            by_ip: dict[str, list[tuple[float, str]]] = {}
            for p, u in scheduled:
                h = host_of(u)
                by_ip.setdefault(self.ip_map.get(h, h), []).append((p, u))
            scheduled = []
            for _, items in by_ip.items():
                items.sort(key=lambda t: (-t[0], t[1]))
                scheduled.extend(items[: self.ip_budget])

        # 5.6 per-site cap over the per-host selection (registrable
        # domain grouping)
        if self.site_budget > 0:
            from .psl import MINI_PSL, registrable_py

            rules = self.psl_rules or MINI_PSL
            by_site: dict[str, list[tuple[float, str]]] = {}
            for p, u in scheduled:
                by_site.setdefault(
                    registrable_py(host_of(u), rules), []
                ).append((p, u))
            scheduled = []
            for _, items in by_site.items():
                items.sort(key=lambda t: (-t[0], t[1]))
                scheduled.extend(items[: self.site_budget])

        # 6-7. fetch + discover
        discovered: dict[str, float] = {}
        fetched_urls: list[tuple[float, str]] = []
        for p, u in scheduled:
            self.seen.add(u)
            page = self.pages.get(u)
            if page is None:
                continue  # missing: seen but nothing to extract
            fetched_urls.append((p, u))
            date_str, outlinks = page
            rec = recency_score_py(date_str)
            for out in outlinks:
                cu = canonicalize_url_py(out)
                if self.blocked(host_of(cu)):
                    continue
                prio = self.budget(host_of(cu)) * rec
                if cu not in discovered or prio > discovered[cu]:
                    discovered[cu] = prio

        # 8. frontier update: leftover ∪ discovered (max-priority), minus seen
        scheduled_set = {u for _, u in scheduled}
        new_frontier: dict[str, float] = {
            u: p + self.aging
            for u, p in self.frontier.items()
            if u not in scheduled_set
        }
        for u, p in discovered.items():
            new_frontier[u] = max(new_frontier.get(u, -math.inf), p)
        self.frontier = {u: p for u, p in new_frontier.items() if u not in self.seen}

        fetched_urls.sort(key=lambda t: (-t[0], t[1]))
        order = [u for _, u in fetched_urls]
        self.fetch_log.append(order)
        self.last_scheduled = len(scheduled)  # stop criterion parity w/ Spark
        return order

    def run(self, n_rounds: int) -> list[list[str]]:
        for _ in range(n_rounds):
            self.run_round()
            if self.last_scheduled == 0:
                break
        return self.fetch_log
