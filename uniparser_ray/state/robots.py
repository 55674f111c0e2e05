"""Robots.txt cache shards.

Per-host robots.txt is fetched once per crawl (through the same
transport as pages), parsed into Disallow prefixes, and cached in a
sharded actor pool keyed by ``hash(host)`` — the distributed analog of
the reference's process-local per-host dict (parsers.py:1262).
Only ``User-agent: *`` groups are honored (the engine sends one UA).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import ray

from ..rulevm.urlutil import url_hash64


def parse_robots(text: str) -> List[str]:
    """Disallow prefixes for User-agent: * (simple, standard parsing)."""
    disallows: List[str] = []
    applies = False
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            applies = value == "*"
        elif field == "disallow" and applies and value:
            disallows.append(value)
    return disallows


def parse_crawl_delay(text: str) -> float:
    """``Crawl-delay`` (seconds) for User-agent: *; 0.0 if absent."""
    applies = False
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            applies = value == "*"
        elif field == "crawl-delay" and applies:
            try:
                return max(0.0, float(value))
            except ValueError:
                return 0.0
    return 0.0


class RobotsShard:
    def __init__(self, web_factory=None):
        # web_factory() -> object with get(url) -> (status, headers, bytes)
        self.web = web_factory() if web_factory else None
        self.cache: Dict[str, Tuple[List[str], float]] = {}
        self.fetches = 0

    def _entry_for(self, host: str) -> Tuple[List[str], float]:
        entry = self.cache.get(host)
        if entry is None:
            rules: List[str] = []
            delay = 0.0
            if self.web is not None:
                try:
                    status, _h, body = self.web.get(f"http://{host}/robots.txt")
                    if status == 200:
                        text = body.decode("utf-8", "replace")
                        rules = parse_robots(text)
                        delay = parse_crawl_delay(text)
                except Exception:
                    rules, delay = [], 0.0
            self.fetches += 1
            entry = (rules, delay)
            self.cache[host] = entry
        return entry

    def _rules_for(self, host: str) -> List[str]:
        return self._entry_for(host)[0]

    def allowed_batch(self, host: str, paths: List[str]) -> List[bool]:
        rules = self._rules_for(host)
        if not rules:
            return [True] * len(paths)
        return [not any(p.startswith(r) for r in rules) for p in paths]

    def allowed_many(self, host_paths: List[Tuple[str, str]]) -> List[bool]:
        """[(host, path)] -> allow mask; one RPC covers many hosts (the
        per-batch client groups by shard, not by host)."""
        out = []
        for host, path in host_paths:
            rules = self._rules_for(host)
            out.append(not any(path.startswith(r) for r in rules))
        return out

    def allowed_delays_many(self, host_paths: List[Tuple[str, str]]) \
            -> Tuple[List[bool], List[float]]:
        """allowed_many + the host's robots Crawl-delay per row (one
        RPC serves both the allow filter and the politeness budget)."""
        mask, delays = [], []
        for host, path in host_paths:
            rules, delay = self._entry_for(host)
            mask.append(not any(path.startswith(r) for r in rules))
            delays.append(delay)
        return mask, delays

    def stats(self) -> dict:
        return {"hosts_cached": len(self.cache), "fetches": self.fetches}


RobotsShardActor = ray.remote(num_cpus=0.01)(RobotsShard)


class RobotsCache:
    """Client over robots shards; shard = hash(host) % n."""

    def __init__(self, num_shards: int = 4, web_factory=None):
        self.num_shards = num_shards
        self.shards = [RobotsShardActor.remote(web_factory=web_factory)
                       for _ in range(num_shards)]

    def _shard(self, host: str):
        return self.shards[url_hash64(host) % self.num_shards]

    def allowed(self, host_paths: List[Tuple[str, str]]) -> List[bool]:
        """[(host, path)] -> allow mask, batched one RPC per (shard, host)."""
        from collections import defaultdict
        groups = defaultdict(list)
        for idx, (host, path) in enumerate(host_paths):
            groups[host].append((idx, path))
        futures = {}
        for host, items in groups.items():
            futures[host] = self._shard(host).allowed_batch.remote(
                host, [p for _, p in items])
        out = [True] * len(host_paths)
        for host, items in groups.items():
            mask = ray.get(futures[host])
            for (idx, _), ok in zip(items, mask):
                out[idx] = ok
        return out
