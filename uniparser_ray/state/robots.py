"""Robots.txt cache shards.

Per-host robots.txt is fetched once per crawl (through the same
transport as pages), parsed and cached in a sharded actor pool keyed
by ``hash(host)`` — the distributed analog of the reference's
process-local per-host dict (parsers.py:1262).

Two matchers (CrawlConfig.robots_matcher):

* ``"prefix"`` (default, the oracle-checked config of rounds 1-4):
  ``User-agent: *`` group only, Disallow values matched as plain path
  prefixes — the de-facto behavior of simple crawlers.
* ``"rfc9309"`` (round 5): full REP semantics — ``*`` wildcards, ``$``
  end anchor, Allow lines, LONGEST-match precedence with Allow winning
  exact ties, user-agent group selection by longest product-token
  substring match with ``*`` fallback, adjacent ``User-agent`` lines
  sharing a group and same-token groups merging (RFC 9309 s2.2).
"""

from __future__ import annotations

import re
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


def parse_robots_rfc9309(text: str, user_agent: str = "*") \
        -> List[Tuple[str, bool]]:
    """RFC 9309 group selection -> [(path_pattern, is_allow)].

    Groups are runs of ``User-agent`` lines followed by rules; the
    chosen group is the one whose UA token is the LONGEST substring of
    our product token (case-insensitive), falling back to ``*``.
    Same-token groups merge (s2.2.1); adjacent UA lines share one
    group; rules before any UA line belong to no group; an empty
    Disallow value allows everything (records no rule)."""
    ua = user_agent.lower()
    groups: Dict[str, List[Tuple[str, bool]]] = {}
    cur_uas: List[str] = []
    last_was_ua = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not last_was_ua:
                cur_uas = []
            cur_uas.append(value.lower())
            groups.setdefault(value.lower(), [])
            last_was_ua = True
        elif field in ("allow", "disallow"):
            last_was_ua = False
            if not cur_uas or not value:
                continue
            for tok in cur_uas:
                groups[tok].append((value, field == "allow"))
        else:
            last_was_ua = False
    best, best_len = None, -1
    for tok in groups:
        if tok != "*" and tok in ua and len(tok) > best_len:
            best, best_len = tok, len(tok)
    if best is not None:
        return groups[best]
    return groups.get("*", [])


def _rule_regex(pattern: str) -> re.Pattern:
    """One robots rule -> anchored-at-start regex: ``*`` matches any
    run of characters, a trailing ``$`` anchors the end, everything
    else is literal (regex metacharacters escaped)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(p) for p in body.split("*"))
    return re.compile(rx + ("$" if anchored else ""))


class RobotsMatcher:
    """Compiled RFC 9309 matcher: the most specific (longest-pattern)
    matching rule decides; an Allow beats a Disallow of equal length
    (s2.2.2).  No matching rule -> allowed."""

    __slots__ = ("rules",)

    def __init__(self, rules: List[Tuple[str, bool]]):
        self.rules = [(_rule_regex(p), len(p), allow)
                      for p, allow in rules]

    def allowed(self, path: str) -> bool:
        best_len, best_allow = -1, True
        for rx, plen, allow in self.rules:
            if rx.match(path) and (plen > best_len
                                   or (plen == best_len and allow)):
                best_len, best_allow = plen, allow
        return best_allow


def parse_crawl_delay(text: str, user_agent: str = "*") -> float:
    """``Crawl-delay`` (seconds); 0.0 if absent.

    ``user_agent="*"`` (default — the prefix-matcher configuration of
    rounds 1-4) honors only ``User-agent: *`` groups, byte-identical
    to the historic behavior.  A concrete product token applies the
    SAME group selection as the rule matcher (longest UA-substring
    match, ``*`` fallback, adjacent UA lines sharing a group): the
    delay a spec-following crawler must obey is its own group's, not
    the catch-all's."""
    if user_agent == "*":
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
    ua = user_agent.lower()
    groups: Dict[str, float] = {}
    cur_uas: List[str] = []
    last_was_ua = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not last_was_ua:
                cur_uas = []
            cur_uas.append(value.lower())
            groups.setdefault(value.lower(), 0.0)
            last_was_ua = True
        else:
            if field == "crawl-delay" and cur_uas:
                try:
                    d = max(0.0, float(value))
                except ValueError:
                    d = 0.0
                for tok in cur_uas:
                    if not groups.get(tok):
                        groups[tok] = d
            last_was_ua = False
    best, best_len = None, -1
    for tok in groups:
        if tok != "*" and tok in ua and len(tok) > best_len:
            best, best_len = tok, len(tok)
    if best is not None:
        return groups[best]
    return groups.get("*", 0.0)


class RobotsShard:
    def __init__(self, web_factory=None, matcher: str = "prefix",
                 user_agent: str = "uniparser-ray"):
        # web_factory() -> object with get(url) -> (status, headers, bytes)
        self.web = web_factory() if web_factory else None
        if matcher not in ("prefix", "rfc9309"):
            raise ValueError(f"unknown robots matcher: {matcher!r}")
        self.matcher_mode = matcher
        self.user_agent = user_agent
        # cache value: (allow_fn(path) -> bool, crawl_delay)
        self.cache: Dict[str, Tuple[object, float]] = {}
        self.fetches = 0

    def _compile(self, text: str):
        if self.matcher_mode == "rfc9309":
            m = RobotsMatcher(parse_robots_rfc9309(text, self.user_agent))
            return m.allowed
        rules = parse_robots(text)
        if not rules:
            return None
        return lambda p: not any(p.startswith(r) for r in rules)

    def _entry_for(self, host: str) -> Tuple[object, float]:
        entry = self.cache.get(host)
        if entry is None:
            allow_fn = None
            delay = 0.0
            if self.web is not None:
                try:
                    status, _h, body = self.web.get(f"http://{host}/robots.txt")
                    if status == 200:
                        text = body.decode("utf-8", "replace")
                        allow_fn = self._compile(text)
                        delay = parse_crawl_delay(
                            text,
                            self.user_agent
                            if self.matcher_mode == "rfc9309" else "*")
                except Exception:
                    allow_fn, delay = None, 0.0
            self.fetches += 1
            entry = (allow_fn, delay)
            self.cache[host] = entry
        return entry

    def allowed_batch(self, host: str, paths: List[str]) -> List[bool]:
        allow_fn = self._entry_for(host)[0]
        if allow_fn is None:
            return [True] * len(paths)
        return [allow_fn(p) for p in paths]

    def allowed_many(self, host_paths: List[Tuple[str, str]]) -> List[bool]:
        """[(host, path)] -> allow mask; one RPC covers many hosts (the
        per-batch client groups by shard, not by host)."""
        out = []
        for host, path in host_paths:
            allow_fn = self._entry_for(host)[0]
            out.append(True if allow_fn is None else allow_fn(path))
        return out

    def allowed_delays_many(self, host_paths: List[Tuple[str, str]]) \
            -> Tuple[List[bool], List[float]]:
        """allowed_many + the host's robots Crawl-delay per row (one
        RPC serves both the allow filter and the politeness budget)."""
        mask, delays = [], []
        for host, path in host_paths:
            allow_fn, delay = self._entry_for(host)
            mask.append(True if allow_fn is None else allow_fn(path))
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
