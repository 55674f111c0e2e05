"""RFC 9309 robots-matcher conformance (round 5).

Spec semantics pinned: wildcard `*`, end-anchor `$`, longest-match
precedence with Allow winning ties, user-agent group selection by
longest product-token substring match with `*` fallback, adjacent
user-agent lines sharing one group, same-token groups merging, and
rules before any user-agent line belonging to no group.  A naive
independent matcher (character-walk backtracking) fuzzes the compiled
regex form, and a differential crawl pins engine == oracle schedules
over a wildcard-robots web.
"""
import re

import pytest

from uniparser_ray.state.robots import (RobotsMatcher,
                                        parse_robots_rfc9309)


def _naive_match(pattern: str, path: str) -> bool:
    """Independent reference: char-walk with backtracking on '*'."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern

    def walk(pi, si):
        while True:
            if pi == len(body):
                return si == len(path) if anchored else True
            c = body[pi]
            if c == "*":
                return any(walk(pi + 1, k) for k in range(si, len(path) + 1))
            if si < len(path) and path[si] == c:
                pi += 1
                si += 1
                continue
            return False

    return walk(0, 0)


def test_rfc_examples():
    t = ("User-agent: *\n"
         "Disallow: /private/\n"
         "Allow: /private/public*\n"
         "Disallow: /*.gif$\n")
    m = RobotsMatcher(parse_robots_rfc9309(t))
    assert m.allowed("/ok.html")
    assert not m.allowed("/private/x")
    assert m.allowed("/private/public-page")
    assert not m.allowed("/img/cat.gif")
    assert m.allowed("/img/cat.gifx")       # $ anchors


def test_group_selection_longest_token():
    t = ("User-agent: googlebot-news\nDisallow: /news-off/\n"
         "User-agent: *\nDisallow: /all-off/\n"
         "User-agent: googlebot\nDisallow: /gb-off/\n")
    assert parse_robots_rfc9309(t, "googlebot-news/1.0") \
        == [("/news-off/", False)]
    assert parse_robots_rfc9309(t, "googlebot/2.1") == [("/gb-off/", False)]
    assert parse_robots_rfc9309(t, "otherbot") == [("/all-off/", False)]


def test_adjacent_and_merged_groups():
    t = ("User-agent: a\nUser-agent: b\nDisallow: /x/\n"
         "User-agent: a\nDisallow: /y/\n")
    assert sorted(parse_robots_rfc9309(t, "a")) == [("/x/", False),
                                                    ("/y/", False)]
    assert parse_robots_rfc9309(t, "b") == [("/x/", False)]


def test_precedence_longest_match_and_allow_tie():
    m = RobotsMatcher(parse_robots_rfc9309(
        "User-agent: *\nAllow: /p\nDisallow: /p/q\n"))
    assert m.allowed("/p/z") and not m.allowed("/p/q/r")
    # exact tie -> Allow wins
    m2 = RobotsMatcher(parse_robots_rfc9309(
        "User-agent: *\nAllow: /dir\nDisallow: /dir\n"))
    assert m2.allowed("/dir/x")


def test_hostile_inputs():
    # rules before any UA line: no group; empty Disallow: allow all
    assert parse_robots_rfc9309("Disallow: /early/\nUser-agent: *\n"
                                "Disallow:\n") == []
    m = RobotsMatcher([])
    assert m.allowed("/anything")
    # regex metacharacters in rule paths must be literal
    m3 = RobotsMatcher(parse_robots_rfc9309(
        "User-agent: *\nDisallow: /a+b(c)./\n"))
    assert not m3.allowed("/a+b(c)./x")
    assert m3.allowed("/aab(c)./x")


def test_fuzz_vs_naive():
    import itertools
    import random
    rnd = random.Random(9309)
    alphabet = "ab/*."
    for _ in range(400):
        pat = "".join(rnd.choice(alphabet) for _ in range(rnd.randint(1, 8)))
        if rnd.random() < 0.3:
            pat += "$"
        path = "".join(rnd.choice("ab/.") for _ in range(rnd.randint(0, 10)))
        m = RobotsMatcher([(pat, False)])
        # matcher DISALLOWS path iff the pattern matches it
        assert (not m.allowed(path)) == _naive_match(pat, path), (pat, path)


def test_crawl_rfc9309_differential(ray_session, tmp_path):
    """Engine crawl with robots_matcher='rfc9309' over the wildcard-
    robots web == the rfc-configured sequential oracle, round for
    round — and the wildcard semantics demonstrably bite (some page
    allowed by the prefix matcher is blocked by the RFC one)."""
    import pyarrow.parquet as pq

    from uniparser_ray.crawl.loop import CrawlConfig, run_crawl
    from uniparser_ray.crawl.oracle import BFSOracle
    from uniparser_ray.sources.synthweb import SynthWeb

    cfgw = dict(num_hosts=4, base_pages=30, fanout=3, hot_factor=4.0,
                robots_wildcards=True)
    web = SynthWeb(**cfgw)
    out = tmp_path / "rfc_crawl"
    cfg = CrawlConfig(web_config=cfgw, out_dir=str(out),
                      seeds=web.seed_urls(), max_rounds=20,
                      per_host_budget=4, fetch_concurrency=2,
                      seen_shard_bits=2, robots_matcher="rfc9309")
    totals = run_crawl(cfg, web.rule_pack())
    assert totals["pages_ok"] > 0

    rounds = []
    for r in range(20):
        d = out / "pages" / f"round={r}"
        if not d.exists():
            continue
        urls = []
        for f in sorted(d.glob("*.parquet")):
            urls += pq.read_table(f, columns=["url"])["url"].to_pylist()
        rounds.append(sorted(urls))

    oracle = BFSOracle(SynthWeb(**cfgw), web.rule_pack(),
                       per_host_budget=4, robots_matcher="rfc9309")
    want = oracle.run(web.seed_urls(), max_rounds=20)
    assert rounds == [r["fetched"] for r in want["rounds"]]

    # the wildcard rules bite: host 0 (v=0 group) blocks /page/3 and
    # /page/23 but allows /page/13; none of the blocked ones fetched
    fetched = {u for rs in rounds for u in rs}
    h0 = web.host_name(0)
    assert f"http://{h0}/page/3" not in fetched
    assert f"http://{h0}/page/23" not in fetched
    if web.pages_of_host[0] > 13:
        assert f"http://{h0}/page/13" in fetched


def test_fuzz_group_selection_vs_naive():
    """Group selection fuzz: random robots files with random UA tokens
    vs an independent naive reimplementation (parse groups by state
    machine, pick longest substring token, * fallback, merge
    same-token groups)."""
    import random

    rnd = random.Random(2209)
    toks = ["bot", "b", "botx", "my-bot", "other", "*"]

    def naive(text, ua):
        groups, cur, last_ua = {}, [], False
        for raw in text.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            f, v = [x.strip() for x in line.split(":", 1)]
            f = f.lower()
            if f == "user-agent":
                if not last_ua:
                    cur = []
                cur.append(v.lower())
                groups.setdefault(v.lower(), [])
                last_ua = True
            elif f in ("allow", "disallow"):
                last_ua = False
                if cur and v:
                    for t in cur:
                        groups[t].append((v, f == "allow"))
            else:
                last_ua = False
        cands = [t for t in groups if t != "*" and t in ua.lower()]
        if cands:
            return groups[max(cands, key=len)]
        return groups.get("*", [])

    for _ in range(300):
        lines = []
        for _ in range(rnd.randint(1, 12)):
            r = rnd.random()
            if r < 0.4:
                lines.append(f"User-agent: {rnd.choice(toks)}")
            elif r < 0.7:
                lines.append(f"Disallow: /{rnd.choice('abc')}/")
            elif r < 0.9:
                lines.append(f"Allow: /{rnd.choice('abc')}")
            else:
                lines.append("Crawl-delay: 5")
        text = "\n".join(lines)
        ua = rnd.choice(["my-bot/1.0", "botx", "zzz", "b"])
        assert parse_robots_rfc9309(text, ua) == naive(text, ua), \
            (text, ua)


def test_crawl_delay_group_selection():
    """Group-aware Crawl-delay (rfc mode): the crawler's OWN group's
    delay wins over the catch-all's; ua='*' keeps the historic
    *-group-only behavior byte for byte."""
    from uniparser_ray.state.robots import parse_crawl_delay

    t = ("User-agent: uniparser-ray\nCrawl-delay: 40\nDisallow:\n"
         "User-agent: *\nCrawl-delay: 5\nDisallow:\n")
    assert parse_crawl_delay(t) == 5.0                   # historic
    assert parse_crawl_delay(t, "uniparser-ray") == 40.0
    assert parse_crawl_delay(t, "otherbot") == 5.0       # * fallback
    # adjacent UA lines share the delay; bogus values read 0
    t2 = "User-agent: a\nUser-agent: b\nCrawl-delay: nope\n"
    assert parse_crawl_delay(t2, "a") == 0.0
    t3 = "User-agent: a\nCrawl-delay: 7\n"
    assert parse_crawl_delay(t3, "a-bot") == 7.0
    assert parse_crawl_delay(t3) == 0.0                  # no * group
