"""map_batches stages of the crawl pipeline.

Stage contract (all ``batch_format="pyarrow"``):

* :func:`canonicalize_batch` — stateless task: canonical URL, 64-bit
  hash, host (vectorized-ish; cheap string work).
* :class:`SeenRobotsStage` — light actor: batched RPCs to the seen
  shards (test-and-set anti-join) and robots cache; returns the
  surviving rows.  Rows with ``seen_ok=1`` (backlog re-admissions)
  bypass the seen test.
* :class:`FetchParseStage` — actor pool: transport + compiled rule
  pack + RuleVM built once per actor; per batch it fetches pages and
  runs the rule VM, emitting parsed results + link/image candidates as
  list columns (exploded by the loop into next-round frontier rows).
* :class:`ImageFetchStage` — actor pool: fetch + decode + phash of
  image URLs, emitting rows in the Lance image+caption schema.

Reference trace being reproduced: Crawler.crawl -> find rule -> fetch
-> parse -> recurse on __request__ (reference: crawler.py:156-189),
re-expressed as one Dataset round (SURVEY.md §3.1).
"""

from __future__ import annotations

import json
import re
from typing import Dict, List

import numpy as np
import pyarrow as pa

from ..config import EngineConfig
from ..rulevm.urlutil import canonicalize_url, url_hash64
from ..rulevm.request import get_host
from ..sources.codecs import average_hash64, decode_image

_PAGE_SCHEMA = pa.schema([
    ("url", pa.large_string()),
    ("url_hash", pa.uint64()),
    ("host", pa.string()),
    ("depth", pa.int32()),
    ("priority", pa.float32()),
    ("parent", pa.large_string()),
    ("retries", pa.int32()),
    ("status", pa.int32()),
    ("rule_name", pa.string()),
    ("result_json", pa.large_string()),
    ("links", pa.list_(pa.large_string())),
    ("img_srcs", pa.list_(pa.large_string())),
    ("img_captions", pa.list_(pa.large_string())),
    ("error", pa.string()),
    # redirect lineage: canonical post-redirect URL ("" when the fetch
    # did not redirect), its 64-bit hash (0 when ""), and the hop count
    ("final_url", pa.large_string()),
    ("final_hash", pa.uint64()),
    ("redirects", pa.int32()),
    # validator for conditional recrawl (If-None-Match), "" if absent
    ("etag", pa.string()),
    # server-requested requeue delay in seconds (Retry-After header on
    # 5xx/3xx responses), 0 when absent
    ("retry_after", pa.float32()),
])

# 3xx statuses the fetcher follows (requests' default semantics — the
# reference's downloader follows redirects transparently)
_REDIRECT_STATUSES = frozenset((301, 302, 303, 307, 308))

IMAGE_ROW_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
])


# URLs matching this are FIXED POINTS of canonicalize_url, provable
# by construction: scheme already lowercase-http, netloc limited to
# lowercase [a-z0-9.-] (no port to strip, no uppercase, no userinfo,
# no IPv6 brackets that could make urlsplit raise), a non-empty path,
# no query (nothing to sort), no fragment (nothing to drop), and no
# \t\r\n (the bytes urlsplit silently REMOVES).  For them canonical
# url == url and host == the text between '//' and the next '/'.
# Everything else takes the per-row slow path — the fast path is an
# optimization, never a semantic change (pinned by a hypothesis fuzz
# comparing the two paths).  Arrow's vectorized regex is ~250x the
# urlsplit loop, which dominated the frontier admit stage's CPU.
_CANON_FAST_RE = r"^http://[a-z0-9.-]+/[^?#\t\r\n]*$"


def canonicalize_batch(batch: pa.Table) -> pa.Table:
    """Add canonical url / url_hash / host columns."""
    import pyarrow.compute as pc
    urls = batch["url"].to_pylist()
    fast = pc.match_substring_regex(
        batch["url"], _CANON_FAST_RE).to_numpy(zero_copy_only=False)
    fast = np.asarray(fast, dtype=bool)
    canon = [u if f else canonicalize_url(u)
             for u, f in zip(urls, fast)]
    hashes = np.fromiter((url_hash64(u) for u in canon), dtype=np.uint64,
                         count=len(canon))
    hosts = [u.split("/", 3)[2] if f else get_host(u, "")
             for u, f in zip(canon, fast)]
    batch = batch.drop_columns([c for c in ("url", "url_hash", "host")
                                if c in batch.column_names])
    out = batch.add_column(0, "url", pa.array(canon, pa.large_string())) \
        .append_column("url_hash", pa.array(hashes, pa.uint64())) \
        .append_column("host", pa.array(hosts, pa.string()))
    # schemas with metadata (e.g. the 'pandas' blob parquet files
    # carry) are UNHASHABLE, which defeats Ray's block-schema dedup
    # and spams "Failed to hash the schemas" warnings — strip it
    return out.replace_schema_metadata(None)


def make_trap_filter(max_depth: int = 0, max_url_len: int = 0,
                     max_path_repeats: int = 0):
    """Spider-trap guards, applied AFTER canonicalization and BEFORE
    the seen test-and-set (a trapped candidate leaves no seen-set
    side effect, so a later legitimate shallow rediscovery still
    fetches).  All three are 0=off:

    * ``max_depth`` — BFS depth bound (calendar/pagination traps grow
      depth without bound);
    * ``max_url_len`` — canonical-URL byte bound (session-id and
      recursive-path traps grow the URL);
    * ``max_path_repeats`` — drop URLs with any path segment repeated
      consecutively more than k times (/x/x/x/...).  RE2 (Arrow's
      regex) has no backreferences, so the repeat check prefilters
      vectorized on segment COUNT (a URL with <= k+1 segments cannot
      repeat one more than k times) and runs Python re only on the
      rare survivors — traps are pathological, not the common case.
    """
    import re as _re
    rep_re = (_re.compile(r"(/[^/]+)\1{%d,}" % max_path_repeats)
              if max_path_repeats > 0 else None)

    def trap_filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = np.ones(t.num_rows, dtype=bool)
        if max_depth > 0:
            keep &= (t["depth"].to_numpy(zero_copy_only=False)
                     <= max_depth)
        if max_url_len > 0:
            keep &= (pc.binary_length(t["url"]).to_numpy(
                zero_copy_only=False) <= max_url_len)
        if rep_re is not None:
            # k+1 repeated segments need >= k+3 slashes total (2 are
            # in the scheme) — everything below that is safe
            nseg = pc.count_substring(t["url"], "/").to_numpy(
                zero_copy_only=False)
            sus = np.flatnonzero(keep & (nseg >= max_path_repeats + 3))
            if sus.size:
                urls = t["url"].take(pa.array(sus)).to_pylist()
                for i, u in zip(sus, urls):
                    parts = u.split("/", 3)
                    path = "/" + parts[3] if len(parts) > 3 else "/"
                    if rep_re.search(path):
                        keep[i] = False
        return t.filter(pa.array(keep))

    return trap_filter


def _sharded_add_futures(shards: List, shard_bits: int,
                         hashes: np.ndarray):
    """Launch one test-and-set RPC per shard for this batch (shard
    runs found by a vectorized argsort — no per-row Python grouping)
    WITHOUT blocking: returns (slices, futures) so the caller can
    coalesce the wait with other RPC waves (every blocked ``ray.get``
    inside a map task invites the raylet to spawn a replacement
    worker — fewer, wider waits keep the pool stable)."""
    if not hashes.size:
        return [], []
    sids = (hashes >> np.uint64(64 - shard_bits)).astype(np.int64)
    order = np.argsort(sids, kind="stable")
    ssorted = sids[order]
    bounds = np.flatnonzero(np.diff(ssorted)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [ssorted.size]))
    slices = [order[s:e] for s, e in zip(starts, ends)]
    # ship numpy slices, not python lists: arrays serialize
    # zero-copy through the object store (10M tolist() ints cost
    # whole seconds per round at frontier scale)
    futures = [shards[int(ssorted[s])].add_batch.remote(
        hashes[idxs]) for s, idxs in zip(starts, slices)]
    return slices, futures


def _sharded_add_batch(shards: List, shard_bits: int,
                       hashes: np.ndarray) -> np.ndarray:
    """One test-and-set RPC per shard per batch (blocking form)."""
    import ray
    out = np.zeros(hashes.size, dtype=bool)
    slices, futures = _sharded_add_futures(shards, shard_bits, hashes)
    for idxs, res in zip(slices, ray.get(futures)):
        out[idxs] = res
    return out


class SeenRobotsStage:
    """Anti-join against the seen shards + robots allow filter.

    Holds only actor handles; safe at any concurrency because the
    shards' test-and-set is atomic per shard."""

    def __init__(self, seen_shards: List, shard_bits: int,
                 robots_shards: List = None, robots_num: int = 0):
        self.seen_shards = seen_shards
        self.shard_bits = shard_bits
        self.robots_shards = robots_shards or []
        self.robots_num = robots_num

    def _seen_mask(self, hashes: np.ndarray) -> np.ndarray:
        return _sharded_add_batch(self.seen_shards, self.shard_bits, hashes)

    def _robots_futures(self, hosts: List[str], urls: List[str]):
        """Launch (allow mask, Crawl-delay) RPCs — one per shard per
        batch — without blocking: returns (slices, futures)."""
        if not self.robots_shards or not urls:
            return [], []
        # group by SHARD (one RPC per shard per batch) — the shard id
        # hash runs once per UNIQUE host, runs found by argsort
        paths = ["/" + u.split("/", 3)[3] if u.count("/") >= 3 else "/"
                 for u in urls]
        uniq, inv = np.unique(np.asarray(hosts, dtype=object),
                              return_inverse=True)
        host_sid = np.array([url_hash64(h) % self.robots_num for h in uniq],
                            dtype=np.int64)
        sids = host_sid[inv]
        order = np.argsort(sids, kind="stable")
        ssorted = sids[order]
        bounds = np.flatnonzero(np.diff(ssorted)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [ssorted.size]))
        slices = [order[s:e] for s, e in zip(starts, ends)]
        futures = [
            self.robots_shards[int(ssorted[s])].allowed_delays_many.remote(
                [(hosts[i], paths[i]) for i in idxs])
            for s, idxs in zip(starts, slices)]
        return slices, futures

    def _robots_mask(self, hosts: List[str], urls: List[str]) \
            -> tuple[np.ndarray, np.ndarray]:
        """(allow mask, per-row robots Crawl-delay) — both served by
        the SAME one-RPC-per-shard-per-batch round trip."""
        import ray
        out = np.ones(len(urls), dtype=bool)
        delays = np.zeros(len(urls), dtype=np.float32)
        slices, futures = self._robots_futures(hosts, urls)
        for idxs, (mask, ds) in zip(slices, ray.get(futures)):
            out[idxs] = mask
            delays[idxs] = ds
        return out, delays

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray
        if batch.num_rows == 0:
            # keep the output schema identical to the non-empty path
            return batch.append_column(
                "crawl_delay", pa.array([], pa.float32()))
        hashes = batch["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if "seen_ok" in batch.column_names:
            bypass = batch["seen_ok"].to_numpy(zero_copy_only=False).astype(bool)
        else:
            bypass = np.zeros(len(hashes), dtype=bool)
        fresh = np.ones(len(hashes), dtype=bool)
        todo = ~bypass
        urls = batch["url"].to_pylist()
        hosts = batch["host"].to_pylist()
        # launch the seen test-and-set AND the robots lookups, then
        # wait ONCE: a single coalesced ray.get per batch instead of
        # two sequential waves — halves the blocked-worker windows
        # that make the raylet spawn replacement workers, and overlaps
        # the two RPC families' latencies
        s_slices, s_futs = ([], [])
        if todo.any():
            s_slices, s_futs = _sharded_add_futures(
                self.seen_shards, self.shard_bits, hashes[todo])
        r_slices, r_futs = self._robots_futures(hosts, urls)
        results = ray.get(list(s_futs) + list(r_futs))
        if s_futs:
            sub = np.zeros(int(todo.sum()), dtype=bool)
            for idxs, res in zip(s_slices, results[:len(s_futs)]):
                sub[idxs] = res
            fresh[todo] = sub
        keep = fresh | bypass
        allowed = np.ones(len(urls), dtype=bool)
        delays = np.zeros(len(urls), dtype=np.float32)
        for idxs, (mask, ds) in zip(r_slices, results[len(s_futs):]):
            allowed[idxs] = mask
            delays[idxs] = ds
        keep &= allowed
        # the host's robots Crawl-delay rides the admitted rows so the
        # politeness granter can derive per-host budgets with NO extra
        # robots round-trip
        batch = batch.append_column("crawl_delay",
                                    pa.array(delays, pa.float32()))
        return batch.filter(pa.array(keep))


class HashSeenStage:
    """Generic cross-batch dedup: keep rows whose ``url_hash`` is newly
    added to the given seen shards (used for image-URL dedup)."""

    def __init__(self, seen_shards: List, shard_bits: int):
        self.seen_shards = seen_shards
        self.shard_bits = shard_bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        hashes = batch["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        out = _sharded_add_batch(self.seen_shards, self.shard_bits, hashes)
        return batch.filter(pa.array(out))


class FetchParseStage:
    """Fetch + rule-match + rule-VM parse, one actor per slot.

    ``__init__`` does the once-per-actor work (reference analog: the
    compiled-rule cache CompiledString + HTTP session,
    parsers.py:980-1003 / utils.py:321-334): build the transport from
    the web config, compile the broadcast rule pack, warm the VM.
    """

    def __init__(self, rule_pack_ref=None, web_config: dict = None,
                 rule_pack: dict = None, politeness_shards: List = None,
                 politeness_num: int = 0, sleep_fn=None,
                 image_data_dir: str = None, image_seen_shards: List = None,
                 image_shard_bits: int = 0, image_batch_size: int = 128,
                 max_redirects: int = 5, seen_shards: List = None,
                 seen_shard_bits: int = 0, robots_shards: List = None,
                 page_ckpt_dir: str = None):
        import ray
        from ..crawl.storage import JSONRuleStorage
        from ..rulevm.transport import SyntheticWebAdapter
        from ..rulevm.vm import RuleVM
        from ..sources.synthweb import SynthWeb

        if rule_pack is None:
            rule_pack = ray.get(rule_pack_ref)
        self.storage = JSONRuleStorage(**rule_pack)
        self.web = SynthWeb(**web_config)
        self.adapter = SyntheticWebAdapter(self.web)
        self.vm = RuleVM()
        self._rule_cache: Dict[str, object] = {}
        # fused image side-channel: when an image table dir is given,
        # each fetch task explodes its own pages' <img> candidates,
        # test-and-sets the image-seen shards, fetches + decodes the
        # survivors, and writes a Lance fragment DIRECTLY from the task
        # (bytes never ride the page stream or touch the driver).  This
        # folds the round's second Ray execution into the first — the
        # per-round fixed cost of a whole pipeline start disappears and
        # the image work overlaps page fetching inside the same pool.
        # The fragment set is identical to the standalone ImageFetchStage
        # path (same explode, same seen shards, same decode), only the
        # execution geometry changes.
        self.image_data_dir = image_data_dir
        self.image_batch_size = image_batch_size
        # fused page-checkpoint write: when a pages dir is given, each
        # fetch task writes ITS OWN batch's checkpoint rows (minus the
        # frontier-only list columns) straight into the round's
        # partition dir, so parquet encode + disk I/O overlap fetching
        # and the loop's separate write execution (a full second pass
        # over the materialized page blocks) disappears.  File names
        # are DETERMINISTIC — fused-{round}-{min url_hash}-{rows} — so
        # a retried task overwrites its own file (idempotent) instead
        # of duplicating rows the way a fresh-uuid name would.
        self.page_ckpt_dir = page_ckpt_dir
        self._img_stage = (
            ImageFetchStage(web_config=web_config,
                            seen_shards=image_seen_shards,
                            shard_bits=image_shard_bits)
            if image_data_dir else None)
        # wall-clock politeness (real-web mode): when shards are given,
        # each batch acquires per-host delay schedules before fetching.
        # The round-based virtual-clock grant is the deterministic
        # default; this path is for continuous (non-round) fetching.
        self.politeness_shards = politeness_shards or []
        self.politeness_num = politeness_num
        import time as _time
        self._sleep = sleep_fn or _time.sleep
        self._now = _time.monotonic
        # 3xx handling: hops are followed INLINE (requests semantics —
        # the reference's transports follow redirects transparently,
        # so a granted URL costs one politeness token regardless of
        # hops).  The canonical FINAL URL is test-and-set against the
        # URL-seen shards so (a) a page reachable both by a legacy URL
        # and its canonical URL is extracted once — whichever arrives
        # first wins, the loser keeps its status/lineage but parses
        # nothing (error=RedirectDuplicate) — and (b) later direct
        # links to the canonical URL dedup at admission.  A chain that
        # exceeds max_redirects or revisits a URL lands as status -2
        # (permanent: never requeued by the retry path, which only
        # takes -1/5xx).
        self.max_redirects = max_redirects
        self.seen_shards = seen_shards or []
        self.seen_shard_bits = seen_shard_bits
        # robots on redirect TARGETS: admission only vets the requested
        # URL, so without a per-hop check a 301 chain would smuggle a
        # disallowed page past robots.  A disallowed hop terminates the
        # chain as status -3 (permanent).  This also keeps redirect
        # dedup independent of admission-time seen side effects: a
        # disallowed canonical URL is stopped by THIS check, never by
        # the (resume-unreplayable) hash its rejected admission left in
        # the seen shards.  RPCs happen only on actual 3xx hops.
        self.robots_shards = robots_shards or []

    def _politeness_targets(self, hosts: List[str]):
        """Acquire wall-clock delay schedules host-by-host and return
        (t0, per-url target offsets): before issuing request i the
        fetcher sleeps until t0 + targets[i], so PACING WITHIN the
        batch honors Frequency(n, interval) — requests are not fired
        back-to-back after one bulk sleep.  Delays are computed on the
        shard's own clock (one shard owns all of a host's schedule, so
        timestamps never cross node clock domains); the RPC latency
        between actor and fetcher only shifts the schedule later —
        the polite direction."""
        import ray
        from collections import Counter, defaultdict
        if not self.politeness_shards:
            return None
        counts = Counter(hosts)
        # ONE RPC per shard per batch (not per host): a batch touches
        # up to batch_size distinct hosts, and per-host calls queue-storm
        # the shard actors at high task concurrency
        per_shard: Dict[int, list] = defaultdict(list)
        for host, cnt in counts.items():
            per_shard[url_hash64(host) % self.politeness_num].append(
                (host, cnt))
        futures = [
            (pairs, self.politeness_shards[si].acquire_batch_many.remote(
                [h for h, _ in pairs], [c for _, c in pairs]))
            for si, pairs in per_shard.items()]
        delays = {}
        for pairs, fut in futures:
            for (host, _), d in zip(pairs, ray.get(fut)):
                delays[host] = d
        t0 = self._now()
        nth: Dict[str, int] = defaultdict(int)
        targets = []
        for h in hosts:
            targets.append(delays[h][nth[h]])
            nth[h] += 1
        return t0, targets

    def _find_rule(self, url: str):
        # host-level cache: single-rule hosts resolve without regex scans
        host = get_host(url, "")
        cached = self._rule_cache.get(host)
        if cached is not None:
            rules, single = cached
        else:
            host_rule = self.storage.get(host)
            rules = list(host_rule["crawler_rules"].values()) if host_rule else []
            single = len(rules) == 1 and not rules[0]["regex"]
            self._rule_cache[host] = (rules, single)
        if single:
            return rules[0]
        for rule in rules:
            if rule.check_regex(url):
                return rule
        return None

    def _hop_allowed(self, url: str) -> bool:
        """robots check for one redirect target (rare: one RPC per
        actual 3xx hop; the requested URL was vetted at admission)."""
        if not self.robots_shards:
            return True
        import ray
        host = get_host(url, "")
        path = "/" + url.split("/", 3)[3] if url.count("/") >= 3 else "/"
        shard = self.robots_shards[
            url_hash64(host) % len(self.robots_shards)]
        mask, _delays = ray.get(
            shard.allowed_delays_many.remote([(host, path)]))
        return bool(mask[0])

    def _follow_fetch(self, rule, url: str, attempt: int):
        """One logical fetch with inline 3xx following (bounded by
        ``max_redirects``; a chain that revisits a URL is a loop).
        Returns (text, resp|None, status, final_canon_url, hops, err) —
        final_canon_url is "" when the fetch never redirected."""
        from urllib.parse import urljoin

        cur, hops, visited = url, 0, {url}
        while True:
            args = dict(rule.get_request(url=cur))
            # attempt number reaches the (synthetic) web so transient
            # failures can be deterministic per (url, attempt)
            args["attempt"] = attempt
            text, resp = self.adapter.request(**args)
            if isinstance(resp, Exception):
                return "", None, -1, "", hops, \
                    f"{type(resp).__name__}: {resp}"
            status = getattr(resp, "status_code", 200)
            if status in _REDIRECT_STATUSES:
                loc = (resp.headers.get("Location")
                       or resp.headers.get("location"))
                if loc:
                    nxt = urljoin(cur, loc)
                    hops += 1
                    if hops > self.max_redirects or nxt in visited:
                        reason = ("RedirectLoop" if nxt in visited
                                  else "TooManyRedirects")
                        return "", None, -2, "", hops, \
                            f"{reason}: {url} -> {nxt}"
                    if not self._hop_allowed(nxt):
                        return "", None, -3, "", hops, \
                            f"RedirectDisallowed: {url} -> {nxt}"
                    visited.add(nxt)
                    cur = nxt
                    continue
                # 3xx without Location is terminal — fall through
            final = canonicalize_url(cur) if hops else ""
            return text, resp, status, final, hops, None

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        hashes = batch["url_hash"].to_pylist()
        hosts = batch["host"].to_pylist()
        pacing = self._politeness_targets(hosts)
        depths = batch["depth"].to_pylist()
        priors = batch["priority"].to_pylist()
        parents = batch["parent"].to_pylist()
        retries = (batch["retries"].to_pylist()
                   if "retries" in batch.column_names else [0] * len(urls))
        # pass 1 — fetch (with pacing + redirect following); parse is
        # deferred so redirected rows can be dedup-checked in ONE
        # sharded RPC wave before any content is parsed
        fetched = []
        for i, url in enumerate(urls):
            if pacing is not None:
                t0, targets = pacing
                wait = targets[i] - (self._now() - t0)
                if wait > 0:
                    self._sleep(wait)
            rule = self._find_rule(url)
            if rule is None:
                fetched.append((None, "", None, 0, "", 0,
                                "RuleNotFoundError"))
                continue
            text, resp, status, final, hops, err = \
                self._follow_fetch(rule, url, retries[i])
            fetched.append((rule, text, resp, status, final, hops, err))
        # batched final-URL test-and-set: a redirected 200 row extracts
        # only if its canonical final URL is NEW to the seen set (the
        # requested URL's own hash was added at admission)
        redirected = [i for i, f in enumerate(fetched)
                      if f[3] == 200 and f[4] and f[4] != urls[i]]
        fresh_final = {i: True for i in redirected}
        if redirected and self.seen_shards:
            fh = np.fromiter((url_hash64(fetched[i][4]) for i in redirected),
                             dtype=np.uint64, count=len(redirected))
            ok = _sharded_add_batch(self.seen_shards, self.seen_shard_bits,
                                    fh)
            fresh_final = {i: bool(o) for i, o in zip(redirected, ok)}
        out = {k: [] for k in ("status", "rule_name", "result_json", "links",
                               "img_srcs", "img_captions", "error",
                               "final_url", "final_hash", "redirects",
                               "etag", "retry_after")}
        # pass 2 — parse the survivors
        for i, (rule, text, resp, status, final, hops, err) in \
                enumerate(fetched):
            out["final_url"].append(final)
            out["final_hash"].append(url_hash64(final) if final else 0)
            out["redirects"].append(hops)
            out["etag"].append(
                (resp.headers.get("ETag") or "") if resp is not None else "")
            try:
                out["retry_after"].append(
                    float(resp.headers.get("Retry-After", 0) or 0)
                    if resp is not None else 0.0)
            except (TypeError, ValueError):   # HTTP-date form: ignore
                out["retry_after"].append(0.0)
            if rule is None:
                out["status"].append(0)
                out["rule_name"].append("")
                out["result_json"].append("")
                out["links"].append([])
                out["img_srcs"].append([])
                out["img_captions"].append([])
                out["error"].append("RuleNotFoundError")
                continue
            name = rule["name"]
            links: List[str] = []
            srcs: List[str] = []
            caps: List[str] = []
            result_json = ""
            if status == 200 and not fresh_final.get(i, True):
                err = "RedirectDuplicate"
            elif status == 200:
                context = {"resp": resp,
                           "request_args": {"url": urls[i], "method": "get"}}
                try:
                    result = self.vm.parse(text, rule, context)
                    body = result.get(name, {})
                    raw_links = body.get(EngineConfig.__request__) or []
                    if isinstance(raw_links, (list, tuple)):
                        links = [l for l in raw_links if isinstance(l, str)]
                    elif isinstance(raw_links, str):
                        links = [raw_links]
                    for img in body.get("images") or []:
                        if isinstance(img, dict) and img.get("src"):
                            srcs.append(img["src"])
                            caps.append(img.get("caption") or "")
                    result_json = json.dumps(body, default=repr,
                                             sort_keys=False)
                except Exception as e:  # InvalidSchema / Unknown parser etc.
                    err = f"{type(e).__name__}: {e}"
            out["status"].append(status)
            out["rule_name"].append(name)
            out["result_json"].append(result_json)
            out["links"].append(links)
            out["img_srcs"].append(srcs)
            out["img_captions"].append(caps)
            out["error"].append(err)
        page_tbl = self._page_table(urls, hashes, hosts, depths, priors,
                                    parents, retries, out)
        if "_round" in batch.column_names and batch.num_rows:
            round_no = int(batch["_round"][0].as_py())
            if self._img_stage is not None:
                self._fetch_images(page_tbl, round_no)
            if self.page_ckpt_dir is not None:
                self._write_page_ckpt(page_tbl, round_no)
        return page_tbl

    def _write_page_ckpt(self, page_tbl: pa.Table, round_no: int) -> None:
        """Fused page-checkpoint write (see __init__)."""
        from pathlib import Path

        import pyarrow.parquet as _pq
        if page_tbl.num_rows == 0:
            return
        out_dir = Path(self.page_ckpt_dir) / f"round={round_no}"
        out_dir.mkdir(parents=True, exist_ok=True)
        lo = min(page_tbl["url_hash"].to_pylist())
        _pq.write_table(
            page_tbl.drop_columns(["links", "img_srcs", "img_captions"]),
            out_dir / f"fused-{round_no}-{lo:016x}-"
                      f"{page_tbl.num_rows}.parquet")

    def _fetch_images(self, page_tbl: pa.Table, round_no: int) -> None:
        """Fused image side-channel (see __init__): explode this page
        batch's candidates, dedup via the seen shards, fetch + decode,
        and write one fragment per ``image_batch_size`` chunk straight
        into the round's partition dir.  Chunking bounds task memory:
        at most one chunk of decoded payloads is live at a time."""
        import uuid
        from pathlib import Path

        import pyarrow.parquet as _pq

        cand = explode_images(page_tbl)
        if cand.num_rows == 0:
            return
        out_dir = Path(self.image_data_dir) / f"round={round_no}"
        out_dir.mkdir(parents=True, exist_ok=True)
        step = max(1, int(self.image_batch_size))
        for off in range(0, cand.num_rows, step):
            rows = self._img_stage(cand.slice(off, step))
            if rows.num_rows == 0:
                continue
            _pq.write_table(
                rows, out_dir / f"fused-{uuid.uuid4().hex}.parquet")

    @staticmethod
    def _page_table(urls, hashes, hosts, depths, priors, parents,
                    retries, out) -> pa.Table:
        return pa.Table.from_arrays([
            pa.array(urls, pa.large_string()),
            pa.array(hashes, pa.uint64()),
            pa.array(hosts, pa.string()),
            pa.array(depths, pa.int32()),
            pa.array(priors, pa.float32()),
            pa.array(parents, pa.large_string()),
            pa.array(retries, pa.int32()),
            pa.array(out["status"], pa.int32()),
            pa.array(out["rule_name"], pa.string()),
            pa.array(out["result_json"], pa.large_string()),
            pa.array(out["links"], pa.list_(pa.large_string())),
            pa.array(out["img_srcs"], pa.list_(pa.large_string())),
            pa.array(out["img_captions"], pa.list_(pa.large_string())),
            pa.array(out["error"], pa.string()),
            pa.array(out["final_url"], pa.large_string()),
            pa.array(out["final_hash"], pa.uint64()),
            pa.array(out["redirects"], pa.int32()),
            pa.array(out["etag"], pa.string()),
            pa.array(out["retry_after"], pa.float32()),
        ], schema=_PAGE_SCHEMA)


def explode_images(batch: pa.Table) -> pa.Table:
    """Page rows -> image-candidate rows.  Flatten/take/regex are Arrow
    kernels; only the seen-filter hash (md5-backed, must match the
    oracle's url_hash64) stays per-element."""
    import pyarrow.compute as pc
    srcs_col = batch["img_srcs"]
    flat_src = pc.list_flatten(srcs_col).cast(pa.large_string())
    flat_cap = pc.list_flatten(batch["img_captions"]).cast(pa.large_string())
    idx = pc.list_parent_indices(srcs_col)
    parents = pc.take(batch["url"], idx).cast(pa.large_string())
    # origin (scheme://host) of the parent for relative srcs
    origins = pc.struct_field(
        pc.extract_regex(parents, r"^(?P<o>[^/]+//[^/]*)"), "o")
    joined = pc.binary_join_element_wise(
        pc.fill_null(origins.cast(pa.large_string()), ""), flat_src,
        pa.scalar("", pa.large_string()))
    img_urls_arr = pc.if_else(pc.starts_with(flat_src, "http"),
                              flat_src, joined)
    img_urls = img_urls_arr.to_pylist()
    t = pa.Table.from_arrays([img_urls_arr, flat_cap, parents],
                             names=["img_url", "caption", "parent"])
    # in-batch dedup by image URL (cross-batch dedup via the seen shards)
    hashes = pa.array([url_hash64("img|" + u) for u in img_urls], pa.uint64())
    return t.append_column("url_hash", hashes)

_IMG_ID_RE = re.compile(r"/img/(\d+)\.(?:ppm|bmp|png|qpx)$")


class ImageFetchStage:
    """Fetch + decode + phash image URLs -> Lance image+caption rows.

    At 100 TB this is the byte-heavy stage: keep ``batch_size`` small
    (payloads are MBs) and scale via ``concurrency``; decode is
    numpy-vectorized per image.  image_id derives from the URL (the
    synthetic web encodes the global image index; foreign URLs fall
    back to a hash id)."""

    def __init__(self, web_config: dict = None, seen_shards: List = None,
                 shard_bits: int = 0):
        from ..rulevm.transport import SyntheticWebAdapter
        from ..sources.synthweb import SynthWeb
        self.adapter = SyntheticWebAdapter(SynthWeb(**web_config))
        # optional fused dedup (one actor pool instead of two per round)
        self.seen = (HashSeenStage(seen_shards, shard_bits)
                     if seen_shards else None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..rulevm.parsers import md5 as _md5
        if self.seen is not None:
            batch = self.seen(batch)
        urls = batch["img_url"].to_pylist()
        captions = batch["caption"].to_pylist()
        ids, blobs, ws, hs, fmts, caps, hashes, srcs = [], [], [], [], [], [], [], []
        for url, caption in zip(urls, captions):
            text, resp = self.adapter.request(url=url, method="get")
            if isinstance(resp, Exception) or getattr(resp, "status_code", 0) != 200:
                continue
            blob = resp.content
            try:
                px = decode_image(blob)
            except Exception:
                continue
            m = _IMG_ID_RE.search(url)
            ids.append(f"img-{int(m.group(1)):010d}" if m else f"img-{_md5(url, 16)}")
            blobs.append(blob)
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            fmts.append(url.rsplit(".", 1)[-1])
            caps.append(caption)
            hashes.append(average_hash64(px))
            srcs.append(url)
        table = pa.Table.from_arrays([
            pa.array(ids, pa.string()),
            pa.array(blobs, pa.binary()),
            pa.array(ws, pa.int32()),
            pa.array(hs, pa.int32()),
            pa.array(fmts, pa.string()),
            pa.array(caps, pa.string()),
            pa.array(hashes, pa.int64()),
        ], schema=IMAGE_ROW_SCHEMA)
        # lineage sidecar column: the fetched URL (also the resume key
        # for the image-seen filter)
        return table.append_column("src_url", pa.array(srcs, pa.large_string()))
