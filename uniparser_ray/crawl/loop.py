"""The distributed crawl: round-based BFS over a checkpointed frontier.

One round = one Ray Data pipeline (SURVEY.md §3.1):

    read frontier_r (parquet checkpoint)
      -> map_batches: canonicalize + url_hash + host      [stateless]
      -> map_batches: seen test-and-set + robots filter   [actor RPCs]
      -> groupby(host).map_groups: politeness top-k grant [shuffle #1]
      -> map_batches(FetchParseStage, concurrency=N)      [actor pool]
      -> sinks: pages parquet (round-partitioned);
                image candidates -> dedup -> ImageFetchStage
                  -> Lance image+caption fragments;
                links + backlog -> frontier_{r+1} checkpoint

Determinism: which URLs are fetched in round r is decided by a stable
per-host sort on (priority, url_hash) under a fixed per-host budget —
the virtual-clock politeness model — so the round assignment, the
URL-seen set, and every parsed value are reproducible and equal to the
single-process oracle's (tests assert this).  Lineage: every frontier
row carries (parent, depth); every sink is partitioned by round, so a
failed run resumes from the last committed round.

Scale notes (the 10^10 design):
* the frontier lives on disk between rounds — the driver never holds
  URLs, only Dataset handles and per-round counters;
* the only all-to-all exchange is the groupby(host) grant (politeness
  locality); hot hosts are bounded by the budget so the biggest group
  is budget + max_pending rows — skew is clipped, not shuffled;
* the seen anti-join is actor-sharded by hash prefix (no shuffle);
* image payload fetching is an actor pool with small batches so
  multi-MB bodies never concentrate in one block.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..rulevm.urlutil import url_hash64
from ..stages.crawl_stages import (FetchParseStage, ImageFetchStage,
                                   SeenRobotsStage, canonicalize_batch)
from ..state.seen import SeenFilter
from ..storage.lance_layout import LanceLayoutTable

FRONTIER_SCHEMA = pa.schema([
    ("url", pa.large_string()),
    ("parent", pa.large_string()),
    ("depth", pa.int32()),
    ("priority", pa.float32()),
    ("retries", pa.int32()),
    ("seen_ok", pa.int8()),
    # earliest round this row may be admitted (0 = always) — the
    # Retry-After deferral lane: a deferred row rides frontier
    # checkpoints untouched until its round arrives
    ("ready_round", pa.int32()),
])


@dataclass
class CrawlConfig:
    web_config: dict
    out_dir: str
    seeds: List[str] = None
    max_rounds: int = 20
    per_host_budget: int = 8          # fetches per host per round (politeness)
    max_pending_per_host: int = 1000  # backlog cap (frontier bound)
    fetch_concurrency: int = 4
    fetch_batch_size: int = 128
    image_batch_size: int = 128       # keep small when payloads are MBs
    # fold the image side-channel INTO the fetch tasks (each task
    # explodes/dedups/fetches its own pages' images and writes Lance
    # fragments directly), eliminating the round's second Ray execution
    # and overlapping image work with page fetching.  Row-for-row
    # identical to the standalone ImageFetchStage execution (pinned by
    # test); False restores the two-execution layout.
    fuse_image_fetch: bool = True
    # fold the page-checkpoint write into the fetch tasks the same way
    # (each task writes its own batch's rows, deterministic file names
    # so a task retry overwrites instead of duplicating): parquet
    # encode + disk I/O overlap fetching and the round loses a whole
    # second pass over the materialized page blocks.  Applies to the
    # distributed path only (the small-round driver fast path already
    # writes once from the driver); False restores the separate
    # write_parquet execution.
    fuse_page_write: bool = True
    seen_shard_bits: int = 3
    seen_mode: str = "tandem"
    # per-shard capacity for the bloom/cuckoo seen filters; size to
    # (expected URLs) / 2^seen_shard_bits with headroom — cuckoo mode
    # degrades to an overflow stash past ~84% load (state/cuckoo.py)
    seen_capacity: int = 1_000_000
    use_robots: bool = True
    # robots matcher semantics (state/robots.py): "prefix" = the
    # simple-crawler Disallow-prefix behavior (the oracle-checked
    # default of rounds 1-4); "rfc9309" = full REP — * wildcards, $
    # anchor, Allow lines, longest-match precedence with Allow winning
    # ties, user-agent group selection.  The conformance oracle
    # mirrors whichever is configured.
    robots_matcher: str = "prefix"
    robots_user_agent: str = "uniparser-ray"
    host_budgets: Dict[str, int] = field(default_factory=dict)
    # explicit skew-splitting of hot domains: 0 = single-phase grant;
    # >1 = two-phase salted grant — phase 1 pre-clips per (host, salt)
    # so no single task ever sorts more than ~(budget + max_pending)
    # rows of one host, phase 2 merges the per-salt survivors.  The
    # two phases are exactly equivalent to the single-phase grant
    # (any row in a host's global top (k + max_pending) is in its
    # salt's top (k + max_pending)); tests assert equality.
    skew_salts: int = 0
    # frontiers at or below this row count grant in ONE vectorized
    # task (no shuffle) — a pandas sort of 100k rows is milliseconds,
    # while a Ray groupby shuffle has seconds of fixed cost
    small_grant_threshold: int = 100_000
    # wall-clock per-host pacing INSIDE the fetch workers (politeness
    # shard actors hand out per-host schedules); the virtual-clock
    # per-round budget above stays authoritative for WHAT is fetched —
    # this adds real-time WHEN pacing on top (stages/crawl_stages.py
    # FetchParseStage politeness path)
    wallclock_politeness: bool = False
    politeness_shard_count: int = 4
    # transient-failure requeue: pages that fetch with a transport
    # error (status -1) or a 5xx are re-admitted to the NEXT round's
    # frontier (seen_ok=1 bypasses the seen anti-join) up to this many
    # times; retry counts ride the frontier rows, so requeues are
    # checkpointed/resumable like any other frontier row and compete
    # for the per-host politeness budget.  404s / rule-misses are
    # permanent and never retried.  Opt-in (default 0): with retries
    # on, per-round fetch sets legitimately diverge from the BFS
    # oracle's (a 5xx page re-fetches in a LATER round), so the
    # ordering-parity invariant only holds at 0 — see
    # test_crawl_retries_recover_transient_failures for the invariant
    # that holds with retries on (identical FINAL ok-set/values/seen).
    max_fetch_retries: int = 0
    # robots Crawl-delay -> per-host politeness budget: a round models
    # round_seconds of crawl time, so a host with Crawl-delay d is
    # granted at most floor(round_seconds/d) fetches per round (never
    # raising the configured budget).  The delay reaches the granter
    # as a column attached during robots admission — zero extra RPCs.
    # Opt-in to keep the default grant bit-identical to round-2 runs.
    robots_delay_budget: bool = False
    round_seconds: float = 60.0
    # sitemap-seeded frontier: round 0 additionally ingests every seed
    # host's advertised sitemap (robots.txt ``Sitemap:`` discovery,
    # <sitemapindex> chunk files followed) DISTRIBUTED — one task per
    # host batch, rows written task-parallel into the round-0 frontier
    # checkpoint.  Advertised URLs enter at depth 0 with priority
    # (0, 1) mapped from the sitemap's <priority> (crawl/sitemap.py
    # seed_priority): after the explicit seeds (0.0), before any
    # discovered link (>= 1.0).  URLs that are ALSO explicit seeds are
    # dropped at ingest so lineage stays deterministic (otherwise the
    # seen test-and-set would pick an arbitrary one of the two rows).
    # The conformance oracle models the same seeding (sitemap_seeds=
    # True on BFSOracle.run).
    sitemap_seeds: bool = False
    # 3xx handling: redirects are followed INLINE by the fetch stage
    # (requests semantics — one politeness token per granted URL no
    # matter the hops, bounded by max_redirects; loops/exhaustion land
    # as status -2, permanent).  The canonical FINAL URL is
    # test-and-set against the URL-seen shards from inside the fetch
    # workers (the shards are atomic), so a page reachable both via a
    # legacy URL and its canonical URL extracts once and later direct
    # links to the canonical form dedup at admission.  final_url /
    # final_hash / redirects ride the page checkpoint rows (resume
    # replays final_hash into the seen shards).
    max_redirects: int = 5
    # spider-trap guards (0 = off), applied after canonicalization and
    # BEFORE the seen test-and-set (a trapped candidate leaves no
    # seen-set side effect; a later shallow rediscovery still fetches):
    # BFS depth bound, canonical-URL byte bound, and a consecutive
    # path-segment repeat bound (/x/x/x/... calendar traps)
    max_depth: int = 0
    max_url_len: int = 0
    max_path_repeats: int = 0
    # dead-host pruning (0 = off): a host whose CUMULATIVE count of
    # error fetches (transport -1 or 5xx) reaches the budget is banned
    # — its frontier rows are dropped at admission from the NEXT round
    # on (after canonicalization, before the seen test-and-set, so no
    # seen-set side effect).  Error counts fold distributed per round
    # (tiny per-host partials) and are recomputed from the page
    # checkpoints on resume.  At 10^10 scale this is what stops a dead
    # CDN from eating the politeness budget round after round.
    host_error_budget: int = 0
    # honor 5xx Retry-After headers (opt-in): a transient-failure
    # requeue whose response carried Retry-After: S re-enters the
    # frontier with ready_round = round + max(1, ceil(S/round_seconds))
    # and rides the checkpoints UNTOUCHED (no seen/politeness cost)
    # until its round arrives — the polite server-requested backoff.
    # Requires max_fetch_retries > 0 to matter.
    honor_retry_after: bool = False


def _frontier_table(urls: List[str], parents: List[str], depths: List[int],
                    priorities: List[float], seen_ok: List[int],
                    retries: List[int] = None,
                    ready_round: List[int] = None) -> pa.Table:
    return pa.Table.from_arrays([
        pa.array(urls, pa.large_string()),
        pa.array(parents, pa.large_string()),
        pa.array(depths, pa.int32()),
        pa.array(priorities, pa.float32()),
        pa.array(retries or [0] * len(urls), pa.int32()),
        pa.array(seen_ok, pa.int8()),
        pa.array(ready_round or [0] * len(urls), pa.int32()),
    ], schema=FRONTIER_SCHEMA)


def _normalize_frontier(t: pa.Table) -> pa.Table:
    """Checkpoint-format migration: frontier files written before the
    retry lane (no ``retries``) or the Retry-After deferral lane (no
    ``ready_round``) read as zeros — a resume of an old-out-dir crawl
    proceeds instead of KeyErroring on the new columns."""
    if "retries" not in t.column_names:
        t = t.append_column(
            "retries", pa.array(np.zeros(t.num_rows, np.int32),
                                pa.int32()))
    if "ready_round" not in t.column_names:
        t = t.append_column(
            "ready_round", pa.array(np.zeros(t.num_rows, np.int32),
                                    pa.int32()))
    # appended columns land at the END — restore the canonical field
    # order so downstream cast(FRONTIER_SCHEMA) (order-sensitive)
    # accepts migrated tables
    return t.select([f.name for f in FRONTIER_SCHEMA])


def _make_granter(budgets: Dict[str, int], default_budget: int,
                  max_pending: int, round_seconds: float = 0.0):
    def grant(bucket: pd.DataFrame) -> pd.DataFrame:
        # deterministic politeness, fully vectorized over a bucket of
        # hosts: stable per-host order by (priority, url_hash), first k
        # rows of each host granted, backlog clipped at k+max_pending
        # so one hot host cannot grow the frontier unboundedly
        bucket = bucket.sort_values(["priority", "url_hash"],
                                    kind="mergesort")
        pos = bucket.groupby("host", sort=False).cumcount()
        if budgets:
            k = bucket["host"].map(budgets).fillna(default_budget).to_numpy()
        else:
            k = np.full(len(bucket), default_budget)
        if round_seconds > 0 and "crawl_delay" in bucket.columns:
            # robots Crawl-delay -> per-host budget: a round models
            # round_seconds of crawl time, so a host asking for d sec
            # between fetches gets at most floor(round_seconds/d)
            # grants (>= 1 so delayed hosts still progress); only ever
            # TIGHTENS the configured budget
            d = bucket["crawl_delay"].to_numpy(np.float64)
            with np.errstate(divide="ignore"):
                cap = np.where(d > 0,
                               np.maximum(1, np.floor(round_seconds / np.where(
                                   d > 0, d, 1.0))), np.inf)
            k = np.minimum(k, cap)
        bucket = bucket.assign(granted=(pos.to_numpy() < k).astype(np.int8))
        return bucket[pos.to_numpy() < k + max_pending]
    return grant


def _make_preclipper(budgets: Dict[str, int], default_budget: int,
                     max_pending: int, num_salts: int):
    """Phase 1 of the skew-split grant: per (host, salt) keep only the
    top (budget + max_pending) rows by (priority, url_hash).  Exact:
    every row of a host's global top (budget + max_pending) survives
    its salt's clip, so phase 2 over the survivors equals the
    single-phase grant."""
    def preclip(bucket: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket.sort_values(["priority", "url_hash"],
                                    kind="mergesort")
        pos = bucket.groupby(["host", "_salt"], sort=False).cumcount()
        if budgets:
            k = bucket["host"].map(budgets).fillna(default_budget).to_numpy()
        else:
            k = np.full(len(bucket), default_budget)
        return bucket[pos.to_numpy() < k + max_pending]
    return preclip


def _explode_links(batch: pa.Table) -> pa.Table:
    """One page row -> N frontier rows, all-Arrow: ``list_flatten`` +
    ``list_parent_indices`` + ``take`` (no per-row Python)."""
    import pyarrow.compute as pc
    links = batch["links"]
    flat = pc.list_flatten(links).cast(pa.large_string())
    idx = pc.list_parent_indices(links)
    parents = pc.take(batch["url"], idx).cast(pa.large_string())
    depths = pc.add(pc.take(batch["depth"], idx),
                    pa.scalar(1, pa.int32())).cast(pa.int32())
    return pa.Table.from_arrays([
        flat, parents, depths, depths.cast(pa.float32()),
        pa.array(np.zeros(len(flat), dtype=np.int32), pa.int32()),
        pa.array(np.zeros(len(flat), dtype=np.int8), pa.int8()),
        pa.array(np.zeros(len(flat), dtype=np.int32), pa.int32()),
    ], schema=FRONTIER_SCHEMA)


# _explode_images moved to stages.crawl_stages (shared with the fused
# in-fetch image path); re-exported here for compatibility.
from ..stages.crawl_stages import explode_images as _explode_images  # noqa: E402
class CrawlRun:
    """Driver for one crawl (resumable)."""

    def __init__(self, cfg: CrawlConfig):
        import ray  # noqa: F401  (driver owns the session)
        self.cfg = cfg
        self.out = Path(cfg.out_dir)
        self.frontier_dir = self.out / "frontier"
        self.pages_dir = self.out / "pages"
        self.images = LanceLayoutTable(str(self.out / "images_lance"))
        self.metrics: List[dict] = []
        self.seen = SeenFilter(cfg.seen_shard_bits, cfg.seen_mode,
                               capacity_per_shard=cfg.seen_capacity)
        self.img_seen = SeenFilter(max(cfg.seen_shard_bits - 1, 1),
                                   cfg.seen_mode,
                                   capacity_per_shard=cfg.seen_capacity)
        if cfg.use_robots:
            from ..state.robots import RobotsShardActor
            from ..sources.synthweb import SynthWeb
            web_config = dict(cfg.web_config)
            self.robots_shards = [
                RobotsShardActor.remote(
                    web_factory=lambda wc=web_config: SynthWeb(**wc),
                    matcher=cfg.robots_matcher,
                    user_agent=cfg.robots_user_agent)
                for _ in range(4)]
        else:
            self.robots_shards = []
        if cfg.wallclock_politeness:
            from ..state.politeness import PolitenessShardActor
            self.politeness_shards = [PolitenessShardActor.remote()
                                      for _ in range(cfg.politeness_shard_count)]
        else:
            self.politeness_shards = []
        self.rule_pack_ref = None

    def shutdown(self):
        """Kill this run's state actors (seen / robots shards) so
        back-to-back runs in one Ray session don't accumulate actor
        processes contending for CPU slots."""
        import ray
        for actor in (list(self.seen.shards) + list(self.img_seen.shards)
                      + list(self.robots_shards)
                      + list(self.politeness_shards)):
            try:
                ray.kill(actor)
            except Exception:
                pass
        self.seen.shards = []
        self.img_seen.shards = []
        self.robots_shards = []
        self.politeness_shards = []

    # -- state / resume ----------------------------------------------------
    def _state_path(self) -> Path:
        return self.out / "_state.json"

    def _load_state(self) -> Optional[dict]:
        if self._state_path().exists():
            return json.loads(self._state_path().read_text())
        return None

    def _save_state(self, round_idx: int):
        tmp = self.out / "_state.json.tmp"
        tmp.write_text(json.dumps({
            "next_round": round_idx,
            "metrics": self.metrics,
        }))
        tmp.replace(self._state_path())

    def _rollback_uncommitted(self, start_round: int):
        """Crash-window rollback.  A round commits only at
        ``_save_state(round+1)``, so on resume ANY on-disk artifact
        tagged ``round >= start_round`` is an orphan of a crashed
        attempt: partial page checkpoints (Ray's write_parquet file
        names are unique per attempt — a re-run would MERGE duplicate
        rows, not overwrite), image fragments (possibly already
        registered: ``images.commit`` runs mid-round, before the state
        commit), and the attempt's next-frontier dir.  Purge them
        BEFORE ``_reseed_filters`` runs, else the reseed would poison
        ``img_seen`` with rolled-back fetches and the re-run would
        silently drop those images.  The frontier dir for
        ``round=start_round`` itself is committed state (written by
        round ``start_round-1``) and is kept."""
        import shutil as _shutil

        def purge(base: Path, min_round: int):
            for d in base.glob("round=*"):
                if int(d.name.split("=")[1]) >= min_round:
                    _shutil.rmtree(d, ignore_errors=True)

        purge(self.pages_dir, start_round)
        purge(self.frontier_dir, start_round + 1)
        if self.images.exists():
            def keep(name: str) -> bool:
                head = name.split("/", 1)[0]
                if head.startswith("round="):
                    return int(head.split("=")[1]) < start_round
                return True
            self.images.rollback_fragments(
                keep, metadata={"rollback_before_round": start_round})
        purge(self.images.data_dir, start_round)

    def _reseed_host_errors(self, upto_round: int):
        """Rebuild the dead-host error counters from the committed
        page checkpoints (resume): one projection-pruned distributed
        fold to per-host error counts — only the tiny (host, n) rows
        reach the driver."""
        import ray.data as rd
        files = [str(f) for r in range(upto_round)
                 for f in sorted(
                     (self.pages_dir / f"round={r}").glob("*.parquet"))]
        if not files:
            return

        def fold(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            st = t["status"]
            bad = pc.or_(pc.equal(st, pa.scalar(-1, pa.int32())),
                         pc.greater_equal(st, pa.scalar(500, pa.int32())))
            sub = t.filter(bad)
            if sub.num_rows == 0:
                return pa.table({"host": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            agg = sub.group_by("host").aggregate([("host", "count")])
            return pa.table({"host": agg["host"],
                             "n": agg["host_count"].cast(pa.int64())})

        parts = rd.read_parquet(files, columns=["host", "status"]) \
            .map_batches(fold, batch_format="pyarrow").to_pandas()
        if "host" not in parts.columns:
            return
        for host, n in zip(parts["host"], parts["n"]):
            self._host_errors[host] = self._host_errors.get(host, 0) + int(n)
        self._refresh_bans()

    def _refresh_bans(self):
        budget = self.cfg.host_error_budget
        self._banned_hosts = frozenset(
            h for h, n in self._host_errors.items() if n >= budget)

    def _absorb_round_errors(self, err_df):
        """Fold one round's per-host error partials into the counters
        (bans apply from the NEXT round's admission)."""
        if "host" not in err_df.columns:   # all-empty partials lose
            return                          # their columns in to_pandas
        for host, n in zip(err_df["host"], err_df["n"]):
            self._host_errors[host] = self._host_errors.get(host, 0) + int(n)
        self._refresh_bans()

    def _reseed_filters(self, upto_round: int):
        """Rebuild seen state from committed checkpoints (resume).

        ALL replayed state streams task-parallel: parquet fragments are
        read in tasks and their hashes pushed to the shard actors in
        batches via the vectorized argsort grouping
        (``_sharded_add_futures``) — the driver never materializes a
        column.  At 10^10-URL scale a resume replays billions of page
        hashes and image URLs; any ``to_table()`` here would be a
        driver OOM."""
        import ray.data as rd
        from ..stages.crawl_stages import _sharded_add_futures

        def replay(files, columns, make_hashes, seen):
            shards, bits = seen.shards, seen.shard_bits

            def push(t: pa.Table) -> pa.Table:
                import ray as _ray
                hashes = make_hashes(t)
                _slices, futs = _sharded_add_futures(shards, bits, hashes)
                if futs:
                    _ray.get(futs)
                return pa.table({"n": pa.array([t.num_rows], pa.int64())})

            rd.read_parquet(files, columns=columns) \
                .map_batches(push, batch_format="pyarrow",
                             batch_size=16384).count()

        page_dirs = [str(f) for r in range(upto_round)
                     for f in sorted(
                         (self.pages_dir / f"round={r}").glob("*.parquet"))
                     if (self.pages_dir / f"round={r}").exists()]
        if page_dirs:
            # checkpoint-format guard: pages written before the
            # redirect lane have no final_hash column — replay just
            # the URL hashes for those (missing finals read as "none").
            # Sniffed per FILE (metadata-only read) so a checkpoint
            # upgraded mid-crawl — old rounds without the column, new
            # rounds with it — splits into two replay passes instead
            # of erroring or dropping the new rounds' finals.
            with_final = [f for f in page_dirs
                          if "final_hash" in pq.read_schema(f).names]
            without_final = [f for f in page_dirs if f not in
                             set(with_final)]

            def page_hashes(t: pa.Table) -> np.ndarray:
                uh = t["url_hash"].to_numpy(zero_copy_only=False) \
                    .astype(np.uint64)
                if "final_hash" not in t.column_names:
                    return uh
                # redirect finals were test-and-set during the fetch —
                # replay the nonzero ones alongside the requested URLs
                fh = t["final_hash"].to_numpy(zero_copy_only=False) \
                    .astype(np.uint64)
                return np.concatenate([uh, fh[fh != 0]])
            if with_final:
                replay(with_final, ["url_hash", "final_hash"],
                       page_hashes, self.seen)
            if without_final:
                replay(without_final, ["url_hash"], page_hashes,
                       self.seen)
        if self.images.exists():
            frag_files = self.images.fragment_files()
            if frag_files:
                def img_hashes(t: pa.Table) -> np.ndarray:
                    col = t.column("src_url").to_pylist()
                    return np.fromiter(
                        (url_hash64("img|" + u) for u in col),
                        dtype=np.uint64, count=len(col))
                replay(frag_files, ["src_url"], img_hashes, self.img_seen)
        # frontier seen_ok rows were already admitted
        d = self.frontier_dir / f"round={upto_round}"
        if d.exists():
            def frontier_hashes(t: pa.Table) -> np.ndarray:
                ok = t.column("seen_ok").to_numpy(zero_copy_only=False) \
                    .astype(bool)
                urls = [u for u, m
                        in zip(t.column("url").to_pylist(), ok) if m]
                return np.fromiter((url_hash64(u) for u in urls),
                                   dtype=np.uint64, count=len(urls))
            replay([str(f) for f in sorted(d.glob("*.parquet"))],
                   ["url", "seen_ok"], frontier_hashes, self.seen)

    # -- rounds ------------------------------------------------------------
    def _write_frontier(self, table: pa.Table, round_idx: int):
        d = self.frontier_dir / f"round={round_idx}"
        d.mkdir(parents=True, exist_ok=True)
        pq.write_table(table, d / "part-driver.parquet")

    def _seed_round0(self):
        seeds = self.cfg.seeds
        self._write_frontier(_frontier_table(
            seeds, [""] * len(seeds), [0] * len(seeds),
            [0.0] * len(seeds), [0] * len(seeds)), 0)
        if self.cfg.sitemap_seeds:
            self._seed_sitemaps(seeds)

    def _seed_sitemaps(self, seeds: List[str]):
        """Distributed sitemap ingest of the seed hosts -> extra
        round-0 frontier rows, written task-parallel alongside the
        driver's seed file (the round read globs the directory)."""
        import ray
        import ray.data as rd

        from ..rulevm.request import get_host
        from ..rulevm.urlutil import canonicalize_url
        from .sitemap import make_ingest_stage, seed_priority

        hosts = sorted({get_host(canonicalize_url(u), "")
                        for u in seeds} - {""})
        if not hosts:
            return
        seed_canon_ref = ray.put(
            frozenset(canonicalize_url(u) for u in seeds))
        web_cfg = dict(self.cfg.web_config)
        ingest = make_ingest_stage(web_cfg)

        def to_frontier(t: pa.Table) -> pa.Table:
            seed_canon = ray.get(seed_canon_ref)
            urls, parents, prios = [], [], []
            for row in ingest(t).to_pylist():
                if canonicalize_url(row["url"]) in seed_canon:
                    continue
                urls.append(row["url"])
                parents.append(row["sitemap_url"])
                prios.append(seed_priority(row["priority_bp"]))
            n = len(urls)
            return _frontier_table(urls, parents, [0] * n, prios, [0] * n)

        (rd.from_items([{"host": h} for h in hosts],
                       override_num_blocks=min(len(hosts), 16))
           .map_batches(to_frontier, batch_format="pyarrow", batch_size=4)
           .write_parquet(str(self.frontier_dir / "round=0")))

    def run(self, rule_pack: dict, resume: bool = True) -> dict:
        import ray
        import ray.data as rd
        self.out.mkdir(parents=True, exist_ok=True)
        self.rule_pack_ref = ray.put(rule_pack)
        start_round = 0
        state = self._load_state() if resume else None
        self._host_errors: Dict[str, int] = {}
        self._banned_hosts: frozenset = frozenset()
        if state:
            start_round = state["next_round"]
            self.metrics = state["metrics"]
            self._rollback_uncommitted(start_round)
            self._reseed_filters(start_round)
            if self.cfg.host_error_budget > 0:
                self._reseed_host_errors(start_round)
        else:
            self._seed_round0()

        # actor-readiness pings: the run's ~dozens of state-shard
        # actors each ramp a fresh worker process (~3.5s total at 8
        # cpus); a long-lived crawl pays that once, so start the ramp
        # NOW (fire the pings) but only BLOCK on it right before the
        # first distributed round — per-round metrics then measure
        # steady-state frontier cost, while short all-driver-path
        # crawls (tests, tiny resumes) never stall on actors their
        # rounds barely touch
        ready_futures = ([s.stats.remote() for s in
                          (list(self.seen.shards)
                           + list(self.img_seen.shards)
                           + list(self.robots_shards))]
                         + [s.budget.remote("__warmup__")
                            for s in self.politeness_shards])

        from ..stages.crawl_stages import make_trap_filter
        trap_filter = (make_trap_filter(self.cfg.max_depth,
                                        self.cfg.max_url_len,
                                        self.cfg.max_path_repeats)
                       if (self.cfg.max_depth or self.cfg.max_url_len
                           or self.cfg.max_path_repeats) else None)
        seen_stage = SeenRobotsStage(
            self.seen.shards, self.cfg.seen_shard_bits,
            self.robots_shards, len(self.robots_shards))
        granter = _make_granter(self.cfg.host_budgets,
                                self.cfg.per_host_budget,
                                self.cfg.max_pending_per_host,
                                round_seconds=(self.cfg.round_seconds
                                               if self.cfg.robots_delay_budget
                                               else 0.0))

        for r in range(start_round, self.cfg.max_rounds):
            fdir = self.frontier_dir / f"round={r}"
            if not fdir.exists() or not list(fdir.glob("*.parquet")):
                break
            # a checkpoint file is one block; split it so every stage
            # of the round fans out across the pool (a single-block
            # frontier serializes the whole round through one task)
            n_candidates = sum(pq.read_metadata(f).num_rows
                               for f in fdir.glob("*.parquet"))
            small_round = (n_candidates
                           <= self.cfg.small_grant_threshold)
            if not small_round and ready_futures:
                # first distributed round: block on the actor ramp
                # OUTSIDE the round clock (a long crawl pays it once)
                ray.get(ready_futures)
                ready_futures = []

            # dead-host ban filter: a per-round closure over the
            # (frozen) banned set — applied after canonicalization,
            # before the seen test-and-set, like the trap guards
            banned = self._banned_hosts
            if banned:
                def ban_filter(t: pa.Table, _b=banned) -> pa.Table:
                    keep = ~np.isin(
                        np.asarray(t["host"].to_pylist(), dtype=object),
                        list(_b))
                    return t.filter(pa.array(keep))
            else:
                ban_filter = None

            t0 = time.perf_counter()
            phase_t: Dict[str, float] = {}

            def _mark(name, _last=[t0]):
                now = time.perf_counter()
                phase_t[name] = round(now - _last[0], 3)
                _last[0] = now

            # -- admit + politeness grant (the round's one shuffle) ----
            from ..stages.combine import hash_bucket_combine
            if small_round:
                # adaptive fast path: below the threshold the whole
                # admit+grant runs ON THE DRIVER with the exact same
                # functions (canonicalize_batch / seen_stage / granter
                # — the seen/robots actors are reached by direct RPC),
                # skipping several per-round Ray Data executions whose
                # fixed startup dominates kilobyte frontiers; semantics
                # identical because every function is partitioning-
                # independent.  Above the threshold the distributed
                # path below is authoritative.
                tbls = [pq.read_table(f)
                        for f in sorted(fdir.glob("*.parquet"))]
                t = (pa.concat_tables(tbls, promote_options="default")
                     if len(tbls) > 1 else tbls[0])
                t = _normalize_frontier(t)
                if self.cfg.honor_retry_after:
                    # deferral lane: rows whose ready_round hasn't
                    # arrived skip the whole round (no seen/politeness
                    # side effects) and ride into the next checkpoint
                    import pyarrow.compute as _pc
                    ready_mask = _pc.less_equal(
                        t["ready_round"], pa.scalar(r, pa.int32()))
                    deferred_tbl = t.filter(_pc.invert(ready_mask))
                    n_deferred = deferred_tbl.num_rows
                    t = t.filter(ready_mask)
                else:
                    deferred_tbl, n_deferred = None, 0
                t = canonicalize_batch(t)
                if trap_filter is not None:
                    t = trap_filter(t)
                if ban_filter is not None:
                    t = ban_filter(t)
                t = seen_stage(t)
                dt = pa.Table.from_pandas(
                    granter(t.to_pandas()), preserve_index=False) \
                    .replace_schema_metadata(None)
                decided = None   # dt IS the decided table (driver)
            else:
                n_blocks = max(1, min(4 * self.cfg.fetch_concurrency,
                                      (n_candidates + 63) // 64))
                # fan out at the READ (block splitting is free) instead
                # of a separate repartition all-to-all — measured 15%
                # off the warm grant phase at 255k candidates
                frontier = rd.read_parquet(str(fdir),
                                           override_num_blocks=n_blocks)
                first = next(iter(sorted(fdir.glob("*.parquet"))), None)
                if first is not None and "ready_round" not in \
                        pq.read_schema(first).names:
                    # pre-deferral-lane checkpoint: migrate on the fly
                    # (missing ready_round/retries read as zeros)
                    frontier = frontier.map_batches(
                        _normalize_frontier, batch_format="pyarrow")
                if self.cfg.honor_retry_after:
                    deferred_ds = frontier.filter(
                        expr=f"ready_round > {r}").materialize()
                    n_deferred = deferred_ds.count()
                    deferred_tbl = deferred_ds if n_deferred else None
                    frontier = frontier.filter(expr=f"ready_round <= {r}")
                else:
                    deferred_tbl, n_deferred = None, 0
                admitted = frontier.map_batches(canonicalize_batch,
                                                batch_format="pyarrow")
                if trap_filter is not None:
                    admitted = admitted.map_batches(
                        trap_filter, batch_format="pyarrow")
                if ban_filter is not None:
                    admitted = admitted.map_batches(
                        ban_filter, batch_format="pyarrow")
                admitted = admitted.map_batches(
                    seen_stage, batch_format="pyarrow", batch_size=4096)
            # shuffle #1: the grant needs all of a host's pending rows
            # co-located — hosts hash into a bounded number of buckets
            # and the per-host top-k grant is vectorized per bucket.
            # With skew_salts > 1, a salted pre-clip phase bounds the
            # per-task volume of hot hosts before the per-host merge.
            if small_round:
                pass   # decided built on the driver above
            elif self.cfg.skew_salts > 1:
                salts = self.cfg.skew_salts

                def add_salt(t: pa.Table) -> pa.Table:
                    s = (t["url_hash"].to_numpy(zero_copy_only=False)
                         % np.uint64(salts)).astype(np.int32)
                    return t.append_column("_salt", pa.array(s, pa.int32()))

                # materialize the admitted frontier (tiny URL rows,
                # object-store resident and spillable) before the grant
                # shuffles: letting the streaming executor overlap the
                # admit map chain with the sort all-to-all DOUBLES the
                # grant phase (measured 7.0s -> 3.3s warm at 255k
                # candidates, 8 cpus — the sort's map side contends
                # with the RPC-blocking seen stage for workers)
                preclip_fn = _make_preclipper(
                    self.cfg.host_budgets, self.cfg.per_host_budget,
                    self.cfg.max_pending_per_host, salts)
                # block-local combiner BEFORE the shuffle: the same
                # per-(host,_salt) top-(budget+pending) clip applied to
                # each block is exact (every row of a group's global
                # top survives its block's clip) and frontier
                # checkpoints are host-clustered, so the clip removes
                # most of a hot host's rows before they ever move —
                # the shuffle then carries only plausible grantees
                salted = admitted.map_batches(
                    add_salt, batch_format="pyarrow").map_batches(
                    preclip_fn, batch_format="pandas").materialize()
                preclipped = hash_bucket_combine(
                    salted,
                    ["host", "_salt"],
                    preclip_fn,
                    num_buckets=64)
                decided = hash_bucket_combine(
                    preclipped, ["host"],
                    lambda b: granter(b.drop(columns=["_salt"])),
                    num_buckets=64)
            else:
                decided = hash_bucket_combine(
                    admitted.materialize(), ["host"], granter,
                    num_buckets=64)
            if not small_round:
                # materialize as the round's pipeline cache: count /
                # filter / repartition below all read these blocks.
                # (The former _strip_meta pass is gone — the Arrow-
                # native bucket combine emits metadata-free Arrow
                # blocks already, so there is no pandas schema blob to
                # strip.)
                decided = decided.materialize()
            _mark('grant')
            cpus = int(ray.cluster_resources().get("CPU", 8))
            if small_round:
                # driver fast path (cont.): dt is in memory, so the
                # decided/granted counts are free and the fetch input
                # is PRE-SPLIT into row-balanced blocks (from_arrow of
                # N slices makes N blocks) — the filter/count
                # executions and the repartition all-to-all the
                # distributed path needs below would each cost a whole
                # Ray execution on kilobyte rounds
                import pyarrow.compute as _pc
                n_decided = dt.num_rows
                gt = dt.filter(_pc.equal(dt["granted"], 1))
                n_granted = gt.num_rows
                _mark('counts')
                if n_granted == 0 and not n_deferred:
                    break
                fetch_blocks = max(1, min(
                    -(-n_granted // self.cfg.fetch_batch_size),
                    8 * cpus))
                cuts = np.linspace(0, n_granted,
                                   fetch_blocks + 1).astype(int)
                granted = rd.from_arrow([
                    gt.slice(a, b - a)
                    for a, b in zip(cuts, cuts[1:]) if b > a])
            else:
                n_decided = decided.count()
                granted = decided.filter(expr="granted == 1")
                n_granted = granted.count()
                _mark('counts')
                if n_granted == 0 and not n_deferred:
                    break
                # the grant co-locates each host's rows in one block,
                # so a hot host would otherwise ride into the fetch
                # stage as one giant serial task; rows here are tiny
                # URL metadata, so a row-balanced rebalance is cheap
                # and makes fetch tasks uniform regardless of host
                # skew.  8 tasks per cpu: at 4x a giant round ran as
                # ~4 waves of ~15s tasks and the end-of-stage
                # straggler tail idled a measurable slice of the
                # machine; finer tasks halve the tail at negligible
                # dispatch cost (A/B'd at 32 cpus)
                fetch_blocks = max(1, min(
                    -(-n_granted // self.cfg.fetch_batch_size),
                    8 * cpus))
                granted = granted.repartition(fetch_blocks)


            def _flush_deferred(ndir_path):
                """Write the deferral lane's rows into the next
                frontier checkpoint (they ride untouched)."""
                if not n_deferred:
                    return 0
                ndir_path.mkdir(parents=True, exist_ok=True)
                if isinstance(deferred_tbl, pa.Table):
                    pq.write_table(deferred_tbl.cast(FRONTIER_SCHEMA),
                                   ndir_path / "part-deferred.parquet")
                else:
                    deferred_tbl.write_parquet(str(ndir_path))
                return n_deferred

            if n_granted == 0:
                # deferral-only round: nothing admissible yet — carry
                # the deferred rows forward and advance the clock
                ndir = self.frontier_dir / f"round={r + 1}"
                if ndir.exists():
                    import shutil as _shutil
                    _shutil.rmtree(ndir)
                n_next = _flush_deferred(ndir)
                self.metrics.append({
                    "round": r, "candidates": n_candidates,
                    "granted": 0, "backlog": 0, "pages_ok": 0,
                    "retried": 0, "images_written": 0,
                    "deferred": n_deferred, "next_frontier": n_next,
                    "sec": round(time.perf_counter() - t0, 3),
                    "phases": phase_t})
                self._save_state(r + 1)
                continue

            # -- fetch + rule-VM parse (warm-worker task pool; the
            # transport/compiled-pack state is cached per worker, so
            # there is no per-round pool spin-up; per-host fetch rate
            # is already bounded by the politeness grant, not by
            # worker concurrency) --------------------------------------
            from ..stages.taskcache import cached_stage
            fetch_kwargs = dict(rule_pack_ref=self.rule_pack_ref,
                                web_config=self.cfg.web_config,
                                max_redirects=self.cfg.max_redirects,
                                seen_shards=self.seen.shards,
                                seen_shard_bits=self.seen.shard_bits,
                                robots_shards=self.robots_shards)
            if self.politeness_shards:
                fetch_kwargs.update(
                    politeness_shards=self.politeness_shards,
                    politeness_num=len(self.politeness_shards))
            if self.cfg.fuse_image_fetch:
                # fused image side-channel (stages/crawl_stages.py
                # FetchParseStage._fetch_images): each fetch task
                # explodes/dedups/fetches ITS OWN pages' images and
                # writes Lance fragments directly — the round's second
                # Ray execution (and its fixed pipeline-start cost)
                # disappears, and image work overlaps page fetching in
                # the same pool.  `_round` rides the batch so the
                # warm-worker stage cache stays keyed by constants.
                fetch_kwargs.update(
                    image_data_dir=str(self.images.data_dir),
                    image_seen_shards=self.img_seen.shards,
                    image_shard_bits=self.img_seen.shard_bits,
                    image_batch_size=self.cfg.image_batch_size)
            fuse_pages = self.cfg.fuse_page_write and not small_round
            if fuse_pages:
                # fused page-checkpoint write (same geometry as the
                # image fusion): each fetch task writes its own batch's
                # checkpoint rows straight into round=r — parquet
                # encode + disk overlap fetching, and the loop's
                # separate write execution over the materialized page
                # blocks disappears (profiled as the wide-leg
                # pages_write share; see BASELINE round 5)
                fetch_kwargs.update(page_ckpt_dir=str(self.pages_dir))
            if self.cfg.fuse_image_fetch or fuse_pages:
                def tag_round(t: pa.Table, _r=r) -> pa.Table:
                    return t.append_column(
                        "_round", pa.array(
                            np.full(t.num_rows, _r, dtype=np.int32),
                            pa.int32()))

                granted = granted.map_batches(
                    tag_round, batch_format="pyarrow",
                    zero_copy_batch=True)
            pages = granted.map_batches(
                cached_stage(FetchParseStage, **fetch_kwargs),
                batch_format="pyarrow",
                batch_size=self.cfg.fetch_batch_size).materialize()

            _mark('fetch_parse')
            if self.cfg.host_error_budget > 0:
                # per-host error partials for the dead-host counters —
                # distributed fold, only (host, n) rows move
                def err_fold(t: pa.Table) -> pa.Table:
                    import pyarrow.compute as pc
                    st = t["status"]
                    bad = pc.or_(pc.equal(st, pa.scalar(-1, pa.int32())),
                                 pc.greater_equal(
                                     st, pa.scalar(500, pa.int32())))
                    sub = t.filter(bad)
                    if sub.num_rows == 0:
                        return pa.table(
                            {"host": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
                    agg = sub.group_by("host").aggregate(
                        [("host", "count")])
                    return pa.table(
                        {"host": agg["host"],
                         "n": agg["host_count"].cast(pa.int64())})

                self._absorb_round_errors(
                    pages.map_batches(err_fold, batch_format="pyarrow")
                    .to_pandas())
            pdir = self.pages_dir / f"round={r}"
            if small_round:
                # driver fast path (cont.): the materialized page
                # blocks are kilobytes — concat once, reuse the table
                # for the checkpoint write, the next-frontier build
                # and the metrics, skipping one Ray execution each
                pages_tbl = pa.concat_tables(
                    ray.get(pages.to_arrow_refs()),
                    promote_options="default")
                pdir.mkdir(parents=True, exist_ok=True)
                pq.write_table(
                    pages_tbl.drop_columns(["links", "img_srcs",
                                            "img_captions"]),
                    pdir / "part-0.parquet")
            elif fuse_pages:
                # checkpoint rows were written inside the fetch tasks
                # (deterministic per-batch file names); the dir is
                # guaranteed even for an all-empty round so resume
                # replay and the round readers see a committed round
                pages_tbl = None
                pdir.mkdir(parents=True, exist_ok=True)
            else:
                pages_tbl = None
                pages.drop_columns(["links", "img_srcs",
                                    "img_captions"]) \
                    .write_parquet(str(pdir))

            _mark('pages_write')
            # -- image side-channel: explode -> dedup -> fetch -> Lance
            # fragments written task-parallel straight into the table dir
            # (bytes never touch the driver)
            img_dir = self.images.data_dir / f"round={r}"
            if not self.cfg.fuse_image_fetch:
                img_rows = (
                    pages
                    .map_batches(_explode_images, batch_format="pyarrow")
                    .map_batches(
                        cached_stage(ImageFetchStage,
                                     web_config=self.cfg.web_config,
                                     # fused cross-round dedup: the seen
                                     # test-and-set runs inside the fetch
                                     # workers (shards are atomic, so any
                                     # concurrency is safe)
                                     seen_shards=self.img_seen.shards,
                                     shard_bits=self.img_seen.shard_bits),
                        batch_format="pyarrow",
                        batch_size=self.cfg.image_batch_size)
                )
                img_rows.write_parquet(str(img_dir))
            # ONE footer read per fragment (this used to be three:
            # keep-list, empty-unlink, and count each re-read the
            # metadata — at 256-row fetch batches a big round writes
            # thousands of fragments, and the triple scan was most of
            # the driver's fixed per-round 'images' phase)
            frag_names = []
            n_images = 0
            for p in sorted(img_dir.glob("*.parquet")):
                n = pq.read_metadata(p).num_rows
                if n > 0:
                    frag_names.append(f"round={r}/{p.name}")
                    n_images += n
                else:
                    p.unlink()
            self.images.commit(frag_names, metadata={"round": r})
            _mark('images')

            # -- next frontier: links + politeness backlog -------------
            # written task-parallel straight into the round=r+1
            # checkpoint dir — URLs never pass through the driver (at
            # 10^10 scale the frontier checkpoint is the largest
            # artifact of a round)
            ndir = self.frontier_dir / f"round={r + 1}"
            if ndir.exists():  # stale partial write from a crashed run
                import shutil as _shutil
                _shutil.rmtree(ndir)
            ndir.mkdir(parents=True, exist_ok=True)

            def as_backlog(t: pa.Table) -> pa.Table:
                t = t.select(["url", "parent", "depth", "priority",
                              "retries"])
                t = t.append_column(
                    "seen_ok", pa.array([1] * t.num_rows, pa.int8()))
                t = t.append_column(
                    "ready_round",
                    pa.array(np.zeros(t.num_rows, np.int32), pa.int32()))
                # backlog blocks come pandas-converted (plain string
                # url/parent) while link blocks are large_string:
                # cast so EVERY file in a frontier checkpoint has
                # the identical FRONTIER_SCHEMA (read-side schema
                # unification across mixed files is pyarrow-version
                # fragile)
                return t.cast(FRONTIER_SCHEMA)

            # -- transient-failure requeue: -1 / 5xx pages re-enter the
            # next frontier with retries+1 (seen_ok=1: already in the
            # seen set from this round's grant, so they must bypass
            # the anti-join).  404 / rule-miss stay permanent.
            max_r = self.cfg.max_fetch_retries

            def as_retry(t: pa.Table, _r=r) -> pa.Table:
                import pyarrow.compute as pc
                st = t["status"]
                transient = pc.or_(
                    pc.equal(st, pa.scalar(-1, pa.int32())),
                    pc.greater_equal(st, pa.scalar(500, pa.int32())))
                keep = pc.and_(transient, pc.less(
                    t["retries"], pa.scalar(max_r, pa.int32())))
                t = t.filter(keep)
                if self.cfg.honor_retry_after:
                    # server-requested backoff: requeue no earlier than
                    # ceil(Retry-After / round_seconds) rounds out
                    # (minimum 1 = the normal next-round requeue)
                    ra = t["retry_after"].to_numpy(zero_copy_only=False) \
                        .astype(np.float64)
                    defer = np.maximum(
                        1, np.ceil(ra / max(self.cfg.round_seconds, 1e-9))
                        .astype(np.int64))
                    ready = (_r + defer).astype(np.int32)
                else:
                    ready = np.zeros(t.num_rows, np.int32)
                return pa.Table.from_arrays([
                    t["url"], t["parent"], t["depth"], t["priority"],
                    pc.add(t["retries"],
                           pa.scalar(1, pa.int32())).cast(pa.int32()),
                    pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
                    pa.array(ready, pa.int32()),
                ], schema=FRONTIER_SCHEMA)

            n_retry = 0
            if small_round:
                # driver fast path (cont.): explode/backlog/requeue over
                # the in-memory page table, ONE compacted checkpoint
                # file, zero Ray executions
                parts = [_explode_links(pages_tbl)]
                if n_decided - n_granted > 0:
                    import pyarrow.compute as _pc
                    parts.append(as_backlog(
                        dt.filter(_pc.equal(dt["granted"], 0))))
                if max_r > 0:
                    rt = as_retry(pages_tbl)
                    n_retry = rt.num_rows
                    if n_retry:
                        parts.append(rt)
                if n_deferred:
                    parts.append(deferred_tbl)
                nf = pa.concat_tables(
                    [p.cast(FRONTIER_SCHEMA) for p in parts])
                n_next = nf.num_rows
                if n_next:
                    pq.write_table(nf, ndir / "part-0.parquet")
                else:
                    import shutil as _shutil
                    _shutil.rmtree(ndir, ignore_errors=True)
            else:
                links = pages.map_batches(_explode_links,
                                          batch_format="pyarrow")
                if n_granted < 50_000:
                    # small-ish rounds: compact so the next round reads
                    # a few files, not one tiny file per fetch block
                    # (at large rounds the extra exchange would cost
                    # more than many files do, so links stream
                    # straight to the sink)
                    links = links.repartition(max(1, n_granted // 1024))
                links.write_parquet(str(ndir))
                if n_decided - n_granted > 0:
                    decided.filter(expr="granted == 0") \
                        .map_batches(as_backlog, batch_format="pyarrow") \
                        .write_parquet(str(ndir))
                if max_r > 0:
                    retry_rows = pages.map_batches(
                        as_retry, batch_format="pyarrow").materialize()
                    n_retry = retry_rows.count()
                    if n_retry:
                        retry_rows.write_parquet(str(ndir))
                _flush_deferred(ndir)
                n_next = 0
                for f in list(ndir.glob("*.parquet")):
                    rows = pq.read_metadata(f).num_rows
                    if rows == 0:
                        f.unlink()
                    n_next += rows
                if n_next == 0:
                    import shutil as _shutil
                    _shutil.rmtree(ndir, ignore_errors=True)

            _mark('frontier_next')
            self.metrics.append({
                "round": r,
                "candidates": n_candidates,
                "granted": n_granted,
                "backlog": n_decided - n_granted,
                "pages_ok": (
                    int((pages_tbl["status"].to_numpy(
                        zero_copy_only=False) == 200).sum())
                    if pages_tbl is not None
                    else pages.filter(expr="status == 200").count()),
                "retried": n_retry,
                "deferred": n_deferred,
                "images_written": n_images,
                "next_frontier": n_next,
                "sec": round(time.perf_counter() - t0, 3),
                "phases": phase_t,
            })
            self._save_state(r + 1)
            if not n_next:
                break

        totals = {
            "rounds": len(self.metrics),
            "pages_ok": sum(m["pages_ok"] for m in self.metrics),
            "granted": sum(m["granted"] for m in self.metrics),
            "images": self.images.count_rows(),
            "seen": self.seen.stats(),
            "per_round": self.metrics,
        }
        (self.out / "metrics.json").write_text(json.dumps(totals, indent=1))
        return totals


def run_crawl(cfg: CrawlConfig, rule_pack: dict, resume: bool = True) -> dict:
    run = CrawlRun(cfg)
    try:
        return run.run(rule_pack, resume=resume)
    finally:
        run.shutdown()
