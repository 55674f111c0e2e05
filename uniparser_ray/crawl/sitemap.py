"""Sitemap discovery + ingest — the standard way a crawler bootstraps
a host's URL inventory (sitemaps.org protocol; the reference engine
has no crawler, so this surface is new capability on the crawl axis).

Three layers, each independently testable:

* ``discover_sitemaps``: the ``Sitemap:`` lines of a robots.txt
  (field is group-independent per spec — honored wherever it appears,
  case-insensitive, multiple lines allowed).
* ``parse_sitemap``: one XML blob -> (url entries, child sitemap URLs).
  Handles both ``<urlset>`` leaves and ``<sitemapindex>`` index files
  (big hosts chunk at 50k URLs; SynthWeb models that layout).
  Priority is kept in integer basis points (spec default 0.5 -> 5000)
  so downstream comparisons never touch float equality.
* ``ingest_hosts_batch``: the ``map_batches`` stage body — a batch of
  host ids -> (host, sitemap_url, url, lastmod, priority_bp) rows.
  Per-host work (robots fetch -> sitemap fetch(es) -> one regex sweep
  per XML blob), so the inner loop is over HOSTS, not URLs; the URL
  extraction itself is a single ``findall`` per document.

Scale shape: hosts are rows of a Dataset (millions of hosts fan out
across the pool); each task touches only its hosts' few XML blobs, so
nothing concentrates on the driver.  The crawl loop reuses the same
stage to seed round 0 (CrawlConfig.sitemap_seeds) and writes the rows
straight into the round-0 frontier checkpoint, task-parallel.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

# one <url>...</url> block per entry; inner tags extracted per block
_URL_BLOCK_RE = re.compile(r"<url\b[^>]*>(.*?)</url>", re.S | re.I)
_SITEMAP_BLOCK_RE = re.compile(r"<sitemap\b[^>]*>(.*?)</sitemap>", re.S | re.I)
_LOC_RE = re.compile(r"<loc\b[^>]*>\s*(.*?)\s*</loc>", re.S | re.I)
_LASTMOD_RE = re.compile(r"<lastmod\b[^>]*>\s*(.*?)\s*</lastmod>", re.S | re.I)
_PRIORITY_RE = re.compile(r"<priority\b[^>]*>\s*(.*?)\s*</priority>",
                          re.S | re.I)

DEFAULT_PRIORITY_BP = 5000   # sitemaps.org: priority defaults to 0.5


def discover_sitemaps(robots_text: str) -> List[str]:
    """Absolute sitemap URLs advertised by a robots.txt."""
    out = []
    for line in robots_text.splitlines():
        line = line.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        field, value = line.split(":", 1)
        if field.strip().lower() == "sitemap":
            value = value.strip()
            if value:
                out.append(value)
    return out


def _priority_bp(text: str) -> int:
    try:
        v = float(text)
    except ValueError:
        return DEFAULT_PRIORITY_BP
    return min(10000, max(0, int(round(v * 10000))))


def parse_sitemap(xml_text: str) \
        -> Tuple[List[Tuple[str, str, int]], List[str]]:
    """One sitemap XML blob -> ([(url, lastmod, priority_bp)],
    [child sitemap URLs]).  A <urlset> yields entries; a <sitemapindex>
    yields children; tolerant of either appearing (or both — some real
    hosts mix) and of missing optional tags."""
    entries: List[Tuple[str, str, int]] = []
    for block in _URL_BLOCK_RE.findall(xml_text):
        loc = _LOC_RE.search(block)
        if not loc:
            continue
        lastmod = _LASTMOD_RE.search(block)
        prio = _PRIORITY_RE.search(block)
        entries.append((loc.group(1),
                        lastmod.group(1) if lastmod else "",
                        _priority_bp(prio.group(1)) if prio
                        else DEFAULT_PRIORITY_BP))
    children = []
    for block in _SITEMAP_BLOCK_RE.findall(xml_text):
        loc = _LOC_RE.search(block)
        if loc:
            children.append(loc.group(1))
    return entries, children


# a hostile sitemap index chain could recurse forever; real indexes
# are one level (chunk files), allow a little slack
MAX_INDEX_DEPTH = 3


def ingest_host(web, host: str) -> List[Dict]:
    """robots.txt discovery -> sitemap fetch(es) -> parsed rows for one
    host.  Hosts without robots, without Sitemap lines, or whose
    sitemap 404s contribute nothing (absence is not an error)."""
    try:
        status, _h, body = web.get(f"http://{host}/robots.txt")
    except Exception:
        return []
    if status != 200:
        return []
    rows: List[Dict] = []
    pending = [(u, 0) for u in discover_sitemaps(
        body.decode("utf-8", "replace"))]
    fetched = set()
    while pending:
        sm_url, depth = pending.pop(0)
        if sm_url in fetched or depth > MAX_INDEX_DEPTH:
            continue
        fetched.add(sm_url)
        try:
            s, _hh, xml = web.get(sm_url)
        except Exception:
            continue
        if s != 200:
            continue
        entries, children = parse_sitemap(xml.decode("utf-8", "replace"))
        for url, lastmod, prio_bp in entries:
            rows.append({"host": host, "sitemap_url": sm_url, "url": url,
                         "lastmod": lastmod, "priority_bp": prio_bp})
        pending.extend((c, depth + 1) for c in children)
    return rows


_SITEMAP_ROWS_SCHEMA = pa.schema([
    ("host", pa.string()),
    ("sitemap_url", pa.string()),
    ("url", pa.string()),
    ("lastmod", pa.string()),
    ("priority_bp", pa.int64()),
])


def rows_table(rows: List[Dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=_SITEMAP_ROWS_SCHEMA)


def make_ingest_stage(web_cfg: dict):
    """map_batches body over batches of {"host": str} rows.  The
    synthetic web is a pure function of its config, so each task builds
    its own instance (cheap: one list comprehension) — no actor state
    needed; a real deployment swaps ``web.get`` for the transport
    adapter and this becomes an actor pool holding the HTTP session."""
    from ..sources.synthweb import SynthWeb

    def ingest(batch: pa.Table) -> pa.Table:
        web = SynthWeb(**web_cfg)
        rows: List[Dict] = []
        for host in batch["host"].to_pylist():
            rows.extend(ingest_host(web, host))
        return rows_table(rows)

    return ingest


def seed_priority(priority_bp: int) -> float:
    """Frontier priority for a sitemap-advertised URL.  The frontier
    sorts ascending (lower = sooner) with explicit seeds at 0.0 and
    depth-d links at float(d) >= 1.0, so sitemap rows land in
    (0, 1): higher advertised priority -> crawled earlier, always
    after the root seed and before any discovered link.  Returned as
    the exact float32 value the frontier column stores, so the loop
    (f32 column) and the oracle (python floats) sort identical keys.
    The max(1, ...) floor keeps even a priority-1.0 row strictly after
    the explicit seeds (ties there fall to the url_hash tiebreak)."""
    return float(np.float32(max(1, 10000 - priority_bp) / 10000.0))
