"""Crawl-scheduler query surfaces beyond the loop itself.

The north rule keys the URL-seen set by *canonicalized-URL hash*
(rulevm/urlutil.py — the crawl's AnnotateStage canonicalizes every
frontier row before the seen anti-join).  ``crawl_url_canon`` puts
that canonicalizer under a value-check: deterministic MESSY variants
of every fetched URL (case-shifted scheme/host, default :80 port,
unsorted query with a blank-value param, fragments, empty path) run
through the production ``canonicalize_url`` distributed, and a DuckDB
twin constructs the same variants plus the EXPECTED canonical form
with independent SQL string arithmetic — if the canonicalizer drifts
on any rule (port strip, query sort, blank-value keep, fragment drop,
empty-path slash), the hash compare goes red.

The Ray side deliberately does NOT dedup its input: page-checkpoint
URLs are unique by the crawl's seen-set invariant, while the twin
SELECTs DISTINCT — so this check ALSO pins "no URL fetched twice"
(a duplicate fetch would surface as a row-count mismatch).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .images_q import _ensure_crawl, _sf_tag


def _variants(df: pd.DataFrame) -> pd.DataFrame:
    """Deterministic messy variants, vectorized string arithmetic only
    (the SQL twin mirrors this construction exactly).  variant_id:
      0 identity            3 mixed-case scheme + fragment
      1 upper host + :80    4 empty path (root URLs only)
      2 unsorted query (blank-value param) + fragment
    """
    url = df["url"]
    if not url.str.startswith("http://").all():
        raise ValueError("crawl_url_canon expects http:// page URLs")
    sp = url.str.slice(7).str.split("/", n=1)
    host, path = sp.str[0], "/" + sp.str[1]

    def frame(vid: int, messy: pd.Series, mask=None) -> pd.DataFrame:
        out = pd.DataFrame({"url": url, "variant_id": vid,
                            "messy_url": messy})
        return out if mask is None else out[mask]

    parts = [
        frame(0, url),
        frame(1, "HTTP://" + host.str.upper() + ":80" + path),
        frame(2, url + "?b=2&a=1&c=#frag"),
        frame(3, "hTtP://" + host + path + "#sec"),
        frame(4, "http://" + host, mask=(path == "/")),
    ]
    out = pd.concat(parts, ignore_index=True)
    out["variant_id"] = out["variant_id"].astype("int64")
    return out


class CanonStage:
    """Actor-pool canonicalization — the same per-URL code the crawl's
    AnnotateStage runs on every frontier row."""

    def __init__(self):
        from ..rulevm.urlutil import canonicalize_url
        self._canon = canonicalize_url

    def __call__(self, t: pa.Table) -> pa.Table:
        canon = [self._canon(m) for m in t["messy_url"].to_pylist()]
        return t.append_column("canon_url", pa.array(canon, pa.string()))


def crawl_url_canon(sf_dir: str):
    """Value-check the frontier's URL canonicalizer: messy variants of
    every fetched URL must canonicalize back to the SQL-predicted
    form.  One projection-pruned read of the pages checkpoints, no
    shuffle — variants and canonicalization are row-local."""
    from ..sources.parquet import read_parquet_clean

    tag = _sf_tag(sf_dir)
    out, _totals = _ensure_crawl(tag)
    ds = read_parquet_clean(f"{out}/pages", columns=["url"])
    return (ds.map_batches(_variants, batch_format="pandas")
              .map_batches(CanonStage, concurrency=2,
                           batch_format="pyarrow"))
