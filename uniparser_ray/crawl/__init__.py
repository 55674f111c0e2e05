"""Crawl layer: rule storage, the single-process oracle crawler, and
the distributed round-based frontier loop."""
