"""Stateful actor shards: URL-seen filters, politeness token buckets,
robots caches."""
