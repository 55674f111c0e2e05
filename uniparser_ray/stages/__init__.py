"""Ray Data stages: rule-VM parse, crawl fetch/decode, text analysis,
dedup, similarity search."""
