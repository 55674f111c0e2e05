"""Headline pipelines: relational queries over the TPC-H-ish tables,
document/text pipelines, vector pipelines, image pipelines — each with
a DuckDB-oracle twin registered in __ray_entry__."""
