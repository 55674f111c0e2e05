"""Storage: the Lance-layout columnar table (fragments + versioned
manifest over Parquet containers)."""
