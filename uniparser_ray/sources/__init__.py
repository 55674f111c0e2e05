"""Sources: image codecs, the deterministic image+caption table
generator, and the synthetic web page server."""
