"""Column-level functions: parse, codecs, text statistics, hashing."""
