"""Column-level functions: parse, codecs, grok, text statistics, URL
canonicalization, wire codecs, UDAFs."""
