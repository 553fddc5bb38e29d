"""DataFrame-level operators: enrich, route, aggregate, dedup, similarity."""
