"""DataFrame-level operators: enrich, route, aggregate, joins, windows,
dedup, similarity, sampling (splits/quota/packing/mixing), layout,
timeseries, graph (PageRank), merge (snapshot upsert)."""
