"""shovel_spark — a brand-new PySpark-native batch pipeline engine with the
capabilities of mathquis/node-shovel (parse → enrich → route → aggregate
message shuttling with delivery guarantees), re-expressed Spark-first.

Reference semantics surveyed in /root/repo/SURVEY.md; this package is NOT a
port — shovel's per-message event-loop graph (reference:
src/core/processor.js:79-84) compiles here to one lazy DataFrame chain that
Catalyst optimizes (scan pruning, broadcast joins, whole-stage codegen).

Layout
------
- session.py            SparkSession builder tuned for the pipeline
- schema.py             canonical StructTypes (pages, ledger, metrics)
- synth.py              deterministic synthetic pages table (native exprs only)
- functions/            column-level functions (parse, codecs, text stats, hashing)
- operators/            dataframe-level operators (enrich, route, aggregate,
                        dedup, similarity, asof)
- io/                   sources + multi-sink writer
- ledger.py             per-partition checkpoint ledger + resumable runner
- pipeline.py           job config → compiled pipeline (the engine's "planner")
- oracle.py             pure-Python oracle of shovel's route/ack taxonomy
- observability.py      mid-run stage-progress recorder (live-metrics analog)
- streaming/            Structured Streaming variant of the pipeline

Training-data / LLM-curation tier (operators/):
- dedup.py              exact, MinHash+LSH (one-shot / standing-index /
                        incremental / streaming, hot-shingle capped), SimHash,
                        n-gram Jaccard, spans, excision, clusters, resolution
- similarity.py         cosine/LSH/IVF ANN (single + batched probes), k-means,
                        SemDeDup semantic dedup
- sketches.py           count-min + heavy hitters, HyperLogLog (+grouped),
                        broadcast Bloom semi-filter
- lm.py                 bigram-LM perplexity filter (train + score)
- quality.py            n-gram commonness, TF-IDF terms
- classify.py           hashed-BoW features + distributed logistic regression
- sampling.py           hash/quota/stratified/temperature/weighted sampling,
                        shard packing, GPT-style block packing
- dsir.py               DSIR hashed-ngram importance resampling
- search.py             inverted-index postings + Okapi BM25 top-k retrieval
- bpe.py                distributed BPE vocabulary learning + segmentation
- phrases.py            word2phrase collocation mining
- functions/unicodefn.py  NFC/NFKC normalization (Arrow UDF) + control strip
"""

__version__ = "0.1.0"

from shovel_spark.session import get_spark  # noqa: E402,F401

__all__ = ["get_spark", "__version__"]
