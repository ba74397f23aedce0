"""Composable DataFrame operators — the engine's core surface.

Each module re-expresses one family from SURVEY.md §2 as idiomatic,
partition-aware Spark:

- conform    — schema contracts, typed-null padding, union alignment (§1.3)
- clean      — map-normalization, null drops, blocklists, regex fixes (§2.2)
- keys       — md5 surrogate keys with null sentinels (§1.2)
- joins      — multi-key/null-safe joins, priority (disjunctive) lookup,
               as-of nearest join, semi/anti helpers (§2.3)
- aggregate  — collect-set bundles, conditional counts, mode, two-level
               re-aggregation, pivot (§2.4)
- windows    — top-k per group, ranked first, window aggregates (§2.5/2.6)
- explode    — entity/parameter explosion with position ids (§2.1 S2)
- derivation — derivation mini-DSL → Column compiler (§2.10 JVM UDF replacement)
- dedup      — exact, minhash-LSH, simhash, n-gram jaccard (north star)
- text       — language id, quality scoring, token counts, fingerprints
- similarity — brute-force + LSH-bucketed cosine top-k over embeddings
- timeseries — tumbling/sliding window aggregation over event tables
"""
