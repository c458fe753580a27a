"""Deduplication operators for large-scale training-data pipelines
(north star: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine near-dup — BASELINE.json).

Design rule: every hash is md5-derived (bit-identical across engines) so
even the LSH pipelines are DuckDB-oracle-checkable end to end; every
float fold is an explicit sequential left-fold over doubles so Spark and
the oracle agree bit-for-bit.
"""
