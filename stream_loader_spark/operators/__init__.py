"""Relational operators: recovery aggregations, projections, watermark
clamping, idempotence keys, dedup, similarity search, text analysis,
multimodal plumbing. All are DataFrame → DataFrame transforms built from
pyspark.sql.functions so Catalyst can optimize (predicate pushdown,
partial aggregation, broadcast joins)."""
