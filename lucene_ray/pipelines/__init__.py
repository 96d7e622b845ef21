"""User-facing pipelines over the testdata tables: index-backed search,
corpus analytics, dedup, similarity search, text analysis."""
