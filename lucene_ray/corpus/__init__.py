"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1)."""
