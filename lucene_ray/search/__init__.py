"""Query side: BM25 scoring, query parsing/plans, searcher actors, top-k merge."""
