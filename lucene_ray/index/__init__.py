"""Index build: segments, manifests, the build pipelines, merges."""
