"""Codecs: norm encoding (SmallFloat), postings block compression
(delta-gap + FOR / PFor), per-block impact metadata."""
