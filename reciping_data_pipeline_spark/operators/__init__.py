"""Dataflow operators beyond the stock DataFrame surface: dedup
families, similarity search, multimodal plumbing. Each operator is a
DataFrame -> DataFrame function so it composes with ordinary plans."""
