"""Dataflow operators: block tokenization/scoring, text assembly, result
aggregation, deduplication, similarity search, multimodal plumbing."""
