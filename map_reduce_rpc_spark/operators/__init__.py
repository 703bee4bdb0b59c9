"""Composed operators: mapreduce parity, dedup, similarity, multimodal."""
