"""Logical operators: smoothing, stats, spatial, dedup, similarity, multimodal."""
