"""Composite DataFrame -> DataFrame operators (sampling, balancing,
splits, fan-out, dedup, similarity, text analysis).
"""
