"""Embedding similarity search operators (LLM-pipeline extension).

Filled in after the relational spine: brute-force cosine top-k baseline
plus LSH/IVF bucketed scale paths over `embeddings.parquet`.
"""
