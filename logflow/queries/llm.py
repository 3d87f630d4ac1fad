"""LLM-data-pipeline queries: dedup, similarity search, text analysis.

Populated incrementally over the ``documents`` and ``embeddings`` tables.
"""
