"""LLM-training-data operators: dedup, similarity search, text analysis,
multimodal columns (BASELINE.json north star; not present in the reference).

All hot paths are built-in Catalyst expressions (higher-order array
functions, hash functions) — no Python UDFs except the clearly-marked
multimodal decode stubs, which use Arrow-batched ``mapInPandas``.
"""
