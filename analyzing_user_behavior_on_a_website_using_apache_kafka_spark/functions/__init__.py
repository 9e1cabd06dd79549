"""North-star LLM-data-pipeline operators (SURVEY.md §2.2, BASELINE.json):
dedup (exact / near-dup), similarity search, text analysis, multimodal
column plumbing. These run over the `documents` and `embeddings` fixture
tables and are designed for the 100 TB regime (blocked/bucketed joins,
sketches, no driver-side materialization).
"""
