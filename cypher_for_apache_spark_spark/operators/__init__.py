"""Table-level operators beyond the Cypher surface: the LLM-data-pipeline
operator library (dedup, similarity search, text analysis, multimodal
plumbing) — first-class components designed for 100 TB scale."""
