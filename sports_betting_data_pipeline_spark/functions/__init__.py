"""LLM-data-pipeline function kit (SURVEY.md §2.10, BASELINE.json
north_star): text analysis, deduplication, similarity search, and
multimodal column plumbing — the operators a 100 TB training-data
pipeline needs on top of the reference's ETL surface.
"""
