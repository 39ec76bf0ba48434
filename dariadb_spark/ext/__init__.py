"""[EXT] driver-mandated extensions beyond the reference surface:
relational star-schema operators, dedup, similarity search, text
analysis, multimodal columns (BASELINE.json north_star; SURVEY.md §2.10).
"""
