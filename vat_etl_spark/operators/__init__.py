"""Relational + pipeline operators. Each module maps a region of the
reference (SURVEY.md §2 operator inventory) or a north-star extension
(dedup, similarity, text analysis, multimodal) onto idiomatic Spark plans.
"""
