"""Extension-operator queries (dedup, similarity search) — SURVEY §2.12.

Populated by M7; importable empty module keeps the registry loader simple.
"""
