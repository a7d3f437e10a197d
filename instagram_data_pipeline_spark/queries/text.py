"""Text-analysis queries over the documents table — SURVEY §2.12.

Populated by M7; importable empty module keeps the registry loader simple.
"""
