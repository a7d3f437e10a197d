"""Operator library: pure DataFrame -> DataFrame functions.

Each function mirrors one operator from SURVEY.md §2 and is directly
testable; pipelines in :mod:`..plans` compose them.
"""
