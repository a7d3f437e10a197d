"""Ingest-boundary connectors (SURVEY §2.1 S3-S5): landed-record parsing
into the engine's typed tables. Live HTTP scraping stays outside the
engine; these functions own the dict/JSON -> DataFrame boundary.
"""
