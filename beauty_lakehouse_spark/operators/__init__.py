"""Operator library.

Each module maps a slice of the reference's operator inventory
(SURVEY.md §2) or a north-star extension to idiomatic Spark:

- ``relational``  — scans, projections, filters, joins, aggregations,
                    top-k (ref §2.1–2.6).
- ``documents``   — nested-document collapse/explode (ref A3,
                    notebooks/02_document_db_mongodb.ipynb:222-244).
- ``warehouse``   — the declared-but-empty warehouse layer (ref L3):
                    star joins, rollups, window functions.
- ``graph``       — the declared-but-empty graph layer (ref L4):
                    co-purchase edges, degrees.
- ``events``      — event-time windows (tumbling/sliding/session) and
                    JSON prop extraction over the events table.
- ``dedup``       — exact + MinHash/LSH + n-gram-Jaccard near-dup.
- ``text``        — language-ID, quality scoring, token counting,
                    fingerprinting.
- ``similarity``  — embedding cosine top-k (brute force + LSH-bucketed).
- ``multimodal``  — binary-column plumbing for image/audio payloads.
- ``quality``     — the reference validator as must-be-empty DataFrames
                    (scripts/validate_dataset.py).

All query entry points share the driver signature
``(SparkSession, sf_dir: str) -> DataFrame`` and alias every computed
column to match their DuckDB oracle twin.
"""
