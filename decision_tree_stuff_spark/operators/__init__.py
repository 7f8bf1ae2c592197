"""Large-scale data-pipeline operators (SURVEY.md §2.5, E-1..E-10).

Each operator is a function ``DataFrame -> DataFrame`` built from
declarative Spark primitives, with the scale rationale documented at
the definition. None of these exist in the reference (it has no joins,
no streaming, no text ops — SURVEY.md §2.3); they are the extension
scope a 100 TB training-data pipeline needs.
"""
