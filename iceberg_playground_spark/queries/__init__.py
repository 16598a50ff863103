"""Operator query modules (SURVEY.md §2 layers B and C).

Importing a module registers its queries into
``iceberg_playground_spark.registry``.
"""
