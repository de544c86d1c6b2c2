"""Declared queries — one module per SURVEY.md §2 family.

Importing a module registers its queries in
:mod:`fineventstream_spark.registry`.
"""
