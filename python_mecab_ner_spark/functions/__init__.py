"""Reusable Column helpers: portable hashing (Spark/DuckDB twins),
text statistics, similarity primitives."""
