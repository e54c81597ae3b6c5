"""Pipeline orchestration, lineage, resume."""
