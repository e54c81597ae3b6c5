"""Pure-Python deterministic kernel.

One source of truth for the reference semantics (tokenization,
gazetteer matching, span merge, surface restore), imported both by the
Spark pandas UDFs (operators/) and by the single-process oracle
(kernel.pyref) used to score precision/recall.
"""
