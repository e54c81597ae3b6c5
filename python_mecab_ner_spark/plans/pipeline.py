"""End-to-end KG-construction pipeline (SURVEY.md §7.1).

pages -> [annotate: tokenize + mention + span + triple, ONE narrow
stage] -> link spans to canonical entities (broadcast ladder) ->
canonicalize alias clusters (LSH + CC) -> materialize salted graph.

extract_graph() wires the DataFrames lazily; run_pipeline() executes
with per-stage lineage + resume via plans.lineage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.annotate import (annotate_pages, mentions_table,
                                  spans_table, triples_table)
from ..operators.canonicalize import canonical_map
from ..operators.graph import build_edges, build_vertices, materialize_graph
from ..operators.linking import canonical_entities, link_mentions
from ..sources.gazetteer import broadcast_rows, gazetteer_df_from_tsv


def extract_graph(spark, pages_df, gazetteer_df=None, search_category=None,
                  infer=True, canonicalize=True):
    """Returns a dict of lazily-planned DataFrames:
    annotated, mentions, spans, triples, entities, linked, vertices,
    edges (+ canonical when canonicalize=True)."""
    gaz_df = gazetteer_df if gazetteer_df is not None else gazetteer_df_from_tsv(spark)
    bc = broadcast_rows(spark, df=gaz_df)

    annotated = annotate_pages(
        pages_df.select("url", "warc_ts", "text", "lang"),
        bc, search_category=search_category, infer=infer)
    mentions = mentions_table(annotated)
    spans = spans_table(annotated)
    triples = triples_table(annotated)

    entities = canonical_entities(gaz_df)
    # link the resolved NER spans (the final entities of a page);
    # the spans' word column is the mention surface for linking
    linked = link_mentions(
        spans.withColumnRenamed("word", "surface"), entities)

    canonical = canonical_map(entities) if canonicalize else None
    vertices = build_vertices(linked, entities, canonical)
    edges = build_edges(triples, linked, canonical)
    return {
        "annotated": annotated, "mentions": mentions, "spans": spans,
        "triples": triples, "entities": entities, "linked": linked,
        "canonical": canonical, "vertices": vertices, "edges": edges,
    }


def run_pipeline(spark, pages_df, out_dir: str, n_parts: int = 32,
                 canonicalize: bool = True) -> dict:
    """Execute with lineage + resume: the annotate stage (the heavy
    scan) is checkpointed per part_key; downstream relational stages
    re-derive from the persisted annotation (cheap relative to the
    scan) and the graph is written salted."""
    from .lineage import run_stage

    gaz_df = gazetteer_df_from_tsv(spark)
    bc = broadcast_rows(spark, df=gaz_df)

    def annotate_fn(pages_part):
        return annotate_pages(
            pages_part.select("url", "warc_ts", "text", "lang"), bc)

    annotated = run_stage(spark, "annotate", pages_df, annotate_fn,
                          out_dir, key_col="url", n_parts=n_parts)

    entities = canonical_entities(gaz_df)
    spans = spans_table(annotated)
    linked = link_mentions(spans.withColumnRenamed("word", "surface"), entities)
    triples = triples_table(annotated)
    canonical = canonical_map(entities) if canonicalize else None
    vertices = build_vertices(linked, entities, canonical)
    edges = build_edges(triples, linked, canonical)
    info = materialize_graph(edges, vertices, out_dir)
    info["annotated_rows"] = annotated.count()
    return info
