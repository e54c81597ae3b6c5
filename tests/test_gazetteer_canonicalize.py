"""Gazetteer dir-of-txt ingest (reference micro-format), gazetteer
compilation, and canonicalization (LSH alias pairs + connected
components)."""

import pytest
from pyspark.sql import functions as F

from python_mecab_ner_spark.operators.canonicalize import (
    alias_pairs, canonical_map, connected_components)
from python_mecab_ner_spark.operators.linking import canonical_entities
from python_mecab_ner_spark.sources.gazetteer import (compile_gazetteer,
                                                      ingest_ner_dir)


@pytest.fixture()
def ner_dir(tmp_path):
    """Mirrors the reference test fixtures: a headerless file (default
    header injected from the stem, mecab_reader.py:207-208) and a
    two-header file."""
    (tmp_path / "computer.txt").write_text(
        "마우스\n키보드\n모니터\n", encoding="utf-8")
    (tmp_path / "coffee.txt").write_text(
        "#원두\n아메리카노\n라떼\n#디저트\n쿠키\n", encoding="utf-8")
    return str(tmp_path)


def test_ingest_ner_dir_headerless_defaults_to_stem(spark, ner_dir):
    rows = {(r.large, r.small, r.surface)
            for r in ingest_ner_dir(spark, ner_dir).collect()}
    assert ("computer", "computer", "마우스") in rows
    assert ("coffee", "원두", "아메리카노") in rows
    assert ("coffee", "디저트", "쿠키") in rows
    assert len(rows) == 6


def test_compile_gazetteer_matches_kernel_tokenizer(spark, ner_dir):
    from python_mecab_ner_spark.kernel.tokenizer import extracted_text
    out = compile_gazetteer(ingest_ner_dir(spark, ner_dir)).collect()
    assert out
    for r in out:
        assert r.tokenized == extracted_text(r.surface)


def test_connected_components_min_label(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "a_id bigint, b_id bigint")
    vertices = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 5, 6, 9)], "entity_id bigint")
    got = {(r.entity_id, r.canonical_id)
           for r in connected_components(edges, vertices).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (5, 5), (6, 5), (9, 9)}


def test_alias_pairs_and_canonical_map(spark):
    gaz = spark.createDataFrame(
        [("loc", "tour", "경복궁", "경 복 궁"),
         ("loc", "tour", "경복궁역", "경 복 궁 역"),
         ("loc", "tour", "한라산", "한 라 산"),
         ("music", "singer", "경복궁", "경 복 궁")],  # other large: no pair
        "large string, small string, surface string, tokenized string")
    ents = canonical_entities(gaz)
    ids = {r.surface + "|" + r.large: r.entity_id for r in ents.collect()}

    pairs = alias_pairs(ents, jaccard_min=0.6).collect()
    got_pairs = {tuple(sorted((p.a_id, p.b_id))) for p in pairs}
    want = tuple(sorted((ids["경복궁|loc"], ids["경복궁역|loc"])))
    assert want in got_pairs
    # cross-category and dissimilar surfaces never pair
    assert all({p.a_id, p.b_id} != {ids["경복궁|music"], ids["경복궁|loc"]}
               for p in pairs)
    assert all(ids["한라산|loc"] not in (p.a_id, p.b_id) for p in pairs)

    cmap = {r.entity_id: r.canonical_id
            for r in canonical_map(ents, jaccard_min=0.6).collect()}
    assert cmap[ids["경복궁|loc"]] == cmap[ids["경복궁역|loc"]] == \
        min(ids["경복궁|loc"], ids["경복궁역|loc"])


def test_write_ner_dir_roundtrip(spark, tmp_path):
    """S3 sink round-trip: compiled gazetteer -> reference-format txt
    dir -> read twin -> identical rows AND identical canonical matcher
    order (the byte-identity contract survives the sink)."""
    from python_mecab_ner_spark.kernel.matcher import CompiledGazetteer
    from python_mecab_ner_spark.sources.gazetteer import (
        gazetteer_df_from_tsv, ingest_mecab_dir, write_ner_dir)

    df = gazetteer_df_from_tsv(spark)
    out = str(tmp_path / "mecab_dir")
    paths = write_ner_dir(df, out)
    larges = {r.large for r in df.select("large").distinct().collect()}
    import os
    assert {os.path.basename(p) for p in paths} == \
        {f"{lg}.txt" for lg in larges}

    # file shape: '#small' headers, 'surface,tokenized' entries sorted
    # length-desc within each small block
    lines = open(paths[0], encoding="utf-8").read().splitlines()
    assert lines[0].startswith("#")
    block: list = []
    for ln in lines:
        if ln.startswith("#"):
            block = []
            continue
        surface = ln.split(",", 1)[0]
        if block:
            assert len(surface) <= len(block[-1])
        block.append(surface)

    back = ingest_mecab_dir(spark, out)
    orig = {tuple(r) for r in df.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == orig

    rows_a = [tuple(r) for r in df.collect()]
    rows_b = [tuple(r) for r in back.collect()]
    ga = CompiledGazetteer([(r[0], r[1], r[2], r[3]) for r in rows_a])
    gb = CompiledGazetteer([(r[0], r[1], r[2], r[3]) for r in rows_b])
    assert [(e.large, e.small, e.surface, e.pattern)
            for e in ga.entries] == \
        [(e.large, e.small, e.surface, e.pattern) for e in gb.entries]
