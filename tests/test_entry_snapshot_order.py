"""Driver-contract insertion order (round-4 verdict task 2): the
grading driver's CORRECTNESS snapshot records only the FIRST 50
queries() entries, so those 50 must span the operator families instead
of being the 50 oldest generic-SQL queries.  No Spark session needed —
this pins pure dict mechanics."""

import __spark_entry__ as e


def test_first_50_spans_families_and_suite_is_complete():
    q = e.queries()
    names = list(q)
    first = names[:50]
    assert first == e._SNAPSHOT_FIRST_50
    assert len(set(names)) == len(names)          # no dup keys lost
    full = e._queries_all()
    assert set(names) == set(full)                # reorder only
    # every oracled query present; every numbered query oracled
    o = e.oracle_sql()
    assert all(k in q for k in o)
    assert all(k in o for k in q if not k.startswith("kg_"))
    # the snapshot includes >= 10 distinct families by construction —
    # pin a representative from each so a future re-shuffle can't
    # silently regress the external signal's coverage
    for probe in ["q16_jaccard_pairs",            # dedup
                  "q21_ann_lsh",                  # ANN
                  "q73_bpe_merges",               # BPE
                  "q154_modularity",              # graph
                  "q141_domain_range",            # ontology
                  "q95_quality_hist_gate",        # sampling
                  "q166_robust_outliers",         # monitoring
                  "q71_cm_heavy_hitters",         # sketches
                  "q145_warc_roundtrip",          # crawl/web
                  "q167_phrase_search",           # retrieval
                  "q47_pii_redact",               # text quality
                  "q24_image_features",           # multimodal
                  "kg_link_levels"]:              # real-KG rows-only
        assert probe in first, probe
    assert sum(1 for k in first if k.startswith("kg_")) in (2, 3)
