"""Round-4 operators: AMIE-style rule mining (operators.ontology
.rule_mining), temporal edge lifespan (operators.temporal), and
lead-position term salience (operators.profile.term_salience) —
hand goldens, the degree-cap path the q150 oracle deliberately leaves
off, and randomized python-twin agreement."""

import itertools
import random

from pyspark.sql import functions as F

from python_mecab_ner_spark.operators.ontology import rule_mining
from python_mecab_ner_spark.operators.profile import term_salience
from python_mecab_ner_spark.operators.temporal import edge_lifespan

TRI = "pred string, subj bigint, obj bigint"
PPM = 1_000_000


def _mine_py(rows, min_support=1, cap=None):
    """Reference twin of rule_mining: dict-of-sets, same cap
    semantics (per-(pred,node) in/out degree measured on the DISTINCT
    pair set, cap applied to join sides BEFORE the body join)."""
    pairs = set(rows)
    in_deg, out_deg = {}, {}
    for p, s, o in pairs:
        in_deg[(p, o)] = in_deg.get((p, o), 0) + 1
        out_deg[(p, s)] = out_deg.get((p, s), 0) + 1
    a_side = [t for t in pairs
              if cap is None or in_deg[(t[0], t[2])] <= cap]
    b_side = [t for t in pairs
              if cap is None or out_deg[(t[0], t[1])] <= cap]
    by_subj = {}
    for q, s, o in b_side:
        by_subj.setdefault(s, []).append((q, o))
    body = set()
    for p, x, y in a_side:
        for q, z in by_subj.get(y, []):
            body.add((p, q, x, z))
    n_body = {}
    for p, q, x, z in body:
        n_body[(p, q)] = n_body.get((p, q), 0) + 1
    heads = {}
    for r, x, z in pairs:
        heads.setdefault((x, z), set()).add(r)
    r_subj = {}
    for r, x, _ in pairs:
        r_subj.setdefault(x, set()).add(r)
    supp, pca = {}, {}
    for p, q, x, z in body:
        for r in heads.get((x, z), ()):
            supp[(p, q, r)] = supp.get((p, q, r), 0) + 1
        for r in r_subj.get(x, ()):
            pca[(p, q, r)] = pca.get((p, q, r), 0) + 1
    out = {}
    for key, ns in supp.items():
        if ns < min_support:
            continue
        p, q, r = key
        nb, np_ = n_body[(p, q)], pca[key]
        out[key] = (nb, ns, np_, ns * PPM // nb, ns * PPM // np_)
    return out


def _collect_rules(df):
    return {(r.pred_p, r.pred_q, r.pred_r):
            (r.n_body, r.n_support, r.n_pca, r.conf_ppm,
             r.pca_conf_ppm)
            for r in df.collect()}


def test_rule_mining_golden(spark):
    # p(1,2) q(2,3) r(1,3): one body binding, head holds -> conf 1e6.
    # p(4,5) q(5,6) with no r(4,6) and no r-edge for 4 at all:
    # counts against standard confidence, NOT against PCA.
    rows = [("p", 1, 2), ("q", 2, 3), ("r", 1, 3),
            ("p", 4, 5), ("q", 5, 6)]
    df = rule_mining(spark.createDataFrame(rows, TRI), min_support=1)
    got = _collect_rules(df)
    df.unpersist_input()
    assert got[("p", "q", "r")] == (2, 1, 1, 500_000, 1_000_000)


def test_rule_mining_multiple_witness_paths_collapse(spark):
    # two y-paths witness the same (x, z): AMIE counts head
    # bindings, not paths -> n_body == 1
    rows = [("p", 1, 2), ("p", 1, 5), ("q", 2, 3), ("q", 5, 3),
            ("r", 1, 3)]
    df = rule_mining(spark.createDataFrame(rows, TRI), min_support=1)
    got = _collect_rules(df)
    df.unpersist_input()
    assert got[("p", "q", "r")] == (1, 1, 1, PPM, PPM)


def test_rule_mining_degree_cap(spark):
    # hub y=99: in-degree 3 under p exceeds cap 2 -> every body
    # binding through it vanishes; the skinny path survives
    rows = ([("p", x, 99) for x in (1, 2, 3)]
            + [("q", 99, 7), ("r", 1, 7), ("r", 2, 7), ("r", 3, 7)]
            + [("p", 10, 20), ("q", 20, 30), ("r", 10, 30)])
    df_cap = rule_mining(spark.createDataFrame(rows, TRI),
                         min_support=1, max_join_degree=2)
    got = _collect_rules(df_cap)
    df_cap.unpersist_input()
    assert got == _mine_py(rows, min_support=1, cap=2)
    assert got[("p", "q", "r")][1] == 1  # only (10, 30) survives

    df_uncap = rule_mining(spark.createDataFrame(rows, TRI),
                           min_support=1)
    got_u = _collect_rules(df_uncap)
    df_uncap.unpersist_input()
    assert got_u[("p", "q", "r")][1] == 4


def test_rule_mining_randomized_python_twin(spark):
    rng = random.Random(40406)
    rows = [(rng.choice("pqrs"), rng.randrange(12), rng.randrange(12))
            for _ in range(300)]
    for cap in (None, 3):
        df = rule_mining(spark.createDataFrame(rows, TRI),
                         min_support=2, max_join_degree=cap)
        got = _collect_rules(df)
        df.unpersist_input()
        assert got == _mine_py(rows, min_support=2, cap=cap)


EDGES = "src bigint, dst bigint, version int"


def test_edge_lifespan_golden(spark):
    rows = [(1, 1, 1), (1, 1, 3),            # flapper: gap at v2
            (2, 2, 1), (2, 2, 2), (2, 2, 3),  # stable
            (3, 3, 2), (3, 3, 2),             # dup witnesses, stale
            (4, 4, 3)]                        # new this crawl
    out = {(r.src, r.dst): (r.first_seen, r.last_seen, r.n_versions,
                            r.n_gaps, r.is_current)
           for r in edge_lifespan(
               spark.createDataFrame(rows, EDGES),
               ["src", "dst"]).collect()}
    assert out[(1, 1)] == (1, 3, 2, 1, 1)
    assert out[(2, 2)] == (1, 3, 3, 0, 1)
    assert out[(3, 3)] == (2, 2, 1, 0, 0)
    assert out[(4, 4)] == (3, 3, 1, 0, 1)


def test_edge_lifespan_current_version_override(spark):
    rows = [(1, 1, 1), (2, 2, 2)]
    out = {(r.src, r.dst): r.is_current
           for r in edge_lifespan(
               spark.createDataFrame(rows, EDGES), ["src", "dst"],
               current_version=4).collect()}
    # nothing asserted by v4 -> nothing current, even the max-version
    # edge (the snapshot-pinned read semantics)
    assert out == {(1, 1): 0, (2, 2): 0}


TOK = "url bigint, idx int, word string"


def test_term_salience_fields_and_tiebreak(spark):
    # doc 1: 'zebra' 2 mentions first at idx 0 -> 2000 + 499
    #        'apple' 2 mentions first at idx 1 -> 2000 + 498 (loses
    #        on position despite lexicographic precedence)
    # doc 2: exact score tie -> lexicographically smaller word wins
    rows = [(1, 0, "zebra"), (1, 1, "apple"), (1, 5, "zebra"),
            (1, 9, "apple"),
            (2, 3, "mango"), (2, 3, "cocoa")]
    out = {r.id: (r.top_word, r.salience, r.n_mentions)
           for r in term_salience(
               spark.createDataFrame(rows, TOK), id_col="url",
               min_len=1, pos_cap=500).collect()}
    assert out[1] == ("zebra", 2499, 2)
    assert out[2] == ("cocoa", 1496, 1)


def test_term_salience_position_bonus_floors_at_zero(spark):
    rows = [(1, 700, "faraway"), (1, 800, "faraway"),
            (1, 2, "ab")]  # 'ab' dropped by min_len=5
    out = term_salience(spark.createDataFrame(rows, TOK),
                        id_col="url", min_len=5,
                        pos_cap=500).collect()
    assert len(out) == 1
    assert (out[0].top_word, out[0].salience) == ("faraway", 2000)
