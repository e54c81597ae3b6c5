"""Wave-granular lineage commits (round-3 verdict task 4, in-process
half): a stage that dies mid-run after committing k waves must, on
restart, re-process ONLY the missing part_keys and converge to output
byte-parity (manifest checksums) with an uninterrupted run.

The real SIGKILL-a-spark-submit proof is scripts/resume_kill_proof.py;
this file pins the same mechanics deterministically and fast.
"""

import pytest
from pyspark.sql import functions as F

from python_mecab_ner_spark.plans.lineage import (completed_parts,
                                                  metrics_table, run_stage)

N_PARTS = 8
WAVE = 3  # 8 parts -> waves of [3, 3, 2]


class Boom(RuntimeError):
    pass


def _inp(spark):
    # 200 deterministic urls spread over all 8 part buckets
    return (spark.range(200)
            .select(F.concat(F.lit("https://h/"), F.col("id")).alias("url"),
                    (F.col("id") * 7).alias("v")))


def _fn(d):
    return d.withColumn("y", F.length("url") + F.col("v"))


def _manifest(spark, out, stage):
    return {r["part_key"]: (r["rows_out"], r["checksum"], r["completed_ts"])
            for r in spark.read.parquet(f"{out}/{stage}/_manifest").collect()}


def test_wave_resume_after_midstage_failure(spark, tmp_path):
    out = str(tmp_path / "out")
    inp = _inp(spark)

    # ---- run 1: fn blows up on the SECOND wave (after wave 1 committed)
    calls = {"n": 0}

    def flaky(d):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise Boom("simulated mid-stage death")
        return _fn(d)

    with pytest.raises(Boom):
        run_stage(spark, "s", inp, flaky, out, key_col="url",
                  n_parts=N_PARTS, wave_parts=WAVE)

    m1 = _manifest(spark, out, "s")
    assert len(m1) == WAVE  # exactly one committed wave survived

    # ---- run 2 (the restart): fn must see ONLY the missing part_keys
    seen: list[list[int]] = []

    def recording(d):
        seen.append(sorted(
            r[0] for r in d.select("part_key").distinct().collect()))
        return _fn(d)

    res = run_stage(spark, "s", inp, recording, out, key_col="url",
                    n_parts=N_PARTS, wave_parts=WAVE)
    processed = {p for wave in seen for p in wave}
    assert processed == set(range(N_PARTS)) - set(m1)          # no re-work
    assert res.count() == 200                                   # full output

    m2 = _manifest(spark, out, "s")
    assert set(m2) == set(range(N_PARTS))
    for p in m1:  # committed waves untouched by the restart
        assert m2[p] == m1[p]

    # ---- parity: an UNINTERRUPTED single-wave run of the same stage fn
    run_stage(spark, "ref", inp, _fn, out, key_col="url", n_parts=N_PARTS)
    ref = _manifest(spark, out, "ref")
    assert {p: m2[p][:2] for p in m2} == {p: ref[p][:2] for p in ref}
    a = sorted(tuple(r) for r in res.drop("part_key").collect())
    b = sorted(tuple(r) for r in
               spark.read.parquet(f"{out}/ref/data").drop("part_key").collect())
    assert a == b

    # metrics table unions both stages' manifests
    mt = metrics_table(spark, out)
    assert mt.where("stage = 's'").count() == N_PARTS
    assert mt.where("stage = 'ref'").count() == N_PARTS


def test_wave_complete_stage_is_noop_on_rerun(spark, tmp_path):
    out = str(tmp_path / "out")
    inp = _inp(spark)
    run_stage(spark, "s", inp, _fn, out, key_col="url",
              n_parts=N_PARTS, wave_parts=WAVE)
    m1 = _manifest(spark, out, "s")
    assert len(m1) == N_PARTS

    def never(d):
        raise AssertionError("fn must not run when every part is done")

    res = run_stage(spark, "s", inp, never, out, key_col="url",
                    n_parts=N_PARTS, wave_parts=WAVE)
    assert res.count() == 200
    assert _manifest(spark, out, "s") == m1

    done = completed_parts(spark, out, "s")
    assert done is not None and done.count() == N_PARTS


def test_refresh_recomputes_only_changed_parts(spark, tmp_path):
    """refresh=True = incremental recompute: same urls, changed
    content -> ONLY the partitions whose input fingerprint moved are
    re-run; everything else is read back from the previous run."""
    from python_mecab_ner_spark.plans.lineage import (input_fingerprints,
                                                      with_part_key)

    out = str(tmp_path / "out")
    v1 = _inp(spark)
    run_stage(spark, "s", v1, _fn, out, key_col="url",
              n_parts=N_PARTS, refresh=True)
    m1 = _manifest(spark, out, "s")
    assert set(m1) == set(range(N_PARTS))

    # re-run on the SAME input: pure no-op (fingerprints all match)
    def never(d):
        raise AssertionError("unchanged input must not re-run")

    run_stage(spark, "s", v1, never, out, key_col="url",
              n_parts=N_PARTS, refresh=True)

    # v2: recrawl-style change — urls unchanged, v bumped for ids 0, 50
    v2 = (spark.range(200)
          .select(F.concat(F.lit("https://h/"), F.col("id")).alias("url"),
                  (F.col("id") * 7 +
                   F.when(F.col("id").isin(0, 50), 1).otherwise(0))
                  .alias("v")))
    changed_parts = {r[0] for r in
                     with_part_key(v2.where(F.col("id").isin(0, 50)),
                                   "url", N_PARTS)
                     .select("part_key").distinct().collect()}
    assert 0 < len(changed_parts) < N_PARTS

    seen: list[list[int]] = []

    def recording(d):
        seen.append(sorted(
            r[0] for r in d.select("part_key").distinct().collect()))
        return _fn(d)

    res = run_stage(spark, "s", v2, recording, out, key_col="url",
                    n_parts=N_PARTS, refresh=True)
    assert {p for w in seen for p in w} == changed_parts

    # output reflects v2 everywhere (changed parts rewritten in place)
    want = {(r["url"], r["v"], len(r["url"]) + r["v"])
            for r in v2.collect()}
    got = {(r["url"], r["v"], r["y"])
           for r in res.select("url", "v", "y").collect()}
    assert got == want

    # latest_manifest: one row per part, changed parts updated
    from python_mecab_ner_spark.plans.lineage import latest_manifest
    lm = {r["part_key"]: (r["rows_out"], r["checksum"], r["input_fp"])
          for r in latest_manifest(spark, out, "s").collect()}
    assert set(lm) == set(range(N_PARTS))
    fp2 = {r[0]: r[1] for r in
           input_fingerprints(with_part_key(v2, "url", N_PARTS)).collect()}
    assert all(lm[p][2] == fp2[p] for p in lm)
    for p in set(range(N_PARTS)) - changed_parts:   # untouched rows intact
        assert lm[p][:2] == m1[p][:2]


def test_refresh_annotate_on_recrawl(spark, tmp_path):
    """End-to-end refresh on the REAL annotate stage with recrawl
    input: same urls, alt-seed content for doc_id % 20 == 0 — refresh
    re-annotates only the touched partitions and converges to
    per-partition checksum parity with a from-scratch run on the new
    crawl."""
    from python_mecab_ner_spark.operators.annotate import annotate_pages
    from python_mecab_ner_spark.plans.lineage import (latest_manifest,
                                                      with_part_key)
    from python_mecab_ner_spark.sources.corpus import (pages_dataframe,
                                                       recrawl_pages)
    from python_mecab_ner_spark.sources.gazetteer import broadcast_rows

    bc = broadcast_rows(spark)
    cols = ["url", "warc_ts", "text", "lang"]

    def ann_fn(part):
        return annotate_pages(part.select(*cols), bc)

    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    crawl1 = pages_dataframe(spark, 60, seed=5, partitions=2).select(*cols)
    run_stage(spark, "annotate", crawl1, ann_fn, out1,
              key_col="url", n_parts=N_PARTS, refresh=True)

    crawl2 = recrawl_pages(spark, 60, seed=5, overlap_start=0,
                           change_mod=20, ts_shift_min=0,
                           partitions=2).select(*cols)
    changed = crawl2.subtract(crawl1)
    changed_parts = {r[0] for r in
                     with_part_key(changed, "url", N_PARTS)
                     .select("part_key").distinct().collect()}
    assert 0 < len(changed_parts) < N_PARTS

    seen: list[set] = []

    def rec(d):
        seen.append({r[0] for r in
                     d.select("part_key").distinct().collect()})
        return ann_fn(d)

    run_stage(spark, "annotate", crawl2, rec, out1,
              key_col="url", n_parts=N_PARTS, refresh=True)
    assert set().union(*seen) == changed_parts

    # parity: a from-scratch run over crawl 2
    run_stage(spark, "annotate", crawl2, ann_fn, out2,
              key_col="url", n_parts=N_PARTS, refresh=True)
    a = {r["part_key"]: (r["rows_out"], r["checksum"], r["input_fp"])
         for r in latest_manifest(spark, out1, "annotate").collect()}
    b = {r["part_key"]: (r["rows_out"], r["checksum"], r["input_fp"])
         for r in latest_manifest(spark, out2, "annotate").collect()}
    assert a == b


def test_refresh_drops_vanished_parts(spark, tmp_path):
    """Round-4 advice: a part_key absent from the CURRENT input must
    not leak its old parquet rows into the refresh return value."""
    from python_mecab_ner_spark.plans.lineage import with_part_key

    out = str(tmp_path / "out")
    v1 = _inp(spark)
    run_stage(spark, "s", v1, _fn, out, key_col="url",
              n_parts=N_PARTS, refresh=True)

    keyed = with_part_key(v1, "url", N_PARTS)
    keep_parts = {0, 1, 2}
    v2 = keyed.where(F.col("part_key").isin(list(keep_parts))) \
        .drop("part_key")
    n_keep = v2.count()
    assert 0 < n_keep < 200

    def never(d):
        raise AssertionError("surviving parts are unchanged")

    res = run_stage(spark, "s", v2, never, out, key_col="url",
                    n_parts=N_PARTS, refresh=True)
    assert res.count() == n_keep
    got_parts = {r[0] for r in res.select("part_key").distinct().collect()}
    assert got_parts == keep_parts


def test_refresh_empty_output_part_invalidated(spark, tmp_path):
    """Round-4 advice: a re-run part whose fn output is EMPTY must not
    keep its stale data (dynamic overwrite alone would), and must get
    an explicit rows_out=0 manifest row so the next refresh is a
    no-op."""
    from python_mecab_ner_spark.plans.lineage import (latest_manifest,
                                                      with_part_key)

    out = str(tmp_path / "out")
    v1 = _inp(spark)
    run_stage(spark, "s", v1, _fn, out, key_col="url",
              n_parts=N_PARTS, refresh=True)

    # v2: bump every row's v; fn now drops part 3 entirely
    v2 = v1.withColumn("v", F.col("v") + 1)

    def drop3(d):
        return _fn(d).where(F.col("part_key") != 3)

    res = run_stage(spark, "s", v2, drop3, out, key_col="url",
                    n_parts=N_PARTS, refresh=True)
    assert res.where(F.col("part_key") == 3).count() == 0  # no stale rows
    n3 = with_part_key(v2, "url", N_PARTS) \
        .where(F.col("part_key") == 3).count()
    assert res.count() == 200 - n3

    lm = {r["part_key"]: r["rows_out"]
          for r in latest_manifest(spark, out, "s").collect()}
    assert lm[3] == 0

    # third run, same input: everything (incl. the empty part) is done
    def never(d):
        raise AssertionError("unchanged input must not re-run")

    res3 = run_stage(spark, "s", v2, never, out, key_col="url",
                     n_parts=N_PARTS, refresh=True)
    assert res3.count() == 200 - n3


def test_tombstone_invalidated_part_recomputed_by_plain_resume(
        spark, tmp_path):
    """Round-5 review finding: a kill between refresh's invalidation
    and its rewrite must leave the part INCOMPLETE to a plain
    (non-refresh) resume.  Simulate the kill window by hand: append
    the rows_out=-1 tombstone and delete the partition dir (exactly
    what run_stage does before the wave write), then resume without
    refresh and assert the part is recomputed with full parity."""
    from python_mecab_ner_spark.plans.lineage import (
        _data_path, _delete_partition_dirs, _manifest_path)
    out = str(tmp_path / "o")
    full = run_stage(spark, "s", _inp(spark), _fn, out,
                     n_parts=N_PARTS).orderBy("url").collect()
    # the kill window: tombstone part 3, drop its data
    (spark.createDataFrame(
        [(3, -1, 0, None)],
        "part_key int, rows_out bigint, checksum bigint, input_fp bigint")
     .withColumn("stage", F.lit("s"))
     .withColumn("wall_ms", F.lit(0))
     .withColumn("completed_ts", F.current_timestamp())
     .write.mode("append").parquet(_manifest_path(out, "s")))
    _delete_partition_dirs(spark, _data_path(out, "s"), [3])
    done = {r[0] for r in completed_parts(spark, out, "s").collect()}
    assert 3 not in done          # latest-row liveness, not any-row
    res = run_stage(spark, "s", _inp(spark), _fn, out, n_parts=N_PARTS)
    assert res.orderBy("url").collect() == full


def test_all_empty_stage_returns_empty_frame_and_resumes(spark, tmp_path):
    """Round-5 review finding: a stage whose fn yields zero rows for
    every part must complete (rows_out=0 manifest rows), return an
    empty frame with the fn's schema instead of crashing on parquet
    schema inference, and be a no-op on resume."""
    out = str(tmp_path / "o")

    def _empty_fn(d):
        return _fn(d).where(F.lit(False))

    res = run_stage(spark, "s", _inp(spark), _empty_fn, out,
                    n_parts=N_PARTS)
    assert res.count() == 0
    assert set(res.columns) >= {"url", "v", "y"}
    done = {r[0] for r in completed_parts(spark, out, "s").collect()}
    assert done == set(range(N_PARTS))   # explicit rows_out=0 rows
    res2 = run_stage(spark, "s", _inp(spark), _empty_fn, out,
                     n_parts=N_PARTS)   # resume: nothing todo, no crash
    assert res2.count() == 0
    assert set(res2.columns) >= {"url", "v", "y"}
