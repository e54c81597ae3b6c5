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
