"""Per-partition lineage, metrics, and resume (north rule requirement;
SURVEY.md §7.5).

Every checkpointed stage writes
    <out>/<stage>/data/         partitioned Parquet, partition key =
                                part_key = pmod(md5(url), n_parts)
    <out>/<stage>/_manifest/    one row per completed part_key:
                                (stage, part_key, rows_out, checksum,
                                 wall_ms, completed_ts)

Resume: completed part_keys are anti-joined out of the input before
the stage function runs — a restarted job re-processes only missing
partitions, and writes are idempotent per partition directory
(dynamic partition overwrite).

The checksum is an order-insensitive xor-style fold of row hashes so
re-runs of a partition can be verified byte-equivalent.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import bucket


def with_part_key(df: DataFrame, key_col: str = "url", n_parts: int = 32) -> DataFrame:
    return df.withColumn("part_key", bucket(F.col(key_col), n_parts))


def _manifest_path(out_dir: str, stage: str) -> str:
    return f"{out_dir}/{stage}/_manifest"


def _data_path(out_dir: str, stage: str) -> str:
    return f"{out_dir}/{stage}/data"


def completed_parts(spark, out_dir: str, stage: str) -> DataFrame | None:
    # probe by reading, not by local-FS existence: the production
    # out_dir is object storage where Path() semantics don't apply
    try:
        return spark.read.parquet(_manifest_path(out_dir, stage)) \
            .select("part_key").distinct()
    except Exception:
        return None


def run_stage(spark, stage: str, input_df: DataFrame, fn, out_dir: str,
              key_col: str = "url", n_parts: int = 32,
              wave_parts: int | None = None) -> DataFrame:
    """Resumable stage execution.

    fn: DataFrame -> DataFrame (must preserve the part_key column or a
    url column to rebuild it).  Returns the FULL stage output (reading
    previously completed partitions back from disk).

    wave_parts sets the COMMIT GRANULARITY.  None (default) processes
    every missing partition in one write job — minimum barriers, the
    fast path when failures are rare.  An integer W splits the todo
    part_keys into waves of W, each wave written + manifested as its
    own job: a kill mid-stage loses at most one in-flight wave, and a
    restarted run resumes from the last committed wave (proven by
    SIGKILL in scripts/resume_kill_proof.py and in-process in
    tests/test_resume_waves.py).  At 100 TB pick W so one wave is
    minutes of work — the failure-blast-radius vs barrier-overhead
    knob; each wave's input scan is part_key-pruned, so waves never
    re-read completed partitions.
    """
    inp = with_part_key(input_df, key_col, n_parts)
    done = completed_parts(spark, out_dir, stage)
    done_set: set[int] = (set() if done is None else
                          {r[0] for r in done.collect()})  # <= n_parts rows
    todo = inp if done is None else inp.join(done, "part_key", "left_anti")

    # one cheap action on the INPUT scan (not the stage fn): the part
    # keys this run will complete.  part_key is a pure function of the
    # input key, so every todo part materializes a partition dir — the
    # manifest can be derived from the input side without listing the
    # output (Path.iterdir is a local-FS assumption; the 100 TB
    # deployment writes to object storage).
    todo_parts = sorted(r[0] for r in
                        todo.select("part_key").distinct().collect())
    if wave_parts:
        waves = [todo_parts[i:i + wave_parts]
                 for i in range(0, len(todo_parts), wave_parts)]
    else:
        waves = [todo_parts] if todo_parts else []
    for wave in waves:
        t0 = time.time()
        wave_df = (todo if len(waves) == 1 else
                   todo.filter(F.col("part_key").isin([int(p) for p in wave])))
        out = fn(wave_df)
        if "part_key" not in out.columns:
            out = with_part_key(out, key_col, n_parts)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (out.write.mode("overwrite").partitionBy("part_key")
         .parquet(_data_path(out_dir, stage)))
        wall_ms = int((time.time() - t0) * 1000)
        # the stage fn's plan executes exactly ONCE per wave (the write
        # above): newly completed part keys come from the input-side
        # key set, never from re-running `out`; the checksum pass below
        # reads back ONLY those partitions via partition pruning.  A
        # kill between the data write and this manifest append is safe:
        # the unmanifested wave stays in the todo set and its dynamic
        # partition overwrite is idempotent.
        new_parts = sorted(set(wave) - done_set)
        written = spark.read.parquet(_data_path(out_dir, stage))
        manifest = (written
                    .filter(F.col("part_key").isin(new_parts))
                    .groupBy("part_key")
                    .agg(F.count("*").alias("rows_out"),
                         F.sum(F.conv(F.substring(F.md5(F.to_json(
                             F.struct("*"))), 1, 8), 16, 10).cast("bigint"))
                         .alias("checksum"))
                    .withColumn("stage", F.lit(stage))
                    .withColumn("wall_ms", F.lit(wall_ms))
                    .withColumn("completed_ts", F.current_timestamp()))
        manifest.write.mode("append").parquet(_manifest_path(out_dir, stage))
    return spark.read.parquet(_data_path(out_dir, stage))


def metrics_table(spark, out_dir: str) -> DataFrame:
    """Union of all stage manifests: the pipeline metrics table
    (stage, part_key, rows_out, checksum, wall_ms, completed_ts).
    One wildcard read — manifests share a schema and the glob goes
    through the Hadoop FS layer, so this works on object storage
    (no local-FS directory iteration)."""
    try:
        return spark.read.parquet(f"{out_dir}/*/_manifest")
    except Exception as e:
        raise FileNotFoundError(f"no manifests under {out_dir}") from e
