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


def _delete_partition_dirs(spark, data_path: str, parts) -> None:
    """Remove `part_key=<p>` partition directories through the Hadoop
    FS API — the object-store-safe path (local Path() semantics don't
    exist on the 100 TB deployment's storage).  Missing dirs are a
    no-op; <= n_parts driver-side calls."""
    if not parts:
        return
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for p in parts:
        jpath = jvm.org.apache.hadoop.fs.Path(
            f"{data_path}/part_key={int(p)}")
        fs = jpath.getFileSystem(hconf)
        if fs.exists(jpath):
            fs.delete(jpath, True)


def completed_parts(spark, out_dir: str, stage: str) -> DataFrame | None:
    """part_keys whose LATEST manifest row is live (rows_out >= 0).

    Latest-row semantics, not mere row existence: refresh mode
    appends a rows_out = -1 TOMBSTONE before invalidating a re-run
    part's data (see run_stage), so a kill inside the
    invalidate-recompute window leaves the part visibly incomplete to
    BOTH resume modes instead of a completed-looking part with
    deleted data (review finding: the old any-row-means-done read
    made that kill window silently lose the part under a plain
    resume).  Probes by reading, not local-FS existence — the
    production out_dir is object storage."""
    latest = latest_manifest(spark, out_dir, stage)
    if latest is None:
        return None
    return (latest.where(F.col("rows_out") >= 0)
            .select("part_key").distinct())


def latest_manifest(spark, out_dir: str, stage: str) -> DataFrame | None:
    """One row per part_key — the most recent manifest row (a part
    re-run by refresh mode appends a new row; the LATEST one describes
    the data currently on disk).  max_by on completed_ts, one
    combinable agg over the tiny manifest."""
    try:
        m = (spark.read.option("mergeSchema", "true")
             .parquet(_manifest_path(out_dir, stage)))
    except Exception:
        return None
    if "input_fp" not in m.columns:
        m = m.withColumn("input_fp", F.lit(None).cast("bigint"))
    return (m.groupBy("part_key")
            .agg(F.max_by(F.struct("rows_out", "checksum", "input_fp",
                                   "completed_ts"),
                          "completed_ts").alias("_s"))
            .select("part_key", "_s.rows_out", "_s.checksum",
                    "_s.input_fp", "_s.completed_ts"))


def input_fingerprints(inp_with_part: DataFrame) -> DataFrame:
    """(part_key, input_fp): order-insensitive fold of row hashes over
    the INPUT — the change detector for refresh mode.  One partial-agg
    job over the input scan; commutative sum, so any partitioning
    gives the same fingerprint."""
    return (inp_with_part.groupBy("part_key")
            .agg(F.sum(F.conv(F.substring(F.md5(F.to_json(
                F.struct("*"))), 1, 8), 16, 10).cast("bigint"))
                 .alias("input_fp")))


def run_stage(spark, stage: str, input_df: DataFrame, fn, out_dir: str,
              key_col: str = "url", n_parts: int = 32,
              wave_parts: int | None = None,
              refresh: bool = False) -> DataFrame:
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

    refresh=True turns resume into INCREMENTAL RECOMPUTE: the stage
    fingerprints its input per part_key (order-insensitive row-hash
    fold, one partial-agg pass) and re-runs a completed part only when
    its input fingerprint differs from the one stored in the latest
    manifest row — the recrawl-refresh path (same urls, changed
    content), which plain resume cannot detect.  Re-run parts append a
    NEW manifest row; latest_manifest() is the per-part truth.  Cost:
    one full input scan per run for the fingerprint — on Iceberg the
    snapshot-diff API would replace it; here it is the storage-neutral
    change detector, and it is still ~annotate_cost/20 cheaper than
    recomputing everything.

    STALENESS INVALIDATION (round-4 advice, hardened round 5):
    dynamic partition overwrite only touches partitions PRESENT in
    the wave's output, so (a) a re-run part whose fn output is EMPTY
    would keep its old parquet data — each wave therefore appends a
    rows_out=-1 TOMBSTONE manifest row for its re-run parts FIRST,
    then clears the wave parts' partition dirs via the Hadoop FS API
    (object-store-safe), then writes; completed_parts reads
    latest-row liveness, so a kill anywhere inside that window
    leaves the part incomplete to BOTH resume modes (tombstone-
    before-delete closes the round-5 review's data-loss window where
    delete-then-kill left a completed-looking manifest row over
    missing data).  An explicit rows_out=0 row is manifested when the
    re-run produced nothing.  (b) a part_key absent from the CURRENT
    input (urls dropped since the last run) keeps its old data on
    disk — the refresh return value filters the read to fp_map's part
    keys, so vanished partitions never leak into the stage output
    (their dirs are garbage to be reclaimed by retention, not
    silently served).
    """
    inp = with_part_key(input_df, key_col, n_parts)
    fp_map: dict[int, int] = {}
    # one cheap action on the INPUT scan (not the stage fn): the part
    # keys this run will complete.  part_key is a pure function of the
    # input key, so every todo part materializes a partition dir — the
    # manifest can be derived from the input side without listing the
    # output (Path.iterdir is a local-FS assumption; the 100 TB
    # deployment writes to object storage).
    stored: dict[int, int | None] = {}
    if refresh:
        fp_map = {r[0]: r[1] for r in
                  input_fingerprints(inp).collect()}  # <= n_parts rows
        latest = latest_manifest(spark, out_dir, stage)
        stored = ({} if latest is None else
                  {r["part_key"]: r["input_fp"] for r in latest.collect()})
        done_set = {p for p in stored
                    if stored[p] is not None and stored[p] == fp_map.get(p)}
        todo_parts = sorted(set(fp_map) - done_set)
        todo = (inp if not done_set else
                inp.join(spark.createDataFrame(
                    [(int(p),) for p in done_set], "part_key int"),
                    "part_key", "left_anti"))
    else:
        done = completed_parts(spark, out_dir, stage)
        done_set = (set() if done is None else
                    {r[0] for r in done.collect()})  # <= n_parts rows
        todo = inp if done is None else inp.join(done, "part_key",
                                                 "left_anti")
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
        if refresh:
            # invalidate BEFORE touching data: append a rows_out=-1
            # TOMBSTONE manifest row for each re-run part, so a kill
            # anywhere inside the delete/recompute window leaves the
            # part visibly incomplete to both resume modes
            # (completed_parts reads latest-row liveness).  The old
            # delete-first order lost the part under a plain resume:
            # its stale manifest row still said done while its data
            # was gone (review finding).
            rerun = [int(p) for p in wave if p in stored]
            if rerun:
                (spark.createDataFrame(
                    [(p, -1, 0, None) for p in rerun],
                    "part_key int, rows_out bigint, checksum bigint, "
                    "input_fp bigint")
                 .withColumn("stage", F.lit(stage))
                 .withColumn("wall_ms", F.lit(0))
                 .withColumn("completed_ts", F.current_timestamp())
                 .write.mode("append")
                 .parquet(_manifest_path(out_dir, stage)))
        # clear the wave parts' partition dirs in BOTH modes: every
        # part in a wave is incomplete by construction (missing,
        # tombstoned, or fp-mismatched), so whatever sits in its dir
        # is garbage — a partially-written dir from a killed run, or
        # refresh-stale data that dynamic overwrite would keep when
        # the new output is empty.  <= wave_parts driver-side Hadoop
        # FS calls (object-store-safe), no-ops for absent dirs.
        _delete_partition_dirs(spark, _data_path(out_dir, stage), wave)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (out.write.mode("overwrite").partitionBy("part_key")
         .parquet(_data_path(out_dir, stage)))
        wall_ms = int((time.time() - t0) * 1000)
        # the stage fn's plan executes exactly ONCE per wave (the write
        # above): newly completed part keys come from the input-side
        # key set, never from re-running `out`; the checksum pass below
        # reads back ONLY those partitions via partition pruning, and
        # runs exactly once (collected — the tiny <= n_parts manifest
        # is then written back via createDataFrame instead of
        # re-executing the aggregate for the write; review finding).
        # A kill between the data write and this manifest append is
        # safe: the unmanifested wave stays in the todo set and its
        # write is idempotent.
        new_parts = sorted(set(wave) - done_set)
        try:
            written = spark.read.parquet(_data_path(out_dir, stage))
        except Exception:
            written = None  # every wave so far produced zero rows
        agg_rows = ([] if written is None else
                    written
                    .filter(F.col("part_key").isin(new_parts))
                    .groupBy("part_key")
                    .agg(F.count("*").alias("rows_out"),
                         F.sum(F.conv(F.substring(F.md5(F.to_json(
                             F.struct("*"))), 1, 8), 16, 10).cast("bigint"))
                         .alias("checksum"))
                    .collect())
        rows = [(int(r["part_key"]), int(r["rows_out"]),
                 int(r["checksum"])) for r in agg_rows]
        # wave parts whose output is EMPTY get an explicit rows_out=0
        # manifest row — without it they would be re-processed on
        # every resume, and a refreshed-to-empty part would keep its
        # stale fp forever (round-4 advice)
        present = {r[0] for r in rows}
        rows += [(int(p), 0, 0) for p in new_parts
                 if int(p) not in present]
        if rows:
            (spark.createDataFrame(
                [(p, n, c, int(fp_map[p]) if p in fp_map else None)
                 for p, n, c in rows],
                "part_key int, rows_out bigint, checksum bigint, "
                "input_fp bigint")
             .withColumn("stage", F.lit(stage))
             .withColumn("wall_ms", F.lit(wall_ms))
             .withColumn("completed_ts", F.current_timestamp())
             .write.mode("append")
             .parquet(_manifest_path(out_dir, stage)))
    try:
        res = spark.read.parquet(_data_path(out_dir, stage))
    except Exception:
        # every part of every run produced zero rows: the data dir
        # holds no parquet footers.  The stage still COMPLETED (its
        # rows_out=0 manifest rows are written above) — return an
        # empty frame with the stage fn's output schema instead of
        # crashing on schema inference (review finding); `out` is
        # bound whenever any wave ran this call.
        if waves:
            return spark.createDataFrame([], out.schema)
        # nothing ran THIS call (an all-empty stage being resumed):
        # derive the schema from the stage fn's plan — analysis only,
        # no job runs over the empty todo frame
        probe = fn(todo)
        if "part_key" not in probe.columns:
            probe = with_part_key(probe, key_col, n_parts)
        return spark.createDataFrame([], probe.schema)
    if refresh:
        # drop partitions whose part_key vanished from the current
        # input — dynamic overwrite never touched them, so their old
        # data is stale (round-4 advice); isin over <= n_parts keys
        # partition-prunes at the scan
        res = res.filter(
            F.col("part_key").isin([int(p) for p in fp_map]))
    return res


def metrics_table(spark, out_dir: str) -> DataFrame:
    """Union of all stage manifests: the pipeline metrics table
    (stage, part_key, rows_out, checksum, wall_ms, completed_ts).
    One wildcard read — manifests share a schema and the glob goes
    through the Hadoop FS layer, so this works on object storage
    (no local-FS directory iteration).  mergeSchema tolerates
    pre-refresh manifests that lack the input_fp column."""
    try:
        return (spark.read.option("mergeSchema", "true")
                .parquet(f"{out_dir}/*/_manifest"))
    except Exception as e:
        raise FileNotFoundError(f"no manifests under {out_dir}") from e
