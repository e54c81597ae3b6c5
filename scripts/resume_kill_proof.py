"""Kill-and-restart resume proof (north rule: "resumable from
checkpoint with per-partition lineage + metrics"; round-3 verdict
task 4).

Protocol — three real `spark-submit --py-files` runs of the full
pipeline (the production entrypoint, not an in-process shortcut):

 1. CONTROL  — uninterrupted run into its own out dir.
 2. VICTIM   — identical job with wave-granular lineage commits
               (`--wave-parts`), SIGKILL'd from outside once at least
               one annotate wave has committed its manifest rows but
               before the stage completes.
 3. RESUME   — the exact same command re-run against the victim's
               out dir, to completion.

Assertions:
 A. partitions committed before the kill are NOT re-processed: their
    manifest rows — including completed_ts — survive the restart
    byte-identically (the restart only APPENDS rows for missing parts);
 B. the resumed manifest covers every part exactly once;
 C. per-partition annotate checksums equal the control run's (the
    lineage checksum is an order-insensitive fold of row hashes, so
    this is row-level byte parity of the recovered stage);
 D. final graph tables (edges, vertices) are row-set identical to the
    control run (order-insensitive row hash via DuckDB).

Writes resume_proof.json at the repo root and exits non-zero on any
assertion failure.

Usage:
    python scripts/resume_kill_proof.py [--docs 8000] [--parts 16]
        [--wave-parts 4] [--cpus 8] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

import duckdb  # noqa: E402


def manifest_rows(out_dir: str, stage: str = "annotate"):
    """Read a manifest from OUTSIDE spark (the observer side of the
    kill).  Tolerates mid-write states (missing dir, half-renamed
    files) by returning what is readable right now."""
    glob = f"{out_dir}/{stage}/_manifest/*.parquet"
    try:
        return duckdb.sql(
            "SELECT part_key, rows_out, checksum::VARCHAR AS checksum, "
            "completed_ts::VARCHAR AS completed_ts "
            f"FROM read_parquet('{glob}') ORDER BY part_key, completed_ts"
        ).fetchall()
    except Exception:
        return []


def table_fingerprint(path_glob: str, drop: tuple = ()):
    """(row_count, order-insensitive row hash) of a parquet table."""
    cols = [r[0] for r in duckdb.sql(
        f"DESCRIBE SELECT * FROM read_parquet('{path_glob}', "
        "hive_partitioning=true)").fetchall()]
    keep = [c for c in cols if c not in drop]
    sel = ", ".join(f'"{c}"' for c in sorted(keep))
    return duckdb.sql(
        f"SELECT count(*)::VARCHAR, sum(hash(to_json(t)))::VARCHAR FROM "
        f"(SELECT {sel} FROM read_parquet('{path_glob}', "
        "hive_partitioning=true)) t").fetchone()


def submit_cmd(out_dir: str, docs: int, parts: int, wave: int, cpus: int,
               zip_path: str):
    return [
        "spark-submit", "--master", f"local[{cpus}]",
        "--conf", "spark.sql.shuffle.partitions=16",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=8g",
        "--py-files", zip_path,
        str(REPO / "scripts" / "submit_pipeline.py"),
        "--input", f"synthetic:{docs}", "--out", out_dir,
        "--parts", str(parts), "--wave-parts", str(wave),
    ]


def run_to_completion(cmd, log_path: str) -> float:
    t0 = time.time()
    with open(log_path, "w") as lf:
        subprocess.run(cmd, check=True, stdout=lf, stderr=subprocess.STDOUT,
                       cwd=str(REPO))
    return time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=8000)
    ap.add_argument("--parts", type=int, default=16)
    ap.add_argument("--wave-parts", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--keep", action="store_true",
                    help="keep the work dir for inspection")
    args = ap.parse_args()

    zip_path = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "make_pyfiles_zip.py")],
        check=True, capture_output=True, text=True,
        cwd=str(REPO)).stdout.strip()

    work = tempfile.mkdtemp(prefix="resume_proof_")
    control_out = f"{work}/control"
    victim_out = f"{work}/victim"
    report: dict = {"docs": args.docs, "parts": args.parts,
                    "wave_parts": args.wave_parts, "cpus": args.cpus}
    failures: list[str] = []

    def check(name: str, ok: bool, detail: str = ""):
        report[name] = bool(ok)
        if not ok:
            failures.append(f"{name}: {detail}")
            print(f"FAIL {name} {detail}")
        else:
            print(f"ok   {name}")

    try:
        # ---- 1. control ------------------------------------------------
        print("control run ...")
        report["control_wall_s"] = round(run_to_completion(
            submit_cmd(control_out, args.docs, args.parts, args.wave_parts,
                       args.cpus, zip_path), f"{work}/control.log"), 1)
        control_manifest = manifest_rows(control_out)
        check("control_all_parts",
              sorted({r[0] for r in control_manifest}) == list(range(args.parts)),
              f"got {sorted({r[0] for r in control_manifest})}")

        # ---- 2. victim: SIGKILL mid-stage ------------------------------
        print("victim run (to be killed) ...")
        with open(f"{work}/victim.log", "w") as lf:
            proc = subprocess.Popen(
                submit_cmd(victim_out, args.docs, args.parts,
                           args.wave_parts, args.cpus, zip_path),
                stdout=lf, stderr=subprocess.STDOUT, cwd=str(REPO),
                start_new_session=True)  # own pgid: kill the whole JVM tree
            killed_at_parts = None
            deadline = time.time() + 900
            while time.time() < deadline and proc.poll() is None:
                done_parts = {r[0] for r in manifest_rows(victim_out)}
                if args.wave_parts <= len(done_parts) < args.parts:
                    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
                    killed_at_parts = sorted(done_parts)
                    break
                time.sleep(0.05)
            proc.wait(timeout=60)
        report["killed_with_parts_done"] = killed_at_parts
        check("kill_landed_midstage", killed_at_parts is not None,
              "job finished before the kill window — raise --docs")
        if killed_at_parts is None:
            raise SystemExit(json.dumps(report))

        pre = {r[0]: r for r in manifest_rows(victim_out)}
        check("manifest_consistent_after_kill",
              sorted(pre) == killed_at_parts, f"{sorted(pre)}")

        # ---- 3. resume --------------------------------------------------
        print("resume run ...")
        report["resume_wall_s"] = round(run_to_completion(
            submit_cmd(victim_out, args.docs, args.parts, args.wave_parts,
                       args.cpus, zip_path), f"{work}/resume.log"), 1)

        post_rows = manifest_rows(victim_out)
        post = {r[0]: r for r in post_rows}

        # A: pre-kill rows survive byte-identically (incl. completed_ts)
        check("completed_parts_skipped",
              all(post.get(p) == pre[p] for p in pre),
              str([(p, pre[p], post.get(p)) for p in pre
                   if post.get(p) != pre[p]][:3]))
        # B: full coverage, no duplicate part rows
        check("all_parts_once",
              sorted(r[0] for r in post_rows) == list(range(args.parts)),
              f"{sorted(r[0] for r in post_rows)}")
        # C: per-partition checksum parity with control
        ctl = {r[0]: (r[1], r[2]) for r in control_manifest}
        res = {r[0]: (r[1], r[2]) for r in post_rows}
        check("annotate_checksums_match_control", ctl == res,
              str([(p, ctl[p], res.get(p)) for p in ctl
                   if res.get(p) != ctl[p]][:3]))
        # D: graph output parity
        for table, drop in (("edges", ()), ("vertices", ())):
            a = table_fingerprint(f"{control_out}/{table}/**/*.parquet", drop)
            b = table_fingerprint(f"{victim_out}/{table}/**/*.parquet", drop)
            report[f"{table}_fingerprint_control"] = a
            report[f"{table}_fingerprint_resumed"] = b
            check(f"{table}_parity", a == b, f"{a} != {b}")

        report["passed"] = not failures
    finally:
        if args.keep:
            report["work_dir"] = work
            print(f"work dir kept: {work}")
        else:
            shutil.rmtree(work, ignore_errors=True)

    out_path = REPO / "resume_proof.json"
    out_path.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
