"""Per-stage profile of the headline queries (guide §1: measure first).

Runs each headline query once (after a warmup pass at sf0.001), labeled
via setJobDescription, then pulls per-stage metrics from the Spark UI
REST API and prints, for every query: wall seconds, job count, and the
stages sorted by executorRunTime with their shuffle read/write bytes.

Usage: python tools/profile_headliners.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fabrix_spark.queries import REGISTRY, headline_queries  # noqa: E402
from fabrix_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.loads(r.read())


def main() -> None:
    names = sys.argv[2:] or list(headline_queries())
    spark = get_spark("profile_headliners", ui=True)
    app_id = spark.sparkContext.applicationId
    spark.range(1000).selectExpr("sum(id)").collect()

    warm = "/root/testdata/sf0.001"
    for name in names:
        try:
            REGISTRY[name].fn(spark, warm).count()
        except Exception as e:  # noqa: BLE001
            print(f"# warmup {name} failed: {e}", file=sys.stderr)

    # prebuilt sigstore fixture outside the timed region (bench parity)
    try:
        from fabrix_spark.queries import _prebuilt_sigstore

        _prebuilt_sigstore(spark, SF_DIR)
    except Exception as e:  # noqa: BLE001
        print(f"# sigstore prebuild failed: {e}", file=sys.stderr)

    results = {}
    for name in names:
        fn = REGISTRY[name].fn
        jobs_before = {j["jobId"] for j in _api(f"applications/{app_id}/jobs")}
        spark.sparkContext.setJobDescription(f"headline:{name}")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        jobs = [
            j
            for j in _api(f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in _api(f"applications/{app_id}/stages/{sid}"):
                    stages.append(att)
            except Exception:  # noqa: BLE001
                pass
        rows = []
        for s in stages:
            rows.append(
                {
                    "stage": s["stageId"],
                    "name": s["name"].split("\n")[0][:70],
                    "tasks": s["numCompleteTasks"],
                    "runTime_s": round(s.get("executorRunTime", 0) / 1000.0, 2),
                    "cpuTime_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
                    "shufRead_MB": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                    "shufWrite_MB": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                    "input_MB": round(s.get("inputBytes", 0) / 1e6, 1),
                }
            )
        rows.sort(key=lambda r: -r["runTime_s"])
        results[name] = {
            "wall_s": round(wall, 3),
            "rows": n,
            "n_jobs": len(jobs),
            "n_stages": len(stages),
            "stages": rows,
        }
        print(f"\n## {name}: wall {wall:.3f}s, {len(jobs)} jobs, {len(stages)} stages, {n} rows")
        for r in rows[:8]:
            print(
                f"   stage {r['stage']:>4} run {r['runTime_s']:>7.2f}s cpu {r['cpuTime_s']:>7.2f}s "
                f"tasks {r['tasks']:>3} shufR {r['shufRead_MB']:>8.1f}MB shufW {r['shufWrite_MB']:>8.1f}MB "
                f"in {r['input_MB']:>8.1f}MB  {r['name']}"
            )

    out = Path("/tmp/profile_headliners.json")
    out.write_text(json.dumps(results, indent=1))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
