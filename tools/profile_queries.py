"""Per-query stage-level profiler (guide §1.1 empirical loop).

For each named headline query: run it once warm with the noop sink,
then pull the completed stages from the Spark REST API and report
per-stage executorRunTime / input / shuffle bytes / task counts so the
expensive stage is identifiable without the UI.

Usage:
    python tools/profile_queries.py out.json name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=10) as resp:
        return json.loads(resp.read())


def main() -> int:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from acero_delta_lake_streaming_spark.session import get_spark

    spark = get_spark(
        app_name="profile",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import __spark_entry__ as entrymod

    registry = entrymod.queries()
    base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[1]}/api/v1"
    app_id = sc.applicationId

    def run(name: str) -> float:
        df = registry[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # Warm the JVM once.
    try:
        run(names[0])
    except Exception as exc:
        print(f"warmup {names[0]} failed: {exc}", file=sys.stderr)

    results = {}
    for name in names:
        jobs_before = {j["jobId"] for j in _api(base, f"/applications/{app_id}/jobs")}
        sc.setJobDescription(f"profile:{name}")
        try:
            wall = run(name)
        except Exception as exc:
            results[name] = {"error": str(exc)}
            continue
        sc.setJobDescription(None)
        jobs = [
            j
            for j in _api(base, f"/applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        stage_ids = sorted({s for j in jobs for s in j.get("stageIds", [])})
        stages = []
        for sid in stage_ids:
            try:
                atts = _api(base, f"/applications/{app_id}/stages/{sid}")
            except Exception:
                continue
            for st in atts:
                if st.get("status") not in ("COMPLETE", "SKIPPED"):
                    continue
                stages.append(
                    {
                        "stage": sid,
                        "status": st["status"],
                        "name": st.get("name", "")[:80],
                        "tasks": st.get("numCompleteTasks", 0),
                        "runTimeMs": st.get("executorRunTime", 0),
                        "cpuTimeMs": round(
                            st.get("executorCpuTime", 0) / 1e6
                        ),
                        "inputMB": round(st.get("inputBytes", 0) / 1e6, 2),
                        "shufReadMB": round(
                            st.get("shuffleReadBytes", 0) / 1e6, 2
                        ),
                        "shufWriteMB": round(
                            st.get("shuffleWriteBytes", 0) / 1e6, 2
                        ),
                        "firstLaunch": st.get("firstTaskLaunchedTime", ""),
                        "durMs": None,
                    }
                )
        results[name] = {
            "wall_s": round(wall, 3),
            "n_jobs": len(jobs),
            "n_stages": len(stages),
            "stages": sorted(
                stages, key=lambda s: -s["runTimeMs"]
            ),
        }
        top = results[name]["stages"][:3]
        print(
            f"{name}: {wall:.2f}s jobs={len(jobs)} stages={len(stages)} "
            + " | ".join(
                f"s{t['stage']} {t['runTimeMs']}ms {t['tasks']}t {t['name'][:40]}"
                for t in top
            )
        )

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
