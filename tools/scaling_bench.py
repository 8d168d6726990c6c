"""Scaling-efficiency evidence for BASELINE.json's two-cluster-size gate.

No real cluster exists in this sandbox, so (per the rule's sandbox clause)
we run the IDENTICAL spark-submit job at two parallelism levels — N and 4N
local cores — on the SAME input, and report throughput at both plus

    efficiency = throughput(4N) / (4 × throughput(N))

Each run is a fresh `spark-submit --py-files canal_spark.zip` JVM so no
warm-cache leaks between sizes. Results are appended to BENCH_SCALING.md.

Usage: python tools/scaling_bench.py [n_small] [n_large] [n_events]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def make_pyfiles_zip() -> str:
    zpath = os.path.join(_REPO, ".work", "canal_spark.zip")
    os.makedirs(os.path.dirname(zpath), exist_ok=True)
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(_REPO, "canal_spark")):
            for fn in files:
                if fn.endswith(".py"):
                    p = os.path.join(root, fn)
                    z.write(p, os.path.relpath(p, _REPO))
    return zpath


def run_at(cores: int, zpath: str, log_dir: str, base_path: str) -> dict:
    table_dir = os.path.join(_REPO, ".work", f"scale_table_{cores}")
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--conf", f"spark.sql.shuffle.partitions={cores}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.adaptive.coalescePartitions.enabled=true",
        "--conf", "spark.sql.adaptive.skewJoin.enabled=true",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.driver.memory=8g",
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.local.dir={os.path.join(_REPO, '.work', 'spark-tmp')}",
        "--py-files", zpath,
        os.path.join(_REPO, "tools", "replay_job.py"),
        log_dir, base_path, table_dir, "32",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    shutil.rmtree(table_dir, ignore_errors=True)
    return json.loads(line)


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_events = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000

    from bench import ensure_fixture
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir, base_path = ensure_fixture(sf_dir, n_events)
    zpath = make_pyfiles_zip()

    small = run_at(n_small, zpath, log_dir, base_path)
    large = run_at(n_large, zpath, log_dir, base_path)
    ratio = n_large / n_small
    eff = large["events_per_sec"] / (ratio * small["events_per_sec"])
    result = {
        "job": "tools/replay_job.py via spark-submit --py-files",
        "input_events": n_events,
        "cores_small": n_small, "sec_small": small["sec"],
        "eps_small": small["events_per_sec"],
        "cores_large": n_large, "sec_large": large["sec"],
        "eps_large": large["events_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": ">=0.8 from N to 4N (BASELINE.json)",
    }
    print(json.dumps(result, indent=1))
    with open(os.path.join(_REPO, "BENCH_SCALING.md"), "a") as f:
        f.write(
            f"\n| {n_events} | local[{n_small}] {small['sec']}s "
            f"{small['events_per_sec']} ev/s | local[{n_large}] "
            f"{large['sec']}s {large['events_per_sec']} ev/s | "
            f"{round(eff, 3)} |\n"
        )


if __name__ == "__main__":
    main()
