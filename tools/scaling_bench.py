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


def _cpu_snap() -> list[int]:
    return list(map(int, open("/proc/stat").readline().split()[1:]))


def run_at(cores: int, zpath: str, log_dir: str, base_path: str,
           repeats: int = 2, stage: str = "full") -> dict:
    """One spark-submit run at `cores`. shuffle.partitions is held CONSTANT
    across cluster sizes — on a real cluster the partitioning of a fixed
    problem does not change with executor count, and letting it track cores
    conflates spill behavior with scaling (8-core runs spilled with 8 huge
    reducers and made 32-core look super-linear).

    ``SPARK_SCALE_LOCAL_DIR`` (e.g. /dev/shm/spark-scale) moves shuffle
    spill AND the sink table onto tmpfs. Rationale: this VM has ONE virtio
    disk shared by every core, so the local[4N] leg pays the same disk
    bandwidth as local[N] — but the BASELINE.json gate models N→4N
    *executors*, and a real scale-up multiplies disks/network with the
    executor count. tmpfs removes the artifact this sandbox cannot scale,
    leaving the engine's own CPU/shuffle scaling observable."""
    scratch = os.environ.get("SPARK_SCALE_LOCAL_DIR")
    work = scratch if scratch else os.path.join(_REPO, ".work")
    os.makedirs(work, exist_ok=True)
    table_dir = os.path.join(work, f"scale_table_{cores}")
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--conf", "spark.sql.shuffle.partitions=64",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.adaptive.coalescePartitions.enabled=true",
        "--conf", "spark.sql.adaptive.skewJoin.enabled=true",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.sql.files.maxPartitionBytes=134217728",
        "--conf", "spark.sql.autoBroadcastJoinThreshold=64m",
        "--conf", "spark.driver.memory=24g",
        "--driver-java-options", "-Xms20g",
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.local.dir={os.path.join(work, 'spark-tmp')}",
        "--py-files", zpath,
        os.path.join(_REPO, "tools", "replay_job.py"),
        log_dir, base_path, table_dir, "32", str(repeats), stage,
    ]
    c0 = _cpu_snap()
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
    c1 = _cpu_snap()
    d = [y - x for x, y in zip(c0, c1)]
    tot = sum(d) or 1
    noise = {"steal_pct": round(100 * d[7] / tot, 2),
             "iowait_pct": round(100 * d[4] / tot, 2)}
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"replay_job at {cores} cores failed (rc={out.returncode}); "
            f"stderr tail:\n{out.stderr[-2000:]}"
        )
    shutil.rmtree(table_dir, ignore_errors=True)
    return {**json.loads(lines[-1]), **noise}


def build_scaled_wire_fixture(n_events_base: int = 1_000_000,
                              replicas: int = 8) -> tuple[str, str]:
    """The full reproducible protocol: seeded heavy-payload DDL-free log →
    wire format (JSON images, the Canal parse analog) → R× sharded
    key-space replication. Everything cached under .work."""
    import subprocess as sp

    from bench import ensure_fixture
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    typed_log, typed_base = ensure_fixture(sf_dir, n_events_base, ddl=False,
                                           min_tok=64, max_tok=256)
    src_root = os.path.dirname(typed_log)
    wire1 = os.path.join(_REPO, ".work", "wire1m_heavy")
    scaled = os.path.join(_REPO, ".work", f"wire{replicas}m_heavy")
    if not os.path.exists(os.path.join(scaled, "binlog", "log_manifest.json")):
        if not os.path.exists(os.path.join(wire1, "binlog", "log_manifest.json")):
            code = (
                "import sys, os, shutil;"
                "sys.path.insert(0, %r);"
                "from canal_spark.session import get_spark;"
                "from canal_spark.operators.decode import convert_log_to_wire;"
                "spark = get_spark('wire_convert');"
                "os.makedirs(%r, exist_ok=True);"
                "convert_log_to_wire(spark, %r, %r);"
                "shutil.copy(os.path.join(%r, 'log_manifest.json'), os.path.join(%r, 'log_manifest.json'));"
                "shutil.copy(%r, %r)"
            ) % (_REPO, os.path.join(wire1, "binlog"), typed_log,
                 os.path.join(wire1, "binlog"), typed_log,
                 os.path.join(wire1, "binlog"), typed_base,
                 os.path.join(wire1, "base.parquet"))
            sp.run([sys.executable, "-c", code], check=True)
        sp.run([sys.executable, os.path.join(_REPO, "tools", "scale_fixture.py"),
                wire1, scaled, str(replicas)], check=True)
    return os.path.join(scaled, "binlog"), os.path.join(scaled, "base.parquet")


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    stage = sys.argv[3] if len(sys.argv) > 3 else "collapse"
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    log_dir, base_path = build_scaled_wire_fixture()
    zpath = make_pyfiles_zip()

    small = run_at(n_small, zpath, log_dir, base_path, repeats, stage)
    large = run_at(n_large, zpath, log_dir, base_path, repeats, stage)
    ratio = n_large / n_small
    eff = large["events_per_sec"] / (ratio * small["events_per_sec"])
    result = {
        "job": "tools/replay_job.py via spark-submit --py-files",
        "stage": stage,
        "input_events": small["events"],
        "cores_small": n_small, "sec_small": small["sec"],
        "eps_small": small["events_per_sec"],
        "cores_large": n_large, "sec_large": large["sec"],
        "eps_large": large["events_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "steal_small_pct": small["steal_pct"],
        "steal_large_pct": large["steal_pct"],
        "scratch": os.environ.get("SPARK_SCALE_LOCAL_DIR", "virtio-disk"),
        "target": ">=0.8 from N to 4N (BASELINE.json)",
    }
    print(json.dumps(result, indent=1))
    with open(os.path.join(_REPO, "BENCH_SCALING.md"), "a") as f:
        f.write(
            f"| {small['events']} ({stage}"
            f"{', tmpfs' if os.environ.get('SPARK_SCALE_LOCAL_DIR') else ''})"
            f" | local[{n_small}] {small['sec']}s "
            f"{small['events_per_sec']} ev/s | local[{n_large}] "
            f"{large['sec']}s {large['events_per_sec']} ev/s | "
            f"{round(eff, 3)} (steal {small['steal_pct']}/{large['steal_pct']}%) |\n"
        )


if __name__ == "__main__":
    main()
