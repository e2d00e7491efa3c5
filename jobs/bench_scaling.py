"""Two-cluster-size scaling evidence (north rule: efficiency >= 0.8
between N and 4N).

No real cluster exists in this sandbox, so the criterion is evidenced by
running the IDENTICAL spark-submit --py-files job on the same input at two
parallelism levels (local[8] = N and local[32] = 4N) and reporting
throughput at both plus efficiency = (T_4N / T_N) / 4. Results are written
to BENCH/BASELINE.md.

    python jobs/bench_scaling.py [--turns 4000000]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "ssimulacra2_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


def run_level(
    cores: int, zip_path: str, turns: int, convs: int, data_dir: str, buckets: int = 1024
) -> dict:
    local_dir = "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp"
    cmd = [
        "spark-submit",
        "--master",
        f"local[{cores}]",
        "--driver-memory",
        "24g",
        "--conf",
        f"spark.sql.shuffle.partitions={max(2 * cores, 16)}",
        "--conf",
        "spark.sql.adaptive.enabled=true",
        "--conf",
        "spark.sql.session.timeZone=UTC",
        "--conf",
        f"spark.local.dir={local_dir}",
        "--py-files",
        zip_path,
        os.path.join(REPO, "jobs", "suite_bench.py"),
        "--turns",
        str(turns),
        "--convs",
        str(convs),
        "--buckets",
        str(buckets),
        "--data-dir",
        data_dir,
    ]
    env = dict(
        os.environ,
        MALLOC_MMAP_THRESHOLD_="1073741824",
        MALLOC_TRIM_THRESHOLD_="1073741824",
        MALLOC_ARENA_MAX="4",
    )
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600, env=env)
    m = re.search(r"SUITE_BENCH_RESULT (\{.*\})", out.stdout)
    if not m:
        sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-5000:] + "\n")
        raise RuntimeError(f"bench at local[{cores}] produced no result")
    return json.loads(m.group(1))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--turns", type=int, default=4_000_000)
    p.add_argument("--n-cores", type=int, default=8)
    p.add_argument("--xn-cores", type=int, default=32)
    args = p.parse_args()
    convs = max(1000, args.turns // 100)

    zip_path = os.path.join(REPO, "BENCH", "engine.zip")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    build_zip(zip_path)

    import tempfile

    data_dir = tempfile.mkdtemp(prefix="bench_scaling_")
    # stage the input once (generation excluded from both timed runs),
    # then run the identical job at both levels, interleaved, best of 2 per
    # level (this sandbox VM has noisy-neighbor wall-clock variance; the
    # interleaving keeps both levels exposed to the same noise regime)
    run_level(args.xn_cores, zip_path, args.turns, convs, data_dir)  # warm + stage
    runs_n, runs_4n = [], []
    for _ in range(2):
        runs_n.append(run_level(args.n_cores, zip_path, args.turns, convs, data_dir))
        runs_4n.append(run_level(args.xn_cores, zip_path, args.turns, convs, data_dir))
    r_n = min(runs_n, key=lambda r: r["wall_s"])
    r_4n = min(runs_4n, key=lambda r: r["wall_s"])
    factor = args.xn_cores / args.n_cores
    eff = (r_4n["turns_per_s"] / r_n["turns_per_s"]) / factor

    all_rows = "\n".join(
        f"| {'N' if r['cores'] == args.n_cores else '4N'} | {r['cores']} | {r['wall_s']} | {r['turns_per_s']:,} |"
        for r in runs_n + runs_4n
    )
    md = f"""# BENCH/BASELINE — measured validation throughput & scaling

Job: `spark-submit --master local[C] --py-files engine.zip jobs/suite_bench.py`
(identical job + input at both levels; full check suite incl. multi-scale
drift scoring on a {args.turns:,}-turn deterministic synthetic pair with
injected violations and a hot-conversation skew slice).

Best-of-2 per level (interleaved; this sandbox VM shows noisy-neighbor
wall-clock variance — all raw runs listed below):

| cluster size | cores | wall s | validated turns/s |
|---|---|---|---|
| N  | {r_n['cores']} | {r_n['wall_s']} | {r_n['turns_per_s']:,} |
| 4N | {r_4n['cores']} | {r_4n['wall_s']} | {r_4n['turns_per_s']:,} |

**Scaling efficiency (throughput_4N / throughput_N) / {factor:.0f} = {eff:.3f}**
(north-rule criterion: >= 0.8)

All raw runs:

| level | cores | wall s | turns/s |
|---|---|---|---|
{all_rows}

Sandbox protocol per SURVEY §6: no multi-node cluster available, so the
two-cluster-size criterion is evidenced at two parallelism levels of the
same single-JVM runtime (local[{args.n_cores}] vs local[{args.xn_cores}]).
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out_path, "w") as f:
        f.write(md)
    print(json.dumps({"n": r_n, "xn": r_4n, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
