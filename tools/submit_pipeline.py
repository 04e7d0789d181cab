"""spark-submit driver app for the flagship pipeline — the literal
north-rule deployment form:

    spark-submit --master <url> --py-files dist/ljspark_pyfiles.zip \
        tools/submit_pipeline.py <n_exec> <n_rows>

The package import below resolves from the --py-files zip (spark-submit
puts it on the driver's sys.path and ships it to executors); this
script deliberately does NOT sys.path.insert the repo, so running it
from any cwd proves the zip actually delivers the package. Prints one
JSON line: executors, wall, rows, turns/sec.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from logstash_integration_jdbc_spark.pipeline import (  # from --py-files zip
    PipelineConfig,
    run_pipeline,
)
from logstash_integration_jdbc_spark.session import get_spark
from logstash_integration_jdbc_spark.sources.generator import write_fixtures


def main() -> None:
    n_exec = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    # pre-generated inputs (bench --scaling-submit passes them so every
    # rep and both executor counts read IDENTICAL bytes); generated
    # in-app when absent so the script also runs standalone
    data = sys.argv[3] if len(sys.argv) > 3 else None
    warm = sys.argv[4] if len(sys.argv) > 4 else None
    master = os.environ.get("SPARK_GRAFT_MASTER", "spark://127.0.0.1:7077")
    spark = get_spark(
        app_name=f"submit-scale-{n_exec}x", master=master,
        extra_conf={
            "spark.cores.max": str(n_exec),
            "spark.executor.cores": "1",
            "spark.executor.memory": "2g",
            "spark.sql.shuffle.partitions": str(max(n_exec * 2, 8)),
            "spark.locality.wait": "0s",
        })
    spark.sparkContext.setLogLevel("ERROR")

    def one(n: int, path: str | None) -> tuple[float, int]:
        if path is None:
            path = tempfile.mkdtemp(prefix=f"submit-in-{n}-")
            write_fixtures(spark, path, n_rows=n)
        out = tempfile.mkdtemp(prefix=f"submit-out-{n}-")
        cfg = PipelineConfig(
            transcripts_path=f"{path}/transcripts.parquet",
            tool_dim_path=f"{path}/tool_dim.parquet",
            role_dim_path=f"{path}/role_dim.parquet",
            out_dir=out, checkpoint_path=os.path.join(out, "ckpt.json"),
            clean_run=True)
        t0 = time.time()
        m = run_pipeline(spark, cfg)
        return time.time() - t0, m["stages"]["scan"]["rows"]

    one(50_000, warm)  # JIT warm at steady executor count
    wall, rows = one(n_rows, data)
    print(json.dumps({
        "form": "spark-submit --py-files", "n_exec": n_exec,
        "wall_sec": round(wall, 2), "rows": rows,
        "turns_per_sec": round(rows / wall, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
