"""spark-submit packaging gate (BASELINE.json north rule: the job runs
via `spark-submit --py-files` at two cluster sizes). This test builds the
real zip, then launches the REAL spark-submit binary from a scratch cwd —
so the package import genuinely resolves from the --py-files archive, not
the repo checkout — and checks the routed output and per-sink counts."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> "str | None":
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return p if os.path.exists(p) else None


@pytest.mark.parametrize("mode", ["batch"])
def test_spark_submit_py_files_flagship(spark, tmp_path, mode):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit binary not available")

    from trace_aware_reservoir_otel_spark.synth import generate_transcripts

    inp = str(tmp_path / "in.parquet")
    df = generate_transcripts(spark, n_convs=200, seed=42)
    df.write.mode("overwrite").parquet(inp)
    n_input = df.count()

    subprocess.run(
        ["sh", os.path.join(REPO, "scripts", "package.sh")],
        check=True,
        capture_output=True,
    )
    zip_path = os.path.join(REPO, "dist", "taro_spark.zip")
    assert os.path.exists(zip_path)

    out = str(tmp_path / "out")
    cfgf = str(tmp_path / "cfg.json")
    with open(cfgf, "w") as f:
        json.dump({"size_k": 5, "window_duration": "60s"}, f)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from --py-files
    env["PYSPARK_PYTHON"] = sys.executable
    res = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "run_flagship.py"),
            "--input", inp,
            "--out", out,
            "--mode", mode,
            "--config", cfgf,
        ],
        cwd=str(tmp_path),  # NOT the repo root
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    payload = json.loads(
        [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    )
    counts = payload["counts"]
    routed_total = sum(v for k, v in counts.items() if k != "metrics")
    assert routed_total == n_input  # conservation through the packaged job

    from trace_aware_reservoir_otel_spark.plans.commit import read_committed

    routed = read_committed(spark, f"{out}/routed")
    assert routed.count() == n_input
    assert {r["sink"] for r in routed.select("sink").distinct().collect()} <= {
        "sampled_traces", "overflow", "dlq",
    }
