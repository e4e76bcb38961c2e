"""The literal north-rule deployment shape, end to end: `spark-submit
--py-files connectors_spark.zip tools/submit_build.py` in a FRESH JVM,
from a cwd OUTSIDE the repo so the package can only come from the zip.
(tests/test_sink_jobs.py drives the same main() in-process; this test
pins the packaging + child-JVM path itself.)"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this host")
def test_spark_submit_py_files_zip_builds_index(spark, tmp_path):
    from connectors_spark.synth import synth_transcripts

    synth_transcripts(spark, 60, seed=42, parallelism=2).write.mode(
        "overwrite").parquet(str(tmp_path / "transcripts"))

    zpath = tmp_path / "connectors_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "connectors_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    shutil.copy(os.path.join(REPO, "tools", "submit_build.py"),
                tmp_path / "submit_build.py")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=2",
         "--conf", "spark.ui.enabled=false",
         "--py-files", str(zpath), "submit_build.py",
         "--input", "transcripts", "--index", "idx_out",
         "--n-buckets", "4", "--shard-cap", "65536",
         "--jobs-dir", "jobs"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-3000:]

    # the main prints ONE json line with the completed job
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("{")][-1]
    result = json.loads(line)
    assert result["status"] == "completed"
    assert result["n_docs"] > 0

    # index landed with a manifest and is non-empty
    meta = json.load(open(tmp_path / "idx_out" / "meta.json"))
    assert meta["n_docs"] == result["n_docs"]
