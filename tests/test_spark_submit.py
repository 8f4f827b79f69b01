"""Real ``spark-submit --py-files`` deployment e2e.

The north-star deployment is `spark-submit --py-files soda_core_spark.zip
cli.py ...` on a multi-executor cluster. Everything else in the suite
drives the engine in-process; this test proves the actual submission
path: the packaging zip is the SOLE import source (cwd is a scratch dir,
PYTHONPATH is stripped, the repo is not importable), the driver script is
a byte-copy of ``cli.py`` living outside the package, and the pipeline
summary must match an independent in-process run on the same input.
"""

import json
import os
import shutil
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from soda_core_spark.packaging import build_pyfiles_zip
from soda_core_spark.sources.webtext_gen import write_web_pages_parquet

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_zip_is_deterministic_and_complete(tmp_path):
    z1 = build_pyfiles_zip(str(tmp_path / "a.zip"))
    z2 = build_pyfiles_zip(str(tmp_path / "b.zip"))
    b1, b2 = open(z1, "rb").read(), open(z2, "rb").read()
    assert b1 == b2, "packaging zip must be byte-deterministic"
    import zipfile

    names = set(zipfile.ZipFile(z1).namelist())
    # every .py in the source tree is present under the package prefix
    pkg = os.path.join(REPO, "soda_core_spark")
    for root, dirs, files in os.walk(pkg):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                rel = os.path.relpath(os.path.join(root, f), pkg)
                assert os.path.join("soda_core_spark", rel) in names


def test_spark_submit_pyfiles_pipeline(tmp_path, spark):
    inp = write_web_pages_parquet(str(tmp_path / "in"), 400, seed=9)

    # expected keep decisions from an independent in-process run
    from soda_core_spark.operators.filter_pipeline import QualityFilterPipeline

    res = QualityFilterPipeline().run(
        spark.read.parquet(inp), output_path=str(tmp_path / "expected_out")
    )
    expected_kept = res.n_kept
    assert 0 < expected_kept < 400

    zip_path = build_pyfiles_zip(str(tmp_path / "soda_core_spark.zip"))
    driver = str(tmp_path / "driver.py")  # standalone script OUTSIDE the package
    shutil.copyfile(os.path.join(REPO, "soda_core_spark", "cli.py"), driver)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only import source
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            driver,
            "--input", inp,
            "--output", str(tmp_path / "out"),
            "--lineage", str(tmp_path / "lineage"),
        ],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    summary = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["n_docs"] == 400
    # identical decisions to the in-process engine — deployment must not
    # change semantics
    assert summary["n_kept"] == expected_kept

    # output and lineage tables landed (read via pyarrow: no Spark needed
    # to audit the artifact). The sink is partitionBy("keep"), so the kept
    # documents are exactly the keep=true partition directory.
    kept_rows = pq.read_table(
        str(tmp_path / "out" / "keep=true"), columns=["url"]
    ).num_rows
    assert kept_rows == expected_kept
    assert pq.read_table(str(tmp_path / "lineage")).num_rows > 0
