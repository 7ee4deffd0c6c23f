"""North-rule packaging smoke: the engine must run via
``spark-submit --py-files dist/markdown_lab_spark.zip`` (BASELINE.json
north_rule / north_star "Packaged for spark-submit --py-files").

Runs the REAL spark-submit binary in a subprocess with the package
shipped only as the zip (cwd is a temp dir so the repo tree is not on
the driver's sys.path implicitly; --py-files is what makes the import
work on driver and executors alike).
"""

import os
import shutil
import subprocess
import sys
import tempfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_crawl_smoke():
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    import make_pyfiles  # noqa: PLC0415

    zip_path = make_pyfiles.main()
    with tempfile.TemporaryDirectory() as tmp:
        proc = subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--py-files", zip_path,
                os.path.join(ROOT, "scripts", "run_crawl.py"),
                "--generate-corpus", "2x30",
                "--max-waves", "2",
                "--rps", "100",
                "--checkpoint", os.path.join(tmp, "ckpt"),
            ],
            cwd=tmp,
            capture_output=True,
            text=True,
            timeout=420,
        )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "total URLs seen:" in proc.stdout
    n = int(proc.stdout.rsplit("total URLs seen:", 1)[1].split()[0])
    assert n > 0
