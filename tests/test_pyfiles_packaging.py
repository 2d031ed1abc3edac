"""The documented cluster deployment is ``spark-submit --py-files
casualty_linking_spark.zip`` (run_pipeline.py docstring). That only works
if the package is zip-importable: no ``__file__``-relative data loads, no
import-time filesystem access outside the archive. Proven here by running
a mini pipeline in a subprocess whose ONLY path to the package is the zip.
"""

from __future__ import annotations

import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_package_runs_from_zip(tmp_path):
    zip_path = tmp_path / "casualty_linking_spark.zip"
    pkg = REPO / "casualty_linking_spark"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for f in sorted(pkg.rglob("*.py")):
            zf.write(f, f.relative_to(REPO))

    script = tmp_path / "drive.py"
    script.write_text(
        "import sys\n"
        # simulate --py-files: the zip is the only way to reach the package
        f"sys.path.insert(0, {str(zip_path)!r})\n"
        "import casualty_linking_spark\n"
        "assert casualty_linking_spark.__file__.startswith("
        f"{str(zip_path)!r}), casualty_linking_spark.__file__\n"
        "from casualty_linking_spark.session import get_spark\n"
        "from casualty_linking_spark import synth\n"
        "from casualty_linking_spark.plans.pipeline import Pipeline\n"
        "spark = get_spark(app_name='zip_smoke', cores=4)\n"
        # what --py-files does on a cluster: ship the zip to every python
        # worker and put it on their sys.path (pandas UDFs deserialize
        # package functions worker-side)
        f"spark.sparkContext.addPyFile({str(zip_path)!r})\n"
        "t = synth.transcripts_range(spark, 200)\n"
        f"n = Pipeline(spark, {str(tmp_path / 'kg')!r}, t).run().count()\n"
        "assert n > 0, n\n"
        "print('ZIP_OK', n)\n"
        "spark.stop()\n"
    )
    # clean environment: cwd outside the repo so the source tree can't shadow
    # the zip import
    out = subprocess.run(
        [sys.executable, str(script)],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ZIP_OK" in out.stdout
