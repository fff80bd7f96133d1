"""spark-submit packaging (north rule: "the whole pipeline ships as
spark-submit --py-files packages").

build_zip() zips the `refined_spark` package into dist/refined_spark.zip;
jobs/run_pipeline.py is the submit entrypoint. On a real cluster:

    spark-submit --master yarn --deploy-mode cluster \
        --py-files dist/refined_spark.zip \
        jobs/run_pipeline.py --input <corpus_dir> --output <out_dir>

The sandbox smoke test (tests/test_spark_submit.py) runs the same command
against local[4] and the deterministic fixture corpus.
"""

from __future__ import annotations

import os
import zipfile


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str | None = None) -> str:
    """Zip the refined_spark package (sources only) for --py-files."""
    root = repo_root()
    pkg = os.path.join(root, "refined_spark")
    if out_path is None:
        out_path = os.path.join(root, "dist", "refined_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + ".part"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, root)
                zf.write(full, rel)
    os.replace(tmp, out_path)  # atomic, mirrors the reference's .part->rename
    return out_path


def spark_submit_bin() -> str:
    """Locate spark-submit from the active pyspark installation."""
    import shutil

    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
