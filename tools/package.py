"""Build the ``--py-files`` artifact for cluster submission (north_rule:
"run via spark-submit --py-files on a multi-executor cluster at two cluster
sizes").

The zip contains the ``autoextract`` package only (no tests, no caches);
executors zipimport it, so the build is verified by importing the engine
from the zip exactly the way a worker would.

Usage::

    python tools/package.py [--out dist/autoextract_pyfiles.zip]

prints the artifact path plus the N and 4N spark-submit command lines the
scaling criterion is measured with.
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SUBMIT_TEMPLATE = """\
spark-submit \\
  --master yarn --deploy-mode cluster \\
  --num-executors {n} --executor-cores 4 --executor-memory 8g \\
  --conf spark.sql.adaptive.enabled=true \\
  --conf spark.sql.shuffle.partitions={parts} \\
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=16384 \\
  --py-files {zip} \\
  {repo}/autoextract/run.py --stage spans --source words \\
  --input s3://<bucket>/ocr_words/ --out s3://<bucket>/spans_out/ \\
  --n-buckets 512"""


def build_zip(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "autoextract_pyfiles.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg_root = os.path.join(REPO, "autoextract")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return out


def submit_commands(zip_path: str, n: int = 64) -> tuple[str, str]:
    """The two-cluster-size (N, 4N executors) submit lines the scaling
    efficiency criterion compares. shuffle.partitions scales with the
    executor count so reduce-side parallelism tracks the cluster."""
    lo = SUBMIT_TEMPLATE.format(n=n, parts=n * 8, zip=zip_path, repo=REPO)
    hi = SUBMIT_TEMPLATE.format(n=4 * n, parts=4 * n * 8, zip=zip_path, repo=REPO)
    return lo, hi


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--num-executors", type=int, default=64)
    args = p.parse_args()
    path = build_zip(args.out)
    lo, hi = submit_commands(path, args.num_executors)
    print(f"built {path}")
    print("\n# N executors:\n" + lo)
    print("\n# 4N executors:\n" + hi)


if __name__ == "__main__":
    main()
