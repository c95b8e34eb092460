"""Build the --py-files artifact for spark-submit (north_rule deployment):

    python scripts/package_pyfiles.py [out.zip]
    spark-submit --py-files otmt_spark.zip \\
        -m off_topic_memento_toolkit_spark.cli detect -i pages:... -o ...

Zips the package sources only (no tests/caches); deterministic entry order
and zeroed timestamps so the artifact is reproducible byte-for-byte."""

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "off_topic_memento_toolkit_spark"


def build(out_path: str) -> str:
    sources = []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for name in sorted(files):
            if name.endswith(".py"):
                full = os.path.join(root, name)
                sources.append((full, os.path.relpath(full, REPO)))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, rel in sources:
            info = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                zf.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "otmt_spark.zip")
    print(build(out), f"({len(zipfile.ZipFile(out).namelist())} modules)")
