"""north_rule deployment path: the job must run via spark-submit --py-files.

Builds the reproducible zip artifact (scripts/package_pyfiles.py), then runs
a REAL ``spark-submit --py-files otmt_spark.zip`` subprocess from an empty
working directory with no PYTHONPATH — the package can only come from the
zip — and drives the detect CLI end-to-end over a pages parquet."""

import csv
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from package_pyfiles import build  # noqa: E402

DRIVER = """\
import sys
from off_topic_memento_toolkit_spark.cli import main
main(sys.argv[1:])
"""


def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    from off_topic_memento_toolkit_spark.sources.datagen import generate_pages

    pages = generate_pages(spark, n_urls=4, mementos_per_url=3, skew=False,
                           error_rows=False)
    src = str(tmp_path / "pages")
    pages.write.parquet(src)

    zip_path = build(str(tmp_path / "otmt_spark.zip"))
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    out_csv = str(tmp_path / "scores.csv")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_MASTER"] = "from-submit"  # get_spark defers to submitted conf
    env["SPARK_DRIVER_MEM"] = "2g"
    proc = subprocess.run(
        ["spark-submit", "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path, str(driver),
         "detect", "-i", f"pages:{src}", "-o", out_csv,
         "-ot", "csv", "-tm", "wordcount"],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    with open(out_csv) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) > 0
    assert {r["Measurement Name"] for r in rows} == {"wordcount"}
    # generate_pages emits the n_urls sites plus fixed drift/tf fixtures
    assert len({r["URI-T"] for r in rows}) >= 4
    assert all(r["Overall Topic Status"] in ("on-topic", "off-topic")
               for r in rows)
