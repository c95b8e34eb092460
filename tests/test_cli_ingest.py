"""CLI `ingest` — incremental dedup over a prior `dedup --checkpoint-dir`
run: merged clusters equal a full-batch recompute, and `--promote` versions
the base state so a second increment chains."""

from pyspark.sql import functions as F

from off_topic_memento_toolkit_spark.cli import main
from off_topic_memento_toolkit_spark.plans.checkpoints import CheckpointStore
from off_topic_memento_toolkit_spark.plans.pipeline import dedup_pipeline
from off_topic_memento_toolkit_spark.queries import pages_from_documents

SF_DIR = "/root/testdata/sf0.001"


def _clusters(df):
    return {r.urim: r.component for r in df.collect()}


def test_cli_ingest_end_to_end(spark, tmp_path):
    pages = pages_from_documents(spark, SF_DIR)
    hour = F.unix_timestamp("warc_ts") / 3600
    base_pages = pages.filter(hour % 5 >= 2)        # ~3/5
    inc1_pages = pages.filter(hour % 5 == 0)        # ~1/5
    inc2_pages = pages.filter(hour % 5 == 1)        # ~1/5

    base_src = str(tmp_path / "base_pages")
    inc1_src = str(tmp_path / "inc1_pages")
    inc2_src = str(tmp_path / "inc2_pages")
    base_pages.write.parquet(base_src)
    inc1_pages.write.parquet(inc1_src)
    inc2_pages.write.parquet(inc2_src)

    ck = str(tmp_path / "ck")
    base_out = str(tmp_path / "base_clusters")
    # simhash channel off: the incremental path is the minhash one
    main(["dedup", "-i", f"pages:{base_src}", "-o", base_out,
          "--checkpoint-dir", ck], spark=spark)
    store = CheckpointStore(spark, ck)
    assert store.is_committed("bands")  # the new checkpointed band stage

    inc_out = str(tmp_path / "merged1")
    main(["ingest", "-i", f"pages:{inc1_src}", "--base-checkpoint-dir", ck,
          "-o", inc_out, "--checkpoint-dir", str(tmp_path / "ick1"),
          "--promote"], spark=spark)

    got = _clusters(spark.read.parquet(inc_out))
    want = _clusters(dedup_pipeline(
        base_pages.unionByName(inc1_pages), use_simhash_channel=False))
    assert got == want and len(got) > 0

    # --promote versioned the base state: docs/bands/clusters now at v2
    assert store.versions("clusters") == [1, 2]
    assert store.versions("bands") == [1, 2]

    # second increment chains against the promoted corpus
    inc2_out = str(tmp_path / "merged2")
    main(["ingest", "-i", f"pages:{inc2_src}", "--base-checkpoint-dir", ck,
          "-o", inc2_out, "--checkpoint-dir", str(tmp_path / "ick2")],
         spark=spark)
    got2 = _clusters(spark.read.parquet(inc2_out))
    want2 = _clusters(dedup_pipeline(pages, use_simhash_channel=False))
    assert got2 == want2


def test_cli_ingest_requires_base_stages(spark, tmp_path):
    import pytest

    src = str(tmp_path / "pages")
    pages_from_documents(spark, SF_DIR).limit(5).write.parquet(src)
    with pytest.raises(SystemExit, match="docs"):
        main(["ingest", "-i", f"pages:{src}",
              "--base-checkpoint-dir", str(tmp_path / "empty"),
              "-o", str(tmp_path / "out")], spark=spark)
