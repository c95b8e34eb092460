"""spark-submit entrypoint mirroring the reference's detect_off_topic CLI
(bin/detect_off_topic:13-134) plus the curation/dedup subcommands.

    spark-submit --py-files otmt_spark.zip -m off_topic_memento_toolkit_spark.cli \
        detect -i pages:/path/to/pages.parquet -o out.json -ot json \
        -tm cosine=0.12,wordcount

Threshold syntax ``-tm jaccard=0.80,cosine`` matches
otmt/argument_processing.py:34-66 (missing value → registry default).
"""

import argparse
import sys

from pyspark.sql import SparkSession

from .operators.measures import MEASURE_REGISTRY
from .plans.checkpoints import CheckpointStore
from .plans.pipeline import dedup_pipeline, detect_off_topic, story_pipeline
from .session import get_spark
from .sources.sinks import (
    save_as_csv,
    save_as_goldstandard,
    save_as_json,
    save_uri_list,
)


def parse_measures(spec: str):
    """'jaccard=0.80,cosine' → {'jaccard': 0.80, 'cosine': <default>}."""
    measures, thresholds = [], {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            name, value = part.split("=", 1)
            thresholds[name] = float(value)
        else:
            name = part
        if name not in MEASURE_REGISTRY:
            raise SystemExit(f"unknown measure {name!r}; "
                             f"supported: {sorted(MEASURE_REGISTRY)}")
        measures.append(name)
    return measures, thresholds


def _read_pages(spark: SparkSession, spec: str):
    """pages:<parquet>, warc:<glob of .warc/.warc.gz>, or
    collection:<reference working dir>; returns
    (pages, memento_access_errors_or_None)."""
    kind, _, path = spec.partition(":")
    if kind == "pages":
        return spark.read.parquet(path), None
    if kind == "warc":
        # the reference's flagship input (bin/detect_off_topic -i warc=...,
        # otmt/input_types.py:655-678); text is derived from html downstream
        # by prepare_pages' extract_text, exactly the reference's lazy
        # justext derive (otmt/collectionmodel.py:440-469)
        from pyspark.sql import functions as F

        from .sources.warc import read_warc_pages

        # lang is an input column per input_hint (SURVEY M3: langdetect is
        # seeded-random, parity not required) — null when ingesting raw WARC
        return read_warc_pages(spark, path).select(
            "url", "warc_ts", "html",
            F.lit(None).cast("string").alias("lang")), None
    if kind == "collection":
        from .sources.collection_dir import read_reference_collection

        store = read_reference_collection(spark, path)
        return store["pages"], store["errors"]
    raise SystemExit("input spec must be pages:<parquet path>, "
                     "warc:<warc glob>, or "
                     "collection:<reference working directory> "
                     "(network acquisition is out of scope per SURVEY S4-S6)")


def _read_consider(spark: SparkSession, consider_path):
    from pyspark.sql import functions as F

    # strip CR (CRLF files) and surrounding whitespace, drop blank lines:
    # a trailing \r would silently hash-mismatch every URI-M in the list
    return (
        spark.read.text(consider_path)
        .select(F.trim(F.regexp_replace("value", "\r", "")).alias("urim"))
        .filter(F.col("urim") != "")
    )


def _apply_consider(spark: SparkSession, pages, consider_path):
    """F4 consideration semi-filter at the pages level: derive urim from
    (url, warc_ts) and keep only listed mementos (bin/*:46-79; delegates to
    operators.curation.consider_only)."""
    if not consider_path:
        return pages
    from .operators.curation import consider_only
    from .operators.timeline import with_memento_identity

    return consider_only(
        with_memento_identity(pages), _read_consider(spark, consider_path)
    ).drop("urim", "urit")


def _make_store(spark, checkpoint_dir, catalog, run_id, required_by=None):
    """Checkpoint backend selection: ``--catalog cat[.namespace]`` → the
    Iceberg store (same snapshot contract; requires the runtime jar on the
    classpath), ``--checkpoint-dir`` → the parquet store, neither → None
    (or an error when the subcommand needs a store)."""
    if catalog and checkpoint_dir:
        raise SystemExit("pass either --checkpoint-dir or --catalog, "
                         "not both (and their --base-* twins likewise)")
    if catalog:
        from .plans.checkpoints import (
            IcebergCheckpointStore,
            iceberg_runtime_available,
        )

        if not iceberg_runtime_available(spark):
            raise SystemExit(
                "--catalog needs the Iceberg Spark runtime jar on the "
                "classpath (spark-submit --packages "
                "org.apache.iceberg:iceberg-spark-runtime-...)")
        cat, _, namespace = catalog.partition(".")
        return IcebergCheckpointStore(spark, cat, namespace or "otmt",
                                      run_id)
    if checkpoint_dir:
        return CheckpointStore(spark, checkpoint_dir, run_id)
    if required_by:
        raise SystemExit(
            f"{required_by} needs a checkpoint backend: pass "
            f"--base-checkpoint-dir (parquet) or --base-catalog (Iceberg)")
    return None


_SIG_PARAMS = ("num_perm", "bands", "shingle_words")


def _write_params_stage(spark, store, args):
    """Pin the signature hyperparameters into the checkpoint as a one-row
    `params` stage (works on both backends): an ingest with mismatched
    --num-perm/--bands/--shingle-words would compute delta band hashes in
    a DIFFERENT space than the stored base table and silently find zero
    base-delta duplicates."""
    if store is None or store.is_committed("params"):
        return
    row = [tuple(int(getattr(args, p)) for p in _SIG_PARAMS)]
    store.write(
        spark.createDataFrame(row, ", ".join(f"{p} int"
                                             for p in _SIG_PARAMS)),
        "params")


def _check_params_stage(store, args, command):
    if not store.is_committed("params"):
        print(f"warning: base checkpoint has no `params` stage (built by "
              f"an older dedup); cannot verify that --num-perm/--bands/"
              f"--shingle-words match the stored band table",
              file=sys.stderr)
        return
    stored = store.read("params").first()
    mismatches = [
        f"--{p.replace('_', '-')} {getattr(args, p)} != stored {stored[p]}"
        for p in _SIG_PARAMS if int(getattr(args, p)) != int(stored[p])
    ]
    if mismatches:
        raise SystemExit(
            f"{command}: signature parameters do not match the base "
            f"checkpoint's band table ({'; '.join(mismatches)}) — delta "
            f"hashes would live in a different space and find no "
            f"base-delta duplicates; pass the stored values")


def _check_promote_consistency(store):
    """O(1) mid-promote crash detection: promote writes docs first and
    clusters last, so any partial promote leaves their committed row
    counts unequal (each individual write is atomic; the four-stage
    sequence is not)."""
    docs_rows = store.marker("docs").get("rows")
    clusters_rows = store.marker("clusters").get("rows")
    if docs_rows is not None and clusters_rows is not None \
            and docs_rows != clusters_rows:
        raise SystemExit(
            f"base checkpoint is mid-promote inconsistent (docs has "
            f"{docs_rows} rows, clusters {clusters_rows}) — a previous "
            f"--promote crashed between stage commits; re-run the "
            f"interrupted ingest/takedown with the SAME batch plus "
            f"--repair to finish it (the re-ingest guards make the retry "
            f"converge)")


def _promote_stages_bucketed(store) -> bool:
    """True when every promote-mutated stage carries a bucketed layout —
    the row-level merge path (O(touched buckets) writes).  Legacy
    checkpoints written before bucketing fall back to full rewrites."""
    try:
        return all(store.marker(s).get("bucket_by")
                   for s in ("docs", "bands", "verified_edges", "clusters"))
    except Exception:  # noqa: BLE001 — missing marker → legacy path
        return False


def _pin_promote_frames(store, frames: dict) -> dict:
    """Pin EVERY frame a multi-stage promote will write, BEFORE the first
    write.  Two Iceberg hazards force this: (a) createOrReplace of a table
    the plan also scans is a self-referencing RTAS with runtime-dependent
    snapshot semantics, and (b) a later write's plan may scan a table an
    EARLIER write already replaced (Iceberg reads resolve at execution
    time, so e.g. the bands write would see the post-replace docs table
    and anti-join the whole batch away).  localCheckpoint materializes
    each plan against the PRE-promote state.  The parquet store is immune
    — its read() pins a version directory at call time — so frames pass
    through lazily there."""
    from .plans.checkpoints import IcebergCheckpointStore

    if isinstance(store, IcebergCheckpointStore):
        return {name: df.localCheckpoint() for name, df in frames.items()}
    return frames


def main(argv=None, spark=None):
    """``spark=None`` creates (and stops) its own session — the spark-submit
    path; tests pass their shared session, which is left running."""
    parser = argparse.ArgumentParser(prog="otmt-spark")
    sub = parser.add_subparsers(dest="command", required=True)

    detect = sub.add_parser("detect", help="off-topic detection")
    detect.add_argument("-i", "--input", required=True)
    detect.add_argument("-c", "--consider",
                        help="consideration list (text of URI-Ms, e.g. from "
                             "the filter subcommand); restricts processing "
                             "to the listed mementos (F4 broadcast "
                             "semi-join)")
    detect.add_argument("-o", "--output", required=True)
    detect.add_argument("-ot", "--output-type", default="json",
                        choices=["json", "csv", "goldstandard",
                                 "csv-dist", "json-dist"])
    detect.add_argument("-tm", "--timemap-measures", default="cosine")
    detect.add_argument("--offtopic-list")
    detect.add_argument("--ontopic-list")

    dedup = sub.add_parser("dedup", help="near-duplicate clustering at scale")
    dedup.add_argument("-i", "--input", required=True)
    dedup.add_argument("-c", "--consider",
                        help="consideration list (text of URI-Ms, e.g. from "
                             "the filter subcommand); restricts processing "
                             "to the listed mementos (F4 broadcast "
                             "semi-join)")
    dedup.add_argument("-o", "--output", required=True)
    dedup.add_argument("--checkpoint-dir")
    dedup.add_argument("--catalog",
                       help="Iceberg catalog[.namespace] checkpoint backend "
                            "(needs the runtime jar; same snapshot "
                            "contract as --checkpoint-dir)")
    dedup.add_argument("--run-id", default="run-0")
    dedup.add_argument("--num-perm", type=int, default=128)
    dedup.add_argument("--bands", type=int, default=32)
    dedup.add_argument("--shingle-words", type=int, default=5)
    dedup.add_argument("--min-jaccard", type=float, default=0.8)

    dedup.add_argument("--verify-method", default="jaccard",
                       choices=["jaccard", "lcs"])
    dedup.add_argument("--state-buckets", type=int, default=32,
                       help="hash buckets for the mutable corpus-state "
                            "stages (docs/bands/verified_edges/clusters); "
                            "ingest/takedown --promote then merge row-level"
                            ", rewriting only touched buckets — size so a "
                            "bucket is a few GB at your corpus scale")

    story = sub.add_parser("story", help="curation chain (dedup/slice/cluster/pick)")
    story.add_argument("-i", "--input", required=True)
    story.add_argument("-c", "--consider",
                        help="consideration list (text of URI-Ms, e.g. from "
                             "the filter subcommand); restricts processing "
                             "to the listed mementos (F4 broadcast "
                             "semi-join)")
    story.add_argument("-o", "--output", required=True)

    stats = sub.add_parser(
        "stats", help="training-data text screens: language-ID, quality "
                      "features, token counts, fingerprints")
    stats.add_argument("-i", "--input", required=True)
    stats.add_argument("-c", "--consider",
                        help="consideration list (text of URI-Ms, e.g. from "
                             "the filter subcommand); restricts processing "
                             "to the listed mementos (F4 broadcast "
                             "semi-join)")
    stats.add_argument("-o", "--output", required=True)
    stats.add_argument("--quality-only", action="store_true",
                       help="emit only rows passing the quality screens")

    filt = sub.add_parser(
        "filter", help="consideration-list builders: language select "
                       "(bin/select_by_language) and sequential near-dup "
                       "exclusion (bin/exclude_duplicates)")
    filt.add_argument("-i", "--input", required=True)
    filt.add_argument("-o", "--output", required=True,
                      help="directory of one-URI-M-per-line text parts "
                           "(feed back via a consideration join)")
    filt.add_argument("-l", "--language",
                      help="keep only mementos with this language")
    filt.add_argument("-c", "--consider",
                      help="consideration list (one URI-M per line): "
                           "restrict processing to the listed mementos; "
                           "with --exclude-duplicates this also switches "
                           "D1 to the reference's consideration branch "
                           "(first-seen simhash skip, "
                           "bin/exclude_duplicates:78-93)")
    filt.add_argument("--exclude-duplicates", action="store_true",
                      help="apply the D1 sequential simhash rule (without "
                           "-c: the plain lag compare, "
                           "bin/exclude_duplicates:95-106)")
    filt.add_argument("--threshold", type=float, default=0.2,
                      help="D1 hamming/64 threshold (default 0.2)")

    ingest = sub.add_parser(
        "ingest", help="incremental dedup: fold a NEW batch of pages into "
                       "an existing dedup checkpoint without reprocessing "
                       "history (delta-pruned candidates + contraction CC)")
    ingest.add_argument("-i", "--input", required=True,
                        help="the new batch (pages:/warc: input)")
    ingest.add_argument("--base-checkpoint-dir",
                        help="checkpoint dir of a prior `dedup "
                             "--checkpoint-dir` run (needs docs, bands, "
                             "clusters stages)")
    ingest.add_argument("--base-catalog",
                        help="Iceberg catalog[.namespace] holding the base "
                             "state instead of --base-checkpoint-dir")
    ingest.add_argument("--base-run-id", default="run-0")
    ingest.add_argument("-o", "--output", required=True,
                        help="merged (urim, component) parquet")
    ingest.add_argument("--checkpoint-dir",
                        help="the increment's own resumable stage dir")
    ingest.add_argument("--catalog",
                        help="Iceberg catalog[.namespace] for the "
                             "increment's own stages")
    ingest.add_argument("--run-id", default="inc-0")
    ingest.add_argument("--num-perm", type=int, default=128)
    ingest.add_argument("--bands", type=int, default=32)
    ingest.add_argument("--shingle-words", type=int, default=5)
    ingest.add_argument("--min-jaccard", type=float, default=0.8)
    ingest.add_argument("--repair", action="store_true",
                        help="bypass the mid-promote-inconsistency guard "
                             "when RE-RUNNING the interrupted batch (the "
                             "re-ingest guards make the retry converge)")
    ingest.add_argument("--promote", action="store_true",
                        help="commit merged docs/bands/clusters back to the "
                             "base checkpoint as new snapshot versions (the "
                             "next increment then runs against the updated "
                             "corpus; old versions stay time-travelable)")

    takedown = sub.add_parser(
        "takedown", help="delete documents from a deduped corpus and repair "
                         "only the affected clusters (bridge removals split; "
                         "labels re-derive from survivors)")
    takedown.add_argument("--base-checkpoint-dir",
                          help="checkpoint dir of a prior `dedup "
                               "--checkpoint-dir` run")
    takedown.add_argument("--base-catalog",
                          help="Iceberg catalog[.namespace] holding the "
                               "base state")
    takedown.add_argument("--base-run-id", default="run-0")
    takedown.add_argument("--remove", required=True,
                          help="text file/dir of URI-Ms to delete (one per "
                               "line — the filter subcommand's output "
                               "format)")
    takedown.add_argument("-o", "--output", required=True,
                          help="updated (urim, component) parquet")
    takedown.add_argument("--repair", action="store_true",
                          help="bypass the mid-promote-inconsistency guard "
                               "when re-running an interrupted promote")
    takedown.add_argument("--promote", action="store_true",
                          help="commit purged docs/bands and repaired "
                               "clusters back to the base checkpoint as new "
                               "snapshot versions (the actual data "
                               "deletion; old versions remain until "
                               "expire_snapshots)")

    metrics = sub.add_parser(
        "metrics", help="per-stage lineage/metrics from a checkpoint dir")
    metrics.add_argument("--checkpoint-dir", required=True)

    stream = sub.add_parser(
        "stream", help="structured-streaming ingest over a pages directory")
    stream.add_argument("-i", "--input", required=True,
                        help="pages parquet directory (file stream source)")
    stream.add_argument("-o", "--output", required=True)
    stream.add_argument("--checkpoint", required=True)
    stream.add_argument("--mode", default="dedup",
                        choices=["dedup", "rates", "signatures",
                                 "candidates"])
    stream.add_argument("--base-checkpoint-dir",
                        help="candidates mode: dedup checkpoint whose "
                             "`bands` stage is the static join side")
    stream.add_argument("--base-catalog",
                        help="candidates mode: Iceberg catalog holding the "
                             "base state")
    stream.add_argument("--base-run-id", default="run-0")
    stream.add_argument("--watermark", default="1 hour")
    stream.add_argument("--window", default="1 hour")
    stream.add_argument("--once", action="store_true",
                        help="availableNow trigger (drain and stop)")

    args = parser.parse_args(argv)

    if args.command == "metrics":
        # pure-filesystem command: no SparkSession needed
        import json as _json
        import os as _os

        from .plans.pipeline import pipeline_metrics

        if not _os.path.isdir(args.checkpoint_dir):
            raise SystemExit(
                f"no such checkpoint dir: {args.checkpoint_dir}")

        class _Root:
            root = args.checkpoint_dir

        print(_json.dumps(pipeline_metrics(_Root()), indent=2))
        return

    owns_session = spark is None
    if owns_session:
        spark = get_spark(f"otmt-spark-{args.command}")

    if args.command == "detect":
        measures, thresholds = parse_measures(args.timemap_measures)
        pages, access_errors = _read_pages(spark, args.input)
        pages = _apply_consider(spark, pages, args.consider)
        result = detect_off_topic(pages, measures=measures, thresholds=thresholds)
        scores = result["scores"]
        if access_errors is not None:
            from .operators.measures import with_error_kinds

            if args.consider:
                # the consideration contract covers error rows too
                from .operators.curation import consider_only

                access_errors = consider_only(
                    access_errors, _read_consider(spark, args.consider))
            scores = with_error_kinds(scores, memento_access=access_errors)
        if args.output_type == "json":
            save_as_json(scores, result["overall"], args.output,
                         meta=result["meta"])
        elif args.output_type == "csv":
            save_as_csv(scores, result["overall"], args.output,
                        meta=result["meta"])
        elif args.output_type == "csv-dist":
            from .sources.sinks import save_as_csv_distributed

            save_as_csv_distributed(scores, result["overall"], args.output,
                                    meta=result["meta"])
        elif args.output_type == "json-dist":
            from .sources.sinks import save_as_json_distributed

            save_as_json_distributed(scores, result["overall"], args.output,
                                     meta=result["meta"])
        else:
            save_as_goldstandard(result["overall"], args.output)
        if args.offtopic_list:
            save_uri_list(result["overall"], "off-topic", args.offtopic_list)
        if args.ontopic_list:
            save_uri_list(result["overall"], "on-topic", args.ontopic_list)

    elif args.command == "dedup":
        pages, _ = _read_pages(spark, args.input)
        pages = _apply_consider(spark, pages, args.consider)
        store = _make_store(spark, args.checkpoint_dir, args.catalog,
                            args.run_id)
        if store is not None and store.is_committed("params"):
            # a resumed run REUSES committed stages, so its effective
            # signature space is the first run's — flags that disagree
            # with the pinned params would silently mix band spaces
            _check_params_stage(store, args, "dedup (resume)")
        _write_params_stage(spark, store, args)
        clusters = dedup_pipeline(
            pages, store=store, num_perm=args.num_perm, bands=args.bands,
            shingle_words=args.shingle_words, min_jaccard=args.min_jaccard,
            verify_method=args.verify_method,
            input_scan_expensive=args.input.startswith("warc:"),
            state_buckets=args.state_buckets,
        )
        clusters.write.mode("overwrite").parquet(args.output)

    elif args.command == "ingest":
        from pyspark.sql import functions as F

        from .operators.incremental import incremental_dedup_update

        new_pages, _ = _read_pages(spark, args.input)
        base = _make_store(spark, args.base_checkpoint_dir,
                           args.base_catalog, args.base_run_id,
                           required_by="ingest")
        required_stages = ["docs", "bands", "clusters"]
        if args.promote:
            # the promoted state must stay takedown-ready: the increment's
            # verified edges are appended into the base evidence table
            required_stages.append("verified_edges")
        for required in required_stages:
            if not base.is_committed(required):
                raise SystemExit(
                    f"base checkpoint has no committed {required!r} stage — "
                    f"run `dedup --checkpoint-dir` over the corpus first")
        _check_params_stage(base, args, "ingest")
        if not args.repair:
            _check_promote_consistency(base)
        base_docs = base.read("docs")
        base_bands = base.read("bands")
        prior = base.read("clusters").select(
            F.xxhash64("urim").alias("nid"), "component")
        inc_store = _make_store(spark, args.checkpoint_dir,
                                getattr(args, "catalog", None), args.run_id)
        result = incremental_dedup_update(
            base_docs, base_bands, prior, new_pages, store=inc_store,
            num_perm=args.num_perm, bands=args.bands,
            shingle_words=args.shingle_words, min_jaccard=args.min_jaccard,
            input_scan_expensive=args.input.startswith("warc:"),
            with_delta=args.promote and _promote_stages_bucketed(base))
        # dropDuplicates guards the re-ingest case (a urim present in BOTH
        # base and batch would otherwise fan the join out to duplicate
        # output rows; the assignment itself already lists each id once)
        urims = base_docs.select("nid", "urim").unionByName(
            result["docs"].select("nid", "urim")).dropDuplicates(["nid"])
        merged = result["assignments"].join(urims, "nid") \
            .select("urim", "component")
        merged.write.mode("overwrite").parquet(args.output)
        if args.promote:
            # same guard for the promoted state: re-ingested ids must not
            # duplicate their docs/bands rows.  Each stage's known set is
            # derived from THAT stage's own table (base ∩ batch ids, found
            # map-only: broadcast semi over the base table, batch-sized
            # result) — NOT from docs alone: a crash between the docs and
            # bands commits leaves the batch present in docs but absent
            # from bands, and a docs-derived guard would make the --repair
            # rerun drop the batch's band rows forever (bands would then
            # silently miss every future near-dup against this batch).
            # Re-ingest content assumption: urim ≡ (url, warc_ts), so a
            # re-ingested id names the SAME capture and its payload is
            # assumed identical — the promote keeps the base's existing
            # docs/bands rows.  (The increment's own candidate/verify
            # stages use the new rows either way; see
            # operators/incremental.py's re-ingest rule.)
            batch_ids = result["docs"].select("nid").distinct()
            known_doc_ids = base_docs.select("nid").join(
                F.broadcast(batch_ids), "nid", "left_semi")
            fresh_docs = result["docs"].join(
                F.broadcast(known_doc_ids), "nid", "left_anti")
            known_band_ids = base_bands.select("id").join(
                F.broadcast(batch_ids.withColumnRenamed("nid", "id")),
                "id", "left_semi").distinct()
            fresh_bands = result["bands"].join(
                F.broadcast(known_band_ids), "id", "left_anti")
            # evidence table too — a later `takedown` repairs clusters from
            # verified_edges, and the delta's pairs must be in it or a
            # takedown inside the merged clusters would silently drop the
            # increment's connectivity.  ALL frames are pinned BEFORE the
            # first write: a later write's plan must never re-read a table
            # an earlier write already replaced.
            if _promote_stages_bucketed(base):
                # row-level merge path: each stage write touches only the
                # buckets the batch's keys hash into — the promote is
                # O(delta), never a corpus rewrite.  Order (docs first,
                # clusters last) preserves the mid-promote crash detector.
                frames = _pin_promote_frames(base, {
                    "docs": fresh_docs,
                    "bands": fresh_bands,
                    "verified_edges":
                        result["verified"].select("id_a", "id_b"),
                    # changed base labels + the batch — O(delta)
                    "clusters": result["assignments_delta"]
                        .join(urims, "nid").select("urim", "component"),
                })
                base.merge("docs", changes=frames["docs"],
                           insert_only=True)
                base.merge("bands", changes=frames["bands"],
                           insert_only=True)
                # insert-if-absent on the full pair key: a re-ingested
                # pair may be rediscovered and must not duplicate
                base.merge("verified_edges",
                           changes=frames["verified_edges"],
                           insert_only=True, on=["id_a", "id_b"])
                base.merge("clusters", changes=frames["clusters"])
            else:
                frames = _pin_promote_frames(base, {
                    "docs": base_docs.unionByName(fresh_docs),
                    "bands": base_bands.unionByName(fresh_bands),
                    "verified_edges":
                        base.read("verified_edges").select("id_a", "id_b")
                        .unionByName(result["verified"]
                                     .select("id_a", "id_b"))
                        .distinct(),
                    "clusters": merged,
                })
                for stage_name in ("docs", "bands", "verified_edges",
                                   "clusters"):
                    base.write(frames[stage_name], stage_name)
        # every consumer of the increment's stage frames has materialized;
        # release the storeless path's pins (no-op with --checkpoint-dir)
        result["unpersist"]()

    elif args.command == "takedown":
        from pyspark.sql import functions as F

        from .operators.incremental import incremental_remove

        base = _make_store(spark, args.base_checkpoint_dir,
                           args.base_catalog, args.base_run_id,
                           required_by="takedown")
        # the label repair itself reads only clusters + verified_edges;
        # docs/bands are touched (purged) only under --promote
        required_stages = ["verified_edges", "clusters"]
        if args.promote:
            required_stages += ["docs", "bands"]
        for required in required_stages:
            if not base.is_committed(required):
                raise SystemExit(
                    f"base checkpoint has no committed {required!r} stage — "
                    f"run `dedup --checkpoint-dir` over the corpus first")
        if not args.repair:
            # even a label-only repair reads clusters + verified_edges,
            # which a crashed promote leaves mutually inconsistent (edges
            # referencing nids the stale clusters never assigned); the
            # check needs the docs marker, present whenever dedup built
            # the checkpoint
            if base.is_committed("docs"):
                _check_promote_consistency(base)
        removed_urims = _read_consider(spark, args.remove)
        removed_nids = removed_urims.select(
            F.xxhash64("urim").alias("id")).distinct()
        clusters = base.read("clusters")
        assignments = clusters.select(
            F.xxhash64("urim").alias("id"), "component")
        # a deletion command must not silently no-op: report the match
        # rate, and hard-fail when NOTHING matched (stale list, wrong
        # file, or a formatting issue the trim did not cover)
        n_listed = removed_urims.count()
        n_matched = assignments.join(
            F.broadcast(removed_nids), "id", "left_semi").count()
        if n_listed and not n_matched:
            raise SystemExit(
                f"takedown: 0 of {n_listed} removal entries match any "
                f"document in the base clusters — nothing would be "
                f"deleted; check the list against the corpus URI-Ms")
        print(f"takedown: {n_matched} of {n_listed} removal entries "
              f"matched", file=sys.stderr)
        result = incremental_remove(
            assignments, base.read("verified_edges"), removed_nids,
            with_delta=True)
        updated = result["assignments"]
        id_to_urim = clusters.select(F.xxhash64("urim").alias("id"), "urim")
        merged = updated.join(id_to_urim, "id").select("urim", "component")
        merged.write.mode("overwrite").parquet(args.output)
        if args.promote:
            # the actual deletion: purge the document payloads and
            # signatures, not just the labels.  Dead edges MUST go too: an
            # edge with one deleted endpoint would, in a later takedown's
            # cluster repair, reconnect survivors through a ghost node
            # (incremental_remove assumes the edges table references only
            # live documents).
            if _promote_stages_bucketed(base):
                # row-level merge path: deletes + the repaired members'
                # relabels touch only their hash buckets — O(touched
                # clusters), never a corpus rewrite.  The dead-edge key
                # set is found with a map-only pass (broadcast semi-joins
                # on either endpoint; both endpoints of a verified edge
                # share a component, so the result is takedown-sized) —
                # the pair keys then localize the deletes to the id_a
                # buckets.
                edges_now = base.read("verified_edges")
                rm_a = removed_nids.withColumnRenamed("id", "id_a")
                rm_b = removed_nids.withColumnRenamed("id", "id_b")
                dead_edges = (
                    edges_now.join(F.broadcast(rm_a), "id_a", "left_semi")
                    .unionByName(
                        edges_now.join(F.broadcast(rm_b), "id_b",
                                       "left_semi"))
                    .select("id_a", "id_b").distinct()
                )
                frames = _pin_promote_frames(base, {
                    "clusters_delta": result["delta"]
                        .join(id_to_urim, "id").select("urim", "component"),
                    "dead_edges": dead_edges,
                    "removed_nids": removed_nids,
                    "removed_urims": removed_urims,
                })
                base.merge("docs",
                           delete_keys=frames["removed_nids"]
                           .withColumnRenamed("id", "nid"))
                base.merge("bands", delete_keys=frames["removed_nids"])
                base.merge("verified_edges",
                           delete_keys=frames["dead_edges"],
                           on=["id_a", "id_b"])
                base.merge("clusters", changes=frames["clusters_delta"],
                           delete_keys=frames["removed_urims"]
                           .select("urim"))
            else:
                purged_docs = base.read("docs").join(
                    F.broadcast(removed_urims), "urim", "left_anti")
                purged_bands = base.read("bands").join(
                    F.broadcast(removed_nids.withColumnRenamed("id", "nid")),
                    F.col("id") == F.col("nid"), "left_anti")
                purged_edges = (
                    base.read("verified_edges")
                    .join(F.broadcast(removed_nids
                                      .withColumnRenamed("id", "id_a")),
                          "id_a", "left_anti")
                    .join(F.broadcast(removed_nids
                                      .withColumnRenamed("id", "id_b")),
                          "id_b", "left_anti")
                )
                frames = _pin_promote_frames(base, {
                    "docs": purged_docs,
                    "bands": purged_bands,
                    "verified_edges": purged_edges,
                    "clusters": merged,
                })
                for stage_name in ("docs", "bands", "verified_edges",
                                   "clusters"):
                    base.write(frames[stage_name], stage_name)

    elif args.command == "stats":
        from pyspark.sql import functions as F

        from .operators.textstats import (
            exact_duplicates,
            fingerprint,
            language_id,
            quality_features,
            token_counts,
        )
        from .operators.timeline import prepare_pages

        pages, _ = _read_pages(spark, args.input)
        pages = _apply_consider(spark, pages, args.consider)
        enriched = prepare_pages(pages, need_raw_simhash=False,
                                 need_tf_simhash=False)
        docs = enriched.select("urim", "url", "warc_ts", "text")
        annotated = exact_duplicates(
            fingerprint(token_counts(quality_features(language_id(docs)))),
            order_col="urim",
        )
        if args.quality_only:
            annotated = annotated.filter(F.col("quality_ok"))
        annotated.drop("text").write.mode("overwrite").parquet(args.output)

    elif args.command == "filter":
        from .operators.curation import exclude_duplicates, select_by_language
        from .operators.measures import memento_metadata

        pages, _ = _read_pages(spark, args.input)
        if not args.language and not args.exclude_duplicates:
            raise SystemExit(
                "filter needs --language and/or --exclude-duplicates")
        # F4 coupling, as in the reference tools: -c restricts the memento
        # set first; for D1 it ALSO selects the consideration-branch
        # control flow below
        pages = _apply_consider(spark, pages, args.consider)
        if "text" not in pages.columns:
            # warc: frames carry (url, warc_ts, html, lang) only — text is
            # derived lazily from html by prepare_pages; align to the
            # input_hint shape so the selects below resolve on every input
            from pyspark.sql import functions as F

            pages = pages.withColumn("text", F.lit(None).cast("string"))
        if args.language:
            from pyspark.sql import functions as F

            # the table's lang column wins; rows without one (warc: inputs
            # carry lang=null) fall back to the language-ID heuristic over
            # extracted text — mirroring the reference's detected-language
            # select (bin/select_by_language reads langdetect output)
            from .operators.textstats import language_id
            from .operators.timeline import prepare_pages

            enriched = prepare_pages(pages, need_raw_simhash=False,
                                     need_tf_simhash=False)
            tagged = language_id(enriched)
            pages = tagged.withColumn(
                "lang", F.coalesce(F.col("lang"), F.col("lang_pred")))
            pages = select_by_language(pages, args.language)
        if args.exclude_duplicates:
            meta = memento_metadata(pages.select(
                "url", "warc_ts", "html", "text", "lang"))
            kept = exclude_duplicates(meta, threshold=args.threshold,
                                      first_seen_skip=bool(args.consider))
            kept.select("urim").write.mode("overwrite").text(args.output)
        else:
            from .operators.timeline import with_memento_identity

            with_memento_identity(
                pages.select("url", "warc_ts", "html", "text", "lang")
            ).select("urim").write.mode("overwrite").text(args.output)

    elif args.command == "stream":
        from .streaming.ingest import (
            build_streaming_enrichment,
            streaming_crawl_rates,
            streaming_sequential_dedup,
            write_signatures_stream,
        )

        enriched = build_streaming_enrichment(
            spark, args.input, watermark=args.watermark)
        if args.mode == "candidates":
            from .streaming.ingest import streaming_incremental_candidates

            base = _make_store(spark, args.base_checkpoint_dir,
                               args.base_catalog, args.base_run_id,
                               required_by="stream --mode candidates")
            if not base.is_committed("bands"):
                raise SystemExit(
                    "base checkpoint has no committed 'bands' stage — run "
                    "`dedup --checkpoint-dir` over the corpus first")
            # the delta's band hashes MUST live in the base table's
            # signature space: read the pinned hyperparameters from the
            # checkpoint (there is exactly one right answer, so no flags)
            sig = {}
            if base.is_committed("params"):
                stored = base.read("params").first()
                sig = {p: int(stored[p]) for p in _SIG_PARAMS}
            else:
                print("warning: base checkpoint has no `params` stage "
                      "(older dedup); assuming default signature "
                      "parameters — a non-default base yields zero "
                      "candidates", file=sys.stderr)
            out = streaming_incremental_candidates(
                enriched, base.read("bands"), **sig)
        elif args.mode == "dedup":
            out = streaming_sequential_dedup(enriched)
        elif args.mode == "rates":
            out = streaming_crawl_rates(enriched, window_duration=args.window)
            if args.once:
                print(
                    "note: append-mode windowed aggregation only emits "
                    "windows the watermark has passed — a bounded --once "
                    "drain withholds the trailing ~(watermark + window); "
                    "lower --watermark for bounded inputs.",
                    file=sys.stderr)
        else:
            query = write_signatures_stream(enriched, args.output,
                                            args.checkpoint, once=args.once)
            query.awaitTermination()
            if owns_session:
                spark.stop()
            return
        writer = (out.writeStream.format("parquet")
                  .option("path", args.output)
                  .option("checkpointLocation", args.checkpoint)
                  .outputMode("append"))
        if args.once:
            writer = writer.trigger(availableNow=True)
        query = writer.start()
        query.awaitTermination()

    elif args.command == "story":
        from .operators.curation import ranking_pins_scope
        from .operators.measures import memento_metadata
        pages, _ = _read_pages(spark, args.input)
        pages = _apply_consider(spark, pages, args.consider)
        # build + consume inside one owner scope: the ranking layout pinned
        # by slice_by_datetime is released once the write materializes, so
        # a long-lived session running many story batches never accumulates
        # pinned partitions
        with ranking_pins_scope():
            story_pipeline(memento_metadata(pages)) \
                .write.mode("overwrite").parquet(args.output)

    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
