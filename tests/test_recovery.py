"""Streaming state-store recovery across query RESTARTS.

The production claim behind every stateful streaming operator here is
that state lives in Spark's checkpointed state store — so a stopped
flow resumes where it left off (faxe's equivalent: mnesia-persisted
node state + flow-ack replay). A memory-sink test never proves that;
this one stops a query, starts a NEW query object on the same
checkpoint, and requires cross-restart state to hold.
"""

import datetime

import pytest


def _t(m, s):
    return datetime.datetime(2024, 1, 1, 10, m, s)


def test_dedup_stream_state_survives_restart(spark, tmp_path):
    from faxe_spark.streaming.stateful import dedup_exact_stream

    src = tmp_path / "src"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    schema = "doc_id long, text string, ts timestamp"

    def run_once():
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
        q = (dedup_exact_stream(stream, watermark="1 hour")
             .writeStream.format("parquet")
             .option("path", str(out))
             .option("checkpointLocation", str(ck))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    spark.createDataFrame(
        [(1, "alpha beta", _t(0, 0)), (2, "gamma delta", _t(0, 10))],
        schema).repartition(1).write.parquet(str(src) + "/b1")
    run_once()

    spark.createDataFrame(
        [(3, "ALPHA  beta", _t(5, 0)),   # replay from BEFORE the restart
         (4, "epsilon zeta", _t(5, 10))],
        schema).repartition(1).write.parquet(str(src) + "/b2")
    run_once()                            # new query object, same checkpoint

    got = {r.doc_id for r in spark.read.parquet(str(out)).collect()}
    assert got == {1, 2, 4}, got          # 3 suppressed ACROSS the restart


def test_change_detect_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState state (the custom FSM lane) must reload
    from the checkpointed state store: the first value after restart
    equals the pre-restart last value, so it must NOT re-emit."""
    from faxe_spark.streaming import change_detect_stream

    src = tmp_path / "src"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    schema = "key bigint, ts timestamp, v double"

    def run_once():
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
        q = (change_detect_stream(stream, key_col="key", value_col="v")
             .writeStream.format("parquet")
             .option("path", str(out))
             .option("checkpointLocation", str(ck))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    spark.createDataFrame([(1, _t(0, 0), 10.0), (1, _t(0, 1), 12.0)],
                          schema).repartition(1).write.parquet(str(src) + "/b1")
    run_once()

    spark.createDataFrame([(1, _t(0, 2), 12.0),   # == pre-restart last
                           (1, _t(0, 3), 13.0)],
                          schema).repartition(1).write.parquet(str(src) + "/b2")
    run_once()

    vals = sorted((r.ts_ms, r.value)
                  for r in spark.read.parquet(str(out)).collect())
    assert [v for _, v in vals] == ["10.0", "12.0", "13.0"]  # no re-emit of 12


def test_exactly_once_sink_across_forced_failures(spark, tmp_path):
    """Brief r5 item 8: kill-and-resume the broker sink around BOTH
    failure points — after the broker write but before the checkpoint
    commit (the no-dup direction), and before the write (the no-loss
    direction) — and require the broker to hold the EXACT output
    multiset."""
    import json
    import threading

    from faxe_spark.sinks import embedded_broker_sink_exactly_once
    from faxe_spark.sources.embedded_broker import EmbeddedBroker

    src = tmp_path / "src"
    ck = tmp_path / "ck"
    schema = "doc_id long, text string"
    broker = EmbeddedBroker()

    def run_once(**inject):
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(src) + "/*"))
        q = embedded_broker_sink_exactly_once(
            stream, broker=broker, topic="out", checkpoint=str(ck),
            **inject)
        try:
            q.awaitTermination(120)
        except Exception:
            pass                       # the injected failure
        finally:
            q.stop()

    spark.createDataFrame([(1, "a"), (2, "b")], schema) \
        .repartition(1).write.parquet(str(src) + "/b1")
    # run 1: crash AFTER the broker write, BEFORE the checkpoint commit
    run_once(fail_after_publish=threading.Event())
    assert len(broker.messages("out")) == 2   # data reached the broker
    # run 2: clean resume — the replayed epoch must NOT re-publish
    run_once()
    assert len(broker.messages("out")) == 2, "duplicated on replay"

    spark.createDataFrame([(3, "c"), (4, "d")], schema) \
        .repartition(1).write.parquet(str(src) + "/b2")
    # run 3: crash BEFORE the write — nothing new lands
    run_once(fail_before_publish=threading.Event())
    assert len(broker.messages("out")) == 2
    # run 4: clean resume — the lost batch is recovered exactly once
    run_once()
    got = sorted(json.loads(m)["doc_id"] for m in broker.messages("out"))
    assert got == [1, 2, 3, 4], got
    broker.stop()


def test_exactly_once_db_sink_across_forced_failures(spark, tmp_path):
    """The DB edition of the exactly-once contract: epoch-guarded
    transactional inserts over the PG wire. Crash after the DB
    transaction -> the replay finds the epoch marker and inserts
    nothing (no-dup); crash before -> the replay lands the batch
    (no-loss). Exact multiset required."""
    import duckdb
    import threading

    from faxe_spark.sources.pgwire import (PGWireServer,
                                           postgre_sink_exactly_once)

    con = duckdb.connect()
    con.execute("CREATE TABLE sink_x(doc_id BIGINT, text VARCHAR)")
    con.execute("CREATE TABLE faxe_txn_log(epoch VARCHAR)")
    srv = PGWireServer(con)
    src, ck = tmp_path / "src", tmp_path / "ck"
    schema = "doc_id long, text string"

    def run_once(**inject):
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(src) + "/*"))
        q = postgre_sink_exactly_once(
            stream, host="127.0.0.1", port=srv.port, table="sink_x",
            checkpoint=str(ck), **inject)
        try:
            q.awaitTermination(120)
        except Exception:
            pass
        finally:
            q.stop()

    try:
        spark.createDataFrame([(1, "a"), (2, "b")], schema) \
            .repartition(1).write.parquet(str(src) + "/b1")
        run_once(fail_after_write=threading.Event())
        assert con.execute("SELECT count(*) FROM sink_x").fetchone()[0] == 2
        run_once()                                 # replay: no dup
        assert con.execute("SELECT count(*) FROM sink_x").fetchone()[0] == 2

        spark.createDataFrame([(3, "c"), (4, "d")], schema) \
            .repartition(1).write.parquet(str(src) + "/b2")
        run_once(fail_before_write=threading.Event())
        assert con.execute("SELECT count(*) FROM sink_x").fetchone()[0] == 2
        run_once()                                 # recover: no loss
        got = sorted(r[0] for r in
                     con.execute("SELECT doc_id FROM sink_x").fetchall())
        assert got == [1, 2, 3, 4], got
    finally:
        srv.stop()
        con.close()


def test_broker_sink_txn_scoped_per_stream(spark, tmp_path):
    """ADVICE r5 (medium): epoch ids restart at 0 per stream, so a bare
    epoch-keyed txn id made a SECOND stream publishing to the same
    topic collide with an already-committed txn and silently drop its
    batch. The txn id is now scoped by (topic, checkpoint): two streams
    with distinct checkpoints must BOTH land their epoch-0 batches."""
    import json

    from faxe_spark.sinks import embedded_broker_sink_exactly_once
    from faxe_spark.sources.embedded_broker import EmbeddedBroker

    schema = "doc_id long, text string"
    broker = EmbeddedBroker()

    def run_stream(subdir: str, ck: str, rows):
        src = tmp_path / subdir
        spark.createDataFrame(rows, schema).repartition(1) \
            .write.parquet(str(src))
        stream = (spark.readStream.schema(
            spark.read.parquet(str(src)).schema).parquet(str(src)))
        q = embedded_broker_sink_exactly_once(
            stream, broker=broker, topic="shared",
            checkpoint=str(tmp_path / ck))
        q.awaitTermination(120)
        q.stop()

    try:
        run_stream("s1", "ck1", [(1, "a"), (2, "b")])
        assert len(broker.messages("shared")) == 2
        # second, independent stream — same topic, fresh checkpoint,
        # epoch ids restart at 0: with the unscoped key this batch was
        # silently dropped as "already committed"
        run_stream("s2", "ck2", [(3, "c"), (4, "d")])
        got = sorted(json.loads(m)["doc_id"]
                     for m in broker.messages("shared"))
        assert got == [1, 2, 3, 4], got
    finally:
        broker.stop()


def test_incremental_dedup_compaction_across_restart(spark, tmp_path):
    """The continuous-crawl loop end-to-end (VERDICT r5 #6): stream
    dedups against a bucketed seen table + the watermark-horizon state
    store, stops, compacts its pending fingerprints into the table,
    and RESTARTS FROM THE SAME CHECKPOINT — a replay arriving after
    the horizon expired (state gone) must be caught by the compacted
    table, and only by it. Plan depth stays bounded: the seen side is
    always one bucketed table scan, never a per-batch union."""
    import shutil

    from faxe_spark.operators.dedup import (compact_pending_fps,
                                            compact_seen_fps)
    from faxe_spark.streaming.stateful import incremental_dedup_pipeline

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    pending = str(tmp_path / "pending")
    ck = str(tmp_path / "ck")
    tbl = "seen_fps_restart_e2e"
    schema = "doc_id long, text string, ts timestamp"

    def feed(name, rows):
        spark.createDataFrame(rows, schema).repartition(1) \
            .write.parquet(str(src / name))

    def run_once():
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
        q = incremental_dedup_pipeline(
            stream, seen_fps=spark.table(tbl), out_dir=out,
            pending_dir=pending, checkpoint_dir=ck, watermark="30 minutes")
        q.awaitTermination(120)
        q.stop()

    try:
        # the table exists (empty) from the start so the query plan
        # SHAPE is identical across the restart
        compact_seen_fps(
            spark.createDataFrame([], "fingerprint string"), tbl)

        # phase A: batch-internal dup + in-horizon replay
        feed("b1", [(1, "alpha beta", _t(0, 0)),
                    (2, "ALPHA   beta", _t(0, 10)),   # normalized dup of 1
                    (3, "gamma delta", _t(0, 20))])
        feed("b2", [(4, "alpha beta", _t(5, 0)),      # replay, in horizon
                    (5, "epsilon zeta", _t(5, 10))])
        run_once()
        got_a = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert 3 in got_a and 5 in got_a
        assert len(got_a & {1, 2}) == 1 and 4 not in got_a

        # between runs: fold pending fingerprints into the bucketed
        # table, then clear the absorbed pending epochs
        seen = compact_pending_fps(spark, pending, tbl)
        assert seen.count() == 3
        assert "Num Buckets" in "".join(
            str(r) for r in spark.sql(f"DESCRIBE EXTENDED {tbl}").collect())
        shutil.rmtree(pending)

        # phase B: SAME checkpoint. b3 advances the watermark past the
        # phase-A horizon; b3b runs AT that watermark, whose end-of-batch
        # eviction clears the phase-A state entries (watermark updates
        # and eviction both lag one batch — pinned by
        # test_streaming.test_dedup_stream_beyond_horizon_replay_is_fresh);
        # b4's replay of doc 1's content can then ONLY be caught by the
        # compacted table.
        noon = datetime.datetime(2024, 1, 1, 12, 0, 0)
        feed("b3", [(6, "theta iota", noon)])
        feed("b3b", [(9, "mu nu", noon + datetime.timedelta(minutes=5))])
        feed("b4", [(7, "alpha beta",                 # replay, beyond horizon
                     noon + datetime.timedelta(minutes=6)),
                    (8, "kappa lambda",
                     noon + datetime.timedelta(minutes=6, seconds=10))])
        run_once()
        got_b = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert {6, 8, 9} <= got_b and 7 not in got_b
        # pending after phase B holds exactly the phase-B fresh docs
        assert spark.read.parquet(pending).count() == 3
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__stage")


def test_minhash_dedup_pipeline_within_run_and_across_restart(spark, tmp_path):
    """Streaming NEAR-dup crawl dedup: a near-dup arriving a LATER
    micro-batch in the same run is caught via the pending epochs (the
    in-run state), and after stop -> compact -> restart a replay is
    caught via the compacted bucket table. Greedy first-arrival
    semantics throughout."""
    import shutil

    from faxe_spark.operators.dedup import compact_pending_fps
    from faxe_spark.streaming.stateful import minhash_dedup_pipeline

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    pending = str(tmp_path / "pending")
    ck = str(tmp_path / "ck")
    tbl = "minhash_buckets_e2e"
    schema = "doc_id long, text string"
    long = ("the quick brown fox jumps over the lazy dog "
            "again and again tonight")

    def feed(name, rows):
        spark.createDataFrame(rows, schema).repartition(1) \
            .write.parquet(str(src / name))

    def run_once():
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
        q = minhash_dedup_pipeline(
            stream, bucket_table=tbl, out_dir=out, pending_dir=pending,
            checkpoint_dir=ck, num_hashes=16, bands=2, shingle_n=1)
        q.awaitTermination(120)
        q.stop()

    try:
        feed("b1", [(1, long),
                    (2, long.replace("fox", "cat")),  # near-dup of 1
                    (3, "totally unrelated content with different words")])
        feed("b2", [(4, long),                        # replay, LATER batch:
                                                      # only pending catches it
                    (5, "fresh material unlike anything else so far")])
        run_once()
        got_a = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert got_a == {1, 3, 5}, got_a

        compact_pending_fps(spark, pending, tbl)
        shutil.rmtree(pending)

        feed("b3", [(6, long),                        # replay across restart:
                                                      # only the table catches it
                    (7, "yet another brand new document body here")])
        run_once()
        got_b = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert got_b == {1, 3, 5, 7}, got_b
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__stage")


def test_simhash_dedup_pipeline_restart(spark, tmp_path):
    """The hamming edition of the streaming crawl loop: within-run
    later-micro-batch near-dup caught via pending epochs; replay
    across restart caught via the compacted 2-column
    (fingerprint, simhash) bucket table."""
    import shutil

    from faxe_spark.operators.dedup import compact_pending_fps
    from faxe_spark.streaming.stateful import simhash_dedup_pipeline

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    pending = str(tmp_path / "pending")
    ck = str(tmp_path / "ck")
    tbl = "simhash_buckets_e2e"
    schema = "doc_id long, text string"
    long = ("the quick brown fox jumps over the lazy dog "
            "again and again tonight")

    def feed(name, rows):
        spark.createDataFrame(rows, schema).repartition(1) \
            .write.parquet(str(src / name))

    def run_once():
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
        q = simhash_dedup_pipeline(
            stream, bucket_table=tbl, out_dir=out, pending_dir=pending,
            checkpoint_dir=ck, bits=32, shingle_n=1, hamming_max=3)
        q.awaitTermination(120)
        q.stop()

    try:
        feed("b1", [(1, long),
                    (3, "totally unrelated content with different words")])
        feed("b2", [(4, long.replace("fox", "cat")),  # h=1: near-dup of 1,
                                                      # caught via pending
                    (5, "fresh material unlike anything else so far")])
        run_once()
        got_a = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert got_a == {1, 3, 5}, got_a

        compact_pending_fps(spark, pending, tbl,
                            cols=("fingerprint", "simhash"))
        shutil.rmtree(pending)

        feed("b3", [(6, long),                        # replay across restart:
                                                      # only the table catches it
                    (7, "yet another brand new document body here")])
        run_once()
        got_b = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert got_b == {1, 3, 5, 7}, got_b
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__stage")


def test_substring_scrub_pipeline_restart(spark, tmp_path):
    """Streaming crawl-time span scrubbing: a later micro-batch doc
    repeating an earlier micro-batch's region is scrubbed via pending
    epochs; after compaction + restart a replay is scrubbed via the
    bucketed gram table (same 1-column contract as the exact loop)."""
    import shutil

    from faxe_spark.operators.dedup import compact_pending_fps
    from faxe_spark.streaming.stateful import substring_scrub_pipeline

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    pending = str(tmp_path / "pending")
    ck = str(tmp_path / "ck")
    tbl = "scrub_grams_e2e"
    schema = "doc_id long, text string"
    shared = " ".join(f"s{i}" for i in range(12))

    def feed(name, rows):
        spark.createDataFrame(rows, schema).repartition(1) \
            .write.parquet(str(src / name))

    def run_once():
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
        q = substring_scrub_pipeline(
            stream, bucket_table=tbl, out_dir=out, pending_dir=pending,
            checkpoint_dir=ck, span_words=10)
        q.awaitTermination(120)
        q.stop()

    try:
        feed("b1", [(1, f"intro {shared} outro")])
        feed("b2", [(4, f"other words {shared}"),   # cut via pending
                    (5, "nothing shared with anything else here")])
        run_once()
        got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
        assert got[1].n_removed == 0
        assert got[4].n_removed == 12 and got[4].clean_text == "other words"
        assert got[5].n_removed == 0

        compact_pending_fps(spark, pending, tbl)
        shutil.rmtree(pending)

        feed("b3", [(6, f"replayed {shared} again"),  # cut via the table
                    (7, "fresh unrelated closing material")])
        run_once()
        got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
        assert got[6].n_removed == 12
        assert got[6].clean_text == "replayed again"
        assert got[7].n_removed == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__stage")


def test_embedding_dedup_pipeline_restart(spark, tmp_path):
    """The embedding crawl loop's streaming lane over the crafted 2D
    fixture (threshold 0.7 ~ 45.6deg): a near-dup of the SEED corpus
    drops via the index lists; a near-dup of an earlier MICRO-BATCH
    arrival drops via pending epochs; after compact_pending_vectors +
    restart, a replay drops via the folded lists table; far vectors
    survive throughout."""
    import shutil

    from faxe_spark.operators import ann_index as annix
    from faxe_spark.streaming.stateful import embedding_dedup_pipeline

    A = [1.0, 0.0]           # seed
    B = [0.8660254, 0.5]     # 30deg: near A
    E = [-1.0, 0.0]          # 180deg: fresh
    Fv = [-0.8660254, -0.5]  # 210deg: near E (30deg apart)
    G = [0.0, -1.0]          # 270deg: fresh
    H = [0.0, 1.0]           # 90deg: fresh (closest is B at 60deg ->
                             # cos 0.5 < 0.7)

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    pending = str(tmp_path / "pending")
    ck = str(tmp_path / "ck")
    name = "emb_crawl_e2e"
    schema = "vec_id long, embedding array<double>"

    def feed(fname, rows):
        spark.createDataFrame(rows, schema).repartition(1) \
            .write.parquet(str(src / fname))

    def run_once():
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
        q = embedding_dedup_pipeline(
            stream, index_name=name, out_dir=out, pending_dir=pending,
            checkpoint_dir=ck, threshold=0.7)
        q.awaitTermination(120)
        q.stop()

    try:
        seed = spark.createDataFrame([(1, A)], schema)
        annix.build_ivf_index(spark, seed, name=name, nlist=2,
                              quantize=True)
        feed("b1", [(10, B),      # near seed-A: drops via the index
                    (11, E)])     # fresh
        feed("b2", [(20, Fv),     # near b1's E: drops via PENDING
                    (21, G)])     # fresh
        run_once()
        got = {r.vec_id for r in spark.read.parquet(out).collect()}
        assert got == {11, 21}, got

        annix.compact_pending_vectors(
            spark, pending, annix.load_ann_index(spark, name))
        shutil.rmtree(pending)

        feed("b3", [(30, B),      # replay: drops via the FOLDED table
                    (31, H)])     # fresh
        run_once()
        got = {r.vec_id for r in spark.read.parquet(out).collect()}
        assert got == {11, 21, 31}, got
        # the folded table holds every observed vector exactly once
        idx = annix.load_ann_index(spark, name)
        import pyspark.sql.functions as F
        lists = spark.read.parquet(
            annix._table_path(spark, idx.lists_table))
        assert lists.count() == 5          # A,B,E,F,G (b3 still pending)
        assert lists.select("vec_id").distinct().count() == 5
    finally:
        annix.drop_ann_index(spark, name)


def test_host_cap_pipeline_within_run_and_across_restart(spark, tmp_path):
    """Streaming per-host crawl cap: a host reaching its cap in an
    EARLIER micro-batch blocks later in-run arrivals via the pending
    epochs, and after stop -> compact -> restart the compacted table
    enforces the same count — while hosts below cap keep admitting."""
    import shutil

    from faxe_spark.operators.dedup import compact_pending_fps
    from faxe_spark.streaming.stateful import host_cap_pipeline

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    pending = str(tmp_path / "pending")
    ck = str(tmp_path / "ck")
    tbl = "host_cap_tally_e2e"
    schema = "doc_id long, text string, host string"

    def feed(name, rows):
        spark.createDataFrame(rows, schema).repartition(1) \
            .write.parquet(str(src / name))

    def run_once():
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
        q = host_cap_pipeline(
            stream, bucket_table=tbl, out_dir=out, pending_dir=pending,
            checkpoint_dir=ck, cap=2, salt=4)
        q.awaitTermination(120)
        q.stop()

    try:
        feed("b1", [(1, "t", "v"), (2, "t", "v"), (3, "t", "v"),
                    (10, "t", "a")])          # v hits cap=2 in-batch
        feed("b2", [(4, "t", "v"),            # blocked via pending count
                    (11, "t", "a")])          # a reaches cap
        run_once()
        got_a = {r.doc_id: r.host_rank
                 for r in spark.read.parquet(out).collect()}
        assert got_a == {1: 1, 2: 2, 10: 1, 11: 2}, got_a

        compact_pending_fps(spark, pending, tbl)
        shutil.rmtree(pending)

        feed("b3", [(5, "t", "v"), (12, "t", "a"),  # both at cap via table
                    (20, "t", "b")])               # fresh host admits
        run_once()
        got_b = {r.doc_id: r.host_rank
                 for r in spark.read.parquet(out).collect()}
        assert got_b == {1: 1, 2: 2, 10: 1, 11: 2, 20: 1}, got_b
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__stage")


def test_crawl_pipeline_composed_three_state_families(spark, tmp_path):
    """The full crawl loop in ONE stream: per-host cap, exact dedup and
    span scrubbing each enforce their own state across micro-batches
    (pending epochs) AND across a restart (three compacted tables)."""
    import shutil

    from faxe_spark.operators.dedup import compact_pending_fps
    from faxe_spark.streaming.stateful import crawl_pipeline

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    root = str(tmp_path / "pending")
    ck = str(tmp_path / "ck")
    tables = {"cap": "crawl_cap_e2e", "fps": "crawl_fps_e2e",
              "grams": "crawl_grams_e2e"}
    schema = "doc_id long, text string, host string"

    def feed(name, rows):
        spark.createDataFrame(rows, schema).repartition(1) \
            .write.parquet(str(src / name))

    def run_once():
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
        q = crawl_pipeline(
            stream, cap=2, tables=tables, out_dir=out,
            pending_root=root, checkpoint_dir=ck, span_words=3)
        q.awaitTermination(180)
        q.stop()

    try:
        feed("b1", [(1, "alpha beta gamma delta", "v"),
                    (2, "alpha beta gamma delta", "v"),  # exact dup of 1
                    (3, "whatever text here now", "v"),  # v over cap
                    (10, "totally different words entirely", "a")])
        feed("b2", [(4, "fresh v content here", "v"),    # v at cap (1+2 kept)
                    (11, "totally different words entirely", "a"),  # replay
                    (12, "zz yy alpha beta gamma qq", "b")])  # shared span
        run_once()
        got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
        assert set(got) == {1, 10, 12}, set(got)
        assert got[1].clean_text == "alpha beta gamma delta"
        assert got[12].clean_text == "zz yy qq"       # span cut via pending
        assert got[12].n_removed == 3

        for stage, tbl in tables.items():
            compact_pending_fps(spark, f"{root}/{stage}", tbl)
        shutil.rmtree(root)

        feed("b3", [(5, "more v text arriving", "v"),   # blocked: cap table
                    (13, "zz yy alpha beta gamma qq", "b"),  # blocked: fps table
                    (14, "pp beta gamma delta rr", "c")])    # scrubbed: gram table
        run_once()
        got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
        assert set(got) == {1, 10, 12, 14}, set(got)
        assert got[14].clean_text == "pp rr"
        assert got[14].n_removed == 3
    finally:
        for tbl in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            spark.sql(f"DROP TABLE IF EXISTS {tbl}__stage")


def test_host_cap_pipeline_late_arrival_golden(spark, tmp_path):
    """Late-data golden (VERDICT r7 #9): the cap stage admits by
    ARRIVAL epoch (compacted table < pending epoch < in-batch id) —
    a document arriving in a LATER micro-batch competes there, so a
    host already at cap drops it even when its id would have beaten
    the kept docs had it arrived on time. No retroactive displacement:
    the kept set from earlier epochs is immutable."""
    from faxe_spark.streaming.stateful import host_cap_pipeline

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    schema = "doc_id long, text string, host string"

    def feed(name, rows):
        spark.createDataFrame(rows, schema).repartition(1) \
            .write.parquet(str(src / name))

    feed("b1", [(5, "t", "v"), (7, "t", "v")])     # v reaches cap=2
    feed("b2", [(1, "t", "v"),                     # LATE: smaller id, too late
                (20, "t", "b")])                   # fresh host admits
    read_schema = spark.read.parquet(str(src / "b1")).schema
    stream = (spark.readStream.schema(read_schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
    q = host_cap_pipeline(
        stream, bucket_table=None, out_dir=out,
        pending_dir=str(tmp_path / "pending"),
        checkpoint_dir=str(tmp_path / "ck"), cap=2, salt=4)
    q.awaitTermination(120)
    q.stop()
    got = {r.doc_id: r.host_rank for r in spark.read.parquet(out).collect()}
    # doc 1 is ABSENT: host v was capped by the earlier epoch's 5 and 7
    assert got == {5: 1, 7: 2, 20: 1}, got


def test_shard_append_pipeline_within_run_and_across_restart(spark, tmp_path):
    """Streaming append-stable shard layout: positions assigned in an
    EARLIER micro-batch are never renumbered by later epochs (pending
    counts offset them), and after stop -> compact_pending_counts ->
    restart the compacted n_shards-row table carries the offsets —
    the whole fold equals the batch shard_append fold, and epoch-1
    positions equal epoch-1 run alone (the append-stability
    contract)."""
    import shutil

    from faxe_spark.operators import trainprep as tp
    from faxe_spark.streaming.stateful import (compact_pending_counts,
                                               shard_append_pipeline)

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    pending = str(tmp_path / "pending")
    ck = str(tmp_path / "ck")
    tbl = "shard_counts_e2e"
    schema = "doc_id long, text string"
    epochs = [[(i, "t") for i in range(10)],
              [(i, "t") for i in range(10, 25)],
              [(i, "t") for i in range(25, 30)]]

    def feed(name, rows):
        spark.createDataFrame(rows, schema).repartition(1) \
            .write.parquet(str(src / name))

    def run_once():
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
        q = shard_append_pipeline(
            stream, bucket_table=tbl, out_dir=out, pending_dir=pending,
            checkpoint_dir=ck, n_shards=4)
        q.awaitTermination(120)
        q.stop()

    try:
        feed("b1", epochs[0])
        feed("b2", epochs[1])
        run_once()
        compact_pending_counts(spark, pending, tbl)
        shutil.rmtree(pending)
        feed("b3", epochs[2])
        run_once()

        got = {r.doc_id: (r.shard, r.shard_pos)
               for r in spark.read.parquet(out).collect()}

        # fold equality: the batch op over the same epoch split
        counts, want = None, {}
        for ep in epochs:
            appended, counts = tp.shard_append(
                spark.createDataFrame(ep, schema), counts, n_shards=4)
            for r in appended.collect():
                want[r.doc_id] = (r.shard, r.shard_pos)
        assert got == want

        # append stability: epoch-1 docs hold the positions epoch-1
        # alone assigns
        solo, _ = tp.shard_append(
            spark.createDataFrame(epochs[0], schema), None, n_shards=4)
        for r in solo.collect():
            assert got[r.doc_id] == (r.shard, r.shard_pos)

        # compacted state: bounded at n_shards rows, totals = docs seen
        # through the compaction point (epochs 1-2)
        crows = spark.table(tbl).collect()
        assert len(crows) <= 4
        assert sum(r._cnt for r in crows) == 25
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__stage")


def test_dsir_select_pipeline_fold_and_restart(spark, tmp_path):
    """Streaming frozen-weight DSIR selection (r10: the one crawl-loop
    member without a streaming form): 2 epochs in run 1, stop, restart
    with a 3rd — the folded best table equals the library fold AND the
    global one-shot top-k (fold == global, the id-tiebreak contract);
    no pending dir and no compaction step exist to operate."""
    import pyspark.sql.functions as F

    from faxe_spark.operators import trainprep as tp
    from faxe_spark.streaming.stateful import dsir_select_pipeline
    from faxe_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    wdf = tp.dsir_weights_flagged(docs, F.expr("lang = 'en'"), buckets=64)
    w = {int(r.bucket): int(r.lam) for r in wdf.collect()}
    epochs = [docs.filter("doc_id % 3 = 0"), docs.filter("doc_id % 3 = 1"),
              docs.filter("doc_id % 3 = 2")]

    src = tmp_path / "src"
    ck = str(tmp_path / "ck")
    tbl = "dsir_best_e2e"

    def feed(name, edf):
        edf.repartition(1).write.parquet(str(src / name))

    def run_once():
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
        q = dsir_select_pipeline(
            stream, best_table=tbl, checkpoint_dir=ck, weights=w,
            k=20, buckets=64)
        q.awaitTermination(120)
        q.stop()

    try:
        feed("b1", epochs[0])
        feed("b2", epochs[1])
        run_once()
        feed("b3", epochs[2])
        run_once()

        got = sorted((r.doc_id, r.score, r.rank)
                     for r in spark.table(tbl).collect())

        best = None
        for e in epochs:
            best = tp.dsir_select_incremental(e, best, weights=w, k=20,
                                              buckets=64)
        want = sorted((r.doc_id, r.score, r.rank)
                      for r in best.collect())
        assert got == want

        gl = tp.dsir_select_incremental(docs, None, weights=w, k=20,
                                        buckets=64)
        assert got == sorted((r.doc_id, r.score, r.rank)
                             for r in gl.collect())
        assert len(got) == 20
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__stage")


def test_dsir_select_pipeline_uncommitted_epoch_replay(spark, tmp_path):
    """A top-k fold is NOT idempotent under replay (a replayed epoch's
    rows would sit in the pool twice and a duplicated id could take
    two of the k slots) — the epoch watermark on the best table makes
    the replay a no-op: deleting the newest checkpoint commit and
    restarting must leave the fold == global, with no duplicate ids."""
    import glob
    import os

    import pyspark.sql.functions as F

    from faxe_spark.operators import trainprep as tp
    from faxe_spark.streaming.stateful import dsir_select_pipeline
    from faxe_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    wdf = tp.dsir_weights_flagged(docs, F.expr("lang = 'en'"), buckets=64)
    w = {int(r.bucket): int(r.lam) for r in wdf.collect()}

    src = tmp_path / "src"
    ck = str(tmp_path / "ck")
    tbl = "dsir_best_replay"

    def run_once():
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
        q = dsir_select_pipeline(
            stream, best_table=tbl, checkpoint_dir=ck, weights=w,
            k=20, buckets=64)
        q.awaitTermination(120)
        q.stop()

    try:
        docs.filter("doc_id % 3 = 0").repartition(1) \
            .write.parquet(str(src / "b1"))
        docs.filter("doc_id % 3 = 1").repartition(1) \
            .write.parquet(str(src / "b2"))
        run_once()
        # crash simulation: the newest epoch folded into the table but
        # its checkpoint commit never landed
        newest = max(glob.glob(ck + "/commits/*"),
                     key=lambda p: int(os.path.basename(p)))
        os.remove(newest)
        crc = os.path.join(os.path.dirname(newest),
                           f".{os.path.basename(newest)}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        docs.filter("doc_id % 3 = 2").repartition(1) \
            .write.parquet(str(src / "b3"))
        run_once()           # replays the uncommitted epoch -> no-op

        got = sorted((r.doc_id, r.score, r.rank)
                     for r in spark.table(tbl).collect())
        ids = [g[0] for g in got]
        assert len(ids) == len(set(ids)) == 20   # no duplicated slots
        gl = tp.dsir_select_incremental(docs, None, weights=w, k=20,
                                        buckets=64)
        assert got == sorted((r.doc_id, r.score, r.rank)
                             for r in gl.collect())
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__stage")


def test_shard_append_pipeline_restart_without_clearing_pending(
        spark, tmp_path):
    """ADVICE r9 (high): the crash-before-clear scenario the watermark
    exists for — compact_pending_counts ran but pending was NOT
    cleared before restart. The pipeline's seen assembly must filter
    pending to epochs ABOVE the watermark (already-absorbed epochs are
    in the counts table); a raw table ∪ all-pending union would count
    them twice and shift every new epoch's shard_pos base (gaps —
    fold != global). Same fold-equality oracle as the clean-loop test,
    minus the rmtree."""
    from faxe_spark.operators import trainprep as tp
    from faxe_spark.streaming.stateful import (compact_pending_counts,
                                               shard_append_pipeline)

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    pending = str(tmp_path / "pending")
    ck = str(tmp_path / "ck")
    tbl = "shard_counts_noclear"
    schema = "doc_id long, text string"
    epochs = [[(i, "t") for i in range(10)],
              [(i, "t") for i in range(10, 25)],
              [(i, "t") for i in range(25, 30)]]

    def feed(name, rows):
        spark.createDataFrame(rows, schema).repartition(1) \
            .write.parquet(str(src / name))

    def run_once():
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
        q = shard_append_pipeline(
            stream, bucket_table=tbl, out_dir=out, pending_dir=pending,
            checkpoint_dir=ck, n_shards=4)
        q.awaitTermination(120)
        q.stop()

    try:
        feed("b1", epochs[0])
        feed("b2", epochs[1])
        run_once()
        compact_pending_counts(spark, pending, tbl)
        # NO rmtree(pending): absorbed epochs 0-1 still sit in pending
        feed("b3", epochs[2])
        run_once()

        got = {r.doc_id: (r.shard, r.shard_pos)
               for r in spark.read.parquet(out).collect()}

        counts, want = None, {}
        for ep in epochs:
            appended, counts = tp.shard_append(
                spark.createDataFrame(ep, schema), counts, n_shards=4)
            for r in appended.collect():
                want[r.doc_id] = (r.shard, r.shard_pos)
        assert got == want          # no double-counted position base
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__stage")


def test_compact_pending_counts_unreadable_dir_is_loud(spark, tmp_path):
    """ADVICE r9 (medium): only PATH_NOT_FOUND means 'nothing to
    absorb'. A pending path that exists but is not readable parquet
    must raise, not silently no-op (the documented compact -> clear
    loop would then delete the real pending rows)."""
    import pytest

    from faxe_spark.streaming.stateful import compact_pending_counts

    bad = tmp_path / "pending"
    bad.mkdir()
    (bad / "epoch=0").mkdir()
    (bad / "epoch=0" / "part-0.parquet").write_bytes(b"not parquet")
    tbl = "shard_counts_loud"
    try:
        with pytest.raises(Exception):
            compact_pending_counts(spark, str(bad), tbl)
        # genuinely-missing dir is still the quiet no-op lane
        t = compact_pending_counts(
            spark, str(tmp_path / "nonexistent"), tbl)
        assert t.count() == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__stage")


def test_watermark_pipelines_refuse_foreign_checkpoint_lineage(
        spark, tmp_path):
    """r10 hardening: on the same-checkpoint loop a replayed epoch can
    only be the FIRST uncommitted one (epochs commit sequentially), so
    an epoch BELOW the state table's watermark proves the table
    belongs to an older checkpoint lineage — a fresh checkpoint
    restarted epoch numbering at 0, and the old <= guard would have
    silently no-opped (dropped) the new run's early epochs. Both
    watermark pipelines must refuse loudly instead."""
    import pyspark.sql.functions as F
    import pytest

    from faxe_spark.operators import trainprep as tp
    from faxe_spark.streaming.stateful import (compact_pending_counts,
                                               dsir_select_pipeline,
                                               shard_append_pipeline)
    from faxe_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    src = tmp_path / "src"
    docs.repartition(1).write.parquet(str(src / "b1"))
    read_schema = spark.read.parquet(str(src / "b1")).schema

    # a counts table absorbed through epoch 2 (an older run's state)
    pend = str(tmp_path / "old_pending")
    spark.createDataFrame([(0, 5)], "shard long, _cnt long") \
        .write.parquet(f"{pend}/epoch=2")
    tbl = "shard_counts_foreign"
    best_tbl = "dsir_best_foreign"
    try:
        compact_pending_counts(spark, pend, tbl)

        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
        q = shard_append_pipeline(
            stream, bucket_table=tbl, out_dir=str(tmp_path / "out"),
            pending_dir=str(tmp_path / "pending"),
            checkpoint_dir=str(tmp_path / "ck_fresh"), n_shards=4)
        with pytest.raises(Exception, match="checkpoint lineage"):
            q.awaitTermination(120)
            raise AssertionError("foreign-lineage epoch 0 was accepted")
        q.stop()

        # dsir_select: a best table watermarked at 2, fresh checkpoint
        wdf = tp.dsir_weights_flagged(docs, F.expr("lang = 'en'"),
                                      buckets=32)
        w = {int(r.bucket): int(r.lam) for r in wdf.collect()}
        seed_best = tp.dsir_select_incremental(docs, None, weights=w,
                                               k=5, buckets=32)
        marked = seed_best.withColumn("_absorbed_through",
                                      F.lit(2).cast("long"))
        marked.write.mode("overwrite").saveAsTable(best_tbl)
        stream2 = (spark.readStream.schema(read_schema)
                   .option("maxFilesPerTrigger", 1)
                   .parquet(str(src) + "/*"))
        q2 = dsir_select_pipeline(
            stream2, best_table=best_tbl,
            checkpoint_dir=str(tmp_path / "ck_fresh2"), weights=w,
            k=5, buckets=32)
        with pytest.raises(Exception, match="checkpoint lineage"):
            q2.awaitTermination(120)
            raise AssertionError("foreign-lineage epoch 0 was accepted")
        q2.stop()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__stage")
        spark.sql(f"DROP TABLE IF EXISTS {best_tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {best_tbl}__stage")


def test_orphan_stage_is_loud_not_a_fresh_start(spark, tmp_path):
    """r10 review find: a crash between the staged rewrite's DROP and
    RENAME leaves the state's only copy under <table>__stage. Every
    reader that would treat the missing table as 'no state yet' must
    raise with the recovery hint instead — silently starting fresh
    would reset the fold AND let the next rewrite destroy the
    orphan."""
    import pytest

    from faxe_spark.operators.dedup import compact_pending_fps
    from faxe_spark.streaming.stateful import (_absorbed_through,
                                               _seen_state,
                                               compact_pending_counts)

    tbl = "orphan_counts"
    try:
        # simulate the crash: only the stage table exists
        spark.createDataFrame([(0, 3, 1)],
                              "shard long, _cnt long, _absorbed_through long") \
            .write.mode("overwrite").saveAsTable(f"{tbl}__stage")

        with pytest.raises(RuntimeError, match="RENAME TO"):
            _absorbed_through(spark, tbl)
        with pytest.raises(RuntimeError, match="RENAME TO"):
            _seen_state(spark, tbl, str(tmp_path / "nope"), 5,
                        ["shard", "_cnt"])
        with pytest.raises(RuntimeError, match="RENAME TO"):
            compact_pending_counts(spark, str(tmp_path / "nope"), tbl)
        with pytest.raises(RuntimeError, match="RENAME TO"):
            compact_pending_fps(spark, str(tmp_path / "nope"), tbl)

        # the documented recovery makes every reader whole again
        spark.sql(f"ALTER TABLE {tbl}__stage RENAME TO {tbl}")
        assert _absorbed_through(spark, tbl) == 1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__stage")


def test_empty_pending_dir_is_nothing_to_absorb(spark, tmp_path):
    """r10 review find: `rm -rf pending/*` (or an object store keeping
    the empty prefix) leaves the pending dir present but empty —
    UNABLE_TO_INFER_SCHEMA, not PATH_NOT_FOUND. All three pending
    readers must treat it as 'nothing pending', not crash the loop."""
    from faxe_spark.operators.dedup import compact_pending_fps
    from faxe_spark.streaming.stateful import (_pending_rows,
                                               compact_pending_counts)

    empty = tmp_path / "pending"
    empty.mkdir()
    tbl_c, tbl_f = "empty_pend_counts", "empty_pend_fps"
    try:
        assert _pending_rows(spark, str(empty), 3) is None
        t = compact_pending_counts(spark, str(empty), tbl_c)
        assert t.count() == 0
        t = compact_pending_fps(spark, str(empty), tbl_f)
        assert t.count() == 0
    finally:
        for t in (tbl_c, tbl_f):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            spark.sql(f"DROP TABLE IF EXISTS {t}__stage")


def test_pipeline_state_tables_feed_the_batch_fold(spark, tmp_path):
    """r10 review find (cross-surface interop): the streaming loops'
    persisted state tables carry _absorbed_through; feeding them back
    into the BATCH fold ops (shard_append's counts side,
    dsir_select_incremental's best side) must not union-mismatch."""
    import pyspark.sql.functions as F

    from faxe_spark.operators import trainprep as tp
    from faxe_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    e1 = docs.filter("doc_id % 2 = 0")
    e2 = docs.filter("doc_id % 2 = 1")

    # counts table as compact_pending_counts writes it (watermark col)
    _, c1 = tp.shard_append(e1, None, n_shards=4)
    c1_tbl = c1.withColumn("_absorbed_through", F.lit(0).cast("long"))
    a2, c2 = tp.shard_append(e2, c1_tbl, n_shards=4)
    _, c2_plain = tp.shard_append(e2, c1, n_shards=4)
    assert sorted(map(tuple, c2.collect())) == \
        sorted(map(tuple, c2_plain.collect()))
    assert a2.count() == e2.count()

    # best table as dsir_select_pipeline writes it (watermark col)
    wdf = tp.dsir_weights_flagged(docs, F.expr("lang = 'en'"), buckets=32)
    w = {int(r.bucket): int(r.lam) for r in wdf.collect()}
    b1 = tp.dsir_select_incremental(e1, None, weights=w, k=8, buckets=32)
    b1_tbl = b1.withColumn("_absorbed_through", F.lit(0).cast("long"))
    b2 = tp.dsir_select_incremental(e2, b1_tbl, weights=w, k=8,
                                    buckets=32)
    b2_plain = tp.dsir_select_incremental(e2, b1, weights=w, k=8,
                                          buckets=32)
    assert sorted(map(tuple, b2.collect())) == \
        sorted(map(tuple, b2_plain.collect()))


def test_compact_pending_counts_watermark_replay_safety(spark, tmp_path):
    """Review find: SUM state cannot absorb a re-delivered row, so the
    compaction carries an epoch watermark on every row (one atomic
    rename with the counts). Double-compacting the same pending dir is
    a no-op; a stale pending dir left by a crash-before-clear is
    skipped; and a fresh epoch above the watermark still sums."""
    from faxe_spark.streaming.stateful import (_absorbed_through,
                                               compact_pending_counts)

    pending = str(tmp_path / "pending")
    tbl = "shard_counts_wm"

    def feed(epoch, rows):
        spark.createDataFrame(rows, "shard long, _cnt long") \
            .write.mode("overwrite").parquet(f"{pending}/epoch={epoch}")

    try:
        feed(0, [(0, 3), (1, 2)])
        feed(1, [(0, 1)])
        t = compact_pending_counts(spark, pending, tbl)
        got = {r.shard: r._cnt for r in t.collect()}
        assert got == {0: 4, 1: 2}
        assert _absorbed_through(spark, tbl) == 1

        # crash-before-clear: the SAME pending dir compacts again -> no-op
        t = compact_pending_counts(spark, pending, tbl)
        assert {r.shard: r._cnt for r in t.collect()} == {0: 4, 1: 2}

        # a fresh epoch above the watermark sums; stale epochs skipped
        feed(2, [(1, 5)])
        t = compact_pending_counts(spark, pending, tbl)
        assert {r.shard: r._cnt for r in t.collect()} == {0: 4, 1: 7}
        assert _absorbed_through(spark, tbl) == 2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__stage")


def test_shard_append_pipeline_uncommitted_epoch_replay(spark, tmp_path):
    """The at-least-once boundary the watermark exists for (review
    find): an epoch whose pending counts landed but whose checkpoint
    commit did NOT (simulated by deleting the newest commit file) is
    summed at compaction and then REPLAYED on restart — the pipeline
    must no-op the replay (positions and counts stand exactly once),
    and a genuinely new epoch after it still appends correctly."""
    import glob
    import os
    import shutil

    from faxe_spark.operators import trainprep as tp
    from faxe_spark.streaming.stateful import (compact_pending_counts,
                                               shard_append_pipeline)

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    pending = str(tmp_path / "pending")
    ck = str(tmp_path / "ck")
    tbl = "shard_counts_replay"
    schema = "doc_id long, text string"
    epochs = [[(i, "t") for i in range(10)],
              [(i, "t") for i in range(10, 22)],
              [(i, "t") for i in range(22, 30)]]

    def feed(name, rows):
        spark.createDataFrame(rows, schema).repartition(1) \
            .write.parquet(str(src / name))

    def run_once():
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
        q = shard_append_pipeline(
            stream, bucket_table=tbl, out_dir=out, pending_dir=pending,
            checkpoint_dir=ck, n_shards=4)
        q.awaitTermination(120)
        q.stop()

    try:
        feed("b1", epochs[0])
        feed("b2", epochs[1])
        run_once()
        # crash simulation: the newest epoch's pending rows exist but
        # its checkpoint commit never landed
        newest = max(glob.glob(ck + "/commits/*"),
                     key=lambda p: int(os.path.basename(p)))
        os.remove(newest)
        crc = os.path.join(os.path.dirname(newest),
                           f".{os.path.basename(newest)}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        compact_pending_counts(spark, pending, tbl)
        shutil.rmtree(pending)

        feed("b3", epochs[2])
        run_once()           # replays the uncommitted epoch -> no-op
        got = {r.doc_id: (r.shard, r.shard_pos)
               for r in spark.read.parquet(out).collect()}

        counts, want = None, {}
        for ep in epochs:
            appended, counts = tp.shard_append(
                spark.createDataFrame(ep, schema), counts, n_shards=4)
            for r in appended.collect():
                want[r.doc_id] = (r.shard, r.shard_pos)
        assert got == want          # exactly once, no double-counted base

        crows = spark.table(tbl).collect()
        assert sum(r._cnt for r in crows) == 22   # epochs 1-2 compacted once
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__stage")


def test_dsir_select_pipeline_foreign_single_epoch_raises(spark, tmp_path):
    """VERDICT r10 #4: the watermark arithmetic cannot tell a FOREIGN
    best table with watermark 0 (old run folded exactly one epoch)
    from a legitimate replay of uncommitted epoch 0 — the identity
    stamp (checkpoint metadata uuid in TBLPROPERTIES) can. A fresh
    checkpoint against the old run's table must fail loudly instead of
    silently no-opping the new run's first epoch."""
    import pyspark.sql.functions as F

    from faxe_spark.operators import trainprep as tp
    from faxe_spark.streaming.stateful import (_table_lineage,
                                               dsir_select_pipeline)
    from faxe_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    wdf = tp.dsir_weights_flagged(docs, F.expr("lang = 'en'"), buckets=64)
    w = {int(r.bucket): int(r.lam) for r in wdf.collect()}

    src = tmp_path / "src"
    tbl = "dsir_best_foreign"

    def run_once(ck, glob_pat):
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(src) + "/" + glob_pat))
        q = dsir_select_pipeline(
            stream, best_table=tbl, checkpoint_dir=ck, weights=w,
            k=20, buckets=64)
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
        return q

    try:
        docs.filter("doc_id % 2 = 0").repartition(1) \
            .write.parquet(str(src / "b1"))
        run_once(str(tmp_path / "ckA"), "b1")     # old run: ONE epoch
        assert spark.table(tbl).selectExpr(
            "max(_absorbed_through)").collect()[0][0] == 0
        assert _table_lineage(spark, tbl) is not None   # stamped

        docs.filter("doc_id % 2 = 1").repartition(1) \
            .write.parquet(str(src / "b2"))
        with pytest.raises(Exception, match="lineage"):
            run_once(str(tmp_path / "ckB"), "b2")  # fresh checkpoint
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__stage")


def test_shard_append_compaction_stamps_lineage_and_guards(spark, tmp_path):
    """Same blind spot for the SUM fold: the counts table is written
    by the OFFLINE compactor, so compact_pending_counts(checkpoint_dir=)
    stamps the run's identity at the first compaction; a fresh
    checkpoint's run against that single-epoch table (watermark 0)
    then raises by identity. The stamp also survives a later
    lineage-less compaction (preserve-by-default in _staged_replace)."""
    import shutil

    from faxe_spark.streaming.stateful import (_table_lineage,
                                               compact_pending_counts,
                                               shard_append_pipeline)

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    pending = str(tmp_path / "pending")
    tbl = "shard_counts_foreign"
    schema = "doc_id long, text string"

    def feed(name, rows):
        spark.createDataFrame(rows, schema).repartition(1) \
            .write.parquet(str(src / name))

    def run_once(ck, glob_pat):
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(src) + "/" + glob_pat))
        q = shard_append_pipeline(
            stream, bucket_table=tbl, out_dir=out, pending_dir=pending,
            checkpoint_dir=ck, n_shards=4)
        try:
            q.awaitTermination(120)
        finally:
            q.stop()

    try:
        feed("b1", [(i, "t") for i in range(10)])
        run_once(str(tmp_path / "ckA"), "b1")     # old run: ONE epoch
        compact_pending_counts(spark, pending, tbl,
                               checkpoint_dir=str(tmp_path / "ckA"))
        stamp = _table_lineage(spark, tbl)
        assert stamp is not None
        assert spark.table(tbl).selectExpr(
            "max(_absorbed_through)").collect()[0][0] == 0
        shutil.rmtree(pending)

        # a later compaction WITHOUT checkpoint_dir preserves the stamp
        compact_pending_counts(spark, pending, tbl)
        assert _table_lineage(spark, tbl) == stamp

        feed("b2", [(i, "t") for i in range(10, 20)])
        with pytest.raises(Exception, match="lineage"):
            run_once(str(tmp_path / "ckB"), "b2")  # fresh checkpoint
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__stage")
