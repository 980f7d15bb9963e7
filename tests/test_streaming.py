"""Streaming-vs-batch differential tests: each streaming operator run
with trigger(availableNow) over the events parquet must agree with its
batch twin on the same data."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_events(spark):
    from easy_alterator_spark.sources import load_table

    return load_table(spark, SF, "events").cache()


@pytest.fixture(scope="module")
def stream_events(spark):
    from easy_alterator_spark.streaming.events import read_events_stream

    return read_events_stream(spark, SF)


def drain(stream, name, mode="append"):
    from easy_alterator_spark.streaming.events import run_to_memory

    run_to_memory(stream, name, output_mode=mode)


class TestWindows:
    def test_tumbling_matches_batch(self, spark, batch_events, stream_events):
        from easy_alterator_spark.streaming.events import tumbling_counts

        drain(tumbling_counts(stream_events), "t_tumble", mode="complete")
        got = {
            (r["window_start"], r["event_type"]): (r["n"], r["sv"])
            for r in spark.table("t_tumble").collect()
        }
        want = {
            (r["d"], r["event_type"]): (r["n"], r["sv"])
            for r in batch_events.groupBy(
                F.date_trunc("day", "ts").alias("d"), "event_type"
            )
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
            .collect()
        }
        assert got == want

    def test_sliding_window_counts(self, spark, batch_events, stream_events):
        from easy_alterator_spark.streaming.events import sliding_user_activity

        drain(sliding_user_activity(stream_events), "t_slide", mode="complete")
        total = spark.table("t_slide").agg(F.sum("n_events")).collect()[0][0]
        # 2-day window sliding by 1 day: every event lands in exactly 2 windows
        assert total == 2 * batch_events.count()

    def test_session_matches_batch_sessionize(self, spark, batch_events, stream_events):
        from easy_alterator_spark.streaming.events import session_counts

        drain(session_counts(stream_events), "t_sess", mode="complete")
        got = spark.table("t_sess")
        # batch twin: lag-gap sessionization
        w = F.lag("ts").over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                "user_id"
            ).orderBy("ts")
        )
        b = (
            batch_events.withColumn("prev", w)
            .withColumn(
                "new_sess",
                (
                    F.col("prev").isNull()
                    | (F.unix_timestamp("ts") - F.unix_timestamp("prev") > 1800)
                ).cast("int"),
            )
            .withColumn(
                "sess_id",
                F.sum("new_sess").over(
                    __import__("pyspark.sql.window", fromlist=["Window"])
                    .Window.partitionBy("user_id")
                    .orderBy("ts")
                    .rowsBetween(-(1 << 31) + 1, 0)
                ),
            )
        )
        assert got.count() == b.select("user_id", "sess_id").distinct().count()
        assert got.agg(F.sum("n_events")).collect()[0][0] == batch_events.count()

    def test_dedup_within_watermark(self, spark, batch_events, stream_events):
        from easy_alterator_spark.streaming.events import dedup_within_watermark

        drain(dedup_within_watermark(stream_events), "t_dedup")
        # one batch, all data within watermark: equals batch distinct
        assert (
            spark.table("t_dedup").count()
            == batch_events.dropDuplicates(["user_id", "event_type"]).count()
        )

    def test_running_totals_stateful(self, spark, batch_events, stream_events):
        from easy_alterator_spark.streaming.events import running_user_totals

        drain(running_user_totals(stream_events), "t_state", mode="update")
        got = {
            r["user_id"]: (r["n_events"], r["total_value"])
            for r in spark.table("t_state").collect()
        }
        want = {
            r["user_id"]: (r["n"], r["tv"])
            for r in batch_events.groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2).alias("tv"),
            )
            .collect()
        }
        assert got == want


class TestStreamStaticJoin:
    def test_enrich_matches_batch(self, spark, batch_events, stream_events):
        from easy_alterator_spark.sources import load_table
        from easy_alterator_spark.streaming.events import enrich_with_customers

        customers = load_table(spark, SF, "customer")
        drain(
            enrich_with_customers(stream_events, customers),
            "t_enrich",
            mode="complete",
        )
        got = {
            (r["window_start"], r["segment"]): (r["n"], r["sv"])
            for r in spark.table("t_enrich").collect()
        }
        dim = customers.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
        want = {
            (r["d"], r["segment"]): (r["n"], r["sv"])
            for r in batch_events.join(dim, "user_id")
            .groupBy(F.date_trunc("day", "ts").alias("d"), "segment")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
            .collect()
        }
        assert got == want
        assert got, "enrichment join must match some users"


class TestStreamStreamJoin:
    def test_view_click_interval_join_matches_batch(
        self, spark, batch_events, stream_events
    ):
        from easy_alterator_spark.streaming.events import view_click_stream_join

        drain(view_click_stream_join(stream_events), "t_vc", mode="append")
        got = {
            (r["user_id"], r["click_id"], r["view_ts"])
            for r in spark.table("t_vc").collect()
        }
        views = batch_events.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
        )
        clicks = batch_events.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        want = {
            (r["c_user"], r["click_id"], r["view_ts"])
            for r in views.join(
                clicks,
                (F.col("v_user") == F.col("c_user"))
                & (F.col("view_ts") <= F.col("click_ts"))
                & (
                    F.col("view_ts")
                    >= F.col("click_ts") - F.expr("INTERVAL 1 hour")
                ),
            ).collect()
        }
        assert got == want
        assert got, "interval join must produce matches on this data"


class TestLatestWins:
    def test_latest_by_key_matches_batch(self, spark, batch_events, stream_events):
        from easy_alterator_spark.queries import QUERIES, load_all
        from easy_alterator_spark.streaming.events import latest_by_key_stream

        load_all()
        drain(latest_by_key_stream(stream_events), "t_latest", mode="complete")
        got = {
            r["user_id"]: (r["event_id"], r["event_type"], r["value"])
            for r in spark.table("t_latest").collect()
        }
        want = {
            r["user_id"]: (r["event_id"], r["event_type"], r["value"])
            for r in QUERIES["events_latest_by_key"](spark, SF).collect()
        }
        assert got == want


class TestIdempotentFileSink:
    def test_stream_to_files_equals_batch(self, spark, tmp_path):
        """availableNow drain through the idempotent foreachBatch sink:
        the landed files hold exactly the batch-mode rows."""
        from easy_alterator_spark.sources import load_table
        from easy_alterator_spark.streaming.events import read_events_stream
        from easy_alterator_spark.streaming.sinks import write_stream_idempotent

        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        stream = read_events_stream(spark, SF).select("event_id", "user_id")
        write_stream_idempotent(stream, out, ckpt)
        landed = spark.read.parquet(f"{out}/batch=*")
        want = load_table(spark, SF, "events").select("event_id", "user_id")
        assert sorted(r["event_id"] for r in landed.collect()) == sorted(
            r["event_id"] for r in want.collect()
        )

    def test_replayed_batch_does_not_duplicate(self, spark, tmp_path):
        """Calling the batch writer twice with the SAME batch_id (the
        crash-replay case foreachBatch is documented to produce) must
        leave one copy of the data."""
        from easy_alterator_spark.sources import load_table
        from easy_alterator_spark.streaming.sinks import idempotent_batch_writer

        out = str(tmp_path / "replay")
        df = load_table(spark, SF, "events").select("event_id").limit(50)
        w = idempotent_batch_writer(out)
        w(df, 7)
        w(df, 7)  # replay
        assert spark.read.parquet(f"{out}/batch=7").count() == 50

    def test_resume_processes_nothing_new(self, spark, tmp_path):
        """A second availableNow run against the same checkpoint sees
        no new input: offsets persist, files are not re-landed."""
        import os

        from easy_alterator_spark.streaming.events import read_events_stream
        from easy_alterator_spark.streaming.sinks import write_stream_idempotent

        out = str(tmp_path / "resume")
        ckpt = str(tmp_path / "ckpt2")
        stream = read_events_stream(spark, SF).select("event_id")
        write_stream_idempotent(stream, out, ckpt)
        dirs_before = sorted(os.listdir(out))
        write_stream_idempotent(
            read_events_stream(spark, SF).select("event_id"), out, ckpt
        )
        assert sorted(d for d in os.listdir(out) if d.startswith("batch=")) == [
            d for d in dirs_before if d.startswith("batch=")
        ]


class TestDedupIngest:
    def test_streaming_admission_matches_batch_probe(self, spark, tmp_path):
        """Two landing files drained through the streaming dedup gate
        must admit exactly the docs the batch probe admits, and a
        second run with the same checkpoint must be a no-op (offsets
        committed, no re-admission)."""
        from easy_alterator_spark.operators.dedup import (
            build_band_index,
            incremental_near_dup_pairs,
        )
        from easy_alterator_spark.sources import load_table
        from easy_alterator_spark.streaming.ingest import run_dedup_ingest

        db = "ea_ingest_test"
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        spark.sql(f"CREATE DATABASE {db}")
        docs = load_table(spark, SF, "documents")
        corpus = docs.filter(F.col("doc_id") < 300)
        incoming = docs.filter(F.col("doc_id") >= 300).select("doc_id", "text")
        build_band_index(corpus, f"{db}.ingest_idx")

        # land each batch as ONE FLAT parquet file (the file-stream
        # source lists the landing dir itself, not nested subdirs)
        import glob
        import os
        import shutil

        landing = str(tmp_path / "landing")
        os.makedirs(landing)
        for i, frag in enumerate(
            (
                incoming.filter(F.col("doc_id") < 400),
                incoming.filter(F.col("doc_id") >= 400),
            )
        ):
            tmp = str(tmp_path / f"stage{i}")
            frag.coalesce(1).write.parquet(tmp)
            (part,) = glob.glob(f"{tmp}/part-*.parquet")
            shutil.move(part, f"{landing}/f{i}.parquet")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        run_dedup_ingest(
            spark, landing, "doc_id long, text string", f"{db}.ingest_idx", out, ckpt
        )

        batch_pairs = incremental_near_dup_pairs(incoming, corpus)
        expect_rejected = {r["batch_doc_id"] for r in batch_pairs.collect()}
        expect_admitted = {
            r["doc_id"] for r in incoming.collect()
        } - expect_rejected

        admitted = {
            r["doc_id"]
            for r in spark.read.parquet(f"{out}/accepted/batch=*").collect()
        }
        rejected = {
            r["batch_doc_id"]
            for r in spark.read.parquet(f"{out}/rejected/batch=*").collect()
        }
        assert admitted == expect_admitted
        assert rejected == expect_rejected

        # drain again: checkpointed offsets -> no new batches, output
        # directories unchanged (exactly-once admission)
        run_dedup_ingest(
            spark, landing, "doc_id long, text string", f"{db}.ingest_idx", out, ckpt
        )
        admitted2 = {
            r["doc_id"]
            for r in spark.read.parquet(f"{out}/accepted/batch=*").collect()
        }
        assert admitted2 == admitted
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


class TestLmGateIngest:
    def test_streaming_lm_gate_matches_batch_scores(self, spark, tmp_path):
        """Documents drained through the streaming LM quality gate must
        admit exactly the docs the batch scorer admits at the same
        cutoff; unscoreable (short) docs are rejected with NULL."""
        import glob
        import os
        import shutil

        from easy_alterator_spark.operators.lm_score import (
            bigram_model,
            doc_bigrams,
            lm_score_against,
        )
        from easy_alterator_spark.sources import load_table
        from easy_alterator_spark.streaming.ingest import run_lm_gate

        docs = load_table(spark, SF, "documents")
        train = docs.filter(F.col("doc_id") < 30)
        incoming = docs.filter(F.col("doc_id") >= 30).select("doc_id", "text")
        # add one unscoreable doc to pin the NULL-reject path
        incoming = incoming.unionByName(
            spark.createDataFrame([(9999, "single")], "doc_id long, text string")
        )
        counts, contexts, vocab = (
            df.cache() for df in bigram_model(doc_bigrams(train))
        )

        landing = str(tmp_path / "landing")
        os.makedirs(landing)
        for i, frag in enumerate(
            (incoming.filter(F.col("doc_id") < 45),
             incoming.filter(F.col("doc_id") >= 45))
        ):
            tmp = str(tmp_path / f"stage{i}")
            frag.coalesce(1).write.parquet(tmp)
            (part,) = glob.glob(f"{tmp}/part-*.parquet")
            shutil.move(part, f"{landing}/f{i}.parquet")

        cutoff = 7.5
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        run_lm_gate(
            spark, landing, "doc_id long, text string",
            counts, contexts, vocab, out, ckpt, max_nll=cutoff,
        )

        accepted = {
            r.doc_id for r in spark.read.parquet(f"{out}/accepted").collect()
        }
        rejected = {
            r.doc_id: r.avg_nll
            for r in spark.read.parquet(f"{out}/rejected").collect()
        }
        batch_scores = {
            r.doc_id: r.avg_nll
            for r in lm_score_against(counts, contexts, vocab, incoming).collect()
        }
        want_accept = {d for d, s in batch_scores.items() if s <= cutoff}
        assert accepted == want_accept
        assert 9999 in rejected and rejected[9999] is None
        assert accepted.isdisjoint(rejected)
        assert accepted | set(rejected) == {
            r.doc_id for r in incoming.collect()
        }


class TestDriftGateIngest:
    def test_drifted_batch_quarantined_whole(self, spark, tmp_path):
        """A matching-distribution batch passes; a shifted batch is
        quarantined whole with its psi stamped; the stamped psi equals
        the batch psi_between computation."""
        import glob
        import os
        import shutil

        from easy_alterator_spark.operators.profile import (
            psi_between,
            value_histogram,
        )
        from easy_alterator_spark.sources import load_table
        from easy_alterator_spark.streaming.ingest import run_drift_gate

        docs = load_table(spark, SF, "documents")
        base_hist = value_histogram(
            docs.select("doc_id", "n_chars"), "n_chars", 50
        ).cache()
        base_hist.count()

        ok_batch = docs.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id", "n_chars"
        )
        drifted = docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id", (F.col("n_chars") + 5000).alias("n_chars")
        )
        # unmeasurable batch: every value_col is NULL -> empty
        # histogram -> quarantined with an explicit psi NULL verdict
        unmeasurable = spark.createDataFrame(
            [(10_000_001, None), (10_000_002, None)],
            "doc_id long, n_chars long",
        )

        landing = str(tmp_path / "landing")
        os.makedirs(landing)
        for i, frag in enumerate((ok_batch, drifted, unmeasurable)):
            tmp = str(tmp_path / f"stage{i}")
            frag.coalesce(1).write.parquet(tmp)
            (part,) = glob.glob(f"{tmp}/part-*.parquet")
            shutil.move(part, f"{landing}/f{i}.parquet")

        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        run_drift_gate(
            spark, landing, "doc_id long, n_chars long",
            base_hist, out, ckpt, max_psi=0.25, bin_width=50,
        )

        accepted = {
            r.doc_id for r in spark.read.parquet(f"{out}/accepted").collect()
        }
        quarantined = spark.read.parquet(f"{out}/quarantined").collect()
        assert accepted == {r.doc_id for r in ok_batch.collect()}
        assert {r.doc_id for r in quarantined} == {
            r.doc_id for r in drifted.collect()
        } | {10_000_001, 10_000_002}
        want_psi = psi_between(
            value_histogram(drifted, "n_chars", 50), base_hist
        ).collect()[0][0]
        for r in quarantined:
            if r.doc_id >= 10_000_000:
                assert r.psi is None
            else:
                assert r.psi == want_psi and r.psi > 0.25


class TestStateSizeContracts:
    """State-store row-count contracts (r9 verdict task 6): the batch
    side has a registry-wide no-global-window plan contract; this is
    the streaming equivalent. Each stateful twin is drained over >= 3
    micro-batches (time-ordered file splits, maxFilesPerTrigger=1) and
    every batch's stateOperators numRowsTotal must stay within its
    documented bound:

    - latest_by_key / running_user_totals: KEY CARDINALITY (one state
      row per user, forever — the materialized-view contract; no
      watermark, nothing evicted).
    - holt daily aggregate: key-cardinality at (user, day) grain.
    - view_click stream-stream join: WATERMARK WINDOW — both sides
      evict below watermark(2h) + gap(1h), so state is bounded by the
      view/click rows above the horizon, never the stream length.
    - session windows: WATERMARK WINDOW — closed sessions evict, so
      state rows <= events above watermark(1h) + gap(30m) horizon
      (each open-session state row contains >= 1 retained event).
    """

    N_SPLITS = 4

    @pytest.fixture(scope="class")
    def split_dir(self, tmp_path_factory):
        """sf0.001 events, sorted by ts, split into 4 contiguous
        time-ranged files (one micro-batch each under
        maxFilesPerTrigger=1; file source orders by mtime, so write
        them oldest-first)."""
        import time as _time

        import pyarrow.parquet as pq

        d = tmp_path_factory.mktemp("ev_splits")
        t = pq.read_table(f"{SF}/events.parquet")
        pdf = t.to_pandas().sort_values("ts").reset_index(drop=True)
        n = len(pdf)
        step = (n + self.N_SPLITS - 1) // self.N_SPLITS
        chunks = []
        for i in range(self.N_SPLITS):
            chunk = pdf.iloc[i * step : (i + 1) * step]
            import pyarrow as pa

            pq.write_table(
                pa.Table.from_pandas(chunk, schema=t.schema, preserve_index=False),
                str(d / f"part-{i}.parquet"),
            )
            _time.sleep(0.05)  # distinct mtimes -> deterministic order
            chunks.append(chunk)
        return str(d), chunks

    def _stream(self, spark, path):
        from easy_alterator_spark.streaming.events import _EVENTS_RAW_SCHEMA

        return (
            spark.readStream.schema(_EVENTS_RAW_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .format("parquet")
            .load(path)
        )

    def _drain_with_progress(self, stream, name, mode):
        """availableNow drain returning per-batch total state rows."""
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        progress = list(q.recentProgress)
        q.stop()
        out = []
        for p in progress:
            ops = p.get("stateOperators") or []
            if ops:
                out.append(sum(op["numRowsTotal"] for op in ops))
        return out

    def test_latest_by_key_state_bounded_by_keys(self, spark, split_dir):
        from easy_alterator_spark.streaming.events import latest_by_key_stream

        path, chunks = split_dir
        import pandas as pd

        n_users = pd.concat(chunks)["user_id"].nunique()
        rows = self._drain_with_progress(
            latest_by_key_stream(self._stream(spark, path)),
            "t_state_latest",
            "update",
        )
        assert len(rows) >= 3
        # bound: one state row per key, across EVERY micro-batch
        assert all(r <= n_users for r in rows), (rows, n_users)
        # and the final batch holds exactly the key count
        assert rows[-1] == n_users

    def test_running_totals_state_bounded_by_keys(self, spark, split_dir):
        from easy_alterator_spark.streaming.events import running_user_totals

        path, chunks = split_dir
        import pandas as pd

        n_users = pd.concat(chunks)["user_id"].nunique()
        rows = self._drain_with_progress(
            running_user_totals(self._stream(spark, path)),
            "t_state_running",
            "update",
        )
        assert len(rows) >= 3
        assert all(r <= n_users for r in rows), (rows, n_users)

    def test_holt_daily_state_bounded_by_user_days(self, spark, split_dir):
        path, chunks = split_dir
        import pandas as pd

        all_pdf = pd.concat(chunks)
        n_user_days = (
            all_pdf.assign(day=all_pdf["ts"].dt.date)[["user_id", "day"]]
            .drop_duplicates()
            .shape[0]
        )
        daily = (
            self._stream(spark, path)
            .groupBy("user_id", F.col("ts").cast("date").alias("day"))
            .agg(F.count("*").alias("n"))
        )
        rows = self._drain_with_progress(daily, "t_state_holt", "update")
        assert len(rows) >= 3
        assert all(r <= n_user_days for r in rows), (rows, n_user_days)
        assert rows[-1] == n_user_days

    @staticmethod
    def _horizon_bound(chunks, horizon_seconds, predicate=None):
        """Per-batch upper bound on retained rows: rows in batches
        <= b with ts >= (max ts of batches <= b-2) - horizon. The
        watermark advances at the END of a batch and state eviction
        applies it one micro-batch later (measured: state after batch
        b still holds rows only the end-of-b-1 watermark would evict),
        so the cutoff visible in batch b's numRowsTotal derives from
        the data through batch b-2."""
        import pandas as pd

        bounds = []
        for b in range(len(chunks)):
            got = pd.concat(chunks[: b + 1])
            if predicate is not None:
                got = got[predicate(got)]
            if b < 2:
                bounds.append(len(got))
                continue
            prev_max = pd.concat(chunks[: b - 1])["ts"].max()
            cutoff = prev_max - pd.Timedelta(seconds=horizon_seconds)
            bounds.append(int((got["ts"] >= cutoff).sum()))
        return bounds

    def test_view_click_join_state_bounded_by_watermark(
        self, spark, split_dir
    ):
        from easy_alterator_spark.streaming.events import (
            view_click_stream_join,
        )

        path, chunks = split_dir
        rows = self._drain_with_progress(
            view_click_stream_join(self._stream(spark, path)),
            "t_state_vc",
            "append",
        )
        assert len(rows) >= 3
        # watermark 2h + gap 1h horizon, both sides view/click only
        bounds = self._horizon_bound(
            chunks,
            3 * 3600,
            lambda df: df["event_type"].isin(["view", "click"]),
        )
        import pandas as pd

        total_vc = int(
            pd.concat(chunks)["event_type"].isin(["view", "click"]).sum()
        )
        for r, bound in zip(rows, bounds):
            assert r <= bound, (rows, bounds)
        # the bound itself must be doing real work: state never
        # approaches the full stream
        assert rows[-1] < 0.5 * total_vc

    def test_session_state_bounded_by_watermark(self, spark, split_dir):
        from easy_alterator_spark.streaming.events import session_counts

        path, chunks = split_dir
        rows = self._drain_with_progress(
            session_counts(self._stream(spark, path)),
            "t_state_sess",
            "append",
        )
        assert len(rows) >= 3
        # watermark 1h + session gap 30m horizon; every open-session
        # state row contains at least one retained event
        bounds = self._horizon_bound(chunks, 5400)
        import pandas as pd

        n_total = len(pd.concat(chunks))
        for r, bound in zip(rows, bounds):
            assert r <= bound, (rows, bounds)
        assert rows[-1] < 0.5 * n_total
