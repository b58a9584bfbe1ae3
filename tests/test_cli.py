"""CLI entry point (the reference's run_local harness equivalent)."""

import json

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.cli import main

from tests.tiers import deep

CSV = "Order ID,Amount,Order Date\n1,10.5,2024-01-15\n2,20.0,2024-02-20\n"


class TestCli:
    def test_run_command(self, spark, tmp_path, capsys):
        src = tmp_path / "sales.csv"
        src.write_text(CSV)
        rc = main(
            [
                "run",
                "--source",
                str(src),
                "--output",
                str(tmp_path / "out"),
                "--job-runs",
                str(tmp_path / "runs"),
            ]
        )
        assert rc == 0
        result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert result["status"] == "success"
        assert result["transform"]["rows_out"] == 2
        assert spark.read.parquet(str(tmp_path / "out")).count() == 2

    def test_sweep_empty_prefix_skips(self, tmp_path, capsys):
        (tmp_path / "landing").mkdir()
        rc = main(
            [
                "sweep",
                "--prefix",
                str(tmp_path / "landing"),
                "--output",
                str(tmp_path / "out"),
            ]
        )
        assert rc == 0
        result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert result["status"] == "skipped"

    def test_sql_command(self, capsys):
        rc = main(
            [
                "sql",
                "--sf-dir",
                "/root/testdata/sf0.001",
                "--query",
                "SELECT COUNT(*) AS n FROM region",
            ]
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["n"] == 5

    def test_status_command(self, spark, tmp_path, capsys):
        src = tmp_path / "sales.csv"
        src.write_text(CSV)
        assert (
            main(
                [
                    "run",
                    "--source", str(src),
                    "--output", str(tmp_path / "out"),
                    "--job-runs", str(tmp_path / "runs"),
                ]
            )
            == 0
        )
        capsys.readouterr()
        rc = main(
            [
                "status",
                "--job-runs", str(tmp_path / "runs"),
                "--output", str(tmp_path / "out"),
            ]
        )
        assert rc == 0
        report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert report["jobs_by_status"] == {"SUCCESS": 1}
        assert report["recent_jobs"][0]["status"] == "SUCCESS"
        assert report["output"]["exists"] and report["output"]["bytes"] > 0

    def test_clean_command_requires_force(self, tmp_path, capsys):
        target = tmp_path / "out"
        target.mkdir()
        (target / "f.parquet").write_bytes(b"x" * 10)
        # without --force: report + nonzero exit, nothing deleted
        assert main(["clean", "--path", str(target)]) == 1
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["status"] == "would_delete" and out["bytes"] == 10
        assert target.exists()
        # with --force: deleted
        assert main(["clean", "--path", str(target), "--force"]) == 0
        assert not target.exists()
        # absent path is a clean no-op
        assert main(["clean", "--path", str(target)]) == 0

    def test_clean_expired_tier_sweep(self, tmp_path, capsys):
        # lifecycle parity (reference config.yaml:35-37): files older
        # than the tier budget expire, younger survive, emptied
        # partition dirs are pruned; dry run without --force
        import os
        import time

        raw = tmp_path / "raw"
        (raw / "part=a").mkdir(parents=True)
        (raw / "part=b").mkdir(parents=True)
        old_f = raw / "part=a" / "old.parquet"
        new_f = raw / "part=b" / "new.parquet"
        old_f.write_bytes(b"x")
        new_f.write_bytes(b"y")
        stale = time.time() - 31 * 86400  # raw budget is 30 d
        os.utime(old_f, (stale, stale))

        # dry run: reported, nothing deleted
        assert main(["clean", "--expired", "--raw", str(raw)]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["raw"]["files_expired"] == 1
        assert rep["raw"]["expired"] == ["part=a/old.parquet"]
        assert rep["raw"]["dry_run"] and old_f.exists()

        # forced: old file gone, its emptied dir pruned, young survives
        assert main(["clean", "--expired", "--raw", str(raw), "--force"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["raw"]["files_expired"] == 1 and rep["raw"]["dirs_pruned"] == 1
        assert not old_f.exists() and not (raw / "part=a").exists()
        assert new_f.exists()

    def test_clean_expired_path_mode_needs_days(self, tmp_path, capsys):
        import pytest

        with pytest.raises(SystemExit):
            main(["clean", "--expired", "--path", str(tmp_path)])
        capsys.readouterr()
        assert (
            main(
                [
                    "clean",
                    "--expired",
                    "--path",
                    str(tmp_path),
                    "--days",
                    "7",
                    "--force",
                ]
            )
            == 0
        )
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["files_expired"] == 0

    def test_run_missing_source_fails(self, tmp_path, capsys):
        rc = main(
            ["run", "--source", str(tmp_path / "nope.csv"), "--output", str(tmp_path / "o")]
        )
        assert rc == 1
        result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert result["status"] == "failed"


class TestSnapCli:
    def test_snap_lifecycle(self, spark, tmp_path, capsys):
        from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable

        path = str(tmp_path / "snap_tbl")
        t = SnapTable(spark, path)
        t.write(spark.range(10), mode="overwrite")
        t.write(spark.range(10, 20), mode="append")

        assert main(["snap", "history", "--path", path]) == 0
        hist = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert [h["version"] for h in hist["history"]] == [1, 0]

        assert main(["snap", "compact", "--path", path]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["compacted"] >= 2

        assert main(["snap", "expire", "--path", path, "--keep-last", "1"]) == 0
        capsys.readouterr()

        # dry-run vacuum reports victims without deleting
        assert main(["snap", "vacuum", "--path", path, "--min-age-hours", "0"]) == 0
        dry = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert dry["dry_run"] is True and len(dry["removed"]) >= 1

        assert main(["snap", "vacuum", "--path", path, "--force", "--min-age-hours", "0"]) == 0
        wet = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert wet["dry_run"] is False
        assert SnapTable(spark, path).read().count() == 20


class TestSnapRestoreChangesCli:
    def test_restore_and_changes(self, spark, tmp_path, capsys):
        from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable

        path = str(tmp_path / "rc_tbl")
        t = SnapTable(spark, path)
        t.write(spark.range(3), mode="overwrite")
        t.write(spark.range(10, 12), mode="append")

        assert main(["snap", "changes", "--path", path, "--since", "0"]) == 0
        ch = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert ch == {"since": 0, "to": 1, "rows_added": 2}

        assert main(
            ["snap", "restore", "--path", path, "--to-version", "0"]
        ) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["restored_from"] == 0
        assert SnapTable(spark, path).read().count() == 3


class TestAnnCli:
    def test_ann_pq_with_rerank(self, spark, tmp_path, capsys):
        import random

        random.seed(2)
        rows = [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(64)]
        src = str(tmp_path / "emb")
        spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.parquet(src)
        qsrc = str(tmp_path / "q")
        spark.createDataFrame(rows[:2], "vec_id long, embedding array<float>").write.parquet(qsrc)
        out = str(tmp_path / "ann_out")
        rc = main([
            "ann", "--input", src, "--queries", qsrc, "--output", out,
            "--method", "pq", "--k", "5", "--rerank",
        ])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["status"] == "success" and res["result_rows"] == 10
        got = spark.read.parquet(out)
        assert set(got.columns) == {"query_id", "rank", "neighbor_id", "score"}
        # self is its own nearest neighbor with exact cosine 1.0
        top1 = {r.query_id: (r.neighbor_id, r.score)
                for r in got.filter("rank = 1").collect()}
        for q, (n, s) in top1.items():
            assert n == q and abs(s - 1.0) < 1e-6

    def test_ann_pq_model_persist_and_reuse(self, spark, tmp_path, capsys):
        import random

        random.seed(4)
        rows = [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(32)]
        src = str(tmp_path / "emb3")
        spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.parquet(src)
        model = str(tmp_path / "pq_model.json")
        rc = main(["ann", "--input", src, "--queries", src,
                   "--method", "pq", "--k", "3", "--model", model])
        assert rc == 0
        import os

        assert os.path.exists(model)           # trained + saved
        out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # second invocation loads the same model -> identical results
        out_path = str(tmp_path / "ann3")
        rc = main(["ann", "--input", src, "--queries", src,
                   "--method", "pq", "--k", "3", "--model", model,
                   "--output", out_path])
        assert rc == 0
        out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out1["result_rows"] == out2["result_rows"]

    def test_ann_brute(self, spark, tmp_path, capsys):
        rows = [(i, [float(i), 1.0]) for i in range(10)]
        src = str(tmp_path / "emb2")
        spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.parquet(src)
        rc = main(["ann", "--input", src, "--queries", src, "--k", "3"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["result_rows"] == 30


class TestCorpusCli:
    def _write_corpus(self, spark, tmp_path):
        path = str(tmp_path / "corpus")
        spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over that lazy dog today"),
                (2, "the quick brown fox jumps over that lazy dog today"),
                (3, "an entirely different document with its own words here"),
            ],
            "doc_id long, text string",
        ).write.parquet(path)
        return path

    def test_dedup_action(self, spark, tmp_path, capsys):
        src = self._write_corpus(spark, tmp_path)
        out = str(tmp_path / "deduped")
        rc = main(
            ["corpus", "dedup", "--input", src, "--output", out,
             "--method", "hash"]
        )
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert (res["rows_in"], res["rows_out"], res["rows_removed"]) == (3, 2, 1)
        assert spark.read.parquet(out).count() == 2

    def test_prepare_action(self, spark, tmp_path, capsys):
        """corpus prepare chains the stages: span dedup + hash dedup
        drop the planted duplicates in one invocation."""
        path = str(tmp_path / "prep_src")
        shared = " ".join(f"pb{i}" for i in range(10))
        spark.createDataFrame(
            [
                (1, "head one two three " + shared),
                (2, "tail four five six " + shared),   # span-dup of 1
                (3, "plain unique document body"),
                (4, "plain unique document body"),      # exact dup of 3
            ],
            "doc_id long, text string",
        ).write.parquet(path)
        out = str(tmp_path / "prep_out")
        rc = main([
            "corpus", "prepare", "--input", path, "--output", out,
            "--span-k", "8", "--method", "hash",
        ])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["status"] == "success"
        assert [st["stage"] for st in res["stages"]] == [
            "span_dedup[k=8]", "dedup[hash]",
        ]
        got = spark.read.parquet(out)
        texts = {r.doc_id: r.text for r in got.collect()}
        assert got.count() == 3                       # one exact dup gone
        assert sum(shared in t for t in texts.values()) == 1  # one span copy

    def test_span_dedup_action(self, spark, tmp_path, capsys):
        src = self._write_corpus(spark, tmp_path)
        out = str(tmp_path / "span_deduped")
        rc = main(
            ["corpus", "span-dedup", "--input", src, "--output", out,
             "--ngram", "8"]
        )
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert (res["rows_in"], res["rows_out"]) == (3, 3)  # edits, no drops
        texts = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
        # doc 1 and 2 share a 10-token text: the later copy is cut to empty
        assert sorted([texts[1], texts[2]])[0] == ""
        assert "different document" in texts[3]

    def test_decontam_action(self, spark, tmp_path, capsys):
        src = self._write_corpus(spark, tmp_path)
        bench = str(tmp_path / "bench")
        spark.createDataFrame(
            [(1, "quick brown fox jumps over")], "qid long, text string"
        ).write.parquet(bench)
        rc = main(
            ["corpus", "decontam", "--input", src, "--benchmark", bench,
             "--ngram", "5"]
        )
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["rows_out"] == 1  # docs 1 and 2 overlap the benchmark

    def test_decontam_requires_benchmark(self, spark, tmp_path, capsys):
        src = self._write_corpus(spark, tmp_path)
        assert main(["corpus", "decontam", "--input", src]) == 1

    def test_filter_and_report_actions(self, spark, tmp_path, capsys):
        src = self._write_corpus(spark, tmp_path)
        rc = main(["corpus", "filter", "--input", src, "--preset", "gopher"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # 10-word docs all fail the 50-word gopher floor
        assert res["rows_out"] == 0

        rc = main(["corpus", "report", "--input", src, "--preset", "gopher"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["qf_word_count_fail"] == 3 and rep["qf_pass_cnt"] == 0

    def test_tokenize_action(self, spark, tmp_path, capsys):
        src = self._write_corpus(spark, tmp_path)
        out = str(tmp_path / "tok")
        rc = main(
            ["corpus", "tokenize", "--input", src, "--output", out,
             "--merges", "20"]
        )
        assert rc == 0
        toks = spark.read.parquet(out)
        assert "bpe_tokens" in toks.columns and "bpe_tokens_cnt" in toks.columns
        assert toks.where("bpe_tokens_cnt <= 0").count() == 0


class TestScorerCli:
    def test_train_and_score(self, spark, tmp_path, capsys):
        good = (
            "the quick brown fox jumps over that lazy dog and keeps running "
            "with steady pace across the field of green grass to reach home "
            "before dark while birds have sung overhead and the evening light "
            "settles on the hills in amber bands that stretch to the west"
        )
        rows = [(i, good + f" tail{i % 9}") for i in range(30)] + [
            (100 + i, "buy now " * 15 + f"x{i}") for i in range(30)
        ]
        src = str(tmp_path / "docs")
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

        model_path = str(tmp_path / "model.json")
        rc = main(
            ["corpus", "train-scorer", "--input", src, "--model", model_path]
        )
        assert rc == 0
        trained = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert trained["n"] == 60 and trained["final_loss"] < trained["iterations"]

        out = str(tmp_path / "scored")
        rc = main(
            ["corpus", "score", "--input", src, "--model", model_path,
             "--output", out]
        )
        assert rc == 0
        scored = spark.read.parquet(out)
        assert "quality_prob" in scored.columns
        from pyspark.sql import functions as SF

        means = {
            r.g: r.p
            for r in scored.withColumn("g", SF.col("doc_id") < 100)
            .groupBy("g").agg(SF.avg("quality_prob").alias("p")).collect()
        }
        assert means[True] > means[False]

    def test_model_required(self, spark, tmp_path):
        src = str(tmp_path / "d2")
        spark.createDataFrame([(1, "x")], "doc_id long, text string").write.parquet(src)
        assert main(["corpus", "train-scorer", "--input", src]) == 1
        assert main(["corpus", "score", "--input", src]) == 1


class TestTakedownAndProbe:
    def test_takedown_literal_rules(self, spark, tmp_path, capsys):
        src = str(tmp_path / "td_corpus")
        spark.createDataFrame(
            [
                (1, "https://keep.com/a", "alpha"),
                (2, "http://bad.com/x", "beta"),
                (3, "https://keep.com/b", "erase me"),
            ],
            "doc_id long, url string, text string",
        ).write.parquet(src)
        out = str(tmp_path / "td_kept")
        import hashlib

        rc = main(
            ["corpus", "takedown", "--input", src, "--output", out,
             "--url-col", "url",
             "--block-url-pattern", "^http://",
             "--block-hash", hashlib.md5(b"erase me").hexdigest()]
        )
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["audit"]["removed"] == 2
        assert res["audit"]["matched_url_pattern_0"] == 1
        assert res["audit"]["matched_content_hashes"] == 1
        assert [r["doc_id"] for r in spark.read.parquet(out).collect()] == [1]

    def test_takedown_bulk_parquet_blocklist(self, spark, tmp_path, capsys):
        src = str(tmp_path / "td2_corpus")
        spark.range(10).withColumnRenamed("id", "doc_id").withColumn(
            "text", F.concat(F.lit("doc "), F.col("doc_id"))
        ).write.parquet(src)
        block = str(tmp_path / "blocklist")
        spark.createDataFrame([(2,), (5,), (7,)], "doc_id long").write.parquet(block)
        out = str(tmp_path / "td2_kept")
        rc = main(
            ["corpus", "takedown", "--input", src, "--output", out,
             "--block-ids", block]
        )
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["audit"]["matched_ids_bulk"] == 3
        assert spark.read.parquet(out).count() == 7

    def test_takedown_string_ids_literal(self, spark, tmp_path, capsys):
        # string doc_ids: 'abc123,def' used to be misrouted to
        # spark.read.parquet('abc123,def') (ADVICE r6) — now it falls
        # back to the literal-string-id path
        src = str(tmp_path / "td3_corpus")
        spark.createDataFrame(
            [("abc123", "a"), ("def", "b"), ("keep", "c")],
            "doc_id string, text string",
        ).write.parquet(src)
        out = str(tmp_path / "td3_kept")
        rc = main(
            ["corpus", "takedown", "--input", src, "--output", out,
             "--block-ids", "abc123,def"]
        )
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["audit"]["matched_ids"] == 2
        assert [r["doc_id"] for r in spark.read.parquet(out).collect()] == ["keep"]

    def test_takedown_explicit_blocklist_path(self, spark, tmp_path, capsys):
        src = str(tmp_path / "td4_corpus")
        spark.range(6).withColumnRenamed("id", "doc_id").write.parquet(src)
        block = str(tmp_path / "td4_block")
        spark.createDataFrame([(1,), (4,)], "doc_id long").write.parquet(block)
        out = str(tmp_path / "td4_kept")
        rc = main(
            ["corpus", "takedown", "--input", src, "--output", out,
             "--block-ids-path", block]
        )
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["audit"]["matched_ids_bulk"] == 2
        assert spark.read.parquet(out).count() == 4

    def test_takedown_no_rules_fails(self, spark, tmp_path, capsys):
        src = self._corpus(spark, tmp_path)
        rc = main(["corpus", "takedown", "--input", src])
        assert rc == 1
        assert "no takedown rules" in capsys.readouterr().out

    def _corpus(self, spark, tmp_path):
        path = str(tmp_path / "c")
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "doc_id long, text string"
        ).write.parquet(path)
        return path

    def test_probe_command(self, spark, tmp_path, capsys):
        from harness_aws_etl_pipeline_spark.operators.containers import (
            synthesize_mp3_media,
            synthesize_mp4_media,
        )

        docs = spark.range(1, 6).withColumnRenamed("id", "doc_id")
        src = str(tmp_path / "media")
        synthesize_mp4_media(docs).unionByName(
            synthesize_mp3_media(docs)
        ).write.parquet(src)
        out = str(tmp_path / "meta")
        rc = main(["probe", "--input", src, "--output", out])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["containers"] == {"mp4": 5, "mp3": 5}
        meta = spark.read.parquet(out)
        assert meta.filter(F.col("container") == "mp4").count() == 5

    def test_prepare_html_col(self, spark, tmp_path, capsys):
        src = str(tmp_path / "html_corpus")
        spark.createDataFrame(
            [(1, "<p>the quick brown fox jumps over the lazy dog</p>")],
            "doc_id long, html string",
        ).write.parquet(src)
        out = str(tmp_path / "html_kept")
        rc = main(
            ["corpus", "prepare", "--input", src, "--output", out,
             "--html-col", "html"]
        )
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["stages"][0]["stage"] == "html_extract"
        got = spark.read.parquet(out).collect()[0]["text"]
        assert got == "the quick brown fox jumps over the lazy dog"

    def test_warc_ingest(self, spark, tmp_path, capsys):
        from harness_aws_etl_pipeline_spark.sources.warc import (
            build_warc,
            http_response,
        )

        wdir = tmp_path / "crawl"
        wdir.mkdir()
        (wdir / "seg.warc.gz").write_bytes(
            build_warc(
                [
                    {"type": "response", "uri": "https://a.com/x",
                     "payload": http_response(b"<p>hello crawl</p>")},
                    {"type": "request", "uri": "https://a.com/x",
                     "payload": b"GET /x HTTP/1.1\r\n\r\n"},
                ],
                per_record_gzip=True,
            )
        )
        out = str(tmp_path / "docs")
        rc = main(["warc", "--input", str(wdir), "--output", out,
                   "--extract-text"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["record_types"] == {"response": 1}
        row = spark.read.parquet(out).collect()[0]
        assert row["text"] == "hello crawl"

    def test_ann_ivf_model_persist_and_reuse(self, spark, tmp_path, capsys):
        import random

        random.seed(7)
        cands = spark.createDataFrame(
            [(i, [random.random() for _ in range(8)]) for i in range(200)],
            "vec_id long, embedding array<double>",
        )
        qsrc = str(tmp_path / "ivf_queries")
        csrc = str(tmp_path / "ivf_cands")
        cands.write.parquet(csrc)
        cands.limit(3).write.parquet(qsrc)
        model = str(tmp_path / "ivf_model.json")
        out = str(tmp_path / "ivf_out")
        for i in range(2):  # second run loads the saved quantizer
            rc = main(
                ["ann", "--input", csrc, "--queries", qsrc, "--output", out,
                 "--method", "ivf", "--k", "3", "--model", model]
            )
            assert rc == 0
            res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
            assert res["result_rows"] == 9
        from harness_aws_etl_pipeline_spark.operators.similarity import load_ivf

        loaded = load_ivf(model, spark)
        assert loaded.count() == 16
        assert len(loaded.collect()[0]["centroid"]) == 8


class TestRank:
    @deep
    def test_rank_edges(self, spark, tmp_path, capsys):
        src = str(tmp_path / "rank_edges")
        # hub links BACK to all three — keeps the rank vector from the
        # period-2 oscillation a pure star + single back-edge produces
        spark.createDataFrame(
            [("a", "hub"), ("b", "hub"), ("c", "hub"),
             ("hub", "a"), ("hub", "b"), ("hub", "c")],
            "src string, dst string",
        ).write.parquet(src)
        out = str(tmp_path / "rank_out")
        rc = main(["rank", "--input", src, "--output", out,
                   "--iterations", "3", "--top", "2"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["status"] == "success"
        assert res["nodes"] == 4
        assert res["top"][0]["node"] == "hub"
        back = spark.read.parquet(out)
        assert back.columns == ["node", "rank_scaled", "rank"]
        assert back.count() == 4
        # personalized: teleport restricted to node "a" still ranks it
        rc = main(["rank", "--input", src, "--iterations", "2",
                   "--seed", "a", "--top", "4"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        nodes = {t["node"]: t["rank"] for t in res["top"]}
        assert nodes["a"] > 0 and nodes["hub"] > 0

    def test_rank_from_links(self, spark, tmp_path, capsys):
        src = str(tmp_path / "rank_docs")
        spark.createDataFrame(
            [("https://x.com/p", ["https://hub.com/a", "https://hub.com/b"]),
             ("https://y.com/p", ["https://hub.com/c"]),
             ("https://hub.com/p", ["https://x.com/", "https://y.com/"])],
            "url string, links array<string>",
        ).write.parquet(src)
        rc = main(["rank", "--input", src, "--from-links",
                   "--iterations", "2", "--top", "1"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["top"][0]["node"] == "hub.com"

    def test_rank_hits(self, spark, tmp_path, capsys):
        src = str(tmp_path / "hits_edges")
        # d links to everything popular (pure hub), a/b/c form a cycle
        # so they hold hub mass too; a gathers the most in-links
        spark.createDataFrame(
            [("d", "a"), ("d", "b"), ("d", "c"),
             ("a", "b"), ("b", "a"), ("c", "a")],
            "src string, dst string",
        ).write.parquet(src)
        out = str(tmp_path / "hits_out")
        rc = main(["rank", "--input", src, "--algo", "hits", "--output", out,
                   "--iterations", "2", "--top", "4"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["status"] == "success" and res["algo"] == "hits"
        assert res["nodes"] == 4
        # top is authority-ordered; "a" has the most quality in-links
        assert res["top"][0]["node"] == "a"
        hubs = {t["node"]: t["hub"] for t in res["top"]}
        assert hubs["d"] > hubs["c"]
        back = spark.read.parquet(out)
        assert back.columns == [
            "node", "hub_scaled", "auth_scaled", "hub", "auth"
        ]
        assert back.count() == 4
        with pytest.raises(SystemExit, match="pagerank-only"):
            main(["rank", "--input", src, "--algo", "hits", "--seed", "a"])


class TestBloomJoinAndTpch:
    def test_bloomjoin_roundtrip(self, spark, tmp_path, capsys):
        big = str(tmp_path / "bj_big")
        small = str(tmp_path / "bj_small")
        spark.range(0, 5000).selectExpr("id % 400 as k", "id as v").write.parquet(big)
        spark.range(0, 8).selectExpr("id * 31 as k").write.parquet(small)
        out = str(tmp_path / "bj_out")
        rc = main(["bloomjoin", "--big", big, "--small", small,
                   "--on", "k", "--output", out])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["status"] == "success"
        exp = (
            spark.read.parquet(big)
            .join(spark.read.parquet(small), "k")
            .count()
        )
        assert res["join_rows"] == exp == spark.read.parquet(out).count()
        assert res["kept_after_prune"] < res["big_rows"]
        assert res["shuffle_reduction"] > 0.9

    def test_tpch_runner_single_and_unknown(self, spark, capsys):
        rc = main(["tpch", "--sf-dir", "/root/testdata/sf0.001",
                   "--query", "q14"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["queries"]["q14"]["rows"] == 1
        rc = main(["tpch", "--sf-dir", "/root/testdata/sf0.001",
                   "--query", "q99"])
        assert rc == 1
        assert "unknown query" in capsys.readouterr().out


class TestExplainCli:
    def test_explain_known_query(self, spark, capsys):
        rc = main(["explain", "--query", "g1_pricing_summary",
                   "--sf-dir", "/root/testdata/sf0.001"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "Physical Plan" in out and "HashAggregate" in out

    def test_explain_unknown_query(self, spark, capsys):
        rc = main(["explain", "--query", "nope"])
        assert rc == 1
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "unknown query" in res["error"]
        assert "g1_pricing_summary" in res["available"]


class TestOutliersAndTriangles:
    def test_outliers_mad_and_output(self, spark, tmp_path, capsys):
        src = str(tmp_path / "vals")
        rows = [("a", float(v)) for v in [1, 1.1, 0.9, 1.0, 40.0]]
        spark.createDataFrame(rows, "g string, v double").write.parquet(src)
        out = str(tmp_path / "flagged")
        rc = main(["outliers", "--input", src, "--col", "v",
                   "--group-by", "g", "--method", "mad", "--output", out])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["rows"] == 5 and res["flagged"] == 1
        flagged = spark.read.parquet(out).collect()
        assert len(flagged) == 1 and flagged[0]["v"] == 40.0

    def test_outliers_zscore_requires_order(self, spark, tmp_path, capsys):
        src = str(tmp_path / "vals2")
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "t int, v double"
        ).write.parquet(src)
        rc = main(["outliers", "--input", src, "--col", "v",
                   "--method", "zscore"])
        assert rc == 2
        rc = main(["outliers", "--input", src, "--col", "v",
                   "--method", "zscore", "--order-by", "t"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["rows"] == 10

    def test_triangles_report(self, spark, tmp_path, capsys):
        src = str(tmp_path / "edges")
        edges = [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4), (4, 5)]
        spark.createDataFrame(edges, "src long, dst long").write.parquet(src)
        rc = main(["triangles", "--input", src, "--top", "3"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["nodes"] == 5 and res["triangles"] == 2
        assert res["top"][0]["tri_cnt"] == 2  # nodes 2/3 share both


class TestRound8Ops:
    def test_transitions_matrix_and_ngrams(self, spark, tmp_path, capsys):
        src = str(tmp_path / "ev8")
        rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (2, 1, "a"), (2, 2, "b")]
        spark.createDataFrame(rows, "u long, t long, e string").write.parquet(src)
        rc = main(["transitions", "--input", src, "--key", "u",
                   "--order-by", "t", "--state", "e"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["top"][0] == {"gram": "a>b", "cnt": 2, "p": 1.0}
        rc = main(["transitions", "--input", src, "--key", "u",
                   "--order-by", "t", "--state", "e", "--n", "3"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["top"] == [{"gram": "a>b>a", "cnt": 1}]

    def test_sample_weighted_and_guard(self, spark, tmp_path, capsys):
        src = str(tmp_path / "docs8")
        rows = [(i, float(1 + i % 3)) for i in range(100)]
        spark.createDataFrame(rows, "id long, w double").write.parquet(src)
        out = str(tmp_path / "sampled8")
        rc = main(["sample", "--input", src, "--key", "id",
                   "--method", "weighted", "--n", "10",
                   "--weight-col", "w", "--output", out])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["rows"] == 10
        rc = main(["sample", "--input", src, "--key", "id",
                   "--method", "weighted", "--output", out])
        assert rc == 2

    def test_bfs_report(self, spark, tmp_path, capsys):
        src = str(tmp_path / "edges8")
        edges = [(1, 2), (2, 3), (3, 1), (4, 5)]
        spark.createDataFrame(edges, "src long, dst long").write.parquet(src)
        rc = main(["bfs", "--input", src, "--seeds", "1", "--max-hops", "4"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["reached"] == 3
        assert res["per_hop"] == {"0": 1, "1": 1, "2": 1}

    def test_smooth_roundtrip(self, spark, tmp_path, capsys):
        src = str(tmp_path / "series8")
        rows = [("g", i, float(i)) for i in range(5)]
        spark.createDataFrame(rows, "g string, t int, v double").write.parquet(src)
        out = str(tmp_path / "smoothed8")
        rc = main(["smooth", "--input", src, "--order-by", "t",
                   "--value", "v", "--group-by", "g", "--method", "holt",
                   "--output", out])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["rows"] == 5
        got = spark.read.parquet(out).orderBy("t").collect()
        assert {"level", "trend"} <= set(got[0].asDict())


class TestFeaturesCli:
    def test_onehot_and_bucket(self, spark, tmp_path, capsys):
        src = str(tmp_path / "fsrc")
        rows = [(i, "en" if i % 2 else "fr", float(i)) for i in range(8)]
        spark.createDataFrame(rows, "id long, lang string, v double").write.parquet(src)
        out = str(tmp_path / "fout")
        rc = main(["features", "--input", src, "--op", "onehot",
                   "--cols", "lang", "--output", out])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["added_cols"] == ["lang__en", "lang__fr"]
        rc = main(["features", "--input", src, "--op", "bucket",
                   "--cols", "v", "--buckets", "4", "--output", out])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["added_cols"] == ["v_qb"]
        back = spark.read.parquet(out)
        assert back.agg({"v_qb": "max"}).first()[0] == 3

    def test_scale_grouped(self, spark, tmp_path, capsys):
        src = str(tmp_path / "ssrc")
        rows = [("a", float(i)) for i in range(5)] + [("b", 7.0), ("b", 9.0)]
        spark.createDataFrame(rows, "g string, v double").write.parquet(src)
        out = str(tmp_path / "sout")
        rc = main(["features", "--input", src, "--op", "scale",
                   "--cols", "v", "--group-by", "g", "--output", out])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["added_cols"] == ["v_z"]


class TestSessionizeCli:
    def test_sessionize_report(self, spark, tmp_path, capsys):
        import datetime

        src = str(tmp_path / "sess_src")
        t0 = datetime.datetime(2024, 1, 1)

        def at(s):
            return t0 + datetime.timedelta(seconds=s)

        rows = [(1, at(0), 1), (1, at(60), 2), (1, at(5000), 3),
                (2, at(0), 4)]
        spark.createDataFrame(
            rows, "u long, ts timestamp, id long"
        ).write.parquet(src)
        out = str(tmp_path / "sess_out")
        rc = main(["sessionize", "--input", src, "--key", "u",
                   "--ts", "ts", "--tie", "id", "--output", out])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["rows"] == 4
        assert res["actors"] == 2
        assert res["sessions"] == 3  # user1: 2, user2: 1
        assert res["max_sessions_per_actor"] == 2

    def test_lattice_cube(self, spark, tmp_path, capsys):
        src = str(tmp_path / "lat_src")
        spark.createDataFrame(
            [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0)],
            "g string, h string, v double",
        ).write.parquet(src)
        rc = main(["lattice", "--input", src, "--keys", "g,h",
                   "--mode", "cube", "--sum", "v", "--show", "50"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["levels"] == 8  # 3 detail + 2 g + 2 h + 1 total
        total = [r for r in res["rows"] if r["_gid"] == 3]
        assert total[0]["cnt"] == 3
        assert total[0]["v_sum_scaled"] == "60000"

    def test_lattice_sets(self, spark, tmp_path, capsys):
        src = str(tmp_path / "lat_src2")
        spark.createDataFrame(
            [("a", "x"), ("b", "x")], "g string, h string"
        ).write.parquet(src)
        rc = main(["lattice", "--input", src, "--keys", "g,h",
                   "--mode", "sets", "--sets", "g;h"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["levels"] == 3  # g: a,b  +  h: x
        assert {r["_gid"] for r in res["rows"]} == {1, 2}

    def test_video_probe_and_sample(self, spark, tmp_path, capsys):
        import numpy as np

        from harness_aws_etl_pipeline_spark.operators.video import (
            encode_avi_mjpeg,
        )

        clip = tmp_path / "clip.avi"
        clip.write_bytes(
            encode_avi_mjpeg(
                [np.full((6, 10, 3), v, np.uint8) for v in (10, 20, 30)],
                fps=3,
            )
        )
        rc = main(["video", "--input", str(clip), "--sample-every", "2"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["probe"]["codec"] == "MJPG"
        assert res["probe"]["frames"] == 3
        assert [f["mean"] for f in res["sampled_frames"]] == [10.0, 30.0]

    def test_driftmon_lifecycle(self, spark, tmp_path, capsys):
        ref = str(tmp_path / "dm_ref")
        cur = str(tmp_path / "dm_cur")
        spark.createDataFrame(
            [("a",)] * 3 + [("b",)], "v string"
        ).write.parquet(ref)
        spark.createDataFrame(
            [("a",), ("c",)], "v string"
        ).write.parquet(cur)
        state = str(tmp_path / "dm_state")
        rc = main(["driftmon", "--state", state, "--col", "v",
                   "--set-reference", ref, "--batch", cur,
                   "--batch-id", "0"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert [s["skipped"] for s in res["steps"]] == [False, False]
        assert res["report"]["n_ref"] == 4
        assert res["report"]["n_cur"] == 2
        # replaying the same batch id short-circuits
        rc = main(["driftmon", "--state", state, "--col", "v",
                   "--batch", cur, "--batch-id", "0"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["steps"][0]["skipped"] is True
        assert res["report"]["n_cur"] == 2

    def test_knnjoin(self, spark, tmp_path, capsys):
        import numpy as np

        rng = np.random.default_rng(4)
        mk = lambda n, base: [
            (base + i, [float(x) for x in rng.normal(0, 1, 8)])
            for i in range(n)
        ]
        lp, rp = str(tmp_path / "kl"), str(tmp_path / "kr")
        spark.createDataFrame(
            mk(6, 0), "vec_id long, embedding array<double>"
        ).write.parquet(lp)
        spark.createDataFrame(
            mk(20, 100), "vec_id long, embedding array<double>"
        ).write.parquet(rp)
        out = str(tmp_path / "kout")
        rc = main(["knnjoin", "--left", lp, "--right", rp, "--k", "3",
                   "--n-centroids", "4", "--nprobe", "4",
                   "--output", out])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["pairs"] == 18  # 6 left x k=3, full probe
        assert spark.read.parquet(out).count() == 18


class TestLinkGraphCli:
    def test_fold_refresh_and_maintain(self, spark, tmp_path, capsys):
        b0 = tmp_path / "b0.parquet"
        b1 = tmp_path / "b1.parquet"
        spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")],
            "src string, dst string",
        ).coalesce(1).write.parquet(str(b0))
        spark.createDataFrame(
            [("c", "d"), ("b", "d")], "src string, dst string"
        ).coalesce(1).write.parquet(str(b1))
        state = str(tmp_path / "state")

        rc = main([
            "linkgraph", "--state", state, "--add-edges", str(b0),
            "--batch-id", "0", "--pagerank", "--iterations", "8",
            "--tol", "0",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["status"] == "success"
        steps = {s["step"]: s for s in out["steps"]}
        assert steps["add_edges"]["skipped"] is False
        assert steps["pagerank"]["nodes"] == 4
        assert len(out["pagerank_top"]) == 4

        rc = main([
            "linkgraph", "--state", state, "--add-edges", str(b1),
            "--batch-id", "1", "--pagerank", "--hits",
            "--iterations", "8", "--tol", "0", "--maintain",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        steps = {s["step"]: s for s in out["steps"]}
        assert steps["maintain"]["edges_folded"] == 7
        assert len(out["hits_top_auth"]) == 4

        # replay of batch 1 short-circuits
        rc = main([
            "linkgraph", "--state", state, "--add-edges", str(b1),
            "--batch-id", "1",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["steps"][0]["skipped"] is True


class TestAnnIndexCli:
    def test_build_add_recalibrate_search(self, spark, tmp_path, capsys):
        import numpy as np

        rng = np.random.RandomState(5)
        pts = []
        for c in range(4):
            center = np.zeros(16)
            center[c * 2] = 5.0
            center[c * 2 + 1] = 3.0
            for _ in range(12):
                pts.append(center + rng.standard_normal(16) * 0.05)

        def _write(ids, name):
            path = tmp_path / name
            spark.createDataFrame(
                [(int(i), [float(x) for x in pts[i]]) for i in ids],
                "vec_id long, embedding array<float>",
            ).coalesce(1).write.parquet(str(path))
            return str(path)

        seed = _write(range(36), "seed.parquet")
        b1 = _write(range(36, 48), "b1.parquet")
        sample = _write(range(0, 48, 12), "sample.parquet")
        corpus = _write(range(48), "corpus.parquet")
        state = str(tmp_path / "state")

        rc = main([
            "annindex", "--state", state, "--build", seed,
            "--batch-id", "0", "--nlist", "4", "--m", "4",
            "--k-codes", "8",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["stats"]["vectors"] == 36

        rc = main([
            "annindex", "--state", state, "--add-batch", b1,
            "--batch-id", "1", "--recalibrate", sample,
            "--corpus", corpus, "--queries", sample, "--topk", "5",
            "--rerank-with", corpus, "--show", "3",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        steps = {s["step"]: s for s in out["steps"]}
        assert steps["add_batch"]["indexed"] == 12
        assert 1 <= steps["recalibrate"]["nprobe"] <= 4
        assert out["stats"]["vectors"] == 48
        assert len(out["search_preview"]) == 3

        # replay of add-batch 1 short-circuits
        rc = main([
            "annindex", "--state", state, "--add-batch", b1,
            "--batch-id", "1",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["steps"][0]["skipped"] is True
        assert out["stats"]["vectors"] == 48


class TestSnapDmlCli:
    def test_delete_and_update(self, spark, tmp_path, capsys):
        from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable

        path = str(tmp_path / "t")
        t = SnapTable(spark, path)
        t.write(
            spark.range(20).withColumn("v", F.lit(0)), mode="overwrite"
        )
        rc = main(["snap", "update", "--path", path,
                   "--where", "id >= 10", "--set", "v=v+5"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["rows_updated"] == 10
        assert t.read().filter("v = 5").count() == 10

        rc = main(["snap", "delete", "--path", path, "--where", "id >= 15"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["files_rewritten"] >= 1
        assert t.read().count() == 15

        with pytest.raises(SystemExit):
            main(["snap", "update", "--path", path, "--where", "id=0"])
        capsys.readouterr()
