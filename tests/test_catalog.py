"""Catalog guard: every query in __spark_entry__ builds and a
representative subset executes + matches its DuckDB oracle at sf0.001.
(The full 45-query differential run lives in tools/verify_local.py;
this keeps the pytest suite fast while still catching API regressions
and oracle drift.)"""

import math

import duckdb
import pytest

from harness_aws_etl_pipeline_spark.plans.catalog import CATALOG, TABLE_NAMES

SF = "/root/testdata/sf0.001"

# one per operator family — cheap but representative
EXECUTED = [
    "g1_pricing_summary",
    "relalg_counts",
    "events_tumbling",
    "text_stats",
    "sim_bruteforce_topk",
]


# The external driver records correctness for only the FIRST 50
# catalog entries in iteration order. catalog._merged orders
# oracle-backed specs first so every value-checked query sits inside
# that window; the tail is exactly the engine-hash "rows-only" family
# (whose VALUES are oracled through the fuzzy_dedup_verify /
# ann_topk_verify panels). This must hold by construction, not by
# accident — a 51st oracle entry or a reorder would silently drop a
# value-checked query out of the driver's record.
DRIVER_WINDOW = 50
ROWS_ONLY_TAIL = {
    "train_test_split",
    "minhash_lsh",
    "simhash",
    "embedding_near_dup",
    "sim_ivf_topk",
    "semantic_dedup",
}


class TestDriverWindowInvariant:
    def test_oracle_entries_fill_but_never_overflow_the_window(self):
        names = list(CATALOG)
        oracle_backed = [n for n, s in CATALOG.items() if s.oracle is not None]
        assert len(oracle_backed) <= DRIVER_WINDOW, (
            f"{len(oracle_backed)} oracle-backed specs > {DRIVER_WINDOW}: "
            "the overflow would be recorded as rows-only; merge two "
            "1-row panels (the null_audit crossJoin pattern) instead"
        )
        # every oracle-backed spec sits inside the recorded window
        assert names[: len(oracle_backed)] == oracle_backed

    def test_tail_is_exactly_the_known_rows_only_specs(self):
        rows_only = {n for n, s in CATALOG.items() if s.oracle is None}
        assert rows_only == ROWS_ONLY_TAIL, (
            "rows-only set changed — if intentional, every new "
            "rows-only spec needs its values pinned via a verify panel "
            "inside the window, then update ROWS_ONLY_TAIL"
        )
        tail = list(CATALOG)[-len(ROWS_ONLY_TAIL):]
        assert set(tail) == ROWS_ONLY_TAIL


class TestCatalogContract:
    def test_every_query_builds(self, spark):
        """API smoke-check: every catalog query constructs a plan.

        The sf-INDEPENDENT fixture legs (incremental hh/quantile
        streams, pagerank/HITS/triangle/BFS planted graphs) run real
        multi-job folds at build time and are VALUE-tested by their
        own suites + the driver oracle — seed their per-process
        caches with placeholder rows here so this guard measures
        plan construction, not ~45 s of fixture jobs, then restore so
        any later value-sensitive consumer recomputes the real rows.
        """
        import harness_aws_etl_pipeline_spark.plans.catalog as cat
        import harness_aws_etl_pipeline_spark.plans.catalog_ext as ext

        saved = (
            cat._IHH_ROW, cat._IQ_ROW, cat._BFS_ROW,
            ext._PR_ROW, ext._HITS_ROW, ext._TRI_ROW,
        )
        cat._IHH_ROW = cat._IHH_ROW or (1, True, True, True, "k", True)
        cat._IQ_ROW = cat._IQ_ROW or (1, 1, True, True, True, True)
        cat._BFS_ROW = cat._BFS_ROW or (1, "x")
        ext._PR_ROW = ext._PR_ROW or ("x", 1, "n")
        ext._HITS_ROW = ext._HITS_ROW or ("x", "h", "a")
        ext._TRI_ROW = ext._TRI_ROW or ("x", 1)
        try:
            for name, spec in CATALOG.items():
                df = spec.builder(spark, SF)
                assert df.columns, f"{name} produced no columns"
        finally:
            (
                cat._IHH_ROW, cat._IQ_ROW, cat._BFS_ROW,
                ext._PR_ROW, ext._HITS_ROW, ext._TRI_ROW,
            ) = saved

    def test_entry_contract(self, spark):
        import __spark_entry__ as entry_mod

        qs = entry_mod.queries()
        oracles = entry_mod.oracle_sql()
        assert set(oracles) <= set(qs)
        assert len(qs) == len(CATALOG)
        flagship = entry_mod.entry(spark)
        assert flagship.columns == ["order_date", "line_cnt", "revenue"]

    def test_near_dup_panel_fallback_matches_gate_path(self, spark, monkeypatch):
        """r13 round-2: the fused near-dup panel's summary normally
        comes off the driver gate (near_dup_panel_stats); over the
        gate it falls back to the distributed clustering + jac
        aggregations. Force the fallback and pin it value-equal to the
        gate path — the branch no oracle run exercises (testdata pair
        graphs always fit the gate)."""
        gate_rows = [tuple(r) for r in CATALOG["near_dup_clusters"].builder(
            spark, SF
        ).collect()]
        import harness_aws_etl_pipeline_spark.operators.dedup_fuzzy as dfz

        monkeypatch.setattr(dfz, "near_dup_panel_stats", lambda *a, **k: None)
        fb_rows = [tuple(r) for r in CATALOG["near_dup_clusters"].builder(
            spark, SF
        ).collect()]
        assert fb_rows == gate_rows

    @pytest.mark.parametrize("name", EXECUTED)
    def test_oracle_match(self, spark, name):
        spec = CATALOG[name]
        sdf = spec.builder(spark, SF)
        s_cols = sorted(sdf.columns)
        order = [sdf.columns.index(c) for c in s_cols]

        con = duckdb.connect()
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
            )
        cur = con.execute(spec.oracle)
        d_cols = [d[0] for d in cur.description]
        d_order = [d_cols.index(c) for c in sorted(d_cols)]
        assert sorted(d_cols) == s_cols

        def norm(rows, idx):
            out = []
            for r in rows:
                out.append(
                    tuple(
                        round(v, 9) if isinstance(v, float) and not math.isnan(v) else v
                        for v in (r[i] for i in idx)
                    )
                )
            return sorted(out, key=repr)

        assert norm([tuple(r) for r in sdf.collect()], order) == norm(
            cur.fetchall(), d_order
        )
