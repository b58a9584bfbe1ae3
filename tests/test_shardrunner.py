"""Shard runner (tests/shardrunner.py): pure-python pins for the
pieces the full-suite gate depends on — LPT packing, activation
guards, and child-summary aggregation. (The end-to-end behavior is
exercised by every full `pytest tests/` invocation itself.)"""

from __future__ import annotations

import os
import re
from pathlib import Path

import shardrunner as sr


class TestPacking:
    def test_lpt_balances_by_weight(self):
        files = {f"/x/t{i}.py": 10 for i in range(8)}
        files["/x/test_catalog.py"] = 5  # weight table overrides count
        nbins = 3

        def weight(path, ntests):
            return max(
                sr._FILE_SECONDS.get(Path(path).name, 0.0), ntests * 1.2
            )

        bins = [[] for _ in range(nbins)]
        loads = [0.0] * nbins
        for path, n in sorted(
            files.items(), key=lambda kv: -weight(kv[0], kv[1])
        ):
            i = loads.index(min(loads))
            bins[i].append(path)
            loads[i] += weight(path, n)
        assert sum(len(b) for b in bins) == len(files)
        # the heavy measured file dominates its bin: it lands alone or
        # nearly alone while the light files spread over the others
        heavy_bin = next(
            b for b in bins if any("test_catalog" in p for p in b)
        )
        assert len(heavy_bin) <= 3
        assert max(loads) / min(loads) < 2.5

    def test_weight_prefers_measured_seconds(self):
        assert sr._FILE_SECONDS["test_catalog.py"] >= 90
        w_known = max(sr._FILE_SECONDS.get("test_catalog.py", 0), 5 * 1.2)
        w_unknown = max(sr._FILE_SECONDS.get("test_new.py", 0), 5 * 1.2)
        assert w_known > w_unknown


class TestGuards:
    def test_child_env_short_circuits(self, monkeypatch):
        monkeypatch.setenv(sr._CHILD_ENV, "1")
        assert sr.pytest_runtestloop(object()) is None

    def test_par_zero_disables(self, monkeypatch):
        monkeypatch.delenv(sr._CHILD_ENV, raising=False)
        monkeypatch.setenv("SPARK_GRAFT_PAR", "0")
        assert sr.pytest_runtestloop(object()) is None

    def test_worker_count_env(self, monkeypatch):
        monkeypatch.setenv("SPARK_GRAFT_PAR", "3")
        assert sr._workers() == 3
        monkeypatch.setenv("SPARK_GRAFT_PAR", "")
        cpus = os.cpu_count() or 8
        assert sr._workers() == min(7, max(2, cpus // 4))


class TestSummaryParsing:
    def test_tail_regex(self):
        tail = "996 passed, 41 skipped, 2 deselected in 1251.85s (0:20:51)"
        got = dict(
            (k, int(v)) for v, k in re.findall(r"(\d+) (\w+)", tail)
        )
        assert got["passed"] == 996
        assert got["skipped"] == 41
        assert got["deselected"] == 2
