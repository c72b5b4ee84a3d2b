"""Registry driver-sample ordering: the correctness driver samples a
bounded prefix of the registry per round, so _reorder_registry must put
the verification frontier (failed / never-sampled / stale-green queries)
ahead of queries already green in the latest round. Pure-Python tests —
no Spark session."""

from __future__ import annotations

import json

from logstash_spark import queries as Q


class TestDriverHistory:
    def test_parses_latest_round_and_pass_state(self, tmp_path):
        r1 = {
            "a": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
            "b": {"rows_match": True, "schema_match": True, "hash_match": False, "err": None},
        }
        r2 = {
            "b": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
            "c": {"rows_match": True, "schema_match": True, "hash_match": True, "err": "boom"},
        }
        (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(r1))
        (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(r2))
        hist = Q._driver_history(str(tmp_path))
        assert hist["a"] == (1, True)
        assert hist["b"] == (2, True)  # latest round wins over the r1 fail
        assert hist["c"] == (2, False)  # err → not green

    def test_unreadable_files_are_skipped(self, tmp_path):
        (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
        assert Q._driver_history(str(tmp_path)) == {}


class TestRegistryOrder:
    def test_real_registry_frontier_first(self):
        """Against the repo's actual CORRECTNESS records: every query that
        FAILED its latest driver sample sorts before every query that was
        green in the most recent round, and never-sampled queries sort
        before stale greens."""
        hist = Q._driver_history()
        if not hist:  # fresh checkout — static list governs, nothing to check
            return
        latest = max(rnd for rnd, _ in hist.values())
        names = list(Q.QUERIES)
        pos = {n: i for i, n in enumerate(names)}

        def cls(n):
            rec = hist.get(n)
            if rec is None:
                return 1
            rnd, ok = rec
            if not ok:
                return 0
            return 2 if rnd < latest else 3

        classes = [cls(n) for n in names]
        assert classes == sorted(classes), (
            "registry order must be nondecreasing in priority class"
        )
        # sanity: the two r02 reds (if still registered) lead the registry
        for red in ("token_chunking", "sequence_packing"):
            if red in pos and cls(red) == 0:
                assert pos[red] < 5

    def test_queries_and_oracles_share_order(self):
        assert list(Q.QUERIES) == [n for n in Q.QUERIES if n in Q.ORACLES]
        assert list(Q.ORACLES) == list(Q.QUERIES)
