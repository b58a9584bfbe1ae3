"""Conversation prep (operators/chatops.py): flattening, protocol
stats, alternation validation, and sequence-sensitive dedup
signatures."""

from __future__ import annotations

import pytest

from harness_aws_etl_pipeline_spark.operators.chatops import (
    conversation_signature,
    conversation_stats,
    flatten_conversations,
)


@pytest.fixture()
def chats(spark):
    rows = [
        (1, '[{"role":"system","content":"be nice"},'
            '{"role":"user","content":"hi"},'
            '{"role":"assistant","content":"yo"}]'),
        (2, '[{"role":"user","content":"hi"},'
            '{"role":"assistant","content":"yo"}]'),
        (3, '[{"role":"assistant","content":"yo"},'
            '{"role":"user","content":"hi"}]'),
        (4, "not json"),
        (5, '[{"role":"user","content":"hi"},'
            '{"role":"user","content":"again"}]'),
        (6, "[]"),
    ]
    return spark.createDataFrame(rows, "doc_id long, messages string")


class TestFlatten:
    def test_turns_and_malformed_emit_nothing(self, chats):
        got = {
            (r["doc_id"], r["turn_idx"]): (r["role"], r["content"], r["n_chars"])
            for r in flatten_conversations(chats).collect()
        }
        assert got[(1, 0)] == ("system", "be nice", 7)
        assert got[(1, 2)] == ("assistant", "yo", 2)
        assert not any(d == 4 for d, _ in got)   # malformed
        assert not any(d == 6 for d, _ in got)   # empty array


class TestStats:
    def test_protocol_facts(self, chats):
        got = {r["doc_id"]: r for r in conversation_stats(chats).collect()}
        assert got[1]["starts_with_system"] and got[1]["alternates_ok"]
        assert got[2]["alternates_ok"] and not got[2]["starts_with_system"]
        assert not got[3]["alternates_ok"]      # assistant first
        assert not got[5]["alternates_ok"]      # user twice
        assert got[4]["parsed"] is False
        assert got[4]["n_turns"] is None        # NULL facts, not zeros
        assert got[6]["parsed"] and got[6]["n_turns"] == 0
        assert not got[6]["alternates_ok"]      # empty is not a chat
        assert got[1]["total_chars"] == 11


class TestSignature:
    def test_sequence_sensitive_and_system_variants(self, spark, chats):
        sig = {
            r["doc_id"]: r["conv_sig"]
            for r in conversation_signature(chats).collect()
        }
        ns = {
            r["doc_id"]: r["conv_sig_ns"]
            for r in conversation_signature(
                chats, include_system=False, out_col="conv_sig_ns"
            ).collect()
        }
        # role+content sequence is the identity: 2 vs 3 share the bag
        # of turns but not the order → different signatures
        assert sig[2] != sig[3]
        # dropping system turns collapses system-prompt variants
        assert sig[1] != sig[2] and ns[1] == ns[2]
        assert sig[4] is None                   # malformed → NULL

    def test_dedup_composition(self, spark, chats):
        deduped = (
            conversation_signature(chats, include_system=False)
            .where("conv_sig is not null")
            .dropDuplicates(["conv_sig"])
        )
        # docs 1 and 2 collapse; 3, 5, 6 distinct → 4 survivors
        assert deduped.count() == 4
