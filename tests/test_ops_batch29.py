"""Twenty-ninth batch: tokenizer-accurate budgets — the trained BPE
merge table wired into pack_documents / pack_turns / sliding_chunks /
token_budget_sample / epoch_plan, so every packing and mixture budget
is counted in the tokens a training loader actually consumes.  The
done-criterion test is budget compliance in BPE tokens on a
MIXED-FERTILITY corpus (one language near 1 symbol/word, one far
above), where whitespace budgets mis-size rows by the fertility
factor."""

import pytest
from pyspark.sql import functions as F

from coies_spark.core.textproc import tokenize
from coies_spark.ops.bpe import (
    bpe_merges,
    bpe_segment,
    with_bpe_token_counts,
)
from coies_spark.ops.lm import pack_documents
from coies_spark.ops.sampling import token_budget_sample
from coies_spark.ops.transcripts import pack_turns, sliding_chunks

pytestmark = pytest.mark.spark


def _greedy_apply(syms, l, r):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _bpe_count(text, merges):
    """Pure-Python BPE token count of a text under a merge list."""
    n = 0
    for w in tokenize(text.lower()):
        syms = list(w)
        for l, r in merges:
            syms = _greedy_apply(syms, l, r)
        n += len(syms)
    return n


# Mixed fertility by construction: 'en' docs reuse a tiny word set the
# merges learn fully (low symbols/word); 'xx' docs are char-soup the
# merges never cover (fertility ≈ word length).
EN = ["the cat sat on the mat the cat", "the mat the cat the cat sat"]
XX = ["zqvkj pwxyb mnrtl zqvkj", "pwxyb zqvkj mnrtl gfhds bcnmz"]


def _mixed_docs(spark):
    rows = [(i, t, "en") for i, t in enumerate(EN * 4)] + [
        (100 + i, t, "xx") for i, t in enumerate(XX * 4)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _train(spark, docs, n=8):
    return [
        (r.lhs, r.rhs)
        for r in bpe_merges(docs, n).orderBy("rank").collect()
    ]


class TestWithBpeTokenCounts:
    def test_matches_segment_and_replica(self, spark):
        docs = _mixed_docs(spark)
        merges = _train(spark, docs)
        got = {
            r.doc_id: r.n_bpe_tokens
            for r in with_bpe_token_counts(docs, merges).collect()
        }
        seg = {
            r.doc_id: r.n_bpe_symbols
            for r in bpe_segment(docs, merges).collect()
        }
        assert got == seg
        for r in docs.collect():
            assert got[r.doc_id] == _bpe_count(r.text, merges)

    def test_fertility_gap_exists(self, spark):
        # the premise of the whole feature: whitespace and BPE counts
        # genuinely diverge, and divergence differs by language
        docs = _mixed_docs(spark)
        merges = _train(spark, docs)
        rows = with_bpe_token_counts(docs, merges).select(
            "lang",
            "n_bpe_tokens",
            F.size(
                F.filter(
                    F.split(F.lower("text"), r"[\s!-/:-@\[-`{-~]"),
                    lambda t: t != "",
                )
            ).alias("n_ws"),
        ).collect()
        fert = {}
        for lang in ("en", "xx"):
            bp = sum(r.n_bpe_tokens for r in rows if r.lang == lang)
            ws = sum(r.n_ws for r in rows if r.lang == lang)
            fert[lang] = bp / ws
        assert fert["xx"] > 2 * fert["en"]


class TestPackDocumentsBpe:
    def test_budget_compliance_in_bpe_tokens(self, spark):
        docs = _mixed_docs(spark)
        merges = _train(spark, docs)
        row_tokens = 16
        mf = pack_documents(docs, row_tokens, merges=merges).collect()
        # every row except the last is exactly full — in BPE tokens
        per_row = {}
        for r in mf:
            per_row[r.row_id] = per_row.get(r.row_id, 0) + r.seg_tokens
        last = max(per_row)
        for rid, tot in per_row.items():
            if rid != last:
                assert tot == row_tokens, (rid, tot)
        assert 0 < per_row[last] <= row_tokens
        # manifest doc sizes are the replica's BPE counts
        by_doc = {}
        for r in mf:
            by_doc[r.doc_id] = r.n_tokens
        for d in docs.collect():
            assert by_doc[d.doc_id] == _bpe_count(d.text, merges)

    def test_merges_and_count_col_exclusive(self, spark):
        docs = _mixed_docs(spark)
        with pytest.raises(ValueError):
            pack_documents(
                docs, 16, n_tokens_col="doc_id", merges=[("a", "b")]
            )


class TestPackTurnsBpe:
    def _transcripts(self, spark):
        rows = []
        for c, texts in enumerate([EN, XX, EN + XX]):
            for i, t in enumerate(texts * 2):
                rows.append((f"c{c}", i, t))
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string"
        )

    def test_budget_and_overflow_bound_in_bpe_tokens(self, spark):
        t = self._transcripts(spark)
        merges = _train(spark, _mixed_docs(spark))
        budget = 24
        chunks = pack_turns(t, budget, merges=merges).collect()
        turn_counts = {
            (r.conv_id, r.turn_idx): _bpe_count(r.text, merges)
            for r in t.collect()
        }
        # chunk token totals are BPE totals, and a chunk overflows the
        # budget by at most its last turn minus 1
        for ch in chunks:
            want = sum(
                turn_counts[(ch.conv_id, i)]
                for i in range(ch.first_turn, ch.last_turn + 1)
            )
            assert ch.n_tokens == want
            last_len = turn_counts[(ch.conv_id, ch.last_turn)]
            assert ch.n_tokens <= budget + max(last_len - 1, 0)

    def test_sliding_chunks_bpe_counts(self, spark):
        t = self._transcripts(spark)
        merges = _train(spark, _mixed_docs(spark))
        chunks = sliding_chunks(
            t, window_tokens=24, stride_tokens=12, merges=merges
        ).collect()
        turn_counts = {
            (r.conv_id, r.turn_idx): _bpe_count(r.text, merges)
            for r in t.collect()
        }
        # offsets are BPE offsets: replay membership in pure Python
        want = set()
        for conv in {r.conv_id for r in t.collect()}:
            off = 0
            for i in sorted(
                i for (c, i) in turn_counts if c == conv
            ):
                n = turn_counts[(conv, i)]
                if n > 0:
                    k_min = max(0, (off - 24) // 12 + 1)
                    k_max = (off + n - 1) // 12
                    for k in range(k_min, k_max + 1):
                        want.add((conv, k, i))
                off += n
            got = {
                (r.conv_id, r.chunk_id)
                for r in chunks
                if r.conv_id == conv
            }
        got_membership = set()
        for r in chunks:
            for i in range(r.first_turn, r.last_turn + 1):
                got_membership.add((r.conv_id, r.chunk_id, i))
        # first/last span may include mid turns not in the window only
        # if membership were non-contiguous — BPE offsets are monotone
        # so spans ARE the membership
        assert got_membership == want


class TestTokenBudgetBpe:
    def test_budget_reached_in_bpe_tokens(self, spark):
        docs = _mixed_docs(spark)
        merges = _train(spark, docs)
        sized = with_bpe_token_counts(docs, merges)
        budget = 60
        kept = token_budget_sample(
            sized, budget, n_tokens_col="n_bpe_tokens", strata_col="lang"
        ).collect()
        for lang in ("en", "xx"):
            rows = [r for r in kept if r.lang == lang]
            assert rows, lang
            # every kept row started under budget; the total crosses it
            assert all(r.cum_before < budget for r in rows)
            assert (
                sum(r.n_bpe_tokens for r in rows) + 0 >= budget
                or len(rows)
                == docs.where(F.col("lang") == lang).count()
            )

    def test_ws_budget_would_missize(self, spark):
        # the mis-sizing the feature exists to fix: at the same budget
        # the whitespace-counted sample keeps MORE xx documents than
        # the BPE-counted one (xx tokens are ~5x under-counted)
        docs = _mixed_docs(spark)
        merges = _train(spark, docs)
        sized = with_bpe_token_counts(docs, merges).withColumn(
            "n_ws",
            F.size(
                F.filter(
                    F.split(F.lower("text"), r"[\s!-/:-@\[-`{-~]"),
                    lambda t: t != "",
                )
            ).cast("long"),
        )
        budget = 60
        bpe_kept = token_budget_sample(
            sized, budget, n_tokens_col="n_bpe_tokens", strata_col="lang"
        )
        ws_kept = token_budget_sample(
            sized, budget, n_tokens_col="n_ws", strata_col="lang"
        )
        n_bpe = bpe_kept.where(F.col("lang") == "xx").count()
        n_ws = ws_kept.where(F.col("lang") == "xx").count()
        assert n_ws > n_bpe
