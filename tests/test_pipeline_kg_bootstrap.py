"""The fused KG bootstrap (pipeline/kg_bootstrap.py): end-to-end
funnel over a planted corpus, kill/resume to an identical grown KG,
and the NELL coupling (accepted proposals re-enter as seed facts)."""

import pytest
from pyspark.sql import functions as F

from coies_spark.pipeline.kg_bootstrap import bootstrap_kg_run

pytestmark = pytest.mark.spark


@pytest.fixture()
def paths(spark, tmp_path):
    turns = []
    for c in range(10):
        turns.append((f"c{c}", 0, "user",
                      f"please scan the table for batch {c}", None))
        turns.append((f"c{c}", 1, "agent",
                      "the merge join consumes the hash output", None))
        turns.append((f"c{c}", 2, "user",
                      f"hash and table appear here together {c}", None))
    t = str(tmp_path / "transcripts")
    spark.createDataFrame(
        turns,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string",
    ).write.parquet(t)
    d = str(tmp_path / "dict")
    spark.createDataFrame(
        [("table", "obj:table"), ("hash", "obj:hash"),
         ("merge join", "act:merge-join"), ("scan", "act:scan")],
        ["surface", "entity"],
    ).write.parquet(d)
    s = str(tmp_path / "seed")
    spark.createDataFrame(
        [("act:merge-join", "consumes", "obj:hash"),
         ("act:scan", "reads", "obj:table")],
        ["subj", "pred", "obj"],
    ).write.parquet(s)
    return t, d, s


def _kg_state(df):
    return {(r.subj, r.pred, r.obj) for r in df.collect()}


class TestBootstrapKgRun:
    def test_funnel_and_grown_kg(self, spark, tmp_path, paths):
        t, d, s = paths
        out = str(tmp_path / "run")
        grown, runner = bootstrap_kg_run(
            spark, t, d, s, out, threshold=0.2, rate=1.0, max_len=2
        )
        kg = _kg_state(grown)
        seed = _kg_state(spark.read.parquet(s))
        # the grown KG contains every seed fact unchanged
        assert seed <= kg
        # accepted proposals arrive under the reserved predicate and
        # never duplicate a seed pair
        new = kg - seed
        assert all(p == "related" for (_, p, _o) in new)
        seed_pairs = {(a, b) for (a, _p, b) in seed}
        assert not ({(a, b) for (a, _p, b) in new} & seed_pairs)
        # funnel metrics: every stage ran (not resumed), labels carry
        # per-class lineage
        m = {r["stage"]: r for r in runner.metrics().collect()}
        assert set(m) == {
            "mentions", "labels", "detector", "proposals", "grown"
        }
        assert not any(r.resumed for r in m.values())
        import json

        class_rows = json.loads(m["labels"].partition_rows)
        assert set(class_rows) == {"1.0", "0.0"}

    def test_kill_resume_identical_kg(self, spark, tmp_path, paths):
        t, d, s = paths
        cfg = dict(threshold=0.2, rate=1.0, max_len=2)
        ref_out = str(tmp_path / "ref")
        ref, _ = bootstrap_kg_run(spark, t, d, s, ref_out, **cfg)
        ref_kg = _kg_state(ref)

        # killed run: crash inside the proposals stage
        out = str(tmp_path / "run")
        import coies_spark.pipeline.kg_bootstrap as kb

        real = kb.score_proposals

        def exploding(*a, **k):
            raise RuntimeError("simulated mid-run kill")

        kb.score_proposals = exploding
        try:
            with pytest.raises(RuntimeError, match="simulated"):
                bootstrap_kg_run(spark, t, d, s, out, **cfg)
        finally:
            kb.score_proposals = real

        # resume: mentions/labels/detector skip, proposals+grown run
        grown, runner = bootstrap_kg_run(spark, t, d, s, out, **cfg)
        m = {r["stage"]: r for r in runner.metrics().collect()}
        for st in ("mentions", "labels", "detector"):
            assert m[st].resumed, st
        assert not m["proposals"].resumed
        assert _kg_state(grown) == ref_kg

        # third invocation: pure no-op, identical KG
        grown3, runner3 = bootstrap_kg_run(spark, t, d, s, out, **cfg)
        assert all(r.resumed for r in runner3.metrics().collect())
        assert _kg_state(grown3) == ref_kg

    def test_nell_coupling_round_two(self, spark, tmp_path, paths):
        # accepted proposals re-enter as seed: round 2's NA anti-join
        # must exclude them (they are no longer scoring candidates)
        t, d, s = paths
        out1 = str(tmp_path / "r1")
        grown, _ = bootstrap_kg_run(
            spark, t, d, s, out1, threshold=0.2, rate=1.0, max_len=2
        )
        s2 = str(tmp_path / "seed2")
        grown.write.parquet(s2)
        out2 = str(tmp_path / "r2")
        grown2, runner2 = bootstrap_kg_run(
            spark, t, d, s2, out2, threshold=0.2, rate=1.0, max_len=2
        )
        r1_accepted = {
            (a, b) for (a, p, b) in _kg_state(grown) if p == "related"
        }
        if r1_accepted:
            # no round-1 acceptance reappears as a round-2 proposal
            props = spark.read.parquet(f"{out2}/proposals/data")
            p2 = {(r.subj, r.obj) for r in props.collect()}
            assert not (p2 & r1_accepted)
        # round 2 still contains everything round 1 grew
        assert _kg_state(grown) <= _kg_state(grown2)
