"""Seventh/eighth-batch operators: Adamic–Adar + personalized
PageRank + link-prediction MRR (operators.graph), Fellegi–Sunter EM
linkage and end-to-end clustering (ops.linkage), weighted sampling,
mixture planning and the leakage-free split (ops.sampling),
instruct-pair assembly and tool-sequence anomaly scoring
(ops.transcripts), Monroe token drift (ops.textstats), OPH MinHash
and the pair-recall gauge (ops.dedup), calibration bins
(ops.classify), belief-snapshot diff (ops.kg), and compaction
planning + Z-order keys (ops.maintenance)."""

import math
import re

import pytest
from pyspark.sql import functions as F

from coies_spark.operators.graph import adamic_adar
from coies_spark.ops import textstats, transcripts
from coies_spark.ops.sampling import weighted_sample

pytestmark = pytest.mark.spark


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


class TestAdamicAdar:
    def test_hand_graph(self, spark):
        # wedge a - z - b plus z - c: deg(z) = 3 on the symmetrized
        # graph, so score(a,b) = 1/ln(3); a and c also pair via z
        e = _edges(spark, [("a", "z"), ("z", "b"), ("z", "c")])
        got = {(r.a, r.b): (r.common, r.score)
               for r in adamic_adar(e).collect()}
        w = round(round(1.0 / math.log(3.0), 9), 6)
        assert got[("a", "b")] == (1, w)
        assert got[("a", "c")] == (1, w)
        assert got[("b", "c")] == (1, w)
        assert len(got) == 3

    def test_rare_neighbor_outweighs_hub(self, spark):
        # x and y share BOTH a degree-2 neighbor (r) and a degree-5
        # hub (h): the rare neighbor contributes more weight
        rows = [("x", "r"), ("y", "r"), ("x", "h"), ("y", "h")]
        rows += [("h", f"l{i}") for i in range(3)]
        got = {(r.a, r.b): (r.common, r.score)
               for r in adamic_adar(_edges(spark, rows)).collect()}
        expect = round(
            round(1.0 / math.log(2.0), 9) + round(1.0 / math.log(5.0), 9),
            6,
        )
        assert got[("x", "y")] == (2, expect)

    def test_python_parity_randomized(self, spark):
        import random

        rng = random.Random(7)
        nodes = [f"n{i}" for i in range(30)]
        rows = list(
            {
                (rng.choice(nodes), rng.choice(nodes))
                for _ in range(120)
            }
        )
        rows = [(a, b) for a, b in rows if a != b]
        adj: dict[str, set] = {}
        for a, b in rows:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        cap = 8
        kept = {n for n, s in adj.items() if len(s) <= cap}
        g = {n: {v for v in s if v in kept}
             for n, s in adj.items() if n in kept}
        expect = {}
        ns = sorted(g)
        for i, a in enumerate(ns):
            for b in ns[i + 1:]:
                common = g[a] & g[b]
                if common:
                    s = sum(
                        round(1.0 / math.log(len(g[z])), 9)
                        for z in common
                    )
                    expect[(a, b)] = (len(common), round(s, 6))
        got = {
            (r.a, r.b): (r.common, r.score)
            for r in adamic_adar(
                _edges(spark, rows), max_degree=cap
            ).collect()
        }
        assert got == expect

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            adamic_adar(_edges(spark, [("a", "b")]), max_degree=0)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )


class TestWeightedSample:
    def test_exact_stratum_sizes(self, spark):
        rows = [(i, f"t{i}", "en" if i % 2 else "fr", 10 + i)
                for i in range(40)]
        out = weighted_sample(
            _docs(spark, rows), k=5, weight_col="n_chars",
            strata_col="lang",
        ).collect()
        by = {}
        for r in out:
            by.setdefault(r.lang, []).append(r.doc_id)
        assert sorted(len(v) for v in by.values()) == [5, 5]

    def test_two_phase_equals_global_window(self, spark):
        rows = [(i, f"t{i}", ["en", "fr", "de"][i % 3], 1 + (i % 7))
                for i in range(90)]
        d = _docs(spark, rows)
        fast = weighted_sample(
            d, k=4, weight_col="n_chars", strata_col="lang",
            salt_buckets=16,
        )
        slow = weighted_sample(
            d, k=4, weight_col="n_chars", strata_col="lang",
            salt_buckets=1,
        )
        assert sorted(r.doc_id for r in fast.collect()) == sorted(
            r.doc_id for r in slow.collect()
        )

    def test_nonpositive_and_null_weights_dropped(self, spark):
        rows = [(1, "a", "en", 5), (2, "b", "en", 0),
                (3, "c", "en", -2), (4, "d", "en", None)]
        out = weighted_sample(
            _docs(spark, rows), k=10, weight_col="n_chars",
            strata_col="lang",
        ).collect()
        assert [r.doc_id for r in out] == [1]

    def test_weight_proportional_selection(self, spark):
        # 200 light rows (w=1) + 20 heavy rows (w=1000): the heavy
        # minority should dominate a k=20 draw
        rows = [(i, f"t{i}", "en", 1) for i in range(200)]
        rows += [(1000 + i, f"h{i}", "en", 1000) for i in range(20)]
        out = weighted_sample(
            _docs(spark, rows), k=20, weight_col="n_chars",
            strata_col="lang",
        ).collect()
        heavy = sum(1 for r in out if r.doc_id >= 1000)
        assert len(out) == 20 and heavy >= 15

    def test_validation(self, spark):
        d = _docs(spark, [(1, "a", "en", 5)])
        with pytest.raises(ValueError):
            weighted_sample(d, k=0, weight_col="n_chars")
        with pytest.raises(ValueError):
            weighted_sample(d, k=1, weight_col="n_chars", salt_buckets=0)


def _tx(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts long",
    )


class TestTrainingPairs:
    def test_prompt_rendering_and_raw_response(self, spark):
        t = _tx(spark, [
            ("c1", 0, "user", "hello there", None, 0),
            ("c1", 1, "assistant", "hi!  How can I help?", None, 1),
            ("c1", 2, "tool", "search(weather)", "search", 2),
            ("c1", 3, "assistant", "It is sunny.", None, 3),
        ])
        got = {r.turn_idx: r for r in transcripts.training_pairs(
            t, context_turns=2).collect()}
        assert set(got) == {1, 3}
        assert got[1].prompt == "user: hello there"
        assert got[1].n_context == 1
        # response is the RAW text — double space preserved
        assert got[1].response == "hi!  How can I help?"
        assert got[3].prompt == (
            "assistant: hi!  How can I help?\ntool: search(weather)"
        )
        assert got[3].n_context == 2

    def test_first_turn_and_empty_targets_dropped(self, spark):
        t = _tx(spark, [
            ("c1", 0, "assistant", "opener with no context", None, 0),
            ("c2", 0, "user", "q", None, 0),
            ("c2", 1, "assistant", "", None, 1),
            ("c2", 2, "assistant", None, None, 2),
        ])
        assert transcripts.training_pairs(t).collect() == []

    def test_null_context_fields_render_empty(self, spark):
        t = _tx(spark, [
            ("c1", 0, None, None, None, 0),
            ("c1", 1, "assistant", "ok", None, 1),
        ])
        [r] = transcripts.training_pairs(t, context_turns=4).collect()
        assert r.prompt == ": " and r.response == "ok"

    def test_context_window_truncates(self, spark):
        t = _tx(spark, [
            ("c1", i, "user", f"u{i}", None, i) for i in range(5)
        ] + [("c1", 5, "assistant", "a", None, 5)])
        [r] = transcripts.training_pairs(t, context_turns=2).collect()
        assert r.prompt == "user: u3\nuser: u4" and r.n_context == 2

    def test_validation(self, spark):
        t = _tx(spark, [("c1", 0, "user", "x", None, 0)])
        with pytest.raises(ValueError):
            transcripts.training_pairs(t, context_turns=0)


def _pytok(s):
    return [t for t in re.split(r"[\s!-/:-@\[-`{-~]", s.lower()) if t]


class TestTokenDrift:
    def _drift_py(self, docs_a, docs_b, min_count=1, a0=100.0):
        ca, cb = {}, {}
        for d in docs_a:
            for t in _pytok(d):
                ca[t] = ca.get(t, 0) + 1
        for d in docs_b:
            for t in _pytok(d):
                cb[t] = cb.get(t, 0) + 1
        na, nb = sum(ca.values()), sum(cb.values())
        out = {}
        for t in set(ca) | set(cb):
            ya, yb = ca.get(t, 0), cb.get(t, 0)
            if ya + yb < min_count:
                continue
            aw = a0 * (ya + yb) / (na + nb)
            delta = math.log((ya + aw) / (na + a0 - ya - aw)) - math.log(
                (yb + aw) / (nb + a0 - yb - aw)
            )
            z = delta / math.sqrt(1.0 / (ya + aw) + 1.0 / (yb + aw))
            out[t] = (ya, yb, round(delta, 6), round(z, 6))
        return out

    def test_python_parity(self, spark):
        docs_a = ["alpha beta gamma", "alpha alpha delta", "beta zing"]
        docs_b = ["beta gamma gamma", "epsilon zing zing", "gamma"]
        da = spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs_a)], "doc_id long, text string"
        )
        db = spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs_b)], "doc_id long, text string"
        )
        got = {
            r.token: (r.cnt_a, r.cnt_b, r.delta, r.z)
            for r in textstats.token_drift(da, db, min_count=1).collect()
        }
        assert got == self._drift_py(docs_a, docs_b)

    def test_planted_drift_sign_and_rank(self, spark):
        # 'spam' floods snapshot B only: its z must be the most
        # negative; a token unique to A must be positive
        docs_a = ["clean text about spark tables"] * 5
        docs_b = ["spam spam spam buy now"] * 5
        da = spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs_a)], "doc_id long, text string"
        )
        db = spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs_b)], "doc_id long, text string"
        )
        rows = textstats.token_drift(da, db, min_count=1).collect()
        z = {r.token: r.z for r in rows}
        assert min(z, key=z.get) == "spam"
        assert z["spark"] > 0 and z["spam"] < 0

    def test_min_count_gates_combined(self, spark):
        da = spark.createDataFrame([(1, "aa bb")], "doc_id long, text string")
        db = spark.createDataFrame([(1, "aa cc")], "doc_id long, text string")
        toks = {
            r.token
            for r in textstats.token_drift(da, db, min_count=2).collect()
        }
        assert toks == {"aa"}

    def test_validation(self, spark):
        d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            textstats.token_drift(d, d, alpha0=0.0)


class TestEmLinkage:
    def _em_py(self, counts, f, iters=4, p0=0.1, m0=0.9, u0=0.1):
        """counts: {pattern tuple: n}; returns (p, m[], u[])."""
        eps = 1e-6

        def clamp(x):
            return min(max(round(x, 9), eps), 1.0 - eps)

        p, m, u = p0, [m0] * f, [u0] * f
        for _ in range(iters):
            sw = snw = 0.0
            swg, snwg = [0.0] * f, [0.0] * f
            nn = 0
            for g, n in counts.items():
                pm = pu = 1.0
                for j in range(f):
                    pm *= m[j] if g[j] else 1.0 - m[j]
                    pu *= u[j] if g[j] else 1.0 - u[j]
                w = round(p * pm / (p * pm + (1.0 - p) * pu), 9)
                sw += n * w
                snw += n * (1.0 - w)
                nn += n
                for j in range(f):
                    if g[j]:
                        swg[j] += n * w
                        snwg[j] += n * (1.0 - w)
            p = clamp(sw / nn)
            m = [clamp(swg[j] / sw) for j in range(f)]
            u = [clamp(snwg[j] / snw) for j in range(f)]
        return p, m, u

    def _pairs(self, spark, counts):
        rows = []
        for g, n in counts.items():
            rows += [tuple(int(x) for x in g)] * n
        return spark.createDataFrame(rows, "f1 int, f2 int")

    COUNTS = {
        (1, 1): 40, (1, 0): 15, (0, 1): 25, (0, 0): 320,
    }

    def test_python_parity(self, spark):
        from coies_spark.ops.linkage import em_linkage

        got = {r.field: (r.m, r.u, r.p) for r in em_linkage(
            self._pairs(spark, self.COUNTS), ["f1", "f2"], iters=4
        ).collect()}
        p, m, u = self._em_py(self.COUNTS, 2)
        # python float sums over 4 patterns == decimal sums of
        # 9dp-rounded terms here because every term is exact at 9dp
        assert got["f1"] == (pytest.approx(m[0], abs=1e-9),
                             pytest.approx(u[0], abs=1e-9),
                             pytest.approx(p, abs=1e-9))
        assert got["f2"] == (pytest.approx(m[1], abs=1e-9),
                             pytest.approx(u[1], abs=1e-9),
                             pytest.approx(p, abs=1e-9))

    def test_separates_planted_mixture(self, spark):
        from coies_spark.ops.linkage import em_linkage

        # matches (10%) agree on both fields, non-matches rarely do:
        # EM must learn m >> u for both fields
        counts = {(1, 1): 50, (1, 0): 30, (0, 1): 30, (0, 0): 390}
        got = {r.field: r for r in em_linkage(
            self._pairs(spark, counts), ["f1", "f2"], iters=6
        ).collect()}
        for f in ("f1", "f2"):
            assert got[f].m > got[f].u

    def test_scores_monotone_in_agreement(self, spark):
        from coies_spark.ops.linkage import linkage_scores

        df = linkage_scores(
            self._pairs(spark, self.COUNTS), ["f1", "f2"], iters=4
        )
        w = {(r.f1, r.f2): r.match_weight for r in df.collect()}
        assert w[(1, 1)] > w[(1, 0)] > w[(0, 0)]
        assert w[(1, 1)] > w[(0, 1)] > w[(0, 0)]

    def test_nulls_count_as_disagreement(self, spark):
        from coies_spark.ops.linkage import comparison_patterns

        pairs = spark.createDataFrame(
            [(1, None), (1, 0), (None, None)], "f1 int, f2 int"
        )
        got = {(r.f1, r.f2): r.n
               for r in comparison_patterns(pairs, ["f1", "f2"]).collect()}
        assert got == {(1, 0): 2, (0, 0): 1}

    def test_validation(self, spark):
        from coies_spark.ops.linkage import comparison_patterns, em_linkage

        p = self._pairs(spark, {(1, 1): 1})
        with pytest.raises(ValueError):
            em_linkage(p, ["f1", "f2"], iters=0)
        with pytest.raises(ValueError):
            em_linkage(p, ["f1", "f2"], p0=1.5)
        with pytest.raises(ValueError):
            comparison_patterns(p, [])


class TestCompactionPlan:
    def _manifest(self, spark, rows):
        return spark.createDataFrame(
            rows, "partition string, path string, bytes long"
        )

    def test_groups_fill_to_target(self, spark):
        from coies_spark.ops.maintenance import compaction_plan

        rows = [("p1", f"f{i}", 40) for i in range(10)]
        out = compaction_plan(
            self._manifest(spark, rows), target_bytes=100
        ).collect()
        assert len(out) == 10
        by = {}
        for r in out:
            by.setdefault(r.group_id, []).append(r.bytes)
        # 40-byte files at target 100: offset chunks of ~100 bytes
        # (a group may overflow by less than one file)
        for g, sizes in by.items():
            assert sum(sizes) <= 100 + 40

    def test_large_files_and_singletons_excluded(self, spark):
        from coies_spark.ops.maintenance import compaction_plan

        rows = [
            ("p1", "big", 5000),     # >= target: already compact
            ("p1", "a", 90), ("p1", "b", 80),
            ("p2", "lone", 30),      # singleton group: no-op rewrite
        ]
        out = compaction_plan(
            self._manifest(spark, rows), target_bytes=200
        ).collect()
        assert sorted(r.path for r in out) == ["a", "b"]
        [g] = {r.group_id for r in out}
        assert g == 0 and out[0].group_bytes == 170

    def test_ffd_order_is_deterministic(self, spark):
        from coies_spark.ops.maintenance import compaction_plan

        rows = [("p1", f"f{i}", 10 + (i * 37) % 50) for i in range(30)]
        m = self._manifest(spark, rows)
        r1 = sorted(map(tuple, compaction_plan(m, 120).collect()))
        r2 = sorted(map(tuple, compaction_plan(
            m.repartition(7), 120).collect()))
        assert r1 == r2

    def test_validation(self, spark):
        from coies_spark.ops.maintenance import compaction_plan

        with pytest.raises(ValueError):
            compaction_plan(self._manifest(spark, []), 0)


class TestOphSignatures:
    def test_densified_and_agrees_on_identical_docs(self, spark):
        from coies_spark.ops.dedup import oph_signatures_wide

        d = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon"),
             (2, "alpha beta gamma delta epsilon"),
             (3, "totally different words here now")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in oph_signatures_wide(d).collect()}
        cols = [f"m{i}" for i in range(8)]
        # every bucket densified (no NULLs) and carries the marker
        for r in rows.values():
            assert all(r[c] is not None and ":" in r[c] for c in cols)
        # identical docs -> identical signatures; different docs differ
        assert [rows[1][c] for c in cols] == [rows[2][c] for c in cols]
        assert [rows[1][c] for c in cols] != [rows[3][c] for c in cols]

    def test_short_doc_borrows_with_distance(self, spark):
        from coies_spark.ops.dedup import oph_signatures_wide

        # a doc with exactly ONE 3-shingle fills one bucket; all
        # others must borrow it with distance markers 1..7 (cyclic)
        d = spark.createDataFrame(
            [(1, "only three tokens")], "doc_id long, text string"
        )
        [r] = oph_signatures_wide(d).collect()
        dists = sorted(int(r[f"m{i}"].split(":")[1]) for i in range(8))
        assert dists == list(range(8))
        assert len({r[f"m{i}"].split(":")[0] for i in range(8)}) == 1

    def test_oph_pairs_find_planted_dups(self, spark):
        from coies_spark.ops.dedup import oph_candidate_pairs

        texts = [
            (i, f"document number {i} about spark tables and streams "
                f"with enough distinct tokens {i * 7}")
            for i in range(20)
        ]
        texts.append((100, texts[5][1]))  # exact twin of doc 5
        d = spark.createDataFrame(texts, "doc_id long, text string")
        pairs = {(r.doc_a, r.doc_b)
                 for r in oph_candidate_pairs(d).collect()}
        assert (5, 100) in pairs

    def test_validation(self, spark):
        from coies_spark.ops.dedup import oph_signatures_wide

        d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            oph_signatures_wide(d, num_buckets=1)


class TestToolSequenceScore:
    def test_common_chain_scores_below_rare(self, spark):
        rows = []
        # 10 conversations with the common chain search -> code
        for c in range(10):
            rows += [(f"c{c}", 0, "user", "q", "search", 0),
                     (f"c{c}", 1, "assistant", "a", "code", 1)]
        # one conversation takes a rare turn: search -> browse
        rows += [("odd", 0, "user", "q", "search", 0),
                 ("odd", 1, "assistant", "a", "browse", 1)]
        t = _tx(spark, rows)
        got = {r.conv_id: r for r in
               transcripts.tool_sequence_score(t).collect()}
        assert got["odd"].avg_nll > got["c0"].avg_nll
        assert got["c0"].n_transitions == 2

    def test_python_parity(self, spark):
        import math as m

        rows = [
            ("a", 0, "u", "x", "s", 0), ("a", 1, "u", "x", "c", 1),
            ("a", 2, "u", "x", None, 2), ("a", 3, "u", "x", "c", 3),
            ("b", 0, "u", "x", "c", 0), ("b", 1, "u", "x", "s", 1),
        ]
        t = _tx(spark, rows)
        # transitions: a: <start>->s, s->c, c->c ; b: <start>->c, c->s
        edges = {("<start>", "s"): 1, ("s", "c"): 1, ("c", "c"): 1,
                 ("<start>", "c"): 1, ("c", "s"): 1}
        srcs = {"<start>": 2, "s": 1, "c": 2}
        def cost(s, d):
            return round(-m.log(edges[(s, d)] / srcs[s]), 9)
        expect = {
            "a": [cost("<start>", "s"), cost("s", "c"), cost("c", "c")],
            "b": [cost("<start>", "c"), cost("c", "s")],
        }
        got = {r.conv_id: r for r in
               transcripts.tool_sequence_score(t).collect()}
        for cid, cs in expect.items():
            assert got[cid].n_transitions == len(cs)
            assert got[cid].nll == pytest.approx(round(sum(cs), 6), abs=2e-6)
            assert got[cid].avg_nll == pytest.approx(
                round(sum(cs) / len(cs), 6), abs=2e-6)


class TestCalibrationBins:
    def test_bins_and_rates(self, spark):
        from coies_spark.ops.classify import calibration_bins

        rows = [(1, 0.05, 0.0), (2, 0.12, 0.0), (3, 0.17, 1.0),
                (4, 0.95, 1.0), (5, 1.0, 1.0), (6, 0.5, None)]
        scored = spark.createDataFrame(
            rows, "doc_id long, p double, y double"
        )
        got = {r.bin: r for r in calibration_bins(scored).collect()}
        assert set(got) == {0, 1, 9}
        assert (got[1].n, got[1].n_pos) == (2, 1)
        assert got[1].pos_rate == 0.5
        # p = 1.0 folds into the TOP bin, not a phantom bin 10
        assert got[9].n == 2 and got[9].n_pos == 2
        assert got[0].pos_rate == 0.0

    def test_validation(self, spark):
        from coies_spark.ops.classify import calibration_bins

        scored = spark.createDataFrame(
            [(1, 0.5, 1.0)], "doc_id long, p double, y double"
        )
        with pytest.raises(ValueError):
            calibration_bins(scored, bins=1)


class TestPersonalizedPagerank:
    def _ppr_py(self, edges, seeds, iters=3, d=0.85):
        sym = set()
        for a, b in edges:
            if a != b:
                sym.add((a, b))
                sym.add((b, a))
        nodes = sorted({a for a, _ in sym} | set(seeds))
        deg = {}
        for a, _ in sym:
            deg[a] = deg.get(a, 0) + 1
        r0 = {n: round(1.0 / len(seeds), 9) if n in seeds else 0.0
              for n in nodes}
        pr = dict(r0)
        for _ in range(iters):
            s = {n: 0.0 for n in nodes}
            for a, b in sym:
                s[b] += pr[a] / deg[a]
            pr = {n: round((1.0 - d) * r0[n] + d * s[n], 9)
                  for n in nodes}
        return pr

    def test_python_parity_hand_graph(self, spark):
        from coies_spark.operators.graph import personalized_pagerank

        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
                 ("a", "c"), ("e", "f")]
        e = spark.createDataFrame(edges, "src string, dst string")
        seeds = spark.createDataFrame([("a",)], ["node"])
        got = {r.node: r.ppr
               for r in personalized_pagerank(e, seeds).collect()}
        expect = self._ppr_py(edges, ["a"])
        assert got == pytest.approx(expect, abs=2e-9)

    def test_mass_concentrates_near_seed(self, spark):
        from coies_spark.operators.graph import personalized_pagerank

        # chain a-b-c-d-e-f seeded at a: ppr must decay with distance
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
                 ("e", "f")]
        e = spark.createDataFrame(edges, "src string, dst string")
        seeds = spark.createDataFrame([("a",)], ["node"])
        got = {r.node: r.ppr
               for r in personalized_pagerank(e, seeds).collect()}
        assert got["a"] > got["c"] > got["e"]

    def test_edgeless_seed_keeps_restart_share(self, spark):
        from coies_spark.operators.graph import personalized_pagerank

        e = spark.createDataFrame([("x", "y")], "src string, dst string")
        seeds = spark.createDataFrame([("lonely",), ("x",)], ["node"])
        got = {r.node: r.ppr
               for r in personalized_pagerank(e, seeds).collect()}
        # isolated seed: ppr = (1-d)*0.5 every round (no in-edges)
        assert got["lonely"] == pytest.approx(0.075, abs=1e-9)


class TestMixtureRates:
    def test_rates_and_feasibility(self, spark):
        from coies_spark.ops.sampling import mixture_rates

        docs = spark.createDataFrame(
            [(1, "en", 100), (2, "en", 300), (3, "fr", 50),
             (4, "zh", 1000)],
            "doc_id long, lang string, n_tokens long",
        )
        got = {r.stratum: r for r in mixture_rates(
            docs, {"en": 0.5, "fr": 0.5}, budget_tokens=400
        ).collect()}
        # en: want 200 of 400 available -> rate 0.5, feasible
        assert got["en"].rate == 0.5 and got["en"].feasible
        # fr: want 200 of 50 -> rate capped at 1.0, NOT feasible
        assert got["fr"].rate == 1.0 and not got["fr"].feasible
        # zh absent from targets: mixed out, rate 0
        assert got["zh"].rate == 0.0 and got["zh"].target_share == 0.0

    def test_validation(self, spark):
        from coies_spark.ops.sampling import mixture_rates

        docs = spark.createDataFrame(
            [(1, "en", 10)], "doc_id long, lang string, n_tokens long"
        )
        with pytest.raises(ValueError):
            mixture_rates(docs, {"en": 1.0}, budget_tokens=0)


class TestLinkageClusters:
    def test_end_to_end_clusters(self, spark):
        from coies_spark.ops.linkage import linkage_clusters

        # two clear duplicate groups (agree on both fields) and noise
        # pairs (agree on nothing): EM learns the mixture, the
        # threshold keeps only the agreeing pairs, CC merges chains
        rows = [
            ("a1", "a2", 1, 1), ("a2", "a3", 1, 1),  # chain a1-a2-a3
            ("b1", "b2", 1, 1),
            ("a1", "b1", 0, 0), ("a3", "b2", 0, 0),  # noise
        ] + [(f"x{i}", f"y{i}", 0, 0) for i in range(60)]
        pairs = spark.createDataFrame(
            rows, "id_a string, id_b string, f1 int, f2 int"
        )
        got = {r.node: r.component for r in linkage_clusters(
            pairs, ["f1", "f2"], threshold=1.0, iters=5
        ).collect()}
        assert got["a1"] == got["a2"] == got["a3"] == "a1"
        assert got["b1"] == got["b2"] == "b1"
        # noise records never cross the threshold -> not in any cluster
        assert "x0" not in got and "y0" not in got


class TestTripleDiff:
    def _beliefs(self, spark, rows):
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string, confidence double"
        )

    def test_all_statuses(self, spark):
        from coies_spark.ops.kg import triple_diff

        old = self._beliefs(spark, [
            ("a", "p", "x", 0.5),   # removed
            ("b", "p", "y", 0.5),   # changed
            ("c", "p", "z", 0.7),   # unchanged -> dropped
        ])
        new = self._beliefs(spark, [
            ("b", "p", "y", 0.9),
            ("c", "p", "z", 0.7),
            ("d", "p", "w", 0.4),   # added
        ])
        got = {(r.subj, r.status): (r.conf_old, r.conf_new)
               for r in triple_diff(old, new).collect()}
        assert got == {
            ("a", "removed"): (0.5, None),
            ("b", "changed"): (0.5, 0.9),
            ("d", "added"): (None, 0.4),
        }
        kept = triple_diff(old, new, keep_unchanged=True).count()
        assert kept == 4


class TestConversationContamination:
    def test_cross_turn_shingles_catch_split_benchmark(self, spark):
        from coies_spark.ops import dedup
        from coies_spark.ops.transcripts import conversation_docs

        # the benchmark item's 3-gram spans a TURN BOUNDARY in the
        # transcript: only cross-boundary shingling can catch it
        t = _tx(spark, [
            ("c1", 0, "user", "alpha beta", None, 0),
            ("c1", 1, "assistant", "gamma delta", None, 1),
            ("c2", 0, "user", "completely unrelated words here", None, 0),
        ])
        bench = spark.createDataFrame(
            [(900, "alpha beta gamma delta")], "doc_id long, text string"
        )
        got = dedup.contamination_pairs(
            conversation_docs(t), bench, n=3, min_overlap=0.5
        ).collect()
        hit = {(r.doc_id, r.bench_id): r.contaminated for r in got}
        assert hit == {("c1", 900): True}


class TestZorderKey:
    def test_exact_morton_small_case(self, spark):
        from coies_spark.ops.maintenance import zorder_key

        # x,y in 0..3 with bits=2: normalized v = (v*3)//3 = v, so
        # zkey is the plain 2-bit Morton interleave
        rows = [(x, y) for x in range(4) for y in range(4)]
        df = spark.createDataFrame(rows, "x long, y long")
        got = {(r.x, r.y): r.zkey
               for r in zorder_key(df, ["x", "y"], bits=2).collect()}

        def morton(x, y):
            z = 0
            for b in range(2):
                z |= ((x >> b) & 1) << (2 * b)
                z |= ((y >> b) & 1) << (2 * b + 1)
            return z

        assert got == {(x, y): morton(x, y)
                       for x in range(4) for y in range(4)}

    def test_locality_beats_single_column_sort(self, spark):
        from coies_spark.ops.maintenance import zorder_key

        # on a grid, rows sorted by zkey then cut into files give
        # tighter per-file Y ranges than sorting by X alone — the
        # data-skipping property
        rows = [(x, y) for x in range(16) for y in range(16)]
        df = spark.createDataFrame(rows, "x long, y long")
        z = sorted(
            zorder_key(df, ["x", "y"], bits=4).collect(),
            key=lambda r: r.zkey,
        )
        files = [z[i:i + 32] for i in range(0, 256, 32)]
        z_spread = sum(
            max(r.y for r in f) - min(r.y for r in f) for f in files
        )
        xs = sorted(rows)
        xfiles = [xs[i:i + 32] for i in range(0, 256, 32)]
        x_spread = sum(
            max(y for _, y in f) - min(y for _, y in f) for f in xfiles
        )
        assert z_spread < x_spread

    def test_constant_column_maps_to_zero(self, spark):
        from coies_spark.ops.maintenance import zorder_key

        df = spark.createDataFrame(
            [(1, 7), (2, 7), (3, 7)], "x long, y long"
        )
        got = zorder_key(df, ["x", "y"], bits=4).collect()
        # y constant -> contributes 0 bits; key is x's bits spread
        # onto even positions
        for r in got:
            assert r.zkey >= 0
            for b in range(4):
                assert (r.zkey >> (2 * b + 1)) & 1 == 0

    def test_validation(self, spark):
        from coies_spark.ops.maintenance import zorder_key

        df = spark.createDataFrame([(1, 2)], "x long, y long")
        with pytest.raises(ValueError):
            zorder_key(df, ["x"])
        with pytest.raises(ValueError):
            zorder_key(df, ["x", "y"], bits=32)


class TestPairRecall:
    def test_counts_and_orientation(self, spark):
        from coies_spark.ops.dedup import pair_recall

        truth = spark.createDataFrame(
            [(1, 2), (3, 4), (5, 6)], "doc_a long, doc_b long"
        )
        # candidate route: finds 2 of 3 (one flipped), plus 1 false
        # positive and 1 duplicate emission
        cand = spark.createDataFrame(
            [(2, 1), (3, 4), (3, 4), (7, 8)], "doc_a long, doc_b long"
        )
        [r] = pair_recall(truth, cand).collect()
        assert (r.n_true, r.n_candidates, r.n_hit) == (3, 3, 2)
        assert r.recall == round(2 / 3, 6) and r.precision == round(2 / 3, 6)

    def test_empty_truth_reports_null(self, spark):
        from coies_spark.ops.dedup import pair_recall

        empty = spark.createDataFrame([], "doc_a long, doc_b long")
        cand = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
        [r] = pair_recall(empty, cand).collect()
        assert r.n_true == 0 and r.recall is None and r.precision == 0.0


class TestLeakageFreeSplit:
    def test_clusters_never_straddle(self, spark):
        from coies_spark.ops.sampling import leakage_free_split

        docs = spark.createDataFrame(
            [(i, f"t{i}") for i in range(30)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (5, 6), (10, 11)], "doc_a long, doc_b long"
        )
        out = leakage_free_split(docs, pairs, test_fraction=0.3).collect()
        assert len(out) == 30
        side = {r.doc_id: r.split for r in out}
        group = {r.doc_id: r.group_key for r in out}
        for a, b in [(0, 1), (1, 2), (5, 6), (10, 11)]:
            assert side[a] == side[b] and group[a] == group[b]
        assert {r.split for r in out} == {"train", "test"}

    def test_nested_fractions(self, spark):
        from coies_spark.ops.sampling import leakage_free_split

        docs = spark.createDataFrame(
            [(i, f"t{i}") for i in range(120)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame([], "doc_a long, doc_b long")
        t10 = {r.doc_id for r in leakage_free_split(
            docs, pairs, 0.1).collect() if r.split == "test"}
        t30 = {r.doc_id for r in leakage_free_split(
            docs, pairs, 0.3).collect() if r.split == "test"}
        assert t10 < t30  # strictly nested

    def test_validation(self, spark):
        from coies_spark.ops.sampling import leakage_free_split

        d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        p = spark.createDataFrame([], "doc_a long, doc_b long")
        with pytest.raises(ValueError):
            leakage_free_split(d, p, test_fraction=0.0)


class TestLinkPredictionMrr:
    def test_perfect_scorer_on_clique(self, spark):
        from coies_spark.operators.graph import link_prediction_mrr

        # an 8-clique (node names chosen so the md5 edge-holdout is
        # non-empty at 0.3): any held-out edge's endpoints still
        # share ~6 neighbors on the train graph — the hidden partner
        # should rank near the top, mrr high
        nodes = [f"v{i}" for i in range(8)]
        rows = [(a, b) for i, a in enumerate(nodes)
                for b in nodes[i + 1:]]
        e = spark.createDataFrame(rows, "src string, dst string")
        [r] = link_prediction_mrr(e, holdout_fraction=0.3).collect()
        assert r.n_holdout >= 1
        assert r.mrr is not None and r.mrr > 0.3

    def test_empty_holdout_reports_null(self, spark):
        from coies_spark.operators.graph import link_prediction_mrr

        e = spark.createDataFrame(
            [("a", "b")], "src string, dst string"
        )
        # tiny fraction: the single edge hashes above the threshold
        [r] = link_prediction_mrr(e, holdout_fraction=0.0001).collect()
        if r.n_holdout == 0:
            assert r.mrr is None and r.hits_at_1 is None

    def test_validation(self, spark):
        from coies_spark.operators.graph import link_prediction_mrr

        e = spark.createDataFrame([("a", "b")], "src string, dst string")
        with pytest.raises(ValueError):
            link_prediction_mrr(e, holdout_fraction=0.0)


def test_pair_recall_gauges_oph_against_classic(spark):
    """Composition: pair_recall measures the OPH band route against
    the classic MinHash band route's candidates on a planted-dup
    corpus — both routes must recover every planted exact twin
    (recall 1.0 on that truth set)."""
    from coies_spark.ops.dedup import (
        lsh_candidate_pairs,
        oph_candidate_pairs,
        pair_recall,
    )

    texts = [
        (i, f"document number {i} about spark tables and streams "
            f"with enough distinct tokens {i * 7} to shingle")
        for i in range(30)
    ]
    twins = [(1000 + i, texts[i][1]) for i in range(6)]  # exact twins
    d = spark.createDataFrame(texts + twins, "doc_id long, text string")
    truth = spark.createDataFrame(
        [(i, 1000 + i) for i in range(6)], "doc_a long, doc_b long"
    )
    for route in (lsh_candidate_pairs, oph_candidate_pairs):
        [r] = pair_recall(truth, route(d)).collect()
        assert r.recall == 1.0, route.__name__


class TestBgpQuery:
    def _triples(self, spark, rows):
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )

    def test_shared_variable_join(self, spark):
        from coies_spark.ops.kg import bgp_query

        t = self._triples(spark, [
            ("c1", "uses", "spark"), ("c1", "calls", "scan"),
            ("c2", "uses", "spark"), ("c3", "calls", "scan"),
            ("c1", "calls", "join"),
        ])
        got = {(r.c, r.o) for r in bgp_query(t, [
            ("?c", "uses", "spark"), ("?c", "calls", "?o"),
        ]).collect()}
        assert got == {("c1", "scan"), ("c1", "join")}

    def test_repeated_variable_in_pattern(self, spark):
        from coies_spark.ops.kg import bgp_query

        t = self._triples(spark, [
            ("a", "same_as", "a"), ("a", "same_as", "b"),
        ])
        got = {r.x for r in bgp_query(
            t, [("?x", "same_as", "?x")]).collect()}
        assert got == {"a"}

    def test_disconnected_patterns_cross(self, spark):
        from coies_spark.ops.kg import bgp_query

        t = self._triples(spark, [
            ("a", "p", "x"), ("b", "q", "y"),
        ])
        got = {(r.u, r.v) for r in bgp_query(t, [
            ("?u", "p", "x"), ("?v", "q", "y"),
        ]).collect()}
        assert got == {("a", "b")}

    def test_set_semantics(self, spark):
        from coies_spark.ops.kg import bgp_query

        t = self._triples(spark, [
            ("c1", "uses", "spark"), ("c1", "uses", "spark"),
        ])
        assert bgp_query(t, [("?c", "uses", "spark")]).count() == 1

    def test_validation(self, spark):
        from coies_spark.ops.kg import bgp_query

        t = self._triples(spark, [("a", "p", "x")])
        with pytest.raises(ValueError):
            bgp_query(t, [])
        with pytest.raises(ValueError):
            bgp_query(t, [("a", "p", "x")])
