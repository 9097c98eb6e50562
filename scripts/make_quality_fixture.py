"""Regenerate tests/data/aaer_cbow512_testvocab.npz from trained-vector
caches (quality_run.py --vec-cache output).

The fixture holds everything test_quality_floor needs to run the
distributed pipeline over the 49 reference test docs without
re-training: the CONTEXT model and (optionally) the GRAM model pruned
to the evaluation vocabulary, plus the corpus-trained phrase merge
table.  Pruning keeps every token of the example + test + raw-twin
documents AND every phrase-merged form of their sentences (gram
lookups hit merged tokens; the MappedEmbedding fallback hits their
parts, which are eval-doc tokens by construction).

float16 quantization is applied only when the dynamic range allows it
(max |v| < 60000); otherwise vectors stay float32 — a silent overflow
to inf would poison every cosine.

Usage: python scripts/make_quality_fixture.py --vec-cache CTX.npz
         [--gram-cache GRAM.npz] [--out tests/data/aaer_cbow512_testvocab.npz]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quality_common import EXAMPLE, REF, eval_stems, read_ref


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vec-cache", required=True)
    ap.add_argument("--gram-cache", default=None)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests",
            "data",
            "aaer_cbow512_testvocab.npz",
        ),
    )
    args = ap.parse_args()

    import numpy as np

    from coies_spark.core import textproc
    from coies_spark.core.embed import PhraseTable
    from coies_spark.core.oneshot import ExtractionConfig

    cfg = ExtractionConfig()

    # ---- phrase table from the FULL corpus (what training used) ---------
    corpus_files = sorted(os.listdir(f"{REF}/aaer"))
    corpus_sentences = []
    for fn in corpus_files:
        corpus_sentences.extend(
            textproc.sentence_tokens(read_ref(f"{REF}/aaer/{fn}"))
        )
    phrases = PhraseTable.train(
        corpus_sentences,
        min_count=cfg.phrase_min_count,
        threshold=cfg.phrase_threshold,
    )

    # ---- evaluation vocabulary -------------------------------------------
    stems = eval_stems()
    eval_texts = [read_ref(EXAMPLE)]
    for stem in stems:
        eval_texts.append(read_ref(f"{REF}/test/{stem}.txt"))
        eval_texts.append(read_ref(f"{REF}/aaer/{stem}.txt"))
    vocab: set[str] = set()
    for text in eval_texts:
        for sent in textproc.sentence_tokens(text):
            vocab.update(sent)
            vocab.update(phrases.merge(sent))
        vocab.update(t for t, _ in textproc.tagged_tokens_from_text(text))
    print(f"eval vocabulary: {len(vocab)} tokens (incl. phrase forms)")

    def prune(path: str) -> tuple[np.ndarray, np.ndarray]:
        z = np.load(path, allow_pickle=False)
        toks, vecs = z["tokens"], z["vecs"]
        keep = [i for i, t in enumerate(toks) if t in vocab]
        if not keep:
            raise ValueError(
                f"{path}: no tokens overlap the evaluation vocabulary — "
                "wrong cache file?"
            )
        kept_v = vecs[keep]
        # quantize unless it would OVERFLOW (inf poisons every cosine);
        # underflow of tiny components to zero is score-neutral
        if kept_v.size and np.abs(kept_v).max() < 6.0e4:
            kept_v = kept_v.astype(np.float16)
        print(f"  {path}: kept {len(keep)}/{len(toks)} as {kept_v.dtype}")
        return np.array([toks[i] for i in keep]), kept_v

    ctx_toks, ctx_vecs = prune(args.vec_cache)
    payload = {
        "tokens": ctx_toks,
        "vecs": ctx_vecs,
        "merge_a": np.array([a for a, _, _ in phrases.to_rows()]),
        "merge_b": np.array([b for _, b, _ in phrases.to_rows()]),
        "merge_out": np.array([m for _, _, m in phrases.to_rows()]),
    }
    if args.gram_cache:
        g_toks, g_vecs = prune(args.gram_cache)
        payload["gram_tokens"] = g_toks
        payload["gram_vecs"] = g_vecs
    np.savez_compressed(args.out, **payload)
    print(f"wrote {args.out} ({os.path.getsize(args.out)//1024} KiB)")


if __name__ == "__main__":
    main()
