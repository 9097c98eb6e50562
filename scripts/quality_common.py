"""Shared scaffolding for the quality scripts (quality_run /
quality_sweep / make_quality_fixture): reference-corpus paths, ascii
reader, eval stems, gold/human row builders.  One copy so a scoring or
parsing fix can't leave the two evaluation scripts disagreeing about
the same data."""

from __future__ import annotations

import os

REF = "/root/reference/text_files"
EXAMPLE = f"{REF}/example/34-53330.txt"


def read_ref(path: str) -> str:
    from coies_spark.core import textproc

    with open(path, "rb") as f:
        return textproc.ascii_clean(f.read())


def eval_stems() -> list[str]:
    """Test docs = tagged test/<stem> paired with raw aaer/<stem>
    (file_tools.py:103-105 pairing)."""
    return [
        fn[:-4]
        for fn in sorted(os.listdir(f"{REF}/test"))
        if fn.endswith(".txt") and os.path.exists(f"{REF}/aaer/{fn}")
    ]


def gold_rows(stems) -> list[tuple[str, str, str]]:
    """(conv_id, pred, obj) gold triples parsed from the tagged files."""
    from coies_spark.core import textproc

    rows = []
    for stem in stems:
        tt = read_ref(f"{REF}/test/{stem}.txt")
        for pred, ms in textproc.entity_dict(
            textproc.tagged_tokens_from_text(tt)
        ).items():
            for m in ms:
                rows.append((stem, pred, " ".join(m)))
    return rows


def human_gold_rows(stems) -> list[tuple[str, str, str]]:
    """(conv_id, pred, obj) rows from the human_results annotations
    (OneShotTestHuman, oneshot_test.py:311-323).  Entity keys are used
    VERBATIM — the reference scores the typo'd keys ('items', 'itme')
    as misses, and so do we."""
    from coies_spark.core import textproc

    rows = []
    for stem in stems:
        hp = f"{REF}/human_results/{stem}.txt"
        if not os.path.exists(hp):
            continue
        hd = textproc.entity_dict(
            textproc.tagged_tokens_from_text(read_ref(hp))
        )
        for pred, ms in hd.items():
            for m in ms:
                rows.append((stem, pred, " ".join(m)))
    return rows
