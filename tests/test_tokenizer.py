"""In-engine BPE — training and application vs a reference Python
implementation (leftmost non-overlapping merge semantics)."""

from __future__ import annotations

import hashlib


SEP = "\x1f"


def _py_merge(syms, a, b):
    """The engine's merge rule: single-pass leftmost string replace
    over the separator-joined state (see the tokenizer module's
    variant note)."""
    s = SEP + SEP.join(syms) + SEP
    s = s.replace(SEP + a + SEP + b + SEP, SEP + a + b + SEP)
    return s[1:-1].split(SEP)


def _py_train(word_counts, n_merges):
    states = {w: (list(w), n) for w, n in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, n in states.values():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + n)
        if not counts:
            break
        (a, b), cnt = min(counts.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((a, b, cnt))
        states = {w: (_py_merge(s, a, b), n)
                  for w, (s, n) in states.items()}
    return merges


def test_bpe_train_matches_python_model(spark):
    from loongcollector_spark.functions.tokenizer import (
        bpe_train, word_frequencies,
    )

    texts = [
        "low low low low low", "lower lower newest newest",
        "newest newest newest newest", "wider wider new new low",
        "lowest newest wide wide", "low lower lowest",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    wc = {r["word"]: r["n"] for r in word_frequencies(df).collect()}
    want = _py_train(wc, 8)
    got = bpe_train(df, n_merges=8)
    assert got == want
    # the classic corpus learns multi-char merges, not just bigrams
    assert any(len(a) + len(b) > 2 for a, b, _ in got)


def test_bpe_encode_matches_python_model(spark):
    from loongcollector_spark.functions.tokenizer import (
        bpe_encode, bpe_train,
    )

    texts = ["low lower lowest", "newest new wide", "low low newest",
             "", "   ", "白日"]  # empty + non-ASCII words drop out
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges = bpe_train(df, n_merges=6)
    out = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    assert set(out) == {0, 1, 2}  # blank/non-ASCII docs vanish

    def tokenize(word):
        syms = list(word)
        for a, b, _ in merges:
            syms = _py_merge(syms, a, b)
        return syms

    for i in (0, 1, 2):
        words = texts[i].split()
        toks = [" ".join(tokenize(w)) for w in words]
        assert out[i]["n_words"] == len(words)
        assert out[i]["n_tokens"] == sum(len(tokenize(w)) for w in words)
        want_md5 = hashlib.md5(" ".join(toks).encode()).hexdigest()
        assert out[i]["tokens_md5"] == want_md5


def test_bpe_leftmost_nonoverlap_merge(spark):
    """Run semantics pinned: 'aaa' merges canonically to [aa, a]; 'aaaa'
    follows the documented replace variant [aa, a, a] — identically in
    the engine and the model."""
    from loongcollector_spark.functions.tokenizer import bpe_encode

    df = spark.createDataFrame([(0, "aaa aaaa")], "doc_id long, text string")
    r = bpe_encode(df, [("a", "a", 0)]).collect()[0]
    # aaa -> [aa, a] (canonical); aaaa -> [aa, a, a] (the documented
    # run-of-4 variant: the replace consumes the boundary separator)
    want = hashlib.md5(b"aa a aa a a").hexdigest()
    assert r["tokens_md5"] == want and r["n_tokens"] == 5


def test_bpe_vocab_ids(spark):
    from loongcollector_spark.functions.tokenizer import (
        bpe_train, bpe_vocab,
    )

    df = spark.createDataFrame(
        [(0, "low low lower lowest newest newest")],
        "doc_id long, text string")
    merges = bpe_train(df, n_merges=4)
    vocab = {r["sym"]: r["token_id"] for r in bpe_vocab(df, merges).collect()}
    # merged symbols take their rank ids
    for i, (a, b, _c) in enumerate(merges):
        assert vocab[a + b] in range(4)
    # base chars: every char of the corpus words, ids from n_merges up,
    # sorted order, no duplicates
    base = sorted((tid, s) for s, tid in vocab.items() if tid >= 4)
    syms = [s for _t, s in base]
    assert syms == sorted(syms)
    assert set("lowerst") <= set(vocab)
    assert len(set(vocab.values())) == len(vocab)


def test_bpe_roundtrip_is_lossless(spark):
    """decode(encode(x)) == x for every kept word — the decoded per-doc
    fingerprint equals the hash of the original kept words, including
    under the documented same-symbol-run merge variant ('aaaa')."""
    from loongcollector_spark.functions.tokenizer import (
        bpe_roundtrip, bpe_train,
    )

    texts = ["low lower lowest", "aaaa aaa aa", "newest new wide",
             "", "白日 mixed ascii-word"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges = bpe_train(df, n_merges=6)
    out = {r["doc_id"]: r for r in bpe_roundtrip(df, merges).collect()}
    for i, text in enumerate(texts):
        kept = [w for w in text.split() if w.isascii() and w.isprintable()
                and " " not in w and w != ""]
        if not kept:
            assert i not in out
            continue
        want = hashlib.md5(" ".join(kept).encode()).hexdigest()
        assert out[i]["n_words"] == len(kept)
        assert out[i]["decoded_md5"] == want
