

def test_byte_level_bpe_roundtrip_and_merges(spark):
    from replay_spark.preprocessing.bpe import ByteLevelBPETokenizer

    texts = [
        "the cat sat on the mat",
        "The CAT sat!  It's raining cafés © 2026…",
        "low lower lowest",
        "日本語のテキスト mixed with English",
        "",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    bpe = ByteLevelBPETokenizer(num_merges=50, min_pair_count=2).fit(docs)
    assert bpe.merges  # learned something
    out = {
        r["doc_id"]: r["tokens"]
        for r in bpe.transform(docs).collect()
    }
    # LOSSLESS: decode(tokens) == original text, any input, no UNKs
    for i, t in enumerate(texts):
        assert ByteLevelBPETokenizer.decode_tokens(out[i]) == t
    # case preserved (byte-level never lowercases): the decoded
    # doc keeps 'CAT' verbatim (covered by roundtrip, asserted
    # explicitly for the reader)
    assert "CAT" in ByteLevelBPETokenizer.decode_tokens(out[1])
    assert all(out[i] for i in range(4))  # non-empty docs tokenize
    # deterministic re-fit
    bpe2 = ByteLevelBPETokenizer(num_merges=50, min_pair_count=2).fit(docs)
    assert bpe2.merges == bpe.merges
    # frequent word compresses: 'the' (x3 with leading space variants)
    n_tokens_the = len(
        [tok for tok in out[0] if "the" in
         ByteLevelBPETokenizer.decode_tokens([tok])]
    )
    assert n_tokens_the >= 1
