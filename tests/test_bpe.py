"""BPE tokenizer: training fixpoint, greedy encoding, determinism.

Training is a driver-coordinated iterative fixpoint (like connected
components) and thus not SQL-oracle-expressible; these tests pin it to
the published algorithm instead: the Sennrich et al. 2016 worked
example, greedy left-to-right application, lossless segmentation, and
partitioning-invariant merge sequences.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pedsnetdcc_spark.datapipe.bpe import (
    bpe_encode,
    bpe_token_counts,
    train_bpe,
    word_frequencies,
)

_CORPUS = ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).strip()


def test_train_bpe_matches_published_example(spark):
    """Sennrich et al. 2016 §3.2 corpus {low:5, lower:2, newest:6,
    widest:3}: first merges are (e,s) [9 occurrences, beats (s,t) on
    the lexicographic tie-break], (es,t), then (l,o) [7, beats (o,w)]."""
    df = spark.createDataFrame([(0, _CORPUS)], ["doc_id", "text"])
    assert train_bpe(df, "text", num_merges=3) == [
        ("e", "s"),
        ("es", "t"),
        ("l", "o"),
    ]


def test_bpe_encode_greedy_and_lossless(spark):
    df = spark.createDataFrame([(0, _CORPUS)], ["doc_id", "text"])
    merges = train_bpe(df, "text", num_merges=3)
    enc = bpe_encode(
        spark.createDataFrame([(1, "lowest newest")], ["doc_id", "text"]),
        "text",
        merges,
    )
    toks = enc.collect()[0]["bpe_tokens"]
    # 'lowest' is unseen; segmentation applies learned merges only
    assert toks == ["lo", "w", "est", "n", "e", "w", "est"]
    # lossless: concatenating tokens reproduces the text sans spaces
    assert "".join(toks) == "lowestnewest"


def test_bpe_encode_adjacent_merge_sites_fire_in_one_pass(spark):
    """Greedy left-to-right: 'lll' under merge (l,l) becomes [ll, l] —
    the separator-space lookarounds keep adjacent sites matchable."""
    df = spark.createDataFrame([(1, "lll llll")], ["doc_id", "text"])
    toks = bpe_encode(df, "text", [("l", "l")]).collect()[0]["bpe_tokens"]
    assert toks == ["ll", "l", "ll", "ll"]


def test_train_bpe_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [(i, _CORPUS) for i in range(8)], ["doc_id", "text"]
    )
    assert train_bpe(df.repartition(1), "text", num_merges=4) == train_bpe(
        df.repartition(8), "text", num_merges=4
    )


def test_train_bpe_min_freq_early_stop(spark):
    """Every pair unique -> nothing reaches min_freq=2, no merges."""
    df = spark.createDataFrame([(0, "abc def")], ["doc_id", "text"])
    assert train_bpe(df, "text", num_merges=5, min_freq=2) == []


def test_bpe_token_counts_on_corpus(spark, sf_dir):
    from pedsnetdcc_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents").limit(50)
    merges = train_bpe(docs, "text", num_merges=8)
    assert len(merges) == 8
    out = bpe_token_counts(docs, "doc_id", "text", merges)
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        assert r["n_bpe_tokens"] >= 1
    enc = bpe_encode(docs, "text", merges)
    glued = enc.select(
        "doc_id",
        (F.concat_ws("", "bpe_tokens") == F.replace(F.col("text"), F.lit(" "), F.lit("")))
        .alias("ok"),
    )
    assert glued.where(~F.col("ok")).count() == 0


def test_bpe_property_lossless_random_corpora(spark):
    """Property (batched into one Spark pass): for random corpora, the
    trained tokenizer's segmentation of ANY document concatenates back
    to the original text sans spaces, and never yields empty tokens —
    pure-Python reference segmentation agrees with the column
    expression."""
    import random

    rng = random.Random(11)
    alphabet = "abcde"
    corpora = []
    for case in range(6):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 8)))
            for _ in range(rng.randrange(3, 25))
        ]
        corpora.append((case, " ".join(words)))
    df = spark.createDataFrame(corpora, ["doc_id", "text"])
    merges = train_bpe(df, "text", num_merges=6, min_freq=1)

    def py_segment(word: str) -> list[str]:
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    enc = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, "text", merges).collect()}
    for doc_id, text in corpora:
        toks = enc[doc_id]
        assert "".join(toks) == text.replace(" ", "")
        assert all(toks), toks
        expect = [t for w in text.split(" ") for t in py_segment(w)]
        assert toks == expect, (doc_id, toks, expect)


def test_bpe_handles_regex_special_symbols(spark):
    """Tokens containing regex metacharacters (punctuation-heavy web
    text) must train and encode correctly — merge patterns and
    replacements are escaped."""
    df = spark.createDataFrame(
        [(0, "a.b a.b a.b $x$ $x$ c\\d c\\d")], ["doc_id", "text"]
    )
    merges = train_bpe(df, "text", num_merges=4, min_freq=2)
    assert merges, merges
    enc = bpe_encode(df, "text", merges).collect()[0]["bpe_tokens"]
    assert "".join(enc) == "a.ba.ba.b$x$$x$c\\dc\\d"
    # the most frequent pair (a, .) or (., b) must actually have merged
    assert any("." in t and len(t) > 1 for t in enc), enc


def test_bpe_oracle_survives_merge_exhaustion(spark, tmp_path):
    """A corpus that runs out of mergeable pairs before the merge
    budget must NOT zero out the unrolled DuckDB oracle: the empty
    argmax rounds leave the vocabulary unchanged (LEFT JOIN ON TRUE),
    matching train_bpe's early stop — both engines still agree on
    every document."""
    import duckdb

    from pedsnetdcc_spark.queries import ORACLES, QUERIES
    from tests.oracle import compare

    docs = spark.createDataFrame(
        [(1, "ab ab"), (2, "ab"), (3, "ab ab ab")],
        "doc_id long, text string",
    )
    docs.coalesce(1).write.parquet(str(tmp_path / "documents"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents/*.parquet')"
    )
    # 'ab' merges once (a,b) then exhausts — 7 of the 8 rounds are empty
    problems = compare(
        QUERIES["bpe_encode"](spark, str(tmp_path)), con, ORACLES["bpe_encode"]
    )
    assert not problems, problems
