"""Byte-pair-encoding tokenizer: distributed training and encoding.

Implements the classic BPE training loop of Sennrich et al. 2016
("Neural Machine Translation of Rare Words with Subword Units") as a
driver-coordinated fixpoint over the WORD-FREQUENCY table — the same
shape as GPT-2/SentencePiece-style subword vocabularies, and the one
tokenizer-construction step a training-data pipeline runs over its own
corpus before token counting / packing can use a real vocabulary.

Why this scales: the loop state is the distinct-word table (``(word,
freq, repr)``), whose size is the corpus VOCABULARY — bounded and tiny
relative to the corpus (heaps' law: ~10^6-10^7 rows even at 100 TB of
text), built by one corpus-wide count aggregate.  Each merge round then
costs one pair-count aggregate plus one argmax over that small table —
a driver-coordinated sequential fixpoint exactly like connected
components (clusters.py): the per-round driver action is inherent to
the algorithm (merge i+1 depends on merge i), not a scalability bug.
Lineage is truncated with localCheckpoint every few rounds so the plan
does not grow linearly with the merge count.

Determinism: the argmax tie-breaks on the pair itself (count DESC,
symbol-pair ASC), so the learned merge sequence is a pure function of
the corpus — partitioning-invariant, rerun-stable (pinned by a
repartition-invariance test).

Encoding applies the learned merges IN ORDER with left-to-right
non-overlapping regex replaces over a space-separated symbol string —
the greedy application order of the reference algorithm.  Lookaround
anchors keep the separator spaces unconsumed so adjacent merge sites
both fire in one pass ("l l l" → "ll l", not "l l l" → "ll l" only when
scanning twice).  All column-expression work — no UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pedsnetdcc_spark.util import ensure_parallelism


def _java_escape_replacement(s: str) -> str:
    return s.replace("\\", "\\\\").replace("$", "\\$")


def _merge_pattern(a: str, b: str) -> str:
    return f"(?<= ){re.escape(a)} {re.escape(b)}(?= )"


def word_frequencies(
    df: DataFrame, text_col: str = "text", sep: str = " "
) -> DataFrame:
    """Corpus word-frequency table ``(word, freq)`` — one explode + one
    count aggregate (map-side partial)."""
    df = ensure_parallelism(df)
    return (
        df.select(F.explode(F.split(F.col(text_col), sep)).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 32,
    min_freq: int = 2,
    checkpoint_every: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merge rules from the corpus; returns
    the ordered merge list (the tokenizer).  Stops early when the best
    remaining pair occurs fewer than ``min_freq`` times.

    Per round: explode adjacent symbol pairs of each distinct word
    (weighted by word frequency), aggregate, take the deterministic
    argmax (TakeOrdered limit-1 — no global sort), and rewrite the
    symbol representations with one regex replace.  The driver holds
    only the merge list and the 1-row argmax.

    The word-frequency table is localCheckpoint-ed BEFORE round 1 and
    the state is re-checkpointed every ``checkpoint_every`` rounds
    (lazy — the round's own argmax action materializes it, so no extra
    job): each round's collect otherwise replays the FULL lineage —
    the corpus-wide explode + count shuffle plus every earlier round's
    regexp pass — turning an O(rounds) loop into O(rounds²) work with
    ``rounds`` corpus scans (round-13 measurement: 38 bench jobs for 8
    merges, each round re-running the corpus aggregate).  With the
    default ``checkpoint_every=1`` a round replays exactly one regexp
    pass over the small distinct-word table and the corpus is scanned
    once at round 1.  localCheckpoint storage is disk-backed, so the
    truncated lineage survives cache eviction."""
    state = word_frequencies(df, text_col).select(
        "freq",
        F.concat_ws(" ", F.split(F.col("word"), "")).alias("repr"),
    ).localCheckpoint(eager=False)
    merges: list[tuple[str, str]] = []
    for i in range(num_merges):
        # stage the symbol array before element_at indexes it: an
        # unstaged split("repr") inside the pair lambda re-splits the
        # representation once per adjacent pair (O(symbols²) per word —
        # the re-evaluation trap); the pairs come from one arrays_zip
        # of two slices of the staged column
        st = state.select("freq", F.split(F.col("repr"), " ").alias("__syms"))
        syms = F.col("__syms")
        m = F.greatest(F.size(syms) - 1, F.lit(0))
        pairs = st.select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.slice(syms, 1, m).alias("a"),
                    F.slice(syms, 2, m).alias("b"),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_freq:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        merged = F.regexp_replace(
            F.concat(F.lit(" "), F.col("repr"), F.lit(" ")),
            _merge_pattern(a, b),
            _java_escape_replacement(a + b),
        )
        state = state.withColumn("repr", F.trim(merged))
        if (i + 1) % checkpoint_every == 0:
            state = state.localCheckpoint(eager=False)
    return merges


def bpe_segment(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Column expression segmenting one word into BPE tokens
    (``array<string>``) by applying the learned merges in order."""
    r = F.concat(F.lit(" "), F.concat_ws(" ", F.split(word, "")), F.lit(" "))
    for a, b in merges:
        r = F.regexp_replace(r, _merge_pattern(a, b), _java_escape_replacement(a + b))
    return F.split(F.trim(r), " ")


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
    sep: str = " ",
) -> DataFrame:
    """Append ``out_col``: the document's BPE token sequence (words
    segmented independently, concatenated in order — merges never cross
    word boundaries, per the reference algorithm).  Scan-fused column
    expressions; the merge chain compiles into the projection."""
    df = ensure_parallelism(df)
    words = F.filter(
        F.split(F.col(text_col), sep), lambda w: F.length(w) > 0
    )
    return df.withColumn(
        out_col, F.flatten(F.transform(words, lambda w: bpe_segment(w, merges)))
    )


def bpe_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Per-document token count under the trained tokenizer —
    ``(id, n_bpe_tokens)``; the budget input for sequence packing."""
    df = ensure_parallelism(df)
    enc = bpe_encode(df, text_col, merges)
    return enc.select(
        F.col(id_col), F.size("bpe_tokens").cast("long").alias("n_bpe_tokens")
    )
