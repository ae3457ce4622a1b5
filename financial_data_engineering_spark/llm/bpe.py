"""Distributed byte-pair-encoding (BPE) tokenizer training.

Sennrich et al. 2016's algorithm, expressed for a cluster: the corpus
collapses ONCE to a weighted vocabulary (distinct word → frequency — the
same distinct-collapse move as operators/entity.py), then every merge
iteration runs over |vocab| rows, never over the corpus again:

1. count adjacent symbol pairs, weighted by word frequency — one
   aggregation over map-side-exploded pairs;
2. pick the most frequent pair (ties broken lexicographically for
   determinism) — a 1-row TakeOrdered, control-plane by definition;
3. rewrite every word's symbol array, replacing that pair left-to-right
   non-overlapping — a map-side ``aggregate`` higher-order function, no
   Python, no shuffle.

State per iteration is the (word, freq, syms) frame; ``materialize()``
truncates the per-iteration lineage exactly like the connected-components
fixpoint in llm/dedup.py. At 100 TB the corpus pass happens once; each of
the (typically tens of thousands of) merges costs one small aggregation
over the vocabulary — this is why production BPE trainers all collapse to
word counts first, and the plan here has the same asymptotics.

The single-merge-per-round chain (queries/text.py bpe_merge_candidates is
round 1's candidate table) is inherently sequential — no SQL oracle can
express the loop, so correctness is pinned by a property test against a
pure-Python reference implementation (tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_data_engineering_spark.partitioning import materialize


def _word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """Corpus → (word, freq, syms) with syms = the word's characters."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "syms",
            F.expr(
                "transform(sequence(1, length(word)), "
                "i -> substring(word, i, 1))"
            ),
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent symbol-pair frequencies over the current segmentation."""
    pairs = vocab.filter(F.size("syms") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(syms) - 2), "
                "i -> struct(syms[i] AS left, syms[i + 1] AS right))"
            )
        ).alias("p"),
        "freq",
    )
    return pairs.groupBy("p.left", "p.right").agg(
        F.sum("freq").alias("n_occurrences")
    )


def _merge_pair(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every symbol array, fusing (left, right) → left+right
    left-to-right non-overlapping — the standard BPE merge order. The
    fold appends each symbol unless the accumulator's tail is ``left``
    and the symbol is ``right``; a just-fused token is strictly longer
    than ``left``, so overlapping re-merges cannot fire."""
    l, r = F.lit(left), F.lit(right)
    fused = F.lit(left + right)

    def step(acc, s):
        tail_is_left = F.try_element_at(acc, F.lit(-1)) == l
        return F.when(
            tail_is_left & (s == r),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(fused)
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return vocab.withColumn(
        "syms",
        F.aggregate(
            "syms", F.array().cast("array<string>"), step
        ),
    )


def bpe_learn(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_count: int = 2,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns ``(merges, vocab)``: merges as (left, right, weighted count)
    in learned order, and the final (word, freq, syms) segmentation frame.
    Stops early when no pair reaches ``min_count``.
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    vocab = materialize(_word_vocab(docs, text_col))
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("n_occurrences").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not best or best[0]["n_occurrences"] < min_count:
            break
        left, right, n = (
            best[0]["left"],
            best[0]["right"],
            best[0]["n_occurrences"],
        )
        merges.append((left, right, int(n)))
        # materialize per round: truncates the nested-aggregate
        # lineage AND freezes the frame the next pair count reads.
        vocab = materialize(_merge_pair(vocab, left, right))
    return merges, vocab


def learned_merges_frame(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
) -> DataFrame:
    """The merge table as a DataFrame: (iteration, left, right, merged,
    n_occurrences) — the trainer's auditable output artifact."""
    merges, _ = bpe_learn(docs, text_col=text_col, n_merges=n_merges)
    rows = [
        (i + 1, a, b, a + b, n) for i, (a, b, n) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows,
        "iteration int, left string, right string, merged string,"
        " n_occurrences long",
    )


def bpe_apply_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ENCODE with a merge table — the serving half of the tokenizer
    loop (train with :func:`bpe_learn`, encode here). Same collapse
    move as training: every DISTINCT word encodes once (the merge
    folds run over |vocab| rows, map-side, chained in learned order via
    :func:`_merge_pair`), then the corpus joins word -> encoding and
    aggregates per document. Returns (doc_id, n_words, n_tokens,
    enc_digest): token count after merging plus an order-sensitive md5
    of the full encoded sequence (words joined by space, symbols within
    a word by the unit separator chr(31), which cannot appear inside a
    merged symbol built from visible text) — the digest pins every
    merge decision, so the oracle comparison verifies the encoding
    bit-for-bit, not just its length.

    At 100 TB the word-vocabulary collapse is the same asymptotic win
    as in training: the corpus pays one explode + one join; the merge
    chain never touches it. A materialize() every 8 merges bounds the
    nested-fold expression depth over the (small) vocab frame."""
    us = "\u001f"
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    vocab = (
        words.select("word")
        .distinct()
        .withColumn(
            "syms",
            F.expr(
                "transform(sequence(1, length(word)), "
                "i -> substring(word, i, 1))"
            ),
        )
    )
    for i, (left, right) in enumerate(merges):
        vocab = _merge_pair(vocab, left, right)
        if (i + 1) % 8 == 0:
            vocab = materialize(vocab)
    enc = vocab.select(
        "word",
        F.size("syms").alias("w_tokens"),
        F.concat_ws(us, F.col("syms")).alias("w_enc"),
    )
    per_word = words.join(enc, "word")
    return per_word.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("w_tokens").alias("n_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w_enc"))),
                    lambda s: s["w_enc"],
                ),
            )
        ).alias("enc_digest"),
    )
