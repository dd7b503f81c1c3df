"""Byte-pair-encoding tokenizer training and encoding, Spark-first.

Classic BPE (Sennrich et al. 2016): split the corpus into words,
represent each word as a symbol sequence (characters + an end-of-word
marker), and repeatedly merge the globally most frequent adjacent
symbol pair. The reference feature-store has no tokenizer surface;
this is build-addendum (SURVEY.md §2.5) — training a subword
vocabulary IS a corpus-scale aggregation problem, and the Spark shape
matters: the iteration state is the WORD-TYPE table (distinct words ×
counts, vocabulary-sized), never the corpus, so a 100 TB corpus pays
one tokenize+count pass and then iterates over megabytes.

Determinism: the argmax pair is tie-broken lexicographically, merges
apply left-to-right within a word (overlapping occurrences merge
greedily from the left, the reference semantics), and every step is
exact integer arithmetic — training is bit-reproducible, which the
Python-replica property test pins (no SQL oracle: the K-step argmax
recursion is not expressible as a fixed query, so the driver records
the weaker rows-only check for the entry).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embeddinghub_spark.functions.text import tokens

END_OF_WORD = "▁"  # sentinel appended as a standalone symbol


def _merge_fold(a: str, b: str):
    """Fold step: rebuild a symbol array merging left-to-right,
    non-overlapping occurrences of (a, b). The accumulator carries
    (rebuilt array, pending previous symbol); a merge consumes the
    pending symbol so "aaa" + (a,a) -> ["aa", "a"], the standard
    greedy-left semantics."""
    merged = a + b

    def step(acc, s):
        hit = acc["prev"].isNotNull() & (acc["prev"] == F.lit(a)) & (
            s == F.lit(b)
        )
        return F.when(
            hit,
            F.struct(
                F.concat(acc["arr"], F.array(F.lit(merged))).alias("arr"),
                F.lit(None).cast("string").alias("prev"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc["prev"].isNotNull(),
                    F.concat(acc["arr"], F.array(acc["prev"])),
                )
                .otherwise(acc["arr"])
                .alias("arr"),
                s.alias("prev"),
            )
        )

    def finish(acc):
        return F.when(
            acc["prev"].isNotNull(),
            F.concat(acc["arr"], F.array(acc["prev"])),
        ).otherwise(acc["arr"])

    init = F.struct(
        F.array().cast("array<string>").alias("arr"),
        F.lit(None).cast("string").alias("prev"),
    )
    return init, step, finish


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Train ``n_merges`` BPE merges over the corpus; returns the
    merge table ``(rank, left, right, merged, pair_count)`` in
    learning order. Stops early when no pair reaches ``min_count``.

    Scale shape: ONE corpus pass builds the word-type frame (explode →
    groupBy(word), map-side combine; |rows| = vocabulary, weights =
    word counts). Each iteration then (a) explodes adjacent symbol
    pairs of the WORD TYPES weighted by count and aggregates — the
    exchange carries (pair, partial count) at symbol-pair domain
    width, (b) collects the single argmax row (a bounded scalar, like
    the IVF centroid collects; ties broken by pair lexicographically),
    (c) rewrites symbol arrays with a map-only fold, and (d)
    localCheckpoints so plan depth stays O(1) across iterations (the
    PageRank discipline) — the checkpointed state is vocabulary-sized,
    never corpus-sized.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if min_count < 1:
        raise ValueError("min_count must be >= 1")

    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = words.select(
        F.concat(
            F.split(F.col("w"), ""), F.array(F.lit(END_OF_WORD))
        ).alias("syms"),
        "cnt",
    ).localCheckpoint()

    spark = df.sparkSession
    out_rows = []
    for rank in range(1, n_merges + 1):
        pair_counts = (
            vocab.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("l"),
                            F.element_at("syms", i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p")
            .agg(F.sum("cnt").alias("n"))
        )
        best = pair_counts.orderBy(
            F.col("n").desc(), F.col("p.l").asc(), F.col("p.r").asc()
        ).limit(1).collect()
        if not best or best[0]["n"] < min_count:
            break
        left, right, n = best[0]["p"]["l"], best[0]["p"]["r"], best[0]["n"]
        out_rows.append((rank, left, right, left + right, int(n)))
        init, step, finish = _merge_fold(left, right)
        vocab = vocab.select(
            F.aggregate("syms", init, step, finish).alias("syms"), "cnt"
        ).localCheckpoint()

    return spark.createDataFrame(
        out_rows, "rank INT, left STRING, right STRING, merged STRING, pair_count BIGINT"
    )


def bpe_train_python(texts: list[str], n_merges: int, min_count: int = 2):
    """Driver-side replica of bpe_merges for property tests: identical
    tokenization, ordering, tie-breaks, and greedy-left merges."""
    from collections import Counter

    word_counts = Counter()
    for t in texts:
        if t is None:
            continue
        for w in t.split(" "):
            if w:
                word_counts[w] += 1
    vocab = {
        tuple(list(w) + [END_OF_WORD]): c for w, c in word_counts.items()
    }
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n = best
        if n < min_count:
            break
        merges.append((rank, left, right, left + right, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out, prev = [], None
            for s in syms:
                if prev == left and s == right:
                    out.append(left + right)
                    prev = None
                else:
                    if prev is not None:
                        out.append(prev)
                    prev = s
            if prev is not None:
                out.append(prev)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents with a learned merge table: output
    ``(id, bpe_tokens array<string>, n_bpe_tokens)``.

    Applying K ordered merges per row is inherently sequential per
    word, so this is the sanctioned Arrow-batched escape hatch
    (mapInPandas); the merge table rides the closure as a plain list
    (kilobytes). Encoding is embarrassingly parallel — map-only, no
    shuffle at any corpus size.
    """
    order = {(m[1], m[2]): i for i, m in enumerate(merges)}
    out_schema = (
        f"{id_col} BIGINT, bpe_tokens ARRAY<STRING>, n_bpe_tokens INT"
    )

    def encode_word(w: str) -> list:
        syms = list(w) + [END_OF_WORD]
        while len(syms) >= 2:
            ranked = [
                (order[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in order
            ]
            if not ranked:
                break
            r, _ = min(ranked)
            left, right = merges[r][1], merges[r][2]
            out, prev = [], None
            for s in syms:
                if prev == left and s == right:
                    out.append(left + right)
                    prev = None
                else:
                    if prev is not None:
                        out.append(prev)
                    prev = s
            if prev is not None:
                out.append(prev)
            syms = out
        return syms

    def run(batches: Iterator):
        import pandas as pd

        for pdf in batches:
            toks = []
            for t in pdf[text_col]:
                if t is None:
                    toks.append([])
                    continue
                enc = []
                for w in str(t).split(" "):
                    if w:
                        enc.extend(encode_word(w))
                toks.append(enc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "bpe_tokens": toks,
                    "n_bpe_tokens": [len(x) for x in toks],
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)
