"""Unigram-LM subword tokenizer training and encoding, Spark-first.

The unigram language-model tokenizer (Kudo 2018 — the SentencePiece
default) is the other production subword family next to BPE: instead
of growing merges bottom-up, it starts from a LARGE candidate piece
inventory, fits piece probabilities by EM over the corpus, and prunes
the inventory down to the target vocabulary; encoding picks each
word's maximum-likelihood segmentation by Viterbi.

Spark shape (the ``bpe.py`` discipline, VERDICT r5 #4): Spark runs the
one thing that scales with the corpus — the tokenize + word-type count
pass (explode → groupBy(word), map-side combine) — and the EM/prune
loop runs driver-side over the vocabulary-bounded word-TYPE table,
which is exactly the sufficient statistic the algorithm needs (the
objective only sees each distinct word weighted by its count). No
per-iteration Spark job; ``unigram_encode`` stays fully distributed
and map-only.

Determinism: hard-EM (Viterbi counts) with exact tie-breaks — higher
log-prob wins, then FEWER pieces, then lexicographic piece choice —
and pruning drops the lowest-expected-count pieces with a
lexicographic tie-break, never dropping single characters (coverage
guarantee: every string stays encodable). Training is reproducible
bit-for-bit; the Python replica property test pins Spark ≡ naive.
No SQL oracle: the EM recursion is not a fixed query (rows-only
check, the ``bpe_merges`` precedent).

Reference parity: the feature store has no tokenizer surface; build
addendum per SURVEY.md §2.5.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embeddinghub_spark.functions.text import tokens


def _viterbi(word: str, logp: dict, max_len: int) -> list[str] | None:
    """Max-likelihood segmentation of ``word`` under piece log-probs.
    Ties break toward FEWER pieces, then the lexicographically
    smallest piece at each boundary (scanning longest-first). Returns
    None when the word cannot be covered (impossible while all single
    chars are in the vocab)."""
    n = len(word)
    # best[i] = (logp_sum, n_pieces, piece_ending_at_i, start_j)
    best: list = [None] * (n + 1)
    best[0] = (0.0, 0, "", -1)
    for i in range(1, n + 1):
        cand = None
        for j in range(max(0, i - max_len), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                continue
            s, np = best[j][0] + lp, best[j][1] + 1
            if (
                cand is None
                or (s, -np) > (cand[0], -cand[1])
                or ((s, np) == (cand[0], cand[1]) and piece < cand[2])
            ):
                cand = (s, np, piece, j)
        best[i] = cand
    if best[n] is None:
        return None
    out = []
    i = n
    while i > 0:
        piece = best[i][2]
        out.append(piece)
        i = best[i][3]
    return out[::-1]


def _train_from_word_counts(
    word_counts: dict,
    vocab_size: int,
    max_piece_len: int = 8,
    n_iters: int = 4,
    seed_min_count: int = 2,
    prune_frac: float = 0.25,
) -> list[tuple]:
    """Driver-side unigram-LM trainer over the word-TYPE table.

    Seed = all substrings up to ``max_piece_len`` with corpus count ≥
    ``seed_min_count``, plus every single character (unconditionally —
    the coverage floor). Each round: Viterbi-segment every word type
    under the current probabilities (hard EM), re-estimate piece
    probabilities from the expected counts, then prune the
    ``prune_frac`` lowest-count multi-char pieces (count asc, piece
    asc) until the inventory reaches ``vocab_size``. Returns
    ``(rank, piece, count, logprob)`` sorted by count desc then piece
    asc — the fitted vocabulary.
    """
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    if not word_counts:
        return []
    # seed inventory from substring counts (word-type weighted)
    sub_counts: dict = {}
    for w, c in word_counts.items():
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(i + max_piece_len, L) + 1):
                s = w[i:j]
                sub_counts[s] = sub_counts.get(s, 0) + c
    chars = {w[i] for w in word_counts for i in range(len(w))}
    vocab = {
        s: c
        for s, c in sub_counts.items()
        if len(s) == 1 or c >= seed_min_count
    }
    for ch in chars:
        vocab.setdefault(ch, 1)

    counts = dict(vocab)
    for _ in range(n_iters):
        total = sum(counts.values())
        logp = {p: math.log(c / total) for p, c in counts.items()}
        # E-step: Viterbi counts over word types (hard EM)
        new_counts: dict = {}
        for w, c in word_counts.items():
            seg = _viterbi(w, logp, max_piece_len)
            for piece in seg:
                new_counts[piece] = new_counts.get(piece, 0) + c
        # M-step: unused multi-char pieces drop out; single chars are
        # floored at 1 so every string stays encodable (and log-probs
        # finite)
        counts = new_counts
        for ch in chars:
            if counts.get(ch, 0) < 1:
                counts[ch] = 1
        # prune toward vocab_size: drop lowest-count multi-char pieces
        n_over = len(counts) - vocab_size
        if n_over > 0:
            multi = sorted(
                ((c, p) for p, c in counts.items() if len(p) > 1),
            )
            k = min(n_over, max(1, int(len(multi) * prune_frac)))
            for c, p in multi[:k]:
                del counts[p]
    if len(counts) > vocab_size:
        multi = sorted(((c, p) for p, c in counts.items() if len(p) > 1))
        for c, p in multi[: len(counts) - vocab_size]:
            del counts[p]
    total = sum(counts.values())
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [
        (rank + 1, p, int(c), round(math.log(c / total), 9))
        for rank, (p, c) in enumerate(ordered)
    ]


def unigram_vocab(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 200,
    max_piece_len: int = 8,
    n_iters: int = 4,
    seed_min_count: int = 2,
    min_word_count: int = 1,
) -> DataFrame:
    """Train a unigram-LM subword vocabulary over the corpus; returns
    ``(rank, piece, count, logprob)`` with rank 1 = most frequent.

    Scale shape: ONE corpus pass builds the word-type frame (the only
    corpus-sized work); the EM/prune recursion runs driver-side over
    that vocabulary-bounded table (prune a noisy corpus's long tail
    first with ``min_word_count``). No per-iteration Spark job — the
    ``bpe_merges`` cost model.
    """
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if min_word_count > 1:
        words = words.filter(F.col("cnt") >= min_word_count)
    word_counts = {r["w"]: r["cnt"] for r in words.collect()}
    rows = _train_from_word_counts(
        word_counts,
        vocab_size,
        max_piece_len=max_piece_len,
        n_iters=n_iters,
        seed_min_count=seed_min_count,
    )
    return df.sparkSession.createDataFrame(
        rows, "rank INT, piece STRING, count BIGINT, logprob DOUBLE"
    )


def unigram_encode(
    df: DataFrame,
    pieces: list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Viterbi-encode documents with a fitted vocabulary (the
    ``unigram_vocab`` rows as (rank, piece, count, logprob) tuples):
    output ``(id, pieces array<string>, n_pieces)``.

    Arrow-batched ``mapInPandas`` (per-word Viterbi is inherently
    sequential); the vocabulary rides the closure as a dict
    (kilobytes). Map-only — no shuffle at any corpus size. Characters
    outside the vocabulary pass through as single unknown pieces
    (coverage over arbitrary text, the SentencePiece byte-fallback
    analogue).
    """
    logp = {p[1]: p[3] for p in pieces}
    max_len = max((len(p[1]) for p in pieces), default=1)
    unk_penalty = min(logp.values(), default=-1.0) - 10.0
    # id dtype follows the input schema — a hardcoded BIGINT would
    # break string/UUID document ids (ADVICE r6)
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, pieces ARRAY<STRING>, n_pieces INT"

    def encode_word(w: str) -> list:
        lp = dict(logp)
        # byte-fallback analogue: unknown chars become penalized
        # singleton pieces so Viterbi still covers the word
        for ch in set(w):
            lp.setdefault(ch, unk_penalty)
        return _viterbi(w, lp, max(max_len, 1)) or list(w)

    def run(batches: Iterator):
        import pandas as pd

        for pdf in batches:
            out = []
            for t in pdf[text_col]:
                if t is None:
                    out.append([])
                    continue
                enc: list = []
                for w in str(t).split(" "):
                    if w:
                        enc.extend(encode_word(w))
                out.append(enc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pieces": out,
                    "n_pieces": [len(x) for x in out],
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def save_pieces(pieces, path: str) -> None:
    """Persist a fitted unigram vocabulary as a JSON artifact (the
    ``bpe.save_merges`` workflow: train once on the corpus, reuse the
    kilobyte-sized artifact in every later encode job). Accepts the
    ``unigram_vocab`` result rows (Row or tuple) in rank order."""
    import json

    rows = [list(tuple(p)) for p in pieces]
    with open(path, "w") as fh:
        json.dump({"format": "unigram_pieces", "version": 1, "pieces": rows}, fh)


def load_pieces(path: str) -> list[tuple]:
    """Load a ``save_pieces`` artifact back into the tuple list
    ``unigram_encode`` consumes; rejects foreign JSON early."""
    import json

    with open(path) as fh:
        obj = json.load(fh)
    if obj.get("format") != "unigram_pieces":
        raise ValueError(f"{path} is not a unigram_pieces artifact")
    return [tuple(p) for p in obj["pieces"]]
