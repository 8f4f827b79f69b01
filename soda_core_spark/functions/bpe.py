"""Byte-pair-encoding tokenizer: distributed sufficient-statistics
training + Arrow-batched apply — tokenizer-accurate token counts for
the token-budget operators.

Training (Sennrich et al. 2016, arXiv:1508.07909) iteratively merges
the most frequent adjacent symbol pair. The classic implementation
trains on a *word-frequency table*, not the raw corpus — word counts
are the exact sufficient statistic, and at any corpus size that table
is the one thing Spark computes perfectly: ONE tokenize+explode pass →
``groupBy(word).count()`` with map-side partial aggregation. The table
is then capped to the top ``max_words`` types by (count desc, word) —
a deterministic TakeOrdered, not a row sample: Zipf's law puts ~all
token mass in the head, and the cap bounds the driver-side merge loop
the same way the k-means / PQ trainers bound their collects
(``operators/similarity.py``). The merge loop itself is the standard
incremental algorithm (pair-index + touched-word updates), with ties
broken by (count desc, pair lexicographic asc) so the learned merge
table is bit-reproducible across engines, partitionings, and runs.

Application is inherently per-row sequential rewriting — the honest
Pandas-UDF case (BASELINE.json prescribes vectorized Arrow UDFs for
exactly this class). ``mapInPandas`` with a per-batch word→tokens
cache: web text repeats words heavily, so each distinct word is
segmented once per batch, and only integer counts (or token arrays)
come back through Arrow.

soda-core counts rows, not tokens; this extends the token-counting
family (``functions/text.py``, ``operators/sampling.py`` token
budgets) with the subword vocabulary an LLM pipeline actually bills
against. No SQL oracle exists for the merge loop — correctness is
pinned by a pure-python replay (the compression-ratio precedent).
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from soda_core_spark.functions.text import words_col

#: end-of-word marker appended as its own symbol (Sennrich's </w>).
EOW = "</w>"

#: tokenization must match words_col (split on [ \t\n\r]+, drop empty)
#: — python str.split() also splits \x0b/\x0c, which words_col does not.
_WS = re.compile(r"[ \t\n\r]+")

DEFAULT_MAX_WORDS = 100_000


def _words(text: str) -> list[str]:
    return [w for w in _WS.split(text or "") if w]


def learn_bpe_from_counts(
    word_freqs: Iterable[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """The driver-side merge loop over a word-frequency table:
    incremental pair counts (only words containing the merged pair are
    rewritten), deterministic tie-break (count desc, pair asc)."""
    vocab: dict[int, tuple[list[str], int]] = {}
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wid, (word, freq) in enumerate(word_freqs):
        syms = [*word, EOW]
        vocab[wid] = (syms, freq)
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + freq
            pair_words.setdefault(p, set()).add(wid)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        a, b = best
        new = a + b
        for wid in sorted(pair_words.get(best, ())):
            syms, freq = vocab[wid]
            # occurrence-counted removal: a pair repeated m times WITHIN
            # one word (e.g. '000' → ('0','0') twice) must subtract
            # freq·m once, not walk occurrence-by-occurrence — the walk
            # deletes the bookkeeping entry at count 0 and then revisits
            # it (KeyError; hypothesis-found). Non-crashing inputs are
            # arithmetically identical, so pinned oracle merges hold.
            occ: dict[tuple[str, str], int] = {}
            for p in zip(syms, syms[1:]):
                occ[p] = occ.get(p, 0) + 1
            for p, m in occ.items():
                c = pair_counts[p] - freq * m
                if c > 0:
                    pair_counts[p] = c
                else:
                    del pair_counts[p]
                ws = pair_words[p]
                ws.discard(wid)
                if not ws:
                    del pair_words[p]
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(new)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[wid] = (out, freq)
            for p in zip(out, out[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + freq
                pair_words.setdefault(p, set()).add(wid)
        merges.append(best)
    return merges


def corpus_word_counts(
    docs: DataFrame, text_col: str = "text", max_words: int = DEFAULT_MAX_WORDS
) -> list[tuple[str, int]]:
    """The training table: distinct words with corpus frequencies,
    capped to the ``max_words`` most frequent types (ties by word) —
    one explode + partial-agg groupBy + TakeOrdered; the collect is
    bounded by ``max_words`` regardless of corpus size."""
    w = F.explode(words_col(F.coalesce(F.col(text_col), F.lit("")))).alias("w")
    rows = (
        docs.select(w)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(int(max_words))
        .collect()
    )
    return [(r["w"], r["n"]) for r in rows]


def train_bpe(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    max_words: int = DEFAULT_MAX_WORDS,
) -> list[tuple[str, str]]:
    """Distributed-statistics BPE training: exact corpus word counts →
    deterministic driver merge loop. Returns the ordered merge table."""
    return learn_bpe_from_counts(
        corpus_word_counts(docs, text_col=text_col, max_words=max_words),
        num_merges,
    )


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE segmentation: repeatedly apply the lowest-rank
    (earliest-learned) merge present, all occurrences per pass — the
    standard inference loop."""
    syms = [*word, EOW]
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        a, b = best_pair
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _ranks(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {tuple(p): i for i, p in enumerate(merges)}


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Per-document BPE token count: ``(id_col, out_col)``. Arrow
    batches in, a per-batch word→length cache (each distinct word
    segmented once per batch), two integers per row out."""
    ranks = _ranks(merges)
    id_field = df.schema[id_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}
        for pdf in batches:
            counts = []
            for t in pdf[text_col]:
                n = 0
                for w in _words(t):
                    c = cache.get(w)
                    if c is None:
                        c = cache[w] = len(segment_word(w, ranks))
                    n += c
                counts.append(n)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: counts})

    schema = f"{id_col} {id_field.dataType.simpleString()}, {out_col} long"
    return df.select(id_col, text_col).mapInPandas(run, schema)


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_token_array",
) -> DataFrame:
    """Per-document token array (subword strings, ``</w>``-terminated
    words) — for downstream vocabulary audits or sequence packing."""
    ranks = _ranks(merges)
    id_field = df.schema[id_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for t in pdf[text_col]:
                row: list[str] = []
                for w in _words(t):
                    seg = cache.get(w)
                    if seg is None:
                        seg = cache[w] = segment_word(w, ranks)
                    row.extend(seg)
                toks.append(row)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: toks})

    schema = (
        f"{id_col} {id_field.dataType.simpleString()}, "
        f"{out_col} array<string>"
    )
    return df.select(id_col, text_col).mapInPandas(run, schema)
