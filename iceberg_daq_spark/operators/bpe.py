"""Distributed BPE tokenizer training + encoding.

Byte-pair encoding (Sennrich et al. 2016) trains on the WORD-FREQUENCY
table, not the raw corpus - the scale move that makes it feasible at
100 TB: one corpus pass aggregates (word, freq) (vocabulary-sized, a
few hundred million rows at web scale, shuffled once on the word key),
and every training iteration after that touches only the vocab table:

  per merge round:
    1. explode each word's adjacent symbol pairs, weighted by the
       word's corpus frequency (map-only over the vocab table),
    2. partial+final agg of pair frequencies, top-1 via TakeOrdered
       (one row to the driver per round - never the pair table),
    3. apply the winning merge to every word's symbol array with a
       JVM higher-order fold (map-only; left-to-right non-overlapping,
       exactly re.sub's greedy semantics in the reference algorithm).

``localCheckpoint`` truncates the vocab lineage each round so round N
does not replay rounds 1..N-1 (same pattern as connected_components).
Ties break deterministically: (freq DESC, pair ASC) - byte order, so
the learned merge table is engine- and partitioning-independent.

Encoding (``bpe_encode``) broadcasts the learned merge ranks and runs
the standard greedy lowest-rank-first merge loop per word inside
``mapInPandas`` - Arrow-batched Python, the right tool for an
inherently sequential per-word string algorithm (a per-row UDF or a
50-deep chain of JVM folds would both be slower); everything around
it (tokenize, explode, join) stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker, as in the reference algorithm


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace tokens - the single corpus-sized
    pass of BPE training (combinable agg, one shuffle on the word)."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _apply_merge(syms_col, a: str, b: str):
    """Replace adjacent (a, b) with a+b, left-to-right non-overlapping,
    as a JVM fold: append each symbol, except that a symbol b arriving
    while the accumulator ends in a collapses into the merged symbol.
    Greedy-correct for runs (a a a -> aa a) because the merged symbol
    is a NEW token that no longer equals a."""
    merged = a + b
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_driver_vocab: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns them in
    rank order.

    Two regimes, same exact algorithm and tiebreak:

      * vocab fits (<= ``max_driver_vocab`` distinct words - true for
        almost every real corpus; 100 TB of web text has ~1e7-1e8
        distinct tokens, so the cap is a config, not a cliff): ONE
        corpus-sized distributed agg produces (word, freq), which is
        collected once and the merge loop runs driver-side - the merge
        rounds cost no Spark jobs at all.  This is how production
        tokenizer trainers work: the corpus pass is the distributed
        part, the merge loop is not data-parallel.

      * vocab too large: fully distributed rounds - pair explode +
        combinable agg + top-1 TakeOrdered per round (ONE row to the
        driver per round), merge applied via a JVM fold, lineage
        checkpointed every few rounds.
    """
    sc = docs.sparkSession.sparkContext
    # the vocab table is corpus-INDEPENDENT in size (distinct words);
    # right-size its partition count from its row count so each of the
    # n_merges rounds schedules a handful of tasks, not a full
    # shuffle-partitions fan-out over a few thousand rows.  At web
    # scale (1e8+ words) this lands back at the cluster's parallelism.
    wc = word_counts(docs, text_col)
    n_words = wc.count()
    if n_words <= max_driver_vocab:
        rows = wc.collect()
        return _train_local(
            {r["word"]: r["freq"] for r in rows}, n_merges
        )
    n_parts = max(1, min(int(sc.defaultParallelism), n_words // 50_000 + 1))
    vocab = wc.select(
        # seed symbols: characters + the end-of-word marker
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END))
        ).alias("syms"),
        "freq",
    ).coalesce(n_parts).localCheckpoint()
    merges: list[tuple[str, str]] = []
    since_ckpt = 0
    for _ in range(n_merges):
        pairs = vocab.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
            "freq",
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("f"))
            .orderBy(F.desc("f"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["f"] < 2:
            break  # nothing left worth merging
        a, b = top[0]["p"]["a"], top[0]["p"]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            _apply_merge(F.col("syms"), a, b).alias("syms"), "freq"
        )
        # checkpoint every few rounds, not every round: replaying a
        # couple of pending folds over the small vocab is cheaper than
        # a materialization job per round, while still bounding the
        # expression/lineage depth for long merge schedules
        since_ckpt += 1
        if since_ckpt >= 4:
            vocab = vocab.localCheckpoint()
            since_ckpt = 0
    return merges


def _train_local(wc: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """The merge loop over a collected (word, freq) dict - the exact
    reference algorithm (pair counts weighted by word freq, max freq,
    (freq desc, pair asc) tiebreak), byte-identical to the
    distributed rounds (asserted in tests)."""
    from collections import Counter

    vocab = {w: list(w) + [END] for w in wc}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            f = wc[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        top_f = max(pc.values())
        if top_f < 2:
            break
        a, b = min(p for p, f in pc.items() if f == top_f)
        merges.append((a, b))
        merged = a + b
        for w, syms in vocab.items():
            if a not in syms:
                continue
            j, ns = 0, []
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                    ns.append(merged)
                    j += 2
                else:
                    ns.append(syms[j])
                    j += 1
            vocab[w] = ns
    return merges


def bpe_vocab(docs: DataFrame, n_merges: int, text_col: str = "text") -> DataFrame:
    """The learned merge table as a DataFrame: (rank, left, right,
    merged) - what a tokenizer-training pipeline persists."""
    merges = train_bpe(docs, n_merges, text_col)
    spark = docs.sparkSession
    return spark.createDataFrame(
        [(i, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string, merged string",
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a learned merge list: (id_col, tokens
    array<string>, n_tokens).  Ranks broadcast; the greedy
    lowest-rank-first merge loop runs per word in Arrow-batched
    Python (mapInPandas) - map-only, no shuffle."""
    import pandas as pd

    spark = docs.sparkSession
    ranks = {pair: i for i, pair in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)

    def encode_word(word: str, rk: dict) -> list[str]:
        syms = list(word) + [END]
        while len(syms) > 1:
            best, bi = None, -1
            for i in range(len(syms) - 1):
                r = rk.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
        return syms

    def run(batches):
        rk = bc.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks, counts = [], []
            for text in pdf[text_col]:
                out: list[str] = []
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w, rk)
                        cache[w] = enc
                    out.extend(enc)
                toks.append(out)
                counts.append(len(out))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "tokens": toks, "n_tokens": counts}
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, f"{id_col} bigint, tokens array<string>, n_tokens bigint"
    )
