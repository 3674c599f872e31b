"""Text-analysis column builders for the documents table.

All pure built-in column expressions (whole-stage codegen, no UDFs):
tokenization, language-ID heuristic, quality scoring, token counting,
and a rolling-hash document fingerprint.  Each has an exact DuckDB
twin in queries/llm.py so the oracle hash-checks the semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic English stopword list shared with the oracle SQL.
STOPWORDS = ("the", "a", "of", "and", "to", "in")

FINGERPRINT_MOD = 1_000_000_007


def words(text: Column) -> Column:
    return F.split(text, " ")


def stopword_ratio(wordarr: Column) -> Column:
    """Fraction of tokens that are stopwords (language-ID signal)."""
    n_stop = F.size(F.filter(wordarr, lambda w: w.isin(*STOPWORDS)))
    return n_stop / F.greatest(F.size(wordarr), F.lit(1))


def langid(wordarr: Column) -> Column:
    """N-gram-free heuristic language ID: stopword density threshold.

    (The container has no langid models; this is the deterministic
    stand-in - the Spark-side plumbing is what matters at scale.)
    """
    return F.when(stopword_ratio(wordarr) >= F.lit(0.05), "en").otherwise("unk")


def quality_score(text: Column, wordarr: Column) -> Column:
    """Length/stopword/punctuation quality score in [0, 1]."""
    n_words = F.size(wordarr)
    punct_ratio = F.regexp_count(text, F.lit(r"[.!?,;]")) / F.greatest(
        F.length(text), F.lit(1)
    )
    score = (
        F.lit(0.2)
        + F.lit(0.5) * stopword_ratio(wordarr)
        + F.lit(0.3) * F.least(n_words / F.lit(200.0), F.lit(1.0))
        - F.lit(0.2) * punct_ratio
    )
    return F.round(F.least(score, F.lit(1.0)), 3)


def token_counts(text: Column, wordarr: Column) -> tuple[Column, Column]:
    """(whitespace token count, BPE-ish subword-regex token count)."""
    ws = F.size(wordarr).cast("long")
    bpe = F.regexp_count(text, F.lit(r"[a-z]+|[0-9]+")).cast("long")
    return ws, bpe


def fingerprint(wordarr: Column) -> Column:
    """Rolling polynomial hash over (first-char, length) of each token:
    h = (h*31 + ascii(w[0]) + len(w)) mod 1e9+7 - a left fold, matching
    DuckDB's list_reduce in the oracle.  Mirrors A24's streaming-fold
    shape with engine-portable arithmetic (no int64 overflow)."""
    contrib = F.transform(wordarr, lambda w: F.ascii(F.substring(w, 1, 1)) + F.length(w))
    return F.aggregate(
        contrib,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % FINGERPRINT_MOD,
    )


# PII patterns - restricted to the regex subset Java (Spark) and RE2
# (DuckDB oracles) share: no backreferences, no lookaround.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE_RE = r"\b555-[0-9]{4}\b"
PII_IP_RE = r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b"


def redact(text: Column) -> Column:
    """Replace emails / IPv4 addresses / phone numbers with typed
    placeholder tokens (the pre-training privacy scrub).  Three JVM
    regexp_replace passes, map-only; email before IP before phone so a
    placeholder can never be re-matched by a later pattern."""
    out = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_IP_RE, "<IP>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")


def heavy_hitters(tokens, count_floor: int, summary_size: int = 4096):
    """Exact heavy hitters WITHOUT a vocabulary-wide shuffle: the
    two-pass Misra-Gries layout.

    Pass 1 runs a size-``summary_size`` Misra-Gries summary per
    partition (an Arrow-batched pandas Counter with decrements - the
    classic streaming frequent-items sketch) and unions the candidate
    keys: if an item's GLOBAL count exceeds n/summary_size it must
    exceed its share in at least one partition, so the union is a
    superset of every global heavy hitter at that threshold.  Pass 2
    broadcast-semi-joins the (bounded, <= partitions x summary_size)
    candidate set back and recounts EXACTLY, keeping count >=
    ``count_floor``.

    Why it matters at 100 TB: the naive ``groupBy(token)`` shuffles
    the full vocabulary (billions of types for web corpora); here the
    only shuffle is the exact recount of a candidate set whose size is
    independent of the corpus - the same two-pass discipline as
    TeraSort's sampling pass.  EXACT output (not a sketch estimate):
    callers must pick ``count_floor`` > n/summary_size for the
    no-false-negative guarantee, which pass 2's recount then makes
    precise.

    ``tokens``: DataFrame with one ``token`` string column."""
    import pandas as pd

    from pyspark.sql import functions as F

    def mg_candidates(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for tok, cnt in pdf["token"].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(cnt)
                if len(counters) > summary_size:
                    # decrement-all: drop the min count from everyone
                    dec = min(counters.values())
                    counters = {
                        t: c - dec for t, c in counters.items() if c > dec
                    }
        yield pd.DataFrame({"token": list(counters.keys())})

    cand = tokens.mapInPandas(mg_candidates, "token string").distinct()
    return (
        tokens.join(F.broadcast(cand), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
        .filter(F.col("cnt") >= count_floor)
    )
