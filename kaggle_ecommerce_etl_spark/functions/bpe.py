"""Distributed BPE tokenizer training (the merge loop).

The corpus-scale trick every production trainer uses (HF tokenizers,
the original Sennrich et al. 2016 reference implementation): pair
statistics depend only on the DISTINCT-WORD frequency table, so the
iteration state collapses from the corpus (100 TB) to the vocabulary
of distinct words (millions of rows) after ONE corpus pass. Every
merge round is then:

  1. explode adjacent symbol pairs per distinct word, weighted by the
     word's corpus frequency; map-side-combined groupBy-sum;
  2. argmax with a total-order tiebreak (count desc, pair lexicographic)
     — a bounded 1-row driver action per round, the only collect;
  3. rewrite each word's symbol array with a leftmost non-overlapping
     fold (pure `aggregate` HOF — the fold naturally prevents
     overlapped re-merge because the merged symbol differs from its
     left constituent);
  4. `localCheckpoint(eager)` the small words frame so the lineage
     stays flat across rounds (iterative-algorithm posture shared with
     dup_clusters' label propagation).

`q_bpe_pair_counts` (queries_ext4) puts step 1's statistic on the
DuckDB-oracle surface and `q_bpe_tokenize_counts` (queries_ext4) puts
the APPLY path (:func:`bpe_tokenize_joined`) on it; the training loop
itself is iterative-argmax and not SQL-expressible, so its
correctness anchor is
tests/test_queries_ext4.py::test_bpe_learn_matches_naive — an exact
match against an independent pure-Python reference on every merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kaggle_ecommerce_etl_spark.functions.text import WS_SPLIT


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """ONE corpus pass: distinct lowercased whitespace words with
    corpus frequencies — the entire state BPE training needs.
    Tokenization = the portable WS_SPLIT class (see functions.text),
    the same contract as queries_ext4's corpus analytics."""
    toks = df.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), WS_SPLIT)
        ).alias("word")
    ).filter(F.col("word") != "")
    return toks.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _symbols(word_col: str = "word") -> F.Column:
    """Initial symbol array: the word's characters."""
    return F.split(F.col(word_col), "")


def _merge_fold(syms: F.Column, a: str, b: str) -> F.Column:
    """Leftmost non-overlapping merge of adjacent (a, b) → a+b via a
    single fold. Overlap safety: after a merge the running last symbol
    is ``a+b`` which can never equal ``a`` (b is non-empty), so
    ``a a a`` under pair (a, a) yields [aa, a] — exactly BPE's
    left-to-right non-overlapping contract."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            # try_element_at: NULL (never ANSI error) on the empty
            # accumulator; NULL == 'a' is false-ish under WHEN
            (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def weighted_pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent symbol-pair frequencies over the (syms, freq) words
    frame, weighted by word frequency. Columns: a, b, cnt."""
    s = F.col("syms")
    pairs = F.when(
        F.size(s) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(s) - 1),
            lambda i: F.struct(
                F.element_at(s, i).alias("a"),
                F.element_at(s, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        words.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_freq: int = 2,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges; returns (merges, words)
    where ``words`` is the final (word, freq, syms) frame. Stops early
    when the best pair's weighted count drops below ``min_freq``.
    Driver traffic is ONE row per round; everything else is
    distributed."""
    words = word_freq_table(df, text_col).select(
        "word", "freq", _symbols().alias("syms")
    )
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            weighted_pair_counts(words)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_freq:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        words = words.select(
            "word", "freq", _merge_fold(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=True)
    return merges, words


def bpe_apply_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python leftmost non-overlapping merge replay for ONE word —
    the naive twin of :func:`_merge_fold`'s expression chain. Used to
    derive the committed literal vocabulary of queries_ext4's
    `bpe_tokenize_counts`: deterministic (literals in, literals out) —
    both the Spark vocab DataFrame and the DuckDB oracle VALUES list
    are rendered from this one function, so the two engines join the
    SAME (word, syms) table by construction."""
    syms = list(word)
    for a, b in merges:
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


def bpe_learn_naive(
    word_freqs: dict[str, int], n_merges: int = 10, min_freq: int = 2
) -> list[tuple[str, str]]:
    """Independent pure-Python reference for the pytest anchor —
    deliberately the textbook O(vocab·merges) formulation with the
    SAME tiebreak, sharing no code with the Spark path."""
    state = {w: list(w) for w in word_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in state.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < min_freq:
            break
        a, b = best[0]
        merges.append((a, b))
        for w, syms in state.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    return merges


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """APPLY learned merges to a corpus: every document's words are
    re-symbolized by replaying the merge list in training order —
    the inference half of the train/apply pair (bpe_learn trains).
    Pure expressions: per word a chain of len(merges) fold passes,
    flattened back to one token array per document. Zero shuffles —
    a narrow map over the corpus at any scale; the merge list rides
    the plan as literals (tokenizers are ≤ ~50k merges; chains that
    long should precompute a vocab dict and join instead — this
    expression path is for the distributed-training loop's own
    inspection scale, ≤ ~100 merges). NULL text tokenizes to an empty
    array (coalesced — same contract as bpe_tokenize_joined, so the
    two apply paths stay swappable)."""
    words = F.split(F.lower(F.trim(F.col(text_col))), WS_SPLIT)
    word = F.filter(words, lambda w: w != "")

    def symbolize(w: F.Column) -> F.Column:
        syms = F.split(w, "")
        for a, b in merges:
            syms = _merge_fold(syms, a, b)
        return syms

    return df.withColumn(
        out_col,
        F.coalesce(
            F.flatten(F.transform(word, symbolize)),
            F.array().cast("array<string>"),
        ),
    )


def bpe_tokenize_joined(
    df: DataFrame,
    words: DataFrame,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """The SCALABLE apply path for large merge lists: instead of
    replaying k merges as a k-deep expression chain (bpe_tokenize —
    fine for ≤ ~100 merges), join each document word against the
    (word, syms) vocabulary `bpe_learn` already produced. One
    explode + one join on the word (broadcast when the vocab fits,
    shuffle otherwise — AQE decides) + an ordered regroup; cost is
    independent of merge count. Out-of-vocabulary words fall back to
    their characters (the training-corpus contract: a word absent
    from `words` was never seen, so no merge can apply to it beyond
    what its characters carry — matching what replaying the merges
    would produce ONLY when the word shares no merged pair; exact
    OOV parity needs bpe_tokenize's replay, which is the documented
    trade).

    Reconstruction order rides (doc row id, word position) through
    sort_array — never collect_list luck. NULL text → empty token
    array (same contract as bpe_tokenize)."""
    # EAGER localCheckpoint: __rid (monotonically_increasing_id) is
    # nondeterministic and `tagged` feeds TWO plan branches (the
    # explode side and the final join-back) — recomputed separately,
    # a shuffled/retried input could assign different ids per branch
    # and silently attach tokens to the wrong document. Pinning the
    # frame once makes the ids a fact, not a recomputation.
    tagged = df.withColumn(
        "__rid", F.monotonically_increasing_id()
    ).localCheckpoint(eager=True)
    toks = tagged.select(
        "__rid",
        F.posexplode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), WS_SPLIT),
                lambda w: w != "",
            )
        ).alias("__pos", "__word"),
    )
    vocab = words.select(F.col("word").alias("__word"), F.col("syms").alias("__syms"))
    joined = toks.join(vocab, "__word", "left").select(
        "__rid",
        "__pos",
        F.coalesce(F.col("__syms"), F.split(F.col("__word"), "")).alias("__syms"),
    )
    regrouped = joined.groupBy("__rid").agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pos"), F.col("__syms")))
                ),
                lambda x: x["__syms"],
            )
        ).alias(out_col)
    )
    out = tagged.join(regrouped, "__rid", "left").drop("__rid")
    # documents with no words (empty text) get an empty token array
    return out.withColumn(
        out_col, F.coalesce(F.col(out_col), F.array().cast("array<string>"))
    )
