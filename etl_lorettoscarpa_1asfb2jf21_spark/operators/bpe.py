"""Distributed byte-pair-encoding: train merges + encode a corpus (TP11).

Real BPE training (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units"), not a regex
approximation: iteratively merge the most frequent adjacent symbol pair.
The key scale property is the textbook one — training operates on the
WORD-FREQUENCY VOCABULARY, not the raw corpus: one corpus pass builds
(word, count), and every merge iteration then reads only the vocab table
(Zipf-bounded: ~millions of rows at 100 TB of text, trivially
distributed), so n_merges iterations cost n_merges vocab-sized
aggregations after a single corpus scan. Encoding re-joins documents to
the trained (word -> symbol sequence) map — a broadcast join at any
scale that matters.

Determinism contract (what makes the whole pipeline hash-verifiable by
the DuckDB twin, queries_catalog_pipeline.tp11_bpe_tokenize):

* Symbol sequences are strings joined by TWO spaces, padded with one
  space each end during replacement. A merge (a, b) is the literal
  replacement ``" a  b " -> " ab "``: leftmost non-overlapping scan,
  resume after the replacement — the semantics of both Spark's
  ``replace`` and DuckDB's ``replace``. The double-space separator
  leaves one delimiter space on each side of a match, so consecutive
  disjoint occurrences (``x a b a b x``) all merge in one pass, while
  genuinely overlapping ones (``a a a`` under rule ``(a, a)``) merge
  leftmost-first — exactly the greedy BPE convention.
* The best pair each iteration is ``ORDER BY count DESC, a, b`` — a
  total order, so training is reproducible on any engine.
* Merge steps are plan-side: the 1-row argmax frame cross-joins
  (broadcast) onto the vocab — the sanctioned scalar-join shape; the
  corpus and vocab are never collected.

Each iteration's vocab is lazily localCheckpoint-ed: ``best_i`` and
``vocab_i`` both read ``vocab_{i-1}``, so without truncation the plan
doubles per merge step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _chars_expr(word):
    """Word -> array of single characters (empty strings dropped: Spark's
    zero-width split emits a trailing '' that DuckDB's does not)."""
    c = F.col(word) if isinstance(word, str) else word
    return F.filter(F.split(c, "(?!^)"), lambda x: x != F.lit(""))


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) corpus word-frequency table — the one corpus pass."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _adjacent_pairs(vocab: DataFrame) -> DataFrame:
    """Explode each sym sequence into adjacent (a, b) pairs, weighted by
    the word count: SUM(n) GROUP BY pair is the BPE pair statistic."""
    syms = F.split(F.col("sym"), "  ")
    zipped = F.arrays_zip(
        F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0))).alias("a"),
        F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))).alias("b"),
    )
    return (
        vocab.select(F.col("n"), F.explode(zipped).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "n")
        .groupBy("a", "b")
        .agg(F.sum("n").alias("cnt"))
    )


def bpe_train(
    docs: DataFrame, text_col: str = "text", n_merges: int = 5
) -> DataFrame:
    """Train ``n_merges`` BPE merges; return the final vocab
    (word, n, sym) where sym is the double-space-joined symbol sequence."""
    vocab = (
        word_vocab(docs, text_col)
        .select(
            "word",
            "n",
            F.concat_ws("  ", _chars_expr("word")).alias("sym"),
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(n_merges):
        best = (
            _adjacent_pairs(vocab)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .select(F.col("a").alias("_ba"), F.col("b").alias("_bb"))
        )
        padded = F.concat(F.lit(" "), F.col("sym"), F.lit(" "))
        pattern = F.concat(
            F.lit(" "), F.col("_ba"), F.lit("  "), F.col("_bb"), F.lit(" ")
        )
        merged = F.concat(
            F.lit(" "), F.col("_ba"), F.col("_bb"), F.lit(" ")
        )
        vocab = (
            vocab.crossJoin(F.broadcast(best))
            .select(
                "word",
                "n",
                F.trim(F.replace(padded, pattern, merged)).alias("sym"),
            )
            .localCheckpoint(eager=False)
        )
    return vocab


def bpe_encode(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode each document with the trained vocab: (id, n_tokens,
    tok_hash) where tok_hash is md5 of the in-order double-space-joined
    token stream — a compact, order-sensitive witness of the full
    tokenization (hash-comparable across engines)."""
    words = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    toks = words.join(F.broadcast(vocab.select("word", "sym")), "word")
    per_doc = toks.groupBy(id_col).agg(
        F.sum(F.size(F.split(F.col("sym"), "  "))).alias("n_tokens"),
        F.md5(
            F.concat_ws(
                "  ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("sym")))
                    ),
                    lambda s: s["sym"],
                ),
            )
        ).alias("tok_hash"),
    )
    return per_doc.select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "tok_hash",
    )
