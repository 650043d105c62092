"""Distributed BPE tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909) — learn merge rules from corpus word counts.

The scale shape mirrors how production tokenizer trainers work: the
corpus is reduced ONCE to a (word, count) frame (combiner-friendly
groupBy — the only pass whose cost scales with corpus bytes), and every
merge iteration runs over the DISTINCT-WORD frame, whose size is
vocabulary-bounded (Heaps' law: ~1M types for 100 TB of text), not
corpus-bounded. Per iteration:

  1. adjacent symbol pairs explode from each word's symbol array with
     the word's count (transform over the array — JVM expressions),
  2. pair totals aggregate with map-side combine,
  3. the argmax pair is a 1-row TakeOrdered pull (aggregate metadata,
     not data; ties break lexicographically so training is
     deterministic),
  4. the pair merges into every word's symbol array via a left-to-right
     greedy aggregate() HOF — the same semantics as the reference BPE
     implementation's single merge step.

No Python UDFs in the training loop; each generation localCheckpoints
so the logical plan stays one merge deep (see bpe_train).

The reference (`/root/reference/`) has no analytics surface (SURVEY.md
§2.2); this extends the engine-only LLM-data face. No SQL oracle exists
for iterative merge training — correctness is pinned by an exact
pure-Python reimplementation in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

END = "</w>"


def word_count_frame(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): the one corpus-scale pass, map-side combined."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _initial_symbols(wc: DataFrame) -> DataFrame:
    """Split each word into single-character symbols + end-of-word mark."""
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    return wc.select(
        F.concat(chars, F.array(F.lit(END))).alias("syms"),
        "cnt",
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-pair totals over the symbol frame (map-side combined)."""
    pairs = F.expr(
        "transform(slice(syms, 1, size(syms) - 1), (s, i) -> struct(s AS l, syms[i + 1] AS r))"
    )
    return (
        syms.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").cast("bigint").alias("n"))
    )


def _merge_pair(syms: DataFrame, left: str, right: str) -> DataFrame:
    """Left-to-right greedy merge of (left,right) in every symbol array —
    a pure-JVM aggregate() fold, no Python in the loop."""
    l, r = F.lit(left), F.lit(right)
    merged = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == l) & (x == r),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(l, r))),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return syms.select(merged.alias("syms"), "cnt")


def bpe_train(df: DataFrame, num_merges: int = 20, text_col: str = "text") -> DataFrame:
    """Learn ``num_merges`` BPE merge rules; returns a small DataFrame
    (step, left, right, merged, pair_count) ordered by step. Stops early
    when no pair occurs at least twice."""
    spark = df.sparkSession
    wc = word_count_frame(df, text_col)
    # localCheckpoint TRUNCATES the logical plan each generation (the
    # frame becomes a LogicalRDD). Without it the k-th generation's plan
    # nests k merge folds, and CollapseProject inlines the multiply-
    # referenced `syms` column into each reference — an exponentially
    # sized expression tree that OOMs plan stringification long before
    # execution. The checkpointed frames are vocabulary-bounded
    # (distinct words), so k generations are aggregate-sized state, not
    # corpus-sized. One Spark job per merge step.
    syms = _initial_symbols(wc).localCheckpoint(eager=True)
    rules: list[Row] = []
    for step in range(1, num_merges + 1):
        top = _pair_counts(syms).orderBy(F.desc("n"), "l", "r").limit(1).collect()
        if not top or top[0]["n"] < 2:
            break
        l, r, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        rules.append(Row(step=step, left=l, right=r, merged=l + r, pair_count=n))
        syms = _merge_pair(syms, l, r).localCheckpoint(eager=True)
    schema = "step int, left string, right string, merged string, pair_count bigint"
    return spark.createDataFrame(rules, schema=schema)


def bpe_tokenize(
    df: DataFrame,
    rules: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply learned merge rules to every document — the corpus-scale
    half of BPE (training is a vocabulary-bounded driver loop; APPLYING
    the tokenizer is the embarrassingly parallel pass a 100 TB corpus
    actually pays for). One Arrow-batched mapInPandas stage with the
    (tiny) rule list broadcast; each batch memoizes word→token-count so
    repeated words (Zipf: most of the corpus) tokenize once per batch.
    Returns (id_col, n_ws_tokens, n_bpe_tokens) — the whitespace and
    BPE token counts whose ratio is the tokenizer's compression.

    Chained JVM merge folds would express this declaratively, but 20
    nested aggregate() lambdas hit the same exponential CollapseProject
    inlining bpe_train dodges with localCheckpoint — and checkpointing
    the full corpus 20 times is exactly the anti-pattern. The Python
    applier is the idiomatic escape hatch here (SURVEY.md §7.3: custom
    semantics -> mapInPandas).
    """
    import pandas as pd

    spark = df.sparkSession
    b = spark.sparkContext.broadcast(list(rules))

    def apply_rules(batches):
        merge_rules = b.value

        def word_tokens(word: str) -> int:
            syms = list(word) + [END]
            for l, r in merge_rules:
                out, i = [], 0
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            # a BARE end marker is bookkeeping, but once a rule merges it
            # into a real symbol ('e'+'</w>' -> 'e</w>') that symbol IS a
            # token — only subtract a trailing stand-alone marker
            return len(syms) - (1 if syms and syms[-1] == END else 0)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            memo: dict[str, int] = {}
            ws_counts, bpe_counts = [], []
            for text in pdf["t"]:
                words = [w for w in (text or "").split(" ") if w]
                ws_counts.append(len(words))
                total = 0
                for w in words:
                    c = memo.get(w)
                    if c is None:
                        c = memo[w] = word_tokens(w)
                    total += c
                bpe_counts.append(total)
            yield pd.DataFrame(
                {"id": pdf["id"].values, "n_ws_tokens": ws_counts, "n_bpe_tokens": bpe_counts}
            )

    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    out = src.mapInPandas(apply_rules, "id bigint, n_ws_tokens bigint, n_bpe_tokens bigint")
    return out.withColumnRenamed("id", id_col)
