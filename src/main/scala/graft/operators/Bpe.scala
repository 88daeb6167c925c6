package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING on a Spark corpus — the
  * vocabulary-learning half of the training-data pipeline (the scoring
  * half, token counting with a learned vocab, is `Pipeline` q35's
  * regex tokenizer; this learns the vocab itself).
  *
  * Classic BPE (Sennrich et al. 2016) reduces the corpus to a
  * word-frequency dictionary first, then iterates on the dictionary:
  * count adjacent symbol pairs weighted by word frequency, merge the
  * most frequent pair everywhere, repeat. The dictionary is orders of
  * magnitude smaller than the corpus (vocabulary-sized), so after ONE
  * corpus-wide shuffle every training round is dictionary-local:
  *
  *  - [[wordDict]]: one groupBy over the tokenized corpus — the only
  *    corpus-sized stage, map-side combined.
  *  - each round: one dictionary aggregation (pair counts — shuffle
  *    cardinality = pair vocabulary) + one map-only merge rewrite;
  *    the driver sees exactly ONE row per round (the argmax pair).
  *    The dictionary is `localCheckpoint`ed every round so lineage
  *    stays flat across dozens of rounds.
  *  - [[tokenize]]: applies learned merges to the DISTINCT-word
  *    dictionary (vocabulary-sized work), then rejoins documents by
  *    word — the corpus never replays the merge loop.
  *
  * Ties on pair count break lexicographically — training is fully
  * deterministic, so two runs (or two engines) learn identical merge
  * tables. No end-of-word marker is appended: merges never cross word
  * boundaries, and segmentations concatenate back to the exact word
  * (the lossless-round-trip property the spec checks).
  */
object Bpe {

  /** Word-frequency dictionary: lowercase whitespace tokenization, one
    * row per distinct word with its corpus count, symbols initialized
    * to single characters. The only corpus-sized stage of training. */
  def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .withColumn("syms", expr(
        "transform(sequence(1, char_length(word)), i -> substring(word, i, 1))"))

  /** Adjacent symbol-pair counts over a (syms, n) dictionary, weighted
    * by word frequency — one merge round's statistics. Shuffle
    * cardinality = the pair vocabulary, not the corpus. */
  def pairCounts(dict: DataFrame): DataFrame =
    dict
      .filter(size(col("syms")) >= 2)
      .select(col("n"), explode(expr(
        "transform(sequence(1, size(syms) - 1), i -> struct(syms[i - 1] AS a, syms[i] AS b))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("n")).as("cnt"))

  /** Greedy left-to-right, non-overlapping merge of pair (a, b) in
    * every word's symbol array — one codegen'd map over the
    * dictionary, no shuffle. */
  private def mergePair(dict: DataFrame, a: String, b: String): DataFrame = {
    val merged = lit(a + b)
    dict.withColumn("syms",
      aggregate(col("syms"),
        expr("CAST(array() AS array<string>)"),
        (acc, x) => when(
          size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
          .otherwise(concat(acc, array(x)))))
  }

  /** Learn `numMerges` merge rules from the corpus. Per round the
    * driver receives ONE row (the argmax pair); rounds that find no
    * mergeable pair left stop early. */
  def learn(docs: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 1, "need at least one merge round")
    var dict = wordDict(docs, textCol).localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val top = pairCounts(dict)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        dict = mergePair(dict, a, b).localCheckpoint()
      }
      round += 1
    }
    merges.result()
  }

  /** Segment every document with a learned merge table: merges apply
    * to the DISTINCT-word dictionary in learned order (vocabulary-
    * sized work, `localCheckpoint` between rules keeps plans flat),
    * then documents rejoin their words' segmentations on the word key.
    * The dictionary is distinct-word-sized — UNBOUNDED on web text
    * (typos, numbers, URLs) — so the join is left to the planner
    * (shuffle or AQE-chosen broadcast), never force-broadcast.
    * Returns one row per word occurrence in document order:
    * (idCol, pos, word, tokens). */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col(idCol), posexplode(split(lower(col(textCol)), "\\s+")).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
    val dict0 = words.select(col("word")).distinct()
      .withColumn("syms", expr(
        "transform(sequence(1, char_length(word)), i -> substring(word, i, 1))"))
    val segmented = merges.foldLeft(dict0) { case (d, (a, b)) =>
      mergePair(d, a, b).localCheckpoint()
    }
    words.join(segmented.withColumnRenamed("syms", "tokens"), Seq("word"))
      .select(col(idCol), col("pos"), col("word"), col("tokens"))
  }
}
