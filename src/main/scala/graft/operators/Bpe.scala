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
  private[operators] def mergePair(dict: DataFrame, a: String, b: String): DataFrame = {
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

  /** Learn `numMerges` merge rules from the corpus, BATCHING provably
    * independent merges per round. A one-merge-per-round loop is V
    * driver round-trips for a V-entry vocabulary — unusable at a
    * production 32k merge table. Instead each round collects the top
    * `batchK` pairs once and applies the longest PREFIX of that sorted
    * list that is exactly equivalent to the sequential greedy loop:
    *
    *  - prefix only (never skip an interacting pair and keep going —
    *    the sequential loop would have processed it first);
    *  - a later pair must share NO symbol with any earlier batched
    *    pair (so its count is provably unchanged by those merges —
    *    a merge only touches pairs adjacent to an occurrence, all of
    *    which contain one of its symbols), and must not equal an
    *    earlier merged symbol (which would mint new occurrences);
    *  - its count must STRICTLY exceed the count of any pair a prior
    *    batch merge could newly create. A new pair (x·"ab") born of
    *    merging (a,b) only arises where "x a b" stood, so its count is
    *    ≤ the OLD count of (x,a) — some pair sharing a symbol with
    *    (a,b). That is bounded by the collected counts (plus the
    *    truncation tail c_K for pairs outside the top-K, and c_i
    *    itself for a self-pair (a,a), whose merge can spawn ("aa","a")
    *    at up to its own count). Strict `>` also rules out a new pair
    *    stealing the (cnt, a, b) tiebreak;
    *  - a batch CLOSES right after any merge whose minted string
    *    already exists as a symbol (a previous round merged the same
    *    string by another split, e.g. "a"+"bc" then "ab"+"c"). Such a
    *    merge doesn't just create new pairs — it BOOSTS the counts of
    *    existing pairs containing that symbol, so the new-pair bound
    *    above (which bounds created counts, not old+created) no longer
    *    protects later batch members. Multi-char symbols only ever
    *    come from merges (the base alphabet is single chars), so the
    *    minted-so-far set is exactly the collision domain.
    *
    * Ambiguous rounds degrade to batch size 1 — the sequential
    * algorithm — so the learned table is byte-identical to the
    * one-at-a-time loop at any batch size; only the round count
    * changes. Rounds that find no mergeable pair left stop early. */
  def learn(docs: DataFrame, textCol: String, numMerges: Int,
            batchK: Int = 64): Seq[(String, String)] = {
    require(numMerges >= 1, "need at least one merge round")
    var dict = wordDict(docs, textCol).localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    val mintedAll = scala.collection.mutable.Set.empty[String]
    var done = 0
    var exhausted = false
    while (done < numMerges && !exhausted) {
      val top = pairCounts(dict)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(batchK)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) exhausted = true
      else {
        // any pair NOT collected has count <= the last collected count
        val tailBound = if (top.length == batchK) top.last._3 else 0L
        def shares(p: (String, String, Long), q: (String, String, Long)): Boolean =
          p._1 == q._1 || p._1 == q._2 || p._2 == q._1 || p._2 == q._2
        // upper bound on the count of any pair newly created by merging p
        def newPairBound(p: (String, String, Long)): Long = {
          val fromCollected = top.iterator
            .filter(q => q != p && shares(p, q)).map(_._3)
            .maxOption.getOrElse(0L)
          val selfPair = if (p._1 == p._2) p._3 else 0L
          math.max(tailBound, math.max(fromCollected, selfPair))
        }
        val batch = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
        var j = 0
        var stop = false
        while (!stop && j < top.length && done + batch.size < numMerges) {
          val pj = top(j)
          val ok = batch.forall { pi =>
            val minted = pi._1 + pi._2
            !shares(pi, pj) && pj._1 != minted && pj._2 != minted &&
              pj._3 > newPairBound(pi)
          }
          if (ok) {
            batch += pj
            // minted-string collision with an existing symbol boosts
            // pairs the independence bound doesn't cover: keep pj (its
            // own guards held) but close the batch here
            val mintedPj = pj._1 + pj._2
            if (!mintedAll.add(mintedPj)) stop = true
          } else stop = true
          j += 1
        }
        batch.foreach { case (a, b, _) => merges += ((a, b)) }
        done += batch.size
        dict = batch.foldLeft(dict) { case (d, (a, b, _)) => mergePair(d, a, b) }
          .localCheckpoint()
      }
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
    // checkpoint every 16 rules, not every rule: localCheckpoint is an
    // eager job, and a 32k-rule table would otherwise run 32k jobs over
    // the dictionary; 16 chained merge lambdas keep plans well inside
    // codegen limits while cutting the job count 16x
    val segmented = merges.grouped(16).foldLeft(dict0) { case (d, group) =>
      group.foldLeft(d) { case (dd, (a, b)) => mergePair(dd, a, b) }
        .localCheckpoint()
    }
    words.join(segmented.withColumnRenamed("syms", "tokens"), Seq("word"))
      .select(col(idCol), col("pos"), col("word"), col("tokens"))
  }
}
