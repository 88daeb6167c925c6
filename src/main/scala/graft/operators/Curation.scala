package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond dedup (builder brief: the operations
  * a large-scale training-data pipeline needs): benchmark
  * decontamination, deterministic stratified sampling, and
  * repetition-based quality filtering.
  *
  * Scale notes: decontamination is an inverted-index semi-join — the
  * benchmark side is tiny (eval sets), so its distinct shingle set
  * broadcasts and the corpus is touched map-side once. Stratified
  * sampling is one window per stratum (parallelism = #strata ×
  * partitioning, no global sort). Repetition counting is a two-level
  * aggregation with map-side combine — shuffle volume is per-doc
  * distinct-shingle cardinality, not token count.
  */
object Curation {

  /** Benchmark decontamination (the GPT-3-style n-gram overlap rule):
    * corpus docs sharing at least one shingle with the benchmark set,
    * with the overlapping-shingle count as evidence.
    *
    * Inputs are (doc_id, shingle) frames — distinct shingles per doc
    * (e.g. [[Dedup.shingles]]). Returns (doc_id, n_hits) for
    * contaminated docs only; callers anti-join the corpus against it to
    * drop or audit. */
  def contaminated(corpusShingles: DataFrame, benchShingles: DataFrame): DataFrame =
    corpusShingles
      .join(broadcast(benchShingles.select(col("shingle")).distinct()), Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))

  /** [[contaminated]] with a Bloom prefilter — for when the benchmark
    * shingle set is too big to broadcast as an exact hash relation
    * (multi-benchmark suites at full n-gram resolution). A Bloom filter
    * over the benchmark shingles (bits, not strings — orders of
    * magnitude smaller) drops the vast majority of corpus shingles
    * map-side; the exact semi-join then runs only on survivors. Bloom
    * false positives are removed by that exact join, so the result is
    * identical to [[contaminated]] — the filter only prunes work. */
  def contaminatedBloom(corpusShingles: DataFrame, benchShingles: DataFrame,
                        expectedItems: Long = 1000000L,
                        fpp: Double = 0.01): DataFrame = {
    val bench = benchShingles.select(col("shingle")).distinct()
    val bloom = bench.stat.bloomFilter("shingle", expectedItems, fpp)
    val mightContain = udf((s: String) => s != null && bloom.mightContainString(s))
    contaminated(corpusShingles.filter(mightContain(col("shingle"))), bench)
  }

  /** Deterministic stratified sample: keep `n` rows per stratum, ranked
    * by md5 of the id — a reproducible quota sample for domain/language
    * mixing (every engine picks the identical rows, re-runs are
    * stable, and the hash decorrelates the pick from id order). */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       n: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .drop("rn")
  }

  /** Fixed-size token chunking with stride (overlap = chunkTokens −
    * stride) — the standard long-document preparation for training:
    * each doc yields ⌈tokens / stride⌉ windows, the tail window partial.
    * Map-only (tokenize, window starts via `sequence`, `slice`,
    * explode); at 100 TB this is one pass with no shuffle, and the
    * output inherits the input's partitioning. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkTokens >= stride, "need 0 < stride <= chunkTokens")
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"), expr(
        s"""posexplode(transform(sequence(0, size(toks) - 1, $stride),
           |  s -> named_struct(
           |    'chunk', concat_ws(' ', slice(toks, s + 1, $chunkTokens)),
           |    'n', size(slice(toks, s + 1, $chunkTokens)))))""".stripMargin)
        .as(Seq("chunk_idx", "c")))
      .select(col("doc_id"), col("chunk_idx"),
        col("c.chunk").as("chunk"), col("c.n").cast("long").as("chunk_tokens"))
  }

  /** Contiguous sequence packing: docs are binned into fixed-token
    * training sequences by running token count within a stratum
    * (deterministic doc-id order). The bin id is
    * `(cumulative − own) / seqTokens` — a doc starts a new bin when the
    * running total crosses the boundary. Parallelism is per-stratum
    * (the window partitions by `stratumCol`), the standard
    * pack-within-shard compromise: exact global packing is inherently
    * sequential, per-shard packing is embarrassingly parallel and
    * loses at most one partial sequence per shard. */
  def packSequences(docs: DataFrame, stratumCol: String, idCol: String,
                    textCol: String, seqTokens: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(stratumCol), col(idCol).as("doc_id"),
        size(split(col(textCol), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("seq_bin",
        expr(s"(cum_tokens - n_tokens) div $seqTokens")) // integer div: exact at any corpus size
  }

  /** Raw (not distinct) word n-gram occurrence counts per doc:
    * (doc_id, shingle, c). */
  def shingleCounts(docs: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), "\\s+").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(toks) - $n), i -> " +
          (0 until n).map(j => s"toks[i + $j]").mkString("concat_ws(' ', ", ", ", ")") + ")"
      )).as("shingle"))
      .groupBy(col("doc_id"), col("shingle"))
      .agg(count(lit(1)).as("c"))

  /** Gopher-style repetition metric: the most frequent n-gram's share of
    * all n-gram occurrences in the doc — boilerplate/looping text scores
    * high. Returns (doc_id, top_ngram_ratio, repetitive).
    *
    * Map-only: the metric is purely per-document, so instead of
    * explode + groupBy(doc, shingle) + groupBy(doc) (two shuffles of
    * every n-gram occurrence), the n-gram array is sorted in place and
    * the dominant count is the longest equal run — identical to
    * `MAX(c) / SUM(c)` over occurrence counts, with zero exchange. */
  def repetitionRatio(docs: DataFrame, idCol: String, textCol: String,
                      n: Int, threshold: Double = 0.2): DataFrame = {
    val grams = (0 until n).map(j => s"toks[i + $j]").mkString("concat_ws(' ', ", ", ", ")")
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), "\\s+").as("toks"))
      .filter(size(col("toks")) >= n)
      .withColumn("sg", expr(s"array_sort(transform(sequence(0, size(toks) - $n), i -> $grams))"))
      // longest run in the sorted array == max occurrence count; guarded
      // because sequence(1, 0) would count down, not produce empty
      .withColumn("best", expr(
        """IF(size(sg) < 2, 1,
          |  aggregate(sequence(1, size(sg) - 1),
          |    named_struct('run', 1, 'best', 1),
          |    (acc, i) -> IF(sg[i] = sg[i - 1],
          |      named_struct('run', acc.run + 1, 'best', greatest(acc.best, acc.run + 1)),
          |      named_struct('run', 1, 'best', acc.best)),
          |    acc -> acc.best))""".stripMargin))
      .select(col("doc_id"),
        (col("best").cast("double") / size(col("sg")).cast("double")).as("top_ngram_ratio"))
      .withColumn("repetitive", col("top_ngram_ratio") > threshold)
  }

  /** PII / boilerplate patterns for [[scrub]]. RE2-safe (no lookaround,
    * no backreferences) so the same patterns run on any regex engine a
    * downstream consumer might re-apply them with. */
  val piiPatterns: Seq[String] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", // email
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", // IPv4
    "\\+?\\d[\\d().-]{7,}\\d" // phone-ish digit runs
  )

  /** Regex scrubbing (PII redaction / boilerplate stripping): each
    * pattern is replaced with a space, then whitespace is collapsed and
    * trimmed. Adds `clean` next to the original column. Map-only — one
    * codegen'd projection, no shuffle, the 100 TB cost is exactly one
    * read of the text column. */
  /** HTML -> text extraction for crawl curation (the step between
    * warcimport and the quality/dedup pipeline): drop script/style
    * blocks wholesale, strip the remaining tags, decode the common
    * entities, collapse whitespace. Everything is built-in
    * `regexp_replace`/`replace` — codegen'd, no UDF — and every regex
    * keeps to the common subset of Java regex and RE2 (inline `(?is)`
    * flags, non-greedy, `[^>]`), so a DuckDB/RE2 oracle recomputes it
    * verbatim. Entity order matters (`&amp;` decodes LAST so
    * `&amp;lt;` stays `&lt;` — the HTML-correct single pass).
    *
    * Honest scope: a regex extractor, not an HTML5 tree parser — no
    * boilerplate/readability scoring (that's the quality-score
    * operator's job downstream), and pathological markup (unclosed
    * `<script`, conditional comments) degrades to over-stripping,
    * never to leaked tags. */
  def htmlToText(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<[^>]*>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&quot;" -> "\"", "&#39;" -> "'",
      "&lt;" -> "<", "&gt;" -> ">", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Host of an http(s) URL via the same Java/RE2-common regex on both
    * engines (Spark's parse_url has no DuckDB twin), lowercased,
    * `www.` stripped — the key URL-level curation groups by (per-host
    * caps, domain mixes, blocklists). Null for non-URLs. */
  def urlHost(url: Column): Column = {
    val h = lower(regexp_extract(url, "^https?://([^/:?#]+)", 1))
    nullif(regexp_replace(h, "^www\\.", ""), lit(""))
  }

  /** URL canonicalization — the dedup key for crawl frontiers and
    * per-URL corpus dedup (the same page arrives as `http://WWW.x.com/a/`,
    * `https://x.com:443/a#top`, `https://x.com/a?utm_source=feed`, …).
    * Normalizations, in order: drop the `#fragment`; lowercase only the
    * scheme+authority (paths stay case-sensitive per RFC 3986); strip
    * default ports (`:80` http, `:443` https); strip a leading `www.`;
    * remove tracking query params (`utm_*`, `fbclid`, `gclid`) and any
    * dangling `?`; strip one trailing slash. Non-URL strings pass
    * through mostly untouched — callers gate on a scheme match.
    *
    * Every step is a codegen'd regex in the Java/RE2-common subset
    * (no lookarounds — RE2 has none) so the DuckDB oracle mirrors it
    * literally. Map-only; at 100 TB this runs inside the scan
    * projection with zero shuffle. */
  def urlNormalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // lowercase scheme://authority only: extract the prefix, lower it,
    // re-attach the path+query verbatim
    val pre = regexp_extract(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    val lowered = concat(lower(pre), noFrag.substr(length(pre) + 1, length(noFrag)))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/:?#]+):443([/?#]|$)", "$1$2"),
      "^(http://[^/:?#]+):80([/?#]|$)", "$1$2")
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    val noTrack = regexp_replace(
      regexp_replace(noWww, "(utm_[a-z]+|fbclid|gclid)=[^&#]*&", ""),
      "[?&](utm_[a-z]+|fbclid|gclid)=[^&#]*$", "")
    regexp_replace(regexp_replace(noTrack, "\\?$", ""), "/$", "")
  }

  /** Outbound links of an HTML document: every double-quoted `href`
    * attribute value, case-insensitive, in document order. The crawl
    * frontier primitive — explode + [[urlHost]] gives the outlink host
    * graph. Same regex on both engines; map-only. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit("(?i)href=\"([^\"]*)\""), lit(1))

  /** Largest-remainder (Hamilton) budget apportionment: split an exact
    * integer `budget` of training tokens across strata proportionally
    * to their token counts, with every seat accounted for — the step
    * between mixture WEIGHTS ([[resampleToMixture]] takes rates) and an
    * executable per-domain sampling PLAN (exact per-domain token
    * targets that sum to the budget). Pure integer math: base share is
    * `budget*n / total` floored, the `budget - Σbase` leftover seats go
    * to the largest remainders `(budget*n) mod total`, ties broken by
    * stratum name — bit-identical on any engine, no floats anywhere.
    *
    * The frame is stratum-count-sized (domains, not documents), so the
    * single global rank window is over a handful of rows — at 100 TB
    * the document-sized work is the upstream count aggregation, which
    * arrives here already reduced. */
  def allocateBudget(counts: DataFrame, stratumCol: String, nCol: String,
                     budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    // all arithmetic in DECIMAL(38,0): `budget*n` can overflow a long at
    // real token scales, and Column./ is DOUBLE division — one ulp off
    // would mis-floor a base share. `prod - rem` divides exactly, so the
    // decimal division below has an integer quotient: no rounding seam.
    val dec = "decimal(38,0)"
    val tot = counts.agg(sum(col(nCol)).cast(dec).as("total"))
    val prod = lit(budget).cast(dec) * col(nCol).cast(dec)
    val based = counts.crossJoin(broadcast(tot))
      .select(col(stratumCol), col(nCol).cast("long").as(nCol),
        ((prod - prod % col("total")) / col("total")).cast("long").as("base"),
        (prod % col("total")).cast(dec).as("rem"))
    val leftover = lit(budget) - sum(col("base")).over(Window.partitionBy())
    val ranked = based.withColumn("rk",
      row_number().over(Window.orderBy(col("rem").desc, col(stratumCol))))
      .withColumn("leftover", leftover)
    ranked.select(col(stratumCol), col(nCol),
      (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
        .as("alloc"))
  }

  /** The Gopher document-quality rule set (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training
    * Gopher", §A1.1) — the published heuristic battery web corpora are
    * gated through before training. Per doc: word count in [minWords,
    * maxWords], mean word length in [3, 10], symbol-to-word ratio
    * (`#` and `...`) ≤ 0.1, at most 90% of lines bullet-started, at
    * most 30% of lines ellipsis-ended, ≥ 80% of words containing an
    * alphabetic character, and at least 2 of a fixed 8-stopword set
    * present. Returns every per-rule measurement plus the combined
    * `keep` verdict, so thresholds can be re-audited downstream without
    * recomputation.
    *
    * Every rule is a codegen'd expression over one `split` of the text
    * (map-only, zero shuffle); ratios are rounded to 6 decimals for
    * engine-exact reproduction. */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val w = split(col(textCol), "\\s+")
    val lines = split(col(textCol), "\n")
    val nWords = size(w).cast("long")
    val nLines = size(lines).cast("long")
    def frac(n: Column, d: Column) = round(n.cast("double") / d, 6)
    val meanLen = frac(aggregate(w, lit(0L), (acc, x) => acc + length(x)), nWords)
    val nSymbols = (length(col(textCol)) -
      length(replace(col(textCol), lit("#"), lit("")))).cast("long") +
      size(regexp_extract_all(col(textCol), lit("\\.\\.\\."), lit(0))).cast("long")
    val bulletLines = size(filter(lines, l => trim(l).rlike("^[-*•]")))
    val ellipsisLines = size(filter(lines, l => trim(l).rlike("\\.\\.\\.$")))
    val alphaWords = size(filter(w, x => x.rlike("[a-zA-Z]")))
    val stopHits = size(array_intersect(
      array_distinct(transform(w, lower(_))), array(stops.map(lit): _*)))
    docs.select(col(idCol), nWords.as("n_words"), meanLen.as("mean_wlen"),
        frac(nSymbols, nWords).as("symbol_ratio"),
        frac(bulletLines.cast("long"), nLines).as("bullet_frac"),
        frac(ellipsisLines.cast("long"), nLines).as("ellipsis_frac"),
        frac(alphaWords.cast("long"), nWords).as("alpha_frac"),
        stopHits.cast("long").as("stop_hits"))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_wlen").between(3.0, 10.0) &&
          (col("symbol_ratio") <= 0.1) && (col("bullet_frac") <= 0.9) &&
          (col("ellipsis_frac") <= 0.3) && (col("alpha_frac") >= 0.8) &&
          (col("stop_hits") >= 2L))
  }

  /** Anchors of an HTML document as an array of (href, anchor) structs:
    * every `<a … href="…">inner</a>` element, with the inner text
    * tag-stripped and whitespace-collapsed. Incoming anchor text is the
    * classic off-page relevance/quality signal (it feeds BM25F fields
    * and crawl priority), aggregated per TARGET, so it needs the
    * (href, text) pair — [[extractLinks]] alone loses the text.
    *
    * The element match is non-greedy to the first `</a>` and the
    * opening tag can contain no `>`, so the first `>` of each match
    * ends the opening tag — both facts make the inner-text extraction
    * a plain regex. All steps are codegen'd regexes in the Java/RE2
    * common subset; map-only at any scale. */
  def extractAnchors(html: Column): Column = {
    val ms = regexp_extract_all(html,
      lit("(?is)<a\\b[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a>"), lit(0))
    transform(ms, m => struct(
      regexp_extract(m, "(?is)href=\"([^\"]*)\"", 1).as("href"),
      trim(regexp_replace(
        regexp_replace(regexp_extract(m, "(?is)>(.*)</a>$", 1), "<[^>]*>", " "),
        "\\s+", " ")).as("anchor")))
  }

  /** Line-level quality filtering — the C4/Gopher recipe: a web page is
    * cleaned line by line BEFORE document-level scoring, because
    * boilerplate (nav bars, cookie banners, share buttons) arrives as
    * short terminal-punctuation-free lines that poison doc-level stats.
    * A line survives when it (a) has at least `minWords` whitespace
    * words, (b) ends in terminal punctuation (`. ! ? "`), (c) is not a
    * bullet/quote fragment (`- * >`), and (d) contains none of the
    * `boilerplate` phrases (case-insensitive substring match — C4 drops
    * "javascript"/"cookie"/"click here" lines the same way).
    *
    * Implemented as higher-order array functions over `split(text, \n)`
    * — `filter` + `array_join` stay inside whole-stage codegen, so the
    * pass is map-only with zero shuffle at any scale. Returns the input
    * plus (n_lines, n_kept, clean) where `clean` is the surviving lines
    * re-joined with newlines. */
  def lineFilter(docs: DataFrame, textCol: String, minWords: Int,
                 boilerplate: Seq[String]): DataFrame = {
    def ok(l: Column): Column = {
      val t = trim(l)
      val base = (size(split(t, "\\s+")) >= minWords) &&
        t.rlike("[.!?\"]$") && !t.rlike("^[-*>]")
      boilerplate.foldLeft(base)((acc, p) =>
        acc && !contains(lower(t), lit(p.toLowerCase)))
    }
    val lines = split(col(textCol), "\n")
    docs
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("kept", filter(lines, ok(_)))
      .withColumn("n_kept", size(col("kept")).cast("long"))
      .withColumn("clean", array_join(col("kept"), "\n"))
      .drop("kept")
  }

  /** Robots-style URL blocklist: drop every document whose URL path
    * falls under a disallowed prefix for its host (the `Disallow:`
    * semantics of robots.txt, applied corpus-side as curation). `rules`
    * is a (host, prefix) frame — real blocklists are thousands of rows,
    * so it broadcasts and the corpus is touched map-side once to flag.
    * The blocked-id anti-join is left UNHINTED: blocked ids are
    * corpus-derived (worst case, a rule that blocks everything), so the
    * planner must stay free to pick a shuffle join when runtime stats
    * say the set outgrew the broadcast threshold — AQE still
    * broadcast-joins the common small case. Returns the input minus
    * blocked docs. */
  def prefixBlocklist(docs: DataFrame, idCol: String, urlCol: String,
                      rules: DataFrame): DataFrame = {
    val host = urlHost(col(urlCol))
    val path = regexp_extract(col(urlCol), "^[a-zA-Z]+://[^/?#]+(/[^?#]*)", 1)
    val blockedIds = docs
      .select(col(idCol), host.as("_host"), path.as("_path"))
      .join(broadcast(rules.select(col("host").as("_host"), col("prefix"))),
        Seq("_host"))
      .filter(col("_path").startsWith(col("prefix")))
      .select(col(idCol)).distinct()
    docs.join(blockedIds, Seq(idCol), "left_anti")
  }

  /** BM25 top-k retrieval over the corpus for a driver-held term set —
    * the retrieval half of decontamination-by-search and
    * quality-by-query-affinity recipes (Okapi BM25, Robertson &
    * Zaragoza 2009). k1/b are the standard free parameters.
    *
    * Determinism across engines: idf and each per-term contribution are
    * rounded to 6 decimals and summed as DECIMAL(28,6), so the per-doc
    * fold is order-insensitive and DuckDB reproduces scores
    * bit-for-bit; avgdl comes from an exact BIGINT token-count sum.
    *
    * Scale shape: the term set is tiny (a query), so the explode is
    * pre-filtered map-side by `isin` before the per-(doc, term) count;
    * df is a terms-sized aggregate that broadcasts back; the final
    * top-k is TakeOrderedAndProject (no global sort). Shuffle volume is
    * matching-token counts only, never the corpus. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val base = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), "\\s+").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    // exact corpus stats: BIGINT sum, then one double division
    val stats = base.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
      .withColumn("avgdl", round(col("sdl").cast("double") / col("n"), 6))
    // tf feeds both the df aggregate and the scoring join — materialize
    // once (q65 rule: the static planner re-runs the scan + explode per
    // consumer). Post-filter tf is query-term hits only, so the
    // checkpoint is tiny at any corpus size.
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(df), Seq("w"))
      .crossJoin(broadcast(stats.select(col("n"), col("avgdl"))))
      .withColumn("idf", round(
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)), 6))
      .withColumn("c", round(
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))),
        6).cast("decimal(28,6)"))
    contrib.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("c")).cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  def scrub(docs: DataFrame, textCol: String, patterns: Seq[String]): DataFrame = {
    val cleaned = patterns.foldLeft(col(textCol)) { (c, p) =>
      regexp_replace(c, p, " ")
    }
    docs.withColumn("clean",
      trim(regexp_replace(cleaned, "\\s+", " ")))
  }

  /** LM-fluency proxy without a model: for each doc, how many of its
    * bigram occurrences are corpus-supported (total corpus count >=
    * `minCount`)? Low `n_known / n_bigrams` flags gibberish, OCR noise,
    * and machine-generated text whose local word transitions never
    * recur corpus-wide. Returns (doc_id, n_bigrams, n_known) as exact
    * integer counts (no float, oracle-stable).
    *
    * Scale shape: per-doc bigram counts first (map-side combine on
    * (doc, bigram)), then one shuffle keyed by bigram to build corpus
    * totals, then a shuffle join back — volume is distinct-bigram
    * cardinality, not token count. The skew guard for 100 TB is the
    * same as the shingle ops: ubiquitous bigrams concentrate on one
    * key only in the corpus-total agg (partial agg flattens it), never
    * in a pair join. */
  def knownBigramRatio(docs: DataFrame, idCol: String, textCol: String,
                       minCount: Long): DataFrame = {
    // `bg` is consumed twice (corpus totals + scoring join) and the
    // planner re-runs the scan + shingle explode for each — here that
    // is the RIGHT trade: the subtree is a pushed-down scan and a
    // codegen'd map, while checkpointing the per-(doc, bigram) frame
    // materializes millions of rows (measured 14x slower at sf0.1).
    // Contrast lmScore, where the checkpoint wins because its reused
    // frame is aggregated small FIRST. Checkpoint re-used frames only
    // when recompute is expensive relative to their materialized size.
    val bg = shingleCounts(docs, idCol, textCol, 2)
      .withColumnRenamed("shingle", "bg")
    // one doc-level aggregate carries both counts: join each per-doc
    // bigram count to the corpus total and split the sum by the
    // known-flag — no third doc-level shuffle
    val corpus = bg.groupBy(col("bg")).agg(sum(col("c")).as("cc"))
    val stats = bg.join(corpus, Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        sum(when(col("cc") >= minCount, col("c")).otherwise(0L)).as("n_known"))
    docs.select(col(idCol).as("doc_id"))
      .join(stats, Seq("doc_id"), "left_outer")
      .na.fill(0L, Seq("n_bigrams", "n_known"))
  }

  /** Deterministic mixture resampling: downsample each stratum so the
    * surviving corpus matches target `weights` (language/domain mixing,
    * the data-mixture step before training). The largest feasible total
    * is `min_s(count_s / w_s)`; each stratum keeps rate
    * `w_s * total / count_s` of its rows, chosen by md5-hash threshold
    * (first 8 hex chars < `floor(rate * 2^32)` in hex) — reproducible
    * on any engine, stable under re-runs, no RNG.
    *
    * Scale shape: one tiny per-stratum count aggregate broadcasts back
    * onto the corpus, then the keep decision is a map-only filter — no
    * window, no per-stratum sort, unlike quota sampling
    * ([[stratifiedSample]]) which pays a window shuffle. This is the
    * 100 TB mixture path. Strata absent from `weights` are dropped. */
  def resampleToMixture(df: DataFrame, stratumCol: String, idCol: String,
                        weights: Map[String, Double]): DataFrame = {
    val wmap = typedLit(weights)
    val rates = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("cnt"))
      .withColumn("w", element_at(wmap, col(stratumCol)))
      .filter(col("w").isNotNull)
      .withColumn("cap", col("cnt").cast("double") / col("w"))
    val total = rates.agg(min(col("cap")).as("nstar"))
    val withRate = rates.crossJoin(broadcast(total))
      .withColumn("rate", col("w") * col("nstar") / col("cnt").cast("double"))
      .select(col(stratumCol), col("rate"))
    df.join(broadcast(withRate), Seq(stratumCol))
      .filter(col("rate") >= 1.0 ||
        substring(md5(col(idCol).cast("string")), 1, 8) <
          lpad(lower(hex(floor(col("rate") * lit(4294967296.0)))), 8, "0"))
      .drop("rate")
  }

  /** Deterministic negative sampling for contrastive training: each row
    * gets `k` negatives drawn from a hash-selected candidate pool —
    * no RNG (re-runs and engines agree), no O(n²) cross join. The pool
    * is the `poolSize` lowest-md5 ids (a uniform pseudo-random subset,
    * broadcastable); each (row, candidate) pair ranks by
    * md5(id:candidate), so every row sees its own k pseudo-random picks
    * rather than everyone sharing the pool's head.
    *
    * Scale shape: pool selection is one tiny TakeOrdered; the pairing
    * is a broadcast nested-loop over |rows| × poolSize (poolSize is a
    * few hundred), ranked map-side via the bounded TopK aggregator —
    * the shuffle carries k pairs per row, not the pool fan-out. */
  def negativeSample(df: DataFrame, idCol: String, k: Int,
                     poolSize: Int): DataFrame = {
    // strict: an anchor that is itself in the pool sees poolSize - 1
    // candidates (self excluded), so k == poolSize would silently yield
    // k - 1 negatives for pool members
    require(k < poolSize, "k must be smaller than the candidate pool")
    val pool = broadcast(
      df.select(col(idCol).cast("long").as("neg_id"))
        .orderBy(md5(col("neg_id").cast("string")), col("neg_id"))
        .limit(poolSize))
    df.select(col(idCol).cast("long").as("anchor_id"))
      .join(pool, col("anchor_id") =!= col("neg_id"))
      // rank key: md5 of "anchor:candidate" -> per-anchor pseudo-random
      // order; negated first-8-hex as a DOUBLE score so the bounded
      // TopK aggregator (score desc) yields the lexicographically
      // smallest hashes
      .withColumn("score",
        -conv(substring(md5(concat_ws(":", col("anchor_id"), col("neg_id"))), 1, 8),
          16, 10).cast("double"))
      .groupBy(col("anchor_id"))
      .agg(graft.functions.TopK.top_k(k)(col("neg_id"), col("score")).as("hits"))
      .select(col("anchor_id"), explode(col("hits")).as("h"))
      .select(col("anchor_id"), col("h._1").as("neg_id"),
        row_number().over(Window.partitionBy(col("anchor_id"))
          .orderBy(col("h._2").desc, col("h._1"))).cast("long").as("neg_rank"))
  }

  /** Deterministic training-shard assignment: shard = md5-derived value
    * in [0, 256) mod `nShards` — the reproducible global shuffle before
    * writing training shards (breaks source/time locality so each shard
    * is an unbiased corpus sample). Map-only; the subsequent
    * `.write.partitionBy("shard")` is the only exchange. Portable to
    * any engine: the hash digit extraction is string arithmetic, no
    * engine-specific hash. */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0 && nShards <= 256, "nShards must be in [1, 256]")
    val hexDigits = "0123456789abcdef"
    df.withColumn("shard", (
      (expr(s"instr('$hexDigits', substring(md5(cast($idCol as string)), 1, 1))") - 1) * 16 +
        (expr(s"instr('$hexDigits', substring(md5(cast($idCol as string)), 2, 1))") - 1)
      ) % nShards)
  }

  /** Linear text-classifier INFERENCE at corpus scale (the
    * fasttext-style quality/domain scorer every curation pipeline runs):
    * score = sigmoid(bias + Σ w(token) over token OCCURRENCES). The
    * model is driver-held state like the IVF centroids — broadcast to a
    * dimension-sized weight table, so scoring is a map-side
    * broadcast-hash join + one partial-aggregable per-doc sum. No
    * shuffle of text, no UDF, no model server round-trips.
    *
    * Weight sums accumulate as DECIMAL(18,6) so the fold is
    * order-insensitive and any engine reproduces the sigmoid input
    * bit-for-bit; the sigmoid itself is then a deterministic double op.
    * Docs with no weighted tokens score sigmoid(bias). Returns
    * (doc_id, n_hits, score). */
  def linearScore(docs: DataFrame, idCol: String, textCol: String,
                  weights: Seq[(String, Double)], bias: Double): DataFrame = {
    require(weights.nonEmpty, "need at least one feature weight")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = broadcast(weights.toDF("tok", "weight")
      .withColumn("weight", col("weight").cast("decimal(18,6)")))
    val hits = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), "\\s+")).as("tok"))
      .join(w, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"),
        sum(col("weight")).cast("decimal(18,6)").as("wsum"))
    docs.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(lit(bias) + coalesce(col("wsum"), lit(0).cast("decimal(18,6)"))
            .cast("double")))), 6).as("score"))
  }

  /** Per-document character-level Shannon entropy — the garbled-text /
    * binary-spill detector (near-zero entropy = repeated filler, ~8 bits
    * = random bytes; natural language sits ~4). Per-term contributions
    * `-p·log2(p)` are rounded to 6 decimals and summed as decimals, so
    * the fold is order-insensitive and cross-engine bit-stable (the q97
    * discipline). One explode + two aggregates, linear in characters.
    * Empty docs are dropped. Returns (idCol, n_chars, entropy). */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .filter(length(col("ch")) > 0)
      .groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))))
      // log2 via ln(p)/ln(2) EXPLICITLY on both engines (the oracle
      // mirrors this form): a native log2 on one side and ln/ln(2) on
      // the other can differ by 1 ULP and flip the 6-decimal rounding
      .select(col(idCol), col("n"),
        round(-(col("c").cast("double") / col("n")) *
          log(col("c").cast("double") / col("n")) / log(lit(2.0)), 6)
          .cast("decimal(28,6)").as("term"))
      .groupBy(col(idCol))
      .agg(max(col("n")).as("n_chars"),
        round(sum(col("term")).cast("double"), 6).as("entropy"))

  /** Flesch-Kincaid readability grade — the classic surface-form
    * quality feature (alongside the q34 length/punct/stopword ratios).
    * Syllables are approximated by vowel-group runs (`[aeiouy]+`), the
    * standard cheap heuristic; sentences by `[.!?]+` splits with
    * non-blank remainder, floored at 1 so headline-like docs don't
    * divide by zero. Entirely map-only: three codegen'd regex/split
    * projections per row, no shuffle except the caller's sort.
    * Documents with no words are dropped (no grade to assign).
    * Returns (idCol, n_words, n_sentences, n_syllables, fk_grade). */
  def readability(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = size(filter(split(col(textCol), "\\s+"), w => length(w) > 0))
    val sentences = greatest(
      size(filter(split(col(textCol), "[.!?]+"), s => length(trim(s)) > 0)),
      lit(1))
    val syllables = size(regexp_extract_all(lower(col(textCol)),
      lit("[aeiouy]+"), lit(0)))
    docs.select(col(idCol),
        words.cast("long").as("n_words"),
        sentences.cast("long").as("n_sentences"),
        syllables.cast("long").as("n_syllables"))
      .filter(col("n_words") > 0)
      .withColumn("fk_grade",
        round(lit(0.39) * col("n_words").cast("double") / col("n_sentences") +
          lit(11.8) * col("n_syllables").cast("double") / col("n_words") -
          lit(15.59), 6))
  }

  /** CCNet-style perplexity bucketing: documents are split into
    * head / middle / tail by the 0.75/0.25 quantiles of their
    * [[lmScore]] quality (higher avg log-prob = less surprising =
    * head). The thresholds ride the plan as a broadcast 1-row frame —
    * no collect, no global window; classification is map-side. The
    * quantiles here are EXACT (`percentile`) for cross-engine
    * bit-equality; at 100 TB swap in `approx_percentile` — the plan
    * shape (scalar agg → broadcast cross join → map classify →
    * partial/final agg) is identical. 0.25/0.75 are binary-exact
    * doubles, so both engines interpolate from the same literals.
    * Returns (bucket, n_docs, sum_logp), decimal-exact sum. */
  def lmBuckets(docs: DataFrame, idCol: String, textCol: String,
                exact: Boolean = true): DataFrame = {
    // both the threshold agg and the classification consume the scored
    // frame; materialize once so the LM train+score isn't paid twice
    val scored = lmScore(docs, idCol, textCol).localCheckpoint()
    val th =
      if (exact) scored.agg(
        expr("percentile(avg_logp, 0.25)").as("t1"),
        expr("percentile(avg_logp, 0.75)").as("t2"))
      else scored.agg( // the 100 TB path: sketch, no global sort
        expr("approx_percentile(avg_logp, 0.25, 10000)").as("t1"),
        expr("approx_percentile(avg_logp, 0.75, 10000)").as("t2"))
    scored.crossJoin(broadcast(th))
      .select(
        when(col("avg_logp") >= col("t2"), "head")
          .when(col("avg_logp") >= col("t1"), "middle")
          .otherwise("tail").as("bucket"),
        col("avg_logp"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("avg_logp").cast("decimal(28,6)")).cast("double").as("sum_logp"))
      .orderBy(col("bucket"))
  }

  /** Character-bigram language-model score — the perplexity-proxy
    * quality signal of the CCNet/RefinedWeb recipes, self-trained on
    * the corpus it scores (no external model artifact). Per document:
    * the mean add-one-smoothed log-probability of its character
    * bigrams, higher = more typical of the corpus; gibberish, binary
    * spill, and wrong-charset text sit far in the left tail.
    *
    * Two linear passes over the corpus, both map-heavy: (1) TRAIN —
    * count bigrams (shuffle cardinality = the bigram vocabulary,
    * bounded by charset² — thousands of rows even at 100 TB) and turn
    * counts into `round(ln((c+1)/(N+V)), 6)`; (2) SCORE — broadcast the
    * vocabulary-sized log-prob table, map-side join each document's
    * distinct bigrams (count-weighted), one per-doc aggregate. Both
    * passes share one materialized per-(doc, bigram) count frame, so
    * the corpus is scanned and exploded once. Log-probs are rounded to 6
    * decimals BEFORE the decimal-typed per-doc sum, so the fold is
    * order-insensitive and any engine reproduces avg_logp bit-for-bit.
    *
    * Documents shorter than 2 characters have no bigrams and are
    * omitted. Returns (doc_id, n_bigrams, avg_logp). */
  def lmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // per-(doc, bigram) counts, materialized once: both the trainer and
    // the scorer consume this frame, and without the checkpoint the
    // static planner would re-scan and re-explode the corpus for each
    // (the q86/q65 double-subtree rule). Collapsing to per-doc distinct
    // bigrams first also shrinks the scoring join from bigram INSTANCES
    // to per-doc vocabulary — sum(logp)·k is decimal-exact, so values
    // are bit-identical to the instance-level fold.
    val bgc = docs
      .select(col(idCol).as("doc_id"), lower(col(textCol)).as("t"))
      .filter(length(col("t")) >= 2)
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(1, char_length(t) - 1), i -> substring(t, i, 2))")).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("k"))
      .localCheckpoint()
    val model = bgc.groupBy(col("bg")).agg(sum(col("k")).as("c"))
    val tot = model.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
    val lp = model.crossJoin(broadcast(tot))
      .select(col("bg"),
        round(log((col("c") + 1).cast("double") / (col("n") + col("v")).cast("double")), 6)
          .cast("decimal(28,6)").as("logp"))
    bgc.join(broadcast(lp), Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"),
        round((sum(col("logp") * col("k"))).cast("double") / sum(col("k")), 6)
          .as("avg_logp"))
  }

  /** DSIR importance score (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): per-document
    * log-importance weight log p_target(d)/p_raw(d) under two
    * hashed-unigram bag-of-words models — the cheap distribution-
    * matching selector that upweights raw-corpus documents resembling
    * a small in-domain target set. `isTarget` marks the target rows
    * (they stay part of the raw corpus, as in the paper).
    *
    * Features are words hashed into 256 buckets via the md5-prefix
    * (engine-portable, like every hash in [[graft.operators.Dedup]]);
    * both models are add-one smoothed over the fixed 256-bucket space,
    * and per-bucket log-ratios are rounded to 6 decimals and carried
    * as DECIMAL(28,6) so the per-doc fold is order-independent (the
    * [[lmScore]] determinism discipline).
    *
    * Scale shape: one tokenize+explode pass collapses to per-(doc,
    * bucket) counts (map-side combine), materialized once for both the
    * model build and the scorer; the model is ≤256 rows and rides a
    * broadcast join. Nothing shuffles except the (doc, bucket) partial
    * aggregate — at 100 TB the shuffled frame is vocabulary-bounded
    * per doc, not token-sized. */
  def dsirScore(docs: DataFrame, idCol: String, textCol: String,
                isTarget: Column): DataFrame = {
    val occ = docs
      .select(col(idCol).as("doc_id"), isTarget.as("in_target"),
        explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("doc_id"), col("in_target"),
        substring(md5(col("w")), 1, 2).as("b"))
      .groupBy(col("doc_id"), col("in_target"), col("b"))
      .agg(count(lit(1)).as("k"))
      .localCheckpoint() // feeds the model AND the scorer (q86/q65 rule)
    val buckets = occ.groupBy(col("b")).agg(
      sum(col("k")).as("cr"),
      sum(when(col("in_target"), col("k")).otherwise(0L)).as("ct"))
    val tot = buckets.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val lw = buckets.crossJoin(broadcast(tot))
      .select(col("b"),
        round(log(
          ((col("ct") + 1).cast("double") / (col("nt") + 256).cast("double")) /
            ((col("cr") + 1).cast("double") / (col("nr") + 256).cast("double"))), 6)
          .cast("decimal(28,6)").as("lw"))
    occ.join(broadcast(lw), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_toks"),
        sum(col("lw") * col("k")).cast("double").as("log_weight"))
      .withColumn("selected", col("log_weight") > 0)
  }

  /** Zipf power-law fit: least-squares slope/intercept of ln(freq) on
    * ln(rank) over the top-`topRanks` tokens — the classic corpus
    * health diagnostic (natural language sits near slope -1; heavy
    * boilerplate, templated spam, or synthetic text bends the line).
    *
    * Scale shape: token counting is one map-side-combined aggregate;
    * the shortlist is `orderBy().limit(topRanks)` (TakeOrderedAndProject
    * — a bounded top-k, NOT a global sort), and the only partition-less
    * window assigns ranks over that LIMIT-bounded frame. The whole
    * regression stays in EXACT bounded-precision DECIMAL arithmetic —
    * 6-decimal terms, closed-form numerators/denominators as decimal
    * products that provably fit precision 38 — so each output is ONE
    * division of two engine-identical exact decimals: no intermediate
    * double whose last ulp could flip the 6-decimal rounding (the
    * failure mode a naive double pipeline hits at rounding-boundary
    * corpora). */
  def zipfFit(docs: DataFrame, textCol: String, topRanks: Int): DataFrame = {
    require(topRanks >= 2 && topRanks <= 1000,
      "topRanks in [2, 1000] (decimal precision budget)")
    val tf = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    val top = tf.orderBy(col("f").desc, col("w")).limit(topRanks)
    val ranked = top
      .withColumn("rk",
        row_number().over(Window.orderBy(col("f").desc, col("w"))))
      .select(
        round(log(col("rk").cast("double")), 6).cast("decimal(10,6)").as("x"),
        round(log(col("f").cast("double")), 6).cast("decimal(10,6)").as("y"))
    val s = ranked.agg(
      count(lit(1)).cast("decimal(4,0)").as("n"),
      sum(col("x")).cast("decimal(10,6)").as("sx"),
      sum(col("y")).cast("decimal(10,6)").as("sy"),
      sum(col("x") * col("x")).cast("decimal(17,12)").as("sxx"),
      sum(col("x") * col("y")).cast("decimal(17,12)").as("sxy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy") // exact (23,12)
    val den = col("n") * col("sxx") - col("sx") * col("sx") // exact (23,12)
    s.select(col("n").cast("long").as("n_ranks"),
      round(num.cast("double") / den.cast("double"), 6).as("slope"),
      round((col("sy") * den - num * col("sx")).cast("double") /
        (col("n") * den).cast("double"), 6).as("intercept"))
  }

  /** Deterministic hash-threshold sampling: keep a row iff the first
    * `hexDigits` of md5(id) sort below `below` — membership is a pure
    * function of the id, so the sample is REPRODUCIBLE across runs,
    * machines, and engines, and STABLE under corpus growth (a doc
    * never flips in or out as neighbors arrive), the properties
    * `rand()`-based sampling lacks and the reason eval holdouts are
    * carved this way. Map-only; fraction ≈ below/16^hexDigits. */
  def consistentSample(docs: DataFrame, idCol: String,
                       hexDigits: Int, below: String): DataFrame = {
    require(hexDigits >= 1 && hexDigits <= 32, "hexDigits in [1, 32]")
    docs.filter(
      substring(md5(col(idCol).cast("string")), 1, hexDigits) < below)
  }

  /** Fractional-epoch corpus expansion — the trainer-input mixing step
    * ("repeat books 3 epochs, web 0.8") materialized as rows: each doc
    * in group g appears floor(epochs(g)) times, plus once more iff its
    * md5 draw falls under the fractional part. Membership in the
    * fractional epoch is a pure function of the doc id (the
    * [[consistentSample]] discipline: the cutoff is the fraction as a
    * fixed-width hex string against the hash's first 8 hex chars), so
    * the expanded corpus is bit-reproducible across runs and engines —
    * what `rand() < frac` cannot give a resumable training pipeline.
    *
    * Scale shape: the per-group (floor, cutoff) table is
    * strata-sized and rides a broadcast join; expansion is a map-side
    * `explode(sequence)` — output rows ≈ Σ docs·epochs, no shuffle.
    * Groups without a weight are EXCLUDED (an absent mixture entry is
    * "don't train on this", matching [[allocateBudget]]'s contract). */
  def epochExpand(docs: DataFrame, idCol: String, groupCol: String,
                  epochs: Map[String, Double]): DataFrame = {
    require(epochs.nonEmpty, "need at least one group weight")
    require(epochs.values.forall(w => w >= 0 && w < 1000),
      "epochs in [0, 1000)")
    val spark = docs.sparkSession
    import spark.implicits._
    val lookup = epochs.toSeq.map { case (g, w) =>
      val full = math.floor(w).toLong
      (g, full, f"${((w - full) * 4294967296.0).toLong}%08x")
    }.toDF(groupCol, "_full", "_cut")
    docs.join(broadcast(lookup), Seq(groupCol))
      .withColumn("n_copies", col("_full") +
        when(substring(md5(col(idCol).cast("string")), 1, 8) < col("_cut"),
          1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .withColumn("epoch", explode(expr("sequence(1, n_copies)")))
      .drop("_full", "_cut", "n_copies")
  }

  /** Per-group document quota (the Common-Crawl "host cap"): flag the
    * top `cap` docs per group by (`orderCol` desc, id asc); everything
    * else in the group is over-quota. The anti-over-representation
    * gate web corpora run per registered domain.
    *
    * Scale shape: the keep set is computed with the bounded
    * [[graft.functions.TopK]] partial aggregate — each map task ships
    * at most `cap` (id, score) pairs per group, so a pathological host
    * with 10^9 docs costs cap-sized shuffle rows, NOT a 10^9-row
    * single-reducer window sort (the row_number form's skew killer).
    * The kept-id set (groups × cap) joins back on the id key with NO
    * forced hint: it is groups-proportional, so at a web-scale 10^8
    * hosts it is NOT broadcastable — AQE broadcasts it while its
    * runtime size allows and falls back to an id-keyed shuffle join
    * when it doesn't (the broadcast-audit contract). */
  def groupQuota(docs: DataFrame, idCol: String, groupCol: String,
                 orderCol: String, cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val kept = docs
      // null score/id -> unrankable, over-quota by definition (and the
      // TopK tuple encoder is null-free by contract) — filter map-side
      .filter(col(orderCol).isNotNull && col(idCol).isNotNull)
      .select(col(groupCol), col(idCol).cast("long").as("_qid"),
        col(orderCol).cast("double").as("_qscore"))
      .groupBy(col(groupCol))
      .agg(graft.functions.TopK.top_k(cap)(col("_qid"), col("_qscore")).as("top"))
      .select(explode(col("top")).as("hit"))
      .select(col("hit._1").as("_qid"))
    docs.join(kept,
        docs(idCol).cast("long") === kept("_qid"), "left_outer")
      .withColumn("kept", col("_qid").isNotNull)
      .drop("_qid")
  }

  /** Vocabulary coverage / OOV rate: build the corpus top-`vocabSize`
    * token vocabulary (count desc, token asc — fully deterministic),
    * then score each doc by the fraction of its token OCCURRENCES
    * outside that vocabulary. High-OOV docs are encoding junk, exotic
    * boilerplate, or wrong-tokenizer content — a standard pre-training
    * gate, and the copy a tokenizer-coverage audit reads.
    *
    * Scale shape: token frequencies partial-aggregate map-side; the
    * vocabulary is `TakeOrderedAndProject` (top-N bounded, never a full
    * sort) and rides back as a broadcast; per-doc scoring is then one
    * map-side broadcast join + one partial-agg'd per-doc fold. Returns
    * (doc_id, n_tokens, n_oov, oov_rate). */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              vocabSize: Int): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), "\\s+")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(true).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
  }

  /** Temperature-scaled mixture allocation (the multilingual sampling
    * formula, p_l ∝ n_l^α): flatten the natural size distribution so
    * low-resource strata are up-sampled, then hand the exact integer
    * apportionment to [[allocateBudget]]'s largest-remainder step.
    *
    * α is fixed at 0.5 (square-root temperature): IEEE-754 requires
    * sqrt to be correctly rounded, so `floor(sqrt(n) * 1e6)` yields the
    * SAME integer weight on every engine — unlike pow(n, 0.3), whose
    * last ulp is libm-specific and could flip a remainder rank. The
    * 1e6 factor keeps six significant fractional digits of the weight
    * before the floor. Stratum-count-sized frames end to end. */
  def temperatureAllocate(counts: DataFrame, stratumCol: String,
                          nCol: String, budget: Long): DataFrame = {
    val w = counts.select(col(stratumCol),
      floor(sqrt(col(nCol).cast("double")) * 1e6).cast("long").as("weight"))
    counts.select(col(stratumCol), col(nCol).cast("long").as(nCol))
      .join(broadcast(allocateBudget(w, stratumCol, "weight", budget)),
        Seq(stratumCol))
  }

  /** Linear text-classifier TRAINING — the other half of
    * [[linearScore]]'s inference: batch gradient descent on logistic
    * loss over bag-of-words relative-frequency features, the
    * fasttext-style recipe behind every quality/language/domain scorer
    * a curation pipeline runs. Labels ride in as a 0/1 column.
    *
    * The model is a (token, weight) FRAME, never driver-collected —
    * vocabulary-sized state updated in place each round (the pageRank
    * discipline: localCheckpoint per round, two joins + two aggregates,
    * nothing corpus-sized moves except one token-keyed and one
    * doc-keyed shuffle per round). At a 10M-token vocabulary the
    * weight join flips from broadcast to shuffle automatically — no
    * forced hints.
    *
    * Engine-exact reproducibility (the q97/q95 discipline): features
    * x = round(cnt/n, 6) held as DECIMAL(18,6); every cross-row sum
    * (z fold, gradients) is a decimal sum of exact products, so folds
    * are order-insensitive; the sigmoid is the only libm call and its
    * output is rounded to 6 decimals before it re-enters decimal
    * arithmetic; weight updates are round(lr·grad/n, 6) so weights
    * stay exact multiples of 1e-6. An oracle that unrolls the same
    * rounds reproduces the model bit-for-bit.
    *
    * Returns (tok, weight) after `rounds` full-batch steps, with the
    * intercept as the reserved `__bias__` row. */
  def trainLogistic(docs: DataFrame, idCol: String, textCol: String,
                    labelCol: String, rounds: Int, lr: Double): DataFrame = {
    require(rounds >= 1, "need at least one training round")
    val dec = "decimal(18,6)"
    val feats = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), "\\s+")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("doc_id"))))
      .select(col("doc_id"), col("tok"),
        round(col("cnt").cast("double") / col("n"), 6).cast(dec).as("x"))
      .localCheckpoint()
    val labels = docs
      .select(col(idCol).as("doc_id"), col(labelCol).cast("int").as("y"))
      .localCheckpoint()
    // one count action: the batch size is a scalar in every update rule
    // (the BPE one-row-to-the-driver-per-round discipline)
    val nd = labels.count()
    // weights start empty (w=0 everywhere); bias starts 0 — round one's
    // uniform p=0.5 gives every token its first signed gradient
    var w = feats.sparkSession.createDataFrame(
      feats.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("tok",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.DoubleType))))
    var bias = 0.0
    for (_ <- 1 to rounds) {
      val z = feats.join(w, Seq("tok"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(sum(col("x") * coalesce(col("w"), lit(0.0)).cast(dec)).as("zsum"))
      val err = labels.join(z, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          (round(lit(1.0) / (lit(1.0) +
              exp(-(lit(bias) + coalesce(col("zsum"), lit(0).cast(dec)).cast("double")))),
            6).cast(dec) - col("y")).as("err"))
        .localCheckpoint()
      val grad = feats.join(err, Seq("doc_id"))
        .groupBy(col("tok")).agg(sum(col("err") * col("x")).as("g"))
      w = w.join(grad, Seq("tok"), "full_outer")
        .select(col("tok"),
          (coalesce(col("w"), lit(0.0)) -
            round(lit(lr) * coalesce(col("g"), lit(0).cast(dec)).cast("double") /
              lit(nd), 6)).as("w"))
        .localCheckpoint()
      bias -= err.agg(coalesce(sum(col("err")), lit(0).cast(dec))
          .cast("double").as("g"))
        .select(round(lit(lr) * col("g") / lit(nd), 6)).head().getDouble(0)
    }
    w.select(col("tok"), col("w").as("weight"))
      .unionByName(w.sparkSession.range(1)
        .select(lit("__bias__").as("tok"), lit(bias).as("weight")))
  }

  /** Two-pass heavy hitters: every token whose occurrence count clears
    * `pctNum/pctDen` of all occurrences (e.g. 1/100 = 1%), with EXACT
    * counts — the boilerplate-token / hot-host detector that cannot
    * afford a full token-frequency shuffle at 100 TB.
    *
    * Pass one is the mergeable Misra–Gries sketch
    * ([[graft.functions.HeavyHitters]]): one partial-agg'd pass, o(n)
    * memory, candidate set ≤ `sketchK` tokens GUARANTEED to contain
    * every true heavy hitter (requires sketchK ≥ pctDen). Pass two
    * recounts ONLY the candidates — a broadcast semi-join plus an
    * aggregate over ≤ sketchK keys, so the only full-cardinality
    * frequency table that ever exists is candidate-sized. The sketch's
    * own counts are merge-order-dependent and are never emitted; the
    * final rows are deterministic because the candidate superset
    * property holds under any merge order and the threshold compares
    * exact integers (`pctDen·cnt >= n`). */
  def heavyHitters(docs: DataFrame, idCol: String, textCol: String,
                   pctNum: Int, pctDen: Int, sketchK: Int): DataFrame = {
    require(pctNum > 0 && pctDen > pctNum, "need 0 < pctNum < pctDen")
    require(sketchK * pctNum >= pctDen,
      "sketchK must be >= pctDen/pctNum for the MG guarantee")
    val toks = docs.select(
      explode(split(col(textCol), "\\s+")).as("tok"))
    val cands = toks
      .agg(graft.functions.HeavyHitters.mg_candidates(sketchK)(col("tok")).as("c"))
      .select(explode(col("c")).as("tok"))
    val total = toks.agg(count(lit(1)).as("n"))
    toks.join(broadcast(cands), Seq("tok"), "left_semi")
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(lit(pctDen.toLong) * col("cnt") >= lit(pctNum.toLong) * col("n"))
      .select(col("tok"), col("cnt"))
  }

  /** Population-stability-index drift between two cohorts of one
    * bucketed feature — the monitoring metric that detects a feature's
    * distribution shifting between a baseline corpus snapshot and the
    * current one (quality scores, doc lengths, perplexities) before
    * the shift silently moves every downstream threshold. Per bucket:
    * cohort shares pa/pb and the PSI term (pa−pb)·ln(pa/pb); the
    * corpus-level PSI is the sum (>0.2 = major shift by convention).
    *
    * One bucket×cohort aggregate (bounded groups) + a bucket-keyed
    * pivot; shares divide exact integer counts, terms round to 6
    * decimals before any downstream sum (the charEntropy discipline).
    * Buckets empty in EITHER cohort get a null term — the standard
    * "recount with coarser buckets" signal, not a silent epsilon.
    * Returns (bucket, n_base, n_cur, pa, pb, psi_term). */
  def psiDrift(df: DataFrame, bucketCol: String, cohortCol: String,
               baseValue: String, curValue: String): DataFrame = {
    val counts = df
      .filter(col(cohortCol).isin(baseValue, curValue))
      .groupBy(col(bucketCol).as("bucket"))
      .agg(
        sum(when(col(cohortCol) === baseValue, 1L).otherwise(0L)).as("n_base"),
        sum(when(col(cohortCol) === curValue, 1L).otherwise(0L)).as("n_cur"))
    val tot = counts.agg(sum(col("n_base")).as("tb"), sum(col("n_cur")).as("tc"))
    counts.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_base"), col("n_cur"),
        round(col("n_base").cast("double") / col("tb"), 6).as("pa"),
        round(col("n_cur").cast("double") / col("tc"), 6).as("pb"))
      .withColumn("psi_term",
        when(col("pa") > 0.0 && col("pb") > 0.0,
          round((col("pa") - col("pb")) * log(col("pa") / col("pb")), 6)))
  }

  /** Classifier calibration curve (reliability diagram): bucket
    * predicted probabilities into `nBuckets` equal bins and compare
    * each bin's mean prediction to its observed positive rate — the
    * eval every deployed quality/language scorer needs before its
    * scores gate a corpus (a 0.9-bucket whose positive rate is 0.6
    * means thresholds lie). Input: a frame carrying a [0,1] `scoreCol`
    * and a 0/1 `labelCol`.
    *
    * One partial-agg'd aggregate over bucket keys (bounded at
    * `nBuckets` groups); scores are summed as DECIMAL(18,6) so the
    * per-bin mean is order-insensitive. Returns
    * (bucket, n_docs, mean_score, frac_pos). */
  def calibration(scored: DataFrame, scoreCol: String, labelCol: String,
                  nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, "need at least two buckets")
    scored
      .withColumn("bucket",
        least(floor(col(scoreCol) * nBuckets), lit(nBuckets - 1)).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col(scoreCol).cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("mean_score"),
        round(sum(col(labelCol).cast("long")).cast("double") /
          count(lit(1)), 6).as("frac_pos"))
  }

  /** n-gram novelty: the fraction of a doc's DISTINCT word n-grams that
    * appear nowhere else in the corpus (document frequency 1). Low
    * novelty = near-boilerplate; per-shingle df == 1 is also the
    * memorization-risk copy (unique spans are the ones a model can only
    * have learned from this doc). Returns (doc_id, n_shingles,
    * n_unique, novelty).
    *
    * Scale shape: one hash shuffle of the distinct-shingle stream (the
    * df count rides a window partitioned BY SHINGLE — millions of tiny
    * partitions, no skew), then a per-doc partial-agg'd fold. Nothing
    * is all-pairs; cost is linear in corpus shingles. */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
                   n: Int): DataFrame = {
    val sh = Dedup.shingles(docs, idCol, textCol, n)
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
    sh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique").cast("double") / col("n_shingles"), 6))
  }

  /** Class-based TF-IDF keyword extraction (the BERTopic c-TF-IDF
    * shape): treat each class (language, source, cluster) as one
    * concatenated document and surface the `k` terms most distinctive
    * of it — the label line of a dataset card, or the cheap topic label
    * for a dup-cluster. The idf stays RATIONAL (tf × corpusTokens / tf
    * across classes, no ln) so scores are bit-reproducible on any
    * engine, the q65 discipline.
    *
    * Scale shape: one hash shuffle of (class, token) partial counts
    * (map-side combined, cardinality = vocab × classes, NOT corpus
    * tokens), a vocab-sized global-frequency join on the token key, a
    * one-row corpus-total ride, and a per-class window over
    * vocab-sized partitions. Nothing corpus-sized moves twice.
    * Returns (classCol, w, score, rn). */
  def classTfidf(docs: DataFrame, classCol: String, textCol: String,
                 k: Int): DataFrame = {
    val words = docs.select(col(classCol),
      explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val tfc = words.groupBy(col(classCol), col("w")).agg(count(lit(1)).as("tf"))
      .localCheckpoint() // feeds both the term-total aggregate and the score
    val ft = tfc.groupBy(col("w")).agg(sum(col("tf")).as("ft"))
    val total = tfc.agg(sum(col("tf")).as("t"))
    tfc.join(ft, Seq("w"))
      .crossJoin(broadcast(total))
      .withColumn("score", (col("tf") * col("t")).cast("double") / col("ft"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(classCol))
          .orderBy(col("score").desc, col("w"))).cast("long"))
      .filter(col("rn") <= k)
      .select(col(classCol), col("w"), col("score"), col("rn"))
  }

  /** Positional-inverted-index phrase search: documents containing the
    * exact token sequence `phrase`, with occurrence counts — the
    * adjacency query a bag-of-words index (BM25, q133) cannot answer.
    * Each phrase token filters the (doc, pos, tok) occurrence stream
    * down to its own postings list BEFORE any join (the filters reach
    * the scan), then n−1 equi-joins on (doc, startPos) align the
    * positions; join inputs are postings-list-sized, never the corpus.
    * This is how phrase queries run against a real positional index —
    * at 100 TB the postings would be the stored artifact and the scan
    * skipped entirely; the shapes downstream of the scan are the same.
    * Returns (idCol, n_occurrences) for matching docs. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "a 1-token phrase is a plain term lookup")
    val toks = docs.select(col(idCol),
      posexplode(filter(split(col(textCol), "\\s+"), w => length(w) > 0))
        .as(Seq("pos", "tok")))
    val first = toks.filter(col("tok") === phrase.head)
      .select(col(idCol), col("pos"))
    val matched = phrase.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (w, i)) =>
        acc.join(
          toks.filter(col("tok") === w)
            .select(col(idCol), (col("pos") - i).as("pos")),
          Seq(idCol, "pos"))
    }
    matched.groupBy(col(idCol)).agg(count(lit(1)).as("n_occurrences"))
  }

  /** Curriculum schedule: order the corpus by a difficulty column,
    * accumulate a token budget along that order, and assign each doc
    * the phase whose cumulative budget bound it falls under (budgets
    * are cumulative upper bounds; spill past the last bound lands in
    * the overflow phase budgets.size + 1) — the
    * short-to-long / easy-to-hard data schedule.
    *
    * Scale shape: the global running sum uses NO global window — the
    * corpus range-partitions on (difficulty, id), each partition runs
    * a partition-local window, and the per-partition totals (one long
    * per partition) prefix-sum on the driver and ride back as a
    * literal map keyed by partition id (the IdAllocate discipline).
    * The ranged frame is checkpointed once so the two consumers (the
    * totals pass and the final projection) cannot re-sample different
    * range boundaries. Returns (idCol, difficultyCol, tokenCol,
    * cum_tokens, phase). */
  def curriculumPhases(docs: DataFrame, idCol: String, difficultyCol: String,
                       tokenCol: String, budgets: Seq[Long]): DataFrame = {
    require(budgets.nonEmpty && budgets == budgets.sorted,
      "budgets must be ascending cumulative bounds")
    // dedup the projection when difficulty IS the token column (chars
    // as both order and budget): a duplicate-name column inside the
    // checkpointed schema is exactly the frame a future
    // column-resolution change breaks on
    val ranged = docs
      .select(Seq(idCol, difficultyCol, tokenCol).distinct.map(col): _*)
      .repartitionByRange(col(difficultyCol), col(idCol))
      .withColumn("__pid", spark_partition_id().cast("long"))
      .localCheckpoint()
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col(difficultyCol), col(idCol))
    val counts = ranged.groupBy(col("__pid"))
      .agg(sum(col(tokenCol).cast("long")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    val offsets = counts.keys.toSeq.sorted.map { pid =>
      val off = acc; acc += counts(pid); pid -> off
    }
    val offsetMap =
      if (offsets.isEmpty) map(lit(0L), lit(0L))
      else map(offsets.flatMap { case (pid, off) => Seq(lit(pid), lit(off)) }: _*)
    val cum = coalesce(element_at(offsetMap, col("__pid")), lit(0L)) +
      sum(col(tokenCol).cast("long")).over(w)
    val phase = budgets.zipWithIndex.foldRight(
        lit(budgets.size + 1): org.apache.spark.sql.Column) {
      case ((bound, i), rest) => when(col("cum_tokens") <= bound, i + 1).otherwise(rest)
    }
    ranged.withColumn("cum_tokens", cum)
      .withColumn("phase", phase.cast("long"))
      .drop("__pid")
  }

  /** Contrastive training triples (anchor, positive, negative) from a
    * duplicate-cluster map: every member of a near-dup cluster anchors
    * one triple, its POSITIVE is the smallest other member of the same
    * cluster (near-dups are semantic paraphrases — exactly the positive
    * pair contrastive embedding training wants), and its NEGATIVE draws
    * from the [[negativeSample]] md5-ranked candidate pool with the
    * anchor's OWN cluster excluded — the correctness detail that stops
    * latent positives from poisoning the negatives.
    *
    * Scale shape: positives shuffle once on the cluster key; the pool
    * is LIMIT-bounded and broadcasts (the q84 k-bounded family); the
    * cluster-exclusion check is a pool-sized left join; the per-anchor
    * pick folds through the bounded TopK aggregate. Nothing all-pairs.
    * Returns (anchor_id, pos_id, neg_id). */
  def trainingTriples(clusters: DataFrame, docs: DataFrame, idCol: String,
                      poolSize: Int): DataFrame = {
    val pos = clusters.select(col("cluster"), col("doc_id").as("anchor_id"))
      .join(clusters.select(col("cluster"), col("doc_id").as("other_id")),
        Seq("cluster"))
      .filter(col("other_id") =!= col("anchor_id"))
      .groupBy(col("cluster"), col("anchor_id"))
      .agg(min(col("other_id")).as("pos_id"))
    val pool = broadcast(
      docs.select(col(idCol).cast("long").as("neg_id"))
        .orderBy(md5(col("neg_id").cast("string")), col("neg_id"))
        .limit(poolSize))
    val candClusters = clusters
      .select(col("doc_id").as("neg_id"), col("cluster").as("neg_cluster"))
    pos.join(pool, col("neg_id") =!= col("anchor_id"))
      .join(candClusters, Seq("neg_id"), "left")
      .filter(col("neg_cluster").isNull || col("neg_cluster") =!= col("cluster"))
      .withColumn("score",
        -conv(substring(md5(concat_ws(":", col("anchor_id"), col("neg_id"))), 1, 8),
          16, 10).cast("double"))
      .groupBy(col("anchor_id"), col("pos_id"))
      .agg(graft.functions.TopK.top_k(1)(col("neg_id"), col("score")).as("hits"))
      .select(col("anchor_id"), col("pos_id"),
        explode(col("hits")).as("h"))
      .select(col("anchor_id"), col("pos_id"), col("h._1").as("neg_id"))
  }

  /** Deterministic weighted sampling without replacement (the
    * Efraimidis–Spirakis A-ES scheme): each row draws a reproducible
    * uniform from pure integer arithmetic on its id (a Knuth
    * multiplicative hash mod a prime — no RNG, identical on any
    * engine) and ranks by ln(u)/w, the log-space form of the u^(1/w)
    * key; the global top `n` IS a weight-proportional sample. This is
    * the quality-weighted corpus subsample step (w = quality score,
    * token count, dedup-cluster mass).
    *
    * Scale shape: key assignment is map-only codegen; the top-n is
    * Spark's TakeOrderedAndProject (per-partition heaps, driver merges
    * n rows), so nothing sorts globally. Keys round to 6 decimals with
    * id tiebreaks, the cross-engine float discipline. Weights must be
    * strictly positive; non-positive-weight rows are excluded.
    * Returns (idCol, weightCol, skey). */
  def weightedSample(docs: DataFrame, idCol: String, weightCol: String,
                     n: Int): DataFrame = {
    val u = ((col(idCol).cast("long") * lit(2654435761L)) % lit(1000003L) + 1L)
      .cast("double") / lit(1000004.0)
    docs.filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol),
        round(log(u) / col(weightCol).cast("double"), 6).as("skey"))
      .orderBy(col("skey").desc, col(idCol))
      .limit(n)
  }

  /** High-entropy credential detector — the leaked-API-key/secret scrub
    * gate every code/web training corpus needs (the detect-secrets
    * heuristic): candidate tokens are long unbroken base62 runs, and a
    * candidate counts as a secret when it mixes digits with letters AND
    * its character entropy clears `entropyBits` (random keys sit near
    * the log2(len) ceiling; natural long words sit well under). Entropy
    * uses the decimal-stable q153 fold, so the flag is bit-reproducible.
    * Map-only until the per-doc rollup; cost is linear in candidate
    * characters, and docs without candidates short-circuit entirely.
    * Returns (idCol, n_candidates, n_secrets, max_entropy, has_secret)
    * for every input doc. */
  def secretScan(docs: DataFrame, idCol: String, textCol: String,
                 minLen: Int = 20, entropyBits: Double = 3.5): DataFrame = {
    val cands = docs.select(col(idCol),
        explode(regexp_extract_all(col(textCol),
          lit(s"[A-Za-z0-9]{$minLen,}"), lit(0))).as("tok"))
      .distinct() // per-doc distinct candidates: repeats add no evidence
      .withColumn("has_mix",
        col("tok").rlike("[0-9]") && col("tok").rlike("[A-Za-z]"))
    val ent = cands
      .select(col(idCol), col("tok"), col("has_mix"),
        explode(split(col("tok"), "")).as("ch"))
      .filter(length(col("ch")) > 0)
      .groupBy(col(idCol), col("tok"), col("has_mix"), col("ch"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy(col(idCol), col("tok"))))
      .select(col(idCol), col("tok"), col("has_mix"),
        round(-(col("c").cast("double") / col("n")) *
          log(col("c").cast("double") / col("n")) / log(lit(2.0)), 6)
          .cast("decimal(28,6)").as("term"))
      .groupBy(col(idCol), col("tok"), col("has_mix"))
      .agg(round(sum(col("term")).cast("double"), 6).as("entropy"))
      .withColumn("is_secret", col("has_mix") && col("entropy") >= entropyBits)
    docs.select(col(idCol)).join(
        ent.groupBy(col(idCol)).agg(
          count(lit(1)).as("n_candidates"),
          sum(when(col("is_secret"), 1L).otherwise(0L)).as("n_secrets"),
          round(max(col("entropy")), 6).as("max_entropy")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_secrets"), lit(0L)).as("n_secrets"),
        col("max_entropy"),
        (coalesce(col("n_secrets"), lit(0L)) > 0).as("has_secret"))
  }
}
