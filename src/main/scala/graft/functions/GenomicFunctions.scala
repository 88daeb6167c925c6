package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar column functions re-expressing the reference's per-row Perl
  * helpers (SURVEY.md §2.9) as codegen-friendly Catalyst expressions.
  * All but one are pure `Column => Column` combinators — no UDFs — so
  * they stay inside whole-stage codegen and push down to the scan where
  * possible; the exception is [[formatG3]] (exact C printf rounding
  * needs BigDecimal, see its doc), used only at serialization edges.
  */
object GenomicFunctions {

  /** F7 — strand encode `'+' -> 1 / '-' -> -1`, else NULL.
    * Reference: lib/Modware/Loader/Role/WithChadoGFF3Helper.pm:336-338. */
  def strandEncode(c: Column): Column =
    when(c === "+", 1).when(c === "-", -1).otherwise(lit(null).cast("int"))

  /** F7 — strand decode back to `+`/`-`/`.`.
    * Reference: lib/Modware/EventHandler/FeatureWriter/GFF3.pm:58-63. */
  def strandDecode(c: Column): Column =
    when(c === 1, "+").when(c === -1, "-").otherwise(".")

  /** F8 — 1-based GFF3 start to 0-based interbase fmin.
    * Reference: lib/Modware/Loader/Role/WithChadoGFF3Helper.pm:333. */
  def toInterbase(start1: Column): Column = start1 - lit(1)

  /** F8 — 0-based interbase fmin back to 1-based.
    * Reference: lib/Modware/EventHandler/FeatureWriter/GFF3.pm:50-53. */
  def toOneBased(fmin: Column): Column = fmin + lit(1)

  /** F5 — DNA reverse complement (`reverse` + `tr/ATGC/TACG/`).
    * Reference: lib/Modware/Export/Command/chado2fasta.pm:404-407. */
  def reverseComplement(c: Column): Column =
    reverse(translate(c, "ATGCatgc", "TACGtacg"))

  /** F6 — 60-char FASTA line wrap `s/(\S{1,60})/$1\n/g`.
    * Reference: lib/Modware/Export/Command/chado2fasta.pm:365. */
  def wrap60(c: Column): Column = regexp_replace(c, "(.{1,60})", "$1\n")

  /** F2 — sequence checksum.
    * Reference: lib/Modware/Loader/Role/WithChadoGFF3Helper.pm:171. */
  def seqChecksum(c: Column): Column = md5(c)

  /** F1 — `normalize_id`: split `PREFIX:acc` into (db, accession); rows
    * without a prefix get the fallback db name.
    * Reference: lib/Modware/Loader/Role/WithChadoHelper.pm:146-154. */
  def normalizeId(c: Column, fallbackDb: String = "internal"): Column =
    when(c.contains(":"),
      struct(
        substring_index(c, ":", 1).as("db"),
        substring_index(c, ":", -1).as("accession")))
      .otherwise(struct(lit(fallbackDb).as("db"), c.as("accession")))

  /** F12 — strip a `DB:`-style prefix.
    * Reference: lib/Modware/EventHandler/FeatureWriter/GFF3.pm:99. */
  def stripPrefix(c: Column, prefix: String): Column =
    regexp_replace(c, "^" + prefix, "")

  /** F9 — legacy Oracle-style `dd-MMM-yy` dates with the POSIX/Perl
    * two-digit-century convention (69-99 → 19xx, 00-68 → 20xx — what
    * `strptime %y` does). Java's `yy` pattern resolves every two-digit
    * year to 20xx, which would misdate 1990s dictyBase records (and
    * mis-ORDER latest-by-date reduces that mix centuries).
    * Reference: the created_at/date_created columns consumed at
    * lib/Modware/Update/Command/dictybib.pm:17-22. */
  def legacyDate(c: Column): Column = {
    val yy = substring(c, 8, 2).cast("int")
    val yyyy = when(yy >= 69, yy + 1900).otherwise(yy + 2000).cast("string")
    // only fixed-width dd-MMM-yy qualifies: a 4-digit-year value like
    // 01-JAN-1995 would otherwise read '19' as the two-digit year and
    // silently parse to 2019 — anything else stays null (sorted last),
    // matching the old to_date(c, 'dd-MMM-yy') behavior
    when(length(c) === 9,
      to_date(concat(substring(c, 1, 7), yyyy), "dd-MMM-yyyy"))
      .otherwise(lit(null).cast("date"))
  }

  /** F1/§1.2 — pipe-joined multi-value field to array at the parse edge.
    * Reference: lib/Modware/Loader/GAF/Manager.pm:74-81. */
  def pipeSplit(c: Column): Column = split(c, "\\|")

  /** §1.2 — array back to pipe-joined string at the serialization edge.
    * Reference: lib/Modware/Export/GAF.pm:352-364. */
  def pipeJoin(c: Column): Column = concat_ws("|", c)

  /** F11 — obsolete-term name decoration `"name (obsolete ACC)"`.
    * Reference: lib/Modware/Loader/Role/Ontology/Temp/Generic.pm:141-146. */
  def obsoleteDecorate(name: Column, acc: Column, isObsolete: Column): Column =
    when(isObsolete === 1, concat(name, lit(" (obsolete "), acc, lit(")")))
      .otherwise(name)

  /** F17 — GO aspect one-letter mapping via a literal map lookup.
    * Reference: lib/Modware/Export/GAF.pm:169-180. */
  val aspectAbbrev: Map[String, String] = Map(
    "molecular_function" -> "F",
    "biological_process" -> "P",
    "cellular_component" -> "C")

  /** F16 — small static id-map translate as chained `when`s (broadcast-map
    * analog that stays fully codegen'd for literal maps).
    * Reference: lib/Modware/Role/Command/Convert/Identifier.pm:14-18. */
  def mapTranslate(c: Column, m: Map[String, String], default: Column): Column =
    m.foldLeft(Option.empty[Column]) { case (acc, (k, v)) =>
      Some(acc.fold(when(c === k, v))(_.when(c === k, v)))
    }.fold(default)(_.otherwise(default))

  /** F15 — CIGAR-style token reformat: `12M3I` -> `M 12 I 3` (Gap attr).
    * Reference: lib/Modware/Transform/Command/blast2chadogff3.pm:326-327. */
  def cigarToGap(c: Column): Column =
    trim(regexp_replace(c, "(\\d+)([A-Z])", "$2 $1 "))

  /** F10 — C-style `%.3g` (Perl sprintf semantics): trailing zeros and a
    * bare decimal point stripped, AND ties rounded half-even on the
    * exact binary value — `4605000.0 -> 4.6e+06` where Java's Formatter
    * (HALF_UP on the shortest representation) says `4.61e+06`. Faithful
    * C behavior needs the exact decimal expansion, so this is the one
    * deliberate UDF in the function library: `new BigDecimal(double)` is
    * that exact expansion, rounded with MathContext(3, HALF_EVEN). It
    * runs at serialization edges (GFF3 score/e-value emit), never in an
    * aggregation hot path. Reference: the `sprintf "%.3g"` e-value emit,
    * lib/Modware/Transform/Command/blast2chadogff3.pm:224. */
  private[functions] def g3(v: Double): String = {
    if (v.isNaN) return "nan"
    if (v.isInfinite) return if (v > 0) "inf" else "-inf"
    if (v == 0.0) return if (1.0 / v < 0) "-0" else "0"
    val bd = new java.math.BigDecimal(v)
      .round(new java.math.MathContext(3, java.math.RoundingMode.HALF_EVEN))
    val x = bd.precision - bd.scale - 1 // decimal exponent
    if (x < -4 || x >= 3) {
      val man = bd.movePointLeft(x).stripTrailingZeros.toPlainString
      val sign = if (x >= 0) "+" else "-"
      f"${man}e$sign${math.abs(x)}%02d"
    } else bd.stripTrailingZeros.toPlainString
  }

  private val g3Udf =
    udf((v: java.lang.Double) => if (v == null) null else g3(v))

  def formatG3(c: Column): Column = g3Udf(c)
}
