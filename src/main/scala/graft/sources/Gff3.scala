package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.chado.{FastaRecord, GffRecord}

/** GFF3 source (SURVEY.md S1/S2): line-wise scan of a GFF3 file into a
  * typed `Dataset[GffRecord]`, plus the embedded `##FASTA` tail.
  *
  * Spark-first shape: `spark.read.text` keeps the scan distributed (one
  * task per file split); parsing is a per-partition pure function, no
  * driver-side state. Directives (`##...`) and comments are filtered in
  * the plan; the attribute column is a multi-map exactly like the
  * reference's parse (Bio::GFF3::LowLevel `gff3_parse_feature`, consumed
  * at lib/Modware/Load/Command/gff3tochado.pm:188-213).
  *
  * The `##FASTA` boundary is per-file state, so FASTA extraction reads
  * via `wholeTextFiles` — fine because sequence tails are bounded per
  * file; at 100 TB you ship FASTA separately anyway.
  */
object Gff3 {

  /** Percent-decode the reserved GFF3 escapes (%XX). */
  private def unescape(s: String): String =
    if (!s.contains('%')) s
    else {
      val out = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '%' && i + 2 < s.length) {
          out.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } else { out.append(c); i += 1 }
      }
      out.toString
    }

  /** Parse one feature line (9 tab columns) into a GffRecord.
    * 1-based GFF3 start becomes 0-based interbase fmin (F8). */
  def parseLine(line: String): Option[GffRecord] = {
    val f = line.split("\t", -1)
    if (f.length < 9) None
    else for {
      start <- f(3).toIntOption // malformed coordinates: skip the row
      end <- f(4).toIntOption // rather than failing the whole task
    } yield GffRecord(
      seqId = unescape(f(0)),
      source = if (f(1) == ".") None else Some(unescape(f(1))),
      ftype = f(2),
      fmin = start - 1,
      fmax = end,
      score = if (f(5) == ".") None else f(5).toDoubleOption,
      strand = f(6) match {
        case "+" => Some(1)
        case "-" => Some(-1)
        case _ => None
      },
      phase = if (f(7) == ".") None else f(7).toIntOption,
      attributes = if (f(8) == "." || f(8).isEmpty) Map.empty
      else f(8).split(";").iterator.filter(_.nonEmpty).map { kv =>
        val eq = kv.indexOf('=')
        if (eq < 0) (unescape(kv.trim), Seq.empty[String])
        else (unescape(kv.take(eq).trim),
          kv.drop(eq + 1).split(",", -1).toSeq.map(v => unescape(v.trim)))
      }.toMap)
  }

  /** Feature rows of the GFF3 file(s) at `path` (directives, comments and
    * any `##FASTA` tail excluded). `badRows`, when supplied, tallies
    * malformed feature lines (A8 counter accumulation,
    * lib/Modware/Transform/Command/modidingoa.pm:29-59). */
  def features(spark: SparkSession, path: String,
               badRows: Option[org.apache.spark.util.LongAccumulator] = None
              ): Dataset[GffRecord] =
    parse(spark.read.textFile(path), badRows)

  /** The same full parse gate over an in-memory line Dataset — the
    * entry point the oracle row (q102) and any upstream line source
    * (e.g. a decompression stage) use; [[features]] is exactly
    * `parse(textFile(path))`. */
  def parse(lines: Dataset[String],
            badRows: Option[org.apache.spark.util.LongAccumulator] = None
           ): Dataset[GffRecord] = {
    import lines.sparkSession.implicits._
    lines.mapPartitions { it =>
      // per-partition flag: once ##FASTA starts, everything after in
      // this partition is sequence. A split boundary inside the FASTA
      // tail can leak sequence lines into the next partition, so also
      // require 9 tab columns (sequence lines have none).
      var inFasta = false
      it.flatMap { line =>
        if (inFasta || line.startsWith("#")) {
          if (line.startsWith("##FASTA")) inFasta = true
          None
        } else if (line.isEmpty || line.count(_ == '\t') < 8) None
        else {
          val parsed = parseLine(line)
          if (parsed.isEmpty) badRows.foreach(_.add(1))
          parsed
        }
      }
    }
  }

  /** [[features]] plus each record's 0-based FILE LINE NUMBER — the
    * deterministic ordering key the reference-exact staging mode
    * ([[graft.etl.Gff3ToChado.stageRefCompat]]) numbers its `auto<N>`
    * ids by. `zipWithIndex` follows partition order, which for a text
    * file is byte order, so the index is stable across runs and
    * parallelism levels; the parse gate (directive/FASTA/column
    * filtering) is [[parse]]'s, applied per partition. */
  def featuresWithLine(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).rdd.zipWithIndex.toDS()
      .mapPartitions { it =>
        var inFasta = false
        it.flatMap { case (line, no) =>
          if (inFasta || line.startsWith("#")) {
            if (line.startsWith("##FASTA")) inFasta = true
            None
          } else if (line.isEmpty || line.count(_ == '\t') < 8) None
          else parseLine(line).map(r => (r, no))
        }
      }
      .toDF("rec", "line_no")
      .select(col("rec.*"), col("line_no"))
  }

  /** Directive lines (`##gff-version`, `##sequence-region`, ...). */
  def directives(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path)
      .filter(_.startsWith("##"))
      .filter(l => !l.startsWith("##FASTA"))
      .map { l =>
        val body = l.drop(2).trim
        val sp = body.indexOf(' ')
        if (sp < 0) (body, "") else (body.take(sp), body.drop(sp + 1).trim)
      }
      .toDF("directive", "value")
  }

  /** The embedded `##FASTA` tail as (seqId, residues) records (S2). */
  def embeddedFasta(spark: SparkSession, path: String): Dataset[FastaRecord] = {
    import spark.implicits._
    embeddedFastaOf(spark.sparkContext.wholeTextFiles(path).values.toDS())
  }

  /** The same `##FASTA`-boundary split + FASTA parse over in-memory
    * file contents — the entry point the oracle row (q115) uses;
    * [[embeddedFasta]] is exactly `embeddedFastaOf(wholeTextFiles)`. */
  def embeddedFastaOf(contents: Dataset[String]): Dataset[FastaRecord] = {
    import contents.sparkSession.implicits._
    contents.flatMap { content =>
      val idx = content.indexOf("##FASTA")
      if (idx < 0) Iterator.empty
      else Fasta.parseString(content.substring(idx + "##FASTA".length))
    }
  }
}
