package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL (one JSON object per line) corpus source/sink — the wire
  * format web-scale text corpora actually ship in (Common Crawl
  * derivatives, instruction datasets), as an engine source alongside
  * the reference's line-oriented scanners (SURVEY.md §2.1 S1/S8: same
  * line-record discipline, JSON instead of tab fields).
  *
  * 100 TB discipline baked into the API:
  *  - the schema is EXPLICIT and required — `spark.read.json` without
  *    one runs a full inference pass over the corpus before the real
  *    scan, doubling every read; at 100 TB that is never acceptable.
  *  - malformed lines are ROUTED, not dropped or fatal: PERMISSIVE
  *    mode captures the raw line in a corrupt-record column, and
  *    [[read]] splits valid rows from rejects so a loader can land
  *    rejects in a quarantine store (the reference's invalid-row
  *    logging, GAF/GFF3 loaders, as a first-class frame).
  *  - JSONL is newline-splittable, so scans parallelize per HDFS block
  *    exactly like the other text scanners.
  */
object JsonlCorpus {

  /** The corrupt-record routing column (internal, stripped from the
    * valid frame). */
  val CorruptCol = "_corrupt_record"

  /** Write one JSON object per row/line, fields in `docs` column
    * order. Map-only (a projection over the outgoing frame); text
    * lines compress well under the default codec. */
  def write(docs: DataFrame, path: String,
            mode: String = "overwrite"): Unit =
    docs.select(to_json(struct(docs.columns.map(col).toIndexedSeq: _*))
        .as("value"))
      .write.mode(mode).text(path)

  /** Read a JSONL directory under an explicit `schema`:
    * (valid, rejects) where rejects carries the raw malformed line.
    *
    * Deliberately a text scan + `from_json` rather than the JSON
    * datasource's PERMISSIVE corrupt-record column: Spark REFUSES a
    * query whose required schema is only the internal corrupt column
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) unless the
    * parsed frame is cached first — and caching the corpus is exactly
    * what a 100 TB reader can't do. `from_json` PERMISSIVE parses a
    * malformed line to an all-null struct indistinguishable from a
    * legitimately-all-null object — so the corrupt-record field goes
    * INTO the from_json schema, where the parser drops the raw text of
    * any unparseable line: valid = corrupt field null, flattened;
    * rejects = the raw line where it isn't. A field that fails its
    * type coerces to null within an otherwise-valid row (PERMISSIVE
    * field semantics); only unparseable lines reject wholesale. */
  def read(spark: SparkSession, path: String,
           schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    val raw = spark.read.text(path)
      .select(from_json(col("value"), withCorrupt,
        Map("columnNameOfCorruptRecord" -> CorruptCol)).as("_j"))
    val valid = raw.filter(col(s"_j.$CorruptCol").isNull)
      .select(schema.fieldNames.toIndexedSeq.map(n => col(s"_j.$n").as(n)): _*)
    val rejects = raw.filter(col(s"_j.$CorruptCol").isNotNull)
      .select(col(s"_j.$CorruptCol").as("raw_line"))
    (valid, rejects)
  }
}
