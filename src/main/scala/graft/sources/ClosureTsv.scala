package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.chado.ClosureRow

/** owltools transitive-closure TSV source (SURVEY.md S5): 4 columns
  * `subject predicate pathdistance object`
  * (lib/Modware/Loader/TransitiveClosure/Staging/Postgresql.pm:53-86).
  */
object ClosureTsv {
  def read(spark: SparkSession, path: String): Dataset[ClosureRow] =
    parse(spark.read.textFile(path))

  /** The same parse gate over an in-memory line Dataset — the entry
    * point the oracle row (q109) uses; [[read]] is exactly
    * `parse(textFile(path))`. */
  def parse(lines: Dataset[String]): Dataset[ClosureRow] = {
    import lines.sparkSession.implicits._
    lines.flatMap { line =>
      line.split("\t", -1) match {
        case Array(s, p, d, o, _*) if d.forall(_.isDigit) && d.nonEmpty =>
          Some(ClosureRow(s, p, d.toInt, o))
        case _ => None
      }
    }
  }
}
