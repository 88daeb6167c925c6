package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** gff3alignment filter (SURVEY.md P7,
  * lib/Modware/Filter/Command/gff3alignment.pm:39-53,90-129): drop every
  * alignment group in which ANY consecutive match_part pair is farther
  * apart than the cutoff; surviving groups pass through whole.
  *
  * The reference loads the GFF3 into a temp SQLite feature store and
  * walks each match's sorted parts in Perl; here the per-group walk is a
  * lag window over (parent, fmin) and the group verdict a distinct +
  * anti-join — one shuffle keyed by parent, one by uniquename.
  */
object AlignmentFilter {

  /** `features`: the relational GFF3 frame (uniquename, ftype,
    * srcfeature, fmin, fmax, ..., parent). Distance uses the reference's
    * 1-based arithmetic `next.start - prev.end`
    * (gff3alignment.pm:120-126), i.e. `next.fmin + 1 - prev.fmax` in
    * interbase — adjacent parts are distance 1. Returns kept matches and
    * their parts, schema unchanged. */
  def matchPartFilter(features: DataFrame, maxDistance: Int,
                      matchType: String = "protein_match"): DataFrame = {
    val parts = features.filter(col("ftype") === "match_part")
    val w = Window.partitionBy(col("parent")).orderBy(col("fmin"), col("fmax"))
    val bad = parts
      .withColumn("dist", col("fmin") + 1 - lag(col("fmax"), 1).over(w))
      .filter(col("dist") > maxDistance)
      .select(col("parent").as("bad_parent")).distinct()
    val matches = features.filter(col("ftype") === matchType)
      .join(broadcast(bad), col("uniquename") === col("bad_parent"), "left_anti")
    val keptParts = parts
      .join(matches.select(col("uniquename").as("parent")), Seq("parent"), "left_semi")
    matches.unionByName(keptParts.select(matches.columns.toIndexedSeq.map(col): _*))
  }
}
