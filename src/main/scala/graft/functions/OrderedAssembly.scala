package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` for ordered sequence assembly (SURVEY.md §7's
  * "optional nicety": a `sort_array(collect_list(struct))` replacement
  * when per-group payloads get large — exon residues assembled in fmin
  * order, chado2fasta.pm:432-460).
  *
  * The buffer holds (position, payload) pairs and sorts once at
  * `finish`; unlike `collect_list` + `sort_array` the merge path
  * concatenates buffers without re-sorting, and the final sort happens
  * once per group rather than per plan-node evaluation. Memory is the
  * same O(group payload) — the real 100 TB guard is partitioning so a
  * single group (one gene's exons) always fits an executor, which the
  * genomic data model guarantees.
  */
object OrderedAssembly {

  type Piece = (Int, String) // (position, fragment)

  val assemble: Aggregator[Piece, List[Piece], String] =
    new Aggregator[Piece, List[Piece], String] {
      def zero: List[Piece] = Nil
      def reduce(b: List[Piece], a: Piece): List[Piece] = a :: b
      def merge(l: List[Piece], r: List[Piece]): List[Piece] = l ::: r
      def finish(b: List[Piece]): String =
        b.sortBy(_._1).map(_._2).mkString("")
      def bufferEncoder: Encoder[List[Piece]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Piece]]()
      def outputEncoder: Encoder[String] = Encoders.STRING
    }
}
