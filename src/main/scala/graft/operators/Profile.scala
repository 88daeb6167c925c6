package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Single-pass column profiling — the ANALYZE / data-quality surface an
  * analytics engine ships next to its operators (reference analog: the
  * reference's post-load count reports, share/postgresql.lib:166-193,
  * generalized to every column).
  *
  * One output row per profiled column: row count, null count, distinct
  * count, and type-appropriate extremes (numeric min/max as double,
  * lexical min/max for everything else). All measures for ALL columns
  * compute in ONE aggregation job over the input — a single scan, with
  * partial aggregates before the only exchange; the per-column unpivot
  * happens on the 1-row summary, driver-cheap by construction.
  *
  * Scale note: `exact = true` uses Spark's native multi-distinct
  * planning (one Expand of factor = #columns — the standard exact
  * plan, fine into the tens of TB); `exact = false` swaps in
  * `approx_count_distinct` (HLL sketch, no Expand, one clean pass),
  * which is the 100 TB default. Schemas are identical either way, so
  * pipelines can promote accuracy without downstream changes.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      val nd = if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        count(when(col(c).isNull, 1)).as(s"$c!nulls"),
        nd.as(s"$c!distinct"),
        (if (isNum) min(col(c).cast("double"))
         else lit(null).cast("double")).as(s"$c!minn"),
        (if (isNum) max(col(c).cast("double"))
         else lit(null).cast("double")).as(s"$c!maxn"),
        (if (isNum) lit(null).cast("string")
         else min(col(c).cast("string"))).as(s"$c!mins"),
        (if (isNum) lit(null).cast("string")
         else max(col(c).cast("string"))).as(s"$c!maxs"))
    } :+ count(lit(1)).as("!rows")
    val summary = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("col_name"),
        col("`!rows`").as("n_rows"),
        col(s"`$c!nulls`").as("n_nulls"),
        col(s"`$c!distinct`").as("n_distinct"),
        col(s"`$c!minn`").as("min_num"),
        col(s"`$c!maxn`").as("max_num"),
        col(s"`$c!mins`").as("min_str"),
        col(s"`$c!maxs`").as("max_str"))
    }
    summary.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }
}
