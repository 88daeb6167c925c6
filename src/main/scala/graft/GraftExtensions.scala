package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.{CosineSimilarity, L2Distance, MinHashMd5, UnicodeNormalize}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` injection point: registers the engine's
  * native expressions as SQL functions, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works in any session built
  * with `.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // transparent zone-map file pruning over SkippingStore sidecars —
    // plain spark.read.parquet(store).filter(...) opens only surviving
    // files (plans/ZonePrune.scala)
    ext.injectOptimizerRule(graft.plans.ZonePruneRule)
    // metadata-only count(*) from the same sidecar's per-file nrows
    ext.injectOptimizerRule(graft.plans.MetadataCountRule)
    // metadata-only min/max over sidecar-indexed columns (exactness-
    // guarded: int/float/double/string always; long/timestamp under
    // 2^53; NTZ only in UTC sessions; never DECIMAL)
    ext.injectOptimizerRule(graft.plans.MetadataMinMaxRule)
    // left-outer joins to a declared-unique store key vanish when only
    // fact-side columns are read (plans/JoinElimination.scala)
    ext.injectOptimizerRule(graft.plans.JoinEliminationRule)
    // DISTINCT/dropDuplicates over a declared-unique null-free key is
    // a no-op — the whole shuffle disappears
    ext.injectOptimizerRule(graft.plans.DistinctEliminationRule)
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_md5"),
      new ExpressionInfo(classOf[MinHashMd5].getName, "minhash_md5"),
      (exprs: Seq[Expression]) => MinHashMd5(exprs.head, {
        val v = exprs(1).eval()
        v.asInstanceOf[Number].intValue()
      })))
    ext.injectFunction((
      FunctionIdentifier("l2_dist"),
      new ExpressionInfo(classOf[L2Distance].getName, "l2_dist"),
      (exprs: Seq[Expression]) => L2Distance(exprs.head, exprs(1))))
    // unicode_normalize(s, 'NFC'|'NFKC'|'NFD'|'NFKD') — form must be a
    // literal (it is baked into the generated code)
    ext.injectFunction((
      FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (exprs: Seq[Expression]) => UnicodeNormalize(exprs.head,
        exprs(1).eval().toString)))
  }
}
