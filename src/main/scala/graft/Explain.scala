package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for selected queries —
  * `runMain graft.Explain <sfDir> [query ...]` (default: a representative set).
  * Used to audit pushdown (`PushedFilters`), scan pruning (`ReadSchema`),
  * join strategy (broadcast vs shuffle), and WholeStageCodegen coverage. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("cy_2hop", "q1_agg", "window_topk", "emb_neardup", "stream_window_agg", "dedup_minhash")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
