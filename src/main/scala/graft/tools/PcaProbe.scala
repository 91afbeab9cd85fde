package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: attribute emb_pca cost between covariance materialization
  * and the eigensolve paths. Not part of the library surface. */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    time("warm parquet")(emb.count())
    val cov1 = graft.ml.Similarity.covarianceMatrix(emb, "embedding", 64)
    time("cov count()")(cov1.count())
    val cov2 = graft.ml.Similarity.covarianceMatrix(emb, "embedding", 64)
    time("cov collect()")(cov2.select("i", "j", "cov").collect())
    val cov3 = graft.ml.Similarity.covarianceMatrix(emb, "embedding", 64)
    val c1 = time("powerIterationLocal")(
      graft.ml.Similarity.powerIterationLocal(cov3, 64, 6))
    time("c1 count")(c1.count())
    val cov4 = graft.ml.Similarity.covarianceMatrix(emb, "embedding", 64)
    time("powerIterationDistributed")(
      graft.ml.Similarity.powerIterationDistributed(cov4, 64, 6).count())
    spark.stop()
  }
}
