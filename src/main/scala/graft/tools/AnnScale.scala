package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Dev measurement for the all-kNN join's scale lever: `lshKnn`'s candidate
 * count per bucket is ~n/2^numBits, so the bucket-join work is
 * ~n²·tables/2^numBits — constant-occupancy scaling requires numBits to
 * grow with log₂(n) (the knn_join oracle query pins numBits=6 for
 * determinism; a production index sizes numBits from the corpus count).
 *
 *   runMain graft.tools.AnnScale <dir> <numBits> [tables=4] [k=3]
 */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val numBits = args(1).toInt
    val tables = if (args.length > 2) args(2).toInt else 4
    val k = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.count() // warm the scan
    val t0 = System.nanoTime()
    val n = graft.ml.Similarity.lshKnn(emb, emb, k, dim = 64, numBits, tables).count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[annscale] dir=$dir numBits=$numBits tables=$tables k=$k rows=$n time=$dt%.2f s")
    // bucket-occupancy skew: the join work is Σ|b|² per table — one hot
    // bucket dominates regardless of the bucket count
    import org.apache.spark.sql.functions._
    val occ = emb.select(posexplode(array((0 until tables).map(t =>
        graft.ml.Similarity.lshBucket(col("embedding"), 64, numBits, seed = t)): _*))
        .as(Seq("table", "bucket")))
      .groupBy("table", "bucket").count()
    val top = occ.orderBy(col("count").desc).limit(5).collect()
      .map(r => s"${r.getLong(2)}").mkString(",")
    val pairs = occ.agg(sum(col("count") * col("count"))).collect()(0).getLong(0)
    println(s"[annscale] top5 bucket sizes=$top candidatePairs=$pairs")
    spark.stop()
  }
}
