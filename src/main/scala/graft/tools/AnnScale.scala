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
 *
 * Recall mode — measures recall@k of each approximate index against
 * [[graft.ml.Similarity.bruteForceKnn]] ground truth over a deterministic
 * query sample, across a numBits sweep (the data that validates — or
 * corrects — the log₂(n) sizing rule):
 *
 *   runMain graft.tools.AnnScale <dir> recall [k=10] [nq=200] [bits=8,10,12]
 */
object AnnScale {
  def main(args: Array[String]): Unit = {
    if (args.length > 1 && args(1) == "recall") return recallMain(args)
    if (args.length > 0 && args(0) == "gencluster") return genClusterMain(args)
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

  /**
   * Plant a GAUSSIAN-CLUSTER embedding corpus for recall calibration:
   * the synthetic sf* embeddings are near-uniform random (neighbors barely
   * closer than the bulk — the information-theoretically hard case) and
   * the ScaleUp corpora carry exact-copy inflation (~0.9 recall floor by
   * construction), so neither can anchor an ABSOLUTE recall target. Real
   * embedding spaces are clustered; this generator reproduces that regime
   * with k centers ~ N(0,1)^dim and per-vector Gaussian spread, fully
   * deterministic (center RNG seeded by `seed`, per-vector RNG by
   * seed ⊕ vec_id — resume/partitioning-independent).
   *
   *   runMain graft.tools.AnnScale gencluster <dstDir> [n=40000]
   *     [centers=64] [spread=0.3] [dim=64] [seed=42]
   */
  private def genClusterMain(args: Array[String]): Unit = {
    val dst = args(1)
    val n = if (args.length > 2) args(2).toLong else 40000L
    val kC = if (args.length > 3) args(3).toInt else 64
    val spread = if (args.length > 4) args(4).toDouble else 0.3
    val dim = if (args.length > 5) args(5).toInt else 64
    val seed = if (args.length > 6) args(6).toLong else 42L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cRnd = new scala.util.Random(seed)
    val centers = Array.fill(kC)(Array.fill(dim)(cRnd.nextGaussian().toFloat))
    val bc = spark.sparkContext.broadcast(centers)
    import spark.implicits._
    val df = spark.range(n).map { i =>
      // (i + 1): at i = 0 the mix would be `seed ^ 0 == seed`, replaying
      // the CENTER stream — vector 0 came out perfectly center-collinear
      val rnd = new scala.util.Random(seed ^ ((i + 1) * 0x9E3779B97F4A7C15L))
      val c = bc.value((i % kC).toInt)
      val v = Array.tabulate(dim)(d => c(d) + (rnd.nextGaussian() * spread).toFloat)
      (i, v)
    }.toDF("vec_id", "embedding")
    df.write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    println(s"[gencluster] wrote n=$n centers=$kC spread=$spread dim=$dim seed=$seed -> $dst")
    spark.stop()
  }

  private def recallMain(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.ml.Similarity
    val dir = args(0)
    val k = if (args.length > 2) args(2).toInt else 10
    val nq = if (args.length > 3) args(3).toInt else 200
    val bitsList = (if (args.length > 4) args(4) else "8,10,12").split(",").map(_.trim.toInt)
    val lshOnly = args.length > 5 && args(5) == "lshonly" // big-n runs: skip the IVF/PQ sweeps
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    // ScaleUp duplicates vectors verbatim across copies — report how much of
    // the corpus is exact-duplicate mass so the recall table reads honestly
    // (duplicates collide in every hash table, inflating recall vs organic
    // data; the SWEEP across numBits is still apples-to-apples)
    val distinctVecs = emb.select(hash(col("embedding"))).distinct().count()
    // deterministic spread sample: every ceil(n/nq)-th id
    val stride = math.max(1L, n / nq)
    val queries = emb.filter(pmod(col("vec_id"), lit(stride)) === 0).limit(nq)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nQ = queries.count()
    println(s"[annrecall] dir=$dir n=$n distinctVecs=$distinctVecs k=$k queries=$nQ " +
      s"log2(n)=${math.round(math.log(n.toDouble) / math.log(2) * 10) / 10.0}")
    val exact = Similarity.bruteForceKnn(emb, queries, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    exact.count() // force ground truth before timing the sweep
    def meanRecall(approx: org.apache.spark.sql.DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = Similarity.recallAtK(approx, exact, k)
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
      (r, (System.nanoTime() - t0) / 1000000L)
    }
    bitsList.foreach { bits =>
      val (rl, tl) = meanRecall(Similarity.lshKnn(emb, queries, k, 64, bits, tables = 4))
      println(f"[annrecall] algo=lsh        numBits=$bits%2d tables=4 recall@$k=$rl%.4f evalMs=$tl")
      val (rm, tm) = meanRecall(Similarity.lshMultiProbeKnn(emb, queries, k, 64, bits, tables = 4))
      println(f"[annrecall] algo=multiprobe numBits=$bits%2d tables=4 recall@$k=$rm%.4f evalMs=$tm")
    }
    if (lshOnly) { spark.stop(); return }
    // plain IVF (exact distances within probed cells) separates the coarse
    // quantizer's loss from PQ's code-resolution loss — on clustered data
    // coarse PQ degenerates to tie-breaking noise (all same-cluster vectors
    // share a code) while IVF with the same cells stays near-exact
    Seq((16, 4), (16, 8), (64, 16)).foreach { case (cells, nprobe) =>
      val (r, t) = meanRecall(
        Similarity.ivfKnn(emb, queries, k, numCells = cells, nprobe = nprobe))
      println(f"[annrecall] algo=ivf        cells=$cells%3d nprobe=$nprobe recall@$k=$r%.4f evalMs=$t")
    }
    // IVF-PQ scales by cell count, not bits — sweep cells at fixed nprobe share
    Seq(16, 64, 256).foreach { cells =>
      val nprobe = math.max(1, cells / 4)
      val (r, t) = meanRecall(
        Similarity.ivfPqKnn(emb, queries, k, 64, numCells = cells, nprobe = nprobe))
      println(f"[annrecall] algo=ivfpq      cells=$cells%3d nprobe=$nprobe recall@$k=$r%.4f evalMs=$t")
    }
    // codebook-resolution lever: the oracle default (m=4, ksub=8 → 12
    // bits/vector) is deliberately coarse for determinism; a production
    // setting spends more code bits for recall
    Seq((8, 16), (16, 32), (16, 256), (32, 64)).foreach { case (m, ksub) =>
      val (r, t) = meanRecall(
        Similarity.ivfPqKnn(emb, queries, k, 64, numCells = 16, nprobe = 8, m = m, ksub = ksub))
      println(f"[annrecall] algo=ivfpq      cells= 16 nprobe=8 m=$m%2d ksub=$ksub%2d recall@$k=$r%.4f evalMs=$t")
    }
    spark.stop()
  }
}
