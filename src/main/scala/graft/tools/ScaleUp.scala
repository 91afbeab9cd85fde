package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-proof data generator: blows an existing testdata scale factor up
 * ~Nx into a SCRATCH directory (never touches the source), so the heavy
 * queries can be measured at 10x data and their scaling exponents recorded
 * (NOTES_r11.md). Usage:
 *
 *   runMain graft.tools.ScaleUp <srcDir> <dstDir> [factor=10]
 *
 * Construction: dimension tables (region, nation) copy verbatim — realistic
 * growth adds customers per nation, not nations. Every fact-ish table
 * unions `factor` copies with its keys shifted by copy*1e8 (copy 0 is the
 * original): foreign keys shift IN LOCKSTEP, so copy k's orders point at
 * copy k's customers and the join fan-outs stay exactly those of the
 * source data — the blow-up multiplies rows, not join multiplicity. The
 * 1e8 stride keeps every shifted key far under the 1e9 graph label band
 * (PropertyGraph derives node ids as key + label*1e9).
 *
 * Documents get one distinct marker token appended per non-zero copy:
 * byte-identical copies would turn each near-dup PAIR into a quadratic
 * cross-copy clique and measure the dedup operators against a corpus shape
 * (45x pair blow-up) that 10x real data does not have.
 */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    // key stride between copies: overridable because factor x stride must
    // stay under the 1e9 graph label band (PropertyGraph node ids are
    // key + label*1e9) -- the default 1e8 stride supports factor <= 9;
    // a factor-100 blow-up passes 1e6 (max sf0.1 base key is 149,999)
    val Shift = if (args.length > 3) args(3).toLong else 100000000L
    require(factor >= 1 && factor <= 100, s"factor out of range: $factor")
    require(factor.toLong * Shift <= 1000000000L,
      s"factor x stride = ${factor.toLong * Shift} exceeds the 1e9 graph label band")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      System.err.println(s"[scaleup] $t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }
    /** Union `factor` copies, adding copy*Shift to each column in `keys`. */
    def blow(t: String, keys: Seq[String], extra: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = read(t)
      // a stride at or below the max base key would silently COLLIDE ids
      // across copies (copy-0 key 149,999 == copy-1 key 49,999 at stride
      // 1e5) — the exact join-fan-out corruption this tool exists to avoid
      if (factor > 1) {
        val mx = keys.map(c => base.agg(max(col(c))).first().getAs[Number](0).longValue).max
        require(Shift > mx,
          s"$t: key stride $Shift must exceed the max base key $mx or copies collide")
      }
      val copies = (0 until factor).map { k =>
        val shifted = keys.foldLeft(base)((d, c) => d.withColumn(c, col(c) + lit(k * Shift)))
        extra(shifted, k)
      }
      write(t, copies.reduce(_.unionByName(_)))
    }

    Seq("region", "nation").foreach(t => write(t, read(t)))
    blow("customer", Seq("c_custkey"))
    blow("supplier", Seq("s_suppkey"))
    blow("part", Seq("p_partkey"))
    blow("orders", Seq("o_orderkey", "o_custkey"))
    blow("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    blow("events", Seq("event_id", "user_id"))
    blow("documents", Seq("doc_id"), (d, k) =>
      if (k == 0) d
      else d.withColumn("text", concat(col("text"), lit(s" qqcopy$k")))
        .withColumn("n_chars", col("n_chars") + lit(s" qqcopy$k".length.toLong)))
    blow("embeddings", Seq("vec_id"))
    spark.stop()
  }
}
