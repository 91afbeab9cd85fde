package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

object QTime {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // job-floor telemetry: jobs launched and executor task-time per query —
    // wall >> task-time with many jobs = driver/job-floor bound, not work
    val jobs = new AtomicLong; val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) taskMs.addAndGet(e.taskMetrics.executorRunTime)
    })
    spark.read.parquet(s"$dir/embeddings.parquet").count() // warm
    args.foreach { q =>
      org.apache.spark.graftshim.ListenerShim.drain(spark.sparkContext)
      val (j0, m0) = (jobs.get, taskMs.get)
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      val dt = (System.nanoTime()-t0)/1e9
      org.apache.spark.graftshim.ListenerShim.drain(spark.sparkContext)
      println(f"[qtime] $q%-20s $dt%.2f s  rows=$n  jobs=${jobs.get-j0}  taskSec=${(taskMs.get-m0)/1e3}%.1f")
    }
    spark.stop()
  }
}
