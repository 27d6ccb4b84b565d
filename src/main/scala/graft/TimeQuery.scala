package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time named SparkEntry queries against an SF dir.
  * Usage: TimeQuery <sfDir> <query...>  (also prints the formatted plan
  * when GRAFT_EXPLAIN=1). */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (sys.env.get("GRAFT_EXPLAIN").contains("1")) df.explain("formatted")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[time] $name: $secs%.2f s")
      // same per-query isolation as Bench: no cross-query cache carryover
      graft.pipeline.Caches.release()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
