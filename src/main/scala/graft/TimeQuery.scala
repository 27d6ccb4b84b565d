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

/** Dev utility: repeated raw-CPU probe readings (quiet-floor + noise
  * characterization for the scaling-pair probe defense). */
object ProbeStats {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10)
    // default matches Bench.cpuProbe's — this tool calibrates THAT probe
    val hashes = args.lift(1).map(_.toInt).getOrElse(12000000)
    val readings = (1 to n).map { i =>
      val s = Bench.cpuProbe(hashesPerThread = hashes)
      println(f"[probe] $i: $s%.3f s")
      s
    }
    val minOf2 = readings.drop(1).grouped(2).collect {
      case Seq(a, b) => math.min(a, b) }.toSeq
    println(f"[probe] min=${readings.min}%.3f max=${readings.max}%.3f " +
      f"minOf2spread=${if (minOf2.nonEmpty) minOf2.max / minOf2.min else 0.0}%.3f")
  }
}

/** Dev utility: time one active-learning round (the same workload Bench
  * reports as al_round_sec) without running the whole bench. */
object TimeAl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { i =>
      val secs = Bench.alRoundSecForDev(spark)
      println(f"[time] al_round (run $i): $secs%.2f s")
    }
    // component breakdown
    import org.apache.spark.sql.functions.{col => c}
    import spark.implicits._
    val labeled = spark.range(200)
      .map(i => (Bench.alEvidence(i, i % 2 == 0), i % 2 == 0))
      .toDF("e", "label").select(c("e.*"), c("label"))
    val unlabeled = spark.range(200, 20200)
      .map(i => Bench.alEvidence(i, i % 2 == 0)).toDF()
    labeled.count(); unlabeled.count()
    def tt[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[time] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val thr = tt("estimateThreshold")(graft.ml.ActiveLearning
      .estimateThreshold(spark, labeled,
        graft.ml.ActiveLearning.HighPrecisionTradeoff))
    println(s"[time] threshold=$thr")
    val m = tt("final fit")(graft.ml.RelationClassifier.fit(labeled, "svc"))
    println(s"[time] inner SVC iterations: ${m.innerSvc.summary.totalIterations}")
    m.finalStage match {
      case graft.ml.RelationClassifier.MlStage(
        svc: org.apache.spark.ml.classification.LinearSVCModel, _) =>
        println(s"[time] final SVC iterations: ${svc.summary.totalIterations}")
      case _ => ()
    }
    tt("transform+rank 20k")(
      m.transform(unlabeled)
        .withColumn("uncertainty", org.apache.spark.sql.functions.abs(c("margin")))
        .orderBy(c("uncertainty").asc, c("evidence_id").asc)
        .write.format("noop").mode("overwrite").save())

    spark.stop()
  }
}
