package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.classification.{GBTClassificationModel, GBTClassifier, LinearSVC, LinearSVCModel, LogisticRegression, LogisticRegressionModel, RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, StandardScaler, StandardScalerModel, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.features.Features

/** The relation-extraction classifier (C1/C2), re-expressed as Spark ML.
  *
  * Reference architecture
  * (`/root/reference/iepy/extraction/relation_extraction_classifier.py:29-104`):
  * sparse bag features -> binary vectorizer -> an inner linear SVM whose
  * decision margin becomes ONE dense feature (`ClassifierAsFeature`,
  * dimensionality reduction) -> assembled with the dense numeric
  * features -> StandardScaler -> final classifier.
  *
  * Final-classifier zoo — the reference accepts exactly
  * `{sgd, knn, svc, randomforest, adaboost}`
  * (`relation_extraction_classifier.py:12-18`; unknown names fail fast
  * the way its `_valid_classifiers[...]` KeyError does). Spark mapping:
  *
  *  - svc        -> LinearSVC (hinge, the "svc" default of `iepy/defaults.py:7`)
  *  - sgd        -> LinearSVC with SGDClassifier's regularization
  *                  (hinge + alpha=1e-4, no feature re-standardization —
  *                  inputs are already scaled)
  *  - lr         -> LogisticRegression (extension; the north star names LR)
  *  - randomforest -> RandomForestClassifier, margin = P(pos) - 0.5
  *  - adaboost   -> GBTClassifier (Spark's native boosted ensemble;
  *                  AdaBoost-SAMME has no Spark twin), margin = raw score
  *  - knn        -> exact k-NN against the (human-annotation-bounded)
  *                  labeled set, broadcast to executors; margin =
  *                  positive-neighbor fraction - 0.5. The labeled set is
  *                  bounded by annotation budget, never corpus-sized, so
  *                  the broadcast is dimension-sized by construction.
  *
  * Every variant exposes the same surface: a `margin` column whose sign
  * is the decision (>= 0 -> relation present), so thresholding (C7) and
  * uncertainty sampling (C6, |margin|) are classifier-agnostic.
  *
  * Input: evidence DataFrame (schema of [[graft.schema.Evidence]]) plus a
  * boolean `label` column for fit. Features are computed in-plan by
  * [[Features.withDefaultFeatures]] — pure Catalyst up to the ML vector
  * assembly boundary.
  */
object RelationClassifier {

  val validClassifiers: Seq[String] =
    Seq("sgd", "knn", "svc", "randomforest", "adaboost", "lr")

  val bagCols: Seq[String] = Seq(
    "f_bag_of_words", "f_bag_of_pos",
    "f_bag_of_words_in_between", "f_bag_of_pos_in_between")

  val denseCols: Seq[String] = Seq(
    "f_entity_order", "f_entity_distance", "f_other_entities_in_between",
    "f_total_number_of_entities", "f_verbs_count_in_between",
    "f_verbs_count", "f_in_same_sentence", "f_symbols_in_between",
    "f_number_of_tokens")

  /** The final decision stage: adds a `margin` column (>= 0 -> positive)
    * over the scaled feature vector. */
  sealed trait FinalStage extends Serializable {
    def addMargin(df: DataFrame): DataFrame
  }

  /** A Spark ML model; margin from its raw-score vector slot 1, or from
    * P(pos) - 0.5 for probability-voting ensembles. */
  final case class MlStage(model: Transformer, fromProbability: Boolean)
      extends FinalStage {
    def addMargin(df: DataFrame): DataFrame = {
      val scored = model.transform(df)
      val margin =
        if (fromProbability)
          vector_to_array(col("finalProb")).getItem(1) - 0.5
        else vector_to_array(col("finalRaw")).getItem(1)
      scored.withColumn("margin", margin)
        .drop("finalRaw", "finalPred", "finalProb")
    }
  }

  /** Exact k-NN over the broadcast labeled set (euclidean on the scaled
    * features, deterministic (distance, index) tie-break). */
  final case class KnnStage(train: Array[(Vector, Double)], k: Int)
      extends FinalStage {
    def addMargin(df: DataFrame): DataFrame = {
      val bc = df.sparkSession.sparkContext.broadcast(train)
      val kk = k
      val knn = udf { v: Vector =>
        val t = bc.value
        val scored = new Array[(Double, Int)](t.length)
        var i = 0
        while (i < t.length) {
          val u = t(i)._1
          var d = 0.0; var j = 0
          while (j < v.size) {
            val diff = v(j) - u(j); d += diff * diff; j += 1
          }
          scored(i) = (d, i)
          i += 1
        }
        val nearest = scored.sortBy(identity).take(math.min(kk, t.length))
        nearest.map(n => t(n._2)._2).sum / nearest.length - 0.5
      }
      df.withColumn("margin", knn(col("scaled_features")))
    }
  }

  final case class Model(
      vectorizers: Seq[CountVectorizerModel],
      innerSvc: LinearSVCModel,
      scaler: StandardScalerModel,
      classifier: String,
      finalStage: FinalStage) extends Serializable {

    /** Adds `margin` (decision function) and `prediction` columns. */
    def transform(evidence: DataFrame): DataFrame = {
      val scaled = scaledFeatures(this, evidence)
      finalStage.addMargin(scaled)
        .withColumn("prediction", col("margin") >= 0)
        .drop("sparse_features", "dense_features", "scaled_features",
          "inner_margin")
    }
  }

  /** Featurize unless the caller already did: the C7 threshold CV runs
    * 6 fits over one persisted post-feature table — recomputing the
    * (pure but wide) Catalyst feature pass per fold was the dominant
    * AL-round cost. Skips ONLY when every default feature column is
    * present — a partial config (FeatureConfig.applyConfig can add
    * f_bag_of_words alone) still featurizes, and withDefaultFeatures
    * overwrites same-named columns idempotently. */
  private def featurized(evidence: DataFrame): DataFrame = {
    val cols = evidence.columns.toSet
    if ((bagCols ++ denseCols).forall(cols.contains)) evidence
    else Features.withDefaultFeatures(evidence)
  }

  /** Shared featurization: bags -> vectors -> inner margin -> dense
    * assembly -> scaling. */
  private def scaledFeatures(m: Model, evidence: DataFrame): DataFrame = {
    var df = featurized(evidence)
    m.vectorizers.foreach(v => df = v.transform(df))
    df = new VectorAssembler()
      .setInputCols(bagCols.map(_ + "_vec").toArray)
      .setOutputCol("sparse_features").transform(df)
    df = m.innerSvc.transform(df)
      .withColumn("inner_margin",
        vector_to_array(col("svcRaw")).getItem(1))
      .drop("svcRaw", "svcPrediction")
    df = new VectorAssembler()
      .setInputCols((denseCols :+ "inner_margin").toArray)
      .setOutputCol("dense_features").transform(df)
    m.scaler.transform(df)
  }

  /** Fit on labeled evidence (boolean `label` column); requires both
    * classes present (reference `active_learning_core.py:127-134`). */
  def fit(labeled: DataFrame, classifier: String = "svc"): Model = {
    require(validClassifiers.contains(classifier),
      s"Unknown classifier '$classifier'; valid: " +
        validClassifiers.mkString(", ") +
        " (reference relation_extraction_classifier.py:12-18)")
    val stats = labeled
      .agg(countDistinct(col("label")), count(lit(1))).head()
    val classes = stats.getLong(0)
    val nRows = stats.getLong(1)
    require(classes == 2,
      s"Can't train classifier with $classes classes; need 2")
    // Right-size TRAINING partitioning to the data: the labeled set is
    // human-annotation-bounded, while the iterative optimizers schedule
    // one job per L-BFGS step — at the session's default parallelism a
    // 200-row fit measured 5x slower than single-partition (50-150 tiny
    // jobs x 8 near-empty tasks of pure scheduling overhead). ~20k rows
    // per training partition keeps big label sets parallel; scoring
    // (transform) keeps the caller's partitioning untouched.
    val trainParts = math.max(1L, math.min(nRows / 20000 + 1, 64L)).toInt
    var df = featurized(labeled.coalesce(trainParts))
      .withColumn("y", col("label").cast("double"))
    // TRUNCATE the logical plan (eager localCheckpoint), don't just
    // cache it: a fit issues ~60 actions (4 CountVectorizer fits, one
    // L-BFGS job per SVC iteration, scaler, final stage), and EVERY
    // action re-analyzes/re-optimizes the logical plan — persist()
    // substitutes the cache only at physical planning, so the 13-column
    // feature expression tree still dominated each action's driver-side
    // cost. The checkpointed table is labeled-set-sized by contract;
    // lost-executor recompute safety is irrelevant at that size (the
    // fit simply fails and is retried by its caller).
    df = df.localCheckpoint()
    // vocab cap: a memory guard, not a semantic knob — annotation-bounded
    // label sets sit far below it; a corpus-sized vocabulary would blow
    // the driver-held CountVectorizerModel otherwise.
    // The four vocabulary fits are independent single-job actions over
    // the checkpointed table — run them concurrently (guide §2.6:
    // overlap independent jobs); each fit's vocabulary and ordering is
    // computed exactly as before.
    val vectorizers = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val dfRef = df
      Await.result(Future.sequence(bagCols.map { c =>
        Future {
          new CountVectorizer().setInputCol(c).setOutputCol(c + "_vec")
            .setBinary(true).setVocabSize(1 << 16).fit(dfRef)
        }
      }), Duration.Inf)
    }
    vectorizers.foreach(v => df = v.transform(df))
    df = new VectorAssembler()
      .setInputCols(bagCols.map(_ + "_vec").toArray)
      .setOutputCol("sparse_features").transform(df)
    // tol 1e-3 mirrors the reference's own optimizer defaults (sklearn
    // SGDClassifier tol=1e-3 for the inner ClassifierAsFeature, SVC
    // tol=1e-3 for the final stage); Spark's 1e-6 default is stricter
    // than the semantics being mirrored and costs ~2x the L-BFGS
    // iterations — each a scheduled job — for margins identical to 3+
    // decimals on annotation-scale data
    val innerSvc = new LinearSVC().setFeaturesCol("sparse_features")
      .setLabelCol("y").setPredictionCol("svcPrediction")
      .setRawPredictionCol("svcRaw")
      .setMaxIter(50).setRegParam(0.01).setTol(1e-3).fit(df)
    df = innerSvc.transform(df)
      .withColumn("inner_margin",
        vector_to_array(col("svcRaw")).getItem(1))
      .drop("svcRaw", "svcPrediction")
    df = new VectorAssembler()
      .setInputCols((denseCols :+ "inner_margin").toArray)
      .setOutputCol("dense_features").transform(df)
    // second truncation point: the scaler fit and the final-stage fit
    // both action over this subtree, whose plan now carries the four
    // vectorizer transforms + the inner-SVC scoring
    df = df.localCheckpoint()
    val scaler = new StandardScaler().setInputCol("dense_features")
      .setOutputCol("scaled_features").setWithMean(true).setWithStd(true)
      .fit(df)
    df = scaler.transform(df)
    val finalStage: FinalStage = classifier match {
      case "lr" =>
        MlStage(new LogisticRegression().setFeaturesCol("scaled_features")
          .setLabelCol("y").setPredictionCol("finalPred")
          .setRawPredictionCol("finalRaw").setProbabilityCol("finalProb")
          .setMaxIter(100).fit(df), fromProbability = false)
      case "sgd" =>
        MlStage(new LinearSVC().setFeaturesCol("scaled_features")
          .setLabelCol("y").setPredictionCol("finalPred")
          .setRawPredictionCol("finalRaw")
          .setMaxIter(100).setRegParam(1e-4).setStandardization(false)
          .setTol(1e-3) // sklearn SGDClassifier default tol
          .fit(df), fromProbability = false)
      case "randomforest" =>
        MlStage(new RandomForestClassifier()
          .setFeaturesCol("scaled_features")
          .setLabelCol("y").setPredictionCol("finalPred")
          .setRawPredictionCol("finalRaw").setProbabilityCol("finalProb")
          .setNumTrees(100).setSeed(42L).fit(df), fromProbability = true)
      case "adaboost" =>
        MlStage(new GBTClassifier().setFeaturesCol("scaled_features")
          .setLabelCol("y").setPredictionCol("finalPred")
          .setRawPredictionCol("finalRaw").setProbabilityCol("finalProb")
          .setMaxIter(50).setSeed(42L).fit(df), fromProbability = false)
      case "knn" =>
        // the labeled set is human-annotation-bounded (same justification
        // as the C7 threshold pooling collect)
        val train = df.select(col("scaled_features"), col("y"))
          .collect()
          .map(r => (r.getAs[Vector](0), r.getDouble(1)))
        KnnStage(train, k = 5)
      case _ =>
        MlStage(new LinearSVC().setFeaturesCol("scaled_features")
          .setLabelCol("y").setPredictionCol("finalPred")
          .setRawPredictionCol("finalRaw")
          .setMaxIter(100).setRegParam(0.01).setTol(1e-3).fit(df),
          fromProbability = false)
    }
    // the checkpointed RDD blocks are unreferenced once fit returns —
    // the ContextCleaner reclaims them (annotation-scale tables)
    Model(vectorizers, innerSvc, scaler, classifier, finalStage)
  }

  /** S7 classifier persistence (refuse-overwrite semantics,
    * `active_learning_core.py:60-75`). */
  def save(m: Model, dir: String): Unit = {
    // Hadoop FS probes/writes: classifier bundles live on the same store
    // as the checkpoints (Spark ML's own save already does)
    if (graft.pipeline.Fs.exists(dir))
      throw new IllegalStateException(s"Refusing to overwrite $dir")
    graft.pipeline.Fs.mkdirs(dir)
    m.vectorizers.zipWithIndex.foreach { case (v, i) =>
      v.write.save(s"$dir/vec_$i")
    }
    m.innerSvc.write.save(s"$dir/inner_svc")
    m.scaler.write.save(s"$dir/scaler")
    m.finalStage match {
      case MlStage(w: org.apache.spark.ml.util.MLWritable, _) =>
        w.write.save(s"$dir/final")
      case KnnStage(train, _) =>
        val spark = org.apache.spark.sql.SparkSession.active
        import spark.implicits._
        spark.createDataFrame(train.toSeq).toDF("features", "y")
          .write.parquet(s"$dir/final")
      case _ => ()
    }
    graft.pipeline.Fs.writeString(s"$dir/meta.json",
      s"""{"classifier":"${m.classifier}"}""")
  }

  def load(dir: String): Model = {
    val meta = graft.pipeline.Fs.readString(s"$dir/meta.json")
    val cls = "\"classifier\":\"([a-z]+)\"".r
      .findFirstMatchIn(meta).map(_.group(1)).getOrElse("svc")
    val finalStage: FinalStage = cls match {
      case "lr" =>
        MlStage(LogisticRegressionModel.load(s"$dir/final"),
          fromProbability = false)
      case "randomforest" =>
        MlStage(RandomForestClassificationModel.load(s"$dir/final"),
          fromProbability = true)
      case "adaboost" =>
        MlStage(GBTClassificationModel.load(s"$dir/final"),
          fromProbability = false)
      case "knn" =>
        val spark = org.apache.spark.sql.SparkSession.active
        val train = spark.read.parquet(s"$dir/final")
          .collect().map(r => (r.getAs[Vector](0), r.getDouble(1)))
        KnnStage(train, k = 5)
      case _ => // svc, sgd
        MlStage(LinearSVCModel.load(s"$dir/final"),
          fromProbability = false)
    }
    Model(
      bagCols.indices.map(i => CountVectorizerModel.load(s"$dir/vec_$i")),
      LinearSVCModel.load(s"$dir/inner_svc"),
      StandardScalerModel.load(s"$dir/scaler"),
      cls, finalStage)
  }
}
