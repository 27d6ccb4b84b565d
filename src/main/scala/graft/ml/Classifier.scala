package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.classification.{LinearSVC, LinearSVCModel, LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, StandardScaler, StandardScalerModel, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
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
  * features -> StandardScaler -> final linear classifier (svc default,
  * `iepy/defaults.py:7`; the north star names logistic regression — both
  * provided via `classifier in {"svc", "lr"}`).
  *
  * Input: evidence DataFrame (schema of [[graft.schema.Evidence]]) plus a
  * boolean `label` column for fit. Features are computed in-plan by
  * [[Features.withDefaultFeatures]] — pure Catalyst up to the ML vector
  * assembly boundary.
  */
object RelationClassifier {

  val bagCols: Seq[String] = Seq(
    "f_bag_of_words", "f_bag_of_pos",
    "f_bag_of_words_in_between", "f_bag_of_pos_in_between")

  val denseCols: Seq[String] = Seq(
    "f_entity_order", "f_entity_distance", "f_other_entities_in_between",
    "f_total_number_of_entities", "f_verbs_count_in_between",
    "f_verbs_count", "f_in_same_sentence", "f_symbols_in_between",
    "f_number_of_tokens")

  final case class Model(
      vectorizers: Seq[CountVectorizerModel],
      innerSvc: LinearSVCModel,
      scaler: StandardScalerModel,
      classifier: String,
      finalModel: Transformer) extends Serializable {

    /** Adds `margin` (decision function) and `prediction` columns. */
    def transform(evidence: DataFrame): DataFrame = {
      val scaled = scaledFeatures(this, evidence)
      finalModel.transform(scaled)
        .withColumn("margin",
          vector_to_array(col("finalRaw")).getItem(1))
        .withColumn("prediction", col("margin") >= 0)
        .drop("finalRaw", "finalPred", "finalProb", "sparse_features",
          "dense_features", "scaled_features", "inner_margin")
    }
  }

  /** Shared featurization: bags -> vectors -> inner margin -> dense
    * assembly -> scaling. */
  private def scaledFeatures(m: Model, evidence: DataFrame): DataFrame = {
    var df = Features.withDefaultFeatures(evidence)
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
    val classes = labeled.select(countDistinct(col("label"))).head.getLong(0)
    require(classes == 2,
      s"Can't train classifier with $classes classes; need 2")
    var df = Features.withDefaultFeatures(labeled)
      .withColumn("y", col("label").cast("double"))
    val vectorizers = bagCols.map { c =>
      new CountVectorizer().setInputCol(c).setOutputCol(c + "_vec")
        .setBinary(true).fit(df)
    }
    vectorizers.foreach(v => df = v.transform(df))
    df = new VectorAssembler()
      .setInputCols(bagCols.map(_ + "_vec").toArray)
      .setOutputCol("sparse_features").transform(df)
    val innerSvc = new LinearSVC().setFeaturesCol("sparse_features")
      .setLabelCol("y").setPredictionCol("svcPrediction")
      .setRawPredictionCol("svcRaw")
      .setMaxIter(50).setRegParam(0.01).fit(df)
    df = innerSvc.transform(df)
      .withColumn("inner_margin",
        vector_to_array(col("svcRaw")).getItem(1))
      .drop("svcRaw", "svcPrediction")
    df = new VectorAssembler()
      .setInputCols((denseCols :+ "inner_margin").toArray)
      .setOutputCol("dense_features").transform(df)
    val scaler = new StandardScaler().setInputCol("dense_features")
      .setOutputCol("scaled_features").setWithMean(true).setWithStd(true)
      .fit(df)
    df = scaler.transform(df)
    val finalModel: Transformer = classifier match {
      case "lr" =>
        new LogisticRegression().setFeaturesCol("scaled_features")
          .setLabelCol("y").setPredictionCol("finalPred")
          .setRawPredictionCol("finalRaw").setProbabilityCol("finalProb")
          .setMaxIter(100).fit(df)
      case _ =>
        new LinearSVC().setFeaturesCol("scaled_features")
          .setLabelCol("y").setPredictionCol("finalPred")
          .setRawPredictionCol("finalRaw")
          .setMaxIter(100).setRegParam(0.01).fit(df)
    }
    Model(vectorizers, innerSvc, scaler, classifier, finalModel)
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
    m.finalModel match {
      case w: org.apache.spark.ml.util.MLWritable => w.write.save(s"$dir/final")
      case _ => ()
    }
    graft.pipeline.Fs.writeString(s"$dir/meta.json",
      s"""{"classifier":"${m.classifier}"}""")
  }

  def load(dir: String): Model = {
    val meta = graft.pipeline.Fs.readString(s"$dir/meta.json")
    val cls = "\"classifier\":\"([a-z]+)\"".r
      .findFirstMatchIn(meta).map(_.group(1)).getOrElse("svc")
    val finalModel: Transformer =
      if (cls == "lr") LogisticRegressionModel.load(s"$dir/final")
      else LinearSVCModel.load(s"$dir/final")
    Model(
      bagCols.indices.map(i => CountVectorizerModel.load(s"$dir/vec_$i")),
      LinearSVCModel.load(s"$dir/inner_svc"),
      StandardScalerModel.load(s"$dir/scaler"),
      cls, finalModel)
  }
}
