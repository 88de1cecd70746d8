package graft.ml

import org.apache.hadoop.fs.Path
import org.apache.spark.ml.classification.GBTClassificationModel
import org.apache.spark.ml.util.MLWritable
import org.apache.spark.sql.SparkSession

/** Versioned model registry: decouples training from scoring, the
  * reference's actual operating mode — models are saved under a version
  * and served via "latest" with hot reload (ref:
  * /root/reference/ml/models/fraud_detector.py save/load,
  * /root/reference/ml/serving/api.py:58,280).
  *
  * Layout mirrors the Medallion silver versioning (`<root>/models/<name>/
  * v=N`): monotonically increasing versions, `latest` = max N, no version
  * ever rewritten in place. Spark-ML writers persist model metadata +
  * tree/coefficient data as parquet, so the registry works on any
  * HDFS-compatible store — the same property Delta-backed registries rely
  * on. A saved model is a few KB–MB (ensemble structure), never data-sized;
  * "train nightly, score everywhere" ships only this artifact.
  */
object ModelRegistry {

  private def dir(root: String, name: String) = s"$root/models/$name"

  /** Persist `model` as the next version; returns the committed version.
    * The version scan + write is driver-side file metadata (same contract
    * as Medallion.latestVersion) — no data pass. */
  def save(spark: SparkSession, model: MLWritable, root: String,
           name: String): Long = {
    val next = latestVersion(spark, root, name).getOrElse(0L) + 1L
    model.write.overwrite().save(s"${dir(root, name)}/v=$next")
    next
  }

  def latestVersion(spark: SparkSession, root: String,
                    name: String): Option[Long] = {
    val p = new Path(dir(root, name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).map(_.getPath.getName).filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong).sorted.lastOption
  }

  /** Load a GBT model at `version` (default: latest) — the serving-side
    * `detector.load("latest")` analog. */
  def loadGbt(spark: SparkSession, root: String, name: String,
              version: Option[Long] = None): GBTClassificationModel = {
    val v = version.orElse(latestVersion(spark, root, name)).getOrElse(
      throw new IllegalStateException(s"no saved versions of '$name' under $root"))
    GBTClassificationModel.load(s"${dir(root, name)}/v=$v")
  }
}
