package graft

import graft.gold.{Attribution, DataQuality, Drift, Forensics, FraudSummary, Graph, Markov, Pipelines, Revenue, Rings, Seasonal, StarSchema}
import graft.ml.{Evaluation, FraudScore, GbtModel, TrainedModel}
import graft.multimodal.Multimodal
import graft.operators.{AsOfJoin, Bronze, Cleaning, Enrichment, Features, MergeUpsert, RangeJoin, Resample, Sessionize}
import graft.sim.Similarity
import graft.text.{Components, Dedup, MinHash, SimHash, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** One definition per operator from SURVEY.md §2: the Spark query plus its
  * DuckDB oracle (None → driver records rows-only).
  * Oracle-compat rules: SURVEY.md §4.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {

  /** Full registry: every slice, in the original registration order. */
  val registry: Seq[QueryDef] =
    QueriesCore.defs ++ QueriesFeatures.defs ++ QueriesTextSim.defs ++
    QueriesCuration.defs ++ QueriesAnalytics.defs ++ QueriesEncodings.defs ++
    QueriesPrivacy.defs ++ QueriesClustering.defs

  def all: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  def oracles: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}

