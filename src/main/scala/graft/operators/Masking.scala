package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII masking / pseudonymization, re-expressing the reference's
  * compliance shaping (ip_address_masked keeps the /16 prefix and stars
  * the host part).
  * Ref: /root/reference/spark_jobs/silver/transform_transactions.py
  * (enrich_orders → ip_address_masked).
  *
  * Two standard forms: partial masking (keep a classifying prefix, star
  * the identifying suffix) and salted-hash pseudonymization (stable join
  * token that never exposes the raw value). Both pure projections.
  */
object Masking {

  /** Library-level pepper for pseudonymization tokens (a deployment would
    * inject this from a secret store). */
  val Pepper = "graft-pepper-v1"

  def maskCustomers(customer: DataFrame): DataFrame =
    customer
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .withColumn("name_masked",
        concat(substring(col("c_name"), 1, 9), lit("***")))
      .withColumn("name_token",
        sha2(concat(col("c_name"), lit(Pepper)), 256))
      .withColumn("acctbal_band",
        when(col("c_acctbal") < 0, lit("negative"))
          .when(col("c_acctbal") < 1000, lit("low"))
          .when(col("c_acctbal") < 5000, lit("mid"))
          .otherwise(lit("high")))
      .drop("c_name", "c_acctbal")
}
