package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Reusable corpus-curation building blocks — the public surface
  * behind the oracled privacy / sampling keys (SURVEY.md §2.M). The
  * privacy audits take ANY list of quasi-identifier columns; the
  * sampler is deterministic under resharding and retries (md5-keyed
  * selection, never rand()/limit whose row order is
  * partition-dependent).
  */
object Curation {

  /** k-anonymity audit: group sizes over the quasi-identifier columns,
    * reduced to the k histogram with a risk flag for groups smaller
    * than `k`. Two stacked aggregates — shuffle width is the distinct
    * QI combinations, then the distinct k values. Output: (k,
    * n_groups, n_rows, risky). */
  def kAnonymity(df: DataFrame, quasiIds: Seq[Column], k: Int = 5)
      : DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_groups"))
      .select(col("k"), col("n_groups"),
        (col("k") * col("n_groups")).as("n_rows"),
        (col("k") < k).as("risky"))
  }

  /** l-diversity audit — k-anonymity's necessary complement: a k-safe
    * group still exposes its members if every record shares one
    * `sensitive` value. Output: (l, n_groups, n_rows, risky) with
    * risky = l < `l`. */
  def lDiversity(df: DataFrame, quasiIds: Seq[Column],
      sensitive: Column, l: Int = 3): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    df.groupBy(quasiIds: _*)
      .agg(countDistinct(sensitive).as("l"), count(lit(1)).as("k"))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_groups"), sum(col("k")).as("n_rows"))
      .select(col("l"), col("n_groups"), col("n_rows"),
        (col("l") < l).as("risky"))
  }

  /** Class-balanced downsampling: keep at most `cap` rows per class,
    * selected by md5-hash order with an id tiebreak — deterministic
    * and stable under resharding/retries. Augment-style: returns the
    * KEPT rows with all input columns preserved. At billion-row scale
    * the same selection is a hash-threshold filter with no window;
    * this window form is exact at any cap. */
  def sampleBalanced(df: DataFrame, classCol: String, idCol: String,
      cap: Int, salt: String = "bal:"): DataFrame =
    df.withColumn("__hk",
        md5(concat(lit(salt), col(idCol).cast(StringType))))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(classCol)).orderBy(col("__hk"), col(idCol))))
      .filter(col("__rn") <= cap)
      .drop("__hk", "__rn")
}
