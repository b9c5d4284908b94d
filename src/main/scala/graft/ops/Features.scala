package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-feature construction operators: encodings a training-data
  * pipeline derives from raw columns before handing rows to a trainer.
  * No counterpart in the reference (its marts stop at BI aggregates);
  * extension tier under the north star's feature-engineering ask.
  */
object Features {

  /** Leave-one-out target encoding with additive smoothing: replaces a
    * categorical column with the mean of a numeric target over the
    * OTHER rows of the same category, shrunk toward the global mean by
    * a pseudo-count prior —
    *
    *   enc_i = (S_c − t_i + m · g) / (n_c − 1 + m)
    *
    * where S_c/n_c are the category's target sum/count, g the global
    * target mean, m the prior weight. Excluding the row's own target
    * (the "leave one out") is what keeps the feature usable for
    * training: the naive per-category mean leaks each row's label into
    * its own feature. Singleton categories collapse to g exactly.
    *
    * Scale shape: category statistics come from a `groupBy(cat)`
    * aggregate — partial (map-side) combinable, output bounded by the
    * category cardinality — joined back to the rows; the global mean is
    * a 1-row aggregate broadcast by crossJoin. NOT a window over the
    * category: a window shuffles the full fact table into
    * one-task-per-category partitions and a hot category becomes a
    * straggler wall, while the aggregate+join form re-uses the fact
    * scan and bounds the joined side at |categories|.
    *
    * Sums stay in the target's exact type (decimal sums are
    * order-independent); the final encoding is computed in double and
    * rounded to 6 dp so both engines emit identical values.
    *
    * `df` must contain `cat` and `target`; rows with a NULL target or
    * NULL category are passed through with a NULL encoding (no
    * imputation surprises). Output keeps all input columns and appends
    * `enc`. */
  def targetEncodeLoo(df: DataFrame, cat: String, target: String,
                      priorWeight: Double,
                      broadcastStats: Boolean = true): DataFrame = {
    require(priorWeight > 0, s"need priorWeight > 0, got $priorWeight")
    val valid = df.filter(col(cat).isNotNull && col(target).isNotNull)
    val stats0 = valid.groupBy(col(cat))
      .agg(sum(col(target)).as("__s"), count(lit(1)).as("__n"))
    // broadcast only when the caller vouches the category cardinality is
    // bounded; a high-cardinality encode (user ids) must shuffle-join
    val stats = if (broadcastStats) broadcast(stats0) else stats0
    val global = valid.agg(
      (sum(col(target)).cast("double") / count(lit(1))).as("__g"))
    df.crossJoin(broadcast(global))
      .join(stats, Seq(cat), "left")
      .withColumn("enc",
        when(col(cat).isNotNull && col(target).isNotNull,
          round((col("__s").cast("double") - col(target).cast("double") +
            lit(priorWeight) * col("__g")) /
            (col("__n") - lit(1) + lit(priorWeight)), 6)))
      .drop("__s", "__n", "__g")
  }

  /** Per-group equi-depth (quantile) binning — the feature
    * discretization that turns a heavy-tailed numeric into `nBins`
    * roughly equal-population ordinal buckets, robust to outliers in a
    * way equal-WIDTH bins are not. Boundaries are the group's exact
    * interpolated percentiles at i/nBins; a row's bin is the number of
    * boundaries strictly below its value (0-based, so bin ∈
    * [0, nBins-1]; boundary-equal values fall into the lower bin on
    * both engines).
    *
    * Scale shape mirrors [[graft.ops.Quality]]'s winsorization: exact
    * `percentile` per BOUNDED group (the stats side stays
    * |groups|-sized and broadcasts back; the row pass is map-side).
    * Exact percentile materializes each group's values on its reducer —
    * for high-cardinality values within a group at 100 TB, swap in the
    * KLL sketch ([[graft.ops.Scale.approxMedian]] family); the exact
    * form is what the oracle can replay. */
  def quantileBin(df: DataFrame, group: String, value: Column, nBins: Int,
                  binOut: String = "bin"): DataFrame = {
    require(nBins >= 2, s"need nBins >= 2, got $nBins")
    val qs = (1 until nBins).map(i => i.toDouble / nBins)
    val stats = df.groupBy(col(group))
      .agg(percentile(value, typedLit(qs)).as("__bounds"))
    df.join(broadcast(stats), Seq(group))
      .withColumn(binOut,
        size(filter(col("__bounds"), b => value > b)).cast("int"))
      .drop("__bounds")
  }
}
