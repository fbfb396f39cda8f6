package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of (point-in-time) join — for every left row, attach the
  * most recent right-side values at or before the left row's time,
  * per key.
  *
  * Spark has no native as-of join; the naive range join
  * (`l.key = r.key AND r.t <= l.t` + max-per-row) explodes to
  * O(|matches|) pairs before reducing. This composition is the
  * scale-correct form: union both sides tagged with a marker, one
  * shuffle keyed on the join keys, and a per-key ordered window carrying
  * the right values forward (`last(..., ignoreNulls)`), then keep the
  * left rows. Cost is one shuffle + one sort per key group — the same
  * shape as any windowed aggregation, with no pair blow-up.
  *
  * Ordering contract: right rows sort before left rows at equal
  * timestamps (a right value AT the left time is visible — "at or
  * before"). Ties among multiple right rows at the same (key, time) are
  * resolved by whichever sorts last; pass a strictly-ordering time
  * column if that matters.
  *
  * Null contract: all `rightVals` come from the SAME matched right row
  * (they are carried through the window as one struct), so a right row
  * whose value column is legitimately NULL yields NULL — it is not
  * skipped in favor of an older row's value.
  *
  * Column contract: `left` and `right` share only the key columns;
  * `rightVals` names the right-side columns to carry (they must not
  * collide with left column names). Output = every left column +
  * `rightVals`. */
object AsOf {

  /** @param maxLookback optional as-of tolerance (pandas
    *   `merge_asof(tolerance=...)`): when the matched right row is
    *   older than `leftTime - maxLookback`, the match is dropped and
    *   the rightVals come back NULL. Pass a literal in the time
    *   column's domain (a number for numeric times, an INTERVAL for
    *   timestamps). */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightVals: Seq[String],
      maxLookback: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val leftOnly = left.columns.filterNot(keys.contains).toSeq
    // One struct per right row, carried whole through the window: the
    // window's ignoreNulls applies to the struct (null only on left
    // rows), never to the individual value columns, so every output row
    // takes all rightVals from one right row, nulls included. The
    // matched right row's own time rides along as `_rt` so a tolerance
    // can be applied after the carry.
    val rvStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)) :+
        right.schema(rightTime).copy(name = "_rt"))
    val l = left
      .withColumn("_t", col(leftTime)).withColumn("_m", lit(1))
      .select(keys.map(col) ++ Seq(col("_t"), col("_m")) ++
        leftOnly.map(col) :+
        lit(null).cast(rvStructType).as("_rv"): _*)
    val r = right
      .withColumn("_t", col(rightTime)).withColumn("_m", lit(0))
      .select(keys.map(col) ++ Seq(col("_t"), col("_m")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightVals.map(col) :+ col(rightTime).as("_rt"): _*).as("_rv"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried0 = l.unionByName(r)
      .withColumn("_rv", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_m") === 1)
    val carried = maxLookback match {
      case Some(tol) => carried0.withColumn("_rv",
        when(col("_rv").isNotNull &&
          col("_t") - col("_rv")("_rt") <= tol, col("_rv")))
      case None => carried0
    }
    rightVals
      .foldLeft(carried) { (df, c) => df.withColumn(c, col("_rv")(c)) }
      .drop("_m", "_t", "_rv")
  }

  /** Nearest as-of join (pandas `merge_asof(direction='nearest')`):
    * for every left row, the right row minimizing |leftTime − rightTime|
    * within the key group; equal distances prefer the earlier (backward)
    * right row. Composed as two backward carries — the forward direction
    * is the backward as-of on the NEGATED time axis — so the cost is two
    * windowed passes, no pair blow-up. Requires a numeric time column
    * (timestamps: convert to epoch first, precision of your choice). */
  def joinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    val bVals = rightVals.map("_b_" + _)
    val fVals = rightVals.map("_f_" + _)
    // backward pass: latest right at-or-before, carrying the matched time
    val rB = rightVals.zip(bVals)
      .foldLeft(right) { case (df, (o, n)) => df.withColumn(n, col(o)) }
      .withColumn("_b_t", col(rightTime))
      .select((keys :+ rightTime).map(col) ++ (bVals :+ "_b_t").map(col): _*)
    val back = join(left, rB, keys, leftTime, rightTime, bVals :+ "_b_t")
    // forward pass: earliest right at-or-after == backward on negated times
    val rF = rightVals.zip(fVals)
      .foldLeft(right) { case (df, (o, n)) => df.withColumn(n, col(o)) }
      .withColumn("_f_t", col(rightTime))
      .withColumn("_neg_rt", -col(rightTime))
      .select(keys.map(col) ++ (fVals ++ Seq("_f_t", "_neg_rt")).map(col): _*)
    val both = join(back.withColumn("_neg_t", -col(leftTime)), rF, keys,
      "_neg_t", "_neg_rt", fVals :+ "_f_t")
    // pick the closer side; ties (and forward-missing) take backward
    val pickB = col("_b_t").isNotNull && (col("_f_t").isNull ||
      (col(leftTime) - col("_b_t") <= col("_f_t") - col(leftTime)))
    rightVals.zip(bVals.zip(fVals))
      .foldLeft(both) { case (df, (o, (b, f))) =>
        df.withColumn(o, when(pickB, col(b)).otherwise(col(f))) }
      .drop((bVals ++ fVals ++ Seq("_b_t", "_f_t", "_neg_t")): _*)
  }
}
