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

  /** A column-name prefix no input column starts with, so helper
    * columns can never silently overwrite (or be confused with) user
    * data. Deterministic: the shortest run of underscores that is not a
    * prefix of any existing name. */
  private[graft] def freshPrefix(cols: Iterable[String]): String = {
    var p = "_"
    while (cols.exists(_.startsWith(p))) p += "_"
    p
  }

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
    val dup = rightVals.filter(left.columns.contains)
    require(dup.isEmpty, "rightVals collide with left columns: " +
      dup.mkString(", ") + " — rename before the as-of join")
    val leftOnly = left.columns.filterNot(keys.contains).toSeq
    // helper columns get a prefix no input column starts with
    val p = freshPrefix(left.columns ++ right.columns)
    val (tc, mc, rvc) = (p + "t", p + "m", p + "rv")
    // One struct per right row, carried whole through the window: the
    // window's ignoreNulls applies to the struct (null only on left
    // rows), never to the individual value columns, so every output row
    // takes all rightVals from one right row, nulls included. The
    // matched right row's own time rides along as `_rt` (a struct FIELD,
    // private to the helper struct — no column namespace contact) so a
    // tolerance can be applied after the carry.
    val rvStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)) :+
        right.schema(rightTime).copy(name = "_rt"))
    val l = left
      .withColumn(tc, col(leftTime)).withColumn(mc, lit(1))
      .select(keys.map(col) ++ Seq(col(tc), col(mc)) ++
        leftOnly.map(col) :+
        lit(null).cast(rvStructType).as(rvc): _*)
    val r = right
      .withColumn(tc, col(rightTime)).withColumn(mc, lit(0))
      .select(keys.map(col) ++ Seq(col(tc), col(mc)) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        // NULL right time NEVER matches (same contract as AsOfJoinExec):
        // a null struct is invisible to the ignoreNulls carry, whereas a
        // non-null struct holding a NULL _rt would be carried — and NULL
        // times sort FIRST in the window, so it would wrongly become the
        // carried match for every leftward row
        when(col(rightTime).isNotNull,
          struct(rightVals.map(col) :+ col(rightTime).as("_rt"): _*))
          .as(rvc): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tc), col(mc))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried0 = l.unionByName(r)
      .withColumn(rvc, last(col(rvc), ignoreNulls = true).over(w))
      .filter(col(mc) === 1)
    val carried = maxLookback match {
      case Some(tol) => carried0.withColumn(rvc,
        when(col(rvc).isNotNull &&
          col(tc) - col(rvc)("_rt") <= tol, col(rvc)))
      case None => carried0
    }
    rightVals
      .foldLeft(carried) { (df, c) => df.withColumn(c, col(rvc)(c)) }
      .drop(mc, tc, rvc)
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
    // same fail-fast as join: the inner joins run on prefixed value
    // columns, so without this check the final rename would silently
    // overwrite a left column named like a rightVal
    val dup = rightVals.filter(left.columns.contains)
    require(dup.isEmpty, "rightVals collide with left columns: " +
      dup.mkString(", ") + " — rename before the as-of join")
    // helper columns get a prefix no input column starts with
    val p = freshPrefix(left.columns ++ right.columns)
    val bVals = rightVals.map(p + "b_" + _)
    val fVals = rightVals.map(p + "f_" + _)
    val (bt, ft, negT, negRt) = (p + "bt", p + "ft", p + "negt", p + "negrt")
    // backward pass: latest right at-or-before, carrying the matched time
    val rB = rightVals.zip(bVals)
      .foldLeft(right) { case (df, (o, n)) => df.withColumn(n, col(o)) }
      .withColumn(bt, col(rightTime))
      .select((keys :+ rightTime).map(col) ++ (bVals :+ bt).map(col): _*)
    val back = join(left, rB, keys, leftTime, rightTime, bVals :+ bt)
    // forward pass: earliest right at-or-after == backward on negated times
    val rF = rightVals.zip(fVals)
      .foldLeft(right) { case (df, (o, n)) => df.withColumn(n, col(o)) }
      .withColumn(ft, col(rightTime))
      .withColumn(negRt, -col(rightTime))
      .select(keys.map(col) ++ (fVals ++ Seq(ft, negRt)).map(col): _*)
    val both = join(back.withColumn(negT, -col(leftTime)), rF, keys,
      negT, negRt, fVals :+ ft)
    // pick the closer side; ties (and forward-missing) take backward
    val pickB = col(bt).isNotNull && (col(ft).isNull ||
      (col(leftTime) - col(bt) <= col(ft) - col(leftTime)))
    rightVals.zip(bVals.zip(fVals))
      .foldLeft(both) { case (df, (o, (b, f))) =>
        df.withColumn(o, when(pickB, col(b)).otherwise(col(f))) }
      .drop((bVals ++ fVals ++ Seq(bt, ft, negT)): _*)
  }

  /** The forward-direction composition shared by [[joinForward]] and
    * [[graft.plans.AsOfMerge.joinForward]]: a backward as-of join
    * (supplied by the caller — window form or merge exec) run on the
    * NEGATED time axis. One place owns the collision check, the
    * collision-free helper names, and the negation, so the two entry
    * points cannot drift. Numeric time columns only — negation is the
    * direction flip. */
  private[graft] def forwardVia(
      backward: (DataFrame, DataFrame, Seq[String], String, String,
        Seq[String]) => DataFrame)(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    val dup = rightVals.filter(left.columns.contains)
    require(dup.isEmpty, "rightVals collide with left columns: " +
      dup.mkString(", ") + " — rename before the as-of join")
    val p = freshPrefix(left.columns ++ right.columns)
    val (negT, negRt) = (p + "negt", p + "negrt")
    val r = right.withColumn(negRt, -col(rightTime))
      .select(keys.map(col) ++ (rightVals :+ negRt).map(col): _*)
    backward(left.withColumn(negT, -col(leftTime)), r, keys,
      negT, negRt, rightVals)
      .drop(negT)
  }

  /** Forward as-of join (pandas `merge_asof(direction='forward')`):
    * for every left row, the EARLIEST right row at-or-after leftTime in
    * the key group — "the next quote after the order", the mirror of
    * [[join]]'s carry-backward. Composed as the backward as-of on the
    * negated time axis (one windowed pass, no pair blow-up), so it
    * inherits [[join]]'s contracts: NULL right times never match,
    * unmatched left rows come back NULL-filled, all rightVals from one
    * matched row. Requires a numeric time column (timestamps: convert
    * to epoch first, precision of your choice). */
  def joinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightVals: Seq[String]): DataFrame =
    forwardVia(join(_, _, _, _, _, _))(
      left, right, keys, leftTime, rightTime, rightVals)
}
