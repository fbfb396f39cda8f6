package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Similarity.fsPath

/** Idempotent file sink for `foreachBatch` serve streams
  * ([[graft.operators.Similarity.searchIndexStream]]): each
  * micro-batch lands in `outDir/batch_id=<id>/` guarded by a commit
  * MARKER written only after the batch's parquet is fully out.
  * foreachBatch is at-least-once across a checkpoint restart — the
  * batch in flight when the process died is replayed with the SAME
  * batch id — and the marker makes the replay a SKIP, which is
  * exactly the semantics an index serve needs:
  *  - no duplicates: a replayed batch never writes twice;
  *  - no silent answer drift: if the index was MAINTAINED
  *    (appendToIndex / removeFromIndex) between the original serve
  *    and the replay, re-searching would return different neighbors
  *    for the same query batch — the skip pins the answers that were
  *    already served;
  *  - partial-write recovery: a crash between parquet-out and marker
  *    leaves an uncommitted dir that the replay OVERWRITES before
  *    re-marking, so torn output is never visible to [[readServed]]
  *    (which reads only marked batches).
  * The same ledger idea as [[StreamingJdbcSink]]'s batch ledger, in
  * filesystem form (marker file instead of a ledger row; the parquet
  * dir swap-by-overwrite instead of a transaction). */
object StreamingResultSink {

  private val Marker = "_graft_committed"

  /** The `(batch, batchId) => Unit` sink to hand to
    * [[graft.operators.Similarity.searchIndexStream]]. */
  def idempotent(outDir: String): (DataFrame, Long) => Unit =
    (df: DataFrame, batchId: Long) => {
      val spark = df.sparkSession
      val dir = s"$outDir/batch_id=$batchId"
      val (marker, fs) = fsPath(spark, s"$dir/$Marker")
      if (!fs.exists(marker)) {
        df.write.mode("overwrite").parquet(dir)
        if (!fs.createNewFile(marker))
          throw new java.io.IOException(
            s"result sink: cannot commit marker $marker")
      }
    }

  /** Read back every COMMITTED batch (uncommitted partials from a
    * crash are invisible). Column `batch_id` rides along from the
    * directory name. */
  def readServed(spark: SparkSession, outDir: String): DataFrame = {
    val (root, fs) = fsPath(spark, outDir)
    val committed = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .filter(s => fs.exists(new org.apache.hadoop.fs.Path(s.getPath, Marker)))
      .map(_.getPath.toString)
    require(committed.nonEmpty, s"no committed batches under $outDir")
    spark.read
      .option("basePath", outDir)
      .parquet(committed: _*)
  }
}
