package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.operators.MediaBatchProcessor._

class MediaBatchSpec extends SparkTestBase {

  private def media = {
    import spark.implicits._
    MultimodalQueries.withMedia(Tables(spark, sfDir, "documents"))
      .select(col("doc_id"), col("payload"), col("meta.media_type").as("media_type"))
      .as[MediaRow]
  }

  test("batched decode covers every row exactly once with typed output") {
    val out = decodeBatched(media, batchSize = 32)
    assert(out.count() == 500)
    assert(out.select("doc_id").distinct().count() == 500)
    // features are deterministic: byte_len equals the UTF-8 length
    val joined = out.toDF().join(
      Tables(spark, sfDir, "documents")
        .select(col("doc_id"), expr("octet_length(text)").cast("long").as("expect_len")),
      "doc_id")
    assert(joined.filter(col("byte_len") =!= col("expect_len")).count() == 0)
  }

  test("batch shape: no batch exceeds the configured size") {
    val out = decodeBatched(media, batchSize = 16)
    assert(out.agg(max("batch_size")).collect()(0).getInt(0) <= 16)
    assert(out.agg(min("batch_size")).collect()(0).getInt(0) >= 1)
  }

  test("feature vector has the documented arity and is reproducible") {
    val a = decodeBatched(media).collect().map(f => f.doc_id -> f.features.toSeq).toMap
    val b = decodeBatched(media).collect().map(f => f.doc_id -> f.features.toSeq).toMap
    assert(a == b)
    assert(a.values.forall(_.length == 4))
  }
}
