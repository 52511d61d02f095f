package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TwsBatchProbe extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  test("batch TWS probe") {
    import spark.implicits._
    val out = StreamingOps.runningStats(
      Tables(spark, TestSpark.sfDir, "events")
        .select(col("user_id"), col("event_type"), col("value"))
        .as[StreamingOps.TypedEvent])
    info("conf=" + spark.conf.get("spark.sql.streaming.stateStore.coordinatorReportSnapshotUploadLag"))
    out.collect()
  }
}
