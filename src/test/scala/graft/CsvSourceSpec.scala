package graft

import java.nio.file.Files

import graft.sources.EventSources
import org.apache.spark.sql.functions._

/** CSV file-replay source: typed columns, and a malformed line lands
  * in `_corrupt_record` instead of killing the stream (the same
  * lenient posture as the JSON ingest).
  */
class CsvSourceSpec extends SparkSpec {

  test("csv replay parses typed rows and quarantines malformed lines") {
    val dir = Files.createTempDirectory("csv_src")
    Files.writeString(dir.resolve("events.csv"),
      Seq(
        // 5 data fields; _corrupt_record is schema-only, never in data
        "12345,200,,,1700000000000",
        "12345,,92,80,1700000001000",
        "not,a,valid,heart,rate,row,at,all",
        "99999,55,120,80,1700000002000"
      ).mkString("\n"))

    val q = EventSources.fileCsv(spark, dir.toString)
      .writeStream.format("memory").queryName("csv_src")
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_csv").toString)
      .start()
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("csv_src").collect()
    assert(rows.length == 4)
    val good = spark.table("csv_src").filter(col("_corrupt_record").isNull)
    assert(good.count() == 3)
    assert(good.filter(col("user_id") === 12345 && col("heart_rate") === 200)
      .count() == 1)
    // the malformed line survives, quarantined
    val bad = spark.table("csv_src").filter(col("_corrupt_record").isNotNull)
    assert(bad.count() == 1)
    assert(bad.head().getAs[String]("_corrupt_record").startsWith("not,a"))
  }
}
