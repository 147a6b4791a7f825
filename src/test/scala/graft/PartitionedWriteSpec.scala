package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Output-layout demo: the write side of a 100 TB pipeline. A cleaned
  * corpus is laid down partitioned by language (directory-level
  * pruning for downstream mixture sampling), sorted by doc_id within
  * files (range-readable), with a bounded per-file row count (file
  * sizing is how export parallelism and object-store request shape
  * are controlled — one giant file serializes every reader).
  */
class PartitionedWriteSpec extends SparkSpec {

  test("partitioned corpus write: pruning, bounded files, in-file order") {
    val out = Files.createTempDirectory("graft_part").toString
    Tables(spark, sf001, "documents")
      .repartition(col("lang"))
      .sortWithinPartitions(col("lang"), col("doc_id"))
      .write
      .partitionBy("lang")
      .option("maxRecordsPerFile", 20)
      .mode("overwrite")
      .parquet(out)

    // one directory per language
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).sorted
    assert(dirs.length == 5, s"expected 5 lang dirs, got: ${dirs.mkString(",")}")

    // file sizing honored: no parquet file exceeds the record cap
    val back = spark.read.parquet(out)
    import org.apache.spark.sql.functions.{input_file_name, count => cnt}
    val perFile = back.groupBy(input_file_name()).agg(cnt(lit(1)).as("n"))
      .select(max(col("n"))).head().getLong(0)
    assert(perFile <= 20, s"file exceeds maxRecordsPerFile: $perFile")

    // read-back with a language filter prunes at the DIRECTORY level:
    // the scan's partition filters carry the predicate and non-matching
    // directories never produce splits
    val en = back.filter(col("lang") === "en")
    val scan = en.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"expected partition pruning in scan:\n$scan")
    val enCount = en.count()
    val oracle = Tables(spark, sf001, "documents")
      .filter(col("lang") === "en").count()
    assert(enCount == oracle)

    // rows inside each file are doc_id-ordered (range-readable)
    val ordered = back.select(input_file_name().as("f"), col("doc_id"))
      .groupBy("f")
      .agg(expr("collect_list(doc_id)").as("ids"))
      .withColumn("ok", col("ids") === array_sort(col("ids")))
      .filter(!col("ok")).count()
    assert(ordered == 0, "files must be internally sorted by doc_id")
  }
}
