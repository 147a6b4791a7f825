package graft

import org.apache.spark.sql.SparkSession

/** Scratch: does Jobs.adaptiveRead see a localCheckpoint's storage? */
object AdaptiveReadProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(0, 10000, 1, 8).selectExpr("id", "id * 2 AS b")
      .localCheckpoint(true)
    val rdd = df.queryExecution.toRdd
    println(s"toRdd id=${rdd.id} parts=${rdd.getNumPartitions}")
    spark.sparkContext.getRDDStorageInfo.foreach(i =>
      println(s"stored id=${i.id} mem=${i.memSize} disk=${i.diskSize} parts=${i.numPartitions}"))
    val ad = Jobs.adaptiveRead(df)
    println(s"adaptive parts=${ad.rdd.getNumPartitions}")
    spark.stop()
  }
}
