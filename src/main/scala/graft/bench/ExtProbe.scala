package graft.bench

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: does the spark.sql.extensions=GraftExtensions path
  * rewrite (a) the inline natural Hamming join and (b) the NOT EXISTS
  * decontamination shape? injectOptimizerRule lands in the operator-
  * optimization batch, which runs BEFORE RewriteSubquery turns NOT EXISTS
  * into a LeftAnti join — this probe pins what each surface actually
  * plans under the extensions path vs SpatialPlanner.enable. */
object ExtProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    (0 until 30).map(i => (i.toLong, s"words w${i % 9} w${i % 7} w${i % 5}"))
      .toDF("id", "text").createOrReplaceTempView("docs")

    def probe(label: String, sql: String, s: SparkSession = spark): Unit = {
      val df = s.sql(sql)
      val initial = df.queryExecution.executedPlan.toString
      val n = df.count() // drive AQE to the final plan
      val fin = df.queryExecution.executedPlan.toString
      def verdict(p: String) =
        if (p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"))
          "NESTED LOOP" else "banded"
      println(s"$label: initial=${verdict(initial)} final=${verdict(fin)} rows=$n")
    }
    probe("extensions / inner join",
      """SELECT a.id FROM docs a JOIN docs b
        |ON bit_count(simhash64(a.text) ^ simhash64(b.text)) <= 3 AND a.id < b.id""".stripMargin)
    probe("extensions / NOT EXISTS",
      """SELECT t.id FROM docs t WHERE NOT EXISTS (
        |  SELECT 1 FROM docs e
        |  WHERE bit_count(simhash64(t.text) ^ simhash64(e.text)) <= 3)""".stripMargin)
    val s2 = spark.newSession()
    graft.plans.SpatialPlanner.enable(s2)
    s2.createDataFrame((0 until 30).map(i =>
        (i.toLong, s"words w${i % 9} w${i % 7} w${i % 5}")))
      .toDF("id", "text").createOrReplaceTempView("docs2")
    probe("planner.enable / NOT EXISTS",
      """SELECT t.id FROM docs2 t WHERE NOT EXISTS (
        |  SELECT 1 FROM docs2 e
        |  WHERE bit_count(simhash64(t.text) ^ simhash64(e.text)) <= 3)""".stripMargin, s2)
    spark.stop()
  }
}
